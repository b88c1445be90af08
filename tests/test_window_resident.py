"""Window-resident layout (perf fast path): activations stay in window
layout between blocks; must be numerically identical to the spatial-resident
model — forward, grads, and stochastic-depth behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvuld_tpu.models.swin_v2 import (PallasOpts, SwinTransformerV2,
                                      SwinV2Config)

# two stages so both the nW>1 resident path (res 8, window 4 → shifted
# blocks exercise the regroup) and the degenerate nW==1 stage run
CFG = SwinV2Config(img_size=32, patch_size=4, embed_dim=16,
                   depths=(2, 2), num_heads=(2, 4), window_size=4,
                   pretrained_window_sizes=(0, 0), drop_path_rate=0.3)
OPTS = PallasOpts(interpret=True)


def _models():
    ref = SwinTransformerV2(CFG, use_pallas=True, pallas_opts=OPTS)
    wres = SwinTransformerV2(CFG, use_pallas=True, pallas_opts=OPTS,
                             window_resident=True)
    return ref, wres


def test_forward_matches_spatial():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3), jnp.float32)
    ref, wres = _models()
    variables = ref.init(jax.random.PRNGKey(0), x)
    a = ref.apply(variables, x, deterministic=True)
    b = wres.apply(variables, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-5, atol=1e-5)


def test_grads_match_spatial():
    x = jnp.asarray(np.random.RandomState(1).randn(2, 32, 32, 3), jnp.float32)
    ref, wres = _models()
    variables = ref.init(jax.random.PRNGKey(0), x)

    def loss(params, model):
        out = model.apply({"params": params}, x, deterministic=True)
        return jnp.sum(out ** 2)

    ga = jax.grad(loss)(variables["params"], ref)
    gb = jax.grad(loss)(variables["params"], wres)
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_drop_path_identical_per_image():
    """Same dropout rng ⇒ the SAME per-image stochastic-depth decisions in
    both layouts (the window path repeats one mask across windows)."""
    x = jnp.asarray(np.random.RandomState(2).randn(4, 32, 32, 3), jnp.float32)
    ref, wres = _models()
    variables = ref.init(jax.random.PRNGKey(0), x)
    rngs = {"dropout": jax.random.PRNGKey(7)}
    a = ref.apply(variables, x, deterministic=False, rngs=rngs)
    b = wres.apply(variables, x, deterministic=False, rngs=rngs)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-5, atol=1e-5)


def test_scan_and_remat_compose():
    x = jnp.asarray(np.random.RandomState(3).randn(2, 32, 32, 3), jnp.float32)
    ref = SwinTransformerV2(CFG, use_pallas=True, pallas_opts=OPTS)
    wres = SwinTransformerV2(CFG, use_pallas=True, pallas_opts=OPTS,
                             window_resident=True, scan_blocks=True,
                             use_checkpoint=True)
    variables = ref.init(jax.random.PRNGKey(0), x)
    # scan stacks the per-pair params; re-init the scan model and copy
    # values over by re-initializing with the same seed instead
    vw = wres.init(jax.random.PRNGKey(0), x)
    out = wres.apply(vw, x, deterministic=True)
    assert np.isfinite(np.asarray(out)).all()

    def loss(params):
        return jnp.sum(wres.apply({"params": params}, x,
                                  deterministic=True) ** 2)

    g = jax.grad(loss)(vw["params"])
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))
