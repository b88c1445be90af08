"""Parity tests for the fused residual MLP+LN kernel (ops/fused_dense.py
mlp_ln_res) and its RoBERTa integration.

The e2e tri-modal step is dominated by the UniXcoder text encoder; the
fused kernel keeps the [M, 4C] intermediate out of HBM (same design as
the SwinV2 mlp_ln, reference hot path: HF RobertaLayer — the reference
runs it frozen on disk caches, mvuld/data/data_list.py:292-299, so it
never needed this). These tests pin exact numerics against the XLA path
in interpret mode on CPU.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvuld_tpu.models.roberta import RobertaConfig, RobertaEncoder
from mvuld_tpu.ops.fused_dense import mlp_ln_res


def _rel(a, b):
    scale = max(float(jnp.abs(b).max()), 1e-6)
    return float(jnp.abs(a - b).max()) / scale


def test_mlp_ln_res_matches_xla_with_dropout_mask():
    rs = np.random.RandomState(0)
    M, C, Hd = 48, 64, 256
    x = jnp.asarray(rs.randn(M, C), jnp.float32)
    w1 = jnp.asarray(rs.randn(C, Hd) * 0.05, jnp.float32)
    b1 = jnp.asarray(rs.randn(Hd) * 0.02, jnp.float32)
    w2 = jnp.asarray(rs.randn(Hd, C) * 0.05, jnp.float32)
    b2 = jnp.asarray(rs.randn(C) * 0.02, jnp.float32)
    g = jnp.asarray(1 + 0.1 * rs.randn(C), jnp.float32)
    bt = jnp.asarray(0.1 * rs.randn(C), jnp.float32)
    mask = jnp.asarray(rs.rand(M, C) > 0.1, jnp.float32)
    kp = 0.9

    def ref(x, w1, b1, w2, b2, g, bt):
        h = jax.nn.gelu(x @ w1 + b1, approximate=False)
        z = (h @ w2 + b2) * (mask.astype(jnp.float32) / kp) + x
        mu = z.mean(-1, keepdims=True)
        zc = z - mu
        v = (zc * zc).mean(-1, keepdims=True)
        return (zc * jax.lax.rsqrt(v + 1e-5)) * g + bt

    args = (x, w1, b1, w2, b2, g, bt)
    y_ref = ref(*args)
    y = mlp_ln_res(*args, mask, kp, True)
    assert _rel(y, y_ref) < 1e-5

    gf = jax.grad(lambda a: (mlp_ln_res(*a, mask, kp, True) ** 2).sum())(args)
    gr = jax.grad(lambda a: (ref(*a) ** 2).sum())(args)
    for a, b, name in zip(gf, gr, "x w1 b1 w2 b2 gamma beta".split()):
        assert _rel(a, b) < 2e-5, name


def test_roberta_fused_mlp_parity():
    """Same params, same outputs/grads as the XLA layer; identical tree."""
    c0 = RobertaConfig(vocab_size=64, hidden_size=64, num_layers=2,
                       num_heads=4, intermediate_size=256,
                       max_position_embeddings=40, dropout_rate=0.1)
    cp = dataclasses.replace(c0, use_pallas_mlp=True, pallas_interpret=True)
    ids = jnp.asarray(np.random.RandomState(0).randint(3, 60, (2, 16)),
                      jnp.int32)
    m0, mp = RobertaEncoder(c0), RobertaEncoder(cp, remat=True)
    v = m0.init(jax.random.PRNGKey(0), ids)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(
                mp.init(jax.random.PRNGKey(0), ids)))

    y0 = m0.apply(v, ids, deterministic=True)
    yp = mp.apply(v, ids, deterministic=True)
    assert _rel(yp, y0) < 2e-5

    g0 = jax.grad(lambda vv: (m0.apply(vv, ids, deterministic=True) ** 2
                              ).mean())(v)
    gp = jax.grad(lambda vv: (mp.apply(vv, ids, deterministic=True) ** 2
                              ).mean())(v)
    # absolute comparison against the global gradient scale: leaves with
    # ~1e-7 gradients carry float noise that a per-leaf relative metric
    # misreads as error
    gscale = max(float(jnp.abs(x).max()) for x in jax.tree_util.tree_leaves(g0))
    worst = max(float(jnp.abs(a - b).max()) for a, b in zip(
        jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(g0)))
    assert worst < 1e-4 * gscale


def test_roberta_fused_dropout_deterministic_per_rng():
    cp = RobertaConfig(vocab_size=64, hidden_size=64, num_layers=1,
                       num_heads=4, intermediate_size=256,
                       max_position_embeddings=40, dropout_rate=0.3,
                       use_pallas_mlp=True, pallas_interpret=True)
    ids = jnp.asarray(np.random.RandomState(1).randint(3, 60, (2, 12)),
                      jnp.int32)
    m = RobertaEncoder(cp)
    v = m.init(jax.random.PRNGKey(0), ids)
    ya = m.apply(v, ids, deterministic=False,
                 rngs={"dropout": jax.random.PRNGKey(7)})
    yb = m.apply(v, ids, deterministic=False,
                 rngs={"dropout": jax.random.PRNGKey(7)})
    yc = m.apply(v, ids, deterministic=False,
                 rngs={"dropout": jax.random.PRNGKey(8)})
    assert bool((ya == yb).all())
    assert not bool((ya == yc).all())
