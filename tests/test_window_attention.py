"""Pallas window-attention kernel vs the XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvuld_tpu.ops.window_attention import (pallas_window_attention,
                                            window_attention,
                                            window_attention_reference)
from mvuld_tpu.models.swin_v2 import shifted_window_mask

Bn, H, N, HD = 4, 2, 16, 8


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(Bn, H, N, HD).astype(np.float32)
    k = rng.randn(Bn, H, N, HD).astype(np.float32)
    v = rng.randn(Bn, H, N, HD).astype(np.float32)
    bias = rng.randn(H, N, N).astype(np.float32)
    scale = np.exp(rng.rand(H).astype(np.float32))
    return q, k, v, bias, scale


def test_kernel_matches_reference_nomask():
    q, k, v, bias, scale = _inputs()
    want = np.asarray(window_attention_reference(*map(jnp.asarray, (q, k, v, bias, scale))))
    got = np.asarray(pallas_window_attention(
        *map(jnp.asarray, (q, k, v, bias, scale)), mask=None, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_kernel_matches_reference_masked():
    q, k, v, bias, scale = _inputs(1)
    mask = shifted_window_mask(8, 8, 4, 2)       # [4, 16, 16]
    assert mask is not None and Bn % mask.shape[0] == 0
    want = np.asarray(window_attention_reference(
        *map(jnp.asarray, (q, k, v, bias, scale)), mask=mask))
    got = np.asarray(pallas_window_attention(
        *map(jnp.asarray, (q, k, v, bias, scale)), mask=mask, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_custom_vjp_gradients_match():
    """Backward (XLA recompute) must equal the reference's gradients."""
    q, k, v, bias, scale = _inputs(2)
    args = tuple(map(jnp.asarray, (q, k, v, bias, scale)))

    def loss_ref(*a):
        return (window_attention_reference(*a) ** 2).sum()

    grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)

    # patch both fused kernels to interpret mode on CPU
    import mvuld_tpu.ops.window_attention as wa
    orig_f = wa.pallas_window_attention
    orig_b = wa.pallas_window_attention_bwd
    wa.pallas_window_attention = lambda *a, **kw: orig_f(*a, **{**kw, "interpret": True})
    wa.pallas_window_attention_bwd = lambda *a, **kw: orig_b(*a, **{**kw, "interpret": True})
    try:
        wa.make_window_attention.cache_clear()

        def loss_fused(*a):
            return (window_attention(*a) ** 2).sum()

        grads = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
    finally:
        wa.pallas_window_attention = orig_f
        wa.pallas_window_attention_bwd = orig_b
        wa.make_window_attention.cache_clear()
    for g, gr in zip(grads, grads_ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                                   atol=1e-4, rtol=1e-4)


def test_bwd_kernel_masked_matches_reference():
    """Fused backward with a shift mask matches reference gradients."""
    q, k, v, bias, scale = _inputs(4)
    mask = shifted_window_mask(8, 8, 4, 2)
    args = tuple(map(jnp.asarray, (q, k, v, bias, scale)))

    def loss_ref(*a):
        return (window_attention_reference(*a, mask=mask) * 0.3).sum()

    grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)

    from mvuld_tpu.ops.window_attention import pallas_window_attention_bwd
    g = jnp.full((Bn, H, N, HD), 0.3, jnp.float32)
    dq, dk, dv, dbias, dscale = pallas_window_attention_bwd(
        *args, g, mask=mask, interpret=True)
    for got, want in zip((dq, dk, dv, dbias, dscale), grads_ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------- map layout
def _map_inputs(seed=0, B=2, Hp=8, Wp=8, ws=4, heads=2, hd=8):
    rng = np.random.RandomState(seed)
    qkv = rng.randn(B, Hp, Wp, 3, heads, hd).astype(np.float32)
    bias = rng.randn(heads, ws * ws, ws * ws).astype(np.float32)
    scale = np.exp(rng.rand(heads).astype(np.float32))
    return qkv, bias, scale


def test_map_kernel_matches_reference_nomask():
    from mvuld_tpu.ops.window_attention import (
        pallas_window_attention_map, window_attention_map_reference)
    qkv, bias, scale = _map_inputs()
    want = np.asarray(window_attention_map_reference(
        *map(jnp.asarray, (qkv, bias, scale))))
    got = np.asarray(pallas_window_attention_map(
        *map(jnp.asarray, (qkv, bias, scale)), interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_map_kernel_matches_reference_masked():
    from mvuld_tpu.ops.window_attention import (
        pallas_window_attention_map, window_attention_map_reference)
    qkv, bias, scale = _map_inputs(seed=1)
    mask = shifted_window_mask(8, 8, 4, 2)
    want = np.asarray(window_attention_map_reference(
        jnp.asarray(qkv), jnp.asarray(bias), jnp.asarray(scale), mask))
    got = np.asarray(pallas_window_attention_map(
        jnp.asarray(qkv), jnp.asarray(bias), jnp.asarray(scale), mask,
        interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_map_custom_vjp_gradients_match():
    import mvuld_tpu.ops.window_attention as wa
    qkv, bias, scale = _map_inputs(seed=2)
    mask = shifted_window_mask(8, 8, 4, 2)

    def ref_loss(a):
        return (wa.window_attention_map_reference(*a, mask) ** 2).sum()

    want = jax.grad(lambda a: ref_loss(a))(
        tuple(map(jnp.asarray, (qkv, bias, scale))))

    orig_f = wa.pallas_window_attention_map
    orig_b = wa.pallas_window_attention_map_bwd
    wa.pallas_window_attention_map = \
        lambda *a, **kw: orig_f(*a, **{**kw, "interpret": True})
    wa.pallas_window_attention_map_bwd = \
        lambda *a, **kw: orig_b(*a, **{**kw, "interpret": True})
    try:
        wa.make_window_attention_map.cache_clear()

        def fused_loss(a):
            return (wa.window_attention_map(*a, mask) ** 2).sum()

        got = jax.grad(fused_loss)(tuple(map(jnp.asarray, (qkv, bias, scale))))
    finally:
        wa.pallas_window_attention_map = orig_f
        wa.pallas_window_attention_map_bwd = orig_b
        wa.make_window_attention_map.cache_clear()
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-4, rtol=1e-3)


def test_model_pallas_path_matches_xla_path():
    """SwinV2 with use_pallas (map-layout kernels, interpret) must equal the
    pure-XLA windows path — logits AND gradients, shifted blocks included."""
    import mvuld_tpu.ops.window_attention as wa
    from mvuld_tpu.models.swin_v2 import SwinTransformerV2, SwinV2Config

    cfg = SwinV2Config(img_size=32, patch_size=4, in_chans=3, num_classes=2,
                       embed_dim=16, depths=(2,), num_heads=(2,),
                       window_size=4, drop_rate=0.0, attn_drop_rate=0.0,
                       drop_path_rate=0.0, pretrained_window_sizes=(0,))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3), jnp.float32)
    model_xla = SwinTransformerV2(cfg)
    variables = model_xla.init(jax.random.PRNGKey(0), x)
    want = np.asarray(model_xla.apply(variables, x))

    orig_f = wa.pallas_window_attention_map
    orig_b = wa.pallas_window_attention_map_bwd
    wa.pallas_window_attention_map = \
        lambda *a, **kw: orig_f(*a, **{**kw, "interpret": True})
    wa.pallas_window_attention_map_bwd = \
        lambda *a, **kw: orig_b(*a, **{**kw, "interpret": True})
    try:
        wa.make_window_attention_map.cache_clear()
        model_p = SwinTransformerV2(cfg, use_pallas=True)
        got = np.asarray(model_p.apply(variables, x))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)

        def loss_p(p):
            return (model_p.apply({"params": p}, x) ** 2).sum()

        def loss_x(p):
            return (model_xla.apply({"params": p}, x) ** 2).sum()

        gp = jax.grad(loss_p)(variables["params"])
        gx = jax.grad(loss_x)(variables["params"])
        for a, b in zip(jax.tree_util.tree_leaves(gp),
                        jax.tree_util.tree_leaves(gx)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-3, rtol=5e-3)
    finally:
        wa.pallas_window_attention_map = orig_f
        wa.pallas_window_attention_map_bwd = orig_b
        wa.make_window_attention_map.cache_clear()
