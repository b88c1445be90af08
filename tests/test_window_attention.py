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
