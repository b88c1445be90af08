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


@pytest.mark.slow
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
    """shift mask synthesized in-kernel must equal the mask-based reference."""
    from mvuld_tpu.ops.window_attention import (
        pallas_window_attention_map, window_attention_map_reference)
    qkv, bias, scale = _map_inputs(seed=1)
    mask = shifted_window_mask(8, 8, 4, 2)
    want = np.asarray(window_attention_map_reference(
        jnp.asarray(qkv), jnp.asarray(bias), jnp.asarray(scale), mask))
    got = np.asarray(pallas_window_attention_map(
        jnp.asarray(qkv), jnp.asarray(bias), jnp.asarray(scale), shift=2,
        interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_map_kernel_head_groups():
    """H % 8 == 0 path: heads processed in blocks of 8 (grid head-group axis)."""
    from mvuld_tpu.ops.window_attention import (
        pallas_window_attention_map, window_attention_map_reference)
    qkv, bias, scale = _map_inputs(seed=5, heads=16, hd=4)
    mask = shifted_window_mask(8, 8, 4, 2)
    want = np.asarray(window_attention_map_reference(
        jnp.asarray(qkv), jnp.asarray(bias), jnp.asarray(scale), mask))
    got = np.asarray(pallas_window_attention_map(
        jnp.asarray(qkv), jnp.asarray(bias), jnp.asarray(scale), shift=2,
        interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_map_kernel_mxu_bf16_close():
    """bf16-MXU variant stays within bf16 rounding of the fp32 reference."""
    from mvuld_tpu.ops.window_attention import (
        pallas_window_attention_map, pallas_window_attention_map_bwd,
        window_attention_map_reference)
    qkv, bias, scale = _map_inputs(seed=7)
    mask = shifted_window_mask(8, 8, 4, 2)
    want = np.asarray(window_attention_map_reference(
        jnp.asarray(qkv), jnp.asarray(bias), jnp.asarray(scale), mask))
    got = np.asarray(pallas_window_attention_map(
        jnp.asarray(qkv), jnp.asarray(bias), jnp.asarray(scale), shift=2,
        interpret=True, mxu_bf16=True))
    np.testing.assert_allclose(got, want, atol=3e-2, rtol=3e-2)

    g = np.full(got.shape, 0.25, np.float32)

    def loss(a, b, c):
        return (window_attention_map_reference(a, b, c, mask)
                * jnp.asarray(g)).sum()

    wq, wb, ws_ = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(qkv), jnp.asarray(bias), jnp.asarray(scale))
    dqkv, dbias, dscale = pallas_window_attention_map_bwd(
        jnp.asarray(qkv), jnp.asarray(bias), jnp.asarray(scale),
        jnp.asarray(g), shift=2, interpret=True, mxu_bf16=True)
    for got_g, want_g in ((dqkv, wq), (dbias, wb), (dscale, ws_)):
        np.testing.assert_allclose(np.asarray(got_g), np.asarray(want_g),
                                   atol=5e-2, rtol=5e-2)


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
            return (wa.window_attention_map(*a, shift=2) ** 2).sum()

        got = jax.grad(fused_loss)(tuple(map(jnp.asarray, (qkv, bias, scale))))
    finally:
        wa.pallas_window_attention_map = orig_f
        wa.pallas_window_attention_map_bwd = orig_b
        wa.make_window_attention_map.cache_clear()
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_model_pallas_path_matches_xla_path():
    """SwinV2 with use_pallas (flat-layout kernels, interpret) must equal the
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

    with _interpret_flat():
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


# --------------------------------------------------------------- flat layout
import contextlib


@contextlib.contextmanager
def _interpret_flat():
    """Force ALL flat-layout pallas_calls (fwd + v1 bwd + v2 bwd) to
    interpret mode so jax.grad through window_attention_flat runs on CPU."""
    import mvuld_tpu.ops.window_attention as wa
    orig_f = wa.pallas_window_attention_flat
    orig_b = wa.pallas_window_attention_flat_bwd
    orig_b2 = wa.pallas_window_attention_flat_bwd2
    wa.pallas_window_attention_flat = \
        lambda *a, **kw: orig_f(*a, **{**kw, "interpret": True})
    wa.pallas_window_attention_flat_bwd = \
        lambda *a, **kw: orig_b(*a, **{**kw, "interpret": True})
    wa.pallas_window_attention_flat_bwd2 = \
        lambda *a, **kw: orig_b2(*a, **{**kw, "interpret": True})
    wa.make_window_attention_flat.cache_clear()
    wa._make_flat_attach_grad.cache_clear()
    try:
        yield wa
    finally:
        wa.pallas_window_attention_flat = orig_f
        wa.pallas_window_attention_flat_bwd = orig_b
        wa.pallas_window_attention_flat_bwd2 = orig_b2
        wa.make_window_attention_flat.cache_clear()
        wa._make_flat_attach_grad.cache_clear()


def _flat_inputs(seed=0, Bn=8, ws=4, heads=2, hd=8):
    rng = np.random.RandomState(seed)
    N = ws * ws
    C = heads * hd
    qkv = rng.randn(Bn, N, 3 * C).astype(np.float32)
    bias = rng.randn(heads, N, N).astype(np.float32)
    scale = np.exp(rng.rand(heads).astype(np.float32))
    return qkv, bias, scale


def test_flat_kernel_matches_reference_masked():
    """Flat-layout kernel (in-kernel shift mask from window id) vs the
    mask-based XLA reference. 8 windows = 2 batches of the 2x2 grid."""
    from mvuld_tpu.ops.window_attention import (
        pallas_window_attention_flat, window_attention_flat_reference)
    qkv, bias, scale = _flat_inputs(seed=3)
    mask = shifted_window_mask(8, 8, 4, 2)      # nWh = nWw = 2
    want = np.asarray(window_attention_flat_reference(
        jnp.asarray(qkv), jnp.asarray(bias), jnp.asarray(scale), mask))
    got = np.asarray(pallas_window_attention_flat(
        jnp.asarray(qkv), jnp.asarray(bias), jnp.asarray(scale), shift=2,
        nWh=2, nWw=2, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_flat_kernel_wide_bias_range():
    """The static softmax shift (m = scale + max(bias) from SMEM) must stay
    accurate when the per-head bias range is much wider than SwinV2's (0,16)
    CPB output — stress range ~40, still far inside the exp(-87) underflow
    bound documented on _scale_and_shift_smem."""
    from mvuld_tpu.ops.window_attention import (
        pallas_window_attention_flat, window_attention_flat_reference)
    qkv, bias, scale = _flat_inputs(seed=7)
    bias = (bias * 12.0).astype(np.float32)     # range ≈ 40 per head
    want = np.asarray(window_attention_flat_reference(
        jnp.asarray(qkv), jnp.asarray(bias), jnp.asarray(scale), None))
    got = np.asarray(pallas_window_attention_flat(
        jnp.asarray(qkv), jnp.asarray(bias), jnp.asarray(scale),
        interpret=True))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=5e-4)


def test_flat_kernel_underflow_row_sum_finite():
    """When scale·(1-cos) + bias range exceeds the fp32 exp underflow (~87),
    whole rows of exp(s - m) flush to zero. The clamped row sum must keep
    fwd outputs and bwd grads finite instead of 0/0 NaN (advisor r3)."""
    import mvuld_tpu.ops.window_attention as wa
    qkv, bias, scale = _flat_inputs(seed=11)
    # huge trained scale (clamp limit is 100 in swin_v2) + wide bias: rows
    # whose best cosine is < 1 fall > 87 below m = scale + max(bias)
    scale = np.full_like(scale, 95.0)
    bias = (bias * 10.0).astype(np.float32)
    out = np.asarray(wa.pallas_window_attention_flat(
        jnp.asarray(qkv), jnp.asarray(bias), jnp.asarray(scale),
        interpret=True))
    assert np.isfinite(out).all(), "fwd NaN under softmax-shift underflow"

    with _interpret_flat():

        def loss(a):
            return (wa.window_attention_flat(*a) ** 2).sum()

        grads = jax.grad(loss)(tuple(map(jnp.asarray, (qkv, bias, scale))))
        grads_v1 = jax.grad(
            lambda a: (wa.window_attention_flat(*a, bwd_v2=False) ** 2).sum()
        )(tuple(map(jnp.asarray, (qkv, bias, scale))))
    for g, g1 in zip(grads, grads_v1):
        assert np.isfinite(np.asarray(g)).all(), \
            "v2 bwd NaN/inf under softmax-shift underflow"
        assert np.isfinite(np.asarray(g1)).all(), \
            "v1 bwd NaN/inf under softmax-shift underflow"


def test_flat_custom_vjp_gradients_match():
    import mvuld_tpu.ops.window_attention as wa
    qkv, bias, scale = _flat_inputs(seed=4)
    mask = shifted_window_mask(8, 8, 4, 2)

    def ref_loss(a):
        return (wa.window_attention_flat_reference(*a, mask) ** 2).sum()

    want = jax.grad(ref_loss)(tuple(map(jnp.asarray, (qkv, bias, scale))))

    with _interpret_flat():

        def fused_loss(a):
            return (wa.window_attention_flat(*a, shift=2, nWh=2, nWw=2)
                    ** 2).sum()

        got = jax.grad(fused_loss)(tuple(map(jnp.asarray, (qkv, bias, scale))))

        def fused_loss_v1(a):
            return (wa.window_attention_flat(*a, shift=2, nWh=2, nWw=2,
                                             bwd_v2=False) ** 2).sum()

        got_v1 = jax.grad(fused_loss_v1)(
            tuple(map(jnp.asarray, (qkv, bias, scale))))
    for g, g1, w in zip(got, got_v1, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-4, rtol=1e-3)
        # the v2 backward (forward-saved rowsums + rowsum(g·o) identity)
        # must agree with the v1 backward to fp32 accumulation noise
        np.testing.assert_allclose(np.asarray(g), np.asarray(g1),
                                   atol=2e-4, rtol=1e-3)


def test_flat_bwd2_tn_dots_parity(monkeypatch):
    """The transposed-operand dv/dk contraction variant (MVULD_ATTN_TN_DOTS,
    a perf A/B knob) must compute identical gradients."""
    import mvuld_tpu.ops.window_attention as wa
    qkv, bias, scale = _flat_inputs(seed=9)
    args = tuple(map(jnp.asarray, (qkv, bias, scale)))

    def loss(a):
        return (wa.window_attention_flat(*a, shift=2, nWh=2, nWw=2) ** 2).sum()

    with _interpret_flat():
        monkeypatch.setenv("MVULD_ATTN_TN_DOTS", "0")
        base = jax.grad(loss)(args)
        monkeypatch.setenv("MVULD_ATTN_TN_DOTS", "1")
        wa._make_flat_attach_grad.cache_clear()
        tn = jax.grad(loss)(args)
    for a, b in zip(base, tn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_model_pallas_bf16_path_close():
    """The production config (bf16 model dtype + flat pallas kernels) must
    stay within bf16 rounding of the fp32 XLA path."""
    import mvuld_tpu.ops.window_attention as wa
    from mvuld_tpu.models.swin_v2 import SwinTransformerV2, SwinV2Config

    cfg = SwinV2Config(img_size=32, patch_size=4, in_chans=3, num_classes=2,
                       embed_dim=16, depths=(2,), num_heads=(2,),
                       window_size=4, drop_rate=0.0, attn_drop_rate=0.0,
                       drop_path_rate=0.0, pretrained_window_sizes=(0,))
    x = jnp.asarray(np.random.RandomState(1).randn(2, 32, 32, 3), jnp.float32)
    model_xla = SwinTransformerV2(cfg)
    variables = model_xla.init(jax.random.PRNGKey(0), x)
    want = np.asarray(model_xla.apply(variables, x))

    with _interpret_flat():
        import dataclasses
        cfg16 = dataclasses.replace(cfg, dtype=jnp.bfloat16)
        model_p = SwinTransformerV2(cfg16, use_pallas=True)
        got = np.asarray(model_p.apply(variables, x))
        np.testing.assert_allclose(got, want, atol=0.15, rtol=0.1)

        def loss_p(p):
            return (model_p.apply({"params": p}, x).astype(jnp.float32)
                    ** 2).sum()

        gp = jax.grad(loss_p)(variables["params"])   # must trace + be finite
        for leaf in jax.tree_util.tree_leaves(gp):
            assert np.isfinite(np.asarray(leaf, np.float32)).all()


def test_flat_mask_branch_parity(monkeypatch):
    """MVULD_ATTN_MASK_BRANCH=1 (perf A/B knob): interior windows of a
    shifted grid take the no-mask pl.when branch — results must be
    IDENTICAL to the unconditional-mask kernels on every window (the 2x2
    grid has one interior + three boundary windows, so both branches
    execute)."""
    import mvuld_tpu.ops.window_attention as wa

    qkv, bias, scale = _flat_inputs(seed=13)
    mask = shifted_window_mask(8, 8, 4, 2)      # nWh = nWw = 2

    # forward: explicit param, against the XLA reference
    want = np.asarray(wa.window_attention_flat_reference(
        jnp.asarray(qkv), jnp.asarray(bias), jnp.asarray(scale), mask))
    got = np.asarray(wa.pallas_window_attention_flat(
        jnp.asarray(qkv), jnp.asarray(bias), jnp.asarray(scale), shift=2,
        nWh=2, nWw=2, interpret=True, mask_branch=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    # gradients: env knob through the full autodiff path (v2 backward)
    args = tuple(map(jnp.asarray, (qkv, bias, scale)))

    def loss(a):
        return (wa.window_attention_flat(*a, shift=2, nWh=2, nWw=2) ** 2).sum()

    with _interpret_flat():
        monkeypatch.setenv("MVULD_ATTN_MASK_BRANCH", "0")
        base = jax.grad(loss)(args)
        monkeypatch.setenv("MVULD_ATTN_MASK_BRANCH", "1")
        branched = jax.grad(loss)(args)
    for a, b in zip(base, branched):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)


def test_flat_bwd2_pipelined_parity(monkeypatch):
    """MVULD_ATTN_BWD=v4 (software-pipelined emission order of the v2/v3
    backward body — head gi's MXU dots after head gi+1's VPU chain) must
    compute bit-level-identical math; only scheduling differs."""
    import mvuld_tpu.ops.window_attention as wa
    qkv, bias, scale = _flat_inputs(seed=13)
    args = tuple(map(jnp.asarray, (qkv, bias, scale)))

    def loss(a):
        return (wa.window_attention_flat(*a, shift=2, nWh=2, nWw=2) ** 2).sum()

    with _interpret_flat():
        monkeypatch.setenv("MVULD_ATTN_BWD", "v2")
        wa._make_flat_attach_grad.cache_clear()
        base = jax.grad(loss)(args)
        monkeypatch.setenv("MVULD_ATTN_BWD", "v4")
        wa._make_flat_attach_grad.cache_clear()
        piped = jax.grad(loss)(args)
        wa._make_flat_attach_grad.cache_clear()
    for a, b in zip(base, piped):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)
