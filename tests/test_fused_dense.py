"""Fused dense (GEMM+epilogue) Pallas kernels vs pure-XLA reference.

Covers ops/fused_dense.py: forward values and ALL gradients (dx, dw, db,
dgamma, dbeta) for the bias+GELU and bias(+GELU)+LayerNorm epilogues, in
interpret mode on CPU, including the non-tile-aligned M path (row padding).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvuld_tpu.ops.fused_dense import dense_act, dense_ln


def _ref_act(x, w, b, act):
    z = x.astype(jnp.float32) @ w + b
    if act == "gelu":
        z = jax.nn.gelu(z, approximate=False)
    return z.astype(x.dtype)


def _ref_ln(x, w, b, gamma, beta, act="none"):
    z = x.astype(jnp.float32) @ w + b
    if act == "gelu":
        z = jax.nn.gelu(z, approximate=False)
    mu = z.mean(-1, keepdims=True)
    var = ((z - mu) ** 2).mean(-1, keepdims=True)
    y = (z - mu) * jax.lax.rsqrt(var + 1e-6) * gamma + beta
    return y.astype(x.dtype)


def _setup(M=48, K=32, N=64, dtype=jnp.float32, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(M, K), dtype)
    w = jnp.asarray(rng.randn(K, N) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(N) * 0.1, jnp.float32)
    gamma = jnp.asarray(1 + 0.1 * rng.randn(N), jnp.float32)
    beta = jnp.asarray(0.1 * rng.randn(N), jnp.float32)
    return x, w, b, gamma, beta


@pytest.mark.parametrize("act", ["none", "gelu"])
def test_dense_act_fwd_bwd(act):
    x, w, b, _, _ = _setup()
    y = dense_act(x, w, b, act=act, interpret=True)
    y_ref = _ref_act(x, w, b, act)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)

    def loss(fn):
        def f(x, w, b):
            out = fn(x, w, b)
            return (out.astype(jnp.float32) ** 2).sum()
        return f

    g = jax.grad(loss(lambda x, w, b: dense_act(x, w, b, act=act,
                                                interpret=True)),
                 argnums=(0, 1, 2))(x, w, b)
    g_ref = jax.grad(loss(lambda x, w, b: _ref_act(x, w, b, act)),
                     argnums=(0, 1, 2))(x, w, b)
    for got, ref in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("act", ["none", "gelu"])
def test_dense_ln_fwd_bwd(act):
    x, w, b, gamma, beta = _setup(seed=1)
    y = dense_ln(x, w, b, gamma, beta, act=act, interpret=True)
    y_ref = _ref_ln(x, w, b, gamma, beta, act)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)

    def loss(fn):
        def f(x, w, b, gamma, beta):
            out = fn(x, w, b, gamma, beta)
            return (out.astype(jnp.float32) ** 3).sum()
        return f

    g = jax.grad(loss(lambda *a: dense_ln(*a, act=act, interpret=True)),
                 argnums=(0, 1, 2, 3, 4))(x, w, b, gamma, beta)
    g_ref = jax.grad(loss(lambda *a: _ref_ln(*a, act=act)),
                     argnums=(0, 1, 2, 3, 4))(x, w, b, gamma, beta)
    names = ["dx", "dw", "db", "dgamma", "dbeta"]
    for name, got, ref in zip(names, g, g_ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=3e-4, atol=3e-4, err_msg=name)


def test_dense_ln_unaligned_rows():
    # M=50 not divisible by any tile: exercises the pad-and-slice path
    x, w, b, gamma, beta = _setup(M=50, K=16, N=32, seed=2)
    y = dense_ln(x, w, b, gamma, beta, interpret=True)
    y_ref = _ref_ln(x, w, b, gamma, beta)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)
    g = jax.grad(lambda x: (dense_ln(x, w, b, gamma, beta, interpret=True)
                            .astype(jnp.float32) ** 2).sum())(x)
    g_ref = jax.grad(lambda x: (_ref_ln(x, w, b, gamma, beta)
                                .astype(jnp.float32) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=3e-4, atol=3e-4)


def test_dense_ln_bf16_matches_bf16_reference():
    x, w, b, gamma, beta = _setup(M=32, K=32, N=64, dtype=jnp.bfloat16,
                                  seed=3)
    y = dense_ln(x, w, b, gamma, beta, interpret=True)
    # bf16 x with fp32 accumulation: compare against the same math in XLA
    y_ref = _ref_ln_bf16(x, w, b, gamma, beta)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32),
        rtol=2e-2, atol=2e-2)


def _ref_mlp_ln(x, w1, b1, w2, b2, gamma, beta):
    """Pure-XLA reference of the fused op: the exact model composition
    LayerNorm(fc2(GELU(fc1(x)))) with bf16 rounding at the fc1 output."""
    h = x.astype(jnp.float32) @ w1 + b1
    h = jax.nn.gelu(h, approximate=False).astype(x.dtype)
    z = h.astype(jnp.float32) @ w2 + b2
    mu = z.mean(-1, keepdims=True)
    var = ((z - mu) ** 2).mean(-1, keepdims=True)
    y = (z - mu) * jax.lax.rsqrt(var + 1e-6) * gamma + beta
    return y.astype(x.dtype)


def _mlp_setup(M=48, C=32, Hd=64, dtype=jnp.float32, seed=4):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(M, C), dtype)
    w1 = jnp.asarray(rng.randn(C, Hd) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.randn(Hd) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.randn(Hd, C) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)
    gamma = jnp.asarray(1 + 0.1 * rng.randn(C), jnp.float32)
    beta = jnp.asarray(0.1 * rng.randn(C), jnp.float32)
    return x, w1, b1, w2, b2, gamma, beta


def test_mlp_ln_fwd_bwd():
    from mvuld_tpu.ops.fused_dense import mlp_ln
    args = _mlp_setup()
    y = mlp_ln(*args, True)
    y_ref = _ref_mlp_ln(*args)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)

    def loss(fn):
        return lambda *a: (fn(*a).astype(jnp.float32) ** 3).sum()

    g = jax.grad(loss(lambda *a: mlp_ln(*a, True)),
                 argnums=tuple(range(7)))(*args)
    g_ref = jax.grad(loss(_ref_mlp_ln), argnums=tuple(range(7)))(*args)
    names = ["dx", "dw1", "db1", "dw2", "db2", "dgamma", "dbeta"]
    for name, got, ref in zip(names, g, g_ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=5e-4, atol=5e-4, err_msg=name)


def test_mlp_ln_unaligned_and_3d():
    from mvuld_tpu.ops.fused_dense import mlp_ln
    x, *ps = _mlp_setup(M=50, C=16, Hd=32, seed=5)
    x3 = x.reshape(2, 25, 16)
    y = mlp_ln(x3, *ps, True)
    y_ref = _ref_mlp_ln(x3.reshape(-1, 16), *ps).reshape(2, 25, 16)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)
    g = jax.grad(lambda x: (mlp_ln(x, *ps, True)
                            .astype(jnp.float32) ** 2).sum())(x3)
    g_ref = jax.grad(lambda x: (_ref_mlp_ln(x.reshape(-1, 16), *ps)
                                .astype(jnp.float32) ** 2).sum())(x3)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=5e-4, atol=5e-4)


def test_mlp_ln_bf16():
    from mvuld_tpu.ops.fused_dense import mlp_ln
    args = _mlp_setup(M=32, C=32, Hd=64, dtype=jnp.bfloat16, seed=6)
    y = mlp_ln(*args, True)
    y_ref = _ref_mlp_ln(args[0],
                        *[a.astype(jnp.float32) for a in args[1:]])
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(y_ref, np.float32),
                               rtol=5e-2, atol=5e-2)


def test_swin_fused_mlp_matches_standard_path():
    """SwinV2 with use_pallas_mlp: identical param tree, same logits and
    grads as the stock MlpBlock+LayerNorm composition (fp32, interpret)."""
    from mvuld_tpu.models.swin_v2 import (PallasOpts, SwinTransformerV2,
                                          SwinV2Config)
    cfg = SwinV2Config(img_size=32, patch_size=4, in_chans=3, num_classes=2,
                       embed_dim=16, depths=(1, 2), num_heads=(2, 4),
                       window_size=4, drop_path_rate=0.0)
    base = SwinTransformerV2(cfg)
    fused = SwinTransformerV2(cfg, use_pallas_mlp=True,
                              pallas_opts=PallasOpts(interpret=True))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3), jnp.float32)
    vb = base.init(jax.random.PRNGKey(0), x)
    vf = fused.init(jax.random.PRNGKey(0), x)
    flat_b = jax.tree_util.tree_leaves_with_path(vb)
    flat_f = jax.tree_util.tree_leaves_with_path(vf)
    paths_b = [jax.tree_util.keystr(p) for p, _ in flat_b]
    paths_f = [jax.tree_util.keystr(p) for p, _ in flat_f]
    assert paths_b == paths_f, "param tree must be identical"
    for (p, lb), (_, lf) in zip(flat_b, flat_f):
        assert lb.shape == lf.shape, p

    logits_b = base.apply(vb, x)
    logits_f = fused.apply(vb, x)           # same params through both paths
    np.testing.assert_allclose(np.asarray(logits_f), np.asarray(logits_b),
                               rtol=1e-4, atol=1e-4)

    def loss(model):
        return lambda v: (model.apply(v, x) ** 2).sum()

    gb = jax.grad(loss(base))(vb)
    gf = jax.grad(loss(fused))(vb)
    for (p, b_), (_, f_) in zip(jax.tree_util.tree_leaves_with_path(gb),
                                jax.tree_util.tree_leaves_with_path(gf)):
        np.testing.assert_allclose(np.asarray(f_), np.asarray(b_),
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=jax.tree_util.keystr(p))


def _ref_ln_bf16(x, w, b, gamma, beta):
    z = jax.lax.dot_general(x, w.astype(jnp.bfloat16),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + b
    mu = z.mean(-1, keepdims=True)
    var = ((z - mu) ** 2).mean(-1, keepdims=True)
    y = (z - mu) * jax.lax.rsqrt(var + 1e-6) * gamma + beta
    return y.astype(x.dtype)
