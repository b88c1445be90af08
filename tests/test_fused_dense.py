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
        z = jax.nn.gelu(z)
    return z.astype(x.dtype)


def _ref_ln(x, w, b, gamma, beta, act="none"):
    z = x.astype(jnp.float32) @ w + b
    if act == "gelu":
        z = jax.nn.gelu(z)
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


def _ref_ln_bf16(x, w, b, gamma, beta):
    z = jax.lax.dot_general(x, w.astype(jnp.bfloat16),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + b
    mu = z.mean(-1, keepdims=True)
    var = ((z - mu) ** 2).mean(-1, keepdims=True)
    y = (z - mu) * jax.lax.rsqrt(var + 1e-6) * gamma + beta
    return y.astype(x.dtype)
