"""Pallas TPU kernels: dense layers with fused epilogues (bias+GELU, bias+LN).

The r3 whole-model profile put ~300 ms of the 905 ms SwinV2-448 train step in
XLA "GEMM fusion" ops running at 35-48% MXU utilization — the MLP fc1/fc2 and
attention proj/qkv projections whose LayerNorm/GELU epilogues XLA schedules
into the same loop as the matmul (reference hot loop:
/root/reference/mvuld/models/swin_transformer_v2.py:140-179 — torch runs these
as separate cuBLAS+eltwise kernels; the TPU-native design fuses them but must
keep the MXU fed while the VPU runs the epilogue).

These kernels take control of that schedule: weight-stationary tiling (the
full [K, N] weight is loaded to VMEM once and stays resident across the M
grid), one bf16 HBM read of x per tile, fp32 accumulation in registers, the
epilogue applied in-kernel, one bf16 write of y. Backward recomputes the
pre-epilogue activation z in a second fused kernel that emits dz plus the
[N]-vector gradient partials (db/dgamma/dbeta) via a VMEM accumulator over
the grid; the two big backward matmuls (dx = dz@Wᵀ, dW = xᵀ@dz) are plain
XLA dots — pure dots without epilogues schedule at full MXU rate.

Shapes handled: x [..., K] flattened to [M, K]; M padded to the tile size.
All SwinV2-448 call sites (K, N ∈ {128..4096}) keep W under 16 MB bf16.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LN_EPS = 1e-6


# ---------------------------------------------------------------- forward

def _fwd_kernel(x_ref, w_ref, b_ref, g_ref, bt_ref, o_ref, *, act, ln):
    z = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    z = z + b_ref[:].astype(jnp.float32)
    if act == "gelu":
        z = jax.nn.gelu(z)
    if ln:
        mu = jnp.mean(z, axis=-1, keepdims=True)
        zc = z - mu
        var = jnp.mean(zc * zc, axis=-1, keepdims=True)
        z = zc * jax.lax.rsqrt(var + _LN_EPS)
        z = z * g_ref[:].astype(jnp.float32) + bt_ref[:].astype(jnp.float32)
    o_ref[:] = z.astype(o_ref.dtype)


def _fwd_call(x2, w, b, gamma, beta, *, act, ln, tm, interpret):
    M, K = x2.shape
    N = w.shape[1]
    num_m = M // tm
    args = [x2, w, b.reshape(1, N)]
    in_specs = [
        pl.BlockSpec((tm, K), lambda m: (m, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((K, N), lambda m: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N), lambda m: (0, 0), memory_space=pltpu.VMEM),
    ]
    if ln:
        args += [gamma.reshape(1, N), beta.reshape(1, N)]
        in_specs += [
            pl.BlockSpec((1, N), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda m: (0, 0), memory_space=pltpu.VMEM),
        ]
        kernel = functools.partial(_fwd_kernel, act=act, ln=True)
    else:
        def kernel(x_ref, w_ref, b_ref, o_ref):
            _fwd_kernel(x_ref, w_ref, b_ref, None, None, o_ref,
                        act=act, ln=False)
    return pl.pallas_call(
        kernel,
        grid=(num_m,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, N), lambda m: (m, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x2.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N,
            bytes_accessed=M * K * 2 + K * N * 2 + M * N * 2,
            transcendentals=M * N if (act == "gelu") else 0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(*args)


# ---------------------------------------------------------------- backward

def _bwd_kernel(x_ref, w_ref, b_ref, g_ref, dy_ref, dz_ref, vecs_ref,
                acc_ref, *, act, ln):
    """Recompute z = x@w+b for this M-tile, turn dy into dz (through the
    LN and/or GELU epilogue), and accumulate the [N]-vector grads
    (db, dgamma, dbeta) in a VMEM scratch across the grid."""
    i = pl.program_id(0)
    z = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    z = z + b_ref[:].astype(jnp.float32)
    dy = dy_ref[:].astype(jnp.float32)
    dgamma = dbeta = None
    if act == "gelu":
        h, act_vjp = jax.vjp(jax.nn.gelu, z)
        z_post = h
    else:
        z_post = z
    if ln:
        mu = jnp.mean(z_post, axis=-1, keepdims=True)
        zc = z_post - mu
        var = jnp.mean(zc * zc, axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + _LN_EPS)
        zhat = zc * rstd
        g = g_ref[:].astype(jnp.float32)
        dgamma = jnp.sum(dy * zhat, axis=0, keepdims=True)
        dbeta = jnp.sum(dy, axis=0, keepdims=True)
        dyg = dy * g
        m1 = jnp.mean(dyg, axis=-1, keepdims=True)
        m2 = jnp.mean(dyg * zhat, axis=-1, keepdims=True)
        d_post = (dyg - m1 - zhat * m2) * rstd
    else:
        d_post = dy
    if act == "gelu":
        (dz,) = act_vjp(d_post)
    else:
        dz = d_post
    db = jnp.sum(dz, axis=0, keepdims=True)
    dz_ref[:] = dz.astype(dz_ref.dtype)

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    row = [db]
    if ln:
        row += [dgamma, dbeta]
    acc_ref[:] = acc_ref[:] + jnp.concatenate(row, axis=0)

    @pl.when(i == pl.num_programs(0) - 1)
    def _emit():
        vecs_ref[:] = acc_ref[:]


def _bwd_call(x2, w, b, gamma, dy2, *, act, ln, tm, interpret):
    M, K = x2.shape
    N = w.shape[1]
    num_m = M // tm
    nvec = 3 if ln else 1                     # db (+ dgamma, dbeta)
    args = [x2, w, b.reshape(1, N)]
    in_specs = [
        pl.BlockSpec((tm, K), lambda m: (m, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((K, N), lambda m: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N), lambda m: (0, 0), memory_space=pltpu.VMEM),
    ]
    if ln:
        args.append(gamma.reshape(1, N))
        in_specs.append(pl.BlockSpec((1, N), lambda m: (0, 0),
                                     memory_space=pltpu.VMEM))
        kernel = functools.partial(_bwd_kernel, act=act, ln=True)
    else:
        def kernel(x_ref, w_ref, b_ref, dy_ref, dz_ref, vecs_ref, acc_ref):
            _bwd_kernel(x_ref, w_ref, b_ref, None, dy_ref, dz_ref, vecs_ref,
                        acc_ref, act=act, ln=False)
    args.append(dy2)
    in_specs.append(pl.BlockSpec((tm, N), lambda m: (m, 0),
                                 memory_space=pltpu.VMEM))
    dz, vecs = pl.pallas_call(
        kernel,
        grid=(num_m,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((tm, N), lambda m: (m, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nvec, N), lambda m: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, N), x2.dtype),
            jax.ShapeDtypeStruct((nvec, N), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((nvec, N), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N,
            bytes_accessed=M * K * 2 + K * N * 2 + M * N * 4,
            transcendentals=M * N if (act == "gelu") else 0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(*args)
    return dz, vecs


# ---------------------------------------------------------------- wrappers

def _pad_rows(x2, tm):
    M = x2.shape[0]
    pad = (-M) % tm
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    return x2, M


def _pick_tm(M, K, N, dtype_bytes=2):
    for tm in (512, 256, 128, 64, 32, 16):
        if M % tm == 0 or M > tm:
            return tm
    return 16


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused_dense(x, w, b, gamma, beta, act, ln, interpret):
    return _fused_dense_fwd(x, w, b, gamma, beta, act, ln, interpret)[0]


def _fused_dense_fwd(x, w, b, gamma, beta, act, ln, interpret):
    K = x.shape[-1]
    N = w.shape[1]
    lead = x.shape[:-1]
    tm = _pick_tm(int(np.prod(lead)), K, N)
    x2, M = _pad_rows(x.reshape(-1, K), tm)
    wb = w.astype(x.dtype)
    y = _fwd_call(x2, wb, b, gamma, beta, act=act, ln=ln, tm=tm,
                  interpret=interpret)
    y = y[:M].reshape(*lead, N)
    return y, (x, w, b, gamma)


def _fused_dense_bwd(act, ln, interpret, res, dy):
    x, w, b, gamma = res
    K = x.shape[-1]
    N = w.shape[1]
    lead = x.shape[:-1]
    tm = _pick_tm(int(np.prod(lead)), K, N)
    x2, M = _pad_rows(x.reshape(-1, K), tm)
    dy2, _ = _pad_rows(dy.reshape(-1, N).astype(x.dtype), tm)
    wb = w.astype(x.dtype)
    dz, vecs = _bwd_call(x2, wb, b, gamma, dy2, act=act, ln=ln, tm=tm,
                         interpret=interpret)
    # the two large backward matmuls as PURE dots (no epilogues to schedule)
    dx = jax.lax.dot_general(dz, wb, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dw = jax.lax.dot_general(x2, dz, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dx = dx[:M].reshape(x.shape).astype(x.dtype)
    db = vecs[0].astype(b.dtype)
    dgamma = vecs[1].astype(gamma.dtype) if ln else None
    dbeta = vecs[2] if ln else None
    if ln:
        return (dx, dw.astype(w.dtype), db, dgamma,
                dbeta.astype(gamma.dtype))
    return dx, dw.astype(w.dtype), db, jnp.zeros_like(gamma), \
        jnp.zeros_like(gamma)


_fused_dense.defvjp(_fused_dense_fwd, _fused_dense_bwd)


def dense_act(x, w, b, act: str = "gelu", interpret: bool = False):
    """act(x @ w + b) with the activation fused into the matmul epilogue.

    x [..., K] (bf16 in the production path), w [K, N] fp32 params,
    b [N]. Returns [..., N] in x.dtype.
    """
    dummy = jnp.zeros((w.shape[1],), jnp.float32)
    return _fused_dense(x, w, b, dummy, dummy, act, False, interpret)


def dense_ln(x, w, b, gamma, beta, act: str = "none",
             interpret: bool = False):
    """LayerNorm(act(x @ w + b)) * gamma + beta — the SwinV2 post-norm
    pattern (proj+norm1, fc2+norm2) in one weight-stationary kernel."""
    return _fused_dense(x, w, b, gamma, beta, act, True, interpret)
