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


def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (|err| ≤ 1.5e-7): Mosaic has no
    erf/erfc lowering, and 1.5e-7 is ~4 decades below bf16 output rounding."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(z):
    # EXACT-erf GELU — the model uses nn.gelu(approximate=False)
    # (models/swin_v2.py MlpBlock), matching the reference's torch nn.GELU.
    # jax.nn.gelu(approximate=False) lowers to erfc, which Pallas TPU lacks,
    # so the erf is inlined (A&S polynomial, negligible vs bf16 rounding).
    return 0.5 * z * (1.0 + _erf(z * 0.7071067811865476))


# ---------------------------------------------------------------- forward

def _fwd_kernel(x_ref, w_ref, b_ref, g_ref, bt_ref, o_ref, *, act, ln):
    z = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    z = z + b_ref[:].astype(jnp.float32)
    if act == "gelu":
        z = _gelu(z)
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
        h, act_vjp = jax.vjp(_gelu, z)
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


# ------------------------------------------------- fused MLP block (+ LN)

def _mlp_fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, bt_ref,
                    o_ref):
    """y = LN(GELU(x@w1+b1)@w2+b2)·gamma+beta for one M-tile, entirely in
    VMEM: the [TM, Hd] intermediate never touches HBM (the r4 profile put
    28.6 ms/step in the XLA remat recompute writing it back, fusion.4117)."""
    h = jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
    h = _gelu(h + b1_ref[:].astype(jnp.float32))
    z = jnp.dot(h.astype(x_ref.dtype), w2_ref[:],
                preferred_element_type=jnp.float32)
    z = z + b2_ref[:].astype(jnp.float32)
    mu = jnp.mean(z, axis=-1, keepdims=True)
    zc = z - mu
    var = jnp.mean(zc * zc, axis=-1, keepdims=True)
    y = zc * jax.lax.rsqrt(var + _LN_EPS)
    y = y * g_ref[:].astype(jnp.float32) + bt_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


def _mlp_bwd_kernel(x_ref, dy_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref,
                    w1t_ref, w2t_ref,
                    dx_ref, dw1_ref, dw2_ref, vh_ref, vc_ref,
                    dw1_acc, dw2_acc, vh_acc, vc_acc):
    """One-pass backward for the fused MLP+LN: recompute h/z for this
    M-tile in VMEM, run the LN→fc2→GELU→fc1 chain backward, accumulate
    dW1/dW2/db1/db2/dgamma/dbeta in VMEM scratch across the grid, and
    write only dx to HBM."""
    i = pl.program_id(0)
    x = x_ref[:]
    dy = dy_ref[:].astype(jnp.float32)
    h_pre = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    h_pre = h_pre + b1_ref[:].astype(jnp.float32)
    h, gelu_vjp = jax.vjp(_gelu, h_pre)
    hb = h.astype(x.dtype)
    z = jnp.dot(hb, w2_ref[:], preferred_element_type=jnp.float32)
    z = z + b2_ref[:].astype(jnp.float32)
    mu = jnp.mean(z, axis=-1, keepdims=True)
    zc = z - mu
    var = jnp.mean(zc * zc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _LN_EPS)
    zhat = zc * rstd

    g = g_ref[:].astype(jnp.float32)
    dgamma = jnp.sum(dy * zhat, axis=0, keepdims=True)
    dbeta = jnp.sum(dy, axis=0, keepdims=True)
    dyg = dy * g
    m1 = jnp.mean(dyg, axis=-1, keepdims=True)
    m2 = jnp.mean(dyg * zhat, axis=-1, keepdims=True)
    dz = (dyg - m1 - zhat * m2) * rstd
    db2 = jnp.sum(dz, axis=0, keepdims=True)

    dzb = dz.astype(x.dtype)
    dh = jnp.dot(dzb, w2t_ref[:], preferred_element_type=jnp.float32)
    (dh_pre,) = gelu_vjp(dh)
    db1 = jnp.sum(dh_pre, axis=0, keepdims=True)
    dhb = dh_pre.astype(x.dtype)
    dx_ref[:] = jnp.dot(dhb, w1t_ref[:],
                        preferred_element_type=jnp.float32).astype(
                            dx_ref.dtype)

    # parameter-grad partials, contracted over the tile's M rows
    dw2_part = jax.lax.dot_general(hb, dzb, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    dw1_part = jax.lax.dot_general(x, dhb, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _init():
        dw1_acc[:] = jnp.zeros_like(dw1_acc)
        dw2_acc[:] = jnp.zeros_like(dw2_acc)
        vh_acc[:] = jnp.zeros_like(vh_acc)
        vc_acc[:] = jnp.zeros_like(vc_acc)

    dw1_acc[:] = dw1_acc[:] + dw1_part
    dw2_acc[:] = dw2_acc[:] + dw2_part
    vh_acc[:] = vh_acc[:] + db1
    vc_acc[:] = vc_acc[:] + jnp.concatenate([db2, dgamma, dbeta], axis=0)

    @pl.when(i == pl.num_programs(0) - 1)
    def _emit():
        dw1_ref[:] = dw1_acc[:]
        dw2_ref[:] = dw2_acc[:]
        vh_ref[:] = vh_acc[:]
        vc_ref[:] = vc_acc[:]


def _mlp_vmem_bytes(tm, C, Hd):
    weights = 2 * 2 * C * Hd * 2 * 2          # w1,w2 (+transposes) ×dbuf-ish
    accs = 2 * C * Hd * 4
    tiles = tm * (C * 4 + Hd * 4) * 4
    return weights + accs + tiles


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def mlp_ln(x, w1, b1, w2, b2, gamma, beta, interpret=False):
    """LayerNorm(MLP(x)) — SwinBlockV2's entire second half
    (models/swin_v2.py:486-489; reference Mlp + norm2,
    swin_transformer_v2.py:140-179,310-315) as ONE fused op: forward and
    backward each make a single pass over HBM; the [M, 4C] hidden
    activation lives only in VMEM. Dropout-free path (DROP_RATE=0 in the
    fine-tune configs); DropPath/residual stay outside."""
    return _mlp_ln_fwd(x, w1, b1, w2, b2, gamma, beta, interpret)[0]


def _mlp_tile(M, C, Hd):
    for tm in (256, 128, 64, 32, 16):
        if _mlp_vmem_bytes(tm, C, Hd) < 100 * 2 ** 20:
            return tm
    return 16


def _mlp_ln_fwd(x, w1, b1, w2, b2, gamma, beta, interpret):
    C, Hd = w1.shape
    lead = x.shape[:-1]
    tm = _mlp_tile(int(np.prod(lead)), C, Hd)
    x2, M = _pad_rows(x.reshape(-1, C), tm)
    num_m = x2.shape[0] // tm
    w1b, w2b = w1.astype(x.dtype), w2.astype(x.dtype)
    row = lambda v: v.reshape(1, -1)          # noqa: E731
    y = pl.pallas_call(
        _mlp_fwd_kernel,
        grid=(num_m,),
        in_specs=[
            pl.BlockSpec((tm, C), lambda m: (m, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Hd), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hd), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Hd, C), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda m: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, C), lambda m: (m, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x2.shape[0], C), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * M * C * Hd,
            bytes_accessed=2 * M * C * 2 + 2 * C * Hd * 2,
            transcendentals=M * Hd),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2 ** 20),
    )(x2, w1b, row(b1), w2b, row(b2), row(gamma), row(beta))
    return y[:M].reshape(*lead, C), (x, w1, b1, w2, b2, gamma)


def _mlp_ln_bwd(interpret, res, dy):
    x, w1, b1, w2, b2, gamma = res
    C, Hd = w1.shape
    lead = x.shape[:-1]
    tm = _mlp_tile(int(np.prod(lead)), C, Hd)
    x2, M = _pad_rows(x.reshape(-1, C), tm)
    dy2, _ = _pad_rows(dy.reshape(-1, C).astype(x.dtype), tm)
    num_m = x2.shape[0] // tm
    w1b, w2b = w1.astype(x.dtype), w2.astype(x.dtype)
    row = lambda v: v.reshape(1, -1)          # noqa: E731
    const = lambda spec: pl.BlockSpec(spec, lambda m: (0,) * len(spec),  # noqa: E731
                                      memory_space=pltpu.VMEM)
    dx, dw1, dw2, vh, vc = pl.pallas_call(
        _mlp_bwd_kernel,
        grid=(num_m,),
        in_specs=[
            pl.BlockSpec((tm, C), lambda m: (m, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, C), lambda m: (m, 0), memory_space=pltpu.VMEM),
            const((C, Hd)), const((1, Hd)), const((Hd, C)), const((1, C)),
            const((1, C)), const((Hd, C)), const((C, Hd)),
        ],
        out_specs=[
            pl.BlockSpec((tm, C), lambda m: (m, 0), memory_space=pltpu.VMEM),
            const((C, Hd)), const((Hd, C)), const((1, Hd)), const((3, C)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((x2.shape[0], C), x.dtype),
            jax.ShapeDtypeStruct((C, Hd), jnp.float32),
            jax.ShapeDtypeStruct((Hd, C), jnp.float32),
            jax.ShapeDtypeStruct((1, Hd), jnp.float32),
            jax.ShapeDtypeStruct((3, C), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((C, Hd), jnp.float32),
            pltpu.VMEM((Hd, C), jnp.float32),
            pltpu.VMEM((1, Hd), jnp.float32),
            pltpu.VMEM((3, C), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=12 * M * C * Hd,
            bytes_accessed=3 * M * C * 2 + 4 * C * Hd * 2,
            transcendentals=2 * M * Hd),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2 ** 20),
    )(x2, dy2, w1b, row(b1), w2b, row(b2), row(gamma),
      jnp.swapaxes(w1b, 0, 1), jnp.swapaxes(w2b, 0, 1))
    dx = dx[:M].reshape(x.shape)
    return (dx, dw1.astype(w1.dtype), vh[0].astype(b1.dtype),
            dw2.astype(w2.dtype), vc[0].astype(b2.dtype),
            vc[1].astype(gamma.dtype), vc[2].astype(gamma.dtype))


mlp_ln.defvjp(_mlp_ln_fwd, _mlp_ln_bwd)


# ------------------------------------------------- residual variant (BERT)
# y = LN(x + dropout(fc2(GELU(fc1(x))) + b2)) — the post-LN transformer
# MLP half (RobertaLayer: models/roberta.py TransformerLayer, reference
# unixcoder.py's HF RobertaModel). Kept as SEPARATE kernels from mlp_ln:
# the swin bench's persistent compile cache keys on the exact HLO of
# _mlp_fwd_kernel/_mlp_bwd_kernel, so those must stay byte-identical.
# The dropout mask is a uint8 operand generated by XLA threefry outside
# the kernel (pltpu.prng_* has no CPU-interpret lowering, and the mask's
# [M, C] bytes are 1/8th of the [M, 4C] hidden the kernel keeps off HBM).

_BERT_LN_EPS = 1e-5   # HF RobertaConfig.layer_norm_eps


def _mlp_res_fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref,
                        bt_ref, mask_ref, o_ref, *, keep_prob):
    h = jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
    h = _gelu(h + b1_ref[:].astype(jnp.float32))
    z = jnp.dot(h.astype(x_ref.dtype), w2_ref[:],
                preferred_element_type=jnp.float32)
    z = z + b2_ref[:].astype(jnp.float32)
    if keep_prob < 1.0:
        z = z * (mask_ref[:].astype(jnp.float32) / keep_prob)
    z = z + x_ref[:].astype(jnp.float32)          # post-LN residual
    mu = jnp.mean(z, axis=-1, keepdims=True)
    zc = z - mu
    var = jnp.mean(zc * zc, axis=-1, keepdims=True)
    y = zc * jax.lax.rsqrt(var + _BERT_LN_EPS)
    y = y * g_ref[:].astype(jnp.float32) + bt_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


def _mlp_res_bwd_kernel(x_ref, dy_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                        g_ref, w1t_ref, w2t_ref, mask_ref,
                        dx_ref, dw1_ref, dw2_ref, vh_ref, vc_ref,
                        dw1_acc, dw2_acc, vh_acc, vc_acc, *, keep_prob):
    """Backward of the residual MLP+LN: recompute h/z for the tile in
    VMEM (same mask operand → identical dropout), run LN→(residual ⊕
    dropout∘fc2∘GELU∘fc1) backward, accumulate parameter grads in VMEM
    scratch, write only dx."""
    i = pl.program_id(0)
    x = x_ref[:]
    dy = dy_ref[:].astype(jnp.float32)
    h_pre = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    h_pre = h_pre + b1_ref[:].astype(jnp.float32)
    h, gelu_vjp = jax.vjp(_gelu, h_pre)
    hb = h.astype(x.dtype)
    z = jnp.dot(hb, w2_ref[:], preferred_element_type=jnp.float32)
    z = z + b2_ref[:].astype(jnp.float32)
    if keep_prob < 1.0:
        scaled_mask = mask_ref[:].astype(jnp.float32) / keep_prob
        z = z * scaled_mask
    z = z + x.astype(jnp.float32)
    mu = jnp.mean(z, axis=-1, keepdims=True)
    zc = z - mu
    var = jnp.mean(zc * zc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _BERT_LN_EPS)
    zhat = zc * rstd

    g = g_ref[:].astype(jnp.float32)
    dgamma = jnp.sum(dy * zhat, axis=0, keepdims=True)
    dbeta = jnp.sum(dy, axis=0, keepdims=True)
    dyg = dy * g
    m1 = jnp.mean(dyg, axis=-1, keepdims=True)
    m2 = jnp.mean(dyg * zhat, axis=-1, keepdims=True)
    dz = (dyg - m1 - zhat * m2) * rstd            # d(LN input)
    dz_mlp = dz * scaled_mask if keep_prob < 1.0 else dz
    db2 = jnp.sum(dz_mlp, axis=0, keepdims=True)

    dzb = dz_mlp.astype(x.dtype)
    dh = jnp.dot(dzb, w2t_ref[:], preferred_element_type=jnp.float32)
    (dh_pre,) = gelu_vjp(dh)
    db1 = jnp.sum(dh_pre, axis=0, keepdims=True)
    dhb = dh_pre.astype(x.dtype)
    dx = jnp.dot(dhb, w1t_ref[:], preferred_element_type=jnp.float32)
    dx_ref[:] = (dx + dz).astype(dx_ref.dtype)    # + residual branch

    dw2_part = jax.lax.dot_general(hb, dzb, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    dw1_part = jax.lax.dot_general(x, dhb, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _init():
        dw1_acc[:] = jnp.zeros_like(dw1_acc)
        dw2_acc[:] = jnp.zeros_like(dw2_acc)
        vh_acc[:] = jnp.zeros_like(vh_acc)
        vc_acc[:] = jnp.zeros_like(vc_acc)

    dw1_acc[:] = dw1_acc[:] + dw1_part
    dw2_acc[:] = dw2_acc[:] + dw2_part
    vh_acc[:] = vh_acc[:] + db1
    vc_acc[:] = vc_acc[:] + jnp.concatenate([db2, dgamma, dbeta], axis=0)

    @pl.when(i == pl.num_programs(0) - 1)
    def _emit():
        dw1_ref[:] = dw1_acc[:]
        dw2_ref[:] = dw2_acc[:]
        vh_ref[:] = vh_acc[:]
        vc_ref[:] = vc_acc[:]


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def mlp_ln_res(x, w1, b1, w2, b2, gamma, beta, mask, keep_prob=1.0,
               interpret=False):
    """LayerNorm(x + dropout(MLP(x))) — the post-LN transformer MLP half
    as ONE fused op (HF Roberta semantics, layer_norm_eps 1e-5): forward
    and backward each make a single pass over HBM; the [M, 4C] hidden
    lives only in VMEM. ``mask`` is a {0,1} dropout keep-mask of x's
    shape and dtype (Mosaic cannot cast integer refs; 0/1 are exact in
    bf16). Ignored when keep_prob == 1.0 — pass any placeholder."""
    return _mlp_ln_res_fwd(x, w1, b1, w2, b2, gamma, beta, mask,
                           keep_prob, interpret)[0]


def _mlp_ln_res_fwd(x, w1, b1, w2, b2, gamma, beta, mask, keep_prob,
                    interpret):
    C, Hd = w1.shape
    lead = x.shape[:-1]
    tm = _mlp_tile(int(np.prod(lead)), C, Hd)
    x2, M = _pad_rows(x.reshape(-1, C), tm)
    mask2, _ = _pad_rows(mask.reshape(-1, C), tm)
    num_m = x2.shape[0] // tm
    w1b, w2b = w1.astype(x.dtype), w2.astype(x.dtype)
    row = lambda v: v.reshape(1, -1)          # noqa: E731
    tile = lambda: pl.BlockSpec((tm, C), lambda m: (m, 0),  # noqa: E731
                                memory_space=pltpu.VMEM)
    const = lambda spec: pl.BlockSpec(spec, lambda m: (0,) * len(spec),  # noqa: E731
                                      memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        functools.partial(_mlp_res_fwd_kernel, keep_prob=float(keep_prob)),
        grid=(num_m,),
        in_specs=[tile(), const((C, Hd)), const((1, Hd)), const((Hd, C)),
                  const((1, C)), const((1, C)), const((1, C)), tile()],
        out_specs=tile(),
        out_shape=jax.ShapeDtypeStruct((x2.shape[0], C), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * M * C * Hd,
            bytes_accessed=3 * M * C * 2 + 2 * C * Hd * 2,
            transcendentals=M * Hd),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2 ** 20),
    )(x2, w1b, row(b1), w2b, row(b2), row(gamma), row(beta), mask2)
    return y[:M].reshape(*lead, C), (x, w1, b1, w2, b2, gamma, mask)


def _mlp_ln_res_bwd(keep_prob, interpret, res, dy):
    x, w1, b1, w2, b2, gamma, mask = res
    C, Hd = w1.shape
    lead = x.shape[:-1]
    tm = _mlp_tile(int(np.prod(lead)), C, Hd)
    x2, M = _pad_rows(x.reshape(-1, C), tm)
    dy2, _ = _pad_rows(dy.reshape(-1, C).astype(x.dtype), tm)
    mask2, _ = _pad_rows(mask.reshape(-1, C), tm)
    num_m = x2.shape[0] // tm
    w1b, w2b = w1.astype(x.dtype), w2.astype(x.dtype)
    row = lambda v: v.reshape(1, -1)          # noqa: E731
    tile = lambda: pl.BlockSpec((tm, C), lambda m: (m, 0),  # noqa: E731
                                memory_space=pltpu.VMEM)
    const = lambda spec: pl.BlockSpec(spec, lambda m: (0,) * len(spec),  # noqa: E731
                                      memory_space=pltpu.VMEM)
    dx, dw1, dw2, vh, vc = pl.pallas_call(
        functools.partial(_mlp_res_bwd_kernel, keep_prob=float(keep_prob)),
        grid=(num_m,),
        in_specs=[tile(), tile(),
                  const((C, Hd)), const((1, Hd)), const((Hd, C)),
                  const((1, C)), const((1, C)), const((Hd, C)),
                  const((C, Hd)), tile()],
        out_specs=[tile(), const((C, Hd)), const((Hd, C)), const((1, Hd)),
                   const((3, C))],
        out_shape=[
            jax.ShapeDtypeStruct((x2.shape[0], C), x.dtype),
            jax.ShapeDtypeStruct((C, Hd), jnp.float32),
            jax.ShapeDtypeStruct((Hd, C), jnp.float32),
            jax.ShapeDtypeStruct((1, Hd), jnp.float32),
            jax.ShapeDtypeStruct((3, C), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((C, Hd), jnp.float32),
            pltpu.VMEM((Hd, C), jnp.float32),
            pltpu.VMEM((1, Hd), jnp.float32),
            pltpu.VMEM((3, C), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=12 * M * C * Hd,
            bytes_accessed=4 * M * C * 2 + 4 * C * Hd * 2,
            transcendentals=2 * M * Hd),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2 ** 20),
    )(x2, dy2, w1b, row(b1), w2b, row(b2), row(gamma),
      jnp.swapaxes(w1b, 0, 1), jnp.swapaxes(w2b, 0, 1), mask2)
    dx = dx[:M].reshape(x.shape)
    return (dx, dw1.astype(w1.dtype), vh[0].astype(b1.dtype),
            dw2.astype(w2.dtype), vc[0].astype(b2.dtype),
            vc[1].astype(gamma.dtype), vc[2].astype(gamma.dtype),
            jnp.zeros_like(mask))


mlp_ln_res.defvjp(_mlp_ln_res_fwd, _mlp_ln_res_bwd)
