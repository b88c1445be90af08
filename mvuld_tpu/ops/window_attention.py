"""Pallas TPU kernel: fused SwinV2 cosine window attention.

The hot loop of the image backbone (SURVEY §3.1: WindowAttention.forward is
the innermost hot loop; 784-token windows at 448²). The XLA composition
materializes the [B·nW, H, N, N] attention tensor in HBM between softmax and
the value matmul — at batch 8, stage 1, that is ~630 MB of HBM traffic per
block. This kernel keeps the whole window-attention computation in VMEM:
per (window, head) grid cell it loads q/k/v [N, hd], L2-normalizes in fp32,
forms scores + continuous-position bias (+ shift mask), softmaxes, and
multiplies by v — one HBM read of q/k/v and one write of the output.

Both directions are fused: the custom VJP's backward is a second Pallas
kernel (flash-style recompute of p from q/k/v, then dv/ds/dq/dk in VMEM)
with per-head dbias / dlogit_scale accumulated across the batch grid axis —
no [N, N] attention tensor ever touches HBM in training either.

Shapes: q,k,v [Bn, H, N, hd]; bias [H, N, N] (already 16·sigmoid(cpb));
mask [nW, N, N] additive shift mask or None; logit_scale [H] (already
exp-clamped). The mask is a host constant → closed over, not traced.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel_masked(q_ref, k_ref, v_ref, bias_ref, scale_ref, mask_ref, o_ref):
    _attn_body(q_ref, k_ref, v_ref, bias_ref, scale_ref, o_ref,
               mask=mask_ref[0])


def _kernel_nomask(q_ref, k_ref, v_ref, bias_ref, scale_ref, o_ref):
    _attn_body(q_ref, k_ref, v_ref, bias_ref, scale_ref, o_ref, mask=None)


def _attn_body(q_ref, k_ref, v_ref, bias_ref, scale_ref, o_ref, mask):
    q = q_ref[0, 0].astype(jnp.float32)                 # [N, hd]
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0]
    q = q * jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-12)
    k = k * jax.lax.rsqrt(jnp.sum(k * k, axis=-1, keepdims=True) + 1e-12)
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    s = s * scale_ref[0, 0, 0] + bias_ref[0].astype(jnp.float32)
    if mask is not None:
        s = s + mask.astype(jnp.float32)
    s = jax.nn.softmax(s, axis=-1)
    o_ref[0, 0] = jnp.dot(s.astype(v.dtype), v,
                          preferred_element_type=jnp.float32).astype(o_ref.dtype)


def pallas_window_attention(q, k, v, bias, logit_scale,
                            mask: Optional[np.ndarray] = None,
                            interpret: bool = False):
    """Raw fused forward (no VJP)."""
    Bn, H, N, hd = q.shape
    qkv_spec = pl.BlockSpec((1, 1, N, hd), lambda b, h: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, N, N), lambda b, h: (h, 0, 0),
                             memory_space=pltpu.VMEM)
    scale_spec = pl.BlockSpec((1, 1, 1), lambda b, h: (h, 0, 0),
                              memory_space=pltpu.VMEM)
    scale = jnp.asarray(logit_scale, jnp.float32).reshape(H, 1, 1)
    in_specs = [qkv_spec, qkv_spec, qkv_spec, bias_spec, scale_spec]
    args = [q, k, v, bias, scale]
    if mask is not None:
        nW = mask.shape[0]
        in_specs.append(pl.BlockSpec((1, N, N), lambda b, h: (b % nW, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.asarray(mask))
        kernel = _kernel_masked
    else:
        kernel = _kernel_nomask
    return pl.pallas_call(
        kernel,
        grid=(Bn, H),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, N, hd), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * Bn * H * N * N * hd,
            bytes_accessed=Bn * H * N * hd * 3 * 2 + H * N * N * 4,
            transcendentals=Bn * H * N * N,
        ),
    )(*args)


def _bwd_kernel_factory(has_mask: bool):
    def kernel(*refs):
        if has_mask:
            (q_ref, k_ref, v_ref, bias_ref, scale_ref, mask_ref, g_ref,
             dq_ref, dk_ref, dv_ref, dbias_ref, dscale_ref) = refs
            mask = mask_ref[0].astype(jnp.float32)
        else:
            (q_ref, k_ref, v_ref, bias_ref, scale_ref, g_ref,
             dq_ref, dk_ref, dv_ref, dbias_ref, dscale_ref) = refs
            mask = None
        h = pl.program_id(0)
        b = pl.program_id(1)          # batch fastest → bias block revisited

        q = q_ref[0, 0].astype(jnp.float32)
        k = k_ref[0, 0].astype(jnp.float32)
        v = v_ref[0, 0].astype(jnp.float32)
        g = g_ref[0, 0].astype(jnp.float32)
        scale = scale_ref[0, 0, 0]

        qn = jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-12)
        kn = jax.lax.rsqrt(jnp.sum(k * k, axis=-1, keepdims=True) + 1e-12)
        qh = q * qn
        kh = k * kn
        s_cos = jnp.dot(qh, kh.T, preferred_element_type=jnp.float32)
        s = s_cos * scale + bias_ref[0].astype(jnp.float32)
        if mask is not None:
            s = s + mask
        p = jax.nn.softmax(s, axis=-1)

        dv = jnp.dot(p.T, g, preferred_element_type=jnp.float32)
        dp = jnp.dot(g, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))   # [N, N]

        # accumulate dbias / dscale across the batch (b) grid axis
        @pl.when(b == 0)
        def _():
            dbias_ref[0] = jnp.zeros_like(dbias_ref[0])
            dscale_ref[h, 0] = 0.0

        dbias_ref[0] += ds.astype(dbias_ref.dtype)
        dscale_ref[h, 0] += jnp.sum(ds * s_cos)

        ds_scaled = ds * scale
        dqh = jnp.dot(ds_scaled, kh, preferred_element_type=jnp.float32)
        dkh = jnp.dot(ds_scaled.T, qh, preferred_element_type=jnp.float32)
        # backprop through x̂ = x/‖x‖: dx = (dx̂ - x̂ (x̂·dx̂)) / ‖x‖
        dq = (dqh - qh * jnp.sum(qh * dqh, axis=-1, keepdims=True)) * qn
        dk = (dkh - kh * jnp.sum(kh * dkh, axis=-1, keepdims=True)) * kn
        dq_ref[0, 0] = dq.astype(dq_ref.dtype)
        dk_ref[0, 0] = dk.astype(dk_ref.dtype)
        dv_ref[0, 0] = dv.astype(dv_ref.dtype)

    return kernel


def pallas_window_attention_bwd(q, k, v, bias, logit_scale, g,
                                mask: Optional[np.ndarray] = None,
                                interpret: bool = False):
    """Fused backward: returns (dq, dk, dv, dbias, dlogit_scale).

    Grid is (H, Bn) with batch fastest so the per-head dbias/dscale output
    blocks are revisited consecutively and accumulate in VMEM.
    """
    Bn, H, N, hd = q.shape
    qkv_spec = pl.BlockSpec((1, 1, N, hd), lambda h, b: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, N, N), lambda h, b: (h, 0, 0),
                             memory_space=pltpu.VMEM)
    scale_spec = pl.BlockSpec((1, 1, 1), lambda h, b: (h, 0, 0),
                              memory_space=pltpu.VMEM)
    scale = jnp.asarray(logit_scale, jnp.float32).reshape(H, 1, 1)
    in_specs = [qkv_spec, qkv_spec, qkv_spec, bias_spec, scale_spec]
    args = [q, k, v, bias, scale]
    if mask is not None:
        nW = mask.shape[0]
        in_specs.append(pl.BlockSpec((1, N, N), lambda h, b: (b % nW, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.asarray(mask))
    in_specs.append(qkv_spec)      # g
    args.append(g)

    out_shape = (
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct(k.shape, k.dtype),
        jax.ShapeDtypeStruct(v.shape, v.dtype),
        jax.ShapeDtypeStruct((H, N, N), jnp.float32),
        jax.ShapeDtypeStruct((H, 1), jnp.float32),   # dscale lives in SMEM
    )
    out_specs = (
        qkv_spec, qkv_spec, qkv_spec,
        pl.BlockSpec((1, N, N), lambda h, b: (h, 0, 0),
                     memory_space=pltpu.VMEM),
        # the full (H, 1) scalar accumulator lives in SMEM, shared by every
        # grid cell (block == whole array satisfies Mosaic's tiling rule)
        pl.BlockSpec((H, 1), lambda h, b: (0, 0),
                     memory_space=pltpu.SMEM),
    )
    dq, dk, dv, dbias, dscale = pl.pallas_call(
        _bwd_kernel_factory(mask is not None),
        grid=(H, Bn),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        # ~7 live fp32 [N,N] tensors per cell exceed the default 16M scoped
        # limit; v5e has far more physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)
    return dq, dk, dv, dbias, dscale.reshape(H)


def window_attention_reference(q, k, v, bias, logit_scale,
                               mask: Optional[np.ndarray] = None):
    """Plain-XLA composition (backward pass, tests, non-TPU backends)."""
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    qf = qf / jnp.sqrt(jnp.sum(qf * qf, axis=-1, keepdims=True) + 1e-12)
    kf = kf / jnp.sqrt(jnp.sum(kf * kf, axis=-1, keepdims=True) + 1e-12)
    s = jnp.einsum("bhnd,bhmd->bhnm", qf, kf)
    s = s * jnp.asarray(logit_scale, jnp.float32)[None, :, None, None]
    s = s + bias[None].astype(jnp.float32)
    if mask is not None:
        Bn, H, N, _ = s.shape
        nW = mask.shape[0]
        s = s.reshape(Bn // nW, nW, H, N, N) + jnp.asarray(mask)[None, :, None].astype(jnp.float32)
        s = s.reshape(Bn, H, N, N)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v)


@functools.lru_cache(maxsize=None)
def make_window_attention(mask_key: Optional[int] = None):
    """Build a custom-VJP window attention closed over a static mask.

    ``mask_key`` is an identity key into _MASK_STORE (masks are host
    constants; custom_vjp cannot take them as traced nondiff args).
    """
    mask = _MASK_STORE.get(mask_key) if mask_key is not None else None

    @jax.custom_vjp
    def attn(q, k, v, bias, logit_scale):
        return pallas_window_attention(q, k, v, bias, logit_scale, mask)

    def fwd(q, k, v, bias, logit_scale):
        return attn(q, k, v, bias, logit_scale), (q, k, v, bias, logit_scale)

    def bwd(res, g):
        q, k, v, bias, logit_scale = res
        dq, dk, dv, dbias, dscale = pallas_window_attention_bwd(
            q, k, v, bias, logit_scale, g, mask)
        return dq, dk, dv, dbias, dscale.astype(jnp.asarray(logit_scale).dtype)

    attn.defvjp(fwd, bwd)
    return attn


_MASK_STORE: dict = {}


def register_mask(mask: Optional[np.ndarray]) -> Optional[int]:
    if mask is None:
        return None
    key = hash(mask.tobytes())
    _MASK_STORE[key] = np.asarray(mask)
    return key


def window_attention(q, k, v, bias, logit_scale,
                     mask: Optional[np.ndarray] = None):
    """Fused window attention with autodiff (Pallas fwd, XLA-recompute bwd)."""
    return make_window_attention(register_mask(mask))(q, k, v, bias,
                                                      logit_scale)


# --------------------------------------------------------------------------- #
# map-layout kernels: windows read straight from the feature map
# --------------------------------------------------------------------------- #
# The [Bn, H, N, hd] layout above needs window_partition + a qkv transpose
# before the kernel and a head-transpose + window_reverse after — four full
# feature-map copies per block at HBM bandwidth (the measured bottleneck on
# this chip). These kernels instead take qkv AS PRODUCED by the projection
# GEMM — [B, Hp, Wp, 3, H, hd], a free reshape of [B, L, 3C] — and index
# each (window, head) tile directly out of the map via BlockSpecs, writing
# the output back in map layout [B, Hp, Wp, H, hd] (a free reshape away from
# the proj GEMM's input). Zero layout copies in either direction.


def _map_fwd_kernel_factory(has_mask: bool):
    def kernel(*refs):
        if has_mask:
            qkv_ref, bias_ref, scale_ref, mask_ref, o_ref = refs
            mask = mask_ref[0]
        else:
            qkv_ref, bias_ref, scale_ref, o_ref = refs
            mask = None
        ws, hd = qkv_ref.shape[1], qkv_ref.shape[-1]
        N = ws * ws
        q = qkv_ref[0, :, :, 0, 0, :].reshape(N, hd).astype(jnp.float32)
        k = qkv_ref[0, :, :, 1, 0, :].reshape(N, hd).astype(jnp.float32)
        v = qkv_ref[0, :, :, 2, 0, :].reshape(N, hd)
        q = q * jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-12)
        k = k * jax.lax.rsqrt(jnp.sum(k * k, axis=-1, keepdims=True) + 1e-12)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        s = s * scale_ref[0, 0, 0] + bias_ref[0].astype(jnp.float32)
        if mask is not None:
            s = s + mask.astype(jnp.float32)
        p = jax.nn.softmax(s, axis=-1)
        out = jnp.dot(p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32)
        o_ref[0, :, :, 0, :] = out.reshape(ws, ws, hd).astype(o_ref.dtype)

    return kernel


def pallas_window_attention_map(qkv, bias, logit_scale,
                                mask: Optional[np.ndarray] = None,
                                interpret: bool = False):
    """Map-layout fused forward.

    qkv: [B, Hp, Wp, 3, H, hd]; bias [H, N, N]; logit_scale [H];
    mask [nW, N, N] or None (window id = wh·nWw + ww, row-major — the
    ordering shifted_window_mask produces). Returns [B, Hp, Wp, H, hd].
    """
    B, Hp, Wp, three, H, hd = qkv.shape
    assert three == 3
    ws = int(np.sqrt(bias.shape[-1]))
    N = ws * ws
    nWh, nWw = Hp // ws, Wp // ws
    qkv_spec = pl.BlockSpec((1, ws, ws, 3, 1, hd),
                            lambda b, i, j, h: (b, i, j, 0, h, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, N, N), lambda b, i, j, h: (h, 0, 0),
                             memory_space=pltpu.VMEM)
    scale_spec = pl.BlockSpec((1, 1, 1), lambda b, i, j, h: (h, 0, 0),
                              memory_space=pltpu.VMEM)
    scale = jnp.asarray(logit_scale, jnp.float32).reshape(H, 1, 1)
    in_specs = [qkv_spec, bias_spec, scale_spec]
    args = [qkv, bias, scale]
    if mask is not None:
        in_specs.append(pl.BlockSpec(
            (1, N, N), lambda b, i, j, h: (i * nWw + j, 0, 0),
            memory_space=pltpu.VMEM))
        args.append(jnp.asarray(mask))
    return pl.pallas_call(
        _map_fwd_kernel_factory(mask is not None),
        grid=(B, nWh, nWw, H),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, ws, ws, 1, hd),
                               lambda b, i, j, h: (b, i, j, h, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wp, H, hd), qkv.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * nWh * nWw * H * N * N * hd,
            bytes_accessed=B * Hp * Wp * 4 * H * hd * 2 + H * N * N * 4,
            transcendentals=B * nWh * nWw * H * N * N,
        ),
    )(*args)


def _map_bwd_kernel_factory(has_mask: bool):
    def kernel(*refs):
        if has_mask:
            (qkv_ref, bias_ref, scale_ref, mask_ref, g_ref,
             dqkv_ref, dbias_ref, dscale_ref) = refs
            mask = mask_ref[0].astype(jnp.float32)
        else:
            (qkv_ref, bias_ref, scale_ref, g_ref,
             dqkv_ref, dbias_ref, dscale_ref) = refs
            mask = None
        h = pl.program_id(0)
        b = pl.program_id(1)
        i = pl.program_id(2)
        j = pl.program_id(3)
        ws, hd = qkv_ref.shape[1], qkv_ref.shape[-1]
        N = ws * ws

        q = qkv_ref[0, :, :, 0, 0, :].reshape(N, hd).astype(jnp.float32)
        k = qkv_ref[0, :, :, 1, 0, :].reshape(N, hd).astype(jnp.float32)
        v = qkv_ref[0, :, :, 2, 0, :].reshape(N, hd).astype(jnp.float32)
        g = g_ref[0, :, :, 0, :].reshape(N, hd).astype(jnp.float32)
        scale = scale_ref[0, 0, 0]

        qn = jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-12)
        kn = jax.lax.rsqrt(jnp.sum(k * k, axis=-1, keepdims=True) + 1e-12)
        qh = q * qn
        kh = k * kn
        s_cos = jnp.dot(qh, kh.T, preferred_element_type=jnp.float32)
        s = s_cos * scale + bias_ref[0].astype(jnp.float32)
        if mask is not None:
            s = s + mask
        p = jax.nn.softmax(s, axis=-1)

        dv = jnp.dot(p.T, g, preferred_element_type=jnp.float32)
        dp = jnp.dot(g, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))   # [N, N]

        # accumulate dbias / dscale across the (b, i, j) grid axes
        @pl.when(jnp.logical_and(b == 0, jnp.logical_and(i == 0, j == 0)))
        def _():
            dbias_ref[0] = jnp.zeros_like(dbias_ref[0])
            dscale_ref[h, 0] = 0.0

        dbias_ref[0] += ds.astype(dbias_ref.dtype)
        dscale_ref[h, 0] += jnp.sum(ds * s_cos)

        ds_scaled = ds * scale
        dqh = jnp.dot(ds_scaled, kh, preferred_element_type=jnp.float32)
        dkh = jnp.dot(ds_scaled.T, qh, preferred_element_type=jnp.float32)
        dq = (dqh - qh * jnp.sum(qh * dqh, axis=-1, keepdims=True)) * qn
        dk = (dkh - kh * jnp.sum(kh * dkh, axis=-1, keepdims=True)) * kn
        dt = dqkv_ref.dtype
        dqkv_ref[0, :, :, 0, 0, :] = dq.reshape(ws, ws, hd).astype(dt)
        dqkv_ref[0, :, :, 1, 0, :] = dk.reshape(ws, ws, hd).astype(dt)
        dqkv_ref[0, :, :, 2, 0, :] = dv.reshape(ws, ws, hd).astype(dt)

    return kernel


def pallas_window_attention_map_bwd(qkv, bias, logit_scale, g,
                                    mask: Optional[np.ndarray] = None,
                                    interpret: bool = False):
    """Map-layout fused backward: returns (dqkv, dbias, dlogit_scale).
    Grid (H, B, nWh, nWw): all batch/window axes after the head axis so the
    per-head dbias/dscale output blocks accumulate in place."""
    B, Hp, Wp, three, H, hd = qkv.shape
    ws = int(np.sqrt(bias.shape[-1]))
    N = ws * ws
    nWh, nWw = Hp // ws, Wp // ws
    qkv_spec = pl.BlockSpec((1, ws, ws, 3, 1, hd),
                            lambda h, b, i, j: (b, i, j, 0, h, 0),
                            memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((1, ws, ws, 1, hd),
                          lambda h, b, i, j: (b, i, j, h, 0),
                          memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, N, N), lambda h, b, i, j: (h, 0, 0),
                             memory_space=pltpu.VMEM)
    scale_spec = pl.BlockSpec((1, 1, 1), lambda h, b, i, j: (h, 0, 0),
                              memory_space=pltpu.VMEM)
    scale = jnp.asarray(logit_scale, jnp.float32).reshape(H, 1, 1)
    in_specs = [qkv_spec, bias_spec, scale_spec]
    args = [qkv, bias, scale]
    if mask is not None:
        in_specs.append(pl.BlockSpec(
            (1, N, N), lambda h, b, i, j: (i * nWw + j, 0, 0),
            memory_space=pltpu.VMEM))
        args.append(jnp.asarray(mask))
    in_specs.append(g_spec)
    args.append(g)

    out_shape = (
        jax.ShapeDtypeStruct(qkv.shape, qkv.dtype),
        jax.ShapeDtypeStruct((H, N, N), jnp.float32),
        jax.ShapeDtypeStruct((H, 1), jnp.float32),
    )
    out_specs = (
        qkv_spec,
        pl.BlockSpec((1, N, N), lambda h, b, i, j: (h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((H, 1), lambda h, b, i, j: (0, 0),
                     memory_space=pltpu.SMEM),
    )
    dqkv, dbias, dscale = pl.pallas_call(
        _map_bwd_kernel_factory(mask is not None),
        grid=(H, B, nWh, nWw),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)
    return dqkv, dbias, dscale.reshape(H)


def window_attention_map_reference(qkv, bias, logit_scale,
                                   mask: Optional[np.ndarray] = None):
    """Plain-XLA map-layout composition (tests, non-TPU backends)."""
    B, Hp, Wp, _, H, hd = qkv.shape
    ws = int(np.sqrt(bias.shape[-1]))
    x = qkv.reshape(B, Hp // ws, ws, Wp // ws, ws, 3, H, hd)
    x = x.transpose(0, 1, 3, 5, 6, 2, 4, 7)   # [B, nWh, nWw, 3, H, ws, ws, hd]
    x = x.reshape(-1, 3, H, ws * ws, hd)
    q, k, v = x[:, 0], x[:, 1], x[:, 2]       # [Bn, H, N, hd]
    out = window_attention_reference(q, k, v, bias, logit_scale, mask)
    out = out.reshape(B, Hp // ws, Wp // ws, H, ws, ws, hd)
    out = out.transpose(0, 1, 4, 2, 5, 3, 6)
    return out.reshape(B, Hp, Wp, H, hd)


@functools.lru_cache(maxsize=None)
def make_window_attention_map(mask_key: Optional[int] = None):
    mask = _MASK_STORE.get(mask_key) if mask_key is not None else None

    @jax.custom_vjp
    def attn(qkv, bias, logit_scale):
        return pallas_window_attention_map(qkv, bias, logit_scale, mask)

    def fwd(qkv, bias, logit_scale):
        return attn(qkv, bias, logit_scale), (qkv, bias, logit_scale)

    def bwd(res, g):
        qkv, bias, logit_scale = res
        dqkv, dbias, dscale = pallas_window_attention_map_bwd(
            qkv, bias, logit_scale, g, mask)
        return dqkv, dbias, dscale.astype(jnp.asarray(logit_scale).dtype)

    attn.defvjp(fwd, bwd)
    return attn


def window_attention_map(qkv, bias, logit_scale,
                         mask: Optional[np.ndarray] = None):
    """Map-layout fused window attention with autodiff."""
    return make_window_attention_map(register_mask(mask))(qkv, bias,
                                                          logit_scale)
