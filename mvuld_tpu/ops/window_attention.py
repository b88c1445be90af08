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
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _flat_bwd_v2_default() -> bool:
    """v2 backward (forward-saved rowsum + rowsum(g·o) trick) unless
    MVULD_ATTN_BWD=v1 — see pallas_window_attention_flat_bwd2."""
    return os.environ.get("MVULD_ATTN_BWD", "v2").lower() != "v1"


def _bwd_pipelined_default() -> bool:
    """MVULD_ATTN_BWD=v4 selects the software-pipelined emission order of
    the v2/v3 backward body (head gi's MXU dots issued after head gi+1's
    VPU chain — see _flat_bwd2_body_pipelined). Same math, same residuals;
    scheduling A/B only."""
    return os.environ.get("MVULD_ATTN_BWD", "v2").lower() == "v4"


def _tn_dots_default() -> bool:
    """MVULD_ATTN_TN_DOTS=1 flips the v2 backward's dv/dk contractions to
    the transposed-operand form (perf A/B knob; same math)."""
    return os.environ.get("MVULD_ATTN_TN_DOTS", "0") == "1"


def _mxu_bf16_default(mxu_bf16: bool) -> bool:
    """MVULD_ATTN_MXU_BF16=1 runs the kernels' MXU dots in bf16 (perf A/B
    knob — for v1 the casts' extra VPU passes measured slower than the
    fp32-dot MXU time; the v2 backward shifted that balance)."""
    return mxu_bf16 or os.environ.get("MVULD_ATTN_MXU_BF16", "0") == "1"


def _mask_branch_default() -> bool:
    """MVULD_ATTN_MASK_BRANCH=1 duplicates the shifted kernels' per-head
    chain under a boundary-window branch (pl.when on the window id): the
    interior (nWh-1)·(nWw-1) of nWh·nWw windows — 225/256 at 448² — skip
    the region-mask synthesis and the [N, N] mask add entirely instead of
    adding an all-zero mask (perf A/B knob; same math)."""
    return os.environ.get("MVULD_ATTN_MASK_BRANCH", "0") == "1"


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
# each (window, head-group) tile directly out of the map via BlockSpecs,
# writing the output back in map layout [B, Hp, Wp, H, hd] (a free reshape
# away from the proj GEMM's input). Zero layout copies in either direction.
#
# Mosaic legality + HBM-traffic design:
#   * heads are processed in groups of G = 8 (or all H when H % 8 != 0), so
#     the qkv block's trailing dims (G, hd) satisfy the (8, 128)-divisible/
#     full rule — a per-head block (1, hd) does not lower;
#   * the grid is (H/G, B, nWh, nWw) with the head-group axis SLOWEST: the
#     [G, N, N] bias block index depends only on hg, so it is fetched once
#     per group instead of once per (batch, window) step — with the head
#     axis fastest the bias re-fetch is ~65× the qkv traffic at 448²;
#   * the shift mask is COMPUTED inside the kernel from the window's grid
#     coordinates (pure VPU iota work) — the [nW, N, N] HBM operand and its
#     per-step re-fetch disappear entirely.


def _head_group(H: int) -> int:
    """Largest legal head block: Mosaic wants the second-to-last block dim
    divisible by 8 or equal to the full array dim."""
    return 8 if H % 8 == 0 else H


def _q_chunks(N: int, ws: int) -> int:
    """Query-row chunk count for the backward kernel's VMEM budget: chunks
    must cover whole map rows (ws | Nq) and stay sublane-aligned (8 | Nq)."""
    if N < 512:
        return 1
    for qc in range(2, N + 1):
        if N % qc:
            continue
        nq = N // qc
        if nq % ws == 0 and nq % 8 == 0 and nq <= 128:
            return qc
    # no ws- and 8-aligned divisor ≤ 128: falling back to one chunk would
    # silently recreate the full [N, N] temporaries the chunking exists to
    # avoid (likely VMEM/compile blowup) — fail loudly instead (ADVICE r2)
    raise ValueError(
        f"window attention bwd: N={N} (ws={ws}) has no query-chunk size that "
        f"is a multiple of ws and 8 and ≤ 128; pick a window size whose N "
        f"factors this way (every SwinV2 config does)")


def _window_region_mask(ws: int, shift: int, last_i, last_j,
                        rows: Optional[int] = None, row0=0):
    """Additive shift mask [rows or N, N] for THIS grid cell's window, built
    in VMEM (rows/row0 select a query-row chunk).

    Equals shifted_window_mask (models/swin_v2.py, reference
    swin_transformer_v2.py:233-252) for window (i, j): only last-row/
    last-col windows of the rolled map mix shift regions; two tokens attend
    iff they share (row-class, col-class). ``last_i``/``last_j`` are traced
    scalars computed from program_id at kernel TOP LEVEL — the interpret-
    mode lowering cannot rewrite program_id inside fori_loop sub-jaxprs.
    """
    N = ws * ws

    def region(iota):
        r = iota // ws                       # row within the window
        c = iota % ws                        # col within the window
        # arithmetic instead of jnp.where: scalar-literal where inside a
        # nested fori_loop breaks pallas interpret-mode lowering
        row = 3 * jnp.logical_and(last_i, r >= ws - shift).astype(jnp.int32)
        col = jnp.logical_and(last_j, c >= ws - shift).astype(jnp.int32)
        return row + col

    nq = N if rows is None else rows
    reg_n = region(
        jax.lax.broadcasted_iota(jnp.int32, (nq, 1), 0) + row0)
    reg_m = region(jax.lax.broadcasted_iota(jnp.int32, (1, N), 1))
    return (reg_n != reg_m).astype(jnp.float32) * jnp.float32(-100.0)


def _dot(a, b, ca: int, cb: int):
    """2-D contraction without materializing transposes."""
    return jax.lax.dot_general(a, b, (((ca,), (cb,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _map_fwd_kernel_factory(G: int, ws: int, shift: int, nWh: int, nWw: int,
                            mxu_bf16: bool = False):
    N = ws * ws
    mxu_t = jnp.bfloat16 if mxu_bf16 else jnp.float32

    def kernel(qkv_ref, bias_ref, scale_ref, o_ref, qf_ref):
        mask = (_window_region_mask(ws, shift, pl.program_id(2) == nWh - 1,
                                    pl.program_id(3) == nWw - 1)
                if shift > 0 else None)
        hd = qkv_ref.shape[-1]

        # stage the (possibly bf16) qkv block to fp32 scratch ONCE per cell:
        # qkv arrives in the model dtype (a pallas operand cannot fuse with
        # its producer, so an XLA-side cast would materialize a full fp32
        # map in HBM — measured at ~30% of step time), and Mosaic only
        # supports dynamic second-minor (head) indexing on fp32 refs
        qf_ref[...] = qkv_ref[0].astype(jnp.float32)

        # fori_loop (not Python unroll): Mosaic does not share stack between
        # unrolled iterations, so an unrolled G-head loop keeps G × several
        # [N, N] fp32 temporaries live and blows the 128 MB VMEM at ws=28.
        def head(gi, carry):
            q = qf_ref[:, :, 0, gi, :].reshape(N, hd)
            k = qf_ref[:, :, 1, gi, :].reshape(N, hd)
            v = qf_ref[:, :, 2, gi, :].reshape(N, hd)
            q = q * jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-12)
            k = k * jax.lax.rsqrt(jnp.sum(k * k, axis=-1, keepdims=True) + 1e-12)
            # mxu_t: optionally bf16 matmul operands (fp32 accumulate) —
            # measured slower on v5e (VPU-bound; casts add passes), kept
            # for chips where the MXU is the bottleneck
            s = _dot(q.astype(mxu_t), k.astype(mxu_t), 1, 1) \
                * scale_ref[gi, 0] + bias_ref[gi].astype(jnp.float32)
            if mask is not None:
                s = s + mask
            p = jax.nn.softmax(s, axis=-1)
            out = _dot(p.astype(mxu_t), v.astype(mxu_t), 1, 0)
            o_ref[0, :, :, gi, :] = out.reshape(ws, ws, hd).astype(o_ref.dtype)
            return carry

        jax.lax.fori_loop(0, G, head, 0)

    return kernel


def pallas_window_attention_map(qkv, bias, logit_scale, shift: int = 0,
                                interpret: bool = False,
                                mxu_bf16: bool = False):
    """Map-layout fused forward.

    qkv: [B, Hp, Wp, 3, H, hd]; bias [H, N, N]; logit_scale [H]; shift is
    the static shifted-window offset (0 = no mask; the mask is synthesized
    in-kernel from the window's grid coordinates). Returns [B, Hp, Wp, H, hd].
    """
    B, Hp, Wp, three, H, hd = qkv.shape
    assert three == 3
    ws = int(np.sqrt(bias.shape[-1]))
    N = ws * ws
    nWh, nWw = Hp // ws, Wp // ws
    assert nWh * ws == Hp and nWw * ws == Wp, (Hp, Wp, ws)
    G = _head_group(H)
    qkv_spec = pl.BlockSpec((1, ws, ws, 3, G, hd),
                            lambda hg, b, i, j: (b, i, j, 0, hg, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((G, N, N), lambda hg, b, i, j: (hg, 0, 0),
                             memory_space=pltpu.VMEM)
    scale_spec = pl.BlockSpec((G, 1), lambda hg, b, i, j: (hg, 0),
                              memory_space=pltpu.SMEM)
    scale = jnp.asarray(logit_scale, jnp.float32).reshape(H, 1)
    return pl.pallas_call(
        _map_fwd_kernel_factory(G, ws, shift, nWh, nWw, mxu_bf16),
        grid=(H // G, B, nWh, nWw),
        in_specs=[qkv_spec, bias_spec, scale_spec],
        out_specs=pl.BlockSpec((1, ws, ws, G, hd),
                               lambda hg, b, i, j: (b, i, j, hg, 0),
                               memory_space=pltpu.VMEM),
        # fp32 output regardless of input dtype: a cast AFTER the call fuses
        # into consumers (GEMMs), and fp32 refs allow the dynamic per-head
        # writes; bf16-in/fp32-out keeps all HBM formatting passes fused
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wp, H, hd), jnp.float32),
        scratch_shapes=[pltpu.VMEM((ws, ws, 3, G, hd), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * nWh * nWw * H * N * N * hd,
            bytes_accessed=B * Hp * Wp * 4 * H * hd * qkv.dtype.itemsize
            + H * N * N * 4,
            transcendentals=B * nWh * nWw * H * N * N,
        ),
        # the double-buffered [G, N, N] fp32 bias block alone is ~2×20 MB at
        # ws=28 — far over the 16 MB default scoped-vmem limit
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(qkv, bias, scale)


def _map_bwd_kernel_factory(G: int, ws: int, shift: int, nWh: int, nWw: int,
                            mxu_bf16: bool = False):
    N = ws * ws
    mxu_t = jnp.bfloat16 if mxu_bf16 else jnp.float32

    def kernel(qkv_ref, bias_hbm, scale_ref, g_ref,
               dqkv_ref, dbias_hbm, dscale_ref,
               bias_ref, dbias_ref, qf_ref, sem_in, sem_out):
        # bias/dbias live in HBM (memory_space=ANY) and are staged through
        # SINGLE-buffered [G, Ns, Nl] scratch with one manual DMA per head
        # group — Pallas's automatic pipelining double-buffers any block
        # whose index varies, and 2×2×19.7 MB of bias blocks plus the rest
        # exceeds the 128 MB VMEM at ws=28.
        hg = pl.program_id(0)
        b = pl.program_id(1)
        i = pl.program_id(2)
        j = pl.program_id(3)
        hd = qkv_ref.shape[-1]
        last_i = i == nWh - 1          # read program_id at TOP level only:
        last_j = j == nWw - 1          # interpret can't rewrite it in loops
        first = jnp.logical_and(b == 0, jnp.logical_and(i == 0, j == 0))
        last = jnp.logical_and(
            b == pl.num_programs(1) - 1,
            jnp.logical_and(i == pl.num_programs(2) - 1,
                            j == pl.num_programs(3) - 1))

        # stage THIS head group's [G, Ns, Nl] bias at the group's first
        # cell. bias/dbias arrive reshaped [HG, G, Ns, Nl] with sublane/lane
        # dims pre-padded to multiples of (8, 128) — Mosaic cannot DMA any
        # slice of an HBM ref whose logical trailing dims differ from the
        # padded tiling (tpu.memref_slice 784→896 / 196→200 errors). Zero
        # the dbias/dscale accumulators with it.
        Ns, Nl = bias_ref.shape[-2], bias_ref.shape[-1]

        @pl.when(first)
        def _():
            cp = pltpu.make_async_copy(bias_hbm.at[hg], bias_ref, sem_in)
            cp.start()
            cp.wait()

            # row-wise zeroing: a whole-group zeros() value would be a
            # [G, Ns, Nl] (~20 MB) stack temporary
            def zrow(gz, c):
                dbias_ref[gz] = jnp.zeros((Ns, Nl), dbias_ref.dtype)
                return c

            jax.lax.fori_loop(0, G, zrow, 0)
            for gz in range(G):
                dscale_ref[gz, 0] = 0.0

        # query-row chunking: every [*, N] temporary in the chunk body is
        # [Nq, N] instead of [N, N] — Mosaic gives each SSA value its own
        # stack slot, and ~20 full [784, 784] fp32 values per body do not
        # fit next to the bias/dbias staging buffers. Softmax is row-wise,
        # so chunks are independent; dk/dv/dscale accumulate in the carry.
        QC = _q_chunks(N, ws)
        Nq = N // QC
        RW = Nq // ws                                   # map rows per chunk

        # stage the (possibly bf16) qkv block to fp32 scratch once per cell
        # (same rationale as the forward: dynamic per-head indexing needs
        # fp32 refs, and XLA-side casts would materialize fp32 maps in HBM)
        qf_ref[...] = qkv_ref[0].astype(jnp.float32)

        def head(gi, carry):
            k = qf_ref[:, :, 1, gi, :].reshape(N, hd)
            v = qf_ref[:, :, 2, gi, :].reshape(N, hd)
            scale = scale_ref[gi, 0]

            kn = jax.lax.rsqrt(jnp.sum(k * k, axis=-1, keepdims=True) + 1e-12)
            kh = k * kn
            kh16 = kh.astype(mxu_t)
            v16 = v.astype(mxu_t)
            dt = dqkv_ref.dtype

            def qchunk(qc, acc):
                # q/g row chunks load straight from the refs (Mosaic has no
                # value-level dynamic_slice); normalization is row-wise so
                # the q-hat chunk is self-contained
                dv_a, dkh_a, dsc_a = acc
                r0 = qc * Nq
                qs = qf_ref[pl.ds(qc * RW, RW), :, 0, gi, :].reshape(Nq, hd)
                gs = g_ref[0, pl.ds(qc * RW, RW), :, gi, :].reshape(
                    Nq, hd).astype(jnp.float32)
                qn = jax.lax.rsqrt(
                    jnp.sum(qs * qs, axis=-1, keepdims=True) + 1e-12)
                qhs = qs * qn
                qhs16 = qhs.astype(mxu_t)
                gs16 = gs.astype(mxu_t)
                s_cos = _dot(qhs16, kh16, 1, 1)                # chunk [Nq, N]
                s = s_cos * scale \
                    + bias_ref[gi, pl.ds(r0, Nq),
                               pl.ds(0, N)].astype(jnp.float32)
                if shift > 0:
                    s = s + _window_region_mask(ws, shift, last_i, last_j,
                                                Nq, r0)
                p = jax.nn.softmax(s, axis=-1)

                dp = _dot(gs16, v16, 1, 1)
                ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))

                dbias_ref[gi, pl.ds(r0, Nq), pl.ds(0, N)] += ds.astype(
                    dbias_ref.dtype)
                dsc_a = dsc_a + jnp.sum(ds * s_cos)
                ds16 = ds.astype(mxu_t)
                dv_a = dv_a + _dot(p.astype(mxu_t), gs16, 0, 0)
                dkh_a = dkh_a + _dot(ds16, qhs16, 0, 0) * scale
                dqh = _dot(ds16, kh16, 1, 0) * scale
                dq = (dqh - qhs * jnp.sum(qhs * dqh, axis=-1,
                                          keepdims=True)) * qn
                dqkv_ref[0, pl.ds(qc * RW, RW), :, 0, gi, :] = (
                    dq.reshape(RW, ws, hd).astype(dt))
                return (dv_a, dkh_a, dsc_a)

            dv, dkh, dsc = jax.lax.fori_loop(
                0, QC, qchunk,
                (jnp.zeros((N, hd), jnp.float32),
                 jnp.zeros((N, hd), jnp.float32), jnp.float32(0.0)))

            dscale_ref[gi, 0] += dsc
            dk = (dkh - kh * jnp.sum(kh * dkh, axis=-1, keepdims=True)) * kn
            dqkv_ref[0, :, :, 1, gi, :] = dk.reshape(ws, ws, hd).astype(dt)
            dqkv_ref[0, :, :, 2, gi, :] = dv.reshape(ws, ws, hd).astype(dt)
            return carry

        jax.lax.fori_loop(0, G, head, 0)

        # flush this group's accumulated dbias at the group's last cell
        @pl.when(last)
        def _():
            cp = pltpu.make_async_copy(dbias_ref, dbias_hbm.at[hg], sem_out)
            cp.start()
            cp.wait()

    return kernel


def pallas_window_attention_map_bwd(qkv, bias, logit_scale, g,
                                    shift: int = 0,
                                    interpret: bool = False,
                                    mxu_bf16: bool = False):
    """Map-layout fused backward: returns (dqkv, dbias, dlogit_scale).
    Grid (H/G, B, nWh, nWw): all batch/window axes after the head-group axis
    so the per-group dbias/dscale output blocks accumulate in place."""
    B, Hp, Wp, three, H, hd = qkv.shape
    ws = int(np.sqrt(bias.shape[-1]))
    N = ws * ws
    nWh, nWw = Hp // ws, Wp // ws
    G = _head_group(H)
    qkv_spec = pl.BlockSpec((1, ws, ws, 3, G, hd),
                            lambda hg, b, i, j: (b, i, j, 0, hg, 0),
                            memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((1, ws, ws, G, hd),
                          lambda hg, b, i, j: (b, i, j, hg, 0),
                          memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec(memory_space=pltpu.ANY)   # staged by manual DMA
    scale_spec = pl.BlockSpec((G, 1), lambda hg, b, i, j: (hg, 0),
                              memory_space=pltpu.SMEM)
    scale = jnp.asarray(logit_scale, jnp.float32).reshape(H, 1)

    # pad the DMA-staged bias/dbias trailing dims to (8, 128) multiples
    # (see kernel note)
    Ns = -(-N // 8) * 8
    Nl = -(-N // 128) * 128
    bias_p = bias.reshape(H // G, G, N, N)
    if (Ns, Nl) != (N, N):
        bias_p = jnp.pad(
            bias_p, ((0, 0), (0, 0), (0, Ns - N), (0, Nl - N)))
    out_shape = (
        # fp32 dqkv regardless of input dtype (dynamic per-head writes need
        # fp32 refs; the cast back to the model dtype fuses into consumers)
        jax.ShapeDtypeStruct(qkv.shape, jnp.float32),
        jax.ShapeDtypeStruct((H // G, G, Ns, Nl), jnp.float32),
        jax.ShapeDtypeStruct((H, 1), jnp.float32),
    )
    out_specs = (
        qkv_spec,
        pl.BlockSpec(memory_space=pltpu.ANY),          # flushed by manual DMA
        pl.BlockSpec((G, 1), lambda hg, b, i, j: (hg, 0),
                     memory_space=pltpu.SMEM),
    )
    dqkv, dbias, dscale = pl.pallas_call(
        _map_bwd_kernel_factory(G, ws, shift, nWh, nWw, mxu_bf16),
        grid=(H // G, B, nWh, nWw),
        in_specs=[qkv_spec, bias_spec, scale_spec, g_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((G, Ns, Nl), jnp.float32)] * 2
        + [pltpu.VMEM((ws, ws, 3, G, hd), jnp.float32)]
        + [pltpu.SemaphoreType.DMA] * 2,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(qkv, bias_p, scale, g)
    return (dqkv, dbias[..., :N, :N].reshape(H, N, N), dscale.reshape(H))


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
def make_window_attention_map(shift: int = 0, mxu_bf16: bool = False):
    @jax.custom_vjp
    def attn(qkv, bias, logit_scale):
        return pallas_window_attention_map(qkv, bias, logit_scale, shift,
                                           mxu_bf16=mxu_bf16)

    def fwd(qkv, bias, logit_scale):
        return attn(qkv, bias, logit_scale), (qkv, bias, logit_scale)

    def bwd(res, g):
        qkv, bias, logit_scale = res
        dqkv, dbias, dscale = pallas_window_attention_map_bwd(
            qkv, bias, logit_scale, g, shift, mxu_bf16=mxu_bf16)
        return (dqkv.astype(qkv.dtype), dbias,
                dscale.astype(jnp.asarray(logit_scale).dtype))

    attn.defvjp(fwd, bwd)
    return attn


def window_attention_map(qkv, bias, logit_scale, shift: int = 0,
                         mxu_bf16: bool = False):
    """Map-layout fused window attention with autodiff (static shift).

    ``mxu_bf16``: cast matmul operands to bf16 inside the kernels (fp32
    softmax/normalize/accumulate retained) — 2× MXU throughput, matching
    the XLA path's model-dtype einsums when the model runs bf16."""
    return make_window_attention_map(shift, mxu_bf16)(qkv, bias, logit_scale)


# --------------------------------------------------------------------------- #
# flat-layout kernels (the production path): [Bn, N, 3C] in, [Bn, N, C] out
# --------------------------------------------------------------------------- #
# Lessons from profiling the two designs above on v5e:
#   * the [Bn, H, N, hd] kernels are fast (small fully-STATIC per-(head,
#     window) cells pipeline well) but need a 5-D transpose + partition
#     copy on each side (4 map copies/layer), and the forward's (Bn, H)
#     grid re-fetches the [N, N] bias block every step;
#   * the map-layout kernels have zero copies but head extraction from the
#     (..., H, hd) trailing dims needs fori_loop + dynamic second-minor
#     indexing (fp32-only, chunked bwd) — measured 2× slower backward.
# The flat layout keeps BOTH advantages: qkv arrives as the window-
# partitioned projection output [Bn, N, 3C] (heads contiguous in lanes,
# C % 128 == 0), so a (1, N, 128)-lane block addresses a 4-head group
# PER GRID CELL with purely static in-kernel slicing, bf16 blocks allowed,
# and the grid (H/4, Bn) fetches each bias block once per group. The model
# pays one [Bn, N, C] partition copy before qkv and one reverse copy after
# proj — far cheaper than either alternative's overhead.


def _lane_group(H: int, hd: int, C: int) -> int:
    """Heads per grid cell: a 128-lane block when legal, else all heads."""
    if C % 128 == 0 and 128 % hd == 0 and H % (128 // hd) == 0:
        return 128 // hd
    return H


def _check_flat_geometry(Bn, N, C, H, ws, bias_shape, shift, nWh, nWw):
    """Input validation for the flat entry points (ADVICE r2): a non-square
    N, a mismatched bias, or a shift without the window grid would silently
    compute attention over truncated windows / wrong boundary masks."""
    if ws * ws != N:
        raise ValueError(f"flat window attention: N={N} is not a square "
                         f"(ws²); got qkv shape [*, {N}, {3*C}]")
    if C % H != 0:
        raise ValueError(f"flat window attention: C={C} not divisible by "
                         f"H={H} heads")
    if bias_shape != (H, N, N):
        raise ValueError(f"flat window attention: bias shape {bias_shape} "
                         f"!= (H={H}, N={N}, N={N})")
    if shift > 0:
        if nWh < 2 or nWw < 2:
            raise ValueError(
                f"flat window attention: shift={shift} requires the window "
                f"grid (nWh, nWw) ≥ 2 — with the default (1, 1) every "
                f"window would get the boundary mask (wrong results)")
        if Bn % (nWh * nWw) != 0:
            raise ValueError(f"flat window attention: Bn={Bn} not a "
                             f"multiple of nWh·nWw={nWh*nWw}")


def _flat_fwd_kernel_factory(GL: int, hd: int, ws: int, shift: int,
                             nWh: int, nWw: int, mxu_bf16: bool,
                             emit_rowsum: bool = False,
                             mask_branch: bool = False):
    N = ws * ws
    mxu_t = jnp.bfloat16 if mxu_bf16 else jnp.float32

    def flat_fwd_kernel(q_ref, k_ref, v_ref, bias_ref, scale_ref, o_ref,
                        *maybe_r_ref):
        hg = pl.program_id(0)

        def body(mask):
            rows = []
            for gi in range(GL):        # static unroll: GL is 4 (or tiny H)
                sl = slice(gi * hd, (gi + 1) * hd)
                q = q_ref[0, :, sl].astype(jnp.float32)
                k = k_ref[0, :, sl].astype(jnp.float32)
                v = v_ref[0, :, sl]
                q = q * jax.lax.rsqrt(
                    jnp.sum(q * q, axis=-1, keepdims=True) + 1e-12)
                k = k * jax.lax.rsqrt(
                    jnp.sum(k * k, axis=-1, keepdims=True) + 1e-12)
                s = _dot(q.astype(mxu_t), k.astype(mxu_t), 1, 1) \
                    * scale_ref[hg * GL + gi, 0] \
                    + bias_ref[gi].astype(jnp.float32)
                if mask is not None:
                    s = s + mask
                # unnormalized softmax with a STATIC per-head shift instead
                # of the per-row max: logits are bounded above by m = scale
                # + max(bias) (cosine sim ≤ 1, mask ≤ 0; m precomputed
                # outside and read from SMEM), so exp(s - m) cannot
                # overflow. The row max CAN fall below m by up to 2·scale +
                # range(bias) (q_i and k_i are different projections, so
                # cos(q_i, k_i) is only in [-1, 1]); with the trained
                # logit_scale clamped at exp≈100 that exceeds the fp32 exp
                # underflow (~87), so the row sum is clamped to 1e-30 below
                # — rows that underflow saturate instead of 0/0 NaN. Saves
                # the [N, N] max-reduce VPU pass; dividing the [N, hd]
                # OUTPUT by the row sums (not the [N, N] probabilities)
                # saves another (≡ softmax(s) @ v up to rounding).
                e = jnp.exp(s - scale_ref[hg * GL + gi, 1])
                out = _dot(e.astype(mxu_t), v.astype(mxu_t), 1, 0)
                denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
                out = out / denom
                o_ref[0, :, sl] = out.astype(o_ref.dtype)
                if emit_rowsum:
                    rows.append((1.0 / denom)[:, 0])
            if emit_rowsum:
                # reciprocal row sums for the v2 backward: [GL, N] per block
                # — N stays the lane (128) dim so HBM tiling pads GL→8
                # sublanes instead of GL→128 lanes (a [.., N, GL] layout
                # would inflate the saved residual ~32× at GL=4)
                maybe_r_ref[0][0, 0] = jnp.stack(rows, axis=0)

        if shift > 0:
            wid = pl.program_id(1) % (nWh * nWw)
            last_i = wid // nWw == nWh - 1
            last_j = wid % nWw == nWw - 1
            if mask_branch:
                # interior windows ((nWh-1)(nWw-1) of nWh·nWw) get an
                # all-zero mask — branch on the window id so they skip the
                # mask synthesis and the [N, N] add entirely
                boundary = jnp.logical_or(last_i, last_j)

                @pl.when(boundary)
                def _():
                    body(_window_region_mask(ws, shift, last_i, last_j))

                @pl.when(jnp.logical_not(boundary))
                def _():
                    body(None)
            else:
                body(_window_region_mask(ws, shift, last_i, last_j))
        else:
            body(None)
        return

    return flat_fwd_kernel


def _scale_and_shift_smem(logit_scale, bias):
    """[H, 2] SMEM operand: col 0 = per-head logit scale, col 1 = the static
    softmax shift m = scale + max(bias) (see the forward-kernel note).

    Validity bound: m - s_ij = scale·(1 - cos(q_i, k_j)) + (max(bias) -
    bias_ij) ≤ 2·scale + range(bias) — q and k are DIFFERENT projections, so
    no entry is guaranteed near cosine 1. With SwinV2's clamp (logit_scale ≤
    log 100, swin_v2.py) and CPB bias 16·sigmoid(mlp) ∈ (0, 16) the bound is
    ~216 > 87 (fp32 exp underflow), so a fully-anticorrelated row CAN flush
    its sum to zero; both kernels clamp the row sum at 1e-30 so such rows
    saturate to the max-probability direction instead of producing NaN.
    tests/test_window_attention.py stresses bias range ~40 and the
    underflow path directly.
    """
    scale = jnp.asarray(logit_scale, jnp.float32).reshape(-1)
    m = scale + jnp.max(bias.astype(jnp.float32), axis=(1, 2))
    return jnp.stack([scale, m], axis=1)


def pallas_window_attention_flat(qkv, bias, logit_scale, shift: int = 0,
                                 nWh: int = 1, nWw: int = 1,
                                 interpret: bool = False,
                                 mxu_bf16: bool = False,
                                 return_rowsum: bool = False,
                                 out_dtype=None,
                                 mask_branch: Optional[bool] = None):
    """Flat-layout fused forward.

    qkv: [Bn, N, 3C] (windows already partitioned; batch-major window order
    b = batch·nW + wh·nWw + ww); bias [H, N, N]; logit_scale [H]; the shift
    mask is synthesized in-kernel from the window id. Returns [Bn, N, C] in
    ``out_dtype`` (default fp32 — the cast AFTER the call fuses into the
    proj GEMM; the v2 backward path writes the model dtype directly to
    halve the output store traffic). With ``return_rowsum`` also returns
    the reciprocal softmax row sums [NB, Bn, GL, N] fp32 (the v2 backward
    residual — N stays the lane dim so HBM tiling pads GL, not N).
    """
    Bn, N, threeC = qkv.shape
    C = threeC // 3
    H = bias.shape[0]
    hd = C // H
    ws = int(np.sqrt(N))
    _check_flat_geometry(Bn, N, C, H, ws, bias.shape, shift, nWh, nWw)
    GL = _lane_group(H, hd, C)
    NB = H // GL                                 # lane blocks per modality

    def spec(off):
        return pl.BlockSpec((1, N, GL * hd), lambda hg, b: (b, 0, off + hg),
                            memory_space=pltpu.VMEM)

    bias_spec = pl.BlockSpec((GL, N, N), lambda hg, b: (hg, 0, 0),
                             memory_space=pltpu.VMEM)
    # full (H, 2) SMEM block — a (GL, ·) block would violate the trailing-
    # dims rule when GL isn't a multiple of 8; scalar reads index hg·GL+gi
    scale_spec = pl.BlockSpec((H, 2), lambda hg, b: (0, 0),
                              memory_space=pltpu.SMEM)
    scale = _scale_and_shift_smem(logit_scale, bias)
    out_dtype = jnp.float32 if out_dtype is None else out_dtype
    out_specs = pl.BlockSpec((1, N, GL * hd), lambda hg, b: (b, 0, hg),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((Bn, N, C), out_dtype)
    if return_rowsum:
        out_specs = (out_specs,
                     pl.BlockSpec((1, 1, GL, N), lambda hg, b: (hg, b, 0, 0),
                                  memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((NB, Bn, GL, N), jnp.float32))
    if mask_branch is None:
        mask_branch = _mask_branch_default()
    return pl.pallas_call(
        _flat_fwd_kernel_factory(GL, hd, ws, shift, nWh, nWw, mxu_bf16,
                                 emit_rowsum=return_rowsum,
                                 mask_branch=mask_branch),
        grid=(NB, Bn),
        in_specs=[spec(0), spec(NB), spec(2 * NB), bias_spec, scale_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * Bn * H * N * N * hd,
            bytes_accessed=Bn * N * 4 * C * qkv.dtype.itemsize
            + H * N * N * 4,
            transcendentals=Bn * H * N * N,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(qkv, qkv, qkv, bias, scale)


def _flat_bwd_kernel_factory(GL: int, hd: int, ws: int, shift: int,
                             nWh: int, nWw: int, mxu_bf16: bool,
                             tn_dots: bool = False):
    N = ws * ws
    mxu_t = jnp.bfloat16 if mxu_bf16 else jnp.float32

    def flat_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, scale_ref, g_ref,
                        dq_ref, dk_ref, dv_ref, dbias_ref, dscale_ref):
        hg = pl.program_id(0)
        b = pl.program_id(1)
        if shift > 0:
            wid = b % (nWh * nWw)
            mask = _window_region_mask(ws, shift, wid // nWw == nWh - 1,
                                       wid % nWw == nWw - 1)
        else:
            mask = None

        @pl.when(b == 0)
        def _():
            dbias_ref[...] = jnp.zeros(dbias_ref.shape, dbias_ref.dtype)
            for gz in range(GL):
                dscale_ref[hg * GL + gz, 0] = 0.0

        for gi in range(GL):            # static unroll
            sl = slice(gi * hd, (gi + 1) * hd)
            q = q_ref[0, :, sl].astype(jnp.float32)
            k = k_ref[0, :, sl].astype(jnp.float32)
            v = v_ref[0, :, sl].astype(jnp.float32)
            g = g_ref[0, :, sl].astype(jnp.float32)
            scale = scale_ref[hg * GL + gi, 0]

            qn = jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-12)
            kn = jax.lax.rsqrt(jnp.sum(k * k, axis=-1, keepdims=True) + 1e-12)
            qh = q * qn
            kh = k * kn
            qh16 = qh.astype(mxu_t)
            kh16 = kh.astype(mxu_t)
            s_cos = _dot(qh16, kh16, 1, 1)
            # softmax recompute without the per-row max (see the forward
            # kernel note: m = scale + max(bias) from SMEM bounds the
            # logits) and WITHOUT materializing p: with e = exp(s - m) and
            # r = 1/Σe, p = e·r folds into the consumers —
            #   ds = p·(dp − Σ dp·p) = e·(r·dp − r²·Σ dp·e)
            #   dv = pᵀ·g = eᵀ·(r·g)
            # ([N,N] VPU passes: 9.5 → 6.5; bwd measured 9.7 → ~7 ms/call)
            s = s_cos * scale + (bias_ref[gi].astype(jnp.float32)
                                 - scale_ref[hg * GL + gi, 1])
            if mask is not None:
                s = s + mask
            e = jnp.exp(s)
            # clamp mirrors the fwd kernel: an underflowed row sum (possible
            # when scale·(1-cos)+bias range exceeds ~87) must not produce inf
            r = 1.0 / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)

            g16 = g.astype(mxu_t)
            dp = _dot(g16, v.astype(mxu_t), 1, 1)
            t = jnp.sum(dp * e, axis=-1, keepdims=True)
            # ds = e·r·(dp − r·t), NOT e·(r·dp − r²·t): with the clamped row
            # sum r can reach 1e30 and r² overflows fp32 → inf·0 = NaN. r·t
            # is bounded (|t| ≤ max|dp|·Σe ⇒ |r·t| ≤ max|dp|); same number
            # of [N,N] VPU passes ((dp − r·t) then ·e, r folds into either).
            ds = e * (r * (dp - r * t))

            dbias_ref[gi] += ds.astype(dbias_ref.dtype)
            dscale_ref[hg * GL + gi, 0] += jnp.sum(ds * s_cos)

            ds16 = ds.astype(mxu_t)
            dqh = _dot(ds16, kh16, 1, 0) * scale
            if tn_dots:
                # contract the [N, N] operands along their SUBLANE axis via
                # native (1,0) dots on pre-transposed [hd, N] operands:
                # dvᵀ = (r·g)ᵀ·e and dkhᵀ = qhᵀ·ds replace the (0,0) dots
                # whose lowering transposes the full [N, N] matrix through
                # the XLU — the small [N, hd] transposes cost N·hd, not N².
                dv = _dot((r * g).astype(mxu_t).T, e.astype(mxu_t), 1, 0).T
                dkh = _dot(qh16.T, ds16, 1, 0).T * scale
            else:
                dv = _dot(e.astype(mxu_t), (r * g).astype(mxu_t), 0, 0)
                dkh = _dot(ds16, qh16, 0, 0) * scale         # dsᵀ·qh
            dq = (dqh - qh * jnp.sum(qh * dqh, axis=-1, keepdims=True)) * qn
            dk = (dkh - kh * jnp.sum(kh * dkh, axis=-1, keepdims=True)) * kn
            dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
            dk_ref[0, :, sl] = dk.astype(dk_ref.dtype)
            dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)
        return

    return flat_bwd_kernel


def pallas_window_attention_flat_bwd(qkv, bias, logit_scale, g,
                                     shift: int = 0,
                                     nWh: int = 1, nWw: int = 1,
                                     interpret: bool = False,
                                     mxu_bf16: bool = False,
                                     tn_dots: bool = False):
    """Flat-layout fused backward: (dq, dk, dv [Bn,N,C] fp32, dbias,
    dlogit_scale). Grid (H/GL, Bn) — per-group dbias/dscale blocks
    accumulate across the fast batch axis."""
    Bn, N, threeC = qkv.shape
    C = threeC // 3
    H = bias.shape[0]
    hd = C // H
    ws = int(np.sqrt(N))
    _check_flat_geometry(Bn, N, C, H, ws, bias.shape, shift, nWh, nWw)
    GL = _lane_group(H, hd, C)
    NB = H // GL

    def spec(off):
        return pl.BlockSpec((1, N, GL * hd), lambda hg, b: (b, 0, off + hg),
                            memory_space=pltpu.VMEM)

    gout_spec = pl.BlockSpec((1, N, GL * hd), lambda hg, b: (b, 0, hg),
                             memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((GL, N, N), lambda hg, b: (hg, 0, 0),
                             memory_space=pltpu.VMEM)
    scale_spec = pl.BlockSpec((H, 2), lambda hg, b: (0, 0),
                              memory_space=pltpu.SMEM)
    scale = _scale_and_shift_smem(logit_scale, bias)

    out_shape = (
        jax.ShapeDtypeStruct((Bn, N, C), jnp.float32),   # dq
        jax.ShapeDtypeStruct((Bn, N, C), jnp.float32),   # dk
        jax.ShapeDtypeStruct((Bn, N, C), jnp.float32),   # dv
        jax.ShapeDtypeStruct((H, N, N), jnp.float32),
        jax.ShapeDtypeStruct((H, 1), jnp.float32),
    )
    out_specs = (
        gout_spec, gout_spec, gout_spec,
        pl.BlockSpec((GL, N, N), lambda hg, b: (hg, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((H, 1), lambda hg, b: (0, 0),
                     memory_space=pltpu.SMEM),
    )
    dq, dk, dv, dbias, dscale = pl.pallas_call(
        _flat_bwd_kernel_factory(GL, hd, ws, shift, nWh, nWw, mxu_bf16,
                                 tn_dots=tn_dots),
        grid=(NB, Bn),
        in_specs=[spec(0), spec(NB), spec(2 * NB), bias_spec, scale_spec,
                  gout_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(qkv, qkv, qkv, bias, scale, g)
    return dq, dk, dv, dbias, dscale.reshape(H)


def _flat_bwd2_kernel_factory(GL: int, hd: int, ws: int, shift: int,
                              nWh: int, nWw: int, mxu_bf16: bool,
                              tn_dots: bool = False,
                              mask_branch: bool = False,
                              pipelined: bool = False):
    N = ws * ws
    mxu_t = jnp.bfloat16 if mxu_bf16 else jnp.float32
    body_fn = _flat_bwd2_body_pipelined if pipelined else _flat_bwd2_body

    def flat_bwd2_kernel(q_ref, k_ref, v_ref, bias_ref, scale_ref, g_ref,
                         o_ref, r_ref,
                         dq_ref, dk_ref, dv_ref, dbias_ref, dscale_ref):
        hg = pl.program_id(0)
        b = pl.program_id(1)

        @pl.when(b == 0)
        def _():
            dbias_ref[...] = jnp.zeros(dbias_ref.shape, dbias_ref.dtype)
            for gz in range(GL):
                dscale_ref[hg * GL + gz, 0] = 0.0

        rall = r_ref[0, 0]                       # [GL, N] fp32 reciprocals

        def body(mask):
            body_fn(GL, hd, mxu_t, tn_dots, hg, rall, mask,
                    q_ref, k_ref, v_ref, bias_ref, scale_ref, g_ref,
                    o_ref, dq_ref, dk_ref, dv_ref, dbias_ref,
                    dscale_ref)

        if shift > 0:
            wid = b % (nWh * nWw)
            last_i = wid // nWw == nWh - 1
            last_j = wid % nWw == nWw - 1
            if mask_branch:
                # see _flat_fwd_kernel_factory: interior windows skip the
                # all-zero mask synthesis + [N, N] add via a pl.when branch
                boundary = jnp.logical_or(last_i, last_j)

                @pl.when(boundary)
                def _():
                    body(_window_region_mask(ws, shift, last_i, last_j))

                @pl.when(jnp.logical_not(boundary))
                def _():
                    body(None)
            else:
                body(_window_region_mask(ws, shift, last_i, last_j))
        else:
            body(None)
        return

    return flat_bwd2_kernel


def _bwd2_phase_a(GL, hd, mxu_t, hg, rall, mask, gi,
                  q_ref, k_ref, v_ref, bias_ref, scale_ref, g_ref,
                  o_ref, dbias_ref):
    """VPU-dominated half of one head's backward: softmax recompute → ds
    (+ the dbias accumulation). Returns the staged operands the
    MXU-dominated half (_bwd2_phase_b) consumes."""
    sl = slice(gi * hd, (gi + 1) * hd)
    q = q_ref[0, :, sl].astype(jnp.float32)
    k = k_ref[0, :, sl].astype(jnp.float32)
    v = v_ref[0, :, sl].astype(jnp.float32)
    g = g_ref[0, :, sl].astype(jnp.float32)
    o = o_ref[0, :, sl].astype(jnp.float32)
    scale = scale_ref[hg * GL + gi, 0]

    qn = jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-12)
    kn = jax.lax.rsqrt(jnp.sum(k * k, axis=-1, keepdims=True) + 1e-12)
    qh = q * qn
    kh = k * kn
    qh16 = qh.astype(mxu_t)
    kh16 = kh.astype(mxu_t)
    s_cos = _dot(qh16, kh16, 1, 1)
    # (see the algorithm note in the v2/v3 body below — the math here is
    # identical; the split into phase A/B only names the VPU-heavy and
    # MXU-heavy halves so the pipelined body can interleave heads)
    lrm = (jnp.log(rall[gi, :])
           - scale_ref[hg * GL + gi, 1])[:, None]
    s = s_cos * scale + bias_ref[gi].astype(jnp.float32) + lrm
    if mask is not None:
        s = s + mask
    p = jnp.exp(s)
    t = jnp.sum(g * o, axis=-1, keepdims=True)
    g16 = g.astype(mxu_t)
    dp = _dot(g16, v.astype(mxu_t), 1, 1)
    ds = p * (dp - t)
    dbias_ref[gi] += ds.astype(dbias_ref.dtype)
    return dict(gi=gi, sl=sl, scale=scale, qn=qn, kn=kn, qh=qh, kh=kh,
                qh16=qh16, kh16=kh16, g16=g16,
                ds16=ds.astype(mxu_t), p16=p.astype(mxu_t))


def _bwd2_phase_b(GL, hd, tn_dots, hg, st,
                  scale_ref, dq_ref, dk_ref, dv_ref, dscale_ref):
    """MXU-dominated half: the dqh/dv/dkh contractions, the free dscale
    identity, the normalization backward, and the gradient stores."""
    gi, sl, scale = st["gi"], st["sl"], st["scale"]
    qh, kh, qn, kn = st["qh"], st["kh"], st["qn"], st["kn"]
    qh16, kh16, g16 = st["qh16"], st["kh16"], st["g16"]
    ds16, p16 = st["ds16"], st["p16"]

    dqh = _dot(ds16, kh16, 1, 0) * scale
    rowq = jnp.sum(qh * dqh, axis=-1, keepdims=True)
    dscale_ref[hg * GL + gi, 0] += jnp.sum(rowq) / scale
    if tn_dots:
        dv = _dot(g16.T, p16, 1, 0).T
        dkh = _dot(qh16.T, ds16, 1, 0).T * scale
    else:
        dv = _dot(p16, g16, 0, 0)                    # pᵀ·g
        dkh = _dot(ds16, qh16, 0, 0) * scale         # dsᵀ·qh
    dq = (dqh - qh * rowq) * qn
    dk = (dkh - kh * jnp.sum(kh * dkh, axis=-1, keepdims=True)) * kn
    dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
    dk_ref[0, :, sl] = dk.astype(dk_ref.dtype)
    dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)


def _flat_bwd2_body_pipelined(GL, hd, mxu_t, tn_dots, hg, rall, mask,
                              q_ref, k_ref, v_ref, bias_ref, scale_ref,
                              g_ref, o_ref, dq_ref, dk_ref, dv_ref,
                              dbias_ref, dscale_ref):
    """v4 scheduling experiment (MVULD_ATTN_BWD=v4): software-pipeline the
    per-head chains — head gi's MXU contractions are emitted AFTER head
    gi+1's VPU softmax-recompute chain, giving Mosaic an explicit window
    to overlap the VPU chain with MXU dots (NOTES_r4 residual #1). Same
    math as _flat_bwd2_body; only the emission order differs. Costs one
    extra head's staged [N, N] operands in VMEM."""
    staged = None
    for gi in range(GL):                # static unroll
        nxt = _bwd2_phase_a(GL, hd, mxu_t, hg, rall, mask, gi,
                            q_ref, k_ref, v_ref, bias_ref, scale_ref,
                            g_ref, o_ref, dbias_ref)
        if staged is not None:
            _bwd2_phase_b(GL, hd, tn_dots, hg, staged,
                          scale_ref, dq_ref, dk_ref, dv_ref, dscale_ref)
        staged = nxt
    _bwd2_phase_b(GL, hd, tn_dots, hg, staged,
                  scale_ref, dq_ref, dk_ref, dv_ref, dscale_ref)


def _flat_bwd2_body(GL, hd, mxu_t, tn_dots, hg, rall, mask,
                    q_ref, k_ref, v_ref, bias_ref, scale_ref, g_ref,
                    o_ref, dq_ref, dk_ref, dv_ref, dbias_ref, dscale_ref):
    """Per-head-group chain of the v2 backward (shared by the masked /
    unmasked boundary branches of _flat_bwd2_kernel_factory)."""
    for gi in range(GL):                # static unroll
            sl = slice(gi * hd, (gi + 1) * hd)
            q = q_ref[0, :, sl].astype(jnp.float32)
            k = k_ref[0, :, sl].astype(jnp.float32)
            v = v_ref[0, :, sl].astype(jnp.float32)
            g = g_ref[0, :, sl].astype(jnp.float32)
            o = o_ref[0, :, sl].astype(jnp.float32)
            scale = scale_ref[hg * GL + gi, 0]

            qn = jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-12)
            kn = jax.lax.rsqrt(jnp.sum(k * k, axis=-1, keepdims=True) + 1e-12)
            qh = q * qn
            kh = k * kn
            qh16 = qh.astype(mxu_t)
            kh16 = kh.astype(mxu_t)
            s_cos = _dot(qh16, kh16, 1, 1)
            # v2 softmax recompute: BOTH row reductions come from forward-
            # saved / [N, hd]-cheap quantities instead of [N, N] VPU passes:
            #   r  = 1/Σe  — saved by the forward (fp32, post-clamp)
            #   Σ_j dp_ij·p_ij = g_i·(Σ_j p_ij v_j) = g_i·o_i  — the
            #   flash-attention identity, a rowsum over the SAVED output.
            # The normalization is applied in LOG space: p = exp(s − m +
            # log r) materializes the softmax probabilities in the ONE exp
            # pass (log r is an [N]-cheap row vector), instead of e =
            # exp(s − m) followed by two [N, N] multiplies (·r into the ds
            # chain, ·r into dv's operand). Log-space is also the more
            # robust underflow path: rows whose e would flush to 0 keep
            # their true (tiny) probabilities because the row offset is
            # applied before exponentiation.
            # so ds = p·(dp − Σ dp·p) = p·(dp − rowsum(g·o)).
            # ([N,N] VPU passes vs v1: the Σe reduce, the dp·e
            # multiply-reduce, the ·r rescale, and the ds·s_cos dscale
            # reduce (see below) are gone — the bwd chain is now
            # fma(s) / +logr−m / exp / ·(dp − t) / dbias+=.)
            lrm = (jnp.log(rall[gi, :])
                   - scale_ref[hg * GL + gi, 1])[:, None]    # [N, 1] cheap
            s = s_cos * scale + bias_ref[gi].astype(jnp.float32) + lrm
            if mask is not None:
                s = s + mask
            p = jnp.exp(s)                       # softmax probs, normalized
            t = jnp.sum(g * o, axis=-1, keepdims=True)   # [N, 1] cheap
            g16 = g.astype(mxu_t)
            dp = _dot(g16, v.astype(mxu_t), 1, 1)
            ds = p * (dp - t)

            dbias_ref[gi] += ds.astype(dbias_ref.dtype)

            ds16 = ds.astype(mxu_t)
            p16 = p.astype(mxu_t)
            dqh = _dot(ds16, kh16, 1, 0) * scale
            # dscale = Σ_ij ds·s_cos = Σ_i qh_i·(ds·kh)_i = Σ(qh·dqh)/scale
            # — the [N, 1] rowsum is ALREADY needed for dq's normalization
            # backward below, so the dscale contribution is a free scalar
            # instead of an [N, N] multiply + full reduce.
            rowq = jnp.sum(qh * dqh, axis=-1, keepdims=True)
            dscale_ref[hg * GL + gi, 0] += jnp.sum(rowq) / scale
            if tn_dots:
                dv = _dot(g16.T, p16, 1, 0).T
                dkh = _dot(qh16.T, ds16, 1, 0).T * scale
            else:
                dv = _dot(p16, g16, 0, 0)                    # pᵀ·g
                dkh = _dot(ds16, qh16, 0, 0) * scale         # dsᵀ·qh
            dq = (dqh - qh * rowq) * qn
            dk = (dkh - kh * jnp.sum(kh * dkh, axis=-1, keepdims=True)) * kn
            dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
            dk_ref[0, :, sl] = dk.astype(dk_ref.dtype)
            dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)


def pallas_window_attention_flat_bwd2(qkv, bias, logit_scale, o, r, g,
                                      shift: int = 0,
                                      nWh: int = 1, nWw: int = 1,
                                      interpret: bool = False,
                                      mxu_bf16: bool = False,
                                      tn_dots: bool = False,
                                      grad_dtype=None,
                                      mask_branch: Optional[bool] = None,
                                      pipelined: bool = False):
    """v2 flat backward: consumes the forward output ``o`` [Bn, N, C] and
    the reciprocal row sums ``r`` [NB, Bn, GL, N] (both forward residuals,
    checkpoint-named "attn_out"/"attn_rowsum" for the remat policy) to drop
    four of the [N, N] VPU passes the v1 kernel recomputes: the Σe reduce
    (saved r), the dp·p multiply-reduce (rowsum(g·o) identity), the ·r
    rescale (log-space normalization folds r into the exp argument), and
    the ds·s_cos dscale reduce (Σ ds·s_cos ≡ Σ qh·dqh / scale, a rowsum dq
    already needs) — see the kernel note. dq/dk/dv are written in
    ``grad_dtype`` (default: qkv.dtype, so bf16 training never round-trips
    fp32 gradients through HBM)."""
    Bn, N, threeC = qkv.shape
    C = threeC // 3
    H = bias.shape[0]
    hd = C // H
    ws = int(np.sqrt(N))
    _check_flat_geometry(Bn, N, C, H, ws, bias.shape, shift, nWh, nWw)
    GL = _lane_group(H, hd, C)
    NB = H // GL
    grad_dtype = qkv.dtype if grad_dtype is None else grad_dtype

    def spec(off):
        return pl.BlockSpec((1, N, GL * hd), lambda hg, b: (b, 0, off + hg),
                            memory_space=pltpu.VMEM)

    gout_spec = pl.BlockSpec((1, N, GL * hd), lambda hg, b: (b, 0, hg),
                             memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((GL, N, N), lambda hg, b: (hg, 0, 0),
                             memory_space=pltpu.VMEM)
    scale_spec = pl.BlockSpec((H, 2), lambda hg, b: (0, 0),
                              memory_space=pltpu.SMEM)
    r_spec = pl.BlockSpec((1, 1, GL, N), lambda hg, b: (hg, b, 0, 0),
                          memory_space=pltpu.VMEM)
    scale = _scale_and_shift_smem(logit_scale, bias)

    out_shape = (
        jax.ShapeDtypeStruct((Bn, N, C), grad_dtype),    # dq
        jax.ShapeDtypeStruct((Bn, N, C), grad_dtype),    # dk
        jax.ShapeDtypeStruct((Bn, N, C), grad_dtype),    # dv
        jax.ShapeDtypeStruct((H, N, N), jnp.float32),
        jax.ShapeDtypeStruct((H, 1), jnp.float32),
    )
    out_specs = (
        gout_spec, gout_spec, gout_spec,
        pl.BlockSpec((GL, N, N), lambda hg, b: (hg, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((H, 1), lambda hg, b: (0, 0),
                     memory_space=pltpu.SMEM),
    )
    if mask_branch is None:
        mask_branch = _mask_branch_default()
    dq, dk, dv, dbias, dscale = pl.pallas_call(
        _flat_bwd2_kernel_factory(GL, hd, ws, shift, nWh, nWw, mxu_bf16,
                                  tn_dots=tn_dots, mask_branch=mask_branch,
                                  pipelined=pipelined),
        grid=(NB, Bn),
        in_specs=[spec(0), spec(NB), spec(2 * NB), bias_spec, scale_spec,
                  gout_spec, gout_spec, r_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(qkv, qkv, qkv, bias, scale, g, o, r)
    return dq, dk, dv, dbias, dscale.reshape(H)


def window_attention_flat_reference(qkv, bias, logit_scale,
                                    mask: Optional[np.ndarray] = None):
    """Plain-XLA flat-layout composition (tests, non-TPU backends)."""
    Bn, N, threeC = qkv.shape
    C = threeC // 3
    H = bias.shape[0]
    hd = C // H
    x = qkv.reshape(Bn, N, 3, H, hd).transpose(2, 0, 3, 1, 4)
    out = window_attention_reference(x[0], x[1], x[2], bias, logit_scale,
                                     mask)                  # [Bn, H, N, hd]
    return out.transpose(0, 2, 1, 3).reshape(Bn, N, C)


@functools.lru_cache(maxsize=None)
def make_window_attention_flat(shift: int, nWh: int, nWw: int,
                               mxu_bf16: bool = False,
                               interpret: bool = False):
    @jax.custom_vjp
    def attn(qkv, bias, logit_scale):
        return pallas_window_attention_flat(qkv, bias, logit_scale, shift,
                                            nWh, nWw, mxu_bf16=mxu_bf16,
                                            interpret=interpret)

    def fwd(qkv, bias, logit_scale):
        return attn(qkv, bias, logit_scale), (qkv, bias, logit_scale)

    def bwd(res, g):
        qkv, bias, logit_scale = res
        dq, dk, dv, dbias, dscale = pallas_window_attention_flat_bwd(
            qkv, bias, logit_scale, g, shift, nWh, nWw, mxu_bf16=mxu_bf16,
            interpret=interpret)
        dqkv = jnp.concatenate([dq, dk, dv], axis=-1).astype(qkv.dtype)
        return dqkv, dbias, dscale.astype(jnp.asarray(logit_scale).dtype)

    attn.defvjp(fwd, bwd)
    return attn


@functools.lru_cache(maxsize=None)
def _make_flat_attach_grad(shift: int, nWh: int, nWw: int,
                           mxu_bf16: bool = False, interpret: bool = False,
                           tn_dots: bool = False, pipelined: bool = False):
    """The v2 gradient attachment: a custom_vjp IDENTITY on the forward
    output whose residuals are exactly the checkpoint-named tensors the
    caller passes in (qkv, bias, scale, out, rowsums). Keeping the forward
    kernel OUTSIDE the custom_vjp (stop-gradient'd, named) guarantees the
    remat policy can save out/rowsums by name and the backward never
    replays the forward kernel — residual recompute stops at the saved
    values (the v1 path relied on residuals being kernel INPUTS for the
    same property)."""

    @jax.custom_vjp
    def attach(qkv, bias, logit_scale, out, r):
        return out

    def fwd(qkv, bias, logit_scale, out, r):
        return out, (qkv, bias, logit_scale, out, r)

    def bwd(res, g):
        qkv, bias, logit_scale, out, r = res
        dq, dk, dv, dbias, dscale = pallas_window_attention_flat_bwd2(
            qkv, bias, logit_scale, out, r, g, shift, nWh, nWw,
            interpret=interpret, mxu_bf16=mxu_bf16, tn_dots=tn_dots,
            pipelined=pipelined)
        dqkv = jnp.concatenate([dq, dk, dv], axis=-1)
        # out/r are stop-gradient'd upstream; zero cotangents are DCE'd
        return (dqkv.astype(qkv.dtype), dbias,
                dscale.astype(jnp.asarray(logit_scale).dtype),
                jnp.zeros_like(out), jnp.zeros_like(r))

    attach.defvjp(fwd, bwd)
    return attach


def window_attention_flat(qkv, bias, logit_scale, shift: int = 0,
                          nWh: int = 1, nWw: int = 1,
                          mxu_bf16: bool = False, interpret: bool = False,
                          bwd_v2: Optional[bool] = None):
    """Flat-layout fused window attention with autodiff (static shift and
    window grid). The production kernel — see the design note above.

    ``bwd_v2`` (default: env MVULD_ATTN_BWD, "v2" unless set to "v1")
    selects the backward generation: v2 saves the forward output + the
    reciprocal softmax row sums as named residuals ("attn_out" /
    "attn_rowsum" — both in SwinTransformerV2.saved_names) and uses the
    flash-attention identity Σ dp·p = rowsum(g·o) to drop two [N, N] VPU
    passes from the backward kernel; it also emits the forward output and
    dq/dk/dv in the model dtype directly."""
    if bwd_v2 is None:
        bwd_v2 = _flat_bwd_v2_default()
    mxu_bf16 = _mxu_bf16_default(mxu_bf16)
    if not bwd_v2:
        return make_window_attention_flat(shift, nWh, nWw, mxu_bf16,
                                          interpret)(qkv, bias, logit_scale)
    # stop_gradient on the INPUTS: no tangents may enter the forward
    # pallas_call (its JVP rule would fire during linearization even though
    # the cotangent of out/r is zero) — all gradients flow through the
    # attach-grad custom_vjp below instead
    out, r = pallas_window_attention_flat(
        jax.lax.stop_gradient(qkv), jax.lax.stop_gradient(bias),
        jax.lax.stop_gradient(logit_scale), shift, nWh, nWw,
        interpret=interpret, mxu_bf16=mxu_bf16, return_rowsum=True,
        out_dtype=qkv.dtype)
    out = checkpoint_name(out, "attn_out")
    r = checkpoint_name(r, "attn_rowsum")
    return _make_flat_attach_grad(shift, nWh, nWw, mxu_bf16, interpret,
                                  tn_dots=_tn_dots_default(),
                                  pipelined=_bwd_pipelined_default())(
        qkv, bias, logit_scale, out, r)


def window_attention_flat_sharded(qkv, bias, logit_scale, shift: int,
                                  nWh: int, nWw: int, mesh, axis: str,
                                  mxu_bf16: bool = False,
                                  interpret: bool = False):
    """Sequence-parallel flat window attention: the window axis (Bn) is
    sharded over a mesh axis via shard_map, each device running the fused
    kernel on its own windows — a capability the reference's
    single-GPU-window-loop design cannot express (SURVEY §5 long-context
    note). Windows are fully independent along Bn, so the forward needs NO
    collectives; the backward all-reduces only the tiny dbias [H, N, N] and
    dscale [H] partial sums (shard_map inserts the psum when transposing
    the replicated-in specs).

    Requires the per-device shard to hold whole images' window sets
    (B % axis_size == 0) so the in-kernel window-id → boundary-mask mapping
    (b % nW) stays correct on every shard.
    """
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map  # jax ≥ 0.7 style
        def smap(f, in_specs, out_specs):
            return shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
    except ImportError:
        from jax.experimental.shard_map import shard_map as _sm
        def smap(f, in_specs, out_specs):
            return _sm(f, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_rep=False)

    Bn = qkv.shape[0]
    nW = max(nWh * nWw, 1)
    k = mesh.shape[axis]
    if (Bn // nW) % k != 0:
        raise ValueError(
            f"sequence-parallel window attention: batch {Bn//nW} (Bn={Bn}, "
            f"nW={nW}) must be a multiple of the '{axis}' axis size {k}")

    def per_shard(q, b, s):
        return window_attention_flat(q, b, s, shift, nWh, nWw,
                                     mxu_bf16=mxu_bf16, interpret=interpret)

    return smap(per_shard,
                in_specs=(P(axis), P(), P()),
                out_specs=P(axis))(qkv, bias, logit_scale)
