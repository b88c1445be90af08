"""Swin Transformer V2 in Flax — the image-modality backbone.

From-scratch TPU-native implementation of the architecture the reference uses
for rendered code-graph images (reference: mvuld/models/swin_transformer_v2.py
:16-652; fine-tune config: SwinV2-Base, embed 128, depths [2,2,18,2], heads
[4,8,16,32], window 24→28, img 384→448, pretrained_window_sizes [12,12,12,6]).

Architecture (post-norm SwinV2):
  * patch embed: 4×4 conv stride 4 (NHWC — TPU-native layout) + LayerNorm
  * 4 stages of shifted-window blocks; PatchMerging between stages
  * window attention V2: cosine similarity × clamped learnable logit scale,
    continuous relative-position bias from a 2-layer log-CPB MLP,
    q/v-only bias in the qkv projection (no k bias)
  * forward_features → mean-pooled final-dim embedding (1024 for base)

TPU design choices (not in the torch original):
  * windows partition via reshape/transpose — no gather;
  * shifted windows via jnp.roll, masks precomputed as static constants;
  * softmax in fp32, everything else in a configurable compute dtype (bf16);
  * the relative-coords table and position index are host-side numpy
    constants baked into the jaxpr, not buffers;
  * optional jax.checkpoint (remat) per block (TRAIN.USE_CHECKPOINT).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name


@dataclasses.dataclass(frozen=True)
class PallasOpts:
    """How the fused window-attention kernel runs.

    ``sp_mesh``/``sp_axis``: shard the window axis over this mesh axis
    (sequence parallelism — ops/window_attention.py
    window_attention_flat_sharded). ``interpret``: run the kernel in Pallas
    interpret mode (CPU tests / the driver's virtual-device dryrun)."""

    sp_mesh: Any = None
    sp_axis: Optional[str] = None
    interpret: bool = False


@dataclasses.dataclass(frozen=True)
class SwinV2Config:
    img_size: int = 448
    patch_size: int = 4
    in_chans: int = 3
    num_classes: int = 2
    embed_dim: int = 128
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 28
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.2
    ape: bool = False
    patch_norm: bool = True
    pretrained_window_sizes: Tuple[int, ...] = (0, 0, 0, 0)
    dtype: Any = jnp.float32

    @staticmethod
    def from_cfg(cfg) -> "SwinV2Config":
        s = cfg.MODEL.SWINV2
        return SwinV2Config(
            img_size=cfg.DATA.IMG_SIZE, patch_size=s.PATCH_SIZE,
            in_chans=s.IN_CHANS, num_classes=cfg.MODEL.NUM_CLASSES,
            embed_dim=s.EMBED_DIM, depths=tuple(s.DEPTHS),
            num_heads=tuple(s.NUM_HEADS), window_size=s.WINDOW_SIZE,
            mlp_ratio=s.MLP_RATIO, qkv_bias=s.QKV_BIAS,
            drop_rate=cfg.MODEL.DROP_RATE, drop_path_rate=cfg.MODEL.DROP_PATH_RATE,
            ape=s.APE, patch_norm=s.PATCH_NORM,
            pretrained_window_sizes=tuple(s.PRETRAINED_WINDOW_SIZES),
            dtype=jnp.bfloat16 if cfg.PARALLEL.DTYPE == "bfloat16" else jnp.float32,
        )

    @property
    def num_features(self) -> int:
        return int(self.embed_dim * 2 ** (len(self.depths) - 1))

    def flops(self) -> int:
        """Analytic forward FLOPs per image (reference: per-module flops()
        methods, swin_transformer_v2.py:185-196, 312-324, 439-445, 645-652)."""
        res = self.img_size // self.patch_size
        total = 2 * res * res * self.in_chans * self.embed_dim * self.patch_size ** 2
        for i, depth in enumerate(self.depths):
            dim = self.embed_dim * 2 ** i
            r = res // 2 ** i
            L = r * r
            w = min(self.window_size, r)
            n = w * w
            n_windows = L // n
            per_block = (
                2 * L * dim * 3 * dim                 # qkv
                + 2 * n_windows * self.num_heads[i] * n * n * (dim // self.num_heads[i]) * 2
                + 2 * L * dim * dim                   # proj
                + 2 * 2 * L * dim * int(dim * self.mlp_ratio)  # mlp
            )
            total += depth * per_block
            if i < len(self.depths) - 1:
                total += 2 * (L // 4) * 4 * dim * 2 * dim      # patch merging
        total += 2 * (res // 2 ** (len(self.depths) - 1)) ** 2 * self.num_features
        return int(total)


# --------------------------------------------------------------------------- #
# static (host-side) geometry helpers
# --------------------------------------------------------------------------- #

@functools.lru_cache(maxsize=None)
def relative_coords_table(window_size: int, pretrained_window_size: int = 0
                          ) -> np.ndarray:
    """Log-spaced continuous relative coordinates, [(2W-1)², 2] — the CPB
    MLP's input (reference: swin_transformer_v2.py:96-115)."""
    ws = window_size
    h = np.arange(-(ws - 1), ws, dtype=np.float64)
    w = np.arange(-(ws - 1), ws, dtype=np.float64)
    table = np.stack(np.meshgrid(h, w, indexing="ij"), axis=-1)  # [2W-1,2W-1,2]
    denom = (pretrained_window_size - 1) if pretrained_window_size > 0 else (ws - 1)
    denom = max(denom, 1)
    table = table / denom
    table = table * 8
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / np.log2(8)
    return table.reshape(-1, 2).astype(np.float32)


@functools.lru_cache(maxsize=None)
def relative_position_index(window_size: int) -> np.ndarray:
    """[W², W²] index into the (2W-1)² bias table (reference: :117-127)."""
    ws = window_size
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    coords = coords.reshape(2, -1)                      # [2, W²]
    rel = coords[:, :, None] - coords[:, None, :]       # [2, W², W²]
    rel = rel.transpose(1, 2, 0)                        # [W², W², 2]
    rel = rel + (ws - 1)
    idx = rel[..., 0] * (2 * ws - 1) + rel[..., 1]
    return idx.astype(np.int32)


@functools.lru_cache(maxsize=None)
def _bias_onehots(window_size: int) -> Tuple[np.ndarray, np.ndarray]:
    """One-hot matrices turning the CPB table into the [N, N] bias via two
    MXU matmuls instead of a 614k-row gather (TPU gathers are scalar-slow;
    this was ~75% of SwinV2-448 forward time). The bias is block-Toeplitz:
    bias[(y1,x1),(y2,x2)] = B[y1-y2+W-1, x1-x2+W-1], so with
    onehot[y1, y2, d] = δ(y1-y2+W-1=d), bias = einsum over the y-offset
    then the x-offset axes."""
    ws = window_size
    pairs = np.arange(ws)
    delta = pairs[:, None] - pairs[None, :] + ws - 1          # [W, W]
    onehot = np.zeros((ws, ws, 2 * ws - 1), np.float32)
    onehot[pairs[:, None], pairs[None, :], delta] = 1.0       # [W, W, 2W-1]
    return onehot, onehot


def relative_bias_from_table(cpb: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """[(2W-1)², H] CPB outputs → [H, W², W²] bias, gather-free.

    Output-layout note (r4 profile, runs/r4s3/prof): the expansion's
    consumer wants the head axis OUTERMOST, and rows/cols interleave the
    y/x pair axes as (y1,x1)/(y2,x2). A dot can only emit
    lhs-free-then-rhs-free dim order, so ``habcd`` (h,y1,y2,x1,x2) is the
    closest native output; ONE transpose then swaps the middle axes and the
    final reshape is a bitcast. The previous (y-pairs × x-pairs) version
    needed two full-tensor copies plus fp32 reshapes — ~40 ms/step of
    HBM-bound data formatting at bs64-448 on the 18-block stage."""
    ws = window_size
    T = 2 * ws - 1
    H = cpb.shape[-1]
    B2 = cpb.reshape(T, T, H)
    oy, ox = _bias_onehots(ws)
    oy = jnp.asarray(oy, cpb.dtype)    # [W, W, T] over (y1, y2, Δy)
    ox = jnp.asarray(ox, cpb.dtype)
    # By[h, y1, y2, s] = Σ_t oy[y1,y2,t] B2[t,s,h]   (small: H·W²·T)
    By = jnp.einsum("abt,tsh->habs", oy, B2)
    # C[h, y1, y2, x1, x2] = Σ_s By[h,y1,y2,s] ox[x1,x2,s] — native habcd
    C = jnp.einsum("habs,cds->habcd", By, ox)
    # transpose+merge as ONE HLO reshape-with-dimensions: a separate 5-D
    # transpose materializes [.., 28, 28]-minor tiles (lane dim 28/128 —
    # the TPU tile pads each to (8,128)) and then repacks; folding the
    # permutation into the reshape keeps it a single well-tiled copy
    return jax.lax.reshape(C, (H, ws * ws, ws * ws),
                           dimensions=(0, 1, 3, 2, 4))


@functools.lru_cache(maxsize=None)
def shifted_window_mask(H: int, W: int, window: int, shift: int) -> Optional[np.ndarray]:
    """Additive attention mask [nW, W², W²] for shifted windows
    (reference: :233-252). None when shift == 0."""
    if shift == 0:
        return None
    img_mask = np.zeros((H, W), np.int32)
    cnt = 0
    for h_sl in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for w_sl in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img_mask[h_sl, w_sl] = cnt
            cnt += 1
    mask = img_mask.reshape(H // window, window, W // window, window)
    mask = mask.transpose(0, 2, 1, 3).reshape(-1, window * window)
    attn_mask = mask[:, None, :] - mask[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """[B, H, W, C] → [B·nW, window², C] via reshape/transpose (no gather)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // window, window, W // window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, C)


def window_reverse(x: jnp.ndarray, window: int, H: int, W: int) -> jnp.ndarray:
    B = x.shape[0] // ((H // window) * (W // window))
    C = x.shape[-1]
    x = x.reshape(B, H // window, W // window, window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


def window_shift_regroup(xw: jnp.ndarray, window: int, H: int, W: int,
                         dh: int, dw: int) -> jnp.ndarray:
    """Re-group windows after a (dh, dw) roll of the underlying feature map,
    staying in window layout [Bn, N, C] — reverse∘roll∘partition composed so
    XLA emits ONE layout copy instead of the three separate HBM passes the
    spatial-resident block pays per shift (the window-resident fast path)."""
    x = window_reverse(xw, window, H, W)
    x = jnp.roll(x, (dh, dw), axis=(1, 2))
    return window_partition(x, window)


# --------------------------------------------------------------------------- #
# modules
# --------------------------------------------------------------------------- #

class DropPath(nn.Module):
    """Per-sample stochastic depth. ``rate`` may be overridden by a traced
    call-time value (needed when blocks run under lax.scan with per-block
    rates as scanned inputs)."""

    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 rate: Optional[jnp.ndarray] = None,
                 batch_repeat: int = 1) -> jnp.ndarray:
        """``batch_repeat``: leading-dim entries per sample — in window
        layout [B·nW, N, C] the drop decision must be per IMAGE, so one
        bernoulli per B is repeated nW times (keeps parity with the
        spatial-resident path where the leading dim IS the image batch)."""
        if deterministic or (rate is None and self.rate == 0.0):
            return x
        keep = 1.0 - (self.rate if rate is None else rate)
        keep = jnp.asarray(keep, jnp.float32)
        B = x.shape[0] // batch_repeat
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep,
                                    (B,) + (1,) * (x.ndim - 1))
        if batch_repeat > 1:
            mask = jnp.repeat(mask, batch_repeat, axis=0)
        # keep the carry dtype stable under lax.scan (bf16 in, bf16 out)
        return jnp.where(mask, x / keep.astype(x.dtype), jnp.zeros((), x.dtype))


class MlpBlock(nn.Module):
    hidden: int
    out: int
    drop: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class _DenseParams(nn.Module):
    """Declares nn.Dense's params (same names/shapes/inits) WITHOUT the
    matmul — the fused Pallas MLP consumes the raw weights, but checkpoints
    and converters must see an identical parameter tree."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", nn.linear.default_kernel_init,
                       (in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _MlpParams(nn.Module):
    """MlpBlock's parameter tree (mlp/fc1, mlp/fc2) as raw weights."""

    hidden: int
    out: int

    @nn.compact
    def __call__(self, in_features: int):
        w1, b1 = _DenseParams(self.hidden, name="fc1")(in_features)
        w2, b2 = _DenseParams(self.out, name="fc2")(self.hidden)
        return w1, b1, w2, b2


class _LNParams(nn.Module):
    """nn.LayerNorm's parameter pair (scale, bias) as raw weights."""

    @nn.compact
    def __call__(self, features: int):
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        return scale, bias


class WindowAttentionV2(nn.Module):
    """SwinV2 cosine window attention with log-CPB continuous bias
    (reference: swin_transformer_v2.py WindowAttention:60-196)."""

    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    pretrained_window_size: int = 0
    dtype: Any = jnp.float32
    use_pallas: bool = False   # fused Pallas kernel (TPU) for the attention core
    pallas_opts: Optional[PallasOpts] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[np.ndarray] = None,
                 deterministic: bool = True, shift: int = 0,
                 window_grid: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
        """x: [B, Hp, Wp, C] feature map (already shifted when applicable) —
        OR, with ``window_grid=(nWh, nWw)``, an already-partitioned
        [Bn, N, C] window layout (the window-resident fast path: the block
        keeps activations in window layout between blocks and this module
        does zero layout copies). Returns the same layout it was given.
        The Pallas path's shift mask is synthesized in-kernel from
        ``shift``; the XLA path adds ``mask``."""
        if window_grid is not None:
            Bn_in, N_in, C = x.shape
            nWh_g, nWw_g = window_grid
            Hp = nWh_g * self.window_size
            Wp = nWw_g * self.window_size
            B = Bn_in // (nWh_g * nWw_g)
        else:
            B, Hp, Wp, C = x.shape
        ws = self.window_size
        H = self.num_heads
        hd = C // H
        N = ws * ws

        # qkv with q/v-only bias (no k bias — reference :128-134, 147-150);
        # one big MXU GEMM over all tokens instead of per-window
        qkv_w = self.param("qkv_kernel", nn.initializers.lecun_normal(), (C, 3 * C))
        x_ = x.astype(self.dtype)
        qkv_b = None
        if self.qkv_bias:
            q_bias = self.param("q_bias", nn.initializers.zeros, (C,))
            v_bias = self.param("v_bias", nn.initializers.zeros, (C,))
            qkv_b = jnp.concatenate([q_bias, jnp.zeros_like(q_bias), v_bias])

        # cosine attention with clamped learnable temperature (:151-158)
        logit_scale = self.param(
            "logit_scale",
            lambda _key, shape: jnp.full(shape, float(np.log(10.0))),
            (H, 1, 1))
        scale = jnp.exp(jnp.minimum(logit_scale, float(np.log(100.0))))

        # continuous relative position bias (:159-164): 2→512→H MLP over the
        # log-spaced coords table, 16·sigmoid, gathered by position index
        table = jnp.asarray(relative_coords_table(
            self.window_size, self.pretrained_window_size))
        cpb = nn.Dense(512, name="cpb_fc1")(table)
        cpb = nn.relu(cpb)
        cpb = nn.Dense(H, use_bias=False, name="cpb_fc2")(cpb)   # [(2W-1)², H]
        # gather-free block-Toeplitz expansion (two one-hot MXU matmuls);
        # equals cpb[relative_position_index].reshape(N,N,H).transpose —
        # the naive gather was the dominant forward cost at 448².
        # Expanded in the COMPUTE dtype: at bf16 the [N², H] layout
        # copies/reshapes the expansion lowers to move half the bytes
        # (profiled ~22 ms/step of fp32 bias-layout traffic at bs64-448),
        # and the remat-saved pre-sigmoid tensor shrinks the same 2×; the
        # cpb MLP itself and the post-sigmoid bias stay fp32
        bias = relative_bias_from_table(cpb.astype(self.dtype),
                                        self.window_size)         # [H, N, N]
        # named for the remat policy (SwinTransformerV2.saved_names): tagged
        # PRE-sigmoid — the sigmoid's own bwd needs this value, so saving it
        # (rather than the post-sigmoid bias) is what lets DCE drop the
        # whole expansion from the remat recompute; rebuilding the kernel's
        # bias residual is then one elementwise op.
        bias = checkpoint_name(bias, "attn_bias")
        bias = 16.0 * jax.nn.sigmoid(bias.astype(jnp.float32))

        if self.use_pallas and self.attn_drop == 0.0:
            # flat-layout fused attention (ops/window_attention.py, the
            # production kernel): partition the C-channel map ONCE, run the
            # qkv GEMM in window layout so its [Bn, N, 3C] output feeds the
            # kernel directly (static per-4-head lane blocks, bias fetched
            # once per head group, shift mask synthesized in-kernel);
            # model-dtype in / fp32 out — both casts fuse into the GEMMs.
            # mxu_bf16=False: measured SLOWER on v5e — the kernel is
            # VPU-bound (softmax chain), and the bf16 casts add VPU passes
            from mvuld_tpu.ops.window_attention import (
                _flat_bwd_v2_default, window_attention_flat,
                window_attention_flat_sharded)
            xw = x_ if window_grid is not None else window_partition(x_, ws)
            qkv = xw @ qkv_w.astype(self.dtype)           # [Bn, N, 3C]
            if qkv_b is not None:
                qkv = qkv + qkv_b.astype(self.dtype)
            # optionally name the qkv projection for the remat policy too:
            # saving it (~4.8 GB bf16 at bs64) removes the qkv-GEMM recompute
            # from the backward pass on top of the attn_out save
            qkv = checkpoint_name(qkv, "qkv")
            po = self.pallas_opts or PallasOpts()
            if po.sp_mesh is not None and po.sp_axis:
                out = window_attention_flat_sharded(
                    qkv, bias, scale.reshape(H), shift=shift, nWh=Hp // ws,
                    nWw=Wp // ws, mesh=po.sp_mesh, axis=po.sp_axis,
                    interpret=po.interpret)               # [Bn, N, C] fp32
            else:
                out = window_attention_flat(
                    qkv, bias, scale.reshape(H), shift=shift, nWh=Hp // ws,
                    nWw=Wp // ws, interpret=po.interpret) # [Bn, N, C] fp32
            out = out.astype(self.dtype)
            # the v2 backward path checkpoint-names its residuals
            # ("attn_out"/"attn_rowsum") INSIDE window_attention_flat —
            # naming again here would save a second copy under remat
            named_inside = _flat_bwd_v2_default()
            if window_grid is None:
                out = window_reverse(out, ws, Hp, Wp)     # [B, Hp, Wp, C]
        else:
            assert window_grid is None, \
                "window-resident layout requires the Pallas path"
            qkv = x_ @ qkv_w.astype(self.dtype)           # [B, Hp, Wp, 3C]
            if qkv_b is not None:
                qkv = qkv + qkv_b.astype(self.dtype)
            qkvw = window_partition(qkv, ws)                  # [Bn, N, 3C]
            Bn = qkvw.shape[0]
            qkvw = qkvw.reshape(Bn, N, 3, H, hd).transpose(2, 0, 3, 1, 4)
            q, k, v = qkvw[0], qkvw[1], qkvw[2]               # [Bn, H, N, hd]
            q = q / jnp.maximum(jnp.linalg.norm(q.astype(jnp.float32), axis=-1,
                                                keepdims=True), 1e-12).astype(self.dtype)
            k = k / jnp.maximum(jnp.linalg.norm(k.astype(jnp.float32), axis=-1,
                                                keepdims=True), 1e-12).astype(self.dtype)
            attn = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32)
            attn = attn * scale
            attn = attn + bias[None]

            if mask is not None:
                nW = mask.shape[0]
                m = jnp.asarray(mask)                              # [nW, N, N]
                attn = attn.reshape(Bn // nW, nW, H, N, N) + m[None, :, None]
                attn = attn.reshape(Bn, H, N, N)

            attn = jax.nn.softmax(attn, axis=-1)
            attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
            out = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(self.dtype), v)
            out = out.transpose(0, 2, 1, 3).reshape(Bn, N, C)
            out = window_reverse(out, ws, Hp, Wp)             # [B, Hp, Wp, C]
            named_inside = False
        # Name the attention output for selective remat: under
        # jax.checkpoint(policy=save_only_these_names("attn_out")) the bwd
        # pass reads this saved value instead of RE-RUNNING the fused fwd
        # attention kernel (the kernel's custom-VJP residuals are its inputs,
        # which the policy recomputes via the cheap qkv GEMM; the output is
        # only needed downstream by proj's bwd — saving it severs the one
        # data dependency that forced the kernel re-run). ~Hp·Wp·C bf16 per
        # block (~1.6 GB total for SwinV2-Base-448 @ bs64). The v2 flat path
        # names inside the kernel wrapper instead (named_inside above).
        if not named_inside:
            out = checkpoint_name(out, "attn_out")
        out = nn.Dense(C, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class SwinBlockV2(nn.Module):
    """Post-norm shifted-window block (reference: :198-330): residuals add
    the NORMALIZED branch outputs (norm after attn/mlp — the V2 change)."""

    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int
    shift_size: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    pretrained_window_size: int = 0
    dtype: Any = jnp.float32
    use_pallas: bool = False
    pallas_opts: Optional[PallasOpts] = None
    # window-resident fast path: activations stay in window layout
    # [B·nW, N, C] BETWEEN blocks (LN/MLP/residuals are token-local, so the
    # layout is free for them); only a shifted block pays layout copies —
    # two composed reverse∘roll∘partition regroups — instead of the
    # spatial path's partition+reverse+2·roll per block
    window_resident: bool = False
    # fused Pallas MLP+LN (ops/fused_dense.py mlp_ln): fc1+GELU+fc2+norm2 in
    # one kernel pass; the [M, 4C] hidden never touches HBM. Applies when
    # dropout is 0 and the weights fit VMEM (C ≤ 512 — stage 4's 1024-dim
    # block stays on the XLA path, which is efficient at K=1024)
    use_pallas_mlp: bool = False

    def _mlp_half(self, x, deterministic, drop_path_rate, batch_repeat=1):
        """x + DropPath(LN(MLP(x))) — the post-norm second half of the
        block (reference swin_transformer_v2.py:310-315)."""
        C = x.shape[-1]
        hidden = int(C * self.mlp_ratio)
        if self.use_pallas_mlp and self.drop == 0.0 and C <= 512:
            from mvuld_tpu.ops.fused_dense import mlp_ln
            w1, b1, w2, b2 = _MlpParams(hidden, C, name="mlp")(C)
            gamma, beta = _LNParams(name="norm2")(C)
            interpret = bool(self.pallas_opts and self.pallas_opts.interpret)
            y = mlp_ln(x, w1, b1, w2, b2, gamma, beta, interpret)
            # named for the remat policy: the fused op's custom VJP already
            # recomputes h/z internally from x, so re-running the FORWARD
            # kernel inside the bwd (what jax.checkpoint would do when this
            # output is unsaved) is pure waste — saving [M, C] here costs
            # one bf16 activation and removes a whole fwd kernel pass
            y = checkpoint_name(y, "mlp_out")
        else:
            y = MlpBlock(hidden, C, self.drop, dtype=self.dtype,
                         name="mlp")(x, deterministic)
            y = nn.LayerNorm(dtype=self.dtype, name="norm2")(y)
        return x + DropPath(self.drop_path, name="drop_path2")(
            y, deterministic, rate=drop_path_rate,
            batch_repeat=batch_repeat)

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 drop_path_rate: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        Hr, Wr = self.input_resolution
        window, shift = self.window_size, self.shift_size
        # clamp window to resolution (reference: :216-219)
        if min(Hr, Wr) <= window:
            window, shift = min(Hr, Wr), 0

        if self.window_resident and self.use_pallas:
            return self._window_resident_call(x, window, shift, Hr, Wr,
                                              deterministic, drop_path_rate)

        B, L, C = x.shape
        shortcut = x
        x = x.reshape(B, Hr, Wr, C)
        # the roll happens BEFORE the qkv projection (a per-token op, so
        # roll∘qkv ≡ qkv∘roll) — windows then index directly into the map
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        mask = shifted_window_mask(Hr, Wr, window, shift)
        x = WindowAttentionV2(
            self.dim, window, self.num_heads, self.qkv_bias,
            self.attn_drop, self.drop, self.pretrained_window_size,
            dtype=self.dtype, use_pallas=self.use_pallas,
            pallas_opts=self.pallas_opts,
            name="attn")(x, mask, deterministic, shift=shift)  # [B, Hr, Wr, C]
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x.reshape(B, L, C)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = shortcut + DropPath(self.drop_path, name="drop_path1")(
            x, deterministic, rate=drop_path_rate)

        return self._mlp_half(x, deterministic, drop_path_rate)

    def _window_resident_call(self, x, window, shift, Hr, Wr, deterministic,
                              drop_path_rate):
        """x: [B·nW, N, C] in UNSHIFTED window grouping; returns the same.
        Numerically identical to the spatial path (DropPath repeats one
        per-image mask across the nW window rows)."""
        nWh, nWw = Hr // window, Wr // window
        nW = nWh * nWw
        shortcut = x
        xa = x
        if shift > 0:
            xa = window_shift_regroup(xa, window, Hr, Wr, -shift, -shift)
        xa = WindowAttentionV2(
            self.dim, window, self.num_heads, self.qkv_bias,
            self.attn_drop, self.drop, self.pretrained_window_size,
            dtype=self.dtype, use_pallas=self.use_pallas,
            pallas_opts=self.pallas_opts,
            name="attn")(xa, None, deterministic, shift=shift,
                         window_grid=(nWh, nWw))           # [Bn, N, C]
        if shift > 0:
            xa = window_shift_regroup(xa, window, Hr, Wr, shift, shift)
        xa = nn.LayerNorm(dtype=self.dtype, name="norm1")(xa)
        x = shortcut + DropPath(self.drop_path, name="drop_path1")(
            xa, deterministic, rate=drop_path_rate, batch_repeat=nW)

        return self._mlp_half(x, deterministic, drop_path_rate,
                               batch_repeat=nW)


class BlockPair(nn.Module):
    """One (no-shift, shift) block pair — the repeating unit of a Swin stage.
    Under nn.scan this gives O(1) HLO size per stage instead of O(depth): the
    18-block stage of SwinV2-Base compiles as ONE pair scanned 9 times, which
    cuts whole-model compile time by ~an order of magnitude."""

    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    pretrained_window_size: int = 0
    dtype: Any = jnp.float32
    use_pallas: bool = False
    pallas_opts: Optional[PallasOpts] = None
    window_resident: bool = False
    use_pallas_mlp: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, dp_rates: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        common = dict(dim=self.dim, input_resolution=self.input_resolution,
                      num_heads=self.num_heads, window_size=self.window_size,
                      mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                      drop=self.drop, attn_drop=self.attn_drop,
                      pretrained_window_size=self.pretrained_window_size,
                      dtype=self.dtype, use_pallas=self.use_pallas,
                      pallas_opts=self.pallas_opts,
                      window_resident=self.window_resident,
                      use_pallas_mlp=self.use_pallas_mlp)
        x = SwinBlockV2(**common, shift_size=0, name="block0")(
            x, deterministic, drop_path_rate=dp_rates[0])
        x = SwinBlockV2(**common, shift_size=self.window_size // 2,
                        name="block1")(
            x, deterministic, drop_path_rate=dp_rates[1])
        return x, None   # (carry, per-step output) for nn.scan


class PatchMerging(nn.Module):
    """2×2 patch concat → Linear 4C→2C → norm (post-norm order, :333-364)."""

    input_resolution: Tuple[int, int]
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        Hr, Wr = self.input_resolution
        B, L, C = x.shape
        x = x.reshape(B, Hr // 2, 2, Wr // 2, 2, C)
        # order matches torch: x0=(0::2,0::2), x1=(1::2,0::2), x2=(0::2,1::2), x3=(1::2,1::2)
        x = x.transpose(0, 1, 3, 4, 2, 5)          # [B, H/2, W/2, wcol, hrow, C]
        x0 = x[:, :, :, 0, 0]
        x1 = x[:, :, :, 0, 1]
        x2 = x[:, :, :, 1, 0]
        x3 = x[:, :, :, 1, 1]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1).reshape(B, L // 4, 4 * C)
        x = nn.Dense(2 * C, use_bias=False, dtype=self.dtype, name="reduction")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return x


class PatchEmbed(nn.Module):
    config: SwinV2Config

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.config
        x = nn.Conv(c.embed_dim, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), padding="VALID",
                    dtype=c.dtype, name="proj")(x)          # NHWC
        B, Hp, Wp, C = x.shape
        x = x.reshape(B, Hp * Wp, C)
        if c.patch_norm:
            x = nn.LayerNorm(dtype=c.dtype, name="norm")(x)
        return x


class SwinTransformerV2(nn.Module):
    """Full model. ``return_features=True`` gives the pooled embedding
    (the reference's ``forward_features``, used for the fusion cache);
    otherwise a classification head is applied."""

    config: SwinV2Config
    use_checkpoint: bool = False
    scan_blocks: bool = False   # lax.scan over block pairs (fast compile)
    use_pallas: bool = False    # fused Pallas window-attention kernel (TPU)
    pallas_opts: Optional[PallasOpts] = None  # sequence-parallel / interpret
    # remat policy: save the named attention outputs so the bwd pass never
    # re-runs the fwd attention kernel (trades ~1.6 GB HBM at bs64 for the
    # dominant recompute — measured 538 ms of a 1068 ms bs64 step was
    # attention custom-calls, ~half of it the remat re-run). False = full
    # recompute (round-2 behavior, lowest memory).
    save_attn_in_remat: bool = True
    # additionally save the qkv projections (~4.8 GB bf16 at bs64): the bwd
    # kernel's residuals then come straight from HBM instead of re-running
    # the qkv GEMM + partition copy. Off by default (memory).
    save_qkv_in_remat: bool = False
    # keep activations in window layout between blocks (Pallas path only):
    # one partition per stage + one reverse at stage end + two composed
    # regroups per SHIFTED block, instead of per-block partition/reverse/
    # roll passes. Numerically identical (token-local LN/MLP/residuals are
    # layout-invariant; DropPath repeats its per-image mask across windows).
    window_resident: bool = False
    # fused Pallas MLP+LN kernel for the block's second half (stages with
    # C ≤ 512); see SwinBlockV2.use_pallas_mlp
    use_pallas_mlp: bool = False
    # which stage indices to remat when use_checkpoint is on; None = all.
    # The early stages' recompute fusions run at 16-26% MXU utilization
    # (r4 hlo_stats profile, ~25 ms/step at bs64-448) while their saved
    # activations are comparatively cheap in HBM, so rematting ONLY the
    # deep stage(s) trades a few GB for that recompute time. (The
    # reference's torch.utils.checkpoint applies uniformly to every block,
    # swin_transformer_v2.py:427-431 — per-stage selectivity is a remat-
    # policy degree of freedom torch's API does not expose there.)
    remat_stages: Optional[Tuple[int, ...]] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 return_features: bool = False) -> jnp.ndarray:
        c = self.config
        x = x.astype(c.dtype)
        x = PatchEmbed(c, name="patch_embed")(x)
        if c.ape:
            num_patches = (c.img_size // c.patch_size) ** 2
            ape = self.param("absolute_pos_embed",
                             nn.initializers.truncated_normal(0.02),
                             (1, num_patches, c.embed_dim))
            x = x + ape.astype(c.dtype)
        x = nn.Dropout(c.drop_rate)(x, deterministic=deterministic)

        res = c.img_size // c.patch_size
        dpr = np.linspace(0, c.drop_path_rate, sum(c.depths)).tolist()
        # activation remat per block (reference: TRAIN.USE_CHECKPOINT →
        # torch.utils.checkpoint, swin_transformer_v2.py:427-431)
        # attn_bias rides along with attn_out: the CPB bias is a residual of
        # the attention custom-VJP, so saving it lets DCE drop the whole
        # block-Toeplitz expansion (one-hot matmuls + [ws,ws,ws,ws,H] layout
        # permutes — profiled at ~25 ms/step of the bwd recompute at bs64)
        # for ~0.7 GB of fp32 saves.
        # attn_rowsum: the v2 flat backward's second residual (reciprocal
        # softmax row sums, ~C/(2·hd) the size of attn_out) — saving it is
        # what lets the backward read Σe from the forward instead of
        # re-reducing the [N, N] probabilities (ops/window_attention.py
        # pallas_window_attention_flat_bwd2).
        saved_names = (["attn_out", "attn_bias", "attn_rowsum"]
                       if self.save_attn_in_remat else [])
        if self.save_qkv_in_remat:
            saved_names.append("qkv")
        if self.use_pallas_mlp:
            # the fused-MLP custom VJP recomputes internally; without this
            # save the remat wrapper would run the fwd kernel a second time
            saved_names.append("mlp_out")
        remat_policy = (
            jax.checkpoint_policies.save_only_these_names(*saved_names)
            if saved_names else None)
        block_idx = 0
        for i_layer, depth in enumerate(c.depths):
            stage_ckpt = self.use_checkpoint and (
                self.remat_stages is None or i_layer in self.remat_stages)
            block_cls = (nn.remat(SwinBlockV2, static_argnums=(2,),
                                  policy=remat_policy)
                         if stage_ckpt else SwinBlockV2)
            dim = int(c.embed_dim * 2 ** i_layer)
            resolution = (res // 2 ** i_layer, res // 2 ** i_layer)
            # window-resident: enter window layout ONCE per stage (only
            # worth it while the resolution exceeds the window, i.e. nW>1)
            Hr = resolution[0]
            wres = (self.window_resident and self.use_pallas
                    and Hr > min(c.window_size, Hr))
            if wres:
                ws_l = min(c.window_size, Hr)
                x = window_partition(
                    x.reshape(-1, Hr, Hr, dim), ws_l)       # [Bn, N, C]
            if self.scan_blocks and depth % 2 == 0 and depth >= 2:
                n_pairs = depth // 2
                rates = jnp.asarray(
                    dpr[block_idx: block_idx + depth], jnp.float32
                ).reshape(n_pairs, 2)
                pair_cls = BlockPair
                if stage_ckpt:
                    pair_cls = nn.remat(BlockPair, static_argnums=(3,),
                                        policy=remat_policy)
                scanned = nn.scan(
                    pair_cls,
                    variable_axes={"params": 0},
                    split_rngs={"params": True, "dropout": True},
                    in_axes=(0, nn.broadcast),
                    length=n_pairs)(
                    dim=dim, input_resolution=resolution,
                    num_heads=c.num_heads[i_layer],
                    window_size=c.window_size, mlp_ratio=c.mlp_ratio,
                    qkv_bias=c.qkv_bias, drop=c.drop_rate,
                    attn_drop=c.attn_drop_rate,
                    pretrained_window_size=c.pretrained_window_sizes[i_layer],
                    dtype=c.dtype, use_pallas=self.use_pallas,
                    pallas_opts=self.pallas_opts, window_resident=wres,
                    use_pallas_mlp=self.use_pallas_mlp,
                    name=f"layers_{i_layer}_scan")
                x, _ = scanned(x, rates, deterministic)
                block_idx += depth
            else:
                for i_block in range(depth):
                    x = block_cls(
                        dim=dim, input_resolution=resolution,
                        num_heads=c.num_heads[i_layer], window_size=c.window_size,
                        shift_size=0 if i_block % 2 == 0 else c.window_size // 2,
                        mlp_ratio=c.mlp_ratio, qkv_bias=c.qkv_bias,
                        drop=c.drop_rate, attn_drop=c.attn_drop_rate,
                        drop_path=float(dpr[block_idx]),
                        pretrained_window_size=c.pretrained_window_sizes[i_layer],
                        dtype=c.dtype, use_pallas=self.use_pallas,
                        pallas_opts=self.pallas_opts, window_resident=wres,
                        use_pallas_mlp=self.use_pallas_mlp,
                        name=f"layers_{i_layer}_blocks_{i_block}")(x, deterministic)
                    block_idx += 1
            if wres:
                x = window_reverse(x, ws_l, Hr, Hr).reshape(
                    -1, Hr * Hr, dim)                       # back to [B, L, C]
            if i_layer < len(c.depths) - 1:
                x = PatchMerging(resolution, dim, dtype=c.dtype,
                                 name=f"layers_{i_layer}_downsample")(x)
        x = nn.LayerNorm(dtype=c.dtype, name="norm")(x)
        x = x.mean(axis=1)                                   # [B, num_features]
        x = x.astype(jnp.float32)
        if return_features:
            return x
        return nn.Dense(c.num_classes, dtype=jnp.float32,
                        name="head")(x).astype(jnp.float32)
