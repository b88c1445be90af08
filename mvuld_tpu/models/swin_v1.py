"""Swin Transformer V1 — classic pre-norm Swin with a discrete relative-
position bias table (reference: mvuld/models/swin_transformer.py:458-585).

Differences from V2 (swin_v2.py):
  * pre-norm blocks (norm before attn/mlp, residual adds raw branch output),
  * scaled dot-product attention (q·kᵀ/√d) instead of cosine attention,
  * a learned ``relative_position_bias_table`` parameter [(2W-1)², H]
    gathered by the static position index (the table the reference's
    checkpoint surgery bicubic-interpolates across window sizes,
    mvuld/utils.py:72-90),
  * single fused qkv bias,
  * PatchMerging applies norm BEFORE the reduction.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mvuld_tpu.models.swin_v2 import (DropPath, MlpBlock, SwinV2Config,
                                      relative_position_index,
                                      shifted_window_mask, window_partition,
                                      window_reverse)


@dataclasses.dataclass(frozen=True)
class SwinV1Config(SwinV2Config):
    qk_scale: Optional[float] = None

    @staticmethod
    def from_cfg(cfg) -> "SwinV1Config":
        s = cfg.MODEL.SWIN
        return SwinV1Config(
            img_size=cfg.DATA.IMG_SIZE, patch_size=s.PATCH_SIZE,
            in_chans=s.IN_CHANS, num_classes=cfg.MODEL.NUM_CLASSES,
            embed_dim=s.EMBED_DIM, depths=tuple(s.DEPTHS),
            num_heads=tuple(s.NUM_HEADS), window_size=s.WINDOW_SIZE,
            mlp_ratio=s.MLP_RATIO, qkv_bias=s.QKV_BIAS, qk_scale=s.QK_SCALE,
            drop_rate=cfg.MODEL.DROP_RATE,
            drop_path_rate=cfg.MODEL.DROP_PATH_RATE,
            ape=s.APE, patch_norm=s.PATCH_NORM,
            pretrained_window_sizes=(0,) * len(s.DEPTHS),
            dtype=jnp.bfloat16 if cfg.PARALLEL.DTYPE == "bfloat16" else jnp.float32,
        )


class WindowAttentionV1(nn.Module):
    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[np.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        Bn, N, C = x.shape
        H = self.num_heads
        hd = C // H
        scale = self.qk_scale or hd ** -0.5
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(Bn, N, 3, H, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * scale, qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32)

        # discrete relative position bias table (the V1 signature piece)
        table = self.param("relative_position_bias_table",
                           nn.initializers.truncated_normal(0.02),
                           ((2 * self.window_size - 1) ** 2, H))
        idx = jnp.asarray(relative_position_index(self.window_size).reshape(-1))
        bias = table[idx].reshape(N, N, H).transpose(2, 0, 1)
        attn = attn + bias[None].astype(jnp.float32)

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(Bn // nW, nW, H, N, N) + jnp.asarray(mask)[None, :, None]
            attn = attn.reshape(Bn, H, N, N)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(self.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(Bn, N, C)
        out = nn.Dense(C, dtype=self.dtype, name="proj")(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)


class SwinBlockV1(nn.Module):
    """Pre-norm shifted-window block; ``mlp_layer`` is injectable so the MoE
    variant can swap the FFN (reference: swin_transformer_moe.py MoEMlp)."""

    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int
    shift_size: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    dtype: Any = jnp.float32
    mlp_layer: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        Hr, Wr = self.input_resolution
        window, shift = self.window_size, self.shift_size
        if min(Hr, Wr) <= window:
            window, shift = min(Hr, Wr), 0
        B, L, C = x.shape
        shortcut = x
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x.reshape(B, Hr, Wr, C)
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        xw = window_partition(x, window)
        mask = shifted_window_mask(Hr, Wr, window, shift)
        attn = WindowAttentionV1(self.dim, window, self.num_heads,
                                 self.qkv_bias, self.qk_scale, self.attn_drop,
                                 self.drop, dtype=self.dtype,
                                 name="attn")(xw, mask, deterministic)
        x = window_reverse(attn, window, Hr, Wr)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x.reshape(B, L, C)
        x = shortcut + DropPath(self.drop_path, name="drop_path1")(x, deterministic)

        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        aux = None
        if self.mlp_layer is not None:
            y = self.mlp_layer(int(C * self.mlp_ratio), C, self.drop,
                               dtype=self.dtype, name="mlp")(y, deterministic)
            if isinstance(y, tuple):
                y, aux = y
        else:
            y = MlpBlock(int(C * self.mlp_ratio), C, self.drop,
                         dtype=self.dtype, name="mlp")(y, deterministic)
        x = x + DropPath(self.drop_path, name="drop_path2")(y, deterministic)
        if aux is not None:
            return x, aux
        return x


class PatchMergingV1(nn.Module):
    """norm BEFORE reduction (V1 order)."""

    input_resolution: Tuple[int, int]
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        Hr, Wr = self.input_resolution
        B, L, C = x.shape
        x = x.reshape(B, Hr // 2, 2, Wr // 2, 2, C).transpose(0, 1, 3, 4, 2, 5)
        x0 = x[:, :, :, 0, 0]
        x1 = x[:, :, :, 0, 1]
        x2 = x[:, :, :, 1, 0]
        x3 = x[:, :, :, 1, 1]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1).reshape(B, L // 4, 4 * C)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * C, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)


class SwinTransformerV1(nn.Module):
    config: SwinV1Config

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 return_features: bool = False) -> jnp.ndarray:
        from mvuld_tpu.models.swin_v2 import PatchEmbed
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
        bi = 0
        for i_layer, depth in enumerate(c.depths):
            dim = int(c.embed_dim * 2 ** i_layer)
            resolution = (res // 2 ** i_layer, res // 2 ** i_layer)
            for i_block in range(depth):
                x = SwinBlockV1(
                    dim=dim, input_resolution=resolution,
                    num_heads=c.num_heads[i_layer], window_size=c.window_size,
                    shift_size=0 if i_block % 2 == 0 else c.window_size // 2,
                    mlp_ratio=c.mlp_ratio, qkv_bias=c.qkv_bias,
                    qk_scale=c.qk_scale, drop=c.drop_rate,
                    attn_drop=c.attn_drop_rate, drop_path=float(dpr[bi]),
                    dtype=c.dtype,
                    name=f"layers_{i_layer}_blocks_{i_block}")(x, deterministic)
                bi += 1
            if i_layer < len(c.depths) - 1:
                x = PatchMergingV1(resolution, dim, dtype=c.dtype,
                                   name=f"layers_{i_layer}_downsample")(x)
        x = nn.LayerNorm(dtype=c.dtype, name="norm")(x)
        x = x.mean(axis=1).astype(jnp.float32)
        if return_features:
            return x
        return nn.Dense(c.num_classes, dtype=jnp.float32, name="head")(x)
