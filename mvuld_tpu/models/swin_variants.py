"""Swin-MoE and Swin-MLP variants + the model builder dispatch.

  * SwinTransformerMoE (reference: mvuld/models/swin_transformer_moe.py:43-824)
    — SwinV1 blocks whose FFN is a top-k MoE in the blocks selected by
    MODEL.SWIN_MOE.MOE_BLOCKS ([-1] = none); gate aux losses are summed and
    returned for the trainer to add to CE.
  * SwinMLP (reference: mvuld/models/swin_mlp.py) — attention replaced by a
    grouped spatial MLP over window tokens (one weight block per head).
  * build_model(cfg) — dispatch on MODEL.TYPE ∈ {swin, swinv2, swin_moe,
    swin_mlp} (reference: mvuld/models/build.py:14-106).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from mvuld_tpu.core.registry import MODELS
from mvuld_tpu.models.moe import MoEFFN
from mvuld_tpu.models.swin_v1 import (PatchMergingV1, SwinBlockV1,
                                      SwinTransformerV1, SwinV1Config)
from mvuld_tpu.models.swin_v2 import (DropPath, MlpBlock, PatchEmbed,
                                      SwinTransformerV2, SwinV2Config,
                                      window_partition, window_reverse)


class SwinTransformerMoE(nn.Module):
    """SwinV1 backbone with MoE FFN in selected blocks; returns
    (logits_or_features, aux_loss)."""

    config: SwinV1Config
    moe_blocks: Tuple[Tuple[int, ...], ...] = ((-1,), (-1,), (-1,), (-1,))
    num_experts: int = 4
    top_k: int = 1
    capacity_factor: float = 1.25
    gate_noise: float = 1.0
    aux_weight: float = 0.01

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 return_features: bool = False):
        c = self.config
        x = x.astype(c.dtype)
        x = PatchEmbed(c, name="patch_embed")(x)
        x = nn.Dropout(c.drop_rate)(x, deterministic=deterministic)
        res = c.img_size // c.patch_size
        dpr = np.linspace(0, c.drop_path_rate, sum(c.depths)).tolist()
        aux_total = jnp.zeros((), jnp.float32)
        bi = 0
        for i_layer, depth in enumerate(c.depths):
            dim = int(c.embed_dim * 2 ** i_layer)
            resolution = (res // 2 ** i_layer, res // 2 ** i_layer)
            moe_set = set(self.moe_blocks[i_layer]) if i_layer < len(self.moe_blocks) else set()
            for i_block in range(depth):
                use_moe = i_block in moe_set
                if use_moe:
                    # attention sub-block from SwinBlockV1 with identity mlp,
                    # then the MoE FFN with its aux loss
                    blk = SwinBlockV1(
                        dim=dim, input_resolution=resolution,
                        num_heads=c.num_heads[i_layer],
                        window_size=c.window_size,
                        shift_size=0 if i_block % 2 == 0 else c.window_size // 2,
                        mlp_ratio=c.mlp_ratio, qkv_bias=c.qkv_bias,
                        qk_scale=c.qk_scale, drop=c.drop_rate,
                        attn_drop=c.attn_drop_rate, drop_path=float(dpr[bi]),
                        dtype=c.dtype,
                        mlp_layer=_moe_factory(self),
                        name=f"layers_{i_layer}_blocks_{i_block}")
                    out = blk(x, deterministic)
                    if isinstance(out, tuple):
                        x, aux = out
                        aux_total = aux_total + aux
                    else:
                        x = out
                else:
                    x = SwinBlockV1(
                        dim=dim, input_resolution=resolution,
                        num_heads=c.num_heads[i_layer],
                        window_size=c.window_size,
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
            return x, aux_total
        return nn.Dense(c.num_classes, dtype=jnp.float32,
                        name="head")(x), aux_total


def _moe_factory(parent: "SwinTransformerMoE"):
    def factory(hidden, out, drop, dtype, name):
        moe = MoEFFN(hidden=hidden, out=out, num_experts=parent.num_experts,
                     top_k=parent.top_k,
                     capacity_factor=parent.capacity_factor,
                     gate_noise=parent.gate_noise,
                     aux_weight=parent.aux_weight, drop=drop, dtype=dtype,
                     name=name)

        def call(y, deterministic=True):
            return moe(y, deterministic)

        return call

    return factory


class SwinMLPBlock(nn.Module):
    """Window attention replaced by a grouped spatial MLP over window tokens
    (reference: mvuld/models/swin_mlp.py SwinMLPBlock)."""

    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int
    shift_size: int
    mlp_ratio: float = 4.0
    drop: float = 0.0
    drop_path: float = 0.0
    dtype: Any = jnp.float32

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
        xw = window_partition(x, window)               # [B·nW, w², C]
        # grouped spatial MLP: per head, mix the w² token axis
        n_tok = window * window
        H = self.num_heads
        xw = xw.reshape(-1, n_tok, H, C // H).transpose(0, 2, 1, 3)
        mix = self.param("spatial_mlp",
                         nn.initializers.lecun_normal(),
                         (H, n_tok, n_tok))
        xw = jnp.einsum("bhnd,hmn->bhmd", xw, mix.astype(xw.dtype))
        xw = xw.transpose(0, 2, 1, 3).reshape(-1, n_tok, C)
        x = window_reverse(xw, window, Hr, Wr)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x.reshape(B, L, C)
        x = shortcut + DropPath(self.drop_path, name="drop_path1")(x, deterministic)
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = MlpBlock(int(C * self.mlp_ratio), C, self.drop, dtype=self.dtype,
                     name="mlp")(y, deterministic)
        return x + DropPath(self.drop_path, name="drop_path2")(y, deterministic)


class SwinMLP(nn.Module):
    config: SwinV1Config

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 return_features: bool = False) -> jnp.ndarray:
        c = self.config
        x = x.astype(c.dtype)
        x = PatchEmbed(c, name="patch_embed")(x)
        x = nn.Dropout(c.drop_rate)(x, deterministic=deterministic)
        res = c.img_size // c.patch_size
        dpr = np.linspace(0, c.drop_path_rate, sum(c.depths)).tolist()
        bi = 0
        for i_layer, depth in enumerate(c.depths):
            dim = int(c.embed_dim * 2 ** i_layer)
            resolution = (res // 2 ** i_layer, res // 2 ** i_layer)
            for i_block in range(depth):
                x = SwinMLPBlock(
                    dim=dim, input_resolution=resolution,
                    num_heads=c.num_heads[i_layer], window_size=c.window_size,
                    shift_size=0 if i_block % 2 == 0 else c.window_size // 2,
                    mlp_ratio=c.mlp_ratio, drop=c.drop_rate,
                    drop_path=float(dpr[bi]), dtype=c.dtype,
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


# --------------------------------------------------------------------------- #
# builder (reference: mvuld/models/build.py build_model:14-106)
# --------------------------------------------------------------------------- #

@MODELS.register("swinv2")
def _build_swinv2(cfg, **kw):
    return SwinTransformerV2(SwinV2Config.from_cfg(cfg),
                             use_checkpoint=cfg.TRAIN.USE_CHECKPOINT, **kw)


@MODELS.register("swin")
def _build_swin(cfg, **kw):
    return SwinTransformerV1(SwinV1Config.from_cfg(cfg), **kw)


@MODELS.register("swin_moe")
def _build_swin_moe(cfg, **kw):
    m = cfg.MODEL.SWIN_MOE
    base = SwinV1Config.from_cfg(cfg)
    import dataclasses
    base = dataclasses.replace(
        base, embed_dim=m.EMBED_DIM, depths=tuple(m.DEPTHS),
        num_heads=tuple(m.NUM_HEADS), window_size=m.WINDOW_SIZE,
        mlp_ratio=m.MLP_RATIO, qkv_bias=m.QKV_BIAS, qk_scale=m.QK_SCALE,
        ape=m.APE, patch_norm=m.PATCH_NORM)
    return SwinTransformerMoE(
        base, moe_blocks=tuple(tuple(b) for b in m.MOE_BLOCKS),
        num_experts=max(m.NUM_LOCAL_EXPERTS, 1), top_k=m.TOP_VALUE,
        capacity_factor=m.CAPACITY_FACTOR, gate_noise=m.GATE_NOISE,
        aux_weight=m.AUX_LOSS_WEIGHT, **kw)


@MODELS.register("swin_mlp")
def _build_swin_mlp(cfg, **kw):
    m = cfg.MODEL.SWIN_MLP
    base = SwinV1Config.from_cfg(cfg)
    import dataclasses
    base = dataclasses.replace(
        base, embed_dim=m.EMBED_DIM, depths=tuple(m.DEPTHS),
        num_heads=tuple(m.NUM_HEADS), window_size=m.WINDOW_SIZE,
        mlp_ratio=m.MLP_RATIO, ape=m.APE, patch_norm=m.PATCH_NORM)
    return SwinMLP(base, **kw)


def build_model(cfg, **kw):
    """Dispatch on MODEL.TYPE (reference accepts 'swin2' as an alias)."""
    mtype = cfg.MODEL.TYPE
    if mtype == "swin2":
        mtype = "swinv2"
    return MODELS.build(mtype, cfg, **kw)
