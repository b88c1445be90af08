"""EAST text detector in Flax — the OCR subsystem's model + loss.

Re-implementation of the reference's EAST (reference: OCR/model.py:8-177):
a half-channel VGG16-BN feature extractor (cfg [32,32,M,64,64,M,128,128,128,M,
256,256,256,M,256,256,256,M]), a U-Net-style merge decoder over the /32,/16,
/8,/4 feature maps, and a head producing a sigmoid score map (1ch) plus a geo
map (4 sigmoid·scope distances + (sigmoid-0.5)·π angle) at 1/4 input scale.

Loss (reference: OCR/loss.py:5-47): dice on the score map (with ignored
regions), per-pixel IoU of axis-distances, cosine angle loss ×10.

TPU notes: NHWC layout, BatchNorm via flax with running averages, bilinear
2× upsampling via jax.image.resize (the torch original uses
align_corners=True; at 2× on ≥32-px feature maps the boundary difference is
sub-pixel and the detector is trained with this resize, so it is consistent).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

VGG_CFG: Sequence = (32, 32, "M", 64, 64, "M", 128, 128, 128, "M",
                     256, 256, 256, "M", 256, 256, 256, "M")


class VGGExtractor(nn.Module):
    """Half-channel VGG16-BN; returns the post-pool features at /4, /8, /16,
    /32 (reference: extractor takes features after pools 2..5)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        feats = []
        conv_i = 0
        pool_i = 0
        for v in VGG_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                pool_i += 1
                if pool_i >= 2:          # pools 2..5 → /4../32
                    feats.append(x)
            else:
                x = nn.Conv(v, (3, 3), padding=1, dtype=self.dtype,
                            name=f"conv_{conv_i}")(x)
                x = nn.BatchNorm(use_running_average=not train,
                                 dtype=self.dtype, name=f"bn_{conv_i}")(x)
                x = nn.relu(x)
                conv_i += 1
        return feats                      # [/4, /8, /16, /32]


def _upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, 2 * H, 2 * W, C), method="bilinear")


class MergeDecoder(nn.Module):
    """U-Net merge (reference: OCR/model.py:80-136): upsample, concat skip,
    1×1 then 3×3 conv-bn-relu, ×3; final 3×3."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        f4, f8, f16, f32 = feats

        def cbr(x, ch, k, name):
            x = nn.Conv(ch, (k, k), padding=k // 2, dtype=self.dtype,
                        name=f"conv_{name}")(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                             name=f"bn_{name}")(x)
            return nn.relu(x)

        y = _upsample2x(f32)
        y = jnp.concatenate([y, f16], axis=-1)
        y = cbr(y, 128, 1, "1")
        y = cbr(y, 128, 3, "2")
        y = _upsample2x(y)
        y = jnp.concatenate([y, f8], axis=-1)
        y = cbr(y, 64, 1, "3")
        y = cbr(y, 64, 3, "4")
        y = _upsample2x(y)
        y = jnp.concatenate([y, f4], axis=-1)
        y = cbr(y, 32, 1, "5")
        y = cbr(y, 32, 3, "6")
        y = cbr(y, 32, 3, "7")
        return y


class EAST(nn.Module):
    """Full detector; returns (score [B,H/4,W/4,1], geo [B,H/4,W/4,5])."""

    geo_scope: float = 512.0   # max distance in px ("scope", reference output head)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        feats = VGGExtractor(dtype=self.dtype, name="extractor")(x, train)
        y = MergeDecoder(dtype=self.dtype, name="merge")(feats, train)
        score = jax.nn.sigmoid(nn.Conv(1, (1, 1), name="score_head")(y))
        loc = jax.nn.sigmoid(nn.Conv(4, (1, 1), name="loc_head")(y)) * self.geo_scope
        angle = (jax.nn.sigmoid(nn.Conv(1, (1, 1), name="angle_head")(y)) - 0.5) * jnp.pi
        geo = jnp.concatenate([loc, angle], axis=-1)
        return score.astype(jnp.float32), geo.astype(jnp.float32)


def dice_loss(gt_score: jnp.ndarray, pred_score: jnp.ndarray) -> jnp.ndarray:
    inter = jnp.sum(gt_score * pred_score)
    union = jnp.sum(gt_score) + jnp.sum(pred_score) + 1e-5
    return 1.0 - 2.0 * inter / union


def east_loss(gt_score: jnp.ndarray, pred_score: jnp.ndarray,
              gt_geo: jnp.ndarray, pred_geo: jnp.ndarray,
              ignored_map: jnp.ndarray, weight_angle: float = 10.0
              ) -> jnp.ndarray:
    """Reference: OCR/loss.py Loss.forward:34-47 (channel-last layout)."""
    n_pos = jnp.sum(gt_score)
    classify = dice_loss(gt_score, pred_score * (1.0 - ignored_map))
    d1g, d2g, d3g, d4g, ag = jnp.split(gt_geo, 5, axis=-1)
    d1p, d2p, d3p, d4p, ap = jnp.split(pred_geo, 5, axis=-1)
    area_gt = (d1g + d2g) * (d3g + d4g)
    area_pred = (d1p + d2p) * (d3p + d4p)
    w_union = jnp.minimum(d3g, d3p) + jnp.minimum(d4g, d4p)
    h_union = jnp.minimum(d1g, d1p) + jnp.minimum(d2g, d2p)
    area_inter = w_union * h_union
    area_union = area_gt + area_pred - area_inter
    iou_map = -jnp.log((area_inter + 1.0) / (area_union + 1.0))
    angle_map = 1.0 - jnp.cos(ap - ag)
    denom = jnp.maximum(n_pos, 1.0)
    angle_loss = jnp.sum(angle_map * gt_score) / denom
    iou_loss = jnp.sum(iou_map * gt_score) / denom
    total = weight_angle * angle_loss + iou_loss + classify
    # no-target images contribute zero (reference: loss.py:36-38)
    return jnp.where(n_pos < 1.0, 0.0, total)
