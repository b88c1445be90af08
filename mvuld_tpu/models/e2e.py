"""End-to-end trainable tri-modal model — all encoders in ONE XLA graph.

The reference stages its pipeline through disk caches and trains only the
fusion head over frozen embeddings (SURVEY §1: "the tri-modal pipeline is
staged through on-disk caches, not an end-to-end graph"). On TPU there is no
reason for that split: this module traces UniXcoder (function + per-line),
SwinV2 (rendered image), and the fusion head into a single jitted training
step, so gradients reach every encoder. The staged mode remains available
(train_fusion.py) — this is the idiomatic upgrade, not a replacement.

Inputs:
  func_ids  [B, T]        whole-function token ids
  node_ids  [B, N, Tn]    per-line token ids
  image     [B, S, S, 3]  rendered graph (normalized)
  pos       [B, N, 4], adj [B, N, N] bool, node_mask [B, N]
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from mvuld_tpu.models.fusion_zoo import MultiDefectAblation
from mvuld_tpu.models.roberta import RobertaConfig, RobertaEncoder, masked_mean
from mvuld_tpu.models.swin_v2 import SwinTransformerV2, SwinV2Config


class EndToEndMVulD(nn.Module):
    """``node_capacity``: static packed-batch size for the per-line encoder.
    Real functions fill far fewer than MAX_NODES=100 line slots, and the
    reference only ever encodes real lines (mvuld/data/data_list.py:292-299);
    encoding every pad slot would waste most of the text-encoder FLOPs.
    Valid lines (node_mask > 0) are gathered — original order preserved —
    into a [node_capacity, Tn] batch, encoded once, and scattered back to
    [B, N, H]. Lines beyond capacity get a zero embedding (masked overflow —
    size the capacity from the corpus node-count distribution). ``None``
    disables packing (every slot encoded — the parity reference path)."""

    text_config: RobertaConfig
    swin_config: SwinV2Config
    hidden: int = 512
    num_classes: int = 2
    num_rs_gcn: int = 8
    num_hidden: int = 8
    use_pallas: bool = False
    scan_blocks: bool = False
    remat: bool = False
    # remat granularity (the dedicated swin bench measured stage-2-only remat
    # faster than all-stage at bs64 — the early stages' recompute runs at
    # 16-26% MXU util): None = remat every swin stage when ``remat``;
    # ``text_remat`` None = follow ``remat`` for the RoBERTa layers — at e2e
    # batch sizes the text activations often fit, and skipping the bwd
    # re-forward of the attention half is pure step-time win
    swin_remat_stages: tuple[int, ...] | None = None
    text_remat: bool | None = None
    node_capacity: int | None = None
    # fused Pallas MLP+LN for the swin stages (ops/fused_dense.py mlp_ln;
    # the RoBERTa side's fused MLP rides text_config.use_pallas_mlp) and
    # window-resident block pairs — the same two levers that took the
    # dedicated swin bench from 73.6 to 75.66 img/s
    use_pallas_mlp: bool = False
    window_resident: bool = False

    @nn.compact
    def __call__(self, func_ids, node_ids, image, pos, adj, node_mask,
                 train: bool = False):
        tc = self.text_config
        tremat = self.remat if self.text_remat is None else self.text_remat
        encoder = RobertaEncoder(tc, remat=tremat, name="text_encoder")

        # whole-function sentence embedding
        fmask = (func_ids != tc.pad_token_id).astype(jnp.int32)
        ftok = encoder(func_ids, fmask, deterministic=not train)
        text_emb = masked_mean(ftok, fmask)                      # [B, H]

        # per-line node embeddings through the SAME encoder
        B, N, Tn = node_ids.shape
        flat = node_ids.reshape(B * N, Tn)
        valid = node_mask.reshape(B * N) > 0
        if self.node_capacity is not None and self.node_capacity < B * N:
            P = self.node_capacity
            # stable sort brings valid lines to the front in original order
            order = jnp.argsort(jnp.logical_not(valid))
            sel = order[:P]
            took = valid[sel].astype(jnp.float32)
            packed = flat[sel]                                   # [P, Tn]
            pmask = (packed != tc.pad_token_id).astype(jnp.int32)
            ptok = encoder(packed, pmask, deterministic=not train)
            pemb = masked_mean(ptok, pmask) * took[..., None]
            node_flat = jnp.zeros((B * N, pemb.shape[-1]), pemb.dtype)
            node_flat = node_flat.at[sel].set(pemb)
            node_emb = node_flat.reshape(B, N, -1)
        else:
            nmask = (flat != tc.pad_token_id).astype(jnp.int32)
            ntok = encoder(flat, nmask, deterministic=not train)
            node_emb = masked_mean(ntok, nmask).reshape(B, N, -1)
        node_emb = node_emb * node_mask[..., None]               # [B, N, H]

        # image embedding
        img_emb = SwinTransformerV2(
            self.swin_config, use_checkpoint=self.remat,
            scan_blocks=self.scan_blocks, use_pallas=self.use_pallas,
            use_pallas_mlp=self.use_pallas_mlp,
            window_resident=self.window_resident,
            remat_stages=self.swin_remat_stages,
            name="swin")(image, deterministic=not train, return_features=True)

        fusion = MultiDefectAblation(
            num_classes=self.num_classes, hidden=self.hidden,
            img_dim=self.swin_config.num_features, text_dim=tc.hidden_size,
            num_rs_gcn=self.num_rs_gcn, num_hidden=self.num_hidden,
            name="fusion")
        return fusion(img_emb=img_emb, text_emb=text_emb, node_emb=node_emb,
                      pos=pos, adj=adj, node_mask=node_mask, train=train)
