"""Tri-modal fusion model zoo (the paper's production model + ablations).

Production model ``MultiDefectNewGCN`` reproduces Multi_DefectModel_new_GCN
(reference: mvuld/models/GraphModel.py:81-211) over dense [B, N, ·] graph
tensors:

  image 1024 → BN → FC → 512 ─┐
  text   768 → BN → FC → 512 ─┼─ concat 1536 → BN → FC → 2 logits
  graph: node 768 → GAT(512×4h) ×2 → FC 2048→512 → 8×FC(512)
         → BN(node-axis) → FC 512→480 ⊕ bbox 4→32 → 512
         → 8× Rs-GCN → l2norm(nodes) → mean(padded nodes) ──┘

The 20+ ablation classes of the reference (GraphModel.py:214-1382,
new_model.py, MotivationModel.py) all share this skeleton with components
toggled; here they are ONE parameterized module (``MultiDefectAblation``)
exposed under registry keys selected by ``MODEL.MULTI.ARCH`` — replacing the
reference's edit-the-source ablation selection (main_bigvul.py:123-146).

Input convention (from mvuld_tpu.data.graph_batch):
  img_emb   [B, 1024]   frozen SwinV2 forward_features (or end-to-end)
  text_emb  [B, 768]    UniXcoder sentence embedding
  node_emb  [B, N, 768] UniXcoder per-line embeddings
  pos       [B, N, 4]   normalized OCR bboxes
  adj       [B, N, N]   boolean adjacency (gtype-filtered, self-loops)
  node_mask [B, N]      1.0 on valid nodes
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from mvuld_tpu.core.registry import FUSION_MODELS
from mvuld_tpu.models.graph_nets import (DenseGATConv, RsGCN, l2norm_nodes,
                                         mean_nodes, mean_over_max_nodes)


class ProjectBNFC(nn.Module):
    """BatchNorm → Dense → ELU projection used for every modality
    (reference: swinbn/swinfc, bn_text/fc_text, GraphModel.py:150-159)."""

    out: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.BatchNorm(use_running_average=not train, axis_name=self.axis_name,
                         name="bn")(x)
        x = nn.Dense(self.out, name="fc")(x)
        return nn.elu(x)


class GATStack(nn.Module):
    """Two stacked 4-head GATs + FC, flattening heads between layers
    (reference: GraphModel.py:167-172)."""

    hidden: int = 512
    heads: int = 4
    dropout: float = 0.2

    @nn.compact
    def __call__(self, h, adj, train: bool = False):
        B, N, _ = h.shape
        h = DenseGATConv(self.hidden, self.heads, feat_drop=self.dropout,
                         name="gat")(h, adj, deterministic=not train)
        h = h.reshape(B, N, self.heads * self.hidden)
        h = DenseGATConv(self.hidden, self.heads, feat_drop=self.dropout,
                         name="gat2")(h, adj, deterministic=not train)
        h = h.reshape(B, N, self.heads * self.hidden)
        h = nn.elu(nn.Dense(self.hidden, name="fc")(h))
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        return h


class HiddenStack(nn.Module):
    """8 shared FC(512→512)+ELU+dropout layers (reference: fch/hidden,
    GraphModel.py:113-117, applied at 175-177)."""

    hidden: int = 512
    depth: int = 8
    dropout: float = 0.2

    @nn.compact
    def __call__(self, h, train: bool = False):
        for i in range(self.depth):
            h = nn.elu(nn.Dense(self.hidden, name=f"fc_{i}")(h))
            h = nn.Dropout(self.dropout)(h, deterministic=not train)
        return h


class GraphBranch(nn.Module):
    """The graph-modality tower with ablation flags."""

    hidden: int = 512
    heads: int = 4
    use_gat: bool = True
    use_pos: bool = True
    use_rsgcn: bool = True
    num_rs_gcn: int = 8
    num_hidden: int = 8
    dropout: float = 0.2
    readout: str = "mean_padded"   # mean_padded | mean_valid

    @nn.compact
    def __call__(self, node_emb, pos, adj, node_mask, train: bool = False):
        if self.use_gat:
            h = GATStack(self.hidden, self.heads, self.dropout, name="gats")(
                node_emb, adj, train)
        else:
            h = nn.elu(nn.Dense(self.hidden, name="fconly")(node_emb))
            h = nn.Dropout(self.dropout)(h, deterministic=not train)
        h = HiddenStack(self.hidden, self.num_hidden, self.dropout,
                        name="hidden")(h, train)
        # zero padded nodes: in the reference padding happens AFTER the GAT on
        # the true-size graph (unbatch_features, GraphModel.py:30-54)
        h = h * node_mask[..., None]

        if self.use_pos:
            assert self.hidden > 32, (
                "GraphBranch reserves 32 dims for the bbox projection "
                "(fc_bbox 4→32, reference GraphModel.py:186-189); "
                f"hidden={self.hidden} must be > 32")
            # BatchNorm1d(max_node): statistics per NODE POSITION over
            # (batch, features) — the reference's quirky-but-load-bearing
            # bn_gat/bn_bbox (GraphModel.py:142-145, 186-189)
            hb = nn.BatchNorm(use_running_average=not train, axis=1,
                              name="bn_gat")(h)
            h_i = nn.elu(nn.Dense(self.hidden - 32, name="fc_gat")(hb))
            pb = nn.BatchNorm(use_running_average=not train, axis=1,
                              name="bn_bbox")(pos)
            pos_i = nn.elu(nn.Dense(32, name="fc_bbox")(pb))
            h = jnp.concatenate([h_i, pos_i], axis=-1)

        if self.use_rsgcn:
            for i in range(self.num_rs_gcn):
                h, _aff = RsGCN(self.hidden, self.hidden, name=f"rs_gcn_{i}")(
                    h, use_running_average=not train)
            h = l2norm_nodes(h)

        if self.readout == "mean_valid":
            out = mean_nodes(h, node_mask)
            out = nn.elu(nn.Dense(self.hidden, name="hfc")(
                nn.BatchNorm(use_running_average=not train, name="hbn")(out)))
            return out
        return mean_over_max_nodes(h)


class MultiDefectAblation(nn.Module):
    """Parameterized tri-modal classifier covering the whole ablation zoo."""

    num_classes: int = 2
    hidden: int = 512
    img_dim: int = 1024
    text_dim: int = 768
    use_image: bool = True
    use_text: bool = True
    use_graph: bool = True
    use_gat: bool = True
    use_pos: bool = True
    use_rsgcn: bool = True
    num_rs_gcn: int = 8
    num_hidden: int = 8
    dropout: float = 0.2
    readout: str = "mean_padded"
    fusion: str = "concat"          # concat | dot

    @nn.compact
    def __call__(self, img_emb=None, text_emb=None, node_emb=None, pos=None,
                 adj=None, node_mask=None, train: bool = False):
        feats = []
        if self.use_image:
            feats.append(ProjectBNFC(self.hidden, name="img_proj")(img_emb, train))
        if self.use_text:
            feats.append(ProjectBNFC(self.hidden, name="text_proj")(text_emb, train))
        if self.use_graph:
            g = GraphBranch(self.hidden, use_gat=self.use_gat,
                            use_pos=self.use_pos, use_rsgcn=self.use_rsgcn,
                            num_rs_gcn=self.num_rs_gcn, num_hidden=self.num_hidden,
                            dropout=self.dropout, readout=self.readout,
                            name="graph")(node_emb, pos, adj, node_mask, train)
            feats.append(g)
        if self.fusion == "dot" and len(feats) >= 2:
            # element-wise product fusion (reference: new_model.py
            # Multi_DefectModel_noGlobalImage text*graph dot fusion)
            fused = feats[0]
            for f in feats[1:]:
                fused = fused * f
        else:
            fused = jnp.concatenate(feats, axis=-1) if len(feats) > 1 else feats[0]
        fused = nn.BatchNorm(use_running_average=not train, name="final_bn")(fused)
        logits = nn.Dense(self.num_classes, name="final_fc")(fused)
        return logits.astype(jnp.float32)


def _make(key: str, **flags):
    @FUSION_MODELS.register(key)
    def _build(cfg=None, **overrides):
        kw = dict(flags)
        if cfg is not None:
            m = cfg.MODEL.MULTI
            kw.setdefault("hidden", m.HIDDEN)
            kw.setdefault("img_dim", m.IMG_DIM)
            kw.setdefault("text_dim", m.TEXT_DIM)
            kw.setdefault("num_rs_gcn", m.NUM_RS_GCN)
            kw.setdefault("num_hidden", m.NUM_HIDDEN_FC)
            kw["num_classes"] = cfg.MODEL.NUM_CLASSES
        kw.update(overrides)
        return MultiDefectAblation(**kw)
    _build.__name__ = f"build_{key}"
    return _build


# the paper's production model (Multi_DefectModel_new_GCN, GraphModel.py:81)
_make("multi_defect_new_gcn")
# mean-over-valid-nodes GAT model, no Rs-GCN/bbox (Multi_DefectModel, :214)
_make("multi_defect", use_pos=False, use_rsgcn=False, readout="mean_valid",
      dropout=0.1)
# image+text only (Multi_DefectModel_noGraph, :306)
_make("multi_defect_nograph", use_graph=False)
# {GAT, POS, RsGCN} toggle family (:362-1382); key bits = gat/pos/rsgcn
_make("multi_defect_000", use_gat=False, use_pos=False, use_rsgcn=False)
_make("multi_defect_001", use_gat=False, use_pos=False, use_rsgcn=True)
_make("multi_defect_100", use_gat=True, use_pos=False, use_rsgcn=False)
_make("multi_defect_110", use_gat=True, use_pos=True, use_rsgcn=False)
_make("multi_defect_011", use_gat=False, use_pos=True, use_rsgcn=True)
_make("multi_defect_gatpos", use_gat=True, use_pos=True, use_rsgcn=False)
_make("multi_defect_nogat", use_gat=False, use_pos=True, use_rsgcn=True)
# modality-dropping variants (new_model.py:81-201, 202+)
_make("multi_defect_noglobalimage", use_image=False, fusion="dot")
_make("multi_defect_nofunc", use_text=False)
# single-modality motivation models (MotivationModel.py:83-425)
_make("motivation_image", use_text=False, use_graph=False)
_make("motivation_functext", use_image=False, use_graph=False)
_make("motivation_graph", use_image=False, use_text=False)
_make("motivation_graph_mean", use_image=False, use_text=False,
      use_pos=False, use_rsgcn=False, readout="mean_valid")


def build_fusion_model(cfg, arch: Optional[str] = None, **overrides):
    """Build the fusion architecture selected by MODEL.MULTI.ARCH."""
    return FUSION_MODELS.build(arch or cfg.MODEL.MULTI.ARCH, cfg, **overrides)
