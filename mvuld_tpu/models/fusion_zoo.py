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
import jax
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
    """The graph-modality tower, parameterized to reproduce every reference
    variant's structure (GraphModel.py / new_model.py / MotivationModel.py /
    myModels.py). The axes of variation:

    ``node_net``   — per-node network before padding:
        "gat"  two stacked GATs + FC (+ hidden stack)        (new_GCN:167-177)
        "mlp"  fconly 768→512 (+ optional hidden stack)      (_NOGAT2:1345-1350)
        "none" raw node embeddings pass through              (_NOGAT:1014-1023)
    ``node_input`` — "node" (=_UNIX_NODE_EMB) or "all" (=_ALL_NODE_EMB:
        node emb ⊕ 32-d node-type one-hot, myModels.py:101)
    ``pos_mode``   — where the bbox features enter:
        "post"       bn+fc post-padding concat 480⊕32        (new_GCN:186-189)
        "pre_gat"    fc 768→720 ⊕ fc 4→48 before the GAT     (_GATPOS:790-792)
        "pre_hidden" fconly 768→480 ⊕ fc 4→32 before hidden  (_NOGAT4:1241-1243)
        "deep"       fc 4→128 + 8×FC(128) stack, post fc 128→32 (_NOGAT3)
        "none"
    ``post_proj``  — padded [B,N,·] projection before Rs-GCN/readout:
        "split"   elu(fc_gat(bn_gat)) ⊕ elu(fc_bbox(bn_bbox)) (new_GCN)
        "full"    elu(fc_gat(bn_gat)) hidden→hidden           (_001:510)
        "bn_only" elu(bn_gat) — no projection                 (_011:928)
        "hfc"     elu(hfc(bn_gat))                            (_GATPOS:815)
        "none"
    ``readout``    —
        "mean_padded"      mean over the padded node axis     (new_GCN:204)
        "mean_valid"       dgl.mean_nodes + elu(hfc(hbn))     (_000:423-426)
        "mean_padded_hfc"  padded mean + elu(hfc(hbn))        (_allnode:131-132)
        "gru"              GRU over padded nodes, last state + elu(hfc(hbn))
                                                              (_grudot:250-252)
    """

    hidden: int = 512
    heads: int = 4
    node_net: str = "gat"          # gat | mlp | none
    node_input: str = "node"       # node | all
    num_hidden: int = 8
    pos_mode: str = "post"         # none | post | pre_gat | pre_hidden | deep
    post_proj: str = "split"       # split | full | bn_only | hfc | none
    use_rsgcn: bool = True
    num_rs_gcn: int = 8
    dropout: float = 0.2
    readout: str = "mean_padded"

    @nn.compact
    def __call__(self, node_emb, pos, adj, node_mask, ntype=None,
                 train: bool = False):
        def drop(x):
            return nn.Dropout(self.dropout)(x, deterministic=not train)

        def bn_nodeaxis(x, name):
            # torch BatchNorm1d(max_node) on [B, N, C]: statistics per NODE
            # POSITION over (batch, features) — the reference's quirky-but-
            # load-bearing bn_gat/bn_bbox (GraphModel.py:142-145, 186-189)
            return nn.BatchNorm(use_running_average=not train, axis=1,
                                name=name)(x)

        h = node_emb
        if self.node_input == "all":
            # _ALL_NODE_EMB: per-line embedding ⊕ 32-d node-type one-hot
            h = jnp.concatenate(
                [h, jax.nn.one_hot(ntype, 32, dtype=h.dtype)], axis=-1)

        if self.pos_mode == "pre_gat":
            # _GATPOS: project node emb to D-48 ⊕ bbox to 48 BEFORE the GAT
            hi = nn.elu(nn.Dense(h.shape[-1] - 48, name="fc_gat_pre")(h))
            pi = nn.elu(nn.Dense(48, name="fc_bbox_pre")(pos))
            h = jnp.concatenate([hi, pi], axis=-1)

        if self.node_net == "gat":
            h = GATStack(self.hidden, self.heads, self.dropout, name="gats")(
                h, adj, train)
        elif self.node_net == "mlp":
            out_dim = (self.hidden - 32 if self.pos_mode == "pre_hidden"
                       else self.hidden)
            h = drop(nn.elu(nn.Dense(out_dim, name="fconly")(h)))
        # node_net == "none": raw features pass straight to the post stage

        if self.pos_mode == "pre_hidden":
            # _NOGAT4: fconly 768→480 ⊕ fc_bbox 4→32 → hidden stack on 512
            pi = nn.elu(nn.Dense(32, name="fc_bbox_pre")(pos))
            h = jnp.concatenate([h, pi], axis=-1)

        deep_pos = None
        if self.pos_mode == "deep":
            # _NOGAT3: bbox 4→128 then its own 8-layer hidden stack
            deep_pos = nn.elu(nn.Dense(128, name="fc_bbox")(pos))

        if self.num_hidden > 0 and self.node_net != "none":
            h = HiddenStack(self.hidden, self.num_hidden, self.dropout,
                            name="hidden")(h, train)
            if deep_pos is not None:
                dp = deep_pos
                for i in range(self.num_hidden):
                    dp = drop(nn.elu(nn.Dense(128, name=f"pos_hidden_{i}")(dp)))
                deep_pos = dp
        # zero padded nodes: in the reference padding happens AFTER the
        # per-node nets on the true-size graph (unbatch_features,
        # GraphModel.py:30-54) — masking here is equivalent
        h = h * node_mask[..., None]
        if deep_pos is not None:
            deep_pos = deep_pos * node_mask[..., None]

        if self.readout == "mean_valid":
            # dgl.mean_nodes over VALID nodes, then elu(hfc(hbn)) (_000)
            out = mean_nodes(h, node_mask)
            out = nn.elu(nn.Dense(self.hidden, name="hfc")(
                nn.BatchNorm(use_running_average=not train, name="hbn")(out)))
            return out

        if self.post_proj == "split":
            assert self.hidden > 32, (
                "post_proj='split' reserves 32 dims for the bbox projection "
                "(fc_bbox →32, reference GraphModel.py:186-189); "
                f"hidden={self.hidden} must be > 32")
            h_i = nn.elu(nn.Dense(self.hidden - 32, name="fc_gat")(
                bn_nodeaxis(h, "bn_gat")))
            pos_src = deep_pos if deep_pos is not None else pos
            pos_name = "fc_bbox2" if deep_pos is not None else "fc_bbox"
            pos_i = nn.elu(nn.Dense(32, name=pos_name)(
                bn_nodeaxis(pos_src, "bn_bbox")))
            h = jnp.concatenate([h_i, pos_i], axis=-1)
        elif self.post_proj == "full":
            h = nn.elu(nn.Dense(self.hidden, name="fc_gat")(
                bn_nodeaxis(h, "bn_gat")))
        elif self.post_proj == "bn_only":
            h = nn.elu(bn_nodeaxis(h, "bn_gat"))
        elif self.post_proj == "hfc":
            h = nn.elu(nn.Dense(self.hidden, name="hfc")(
                bn_nodeaxis(h, "bn_gat")))

        if self.use_rsgcn:
            for i in range(self.num_rs_gcn):
                h, _aff = RsGCN(self.hidden, self.hidden, name=f"rs_gcn_{i}")(
                    h, use_running_average=not train)
            h = l2norm_nodes(h)

        if self.readout == "gru":
            # torch nn.GRU over the PADDED node sequence, final hidden state
            # (zero-pad tail included — quirk preserved, myModels.py:250-251),
            # then elu(hfc(hbn))
            cell = nn.GRUCell(features=self.hidden, name="gru")
            state = jnp.zeros((h.shape[0], self.hidden), h.dtype)
            for t in range(h.shape[1]):
                state, _ = cell(state, h[:, t])
            out = nn.elu(nn.Dense(self.hidden, name="hfc")(
                nn.BatchNorm(use_running_average=not train, name="hbn")(state)))
            return out

        out = mean_over_max_nodes(h)
        if self.readout == "mean_padded_hfc":
            out = nn.elu(nn.Dense(self.hidden, name="hfc")(
                nn.BatchNorm(use_running_average=not train, name="hbn")(out)))
        return out


class MultiDefectAblation(nn.Module):
    """Parameterized tri-modal classifier covering the whole ablation zoo
    (26 reference classes across GraphModel.py / new_model.py /
    MotivationModel.py / myModels.py — see the registry below)."""

    num_classes: int = 2
    hidden: int = 512
    img_dim: int = 1024
    text_dim: int = 768
    use_image: bool = True
    use_text: bool = True
    use_graph: bool = True
    # graph-branch spec (see GraphBranch)
    node_net: str = "gat"
    node_input: str = "node"
    pos_mode: str = "post"
    post_proj: str = "split"
    use_rsgcn: bool = True
    num_rs_gcn: int = 8
    num_hidden: int = 8
    dropout: float = 0.2
    readout: str = "mean_padded"
    # fusion head
    fusion: str = "concat"          # concat | dot | dot_image_graph
    final_bn: bool = True           # _Graph/_Graph1/_Graph2 skip final_fc_bn
    project_modalities: bool = True # Motivation _Image/_FuncText classify RAW
    final_dropout: float = 0.0      # _grudot: F.dropout(final_fc(...), 0.3)

    @nn.compact
    def __call__(self, img_emb=None, text_emb=None, node_emb=None, pos=None,
                 adj=None, node_mask=None, ntype=None, train: bool = False):
        # feature order matches the reference concat:
        # torch.cat((x, h_feature, func_text_embedding)) = image, GRAPH, text
        # (GraphModel.py:207) — converted final_fc weights depend on it
        feats = []
        if self.use_image:
            feats.append(img_emb if not self.project_modalities else
                         ProjectBNFC(self.hidden, name="img_proj")(img_emb, train))
        if self.use_graph:
            g = GraphBranch(self.hidden, node_net=self.node_net,
                            node_input=self.node_input, pos_mode=self.pos_mode,
                            post_proj=self.post_proj, use_rsgcn=self.use_rsgcn,
                            num_rs_gcn=self.num_rs_gcn, num_hidden=self.num_hidden,
                            dropout=self.dropout, readout=self.readout,
                            name="graph")(node_emb, pos, adj, node_mask,
                                          ntype=ntype, train=train)
            feats.append(g)
        if self.use_text:
            feats.append(text_emb if not self.project_modalities else
                         ProjectBNFC(self.hidden, name="text_proj")(text_emb, train))
        if self.fusion == "dot_image_graph" and len(feats) == 3:
            # _grudot: image*graph element-wise, then concat text
            # (myModels.py:254-255)
            fused = jnp.concatenate([feats[0] * feats[1], feats[2]], axis=-1)
        elif self.fusion == "attention_image_graph" and len(feats) == 3:
            # myModels.Multi_DefectModel fusion='attention' (:407-416):
            # softmax(tanh(img*graph)) gates the graph feature, concat text
            a = jax.nn.softmax(jnp.tanh(feats[0] * feats[1]), axis=1)
            fused = jnp.concatenate([a * feats[1], feats[2]], axis=-1)
        elif self.fusion == "dot" and len(feats) >= 2:
            # element-wise product fusion (reference: new_model.py
            # Multi_DefectModel_noGlobalImage text*graph dot fusion :198)
            fused = feats[0]
            for f in feats[1:]:
                fused = fused * f
        else:
            fused = jnp.concatenate(feats, axis=-1) if len(feats) > 1 else feats[0]
        if self.final_bn:
            fused = nn.BatchNorm(use_running_average=not train,
                                 name="final_bn")(fused)
        logits = nn.Dense(self.num_classes, name="final_fc")(fused)
        if self.final_dropout > 0:
            logits = nn.Dropout(self.final_dropout)(
                logits, deterministic=not train)
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


# ---- GraphModel.py ----------------------------------------------------
# the paper's production model (Multi_DefectModel_new_GCN, GraphModel.py:81)
_make("multi_defect_new_gcn")
# mean-over-valid-nodes GAT model, no Rs-GCN/bbox (Multi_DefectModel, :214)
_make("multi_defect", pos_mode="none", post_proj="none", use_rsgcn=False,
      readout="mean_valid", dropout=0.1)
# image+text only (Multi_DefectModel_noGraph, :306)
_make("multi_defect_nograph", use_graph=False)
# _000 (:362): fconly only (hidden stack commented out), valid-mean readout
_make("multi_defect_000", node_net="mlp", num_hidden=0, pos_mode="none",
      post_proj="none", use_rsgcn=False, readout="mean_valid")
# _001 (:433): fconly only, full 512→512 post projection, Rs-GCN
_make("multi_defect_001", node_net="mlp", num_hidden=0, pos_mode="none",
      post_proj="full", use_rsgcn=True)
# _100 (:534): fconly only, post split proj + bbox, NO Rs-GCN
_make("multi_defect_100", node_net="mlp", num_hidden=0, pos_mode="post",
      post_proj="split", use_rsgcn=False)
# _110 (:618): GAT + hidden + post bbox concat, NO Rs-GCN (dropouts 0.1)
_make("multi_defect_110", pos_mode="post", post_proj="split",
      use_rsgcn=False, dropout=0.1)
# _GATPOS (:721): bbox enters BEFORE the GAT (768→720 ⊕ 4→48), hfc readout
_make("multi_defect_gatpos", pos_mode="pre_gat", post_proj="hfc",
      use_rsgcn=False, dropout=0.1)
# _011 (:830): GAT + hidden, elu(bn_gat) (no projection), Rs-GCN, no bbox
_make("multi_defect_011", pos_mode="none", post_proj="bn_only",
      use_rsgcn=True)
# _NOGAT (:950): RAW node embeddings → post split proj (768→480 ⊕ 4→32)
_make("multi_defect_nogat", node_net="none", num_hidden=0, pos_mode="post",
      post_proj="split", use_rsgcn=True)
# _NOGAT2 (:1277): fconly + hidden → post split proj → Rs-GCN
_make("multi_defect_nogat2", node_net="mlp", pos_mode="post",
      post_proj="split", use_rsgcn=True)
# _NOGAT3 (:1053): bbox gets its own 4→128 + 8×FC(128) stack, post 128→32
_make("multi_defect_nogat3", node_net="mlp", pos_mode="deep",
      post_proj="split", use_rsgcn=True)
# _NOGAT4 (:1173): fconly 768→480 ⊕ bbox 4→32 BEFORE hidden, full post proj
_make("multi_defect_nogat4", node_net="mlp", pos_mode="pre_hidden",
      post_proj="full", use_rsgcn=True)
# ---- new_model.py -------------------------------------------------------
# text*graph dot fusion, image dropped (:81-201)
_make("multi_defect_noglobalimage", use_image=False, fusion="dot")
# image+graph concat, text dropped (:202-326)
_make("multi_defect_nofunc", use_text=False)
# ---- myModels.py --------------------------------------------------------
# _allnode (:38): GAT over _ALL_NODE_EMB (node emb ⊕ ntype one-hot),
# padded-mean + elu(hfc(hbn)) readout, no bbox/Rs-GCN
_make("multi_defect_allnode", node_input="all", pos_mode="none",
      post_proj="none", use_rsgcn=False, readout="mean_padded_hfc")
# _grudot (:158): GAT + hidden → GRU over padded nodes → image*graph dot,
# concat text, final dropout 0.3
_make("multi_defect_grudot", pos_mode="none", post_proj="none",
      use_rsgcn=False, readout="gru", fusion="dot_image_graph",
      final_dropout=0.3)
# myModels.Multi_DefectModel (:280): GRU projection, ships with
# projection='gru' + fusion='attention' (:322-323, :407-416)
_make("multi_defect_gruproj", pos_mode="none", post_proj="none",
      use_rsgcn=False, readout="gru", fusion="attention_image_graph")
# ---- MotivationModel.py -------------------------------------------------
# single-modality motivation models (:83-425); _Image/_FuncText classify
# the RAW embedding (the BN lines are commented out, :105-106, :144-145)
_make("motivation_image", use_text=False, use_graph=False,
      project_modalities=False, final_bn=False)
_make("motivation_functext", use_image=False, use_graph=False,
      project_modalities=False, final_bn=False)
# _Graph (:148): the full graph tower alone, final_fc WITHOUT final_bn
_make("motivation_graph", use_image=False, use_text=False, final_bn=False)
# _Graph1 (:259, "only-GCN"): fconly + hidden, full post proj, Rs-GCN
_make("motivation_graph1", use_image=False, use_text=False, node_net="mlp",
      pos_mode="none", post_proj="full", use_rsgcn=True, final_bn=False)
# _Graph2 (:351): GAT + hidden, valid-mean + elu(hfc(hbn)), dropout 0.1
_make("motivation_graph_mean", use_image=False, use_text=False,
      pos_mode="none", post_proj="none", use_rsgcn=False,
      readout="mean_valid", dropout=0.1, final_bn=False)


def build_fusion_model(cfg, arch: Optional[str] = None, **overrides):
    """Build the fusion architecture selected by MODEL.MULTI.ARCH."""
    return FUSION_MODELS.build(arch or cfg.MODEL.MULTI.ARCH, cfg, **overrides)
