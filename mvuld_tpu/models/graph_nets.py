"""Dense masked graph layers for TPU: GAT, Rs-GCN, GGNN, readouts.

The reference runs DGL sparse message passing (GATConv over dgl.batch'ed
graphs, reference: mvuld/models/GraphModel.py:167-170; GatedGraphConv in the
Devign baseline). At the reference's own scale (graphs padded/truncated to
max_node=100, GraphModel.py:134) dense masked attention over a [B, N, N]
adjacency is strictly faster on TPU — every op is an MXU matmul, no
gather/scatter. These layers reproduce DGL's math exactly on the valid
submatrix:

  * ``DenseGATConv``  ≡ dgl.nn.GATConv (LeakyReLU(0.2) additive attention,
    softmax over in-neighbors, per-head out = Σ α · (W h_src), bias),
  * ``RsGCN``         ≡ mvuld/models/Rs_GCN.py:7-73 (1×1-conv non-local block,
    affinity R = θᵀφ / N, residual W(R·g)+v with zero-init BN),
  * ``DenseGGNN``     ≡ dgl GatedGraphConv (per-etype linear messages + GRU),
  * ``l2norm_nodes`` / ``mean_nodes`` readouts with the reference's exact
    (quirky) axis conventions.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG_INF = -1e9


class DenseGATConv(nn.Module):
    """Graph attention over a dense boolean adjacency.

    adj[b, i, j] = True means an edge i → j; attention for destination j is
    normalized over its in-neighbors i (dgl.nn.GATConv convention). Output
    shape [B, N, num_heads, out_feats].
    """

    out_feats: int
    num_heads: int = 4
    feat_drop: float = 0.2
    negative_slope: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray, adj: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        B, N, _ = h.shape
        h = nn.Dropout(self.feat_drop)(h, deterministic=deterministic)
        z = nn.Dense(self.out_feats * self.num_heads, use_bias=False,
                     dtype=self.dtype, name="fc")(h)
        z = z.reshape(B, N, self.num_heads, self.out_feats)
        attn_l = self.param("attn_l", nn.initializers.xavier_normal(),
                            (self.num_heads, self.out_feats))
        attn_r = self.param("attn_r", nn.initializers.xavier_normal(),
                            (self.num_heads, self.out_feats))
        el = jnp.einsum("bnhd,hd->bnh", z, attn_l)   # source term
        er = jnp.einsum("bnhd,hd->bnh", z, attn_r)   # destination term
        # scores[b, h, i, j] for edge i → j
        scores = el.transpose(0, 2, 1)[:, :, :, None] + er.transpose(0, 2, 1)[:, :, None, :]
        scores = nn.leaky_relu(scores, negative_slope=self.negative_slope)
        mask = adj.astype(bool)[:, None, :, :]        # [B, 1, N, N]
        scores = jnp.where(mask, scores, NEG_INF)
        alpha = jax.nn.softmax(scores, axis=2)        # over in-neighbors i
        alpha = jnp.where(mask, alpha, 0.0)           # rows with no edges → 0
        out = jnp.einsum("bhij,bihd->bjhd", alpha, z)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.num_heads, self.out_feats))
        return out + bias


class RsGCN(nn.Module):
    """Non-local relational reasoning block (reference: Rs_GCN.py:7-73).

    Input/output layout is [B, N, C] (we keep channels last — TPU-friendly —
    whereas the torch original permutes to [B, C, N] for Conv1d; a 1×1 Conv1d
    over [B, C, N] is exactly a Dense over the channel axis of [B, N, C]).
    Returns (v_star, affinity).
    """

    channels: int
    inter_channels: Optional[int] = None
    use_bn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, v: jnp.ndarray, use_running_average: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        C = self.channels
        Ci = self.inter_channels or max(C // 2, 1)
        B, N, _ = v.shape
        g_v = nn.Dense(Ci, dtype=self.dtype, name="g")(v)          # [B,N,Ci]
        theta = nn.Dense(Ci, dtype=self.dtype, name="theta")(v)    # [B,N,Ci]
        phi = nn.Dense(Ci, dtype=self.dtype, name="phi")(v)        # [B,N,Ci]
        # affinity over node pairs, divided by node count (Rs_GCN.py:66-68)
        R = jnp.einsum("bic,bjc->bij", theta, phi) / N
        y = jnp.einsum("bij,bjc->bic", R, g_v)                     # [B,N,Ci]
        w_y = nn.Dense(C, dtype=self.dtype, name="W")(y)
        if self.use_bn:
            # torch BatchNorm1d over channels of [B, C, N]: statistics over
            # (batch, nodes) per channel; scale zero-init → identity residual
            # at initialization (Rs_GCN.py:31-34)
            w_y = nn.BatchNorm(use_running_average=use_running_average,
                               axis=-1, scale_init=nn.initializers.zeros,
                               dtype=self.dtype, name="bn")(w_y)
        return w_y + v, R


class DenseGGNN(nn.Module):
    """Gated graph conv over per-etype dense adjacency (Devign baseline's
    GGNN, dgl GatedGraphConv semantics: per-etype linear message, sum over
    in-edges, GRU state update, n_steps iterations)."""

    out_feats: int
    n_steps: int = 6
    n_etypes: int = 6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray, adj_etype: jnp.ndarray,
                 node_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """h: [B, N, F_in] (F_in ≤ out_feats, zero-padded up); adj_etype:
        [B, R, N, N] float (src i → dst j)."""
        B, N, F = h.shape
        D = self.out_feats
        if F > D:
            raise ValueError(
                f"GGNN requires in_feats ({F}) <= out_feats ({D}) — same "
                "constraint as dgl.nn.GatedGraphConv")
        if F < D:
            h = jnp.pad(h, ((0, 0), (0, 0), (0, D - F)))
        msg_w = self.param("etype_w", nn.initializers.xavier_uniform(),
                           (self.n_etypes, D, D))
        gru = nn.GRUCell(features=D, dtype=self.dtype, name="gru")
        for _ in range(self.n_steps):
            m = jnp.einsum("bnd,rde->brne", h, msg_w)      # per-etype messages
            agg = jnp.einsum("brij,brid->bjd", adj_etype, m)
            flat_h = h.reshape(B * N, D)
            flat_a = agg.reshape(B * N, D)
            new_h, _ = gru(flat_h, flat_a)
            h = new_h.reshape(B, N, D)
        if node_mask is not None:
            h = h * node_mask[..., None]
        return h


def l2norm_nodes(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize over the NODE axis (dim=1) — the reference's l2norm
    (GraphModel.py:76-80) normalizes dim 1 of [B, N, D]."""
    norm = jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True) + eps)
    return x / norm


def mean_nodes(h: jnp.ndarray, node_mask: jnp.ndarray) -> jnp.ndarray:
    """dgl.mean_nodes: mean over VALID nodes only (used by the ablation
    models via dgl's readout, GraphModel.py:296-299)."""
    m = node_mask[..., None]
    return (h * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)


def mean_over_max_nodes(h: jnp.ndarray) -> jnp.ndarray:
    """The production model's readout: plain mean over the padded node axis —
    torch.mean(dim=1) divides by max_node regardless of validity
    (GraphModel.py:204). Kept verbatim for parity."""
    return h.mean(axis=1)
