"""Baseline detectors: Devign, ReVeal, IVDetect — dense TPU re-implementations.

Reference semantics:
  * Devign (baselines/models/devign/model.py:8-100): 6-step GGNN over
    132-d nodes (word2vec 100 + one-hot ntype 32), dual conv/maxpool readout
    over the node axis, elementwise product, mean, sigmoid.
  * ReVeal phase 1 (reveal/ggnn/model.py GGNNSum): 8-step GGNN, sum readout,
    linear → sigmoid; ``save_after_ggnn`` exports graph representations.
  * ReVeal phase 2 (reveal/model.py:11-81): MetricLearningModel over
    SMOTE-rebalanced representations — CE + cosine triplet + L2 magnitude.
  * IVDetect (ivdetect/model.py:120-285): five per-node feature channels
    (token-subseq GRU, per-line AST TreeLSTM, name/type GRU, data-dep GRU,
    control-dep GRU) → BiGRU across channels → Linear → GraphConv(→2) →
    mean-pool. NOTE: the reference forward feeds f1 into the F4/F5 GRUs
    (model.py:230-239) — an apparent bug; here f4/f5 consume the actual
    data/control features.

All graph ops run over the dense [B, N, ·] layout from graph_batch.py.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mvuld_tpu.models.graph_nets import DenseGGNN, mean_nodes


class DevignModel(nn.Module):
    """GGNN + dual Conv1d/MaxPool readout (reference: devign/model.py)."""

    input_dim: int = 132
    output_dim: int = 200
    num_steps: int = 6
    n_etypes: int = 6

    @nn.compact
    def __call__(self, node_feats: jnp.ndarray, adj_etype: jnp.ndarray,
                 node_mask: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """node_feats [B,N,F], adj_etype [B,R,N,N] → logits [B] (pre-sigmoid)."""
        h = DenseGGNN(self.output_dim, self.num_steps, self.n_etypes,
                      name="ggnn")(node_feats, adj_etype, node_mask)
        x = node_feats * node_mask[..., None]
        c = jnp.concatenate([h, x], axis=-1)              # [B, N, F+D]

        def conv_pool(y, ch, prefix):
            # torch Conv1d(k=3, VALID) over the node axis + MaxPool1d(3,2)
            y = nn.relu(nn.Conv(ch, (3,), padding="VALID",
                                name=f"{prefix}_conv1")(y))
            y = nn.max_pool(y, (3,), strides=(2,))
            y = nn.relu(nn.Conv(ch, (1,), padding="VALID",
                                name=f"{prefix}_conv2")(y))
            y = nn.max_pool(y, (2,), strides=(2,))
            return y

        Y = conv_pool(h, self.output_dim, "y")            # [B, N', D]
        Z = conv_pool(c, self.output_dim + self.input_dim, "z")
        before_avg = (nn.Dense(1, name="mlp_y")(Y) *
                      nn.Dense(1, name="mlp_z")(Z))       # [B, N', 1]
        avg = before_avg.mean(axis=1).squeeze(-1)          # [B]
        return avg                                          # logits


class GGNNSum(nn.Module):
    """ReVeal phase-1 encoder (reference: reveal/ggnn/model.py:8-60)."""

    output_dim: int = 200
    num_steps: int = 8
    n_etypes: int = 6

    @nn.compact
    def __call__(self, node_feats: jnp.ndarray, adj_etype: jnp.ndarray,
                 node_mask: jnp.ndarray, train: bool = False,
                 return_repr: bool = False):
        h = DenseGGNN(self.output_dim, self.num_steps, self.n_etypes,
                      name="ggnn")(node_feats, adj_etype, node_mask)
        h_sum = h.sum(axis=1)                               # [B, D]
        logits = nn.Dense(1, name="classifier")(h_sum).squeeze(-1)
        if return_repr:
            return logits, h_sum
        return logits


class MetricLearningModel(nn.Module):
    """ReVeal phase-2 representation learner (reference: reveal/model.py)."""

    hidden_dim: int = 256
    dropout_p: float = 0.2
    num_layers: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (log_probs [B,2], features [B,H])."""
        h = nn.relu(nn.Dense(self.hidden_dim, name="layer1")(x))
        h = nn.Dropout(self.dropout_p)(h, deterministic=not train)
        for i in range(self.num_layers):
            inner = nn.relu(nn.Dense(self.hidden_dim // 2,
                                     name=f"feat_{i}_a")(h))
            inner = nn.Dropout(self.dropout_p)(inner, deterministic=not train)
            h = nn.relu(nn.Dense(self.hidden_dim, name=f"feat_{i}_b")(inner))
            h = nn.Dropout(self.dropout_p)(h, deterministic=not train)
        logp = nn.log_softmax(nn.Dense(2, name="classifier")(h), axis=-1)
        return logp, h


def reveal_loss(logp_a, h_a, targets, h_p=None, h_n=None,
                alpha: float = 0.5, lambda1: float = 0.5,
                lambda2: float = 0.001) -> jnp.ndarray:
    """CE + cosine triplet + L2 magnitude (reference: reveal/model.py:47-78)."""
    ce = -jnp.take_along_axis(logp_a, targets[:, None], axis=-1).squeeze(-1)
    if h_p is None or h_n is None:
        return ce.sum()
    def cos_dist(a, b):
        num = (a * b).sum(-1)
        return 1.0 - num / (jnp.linalg.norm(a, axis=-1) *
                            jnp.linalg.norm(b, axis=-1) + 1e-8)
    trip = lambda1 * jnp.abs(cos_dist(h_a, h_p) - cos_dist(h_a, h_n) + alpha)
    l2 = lambda2 * (jnp.linalg.norm(h_a, axis=-1) +
                    jnp.linalg.norm(h_p, axis=-1) +
                    jnp.linalg.norm(h_n, axis=-1))
    return (ce + trip + l2).sum()


def smote(features, labels, rng, k: int = 5):
    """Numpy SMOTE (imblearn replacement): oversample the minority class by
    interpolating toward random same-class k-NN neighbors (reference uses
    imblearn.SMOTE, reveal/graph_dataset.py:47-60)."""
    import numpy as np
    features = np.asarray(features)
    labels = np.asarray(labels)
    classes, counts = np.unique(labels, return_counts=True)
    if len(classes) < 2:
        return features, labels
    minority = classes[np.argmin(counts)]
    need = int(counts.max() - counts.min())
    minority_feats = features[labels == minority]
    if need == 0 or len(minority_feats) < 2:
        return features, labels
    d2 = ((minority_feats[:, None] - minority_feats[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    knn = np.argsort(d2, axis=1)[:, :min(k, len(minority_feats) - 1)]
    synth = []
    for _ in range(need):
        i = rng.randint(len(minority_feats))
        j = knn[i][rng.randint(knn.shape[1])]
        gap = rng.rand()
        synth.append(minority_feats[i] + gap * (minority_feats[j] - minority_feats[i]))
    synth = np.stack(synth)
    return (np.concatenate([features, synth]),
            np.concatenate([labels, np.full(need, minority, labels.dtype)]))


# --------------------------------------------------------------------------- #
# IVDetect
# --------------------------------------------------------------------------- #

class MaskedGRU(nn.Module):
    """GRU over [B*, L, D] sequences with a length mask; returns the final
    valid state (reference GruWrapper: run + gather at length)."""

    hidden: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        lengths = mask.sum(axis=-1).astype(jnp.int32)
        rnn = nn.RNN(nn.GRUCell(features=self.hidden), name="rnn")
        carry, _outputs = rnn(x, seq_lengths=lengths, return_carry=True)
        return carry


class ChildSumTreeLSTM(nn.Module):
    """Child-sum TreeLSTM over the line-containment AST (reference:
    ivdetect/treeLstm.py:1-115). Children always have larger line indices
    than their parent in the line graph, so a single reverse-order scan
    processes children before parents."""

    hidden: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, ast_adj: jnp.ndarray,
                 node_mask: jnp.ndarray) -> jnp.ndarray:
        """x [B,N,D], ast_adj [B,N,N] (parent→child) → h [B,N,H]."""
        B, N, D = x.shape
        H = self.hidden
        # raw params: flax modules cannot be applied inside a lax.scan body
        init = nn.initializers.xavier_uniform()
        w_iou = self.param("W_iou", init, (D, 3 * H))
        b_iou = self.param("b_iou", nn.initializers.zeros, (3 * H,))
        u_iou = self.param("U_iou", init, (H, 3 * H))
        w_f = self.param("W_f", init, (D, H))
        b_f = self.param("b_f", nn.initializers.zeros, (H,))
        u_f = self.param("U_f", init, (H, H))

        h_all = jnp.zeros((B, N, H), x.dtype)
        c_all = jnp.zeros((B, N, H), x.dtype)
        # precompute input projections for all nodes
        x_iou = x @ w_iou + b_iou                # [B, N, 3H]
        x_f = x @ w_f + b_f                      # [B, N, H]

        def step(carry, idx):
            h_all, c_all = carry
            j = N - 1 - idx                      # reverse order
            children = jax.lax.dynamic_index_in_dim(ast_adj, j, 1, keepdims=False)
            h_sum = jnp.einsum("bn,bnh->bh", children, h_all)
            iou = jax.lax.dynamic_index_in_dim(x_iou, j, 1, keepdims=False) \
                + h_sum @ u_iou
            i, o, u = jnp.split(iou, 3, axis=-1)
            i, o, u = jax.nn.sigmoid(i), jax.nn.sigmoid(o), jnp.tanh(u)
            xf_j = jax.lax.dynamic_index_in_dim(x_f, j, 1, keepdims=False)
            f = jax.nn.sigmoid(xf_j[:, None, :] + h_all @ u_f)   # [B, N, H]
            c_children = jnp.einsum("bn,bnh->bh", children, f * c_all)
            c_j = i * u + c_children
            h_j = o * jnp.tanh(c_j)
            h_all = jax.lax.dynamic_update_index_in_dim(h_all, h_j, j, 1)
            c_all = jax.lax.dynamic_update_index_in_dim(c_all, c_j, j, 1)
            return (h_all, c_all), None

        (h_all, _c), _ = jax.lax.scan(step, (h_all, c_all), jnp.arange(N))
        return h_all * node_mask[..., None]


class IVDetect(nn.Module):
    """Five-channel per-node features → BiGRU over channels → GraphConv →
    masked mean-pool (reference: ivdetect/model.py:120-285)."""

    hidden: int = 64
    feat_dim: int = 100

    @nn.compact
    def __call__(self, f_subseq, f_subseq_mask, f_nametype, f_nametype_mask,
                 f_data, f_data_mask, f_control, f_control_mask,
                 ast_adj, adj, node_mask, train: bool = False) -> jnp.ndarray:
        """f_* are [B, N, L, D] token-embedding sequences with [B, N, L] masks;
        ast_adj/adj are [B, N, N]; returns logits [B, 2]."""
        B, N, L, D = f_subseq.shape
        H = self.hidden

        def seq_channel(seq, mask, name):
            flat = seq.reshape(B * N, L, D)
            fmask = mask.reshape(B * N, L)
            out = MaskedGRU(H, name=name)(flat, fmask)
            return out.reshape(B, N, H)

        F1 = seq_channel(f_subseq, f_subseq_mask, "gru_subseq")
        # F2: TreeLSTM over the containment AST with F1 as node input
        F2 = ChildSumTreeLSTM(H, name="treelstm")(F1, ast_adj, node_mask)
        F3 = seq_channel(f_nametype, f_nametype_mask, "gru_nametype")
        F4 = seq_channel(f_data, f_data_mask, "gru_data")
        F5 = seq_channel(f_control, f_control_mask, "gru_control")

        chans = jnp.stack([F1, F2, F3, F4, F5], axis=2)    # [B, N, 5, H]
        flat = chans.reshape(B * N, 5, H)
        fwd_cell = nn.GRUCell(features=H, name="bigru_fwd")
        bwd_cell = nn.GRUCell(features=H, name="bigru_bwd")

        def run(cell, xs):
            h = jnp.zeros((B * N, H), xs.dtype)
            outs = []
            for t in range(5):
                h, _ = cell(h, xs[:, t])
                outs.append(h)
            return jnp.stack(outs, axis=1)

        fwd = run(fwd_cell, flat)
        bwd = run(bwd_cell, flat[:, ::-1])[:, ::-1]
        bi = jnp.concatenate([fwd, bwd], axis=-1)          # [B*N, 5, 2H]
        bi = nn.Dropout(0.5)(bi, deterministic=not train)
        vec = nn.Dense(H, name="connect")(bi.reshape(B * N, 5 * 2 * H))
        vec = vec.reshape(B, N, H)

        # GraphConv(H→2) with symmetric normalization over the full graph
        deg = adj.sum(-1, keepdims=True).clip(1)
        msg = jnp.einsum("bij,bjh->bih", adj / jnp.sqrt(deg * deg.transpose(0, 2, 1)),
                         nn.Dense(2, name="gcn")(vec))
        msg = msg * node_mask[..., None]
        return mean_nodes(msg, node_mask)                   # [B, 2]
