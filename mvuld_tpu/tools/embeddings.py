"""Token-embedding training: GloVe and skip-gram word2vec, TPU-native.

The reference shells out to the StanfordNLP GloVe C binaries
(baselines/utils/glove.py:36-66) and uses gensim Word2Vec (100-d, window 10;
baselines/utils/word2vec.py:12-106) to featurize baseline node text. Neither
binary is available here, and neither is needed: cooccurrence counting is a
host pass, and both objectives are tiny dense optimizations that run well
under jit — so the "native" embedding trainer is JAX itself.

  * ``build_vocab`` / ``cooccurrence``  — host-side corpus passes,
  * ``train_glove``  — AdaGrad on the weighted least-squares GloVe objective,
  * ``train_sgns``   — skip-gram with negative sampling,
  * ``EmbeddingTable.get_embeddings`` — mean-of-token-vectors sentence
    featurizer (reference: MyWord2Vec.get_embeddings / glove get_embeddings).
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict
from typing import Dict, Iterable, List, Sequence, Tuple

import numpy as np

_TOKEN_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*|\d+|[^\sA-Za-z0-9_]")


def tokenize_code(text: str) -> List[str]:
    return _TOKEN_RE.findall(text)


def build_vocab(corpus: Iterable[str], min_count: int = 1,
                max_size: int = 20000) -> Dict[str, int]:
    counts = Counter()
    for doc in corpus:
        counts.update(tokenize_code(doc))
    vocab = {"<unk>": 0}
    for tok, c in counts.most_common(max_size - 1):
        if c >= min_count:
            vocab[tok] = len(vocab)
    return vocab


def cooccurrence(corpus: Iterable[str], vocab: Dict[str, int],
                 window: int = 10) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Symmetric distance-weighted cooccurrence (GloVe convention:
    increment by 1/distance). Returns (rows, cols, values)."""
    counts: Dict[Tuple[int, int], float] = defaultdict(float)
    for doc in corpus:
        ids = [vocab.get(t, 0) for t in tokenize_code(doc)]
        for i, wi in enumerate(ids):
            for d in range(1, window + 1):
                j = i + d
                if j >= len(ids):
                    break
                counts[(wi, ids[j])] += 1.0 / d
                counts[(ids[j], wi)] += 1.0 / d
    if not counts:
        return (np.zeros(0, np.int32),) * 2 + (np.zeros(0, np.float32),)
    keys = np.asarray(list(counts.keys()), np.int32)
    vals = np.asarray(list(counts.values()), np.float32)
    return keys[:, 0], keys[:, 1], vals


class EmbeddingTable:
    def __init__(self, vocab: Dict[str, int], vectors: np.ndarray):
        self.vocab = vocab
        self.vectors = np.asarray(vectors, np.float32)

    @property
    def dim(self) -> int:
        return self.vectors.shape[1]

    def get_embeddings(self, text: str, seq_len: int | None = None) -> np.ndarray:
        """Mean of token vectors; with ``seq_len``, a padded [L, D] sequence
        instead (for GRU channels)."""
        ids = [self.vocab.get(t, 0) for t in tokenize_code(text)]
        if seq_len is not None:
            out = np.zeros((seq_len, self.dim), np.float32)
            for k, i in enumerate(ids[:seq_len]):
                out[k] = self.vectors[i]
            return out
        if not ids:
            return np.zeros(self.dim, np.float32)
        return self.vectors[ids].mean(axis=0)

    def most_similar(self, token: str, k: int = 5) -> List[str]:
        if token not in self.vocab:
            return []
        v = self.vectors[self.vocab[token]]
        sims = self.vectors @ v / (
            np.linalg.norm(self.vectors, axis=1) * np.linalg.norm(v) + 1e-8)
        inv = {i: t for t, i in self.vocab.items()}
        order = np.argsort(-sims)
        return [inv[i] for i in order if inv[i] != token][:k]


def train_glove(corpus: Sequence[str], dim: int = 100, window: int = 10,
                epochs: int = 30, lr: float = 0.05, x_max: float = 100.0,
                alpha: float = 0.75, min_count: int = 1, seed: int = 0,
                max_vocab: int = 20000) -> EmbeddingTable:
    """GloVe via AdaGrad on the full nonzero-cooccurrence batch (jitted)."""
    import jax
    import jax.numpy as jnp

    vocab = build_vocab(corpus, min_count, max_vocab)
    rows, cols, vals = cooccurrence(corpus, vocab, window)
    V = len(vocab)
    rng = np.random.RandomState(seed)
    params = {
        "w": jnp.asarray(rng.uniform(-0.5, 0.5, (V, dim)) / dim, jnp.float32),
        "wc": jnp.asarray(rng.uniform(-0.5, 0.5, (V, dim)) / dim, jnp.float32),
        "b": jnp.zeros((V,), jnp.float32),
        "bc": jnp.zeros((V,), jnp.float32),
    }
    if rows.size == 0:
        return EmbeddingTable(vocab, np.asarray(params["w"]))
    r = jnp.asarray(rows)
    c = jnp.asarray(cols)
    x = jnp.asarray(vals)
    logx = jnp.log(x)
    fx = jnp.minimum(1.0, (x / x_max) ** alpha)
    grad_sq = jax.tree_util.tree_map(lambda p: jnp.ones_like(p), params)

    @jax.jit
    def step(params, grad_sq):
        def loss_fn(p):
            wi = p["w"][r]
            wj = p["wc"][c]
            pred = (wi * wj).sum(-1) + p["b"][r] + p["bc"][c]
            return (fx * (pred - logx) ** 2).sum()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        new_gs = jax.tree_util.tree_map(lambda g, s: s + g * g, grads, grad_sq)
        new_p = jax.tree_util.tree_map(
            lambda p, g, s: p - lr * g / jnp.sqrt(s), params, grads, new_gs)
        return new_p, new_gs, loss

    for _ in range(epochs):
        params, grad_sq, loss = step(params, grad_sq)
    vectors = np.asarray(params["w"] + params["wc"])
    return EmbeddingTable(vocab, vectors)


def train_sgns(corpus: Sequence[str], dim: int = 100, window: int = 10,
               epochs: int = 50, lr: float = 0.05, negatives: int = 5,
               min_count: int = 1, seed: int = 0,
               max_vocab: int = 20000) -> EmbeddingTable:
    """Skip-gram with negative sampling (gensim Word2Vec equivalent)."""
    import jax
    import jax.numpy as jnp

    vocab = build_vocab(corpus, min_count, max_vocab)
    V = len(vocab)
    pairs: List[Tuple[int, int]] = []
    for doc in corpus:
        ids = [vocab.get(t, 0) for t in tokenize_code(doc)]
        for i, wi in enumerate(ids):
            for j in range(max(0, i - window), min(len(ids), i + window + 1)):
                if j != i:
                    pairs.append((wi, ids[j]))
    if not pairs:
        return EmbeddingTable(vocab, np.zeros((V, dim), np.float32))
    pairs_arr = np.asarray(pairs, np.int32)
    rng = np.random.RandomState(seed)
    params = {
        "in": jnp.asarray(rng.randn(V, dim) * 0.1, jnp.float32),
        "out": jnp.zeros((V, dim), jnp.float32),
    }

    @jax.jit
    def step(params, centers, contexts, negs):
        def loss_fn(p):
            vc = p["in"][centers]
            uo = p["out"][contexts]
            un = p["out"][negs]                      # [B, K, D]
            pos = jax.nn.log_sigmoid((vc * uo).sum(-1))
            neg = jax.nn.log_sigmoid(-(un @ vc[..., None]).squeeze(-1)).sum(-1)
            return -(pos + neg).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        new_p = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
        return new_p, loss

    B = min(8192, len(pairs_arr))
    for _ in range(epochs):
        sel = rng.randint(0, len(pairs_arr), B)
        batch = pairs_arr[sel]
        negs = rng.randint(0, V, (B, negatives)).astype(np.int32)
        params, loss = step(params, jnp.asarray(batch[:, 0]),
                            jnp.asarray(batch[:, 1]), jnp.asarray(negs))
    return EmbeddingTable(vocab, np.asarray(params["in"]))
