"""UniXcoder model surface: encoder, classifier head, per-node embeddings.

Mirrors the capabilities of the reference's UniXcoder/MyUniXcoder wrappers
(reference: mvuld/models/unixcoder.py:20-95) and the cUniXcoder baseline's
DefectModel (reference: baselines/models/cunixcoder/model.py:15-49):

  * ``encode``       — token + masked-mean sentence embeddings,
  * ``UniXcoderClassifier`` — encoder + Linear(H, 2) vulnerability head,
  * ``encode_nodes`` — per-line node embeddings (the graph modality's
                       ``_UNIX_NODE_EMB`` features, data_list.py:292-299).

Everything is a pure function of (params, ids) — no torch, no device state.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mvuld_tpu.models.roberta import RobertaConfig, RobertaEncoder, masked_mean


class UniXcoderClassifier(nn.Module):
    """Encoder + masked-mean pooling + 2-class linear head.

    Equivalent of MyUniXcoder (unixcoder.py:20-55) and the cunixcoder
    DefectModel: logits = Linear(sentence_embedding).
    """

    config: RobertaConfig
    num_classes: int = 2
    remat: bool = False

    @nn.compact
    def __call__(self, source_ids: jnp.ndarray, deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        mask = (source_ids != self.config.pad_token_id).astype(jnp.int32)
        tokens = RobertaEncoder(self.config, remat=self.remat, name="encoder")(
            source_ids, mask, deterministic)
        sent = masked_mean(tokens, mask)
        logits = nn.Dense(self.num_classes, dtype=self.config.dtype, name="classifier")(sent)
        return logits.astype(jnp.float32), sent


class UniXcoderLM(nn.Module):
    """Decoder-mode UniXcoder: causal encoder + LM head tied to the word
    embeddings (reference: unixcoder.py:110-116 lm_head.weight =
    embeddings.word_embeddings.weight)."""

    config: RobertaConfig

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        hidden = RobertaEncoder(self.config, causal=True, name="encoder")(
            input_ids, deterministic=deterministic)
        embed = self.variables["params"]["encoder"]["word_embeddings"]["embedding"]
        return hidden @ jnp.asarray(embed).T.astype(hidden.dtype)


def beam_search_generate(apply_fn, params, prefix_ids, *, beam_size: int = 5,
                         max_length: int = 64, eos_id: int = 2,
                         pad_id: int = 1):
    """Beam-search decoding over a causal LM (reference: UniXcoder.generate +
    Beam, unixcoder.py:176-343). ``apply_fn(params, ids) -> logits [B,T,V]``.

    Host-side loop re-scoring full prefixes each step (jit-compiled forward);
    returns the best sequence per batch element as a list of id lists.
    """
    import numpy as np

    results = []
    for row in np.asarray(prefix_ids):
        prefix = [int(t) for t in row if int(t) != pad_id]
        beams = [(0.0, prefix, False)]
        for _ in range(max_length - len(prefix)):
            if all(done for _, _, done in beams):
                break
            candidates = []
            alive = [b for b in beams if not b[2]]
            batch = np.full((len(alive), max(len(b[1]) for b in alive)),
                            pad_id, np.int32)
            for i, (_, seq, _) in enumerate(alive):
                batch[i, : len(seq)] = seq
            logits = np.asarray(apply_fn(params, batch))
            for i, (score, seq, _) in enumerate(alive):
                logp = jax.nn.log_softmax(
                    jnp.asarray(logits[i, len(seq) - 1]), -1)
                logp = np.asarray(logp)
                top = np.argsort(-logp)[:beam_size]
                for tok in top:
                    tok = int(tok)
                    candidates.append((score + float(logp[tok]),
                                       seq + [tok], tok == eos_id))
            candidates.extend(b for b in beams if b[2])
            beams = sorted(candidates, key=lambda b: -b[0])[:beam_size]
        results.append(beams[0][1])
    return results


class UniXcoderEmbedder(nn.Module):
    """Encoder-only forward returning (token_embeddings, sentence_embeddings).

    Equivalent of UniXcoder.forward (unixcoder.py:170-175). Used both for the
    whole-function text embedding (768-d ``_FUNC_EMB``) and, applied to a
    [B*N, T] batch of per-line snippets, the per-node embeddings
    (``myEncode``, unixcoder.py:56-70).
    """

    config: RobertaConfig
    remat: bool = False

    @nn.compact
    def __call__(self, source_ids: jnp.ndarray, deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        mask = (source_ids != self.config.pad_token_id).astype(jnp.int32)
        tokens = RobertaEncoder(self.config, remat=self.remat, name="encoder")(
            source_ids, mask, deterministic)
        sent = masked_mean(tokens, mask)
        return tokens, sent
