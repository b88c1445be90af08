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
