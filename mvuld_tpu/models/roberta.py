"""RoBERTa encoder in Flax — the text-modality backbone (UniXcoder).

The reference loads ``microsoft/unixcoder-base-nine`` via HF transformers
(reference: mvuld/models/unixcoder.py:100-117) and uses only the encoder
stack: token embeddings → 12 post-LN transformer layers → last hidden state.
This is a from-scratch Flax implementation of that architecture, designed for
TPU: all shapes static, attention as batched einsum on the MXU, configurable
compute dtype (bf16) with fp32 parameters, optional remat.

Weight conversion from a torch ``state_dict`` lives in
``mvuld_tpu/utils/torch_convert.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from mvuld_tpu.models.swin_v2 import _DenseParams, _LNParams


@dataclasses.dataclass(frozen=True)
class RobertaConfig:
    vocab_size: int = 51416          # microsoft/unixcoder-base-nine
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 1026
    type_vocab_size: int = 10
    pad_token_id: int = 1
    layer_norm_eps: float = 1e-5
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32   # compute dtype; params stay fp32
    # fused Pallas MLP+dropout+residual+LN (ops/fused_dense.py mlp_ln_res):
    # the [M, 4C] intermediate never touches HBM. TPU only; the interpret
    # flag runs the same kernel on CPU for tests.
    use_pallas_mlp: bool = False
    pallas_interpret: bool = False

    @staticmethod
    def from_cfg(cfg) -> "RobertaConfig":
        u = cfg.MODEL.UNIXCODER
        return RobertaConfig(
            vocab_size=u.VOCAB_SIZE, hidden_size=u.HIDDEN, num_layers=u.LAYERS,
            num_heads=u.HEADS, intermediate_size=u.INTERMEDIATE,
            max_position_embeddings=u.MAX_POSITIONS,
            dtype=jnp.bfloat16 if cfg.PARALLEL.DTYPE == "bfloat16" else jnp.float32,
        )


def roberta_position_ids(input_ids: jnp.ndarray, pad_token_id: int) -> jnp.ndarray:
    """RoBERTa position ids: pad positions get ``padding_idx``; real tokens get
    ``padding_idx + running count`` (so the first token is at padding_idx+1).
    """
    mask = (input_ids != pad_token_id).astype(jnp.int32)
    return jnp.cumsum(mask, axis=-1) * mask + pad_token_id


class SelfAttention(nn.Module):
    config: RobertaConfig

    @nn.compact
    def __call__(self, hidden: jnp.ndarray, attn_bias: jnp.ndarray, deterministic: bool = True):
        c = self.config
        head_dim = c.hidden_size // c.num_heads
        dense = lambda name: nn.Dense(c.hidden_size, dtype=c.dtype, name=name)
        q = dense("query")(hidden)
        k = dense("key")(hidden)
        v = dense("value")(hidden)

        def split(x):
            return x.reshape(x.shape[:-1] + (c.num_heads, head_dim))

        q, k, v = split(q), split(k), split(v)
        scale = 1.0 / jnp.sqrt(jnp.asarray(head_dim, dtype=jnp.float32))
        # [B, H, Tq, Tk] — softmax in fp32 for stability regardless of compute dtype
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
        logits = logits + attn_bias
        probs = jax.nn.softmax(logits, axis=-1).astype(c.dtype)
        probs = nn.Dropout(c.dropout_rate)(probs, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        ctx = ctx.reshape(ctx.shape[:2] + (c.hidden_size,))
        out = nn.Dense(c.hidden_size, dtype=c.dtype, name="output")(ctx)
        return out


class TransformerLayer(nn.Module):
    """Post-LN transformer layer (BERT/RoBERTa style)."""

    config: RobertaConfig

    @nn.compact
    def __call__(self, hidden: jnp.ndarray, attn_bias: jnp.ndarray, deterministic: bool = True):
        c = self.config
        attn_out = SelfAttention(c, name="attention")(hidden, attn_bias, deterministic)
        attn_out = nn.Dropout(c.dropout_rate)(attn_out, deterministic=deterministic)
        hidden = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype, name="attention_norm")(
            hidden + attn_out)

        if c.use_pallas_mlp:
            # fused Pallas path: identical parameter tree (intermediate/
            # mlp_output/output_norm) so converted HF checkpoints and
            # existing training checkpoints load unchanged; the dropout
            # keep-mask is XLA-generated and consumed in-kernel
            w1, b1 = _DenseParams(c.intermediate_size,
                                  name="intermediate")(c.hidden_size)
            w2, b2 = _DenseParams(c.hidden_size,
                                  name="mlp_output")(c.intermediate_size)
            gamma, beta = _LNParams(name="output_norm")(c.hidden_size)
            from mvuld_tpu.ops.fused_dense import mlp_ln_res
            if deterministic or c.dropout_rate == 0.0:
                keep = 1.0
                mask = jnp.zeros(hidden.shape, c.dtype)     # unread
            else:
                keep = 1.0 - c.dropout_rate
                mask = jax.random.bernoulli(
                    self.make_rng("dropout"), keep,
                    hidden.shape).astype(c.dtype)           # {0,1} exact
            hidden = mlp_ln_res(hidden.astype(c.dtype), w1, b1, w2, b2,
                                gamma, beta, mask, keep,
                                c.pallas_interpret)
            # named save point: under nn.remat with a save_only_these_names
            # policy the fused op's output is kept, so the backward never
            # re-runs the forward kernel (its custom VJP already recomputes
            # h/z internally from x)
            hidden = checkpoint_name(hidden, "bert_mlp_out")
        else:
            mlp = nn.Dense(c.intermediate_size, dtype=c.dtype, name="intermediate")(hidden)
            mlp = nn.gelu(mlp, approximate=False)
            mlp = nn.Dense(c.hidden_size, dtype=c.dtype, name="mlp_output")(mlp)
            mlp = nn.Dropout(c.dropout_rate)(mlp, deterministic=deterministic)
            hidden = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype, name="output_norm")(
                hidden + mlp)
        return hidden


class RobertaEncoder(nn.Module):
    """Embeddings + transformer stack → last hidden state [B, T, H].

    ``causal=True`` adds a lower-triangular mask — the reference's
    decoder-only mode (UniXcoder registers a tril bias buffer,
    unixcoder.py:113, used for generation)."""

    config: RobertaConfig
    remat: bool = False
    causal: bool = False

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 attention_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        c = self.config
        if attention_mask is None:
            attention_mask = (input_ids != c.pad_token_id).astype(jnp.int32)

        word = nn.Embed(c.vocab_size, c.hidden_size, dtype=c.dtype, name="word_embeddings")(input_ids)
        pos_ids = roberta_position_ids(input_ids, c.pad_token_id)
        pos = nn.Embed(c.max_position_embeddings, c.hidden_size, dtype=c.dtype,
                       name="position_embeddings")(pos_ids)
        ttype = nn.Embed(c.type_vocab_size, c.hidden_size, dtype=c.dtype,
                         name="token_type_embeddings")(jnp.zeros_like(input_ids))
        hidden = word + pos + ttype
        hidden = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype, name="embeddings_norm")(hidden)
        hidden = nn.Dropout(c.dropout_rate)(hidden, deterministic=deterministic)

        # additive key-side mask, broadcast over heads and query positions
        attn_bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9).astype(jnp.float32)
        if self.causal:
            T = input_ids.shape[-1]
            tril = jnp.tril(jnp.ones((T, T), jnp.float32))
            attn_bias = attn_bias + jnp.where(tril > 0, 0.0, -1e9)[None, None]

        # static_argnums counts `self` (flax subtracts 1 internally):
        # __call__(self, hidden, attn_bias, deterministic) → deterministic = 3
        if self.remat:
            # with the fused MLP, save its output: the custom VJP already
            # recomputes h/z internally, so re-running the forward kernel
            # under remat would be a third full MLP pass
            policy = (jax.checkpoint_policies.save_only_these_names(
                "bert_mlp_out") if c.use_pallas_mlp else None)
            layer_cls = nn.remat(TransformerLayer, static_argnums=(3,),
                                 policy=policy)
        else:
            layer_cls = TransformerLayer
        for i in range(c.num_layers):
            hidden = layer_cls(c, name=f"layer_{i}")(hidden, attn_bias, deterministic)
        return hidden


def masked_mean(token_embeddings: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Sentence embedding = mean of token embeddings over non-pad positions
    (reference: mvuld/models/unixcoder.py get_xcode_vec:33-38).
    """
    m = mask.astype(token_embeddings.dtype)[..., None]
    return (token_embeddings * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)
