import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvuld_tpu.models.roberta import RobertaConfig, RobertaEncoder, masked_mean, roberta_position_ids
from mvuld_tpu.models.unixcoder import UniXcoderClassifier, UniXcoderEmbedder
from mvuld_tpu.utils.torch_convert import roberta_torch_to_flax

TINY = RobertaConfig(vocab_size=100, hidden_size=32, num_layers=2, num_heads=4,
                     intermediate_size=64, max_position_embeddings=64,
                     type_vocab_size=2, dropout_rate=0.0)


def _ids(batch=2, seqlen=10, pad_from=7, seed=0):
    rng = np.random.RandomState(seed)
    ids = rng.randint(2, 100, size=(batch, seqlen)).astype(np.int32)
    ids[:, pad_from:] = TINY.pad_token_id
    return ids


def test_position_ids_skip_pad():
    ids = jnp.array([[5, 6, 1, 1], [1, 7, 8, 1]], dtype=jnp.int32)
    pos = roberta_position_ids(ids, pad_token_id=1)
    np.testing.assert_array_equal(np.asarray(pos), [[2, 3, 1, 1], [1, 2, 3, 1]])


@pytest.mark.slow
def test_encoder_shapes_and_pad_invariance():
    ids = _ids()
    model = RobertaEncoder(TINY)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    out = model.apply(params, jnp.asarray(ids))
    assert out.shape == (2, 10, 32)
    # growing the pad region must not change valid-token outputs
    ids_longer = np.concatenate([ids, np.full((2, 4), TINY.pad_token_id, np.int32)], 1)
    out2 = model.apply(params, jnp.asarray(ids_longer))
    np.testing.assert_allclose(np.asarray(out[:, :7]), np.asarray(out2[:, :7]), atol=1e-5)


def test_masked_mean_ignores_pad():
    ids = _ids()
    mask = (ids != TINY.pad_token_id).astype(np.float32)
    toks = np.random.RandomState(1).randn(2, 10, 32).astype(np.float32)
    sent = masked_mean(jnp.asarray(toks), jnp.asarray(mask))
    expected = toks[:, :7].mean(axis=1)
    np.testing.assert_allclose(np.asarray(sent), expected, atol=1e-6)


def test_classifier_forward():
    ids = _ids()
    model = UniXcoderClassifier(TINY)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    logits, sent = model.apply(params, jnp.asarray(ids))
    assert logits.shape == (2, 2) and sent.shape == (2, 32)
    assert logits.dtype == jnp.float32


@pytest.mark.parametrize("seqlen", [10, 16])
def test_parity_with_hf_roberta(seqlen):
    """Convert a randomly-initialized HF RobertaModel and check logits parity.

    This is the load path for released UniXcoder weights
    (reference: mvuld/models/unixcoder.py:110 RobertaModel.from_pretrained).
    """
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.RobertaConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=64, type_vocab_size=2,
        pad_token_id=1, layer_norm_eps=1e-5,  # match RobertaConfig default (unixcoder-base)
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        # torch's fused SDPA kernel deviates ~1e-4 from exact math; compare
        # against the eager reference implementation instead
        attn_implementation="eager")
    assert hf_cfg.layer_norm_eps == TINY.layer_norm_eps
    torch.manual_seed(0)
    hf = transformers.RobertaModel(hf_cfg, add_pooling_layer=False).eval()

    ids = _ids(seqlen=seqlen, pad_from=seqlen - 3)
    with torch.no_grad():
        ref = hf(torch.tensor(ids.astype(np.int64)),
                 attention_mask=torch.tensor((ids != 1).astype(np.int64))
                 ).last_hidden_state.numpy()

    flax_params = {"params": roberta_torch_to_flax(hf.state_dict(), num_layers=2)}
    out = RobertaEncoder(TINY).apply(flax_params, jnp.asarray(ids))
    valid = ids != 1
    np.testing.assert_allclose(np.asarray(out)[valid], ref[valid], atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_embedder_node_batch():
    ids = _ids(batch=6, seqlen=12, pad_from=5)
    model = UniXcoderEmbedder(TINY)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    toks, sent = model.apply(params, jnp.asarray(ids))
    assert toks.shape == (6, 12, 32) and sent.shape == (6, 32)
