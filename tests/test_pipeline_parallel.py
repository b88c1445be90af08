"""Pipeline parallelism (parallel/pipeline.py): GPipe over a mesh axis.

Parity contract: the pipelined RoBERTa forward reuses TransformerLayer.apply
per layer, so its output must match the sequential RobertaEncoder exactly
(deterministic mode), and gradients through the scan+ppermute schedule must
match the sequential backward. The reference has no pipeline parallelism
(single-GPU torch) — this capability exceeds it (SURVEY §2.5).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvuld_tpu.models.roberta import RobertaConfig, RobertaEncoder
from mvuld_tpu.parallel.pipeline import (gpipe, make_pp_mesh,
                                         roberta_pipeline_forward,
                                         stack_layer_params)

CFG = RobertaConfig(vocab_size=97, hidden_size=32, num_layers=4, num_heads=2,
                    intermediate_size=64, max_position_embeddings=64,
                    dropout_rate=0.0)


def _setup(B=8, T=12, seed=0):
    rng = np.random.RandomState(seed)
    ids = rng.randint(2, 97, (B, T)).astype(np.int32)
    ids[:, -2:] = CFG.pad_token_id          # real padding in every row
    enc = RobertaEncoder(CFG)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    return enc, variables["params"], jnp.asarray(ids)


@pytest.mark.parametrize("stages,microbatches", [(4, 4), (2, 2), (4, 8)])
def test_pipeline_forward_parity(stages, microbatches):
    enc, params, ids = _setup()
    want = enc.apply({"params": params}, ids)
    mesh = make_pp_mesh(stages)
    got = jax.jit(lambda p, x: roberta_pipeline_forward(
        CFG, p, x, None, mesh, "pp", microbatches))(params, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("remat", [False, True])
def test_pipeline_grad_parity(remat):
    """Gradients wrt EVERY param (stack layers + embeddings) through the
    pipelined schedule match the sequential encoder's backward."""
    enc, params, ids = _setup(B=4)
    mesh = make_pp_mesh(4)

    def loss_seq(p):
        out = enc.apply({"params": p}, ids)
        return (out.astype(jnp.float32) ** 2).mean()

    def loss_pp(p):
        out = roberta_pipeline_forward(CFG, p, ids, None, mesh, "pp",
                                       num_microbatches=2, remat=remat)
        return (out.astype(jnp.float32) ** 2).mean()

    g_seq = jax.grad(loss_seq)(params)
    g_pp = jax.jit(jax.grad(loss_pp))(params)
    flat_seq, tdef = jax.tree_util.tree_flatten(g_seq)
    flat_pp, tdef2 = jax.tree_util.tree_flatten(g_pp)
    assert tdef == tdef2
    for a, b in zip(flat_seq, flat_pp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5, rtol=2e-4)


def test_gpipe_generic_stack():
    """gpipe on a plain stacked-linear layer: equals the sequential loop."""
    rng = np.random.RandomState(1)
    L, B, D = 4, 8, 16
    W = jnp.asarray(rng.randn(L, D, D).astype(np.float32) * 0.3)
    x = jnp.asarray(rng.randn(B, D).astype(np.float32))

    def layer_fn(w, h, _, key):
        return jnp.tanh(h @ w)

    want = x
    for i in range(L):
        want = jnp.tanh(want @ W[i])

    mesh = make_pp_mesh(4)
    got = jax.jit(lambda w, h: gpipe(layer_fn, w, h, None, mesh, "pp", 4))(
        W, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-5)


def test_pipeline_validation_errors():
    mesh = make_pp_mesh(4)
    W = jnp.zeros((6, 4, 4))        # 6 layers over 4 stages: invalid
    x = jnp.zeros((8, 4))
    with pytest.raises(ValueError, match="layers must divide"):
        gpipe(lambda w, h, _, k: h, W, x, None, mesh, "pp", 4)
    W = jnp.zeros((4, 4, 4))
    with pytest.raises(ValueError, match="multiple of the"):
        gpipe(lambda w, h, _, k: h, W, x, None, mesh, "pp", 3)


def test_pipeline_dropout_training():
    """Train-mode pp: dropout keys are folded from (rng, microbatch, GLOBAL
    layer index), so masks are (1) deterministic given the key, (2) different
    from the deterministic forward, (3) IDENTICAL across different stage
    partitions of the same stack, and (4) differentiable."""
    cfg = RobertaConfig(vocab_size=97, hidden_size=32, num_layers=4,
                        num_heads=2, intermediate_size=64,
                        max_position_embeddings=64, dropout_rate=0.3)
    rng = np.random.RandomState(3)
    ids = jnp.asarray(rng.randint(2, 97, (4, 12)).astype(np.int32))
    params = RobertaEncoder(cfg).init(jax.random.PRNGKey(0), ids)["params"]
    key = jax.random.PRNGKey(7)

    mesh4 = make_pp_mesh(4)
    out_a = roberta_pipeline_forward(cfg, params, ids, None, mesh4, "pp", 2,
                                     dropout_rng=key)
    out_b = roberta_pipeline_forward(cfg, params, ids, None, mesh4, "pp", 2,
                                     dropout_rng=key)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))

    det = roberta_pipeline_forward(cfg, params, ids, None, mesh4, "pp", 2)
    assert not np.allclose(np.asarray(out_a), np.asarray(det))

    mesh2 = make_pp_mesh(2)   # same stack split 2 ways: same masks
    out_c = roberta_pipeline_forward(cfg, params, ids, None, mesh2, "pp", 2,
                                     dropout_rng=key)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_a),
                               atol=1e-6, rtol=1e-6)

    def loss_fn(p):
        out = roberta_pipeline_forward(cfg, p, ids, None, mesh4, "pp", 2,
                                       remat=True, dropout_rng=key)
        return (out.astype(jnp.float32) ** 2).mean()

    grads = jax.jit(jax.grad(loss_fn))(params)
    gsum = sum(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda g: float(jnp.abs(g).sum()), grads)))
    assert np.isfinite(gsum) and gsum > 0


def test_stack_layer_params_roundtrip():
    _, params, _ = _setup()
    stacked = stack_layer_params(params, CFG.num_layers)
    leaf = stacked["attention"]["query"]["kernel"]
    assert leaf.shape == (4, 32, 32)
    np.testing.assert_array_equal(
        np.asarray(leaf[2]),
        np.asarray(params["layer_2"]["attention"]["query"]["kernel"]))
