import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvuld_tpu.models.baselines import (ChildSumTreeLSTM, DevignModel, GGNNSum,
                                        IVDetect, MaskedGRU,
                                        MetricLearningModel, reveal_loss, smote)

B, N, F = 2, 12, 32


def _graph(seed=0):
    rng = np.random.RandomState(seed)
    node_mask = np.zeros((B, N), np.float32)
    node_mask[0, :8] = 1
    node_mask[1, :12] = 1
    adj_e = (rng.rand(B, 3, N, N) < 0.15).astype(np.float32)
    feats = rng.randn(B, N, F).astype(np.float32) * node_mask[..., None]
    return feats, adj_e, node_mask


@pytest.mark.slow
def test_devign_forward():
    feats, adj_e, mask = _graph()
    m = DevignModel(input_dim=F, output_dim=48, num_steps=3, n_etypes=3)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                    jnp.asarray(adj_e), jnp.asarray(mask))
    logits = m.apply(params, jnp.asarray(feats), jnp.asarray(adj_e),
                     jnp.asarray(mask))
    assert logits.shape == (B,)
    assert np.isfinite(np.asarray(logits)).all()


def test_ggnn_sum_repr_export():
    feats, adj_e, mask = _graph()
    m = GGNNSum(output_dim=48, num_steps=3, n_etypes=3)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                    jnp.asarray(adj_e), jnp.asarray(mask))
    logits, reprs = m.apply(params, jnp.asarray(feats), jnp.asarray(adj_e),
                            jnp.asarray(mask), return_repr=True)
    assert logits.shape == (B,) and reprs.shape == (B, 48)


def test_metric_learning_and_triplet_loss():
    rng = np.random.RandomState(0)
    m = MetricLearningModel(hidden_dim=16)
    x = jnp.asarray(rng.randn(4, 24).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    logp, h = m.apply(variables, x)
    assert logp.shape == (4, 2) and h.shape == (4, 16)
    np.testing.assert_allclose(np.exp(np.asarray(logp)).sum(-1),
                               np.ones(4), rtol=1e-5)
    targets = jnp.asarray([0, 1, 0, 1])
    lp, hp = m.apply(variables, x + 0.1)
    ln_, hn = m.apply(variables, x - 0.1)
    loss = reveal_loss(logp, h, targets, hp, hn)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_smote_balances():
    rng = np.random.RandomState(0)
    feats = rng.randn(50, 8).astype(np.float32)
    labels = np.array([1] * 5 + [0] * 45)
    f2, l2 = smote(feats, labels, rng)
    assert (l2 == 1).sum() == (l2 == 0).sum() == 45
    # synthetic minority points lie within the minority convex region
    assert f2.shape[0] == 90


def test_masked_gru_respects_lengths():
    rng = np.random.RandomState(0)
    x = rng.randn(3, 6, 4).astype(np.float32)
    mask = np.zeros((3, 6), np.float32)
    mask[0, :2] = 1
    mask[1, :6] = 1
    mask[2, :4] = 1
    m = MaskedGRU(hidden=5)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask))
    out = m.apply(params, jnp.asarray(x), jnp.asarray(mask))
    assert out.shape == (3, 5)
    # changing tokens beyond the mask must not change the output
    x2 = x.copy()
    x2[0, 3:] = 99.0
    out2 = m.apply(params, jnp.asarray(x2), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out2[0]),
                               atol=1e-6)


def test_treelstm_child_sum():
    """On a chain AST 0→1→2, node 0's state must depend on node 2's input."""
    m = ChildSumTreeLSTM(hidden=6)
    x = np.zeros((1, 3, 4), np.float32)
    ast = np.zeros((1, 3, 3), np.float32)
    ast[0, 0, 1] = 1
    ast[0, 1, 2] = 1
    mask = np.ones((1, 3), np.float32)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(ast),
                    jnp.asarray(mask))
    h0 = np.asarray(m.apply(params, jnp.asarray(x), jnp.asarray(ast),
                            jnp.asarray(mask)))
    x2 = x.copy()
    x2[0, 2] = 5.0
    h1 = np.asarray(m.apply(params, jnp.asarray(x2), jnp.asarray(ast),
                            jnp.asarray(mask)))
    assert np.abs(h1[0, 0] - h0[0, 0]).max() > 1e-6   # leaf influences root
    assert np.abs(h1[0, 2] - h0[0, 2]).max() > 1e-6


@pytest.mark.slow
def test_ivdetect_forward():
    rng = np.random.RandomState(0)
    Bn, Nn, L, D = 2, 6, 5, 8
    def seq():
        s = rng.randn(Bn, Nn, L, D).astype(np.float32)
        m = (rng.rand(Bn, Nn, L) < 0.7).astype(np.float32)
        m[..., 0] = 1
        return s, m
    f1, m1 = seq(); f3, m3 = seq(); f4, m4 = seq(); f5, m5 = seq()
    ast = (rng.rand(Bn, Nn, Nn) < 0.2).astype(np.float32)
    adj = (rng.rand(Bn, Nn, Nn) < 0.3).astype(np.float32)
    mask = np.ones((Bn, Nn), np.float32)
    model = IVDetect(hidden=10, feat_dim=D)
    variables = model.init(jax.random.PRNGKey(0), *(jnp.asarray(a) for a in
                           (f1, m1, f3, m3, f4, m4, f5, m5, ast, adj, mask)))
    logits = model.apply(variables, *(jnp.asarray(a) for a in
                         (f1, m1, f3, m3, f4, m4, f5, m5, ast, adj, mask)))
    assert logits.shape == (Bn, 2)
    assert np.isfinite(np.asarray(logits)).all()
