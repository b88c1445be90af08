import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvuld_tpu.config import default_config
from mvuld_tpu.core.registry import FUSION_MODELS
from mvuld_tpu.models.fusion_zoo import MultiDefectAblation, build_fusion_model
from mvuld_tpu.models.graph_nets import (DenseGATConv, DenseGGNN, RsGCN,
                                         l2norm_nodes, mean_nodes,
                                         mean_over_max_nodes)

B, N, E = 2, 8, 768


def _batch(seed=0, n_valid=(5, 8)):
    rng = np.random.RandomState(seed)
    node_mask = np.zeros((B, N), np.float32)
    adj = np.zeros((B, N, N), bool)
    for b, nv in enumerate(n_valid):
        node_mask[b, :nv] = 1
        for i in range(nv):
            adj[b, i, i] = True
            if i + 1 < nv:
                adj[b, i, i + 1] = True
    return {
        "img_emb": rng.randn(B, 1024).astype(np.float32),
        "text_emb": rng.randn(B, 768).astype(np.float32),
        "node_emb": (rng.randn(B, N, E) * node_mask[..., None]).astype(np.float32),
        "pos": (rng.rand(B, N, 4) * node_mask[..., None]).astype(np.float32),
        "adj": adj,
        "node_mask": node_mask,
        "ntype": rng.randint(0, 32, (B, N)).astype(np.int32),
    }


def test_gat_shapes_and_mask():
    b = _batch()
    m = DenseGATConv(out_feats=16, num_heads=4, feat_drop=0.0)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(b["node_emb"]), jnp.asarray(b["adj"]))
    out = m.apply(params, jnp.asarray(b["node_emb"]), jnp.asarray(b["adj"]))
    assert out.shape == (B, N, 4, 16)
    # attention rows sum to 1 over in-neighbors for valid destinations:
    # verify indirectly — output of an isolated valid node equals z + bias
    assert np.isfinite(np.asarray(out)).all()


def test_gat_matches_manual_single_graph():
    """Hand-check DGL GATConv math on a 3-node path graph 0→1→2 (+self loops)."""
    rng = np.random.RandomState(1)
    h = rng.randn(1, 3, 4).astype(np.float32)
    adj = np.zeros((1, 3, 3), bool)
    for i in range(3):
        adj[0, i, i] = True
    adj[0, 0, 1] = adj[0, 1, 2] = True
    m = DenseGATConv(out_feats=5, num_heads=2, feat_drop=0.0)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(h), jnp.asarray(adj))
    out = np.asarray(m.apply(params, jnp.asarray(h), jnp.asarray(adj)))

    p = params["params"]
    W = np.asarray(p["fc"]["kernel"])         # [4, 2*5]
    al = np.asarray(p["attn_l"])              # [2, 5]
    ar = np.asarray(p["attn_r"])
    bias = np.asarray(p["bias"])
    z = (h[0] @ W).reshape(3, 2, 5)
    el = (z * al).sum(-1)                     # [3, 2]
    er = (z * ar).sum(-1)

    def leaky(x):
        return np.where(x > 0, x, 0.2 * x)

    for j in range(3):                        # destination
        for hd in range(2):
            nbrs = [i for i in range(3) if adj[0, i, j]]
            scores = np.array([leaky(el[i, hd] + er[j, hd]) for i in nbrs])
            a = np.exp(scores - scores.max()); a /= a.sum()
            expect = sum(ai * z[i, hd] for ai, i in zip(a, nbrs)) + bias[hd]
            np.testing.assert_allclose(out[0, j, hd], expect, atol=1e-5)


def test_rsgcn_residual_at_init():
    """Zero-init BN scale ⇒ block is the identity at initialization
    (reference: Rs_GCN.py:31-34)."""
    rng = np.random.RandomState(0)
    v = rng.randn(2, 6, 16).astype(np.float32)
    m = RsGCN(channels=16, inter_channels=16)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(v))
    out, aff = m.apply(variables, jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(out), v, atol=1e-5)
    assert aff.shape == (2, 6, 6)


def test_rsgcn_affinity_scaling():
    rng = np.random.RandomState(0)
    v = rng.randn(1, 4, 8).astype(np.float32)
    m = RsGCN(channels=8, inter_channels=8, use_bn=False)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(v))
    _, aff = m.apply(variables, jnp.asarray(v))
    p = variables["params"]
    theta = v[0] @ np.asarray(p["theta"]["kernel"]) + np.asarray(p["theta"]["bias"])
    phi = v[0] @ np.asarray(p["phi"]["kernel"]) + np.asarray(p["phi"]["bias"])
    np.testing.assert_allclose(np.asarray(aff[0]), theta @ phi.T / 4, atol=1e-5)


def test_readouts():
    h = np.ones((2, 4, 3), np.float32)
    mask = np.array([[1, 1, 0, 0], [1, 1, 1, 1]], np.float32)
    h[0, 2:] = 99.0  # padded junk must not affect masked mean
    mm = np.asarray(mean_nodes(jnp.asarray(h), jnp.asarray(mask)))
    np.testing.assert_allclose(mm, np.ones((2, 3)))
    mp = np.asarray(mean_over_max_nodes(jnp.asarray(h)))
    assert mp[0, 0] == pytest.approx((1 + 1 + 99 + 99) / 4)
    l2 = np.asarray(l2norm_nodes(jnp.asarray(h)))
    np.testing.assert_allclose((l2 ** 2).sum(axis=1), np.ones((2, 3)), rtol=1e-5)


def test_ggnn_shapes():
    rng = np.random.RandomState(0)
    h = rng.randn(2, 6, 10).astype(np.float32)
    adj_e = rng.rand(2, 3, 6, 6).astype(np.float32) < 0.2
    m = DenseGGNN(out_feats=16, n_steps=3, n_etypes=3)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(h), jnp.asarray(adj_e, jnp.float32))
    out = m.apply(params, jnp.asarray(h), jnp.asarray(adj_e, jnp.float32))
    assert out.shape == (2, 6, 16)


# every reference ablation class has a registry key (GraphModel.py 13,
# new_model.py 2, myModels.py 3, MotivationModel.py 5)
ALL_ARCHS = [
    "multi_defect_new_gcn", "multi_defect", "multi_defect_nograph",
    "multi_defect_000", "multi_defect_001", "multi_defect_100",
    "multi_defect_110", "multi_defect_gatpos", "multi_defect_011",
    "multi_defect_nogat", "multi_defect_nogat2", "multi_defect_nogat3",
    "multi_defect_nogat4", "multi_defect_noglobalimage",
    "multi_defect_nofunc", "multi_defect_allnode", "multi_defect_grudot",
    "multi_defect_gruproj", "motivation_image", "motivation_functext",
    "motivation_graph", "motivation_graph1", "motivation_graph_mean",
]


@pytest.mark.parametrize("arch", ALL_ARCHS)
@pytest.mark.slow
def test_fusion_zoo_forward_and_grad(arch):
    cfg = default_config()
    model = build_fusion_model(cfg, arch=arch)
    b = _batch()
    args = {k: jnp.asarray(v) for k, v in b.items()}
    variables = model.init(jax.random.PRNGKey(0), **args, train=False)
    logits = model.apply(variables, **args, train=False)
    assert logits.shape == (B, 2)
    assert np.isfinite(np.asarray(logits)).all()
    # train-mode forward+grad with dropout rng (+ BN mutation when present)
    has_bn = "batch_stats" in variables
    labels = jnp.asarray(np.array([0, 1], np.int32))

    def loss_fn(params):
        vs = {"params": params}
        if has_bn:
            vs["batch_stats"] = variables["batch_stats"]
            out, _ = model.apply(vs, **args, train=True,
                                 rngs={"dropout": jax.random.PRNGKey(1)},
                                 mutable=["batch_stats"])
        else:
            out = model.apply(vs, **args, train=True,
                              rngs={"dropout": jax.random.PRNGKey(1)})
        logp = jax.nn.log_softmax(out)
        return -logp[jnp.arange(B), labels].mean()

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.abs(g).sum())
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_registry_covers_ablation_zoo():
    assert set(ALL_ARCHS) <= set(FUSION_MODELS.keys())
    assert len(ALL_ARCHS) == 23
