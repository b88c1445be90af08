"""End-to-end tri-modal model: one jitted step updates every encoder."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from mvuld_tpu.models.e2e import EndToEndMVulD
from mvuld_tpu.models.roberta import RobertaConfig
from mvuld_tpu.models.swin_v2 import SwinV2Config

pytestmark = pytest.mark.slow  # heavy: excluded from the -m 'not slow' quick lane

TEXT = RobertaConfig(vocab_size=200, hidden_size=32, num_layers=1, num_heads=2,
                     intermediate_size=64, max_position_embeddings=128,
                     dropout_rate=0.0)
SWIN = SwinV2Config(img_size=32, patch_size=4, embed_dim=16, depths=(1, 1),
                    num_heads=(2, 2), window_size=4, drop_path_rate=0.0,
                    pretrained_window_sizes=(0, 0), num_classes=2)


def _batch(B=2, N=6, T=16, Tn=8, seed=0):
    rng = np.random.RandomState(seed)
    mask = np.ones((B, N), np.float32)
    adj = np.zeros((B, N, N), bool)
    for i in range(N):
        adj[:, i, i] = True
        if i + 1 < N:
            adj[:, i, i + 1] = True
    return {
        "func_ids": rng.randint(2, 200, (B, T)).astype(np.int32),
        "node_ids": rng.randint(2, 200, (B, N, Tn)).astype(np.int32),
        "image": rng.randn(B, 32, 32, 3).astype(np.float32),
        "pos": rng.rand(B, N, 4).astype(np.float32),
        "adj": adj,
        "node_mask": mask,
        "label": rng.randint(0, 2, B).astype(np.int32),
    }


def test_e2e_gradients_reach_all_encoders():
    model = EndToEndMVulD(TEXT, SWIN, hidden=64, num_rs_gcn=1, num_hidden=1)
    b = _batch()
    args = {k: jnp.asarray(v) for k, v in b.items() if k != "label"}
    variables = model.init(jax.random.PRNGKey(0), **args, train=False)
    logits = model.apply(variables, **args, train=False)
    assert logits.shape == (2, 2)

    def loss_fn(params):
        out, _ = model.apply({"params": params,
                              "batch_stats": variables.get("batch_stats", {})},
                             **args, train=True,
                             rngs={"dropout": jax.random.PRNGKey(1)},
                             mutable=["batch_stats"])
        onehot = jax.nn.one_hot(jnp.asarray(b["label"]), 2)
        return optax.softmax_cross_entropy(out, onehot).mean()

    grads = jax.grad(loss_fn)(variables["params"])
    gnorm = jax.tree_util.tree_map(lambda g: float(jnp.abs(g).sum()), grads)
    # gradients flow into every encoder tower
    assert sum(jax.tree_util.tree_leaves(gnorm["text_encoder"])) > 0
    assert sum(jax.tree_util.tree_leaves(gnorm["swin"])) > 0
    assert sum(jax.tree_util.tree_leaves(gnorm["fusion"])) > 0


def test_e2e_remat_train_grad():
    """Regression: remat=True + train=True must trace (deterministic is a
    STATIC remat arg — flax static_argnums count `self`; the r3 bench's e2e
    stage crashed with TracerBoolConversionError when it was off by one)."""
    model = EndToEndMVulD(TEXT, SWIN, hidden=64, num_rs_gcn=1, num_hidden=1,
                          remat=True)
    b = _batch()
    args = {k: jnp.asarray(v) for k, v in b.items() if k != "label"}
    variables = jax.eval_shape(
        lambda k: model.init(k, **args, train=False), jax.random.PRNGKey(0))
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            **args, train=True, rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"])
        onehot = jax.nn.one_hot(jnp.asarray(b["label"]), 2)
        return optax.softmax_cross_entropy(out, onehot).mean()

    grads = jax.grad(loss_fn)(variables["params"])
    assert sum(jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda g: float(jnp.abs(g).sum()),
                               grads["text_encoder"]))) >= 0


def test_e2e_node_packing_parity():
    """Packed per-line encoding (gather valid lines -> encode -> scatter)
    must equal the unpacked path when capacity covers every valid line: the
    per-line computation is batch-independent, so only pad slots (masked to
    zero in both paths) are skipped."""
    b = _batch(B=3, N=6)
    # ragged validity: rows have 2, 6, 4 real lines
    b["node_mask"] = np.zeros((3, 6), np.float32)
    for i, n in enumerate((2, 6, 4)):
        b["node_mask"][i, :n] = 1.0
    b["node_ids"][b["node_mask"] == 0] = 1       # pad id on invalid slots
    args = {k: jnp.asarray(v) for k, v in b.items() if k != "label"}

    ref = EndToEndMVulD(TEXT, SWIN, hidden=64, num_rs_gcn=1, num_hidden=1)
    variables = ref.init(jax.random.PRNGKey(0), **args, train=False)
    want = ref.apply(variables, **args, train=False)

    packed = EndToEndMVulD(TEXT, SWIN, hidden=64, num_rs_gcn=1, num_hidden=1,
                           node_capacity=16)     # 12 valid of 18 slots
    got = packed.apply(variables, **args, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

    # under-capacity: overflow lines are zero-embedded; output stays finite
    # and gradients still reach the text encoder through the packed gather
    tight = EndToEndMVulD(TEXT, SWIN, hidden=64, num_rs_gcn=1, num_hidden=1,
                          node_capacity=8)

    def loss_fn(params):
        out = tight.apply(
            {"params": params,
             "batch_stats": variables.get("batch_stats", {})},
            **args, train=False)
        return (out ** 2).sum()

    grads = jax.grad(loss_fn)(variables["params"])
    gsum = sum(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda g: float(jnp.abs(g).sum()), grads["text_encoder"])))
    assert np.isfinite(gsum) and gsum > 0


def test_e2e_remat_granularity_parity():
    """swin_remat_stages / text_remat change WHERE activations are saved,
    never the math: outputs must match the all-remat model bit-for-policy,
    and gradients must still trace (the knobs ride jax.checkpoint)."""
    b = _batch()
    args = {k: jnp.asarray(v) for k, v in b.items() if k != "label"}
    ref = EndToEndMVulD(TEXT, SWIN, hidden=64, num_rs_gcn=1, num_hidden=1,
                        remat=True)
    variables = ref.init(jax.random.PRNGKey(0), **args, train=False)
    want = ref.apply(variables, **args, train=False)

    sel = EndToEndMVulD(TEXT, SWIN, hidden=64, num_rs_gcn=1, num_hidden=1,
                        remat=True, swin_remat_stages=(1,), text_remat=False)
    got = sel.apply(variables, **args, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

    def loss_fn(params):
        out, _ = sel.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            **args, train=True, rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"])
        return (out ** 2).sum()

    grads = jax.grad(loss_fn)(variables["params"])
    gsum = sum(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda g: float(jnp.abs(g).sum()), grads["text_encoder"])))
    assert np.isfinite(gsum) and gsum > 0


def test_e2e_training_reduces_loss():
    model = EndToEndMVulD(TEXT, SWIN, hidden=64, num_rs_gcn=1, num_hidden=1)
    b = _batch(B=8)
    args = {k: jnp.asarray(v) for k, v in b.items() if k != "label"}
    labels = jnp.asarray(b["label"])
    variables = model.init(jax.random.PRNGKey(0), **args, train=False)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, bstats, opt_state):
        def loss_fn(p):
            out, mut = model.apply({"params": p, "batch_stats": bstats},
                                   **args, train=True,
                                   rngs={"dropout": jax.random.PRNGKey(2)},
                                   mutable=["batch_stats"])
            onehot = jax.nn.one_hot(labels, 2)
            return optax.softmax_cross_entropy(out, onehot).mean(), mut

        (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), mut["batch_stats"], new_opt, loss

    losses = []
    for _ in range(12):
        params, bstats, opt_state, loss = step(params, bstats, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, losses
