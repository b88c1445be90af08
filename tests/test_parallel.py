import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvuld_tpu.config import default_config
from mvuld_tpu.core.optim import build_optimizer, decay_mask
from mvuld_tpu.core.schedule import build_schedule, scale_lr
from mvuld_tpu.core.train_state import (EarlyStopper, TrainState,
                                        cross_entropy, make_eval_step,
                                        make_train_step)
from mvuld_tpu.parallel.mesh import make_mesh, replicate, shard_batch


def test_mesh_8_devices():
    mesh = make_mesh(dp=8)
    assert mesh.devices.shape == (8, 1)
    mesh2 = make_mesh(dp=4, mp=2)
    assert mesh2.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        make_mesh(dp=16, mp=2)


def test_lr_scaling_rule():
    # reference: LR scaled by global batch / 512 (main.py:486-493)
    assert scale_lr(5e-5, 512) == 5e-5
    assert scale_lr(5e-5, 4) == pytest.approx(5e-5 * 4 / 512)


def test_schedule_shapes():
    cfg = default_config()
    cfg.TRAIN.EPOCHS = 10
    cfg.TRAIN.WARMUP_EPOCHS = 2
    sched = build_schedule(cfg, steps_per_epoch=100, global_batch=512)
    lr0 = float(sched(0))
    lr_peak = float(sched(200))
    lr_end = float(sched(999))
    assert lr0 == pytest.approx(cfg.TRAIN.WARMUP_LR, rel=1e-3)
    assert lr_peak == pytest.approx(cfg.TRAIN.BASE_LR, rel=1e-3)
    assert lr_end < lr_peak
    assert lr_end >= float(cfg.TRAIN.MIN_LR) * 0.9


def test_decay_mask_skips_norms_and_biases():
    params = {
        "dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones((4,))},
        "norm1": {"scale": jnp.ones((4,)), "bias": jnp.ones((4,))},
        "attn": {"logit_scale": jnp.ones((2, 1, 1)),
                 "cpb_fc1": {"kernel": jnp.ones((2, 512))}},
        "embed": {"embedding": jnp.ones((10, 4))},
    }
    mask = decay_mask(params)
    assert mask["dense"]["kernel"] is True
    assert mask["dense"]["bias"] is False
    assert mask["norm1"]["scale"] is False
    assert mask["attn"]["logit_scale"] is False
    assert mask["attn"]["cpb_fc1"]["kernel"] is False
    assert mask["embed"]["embedding"] is False


def test_cross_entropy_label_smoothing():
    logits = jnp.array([[10.0, -10.0]])
    labels = jnp.array([0])
    plain = float(cross_entropy(logits, labels, 0.0))
    smooth = float(cross_entropy(logits, labels, 0.1))
    assert plain < 1e-6
    assert smooth > plain


def test_early_stopper():
    es = EarlyStopper(patience=2)
    assert es.update(0.5, 0) and not es.should_stop
    assert not es.update(0.4, 1)
    assert not es.update(0.3, 2) and es.should_stop
    assert es.best == 0.5 and es.best_epoch == 0


def test_sharded_train_step_runs_and_learns():
    """Data-parallel train step over the 8-device CPU mesh: loss decreases on
    a learnable toy problem, batch sharded over dp."""
    import flax.linen as nn

    class Toy(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(16)(x)
            x = nn.relu(x)
            return nn.Dense(2)(x)

    cfg = default_config()
    cfg.TRAIN.BASE_LR = 1e-2
    cfg.TRAIN.WARMUP_LR = 1e-2
    cfg.TRAIN.MIN_LR = 1e-3
    cfg.TRAIN.WARMUP_EPOCHS = 0
    cfg.TRAIN.EPOCHS = 1

    model = Toy()
    rng = jax.random.PRNGKey(0)
    B = 32
    w_true = np.random.RandomState(0).randn(8)
    xs = np.random.RandomState(1).randn(B, 8).astype(np.float32)
    ys = (xs @ w_true > 0).astype(np.int32)

    variables = model.init(rng, jnp.zeros((1, 8)))
    sched = build_schedule(cfg, steps_per_epoch=100, global_batch=512)
    tx = build_optimizer(cfg, sched)
    state = TrainState.create(variables["params"], tx)

    def apply_fn(vs, batch, rngs, train, mutable=None):
        return model.apply(vs, batch["x"])

    train_step = make_train_step(apply_fn, tx, label_smoothing=0.0,
                                 donate=False)
    eval_step = make_eval_step(apply_fn)

    mesh = make_mesh(dp=8)
    with mesh:
        state = replicate(mesh, state)
        batch = shard_batch(mesh, {"x": xs, "label": ys})
        losses = []
        for _ in range(30):
            state, metrics = train_step(state, batch, rng)
            losses.append(float(metrics["loss"]))
        logits = eval_step(state, batch)
    assert losses[-1] < losses[0] * 0.7, losses[:3] + losses[-3:]
    acc = float((np.asarray(logits).argmax(-1) == ys).mean())
    assert acc > 0.8
    assert int(state.step) == 30


def test_grad_accumulation_equivalence():
    """ACCUMULATION_STEPS=2 applies the averaged update every 2 micro-steps."""
    import flax.linen as nn

    class Lin(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(2, use_bias=False)(x)

    cfg = default_config()
    cfg.TRAIN.BASE_LR = 1e-2
    cfg.TRAIN.WARMUP_EPOCHS = 0
    cfg.TRAIN.ACCUMULATION_STEPS = 2
    model = Lin()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    sched = lambda step: 1e-2
    tx = build_optimizer(cfg, sched)
    state = TrainState.create(variables["params"], tx)

    def apply_fn(vs, batch, rngs, train, mutable=None):
        return model.apply(vs, batch["x"])

    step = make_train_step(apply_fn, tx, label_smoothing=0.0, donate=False)
    rng = jax.random.PRNGKey(0)
    xs = np.random.RandomState(0).randn(4, 4).astype(np.float32)
    ys = np.array([0, 1, 0, 1], np.int32)
    p0 = state.params["Dense_0"]["kernel"]
    state, _ = step(state, {"x": jnp.asarray(xs), "label": jnp.asarray(ys)}, rng)
    p1 = state.params["Dense_0"]["kernel"]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))  # buffered
    state, _ = step(state, {"x": jnp.asarray(xs), "label": jnp.asarray(ys)}, rng)
    p2 = state.params["Dense_0"]["kernel"]
    assert np.abs(np.asarray(p2) - np.asarray(p0)).max() > 0     # applied


def test_checkpoint_resume_roundtrip(tmp_path):
    """Save best checkpoint (incl. optimizer), restore, continue training —
    the reference's resume semantics (utils.py:143-211)."""
    import flax.linen as nn

    from mvuld_tpu.core.checkpoint import (resume_bestf1_helper, save_checkpoint,
                                           restore_train_state)

    class Toy(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(2)(x)

    cfg = default_config()
    model = Toy()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    tx = build_optimizer(cfg, lambda s: 1e-2)
    state = TrainState.create(variables["params"], tx)

    def apply_fn(vs, batch, rngs, train, mutable=None):
        return model.apply(vs, batch["x"])

    step = make_train_step(apply_fn, tx, label_smoothing=0.0, donate=False)
    rng = jax.random.PRNGKey(0)
    xs = np.random.RandomState(0).randn(8, 4).astype(np.float32)
    ys = np.random.RandomState(1).randint(0, 2, 8).astype(np.int32)
    batch = {"x": jnp.asarray(xs), "label": jnp.asarray(ys)}
    for _ in range(3):
        state, _ = step(state, batch, rng)

    save_checkpoint(str(tmp_path), 0,
                    {"params": jax.device_get(state.params),
                     "opt_state": jax.device_get(state.opt_state),
                     "batch_stats": None, "step": int(state.step),
                     "epoch": 0, "best_f1": 0.5}, best=True)
    found = resume_bestf1_helper(str(tmp_path))
    assert found is not None

    fresh = TrainState.create(variables["params"], tx)
    restored = restore_train_state(found, fresh)
    assert int(restored.step) == 3
    pa = jax.tree_util.tree_leaves(state.params)
    pb = jax.tree_util.tree_leaves(restored.params)
    for a, b in zip(pa, pb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    # training continues identically from the restored state
    s1, m1 = step(state, batch, rng)
    s2, m2 = step(restored, batch, rng)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), atol=1e-6)
