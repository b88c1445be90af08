"""Fused multi-step training (lax.scan over optimizer steps)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvuld_tpu.config import default_config
from mvuld_tpu.core.optim import build_optimizer
from mvuld_tpu.core.schedule import build_schedule
from mvuld_tpu.core.train_state import (TrainState, make_eval_step,
                                        make_multi_train_step, make_train_step)


def _setup():
    import flax.linen as nn

    class Toy(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(2)(nn.relu(nn.Dense(8)(x)))

    cfg = default_config()
    cfg.TRAIN.BASE_LR = 1e-2
    cfg.TRAIN.WARMUP_LR = 1e-2
    cfg.TRAIN.MIN_LR = 1e-2
    cfg.TRAIN.WARMUP_EPOCHS = 0
    model = Toy()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    sched = lambda s: 1e-2
    tx = build_optimizer(cfg, sched)

    def apply_fn(vs, batch, rngs, train, mutable=None):
        return model.apply(vs, batch["x"])

    return model, variables, tx, apply_fn


def test_multi_step_equals_sequential_steps():
    model, variables, tx, apply_fn = _setup()
    rng = jax.random.PRNGKey(3)
    K, B = 4, 8
    data = np.random.RandomState(0)
    xs = data.randn(K, B, 4).astype(np.float32)
    ys = data.randint(0, 2, (K, B)).astype(np.int32)

    single = make_train_step(apply_fn, tx, label_smoothing=0.0, donate=False)
    state_a = TrainState.create(variables["params"], tx)
    for k in range(K):
        state_a, m = single(state_a, {"x": jnp.asarray(xs[k]),
                                      "label": jnp.asarray(ys[k])}, rng)

    multi = make_multi_train_step(apply_fn, tx, num_steps=K,
                                  label_smoothing=0.0, donate=False)
    state_b = TrainState.create(variables["params"], tx)
    state_b, metrics = multi(state_b, {"x": jnp.asarray(xs),
                                       "label": jnp.asarray(ys)}, rng)

    assert int(state_b.step) == K
    assert metrics["loss"].shape == (K,)
    # identical parameter trajectory
    pa = jax.tree_util.tree_leaves(state_a.params)
    pb = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(pa, pb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # per-step losses are distinct real work
    losses = np.asarray(metrics["loss"])
    assert len(set(np.round(losses, 6).tolist())) > 1


def test_fit_with_fused_steps_matches_unfused():
    """fit() with fused_steps produces the same val metrics as per-batch."""
    import flax.linen as nn

    from mvuld_tpu.data.loader import ArrayDataset
    from mvuld_tpu.train.harness import fit

    class Toy(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(2)(nn.relu(nn.Dense(8)(x)))

    cfg = default_config()
    cfg.DATA.BATCH_SIZE = 8
    cfg.TRAIN.EPOCHS = 2
    cfg.TRAIN.WARMUP_EPOCHS = 0
    cfg.TRAIN.EARLY_STOP_PATIENCE = 10
    cfg.PRINT_FREQ = 1000

    rngd = np.random.RandomState(0)
    w = rngd.randn(4)
    xs = rngd.randn(64, 4).astype(np.float32)
    ys = (xs @ w > 0).astype(np.int32)
    ds = ArrayDataset({"x": xs, "label": ys})

    model = Toy()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    sched = lambda s: 1e-2
    tx = build_optimizer(cfg, sched)

    def apply_fn(vs, batch, rngs, train, mutable=None):
        return model.apply(vs, batch["x"])

    step = make_train_step(apply_fn, tx, label_smoothing=0.0, donate=False)
    multi = make_multi_train_step(apply_fn, tx, num_steps=2,
                                  label_smoothing=0.0, donate=False)

    eval_step = make_eval_step(apply_fn)
    res_a = fit(cfg=cfg, state=TrainState.create(variables["params"], tx),
                train_step=step, eval_step=eval_step,
                train_ds=ds, val_ds=ds, save_best=False)
    res_b = fit(cfg=cfg, state=TrainState.create(variables["params"], tx),
                train_step=step, eval_step=eval_step,
                train_ds=ds, val_ds=ds, save_best=False,
                multi_step=multi, fused_steps=2)
    assert int(res_a["state"].step) == int(res_b["state"].step)
    pa = jax.tree_util.tree_leaves(res_a["state"].params)
    pb = jax.tree_util.tree_leaves(res_b["state"].params)
    for a, b in zip(pa, pb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_indexed_steps_match_direct_batches():
    """indexed=True (TRAIN.DEVICE_DATA): steps fed int32 index batches that
    gather rows from a device-resident column dict must produce the exact
    parameter trajectory of the direct-batch steps."""
    model, variables, tx, apply_fn = _setup()
    rng = jax.random.PRNGKey(3)
    K, B, N = 4, 8, 64
    rs = np.random.RandomState(1)
    data = {"x": jnp.asarray(rs.randn(N, 4).astype(np.float32)),
            "label": jnp.asarray(rs.randint(0, 2, N).astype(np.int32))}
    idx = rs.permutation(N)[: K * B].astype(np.int32).reshape(K, B)

    direct = make_train_step(apply_fn, tx, label_smoothing=0.0, donate=False)
    state_a = TrainState.create(variables["params"], tx)
    for k in range(K):
        state_a, _ = direct(state_a, {"x": data["x"][idx[k]],
                                      "label": data["label"][idx[k]]}, rng)

    single_i = make_train_step(apply_fn, tx, label_smoothing=0.0,
                               donate=False, indexed=True)
    state_b = TrainState.create(variables["params"], tx)
    for k in range(K):
        state_b, m = single_i(state_b, {"idx": jnp.asarray(idx[k])}, rng,
                              data)
    assert np.isfinite(float(m["loss"]))

    multi_i = make_multi_train_step(apply_fn, tx, num_steps=K,
                                    label_smoothing=0.0, donate=False,
                                    indexed=True)
    state_c = TrainState.create(variables["params"], tx)
    state_c, metrics = multi_i(state_c, {"idx": jnp.asarray(idx)}, rng, data)
    assert int(state_c.step) == K and metrics["loss"].shape == (K,)

    pa = jax.tree_util.tree_leaves(state_a.params)
    for sb in (state_b, state_c):
        for a, b in zip(pa, jax.tree_util.tree_leaves(sb.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)
