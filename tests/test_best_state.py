"""fit() returns the BEST-epoch state via the host-snapshot path.

Regression test for the round-4 e2e OOM fix: the best state is no longer
kept as a device-resident TrainState copy (which doubled HBM for the
220M-param tri-modal model) but snapshotted to host on each best-F1
update and re-materialized only for the final test eval. The observable
contract — the returned state is the state from the best validation
epoch, not the final epoch — must survive that change.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mvuld_tpu.config import default_config
from mvuld_tpu.core.train_state import TrainState
from mvuld_tpu.data.loader import ArrayDataset
from mvuld_tpu.train.harness import fit


def test_fit_returns_best_epoch_state(tmp_path):
    cfg = default_config()
    cfg.DATA.BATCH_SIZE = 8
    cfg.TRAIN.EPOCHS = 3
    cfg.TRAIN.EARLY_STOP_PATIENCE = 10
    cfg.PRINT_FREQ = 1000
    cfg.SAVE_FREQ = 0

    n = 16
    xs = np.zeros((n, 2), np.float32)
    ys = np.arange(n, dtype=np.int32) % 2
    ds = ArrayDataset({"x": xs, "label": ys})

    def train_step(state, batch, rng):
        new = state.replace(step=state.step + 1,
                            params={"w": state.params["w"] + 1.0})
        return new, {"loss": jnp.zeros(())}

    def eval_step(state, batch):
        # perfect F1 while step <= 2 (i.e. after epoch 0), inverted after:
        # the best epoch is 0 and later epochs are strictly worse.
        b = batch["label"].shape[0]
        good = int(state.step) <= 2
        one_hot = np.eye(2, dtype=np.float32)[np.asarray(batch["label"])]
        return jnp.asarray(one_hot if good else 1.0 - one_hot) * 10.0

    state = TrainState.create(
        params={"w": jnp.zeros(())},
        tx=__import__("optax").sgd(0.0))
    res = fit(cfg=cfg, state=state, train_step=train_step,
              eval_step=eval_step, train_ds=ds, val_ds=ds, test_ds=ds,
              output_dir=str(tmp_path), save_best=True)

    assert res["best_epoch"] == 0
    assert res["best_f1"] == 1.0
    # 2 steps/epoch: best snapshot taken after epoch 0 => step 2, w 2.0 —
    # NOT the final-epoch state (step 6, w 6.0)
    assert int(res["state"].step) == 2
    assert float(res["state"].params["w"]) == 2.0
    # the final test eval ran on the re-materialized best state
    assert res["test_metrics"]["f1"] == 1.0


def test_fit_best_save_params_only(tmp_path):
    """TRAIN.BEST_SAVE='params': the snapshot skips optimizer moments (the
    relay-expensive 2/3 of the fetch); the best checkpoint still restores
    (fresh opt_state) and fit() still returns the best-epoch params."""
    import optax

    from mvuld_tpu.core.checkpoint import (resume_bestf1_helper,
                                           restore_train_state)

    cfg = default_config()
    cfg.DATA.BATCH_SIZE = 8
    cfg.TRAIN.EPOCHS = 3
    cfg.TRAIN.EARLY_STOP_PATIENCE = 10
    cfg.TRAIN.BEST_SAVE = "params"
    cfg.PRINT_FREQ = 1000
    cfg.SAVE_FREQ = 0

    n = 16
    ds = ArrayDataset({"x": np.zeros((n, 2), np.float32),
                       "label": np.arange(n, dtype=np.int32) % 2})

    def train_step(state, batch, rng):
        return (state.replace(step=state.step + 1,
                              params={"w": state.params["w"] + 1.0}),
                {"loss": jnp.zeros(())})

    def eval_step(state, batch):
        good = int(state.step) <= 2
        one_hot = np.eye(2, dtype=np.float32)[np.asarray(batch["label"])]
        return jnp.asarray(one_hot if good else 1.0 - one_hot) * 10.0

    # adam has real moments, so the size saving is observable semantics:
    # the restored opt_state must come from the INCOMING state, not disk
    tx = optax.adam(1e-3)
    state = TrainState.create(params={"w": jnp.zeros(())}, tx=tx)
    res = fit(cfg=cfg, state=state, train_step=train_step,
              eval_step=eval_step, train_ds=ds, val_ds=ds, test_ds=ds,
              output_dir=str(tmp_path), save_best=True)

    assert float(res["state"].params["w"]) == 2.0
    assert res["test_metrics"]["f1"] == 1.0

    path = resume_bestf1_helper(str(tmp_path))
    fresh = TrainState.create(params={"w": jnp.full((), -1.0)}, tx=tx)
    restored, meta = restore_train_state(path, fresh, with_meta=True)
    assert float(restored.params["w"]) == 2.0
    assert meta["epoch"] == 0
    # opt_state kept from the incoming (fresh) state — not on disk
    a = jax.tree_util.tree_leaves(restored.opt_state)
    b = jax.tree_util.tree_leaves(fresh.opt_state)
    assert all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(a, b))


def test_fit_best_fetch_async(tmp_path):
    """TRAIN.BEST_FETCH='async': improvements only START the D2H snapshot
    copy; the blocking fetch + best-checkpoint write happen lazily (an
    in-flight snapshot is replaced by the next improvement, the last one
    finalized after the loop). Observable contract must match the sync
    path exactly: best-epoch state returned, best checkpoint on disk."""
    from mvuld_tpu.core.checkpoint import (resume_bestf1_helper,
                                           restore_train_state)

    cfg = default_config()
    cfg.DATA.BATCH_SIZE = 8
    cfg.TRAIN.EPOCHS = 4
    cfg.TRAIN.EARLY_STOP_PATIENCE = 10
    cfg.TRAIN.BEST_FETCH = "async"
    cfg.TRAIN.BEST_SAVE = "params"
    cfg.PRINT_FREQ = 1000
    cfg.SAVE_FREQ = 0

    n = 16
    ds = ArrayDataset({"x": np.zeros((n, 2), np.float32),
                       "label": np.arange(n, dtype=np.int32) % 2})

    def train_step(state, batch, rng):
        return (state.replace(step=state.step + 1,
                              params={"w": state.params["w"] + 1.0}),
                {"loss": jnp.zeros(())})

    def eval_step(state, batch):
        # improves at epochs 0 AND 1 (two pending-snapshot replacements),
        # degrades after: the async path must keep the epoch-1 snapshot
        s = int(state.step)
        f1_by_step = {2: 0.5, 4: 1.0}
        good = f1_by_step.get(s, 0.0)
        one_hot = np.eye(2, dtype=np.float32)[np.asarray(batch["label"])]
        mix = good * one_hot + (1.0 - good) * (1.0 - one_hot)
        return jnp.asarray(mix) * 10.0

    state = TrainState.create(
        params={"w": jnp.zeros(())},
        tx=__import__("optax").sgd(0.0))
    res = fit(cfg=cfg, state=state, train_step=train_step,
              eval_step=eval_step, train_ds=ds, val_ds=ds, test_ds=ds,
              output_dir=str(tmp_path), save_best=True)

    assert res["best_epoch"] == 1
    # 2 steps/epoch: the epoch-1 improvement snapshot => step 4, w 4.0
    assert int(res["state"].step) == 4
    assert float(res["state"].params["w"]) == 4.0
    # the lazily-written best checkpoint restores to the same state
    path = resume_bestf1_helper(str(tmp_path))
    fresh = TrainState.create(params={"w": jnp.full((), -1.0)},
                              tx=__import__("optax").sgd(0.0))
    restored, meta = restore_train_state(path, fresh, with_meta=True)
    assert float(restored.params["w"]) == 4.0
    assert meta["epoch"] == 1
