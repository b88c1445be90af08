"""Shared training harness: epoch loop, validation, best-F1 checkpointing.

The TPU equivalent of the reference's outer loops (mvuld/main.py:204-241,
main_bigvul.py:231-283): per-epoch train pass, validation with full-metric
suite (F1@0.5, PR-AUC, ROC-AUC), best-F1 checkpoint + early stop, periodic
logging with images/sec. One process drives the whole mesh.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax
import numpy as np

from mvuld_tpu.core.checkpoint import (restore_train_state, resume_ladder,
                                       save_checkpoint)
from mvuld_tpu.core.logger import AverageMeter, WindowRate, create_logger
from mvuld_tpu.core.metrics import format_metrics, get_metrics_logits
from mvuld_tpu.core.train_state import EarlyStopper, TrainState
from mvuld_tpu.data.loader import ArrayDataset, eval_batches, train_batches
from mvuld_tpu.parallel.mesh import shard_batch, shard_superbatch


def run_eval(eval_step: Callable, state: TrainState, ds: ArrayDataset,
             batch_size: int, mesh=None, device_data=None) -> Dict[str, float]:
    """Gather logits over the eval set (padded final batch masked out) and
    compute the canonical metric suite on host.

    With ``device_data`` (TRAIN.DEVICE_EVAL) the split's feature columns
    live in HBM, ``ds`` carries only int32 "idx" + host "label" columns,
    ``eval_step`` must be built with ``indexed=True``, and each eval batch
    ships only its index vector."""
    all_logits, all_labels = [], []
    for batch in eval_batches(ds, batch_size):
        valid = batch.pop("_valid")
        labels = batch["label"]
        if device_data is not None:
            b = {"idx": batch["idx"]}
            b = shard_batch(mesh, b) if mesh is not None else b
            logits = np.asarray(eval_step(state, b, device_data))
        else:
            b = shard_batch(mesh, batch) if mesh is not None else batch
            logits = np.asarray(eval_step(state, b))
        keep = valid > 0
        all_logits.append(logits[keep])
        all_labels.append(np.asarray(labels)[keep])
    logits = np.concatenate(all_logits)
    labels = np.concatenate(all_labels)
    return get_metrics_logits(labels, logits)


def fit(*, cfg, state: TrainState, train_step: Callable, eval_step: Callable,
        train_ds: ArrayDataset, val_ds: ArrayDataset,
        test_ds: Optional[ArrayDataset] = None, mesh=None,
        batch_hook: Optional[Callable] = None, output_dir: str = "",
        patience: Optional[int] = None, logger=None,
        save_best: bool = True, multi_step: Optional[Callable] = None,
        fused_steps: int = 1, device_data: Optional[Dict] = None,
        eval_device_data: Optional[Dict] = None) -> Dict:
    """Run the full training loop; returns {state, best, val/test metrics}.

    With ``multi_step`` (from make_multi_train_step) and ``fused_steps`` > 1,
    K host batches are stacked into a superbatch and trained in ONE device
    dispatch — essential when per-dispatch latency is high (remote TPU,
    multi-host). Falls back to per-batch stepping for epoch remainders.

    With ``device_data`` (TRAIN.DEVICE_DATA): the train split lives on
    device as a column dict, ``train_ds`` holds only an int32 "idx" column,
    and the steps (built with ``indexed=True``) gather rows on device —
    per-step host→device traffic drops to the index vector.

    With ``eval_device_data`` (TRAIN.DEVICE_EVAL): a ``{"val": cols,
    "test": cols}`` dict of device-resident eval columns; ``val_ds`` /
    ``test_ds`` carry only "idx" + "label", and ``eval_step`` must be
    built with ``indexed=True`` — it must cover every split evaluated.
    """
    import numpy as np

    if device_data is not None and batch_hook is not None:
        raise ValueError("device_data mode ships index batches; batch_hook "
                         "(host-side augmentation) cannot apply — disable "
                         "one of them")

    logger = logger or create_logger(output_dir)
    if output_dir:
        # dump the resolved config next to the checkpoints (reference rank-0
        # config.json dump, mvuld/main.py:504-508); train.predict rebuilds
        # the run's exact model dims from it
        from mvuld_tpu.config import save_config
        save_config(cfg, output_dir)
    batch_size = cfg.DATA.BATCH_SIZE
    rng = jax.random.PRNGKey(cfg.SEED)
    stopper = EarlyStopper(patience=patience or cfg.TRAIN.EARLY_STOP_PATIENCE)
    # Best state is snapshotted to HOST memory, not kept device-resident:
    # a second on-device TrainState copy (params + optimizer moments) is
    # what OOMed the e2e production run — ~2.6 GB extra HBM for the
    # 220M-param tri-modal model. None means "fall back to final state".
    best_host = None
    # TRAIN.BEST_FETCH="async": an improvement only STARTS the D2H copy
    # (copy_to_host_async) and stashes device refs; the transfer overlaps
    # the next epoch's compute and the blocking device_get + best-
    # checkpoint write happen lazily — at the next improvement (which
    # replaces it) or after the loop. Holds one extra device-resident copy
    # of the snapshot leaves until replaced (params-only under
    # BEST_SAVE="params"), so it trades HBM headroom for epoch wall time.
    best_fetch_async = getattr(cfg.TRAIN, "BEST_FETCH", "sync") == "async"
    best_save_full = getattr(cfg.TRAIN, "BEST_SAVE", "full") != "params"
    pending_best = None            # (snapshot-leaves dict, epoch, f1)
    history = []

    def _start_async_snapshot(state):
        keep = {"params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state if best_save_full else None,
                "step": int(state.step)}
        for leaf in jax.tree_util.tree_leaves(keep):
            if hasattr(leaf, "copy_to_host_async"):
                leaf.copy_to_host_async()
        return keep

    def _finish_snapshot(keep):
        return {"params": jax.device_get(keep["params"]),
                "opt_state": (jax.device_get(keep["opt_state"])
                              if keep["opt_state"] is not None else None),
                "batch_stats": jax.device_get(keep["batch_stats"]),
                "step": keep["step"]}

    # Resume ladder (reference: MODEL.RESUME > BEST_RESUME > AUTO_RESUME,
    # mvuld/main.py:147-191): restore full state + epoch counter + best F1
    # so an interrupted run continues instead of restarting from scratch.
    start_epoch = cfg.TRAIN.START_EPOCH
    resume_path = (resume_ladder(output_dir, cfg.MODEL.RESUME,
                                 cfg.TRAIN.BEST_RESUME, cfg.TRAIN.AUTO_RESUME)
                   if output_dir else None)
    if resume_path:
        state, meta = restore_train_state(resume_path, state, with_meta=True)
        if mesh is not None:
            from mvuld_tpu.parallel.mesh import replicate
            state = replicate(mesh, state)
        if meta["epoch"] >= 0:
            start_epoch = max(start_epoch, meta["epoch"] + 1)
        if meta["best_f1"] > float("-inf"):
            stopper.best = meta["best_f1"]
            stopper.best_epoch = meta["epoch"]
        logger.info(f"resumed from {resume_path}: epoch {meta['epoch']}, "
                    f"best_f1 {meta['best_f1']:.4f}")

    use_fused = multi_step is not None and fused_steps > 1

    def host_stream(epoch: int):
        """Yield (is_multi, device-ready batch, first_it, n_samples).
        Runs inside the Prefetcher thread: augmentation (batch_hook),
        superbatch stacking and device_put all overlap device compute."""
        pending = []
        it = -1
        for raw in train_batches(train_ds, batch_size, epoch, cfg.SEED):
            it += 1
            batch = batch_hook(raw, epoch, it) if batch_hook else raw
            if use_fused:
                pending.append(batch)
                if len(pending) < fused_steps:
                    continue
                superbatch = {k: np.stack([p[k] for p in pending])
                              for k in pending[0]}
                pending = []
                # batch axis is axis 1 of the [K, B, ...] superbatch
                b = (shard_superbatch(mesh, superbatch)
                     if mesh is not None else superbatch)
                yield True, b, it - fused_steps + 1, fused_steps * batch_size
            else:
                b = shard_batch(mesh, batch) if mesh is not None else batch
                yield False, b, it, batch_size
        # epoch remainder that didn't fill a superbatch: per-batch steps
        for batch in pending:
            b = shard_batch(mesh, batch) if mesh is not None else batch
            yield False, b, it, batch_size

    for epoch in range(start_epoch, cfg.TRAIN.EPOCHS):
        t_epoch = time.time()
        loss_meter, speed_meter = AverageMeter(), WindowRate()
        from mvuld_tpu.data.loader import Prefetcher
        for is_multi, b, it, n_done in Prefetcher(host_stream(epoch), depth=2):
            if is_multi:
                state, metrics = (multi_step(state, b, rng, device_data)
                                  if device_data is not None
                                  else multi_step(state, b, rng))
                step_loss = metrics["loss"][-1]
            else:
                state, metrics = (train_step(state, b, rng, device_data)
                                  if device_data is not None
                                  else train_step(state, b, rng))
                step_loss = metrics["loss"]
            speed_meter.add(n_done)
            if it % cfg.PRINT_FREQ < (fused_steps if use_fused else 1):
                loss = float(step_loss)         # forces sync — only on print
                loss_meter.update(loss, n_done)
                logger.info(
                    f"epoch {epoch} it {it}: loss {loss:.4f} "
                    f"({speed_meter.read():.1f} samples/s)")

        val_metrics = run_eval(eval_step, state, val_ds, batch_size, mesh,
                               (eval_device_data or {}).get("val"))
        history.append({"epoch": epoch, **val_metrics})
        logger.info(f"epoch {epoch} VAL  {format_metrics(val_metrics)} "
                    f"({time.time() - t_epoch:.1f}s)")

        if stopper.update(val_metrics["f1"], epoch):
            if best_fetch_async:
                # replace any in-flight snapshot — only the LAST best
                # matters; its device refs drop here and free the HBM copy
                pending_best = (_start_async_snapshot(state), epoch,
                                val_metrics["f1"])
            else:
                # TRAIN.BEST_SAVE="params" skips the optimizer moments —
                # the dominant 2/3 of the host fetch over the TPU relay;
                # the best checkpoint then restores with fresh opt_state
                # (restore_train_state keeps unknown fields from the
                # incoming state), which only matters for resume-from-best,
                # not eval.
                best_host = _finish_snapshot(_start_async_snapshot(state))
                if save_best and output_dir:
                    # full state incl. optimizer (the reference saves model+
                    # optimizer+scheduler+epoch+best metric, utils.py:143-176)
                    save_checkpoint(output_dir, epoch,
                                    {**best_host,
                                     "epoch": epoch,
                                     "best_f1": val_metrics["f1"]},
                                    best=True)
        # periodic epoch checkpoint for AUTO_RESUME (reference: SAVE_FREQ,
        # save_checkpoint main.py:237-241) — full state so a killed run can
        # continue with its optimizer moments and epoch counter intact
        if output_dir and cfg.SAVE_FREQ > 0 and (
                epoch % cfg.SAVE_FREQ == 0 or epoch == cfg.TRAIN.EPOCHS - 1):
            save_checkpoint(output_dir, epoch,
                            {"params": jax.device_get(state.params),
                             "opt_state": jax.device_get(state.opt_state),
                             "batch_stats": jax.device_get(state.batch_stats),
                             "step": int(state.step),
                             "epoch": epoch,
                             "best_f1": stopper.best}, best=False)
        if stopper.should_stop:
            logger.info(f"early stop at epoch {epoch} "
                        f"(best f1 {stopper.best:.4f} @ {stopper.best_epoch})")
            break

    # Finalize a still-pending async best snapshot: complete the (already
    # overlapped) D2H and write the best checkpoint the sync path would
    # have written at improvement time.
    if pending_best is not None:
        keep, best_epoch, best_f1 = pending_best
        best_host = _finish_snapshot(keep)
        pending_best = None
        if save_best and output_dir:
            save_checkpoint(output_dir, best_epoch,
                            {**best_host, "epoch": best_epoch,
                             "best_f1": best_f1}, best=True)

    # Materialize the best state for the final test eval / caller. The
    # training state's device buffers are released first (its leaves are
    # swapped for host arrays), so peak HBM stays at one TrainState copy.
    if best_host is not None:
        state = state.replace(params=best_host["params"],
                              batch_stats=best_host["batch_stats"],
                              step=np.asarray(best_host["step"], np.int32),
                              **({"opt_state": best_host["opt_state"]}
                                 if best_host["opt_state"] is not None else {}))
        if mesh is not None:
            from mvuld_tpu.parallel.mesh import replicate
            state = replicate(mesh, state)
    best_state = state

    out = {"state": best_state, "best_f1": stopper.best,
           "best_epoch": stopper.best_epoch, "history": history}
    if test_ds is not None:
        test_metrics = run_eval(eval_step, best_state, test_ds, batch_size,
                                mesh, (eval_device_data or {}).get("test"))
        logger.info(f"TEST {format_metrics(test_metrics)}")
        out["test_metrics"] = test_metrics
    if output_dir:
        # persist the metric history (the reference's LogWriter pickle/TB
        # equivalent, baselines/utils/my_log.py:67-191)
        import json
        import os
        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, "history.json"), "w") as f:
            json.dump({"history": history, "best_f1": stopper.best,
                       "best_epoch": stopper.best_epoch,
                       "test_metrics": out.get("test_metrics")}, f, indent=1)
    return out
