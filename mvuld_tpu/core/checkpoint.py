"""Checkpoint save/load with the reference's resume ladder.

Replicates mvuld/utils.py:143-211 / utils_multi.py semantics on orbax:

  * epoch checkpoints ``ckpt_epoch_{n}`` with full state
    {params, opt_state, batch_stats, epoch, max_f1, config-dump},
  * best-F1 checkpoints under ``checkpoint-best-f1/`` (the fusion trainer also
    keeps bare weights — we store params-only alongside full state),
  * ``auto_resume_helper``: newest epoch checkpoint by mtime (utils.py:201-211),
  * ``resume_bestf1_helper``: newest best-f1 checkpoint by mtime (186-199).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp


def _ckptr() -> ocp.PyTreeCheckpointer:
    return ocp.PyTreeCheckpointer()


def save_checkpoint(output_dir: str, epoch: int, state_tree: Dict,
                    best: bool = False) -> str:
    """state_tree: any pytree (params/opt_state/batch_stats/scalars)."""
    sub = "checkpoint-best-f1" if best else "checkpoints"
    name = f"ckpt_epoch_{epoch}" if not best else f"best_f1_epoch_{epoch}"
    path = os.path.abspath(os.path.join(output_dir, sub, name))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    _ckptr().save(path, state_tree, force=True)
    return path


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    restore_args = None
    if target is not None:
        restore_args = ocp.args.PyTreeRestore  # noqa: F841 (doc pointer)
        return _ckptr().restore(os.path.abspath(path), item=target)
    return _ckptr().restore(os.path.abspath(path))


def _newest(dirpath: str, prefix: str) -> Optional[str]:
    if not os.path.isdir(dirpath):
        return None
    cands = [os.path.join(dirpath, d) for d in os.listdir(dirpath)
             if d.startswith(prefix)]
    cands = [c for c in cands if os.path.isdir(c)]
    if not cands:
        return None
    return max(cands, key=os.path.getmtime)


def auto_resume_helper(output_dir: str) -> Optional[str]:
    """Newest epoch checkpoint by mtime (reference: utils.py:201-211)."""
    return _newest(os.path.join(output_dir, "checkpoints"), "ckpt_epoch_")


def resume_bestf1_helper(output_dir: str) -> Optional[str]:
    """Newest best-f1 checkpoint by mtime (reference: utils.py:186-199)."""
    return _newest(os.path.join(output_dir, "checkpoint-best-f1"),
                   "best_f1_epoch_")


def resume_ladder(output_dir: str, model_resume: str = "",
                  best_resume: bool = True, auto_resume: bool = False
                  ) -> Optional[str]:
    """The reference's resume priority (main.py:147-191): explicit
    MODEL.RESUME > BEST_RESUME > AUTO_RESUME."""
    if model_resume:
        return model_resume
    if best_resume:
        found = resume_bestf1_helper(output_dir)
        if found:
            return found
    if auto_resume:
        return auto_resume_helper(output_dir)
    return None


def _rebuild_like(target, restored):
    """Map an orbax-restored raw tree (nested dicts/lists) back onto
    ``target``'s structure by NAME — namedtuple fields (optax states) are
    matched by field name, never by flattened leaf order. Leaf-order
    matching silently permutes optax.MultiSteps state (its fields are not
    alphabetical), breaking resume with ACCUMULATION_STEPS>1."""
    import jax.numpy as jnp
    if target is None:
        return None
    if isinstance(target, dict):
        return {k: _rebuild_like(v, restored[k]) for k, v in target.items()}
    if hasattr(target, "_fields"):            # namedtuple (optax states)
        vals = [_rebuild_like(getattr(target, f), restored[f])
                for f in target._fields]
        return type(target)(*vals)
    if isinstance(target, (list, tuple)):
        if isinstance(restored, dict):        # orbax may key tuples "0","1",…
            items = [restored[str(i)] for i in range(len(target))]
        else:
            items = list(restored)
        rebuilt = [_rebuild_like(t, r) for t, r in zip(target, items)]
        return type(target)(rebuilt) if isinstance(target, tuple) else rebuilt
    return jnp.asarray(restored)


def restore_train_state(path: str, state, with_meta: bool = False):
    """Restore a TrainState saved by the harness; unknown fields are kept
    from the incoming state (e.g. when only bare params were saved).
    With ``with_meta``, also returns {"epoch", "best_f1"} scalars so the
    trainers can resume the epoch counter and EarlyStopper (the reference
    restores config.TRAIN.START_EPOCH = epoch+1 and max_f1, utils.py:143-176)."""
    import jax.numpy as jnp
    tree = load_checkpoint(path)
    kwargs = {"params": tree["params"]}
    if tree.get("opt_state") is not None:
        kwargs["opt_state"] = _rebuild_like(state.opt_state, tree["opt_state"])
    if tree.get("batch_stats") is not None:
        kwargs["batch_stats"] = tree["batch_stats"]
    if tree.get("step") is not None:
        kwargs["step"] = jnp.asarray(tree["step"], jnp.int32)
    new_state = state.replace(**kwargs)
    if not with_meta:
        return new_state
    meta = {"epoch": int(tree["epoch"]) if tree.get("epoch") is not None else -1,
            "best_f1": (float(tree["best_f1"])
                        if tree.get("best_f1") is not None else float("-inf"))}
    return new_state, meta
