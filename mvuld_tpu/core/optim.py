"""Optimizer construction with the reference's weight-decay policy.

Mirrors build_optimizer/set_weight_decay (mvuld/optimizer.py:11-59): AdamW
(default) or SGD; NO weight decay for 1-d params (biases, norms) or params
whose path contains {cpb_mlp → cpb_fc, logit_scale, relative_position_bias_
table}; gradient clipping by global norm (TRAIN.CLIP_GRAD = 5.0); gradient
accumulation via optax.MultiSteps (the lax.scan microbatch loop lives in the
train step for the remat-friendly path).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

NO_DECAY_KEYWORDS = ("cpb_fc", "logit_scale", "relative_position_bias_table",
                     "bn", "norm", "scale", "bias", "embedding")


def decay_mask(params: Any) -> Any:
    """True where weight decay applies: ≥2-d params not on the skip list."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def should_decay(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        joined = "/".join(str(n) for n in names).lower()
        if leaf.ndim <= 1:
            return False
        return not any(k in joined for k in NO_DECAY_KEYWORDS)

    paths = [p for p, _ in flat]
    leaves = [leaf for _, leaf in flat]
    decayed = [should_decay(p, l) for p, l in zip(paths, leaves)]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, decayed)


def build_optimizer(cfg, schedule: Callable) -> optax.GradientTransformation:
    t = cfg.TRAIN
    name = t.OPTIMIZER.NAME.lower()
    if name == "adamw":
        opt = optax.adamw(schedule, b1=t.OPTIMIZER.BETAS[0],
                          b2=t.OPTIMIZER.BETAS[1], eps=t.OPTIMIZER.EPS,
                          weight_decay=t.WEIGHT_DECAY, mask=decay_mask)
    elif name == "sgd":
        opt = optax.chain(
            optax.add_decayed_weights(t.WEIGHT_DECAY, mask=decay_mask),
            optax.sgd(schedule, momentum=t.OPTIMIZER.MOMENTUM, nesterov=True))
    else:
        raise ValueError(f"Unknown optimizer {name!r}")
    tx = optax.chain(optax.clip_by_global_norm(t.CLIP_GRAD), opt)
    if t.ACCUMULATION_STEPS > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=t.ACCUMULATION_STEPS)
    return tx


def global_grad_norm(grads: Any) -> jnp.ndarray:
    return optax.global_norm(grads)
