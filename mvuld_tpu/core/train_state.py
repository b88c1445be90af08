"""Train-state container and jitted train/eval step factories.

The TPU equivalent of the reference's train_one_epoch/validate inner loops
(mvuld/main.py:251-426, main_bigvul.py:294-500): one fused XLA step — forward,
loss (CE with label smoothing, MODEL.LABEL_SMOOTHING=0.1), backward, clip,
optimizer update — jitted once, batch dim sharded over the "dp" mesh axis,
state donated to avoid HBM copies. No AMP GradScaler: bf16 compute with fp32
master params makes loss scaling unnecessary.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    batch_stats: Any = None

    @classmethod
    def create(cls, params, tx, batch_stats=None):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), batch_stats=batch_stats)


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  label_smoothing: float = 0.0,
                  soft_targets: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean CE; ``soft_targets`` (mixup) overrides integer labels."""
    num_classes = logits.shape[-1]
    if soft_targets is not None:
        targets = soft_targets
    else:
        targets = jax.nn.one_hot(labels, num_classes)
    if label_smoothing > 0:
        targets = targets * (1 - label_smoothing) + label_smoothing / num_classes
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -(targets * logp).sum(axis=-1).mean()


def _gather_rows(data: Dict, idx) -> Dict:
    """Device-side batch materialization: row-gather every column of the
    device-resident dataset at the step's indices. Runs INSIDE the jitted
    step so the host ships only the int32 index vector (TRAIN.DEVICE_DATA —
    the data dict must be a jit ARGUMENT, never a closure constant: the
    tunneled-TPU compile path inlines closure constants into the shipped
    HLO, see make_multi_train_step's compiler_options note)."""
    return {k: v[idx] for k, v in data.items()}


def make_train_step(apply_fn: Callable, tx: optax.GradientTransformation,
                    label_smoothing: float = 0.1,
                    has_batch_stats: bool = False,
                    donate: bool = True,
                    compiler_options: dict = None,
                    indexed: bool = False) -> Callable:
    """Build a jitted train step.

    ``apply_fn(variables, batch, rngs, train) -> logits`` adapts each model's
    call signature; the factory handles loss/grad/update and (optionally)
    BatchNorm statistics mutation.

    With ``indexed=True`` the returned step takes an extra trailing ``data``
    argument (the device-resident column dict) and ``batch`` shrinks to
    ``{"idx": int32[B]}``; rows are gathered on device (see _gather_rows).
    """

    def loss_fn(params, batch_stats, batch, rng):
        variables = {"params": params}
        if has_batch_stats:
            variables["batch_stats"] = batch_stats
            logits, mutated = apply_fn(variables, batch, rngs={"dropout": rng},
                                       train=True, mutable=["batch_stats"])
            new_stats = mutated["batch_stats"]
        else:
            logits = apply_fn(variables, batch, rngs={"dropout": rng},
                              train=True)
            new_stats = batch_stats
        loss = cross_entropy(logits, batch["label"], label_smoothing,
                             batch.get("soft_label"))
        return loss, (logits, new_stats)

    def train_step(state: TrainState, batch: Dict, rng) -> Tuple[TrainState, Dict]:
        step_rng = jax.random.fold_in(rng, state.step)
        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch,
                                   step_rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "acc": (logits.argmax(-1) == batch["label"]).mean(),
        }
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  opt_state=new_opt, batch_stats=new_stats)
        return new_state, metrics

    if indexed:
        def indexed_step(state: TrainState, batch: Dict, rng, data: Dict):
            return train_step(state, _gather_rows(data, batch["idx"]), rng)
        return jax.jit(indexed_step, donate_argnums=(0,) if donate else (),
                       compiler_options=compiler_options)
    return jax.jit(train_step, donate_argnums=(0,) if donate else (),
                   compiler_options=compiler_options)


def make_multi_train_step(apply_fn: Callable, tx: optax.GradientTransformation,
                          num_steps: int, label_smoothing: float = 0.1,
                          has_batch_stats: bool = False,
                          donate: bool = True,
                          compiler_options: dict = None,
                          indexed: bool = False) -> Callable:
    """K fused optimizer steps in ONE jitted call via lax.scan.

    Step fusion amortizes per-dispatch overhead (host→device RPC latency —
    significant on remote/tunneled accelerators and multi-host setups) and
    lets XLA overlap the tail of step k with the head of step k+1. The
    returned function takes a superbatch whose leaves have a leading
    [num_steps] axis (one microbatch per fused step) and returns
    (state, stacked_metrics).
    """

    def loss_fn(params, batch_stats, batch, rng):
        variables = {"params": params}
        if has_batch_stats:
            variables["batch_stats"] = batch_stats
            logits, mutated = apply_fn(variables, batch, rngs={"dropout": rng},
                                       train=True, mutable=["batch_stats"])
            new_stats = mutated["batch_stats"]
        else:
            logits = apply_fn(variables, batch, rngs={"dropout": rng},
                              train=True)
            new_stats = batch_stats
        loss = cross_entropy(logits, batch["label"], label_smoothing,
                             batch.get("soft_label"))
        return loss, (logits, new_stats)

    def body(carry, batch):
        state, rng = carry
        step_rng = jax.random.fold_in(rng, state.step)
        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch,
                                   step_rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss,
                   "acc": (logits.argmax(-1) == batch["label"]).mean()}
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  opt_state=new_opt, batch_stats=new_stats)
        return (new_state, rng), metrics

    def multi_step(state: TrainState, superbatch: Dict, rng):
        (state, _), metrics = jax.lax.scan(body, (state, rng), superbatch,
                                           length=num_steps)
        return state, metrics

    # compiler_options travel inside the PJRT compile request — the only
    # way to set TPU backend flags (e.g. xla_tpu_scoped_vmem_limit_kib)
    # through the tunneled-client setup, where client-side XLA_FLAGS are
    # parsed by a CPU build that rejects TPU flag names
    if indexed:
        def indexed_multi(state: TrainState, superbatch: Dict, rng, data: Dict):
            def idx_body(carry, idx):
                return body(carry, _gather_rows(data, idx))
            (state, _), metrics = jax.lax.scan(
                idx_body, (state, rng), superbatch["idx"], length=num_steps)
            return state, metrics
        return jax.jit(indexed_multi, donate_argnums=(0,) if donate else (),
                       compiler_options=compiler_options)
    return jax.jit(multi_step, donate_argnums=(0,) if donate else (),
                   compiler_options=compiler_options)


def make_eval_step(apply_fn: Callable, has_batch_stats: bool = False,
                   indexed: bool = False) -> Callable:
    """Jitted inference forward. With ``indexed=True`` (TRAIN.DEVICE_EVAL)
    the step takes a trailing device-resident column dict and the batch
    shrinks to ``{"idx": int32[B]}`` — the eval split never re-crosses the
    host→device boundary after its one-time upload (the tunneled TPU
    relay's client leaks host RAM per transferred byte; see _gather_rows)."""
    def eval_step(state: TrainState, batch: Dict) -> jnp.ndarray:
        variables = {"params": state.params}
        if has_batch_stats:
            variables["batch_stats"] = state.batch_stats
        return apply_fn(variables, batch, rngs=None, train=False)

    if indexed:
        def indexed_eval(state: TrainState, batch: Dict, data: Dict):
            return eval_step(state, _gather_rows(data, batch["idx"]))
        return jax.jit(indexed_eval)
    return jax.jit(eval_step)


@dataclasses.dataclass
class EarlyStopper:
    """Best-F1 early stopping (reference: patience 10 swin / 50 fusion,
    main.py:215-235, main_bigvul.py:264-268)."""

    patience: int
    best: float = float("-inf")
    best_epoch: int = -1
    counter: int = 0

    def update(self, value: float, epoch: int) -> bool:
        """Returns True if this is a new best."""
        if value > self.best:
            self.best = value
            self.best_epoch = epoch
            self.counter = 0
            return True
        self.counter += 1
        return False

    @property
    def should_stop(self) -> bool:
        return self.counter >= self.patience
