"""Regression tests for the round-2 advisor/verdict fixes:

  * MoE top-2 dispatch: no (expert, slot) collision between choice passes
    (GShard offset), output matches a dense per-token reference.
  * Fused superbatch sharding on a dp mesh: batch axis (axis 1) sharded,
    works when fused_steps != dp size, matches sequential stepping.
  * restore_train_state with optax.MultiSteps (ACCUMULATION_STEPS>1):
    name-matched opt_state rebuild, resumed training is bit-identical.
  * fit() resume wiring: a restarted run continues from the saved epoch
    with the saved best F1 instead of restarting from scratch.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mvuld_tpu.config import default_config
from mvuld_tpu.core.optim import build_optimizer
from mvuld_tpu.core.train_state import (TrainState, make_eval_step,
                                        make_multi_train_step, make_train_step)


@pytest.mark.slow
def test_moe_top2_no_slot_collision():
    """With top_k=2 and ample capacity every token must receive
    sum_k p_k * expert_{e_k}(x_t) — the pre-fix independent cumsums summed
    two tokens into one slot whenever an expert was a 1st choice for one
    token and a 2nd choice for another."""
    from mvuld_tpu.models.moe import MoEFFN

    E, T, D = 4, 16, 8
    m = MoEFFN(hidden=16, out=D, num_experts=E, top_k=2,
               capacity_factor=float(E),  # C = capacity_factor*k*T/E = 2T: no drops
               gate_noise=0.0)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(T, D).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    out, aux = m.apply(variables, x, deterministic=True)

    # dense reference from the same params
    p = variables["params"]
    logits = np.asarray(x) @ np.asarray(p["gate"])
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    order = np.argsort(-probs, axis=-1)[:, :2]

    def expert(e, v):
        h = v @ np.asarray(p["w1"])[e] + np.asarray(p["b1"])[e, 0]
        from scipy.stats import norm  # exact gelu
        h = h * norm.cdf(h)
        return h @ np.asarray(p["w2"])[e] + np.asarray(p["b2"])[e, 0]

    want = np.zeros((T, D), np.float32)
    for t in range(T):
        for k in range(2):
            e = int(order[t, k])
            want[t] += probs[t, e] * expert(e, np.asarray(x)[t])
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-4, rtol=1e-4)
    assert np.isfinite(float(aux))


def _toy_setup():
    import flax.linen as nn

    class Toy(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(2)(nn.relu(nn.Dense(8)(x)))

    model = Toy()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))

    def apply_fn(vs, batch, rngs, train, mutable=None):
        return model.apply(vs, batch["x"])

    return model, variables, apply_fn


def test_fused_superbatch_sharded_over_batch_axis():
    """K=4 fused steps on a dp=8 mesh: shard_superbatch must put P(None,'dp')
    on the [K, B, ...] leaves (shard_batch on axis 0 raised ValueError here
    pre-fix) and the result must match unsharded sequential stepping."""
    from mvuld_tpu.parallel.mesh import make_mesh, replicate, shard_superbatch

    cfg = default_config()
    model, variables, apply_fn = _toy_setup()
    tx = build_optimizer(cfg, lambda s: 1e-2)
    rng = jax.random.PRNGKey(3)
    K, B = 4, 16  # K not divisible by dp=8 — the failing case
    data = np.random.RandomState(0)
    xs = data.randn(K, B, 4).astype(np.float32)
    ys = data.randint(0, 2, (K, B)).astype(np.int32)

    single = make_train_step(apply_fn, tx, label_smoothing=0.0, donate=False)
    state_a = TrainState.create(variables["params"], tx)
    for k in range(K):
        state_a, _ = single(state_a, {"x": jnp.asarray(xs[k]),
                                      "label": jnp.asarray(ys[k])}, rng)

    mesh = make_mesh(dp=8, mp=1)
    multi = make_multi_train_step(apply_fn, tx, num_steps=K,
                                  label_smoothing=0.0, donate=False)
    state_b = TrainState.create(variables["params"], tx)
    with mesh:
        state_b = replicate(mesh, state_b)
        sb = shard_superbatch(mesh, {"x": xs, "label": ys})
        assert isinstance(sb["x"].sharding, NamedSharding)
        assert sb["x"].sharding.spec == P(None, "dp"), sb["x"].sharding
        state_b, metrics = multi(state_b, sb, rng)
        losses = np.asarray(metrics["loss"])
    assert np.isfinite(losses).all() and losses.shape == (K,)
    pa = jax.tree_util.tree_leaves(state_a.params)
    pb = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(pa, pb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_multisteps_opt_state_resume_roundtrip(tmp_path):
    """ACCUMULATION_STEPS=2 → optax.MultiSteps whose state fields are NOT
    alphabetical; resume must rebuild by field name, and continued training
    must match an uninterrupted run exactly."""
    from mvuld_tpu.core.checkpoint import (resume_bestf1_helper,
                                           restore_train_state, save_checkpoint)

    cfg = default_config()
    cfg.TRAIN.ACCUMULATION_STEPS = 2
    model, variables, apply_fn = _toy_setup()
    tx = build_optimizer(cfg, lambda s: 1e-2)
    step = make_train_step(apply_fn, tx, label_smoothing=0.0, donate=False)
    rng = jax.random.PRNGKey(0)
    data = np.random.RandomState(0)
    batches = [{"x": jnp.asarray(data.randn(8, 4).astype(np.float32)),
                "label": jnp.asarray(data.randint(0, 2, 8).astype(np.int32))}
               for _ in range(6)]

    state = TrainState.create(variables["params"], tx)
    for b in batches[:3]:                       # odd count: mid-accumulation
        state, _ = step(state, b, rng)
    save_checkpoint(str(tmp_path), 1,
                    {"params": jax.device_get(state.params),
                     "opt_state": jax.device_get(state.opt_state),
                     "batch_stats": None, "step": int(state.step),
                     "epoch": 1, "best_f1": 0.25}, best=True)

    fresh = TrainState.create(variables["params"], tx)
    restored, meta = restore_train_state(resume_bestf1_helper(str(tmp_path)),
                                         fresh, with_meta=True)
    assert meta == {"epoch": 1, "best_f1": 0.25}
    # opt_state leaves (incl. MultiSteps mini_step/acc_grads) match by value
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
    # continued trajectories identical
    s_ref, s_res = state, restored
    for b in batches[3:]:
        s_ref, m_ref = step(s_ref, b, rng)
        s_res, m_res = step(s_res, b, rng)
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.params),
                    jax.tree_util.tree_leaves(s_res.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_fit_resumes_from_checkpoint(tmp_path):
    """Kill/restart semantics: a second fit() in the same output dir resumes
    at epoch best+1 with the saved best F1 (reference main.py:147-191)."""
    from mvuld_tpu.data.loader import ArrayDataset
    from mvuld_tpu.train.harness import fit

    cfg = default_config()
    cfg.DATA.BATCH_SIZE = 8
    cfg.TRAIN.EPOCHS = 2
    cfg.TRAIN.WARMUP_EPOCHS = 0
    cfg.TRAIN.EARLY_STOP_PATIENCE = 10
    cfg.PRINT_FREQ = 1000
    # deterministic resume point: newest epoch checkpoint (AUTO_RESUME),
    # not the best-F1 one (whose epoch depends on the loss trajectory)
    cfg.TRAIN.BEST_RESUME = False
    cfg.TRAIN.AUTO_RESUME = True

    rngd = np.random.RandomState(0)
    w = rngd.randn(4)
    xs = rngd.randn(32, 4).astype(np.float32)
    ys = (xs @ w > 0).astype(np.int32)
    ds = ArrayDataset({"x": xs, "label": ys})

    model, variables, apply_fn = _toy_setup()
    tx = build_optimizer(cfg, lambda s: 1e-2)
    step = make_train_step(apply_fn, tx, label_smoothing=0.0, donate=False)
    eval_step = make_eval_step(apply_fn)
    out = str(tmp_path / "run")

    res1 = fit(cfg=cfg, state=TrainState.create(variables["params"], tx),
               train_step=step, eval_step=eval_step, train_ds=ds, val_ds=ds,
               output_dir=out)
    # "restart the job": fresh state, same output dir, same config →
    # resume ladder finds the best-f1 checkpoint; both epochs already done
    res2 = fit(cfg=cfg, state=TrainState.create(variables["params"], tx),
               train_step=step, eval_step=eval_step, train_ds=ds, val_ds=ds,
               output_dir=out)
    assert res2["best_f1"] == pytest.approx(res1["best_f1"])
    assert res2["history"] == []          # no epochs re-run
    # the resumed state carries trained parameters, not the fresh init
    diff = max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
               for a, b in zip(jax.tree_util.tree_leaves(variables["params"]),
                               jax.tree_util.tree_leaves(res2["state"].params)))
    assert diff > 1e-6

    # extending EPOCHS resumes mid-run: exactly the extra epochs execute
    cfg.TRAIN.EPOCHS = 3
    res3 = fit(cfg=cfg, state=TrainState.create(variables["params"], tx),
               train_step=step, eval_step=eval_step, train_ds=ds, val_ds=ds,
               output_dir=out)
    assert [h["epoch"] for h in res3["history"]] == [2]


@pytest.mark.slow
def test_tensor_parallel_sharding_matches_replicated():
    """Megatron-style mp sharding of the SwinV2 encoder weights (tp_spec)
    must be numerically identical to replicated training — sharding is
    layout, not math. Also asserts the weights really land mp-sharded."""
    import flax  # noqa: F401

    from mvuld_tpu.core.schedule import build_schedule
    from mvuld_tpu.models.swin_v2 import SwinTransformerV2, SwinV2Config
    from mvuld_tpu.parallel.mesh import (make_mesh, replicate, shard_batch,
                                         shard_params_tp, tp_spec)

    cfg = default_config()
    cfg.DATA.IMG_SIZE = 16
    cfg.MODEL.SWINV2.EMBED_DIM = 16
    cfg.MODEL.SWINV2.DEPTHS = [1, 1]
    cfg.MODEL.SWINV2.NUM_HEADS = [2, 2]
    cfg.MODEL.SWINV2.WINDOW_SIZE = 4
    cfg.MODEL.SWINV2.PRETRAINED_WINDOW_SIZES = [0, 0]
    cfg.MODEL.DROP_PATH_RATE = 0.0
    cfg.PARALLEL.DTYPE = "float32"
    sc = SwinV2Config.from_cfg(cfg)
    model = SwinTransformerV2(sc)
    B = 8
    rng = jax.random.PRNGKey(0)
    x = np.random.RandomState(0).randn(B, 16, 16, 3).astype(np.float32)
    y = np.random.RandomState(1).randint(0, 2, B).astype(np.int32)
    variables = model.init(rng, jnp.zeros((1, 16, 16, 3)))
    tx = build_optimizer(cfg, build_schedule(cfg, 4, B))

    def apply_fn(vs, batch, rngs, train, mutable=None):
        return model.apply(vs, batch["image"], deterministic=not train,
                           rngs=rngs)

    step = make_train_step(apply_fn, tx, label_smoothing=0.0, donate=False)

    mesh = make_mesh(dp=4, mp=2)
    with mesh:
        # replicated baseline
        s_rep = replicate(mesh, TrainState.create(variables["params"], tx))
        b = shard_batch(mesh, {"image": x, "label": y})
        s_rep, m_rep = step(s_rep, b, rng)
        # tensor-parallel
        tp_params = shard_params_tp(mesh, variables["params"])
        s_tp = TrainState.create(tp_params, tx)
        s_tp, m_tp = step(s_tp, b, rng)
    np.testing.assert_allclose(float(m_rep["loss"]), float(m_tp["loss"]),
                               atol=1e-6)
    for a, c in zip(jax.tree_util.tree_leaves(s_rep.params),
                    jax.tree_util.tree_leaves(s_tp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-5)
    # at least one fc1 kernel and one proj kernel really carry "mp"
    specs = []
    jax.tree_util.tree_map_with_path(
        lambda p, l: specs.append((tuple(str(getattr(x, "key", "")) for x in p),
                                   l.sharding.spec)), s_tp.params)
    fc1 = [s for names, s in specs if "fc1" in names and names[-1] == "kernel"]
    proj = [s for names, s in specs
            if "proj" in names and "attn" in names and names[-1] == "kernel"]
    patch = [s for names, s in specs
             if "proj" in names and "patch_embed" in names
             and names[-1] == "kernel"]
    assert fc1 and all("mp" in tuple(s) for s in fc1), fc1
    assert proj and all("mp" in tuple(s) for s in proj), proj
    assert patch and all("mp" not in tuple(s) for s in patch), patch
