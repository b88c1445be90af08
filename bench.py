"""Benchmark: SwinV2-Base 448 fine-tune throughput on one TPU chip.

Prints the headline JSON line {"metric", "value", "unit", "vs_baseline", ...}
flushed AS SOON AS the swin measurement exists, then (budget permitting) a
follow-up line with the complete result set including the fusion metric —
whichever JSON line a harness parses (first or last), it gets the headline
number even if the process is killed mid-fusion-bench.

Protocol mirrors the reference's --throughput harness (mvuld/main.py:438-455:
warmup then timed iters, images/s = iters·batch/Δt) but times the full
TRAINING step (forward + CE loss + backward + AdamW update) — the quantity
the "≥5× end-to-end fine-tune throughput" target is defined on.

Baseline: the reference repo publishes no absolute numbers (BASELINE.md). Its
published runs are single-GPU (CUDA 10.2 era, batch 4) with a
torch.cuda.synchronize() every step (main.py:286) and CUDA_LAUNCH_BLOCKING=1
force-set (main.py:12). SwinV2-Base at 448² under those conditions trains at
~10 images/s on a 2080Ti/V100-class card (fwd+bwd ≈ 3×110 GFLOP/img against
~14 achievable TFLOP/s with sync overhead). vs_baseline = value / 10.0.
"""

from __future__ import annotations

import json
import os
import time

BASELINE_IMAGES_PER_SEC = 10.0  # GPU ESTIMATE — reference publishes no numbers
# MEASURED in this environment: the reference's own SwinV2-Base-448 training
# step (its swin_transformer_v2.py at the paper fine-tune config, bs 4) runs
# at 0.039 images/s on torch 2.13 CPU (103 s/step, 1 thread) —
# python -m mvuld_tpu.tools.baseline_torch --swin. The 10 img/s GPU figure
# above stays as the (labeled) estimate; this anchors the multiplier in a
# real measurement like the fusion side.
BASELINE_IMAGES_PER_SEC_TORCH_CPU_MEASURED = 0.039
# env overrides allow sweep runs without editing the committed protocol
BATCH = int(os.environ.get("MVULD_BENCH_BATCH", 64))
# fused Pallas MLP+LN (ops/fused_dense.py mlp_ln) for the block second half.
# Its bwd kernel holds both weight mats + fp32 grad accumulators in VMEM
# (~21 MB at C=512): when XLA wraps the custom call into a fusion the
# per-call vmem_limit_bytes is dropped and the default 16 MB scoped limit
# applies, so the scoped-VMEM limit is raised for the whole step program.
FUSED_MLP = os.environ.get("MVULD_BENCH_FUSED_MLP", "1") == "1"
# TPU backend flags must ride the compile request (jit compiler_options):
# client-side XLA_FLAGS are parsed by the local CPU build, which aborts on
# TPU-only flag names under the tunneled-TPU setup
# 64 MB: the bwd kernel's weights+transposes+fp32 accumulators (~21 MB)
# get fused with the scan's stacked-dW dynamic-update-slice, which the
# compiler counts against the same scoped allocation (measured 51.6 MB)
FUSED_MLP_COMPILER_OPTS = (
    {"xla_tpu_scoped_vmem_limit_kib": "65536"} if FUSED_MLP else None)
ITERS = int(os.environ.get("MVULD_BENCH_ITERS", 8))
REMAT = os.environ.get("MVULD_BENCH_REMAT", "1") == "1"
# comma-separated stage indices to remat (e.g. "2" = only the 18-block
# stage); "all" = every stage. The early stages' remat recompute runs at
# 16-26% MXU util (r4 profile) — skipping it trades HBM for step time:
# measured 73.60 img/s (all) vs 74.44 (stage 2 only), so "2" is the default.
_rs = os.environ.get("MVULD_BENCH_REMAT_STAGES", "2")
REMAT_STAGES = (None if _rs == "all"
                else tuple(int(s) for s in _rs.split(",") if s != "") or None)
REPEATS = int(os.environ.get("MVULD_BENCH_REPEATS", 3))
# second headline metric (BASELINE.md): fused-model functions/sec at the
# reference's production dims (512 hidden, 100 nodes, 8 Rs-GCN, 8 FC)
FUSION_BATCH = int(os.environ.get("MVULD_BENCH_FUSION_BATCH", 256))
FUSION_STEPS = int(os.environ.get("MVULD_BENCH_FUSION_STEPS", 8))
# GPU ESTIMATE, kept conservative: the reference's own training step was
# MEASURED in this environment at 3.81 functions/s on torch CPU
# (python -m mvuld_tpu.tools.baseline_torch: Multi_DefectModel_new_GCN,
# bs 4, 100-node graphs, 1.05 s/step, torch 2.13 CPU). Its published runs
# are single-GPU; we credit the GPU with ~10× the measured CPU number so
# vs_baseline UNDERSTATES the speedup rather than inflating it.
BASELINE_FUNCTIONS_PER_SEC = 40.0
BASELINE_FUNCTIONS_PER_SEC_TORCH_CPU_MEASURED = 3.81
SKIP_FUSION = os.environ.get("MVULD_BENCH_SKIP_FUSION", "0") == "1"
# third metric: the END-TO-END tri-modal step (UniXcoder-base +
# SwinV2-base-448 + fusion head in ONE jitted train step — the "one XLA
# graph" capability the reference's staged caches cannot express). ON by
# default since r4 (the r3 number existed only interactively); the budget
# guard below still skips it if compiles ate the driver's time budget.
RUN_E2E = os.environ.get("MVULD_BENCH_E2E", "1") == "1"
E2E_BATCH = int(os.environ.get("MVULD_BENCH_E2E_BATCH", 16))
E2E_STEPS = int(os.environ.get("MVULD_BENCH_E2E_STEPS", 4))
# fused Pallas MLP+dropout+residual+LN in the RoBERTa layers
# (ops/fused_dense.py mlp_ln_res) + the swin-side fused MLP and
# window-resident pairs inside the e2e model. Default ON since the r4s2
# measurement: 20.89 vs 19.96 train fn/s, 95.26 vs 84.95 infer fn/s.
E2E_FUSED = os.environ.get("MVULD_BENCH_E2E_FUSED", "1") == "1"
# packed per-line encoding (models/e2e.py node_capacity): the corpus mean
# is ~22 valid lines of 100 slots; capacity 512 = 1.25x the mean valid
# count per bs-16 batch, /128-aligned (same auto-sizing as train_e2e.py)
E2E_NODE_CAPACITY = int(os.environ.get("MVULD_BENCH_E2E_CAPACITY", 512))
# remat granularity for the e2e step (models/e2e.py). Measured bs16-448
# (runs/r4s3/e2e_*.log): all-stage swin remat + text remat 20.89 fn/s;
# stage-2-only swin remat 21.07; stage-2 + NO text remat 22.11 (the bs16
# swin activations are a quarter of the dedicated bench's bs64 and the
# packed-capacity-512 text activations are small, so skipping the low-util
# recompute of stages 0/1/3 and the text encoder's bwd re-forward fits in
# HBM and is pure step-time win) — hence the "2"/"0" defaults.
_ers = os.environ.get("MVULD_BENCH_E2E_REMAT_STAGES", "2")
E2E_REMAT_STAGES = (None if _ers == "all"
                    else tuple(int(s) for s in _ers.split(",") if s != "")
                    or None)
E2E_TEXT_REMAT = os.environ.get("MVULD_BENCH_E2E_TEXT_REMAT", "0") == "1"
# Elapsed-time budget: if the swin bench (incl. any cold compile) already ate
# this many seconds, skip the fusion bench so the run still emits results
# before a driver-side timeout can kill it.
BUDGET_S = float(os.environ.get("MVULD_BENCH_BUDGET_S", 1200))
_T0 = time.time()


def main() -> None:
    import jax

    from mvuld_tpu.parallel.mesh import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from mvuld_tpu.config import default_config
    from mvuld_tpu.core.optim import build_optimizer
    from mvuld_tpu.core.schedule import build_schedule
    from mvuld_tpu.core.train_state import TrainState, make_train_step
    from mvuld_tpu.models.swin_v2 import SwinTransformerV2, SwinV2Config

    cfg = default_config()
    cfg.DATA.IMG_SIZE = 448
    cfg.DATA.BATCH_SIZE = BATCH
    cfg.MODEL.SWINV2.EMBED_DIM = 128
    cfg.MODEL.SWINV2.DEPTHS = [2, 2, 18, 2]
    cfg.MODEL.SWINV2.NUM_HEADS = [4, 8, 16, 32]
    cfg.MODEL.SWINV2.WINDOW_SIZE = 28
    cfg.MODEL.SWINV2.PRETRAINED_WINDOW_SIZES = [12, 12, 12, 6]
    cfg.MODEL.DROP_PATH_RATE = 0.2
    cfg.TRAIN.EPOCHS = 300
    cfg.TRAIN.WARMUP_EPOCHS = 5

    sc = SwinV2Config.from_cfg(cfg)
    model = SwinTransformerV2(
        sc, use_checkpoint=REMAT,
        scan_blocks=os.environ.get("MVULD_BENCH_SCAN", "1") == "1",
        use_pallas=True,
        save_qkv_in_remat=os.environ.get("MVULD_BENCH_SAVE_QKV", "0") == "1",
        # window-resident block pairs: activations stay in window layout
        # between the unshifted and shifted block, skipping a reverse→
        # partition layout round trip per pair. 75.66 vs 74.44 img/s
        # measured with the rest of this default config.
        window_resident=os.environ.get(
            "MVULD_BENCH_WINDOW_RESIDENT", "1") == "1",
        use_pallas_mlp=FUSED_MLP,
        remat_stages=REMAT_STAGES)

    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((BATCH, 448, 448, 3), jnp.float32)
    variables = model.init(rng, x)

    schedule = build_schedule(cfg, steps_per_epoch=1000, global_batch=BATCH)
    tx = build_optimizer(cfg, schedule)
    state = TrainState.create(variables["params"], tx)

    def apply_fn(vs, batch, rngs, train, mutable=None):
        return model.apply(vs, batch["image"], deterministic=not train,
                           rngs=rngs)

    # K optimizer steps fused into one XLA call (lax.scan): measures chip
    # throughput, amortizing per-dispatch RPC latency like production
    # training does (mvuld_tpu/core/train_state.py make_multi_train_step)
    from mvuld_tpu.core.train_state import make_multi_train_step
    multi_step = make_multi_train_step(apply_fn, tx, num_steps=ITERS,
                                       label_smoothing=0.1,
                                       compiler_options=FUSED_MLP_COMPILER_OPTS)

    data = np.random.RandomState(0)
    superbatch = {
        "image": jnp.asarray(data.randn(ITERS, BATCH, 448, 448, 3),
                             jnp.bfloat16),
        "label": jnp.asarray(data.randint(0, 2, (ITERS, BATCH)), jnp.int32),
    }

    _t_pre = time.time() - _T0                 # model build + init + data
    _t1 = time.time()
    swin_fallback = False
    try:
        state, metrics = multi_step(state, superbatch, rng)  # compile+warmup
    except Exception as e:                    # noqa: BLE001
        from mvuld_tpu.utils.oom import is_oom_shaped
        if not is_oom_shaped(e):
            raise
        # HBM headroom shifted: retry with all-stage remat (strictly less
        # activation memory than the selective default) so the headline
        # metric survives the round even if slower — mirrors the e2e
        # stage's conservative fallback
        swin_fallback = True
        model = SwinTransformerV2(
            sc, use_checkpoint=True, scan_blocks=True, use_pallas=True,
            window_resident=True, use_pallas_mlp=FUSED_MLP,
            remat_stages=None)
        state = TrainState.create(variables["params"], tx)
        multi_step = make_multi_train_step(
            apply_fn, tx, num_steps=ITERS, label_smoothing=0.1,
            compiler_options=FUSED_MLP_COMPILER_OPTS)
        state, metrics = multi_step(state, superbatch, rng)
    losses0 = np.asarray(metrics["loss"])
    assert np.isfinite(losses0).all() and len(set(losses0.tolist())) > 1, \
        "fused steps must do real, distinct work"
    _t_first = time.time() - _t1               # compile/cache-load + dispatch

    def timed():
        t0 = time.perf_counter()
        s2, m = multi_step(nonlocal_state[0], superbatch, rng)
        nonlocal_state[0] = s2
        float(m["loss"][-1])           # host fetch forces completion
        return time.perf_counter() - t0

    nonlocal_state = [state]
    profile_dir = os.environ.get("MVULD_PROFILE")
    # one untimed warm window: the first dispatch after compile runs
    # 1.5-18x slower through the relay (residual warmup), which used to
    # pollute timings_mean_s (min-of-3 already absorbed it)
    timed()
    times = []
    if profile_dir:
        with jax.profiler.trace(profile_dir):
            times.append(timed())
    for _ in range(REPEATS - len(times)):
        times.append(timed())
    dt = min(times)
    images_per_sec = ITERS * BATCH / dt
    # train step ≈ 3× fwd FLOPs (fwd + bwd); report MFU against both the
    # v5e spec peak (197 TF bf16) and this slice's measured matmul ceiling
    # (139 TF/s, memory/axon-tpu-environment.md)
    flops_per_img = sc.flops() * 3
    result = {
        "metric": "swinv2_base_448_train_images_per_sec",
        "value": round(images_per_sec, 2),
        "unit": "images/s/chip",
        "vs_baseline": round(images_per_sec / BASELINE_IMAGES_PER_SEC, 2),
        "baseline_estimated": True,  # ref publishes no absolute img/s number
        "swin_vs_torch_cpu_measured": round(
            images_per_sec / BASELINE_IMAGES_PER_SEC_TORCH_CPU_MEASURED, 0),
        "mfu_vs_197tf_peak": round(images_per_sec * flops_per_img / 197e12, 3),
        "mfu_vs_139tf_measured": round(
            images_per_sec * flops_per_img / 139e12, 3),
        "batch": BATCH, "fused_steps": ITERS, "remat": REMAT,
        "remat_stages": ("all" if swin_fallback else
                         (list(REMAT_STAGES) if REMAT_STAGES else "all")),
        "swin_remat_fallback": swin_fallback,
        "timings_s": [round(t, 3) for t in times],
        "timings_mean_s": round(float(np.mean(times)), 3),
        "timings_std_s": round(float(np.std(times)), 3),
        # setup split (diagnosable regressions): host-side model/data build
        # vs the first fused dispatch, which carries compile OR persistent-
        # cache deserialization + the relay's first-dispatch penalty
        "setup_s": round(time.time() - _T0 - sum(times), 1),
        "setup_pre_dispatch_s": round(_t_pre, 1),
        "setup_first_dispatch_s": round(_t_first, 1),
    }
    # Emit the headline metric the moment it exists (flushed) so a timeout
    # during the fusion bench can never lose it (BENCH_r02 postmortem: one
    # print at the very end + rc=124 == no round number at all).
    print(json.dumps(result), flush=True)

    if not SKIP_FUSION:
        if time.time() - _T0 > BUDGET_S:
            result["fusion_skipped"] = f"budget {BUDGET_S}s exhausted"
        else:
            result.update(_fusion_bench(jax, jnp, np, cfg, rng))
        # follow-up line carries the COMPLETE result set
        print(json.dumps(result), flush=True)

    if RUN_E2E:
        if time.time() - _T0 > BUDGET_S:
            result["e2e_skipped"] = f"budget {BUDGET_S}s exhausted"
        else:
            # release the swin stage's device residents (bf16 superbatch +
            # TrainState ≈ 1.6 GB): the e2e stage's default remat settings
            # (stage-2-only swin remat, no text remat) trade HBM for step
            # time and need the whole chip — with these still live the e2e
            # warmup OOMed (runs/r4s3/bench_newdefaults.log)
            nonlocal_state[0] = None
            # `timed` is a closure over superbatch/nonlocal_state — drop it
            # too or the buffers stay referenced
            del state, superbatch, metrics, variables, x, timed
            try:
                result.update(_e2e_bench(jax, jnp, np, rng))
            except Exception as e:            # noqa: BLE001
                # never let the optional e2e stage turn a round with good
                # swin/fusion numbers into rc!=0 (BENCH_r02 postmortem)
                result["e2e_error"] = repr(e)[:500]
        print(json.dumps(result), flush=True)


def _fusion_bench(jax, jnp, np, cfg, rng):
    """Second headline metric: production fusion-model training throughput
    (functions/sec) at reference dims — Multi_DefectModel_new_GCN over
    [B, 100] node graphs (GraphModel.py:81-211)."""
    from mvuld_tpu.core.optim import build_optimizer
    from mvuld_tpu.core.train_state import TrainState, make_multi_train_step
    from mvuld_tpu.models.fusion_zoo import build_fusion_model

    fusion = build_fusion_model(cfg, arch="multi_defect_new_gcn")
    B, M = FUSION_BATCH, cfg.DATA.MAX_NODES
    data = np.random.RandomState(1)
    fb = {
        "img_emb": jnp.asarray(data.randn(FUSION_STEPS, B, 1024), jnp.float32),
        "text_emb": jnp.asarray(data.randn(FUSION_STEPS, B, 768), jnp.float32),
        "node_emb": jnp.asarray(data.randn(FUSION_STEPS, B, M, 768),
                                jnp.float32),
        "pos": jnp.asarray(data.rand(FUSION_STEPS, B, M, 4), jnp.float32),
        "adj": jnp.asarray(
            np.tile(np.eye(M, dtype=bool), (FUSION_STEPS, B, 1, 1))),
        "node_mask": jnp.ones((FUSION_STEPS, B, M), jnp.float32),
        "label": jnp.asarray(data.randint(0, 2, (FUSION_STEPS, B)), jnp.int32),
    }

    def apply_fn(vs, batch, rngs, train, mutable=None):
        kwargs = {k: batch[k] for k in ("img_emb", "text_emb", "node_emb",
                                        "pos", "adj", "node_mask")}
        if mutable:
            return fusion.apply(vs, **kwargs, train=train, rngs=rngs,
                                mutable=mutable)
        return fusion.apply(vs, **kwargs, train=train, rngs=rngs)

    fargs = {k: v[0, :1] for k, v in fb.items() if k != "label"}
    variables = fusion.init(rng, **fargs, train=False)
    tx = build_optimizer(cfg, lambda s: 1e-4)
    state = TrainState.create(variables["params"], tx,
                              batch_stats=variables.get("batch_stats"))
    step = make_multi_train_step(apply_fn, tx, num_steps=FUSION_STEPS,
                                 label_smoothing=0.1,
                                 has_batch_stats="batch_stats" in variables)
    state, m = step(state, fb, rng)            # compile + warmup
    assert np.isfinite(np.asarray(m["loss"])).all()
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        state, m = step(state, fb, rng)
        float(m["loss"][-1])
        times.append(time.perf_counter() - t0)
    fps = FUSION_STEPS * B / min(times)
    return {
        "fusion_timings_mean_s": round(float(np.mean(times)), 3),
        "fusion_timings_std_s": round(float(np.std(times)), 3),
        "fusion_functions_per_sec": round(fps, 1),
        "fusion_vs_baseline": round(fps / BASELINE_FUNCTIONS_PER_SEC, 2),
        "fusion_baseline_estimated": True,  # 40 fn/s credited to the ref GPU
        "fusion_vs_torch_cpu_measured": round(
            fps / BASELINE_FUNCTIONS_PER_SEC_TORCH_CPU_MEASURED, 1),
        "fusion_batch": B,
    }


def _host_init(shapes, np):
    """Cheap well-conditioned init from an eval_shape tree, computed on host
    (avoids compiling a second device program just for init): norm/BN scales
    and running vars get 1, biases/means 0, everything else N(0, 0.02).
    All-zero params NaN after one update (rsqrt/l2norm grads at exactly 0)."""
    import jax
    import jax.numpy as jnp
    gen = np.random.RandomState(7)

    def leaf(path, s):
        name = str(getattr(path[-1], "key", path[-1]))
        if name in ("scale", "gamma", "var"):
            return jnp.ones(s.shape, s.dtype)
        if name in ("bias", "mean"):
            return jnp.zeros(s.shape, s.dtype)
        return jnp.asarray(gen.standard_normal(s.shape) * 0.02, s.dtype)

    return jax.tree_util.tree_map_with_path(leaf, shapes)


def _e2e_bench(jax, jnp, np, rng):
    """Optional metric: full tri-modal fine-tune step at production dims —
    UniXcoder-base (12×768, func 512 tokens + 100 node lines × 64 tokens),
    SwinV2-Base 448 with the fused Pallas attention, and the production
    fusion head, all differentiated in ONE jitted multi-step (the staged
    reference trains only the fusion head over frozen disk caches)."""
    from mvuld_tpu.core.train_state import TrainState, make_multi_train_step
    from mvuld_tpu.models.e2e import EndToEndMVulD
    from mvuld_tpu.models.roberta import RobertaConfig
    from mvuld_tpu.models.swin_v2 import SwinV2Config

    B, K = E2E_BATCH, E2E_STEPS
    M, Tn, Tf = 100, 64, 512
    cap = min(E2E_NODE_CAPACITY, B * M) or None
    tc = RobertaConfig(dtype=jnp.bfloat16, use_pallas_mlp=E2E_FUSED)
    sc = SwinV2Config(dtype=jnp.bfloat16)

    def build(remat_stages, text_remat):
        return EndToEndMVulD(tc, sc, use_pallas=True, scan_blocks=True,
                             remat=True, node_capacity=cap,
                             use_pallas_mlp=E2E_FUSED,
                             window_resident=E2E_FUSED,
                             swin_remat_stages=remat_stages,
                             text_remat=text_remat)

    model = build(E2E_REMAT_STAGES, E2E_TEXT_REMAT)

    data = np.random.RandomState(2)
    # realistic node-count distribution (reference corpora average ~20-25
    # real statement lines per function, far below the 100-slot padding):
    # valid counts U(5, 40), pad slots carry the pad id and mask 0 — the
    # packed encoder only pays for real lines, like the reference
    # (mvuld/data/data_list.py:292-299)
    nvalid = data.randint(5, 41, (K, B))
    node_mask = (np.arange(M)[None, None, :]
                 < nvalid[..., None]).astype(np.float32)
    node_ids = data.randint(3, 1000, (K, B, M, Tn))
    node_ids[node_mask == 0] = 1               # pad_token_id
    sb = {
        "func_ids": jnp.asarray(
            data.randint(3, 1000, (K, B, Tf)), jnp.int32),
        "node_ids": jnp.asarray(node_ids, jnp.int32),
        "image": jnp.asarray(data.randn(K, B, 448, 448, 3), jnp.bfloat16),
        "pos": jnp.asarray(data.rand(K, B, M, 4), jnp.float32),
        "adj": jnp.asarray(np.tile(np.eye(M, dtype=bool), (K, B, 1, 1))),
        "node_mask": jnp.asarray(node_mask),
        "label": jnp.asarray(data.randint(0, 2, (K, B)), jnp.int32),
    }

    def apply_fn(vs, batch, rngs, train, mutable=None):
        kwargs = {k: batch[k] for k in ("func_ids", "node_ids", "image",
                                        "pos", "adj", "node_mask")}
        if mutable:   # fusion head has BatchNorm → batch_stats updates
            return model.apply(vs, **kwargs, train=train, rngs=rngs,
                               mutable=mutable)
        return model.apply(vs, **kwargs, train=train, rngs=rngs)

    init_args = {k: v[0, :1] for k, v in sb.items() if k != "label"}
    variables = jax.eval_shape(
        lambda k: model.init(k, **init_args), jax.random.PRNGKey(1))
    variables = _host_init(variables, np)
    from mvuld_tpu.core.optim import build_optimizer
    from mvuld_tpu.config import default_config
    tx = build_optimizer(default_config(), lambda s: 1e-5)
    state = TrainState.create(variables["params"], tx,
                              batch_stats=variables.get("batch_stats"))
    step = make_multi_train_step(apply_fn, tx, num_steps=K,
                                 label_smoothing=0.1,
                                 has_batch_stats="batch_stats" in variables,
                                 compiler_options=(FUSED_MLP_COMPILER_OPTS
                                                   if E2E_FUSED else None))
    remat_used = (E2E_REMAT_STAGES, E2E_TEXT_REMAT)
    try:
        state, m = step(state, sb, rng)       # compile + warmup
    except Exception as e:                    # noqa: BLE001
        # treat relay-wrapped compile OOMs as OOM-shaped too (see
        # mvuld_tpu/utils/oom.py) and retry conservatively; a real compile
        # bug fails the retry too and raises from there
        from mvuld_tpu.utils.oom import is_oom_shaped
        if not is_oom_shaped(e):
            raise
        # HBM headroom shifted (e.g. other device residents): fall back to
        # the conservative remat config (every swin stage + the text
        # encoder) rather than losing the metric for the round. A fresh
        # make_multi_train_step forces a retrace — apply_fn reads `model`
        # from this scope, but the old jit cache would reuse the OOMing
        # executable
        remat_used = (None, True)
        model = build(*remat_used)
        step = make_multi_train_step(
            apply_fn, tx, num_steps=K, label_smoothing=0.1,
            has_batch_stats="batch_stats" in variables,
            compiler_options=(FUSED_MLP_COMPILER_OPTS
                              if E2E_FUSED else None))
        state = TrainState.create(variables["params"], tx,
                                  batch_stats=variables.get("batch_stats"))
        state, m = step(state, sb, rng)
    assert np.isfinite(np.asarray(m["loss"])).all()
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        state, m = step(state, sb, rng)
        float(m["loss"][-1])
        times.append(time.perf_counter() - t0)
    fps = K * B / min(times)

    # serving throughput: forward-only eval of the SAME model/params — the
    # quantity train.predict's batched serving path runs at (the reference
    # has no serving stack, SURVEY §3.4; its --test 1 re-runs validate)
    @jax.jit
    def infer(vs, b):
        logits = model.apply(vs, func_ids=b["func_ids"],
                             node_ids=b["node_ids"], image=b["image"],
                             pos=b["pos"], adj=b["adj"],
                             node_mask=b["node_mask"], train=False)
        return jax.nn.softmax(logits.astype(jnp.float32), -1)[:, 1]

    vs = {"params": state.params}
    if state.batch_stats is not None:
        vs["batch_stats"] = state.batch_stats
    one = {k: v[0] for k, v in sb.items() if k != "label"}
    p = infer(vs, one)                        # compile + warmup
    assert np.isfinite(np.asarray(p)).all()
    itimes = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for j in range(K):                    # K dispatches of batch B
            p = infer(vs, {k: v[j] for k, v in sb.items() if k != "label"})
        float(p[-1])
        itimes.append(time.perf_counter() - t0)
    ifps = K * B / min(itimes)

    return {"e2e_functions_per_sec": round(fps, 2), "e2e_batch": B,
            "e2e_node_capacity": cap,
            "e2e_remat_stages": (list(remat_used[0])
                                 if remat_used[0] else "all"),
            "e2e_text_remat": remat_used[1],
            "e2e_remat_fallback": remat_used != (E2E_REMAT_STAGES,
                                                 E2E_TEXT_REMAT),
            "e2e_timings_s": [round(t, 3) for t in times],
            "e2e_timings_mean_s": round(float(np.mean(times)), 3),
            "e2e_timings_std_s": round(float(np.std(times)), 3),
            "e2e_infer_functions_per_sec": round(ifps, 2),
            "e2e_infer_timings_mean_s": round(float(np.mean(itimes)), 3)}


if __name__ == "__main__":
    main()
