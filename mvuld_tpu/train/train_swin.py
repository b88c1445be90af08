"""SwinV2 fine-tune on rendered code-graph images — the main.py equivalent.

Replicates the reference's image-encoder fine-tune path (mvuld/main.py:55-514):
manifest datasets ("path label" txt), timm-style train augmentation +
mixup/cutmix soft targets, CE with label smoothing, AdamW + cosine with the
LR-scaling rule, grad clip 5.0, best-F1 early stop (patience 10), optional
pretrained-checkpoint conversion (384→448 surgery), --throughput mode
(warmup + timed iters, main.py:438-455).

Usage:
  python -m mvuld_tpu.train.train_swin --cfg cfg.yaml [--synthetic N]
      [--pretrained swinv2.pth] [--test] [--throughput] [--opts ...]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def build_image_datasets(cfg, df, img_dir, pos_dir, logger):
    """Render graphs (idempotent) and build train/val/test image datasets."""
    from mvuld_tpu.data.loader import ArrayDataset
    from mvuld_tpu.data.transforms import (load_image, resize_normalize,
                                           train_transform)
    from mvuld_tpu.train.precompute import render_corpus

    paths = render_corpus(df, img_dir, pos_dir, cfg.DATA.GTYPE, logger)
    size = cfg.DATA.IMG_SIZE
    out = {}
    for part in ("train", "val", "test"):
        rows = df[(df.label == part) & df._id.isin(paths)]
        if not len(rows):
            continue
        img_paths = [paths[int(i)] for i in rows._id]
        labels = rows.vul.to_numpy().astype(np.int32)
        if part == "train":
            def tf(item, rng):
                img = load_image(item["path"])
                x = train_transform(img, size, rng,
                                    cfg.AUG.COLOR_JITTER, cfg.AUG.REPROB)
                return {"image": x, "label": item["label"]}
        else:
            def tf(item, rng):
                x = resize_normalize(load_image(item["path"]), size)
                return {"image": x, "label": item["label"]}
        out[part] = ArrayDataset({"path": img_paths, "label": labels},
                                 transform=tf)
    return out


def main(argv=None) -> dict:
    from mvuld_tpu.parallel.mesh import enable_compile_cache
    enable_compile_cache()  # persistent XLA cache: relay compiles are 15-40 min cold
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", default=None)
    parser.add_argument("--data", default=None)
    parser.add_argument("--synthetic", type=int, default=0)
    parser.add_argument("--hard", action="store_true",
                        help="value-binding synthetic corpus "
                             "(tools/synthetic.py hard mode)")
    parser.add_argument("--batch-size", dest="batch_size", type=int)
    parser.add_argument("--pretrained", default=None)
    parser.add_argument("--test", action="store_true")
    parser.add_argument("--throughput", action="store_true")
    parser.add_argument("--output", default=None)
    parser.add_argument("--cache-dir", dest="cache_dir", default=None,
                        help="shared image/pos cache dir (pipeline reuse); "
                             "defaults to OUTPUT/cache")
    parser.add_argument("--opts", nargs="+", default=None)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from mvuld_tpu.config import get_config
    from mvuld_tpu.core.logger import create_logger
    from mvuld_tpu.core.optim import build_optimizer
    from mvuld_tpu.core.schedule import build_schedule
    from mvuld_tpu.core.train_state import (TrainState, make_eval_step,
                                            make_train_step)
    from mvuld_tpu.data.loader import steps_per_epoch
    from mvuld_tpu.data.transforms import mixup_cutmix
    from mvuld_tpu.models.swin_v2 import SwinTransformerV2, SwinV2Config
    from mvuld_tpu.parallel.mesh import make_mesh, replicate
    from mvuld_tpu.train.harness import fit, run_eval

    cfg = get_config(args)
    logger = create_logger(cfg.OUTPUT)

    sc = SwinV2Config.from_cfg(cfg)
    on_tpu = jax.default_backend() not in ("cpu",)
    model = SwinTransformerV2(sc, use_checkpoint=cfg.TRAIN.USE_CHECKPOINT,
                              scan_blocks=True, use_pallas=on_tpu,
                              use_pallas_mlp=on_tpu and cfg.TRAIN.FUSED_MLP,
                              window_resident=(on_tpu
                                               and cfg.TRAIN.WINDOW_RESIDENT),
                              remat_stages=tuple(cfg.TRAIN.REMAT_STAGES) or None)
    # the fused-MLP bwd kernel + scan dW accumulator fusion needs ~52 MB of
    # scoped VMEM (default limit 16 MB); the flag must ride the compile
    # request — client-side XLA_FLAGS can't carry TPU flag names here
    compiler_opts = ({"xla_tpu_scoped_vmem_limit_kib": "65536"}
                     if (on_tpu and cfg.TRAIN.FUSED_MLP) else None)
    rng = jax.random.PRNGKey(cfg.SEED)
    size = cfg.DATA.IMG_SIZE
    variables = model.init(rng, jnp.zeros((2, size, size, 3), jnp.float32))
    params = variables["params"]

    if args.pretrained:
        import torch
        from mvuld_tpu.models.swin_convert import swinv2_torch_to_flax
        ckpt = torch.load(args.pretrained, map_location="cpu")
        sd = ckpt.get("model", ckpt)
        from mvuld_tpu.models.swin_convert import to_scan_layout
        params = to_scan_layout(swinv2_torch_to_flax(sd, sc), sc)
        logger.info(f"converted pretrained weights from {args.pretrained}")

    # ---- throughput mode (reference: main.py:438-455)
    if args.throughput or cfg.THROUGHPUT_MODE:
        B = cfg.DATA.BATCH_SIZE

        @jax.jit
        def fwd(p, x):
            return model.apply({"params": p}, x, deterministic=True)

        x = jnp.asarray(np.random.RandomState(0).randn(B, size, size, 3),
                        jnp.float32)
        # reference protocol: 50 warmup + 30 timed iters (main.py:438-455);
        # end-of-loop host fetch instead of block_until_ready (unreliable
        # through tunneled backends)
        for _ in range(50):
            y = fwd(params, x)
        _ = np.asarray(y)
        t0 = time.time()
        for _ in range(30):
            y = fwd(params, x)
        _ = np.asarray(y)
        dt = time.time() - t0
        tp = 30 * B / dt
        logger.info(f"throughput: {tp:.1f} images/s (batch {B})")
        return {"throughput": tp}

    # ---- data
    if args.synthetic:
        from mvuld_tpu.tools.dataset import prepare_corpus
        from mvuld_tpu.tools.synthetic import generate_dataset
        df = prepare_corpus(generate_dataset(args.synthetic,
                                             seed=cfg.SEED or 42,
                                             hard=args.hard))
    else:
        import pandas as pd
        df = pd.read_pickle(args.data)
    cache_root = args.cache_dir or os.path.join(cfg.OUTPUT, "cache")
    img_dir = os.path.join(cache_root, "imgs")
    pos_dir = os.path.join(cache_root, "pos")
    datasets = build_image_datasets(cfg, df, img_dir, pos_dir, logger)
    logger.info(f"dataset sizes: { {k: len(v) for k, v in datasets.items()} }")

    mesh = make_mesh(cfg.PARALLEL.DP, cfg.PARALLEL.MP)
    spe = max(steps_per_epoch(len(datasets["train"]), cfg.DATA.BATCH_SIZE), 1)
    schedule = build_schedule(cfg, spe, cfg.DATA.BATCH_SIZE)
    tx = build_optimizer(cfg, schedule)
    state = TrainState.create(params, tx)

    def apply_fn(vs, batch, rngs, train, mutable=None):
        return model.apply(vs, batch["image"], deterministic=not train,
                           rngs=rngs)

    # batch-level mixup/cutmix producing soft targets (main.py:267-269)
    mix_rng = np.random.RandomState(cfg.SEED + 1)
    use_mix = cfg.AUG.MIXUP > 0 or cfg.AUG.CUTMIX > 0
    # mixup folds LABEL_SMOOTHING into the soft targets; without mixup the
    # reference falls back to LabelSmoothingCrossEntropy (main.py:136-142)
    smoothing = 0.0 if use_mix else cfg.MODEL.LABEL_SMOOTHING

    train_step = make_train_step(apply_fn, tx, label_smoothing=smoothing,
                                 donate=False,
                                 compiler_options=compiler_opts)
    multi_step = None
    if cfg.TRAIN.FUSED_STEPS > 1:
        from mvuld_tpu.core.train_state import make_multi_train_step
        multi_step = make_multi_train_step(apply_fn, tx, cfg.TRAIN.FUSED_STEPS,
                                           label_smoothing=smoothing,
                                           donate=False,
                                           compiler_options=compiler_opts)
    eval_step = make_eval_step(apply_fn)

    def batch_hook(batch, epoch, it):
        if use_mix:
            images, soft = mixup_cutmix(
                batch["image"], batch["label"], cfg.MODEL.NUM_CLASSES, mix_rng,
                cfg.AUG.MIXUP, cfg.AUG.CUTMIX, cfg.AUG.MIXUP_PROB,
                cfg.AUG.MIXUP_SWITCH_PROB, cfg.MODEL.LABEL_SMOOTHING)
            return {**batch, "image": images, "soft_label": soft}
        return batch

    with mesh:
        state = replicate(mesh, state)
        if args.test or cfg.EVAL_MODE:
            metrics = run_eval(eval_step, state, datasets["test"],
                               cfg.DATA.BATCH_SIZE, mesh)
            logger.info(f"TEST(only) {metrics}")
            return {"test_metrics": metrics}
        return fit(cfg=cfg, state=state, train_step=train_step,
                   eval_step=eval_step, train_ds=datasets["train"],
                   val_ds=datasets.get("val", datasets["train"]),
                   test_ds=datasets.get("test"), mesh=mesh,
                   batch_hook=batch_hook, output_dir=cfg.OUTPUT,
                   patience=10, logger=logger, multi_step=multi_step,
                   fused_steps=cfg.TRAIN.FUSED_STEPS)


if __name__ == "__main__":
    main()
