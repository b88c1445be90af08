"""EAST detector training + norm-pos extraction — the OCR/ pipeline.

Mirrors OCR/train.py (Adam 1e-3, step decay at half epochs) with the
reference's ACTIVE data augmentation: per-step text-region-aware random
crops (OCR/dataset.py crop_img:197-248, applied in __getitem__ at :415)
plus ColorJitter(0.5, 0.5, 0.5) (:416) — gt score/geo maps are rasterized
AFTER the crop, exactly like get_score_geo on the cropped region. The
height-adjust/rotate augmentations are commented out in the reference
(:413-414) and intentionally not mirrored.

Training data comes straight from the renderer: every rendered CPG PNG
ships exact node-label boxes (ICDAR-format gt), so the detector trains
without manual annotation. ``--eval-style heldout`` additionally renders an
eval corpus in a DIFFERENT visual style (other font face/size, spacing,
rectangular nodes — tools/render.py HELD_OUT_STYLE) as a proxy for real
Graphviz output and reports ICDAR H-mean on it.

Usage:
  python -m mvuld_tpu.train.train_east --synthetic N [--img-size 256]
      [--epochs 20] [--no-crop] [--eval-synthetic M --eval-style heldout]
"""

from __future__ import annotations

import argparse
import os
from typing import List, Tuple

import numpy as np

MAX_QUADS = 64          # per-image quad padding in the canvas cache


def build_east_corpus(n_funcs: int, canvas_size: int, seed: int, cache: str,
                      logger=None, style=None, tag: str = "default"
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, List[str]]:
    """Render synthetic CPGs to fixed canvases WITHOUT rasterizing gt.

    Returns (images [n, S, S, 3] uint8, quads [n, MAX_QUADS, 4, 2] px,
    nquads [n], paths). gt maps are rasterized per training step, after the
    crop augmentation (reference order: crop, then get_score_geo).
    """
    from PIL import Image

    from mvuld_tpu.tools.cpg import extract_line_cpg
    from mvuld_tpu.tools.render import DEFAULT_STYLE, layout, render_cpg
    from mvuld_tpu.tools.synthetic import generate_dataset

    randomize = style == "random"
    style = DEFAULT_STYLE if randomize else (style or DEFAULT_STYLE)
    os.makedirs(cache, exist_ok=True)
    # the seed is part of the key: the eval corpus (seed+10000) must never
    # alias the training corpus cache even when n/size/tag coincide
    npz = os.path.join(
        cache, f"east_canvas_{n_funcs}_{canvas_size}_{tag}_s{seed}.npz")
    if os.path.exists(npz):
        z = np.load(npz)
        return z["images"], z["quads"], z["nquads"], []

    df = generate_dataset(n_funcs, seed=seed)
    style_rng = np.random.RandomState(seed ^ 0x5EED)
    images, quads_all, nquads, paths = [], [], [], []
    for _, row in df.iterrows():
        cpg = extract_line_cpg(row.func_before)
        if cpg is None:
            continue
        g = cpg.filtered("all")
        if len(g.nodes) < 2:
            continue
        if randomize:
            # per-image domain randomization (geometry/shape/size only; the
            # held-out font face is never sampled — render.random_style)
            from mvuld_tpu.tools.render import random_style
            style = random_style(style_rng)
        img_path = os.path.join(cache, f"{tag}_{int(row._id)}.png")
        img, _pos = render_cpg(g, out_path=img_path, style=style)
        boxes_px = layout(g, style)
        W, H = img.size
        sx, sy = canvas_size / W, canvas_size / H
        q = np.zeros((MAX_QUADS, 4, 2), np.float32)
        if len(boxes_px) > MAX_QUADS:
            # a truncated gt would supervise the dropped text as BACKGROUND
            # (training against real text); skip oversized functions instead
            if logger:
                logger.info(f"skipping {tag}_{int(row._id)}: "
                            f"{len(boxes_px)} text boxes > MAX_QUADS="
                            f"{MAX_QUADS}")
            continue
        n_q = min(len(boxes_px), MAX_QUADS)
        for k, (x0, y0, x1, y1) in enumerate(list(boxes_px.values())[:MAX_QUADS]):
            q[k] = [[x0 * sx, y0 * sy], [x1 * sx, y0 * sy],
                    [x1 * sx, y1 * sy], [x0 * sx, y1 * sy]]
        img_r = img.resize((canvas_size, canvas_size), Image.BILINEAR)
        images.append(np.asarray(img_r, np.uint8))
        quads_all.append(q)
        nquads.append(n_q)
        paths.append(img_path)
    arrs = (np.stack(images), np.stack(quads_all),
            np.asarray(nquads, np.int32))
    np.savez_compressed(npz, images=arrs[0], quads=arrs[1], nquads=arrs[2])
    if logger:
        logger.info(f"built EAST canvas corpus ({tag}): "
                    f"{arrs[0].shape[0]} images of {canvas_size}²")
    return (*arrs, paths)


def _normalize(img_np: np.ndarray) -> np.ndarray:
    """uint8 → the reference's Normalize(mean=.5, std=.5) float input."""
    return (img_np.astype(np.float32) / 255.0 - 0.5) / 0.5


def make_batch(images: np.ndarray, quads: np.ndarray, nquads: np.ndarray,
               idx: np.ndarray, img_size: int, rng: np.random.RandomState,
               crop: bool = True) -> dict:
    """Host-side batch assembly: crop (or plain resize), jitter, rasterize.
    Runs on the host per step — the TPU sees only fixed [B, L, L, 3]."""
    from PIL import Image

    from mvuld_tpu.data.transforms import color_jitter
    from mvuld_tpu.ocr.gt import crop_with_text, rasterize_gt

    xs, ss, gs, igs = [], [], [], []
    for i in idx:
        img = Image.fromarray(images[i])
        q = quads[i, : nquads[i]]
        if crop:
            img, q = crop_with_text(img, q, img_size, rng)
            img = color_jitter(img, rng, strength=0.5)
        elif img.size != (img_size, img_size):
            sx = img_size / img.width
            sy = img_size / img.height
            img = img.resize((img_size, img_size), Image.BILINEAR)
            q = q.copy()
            q[..., 0] *= sx
            q[..., 1] *= sy
        score, geo, ign = rasterize_gt(list(q), img_size, img_size)
        xs.append(_normalize(np.asarray(img)))
        ss.append(score)
        gs.append(geo)
        igs.append(ign)
    return {"image": np.stack(xs), "score": np.stack(ss),
            "geo": np.stack(gs), "ignored": np.stack(igs)}


def evaluate_hmean(model, params, batch_stats, images, quads, nquads,
                   img_size: int, batch_size: int = 8) -> dict:
    """ICDAR IoU-0.5 H-mean of the detector on a canvas corpus (resized to
    the model input size; quads scaled along)."""
    import jax.numpy as jnp
    from PIL import Image

    from mvuld_tpu.ocr.detect import get_boxes
    from mvuld_tpu.ocr.icdar_eval import evaluate_dataset, evaluate_detections

    per_image = []
    n = images.shape[0]
    for lo in range(0, n, batch_size):
        idx = np.arange(lo, min(lo + batch_size, n))
        xs, gts = [], []
        for i in idx:
            img = Image.fromarray(images[i])
            sx, sy = img_size / img.width, img_size / img.height
            q = quads[i, : nquads[i]].copy()
            q[..., 0] *= sx
            q[..., 1] *= sy
            xs.append(_normalize(np.asarray(
                img.resize((img_size, img_size), Image.BILINEAR))))
            gts.append(q)
        score, geo = model.apply(
            {"params": params, "batch_stats": batch_stats},
            jnp.asarray(np.stack(xs)), train=False)
        score, geo = np.asarray(score), np.asarray(geo)
        for k in range(len(idx)):
            boxes = get_boxes(score[k], geo[k])
            det = ([] if boxes is None
                   else [b[:8].reshape(4, 2) for b in boxes])
            per_image.append(evaluate_detections(
                list(gts[k]), [False] * len(gts[k]), det))
    return evaluate_dataset(per_image)


def evaluate_recovery(model, params, batch_stats, n_funcs: int, seed: int,
                      style, cache: str, logger=None) -> dict:
    """End-to-end line-number recovery on ORIGINAL rendered PNGs.

    The production path the reference cares about is detect → crop →
    read line number → norm_pos dict (OCR/detect.py:285-353 + Tesseract).
    H-mean only scores the boxes; this scores the full chain: a gt node
    counts as RECOVERED iff its line number appears in the extracted
    norm_pos dict AND the recovered box's center falls inside the gt box.
    Runs on the natively-sized render (no canvas resize), exactly like
    tools' detect_dataset_map consumption.
    """
    from PIL import Image

    from mvuld_tpu.ocr.detect import detect_image
    from mvuld_tpu.ocr.recognize import LinenoReader
    from mvuld_tpu.tools.cpg import extract_line_cpg
    from mvuld_tpu.tools.render import layout, render_cpg
    from mvuld_tpu.tools.synthetic import generate_dataset

    import jax.numpy as jnp

    def apply_fn(p, x):
        return model.apply({"params": p, "batch_stats": batch_stats},
                           jnp.asarray(x), train=False)

    reader = LinenoReader()
    df = generate_dataset(n_funcs, seed=seed)
    total_gt = recovered = wrong_lineno = extra = 0
    n_imgs = 0
    os.makedirs(cache, exist_ok=True)
    for _, row in df.iterrows():
        cpg = extract_line_cpg(row.func_before)
        if cpg is None:
            continue
        g = cpg.filtered("all")
        if len(g.nodes) < 2 or len(g.nodes) > MAX_QUADS:
            continue
        img, _ = render_cpg(g, out_path=None, style=style)
        gt_boxes = layout(g, style)               # {lineno: (x0,y0,x1,y1)}
        n_imgs += 1
        total_gt += len(gt_boxes)
        # pad_to buckets the natively-sized renders into a handful of input
        # shapes — on the TPU relay every distinct shape is a minutes-long
        # compile, and 200 natural sizes would turn this eval into hours
        boxes = detect_image(apply_fn, params, img, pad_to=256)
        pos = {}
        if boxes is not None:
            W, H = img.size
            for b in boxes:
                xs, ys = b[0:8:2], b[1:8:2]
                x0, x1 = float(xs.min()), float(xs.max())
                y0, y1 = float(ys.min()), float(ys.max())
                pad = 2
                crop = img.crop((max(x0 - pad, 0), max(y0 - pad, 0),
                                 min(x1 + pad, W), min(y1 + pad, H)))
                lineno = reader.read(crop)
                if lineno is not None:
                    pos[lineno] = (x0, y0, x1, y1)
        for lineno, (gx0, gy0, gx1, gy1) in gt_boxes.items():
            if lineno not in pos:
                continue
            x0, y0, x1, y1 = pos[lineno]
            cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
            if gx0 <= cx <= gx1 and gy0 <= cy <= gy1:
                recovered += 1
            else:
                wrong_lineno += 1
        extra += sum(1 for ln in pos if ln not in gt_boxes)
    out = {
        "images": n_imgs, "gt_nodes": total_gt,
        "recovered": recovered,
        "recovery_rate": round(recovered / max(total_gt, 1), 4),
        "misplaced": wrong_lineno, "spurious_linenos": extra,
    }
    if logger:
        logger.info(f"lineno recovery: {out}")
    return out


def _run_evals(args, model, params, batch_stats, logger, result) -> dict:
    """Held-out-style H-mean + line-number recovery evals (shared by the
    training path and --eval-only)."""
    crop = not args.no_crop
    canvas = int(args.img_size * args.canvas_scale) if crop else args.img_size
    if args.eval_synthetic:
        from mvuld_tpu.tools.render import DEFAULT_STYLE, HELD_OUT_STYLE
        style = (HELD_OUT_STYLE if args.eval_style == "heldout"
                 else DEFAULT_STYLE)
        ev_imgs, ev_quads, ev_nq, _ = build_east_corpus(
            args.eval_synthetic, canvas, args.seed + 10_000,
            os.path.join(args.out_dir, "corpus"), logger, style=style,
            tag=args.eval_style)
        metrics = evaluate_hmean(model, params, batch_stats, ev_imgs,
                                 ev_quads, ev_nq, args.img_size)
        logger.info(f"detection eval ({args.eval_style} style): {metrics}")
        result["eval"] = metrics

    if args.eval_recovery:
        from mvuld_tpu.tools.render import DEFAULT_STYLE, HELD_OUT_STYLE
        style = (HELD_OUT_STYLE if args.eval_style == "heldout"
                 else DEFAULT_STYLE)
        result["recovery"] = evaluate_recovery(
            model, params, batch_stats, args.eval_recovery,
            args.seed + 20_000, style, os.path.join(args.out_dir, "corpus"),
            logger)
    return result


def main(argv=None) -> dict:
    from mvuld_tpu.parallel.mesh import enable_compile_cache
    enable_compile_cache()  # persistent XLA cache: relay compiles are 15-40 min cold
    parser = argparse.ArgumentParser()
    parser.add_argument("--synthetic", type=int, default=100)
    parser.add_argument("--img-size", type=int, default=256)
    parser.add_argument("--canvas-scale", type=float, default=1.5,
                        help="canvas side = scale · img-size (crop source)")
    parser.add_argument("--epochs", type=int, default=20)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--train-style", choices=["default", "random"],
                        default="default",
                        help="'random' = per-image domain randomization "
                             "(geometry/shape/font-size jitter; the "
                             "held-out font face is never sampled)")
    parser.add_argument("--no-crop", action="store_true",
                        help="disable the reference crop augmentation")
    parser.add_argument("--eval-synthetic", type=int, default=0,
                        help="render M extra functions for detection eval")
    parser.add_argument("--eval-style", choices=["default", "heldout"],
                        default="default")
    parser.add_argument("--eval-recovery", type=int, default=0,
                        help="run detect→recognize line-number recovery on N "
                             "natively-rendered eval functions")
    parser.add_argument("--out-dir", default="runs/east")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--eval-only", default=None, metavar="CKPT_DIR",
                        help="skip training; load the newest ckpt_epoch_* "
                             "under CKPT_DIR and run the requested evals")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from mvuld_tpu.core.checkpoint import save_checkpoint
    from mvuld_tpu.core.logger import create_logger
    from mvuld_tpu.ocr.east import EAST, east_loss

    logger = create_logger(args.out_dir)
    crop = not args.no_crop
    canvas = int(args.img_size * args.canvas_scale) if crop else args.img_size
    images, quads, nquads, _ = build_east_corpus(
        args.synthetic, canvas, args.seed,
        os.path.join(args.out_dir, "corpus"), logger,
        style="random" if args.train_style == "random" else None,
        tag=args.train_style)
    n = images.shape[0]
    logger.info(f"EAST corpus: {n} canvases of {canvas}², "
                f"crop={'on' if crop else 'off'} → {args.img_size}²")

    model = EAST()
    rng = jax.random.PRNGKey(args.seed)
    variables = model.init(rng, jnp.zeros((1, args.img_size, args.img_size, 3)))
    params, batch_stats = variables["params"], variables["batch_stats"]

    if args.eval_only:
        import glob

        from mvuld_tpu.core.checkpoint import load_checkpoint
        cands = glob.glob(os.path.join(args.eval_only, "**", "ckpt_epoch_*"),
                          recursive=True)
        if not cands:
            raise FileNotFoundError(f"no ckpt_epoch_* under {args.eval_only}")
        state = load_checkpoint(
            max(cands, key=lambda p: int(p.rsplit("_", 1)[1])))
        params, batch_stats = state["params"], state["batch_stats"]
        result = {"losses": [], "model": model}
        return _run_evals(args, model, params, batch_stats, logger, result)

    # Adam + step decay at half the epochs (reference: OCR/train.py:25-33)
    steps = max(n // args.batch_size, 1) * args.epochs
    schedule = optax.piecewise_constant_schedule(
        args.lr, {steps // 2: 0.1})
    tx = optax.adam(schedule)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, batch):
        def loss_fn(p):
            (score, geo), mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, batch["image"],
                train=True, mutable=["batch_stats"])
            loss = east_loss(batch["score"], score, batch["geo"], geo,
                             batch["ignored"])
            return loss, mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_bs, new_opt, loss

    rng_np = np.random.RandomState(args.seed)
    step_losses = []
    for epoch in range(args.epochs):
        order = rng_np.permutation(n)
        epoch_loss = []
        for b in range(max(n // args.batch_size, 1)):
            idx = order[b * args.batch_size:(b + 1) * args.batch_size]
            if len(idx) == 0:
                continue
            host = make_batch(images, quads, nquads, idx, args.img_size,
                              rng_np, crop=crop)
            batch = {k: jnp.asarray(v) for k, v in host.items()}
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state, batch)
            epoch_loss.append(float(loss))
        step_losses.append(float(np.mean(epoch_loss)))
        logger.info(f"epoch {epoch}: loss {step_losses[-1]:.4f}")

    save_checkpoint(args.out_dir, args.epochs,
                    {"params": jax.device_get(params),
                     "batch_stats": jax.device_get(batch_stats)})
    result = {"params": params, "batch_stats": batch_stats,
              "losses": step_losses, "model": model}
    return _run_evals(args, model, params, batch_stats, logger, result)


if __name__ == "__main__":
    main()
