"""EAST detector training + norm-pos extraction — the OCR/ pipeline.

Mirrors OCR/train.py (Adam 1e-3, step decay at half epochs) and OCR/eval.py
(run detection over rendered graph images → norm_pos_dict pickles). Training
data comes straight from the renderer: every rendered CPG PNG ships exact
node-label boxes (ICDAR-format gt), so the detector trains without any manual
annotation.

Usage:
  python -m mvuld_tpu.train.train_east --synthetic N [--img-size 256]
      [--epochs 20] [--out-dir runs/east] [--eval-only --ckpt ...]
"""

from __future__ import annotations

import argparse
import os
from typing import List, Tuple

import numpy as np


def build_east_corpus(n_funcs: int, img_size: int, seed: int, cache: str,
                      logger=None) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, List[str]]:
    """Render synthetic CPGs; produce (images, score, geo, ignored, paths).
    Images are resized to img_size² with gt boxes scaled accordingly."""
    from PIL import Image

    from mvuld_tpu.ocr.gt import rasterize_gt
    from mvuld_tpu.tools.cpg import extract_line_cpg
    from mvuld_tpu.tools.render import layout, render_cpg
    from mvuld_tpu.tools.synthetic import generate_dataset

    os.makedirs(cache, exist_ok=True)
    npz = os.path.join(cache, f"east_{n_funcs}_{img_size}.npz")
    paths: List[str] = []
    if os.path.exists(npz):
        z = np.load(npz)
        return z["images"], z["score"], z["geo"], z["ignored"], []

    df = generate_dataset(n_funcs, seed=seed)
    images, scores, geos, igns = [], [], [], []
    for _, row in df.iterrows():
        cpg = extract_line_cpg(row.func_before)
        if cpg is None:
            continue
        g = cpg.filtered("all")
        if len(g.nodes) < 2:
            continue
        img_path = os.path.join(cache, f"{int(row._id)}.png")
        img, _pos = render_cpg(g, out_path=img_path)
        boxes_px = layout(g)
        W, H = img.size
        sx, sy = img_size / W, img_size / H
        quads = []
        for (x0, y0, x1, y1) in boxes_px.values():
            quads.append(np.array([[x0 * sx, y0 * sy], [x1 * sx, y0 * sy],
                                   [x1 * sx, y1 * sy], [x0 * sx, y1 * sy]],
                                  np.float32))
        img_r = img.resize((img_size, img_size), Image.BILINEAR)
        x = (np.asarray(img_r, np.float32) / 255.0 - 0.5) / 0.5
        score, geo, ign = rasterize_gt(quads, img_size, img_size)
        images.append(x)
        scores.append(score)
        geos.append(geo)
        igns.append(ign)
        paths.append(img_path)
    arrs = (np.stack(images), np.stack(scores), np.stack(geos), np.stack(igns))
    np.savez_compressed(npz, images=arrs[0], score=arrs[1], geo=arrs[2],
                        ignored=arrs[3])
    if logger:
        logger.info(f"built EAST corpus: {arrs[0].shape[0]} images")
    return (*arrs, paths)


def main(argv=None) -> dict:
    parser = argparse.ArgumentParser()
    parser.add_argument("--synthetic", type=int, default=100)
    parser.add_argument("--img-size", type=int, default=256)
    parser.add_argument("--epochs", type=int, default=20)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--out-dir", default="runs/east")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from mvuld_tpu.core.checkpoint import save_checkpoint
    from mvuld_tpu.core.logger import create_logger
    from mvuld_tpu.ocr.east import EAST, east_loss

    logger = create_logger(args.out_dir)
    images, score_gt, geo_gt, ignored, _ = build_east_corpus(
        args.synthetic, args.img_size, args.seed,
        os.path.join(args.out_dir, "corpus"), logger)
    n = images.shape[0]
    logger.info(f"EAST corpus: {n} images of {args.img_size}²")

    model = EAST()
    rng = jax.random.PRNGKey(args.seed)
    variables = model.init(rng, jnp.zeros((1, args.img_size, args.img_size, 3)))
    params, batch_stats = variables["params"], variables["batch_stats"]

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
        for b in range(n // args.batch_size):
            idx = order[b * args.batch_size:(b + 1) * args.batch_size]
            batch = {"image": jnp.asarray(images[idx]),
                     "score": jnp.asarray(score_gt[idx]),
                     "geo": jnp.asarray(geo_gt[idx]),
                     "ignored": jnp.asarray(ignored[idx])}
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state, batch)
            epoch_loss.append(float(loss))
        step_losses.append(float(np.mean(epoch_loss)))
        logger.info(f"epoch {epoch}: loss {step_losses[-1]:.4f}")

    save_checkpoint(args.out_dir, args.epochs,
                    {"params": jax.device_get(params),
                     "batch_stats": jax.device_get(batch_stats)})
    return {"params": params, "batch_stats": batch_stats,
            "losses": step_losses, "model": model}


if __name__ == "__main__":
    main()
