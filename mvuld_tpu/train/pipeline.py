"""Full MVulD pipeline driver: one command from corpus to fused test metrics.

Chains the reference's multi-stage recipe (SURVEY §3.3: process_dataset →
processJoern → getImages → OCR → cunixcoder embeddings → main_bigvul) into
one entry point with idempotent stages:

  1. prepare   — clean/split/rebalance the corpus (or generate synthetic),
  2. text      — fine-tune the UniXcoder classifier; keep encoder + tokenizer,
  3. image     — fine-tune SwinV2 on the rendered graphs (--swin-epochs N) or
                 load a trained best-F1 checkpoint (--swin-ckpt DIR|PATH); the
                 FROZEN trained encoder then produces img_emb, mirroring the
                 reference's load_bestf1_swin + cache_swin_features
                 (mvuld/data/bigvul_dataset.py:60-80,104-106;
                 data_list.py:179-211). Without either flag a random
                 projection stands in (tests without checkpoints).
  4. render    — CPGs → PNGs + oracle/OCR node positions,
  5. cache     — npz feature caches from the TRAINED text + image encoders,
  6. fuse      — train the fusion architecture; report test metrics.

Usage:
  python -m mvuld_tpu.train.pipeline --synthetic 400 --out runs/pipeline \
      [--arch multi_defect_new_gcn] [--swin-epochs 3 | --swin-ckpt runs/swin] \
      [--data corpus.pkl] [--opts ...]
"""

from __future__ import annotations

import argparse
import json
import os


def _ocr_positions(east_ckpt: str, df, cache_dir: str, out_dir: str, cfg,
                   logger) -> dict:
    """Produce node positions the reference's production way: EAST detection
    + line-number recognition over the rendered PNGs (OCR/detect.py
    detect_dataset_map:285-353), writing norm-pos pickles to ``out_dir``.
    Returns recovery stats vs the renderer's oracle boxes."""
    from mvuld_tpu.ocr.detect import detect_dataset_map, load_east_detector
    from mvuld_tpu.tools.render import load_norm_pos
    from mvuld_tpu.train.precompute import render_corpus

    img_dir = os.path.join(cache_dir, "imgs")
    oracle_dir = os.path.join(cache_dir, "pos")
    paths = render_corpus(df, img_dir, oracle_dir, cfg.DATA.GTYPE, logger)

    apply_fn, east_params = load_east_detector(east_ckpt)
    # pad_to=256 buckets the relay compiles to a handful of shapes
    detect_dataset_map(apply_fn, east_params,
                       [paths[_id] for _id in sorted(paths)], out_dir,
                       pad_to=256, logger=None)

    total = recovered = 0
    for _id in paths:
        oracle = load_norm_pos(os.path.join(oracle_dir, f"{_id}.pkl"))
        ocr = load_norm_pos(os.path.join(out_dir, f"{_id}.pkl"))
        total += len(oracle)
        recovered += sum(1 for lineno in oracle if lineno in ocr)
    stats = {"ocr_node_recovery": recovered / max(total, 1),
             "ocr_images": len(paths), "ocr_oracle_nodes": total}
    if logger:
        logger.info(f"OCR positions: {stats}")
    return stats


def main(argv=None) -> dict:
    from mvuld_tpu.parallel.mesh import enable_compile_cache
    enable_compile_cache()  # persistent XLA cache: relay compiles are 15-40 min cold
    parser = argparse.ArgumentParser()
    parser.add_argument("--synthetic", type=int, default=0)
    parser.add_argument("--hard", action="store_true",
                        help="value-binding synthetic corpus "
                             "(tools/synthetic.py hard mode)")
    parser.add_argument("--data", default=None)
    parser.add_argument("--out", required=True)
    parser.add_argument("--arch", default="multi_defect_new_gcn")
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--text-epochs", type=int, default=6)
    parser.add_argument("--swin-epochs", type=int, default=0,
                        help="fine-tune SwinV2 on the rendered graphs for N "
                             "epochs before caching image features")
    parser.add_argument("--swin-ckpt", default=None,
                        help="trained SwinV2 checkpoint: an orbax ckpt path, "
                             "a train_swin output dir (best-F1 picked), or a "
                             "torch .pth to convert (used as --pretrained "
                             "when fine-tuning)")
    parser.add_argument("--fusion-epochs", type=int, default=8)
    parser.add_argument("--east-ckpt", default=None,
                        help="trained EAST checkpoint (train_east --out-dir "
                             "root or an orbax ckpt path): node positions "
                             "then come from EAST detection + line-number "
                             "recognition over the rendered PNGs — the "
                             "reference's production OCR path (OCR/detect.py "
                             "detect_dataset_map) — instead of the "
                             "renderer's oracle boxes")
    parser.add_argument("--opts", nargs="+", default=None)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mvuld_tpu.core.logger import create_logger
    from mvuld_tpu.models.unixcoder import UniXcoderEmbedder
    from mvuld_tpu.train.precompute import build_fusion_cache, make_random_encoders
    from mvuld_tpu.train.train_fusion import main as fusion_main
    from mvuld_tpu.train.train_text import main as text_main

    logger = create_logger(args.out)
    os.makedirs(args.out, exist_ok=True)

    common_opts = list(args.opts or [])

    # ---- stages 1-2: corpus + text encoder
    text_out = os.path.join(args.out, "text")
    text_args = ["--batch-size", str(args.batch_size), "--output", text_out,
                 "--opts", *common_opts,
                 "TRAIN.EPOCHS", str(args.text_epochs)]
    if args.synthetic:
        text_args = ["--synthetic", str(args.synthetic)] + \
            (["--hard"] if args.hard else []) + text_args
    else:
        text_args = ["--data", args.data] + text_args
    text_res = text_main(text_args)
    tok = text_res["tokenizer"]
    rcfg = text_res["roberta_config"]
    text_params = jax.device_get(text_res["state"].params)
    text_best_f1 = text_res["best_f1"]
    text_test = text_res.get("test_metrics")
    logger.info(f"text stage done: best_f1={text_best_f1:.4f}")
    # free the text TrainState (encoder + Adam moments, ~1.5 GB at
    # UniXcoder-base dims) BEFORE the swin stage compiles: at production
    # dims the 448² swin fine-tune needs the HBM (observed OOM when the
    # text buffers lingered). The featurizer is rebuilt lazily below.
    del text_res
    import gc
    gc.collect()

    # trained text encoder as a featurizer (sentence embeddings); the jit
    # closure pins the encoder constants to the device, so it is built
    # ON FIRST USE — after the swin stage has trained and released its
    # optimizer state
    embedder = UniXcoderEmbedder(rcfg)
    _embed_jit = []

    def text_encoder(ids: np.ndarray) -> np.ndarray:
        if not _embed_jit:
            # params ride as jit ARGUMENTS, not closure constants: closed-over
            # arrays are inlined into the shipped StableHLO, and a 126M-param
            # encoder (~500 MB of literals) overflows the relay's compile-
            # request limit (HTTP 413). They must also be DEVICE-RESIDENT:
            # passing the host-numpy tree re-uploads all ~500 MB on EVERY
            # dispatch — over the ~5 MB/s relay that is ~100 s/call and,
            # with the relay client's per-transfer-byte RAM leak, what
            # host-OOM-killed the 2400-function cache stage twice (r5).
            @jax.jit
            def _embed(enc_params, ids):
                _toks, sent = embedder.apply(
                    {"params": {"encoder": enc_params}}, ids)
                return sent

            _embed_jit.append((_embed,
                               jax.device_put(text_params["encoder"])))
        fn, dev_params = _embed_jit[0]
        return np.asarray(fn(dev_params,
                             jnp.asarray(np.asarray(ids, np.int32))))

    # ---- stages 3-4: render + caches (trained text, swin features)
    from mvuld_tpu.config import get_config

    class _A:
        cfg = None
        opts = common_opts or None
        batch_size = args.batch_size

    cfg = get_config(_A())
    cfg.defrost()
    cfg.MODEL.MULTI.TEXT_DIM = rcfg.hidden_size
    cfg.freeze()

    if args.synthetic:
        from mvuld_tpu.tools.dataset import prepare_corpus
        from mvuld_tpu.tools.synthetic import generate_dataset
        df = prepare_corpus(generate_dataset(args.synthetic,
                                             seed=cfg.SEED or 42,
                                             hard=args.hard))
    else:
        import pandas as pd
        df = pd.read_pickle(args.data)

    cache_dir = os.path.join(args.out, "cache")

    # ---- stage: trained image encoder (fine-tune and/or load best-F1)
    swin_encoder = None
    swin_best_f1 = swin_test = None
    if args.swin_epochs > 0 or args.swin_ckpt:
        from mvuld_tpu.models.swin_v2 import SwinTransformerV2, SwinV2Config

        sc = SwinV2Config.from_cfg(cfg)
        if args.swin_epochs > 0:
            from mvuld_tpu.train.train_swin import main as swin_main
            swin_args = ["--batch-size", str(args.batch_size),
                         "--output", os.path.join(args.out, "swin"),
                         "--cache-dir", cache_dir]
            if args.swin_ckpt and args.swin_ckpt.endswith((".pth", ".pt", ".bin")):
                swin_args += ["--pretrained", args.swin_ckpt]
            if args.synthetic:
                swin_args = ["--synthetic", str(args.synthetic)] + \
                    (["--hard"] if args.hard else []) + swin_args
            else:
                swin_args = ["--data", args.data] + swin_args
            swin_args += ["--opts", *common_opts,
                          "TRAIN.EPOCHS", str(args.swin_epochs)]
            swin_res = swin_main(swin_args)
            swin_params = jax.device_get(swin_res["state"].params)
            swin_best_f1 = swin_res["best_f1"]
            swin_test = swin_res.get("test_metrics")
            logger.info(f"swin stage done: best_f1={swin_best_f1:.4f}")
            # release the swin TrainState (params + AdamW moments) before
            # the frozen-featurizer jit pins its own copy of the params
            del swin_res
            import gc
            gc.collect()
        else:
            from mvuld_tpu.core.checkpoint import (load_checkpoint,
                                                   resume_bestf1_helper)
            path = args.swin_ckpt
            if os.path.isdir(path) and not os.path.basename(path).startswith(
                    "best_f1_epoch_"):
                # a train_swin output root: find checkpoint-best-f1 anywhere
                # under it (OUTPUT/MODEL.NAME/TAG nesting, config.py:257)
                import glob
                cands = sorted(glob.glob(os.path.join(
                    path, "**", "checkpoint-best-f1"), recursive=True))
                if not cands:
                    raise FileNotFoundError(
                        f"no checkpoint-best-f1 under {path}")
                path = resume_bestf1_helper(os.path.dirname(cands[-1]))
            swin_params = load_checkpoint(path)["params"]
            logger.info(f"loaded trained swin encoder from {path}")

        # frozen forward_features featurizer (cache_swin_features equivalent);
        # params as jit ARGUMENTS — closure constants are inlined into the
        # shipped StableHLO and 88M params (~350 MB of literals) overflow the
        # relay's compile-request limit (HTTP 413)
        swin_model = SwinTransformerV2(sc, scan_blocks=True)

        @jax.jit
        def _feat(params, x):
            return swin_model.apply({"params": params}, x,
                                    deterministic=True, return_features=True)

        # device-resident ONCE — a host-numpy tree as a jit argument
        # re-uploads ~350 MB per dispatch over the relay (see text_encoder)
        swin_params_dev = jax.device_put(swin_params)

        def swin_encoder(imgs: np.ndarray) -> np.ndarray:
            return np.asarray(_feat(
                swin_params_dev, jnp.asarray(np.asarray(imgs), jnp.float32)))

        cfg.defrost()
        cfg.MODEL.MULTI.IMG_DIM = sc.num_features
        cfg.freeze()

    if swin_encoder is None:
        _, swin_encoder = make_random_encoders(cfg)

    # ---- optional OCR stage: EAST-detected node positions (reference's
    # production path) instead of the renderer oracle. The npz caches go to
    # a separate dir (imgs/pos symlinked, not re-rendered) so oracle- and
    # OCR-positioned caches can never silently shadow each other.
    ocr_stats = None
    npz_dir = cache_dir
    if args.east_ckpt:
        ocr_pos_dir = os.path.join(cache_dir, "pos_ocr")
        ocr_stats = _ocr_positions(args.east_ckpt, df, cache_dir, ocr_pos_dir,
                                   cfg, logger)
        npz_dir = os.path.join(args.out, "cache_ocr")
        os.makedirs(npz_dir, exist_ok=True)
        for sub in ("imgs", "pos"):
            link = os.path.join(npz_dir, sub)
            if not os.path.exists(link):
                os.symlink(os.path.abspath(os.path.join(cache_dir, sub)),
                           link)
        build_fusion_cache(df, npz_dir, cfg, text_encoder=text_encoder,
                           swin_encoder=swin_encoder, tokenizer=tok,
                           logger=logger, pos_dir=ocr_pos_dir)
    else:
        build_fusion_cache(df, cache_dir, cfg, text_encoder=text_encoder,
                           swin_encoder=swin_encoder, tokenizer=tok,
                           logger=logger)

    # ---- stage 5: fusion
    fusion_res = fusion_main([
        "--cache-dir", npz_dir,
        "--batch-size", str(args.batch_size),
        "--output", os.path.join(args.out, "fusion"),
        "--arch", args.arch,
        "--opts", *common_opts,
        "MODEL.MULTI.TEXT_DIM", str(rcfg.hidden_size),
        "MODEL.MULTI.IMG_DIM", str(cfg.MODEL.MULTI.IMG_DIM),
        "TRAIN.EPOCHS", str(args.fusion_epochs),
    ])
    summary = {
        "text_best_f1": text_best_f1,
        "text_test": text_test,
        "fusion_best_f1": fusion_res["best_f1"],
        "fusion_test": fusion_res.get("test_metrics"),
        "arch": args.arch,
        "image_encoder": ("trained" if (args.swin_epochs > 0 or args.swin_ckpt)
                          else "random_projection"),
        "positions": "ocr" if args.east_ckpt else "oracle",
        "swin_best_f1": swin_best_f1,
        "swin_test": swin_test,
    }
    if ocr_stats:
        summary.update(ocr_stats)
    with open(os.path.join(args.out, "pipeline_summary.json"), "w") as f:
        json.dump(summary, f, indent=1, default=float)
    logger.info(f"pipeline summary: {summary}")
    return {**summary, "fusion_result": fusion_res}


if __name__ == "__main__":
    main()
