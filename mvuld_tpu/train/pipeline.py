"""Full MVulD pipeline driver: one command from corpus to fused test metrics.

Chains the reference's multi-stage recipe (SURVEY §3.3: process_dataset →
processJoern → getImages → OCR → cunixcoder embeddings → main_bigvul) into
one entry point with idempotent stages:

  1. prepare   — clean/split/rebalance the corpus (or generate synthetic),
  2. text      — fine-tune the UniXcoder classifier; keep encoder + tokenizer,
  3. render    — CPGs → PNGs + oracle/OCR node positions,
  4. cache     — npz feature caches using the TRAINED text encoder
                 (and SwinV2 features — random-init unless --swin-ckpt),
  5. fuse      — train the fusion architecture; report test metrics.

Usage:
  python -m mvuld_tpu.train.pipeline --synthetic 400 --out runs/pipeline \
      [--arch multi_defect_new_gcn] [--data corpus.pkl] [--opts ...]
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None) -> dict:
    parser = argparse.ArgumentParser()
    parser.add_argument("--synthetic", type=int, default=0)
    parser.add_argument("--data", default=None)
    parser.add_argument("--out", required=True)
    parser.add_argument("--arch", default="multi_defect_new_gcn")
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--text-epochs", type=int, default=6)
    parser.add_argument("--fusion-epochs", type=int, default=8)
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
        text_args = ["--synthetic", str(args.synthetic)] + text_args
    else:
        text_args = ["--data", args.data] + text_args
    text_res = text_main(text_args)
    tok = text_res["tokenizer"]
    rcfg = text_res["roberta_config"]
    text_params = jax.device_get(text_res["state"].params)
    logger.info(f"text stage done: best_f1={text_res['best_f1']:.4f}")

    # trained text encoder as a featurizer (sentence embeddings)
    embedder = UniXcoderEmbedder(rcfg)
    emb_params = {"params": {"encoder": text_params["encoder"]}}

    @jax.jit
    def _embed(ids):
        _toks, sent = embedder.apply(emb_params, ids)
        return sent

    def text_encoder(ids: np.ndarray) -> np.ndarray:
        return np.asarray(_embed(jnp.asarray(np.asarray(ids, np.int32))))

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
        df = prepare_corpus(generate_dataset(args.synthetic, seed=cfg.SEED or 42))
    else:
        import pandas as pd
        df = pd.read_pickle(args.data)

    _, swin_encoder = make_random_encoders(cfg)
    cache_dir = os.path.join(args.out, "cache")
    build_fusion_cache(df, cache_dir, cfg, text_encoder=text_encoder,
                       swin_encoder=swin_encoder, tokenizer=tok, logger=logger)

    # ---- stage 5: fusion
    fusion_res = fusion_main([
        "--cache-dir", cache_dir,
        "--batch-size", str(args.batch_size),
        "--output", os.path.join(args.out, "fusion"),
        "--arch", args.arch,
        "--opts", *common_opts,
        "MODEL.MULTI.TEXT_DIM", str(rcfg.hidden_size),
        "TRAIN.EPOCHS", str(args.fusion_epochs),
    ])
    summary = {
        "text_best_f1": text_res["best_f1"],
        "text_test": text_res.get("test_metrics"),
        "fusion_best_f1": fusion_res["best_f1"],
        "fusion_test": fusion_res.get("test_metrics"),
        "arch": args.arch,
    }
    with open(os.path.join(args.out, "pipeline_summary.json"), "w") as f:
        json.dump(summary, f, indent=1, default=float)
    logger.info(f"pipeline summary: {summary}")
    return {**summary, "fusion_result": fusion_res}


if __name__ == "__main__":
    main()
