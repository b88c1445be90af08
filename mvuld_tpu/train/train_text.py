"""Text-only vulnerability classifier — the cUniXcoder baseline path.

Mirrors baselines/models/cunixcoder/main.py: fine-tune UniXcoder + linear
2-class head on function text, best-F1 early stopping, and a
``--save-embeddings`` mode that exports per-function 768-d representations —
the text features the fusion model consumes (reference: get_representation,
cunixcoder/main.py:141-188, consumed at mvuld/data/data_list.py:219-222).

Usage:
  python -m mvuld_tpu.train.train_text --cfg cfg.yaml --data corpus.pkl \
      [--synthetic N] [--save-embeddings out.pkl] [--test] \
      [--tokenizer tok.json] [--opts KEY VALUE ...]
"""

from __future__ import annotations

import argparse
import os
import pickle
from typing import Optional

import numpy as np


def build_text_datasets(df, tokenizer, max_length: int):
    """Tokenize each partition's functions into [N, T] id arrays."""
    from mvuld_tpu.data.loader import ArrayDataset

    out = {}
    for part in ("train", "val", "test"):
        rows = df[df.label == part]
        if len(rows) == 0:
            continue
        ids = tokenizer.tokenize(rows.func_before.tolist(),
                                 max_length=max_length)
        out[part] = ArrayDataset({
            "input_ids": ids,
            "label": rows.vul.to_numpy().astype(np.int32),
            "_id": rows._id.to_numpy().astype(np.int64),
        })
    return out


def get_or_train_tokenizer(df, path: Optional[str], vocab_size: int = 8192):
    from mvuld_tpu.data.tokenizer import CodeTokenizer
    if path and os.path.exists(path):
        return CodeTokenizer.load(path)
    tok = CodeTokenizer.train(df.func_before.tolist(), vocab_size=vocab_size)
    if path:
        tok.save(path)
    return tok


def main(argv=None) -> dict:
    from mvuld_tpu.parallel.mesh import enable_compile_cache
    enable_compile_cache()  # persistent XLA cache: relay compiles are 15-40 min cold
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", default=None)
    parser.add_argument("--data", default=None, help="corpus pickle (pandas)")
    parser.add_argument("--synthetic", type=int, default=0,
                        help="generate N synthetic functions instead of --data")
    parser.add_argument("--hard", action="store_true",
                        help="value-binding synthetic corpus "
                             "(tools/synthetic.py hard mode)")
    parser.add_argument("--batch-size", dest="batch_size", type=int)
    parser.add_argument("--tokenizer", default=None)
    parser.add_argument("--pretrained", default=None,
                        help="torch pytorch_model.bin to convert")
    parser.add_argument("--save-embeddings", default=None)
    parser.add_argument("--test", action="store_true")
    parser.add_argument("--output", default=None)
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
    from mvuld_tpu.models.roberta import RobertaConfig
    from mvuld_tpu.models.unixcoder import UniXcoderClassifier, UniXcoderEmbedder
    from mvuld_tpu.parallel.mesh import make_mesh, replicate
    from mvuld_tpu.train.harness import fit, run_eval
    from mvuld_tpu.utils.torch_convert import roberta_torch_to_flax

    cfg = get_config(args)
    logger = create_logger(cfg.OUTPUT)

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
    # tokenizer persists next to the run so downstream stages (fusion caches,
    # patch eval) tokenize identically
    tok_path = args.tokenizer or os.path.join(cfg.OUTPUT, "tokenizer.json")
    tok = get_or_train_tokenizer(df, tok_path)

    u = cfg.MODEL.UNIXCODER
    rcfg = RobertaConfig(
        vocab_size=max(tok.vocab_size, 16), hidden_size=u.HIDDEN,
        num_layers=u.LAYERS, num_heads=u.HEADS, intermediate_size=u.INTERMEDIATE,
        max_position_embeddings=u.MAX_POSITIONS,
        dtype=jnp.bfloat16 if cfg.PARALLEL.DTYPE == "bfloat16" else jnp.float32)
    datasets = build_text_datasets(df, tok, cfg.DATA.FUNC_TOKENS)
    logger.info(f"dataset sizes: { {k: len(v) for k, v in datasets.items()} }")

    # ---- model/optimizer
    model = UniXcoderClassifier(rcfg, num_classes=cfg.MODEL.NUM_CLASSES,
                                remat=cfg.TRAIN.USE_CHECKPOINT)
    rng = jax.random.PRNGKey(cfg.SEED)
    dummy = jnp.zeros((2, cfg.DATA.FUNC_TOKENS), jnp.int32)
    variables = model.init(rng, dummy)
    params = variables["params"]
    if args.pretrained:
        import torch
        sd = torch.load(args.pretrained, map_location="cpu")
        prefix = "encoder." if any(k.startswith("encoder.") for k in sd) else ""
        params = dict(params)
        params["encoder"] = roberta_torch_to_flax(sd, rcfg.num_layers, prefix)
        logger.info(f"loaded pretrained encoder from {args.pretrained}")

    spe = max(steps_per_epoch(len(datasets["train"]), cfg.DATA.BATCH_SIZE), 1)
    schedule = build_schedule(cfg, spe, cfg.DATA.BATCH_SIZE)
    tx = build_optimizer(cfg, schedule)
    state = TrainState.create(params, tx)

    if cfg.PARALLEL.PP > 1:
        # pipeline parallelism: the encoder stack partitioned over a "pp"
        # mesh axis, microbatches streamed via ppermute in one lax.scan
        # (parallel/pipeline.py; no reference analog — it is single-GPU).
        # The pipeline owns the devices, so the dp mesh is off; the param
        # tree is IDENTICAL to the sequential model's (same init, same
        # checkpoints, same --save-embeddings path).
        import flax.linen as nn

        from mvuld_tpu.models.roberta import masked_mean
        from mvuld_tpu.parallel.pipeline import (make_pp_mesh,
                                                 roberta_pipeline_forward)

        pp_mesh = make_pp_mesh(cfg.PARALLEL.PP)
        head = nn.Dense(cfg.MODEL.NUM_CLASSES, dtype=rcfg.dtype)
        logger.info(f"pipeline parallel: {cfg.PARALLEL.PP} stages × "
                    f"{cfg.PARALLEL.PP_MICROBATCHES} microbatches")

        def apply_fn(vs, batch, rngs, train, mutable=None):
            p = vs["params"]
            ids = batch["input_ids"]
            m = (ids != rcfg.pad_token_id).astype(jnp.int32)
            tokens = roberta_pipeline_forward(
                rcfg, p["encoder"], ids, m, pp_mesh, "pp",
                num_microbatches=cfg.PARALLEL.PP_MICROBATCHES,
                remat=cfg.TRAIN.USE_CHECKPOINT,
                dropout_rng=(rngs or {}).get("dropout") if train else None)
            sent = masked_mean(tokens, m)
            logits = head.apply({"params": p["classifier"]}, sent)
            return logits.astype(jnp.float32)

        mesh = None
    else:
        mesh = make_mesh(cfg.PARALLEL.DP, cfg.PARALLEL.MP)

        def apply_fn(vs, batch, rngs, train, mutable=None):
            logits, _sent = model.apply(vs, batch["input_ids"],
                                        deterministic=not train, rngs=rngs)
            return logits

    train_step = make_train_step(apply_fn, tx,
                                 label_smoothing=cfg.MODEL.LABEL_SMOOTHING,
                                 donate=False)
    eval_step = make_eval_step(apply_fn)

    import contextlib
    with (mesh if mesh is not None else contextlib.nullcontext()):
        if mesh is not None:
            state = replicate(mesh, state)
        if args.test:
            metrics = run_eval(eval_step, state, datasets["test"],
                               cfg.DATA.BATCH_SIZE, mesh)
            logger.info(f"TEST(only) {metrics}")
            return {"test_metrics": metrics}
        result = fit(cfg=cfg, state=state, train_step=train_step,
                     eval_step=eval_step, train_ds=datasets["train"],
                     val_ds=datasets.get("val", datasets["train"]),
                     test_ds=datasets.get("test"), mesh=mesh,
                     output_dir=cfg.OUTPUT, logger=logger)

        if args.save_embeddings:
            # export per-function sentence embeddings for the fusion stage
            emb_model = UniXcoderEmbedder(rcfg)
            # device-resident: host-numpy params as jit args re-upload the
            # full encoder per dispatch over the relay (see pipeline.py)
            emb_enc_params = jax.device_put(jax.device_get(
                result["state"].params)["encoder"])

            # params as jit ARGUMENTS: closed-over arrays inline into the
            # shipped StableHLO, and ~500 MB of encoder literals overflows
            # the TPU relay's compile-request limit (HTTP 413)
            @jax.jit
            def embed(enc_params, ids):
                _tok, sent = emb_model.apply(
                    {"params": {"encoder": enc_params}}, ids)
                return sent

            reprs = {}
            for part, ds in datasets.items():
                for i in range(0, len(ds), cfg.DATA.BATCH_SIZE):
                    idx = list(range(i, min(i + cfg.DATA.BATCH_SIZE, len(ds))))
                    ids = np.stack([ds.columns["input_ids"][j] for j in idx])
                    sent = np.asarray(embed(emb_enc_params,
                                            jnp.asarray(ids)))
                    for j, row in zip(idx, sent):
                        reprs[int(ds.columns["_id"][j])] = row
            os.makedirs(os.path.dirname(args.save_embeddings) or ".", exist_ok=True)
            with open(args.save_embeddings, "wb") as f:
                pickle.dump(reprs, f)
            logger.info(f"saved {len(reprs)} embeddings → {args.save_embeddings}")
    result["tokenizer"] = tok
    result["roberta_config"] = rcfg
    return result


if __name__ == "__main__":
    main()
