"""Tri-modal fusion trainer — the main_bigvul.py equivalent.

Trains the fusion head (+GAT/Rs-GCN) over cached modality features:
(graph arrays, SwinV2 img_emb, UniXcoder text/node embeddings, label),
exactly the reference's staged regime (frozen encoders; SURVEY §1 note).
Semantics preserved: CE with label smoothing 0.1, AdamW with the scaled-LR
rule, cosine schedule, clip 5.0, P(vul)>0.5 decision, PR-AUC reporting,
best-F1 checkpointing, patience 50, fp32 fusion compute (the reference
force-disables AMP for fusion, main_bigvul.py:328).

Usage:
  python -m mvuld_tpu.train.train_fusion --cfg cfg.yaml --cache-dir caches/ \
      [--synthetic N] [--arch multi_defect_new_gcn] [--test] [--opts ...]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def load_cached_datasets(cache_paths):
    from mvuld_tpu.data.loader import ArrayDataset
    out = {}
    for part, path in cache_paths.items():
        z = np.load(path)
        # ids stay host-side (int64 upsets the x64-disabled device path)
        cols = {
            "img_emb": z["img_emb"], "text_emb": z["text_emb"],
            "node_emb": z["node_emb"], "pos": z["pos"], "adj": z["adj"],
            "node_mask": z["node_mask"], "ntype": z["ntype"],
            "label": z["label"],
        }
        # tokenized-node variant (reference item1 caches): present in caches
        # written by precompute ≥ r3; older caches simply lack the column
        if "token_ids" in z:
            cols["token_ids"] = z["token_ids"]
        out[part] = ArrayDataset(cols)
    return out


def main(argv=None) -> dict:
    from mvuld_tpu.parallel.mesh import enable_compile_cache
    enable_compile_cache()  # persistent XLA cache: relay compiles are 15-40 min cold
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", default=None)
    parser.add_argument("--cache-dir", default=None)
    parser.add_argument("--data", default=None, help="corpus pickle")
    parser.add_argument("--synthetic", type=int, default=0)
    parser.add_argument("--hard", action="store_true",
                        help="value-binding synthetic corpus "
                             "(tools/synthetic.py hard mode)")
    parser.add_argument("--arch", default=None)
    parser.add_argument("--batch-size", dest="batch_size", type=int)
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
    from mvuld_tpu.data.loader import ArrayDataset, steps_per_epoch
    from mvuld_tpu.models.fusion_zoo import build_fusion_model
    from mvuld_tpu.parallel.mesh import make_mesh, replicate
    from mvuld_tpu.tools.vocab import GRAPH_TYPE_EDGES
    from mvuld_tpu.train.harness import fit, run_eval
    from mvuld_tpu.train.precompute import (build_fusion_cache,
                                            make_random_encoders)

    cfg = get_config(args)
    output_dir = os.path.join(cfg.MULTI_OUTPUT, cfg.TAG) if not args.output \
        else cfg.OUTPUT
    logger = create_logger(output_dir)

    # ---- caches
    cache_dir = args.cache_dir or os.path.join(output_dir, "cache")
    parts = ("train", "val", "test")
    cache_paths = {p: os.path.join(cache_dir, f"{p}.npz") for p in parts}
    if not all(os.path.exists(p) for p in cache_paths.values()):
        if args.synthetic:
            from mvuld_tpu.tools.dataset import prepare_corpus
            from mvuld_tpu.tools.synthetic import generate_dataset
            df = prepare_corpus(generate_dataset(args.synthetic, hard=args.hard,
                                                 seed=cfg.SEED or 42))
        else:
            if args.data is None:
                missing = [p for p in cache_paths.values()
                           if not os.path.exists(p)]
                raise FileNotFoundError(
                    f"fusion caches missing ({missing}) and no --data/"
                    f"--synthetic corpus given to rebuild them")
            import pandas as pd
            df = pd.read_pickle(args.data)
        from mvuld_tpu.data.tokenizer import CodeTokenizer
        tok = CodeTokenizer.train(df.func_before.tolist(), vocab_size=2048)
        text_enc, swin_enc = make_random_encoders(cfg)
        cache_paths = build_fusion_cache(df, cache_dir, cfg,
                                         text_encoder=text_enc,
                                         swin_encoder=swin_enc,
                                         tokenizer=tok, logger=logger)
    datasets = load_cached_datasets(cache_paths)
    logger.info(f"dataset sizes: { {k: len(v) for k, v in datasets.items()} }")

    # ---- model
    arch = args.arch or cfg.MODEL.MULTI.ARCH
    model = build_fusion_model(cfg, arch=arch)
    logger.info(f"fusion arch: {arch}")
    etypes = sorted(GRAPH_TYPE_EDGES[cfg.DATA.GTYPE])

    # adjacency bit-filter on device (uint8 → bool under jit)
    import mvuld_tpu.tools.vocab as V
    bits = 0
    for t in etypes:
        bits |= 1 << V.EDGE_TYPE_MAP[t]

    def apply_fn(vs, batch, rngs, train, mutable=None):
        adj = (batch["adj"] & np.uint8(bits)) != 0
        kwargs = dict(img_emb=batch["img_emb"], text_emb=batch["text_emb"],
                      node_emb=batch["node_emb"], pos=batch["pos"], adj=adj,
                      node_mask=batch["node_mask"],
                      ntype=batch.get("ntype"), train=train)
        if mutable:
            return model.apply(vs, **kwargs, rngs=rngs, mutable=mutable)
        return model.apply(vs, **kwargs, rngs=rngs)

    rng = jax.random.PRNGKey(cfg.SEED)
    ex = datasets["train"].get(0)
    init_batch = {k: jnp.asarray(v)[None] for k, v in ex.items()
                  if k not in ("label", "ids")}
    variables = model.init(
        rng, img_emb=init_batch["img_emb"], text_emb=init_batch["text_emb"],
        node_emb=init_batch["node_emb"], pos=init_batch["pos"],
        adj=(init_batch["adj"] > 0), node_mask=init_batch["node_mask"],
        ntype=init_batch.get("ntype"), train=False)
    has_bn = "batch_stats" in variables

    mesh = make_mesh(cfg.PARALLEL.DP, cfg.PARALLEL.MP)
    spe = max(steps_per_epoch(len(datasets["train"]), cfg.DATA.BATCH_SIZE), 1)
    schedule = build_schedule(cfg, spe, cfg.DATA.BATCH_SIZE)
    tx = build_optimizer(cfg, schedule)
    state = TrainState.create(variables["params"], tx,
                              batch_stats=variables.get("batch_stats"))

    # TRAIN.DEVICE_DATA: cached features live in HBM once and batches are
    # int32 index vectors gathered inside the jitted step — required for
    # long runs through the TPU relay (its client leaks host RAM per
    # transferred batch byte; see train_e2e for the measured failure) and
    # the right shape for Big-Vul-scale corpora on a 1-core host anyway.
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())

    def _put_split(ds, drop=()):
        dd = {k: jax.device_put(v, rep) for k, v in ds.columns.items()
              if k not in drop
              and np.issubdtype(np.asarray(v).dtype, np.number)}
        return dd, sum(int(v.nbytes) for v in dd.values())

    device_data = None
    if cfg.TRAIN.DEVICE_DATA:
        device_data, nbytes = _put_split(datasets["train"])
        logger.info(f"device-resident train split: {nbytes / 1e9:.2f} GB "
                    f"in HBM ({len(datasets['train'])} rows)")
        datasets["train"] = ArrayDataset(
            {"idx": np.arange(len(datasets["train"]), dtype=np.int32)})

    # TRAIN.DEVICE_EVAL: val/test residency too — eval ships only index
    # vectors, making the whole run transfer-free after the corpus uploads.
    eval_device_data = None
    if cfg.TRAIN.DEVICE_EVAL:
        # fail fast on a split the run WILL evaluate but cannot serve
        # device-resident: the indexed eval step would otherwise TypeError
        # mid-run when run_eval falls back to a host-fed dataset.
        needed = "test" if args.test else "val"
        if needed not in datasets:
            raise ValueError(
                f"TRAIN.DEVICE_EVAL=True but the '{needed}' split is absent "
                f"(have {sorted(datasets)}); provide it or disable "
                f"TRAIN.DEVICE_EVAL")
        eval_device_data = {}
        for split in ("val", "test"):
            if split not in datasets:
                continue
            labels = np.asarray(datasets[split].columns["label"])
            # labels stay host-side for the sklearn metric suite — keeping
            # them out of HBM skips a redundant upload + per-batch gather
            eval_device_data[split], nbytes = _put_split(datasets[split],
                                                         drop=("label",))
            logger.info(f"device-resident {split} split: "
                        f"{nbytes / 1e9:.2f} GB in HBM")
            datasets[split] = ArrayDataset(
                {"idx": np.arange(len(labels), dtype=np.int32),
                 "label": labels})

    train_step = make_train_step(apply_fn, tx,
                                 label_smoothing=cfg.MODEL.LABEL_SMOOTHING,
                                 has_batch_stats=has_bn, donate=False,
                                 indexed=device_data is not None)
    eval_step = make_eval_step(apply_fn, has_batch_stats=has_bn,
                               indexed=eval_device_data is not None)

    with mesh:
        state = replicate(mesh, state)
        if args.test:
            metrics = run_eval(eval_step, state, datasets["test"],
                               cfg.DATA.BATCH_SIZE, mesh,
                               (eval_device_data or {}).get("test"))
            logger.info(f"TEST(only) {metrics}")
            return {"test_metrics": metrics}
        return fit(cfg=cfg, state=state, train_step=train_step,
                   eval_step=eval_step, train_ds=datasets["train"],
                   val_ds=datasets.get("val", datasets["train"]),
                   test_ds=datasets.get("test"), mesh=mesh,
                   output_dir=output_dir, logger=logger,
                   device_data=device_data,
                   eval_device_data=eval_device_data)


if __name__ == "__main__":
    main()
