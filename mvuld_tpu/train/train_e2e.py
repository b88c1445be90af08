"""End-to-end tri-modal trainer: encoders + fusion in one jitted step.

The TPU-idiomatic alternative to the staged cache pipeline (train_fusion):
token ids and rendered images go straight into EndToEndMVulD
(mvuld_tpu/models/e2e.py) and gradients reach UniXcoder, SwinV2, and the
fusion head jointly.

Usage:
  python -m mvuld_tpu.train.train_e2e --synthetic N --output DIR [--opts ...]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_e2e_cache(df, cfg, tok, cache_path: str, img_size: int, logger=None):
    """Token ids + resized images + graph arrays per partition (npz)."""
    from mvuld_tpu.data.graph_batch import pack_graph
    from mvuld_tpu.data.tokenizer import normalize_line
    from mvuld_tpu.data.transforms import load_image, resize_normalize
    from mvuld_tpu.tools.cpg import dep_context_lines, extract_line_cpg
    from mvuld_tpu.tools.render import load_norm_pos
    from mvuld_tpu.train.precompute import render_corpus

    M, T, Tn = cfg.DATA.MAX_NODES, cfg.DATA.FUNC_TOKENS, cfg.DATA.NODE_TOKENS
    node_context = cfg.DATA.NODE_CONTEXT
    node_numeric = int(cfg.DATA.NODE_NUMERIC)
    pos_dim = 4 + 2 * node_numeric
    if os.path.exists(cache_path):
        arrs = dict(np.load(cache_path, allow_pickle=True))
        # the cache file is keyed by output dir only, so a config change
        # (IMG_SIZE/MAX_NODES/token budgets/NODE_CONTEXT/NODE_NUMERIC)
        # between runs sharing an output dir must invalidate it — a stale
        # 384px cache fed to a 448px model fails deep inside the jitted
        # step with a reshape error otherwise
        cached_ctx = str(arrs.get("node_context", "none"))
        if (arrs["image"].shape[1:3] == (img_size, img_size)
                and arrs["node_ids"].shape[1:] == (M, Tn)
                and arrs["func_ids"].shape[1] == T
                and arrs["pos"].shape[-1] == pos_dim
                and cached_ctx == node_context):
            return arrs
        if logger:
            logger.warning(
                f"e2e cache dims {arrs['image'].shape[1]}px/"
                f"{arrs['node_ids'].shape[1:]} != config "
                f"{img_size}px/({M}, {Tn}) — rebuilding {cache_path}")
    img_dir = os.path.join(os.path.dirname(cache_path), "imgs")
    pos_dir = os.path.join(os.path.dirname(cache_path), "pos")
    paths = render_corpus(df, img_dir, pos_dir, cfg.DATA.GTYPE, logger)
    rows = df[df._id.isin(paths)]
    n = len(rows)
    arrs = {
        "func_ids": np.full((n, T), tok.pad_id, np.int32),
        "node_ids": np.full((n, M, Tn), tok.pad_id, np.int32),
        "image": np.zeros((n, img_size, img_size, 3), np.float32),
        "pos": np.zeros((n, M, pos_dim), np.float32),
        "adj": np.zeros((n, M, M), np.uint8),
        "node_mask": np.zeros((n, M), np.float32),
        "label": rows.vul.to_numpy().astype(np.int32),
        "part": rows.label.to_numpy(),
    }
    for i, (_, row) in enumerate(rows.iterrows()):
        _id = int(row._id)
        cpg = extract_line_cpg(row.func_before)
        pg = pack_graph(cpg, M, pos_dict=load_norm_pos(
            os.path.join(pos_dir, f"{_id}.pkl")), gtype=cfg.DATA.GTYPE)
        arrs["pos"][i, :, :4], arrs["adj"][i] = pg.pos, pg.adj
        arrs["node_mask"][i] = pg.mask
        arrs["func_ids"][i] = tok.tokenize([row.func_before], max_length=T)[0]
        lines = row.func_before.split("\n")
        lns = pg.lineno[: pg.num_nodes]
        if node_numeric:
            from mvuld_tpu.tools.cpg import numeric_literal_feats
            arrs["pos"][i, : pg.num_nodes, 4:] = numeric_literal_feats(
                cpg, lns, lines, k=node_numeric)
        if node_context == "deps":
            node_lines = [normalize_line(s)
                          for s in dep_context_lines(cpg, lns, lines)]
        else:
            node_lines = [normalize_line(lines[ln - 1])
                          if 1 <= ln <= len(lines) else "" for ln in lns]
        if node_lines:
            arrs["node_ids"][i, : pg.num_nodes] = tok.tokenize(
                node_lines, max_length=Tn)
        arrs["image"][i] = resize_normalize(load_image(paths[_id]), img_size)
    arrs["node_context"] = np.asarray(node_context)
    np.savez_compressed(cache_path, **arrs)
    return arrs


def build_e2e_model(cfg, vocab_size: int, node_capacity=None, **overrides):
    """EndToEndMVulD + its Roberta/Swin configs from one resolved config —
    shared by the trainer and the predict/serving CLI so a finished run's
    config.json always rebuilds the exact parameter tree."""
    import jax.numpy as jnp

    from mvuld_tpu.models.e2e import EndToEndMVulD
    from mvuld_tpu.models.roberta import RobertaConfig
    from mvuld_tpu.models.swin_v2 import SwinV2Config

    u = cfg.MODEL.UNIXCODER
    rcfg = RobertaConfig(
        vocab_size=max(vocab_size, 16), hidden_size=u.HIDDEN,
        num_layers=u.LAYERS, num_heads=u.HEADS,
        intermediate_size=u.INTERMEDIATE,
        max_position_embeddings=u.MAX_POSITIONS,
        use_pallas_mlp=overrides.pop("roberta_pallas_mlp", False),
        dtype=jnp.bfloat16 if cfg.PARALLEL.DTYPE == "bfloat16" else jnp.float32)
    scfg = SwinV2Config.from_cfg(cfg)
    kwargs = dict(hidden=cfg.MODEL.MULTI.HIDDEN,
                  num_classes=cfg.MODEL.NUM_CLASSES,
                  num_rs_gcn=cfg.MODEL.MULTI.NUM_RS_GCN,
                  num_hidden=cfg.MODEL.MULTI.NUM_HIDDEN_FC,
                  remat=cfg.TRAIN.USE_CHECKPOINT,
                  swin_remat_stages=tuple(cfg.TRAIN.REMAT_STAGES) or None,
                  text_remat={"auto": None, "on": True,
                              "off": False}[cfg.TRAIN.TEXT_REMAT],
                  node_capacity=node_capacity)
    kwargs.update(overrides)
    return EndToEndMVulD(rcfg, scfg, **kwargs), rcfg, scfg


def main(argv=None) -> dict:
    from mvuld_tpu.parallel.mesh import enable_compile_cache
    enable_compile_cache()  # persistent XLA cache: relay compiles are 15-40 min cold
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", default=None)
    parser.add_argument("--synthetic", type=int, default=0)
    parser.add_argument("--hard", action="store_true",
                        help="value-binding synthetic corpus "
                             "(tools/synthetic.py hard mode)")
    parser.add_argument("--data", default=None)
    parser.add_argument("--batch-size", dest="batch_size", type=int)
    parser.add_argument(
        "--node-capacity", dest="node_capacity", type=int, default=-1,
        help="static packed size for the per-line encoder: -1 auto-sizes "
             "from the train split (1.25x mean valid lines per batch, "
             "rounded up to 128), 0 disables packing (encode every slot)")
    parser.add_argument("--output", default=None)
    parser.add_argument("--opts", nargs="+", default=None)
    parser.add_argument(
        "--cache-only", dest="cache_only", action="store_true",
        help="build the corpus cache (renders, token ids, graph arrays) and "
             "tokenizer, then exit without training — lets the host-side "
             "corpus prep run on CPU while the chip is busy")
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
    from mvuld_tpu.parallel.mesh import make_mesh, replicate
    from mvuld_tpu.train.harness import fit

    cfg = get_config(args)
    logger = create_logger(cfg.OUTPUT)

    if args.synthetic:
        from mvuld_tpu.tools.dataset import prepare_corpus
        from mvuld_tpu.tools.synthetic import generate_dataset
        df = prepare_corpus(generate_dataset(args.synthetic,
                                             seed=cfg.SEED or 42,
                                             hard=args.hard))
    else:
        import pandas as pd
        df = pd.read_pickle(args.data)

    # tokenizer persists next to the checkpoints: the predict/serving CLI
    # must tokenize new functions with the TRAINING vocab, and a rerun in
    # the same output dir must reuse (not retrain) it
    from mvuld_tpu.train.train_text import get_or_train_tokenizer
    tok = get_or_train_tokenizer(
        df, os.path.join(cfg.OUTPUT, "tokenizer.json"), vocab_size=4096)
    cache = build_e2e_cache(df, cfg, tok,
                            os.path.join(cfg.OUTPUT, "cache", "e2e.npz"),
                            cfg.DATA.IMG_SIZE, logger)
    if args.cache_only:
        logger.info("cache-only: corpus cache + tokenizer written; exiting")
        return {"cache_only": True, "n_functions": len(df),
                "output": cfg.OUTPUT}
    datasets = {}
    for part in ("train", "val", "test"):
        sel = np.asarray(cache["part"]) == part
        if not sel.any():
            continue
        datasets[part] = ArrayDataset({
            k: np.asarray(cache[k])[sel]
            for k in ("func_ids", "node_ids", "image", "pos", "adj",
                      "node_mask", "label")})
    logger.info(f"dataset sizes: { {k: len(v) for k, v in datasets.items()} }")

    B = cfg.DATA.BATCH_SIZE
    max_nodes = datasets["train"].columns["node_mask"].shape[1]
    if args.node_capacity < 0:
        # auto: 1.25x the mean valid-line count per batch, /128-aligned —
        # overflow (zero-embedded lines) stays rare while pad slots are
        # never paid for (reference encodes only real lines,
        # mvuld/data/data_list.py:292-299)
        mean_valid = float(datasets["train"].columns["node_mask"].sum(1).mean())
        cap = int(np.ceil(1.25 * B * max(mean_valid, 1.0) / 128) * 128)
        node_capacity = min(cap, B * max_nodes)
    else:
        node_capacity = min(args.node_capacity, B * max_nodes) or None
    logger.info(f"node-line packing capacity: {node_capacity} "
                f"(of {B * max_nodes} slots)")
    # same TPU fast-path gating as train_swin: Pallas attention always on
    # TPU, fused MLP + window-resident pairs behind the TRAIN knobs (the
    # E2E_FUSED bench config measured +4.7% train / +12% infer fn/s)
    on_tpu = jax.default_backend() not in ("cpu",)
    model, rcfg, scfg = build_e2e_model(
        cfg, tok.vocab_size, node_capacity=node_capacity,
        use_pallas=on_tpu, scan_blocks=True,
        roberta_pallas_mlp=on_tpu and cfg.TRAIN.FUSED_MLP,
        use_pallas_mlp=on_tpu and cfg.TRAIN.FUSED_MLP,
        window_resident=on_tpu and cfg.TRAIN.WINDOW_RESIDENT)
    compiler_opts = ({"xla_tpu_scoped_vmem_limit_kib": "65536"}
                     if (on_tpu and cfg.TRAIN.FUSED_MLP) else None)

    ex = datasets["train"].get(0)
    init_args = {k: jnp.asarray(v)[None] for k, v in ex.items() if k != "label"}
    init_args["adj"] = init_args["adj"] > 0
    rng = jax.random.PRNGKey(cfg.SEED)
    variables = model.init(rng, **init_args, train=False)
    has_bn = "batch_stats" in variables

    def apply_fn(vs, batch, rngs, train, mutable=None):
        kwargs = dict(func_ids=batch["func_ids"], node_ids=batch["node_ids"],
                      image=batch["image"], pos=batch["pos"],
                      adj=batch["adj"] > 0, node_mask=batch["node_mask"],
                      train=train)
        if mutable:
            return model.apply(vs, **kwargs, rngs=rngs, mutable=mutable)
        return model.apply(vs, **kwargs, rngs=rngs)

    mesh = make_mesh(cfg.PARALLEL.DP, cfg.PARALLEL.MP)
    spe = max(steps_per_epoch(len(datasets["train"]), cfg.DATA.BATCH_SIZE), 1)
    schedule = build_schedule(cfg, spe, cfg.DATA.BATCH_SIZE)
    tx = build_optimizer(cfg, schedule)
    state = TrainState.create(variables["params"], tx,
                              batch_stats=variables.get("batch_stats"))

    # TRAIN.DEVICE_DATA: ship the train split to HBM ONCE (images in the
    # compute dtype) and train from int32 index batches gathered inside the
    # jitted step. On the tunneled TPU relay every host->device transfer
    # leaks client RAM proportional to its byte size (a 30-epoch
    # 2400-function run leaked 130 GB of batch buffers and was OOM-killed);
    # device residency caps that at one corpus transfer — and drops the
    # 1-core host out of the per-step critical path entirely.
    img_dtype = (jnp.bfloat16 if cfg.PARALLEL.DTYPE == "bfloat16" else None)
    # replicated over the mesh: each dp shard gathers its slice of the
    # index batch locally (costs |mesh| HBM copies — dp>1 with a corpus
    # this large wants a sharded corpus + collective gather instead)
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())

    def _put_split(cols, drop=()):
        dd = {k: jax.device_put(
                  v.astype(jnp.bfloat16) if (k == "image" and img_dtype)
                  else v, rep)
              for k, v in cols.items() if k not in drop}
        return dd, sum(int(v.nbytes) for v in dd.values())

    device_data = None
    if cfg.TRAIN.DEVICE_DATA:
        device_data, nbytes = _put_split(datasets["train"].columns)
        logger.info(f"device-resident train split: {nbytes / 1e9:.2f} GB "
                    f"in HBM ({len(datasets['train'])} rows)")
        datasets["train"] = ArrayDataset(
            {"idx": np.arange(len(datasets["train"]), dtype=np.int32)})

    # TRAIN.DEVICE_EVAL: same residency for val/test — eval batches become
    # index vectors, so after the one-time uploads NO bulk tensors cross the
    # (leaky) relay boundary for the whole run. Labels stay host-side for
    # the sklearn metric suite.
    eval_device_data = None
    if cfg.TRAIN.DEVICE_EVAL:
        if "val" not in datasets:
            # the harness evaluates val every epoch (falling back to the
            # train split, which DEVICE_DATA has reduced to index vectors)
            # — the indexed eval step would TypeError at the first eval.
            raise ValueError(
                "TRAIN.DEVICE_EVAL=True but no 'val' split exists "
                f"(have {sorted(datasets)}); provide one or disable "
                "TRAIN.DEVICE_EVAL")
        eval_device_data = {}
        for split in ("val", "test"):
            if split not in datasets:
                continue
            cols = datasets[split].columns
            # labels stay host-side for the sklearn metric suite
            eval_device_data[split], nbytes = _put_split(cols,
                                                         drop=("label",))
            logger.info(f"device-resident {split} split: "
                        f"{nbytes / 1e9:.2f} GB in HBM")
            datasets[split] = ArrayDataset(
                {"idx": np.arange(len(datasets[split]), dtype=np.int32),
                 "label": np.asarray(cols["label"])})

    train_step = make_train_step(apply_fn, tx,
                                 label_smoothing=cfg.MODEL.LABEL_SMOOTHING,
                                 has_batch_stats=has_bn, donate=False,
                                 compiler_options=compiler_opts,
                                 indexed=device_data is not None)
    eval_step = make_eval_step(apply_fn, has_batch_stats=has_bn,
                               indexed=eval_device_data is not None)

    with mesh:
        state = replicate(mesh, state)
        return fit(cfg=cfg, state=state, train_step=train_step,
                   eval_step=eval_step, train_ds=datasets["train"],
                   val_ds=datasets.get("val", datasets["train"]),
                   test_ds=datasets.get("test"), mesh=mesh,
                   output_dir=cfg.OUTPUT, logger=logger,
                   device_data=device_data,
                   eval_device_data=eval_device_data)


if __name__ == "__main__":
    main()
