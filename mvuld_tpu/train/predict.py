"""Inference/serving CLI: raw C functions → P(vulnerable), one jitted forward.

The reference has no serving path — "inference" is ``--test 1`` re-running
validate over a prebuilt test loader from the resumed best-F1 checkpoint
(mvuld/main_bigvul.py:288-291; SURVEY §3.4 "There is no separate serving
stack"). This CLI serves the end-to-end tri-modal model on functions it has
never seen: CPG extraction (tools/cpg.py), Graphviz-style rendering
(tools/render.py), node positions (renderer oracle, or EAST detection +
line-number OCR with --east-ckpt — the reference's production OCR path,
OCR/detect.py:285-353), tokenization with the TRAINING vocabulary, and one
jitted eval forward per shape bucket.

TPU/serving specifics:
  * request batches are padded to power-of-two BUCKETS (≤ --batch-size), so
    the relay compiles a handful of shapes exactly once (persistent compile
    cache makes restarts warm);
  * model params ride as jit ARGUMENTS — closure constants would inline the
    ~GB parameter tree into the shipped HLO (relay compile-request 413);
  * eval mode throughout: deterministic, frozen BatchNorm statistics.

Usage:
  python -m mvuld_tpu.train.predict --run-dir runs/e2e file1.c file2.c ...
  python -m mvuld_tpu.train.predict --run-dir runs/e2e --data corpus.pkl \
      --limit 64 --out preds.jsonl
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import time
from typing import Dict, List, Optional, Tuple


def _resolve_run_dir(path: str) -> str:
    """Accept the trainer's --output root or the nested OUTPUT dir
    (get_config appends MODEL.NAME/TAG): the run dir is wherever
    config.json landed next to the checkpoints."""
    if os.path.exists(os.path.join(path, "config.json")):
        return path
    cands = sorted(glob.glob(os.path.join(path, "**", "config.json"),
                             recursive=True), key=os.path.getmtime)
    if not cands:
        raise FileNotFoundError(
            f"no config.json under {path} — is this a finished run dir?")
    return os.path.dirname(cands[-1])


def _bucket(n: int, max_batch: int) -> int:
    b = 1
    while b < n and b < max_batch:
        b *= 2
    return min(b, max_batch)


def build_request(sources: List[Tuple[str, str]], cfg, tok, workdir: str,
                  east_ckpt: Optional[str] = None, logger=None
                  ) -> Tuple[Dict, List[Dict]]:
    """Host-side featurization of raw (id, code) pairs into the model's
    dense arrays. Returns (arrays, per-item info rows); unparseable or
    degenerate functions get an ``error`` row and no array slot."""
    import numpy as np

    from mvuld_tpu.data.graph_batch import pack_graph
    from mvuld_tpu.data.tokenizer import normalize_line
    from mvuld_tpu.data.transforms import load_image, resize_normalize
    from mvuld_tpu.tools.cpg import extract_line_cpg
    from mvuld_tpu.tools.render import load_norm_pos, render_cpg, save_norm_pos

    img_dir = os.path.join(workdir, "imgs")
    pos_dir = os.path.join(workdir, "pos")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(pos_dir, exist_ok=True)

    rows: List[Dict] = []                         # one per input, in order
    ok: List[Tuple[str, str, object, str, Dict]] = []
    for sid, code in sources:
        row: Dict = {"id": sid}
        rows.append(row)
        cpg = extract_line_cpg(code)
        if cpg is None:
            row["error"] = "unparseable function"
            continue
        g = cpg.filtered(cfg.DATA.GTYPE)
        if len(g.nodes) < 2:
            # the reference drops these at dataset build (check_validity,
            # baselines/scripts/getImages.py:22-51)
            row["error"] = "degenerate graph (<2 nodes)"
            continue
        img_path = os.path.join(img_dir, f"{sid}.png")
        if not os.path.exists(img_path):
            _img, pos = render_cpg(g, out_path=img_path)
            save_norm_pos(pos, os.path.join(pos_dir, f"{sid}.pkl"))
        ok.append((sid, code, cpg, img_path, row))

    # node positions: renderer oracle, or the production OCR chain
    use_pos_dir = pos_dir
    if east_ckpt and ok:
        from mvuld_tpu.ocr.detect import detect_dataset_map, load_east_detector
        apply_fn, east_params = load_east_detector(east_ckpt)
        use_pos_dir = os.path.join(workdir, "pos_ocr")
        detect_dataset_map(apply_fn, east_params,
                           [img_path for (_, _, _, img_path, _) in ok],
                           use_pos_dir, pad_to=256, logger=logger)

    n = len(ok)
    M, T, Tn = cfg.DATA.MAX_NODES, cfg.DATA.FUNC_TOKENS, cfg.DATA.NODE_TOKENS
    S = cfg.DATA.IMG_SIZE
    pos_dim = 4 + 2 * int(cfg.DATA.NODE_NUMERIC)
    arrs = {
        "func_ids": np.full((n, T), tok.pad_id, np.int32),
        "node_ids": np.full((n, M, Tn), tok.pad_id, np.int32),
        "image": np.zeros((n, S, S, 3), np.float32),
        "pos": np.zeros((n, M, pos_dim), np.float32),
        "adj": np.zeros((n, M, M), np.uint8),
        "node_mask": np.zeros((n, M), np.float32),
    }
    for i, (sid, code, cpg, img_path, row) in enumerate(ok):
        pos_path = os.path.join(use_pos_dir, f"{sid}.pkl")
        pos_dict = (load_norm_pos(pos_path)
                    if os.path.exists(pos_path) else None)
        pg = pack_graph(cpg, M, pos_dict=pos_dict, gtype=cfg.DATA.GTYPE)
        arrs["pos"][i, :, :4], arrs["adj"][i] = pg.pos, pg.adj
        arrs["node_mask"][i] = pg.mask
        if cfg.DATA.NODE_NUMERIC:
            from mvuld_tpu.tools.cpg import numeric_literal_feats
            arrs["pos"][i, : pg.num_nodes, 4:] = numeric_literal_feats(
                cpg, pg.lineno[: pg.num_nodes], code.split("\n"),
                k=int(cfg.DATA.NODE_NUMERIC))
        arrs["func_ids"][i] = tok.tokenize([code], max_length=T)[0]
        lines = code.split("\n")
        lns = pg.lineno[: pg.num_nodes]
        if cfg.DATA.NODE_CONTEXT == "deps":
            # serving must tokenize node text exactly like the run's cache
            # (dependency-context lines, cpg.dep_context_lines)
            from mvuld_tpu.tools.cpg import dep_context_lines
            node_lines = [normalize_line(s)
                          for s in dep_context_lines(cpg, lns, lines)]
        else:
            node_lines = [normalize_line(lines[ln - 1])
                          if 1 <= ln <= len(lines) else "" for ln in lns]
        if node_lines:
            arrs["node_ids"][i, : pg.num_nodes] = tok.tokenize(
                node_lines, max_length=Tn)
        arrs["image"][i] = resize_normalize(load_image(img_path), S)
        row["num_nodes"] = int(pg.num_nodes)
        row["_slot"] = i
    return arrs, rows


def main(argv=None) -> List[Dict]:
    from mvuld_tpu.parallel.mesh import enable_compile_cache
    enable_compile_cache()  # persistent XLA cache: relay compiles are slow cold
    parser = argparse.ArgumentParser()
    parser.add_argument("files", nargs="*", help=".c source files")
    parser.add_argument("--run-dir", required=True,
                        help="train_e2e output dir (config.json + "
                             "tokenizer.json + checkpoint-best-f1)")
    parser.add_argument("--ckpt", default=None,
                        help="explicit orbax checkpoint path (default: the "
                             "run dir's newest best-F1, else newest epoch)")
    parser.add_argument("--east-ckpt", default=None,
                        help="trained EAST checkpoint: node positions come "
                             "from detection + line-number OCR instead of "
                             "the renderer oracle")
    parser.add_argument("--data", default=None,
                        help="corpus pickle (func_before/_id columns) to "
                             "predict over instead of .c files")
    parser.add_argument("--limit", type=int, default=0,
                        help="with --data: only the first N rows")
    parser.add_argument("--batch-size", type=int, default=16,
                        help="max shape bucket (chunks pad to powers of two "
                             "up to this)")
    parser.add_argument("--node-capacity", type=int, default=0,
                        help="packed per-line encoder capacity (0 = encode "
                             "every slot; params are identical either way)")
    parser.add_argument("--workdir", default=None,
                        help="where rendered PNGs/positions go (default: "
                             "RUN_DIR/predict_cache)")
    parser.add_argument("--out", default=None, help="write JSON lines here")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mvuld_tpu.config import load_saved_config
    from mvuld_tpu.core.checkpoint import (auto_resume_helper, load_checkpoint,
                                           resume_bestf1_helper)
    from mvuld_tpu.data.tokenizer import CodeTokenizer
    from mvuld_tpu.train.train_e2e import build_e2e_model

    t_start = time.time()
    run_dir = _resolve_run_dir(args.run_dir)
    cfg = load_saved_config(run_dir)
    tok_path = os.path.join(run_dir, "tokenizer.json")
    if not os.path.exists(tok_path):
        raise FileNotFoundError(
            f"{tok_path} missing — the run predates tokenizer persistence; "
            "re-run train_e2e or copy the training tokenizer here")
    tok = CodeTokenizer.load(tok_path)

    ckpt = args.ckpt or resume_bestf1_helper(run_dir) \
        or auto_resume_helper(run_dir)
    if not ckpt:
        raise FileNotFoundError(f"no checkpoint under {run_dir}")
    state = load_checkpoint(ckpt)
    # device-resident ONCE: host-numpy variables as jit args re-upload the
    # full 220M-param tri-modal tree on every serving dispatch over the
    # relay (≈900 MB × batches; see pipeline.py featurizer note)
    variables = {"params": jax.device_put(state["params"])}
    if state.get("batch_stats") is not None:
        variables["batch_stats"] = jax.device_put(state["batch_stats"])

    # ---- gather sources
    sources: List[Tuple[str, str]] = []
    for f in args.files:
        with open(f) as fh:
            sources.append((os.path.splitext(os.path.basename(f))[0],
                            fh.read()))
    if args.data:
        import pandas as pd
        df = pd.read_pickle(args.data)
        if args.limit:
            df = df.head(args.limit)
        sources += [(str(r._id), r.func_before) for r in df.itertuples()]
    if not sources:
        parser.error("no inputs: pass .c files and/or --data")

    workdir = args.workdir or os.path.join(run_dir, "predict_cache")
    arrs, rows = build_request(sources, cfg, tok, workdir,
                               east_ckpt=args.east_ckpt)
    t_host = time.time() - t_start

    # ---- model + jitted eval forward (params as arguments, not closure)
    B = max(args.batch_size, 1)
    cap = args.node_capacity or None
    if cap:
        cap = min(cap, B * cfg.DATA.MAX_NODES)
    # TPU serving rides the same fast path the trainer uses (Pallas
    # attention; fused MLP / window-resident follow the run's TRAIN knobs);
    # CPU (tests, laptops) uses the plain XLA path
    on_tpu = jax.default_backend() not in ("cpu",)
    fused = on_tpu and cfg.TRAIN.FUSED_MLP
    model, _rcfg, _scfg = build_e2e_model(
        cfg, tok.vocab_size, node_capacity=cap,
        use_pallas=on_tpu, scan_blocks=True, roberta_pallas_mlp=fused,
        use_pallas_mlp=fused,
        window_resident=on_tpu and cfg.TRAIN.WINDOW_RESIDENT)

    @jax.jit
    def fwd(vs, b):
        logits = model.apply(vs, func_ids=b["func_ids"],
                             node_ids=b["node_ids"], image=b["image"],
                             pos=b["pos"], adj=b["adj"] > 0,
                             node_mask=b["node_mask"], train=False)
        # P(vul): softmax prob of class 1, the reference's decision rule
        # (mvuld/main_bigvul.py:447)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[:, 1]

    n = arrs["func_ids"].shape[0]
    probs = np.zeros(n, np.float32)
    t_infer = 0.0
    for lo in range(0, n, B):
        k = min(B, n - lo)
        bucket = _bucket(k, B)
        chunk = {}
        for key, v in arrs.items():
            c = v[lo:lo + k]
            if k < bucket:     # pad the tail chunk up to its bucket shape
                c = np.concatenate([c, np.repeat(c[:1], bucket - k, 0)], 0)
            chunk[key] = jnp.asarray(c)
        t0 = time.time()
        p = np.asarray(fwd(variables, chunk))
        t_infer += time.time() - t0
        probs[lo:lo + k] = p[:k]

    results: List[Dict] = []
    for row in rows:
        out = {k: v for k, v in row.items() if not k.startswith("_")}
        if "_slot" in row:
            p = float(probs[row["_slot"]])
            out["p_vul"] = round(p, 6)
            out["pred"] = int(p > 0.5)
        results.append(out)

    lines = [json.dumps(r) for r in results]
    summary = {
        "summary": True, "functions": n, "errors": len(rows) - n,
        "checkpoint": ckpt, "positions": "ocr" if args.east_ckpt else "oracle",
        "host_prep_s": round(t_host, 2),
        "device_infer_s": round(t_infer, 2),
        "functions_per_sec_device": round(n / t_infer, 2) if t_infer else None,
    }
    lines.append(json.dumps(summary))
    print("\n".join(lines), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write("\n".join(lines) + "\n")
    return results


if __name__ == "__main__":
    main()
