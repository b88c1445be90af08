"""Baseline trainers: Devign / ReVeal (two-stage) / IVDetect.

Mirrors baselines/models/{devign,reveal,ivdetect}/main.py over the dense
graph layout: word2vec(100)+ntype-onehot(32) node features for the GGNN
models (reference: devign/dataset.py:125-151), SGNS embeddings trained on the
train split (reference: word2vec.py generate_w2v), GloVe token sequences for
IVDetect's five channels, BCE/CE training with best-F1 early stopping, and
ReVeal's repr-export → SMOTE → metric-learning second stage
(reference: reveal/ggnn/main.py:114-157 → reveal/main.py:27-81).

Usage:
  python -m mvuld_tpu.train.train_baseline --model devign|reveal|ivdetect
      [--synthetic N] [--data corpus.pkl] [--epochs E] [--out-dir DIR]
"""

from __future__ import annotations

import argparse
import os
from typing import Dict

import numpy as np

from mvuld_tpu.tools.vocab import NUM_NODE_TYPES

SEQ_LEN = 12      # per-channel token budget for IVDetect


def save_baseline_ckpt(out_dir: str, payload: Dict) -> str:
    """Persist a trained baseline (params + its embedding table + the
    feature hyperparams) so eval drivers can reload it — the reference's
    detectors are reloaded from RankSaver checkpoints by eval_patches.py
    (baselines/scripts/eval_patches.py:470-478)."""
    import pickle

    import jax
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "baseline_ckpt.pkl")
    payload = {k: (jax.device_get(v) if k.endswith("params") else v)
               for k, v in payload.items()}
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    return path


def load_baseline_ckpt(out_dir: str) -> Dict:
    import pickle
    path = (out_dir if out_dir.endswith(".pkl")
            else os.path.join(out_dir, "baseline_ckpt.pkl"))
    with open(path, "rb") as f:
        return pickle.load(f)


def build_graph_features(df, emb, cfg_max_nodes: int, gtype: str = "all"):
    """Pack graphs + compute node features for the GGNN baselines."""
    from mvuld_tpu.data.graph_batch import pack_graph, per_etype_adjacency
    from mvuld_tpu.tools.cpg import extract_line_cpg

    items = []
    for _, row in df.iterrows():
        cpg = extract_line_cpg(row.func_before)
        if cpg is None:
            continue
        g = cpg.filtered(gtype)
        if len(g.nodes) < 2:
            continue
        pg = pack_graph(cpg, cfg_max_nodes, gtype=gtype)
        lines = row.func_before.split("\n")
        feats = np.zeros((cfg_max_nodes, emb.dim + NUM_NODE_TYPES), np.float32)
        for i in range(pg.num_nodes):
            ln = int(pg.lineno[i])
            text = lines[ln - 1] if 1 <= ln <= len(lines) else ""
            feats[i, : emb.dim] = emb.get_embeddings(text)
            feats[i, emb.dim + int(pg.ntype[i])] = 1.0
        items.append({"pg": pg, "feats": feats, "label": int(row.vul),
                      "part": row.label})
    out: Dict[str, Dict[str, np.ndarray]] = {}
    for part in ("train", "val", "test"):
        sel = [it for it in items if it["part"] == part]
        if not sel:
            continue
        adj = np.stack([it["pg"].adj for it in sel])
        out[part] = {
            "feats": np.stack([it["feats"] for it in sel]),
            "adj_etype": per_etype_adjacency(adj),
            "node_mask": np.stack([it["pg"].mask for it in sel]),
            "label": np.asarray([it["label"] for it in sel], np.int32),
        }
    return out


def build_ivdetect_features(df, emb, max_nodes: int):
    """Five per-node channels: token subseq, name/types, data-dep text,
    control-dep text (reference: ivdetect/dataset.py:122-301), plus AST and
    full adjacency."""
    from mvuld_tpu.data.graph_batch import adjacency_for, pack_graph
    from mvuld_tpu.tools.cpg import C_KEYWORDS, TYPE_KEYWORDS, extract_line_cpg
    from mvuld_tpu.tools.embeddings import tokenize_code

    D = emb.dim
    out = {}
    items = []
    for _, row in df.iterrows():
        cpg = extract_line_cpg(row.func_before)
        if cpg is None:
            continue
        g = cpg.filtered("all")
        if len(g.nodes) < 2:
            continue
        pg = pack_graph(cpg, max_nodes, gtype="all")
        lines = row.func_before.split("\n")
        N = max_nodes
        chan = {k: np.zeros((N, SEQ_LEN, D), np.float32)
                for k in ("subseq", "nametype", "data", "control")}
        cmask = {k: np.zeros((N, SEQ_LEN), np.float32) for k in chan}
        line_of = {int(pg.lineno[i]): i for i in range(pg.num_nodes)}
        # data/control dependency line sets from the unfiltered edge list
        deps = {"data": {}, "control": {}}
        for (a, b, t) in cpg.edges:
            if t == "REACHING_DEF":
                deps["data"].setdefault(b, []).append(a)
            elif t == "CDG":
                deps["control"].setdefault(b, []).append(a)

        def fill(key, i, text):
            toks = tokenize_code(text)[:SEQ_LEN]
            for k, tok in enumerate(toks):
                chan[key][i, k] = emb.vectors[emb.vocab.get(tok, 0)]
                cmask[key][i, k] = 1.0
            if not toks:
                cmask[key][i, 0] = 1.0

        for i in range(pg.num_nodes):
            ln = int(pg.lineno[i])
            text = lines[ln - 1] if 1 <= ln <= len(lines) else ""
            fill("subseq", i, text)
            idents = [t for t in tokenize_code(text)
                      if t not in C_KEYWORDS and t.isidentifier()]
            types = [t for t in tokenize_code(text) if t in TYPE_KEYWORDS]
            fill("nametype", i, " ".join(idents + types))
            # ALL dependent statements concatenated (the reference joins the
            # full dependency line set, ivdetect/dataset.py:122-301; the
            # token sequence is then capped at SEQ_LEN inside fill(), which
            # mirrors its GRU input truncation)
            fill("data", i, " ".join(
                lines[d - 1] for d in deps["data"].get(ln, [])
                if 1 <= d <= len(lines)))
            fill("control", i, " ".join(
                lines[d - 1] for d in deps["control"].get(ln, [])
                if 1 <= d <= len(lines)))
        items.append({
            "pg": pg, "chan": chan, "cmask": cmask, "label": int(row.vul),
            "part": row.label,
            "ast": adjacency_for(pg.adj[None], ["AST"])[0].astype(np.float32),
            "adj": adjacency_for(pg.adj[None], ["AST", "CFG", "CDG"])[0].astype(np.float32),
        })
        del line_of
    for part in ("train", "val", "test"):
        sel = [it for it in items if it["part"] == part]
        if not sel:
            continue
        out[part] = {
            **{f"f_{k}": np.stack([it["chan"][k] for it in sel])
               for k in ("subseq", "nametype", "data", "control")},
            **{f"m_{k}": np.stack([it["cmask"][k] for it in sel])
               for k in ("subseq", "nametype", "data", "control")},
            "ast": np.stack([it["ast"] for it in sel]),
            "adj": np.stack([it["adj"] for it in sel]),
            "node_mask": np.stack([it["pg"].mask for it in sel]),
            "label": np.asarray([it["label"] for it in sel], np.int32),
        }
    return out


def _bce_train(model, data, epochs, lr, seed, batch_size, logger):
    """Shared BCE loop for Devign/GGNNSum over dict-of-array datasets."""
    import jax
    import jax.numpy as jnp
    import optax

    from mvuld_tpu.core.metrics import get_metrics_probs

    train = data["train"]
    n = len(train["label"])
    rng = jax.random.PRNGKey(seed)
    args0 = (jnp.asarray(train["feats"][:2]), jnp.asarray(train["adj_etype"][:2]),
             jnp.asarray(train["node_mask"][:2]))
    variables = model.init(rng, *args0)
    tx = optax.adam(lr)
    opt_state = tx.init(variables["params"])

    # Device-resident corpus + on-device index gather (same pattern as
    # TRAIN.DEVICE_DATA): per-step host→device traffic is one int32 index
    # vector. The per-batch host-gather-then-upload this replaces leaked
    # client RAM on the tunneled TPU relay proportional to every
    # transferred byte (IVDetect-2400 reached 29 GB RSS over 30 epochs).
    dtrain = {k: jnp.asarray(train[k])
              for k in ("feats", "adj_etype", "node_mask", "label")}

    @jax.jit
    def step(params, opt_state, idx, dd):
        def loss_fn(p):
            logits = model.apply({"params": p}, dd["feats"][idx],
                                 dd["adj_etype"][idx], dd["node_mask"][idx])
            return optax.sigmoid_binary_cross_entropy(
                logits, dd["label"][idx].astype(jnp.float32)).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, loss

    @jax.jit
    def predict(params, feats, adj_e, mask):
        return model.apply({"params": params}, feats, adj_e, mask)

    params = variables["params"]
    rng_np = np.random.RandomState(seed)
    for epoch in range(epochs):
        order = rng_np.permutation(n)
        losses = []
        for b in range(max(n // batch_size, 1)):
            idx = order[b * batch_size:(b + 1) * batch_size]
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(idx, jnp.int32), dtrain)
            losses.append(float(loss))
        logger.info(f"epoch {epoch}: loss {np.mean(losses):.4f}")

    results = {}
    for part in ("val", "test"):
        if part not in data:
            continue
        d = data[part]
        dd = {k: jnp.asarray(d[k])            # one upload per split
              for k in ("feats", "adj_etype", "node_mask")}
        probs = []
        for b in range(0, len(d["label"]), batch_size):
            sl = slice(b, b + batch_size)
            logits = predict(params, dd["feats"][sl],
                             dd["adj_etype"][sl], dd["node_mask"][sl])
            probs.append(1 / (1 + np.exp(-np.asarray(logits))))
        results[part] = get_metrics_probs(d["label"], np.concatenate(probs))
        logger.info(f"{part}: {results[part]}")
    return params, results


def main(argv=None) -> dict:
    from mvuld_tpu.parallel.mesh import enable_compile_cache
    enable_compile_cache()  # persistent XLA cache: relay compiles are 15-40 min cold
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", choices=["devign", "reveal", "ivdetect"],
                        required=True)
    parser.add_argument("--synthetic", type=int, default=0)
    parser.add_argument("--hard", action="store_true",
                        help="value-binding synthetic corpus (see "
                             "tools/synthetic.py hard mode)")
    parser.add_argument("--data", default=None)
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--max-nodes", type=int, default=48)
    parser.add_argument("--emb-dim", type=int, default=64)
    parser.add_argument("--out-dir", default="runs/baseline")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from mvuld_tpu.core.logger import create_logger
    from mvuld_tpu.core.metrics import get_metrics_probs
    from mvuld_tpu.models.baselines import (DevignModel, GGNNSum, IVDetect,
                                            MetricLearningModel, reveal_loss,
                                            smote)
    from mvuld_tpu.tools.embeddings import train_glove, train_sgns

    logger = create_logger(args.out_dir)
    if args.synthetic:
        from mvuld_tpu.tools.dataset import prepare_corpus
        from mvuld_tpu.tools.synthetic import generate_dataset
        df = prepare_corpus(generate_dataset(args.synthetic,
                                             seed=args.seed or 42,
                                             hard=args.hard))
    else:
        import pandas as pd
        df = pd.read_pickle(args.data)

    train_corpus = df[df.label == "train"].func_before.tolist()

    if args.model == "ivdetect":
        # IVDetect uses GloVe features (reference: ivdetect via glove.py)
        emb = train_glove(train_corpus, dim=args.emb_dim, epochs=40)
        data = build_ivdetect_features(df, emb, args.max_nodes)
        model = IVDetect(hidden=48, feat_dim=args.emb_dim)
        train = data["train"]
        keys = ["f_subseq", "m_subseq", "f_nametype", "m_nametype",
                "f_data", "m_data", "f_control", "m_control",
                "ast", "adj", "node_mask"]
        rng = jax.random.PRNGKey(args.seed)
        variables = model.init(rng, *(jnp.asarray(train[k][:2]) for k in keys))
        tx = optax.adam(args.lr)
        opt_state = tx.init(variables["params"])

        # device-resident 5-channel corpus + on-device gather (the
        # IVDetect-2400 run's per-batch uploads leaked 29 GB of relay-client
        # host RAM over 30 epochs; see _bce_train's note)
        dtrain = {k: jnp.asarray(train[k]) for k in keys + ["label"]}

        @jax.jit
        def step(params, opt_state, idx, dd):
            def loss_fn(p):
                logits = model.apply({"params": p},
                                     *(dd[k][idx] for k in keys))
                onehot = jax.nn.one_hot(dd["label"][idx], 2)
                return optax.softmax_cross_entropy(logits, onehot).mean()
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_opt, loss

        @jax.jit
        def predict(params, batch):
            return model.apply({"params": params}, *batch)

        params = variables["params"]
        n = len(train["label"])
        rng_np = np.random.RandomState(args.seed)
        for epoch in range(args.epochs):
            order = rng_np.permutation(n)
            losses = []
            for b in range(max(n // args.batch_size, 1)):
                idx = order[b * args.batch_size:(b + 1) * args.batch_size]
                params, opt_state, loss = step(
                    params, opt_state, jnp.asarray(idx, jnp.int32), dtrain)
                losses.append(float(loss))
            logger.info(f"epoch {epoch}: loss {np.mean(losses):.4f}")
        results = {}
        for part in ("val", "test"):
            if part not in data:
                continue
            d = data[part]
            dd = tuple(jnp.asarray(d[k]) for k in keys)   # one upload/split
            probs = []
            for b in range(0, len(d["label"]), args.batch_size):
                sl = slice(b, b + args.batch_size)
                logits = predict(params, tuple(a[sl] for a in dd))
                e = np.exp(np.asarray(logits))
                probs.append((e / e.sum(-1, keepdims=True))[:, 1])
            results[part] = get_metrics_probs(d["label"], np.concatenate(probs))
            logger.info(f"{part}: {results[part]}")
        save_baseline_ckpt(args.out_dir, {
            "model": "ivdetect", "params": params,
            "emb_vocab": emb.vocab, "emb_vectors": np.asarray(emb.vectors),
            "max_nodes": args.max_nodes, "emb_dim": args.emb_dim,
            "hidden": 48})
        return {"results": results}

    # GGNN family: word2vec features (reference: devign/dataset.py w2v+onehot)
    emb = train_sgns(train_corpus, dim=args.emb_dim, epochs=60)
    data = build_graph_features(df, emb, args.max_nodes)
    input_dim = args.emb_dim + NUM_NODE_TYPES

    if args.model == "devign":
        model = DevignModel(input_dim=input_dim, output_dim=max(input_dim, 128),
                            num_steps=6, n_etypes=6)
        _params, results = _bce_train(model, data, args.epochs, args.lr,
                                      args.seed, args.batch_size, logger)
        save_baseline_ckpt(args.out_dir, {
            "model": "devign", "params": _params,
            "emb_vocab": emb.vocab, "emb_vectors": np.asarray(emb.vectors),
            "max_nodes": args.max_nodes, "emb_dim": args.emb_dim})
        return {"results": results}

    # reveal: phase 1 GGNNSum → reprs → SMOTE → phase 2 metric learner
    ggnn = GGNNSum(output_dim=max(input_dim, 128), num_steps=8, n_etypes=6)
    params, _ = _bce_train(ggnn, data, args.epochs, args.lr, args.seed,
                           args.batch_size, logger)

    @jax.jit
    def reprs_of(feats, adj_e, mask):
        _, reprs = ggnn.apply({"params": params}, feats, adj_e, mask,
                              return_repr=True)
        return reprs

    reps = {}
    for part, d in data.items():
        dd = {k: jnp.asarray(d[k])            # one upload per split
              for k in ("feats", "adj_etype", "node_mask")}
        rs = []
        for b in range(0, len(d["label"]), args.batch_size):
            sl = slice(b, b + args.batch_size)
            rs.append(np.asarray(reprs_of(dd["feats"][sl],
                                          dd["adj_etype"][sl],
                                          dd["node_mask"][sl])))
        reps[part] = (np.concatenate(rs), d["label"])

    rng_np = np.random.RandomState(args.seed)
    x_train, y_train = smote(*reps["train"], rng_np)
    ml = MetricLearningModel(hidden_dim=128)
    variables = ml.init(jax.random.PRNGKey(args.seed),
                        jnp.asarray(x_train[:2]))
    tx = optax.adam(args.lr)
    opt_state = tx.init(variables["params"])

    # SMOTE'd representations live on device once; the step gathers the
    # anchor/positive/negative triplets by index (host keeps the class-
    # conditional sampling, which is cheap — only 3 index vectors ship).
    # The arrays ride as jit ARGUMENTS, not closure constants: the relay
    # compile path inlines captured constants into the shipped HLO.
    dx_train = jnp.asarray(x_train)
    dy_train = jnp.asarray(y_train)

    @jax.jit
    def ml_step(params, opt_state, ia, ip, inn, rng, dx, dy):
        xa, xp, xn = dx[ia], dx[ip], dx[inn]
        ya = dy[ia]

        def loss_fn(p):
            logp_a, h_a = ml.apply({"params": p}, xa, train=True,
                                   rngs={"dropout": rng})
            _, h_p = ml.apply({"params": p}, xp, train=True,
                              rngs={"dropout": rng})
            _, h_n = ml.apply({"params": p}, xn, train=True,
                              rngs={"dropout": rng})
            return reveal_loss(logp_a, h_a, ya, h_p, h_n) / xa.shape[0]
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, loss

    ml_params = variables["params"]
    pos_idx = np.where(y_train == 1)[0]
    neg_idx = np.where(y_train == 0)[0]
    rng_key = jax.random.PRNGKey(args.seed + 1)
    for epoch in range(args.epochs):
        order = rng_np.permutation(len(y_train))
        losses = []
        for b in range(max(len(y_train) // args.batch_size, 1)):
            idx = order[b * args.batch_size:(b + 1) * args.batch_size]
            ya = y_train[idx]
            same = np.where(ya[:, None] == 1, 1, 0)
            # positive = same-class sample, negative = other-class sample
            xp_idx = np.asarray([rng_np.choice(pos_idx if y else neg_idx)
                                 for y in ya])
            xn_idx = np.asarray([rng_np.choice(neg_idx if y else pos_idx)
                                 for y in ya])
            rng_key, sub = jax.random.split(rng_key)
            ml_params, opt_state, loss = ml_step(
                ml_params, opt_state, jnp.asarray(idx, jnp.int32),
                jnp.asarray(xp_idx, jnp.int32),
                jnp.asarray(xn_idx, jnp.int32), sub, dx_train, dy_train)
            losses.append(float(loss))
            del same
        logger.info(f"[metric] epoch {epoch}: loss {np.mean(losses):.4f}")

    from mvuld_tpu.core.metrics import get_metrics_probs as gmp
    results = {}
    for part in ("val", "test"):
        if part not in reps:
            continue
        x, y = reps[part]
        logp, _ = ml.apply({"params": ml_params}, jnp.asarray(x))
        results[part] = gmp(y, np.exp(np.asarray(logp))[:, 1])
        logger.info(f"{part}: {results[part]}")
    save_baseline_ckpt(args.out_dir, {
        "model": "reveal", "params": params, "ml_params": ml_params,
        "emb_vocab": emb.vocab, "emb_vectors": np.asarray(emb.vectors),
        "max_nodes": args.max_nodes, "emb_dim": args.emb_dim})
    return {"results": results}


if __name__ == "__main__":
    main()
