"""Serving path: raw .c files → P(vul) through the end-to-end model.

The reference has no serving CLI (inference = --test 1 over a prebuilt
loader, mvuld/main_bigvul.py:288-291); predict.py is the from-raw-source
equivalent. These tests build a fake finished run dir (saved config +
tokenizer + best-F1 checkpoint of an init-state model) and drive the CLI.
"""

import json
import os
from types import SimpleNamespace

import numpy as np
import pytest

C1 = """int foo(int a) {
  int b = a + 1;
  if (b > 2) {
    b = b * 2;
  }
  return b;
}
"""

C2 = """void bar(char *dst, char *src) {
  strcpy(dst, src);
  int n = strlen(dst);
  if (n > 10) {
    n = 0;
  }
  memcpy(dst, src, n);
}
"""

TOY_OPTS = [
    "MODEL.UNIXCODER.LAYERS", "1", "MODEL.UNIXCODER.HIDDEN", "32",
    "MODEL.UNIXCODER.HEADS", "2", "MODEL.UNIXCODER.INTERMEDIATE", "64",
    "MODEL.SWINV2.EMBED_DIM", "16", "MODEL.SWINV2.DEPTHS", "[1, 1]",
    "MODEL.SWINV2.NUM_HEADS", "[2, 2]", "MODEL.SWINV2.WINDOW_SIZE", "4",
    "MODEL.SWINV2.PRETRAINED_WINDOW_SIZES", "[0, 0]",
    "DATA.IMG_SIZE", "32", "DATA.FUNC_TOKENS", "64", "DATA.NODE_TOKENS", "16",
    "DATA.MAX_NODES", "16", "MODEL.MULTI.HIDDEN", "64",
    "MODEL.MULTI.NUM_RS_GCN", "1", "MODEL.MULTI.NUM_HIDDEN_FC", "1",
    "PARALLEL.DTYPE", "float32",
]


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    """A 'finished' train_e2e run dir: config.json, tokenizer.json, and a
    best-F1 checkpoint holding init-state params."""
    import jax
    import jax.numpy as jnp

    from mvuld_tpu.config import get_config, save_config
    from mvuld_tpu.core.checkpoint import save_checkpoint
    from mvuld_tpu.data.tokenizer import CodeTokenizer
    from mvuld_tpu.train.train_e2e import build_e2e_model

    out = str(tmp_path_factory.mktemp("e2e_run"))
    cfg = get_config(SimpleNamespace(cfg=None, opts=TOY_OPTS, output=out))
    run = cfg.OUTPUT                    # get_config appends MODEL.NAME/TAG
    os.makedirs(run, exist_ok=True)
    save_config(cfg, run)

    tok = CodeTokenizer.train([C1, C2], vocab_size=256)
    tok.save(os.path.join(run, "tokenizer.json"))

    model, _, _ = build_e2e_model(cfg, tok.vocab_size)
    M, T, Tn = cfg.DATA.MAX_NODES, cfg.DATA.FUNC_TOKENS, cfg.DATA.NODE_TOKENS
    S = cfg.DATA.IMG_SIZE
    variables = model.init(
        jax.random.PRNGKey(0),
        func_ids=jnp.zeros((1, T), jnp.int32),
        node_ids=jnp.zeros((1, M, Tn), jnp.int32),
        image=jnp.zeros((1, S, S, 3), jnp.float32),
        pos=jnp.zeros((1, M, 4), jnp.float32),
        adj=jnp.zeros((1, M, M), bool),
        node_mask=jnp.ones((1, M), jnp.float32), train=False)
    save_checkpoint(run, 0, {
        "params": jax.device_get(variables["params"]),
        "batch_stats": jax.device_get(variables.get("batch_stats")),
        "step": 0, "epoch": 0, "best_f1": 0.0}, best=True)
    return out          # the trainer's --output ROOT (nested dir resolved)


def _write_sources(d, named):
    paths = []
    for name, code in named:
        p = os.path.join(str(d), f"{name}.c")
        with open(p, "w") as f:
            f.write(code)
        paths.append(p)
    return paths


def test_predict_cli(run_dir, tmp_path):
    from mvuld_tpu.train.predict import main
    paths = _write_sources(tmp_path, [("f1", C1), ("f2", C2),
                                      ("bad", "int x;\n")])
    out_path = str(tmp_path / "preds.jsonl")
    results = main(["--run-dir", run_dir, *paths, "--batch-size", "4",
                    "--out", out_path])
    by_id = {r["id"]: r for r in results}
    assert set(by_id) == {"f1", "f2", "bad"}
    for rid in ("f1", "f2"):
        r = by_id[rid]
        assert 0.0 <= r["p_vul"] <= 1.0 and np.isfinite(r["p_vul"])
        assert r["pred"] in (0, 1)
        assert r["num_nodes"] >= 2
    assert "error" in by_id["bad"] and "p_vul" not in by_id["bad"]
    # order preserved: same as input order
    assert [r["id"] for r in results] == ["f1", "f2", "bad"]
    # the JSONL artifact round-trips, summary line last
    lines = [json.loads(ln) for ln in open(out_path)]
    assert lines[-1]["summary"] is True
    assert lines[-1]["functions"] == 2 and lines[-1]["errors"] == 1
    assert lines[-1]["positions"] == "oracle"


def test_predict_bucket_invariance(run_dir, tmp_path):
    """P(vul) must not depend on the batch bucket a function rides in:
    eval mode (frozen BN) + pad-row masking make every bucket equivalent."""
    from mvuld_tpu.train.predict import main
    paths = _write_sources(tmp_path, [("g1", C1), ("g2", C2),
                                      ("g3", C1.replace("foo", "baz"))])
    # 3 items in one padded bucket-of-4 vs three bucket-of-1 dispatches
    r_batched = main(["--run-dir", run_dir, *paths, "--batch-size", "4",
                      "--workdir", str(tmp_path / "w1")])
    r_single = main(["--run-dir", run_dir, *paths, "--batch-size", "1",
                     "--workdir", str(tmp_path / "w2")])
    p1 = {r["id"]: r["p_vul"] for r in r_batched}
    p2 = {r["id"]: r["p_vul"] for r in r_single}
    assert p1.keys() == p2.keys()
    for k in p1:
        assert abs(p1[k] - p2[k]) < 1e-5, (k, p1[k], p2[k])
