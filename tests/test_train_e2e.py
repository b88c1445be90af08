"""train_e2e entry point: synthetic corpus → packed tri-modal training.

Covers the trainer CLI surface (never previously exercised by tests) and the
auto-sized node-line packing capacity (models/e2e.py node_capacity).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the -m 'not slow' lane


def _tiny_opts():
    return [
        "MODEL.UNIXCODER.LAYERS", "1",
        "MODEL.UNIXCODER.HIDDEN", "32",
        "MODEL.UNIXCODER.HEADS", "2",
        "MODEL.UNIXCODER.INTERMEDIATE", "64",
        "DATA.IMG_SIZE", "32",
        "DATA.FUNC_TOKENS", "64",
        "DATA.NODE_TOKENS", "16",
        "DATA.MAX_NODES", "24",
        "MODEL.SWINV2.EMBED_DIM", "16",
        "MODEL.SWINV2.DEPTHS", "[1,1]",
        "MODEL.SWINV2.NUM_HEADS", "[2,2]",
        "MODEL.SWINV2.WINDOW_SIZE", "4",
        "MODEL.SWINV2.PRETRAINED_WINDOW_SIZES", "[0,0]",
        "MODEL.MULTI.HIDDEN", "64",
        "MODEL.MULTI.NUM_RS_GCN", "1",
        "MODEL.MULTI.NUM_HIDDEN_FC", "1",
        "MODEL.DROP_PATH_RATE", "0.0",
        "TRAIN.EPOCHS", "3",
        "TRAIN.WARMUP_EPOCHS", "1",
        "TRAIN.BASE_LR", "2e-3",
        "TRAIN.WARMUP_LR", "1e-4",
        "TRAIN.MIN_LR", "1e-4",
        "TRAIN.EARLY_STOP_PATIENCE", "20",
        "PARALLEL.DTYPE", "float32",
        "PRINT_FREQ", "50",
    ]


def test_train_e2e_synthetic_packed(tmp_path):
    from mvuld_tpu.train.train_e2e import main
    out = str(tmp_path / "run")
    res = main(["--synthetic", "48", "--output", out,
                "--batch-size", "8", "--opts", *_tiny_opts()])
    assert np.isfinite(res["best_f1"]) and res["best_f1"] >= 0
    assert res["history"], "no validation history recorded"
    assert res.get("test_metrics") is not None
    assert all(np.isfinite(h["f1"]) for h in res["history"])


def test_train_e2e_cache_only(tmp_path):
    """--cache-only builds the corpus cache + tokenizer and exits without
    training; a follow-up full run must REUSE the cache (host corpus prep
    can run on CPU while the chip is busy)."""
    import os
    from mvuld_tpu.train.train_e2e import main
    out = str(tmp_path / "run")
    res = main(["--synthetic", "24", "--output", out, "--batch-size", "8",
                "--cache-only", "--opts", *_tiny_opts()])
    assert res["cache_only"] and res["n_functions"] == 24
    cache_path = os.path.join(res["output"], "cache", "e2e.npz")
    tok_path = os.path.join(res["output"], "tokenizer.json")
    assert os.path.exists(cache_path) and os.path.exists(tok_path)
    mtime = os.path.getmtime(cache_path)
    res2 = main(["--synthetic", "24", "--output", out, "--batch-size", "8",
                 "--opts", *_tiny_opts(), "TRAIN.EPOCHS", "1"])
    assert os.path.getmtime(cache_path) == mtime, "cache was rebuilt"
    assert np.isfinite(res2["best_f1"])


def test_train_e2e_capacity_flag_matches_auto(tmp_path):
    """--node-capacity 0 (unpacked) must produce the same first-epoch val
    metrics as an explicit capacity that covers every valid line — the
    packed path is numerically the same computation."""
    from mvuld_tpu.train.train_e2e import main
    r1 = main(["--synthetic", "24", "--output", str(tmp_path / "a"),
               "--batch-size", "8", "--node-capacity", "0",
               "--opts", *_tiny_opts(), "TRAIN.EPOCHS", "1"])
    # seed-42 synthetic functions carry ≤11 valid lines each, so 96 covers
    # any bs-8 batch while 96 < B·N=192 keeps the packed path ACTIVE
    r2 = main(["--synthetic", "24", "--output", str(tmp_path / "b"),
               "--batch-size", "8", "--node-capacity", "96",
               "--opts", *_tiny_opts(), "TRAIN.EPOCHS", "1"])
    for key in ("f1", "pr_auc", "acc"):
        np.testing.assert_allclose(r1["history"][0][key],
                                   r2["history"][0][key], rtol=1e-4)
    assert np.isfinite(r1["best_f1"]) and np.isfinite(r2["best_f1"])


def test_train_e2e_stale_cache_invalidated(tmp_path):
    """A config change (IMG_SIZE) between runs sharing an output dir must
    rebuild the e2e cache — the r4s6 hard-2400 run loaded a 384px cache
    into a 448px model and died on a reshape deep inside the jitted step."""
    import os
    from mvuld_tpu.train.train_e2e import main
    out = str(tmp_path / "run")
    opts = _tiny_opts()
    res = main(["--synthetic", "24", "--output", out, "--batch-size", "8",
                "--cache-only", "--opts", *opts])
    cache_path = os.path.join(res["output"], "cache", "e2e.npz")
    shape32 = np.load(cache_path)["image"].shape
    assert shape32[1:3] == (32, 32)
    i = opts.index("DATA.IMG_SIZE")
    opts[i + 1] = "48"
    main(["--synthetic", "24", "--output", out, "--batch-size", "8",
          "--cache-only", "--opts", *opts])
    assert np.load(cache_path)["image"].shape[1:3] == (48, 48), \
        "stale 32px cache survived an IMG_SIZE=48 run"


def test_train_e2e_device_data_parity(tmp_path):
    """TRAIN.DEVICE_DATA True (device-resident train split + on-device batch
    gather from index batches) must reproduce the host-fed path's first-epoch
    metrics exactly (fp32, same seed/shuffle — the gather is the identity
    reordering). This is the leak-proof path for the tunneled TPU relay,
    whose client leaks host RAM per transferred batch byte. The device run
    also enables TRAIN.DEVICE_EVAL (val/test splits resident too, indexed
    eval step) so the FULLY transfer-free configuration is what parity is
    asserted on — including the test metrics."""
    from mvuld_tpu.train.train_e2e import main
    common = ["--synthetic", "24", "--batch-size", "8",
              "--opts", *_tiny_opts(), "TRAIN.EPOCHS", "1"]
    r_host = main(common[:4] + ["--output", str(tmp_path / "host")]
                  + common[4:])
    r_dev = main(common[:4] + ["--output", str(tmp_path / "dev")]
                 + common[4:] + ["TRAIN.DEVICE_DATA", "True",
                                 "TRAIN.DEVICE_EVAL", "True"])
    for key in ("f1", "pr_auc", "acc", "roc_auc"):
        np.testing.assert_allclose(r_host["history"][0][key],
                                   r_dev["history"][0][key], rtol=1e-5)
        np.testing.assert_allclose(r_host["test_metrics"][key],
                                   r_dev["test_metrics"][key], rtol=1e-5)
    assert np.isfinite(r_dev["best_f1"])


def test_train_e2e_node_context_deps(tmp_path):
    """DATA.NODE_CONTEXT=deps: per-node token ids gain the dependency-source
    lines (cpg.dep_context_lines), the cache is invalidated when the flag
    changes, and the trainer runs end-to-end on the augmented features."""
    import os

    from mvuld_tpu.train.train_e2e import main

    out = str(tmp_path / "run")
    opts = _tiny_opts() + ["DATA.NODE_TOKENS", "32"]
    res = main(["--synthetic", "16", "--hard", "--batch-size", "8",
                "--output", out, "--cache-only", "--opts", *opts])
    cache_path = os.path.join(res["output"], "cache", "e2e.npz")
    plain = np.load(cache_path)
    plain_counts = (plain["node_ids"] != plain["node_ids"].max()).sum()
    n_plain = int((np.asarray(plain["node_ids"])
                   != int(plain["node_ids"][0, -1, -1])).sum())

    res2 = main(["--synthetic", "16", "--hard", "--batch-size", "8",
                 "--output", out, "--cache-only",
                 "--opts", *opts, "DATA.NODE_CONTEXT", "deps"])
    ctx = np.load(cache_path)
    assert str(ctx["node_context"]) == "deps"
    pad = int(ctx["node_ids"][0, -1, -1])
    n_ctx = int((np.asarray(ctx["node_ids"]) != pad).sum())
    # dependency context strictly adds tokens
    assert n_ctx > n_plain

    # trains end-to-end on the augmented cache (cache reused, not rebuilt)
    mtime = os.path.getmtime(cache_path)
    r = main(["--synthetic", "16", "--hard", "--batch-size", "8",
              "--output", out, "--node-capacity", "0",
              "--opts", *opts, "DATA.NODE_CONTEXT", "deps",
              "TRAIN.EPOCHS", "1"])
    assert os.path.getmtime(cache_path) == mtime
    assert "history" in r and len(r["history"]) == 1


def test_train_e2e_node_numeric(tmp_path):
    """DATA.NODE_NUMERIC=2: pos widens to [N, 8] with the log1p literal
    magnitudes; cache invalidates on the flag; trainer runs end-to-end."""
    import os

    from mvuld_tpu.train.train_e2e import main

    out = str(tmp_path / "run")
    opts = _tiny_opts()
    main(["--synthetic", "16", "--hard", "--batch-size", "8",
          "--output", out, "--cache-only", "--opts", *opts])
    cache_path = os.path.join(out, "swinv2_base_patch4_window24to28",
                              "default", "cache", "e2e.npz")
    assert np.load(cache_path)["pos"].shape[-1] == 4

    r = main(["--synthetic", "16", "--hard", "--batch-size", "8",
              "--output", out, "--node-capacity", "0",
              "--opts", *opts, "DATA.NODE_NUMERIC", "2",
              "TRAIN.EPOCHS", "1"])
    pos = np.load(cache_path)["pos"]
    assert pos.shape[-1] == 8
    assert (pos[..., 4:] != 0).any()        # magnitudes actually present
    assert "history" in r and len(r["history"]) == 1
