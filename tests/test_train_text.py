"""End-to-end slice: the text-only trainer on synthetic data (the judged
'UniXcoder text-only Big-Vul classification (CPU-runnable)' config)."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def result(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("text_run"))
    emb = os.path.join(out, "unixcoder_output", "result.pkl")
    from mvuld_tpu.train.train_text import main
    return main([
        "--synthetic", "200",
        "--batch-size", "16",
        "--output", out,
        "--save-embeddings", emb,
        "--opts",
        "MODEL.UNIXCODER.LAYERS", "2",
        "MODEL.UNIXCODER.HIDDEN", "64",
        "MODEL.UNIXCODER.HEADS", "2",
        "MODEL.UNIXCODER.INTERMEDIATE", "128",
        "DATA.FUNC_TOKENS", "96",
        "TRAIN.EPOCHS", "4",
        "TRAIN.WARMUP_EPOCHS", "1",
        "TRAIN.BASE_LR", "5e-3",
        "TRAIN.WARMUP_LR", "1e-4",
        "TRAIN.MIN_LR", "1e-4",
        "TRAIN.EARLY_STOP_PATIENCE", "10",
        "PARALLEL.DTYPE", "float32",
        "PRINT_FREQ", "5",
    ]), emb


def test_trains_above_chance(result):
    res, _ = result
    # synthetic vuln patterns are text-visible (strcpy vs strncpy etc.) —
    # even a tiny encoder must beat the ~50% prior on val F1
    assert res["best_f1"] > 0.55, res["history"]
    assert "test_metrics" in res
    assert res["test_metrics"]["acc"] > 0.5


def test_embeddings_exported(result):
    _, emb_path = result
    import pickle
    with open(emb_path, "rb") as f:
        reprs = pickle.load(f)
    assert len(reprs) >= 150
    v = next(iter(reprs.values()))
    assert v.shape == (64,)
    assert np.isfinite(v).all()


def test_best_checkpoint_written(result):
    res, emb_path = result
    out_dir = os.path.dirname(os.path.dirname(emb_path))
    best_dir = None
    for root, dirs, _files in os.walk(out_dir):
        for d in dirs:
            if d.startswith("best_f1_epoch_"):
                best_dir = os.path.join(root, d)
    assert best_dir is not None
