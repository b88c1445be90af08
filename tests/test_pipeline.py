"""The one-command pipeline: corpus → text encoder → caches (trained
encoder) → fusion → test metrics. The flagship end-to-end slice."""

import json
import os

import numpy as np
import pytest


def test_full_pipeline(tmp_path):
    from mvuld_tpu.train.pipeline import main
    out = str(tmp_path / "run")
    res = main([
        "--synthetic", "160",
        "--out", out,
        "--batch-size", "16",
        "--text-epochs", "4",
        "--fusion-epochs", "5",
        "--opts",
        "MODEL.UNIXCODER.LAYERS", "2",
        "MODEL.UNIXCODER.HIDDEN", "64",
        "MODEL.UNIXCODER.HEADS", "2",
        "MODEL.UNIXCODER.INTERMEDIATE", "128",
        "DATA.FUNC_TOKENS", "96",
        "DATA.NODE_TOKENS", "24",
        "DATA.MAX_NODES", "32",
        "MODEL.MULTI.HIDDEN", "64",
        "MODEL.MULTI.NUM_RS_GCN", "1",
        "MODEL.MULTI.NUM_HIDDEN_FC", "1",
        "TRAIN.WARMUP_EPOCHS", "1",
        "TRAIN.BASE_LR", "5e-3",
        "TRAIN.WARMUP_LR", "1e-4",
        "TRAIN.MIN_LR", "1e-4",
        "TRAIN.EARLY_STOP_PATIENCE", "20",
        "PARALLEL.DTYPE", "float32",
        "PRINT_FREQ", "50",
    ])
    assert np.isfinite(res["text_best_f1"])
    assert np.isfinite(res["fusion_best_f1"])
    assert res["fusion_test"] is not None
    # with a TRAINED text encoder feeding the caches, fusion should beat
    # chance on the synthetic task
    assert res["fusion_best_f1"] > 0.5
    summary = json.load(open(os.path.join(out, "pipeline_summary.json")))
    assert summary["arch"] == "multi_defect_new_gcn"
    # caches exist and are reusable
    for part in ("train", "val", "test"):
        assert os.path.exists(os.path.join(out, "cache", f"{part}.npz"))
