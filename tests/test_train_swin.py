"""End-to-end slice: the SwinV2 fine-tune path on synthetic rendered graphs
(tiny model, tiny images — semantics, not scale)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def result(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("swin_run"))
    from mvuld_tpu.train.train_swin import main
    return main([
        "--synthetic", "60",
        "--batch-size", "8",
        "--output", out,
        "--opts",
        "DATA.IMG_SIZE", "64",
        "MODEL.SWINV2.EMBED_DIM", "16",
        "MODEL.SWINV2.DEPTHS", "[1,1]",
        "MODEL.SWINV2.NUM_HEADS", "[2,2]",
        "MODEL.SWINV2.WINDOW_SIZE", "4",
        "MODEL.SWINV2.PRETRAINED_WINDOW_SIZES", "[0,0]",
        "MODEL.DROP_PATH_RATE", "0.0",
        "TRAIN.EPOCHS", "2",
        "TRAIN.WARMUP_EPOCHS", "1",
        "TRAIN.BASE_LR", "1e-2",
        "TRAIN.WARMUP_LR", "1e-3",
        "TRAIN.MIN_LR", "1e-3",
        "PARALLEL.DTYPE", "float32",
        "AUG.MIXUP", "0.8",
        "PRINT_FREQ", "2",
    ]), out


def test_swin_finetune_runs(result):
    res, _ = result
    assert "test_metrics" in res
    assert np.isfinite(res["best_f1"])
    assert len(res["history"]) == 2


def test_throughput_mode(result):
    _, out = result
    from mvuld_tpu.train.train_swin import main
    res = main([
        "--batch-size", "4",
        "--output", out + "_tp",
        "--throughput",
        "--opts",
        "DATA.IMG_SIZE", "64",
        "MODEL.SWINV2.EMBED_DIM", "16",
        "MODEL.SWINV2.DEPTHS", "[1,1]",
        "MODEL.SWINV2.NUM_HEADS", "[2,2]",
        "MODEL.SWINV2.WINDOW_SIZE", "4",
        "MODEL.SWINV2.PRETRAINED_WINDOW_SIZES", "[0,0]",
        "PARALLEL.DTYPE", "float32",
    ])
    assert res["throughput"] > 0
