"""End-to-end slice: the tri-modal fusion trainer (main_bigvul path) on a
synthetic corpus with oracle positional features and random frozen encoders."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def result(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fusion_run"))
    from mvuld_tpu.train.train_fusion import main
    res = main([
        "--synthetic", "150",
        "--batch-size", "16",
        "--output", out,
        "--cache-dir", os.path.join(out, "cache"),
        "--opts",
        "DATA.MAX_NODES", "32",
        "DATA.FUNC_TOKENS", "96",
        "DATA.NODE_TOKENS", "24",
        "MODEL.MULTI.HIDDEN", "64",
        "MODEL.MULTI.NUM_RS_GCN", "2",
        "MODEL.MULTI.NUM_HIDDEN_FC", "2",
        "TRAIN.EPOCHS", "6",
        "TRAIN.WARMUP_EPOCHS", "1",
        "TRAIN.BASE_LR", "2e-2",
        "TRAIN.WARMUP_LR", "1e-3",
        "TRAIN.MIN_LR", "1e-3",
        "TRAIN.EARLY_STOP_PATIENCE", "10",
        "PARALLEL.DTYPE", "float32",
        "PRINT_FREQ", "5",
    ])
    return res, out


def test_fusion_trains(result):
    res, _ = result
    assert "test_metrics" in res
    assert np.isfinite(res["best_f1"])
    # loss-bearing signal: graph structure + pos boxes + hashed text make the
    # synthetic task learnable; require better than the trivial always-vul F1
    assert res["best_f1"] > 0.5, res["history"]


def test_fusion_cache_reused(result):
    """Second invocation with the same output dir must reuse the npz caches
    (filesystem idempotence) and run eval-only quickly."""
    res, out = result
    from mvuld_tpu.train.train_fusion import main
    res2 = main([
        "--batch-size", "16",
        "--output", out,
        "--cache-dir", os.path.join(out, "cache"),
        "--test",
        "--opts",
        "DATA.MAX_NODES", "32",
        "MODEL.MULTI.HIDDEN", "64",
        "MODEL.MULTI.NUM_RS_GCN", "2",
        "MODEL.MULTI.NUM_HIDDEN_FC", "2",
        "PARALLEL.DTYPE", "float32",
    ])
    assert "test_metrics" in res2


def test_ablation_arch_flag(result):
    """The ablation registry is reachable from the CLI (--arch)."""
    _, out = result
    from mvuld_tpu.train.train_fusion import main
    res = main([
        "--batch-size", "16",
        "--output", out + "_nograph",
        "--cache-dir", os.path.join(out, "cache"),
        "--arch", "multi_defect_nograph",
        "--opts",
        "DATA.MAX_NODES", "32",
        "MODEL.MULTI.HIDDEN", "64",
        "TRAIN.EPOCHS", "2",
        "TRAIN.WARMUP_EPOCHS", "1",
        "TRAIN.BASE_LR", "1e-2",
        "TRAIN.WARMUP_LR", "1e-3",
        "TRAIN.MIN_LR", "1e-3",
        "PARALLEL.DTYPE", "float32",
    ])
    assert "test_metrics" in res


def test_fusion_device_data_parity(result, tmp_path):
    """TRAIN.DEVICE_DATA (device-resident cached features + on-device index
    gather) must reproduce the host-fed fusion run's first-epoch metrics
    exactly — same caches, same seed/shuffle."""
    _, out = result
    from mvuld_tpu.train.train_fusion import main
    common = [
        "--batch-size", "16",
        "--cache-dir", os.path.join(out, "cache"),
        "--opts",
        "DATA.MAX_NODES", "32",
        "MODEL.MULTI.HIDDEN", "64",
        "MODEL.MULTI.NUM_RS_GCN", "2",
        "MODEL.MULTI.NUM_HIDDEN_FC", "2",
        "TRAIN.EPOCHS", "1",
        "TRAIN.WARMUP_EPOCHS", "1",
        "PARALLEL.DTYPE", "float32",
        "PRINT_FREQ", "5",
    ]
    r_host = main(common[:2] + ["--output", str(tmp_path / "host")]
                  + common[2:])
    r_dev = main(common[:2] + ["--output", str(tmp_path / "dev")]
                 + common[2:] + ["TRAIN.DEVICE_DATA", "True"])
    for key in ("f1", "pr_auc", "acc"):
        np.testing.assert_allclose(r_host["history"][0][key],
                                   r_dev["history"][0][key], rtol=1e-5)


def test_fusion_device_eval_parity(result):
    """TRAIN.DEVICE_EVAL: the --test eval-only path over a device-resident
    test split (index batches + on-device gather, make_eval_step
    indexed=True) must reproduce the host-fed eval metrics exactly."""
    _, out = result
    from mvuld_tpu.train.train_fusion import main
    common = [
        "--batch-size", "16",
        "--output", out,
        "--cache-dir", os.path.join(out, "cache"),
        "--test",
        "--opts",
        "DATA.MAX_NODES", "32",
        "MODEL.MULTI.HIDDEN", "64",
        "MODEL.MULTI.NUM_RS_GCN", "2",
        "MODEL.MULTI.NUM_HIDDEN_FC", "2",
        "PARALLEL.DTYPE", "float32",
    ]
    r_host = main(list(common))
    r_dev = main(common + ["TRAIN.DEVICE_EVAL", "True"])
    for key in ("f1", "pr_auc", "acc", "roc_auc"):
        np.testing.assert_allclose(r_host["test_metrics"][key],
                                   r_dev["test_metrics"][key], rtol=1e-6)
