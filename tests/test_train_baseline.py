"""End-to-end slices for the three baseline trainers on synthetic data."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the -m 'not slow' quick lane

ARGS_COMMON = ["--synthetic", "80", "--batch-size", "8", "--max-nodes", "24",
               "--emb-dim", "24", "--epochs", "3", "--lr", "2e-3"]


@pytest.mark.parametrize("model", ["devign", "reveal", "ivdetect"])
def test_baseline_trains(model, tmp_path):
    from mvuld_tpu.train.train_baseline import main
    res = main(["--model", model, "--out-dir", str(tmp_path)] + ARGS_COMMON)
    results = res["results"]
    assert "test" in results
    m = results["test"]
    assert np.isfinite(m["pr_auc"]) and 0 <= m["pr_auc"] <= 1
    assert np.isfinite(m["f1"])


@pytest.mark.parametrize("model", ["devign", "reveal"])
def test_eval_patches_driver(model, tmp_path):
    """Reference eval_patches parity: train a detector, reload its
    checkpoint from disk, score (vulnerable, patched) twins, emit the
    flip-rate JSON + t-SNE artifact (eval_patches.py:38-615)."""
    import json
    import os

    from mvuld_tpu.tools.eval_patches import main as ep_main
    from mvuld_tpu.train.train_baseline import main as tb_main

    ckpt = tmp_path / f"ck_{model}"
    tb_main(["--model", model, "--out-dir", str(ckpt)] + ARGS_COMMON)
    assert (ckpt / "baseline_ckpt.pkl").exists()

    out = tmp_path / "pe"
    report = ep_main(["--model", model, "--ckpt", str(ckpt),
                      "--synthetic", "24", "--seed", "3",
                      "--batch-size", "8", "--out", str(out)])
    path = out / "patch_eval.json"
    assert path.exists()
    on_disk = json.loads(path.read_text())
    for key in ("flip_rate", "vul_detection_rate", "patch_clean_rate",
                "recall_on_vul", "still_flagged_ratio", "n_pairs"):
        assert key in on_disk and np.isfinite(on_disk[key])
    assert on_disk["pat_pred_as_1"] + on_disk["pat_pred_as_0"] == round(
        on_disk["recall_on_vul"] * on_disk["n_pairs"])
    if model == "reveal":   # exposes representations → t-SNE artifact
        assert os.path.exists(out / "tsne_reveal.png")


def test_eval_patches_text(tmp_path):
    """Text-detector patch eval through a train_text run dir."""
    from mvuld_tpu.tools.eval_patches import main as ep_main
    from mvuld_tpu.train.train_text import main as tt_main

    run = tmp_path / "textrun"
    tt_main(["--synthetic", "48", "--batch-size", "8",
             "--output", str(run),
             "--opts", "TRAIN.EPOCHS", "2", "MODEL.UNIXCODER.LAYERS", "2",
             "MODEL.UNIXCODER.HIDDEN", "64", "MODEL.UNIXCODER.HEADS", "2",
             "MODEL.UNIXCODER.INTERMEDIATE", "128",
             "DATA.FUNC_TOKENS", "64"])
    out = tmp_path / "pe_text"
    report = ep_main(["--model", "text", "--ckpt", str(run),
                      "--synthetic", "16", "--hard", "--batch-size", "8",
                      "--out", str(out)])
    assert (out / "patch_eval.json").exists()
    assert (out / "tsne_text.png").exists()
    assert 0.0 <= report["flip_rate"] <= 1.0
