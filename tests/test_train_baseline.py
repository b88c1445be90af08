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
