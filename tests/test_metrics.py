import numpy as np
import pytest

from mvuld_tpu.core import metrics as M

sklearn = pytest.importorskip("sklearn")
from sklearn.metrics import (  # noqa: E402
    average_precision_score, f1_score, precision_score, recall_score, roc_auc_score,
)


@pytest.fixture(params=[0, 1, 2])
def data(request):
    rng = np.random.RandomState(request.param)
    n = 500
    y = (rng.rand(n) < 0.15).astype(np.int64)   # imbalanced like Big-Vul test
    score = np.clip(y * 0.3 + rng.rand(n) * 0.8, 0, 1)
    return y, score


def test_average_precision_matches_sklearn(data):
    y, s = data
    assert M.average_precision(y, s) == pytest.approx(
        average_precision_score(y, s, pos_label=1), abs=1e-10)


def test_roc_auc_matches_sklearn(data):
    y, s = data
    assert M.roc_auc(y, s) == pytest.approx(roc_auc_score(y, s), abs=1e-10)


def test_roc_auc_with_ties():
    y = np.array([0, 0, 1, 1, 0, 1])
    s = np.array([0.5, 0.5, 0.5, 0.9, 0.1, 0.9])
    assert M.roc_auc(y, s) == pytest.approx(roc_auc_score(y, s), abs=1e-10)


def test_hard_metrics_match_sklearn(data):
    y, s = data
    pred = (s > 0.5).astype(np.int64)
    m = M.get_metrics(y, pred)
    assert m["f1"] == pytest.approx(f1_score(y, pred), abs=1e-10)
    assert m["precision"] == pytest.approx(precision_score(y, pred, zero_division=0), abs=1e-10)
    assert m["recall"] == pytest.approx(recall_score(y, pred), abs=1e-10)


def test_best_f1_is_max_over_thresholds(data):
    y, s = data
    bf1, bth = M.best_f1(y, s)
    # brute force over all distinct thresholds with rule score >= t
    brute = max(f1_score(y, (s >= t).astype(int)) for t in np.unique(s))
    assert bf1 == pytest.approx(brute, abs=1e-10)
    assert f1_score(y, (s >= bth).astype(int)) == pytest.approx(bf1, abs=1e-10)


def test_logits_pipeline():
    y = np.array([0, 1, 1, 0])
    logits = np.array([[2.0, -1.0], [-1.0, 2.0], [0.0, 0.1], [0.3, 0.0]])
    m = M.get_metrics_logits(y, logits)
    assert m["acc"] == 1.0 and m["f1"] == 1.0
    assert m["pr_auc"] == pytest.approx(1.0)


def test_degenerate_no_positives():
    y = np.zeros(10, dtype=int)
    s = np.linspace(0, 1, 10)
    m = M.get_metrics_probs(y, s)
    assert m["f1"] == 0.0 and m["pr_auc"] == 0.0 and m["roc_auc"] == 0.5


def test_window_rate_per_window():
    """Regression for the round-4 telemetry bug (harness.py): printed
    samples/s must reflect the CURRENT window, not cumulative-samples /
    cumulative-time (which decays toward 0 as epochs progress)."""
    from mvuld_tpu.core.logger import WindowRate

    t = [100.0]
    meter = WindowRate(clock=lambda: t[0])
    # window 1: 50 print-intervals' worth of batches, 10 samples each, 5 s
    for _ in range(50):
        meter.add(10)
    t[0] += 5.0
    assert meter.read() == pytest.approx(100.0)   # 500 samples / 5 s
    # window 2: same load, same duration -> IDENTICAL rate (no decay)
    for _ in range(50):
        meter.add(10)
    t[0] += 5.0
    assert meter.read() == pytest.approx(100.0)
    # window 3: half the load in the same time -> rate halves
    for _ in range(25):
        meter.add(10)
    t[0] += 5.0
    assert meter.read() == pytest.approx(50.0)
    assert meter.val == pytest.approx(50.0)
    # zero-duration window is guarded, not a ZeroDivisionError
    meter.add(10)
    assert meter.read() > 0
