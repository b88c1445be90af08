"""mvuld_tpu.tools.hardprobe: probe-at-scale tool contract.

The tool re-measures the bag-of-tokens probe under the trainers' exact
corpus protocol (prepare_corpus: clean -> dedup -> stratified seed-42
split -> 1:1 train rebalance), so scaling-study numbers cite the same
splits the detectors saw. Checked here: the result dict is well-formed,
split sizes are consistent with the 80/10/10 protocol, and metrics are
valid probabilities.
"""

from mvuld_tpu.tools.hardprobe import probe_at_scale


def test_probe_at_scale_contract():
    r = probe_at_scale(200, seed=7, hard=True)
    assert r["corpus_size"] == 200 and r["hard"] is True
    # prepare_corpus dedups + filters, so counts are <= the raw split, and
    # test stays the ~10% stratified slice
    assert 0 < r["n_test"] <= 30
    assert r["n_train"] > r["n_test"]
    for k in ("test_base_rate", "probe_test_acc", "probe_test_f1"):
        assert 0.0 <= r[k] <= 1.0, (k, r[k])
    # base rate of a near-balanced stratified split
    assert 0.45 <= r["test_base_rate"] <= 0.75


def test_probe_default_mode_separable_under_trainer_splits():
    # the default corpus stays token-separable under the exact trainer
    # protocol too (mirrors test_synthetic_hard on raw splits)
    r = probe_at_scale(300, seed=7, hard=False)
    assert r["probe_test_acc"] >= 0.9
