"""train_text with PARALLEL.PP: pipeline-parallel text-encoder training.

The pp path (parallel/pipeline.py) must be a drop-in: same param tree, same
eval numbers as the sequential model (deterministic mode), and a working
train loop (loss history finite, best-F1 produced).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the -m 'not slow' lane


def _opts(extra=()):
    return [
        "MODEL.UNIXCODER.LAYERS", "4",
        "MODEL.UNIXCODER.HIDDEN", "32",
        "MODEL.UNIXCODER.HEADS", "2",
        "MODEL.UNIXCODER.INTERMEDIATE", "64",
        "DATA.FUNC_TOKENS", "64",
        "DATA.BATCH_SIZE", "8",
        "TRAIN.EPOCHS", "2",
        "TRAIN.WARMUP_EPOCHS", "1",
        "PARALLEL.DTYPE", "float32",
        "PRINT_FREQ", "50",
        *extra,
    ]


def test_train_text_pp_runs(tmp_path):
    from mvuld_tpu.train.train_text import main
    res = main(["--synthetic", "24", "--output", str(tmp_path / "pp"),
                "--opts", *_opts(("PARALLEL.PP", "4",
                                  "PARALLEL.PP_MICROBATCHES", "2"))])
    assert res["history"], "no validation history"
    assert all(np.isfinite(h["f1"]) for h in res["history"])
    assert np.isfinite(res["best_f1"])


def test_train_text_pp_eval_parity(tmp_path):
    """--test evaluates the seed-initialized params: the pp forward must
    produce the SAME metrics as the sequential encoder (identical param
    tree, deterministic math, only the schedule differs)."""
    from mvuld_tpu.train.train_text import main
    tok = str(tmp_path / "tok.json")
    seq = main(["--synthetic", "24", "--test", "--tokenizer", tok,
                "--output", str(tmp_path / "seq"), "--opts", *_opts()])
    pp = main(["--synthetic", "24", "--test", "--tokenizer", tok,
               "--output", str(tmp_path / "ppe"),
               "--opts", *_opts(("PARALLEL.PP", "4",
                                 "PARALLEL.PP_MICROBATCHES", "2"))])
    for k in ("acc", "f1", "pr_auc"):
        assert abs(seq["test_metrics"][k] - pp["test_metrics"][k]) < 1e-6, \
            (k, seq["test_metrics"], pp["test_metrics"])
