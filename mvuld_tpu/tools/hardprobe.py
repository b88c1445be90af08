"""Bag-of-tokens probe vs corpus scale for the hard synthetic mode.

NOTES_r4 session 5 anchored "the hard corpus is not token-separable" with a
single 800-sample probe (0.590 test acc vs 0.525 base rate). This tool runs
the SAME probe under the trainers' exact corpus protocol (generate_dataset →
prepare_corpus: clean → dedup → <100-line filter → stratified seed-42
split → 1:1 train rebalance) at any scale, so the 4× data-scaling study can
cite "surface tokens stay uninformative at 2400" with the identical split
the detectors saw.

Usage: python -m mvuld_tpu.tools.hardprobe [--sizes 600 2400] [--seed 42]
Prints one JSON line per size.
"""

from __future__ import annotations

import argparse
import json


def probe_at_scale(n: int, seed: int = 42, hard: bool = True) -> dict:
    from sklearn.feature_extraction.text import CountVectorizer
    from sklearn.linear_model import LogisticRegression
    from sklearn.metrics import f1_score

    from mvuld_tpu.tools.dataset import prepare_corpus
    from mvuld_tpu.tools.synthetic import generate_dataset

    df = prepare_corpus(generate_dataset(n, seed=seed, hard=hard))
    tr = df[df.label == "train"]
    te = df[df.label == "test"]
    # same token pattern as tests/test_synthetic_hard.py:_probe_accuracy —
    # identifiers, integer literals, comparison operators
    vec = CountVectorizer(token_pattern=r"[A-Za-z_]\w*|\d+|[<>=!]+")
    Xtr = vec.fit_transform(tr.func_before.tolist())
    Xte = vec.transform(te.func_before.tolist())
    clf = LogisticRegression(max_iter=2000).fit(Xtr, tr.vul.values)
    pred = clf.predict(Xte)
    return {
        "corpus_size": n,
        "hard": hard,
        "n_train": int(len(tr)),
        "n_test": int(len(te)),
        "test_base_rate": float(max(te.vul.mean(), 1 - te.vul.mean())),
        "probe_test_acc": float(clf.score(Xte, te.vul.values)),
        "probe_test_f1": float(f1_score(te.vul.values, pred)),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", type=int, nargs="+", default=[600, 2400])
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--default-mode", action="store_true",
                   help="probe the default (non-hard) corpus instead")
    args = p.parse_args(argv)
    for n in args.sizes:
        print(json.dumps(probe_at_scale(n, seed=args.seed,
                                        hard=not args.default_mode)))


if __name__ == "__main__":
    main()
