"""Hard synthetic mode: value-binding vulnerability corpus.

The default generator's vulnerable/fixed twins differ in surface tokens,
which saturates every detector (Devign/ReVeal/IVDetect measured 0.97-1.00
test F1, NOTES_r4). Hard mode's contract, checked here:

1. well-formed: both classes present near balance, every function unique
   and parsable by the CPG extractor;
2. NOT token-separable: a bag-of-tokens linear probe that scores ~1.0 on
   the default corpus stays near chance on the hard corpus — the label
   lives in relations between literals (guard bound vs declared size),
   not in token presence.
"""

import numpy as np

from mvuld_tpu.tools.cpg import extract_line_cpg
from mvuld_tpu.tools.synthetic import generate_dataset


def test_hard_corpus_well_formed():
    df = generate_dataset(300, seed=7, hard=True)
    assert 0.3 < df.vul.mean() < 0.7
    assert df.func_before.nunique() == len(df)
    for src in df.func_before.tolist()[:60]:
        cpg = extract_line_cpg(src)
        assert cpg is not None and len(cpg.nodes) >= 3


def _probe_accuracy(hard: bool) -> float:
    import re

    from sklearn.feature_extraction.text import CountVectorizer
    from sklearn.linear_model import LogisticRegression

    df = generate_dataset(800, seed=42, hard=hard)
    X, y = df.func_before.tolist(), df.vul.values
    ntr = 600
    vec = CountVectorizer(token_pattern=r"[A-Za-z_]\w*|\d+|[<>=!]+")
    Xtr, Xte = vec.fit_transform(X[:ntr]), vec.transform(X[ntr:])
    clf = LogisticRegression(max_iter=2000).fit(Xtr, y[:ntr])
    return float(clf.score(Xte, y[ntr:]))


def test_default_mode_is_token_separable():
    # sanity for the probe itself: the default twins ARE keyed by tokens
    assert _probe_accuracy(hard=False) >= 0.95


def test_hard_mode_defeats_token_probe():
    # measured 0.59 vs 0.525 base rate; 0.72 leaves seed margin
    assert _probe_accuracy(hard=True) <= 0.72


def _oracle_label(src: str):
    """Re-derive the vul label from the SOURCE TEXT alone by extracting the
    literal relation each hard family encodes (mirrors _hard_function's
    rules without touching the generator's internals)."""
    import re

    decl = re.search(r"\w+ \w+\[(\d+)\];", src)
    if "memcpy" in src:                       # fam 0: guarded memcpy
        n = int(decl.group(1))
        op, bound = re.search(r"if \(len (>=|>) (\d+)\)", src).groups()
        max_len = int(bound) if op == ">" else int(bound) - 1
        return int(max_len > n)
    if "for (" in src:                        # fam 1: loop bound
        n = int(decl.group(1))
        op, bound = re.search(r"; \w+ (<=|<) (\d+);", src).groups()
        max_idx = int(bound) - 1 if op == "<" else int(bound)
        return int(max_idx > n - 1)
    if "idx" in src:                          # fam 2: index guard
        n = int(decl.group(1))
        op, bound = re.search(r"\|\| idx (>=|>) (\d+)\)", src).groups()
        accepted_max = int(bound) - 1 if op == ">=" else int(bound)
        return int(accepted_max > n - 1)
    if "strncpy" in src:                      # fam 3: copy len + terminator
        d = int(decl.group(1))
        bound = int(re.search(r"strncpy\(\w+, \w+, (\d+)\)", src).group(1))
        term = int(re.search(r"\w+\[(\d+)\] = 0;", src).group(1))
        return int(bound > d or term > d - 1)
    if "malloc" in src:                       # fam 4: heap index reach
        alloc = int(re.search(r"malloc\((\d+) \* sizeof", src).group(1))
        idx = int(re.search(r"\w+\[(\d+)\] = 7;", src).group(1))
        return int(idx > alloc - 1)
    raise AssertionError(f"unrecognized hard family:\n{src}")


def test_hard_labels_recoverable_by_relation_oracle():
    """The hard corpus is SOLVABLE: every label is a deterministic function
    of literals present in the text (zero label noise). A detector at
    chance (NOTES_r4 hard-600 table) therefore reflects representation /
    sample-size limits, not a broken corpus."""
    df = generate_dataset(500, seed=11, hard=True)
    preds = [_oracle_label(s) for s in df.func_before.tolist()]
    assert (np.asarray(preds) == df.vul.values).all()
