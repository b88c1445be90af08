import numpy as np
import pytest

from mvuld_tpu.tools.cpg import extract_line_cpg
from mvuld_tpu.tools.mutate import (MUTATIONS, augment_dataframe,
                                    from_compound_assign, incr_rewrite,
                                    mutate, rename_identifiers,
                                    to_compound_assign)
from mvuld_tpu.tools.patch_eval import evaluate_patches, make_patch_pairs
from mvuld_tpu.tools.synthetic import generate_dataset

import random

CODE = """int sum_buf(int *buf, int n)
{
    int total;
    int i;
    total = 0;
    for (i = 0; i < n; i++) {
        total = total + buf[i];
    }
    return total;
}"""


def test_rename_consistent():
    rng = random.Random(0)
    out = rename_identifiers(CODE, rng)
    # function structure preserved
    assert "for (" in out and "return" in out
    # if 'total' was renamed, ALL occurrences changed consistently
    if "total" not in out:
        assert out.count("=") == CODE.count("=")
    assert extract_line_cpg(out) is not None


def test_compound_roundtrip():
    rng = random.Random(0)
    c1 = to_compound_assign(CODE, rng)
    assert "total += buf[i];" in c1
    c2 = from_compound_assign(c1, rng)
    assert "total = total + buf[i];" in c2


def test_incr_rewrite_statement_only():
    rng = random.Random(0)
    code = "void f(){\n  i++;\n  for (j = 0; j < 3; j++) { }\n}"
    out = incr_rewrite(code, rng)
    assert "i += 1;" in out
    assert "j++" in out          # loop-header increment untouched


def test_mutations_preserve_parseability():
    df = generate_dataset(20, seed=1)
    for _, row in df.iterrows():
        m = mutate(row.func_before, seed=int(row._id))
        g = extract_line_cpg(m)
        assert g is not None, m


def test_augment_dataframe_ids():
    df = generate_dataset(10, seed=0)
    aug = augment_dataframe(df, seed=0)
    assert len(aug) == 20
    assert set(aug._id) >= {1, 190001}
    assert (aug.vul.values[:10] == aug.vul.values[10:]).all()


def test_patch_eval_with_oracle():
    vul, fixed = make_patch_pairs(30, seed=0)
    assert len(vul) == len(fixed) == 30
    assert all(v != f for v, f in zip(vul, fixed))

    # oracle: detects the textual vulnerability signatures
    def prob_fn(codes):
        out = []
        for c in codes:
            bad = ("strcpy(" in c or ("memcpy" in c and "if (len >" not in c)
                   or "printf(src" in c.replace(" ", ""))
            out.append(0.9 if bad else 0.1)
        return np.asarray(out)

    m = evaluate_patches(prob_fn, vul, fixed)
    assert m["n_pairs"] == 30
    assert 0 <= m["flip_rate"] <= 1
    assert m["mean_prob_drop"] >= 0


def test_k_hop_neighbors():
    from mvuld_tpu.data.graph_batch import k_hop_neighbors
    adj = np.zeros((5, 5), np.uint8)
    adj[0, 1] = adj[1, 2] = adj[3, 4] = 1
    assert k_hop_neighbors(adj, [0], 1).tolist() == [0, 1]
    assert k_hop_neighbors(adj, [0], 2).tolist() == [0, 1, 2]
    assert k_hop_neighbors(adj, [2], 1).tolist() == [1, 2]   # undirected
    assert k_hop_neighbors(adj, [0], 2, include_seeds=False).tolist() == [1, 2]


def test_plot_embedding(tmp_path):
    from mvuld_tpu.tools.patch_eval import plot_embedding
    rng = np.random.RandomState(0)
    feats = np.concatenate([rng.randn(20, 8) + 3, rng.randn(20, 8) - 3])
    labels = np.array([0] * 20 + [1] * 20)
    out = plot_embedding(feats, labels, str(tmp_path / "tsne.png"))
    import os
    assert os.path.exists(out) and os.path.getsize(out) > 1000
