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


def test_fourteen_transformations_registered():
    """Parity with the reference TXL suite's 14 actions
    (baselines/scripts/transform.py:26 — range(14))."""
    assert len(MUTATIONS) == 14


def test_for_to_while():
    from mvuld_tpu.tools.mutate import for_to_while
    out = for_to_while(CODE, random.Random(0))
    assert "while (i < n)" in out
    assert "i = 0;" in out
    assert "i++;" in out            # step moved into the body
    assert "for (" not in out
    assert extract_line_cpg(out) is not None


def test_while_to_for():
    from mvuld_tpu.tools.mutate import while_to_for
    out = while_to_for("void f(){ while (a < b) { a++; } }", random.Random(0))
    assert "for (; a < b ;)" in out


def test_ternary_to_if():
    from mvuld_tpu.tools.mutate import ternary_to_if
    out = ternary_to_if("void f(){\n    x = a > b ? a : b;\n}", random.Random(0))
    assert "if (a > b) { x = a; } else { x = b; }" in out


def test_split_declaration():
    from mvuld_tpu.tools.mutate import split_declaration
    out = split_declaration("void f(){\n    int x = 5 + y;\n}", random.Random(0))
    assert "int x; x = 5 + y;" in out


def test_explicit_compare():
    from mvuld_tpu.tools.mutate import explicit_compare
    out = explicit_compare("void f(){ if (p) { g(); } if (a < b) { h(); } }",
                           random.Random(0))
    assert "if ((p) != 0)" in out
    assert "if (a < b)" in out       # already a comparison: untouched


def test_flip_relational():
    from mvuld_tpu.tools.mutate import flip_relational
    out = flip_relational("if (i < n) { }", random.Random(0))
    assert "n > i" in out
    out2 = flip_relational("if (x <= 10) { }", random.Random(0))
    assert "10 >= x" in out2


def test_dead_var_insert_and_paren():
    from mvuld_tpu.tools.mutate import dead_var_insert, paren_condition
    out = dead_var_insert("void f(){ return; }", random.Random(3))
    assert "__rm_unused_" in out
    out2 = paren_condition("void f(){ while (a && b) { } }", random.Random(0))
    assert "while ((a && b))" in out2


def test_swap_if_else():
    from mvuld_tpu.tools.mutate import swap_if_else
    code = "void f(){ if (a < b) { x = 1; } else { x = 2; } }"
    out = swap_if_else(code, random.Random(0))
    assert "if (!(a < b))" in out
    assert out.index("x = 2") < out.index("x = 1")   # branches swapped
    # if without else: untouched
    keep = "void f(){ if (c) { y = 3; } }"
    assert swap_if_else(keep, random.Random(0)) == keep


def test_hard_twin_pairs():
    """hard_twin: deterministic (vul, patched) pairs of the SAME function
    differing only in guard/bound literals; both sides parse to usable
    CPGs; and the hard corpus generator stays byte-stable (committed runs
    are seed-reproducible)."""
    from mvuld_tpu.tools.cpg import extract_line_cpg
    from mvuld_tpu.tools.synthetic import generate_dataset, hard_twin

    rng = random.Random(11)
    pairs = [hard_twin(rng) for _ in range(15)]
    rng2 = random.Random(11)
    assert pairs == [hard_twin(rng2) for _ in range(15)]
    fams = set()
    for v, f in pairs:
        assert v != f
        assert len(v.split("\n")) == len(f.split("\n"))  # literal-only patch
        # identical token stream except numeric/operator literals
        import re
        strip = lambda s: re.sub(r"[0-9]+|[<>]=?", "#", s)
        assert strip(v) == strip(f)
        for code in (v, f):
            cpg = extract_line_cpg(code)
            assert cpg is not None and len(cpg.filtered("all").nodes) >= 2
        fams.add(v.split("(")[0])
    assert len(fams) >= 3     # several families at n=15

    # byte-stability of the corpus generator (hash checked in round 5
    # against the pre-refactor generator)
    df = generate_dataset(30, seed=42, hard=True)
    import hashlib
    h = hashlib.sha256(("".join(df.func_before)
                        + "".join(map(str, df.vul))).encode()).hexdigest()
    assert h == generate_dataset(30, seed=42, hard=True).pipe(
        lambda d: hashlib.sha256(("".join(d.func_before)
                                  + "".join(map(str, d.vul))).encode()
                                 ).hexdigest())


def test_baseline_ckpt_roundtrip(tmp_path):
    from mvuld_tpu.train.train_baseline import (load_baseline_ckpt,
                                                save_baseline_ckpt)
    import numpy as np
    payload = {"model": "devign", "params": {"w": np.ones((3, 2))},
               "emb_vocab": {"a": 0}, "emb_vectors": np.zeros((1, 4)),
               "max_nodes": 24, "emb_dim": 4}
    p = save_baseline_ckpt(str(tmp_path), payload)
    back = load_baseline_ckpt(str(tmp_path))
    assert back["model"] == "devign" and back["max_nodes"] == 24
    np.testing.assert_array_equal(back["params"]["w"], payload["params"]["w"])
    # direct .pkl path also accepted
    assert load_baseline_ckpt(p)["emb_dim"] == 4
