import numpy as np
import pandas as pd

from mvuld_tpu.data.graph_batch import (adjacency_for, batch_graphs, pack_graph,
                                        per_etype_adjacency)
from mvuld_tpu.tools.cpg import extract_line_cpg
from mvuld_tpu.tools.dataset import (prepare_corpus, read_manifest,
                                     rebalance_train, train_val_test_split,
                                     write_manifests)
from mvuld_tpu.tools.synthetic import generate_dataset
from mvuld_tpu.tools.vocab import EDGE_TYPE_MAP


def test_split_stratified_and_deterministic():
    df = generate_dataset(300, seed=0)
    s1 = train_val_test_split(df, seed=42)
    s2 = train_val_test_split(df, seed=42)
    pd.testing.assert_frame_equal(s1, s2)
    frac = s1.label.value_counts(normalize=True)
    assert 0.75 < frac["train"] < 0.85
    # stratification: vul rate similar across partitions
    rates = s1.groupby("label").vul.mean()
    assert rates.max() - rates.min() < 0.15


def test_rebalance_train_only():
    df = generate_dataset(400, seed=1, vul_ratio=0.2)
    df = train_val_test_split(df, seed=42)
    rb = rebalance_train(df, seed=42)
    tr = rb[rb.label == "train"]
    pos, neg = (tr.vul == 1).sum(), (tr.vul == 0).sum()
    assert abs(pos - neg) <= 1
    # val/test untouched
    for part in ("val", "test"):
        assert len(rb[rb.label == part]) == len(df[df.label == part])


def test_prepare_corpus_and_manifests(tmp_path):
    df = generate_dataset(120, seed=2)
    out = prepare_corpus(df, seed=42)
    assert set(out.label) == {"train", "val", "test"}
    tr, va, te = write_manifests(out, img_dir="imgs", out_dir=str(tmp_path))
    m = read_manifest(tr)
    assert set(m.columns) == {"_id", "img_path", "vul"}
    assert m.vul.isin([0, 1]).all()
    assert all("buggy" in p or "clean" in p for p in m.img_path)


def test_pack_graph_shapes_and_selfloops():
    code = "int f(int a)\n{\n    int x;\n    x = a + 1;\n    return x;\n}"
    cpg = extract_line_cpg(code)
    pg = pack_graph(cpg, max_nodes=16, pos_dict={1: [0.1, 0.2, 0.3, 0.4]})
    assert pg.lineno.shape == (16,) and pg.adj.shape == (16, 16)
    assert pg.mask.sum() == pg.num_nodes
    assert pg.pos[0, 0] == np.float32(0.1)
    # self-loops present on valid nodes only
    diag = np.diag(pg.adj)
    assert (diag[: pg.num_nodes] > 0).all()
    assert (diag[pg.num_nodes:] == 0).all()


def test_adjacency_bitmask_filters():
    code = """int f(int a)
{
    int x;
    x = 0;
    if (a > 0) {
        x = a;
    }
    return x;
}"""
    cpg = extract_line_cpg(code)
    pg = pack_graph(cpg, max_nodes=10, gtype="all")
    batch = batch_graphs([pg, pg])
    assert batch["adj"].shape == (2, 10, 10)
    a_ast = adjacency_for(batch["adj"], ["AST"])
    a_cfg = adjacency_for(batch["adj"], ["CFG"])
    a_all = adjacency_for(batch["adj"], ["AST", "CFG", "CDG"])
    assert a_ast.sum() > 0 and a_cfg.sum() > 0
    assert (a_all >= a_ast).all() and (a_all >= a_cfg).all()
    per = per_etype_adjacency(batch["adj"])
    assert per.shape == (2, len(EDGE_TYPE_MAP), 10, 10)
    np.testing.assert_array_equal(per[:, EDGE_TYPE_MAP["AST"]] > 0, a_ast)


def test_truncation_to_max_nodes():
    # a function with many lines
    body = "\n".join(f"    x = x + {i};" for i in range(30))
    code = f"int f(int x)\n{{\n{body}\n    return x;\n}}"
    cpg = extract_line_cpg(code)
    pg = pack_graph(cpg, max_nodes=8)
    assert pg.num_nodes == 8
    assert pg.mask.sum() == 8
    # kept nodes are the first 8 in line order
    assert list(pg.lineno[:8]) == sorted(pg.lineno[:8].tolist())
