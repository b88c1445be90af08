import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.slow
def test_bilinear_fusion_zoo():
    from mvuld_tpu.models.bilinear_fusion import BILINEAR_FUSIONS, build_bilinear_fusion
    rng = np.random.RandomState(0)
    x = [jnp.asarray(rng.randn(3, 32).astype(np.float32)),
         jnp.asarray(rng.randn(3, 24).astype(np.float32))]
    pairwise = ["linear_sum", "concat_mlp", "mlb", "mfb", "mfh", "mutan",
                "tucker", "block", "block_tucker"]
    for name in pairwise:
        m = build_bilinear_fusion(name, input_dims=(32, 24), output_dim=16,
                                  mm_dim=16)
        variables = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(variables, x)
        assert out.shape == (3, 16), name
        assert np.isfinite(np.asarray(out)).all(), name
    # relational network over a set
    rn = build_bilinear_fusion("relational_network", output_dim=16, hidden=16)
    s = jnp.asarray(rng.randn(2, 5, 8).astype(np.float32))
    variables = rn.init(jax.random.PRNGKey(0), s)
    out = rn.apply(variables, s)
    assert out.shape == (2, 16)
    assert set(pairwise + ["relational_network"]) <= set(BILINEAR_FUSIONS.keys())


def test_storage_and_dfmp(tmp_path, monkeypatch):
    monkeypatch.setenv("MVULD_STORAGE", str(tmp_path))
    from mvuld_tpu.tools import storage
    assert storage.cache_dir().startswith(str(tmp_path))
    assert os.path.isdir(storage.processed_dir())
    assert list(storage.chunks([1, 2, 3, 4, 5], 2)) == [[1, 2], [3, 4], [5]]
    import pandas as pd
    df = pd.DataFrame({"x": [1, 2, 3]})
    out = storage.dfmp(df, lambda r: r["x"] * 2, workers=1)
    assert out == [2, 4, 6]
    out2 = storage.dfmp(df, str, columns="x", workers=1)
    assert out2 == ["1", "2", "3"]
    rid = storage.get_run_id()
    assert len(rid.split("_")) == 3


def test_gitdiff():
    from mvuld_tpu.tools.gitdiff import code2diff, gitdiff, mark_vulnerable_lines
    before = "int f() {\n  strcpy(a, b);\n  return 0;\n}"
    after = "int f() {\n  strncpy(a, b, 8);\n  a[7] = 0;\n  return 0;\n}"
    d = code2diff(before, after)
    assert d["removed"] == [2]
    assert d["added"] == [2, 3]
    assert "-  strcpy(a, b);" in d["diff"]
    import pandas as pd
    df = pd.DataFrame({"func_before": [before], "func_after": [after]})
    out = mark_vulnerable_lines(df)
    assert out.removed_lines.iloc[0] == [2]


def test_bigvul_dataset_class(tmp_path, monkeypatch):
    monkeypatch.setenv("MVULD_STORAGE", str(tmp_path))
    from mvuld_tpu.tools.dataset import BigVulDataset, prepare_corpus
    from mvuld_tpu.tools.synthetic import generate_dataset
    df = prepare_corpus(generate_dataset(60, seed=0))
    ds = BigVulDataset(df, partition="train")
    assert len(ds) > 0
    assert ds.stats()["n"] == len(ds)
    vul_only = BigVulDataset(df, partition="train", vulonly=True)
    assert all(vul_only.df.vul == 1)
    sampled = BigVulDataset(df, partition="train", sample=5)
    assert len(sampled) == 5
    ds2 = BigVulDataset(df.head(3), partition="train")
    ds2.write_functions()
    assert os.path.exists(ds2.itempath(int(ds2.df._id.iloc[0])))


def test_icdar_eval():
    from mvuld_tpu.ocr.icdar_eval import evaluate_dataset, evaluate_detections

    def box(x0, y0, x1, y1):
        return np.array([x0, y0, x1, y0, x1, y1, x0, y1], np.float32)

    gt = [box(0, 0, 10, 10), box(20, 20, 30, 30), box(50, 50, 60, 60)]
    ignored = [False, False, True]
    dets = [box(1, 1, 11, 11),          # matches gt0
            box(40, 0, 45, 5),          # false positive
            box(51, 51, 59, 59)]        # matches don't-care → discarded
    m = evaluate_detections(gt, ignored, dets)
    assert m["matched"] == 1 and m["gt_care"] == 2 and m["det"] == 2
    assert m["precision"] == 0.5 and m["recall"] == 0.5
    agg = evaluate_dataset([m, m])
    assert agg["hmean"] == pytest.approx(0.5)


@pytest.mark.slow
def test_unixcoder_lm_generate():
    from mvuld_tpu.models.roberta import RobertaConfig
    from mvuld_tpu.models.unixcoder import UniXcoderLM, beam_search_generate

    cfg = RobertaConfig(vocab_size=50, hidden_size=16, num_layers=1,
                        num_heads=2, intermediate_size=32,
                        max_position_embeddings=64, dropout_rate=0.0)
    model = UniXcoderLM(cfg)
    ids = jnp.asarray(np.array([[5, 6, 7, 1, 1]], np.int32))
    variables = model.init(jax.random.PRNGKey(0), ids)
    logits = model.apply(variables, ids)
    assert logits.shape == (1, 5, 50)

    # causality: changing a future token must not change past logits
    ids2 = jnp.asarray(np.array([[5, 6, 9, 1, 1]], np.int32))
    l1 = np.asarray(model.apply(variables, ids))
    l2 = np.asarray(model.apply(variables, ids2))
    np.testing.assert_allclose(l1[0, :2], l2[0, :2], atol=1e-5)

    def apply_fn(params, batch):
        return model.apply({"params": params}, jnp.asarray(batch))

    seqs = beam_search_generate(apply_fn, variables["params"],
                                np.array([[5, 6, 7]], np.int32),
                                beam_size=3, max_length=8, eos_id=2)
    assert len(seqs) == 1
    assert seqs[0][:3] == [5, 6, 7]
    assert len(seqs[0]) <= 8


def test_results_table(tmp_path, capsys):
    """results_table: harness history.json + train_baseline log parsing."""
    import json

    from mvuld_tpu.tools.results_table import main

    r1 = tmp_path / "run1" / "sub"
    r1.mkdir(parents=True)
    (r1 / "history.json").write_text(json.dumps(
        {"history": [{"epoch": 0, "f1": 0.5}],
         "test": {"f1": 0.91, "acc": 0.9, "pr_auc": 0.95}}))
    r2 = tmp_path / "run2"
    r2.mkdir()
    (r2 / "log_rank0.txt").write_text(
        "INFO val: {'f1': 0.3}\nINFO test: {'f1': 0.77, 'roc_auc': 0.88}\n")

    out_json = tmp_path / "t.json"
    table = main([f"e2e={r1.parent}", f"devign={r2}",
                  "--json", str(out_json)])
    assert table["e2e"]["f1"] == 0.91
    assert table["devign"]["roc_auc"] == 0.88
    printed = capsys.readouterr().out
    assert "| e2e | 0.9100" in printed and "| devign | 0.7700" in printed
    assert json.loads(out_json.read_text())["devign"]["f1"] == 0.77
