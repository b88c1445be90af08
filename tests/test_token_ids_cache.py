"""Tokenized graph-cache variant (reference item1, data_list.py:235-263):
precompute must emit per-node token ids alongside node embeddings, and the
staged fusion loader must surface them."""

import numpy as np
import pytest


@pytest.mark.slow
def test_cache_emits_and_loader_reads_token_ids(tmp_path):
    from mvuld_tpu.config import default_config
    from mvuld_tpu.data.tokenizer import CodeTokenizer, normalize_line
    from mvuld_tpu.tools.dataset import train_val_test_split
    from mvuld_tpu.tools.synthetic import generate_dataset
    from mvuld_tpu.train.precompute import build_fusion_cache
    from mvuld_tpu.train.train_fusion import load_cached_datasets

    df = train_val_test_split(generate_dataset(24, seed=3))
    cfg = default_config()
    cfg.DATA.MAX_NODES = 16
    cfg.DATA.NODE_TOKENS = 24
    tok = CodeTokenizer.train(df.func_before.tolist(), vocab_size=512)

    paths = build_fusion_cache(df, str(tmp_path / "cache"), cfg,
                               tokenizer=tok)
    z = np.load(paths["train"])
    assert z["token_ids"].shape == (len(z["label"]), 16, 24)
    assert z["token_ids"].dtype == np.int32

    # token ids of a real node line must equal tokenizer.tokenize directly
    nm = z["node_mask"]
    i, j = map(int, np.argwhere(nm > 0)[0])
    func = df[df._id == int(z["ids"][i])].func_before.iloc[0]
    ln = int(z["lineno"][i, j])
    line = normalize_line(func.split("\n")[ln - 1])
    expect = np.asarray(tok.tokenize([line], max_length=24))[0]
    np.testing.assert_array_equal(z["token_ids"][i, j], expect)
    assert (z["token_ids"][i, j] != 0).any()

    # loader surfaces the column for the staged trainer
    ds = load_cached_datasets(paths)
    batch = ds["train"].get(0)
    assert "token_ids" in batch and batch["token_ids"].shape == (16, 24)

    # caches written WITHOUT a tokenizer still load (column stays zeros)
    paths2 = build_fusion_cache(df, str(tmp_path / "cache2"), cfg)
    z2 = np.load(paths2["train"])
    assert (z2["token_ids"] == 0).all()
