"""IVDetect data-dependency channel must embed ALL dependent statements —
the reference concatenates every dependency line (ivdetect/dataset.py:
122-301); round-2 truncated to the first 3 (VERDICT r2 weak item 6)."""

import numpy as np
import pandas as pd


def test_all_dep_lines_embed(monkeypatch):
    import mvuld_tpu.train.train_baseline as tb
    from mvuld_tpu.tools.embeddings import EmbeddingTable, tokenize_code

    # line 6 has FOUR reaching-def dependencies (lines 2-5); with the old
    # [:3] truncation the 4th dependency's tokens never embedded
    src = ("int f(int c) {\n"
           "  int a1 = c;\n"
           "  int a2 = c;\n"
           "  int a3 = c;\n"
           "  int a4 = c;\n"
           "  return a1 + a2 + a3 + a4;\n"
           "}")
    monkeypatch.setattr(tb, "SEQ_LEN", 32)  # room for all 4 joined lines

    corpus_tokens = sorted(set(tokenize_code(src)))
    vocab = {"<unk>": 0}
    for t in corpus_tokens:
        vocab.setdefault(t, len(vocab))
    vectors = np.eye(len(vocab), dtype=np.float32)  # one-hot id = vocab row
    emb = EmbeddingTable(vocab, vectors)

    df = pd.DataFrame([{"func_before": src, "vul": 1, "label": "train"}])
    feats = tb.build_ivdetect_features(df, emb, max_nodes=12)
    f_data = feats["train"]["f_data"][0]          # [N, SEQ_LEN, D]

    # which vocab ids were embedded anywhere in the data channel?
    used_ids = set(np.argwhere(f_data.reshape(-1, len(vocab)) == 1.0)[:, 1])
    for tok in ("a1", "a2", "a3", "a4"):
        assert vocab[tok] in used_ids, \
            f"dependency line defining {tok} missing from the data channel"
