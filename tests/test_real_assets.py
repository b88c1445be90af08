"""Real-asset ingestion paths: released vocab/merges files, released torch
UniXcoder checkpoints (both layouts), and a real MSR-format Big-Vul CSV.

The environment has no network, so the fixtures are checked-in files in the
EXACT released formats: ``tests/fixtures/{vocab.json,merges.txt}`` is a
GPT2/RoBERTa byte-level-BPE pair (the format of microsoft/unixcoder-base-nine's
vocab.json/merges.txt), and the CSV mirrors MSR_data_cleaned.csv's columns
(reference: baselines/scripts/process_dataset.py:58-76 keepcols).
"""

import os

import numpy as np
import pytest

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


# ---------------------------------------------------------------- tokenizer
def test_tokenizer_from_files_matches_hf_roberta():
    """CodeTokenizer.from_files on a released-format vocab/merges pair must
    produce the same BPE ids as HF's RobertaTokenizer on the same files
    (the reference tokenizes with RobertaTokenizer, unixcoder.py:100-118)."""
    transformers = pytest.importorskip("transformers")
    from mvuld_tpu.data.tokenizer import CodeTokenizer

    tok = CodeTokenizer.from_files(os.path.join(FIX, "vocab.json"),
                                   os.path.join(FIX, "merges.txt"))
    hf = transformers.RobertaTokenizer(
        vocab_file=os.path.join(FIX, "vocab.json"),
        merges_file=os.path.join(FIX, "merges.txt"))
    snippets = [
        "int main(int argc, char **argv) { return 0; }",
        "strcpy(buf, argv[1]);",
        "for (int i = 0; i < 16; i++) buf[i] ^= 0x5a;",
    ]
    for s in snippets:
        ours = tok.encode_ids(s)
        theirs = hf(s, add_special_tokens=False)["input_ids"]
        assert ours == theirs, s


def test_tokenizer_from_files_unixcoder_framing():
    """Mode specials missing from a released vocab are appended, and the
    encoder-only framing is [<s>, <encoder-only>, </s>] ... </s> + pads."""
    from mvuld_tpu.data.tokenizer import CodeTokenizer

    tok = CodeTokenizer.from_files(os.path.join(FIX, "vocab.json"),
                                   os.path.join(FIX, "merges.txt"))
    ids = tok.tokenize(["return 0;"], max_length=16)[0]
    assert ids[0] == tok.cls_id == 0
    assert ids[1] == tok.mode_ids["<encoder-only>"]
    assert ids[2] == tok.sep_id == 2
    pad_tail = ids[np.argmax(ids == tok.pad_id):]
    assert (pad_tail == tok.pad_id).all()
    # second </s> closes the content
    content_end = int(np.max(np.nonzero(ids != tok.pad_id)))
    assert ids[content_end] == tok.sep_id


# ------------------------------------------------------------- checkpoints
@pytest.fixture(scope="module")
def tiny_hf_roberta():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    cfg = transformers.RobertaConfig(
        vocab_size=200, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=10, pad_token_id=1)
    torch.manual_seed(0)
    return torch, transformers.RobertaModel(cfg, add_pooling_layer=False).eval()


def _flax_cfg():
    from mvuld_tpu.models.roberta import RobertaConfig
    return RobertaConfig(vocab_size=200, hidden_size=32, num_layers=2,
                         num_heads=2, intermediate_size=64,
                         max_position_embeddings=64)


@pytest.mark.parametrize("layout", ["bare", "defect_model", "data_parallel"])
@pytest.mark.slow
def test_load_unixcoder_checkpoint_layouts(tiny_hf_roberta, layout, tmp_path):
    """All released checkpoint layouts convert: bare RobertaModel
    (unixcoder-base-nine), cunixcoder DefectModel (encoder.* + classifier),
    and the same under nn.DataParallel's module. prefix — loaded from an
    actual torch.save/torch.load roundtrip."""
    import jax
    import jax.numpy as jnp

    from mvuld_tpu.models.unixcoder import UniXcoderClassifier
    from mvuld_tpu.models.roberta import RobertaEncoder
    from mvuld_tpu.utils.torch_convert import load_unixcoder_checkpoint

    torch, hf = tiny_hf_roberta
    sd = hf.state_dict()
    rng = np.random.RandomState(0)
    clf_w = rng.randn(2, 32).astype(np.float32)
    clf_b = rng.randn(2).astype(np.float32)
    if layout != "bare":
        sd = {f"encoder.{k}": v for k, v in sd.items()}
        sd["classifier.weight"] = torch.tensor(clf_w)
        sd["classifier.bias"] = torch.tensor(clf_b)
    if layout == "data_parallel":
        sd = {f"module.{k}": v for k, v in sd.items()}

    path = tmp_path / "pytorch_model.bin"
    torch.save(sd, str(path))
    loaded = torch.load(str(path))
    encoder, classifier, num_layers = load_unixcoder_checkpoint(loaded)
    assert num_layers == 2

    # converted encoder reproduces the HF hidden states
    ids = np.array([[0, 5, 9, 17, 2, 1, 1, 1]], np.int32)
    mask = (ids != 1).astype(np.int64)
    with torch.no_grad():
        want = hf(torch.tensor(ids, dtype=torch.long),
                  attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    enc = RobertaEncoder(_flax_cfg())
    got = np.asarray(enc.apply({"params": encoder}, jnp.asarray(ids),
                               jnp.asarray(mask.astype(np.int32))))
    np.testing.assert_allclose(got * mask[..., None], want * mask[..., None],
                               atol=3e-4, rtol=1e-3)

    if layout == "bare":
        assert classifier is None
    else:
        # full DefectModel forward with the converted head
        model = UniXcoderClassifier(_flax_cfg())
        params = {"encoder": encoder, "classifier": classifier}
        logits, _sent = model.apply({"params": params}, jnp.asarray(ids))
        assert logits.shape == (1, 2)
        np.testing.assert_allclose(np.asarray(classifier["kernel"]), clf_w.T)


# ------------------------------------------------------------------ MSR CSV
def test_process_dataset_on_msr_format_csv(tmp_path):
    """Dry-run the step-1 CLI on a CSV with MSR_data_cleaned.csv's columns.
    Load-bearing columns: func_before, func_after, vul (reference keepcols,
    process_dataset.py:58-76); extras must pass through untouched."""
    import pandas as pd

    from mvuld_tpu.tools.process_dataset import main

    rng = np.random.RandomState(0)
    rows = []
    for i in range(30):
        vul = int(i % 3 == 0)
        body = "\n".join(f"  int x{j} = {j} + {i};" for j in range(3 + i % 4))
        before = f"int f{i}(int a) {{\n{body}\n  return a;\n}}"
        after = before.replace("return a", "return a + 1") if vul else before
        rows.append({
            "Unnamed: 0": i, "CVE ID": f"CVE-2020-{1000 + i}",
            "CWE ID": "CWE-119", "Vulnerability Classification": "Overflow",
            "commit_id": f"{i:040x}", "commit_message": "fix",
            "func_before": before, "func_after": after, "vul": vul,
            "project": "proj", "lang": "C",
        })
    csv = tmp_path / "MSR_data_cleaned.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)

    out = tmp_path / "bigvul_cleaned.pkl"
    df = main(["--input", str(csv), "--output", str(out)])
    assert os.path.exists(out)
    assert set(df.label.unique()) <= {"train", "val", "test"}
    assert {"func_before", "vul", "_id", "label"} <= set(df.columns)
    # vul rows where before == after must have been dropped (reference
    # cleaned_dataset, process_dataset.py:42)
    assert ((df.vul == 0) | (df.func_before != df.func_after)).all()
