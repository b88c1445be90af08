import numpy as np
import pytest

from mvuld_tpu.data.tokenizer import CodeTokenizer, normalize_line

CORPUS = [
    "int main ( ) { return 0 ; }",
    "char * strcpy ( char * dest , const char * src )",
    "if ( len > MAX ) { memcpy ( buf , src , len ) ; }",
    "for ( int i = 0 ; i < n ; i ++ ) { sum += a [ i ] ; }",
    "void free_list ( struct node * head )",
] * 20


@pytest.fixture(scope="module")
def tok():
    return CodeTokenizer.train(CORPUS, vocab_size=600)


def test_encoder_only_framing(tok):
    out = tok.tokenize(["int main ( )"], max_length=16)
    assert out.shape == (1, 16)
    row = out[0].tolist()
    assert row[0] == tok.cls_id
    assert row[1] == tok.mode_ids["<encoder-only>"]
    assert row[2] == tok.sep_id
    # the final non-pad token is SEP
    nonpad = [t for t in row if t != tok.pad_id]
    assert nonpad[-1] == tok.sep_id
    assert all(t == tok.pad_id for t in row[len(nonpad):])


def test_truncation_budget(tok):
    long_text = " ".join(["memcpy"] * 200)
    out = tok.tokenize([long_text], max_length=32)
    assert out.shape == (1, 32)
    assert (out[0] != tok.pad_id).sum() == 32  # fully saturated: 3 prefix + 28 + SEP


def test_roundtrip_decode(tok):
    text = "memcpy ( buf , src , len )"
    ids = tok.tokenize([text], max_length=64)[0]
    assert normalize_line(tok.decode(ids)) == text


def test_save_load(tok, tmp_path):
    p = str(tmp_path / "tok.json")
    tok.save(p)
    tok2 = CodeTokenizer.load(p)
    a = tok.tokenize(["if ( x ) { }"], max_length=20)
    b = tok2.tokenize(["if ( x ) { }"], max_length=20)
    np.testing.assert_array_equal(a, b)


def test_decoder_only_keeps_tail(tok):
    long_text = " ".join([f"tok{i % 7}" for i in range(100)])
    enc = tok.tokenize([long_text], mode="<decoder-only>", max_length=16, padding=False)[0]
    assert len(enc) == 16
    assert enc[1] == tok.mode_ids["<decoder-only>"]
