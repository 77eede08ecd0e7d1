"""Distributed BPE tokenizer (operators/tokenizer.py): training on the
word-frequency table, greedy rank-ordered encoding, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from picovdb_spark.operators.tokenizer import (
    END,
    bpe_encode,
    bpe_train,
    bpe_vocab,
    encode_word,
)


@pytest.fixture(scope="module")
def tiny(spark):
    # classic BPE toy: 'low' x5, 'lower' x2, 'newest' x6, 'widest' x3
    rows = [
        (1, "low low low low low"),
        (2, "lower lower"),
        (3, "newest newest newest newest newest newest"),
        (4, "widest widest widest"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_reproduces_classic_merges(tiny):
    merges = bpe_train(tiny, 10, min_count=1)
    # Sennrich running example: (e,s), (s,t), (t,</w>) all occur 9x
    # (newest 6 + widest 3) — frequency ties break lexicographically,
    # so (e,s) trains first, then (es,t), then (est,</w>)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", END)
    joined = bpe_vocab(merges)
    assert "es" in joined and "est" in joined
    # determinism: same corpus -> identical merge list
    assert merges == bpe_train(tiny, 10, min_count=1)


def test_encode_word_greedy_rank_order():
    # ranks: (s,t) first, then (e,st) -> 'widest' = w i d est </w>
    # ((st,</w>) never applies: 'st' was already absorbed into 'est')
    ranks = {("s", "t"): 0, ("e", "st"): 1, ("st", END): 2}
    assert encode_word("widest", ranks) == ["w", "i", "d", "est", END]
    # lowest rank wins over left-to-right order
    ranks2 = {("a", "b"): 1, ("b", "c"): 0}
    # 'abc' -> b,c merges FIRST (rank 0), leaving a + bc
    assert encode_word("abc", ranks2)[:2] == ["a", "bc"]


def test_encode_roundtrip_covers_text(tiny):
    merges = bpe_train(tiny, 50, min_count=1)
    enc = bpe_encode(tiny, merges)
    rows = {r["doc_id"]: r for r in enc.collect()}
    for did, text in [(1, "low low low low low"), (4, "widest widest widest")]:
        toks = rows[did]["bpe_tokens"]
        # detokenize: concatenation restores the lowercased text
        detok = "".join(toks).replace(END, " ").strip()
        assert detok == text
        assert rows[did]["n_bpe_tokens"] == len(toks)
    # frequent whole words collapse to single tokens
    assert rows[1]["bpe_tokens"] == ["low" + END] * 5


def test_encode_handles_unseen_and_empty(spark, tiny):
    merges = bpe_train(tiny, 20, min_count=1)
    other = spark.createDataFrame(
        [(9, "zzz low"), (10, ""), (11, None)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in bpe_encode(other, merges).collect()}
    # unseen word falls back to characters (+ END sentinel)
    assert rows[9]["bpe_tokens"][:3] == ["z", "z", "z"]
    assert rows[9]["bpe_tokens"][-1] == "low" + END
    assert rows[10]["bpe_tokens"] == [] and rows[10]["n_bpe_tokens"] == 0
    assert rows[11]["bpe_tokens"] == []


def test_train_corpus_scale_plan_and_compression(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = bpe_train(docs, 200)
    # the sf0.001 corpus exhausts repeated pairs before 200 merges —
    # training stops early rather than memorizing singletons
    assert 50 < len(merges) <= 200
    enc = bpe_encode(docs, merges)
    agg = enc.agg(F.sum("n_bpe_tokens").alias("bpe")).first()
    from picovdb_spark.functions.text import tokens as _t

    chars = docs.select(
        F.sum(F.length(F.regexp_replace(F.lower(F.coalesce(F.col("text"), F.lit(""))), r"\s+", ""))).alias("c"),
        F.sum(F.size(_t(F.col("text")))).alias("w"),
    ).first()
    # BPE token count sits between word count (full memorization — the
    # synthetic corpus's vocabulary is small enough that the learned
    # merges cover every word) and character count (no merges at all)
    assert chars["w"] <= agg["bpe"] < chars["c"] + chars["w"]


def test_train_validates(tiny):
    with pytest.raises(ValueError, match="num_merges"):
        bpe_train(tiny, 0)


def test_encode_split_matches_train_tokenization(spark):
    """bpe_encode must split words exactly like bpe_train's word table
    (functions.text.tokens: single spaces, lowercase, drop empties) —
    an any-whitespace split would encode words the model never saw."""
    docs = spark.createDataFrame(
        [(1, "a\tb a\tb a\tb"), (2, "x  y"), (3, "UP up")],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, 30, min_count=1)
    rows = {r["doc_id"]: r for r in bpe_encode(docs, merges).collect()}
    # the tab-joined unit is ONE word for both train and encode: with
    # enough merges it collapses to a single token (train saw it 3x)
    assert rows[1]["bpe_tokens"] == ["a\tb" + END] * 3
    # consecutive spaces yield no empty-string tokens
    assert all(t.strip("\x00") != END or t == END for t in rows[2]["bpe_tokens"])
    detok2 = "".join(rows[2]["bpe_tokens"]).replace(END, " ").strip()
    assert detok2 == "x y"
    # lowercase parity with tokens()
    assert rows[3]["bpe_tokens"] == ["up" + END] * 2
