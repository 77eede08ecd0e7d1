"""CCNet-style bigram LM quality scoring: ngram_lm_fit / ngram_lm_score.

Hand-computable closed-form checks plus a DuckDB twin of the full
fit+score pipeline at float tolerance (the per-doc mean is a float64
reduction whose addend order is partition-dependent — the operator's
documented contract is tolerance, not bit-hash).
"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from picovdb_spark.operators.textops import ngram_lm_fit, ngram_lm_score


@pytest.fixture(scope="module")
def tiny_lm(spark):
    lm_docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    lm = ngram_lm_fit(lm_docs)
    yield lm
    lm["unigrams"].unpersist()


def test_fit_counts(tiny_lm):
    uni = {r["w1"]: r["c1"] for r in tiny_lm["unigrams"].collect()}
    bi = {(r["w1"], r["w2"]): r["c2"] for r in tiny_lm["bigrams"].collect()}
    assert uni == {"a": 3, "b": 3, "c": 1}
    assert bi == {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}
    assert tiny_lm["vocab_size"] == 3


def test_score_closed_form(spark, tiny_lm):
    """Doc 'a b' has one bigram: p = (3+1)/(3+1*3) = 2/3."""
    docs = spark.createDataFrame(
        [(10, "a b"), (11, "z"), (12, "")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in ngram_lm_score(docs, tiny_lm).collect()}
    assert rows[10]["n_bigrams"] == 1 and rows[10]["oov_bigrams"] == 0
    assert abs(rows[10]["bits_per_token"] - (-math.log2(4 / 6))) < 1e-12
    # single-token and empty docs: no bigram evidence -> NULL score
    for d in (11, 12):
        assert rows[d]["n_bigrams"] == 0
        assert rows[d]["bits_per_token"] is None


def test_unseen_bigram_smoothed_not_infinite(spark, tiny_lm):
    """'c a' never occurs and 'z' is out of vocab: both must score the
    finite smoothed floor, with oov counted."""
    docs = spark.createDataFrame([(20, "c a z")], "doc_id long, text string")
    r = ngram_lm_score(docs, tiny_lm).collect()[0]
    assert r["n_bigrams"] == 2 and r["oov_bigrams"] == 2
    # p(a|c) = (0+1)/(1+3) = 1/4 ; p(z|a) = (0+1)/(3+3) = 1/6
    want = (-math.log2(0.25) - math.log2(1 / 6)) / 2
    assert abs(r["bits_per_token"] - want) < 1e-12


def test_gibberish_scores_higher_than_natural(spark, sf_dir):
    """Corpus-trained LM must rank a natural in-distribution doc below a
    shuffled-vocab gibberish doc."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    lm = ngram_lm_fit(docs)
    try:
        natural = docs.limit(1).collect()[0]["text"]
        gib = " ".join(reversed(natural.split(" ")))
        probe = spark.createDataFrame(
            [(1, natural), (2, gib)], "doc_id long, text string"
        )
        rows = {r["doc_id"]: r for r in ngram_lm_score(probe, lm).collect()}
        assert rows[1]["bits_per_token"] < rows[2]["bits_per_token"]
    finally:
        lm["unigrams"].unpersist()


def test_duckdb_twin_tolerance(spark, sf_dir):
    """Full fit+score restated in SQL; per-doc agreement to 1e-9."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 100
    )
    n_docs = docs.count()
    lm = ngram_lm_fit(docs)
    try:
        got = {
            r["doc_id"]: r
            for r in ngram_lm_score(docs, lm).collect()
        }
        v = lm["vocab_size"]
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW d AS SELECT doc_id, text FROM "
            f"'{sf_dir}/documents.parquet' WHERE doc_id < 100"
        )
        want = con.execute(
            f"""
WITH tok AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> t <> '') AS t
  FROM d),
bg AS (
  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM tok WHERE len(t) >= 2)),
uni AS (
  SELECT w1, count(*) AS c1 FROM
    (SELECT unnest(t) AS w1 FROM tok WHERE len(t) >= 1) GROUP BY w1),
bi AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
scored AS (
  SELECT b.doc_id,
         count(*) AS n_bigrams,
         sum(CASE WHEN bi.c2 IS NULL THEN 1 ELSE 0 END) AS oov,
         avg(-log2((COALESCE(bi.c2, 0) + 1.0) / (COALESCE(u.c1, 0) + {v}.0)))
           AS bits
  FROM bg b
  LEFT JOIN bi ON b.w1 = bi.w1 AND b.w2 = bi.w2
  LEFT JOIN uni u ON b.w1 = u.w1
  GROUP BY b.doc_id)
SELECT t.doc_id, COALESCE(s.n_bigrams, 0), COALESCE(s.oov, 0), s.bits
FROM tok t LEFT JOIN scored s USING (doc_id)
"""
        ).fetchall()
        assert len(want) == len(got) == n_docs
        for doc_id, nb, oov, bits in want:
            g = got[doc_id]
            assert g["n_bigrams"] == nb and g["oov_bigrams"] == oov
            if bits is None:
                assert g["bits_per_token"] is None
            else:
                assert abs(g["bits_per_token"] - bits) < 1e-9
    finally:
        lm["unigrams"].unpersist()
