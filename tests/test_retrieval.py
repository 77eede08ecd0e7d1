"""BM25 retrieval, connected-components dedup clustering, and
stratified sampling — behavioral pins on hand-checkable fixtures
(value-level checks live in the oracle entries `text_bm25_search`,
`dedup_components`, `text_stratified_sample`)."""

import math

import pytest
from pyspark.sql import functions as F

from picovdb_spark.operators.dedup import connected_components
from picovdb_spark.operators.retrieval import bm25_search, doc_lengths, postings
from picovdb_spark.operators.textops import stratified_sample


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry durian"),
            (4, "unrelated words only"),
        ],
        schema="doc_id long, text string",
    )


def test_postings_and_lengths(corpus):
    post = {
        (r["doc_id"], r["term"]): r["tf"] for r in postings(corpus).collect()
    }
    assert post[(1, "apple")] == 2.0 and post[(3, "cherry")] == 3.0
    dl = {r["doc_id"]: r["dl"] for r in doc_lengths(corpus).collect()}
    assert dl == {1: 3.0, 2: 2.0, 3: 4.0, 4: 3.0}


def test_bm25_hand_computed(spark, corpus):
    """Single-term query against a 4-doc corpus — score verified against
    the closed-form Okapi formula (k1=1.2, b=0.75, ln(1+...) idf)."""
    q = spark.createDataFrame([("q", "cherry")], schema="query_id string, query string")
    hits = {r["doc_id"]: r["score"] for r in bm25_search(corpus, q).collect()}
    assert set(hits) == {2, 3}
    n, avgdl = 4.0, 3.0
    df = 2.0
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))

    def s(tf, dl):
        return round(idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)), 6)

    assert hits[2] == pytest.approx(s(1, 2), abs=1e-6)
    assert hits[3] == pytest.approx(s(3, 4), abs=1e-6)


def test_bm25_ranking_and_unknown_terms(spark, corpus):
    q = spark.createDataFrame(
        [("q1", "cherry durian"), ("q2", "zzz-not-in-corpus")],
        schema="query_id string, query string",
    )
    out = bm25_search(corpus, q, top_k=10).collect()
    assert not [r for r in out if r["query_id"] == "q2"]  # no matches, no rows
    q1 = sorted((r["rank"], r["doc_id"]) for r in out if r["query_id"] == "q1")
    assert q1[0] == (1, 3)  # doc 3 matches both terms, ranked first
    assert [r for r, _ in q1] == list(range(1, len(q1) + 1))


# ------------------------------------------------------ connected components


def test_connected_components_chain(spark):
    """a~b, b~c is ONE cluster with min-id canonical; isolated nodes are
    their own (non-dup) components."""
    nodes = spark.createDataFrame([(i,) for i in range(1, 7)], schema="doc_id long")
    pairs = spark.createDataFrame(
        [(2, 5), (5, 3), (4, 6)], schema="id_a long, id_b long"
    )
    out = {r["doc_id"]: (r["component_id"], r["is_dup"]) for r in
           connected_components(pairs, nodes).collect()}
    assert out == {
        1: (1, False),
        2: (2, False),
        5: (2, True),
        3: (2, True),
        4: (4, False),
        6: (4, True),
    }


def test_connected_components_long_path(spark):
    """A path graph needs multiple propagation rounds — pins the
    iteration-until-converged loop, not just one hop."""
    n = 12
    nodes = spark.createDataFrame([(i,) for i in range(n)], schema="doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], schema="id_a long, id_b long"
    )
    out = connected_components(pairs, nodes).collect()
    assert all(r["component_id"] == 0 for r in out)
    assert sum(r["is_dup"] for r in out) == n - 1


# -------------------------------------------------------- stratified sample


def test_stratified_sample_rates_and_determinism(spark):
    rows = [(i, "en" if i % 2 == 0 else "xx") for i in range(2000)]
    docs = spark.createDataFrame(rows, schema="doc_id long, lang string")
    out = stratified_sample(docs, {"en": 0.5}, default_rate=0.0)
    kept = out.collect()
    assert all(r["lang"] == "en" for r in kept)  # default 0.0 drops "xx"
    assert 380 <= len(kept) <= 620  # ~50% of 1000 en docs
    again = stratified_sample(docs, {"en": 0.5}, default_rate=0.0).collect()
    assert sorted(r["doc_id"] for r in again) == sorted(r["doc_id"] for r in kept)
    # full-rate stratum keeps everything
    assert stratified_sample(docs, {"en": 1.0, "xx": 1.0}).count() == 2000


def test_hybrid_rrf_fusion(spark):
    """RRF math: doc in both lists sums both contributions; single-list
    docs get one; rounding + id tiebreak pin the order."""
    from picovdb_spark.operators.retrieval import hybrid_rrf
    from picovdb_spark.session import local_df

    sparse = local_df(spark, [(1, 1), (2, 2)], "doc_id long, rank int")
    dense = local_df(spark, [(2, 1), (3, 2)], "doc_id long, rank int")
    out = {r["doc_id"]: (r["rrf"], r["rank"]) for r in
           hybrid_rrf(sparse, dense, top_k=10).collect()}
    assert out[2] == (round(1 / 62 + 1 / 61, 6), 1)  # both lists
    assert out[1] == (round(1 / 61, 6), 2)
    assert out[3] == (round(1 / 62, 6), 3)
