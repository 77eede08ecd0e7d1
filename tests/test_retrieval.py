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


def test_maxsim_topk_brute_force(spark):
    """MaxSim == numpy brute force (sum over query tokens of max over
    doc vectors of cosine), ranked (score desc, doc_id asc)."""
    import numpy as np

    from picovdb_spark.operators.retrieval import maxsim_topk

    rng = np.random.default_rng(11)
    n_docs, per_doc, n_q, toks, dim = 12, 3, 2, 4, 8
    dvecs, rows_d = {}, []
    for di in range(n_docs):
        m = rng.standard_normal((per_doc, dim))
        m /= np.sqrt((m * m).sum(axis=1))[:, None]
        dvecs[str(di)] = m
        rows_d += [(str(di), [float(x) for x in v]) for v in m]
    qvecs, rows_q = {}, []
    for qi in range(n_q):
        m = rng.standard_normal((toks, dim))
        m /= np.sqrt((m * m).sum(axis=1))[:, None]
        qvecs[str(qi)] = m
        rows_q += [(str(qi), ti, [float(x) for x in v]) for ti, v in enumerate(m)]
    d = spark.createDataFrame(rows_d, "doc_id string, vec array<double>")
    q = spark.createDataFrame(rows_q, "query_id string, token_idx int, vec array<double>")

    got = maxsim_topk(d, q, top_k=5, normalized=True).collect()
    want = {}
    for qi, qm in qvecs.items():
        scores = {
            di: round(float((qm @ dm.T).max(axis=1).sum()), 6) for di, dm in dvecs.items()
        }
        want[qi] = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    for qi, hits in want.items():
        mine = [(r["doc_id"], r["maxsim"]) for r in sorted(
            (r for r in got if r["query_id"] == qi), key=lambda r: r["rank"]
        )]
        assert [h[0] for h in mine] == [h[0] for h in hits], (qi, mine, hits)
        for (gid, gs), (wid, ws) in zip(mine, hits):
            assert abs(gs - ws) < 2e-6


def test_maxsim_candidates_restrict_and_plan(spark):
    import numpy as np

    from picovdb_spark.operators.retrieval import maxsim_topk
    from picovdb_spark.plans import explain_str

    d = spark.createDataFrame(
        [(str(i), [1.0 if j == i % 4 else 0.0 for j in range(4)]) for i in range(8)],
        "doc_id string, vec array<double>",
    )
    q = spark.createDataFrame(
        [("q0", 0, [1.0, 0.0, 0.0, 0.0]), ("q0", 1, [0.0, 1.0, 0.0, 0.0])],
        "query_id string, token_idx int, vec array<double>",
    )
    cand = spark.createDataFrame([("0",), ("1",), ("2",)], "doc_id string")
    got = maxsim_topk(d, q, top_k=10, normalized=True, candidates=cand)
    ids = {r["doc_id"] for r in got.collect()}
    assert ids <= {"0", "1", "2"}
    plan = explain_str(got, mode="simple")
    # query side broadcast; candidate restriction is a broadcast semi-join
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "partial_max" in plan or "partial" in plan.lower(), plan


def test_maxsim_duckdb_oracle_parity(spark, sf_dir):
    """Oracle-grade check without a registry slot: MaxSim over the
    embeddings table (label = vector group, vec_id < 3 = one 3-token
    query) vs the same algebra in DuckDB SQL. Ranked ids must match
    exactly; scores to 1e-6 (round-6 on both sides)."""
    import os

    import duckdb
    from pyspark.sql import functions as F

    from picovdb_spark.operators.retrieval import maxsim_topk
    from picovdb_spark.schema import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    d = emb.select(F.col("label").alias("doc_id"), F.col("embedding").alias("vec"))
    q = emb.filter(F.col("vec_id") < 3).select(
        F.lit("q0").alias("query_id"),
        F.col("vec_id").cast("int").alias("token_idx"),
        F.col("embedding").alias("vec"),
    )
    got = sorted(
        ((r["doc_id"], r["maxsim"], r["rank"]) for r in maxsim_topk(d, q, top_k=5).collect()),
        key=lambda t: t[2],
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{os.path.join(sf_dir, 'embeddings.parquet')}')"
    )
    want = con.execute(
        """
WITH q AS (SELECT vec_id AS tok, embedding AS qv FROM embeddings WHERE vec_id < 3),
per_tok AS (
  SELECT q.tok, e.label,
         max(list_cosine_similarity(q.qv, e.embedding)) AS m
  FROM embeddings e CROSS JOIN q GROUP BY 1, 2),
per_doc AS (SELECT label, round(sum(m), 6) AS maxsim FROM per_tok GROUP BY 1)
SELECT label, maxsim,
       row_number() OVER (ORDER BY maxsim DESC, label ASC) AS rank
FROM per_doc QUALIFY rank <= 5 ORDER BY rank
"""
    ).fetchall()
    assert [g[0] for g in got] == [str(w[0]) for w in want], (got, want)
    for g, w in zip(got, want):
        assert abs(g[1] - w[1]) < 2e-6, (g, w)
