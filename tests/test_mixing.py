"""Data-mixing + second-stage rerank operators: token-budget sampling
(sample_to_budget), CCNet perplexity bucketing (lm_buckets), and MMR
diversification (retrieval.mmr_rerank)."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from picovdb_spark.operators.retrieval import mmr_rerank
from picovdb_spark.operators.textops import (
    lm_bucket_cutoffs,
    lm_buckets,
    ngram_lm_fit,
    ngram_lm_score,
    sample_to_budget,
    token_stats,
)


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = token_stats(docs).select("doc_id", "n_tokens")
    return docs.join(toks, "doc_id").select("doc_id", "lang", "n_tokens").cache()


BUDGETS = {"en": 2_000, "de": 500, "zh": 100_000_000}  # zh: budget > corpus


def _naive_budget_sample(pdf, budgets):
    """Reference greedy walk in plain Python: per domain, hash order,
    keep while cumulative tokens BEFORE the doc < budget."""
    import hashlib

    out = []
    for dom, grp in pdf.groupby("lang"):
        if dom not in budgets:
            continue
        grp = grp.assign(
            hx=[
                hashlib.md5(f"budget-v1:{i}".encode()).hexdigest()
                for i in grp["doc_id"]
            ]
        ).sort_values(["hx", "doc_id"])
        cum = 0
        for _, r in grp.iterrows():
            if cum >= budgets[dom]:
                break
            cum += int(r["n_tokens"])
            out.append((int(r["doc_id"]), dom, int(r["n_tokens"]), cum))
    return sorted(out)


def test_sample_to_budget_matches_naive_walk(spark, corpus):
    got = sorted(
        (int(r["doc_id"]), r["lang"], int(r["n_tokens"]), int(r["cum_tokens"]))
        for r in sample_to_budget(corpus, BUDGETS).collect()
    )
    want = _naive_budget_sample(corpus.toPandas(), BUDGETS)
    assert got == want
    # floor property: every domain with enough tokens meets its budget,
    # and removing the LAST kept doc would drop below it
    by_dom = {}
    for _, dom, nt, cum in got:
        by_dom.setdefault(dom, []).append((cum, nt))
    for dom, rows in by_dom.items():
        total_cum = max(c for c, _ in rows)
        last_nt = max(rows)[1]
        if dom in ("en", "de"):
            assert total_cum >= BUDGETS[dom]
            assert total_cum - last_nt < BUDGETS[dom]


def test_sample_to_budget_bucket_count_invariant(spark, corpus):
    """The two-pass split point is an internal detail: any `buckets`
    yields the bit-identical kept set + audit column."""
    a = sorted(
        (int(r["doc_id"]), int(r["cum_tokens"]))
        for r in sample_to_budget(corpus, BUDGETS, buckets=16).collect()
    )
    b = sorted(
        (int(r["doc_id"]), int(r["cum_tokens"]))
        for r in sample_to_budget(corpus, BUDGETS, buckets=4096).collect()
    )
    assert a == b


def test_sample_to_budget_drops_unbudgeted_domains(spark, corpus):
    kept = sample_to_budget(corpus, {"en": 1000})
    assert kept.filter(F.col("lang") != "en").count() == 0


def test_sample_to_budget_zero_budget(spark, corpus):
    assert sample_to_budget(corpus, {"en": 0}).count() == 0


def test_sample_to_budget_validates(spark, corpus):
    with pytest.raises(ValueError, match="budgets is empty"):
        sample_to_budget(corpus, {})
    with pytest.raises(ValueError, match="buckets"):
        sample_to_budget(corpus, {"en": 10}, buckets=1)


@pytest.fixture(scope="module")
def scored(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lm = ngram_lm_fit(docs.filter(F.col("doc_id") % 7 == 0))
    s = ngram_lm_score(docs, lm).cache()
    s.count()
    lm["unigrams"].unpersist()
    return s


def test_lm_bucket_cutoffs_in_rank_band(scored):
    cuts = lm_bucket_cutoffs(scored, (1 / 3, 2 / 3))
    assert len(cuts) == 2 and cuts[0] <= cuts[1]
    vals = np.sort(
        np.array(
            [r["bits_per_token"] for r in scored.collect() if r["bits_per_token"] is not None]
        )
    )
    # approx percentile is rank-bounded: each cutoff lands within ~1% of
    # its target rank in the empirical distribution
    for frac, c in zip((1 / 3, 2 / 3), cuts):
        rank = np.searchsorted(vals, c) / len(vals)
        assert abs(rank - frac) < 0.02, (frac, rank, c)


def test_lm_buckets_partition_by_score(scored):
    cuts = lm_bucket_cutoffs(scored, (1 / 3, 2 / 3))
    rows = lm_buckets(scored, cuts).collect()
    for r in rows:
        s = r["bits_per_token"]
        if s is None:
            assert r["lm_bucket"] is None
        elif s < cuts[0]:
            assert r["lm_bucket"] == "head"
        elif s < cuts[1]:
            assert r["lm_bucket"] == "middle"
        else:
            assert r["lm_bucket"] == "tail"
    names = {r["lm_bucket"] for r in rows}
    assert {"head", "middle", "tail"} <= names


def test_lm_buckets_validates(scored):
    with pytest.raises(ValueError, match="labels"):
        lm_buckets(scored, [1.0])
    with pytest.raises(ValueError, match="ascending"):
        lm_buckets(scored, [2.0, 1.0], labels=("a", "b", "c"))
    with pytest.raises(ValueError, match="fracs"):
        lm_bucket_cutoffs(scored, (0.5, 1.5))


def _mmr_brute(rows, lam, k, rt=6):
    """Plain-Python greedy MMR on (id, rel, vec) triples."""
    ids = sorted(r[0] for r in rows)
    by = {r[0]: r for r in rows}
    vecs = {
        i: np.asarray(by[i][2], dtype=np.float64)
        / np.linalg.norm(np.asarray(by[i][2], dtype=np.float64))
        for i in ids
    }
    rel = {i: round(by[i][1], rt) for i in ids}
    red = {i: 0.0 for i in ids}
    picked, out = [], []
    for rank in range(1, min(k, len(ids)) + 1):
        best = min(
            (i for i in ids if i not in picked),
            key=lambda i: (-round(lam * rel[i] - (1 - lam) * red[i], rt), i),
        )
        out.append(
            (rank, best, rel[best], red[best], round(lam * rel[best] - (1 - lam) * red[best], rt))
        )
        picked.append(best)
        for i in ids:
            if i not in picked:
                red[i] = max(red[i], round(float(vecs[i] @ vecs[best]), rt))
    return out


@pytest.fixture(scope="module")
def mmr_cands(spark):
    rows = [
        ("q1", "a", 0.90, [1.0, 0.0, 0.0]),
        ("q1", "b", 0.89, [0.99, 0.141, 0.0]),  # near-dup of a
        ("q1", "c", 0.70, [0.0, 1.0, 0.0]),
        ("q1", "d", 0.60, [0.0, 0.95, 0.312]),
        ("q1", "e", 0.50, [0.0, 0.0, 1.0]),
        ("q2", "x", 0.40, [1.0, 0.0, 0.0]),
        ("q2", "y", 0.30, [0.0, 1.0, 0.0]),
    ]
    return (
        spark.createDataFrame(
            rows, "query_id string, doc_id string, score double, embedding array<double>"
        ),
        rows,
    )


def test_mmr_matches_brute_force(spark, mmr_cands):
    df, rows = mmr_cands
    got = mmr_rerank(df, k=4, lam=0.6).collect()
    for q in ("q1", "q2"):
        want = _mmr_brute([(d, r, v) for qq, d, r, v in rows if qq == q], 0.6, 4)
        have = sorted(
            (
                (r["rank"], r["doc_id"], r["relevance"], r["redundancy"], r["mmr_score"])
                for r in got
                if r["query_id"] == q
            )
        )
        assert have == [
            (rk, d, pytest.approx(rel), pytest.approx(red), pytest.approx(sc))
            for rk, d, rel, red, sc in want
        ]


def test_mmr_diversifies(spark, mmr_cands):
    """b is a near-duplicate of a with almost the same relevance: plain
    top-2 is (a, b); MMR at lam=0.5 must pick something unlike a."""
    df, _ = mmr_cands
    got = {
        r["rank"]: r["doc_id"]
        for r in mmr_rerank(df.filter(F.col("query_id") == "q1"), k=2, lam=0.5).collect()
    }
    assert got[1] == "a" and got[2] != "b"


def test_mmr_lam1_is_topk_by_relevance(spark, mmr_cands):
    df, rows = mmr_cands
    got = [
        (r["rank"], r["doc_id"])
        for r in mmr_rerank(df.filter(F.col("query_id") == "q1"), k=5, lam=1.0)
        .orderBy("rank")
        .collect()
    ]
    want = sorted(
        ((d, r) for q, d, r, _ in rows if q == "q1"), key=lambda t: (-t[1], t[0])
    )
    assert got == [(i + 1, d) for i, (d, _) in enumerate(want)]


def test_mmr_validates(spark, mmr_cands):
    df, _ = mmr_cands
    with pytest.raises(ValueError, match="lam"):
        mmr_rerank(df, lam=1.5)
    with pytest.raises(ValueError, match="k must"):
        mmr_rerank(df, k=0)
    with pytest.raises(Exception, match="max_candidates"):
        mmr_rerank(df, k=2, max_candidates=3).collect()


def test_mmr_duckdb_recursive_twin(spark, mmr_cands):
    """The greedy trajectory restated as a DuckDB recursive CTE — the
    same oracle shape the driver entry uses."""
    df, rows = mmr_cands
    got = sorted(
        (r["rank"], r["doc_id"], r["mmr_score"])
        for r in mmr_rerank(df.filter(F.col("query_id") == "q1"), k=3, lam=0.7).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE cand(d VARCHAR, r DOUBLE, v DOUBLE[])"
    )
    for q, d, r, v in rows:
        if q == "q1":
            con.execute("INSERT INTO cand VALUES (?, ?, ?)", [d, r, v])
    want = con.execute(
        """
WITH RECURSIVE
norm AS (
  SELECT d, round(r, 6) AS r,
         list_transform(v, x -> x / sqrt(list_sum(list_transform(v, y -> y*y)))) AS v
  FROM cand
),
sim AS (
  SELECT a.d AS da, b.d AS db,
         round(list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i] * b.v[i])), 6) AS s
  FROM norm a JOIN norm b ON a.d <> b.d
),
pick(step, sel, d, obj) AS (
  SELECT 1, [d], d, round(0.7 * r, 6)
  FROM (SELECT *, row_number() OVER (ORDER BY round(0.7*r,6) DESC, d) AS rn FROM norm)
  WHERE rn = 1
  UNION ALL
  SELECT p.step + 1, list_append(p.sel, c.d), c.d, c.obj
  FROM pick p, LATERAL (
    SELECT n.d, round(0.7 * n.r - 0.3 * n.red, 6) AS obj
    FROM (
      SELECT n0.d, n0.r,
             round(coalesce((SELECT max(s.s) FROM sim s
                             WHERE s.da = n0.d AND list_contains(p.sel, s.db)), 0.0), 6) AS red
      FROM norm n0 WHERE NOT list_contains(p.sel, n0.d)
    ) n
    ORDER BY obj DESC, n.d LIMIT 1
  ) c
  WHERE p.step < 3
)
SELECT step, d, obj FROM pick ORDER BY step
"""
    ).fetchall()
    assert got == [
        (s, d, pytest.approx(o)) for s, d, o in want
    ]


@pytest.fixture(scope="module")
def two_lms(spark):
    """Target LM: clean prose; raw LM: mixed prose + spam."""
    target = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the dog sat on the rug")],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "buy now buy now buy now"),
            (3, "zz xx qq vv zz xx"),
        ],
        "doc_id long, text string",
    )
    t, r = ngram_lm_fit(target), ngram_lm_fit(raw)
    yield t, r
    t["unigrams"].unpersist()
    r["unigrams"].unpersist()


def test_dsir_prefers_target_like_docs(spark, two_lms):
    from picovdb_spark.operators.textops import dsir_weights

    t, r = two_lms
    docs = spark.createDataFrame(
        [
            (10, "the cat sat on the rug"),   # target-like
            (11, "buy now buy now"),          # raw-spam-like
            (12, "x"),                        # unscorable
        ],
        "doc_id long, text string",
    )
    rows = {x["doc_id"]: x for x in dsir_weights(docs, t, r).collect()}
    # target-like doc: target LM finds it cheaper than the raw mixture
    assert rows[10]["log_ratio"] > 0
    # spam: raw LM models it well, target LM doesn't
    assert rows[11]["log_ratio"] < 0
    assert rows[10]["dsir_w"] > 1 > rows[11]["dsir_w"]
    # consistency: log_ratio = bits_raw - bits_target, w = 2^ratio
    assert rows[10]["log_ratio"] == pytest.approx(
        rows[10]["bits_raw"] - rows[10]["bits_target"]
    )
    assert rows[10]["dsir_w"] == pytest.approx(2 ** rows[10]["log_ratio"])
    # unscorable doc: NULL all the way through
    assert rows[12]["bits_target"] is None and rows[12]["dsir_w"] is None


def test_dsir_feeds_weighted_sample(spark, two_lms):
    from picovdb_spark.operators.textops import dsir_weights, weighted_sample

    t, r = two_lms
    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(20)]
        + [(i, "buy now buy now buy now") for i in range(20, 40)],
        "doc_id long, text string",
    )
    w = dsir_weights(docs, t, r)
    picked = {r2["doc_id"] for r2 in weighted_sample(w, 10, weight_col="dsir_w").collect()}
    assert len(picked) == 10
    # importance weights dominate: the target-like half wins most slots
    assert sum(1 for i in picked if i < 20) >= 8


def test_mixture_budgets_waterfills(spark, corpus):
    from picovdb_spark.operators.textops import mixture_budgets

    # corpus (sf0.001): en~10343, de~4070, zh~4084 tokens available.
    # de's proportional share of 12000 at weights 1:1:1 = 4000 < 4070 —
    # no cap; at total 18000, de (6000 > 4070) and zh cap, surplus
    # flows to en.
    b = mixture_budgets(corpus, {"en": 1, "de": 1, "zh": 1}, 18_000)
    avail = {
        r["lang"]: r["t"]
        for r in corpus.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()
    }
    assert b["de"] == avail["de"] and b["zh"] == avail["zh"]
    assert b["en"] == 18_000 - avail["de"] - avail["zh"]
    assert sum(b.values()) == 18_000
    # plenty of supply: plain proportional split
    b2 = mixture_budgets(corpus, {"en": 3, "de": 1}, 8_000)
    assert b2 == {"en": 6_000, "de": 2_000}
    # spec-only mode never scans the corpus
    b3 = mixture_budgets(corpus, {"a": 1, "b": 3}, 1_000, respect_available=False)
    assert b3 == {"a": 250, "b": 750}


def test_mixture_budgets_degenerate(spark, corpus):
    from picovdb_spark.operators.textops import mixture_budgets

    # demand far beyond supply: every domain capped at availability
    b = mixture_budgets(corpus, {"en": 1, "de": 1}, 10**9)
    avail = {
        r["lang"]: r["t"]
        for r in corpus.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()
    }
    assert b == {"en": avail["en"], "de": avail["de"]}
    # domain absent from the corpus: budget 0, others get the mass
    b2 = mixture_budgets(corpus, {"xx": 1, "en": 1}, 2_000)
    assert b2["xx"] == 0 and b2["en"] == 2_000
    with pytest.raises(ValueError, match="total_tokens"):
        mixture_budgets(corpus, {"en": 1}, 0)
    with pytest.raises(ValueError, match="weights"):
        mixture_budgets(corpus, {}, 10)
    with pytest.raises(ValueError, match="positive"):
        mixture_budgets(corpus, {"en": -1}, 10)


def test_interleave_by_weight_stride_schedule(spark, corpus):
    from picovdb_spark.operators.ordering import release_global_rank
    from picovdb_spark.operators.textops import interleave_by_weight

    out = interleave_by_weight(corpus, {"en": 2.0, "de": 1.0})
    rows = sorted(
        ((r["interleave_rank"], r["lang"], r["doc_id"]) for r in out.collect())
    )
    release_global_rank(out)
    # only spec'd domains, dense 1..n ranks
    assert {lang for _, lang, _ in rows} == {"en", "de"}
    assert [rk for rk, _, _ in rows] == list(range(1, len(rows) + 1))
    # stride property: while BOTH domains have supply, every prefix holds
    # the 2:1 mix to within one doc per domain
    n_de_total = sum(1 for _, lang, _ in rows if lang == "de")
    seen_en = seen_de = 0
    for _, lang, _ in rows:
        if lang == "en":
            seen_en += 1
        else:
            seen_de += 1
        if seen_de < n_de_total:  # de not yet exhausted
            assert abs(seen_en - 2 * seen_de) <= 2


def test_interleave_deterministic_and_seeded(spark, corpus):
    from picovdb_spark.operators.ordering import release_global_rank
    from picovdb_spark.operators.textops import interleave_by_weight

    a = interleave_by_weight(corpus, {"en": 1.0, "zh": 1.0})
    ra = {r["doc_id"]: r["interleave_rank"] for r in a.collect()}
    release_global_rank(a)
    b = interleave_by_weight(corpus, {"en": 1.0, "zh": 1.0})
    rb = {r["doc_id"]: r["interleave_rank"] for r in b.collect()}
    release_global_rank(b)
    assert ra == rb
    c = interleave_by_weight(corpus, {"en": 1.0, "zh": 1.0}, seed="mix-v2")
    rc = {r["doc_id"]: r["interleave_rank"] for r in c.collect()}
    release_global_rank(c)
    assert rc != ra


def test_interleave_duckdb_twin(spark, corpus, sf_dir):
    import duckdb

    from picovdb_spark.operators.ordering import release_global_rank
    from picovdb_spark.operators.textops import interleave_by_weight

    out = interleave_by_weight(corpus, {"en": 3.0, "de": 1.0, "zh": 1.0})
    got = {r["doc_id"]: r["interleave_rank"] for r in out.collect()}
    release_global_rank(out)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = {
        r[0]: r[1]
        for r in con.execute(
            """
            WITH r1 AS (
              SELECT doc_id, lang,
                     row_number() OVER (PARTITION BY lang
                       ORDER BY md5('mix-v1:' || CAST(doc_id AS VARCHAR)), doc_id) AS i
              FROM documents WHERE lang IN ('en', 'de', 'zh'))
            SELECT doc_id,
                   row_number() OVER (
                     ORDER BY i / CASE lang WHEN 'en' THEN 3.0 ELSE 1.0 END,
                              lang, doc_id) AS interleave_rank
            FROM r1
            """
        ).fetchall()
    }
    assert got == want


def test_interleave_validation(spark, corpus):
    from picovdb_spark.operators.textops import interleave_by_weight

    with pytest.raises(ValueError, match="empty"):
        interleave_by_weight(corpus, {})
    with pytest.raises(ValueError, match="positive"):
        interleave_by_weight(corpus, {"en": 0})


def test_mixture_budgets_allocates_every_token(spark, corpus):
    from picovdb_spark.operators.textops import mixture_budgets

    # proportional mode: equal thirds of 100 must still sum to 100
    # (floors alone give 33+33+33 = 99; the remainder deal fixes it)
    b = mixture_budgets(
        corpus, {"en": 1.0, "de": 1.0, "zh": 1.0}, 100, respect_available=False
    )
    assert sum(b.values()) == 100
    assert sorted(b.values()) == [33, 33, 34]
    # remainder lands deterministically: equal weights -> name asc
    assert b["de"] == 34
    # water-filled mode with ample supply: exact total too
    b2 = mixture_budgets(corpus, {"en": 2.0, "de": 1.0, "zh": 1.0}, 101)
    assert sum(b2.values()) == 101
