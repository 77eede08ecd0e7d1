"""Resident serving mode (operators/resident.py): node-local float32
shards for repeated query batches — the Spark analog of the reference's
in-process store matrix (pico_vdb.py:62-75, queried by batch_queries.py
at ~1000 q/s).

Strategy: result-identity against the standard `batch_query` float32
path (same kernel semantics, different data residency), plus lifecycle
(close drops blocks; query-after-close and query-before-materialize
fail loudly, never silently rescan).
"""

import os

import pytest
from pyspark.sql import functions as F

from picovdb_spark.operators.resident import ResidentGemmStore
from picovdb_spark.operators.similarity import batch_query
from picovdb_spark.schema import K_ID, K_METRICS, load_embeddings_store, load_table


@pytest.fixture(scope="module")
def store(spark, sf_dir):
    return load_embeddings_store(spark, sf_dir).cache()


@pytest.fixture(scope="module")
def queries(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("string").alias("query_id"),
        F.col("embedding").alias("_vector_"),
    )


def _key(rows):
    return sorted((r["query_id"], r[K_ID], r[K_METRICS], r["rank"]) for r in rows)


def test_resident_matches_standard_float32_path(store, queries):
    rs = ResidentGemmStore(store.select(K_ID, "_vector_"))
    try:
        rows = rs.materialize()
        assert rows == store.count()
        a = rs.query(queries, top_k=10).collect()
        b = batch_query(
            store, queries, top_k=10, method="gemm", score_dtype="float32"
        ).select("query_id", K_ID, K_METRICS, "rank").collect()
        assert _key(a) == _key(b)
    finally:
        rs.close()


def test_resident_better_than_threshold(store, queries):
    with ResidentGemmStore(store.select(K_ID, "_vector_")) as rs:
        res = rs.query(queries, top_k=10, better_than=0.5).collect()
        assert res and all(r[K_METRICS] >= 0.5 for r in res)


def test_resident_query_before_materialize_raises(store, queries):
    rs = ResidentGemmStore(store.select(K_ID, "_vector_"))
    with pytest.raises(RuntimeError, match="not materialized"):
        rs.query(queries, top_k=5)


def test_resident_close_removes_blocks_and_fails_loudly(store, queries):
    rs = ResidentGemmStore(store.select(K_ID, "_vector_"))
    rs.materialize()
    assert os.path.isdir(rs.dir)
    rs.close()
    assert not os.path.isdir(rs.dir)
    # close() resets the materialized marker (IVF lifecycle rule), so
    # every entry point fails loudly and accurately
    with pytest.raises(Exception, match="not materialized"):
        rs.query(queries, top_k=5).collect()
    with pytest.raises(Exception, match="not materialized"):
        rs.query_local([0.0] * 4)


def test_resident_empty_queries(store, queries):
    with ResidentGemmStore(store.select(K_ID, "_vector_")) as rs:
        out = rs.query(queries.filter(F.col("query_id") == "no-such"), top_k=5)
        assert out.count() == 0


# ------------------------------------------------------- cluster-routed IVF


def test_resident_ivf_full_probe_equals_exact(store, queries):
    """nprobe >= n_centroids routes every query everywhere: the routed
    kernel must reproduce the exact float32 GEMM result — identical
    (query, id, rank) triples, scores equal up to ONE final-rounding
    quantum.  Why not bit-for-bit: the routed kernel scores per-cluster
    SEGMENTS while the exact path scores whole partition blocks, and
    OpenBLAS dispatches different sgemm kernels by matrix shape, so the
    same float32 dot can differ in the last ulp between the two shapes
    (measured on this harness: (8,64)@(64,500) vs (1,64)@(64,31) give
    0.00063222466 vs 0.0006322209 for the same row).  A score whose
    true value sits within an ulp of a 0.5e-6 boundary then rounds to
    adjacent 6-decimal values — result-identity holds, the 6th decimal
    of one score may not.  (The float64 gate entry ann_ivf_resident_topk
    is immune: f64 ulp ~1e-16 against the same 1e-6 quantum.)"""
    from picovdb_spark.operators.resident import ResidentIvfStore

    with ResidentIvfStore(store.select(K_ID, "_vector_"), n_centroids=16, seed=42) as rs:
        a = rs.query(queries, top_k=10, nprobe=16).collect()
    b = batch_query(
        store, queries, top_k=10, method="gemm", score_dtype="float32"
    ).select("query_id", K_ID, K_METRICS, "rank").collect()
    ka = {(r["query_id"], r[K_ID]): (r[K_METRICS], r["rank"]) for r in a}
    kb = {(r["query_id"], r[K_ID]): (r[K_METRICS], r["rank"]) for r in b}
    assert sorted(ka) == sorted(kb)
    quantum = 1.000001e-6  # one round(., 6) step, with float slack
    for key, (score_a, rank_a) in ka.items():
        score_b, rank_b = kb[key]
        assert rank_a == rank_b, (key, rank_a, rank_b)
        assert abs(score_a - score_b) <= quantum, (key, score_a, score_b)


def test_resident_ivf_partial_probe_recall_band(store, queries):
    """nprobe=4 of 16: pruned result must stay a subset of the store and
    keep recall@10 >= 0.6 vs exact on this corpus — the same band as
    test_ann.py::test_ivf_recall_band (mirrors the reference's
    FAISS-vs-numpy recall assertions, tests/test_task14)."""
    from picovdb_spark.operators.resident import ResidentIvfStore

    with ResidentIvfStore(store.select(K_ID, "_vector_"), n_centroids=16, seed=42) as rs:
        ann = rs.query(queries, top_k=10, nprobe=4).collect()
    exact = batch_query(
        store, queries, top_k=10, method="gemm", score_dtype="float32"
    ).select("query_id", K_ID, "rank").collect()
    got = {}
    for r in ann:
        got.setdefault(r["query_id"], set()).add(r[K_ID])
    want = {}
    for r in exact:
        want.setdefault(r["query_id"], set()).add(r[K_ID])
    recalls = [len(got.get(q, set()) & ids) / len(ids) for q, ids in want.items()]
    assert sum(recalls) / len(recalls) >= 0.6, recalls
    # routed result is never larger than the probe can justify
    assert all(len(v) <= 10 + 5 for v in got.values())


def test_resident_ivf_query_local_matches_distributed(store, queries):
    """query_local (in-process serving, no Spark job) must return the
    same ids/scores/ranks as the distributed query() for each query —
    full probe AND partial probe — since both read the same blocks with
    the same kernel semantics. Zero-vector maps to e₀ like everywhere."""
    from picovdb_spark.operators.resident import ResidentIvfStore

    qrows = queries.collect()
    # query_local scores by float32 GEMV, the distributed kernel by a
    # batched float32 GEMM: same semantics, but BLAS accumulation order
    # differs, so a score can wobble one ulp across the 1e-6 rounding
    # boundary — compare with that tolerance, exact elsewhere
    tol = 2e-6
    with ResidentIvfStore(store.select(K_ID, "_vector_"), n_centroids=16, seed=42) as rs:
        for npb in (16, 4):
            dist = rs.query(queries, top_k=10, nprobe=npb).collect()
            by_q = {}
            for r in dist:
                by_q.setdefault(r["query_id"], {})[r[K_ID]] = r[K_METRICS]
            for qr in qrows:
                local = rs.query_local(qr["_vector_"], top_k=10, nprobe=npb)
                lmap = {h[K_ID]: h[K_METRICS] for h in local}
                dmap = by_q[qr["query_id"]]
                kth = min(dmap.values())
                for i in set(lmap) & set(dmap):
                    assert abs(lmap[i] - dmap[i]) <= tol, (qr["query_id"], npb, i)
                for i in set(lmap) ^ set(dmap):
                    s = lmap.get(i, dmap.get(i))
                    assert abs(s - kth) <= tol, (qr["query_id"], npb, i, s, kth)
                # ranks strictly follow (score desc, id asc) locally
                ranked = sorted(lmap.items(), key=lambda kv: (-kv[1], kv[0]))
                assert [h[K_ID] for h in local] == [i for i, _ in ranked]
        # better_than filters identically
        bt = rs.query_local(qrows[0]["_vector_"], top_k=10, nprobe=16, better_than=0.99)
        assert all(h[K_METRICS] >= 0.99 for h in bt)
        # zero vector routes via e0 and still answers
        zero = rs.query_local([0.0] * len(qrows[0]["_vector_"]), top_k=3, nprobe=16)
        assert len(zero) == 3


def test_resident_ivf_lifecycle(store, queries):
    from picovdb_spark.operators.resident import ResidentIvfStore

    rs = ResidentIvfStore(store.select(K_ID, "_vector_"), n_centroids=8)
    with pytest.raises(RuntimeError, match="not materialized"):
        rs.query(queries)
    rs.materialize()
    assert rs.query(queries, top_k=3, nprobe=8).count() > 0
    rs.close()
    assert not os.path.exists(rs.dir)


def test_resident_int8_accuracy_and_footprint(store, queries):
    """int8 blocks: top-10 recall vs the exact float32 path stays >= 0.9
    on the fixture, every score is within the quantization error bound,
    and the on-disk block is ~4x smaller than float32."""
    import numpy as np

    exact = batch_query(
        store, queries, top_k=10, method="gemm", score_dtype="float32"
    ).select("query_id", K_ID, K_METRICS).collect()
    rs = ResidentGemmStore(store.select(K_ID, "_vector_"), block_dtype="int8")
    try:
        rs.materialize()
        got = rs.query(queries, top_k=10).collect()
        e, a = {}, {}
        for r in exact:
            e.setdefault(r["query_id"], set()).add(r[K_ID])
        for r in got:
            a.setdefault(r["query_id"], set()).add(r[K_ID])
        recall = sum(len(e[q] & a.get(q, set())) / len(e[q]) for q in e) / len(e)
        assert recall >= 0.9, recall
        # score error bound: |q . (x - x_q)| <= |x - x_q| <= sqrt(dim)*s/2
        # with s <= 1/127 on unit vectors -> loose 0.04 at dim 64
        es = {(r["query_id"], r[K_ID]): r[K_METRICS] for r in exact}
        for r in got:
            k = (r["query_id"], r[K_ID])
            if k in es:
                assert abs(r[K_METRICS] - es[k]) <= 0.04
        mats = [f for f in os.listdir(rs.dir) if f.startswith("mat_")]
        assert mats
        blk = np.load(os.path.join(rs.dir, mats[0]), mmap_mode="r")
        assert blk.dtype == np.int8
    finally:
        rs.close()


def test_resident_ivf_int8_recall_and_local_parity(store, queries):
    """int8 routed serving: 4× smaller inverted lists. Full probe must
    keep top-10 recall ≥ 0.9 vs the exact float32 path (quantization
    error only), the block file must actually be ~4× smaller than the
    float32 one, and query_local must agree with the distributed int8
    result within the float32-ulp tolerance."""
    import numpy as np

    from picovdb_spark.operators.resident import ResidentIvfStore

    exact = batch_query(
        store, queries, top_k=10, method="gemm", score_dtype="float32"
    ).select("query_id", K_ID).collect()
    want = {}
    for r in exact:
        want.setdefault(r["query_id"], set()).add(r[K_ID])

    with ResidentIvfStore(
        store.select(K_ID, "_vector_"), n_centroids=16, seed=42, dtype="int8"
    ) as rs:
        got_rows = rs.query(queries, top_k=10, nprobe=16).collect()
        got = {}
        for r in got_rows:
            got.setdefault(r["query_id"], set()).add(r[K_ID])
        recalls = [len(got.get(q, set()) & ids) / len(ids) for q, ids in want.items()]
        assert sum(recalls) / len(recalls) >= 0.9, recalls
        # footprint: int8 codes ≈ dim bytes/row vs 4·dim for float32
        mats = sorted(
            f for f in os.listdir(rs.dir) if f.startswith("mat_")
        )
        m0 = np.load(os.path.join(rs.dir, mats[0]), mmap_mode="r")
        assert m0.dtype == np.int8
        # local == distributed (int8 vs int8) within one f32 ulp
        dist = {}
        for r in got_rows:
            dist.setdefault(r["query_id"], {})[r[K_ID]] = r[K_METRICS]
        qr = queries.collect()[0]
        local = rs.query_local(qr["_vector_"], top_k=10, nprobe=16)
        dmap = dist[qr["query_id"]]
        kth = min(dmap.values())
        for h in local:
            if h[K_ID] in dmap:
                assert abs(h[K_METRICS] - dmap[h[K_ID]]) <= 2e-6
            else:
                assert abs(h[K_METRICS] - kth) <= 2e-6


def test_resident_bad_dtype_rejected(store):
    with pytest.raises(ValueError, match="block_dtype"):
        ResidentGemmStore(store.select(K_ID, "_vector_"), block_dtype="int4")


def test_resident_ivf_int8_partial_probe_routes_on_float_centroids(store, queries):
    """Routing REGRESSION: query_local must route on the float32
    centroids, not centroids cast to the block dtype — in int8 mode that
    cast truncates every component (|x| < 1) to 0 and probes arbitrary
    clusters. At nprobe < n_centroids the local result must probe the
    same neighborhoods as the distributed int8 query (small float
    reorderings between GEMV and GEMM routing allow a 1-2 id fringe;
    the broken cast overlapped 0-2 of 10)."""
    from picovdb_spark.operators.resident import ResidentIvfStore

    with ResidentIvfStore(
        store.select(K_ID, "_vector_"), n_centroids=16, seed=42, dtype="int8"
    ) as rs:
        dist_rows = rs.query(queries, top_k=10, nprobe=4).collect()
        dist = {}
        for r in dist_rows:
            dist.setdefault(r["query_id"], set()).add(r[K_ID])
        for qr in queries.collect():
            local = rs.query_local(qr["_vector_"], top_k=10, nprobe=4)
            overlap = {h[K_ID] for h in local} & dist[qr["query_id"]]
            assert len(overlap) >= 8, (qr["query_id"], len(overlap))


def test_resident_ivf_query_local_after_close_raises(store, queries):
    """close() must drop the query_local mmap cache: unlinked files stay
    readable through live mmaps, so a stale cache would keep serving a
    closed store's data silently."""
    from picovdb_spark.operators.resident import ResidentIvfStore

    rs = ResidentIvfStore(store.select(K_ID, "_vector_"), n_centroids=8, seed=1)
    rs.materialize()
    qr = queries.collect()[0]
    assert rs.query_local(qr["_vector_"], top_k=5, nprobe=8)  # populate cache
    rs.close()
    with pytest.raises(RuntimeError, match="not materialized"):
        rs.query_local(qr["_vector_"], top_k=5, nprobe=8)


def test_resident_ivf_int8_hot_segment_cache_identical(store, queries):
    """The hot-segment float32 cache must not change a single score:
    cached and cache-disabled query_local agree exactly (the cast and
    the scale-after-dot order are identical; only WHEN the cast happens
    differs)."""
    from picovdb_spark.operators.resident import ResidentIvfStore

    with ResidentIvfStore(
        store.select(K_ID, "_vector_"), n_centroids=16, seed=3, dtype="int8"
    ) as cached, ResidentIvfStore(
        cached.store,
        n_centroids=16,
        seed=3,
        dtype="int8",
        local_cache_bytes=0,
        centroids=cached.centroids,
    ) as uncached:
        for qr in queries.collect():
            a = cached.query_local(qr["_vector_"], top_k=10, nprobe=4)
            a2 = cached.query_local(qr["_vector_"], top_k=10, nprobe=4)  # cache hit
            b = uncached.query_local(qr["_vector_"], top_k=10, nprobe=4)
            assert a == a2 == b


def test_resident_fallback_serves_exact_when_block_missing(store, queries):
    """on_missing='fallback': delete one block after materialize — the
    next batch must be served by the exact scan with IDENTICAL results
    (and a warning), not fail. Default mode keeps failing loudly."""
    import glob
    import os
    import warnings

    from picovdb_spark.operators.similarity import batch_query

    base = store.select(K_ID, "_vector_")
    want = sorted(
        map(
            tuple,
            batch_query(base, queries, top_k=5, method="gemm", score_dtype="float32").collect(),
        )
    )
    rs = ResidentGemmStore(base, on_missing="fallback")
    try:
        rs.materialize()
        victim = sorted(glob.glob(os.path.join(rs.dir, "mat_*.npy")))[0]
        os.remove(victim)
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            got = sorted(map(tuple, rs.query(queries, top_k=5).collect()))
        assert any("degraded mode" in str(w.message) for w in caught)
        assert got == want
        # with all blocks present, no warning and the resident path serves
        rs.materialize()
        with warnings.catch_warnings(record=True) as caught2:
            warnings.simplefilter("always")
            got2 = sorted(map(tuple, rs.query(queries, top_k=5).collect()))
        assert not any("degraded mode" in str(w.message) for w in caught2)
        assert got2 == want
    finally:
        rs.close()


def test_resident_ivf_fallback_serves_exact_when_block_missing(store, queries):
    import glob
    import os
    import warnings

    from picovdb_spark.operators.resident import ResidentIvfStore
    from picovdb_spark.operators.similarity import batch_query

    base = store.select(K_ID, "_vector_")
    want = sorted(
        map(
            tuple,
            batch_query(base, queries, top_k=5, method="gemm", score_dtype="float32").collect(),
        )
    )
    rs = ResidentIvfStore(base, n_centroids=16, seed=42, on_missing="fallback")
    try:
        rs.materialize()
        victim = sorted(glob.glob(os.path.join(rs.dir, "mat_*.npy")))[0]
        os.remove(victim)
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            got = sorted(map(tuple, rs.query(queries, top_k=5).collect()))
        assert any("degraded mode" in str(w.message) for w in caught)
        assert got == want  # degraded mode = exact results
    finally:
        rs.close()


def test_resident_on_missing_validation(store):
    with pytest.raises(ValueError, match="on_missing"):
        ResidentGemmStore(store.select(K_ID, "_vector_"), on_missing="ignore")


def test_resident_fallback_honors_query_vector_col_and_partial_loss(store, queries):
    """Degraded mode must survive (a) a custom query vector column and
    (b) a partition that lost only its ids file (regressions: the
    fallback once pinned the store's vector_col onto the query frame,
    and the probe once checked only mat_*.npy). A healthy probe result
    is CACHED for the store's lifetime (per-batch probes are an extra
    job each and locality-unsafe off local mode), so a loss observed
    after a healthy batch needs `invalidate_probe()` to re-arm it."""
    import glob
    import os
    import warnings

    base = store.select(K_ID, "_vector_")
    q2 = queries.withColumnRenamed("_vector_", "qvec")
    rs = ResidentGemmStore(base, on_missing="fallback")
    try:
        rs.materialize()
        assert rs._probe_ok is False  # re-armed by materialize
        want = sorted(map(tuple, rs.query(queries, top_k=3).collect()))
        assert rs._probe_ok is True  # healthy probe result sticks
        # delete ONLY the ids sidecar of one partition
        victim = sorted(glob.glob(os.path.join(rs.dir, "ids_*.npy")))[0]
        os.remove(victim)
        rs.invalidate_probe()  # the documented post-loss re-arm
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            got = sorted(map(tuple, rs.query(q2, top_k=3, vector_col="qvec").collect()))
        assert any("degraded mode" in str(w.message) for w in caught)
        assert got == want
        # a degraded probe result is NOT cached: the next batch probes
        # again (and degrades again while the block stays missing)
        assert rs._probe_ok is False
    finally:
        rs.close()


def test_resident_gemm_query_local_matches_distributed(store, queries):
    """In-process exact serving == the distributed resident query for
    the same vector: identical ids/ranks; scores within one float32 ulp
    (GEMV vs batched GEMM accumulation order), same tolerance rule as
    the IVF local/distributed pin."""
    base = store.select(K_ID, "_vector_")
    qrow = queries.first()
    with ResidentGemmStore(base) as rs:
        dist = (
            rs.query(queries.limit(1), top_k=5)
            .select(K_ID, K_METRICS, "rank")
            .collect()
        )
        loc = rs.query_local(qrow["_vector_"], top_k=5)
    dist_by_rank = sorted(dist, key=lambda r: r["rank"])
    assert [r[K_ID] for r in dist_by_rank] == [d[K_ID] for d in loc]
    for a, b in zip(dist_by_rank, loc):
        assert abs(a[K_METRICS] - b[K_METRICS]) <= 2e-6


def test_resident_gemm_query_local_int8_and_lifecycle(store, queries):
    import pytest as _pytest

    base = store.select(K_ID, "_vector_")
    qrow = queries.first()
    rs = ResidentGemmStore(base, block_dtype="int8")
    with _pytest.raises(RuntimeError, match="materialize"):
        rs.query_local(qrow["_vector_"])
    rs.materialize()
    loc = rs.query_local(qrow["_vector_"], top_k=3)
    assert len(loc) == 3 and loc[0]["rank"] == 1
    # int8 quantization error band, not exact: top hit should still be
    # the query's own row with score ~1
    assert loc[0][K_METRICS] > 0.99
    rs.close()
    with _pytest.raises(RuntimeError, match="not visible|materialize"):
        rs.query_local(qrow["_vector_"])


def test_resident_rematerialize_refreshes_local_cache(store, queries):
    """materialize() must invalidate the in-process serving cache:
    unlinked files stay readable through live mmaps, so a stale cache
    would silently serve the previous materialization."""
    base = store.select(K_ID, "_vector_")
    qrow = queries.first()
    rs = ResidentGemmStore(base)
    try:
        rs.materialize()
        before = rs.query_local(qrow["_vector_"], top_k=3)
        old_mats, _ = rs._local_cache
        rs.materialize()
        assert rs._local_cache is None  # cache dropped until next load
        after = rs.query_local(qrow["_vector_"], top_k=3)
        assert after == before  # same data -> same answers, fresh mmaps
        assert rs._local_cache[0][0] is not old_mats[0]
    finally:
        rs.close()


def test_resident_fallback_auto_rearms_after_healthy_probe(store, queries):
    """Round-6 verdict item: a block lost AFTER a healthy cached probe
    must not fail-fast until a manual invalidate_probe() — query()
    executes eagerly on the cached-probe path, catches the kernel's
    missing-block error, re-arms the probe, and retries ONCE via the
    degraded exact path. Both store kinds, plus a sidecar-only loss
    (ids file), which must take the same path as a lost mat block."""
    import glob
    import os
    import warnings

    from picovdb_spark.operators.resident import ResidentIvfStore

    base = store.select(K_ID, "_vector_")
    for make, kill in (
        (lambda: ResidentGemmStore(base, on_missing="fallback"), "mat"),
        (lambda: ResidentGemmStore(base, on_missing="fallback"), "ids"),
        (
            lambda: ResidentIvfStore(
                base, n_centroids=16, seed=42, on_missing="fallback"
            ),
            "mat",
        ),
    ):
        rs = make()
        try:
            rs.materialize()
            kw = {"nprobe": 16} if isinstance(rs, ResidentIvfStore) else {}
            want = sorted(map(tuple, rs.query(queries, top_k=3, **kw).collect()))
            assert rs._probe_ok is True  # healthy probe cached
            victim = sorted(glob.glob(os.path.join(rs.dir, f"{kill}_*.npy")))[0]
            os.remove(victim)
            # NO invalidate_probe() here — the old behavior fail-fasted
            with warnings.catch_warnings(record=True) as caught:
                warnings.simplefilter("always")
                got = sorted(map(tuple, rs.query(queries, top_k=3, **kw).collect()))
            assert any("re-arming" in str(w.message) for w in caught)
            assert any("degraded" in str(w.message) for w in caught)
            assert got == want  # degraded path = exact results
            assert rs._probe_ok is False  # loss re-armed the probe
        finally:
            rs.close()
