"""IVF-PQ tests — the composition suite: (a) full-probe + full-refine
equals exact top-k EXACTLY (the oracle configuration), (b) honest
partial-probe recall band, (c) probe pruning really skips unprobed
clusters, (d) write/read round-trip serves the same results.

Mirrors the reference's FAISS-vs-NumPy equivalence strategy
(/root/reference/tests/test_task14_faiss_vs_numpy_results.py) for the
engine's scale ANN path."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from picovdb_spark.operators.ann import CLUSTER_COL
from picovdb_spark.operators.ivfpq import IvfPqIndex
from picovdb_spark.operators.similarity import batch_query
from picovdb_spark.schema import K_ID, K_METRICS, K_VECTOR, load_embeddings_store, load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_embeddings_store(spark, sf_dir)


@pytest.fixture(scope="module")
def queries(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 8)
        .select(
            F.col("vec_id").cast("string").alias("query_id"),
            F.col("embedding").alias(K_VECTOR),
        )
    )


@pytest.fixture(scope="module")
def index(emb):
    return IvfPqIndex.build(emb, n_centroids=16, m=16, k=64, seed=42)


def _sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r[K_ID])
    return out


def _recall(approx, exact):
    e, a = _sets(exact), _sets(approx)
    return sum(len(e[q] & a.get(q, set())) / len(e[q]) for q in e) / len(e)


def test_full_probe_full_refine_equals_exact(emb, queries, index):
    """nprobe = n_centroids, refine_k >= n: every row is a candidate and
    rescoring is exact float64 — must match the exact GEMM path
    bit-for-bit (ids, ranks, scores)."""
    n = emb.count()
    exact = batch_query(emb, queries, top_k=5, method="gemm")
    ivfpq = index.query(queries, top_k=5, nprobe=16, refine_k=n)
    a = sorted((r["query_id"], r["rank"], r[K_ID], r[K_METRICS]) for r in exact.collect())
    b = sorted((r["query_id"], r["rank"], r[K_ID], r[K_METRICS]) for r in ivfpq.collect())
    assert a == b


def test_partial_probe_recall_band(emb, queries, index):
    """The pruning regime (nprobe 4/16, refine 50): recall < 1.0 by
    design, but must stay above a floor on the clustered fixture."""
    exact = batch_query(emb, queries, top_k=10, method="gemm")
    routed = index.query(queries, top_k=10, nprobe=4, refine_k=50)
    assert _recall(routed, exact) >= 0.5


def test_refine_beats_or_matches_adc(emb, queries, index):
    exact = batch_query(emb, queries, top_k=10, method="gemm")
    adc = index.query(queries, top_k=10, nprobe=8)
    ref = index.query(queries, top_k=10, nprobe=8, refine_k=50)
    assert _recall(ref, exact) >= _recall(adc, exact) - 1e-9


def test_probe_prunes_unprobed_clusters(index, queries):
    """The scan under a 1-probe query must touch only the probed
    clusters: assert the candidate clusters of the output are a subset
    of the probe union (and far fewer than all 16)."""
    one = queries.limit(1)
    out = index.query(one, top_k=5, nprobe=1)
    hit_ids = [r[K_ID] for r in out.collect()]
    clusters = {
        r[CLUSTER_COL]
        for r in index.codes.filter(F.col(index.id_col).isin(hit_ids)).collect()
    }
    assert len(clusters) == 1


def test_codes_are_compact(index, emb):
    row = index.codes.first()
    assert len(row["codes"]) == 16  # 16 bytes-equivalent vs 64 floats
    assert index.codes.count() == emb.count()


def test_write_read_round_trip(tmp_path, emb, queries, index):
    p = str(tmp_path / "ivfpq_idx")
    index.write(p)
    spark = index.codes.sparkSession
    reopened = IvfPqIndex.read(spark, p, store=emb)
    n = emb.count()
    a = sorted(
        (r["query_id"], r["rank"], r[K_ID], r[K_METRICS])
        for r in index.query(queries, top_k=5, nprobe=16, refine_k=n).collect()
    )
    b = sorted(
        (r["query_id"], r["rank"], r[K_ID], r[K_METRICS])
        for r in reopened.query(queries, top_k=5, nprobe=16, refine_k=n).collect()
    )
    assert a == b


def test_adc_only_requires_no_store(tmp_path, emb, queries, index):
    """A reopened codes-only index still serves ADC queries; refine
    without the raw store raises the documented error."""
    p = str(tmp_path / "ivfpq_codes_only")
    index.write(p)
    spark = index.codes.sparkSession
    reopened = IvfPqIndex.read(spark, p)
    assert reopened.query(queries, top_k=5, nprobe=16).count() > 0
    with pytest.raises(ValueError, match="refine requires"):
        reopened.query(queries, top_k=5, refine_k=50)


def test_written_index_partition_pruning_plan(tmp_path, emb, queries, index):
    """The persisted codes layout must plan probe queries as Hive
    partition pruning on __cluster — unprobed clusters cost zero IO."""
    from picovdb_spark.plans import explain_str

    p = str(tmp_path / "ivfpq_prune")
    index.write(p)
    spark = index.codes.sparkSession
    reopened = IvfPqIndex.read(spark, p, store=emb)
    plan = explain_str(reopened.query(queries, top_k=5, nprobe=2))
    assert "PartitionFilters" in plan
    assert "__cluster" in plan.split("PartitionFilters", 1)[1][:200]


def test_empty_query_batch_keeps_id_schema(spark, emb, index):
    """Empty queries must return the SAME id column name/type as the
    non-empty path (was hardcoded `_id_ string`)."""
    empty = spark.createDataFrame([], schema=f"query_id string, {K_VECTOR} array<float>")
    out = index.query(empty, top_k=5)
    assert out.count() == 0
    assert out.columns == ["query_id", index.id_col, K_METRICS, "rank"]


def test_refine_k_zero_rejected(queries, index):
    with pytest.raises(ValueError, match="refine_k"):
        index.query(queries, top_k=5, refine_k=0)


def test_cluster_raw_refine_matches_plain_refine(emb, queries):
    """The inverted-list raw layout must change the PLAN (refine reads
    only probed clusters), never the RESULT."""
    plain = IvfPqIndex.build(emb, n_centroids=16, m=16, k=64, seed=42)
    clustered = IvfPqIndex.build(
        emb, n_centroids=16, m=16, k=64, seed=42, cluster_raw=True
    )
    assert clustered.raw_by_cluster is not None
    a = sorted(
        (r["query_id"], r["rank"], r[K_ID], r[K_METRICS])
        for r in plain.query(queries, top_k=5, nprobe=4, refine_k=50).collect()
    )
    b = sorted(
        (r["query_id"], r["rank"], r[K_ID], r[K_METRICS])
        for r in clustered.query(queries, top_k=5, nprobe=4, refine_k=50).collect()
    )
    assert a == b


def test_cluster_raw_survives_write_read_round_trip(tmp_path, emb, queries):
    """write() persists the inverted-list raw layout and read() restores
    it, so a reopened cluster_raw index keeps cluster-pruned refine
    (and identical results) instead of silently scanning the full store."""
    built = IvfPqIndex.build(
        emb, n_centroids=16, m=16, k=64, seed=42, cluster_raw=True
    )
    p = str(tmp_path / "ivfpq_raw_idx")
    built.write(p)
    reopened = IvfPqIndex.read(built.codes.sparkSession, p, store=emb)
    assert reopened.raw_by_cluster is not None
    a = sorted(
        (r["query_id"], r["rank"], r[K_ID], r[K_METRICS])
        for r in built.query(queries, top_k=5, nprobe=4, refine_k=50).collect()
    )
    b = sorted(
        (r["query_id"], r["rank"], r[K_ID], r[K_METRICS])
        for r in reopened.query(queries, top_k=5, nprobe=4, refine_k=50).collect()
    )
    assert a == b


def test_cluster_raw_unpersist_releases_cache(spark, emb):
    """build(cluster_raw=True) pins ONE shared encoded cache; the index
    must expose a working release handle (unpersisting the projected
    codes/raw views alone would be a silent no-op)."""
    from picovdb_spark.operators.ivfpq import IvfPqIndex

    idx = IvfPqIndex.build(emb, n_centroids=4, m=4, k=8, seed=1, cluster_raw=True)
    assert idx._pinned is not None
    assert idx._pinned.storageLevel.useMemory
    idx.unpersist()
    assert idx._pinned is None
    # still queryable — scans recompute from source
    q = emb.limit(2).select(F.col("_id_").alias("query_id"), F.col("_vector_"))
    assert idx.query(q, top_k=3, nprobe=4).count() > 0


def test_build_rejects_unknown_storage(spark, emb):
    """Out-of-vocabulary storage strings must fail fast, not silently
    pick a materialization policy (the cluster_raw branch used to treat
    anything != 'checkpoint' as 'memory')."""
    import pytest as _pytest

    from picovdb_spark.operators.ivfpq import IvfPqIndex
    from picovdb_spark.operators.pq import PqIndex

    with _pytest.raises(ValueError, match="storage"):
        IvfPqIndex.build(emb, n_centroids=4, m=4, k=8, storage="Memory")
    with _pytest.raises(ValueError, match="storage"):
        PqIndex.build(emb, m=4, k=8, storage="none")


def test_build_lazy_storage_pins_nothing(spark, emb):
    """storage='lazy' must not persist anything, with or without the
    clustered raw layout."""
    from picovdb_spark.operators.ivfpq import IvfPqIndex

    for raw in (False, True):
        idx = IvfPqIndex.build(
            emb, n_centroids=4, m=4, k=8, seed=1, storage="lazy", cluster_raw=raw
        )
        assert idx._pinned is None
        q = emb.limit(2).select(F.col("_id_").alias("query_id"), F.col("_vector_"))
        assert idx.query(q, top_k=3, nprobe=4).count() > 0


def test_written_raw_layout_refine_pruning_plan(tmp_path, emb, queries):
    """Disk-backed cluster_raw round-trip: BOTH scans of a routed refine
    query — the codes scan and the inverted-list raw scan — must plan as
    Hive partition pruning on __cluster. This is the 100 TB read shape:
    unprobed clusters cost zero IO in codes AND refine."""
    from picovdb_spark.plans import explain_str

    idx = IvfPqIndex.build(
        emb, n_centroids=16, m=16, k=64, seed=42, cluster_raw=True
    )
    p = str(tmp_path / "ivfpq_raw_prune")
    idx.write(p)
    spark = idx.codes.sparkSession
    reopened = IvfPqIndex.read(spark, p)
    assert reopened.raw_by_cluster is not None
    plan = explain_str(reopened.query(queries, top_k=5, nprobe=2, refine_k=20))
    # two pruned parquet scans: codes + _raw
    chunks = plan.split("PartitionFilters")
    assert len(chunks) >= 3, plan
    assert all("__cluster" in c[:200] for c in chunks[1:]), plan
    idx.unpersist()
