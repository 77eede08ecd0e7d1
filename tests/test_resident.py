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
    with pytest.raises(Exception, match="resident block for partition"):
        rs.query(queries, top_k=5).collect()


def test_resident_empty_queries(store, queries):
    with ResidentGemmStore(store.select(K_ID, "_vector_")) as rs:
        out = rs.query(queries.filter(F.col("query_id") == "no-such"), top_k=5)
        assert out.count() == 0
