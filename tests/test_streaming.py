"""Structured Streaming tests: file-source upsert ingestion
(foreachBatch MERGE) and watermarked window/session aggregations.

Technique: bounded streams via trigger(availableNow=True) so every test
is deterministic; streaming window results are cross-checked against the
identical batch plan (the streaming/batch twin rule,
picovdb_spark/streaming/windows.py)."""

import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from picovdb_spark.schema import K_ID, K_VECTOR, load_table
from picovdb_spark.store import VectorStore
from picovdb_spark.streaming import (
    read_events_stream,
    run_to_memory,
    sessionized_stream,
    stream_upsert,
    windowed_event_agg,
)


@pytest.fixture()
def tmpdirs(tmp_path):
    src = str(tmp_path / "incoming")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    yield src, store, ckpt
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def _write_batch(spark, src_dir, rows, part):
    df = spark.createDataFrame(rows, schema=f"{K_ID} string, {K_VECTOR} array<float>, cat string")
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(src_dir, f"part={part}"))


def test_stream_upsert_two_batches(spark, tmpdirs):
    src, store_path, ckpt = tmpdirs
    dim = 4
    _write_batch(spark, src, [("a", [1.0, 0.0, 0.0, 0.0], "x"), ("b", [0.0, 1.0, 0.0, 0.0], "y")], 1)
    q = stream_upsert(spark, src, store_path, dim=dim, checkpoint_dir=ckpt,
                      metadata={"cat": __import__("pyspark.sql.types", fromlist=["StringType"]).StringType()})
    q.awaitTermination()
    got = spark.read.parquet(store_path)
    assert got.count() == 2

    # second file: update 'a' (new cat) + insert 'c'
    _write_batch(spark, src, [("a", [1.0, 0.0, 0.0, 0.0], "x2"), ("c", [0.0, 0.0, 1.0, 0.0], "z")], 2)
    q2 = stream_upsert(spark, src, store_path, dim=dim, checkpoint_dir=ckpt,
                       metadata={"cat": __import__("pyspark.sql.types", fromlist=["StringType"]).StringType()})
    q2.awaitTermination()
    got = spark.read.parquet(store_path)
    assert got.count() == 3
    assert got.filter(F.col(K_ID) == "a").first()["cat"] == "x2"  # last-wins update
    # vectors were normalized on ingest
    v = got.filter(F.col(K_ID) == "a").first()[K_VECTOR]
    assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-6

    # the ingested store is queryable through the standard surface
    vs = VectorStore(spark, embedding_dim=dim)
    vs._df = spark.read.parquet(store_path)
    top = vs.query_one([0.0, 0.0, 1.0, 0.0], top_k=1).collect()
    assert top[0][K_ID] == "c"


def _events_dir(sf_dir, tmp_path):
    # file stream sources need a DIRECTORY of files
    d = str(tmp_path / "events_stream")
    os.makedirs(d, exist_ok=True)
    shutil.copy(os.path.join(sf_dir, "events.parquet"), os.path.join(d, "events-000.parquet"))
    return d


def test_read_events_stream_on_empty_dir_uses_canonical_schema(spark, tmp_path):
    """Defining the stream before any file has arrived must not raise:
    the reader falls back to the explicit canonical events schema (ts as
    TIMESTAMP) instead of failing schema inference on an empty dir."""
    d = str(tmp_path / "empty_events")
    os.makedirs(d, exist_ok=True)
    stream = read_events_stream(spark, d)
    assert stream.isStreaming
    assert dict(stream.dtypes)["ts"] == "timestamp"
    assert set(dict(stream.dtypes)) == {
        "event_id", "ts", "user_id", "event_type", "value", "props"
    }


def test_windowed_agg_stream_equals_batch(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events_dir = _events_dir(sf_dir, tmp_path)
    stream = read_events_stream(spark, events_dir)
    assert stream.isStreaming
    # update mode: every window updated in the (single) micro-batch emits
    run_to_memory(windowed_event_agg(stream), "win_stream_u", output_mode="update")
    got = {tuple(r) for r in spark.table("win_stream_u").collect()}

    batch = windowed_event_agg(load_table(spark, sf_dir, "events"))
    want = {tuple(r) for r in batch.collect()}
    assert got == want and len(want) > 0

    # append mode only emits windows CLOSED by the watermark: the result
    # is exactly the batch result minus the tail windows still in state
    run_to_memory(
        windowed_event_agg(read_events_stream(spark, events_dir)),
        "win_stream_a",
        output_mode="append",
    )
    got_append = {tuple(r) for r in spark.table("win_stream_a").collect()}
    assert got_append <= want
    max_emitted = max(r[0] for r in got_append)
    assert {r for r in want - got_append if r[0] <= max_emitted} == set()


def test_sessionized_stream_equals_batch_lag_formulation(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events_dir = _events_dir(sf_dir, tmp_path)
    run_to_memory(
        sessionized_stream(read_events_stream(spark, events_dir)), "sess_stream"
    )
    got = spark.table("sess_stream")
    # session_window's end = last_ts + gap; compare session STARTS and
    # event counts against the batch lag-formulation entry
    import __spark_entry__ as entry_mod

    batch = entry_mod.queries()["events_sessionize"](spark, sf_dir)
    g = {(r["user_id"], r["start_epoch"], r["n_events"]) for r in got.collect()}
    w = {(r["user_id"], r["start_epoch"], r["n_events"]) for r in batch.collect()}
    assert len(w) > 0 and g <= w
    # append mode withholds sessions the watermark (2h) + gap (30min)
    # hasn't closed; everything older must have been emitted
    max_ts = load_table(spark, sf_dir, "events").agg(
        F.unix_timestamp(F.max("ts"))).first()[0]
    horizon = max_ts - 2 * 3600 - 1800
    assert all(s[1] >= horizon for s in w - g), sorted(w - g)[:5]


def test_stream_upsert_intra_batch_last_wins(spark, tmpdirs):
    """Duplicate ids inside ONE micro-batch resolve deterministically to
    the LAST row (file order), same rule as VectorStore.upsert."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src, store_path, ckpt = tmpdirs
    pq.write_table(
        pa.table(
            {
                "_id_": ["x", "x", "y"],
                "_vector_": [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]],
                "cat": ["first", "second", "z"],
            }
        ),
        os.path.join(src, "b1.parquet"),
    )
    from pyspark.sql import types as T

    q = stream_upsert(
        spark, src, store_path, dim=2, checkpoint_dir=ckpt,
        vector_type=T.DoubleType(), metadata={"cat": T.StringType()},
    )
    q.awaitTermination()
    got = spark.read.parquet(store_path)
    assert got.count() == 2
    assert got.filter(F.col("_id_") == "x").first()["cat"] == "second"


def test_read_events_stream_missing_dir_raises(spark, tmp_path):
    """A mistyped source path must fail at stream DEFINITION:
    readStream skips existence checks for streaming sources, so a
    swallowed error here would start a stream that silently never
    produces a row."""
    from picovdb_spark.streaming.windows import read_events_stream

    with pytest.raises(FileNotFoundError, match="does not exist"):
        read_events_stream(spark, str(tmp_path / "no_such_dir"))


def test_stream_ingest_then_incremental_ivf_maintenance(spark, tmpdirs):
    """End-to-end index-maintenance loop a streaming deployment runs:
    drain a micro-batch into the store, build the IVF index, drain a
    second batch, `add()` ONLY the new rows against the frozen centroids
    (the incremental path), and verify a full-probe ANN query over the
    maintained index equals the exact scan over the updated store."""
    import numpy as np

    from picovdb_spark.operators.ann import IvfIndex, ann_query
    from picovdb_spark.operators.similarity import batch_query

    src, store_path, ckpt = tmpdirs
    dim = 8
    rng = np.random.default_rng(17)

    def mk(n, start):
        out = []
        for i in range(n):
            v = rng.standard_normal(dim).astype(np.float32)
            out.append((f"v{start + i}", [float(x) for x in v], "m"))
        return out

    meta = {"cat": __import__("pyspark.sql.types", fromlist=["StringType"]).StringType()}
    _write_batch(spark, src, mk(40, 0), 1)
    stream_upsert(spark, src, store_path, dim=dim, checkpoint_dir=ckpt, metadata=meta).awaitTermination()
    store = spark.read.parquet(store_path)
    idx = IvfIndex.build(store.select(K_ID, K_VECTOR), n_centroids=4, seed=7)
    assert idx.last_mode == "full" and idx.added_rows == 0

    _write_batch(spark, src, mk(20, 40), 2)
    stream_upsert(spark, src, store_path, dim=dim, checkpoint_dir=ckpt, metadata=meta).awaitTermination()
    store2 = spark.read.parquet(store_path)
    new_rows = store2.select(K_ID, K_VECTOR).join(
        idx.df.select(K_ID), K_ID, "left_anti"
    )
    idx2 = idx.add(new_rows, auto_refit=True, threshold=0.6)  # 20/40 = 0.5 < 0.6
    assert idx2.last_mode == "incremental"
    assert idx2.df.count() == 60

    queries = store2.limit(5).select(
        F.col(K_ID).alias("query_id"), F.col(K_VECTOR)
    )
    ann = ann_query(idx2, queries, top_k=5, nprobe=4)  # full probe == exact
    exact = batch_query(store2, queries, top_k=5)
    key = lambda rows: sorted((r["query_id"], r[K_ID], r["_metrics_"], r["rank"]) for r in rows)  # noqa: E731
    assert key(ann.collect()) == key(exact.collect())

    # a third batch crossing the drift threshold must trigger full refit
    _write_batch(spark, src, mk(40, 60), 3)
    stream_upsert(spark, src, store_path, dim=dim, checkpoint_dir=ckpt, metadata=meta).awaitTermination()
    store3 = spark.read.parquet(store_path)
    newer = store3.select(K_ID, K_VECTOR).join(idx2.df.select(K_ID), K_ID, "left_anti")
    idx3 = idx2.add(newer, auto_refit=True, threshold=0.6)  # (20+40)/40 > 0.6
    assert idx3.last_mode == "full"
    assert idx3.df.count() == 100
