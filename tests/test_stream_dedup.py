"""Streaming dedup tests: cross-micro-batch exact dedup keeps the first
arrival and drops later copies; the batch twin matches exact_dedup's
canonical choice; the streaming SimHash mark carries identical
fingerprints and block keys to the batch sweep."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from picovdb_spark.operators.dedup import exact_dedup, simhash, simhash_pairs
from picovdb_spark.schema import load_table
from picovdb_spark.streaming.dedup import (
    stream_exact_dedup,
    stream_simhash_mark,
)


def _write_doc_batch(spark, path, rows):
    spark.createDataFrame(
        rows, schema="doc_id long, ts timestamp, text string"
    ).coalesce(1).write.mode("append").parquet(path)


def test_stream_exact_dedup_across_batches(spark, tmp_path):
    """Two files (= two micro-batches under maxFilesPerTrigger=1): a
    duplicate of batch-1 content arriving in batch 2 within the
    watermark horizon must be dropped."""
    d = str(tmp_path / "docs_stream")
    from datetime import datetime

    t0 = datetime(2024, 1, 1, 12, 0, 0)
    t1 = datetime(2024, 1, 1, 12, 10, 0)
    _write_doc_batch(
        spark, d, [(1, t0, "alpha beta gamma"), (2, t0, "delta epsilon zeta")]
    )
    _write_doc_batch(
        spark, d, [(3, t1, "alpha beta gamma"), (4, t1, "eta theta iota")]
    )

    src = (
        spark.readStream.schema("doc_id long, ts timestamp, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = stream_exact_dedup(src, ts_col="ts", watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    kept = {r["doc_id"] for r in spark.table("dedup_stream").collect()}
    # doc 3 duplicates doc 1's content and must be dropped
    assert 3 not in kept
    assert {1, 2, 4} <= kept


def test_batch_twin_matches_exact_dedup(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    kept = stream_exact_dedup(docs, id_col="doc_id")
    canon = exact_dedup(docs).filter(~F.col("is_dup"))
    a = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in canon.select("doc_id").collect())
    assert a == b


def test_stream_mark_matches_batch_fingerprints(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    marked = stream_simhash_mark(docs)
    batch = simhash(docs)
    a = {r["doc_id"]: r["simhash"] for r in marked.select("doc_id", "simhash").collect()}
    b = {r["doc_id"]: r["simhash"] for r in batch.collect()}
    assert a == b
    # block keys reproduce the batch pigeonhole split: joining marked
    # blocks self-wise yields a candidate superset of the sweep's pairs
    row = marked.select("simhash", "blocks").first()
    blocks = row["blocks"]
    assert len(blocks) == 8  # max_hamming 7 + 1
    sh = row["simhash"]
    for i, blk in enumerate(blocks):
        assert blk == (sh >> (i * 6)) & 0x3F


def test_stream_mark_runs_on_stream(spark, tmp_path):
    """The mark is stateless — it must run under a streaming source
    without requiring watermarks or output-mode gymnastics."""
    d = str(tmp_path / "mark_stream")
    from datetime import datetime

    _write_doc_batch(
        spark, d, [(1, datetime(2024, 1, 1), "alpha beta gamma delta epsilon")]
    )
    src = spark.readStream.schema("doc_id long, ts timestamp, text string").parquet(d)
    out = stream_simhash_mark(src)
    q = (
        out.writeStream.format("memory")
        .queryName("mark_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("mark_stream").collect()
    assert len(rows) == 1 and rows[0]["simhash"] != 0


def test_stream_dedup_to_parquet_sink_e2e(spark, tmp_path):
    """The ingest shape end-to-end: file stream -> cross-batch exact
    dedup -> parquet sink; the landed corpus holds exactly one copy per
    distinct content."""
    src_dir = str(tmp_path / "e2e_src")
    out_dir = str(tmp_path / "e2e_out")
    ckpt = str(tmp_path / "e2e_ckpt")
    from datetime import datetime

    t0 = datetime(2024, 3, 1, 9, 0, 0)
    t1 = datetime(2024, 3, 1, 9, 5, 0)
    _write_doc_batch(spark, src_dir, [(1, t0, "one two three"), (2, t0, "four five six")])
    _write_doc_batch(spark, src_dir, [(3, t1, "one two three"), (4, t1, "seven eight nine")])

    src = (
        spark.readStream.schema("doc_id long, ts timestamp, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        stream_exact_dedup(src, ts_col="ts", watermark="1 hour")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    landed = spark.read.parquet(out_dir)
    texts = [r["text"] for r in landed.collect()]
    assert sorted(texts) == ["four five six", "one two three", "seven eight nine"]
    assert landed.filter(F.col("doc_id") == 3).count() == 0


def test_stream_without_ts_col_rejected(spark, tmp_path):
    """A streaming source without ts_col must fail fast (the batch
    fallbacks would either crash at start or grow unbounded state)."""
    d = str(tmp_path / "no_ts_src")
    from datetime import datetime

    _write_doc_batch(spark, d, [(1, datetime(2024, 1, 1), "a b c")])
    src = spark.readStream.schema("doc_id long, ts timestamp, text string").parquet(d)
    with pytest.raises(ValueError, match="ts_col"):
        stream_exact_dedup(src)


def test_stream_mark_rejects_untiling_block_config(spark, sf_dir):
    """The stream mark must enforce the SAME bits % (max_hamming+1)
    precondition as batch simhash_pairs — a truncated block split would
    emit keys that can never match a batch sweep's."""
    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="divisible"):
        stream_simhash_mark(docs, bits=60, max_hamming=7)


# ---------------------------------------------------------------- screen


def test_minhash_screen_batch_matches_against(spark, sf_dir):
    """The batch form must agree pair-for-pair with minhash_dedup_against
    (same signatures, same estimator) and mark every doc exactly once."""
    from picovdb_spark.operators.dedup import minhash_dedup_against, minhash_index
    from picovdb_spark.streaming.dedup import stream_minhash_screen

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(150)
    hist = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    idx = minhash_index(hist).localCheckpoint(eager=True)

    marked = stream_minhash_screen(batch, idx, est_threshold=0.3)
    assert marked.count() == batch.count()  # one row per doc, none lost
    hits = {
        r["doc_id"]: (r["matched_id"], r["est_jaccard"])
        for r in marked.filter("is_known_dup").collect()
    }
    pairs = minhash_dedup_against(batch, idx, est_threshold=0.3)
    best = {}
    for r in pairs.collect():
        cur = best.get(r["id_new"])
        cand = (r["est_jaccard"], -r["id_indexed"], r["id_indexed"])
        if cur is None or cand > cur:
            best[r["id_new"]] = cand
    assert hits == {k: (v[2], v[0]) for k, v in best.items()}


def test_minhash_screen_foreachbatch_e2e(spark, tmp_path):
    """The production shape: file stream -> foreachBatch screen vs a
    static index -> parquet sink with the dup mark landed per row."""
    from datetime import datetime

    from picovdb_spark.operators.dedup import minhash_index
    from picovdb_spark.streaming.dedup import stream_minhash_screen

    hist = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six seven eight"),
        ],
        "doc_id long, text string",
    )
    idx_path = str(tmp_path / "idx")
    minhash_index(hist).write.parquet(idx_path)
    idx = spark.read.parquet(idx_path)

    src_dir = str(tmp_path / "scr_src")
    out_dir = str(tmp_path / "scr_out")
    ckpt = str(tmp_path / "scr_ckpt")
    t0 = datetime(2024, 3, 1, 9, 0, 0)
    _write_doc_batch(
        spark,
        src_dir,
        [(10, t0, "alpha beta gamma delta epsilon zeta eta theta")],
    )
    _write_doc_batch(
        spark, src_dir, [(11, t0, "totally novel words appear here now ok yes")]
    )

    src = (
        spark.readStream.schema("doc_id long, ts timestamp, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )

    def sink(bdf, _bid):
        stream_minhash_screen(bdf, idx, est_threshold=0.5).write.mode(
            "append"
        ).parquet(out_dir)

    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    landed = {r["doc_id"]: r for r in spark.read.parquet(out_dir).collect()}
    assert landed[10]["is_known_dup"] and landed[10]["matched_id"] == 1
    assert landed[10]["est_jaccard"] == 1.0
    assert not landed[11]["is_known_dup"] and landed[11]["matched_id"] is None


def test_minhash_screen_rejects_direct_stream(spark, tmp_path):
    from picovdb_spark.operators.dedup import minhash_index
    from picovdb_spark.streaming.dedup import stream_minhash_screen

    d = str(tmp_path / "rej_src")
    _write_doc_batch(spark, d, [(1, None, "a b c")])
    src = spark.readStream.schema("doc_id long, ts timestamp, text string").parquet(d)
    idx = minhash_index(
        spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    )
    with pytest.raises(ValueError, match="foreachBatch"):
        stream_minhash_screen(src, idx)


def test_minhash_screen_catches_short_doc_reingestion(spark):
    """The short route (index text_hash side table) flows through the
    streaming screen's wholesale delegation: a 2-token doc arriving in
    a micro-batch is marked as a known dup of its indexed copy with
    est_jaccard 1.0, alongside the signature-path matches."""
    from picovdb_spark.operators.dedup import minhash_index
    from picovdb_spark.streaming.dedup import stream_minhash_screen

    hist = spark.createDataFrame(
        [
            (1, "tiny doc"),
            (2, "the quick brown fox jumps over the lazy dog today"),
        ],
        "doc_id long, text string",
    )
    idx = minhash_index(hist).localCheckpoint(eager=True)
    batch = spark.createDataFrame(
        [
            (10, "Tiny  DOC"),  # normalized short copy
            (11, "the quick brown fox jumps over the lazy dog today"),
            (12, "wholly unrelated new words here"),
        ],
        "doc_id long, text string",
    )
    marked = {r["doc_id"]: r for r in stream_minhash_screen(batch, idx).collect()}
    assert len(marked) == 3
    assert marked[10]["is_known_dup"] and marked[10]["matched_id"] == 1
    assert marked[10]["est_jaccard"] == 1.0
    assert marked[11]["is_known_dup"] and marked[11]["matched_id"] == 2
    assert not marked[12]["is_known_dup"]
