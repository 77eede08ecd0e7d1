"""Streaming event analytics: watermarked tumbling windows and
session windows over the `events` stream.

These are the streaming twins of the batch entries
`events_window_agg` / `events_sessionize` in `__spark_entry__.py` —
IDENTICAL logical plans plus a watermark, which is the point: in
Structured Streaming the same DataFrame expression runs incrementally,
with the watermark bounding state for late data.

The reference has no streaming surface (SURVEY.md §2.4); this module is
part of the §7.4 scale-out extensions (continuous ingestion analytics
for an LLM-data pipeline: event-rate monitoring, per-user activity
sessions)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def read_events_stream(
    spark: SparkSession, source_dir: str, *, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based event stream (each new parquet file = new data).
    Swap for `spark.readStream.format("kafka")` + from_json in
    production; the downstream plans are source-agnostic.

    A file stream needs an explicit schema, but the event corpus' `ts`
    physical type varies by writer generation — TIMESTAMP(NANOS) (only
    readable as a nanos long) vs TIMESTAMP(MICROS)/NTZ — so the schema is
    inferred once from the files already present (metadata-only batch
    read) and `ts` normalized to a session-zone TIMESTAMP either way,
    mirroring the batch loader (schema.load_events).

    If the directory is empty (stream defined before any file arrives)
    the explicit canonical schema is used instead — ts as
    TIMESTAMP(MICROS), the current writer generation. One generation
    per stream: files whose ts physical type differs from the schema
    locked in here (e.g. a NANOS-long writer appearing mid-stream)
    are NOT supported within a single run — restart the stream so the
    schema re-infers."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import os

    # Fallback applies ONLY to the define-before-data case: an existing
    # directory with no files yet. A missing/mistyped path or an actual
    # read error must raise HERE — readStream skips existence checks for
    # streaming sources, so swallowing the error would start a stream
    # that silently never produces a row.
    has_files = os.path.isdir(source_dir) and any(
        not name.startswith((".", "_")) for name in os.listdir(source_dir)
    )
    if not os.path.isdir(source_dir):
        raise FileNotFoundError(f"stream source directory does not exist: {source_dir}")
    if has_files:
        inferred = spark.read.parquet(source_dir).schema
    else:
        # empty source dir (stream defined before any file arrives):
        # fall back to the canonical events schema
        inferred = T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("user_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("value", T.DoubleType()),
                T.StructField("props", T.StringType()),
            ]
        )
    reader = spark.readStream.schema(inferred)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(source_dir)
    if isinstance(inferred["ts"].dataType, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def windowed_event_agg(
    events: DataFrame, *, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window count/sum per event_type with late-data bound.
    Same aggregate as the batch `events_window_agg` entry; the watermark
    lets Spark drop window state once `max(ts) - watermark` passes the
    window end — bounded memory at any stream length."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sessionized_stream(
    events: DataFrame, *, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user gap-based sessions via the built-in `session_window` —
    Spark's native stateful sessionization (no custom
    applyInPandasWithState needed for gap semantics). Batch twin:
    `events_sessionize` (lag + running-sum formulation gives the same
    session boundaries)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("start_epoch"),
            F.unix_timestamp(F.col("w.end")).alias("end_epoch"),
            "n_events",
        )
    )


def run_to_memory(stream_df: DataFrame, name: str, *, output_mode: str = "append"):
    """Drain a bounded stream into an in-memory table (test/debug sink):
    trigger(availableNow) + awaitTermination, returns the query."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
