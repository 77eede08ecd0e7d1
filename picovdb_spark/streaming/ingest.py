"""Streaming ingestion — continuous `upsert` (SURVEY.md §7, M5/M6).

The reference mutates synchronously under a write lock
(/root/reference/picovdb/pico_vdb.py:403-498); the Spark-native analog is
a Structured Streaming source feeding `foreachBatch`, where each
micro-batch is one MERGE (operators/merge.py) against the persisted
store — the same lazy-index contract applies (the ANN artifact is
rebuilt on demand, not per batch; pico_vdb.py:496-497).

On Delta/Iceberg the body of `_merge_batch` becomes `MERGE INTO`; here
it is expressed join-wise so it runs on plain Parquet with an atomic
directory swap (the staging+rename shape of `VectorStore.save`,
pico_vdb.py:342-378).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from picovdb_spark.functions.vector import assert_dim, auto_id, l2_normalize
from picovdb_spark.operators.merge import merge_upsert
from picovdb_spark.schema import K_DELETED, K_ID, K_VECTOR


def vector_batch_schema(
    dim: int,
    metadata: dict[str, T.DataType] | None = None,
    *,
    vector_type: T.DataType | None = None,
) -> T.StructType:
    """Schema for incoming vector batches (file/Kafka payloads).

    `vector_type` must match the PHYSICAL element type the producer wrote
    (Parquet's vectorized reader refuses float↔double coercion): float32
    producers (the store's canonical type) use the default; float64
    producers pass `T.DoubleType()`. Ingest normalizes and casts to
    array<float> either way."""
    fields = [
        T.StructField(K_ID, T.StringType(), True),
        T.StructField(K_VECTOR, T.ArrayType(vector_type or T.FloatType()), False),
    ]
    for name, dtype in (metadata or {}).items():
        fields.append(T.StructField(name, dtype, True))
    return T.StructType(fields)


def _atomic_overwrite(df: DataFrame, path: str) -> None:
    spark = df.sparkSession
    staging = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(staging)
    old = f"{path}.old-{uuid.uuid4().hex[:8]}"
    if os.path.exists(path):
        os.replace(path, old)
    os.replace(staging, path)
    shutil.rmtree(old, ignore_errors=True)
    spark.catalog.clearCache()


def _merge_batch(batch: DataFrame, store_path: str, dim: int) -> None:
    spark = batch.sparkSession
    batch = batch.withColumn(
        K_VECTOR, l2_normalize(assert_dim(F.col(K_VECTOR), dim)).cast("array<float>")
    )
    if K_ID in batch.columns:
        batch = batch.withColumn(
            K_ID, F.coalesce(F.col(K_ID).cast("string"), auto_id(F.col(K_VECTOR)))
        )
    else:
        batch = batch.withColumn(K_ID, auto_id(F.col(K_VECTOR)))
    # last-wins within the micro-batch, DETERMINISTIC (same rule and
    # mechanism as VectorStore.upsert): dropDuplicates would keep an
    # arbitrary row per id
    from pyspark.sql import Window

    w = Window.partitionBy(K_ID).orderBy(F.monotonically_increasing_id().desc())
    batch = (
        batch.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .withColumn(K_DELETED, F.lit(False))
    )

    if os.path.exists(store_path):
        existing = spark.read.parquet(store_path)
        for c in batch.columns:
            if c not in existing.columns:
                existing = existing.withColumn(c, F.lit(None).cast(batch.schema[c].dataType))
        for c in existing.columns:
            if c not in batch.columns:
                batch = batch.withColumn(c, F.lit(None).cast(existing.schema[c].dataType))
        merged = merge_upsert(existing, batch.select(*existing.columns))
    else:
        merged = batch
    # Materialize before the swap: `merged` lazily reads store_path, and
    # the overwrite would otherwise pull the rug under its own scan.
    merged = merged.localCheckpoint(eager=True)
    _atomic_overwrite(merged, store_path)


def stream_upsert(
    spark: SparkSession,
    source_dir: str,
    store_path: str,
    *,
    dim: int,
    metadata: dict[str, T.DataType] | None = None,
    vector_type: T.DataType | None = None,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    fmt: str = "parquet",
):
    """File-source streaming upsert: every new file landing in
    `source_dir` is one micro-batch MERGEd into the store at `store_path`.

    `available_now=True` drains what is currently there and stops — the
    testable batch-bounded mode; `False` runs continuously. Returns the
    StreamingQuery (caller awaits/stops).
    """
    schema = vector_batch_schema(dim, metadata, vector_type=vector_type)
    reader = spark.readStream.schema(schema).format(fmt)
    src = reader.load(source_dir)
    writer = (
        src.writeStream.foreachBatch(lambda bdf, _epoch: _merge_batch(bdf, store_path, dim))
        .option(
            "checkpointLocation",
            checkpoint_dir or f"{store_path}.checkpoint",
        )
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
