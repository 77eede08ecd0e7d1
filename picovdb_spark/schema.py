"""Data model for the Spark vector store.

Reference data model (/root/reference/picovdb/pico_vdb.py:31-33,135-143):
a single logical collection of records `{_id_: str, _vector_: float32[dim],
**metadata}` with `_metrics_` added to query output, deletes as tombstones,
and a store-level `additional_data` KV dict.

Spark mapping (SURVEY.md §1.6): one DataFrame with a typed schema —
`_id_` string, `_vector_` array<float>, a `deleted` boolean tombstone
column, plus typed metadata columns. Vectors columnar in Parquet, so the
similarity scan gets column pruning + row-group predicate pushdown for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Reserved field names, mirroring picovdb/pico_vdb.py:31-33.
K_ID = "_id_"
K_VECTOR = "_vector_"
K_METRICS = "_metrics_"
K_DELETED = "_deleted_"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def vector_store_schema(metadata_fields: list[T.StructField] | None = None) -> T.StructType:
    """Schema for a vector store table: reserved columns + typed metadata."""
    fields = [
        T.StructField(K_ID, T.StringType(), nullable=False),
        T.StructField(K_VECTOR, T.ArrayType(T.FloatType(), containsNull=False), nullable=False),
        T.StructField(K_DELETED, T.BooleanType(), nullable=False),
    ]
    return T.StructType(fields + list(metadata_fields or []))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-generated parquet table (TESTDATA.md)."""
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table stores `ts` as Parquet TIMESTAMP(NANOS), which
    Spark's vectorized reader rejects; read nanos as long and convert to
    a microsecond timestamp (truncation — sub-microsecond precision is
    not needed by any operator)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_embeddings_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `embeddings` testdata table viewed as a picovdb-style store:
    (vec_id, embedding float[64], label) → (_id_, _vector_, label).

    Kept lazy — downstream filters on `label`/`_id_` push into the scan.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        F.col("vec_id").cast("string").alias(K_ID),
        F.col("embedding").alias(K_VECTOR),
        F.lit(False).alias(K_DELETED),
        F.col("label"),
    )
