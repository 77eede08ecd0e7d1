"""Bucketed store layout — co-located joins without a shuffle.

At 100 TB the dominant cost of id-keyed operations (upsert MERGE, point
enrichment, store↔store diff) is shuffling the big side on `_id_`.
Writing the store BUCKETED by `_id_` fixes the partitioning at rest:
Spark records the bucket spec in the catalog, and any equi-join between
two tables bucketed the same way (same column, same bucket count) uses
SortMergeJoin with ZERO Exchange on either side — pinned by
tests/test_bucketed.py.

The reference has no equivalent concept (single process, one in-memory
matrix); this is pure Spark-scale design (SURVEY.md §1.6: "bucketing for
co-located joins")."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from picovdb_spark.schema import K_ID


def write_bucketed_store(
    df: DataFrame,
    table_name: str,
    *,
    buckets: int = 16,
    bucket_col: str = K_ID,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed managed table (bucket spec lives in the
    catalog; plain directory Parquet cannot carry it)."""
    (
        df.write.mode(mode)
        .bucketBy(buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table_name)
    )


def read_bucketed_store(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
