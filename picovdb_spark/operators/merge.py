"""Upsert as a relational MERGE (SURVEY.md §2.1 upsert row).

The reference's `upsert` (/root/reference/picovdb/pico_vdb.py:403-498)
is insert-or-update by id with an insert/update report. In Spark this is
the classic MERGE shape: existing ⟕ batch on id → keep unmatched
existing rows, take all batch rows. On Delta/Iceberg the same logical op
is `MERGE INTO`; expressed with joins it runs on plain Parquet.

Scale notes: the anti-join shuffles on `_id_` once; if the batch is
small relative to the store it is broadcast (Catalyst/AQE decides under
`autoBroadcastJoinThreshold`). The report is produced from the *batch*
side only — never a scan of the full store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from picovdb_spark.schema import K_ID


def merge_upsert(existing: DataFrame, batch: DataFrame, id_col: str = K_ID) -> DataFrame:
    """Insert-or-update `batch` rows into `existing` by `id_col`
    (batch wins on conflict). Schemas must already be aligned."""
    cols = existing.columns
    return (
        existing.join(batch.select(id_col), on=id_col, how="left_anti")
        .select(*cols)
        .unionByName(batch.select(*cols))
    )


def upsert_report(existing: DataFrame, batch: DataFrame, id_col: str = K_ID) -> DataFrame:
    """(id, action) rows: 'update' if the id already exists else 'insert'
    — the distributed form of the reference's report dict (pico_vdb.py:408)."""
    marked = batch.select(id_col).join(
        existing.select(id_col).withColumn("__exists", F.lit(1)), on=id_col, how="left"
    )
    return marked.select(
        F.col(id_col),
        F.when(F.col("__exists").isNotNull(), F.lit("update")).otherwise(F.lit("insert")).alias("action"),
    )
