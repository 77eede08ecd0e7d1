"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship query (batch top-k cosine search) on sf0.001.
`queries()` — one entry per implemented operator from SURVEY.md §2.
`oracle_sql()` — DuckDB twin of each query (tables pre-registered as
views: region nation customer supplier part orders lineitem events
documents embeddings).

Engine/oracle compatibility rules (SURVEY.md §7.2-§7.3):
- all scores are computed in double and rounded to 6 decimals on BOTH
  sides; ranking uses the rounded score with id-string ascending as the
  deterministic tie-breaker;
- every computed column is aliased identically on both sides.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from picovdb_spark.operators.merge import merge_upsert, upsert_report
from picovdb_spark.operators.similarity import batch_query
from picovdb_spark.schema import K_DELETED, K_ID, K_VECTOR, load_embeddings_store, load_table

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _queries_df(spark: SparkSession, sf_dir: str, n: int = 8) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").cast("string").alias("query_id"),
        F.col("embedding").alias(K_VECTOR),
    )


# DuckDB fragment: cosine(q, e) rounded to 6, matching the engine's
# normalize-then-dot within rounding.
_COS = "round(list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6)"


def _topk_oracle(k: int, *, nq: int = 8, where: str = "TRUE", better_than: float | None = None) -> str:
    bt = f"AND _metrics_ >= {better_than}" if better_than is not None else ""
    return f"""
WITH q AS (SELECT vec_id AS qid, embedding FROM embeddings WHERE vec_id < {nq}),
scored AS (
  SELECT CAST(q.qid AS VARCHAR) AS query_id,
         CAST(e.vec_id AS VARCHAR) AS _id_,
         e.label,
         {_COS} AS _metrics_
  FROM q CROSS JOIN embeddings e
  WHERE {where}
),
ranked AS (
  SELECT *, CAST(row_number() OVER (
            PARTITION BY query_id ORDER BY _metrics_ DESC, _id_ ASC) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, _id_, label, _metrics_, rank FROM ranked
WHERE rank <= {k} {bt}
"""


# ---------------------------------------------------------------- core query ops

@_register("topk_cosine_batch", _topk_oracle(10))
def _topk_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9+Q11+Q14: batch top-k cosine (SQL-expression path)."""
    return batch_query(load_embeddings_store(spark, sf_dir), _queries_df(spark, sf_dir), top_k=10)


@_register("topk_cosine_gemm", _topk_oracle(10))
def _topk_gemm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same operator, mapInPandas NumPy GEMM physical path — result-identical."""
    return batch_query(
        load_embeddings_store(spark, sf_dir), _queries_df(spark, sf_dir), top_k=10, method="gemm"
    )


@_register("topk_where_eq", _topk_oracle(5, where="e.label = 3"))
def _topk_where_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5: dict-equality metadata prefilter."""
    return batch_query(
        load_embeddings_store(spark, sf_dir), _queries_df(spark, sf_dir), top_k=5, where={"label": 3}
    )


@_register("topk_where_in", _topk_oracle(5, where="e.label IN (1, 2)"))
def _topk_where_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: $in membership prefilter."""
    return batch_query(
        load_embeddings_store(spark, sf_dir),
        _queries_df(spark, sf_dir),
        top_k=5,
        where={"label": {"$in": [1, 2]}},
    )


@_register("topk_ids_prefilter", _topk_oracle(5, where="e.vec_id < 100"))
def _topk_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4: candidate-id allow-list semi-join."""
    return batch_query(
        load_embeddings_store(spark, sf_dir),
        _queries_df(spark, sf_dir),
        top_k=5,
        ids=[str(i) for i in range(100)],
    )


@_register("topk_conjunction", _topk_oracle(10, where="e.vec_id < 100 AND e.label = 5"))
def _topk_conj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: ids ∩ where intersection."""
    return batch_query(
        load_embeddings_store(spark, sf_dir),
        _queries_df(spark, sf_dir),
        top_k=10,
        ids=[str(i) for i in range(100)],
        where={"label": 5},
    )


@_register("topk_better_than", _topk_oracle(10, better_than=0.3))
def _topk_bt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: post-ranking score threshold."""
    return batch_query(
        load_embeddings_store(spark, sf_dir), _queries_df(spark, sf_dir), top_k=10, better_than=0.3
    )


@_register(
    "query_one_top3",
    f"""
WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT 'q0' AS query_id,
         CAST(e.vec_id AS VARCHAR) AS _id_,
         e.label,
         {_COS} AS _metrics_
  FROM q CROSS JOIN embeddings e
),
ranked AS (
  SELECT *, CAST(row_number() OVER (
            PARTITION BY query_id ORDER BY _metrics_ DESC, _id_ ASC) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, _id_, label, _metrics_, rank FROM ranked WHERE rank <= 3
""",
)
def _query_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-vector sugar (pico_vdb.py:777-796)."""
    from picovdb_spark.operators.similarity import query_one

    vec = (
        load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") == 0).first()["embedding"]
    )
    return query_one(load_embeddings_store(spark, sf_dir), list(vec), top_k=3)


# ------------------------------------------------------------- scalar kernels

@_register(
    "vector_normalize",
    """
SELECT CAST(vec_id AS VARCHAR) AS _id_,
       round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS norm,
       round(embedding[1] / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS nx0
FROM embeddings
""",
)
def _normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.3 _normalize kernel: per-row L2 norm and first normalized component."""
    from picovdb_spark.functions.vector import l2_norm, l2_normalize

    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        F.col("vec_id").cast("string").alias(K_ID),
        F.round(l2_norm(F.col("embedding")), 6).alias("norm"),
        F.round(F.element_at(l2_normalize(F.col("embedding")), 1), 6).alias("nx0"),
    )


# ----------------------------------------------------------------- CRUD surface

@_register(
    "point_lookup",
    """
SELECT CAST(vec_id AS VARCHAR) AS _id_, label
FROM embeddings WHERE vec_id IN (1, 2, 3, 250, 499)
""",
)
def _point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get(): point lookup by id list, vector projected away (pico_vdb.py:927-957)."""
    store = load_embeddings_store(spark, sf_dir)
    ids = ["1", "2", "3", "250", "499"]
    return store.filter(~F.col(K_DELETED)).filter(F.col(K_ID).isin(ids)).select(K_ID, "label")


@_register(
    "scan_projection",
    "SELECT CAST(vec_id AS VARCHAR) AS _id_, label FROM embeddings",
)
def _scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_all(): full active scan with column pruning (no vector read)."""
    return load_embeddings_store(spark, sf_dir).filter(~F.col(K_DELETED)).select(K_ID, "label")


@_register(
    "store_stats",
    """
SELECT CAST(count(*) AS BIGINT) AS total,
       CAST(sum(CASE WHEN vec_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS deleted,
       CAST(count(*) - sum(CASE WHEN vec_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS active,
       CAST(max(len(embedding)) AS INTEGER) AS dim
FROM embeddings
""",
)
def _stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stats(): one aggregate pass over a store with tombstones
    (delete simulated as vec_id % 7 == 0)."""
    store = load_embeddings_store(spark, sf_dir).withColumn(
        K_DELETED, F.col(K_ID).cast("long") % 7 == 0
    )
    return store.agg(
        F.count("*").alias("total"),
        F.sum(F.col(K_DELETED).cast("bigint")).alias("deleted"),
        (F.count("*") - F.sum(F.col(K_DELETED).cast("bigint"))).alias("active"),
        F.max(F.size(K_VECTOR)).alias("dim"),
    )


def _upsert_frames(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Deterministic MERGE fixture: updates = every 10th id (label+100),
    inserts = ids shifted by 1,000,000 for vec_id < 50 (label+200)."""
    emb = load_table(spark, sf_dir, "embeddings")
    store = emb.select(F.col("vec_id").cast("string").alias(K_ID), F.col("label"))
    updates = (
        emb.filter(F.col("vec_id") % 10 == 0)
        .select(F.col("vec_id").cast("string").alias(K_ID), (F.col("label") + 100).alias("label"))
    )
    inserts = (
        emb.filter(F.col("vec_id") < 50)
        .select(
            (F.col("vec_id") + 1000000).cast("string").alias(K_ID),
            (F.col("label") + 200).alias("label"),
        )
    )
    return store, updates.unionByName(inserts)


_UPSERT_BATCH_SQL = """
  SELECT CAST(vec_id AS VARCHAR) AS _id_, label + 100 AS label
  FROM embeddings WHERE vec_id % 10 = 0
  UNION ALL
  SELECT CAST(vec_id + 1000000 AS VARCHAR) AS _id_, label + 200 AS label
  FROM embeddings WHERE vec_id < 50
"""


@_register(
    "upsert_merge",
    f"""
WITH store AS (SELECT CAST(vec_id AS VARCHAR) AS _id_, label FROM embeddings),
batch AS ({_UPSERT_BATCH_SQL})
SELECT s._id_, s.label FROM store s
WHERE NOT EXISTS (SELECT 1 FROM batch b WHERE b._id_ = s._id_)
UNION ALL
SELECT _id_, label FROM batch
""",
)
def _upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upsert(): MERGE by id, batch wins (pico_vdb.py:403-498)."""
    store, batch = _upsert_frames(spark, sf_dir)
    return merge_upsert(store, batch)


@_register(
    "upsert_report",
    f"""
WITH store AS (SELECT CAST(vec_id AS VARCHAR) AS _id_ FROM embeddings),
batch AS ({_UPSERT_BATCH_SQL})
SELECT b._id_,
       CASE WHEN s._id_ IS NOT NULL THEN 'update' ELSE 'insert' END AS action
FROM batch b LEFT JOIN store s ON b._id_ = s._id_
""",
)
def _upsert_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upsert() insert/update report (pico_vdb.py:408) as a DataFrame."""
    store, batch = _upsert_frames(spark, sf_dir)
    return upsert_report(store, batch)


@_register(
    "delete_remaining",
    """
SELECT CAST(vec_id AS VARCHAR) AS _id_, label
FROM embeddings WHERE vec_id % 7 <> 0
""",
)
def _delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """delete(): tombstone by id list; remaining active rows
    (pico_vdb.py:514-537). Also the vacuum() result shape."""
    store = load_embeddings_store(spark, sf_dir)
    del_ids = store.filter(F.col(K_ID).cast("long") % 7 == 0).select(K_ID)
    return store.join(del_ids, on=K_ID, how="left_anti").select(K_ID, "label")


# ---------------------------------------------------------------- contract API

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _topk_batch(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
