"""Bucketed layout: an id-equi-join between two stores bucketed the same
way must plan with NO Exchange (shuffle) on either side — the co-located
join guarantee that makes id-keyed MERGE affordable at scale."""

import pytest
from pyspark.sql import functions as F

from picovdb_spark.plans import explain_str
from picovdb_spark.schema import K_ID
from picovdb_spark.sources.bucketed import read_bucketed_store, write_bucketed_store


@pytest.fixture(scope="module")
def bucketed(spark):
    df = spark.createDataFrame(
        [(str(i), [float(i), 1.0], i % 5) for i in range(1000)],
        schema=f"{K_ID} string, _vector_ array<float>, label int",
    )
    write_bucketed_store(df, "bstore_a", buckets=8)
    write_bucketed_store(
        df.withColumn("label", F.col("label") + 1), "bstore_b", buckets=8
    )
    yield
    spark.sql("DROP TABLE IF EXISTS bstore_a")
    spark.sql("DROP TABLE IF EXISTS bstore_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    # force a non-broadcast join so the bucket co-location is observable
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = read_bucketed_store(spark, "bstore_a")
        b = read_bucketed_store(spark, "bstore_b")
        joined = a.join(b.withColumnRenamed("label", "label_b").drop("_vector_"), on=K_ID)
        plan = explain_str(joined, mode="simple")  # simple: Exchange args inline
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_unbucketed_join_does_shuffle(spark, bucketed):
    """Control: the same join against a plain DataFrame shuffles (so the
    previous test is actually measuring the bucket effect)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = read_bucketed_store(spark, "bstore_a")
        plain = a.sparkSession.createDataFrame(
            [(str(i), i) for i in range(1000)], schema=f"{K_ID} string, x int"
        )
        plan = explain_str(a.join(plain, on=K_ID), mode="simple")
        assert "Exchange hashpartitioning" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
