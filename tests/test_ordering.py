"""global_rank (operators/ordering.py): distributed total-order ranking.

Strategy: result-identity against the single-partition window (the
semantics), plus a plan assertion that the distributed form never
collapses to `Exchange SinglePartition` (the reason it exists).
"""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from picovdb_spark.operators.ordering import global_rank, release_global_rank
from picovdb_spark.operators.textops import quality_score
from picovdb_spark.plans import explain_str
from picovdb_spark.schema import load_table


@pytest.fixture(scope="module")
def scored(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return quality_score(docs).select("doc_id", "quality")


def test_global_rank_matches_window(spark, scored):
    got = global_rank(
        scored, [("quality", "desc"), ("doc_id", "asc")], rank_col="r", num_partitions=7
    )
    w = Window.orderBy(F.col("quality").desc(), F.col("doc_id").asc())
    want = scored.withColumn("r", F.row_number().over(w).cast("long"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # the cache lives on the internal sorted source, not the result —
    # release_global_rank is the only call that actually frees it
    src = got._global_rank_source
    assert src.is_cached
    release_global_rank(got)
    assert not src.is_cached


def test_global_rank_no_single_partition_exchange(spark, scored):
    got = global_rank(scored, [("quality", "desc"), ("doc_id", "asc")], num_partitions=7)
    plan = explain_str(got, mode="simple")
    assert "SinglePartition" not in plan, plan
    assert "rangepartitioning" in plan.lower(), plan


def test_global_rank_deterministic_across_runs(spark, scored):
    keys = [("quality", "desc"), ("doc_id", "asc")]
    a = global_rank(scored, keys, num_partitions=5).collect()
    b = global_rank(scored, keys, num_partitions=11).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_global_rank_empty_input(spark, scored):
    empty = scored.filter(F.lit(False))
    assert global_rank(empty, [("quality", "desc"), ("doc_id", "asc")]).count() == 0


def test_release_global_rank_rejects_descendants(spark, scored):
    """A .select() descendant drops the private cache handle; releasing
    it must raise rather than silently leak the sorted-source cache."""
    import pytest

    ranked = global_rank(scored, [("quality", "desc"), ("doc_id", "asc")])
    with pytest.raises(ValueError, match="global_rank itself"):
        release_global_rank(ranked.select("doc_id"))
    release_global_rank(ranked)  # the original still releases cleanly
