"""Global total-order ranking at scale.

`row_number() OVER (ORDER BY ...)` with no PARTITION BY collapses to a
single-partition window — one task ranks the whole table, which is the
classic 100 TB scale-killer. `global_rank` produces the identical result
with the distributed shape Spark's own `zipWithIndex` uses:

  1. `repartitionByRange` on the sort keys + `sortWithinPartitions`
     (one range shuffle — the same shuffle a global ORDER BY pays);
  2. one tiny count job: rows per partition (one long per partition to
     the driver);
  3. a narrow Arrow map that adds `offset[pid] + local_index`.

The DataFrame is persisted between (2) and (3): range boundaries come
from sampling, so re-executing the shuffle between the count job and the
map job could re-draw boundaries and corrupt the offsets. Ranks are a
total order as long as the key list ends in a unique column (enforced by
convention — pass the id column last); partition boundaries then cannot
affect the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order_by: list[tuple[str, str]],
    *,
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a 1-based global rank column ordered by ``order_by`` —
    [(column, "asc" | "desc"), ...], which MUST end in a unique
    tie-breaker column for the rank to be deterministic.

    The SORTED SOURCE (not the returned frame) is persisted
    (MEMORY_AND_DISK) — required for correctness, see the module
    docstring. `.unpersist()` on the returned derived frame would be a
    no-op; call :func:`release_global_rank` on the result once it has
    been fully consumed to free the cached copy.
    """
    sort_cols = [
        F.col(c).desc() if d.lower() == "desc" else F.col(c).asc()
        for c, d in order_by
    ]
    n_parts = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    ranked_src = (
        df.repartitionByRange(n_parts, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    sizes = {
        r["__pid"]: r["cnt"]
        for r in ranked_src.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]

    out_schema = ranked_src.drop("__pid").schema.add(rank_col, "long", False)
    fields = [f.name for f in out_schema.fields if f.name != rank_col]

    def add_rank(batches):
        seen = 0
        base = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if base is None:
                base = offsets[int(pdf["__pid"].iloc[0])]
            out = pdf.drop(columns=["__pid"])
            out[rank_col] = range(base + seen + 1, base + seen + 1 + len(pdf))
            seen += len(pdf)
            yield out[fields + [rank_col]]

    # mapInPandas is a narrow map over the sorted partition iterator —
    # intra-partition order (the sort) is preserved, so local_index is
    # the within-partition rank
    out = ranked_src.mapInPandas(add_rank, schema=out_schema)
    # hand the caller the only object whose unpersist() frees anything
    out._global_rank_source = ranked_src  # type: ignore[attr-defined]
    return out


def release_global_rank(ranked: DataFrame) -> None:
    """Unpersist the internal sorted-source cache behind a
    :func:`global_rank` result. Safe to call once the result has been
    written/collected; the result must not be re-evaluated afterwards
    (offsets stay correct only while the cache pins the partitioning).

    Must be passed the EXACT frame `global_rank` returned: the private
    cache handle does not survive `.select()`/`.filter()` descendants,
    and silently skipping the unpersist would quietly reintroduce the
    per-run cache leak this function exists to close — so an unmarked
    frame raises instead."""
    src = getattr(ranked, "_global_rank_source", None)
    if src is None:
        raise ValueError(
            "release_global_rank must receive the DataFrame returned by "
            "global_rank itself — transformed descendants drop the cache "
            "handle; keep a reference to the original result and release "
            "that one"
        )
    src.unpersist()
    # composed operators (e.g. interleave_by_weight) chain MULTIPLE rank
    # passes: the earlier passes' sources must stay pinned until the
    # final result is consumed (releasing them early would let a lost
    # partition of the later pass recompute through a re-sampled range
    # partitioning — silently wrong ranks), so they ride here and are
    # freed together
    for extra in getattr(ranked, "_global_rank_extra", ()):
        extra.unpersist()
