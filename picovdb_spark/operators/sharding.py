"""Deterministic training-shard assignment and writing.

The last step of a training-data pipeline: turn a curated corpus into N
shards whose (a) membership is a deterministic global pseudo-shuffle
(reproducible from (seed, id) alone — no RNG state, no partition-count
dependence), (b) document counts and token counts are balanced to within
one document per shard, and (c) within-shard order is itself the shuffle
order, so a trainer streaming shard files never needs a second shuffle
pass.

Plan shape (100 TB-safe): the pseudo-shuffle key is md5(seed || id) —
map-side; the global order comes from `global_rank` (range shuffle +
per-partition offsets, never a single-partition window); shard = rank
mod N is round-robin over the shuffled order, which balances BOTH docs
and expected tokens tighter than hash-assignment (hash gives ±sqrt
deviations; round-robin gives ±1 doc). The write is one range shuffle on
(shard, shard_pos) so each output file is a contiguous, sorted run.

Reference contrast: the reference persists one monolithic store
(pico_vdb.py save/load); sharded training output is outside its model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from picovdb_spark.operators.ordering import global_rank, release_global_rank


def shard_plan(
    docs: DataFrame,
    n_shards: int,
    *,
    id_col: str = "doc_id",
    seed: str = "shard-v1",
    shard_col: str = "shard",
    pos_col: str = "shard_pos",
    num_partitions: int | None = None,
) -> DataFrame:
    """All input columns + (`shard_col`, `pos_col`): the deterministic
    shard each row lands in (0..n_shards-1) and its 0-based position
    within that shard. Shuffle order is md5(seed:id) with id as the
    tie-breaker; assignment is round-robin over that order, so shard
    sizes differ by at most one document and every shard is an unbiased
    sample of the corpus (no curriculum leakage from input order).

    Changing `seed` re-deals the entire shuffle; changing `n_shards`
    re-deals only the assignment (the underlying order is stable).

    The result carries `global_rank`'s internal cache — call
    :func:`picovdb_spark.operators.ordering.release_global_rank` on it
    once consumed (write_training_shards does this for you).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    keyed = docs.withColumn(
        "__skey",
        F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))),
    )
    ranked = global_rank(
        keyed,
        [("__skey", "asc"), (id_col, "asc")],
        rank_col="__grank",
        num_partitions=num_partitions,
    )
    out = ranked.select(
        *[c for c in docs.columns],
        ((F.col("__grank") - 1) % n_shards).cast("int").alias(shard_col),
        ((F.col("__grank") - 1) / n_shards).cast("long").alias(pos_col),
    )
    out._global_rank_source = ranked._global_rank_source  # type: ignore[attr-defined]
    return out


def shard_manifest(
    plan: DataFrame,
    *,
    shard_col: str = "shard",
    tokens_col: str | None = None,
) -> DataFrame:
    """(shard, n_docs[, n_tokens]) — one row per shard, the audit
    artifact a trainer checks before reading: balanced counts prove the
    deal, the token column proves no shard got the long-document tail.
    One narrow aggregation."""
    aggs = [F.count("*").alias("n_docs")]
    if tokens_col is not None:
        aggs.append(F.sum(F.col(tokens_col).cast("long")).alias("n_tokens"))
    return plan.groupBy(shard_col).agg(*aggs)


def write_training_shards(
    docs: DataFrame,
    path: str,
    n_shards: int,
    *,
    id_col: str = "doc_id",
    seed: str = "shard-v1",
    tokens_col: str | None = None,
    format: str = "parquet",
    num_partitions: int | None = None,
) -> DataFrame:
    """Deal `docs` into `n_shards` and write them under
    `path/shard=<k>/`, each shard's rows stored in shuffle order
    (`shard_pos`). Returns the collected-side manifest DataFrame
    (shard, n_docs[, n_tokens]) AFTER the write completes, so a caller
    persisting the manifest next to the data records what was actually
    written.

    The write pays one range shuffle on (shard, shard_pos): each output
    task owns a contiguous run of one shard, so files within a shard
    directory are sorted and non-overlapping — a trainer reading
    `shard=k` in filename order replays the exact dealt order.
    """
    plan = shard_plan(
        docs,
        n_shards,
        id_col=id_col,
        seed=seed,
        num_partitions=num_partitions,
    )
    write_parts = max(n_shards, 1)
    (
        plan.repartitionByRange(write_parts, F.col("shard"), F.col("shard_pos"))
        .sortWithinPartitions("shard", "shard_pos")
        .write.partitionBy("shard")
        .mode("overwrite")
        .format(format)
        .save(path)
    )
    manifest = (
        plan.sparkSession.read.format(format)
        .load(path)
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            *(
                [F.sum(F.col(tokens_col).cast("long")).alias("n_tokens")]
                if tokens_col is not None
                else []
            ),
        )
    )
    release_global_rank(plan)
    return manifest
