"""Skew-resistant aggregation: two-phase salted groupBy.

At 100 TB a grouped aggregation with a hot key (one event_type carrying
half the traffic, one boilerplate shingle) puts the hot group's entire
input on one reducer. Salting splits each group into `n_salts` subgroups
for the partial aggregate, then combines partials in a second (tiny)
aggregate — the map-side-combine idea made explicit when the built-in
partial aggregation isn't enough (e.g., high-cardinality accumulators).

AQE's skew-join handling (enabled in session.py) covers JOIN skew;
this covers GROUP-BY skew. Results are identical to the plain groupBy —
oracle-checked via the events_salted_agg entry.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    *,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregate: `aggs` maps output column → (input column,
    fn) with fn ∈ {count, sum, min, max}. These are the algebraic
    aggregates whose partials combine exactly (count→sum, sum→sum,
    min→min, max→max); avg = sum/count composed by the caller."""
    combiners = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    for out, (_, fn) in aggs.items():
        if fn not in combiners:
            raise ValueError(f"{out}: non-algebraic aggregate {fn!r} cannot be salted")

    salt = (F.spark_partition_id() % F.lit(n_salts)).alias("__salt")
    partial_exprs: list[Column] = []
    final_exprs: list[Column] = []
    for out, (col, fn) in aggs.items():
        # count(col) — non-null semantics, identical to the plain groupBy
        partial_exprs.append(getattr(F, fn)(F.col(col)).alias(f"__p_{out}"))
        final_exprs.append(getattr(F, combiners[fn])(F.col(f"__p_{out}")).alias(out))

    partial = df.withColumn("__salt", salt).groupBy(*group_cols, "__salt").agg(*partial_exprs)
    return partial.groupBy(*group_cols).agg(*final_exprs)
