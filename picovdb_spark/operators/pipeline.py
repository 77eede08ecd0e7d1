"""End-to-end corpus curation: the full pre-training data decision in
ONE composable plan.

The reference stops at vector search; the pipelines that FEED it (and
any LLM pre-training corpus) run this exact chain before a single
embedding is computed:

    exact dedup → near-dup components → keep-best-by-quality →
    quality floor → repetition screen → [benchmark decontamination] →
    train/val/test split

`curate_corpus` composes the already-oracle-checked operators
(dedup.exact_dedup / minhash_lsh_pairs / connected_components /
keep_best_per_component, textops.quality_score / repetition_stats /
decontaminate / dataset_split) into one DataFrame: one row per input
document, every intermediate signal kept for audit, a single `keep`
verdict and a `drop_reason` naming the FIRST failing gate (stable
precedence, so downstream counts are reconcilable run-over-run).

Scale shape: every stage is either map-side (quality, repetition,
split), a narrow-key shuffle (content digest, band buckets,
component ids), or a broadcast semi-join (eval n-grams). Document
text never shuffles; the joins below carry ids + scalar columns only.
The expensive near-dup stage inherits `max_bucket_size` so one
boilerplate bucket can't quadratically dominate (see
dedup.minhash_lsh_pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from picovdb_spark.operators.dedup import (
    connected_components,
    exact_dedup,
    keep_best_per_component,
    minhash_lsh_pairs,
)
from picovdb_spark.operators.textops import (
    dataset_split,
    decontaminate,
    quality_score,
    repetition_stats,
)

# drop_reason precedence — first failing gate wins, so run-over-run
# counts per reason are stable under unrelated gate changes
REASONS = (
    "exact_dup",
    "near_dup",
    "low_quality",
    "repetitive",
    "contaminated",
)


def curate_corpus(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_docs: DataFrame | None = None,
    quality_min: float = 0.3,
    jaccard_threshold: float = 0.5,
    max_bucket_size: int | None = None,
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """One row per input document:

    (id, n_tokens, quality, dup_word_frac, top_bigram_frac,
     component_id, split, keep, drop_reason)

    - `keep` — survives every gate; `drop_reason` is NULL.
    - exact duplicates: only the canonical (min-id) copy can survive.
    - near-dup components (MinHash-LSH pairs at `jaccard_threshold`,
      transitively closed): only the best-QUALITY member survives
      (ties → smallest id), the rule real pipelines use instead of
      keeping an arbitrary copy.
    - `quality < quality_min` → low_quality; Gopher repetition screen
      → repetitive; any eval n-gram overlap (when `eval_docs` given)
      → contaminated.
    - `split` (train/val/test per `weights`, deterministic md5 bucket)
      is assigned to every row — filter `keep` downstream; dropped
      rows keep their split for audit symmetry.
    """
    ids = docs.select(id_col)

    ex = exact_dedup(docs, id_col=id_col, text_col=text_col).select(
        id_col, F.col("is_dup").alias("__exact_dup")
    )
    q = quality_score(docs, id_col=id_col, text_col=text_col)
    rep = repetition_stats(docs, id_col=id_col, text_col=text_col).select(
        id_col,
        "dup_word_frac",
        "top_bigram_frac",
        F.col("keep").alias("__rep_keep"),
    )
    pairs = minhash_lsh_pairs(
        docs,
        id_col=id_col,
        text_col=text_col,
        threshold=jaccard_threshold,
        max_bucket_size=max_bucket_size,
    )
    comps = connected_components(pairs, docs, id_col=id_col)
    best = keep_best_per_component(comps, q, id_col=id_col).select(
        id_col, "component_id", F.col("keep").alias("__best_in_comp")
    )
    split = dataset_split(docs, id_col=id_col, weights=weights).select(id_col, "split")

    out = (
        ids.join(ex, id_col, "left")
        .join(q, id_col, "left")
        .join(rep, id_col, "left")
        .join(best, id_col, "left")
        .join(split, id_col, "left")
    )
    if eval_docs is not None:
        cont = decontaminate(
            docs, eval_docs, id_col=id_col, text_col=text_col
        ).select(id_col, F.lit(True).alias("__contaminated"))
        out = out.join(cont, id_col, "left")
    else:
        out = out.withColumn("__contaminated", F.lit(None).cast("boolean"))

    reason = (
        F.when(F.col("__exact_dup"), F.lit("exact_dup"))
        .when(~F.coalesce(F.col("__best_in_comp"), F.lit(True)), F.lit("near_dup"))
        .when(F.col("quality") < F.lit(float(quality_min)), F.lit("low_quality"))
        .when(~F.coalesce(F.col("__rep_keep"), F.lit(True)), F.lit("repetitive"))
        .when(F.coalesce(F.col("__contaminated"), F.lit(False)), F.lit("contaminated"))
    )
    return out.select(
        id_col,
        "n_tokens",
        "quality",
        "dup_word_frac",
        "top_bigram_frac",
        "component_id",
        "split",
        reason.alias("drop_reason"),
        reason.isNull().alias("keep"),
    )


def curation_report(curated: DataFrame) -> dict:
    """Aggregate the per-document verdicts into the run report a corpus
    job logs: total, kept, and per-reason drop counts. One small
    groupBy; call on the (narrow) curate_corpus output."""
    rows = curated.groupBy("drop_reason").agg(F.count("*").alias("n")).collect()
    by_reason = {r["drop_reason"]: r["n"] for r in rows}
    kept = by_reason.pop(None, 0)
    total = kept + sum(by_reason.values())
    return {
        "total": total,
        "kept": kept,
        "dropped": {r: by_reason.get(r, 0) for r in REASONS if r in by_reason},
    }
