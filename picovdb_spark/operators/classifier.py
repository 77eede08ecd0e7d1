"""Model-based quality filtering: a hashed bag-of-words logistic
regression, trained AND scored as Spark plans.

The reference has no learned components (its only scoring is cosine,
pico_vdb.py:747); modern corpus pipelines (CCNet, FineWeb-Edu, DCLM)
gate documents with a lightweight linear classifier trained on a small
labeled seed set and scored corpus-wide. This module implements that
shape Spark-first:

- `hashed_features`  — (doc, feature_idx, value) sparse rows: token →
  md5-hash32 mod n_features, value = term count, plus the per-doc L2
  norm for scale-invariant scoring. Pure Catalyst (explode + groupBy);
  the hash is the same md5 family every other operator uses, so scoring
  is DuckDB-oracle-statable.
- `logreg_fit`       — batch gradient descent where the WEIGHTS LIVE IN
  A DATAFRAME (feature_idx, w): each iteration is two hash joins + two
  groupBys (score docs, then aggregate per-feature gradients). No dense
  weight vector ever reaches the driver, so n_features can be 2^22+ at
  100 TB; per-iteration state is truncated with localCheckpoint. The
  classic regime is TRAIN on a bounded labeled seed set (10^4-10^6
  docs — one executor's worth of shuffle), SCORE on the full corpus.
- `logreg_score`     — one broadcast-able join (weights ≤ n_features
  rows) + per-doc agg; map-side at corpus scale when the weight table
  broadcasts.

Loss: L2-regularized logistic loss on labels in {0,1}; features are
count/L2-norm (unit feature vectors), the fastText-style normalization
that makes the learning rate document-length-invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from picovdb_spark.functions.text import md5_hash32, tokens

__all__ = [
    "hashed_features",
    "load_model",
    "logreg_fit",
    "logreg_score",
    "save_model",
]


def hashed_features(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = 1 << 18,
) -> DataFrame:
    """Sparse hashed bag-of-words: one row per (doc, feature) with
    `value` = count(token) / l2norm(counts). Docs with no tokens emit
    no rows (they score at the bias alone). Two narrow shuffles: the
    (doc, feature) count groupBy and the per-doc norm window — both on
    keys that stay balanced at any corpus size (feature hashing is the
    skew control: a hot token maps to one feature ROW, not a hot
    partition of documents)."""
    tf = (
        docs.select(
            F.col(id_col),
            F.explode(tokens(F.col(text_col))).alias("__tok"),
        )
        .groupBy(id_col, "__tok")
        .agg(F.count("*").cast("double").alias("__cnt"))
        .select(
            F.col(id_col),
            (md5_hash32(F.col("__tok")) % F.lit(int(n_features))).alias(
                "feature_idx"
            ),
            "__cnt",
        )
        # hash collisions inside one doc merge additively (the standard
        # hashing-trick semantics)
        .groupBy(id_col, "feature_idx")
        .agg(F.sum("__cnt").alias("__cnt"))
    )
    from pyspark.sql import Window as W

    # per-doc norm as a WINDOW over the id — one exchange on id, no
    # second aggregate + join back (which would shuffle tf twice more)
    norm = F.sqrt(F.sum(F.col("__cnt") * F.col("__cnt")).over(W.partitionBy(id_col)))
    return tf.select(
        F.col(id_col),
        "feature_idx",
        (F.col("__cnt") / norm).alias("value"),
    )


def logreg_score(
    feats: DataFrame,
    weights: DataFrame,
    *,
    bias: float = 0.0,
    id_col: str = "doc_id",
    round_to: int = 6,
    spine: DataFrame | None = None,
) -> DataFrame:
    """(id, z, score): z = bias + Σ w·value, score = sigmoid(z), both
    rounded. `weights` is a (feature_idx, w) frame — broadcast when it
    fits (≤ a few hundred MB even at 2^22 features), so the join is
    map-side and the only shuffle is the per-doc sum.

    `feats` has no rows for zero-token documents (hashed_features emits
    none), so by default such docs get NO score row. Pass `spine` (any
    frame with `id_col`, typically the docs table) to get one row per
    spine id instead — missing docs score at the bias alone, the
    documented semantics a gate over the whole corpus needs."""
    w = weights.select("feature_idx", "w")
    z = (
        feats.join(F.broadcast(w), "feature_idx", "left")
        .groupBy(id_col)
        .agg(
            (F.lit(float(bias)) + F.sum(F.coalesce(F.col("w"), F.lit(0.0)) * F.col("value"))).alias("__z")
        )
    )
    if spine is not None:
        z = (
            spine.select(id_col)
            .join(z, id_col, "left")
            .withColumn("__z", F.coalesce(F.col("__z"), F.lit(float(bias))))
        )
    return z.select(
        F.col(id_col),
        F.round("__z", round_to).alias("z"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("__z"))), round_to).alias(
            "score"
        ),
    )


def logreg_fit(
    docs: DataFrame,
    *,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = 1 << 18,
    n_iter: int = 20,
    lr: float = 2.0,
    l2: float = 1e-4,
    track_loss: bool = False,
) -> dict:
    """Batch GD on L2-regularized logistic loss; returns
    {"weights": DataFrame(feature_idx, w) (checkpointed),
     "bias": float, "n_features": int, "losses": [..] if track_loss}.

    Each iteration runs TWO aggregation plans:
      1. p_d = sigmoid(b + Σ_j w_j x_dj)       (join feats→weights, per-doc agg)
      2. g_j = Σ_d (p_d - y_d)·x_dj / n + λw_j  (join feats→residuals, per-feature agg)
    then w ← w - lr·g, b ← b - lr·mean(residual). The weight frame is
    localCheckpoint-ed per iteration so the lineage (and the job DAG)
    stays O(1) in n_iter. Everything driver-side is two scalars per
    iteration (bias gradient, optional loss); weights never leave the
    cluster.

    Deterministic: no RNG anywhere (zero init + fixed data order ⇒
    bit-stable up to float reduction order; tests pin behavior via loss
    decrease and separation, not exact weights)."""
    feats = hashed_features(
        docs, id_col=id_col, text_col=text_col, n_features=n_features
    ).localCheckpoint(eager=True)
    labels = docs.select(
        F.col(id_col), F.col(label_col).cast("double").alias("__y")
    ).localCheckpoint(eager=True)
    n_docs = labels.count()
    if n_docs == 0:
        raise ValueError("logreg_fit: empty training frame")

    spark = docs.sparkSession
    weights = spark.createDataFrame([], "feature_idx long, w double")
    bias = 0.0
    losses: list[float] = []
    prev = None
    for _ in range(int(n_iter)):
        z = (
            feats.join(F.broadcast(weights), "feature_idx", "left")
            .groupBy(id_col)
            .agg(
                (
                    F.lit(bias)
                    + F.sum(F.coalesce(F.col("w"), F.lit(0.0)) * F.col("value"))
                ).alias("__z")
            )
        )
        # docs with no features never appear in feats: right-join the
        # labels so they still contribute sigmoid(bias) - y
        resid = (
            z.join(labels, id_col, "right")
            .select(
                F.col(id_col),
                (
                    F.lit(1.0)
                    / (F.lit(1.0) + F.exp(-F.coalesce(F.col("__z"), F.lit(bias))))
                    - F.col("__y")
                ).alias("__r"),
                F.coalesce(F.col("__z"), F.lit(bias)).alias("__z"),
                F.col("__y"),
            )
            .localCheckpoint(eager=True)
        )
        agg_exprs = [F.avg("__r").alias("__rbar")]
        if track_loss:
            # stable logistic loss: log(1+e^z) - y·z  =  softplus(z) - yz
            agg_exprs.append(
                F.avg(
                    F.when(F.col("__z") > 30, F.col("__z"))
                    .otherwise(F.log1p(F.exp(F.col("__z"))))
                    - F.col("__y") * F.col("__z")
                ).alias("__loss")
            )
        stats = resid.agg(*agg_exprs).first()
        if track_loss:
            losses.append(float(stats["__loss"]))
        grad = (
            feats.join(resid.select(id_col, "__r"), id_col)
            .groupBy("feature_idx")
            .agg((F.sum(F.col("__r") * F.col("value")) / F.lit(float(n_docs))).alias("__g"))
        )
        new_w = (
            weights.join(grad, "feature_idx", "full")
            .select(
                "feature_idx",
                (
                    F.coalesce(F.col("w"), F.lit(0.0))
                    - F.lit(float(lr))
                    * (
                        F.coalesce(F.col("__g"), F.lit(0.0))
                        + F.lit(float(l2)) * F.coalesce(F.col("w"), F.lit(0.0))
                    )
                ).alias("w"),
            )
            .localCheckpoint(eager=True)
        )
        if prev is not None:
            # free the previous iteration's checkpoint blocks eagerly —
            # a 20-iteration fit would otherwise pin 20 weight copies
            try:
                prev.unpersist()
            except Exception:
                pass
        prev, weights = weights, new_w
        bias -= float(lr) * float(stats["__rbar"])
        resid.unpersist()
    if prev is not None and prev is not weights:
        try:
            prev.unpersist()
        except Exception:
            pass
    feats.unpersist()
    labels.unpersist()
    out = {"weights": weights, "bias": bias, "n_features": int(n_features)}
    if track_loss:
        out["losses"] = losses
    return out


def save_model(model: dict, path: str) -> None:
    """Persist a logreg_fit model: weights as Parquet (stays a
    DataFrame — never collected to the driver), scalars as JSON."""
    import json
    import os

    os.makedirs(path, exist_ok=True)
    model["weights"].select("feature_idx", "w").write.mode("overwrite").parquet(
        os.path.join(path, "weights")
    )
    meta = {k: model[k] for k in ("bias", "n_features") if k in model}
    if "losses" in model:
        meta["losses"] = list(model["losses"])
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


def load_model(spark, path: str) -> dict:
    """Load a model saved by :func:`save_model` — same dict shape
    logreg_fit returns, ready for logreg_score."""
    import json
    import os

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    out = dict(meta)
    out["weights"] = spark.read.parquet(os.path.join(path, "weights"))
    return out
