"""SemDeDup-style semantic dedup: cluster the embedding space, pair-scan
within clusters only (operators/dedup.semantic_dedup_pairs), keep the
member farthest from its centroid (centroid_affinity +
keep_best_per_component). Reference has no dedup beyond content-hash
auto-id (pico_vdb.py:54-55); this is the scale-out extension family."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from picovdb_spark.operators.dedup import (
    centroid_affinity,
    connected_components,
    embedding_near_dup,
    keep_best_per_component,
    semantic_dedup_pairs,
)

DIM = 8
# two tight semantic clusters around axes e0 and e1, plus one outlier
# near e2. Within-cluster cosines are ~1; cross-cluster ~0.
VECS = [
    ("a1", [1.0, 0.02, 0, 0, 0, 0, 0, 0]),
    ("a2", [1.0, 0.01, 0, 0, 0, 0, 0, 0]),
    ("a3", [1.0, 0.30, 0, 0, 0, 0, 0, 0]),  # farthest from e0 in cluster 0
    ("b1", [0.02, 1.0, 0, 0, 0, 0, 0, 0]),
    ("b2", [0.01, 1.0, 0, 0, 0, 0, 0, 0]),
    ("c1", [0, 0, 1.0, 0, 0, 0, 0, 0]),
]
AXES = np.eye(3, DIM)  # deterministic centroids e0, e1, e2


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        [(i, list(map(float, v))) for i, v in VECS],
        "vec_id string, embedding array<double>",
    )


def test_semantic_pairs_subset_of_exact_within_cluster(spark, emb):
    sem = semantic_dedup_pairs(emb, centroids=AXES, threshold=0.9).collect()
    got = {(r["id_a"], r["id_b"]) for r in sem}
    # within-cluster near-dups found; the cross-cluster space never scanned
    assert got == {("a1", "a2"), ("a1", "a3"), ("a2", "a3"), ("b1", "b2")}
    # every pair is a member of the exact global pair list at the same threshold
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup(
            emb, threshold=0.9, method="gemm"
        ).collect()
    }
    assert got <= exact
    # cluster column names the block each pair came from
    by_pair = {(r["id_a"], r["id_b"]): r["cluster"] for r in sem}
    assert by_pair[("a1", "a2")] == 0 and by_pair[("b1", "b2")] == 1


def test_semantic_matches_exact_filtered_by_cluster(spark, emb):
    """semantic == exact pairs restricted to equal cluster assignment —
    the operator's defining identity."""
    aff = {r["vec_id"]: r["cluster"] for r in centroid_affinity(
        emb, AXES, id_col="vec_id").collect()}
    exact = embedding_near_dup(emb, threshold=0.5, method="gemm").collect()
    want = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in exact
        if aff[r["id_a"]] == aff[r["id_b"]]
    }
    got = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in semantic_dedup_pairs(emb, centroids=AXES, threshold=0.5).collect()
    }
    assert got == want


def test_keep_farthest_from_centroid(spark, emb):
    """The SemDeDup keep rule: within a dup component, survive the member
    with the LARGEST centroid distance (most marginal information)."""
    pairs = semantic_dedup_pairs(emb, centroids=AXES, threshold=0.9)
    comps = connected_components(
        pairs, emb, id_col="vec_id", pair_cols=("id_a", "id_b")
    )
    aff = centroid_affinity(emb, AXES, id_col="vec_id")
    kept = keep_best_per_component(
        comps, aff.select("vec_id", "centroid_dist"),
        id_col="vec_id", score_col="centroid_dist",
    )
    verdict = {r["vec_id"]: r["keep"] for r in kept.collect()}
    # a3 has the largest angle to e0 within cluster 0 -> it survives
    assert verdict["a3"] and not verdict["a1"] and not verdict["a2"]
    # b-cluster: b1 (0.02 off-axis) is farther from e1 than b2
    assert verdict["b1"] and not verdict["b2"]
    # singleton survives untouched
    assert verdict["c1"]


def test_centroid_affinity_values(spark, emb):
    rows = {r["vec_id"]: r for r in centroid_affinity(
        emb, AXES, id_col="vec_id").collect()}
    assert rows["c1"]["cluster"] == 2
    assert rows["c1"]["centroid_cos"] == pytest.approx(1.0)
    assert rows["c1"]["centroid_dist"] == pytest.approx(0.0)
    # a3: cos = 1 / sqrt(1 + 0.09)
    assert rows["a3"]["centroid_cos"] == pytest.approx(
        1.0 / np.sqrt(1.09), abs=1e-6
    )


def test_max_cluster_size_fails_loudly(spark, emb):
    with pytest.raises(Exception, match="max_cluster_size"):
        semantic_dedup_pairs(
            emb, centroids=AXES, threshold=0.9, max_cluster_size=2
        ).collect()


def test_zero_vector_and_fitted_centroids(spark):
    """Zero vectors stay inert (cosine 0 to everything, no NaN), and the
    centroids=None path (sampled k-means fit) produces a runnable plan."""
    rows = [(f"v{i}", [float(i % 3 == 0), float(i % 3 == 1), float(i % 3 == 2), 0.0])
            for i in range(30)] + [("z", [0.0, 0.0, 0.0, 0.0])]
    spark_df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    out = semantic_dedup_pairs(
        spark_df, n_clusters=3, threshold=0.9, seed=1
    ).collect()
    ids = {r["id_a"] for r in out} | {r["id_b"] for r in out}
    assert "z" not in ids  # zero vector pairs with nothing
    assert len(out) > 0  # the replicated basis vectors do pair up
