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


def test_f32_prefilter_boundary_pairs_survive(spark):
    """r12 float32-prefilter boundary contract: a true cosine BELOW the
    threshold that ROUNDS up to it must still be emitted (the f32
    prefilter may score it under the threshold, but never under
    threshold - margin), and a cosine that rounds just below must not.
    Both cases sit within float32 noise of the boundary — exactly the
    regime the margin exists for."""
    thr, r = 0.9, 6

    def pair(c):
        # unit vectors at exact cosine c (float64)
        return [1.0, 0.0, 0.0, 0.0], [c, float(np.sqrt(1 - c * c)), 0.0, 0.0]

    keep_c = 0.8999996  # rounds to 0.900000 >= thr -> kept
    drop_c = 0.8999993  # rounds to 0.899999 <  thr -> dropped
    va, vb = pair(keep_c)
    vc, vd = pair(drop_c)
    emb = spark.createDataFrame(
        [("k1", va), ("k2", vb), ("d1", [0.0, 0.0, 1.0, 0.0]), ("d2", [0.0, float(np.sqrt(1 - drop_c**2)), drop_c, 0.0])],
        "vec_id string, embedding array<double>",
    )
    # one cluster so every pair is scanned; centroids on e0/e2 split them
    out = semantic_dedup_pairs(
        emb, centroids=np.eye(1, 4), threshold=thr, round_to=r,
        max_cluster_size=10,
    ).collect()
    got = {(x["id_a"], x["id_b"]): x["cosine"] for x in out}
    assert ("k1", "k2") in got, got
    assert got[("k1", "k2")] == pytest.approx(0.9, abs=1e-12)
    assert ("d1", "d2") not in got, got


def test_f32_prefilter_randomized_parity_vs_f64_bruteforce(spark):
    """Randomized parity: operator pairs == float64 brute force with the
    identical round/threshold rule, at a threshold slicing through the
    cosine distribution (so the prefilter margin is exercised on both
    sides across many near-boundary values)."""
    rng = np.random.default_rng(7)
    n, d = 240, 16
    base = rng.standard_normal((8, d))
    vecs = base[rng.integers(0, 8, n)] + 0.35 * rng.standard_normal((n, d))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    thr, r = 0.8, 6
    emb = spark.createDataFrame(
        [(f"v{i:03d}", [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id string, embedding array<double>",
    )
    out = semantic_dedup_pairs(
        emb, centroids=np.eye(1, d), threshold=thr, round_to=r,
        max_cluster_size=n + 1,
    ).collect()
    got = {(x["id_a"], x["id_b"]): x["cosine"] for x in out}
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    scores = np.round(unit @ unit.T, r)
    want = {}
    ids = [f"v{i:03d}" for i in range(n)]
    for i in range(n):
        for j in range(n):
            if ids[i] < ids[j] and scores[i, j] >= thr:
                want[(ids[i], ids[j])] = scores[i, j]
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=0.0), k
