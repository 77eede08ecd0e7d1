"""Drop-in compatibility: the reference's own usage patterns (from
/root/reference/tests/test_pico_vdb.py and test_task34_prefilter.py,
re-written against our PicoVectorDB) must work unchanged — same method
names, same dict shapes, same result ordering."""

import numpy as np
import pytest

from picovdb_spark.compat import PicoVectorDB


@pytest.fixture()
def db(spark, tmp_path):
    return PicoVectorDB(
        embedding_dim=4,
        storage_file=str(tmp_path / "db"),
        no_faiss=True,  # exact path for deterministic assertions
        spark=spark,
    )


def test_upsert_query_roundtrip(db):
    report = db.upsert(
        [
            {"_id_": "a", "_vector_": [1.0, 0.0, 0.0, 0.0], "cat": "x"},
            {"_id_": "b", "_vector_": [0.0, 1.0, 0.0, 0.0], "cat": "y"},
            {"_id_": "c", "_vector_": [0.9, 0.1, 0.0, 0.0], "cat": "x"},
        ]
    )
    assert sorted(report["insert"]) == ["a", "b", "c"] and report["update"] == []

    hits = db.query_one([1.0, 0.0, 0.0, 0.0], top_k=2)
    assert [h["_id_"] for h in hits] == ["a", "c"]
    assert hits[0]["_metrics_"] == pytest.approx(1.0)
    assert hits[0]["cat"] == "x"  # metadata rides along

    # update report on re-upsert
    report2 = db.upsert([{"_id_": "a", "_vector_": [0.0, 0.0, 1.0, 0.0], "cat": "x2"}])
    assert report2["update"] == ["a"] and report2["insert"] == []


def test_batch_query_shapes(db):
    db.upsert([{"_id_": str(i), "_vector_": np.eye(4)[i % 4].tolist()} for i in range(8)])
    batch = db.query(np.eye(4, dtype=np.float32), top_k=3)
    assert isinstance(batch, list) and len(batch) == 4
    assert all(len(b) == 3 for b in batch)
    single = db.query(np.asarray([1.0, 0.0, 0.0, 0.0], dtype=np.float32), top_k=3)
    assert isinstance(single[0], dict)  # 1-D input unwraps (pico_vdb.py:751)


def test_where_ids_better_than(db):
    db.upsert(
        [
            {"_id_": str(i), "_vector_": [1.0, float(i) / 10, 0.0, 0.0], "keep": i % 2 == 0}
            for i in range(10)
        ]
    )
    only_keep = db.query_one([1.0, 0.0, 0.0, 0.0], top_k=10, where={"keep": True})
    assert len(only_keep) == 5 and all(h["keep"] for h in only_keep)
    lam = db.query_one([1.0, 0.0, 0.0, 0.0], top_k=10, where=lambda d: d["keep"])
    assert [h["_id_"] for h in lam] == [h["_id_"] for h in only_keep]  # dict == callable
    subset = db.query_one([1.0, 0.0, 0.0, 0.0], top_k=10, ids=["1", "2", "3"])
    assert {h["_id_"] for h in subset} == {"1", "2", "3"}
    bt = db.query_one([1.0, 0.0, 0.0, 0.0], top_k=10, better_than=0.999)
    assert all(h["_metrics_"] >= 0.999 for h in bt)


def test_get_and_get_all(db):
    db.upsert([{"_id_": "a", "_vector_": [1.0, 0.0, 0.0, 0.0], "m": 1}])
    rec = db.get("a")
    assert rec["m"] == 1 and "_vector_" not in rec
    recv = db.get("a", include_vector=True)
    assert isinstance(recv["_vector_"], np.ndarray) and recv["_vector_"].dtype == np.float32
    assert db.get("missing") is None
    assert db.get(["missing", "a"]) and len(db.get(["missing", "a"])) == 1
    assert len(db.get_all()) == 1


def test_delete_count_vacuum_len(db):
    db.upsert([{"_id_": str(i), "_vector_": [1.0, 0.0, 0.0, float(i)]} for i in range(5)])
    assert db.delete(["0", "nope"]) == ["0"]
    assert db.count() == 4 and len(db) == 4
    assert db.capacity() == 5  # tombstone still occupies a slot
    assert db.vacuum() == 1
    assert db.capacity() == 4


def test_save_load_reference_format(spark, tmp_path):
    base = str(tmp_path / "interop")
    db = PicoVectorDB(embedding_dim=4, storage_file=base, no_faiss=True, spark=spark)
    db.upsert([{"_id_": "a", "_vector_": [1.0, 0.0, 0.0, 0.0], "cat": "x"}])
    db.store_additional_data(run="r1")
    db.save()

    # open-or-load semantics: a fresh instance sees the saved store
    db2 = PicoVectorDB(embedding_dim=4, storage_file=base, no_faiss=True, spark=spark)
    assert db2.count() == 1
    assert db2.get("a")["cat"] == "x"
    assert db2.get_additional_data() == {"run": "r1"}
    hits = db2.query_one([1.0, 0.0, 0.0, 0.0], top_k=1)
    assert hits[0]["_id_"] == "a"


def test_ann_path_returns_metadata(spark, tmp_path):
    db = PicoVectorDB(embedding_dim=8, storage_file=str(tmp_path / "ann"), spark=spark)
    rng = np.random.default_rng(0)
    db.upsert(
        [{"_id_": str(i), "_vector_": rng.standard_normal(8).tolist(), "g": i % 3}
         for i in range(100)]
    )
    hits = db.query_one(rng.standard_normal(8).tolist(), top_k=5)  # no filters ⇒ ANN route
    assert len(hits) == 5 and all("g" in h and "_metrics_" in h for h in hits)


def test_dim_and_metric_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="cosine"):
        PicoVectorDB(embedding_dim=4, metric="l2", spark=spark)
    db = PicoVectorDB(embedding_dim=4, storage_file=str(tmp_path / "v"), no_faiss=True, spark=spark)
    with pytest.raises(ValueError, match=r"\(n, 4\)"):
        db.query(np.zeros((2, 7), dtype=np.float32))


def test_query_and_get_strip_absent_metadata_keys(spark, tmp_path):
    """Dicts from query()/get() contain ONLY the keys stored with that
    doc — schemaless columns absent on a doc must not surface as None
    (matches reference dict-out and get_all()'s existing behavior)."""
    db = PicoVectorDB(embedding_dim=4, spark=spark)
    db.upsert(
        [
            {"_id_": "with-tag", "_vector_": [1.0, 0, 0, 0], "tag": "x"},
            {"_id_": "plain", "_vector_": [0, 1.0, 0, 0]},
        ]
    )
    hits = db.query([0, 1.0, 0, 0], top_k=2)
    plain = next(h for h in hits if h["_id_"] == "plain")
    assert "tag" not in plain
    tagged = next(h for h in hits if h["_id_"] == "with-tag")
    assert tagged["tag"] == "x"
    rec = db.get("plain")
    assert rec is not None and "tag" not in rec
    recs = db.get(["with-tag", "plain"])
    assert "tag" in recs[0] and "tag" not in recs[1]


def test_ef_search_tunes_recall(spark, tmp_path, monkeypatch):
    """Per-call `ef_search`/`hnsw_ef_search` are honored, not swallowed
    (the reference honors per-call efSearch, pico_vdb.py:716-730): they
    map monotonically onto the IVF probe width (nprobe = ceil(ef/4),
    anchored so the reference's default HNSW_EFS=32 maps to the engine
    default nprobe=8 — compat.py), so a larger ef widens the scan:
    recall@10 at high ef must be >= recall at low ef, and an ef
    covering every centroid is the exact answer."""
    rng = np.random.default_rng(7)
    dim, n = 32, 1500
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    db = PicoVectorDB(
        embedding_dim=dim, storage_file=str(tmp_path / "annq"), spark=spark
    )
    db.upsert([{"_id_": str(i), "_vector_": vecs[i].tolist()} for i in range(n)])
    qs = (
        vecs[:16] + rng.standard_normal((16, dim)).astype(np.float32) * 0.05
    ).astype(np.float32)

    # wiring: the forwarded nprobe must be ceil(ef/4) per call
    seen = []
    orig = db.store.query

    def spy(*a, **k):
        seen.append(k.get("nprobe"))
        return orig(*a, **k)

    monkeypatch.setattr(db.store, "query", spy)

    # ground truth: the exact scan (store.query without ann)
    exact_rows = orig(qs, top_k=10).collect()
    truth = {}
    for r in exact_rows:
        truth.setdefault(int(r["query_id"]), set()).add(r["_id_"])

    def recall(res_lists):
        tot = 0.0
        for qi, hits in enumerate(res_lists):
            got = {h["_id_"] for h in hits}
            tot += len(got & truth[qi]) / max(len(truth[qi]), 1)
        return tot / len(res_lists)

    low = db.query(qs, top_k=10, ef_search=4)  # nprobe 1
    high = db.query(qs, top_k=10, hnsw_ef_search=256)  # nprobe 64 = all
    # the reference's own default efSearch must be a no-op: HNSW_EFS=32
    # → the engine default nprobe=8 (explicit default == omitted)
    db.query(qs[:1], top_k=10, ef_search=32)
    assert seen == [1, 64, 8], f"ef_search not wired through: {seen}"
    r_low, r_high = recall(low), recall(high)
    assert r_high >= r_low, f"wider probe lost recall: {r_low} -> {r_high}"
    # every centroid probed == the exact answer
    assert r_high == pytest.approx(1.0)
