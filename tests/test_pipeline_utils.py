"""Pipeline-utility operator tests: dataset split (determinism,
proportions), sequence packing (budget invariant, no chunk split),
PII scan (detection on synthetic positives)."""

import pytest
from pyspark.sql import functions as F

from picovdb_spark.operators.chunking import chunk_documents
from picovdb_spark.operators.textops import dataset_split, pack_sequences, pii_scan


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from picovdb_spark.schema import load_table

    return load_table(spark, sf_dir, "documents")


def test_split_deterministic_and_proportional(spark, docs):
    a = {r["doc_id"]: r["split"] for r in dataset_split(docs).collect()}
    b = {r["doc_id"]: r["split"] for r in dataset_split(docs).collect()}
    assert a == b  # no RNG, stable across runs
    n = len(a)
    train = sum(1 for v in a.values() if v == "train")
    assert train / n > 0.9  # 98% nominal
    assert set(a.values()) <= {"train", "val", "test"}
    # different salt ⇒ different assignment (independent re-split)
    c = {r["doc_id"]: r["split"] for r in dataset_split(docs, salt="v2").collect()}
    assert c != a


def test_split_custom_weights(spark, docs):
    out = dataset_split(docs, weights={"a": 0.5, "b": 0.5}).collect()
    counts = {}
    for r in out:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    assert set(counts) == {"a", "b"}
    assert abs(counts["a"] - counts["b"]) < 0.3 * len(out)


def test_packing_budget_invariant(spark, docs):
    chunks = chunk_documents(docs, chunk_tokens=64, overlap=16).drop("chunk_text")

    # greedy (default): a bin NEVER exceeds the budget (all chunks ≤ 64 < 256)
    packed = pack_sequences(chunks, max_tokens=256)
    bins = (
        packed.groupBy("pack_group", "bin_idx")
        .agg(F.sum("n_tokens").alias("tot"), F.count("*").alias("n"))
        .collect()
    )
    assert all(b["tot"] <= 256 for b in bins)

    # prefix (oracle shape): may exceed by less than one chunk
    prefix = pack_sequences(chunks, max_tokens=256, strategy="prefix")
    pbins = prefix.groupBy("pack_group", "bin_idx").agg(F.sum("n_tokens").alias("tot")).collect()
    assert all(b["tot"] <= 256 + 64 for b in pbins)

    # chunks are never split: total tokens conserved
    assert packed.agg(F.sum("n_tokens")).first()[0] == chunks.agg(F.sum("n_tokens")).first()[0]
    # deterministic
    again = pack_sequences(chunks, max_tokens=256)
    key = lambda r: (r["doc_id"], r["chunk_idx"])  # noqa: E731
    assert sorted(map(lambda r: (key(r), r["bin_idx"]), packed.collect())) == sorted(
        map(lambda r: (key(r), r["bin_idx"]), again.collect())
    )


def test_packing_oversize_chunk_gets_own_bin(spark):
    df = spark.createDataFrame(
        [(1, 0, 100), (1, 1, 300), (1, 2, 100)],
        schema="doc_id long, chunk_idx long, n_tokens long",
    )
    packed = {r["chunk_idx"]: r["bin_idx"] for r in
              pack_sequences(df, max_tokens=256).collect()}
    # 100 → bin0; 300 can't join (100+300>256) → bin1 alone; 100 → bin2
    assert packed[0] == 0 and packed[1] == 1 and packed[2] == 2


def test_pii_scan_detects(spark):
    df = spark.createDataFrame(
        [
            (1, "contact me at alice@example.com or 555-123-4567 today"),
            (2, "ssn 123-45-6789 leaked from 192.168.0.1"),
            (3, "perfectly clean text with no identifiers"),
        ],
        schema="doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pii_scan(df).collect()}
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 1 and out[1]["has_pii"]
    assert out[2]["n_ssn"] == 1 and out[2]["n_ipv4"] == 1 and out[2]["has_pii"]
    assert out[3]["n_pii"] == 0 and not out[3]["has_pii"]


def test_salted_agg_count_null_semantics(spark):
    """count(col) must count NON-NULL values, matching plain groupBy."""
    from picovdb_spark.operators.skew import salted_agg

    df = spark.createDataFrame(
        [("k1", None), ("k1", 5.0), ("k2", 1.0)], schema="k string, v double"
    )
    got = {r["k"]: r["n"] for r in salted_agg(df, ["k"], {"n": ("v", "count")}).collect()}
    want = {r["k"]: r["n"] for r in df.groupBy("k").agg(F.count("v").alias("n")).collect()}
    assert got == want == {"k1": 1, "k2": 1}


def test_grouped_split_is_leakage_safe(spark):
    rows = [(i, f"dom{i % 5}") for i in range(200)] + [(900, None)]
    docs = spark.createDataFrame(rows, "doc_id long, url_domain string")
    out = dataset_split(docs, group_col="url_domain", salt="g1")
    rows_out = docs.join(out, "doc_id").collect()
    by_dom = {}
    for r in rows_out:
        if r["url_domain"] is not None:
            by_dom.setdefault(r["url_domain"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_dom.values()), "a group never straddles splits"
    # NULL group falls back to the id hash (doesn't crash, gets a split)
    assert any(r["doc_id"] == 900 and r["split"] in ("train", "val", "test") for r in rows_out)
    # deterministic
    again = {r["doc_id"]: r["split"] for r in dataset_split(docs, group_col="url_domain", salt="g1").collect()}
    assert all(again[r["doc_id"]] == r["split"] for r in rows_out)


def test_packing_stats_rollup(spark):
    from picovdb_spark.operators.textops import packing_stats

    rows = [("d%d" % i, 0, 10, "train") for i in range(10)] + [("big", 0, 40, "val")]
    chunks = spark.createDataFrame(
        rows, "doc_id string, chunk_idx int, n_tokens int, split string"
    )
    packed = pack_sequences(chunks, max_tokens=25, group_cols=("split",))
    stats = {r["split"]: r for r in packing_stats(
        packed, 25, group_cols=("split",)
    ).collect()}
    tr = stats["train"]
    assert tr["n_chunks"] == 10 and tr["total_tokens"] == 100
    assert tr["overflow_bins"] == 0
    assert 0 < tr["fill_rate"] <= 1.0
    va = stats["val"]
    assert va["n_bins"] == 1 and va["overflow_bins"] == 1  # single 40-token chunk
    assert va["fill_rate"] == 1.6


def test_merge_and_model_round_trip(spark, tmp_path):
    from picovdb_spark.operators.classifier import (
        hashed_features, load_model, logreg_fit, logreg_score, save_model,
    )
    from picovdb_spark.operators.tokenizer import bpe_train, load_merges, save_merges

    docs = spark.createDataFrame(
        [(1, "good words here fine text", 1), (2, "spam spam spam spam", 0)] * 3,
        "doc_id long, text string, label int",
    ).withColumn("doc_id", F.monotonically_increasing_id())
    merges = bpe_train(docs, 20, min_count=1)
    p = str(tmp_path / "merges.json")
    save_merges(merges, p)
    assert load_merges(p) == merges
    import pytest as _pt
    bad = str(tmp_path / "bad.json")
    open(bad, "w").write('[["a","b"],["x"]]')
    with _pt.raises(ValueError, match="rank 1"):
        load_merges(bad)

    model = logreg_fit(docs, label_col="label", n_features=128, n_iter=5, lr=1.0)
    mp = str(tmp_path / "model")
    save_model(model, mp)
    back = load_model(spark, mp)
    assert back["bias"] == model["bias"] and back["n_features"] == model["n_features"]
    feats = hashed_features(docs, n_features=128)
    a = sorted(map(tuple, logreg_score(feats, model["weights"], bias=model["bias"]).collect()))
    b = sorted(map(tuple, logreg_score(feats, back["weights"], bias=back["bias"]).collect()))
    assert a == b
