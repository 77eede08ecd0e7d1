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
