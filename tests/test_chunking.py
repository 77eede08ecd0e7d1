"""Chunking operator semantics: coverage (every token in ≥1 chunk),
overlap (consecutive chunks share exactly `overlap` tokens on full
windows), short-doc and empty-doc edges."""

import pytest
from pyspark.sql import functions as F

from picovdb_spark.operators.chunking import chunk_documents


@pytest.fixture(scope="module")
def docs(spark):
    words = " ".join(f"w{i}" for i in range(150))
    short = "a b c"
    return spark.createDataFrame(
        [(1, words), (2, short), (3, "")], schema="doc_id long, text string"
    )


def test_coverage_and_overlap(spark, docs):
    out = chunk_documents(docs, chunk_tokens=64, overlap=16)
    rows = sorted(
        (r for r in out.collect() if r["doc_id"] == 1), key=lambda r: r["chunk_idx"]
    )
    # 150 tokens, stride 48 → ceil((150-64)/48)+1 = 3 chunks
    assert [r["chunk_idx"] for r in rows] == [0, 1, 2]
    assert rows[0]["n_tokens"] == 64 and rows[1]["n_tokens"] == 64
    assert rows[2]["n_tokens"] == 150 - 2 * 48  # tail partial window
    # every source token appears
    seen = set()
    for r in rows:
        seen.update(r["chunk_text"].split(" "))
    assert seen == {f"w{i}" for i in range(150)}
    # consecutive chunks overlap by exactly 16 tokens
    c0, c1 = rows[0]["chunk_text"].split(" "), rows[1]["chunk_text"].split(" ")
    assert c0[-16:] == c1[:16]


def test_short_and_empty_docs(spark, docs):
    out = {r["doc_id"]: r for r in chunk_documents(docs, chunk_tokens=64, overlap=16).collect()
           if r["doc_id"] != 1}
    assert out[2]["chunk_idx"] == 0 and out[2]["chunk_text"] == "a b c" and out[2]["n_tokens"] == 3
    assert out[3]["chunk_idx"] == 0 and out[3]["n_tokens"] == 0


def test_invalid_overlap_raises(docs):
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_tokens=32, overlap=32)


def test_no_shuffle(spark, docs):
    from picovdb_spark.plans import explain_str

    plan = explain_str(chunk_documents(docs, chunk_tokens=64, overlap=16))
    assert "Exchange" not in plan  # flatMap shape: zero shuffle


def test_embed_chunks_deterministic_and_consistent(spark, docs):
    """Kernel and driver-side twin produce identical embeddings."""
    from picovdb_spark.operators.chunking import chunk_documents
    from picovdb_spark.operators.embedding import embed_chunks, hash_embed_text

    chunks = chunk_documents(docs, chunk_tokens=64, overlap=16)
    emb = embed_chunks(chunks, dim=16, keep_cols=["doc_id", "chunk_idx"])
    rows = {(r["doc_id"], r["chunk_idx"]): r["embedding"] for r in emb.collect()}
    texts = {(r["doc_id"], r["chunk_idx"]): r["chunk_text"] for r in chunks.collect()}
    assert set(rows) == set(texts)
    for k, v in rows.items():
        assert v == hash_embed_text(texts[k], dim=16)
    # token count conserved into the bag-of-hashed-words mass
    for k, v in rows.items():
        assert sum(v) == len([t for t in texts[k].lower().split(" ") if t])
