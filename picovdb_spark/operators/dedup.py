"""Deduplication operators for large-scale training-data pipelines.

The reference's only dedup is content-hash auto-id on ingest
(/root/reference/picovdb/pico_vdb.py:54-55,424-426 — identical vectors
collapse to one id). These operators generalize that to the standard
LLM-corpus dedup ladder, each designed Spark-first:

- exact_dedup            — hash-groupBy, one shuffle on the text hash
- minhash_lsh_pairs      — shingle → minhash → band → bucket-join →
                           verify: the scalable near-dup path; the
                           candidate join shuffles on band buckets only
- ngram_jaccard_pairs    — exact all-pairs Jaccard (the brute-force
                           oracle/baseline; O(n²), small-n or per-bucket)
- simhash_pairs          — simhash + pigeonhole block join + Hamming
                           verify (guaranteed recall at the threshold)
- embedding_near_dup     — cosine-threshold self-join over embeddings

All hashes are md5-derived (functions/text.py) so every operator has a
bit-identical DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from picovdb_spark.functions.text import (
    band_value,
    jaccard,
    md5_hash48,
    minhash_signature,
    tokens,
    word_shingles,
)
from picovdb_spark.functions.vector import dot, l2_normalize


def exact_dedup(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup by content hash: every doc maps to the smallest id
    sharing its md5(text). Output (doc_id, canonical_id, is_dup).

    One hash-shuffle on the 128-bit digest; at 100 TB this is the classic
    map-side-combine groupBy — no row ever carries the full text through
    the shuffle, only (digest, id)."""
    hashed = docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("__h"))
    w = Window.partitionBy("__h")
    return (
        hashed.withColumn("canonical_id", F.min(id_col).over(w))
        .withColumn("is_dup", F.col(id_col) != F.col("canonical_id"))
        .select(id_col, "canonical_id", "is_dup")
    )


def _shingled(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    return docs.select(F.col(id_col), word_shingles(F.col(text_col), n).alias("sh"))


def minhash_lsh_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding.

    Pipeline: distinct word-n-gram shingles per doc → 16 md5-minhashes →
    4 bands of 4 → docs sharing any band bucket become candidates →
    exact Jaccard verification ≥ threshold.

    Scale shape: signatures are one narrow row per doc; the candidate
    join shuffles on (band_idx, band_hash) — never on text. Verification
    re-joins the shingle arrays only for candidate pairs (a vanishing
    fraction). A skewed bucket (boilerplate shingles) is handled by AQE
    skew-join; `bands`/`num_hashes` trade recall for bucket size exactly
    like the reference's ef_search trades recall for scan cost.
    """
    rows = num_hashes // bands
    sh = _shingled(docs, id_col, text_col, shingle_n).cache()
    sigs = sh.select(F.col(id_col), *minhash_signature(F.col("sh"), num_hashes))
    band_rows = None
    for b in range(bands):
        cols = [F.col(f"mh{b * rows + r}") for r in range(rows)]
        one = sigs.select(
            F.col(id_col), F.lit(b).alias("band_idx"), band_value(cols).alias("band")
        )
        band_rows = one if band_rows is None else band_rows.unionByName(one)
    a = band_rows.select(F.col(id_col).alias("id_a"), "band_idx", "band")
    b_ = band_rows.select(F.col(id_col).alias("id_b"), "band_idx", "band")
    cand = (
        a.join(b_, on=["band_idx", "band"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sh_a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn("jaccard", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), round_to))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """Exact all-pairs word-n-gram Jaccard ≥ threshold — the brute-force
    baseline that LSH approximates. O(n²): use on bounded inputs or as
    the per-bucket verifier. The self cross-join broadcasts one side."""
    sh = _shingled(docs, id_col, text_col, shingle_n)
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), round_to))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    bits: int = 48,
) -> DataFrame:
    """48-bit SimHash over word-shingle multisets → (id, simhash).

    Explode shingles → per (doc, bit) signed vote (+1 if the shingle's
    md5-derived bit is set, else -1) → bit set iff vote sum > 0.
    Shuffle is on doc_id with map-side partial aggregation; the 48-way
    bit explode stays inside the row before the shuffle."""
    sh = docs.select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), shingle_n)).alias("s"),
    ).withColumn("h", md5_hash48(F.col("s")))
    votes = sh.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"),
        F.col("h"),
    ).withColumn(
        # (h >> b) & 1 with a Column shift count: exact double scaling —
        # h < 2^48 and 2^b are exactly representable, floor is exact.
        "vote",
        F.when(
            F.floor(F.col("h") / F.pow(F.lit(2.0), F.col("b"))).cast("long") % 2 == 1, 1
        ).otherwise(-1),
    )
    bitsum = votes.groupBy(id_col, "b").agg(F.sum("vote").alias("v"))
    return bitsum.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("v") > 0, F.pow(F.lit(2.0), F.col("b")).cast("long")).otherwise(F.lit(0))
        ).alias("simhash")
    )


def simhash_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    bits: int = 48,
    max_hamming: int = 7,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming.

    Block join with guaranteed recall: split the fingerprint into
    (max_hamming+1) blocks — two fingerprints within the threshold must
    agree on at least one whole block (pigeonhole), so joining per block
    finds every qualifying pair; Hamming is then verified exactly."""
    blocks = max_hamming + 1
    block_bits = bits // blocks  # 48 bits / 8 blocks = 6-bit blocks
    sh = simhash(docs, id_col=id_col, text_col=text_col, shingle_n=shingle_n, bits=bits)
    block_rows = None
    for i in range(blocks):
        one = sh.select(
            F.col(id_col),
            F.col("simhash"),
            F.lit(i).alias("block_idx"),
            F.shiftright(F.col("simhash"), i * block_bits)
            .bitwiseAND(F.lit((1 << block_bits) - 1))
            .alias("block"),
        )
        block_rows = one if block_rows is None else block_rows.unionByName(one)
    a = block_rows.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "block_idx", "block"
    )
    b = block_rows.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "block_idx", "block"
    )
    return (
        a.join(b, on=["block_idx", "block"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def embedding_near_dup(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    round_to: int = 6,
) -> DataFrame:
    """Pairs with cosine ≥ threshold — embedding-space near-dup detection.

    Brute-force O(n²) dot products; the scale path pre-buckets with
    random-hyperplane LSH (operators/ann.py) and runs this per bucket."""
    n = emb.select(
        F.col(id_col).alias("id"),
        l2_normalize(F.col(vec_col)).alias("v"),
    )
    a = n.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    b = n.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(dot(F.col("va"), F.col("vb")), round_to))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
