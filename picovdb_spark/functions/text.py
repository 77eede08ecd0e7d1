"""Text kernels for the LLM-data-pipeline operators (dedup, analysis).

All kernels are Catalyst array/string expressions (JVM-side, codegen).
Cross-engine determinism rule: every hash is derived from `md5` (present
in both Spark and DuckDB) — a 32-bit value is the first 8 hex chars, a
48-bit value the first 12, parsed as an integer. This keeps each
operator's DuckDB oracle bit-identical to the engine.

The `documents` testdata is lowercase space-separated words (verified:
no other characters), so tokenization is an exact split on ' '; the
regex fallback is provided for general text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tokens a BPE-ish tokenizer would produce: runs of letters, runs of
# digits, or single non-space symbols.
BPE_TOKEN_RE = "[a-z]+|[A-Z][a-z]*|[0-9]+|[^A-Za-z0-9\\s]"

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "zu", "ein"],
    "es": ["el", "la", "de", "que", "y", "en", "un"],
    "fr": ["le", "la", "de", "et", "un", "une", "est"],
    "zh": ["de", "le", "shi", "zai", "he", "you"],
}


def tokens(text: Column) -> Column:
    """Split lowercase text on single spaces, dropping empties."""
    return F.filter(F.split(F.lower(text), " "), lambda t: t != "")


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams joined by ' ' — the dedup shingle unit."""
    t = tokens(text)
    idx = F.when(F.size(t) >= n, F.sequence(F.lit(1), F.size(t) - (n - 1))).otherwise(
        F.array().cast("array<int>")
    )
    parts = lambda i: [F.element_at(t, (i + j).cast("int")) for j in range(n)]  # noqa: E731
    return F.array_distinct(F.transform(idx, lambda i: F.concat_ws(" ", *parts(i))))


def char_shingles(text: Column, n: int = 5) -> Column:
    """Distinct character n-grams."""
    ln = F.length(text)
    idx = F.when(ln >= n, F.sequence(F.lit(1), ln - (n - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(F.transform(idx, lambda i: F.substr(text, i, F.lit(n))))


def md5_hash32(s: Column) -> Column:
    """First 8 md5 hex chars as a long in [0, 2^32)."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def md5_hash48(s: Column) -> Column:
    """First 12 md5 hex chars as a long in [0, 2^48)."""
    return F.conv(F.substring(F.md5(s), 1, 12), 16, 10).cast("long")


def minhash_signature(shingles: Column, num_hashes: int = 16) -> list[Column]:
    """MinHash signature: for each seed i, min over shingles of
    md5_hash32(i || ':' || shingle). Empty shingle set ⇒ null."""
    return [
        F.array_min(
            F.transform(shingles, lambda s, i=i: md5_hash32(F.concat(F.lit(f"{i}:"), s)))
        ).alias(f"mh{i}")
        for i in range(num_hashes)
    ]


def band_value(sig_cols: list[Column]) -> Column:
    """LSH band bucket id: md5 over the band's signature slice."""
    return F.md5(F.concat_ws(",", *[c.cast("string") for c in sig_cols]))


def jaccard(a: Column, b: Column) -> Column:
    """|A∩B| / |A∪B| over distinct-element arrays, in double."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)


# ------------------------------------------------------- DuckDB oracle twins

def duck_tokens(text_expr: str) -> str:
    return f"list_filter(string_split(lower({text_expr}), ' '), t -> t <> '')"


def duck_word_shingles(text_expr: str, n: int = 3) -> str:
    toks = duck_tokens(text_expr)
    parts = " || ' ' || ".join(f"__t[i+{j}]" for j in range(n))
    return (
        f"(SELECT list_distinct(list_transform(range(1, greatest(len(__t) - {n - 2}, 1)), "
        f"i -> {parts})) FROM (SELECT {toks} AS __t) __sub)"
    )


def duck_hash32(s_expr: str) -> str:
    return f"('0x' || substr(md5({s_expr}), 1, 8))::BIGINT"


def duck_hash48(s_expr: str) -> str:
    return f"('0x' || substr(md5({s_expr}), 1, 12))::BIGINT"
