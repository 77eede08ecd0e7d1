"""Document chunking — the ingestion front-end of an embedding pipeline
(text → fixed-size overlapping token windows → one row per chunk, ready
for an embedding model and `VectorStore.upsert`).

Not present in the reference (it ingests pre-embedded vectors,
pico_vdb.py:403-498); part of the SURVEY.md §7.4 scale-out extensions.
Chunking is a pure per-row flatMap — no shuffle; output rows carry
(doc_id, chunk_idx) so downstream dedup/embedding joins have a stable
composite key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from picovdb_spark.functions.text import tokens


def chunk_documents(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    carry_cols: tuple[str, ...] = (),
    chunk_tokens: int = 64,
    overlap: int = 16,
    as_tokens: bool = False,
) -> DataFrame:
    """Split each document into windows of `chunk_tokens` tokens with
    `overlap` tokens of context carried between consecutive chunks
    (stride = chunk_tokens - overlap). The final partial window is kept.

    Output: (doc_id, *carry_cols, chunk_idx, chunk_text, n_tokens) —
    chunk_idx is 0-based; every token of the source appears in at least
    one chunk. `tokens_col` (optional) chunks a pre-tokenized
    array<string> column instead of whitespace-splitting `text_col` —
    the BPE path, where the window budget is model tokens, not words.
    `carry_cols` ride along per chunk (e.g. the dataset split) so
    downstream stages don't need an extra join back to the document
    table.

    `as_tokens=True` replaces the space-joined `chunk_text` rendering
    with a LOSSLESS `chunk_toks` array<string> column (the exact token
    slice). Use it whenever the tokens themselves are the payload — a
    BPE pipeline whose vocab contains space-bearing or empty-string
    tokens cannot round-trip through `chunk_text` (splitting it back on
    ' ' merges/loses tokens), while `chunk_toks` is the slice itself.
    The default rendering is kept for display/embedding-text consumers
    where a flat string is the contract.

    Pure Catalyst: tokens → sequence of window starts → transform+slice →
    posexplode. Stays inside whole-stage codegen; no Python, no shuffle.
    """
    if overlap >= chunk_tokens:
        raise ValueError(f"overlap ({overlap}) must be < chunk_tokens ({chunk_tokens})")
    stride = chunk_tokens - overlap
    t = F.col(tokens_col) if tokens_col is not None else tokens(F.col(text_col))
    # window starts: 1, 1+stride, 1+2*stride, … while start <= len
    # (1-based; a doc shorter than one chunk yields exactly one window)
    n_windows = F.greatest(
        F.ceil((F.size(t) - F.lit(chunk_tokens)) / F.lit(stride)).cast("int") + 1, F.lit(1)
    )
    starts = F.sequence(F.lit(0), n_windows - 1)
    # n_tokens comes from the SLICE SIZE, not from re-splitting
    # chunk_text on ' ' — a re-split undercounts/overcounts whenever a
    # caller's `tokens_col` tokens contain spaces or empty strings (the
    # public API doesn't forbid either). The default chunk_text is the
    # space-joined rendering; it round-trips back to the token slice
    # only when tokens are space-free and non-empty (true for this
    # package's `tokens()` and BPE vocab) — callers with space-bearing
    # tokens pass `as_tokens=True` for the lossless slice column.
    chunks = F.transform(starts, lambda w: F.slice(t, w * stride + 1, chunk_tokens))
    out = docs.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        F.posexplode(chunks).alias("chunk_idx", "__chunk_toks"),
    )
    payload = (
        F.col("__chunk_toks").alias("chunk_toks")
        if as_tokens
        else F.concat_ws(" ", "__chunk_toks").alias("chunk_text")
    )
    return out.select(
        "*",
        payload,
        F.size("__chunk_toks").cast("int").alias("n_tokens"),
    ).drop("__chunk_toks")
