"""Deterministic text embedding — the stand-in for a model forward pass
that makes the WHOLE retrieval pipeline (chunk → embed → store → query)
exactly reproducible in any engine, hence oracle-checkable end-to-end.

`hash_embed`: bag-of-hashed-words — token t votes into dimension
md5_hash32(t) mod dim with weight 1; the count vector is the embedding
(L2-normalization happens on store ingest / query, as with any real
embedding). Arrow-batched kernel (one md5 per token, NumPy bincount);
the same function in SQL is
`list_transform(range(0,dim-1), d -> len(list_filter(hs, h -> h % dim = d)))`.

A production pipeline swaps this for a model UDF with the identical
DataFrame shape — (id cols…, embedding array<float>) — which is the
point of the plumbing."""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def hash_embed_text(text: str, dim: int = 64) -> list[float]:
    """Driver-side twin of the kernel (for embedding ad-hoc query text)."""
    toks = [t for t in text.lower().split(" ") if t]
    counts = np.zeros(dim, dtype=np.float64)
    for t in toks:
        counts[int(hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16) % dim] += 1.0
    return [float(x) for x in counts]


def embed_chunks(
    chunks: DataFrame,
    *,
    text_col: str = "chunk_text",
    out_col: str = "embedding",
    dim: int = 64,
    keep_cols: Sequence[str] | None = None,
) -> DataFrame:
    """(…, chunk_text) → (…, embedding array<double>). Pure map — no
    shuffle; one md5 per token."""
    keep = list(keep_cols) if keep_cols is not None else [c for c in chunks.columns if c != text_col]
    out_schema = T.StructType(
        [chunks.schema[c] for c in keep] + [T.StructField(out_col, T.ArrayType(T.DoubleType()))]
    )

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            embs = [hash_embed_text(str(t), dim) for t in pdf[text_col]]
            out = pdf[keep].copy()
            out[out_col] = embs
            yield out

    return chunks.select(*keep, text_col).mapInPandas(kernel, schema=out_schema)
