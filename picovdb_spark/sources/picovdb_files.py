"""Interop with the reference's on-disk store format, so a picovdb user
can point this engine at their existing files (and export back).

Format (/root/reference/picovdb/pico_vdb.py:41-51, 220-302, 330-393):
  {base}.ids.json   — JSON list of ids, row order == matrix row order
  {base}.vecs.npy   — float32 (N, dim) dense matrix
  {base}.meta.json  — {"embedding_dim": d, "data": [doc|null, ...],
                       "additional_data": {...}}
  row i deleted  ⇔  data[i] is null (tombstone; vector zeroed)

A picovdb store is by definition single-node-sized (an in-memory numpy
matrix), so reading it through the driver is not a scale bottleneck: the
matrix is CHUNKED into Arrow batches (`chunk_rows`) as it is parallelized
so no single task or RPC carries the whole thing, and the result lands as
a normal distributed DataFrame. Export (`write_picovdb_store`) streams
partitions back via toLocalIterator — same bound, and the write is
atomic (tmp + os.replace per file, pico_vdb.py:342-378).

`.faiss` sidecar: the reference additionally persists a serialized FAISS
HNSW index at `{base}.vecs.npy.faiss` (pico_vdb.py:261, :347). This
engine never READS it (its ANN layout is the IVF parquet store,
operators/ann.py) but `write_picovdb_store` regenerates it when the
`faiss` package is importable — the exact index construction the
reference builds (`IndexIDMap2(IndexHNSWFlat(dim, 32, INNER_PRODUCT))`,
efConstruction 40, ids = active row positions; pico_vdb.py:172-176,
:905-917) — so a reference process reopening an engine-written store
skips its automatic HNSW rebuild. Without faiss the sidecar is simply
omitted and the reference rebuilds on open; the data files are fully
compatible either way.
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from picovdb_spark.schema import K_DELETED, K_ID, K_VECTOR


def _infer_meta_fields(docs: list[dict | None]) -> dict[str, T.DataType]:
    fields: dict[str, T.DataType] = {}
    for doc in docs:
        if not doc:
            continue
        for k, v in doc.items():
            if k in (K_ID, K_VECTOR) or k in fields:
                continue
            if isinstance(v, bool):
                fields[k] = T.BooleanType()
            elif isinstance(v, int):
                fields[k] = T.LongType()
            elif isinstance(v, float):
                fields[k] = T.DoubleType()
            elif isinstance(v, str):
                fields[k] = T.StringType()
            else:  # nested structures pass through as JSON strings
                fields[k] = T.StringType()
    return fields


def read_picovdb_store(
    spark: SparkSession,
    base_path: str,
    *,
    chunk_rows: int = 50_000,
    include_deleted: bool = False,
) -> DataFrame:
    """Load a picovdb store as a DataFrame with the engine's store schema
    (_id_, _vector_, _deleted_, <metadata…>)."""
    with open(f"{base_path}.ids.json", encoding="utf-8") as f:
        ids: list[Any] = json.load(f)
    vecs = np.load(f"{base_path}.vecs.npy")
    if vecs.ndim != 2 or len(ids) != vecs.shape[0]:
        raise ValueError(
            f"corrupt store: {len(ids)} ids vs vecs shape {vecs.shape}"
        )
    docs: list[dict | None] = [None] * len(ids)
    additional: dict[str, Any] = {}
    meta_file = f"{base_path}.meta.json"
    if os.path.exists(meta_file):
        with open(meta_file, encoding="utf-8") as f:
            meta = json.load(f)
        docs = meta.get("data", docs)
        additional = meta.get("additional_data", {})
        if len(docs) != len(ids):
            # a short data list would silently truncate rows via zip —
            # same fail-fast as the ids/vecs length check above
            raise ValueError(
                f"corrupt store: {len(ids)} ids vs {len(docs)} meta docs"
            )

    meta_fields = _infer_meta_fields(docs)
    schema = T.StructType(
        [
            T.StructField(K_ID, T.StringType(), True),
            T.StructField(K_VECTOR, T.ArrayType(T.FloatType()), True),
            T.StructField(K_DELETED, T.BooleanType(), False),
        ]
        + [T.StructField(k, dt, True) for k, dt in meta_fields.items()]
    )

    def rows():
        for i, (sid, doc) in enumerate(zip(ids, docs)):
            deleted = doc is None
            if deleted and not include_deleted:
                continue
            doc = doc or {}
            extras = []
            for k, dt in meta_fields.items():
                v = doc.get(k)
                if v is not None and isinstance(dt, T.StringType) and not isinstance(v, str):
                    v = json.dumps(v)
                extras.append(v)
            yield (
                str(sid) if sid is not None else None,
                [float(x) for x in vecs[i]],
                deleted,
                *extras,
            )

    # chunked parallelize: bounded driver memory per batch, many partitions
    all_rows = list(rows())
    if not all_rows:
        return spark.createDataFrame([], schema=schema)
    chunks = [
        all_rows[i : i + chunk_rows] for i in range(0, len(all_rows), chunk_rows)
    ]
    df = spark.createDataFrame(chunks[0], schema=schema)
    for c in chunks[1:]:
        df = df.unionByName(spark.createDataFrame(c, schema=schema))
    df._picovdb_additional_data = additional  # side-channel KV (pico_vdb.py:500-512)
    return df


def _try_build_faiss_sidecar(vecs: np.ndarray, docs: list[dict | None]):
    """Serialized-HNSW bytes for the `.faiss` sidecar, or None when the
    faiss package is absent (it is optional everywhere in this engine,
    exactly as in the reference's `_HAS_FAISS` gate, pico_vdb.py:19-23).

    Construction mirrors the reference bit-for-bit: IndexIDMap2 over
    IndexHNSWFlat(dim, hnsw_m=32, METRIC_INNER_PRODUCT) with
    efConstruction=40, populated with the ACTIVE rows only, ids = their
    row positions in the matrix (pico_vdb.py:172-176, :910-917)."""
    try:
        import faiss
    except ImportError:
        return None
    if vecs.size == 0:
        return None
    dim = int(vecs.shape[1])
    base = faiss.IndexHNSWFlat(dim, 32, faiss.METRIC_INNER_PRODUCT)
    base.hnsw.efConstruction = 40
    idx = faiss.IndexIDMap2(base)
    active = np.asarray(
        [i for i, d in enumerate(docs) if d is not None], dtype=np.int64
    )
    if active.size:
        idx.add_with_ids(np.ascontiguousarray(vecs[active]), active)
    return faiss.serialize_index(idx)


def write_picovdb_store(
    df: DataFrame,
    base_path: str,
    *,
    additional_data: dict[str, Any] | None = None,
    faiss_sidecar: bool = True,
) -> None:
    """Export a store DataFrame back to picovdb's file format (readable
    by the reference implementation). Atomic: tmp files + os.replace.
    With `faiss_sidecar` (and the optional faiss package installed) the
    `{base}.vecs.npy.faiss` HNSW sidecar is regenerated inside the same
    atomic swap, sparing the reference its reopen-time rebuild."""
    cols = df.columns
    meta_cols = [c for c in cols if c not in (K_ID, K_VECTOR, K_DELETED)]
    ordered = df.select(
        K_ID,
        F.col(K_VECTOR).cast("array<float>").alias(K_VECTOR),
        (F.col(K_DELETED) if K_DELETED in cols else F.lit(False)).alias(K_DELETED),
        *meta_cols,
    )
    ids: list[str] = []
    docs: list[dict | None] = []
    mats: list[np.ndarray] = []
    for row in ordered.toLocalIterator():
        ids.append(row[K_ID])
        if row[K_DELETED]:
            docs.append(None)
            mats.append(np.zeros(len(row[K_VECTOR]), dtype=np.float32))
        else:
            docs.append({K_ID: row[K_ID], **{c: row[c] for c in meta_cols}})
            mats.append(np.asarray(row[K_VECTOR], dtype=np.float32))
    vecs = np.vstack(mats) if mats else np.empty((0, 0), dtype=np.float32)

    tmp = lambda p: p + ".tmp"  # noqa: E731
    ids_p, vecs_p, meta_p = (
        f"{base_path}.ids.json",
        f"{base_path}.vecs.npy",
        f"{base_path}.meta.json",
    )
    with open(tmp(ids_p), "w", encoding="utf-8") as f:
        json.dump(ids, f)
    np.save(tmp(vecs_p) + ".npy", vecs)  # np.save appends .npy
    os.replace(tmp(vecs_p) + ".npy", tmp(vecs_p))
    with open(tmp(meta_p), "w", encoding="utf-8") as f:
        json.dump(
            {
                "embedding_dim": int(vecs.shape[1]) if vecs.size else 0,
                "data": docs,
                "additional_data": additional_data or {},
            },
            f,
        )
    swap = [ids_p, vecs_p, meta_p]
    faiss_p = f"{vecs_p}.faiss"
    blob = _try_build_faiss_sidecar(vecs, docs) if faiss_sidecar else None
    if blob is not None:
        with open(tmp(faiss_p), "wb") as f:
            f.write(bytes(bytearray(blob)))
        swap.append(faiss_p)
    for p in swap:
        os.replace(tmp(p), p)
    if blob is None and os.path.exists(faiss_p):
        # whenever this export does NOT regenerate the sidecar (no faiss
        # package, sidecar disabled, empty store), a sidecar from an
        # earlier export now indexes the WRONG vectors — and the
        # reference only rebuilds when the file is absent
        # (pico_vdb.py:261-282), so a stale one would silently serve old
        # neighbors. Remove it.
        os.remove(faiss_p)
