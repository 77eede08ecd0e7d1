"""`PicoVectorDB` — drop-in API compatibility with the reference class
(/root/reference/picovdb/pico_vdb.py:105-1011): same constructor
signature, same method names, same dict-in/dict-out shapes, Spark
underneath. A reference user can switch imports and run the code they
run today; DataFrame-level access stays available via `.store`.

Documented deviations (SURVEY.md §7.2):
- ids are strings (non-string ids are stringified on ingest and
  returned as strings);
- auto-ids hash a canonical decimal encoding of the normalized vector,
  not raw float32 bytes — same dedup invariant, different digest values;
- `_metrics_` is rounded to 6 decimals; ranking ties break by id;
- FAISS/HNSW tunables: the ANN analog is the IVF index, enabled by
  default like FAISS is (`no_faiss=True` disables routing batch queries
  through it). Per-call `ef_search`/`hnsw_ef_search` (and the
  constructor `*_default` forms) map monotonically onto the IVF probe
  width — `nprobe = max(1, ceil(ef / 4))`, clamped to the centroid
  count inside `ann_query` — so a larger efSearch widens the scan and
  raises recall exactly as it does in the reference
  (pico_vdb.py:716-730). The anchor aligns the two systems' DEFAULTS:
  the reference's HNSW_EFS=32 (pico_vdb.py:29) maps to the engine
  default nprobe=8, so explicitly passing the reference's default is a
  no-op here too.
  Build-time-only HNSW knobs (`hnsw_m`, `hnsw_ef_construction`) and
  memory-layout knobs (`use_memmap`, `adaptive_buffer`,
  `argsort_threshold`) have no IVF equivalent and are accepted no-ops
  (COVERAGE.md);
- persistence uses the reference's own file format
  ({storage_file}.ids.json/.vecs.npy/.meta.json) via sources/ — stores
  SAVED HERE LOAD IN THE REFERENCE and vice versa;
- result dicts contain only the keys present on the doc: a metadata
  key explicitly stored with value None is indistinguishable from an
  absent key in the columnar model (absent == null), so it is dropped
  from query()/get()/get_all() results where the reference would
  return {'key': None}.
"""

from __future__ import annotations

from typing import Any, Callable, Literal, Optional, Union

import numpy as np

from pyspark.sql import SparkSession

from picovdb_spark.schema import K_ID, K_METRICS, K_VECTOR
from picovdb_spark.session import get_spark
from picovdb_spark.sources.picovdb_files import read_picovdb_store, write_picovdb_store
from picovdb_spark.store import VectorStore

import os


class PicoVectorDB:
    def __init__(
        self,
        embedding_dim: int = 1024,
        metric: Literal["cosine"] = "cosine",
        storage_file: str = "picovdb",
        use_memmap: bool = False,
        capacity: Optional[int] = None,
        no_faiss: bool = False,
        faiss_threads: Optional[int] = None,
        hnsw_m: Optional[int] = None,
        hnsw_ef_construction: Optional[int] = None,
        ef_search_default: Optional[int] = None,
        hnsw_ef_search_default: Optional[int] = None,
        faiss_incremental_threshold_ratio: float = 0.2,
        adaptive_buffer: Optional[int] = None,
        argsort_threshold: Optional[float] = None,
        *,
        spark: Optional[SparkSession] = None,
    ) -> None:
        if metric != "cosine":
            raise ValueError("only the cosine metric is supported")  # pico_vdb.py:107
        self.dim = embedding_dim
        self.metric = metric
        self._path = storage_file
        self._use_ann = not no_faiss
        # per-call ef_search falls back to these (reference honors the
        # same default-then-override ladder, pico_vdb.py:716-730);
        # remaining FAISS/memmap build knobs are accepted no-ops (module
        # docstring / COVERAGE.md)
        self._ef_search_default = (
            hnsw_ef_search_default
            if hnsw_ef_search_default is not None
            else ef_search_default
        )
        self._spark = spark or get_spark("picovdb_compat")
        self.store = VectorStore(
            self._spark,
            embedding_dim,
            capacity=capacity,
            checkpoint_mutations=True,
            ann_incremental_threshold_ratio=faiss_incremental_threshold_ratio,
        )
        if os.path.exists(f"{storage_file}.ids.json"):
            df = read_picovdb_store(self._spark, storage_file, include_deleted=True)
            self.store._df = df
            self.store._additional = dict(getattr(df, "_picovdb_additional_data", {}) or {})
            if df.first() is not None:
                self.dim = self.store.dim = len(
                    df.select(K_VECTOR).filter(df[K_VECTOR].isNotNull()).first()[0]
                )

    # ------------------------------------------------------------- mutation

    def upsert(self, items: list[dict[str, Any]]) -> dict[str, list[str]]:
        items = [dict(it) for it in items]
        for it in items:
            if K_ID in it and it[K_ID] is not None:
                it[K_ID] = str(it[K_ID])
            if isinstance(it.get(K_VECTOR), np.ndarray):
                it[K_VECTOR] = [float(x) for x in it[K_VECTOR].ravel()]
        return self.store.upsert(items)

    def delete(self, ids: list[str]) -> list[str]:
        return self.store.delete([str(i) for i in ids])

    def vacuum(self) -> int:
        return self.store.vacuum()

    # -------------------------------------------------------------- queries

    def query(
        self,
        query_vecs: Union[np.ndarray, list],
        top_k: int = 10,
        better_than: Optional[float] = None,
        where: Optional[Union[dict[str, Any], Callable[[dict[str, Any]], bool]]] = None,
        ids: Optional[list[str]] = None,
        ef_search: Optional[int] = None,
        hnsw_ef_search: Optional[int] = None,
    ) -> Union[list[list[dict[str, Any]]], list[dict[str, Any]]]:
        """Batch (2-D) or single (1-D) query; single input returns the
        inner list, exactly like the reference (pico_vdb.py:563-581, :751)."""
        arr = np.asarray(query_vecs, dtype=np.float32)
        single = arr.ndim == 1
        if single:
            arr = arr[None, :]
        if arr.ndim != 2 or arr.shape[1] != self.dim:
            raise ValueError(
                f"query vectors must be (n, {self.dim}) or ({self.dim},); got {arr.shape}"
            )
        # per-call efSearch (hnsw_ef_search wins over ef_search, like the
        # reference's kwarg ladder) → IVF probe width: nprobe=ceil(ef/4),
        # monotone in ef and ANCHORED so the reference's default efSearch
        # (HNSW_EFS=32, pico_vdb.py:29) lands on the engine default
        # nprobe=8 — a user passing the reference's own default
        # explicitly must get the same behavior as passing nothing.
        # Clamped to n_centroids inside ann_query. Only meaningful on
        # the ANN route; the exact path scans everything.
        ef = (
            hnsw_ef_search
            if hnsw_ef_search is not None
            else ef_search
            if ef_search is not None
            else self._ef_search_default
        )
        ann_kwargs: dict[str, Any] = {}
        if ef is not None:
            ann_kwargs["nprobe"] = max(1, -(-int(ef) // 4))
        out = self.store.query(
            arr,  # 2-D float32 batch — store.query takes the fast path
            top_k=top_k,
            better_than=better_than,
            where=where,
            ids=[str(i) for i in ids] if ids is not None else None,
            ann=self._use_ann and where is None and ids is None,
            **ann_kwargs,
        )
        rank_col = "_rank_" if "_rank_" in out.columns else "rank"
        collected = out.collect()
        results: list[list[dict[str, Any]]] = [[] for _ in range(arr.shape[0])]
        for r in collected:
            d = r.asDict()
            qi = int(d.pop("query_id"))
            d.pop(rank_col, None)
            d.pop("__cluster", None)
            # only the keys stored with the doc, like the reference's dict
            # results (schemaless columns are None for docs lacking them)
            d = {k: v for k, v in d.items() if v is not None}
            d[K_METRICS] = float(d[K_METRICS])
            results[qi].append((r[rank_col], d))
        out_lists = [[d for _, d in sorted(lst, key=lambda t: t[0])] for lst in results]
        return out_lists[0] if single else out_lists

    def query_one(self, query_vec, **kwargs: Any) -> list[dict[str, Any]]:
        return self.query(np.asarray(query_vec), **kwargs)

    # --------------------------------------------------------------- lookup

    def get(
        self, ids: Union[str, list[str]], include_vector: bool = False
    ) -> Union[Optional[dict[str, Any]], list[dict[str, Any]]]:
        single = isinstance(ids, str)
        id_list = [ids] if single else [str(i) for i in ids]
        rows = {
            r[K_ID]: {k: v for k, v in r.asDict().items() if v is not None}
            for r in self.store.get(id_list, include_vector).collect()
        }
        recs = []
        for i in id_list:  # reference preserves input order, skips missing
            if i in rows:
                d = rows[i]
                if include_vector and K_VECTOR in d:
                    d[K_VECTOR] = np.asarray(d[K_VECTOR], dtype=np.float32)
                recs.append(d)
        if single:
            return recs[0] if recs else None
        return recs

    def get_by_id(self, sid: str, include_vector: bool = False):
        return self.get(sid, include_vector)

    def get_all(
        self, include_vector: bool = False, include_deleted: bool = False
    ) -> list[dict[str, Any]]:
        rows = self.store.get_all(include_vector, include_deleted).collect()
        out = []
        for r in rows:
            d = {k: v for k, v in r.asDict().items() if v is not None}
            if include_vector and K_VECTOR in d:
                d[K_VECTOR] = np.asarray(d[K_VECTOR], dtype=np.float32)
            out.append(d)
        return out

    # ---------------------------------------------------------------- stats

    def count(self) -> int:
        return self.store.count()

    def capacity(self) -> int:
        return self.store.capacity()

    def size(self) -> int:  # deprecated alias (pico_vdb.py:304-315)
        return self.capacity()

    def __len__(self) -> int:
        return self.count()

    def stats(self) -> dict[str, Any]:
        return self.store.stats()

    # ---------------------------------------------------------- persistence

    def save(self) -> None:
        """Write the REFERENCE's file format — a store saved here loads
        in the original picovdb (pico_vdb.py:330-393)."""
        write_picovdb_store(
            self.store.df, self._path, additional_data=self.store.get_additional_data()
        )

    def flush(self) -> None:
        self.store.flush()

    def rebuild_index(self) -> None:
        self.store.build_ann_index()

    def store_additional_data(self, **kw: Any) -> None:
        self.store.store_additional_data(**kw)

    def get_additional_data(self) -> dict[str, Any]:
        return self.store.get_additional_data()
