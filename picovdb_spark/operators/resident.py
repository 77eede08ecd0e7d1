"""Resident serving mode: executor-local float32 shards for repeated
query batches.

The reference sustains ~1000 q/s because its store matrix lives in
process memory (`pico_vdb.py:62-75` keeps a contiguous float32 array;
`query` is one BLAS call against it). The Spark standard path re-pays a
JVM-cache → Arrow → Python hop of the full vector column on every query
batch — correct, but ~0.5 s/pass at 100k × 1024 that the reference never
pays.

`ResidentGemmStore` is the Spark analog of "the index shard lives on the
serving node": `materialize()` runs one job that writes each partition's
(ids, unit-normalized float32 matrix) to node-local shared memory
(`/dev/shm`, falling back to the local tmpdir), and `query()` jobs map
over a *pruned* scan of the cached store — only a constant byte per row
crosses the JVM→Python boundary — while the kernel `np.load`s its
partition's block with `mmap_mode="r"`: after first touch the pages sit
in the OS page cache, shared by every worker process on the node, so a
query pass costs one GEMM and a k-row shuffle, nothing else.

Cluster semantics: blocks are node-local. Tasks are scheduled by cache
locality (PROCESS/NODE_LOCAL against the cached store), so on a
multi-executor cluster each node serves the shards it cached —
the standard pattern for index serving on Spark. A task scheduled off
its block's node (locality fallback after `spark.locality.wait`)
fails fast with a clear error rather than silently rescanning; resident
mode is an explicit serving optimization, not the default path —
`similarity.batch_query` stays the general-purpose route.

This mode exists for parity with the reference's query-serving regime
(BASELINE.md batch_queries.py); it is NOT used by the oracle entries.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from collections.abc import Iterator

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from picovdb_spark.schema import K_ID, K_METRICS, K_VECTOR

_SHM_ROOT_CANDIDATES = ("/dev/shm", tempfile.gettempdir())


def _shm_root() -> str:
    for d in _SHM_ROOT_CANDIDATES:
        if os.path.isdir(d) and os.access(d, os.W_OK):
            return d
    return tempfile.gettempdir()


class ResidentGemmStore:
    """Pin a store's vectors node-locally as unit float32 blocks and
    serve repeated top-k query batches against them.

    Usage::

        rs = ResidentGemmStore(store_df)        # store: (_id_, _vector_, ...)
        rs.materialize()                        # one pass over the store
        hits = rs.query(queries_df, top_k=10)   # cheap, repeatable
        rs.close()                              # drop the shm blocks

    Scores are float32 (the reference's own precision), rounded to
    `round_to`; ranking ties break by id exactly like `batch_query`.
    """

    def __init__(
        self,
        store: DataFrame,
        *,
        vector_col: str = K_VECTOR,
        id_col: str = K_ID,
        normalized: bool = False,
        shm_dir: str | None = None,
    ):
        self.store = store
        self.vector_col = vector_col
        self.id_col = id_col
        self.normalized = normalized
        self.token = uuid.uuid4().hex[:12]
        self.dir = shm_dir or os.path.join(_shm_root(), f"picovdb_resident_{self.token}")
        self.n_rows: int | None = None
        self.n_partitions: int | None = None

    # ------------------------------------------------------------ lifecycle

    def materialize(self) -> int:
        """One job over the store: each task normalizes its partition to a
        float32 block and writes (ids.npy, mat.npy) atomically under the
        node-local resident dir. Returns the total row count."""
        blk_dir = self.dir
        vec_col, id_col = self.vector_col, self.id_col
        pre_normalized = self.normalized

        def write_block(batches: Iterator) -> Iterator:
            import pyarrow as pa
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            ids_parts, mat_parts = [], []
            for batch in batches:
                n = batch.num_rows
                if n == 0:
                    continue
                vals = batch.column(1).flatten().to_numpy(zero_copy_only=False)
                mat = vals.reshape(n, -1).astype(np.float32)
                if not pre_normalized:
                    norms = np.sqrt((mat * mat).sum(axis=1))
                    zero = norms == 0.0
                    if zero.any():  # zero vector ⇒ e₀ (pico_vdb.py:62-67)
                        mat[zero] = 0.0
                        mat[zero, 0] = 1.0
                        norms[zero] = 1.0
                    mat /= norms[:, None]
                ids_parts.append(batch.column(0).to_numpy(zero_copy_only=False))
                mat_parts.append(mat)
            rows = 0
            if mat_parts:
                ids = np.concatenate(ids_parts)
                mat = np.ascontiguousarray(np.vstack(mat_parts))
                rows = len(ids)
                os.makedirs(blk_dir, exist_ok=True)
                for name, arr in (("ids", ids), ("mat", mat)):
                    tmp = os.path.join(blk_dir, f".{name}_{pid}.tmp.npy")
                    np.save(tmp, arr, allow_pickle=(name == "ids"))
                    os.replace(tmp, os.path.join(blk_dir, f"{name}_{pid}.npy"))
            yield pa.RecordBatch.from_arrays(
                [pa.array([pid], type=pa.int32()), pa.array([rows], type=pa.int64())],
                names=["pid", "rows"],
            )

        src = self.store.select(F.col(id_col).cast("string"), F.col(vec_col))
        out = src.mapInArrow(write_block, schema="pid int, rows long").collect()
        self.n_rows = sum(r["rows"] for r in out)
        self.n_partitions = len(out)
        # which partition ids actually wrote a block: lets query() tell a
        # legitimately-empty partition apart from a MISSING block (off-node
        # task, changed partitioning) — the latter must fail, not skip
        self.block_pids = frozenset(r["pid"] for r in out if r["rows"] > 0)
        return self.n_rows

    def close(self) -> None:
        """Remove the shm blocks. Cleanup runs distributed (one pass over
        the store's partitions — the same executors that wrote blocks,
        by cache locality) AND on the driver; best-effort by nature: a
        node whose executor is gone keeps its tmpfs blocks until reboot,
        which is why the dir name carries a unique token (stale dirs are
        identifiable and never collide with a new store's)."""
        blk_dir = self.dir

        def rm(batches: Iterator) -> Iterator:
            import pyarrow as pa

            shutil.rmtree(blk_dir, ignore_errors=True)
            yield pa.RecordBatch.from_arrays([pa.array([1])], names=["ok"])
            for _ in batches:
                pass

        try:
            self.store.select(F.lit(True).alias("__probe")).mapInArrow(
                rm, schema="ok long"
            ).count()
        except Exception:
            pass  # session gone — driver-side cleanup still runs
        shutil.rmtree(self.dir, ignore_errors=True)

    def __enter__(self) -> "ResidentGemmStore":
        self.materialize()
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # -------------------------------------------------------------- queries

    def query(
        self,
        queries: DataFrame,
        *,
        top_k: int = 10,
        better_than: float | None = None,
        round_to: int = 6,
        query_id: str = "query_id",
        vector_col: str | None = None,
    ) -> DataFrame:
        """Batch top-k cosine against the resident blocks. Output shape
        matches `batch_query(method="gemm")`: (query_id, _id_, _metrics_,
        rank), score rounded to `round_to`, ties by id."""
        from picovdb_spark.operators.similarity import collect_normalized_queries
        from picovdb_spark.operators.topk import topk_per_query

        if self.n_rows is None:
            raise RuntimeError("resident store not materialized — call materialize()")
        spark = self.store.sparkSession
        qids, qmat = collect_normalized_queries(
            queries, query_id, vector_col or self.vector_col
        )
        if qmat.size == 0:
            return spark.createDataFrame(
                [], schema=f"query_id string, {K_ID} string, {K_METRICS} double, rank int"
            )
        bc = spark.sparkContext.broadcast((qids, qmat.astype(np.float32)))
        blk_dir = self.dir
        block_pids = getattr(self, "block_pids", None)
        pad = 1.5 * 10.0 ** (-round_to)

        def score_block(batches: Iterator) -> Iterator:
            import pyarrow as pa
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            for batch in batches:  # drain the (constant-column) input
                pass
            mat_path = os.path.join(blk_dir, f"mat_{pid}.npy")
            if not os.path.exists(mat_path):
                if block_pids is not None and pid not in block_pids:
                    return  # legitimately empty: materialize wrote no block
                # a block SHOULD exist for this pid — silently skipping
                # would drop its vectors from every answer
                raise RuntimeError(
                    f"resident block for partition {pid} missing under "
                    f"{blk_dir} — store closed, partitioning changed since "
                    "materialize(), or this task ran on a node that never "
                    "materialized; re-materialize() or use batch_query()"
                )
            # mmap: pages shared node-wide via the OS page cache — no copy
            mat = np.load(mat_path, mmap_mode="r")
            ids = np.load(os.path.join(blk_dir, f"ids_{pid}.npy"), allow_pickle=True)
            b_qids, b_qmat = bc.value
            scores = b_qmat @ mat.T  # float32 (nq, n_block)
            n = scores.shape[1]
            kk = min(top_k, n)
            # raw-score selection with a rounding pad — tie-complete after
            # rounding (see similarity._gemm_topk)
            kth = np.partition(scores, n - kk, axis=1)[:, n - kk]
            qi, vi = np.nonzero(scores >= (kth - pad)[:, None])
            sel = np.round(scores[qi, vi].astype(np.float64), round_to)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(b_qids[qi], type=pa.string()),
                    pa.array(ids[vi], type=pa.string()),
                    pa.array(sel, type=pa.float64()),
                ],
                names=["query_id", K_ID, K_METRICS],
            )

        # pruned probe of the cached store: the columnar cache serves only
        # the constant column (no vector bytes cross JVM→Python); the scan
        # keeps the store's partition ids and cache locality
        probe = self.store.select(F.lit(True).alias("__probe"))
        local = probe.mapInArrow(
            score_block, schema=f"query_id string, {K_ID} string, {K_METRICS} double"
        )
        out = topk_per_query(local, top_k)
        if better_than is not None:
            out = out.filter(F.col(K_METRICS) >= F.lit(float(better_than)))
        return out
