"""IVF-PQ — cluster-routed search over product-quantized codes.

The 100 TB composition of the two existing index families:

- IVF alone (operators/ann.py) prunes the scan to the probed clusters,
  but each probed cluster still reads RAW float vectors (4·dim bytes a
  row — the column that dominates a 100 TB store).
- PQ alone (operators/pq.py) scans 16-byte codes instead of 4 KB
  vectors, but scans ALL of them for every batch.
- IVF-PQ scans only the CODES of the PROBED clusters: the scan cost is
  (nprobe / n_centroids) × (1/256) of the exact path's bytes, and with
  the codes table written `partitionBy(__cluster)` the probe filter is
  partition pruning — unprobed clusters cost zero IO.

This is the standard billion-scale layout (FAISS IVFPQ; Jégou et al.,
TPAMI 2011). One deliberate simplification: codes encode the full unit
vector, not the residual to its centroid — the metric here is inner
product on unit vectors (cosine), where residual encoding buys little
and costs a per-cluster codebook rotation (FAISS's own IP default is
`by_residual=False`). Documented trade: slightly lower code resolution
per cluster, one global codebook instead of n_centroids of them.

Query plan (all composition, no new primitives):
1. driver: (nq × n_centroids) GEMM → per-query probe sets (ann.py shape)
2. scan codes WHERE cluster IN probe-union  → partition-pruned
3. Arrow kernel: ADC table lookups + per-query probe mask + partition-
   local tie-complete top-R              (pq.py kernel + ann.py mask)
4. k-row shuffle → global top-R candidates per query
5. exact refine: broadcast the tiny candidate set against the raw store,
   float64 rescore (pq.exact_rescore) → final top-k

Reference parity: this is the engine's scale substitute for the
reference's FAISS HNSW path (pico_vdb.py:716-751) — same role (fast
approximate query route), different structure because HNSW's pointer-
chasing graph walk is driver-hostile on Spark while IVF-PQ is pure
scan/join/aggregate.

With nprobe = n_centroids and refine_k ≥ store size the result is
definitionally the exact top-k (all candidates, rescored exactly) —
the hash-checked oracle configuration; honest partial-probe recall is
pinned in tests/test_ivfpq.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from picovdb_spark.operators.ann import CLUSTER_COL, fit_centroids
from picovdb_spark.operators.pq import fit_pq, pq_encode
from picovdb_spark.schema import K_DELETED, K_ID, K_VECTOR


@dataclass
class IvfPqIndex:
    """codes (id, __cluster, codes) + centroids + codebooks + raw store
    (kept lazily, only touched by the refine join)."""

    codes: DataFrame
    centroids: np.ndarray  # (n_centroids, dim)
    codebooks: np.ndarray  # (m, k, dsub)
    store: DataFrame | None = None
    id_col: str = K_ID
    vector_col: str = K_VECTOR
    # raw vectors repartitioned by cluster (the FAISS inverted-list
    # layout): lets the refine join scan ONLY probed clusters' raw
    # vectors instead of the whole store — without it, refine pays a
    # full raw scan and the routed path can never beat exact
    raw_by_cluster: DataFrame | None = None
    # the DataFrame build() actually persisted (codes, or the shared
    # encoded parent when cluster_raw=True) — the handle unpersist()
    # releases; unpersisting the projected codes/raw_by_cluster views
    # would be a silent no-op against the cached parent plan
    _pinned: DataFrame | None = None

    def unpersist(self) -> None:
        """Release the executor-memory cache build() pinned (if any).
        The index remains usable — scans just recompute from source."""
        if self._pinned is not None:
            self._pinned.unpersist()
            self._pinned = None

    @classmethod
    def build(
        cls,
        store: DataFrame,
        *,
        id_col: str = K_ID,
        vector_col: str = K_VECTOR,
        n_centroids: int = 64,
        m: int = 8,
        k: int = 256,
        sample_size: int = 25_000,
        seed: int = 42,
        storage: str = "memory",
        cluster_raw: bool = False,
    ) -> "IvfPqIndex":
        """Fit centroids and codebooks on bounded samples (driver-side
        Lloyd — kilobytes of model state, broadcast everywhere), then ONE
        distributed encode pass emitting (id, cluster, codes). The raw
        vector column never shuffles; the codes table is ~256× smaller
        than the store and is what gets cached/persisted."""
        if storage not in ("memory", "checkpoint", "lazy"):
            raise ValueError(
                f"storage must be 'memory', 'checkpoint' or 'lazy', got {storage!r}"
            )
        if K_DELETED in store.columns:
            store = store.filter(~F.col(K_DELETED)).drop(K_DELETED)
        # one Arrow-path sample feeds BOTH fits; one fused kernel does
        # assignment + encoding (the vector payload crosses JVM↔Python
        # once instead of three times — build history: 30 s → ~17 s)
        from picovdb_spark.operators.ann import sample_matrix

        sample = sample_matrix(
            store, vector_col=vector_col, sample_size=sample_size, seed=seed
        )
        cent = fit_centroids(
            store, n_centroids, vector_col=vector_col, seed=seed, sample=sample
        )
        books = fit_pq(
            store, vector_col=vector_col, m=m, k=k, seed=seed, sample=sample
        )
        codes = pq_encode(
            store,
            books,
            id_col=id_col,
            vector_col=vector_col,
            centroids=cent,
            passthrough_cols=[vector_col] if cluster_raw else None,
        )
        # cluster-clustered layout: probing prunes whole partitions
        n_parts = max(len(cent) // 4, 1)
        raw = None
        pinned = None
        if cluster_raw:
            # the inverted-list layout for REFINE: raw vectors clustered
            # alongside the codes, so rescoring candidates only reads the
            # probed clusters (FAISS keeps raw/SQ vectors in the inverted
            # lists for exactly this reason). Costs one extra resident
            # copy of the vector column — opt-in.
            # Materialize the ENCODED output once — persist OR eager
            # checkpoint per `storage`, never both — and derive the raw
            # layout and codes table from it, so the distributed encode
            # pass (the expensive JVM↔Python vector transfer) runs
            # exactly once, as documented above.
            enc = codes.repartition(n_parts, CLUSTER_COL)
            if storage == "checkpoint":
                enc = enc.localCheckpoint(eager=True)
            elif storage == "memory":
                enc = enc.persist()
                enc.count()  # materialize the single encode pass
                pinned = enc
            # storage == "lazy": no materialization — the encode pass
            # re-runs per downstream action (same contract as the
            # non-cluster_raw branch)
            raw = enc.select(id_col, CLUSTER_COL, vector_col)
            codes = enc.drop(vector_col)
        else:
            codes = codes.repartition(n_parts, CLUSTER_COL)
            if storage == "memory":
                codes = codes.persist()
                pinned = codes
            elif storage == "checkpoint":
                codes = codes.localCheckpoint(eager=True)
        return cls(
            codes=codes,
            centroids=cent,
            codebooks=books,
            store=store,
            id_col=id_col,
            vector_col=vector_col,
            raw_by_cluster=raw,
            _pinned=pinned,
        )

    def write(self, path: str) -> None:
        """Persist codes partitioned by cluster (Hive-style partition
        pruning at query time) + the two tiny model arrays alongside.
        An index built with `cluster_raw=True` also persists the
        inverted-list raw layout (`_raw/`, same cluster partitioning)
        so a write/read round-trip keeps cluster-pruned refine instead
        of silently falling back to a full raw-store scan."""
        import os

        self.codes.write.mode("overwrite").partitionBy(CLUSTER_COL).parquet(path)
        if self.raw_by_cluster is not None:
            self.raw_by_cluster.write.mode("overwrite").partitionBy(CLUSTER_COL).parquet(
                os.path.join(path, "_raw")
            )
        for name, arr in (("_centroids", self.centroids), ("_codebooks", self.codebooks)):
            tmp = os.path.join(path, f"{name}.npy.tmp.npy")
            np.save(tmp, arr)
            os.replace(tmp, os.path.join(path, f"{name}.npy"))

    @classmethod
    def read(
        cls,
        spark,
        path: str,
        *,
        store: DataFrame | None = None,
        id_col: str = K_ID,
        vector_col: str = K_VECTOR,
    ) -> "IvfPqIndex":
        """Reopen a written index lazily; pass `store` to re-enable the
        exact-refine path (codes alone can serve ADC-only queries). If
        the index was written with the inverted-list raw layout
        (`cluster_raw=True`), `_raw/` is restored too, so refine stays
        cluster-pruned after the round-trip. (`_raw` is invisible to the
        codes read: Spark's file index skips underscore-prefixed
        directories.)"""
        import os

        cent = np.load(os.path.join(path, "_centroids.npy"))
        books = np.load(os.path.join(path, "_codebooks.npy"))
        raw_path = os.path.join(path, "_raw")
        raw = spark.read.parquet(raw_path) if os.path.isdir(raw_path) else None
        return cls(
            codes=spark.read.parquet(path),
            centroids=cent,
            codebooks=books,
            store=store,
            id_col=id_col,
            vector_col=vector_col,
            raw_by_cluster=raw,
        )

    def query(
        self,
        queries: DataFrame,
        *,
        top_k: int = 10,
        nprobe: int = 8,
        refine_k: int | None = None,
        query_id: str = "query_id",
        vector_col: str | None = None,
        round_to: int = 6,
    ) -> DataFrame:
        """Routed ADC top-k: (query_id, _id_, _metrics_, rank).

        Without refine, `_metrics_` is the ADC cosine approximation over
        probed clusters. With `refine_k=R` the routed ADC top-R is
        rescored exactly (float64) against the raw store; nprobe =
        n_centroids and R ≥ store size degenerates to exact top-k (the
        oracle configuration)."""
        from picovdb_spark.operators.pq import (
            adc_local_candidates,
            empty_topk_result,
            finish_adc_topk,
            resolve_refine,
        )
        from picovdb_spark.operators.similarity import collect_normalized_queries

        qids, qmat = collect_normalized_queries(
            queries, query_id, vector_col or self.vector_col
        )
        if qmat.size == 0:
            return empty_topk_result(self.codes, self.id_col)
        cent = self.centroids
        nprobe = min(nprobe, len(cent))
        # driver-side routing, dense probe mask (same shape as ann_query:
        # executor masking must be NumPy indexing, never a Python loop)
        probes = np.argpartition(-(qmat @ cent.T), nprobe - 1, axis=1)[:, :nprobe]
        probed_union = sorted({int(c) for row in probes for c in row})
        probe_bool = np.zeros((len(qids), len(cent)), dtype=bool)
        np.put_along_axis(probe_bool, probes, True, axis=1)

        n_cand, refine = resolve_refine(refine_k, top_k)
        # partition pruning: unprobed clusters are never scanned; the
        # shared ADC kernel applies the per-query probe mask
        pruned = self.codes.filter(F.col(CLUSTER_COL).isin(probed_union))
        local = adc_local_candidates(
            pruned,
            self.codebooks,
            qids,
            qmat,
            id_col=self.id_col,
            n_cand=n_cand,
            round_to=round_to,
            probe_bool=probe_bool,
        )
        refine_store = self.store
        if self.raw_by_cluster is not None:
            # candidates are all inside probed clusters (the ADC mask
            # guarantees it), so refine only reads those clusters' raw
            # vectors — the whole point of the inverted-list layout
            refine_store = self.raw_by_cluster.filter(
                F.col(CLUSTER_COL).isin(probed_union)
            )
        return finish_adc_topk(
            local,
            refine_store,
            qids,
            qmat,
            id_col=self.id_col,
            vector_col=self.vector_col,
            top_k=top_k,
            n_cand=n_cand,
            refine=refine,
            round_to=round_to,
        )
