"""Interleaved A/B for the r12 pq_encode float32-prescan (RUNBOOK §2.5:
order-balanced pairs in one session; identical-output assertion every
rep; ratios, not absolutes).

Shape = the scale1m_ivfpq_build encode pass: 1M rows x dim 256,
m=8 / k=256 codebooks + 256 IVF centroids fused in one kernel
(cluster_raw passthrough excluded — it is identical bytes either way).
A = _PRESCAN_F32 True (f32 prescan + margin + f64 refine),
B = False (pure-f64 argmin, the pre-r12 kernel).
Checksum = crc32 over ids, clusters and every code — consumes the
whole output and pins A == B value-identity at full scale.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import zlib

import numpy as np


def loadavg() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def main() -> None:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from picovdb_spark.session import get_spark
    from picovdb_spark.operators import pq as pq_mod
    from picovdb_spark.operators.pq import pq_encode
    from picovdb_spark.schema import K_ID, K_VECTOR
    from pyspark.sql import types as T

    spark = get_spark("ab_r12_pqencode")
    n, dim, parts = 1_000_000, 256, 32
    schema = T.StructType(
        [T.StructField(K_ID, T.StringType()), T.StructField(K_VECTOR, T.ArrayType(T.DoubleType()))]
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["id"].to_numpy()
            rng = np.random.default_rng(int(ids[0]) + 77)
            mat = rng.standard_normal((len(ids), dim)).astype(np.float32).astype(np.float64)
            yield pd.DataFrame({K_ID: [str(i) for i in ids], K_VECTOR: list(mat)})

    store = (
        spark.range(n).repartition(parts).mapInPandas(gen, schema=schema)
        .localCheckpoint(eager=True)
    )
    rng = np.random.default_rng(42)
    books = rng.standard_normal((8, 256, 32)) / np.sqrt(32)
    cent = rng.standard_normal((256, dim))
    cent /= np.linalg.norm(cent, axis=1)[:, None]

    def run(flag: bool):
        pq_mod._PRESCAN_F32 = flag
        t0 = time.perf_counter()
        out = pq_encode(store, books, centroids=cent)
        from pyspark.sql import functions as F

        agg = out.select(
            F.sum(F.crc32(F.col(K_ID))).alias("c1"),
            F.sum(F.col("__cluster").cast("long")).alias("c2"),
            F.sum(F.crc32(F.concat_ws(",", F.col("codes").cast("array<string>")))).alias("c3"),
        ).collect()[0]
        wall = time.perf_counter() - t0
        return wall, (agg["c1"], agg["c2"], agg["c3"])

    print(f"[ab_pqencode] load {loadavg():.1f}")
    results = {"A": [], "B": []}
    sums = set()
    for p in range(pairs):
        order = ["A", "B"] if p % 2 == 0 else ["B", "A"]
        for which in order:
            wall, ck = run(which == "A")
            results[which].append(wall)
            sums.add(ck)
            print(f"  pair{p} {which}={wall:.2f}s load={loadavg():.1f} ck={ck}")
    assert len(sums) == 1, f"checksum divergence: {sums}"
    a, b = sorted(results["A"]), sorted(results["B"])
    print(f"[ab_pqencode] A(prescan) medians {a} | B(f64) {b} | median ratio B/A = {b[len(b)//2]/a[len(a)//2]:.2f}x  checksums identical across all reps")
    pq_mod._PRESCAN_F32 = True


if __name__ == "__main__":
    main()
