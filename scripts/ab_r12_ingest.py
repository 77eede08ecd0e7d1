"""Interleaved A/B for the stack_vectors ingest change (RUNBOOK §2.5).

One session, order-balanced AB BA pairs. Both kernel forms are defined
LOCALLY (cloudpickle ships them by value), so the only difference per
rep is the vector-column conversion: A = np.stack over the Arrow
column, B = the per-element np.asarray loop it replaced. The kernel
body after conversion is the pq_encode + IVF-assign work (16 subspace
argmin GEMMs + one cluster argmax GEMM at dim 1024, the heaviest
encode shape in the bench). Checksum = spark sum over codes + cluster,
asserted identical across every rep.

Usage: python scripts/ab_r12_ingest.py [pairs]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pyspark.sql import functions as F
from pyspark.sql import types as T


def loadavg() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def gemm_probe() -> float:
    """Single-thread f32 GEMM GFLOP/s — the host-wave instrument."""
    a = np.random.default_rng(0).standard_normal((2000, 128)).astype(np.float32)
    b = np.random.default_rng(1).standard_normal((128, 4000)).astype(np.float32)
    t0 = time.perf_counter()
    for _ in range(5):
        a @ b
    dt = time.perf_counter() - t0
    return 5 * 2 * 2000 * 128 * 4000 / dt / 1e9


def main() -> None:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
    print(f"[ab_ingest] gemm probe {gemm_probe():.1f} GF, load {loadavg():.1f}")

    from picovdb_spark.session import get_spark

    spark = get_spark("ab-r12-ingest")
    spark.sparkContext.setLogLevel("ERROR")

    n, dim, parts, m, k = 100_000, 1024, 32, 16, 256
    dsub = dim // m
    schema = T.StructType(
        [
            T.StructField("_id_", T.StringType()),
            T.StructField("_vector_", T.ArrayType(T.FloatType())),
        ]
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["id"].to_numpy()
            rng = np.random.default_rng(int(ids[0]) + 1)
            mat = rng.standard_normal((len(ids), dim)).astype(np.float32)
            mat /= np.sqrt((mat * mat).sum(axis=1))[:, None]
            yield pd.DataFrame({"_id_": ids.astype(str), "_vector_": list(mat)})

    store = spark.range(n).repartition(parts).mapInPandas(gen, schema=schema).cache()
    store.count()

    rng = np.random.default_rng(42)
    books = rng.standard_normal((m, k, dsub)).astype(np.float64)
    cent_mat = rng.standard_normal((k, dim))
    cent_mat /= np.sqrt((cent_mat * cent_mat).sum(axis=1))[:, None]
    bc = spark.sparkContext.broadcast((books, cent_mat))

    out_schema = T.StructType(
        [
            T.StructField("_id_", T.StringType()),
            T.StructField("__cluster", T.IntegerType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]
    )

    def normalize(mat):
        norms = np.sqrt((mat * mat).sum(axis=1))
        norms[norms == 0.0] = 1.0
        return mat / norms[:, None]

    def make_kernel(form: str):
        def kernel(batches):
            import pandas as pd

            bks, cmat = bc.value
            for pdf in batches:
                if pdf.empty:
                    continue
                if form == "stack":
                    raw = np.stack(pdf["_vector_"].to_numpy()).astype(
                        np.float64, copy=False
                    )
                else:
                    raw = np.asarray(
                        [np.asarray(x, dtype=np.float64) for x in pdf["_vector_"]]
                    )
                v = normalize(raw)
                codes = np.empty((len(v), m), dtype=np.int32)
                for s in range(m):
                    xs = v[:, s * dsub : (s + 1) * dsub]
                    cent = bks[s]
                    d2 = (
                        (xs * xs).sum(axis=1)[:, None]
                        - 2.0 * (xs @ cent.T)
                        + (cent * cent).sum(axis=1)[None, :]
                    )
                    codes[:, s] = np.argmin(d2, axis=1)
                cl = np.argmax(v @ cmat.T, axis=1).astype("int32")
                yield pd.DataFrame(
                    {"_id_": pdf["_id_"], "__cluster": cl, "codes": list(codes)}
                )

        return kernel

    def run(form: str) -> tuple[float, int]:
        df = store.mapInPandas(make_kernel(form), schema=out_schema)
        spark.sparkContext.setJobDescription(f"ab_ingest {form}")
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        chk = df.select(
            F.sum(F.col("__cluster").cast("long"))
            + F.sum(F.aggregate("codes", F.lit(0).cast("long"), lambda a, x: a + x))
        ).collect()[0][0]
        return wall, int(chk)

    # warm both forms once (JIT/worker spin-up outside the measured pairs)
    run("stack"), run("loop")

    results: list[tuple[str, float, int]] = []
    for p in range(pairs):
        order = ["stack", "loop"] if p % 2 == 0 else ["loop", "stack"]
        for form in order:
            wall, chk = run(form)
            results.append((form, wall, chk))
            print(
                f"[ab_ingest] pair {p} {form:5s} wall {wall:6.2f} s "
                f"chk {chk} load {loadavg():.1f}",
                flush=True,
            )

    chks = {c for _, _, c in results}
    assert len(chks) == 1, f"checksum mismatch: {chks}"
    a = sorted(w for f, w, _ in results if f == "stack")
    b = sorted(w for f, w, _ in results if f == "loop")
    med = lambda xs: xs[len(xs) // 2]
    print(
        f"[ab_ingest] medians stack {med(a):.2f} s vs loop {med(b):.2f} s "
        f"= {med(b) / med(a):.2f}x; checksums identical across {len(results)} reps"
    )
    print(f"[ab_ingest] gemm probe at end {gemm_probe():.1f} GF")
    spark.stop()


if __name__ == "__main__":
    main()
