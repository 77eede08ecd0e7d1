"""Kernel-ONLY interleaved A/B: materialize _window_hash_rows (poly vs
md5) at 1M docs with a consume-everything agg — no election, no joins,
no checkpoint. Separates the kernel's wall from the rest of
window_dedup (RUNBOOK §2.5/§2.7)."""
import sys, time
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from scripts.ab_r12 import build_docs1m, loadavg
from picovdb_spark.session import get_spark
from picovdb_spark.operators import dedup as D

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")
docs = build_docs1m(spark, string_ids=False)

def run(md5):
    D._FORCE_MD5_WINDOW_HASH = md5
    try:
        t0 = time.perf_counter()
        r = D._window_hash_rows(docs, "doc_id", "text", 8).agg(
            F.count("*").alias("n"),
            F.sum("s").alias("ss"),
            # decimal sums: 31M full-range int64 lanes overflow an ANSI
            # long sum; decimal(38,0) holds ~3e26 comfortably
            F.sum(F.col("__h1").cast("decimal(38,0)")).alias("h1"),
            F.sum(F.col("__h2").cast("decimal(38,0)")).alias("h2"),
            F.sum(F.col("doc_id").cast("decimal(38,0)")).alias("ids"),
        ).collect()[0]
        return time.perf_counter() - t0, tuple(r)
    finally:
        D._FORCE_MD5_WINDOW_HASH = False

pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
res = []
for p in range(pairs):
    order = ("AB" if p % 2 == 0 else "BA")
    rec = {}
    for w in order:
        la = loadavg()
        wall, chk = run(md5=(w == "B"))
        rec[w] = (wall, chk)
        print(f"pair {p} {w}: {wall:.2f}s load={la} n={chk[0]}", flush=True)
    assert rec["A"][1][0] == rec["B"][1][0] and rec["A"][1][1] == rec["B"][1][1] and rec["A"][1][4] == rec["B"][1][4], rec
    res.append(rec)
aw = sorted(r["A"][0] for r in res); bw = sorted(r["B"][0] for r in res)
print(f"KERNEL A(poly)={[round(x,2) for x in aw]} B(md5)={[round(x,2) for x in bw]} ratio={bw[len(bw)//2]/aw[len(aw)//2]:.2f}x", flush=True)
