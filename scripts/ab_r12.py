"""Interleaved A/B harness for the r12 changes (RUNBOOK §2.5 protocol:
alternate both forms in ONE session so oscillating host load hits them
equally; assert identical outputs every rep; publish ratios, not
absolute befores/afters).

Modes (arg 1):
  window       — window_dedup at 1M long-id docs, window=8:
                 A = r12 vectorized polynomial kernel,
                 B = md5 compat kernel (_FORCE_MD5_WINDOW_HASH).
  para_string  — paragraph_dedup at 1M STRING-id docs, sep=' ':
                 A = dense-long surrogate election (r12),
                 B = struct-min SortAggregate fallback
                 (_FORCE_STRUCT_ELECTION).
  window_string — window_dedup at 1M STRING-id docs (both r12 changes
                 compound): A = poly kernel + surrogate election,
                 B = md5 kernel + struct election (the r11 shape).

Pairs are ORDER-BALANCED (AB BA AB BA ...) so in-session warm-up and
drift cancel across pairs. Every rep records wall, the full-output
checksum (sum of crc32 over every output column — consumes everything,
RUNBOOK §2.7), and /proc/loadavg at start.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F


def loadavg() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def build_docs1m(spark, string_ids: bool):
    """The bench _prepare_docs1m corpus (text derives from doc_id alone)."""
    from pyspark.sql import types as T

    n_docs, vocab_n, parts = 1_000_000, 2_000, 32
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )

    def gen(batches):
        import numpy as np
        import pandas as pd

        vocab = np.array([f"w{i}" for i in range(vocab_n)])
        for pdf in batches:
            if pdf.empty:
                continue
            texts = []
            for i in pdf["id"]:
                i = int(i)
                k = i % 40
                base = i - k if k in (1, 2) else i
                rng = np.random.default_rng(base)
                words = vocab[rng.integers(0, vocab_n, 24 + base % 16)]
                if k == 2:
                    words = words.copy()
                    words[6] = vocab[(base + k) % vocab_n]
                texts.append(" ".join(words))
            yield pd.DataFrame({"doc_id": pdf["id"], "text": texts})

    docs = spark.range(n_docs).repartition(parts).mapInPandas(gen, schema=schema)
    if string_ids:
        # URL-shaped keys whose lexicographic order differs from the
        # numeric order — the surrogate must reproduce string order.
        # id_bytes ~ production URL width: the struct-vs-surrogate
        # trade depends on how many id bytes ride the election shuffle
        # and its sort comparisons
        import os

        pad = int(os.environ.get("AB_ID_BYTES", "0"))
        key = F.concat(F.lit("url://d/"), F.col("doc_id").cast("string"))
        if pad:
            key = F.concat(
                F.lit("url://example.com/"),
                F.lpad(F.sha2(F.col("doc_id").cast("string"), 256), pad, "x"),
                F.lit("/d/"),
                F.col("doc_id").cast("string"),
            )
        docs = docs.select(key.alias("doc_id"), "text")
    docs = docs.cache()
    docs.count()
    return docs


def checksum_window(out):
    r = out.agg(
        F.count("*").alias("n"),
        F.sum("n_tokens").alias("nt"),
        F.sum("n_removed").alias("nr"),
        F.sum(F.crc32(F.concat_ws("|", "doc_id", "text_clean"))).alias("crc"),
    ).collect()[0]
    return (r["n"], r["nt"], r["nr"], r["crc"])


def checksum_para(out):
    r = out.agg(
        F.count("*").alias("n"),
        F.sum("n_paras").alias("np"),
        F.sum("n_kept").alias("nk"),
        F.sum(F.crc32(F.concat_ws("|", "doc_id", "text_clean"))).alias("crc"),
    ).collect()[0]
    return (r["n"], r["np"], r["nk"], r["crc"])


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "window"
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from picovdb_spark.session import get_spark
    from picovdb_spark.operators import dedup as D

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    string_ids = mode in ("para_string", "window_string")
    docs = build_docs1m(spark, string_ids)

    def run_window(md5: bool, struct: bool):
        D._FORCE_MD5_WINDOW_HASH = md5
        D._FORCE_STRUCT_ELECTION = struct
        try:
            t0 = time.perf_counter()
            chk = checksum_window(D.window_dedup(docs, window=8))
            return time.perf_counter() - t0, chk
        finally:
            D._FORCE_MD5_WINDOW_HASH = False
            D._FORCE_STRUCT_ELECTION = False

    def run_para(struct: bool):
        D._FORCE_STRUCT_ELECTION = struct
        try:
            t0 = time.perf_counter()
            chk = checksum_para(D.paragraph_dedup(docs, sep=" "))
            return time.perf_counter() - t0, chk
        finally:
            D._FORCE_STRUCT_ELECTION = False

    if mode == "window":
        A = lambda: run_window(md5=False, struct=False)  # noqa: E731
        B = lambda: run_window(md5=True, struct=False)  # noqa: E731
    elif mode == "para_string":
        A = lambda: run_para(struct=False)  # noqa: E731
        B = lambda: run_para(struct=True)  # noqa: E731
    elif mode == "window_string":
        A = lambda: run_window(md5=False, struct=False)  # noqa: E731
        B = lambda: run_window(md5=True, struct=True)  # noqa: E731
    else:
        raise SystemExit(f"unknown mode {mode}")

    results = []
    for p in range(pairs):
        order = "AB" if p % 2 == 0 else "BA"
        rec = {}
        for which in order:
            la = loadavg()
            wall, chk = (A if which == "A" else B)()
            rec[which] = (round(wall, 2), chk, la)
            print(
                f"pair {p} {which}: {wall:.2f}s load={la} chk={chk}",
                flush=True,
            )
        assert rec["A"][1] == rec["B"][1], f"OUTPUT MISMATCH pair {p}: {rec}"
        results.append(rec)

    a_walls = sorted(r["A"][0] for r in results)
    b_walls = sorted(r["B"][0] for r in results)
    med = lambda xs: xs[len(xs) // 2] if len(xs) % 2 else sum(xs[len(xs) // 2 - 1 : len(xs) // 2 + 1]) / 2  # noqa: E731
    print(
        f"MODE={mode} pairs={pairs} A_median={med(a_walls):.2f} "
        f"B_median={med(b_walls):.2f} ratio={med(b_walls)/med(a_walls):.2f}x "
        f"A={a_walls} B={b_walls}",
        flush=True,
    )


if __name__ == "__main__":
    main()
