"""r13 phase profile of window_dedup at the 1M-doc bench tier.

Replicates bench.py's _prepare_docs1m corpus exactly (deterministic from
doc_id), then times each phase of window_dedup(window=8) with noop
forces so the wall decomposes: hash kernel, checkpoint, election,
loser/removal collapse, full operator. Run isolated:

    python scripts/profile_r13_window.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from picovdb_spark.session import get_spark


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    spark = get_spark("r13_window_profile")
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

    docs = spark.range(n_docs).repartition(parts).mapInPandas(gen, schema=schema).cache()
    docs.count()
    # worker warm pass (same as bench main())
    warm = spark.range(64).repartition(32)
    warm.mapInPandas(lambda it: it, schema="id long").write.mode("overwrite").format("noop").save()

    from picovdb_spark.operators.dedup import (
        _min_first_election,
        _window_hash_rows,
        window_dedup,
    )

    window = 8
    t = {}

    spark.sparkContext.setJobDescription("phase: hash kernel only")
    t0 = time.perf_counter()
    wins_lazy = _window_hash_rows(docs, "doc_id", "text", window)
    noop(wins_lazy)
    t["hash_kernel_noop"] = time.perf_counter() - t0

    spark.sparkContext.setJobDescription("phase: kernel + eager checkpoint")
    t0 = time.perf_counter()
    wins = _window_hash_rows(docs, "doc_id", "text", window).localCheckpoint(eager=True)
    t["kernel_plus_checkpoint"] = time.perf_counter() - t0
    n_wins = wins.count()
    t["n_windows"] = n_wins

    spark.sparkContext.setJobDescription("phase: election agg")
    t0 = time.perf_counter()
    agg = _min_first_election(wins, ["__h1", "__h2"], "doc_id", "s", with_count=True)
    noop(agg)
    t["election_noop"] = time.perf_counter() - t0

    spark.sparkContext.setJobDescription("phase: losers + removal collapse")
    t0 = time.perf_counter()
    agg2 = (
        _min_first_election(wins, ["__h1", "__h2"], "doc_id", "s", with_count=True)
        .withColumnRenamed("doc_id", "__wid")
        .withColumnRenamed("s", "__ws")
    )
    losers = (
        wins.join(agg2.filter(F.col("__c") > 1), on=["__h1", "__h2"])
        .filter(~((F.col("doc_id") == F.col("__wid")) & (F.col("s") == F.col("__ws"))))
        .select(F.col("doc_id"), F.col("s"))
    )
    removal = (
        losers.select(
            F.col("doc_id"),
            F.explode(F.sequence(F.col("s"), F.col("s") + F.lit(window - 1))).alias("pos"),
        )
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("pos")).alias("__rm"))
    )
    noop(removal)
    t["losers_removal_noop"] = time.perf_counter() - t0

    spark.sparkContext.setJobDescription("full operator (fresh lineage)")
    t0 = time.perf_counter()
    noop(window_dedup(docs, window=window))
    t["full_operator_noop"] = time.perf_counter() - t0

    # repeat the full operator to see warm steady-state
    t0 = time.perf_counter()
    noop(window_dedup(docs, window=window))
    t["full_operator_noop_2nd"] = time.perf_counter() - t0

    for k, v in t.items():
        print(f"{k:28s} {v:10.3f}" if isinstance(v, float) else f"{k:28s} {v:10d}")


if __name__ == "__main__":
    main()
