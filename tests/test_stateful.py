"""Custom stateful operator (applyInPandasWithState): running per-user
profiles over the event stream must agree with the batch groupBy twin
when the whole input arrives in one bounded stream."""

import os
import shutil

from pyspark.sql import functions as F

from picovdb_spark.schema import load_table
from picovdb_spark.streaming import read_events_stream
from picovdb_spark.streaming.stateful import user_activity_profile


def test_profile_stream_matches_batch_groupby(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    d = str(tmp_path / "ev")
    os.makedirs(d, exist_ok=True)
    shutil.copy(os.path.join(sf_dir, "events.parquet"), os.path.join(d, "e.parquet"))

    out = user_activity_profile(read_events_stream(spark, d))
    q = (
        out.writeStream.format("memory")
        .queryName("profiles")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("profiles").collect()
    # one batch ⇒ every user appends exactly one RUNNING profile row;
    # close-out rows additionally appear for users whose last activity
    # predates the final watermark by > the gap
    running = [r for r in rows if not r["closed_by_timeout"]]
    closed = [r for r in rows if r["closed_by_timeout"]]
    got = {
        r["user_id"]: (r["n_events"], round(r["sum_value"], 6), r["last_ts_epoch"])
        for r in running
    }
    # any close-out must agree with that user's running profile
    for r in closed:
        assert got[r["user_id"]] == (
            r["n_events"], round(r["sum_value"], 6), r["last_ts_epoch"]
        )

    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("s"),
            F.unix_timestamp(F.max("ts")).alias("last"),
        )
    )
    want = {r["user_id"]: (r["n"], r["s"], r["last"]) for r in batch.collect()}
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0], (u, got[u], want[u])
        assert abs(got[u][1] - want[u][1]) < 1e-6
        assert got[u][2] == want[u][2]
