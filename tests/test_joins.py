"""As-of join and bucketized range-count join (operators/joins.py):
brute-force correctness on adversarial fixtures (ties, bucket
boundaries, empty windows) plus plan pins — asof must compile to ONE
key-shuffle with NO join operator; range-count must stay an equi-join
(never BroadcastNestedLoopJoin)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from picovdb_spark.operators.joins import asof_join, range_count_join
from picovdb_spark.plans import explain_str


def _ts(s: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def fixture_dfs(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # left: (lid, key, ts) ; right: (key, ts, rid, val)
    left = [
        (1, "a", _ts(10.0)),
        (2, "a", _ts(20.0)),
        (3, "a", _ts(20.0)),  # duplicate left ts
        (4, "b", _ts(5.0)),   # before any right row
        (5, "b", _ts(3600.0)),
        (6, "c", _ts(50.0)),  # key with no right rows at all
    ]
    right = [
        ("a", _ts(10.0), 100, 1.0),   # == left ts 10: strict excludes
        ("a", _ts(15.0), 101, 2.0),
        ("a", _ts(15.0), 102, 3.0),   # tie on ts: max rid (102) must win
        ("a", _ts(19.0), 103, None),  # null payload attr must NOT fall through
        ("b", _ts(6.0), 104, 4.0),
        ("b", _ts(3599.0), 105, 5.0),
    ]
    ldf = spark.createDataFrame(left, "lid int, key string, ts timestamp")
    rdf = spark.createDataFrame(right, "key string, ts timestamp, rid int, val double")
    return ldf, rdf


def _brute_asof(left, right, strict):
    out = {}
    for lid, k, lts in left:
        cands = [r for r in right if r[0] == k and (r[1] < lts if strict else r[1] <= lts)]
        if cands:
            best = max(cands, key=lambda r: (r[1], r[2]))
            out[lid] = (best[1], best[2], best[3])
        else:
            out[lid] = (None, None, None)
    return out


@pytest.mark.parametrize("strict", [True, False])
def test_asof_matches_brute_force(spark, fixture_dfs, strict):
    ldf, rdf = fixture_dfs
    res = asof_join(ldf, rdf, on="key", strict=strict, tie_break="rid")
    got = {
        r["lid"]: (r["asof_ts"], r["rid"], r["val"])
        for r in res.collect()
    }
    left = [tuple(r) for r in ldf.collect()]
    right = [tuple(r) for r in rdf.collect()]
    assert got == _brute_asof(left, right, strict)


def test_asof_null_attr_not_looked_through(spark, fixture_dfs):
    """Right row at t=19 has val=None; a struct-naive impl would carry
    the older non-null val (3.0) forward. The payload must arrive as the
    whole winning row: val is None, rid is 103."""
    ldf, rdf = fixture_dfs
    row = {
        r["lid"]: r
        for r in asof_join(ldf, rdf, on="key", tie_break="rid").collect()
    }[2]
    assert row["rid"] == 103 and row["val"] is None


def test_asof_plan_one_shuffle_no_join(spark, fixture_dfs):
    ldf, rdf = fixture_dfs
    plan = explain_str(asof_join(ldf, rdf, on="key", tie_break="rid"), mode="simple")
    assert "Join" not in plan, plan
    n_exch = plan.count("Exchange hashpartitioning")
    assert n_exch == 1, plan


def test_asof_collision_check_allows_shared_ts_name(spark, fixture_dfs):
    ldf, rdf = fixture_dfs
    # both sides named ts: fine (output renames to asof_ts) …
    cols = set(asof_join(ldf, rdf, on="key").columns)
    assert "asof_ts" in cols and "ts" in cols
    # … but a genuine output collision still raises
    with pytest.raises(ValueError, match="colliding"):
        asof_join(ldf.withColumnRenamed("lid", "rid"), rdf, on="key")


def _brute_range_count(left, right, lo, up):
    return {
        lid: sum(
            1
            for rk, rts in right
            if rk == k
            and rts >= lts + dt.timedelta(seconds=lo)
            and rts < lts + dt.timedelta(seconds=up)
        )
        for lid, k, lts in left
    }


def test_range_count_matches_brute_force(spark, fixture_dfs):
    ldf, rdf = fixture_dfs
    rslim = rdf.select("key", "ts")
    for lo, up in [(-3600.0, 0.0), (-10.0, 0.0), (-5.0, 5.0), (0.0, 100.0)]:
        res = range_count_join(ldf, rslim, on="key", lower_s=lo, upper_s=up)
        got = {r["lid"]: r["n_in_range"] for r in res.collect()}
        left = [tuple(r) for r in ldf.collect()]
        right = [tuple(r) for r in rslim.collect()]
        assert got == _brute_range_count(left, right, lo, up), (lo, up)


def test_range_count_bucket_boundary_exact(spark):
    """Windows landing exactly on bucket edges: right rows at the window's
    closed lower bound count, at the open upper bound don't."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ldf = spark.createDataFrame([(1, "k", _ts(100.0))], "lid int, key string, ts timestamp")
    rdf = spark.createDataFrame(
        [("k", _ts(40.0)), ("k", _ts(99.999999)), ("k", _ts(100.0)), ("k", _ts(39.999999))],
        "key string, ts timestamp",
    )
    res = range_count_join(ldf, rdf, on="key", lower_s=-60.0, upper_s=0.0).collect()
    assert res[0]["n_in_range"] == 2  # 40.0 (closed lo) + 99.999999; 100.0 open


def test_range_count_plan_is_equi_join(spark, fixture_dfs):
    ldf, rdf = fixture_dfs
    plan = explain_str(range_count_join(ldf, rdf.select("key", "ts"), on="key"))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


@pytest.fixture(scope="module")
def skewed_dfs(spark):
    """Deliberately hot key: 'hot' carries 2000 of 2060 right rows inside
    one window-width bucket (the single-join-task worst case); 'u0'-'u59'
    are uniform background keys."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    left = [(i, "hot", _ts(50.0 + i)) for i in range(20)] + [
        (100 + i, f"u{i}", _ts(30.0 + i)) for i in range(60)
    ]
    right = [("hot", _ts(float(i % 100))) for i in range(2000)] + [
        (f"u{i}", _ts(25.0 + i)) for i in range(60)
    ]
    ldf = spark.createDataFrame(left, "lid int, key string, ts timestamp")
    rdf = spark.createDataFrame(right, "key string, ts timestamp")
    return ldf, rdf


def test_range_count_salted_matches_unsalted_on_skew(spark, skewed_dfs):
    """The salted two-phase variant must be bit-identical to the plain
    bucketized join on a hot-key distribution (partial per-salt counts
    combine exactly), including empty-window left rows staying 0."""
    ldf, rdf = skewed_dfs
    plain = range_count_join(ldf, rdf, on="key", lower_s=-100.0, upper_s=0.0)
    salted = range_count_join(
        ldf, rdf, on="key", lower_s=-100.0, upper_s=0.0, n_salts=8
    )
    got_plain = {r["lid"]: r["n_in_range"] for r in plain.collect()}
    got_salted = {r["lid"]: r["n_in_range"] for r in salted.collect()}
    assert got_salted == got_plain
    left = [tuple(r) for r in ldf.collect()]
    right = [tuple(r) for r in rdf.collect()]
    assert got_salted == _brute_range_count(left, right, -100.0, 0.0)


def test_range_count_salted_plan_joins_on_salt(spark, skewed_dfs):
    """Plan pin: the salt must be part of the equi-join key (that's what
    splits the hot pair across n_salts tasks), and salting must not
    degrade the join to a nested loop."""
    ldf, rdf = skewed_dfs
    plan = explain_str(
        range_count_join(ldf, rdf, on="key", n_salts=8), mode="simple"
    )
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "__salt" in plan, plan


def test_range_count_salted_rejects_bad_n_salts(spark, skewed_dfs):
    ldf, rdf = skewed_dfs
    with pytest.raises(ValueError, match="n_salts"):
        range_count_join(ldf, rdf, on="key", n_salts=0)
    with pytest.raises(ValueError, match="n_salts"):
        range_count_join(ldf, rdf, on="key", n_salts="sometimes")


def test_range_count_auto_salt_routes_and_stays_exact(spark, skewed_dfs):
    """n_salts='auto': past the work threshold the plan must salt (and
    stay exact); below it, no salt column appears in the plan. The hot
    (key, bucket) pair here is ~20 left probes × ~2000 right rows."""
    from picovdb_spark.operators.joins import _auto_salt_count

    ldf, rdf = skewed_dfs
    # decision probe directly: full sampling, low threshold → salts
    n = _auto_salt_count(
        ldf, rdf, on="key", left_ts="ts", right_ts="ts",
        width=100_000_000, lo=-100_000_000, up=0,
        threshold=1000, sample_fraction=1.0,
    )
    assert n is not None and 2 <= n <= 64
    # high threshold → plain
    assert (
        _auto_salt_count(
            ldf, rdf, on="key", left_ts="ts", right_ts="ts",
            width=100_000_000, lo=-100_000_000, up=0,
            threshold=10_000_000, sample_fraction=1.0,
        )
        is None
    )
    auto = range_count_join(
        ldf, rdf, on="key", lower_s=-100.0, upper_s=0.0,
        n_salts="auto", auto_salt_threshold=1000, auto_salt_sample=1.0,
    )
    assert "__salt" in explain_str(auto, mode="simple")
    got = {r["lid"]: r["n_in_range"] for r in auto.collect()}
    left = [tuple(r) for r in ldf.collect()]
    right = [tuple(r) for r in rdf.collect()]
    assert got == _brute_range_count(left, right, -100.0, 0.0)
    plain_auto = range_count_join(
        ldf, rdf, on="key", lower_s=-100.0, upper_s=0.0,
        n_salts="auto", auto_salt_threshold=10_000_000, auto_salt_sample=1.0,
    )
    assert "__salt" not in explain_str(plain_auto, mode="simple")


def test_asof_on_skewed_key_still_exact(spark, skewed_dfs):
    """The as-of join has no salted variant (carry-forward semantics
    can't split); pin that the documented one-shuffle shape stays exact
    under the same hot-key fixture."""
    ldf, rdf = skewed_dfs
    rdf2 = rdf.withColumn("rid", F.monotonically_increasing_id())
    res = asof_join(ldf, rdf2, on="key", tie_break="rid")
    got = {r["lid"]: r["asof_ts"] for r in res.collect()}
    left = [tuple(r) for r in ldf.collect()]
    right = [tuple(r) for r in rdf2.collect()]
    brute = {}
    for lid, k, lts in left:
        cands = [r for r in right if r[0] == k and r[1] < lts]
        brute[lid] = max(cands, key=lambda r: (r[1], r[2]))[1] if cands else None
    assert got == brute


@pytest.mark.parametrize("strict", [True, False])
@pytest.mark.parametrize("bucket_s", [7.0, 100.0, 5000.0])
def test_asof_time_bucketed_matches_brute_force(spark, fixture_dfs, strict, bucket_s):
    """The time-bucketed hot-key guard must be exact at every width:
    narrow (rows scatter across many buckets, matches cross bucket
    boundaries via seed rows), medium, and wider-than-data (single
    bucket ≡ plain path). Widths hit bucket-start == left-ts alignment
    (ts=10 with width 5/100) so the seed's sorts-first contract is
    exercised at the boundary."""
    ldf, rdf = fixture_dfs
    res = asof_join(
        ldf, rdf, on="key", strict=strict, tie_break="rid", time_bucket_s=bucket_s
    )
    got = {r["lid"]: (r["asof_ts"], r["rid"], r["val"]) for r in res.collect()}
    left = [tuple(r) for r in ldf.collect()]
    right = [tuple(r) for r in rdf.collect()]
    assert got == _brute_asof(left, right, strict)


def test_asof_time_bucketed_on_dominant_key(spark, skewed_dfs):
    """One key holding ~97% of right rows: the bucketed variant must
    stay exact (including left rows whose nearest right row is many
    buckets earlier) and its main window must partition on (key, time
    bucket) so the hot key's sort splits into #buckets tasks."""
    ldf, rdf = skewed_dfs
    rdf2 = rdf.withColumn("rid", F.monotonically_increasing_id())
    res = asof_join(ldf, rdf2, on="key", tie_break="rid", time_bucket_s=10.0)
    got = {r["lid"]: r["asof_ts"] for r in res.collect()}
    left = [tuple(r) for r in ldf.collect()]
    right = [tuple(r) for r in rdf2.collect()]
    brute = {}
    for lid, k, lts in left:
        cands = [r for r in right if r[0] == k and r[1] < lts]
        brute[lid] = max(cands, key=lambda r: (r[1], r[2]))[1] if cands else None
    assert got == brute
    plan = explain_str(
        asof_join(ldf, rdf2, on="key", tie_break="rid", time_bucket_s=10.0),
        mode="simple",
    )
    assert "__bkt" in plan, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan


def test_asof_time_bucketed_rejects_bad_width(spark, fixture_dfs):
    ldf, rdf = fixture_dfs
    with pytest.raises(ValueError, match="time_bucket_s"):
        asof_join(ldf, rdf, on="key", time_bucket_s=0.0)


def test_asof_auto_guard_routing_decision(spark, skewed_dfs):
    """The sampled probe must route: hot key past the threshold →
    bucketing with a positive width; below the threshold (or with a
    degenerate zero-span hot key) → plain path (None)."""
    from picovdb_spark.operators.joins import _auto_guard_bucket_s

    ldf, rdf = skewed_dfs
    # the 'hot' key holds ~2020 of ~2140 rows — with full sampling and a
    # low threshold the probe must detect it and size buckets to it
    width = _auto_guard_bucket_s(
        ldf, rdf, on="key", left_ts="ts", right_ts="ts",
        threshold=1000, sample_fraction=1.0,
    )
    assert width is not None and width > 0
    # below threshold: plain path
    assert (
        _auto_guard_bucket_s(
            ldf, rdf, on="key", left_ts="ts", right_ts="ts",
            threshold=10_000, sample_fraction=1.0,
        )
        is None
    )
    # degenerate span — every hot-key row at one instant: bucketing
    # cannot split that, plain path
    r_one = rdf.withColumn("ts", F.lit(_ts(0.0)).cast("timestamp"))
    l_one = ldf.withColumn("ts", F.lit(_ts(0.0)).cast("timestamp"))
    assert (
        _auto_guard_bucket_s(
            l_one, r_one, on="key", left_ts="ts", right_ts="ts",
            threshold=1000, sample_fraction=1.0,
        )
        is None
    )


def test_asof_auto_guard_matches_plain_on_skew(spark, skewed_dfs):
    """auto_guard=True with a threshold the hot key crosses must return
    exactly the plain path's rows (the guard changes the plan, never
    the answer)."""
    ldf, rdf = skewed_dfs
    rdf2 = rdf.withColumn("rid", F.monotonically_increasing_id())
    plain = asof_join(ldf, rdf2, on="key", tie_break="rid")
    guarded = asof_join(
        ldf, rdf2, on="key", tie_break="rid",
        auto_guard=True, auto_guard_threshold=1000, auto_guard_sample=1.0,
    )
    got_p = {r["lid"]: (r["asof_ts"], r["rid"]) for r in plain.collect()}
    got_g = {r["lid"]: (r["asof_ts"], r["rid"]) for r in guarded.collect()}
    assert got_g == got_p
    # and the guarded plan really took the bucketed shape
    plan = explain_str(guarded, mode="simple")
    assert "__bkt" in plan, plan


def test_asof_explicit_bucket_overrides_auto_guard(spark, fixture_dfs):
    """An explicit time_bucket_s wins: the probe must not run (no
    sample jobs) and the requested width must be used."""
    ldf, rdf = fixture_dfs
    res = asof_join(
        ldf, rdf, on="key", tie_break="rid",
        time_bucket_s=100.0, auto_guard=True, auto_guard_threshold=1,
    )
    got = {r["lid"]: (r["asof_ts"], r["rid"], r["val"]) for r in res.collect()}
    left = [tuple(r) for r in ldf.collect()]
    right = [tuple(r) for r in rdf.collect()]
    assert got == _brute_asof(left, right, True)


def test_range_count_keeps_duplicate_left_rows(spark):
    """Two byte-identical left events are distinct observations: each
    must keep its own output row (regression: the final groupBy once
    merged them into one row with a single count)."""
    left = [(u, _ts(50.0)) for u in ["a", "a", "b"]]  # two identical 'a' rows
    right = [("a", _ts(40.0)), ("a", _ts(45.0)), ("b", _ts(49.0))]
    ldf = spark.createDataFrame(left, "key string, ts timestamp")
    rdf = spark.createDataFrame(right, "key string, ts timestamp")
    out = range_count_join(ldf, rdf, on="key", lower_s=-100.0, upper_s=0.0).collect()
    assert len(out) == 3
    counts = sorted((r["key"], r["n_in_range"]) for r in out)
    assert counts == [("a", 2), ("a", 2), ("b", 1)]
