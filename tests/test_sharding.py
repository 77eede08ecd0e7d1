"""shard_plan / shard_manifest / write_training_shards — deterministic
training-shard dealing, balance bounds, round-trip, and a bit-exact
DuckDB twin of the (seed, id) pseudo-shuffle."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from picovdb_spark.operators.ordering import release_global_rank
from picovdb_spark.operators.sharding import (
    shard_manifest,
    shard_plan,
    write_training_shards,
)

N = 7


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "text"
    )


@pytest.fixture(scope="module")
def plan_rows(docs):
    plan = shard_plan(docs, N)
    rows = {r["doc_id"]: (r["shard"], r["shard_pos"]) for r in plan.collect()}
    release_global_rank(plan)
    return rows


def test_deterministic_and_seed_sensitive(docs, plan_rows):
    plan2 = shard_plan(docs, N)
    again = {r["doc_id"]: (r["shard"], r["shard_pos"]) for r in plan2.collect()}
    release_global_rank(plan2)
    assert again == plan_rows
    plan3 = shard_plan(docs, N, seed="v2")
    redeal = {r["doc_id"]: (r["shard"], r["shard_pos"]) for r in plan3.collect()}
    release_global_rank(plan3)
    assert redeal != plan_rows  # a new seed re-deals the shuffle


def test_balance_and_dense_positions(plan_rows):
    by_shard: dict[int, list[int]] = {}
    for shard, pos in plan_rows.values():
        by_shard.setdefault(shard, []).append(pos)
    sizes = [len(v) for v in by_shard.values()]
    assert sorted(by_shard) == list(range(N))
    assert max(sizes) - min(sizes) <= 1  # round-robin: within one doc
    for v in by_shard.values():  # positions are dense 0..k-1
        assert sorted(v) == list(range(len(v)))


def test_duckdb_twin(sf_dir, plan_rows):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            f"""
            SELECT doc_id,
                   CAST((rn - 1) % {N} AS INT) AS shard,
                   CAST((rn - 1) // {N} AS BIGINT) AS shard_pos
            FROM (SELECT doc_id, row_number() OVER (
                    ORDER BY md5('shard-v1:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
                  FROM documents)
            """
        ).fetchall()
    }
    assert plan_rows == want


def test_write_round_trip(docs, tmp_path, spark):
    out = str(tmp_path / "shards")
    manifest = write_training_shards(
        docs.withColumn("n_tokens", F.size(F.split("text", " "))),
        out,
        3,
        tokens_col="n_tokens",
    )
    rows = {r["shard"]: (r["n_docs"], r["n_tokens"]) for r in manifest.collect()}
    assert sorted(rows) == [0, 1, 2]
    total_docs = docs.count()
    assert sum(d for d, _ in rows.values()) == total_docs
    assert max(d for d, _ in rows.values()) - min(d for d, _ in rows.values()) <= 1
    back = spark.read.parquet(out)
    assert back.count() == total_docs
    # every doc present exactly once, shard dirs partition the corpus
    assert back.select("doc_id").distinct().count() == total_docs
    # within a shard the dealt order is dense
    pos = [r["shard_pos"] for r in back.filter(F.col("shard") == 0).collect()]
    assert sorted(pos) == list(range(len(pos)))


def test_manifest_from_plan(docs):
    plan = shard_plan(docs, N)
    m = {r["shard"]: r["n_docs"] for r in shard_manifest(plan).collect()}
    release_global_rank(plan)
    assert sum(m.values()) == docs.count()


def test_validation(docs):
    with pytest.raises(ValueError, match="n_shards"):
        shard_plan(docs, 0)
