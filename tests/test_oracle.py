"""Local mirror of the driver's t2 correctness gate: run every
`__spark_entry__.queries()` entry at sf0.01 and compare with its DuckDB
`oracle_sql()` twin — row count, column set, dtype kinds, and
order-insensitive values (exact for non-floats, 1e-9 for floats; the
engine rounds floats to 6 decimals on both sides so they should be
bit-equal — tolerance only covers platform ulps).
"""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR_CORRECTNESS

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR_CORRECTNESS}/{t}.parquet'"
        )
    yield con
    con.close()


def _normalize(df):
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)


QUERY_NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(name, spark, duck):
    oracles = entry_mod.oracle_sql()
    sdf = entry_mod.queries()[name](spark, SF_DIR_CORRECTNESS)
    got = sdf.toPandas()
    if name not in oracles:
        assert len(got) >= 0  # rows-only check (non-SQL-expressible op)
        return
    want = duck.execute(oracles[name]).fetchdf()

    assert sorted(got.columns) == sorted(want.columns), f"{name}: column mismatch"
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    g, w = _normalize(got), _normalize(want)
    for col in g.columns:
        gk, wk = g[col].dtype.kind, w[col].dtype.kind
        assert (gk == wk) or {gk, wk} <= {"i", "u"}, f"{name}.{col}: dtype {g[col].dtype} vs {w[col].dtype}"
        for i, (a, b) in enumerate(zip(g[col], w[col])):
            if isinstance(a, float) or isinstance(b, float):
                ok = (math.isnan(a) and math.isnan(b)) or math.isclose(a, b, rel_tol=0, abs_tol=1e-9)
            else:
                ok = a == b
            assert ok, f"{name}.{col}[{i}]: {a!r} != {b!r}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert "query_id" in df.columns and "_metrics_" in df.columns
