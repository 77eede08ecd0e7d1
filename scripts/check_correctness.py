"""Local simulation of the driver's correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` at sf0.01 and compares
against its ``oracle_sql()`` twin executed by DuckDB over the same parquet
tables.  Comparison mirrors the driver: row count, column-name set (sorted),
and a value comparison over rows sorted by all columns (floats compared with a
small tolerance rather than a hash so that local runs are robust).

Usage:
    python scripts/check_correctness.py [entry ...]     # default: all
"""
from __future__ import annotations

import json
import math
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    return v


def _values_close(a, b) -> bool:
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_values_close(x, y) for x, y in zip(a, b))
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return a == b
        if math.isnan(fa) and math.isnan(fb):
            return True
        return math.isclose(fa, fb, rel_tol=1e-5, abs_tol=1e-6)
    return a == b


def _to_sorted_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple(repr(x) for x in t))
    return [cols[i] for i in order], out


def _multiset_match(sr, orr) -> bool:
    """True iff the two row lists match as multisets under
    `_values_close`. Greedy O(n·m) fallback for rows the repr-sort
    misaligned; exact-equal rows are first removed via a counter so the
    quadratic part only sees the disagreeing remainder."""
    from collections import Counter

    ca, cb = Counter(sr), Counter(orr)
    rest_a = list((ca - cb).elements())
    rest_b = list((cb - ca).elements())
    if len(rest_a) != len(rest_b):
        return False
    for a in rest_a:
        for j, b in enumerate(rest_b):
            if _values_close(a, b):
                rest_b.pop(j)
                break
        else:
            return False
    return True


def main(argv):
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    wanted = argv or list(qs)

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("check-correctness")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    results = {}
    for name in wanted:
        if name not in qs:
            print(f"?? {name}: not registered", flush=True)
            continue
        rec = {"rows_match": None, "schema_match": None, "hash_match": None, "err": None}
        try:
            sdf = qs[name](spark, SF_DIR)
            scols = list(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(srows)
            if name in oracles:
                ocur = con.execute(oracles[name])
                ocols = [d[0] for d in ocur.description]
                orows = [tuple(r) for r in ocur.fetchall()]
                rec["oracle_rows"] = len(orows)
                rec["rows_match"] = len(srows) == len(orows)
                sc, sr = _to_sorted_rows(scols, srows)
                oc, orr = _to_sorted_rows(ocols, orows)
                rec["schema_match"] = sc == oc
                aligned = (
                    rec["rows_match"]
                    and rec["schema_match"]
                    and all(_values_close(a, b) for a, b in zip(sr, orr))
                )
                if rec["rows_match"] and rec["schema_match"] and not aligned:
                    # the repr-sort can misalign rows whose floats round
                    # differently at the 6-dp boundary even though every
                    # value is inside the comparison tolerance — fall
                    # back to tolerance-aware greedy multiset matching
                    # (quadratic; entry outputs are a few thousand rows)
                    aligned = _multiset_match(sr, orr)
                rec["hash_match"] = aligned
                if not rec["rows_match"]:
                    rec["err"] = f"rows spark={len(srows)} oracle={len(orows)}"
                elif rec["schema_match"] is False:
                    rec["err"] = f"schema spark={sc} oracle={oc}"
                elif rec["rows_match"] and not rec["hash_match"]:
                    bad = next(
                        (i for i, (a, b) in enumerate(zip(sr, orr)) if not _values_close(a, b)),
                        None,
                    )
                    rec["err"] = f"value mismatch at sorted row {bad}: spark={sr[bad]} oracle={orr[bad]}"
            else:
                rec["err"] = "no_oracle"
        except Exception:
            rec["err"] = traceback.format_exc(limit=6)
        ok = rec.get("hash_match")
        tag = "OK " if ok else ("--- " if rec["err"] == "no_oracle" else "FAIL")
        print(f"{tag} {name}: rows={rec.get('spark_rows')} err={None if ok else rec['err']}", flush=True)
        results[name] = rec

    n_ok = sum(1 for r in results.values() if r.get("hash_match"))
    n_no = sum(1 for r in results.values() if r.get("err") == "no_oracle")
    print(f"\n{n_ok} green, {n_no} no_oracle, {len(results) - n_ok - n_no} failing of {len(results)}")
    with open("/tmp/correctness_local.json", "w") as f:
        json.dump(results, f, indent=1, default=str)
    spark.stop()
    return 0 if n_ok + n_no == len(results) else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
