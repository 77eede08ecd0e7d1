"""Capture `.explain("formatted")` for every declared query.

Writes one file per entry to the directory given as argv[1]
(default plans/r12/), suffixed with argv[2] (default "after"), e.g.
``plans/r12/dedup_exact_after.txt``.  Runs at $SPARK_GRAFT_SF_DIR
(default sf0.01) so eager sub-steps inside operators stay cheap; the
plan SHAPE (Exchange count, join strategy, PushedFilters, codegen
spans) is scale-independent, which is what the files document.

Usage:
    python scripts/capture_plans.py [outdir] [suffix] [entry ...]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "plans/r12"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "after"
    only = set(sys.argv[3:])
    os.makedirs(outdir, exist_ok=True)

    import __spark_entry__ as entry
    from picovdb_spark.session import get_spark

    spark = get_spark("capture_plans")
    for name, fn in entry.queries().items():
        if only and name not in only:
            continue
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # keep going; record the failure
            plan = f"ERROR building {name}: {exc!r}\n"
        with open(path, "w") as fh:
            fh.write(f"-- {name} @ {SF_DIR}\n{plan}")
        print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
