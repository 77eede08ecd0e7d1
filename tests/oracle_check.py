"""Standalone full oracle comparison (the driver's t2 gate, runnable
directly): every `__spark_entry__.queries()` entry vs its DuckDB
`oracle_sql()` twin at sf0.01.

    cd /root/repo && python tests/oracle_check.py [name ...]

Exits non-zero on the first mismatch. Reuses the pytest implementation in
tests/test_oracle.py so there is exactly one comparison semantics.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import duckdb

    import __spark_entry__ as entry_mod
    from picovdb_spark.session import get_spark
    from tests.conftest import SF_DIR_CORRECTNESS
    from tests.test_oracle import TABLES

    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR_CORRECTNESS}/{t}.parquet'")

    from tests import test_oracle

    names = sys.argv[1:] or sorted(entry_mod.queries().keys())
    failed = []
    for name in names:
        try:
            test_oracle.test_query_matches_oracle(name, spark, con)
            kind = "oracle" if name in entry_mod.oracle_sql() else "rows-only"
            print(f"  OK   {name} ({kind})")
        except AssertionError as ex:
            failed.append(name)
            print(f"  FAIL {name}: {ex}")
    print(f"{len(names) - len(failed)}/{len(names)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
