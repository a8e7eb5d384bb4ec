"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 and compares against its
``oracle_sql()`` via DuckDB: row count, column names, and order-insensitive
values (sorted rows, floats compared exactly after the suite's own rounding
discipline — the point is to catch any cross-engine nondeterminism BEFORE the
driver does). Comparison logic lives in ``wicsmmiretl_spark.oracle`` and is
shared with ``tests/test_deferred_oracle.py``.

Usage: python tools/verify_local.py [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from wicsmmiretl_spark.oracle import compare_query, duck_connection

SF_DIR = "/root/testdata/sf0.01"


def main() -> int:
    import __spark_entry__ as e
    from wicsmmiretl_spark.session import get_spark

    spark = get_spark("verify_local")
    con = duck_connection(SF_DIR)

    qs = e.queries()
    oracles = e.oracle_sql()
    only = set(sys.argv[1:])
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            problems = compare_query(spark, con, fn, oracles.get(name), SF_DIR)
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: {type(ex).__name__}: {ex}")
            continue
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        elif name not in oracles:
            print(f"ok?   {name}: rows-only ({time.time()-t0:.1f}s) — no oracle")
        else:
            print(f"PASS  {name} ({time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
