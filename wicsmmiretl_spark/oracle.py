"""Cross-engine oracle comparison (the driver's correctness gate, locally).

The round driver runs each ``queries()`` entry on Spark AND its
``oracle_sql()`` on DuckDB over the same parquet, then compares row count,
column names, and an order-insensitive value hash with columns sorted by
name. This module reproduces that comparison so it can run anywhere a
regression could hide — ``tools/verify_local.py`` for the full suite,
``tests/test_deferred_oracle.py`` for the queries deferred past the
driver's 50-query window.
"""

from __future__ import annotations

import math

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def norm(v):
    """Engine-neutral value form: floats via repr-stable %.10g, bytes as hex,
    lists as tuples (DuckDB returns Python lists for DuckDB LISTs)."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return str(v)


def duck_connection(sf_dir: str):
    """DuckDB connection with every testdata table registered as a view —
    the same pre-registration the driver provides to oracle SQL."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def compare_query(spark, con, fn, oracle_sql: str | None, sf_dir: str) -> list[str]:
    """Run one query on both engines; return a list of problems (empty =
    match, or rows-only success when ``oracle_sql`` is None)."""
    sdf = fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(norm(v) for v in row) for row in sdf.collect()]
    if oracle_sql is None:
        return []
    rel = con.execute(oracle_sql)
    ocols = [d[0] for d in rel.description]
    orows = [tuple(norm(v) for v in row) for row in rel.fetchall()]
    if sorted(scols) != sorted(ocols):
        return [f"columns spark={scols} duck={ocols}"]
    if len(srows) != len(orows):
        return [f"rowcount spark={len(srows)} duck={len(orows)}"]
    # driver sorts columns by name before hashing values
    sidx = [scols.index(c) for c in sorted(scols)]
    oidx = [ocols.index(c) for c in sorted(ocols)]
    s_sorted = sorted(tuple(r[i] for i in sidx) for r in srows)
    o_sorted = sorted(tuple(r[i] for i in oidx) for r in orows)
    if s_sorted != o_sorted:
        diffs = [(a, b) for a, b in zip(s_sorted, o_sorted) if a != b][:3]
        return [f"values differ; first diffs: {diffs}"]
    return []
