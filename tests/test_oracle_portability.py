"""Oracle-surface portability gate (VERDICT r11 item 2).

The r11 driver run exposed a class of cross-engine hazard that local
verification cannot catch: oracle SQL whose BYTES depend on the oracle
engine's rendering conventions rather than on the data. Two concrete
instances existed (both in `customer_table_fingerprint`, both fixed in
r12):

1. ``CAST(<double column> AS VARCHAR)`` feeding a hash — double→string
   is shortest-roundtrip rendering, which has changed across DuckDB
   versions while Spark's is JVM-stable, so per-row digests diverge on
   any driver whose DuckDB renders differently than the one used for
   local verification.
2. A ``DECIMAL(38,0)`` / HUGEINT OUTPUT column — the comparator's value
   normalization of wide-decimal returns differs between Spark's Decimal
   and DuckDB's HUGEINT/DECIMAL python bindings.

This test turns the incident into a regression gate: it scans all 216
oracle SQL strings for hazard 1 (regex over bare-identifier casts,
checked against the actual float/double columns of the testdata
schemas) and binds every oracle with DuckDB ``DESCRIBE`` (no execution)
to assert no output column is DECIMAL-typed or HUGEINT (hazard 2).
The allowlists are empty and must stay empty — a query that genuinely
needs either construct should instead pin the rendering (cast through a
fixed-scale DECIMAL before stringifying) or fold the wide integer to
BIGINT (e.g. wrap mod 2^64) before it crosses the comparator.

Limitations (documented, acceptable for a regression gate): the regex
catches casts of BARE column identifiers only — `CAST(x*2 AS VARCHAR)`
would not match — and the double-column set is derived from the base
parquet schemas, so a double created inside a CTE and then stringified
is only caught if it escapes as a decimal/hugeint output. Both escapes
are far outside the suite's current idiom.
"""

from __future__ import annotations

import os
import re

import duckdb
import pyarrow.parquet as pq
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")

# Intentionally empty. Adding a name here requires a docstring in the
# query explaining why the engine-rendering dependence is safe.
DOUBLE_TO_VARCHAR_ALLOWLIST: frozenset[str] = frozenset()
DECIMAL_OUTPUT_ALLOWLIST: frozenset[str] = frozenset()

_CAST_VARCHAR = re.compile(r"CAST\(\s*([A-Za-z_][\w.]*)\s+AS\s+VARCHAR\s*\)", re.I)


@pytest.fixture(scope="module")
def oracles():
    import __spark_entry__ as entry

    return entry.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


@pytest.fixture(scope="module")
def double_columns():
    cols = set()
    for t in TABLES:
        for field in pq.read_schema(os.path.join(SF_DIR, f"{t}.parquet")):
            if str(field.type) in ("double", "float"):
                cols.add(field.name)
    assert "c_acctbal" in cols  # sanity: the schema scan actually worked
    return cols


def test_no_double_to_varchar_cast_in_oracle_sql(oracles, double_columns):
    offenders = {}
    for name, sql in oracles.items():
        if name in DOUBLE_TO_VARCHAR_ALLOWLIST:
            continue
        hits = [
            m.group(0)
            for m in _CAST_VARCHAR.finditer(sql)
            if m.group(1).split(".")[-1] in double_columns
        ]
        if hits:
            offenders[name] = hits
    assert not offenders, (
        "oracle SQL casts a float/double column straight to VARCHAR — "
        "engine-version-dependent rendering; pin it through a fixed-scale "
        f"DECIMAL first: {offenders}"
    )


def test_no_decimal_or_hugeint_output_columns(oracles, con):
    offenders = {}
    bind_errors = {}
    for name, sql in oracles.items():
        if name in DECIMAL_OUTPUT_ALLOWLIST:
            continue
        try:
            desc = con.execute("DESCRIBE " + sql).fetchall()
        except Exception as exc:  # a DESCRIBE bind failure is itself a defect
            bind_errors[name] = str(exc).splitlines()[0]
            continue
        bad = [
            (col, typ)
            for col, typ, *_ in desc
            if typ.upper().startswith("DECIMAL") or typ.upper() == "HUGEINT"
        ]
        if bad:
            offenders[name] = bad
    assert not bind_errors, f"oracle SQL failed to bind under DESCRIBE: {bind_errors}"
    assert not offenders, (
        "oracle output schema contains DECIMAL/HUGEINT columns — comparator "
        "value-normalization is engine-dependent for these; fold to BIGINT "
        f"(e.g. wrap mod 2^64) or DOUBLE before output: {offenders}"
    )
