"""Oracle coverage for queries deferred past the driver's 50-query window.

The round driver checks only the first 50 registered queries, so
``suite._DEFERRED_QUERIES`` would otherwise lose automated oracle coverage
(their operators are redundantly covered in-window, but a regression in the
deferred query itself would be invisible). This test runs exactly the
driver's comparison — row count, column names, order-insensitive values vs
DuckDB — on every deferred query at sf0.001 per test run (sf0.01 matches
the driver but costs ~10x the wall-clock; the determinism discipline in
suite.py is scale-independent, and tools/verify_local.py still covers
sf0.01 on demand).
"""

from __future__ import annotations

import pytest

from wicsmmiretl_spark.oracle import compare_query, duck_connection
from wicsmmiretl_spark.suite import ORACLES, QUERIES, _DEFERRED_QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


def test_deferred_list_is_current():
    """Every deferred name exists and is oracle-backed (a rename or oracle
    removal must update the deferred list, not silently skip coverage)."""
    assert set(_DEFERRED_QUERIES) <= set(QUERIES)
    assert set(_DEFERRED_QUERIES) <= set(ORACLES)


@pytest.mark.parametrize("name", sorted(_DEFERRED_QUERIES))
def test_deferred_query_matches_oracle(spark, duck, name):
    problems = compare_query(spark, duck, QUERIES[name], ORACLES[name], SF_DIR)
    assert not problems, f"{name}: {'; '.join(problems)}"
