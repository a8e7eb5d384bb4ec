from __future__ import annotations

import pytest
from pyspark.sql import Row

from wicsmmiretl_spark.operators.merge import merge_upsert


def _snapshot(spark):
    return spark.createDataFrame(
        [
            Row(k=1, name="a", bal=10.0),
            Row(k=2, name="b", bal=20.0),
            Row(k=3, name="c", bal=30.0),
        ]
    )


def test_merge_update_insert_passthrough(spark):
    src = spark.createDataFrame(
        [Row(k=2, name="b2", bal=99.0), Row(k=4, name="d", bal=40.0)]
    )
    got = {r.k: (r.name, r.bal) for r in merge_upsert(_snapshot(spark), src, ["k"]).collect()}
    assert got == {1: ("a", 10.0), 2: ("b2", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_merge_source_wins_even_with_null(spark):
    """MERGE semantics: a matched source row overwrites with NULL too —
    coalesce-based folding would silently keep the stale target value."""
    src = spark.createDataFrame(
        [(1, None, None)], schema="k bigint, name string, bal double"
    )
    row = merge_upsert(_snapshot(spark), src, ["k"]).filter("k = 1").collect()[0]
    assert row.name is None and row.bal is None


def test_merge_source_derived_from_target(spark):
    """The change-set is routinely a filter+recompute OF the snapshot —
    the self-join lineage must not trip the analyzer."""
    snap = _snapshot(spark)
    src = snap.filter("k = 3").withColumn("bal", snap.bal * 2)
    got = {r.k: r.bal for r in merge_upsert(snap, src, ["k"]).collect()}
    assert got == {1: 10.0, 2: 20.0, 3: 60.0}


def test_merge_rejects_schema_mismatch_and_bad_key(spark):
    snap = _snapshot(spark)
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_upsert(snap, snap.drop("bal"), ["k"])
    with pytest.raises(ValueError, match="key columns"):
        merge_upsert(snap, snap, ["nope"])
