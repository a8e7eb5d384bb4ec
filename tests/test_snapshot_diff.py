"""snapshot_diff unit tests: change classification, NULL-value and NULL-key
handling, changed-column lists, compare-column scoping, validation."""

from __future__ import annotations

import pytest

from wicsmmiretl_spark.operators.merge import snapshot_diff

SCHEMA = "k: bigint, a: string, b: double"


def test_validates_columns(spark):
    df = spark.createDataFrame([(1, "x", 1.0)], SCHEMA)
    with pytest.raises(ValueError, match="key columns"):
        snapshot_diff(df, df, ["nope"])
    with pytest.raises(ValueError, match="compare columns"):
        snapshot_diff(df, df, ["k"], compare_cols=["ghost"])


def test_classifies_changes(spark):
    old = spark.createDataFrame(
        [(1, "same", 1.0), (2, "gone", 2.0), (3, "before", 3.0)], SCHEMA
    )
    new = spark.createDataFrame(
        [(1, "same", 1.0), (3, "after", 3.5), (4, "fresh", 4.0)], SCHEMA
    )
    out = {r.k: (r.change_type, r.changed_cols) for r in snapshot_diff(old, new, ["k"]).collect()}
    assert out == {
        2: ("delete", []),
        3: ("update", ["a", "b"]),
        4: ("insert", []),
    }  # key 1 unchanged -> absent


def test_null_value_transitions_are_updates(spark):
    old = spark.createDataFrame([(1, None, 1.0), (2, "x", None)], SCHEMA)
    new = spark.createDataFrame([(1, "now", 1.0), (2, "x", None)], SCHEMA)
    out = {r.k: (r.change_type, r.changed_cols) for r in snapshot_diff(old, new, ["k"]).collect()}
    assert out == {1: ("update", ["a"])}  # NULL==NULL is not a change


def test_null_keys_pair_null_safely(spark):
    old = spark.createDataFrame([(None, "v", 1.0)], SCHEMA)
    new = spark.createDataFrame([(None, "w", 1.0)], SCHEMA)
    out = snapshot_diff(old, new, ["k"]).collect()
    assert len(out) == 1 and out[0].change_type == "update" and out[0].changed_cols == ["a"]


def test_compare_cols_scope(spark):
    old = spark.createDataFrame([(1, "x", 1.0)], SCHEMA)
    new = spark.createDataFrame([(1, "x", 9.0)], SCHEMA)
    # b changed, but only a is compared -> no diff row at all.
    assert snapshot_diff(old, new, ["k"], compare_cols=["a"]).count() == 0
