"""merge_intervals unit tests: overlap/touch/disjoint semantics, containment,
per-key isolation, inverted-interval rejection, timestamp types."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.errors import SparkRuntimeException

from wicsmmiretl_spark.operators.intervals import merge_intervals

SCHEMA = "k: string, s: bigint, e: bigint"


def _spans(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return sorted(
        (r.k, r.span_start, r.span_end, r.n_intervals)
        for r in merge_intervals(df, ["k"], "s", "e").collect()
    )


def test_validates_columns(spark):
    df = spark.createDataFrame([("a", 1, 2)], SCHEMA)
    with pytest.raises(ValueError, match="column"):
        merge_intervals(df, ["k"], "nope", "e")


def test_overlap_touch_and_gap(spark):
    rows = [("a", 1, 5), ("a", 4, 8), ("a", 8, 10), ("a", 20, 25)]
    assert _spans(spark, rows) == [("a", 1, 10, 3), ("a", 20, 25, 1)]


def test_containment_and_out_of_order_input(spark):
    rows = [("a", 10, 12), ("a", 1, 100), ("a", 50, 60)]
    assert _spans(spark, rows) == [("a", 1, 100, 3)]


def test_keys_do_not_merge_across(spark):
    rows = [("a", 1, 5), ("b", 4, 8)]
    assert _spans(spark, rows) == [("a", 1, 5, 1), ("b", 4, 8, 1)]


def test_point_intervals(spark):
    rows = [("a", 3, 3), ("a", 3, 3), ("a", 4, 4)]
    # [3,3] twice merges; [4,4] touches via closed semantics? 4 > 3 -> new island.
    assert _spans(spark, rows) == [("a", 3, 3, 2), ("a", 4, 4, 1)]


def test_inverted_interval_raises_in_plan(spark):
    df = spark.createDataFrame([("a", 5, 1)], SCHEMA)
    with pytest.raises(SparkRuntimeException, match="invalid interval"):
        merge_intervals(df, ["k"], "s", "e").collect()


def test_null_bound_raises_in_plan(spark):
    df = spark.createDataFrame([("a", None, 1)], SCHEMA)
    with pytest.raises(SparkRuntimeException, match="invalid interval"):
        merge_intervals(df, ["k"], "s", "e").collect()


def test_timestamp_bounds(spark):
    t = dt.datetime(2024, 1, 1)
    rows = [
        ("a", t, t + dt.timedelta(hours=2)),
        ("a", t + dt.timedelta(hours=1), t + dt.timedelta(hours=3)),
    ]
    df = spark.createDataFrame(rows, "k: string, s: timestamp, e: timestamp")
    out = merge_intervals(df, ["k"], "s", "e").collect()
    assert len(out) == 1 and out[0].n_intervals == 2
    assert out[0].span_end - out[0].span_start == dt.timedelta(hours=3)
