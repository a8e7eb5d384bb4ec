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


# ---------------------------------------------------------------------------
# interval_overlap_join (banded equi-join)
# ---------------------------------------------------------------------------

def test_interval_overlap_join_matches_theta_semantics(spark):
    from wicsmmiretl_spark.operators.intervals import interval_overlap_join

    a_rows = [(1, 0, 100), (1, 500, 600), (2, 0, 50)]
    b_rows = [(1, 90, 200), (1, 601, 700), (2, 300, 400), (3, 0, 10)]
    a = spark.createDataFrame(a_rows, "k long, a_start long, a_end long")
    b = spark.createDataFrame(b_rows, "k long, b_start long, b_end long")
    # Tiny bucket relative to interval lengths: multi-bucket dedup path.
    out = interval_overlap_join(a, b, ["k"], bucket=30)
    got = {(r["k"], r["a_start"], r["b_start"]): r["overlap"] for r in out.collect()}
    # Only [0,100]x[90,200] on key 1 overlaps (closed: 90<=100); overlap 10.
    assert got == {(1, 0, 90): 10}
    # Touching at a point counts with overlap 0.
    b2 = spark.createDataFrame([(1, 100, 150)], "k long, b_start long, b_end long")
    touch = interval_overlap_join(a, b2, ["k"], bucket=1000).collect()
    assert len(touch) == 1 and touch[0]["overlap"] == 0


def test_interval_overlap_join_bucket_invariance(spark):
    import random

    from wicsmmiretl_spark.operators.intervals import interval_overlap_join

    rng = random.Random(5)
    a_rows, b_rows = [], []
    for k in range(4):
        for _ in range(12):
            s = rng.randint(0, 1000)
            a_rows.append((k, s, s + rng.randint(0, 80)))
            s = rng.randint(0, 1000)
            b_rows.append((k, s, s + rng.randint(0, 80)))
    a = spark.createDataFrame(a_rows, "k long, a_start long, a_end long")
    b = spark.createDataFrame(b_rows, "k long, b_start long, b_end long")
    results = []
    for bucket in (7, 100, 5000):
        rows = interval_overlap_join(a, b, ["k"], bucket=bucket).collect()
        results.append(sorted(tuple(r) for r in rows))
    assert results[0] == results[1] == results[2], "banding changed the result"
    assert len(results[0]) > 0
    with pytest.raises(ValueError, match="bucket"):
        interval_overlap_join(a, b, ["k"], bucket=0)
