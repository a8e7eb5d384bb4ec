"""Cohort retention unit tests: offset math, retention fractions, NULL
hygiene, and input validation (edges the sf0.01 oracle gate can't probe)."""

from __future__ import annotations

import datetime as dt

import pytest

from wicsmmiretl_spark.operators.cohorts import retention_cohorts


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def test_validates_inputs(spark):
    df = _events(spark, [(1, dt.datetime(2024, 1, 1))])
    with pytest.raises(ValueError, match="unit"):
        retention_cohorts(df, "user_id", "ts", unit="fortnight")
    with pytest.raises(ValueError, match="column"):
        retention_cohorts(df, "nope", "ts")


def test_weekly_offsets_and_retention(spark):
    # 2024-01-01 is a Monday. u1 active weeks 0,1,3; u2 weeks 0,1; u3 week 1 only
    # (so u3's cohort is week of Jan 8 with offset 0).
    rows = [
        (1, dt.datetime(2024, 1, 1, 10)),
        (1, dt.datetime(2024, 1, 3, 10)),   # same week, no double count
        (1, dt.datetime(2024, 1, 8, 10)),
        (1, dt.datetime(2024, 1, 22, 10)),
        (2, dt.datetime(2024, 1, 2, 10)),
        (2, dt.datetime(2024, 1, 9, 10)),
        (3, dt.datetime(2024, 1, 10, 10)),
    ]
    out = {
        (r.cohort_us, r.period_offset): (r.n_users, r.retention)
        for r in retention_cohorts(_events(spark, rows), "user_id", "ts").collect()
    }
    w0 = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    w1 = int(dt.datetime(2024, 1, 8, tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    assert out[(w0, 0)] == (2, 1.0)
    assert out[(w0, 1)] == (2, 1.0)
    assert out[(w0, 3)] == (1, 0.5)
    assert (w0, 2) not in out  # nobody active in week 2
    assert out[(w1, 0)] == (1, 1.0)


def test_nulls_excluded(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1)),
        (None, dt.datetime(2024, 1, 1)),
        (2, None),
    ]
    out = retention_cohorts(_events(spark, rows), "user_id", "ts").collect()
    assert len(out) == 1 and out[0].n_users == 1


def test_daily_unit(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1, 5)),
        (1, dt.datetime(2024, 1, 1, 23)),
        (1, dt.datetime(2024, 1, 4, 1)),
    ]
    out = {
        r.period_offset: r.n_users
        for r in retention_cohorts(_events(spark, rows), "user_id", "ts", unit="day").collect()
    }
    assert out == {0: 1, 3: 1}
