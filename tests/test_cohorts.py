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


# ---------------------------------------------------------------------------
# Markov transition matrix (operators/sequences.py)
# ---------------------------------------------------------------------------

def _seq_events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp, state string, eid long")


def test_transition_matrix_counts_and_probabilities(spark):
    from wicsmmiretl_spark.operators.sequences import transition_matrix

    t = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    rows = [
        # u1: a -> b -> a -> c ; u2: a -> b ; u3: single event (no pairs)
        (1, t, "a", 1), (1, t + s, "b", 2), (1, t + 2 * s, "a", 3), (1, t + 3 * s, "c", 4),
        (2, t, "a", 5), (2, t + s, "b", 6),
        (3, t, "b", 7),
        (None, t, "a", 8), (4, None, "a", 9), (5, t, None, 10),  # excluded
    ]
    out = transition_matrix(_seq_events(spark, rows), "user_id", "ts", "state", "eid")
    got = {(r["from_state"], r["to_state"]): (r["n"], r["p"]) for r in out.collect()}
    assert got == {
        ("a", "b"): (2, round(2 / 3, 6)),
        ("a", "c"): (1, round(1 / 3, 6)),
        ("b", "a"): (1, 1.0),
    }


def test_transition_matrix_tiebreak_makes_order_total(spark):
    from wicsmmiretl_spark.operators.sequences import transition_matrix

    t = dt.datetime(2024, 1, 1)
    # Two events at the SAME timestamp: eid must decide the order (a then b).
    rows = [(1, t, "a", 1), (1, t, "b", 2), (1, t + dt.timedelta(seconds=1), "c", 3)]
    out = transition_matrix(_seq_events(spark, rows), "user_id", "ts", "state", "eid")
    got = {(r["from_state"], r["to_state"]) for r in out.collect()}
    assert got == {("a", "b"), ("b", "c")}


# ---------------------------------------------------------------------------
# Kaplan-Meier survival curve (operators/cohorts.py:survival_curve)
# ---------------------------------------------------------------------------

def test_survival_curve_textbook_case(spark):
    from wicsmmiretl_spark.operators.cohorts import survival_curve

    base = dt.datetime(2024, 1, 1)
    day = dt.timedelta(days=1)
    # Observation end = day 30 (sentinel user 99 pins it; they are censored
    # at duration 0 and at risk only at t=0... include in at-risk math).
    # Churned users (last event > 7 days before day 30, i.e. before day 23):
    #   u1: days 0..2  -> duration 2, churned
    #   u2: days 0..2  -> duration 2, churned
    #   u3: days 0..5  -> duration 5, churned
    # Censored (still active within the last 7 days):
    #   u4: days 0..25 -> censored, duration 25
    #   u99: day 30 only -> censored, duration 0
    rows = []
    for u, days in [(1, [0, 1, 2]), (2, [0, 2]), (3, [0, 5]), (4, [0, 25])]:
        rows += [(u, base + d * day) for d in days]
    rows.append((99, base + 30 * day))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {r["duration_days"]: r for r in survival_curve(df, "user_id", "ts", censor_days=7).collect()}
    # Durations: 0 (u99 censored), 2 (u1,u2 churn), 5 (u3 churn), 25 (u4 censored).
    # At risk at t=2: 5 - 1 (u99 censored at 0) = 4; S = 1 - 2/4 = 0.5
    # At risk at t=5: 4 - 2 = 2; S = 0.5 * (1 - 1/2) = 0.25
    assert set(out) == {2, 5}
    assert (out[2]["n_at_risk"], out[2]["n_churned"]) == (4, 2)
    assert out[2]["survival"] == pytest.approx(0.5, abs=1e-6)
    assert (out[5]["n_at_risk"], out[5]["n_churned"]) == (2, 1)
    assert out[5]["survival"] == pytest.approx(0.25, abs=1e-6)


def test_survival_curve_everyone_churns_hits_zero(spark):
    from wicsmmiretl_spark.operators.cohorts import survival_curve

    base = dt.datetime(2024, 1, 1)
    day = dt.timedelta(days=1)
    rows = [(1, base), (2, base), (2, base + day), (99, base + 30 * day)]
    # censor_days=0: u99 (last = obs end) is the only censored user, at
    # duration 0 alongside u1's churn; u1 churns at 0, u2 at 1.
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {r["duration_days"]: r for r in survival_curve(df, "user_id", "ts", censor_days=0).collect()}
    # t=0: at_risk 3, d=1 (u1), c=1 (u99): S = 1 - 1/3 = 2/3
    # t=1: at_risk 1, d=1 (u2): d == at_risk -> S = 0 exactly
    assert out[0]["survival"] == pytest.approx(2 / 3, abs=1e-6)
    assert out[1]["survival"] == 0.0


def test_survival_curve_validates(spark):
    from wicsmmiretl_spark.operators.cohorts import survival_curve

    df = spark.createDataFrame([(1, dt.datetime(2024, 1, 1))], "user_id long, ts timestamp")
    with pytest.raises(ValueError, match="censor_days"):
        survival_curve(df, "user_id", "ts", censor_days=-1)
    with pytest.raises(ValueError, match="column"):
        survival_curve(df, "nope", "ts")
