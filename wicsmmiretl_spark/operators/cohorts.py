"""Cohort retention analysis over an event stream.

Engine extension beyond the reference (its analytics stop at grouped
aggregates; see reference ``etl.py`` aggregation stages): the classic
product-analytics rollup — bucket users by the period of their first
event (their *cohort*), then count how many are still active k periods
later. The same shape serves training-data freshness dashboards (how many
sources/domains still contribute k weeks after first crawl).

100 TB design: the whole computation is ONE shuffle of the event stream,
keyed by user. ``collect_set`` of truncated periods per user is bounded by
the calendar span (weeks in the retention horizon — tens, not millions),
so the per-user state is tiny and partial aggregation does the heavy
lifting map-side. Everything after the per-user agg operates on
|cohorts| × |offsets| rows — thousands at any corpus size — so the final
window for cohort sizes is effectively free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_UNIT_DAYS = {"day": 1, "week": 7}


def retention_cohorts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    unit: str = "week",
) -> DataFrame:
    """Cohort × offset retention table.

    * cohort = ``date_trunc(unit, min(ts))`` per user,
    * a user counts toward offset k if they have ≥1 event in the period
      exactly k units after their cohort period,
    * retention = offset-k users / offset-0 users (offset 0 is the cohort
      size by construction — every user is active in their first period).

    NULL users/timestamps are excluded. Offsets are exact integers because
    both endpoints are truncated to the same unit boundary (Monday-start
    ISO weeks in both Spark and DuckDB, so the oracle replays bit-for-bit).

    Output: cohort_us bigint (unix micros of the cohort period start),
    period_offset int, n_users bigint, retention double (6dp).
    """
    if unit not in _UNIT_DAYS:
        raise ValueError(f"retention_cohorts: unit must be one of {sorted(_UNIT_DAYS)}, got {unit!r}")
    for c in (user_col, ts_col):
        if c not in df.columns:
            raise ValueError(f"retention_cohorts: column {c!r} not in {df.columns}")
    per_user = (
        df.filter(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(F.col(user_col).alias("_u"), F.date_trunc(unit, F.col(ts_col)).alias("_p"))
        .groupBy("_u")
        .agg(F.collect_set("_p").alias("_ps"))
    )
    exploded = per_user.select(
        F.array_min("_ps").alias("_cohort"), F.explode("_ps").alias("_period")
    )
    offset = (F.datediff("_period", "_cohort") / F.lit(_UNIT_DAYS[unit])).cast("int")
    counts = (
        exploded.groupBy(F.col("_cohort"), offset.alias("period_offset"))
        .agg(F.count("*").alias("n_users"))
    )
    # Cohort size = the offset-0 count; a window max over the tiny rollup
    # avoids recomputing the per-user aggregation for a second branch.
    size = F.max(F.when(F.col("period_offset") == 0, F.col("n_users"))).over(
        Window.partitionBy("_cohort")
    )
    return (
        counts.withColumn("retention", F.round(F.col("n_users") / size, 6))
        .select(
            F.unix_micros("_cohort").alias("cohort_us"),
            "period_offset",
            "n_users",
            "retention",
        )
    )


def survival_curve(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    censor_days: int = 7,
    ln_scale: int = 10**12,
) -> DataFrame:
    """Kaplan-Meier survival estimate of user lifetime (Kaplan & Meier
    1958, JASA — public literature) with right-censoring: the churn-curve
    primitive behind retention forecasting and source-freshness analysis,
    computed without the bias of treating still-active users as churned.

    Lifetime model (deterministic, derived entirely from the stream):

    * observation end = max(ts) over the table;
    * a user CHURNED if their last event is more than ``censor_days``
      before observation end (duration = days first→last, integer-floored
      in exact microsecond arithmetic — ``div``, not double division);
    * otherwise they are CENSORED at duration = days first→obs-end.

    Estimator: at each distinct duration t, with d_t churns and n_t users
    still at risk (neither churned nor censored earlier),
    S(t) = Π_{u≤t} (1 - d_u / n_u).

    Cross-engine determinism (the bigram-surprisal pattern): each factor's
    ln is scaled by ``ln_scale`` and rounded to an exact bigint; the
    running product is the exp of the bigint running sum — double
    summation order can't flip the hash, and the per-row 1-ulp libm
    difference between engines is ~10⁶× below the rounding grid. The
    final S(t) rounds 6dp; a terminal d = n row (everyone remaining
    churns) yields S = 0 exactly.

    Scale: one shuffle keyed by user (the per-user min/max agg,
    partial-agged map-side), then everything runs on |distinct durations|
    rows — bounded by the calendar horizon in days (tens~thousands), so
    the global window over durations is a deliberate single-partition
    window over a provably tiny frame.

    Output (only durations with ≥1 churn, KM convention): duration_days
    int, n_at_risk bigint, n_churned bigint, survival double.
    """
    if censor_days < 0:
        raise ValueError(f"survival_curve: censor_days must be >= 0, got {censor_days}")
    for c in (user_col, ts_col):
        if c not in df.columns:
            raise ValueError(f"survival_curve: column {c!r} not in {df.columns}")
    day_us = 86_400_000_000
    obs = df.agg(F.unix_micros(F.max(ts_col)).alias("_eu"))
    per_user = (
        df.filter(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .groupBy(user_col)
        .agg(
            F.unix_micros(F.min(ts_col)).alias("_fu"),
            F.unix_micros(F.max(ts_col)).alias("_lu"),
        )
        .crossJoin(F.broadcast(obs))
    )
    churned = (F.col("_lu") < F.col("_eu") - F.lit(censor_days * day_us)).cast("int")
    dur = per_user.select(
        churned.alias("_ch"),
        F.when(
            churned == 1, F.expr(f"(_lu - _fu) div {day_us}")
        ).otherwise(F.expr(f"(_eu - _fu) div {day_us}")).alias("_dd"),
    )
    levels = dur.groupBy("_dd").agg(
        F.sum("_ch").cast("long").alias("_d"),
        F.sum(1 - F.col("_ch")).cast("long").alias("_c"),
    )
    total = dur.agg(F.count("*").cast("long").alias("_n"))
    wprev = Window.orderBy("_dd").rowsBetween(Window.unboundedPreceding, -1)
    wcum = Window.orderBy("_dd").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    at_risk = (F.col("_n") - F.coalesce(F.sum(F.col("_d") + F.col("_c")).over(wprev), F.lit(0))).cast("long")
    r = levels.crossJoin(F.broadcast(total)).withColumn("_ar", at_risk)
    li = F.when(
        F.col("_d") < F.col("_ar"),
        F.round(F.log(F.lit(1.0) - F.col("_d").cast("double") / F.col("_ar")) * ln_scale).cast("long"),
    )
    s = r.withColumn("_ls", F.sum(li).over(wcum))
    return (
        s.filter(F.col("_d") > 0)
        .select(
            F.col("_dd").cast("int").alias("duration_days"),
            F.col("_ar").alias("n_at_risk"),
            F.col("_d").alias("n_churned"),
            F.when(F.col("_d") == F.col("_ar"), F.lit(0.0))
            .otherwise(F.round(F.exp(F.col("_ls").cast("double") / ln_scale), 6))
            .alias("survival"),
        )
    )
