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
