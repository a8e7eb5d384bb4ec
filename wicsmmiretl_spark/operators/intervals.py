"""Interval algebra: merge overlapping spans (gaps-and-islands).

Engine extension beyond the reference (its pipeline has no time-range
primitive): flattening a set of possibly-overlapping ``[start, end]``
intervals per key into disjoint covering spans is the workhorse behind
session coverage, license/availability windows, speech/video segment
de-overlap before frame extraction, and time-range dedup of crawl
schedules.

100 TB design: ONE window shuffle keyed by the interval key. The classic
gaps-and-islands form — a running max of interval ends ordered by start
detects island boundaries, a running sum of boundary flags numbers the
islands, one grouped agg per island emits the span. Everything is
whole-stage-codegen window arithmetic; skew maps to hot keys exactly like
any window (pre-split hot keys upstream if one key owns a continent of
intervals).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_intervals(
    df: DataFrame,
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Merge overlapping-or-touching intervals per key into disjoint spans.

    Intervals are closed: ``[1, 3]`` and ``[3, 5]`` touch and merge into
    ``[1, 5]``. Start/end may be any mutually comparable orderable type
    (longs, timestamps); rows where either bound is NULL or where
    ``end < start`` are rejected in-plan (inverted intervals silently
    merging is exactly the corruption this operator exists to prevent).

    Output: key columns, span_start, span_end (input bound types),
    n_intervals bigint — one row per disjoint island.
    """
    for c in (*key_cols, start_col, end_col):
        if c not in df.columns:
            raise ValueError(f"merge_intervals: column {c!r} not in {df.columns}")
    s, e = F.col(start_col), F.col(end_col)
    checked_end = (
        F.when(s.isNull() | e.isNull() | (e < s),
               F.raise_error(
                   F.concat(
                       F.lit("merge_intervals: invalid interval [start="),
                       F.coalesce(s.cast("string"), F.lit("NULL")),
                       F.lit(", end="),
                       F.coalesce(e.cast("string"), F.lit("NULL")),
                       F.lit("]"),
                   )
               ).cast(df.schema[end_col].dataType))
        .otherwise(e)
    )
    base = df.select(*key_cols, s.alias("_s"), checked_end.alias("_e"))
    order = Window.partitionBy(*key_cols).orderBy(F.asc("_s"), F.asc("_e"))
    prev_max_end = F.max("_e").over(order.rowsBetween(Window.unboundedPreceding, -1))
    flagged = base.withColumn(
        "_new_island", F.when(prev_max_end.isNull() | (F.col("_s") > prev_max_end), 1).otherwise(0)
    )
    island = F.sum("_new_island").over(order.rowsBetween(Window.unboundedPreceding, 0))
    return (
        flagged.withColumn("_island", island)
        .groupBy(*key_cols, "_island")
        .agg(
            F.min("_s").alias("span_start"),
            F.max("_e").alias("span_end"),
            F.count("*").alias("n_intervals"),
        )
        .drop("_island")
    )
