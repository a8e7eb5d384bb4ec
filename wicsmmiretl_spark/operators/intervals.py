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


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    key_cols: Sequence[str],
    a_start: str = "a_start",
    a_end: str = "a_end",
    b_start: str = "b_start",
    b_end: str = "b_end",
    bucket: int = 600_000_000,
) -> DataFrame:
    """Find all overlapping interval pairs between two interval sets —
    the banded equi-join form that ``range_join``'s docstring prescribes
    for scale but Spark's theta join can't give you: each interval
    explodes into the fixed-width buckets it covers, candidates meet on
    an (key, bucket) EQUI-join, duplicates from multi-bucket overlaps
    are removed, and the exact closed-interval predicate
    (a.start ≤ b.end ∧ b.start ≤ a.end) verifies — so the plan is a hash
    join however large the inputs, never a BroadcastNestedLoopJoin or a
    cartesian shuffle.

    Scale accounting: fanout per interval = length/``bucket`` + 1, so
    choose ``bucket`` near the typical interval length (default 10 min
    in microseconds — session-scale). Candidate volume per (key, bucket)
    is |a-intervals touching it| × |b-intervals touching it| — bounded by
    per-key concurrency, not corpus size; a pathological interval
    spanning the whole timeline costs timeline/bucket candidate rows,
    linear, not quadratic. Bounds must be integers (microseconds — the
    suite's timestamp contract).

    Output: key_cols + a_start, a_end, b_start, b_end, overlap
    (bigint — ``min(ends) - max(starts)``, ≥ 0 for closed intervals;
    0 means they touch at a point).
    """
    if bucket < 1:
        raise ValueError(f"interval_overlap_join: bucket must be >= 1, got {bucket}")
    for c in (*key_cols, a_start, a_end):
        if c not in a.columns:
            raise ValueError(f"interval_overlap_join: column {c!r} not in a {a.columns}")
    for c in (*key_cols, b_start, b_end):
        if c not in b.columns:
            raise ValueError(f"interval_overlap_join: column {c!r} not in b {b.columns}")

    def banded(df: DataFrame, s: str, e: str, sa: str, ea: str) -> DataFrame:
        return df.select(
            *key_cols,
            F.col(s).cast("long").alias(sa),
            F.col(e).cast("long").alias(ea),
            F.explode(
                F.sequence(
                    F.floor(F.col(s).cast("long") / bucket).cast("long"),
                    F.floor(F.col(e).cast("long") / bucket).cast("long"),
                )
            ).alias("_bk"),
        )

    ba = banded(a, a_start, a_end, "a_start", "a_end")
    bb = banded(b, b_start, b_end, "b_start", "b_end")
    return (
        ba.join(bb, [*key_cols, "_bk"])
        .filter(
            (F.col("a_start") <= F.col("b_end")) & (F.col("b_start") <= F.col("a_end"))
        )
        .drop("_bk")
        .distinct()
        .withColumn(
            "overlap",
            F.least("a_end", "b_end") - F.greatest("a_start", "b_start"),
        )
    )
