"""Aggregations (SURVEY §2.4 A1-A9).

The reference's 36-scan stats fan-out (f30k_vs_coco_vs_wicsmmir_v2.ipynb
cells 19-21 — min/max/mean/median per column, per dataset, per backend, each
a separate full pass) collapses into ONE grouped aggregation: partial
(map-side) agg → single shuffle on the grouping key → final agg. At 100 TB
that is the difference between 36 table scans and 1.

Median: exact ``F.median`` (Spark ≥3.4, matches DuckDB ``median``) for
correctness surfaces; ``percentile_approx`` is the documented 100 TB path
(single-pass, mergeable sketch — exact median requires a full sort per
group).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STAT_FNS = {
    "min": F.min,
    "max": F.max,
    "mean": F.avg,
    "median": F.median,
    "sum": F.sum,
}


def column_stats(df: DataFrame, columns: Sequence[str], stats: Sequence[str] = ("min", "max", "mean", "median")) -> DataFrame:
    """A2-A6: per-column stats in one pass (one row out).

    Output columns are named ``{stat}_{col}`` so oracle SQL can alias
    identically.
    """
    aggs = [STAT_FNS[s](c).alias(f"{s}_{c}") for s in stats for c in columns]
    return df.agg(*aggs)


def grouped_stats_matrix(
    df: DataFrame,
    group_cols: Sequence[str],
    value_cols: Sequence[str],
    stats: Sequence[str] = ("min", "max", "mean", "median"),
) -> DataFrame:
    """A9: the comparison-matrix assembly as one grouped agg.

    Reference stacks 36 independent scalar aggregations into a labelled
    pandas frame (…v2.ipynb cells 20-21); here ``groupBy(dataset, backend)``
    computes the whole matrix in one shuffle.
    """
    aggs = [STAT_FNS[s](c).alias(f"{s}_{c}") for s in stats for c in value_cols]
    return df.groupBy(*group_cols).agg(*aggs)


def null_count(df: DataFrame, column: str) -> Column:
    """A7: count of NULLs in a column (failed-download count,
    wikicaps_etl_pipeline.py:94). Use inside ``df.agg(...)``."""
    return F.count_if(F.col(column).isNull()).alias(f"null_count_{column}")


def approx_stats(df: DataFrame, columns: Sequence[str], rsd: float = 0.05) -> DataFrame:
    """Scale-path stats: approx distinct + approx median per column, one pass,
    mergeable sketches only (HLL++ / KLL) — safe at any SF."""
    aggs = []
    for c in columns:
        aggs.append(F.approx_count_distinct(c, rsd).alias(f"approx_distinct_{c}"))
        aggs.append(F.percentile_approx(c, 0.5, 10000).alias(f"approx_median_{c}"))
    return df.agg(*aggs)
