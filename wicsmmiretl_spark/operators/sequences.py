"""Ordered-event sequence analytics.

Engine extension beyond the reference (its event handling stops at grouped
aggregates; see reference ``etl.py`` aggregation stages): first-order
Markov statistics over per-key event sequences — the transition matrix
behind user-journey analysis, session-flow dashboards, and synthetic-
sequence validation for training-data pipelines.

100 TB design: the ONLY full-data operation is one window over the
key-partitioned stream (a single shuffle keyed by user/session — the same
exchange ``sessionize_events`` and the funnel already pay, so a composed
pipeline reuses it). Everything after the lead() runs on
|states|² rows — hundreds at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def transition_matrix(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """First-order transition counts and probabilities between consecutive
    states of each key's time-ordered event sequence.

    * Consecutive = adjacent under ORDER BY (ts, tiebreak) within the key —
      ``tiebreak_col`` must make the order total (the suite-wide
      deterministic-order contract), or equal timestamps would get
      partition-dependent successors.
    * p = n(from→to) / Σ_to n(from→·), the maximum-likelihood estimate of
      the row-stochastic transition matrix; rounded 6dp (one exact integer
      division per output row — the count table is exact).
    * Keys with a single event emit nothing (no transition). NULL keys,
      timestamps, or states are excluded.

    Output: from_state, to_state, n bigint, p double.
    """
    for c in (key_col, ts_col, state_col, tiebreak_col):
        if c not in df.columns:
            raise ValueError(f"transition_matrix: column {c!r} not in {df.columns}")
    w = Window.partitionBy(key_col).orderBy(F.asc(ts_col), F.asc(tiebreak_col))
    pairs = (
        df.filter(
            F.col(key_col).isNotNull()
            & F.col(ts_col).isNotNull()
            & F.col(state_col).isNotNull()
        )
        .select(
            F.col(state_col).alias("from_state"),
            F.lead(state_col).over(w).alias("to_state"),
        )
        .filter(F.col("to_state").isNotNull())
    )
    counts = pairs.groupBy("from_state", "to_state").agg(F.count("*").alias("n"))
    wf = Window.partitionBy("from_state")
    return counts.select(
        "from_state",
        "to_state",
        "n",
        F.round(F.col("n") / F.sum("n").over(wf), 6).alias("p"),
    )
