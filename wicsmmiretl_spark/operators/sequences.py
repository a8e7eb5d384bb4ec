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


def ewma(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    alpha: float,
    window: int | None = None,
    out_col: str = "ewma",
    round_dp: int = 6,
) -> DataFrame:
    """Per-key exponentially-weighted moving average over an ordered event
    sequence — the smoothing pass behind metric-drift monitors and
    per-entity trend features.

    Semantics: the weight-normalized form (pandas ``ewm(adjust=True)``)
    over the last ``window`` rows of the key's sequence:

        ewma_i = Σ_{t=0..m-1} (1-α)^t · v_{i-t}  /  Σ_{t=0..m-1} (1-α)^t

    where ``m = min(i+1, window)``. The truncation at ``window`` rows is
    what makes the operator scale-safe AND exactly replayable: the naive
    recursive form carries unbounded history (and needs either an
    overflow-prone ``(1-α)^{-i}`` rescale or a sequential scan), while the
    truncated window drops only tail weight ``(1-α)^window`` — below 1e-12
    at the default window, far under the 6dp rounding the suite's
    determinism discipline applies anyway. Default ``window`` is the
    smallest W with ``(1-α)^W < 1e-12``.

    Plan: ONE key-partitioned window shuffle (the same exchange every
    sequence operator here pays); the weighted sum folds a
    frame-ordered ``collect_list`` with higher-order functions — per-row
    state is ``window`` doubles, JVM-side, no Python. Numerator and
    denominator fold the same literal weight array in the same order, so
    any engine replaying the plan adds identical doubles identically.

    ``order_cols`` must be a total order per key (include a unique
    tiebreak). Output: input columns + ``out_col`` (double, ``round_dp``).
    """
    import math

    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"ewma: alpha must be in (0, 1], got {alpha}")
    if window is None:
        window = 1 if alpha == 1.0 else max(1, math.ceil(math.log(1e-12) / math.log(1.0 - alpha)))
    if window < 1:
        raise ValueError(f"ewma: window must be >= 1, got {window}")
    decay = 1.0 - alpha
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*[F.asc(c) for c in order_cols])
        .rowsBetween(-(window - 1), 0)
    )
    lst = F.collect_list(F.col(value_col).cast("double")).over(w)
    n = F.size(lst)
    # Weights as a PRECOMPUTED literal array, not runtime pow(): one plan
    # constant instead of `window` transcendental calls per row, and — the
    # determinism point — the identical double literals appear in any
    # engine's replay, so no cross-libm pow() ulp ever reaches the result.
    weights = [decay**t for t in range(window)]
    warr = F.array(*[F.lit(x) for x in weights])
    num = F.aggregate(
        F.zip_with(
            lst,
            F.sequence(F.lit(1), n),
            lambda v, j: v * F.element_at(warr, (n - j + F.lit(1))),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    den = F.aggregate(F.slice(warr, 1, n), F.lit(0.0), lambda acc, x: acc + x)
    return df.withColumn(out_col, F.round(num / den, round_dp))


def frequent_sequences(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_col: str,
    max_len: int = 3,
    min_support: float = 0.01,
    sep: str = ">",
) -> DataFrame:
    """Frequent CONTIGUOUS state sequences (lengths 2..max_len) with key
    support — the sequential-pattern half of basket mining (contiguous
    n-gram specialization of PrefixSpan, Pei et al. 2001, public
    literature): which journeys ("view>click>purchase") a meaningful
    fraction of users actually walk.

    * Support = distinct keys whose ordered event stream contains the
      sequence at least once, over all keys with ≥1 non-null event —
      multiplicity within a key does NOT inflate support (the standard
      sequence-mining definition).
    * Order within a key is (ts, tiebreak) — the suite-wide total-order
      contract, so equal timestamps cannot produce partition-dependent
      successors.
    * ``max_len`` is a plan-time constant (one lead() per extra position,
      all over the SAME window spec → ONE shuffle keyed by ``key_col``,
      the exchange sessionization/funnel/transition-matrix already pay).

    100 TB shape: the only full-data operations are that one key-keyed
    window and a (key, seq) distinct whose partial agg dedups map-side;
    the support table is ≤ |states|^max_len rows. No driver loop, no
    candidate generation — contiguity makes the Apriori lattice a
    single scan.

    Output: seq string, k int (sequence length), n_keys bigint,
    support double (6dp), descending by n_keys then seq.
    """
    if max_len < 2:
        raise ValueError(f"frequent_sequences: max_len must be >= 2, got {max_len}")
    if not (0.0 <= min_support <= 1.0):
        raise ValueError(
            f"frequent_sequences: min_support must be in [0, 1], got {min_support}"
        )
    for c in (key_col, ts_col, state_col, tiebreak_col):
        if c not in df.columns:
            raise ValueError(f"frequent_sequences: column {c!r} not in {df.columns}")
    base = df.filter(
        F.col(key_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(state_col).isNotNull()
    )
    w = Window.partitionBy(key_col).orderBy(F.asc(ts_col), F.asc(tiebreak_col))
    steps = base.select(
        F.col(key_col).alias("_k"),
        F.col(state_col).alias("_s0"),
        *[
            F.lead(state_col, i).over(w).alias(f"_s{i}")
            for i in range(1, max_len)
        ],
    )
    grams = []
    for k in range(2, max_len + 1):
        cols = [F.col(f"_s{i}") for i in range(k)]
        grams.append(
            steps.filter(cols[-1].isNotNull()).select(
                "_k",
                F.concat_ws(sep, *cols).alias("seq"),
                F.lit(k).alias("k"),
            )
        )
    allg = grams[0]
    for g in grams[1:]:
        allg = allg.unionByName(g)
    total = base.agg(F.countDistinct(key_col).alias("_n"))
    counts = (
        allg.dropDuplicates(["_k", "seq", "k"])
        .groupBy("seq", "k")
        .agg(F.count("*").alias("n_keys"))
    )
    return (
        counts.crossJoin(F.broadcast(total))  # 1-row denominator, lazy
        .withColumn("support", F.round(F.col("n_keys") / F.col("_n"), 6))
        .filter(F.col("support") >= min_support)
        .drop("_n")
        .orderBy(F.desc("n_keys"), F.asc("seq"))
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    scale: int = 10**6,
) -> DataFrame:
    """Per-key TIME-weighted average of an irregularly-sampled value —
    the telemetry mean: each observation holds until the next one
    (left-continuous step function), so a value that persisted for an
    hour weighs 3600× one that lasted a second. The row-mean answers
    "average of the readings"; this answers "average of the signal".

    twa = Σ v_i · (t_{i+1} − t_i) / (t_last − t_first) over each key's
    (ts, tiebreak)-ordered stream. The last observation of a key carries
    no duration (nothing follows it) and keys with a single observation
    (or zero total duration) are excluded — the operator reports
    averages over INTERVALS, and those keys have none.

    Determinism: values scale to bigints, durations are exact
    microsecond bigints, and their products accumulate in decimal(38,0)
    (value·duration can exceed int64 at month-long gaps) — one exact
    division at the end, rounded 6dp.

    100 TB shape: ONE shuffle keyed by ``key_col`` (the lead() window —
    the same exchange sessionize/funnel/transition-matrix pay), then the
    per-key agg rides the same partitioning (no second exchange).

    Output: key_col, n_events bigint (observations, including the
    closing one), twa double (6dp).
    """
    for c in (key_col, ts_col, value_col, tiebreak_col):
        if c not in df.columns:
            raise ValueError(f"time_weighted_avg: column {c!r} not in {df.columns}")
    base = df.filter(
        F.col(key_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(value_col).isNotNull()
    )
    tu = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(key_col).orderBy(F.asc(tu), F.asc(tiebreak_col))
    stepped = base.select(
        F.col(key_col).alias("_k"),
        F.round(F.col(value_col).cast("double") * scale).cast("long").alias("_sv"),
        (F.lead(tu).over(w) - tu).alias("_dt"),
    )
    agg = (
        stepped.groupBy("_k")
        .agg(
            F.sum(
                F.when(
                    F.col("_dt").isNotNull(),
                    F.col("_sv").cast("decimal(38,0)") * F.col("_dt"),
                )
            ).alias("_num"),
            F.sum("_dt").alias("_den"),
            F.count("*").alias("n_events"),
        )
        .filter(F.col("_den") > 0)
    )
    return agg.select(
        F.col("_k").alias(key_col),
        "n_events",
        F.round(
            F.col("_num").cast("double") / F.col("_den") / scale, 6
        ).alias("twa"),
    )


def rolling_corr(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    x_col: str,
    y_col: str,
    tiebreak_col: str,
    window: int = 20,
    x_scale: int = 10**6,
    y_scale: int = 10**3,
    out_col: str = "corr",
) -> DataFrame:
    """Per-key TRAILING Pearson correlation over the last ``window``
    observations of two series — the local-association monitor ("has
    value stopped tracking time / price stopped tracking volume in the
    last N ticks") completing the time-series family beside EWMA
    (level), trailing aggregates (mass), and CUSUM (global break).

    Exact-arithmetic contract: x and y scale to bigints once; the five
    frame sums (Σx, Σy, Σxy, Σx², Σy²) accumulate in decimal(38,0) over
    the ROWS frame, so every frame's moments are exact integers on any
    engine; the closed-form correlation divides once per row (6dp).
    Rows with fewer than 2 frame observations, or zero variance in
    either series, emit NULL (undefined, not 0).

    100 TB shape: ONE shuffle keyed by ``key_col`` — all five window
    sums share the single (ts, tiebreak)-ordered frame over the same
    exchange every sequence operator here pays.

    Output: key_col, tiebreak_col, out_col double — one row per input
    observation (NULL-value rows excluded).
    """
    if window < 2:
        raise ValueError(f"rolling_corr: window must be >= 2, got {window}")
    for c in (key_col, ts_col, x_col, y_col, tiebreak_col):
        if c not in df.columns:
            raise ValueError(f"rolling_corr: column {c!r} not in {df.columns}")
    base = df.filter(
        F.col(key_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(x_col).isNotNull()
        & F.col(y_col).isNotNull()
    ).select(
        F.col(key_col),
        F.col(ts_col),
        F.col(tiebreak_col),
        F.round(F.col(x_col).cast("double") * x_scale)
        .cast("decimal(38,0)")
        .alias("_sx"),
        F.round(F.col(y_col).cast("double") * y_scale)
        .cast("decimal(38,0)")
        .alias("_sy"),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.asc(ts_col), F.asc(tiebreak_col))
        .rowsBetween(-(window - 1), 0)
    )
    n = F.count("*").over(w).cast("decimal(38,0)")
    sx = F.sum("_sx").over(w)
    sy = F.sum("_sy").over(w)
    sxy = F.sum(F.col("_sx") * F.col("_sy")).over(w)
    sxx = F.sum(F.col("_sx") * F.col("_sx")).over(w)
    syy = F.sum(F.col("_sy") * F.col("_sy")).over(w)
    cov = (n * sxy - sx * sy).cast("double")
    vx = (n * sxx - sx * sx).cast("double")
    vy = (n * syy - sy * sy).cast("double")
    corr = F.when(
        (n >= 2) & (vx > 0) & (vy > 0),
        F.round(cov / F.sqrt(vx * vy), 6),
    )
    return base.select(key_col, tiebreak_col, corr.alias(out_col))
