"""Exact rank statistics (operators/aggregates.py: binary_auc,
spearman_corr) vs brute-force Python ground truth, including the tie
handling the closed forms must get exactly right, plus degenerate inputs
and validation edges the sf0.01 oracle gate can't probe."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from wicsmmiretl_spark.operators.aggregates import binary_auc, spearman_corr


def _auc_brute(pairs):
    pos = [s for y, s in pairs if y]
    neg = [s for y, s in pairs if not y]
    c = 0.0
    for p in pos:
        for n in neg:
            c += 1.0 if p > n else (0.5 if p == n else 0.0)
    return c / (len(pos) * len(neg))


def _avg_ranks(xs):
    order = sorted(range(len(xs)), key=lambda i: xs[i])
    ranks = [0.0] * len(xs)
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and xs[order[j]] == xs[order[i]]:
            j += 1
        avg = (i + 1 + j) / 2.0
        for k in range(i, j):
            ranks[order[k]] = avg
        i = j
    return ranks


def _spearman_brute(xs, ys):
    rx, ry = _avg_ranks(xs), _avg_ranks(ys)
    n = len(xs)
    mx, my = sum(rx) / n, sum(ry) / n
    sxy = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    sxx = sum((a - mx) ** 2 for a in rx)
    syy = sum((b - my) ** 2 for b in ry)
    return sxy / (sxx * syy) ** 0.5


def test_auc_with_heavy_ties_matches_brute_force(spark):
    rng = random.Random(7)
    # Coarse integer scores force many cross-class ties — the ½-credit path.
    pairs = [(rng.random() < 0.4, float(rng.randint(0, 9))) for _ in range(400)]
    df = spark.createDataFrame(
        [(bool(y), s) for y, s in pairs], "label boolean, score double"
    )
    row = binary_auc(df, "label", "score").collect()[0]
    assert row["n_pos"] == sum(1 for y, _ in pairs if y)
    assert row["n_neg"] == sum(1 for y, _ in pairs if not y)
    assert row["auc"] == pytest.approx(round(_auc_brute(pairs), 6), abs=1e-6)


def test_auc_perfect_and_random_separation(spark):
    perfect = [(True, 10.0 + i) for i in range(5)] + [(False, float(i)) for i in range(5)]
    df = spark.createDataFrame(perfect, "label boolean, score double")
    assert binary_auc(df, "label", "score").collect()[0]["auc"] == 1.0
    # All scores identical: AUC must be exactly 0.5 (pure tie credit).
    tied = [(i % 2 == 0, 1.0) for i in range(10)]
    df2 = spark.createDataFrame(tied, "label boolean, score double")
    assert binary_auc(df2, "label", "score").collect()[0]["auc"] == 0.5


def test_auc_single_class_is_null(spark):
    df = spark.createDataFrame([(True, 1.0), (True, 2.0)], "label boolean, score double")
    assert binary_auc(df, "label", "score").collect()[0]["auc"] is None


def test_auc_excludes_nulls_and_validates(spark):
    df = spark.createDataFrame(
        [(True, 2.0), (False, 1.0), (None, 9.0), (True, None)],
        "label boolean, score double",
    )
    row = binary_auc(df, "label", "score").collect()[0]
    assert (row["n_pos"], row["n_neg"], row["auc"]) == (1, 1, 1.0)
    with pytest.raises(ValueError, match="column"):
        binary_auc(df, "nope", "score")


def test_spearman_matches_brute_force_with_ties(spark):
    rng = random.Random(11)
    xs = [float(rng.randint(0, 20)) for _ in range(300)]
    ys = [x + rng.randint(-5, 5) for x in xs]  # noisy monotone, heavy ties
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    row = spearman_corr(df, "x", "y").collect()[0]
    assert row["n"] == 300
    assert row["rho"] == pytest.approx(round(_spearman_brute(xs, ys), 6), abs=1e-6)


def test_spearman_exact_monotone_and_constant(spark):
    # Strictly increasing mapping, nonlinear: rho must be exactly 1.
    rows = [(float(i), float(i) ** 3) for i in range(1, 30)]
    df = spark.createDataFrame(rows, "x double, y double")
    assert spearman_corr(df, "x", "y").collect()[0]["rho"] == 1.0
    # Constant column: zero rank variance -> NULL, not a division error.
    const = spark.createDataFrame([(float(i), 5.0) for i in range(10)], "x double, y double")
    assert spearman_corr(const, "x", "y").collect()[0]["rho"] is None


def test_calibration_curve_bins_and_rates(spark):
    from wicsmmiretl_spark.operators.aggregates import calibration_curve

    # 20 rows, scores 1..20, positives exactly the top half: with 4 bins of
    # 5 rows each, frac_pos must be 0, 0, 1, 1.
    rows = [(i > 10, float(i), i) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "label boolean, score double, id long")
    out = calibration_curve(df, "label", "score", "id", n_bins=4).collect()
    assert [r["bin"] for r in out] == [1, 2, 3, 4]
    assert all(r["n"] == 5 for r in out)
    assert [r["frac_pos"] for r in out] == [0.0, 0.0, 1.0, 1.0]
    assert out[0]["mean_score"] == pytest.approx(3.0, abs=1e-6)  # mean(1..5)
    with pytest.raises(ValueError, match="n_bins"):
        calibration_curve(df, "label", "score", "id", n_bins=1)


def test_quantile_transform_ties_and_nulls(spark):
    from wicsmmiretl_spark.operators.aggregates import quantile_transform

    # values: 1, 2, 2, 4 -> avg ranks 1, 2.5, 2.5, 4 -> q = r/4
    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 2.0), (4, 4.0), (5, None)], "id long, v double"
    )
    got = {r["id"]: r["q"] for r in quantile_transform(df, "v").collect()}
    assert got[1] == pytest.approx(0.25, abs=1e-6)
    assert got[2] == got[3] == pytest.approx(0.625, abs=1e-6)
    assert got[4] == pytest.approx(1.0, abs=1e-6)
    assert got[5] is None
    with pytest.raises(ValueError, match="already has"):
        quantile_transform(df.withColumnRenamed("id", "q"), "v")


def test_seasonal_naive_error_hand_computed(spark):
    from wicsmmiretl_spark.operators.aggregates import seasonal_naive_error
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    # Regular daily grid, season=2: forecasts start at index 2.
    vals = [10.0, 20.0, 13.0, 16.0, 10.0, 24.0]
    rows = [(base + dt.timedelta(days=i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "d timestamp, total double")
    r = seasonal_naive_error(df, "d", "total", season=2).collect()[0]
    errs = [vals[i] - vals[i - 2] for i in range(2, 6)]  # 3, -4, -3, 8
    assert r["n_forecasts"] == 4
    assert r["mae"] == pytest.approx(sum(abs(e) for e in errs) / 4, abs=1e-6)
    assert r["rmse"] == pytest.approx((sum(e * e for e in errs) / 4) ** 0.5, abs=1e-6)
    mapes = [abs(e) / abs(a) for e, a in zip(errs, vals[2:])]
    assert r["mape"] == pytest.approx(sum(mapes) / 4, abs=1e-4)


def test_seasonal_naive_error_grouped_and_zero_actuals(spark):
    from wicsmmiretl_spark.operators.aggregates import seasonal_naive_error
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    for g, vals in [("a", [1.0, 2.0, 3.0]), ("b", [5.0, 5.0, 0.0])]:
        rows += [(g, base + dt.timedelta(days=i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, d timestamp, total double")
    got = {r["g"]: r for r in seasonal_naive_error(df, "d", "total", 1, by=["g"]).collect()}
    assert got["a"]["mae"] == pytest.approx(1.0, abs=1e-6)
    # Group b's second forecast has actual 0: excluded from MAPE, not MAE.
    assert got["b"]["mae"] == pytest.approx(2.5, abs=1e-6)
    assert got["b"]["mape"] == pytest.approx(0.0, abs=1e-6)  # only the 5->5 step
    with pytest.raises(ValueError, match="season"):
        seasonal_naive_error(df, "d", "total", 0)


def test_rank_ops_plan_has_no_full_table_single_partition_window(spark):
    """The scale contract of the rank statistics: the running rank comes
    from the offsets pattern (range partition + broadcast offsets +
    partition-LOCAL window), so no plan may funnel the level table through
    a single-partition WINDOW. (The final one-row aggregate legitimately
    collapses to a single partition — that is one row, not the table.)"""
    from wicsmmiretl_spark.operators.aggregates import binary_auc, quantile_transform

    rows = [(i % 2 == 0, float(i % 97)) for i in range(2000)]
    df = spark.createDataFrame(rows, "label boolean, score double")
    for out in (binary_auc(df, "label", "score"), quantile_transform(df, "score")):
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        # Every Window node must be partitioned (its required child
        # distribution shows as hashpartitioning on _pid, never
        # SinglePartition directly under a Window sort).
        for i, line in enumerate(plan.splitlines()):
            if "Window" in line and "windowspecdefinition" in line:
                assert "_pid" in line, f"unpartitioned window in plan:\n{line}"


def test_auc_grouped_matches_per_group_brute_force(spark):
    from wicsmmiretl_spark.operators.aggregates import binary_auc

    rng = random.Random(3)
    rows = []
    for g in ("a", "b", "c"):
        rows += [(g, rng.random() < 0.5, float(rng.randint(0, 6))) for _ in range(150)]
    df = spark.createDataFrame(rows, "g string, label boolean, score double")
    got = {r["g"]: r for r in binary_auc(df, "label", "score", by=["g"]).collect()}
    for g in ("a", "b", "c"):
        pairs = [(y, s) for gg, y, s in rows if gg == g]
        assert got[g]["auc"] == pytest.approx(round(_auc_brute(pairs), 6), abs=1e-6), g


def test_roc_curve_hand_computed_with_ties(spark):
    from wicsmmiretl_spark.operators.aggregates import roc_curve

    # scores: pos at 3,2,2 ; neg at 2,1 -> thresholds desc: 3, 2, 1
    rows = [(True, 3.0), (True, 2.0), (True, 2.0), (False, 2.0), (False, 1.0)]
    df = spark.createDataFrame(rows, "label boolean, score double")
    got = {r["threshold"]: r for r in roc_curve(df, "label", "score").collect()}
    assert (got[3.0]["tp"], got[3.0]["fp"]) == (1, 0)
    assert (got[2.0]["tp"], got[2.0]["fp"]) == (3, 1)
    assert (got[1.0]["tp"], got[1.0]["fp"]) == (3, 2)
    assert got[2.0]["tpr"] == pytest.approx(1.0, abs=1e-6)
    assert got[2.0]["fpr"] == pytest.approx(0.5, abs=1e-6)
    # Single-class input: the absent class's rate is NULL, not an error.
    pos_only = spark.createDataFrame([(True, 1.0), (True, 2.0)], "label boolean, score double")
    assert all(r["fpr"] is None for r in roc_curve(pos_only, "label", "score").collect())


def test_histogram_quantiles_uniform_and_merge(spark):
    from wicsmmiretl_spark.operators.aggregates import (
        histogram,
        histogram_quantiles,
    )

    df = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
    h = histogram(df, "v", 0.0, 100.0, 10)
    got = {r["q"]: r["value"] for r in histogram_quantiles(h, [0.25, 0.5, 1.0], 10).collect()}
    # Uniform data: interpolation is exact at any q.
    assert got[0.25] == pytest.approx(25.0, abs=1e-6)
    assert got[0.5] == pytest.approx(50.0, abs=1e-6)
    assert got[1.0] == pytest.approx(100.0, abs=1e-6)
    # The mergeability claim: two half-histograms summed == one full pass.
    h1 = histogram(df.filter("v < 50"), "v", 0.0, 100.0, 10)
    h2 = histogram(df.filter("v >= 50"), "v", 0.0, 100.0, 10)
    merged = h1.unionByName(h2).groupBy("bucket", "lo", "hi").agg(F.sum("n").alias("n"))
    got_m = {r["q"]: r["value"] for r in histogram_quantiles(merged, [0.5], 10).collect()}
    assert got_m[0.5] == got[0.5]


def test_histogram_quantiles_out_of_range_saturates(spark):
    from wicsmmiretl_spark.operators.aggregates import histogram, histogram_quantiles

    # All mass below lo: every quantile saturates at the declared lo edge.
    df = spark.createDataFrame([(-5.0,), (-1.0,)], "v double")
    h = histogram(df, "v", 0.0, 10.0, 5)
    out = {r["q"]: r["value"] for r in histogram_quantiles(h, [0.5], 5).collect()}
    assert out[0.5] == pytest.approx(0.0, abs=1e-6)
    with pytest.raises(ValueError, match="q must be"):
        histogram_quantiles(h, [1.5], 5)


def test_ewma_matches_local_replay_and_truncation(spark):
    """EWMA matches a local pandas-free replay of the normalized weighted
    mean; the full-history window equals the untruncated adjust=True form;
    alpha=1 degenerates to the current value; misuse raises."""
    import pytest

    from wicsmmiretl_spark.operators.sequences import ewma

    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    rows = [(1, i, v) for i, v in enumerate(vals)] + [(2, 0, 10.0)]
    df = spark.createDataFrame(rows, "k long, i long, v double")

    got = {
        (r.k, r.i): r.ewma
        for r in ewma(df, ["k"], ["i"], "v", alpha=0.4, window=3).collect()
    }

    def local(seq, a, w):
        out = []
        for i in range(len(seq)):
            lo = max(0, i - w + 1)
            num = sum(seq[j] * (1 - a) ** (i - j) for j in range(lo, i + 1))
            den = sum((1 - a) ** (i - j) for j in range(lo, i + 1))
            out.append(round(num / den, 6))
        return out

    expect = local(vals, 0.4, 3)
    for i in range(len(vals)):
        assert got[(1, i)] == pytest.approx(expect[i], abs=1e-9)
    assert got[(2, 0)] == 10.0

    # Untruncated (window >= n) == classic adjust=True ewm.
    got_full = {
        r.i: r.ewma for r in ewma(df.filter("k = 1"), ["k"], ["i"], "v", alpha=0.4).collect()
    }
    expect_full = local(vals, 0.4, len(vals))
    for i in range(len(vals)):
        assert got_full[i] == pytest.approx(expect_full[i], abs=1e-9)

    # alpha = 1 → identity smoothing.
    got_id = {r.i: r.ewma for r in ewma(df.filter("k = 1"), ["k"], ["i"], "v", alpha=1.0).collect()}
    assert got_id == {i: v for i, v in enumerate(vals)}

    with pytest.raises(ValueError):
        ewma(df, ["k"], ["i"], "v", alpha=0.0)
    with pytest.raises(ValueError):
        ewma(df, ["k"], ["i"], "v", alpha=0.5, window=0)
