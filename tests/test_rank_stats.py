"""Exact rank statistics (operators/aggregates.py: binary_auc,
spearman_corr) vs brute-force Python ground truth, including the tie
handling the closed forms must get exactly right, plus degenerate inputs
and validation edges the sf0.01 oracle gate can't probe."""

from __future__ import annotations

import random

import pytest

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
