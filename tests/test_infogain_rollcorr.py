"""information_gain and rolling_corr vs brute-force Python ground truth —
perfect/zero dependence, window edges, constant series."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from wicsmmiretl_spark.operators.aggregates import information_gain
from wicsmmiretl_spark.operators.sequences import rolling_corr

SCALE = 10**9


def _ig_brute(rows):
    rows = [(x, y) for x, y in rows if x is not None and y is not None]
    n = len(rows)
    cx, cy, cxy = {}, {}, {}
    for x, y in rows:
        cx[x] = cx.get(x, 0) + 1
        cy[y] = cy.get(y, 0) + 1
        cxy[(x, y)] = cxy.get((x, y), 0) + 1
    hy = sum(int(round(-(c / n) * math.log(c / n) * SCALE)) for c in cy.values())
    hx = sum(int(round(-(c / n) * math.log(c / n) * SCALE)) for c in cx.values())
    hyx = sum(
        int(round(-(o / n) * math.log(o / cx[x]) * SCALE))
        for (x, _), o in cxy.items()
    )
    gr = round((hy - hyx) / hx, 6) if hx > 0 else None
    return (
        n,
        round(hy / SCALE, 6),
        round(hyx / SCALE, 6),
        round((hy - hyx) / SCALE, 6),
        gr,
    )


def test_information_gain_matches_brute_force(spark):
    rng = random.Random(91)
    rows = []
    for _ in range(500):
        x = rng.choice("pqr")
        y = rng.choice("ab" if x == "p" else "bc")  # partial dependence
        rows.append((x, y))
    rows += [(None, "a"), ("p", None)]
    df = spark.createDataFrame(rows, "x: string, y: string")
    got = information_gain(df, "y", "x").collect()[0]
    assert (
        got["n"], got["h_target"], got["h_conditional"], got["info_gain"], got["gain_ratio"]
    ) == _ig_brute(rows)


def test_information_gain_extremes(spark):
    # Perfect dependence: H(Y|X) = 0, IG = H(Y).
    rows = [("p", "a"), ("q", "b")] * 50
    df = spark.createDataFrame(rows, "x: string, y: string")
    got = information_gain(df, "y", "x").collect()[0]
    assert got["h_conditional"] == 0.0 and got["info_gain"] == got["h_target"] > 0
    # Single-valued feature: H(X) = 0 -> gain_ratio NULL, IG = 0.
    rows = [("p", "a"), ("p", "b")] * 50
    df = spark.createDataFrame(rows, "x: string, y: string")
    got = information_gain(df, "y", "x").collect()[0]
    assert got["info_gain"] == 0.0 and got["gain_ratio"] is None
    with pytest.raises(ValueError, match="information_gain"):
        information_gain(df, "y", "nope")


def _rolling_corr_brute(rows, window, xs=10**6, ys=10**3):
    out = {}
    per_key = {}
    for k, t, tb, x, y in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        per_key.setdefault(k, []).append((tb, int(round(x * xs)), int(round(y * ys))))
    for k, seq in per_key.items():
        for i in range(len(seq)):
            fr = seq[max(0, i - window + 1) : i + 1]
            n = len(fr)
            sx = sum(a for _, a, _ in fr)
            sy = sum(b for _, _, b in fr)
            sxy = sum(a * b for _, a, b in fr)
            sxx = sum(a * a for _, a, _ in fr)
            syy = sum(b * b for _, _, b in fr)
            vx, vy = n * sxx - sx * sx, n * syy - sy * sy
            c = None
            if n >= 2 and vx > 0 and vy > 0:
                c = round((n * sxy - sx * sy) / math.sqrt(float(vx) * float(vy)), 6)
            out[(k, seq[i][0])] = c
    return out


def test_rolling_corr_matches_brute_force(spark):
    rng = random.Random(93)
    rows = [
        (rng.randint(0, 4), rng.randint(0, 1000), i, round(rng.uniform(-5, 5), 3), round(rng.uniform(0, 100), 3))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "k: bigint, t: int, tb: int, x: double, y: double")
    got = {
        (r["k"], r["tb"]): r["corr"]
        for r in rolling_corr(df, "k", "t", "x", "y", "tb", window=10).collect()
    }
    assert got == _rolling_corr_brute(rows, 10)


def test_rolling_corr_edges(spark):
    # Perfectly linear inside the frame -> 1.0; constant series -> NULL.
    rows = [(1, i, i, float(i), 2.0 * i + 3) for i in range(5)] + [
        (2, i, 100 + i, float(i), 7.0) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "k: bigint, t: int, tb: int, x: double, y: double")
    got = {
        (r["k"], r["tb"]): r["corr"]
        for r in rolling_corr(df, "k", "t", "x", "y", "tb", window=4).collect()
    }
    assert got[(1, 0)] is None  # single-row frame
    assert all(got[(1, i)] == 1.0 for i in range(1, 5))
    assert all(got[(2, 100 + i)] is None for i in range(5))  # zero y-variance
    with pytest.raises(ValueError, match="window"):
        rolling_corr(df, "k", "t", "x", "y", "tb", window=1)


def _gini_brute(vals, scale=10**6):
    sv = sorted(int(round(v * scale)) for v in vals if v is not None)
    n = len(sv)
    total = sum(sv)
    # tie-averaged ranks via level grouping
    from collections import Counter

    levels = Counter(sv)
    cum = 0
    num = 0
    for v in sorted(levels):
        c = levels[v]
        cum += c
        num += (2 * cum - c - n) * v
    g = round(num / (n * total), 6) if total > 0 else None
    return n, round(total / scale, 6), g


def test_gini_matches_brute_force(spark):
    from wicsmmiretl_spark.operators.aggregates import gini_coefficient

    vals = [random.Random(97).uniform(0, 100) for _ in range(300)] + [5.0] * 50
    df = spark.createDataFrame([(round(v, 3),) for v in vals], "v: double")
    got = gini_coefficient(df, "v").collect()[0]
    assert (got["n"], got["total"], got["gini"]) == _gini_brute([round(v, 3) for v in vals])


def test_gini_extremes(spark):
    from wicsmmiretl_spark.operators.aggregates import gini_coefficient

    # Uniform mass -> 0; one row holds everything -> (n-1)/n.
    df = spark.createDataFrame([(10.0,)] * 20, "v: double")
    assert gini_coefficient(df, "v").collect()[0]["gini"] == 0.0
    df = spark.createDataFrame([(0.0,)] * 19 + [(100.0,)], "v: double")
    assert gini_coefficient(df, "v").collect()[0]["gini"] == round(19 / 20, 6)
    df = spark.createDataFrame([(0.0,)] * 5, "v: double")
    assert gini_coefficient(df, "v").collect()[0]["gini"] is None
    df = spark.createDataFrame([(-1.0,)], "v: double")
    with pytest.raises(Exception, match="negative value"):
        gini_coefficient(df, "v").collect()


class TestGroupedTheilSen:
    def test_recovers_slope_on_clean_line_and_resists_outliers(self, spark):
        from wicsmmiretl_spark.operators.aggregates import grouped_theil_sen

        # y = 3x + 1 exactly; one gross outlier. The median of pairwise
        # slopes must stay 3.0 where OLS would be dragged.
        rows = [("g", float(i), 3.0 * i + 1.0, i) for i in range(1, 40)]
        rows.append(("g", 40.0, 100000.0, 40))
        df = spark.createDataFrame(rows, "k string, x double, y double, id long")
        out = grouped_theil_sen(df, ["k"], "x", "y", "id").collect()
        assert len(out) == 1
        assert abs(out[0].slope - 3.0) < 0.5
        assert out[0].n_pairs <= 40

    def test_deterministic_and_seed_sensitive(self, spark):
        import random as rnd

        from wicsmmiretl_spark.operators.aggregates import grouped_theil_sen

        rnd.seed(2)
        rows = [
            ("g", float(i), 2.0 * i + rnd.uniform(-5, 5), i) for i in range(1, 60)
        ]
        df = spark.createDataFrame(rows, "k string, x double, y double, id long")

        def run(seed):
            r = grouped_theil_sen(df, ["k"], "x", "y", "id", seed=seed).collect()[0]
            return (r.slope, r.n_pairs)

        assert run(7) == run(7)
        # A different pairing permutation moves the sampled median
        # (same underlying trend, different finite sample).
        assert run(7) != run(8) or run(7)[0] != run(9)[0]

    def test_constant_x_group_yields_null_slope(self, spark):
        from wicsmmiretl_spark.operators.aggregates import grouped_theil_sen

        df = spark.createDataFrame(
            [("g", 1.0, float(v), v) for v in range(5)],
            "k string, x double, y double, id long",
        )
        out = grouped_theil_sen(df, ["k"], "x", "y", "id").collect()
        # Every pair shares x → filtered out → group disappears (no valid
        # evidence for a slope, not slope=0).
        assert out == []

    def test_validates_column_names(self, spark):
        import pytest as _pytest

        from wicsmmiretl_spark.operators.aggregates import grouped_theil_sen

        df = spark.createDataFrame(
            [("g", 1.0, 2.0, 1)], "k string, x double, y double, id long"
        )
        for bad in (
            lambda: grouped_theil_sen(df, ["nope"], "x", "y", "id"),
            lambda: grouped_theil_sen(df, ["k"], "nope", "y", "id"),
            lambda: grouped_theil_sen(df, ["k"], "x", "nope", "id"),
            lambda: grouped_theil_sen(df, ["k"], "x", "y", "nope"),
        ):
            with _pytest.raises(ValueError, match="grouped_theil_sen"):
                bad()
        # Column-expression x (the non-str path) skips the x name check.
        assert grouped_theil_sen(df, ["k"], F.col("x") * 2, "y", "id").count() == 0


class TestConformalInterval:
    def test_coverage_on_heldout_future_points(self, spark):
        import random as rnd

        from wicsmmiretl_spark.operators.aggregates import conformal_interval

        rnd.seed(21)
        # y = 2x + noise(uniform ±3); a valid 90% interval must cover
        # ~90% of FRESH points from the same process.
        rows = [("g", i, float(x), 2.0 * x + rnd.uniform(-3, 3))
                for i, x in enumerate(rnd.choices(range(100), k=3000))]
        df = spark.createDataFrame(rows, "k string, id long, x double, y double")
        r = conformal_interval(df, ["k"], "x", "y", "id", q=0.9).collect()[0]
        assert abs(r.slope - 2.0) < 0.1
        assert 2.0 < r.half_width < 3.5   # true 90% band of U(-3,3) is 2.7
        fresh = [(x, 2.0 * x + rnd.uniform(-3, 3))
                 for x in rnd.choices(range(100), k=1000)]
        covered = sum(
            1 for x, y in fresh
            if abs(y - (r.slope * x + r.intercept)) <= r.half_width
        )
        assert covered / len(fresh) >= 0.85

    def test_split_is_seed_deterministic(self, spark):
        from wicsmmiretl_spark.operators.aggregates import conformal_interval

        rows = [("g", i, float(i % 50), float(i % 7)) for i in range(500)]
        df = spark.createDataFrame(rows, "k string, id long, x double, y double")

        def run(seed):
            r = conformal_interval(df, ["k"], "x", "y", "id", seed=seed).collect()[0]
            return (r.n_fit, r.n_cal, r.slope, r.half_width)

        assert run(17) == run(17)
        assert run(17) != run(18)

    def test_validates_q(self, spark):
        import pytest as _pytest

        from wicsmmiretl_spark.operators.aggregates import conformal_interval

        df = spark.createDataFrame([("g", 1, 1.0, 1.0)], "k string, id long, x double, y double")
        with _pytest.raises(ValueError, match="q must"):
            conformal_interval(df, ["k"], "x", "y", "id", q=1.5)
