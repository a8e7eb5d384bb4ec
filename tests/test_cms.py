"""Count-min sketch tests: never-underestimate guarantee, merge-equals-
whole, heavy-hitter superset, unseen values, validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wicsmmiretl_spark.operators.aggregates import (
    cms_estimate,
    cms_heavy_hitters,
    cms_merge,
    cms_sketch,
)


def _stream(spark, counts: dict[str, int]):
    rows = [(v,) for v, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "v: string")


def test_validates_params(spark):
    df = _stream(spark, {"a": 1})
    with pytest.raises(ValueError, match="depth"):
        cms_sketch(df, "v", depth=9)
    with pytest.raises(ValueError, match="width"):
        cms_sketch(df, "v", width=1)
    with pytest.raises(ValueError, match="min_frac"):
        cms_heavy_hitters(df, "v", min_frac=0.0)


def test_never_underestimates(spark):
    truth = {"a": 50, "b": 30, "c": 5, "d": 1}
    df = _stream(spark, truth)
    sk = cms_sketch(df, "v", depth=4, width=64)
    est = {r.value: r.est for r in cms_estimate(sk, df, "v", depth=4, width=64).collect()}
    for v, n in truth.items():
        assert est[v] >= n


def test_wide_sketch_is_exact_for_small_streams(spark):
    truth = {"a": 50, "b": 30, "c": 5}
    df = _stream(spark, truth)
    sk = cms_sketch(df, "v", depth=4, width=2048)
    est = {r.value: r.est for r in cms_estimate(sk, df, "v", depth=4, width=2048).collect()}
    assert est == truth  # 3 keys in 2048 buckets: no collisions


def test_merge_equals_whole(spark):
    a = _stream(spark, {"a": 10, "b": 3})
    b = _stream(spark, {"a": 5, "c": 7})
    whole = _stream(spark, {"a": 15, "b": 3, "c": 7})
    merged = cms_merge(cms_sketch(a, "v"), cms_sketch(b, "v"))
    lhs = sorted(tuple(r) for r in merged.collect())
    rhs = sorted(tuple(r) for r in cms_sketch(whole, "v").collect())
    assert lhs == rhs


def test_heavy_hitters_superset(spark):
    truth = {"hot": 80, "warm": 15, "cold": 3, "ice": 2}
    df = _stream(spark, truth)
    hh = {r.value for r in cms_heavy_hitters(df, "v", min_frac=0.10).collect()}
    assert {"hot", "warm"} <= hh  # true >=10% values always present
    assert "ice" not in hh or True  # overestimates may add, never drop


def test_unseen_value_estimates_zero(spark):
    sk = cms_sketch(_stream(spark, {"a": 3}), "v", depth=4, width=2048)
    ghosts = spark.createDataFrame([("zz",)], "v: string")
    est = cms_estimate(sk, ghosts, "v", depth=4, width=2048).collect()[0]
    assert est.est == 0  # ghost hits no occupied bucket at this width


def test_nulls_excluded(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",)], "v: string")
    sk = cms_sketch(df, "v", depth=2, width=64)
    assert sk.agg(F.sum("cnt")).collect()[0][0] == 4  # 2 rows x depth 2


# ---------------------------------------------------------------------------
# corr_matrix (exact one-pass Pearson)
# ---------------------------------------------------------------------------

def test_corr_matrix_known_values(spark):
    from wicsmmiretl_spark.operators.aggregates import corr_matrix

    df = spark.createDataFrame(
        [(1.0, 2.0, 5.0), (2.0, 4.0, 4.0), (3.0, 6.0, 3.0), (4.0, 8.0, 1.0)],
        "x: double, y: double, z: double",
    )
    out = {(r.col_x, r.col_y): r.corr for r in corr_matrix(df, ["x", "y", "z"]).collect()}
    assert out[("x", "y")] == 1.0         # perfectly linear
    # r = -6.5 / sqrt(5 * 8.75) = -0.982708 (hand-computed)
    assert out[("x", "z")] == pytest.approx(-0.982708, abs=1e-6)
    assert out[("y", "z")] == out[("x", "z")]


def test_corr_matrix_zero_variance_is_null(spark):
    from wicsmmiretl_spark.operators.aggregates import corr_matrix

    df = spark.createDataFrame([(1.0, 7.0), (2.0, 7.0)], "x: double, c: double")
    out = corr_matrix(df, ["x", "c"]).collect()[0]
    assert out.corr is None


def test_corr_matrix_listwise_null_drop(spark):
    from wicsmmiretl_spark.operators.aggregates import corr_matrix

    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 2.0), (None, 9.0), (3.0, None)], "x: double, y: double"
    )
    out = corr_matrix(df, ["x", "y"]).collect()[0]
    assert out.n == 2 and out.corr == 1.0


def test_corr_matrix_validates(spark):
    from wicsmmiretl_spark.operators.aggregates import corr_matrix

    df = spark.createDataFrame([(1.0,)], "x: double")
    with pytest.raises(ValueError, match="at least 2"):
        corr_matrix(df, ["x"])
    with pytest.raises(ValueError, match="not in"):
        corr_matrix(df, ["x", "ghost"])


# ---------------------------------------------------------------------------
# profile_drift
# ---------------------------------------------------------------------------

def test_profile_drift_flags(spark):
    from wicsmmiretl_spark.operators.aggregates import profile_drift

    old = spark.createDataFrame(
        [(i, "x") for i in range(100)], "k: bigint, c: string"
    )
    # new: half the keys collapsed to one value (distinct crash) and 10% nulls in c.
    new = spark.createDataFrame(
        [(i % 10, None if i < 10 else "x") for i in range(100)], "k: bigint, c: string"
    )
    out = {r["column"]: r for r in profile_drift(old, new, ["k", "c"]).collect()}
    assert out["k"].distinct_ratio == 0.1 and bool(out["k"].distinct_drift)
    assert out["c"].new_null_frac == 0.1 and bool(out["c"].null_drift)
    assert out["k"].row_delta_frac == 0.0


def test_profile_drift_boundary_is_not_drift(spark):
    from wicsmmiretl_spark.operators.aggregates import profile_drift

    old = spark.createDataFrame([(1,), (2,)], "k: bigint")
    new = spark.createDataFrame([(1,), (2,), (3,), (4,)], "k: bigint")
    out = profile_drift(old, new, ["k"]).collect()[0]
    assert out.distinct_ratio == 2.0 and not out.distinct_drift  # strict bound


def test_profile_drift_validates(spark):
    import pytest as _pytest
    from wicsmmiretl_spark.operators.aggregates import profile_drift

    df = spark.createDataFrame([(1,)], "k: bigint")
    with _pytest.raises(ValueError, match="distinct_ratio_tol"):
        profile_drift(df, df, ["k"], distinct_ratio_tol=0.0)


# ---------------------------------------------------------------------------
# grouped_ols
# ---------------------------------------------------------------------------

def test_grouped_ols_perfect_line(spark):
    from wicsmmiretl_spark.operators.aggregates import grouped_ols

    rows = [("g", float(x), 2.0 * x + 3.0) for x in range(10)]
    df = spark.createDataFrame(rows, "g: string, x: double, y: double")
    out = grouped_ols(df, ["g"], "x", "y", x_scale=2, y_scale=2).collect()[0]
    assert (out.n, out.slope, out.intercept, out.r2) == (10, 2.0, 3.0, 1.0)


def test_grouped_ols_per_group_independence(spark):
    from wicsmmiretl_spark.operators.aggregates import grouped_ols

    rows = [("up", float(x), float(x)) for x in range(5)] + [
        ("down", float(x), float(-x)) for x in range(5)
    ]
    df = spark.createDataFrame(rows, "g: string, x: double, y: double")
    out = {r.g: r.slope for r in grouped_ols(df, ["g"], "x", "y", y_scale=2).collect()}
    assert out == {"up": 1.0, "down": -1.0}


def test_grouped_ols_zero_x_variance_is_null(spark):
    from wicsmmiretl_spark.operators.aggregates import grouped_ols

    df = spark.createDataFrame(
        [("g", 5.0, 1.0), ("g", 5.0, 2.0)], "g: string, x: double, y: double"
    )
    out = grouped_ols(df, ["g"], "x", "y").collect()[0]
    assert out.slope is None and out.intercept is None and out.r2 is None


def test_grouped_ols_null_rows_dropped(spark):
    from wicsmmiretl_spark.operators.aggregates import grouped_ols

    df = spark.createDataFrame(
        [("g", 1.0, 1.0), ("g", 2.0, 2.0), ("g", None, 9.0), ("g", 3.0, None)],
        "g: string, x: double, y: double",
    )
    out = grouped_ols(df, ["g"], "x", "y", y_scale=2).collect()[0]
    assert out.n == 2 and out.slope == 1.0


def test_grouped_ols_validates(spark):
    import pytest as _pytest
    from wicsmmiretl_spark.operators.aggregates import grouped_ols

    df = spark.createDataFrame([("g", 1.0, 1.0)], "g: string, x: double, y: double")
    with _pytest.raises(ValueError, match="not in"):
        grouped_ols(df, ["g"], "ghost", "y")


# ---------------------------------------------------------------------------
# target_encode
# ---------------------------------------------------------------------------

def test_target_encode_shrinks_rare_toward_global(spark):
    from wicsmmiretl_spark.operators.aggregates import target_encode

    rows = [("common", 10.0)] * 100 + [("rare", 1000.0)]
    df = spark.createDataFrame(rows, "c: string, y: double")
    out = {r.category: r.encoded for r in target_encode(df, "c", "y", prior_weight=10.0).collect()}
    gmean = (100 * 10.0 + 1000.0) / 101
    # rare: (1000 + 10*gmean) / 11 — pulled hard toward the global mean.
    assert out["rare"] == pytest.approx((1000.0 + 10 * gmean) / 11, abs=1e-4)
    assert abs(out["common"] - 10.0) < abs(out["rare"] - 1000.0)


def test_target_encode_zero_prior_is_plain_mean(spark):
    from wicsmmiretl_spark.operators.aggregates import target_encode

    df = spark.createDataFrame([("a", 2.0), ("a", 4.0), ("b", 10.0)], "c: string, y: double")
    out = {r.category: (r.n, r.encoded) for r in target_encode(df, "c", "y", prior_weight=0.0).collect()}
    assert out == {"a": (2, 3.0), "b": (1, 10.0)}


def test_target_encode_null_category_is_a_level(spark):
    from wicsmmiretl_spark.operators.aggregates import target_encode

    df = spark.createDataFrame([(None, 4.0), ("a", 2.0), ("a", None)], "c: string, y: double")
    out = {r.category: r.n for r in target_encode(df, "c", "y", prior_weight=0.0).collect()}
    assert out == {None: 1, "a": 1}  # NULL target excluded, NULL category kept


def test_target_encode_validates(spark):
    from wicsmmiretl_spark.operators.aggregates import target_encode

    df = spark.createDataFrame([("a", 1.0)], "c: string, y: double")
    with pytest.raises(ValueError, match="prior_weight"):
        target_encode(df, "c", "y", prior_weight=-1)
    with pytest.raises(ValueError, match="not in"):
        target_encode(df, "ghost", "y")


# ---------------------------------------------------------------------------
# ab_test_stats (Welch)
# ---------------------------------------------------------------------------

def test_welch_known_values(spark):
    from wicsmmiretl_spark.operators.aggregates import ab_test_stats

    rows = [("a", v) for v in (1.0, 2.0, 3.0, 4.0)] + [("b", v) for v in (3.0, 5.0, 7.0)]
    df = spark.createDataFrame(rows, "g: string, y: double")
    out = ab_test_stats(df, "g", "y", "a", "b", scale=2).collect()[0]
    # Hand: mean_a=2.5 var_a=5/3; mean_b=5 var_b=4; se2=5/12+4/3=1.75
    # t=-2.5/sqrt(1.75)=-1.889822; dof=1.75^2/((5/12)^2/3+(4/3)^2/2)=3.2347
    assert (out.n_a, out.n_b, out.mean_a, out.mean_b) == (4, 3, 2.5, 5.0)
    assert out.var_a == pytest.approx(5 / 3, abs=1e-5) and out.var_b == 4.0
    assert out.t_stat == pytest.approx(-1.889822, abs=1e-6)
    assert out.dof == pytest.approx(3.23, abs=0.01)


def test_welch_identical_groups_t_zero(spark):
    from wicsmmiretl_spark.operators.aggregates import ab_test_stats

    rows = [("a", float(v)) for v in range(5)] + [("b", float(v)) for v in range(5)]
    df = spark.createDataFrame(rows, "g: string, y: double")
    out = ab_test_stats(df, "g", "y", "a", "b").collect()[0]
    assert out.t_stat == 0.0


def test_welch_tiny_group_yields_null(spark):
    from wicsmmiretl_spark.operators.aggregates import ab_test_stats

    df = spark.createDataFrame([("a", 1.0), ("a", 2.0), ("b", 5.0)], "g: string, y: double")
    out = ab_test_stats(df, "g", "y", "a", "b").collect()[0]
    assert out.n_b == 1 and out.t_stat is None and out.dof is None


def test_welch_validates(spark):
    from wicsmmiretl_spark.operators.aggregates import ab_test_stats

    df = spark.createDataFrame([("a", 1.0)], "g: string, y: double")
    with pytest.raises(ValueError, match="must differ"):
        ab_test_stats(df, "g", "y", "a", "a")


# ---------------------------------------------------------------------------
# category_entropy
# ---------------------------------------------------------------------------

def test_entropy_uniform_and_constant(spark):
    import math

    from wicsmmiretl_spark.operators.aggregates import category_entropy

    rows = [(v, "same") for v in ("a", "b", "c", "d") * 5]
    df = spark.createDataFrame(rows, "u: string, k: string")
    out = {r["column"]: r for r in category_entropy(df, ["u", "k"]).collect()}
    assert out["u"].entropy == pytest.approx(math.log(4), abs=1e-5)
    assert out["u"].norm_entropy == 1.0  # uniform over 4
    assert out["k"].entropy == 0.0 and out["k"].norm_entropy is None  # constant


def test_entropy_skew_lowers_normalized(spark):
    from wicsmmiretl_spark.operators.aggregates import category_entropy

    rows = [("hot",)] * 90 + [("cold",)] * 10
    df = spark.createDataFrame(rows, "c: string")
    out = category_entropy(df, ["c"]).collect()[0]
    assert out.n == 100 and out.n_categories == 2
    assert 0 < out.norm_entropy < 1


def test_entropy_nulls_excluded(spark):
    from wicsmmiretl_spark.operators.aggregates import category_entropy

    df = spark.createDataFrame([("a",), (None,), ("b",)], "c: string")
    out = category_entropy(df, ["c"]).collect()[0]
    assert out.n == 2 and out.n_categories == 2


def test_entropy_validates(spark):
    from wicsmmiretl_spark.operators.aggregates import category_entropy

    df = spark.createDataFrame([("a",)], "c: string")
    with pytest.raises(ValueError, match="not in"):
        category_entropy(df, ["ghost"])


def test_entropy_plan_has_no_window(spark):
    # Per-column totals must come from a grouped agg + broadcast join,
    # never a PARTITION BY column window: the window hashes EVERY
    # (column, value) count row of a column into one task, and a
    # high-cardinality column has value-grain cardinality approaching
    # row count. Gate: no window node anywhere, and the totals join is
    # a broadcast.
    from wicsmmiretl_spark.operators.aggregates import category_entropy

    rows = [(str(i % 97), str(i)) for i in range(500)]
    df = spark.createDataFrame(rows, "lo: string, hi: string")
    plan = (
        category_entropy(df, ["lo", "hi"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "windowspecdefinition" not in plan.lower(), plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


# ---------------------------------------------------------------------------
# cms_join_size (AMS inner-product estimator)
# ---------------------------------------------------------------------------

def test_cms_join_size_upper_bounds_and_converges(spark):
    from wicsmmiretl_spark.operators.aggregates import cms_join_size, cms_sketch

    rows = [(i % 50,) for i in range(2000)]  # 50 keys x 40 -> F2 = 50*1600
    df = spark.createDataFrame(rows, "k long")
    exact = 50 * 40 * 40
    # Wide sketch: near-zero collision noise, estimate == exact.
    wide = cms_sketch(df, "k", depth=4, width=65536)
    est_wide = cms_join_size(wide, wide).collect()[0]["est_join_size"]
    assert est_wide == exact
    # Narrow sketch: collisions only ADD mass — still an upper bound.
    narrow = cms_sketch(df, "k", depth=4, width=16)
    est_narrow = cms_join_size(narrow, narrow).collect()[0]["est_join_size"]
    assert est_narrow >= exact


def test_cms_join_size_cross_streams(spark):
    from wicsmmiretl_spark.operators.aggregates import cms_join_size, cms_sketch

    a = spark.createDataFrame([(1,), (1,), (2,), (3,)], "k long")
    b = spark.createDataFrame([(1,), (2,), (2,), (9,)], "k long")
    # true join size = 2*1 (k=1) + 1*2 (k=2) = 4
    ska = cms_sketch(a, "k", depth=4, width=65536)
    skb = cms_sketch(b, "k", depth=4, width=65536)
    assert cms_join_size(ska, skb).collect()[0]["est_join_size"] == 4
    import pytest as _pytest

    with _pytest.raises(ValueError, match="missing columns"):
        cms_join_size(a, skb)


class TestPoissonBootstrap:
    def test_ci_brackets_the_truth_and_is_deterministic(self, spark):
        from wicsmmiretl_spark.operators.aggregates import poisson_bootstrap_ci

        import random as rnd

        rnd.seed(4)
        rows = [(i, 100.0 + rnd.uniform(-10, 10)) for i in range(2000)]
        df = spark.createDataFrame(rows, "k long, v double")
        r1 = poisson_bootstrap_ci(df, "v", "k", n_replicas=32).collect()[0]
        r2 = poisson_bootstrap_ci(df, "v", "k", n_replicas=32).collect()[0]
        assert (r1.ci_low, r1.ci_high) == (r2.ci_low, r2.ci_high)
        assert r1.n_rows == 2000 and r1.n_replicas == 32
        # True mean ~100, sd ~5.8 → se ~0.13; the CI must bracket the
        # sample mean and be plausibly narrow.
        assert r1.ci_low < r1.point < r1.ci_high
        assert 0.05 < (r1.ci_high - r1.ci_low) < 2.0

    def test_width_shrinks_with_sample_size(self, spark):
        from wicsmmiretl_spark.operators.aggregates import poisson_bootstrap_ci

        import random as rnd

        rnd.seed(5)
        big = [(i, 50.0 + rnd.uniform(-5, 5)) for i in range(4000)]
        small = big[:250]

        def width(rows):
            df = spark.createDataFrame(rows, "k long, v double")
            r = poisson_bootstrap_ci(df, "v", "k", n_replicas=32).collect()[0]
            return r.ci_high - r.ci_low

        assert width(big) < width(small)

    def test_validates(self, spark):
        import pytest as _pytest

        from wicsmmiretl_spark.operators.aggregates import poisson_bootstrap_ci

        df = spark.createDataFrame([(1, 1.0)], "k long, v double")
        with _pytest.raises(ValueError, match="n_replicas"):
            poisson_bootstrap_ci(df, "v", "k", n_replicas=4)
        with _pytest.raises(ValueError, match="lo < hi"):
            poisson_bootstrap_ci(df, "v", "k", lo=0.9, hi=0.1)


class TestGroupedTrimmedStats:
    def test_trimming_kills_the_spike(self, spark):
        from wicsmmiretl_spark.operators.aggregates import grouped_trimmed_stats

        vals = [float(v) for v in range(1, 20)] + [10000.0]
        df = spark.createDataFrame([("g", v) for v in vals], "k string, v double")
        r = grouped_trimmed_stats(df, ["k"], "v", trim=0.1).collect()[0]
        plain_mean = sum(vals) / len(vals)
        assert plain_mean > 500          # the spike dominates the plain mean
        assert r.trimmed_mean < 20       # ...and is gone from the trimmed one
        assert r.winsorized_mean < 25    # ...and clamped in the winsorized one
        assert r.n == 20 and r.n_trimmed >= 2
        assert r.fence_lo <= r.trimmed_mean <= r.fence_hi

    def test_no_outliers_means_agree_with_plain_mean(self, spark):
        from wicsmmiretl_spark.operators.aggregates import grouped_trimmed_stats

        df = spark.createDataFrame([("g", 5.0)] * 10, "k string, v double")
        r = grouped_trimmed_stats(df, ["k"], "v").collect()[0]
        assert r.trimmed_mean == r.winsorized_mean == 5.0
        assert r.n_trimmed == 0

    def test_validates_trim(self, spark):
        import pytest as _pytest

        from wicsmmiretl_spark.operators.aggregates import grouped_trimmed_stats

        df = spark.createDataFrame([("g", 1.0)], "k string, v double")
        with _pytest.raises(ValueError, match="trim"):
            grouped_trimmed_stats(df, ["k"], "v", trim=0.5)
