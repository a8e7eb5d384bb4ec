"""Data-quality expectation tests: three-valued-logic violations, NULL-key
handling in uniqueness/referential rules, the gate, and validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wicsmmiretl_spark.operators.quality import dq_gate, dq_report


def _df(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "A"),
            (2, -5.0, "B"),
            (2, None, "A"),   # duplicate key + NULL amount
            (None, 3.0, "Z"), # NULL key + out-of-domain
        ],
        "k: bigint, amount: double, cat: string",
    )


def test_requires_rules(spark):
    with pytest.raises(ValueError, match="at least one rule"):
        dq_report(_df(spark))
    with pytest.raises(ValueError, match="key columns"):
        dq_report(_df(spark), unique={"u": []})


def test_row_rules_null_is_violation(spark):
    out = {
        r.rule: (r.violations, r.checked)
        for r in dq_report(
            _df(spark),
            row_rules={
                "amount_positive": F.col("amount") > 0,
                "cat_in_domain": F.col("cat").isin("A", "B"),
            },
        ).collect()
    }
    # -5 fails, NULL fails (unknown must not pass a gate) -> 2 violations.
    assert out["amount_positive"] == (2, 4)
    assert out["cat_in_domain"] == (1, 4)


def test_unique_ignores_null_keys(spark):
    out = dq_report(_df(spark), unique={"k_unique": ["k"]}).collect()[0]
    # Rows with k IN (1,2,2): one surplus row; the NULL-key row is excluded.
    assert (out.violations, out.checked) == (1, 3)


def test_referential_counts_orphans(spark):
    ref = spark.createDataFrame([(1,)], "rk: bigint")
    out = dq_report(
        _df(spark), references={"k_in_ref": (["k"], ref, ["rk"])}
    ).collect()[0]
    # k=2 twice are orphans; NULL k not checked.
    assert (out.violations, out.checked) == (2, 3)


def test_referential_duplicate_ref_keys_not_double_counted(spark):
    ref = spark.createDataFrame([(1,), (1,), (2,)], "rk: bigint")
    out = dq_report(
        _df(spark), references={"k_in_ref": (["k"], ref, ["rk"])}
    ).collect()[0]
    assert (out.violations, out.checked) == (0, 3)


def test_gate_raises_over_budget(spark):
    rep = dq_report(_df(spark), row_rules={"amount_positive": F.col("amount") > 0})
    with pytest.raises(ValueError, match="amount_positive=2/4"):
        dq_gate(rep)
    dq_gate(rep, max_violation_rate=0.5)  # 2/4 within budget


def test_rule_names_may_contain_dots_and_spaces(spark):
    out = dq_report(
        _df(spark), row_rules={"amount > 0 (v1.2)": F.col("amount") > 0}
    ).collect()[0]
    assert out.rule == "amount > 0 (v1.2)" and out.violations == 2


def test_reference_rule_validates_shape(spark):
    ref = spark.createDataFrame([(1,)], "rk: bigint")
    with pytest.raises(ValueError, match="matching non-empty"):
        dq_report(_df(spark), references={"bad": ([], ref, [])})
    with pytest.raises(ValueError, match="matching non-empty"):
        dq_report(_df(spark), references={"bad": (["k"], ref, ["rk", "x"])})


# ---------------------------------------------------------------------------
# key_skew_profile
# ---------------------------------------------------------------------------

def test_key_skew_profile_known_distribution(spark):
    from wicsmmiretl_spark.operators.quality import key_skew_profile

    rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1 + [(None,)]
    df = spark.createDataFrame(rows, "k: string")
    out = key_skew_profile(df, "k", top_k=2).collect()
    assert [(r.key, r.n_rows) for r in out] == [("a", 6), ("b", 3)]
    a, b = out
    assert (a.frac, a.cum_frac, a.skew) == (0.6, 0.6, 1.8)  # 6/10, 6*3/10
    assert (b.frac, b.cum_frac, b.skew) == (0.3, 0.9, 0.9)


def test_key_skew_profile_validates(spark):
    from wicsmmiretl_spark.operators.quality import key_skew_profile

    df = spark.createDataFrame([("a",)], "k: string")
    with pytest.raises(ValueError, match="top_k"):
        key_skew_profile(df, "k", top_k=0)
    with pytest.raises(ValueError, match="not in"):
        key_skew_profile(df, "nope")


class TestFdCheck:
    def test_holding_and_failing_fd(self, spark):
        from wicsmmiretl_spark.operators.quality import fd_check

        df = spark.createDataFrame(
            [("a", 1, "x"), ("a", 1, "y"), ("b", 2, "x"), ("c", 2, "x"), ("c", 3, "x")],
            "det string, dep int, other string",
        )
        holds = fd_check(df, ["det", "dep"], "other").collect()[0]
        # (a,1)->{x,y} violates; the other three (det,dep) groups map to one.
        assert holds.fd == "det,dep->other"
        assert holds.n_groups == 4 and holds.n_violating == 1
        assert holds.max_dependents == 2 and holds.rows_in_violating == 2
        assert holds.holds is False

        ok = fd_check(df.filter("other = 'x'"), ["det"], "other").collect()[0]
        assert ok.holds is True and ok.n_violating == 0
        assert ok.violation_rate == 0.0

    def test_null_dependents_are_not_values(self, spark):
        from wicsmmiretl_spark.operators.quality import fd_check

        df = spark.createDataFrame(
            [("a", "x"), ("a", None), ("b", None)], "det string, dep string"
        )
        r = fd_check(df, ["det"], "dep").collect()[0]
        # 'a' maps to one non-NULL value, 'b' to zero — FD holds.
        assert r.holds is True and r.max_dependents == 1

    def test_validates(self, spark):
        import pytest as _pytest

        from wicsmmiretl_spark.operators.quality import fd_check

        df = spark.createDataFrame([("a", 1)], "det string, dep int")
        with _pytest.raises(ValueError, match="non-empty"):
            fd_check(df, [], "dep")
        with _pytest.raises(ValueError, match="column"):
            fd_check(df, ["nope"], "dep")


class TestKAnonymity:
    def test_profile_counts(self, spark):
        from wicsmmiretl_spark.operators.quality import k_anonymity

        df = spark.createDataFrame(
            [(1, "a"), (1, "a"), (1, "a"), (2, "a"), (2, "a"), (3, "b")],
            "age int, zip string",
        )
        r = k_anonymity(df, ["age", "zip"], k=2).collect()[0]
        assert r.n_rows == 6 and r.n_classes == 3
        assert r.min_class_size == 1 and r.rows_below_k == 1
        assert r.anonymous is False
        r2 = k_anonymity(df.filter("age < 3"), ["age", "zip"], k=2).collect()[0]
        assert r2.anonymous is True and r2.rows_below_k == 0

    def test_nulls_group_together(self, spark):
        from wicsmmiretl_spark.operators.quality import k_anonymity

        df = spark.createDataFrame(
            [(None, "a"), (None, "a"), (1, "a")], "age int, zip string"
        )
        r = k_anonymity(df, ["age", "zip"], k=2).collect()[0]
        # The two NULL-age rows form one class of 2; the lone age=1 row
        # is the exposure.
        assert r.n_classes == 2 and r.min_class_size == 1 and r.rows_below_k == 1

    def test_validates(self, spark):
        import pytest as _pytest

        from wicsmmiretl_spark.operators.quality import k_anonymity

        df = spark.createDataFrame([(1,)], "age int")
        with _pytest.raises(ValueError, match="non-empty"):
            k_anonymity(df, [], 5)
        with _pytest.raises(ValueError, match="k must"):
            k_anonymity(df, ["age"], 0)


class TestLDiversity:
    def test_homogeneous_class_fails(self, spark):
        from wicsmmiretl_spark.operators.quality import l_diversity

        rows = [
            (1, "a", "flu"), (1, "a", "flu"), (1, "a", "flu"),  # homogeneous
            (2, "a", "flu"), (2, "a", "cold"),                  # diverse
        ]
        df = spark.createDataFrame(rows, "age int, zip string, dx string")
        r = l_diversity(df, ["age", "zip"], "dx", l=2).collect()[0]
        assert r.n_classes == 2 and r.min_diversity == 1
        assert r.classes_below_l == 1 and r.rows_below_l == 3
        assert r.diverse is False
        # k-anonymity would PASS this table at k=2 — the attack l-diversity
        # exists to catch.
        from wicsmmiretl_spark.operators.quality import k_anonymity

        assert k_anonymity(df, ["age", "zip"], k=2).collect()[0].anonymous is True

    def test_null_sensitive_is_not_a_value(self, spark):
        from wicsmmiretl_spark.operators.quality import l_diversity

        df = spark.createDataFrame(
            [(1, "flu"), (1, None)], "age int, dx string"
        )
        r = l_diversity(df, ["age"], "dx", l=2).collect()[0]
        assert r.min_diversity == 1 and r.diverse is False

    def test_validates(self, spark):
        import pytest as _pytest

        from wicsmmiretl_spark.operators.quality import l_diversity

        df = spark.createDataFrame([(1, "x")], "age int, dx string")
        with _pytest.raises(ValueError, match="l must"):
            l_diversity(df, ["age"], "dx", l=0)
