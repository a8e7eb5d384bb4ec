"""distributed_ntile — the two-level range-partitioned exact binning.

Two gates:

* SEMANTICS — bit-identical to ``ntile(n) OVER (ORDER BY ...)`` for
  every bucket count, including ties on the value, n > N, and n ∤ N
  remainders (Spark and DuckDB share the leading-buckets remainder
  rule, so this equivalence IS the oracle contract).
* PLAN SHAPE — the binning exchange is a RANGE partitioning over >1
  partition and the plan contains NO single-partition window (the
  ``WindowExec: No Partition Defined`` one-task funnel this operator
  exists to kill). The four suite queries that ride it
  (events_value_deciles, purchase_calibration, corpus_curriculum_stages,
  customer_rfm_segments — plus order_feature_matrix) are pinned to the
  same shape.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from wicsmmiretl_spark.operators.sampling import distributed_ntile


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _df(spark, n_rows=997, vmax=37, parts=7):
    rng = random.Random(13)
    rows = [(i, rng.randint(0, vmax)) for i in range(n_rows)]
    return spark.createDataFrame(rows, "id long, v int").repartition(parts)


class TestSemantics:
    def test_matches_window_ntile_exactly(self, spark):
        df = _df(spark)
        w = Window.orderBy(F.asc("v"), F.asc("id"))
        for n in (2, 5, 8, 100, 997, 1500):
            got = {
                r["id"]: r["b"]
                for r in distributed_ntile(df, ["v", "id"], n, "b").collect()
            }
            exp = {
                r["id"]: r["b"]
                for r in df.select("id", F.ntile(n).over(w).alias("b")).collect()
            }
            assert got == exp, f"ntile mismatch at n={n}"

    def test_empty_input(self, spark):
        e = spark.createDataFrame([], "id long, v int")
        out = distributed_ntile(e, ["v", "id"], 4, "b")
        assert out.count() == 0
        assert out.columns == ["id", "v", "b"]

    def test_output_type_and_range(self, spark):
        out = distributed_ntile(_df(spark), ["v", "id"], 5, "b")
        assert dict(out.dtypes)["b"] == "int"
        lo, hi = out.agg(F.min("b"), F.max("b")).first()
        assert (lo, hi) == (1, 5)

    def test_validates(self, spark):
        df = _df(spark, n_rows=5)
        with pytest.raises(ValueError, match="n must be >= 1"):
            distributed_ntile(df, ["v", "id"], 0)
        with pytest.raises(ValueError, match="order_cols"):
            distributed_ntile(df, [], 4)
        with pytest.raises(ValueError, match="not in"):
            distributed_ntile(df, ["nope"], 4)
        with pytest.raises(ValueError, match="already has"):
            distributed_ntile(df, ["v", "id"], 4, out_col="v")
        with pytest.raises(ValueError, match="_pid"):
            distributed_ntile(df.withColumn("_pid", F.lit(0)), ["v", "id"], 4)
        # Uniform across n: the n=1 fast path must reject _pid too, so an
        # n_files sweep over [1, 2, ...] fails consistently at n=1.
        with pytest.raises(ValueError, match="_pid"):
            distributed_ntile(df.withColumn("_pid", F.lit(0)), ["v", "id"], 1)
        # _gidx is the operator's own rank scratch — same silent-clobber
        # class as _pid, same loud rejection.
        with pytest.raises(ValueError, match="_gidx"):
            distributed_ntile(df.withColumn("_gidx", F.lit(0)), ["v", "id"], 4)

    def test_n1_is_the_trivial_single_bucket(self, spark):
        """ntile(1) is legal Spark (every row bucket 1) and layout callers
        use it as the single-file degenerate baseline — no exchange, no
        offsets job, just a constant column."""
        df = _df(spark, n_rows=9)
        out = distributed_ntile(df, ["v", "id"], 1, "b")
        assert dict(out.dtypes)["b"] == "int"
        assert out.groupBy("b").count().collect() == [Row(b=1, count=9)]


class TestPlanShape:
    def test_binning_stage_is_a_range_exchange(self, spark):
        # The downstream lazy checkpoint (needed so the offsets job and
        # the output see the SAME sampled range boundaries) truncates
        # lineage, so the exchange is pinned on the pre-checkpoint stage
        # builder the operator actually runs.
        from wicsmmiretl_spark.operators.sampling import _ranged_parts

        plan = _plan(_ranged_parts(_df(spark, n_rows=4000), ["v", "id"]))
        assert "rangepartitioning" in plan, plan
        assert "SinglePartition" not in plan, plan

    def test_whole_operator_has_no_single_partition_window(self, spark):
        out = distributed_ntile(_df(spark, n_rows=4000), ["v", "id"], 10, "b")
        plan = _plan(out)
        # The one-task funnel this operator replaces: ntile over a
        # global-order window planned onto a single partition.
        assert "SinglePartition" not in plan, plan
        assert "ntile" not in plan, plan

    def test_data_flows_through_multiple_partitions(self, spark):
        # AQE legitimately coalesces a KB-scale exchange to one
        # partition; pin it off to observe the scale-path behavior.
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        try:
            out = distributed_ntile(_df(spark, n_rows=4000), ["v", "id"], 10, "b")
            n_parts = out.select(F.spark_partition_id().alias("p")).distinct().count()
        finally:
            spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
        assert n_parts > 1, "binning exchange collapsed to one partition"

    @pytest.mark.parametrize(
        "qname",
        [
            "events_value_deciles",
            "purchase_calibration",
            "corpus_curriculum_stages",
            "customer_rfm_segments",
            "order_feature_matrix",
        ],
    )
    def test_suite_binning_queries_have_no_single_partition_window(
        self, spark, sf_dir, qname
    ):
        from wicsmmiretl_spark.suite import QUERIES

        plan = _plan(QUERIES[qname](spark, sf_dir))
        assert "SinglePartition" not in plan, f"{qname}: one-task funnel\n{plan}"
        assert "ntile" not in plan, f"{qname}: global-window ntile survives\n{plan}"
