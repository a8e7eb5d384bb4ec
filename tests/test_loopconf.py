"""Contract tests for the loop-scoped conf guard (operators/loopconf.py).

The r14 optimization scopes AQE off (and pins the shuffle width) around the
iterative operators' internal materializations; these tests pin the restore
semantics the whole package now relies on — a guard that leaked its conf
would silently de-adapt every later query in the session.
"""

from __future__ import annotations

import pytest

from wicsmmiretl_spark.operators.loopconf import (
    loop_materialization_conf,
    loop_partitions,
    loop_scoped,
    scoped_conf,
    set_loop_shuffle_partitions,
)

AQE = "spark.sql.adaptive.enabled"
PARTS = "spark.sql.shuffle.partitions"


def test_scoped_conf_sets_and_restores(spark):
    before = spark.conf.get(AQE)
    with scoped_conf(spark, **{AQE: "false"}):
        assert spark.conf.get(AQE) == "false"
    assert spark.conf.get(AQE) == before


def test_scoped_conf_restores_on_exception(spark):
    before = spark.conf.get(PARTS)
    with pytest.raises(RuntimeError):
        with scoped_conf(spark, **{PARTS: "3"}):
            assert spark.conf.get(PARTS) == "3"
            raise RuntimeError("boom")
    assert spark.conf.get(PARTS) == before


def test_loop_materialization_conf_disables_aqe_and_restores_width(spark):
    aqe_before = spark.conf.get(AQE)
    parts_before = spark.conf.get(PARTS)
    with loop_materialization_conf(spark):
        assert spark.conf.get(AQE) == "false"
        # Loop bodies may pin their width without pairing a restore.
        set_loop_shuffle_partitions(spark, 2)
        assert spark.conf.get(PARTS) == "2"
    assert spark.conf.get(AQE) == aqe_before
    assert spark.conf.get(PARTS) == parts_before


def test_loop_aqe_env_optout(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_LOOP_AQE", "1")
    with loop_materialization_conf(spark):
        assert spark.conf.get(AQE) == "true"
    monkeypatch.delenv("SPARK_GRAFT_LOOP_AQE")


def test_loop_scoped_wraps_dataframe_arg(spark):
    seen = {}

    @loop_scoped
    def op(df):
        seen["aqe"] = df.sparkSession.conf.get(AQE)
        return df

    df = spark.range(4)
    op(df)
    assert seen["aqe"] == "false"
    assert spark.conf.get(AQE) == "true"


def test_loop_scoped_noop_without_dataframe():
    @loop_scoped
    def op(x):
        return x + 1

    assert op(41) == 42


def test_loop_partitions_bytes_sizing():
    session = 32
    # Tiny loops get the parallelism floor min(session, 8), not width 1.
    assert loop_partitions(10_000, 32, session) == 8
    # The floor respects a smaller session width.
    assert loop_partitions(10_000, 32, 4) == 4
    # ~64 MB per partition once the bytes term dominates: 1e9 rows x 32 B
    # = 32 GB -> 512 partitions, capped at the session width.
    assert loop_partitions(1_000_000_000, 32, session) == session
    # Uncapped growth between floor and cap.
    assert loop_partitions(40_000_000, 32, 64) == 20  # 1.28 GB / 64 MB
    assert loop_partitions(0, 32, session) == 1


def test_loop_scoped_operator_result_unchanged(spark):
    """connected_components under the guard: same labels as a plain run
    (the guard only changes HOW the loop materializes, never the output),
    and the session conf comes back adaptive."""
    from wicsmmiretl_spark.operators.graph import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20)], ["id_a", "id_b"]
    )
    out = {
        (r["id"], r["cluster_id"])
        for r in connected_components(pairs).collect()
    }
    comp123 = min(1, 2, 3)
    assert out == {
        (1, comp123), (2, comp123), (3, comp123),
        (10, 10), (11, 10), (20, 20),
    }
    assert spark.conf.get(AQE) == "true"
