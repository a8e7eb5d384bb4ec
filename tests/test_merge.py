from __future__ import annotations

import pytest
from pyspark.sql import Row

from wicsmmiretl_spark.operators.merge import merge_upsert


def _snapshot(spark):
    return spark.createDataFrame(
        [
            Row(k=1, name="a", bal=10.0),
            Row(k=2, name="b", bal=20.0),
            Row(k=3, name="c", bal=30.0),
        ]
    )


def test_merge_update_insert_passthrough(spark):
    src = spark.createDataFrame(
        [Row(k=2, name="b2", bal=99.0), Row(k=4, name="d", bal=40.0)]
    )
    got = {r.k: (r.name, r.bal) for r in merge_upsert(_snapshot(spark), src, ["k"]).collect()}
    assert got == {1: ("a", 10.0), 2: ("b2", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_merge_source_wins_even_with_null(spark):
    """MERGE semantics: a matched source row overwrites with NULL too —
    coalesce-based folding would silently keep the stale target value."""
    src = spark.createDataFrame(
        [(1, None, None)], schema="k bigint, name string, bal double"
    )
    row = merge_upsert(_snapshot(spark), src, ["k"]).filter("k = 1").collect()[0]
    assert row.name is None and row.bal is None


def test_merge_source_derived_from_target(spark):
    """The change-set is routinely a filter+recompute OF the snapshot —
    the self-join lineage must not trip the analyzer."""
    snap = _snapshot(spark)
    src = snap.filter("k = 3").withColumn("bal", snap.bal * 2)
    got = {r.k: r.bal for r in merge_upsert(snap, src, ["k"]).collect()}
    assert got == {1: 10.0, 2: 20.0, 3: 60.0}


def test_merge_rejects_schema_mismatch_and_bad_key(spark):
    snap = _snapshot(spark)
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_upsert(snap, snap.drop("bal"), ["k"])
    with pytest.raises(ValueError, match="key columns"):
        merge_upsert(snap, snap, ["nope"])


def test_merge_scd2_close_insert_noop_and_history(spark):
    from wicsmmiretl_spark.operators.merge import merge_scd2

    dim = spark.createDataFrame(
        [
            (1, "a", 10.0, "2020-01-01", None),      # will change -> close + reopen
            (2, "b", 20.0, "2020-01-01", None),      # no-op update
            (3, "c", 30.0, "2020-01-01", None),      # untouched
            (1, "a", 5.0, "2019-01-01", "2020-01-01"),  # closed history passes through
        ],
        "k long, name string, bal double, valid_from string, valid_to string",
    )
    upd = spark.createDataFrame(
        [(1, "a", 11.0, "2021-06-01"), (2, "b", 20.0, "2021-06-01"), (9, "z", 99.0, "2021-06-01")],
        "k long, name string, bal double, eff string",
    )
    out = merge_scd2(dim, upd, ["k"], ["bal"], "eff")
    rows = {(r.k, r.valid_from): (r.bal, r.valid_to) for r in out.collect()}
    assert rows[(1, "2019-01-01")] == (5.0, "2020-01-01")   # history untouched
    assert rows[(1, "2020-01-01")] == (10.0, "2021-06-01")  # closed at effective
    assert rows[(1, "2021-06-01")] == (11.0, None)          # reopened current
    assert rows[(2, "2020-01-01")] == (20.0, None)          # no-op stays current
    assert rows[(3, "2020-01-01")] == (30.0, None)          # untouched
    assert rows[(9, "2021-06-01")] == (99.0, None)          # brand-new key
    assert len(rows) == 6
    # exactly one current version per key
    cur = out.filter("valid_to is null").groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_merge_scd2_rejects_duplicate_update_keys(spark):
    import pytest
    from wicsmmiretl_spark.operators.merge import merge_scd2

    dim = spark.createDataFrame(
        [(1, 1.0, "2020-01-01", None)], "k long, bal double, valid_from string, valid_to string"
    )
    upd = spark.createDataFrame(
        [(1, 2.0, "2021-01-01"), (1, 3.0, "2021-01-01")], "k long, bal double, eff string"
    )
    with pytest.raises(ValueError, match="not unique"):
        merge_scd2(dim, upd, ["k"], ["bal"], "eff")


def test_merge_scd2_null_safe_tracking(spark):
    """NULL -> value and value -> NULL on a tracked column both count as a
    change; NULL -> NULL does not."""
    from wicsmmiretl_spark.operators.merge import merge_scd2

    dim = spark.createDataFrame(
        [(1, None, "2020-01-01", None), (2, 5.0, "2020-01-01", None), (3, None, "2020-01-01", None)],
        "k long, bal double, valid_from string, valid_to string",
    )
    upd = spark.createDataFrame(
        [(1, 7.0, "2021-01-01"), (2, None, "2021-01-01"), (3, None, "2021-01-01")],
        "k long, bal double, eff string",
    )
    out = merge_scd2(dim, upd, ["k"], ["bal"], "eff").collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.k, []).append((r.bal, r.valid_from, r.valid_to))
    assert len(by_key[1]) == 2 and len(by_key[2]) == 2
    assert by_key[3] == [(None, "2020-01-01", None)]


def test_merge_scd2_rejects_retro_effective_change(spark):
    """An effective timestamp before the current version's valid_from would
    invert the closed interval and overlap history — it must error, not
    silently corrupt."""
    import pytest
    from wicsmmiretl_spark.operators.merge import merge_scd2

    dim = spark.createDataFrame(
        [(1, 10.0, "2020-01-01", None)],
        "k long, bal double, valid_from string, valid_to string",
    )
    upd = spark.createDataFrame([(1, 11.0, "2019-06-01")], "k long, bal double, eff string")
    with pytest.raises(Exception, match="precedes the current version"):
        merge_scd2(dim, upd, ["k"], ["bal"], "eff").collect()


def test_merge_scd2_null_effective_on_changed_key_errors_with_message(spark):
    import pytest
    from wicsmmiretl_spark.operators.merge import merge_scd2

    dim = spark.createDataFrame(
        [(1, 1.0, "2020-01-01", None)], "k long, bal double, valid_from string, valid_to string"
    )
    upd = spark.createDataFrame([(1, 2.0, None)], "k long, bal double, eff string")
    with pytest.raises(Exception, match="NULL effective is rejected"):
        merge_scd2(dim, upd, ["k"], ["bal"], "eff").collect()


# ---------------------------------------------------------------------------
# point_in_time_join
# ---------------------------------------------------------------------------

def _pit_dim(spark):
    return spark.createDataFrame(
        [
            (1, 100.0, "1990-01-01", "1994-01-01"),
            (1, 200.0, "1994-01-01", None),
            (2, 50.0, "1992-01-01", "1995-01-01"),
        ],
        "k: bigint, bal: double, valid_from: string, valid_to: string",
    )


def test_point_in_time_join_picks_containing_version(spark):
    from wicsmmiretl_spark.operators.merge import point_in_time_join

    facts = spark.createDataFrame(
        [
            (10, 1, "1993-06-01"),   # inside v1
            (11, 1, "1994-01-01"),   # boundary: half-open → v2
            (12, 2, "1991-01-01"),   # before any version → NULLs
            (13, 2, "1996-01-01"),   # after the closed version → NULLs
        ],
        "fid: bigint, k: bigint, ts: string",
    )
    out = {
        r.fid: (r.bal, r.valid_from)
        for r in point_in_time_join(facts, _pit_dim(spark), ["k"], "ts").collect()
    }
    assert out[10] == (100.0, "1990-01-01")
    assert out[11] == (200.0, "1994-01-01")
    assert out[12] == (None, None)
    assert out[13] == (None, None)
    assert len(out) == 4  # cardinality preserved


def test_point_in_time_join_inner_and_validation(spark):
    from wicsmmiretl_spark.operators.merge import point_in_time_join

    facts = spark.createDataFrame(
        [(10, 1, "1993-06-01"), (12, 2, "1991-01-01")],
        "fid: bigint, k: bigint, ts: string",
    )
    inner = point_in_time_join(facts, _pit_dim(spark), ["k"], "ts", how="inner")
    assert [r.fid for r in inner.collect()] == [10]
    with pytest.raises(ValueError, match="how"):
        point_in_time_join(facts, _pit_dim(spark), ["k"], "ts", how="full")
    with pytest.raises(ValueError, match="not in facts"):
        point_in_time_join(facts, _pit_dim(spark), ["nope"], "ts")


def test_apply_cdc_latest_wins_and_deletes(spark):
    """Latest change per key applies: update→delete deletes, delete→insert
    survives, absent-key delete is a no-op, plain insert/update land, and
    untouched rows pass through; schema misuse raises."""
    import pytest

    from wicsmmiretl_spark.operators.merge import apply_cdc

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "id long, name string, bal double",
    )
    chg = spark.createDataFrame(
        [
            (2, "b2", 21.0, 1, "U"),   # update
            (3, None, None, 1, "D"),   # delete
            (4, "d2", 41.0, 1, "U"),   # update...
            (4, None, None, 2, "D"),   # ...superseded by delete
            (5, None, None, 1, "D"),   # delete then...
            (5, "e", 50.0, 2, "I"),    # ...re-insert wins
            (6, "f", 60.0, 1, "I"),    # plain insert
            (9, None, None, 1, "D"),   # delete of absent key: no-op
        ],
        "id long, name string, bal double, seq long, op string",
    )
    got = sorted(tuple(r) for r in apply_cdc(base, chg, ["id"], "seq").collect())
    assert got == [
        (1, "a", 10.0),
        (2, "b2", 21.0),
        (5, "e", 50.0),
        (6, "f", 60.0),
    ]

    with pytest.raises(ValueError):
        apply_cdc(base, chg.drop("op"), ["id"], "seq")
    with pytest.raises(ValueError):
        apply_cdc(base, chg, ["nope"], "seq")


class TestGoldenRecord:
    def test_per_field_latest_non_null_wins(self, spark):
        from wicsmmiretl_spark.operators.merge import golden_record

        rows = [
            (1, 1, "alice", 10.0),
            (1, 2, None, 20.0),     # name gap must NOT erase 'alice'
            (1, 3, "alicia", None), # balance gap must NOT erase 20.0
            (2, 1, None, None),     # all-null entity stays null
        ]
        df = spark.createDataFrame(rows, "k long, seq int, name string, bal double")
        got = {r.k: (r.n_versions, r.name, r.bal)
               for r in golden_record(df, ["k"], "seq", ["name", "bal"]).collect()}
        assert got[1] == (3, "alicia", 20.0)
        assert got[2] == (1, None, None)

    def test_fields_resolve_independently_not_per_row(self, spark):
        from wicsmmiretl_spark.operators.merge import golden_record

        # The survivor row need not equal ANY input row: name from seq 2,
        # bal from seq 1.
        rows = [(1, 1, None, 5.0), (1, 2, "bob", None)]
        df = spark.createDataFrame(rows, "k long, seq int, name string, bal double")
        r = golden_record(df, ["k"], "seq", ["name", "bal"]).collect()[0]
        assert (r.name, r.bal) == ("bob", 5.0)

    def test_validates(self, spark):
        import pytest as _pytest

        from wicsmmiretl_spark.operators.merge import golden_record

        df = spark.createDataFrame([(1, 1, "a")], "k long, seq int, name string")
        with _pytest.raises(ValueError, match="non-empty"):
            golden_record(df, [], "seq", ["name"])
        with _pytest.raises(ValueError, match="column"):
            golden_record(df, ["k"], "seq", ["nope"])
