"""Property-based invariants (SURVEY §5 / FIXTURES §A2): the reference's
hand-run notebook checks promoted to hypothesis properties.

Each property drives arbitrary generated rows through the real Spark
operators; examples are kept small (a Spark round-trip per example) with
max_examples tuned for CI time.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

captions = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    min_size=0,
    max_size=200,
)


@given(texts=st.lists(captions, min_size=1, max_size=8))
@SET
def test_caption_stats_invariants_hold_for_arbitrary_text(spark, texts):
    from wicsmmiretl_spark.functions.text import caption_stats

    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    for r in caption_stats(df, "text").collect():
        assert r.num_tok >= 0 and r.num_sent >= 0
        if r.num_sent > 0:
            assert r.min_sent_len <= r.max_sent_len
        assert r.num_ne <= max(r.num_tok, 0)
        assert len(r.ne_texts) == r.num_ne


@given(
    vals=st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=20
    ),
    lo=st.integers(min_value=-100, max_value=100),
    span=st.integers(min_value=1, max_value=200),
)
@SET
def test_filter_chain_is_subset_with_strict_bounds(spark, vals, lo, span):
    from wicsmmiretl_spark.operators.filters import RangeFilter, apply_filters

    df = spark.createDataFrame([Row(doc_id=i, x=v) for i, v in enumerate(vals)])
    out = apply_filters(df, [RangeFilter("x", lo, lo + span)]).collect()
    kept = {r.doc_id for r in out}
    assert kept <= {i for i in range(len(vals))}
    for r in out:
        assert lo < r.x < lo + span  # strict, both-exclusive (filter_base.py:14-16)


@given(
    vals=st.lists(
        st.one_of(st.none(), st.floats(min_value=-5, max_value=5, allow_nan=False)),
        min_size=1,
        max_size=20,
    )
)
@SET
def test_clamp_max_bounds_and_preserves_nulls(spark, vals):
    from wicsmmiretl_spark.operators.filters import clamp_max

    df = spark.createDataFrame([Row(doc_id=i, r=v) for i, v in enumerate(vals)], "doc_id long, r double")
    out = {r.doc_id: r.r for r in clamp_max(df, "r", 1.0).collect()}
    for i, v in enumerate(vals):
        if v is None:
            assert out[i] is None
        else:
            assert out[i] <= 1.0
            assert out[i] == (v if v <= 1.0 else 1.0)


@given(texts=st.lists(st.sampled_from(["a b c", "a  b   c", "A B C", "x y z", ""]), min_size=1, max_size=12))
@SET
def test_exact_dedup_idempotent_and_keeps_min_id(spark, texts):
    from wicsmmiretl_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    once = exact_dedup(df, "doc_id", "text")
    twice = exact_dedup(once, "doc_id", "text")
    got_once = sorted(tuple(r) for r in once.collect())
    got_twice = sorted(tuple(r) for r in twice.collect())
    assert got_once == got_twice
    # normalized-equal texts collapse to the smallest id
    from wicsmmiretl_spark.functions.text import fingerprint

    fps = {
        r.doc_id: r.fp
        for r in df.withColumn("fp", fingerprint("text")).collect()
    }
    kept = {r.doc_id for r in once.collect()}
    for fp in set(fps.values()):
        ids = [i for i, f in fps.items() if f == fp]
        assert min(ids) in kept and all(i not in kept for i in ids if i != min(ids))


@given(
    n_left=st.integers(min_value=0, max_value=10),
    n_right=st.integers(min_value=0, max_value=10),
)
@SET
def test_union_checked_additive_for_disjoint_keys(spark, n_left, n_right):
    from wicsmmiretl_spark.operators.sets import union_checked

    left = spark.createDataFrame([Row(k=i, v="l") for i in range(n_left)], "k long, v string")
    right = spark.createDataFrame(
        [Row(k=1000 + i, v="r") for i in range(n_right)], "k long, v string"
    )
    assert union_checked(left, right, key="k").count() == n_left + n_right


@given(frac=st.floats(min_value=0.05, max_value=0.95))
@SET
def test_hash_split_partitions_exactly(spark, frac):
    from wicsmmiretl_spark.operators.sampling import hash_split

    df = spark.range(0, 60).withColumnRenamed("id", "doc_id")
    out = hash_split(df, frac, ["doc_id"]).collect()
    assert len(out) == 60
    assert {r.split for r in out} <= {"test", "train"}


@given(seed=st.integers(min_value=0, max_value=10**6))
@SET
def test_deterministic_sample_is_reproducible_across_partitionings(spark, seed):
    from wicsmmiretl_spark.operators.sampling import deterministic_sample

    df = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    a = [r.doc_id for r in deterministic_sample(df, 17, ["doc_id"], seed).collect()]
    b = [
        r.doc_id
        for r in deterministic_sample(df.repartition(13), 17, ["doc_id"], seed).collect()
    ]
    assert a == b and len(a) == 17


@given(
    left_ts=st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=6),
    right_ts=st.lists(st.integers(min_value=0, max_value=50), min_size=0, max_size=6),
    data=st.data(),
)
@SET
def test_asof_directions_match_python_reference(spark, left_ts, right_ts, data):
    """All three merge_asof directions agree with a brute-force Python
    reference on arbitrary integer-second timestamps in one group.
    Right timestamps are deduplicated (ties between right rows are
    tie-broken arbitrarily by both engines, so they are out of contract)."""
    from wicsmmiretl_spark.operators.joins import asof_join

    direction = data.draw(st.sampled_from(["backward", "forward", "nearest"]))
    right_ts = sorted(set(right_ts))
    left = spark.createDataFrame(
        [Row(id=i, g=1, ts_s=t) for i, t in enumerate(left_ts)]
    ).select("id", "g", F.timestamp_seconds(F.col("ts_s")).alias("ts"))
    right = spark.createDataFrame(
        [Row(g=1, ts_s=t, v=float(t)) for t in right_ts],
        "g long, ts_s long, v double",
    ).select("g", F.timestamp_seconds(F.col("ts_s")).alias("ts"), "v")

    got = {
        r.id: r.v
        for r in asof_join(
            left, right, on="ts", by="g", right_cols=["v"], direction=direction
        ).collect()
    }

    def ref(lt: int):
        back = max((t for t in right_ts if t <= lt), default=None)
        fwd = min((t for t in right_ts if t >= lt), default=None)
        if direction == "backward":
            pick = back
        elif direction == "forward":
            pick = fwd
        elif back is None:
            pick = fwd
        elif fwd is None:
            pick = back
        else:
            pick = back if (lt - back) <= (fwd - lt) else fwd
        return float(pick) if pick is not None else None

    want = {i: ref(t) for i, t in enumerate(left_ts)}
    assert got == want


@given(
    ivs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=1,
        max_size=15,
    )
)
@SET
def test_merge_intervals_invariants(spark, ivs):
    from wicsmmiretl_spark.operators.intervals import merge_intervals

    rows = [("k", s, s + d) for s, d in ivs]
    df = spark.createDataFrame(rows, "k: string, s: bigint, e: bigint")
    spans = sorted(
        (r.span_start, r.span_end, r.n_intervals)
        for r in merge_intervals(df, ["k"], "s", "e").collect()
    )
    # Disjoint with real gaps, counts conserve, every input covered.
    assert sum(n for _, _, n in spans) == len(rows)
    for (s1, e1, _), (s2, e2, _) in zip(spans, spans[1:]):
        assert e1 < s2  # a touch would have merged
    for s, d in ivs:
        assert any(a <= s and s + d <= b for a, b, _ in spans)
    # Idempotence: merging the spans again is a no-op.
    sdf = spark.createDataFrame([("k", a, b) for a, b, _ in spans], "k: string, s: bigint, e: bigint")
    again = sorted(
        (r.span_start, r.span_end) for r in merge_intervals(sdf, ["k"], "s", "e").collect()
    )
    assert again == [(a, b) for a, b, _ in spans]


@given(
    old_rows=st.dictionaries(
        st.integers(min_value=0, max_value=12),
        st.tuples(st.sampled_from(["x", "y", None]), st.integers(min_value=0, max_value=3)),
        max_size=10,
    ),
    new_rows=st.dictionaries(
        st.integers(min_value=0, max_value=12),
        st.tuples(st.sampled_from(["x", "y", None]), st.integers(min_value=0, max_value=3)),
        max_size=10,
    ),
)
@SET
def test_snapshot_diff_matches_python_reference(spark, old_rows, new_rows):
    from wicsmmiretl_spark.operators.merge import snapshot_diff

    schema = "k: bigint, a: string, b: bigint"
    old = spark.createDataFrame([(k, *v) for k, v in old_rows.items()], schema)
    new = spark.createDataFrame([(k, *v) for k, v in new_rows.items()], schema)
    got = {r.k: (r.change_type, tuple(r.changed_cols)) for r in snapshot_diff(old, new, ["k"]).collect()}
    want = {}
    for k in set(old_rows) | set(new_rows):
        if k not in old_rows:
            want[k] = ("insert", ())
        elif k not in new_rows:
            want[k] = ("delete", ())
        elif old_rows[k] != new_rows[k]:
            cols = tuple(
                c for c, i in (("a", 0), ("b", 1)) if old_rows[k][i] != new_rows[k][i]
            )
            want[k] = ("update", cols)
    assert got == want


@given(
    syms=st.lists(st.sampled_from(["a", "b", "ab", "c"]), max_size=12),
    pair=st.tuples(st.sampled_from(["a", "b", "ab"]), st.sampled_from(["a", "b", "c"])),
)
@SET
def test_bpe_fold_matches_reference_on_random_arrays(spark, syms, pair):
    from wicsmmiretl_spark.operators.bpe import merge_pair_expr

    def ref(xs, left, right):
        out, i = [], 0
        while i < len(xs):
            if i + 1 < len(xs) and xs[i] == left and xs[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(xs[i])
                i += 1
        return out

    df = spark.createDataFrame([(syms,)], "syms: array<string>")
    got = df.select(merge_pair_expr(F.col("syms"), *pair).alias("m")).collect()[0].m
    assert got == ref(syms, *pair)


@given(
    rows=st.lists(
        st.tuples(st.booleans(), st.integers(min_value=0, max_value=12)),
        min_size=4,
        max_size=24,
    )
)
@SET
def test_auc_invariant_under_monotone_score_transform(spark, rows):
    """AUC depends only on the score ORDER: any strictly increasing
    transform (here 3x + 7) must leave it bit-identical — the property
    that distinguishes a rank statistic from a value statistic."""
    from wicsmmiretl_spark.operators.aggregates import binary_auc

    df = spark.createDataFrame(
        [(y, float(s)) for y, s in rows], "label boolean, score double"
    )
    base = binary_auc(df, "label", "score").collect()[0]
    shifted = binary_auc(
        df.withColumn("score", F.col("score") * 3.0 + 7.0), "label", "score"
    ).collect()[0]
    assert base["auc"] == shifted["auc"]
    assert (base["n_pos"], base["n_neg"]) == (shifted["n_pos"], shifted["n_neg"])


@given(
    vals=st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=24)
)
@SET
def test_quantile_transform_is_a_valid_percentile(spark, vals):
    """q must be in (0, 1], the MAX value must map to exactly 1, equal
    values must share q, and ordering must be preserved — the defining
    properties of an average-rank percentile, for arbitrary inputs."""
    from wicsmmiretl_spark.operators.aggregates import quantile_transform

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "id long, v double"
    )
    got = {r["id"]: (r["v"], r["q"]) for r in quantile_transform(df, "v").collect()}
    assert all(0 < q <= 1 for _, q in got.values())
    mx = max(v for v, _ in got.values())
    assert all(q == 1.0 for v, q in got.values() if v == mx) or len(
        [1 for v, _ in got.values() if v == mx]
    ) > 1  # ties at the max average below 1
    by_val = {}
    for v, q in got.values():
        by_val.setdefault(v, set()).add(q)
    assert all(len(qs) == 1 for qs in by_val.values()), "equal values, unequal q"
    svals = sorted(by_val)
    assert all(
        min(by_val[a]) < min(by_val[b]) for a, b in zip(svals, svals[1:])
    ), "order not preserved"
