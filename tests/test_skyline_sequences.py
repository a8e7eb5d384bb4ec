"""skyline_2d, frequent_sequences, duplicated_span_stats vs brute-force
Python ground truth — direction flags, ties/coincident points, adjacency
merging, and validation edges the sf0.01 oracle gate can't probe."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from wicsmmiretl_spark.operators.dedup import duplicated_span_stats
from wicsmmiretl_spark.operators.sequences import frequent_sequences
from wicsmmiretl_spark.operators.skyline import skyline_2d


def _skyline_brute(points, max_x, max_y):
    def better(a, b):  # a dominates b
        gx = a[0] >= b[0] if max_x else a[0] <= b[0]
        gy = a[1] >= b[1] if max_y else a[1] <= b[1]
        return gx and gy and a != b

    uniq = sorted(set(points))
    return sorted(
        (x, y, sum(1 for p in points if p == (x, y)))
        for (x, y) in uniq
        if not any(better(q, (x, y)) for q in uniq)
    )


@pytest.mark.parametrize("max_x,max_y", [(False, False), (True, False), (False, True), (True, True)])
def test_skyline_matches_brute_force(spark, max_x, max_y):
    rng = random.Random(42)
    pts = [(rng.randint(0, 20), rng.randint(0, 20)) for _ in range(300)]
    df = spark.createDataFrame(pts, "x: int, y: int")
    got = sorted(
        (r["x"], r["y"], r["n"])
        for r in skyline_2d(df, "x", "y", maximize_x=max_x, maximize_y=max_y).collect()
    )
    assert got == _skyline_brute(pts, max_x, max_y)


def test_skyline_coincident_points_and_nulls(spark):
    # Two copies of the single best point -> one row, n=2; NULLs excluded.
    df = spark.createDataFrame(
        [(1, 1), (1, 1), (2, 0), (0, 2), (None, 0), (0, None)], "x: int, y: int"
    )
    got = sorted((r["x"], r["y"], r["n"]) for r in skyline_2d(df, "x", "y").collect())
    assert got == [(0, 2, 1), (1, 1, 2), (2, 0, 1)]


def test_skyline_single_point_and_missing_column(spark):
    df = spark.createDataFrame([(3, 4)], "x: int, y: int")
    assert [(r["x"], r["y"], r["n"]) for r in skyline_2d(df, "x", "y").collect()] == [(3, 4, 1)]
    with pytest.raises(ValueError, match="skyline_2d"):
        skyline_2d(df, "x", "nope")


def _freq_brute(rows, max_len, min_support):
    seqs = {}
    keys = sorted({k for k, *_ in rows})
    per_key = {
        k: [s for kk, t, tb, s in sorted(rows, key=lambda r: (r[1], r[2])) if kk == k]
        for k in keys
    }
    found = {}
    for k, states in per_key.items():
        mine = set()
        for ln in range(2, max_len + 1):
            for i in range(len(states) - ln + 1):
                mine.add((">".join(states[i : i + ln]), ln))
        for s in mine:
            found[s] = found.get(s, 0) + 1
    total = len(keys)
    out = {
        s: (n, round(n / total, 6))
        for s, n in found.items()
        if round(n / total, 6) >= min_support
    }
    return out


def test_frequent_sequences_matches_brute_force(spark):
    rng = random.Random(7)
    rows = [
        (rng.randint(0, 9), rng.randint(0, 50), i, rng.choice("abc"))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "k: int, t: int, tb: int, s: string")
    got = {
        (r["seq"], r["k"]): (r["n_keys"], r["support"])
        for r in frequent_sequences(df, "k", "t", "s", "tb", max_len=3, min_support=0.2).collect()
    }
    assert got == _freq_brute(rows, 3, 0.2)


def test_frequent_sequences_multiplicity_does_not_inflate_support(spark):
    # One key walking a>b three times still supports "a>b" once.
    rows = [(1, i, i, "ab"[i % 2]) for i in range(6)] + [(2, 0, 0, "a"), (2, 1, 1, "b")]
    df = spark.createDataFrame(rows, "k: int, t: int, tb: int, s: string")
    out = {r["seq"]: r["n_keys"] for r in frequent_sequences(df, "k", "t", "s", "tb", max_len=2, min_support=0.0).collect()}
    assert out["a>b"] == 2
    assert out["b>a"] == 1


def test_frequent_sequences_validation(spark):
    df = spark.createDataFrame([(1, 1, 1, "a")], "k: int, t: int, tb: int, s: string")
    with pytest.raises(ValueError, match="max_len"):
        frequent_sequences(df, "k", "t", "s", "tb", max_len=1)
    with pytest.raises(ValueError, match="min_support"):
        frequent_sequences(df, "k", "t", "s", "tb", min_support=1.5)


def test_duplicated_spans_adjacent_grams_merge(spark):
    # Docs 1 and 2 share tokens w0..w4 (k=3 -> grams at pos 0,1,2 covering
    # [0,5)); doc 3 shares nothing. Adjacent grams must merge to ONE span.
    shared = "w0 w1 w2 w3 w4"
    df = spark.createDataFrame(
        [
            (1, shared + " only1 x y z"),
            (2, "pre2 " + shared),
            (3, "totally different tokens here now ok"),
        ],
        "doc_id: bigint, text: string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_dup_spans"], r["dup_tokens"], r["dup_frac"])
        for r in duplicated_span_stats(df, "doc_id", "text", k=3).collect()
    }
    assert got[1] == (9, 1, 5, round(5 / 9, 6))
    assert got[2] == (6, 1, 5, round(5 / 6, 6))
    assert got[3] == (6, 0, 0, 0.0)


def test_duplicated_spans_disjoint_spans_stay_separate(spark):
    # Shared grams at the start and end with a unique middle -> two spans.
    df = spark.createDataFrame(
        [
            (1, "a b c UNIQ1 UNIQ2 UNIQ3 d e f"),
            (2, "a b c OTHER1 OTHER2 OTHER3 d e f"),
        ],
        "doc_id: bigint, text: string",
    )
    got = {
        r["doc_id"]: (r["n_dup_spans"], r["dup_tokens"])
        for r in duplicated_span_stats(df, "doc_id", "text", k=3).collect()
    }
    assert got[1] == (2, 6)
    assert got[2] == (2, 6)


def test_duplicated_spans_intra_doc_repeats_do_not_count(spark):
    # The same gram twice in ONE doc is not cross-doc duplication.
    df = spark.createDataFrame(
        [(1, "p q r p q r"), (2, "s t u v w x")], "doc_id: bigint, text: string"
    )
    got = {
        r["doc_id"]: r["n_dup_spans"]
        for r in duplicated_span_stats(df, "doc_id", "text", k=3).collect()
    }
    assert got == {1: 0, 2: 0}


def test_duplicated_spans_short_docs_and_validation(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "")], "doc_id: bigint, text: string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_dup_spans"], r["dup_frac"])
        for r in duplicated_span_stats(df, "doc_id", "text", k=3).collect()
    }
    assert got == {1: (2, 0, 0.0), 2: (0, 0, 0.0)}
    with pytest.raises(ValueError, match="k must be"):
        duplicated_span_stats(df, "doc_id", "text", k=1)
