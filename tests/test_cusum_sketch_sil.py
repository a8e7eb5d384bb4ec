"""cusum_changepoint, hll_intersect_estimate, simplified_silhouette vs
brute-force / constructed ground truth — signed series, overlap extremes,
planted cluster geometry."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from wicsmmiretl_spark.operators.aggregates import (
    cusum_changepoint,
    hll_intersect_estimate,
    hll_sketch,
)
from wicsmmiretl_spark.operators.similarity import simplified_silhouette


def _cusum_brute(pts, scale=10**6):
    pts = sorted((t, int(round(x * scale))) for t, x in pts)
    n = len(pts)
    tot = sum(sx for _, sx in pts)
    best = None
    cum = 0
    for i, (t, sx) in enumerate(pts, start=1):
        cum += sx
        if i == n:
            break
        a = abs(n * cum - i * tot)
        if best is None or a > best[0]:
            best = (a, t, cum, i)
    a, t, cum, i = best
    return (
        n,
        t,
        round(a / n / scale, 6),
        round(cum / i / scale, 6),
        round((tot - cum) / (n - i) / scale, 6),
    )


def test_cusum_finds_planted_step(spark):
    rng = random.Random(51)
    pts = [(i, 10.0 + rng.uniform(-0.5, 0.5)) for i in range(40)] + [
        (i, 25.0 + rng.uniform(-0.5, 0.5)) for i in range(40, 80)
    ]
    df = spark.createDataFrame(pts, "t: int, x: double")
    got = cusum_changepoint(df, "t", "x").collect()[0]
    n, t, c, mb, ma = _cusum_brute(pts)
    assert (got["n"], got["t_at"], got["cusum"]) == (n, t, c)
    assert (got["mean_before"], got["mean_after"]) == (mb, ma)
    assert got["t_at"] == 39  # the boundary
    assert abs(got["mean_before"] - 10.0) < 0.2 and abs(got["mean_after"] - 25.0) < 0.2


def test_cusum_signed_values_and_brute(spark):
    rng = random.Random(52)
    pts = [(i, rng.uniform(-30, 30)) for i in range(60)]
    df = spark.createDataFrame(pts, "t: int, x: double")
    got = cusum_changepoint(df, "t", "x").collect()[0]
    assert (
        got["n"], got["t_at"], got["cusum"], got["mean_before"], got["mean_after"]
    ) == _cusum_brute(pts)


def test_hll_intersect_extremes(spark):
    ids = spark.range(0, 3000).select(F.col("id").alias("u"))
    a = hll_sketch(ids, "u", p=9)
    b = hll_sketch(ids, "u", p=9)
    got = hll_intersect_estimate(a, b, p=9).collect()[0]
    # identical sets: union == each, intersection == estimate
    assert got["est_a"] == got["est_b"] == got["est_union"] == got["est_intersection"]
    assert abs(got["est_a"] - 3000) / 3000 < 0.15
    c = hll_sketch(
        spark.range(100000, 103000).select(F.col("id").alias("u")), "u", p=9
    )
    got = hll_intersect_estimate(a, c, p=9).collect()[0]
    # disjoint: intersection estimate near zero relative to set size
    assert got["est_intersection"] < 0.25 * got["est_a"]
    assert abs(got["est_union"] - 6000) / 6000 < 0.15


def test_silhouette_planted_geometry(spark):
    # Two orthogonal directions; points exactly on their centroid -> a=0,
    # nearest-other distance 1 -> s=1 for every point.
    pts = [(i, [1.0, 0.0]) for i in range(10)] + [(10 + i, [0.0, 1.0]) for i in range(10)]
    emb = spark.createDataFrame(pts, "vec_id: bigint, embedding: array<double>")
    cent = spark.createDataFrame(
        [(1, [1.0, 0.0], 1.0), (2, [0.0, 1.0], 1.0)],
        "cell: int, cv: array<double>, nc: double",
    )
    got = {
        r["cell"]: (r["n"], r["mean_sil"])
        for r in simplified_silhouette(emb, cent).collect()
    }
    assert got == {1: (10, 1.0), 2: (10, 1.0)}


def test_silhouette_flags_misassignment_geometry(spark):
    # A point midway between centroids scores ~0; one sitting ON the other
    # centroid would score -1 if forced there — here assignment is by
    # nearest, so the probe checks the midpoint's near-zero score.
    import math

    h = 1.0 / math.sqrt(2.0)
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [h, h])], "vec_id: bigint, embedding: array<double>"
    )
    cent = spark.createDataFrame(
        [(1, [1.0, 0.0], 1.0), (2, [0.0, 1.0], 1.0)],
        "cell: int, cv: array<double>, nc: double",
    )
    got = {r["cell"]: r["mean_sil"] for r in simplified_silhouette(emb, cent).collect()}
    assert got[1] > 0.4  # exact-match point: s = 1 ... midpoint lands in cell 1 too
    with pytest.raises(ValueError, match="simplified_silhouette"):
        simplified_silhouette(emb.drop("embedding"), cent)
    # k=1 is undefined (no "nearest OTHER centroid") — rejected loudly
    # instead of silently returning NULL means.
    with pytest.raises(ValueError, match="undefined for k=1"):
        simplified_silhouette(emb, cent.limit(1))


def test_benford_detects_organic_vs_uniform(spark):
    import math
    import random as _random

    from wicsmmiretl_spark.operators.quality import benford_test

    rng = _random.Random(103)
    # Log-uniform magnitudes over 4 decades follow Benford closely.
    organic = [(10 ** rng.uniform(0, 4),) for _ in range(4000)]
    df = spark.createDataFrame(organic, "v: double")
    rows = benford_test(df, "v").collect()
    assert [r["digit"] for r in rows] == list(range(1, 10))
    assert sum(r["n"] for r in rows) == 4000
    assert max(abs(r["dev"]) for r in rows) < 0.03
    assert rows[0]["p_benford"] == round(math.log10(2.0), 6)
    # Uniform values on [10, 100): every first digit 1..9 equally likely
    # -> digit 1 is hugely under Benford's 0.301.
    uni = [(rng.uniform(10, 100),) for _ in range(4000)]
    df = spark.createDataFrame(uni, "v: double")
    rows = {r["digit"]: r for r in benford_test(df, "v").collect()}
    assert rows[1]["dev"] < -0.1
    # zeros/NULLs excluded; negatives contribute magnitude
    df = spark.createDataFrame([(0.0,), (None,), (-20.0,)], "v: double")
    rows = {r["digit"]: r["n"] for r in benford_test(df, "v").collect()}
    assert rows[2] == 1 and sum(rows.values()) == 1
