"""chi_square_independence, weighted_quantiles, random_projection,
retrieval_metrics vs brute-force Python ground truth — zero-cell grids,
weight-mass edges, JL distance preservation, and no-relevant-doc edges
the sf0.01 oracle gate can't probe."""

from __future__ import annotations

import hashlib
import math
import random

import pytest

from wicsmmiretl_spark.operators.aggregates import (
    chi_square_independence,
    weighted_quantiles,
)
from wicsmmiretl_spark.operators.ranking import retrieval_metrics
from wicsmmiretl_spark.operators.similarity import random_projection


def _chi2_brute(rows):
    rows = [(a, b) for a, b in rows if a is not None and b is not None]
    n = len(rows)
    avals = sorted({a for a, _ in rows})
    bvals = sorted({b for _, b in rows})
    obs = {}
    for a, b in rows:
        obs[(a, b)] = obs.get((a, b), 0) + 1
    sc = 0
    for a in avals:
        ra = sum(1 for x, _ in rows if x == a)
        for b in bvals:
            cb = sum(1 for _, y in rows if y == b)
            e = float(ra) * cb / n
            o = obs.get((a, b), 0)
            sc += int(round((o - e) * (o - e) / e * 10**9))
    chi2 = round(sc / 10**9, 6)
    r, c = len(avals), len(bvals)
    dof = (r - 1) * (c - 1)
    v = round(math.sqrt(chi2 / (n * min(r - 1, c - 1))), 6) if dof > 0 else None
    return n, r, c, dof, chi2, v


def test_chi2_matches_brute_force_with_zero_cells(spark):
    rng = random.Random(3)
    # Correlated draw -> real association; 'z' never pairs with 'q' -> zero cell.
    rows = []
    for _ in range(400):
        a = rng.choice("xyz")
        b = rng.choice("pq" if a != "z" else "p")
        rows.append((a, b))
    rows.append((None, "p"))
    rows.append(("x", None))
    df = spark.createDataFrame(rows, "a: string, b: string")
    got = chi_square_independence(df, "a", "b").collect()[0]
    assert (got["n"], got["r"], got["c"], got["dof"], got["chi2"], got["cramers_v"]) == _chi2_brute(rows)


def test_chi2_independent_columns_near_zero(spark):
    # Perfectly balanced 2x2 -> chi2 exactly 0.
    rows = [("a", "p"), ("a", "q"), ("b", "p"), ("b", "q")] * 10
    df = spark.createDataFrame(rows, "a: string, b: string")
    got = chi_square_independence(df, "a", "b").collect()[0]
    assert got["chi2"] == 0.0 and got["dof"] == 1 and got["cramers_v"] == 0.0


def test_chi2_single_level_dof_zero(spark):
    df = spark.createDataFrame([("a", "p"), ("a", "q")], "a: string, b: string")
    got = chi_square_independence(df, "a", "b").collect()[0]
    assert got["dof"] == 0 and got["cramers_v"] is None
    with pytest.raises(ValueError, match="chi_square_independence"):
        chi_square_independence(df, "a", "nope")


def _wq_brute(pairs, qs):
    levels = {}
    for v, w in pairs:
        if v is None or w is None or w < 0:
            continue
        levels[v] = levels.get(v, 0) + int(w)
    total = sum(levels.values())
    out = []
    for q in qs:
        cum = 0
        for v in sorted(levels):
            cum += levels[v]
            if cum >= q * total:
                out.append((q, v))
                break
    return out


def test_weighted_quantiles_matches_brute_force(spark):
    rng = random.Random(11)
    pairs = [(rng.randint(0, 100), rng.randint(0, 50)) for _ in range(500)]
    pairs += [(None, 5), (3, None), (7, -2)]
    df = spark.createDataFrame(pairs, "v: int, w: int")
    qs = (0.1, 0.5, 0.9, 1.0)
    got = [(r["q"], r["value"]) for r in weighted_quantiles(df, "v", "w", qs=qs).collect()]
    assert got == _wq_brute(pairs, qs)


def test_weighted_quantiles_mass_concentration(spark):
    # One huge-weight row holds 90% of the mass: q=0.5 must land on it.
    df = spark.createDataFrame([(1, 5), (2, 5), (100, 90)], "v: int, w: int")
    got = dict(
        (r["q"], r["value"])
        for r in weighted_quantiles(df, "v", "w", qs=(0.1, 0.5, 1.0)).collect()
    )
    assert got == {0.1: 2, 0.5: 100, 1.0: 100}  # cum(1)=5 < 10 = 0.1*total
    with pytest.raises(ValueError, match="q must be"):
        weighted_quantiles(df, "v", "w", qs=(0.0,))
    with pytest.raises(ValueError, match="non-empty"):
        weighted_quantiles(df, "v", "w", qs=())


def _proj_brute(vecs, in_dim, out_dim, seed=0, scale=10**6):
    def sign(j, i):
        h = hashlib.md5(f"{seed}_{j}_{i}".encode()).hexdigest()
        return 1 if int(h[0], 16) < 8 else -1

    out = {}
    for vid, v in vecs:
        for j in range(out_dim):
            s = sum(sign(j, i) * int(round(v[i] * scale)) for i in range(in_dim))
            out[(vid, j)] = round(s / scale, 6)
    return out


def test_random_projection_matches_brute_force(spark):
    rng = random.Random(5)
    vecs = [(i, [round(rng.uniform(-1, 1), 4) for _ in range(8)]) for i in range(20)]
    df = spark.createDataFrame(vecs, "vid: bigint, v: array<double>")
    got = {
        (r["vid"], r["j"]): r["comp"]
        for r in random_projection(df, "vid", "v", in_dim=8, out_dim=4).collect()
    }
    assert got == _proj_brute(vecs, 8, 4)


def test_random_projection_preserves_distances(spark):
    # JL sanity at generous dims: squared-distance ratios within 2x.
    rng = random.Random(9)
    vecs = [(i, [rng.gauss(0, 1) for _ in range(64)]) for i in range(12)]
    df = spark.createDataFrame(vecs, "vid: bigint, v: array<double>")
    proj = {}
    for r in random_projection(df, "vid", "v", in_dim=64, out_dim=32).collect():
        proj.setdefault(r["vid"], {})[r["j"]] = r["comp"]
    scale = 1.0 / 32  # E[comp_j^2] = |v|^2 per ±1 row; estimator mean over rows
    for a in range(3):
        for b in range(a + 1, 6):
            d_orig = sum((x - y) ** 2 for x, y in zip(vecs[a][1], vecs[b][1]))
            d_proj = scale * sum(
                (proj[a][j] - proj[b][j]) ** 2 for j in range(32)
            )
            assert 0.35 < d_proj / d_orig < 2.9, (a, b, d_proj, d_orig)


def test_random_projection_wrong_dim_fails_in_plan(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0, 3.0])], "vid: bigint, v: array<double>")
    bad = random_projection(df, "vid", "v", in_dim=5, out_dim=2)
    with pytest.raises(Exception, match="expected 5-dim"):
        bad.collect()
    with pytest.raises(ValueError, match="dims must be"):
        random_projection(df, "vid", "v", in_dim=0, out_dim=2)


def test_retrieval_metrics_brute(spark):
    ranked = spark.createDataFrame(
        [(i, 100.0 - i) for i in range(1, 21)], "doc_id: bigint, score: double"
    )
    relevant = spark.createDataFrame(
        [(3,), (5,), (40,)], "doc_id: bigint"
    )
    got = retrieval_metrics(ranked, relevant, k=10).collect()[0]
    # top-10 = docs 1..10; hits = {3, 5}; first relevant at pos 3.
    assert (got["k"], got["n_rel"], got["hits"]) == (10, 3, 2)
    assert got["precision"] == 0.2
    assert got["recall"] == round(2 / 3, 6)
    assert got["rr"] == round(1 / 3, 6)


def test_retrieval_metrics_no_relevant_and_ties(spark):
    ranked = spark.createDataFrame(
        [(2, 1.0), (1, 1.0), (3, 0.5)], "doc_id: bigint, score: double"
    )
    empty = spark.createDataFrame([], "doc_id: bigint")
    got = retrieval_metrics(ranked, empty, k=2).collect()[0]
    assert got["hits"] == 0 and got["rr"] == 0.0 and got["recall"] is None
    # Tie broken by id asc: top-2 = {1, 2}; relevant = {2} found at pos 2.
    rel = spark.createDataFrame([(2,)], "doc_id: bigint")
    got = retrieval_metrics(ranked, rel, k=2).collect()[0]
    assert got["hits"] == 1 and got["rr"] == 0.5
    with pytest.raises(ValueError, match="k must be"):
        retrieval_metrics(ranked, rel, k=0)
