"""containment_pairs, time_weighted_avg, kcenter_select vs brute-force
Python ground truth — asymmetric nesting, irregular sampling, greedy
trajectory and tie/degenerate edges the sf0.01 oracle gate can't probe."""

from __future__ import annotations

import datetime
import random

import pytest

from wicsmmiretl_spark.operators.dedup import containment_pairs
from wicsmmiretl_spark.operators.sequences import time_weighted_avg
from wicsmmiretl_spark.operators.similarity import kcenter_select


def test_containment_detects_nested_doc(spark):
    # Doc 2 is doc 1 plus a long unique suffix: containment of 1 in 2 is
    # 1.0 while Jaccard is far below any dedup threshold.
    core = " ".join(f"w{i}" for i in range(12))
    suffix = " ".join(f"u{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, core), (2, core + " " + suffix), (3, "entirely other tokens here x y")],
        "doc_id: bigint, text: string",
    )
    got = {
        (r["id_a"], r["id_b"]): (r["size_a"], r["size_b"], r["inter"], r["cont_a"], r["cont_b"])
        for r in containment_pairs(df, "doc_id", "text", k=3, threshold=0.6).collect()
    }
    assert list(got) == [(1, 2)]
    size_a, size_b, inter, cont_a, cont_b = got[(1, 2)]
    assert size_a == 10 and inter == 10 and cont_a == 1.0
    assert cont_b == round(10 / size_b, 6) and cont_b < 0.6


def test_containment_df_band_drops_boilerplate(spark):
    # A shingle present in ALL 60 docs exceeds max_df and produces no pairs.
    df = spark.createDataFrame(
        [(i, f"same boiler plate here uniq{i} tail{i}") for i in range(60)],
        "doc_id: bigint, text: string",
    )
    out = containment_pairs(df, "doc_id", "text", k=3, threshold=0.1, max_df=50)
    assert out.count() == 0
    with pytest.raises(ValueError, match="threshold"):
        containment_pairs(df, "doc_id", "text", threshold=0.0)
    with pytest.raises(ValueError, match="min_df"):
        containment_pairs(df, "doc_id", "text", min_df=1)


def _ts(s):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s)


def test_twa_weighs_by_duration(spark):
    # value 10 holds for 90s, value 100 for 10s, final reading closes.
    rows = [
        (1, _ts(0), 10.0, 1),
        (1, _ts(90), 100.0, 2),
        (1, _ts(100), 7.0, 3),
        (2, _ts(0), 5.0, 4),  # single event: no interval -> excluded
    ]
    df = spark.createDataFrame(rows, "u: bigint, ts: timestamp, v: double, eid: bigint")
    got = {r["u"]: (r["n_events"], r["twa"]) for r in time_weighted_avg(df, "u", "ts", "v", "eid").collect()}
    assert got == {1: (3, round((10.0 * 90 + 100.0 * 10) / 100, 6))}


def test_twa_matches_brute_force(spark):
    rng = random.Random(13)
    rows = []
    for u in range(5):
        t = 0
        for i in range(rng.randint(2, 30)):
            t += rng.randint(1, 500)
            rows.append((u, _ts(t), round(rng.uniform(-50, 50), 3), len(rows)))
    df = spark.createDataFrame(rows, "u: bigint, ts: timestamp, v: double, eid: bigint")
    got = {r["u"]: r["twa"] for r in time_weighted_avg(df, "u", "ts", "v", "eid").collect()}
    per_u = {}
    for u, ts, v, _ in rows:
        per_u.setdefault(u, []).append((ts, v))
    for u, obs in per_u.items():
        obs.sort()
        num = sum(
            int(round(v * 10**6)) * int((obs[i + 1][0] - t).total_seconds() * 10**6)
            for i, (t, v) in enumerate(obs[:-1])
        )
        den = int((obs[-1][0] - obs[0][0]).total_seconds() * 10**6)
        assert got[u] == round(num / den / 10**6, 6), u


def _kcenter_brute(vecs, k, scale=10**6):
    sv = {vid: [int(round(x * scale)) for x in v] for vid, v in vecs}
    chosen = [min(sv)]
    while len(chosen) < k:
        best = None
        for vid in sorted(sv):
            if vid in chosen:
                continue
            d = min(
                sum((a - b) ** 2 for a, b in zip(sv[vid], sv[c])) for c in chosen
            )
            if best is None or d > best[0]:
                best = (d, vid)
        if best is None:
            break
        chosen.append(best[1])
    return chosen


def test_kcenter_matches_brute_force(spark):
    rng = random.Random(21)
    vecs = [(i, [round(rng.uniform(-1, 1), 4) for _ in range(6)]) for i in range(40)]
    df = spark.createDataFrame(vecs, "vec_id: bigint, v: array<double>")
    got = [
        (r["step"], r["vec_id"])
        for r in kcenter_select(df, "vec_id", "v", k=6).orderBy("step").collect()
    ]
    assert [v for _, v in got] == _kcenter_brute(vecs, 6)
    assert [s for s, _ in got] == [1, 2, 3, 4, 5, 6]


def test_kcenter_covers_planted_clusters(spark):
    # 4 tight clusters; k=4 must pick one point from each.
    rng = random.Random(2)
    centers = [[10.0, 0.0], [-10.0, 0.0], [0.0, 10.0], [0.0, -10.0]]
    vecs = []
    for i in range(40):
        c = centers[i % 4]
        vecs.append((i, [c[0] + rng.uniform(-0.1, 0.1), c[1] + rng.uniform(-0.1, 0.1)]))
    df = spark.createDataFrame(vecs, "vec_id: bigint, v: array<double>")
    picked = [r["vec_id"] for r in kcenter_select(df, "vec_id", "v", k=4).collect()]
    assert sorted(p % 4 for p in picked) == [0, 1, 2, 3]


def test_kcenter_fewer_points_than_k(spark):
    df = spark.createDataFrame(
        [(1, [0.0]), (2, [1.0])], "vec_id: bigint, v: array<double>"
    )
    got = kcenter_select(df, "vec_id", "v", k=5).collect()
    assert [(r["step"], r["vec_id"]) for r in got] == [(1, 1), (2, 2)]
    empty = spark.createDataFrame([], "vec_id: bigint, v: array<double>")
    assert kcenter_select(empty, "vec_id", "v", k=3).count() == 0
    with pytest.raises(ValueError, match="k must be"):
        kcenter_select(df, "vec_id", "v", k=0)
