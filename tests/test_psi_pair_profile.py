"""psi and embedding_pair_profile vs brute-force Python ground truth —
identical/shifted distributions, under/overflow bins, smoothing of empty
bins, planted-collapse geometry."""

from __future__ import annotations

import hashlib
import math
import random

import pytest

from wicsmmiretl_spark.operators.aggregates import psi
from wicsmmiretl_spark.operators.similarity import embedding_pair_profile


def _psi_brute(rows, ref, cur, lo, hi, bins, scale=10**9):
    width = (hi - lo) / bins
    b_total = bins + 2
    cr = {b: 0 for b in range(-1, bins + 1)}
    cc = dict(cr)
    for g, v in rows:
        if v is None or g not in (ref, cur):
            continue
        b = -1 if v < lo else (bins if v >= hi else int(math.floor((v - lo) / width)))
        if g == ref:
            cr[b] += 1
        else:
            cc[b] += 1
    nr, nc = sum(cr.values()), sum(cc.values())
    s = 0
    for b in range(-1, bins + 1):
        p = (cr[b] + 0.5) / (nr + 0.5 * b_total)
        q = (cc[b] + 0.5) / (nc + 0.5 * b_total)
        s += int(round((p - q) * math.log(p / q) * scale))
    return nr, nc, round(s / scale, 6)


def test_psi_matches_brute_force(spark):
    rng = random.Random(61)
    rows = [("a", rng.gauss(40, 15)) for _ in range(600)] + [
        ("b", rng.gauss(60, 20)) for _ in range(400)
    ] + [("c", 50.0), ("a", None)]
    df = spark.createDataFrame(rows, "g: string, v: double")
    got = psi(df, "v", "g", "a", "b", lo=0.0, hi=100.0, bins=10).collect()[0]
    assert (got["n_ref"], got["n_cur"], got["psi"]) == _psi_brute(
        rows, "a", "b", 0.0, 100.0, 10
    )
    assert got["psi"] > 0.25  # a genuine shift reads as one


def test_psi_identical_distributions_near_zero(spark):
    rows = [(g, float(i % 50)) for g in ("a", "b") for i in range(500)]
    df = spark.createDataFrame(rows, "g: string, v: double")
    got = psi(df, "v", "g", "a", "b", lo=0.0, hi=100.0, bins=10).collect()[0]
    assert got["psi"] == 0.0
    with pytest.raises(ValueError, match="must differ"):
        psi(df, "v", "g", "a", "a", lo=0.0, hi=100.0)
    with pytest.raises(ValueError, match="hi > lo"):
        psi(df, "v", "g", "a", "b", lo=1.0, hi=1.0)


def _profile_brute(vecs, sample, seed, bins):
    ranked = sorted(vecs, key=lambda t: hashlib.md5(f"{seed}:{t[0]}".encode()).hexdigest())
    picked = ranked[:sample]
    width = 2.0 / bins
    counts = {b: 0 for b in range(bins)}
    for i in range(len(picked)):
        for j in range(i + 1, len(picked)):
            ia, va = picked[i]
            ib, vb = picked[j]
            if ia > ib:
                va, vb = vb, va
            dot = sum(x * y for x, y in zip(va, vb))
            na = math.sqrt(sum(x * x for x in va))
            nb = math.sqrt(sum(x * x for x in vb))
            cos = round(dot / (na * nb), 6)
            b = min(int(math.floor((cos + 1.0) / width)), bins - 1)
            counts[b] += 1
    return [(b, round(-1.0 + b * width, 6), counts[b]) for b in range(bins)]


def test_pair_profile_matches_brute_force(spark):
    rng = random.Random(71)
    vecs = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(40)]
    df = spark.createDataFrame(vecs, "vec_id: bigint, embedding: array<double>")
    got = [
        (r["bin"], r["lo"], r["n"])
        for r in embedding_pair_profile(df, sample=16, seed=0, bins=10).collect()
    ]
    assert got == _profile_brute(vecs, 16, 0, 10)
    assert sum(n for _, _, n in got) == 16 * 15 // 2


def test_pair_profile_detects_collapse(spark):
    # All vectors identical: every pair lands in the last bin (cos = 1).
    vecs = [(i, [1.0, 2.0, 3.0]) for i in range(10)]
    df = spark.createDataFrame(vecs, "vec_id: bigint, embedding: array<double>")
    got = {r["bin"]: r["n"] for r in embedding_pair_profile(df, sample=10, bins=5).collect()}
    assert got[4] == 45 and sum(got.values()) == 45
    with pytest.raises(ValueError, match="sample"):
        embedding_pair_profile(df, sample=1)


def test_zipf_fit_recovers_planted_power_law(spark):
    # counts = round(1000 / rank): a pure Zipf corpus -> slope ~ -1, r2 ~ 1.
    from wicsmmiretl_spark.functions.text import zipf_fit

    rows = []
    for rank in range(1, 60):
        tok = f"w{rank:03d}"
        rows.extend([(tok + " ",)] * max(1, round(1000 / rank)))
    docs = spark.createDataFrame([(" ".join(t for (t,) in rows),)], "text: string")
    got = zipf_fit(docs, "text", top_n=100).collect()[0]
    assert got["n_tokens"] == 59
    assert -1.1 < got["slope"] < -0.9
    assert got["r2"] > 0.99


def test_zipf_fit_flat_corpus_and_validation(spark):
    from wicsmmiretl_spark.functions.text import zipf_fit

    # Uniform counts: zero x-variance in y -> slope 0, r2 NULL (vy = 0).
    docs = spark.createDataFrame(
        [("aa bb cc dd ee ff gg hh",)], "text: string"
    )
    got = zipf_fit(docs, "text", top_n=10).collect()[0]
    assert got["slope"] == 0.0 and got["r2"] is None
    import pytest as _pytest

    with _pytest.raises(ValueError, match="top_n"):
        zipf_fit(docs, "text", top_n=2)


def test_stream_psi_equals_batch_psi(spark, tmp_path):
    # The streaming fold over two dropped files must equal the batch PSI.
    import random as _random

    from wicsmmiretl_spark.streaming.windows import stream_psi

    rng = _random.Random(81)
    cur_rows = [(round(rng.gauss(60, 20), 2),) for _ in range(300)]
    ref_rows = [("r", round(rng.gauss(40, 15), 2)) for _ in range(300)]
    d = tmp_path / "drop"
    d.mkdir()
    half = len(cur_rows) // 2
    spark.createDataFrame(cur_rows[:half], "v: double").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(d / "f1"))
    spark.createDataFrame(cur_rows[half:], "v: double").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(d / "f2"))
    ref = spark.createDataFrame(ref_rows, "g: string, v: double")
    stream = (
        spark.readStream.schema("v double").option("maxFilesPerTrigger", 1)
        .parquet(str(d / "*"))
    )
    got = stream_psi(stream, "v", spark, ref, "v", lo=0.0, hi=100.0, bins=10).collect()[0]
    both = ref_rows + [("c", v) for (v,) in cur_rows]
    want = _psi_brute(both, "r", "c", 0.0, 100.0, 10)
    assert (got["n_ref"], got["n_cur"], got["psi"]) == want
