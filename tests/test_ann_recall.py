"""ANN recall gates: parameter edits must not silently collapse retrieval
quality.

The correctness oracles REPLAY the approximation (same buckets/cells on both
engines), so they stay green even if a parameter change destroys recall —
e.g. bumping hyperplane bits from 8 to 32 still hash-matches while returning
almost nothing useful. These tests pin recall@k against the exact
brute-force ranking.

Fixture note: recall is measured on PLANTED clusters (members within ~1° of
their center), not on the driver's synthetic embeddings table — those are
near-uniform random vectors whose true top-5 neighbors sit at ~70°, an
angle sign-projection LSH cannot bucket by construction (P[all 8 bits
agree] ~= 0.6^8 ~= 2%; measured 0.02 on sf0.01). Real embedding corpora
look like the planted fixture: neighbors are high-cosine. Everything is
seeded (numpy rng, md5 hyperplanes, md5 k-means init), so the measured
recalls are exact constants, not flaky samples.

Thresholds at production params (ivf nprobe=2/train_k=8, lsh bits=8):
recall@5 >= 0.9 for both; measured 1.00 (IVF) and 0.94 (LSH bits=8),
0.98 at bits=6.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from wicsmmiretl_spark.operators.similarity import (
    cosine_topk,
    hyperplane_lsh_topk,
    ivf_topk,
)

K = 5
DIM = 16


@pytest.fixture(scope="module")
def planted(spark):
    """300 unit vectors in 30 tight clusters; ids 0..29 are one member per
    cluster so the default query slice (vec_id < 10) spans 10 clusters."""
    rng = np.random.default_rng(7)
    n_clusters, per, sigma = 30, 10, 0.01
    centers = rng.normal(size=(n_clusters, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for c in range(n_clusters):
        for m in range(per):
            v = centers[c] + rng.normal(scale=sigma, size=DIM)
            v /= np.linalg.norm(v)
            vid = c if m == 0 else n_clusters + c * (per - 1) + (m - 1)
            rows.append((vid, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") < 10)
    exact: dict[int, set[int]] = {}
    for r in cosine_topk(emb, q, k=K).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    return emb, q, exact


def _recall(df, exact) -> float:
    approx: dict[int, set[int]] = {}
    for r in df.collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    per_q = [len(approx.get(q, set()) & nb) / len(nb) for q, nb in exact.items()]
    return sum(per_q) / len(per_q)


@pytest.mark.parametrize("nprobe,floor", [(1, 0.9), (2, 0.9)])
def test_ivf_recall_at_production_params(planted, nprobe, floor):
    emb, _q, exact = planted
    out = ivf_topk(
        emb, k=K, label_col=None, nprobe=nprobe, train_k=8, train_iters=3, seed=42
    )
    assert _recall(out, exact) >= floor


@pytest.mark.parametrize("bits,floor", [(6, 0.95), (8, 0.9)])
def test_hyperplane_lsh_recall_at_production_params(planted, bits, floor):
    emb, q, exact = planted
    out = hyperplane_lsh_topk(emb, q, k=K, bits=bits, dim=DIM)
    assert _recall(out, exact) >= floor


def test_pq_adc_recall_with_rerank(planted):
    """PQ ADC with an exact re-rank shortlist recovers near-perfect recall:
    quantization error only costs recall past the shortlist boundary.
    Measured 1.00 at m=4/k=16/rerank=40 on the planted fixture."""
    from wicsmmiretl_spark.operators.similarity import pq_topk

    emb, _q, exact = planted
    out = pq_topk(emb, k=K, dim=DIM, m=4, train_k=16, iters=2, rerank=40)
    assert _recall(out, exact) >= 0.95


def test_pq_pure_adc_recall_floor(planted):
    """Pure ADC (no re-rank) on tight clusters: every member of a cluster
    shares the same codes, so same-cluster candidates TIE at the top and
    the id tiebreak picks an arbitrary subset — recall lands near
    k/cluster_size by construction (measured 0.56), not near 1. The gate
    pins it above collapse (a broken LUT or codebook would land ~0)."""
    from wicsmmiretl_spark.operators.similarity import pq_topk

    emb, _q, exact = planted
    out = pq_topk(emb, k=K, dim=DIM, m=4, train_k=16, iters=2)
    assert _recall(out, exact) >= 0.5


def test_sq8_recall_at_production_params(planted, spark):
    """SQ8's quantization error at 8 bits/coordinate is far below the
    planted-cluster separation, so even the PURE ADC ranking (no rerank)
    must be near-perfect — a cheap grid-param or dequant regression gate.
    Measured 1.00."""
    from wicsmmiretl_spark.operators.similarity import sq8_topk

    emb, _q, exact = planted
    got: dict[int, set[int]] = {}
    for r in sq8_topk(emb, k=K, dim=DIM, query_max_id=10).collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(exact[q] & got.get(q, set())) for q in exact)
    recall = hits / (len(exact) * K)
    assert recall >= 0.9, f"SQ8 ADC recall@{K} = {recall:.2f}"
