"""BM25 ranked retrieval and kNN classification unit tests (edge cases the
sf0.01 oracle gate can't probe: ties, absent terms, empty inputs)."""

import pytest
from pyspark.sql import functions as F

from wicsmmiretl_spark.operators.ranking import bm25_rank
from wicsmmiretl_spark.operators.similarity import knn_classify


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_empty_query_raises(spark):
    with pytest.raises(ValueError, match="query_terms"):
        bm25_rank(_docs(spark, [(1, "a b c")]), [])


def test_bm25_orders_by_term_density(spark):
    docs = _docs(
        spark,
        [
            (1, "apple apple apple pear"),  # tf=3, short
            (2, "apple pear plum grape kiwi lime fig date plum pear"),  # tf=1, long
            (3, "pear plum grape"),  # no query term at all
        ],
    )
    out = bm25_rank(docs, ["apple"], k=10).collect()
    assert [r.doc_id for r in out] == [1, 2]  # doc 3 absent, density wins
    assert out[0].bm25 > out[1].bm25 > 0


def test_bm25_absent_term_contributes_nothing(spark):
    docs = _docs(spark, [(1, "x y z"), (2, "x x y")])
    only_x = bm25_rank(docs, ["x"], k=10).collect()
    with_ghost = bm25_rank(docs, ["x", "zzz_not_in_corpus"], k=10).collect()
    assert sorted((r.doc_id, r.bm25) for r in only_x) == sorted(
        (r.doc_id, r.bm25) for r in with_ghost
    )


def test_bm25_k_truncates_with_id_tiebreak(spark):
    # identical docs → identical scores; top-2 must be the 2 smallest ids
    docs = _docs(spark, [(i, "same text here") for i in range(5)])
    out = bm25_rank(docs, ["same"], k=2).collect()
    assert [r.doc_id for r in out] == [0, 1]
    assert out[0].bm25 == out[1].bm25


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_knn_majority_and_tiebreak(spark):
    # query 0 at origin-ish; 2 neighbors label 7, 2 neighbors label 3 with
    # equal cosine structure → 2-2 vote tie breaks to the SMALLER label (3).
    rows = [
        (0, [1.0, 0.0], 9),
        (1, [1.0, 0.1], 3),
        (2, [1.0, -0.1], 3),
        (3, [0.1, 1.0], 7),
        (4, [-0.1, 1.0], 7),
    ]
    emb = _emb(spark, rows)
    out = knn_classify(emb, emb.filter(F.col("vec_id") == 0), k=4).collect()
    assert len(out) == 1
    assert out[0].pred_label == 3 and out[0].votes == 2


def test_knn_excludes_self_label(spark):
    # the query's own label 9 must not leak in: k=2 nearest are both label 5
    rows = [
        (0, [1.0, 0.0], 9),
        (1, [0.9, 0.1], 5),
        (2, [0.9, -0.1], 5),
        (3, [0.0, 1.0], 9),
    ]
    emb = _emb(spark, rows)
    out = knn_classify(emb, emb.filter(F.col("vec_id") == 0), k=2).collect()
    assert out[0].pred_label == 5 and out[0].votes == 2


def test_rrf_fuse_ranks_and_overlap(spark):
    """A doc present in BOTH lists outranks single-list docs with better
    individual ranks (the RRF property); ties break on id; missing docs
    contribute no term; empty input raises."""
    import pytest
    from wicsmmiretl_spark.operators.ranking import rrf_fuse

    a = spark.createDataFrame([(10, 1), (20, 2), (30, 3)], "doc_id long, rank int")
    b = spark.createDataFrame([(20, 1), (40, 2), (10, 3)], "doc_id long, rank int")
    out = [(r.doc_id, r.rrf_score, r.n_lists) for r in rrf_fuse([a, b], topk=10).collect()]
    ids = [d for d, _s, _n in out]
    # 20: 1/62+1/61 and 10: 1/61+1/63 both beat any single-list doc
    assert set(ids[:2]) == {10, 20}
    assert ids[0] == 20  # 1/62+1/61 > 1/61+1/63
    by_id = {d: n for d, _s, n in out}
    assert by_id[10] == 2 and by_id[30] == 1 and by_id[40] == 1
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])


def test_rrf_fuse_rejects_duplicates_and_null_ranks(spark):
    import pytest
    from wicsmmiretl_spark.operators.ranking import rrf_fuse

    ok = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank int")
    dup = spark.createDataFrame([(7, 3), (7, 9)], "doc_id long, rank int")
    with pytest.raises(ValueError, match="duplicate"):
        rrf_fuse([ok, dup])
    nulls = spark.createDataFrame([(1, None)], "doc_id long, rank int")
    with pytest.raises(ValueError, match="NULL ranks"):
        rrf_fuse([nulls])


# ---------------------------------------------------------------------------
# inverted_index
# ---------------------------------------------------------------------------

def test_inverted_index_validates(spark):
    from wicsmmiretl_spark.operators.ranking import inverted_index

    docs = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError, match="min_df"):
        inverted_index(docs, min_df=0)
    with pytest.raises(ValueError, match="max_df"):
        inverted_index(docs, min_df=3, max_df=2)


def test_inverted_index_postings_sorted_and_deduped(spark):
    from wicsmmiretl_spark.operators.ranking import inverted_index

    docs = _docs(spark, [(3, "x x y"), (1, "x z"), (2, "y")])
    out = {r.token: (r.df, r.postings) for r in inverted_index(docs).collect()}
    # doc 3 repeats x: one posting; lists ascend regardless of input order.
    assert out == {"x": (2, [1, 3]), "y": (2, [2, 3]), "z": (1, [1])}


def test_inverted_index_df_band_prunes_before_collect(spark):
    from wicsmmiretl_spark.operators.ranking import inverted_index

    docs = _docs(spark, [(1, "stop rare"), (2, "stop"), (3, "stop")])
    out = {r.token for r in inverted_index(docs, min_df=1, max_df=2).collect()}
    assert out == {"rare"}
    # And the df band survives into the optimized plan as a filter on the
    # count aggregate (i.e. before the posting-list collect, which joins
    # against the banded vocabulary rather than aggregating everything).
    plan = inverted_index(docs, max_df=2)._jdf.queryExecution().optimizedPlan().toString()
    assert "<= 2" in plan and "sort_array" in plan


def test_inverted_index_dedups_before_token_repartition(spark):
    """r8-advice skew guard: the (_id, token)-hashed dedup exchange must
    sit UPSTREAM of the token-keyed repartition, so a stopword's raw
    occurrence stream is spread across partitions by doc id and the
    token-keyed exchange carries only distinct pairs; the shared subtree
    is then materialized once (ReusedExchange in the final AQE plan)."""
    from wicsmmiretl_spark.operators.ranking import inverted_index

    docs = _docs(spark, [(1, "x z"), (2, "y"), (3, "x x y")])
    df = inverted_index(docs)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan
    # Walk one branch bottom-up: the pre-dedup ENSURE_REQUIREMENTS exchange
    # hashes (_id, token); the REPARTITION_BY_COL exchange above it hashes
    # token alone. Printed top-down, token-only appears before (_id, token).
    i_tok = plan.find("REPARTITION_BY_COL")
    i_pair = plan.find("ENSURE_REQUIREMENTS", i_tok)
    assert 0 <= i_tok < i_pair
    assert "hashpartitioning(_id" in plan[i_pair - 120 : i_pair]


# ---------------------------------------------------------------------------
# association_pairs
# ---------------------------------------------------------------------------

def test_association_pairs_known_metrics(spark):
    from wicsmmiretl_spark.operators.ranking import association_pairs

    # 4 baskets: {a,b} x3, {a,c} x1 -> supp(a)=1.0, supp(b)=0.75, supp(c)=0.25
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "b"), (4, "a"), (4, "c")]
    df = spark.createDataFrame(rows, "bk: bigint, it: string")
    out = {(r.item_a, r.item_b): r for r in association_pairs(df, "bk", "it", min_support=0.01).collect()}
    ab = out[("a", "b")]
    assert (ab.pair_count, ab.support, ab.confidence) == (3, 0.75, 0.75)
    assert ab.lift == 1.0  # b always with a, a everywhere -> independent of a
    ac = out[("a", "c")]
    assert (ac.pair_count, ac.support, ac.lift) == (1, 0.25, 1.0)


def test_association_pairs_duplicates_in_basket_count_once(spark):
    from wicsmmiretl_spark.operators.ranking import association_pairs

    rows = [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "bk: bigint, it: string")
    out = association_pairs(df, "bk", "it", min_support=0.01).collect()
    assert len(out) == 1 and out[0].pair_count == 2


def test_association_pairs_support_floor(spark):
    from wicsmmiretl_spark.operators.ranking import association_pairs

    rows = [(i, "x") for i in range(10)] + [(i, "y") for i in range(10)] + [(0, "rare"), (0, "z"), (1, "z")]
    df = spark.createDataFrame(rows, "bk: bigint, it: string")
    got = {(r.item_a, r.item_b) for r in association_pairs(df, "bk", "it", min_support=0.5).collect()}
    assert got == {("x", "y")}  # 10/10 baskets; rare pairs floored out


def test_association_pairs_validates(spark):
    from wicsmmiretl_spark.operators.ranking import association_pairs

    df = spark.createDataFrame([(1, "a")], "bk: bigint, it: string")
    with pytest.raises(ValueError, match="min_support"):
        association_pairs(df, "bk", "it", min_support=0)
    with pytest.raises(ValueError, match="no baskets"):
        association_pairs(df.filter(F.col("bk").isNull()), "bk", "it")


# ---------------------------------------------------------------------------
# tfidf_cosine_pairs
# ---------------------------------------------------------------------------

def test_tfidf_cosine_pairs_identical_docs_score_one(spark):
    from wicsmmiretl_spark.operators.ranking import tfidf_cosine_pairs

    docs = _docs(
        spark,
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta epsilon zeta")],
    )
    out = {(r.id_a, r.id_b): r.sim for r in tfidf_cosine_pairs(docs, min_sim=0.0).collect()}
    assert out[(1, 2)] == 1.0
    assert (1, 3) not in out and (2, 3) not in out  # no shared tokens → no pair


def test_tfidf_cosine_pairs_max_df_bands_vocabulary(spark):
    from wicsmmiretl_spark.operators.ranking import tfidf_cosine_pairs

    # "common" is in every doc; with max_df=2 it is banded out, so docs
    # 1 and 2 share nothing that remains → no pair at all.
    docs = _docs(spark, [(1, "common x"), (2, "common y"), (3, "common z")])
    out = tfidf_cosine_pairs(docs, max_df=2, min_sim=0.0).collect()
    assert out == []


def test_tfidf_cosine_pairs_validates(spark):
    from wicsmmiretl_spark.operators.ranking import tfidf_cosine_pairs

    docs = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError, match="max_df"):
        tfidf_cosine_pairs(docs, max_df=1)
    with pytest.raises(ValueError, match="min_sim"):
        tfidf_cosine_pairs(docs, min_sim=1.5)


# ---------------------------------------------------------------------------
# ndcg_at_k
# ---------------------------------------------------------------------------

def test_ndcg_hand_computed(spark):
    import math

    from wicsmmiretl_spark.operators.ranking import ndcg_at_k

    ranked = spark.createDataFrame(
        [(1, 9.0), (2, 7.0), (3, 5.0)], "doc_id long, score double"
    )
    rel = spark.createDataFrame(
        [(1, 1), (2, 3), (3, 0), (4, 2)], "doc_id long, rel int"
    )
    r = ndcg_at_k(ranked, rel, k=3).collect()[0]
    dcg = (2**1 - 1) / math.log2(2) + (2**3 - 1) / math.log2(3) + 0.0
    idcg = (2**3 - 1) / math.log2(2) + (2**2 - 1) / math.log2(3) + (2**1 - 1) / math.log2(4)
    assert r["dcg"] == pytest.approx(dcg, abs=1e-6)
    assert r["idcg"] == pytest.approx(idcg, abs=1e-6)
    assert r["ndcg"] == pytest.approx(round(dcg / idcg, 6), abs=1e-6)


def test_ndcg_perfect_ranking_is_one(spark):
    from wicsmmiretl_spark.operators.ranking import ndcg_at_k

    ranked = spark.createDataFrame(
        [(1, 3.0), (2, 2.0), (3, 1.0)], "doc_id long, score double"
    )
    rel = spark.createDataFrame([(1, 3), (2, 2), (3, 1)], "doc_id long, rel int")
    r = ndcg_at_k(ranked, rel, k=3).collect()[0]
    assert r["ndcg"] == 1.0
    # All-zero relevance: IDCG = 0 -> NULL ndcg, not a division error.
    zero = spark.createDataFrame([(1, 0), (2, 0), (3, 0)], "doc_id long, rel int")
    assert ndcg_at_k(ranked, zero, k=3).collect()[0]["ndcg"] is None
    with pytest.raises(ValueError, match="k must be"):
        ndcg_at_k(ranked, rel, k=0)
