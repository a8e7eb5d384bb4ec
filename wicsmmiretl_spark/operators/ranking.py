"""Ranked retrieval over a document corpus: TF-IDF / BM25 scoring.

A training-data pipeline uses this shape for relevance-weighted corpus
selection (score documents against a topic query, keep the top slice) and
for data-quality triage (rank documents by affinity to a seed set).

Scale design (100 TB):

* The per-term filter happens on the GENERATED token attribute immediately
  after the explode — non-query tokens die map-side, before any shuffle, so
  the (doc, term) partial aggregate only ever carries terms from the query
  (|Q| distinct values).
* Document length ``dl`` rides the explode as a grouping key (it is
  functionally dependent on doc_id), so no second pass / join against a
  doc-length table is needed.
* Document frequency and the corpus-stats row are O(|Q|) and O(1); both are
  broadcast. The only shuffles are two partial-aggregated groupBys keyed by
  (doc_id, term) and doc_id.
* The BM25 sum over query terms uses the suite's exact-sum contract
  (scale→round→int64) so per-doc scores are summation-order independent.

Reference parity: the reference has no ranked retrieval; this is a
north-star extension (SURVEY §2 training-data families).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wicsmmiretl_spark.functions.text import tokens


def bm25_rank(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents by BM25 score against ``query_terms``.

    Output: (``id_col``, ``bm25``) with bm25 rounded at 1e-7 and ties broken
    by ascending id. Uses the Robertson idf ``ln(1 + (N - df + 0.5)/(df +
    0.5))`` (non-negative for every df).
    """
    if not query_terms:
        raise ValueError("bm25_rank: query_terms must be non-empty")

    toks_df = docs.select(F.col(id_col), tokens(text_col).alias("toks"))
    lens = toks_df.select(id_col, F.size("toks").cast("long").alias("dl"))
    stats = lens.agg(F.count("*").alias("n"), F.sum("dl").alias("sum_dl"))

    # explode_outer + filter on the generated attribute: the filter cannot be
    # predicate-pushed below the Generate, so the token array is built once
    # per row (see the 45x explode gotcha, functions/repetition.py).
    tf = (
        toks_df.select(
            id_col,
            F.size("toks").cast("long").alias("dl"),
            F.explode_outer("toks").alias("token"),
        )
        .filter(F.col("token").isin(list(query_terms)))
        .groupBy(id_col, "dl", "token")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))

    scored = tf.join(F.broadcast(dfreq), "token").crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n")
    idf = F.log(1 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    term_score = F.round(
        idf
        * F.col("tf")
        * (k1 + 1)
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / avgdl)),
        7,
    )

    ranked = (
        scored.withColumn("s", term_score)
        .groupBy(id_col)
        .agg((F.sum(F.round(F.col("s") * 1e7).cast("long")) / F.lit(1e7)).alias("bm25"))
    )
    # orderBy+limit → TakeOrderedAndProject: per-partition top-k heaps, no
    # global sort, no single-partition window.
    return ranked.orderBy(F.desc("bm25"), F.asc(id_col)).limit(k).select(id_col, "bm25")


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    k0: int = 60,
    topk: int = 20,
    scale: int = 10**12,
) -> DataFrame:
    """Reciprocal rank fusion (Cormack/Clarke/Büttcher, SIGIR 2009 — public
    literature): fuse N ranked lists by score(d) = Σ_lists 1/(k0 + rank_d).
    The modern hybrid-retrieval combiner — lexical BM25 and embedding ANN
    ranks fuse without score calibration, since only RANKS enter.

    Each input must carry (id_col, rank) with 1-based integer ranks; a doc
    missing from a list simply contributes no term (standard RRF). Each
    reciprocal is rounded to ``scale`` precision and summed as integers, so
    the fused score is independent of list order and engine.

    Scale: the inputs are top-k lists (tiny); the fuse is one union + one
    groupBy + TakeOrdered. Output: (id_col, rrf_score double, n_lists).
    """
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    # Inputs are top-k lists (tiny) but their UPSTREAM pipelines (BM25,
    # ANN) are not: validate and fuse off ONE materialization. The union
    # is pinned with a lazy localCheckpoint; a single aggregate job
    # computes every per-list integrity scalar (NULL ranks, duplicate
    # ids — a duplicate would silently double-count terms, a NULL rank
    # contributes nothing while still bumping n_lists) and materializes
    # the pin as a side effect, so each upstream executes exactly once
    # instead of once per probe plus once for the fuse (r14: the fused
    # query paid 2N+1 upstream replays, ~38 jobs at bench; 3.6 → 2.5 s).
    probe = None
    for i, r in enumerate(rankings):
        t = r.select(F.lit(i).alias("_list"), F.col(id_col), F.col("rank"))
        probe = t if probe is None else probe.unionByName(t)
    probe = probe.localCheckpoint(eager=False)
    stats = (
        probe.groupBy("_list")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col("rank").isNull().cast("long")).alias("_null_ranks"),
            F.sum(F.col(id_col).isNull().cast("long")).alias("_null_ids"),
            F.countDistinct(id_col).alias("_nd"),
        )
        .collect()
    )
    by_list = {row["_list"]: row for row in stats}
    for i in range(len(rankings)):
        row = by_list.get(i)
        if row is None:
            continue  # empty list: no NULLs, no duplicates
        if row["_null_ranks"]:
            raise ValueError(f"rrf_fuse: ranking {i} contains NULL ranks")
        # countDistinct ignores NULL ids; the original groupBy treated all
        # NULL ids as one group, so >1 NULL id is also a duplicate.
        if (row["_n"] - row["_null_ids"]) > row["_nd"] or row["_null_ids"] > 1:
            raise ValueError(f"rrf_fuse: ranking {i} has duplicate {id_col} rows")
    terms = probe.select(
        F.col(id_col),
        F.round(F.lit(float(scale)) / (F.lit(k0) + F.col("rank")))
        .cast("long")
        .alias("_rrf_i"),
    )
    return (
        terms.groupBy(id_col)
        .agg(
            F.round(F.sum("_rrf_i").cast("double") / F.lit(float(scale)), 9).alias(
                "rrf_score"
            ),
            F.count("*").alias("n_lists"),
        )
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
        .limit(topk)
    )


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_df: int | None = None,
) -> DataFrame:
    """Build the posting lists a lexical retrieval index serves from:
    token → document frequency + sorted doc-id posting list.

    Two-phase plan, and the order matters at scale: phase 1 computes df
    per token and applies the ``[min_df, max_df]`` band FIRST; phase 2
    collects posting arrays only for surviving tokens (inner join on the
    banded vocabulary). Stopword postings — the arrays that would be
    |corpus|-sized at 100 TB — are never materialized, which is precisely
    why every real index drops or caps them (``max_df`` is that knob;
    terms above it carry no retrieval signal anyway).

    One scan, two shuffles, skew-safe ordering (r8 advice): the
    per-document dedup runs FIRST on its natural (_id, token)-hashed
    exchange — a stopword's raw occurrence stream is spread across
    partitions by doc id, so no single task ever holds a token's
    corpus-wide occurrence volume — and only the deduped (doc, token)
    pairs are then hash-repartitioned by ``token``. Everything downstream
    — the df count, the vocabulary-band join (both sides descend from
    the same exchange), and the posting collect_list — runs
    exchange-free on that token partitioning; both consuming branches
    sit on a byte-identical exchange subtree, so ReuseExchange
    materializes it once (1 scan, 2 shuffles, ReusedExchange — verified
    by tests/test_ranking.py::test_inverted_index_dedups_before_token_
    repartition). The token-keyed exchange carries only
    DISTINCT pairs, so the hottest task's volume is a token's df (its
    posting-list length), not its raw occurrence count — the correct
    bound for a document-level index, and the ``max_df`` band is the
    knob that caps even that. Multiple occurrences of a token in one
    document produce ONE posting.

    Output: token string, df bigint, postings array<bigint> (ascending).
    """
    if min_df < 1:
        raise ValueError(f"inverted_index: min_df must be >= 1, got {min_df}")
    if max_df is not None and max_df < min_df:
        raise ValueError(f"inverted_index: max_df {max_df} < min_df {min_df}")
    pairs = (
        docs.select(F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("token"))
        .dropDuplicates(["_id", "token"])  # (_id, token)-hashed: spreads stopword volume
        .repartition("token")  # distinct pairs only; no explicit N — AQE may coalesce
    )
    dfs = pairs.groupBy("token").agg(F.count("*").alias("df"))
    band = dfs.filter(F.col("df") >= min_df)
    if max_df is not None:
        band = band.filter(F.col("df") <= max_df)
    return (
        pairs.join(band, "token")
        .groupBy("token", "df")
        .agg(F.sort_array(F.collect_list("_id")).alias("postings"))
        .orderBy("token")
    )


def association_pairs(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: float = 0.01,
    k: int = 20,
) -> DataFrame:
    """Market-basket pair mining: support / confidence / lift for item
    pairs that co-occur in at least ``min_support`` of baskets — the
    co-occurrence statistics behind "related items" and behind corpus
    co-topic analysis (documents as baskets, tags/entities as items).

    Plan shape: dedupe to (basket, item), count item supports (one
    item-keyed agg, vocabulary-sized, broadcast), self-join within basket
    with ``item_a < item_b`` so each pair counts once, count pair
    supports, THEN apply the support floor before attaching metrics.
    Per-basket pair volume is C(|basket|, 2) — bounded by basket size,
    not corpus size; a pathological mega-basket should be capped upstream
    (``cap_per_group``). Metrics are exact ratios of integer counts,
    rounded 6dp:

    * support    = pairs / n_baskets
    * confidence = P(b | a) = pair_count / count(a)   (a = item_a)
    * lift       = support / (supp_a · supp_b)

    Output: item_a, item_b, pair_count bigint, support, confidence, lift
    (doubles, 6dp); top ``k`` by (lift desc, item_a, item_b).
    """
    if not 0 < min_support <= 1:
        raise ValueError(f"association_pairs: min_support must be in (0, 1], got {min_support}")
    if k < 1:
        raise ValueError(f"association_pairs: k must be >= 1, got {k}")
    for c in (basket_col, item_col):
        if c not in baskets.columns:
            raise ValueError(f"association_pairs: column {c!r} not in {baskets.columns}")
    b = (
        baskets.filter(F.col(basket_col).isNotNull() & F.col(item_col).isNotNull())
        .select(F.col(basket_col).alias("_b"), F.col(item_col).alias("_i"))
        .distinct()
    )
    n_baskets = b.select("_b").distinct().count()
    if n_baskets == 0:
        raise ValueError("association_pairs: no baskets after NULL filtering")
    item_counts = b.groupBy(F.col("_i")).agg(F.count("*").alias("_ic"))
    left = b.select(F.col("_b"), F.col("_i").alias("item_a"))
    right = b.select(F.col("_b"), F.col("_i").alias("item_b"))
    pairs = (
        left.join(right, "_b")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("pair_count"))
        .filter(F.col("pair_count") >= F.lit(float(min_support)) * n_baskets)
    )
    ca = F.broadcast(item_counts.withColumnsRenamed({"_i": "item_a", "_ic": "_ca"}))
    cb = F.broadcast(item_counts.withColumnsRenamed({"_i": "item_b", "_ic": "_cb"}))
    nb = F.lit(float(n_baskets))
    support = F.col("pair_count").cast("double") / nb
    confidence = F.col("pair_count").cast("double") / F.col("_ca").cast("double")
    lift = support / (
        (F.col("_ca").cast("double") / nb) * (F.col("_cb").cast("double") / nb)
    )
    return (
        pairs.join(ca, "item_a")
        .join(cb, "item_b")
        .select(
            "item_a",
            "item_b",
            "pair_count",
            F.round(support, 6).alias("support"),
            F.round(confidence, 6).alias("confidence"),
            F.round(lift, 6).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("item_a"), F.asc("item_b"))
        .limit(k)
    )


def tfidf_cosine_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int = 100,
    min_sim: float = 0.2,
    top_k: int = 50,
    scale: int = 1000,
) -> DataFrame:
    """All-pairs document cosine similarity in TF-IDF space, computed
    through the inverted index instead of dense vectors: two documents
    contribute to each other's dot product ONLY at tokens they share, so
    the pair stream is generated by a token-keyed self-join of the
    posting weights — the sparse-similarity formulation every lexical
    near-duplicate / plagiarism pass uses.

    Scale levers, in order of importance:

    * ``max_df`` bands the vocabulary FIRST (same ordering as
      ``inverted_index``): a token in d documents fans out C(d,2) pairs,
      so stopword-class tokens — df ≈ |corpus| — would alone produce the
      quadratic blow-up. Banding bounds per-token fanout at C(max_df,2)
      and drops dimensions that carry no discrimination signal anyway
      (idf ≈ 0). The band applies to the NORM too, so similarity is
      exact cosine in the banded space, not an approximation of it.
    * The pair aggregation groups on (id_a, id_b) with map-side combine;
      ``min_sim`` then cuts the long tail before the final top-k
      (TakeOrderedAndProject — top_k rows cross the driver, nothing else).

    Determinism contract (DuckDB-replayable): idf = round(ln((N+1)/(df+1))
    + 1, 6); integer weights w = round(tf · idf · scale); dot and squared
    norms are exact bigint sums of bigint products (addition order
    cannot matter), and the single sqrt/divide happens once per pair,
    rounded 6dp. ``scale``=1000 keeps w² · |tokens| far from bigint
    overflow at any document length.

    Output: id_a, id_b (id_a < id_b), sim double (6dp), ordered
    (sim desc, id_a, id_b), limited to ``top_k``.
    """
    if max_df < 2:
        raise ValueError(f"tfidf_cosine_pairs: max_df must be >= 2, got {max_df}")
    if not 0 <= min_sim <= 1:
        raise ValueError(f"tfidf_cosine_pairs: min_sim must be in [0, 1], got {min_sim}")
    tf = (
        docs.select(F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("token"))
        .groupBy("_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    n_docs = docs.select(F.count("*").alias("_n"))
    dfs = tf.groupBy("token").agg(F.count("*").alias("df")).filter(F.col("df") <= max_df)
    w = (
        tf.join(dfs, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "_id",
            "token",
            F.round(
                F.col("tf")
                * F.round(
                    F.log((F.col("_n") + 1).cast("double") / (F.col("df") + 1)) + 1.0, 6
                )
                * scale
            )
            .cast("long")
            .alias("wi"),
        )
    )
    norms = w.groupBy("_id").agg(F.sum(F.col("wi") * F.col("wi")).alias("n2"))
    wa = w.select(F.col("_id").alias("id_a"), "token", F.col("wi").alias("wa"))
    wb = w.select(F.col("_id").alias("id_b"), "token", F.col("wi").alias("wb"))
    dots = (
        wa.join(wb, "token")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col("_id").alias("id_a"), F.col("n2").alias("na"))
    nb = norms.select(F.col("_id").alias("id_b"), F.col("n2").alias("nb"))
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("dot")
                / (F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))),
                6,
            ).alias("sim"),
        )
        .filter(F.col("sim") >= min_sim)
        .orderBy(F.desc("sim"), F.asc("id_a"), F.asc("id_b"))
        .limit(top_k)
    )


def ndcg_at_k(
    ranked: DataFrame,
    relevance: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    score_col: str = "score",
    rel_col: str = "rel",
    scale: int = 10**9,
) -> DataFrame:
    """Normalized discounted cumulative gain at k (Järvelin & Kekäläinen
    2002, TOIS — public literature): grade a retrieval ranking against
    graded relevance labels — the third leg of the eval-metrics family
    (AUC ranks a score, calibration checks its meaning, NDCG scores a
    produced RANKING). DCG = Σ_{i≤k} (2^rel_i - 1) / log2(i + 1) over the
    ranking's order; NDCG divides by the ideal DCG (labels sorted
    descending), so 1.0 = perfect ordering.

    Scale shape: the ranking side is top-k BY CONSTRUCTION (k rows — this
    operator grades a ranked list, it does not produce one), so position
    assignment is a window over k rows. The ideal side is a global top-k
    of the label table — TakeOrderedAndProject, k rows cross the wire,
    never a full sort. The label attach broadcasts the K RANKED IDS into
    a semi-filter over the label table (one map-side scan), then joins
    the surviving ≤k label rows back broadcast — the full label table is
    never broadcast and never shuffled.

    Determinism: per-position gains are rounded to ``scale`` bigints and
    summed exactly; rel values must be small integers (2^rel exact in
    double), log2 of integer positions is identical across engines, and
    the single DCG/IDCG division rounds 6dp. Ties in ``score_col`` must
    be broken by ``id_col`` upstream AND are re-broken here with the same
    (score desc, id asc) order. Unlabeled ranked ids count rel = 0.

    Output (one row): k int, dcg double, idcg double, ndcg double.
    """
    if k < 1:
        raise ValueError(f"ndcg_at_k: k must be >= 1, got {k}")
    for c, df_, nm in ((id_col, ranked, "ranked"), (score_col, ranked, "ranked"),
                       (id_col, relevance, "relevance"), (rel_col, relevance, "relevance")):
        if c not in df_.columns:
            raise ValueError(f"ndcg_at_k: column {c!r} not in {nm} {df_.columns}")
    top = ranked.orderBy(F.desc(score_col), F.asc(id_col)).limit(k).localCheckpoint(eager=False)
    rel_k = relevance.select(id_col, rel_col).join(
        F.broadcast(top.select(id_col)), id_col, "left_semi"
    )
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    gains = (
        top.join(F.broadcast(rel_k), id_col, "left")
        .select(
            F.row_number().over(w).alias("_pos"),
            F.coalesce(F.col(rel_col), F.lit(0)).alias("_rel"),
        )
        .select(
            F.round(
                (F.pow(F.lit(2.0), F.col("_rel")) - 1.0)
                / F.log2(F.col("_pos") + 1.0)
                * scale
            )
            .cast("long")
            .alias("_g")
        )
    )
    ideal = (
        relevance.select(F.col(rel_col).alias("_rel"), F.col(id_col).alias("_id"))
        .orderBy(F.desc("_rel"), F.asc("_id"))
        .limit(k)
        .select(
            F.row_number()
            .over(Window.orderBy(F.desc("_rel"), F.asc("_id")))
            .alias("_pos"),
            "_rel",
        )
        .select(
            F.round(
                (F.pow(F.lit(2.0), F.col("_rel")) - 1.0)
                / F.log2(F.col("_pos") + 1.0)
                * scale
            )
            .cast("long")
            .alias("_g")
        )
    )
    dcg = gains.agg(F.coalesce(F.sum("_g"), F.lit(0)).alias("_dcg"))
    idcg = ideal.agg(F.coalesce(F.sum("_g"), F.lit(0)).alias("_idcg"))
    return dcg.crossJoin(idcg).select(
        F.lit(k).alias("k"),
        F.round(F.col("_dcg").cast("double") / scale, 6).alias("dcg"),
        F.round(F.col("_idcg").cast("double") / scale, 6).alias("idcg"),
        F.when(
            F.col("_idcg") > 0,
            F.round(F.col("_dcg").cast("double") / F.col("_idcg"), 6),
        ).alias("ndcg"),
    )


def retrieval_metrics(
    ranked: DataFrame,
    relevant: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Binary-relevance retrieval metrics at k for ONE query: hits@k,
    precision@k, recall@k, and reciprocal rank (MRR's single-query
    numerator) — the set-based complement to ``ndcg_at_k``'s graded
    ranking quality (standard IR eval, Manning/Raghavan/Schütze IIR
    ch. 8, public literature).

    ``relevant`` is the id-set of relevant documents (one column,
    ``id_col``; extra columns ignored). Ties in ``score_col`` are broken
    by ``id_col`` ascending — the suite-wide total-order contract.

    Scale shape (mirrors ndcg_at_k): the ranking side is top-k by
    construction (TakeOrderedAndProject — k rows cross the wire, never a
    full sort); the k ranked ids broadcast into a semi-filter over the
    relevance table, which is never shuffled or broadcast whole; n_rel
    is one map-side count. Position assignment is a window over k rows.

    Output (one row): k int, n_rel bigint, hits bigint, precision double,
    recall double (NULL when n_rel = 0), rr double — all 6dp.
    """
    if k < 1:
        raise ValueError(f"retrieval_metrics: k must be >= 1, got {k}")
    for c, df_, nm in (
        (id_col, ranked, "ranked"),
        (score_col, ranked, "ranked"),
        (id_col, relevant, "relevant"),
    ):
        if c not in df_.columns:
            raise ValueError(
                f"retrieval_metrics: column {c!r} not in {nm} {df_.columns}"
            )
    top = (
        ranked.orderBy(F.desc(score_col), F.asc(id_col))
        .limit(k)
        .localCheckpoint(eager=False)
    )
    rel_ids = relevant.select(id_col).distinct()
    rel_k = rel_ids.join(F.broadcast(top.select(id_col)), id_col, "left_semi")
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    marked = (
        top.join(F.broadcast(rel_k.withColumn("_rel", F.lit(1))), id_col, "left")
        .select(
            F.row_number().over(w).alias("_pos"),
            F.coalesce("_rel", F.lit(0)).alias("_rel"),
        )
    )
    folded = marked.agg(
        F.sum("_rel").cast("long").alias("hits"),
        F.min(F.when(F.col("_rel") == 1, F.col("_pos"))).alias("_first"),
    )
    n_rel = rel_ids.agg(F.count("*").alias("n_rel"))
    return folded.crossJoin(F.broadcast(n_rel)).select(
        F.lit(k).alias("k"),
        "n_rel",
        "hits",
        F.round(F.col("hits") / k, 6).alias("precision"),
        F.when(
            F.col("n_rel") > 0, F.round(F.col("hits") / F.col("n_rel"), 6)
        ).alias("recall"),
        F.round(
            F.coalesce(1.0 / F.col("_first"), F.lit(0.0)), 6
        ).alias("rr"),
    )
