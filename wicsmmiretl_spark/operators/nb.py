"""Multinomial naive Bayes text classifier — train and classify as pure
DataFrame plans.

Engine extension beyond the reference: the linear bag-of-words classifier
(McCallum & Nigam 1998, public literature) that LLM data-curation
pipelines use as the cheap quality/language/domain filter (the CCNet /
GPT-3-style "looks like the target corpus" gate) — trained and applied
entirely in the engine, no external model artifact, no Python.

Determinism contract (the bigram-surprisal discipline): every
log-probability is computed once from EXACT integer counts, rounded to
``scale`` units as a bigint, and document scores are bigint sums of those
rounded terms — no float-summation order anywhere, so training and
classification replay identically on any partitioning or engine.

100 TB design: training is two combiner-backed hash aggs (per-(label,
token) counts; per-doc label counts) — the model is |vocab|×|labels|
rows, data-independent once counts converge. Classification joins the
doc-token table to the model on the token key (ONE high-cardinality
equi-join; Zipf skew is AQE's bread and butter), with labels and their
priors/defaults broadcast. The per-doc argmax rides the doc-keyed
aggregation. No driver state beyond nothing: even the vocabulary size
enters the plan as a 1-row cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wicsmmiretl_spark.functions.text import tokens


def nb_train(
    df: DataFrame,
    label_col: str,
    text_col: str,
    scale: int = 10**7,
) -> tuple[DataFrame, DataFrame]:
    """Train add-1-smoothed multinomial NB: P(t|c) = (n_tc + 1)/(n_c + V).

    Returns ``(token_logps, label_info)``:

    * token_logps: label, token, logp bigint — round(ln P(t|c)·scale)
      for every (label, token observed in that label) pair;
    * label_info: label, prior bigint (round(ln P(c)·scale)), dflt
      bigint (the unseen-token log-prob round(ln(1/(n_c+V))·scale)).

    Rows with NULL label or text are excluded. V counts distinct tokens
    across the whole training corpus.
    """
    for c in (label_col, text_col):
        if c not in df.columns:
            raise ValueError(f"nb_train: column {c!r} not in {df.columns}")
    base = df.filter(
        F.col(label_col).isNotNull() & F.col(text_col).isNotNull()
    ).select(F.col(label_col).alias("label"), tokens(text_col).alias("_tk"))
    tok = base.select("label", F.explode("_tk").alias("token"))
    ntc = tok.groupBy("label", "token").agg(F.count("*").alias("_n_tc"))
    nc = ntc.groupBy("label").agg(F.sum("_n_tc").alias("_n_c"))
    v = ntc.agg(F.countDistinct("token").alias("_v"))
    nd = base.groupBy("label").agg(F.count("*").alias("_nd"))
    tot = base.agg(F.count("*").alias("_n"))
    token_logps = (
        ntc.join(nc, "label")
        .crossJoin(F.broadcast(v))
        .select(
            "label",
            "token",
            F.round(
                F.log((F.col("_n_tc") + 1) / (F.col("_n_c") + F.col("_v")).cast("double"))
                * scale
            )
            .cast("long")
            .alias("logp"),
        )
    )
    label_info = (
        nc.join(nd, "label")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(v))
        .select(
            "label",
            F.round(F.log(F.col("_nd") / F.col("_n").cast("double")) * scale)
            .cast("long")
            .alias("prior"),
            F.round(
                F.log(F.lit(1.0) / (F.col("_n_c") + F.col("_v")).cast("double"))
                * scale
            )
            .cast("long")
            .alias("dflt"),
        )
    )
    return token_logps, label_info


def nb_classify(
    docs: DataFrame,
    token_logps: DataFrame,
    label_info: DataFrame,
    id_col: str,
    text_col: str,
    scale: int = 10**7,
) -> DataFrame:
    """Classify documents under a trained NB model: per doc, the label
    maximizing prior + Σ_t count(t)·logp(t|label), tokens unseen in a
    label falling back to that label's smoothed default. Ties break by
    ascending label (the suite-wide determinism contract). Documents
    with zero tokens are excluded (no evidence, no posterior).

    Output: id_col, pred label, score double (the scaled log-posterior
    numerator / scale, 4dp — comparable within a document only).
    """
    for c, df_, nm in ((id_col, docs, "docs"), (text_col, docs, "docs")):
        if c not in df_.columns:
            raise ValueError(f"nb_classify: column {c!r} not in {nm} {df_.columns}")
    dt = (
        docs.filter(F.col(id_col).isNotNull() & F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("token"))
        .groupBy("_id", "token")
        .agg(F.count("*").alias("_cnt"))
    )
    cand = dt.crossJoin(F.broadcast(label_info))
    scored = (
        cand.join(token_logps, ["label", "token"], "left")
        .groupBy("_id", "label", "prior")
        .agg(
            F.sum(
                F.col("_cnt") * F.coalesce(F.col("logp"), F.col("dflt"))
            ).alias("_s")
        )
        .select(
            "_id", "label", (F.col("prior") + F.col("_s")).alias("_score")
        )
    )
    w = Window.partitionBy("_id").orderBy(F.desc("_score"), F.asc("label"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("_id").alias(id_col),
            F.col("label").alias("pred"),
            F.round(F.col("_score") / scale, 4).alias("score"),
        )
    )


def nb_confusion(
    df: DataFrame,
    label_col: str,
    text_col: str,
    id_col: str,
    scale: int = 10**7,
) -> DataFrame:
    """Resubstitution confusion matrix: train on the labeled corpus,
    classify the same corpus, count (true, predicted) pairs — the
    one-stop classifier-quality readout (diagonal mass = training-set
    accuracy; off-diagonal cells show which classes bleed).

    Output: true label (label_col's name prefixed 'true_'), pred,
    n bigint — ascending.
    """
    token_logps, label_info = nb_train(df, label_col, text_col, scale)
    preds = nb_classify(df, token_logps, label_info, id_col, text_col, scale)
    truth = df.filter(
        F.col(label_col).isNotNull() & F.col(text_col).isNotNull()
    ).select(F.col(id_col), F.col(label_col).alias(f"true_{label_col}"))
    return (
        preds.join(truth, id_col)
        .groupBy(f"true_{label_col}", "pred")
        .agg(F.count("*").alias("n"))
        .orderBy(f"true_{label_col}", "pred")
    )


def nb_uncertainty_queue(
    docs: DataFrame,
    token_logps: DataFrame,
    label_info: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 40,
    scale: int = 10**7,
) -> DataFrame:
    """Active-learning annotation queue by margin (uncertainty) sampling
    (Lewis & Gale 1994, Settles 2009 — public literature): the k
    documents whose NB posterior margin — best-label score minus
    runner-up score — is SMALLEST. Those are the examples a human label
    improves the model most; the budget-allocation primitive of every
    labeling pipeline on top of a cheap in-engine classifier.

    Determinism: scores are the same scaled-bigint log-posterior sums
    ``nb_classify`` ranks by, so margins are exact integers; the queue
    order (margin asc, id asc) and the top/runner-up tiebreaks (score
    desc, label asc) replay in SQL.

    Scale shape: identical to classification (one token-keyed equi-join
    + per-doc hash agg) plus one rank window per doc over |labels| rows
    and one global TakeOrdered(k) — no extra pass over the corpus.

    Output: id_col, pred, runner_up, margin double (scaled, 4dp),
    ordered most-uncertain first.
    """
    if k < 1:
        raise ValueError(f"nb_uncertainty_queue: k must be >= 1, got {k}")
    for c in (id_col, text_col):
        if c not in docs.columns:
            raise ValueError(f"nb_uncertainty_queue: column {c!r} not in {docs.columns}")
    dt = (
        docs.filter(F.col(id_col).isNotNull() & F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("token"))
        .groupBy("_id", "token")
        .agg(F.count("*").alias("_cnt"))
    )
    cand = dt.crossJoin(F.broadcast(label_info))
    scored = (
        cand.join(token_logps, ["label", "token"], "left")
        .groupBy("_id", "label", "prior")
        .agg(
            F.sum(F.col("_cnt") * F.coalesce(F.col("logp"), F.col("dflt"))).alias("_s")
        )
        .select("_id", "label", (F.col("prior") + F.col("_s")).alias("_score"))
    )
    w = Window.partitionBy("_id").orderBy(F.desc("_score"), F.asc("label"))
    ranked = scored.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= 2)
    top = ranked.filter(F.col("_rn") == 1).select(
        "_id", F.col("label").alias("pred"), F.col("_score").alias("_s1")
    )
    second = ranked.filter(F.col("_rn") == 2).select(
        "_id", F.col("label").alias("runner_up"), F.col("_score").alias("_s2")
    )
    return (
        top.join(second, "_id")
        .select(
            F.col("_id").alias(id_col),
            "pred",
            "runner_up",
            F.round((F.col("_s1") - F.col("_s2")) / scale, 4).alias("margin"),
        )
        .orderBy(F.asc("margin"), F.asc(id_col))
        .limit(k)
    )
