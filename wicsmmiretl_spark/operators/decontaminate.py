"""Benchmark decontamination: flag training documents sharing word n-grams
with an evaluation/benchmark set (the standard n-gram-overlap protocol used
for LLM training corpora, e.g. GPT-3 appendix C / PaLM §7).

Mechanism: distinct word n-grams per document on BOTH sides (reusing the
dedup module's staged shingle projection — tokenize once, no re-inlined
interpreted lambdas), equi-join on the md5 of the gram, aggregate per
training doc.

Scale design: the benchmark side is small in practice (eval suites are
MBs, the corpus is TBs) → its gram set is BROADCAST, so the training side
is a map-side join over the scan: no shuffle of the corpus at all. The
per-doc aggregate then shuffles only matched (train_id, gram) rows — a set
that is tiny unless the corpus is heavily contaminated. With
``broadcast_bench=False`` the join degrades gracefully to a shuffled
equi-join on the gram hash (both sides partitioned by md5 — uniform, no
skew) for the rare benchmark-is-huge case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wicsmmiretl_spark.operators.dedup import staged_shingles


def ngram_contamination(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    broadcast_bench: bool = True,
) -> DataFrame:
    """(train_id, n_shared_grams, n_bench_docs) for every training doc that
    shares at least one word ``n``-gram with any benchmark doc.

    * ``n_shared_grams`` — distinct contaminated grams in the training doc.
    * ``n_bench_docs``   — distinct benchmark docs it collides with.

    Callers drop or downweight flagged docs; the operator only measures.
    """
    # explode_outer + post-filter, NOT explode: plain explode plants an
    # implicit `size(sh) > 0` filter that predicate-pushdown drags below the
    # staged projections, re-inlining the interpreted shingle lambda into a
    # Filter where every element_at re-tokenizes the text (~45x slower,
    # measured at sf0.1). The null-filter on the GENERATED attribute cannot
    # be pushed below the Generate.
    t_grams = (
        staged_shingles(train, id_col, text_col, n)
        .select(F.col(id_col).alias("train_id"), F.explode_outer("sh").alias("gram"))
        .filter(F.col("gram").isNotNull())
        .withColumn("gh", F.md5("gram"))
    )
    b_grams = (
        staged_shingles(bench, id_col, text_col, n)
        .select(F.col(id_col).alias("bench_id"), F.explode_outer("sh").alias("gram"))
        .filter(F.col("gram").isNotNull())
        .select("bench_id", F.md5("gram").alias("gh"))
    )
    if broadcast_bench:
        b_grams = F.broadcast(b_grams)
    return (
        t_grams.join(b_grams, "gh")
        .groupBy("train_id")
        .agg(
            F.countDistinct("gh").alias("n_shared_grams"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
    )
