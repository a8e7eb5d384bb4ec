"""Gopher-style repetition quality signals (Rae et al. 2021, §A1.1) for
training-data filtering.

Per document:

* ``dup_word_frac``     — fraction of token occurrences that are repeats of
                          an earlier token (1 - distinct/total).
* ``top_bigram_frac``   — fraction of word-bigram occurrences claimed by the
                          single most frequent bigram (ties broken by
                          lexicographically smallest bigram — deterministic
                          across engines and partitionings).
* ``dup_bigram_frac``   — fraction of bigram occurrences whose bigram occurs
                          more than once.

These are occurrence-fraction variants of Gopher's character-fraction
definitions: same signal, but exactly portable to a SQL oracle (character
overlap counting is engine-lore-heavy for zero extra discriminative power).

Scale design: one explode → one (id, gram) groupBy → one per-doc groupBy.
Both aggregations are partial-agg (map-side combine) hash aggregates — no
window, no sort: the deterministic argmax is ``min(struct(-cnt, gram))``
(struct ordering = count desc, then gram asc), which folds into the same
grouped pass as the totals. No Python, no driver work. Documents shorter
than 2 tokens surface with zero fractions via a left join back to the
input ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wicsmmiretl_spark.functions.text import tokens


def repetition_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_tokens, dup_word_frac, n_bigrams, top_bigram, top_bigram_frac,
    dup_bigram_frac) — one row per input row."""
    toked = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
    base = toked.select(
        F.col(id_col),
        F.size("_toks").alias("n_tokens"),
        F.size(F.array_distinct("_toks")).alias("n_distinct"),
        F.expr(
            "CASE WHEN size(_toks) >= 2 THEN transform(sequence(1, size(_toks) - 1), "
            "i -> concat_ws(' ', element_at(_toks, i), element_at(_toks, i + 1))) "
            "ELSE array() END"
        ).alias("_grams"),
    )

    # explode_outer + post-filter (see decontaminate.py): plain explode's
    # implicit size>0 filter would be pushed below the projections and
    # re-inline the interpreted bigram lambda per element_at — ~45x slower.
    grams = base.select(F.col(id_col), F.explode_outer("_grams").alias("gram")).filter(
        F.col("gram").isNotNull()
    )
    counts = grams.groupBy(id_col, "gram").agg(F.count("*").alias("cnt"))
    per_doc = (
        counts.groupBy(id_col)
        .agg(
            F.sum("cnt").alias("total"),
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias("dup_occ"),
            F.min(
                F.struct((-F.col("cnt")).alias("neg_cnt"), F.col("gram").alias("gram"))
            ).alias("top"),
        )
        .select(
            F.col(id_col),
            F.col("total").alias("n_bigrams"),
            F.col("top.gram").alias("top_bigram"),
            F.round(-F.col("top.neg_cnt") / F.col("total"), 6).alias("top_bigram_frac"),
            F.round(F.col("dup_occ") / F.col("total"), 6).alias("dup_bigram_frac"),
        )
    )

    return (
        base.select(
            F.col(id_col),
            F.col("n_tokens"),
            F.round(
                F.when(
                    F.col("n_tokens") > 0,
                    (F.col("n_tokens") - F.col("n_distinct")) / F.col("n_tokens"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_word_frac"),
        )
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            "dup_word_frac",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "top_bigram",
            F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
            F.coalesce("dup_bigram_frac", F.lit(0.0)).alias("dup_bigram_frac"),
        )
    )
