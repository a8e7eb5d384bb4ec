"""Context-window chunking and training-sequence packing (north-star: the
two structural transforms between "cleaned corpus" and "model input").

Engine extension — the reference (wikicaps_etl_pipeline.py) stops at
per-caption enrichment; these operators cover what a pretraining data
pipeline does next:

* ``chunk_documents``: split each document into fixed-token windows with a
  stride (overlapping when stride < chunk). Pure projection + generate —
  no shuffle; chunk boundaries depend only on the row, so the operator
  scales linearly and partitions arbitrarily.
* ``pack_sequences``: GPT-style concat-and-cut packing — documents are
  concatenated in a deterministic order and cut every ``budget`` tokens;
  each document is assigned the sequence index and offset where its first
  token lands. A single global concatenation would serialize through one
  task, so documents are first salted into ``num_buckets`` independent
  streams (deterministic ``id % num_buckets``) and packed per bucket: the
  only shuffle is the per-bucket sort, and buckets scale with the cluster.
  Cross-bucket sequence ids never collide (``bucket`` is part of the key).

Both are exact-integer computations (token counts, running sums) — no
floats anywhere, so results are bit-identical across engines and
partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wicsmmiretl_spark.functions.text import tokens


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split each document into token windows of ``chunk`` tokens, starting
    every ``stride`` tokens (overlap = chunk - stride).

    Output: id, chunk_idx (0-based), chunk_text, chunk_n_tok. Documents
    with zero tokens produce no chunks; a trailing window shorter than
    ``chunk`` is kept (standard context-window fill).

    Plan shape: staged token array → guarded ``sequence`` of window starts
    → ``explode_outer`` + null-filter on the GENERATED attribute (a plain
    ``explode`` plants an implicit ``size(arr) > 0`` filter that predicate
    pushdown sinks below the staged projection, re-inlining the interpreted
    tokenizer — the 45x failure mode). One generate per row, no shuffle.
    """
    if chunk < 1 or stride < 1:
        raise ValueError(f"chunk and stride must be >= 1, got {chunk}/{stride}")
    staged = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
    n = F.size(F.col("_toks"))
    starts = F.when(n >= 1, F.sequence(F.lit(1), n, F.lit(stride))).otherwise(
        F.array().cast("array<int>")
    )
    piece = F.slice(F.col("_toks"), F.col("_start"), chunk)
    return (
        staged.select(F.col(id_col), F.col("_toks"), F.explode_outer(starts).alias("_start"))
        .filter(F.col("_start").isNotNull())
        .select(
            F.col(id_col),
            ((F.col("_start") - 1) / F.lit(stride)).cast("long").alias("chunk_idx"),
            F.array_join(piece, " ").alias("chunk_text"),
            F.size(piece).cast("long").alias("chunk_n_tok"),
        )
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
    num_buckets: int = 32,
) -> DataFrame:
    """Concat-and-cut packing: assign each document the training sequence
    (and offset within it) where its first token lands when the bucket's
    documents are concatenated in id order and cut every ``budget`` tokens.

    Output: id, bucket, seq_idx, seq_offset, n_tok. A document longer than the
    remaining room overflows into the next sequence(s) — exactly the
    concat-and-cut semantics GPT-style pretraining uses (no padding, docs
    may span cuts). Downstream consumers materialize sequence s of bucket b
    by taking its member docs in id order.

    Scale: ``num_buckets`` independent packing streams whose running
    token totals ride :func:`~wicsmmiretl_spark.operators.sampling.
    distributed_prefix_sum` on ``(bucket, id)`` — a bucket SPANS range
    partitions instead of serializing into one window task, so
    ``num_buckets`` bounds the number of packing streams, NOT the
    parallelism (the old ``PARTITION BY bucket`` window capped the sort
    at ``num_buckets`` tasks however big the cluster). Exact integer
    arithmetic throughout — deterministic on any cluster layout.
    """
    if budget < 1 or num_buckets < 1:
        raise ValueError(f"budget and num_buckets must be >= 1, got {budget}/{num_buckets}")
    from wicsmmiretl_spark.operators.sampling import (
        _exact_intdiv,
        distributed_prefix_sum,
    )

    n_tok = F.size(tokens(text_col)).cast("long")
    staged = df.select(
        F.col(id_col),
        F.pmod(F.col(id_col), F.lit(num_buckets)).cast("long").alias("bucket"),
        n_tok.alias("n_tok"),
    )
    running = distributed_prefix_sum(
        staged, order_cols=[id_col], sum_cols=["n_tok"], group_cols=["bucket"]
    )
    first_tok = F.col("n_tok_cum") - F.col("n_tok")
    return running.select(
        F.col(id_col),
        "bucket",
        _exact_intdiv(first_tok, budget).alias("seq_idx"),
        F.pmod(first_tok, F.lit(budget)).cast("long").alias("seq_offset"),
        "n_tok",
    )
