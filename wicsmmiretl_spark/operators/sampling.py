"""Sampling, shuffling, limits (SURVEY §2.5 R1-R3, R7).

Determinism contract: pandas seeds don't transfer to a cluster, so the engine
promises *self*-reproducibility (same seed → same rows on any cluster
layout), not bit-parity with pandas RNG (SURVEY §7 risk (a)).

The seeded-shuffle-then-head idiom (wikicaps_etl_pipeline.py:120-122,141-147)
is a deterministic sample-without-replacement; a bare Spark ``limit`` is
order-unstable, so the deterministic variant sorts by a per-row hash keyed on
the seed. Hash-sort beats ``orderBy(rand(seed))`` at scale: ``rand`` is
partition-index dependent (stable only for a fixed partitioning), while
``xxhash64(key, seed)`` depends on data values alone.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deterministic_shuffle(df: DataFrame, key_cols: Sequence[str], seed: int = 1312) -> DataFrame:
    """R1: seeded full permutation (reference seed 1312,
    configs/config_gpu_server_spacy.yml:11).

    Orders by a value-derived 64-bit hash — reproducible regardless of input
    partitioning. When the goal is only load-spreading (the reference's
    stated purpose, wikicaps_etl_pipeline.py:87-88), prefer
    ``df.repartition(n)`` and skip the sort entirely.
    """
    return df.orderBy(F.xxhash64(*[F.col(c) for c in key_cols], F.lit(seed)))


def deterministic_sample(
    df: DataFrame, n: int, key_cols: Sequence[str], seed: int = 1312
) -> DataFrame:
    """R2/R3: exact-n seeded sample without replacement.

    pandas ``df.sample(frac=1, random_state=s).head(n)`` equivalent. The
    hash-sort + limit compiles to TakeOrderedAndProject (top-k): each
    partition keeps its local n smallest hashes, only n·p rows shuffle —
    no full sort at 100 TB.
    """
    return deterministic_shuffle(df, key_cols, seed).limit(n)


def sample_fraction(df: DataFrame, fraction: float, seed: int = 1312) -> DataFrame:
    """Approximate-n Bernoulli sample — the cheap path (no shuffle at all)."""
    return df.sample(withReplacement=False, fraction=fraction, seed=seed)


def train_test_split(
    df: DataFrame, test_fraction: float, key_cols: Sequence[str], seed: int = 1312
) -> tuple[DataFrame, DataFrame]:
    """R7: regenerate the reference's train/test split capability (the repo
    ships only split artifacts, no code — SURVEY §1.1).

    Value-hash bucketing instead of ``randomSplit``: deterministic under
    repartitioning AND stable for a given key (a row never migrates between
    splits when unrelated rows are added — the property a dataset-versioning
    pipeline actually needs).
    """
    bucket = F.pmod(F.xxhash64(*[F.col(c) for c in key_cols], F.lit(seed)), F.lit(1_000_000))
    test = df.filter(bucket < int(test_fraction * 1_000_000))
    train = df.filter(bucket >= int(test_fraction * 1_000_000))
    return train, test


def hash_split(
    df: DataFrame, test_fraction: float, key_cols: Sequence[str], seed: int = 1312
) -> DataFrame:
    """R7 variant with a cross-engine-reproducible hash: md5 of the
    ``:``-joined key values + seed; first 32 hash bits under the threshold →
    'test'. Same stability guarantees as :func:`train_test_split` (row
    assignment depends only on its key), but the assignment can be recomputed
    in any engine with an md5 function — the property an audit needs.

    Adds a ``split`` column ('test' | 'train'). Threshold compare happens on
    the 8-hex-char prefix as a string — fixed-length lowercase hex preserves
    numeric order.
    """
    key = F.concat_ws(":", *[F.col(c).cast("string") for c in key_cols], F.lit(str(seed)))
    prefix = F.md5(key).substr(1, 8)
    threshold = format(int(test_fraction * 0x100000000), "08x")
    return df.withColumn(
        "split", F.when(prefix < threshold, F.lit("test")).otherwise(F.lit("train"))
    )


def top_k(df: DataFrame, order_col: str, k: int, ascending: bool = False) -> DataFrame:
    """R5 + limit: top-k by value → TakeOrderedAndProject, no global sort."""
    order = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    return df.orderBy(order).limit(k)
