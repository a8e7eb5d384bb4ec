"""Data layout for scan pruning: Z-order (Morton) clustering.

At 100 TB the cheapest query is the one that never reads the file: parquet
row-group min/max statistics prune scans, but only if the writer clustered
the data so each file covers a SMALL range of the filter columns. Sorting
by (a, b) prunes filters on `a` and barely helps `b`; interleaving the bits
of both columns (Morton / Z-order curve) gives every file a tight bounding
box in BOTH dimensions, so either filter prunes.

Everything here is pure Catalyst arithmetic (shift/and/or on integral
ranks) — no UDFs — and the layout write is repartitionByRange + sort, the
shapes Spark already optimizes. The min/max normalization pass is ONE
column-pruned aggregate (2 scalars per column collected to the driver).

No reference twin (the reference writes a single Feather file); this is
north-star 100 TB engineering.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(
    df: DataFrame, cols: Sequence[str], bits: int = 8
) -> tuple[DataFrame, Column]:
    """Append a Morton code column interleaving ``bits`` bits per column.

    Each column is min/max-scaled to an integer rank in [0, 2^bits) (one
    eager aggregate for the bounds — 2 scalars per column), then ranks are
    bit-interleaved: output bit ``b * len(cols) + i`` is bit ``b`` of
    column ``i``'s rank. NULL ranks sort first (rank 0).

    Returns (df_with__zorder, zorder_column). ``bits * len(cols)`` must fit
    a signed 64-bit long (<= 62).
    """
    if not cols:
        raise ValueError("zorder_value: need at least one column")
    if bits * len(cols) > 62:
        raise ValueError(
            f"zorder_value: {bits} bits x {len(cols)} cols exceeds a 63-bit long; "
            "lower bits (8 per column prunes to 1/256 ranges — plenty for layout)"
        )
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"min_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"max_{c}") for c in cols],
    ).first()

    top = (1 << bits) - 1
    ranks = []
    for c in cols:
        lo, hi = bounds[f"min_{c}"], bounds[f"max_{c}"]
        if lo is None or hi is None or hi == lo:
            ranks.append(F.lit(0).cast("long"))
            continue
        scaled = (F.col(c).cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo)) * top
        rank = F.least(F.greatest(F.round(scaled).cast("long"), F.lit(0)), F.lit(top))
        ranks.append(F.coalesce(rank, F.lit(0)))

    terms = []
    n = len(cols)
    for b in range(bits):
        for i, rank in enumerate(ranks):
            bit = F.shiftright(rank, b).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, b * n + i))
    z = reduce(lambda acc, t: acc.bitwiseOR(t), terms).alias("_zorder")
    return df.withColumn("_zorder", z), F.col("_zorder")


def cluster_by_zorder(
    df: DataFrame, cols: Sequence[str], num_partitions: int, bits: int = 8
) -> DataFrame:
    """Cluster rows for a layout write: Z-order code -> range partitioning
    -> intra-partition sort. Each output file then covers one contiguous
    stretch of the Z-curve = a tight bounding box per filter column, so
    parquet min/max stats prune scans on ANY of ``cols``.

    One exchange (range partitioning needs a sampled-boundary shuffle —
    inherent to any clustered write); the sort is partition-local. Drop the
    ``_zorder`` helper column after writing if the consumer should not see
    it (kept here so the writer can verify the clustering).
    """
    zdf, z = zorder_value(df, cols, bits)
    return zdf.repartitionByRange(num_partitions, z).sortWithinPartitions(z)
