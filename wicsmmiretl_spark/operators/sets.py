"""Set operations (SURVEY §2.6 U1 + free Spark surface)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def union_checked(left: DataFrame, right: DataFrame, key: str | None = None) -> DataFrame:
    """U1: vertical concat with the reference's ``verify_integrity`` contract
    (generate_wismir_vocab.ipynb cell 3).

    ``unionByName`` aligns by column name (pandas concat aligns by label);
    when ``key`` is given, duplicate keys across the union raise — one hash
    agg, no data collected.
    """
    out = left.unionByName(right)
    if key is not None:
        dupes = out.groupBy(key).count().filter(F.col("count") > 1)
        if not dupes.isEmpty():
            sample = [r[key] for r in dupes.limit(5).collect()]
            raise ValueError(f"union produced duplicate keys on {key!r}: sample {sample}")
    return out


def union_tagged(frames: dict[str, DataFrame], tag_col: str = "dataset") -> DataFrame:
    """Tag-and-union: the idiomatic replacement for the reference's 9-table
    fan-out (SURVEY §3.3) — each table gets a literal tag column, then one
    union feeds a single grouped aggregation."""
    tagged = [df.withColumn(tag_col, F.lit(name)) for name, df in frames.items()]
    out = tagged[0]
    for df in tagged[1:]:
        out = out.unionByName(df)
    return out
