"""Table loading for the driver's testdata star schema.

Parquet scans go through ``spark.read.parquet`` so Catalyst gets predicate
pushdown, column pruning and partition pruning for free — the reference reads
full-width Feather files and carries every column through the pipeline
(SURVEY §4.1); here a 2-column projection reads 2 columns.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Load one testdata table as a DataFrame (lazy parquet scan)."""
    base = sf_dir or DEFAULT_SF_DIR
    df = spark.read.parquet(os.path.join(base, f"{name}.parquet"))
    # events.ts is parquet TIMESTAMP(NANOS); Spark has no nanosecond timestamp
    # type, so the session reads it as long (spark.sql.legacy.parquet
    # .nanosAsLong) and we rebuild a micros timestamp here. Integer `div`
    # (not /) — nanos since epoch exceed double's 2^53 exact-integer range.
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str | None = None, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in names}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every testdata table as a temp view for spark.sql() use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
