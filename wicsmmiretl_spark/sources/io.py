"""Sources and sinks (SURVEY §2.1 S1-S6).

Reference parity:
* S1 multi-char-separator caption scan — pd.read_csv(sep="|||")
  (wikicaps_etl_pipeline.py:102,110-116) → Spark csv reader with a multi-char
  ``sep`` (native since Spark 3.0), then explicit column names + types.
* S3 JSON scan + flatten — pycocotools imgToAnns walk (coco.ipynb cells 3-17)
  → spark.read.json + explode.
* S4/S5 columnar read/write — Feather (wikicaps_etl_pipeline.py:136,226-231)
  → Parquet, the cluster-native columnar format (splittable, predicate
  pushdown, column pruning; Feather is not a distributed-FS format).
* S6 projected CSV sink with quoting (wikicaps_etl_pipeline.py:233-240).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from wicsmmiretl_spark.schemas import WIKICAPS_RAW


def read_caption_list(spark: SparkSession, path: str) -> DataFrame:
    """S1: read the ``id|||File:x.jpg|||caption`` caption list.

    Mirrors wikicaps_etl_pipeline.py:110-116 (read + rename + unique-key
    contract). Uniqueness is *checked* via :func:`assert_unique_key` at call
    sites, not via a pandas index (Spark has none).
    """
    return (
        spark.read.option("sep", "|||")
        .option("header", "false")
        .option("encoding", "UTF-8")
        .schema(WIKICAPS_RAW)
        .csv(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    sep: str = ",",
    header: bool = True,
    schema: StructType | None = None,
) -> DataFrame:
    """S2: general CSV scan (single- or multi-char sep; f30k uses ``|``)."""
    reader = spark.read.option("sep", sep).option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json_flat(
    spark: SparkSession,
    path: str,
    explode_field: str,
    select_map: dict[str, str],
) -> DataFrame:
    """S3: JSON scan + 1→N flatten of a nested array field.

    The COCO notebook walks ``imgToAnns`` imperatively (coco.ipynb cells
    3-17); declaratively this is explode + projection, which keeps the flatten
    inside whole-stage codegen.

    ``select_map`` maps output column name → field path relative to the
    exploded element (or a top-level field).
    """
    df = spark.read.json(path)
    exploded = df.select(F.explode(F.col(explode_field)).alias("_elem"), "*")
    cols = [F.col(path).alias(name) for name, path in select_map.items()]
    return exploded.select(*cols)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S4: columnar scan (Feather → Parquet)."""
    return spark.read.parquet(path)


def read_parquet_evolved(spark: SparkSession, *paths: str) -> DataFrame:
    """S4 with schema evolution: read parquet written across schema
    versions (columns added over time) as ONE DataFrame on the union
    schema — files missing a column yield NULLs for it.

    ``mergeSchema`` is off by default in Spark because it footer-scans
    every file at planning time; a long-lived 100 TB dataset turns that
    into a real planning cost, so this entry point makes the trade
    explicit instead of flipping the session default. Incompatible type
    changes for a same-named column still (correctly) fail the read —
    evolution here means ADDITIVE."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    """S5: columnar sink. ``partition_by`` enables partition pruning at scale."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv_projection(
    df: DataFrame,
    path: str,
    columns: list[str],
    mode: str = "overwrite",
    quote: str = '"',
    header: bool = True,
) -> None:
    """S6: CSV sink writing only a projection, quoted.

    Reference writes ``["image_path", "caption"]`` with quotechar='"'
    (wikicaps_etl_pipeline.py:233-240). The projection is applied before the
    write so the scan above it is pruned to those columns.
    """
    (
        df.select(*columns)
        .write.mode(mode)
        .option("quote", quote)
        .option("header", str(header).lower())
        .csv(path)
    )


def assert_unique_key(df: DataFrame, key: str) -> None:
    """verify_integrity=True equivalent (wikicaps_etl_pipeline.py:116).

    Distributed uniqueness check: one hash aggregation, no collect of data —
    only the (tiny) violating key set would ever reach the driver.
    """
    dupes = df.groupBy(key).count().filter(F.col("count") > 1)
    if not dupes.isEmpty():
        sample = [r[key] for r in dupes.limit(5).collect()]
        raise ValueError(f"duplicate keys in column {key!r}: sample {sample}")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Bucketed managed-table sink: pre-shuffles data into ``num_buckets``
    files per partition keyed on ``bucket_cols``, so later equi-joins or
    aggregations on those columns read co-located data and skip the
    exchange entirely — the standard big-big join strategy at 100 TB
    (pay the shuffle once at write time, amortize over every join after).
    """
    writer = df.write.mode("overwrite").format("parquet")
    if path is not None:
        writer = writer.option("path", path)
    writer = writer.bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink (one JSON object per line — the interchange format of
    most LLM-data pipelines)."""
    df.write.mode(mode).json(path)


def read_jsonl(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """JSON-lines source; pass an explicit schema at scale (schema inference
    is a full extra pass over the data)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — second columnar format (parquet is canonical)."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def overwrite_partitions(df: DataFrame, path: str, partition_by: list[str]) -> None:
    """Idempotent partition-level backfill: rewrites ONLY the hive
    partitions present in ``df`` (dynamic partition overwrite), leaving the
    rest of the dataset untouched. The pattern that makes daily re-runs of
    the E/T/L pipeline (O1/O2) safe — re-processing one day never clobbers
    the other days.
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(path)
    )


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None, max_bytes: int | None = None
) -> DataFrame:
    """Binary-asset ingestion via the ``binaryFile`` source: one row per
    file with (path, modificationTime, length, content) — the distributed
    twin of the reference's local image-directory walk (utils.py:76-97) and
    the standard way raw images/audio enter the multimodal pipeline
    (multimodal/images.py) from an object store.

    ``glob`` filters by pathGlobFilter at the SOURCE (files that don't match
    are never opened); ``max_bytes`` pre-filters on the LENGTH metadata
    column so oversized assets are dropped before their content influences
    downstream batch sizing. Partitioning: the source splits by file, so
    parallelism = file count — compact tiny-file directories first
    (:func:`compact_parquet` is the same medicine for parquet).
    """
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.filter(F.col("length") <= max_bytes)
    return df


def compact_parquet(
    spark: SparkSession, path: str, out_path: str, target_bytes_per_file: int = 128 * 1024 * 1024
) -> int:
    """Small-files compaction: rewrite a parquet dataset into files of
    roughly ``target_bytes_per_file`` (HDFS/S3 sweet spot). Small files are
    the classic silent killer at 100 TB — each one costs a task, a
    footer-read, and a driver-side listing entry.

    File count is derived from the dataset's on-disk bytes (input_file_
    metadata aggregation — no data read beyond the listing), floored at 1.
    Returns the number of files written. Uses ``repartition`` (round-robin)
    for even output sizes; callers that need a downstream join key should
    instead repartition by that key and write bucketed tables.
    """
    src = spark.read.parquet(path)
    total_bytes = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(path)
        .agg(F.sum("length").alias("b"))
        .first()["b"]
        or 0
    )
    n_files = max(1, int(total_bytes // target_bytes_per_file) + (1 if total_bytes % target_bytes_per_file else 0))
    src.repartition(n_files).write.mode("overwrite").parquet(out_path)
    return n_files
