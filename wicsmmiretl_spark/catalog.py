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
    """Load one testdata table as a DataFrame (lazy parquet scan).

    **Session side effects** (both permanent for the session's lifetime,
    both required for cross-engine timestamp determinism):

    * reading ``events`` sets ``spark.sql.legacy.parquet.nanosAsLong=true``;
    * any table carrying ``timestamp_ntz`` columns repins
      ``spark.sql.session.timeZone`` to ``UTC``. If the caller's session had
      a different timezone, a ``UserWarning`` is emitted, because the repin
      changes how *other* timestamp literals/casts in that session parse and
      format from then on. Build sessions via
      :func:`wicsmmiretl_spark.session.get_spark` (already UTC-pinned) to
      avoid the warning.

    Small single-row-group files are repartitioned to the session's
    parallelism: a parquet row group is the minimum split unit, so a tiny
    file otherwise pins every map-only expression pipeline to ONE task. The
    branch is size-gated — at production scale a scan has thousands of
    splits, the condition is false, and no extra shuffle is introduced.
    Filters/pruning still push through (Catalyst moves Filter/Project below
    Repartition).
    """
    base = sf_dir or DEFAULT_SF_DIR
    path = os.path.join(base, f"{name}.parquet")
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS). The conf is set here (it is
        # runtime-settable, verified) and not only in session.py's builder
        # defaults, because callers may hand us a session we didn't build —
        # e.g. the correctness harness constructs a vanilla SparkSession.
        # NOTE: this mutates the caller's session for its remaining lifetime —
        # later parquet reads in the same session will coerce TIMESTAMP(NANOS)
        # to long instead of erroring. It cannot be save-and-restored around
        # the read: the scan is lazy, and the conf is consulted at execution
        # time, not at `spark.read` time.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    # Normalize every event-time column to plain TIMESTAMP regardless of the
    # parquet physical type the generator chose — this has drifted across
    # testdata versions (r5 broke 7 queries on exactly this):
    #   * TIMESTAMP(NANOS) on events.ts: Spark has no nanosecond timestamp
    #     type, so the session reads it as long (nanosAsLong above) and we
    #     rebuild a micros timestamp. Integer `div` (not /) — nanos since
    #     epoch exceed double's 2^53 exact-integer range.
    #   * timestamp[us] without isAdjustedToUTC (events.ts, o_orderdate,
    #     l_shipdate, ...): arrives as TIMESTAMP_NTZ, where every
    #     unix_micros() downstream throws DATATYPE_MISMATCH. The session
    #     timezone is pinned UTC (session.py), so the cast to TIMESTAMP is
    #     value-preserving and matches DuckDB's naive-epoch math. Pushdown
    #     verified: Catalyst inverts the UTC ntz->ltz cast, so range filters
    #     on ts still reach PushedFilters at the parquet scan.
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if any(dtype == "timestamp_ntz" for _, dtype in df.dtypes):
        # The ntz->ltz cast interprets the naive wall-clock in the SESSION
        # timezone — correct only under UTC (which is what DuckDB's
        # epoch_us over the same naive values computes). Our own sessions
        # pin UTC in session.py, but callers may hand us a vanilla session
        # (the correctness harness does), so pin it here too — same
        # documented session mutation as nanosAsLong above. The conf is set
        # BEFORE the cast expression is built, so analysis resolves the
        # cast's timezone to UTC regardless of the caller's setting. Warn
        # when actually CHANGING a non-UTC session: the repin is permanent
        # and alters timestamp parsing for everything else in that session
        # (documented in the public docstring above).
        # NB: conf.get(key, "") is a trap on PySpark 4.x — the provided
        # default is itself validated against the entry's converter, so an
        # empty-string default throws INVALID_CONF_VALUE on any session
        # that hasn't explicitly set the timezone. Read without a default
        # (resolves to the JVM default TZ) and treat failure as unknown.
        try:
            prior_tz = spark.conf.get("spark.sql.session.timeZone")
        except Exception:
            prior_tz = ""
        if prior_tz not in ("", "UTC", "Etc/UTC", "GMT"):
            import warnings

            warnings.warn(
                f"load_table({name!r}): repinning session timezone "
                f"{prior_tz!r} -> 'UTC' for timestamp_ntz normalization; "
                "this persists for the session's lifetime",
                UserWarning,
                stacklevel=2,
            )
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        for col, dtype in df.dtypes:
            if dtype == "timestamp_ntz":
                df = df.withColumn(col, F.col(col).cast("timestamp"))
    try:
        cores = spark.sparkContext.defaultParallelism
        max_split = int(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728").rstrip("b"))
        # Lower bound: a dimension-sized table (≤512 KB) is broadcast-join
        # material — forcing 32 partitions on 25 rows only adds scheduling
        # and an Exchange in front of every BroadcastExchange.
        if os.path.isfile(path) and 512 * 1024 < os.path.getsize(path) < cores * max_split:
            df = df.repartition(cores)
    except Exception:  # directory datasets / remote paths: leave the scan alone
        pass
    return df


def load_tables(
    spark: SparkSession, sf_dir: str | None = None, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in names}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every testdata table as a temp view for spark.sql() use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
