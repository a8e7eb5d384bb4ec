"""Sources/sinks (SURVEY §2.1): multi-char-sep scan, parquet round-trip,
projected CSV sink, key-uniqueness assertion."""

from __future__ import annotations

import pytest

from wicsmmiretl_spark.sources.io import (
    assert_unique_key,
    read_caption_list,
    write_csv_projection,
    write_parquet,
)

CAPTIONS = [
    (1, "File:Brandenburg Gate.jpg", "The Brandenburg Gate at dusk. It is in Berlin."),
    (2, "File:Café.png", "A café, with unicode. Nice place!"),
    (3, "File:Plain.jpg", "plain caption no punctuation"),
]


@pytest.fixture(scope="module")
def caption_csv(tmp_path_factory):
    p = tmp_path_factory.mktemp("captions") / "wikicaps.csv"
    p.write_text("\n".join(f"{i}|||{f}|||{c}" for i, f, c in CAPTIONS), encoding="utf-8")
    return str(p)


def test_caption_list_scan(spark, caption_csv):
    df = read_caption_list(spark, caption_csv)
    rows = {r.wikicaps_id: r for r in df.collect()}
    assert len(rows) == 3
    assert rows[1].wikimedia_file == "File:Brandenburg Gate.jpg"
    assert rows[2].caption == "A café, with unicode. Nice place!"
    assert df.schema["wikicaps_id"].dataType.simpleString() == "bigint"


def test_parquet_roundtrip(spark, caption_csv, tmp_path):
    df = read_caption_list(spark, caption_csv)
    dst = str(tmp_path / "out.parquet")
    write_parquet(df, dst)
    back = spark.read.parquet(dst)
    assert sorted(r.wikicaps_id for r in back.collect()) == [1, 2, 3]


def test_csv_projection_sink(spark, caption_csv, tmp_path):
    df = read_caption_list(spark, caption_csv)
    dst = str(tmp_path / "pairs")
    write_csv_projection(df, dst, ["wikimedia_file", "caption"])
    back = spark.read.option("header", "true").csv(dst)
    assert back.columns == ["wikimedia_file", "caption"]
    assert back.count() == 3


def test_assert_unique_key(spark, caption_csv):
    df = read_caption_list(spark, caption_csv)
    assert_unique_key(df, "wikicaps_id")
    with pytest.raises(ValueError, match="duplicate keys"):
        assert_unique_key(df.unionByName(df), "wikicaps_id")


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    """Both sides bucketed on the join key → the join plan has no Exchange
    on either input (the whole point of bucketing at scale)."""
    from wicsmmiretl_spark.sources.io import write_bucketed

    from pyspark.sql import functions as F

    left = spark.range(0, 1000).withColumnRenamed("id", "k").withColumn("a", F.col("k") * 2)
    right = spark.range(0, 1000).withColumnRenamed("id", "k").withColumn("b", F.col("k") + 1)
    write_bucketed(left, "t_bleft", ["k"], 8, path=str(tmp_path / "bl"))
    write_bucketed(right, "t_bright", ["k"], 8, path=str(tmp_path / "br"))
    try:
        j = spark.table("t_bleft").join(spark.table("t_bright"), "k")
        assert j.count() == 1000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "Join" in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bleft")
        spark.sql("DROP TABLE IF EXISTS t_bright")


def test_pipeline_config_from_yaml(spark, tmp_path):
    from wicsmmiretl_spark.plans.config import PipelineConfig

    y = tmp_path / "cfg.yml"
    y.write_text(
        """
input:
  caption_list: /tmp/captions.csv
output:
  dir: /tmp/out
max_samples: 100
seed: 1312
filters:
  - column: num_tok
    min: 10
    max: 150
transformations:
  - type: resize
    max_width: 64
    max_height: 64
run:
  extract: true
  transform: true
  load: false
"""
    )
    cfg = PipelineConfig.from_yaml(str(y))
    assert cfg.max_samples == 100 and cfg.seed == 1312
    assert cfg.filters[0].column == "num_tok"
    assert cfg.run_extract and cfg.run_transform and not cfg.run_load


def test_jsonl_and_orc_roundtrip(spark, caption_csv, tmp_path):
    from wicsmmiretl_spark.sources.io import read_jsonl, read_orc, write_jsonl, write_orc

    df = read_caption_list(spark, caption_csv)
    write_jsonl(df, str(tmp_path / "j"))
    write_orc(df, str(tmp_path / "o"))
    got_j = read_jsonl(spark, str(tmp_path / "j"), schema=df.schema)
    got_o = read_orc(spark, str(tmp_path / "o"))
    want = sorted(tuple(r) for r in df.collect())
    assert sorted(tuple(r) for r in got_j.collect()) == want
    assert sorted(tuple(r) for r in got_o.collect()) == want


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Hive-partitioned parquet + a partition-column filter → the scan's
    PartitionFilters prune directories (no full-table read)."""
    from pyspark.sql import functions as F

    from wicsmmiretl_spark.catalog import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    dst = str(tmp_path / "bylang")
    docs.write.mode("overwrite").partitionBy("lang").parquet(dst)
    filtered = spark.read.parquet(dst).filter(F.col("lang") == "en")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan
    assert filtered.count() > 0


def test_dynamic_partition_overwrite_is_surgical(spark, tmp_path):
    """Re-writing one partition leaves the others untouched (idempotent
    backfill), while static overwrite would have dropped them."""
    from pyspark.sql import Row, functions as F

    from wicsmmiretl_spark.sources.io import overwrite_partitions

    dst = str(tmp_path / "days")
    full = spark.createDataFrame(
        [Row(day="d1", v=1), Row(day="d1", v=2), Row(day="d2", v=3)]
    )
    overwrite_partitions(full, dst, ["day"])
    redo = spark.createDataFrame([Row(day="d2", v=99)])
    overwrite_partitions(redo, dst, ["day"])
    got = sorted(tuple(r) for r in spark.read.parquet(dst).select("day", "v").collect())
    assert got == [("d1", 1), ("d1", 2), ("d2", 99)]


def test_read_binary_files_glob_and_size_filter(spark, tmp_path):
    from wicsmmiretl_spark.sources.io import read_binary_files

    (tmp_path / "a.png").write_bytes(b"\x89PNG" + b"x" * 100)
    (tmp_path / "b.png").write_bytes(b"\x89PNG" + b"y" * 5000)
    (tmp_path / "c.txt").write_bytes(b"not an image")
    all_pngs = read_binary_files(spark, str(tmp_path), glob="*.png")
    assert all_pngs.count() == 2
    assert set(all_pngs.columns) >= {"path", "length", "content"}
    small = read_binary_files(spark, str(tmp_path), glob="*.png", max_bytes=1000)
    rows = small.collect()
    assert len(rows) == 1 and rows[0].content.startswith(b"\x89PNG")


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    from wicsmmiretl_spark.sources.io import compact_parquet

    src = str(tmp_path / "frag")
    out = str(tmp_path / "compact")
    # fragment: 40 tiny files
    spark.range(0, 4000).repartition(40).write.parquet(src)
    import glob as g
    assert len(g.glob(src + "/*.parquet")) == 40
    n = compact_parquet(spark, src, out, target_bytes_per_file=10 * 1024 * 1024)
    assert n == 1
    assert len(g.glob(out + "/*.parquet")) == 1
    assert spark.read.parquet(out).count() == 4000


def test_events_ts_loads_as_session_timestamp(spark):
    """events.ts must normalize to TIMESTAMP whatever the parquet physical type.

    The driver's testdata generator has shipped events.ts as TIMESTAMP(NANOS)
    (read as bigint under nanosAsLong) and as timestamp[us] without
    isAdjustedToUTC (read as TIMESTAMP_NTZ). catalog.load_table must hand the
    engine a plain TIMESTAMP either way -- every downstream unix_micros()
    call, as-of join, and event-time window depends on it (r5 regression:
    7 CORRECTNESS failures from one unnormalized dtype).
    """
    from pyspark.sql import functions as F

    from wicsmmiretl_spark.catalog import load_table

    for sf in ("sf0.001", "sf0.01"):
        ev = load_table(spark, "events", f"/root/testdata/{sf}")
        assert dict(ev.dtypes)["ts"] == "timestamp", dict(ev.dtypes)
        # unix_micros is the canonical downstream consumer; it must resolve.
        n = ev.select(F.unix_micros("ts").alias("us")).where(F.col("us").isNotNull()).count()
        assert n > 0


def test_catalog_load_contract_dtypes(spark):
    """The engine's load contract for every load-bearing column: numeric
    measure columns must stay double (the exact-sum determinism discipline
    in suite.py scales doubles to micro-unit longs — a silent double ->
    decimal drift would change every hash), keys integral, event-time
    columns plain TIMESTAMP (never NTZ — the r5/r6 drift lesson,
    generalized past events.ts). If the driver regenerates testdata with
    different physical types, this test names the drift in one place."""
    from wicsmmiretl_spark.catalog import load_tables

    integral = {"int", "bigint"}
    expected = {
        "customer": {"c_custkey": integral, "c_acctbal": {"double"}},
        "orders": {"o_orderkey": integral, "o_totalprice": {"double"},
                   "o_orderdate": {"timestamp"}},
        "lineitem": {"l_quantity": {"double"}, "l_extendedprice": {"double"},
                     "l_discount": {"double"}, "l_shipdate": {"timestamp"}},
        "events": {"event_id": integral, "ts": {"timestamp"}, "value": {"double"}},
        "documents": {"doc_id": integral, "text": {"string"}, "n_chars": integral},
        "embeddings": {"vec_id": integral,
                       "embedding": {"array<float>", "array<double>"}},
    }
    tables = load_tables(spark, "/root/testdata/sf0.001", names=tuple(expected))
    drift = {}
    for tname, cols in expected.items():
        dtypes = dict(tables[tname].dtypes)
        for col, allowed in cols.items():
            if dtypes.get(col) not in allowed:
                drift[f"{tname}.{col}"] = dtypes.get(col)
    assert not drift, f"testdata dtype drift (extend catalog.load_table): {drift}"


def test_events_epoch_is_utc_even_from_non_utc_session(spark):
    """The ntz->timestamp cast must not inherit a caller session's
    non-UTC timezone (the correctness harness hands load_table a vanilla
    session): epochs must match DuckDB's naive-as-UTC epoch_us exactly."""
    import duckdb

    from pyspark.sql import functions as F

    from wicsmmiretl_spark.catalog import load_table

    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ev = load_table(spark, "events", "/root/testdata/sf0.001")
        got = ev.agg(F.min(F.unix_micros("ts"))).first()[0]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    want = duckdb.sql(
        "SELECT min(epoch_us(ts)) FROM read_parquet('/root/testdata/sf0.001/events.parquet')"
    ).fetchone()[0]
    assert got == want


def test_read_parquet_evolved_unions_additive_schemas(spark, tmp_path):
    """Files written before and after a column addition read as one frame on
    the union schema, old files yielding NULL for the new column; the plain
    reader (no mergeSchema) would pick a single file's schema instead."""
    from pyspark.sql import functions as F

    from wicsmmiretl_spark.sources.io import read_parquet_evolved

    v1 = str(tmp_path / "v1")
    v2 = str(tmp_path / "v2")
    spark.createDataFrame([(1, "a")], "id long, s string").write.parquet(v1)
    spark.createDataFrame([(2, "b", 9.5)], "id long, s string, score double").write.parquet(v2)

    df = read_parquet_evolved(spark, v1, v2)
    assert set(df.columns) == {"id", "s", "score"}
    rows = {(r.id, r.s, r.score) for r in df.collect()}
    assert rows == {(1, "a", None), (2, "b", 9.5)}
    assert df.filter(F.col("score").isNull()).count() == 1
