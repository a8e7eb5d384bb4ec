"""Custom Python DataSource for the reference caption-list format
(sources/captions_source.py): byte-range alignment (no line read twice or
skipped at any split), parse strictness, and option validation."""

from __future__ import annotations

import pytest

from wicsmmiretl_spark.sources.captions_source import CaptionListDataSource


@pytest.fixture(scope="module")
def caption_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("caps") / "captions.txt"
    lines = [
        f"{i}|||File:img_{i}.jpg|||caption text number {i} with words"
        for i in range(200)
    ]
    p.write_text("\n".join(lines) + "\n", encoding="utf-8")
    return str(p)


def _read(spark, path, partitions):
    spark.dataSource.register(CaptionListDataSource)
    return (
        spark.read.format("wikicaps_captions")
        .option("path", path)
        .option("partitions", partitions)
        .load()
    )


def test_schema_and_content(spark, caption_file):
    df = _read(spark, caption_file, 1)
    assert df.schema.simpleString() == (
        "struct<wikicaps_id:bigint,wikimedia_file:string,caption:string>"
    )
    rows = {r.wikicaps_id: r for r in df.collect()}
    assert len(rows) == 200
    assert rows[7].wikimedia_file == "File:img_7.jpg"
    assert rows[7].caption == "caption text number 7 with words"


def test_byte_range_split_is_lossless(spark, caption_file):
    """Any partition count must yield the identical row set — the
    newline-alignment contract (no duplicates at boundaries, no skips)."""
    one = sorted(tuple(r) for r in _read(spark, caption_file, 1).collect())
    for n in (2, 5, 16, 64):
        many = sorted(tuple(r) for r in _read(spark, caption_file, n).collect())
        assert many == one, f"partitions={n} changed the row set"
    assert _read(spark, caption_file, 5).rdd.getNumPartitions() == 5


def test_malformed_line_fails_loudly(spark, tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("1|||File:a.jpg|||ok\n2|||missing-caption\n", encoding="utf-8")
    with pytest.raises(Exception, match="expected 3"):
        _read(spark, str(p), 1).collect()


def test_missing_path_option(spark, caption_file):
    spark.dataSource.register(CaptionListDataSource)
    with pytest.raises(Exception, match="path"):
        spark.read.format("wikicaps_captions").load().collect()
