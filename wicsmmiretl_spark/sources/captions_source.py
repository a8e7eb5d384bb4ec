"""The reference's caption-list format (``id|||File:x.jpg|||caption``,
SURVEY S1 — reference ``wikicaps_etl_pipeline.py:102,110-114``) as a
first-class Spark DataSource V2, via PySpark 4's Python datasource API.

Why a datasource and not ``spark.read.csv(sep='|||')``: the CSV reader
treats the multi-char separator as a whole token but gives no control
over malformed-line policy for THIS contract (exactly three fields, id
parseable), and no way to attach the format's schema by name. As a
registered source the format becomes::

    spark.dataSource.register(CaptionListDataSource)
    df = spark.read.format("wikicaps_captions").option("path", p).load()

with a declared schema, BYTE-RANGE parallel reads (each partition seeks
to its offset and aligns to the next newline — the classic splittable
text-source recipe, so a 100 GB caption list reads on every core
without a driver-side split pass), and a strict parse that fails loudly
on contract violations instead of silently shifting columns.

Options: ``path`` (required), ``partitions`` (int, default 4),
``sep`` (default ``|||``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType


@dataclass
class _ByteRange(InputPartition):
    start: int
    end: int


class CaptionListDataSource(DataSource):
    """``format("wikicaps_captions")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "wikicaps_captions"

    def schema(self) -> str:
        return "wikicaps_id bigint, wikimedia_file string, caption string"

    def reader(self, schema: StructType) -> "CaptionListReader":
        return CaptionListReader(self.options)


class CaptionListReader(DataSourceReader):
    def __init__(self, options) -> None:
        if "path" not in options:
            raise ValueError("wikicaps_captions: 'path' option is required")
        self._path = options["path"]
        self._sep = options.get("sep", "|||")
        self._parts = int(options.get("partitions", 4))
        if self._parts < 1:
            raise ValueError(
                f"wikicaps_captions: partitions must be >= 1, got {self._parts}"
            )

    def partitions(self) -> list[_ByteRange]:
        size = os.path.getsize(self._path)
        n = max(1, min(self._parts, size))
        step = size // n
        bounds = [i * step for i in range(n)] + [size]
        return [_ByteRange(bounds[i], bounds[i + 1]) for i in range(n)]

    def read(self, partition: _ByteRange):
        sep = self._sep.encode()
        with open(self._path, "rb") as f:
            f.seek(partition.start)
            # Alignment contract: a partition owns every line that STARTS
            # strictly inside (start, end]; partition 0 also owns the first
            # line. Seeking mid-line then discarding through the first
            # newline implements exactly that — no line is read twice, none
            # is skipped, whatever the byte split.
            if partition.start > 0:
                f.readline()
            while f.tell() <= partition.end:
                line = f.readline()
                if not line:
                    break
                line = line.rstrip(b"\r\n")
                if not line:
                    continue
                parts = line.split(sep)
                if len(parts) != 3:
                    raise ValueError(
                        f"wikicaps_captions: expected 3 {self._sep!r}-separated "
                        f"fields, got {len(parts)}: {line[:120]!r}"
                    )
                yield (
                    int(parts[0]),
                    parts[1].decode("utf-8"),
                    parts[2].decode("utf-8"),
                )
