"""Filters and predicates (SURVEY §2.2 P5-P9).

The reference's flagship filter is a both-exclusive numeric range predicate
``(x > minn) & (x < maxx)`` with defaults ``minn=-1``/``maxx=sys.maxsize``
(filters/filter_base.py:6-19), applied as a sequential AND chain with a
dropna per step (wikicaps_etl_pipeline.py:157-170).

Here each filter is a Catalyst ``Column`` expression and the whole chain is
one conjunction — Catalyst collapses it into a single predicate that is pushed
into the parquet scan, so at 100 TB the row groups that fail the range never
leave storage. The reference's post-filter ``convert_dtypes()`` repair
disappears under fixed schemas.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass
from functools import reduce
from operator import and_
from typing import Iterable, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RangeFilter:
    """Both-exclusive range predicate on a numeric column.

    Parity with ``FilterBase`` (filters/filter_base.py:6-19): strict bounds,
    ``min=-1`` / ``max=sys.maxsize`` when absent. Rows with NULL in the column
    are dropped (the reference's ``df.where(f).dropna()``).
    """

    column: str
    min: float = -1
    max: float = sys.maxsize
    name: str = ""

    def predicate(self) -> Column:
        col = F.col(self.column)
        return col.isNotNull() & (col > F.lit(self.min)) & (col < F.lit(self.max))


def filters_from_config(spec: Iterable[Mapping]) -> list[RangeFilter]:
    """Compile a config filter list (filters/__init__.py:6-24 shape).

    Each entry: ``{column: str, min?: num, max?: num, name?: str}``.
    """
    out = []
    for entry in spec:
        out.append(
            RangeFilter(
                column=entry["column"],
                min=entry.get("min", -1),
                max=entry.get("max", sys.maxsize),
                name=entry.get("name", entry["column"]),
            )
        )
    return out


def apply_filters(df: DataFrame, filters: Sequence[RangeFilter]) -> DataFrame:
    """P6: conjunctive filter chain as ONE filter node.

    The reference loops ``df = df.where(f).dropna()`` (wikicaps_etl_pipeline
    .py:157-170); a single conjunction lets Catalyst push the whole predicate
    into the scan. Missing columns raise up front (same precondition the
    reference asserts).
    """
    if not filters:
        return df
    missing = [f.column for f in filters if f.column not in df.columns]
    if missing:
        raise ValueError(f"filter columns not in schema: {missing}")
    return df.filter(reduce(and_, (f.predicate() for f in filters)))


def drop_null(df: DataFrame, column: str) -> DataFrame:
    """P7: remove rows with NULL in one column (failed downloads)."""
    return df.filter(F.col(column).isNotNull())


def clamp_max(df: DataFrame, column: str, upper: float) -> DataFrame:
    """P9: conditional value clamp, ``s.where(s <= u, u)``.

    (f30k_vs_coco_vs_wicsmmir_v2.ipynb cells 30-31.) NULL stays NULL —
    ``least`` alone would resurrect NULLs as the bound (it skips nulls), so
    guard explicitly.
    """
    col = F.col(column)
    return df.withColumn(column, F.when(col.isNull(), F.lit(None)).otherwise(F.least(col, F.lit(upper))))
