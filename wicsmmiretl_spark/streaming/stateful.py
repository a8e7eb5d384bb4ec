"""Custom stateful streaming operator via ``applyInPandasWithState``
(north star: "applyInPandasWithState for custom stateful operators").

The built-in windows (streaming/windows.py) cover tumbling/sliding/session;
this module is the template for semantics Spark's built-ins can't express —
arbitrary per-key state machines. The example operator keeps a per-user
running (count, sum, max) and emits the updated snapshot each micro-batch.

Scale notes: state lives in the state store, partitioned by the grouping
key — size is O(active keys), not O(events). The update function sees one
key per call with an iterator of that key's rows for the batch, so executor
memory is bounded by batch slice, not key history.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("mx", DoubleType()),
    ]
)


def _update(key, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        vals = pdf["value"].dropna()
        n += len(vals)
        total += float(vals.sum()) if len(vals) else 0.0
        mx = max(mx, float(vals.max())) if len(vals) else mx
    state.update((n, total, mx))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "max_value": [mx if mx != float("-inf") else None],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum, max) as an arbitrary-state operator.

    On a stream: state persists across micro-batches, one updated snapshot
    row per user per batch (output mode 'update'). On a batch DataFrame the
    same semantics degenerate to a plain groupBy — provided for the unified
    batch/stream testing pattern used across this engine.
    """
    if not events.isStreaming:
        from pyspark.sql import functions as F

        return events.groupBy("user_id").agg(
            F.count("value").alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max("value").alias("max_value"),
        )
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_DISTINCT_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_distinct_types", LongType()),
    ]
)

_DISTINCT_STATE_SCHEMA = StructType(
    [StructField("seen", ArrayType(StringType()))]
)

_DISTINCT_STATE_CAP = 100_000


def _update_distinct(key, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    for pdf in pdfs:
        seen.update(pdf["event_type"].dropna().astype(str))
    if len(seen) > _DISTINCT_STATE_CAP:
        raise ValueError(
            f"running_user_distinct: per-key distinct state exceeded "
            f"{_DISTINCT_STATE_CAP} values — this exact-set operator is for "
            "bounded domains; switch to the HLL stream fold for unbounded ones."
        )
    state.update((sorted(seen),))
    yield pd.DataFrame({"user_id": [key[0]], "n_distinct_types": [len(seen)]})


def running_user_distinct(events: DataFrame) -> DataFrame:
    """Per-user running EXACT distinct event-type count as an
    arbitrary-state operator: the streaming twin of the batch
    ``user_running_distinct_types`` windows (there, first-occurrence
    flags; here, the seen-set IS the state, persisted across
    micro-batches, one updated snapshot row per touched user per batch).

    Exact-set state is the right tool only for BOUNDED domains (event
    types, countries, product tiers — cardinalities in the hundreds); the
    state size guard raises at 100k values per key, above which the
    mergeable-sketch path (``stream_hll_registers``) is the 100 TB
    answer — this operator trades that approximation away where the
    domain allows it. On a batch DataFrame the same semantics degenerate
    to ``countDistinct`` — the unified batch/stream testing pattern.
    """
    if not events.isStreaming:
        from pyspark.sql import functions as F

        return events.groupBy("user_id").agg(
            F.count_distinct("event_type").cast("long").alias("n_distinct_types")
        )
    return events.groupBy("user_id").applyInPandasWithState(
        _update_distinct,
        outputStructType=_DISTINCT_OUT_SCHEMA,
        stateStructType=_DISTINCT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
