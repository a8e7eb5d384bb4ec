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


def running_user_distinct(events: DataFrame, state_backend: str = "builtin") -> DataFrame:
    """Per-user running EXACT distinct event-type count on a stream: the
    streaming twin of the batch ``user_running_distinct_types`` windows
    (there, first-occurrence flags; here, state persisted across
    micro-batches, one updated snapshot row per touched user per batch).

    ``state_backend='builtin'`` (default) expresses the semantics as a
    composition of Spark's own stateful operators — streaming
    ``dropDuplicates(user, type)`` feeding a stateful count — so state
    lives JVM-side in the state store (one compact key per distinct
    (user, type) pair, RocksDB-spillable) and NO row crosses into Python.
    This is the 100 TB path: the r9 rehearsal measured the Python
    seen-set form at exponent 0.83 (per-key Python invocation + array
    state round-trip scale with the key count); the built-in composition
    is the same cost family as the engine's other JVM stream aggs
    (exponent ~0.1). Per-batch emission differs from the seen-set form:
    only first-occurrence rows survive the dedup, so a user's count row
    is (re)emitted exactly when their seen-set GROWS, while the
    python_set form re-emits an unchanged snapshot for every touched
    user. The counts emitted are identical, and any final-snapshot
    reduction (max per user — monotone counts) agrees between backends;
    consumers of per-batch update traffic should expect the sparser
    emission here.

    ``state_backend='python_set'`` keeps the ``applyInPandasWithState``
    seen-set form: the template for per-key state machines Spark's
    built-ins CANNOT compose (this one they can — kept for parity tests
    and as the pattern to copy for genuinely custom state). Its state
    guard raises at 100k values per key; above bounded domains the
    mergeable-sketch path (``stream_hll_registers``) is the answer.

    On a batch DataFrame both backends degenerate to ``countDistinct`` —
    the unified batch/stream testing pattern. NULL event types never
    count (``countDistinct`` semantics) on any path — but a user whose
    types are ALL NULL still emits a count-0 row on every path (the
    builtin dedup keeps one NULL row per user rather than filtering,
    precisely so that user isn't silently dropped; ``count(event_type)``
    then skips the NULLs). No watermark is involved: an all-time exact
    distinct keeps one state entry per distinct pair by definition, on
    either backend.
    """
    if state_backend not in ("builtin", "python_set"):
        raise ValueError(
            f"running_user_distinct: unknown state_backend {state_backend!r} "
            "(expected 'builtin' or 'python_set')"
        )
    if not events.isStreaming:
        from pyspark.sql import functions as F

        return events.groupBy("user_id").agg(
            F.count_distinct("event_type").cast("long").alias("n_distinct_types")
        )
    if state_backend == "builtin":
        from pyspark.sql import functions as F

        return (
            events.dropDuplicates(["user_id", "event_type"])
            .groupBy("user_id")
            .agg(F.count("event_type").cast("long").alias("n_distinct_types"))
        )
    return events.groupBy("user_id").applyInPandasWithState(
        _update_distinct,
        outputStructType=_DISTINCT_OUT_SCHEMA,
        stateStructType=_DISTINCT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
