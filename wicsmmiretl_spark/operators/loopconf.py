"""Scoped session-conf guard for iterative operators (guide §1.2 step 1).

Why this exists
---------------
Every iterative operator in this package (alternating-star CC, PageRank/
PPR/HITS, k-core peeling, BFS/SSSP, LPA, the Lloyd loops) materializes a
small loop-state frame once per round — an eager ``localCheckpoint`` when
the round needs a driver-visible fixpoint probe, a lazy one otherwise.
Two session confs interact with those materializations:

* ``spark.sql.shuffle.partitions`` — without a pin, every loop-internal
  partial-agg/distinct exchange plans at the session width (32 near-empty
  reduce tasks per groupBy at bench scale, once per round). The graph
  loops therefore pin the width to the bytes-derived ``loop_partitions``
  for the loop's lifetime via :func:`set_loop_shuffle_partitions`; this
  guard snapshots and restores the session value so operators don't pair
  their own restore.
* ``spark.sql.adaptive.enabled`` — with AQE on, each materialization runs
  one Spark job per Exchange in its plan (AdaptiveSparkPlanExec
  materializes a QueryStage per shuffle before producing the RDD), so a
  loop pays O(rounds × exchanges) sequential stage-jobs. The r14 fixed-
  cost probe measured ~40-90 ms of driver overhead per such job and the
  graph queries ran 50-70 of them, which motivated scoping AQE OFF inside
  loops.

**Measured outcome (r14, interleaved same-session A/B via the knob
below): AQE-off-in-loops is a net LOSS and is therefore NOT the
default.** The per-stage-job overhead is real but smaller than the
plan-quality AQE buys back inside the rounds: checkpointed loop frames
carry no statistics, so statically-planned round joins fall back to
sort-merge where AQE's runtime size discovery converts them to
broadcasts (Lloyd-loop ops lost 11-25%, connected_components ~20%,
HITS/PageRank parity; label_propagation and kcore had already measured
40-55% round slowdowns without AQE). What DID win — independently of the
AQE toggle — is the rest of the r14 loop discipline: the bytes-derived
pinned loop width, fixpoint counts riding materialization jobs as
Observations instead of separate actions, lazy checkpoints wherever no
driver probe needs the round eagerly, and static out-degree carried in
the PageRank/PPR state (jobs per graph query dropped 57→42, 54→40,
49→39, 72→67 with AQE still on; the AQE-off variant cuts them much
further — 53→14, 72→11 — and is still slower, which is the point).

Knob: set ``SPARK_GRAFT_LOOP_AQE=0`` to re-run the A/B (scope AQE off
inside loops); default keeps the session's AQE setting untouched.

Thread-safety: the guard mutates the session conf for the duration of
the loop, exactly like the streaming harness's shuffle-partition guard
(streaming/windows.py) — concurrent *other-thread* queries planned in
the window would also plan at the loop width. The engine's entry points
run operators sequentially; document before introducing driver-side
concurrency around these loops.
"""

from __future__ import annotations

import functools
import os
from contextlib import contextmanager
from typing import Callable, Iterator, TypeVar

from pyspark.sql import DataFrame, SparkSession

T = TypeVar("T")


@contextmanager
def scoped_conf(spark: SparkSession, **confs: str) -> Iterator[None]:
    """Set session confs for the duration of the block, then restore the
    previous values (unset keys are restored by unsetting)."""
    prev: dict[str, str | None] = {}
    for key, value in confs.items():
        try:
            prev[key] = spark.conf.get(key)
        except Exception:
            prev[key] = None
        spark.conf.set(key, value)
    try:
        yield
    finally:
        for key, value in prev.items():
            if value is None:
                try:
                    spark.conf.unset(key)
                except Exception:
                    pass
            else:
                spark.conf.set(key, value)


def _loop_aqe_disabled() -> bool:
    return os.environ.get("SPARK_GRAFT_LOOP_AQE", "1") == "0"


@contextmanager
def loop_materialization_conf(spark: SparkSession) -> Iterator[None]:
    """Conf scope for an iterative operator's loop.

    ``spark.sql.shuffle.partitions`` is snapshotted and restored on exit:
    loop bodies are allowed to call :func:`set_loop_shuffle_partitions`
    once they know their data-derived loop width, without pairing their
    own restore.

    AQE is left at the session setting by default — the measured r14
    outcome (module docstring); ``SPARK_GRAFT_LOOP_AQE=0`` scopes it off
    for the loop's materializations to re-run that A/B."""
    keys = {"spark.sql.shuffle.partitions": spark.conf.get("spark.sql.shuffle.partitions")}
    if _loop_aqe_disabled():
        keys["spark.sql.adaptive.enabled"] = "false"
    with scoped_conf(spark, **keys):
        yield


def set_loop_shuffle_partitions(spark: SparkSession, parts: int) -> None:
    """Pin the partial-agg/distinct exchange width inside a loop to the
    loop's own data-derived partitioning (``loop_partitions``). Only valid
    inside :func:`loop_materialization_conf` (or ``@loop_scoped``), which
    restores the session value on exit. The session-default width is a
    fixed cost per loop round — 32 near-empty reduce tasks per groupBy at
    bench scale (AQE coalesces their read side but still schedules the
    map side wide); with this, every loop exchange matches the explicit
    ``repartition(loop_parts, key)`` width."""
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))


def loop_partitions(
    n_rows: int,
    bytes_per_row: int,
    session_parts: int,
    target_bytes: int = 64 << 20,
) -> int:
    """Loop shuffle width from estimated DATA VOLUME (guide §2.2: shuffle
    partitions in the ~hundred-MB range), capped at the session width.

    The r8-r13 row-count sizing (``rows // 65_536 + 1``) produced ~1-2 MB
    partitions for long-pair edge lists — two orders of magnitude under
    the guide's floor; AQE's coalescing silently repaired it at the cost
    of one stage-job per exchange. Sizing by bytes keeps single-digit
    partition counts at bench scale and grows linearly to the session cap
    at cluster scale.

    A parallelism floor of min(session_parts, 8) guards the other edge:
    loop rounds are CPU-bound (window sorts, hash dedup) long before
    their shuffle bytes reach the 64 MB target, and a width-1 round
    serializes that compute onto one core (measured r14: width-1 CC
    rounds 0.8-1.4 s vs 0.55-0.67 s at width 4-8 on the same data; width
    32 is 2.2 s — per-task overhead). The floor is inert at cluster
    scale, where the bytes term dominates.
    """
    if n_rows <= 0:
        return 1
    by_bytes = -(-n_rows * bytes_per_row // target_bytes)
    return max(1, min(session_parts, max(by_bytes, min(session_parts, 8))))


def loop_scoped(fn: Callable[..., T]) -> Callable[..., T]:
    """Run an iterative operator under :func:`loop_materialization_conf`.

    The session is taken from the first ``DataFrame`` argument. The scope
    covers the CALL only — i.e. the loop's internal materializations
    (eager checkpoints, fixpoint probes, ``df.rdd`` of lazy checkpoints)
    plan at the pinned loop width. Whatever plan tail the operator
    RETURNS un-materialized is physically planned later, at the consuming
    action, under the caller's own conf."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        df = next(
            (a for a in [*args, *kwargs.values()] if isinstance(a, DataFrame)), None
        )
        if df is None:
            return fn(*args, **kwargs)
        with loop_materialization_conf(df.sparkSession):
            return fn(*args, **kwargs)

    return wrapper
