"""Scoped session-conf guard for iterative operators (guide §1.2 step 1).

Why this exists
---------------
Every iterative operator in this package (alternating-star CC, PageRank/
PPR/HITS, k-core peeling, BFS/SSSP, LPA, the Lloyd loops) materializes a
small loop-state frame once per round — an eager ``localCheckpoint`` when
the round needs a driver-visible fixpoint probe, a lazy one otherwise.
With AQE enabled, *each materialization* (including the ``df.rdd`` call a
lazy checkpoint makes) executes the plan's shuffle stages as SEPARATE
Spark jobs: ``AdaptiveSparkPlanExec`` synchronously materializes one
QueryStage per Exchange before it will produce the RDD. A round whose
plan holds E exchanges therefore pays E+1 sequential driver round-trips
(job submit → schedule → replan) instead of 1.

Measured on this machine (tools/fixed_cost_probe.py, r14): one tiny
eager checkpoint costs ~40-90 ms of pure fixed overhead per AQE stage
job, and the graph queries run 50-70 such jobs at bench scale — their
build time is almost entirely this fixed cost (plans/r14/
opt_probe_before.jsonl: e.g. event_chain_components 9.0 s build /
0.03 s exec / 53 jobs).

What AQE buys inside these loops is nothing: every loop shuffle is
already pinned plan-locally (``repartition(loop_parts, key)`` with
``loop_parts`` derived from the data size), loop-state frames are tiny
relative to the corpus, AQE's skew-join splitting does not apply to the
co-partitioned joins and partial aggs the loops use, and the only
remaining effect — coalescing the session-width partial-agg exchanges —
saves tasks worth far less than the per-stage driver barrier it costs.
This is true at any scale: the barriers are sequential driver work, so
on a 100 TB cluster they are O(rounds × exchanges) scheduler round trips
on the critical path exactly as they are locally.

So: iterative operators scope AQE OFF around their loop (build +
materializations), restoring the caller's conf afterwards. The frames
the loop RETURNS are plain (checkpointed-RDD-backed) DataFrames; the
caller's downstream plan — and every non-loop query in the suite — still
plans with whatever conf the session carries (AQE stays on; it is the
100 TB default for one-shot query shapes).

Knob: set ``SPARK_GRAFT_LOOP_AQE=1`` to keep AQE on inside loops (e.g.
to A/B the barrier cost on a cluster); default is off-in-loops.

Thread-safety: the guard mutates the session conf for the duration of
the loop, exactly like the streaming harness's shuffle-partition guard
(streaming/windows.py) — concurrent *other-thread* queries planned in
the window would also plan non-adaptively. The engine's entry points run
operators sequentially; document before introducing driver-side
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


def _loop_aqe_enabled() -> bool:
    return os.environ.get("SPARK_GRAFT_LOOP_AQE", "0") == "1"


@contextmanager
def loop_materialization_conf(spark: SparkSession) -> Iterator[None]:
    """Conf scope for an iterative operator's loop: AQE off (one job per
    materialization instead of one per exchange — see module docstring),
    unless ``SPARK_GRAFT_LOOP_AQE=1`` opts back in.

    ``spark.sql.shuffle.partitions`` is additionally snapshotted and
    restored on exit (in BOTH modes): loop bodies are allowed to call
    :func:`set_loop_shuffle_partitions` once they know their data-derived
    loop width, without pairing their own restore."""
    keys = {"spark.sql.shuffle.partitions": spark.conf.get("spark.sql.shuffle.partitions")}
    if not _loop_aqe_enabled():
        keys["spark.sql.adaptive.enabled"] = "false"
    with scoped_conf(spark, **keys):
        yield


def set_loop_shuffle_partitions(spark: SparkSession, parts: int) -> None:
    """Pin the partial-agg/distinct exchange width inside a loop to the
    loop's own data-derived partitioning (``loop_partitions``). Only valid
    inside :func:`loop_materialization_conf` (or ``@loop_scoped``), which
    restores the session value on exit. Without AQE the session-default
    width is a fixed cost per loop round — 32 near-empty reduce tasks per
    groupBy at bench scale; with this, every loop exchange matches the
    explicit ``repartition(loop_parts, key)`` width."""
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
    (eager checkpoints, fixpoint probes, ``df.rdd`` of lazy checkpoints).
    Whatever plan tail the operator RETURNS un-materialized is physically
    planned later, at the consuming action, under the caller's own conf —
    so a returned final join/aggregate still gets AQE if the session has
    it on."""

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
