"""Steady-state session-window scaling probe (BENCH_NOTES_r12 §6).

Why this lives outside tools/scale_rehearsal.py: the rehearsal times
GRADED suite queries, and the graded `streaming_session_window` runs
COMPLETE output mode — the memory-sink oracle harness needs every
session emitted at the end. Under complete mode a steady micro-batch
cadence measures harness re-emission (every batch re-outputs ALL
sessions — quadratic in batch count), not operator state; and Spark
rejects update mode for session-window aggregations. The production
steady-state shape is APPEND mode: watermark-evicted state, each
session emitted once when finalized (the final in-watermark sessions
stay unemitted at availableNow end-of-stream — irrelevant for a timing
probe, disqualifying for the oracle harness).

So this probe measures `session_aggregate` in append mode to a noop
sink (no driver-side accumulation), under the same
SPARK_GRAFT_STREAM_STEADY=50 cadence and warm + best-of-2 timing the
rehearsal uses, 1x (sf0.1) vs a synthesized slice.

Usage (quiet host):

    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_DRIVER_MEM=24g \\
    SPARK_GRAFT_REHEARSAL_COPIES=100 SPARK_GRAFT_REHEARSAL_DIR=<slice> \\
    python tools/steady_session_probe.py

The slice dir must hold a scale_rehearsal-synthesized slice (run that
tool first, or point SPARK_GRAFT_REHEARSAL_DIR at an empty dir and let
it synthesize). r12 reading: 1x=20.05s, 100x=32.38s, exponent 0.10.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_STREAM_STEADY", "50")

from wicsmmiretl_spark import suite
from wicsmmiretl_spark.session import get_spark
from wicsmmiretl_spark.streaming.windows import read_event_stream, session_aggregate

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run(spark, sf_dir: str) -> float:
    d = suite._events_dropdir(spark, sf_dir)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        best = float("inf")
        for i in range(3):  # warm + best-of-2, the rehearsal's timing contract
            t0 = time.perf_counter()
            q = (
                session_aggregate(read_event_stream(spark, d))
                .writeStream.format("noop")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            if i:
                best = min(best, time.perf_counter() - t0)
        return best
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def main() -> None:
    slice_dir = os.environ.get("SPARK_GRAFT_REHEARSAL_DIR")
    if not slice_dir or not os.path.isdir(slice_dir):
        raise SystemExit(
            "SPARK_GRAFT_REHEARSAL_DIR must point at a scale_rehearsal-"
            "synthesized slice (events.parquet present)"
        )
    copies = int(os.environ.get("SPARK_GRAFT_REHEARSAL_COPIES", "10"))
    if copies < 2:
        # log(copies) = 0 at copies=1 — the exponent is undefined, not
        # merely noisy; reject up front (ADVICE r12).
        raise SystemExit(
            f"SPARK_GRAFT_REHEARSAL_COPIES must be >= 2 (got {copies}): "
            "the exponent normalizes by log(copies)"
        )
    marker = os.path.join(slice_dir, "COPIES")
    if os.path.isfile(marker):
        with open(marker) as fh:
            slice_copies = int(fh.read().strip())
        if slice_copies != copies:
            raise SystemExit(
                f"slice was synthesized with COPIES={slice_copies}, "
                f"SPARK_GRAFT_REHEARSAL_COPIES={copies} — set them to match"
            )
    spark = get_spark("steady_session_probe")
    spark.sparkContext.setLogLevel("ERROR")
    t1 = run(spark, BASE_SF)
    print(f"1x:  {t1:.2f}s", flush=True)
    tn = run(spark, slice_dir)
    exp = math.log(tn / t1) / math.log(copies)
    print(f"{copies}x: {tn:.2f}s ratio={tn / t1:.2f} exp={exp:.2f}", flush=True)


if __name__ == "__main__":
    main()
