"""Interleaved A/B of the loop-scoped AQE guard on named suite queries.

The 28-query probe takes scatter with JVM warm-in and run order (BENCH_NOTES
r13/r14), so a scoped-vs-unscoped comparison across two probe SESSIONS
confounds the guard with everything else. This probe flips the
``SPARK_GRAFT_LOOP_AQE`` knob INSIDE one session (the guard reads it at loop
entry), warming both modes first, then interleaving A/B/A/B reps per query —
the fine_init_probe protocol. Prints one JSON line per query with per-mode
rep lists and mins.

Usage: python tools/loop_aqe_ab.py [--reps N] q1 q2 ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from wicsmmiretl_spark.session import get_spark  # noqa: E402
from wicsmmiretl_spark.suite import QUERIES  # noqa: E402


def run_once(spark, fn, sf_dir: str) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    unknown = [q for q in args.queries if q not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("loop_aqe_ab")
    spark.sparkContext.setLogLevel("ERROR")

    QUERIES["vocab_top100"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    warm = spark.range(0, 64, 1, 32)
    for _ in range(3):
        warm = warm.mapInPandas(lambda it: (pdf for pdf in it), "id long")
    warm.write.format("noop").mode("overwrite").save()

    for name in args.queries:
        fn = QUERIES[name]
        # Warm BOTH modes before any timed rep (r13 warm-order-bias lesson).
        for knob in ("0", "1"):
            os.environ["SPARK_GRAFT_LOOP_AQE"] = knob
            run_once(spark, fn, sf_dir)
        reps: dict[str, list[float]] = {"aqe_off": [], "aqe_on": []}
        for _ in range(args.reps):
            for knob, key in (("0", "aqe_off"), ("1", "aqe_on")):
                os.environ["SPARK_GRAFT_LOOP_AQE"] = knob
                spark.sparkContext.setJobDescription(f"{name} {key}")
                reps[key].append(run_once(spark, fn, sf_dir))
        os.environ.pop("SPARK_GRAFT_LOOP_AQE", None)
        print(
            json.dumps(
                {
                    "query": name,
                    "aqe_off": reps["aqe_off"],
                    "aqe_on": reps["aqe_on"],
                    "min_aqe_off": min(reps["aqe_off"]),
                    "min_aqe_on": min(reps["aqe_on"]),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
