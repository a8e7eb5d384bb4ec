"""Benchmark harness (driver contract).

Runs every suite query at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes to completion through the noop sink — full computation,
no driver-side collect cost in the measurement.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from wicsmmiretl_spark.session import get_spark
from wicsmmiretl_spark.suite import QUERIES


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: JVM/codegen/parquet-footer costs paid outside the measurement,
    # plus one trivial mapInPandas so the Python worker pool exists before
    # the first UDF-bearing query (worker spawn is a fixed per-executor cost,
    # not query throughput).
    QUERIES["vocab_top100"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    # Three chained stages: a pipelined task holds one Python worker PER
    # mapInPandas stage, so an N-stage chain over P partitions wants N×P
    # workers — warm the deepest chain the suite uses.
    warm_df = spark.range(0, 64, 1, 32)
    for _ in range(3):
        warm_df = warm_df.mapInPandas(lambda it: (pdf for pdf in it), "id long")
    warm_df.write.format("noop").mode("overwrite").save()

    # Two runs per query, keep the fastest: run 1 pays one-time plan/codegen
    # compilation and is exposed to shared-host scheduling noise; the min is
    # the steady-state number a long-running cluster job actually sees.
    times: dict[str, float] = {}
    for name, fn in QUERIES.items():
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)

    total = round(sum(times.values()), 3)
    out = {
        "metric": "suite_total_seconds",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }
    prev = _latest_prior_bench()
    if prev:
        # Per-query this-round/prior-round ratios (>1 = slower than last
        # round) so regressions are visible per query, not only in the total.
        ratios = {
            name: round(t / prev[name], 2)
            for name, t in times.items()
            if prev.get(name)
        }
        out["ratio_vs_prev"] = ratios
        flagged = {n: r for n, r in ratios.items() if r >= 1.5}
        if flagged:
            out["regressions"] = flagged
    print(json.dumps(out))


def _latest_prior_bench() -> dict[str, float] | None:
    """Per-query times from the highest-numbered BENCH_r{N}.json, if any."""
    benches = sorted(
        Path(__file__).resolve().parent.glob("BENCH_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    if not benches:
        return None
    try:
        doc = json.loads(benches[-1].read_text())
    except (OSError, json.JSONDecodeError):
        return None
    queries = (doc.get("parsed") or {}).get("queries") or doc.get("queries")
    return queries if isinstance(queries, dict) else None


if __name__ == "__main__":
    main()
