"""Attribute one-shot bench stalls (VERDICT r12 item 4).

The identical-tree quiet canonicals spread ±7% in r12, with the p90
per-query ratio driven by a few recurring stall names
(orders_bootstrap_ci, events_json_extract, lineitem_price_benford). This
probe runs those queries in a loop at the bench scale factor and records,
per iteration, the three candidate culprits alongside the wall time:

* GC — delta of the JVM's GarbageCollectorMXBean collection time (local
  mode: driver JVM == executor JVM, so this IS the executor GC);
* page-cache miss — delta of the JVM process's actual block-device reads
  (/proc/<pid>/io read_bytes; a warm-cache iteration reads ~0);
* scheduler/VM — delta of host CPU steal + iowait ticks (/proc/stat).

A stalled iteration then self-labels: wall spike + GC spike = GC pause;
wall spike + read_bytes spike = cache eviction; wall spike + steal spike
= the VM; none of the three = scheduler jitter inside Spark itself.

Usage: SPARK_GRAFT_CPUS=32 python tools/stall_attrib.py [iters] [names...]
Prints one line per (query, iteration) and a per-query summary.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEFAULT_NAMES = [
    "orders_bootstrap_ci",
    "events_json_extract",
    "lineitem_price_benford",
]


def _jvm_gc_ms(spark) -> float:
    beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    return float(sum(b.getCollectionTime() for b in beans))


def _proc_read_bytes() -> int:
    # The JVM is a child of this Python process in local mode via py4j;
    # include the whole process tree by summing our direct children.
    total = 0
    me = os.getpid()
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as fh:
                ppid = int(fh.read().split(")")[-1].split()[1])
            if ppid != me and int(pid) != me:
                continue
            with open(f"/proc/{pid}/io") as fh:
                for line in fh:
                    if line.startswith("read_bytes:"):
                        total += int(line.split()[1])
        except (OSError, ValueError):
            continue
    return total


def _steal_iowait_ticks() -> int:
    with open("/proc/stat") as fh:
        parts = fh.readline().split()
    # proc(5) cpu line: user nice system idle iowait irq softirq steal
    # guest guest_nice — steal is field 8 (parts[8]), NOT 9 (that's
    # guest, always 0 inside a KVM guest).
    iowait = int(parts[5]) if len(parts) > 5 else 0
    steal = int(parts[8]) if len(parts) > 8 else 0
    return steal + iowait


def main() -> None:
    from wicsmmiretl_spark.session import get_spark
    from wicsmmiretl_spark.suite import QUERIES

    args = sys.argv[1:]
    iters = 10
    if args and args[0].isdigit():
        iters = int(args[0])
        args = args[1:]
    stray = [a for a in args if a.isdigit()]
    if stray:
        raise SystemExit(
            f"numeric args {stray} after the first position — iters must "
            "come first: stall_attrib.py [iters] [names...]"
        )
    names = args or DEFAULT_NAMES
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark("stall_attrib")
    spark.sparkContext.setLogLevel("ERROR")
    for n in names:  # warm: plans compiled, files footed, workers spawned
        QUERIES[n](spark, sf_dir).write.format("noop").mode("overwrite").save()

    rows: dict[str, list[tuple[float, float, float, float]]] = {n: [] for n in names}
    print("query,iter,wall_s,gc_ms,read_mb,steal_iowait_ticks")
    for i in range(iters):
        for n in names:
            gc0, rb0, st0 = _jvm_gc_ms(spark), _proc_read_bytes(), _steal_iowait_ticks()
            t0 = time.perf_counter()
            QUERIES[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            gc = _jvm_gc_ms(spark) - gc0
            rb = (_proc_read_bytes() - rb0) / 1e6
            st = _steal_iowait_ticks() - st0
            rows[n].append((wall, gc, rb, st))
            print(f"{n},{i},{wall:.3f},{gc:.0f},{rb:.1f},{st}")
    print("\nsummary (median | max, with the max iteration's co-movers):")
    for n, rs in rows.items():
        walls = sorted(r[0] for r in rs)
        med = walls[len(walls) // 2]
        worst = max(rs, key=lambda r: r[0])
        print(
            f"{n:28s} wall {med:.2f}|{worst[0]:.2f}s  "
            f"gc@max {worst[1]:.0f}ms  read@max {worst[2]:.1f}MB  "
            f"steal+iowait@max {worst[3]}"
        )


if __name__ == "__main__":
    main()
