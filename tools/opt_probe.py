"""Per-query cost-breakdown probe for the optimization rounds (guide §1).

For each named suite query at $SPARK_GRAFT_SF_DIR (default sf0.1), splits the
bench's wall clock into the three places it can hide:

  build_s — ``fn(spark, sf_dir)``: DataFrame construction, INCLUDING any eager
            operator-internal actions (the graph loops' per-round eager
            localCheckpoints, fixpoint counts, k-means training jobs — for
            iterative operators this is where most of the query runs);
  plan_s  — analysis + optimization + physical planning of the returned frame,
            measured on a fresh build via ``explain`` materialization (this
            cost is paid again inside every write, so it is a LOWER bound on
            the per-run fixed cost Catalyst charges the query);
  exec_s  — the noop-sink write of a fresh build (bench.py's timed action),
            which re-plans and executes;
  jobs    — Spark jobs launched across build+exec of one rep (job-group
            scoped), the count of sequential scheduling barriers.

Reps default to 3; the per-rep numbers and the min are printed as one JSON
line per query so round notes can quote them. ``--plans-dir DIR --tag TAG``
additionally writes ``DIR/<query>_<TAG>.txt`` with ``explain("formatted")``
output (the judge-facing plan evidence).

Usage:
  python tools/opt_probe.py [--reps N] [--plans-dir plans/r14 --tag before] q1 q2 ...
  python tools/opt_probe.py --top 20          # slowest-N from the latest BENCH_FULL
"""

from __future__ import annotations

import argparse
import json
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from wicsmmiretl_spark.session import get_spark  # noqa: E402
from wicsmmiretl_spark.suite import QUERIES  # noqa: E402

REPO = Path(__file__).resolve().parent.parent


def _top_from_bench(n: int) -> list[str]:
    """Slowest-n query names by median across the latest round's BENCH_FULL
    takes (falls back to the single newest file when only one take exists)."""
    import statistics

    by_round: dict[int, list[Path]] = {}
    for p in REPO.glob("BENCH_FULL_r*.json"):
        m = re.fullmatch(r"BENCH_FULL_r(\d+)(?:\.(\d+))?\.json", p.name)
        if m:
            by_round.setdefault(int(m.group(1)), []).append(p)
    if not by_round:
        raise SystemExit("no BENCH_FULL_r*.json found")
    takes = [json.loads(p.read_text())["queries"] for p in by_round[max(by_round)]]
    names = set().union(*takes)
    med = {
        q: statistics.median([t[q] for t in takes if q in t]) for q in names
    }
    return [q for q, _ in sorted(med.items(), key=lambda kv: -kv[1])[:n]]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="suite query names")
    ap.add_argument("--top", type=int, default=0, help="add slowest-N from latest BENCH_FULL")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--tag", default="before")
    args = ap.parse_args()

    names = list(args.queries)
    if args.top:
        names += [q for q in _top_from_bench(args.top) if q not in names]
    unknown = [q for q in names if q not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    if not names:
        raise SystemExit("no queries given")

    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("opt_probe")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # Warm exactly as bench.py does, so rep timings see the same JVM state.
    QUERIES["vocab_top100"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    warm = spark.range(0, 64, 1, 32)
    for _ in range(3):
        warm = warm.mapInPandas(lambda it: (pdf for pdf in it), "id long")
    warm.write.format("noop").mode("overwrite").save()

    plans_dir = Path(args.plans_dir) if args.plans_dir else None
    if plans_dir:
        plans_dir.mkdir(parents=True, exist_ok=True)

    for name in names:
        fn = QUERIES[name]
        reps = []
        jobs_per_rep = []
        for rep in range(args.reps):
            gid = f"probe_{name}_{rep}"
            sc.setJobGroup(gid, name)
            sc.setJobDescription(f"{name} build rep{rep}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            sc.setJobDescription(f"{name} exec rep{rep}")
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            sc.setJobGroup(None, None)
            reps.append((round(t1 - t0, 3), round(t2 - t1, 3)))
            try:
                jobs_per_rep.append(len(sc.statusTracker().getJobIdsForGroup(gid)))
            except Exception:
                jobs_per_rep.append(-1)
        # Planning cost, measured once on a fresh build (no execution).
        jvm = sc._jvm
        sc.setJobGroup(f"probe_{name}_plan", name)
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        plan_str = jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        t2 = time.perf_counter()
        sc.setJobGroup(None, None)
        if plans_dir:
            (plans_dir / f"{name}_{args.tag}.txt").write_text(plan_str)
        out = {
            "query": name,
            "reps": [{"build": b, "exec": e, "total": round(b + e, 3)} for b, e in reps],
            "min_total": round(min(b + e for b, e in reps), 3),
            "min_build": round(min(b for b, _ in reps), 3),
            "min_exec": round(min(e for _, e in reps), 3),
            "plan_s": round(t2 - t1, 3),
            "plan_build_s": round(t1 - t0, 3),
            "jobs": jobs_per_rep,
        }
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
