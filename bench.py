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


def _quiet_wait(
    threshold: float,
    max_wait_s: float,
    poll_s: float = 10.0,
    load1=None,
    sleep=None,
    clock=None,
    load5_threshold: float | None = None,
    load5=None,
) -> tuple[float, bool]:
    """Bounded wait for a quiet host (VERDICT r12 item 3): poll the 1-minute
    loadavg until it drops below ``threshold`` or ``max_wait_s`` elapses.
    Returns ``(waited_seconds, exhausted)`` — ``exhausted`` means the
    deadline passed with the host still loaded, which the caller stamps
    into the artifact so a hot-host take is self-labelling instead of a
    phantom regression (the r11/r12 driver artifacts both landed at
    load1 > 5 and each cost an adjudication).

    ``load5_threshold`` additionally requires the 5-minute loadavg below
    it: measured r13, a run started the instant load1 dipped under 1.0 —
    while load5 was still draining from a heavy predecessor — came back
    systemically 1.24× inflated (BENCH_FULL_r13.1 vs .2), so "load1 just
    crossed the knee" is not yet quiet. ``load1``/``load5``/``sleep``/
    ``clock`` are injectable for the contract test."""
    load1 = load1 or (lambda: os.getloadavg()[0])
    load5 = load5 or (lambda: os.getloadavg()[1])
    sleep = sleep or time.sleep
    clock = clock or time.monotonic

    def quiet() -> bool:
        if load1() >= threshold:
            return False
        return load5_threshold is None or load5() < load5_threshold

    t0 = clock()
    while not quiet():
        waited = clock() - t0
        if waited >= max_wait_s:
            return round(waited, 1), True
        print(
            f"quiet-wait: load1={load1():.2f}/load5={load5():.2f} vs "
            f"{threshold}/{load5_threshold} ({waited:.0f}s/{max_wait_s:.0f}s)",
            file=sys.stderr,
        )
        sleep(min(poll_s, max_wait_s - waited))
    return round(clock() - t0, 1), False


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    # Host-load telemetry (VERDICT r7 item 2): the r7 driver artifact was
    # ~1.6× inflated by external load and cost a full judge re-run to
    # adjudicate. Record loadavg at start/end on stderr AND stamp the start
    # 1-minute value into the metric line so any reader can discount a
    # loaded-host artifact without re-running. local[32] on an idle host
    # shows start load well under ~4; a start load of 8+ means another
    # tenant is eating cores and every wall-clock below is suspect.
    load_arrival = os.getloadavg()
    print(f"loadavg_arrival: {load_arrival}", file=sys.stderr)

    # Quiet-host gate (VERDICT r12 item 3): two rounds running, the
    # driver-facing artifact landed at load1 > 5 and read as a phantom
    # 40% regression until quiet takes adjudicated it. Wait (bounded) for
    # the co-tenant load to drain before the timed loop; if the wait
    # exhausts, proceed anyway and stamp quiet_wait_exhausted so the
    # artifact carries its own discount label. Knobs:
    # SPARK_GRAFT_QUIET_LOAD1 (threshold, default 1.0; <= 0 disables),
    # SPARK_GRAFT_QUIET_LOAD5 (5-min threshold, default 4.0; <= 0 drops
    # the load5 condition) and SPARK_GRAFT_QUIET_WAIT_MAX (seconds,
    # default 600; 0 disables).
    quiet_thr = float(os.environ.get("SPARK_GRAFT_QUIET_LOAD1", "1.0"))
    quiet_thr5 = float(os.environ.get("SPARK_GRAFT_QUIET_LOAD5", "4.0"))
    quiet_max = float(os.environ.get("SPARK_GRAFT_QUIET_WAIT_MAX", "600"))
    quiet_wait_s, quiet_exhausted = 0.0, False
    # Each threshold disables independently (<= 0); the gate runs while
    # EITHER condition is armed, so load5-only gating works as the README
    # documents (a disabled load1 becomes a vacuous +inf condition).
    if quiet_max > 0 and (quiet_thr > 0 or quiet_thr5 > 0):
        quiet_wait_s, quiet_exhausted = _quiet_wait(
            quiet_thr if quiet_thr > 0 else float("inf"),
            quiet_max,
            load5_threshold=quiet_thr5 if quiet_thr5 > 0 else None,
        )
        if quiet_wait_s:
            print(
                f"quiet-wait: {quiet_wait_s}s"
                + (" (exhausted — proceeding on a loaded host)" if quiet_exhausted else ""),
                file=sys.stderr,
            )

    load_start = os.getloadavg()
    print(f"loadavg_start: {load_start}", file=sys.stderr)

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
    # Per-query fault isolation: one broken query must degrade the artifact,
    # not vanish it (r5: a single AnalysisException in tumbling_daily aborted
    # the run -> BENCH_r05.json rc=1, zero timings for 66 healthy queries).
    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, fn in QUERIES.items():
        best = float("inf")
        try:
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            times[name] = round(best, 3)
        except Exception as exc:  # noqa: BLE001 — record and keep benching
            msg = f"{type(exc).__name__}: {exc}"
            errors[name] = msg[:200]
            print(f"bench error in {name}: {msg}", file=sys.stderr)
            # A transient failure on run 2 (flaky host, spilled executor)
            # must not discard run 1's valid measurement: keep the finite
            # best alongside the error record.
            if best != float("inf"):
                times[name] = round(best, 3)

    total = round(sum(times.values()), 3)
    load_end = os.getloadavg()
    print(f"loadavg_end: {load_end}", file=sys.stderr)

    # Full per-query record (VERDICT r9 item 3): the driver metric line
    # keeps only the slowest ~64 timings, so cross-round comparison was
    # degrading to whichever noise outliers made each cut. Persist EVERY
    # timing to BENCH_FULL_r{N}.json (N = next round: latest driver
    # artifact + 1) so round notes can compute common subsets over the
    # whole suite. Local evidence file only — never on stdout.
    # SPARK_GRAFT_FULL_OUT overrides the destination (tests point it at a
    # tmp dir so contract runs don't shadow real round evidence); set it
    # empty to disable the write.
    #
    # The prior-round lookup MUST happen before this write: globbing after
    # it would return the file this run just produced and every ratio
    # below would compare the run to itself (all 1.0, regressions dead).
    prev = _latest_prior_bench(sf)
    try:
        override = os.environ.get("SPARK_GRAFT_FULL_OUT")
        if override == "":
            raise OSError("full-timings write disabled by SPARK_GRAFT_FULL_OUT=")
        # With an override, the destination moves but the round number is
        # still derived from the repo root's BENCH_r*.json — an override
        # pointed at an empty archive dir must not restart numbering at r1
        # (ADVICE r10).
        full_path = (
            _next_full_bench_path(Path(override), round_root=Path(__file__).resolve().parent)
            if override
            else _next_full_bench_path()
        )
        full_path.write_text(
            json.dumps(
                {
                    "sf": sf,
                    "total_seconds": total,
                    "n_queries": len(times),
                    "cpus": int(os.environ["SPARK_GRAFT_CPUS"])
                    if os.environ.get("SPARK_GRAFT_CPUS", "").isdigit()
                    else os.cpu_count(),
                    "load1_arrival": round(load_arrival[0], 2),
                    "load1_start": round(load_start[0], 2),
                    "load1_end": round(load_end[0], 2),
                    "quiet_wait_s": quiet_wait_s,
                    "quiet_wait_exhausted": quiet_exhausted,
                    "queries": times,
                    "errors": errors,
                },
                indent=1,
                sort_keys=True,
            )
            + "\n"
        )
        print(f"full timings: {full_path}", file=sys.stderr)
    except OSError as exc:
        print(f"could not write full timings: {exc}", file=sys.stderr)

    # Round-over-round diagnostics go to STDERR only: the driver keeps just
    # the last 2000 chars of stdout, and embedding ratios in the metric line
    # made it unparseable in r3 (BENCH_r03.json parsed: null).
    if prev:
        ratios = {
            name: round(t / prev[name], 2)
            for name, t in times.items()
            if prev.get(name)
        }
        flagged = {n: r for n, r in ratios.items() if r >= 1.5}
        print("ratio_vs_prev: " + json.dumps(ratios), file=sys.stderr)
        if flagged:
            print("regressions: " + json.dumps(flagged), file=sys.stderr)

    # Contract line: LAST on stdout, compact, and guaranteed to fit in the
    # driver's 2000-char tail window. Degrade per-query precision (3 -> 2 -> 1
    # decimals), then keep only the SLOWEST queries that fit (with a
    # queries_omitted count) — never drop the whole dict: at 75+ queries the
    # 1-decimal line can cross the cap and an empty dict loses every
    # per-query number the round records.
    def _line(q: dict, omitted: int, err_n: int) -> str:
        out = {
            "metric": "suite_total_seconds",
            "value": total,
            "unit": "sec",
            "queries": q,
            "sf": sf,
            # 1-min loadavg at bench start — external load pre-existing the
            # run. A value near 0 certifies a quiet host; >> 0 flags an
            # artifact inflated by co-tenant load (see r7: 203 s vs 123 s).
            # Contract-compat confirmed r8: the driver recorded BENCH_r08
            # with this extra key present (rc 0, tail parsed), so its
            # parser tolerates unknown keys.
            "load1_start": round(load_start[0], 2),
        }
        if quiet_exhausted:
            # The bounded quiet-wait ran out with the host still loaded —
            # the artifact explicitly labels itself a hot take
            # (VERDICT r12 item 3).
            out["quiet_wait_exhausted"] = True
        if errors:
            # Truncated per-query error strings, capped at err_n entries so a
            # mass failure (every query broken) can't push the contract line
            # past the driver's tail window; full text already on stderr.
            shown = dict(sorted(errors.items())[:err_n])
            out["errors"] = {n: e[:60] for n, e in shown.items()}
            if len(errors) > err_n:
                out["errors_omitted"] = len(errors) - err_n
        if omitted:
            out["queries_omitted"] = omitted
        return json.dumps(out, separators=(",", ":"))

    # Shrink errors FIRST until the zero-query skeleton is guaranteed to fit:
    # the fallback loop below only drops queries, so an unbounded errors dict
    # would lose the line in exactly the catastrophic scenario fault isolation
    # exists for.
    err_n = len(errors)
    while err_n > 0 and len(_line({}, len(times), err_n)) >= 1500:
        err_n -= 1

    line = _line({}, len(times), err_n)
    for decimals in (3, 2, 1):
        cand = _line({n: round(t, decimals) for n, t in times.items()}, 0, err_n)
        if len(cand) < 1900:
            line = cand
            break
        print(
            f"metric line {len(cand)} chars at {decimals} decimals; shrinking",
            file=sys.stderr,
        )
    else:
        kept: dict[str, float] = {}
        for n, t in sorted(times.items(), key=lambda kv: -kv[1]):
            trial = dict(kept)
            trial[n] = round(t, 1)
            if len(_line(trial, len(times) - len(trial), err_n)) >= 1850:
                break
            kept = trial
        line = _line(kept, len(times) - len(kept), err_n)
        print(
            f"kept slowest {len(kept)}/{len(times)} queries in metric line",
            file=sys.stderr,
        )
    sys.stderr.flush()
    print(line)
    sys.stdout.flush()


def _next_full_bench_path(
    root: Path | None = None,
    round_root: Path | None = None,
    canonical: bool | None = None,
) -> Path:
    """BENCH_FULL_r{N}.json for the round currently being benched: one past
    the highest-numbered driver artifact (BENCH_r{N}.json) on disk.

    ``root`` is where the sidecar is written AND (by default) where the
    round number is scanned from; ``round_root`` splits the two so a
    redirected destination (SPARK_GRAFT_FULL_OUT) still numbers from the
    repo root's driver artifacts instead of restarting at r1 in an empty
    archive dir (ADVICE r10).

    Never clobbers an existing sidecar — a committed canonical is round
    evidence the notes cite, and a later run of the same round (a spot
    check, the driver's own bench) must not silently replace it. Further
    runs before the next driver artifact get a ``.k`` suffix
    (BENCH_FULL_r10.1.json, .2, ...); ``_latest_prior_bench`` understands
    the suffix and prefers the newest.

    ``canonical`` (VERDICT r14 item 5): the unsuffixed BENCH_FULL_r{N}
    name is reserved for a full-machine-width take — the r14 driver's
    8-core scaling re-bench ran after BENCH_r14.json existed and claimed
    BENCH_FULL_r15.json, shadowing the NEXT round's canonical name. A run
    whose $SPARK_GRAFT_CPUS differs from the host's full width is a
    scaling/side take by construction and starts at ``.1``. ``None``
    derives it from the env; pass explicitly in tests."""
    root = root or Path(__file__).resolve().parent
    latest = 0
    for p in (round_root or root).glob("BENCH_r*.json"):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", p.name)
        if m:
            latest = max(latest, int(m.group(1)))
    if canonical is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "")
        host = os.cpu_count() or 0
        canonical = not (cpus.isdigit() and host > 0 and int(cpus) != host)
    k = 0 if canonical else 1
    while True:
        suffix = "" if k == 0 else f".{k}"
        cand = root / f"BENCH_FULL_r{latest + 1}{suffix}.json"
        if not cand.exists():
            return cand
        k += 1


def _latest_prior_bench(sf: float | None, root: Path | None = None) -> dict[str, float] | None:
    """Per-query times from the highest-numbered bench record at this sf,
    preferring BENCH_FULL_r{N}.json (every query) over the driver's
    BENCH_r{N}.json metric-line tail (slowest ~64 only).

    Skips filenames whose suffix is not a round number (e.g. BENCH_rfinal)
    and priors recorded at a different scale factor, so ratio_vs_prev never
    compares across scales.
    """
    candidates = []
    for p in (root or Path(__file__).resolve().parent).glob("BENCH_*.json"):
        m = re.fullmatch(r"BENCH_(?:FULL_)?r(\d+)(?:\.(\d+))?\.json", p.name)
        if m:
            # FULL files sort ahead of the driver artifact of the same
            # round; within a round's FULL files, the highest .k rerun wins.
            candidates.append(
                (int(m.group(1)), "FULL" in p.name, int(m.group(2) or 0), p)
            )
    for _, _, _, p in sorted(candidates, reverse=True):
        try:
            doc = json.loads(p.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        parsed = doc.get("parsed") or {}
        queries = parsed.get("queries") or doc.get("queries")
        prior_sf = parsed.get("sf", doc.get("sf"))
        if not isinstance(queries, dict):
            continue
        if sf is not None and prior_sf is not None and prior_sf != sf:
            continue
        return queries
    return None


if __name__ == "__main__":
    main()
