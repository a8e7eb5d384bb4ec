"""Large-k probe for kmeans_two_level's distributed fine-init (VERDICT r13
item 2).

The r13 rewrite removed the last declared 100 TB ceiling — the fine-init
no longer collects ``seed_oversample·k`` vectors to the driver — but its
evidence so far is small-scale: parity/invariance pytests plus one k=800
rehearsal reading (+14% vs the legacy collect, BENCH_NOTES_r13 §1). The
regime the rewrite EXISTS for (``cell_target``-driven k ∝ n, k ≳ 10⁴
fine cells, where the old collect state was ~31 GB at k=10⁶×768d) had no
measured reading. This probe supplies it, on a synthesized 100× slice of
the sf0.1 embeddings (same re-key + perturb recipe as
tools/scale_rehearsal.py — 2 000 × 64d base → 200 000 × 64d):

* **wall A/B at k ∝ n** (``cell_target`` fixed): ``fine_init=
  "distributed"`` vs ``fine_init="collect"`` at 100× (k = 10 000) and at
  a bracketing mid-point (k = 3 000), both paths warmed FIRST and then
  timed interleaved d/c/d/c — the r13 lesson (the first naive reading
  was warm-up order bias);
* **driver-state telemetry**: Python-process ru_maxrss checkpoints
  (BOTH warms run before any checkpoint delta is attributed, and the
  collect warm is where the legacy path's Python-side seed rows —
  oversample·k Row objects — land) plus JVM driver used-heap after a
  forced GC at each phase boundary, plus the arithmetic state sizes
  (collect: oversample·k·dim·8 B; distributed: k1·dim·8 B = O(√k));
* **shuffle-fallback take** (``fine_broadcast_max_rows=1``): the
  cc-keyed shuffle join carries the real k=10⁴ workload instead of the
  lowered-knob pytest's toy rows;
* **1×→100× exponent** for the distributed path on a FIXED 1×
  denominator (cell_target pinned, so k scales 100 → 10 000 with n —
  the k ∝ n discipline semantic_dedup's ``cell_target`` applies).

``iters=1`` throughout (2 assignment passes/level): the fine-INIT is the
stage under test and it is iteration-count invariant; fewer Lloyd rounds
just shrink the shared-term noise floor around the init delta.

Usage (quiet host):

    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_DRIVER_MEM=24g \\
    SPARK_GRAFT_REHEARSAL_COPIES=100 SPARK_GRAFT_REHEARSAL_DIR=<dir> \\
    python tools/fine_init_probe.py

The dir must be empty or a previous probe slice — validated against the
scale_rehearsal ``COPIES`` marker (same file, same refusal on mismatch:
reusing a slice built with a different copy count silently mislabels the
exponent and every n/k figure) and a ``BASE_SF`` marker (hard refusal on
mismatch; warning-only when absent, e.g. a rehearsal-built full slice
that predates it). Probe-built dirs also carry an ``EMBEDDINGS_ONLY``
marker so scale_rehearsal refuses them as full-slice inputs. Prints one
JSON line per measurement and a summary table; paste into BENCH_NOTES
§(fine-init).
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from wicsmmiretl_spark.catalog import load_table  # noqa: E402
from wicsmmiretl_spark.session import get_spark  # noqa: E402

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("SPARK_GRAFT_REHEARSAL_COPIES", "100"))


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def _jvm_heap_mb(spark) -> float:
    rt = spark._jvm.java.lang.Runtime.getRuntime()
    spark._jvm.java.lang.System.gc()
    time.sleep(0.5)
    return (rt.totalMemory() - rt.freeMemory()) / (1024.0 * 1024.0)


def _synth_slice(spark, out_dir: str) -> str:
    """COPIES re-keyed, per-copy-perturbed embeddings copies — the ONE
    recipe, imported from tools/scale_rehearsal.py (r14 review finding:
    a private copy of the recipe and a weaker marker scheme let the two
    tools' slices silently diverge). Marker contract: the rehearsal's
    ``COPIES`` file (refuse on mismatch, exactly like scale_rehearsal's
    own reuse path) plus ``BASE_SF`` (refuse if the slice was built from
    a different base sf_dir)."""
    from scale_rehearsal import _scale_copies, embeddings_copy

    path = os.path.join(out_dir, "embeddings.parquet")
    copies_marker = os.path.join(out_dir, "COPIES")
    base_marker = os.path.join(out_dir, "BASE_SF")
    if os.path.exists(path):
        if not os.path.isfile(copies_marker):
            raise SystemExit(
                f"{copies_marker} missing but parquet present in {out_dir} — "
                "either a partial slice from an interrupted synthesis, or a "
                "pre-r14 probe slice (old FINE_INIT_PROBE_SLICE marker, "
                "renamed to the rehearsal's COPIES contract); delete the "
                "directory to resynthesize"
            )
        slice_copies = int(Path(copies_marker).read_text().strip())
        if slice_copies != COPIES:
            raise SystemExit(
                f"slice in {out_dir} was synthesized with COPIES="
                f"{slice_copies} but SPARK_GRAFT_REHEARSAL_COPIES={COPIES} "
                "— set them to match or resynthesize (the exponent math "
                "normalizes by log(COPIES))"
            )
        if os.path.isfile(base_marker):
            slice_base = os.path.realpath(Path(base_marker).read_text().strip())
            if slice_base != os.path.realpath(BASE_SF):
                raise SystemExit(
                    f"slice in {out_dir} was synthesized from {slice_base} "
                    f"but SPARK_GRAFT_SF_DIR={BASE_SF} — the 1x denominator "
                    "would not match the slice; resynthesize"
                )
        else:
            # A scale_rehearsal-built full slice carries COPIES but no
            # BASE_SF marker — the base cannot be validated, only assumed.
            print(
                f"WARNING: {base_marker} missing — cannot validate the "
                f"slice's base sf_dir against SPARK_GRAFT_SF_DIR={BASE_SF}; "
                "the exponent is wrong if they differ",
                file=sys.stderr,
            )
        return path
    if os.listdir(out_dir):
        raise SystemExit(
            f"SPARK_GRAFT_REHEARSAL_DIR {out_dir} is non-empty and not a "
            "previous probe slice — refusing to overwrite"
        )
    emb = load_table(spark, "embeddings", BASE_SF)
    # copies passed EXPLICITLY: scale_rehearsal's module-level COPIES
    # resolves the same env var to a different default (10 vs this
    # tool's 100) — relying on it would silently build a mislabeled
    # slice when the env var is unset (r14 review finding).
    _scale_copies(emb, embeddings_copy, copies=COPIES).repartition(32).write.mode(
        "overwrite"
    ).parquet(path)
    Path(copies_marker).write_text(f"{COPIES}\n")
    Path(base_marker).write_text(f"{BASE_SF}\n")
    # Marks this dir as NOT a full rehearsal slice — scale_rehearsal
    # refuses dirs carrying this file.
    Path(os.path.join(out_dir, "EMBEDDINGS_ONLY")).write_text("fine_init_probe\n")
    return path


def _run(spark, emb, k: int, fine_init: str, fbmr: int = 1 << 20) -> float:
    """``emb``: a factory returning the input DataFrame — the 100× slice
    as a plain parquet read (32 files, written by _synth_slice), the 1×
    base through catalog.load_table so its single small file gets the
    same small-file repartition every suite/rehearsal 1× measurement
    gets (r14 review finding: a raw read pins the 1× map stages to ONE
    task and deflates the exponent's denominator discipline)."""
    from wicsmmiretl_spark.operators.similarity import kmeans_two_level

    emb = emb()
    t0 = time.perf_counter()
    kmeans_two_level(
        emb,
        k=k,
        iters=1,
        id_col="vec_id",
        vec_col="embedding",
        fine_init=fine_init,
        fine_broadcast_max_rows=fbmr,
    ).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    out_dir = os.environ.get("SPARK_GRAFT_REHEARSAL_DIR")
    if not out_dir or not os.path.isdir(out_dir):
        raise SystemExit("SPARK_GRAFT_REHEARSAL_DIR must point at an existing dir")
    cell_target = int(os.environ.get("SPARK_GRAFT_PROBE_CELL_TARGET", "20"))
    spark = get_spark("fine_init_probe")
    big_path = _synth_slice(spark, out_dir)
    base = lambda: load_table(spark, "embeddings", BASE_SF)  # noqa: E731
    big = lambda: spark.read.parquet(big_path)  # noqa: E731

    n1 = base().count()
    n100 = big().count()
    k1x = max(8, -(-n1 // cell_target))
    k100 = -(-n100 // cell_target)
    dim = len(base().first()["embedding"])
    results: dict[str, float] = {}

    def record(key: str, secs: float) -> None:
        results[key] = round(secs, 2)
        print(json.dumps({"probe": key, "sec": results[key], "rss_mb": round(_rss_mb(), 1)}), flush=True)

    # ---- phase 0: warm both paths at 100x (JVM + page cache + codegen),
    # RSS checkpointed around each so the collect warm's Python-side bump
    # is attributable.
    rss0 = _rss_mb()
    record(f"warm_dist_k{k100}", _run(spark, big, k100, "distributed"))
    rss_after_dist = _rss_mb()
    heap_dist = _jvm_heap_mb(spark)
    record(f"warm_collect_k{k100}", _run(spark, big, k100, "collect"))
    rss_after_collect = _rss_mb()
    heap_collect = _jvm_heap_mb(spark)

    # ---- phase 1: interleaved timed A/B at k=10^4-scale (best of 2 each)
    for rep in range(2):
        record(f"dist_k{k100}_r{rep}", _run(spark, big, k100, "distributed"))
        record(f"collect_k{k100}_r{rep}", _run(spark, big, k100, "collect"))

    # ---- phase 2: bracketing mid-point (crossover hunt), interleaved
    kmid = int(os.environ.get("SPARK_GRAFT_PROBE_KMID", "3000"))
    record(f"warm_dist_k{kmid}", _run(spark, big, kmid, "distributed"))
    record(f"warm_collect_k{kmid}", _run(spark, big, kmid, "collect"))
    for rep in range(2):
        record(f"dist_k{kmid}_r{rep}", _run(spark, big, kmid, "distributed"))
        record(f"collect_k{kmid}_r{rep}", _run(spark, big, kmid, "collect"))

    # ---- phase 3: shuffle-join fallback carrying the k=10^4 workload
    record(f"warm_fallback_k{k100}", _run(spark, big, k100, "distributed", fbmr=1))
    for rep in range(2):
        record(f"fallback_k{k100}_r{rep}", _run(spark, big, k100, "distributed", fbmr=1))

    # ---- phase 4: 1x denominator for the exponent (fixed cell_target)
    record(f"warm_dist1x_k{k1x}", _run(spark, base, k1x, "distributed"))
    for rep in range(2):
        record(f"dist1x_k{k1x}_r{rep}", _run(spark, base, k1x, "distributed"))

    import math

    # "_r" included in the prefix: a bare startswith would let e.g.
    # kmid=1000 match the k=10000 keys too (r14 review finding).
    best = lambda pre: min(v for kk, v in results.items() if kk.startswith(pre + "_r"))  # noqa: E731
    t_d = best(f"dist_k{k100}")
    t_c = best(f"collect_k{k100}")
    t_f = best(f"fallback_k{k100}")
    t_dm = best(f"dist_k{kmid}")
    t_cm = best(f"collect_k{kmid}")
    t_1 = best(f"dist1x_k{k1x}")
    oversample = 4
    summary = {
        "metric": "fine_init_probe",
        "n_1x": n1,
        "n_100x": n100,
        "dim": dim,
        "cell_target": cell_target,
        "k_100x": k100,
        "k_mid": kmid,
        "k_1x": k1x,
        "best": {
            f"distributed_k{k100}": t_d,
            f"collect_k{k100}": t_c,
            f"fallback_k{k100}": t_f,
            f"distributed_k{kmid}": t_dm,
            f"collect_k{kmid}": t_cm,
            f"distributed_1x_k{k1x}": t_1,
        },
        "exponent_distributed": round(math.log(t_d / t_1) / math.log(COPIES), 2),
        "rss_mb": {
            "start": round(rss0, 1),
            "after_dist_warm": round(rss_after_dist, 1),
            "after_collect_warm": round(rss_after_collect, 1),
            "collect_python_bump": round(rss_after_collect - rss_after_dist, 1),
        },
        "jvm_heap_mb": {"after_dist": round(heap_dist, 1), "after_collect": round(heap_collect, 1)},
        "state_bytes_arith": {
            "collect_oversample_k_dim8": oversample * k100 * dim * 8,
            "distributed_coarse_sqrtk_dim8": (int(math.isqrt(k100 - 1)) + 1) * dim * 8,
        },
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
