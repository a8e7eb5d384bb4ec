"""Micro-benchmark of the per-job / per-stage / per-checkpoint fixed costs
that dominate the iterative operators at bench scale (guide §1).

Each experiment times a tight loop of a single primitive on a tiny frame so
the measured seconds are pure fixed overhead (scheduling, AQE stage
materialization, py4j round trips), not data volume:

  noop_job        — spark.range(1) noop write (1 job, no exchange)
  agg_first       — 32-partition sum + .first()  (2-stage agg job)
  ckpt_eager      — localCheckpoint(eager=True) of a 1-partition frame
  ckpt_lazy       — localCheckpoint(eager=False) of a 1-partition frame
  ckpt_lazy_exch  — localCheckpoint(eager=False) of repartition(1, k) frame
                    (forces one AQE shuffle-stage job during toRdd)
  bcast_join      — join(F.broadcast(single_row_agg)) + noop
                    (broadcast build job + result job)
  obs_ckpt        — eager checkpoint with an Observation riding it

Prints one JSON line per experiment: {name, reps, total_s, per_rep_ms}.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Observation
from pyspark.sql import functions as F

from wicsmmiretl_spark.operators.loopconf import scoped_conf
from wicsmmiretl_spark.session import get_spark


def timed(name: str, reps: int, fn) -> None:
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {"name": name, "reps": reps, "total_s": round(dt, 3), "per_rep_ms": round(1000 * dt / reps, 1)}
        ),
        flush=True,
    )


def timed_both(spark, name: str, reps: int, fn) -> None:
    """Run the experiment with AQE on, then again with AQE scoped off —
    plans are rebuilt per rep, so the conf toggle takes effect (the same
    mechanism operators/loopconf.py uses inside the iterative loops)."""
    timed(name, reps, fn)
    with scoped_conf(spark, **{"spark.sql.adaptive.enabled": "false"}):
        timed(name + "_noaqe", reps, fn)


def main() -> None:
    spark = get_spark("fixed_cost_probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.range(1000).select(F.col("id"), (F.col("id") % 7).alias("k"))
    base1 = base.coalesce(1).localCheckpoint(eager=True)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    timed("noop_job", 20, lambda: noop(spark.range(1)))
    wide = spark.range(1000).repartition(32)
    timed_both(spark, "agg_first", 20, lambda: wide.agg(F.sum("id")).first())
    timed_both(
        spark, "ckpt_eager", 20, lambda: base1.select(F.col("id") + 1).localCheckpoint(eager=True)
    )
    timed_both(
        spark, "ckpt_lazy", 20, lambda: base1.select(F.col("id") + 1).localCheckpoint(eager=False)
    )
    timed_both(
        spark,
        "ckpt_lazy_exch",
        20,
        lambda: base1.repartition(1, "k").localCheckpoint(eager=False),
    )
    timed_both(
        spark,
        "ckpt_eager_exch",
        20,
        lambda: base1.repartition(1, "k").localCheckpoint(eager=True),
    )
    timed_both(
        spark,
        "ckpt_eager_agg2",
        20,
        lambda: base1.groupBy("k")
        .agg(F.sum("id").alias("s"))
        .groupBy()
        .agg(F.sum("s").alias("t"))
        .localCheckpoint(eager=True),
    )
    single = base1.agg(F.count("*").alias("n"))
    timed_both(spark, "bcast_join", 20, lambda: noop(base1.join(F.broadcast(single))))

    def obs_ckpt():
        obs = Observation()
        base1.select(F.col("id") + 1).observe(obs, F.count(F.lit(1)).alias("n")).localCheckpoint(
            eager=True
        )
        return obs.get["n"]

    timed_both(spark, "obs_ckpt", 20, obs_ckpt)

    # One full pagerank-shaped iteration body on tiny data, to see what a
    # real loop round costs end-to-end (lazy checkpoint incl. AQE stages).
    e = base1.select(F.col("id").alias("src"), ((F.col("id") * 7 + 1) % 1000).alias("dst"))
    e = e.repartition(1, "src").localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .repartition(1, "id")
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("src").agg(F.count("*").alias("outdeg")).repartition(1, "src").localCheckpoint(eager=False)
    n_total = nodes.agg(F.count("*").alias("n"))

    def pr_round():
        pr = nodes.join(F.broadcast(n_total)).select("id", (F.lit(1.0) / F.col("n")).alias("rank"))
        with_deg = (
            pr.join(deg, pr["id"] == deg["src"], "left")
            .select(pr["id"], "rank", "outdeg")
            .localCheckpoint(eager=False)
        )
        contrib = (
            e.join(with_deg.filter(F.col("outdeg").isNotNull()).withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.sum("rank").alias("inb"))
        )
        dangling = with_deg.filter(F.col("outdeg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dang")
        )
        (
            nodes.join(contrib, nodes["id"] == contrib["dst"], "left")
            .join(F.broadcast(n_total))
            .join(F.broadcast(dangling))
            .select(nodes["id"], F.coalesce(F.col("inb"), F.lit(0.0)).alias("rank"))
            .repartition(1, "id")
            .localCheckpoint(eager=False)
        )

    timed_both(spark, "pagerank_round", 10, pr_round)
    spark.stop()


if __name__ == "__main__":
    main()
