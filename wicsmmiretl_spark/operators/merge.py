"""CDC merge (upsert) over immutable columnar snapshots.

The reference pipeline re-runs stages over a mutable pandas frame in place
(wikicaps_etl_pipeline.py's per-stage dataframe rewrites); at 100 TB the
equivalent primitive is MERGE: fold a (small) change-set into a (huge)
snapshot and write the next snapshot. Spark-first shape:

* ONE full-outer shuffle join on the key — no driver-side collect, no
  per-row Python. With both sides bucketed on the key (sources/io.py
  bucketed sink) the shuffle disappears entirely.
* Source-wins semantics use an explicit presence marker, not coalesce —
  MERGE must let the source set a column to NULL.
* Pair with sources/io.py:overwrite_partitions to rewrite only the
  partitions the change-set touches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MARK = "__src_present__"


def merge_upsert(target: DataFrame, source: DataFrame, key_cols: list[str]) -> DataFrame:
    """SCD Type-1 MERGE: rows matched on ``key_cols`` take ALL source
    values; unmatched source rows are inserted; unmatched target rows pass
    through. Both frames must share the target's schema.

    Returns the next snapshot with the target's column order.
    """
    t_cols = target.columns
    if set(source.columns) != set(t_cols):
        raise ValueError(
            f"merge_upsert: schema mismatch target={sorted(t_cols)} source={sorted(source.columns)}"
        )
    missing = [k for k in key_cols if k not in t_cols]
    if missing:
        raise ValueError(f"merge_upsert: key columns {missing} not in schema")

    # Alias both sides: the change-set is routinely DERIVED from the target
    # scan (filter + recompute), which trips Spark's ambiguous-self-join
    # detection if columns are referenced by the parent frames.
    tgt = target.alias("__mt__")
    src = source.withColumn(_MARK, F.lit(True)).alias("__ms__")
    cond = [F.col(f"__mt__.{k}").eqNullSafe(F.col(f"__ms__.{k}")) for k in key_cols]
    joined = tgt.join(src, cond, "full_outer")
    out = []
    for c in t_cols:
        s, t = F.col(f"__ms__.{c}"), F.col(f"__mt__.{c}")
        if c in key_cols:
            out.append(F.coalesce(s, t).alias(c))
        else:
            out.append(F.when(F.col(f"__ms__.{_MARK}").isNotNull(), s).otherwise(t).alias(c))
    return joined.select(*out)
