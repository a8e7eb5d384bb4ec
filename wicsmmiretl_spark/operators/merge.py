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

from collections.abc import Sequence

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


def merge_scd2(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    tracked_cols: list[str],
    effective_col: str,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """SCD Type-2 MERGE: fold a change-set into a versioned dimension,
    preserving history. ``dim`` carries ``valid_from``/``valid_to``
    (NULL valid_to = current version); ``updates`` carries the key, the
    tracked attributes, and ``effective_col`` (when the change takes
    effect).

    Per update row:

    * key matches a current version and any ``tracked_cols`` value differs
      (null-safe) → the current version CLOSES (valid_to = effective) and a
      new current version opens (valid_from = effective, valid_to = NULL);
    * key matches and nothing tracked changed → no-op;
    * key unmatched → brand-new current version.

    Closed historical versions always pass through untouched.

    Scale shape: historical rows are filtered out BEFORE the join (they can
    never match), so the merge is one full-outer shuffle join between the
    current slice and the (typically small) change-set, then ONE generate
    that emits 1 or 2 versions per key — no second scan of the join, no
    window. ``updates`` must be unique on the key (one change per key per
    batch — the standard CDC micro-batch contract); violations raise via a
    bounded probe, mirroring ``union_checked``.
    """
    attr_cols = [c for c in dim.columns if c not in (valid_from_col, valid_to_col)]
    missing = [c for c in (*key_cols, *tracked_cols) if c not in attr_cols]
    if missing:
        raise ValueError(f"merge_scd2: columns {missing} not in dimension attributes")
    need = set(attr_cols) | {effective_col}
    if not need <= set(updates.columns):
        raise ValueError(
            f"merge_scd2: updates missing columns {sorted(need - set(updates.columns))}"
        )
    dup = updates.groupBy(*key_cols).count().filter(F.col("count") > 1).limit(1).count()
    if dup:
        raise ValueError(f"merge_scd2: updates are not unique on key {key_cols}")

    vt_type = dim.schema[valid_to_col].dataType
    cur = dim.filter(F.col(valid_to_col).isNull()).withColumn(_MARK + "t", F.lit(True)).alias("__t__")
    hist = dim.filter(F.col(valid_to_col).isNotNull())
    src = updates.withColumn(_MARK + "s", F.lit(True)).alias("__s__")
    cond = [F.col(f"__t__.{k}").eqNullSafe(F.col(f"__s__.{k}")) for k in key_cols]
    j = cur.join(src, cond, "full_outer")

    t_here = F.col(f"__t__.{_MARK}t").isNotNull()
    s_here = F.col(f"__s__.{_MARK}s").isNotNull()
    differs = None
    for c in tracked_cols:
        d = ~F.col(f"__t__.{c}").eqNullSafe(F.col(f"__s__.{c}"))
        differs = d if differs is None else (differs | d)
    changed = t_here & s_here & differs

    def _t_version(vt):
        return F.struct(
            *[F.col(f"__t__.{c}").alias(c) for c in attr_cols],
            F.col(f"__t__.{valid_from_col}").alias(valid_from_col),
            vt.alias(valid_to_col),
        )

    # A retro-effective change (effective < the current version's
    # valid_from) would close the current version with an INVERTED interval
    # and open a new one overlapping closed history — silent corruption.
    # Fail in-plan at execution (no extra job); late-arriving corrections
    # belong in an upstream reprocessing path, not a forward-only SCD2 fold.
    # NULL effective takes the error branch too (the >= compare is NULL);
    # coalesce each message part so the raised message survives NULLs.
    vf_cur = F.col(f"__t__.{valid_from_col}")
    checked_eff = F.when(
        F.col(f"__s__.{effective_col}") >= vf_cur, F.col(f"__s__.{effective_col}")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("merge_scd2: effective timestamp "),
                F.coalesce(F.col(f"__s__.{effective_col}").cast("string"), F.lit("NULL")),
                F.lit(" precedes the current version's valid_from "),
                F.coalesce(vf_cur.cast("string"), F.lit("NULL")),
                F.lit(" (NULL effective is rejected on changed keys)"),
            )
        ).cast(dim.schema[valid_from_col].dataType)
    )

    s_new = F.struct(
        *[F.col(f"__s__.{c}").alias(c) for c in attr_cols],
        F.col(f"__s__.{effective_col}").alias(valid_from_col),
        F.lit(None).cast(vt_type).alias(valid_to_col),
    )
    versions = (
        F.when(changed, F.array(_t_version(checked_eff), s_new))
        .when(s_here & ~t_here, F.array(s_new))
        .otherwise(F.array(_t_version(F.lit(None).cast(vt_type))))
    )
    merged = j.select(F.explode(versions).alias("__v__")).select("__v__.*")
    return merged.unionByName(hist.select(*merged.columns))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Change-data generation: diff two immutable snapshots into the
    change-set that transforms ``old`` into ``new`` — the inverse of
    ``merge_upsert`` and the feed for downstream incremental consumers
    (CDC without a transaction log; the Delta/Iceberg "change data feed"
    shape, derived rather than recorded).

    One full-outer null-safe join on the key. Per key:

    * in ``new`` only → ``insert``;
    * in ``old`` only → ``delete``;
    * in both with any ``compare_cols`` value differing (null-safe) →
      ``update`` with the differing column names; unchanged keys emit
      NOTHING (at 100 TB almost every key is unchanged — the filter is
      what makes the diff consumable).

    Scale shape: ONE co-partitioned shuffle join, no driver traffic, no
    window. With snapshots bucketed on the key the exchange disappears; at
    very wide schemas, persist a 64-bit row-hash column at write time and
    compare that first, evaluating per-column differences only on the
    mismatching minority (same output, ~1 column of compare I/O per side).

    Output: key columns (old's types), change_type string, changed_cols
    array<string> (alphabetical; empty for insert/delete).
    """
    for side, df in (("old", old), ("new", new)):
        missing = [k for k in key_cols if k not in df.columns]
        if missing:
            raise ValueError(f"snapshot_diff: key columns {missing} not in {side} snapshot")
    if compare_cols is None:
        compare_cols = sorted(
            (set(old.columns) & set(new.columns)) - set(key_cols)
        )
    else:
        compare_cols = sorted(compare_cols)
        for side, df in (("old", old), ("new", new)):
            missing = [c for c in compare_cols if c not in df.columns]
            if missing:
                raise ValueError(f"snapshot_diff: compare columns {missing} not in {side} snapshot")
    o = old.withColumn(_MARK + "o", F.lit(True)).alias("__o__")
    n = new.withColumn(_MARK + "n", F.lit(True)).alias("__n__")
    cond = [F.col(f"__o__.{k}").eqNullSafe(F.col(f"__n__.{k}")) for k in key_cols]
    j = o.join(n, cond, "full_outer")
    o_here = F.col(f"__o__.{_MARK}o").isNotNull()
    n_here = F.col(f"__n__.{_MARK}n").isNotNull()
    diffs = [
        (c, ~F.col(f"__o__.{c}").eqNullSafe(F.col(f"__n__.{c}"))) for c in compare_cols
    ]
    any_diff = None
    for _, d in diffs:
        any_diff = d if any_diff is None else (any_diff | d)
    change = (
        F.when(n_here & ~o_here, F.lit("insert"))
        .when(o_here & ~n_here, F.lit("delete"))
        .when(any_diff if any_diff is not None else F.lit(False), F.lit("update"))
    )
    changed_cols = F.when(
        change == "update",
        F.filter(
            F.array(*[F.when(d, F.lit(c)) for c, d in diffs]),
            lambda x: x.isNotNull(),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        j.select(
            *[F.coalesce(F.col(f"__n__.{k}"), F.col(f"__o__.{k}")).alias(k) for k in key_cols],
            change.alias("change_type"),
            changed_cols.alias("changed_cols"),
        )
        .filter(F.col("change_type").isNotNull())
    )


def point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    key_cols: list[str],
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """Point-in-time (as-of-validity) lookup: attach to every fact row the
    dimension version whose ``[valid_from, valid_to)`` interval contains
    the fact's timestamp — the feature-store join that prevents label
    leakage in training pipelines (a fact must only ever see attribute
    values that were current WHEN IT HAPPENED, never later restatements).

    Contract: versions per key are non-overlapping half-open intervals
    (the shape ``merge_scd2`` emits; an open current version has NULL
    ``valid_to``), so at most one dimension row matches each fact and the
    output cardinality is exactly ``facts``' (for ``how='left'``; facts
    before any version carry NULL attributes).

    Scale shape: this is an EQUI-join on the business key — the validity
    range lands in the join condition, evaluated post-match, so Catalyst
    plans an ordinary hash/sort-merge join shuffled on the key (or a
    broadcast when the dimension is small), never a theta-join cross
    product. Version count per key is bounded by update frequency, not
    corpus size, so the per-key match loop is O(versions) — the 100 TB
    fact side streams through unexpanded.

    Validity bounds compare as the dimension stores them; mixed types are
    the caller's responsibility (the suite pins ISO-8601 date strings,
    which compare lexicographically = chronologically).
    """
    if how not in ("left", "inner"):
        raise ValueError(f"point_in_time_join: how must be left|inner, got {how!r}")
    for c in key_cols + [ts_col]:
        if c not in facts.columns:
            raise ValueError(f"point_in_time_join: column {c!r} not in facts {facts.columns}")
    for c in key_cols + [valid_from, valid_to]:
        if c not in dim.columns:
            raise ValueError(f"point_in_time_join: column {c!r} not in dim {dim.columns}")
    cond = None
    for k in key_cols:
        eq = facts[k] == dim[k]
        cond = eq if cond is None else cond & eq
    cond = (
        cond
        & (facts[ts_col] >= dim[valid_from])
        & (dim[valid_to].isNull() | (facts[ts_col] < dim[valid_to]))
    )
    dim_payload = [c for c in dim.columns if c not in key_cols]
    return facts.join(dim, cond, how).select(
        *[facts[c] for c in facts.columns], *[dim[c] for c in dim_payload]
    )


def apply_cdc(
    target: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply a CDC change batch (insert/update/delete, latest-wins) to a
    snapshot — the batch form of a Debezium/binlog consumer, and the piece
    ``merge_upsert`` (SCD1, no deletes) deliberately leaves out.

    ``changes`` carries the target's columns plus ``seq_col`` (the change
    order — log offset / LSN; MUST be unique per key, the standard CDC
    contract) and ``op_col`` (delete rows are identified by
    ``delete_op``; any other marker means upsert, so producers can send
    'I'/'U'/'c'/'u' unchanged). Within the batch only each key's LATEST
    change applies: an update superseded by a delete deletes; a delete
    superseded by a re-insert survives. Deletes of absent keys are no-ops.

    Plan shape: latest-per-key is a grouped ``max(struct(seq, ...))`` —
    partial-aggregated map-side, so a hot key's change storm collapses
    BEFORE the shuffle (a window rank would shuffle every change row).
    Then one full-outer null-safe key join against the snapshot — the same
    single shuffle ``merge_upsert`` pays.

    Returns the next snapshot in the target's column order.
    """
    t_cols = target.columns
    expected = set(t_cols) | {seq_col, op_col}
    if set(changes.columns) != expected:
        raise ValueError(
            f"apply_cdc: changes columns {sorted(changes.columns)} != target+seq+op {sorted(expected)}"
        )
    missing = [k for k in key_cols if k not in t_cols]
    if missing:
        raise ValueError(f"apply_cdc: key columns {missing} not in target schema")
    if seq_col in t_cols or op_col in t_cols:
        raise ValueError(f"apply_cdc: {seq_col!r}/{op_col!r} must not collide with target columns")

    payload = [c for c in changes.columns if c not in key_cols and c != seq_col]
    pick = F.struct(F.col(seq_col), *[F.col(c) for c in payload])
    latest = (
        changes.groupBy(*key_cols)
        .agg(F.max(pick).alias("_s"))
        .select(*key_cols, *[F.col(f"_s.{c}").alias(c) for c in payload])
    )

    tgt = target.alias("__ct__")
    src = latest.withColumn(_MARK, F.lit(True)).alias("__cs__")
    cond = [F.col(f"__ct__.{k}").eqNullSafe(F.col(f"__cs__.{k}")) for k in key_cols]
    joined = tgt.join(src, cond, "full_outer")
    is_change = F.col(f"__cs__.{_MARK}").isNotNull()
    is_delete = is_change & (F.col(f"__cs__.{op_col}") == delete_op)
    out = []
    for c in t_cols:
        s, t = F.col(f"__cs__.{c}"), F.col(f"__ct__.{c}")
        if c in key_cols:
            out.append(F.coalesce(s, t).alias(c))
        else:
            out.append(F.when(is_change, s).otherwise(t).alias(c))
    return joined.filter(~is_delete).select(*out)


def golden_record(
    records: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Survivorship resolution (the MDM "golden record"): collapse
    conflicting duplicate records of one entity into a single row where
    each attribute independently takes its LATEST NON-NULL observation
    by ``seq_col`` — the standard per-field last-write-wins rule after
    entity resolution has clustered the duplicates (this is the
    consume-side of ``dup_clusters``/``part_entity_resolution``).

    Per field: ``max(struct(seq, value))`` over rows where the value is
    non-null — one partial-aggregated hash agg for ALL fields at once,
    one shuffle on the entity key, no window and no per-field passes.
    ``seq_col`` must order observations totally per entity (ties resolve
    by the struct's value comparison — deterministic but arbitrary; feed
    a unique sequence for full control).

    Output: key_cols..., n_versions bigint, then one column per
    value_col carrying the surviving value (NULL only if every
    observation was NULL).
    """
    keys = list(key_cols)
    vals = list(value_cols)
    if not keys or not vals:
        raise ValueError("golden_record: key_cols and value_cols must be non-empty")
    for c in [*keys, seq_col, *vals]:
        if c not in records.columns:
            raise ValueError(f"golden_record: column {c!r} not in {records.columns}")
    aggs = [F.count(F.lit(1)).cast("long").alias("n_versions")]
    for c in vals:
        picked = F.max(
            F.when(
                F.col(c).isNotNull(),
                F.struct(F.col(seq_col).alias("s"), F.col(c).alias("v")),
            )
        )
        aggs.append(picked["v"].alias(c))
    return records.groupBy(*keys).agg(*aggs)
