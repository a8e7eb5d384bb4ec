"""Joins (SURVEY §2.3 J1-J3 + engine surface).

The reference has no relational join — alignment is positional via the pandas
index (wikicaps_etl_pipeline.py:84-91 sorts futures results by id and assigns
a column; :203-210 filters by a positionally aligned bool mask). Spark has no
row order to lean on, so each implicit join becomes an explicit equi-join and
Catalyst picks broadcast-hash / shuffled-hash / sort-merge.

Scale notes baked in:
* ``attach`` broadcasts the small side when hinted — the J1 shape (attach a
  per-key result set to a big fact table) is broadcastable whenever the
  result set came from a bounded fan-out.
* ``asof_join`` implements the time-series as-of semantics (engine extension;
  the driver's ``events`` table is stream-shaped) via union + window
  last-value — a single shuffle on the join key, no per-row Python, instead
  of a naive theta-join that would be O(n·m) and un-shuffleable.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def attach(
    base: DataFrame,
    results: DataFrame,
    key: str | Sequence[str],
    how: str = "left",
    broadcast_results: bool = False,
) -> DataFrame:
    """J1/J2: attach computed per-key columns to a base table.

    Replaces the reference's sort_index-then-assign positional attach
    (wikicaps_etl_pipeline.py:84-91) and horizontal concat (utils.py:513-514).
    """
    right = F.broadcast(results) if broadcast_results else results
    return base.join(right, on=key, how=how)


def keep_successes(df: DataFrame, ok_keys: DataFrame, key: str = "wikicaps_id") -> DataFrame:
    """J3/P8: positional success mask → left-semi join on the key set.

    (wikicaps_etl_pipeline.py:203-210.)
    """
    return df.join(ok_keys.select(key), on=key, how="left_semi")


def drop_failures(df: DataFrame, bad_keys: DataFrame, key: str = "wikicaps_id") -> DataFrame:
    """Complement of :func:`keep_successes` — left-anti join."""
    return df.join(bad_keys.select(key), on=key, how="left_anti")


def range_join(
    left: DataFrame,
    right: DataFrame,
    condition: Column,
    how: str = "inner",
    broadcast_right: bool = True,
) -> DataFrame:
    """Theta/range join. Small right sides should be broadcast so the
    non-equi condition runs as BroadcastNestedLoopJoin instead of a cartesian
    shuffle; at scale prefer banding the range into an equi-join key first.
    """
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=condition, how=how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | Sequence[str],
    right_cols: Sequence[str] | None = None,
    tolerance: str | None = None,
    direction: str = "backward",
    tiebreak: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, the nearest right row within the same
    ``by`` group — all three pandas ``merge_asof`` directions:
    ``'backward'`` (default) takes the most recent right row with
    ``right.on <= left.on``; ``'forward'`` the earliest right row with
    ``right.on >= left.on``; ``'nearest'`` whichever of the two is closer
    in absolute distance (ties break backward, as in pandas).

    Implemented as union + window carry: tag both sides, union them, sort
    within each ``by`` partition by (on, side) and carry the last seen
    (backward) or first upcoming (forward) right ROW — a single struct of
    ``(on, *right_cols)``, so the matched values are always row-consistent
    even when some right values are NULL (a per-column carry would leak a
    non-null value from an older row). ``nearest`` computes both carries
    over the SAME partitioning and picks per row. ONE shuffle on ``by`` in
    every direction (nearest adds a second sort, not a second exchange) —
    this is the scalable plan (a naive inequality join is quadratic per
    group; DuckDB is the oracle for correctness).

    ``tolerance``: optional max distance as an INTERVAL string (e.g.
    ``'1 hour'``) — matches further away are nulled out (applied per side
    BEFORE the nearest pick, matching pandas).

    ``tiebreak``: optional right column (must be in ``right_cols``) that
    makes the match deterministic when several right rows in one ``by``
    group share the same ``on`` value: the row with the SMALLEST tiebreak
    wins, in every direction. Without it the choice among equal-``on``
    right rows is whatever the sort produced (pandas has the same caveat —
    it takes input order, which a distributed engine doesn't have).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"asof_join: direction must be backward|forward|nearest, got {direction!r}"
        )
    by_cols = [by] if isinstance(by, str) else list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in by_cols and c != on]
    if "_on" in right_cols:
        raise ValueError(
            "asof_join: right_cols may not contain '_on' — it is the carried "
            "struct's field name for the right-side on column; rename the column."
        )
    reserved = {"_r", "_side", "_r_b", "_r_f"} & (set(left.columns) | set(right.columns))
    if reserved:
        raise ValueError(
            f"asof_join: input columns {sorted(reserved)} collide with the "
            "working columns the join builds internally (union tag + carried "
            "struct per direction); rename them."
        )
    if tiebreak is not None and tiebreak not in right_cols:
        raise ValueError(
            f"asof_join: tiebreak {tiebreak!r} must be one of right_cols so it is "
            "carried with the matched row"
        )

    from pyspark.sql.types import StructField, StructType

    r_struct_type = StructType(
        [StructField("_on", right.schema[on].dataType)]
        + [StructField(c, right.schema[c].dataType) for c in right_cols]
    )
    left_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    # Build the right side with left's full schema as nulls so the union lines up.
    right_tagged = right.select(
        *[
            (F.col(c) if c in by_cols or c == on else F.lit(None).cast(left.schema[c].dataType)).alias(c)
            for c in left.columns
        ],
        F.lit(0).alias("_side"),
        F.struct(
            F.col(on).alias("_on"), *[F.col(c).alias(c) for c in right_cols]
        ).alias("_r"),
    )

    unioned = left_tagged.unionByName(right_tagged)

    def _carried(dirn: str, sfx: str):
        """Window-carried right row (one struct) for one direction, suffixed.

        The tiebreak key only discriminates among right rows at equal
        ``on`` (left rows always sort apart via ``_side``): ordered so the
        row the carry lands on — LAST in frame for backward, FIRST for
        forward — is the minimum-tiebreak row in both directions.
        """
        if dirn == "backward":
            # Right rows sort before left rows at equal timestamps => on <=.
            order = [F.col(on).asc(), F.col("_side").asc()]
            if tiebreak is not None:
                order.append(F.col("_r")[tiebreak].desc())
            w = (
                Window.partitionBy(*by_cols)
                .orderBy(*order)
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            return F.last("_r", ignorenulls=True).over(w).alias(f"_r{sfx}")
        # Left rows sort before right rows at equal timestamps, and the
        # frame looks ahead => on >= semantics.
        order = [F.col(on).asc(), F.col("_side").desc()]
        if tiebreak is not None:
            order.append(F.col("_r")[tiebreak].asc())
        w = (
            Window.partitionBy(*by_cols)
            .orderBy(*order)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        return F.first("_r", ignorenulls=True).over(w).alias(f"_r{sfx}")

    def _stale(dirn: str, sfx: str):
        if dirn == "backward":
            return F.col(f"_r{sfx}")["_on"] < F.col(on) - F.expr(f"INTERVAL {tolerance}")
        return F.col(f"_r{sfx}")["_on"] > F.col(on) + F.expr(f"INTERVAL {tolerance}")

    def _detolerated(dirn: str, sfx: str) -> Column:
        """The carried struct, nulled out entirely when beyond tolerance."""
        carried = F.col(f"_r{sfx}")
        if tolerance is None:
            return carried
        return F.when(_stale(dirn, sfx), F.lit(None).cast(r_struct_type)).otherwise(carried)

    if direction in ("backward", "forward"):
        result = (
            unioned.select(
                *unioned.columns[: len(left.columns)], F.col("_side"), _carried(direction, "")
            )
            .filter(F.col("_side") == 1)
            .withColumn("_r", _detolerated(direction, ""))
        )
        return result.select(
            *[F.col(c) for c in left.columns],
            *[F.col("_r")[c].alias(c) for c in right_cols],
        )

    # nearest: both carries over the same hash partitioning (one exchange,
    # two sorts), then a per-row pick of the closer side; equal distance
    # breaks backward like pandas.
    result = (
        unioned.select(
            *unioned.columns[: len(left.columns)],
            F.col("_side"),
            _carried("backward", "_b"),
            _carried("forward", "_f"),
        )
        .filter(F.col("_side") == 1)
        .withColumn("_r_b", _detolerated("backward", "_b"))
        .withColumn("_r_f", _detolerated("forward", "_f"))
    )
    on_b = F.col("_r_b")["_on"]
    on_f = F.col("_r_f")["_on"]
    use_backward = F.when(on_b.isNull(), F.lit(False)).otherwise(
        on_f.isNull() | (F.col(on) - on_b <= on_f - F.col(on))
    )
    picked = [
        F.when(use_backward, F.col("_r_b")[c]).otherwise(F.col("_r_f")[c]).alias(c)
        for c in right_cols
    ]
    return result.select(*[F.col(c) for c in left.columns], *picked)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salts: int = 8,
    how: str = "inner",
    hot_threshold: int | None = None,
    max_hot_keys: int = 10_000,
    cap_mode: str = "error",
) -> DataFrame:
    """Skew-mitigated equi-join, hot-key targeted (two-phase).

    Phase 1 detects hot keys with ONE partial-agg count over the left side
    (map-side combine: the shuffle carries one row per distinct key, not per
    input row) and collects only keys whose row count >= ``hot_threshold``.
    The hot set is bounded by construction — at most
    ``left_rows / hot_threshold`` keys — and additionally capped at
    ``max_hot_keys``, so the collect and the resulting IN-list literal stay
    driver-safe at any input scale. ``cap_mode`` picks what happens when
    more keys qualify than the cap:

    * ``"error"`` (default): raise — more than ``max_hot_keys`` qualifying
      keys is general load, not skew, and usually means ``hot_threshold``
      was pinned below the table's uniform per-key density;
    * ``"top"``: salt only the ``max_hot_keys`` LARGEST qualifying keys
      (deterministic TakeOrdered: count desc, key asc — one bounded
      driver collect at any scale) and join the rest plain. Salting is
      result-invisible, so the output is identical either way; ``"top"``
      degrades gracefully where ``"error"`` refuses, which is the right
      contract when the threshold is a fixed operating point over growing
      data (the 100x rehearsal found exactly that: a threshold tuned to
      exercise salting at testdata SF made EVERY key of a 100x uniform
      table "hot" and tripped the cap).

    Phase 2 is ONE conditional-salt equi-join on ``(key, _salt)`` — the
    left side is scanned once (a hot/cold branch union would scan it
    twice): hot left rows scatter across ``salts`` buckets (deterministic
    value hash — no rand(), stable under task retries) while cold rows
    keep salt 0; on the right, ONLY hot-key rows are replicated ``salts``
    times (explode), cold rows carry the single salt 0 — zero replication
    off the hot path. Result-identical to a plain join (oracle-checked by
    ``salted_supplier_volume``).

    With no hot keys the plain join is returned untouched. AQE's skew-join
    split handles moderate skew automatically; this operator is for the
    extreme case (one key = 30% of the table) where even a split partition
    straggles, or when AQE is off.

    ``hot_threshold`` default (None): ``max(1000, 2 * left_rows /
    shuffle_partitions)`` — a key that overfills ~two ideal shuffle
    partitions is a straggler candidate; anything smaller is AQE's job.

    Only left-preserving join types are allowed: the right side's hot slice
    is replicated ``salts`` times, so right/full outer would emit every
    unmatched hot right row once per salt copy.
    """
    allowed = {
        "inner", "left", "left_outer", "leftouter",
        "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti",
    }
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — right side is replicated {salts}x, "
            "so right/full outer joins would duplicate unmatched right rows. "
            "Use inner/left_outer/left_semi/left_anti."
        )
    if "_salt" in left.columns or "_salt" in right.columns:
        raise ValueError("salted_join: input must not already have a '_salt' column")
    if cap_mode not in ("error", "top"):
        raise ValueError(f"salted_join: cap_mode must be 'error' or 'top', got {cap_mode!r}")
    # Phase 1: hot-key detection. Eager at plan-build time; collected ONCE
    # into a literal so both join sides below see the same hot set (no lazy
    # re-evaluation / TOCTOU between the two sides).
    counts = left.groupBy(key).agg(F.count(F.lit(1)).alias("_n"))

    def _collect_hot(c: DataFrame) -> list:
        qualifying = c.filter(F.col("_n") >= hot_threshold)
        if cap_mode == "top":
            # TakeOrderedAndProject: the driver receives at most
            # max_hot_keys rows whatever the key cardinality. (count desc,
            # key asc) makes the kept set deterministic under ties.
            return (
                qualifying.orderBy(F.desc("_n"), F.asc(key))
                .select(key)
                .limit(max_hot_keys)
                .collect()
            )
        return qualifying.select(key).limit(max_hot_keys + 1).collect()

    if hot_threshold is None:
        # Fused default-threshold path: the total row count needed for the
        # threshold already lives in the per-key aggregate, so materialize
        # the counts ONCE and read both the total and the hot set from the
        # cache — the second job is a partition-local filter over one row
        # per distinct key, not a second full scan of `left` (previously a
        # separate left.count() job re-scanned the input).
        from pyspark.storagelevel import StorageLevel

        shuffle_parts = int(left.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
        counts.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            total = counts.agg(F.sum("_n")).first()[0] or 0
            hot_threshold = max(1000, (2 * total) // max(shuffle_parts, 1))
            hot_rows = _collect_hot(counts)
        finally:
            counts.unpersist()
    else:
        if hot_threshold < 1:
            raise ValueError(f"salted_join: hot_threshold must be >= 1, got {hot_threshold}")
        hot_rows = _collect_hot(counts)
    if len(hot_rows) > max_hot_keys:
        raise ValueError(
            f"salted_join: more than {max_hot_keys} keys exceed hot_threshold="
            f"{hot_threshold}; that is general load, not skew — raise hot_threshold "
            "(salting helps a few pathological keys, not a uniformly large join)."
        )
    hot_keys = [r[0] for r in hot_rows]
    if not hot_keys:
        return left.join(right, key, how)

    # Phase 2: one conditional-salt join. NULL keys never match in an
    # equi-join but must survive left-preserving joins -> coalesce routes
    # them to salt 0 (`isin` on NULL yields NULL, not False) and the join
    # type preserves them.
    is_hot = F.coalesce(F.col(key).isin(hot_keys), F.lit(False))

    salted_left = left.withColumn(
        "_salt",
        F.when(
            is_hot,
            F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salts)).cast("int"),
        ).otherwise(F.lit(0)),
    )
    salted_right = right.withColumn(
        "_salt",
        F.explode(
            F.when(is_hot, F.sequence(F.lit(0), F.lit(salts - 1))).otherwise(
                F.array(F.lit(0))
            )
        ),
    )
    return salted_left.join(salted_right, [key, "_salt"], how).drop("_salt")


def fuzzy_match(
    df: DataFrame,
    col: str,
    probes: Sequence[str],
    max_dist: int = 2,
) -> DataFrame:
    """Attach the closest probe string within ``max_dist`` edit distance —
    the entity-resolution / dirty-lookup primitive (match free-text fields
    against a canonical dictionary: brand names, domains, label synonyms).

    Spark-first shape: the probe dictionary rides into the plan as an
    array literal and the whole match is ONE higher-order expression per
    row — ``transform`` computes a bounded ``levenshtein`` per probe (the
    threshold variant early-exits the DP and returns -1 past the bound,
    which also subsumes length-difference blocking), ``filter`` keeps
    in-bound candidates, ``array_min`` over (dist, probe) structs picks
    the winner with the lexicographic probe tiebreak. Zero shuffles, zero
    joins, pure whole-stage codegen: at 100 TB this scans the corpus once
    and nothing else moves.

    For LARGE×LARGE fuzzy joins (both sides beyond a broadcastable
    dictionary) this per-row form is the wrong tool — block both sides on
    (length band, first character) into an equi-join of candidate pairs,
    then apply the same bounded distance; same expressions, one shuffle.

    Rows with no probe in range are dropped (inner semantics). NULL values
    never match. Output: the input columns + ``probe`` string + ``dist``
    int.
    """
    if not probes:
        raise ValueError("fuzzy_match: probes must be non-empty")
    if any(p is None for p in probes):
        raise ValueError("fuzzy_match: probes may not contain None")
    if max_dist < 0:
        raise ValueError(f"fuzzy_match: max_dist must be >= 0, got {max_dist}")
    for out_col in ("probe", "dist"):
        if out_col in df.columns:
            raise ValueError(f"fuzzy_match: input already has a {out_col!r} column")
    cand = F.transform(
        F.lit(sorted(set(probes))),
        lambda p: F.struct(
            F.levenshtein(F.col(col), p, max_dist).alias("dist"), p.alias("probe")
        ),
    )
    valid = F.filter(cand, lambda s: s["dist"] >= 0)
    best = F.array_min(valid)
    return (
        df.withColumn("_best", best)
        .filter(F.col("_best").isNotNull())
        .select(*df.columns, F.col("_best.probe").alias("probe"), F.col("_best.dist").alias("dist"))
    )


def null_bypass_join(
    left: DataFrame, right: DataFrame, keys: Sequence[str], how: str = "left"
) -> DataFrame:
    """Equi-join that routes NULL-key rows AROUND the shuffle — the classic
    fix for null-key skew in fact-to-dimension enrichment.

    SQL equality can never match a NULL key, yet a plain left join still
    hashes every null-key fact into ONE shuffle partition (all NULLs share
    a hash) before passing it through unmatched. In real fact streams the
    "no dimension id" slice is routinely 10-30% of rows, so at 100 TB that
    single partition IS the straggler. This operator splits the fact side
    at the scan: non-null rows take the ordinary equi-join; null-key rows
    skip the exchange entirely and come back with NULL dimension columns —
    byte-identical output to the plain join (the oracle IS the plain
    join), minus the hot partition. ``how='inner'`` simply drops them.

    Each branch scans the fact source with ITS OWN pushed-down null/not-null
    predicate (verified: two parquet scans in the plan, not one reused scan
    plus a post-filter) — row-group null-count stats let either scan skip
    wholesale, which beats sharing one unfiltered scan. The union is a
    no-shuffle concatenation. Keys must exist on both sides (same-name
    equi-join).
    """
    if how not in ("left", "inner"):
        raise ValueError(f"null_bypass_join: how must be 'left' or 'inner', got {how!r}")
    missing = [k for k in keys if k not in left.columns or k not in right.columns]
    if missing:
        raise ValueError(f"null_bypass_join: keys {missing} missing from a side")
    any_null = None
    for k in keys:
        c = F.col(k).isNull()
        any_null = c if any_null is None else (any_null | c)
    matched = left.filter(~any_null).join(right, list(keys), how)
    if how == "inner":
        return matched
    payload = [f for f in right.schema.fields if f.name not in keys]
    bypass = left.filter(any_null).select(
        *left.columns,
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in payload],
    )
    return matched.unionByName(bypass)
