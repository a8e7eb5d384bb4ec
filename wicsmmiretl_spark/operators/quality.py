"""Declarative data-quality expectations ("assert on data, not on code").

Engine extension beyond the reference (its validation is implicit in
dtype normalization; see reference ``etl.py`` load stages): a pipeline
feeding a 100 TB training corpus needs machine-checkable contracts on
every ingested batch — null rates, value domains, key uniqueness,
referential integrity — reported as data so a scheduler can gate
downstream stages on the result (the Great Expectations / dbt-test
pattern, public knowledge, re-expressed as lazy Spark plans).

100 TB design:

* All row-level rules evaluate in ONE aggregation pass over the table —
  a single scan, partial-aggregated map-side, no shuffle of raw rows.
* Uniqueness is one hash agg on the key columns (count vs distinct-count
  in the same pass).
* Referential integrity is a broadcast-or-shuffle LEFT ANTI join counting
  orphans — never materializing them.
* The report is a union of scalar aggregates: |rules| rows total, so the
  gate decision costs one small collect downstream.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

def _report_row(rule: str, violations: Column, checked: Column) -> list[Column]:
    return [
        F.lit(rule).alias("rule"),
        violations.cast("long").alias("violations"),
        checked.cast("long").alias("checked"),
    ]


def dq_report(
    df: DataFrame,
    row_rules: dict[str, Column] | None = None,
    unique: dict[str, Sequence[str]] | None = None,
    references: dict[str, tuple[Sequence[str], DataFrame, Sequence[str]]] | None = None,
) -> DataFrame:
    """Evaluate expectations and return one row per rule.

    * ``row_rules``: name → predicate Column that must hold per row; a row
      violates when the predicate is FALSE **or NULL** (three-valued logic
      must not let unknowns pass a gate). ``checked`` = all rows.
    * ``unique``: name → key columns; ``violations`` = surplus rows beyond
      one per distinct key among rows with fully non-NULL keys (NULL keys
      are a nullability rule's job, not a uniqueness rule's);
      ``checked`` = rows with non-NULL keys.
    * ``references``: name → (fk_cols, ref_df, ref_cols); ``violations`` =
      rows whose non-NULL fk tuple has no match in the referenced table
      (LEFT ANTI join); ``checked`` = rows with non-NULL fks.

    Output: rule string, violations bigint, checked bigint — ordered by
    rule name for a deterministic report.
    """
    if not (row_rules or unique or references):
        raise ValueError("dq_report: at least one rule is required")
    parts: list[DataFrame] = []
    if row_rules:
        # Positional aliases: rule names are display strings and may contain
        # dots/spaces that would break column-name resolution if embedded.
        aggs = [
            F.sum(F.when(pred.isNull() | ~pred, 1).otherwise(0)).alias(f"_v_{i}")
            for i, pred in enumerate(row_rules.values())
        ]
        wide = df.agg(*aggs, F.count("*").alias("_n"))
        structs = F.array(
            *[
                F.struct(*_report_row(name, F.col(f"_v_{i}"), F.col("_n")))
                for i, name in enumerate(row_rules)
            ]
        )
        parts.append(wide.select(F.explode(structs).alias("_r")).select("_r.*"))
    if unique:
        for name, cols in unique.items():
            if not cols:
                raise ValueError(f"dq_report: unique rule {name!r} needs key columns")
            nn = None
            for c in cols:
                cond = F.col(c).isNotNull()
                nn = cond if nn is None else (nn & cond)
            keyed = df.filter(nn) if nn is not None else df
            agg = keyed.agg(
                F.count("*").alias("_n"), F.count_distinct(*[F.col(c) for c in cols]).alias("_d")
            )
            parts.append(agg.select(*_report_row(name, F.col("_n") - F.col("_d"), F.col("_n"))))
    if references:
        for name, (fk_cols, ref_df, ref_cols) in references.items():
            if not fk_cols or len(fk_cols) != len(ref_cols):
                raise ValueError(
                    f"dq_report: reference rule {name!r} needs matching non-empty "
                    f"fk_cols/ref_cols, got {list(fk_cols)} vs {list(ref_cols)}"
                )
            nn = None
            for c in fk_cols:
                cond = F.col(c).isNotNull()
                nn = cond if nn is None else (nn & cond)
            keyed = df.filter(nn) if nn is not None else df
            ref = ref_df.select(
                *[F.col(rc).alias(f"_ref_{i}") for i, rc in enumerate(ref_cols)]
            ).dropDuplicates()
            on = None
            for i, fk in enumerate(fk_cols):
                cond = F.col(fk) == F.col(f"_ref_{i}")
                on = cond if on is None else (on & cond)
            orphans = keyed.join(ref, on, "left_anti").agg(F.count("*").alias("_v"))
            checked = keyed.agg(F.count("*").alias("_n"))
            parts.append(
                orphans.crossJoin(F.broadcast(checked)).select(
                    *_report_row(name, F.col("_v"), F.col("_n"))
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("rule")


def dq_gate(report: DataFrame, max_violation_rate: float = 0.0) -> None:
    """Collect the |rules|-row report and raise if any rule's violation
    rate exceeds the budget — the scheduler-facing hard gate."""
    bad = [
        r
        for r in report.collect()
        if r["checked"] > 0 and r["violations"] / r["checked"] > max_violation_rate
    ]
    if bad:
        detail = ", ".join(f"{r['rule']}={r['violations']}/{r['checked']}" for r in bad)
        raise ValueError(f"dq_gate: expectations failed: {detail}")


def key_skew_profile(
    df: DataFrame,
    key_col: str,
    top_k: int = 20,
) -> DataFrame:
    """Join/shuffle-key skew diagnostics: the ``top_k`` heaviest values of
    ``key_col`` with their share of the table and the running cumulative
    share, plus the skew ratio of each against a perfectly uniform key.
    This is the probe to run BEFORE committing a 100 TB join — the output
    tells you directly whether the hot keys need salting
    (operators/joins.salted_join) or an AQE skew split, and how much of
    the table they cover.

    One partial-aggregated groupBy (map-side combine bounds every
    reducer: the hottest key arrives pre-summed per partition, so the
    diagnostic itself cannot be killed by the skew it measures), a
    driver-side top-k (TakeOrderedAndProject — top_k rows, never the
    full key histogram), and ONE broadcast global row for the totals.
    The cumulative share rides a window over top_k rows only.

    Output, ordered by count desc (ties: key asc):
      key (as string), n_rows bigint, frac double (6dp, share of
      non-null rows), cum_frac double (6dp), skew double (6dp —
      n_rows × n_distinct / n_total; 1.0 = perfectly uniform).
    NULL keys are excluded (they never co-locate in an equi-join).
    """
    if top_k < 1:
        raise ValueError(f"key_skew_profile: top_k must be >= 1, got {top_k}")
    if key_col not in df.columns:
        raise ValueError(f"key_skew_profile: {key_col!r} not in {df.columns}")
    keyed = df.filter(F.col(key_col).isNotNull()).select(
        F.col(key_col).cast("string").alias("key")
    )
    counts = keyed.groupBy("key").agg(F.count("*").alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("_n_total"), F.count("*").alias("_n_distinct")
    )
    top = counts.orderBy(F.desc("n_rows"), F.asc("key")).limit(top_k)
    w = (
        Window.orderBy(F.desc("n_rows"), F.asc("key"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        top.crossJoin(F.broadcast(totals))
        .select(
            "key",
            "n_rows",
            F.round(F.col("n_rows") / F.col("_n_total"), 6).alias("frac"),
            F.round(
                F.sum("n_rows").over(w) / F.col("_n_total"), 6
            ).alias("cum_frac"),
            F.round(
                F.col("n_rows") * F.col("_n_distinct") / F.col("_n_total"), 6
            ).alias("skew"),
        )
        .orderBy(F.desc("n_rows"), F.asc("key"))
    )


def benford_test(
    df: DataFrame,
    value_col: str,
    scale: int = 100,
) -> DataFrame:
    """First-significant-digit distribution vs Benford's law (Newcomb
    1881 / Benford 1938, public literature) — the forensic DQ check:
    organically-generated magnitudes follow P(d) = log10(1 + 1/d), while
    fabricated, synthetic, or truncated data usually doesn't. A large
    deviation is a flag on the SOURCE, not a correctness failure.

    * Values are scaled to integers first (default cents), and the first
      digit comes from the INTEGER's decimal rendering — bigint→string
      is engine-identical, where double→string is not (the determinism
      trap this parameterization exists to avoid). Zero/NULL values are
      excluded; negatives contribute their magnitude.
    * Expected probabilities enter the plan as Python-computed double
      literals, so any engine compares against bit-identical constants.

    100 TB shape: one combiner-backed digit hash agg; the comparison
    table is 9 rows.

    Output: digit int (1-9), n bigint, p_obs double (6dp),
    p_benford double (6dp), dev double (6dp, p_obs − p_benford) —
    ascending by digit, all nine digits present.
    """
    import math

    if value_col not in df.columns:
        raise ValueError(f"benford_test: column {value_col!r} not in {df.columns}")
    sv = F.abs(F.round(F.col(value_col).cast("double") * scale).cast("long"))
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .select(sv.alias("_sv"))
        .filter(F.col("_sv") > 0)
        .groupBy(
            F.substring(F.col("_sv").cast("string"), 1, 1).cast("int").alias("digit")
        )
        .agg(F.count("*").alias("n"))
    )
    spark = df.sparkSession
    bens = [(d, round(math.log10(1.0 + 1.0 / d), 6)) for d in range(1, 10)]
    grid = spark.createDataFrame(bens, "digit: int, p_benford: double")
    tot = counts.agg(F.sum("n").alias("_t"))
    return (
        grid.join(counts, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
            F.round(F.coalesce("n", F.lit(0)) / F.col("_t"), 6).alias("p_obs"),
            "p_benford",
            F.round(
                F.coalesce("n", F.lit(0)) / F.col("_t") - F.col("p_benford"), 6
            ).alias("dev"),
        )
        .orderBy("digit")
    )


def fd_check(
    df: DataFrame,
    determinants: Sequence[str],
    dependent: str,
    label: str | None = None,
) -> DataFrame:
    """Functional-dependency profile: does ``determinants → dependent``
    hold, and if not, how badly? The schema-discovery primitive behind
    normalization checks, dimension-table conformance, and silently-
    denormalized-join detection (Huhtala et al., "TANE", 1999, for the
    discovery framing — public literature; this is the single-FD check a
    profiler runs per candidate).

    A determinant group violates the FD when it maps to MORE THAN ONE
    distinct non-NULL dependent value. NULL dependents don't count as a
    value (SQL-aggregate style); NULL determinants form their own group
    like any GROUP BY.

    Scale shape: one (determinants) hash agg computing per-group distinct
    dependents — partial-agged, one shuffle on the determinant key — then
    one scalar roll-up. Nothing collects; the report is one row.

    Output (one row): fd string, n_groups bigint, n_violating bigint,
    violation_rate double (6dp, violating/groups), max_dependents bigint,
    rows_in_violating bigint, holds boolean.
    """
    dets = list(determinants)
    if not dets:
        raise ValueError("fd_check: determinants must be non-empty")
    for c in [*dets, dependent]:
        if c not in df.columns:
            raise ValueError(f"fd_check: column {c!r} not in {df.columns}")
    name = label or f"{','.join(dets)}->{dependent}"
    per_group = df.groupBy(*dets).agg(
        F.countDistinct(dependent).alias("_nd"),
        F.count(F.lit(1)).alias("_n"),
    )
    return per_group.agg(
        F.lit(name).alias("fd"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.when(F.col("_nd") > 1, 1).otherwise(0)).cast("long").alias("n_violating"),
        F.round(
            F.sum(F.when(F.col("_nd") > 1, 1).otherwise(0)) / F.count(F.lit(1)), 6
        ).alias("violation_rate"),
        F.max("_nd").cast("long").alias("max_dependents"),
        F.coalesce(
            F.sum(F.when(F.col("_nd") > 1, F.col("_n"))), F.lit(0)
        ).cast("long").alias("rows_in_violating"),
        (F.sum(F.when(F.col("_nd") > 1, 1).otherwise(0)) == 0).alias("holds"),
    )


def k_anonymity(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymity profile (Sweeney 2002 — public literature): how
    re-identifiable are rows given a set of quasi-identifier columns? A
    row is k-anonymous when at least k-1 OTHER rows share its full
    quasi-identifier tuple; the table's k-anonymity is the minimum
    equivalence-class size. The privacy gate a training-data pipeline
    runs before releasing joined/user-level tables.

    Scale shape: one hash agg on the quasi-identifier tuple (partial-
    agged), then a scalar roll-up — the ``fd_check`` cost class. NULLs
    group together (SQL GROUP BY), which is the conservative reading: a
    shared NULL pattern IS an identifying pattern.

    Output (one row): quasi string, k_threshold int, n_rows bigint,
    n_classes bigint, min_class_size bigint, rows_below_k bigint,
    frac_below_k double (6dp), anonymous boolean (min_class_size >= k).
    """
    qs = list(quasi_cols)
    if not qs:
        raise ValueError("k_anonymity: quasi_cols must be non-empty")
    if k < 1:
        raise ValueError(f"k_anonymity: k must be >= 1, got {k}")
    for c in qs:
        if c not in df.columns:
            raise ValueError(f"k_anonymity: column {c!r} not in {df.columns}")
    classes = df.groupBy(*qs).agg(F.count(F.lit(1)).alias("_n"))
    return classes.agg(
        F.lit(",".join(qs)).alias("quasi"),
        F.lit(k).cast("int").alias("k_threshold"),
        F.sum("_n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("_n").cast("long").alias("min_class_size"),
        F.coalesce(
            F.sum(F.when(F.col("_n") < k, F.col("_n"))), F.lit(0)
        ).cast("long").alias("rows_below_k"),
        F.round(
            F.coalesce(F.sum(F.when(F.col("_n") < k, F.col("_n"))), F.lit(0))
            / F.sum("_n"),
            6,
        ).alias("frac_below_k"),
        (F.min("_n") >= k).alias("anonymous"),
    )


def l_diversity(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    l: int = 3,
) -> DataFrame:
    """l-diversity profile (Machanavajjhala et al. 2007 — public
    literature): k-anonymity's necessary complement — a k-anonymous
    class whose SENSITIVE attribute is constant still leaks it for every
    member (the homogeneity attack). A class is l-diverse when it
    contains at least ``l`` distinct non-NULL sensitive values.

    Same one-hash-agg shape as ``k_anonymity`` (per-class distinct count
    of the sensitive column rides the same aggregate), same conservative
    NULL reading on the quasi-identifiers; NULL sensitive values are not
    values.

    Output (one row): quasi string, sensitive string, l_threshold int,
    n_rows bigint, n_classes bigint, min_diversity bigint,
    classes_below_l bigint, rows_below_l bigint, frac_below_l double
    (6dp), diverse boolean.
    """
    qs = list(quasi_cols)
    if not qs:
        raise ValueError("l_diversity: quasi_cols must be non-empty")
    if l < 1:
        raise ValueError(f"l_diversity: l must be >= 1, got {l}")
    for c in [*qs, sensitive_col]:
        if c not in df.columns:
            raise ValueError(f"l_diversity: column {c!r} not in {df.columns}")
    classes = df.groupBy(*qs).agg(
        F.count(F.lit(1)).alias("_n"),
        F.countDistinct(sensitive_col).alias("_ld"),
    )
    below = F.col("_ld") < l
    return classes.agg(
        F.lit(",".join(qs)).alias("quasi"),
        F.lit(sensitive_col).alias("sensitive"),
        F.lit(l).cast("int").alias("l_threshold"),
        F.sum("_n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("_ld").cast("long").alias("min_diversity"),
        F.sum(F.when(below, 1).otherwise(0)).cast("long").alias("classes_below_l"),
        F.coalesce(F.sum(F.when(below, F.col("_n"))), F.lit(0))
        .cast("long")
        .alias("rows_below_l"),
        F.round(
            F.coalesce(F.sum(F.when(below, F.col("_n"))), F.lit(0)) / F.sum("_n"), 6
        ).alias("frac_below_l"),
        (F.min("_ld") >= l).alias("diverse"),
    )
