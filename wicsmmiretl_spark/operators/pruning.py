"""Scan-pruning structures: Bloom-filter semi-join pruning.

Engine extension beyond the reference (its single-box pandas joins never
need shuffle-volume reduction; see reference ``etl.py`` join stages for the
semantics being accelerated). At cluster scale the dominant cost of a
selective fact⋈dim join is shuffling fact rows that will never match. A
Bloom filter built from the dim side's keys and applied map-side to the
fact scan removes most of them before the exchange — the classic
"runtime filter" (public literature: Bloom 1970; the same idea Spark's AQE
applies internally as ``InSubqueryExec``/bloom runtime filters, here made
explicit, deterministic, and composable).

Design for 100 TB:

* The filter is built with ONE partial-aggregated ``groupBy`` over the dim
  side (k positions per key → 64-bit words via ``bit_or``), then collected:
  at most ``num_bits/64`` longs cross the driver — 16 KiB for the default
  2^17 bits, independent of dim-side row count.
* The word table rides to the fact side as a broadcast one-row DataFrame
  (a single copy in the plan, not one array literal per probe), so the
  membership test is pure map-side Catalyst bit arithmetic inside
  whole-stage codegen: no Python, no shuffle, no extra scan of the fact.
* No false negatives, ever: the pruned join is row-identical to the
  unpruned join — which is exactly the correctness oracle used by the
  suite. False positives only waste shuffle; the rate is ~(1-e^{-kn/m})^k
  and is pinned by a pytest bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Sizing rule (surfaced by the 10× scale rehearsal, BENCH_NOTES_r07): a fixed
# num_bits saturates as the dim side grows. ~12 bits/key keeps the
# false-positive rate ≈ 0.3% at k=5 — auto-sizing targets this.
# 14 (not 12) bits/key per the r8 advice: approx_count_distinct at its
# default ~5% rsd can undercount, and an undercount landing just below a
# power-of-two boundary would halve the filter; the 2-bit headroom absorbs
# that while keeping FP ≈ 0.1% at k=5.
_BITS_PER_KEY = 14
_MIN_BITS = 1 << 12  # 512 B floor — below this the build job costs more than it saves
_MAX_BITS = 1 << 27  # 16 MiB ceiling on what crosses the driver / broadcast


def _auto_num_bits(n_keys: int) -> int:
    """Smallest power-of-two ≥ ``_BITS_PER_KEY × n_keys``, clamped.

    Power-of-two keeps ``pmod``'s modulus cheap and the word table aligned;
    the clamp bounds both the build-collect and the broadcast at 16 MiB —
    past that a real engine should fall back to a shuffled semi join anyway.
    """
    bits = _MIN_BITS
    target = max(1, n_keys) * _BITS_PER_KEY
    while bits < target and bits < _MAX_BITS:
        bits <<= 1
    return bits


def bloom_words(small: DataFrame, key_col: str, num_bits: int | None = 1 << 17, num_hashes: int = 5) -> list[int]:
    """Build the filter: a dense Python list of ``num_bits // 64`` longs.

    One Spark job at build time (the "runtime" in runtime filter): explode
    each key into its ``num_hashes`` xxhash64 bit positions, partial-agg
    ``bit_or`` per 64-bit word, collect the sparse word map, densify on the
    driver. NULL keys are excluded — they can never match an equi-join.

    ``num_bits=None`` auto-sizes: one cheap partial-agged
    ``approx_count_distinct`` job over the dim keys picks the smallest
    power of two ≥ ~14 bits/key (FP ≈ 0.1% at k=5; the headroom over the
    information-theoretic ~10 absorbs the approx count's ~5% rsd), so a
    10× dim-side growth can no longer silently saturate a fixed-width
    filter.

    API-change note (r7→r8, restated per the r8 advice): the default was
    a fixed ``num_bits=1<<17``; the ``None`` default means every caller
    on defaults now runs this extra eager count job at PLAN-BUILD time.
    Pass an explicit ``num_bits`` to keep build-time to the single
    word-table job when the dim cardinality is known.
    """
    if num_bits is None:
        n_keys = (
            small.filter(F.col(key_col).isNotNull())
            .agg(F.approx_count_distinct(key_col).alias("n"))
            .collect()[0]["n"]
        )
        num_bits = _auto_num_bits(n_keys)
    if num_bits % 64 != 0 or num_bits <= 0:
        raise ValueError(f"bloom_words: num_bits must be a positive multiple of 64, got {num_bits}")
    if not 1 <= num_hashes <= 16:
        raise ValueError(f"bloom_words: num_hashes must be in [1, 16], got {num_hashes}")
    positions = F.array(
        *[F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(num_bits)) for i in range(num_hashes)]
    )
    rows = (
        small.filter(F.col(key_col).isNotNull())
        .select(F.explode(positions).alias("pos"))
        .select(
            F.shiftrightunsigned(F.col("pos"), 6).cast("int").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos & 63 AS INT))").alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    words = [0] * (num_bits // 64)
    for r in rows:
        words[r["word"]] = r["bits"]
    # The filter is already on the driver — check saturation for free. At
    # fill > 0.5 the false-positive rate is >= ~0.5^k and climbing fast:
    # the prune silently stops pruning (results stay correct via the
    # no-false-negative property; only the shuffle saving evaporates).
    # Surfaced by the 10x scale rehearsal: a fixed num_bits with a growing
    # dim side saturates — size ~10-15 bits per expected key.
    fill = sum(bin(w & ((1 << 64) - 1)).count("1") for w in words) / num_bits
    if fill > 0.5:
        import warnings

        warnings.warn(
            f"bloom_words: filter is {fill:.0%} full (num_bits={num_bits}) — "
            f"false-positive rate ~{fill**num_hashes:.2f}; the prune is "
            "ineffective. Size num_bits to ~10-15 bits per dim-side key.",
            RuntimeWarning,
            stacklevel=2,
        )
    return words


def bloom_prune(
    big: DataFrame,
    key_col: str,
    words: list[int],
    num_hashes: int = 5,
) -> DataFrame:
    """Filter ``big`` to rows whose key *may* be in the filter.

    The word array is attached once via a broadcast one-row DataFrame and
    every probe references that single column, keeping the plan small and
    the test inside codegen. Rows with NULL keys are dropped (equi-join
    semantics). Guaranteed superset of the true matching rows.
    """
    if not words:
        raise ValueError("bloom_prune: words must be a non-empty filter (from bloom_words)")
    num_bits = len(words) * 64
    spark = big.sparkSession
    bloom_df = spark.createDataFrame([(words,)], "_bloom: array<bigint>")
    cond = F.col(key_col).isNotNull()
    for i in range(num_hashes):
        pos = F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(num_bits))
        word = F.element_at(F.col("_bloom"), F.shiftrightunsigned(pos, 6).cast("int") + F.lit(1))
        bit = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(pmod(xxhash64({key_col}, {i}), {num_bits}) & 63 AS INT))"
        )
        cond = cond & (word.bitwiseAND(bit) != 0)
    return big.crossJoin(F.broadcast(bloom_df)).filter(cond).drop("_bloom")


def bloom_semi_filter(
    big: DataFrame,
    big_key: str,
    small: DataFrame,
    small_key: str,
    num_bits: int | None = None,
    num_hashes: int = 5,
) -> DataFrame:
    """End-to-end runtime filter: build from ``small``, prune ``big``.

    Launches one bounded job at plan-build time (the word-table collect —
    ≤ ``num_bits/64`` longs regardless of input size; with the default
    ``num_bits=None`` an extra partial-agg count job auto-sizes the filter
    at ~14 bits/key so it keeps pruning as the dim side grows); the
    returned frame is a lazy map-side prune of ``big`` suitable for a
    subsequent join against ``small``. The join result is identical with
    or without the prune — only the shuffled volume changes.
    """
    words = bloom_words(small, small_key, num_bits=num_bits, num_hashes=num_hashes)
    return bloom_prune(big, big_key, words, num_hashes=num_hashes)
