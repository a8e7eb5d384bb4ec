"""Bloom-filter semi-join pruning: no-false-negative guarantee, false-positive
bound, parameter validation, and the map-side plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wicsmmiretl_spark.operators.pruning import bloom_prune, bloom_semi_filter, bloom_words


def test_bloom_words_validates_params(spark):
    df = spark.range(10)
    with pytest.raises(ValueError, match="num_bits"):
        bloom_words(df, "id", num_bits=100)
    with pytest.raises(ValueError, match="num_hashes"):
        bloom_words(df, "id", num_hashes=0)


def test_no_false_negatives(spark):
    keys = spark.range(0, 2000).select((F.col("id") * 3).alias("k"))
    words = bloom_words(keys, "k", num_bits=1 << 14, num_hashes=5)
    big = spark.range(0, 6000).select(F.col("id").alias("k"))
    kept = {r.k for r in bloom_prune(big, "k", words, num_hashes=5).collect()}
    true_keys = {r.k for r in keys.collect()}
    assert true_keys <= kept  # every true key survives, always


def test_false_positive_rate_bounded(spark):
    keys = spark.range(0, 1000).select(F.col("id").alias("k"))
    words = bloom_words(keys, "k", num_bits=1 << 16, num_hashes=5)
    # Probe with 5000 keys entirely disjoint from the build set.
    probes = spark.range(1_000_000, 1_005_000).select(F.col("id").alias("k"))
    n_kept = bloom_prune(probes, "k", words, num_hashes=5).count()
    # Theoretical fp ~ (1 - e^(-5*1000/65536))^5 ~ 5e-6; allow generous slack.
    assert n_kept <= 25


def test_null_keys_dropped(spark):
    keys = spark.range(0, 100).select(F.col("id").alias("k"))
    words = bloom_words(keys, "k", num_bits=1 << 10, num_hashes=3)
    big = spark.createDataFrame([(1,), (None,), (50,)], "k: bigint")
    kept = [r.k for r in bloom_prune(big, "k", words, num_hashes=3).collect()]
    assert None not in kept and set(kept) == {1, 50}


def test_null_build_keys_excluded(spark):
    keys = spark.createDataFrame([(None,), (7,)], "k: bigint")
    words = bloom_words(keys, "k", num_bits=1 << 10, num_hashes=3)
    big = spark.range(0, 64).select(F.col("id").alias("k"))
    kept = {r.k for r in bloom_prune(big, "k", words, num_hashes=3).collect()}
    assert 7 in kept


def test_pruned_join_equals_plain_join(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    dim = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    pruned = bloom_semi_filter(li, "l_orderkey", dim, "o_orderkey", num_bits=1 << 16)
    plain = li.join(dim, li["l_orderkey"] == dim["o_orderkey"]).count()
    via_bloom = pruned.join(dim, pruned["l_orderkey"] == dim["o_orderkey"]).count()
    assert plain == via_bloom
    # And the prune genuinely removed fact rows before the join.
    assert pruned.count() < li.count()


def test_prune_is_map_side(spark):
    """The membership test must sit in the fact scan's stage: a broadcast
    exchange for the word row, no shuffle of the fact before the filter."""
    keys = spark.range(0, 100).select(F.col("id").alias("k"))
    words = bloom_words(keys, "k", num_bits=1 << 10, num_hashes=3)
    big = spark.range(0, 1000).select(F.col("id").alias("k"))
    plan = bloom_prune(big, "k", words, num_hashes=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "Exchange hashpartitioning" not in plan


def test_auto_size_tracks_dim_cardinality(spark):
    """num_bits=None sizes the filter from the dim side (~14 bits/key per
    the r8 advice — headroom over 12 absorbs approx_count_distinct's ~5%
    rsd at power-of-two boundaries): the 10× rehearsal's saturation
    failure mode — fixed width, growing dim — must not warn or stop
    pruning."""
    import warnings

    from wicsmmiretl_spark.operators.pruning import _MAX_BITS, _MIN_BITS, _auto_num_bits

    assert _auto_num_bits(0) == _MIN_BITS
    assert _auto_num_bits(10_000) == 1 << 18  # 140k target bits → 262144
    assert _auto_num_bits(10**12) == _MAX_BITS  # clamped
    for n in (100, 10_000):
        assert _auto_num_bits(n) & (_auto_num_bits(n) - 1) == 0  # power of two

    keys = spark.range(0, 20_000).select(F.col("id").alias("k"))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        words = bloom_words(keys, "k", num_bits=None, num_hashes=5)
    assert not [w for w in caught if "bloom_words" in str(w.message)]  # no saturation
    assert len(words) * 64 >= 14 * 20_000 / 2  # sized to the keys (approx count slack)
    probes = spark.range(1_000_000, 1_005_000).select(F.col("id").alias("k"))
    n_kept = bloom_prune(probes, "k", words, num_hashes=5).count()
    assert n_kept <= 0.05 * 5000  # FP ≤ 5% at the auto size


def test_saturated_filter_warns(spark):
    import warnings

    keys = spark.range(0, 2000).select(F.col("id").alias("k"))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        bloom_words(keys, "k", num_bits=1 << 10, num_hashes=5)  # 2000 keys, 1024 bits
    assert any("ineffective" in str(w.message) for w in caught)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        bloom_words(keys, "k", num_bits=1 << 16, num_hashes=5)  # well sized
    assert not [w for w in caught if "bloom_words" in str(w.message)]
