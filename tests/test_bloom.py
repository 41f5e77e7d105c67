"""Bloom-filter join pruning (operators/bloom.py): exactness (never a
false negative; prune+semi-join ≡ plain semi-join) and effectiveness
(the bitmap actually rejects non-members at roughly the designed FPR)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_processing_system_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_prune_join,
)
from stream_processing_system_spark.plans.analytics import brand_revenue_bloom
from tests.oracle import assert_matches_oracle


def test_no_false_negatives(spark):
    """Every key that went into the build MUST pass the probe — the
    one-sided error guarantee the prune-then-verify construction
    relies on."""
    keys = spark.range(0, 5000).select(
        F.concat(F.lit("k"), F.col("id")).alias("k")
    )
    bm = bloom_build(keys, "k", n_bits=1 << 16, n_hashes=5)
    passed = (
        keys.crossJoin(F.broadcast(bm))
        .where(bloom_might_contain("k", 1 << 16, 5))
        .count()
    )
    assert passed == 5000


def test_prune_join_is_exact_with_false_positives_present(spark):
    """Undersized filter (2^10 bits for 2k keys → high FPR) still
    yields the exact semi-join answer: the trailing semi-join strips
    every false positive the bloom admits."""
    keys = spark.range(0, 2000).select((F.col("id") * 3).alias("k"))
    fact = spark.range(0, 20000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    n_bits, n_hashes = 1 << 10, 3
    bm = bloom_build(keys, "k", n_bits, n_hashes)
    bloom_passed = (
        fact.crossJoin(F.broadcast(bm))
        .where(bloom_might_contain("k", n_bits, n_hashes))
        .count()
    )
    exact = fact.join(keys.distinct(), on="k", how="left_semi").count()
    assert bloom_passed > exact, "fixture must actually exercise false positives"
    got = bloom_prune_join(fact, keys, "k", n_bits=n_bits, n_hashes=n_hashes)
    assert got.count() == exact


def test_default_sizing_rejects_nonmembers(spark):
    """At the default 2^20 bits / 5 hashes with 1k build keys, the
    false-positive rate over 99k non-members must be far under the
    ~1%-at-100k-keys design point (measured: 0)."""
    keys = spark.range(0, 1000).select((F.col("id") * 101).alias("k"))
    nonmembers = spark.range(0, 99000).select(
        (F.col("id") * 101 + 1).alias("k")  # never ≡ 0 (mod 101)
    )
    bm = bloom_build(keys, "k")
    fp = (
        nonmembers.crossJoin(F.broadcast(bm))
        .where(bloom_might_contain("k", 1 << 20, 5))
        .count()
    )
    assert fp / 99000 < 0.01


def test_bitmap_shape(spark):
    """One row, n_bits/64 longs — the broadcastable-constant contract."""
    keys = spark.range(0, 10).select(F.col("id").alias("k"))
    rows = bloom_build(keys, "k", n_bits=1 << 12, n_hashes=4).collect()
    assert len(rows) == 1
    assert len(rows[0]["_bloom"]) == (1 << 12) // 64


def test_brand_revenue_bloom_oracle(spark, sf_dir):
    from __spark_entry__ import oracle_sql

    assert_matches_oracle(
        brand_revenue_bloom(spark, sf_dir),
        sf_dir,
        oracle_sql()["brand_revenue_bloom"],
    )


def test_prune_join_rejects_mismatched_key_types(spark):
    import pytest

    keys = spark.createDataFrame([("1",), ("2",)], ["k"])  # strings
    fact = spark.range(0, 10).select(F.col("id").alias("k"))  # bigints
    with pytest.raises(TypeError, match="key types differ"):
        bloom_prune_join(fact, keys, "k")
