"""Bloom-filter runtime join pruning (sideways information passing).

The 100 TB problem this solves: a semi-join `fact WHERE key IN
(SELECT k FROM dim WHERE pred)` where the filtered dim key set is too
large to broadcast as a hash table (tens of millions of keys) forces
a full shuffle of the fact table — at 100 TB that shuffle IS the
query cost. A Bloom filter of the same key set is a few hundred KB
regardless of key count, broadcasts for free, and filters map-side,
so only the ~selectivity fraction of fact rows that (probably) match
ever reach the shuffle. Exactness is restored by a normal semi-join
AFTER the prune — the bloom admits false positives but never false
negatives, so `bloom-prune → semi-join` ≡ `semi-join` row-for-row.

This is the same construction as Spark's own runtime row-level
filtering (`spark.sql.optimizer.runtime.bloomFilter.enabled`, SPARK-32268)
— reimplemented here with public DataFrame ops only, because the
`bloom_filter_agg` / `might_contain` expressions are not registered
in the public function registry, and because an explicit operator
lets callers prune across query boundaries (build once, reuse
against many facts) which the optimizer rule cannot.

Everything stays JVM-side whole-stage codegen:
- build: k=`n_hashes` seeded xxhash64 positions per key → explode →
  groupBy(word) with BIT_OR of single-bit masks → one
  `array<long>` row (n_bits/64 longs; 1 Mbit = 16 K longs = 128 KB).
- probe: crossJoin(broadcast(1-row bitmap)) + k codegen'd bit tests.

No Python UDFs, no driver round-trip (the bitmap never leaves the
JVM; the crossJoin of a 1-row frame is a broadcast nested loop over
a constant, the established pattern for tiny computed constants in
this repo).

Reference scope note: the reference engine (bolt/bolt.go:187-626) has
no join pruning at all — this operator is part of the §2.3 join
family added on top, sized for the 100 TB design target.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Default sizing: 2^20 bits / 5 hashes ≈ 1% false-positive rate at
#: ~100k keys, 128 KB broadcast. Callers scale n_bits with the
#: expected key count (optimal k ≈ 0.7·n_bits/n_keys).
DEFAULT_N_BITS = 1 << 20
DEFAULT_N_HASHES = 5


def _positions(key: Column, n_bits: int, n_hashes: int) -> list[Column]:
    """k seeded bit positions for a key. xxhash64(key, seed) is the
    same 64-bit hash family Spark's own BloomFilterAggregate uses;
    pmod keeps positions non-negative."""
    return [
        F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(n_bits))
        for seed in range(n_hashes)
    ]


def bloom_build(
    keys: DataFrame,
    key_col: str,
    n_bits: int = DEFAULT_N_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
) -> DataFrame:
    """Aggregate a key column into a 1-row Bloom bitmap.

    Returns a DataFrame with a single row `(_bloom: array<long>)` of
    length n_bits/64. Distributed build: each task hashes its keys
    and emits (word, mask) pairs; one small shuffle on the word index
    (≤ n_bits/64 groups) OR-combines them; a join against the full
    word spine then one sorted collect materializes the dense array —
    all codegen, no Python.
    """
    if n_bits % 64 != 0:
        raise ValueError("n_bits must be a multiple of 64")
    n_words = n_bits // 64
    pos = keys.select(
        F.explode(F.array(*_positions(F.col(key_col), n_bits, n_hashes))).alias(
            "_pos"
        )
    )
    words = pos.select(
        (F.col("_pos") / 64).cast("int").alias("_word"),
        F.expr("shiftleft(cast(1 as bigint), cast(_pos % 64 as int))").alias(
            "_mask"
        ),
    ).groupBy("_word").agg(F.expr("bit_or(_mask)").alias("_mask"))
    # Densify via a word-spine join + one sorted collect — NOT via a
    # map: `transform(sequence(...), i -> m[i])` probes Spark's
    # MapData with a LINEAR scan per slot, an O(n_words²) driverless
    # stall (~30 s at 2^20 bits) that this join does in O(n log n).
    spine = keys.sparkSession.range(n_words).select(
        F.col("id").cast("int").alias("_word")
    )
    dense = spine.join(words, "_word", "left").select(
        "_word", F.coalesce("_mask", F.lit(0).cast("long")).alias("_mask")
    )
    return dense.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("_word", "_mask"))),
            lambda p: p["_mask"],
        ).alias("_bloom")
    )


def bloom_might_contain(
    key_col: str, n_bits: int, n_hashes: int, bloom_col: str = "_bloom"
) -> Column:
    """Membership predicate against a `bloom_col` array<long> column
    (present after joining the 1-row bitmap frame). True ⇐ all k bits
    set. Never false for a key that was in the build set."""
    checks = []
    for seed in range(n_hashes):
        h = f"pmod(xxhash64({key_col}, {seed}), {n_bits})"
        checks.append(
            f"(shiftright({bloom_col}[cast({h} div 64 as int)],"
            f" cast({h} % 64 as int)) & 1) = 1"
        )
    return F.expr(" AND ".join(checks))


def bloom_prune_join(
    fact: DataFrame,
    keys: DataFrame,
    fact_key: str,
    build_key: str | None = None,
    n_bits: int = DEFAULT_N_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
) -> DataFrame:
    """`fact` rows whose `fact_key` appears in `keys[build_key]` —
    exactly `fact.join(keys, semi)`, executed as a map-side Bloom
    prune followed by a semi-join over the survivors.

    The semi-join after the prune makes the result exact; the bloom
    makes the semi-join cheap (at 1% FPR, the shuffle moves ~1% of
    the non-matching fact rows instead of all of them).
    """
    build_key = build_key or fact_key
    fact_type = dict(fact.dtypes)[fact_key]
    build_type = dict(keys.dtypes)[build_key]
    if fact_type != build_type:
        # xxhash64('5' as string) != xxhash64(5 as bigint): a silent
        # type mismatch would hash every key differently and prune
        # EVERYTHING — fail loudly instead.
        raise TypeError(
            f"bloom_prune_join key types differ: fact.{fact_key} is "
            f"{fact_type}, keys.{build_key} is {build_type}; cast one side"
        )
    bitmap = bloom_build(keys, build_key, n_bits, n_hashes)
    pruned = (
        fact.crossJoin(F.broadcast(bitmap))
        .where(bloom_might_contain(fact_key, n_bits, n_hashes))
        .drop("_bloom")
    )
    return pruned.join(
        keys.select(F.col(build_key).alias(fact_key)).distinct(),
        on=fact_key,
        how="left_semi",
    )
