"""KMV (k-minimum-values) distinct-count sketches with set algebra.

The reference's aggregate family (bolt/bolt.go:187-340) only counts
exactly; a 100 TB engine also needs mergeable distinct sketches whose
INTERSECTION can be estimated — HLL (see
`analytics.distinct_users_sketch_rollup`) only unions. KMV is the
classic sketch with native set algebra (Beyer et al., SIGMOD'07,
"On Synopses for Distinct-Value Estimation Under Multiset
Operations"):

- sketch(S) = the k smallest *distinct* hash values of S under a
  uniform hash;
- |S| ≈ (k-1) / U_k  where U_k is the k-th smallest hash scaled to
  (0,1); exact count when |distinct| < k (the sketch holds all of S);
- union:  k smallest of (K_A ∪ K_B);
- intersection: ρ = |K_union ∩ K_A ∩ K_B| matching values, then
  |A ∩ B| ≈ (ρ/k) · |A ∪ B|-estimate.

Everything here is md5-based (byte-identical in DuckDB, like MinHash
in `operators/dedup.py`) and integer-ordered, so the whole
construction — including the pairwise intersection estimates — is
differentially testable against a SQL oracle.

Scale: building a sketch is one distinct + one per-group top-k; the
distinct pre-shrinks the key space to |distinct| rows, and the
per-group top-k shuffles only (group, hash) pairs. For groups with
billions of distinct members, pre-filter `h < t` with a conservative
literal threshold first (hashes are uniform, so keeping the smallest
fraction p preserves the exact k-minimum set as long as p·|distinct|
≥ k) — that makes the sort input O(p·distinct) per group. All
downstream algebra runs on k-row-per-group frames: driver-free,
broadcast-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Hash domain: first 15 hex chars of md5 → integer in [0, 16^15).
#: 60 bits keeps the parse exact in a signed 64-bit int in BOTH
#: engines (16 chars would overflow DuckDB's signed ::BIGINT parse).
HASH_BITS = 60
HASH_SCALE = float(1 << HASH_BITS)


def kmv_hash(col) -> F.Column:
    """Uniform 60-bit integer hash, identical in Spark and DuckDB:
    `conv(substr(md5(x),1,15),16,10)`."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def kmv_sketch(
    df: DataFrame, group_col: str, value_col: str, k: int = 256
) -> DataFrame:
    """Per-group KMV sketch: the k smallest distinct hashes of
    `value_col`, long format (group, h, rn). One distinct + one
    ranked-window pass; see module docstring for the pre-filter valve
    at extreme group cardinalities."""
    hashed = (
        df.select(F.col(group_col), kmv_hash(F.col(value_col)).alias("h"))
        .distinct()
    )
    w = Window.partitionBy(group_col).orderBy("h")
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
    )


def _estimate(kth: F.Column, n_vals: F.Column, k: int) -> F.Column:
    """(k-1)/U_k when the sketch is full, else the exact held count.
    Fixed operand order keeps the double math engine-identical."""
    return F.when(
        n_vals >= k,
        F.lit(float(k - 1)) / (kth.cast("double") / F.lit(HASH_SCALE)),
    ).otherwise(n_vals.cast("double"))


def kmv_estimates(sketch: DataFrame, group_col: str, k: int = 256) -> DataFrame:
    """Per-group distinct-count estimate from a `kmv_sketch` frame."""
    agg = sketch.groupBy(group_col).agg(
        F.max("h").alias("_kth"), F.count(F.lit(1)).alias("_n")
    )
    return agg.select(
        group_col,
        F.floor(_estimate(F.col("_kth"), F.col("_n"), k) + F.lit(0.5))
        .cast("long")
        .alias("est_distinct"),
    )


def kmv_pair_overlap(
    sketch: DataFrame, group_col: str, k: int = 256
) -> DataFrame:
    """All-pairs union/intersection/Jaccard estimates between group
    sketches.

    For each unordered group pair (a < b): merge the two k-sets,
    re-take the k smallest distinct hashes, estimate the union from
    the merged k-th value, and scale by the fraction ρ/|K| of merged
    values present in BOTH input sketches. Runs entirely on
    k-row-per-group frames (the raw data is long gone), so the pair
    join is O(G²k) on broadcast-sized inputs — independent of the
    10^11-row table the sketches came from, which is the entire point
    of sketch algebra at 100 TB.
    """
    a = sketch.select(
        F.col(group_col).alias("ga"), F.col("h").alias("ha")
    )
    b = sketch.select(
        F.col(group_col).alias("gb"), F.col("h").alias("hb")
    )
    # hash values present in BOTH sketches of a pair: equi-join on the
    # hash (the pair inequality is a post-filter on an equi-join, not
    # a nested-loop condition)
    merged = a.join(
        b, (F.col("ha") == F.col("hb")) & (F.col("ga") < F.col("gb"))
    ).select("ga", "gb", F.col("ha").alias("h"), F.lit(1).alias("both"))
    # Union of hash VALUES per pair = distinct hashes from either side.
    pairs = (
        a.select("ga").distinct()
        .join(b.select("gb").distinct(), F.col("ga") < F.col("gb"))
    )
    union_vals = (
        pairs.join(a, "ga")
        .select("ga", "gb", F.col("ha").alias("h"))
        .unionByName(
            pairs.join(b, "gb").select("ga", "gb", F.col("hb").alias("h"))
        )
        .distinct()
    )
    w = Window.partitionBy("ga", "gb").orderBy("h")
    topk = union_vals.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= k
    )
    joined = topk.join(merged, ["ga", "gb", "h"], "left")
    stats = joined.groupBy("ga", "gb").agg(
        F.max("h").alias("_kth"),
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.coalesce(F.col("both"), F.lit(0))).alias("_rho"),
    )
    est_union = _estimate(F.col("_kth"), F.col("_n"), k)
    est_inter = (
        F.col("_rho").cast("double") / F.col("_n").cast("double")
    ) * est_union
    return stats.select(
        "ga",
        "gb",
        F.floor(est_union + F.lit(0.5)).cast("long").alias("est_union"),
        F.floor(est_inter + F.lit(0.5)).cast("long").alias("est_intersection"),
        (
            F.floor(
                (F.col("_rho").cast("double") / F.col("_n").cast("double"))
                * F.lit(1000000.0)
                + F.lit(0.5)
            )
            / F.lit(1000000.0)
        ).alias("jaccard_est"),
    )
