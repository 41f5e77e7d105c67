"""Skew-resistant aggregation helpers.

At 100 TB a handful of hot keys (one viral user, one empty-string
token) can pin a whole stage on one reducer. Two defenses, layered:

1. AQE skew-join splitting is ON in the session factory — it
   repairs skewed *joins* at runtime.
2. For skewed *aggregations*, the classic two-phase salt: aggregate
   by (key, salt) first — spreading each hot key over many reducers
   — then merge the partials by key. For algebraic aggregates
   (count/sum/min/max) the result is exactly the unsalted answer.

`spark_partition_id()` is the salt: deterministic within a run, no
extra entropy column, and it naturally bounds fan-out at
#input-partitions. (Spark's own partial aggregation already does
map-side combining; explicit salting matters when the *grouped
domain per partition* is too large for the hash map, or when a
downstream orderBy/window must not see a single giant group.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGEABLE = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    salt_buckets: int | None = None,
) -> DataFrame:
    """Two-phase (salted) aggregation.

    `aggs` maps output column → (merge_fn_name, phase-1 expression),
    e.g. {"cnt": ("count", F.count(F.lit(1))),
          "total": ("sum", F.sum("value"))}.
    merge_fn_name must be algebraic: count→sum, sum→sum, min→min,
    max→max. avg must be decomposed by the caller into sum+count.
    """
    salt = (
        F.spark_partition_id()
        if salt_buckets is None
        else F.spark_partition_id() % salt_buckets
    )
    phase1 = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(
        *[expr.alias(f"_p_{out}") for out, (_, expr) in aggs.items()]
    )
    merged = phase1.groupBy(*keys).agg(
        *[
            _MERGEABLE[merge](F.col(f"_p_{out}")).alias(out)
            for out, (merge, _) in aggs.items()
        ]
    )
    return merged


def salted_count(df: DataFrame, keys: list[str], out: str = "cnt") -> DataFrame:
    """COUNT(*) GROUP BY keys, skew-resistant."""
    return salted_agg(df, keys, {out: ("count", F.count(F.lit(1)))})


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the LEFT (big, skewed) side gets a
    random-uniform salt in [0, salt_buckets); the RIGHT side is
    replicated `salt_buckets` times (explode over the salt domain) so
    every (key, salt) cell finds its match. A hot left key spreads
    over `salt_buckets` reducers instead of pinning one.

    Equivalent to `left.join(right, key, how)` for 'inner' and 'left'
    joins when `right` has unique keys (the usual fact⋈dim shape —
    replication would duplicate matches under non-unique right keys).
    Cost: right side shuffles salt_buckets× its size — cheap when
    right is the small side, which is exactly the skewed-join case
    this exists for. AQE's skew-join handles most cases at runtime;
    explicit salting is the deterministic fallback for when the skew
    is known ahead (one viral key) or AQE's post-shuffle split can't
    help (e.g. a downstream window keyed the same way).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salted_left = left.withColumn(
        "_salt", (F.rand(seed=0) * salt_buckets).cast("int")
    )
    replicated_right = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return salted_left.join(replicated_right, [key, "_salt"], how).drop("_salt")
