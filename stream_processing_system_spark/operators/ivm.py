"""Incremental view maintenance for additive aggregates.

At 100 TB you do not recompute a daily/monthly rollup from raw facts
on every refresh — you aggregate ONLY the newly-arrived delta and
merge it into the materialized base aggregate. For additive measures
(SUM, COUNT; AVG as sum+count; any commutative monoid) the merge is
a full-outer equi-join on the group keys followed by coalesced
addition, which costs O(|base groups| + |delta groups|) instead of
O(|all facts|). Deletions/corrections ride the same path as negative
deltas (CDC 'D' rows contribute -measure, 'U' rows a -old +new pair
— see `plans/analytics.orders_cdc_merge` for the row-level variant).

This module is the aggregate-level counterpart: `merge_additive`
takes two frames with identical (keys ++ measures) schemas and
returns the maintained aggregate. The registered query
`incremental_revenue_maintenance` proves merge(base_agg, delta_agg)
hash-matches a from-scratch group-by over the union of both fact
ranges — the algebraic identity the whole pattern rests on.

Scale: both inputs are already aggregates (group-key cardinality,
not fact cardinality); the join shuffles group keys only. Measures
must be EXACT types (decimal/long) — floating sums would make
merge-vs-recompute differ by addition order, which is why the money
plans sum DECIMAL(18,2) throughout (`plans/analytics._dec_sum`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_additive(
    base: DataFrame, delta: DataFrame, keys: list[str], measures: list[str]
) -> DataFrame:
    """Maintained aggregate = base ⊎ delta over additive `measures`:
    full-outer join on `keys`, null-safe measure addition. Schemas of
    the two sides must match (keys ++ measures, exact numeric
    types)."""
    b = base.select(
        *[F.col(k) for k in keys],
        *[F.col(m).alias(f"_b_{m}") for m in measures],
    )
    d = delta.select(
        *[F.col(k) for k in keys],
        *[F.col(m).alias(f"_d_{m}") for m in measures],
    )
    merged = b.join(d, keys, "full_outer")
    zero = F.lit(0)
    return merged.select(
        *[F.col(k) for k in keys],
        *[
            (
                F.coalesce(F.col(f"_b_{m}"), zero.cast(b.schema[f"_b_{m}"].dataType))
                + F.coalesce(F.col(f"_d_{m}"), zero.cast(b.schema[f"_b_{m}"].dataType))
            ).alias(m)
            for m in measures
        ],
    )
