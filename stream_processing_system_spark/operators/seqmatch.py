"""Row-sequence pattern matching (MATCH_RECOGNIZE-lite).

SQL:2016 MATCH_RECOGNIZE finds regex-like patterns over ordered row
sequences per partition. Spark has no native MATCH_RECOGNIZE; the
Spark-first reduction is: encode each partition's ordered rows as a
symbol STRING (one char per row), then run ordinary regexes over it
with `regexp_count` — the full regex engine (alternation, closures,
bounded repeats) comes for free, JVM-side, no Python. Matches are
leftmost, non-overlapping, greedy — the same semantics DuckDB's RE2
`regexp_extract_all` produces for the supported pattern class, which
is what keeps this differentially testable.

Shape: ONE groupBy(partition) building the symbol string from a
sorted struct array (total order: the caller supplies tie-breaking
order columns), then a map-only regex stage. At 100 TB the only
data-sized cost is that one shuffle; the strings hold one CHAR per
event, so a 10k-event user costs 10 KB. For unbounded histories,
segment by (user, day) the way `sessionize_events` bounds sessions,
or move to the streaming twin (`applyInPandasWithState` keeps an
incremental DFA per key instead of a string).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def encode_sequences(
    df: DataFrame,
    partition_col: str,
    order_cols: list[str],
    symbol: Column,
) -> DataFrame:
    """Per-partition ordered symbol string: (partition_col, seq).
    `symbol` must evaluate to a single character per row; order is
    the total order of `order_cols` (include a unique id last for
    run-to-run determinism on timestamp ties)."""
    packed = F.struct(*[F.col(c) for c in order_cols], symbol.alias("_ch"))
    return df.groupBy(partition_col).agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(packed)), lambda s: s["_ch"]
            ),
            "",
        ).alias("seq")
    )


def match_counts(
    sequences: DataFrame, patterns: dict[str, str]
) -> DataFrame:
    """Count non-overlapping matches of each named regex over `seq`.
    Adds one long column per pattern name."""
    out = sequences
    for name, rx in patterns.items():
        out = out.withColumn(name, F.regexp_count("seq", F.lit(rx)))
    return out
