"""Data-quality expectations: declarative rule checks with a
violation report.

Profiling (`analytics.orders_table_profile`) tells you what a table
looks like; EXPECTATIONS tell you whether it is fit to load — the
deequ/Great-Expectations pattern: a rule set evaluated in one pass
(plus one anti-join per referential rule), emitting (rule,
n_violations, pass) rows a pipeline gate can act on.

Everything is counting — exact, order-free, trivially SQL-mirrored.
Scale shape: all row-level rules fold into ONE aggregate over one
scan (each rule is a SUM(CASE…)); uniqueness adds one aggregate on
the key; every referential rule is a broadcast/shuffle anti-join that
Catalyst plans like any other join. No driver-side rule loop over
data."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """A named row-level predicate that must hold; violations are
    rows where it does NOT."""

    name: str
    predicate: Column  # True = row passes


def check(
    df: DataFrame,
    rules: list[Rule],
    unique_keys: list[str] | None = None,
    references: dict[str, tuple[DataFrame, str]] | None = None,
) -> DataFrame:
    """Evaluate all expectations; returns (rule, n_violations, pass)
    ordered by rule name.

    - `rules`: row-level predicates, all folded into one aggregate.
    - `unique_keys`: each column must be globally unique (violations
      = rows beyond the first per duplicated value).
    - `references`: fk_col -> (parent_df, parent_col); violations =
      rows whose fk has no parent (left_anti join)."""
    reports: list[DataFrame] = []
    if rules:
        aggs = [
            F.sum(F.when(~r.predicate, 1).otherwise(0)).cast("long").alias(r.name)
            for r in rules
        ]
        wide = df.agg(*aggs)
        stacked = wide.selectExpr(
            "stack({n}, {pairs}) AS (rule, n_violations)".format(
                n=len(rules),
                pairs=", ".join(f"'{r.name}', `{r.name}`" for r in rules),
            )
        )
        reports.append(stacked)
    for key in unique_keys or []:
        dup = (
            df.groupBy(key)
            .agg((F.count(F.lit(1)) - 1).alias("_extra"))
            .agg(F.sum("_extra").cast("long").alias("n_violations"))
            .select(F.lit(f"unique:{key}").alias("rule"), "n_violations")
        )
        reports.append(dup)
    for fk, (parent, pk) in (references or {}).items():
        orphans = (
            df.select(F.col(fk))
            .join(parent.select(F.col(pk).alias(fk)), fk, "left_anti")
            .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
            .select(
                F.lit(f"references:{fk}").alias("rule"), "n_violations"
            )
        )
        reports.append(orphans)
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.select(
        "rule",
        F.coalesce("n_violations", F.lit(0)).alias("n_violations"),
        (F.coalesce("n_violations", F.lit(0)) == 0).alias("pass"),
    ).orderBy("rule")
