"""Perceptual time-series downsampling (largest-triangle family).

Dashboards cannot plot a billion points; the standard
shape-preserving reduction is Steinarsson's largest-triangle family
(the LTTB thesis): bucket the series, keep one point per bucket —
the one forming the largest triangle with its neighbors, which
preserves spikes and inflections where naive per-bucket averaging
flattens them.

This module implements the ONE-BUCKET variant (LTOB): each point's
effective area uses its immediate neighbors, so selection is a pure
window computation — lag/lead + a per-bucket argmax — with no
sequential dependency between buckets. (Full LTTB chains each
bucket's choice to the previous selection; that fold is inherently
sequential per series. LTOB is the variant that parallelizes over a
cluster, and the thesis's own benchmarks show near-identical visual
fidelity on real series.)

Shape: everything is partitioned by series key — two window passes
(neighbors + per-bucket rank) over rows already collapsed to the
plotted grain (days here). No collect, no fold, no Python. Bucket
assignment is exact integer arithmetic; triangle areas are fixed
operand-order double products, so the selection is reproducible
cross-engine and differentially testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def downsample_ltob(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    target: int = 12,
) -> DataFrame:
    """Reduce each group's (x, y) series to ~`target` points: first
    and last always kept; middle points bucketed evenly and the
    largest-effective-area point kept per bucket (ties -> smallest
    x). Groups with <= target points pass through untouched.
    `x_col` must be unique per group (one row per time grain)."""
    w = Window.partitionBy(group_col).orderBy(x_col)
    wg = Window.partitionBy(group_col)
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    xl, yl = F.lag(x).over(w), F.lag(y).over(w)
    xr, yr = F.lead(x).over(w), F.lead(y).over(w)
    area = F.abs((xl - xr) * (y - yl) - (xl - x) * (yr - yl))
    idx = (F.row_number().over(w) - 1).cast("long")
    n = F.count(F.lit(1)).over(wg).cast("long")
    staged = df.select(
        "*",
        idx.alias("_idx"),
        n.alias("_n"),
        area.alias("_area"),
    )
    # bucket: edges get their own sentinel buckets and always win;
    # middle points spread over target-2 equal buckets (exact ints)
    bucket = (
        F.when(F.col("_idx") == 0, F.lit(-1))
        .when(F.col("_idx") == F.col("_n") - 1, F.lit(-2))
        .otherwise(
            F.floor(
                ((F.col("_idx") - 1) * F.lit(target - 2)).cast("double")
                / (F.col("_n") - 2).cast("double")
            )
        )
        .cast("long")
    )
    staged = staged.withColumn("_bucket", bucket)
    wb = Window.partitionBy(group_col, "_bucket").orderBy(
        F.col("_area").desc_nulls_last(), F.col(x_col).asc()
    )
    return (
        staged.withColumn("_rn", F.row_number().over(wb))
        .where((F.col("_n") <= target) | (F.col("_rn") == 1))
        .drop("_idx", "_n", "_area", "_bucket", "_rn")
    )
