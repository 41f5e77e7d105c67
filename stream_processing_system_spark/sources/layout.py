"""Storage-layout operators: range-clustered writes and small-file
compaction.

Beyond-reference surface (the reference's only storage layer is the
whole-file SDFS blob store, `daemon/daemon.go:136-166`); at 100 TB
the dominant scan costs are (a) files whose min/max stats can't
prune and (b) metadata overhead from millions of tiny files. These
two operators are the standard lakehouse answers, expressed as plain
Spark writes:

- `write_range_clustered`: `repartitionByRange` + `sortWithinPartitions`
  before the parquet write. Every output file then covers a disjoint
  range of the cluster columns, so parquet footer min/max stats let a
  range predicate skip whole files (and row groups within them) —
  the poor man's Z-order, exact for single-column clustering.
- `compact_parquet`: rewrite a directory of small files into
  ~target-sized ones. File count is computed from actual input bytes,
  not guessed.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write `df` as parquet clustered on `cluster_cols`: range
    repartition (one disjoint key range per output file) + sort
    within each partition (monotone pages → tight row-group stats).

    A subsequent `spark.read.parquet(path).where(col BETWEEN a AND b)`
    pushes the predicate into the reader, and because each file's
    row groups cover a tight disjoint range, the footer min/max
    stats eliminate every non-matching row group — data pages
    outside [a, b] are never decoded. (File-level elimination needs
    partition columns; `build_ivf_index` shows that variant.)"""
    (
        df.repartitionByRange(num_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode(mode)
        .parquet(path)
    )


def zorder_value(
    cols: list[str],
    mins: list[float],
    maxs: list[float],
    bits: int = 10,
):
    """Z-order (Morton) key as a pure built-in expression: each
    column is bucketized to 2^bits uniform cells between its observed
    min/max (constants, one cheap agg — swap in approx-quantile
    boundaries for skewed data), then the cells' bits are interleaved.
    Nearby (x, y, ...) tuples get nearby z-values, so range-clustering
    on z gives MULTI-column file/row-group skipping where plain range
    clustering only serves its leading column."""
    import functools
    import operator

    from pyspark.sql import functions as F

    ncols = len(cols)
    terms = []
    for k, c in enumerate(cols):
        cell = (
            F.width_bucket(
                F.col(c).cast("double"),
                F.lit(float(mins[k])),
                F.lit(float(maxs[k])),
                F.lit(2**bits),
            )
            - 1
        ).cast("long")
        cell = F.least(F.greatest(cell, F.lit(0)), F.lit(2**bits - 1))
        for j in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(cell, j).bitwiseAND(1), j * ncols + k)
            )
    return functools.reduce(operator.add, terms)


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int = 8,
    bits: int = 10,
    mode: str = "overwrite",
) -> None:
    """Write `df` as parquet clustered on the Z-order key of
    `cluster_cols`: every output file covers a compact hyper-rectangle
    neighborhood of the key space, so a box predicate over the
    clustered columns skips most files via footer min/max stats —
    the standard lakehouse multi-dimensional clustering (Delta/Iceberg
    OPTIMIZE ZORDER), as one range-repartitioned write."""
    from pyspark.sql import functions as F

    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"lo_{i}") for i, c in enumerate(cluster_cols)],
        *[F.max(F.col(c).cast("double")).alias(f"hi_{i}") for i, c in enumerate(cluster_cols)],
    ).collect()[0]
    mins = [stats[f"lo_{i}"] for i in range(len(cluster_cols))]
    maxs = [stats[f"hi_{i}"] for i in range(len(cluster_cols))]
    z = zorder_value(cluster_cols, mins, maxs, bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def _local_input_bytes(df: DataFrame) -> int:
    """Total bytes of the df's parquet input files (local paths).

    Local-filesystem implementation for this repo's tests; on a real
    cluster, list sizes via the Hadoop FileSystem API instead — the
    compaction math is identical."""
    total = 0
    for f in df.inputFiles():
        p = f.removeprefix("file:")
        if os.path.exists(p):
            total += os.path.getsize(p)
    return total


def compact_parquet(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-files compaction: rewrite `input_path` into
    ceil(input_bytes / target_file_bytes) files at `output_path`.
    Returns the output file count. Uses coalesce (no shuffle) — the
    rewrite is a pure read+write pass."""
    df = spark.read.parquet(input_path)
    n = max(1, math.ceil(_local_input_bytes(df) / target_file_bytes))
    df.coalesce(n).write.mode("overwrite").parquet(output_path)
    return n


def overwrite_partition_dynamic(
    df: DataFrame,
    table_path: str,
    partition_col: str,
) -> None:
    """Dynamic partition overwrite: replace ONLY the hive partitions
    present in `df`, leaving every other partition's files untouched
    (`partitionOverwriteMode=dynamic`, scoped to this write). The
    restatement primitive for partitioned 100 TB tables — "re-land
    one day" must never mean "rewrite the table", and a static
    overwrite here would truncate all partitions first.
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(table_path)
    )
