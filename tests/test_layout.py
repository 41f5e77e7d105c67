"""Storage-layout tests: range-clustered files have disjoint key
ranges (the property min/max skipping relies on); compaction shrinks
file count without changing data."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from stream_processing_system_spark.sources import layout


def test_write_range_clustered_files_are_disjoint(spark, tmp_path):
    df = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    out = str(tmp_path / "clustered")
    layout.write_range_clustered(df, out, ["k"], num_files=4)

    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert len(files) == 4
    ranges = []
    for f in files:
        row = spark.read.parquet(f).agg(
            F.min("k").alias("lo"), F.max("k").alias("hi")
        ).collect()[0]
        ranges.append((row["lo"], row["hi"]))
    ranges.sort()
    for (lo_a, hi_a), (lo_b, _) in zip(ranges, ranges[1:]):
        assert hi_a < lo_b, f"overlapping file ranges: {ranges}"

    # round-trip: no rows lost or duplicated
    assert spark.read.parquet(out).count() == 10_000


def test_write_zorder_clustered_prunes_boxes(spark, tmp_path):
    """The property multi-dim skipping relies on: each file's
    (x, y) bounding box is compact, so a box predicate intersects few
    files. With x-only range clustering every file spans the full y
    range — a y-selective box would touch ALL files; z-order must do
    strictly better on the same query."""
    df = spark.range(0, 40_000).select(
        (F.pmod(F.xxhash64("id"), 1000)).alias("x"),
        (F.pmod(F.xxhash64(F.col("id") + 1), 1000)).alias("y"),
    )
    out = str(tmp_path / "zorder")
    layout.write_zorder_clustered(df, out, ["x", "y"], num_files=16)

    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert len(files) == 16

    def touches(f, x_lo, x_hi, y_lo, y_hi):
        r = (
            spark.read.parquet(f)
            .agg(F.min("x"), F.max("x"), F.min("y"), F.max("y"))
            .collect()[0]
        )
        return not (r[1] < x_lo or r[0] > x_hi or r[3] < y_lo or r[2] > y_hi)

    # quarter-space box in BOTH dimensions
    touched = sum(touches(f, 0, 249, 0, 249) for f in files)
    assert touched <= 8, f"z-order box touched {touched}/16 files"

    # round-trip: clustering must not lose or duplicate rows
    assert spark.read.parquet(out).count() == 40_000


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    src = str(tmp_path / "small_files")
    spark.range(0, 5_000).repartition(40).write.parquet(src)
    assert len(glob.glob(src + "/part-*.parquet")) == 40

    out = str(tmp_path / "compacted")
    n = layout.compact_parquet(spark, src, out, target_file_bytes=10**9)
    assert n == 1
    assert len(glob.glob(out + "/part-*.parquet")) == 1
    got = {r["id"] for r in spark.read.parquet(out).collect()}
    assert got == set(range(5_000))


def test_registered_compaction_reduces_file_count(spark, sf_dir):
    """The registered compacted_events_scan must actually compact:
    the scanned copy has far fewer files than the 64-file fragmented
    write it was built from."""
    from stream_processing_system_spark.plans.pipeline import (
        _COMPACT_CACHE,
        compacted_events_scan,
    )

    df = compacted_events_scan(spark, sf_dir)
    assert df.count() == 5
    compacted = spark.read.parquet(_COMPACT_CACHE[sf_dir])
    n_files = len(compacted.inputFiles())
    assert n_files < 16, f"compaction left {n_files} files"


def test_dynamic_partition_overwrite_touches_only_its_partition(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from stream_processing_system_spark.sources.layout import (
        overwrite_partition_dynamic,
    )

    path = str(tmp_path / "pt")
    base = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 4).alias("p")
    )
    base.write.partitionBy("p").parquet(path)
    before = {
        p: sorted(os.listdir(os.path.join(path, f"p={p}"))) for p in range(4)
    }
    # restate partition p=2 with corrected values (ids shifted +1000)
    fixed = spark.range(0, 10).select(
        (F.col("id") + 1000).alias("id"), F.lit(2).alias("p")
    )
    overwrite_partition_dynamic(fixed, path, "p")
    after_df = spark.read.parquet(path)
    assert after_df.where("p = 2").count() == 10
    assert after_df.where("p = 2").agg(F.min("id")).collect()[0][0] == 1000
    # untouched partitions keep IDENTICAL files (not rewritten copies)
    for p in (0, 1, 3):
        assert sorted(os.listdir(os.path.join(path, f"p={p}"))) == before[p]
        assert after_df.where(f"p = {p}").count() == 25
