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
