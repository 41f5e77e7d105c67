"""Grid-blocked spatial join: losslessness vs brute force, equi-join
plan shape, and edge inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_processing_system_spark.operators import geospatial


def _brute(points_df, radius):
    a = points_df.select(
        F.col("user_id").alias("_ida"),
        F.col("lat").alias("_lata"),
        F.col("lon").alias("_lona"),
    )
    b = points_df.select(
        F.col("user_id").alias("_idb"),
        F.col("lat").alias("_latb"),
        F.col("lon").alias("_lonb"),
    )
    d2 = (F.col("_lata") - F.col("_latb")) ** 2 + (
        F.col("_lona") - F.col("_lonb")
    ) ** 2
    return (
        a.crossJoin(b)
        .where(F.col("_ida") < F.col("_idb"))
        .where(d2 <= radius * radius)
        .select("_ida", "_idb")
    )


def test_blocking_is_lossless_vs_brute_force(spark, sf_dir):
    ids = spark.range(0, 400).select(F.col("id").alias("user_id"))
    pts = geospatial.derive_points(ids, "user_id")
    blocked = {
        (r["id_a"], r["id_b"])
        for r in geospatial.neighbor_pairs(pts, "user_id", 5.0).collect()
    }
    brute = {(r["_ida"], r["_idb"]) for r in _brute(pts, 5.0).collect()}
    assert blocked == brute
    assert len(blocked) > 0  # non-vacuous at 400 points / 5 degrees


def test_pair_join_is_equi_join(spark):
    """The 3x3 blocking must plan as a hash/sort-merge EQUI join on
    the cell key — a nested-loop pair join is exactly what the
    operator exists to avoid."""
    ids = spark.range(0, 100).select(F.col("id").alias("user_id"))
    pts = geospatial.derive_points(ids, "user_id")
    plan = (
        geospatial.neighbor_pairs(pts, "user_id", 5.0)
        ._jdf.queryExecution()
        .sparkPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_empty_and_single_point(spark):
    empty = spark.range(0, 0).select(F.col("id").alias("user_id"))
    assert (
        geospatial.neighbor_pairs(
            geospatial.derive_points(empty, "user_id"), "user_id", 5.0
        ).count()
        == 0
    )
    one = spark.range(0, 1).select(F.col("id").alias("user_id"))
    assert (
        geospatial.neighbor_pairs(
            geospatial.derive_points(one, "user_id"), "user_id", 5.0
        ).count()
        == 0
    )


def test_boundary_pair_across_cells(spark):
    """Two points straddling a cell boundary at distance < r are
    found (the reason the right side explodes to 3x3)."""
    import pandas as pd

    pdf = pd.DataFrame(
        {"user_id": [1, 2], "lat": [0.1, -0.1], "lon": [4.9, 5.1]}
    )
    pts = spark.createDataFrame(pdf)
    got = geospatial.neighbor_pairs(pts, "user_id", 5.0).collect()
    assert len(got) == 1 and (got[0]["id_a"], got[0]["id_b"]) == (1, 2)
