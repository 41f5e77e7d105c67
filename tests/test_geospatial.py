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


def _geohash_py(lat: float, lon: float, precision: int) -> str:
    """Independent pure-Python reference: the classic bisection
    formulation of geohash (alternating lon/lat interval halving)."""
    alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    lat_lo, lat_hi, lon_lo, lon_hi = -90.0, 90.0, -180.0, 180.0
    bits, out, even = 0, [], True
    bit_count = 0
    for _ in range(5 * precision):
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                bits = bits * 2 + 1
                lon_lo = mid
            else:
                bits = bits * 2
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits = bits * 2 + 1
                lat_lo = mid
            else:
                bits = bits * 2
                lat_hi = mid
        even = not even
        bit_count += 1
        if bit_count == 5:
            out.append(alpha[bits])
            bits, bit_count = 0, 0
    return "".join(out)


def test_geohash_expr_matches_bisection_reference(spark):
    """The collapsed floor(frac * 2^k) interleave must reproduce the
    classic bisection geohash at precisions 2 and 5, including the
    textbook vector (57.64911, 10.40744) -> 'u4pru'."""
    from pyspark.sql import functions as F

    from stream_processing_system_spark.operators.geospatial import geohash_expr

    pts = [(57.64911, 10.40744), (0.0, 0.0), (-89.9, -179.9), (45.5, -122.6),
           (89.99, 179.99), (-33.86, 151.21), (12.3456, -7.8901)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    for p in (2, 5):
        got = [
            r["gh"]
            for r in df.select(
                geohash_expr(F.col("lat"), F.col("lon"), precision=p).alias("gh")
            ).collect()
        ]
        expect = [_geohash_py(lat, lon, p) for lat, lon in pts]
        assert got == expect
    assert _geohash_py(57.64911, 10.40744, 5) == "u4pru"
