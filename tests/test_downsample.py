"""Largest-triangle downsampling: spike preservation, edge
retention, pass-through, and bucket counts."""

from __future__ import annotations

import pandas as pd

from stream_processing_system_spark.operators.timeseries import downsample_ltob


def _series(spark, ys, g="a"):
    pdf = pd.DataFrame(
        {"g": [g] * len(ys), "x": range(len(ys)), "y": ys}
    )
    return spark.createDataFrame(pdf)


def test_keeps_endpoints_and_target_count(spark):
    ys = [float(i % 7) for i in range(100)]
    out = downsample_ltob(_series(spark, ys), "g", "x", "y", target=12)
    xs = sorted(r["x"] for r in out.collect())
    assert xs[0] == 0 and xs[-1] == 99
    assert len(xs) == 12  # 2 edges + 10 buckets


def test_preserves_spike(spark):
    """A single huge spike in a flat series must survive — the
    property averaging-based downsampling loses."""
    ys = [1.0] * 100
    ys[57] = 500.0
    out = downsample_ltob(_series(spark, ys), "g", "x", "y", target=12)
    assert 57 in {r["x"] for r in out.collect()}


def test_short_series_passes_through(spark):
    ys = [3.0, 1.0, 2.0]
    out = downsample_ltob(_series(spark, ys), "g", "x", "y", target=12)
    assert sorted(r["x"] for r in out.collect()) == [0, 1, 2]


def test_groups_independent(spark):
    a = _series(spark, [float(i) for i in range(50)], "a")
    b = _series(spark, [1.0, 2.0], "b")
    out = downsample_ltob(a.unionAll(b), "g", "x", "y", target=12)
    by_g = {}
    for r in out.collect():
        by_g.setdefault(r["g"], []).append(r["x"])
    assert len(by_g["a"]) == 12 and sorted(by_g["b"]) == [0, 1]
