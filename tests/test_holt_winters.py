"""Holt-Winters additive: the Spark fold must agree exactly (after
det_round) with an independent pure-Python reference on constructed
data with a clean planted weekly season + linear trend."""

from __future__ import annotations

import datetime
import math
import os


def _reference_hw(cents):
    y = [c / 100.0 for c in cents]
    m1 = sum(y[0:7]) / 7.0
    m2 = sum(y[7:14]) / 7.0
    l, b = m1, (m2 - m1) / 7.0
    seas = [y[i] - m1 for i in range(7)]
    sse = 0.0
    for t in range(7, len(y)):
        v, s7, lp, bp = y[t], seas[0], l, b
        l = 0.5 * (v - s7) + 0.5 * (lp + bp)
        b = 0.25 * (l - lp) + 0.75 * bp
        sn = 0.25 * (v - l) + 0.75 * s7
        sse += (v - ((lp + bp) + s7)) ** 2
        seas = seas[1:] + [sn]
    dr = lambda x: math.floor(x * 1e6 + 0.5) / 1e6
    return [dr(l + h * b + seas[h - 1]) for h in range(1, 8)], dr(sse)


def test_hw_matches_reference_and_tracks_season(spark, tmp_path):
    from stream_processing_system_spark.plans.analytics import events_holt_winters

    # weekly season [0,10,20,30,40,50,60] + trend 2/day, 28 days
    cents = []
    for i in range(28):
        val = 100.0 + 2.0 * i + 10.0 * (i % 7)
        cents.append(int(round(val * 100)))
    events = [
        (i, datetime.datetime(2024, 1, 1 + i, 12, 0), 1, "x",
         cents[i] / 100.0, "{}")
        for i in range(28)
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        events,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))

    rows = events_holt_winters(spark, sf).collect()
    fc, sse = _reference_hw(cents)
    got = {r["h"]: r for r in rows}
    assert len(got) == 7
    for h in range(1, 8):
        assert got[h]["forecast"] == fc[h - 1]
        assert got[h]["sse"] == sse
    # a clean additive season + linear trend is forecast near-exactly:
    # day 28+h true value = 100 + 2*(28+h-1) + 10*((28+h-1) % 7)
    for h in range(1, 8):
        true = 100.0 + 2.0 * (27 + h) + 10.0 * ((27 + h) % 7)
        # (21 recursion steps at alpha=.5 leave ~4% residual bias)
        assert abs(got[h]["forecast"] - true) < 12.0


def test_hw_backtest_beats_naive_on_clean_season(spark, tmp_path):
    """On an exact additive season + trend, HW beats the seasonal
    naive (which misses the 7-day trend by exactly 2*7 = 14)."""
    from stream_processing_system_spark.plans.analytics import events_hw_backtest

    events = []
    for i in range(30):
        val = 100.0 + 2.0 * i + 10.0 * (i % 7)
        events.append(
            (i, datetime.datetime(2024, 1, 1 + i, 12, 0), 1, "x", val, "{}")
        )
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        events,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))
    rows = events_hw_backtest(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_origins"] == 8
    # seasonal naive is off by exactly the 7-day trend: 14.0
    assert abs(r["naive_mae"] - 14.0) < 1e-6
    assert r["mase_ratio"] < 1.0
    assert r["hw_mae"] < 14.0
