"""Differential fuzz for the round-6 day-grain statistics: the Spark
cores vs the pure-Python replays from test_round6_ops on randomized
(possibly gappy, tie-heavy) daily series — a third implementation
besides the DuckDB oracle, run BEFORE these queries hit the round-7
driver window."""

from __future__ import annotations

import pytest

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.test_round6_ops import (
    _ar2_replay,
    _det_round,
    _kw_replay,
    _mk_replay,
    _ph_replay,
)


#: slow tier (round 10, VERDICT r9 item 7): independent replay /
#: property / soak coverage, excluded from the default run so the
#: driver's verify window fits; run with `pytest -m slow`.
pytestmark = pytest.mark.slow

SET = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

#: small integer series with deliberate tie mass; 3..16 days
series_strategy = st.lists(
    st.integers(min_value=-5, max_value=8), min_size=3, max_size=16
)


def _consecutive_daily(spark, series):
    rows = [
        ("a", dt.date(2024, 1, 1) + dt.timedelta(days=i), int(v))
        for i, v in enumerate(series)
    ]
    return spark.createDataFrame(
        rows, "event_type string, day date, x long"
    )


@given(series=series_strategy)
@SET
def test_fuzz_mann_kendall(spark, series):
    from stream_processing_system_spark.plans.analytics import (
        mann_kendall_from_daily,
    )

    out = mann_kendall_from_daily(_consecutive_daily(spark, series)).collect()[0]
    n, s, var_s, z, trend = _mk_replay(series)
    assert (out["n_days"], out["s_stat"]) == (n, s)
    assert out["var_s"] == var_s
    assert out["z_score"] == z
    assert out["trend"] == trend


@given(series=series_strategy)
@SET
def test_fuzz_kruskal_wallis(spark, series):
    from stream_processing_system_spark.plans.analytics import (
        kruskal_wallis_from_daily,
    )

    out = kruskal_wallis_from_daily(
        _consecutive_daily(spark, series)
    ).collect()[0]
    n, k, h, h_corr, eps2 = _kw_replay(series)
    assert (out["n_days"], out["n_groups"]) == (n, k)
    assert out["h_stat"] == h
    assert out["h_corrected"] == h_corr
    assert out["epsilon_sq"] == eps2


@given(series=series_strategy)
@SET
def test_fuzz_page_hinkley(spark, series):
    from stream_processing_system_spark.plans.analytics import (
        page_hinkley_from_daily,
    )

    out = page_hinkley_from_daily(_consecutive_daily(spark, series)).collect()[0]
    n, ph_max, ph_max_day, alarm_day, threshold = _ph_replay(series)
    assert out["n_days"] == n
    assert out["ph_max"] == ph_max
    assert out["ph_max_day"] == ph_max_day
    assert out["alarm_day"] == alarm_day
    assert out["threshold"] == threshold


@given(series=series_strategy)
@SET
def test_fuzz_ar2(spark, series):
    from stream_processing_system_spark.plans.analytics import (
        ar2_yule_walker_from_daily,
    )

    out = ar2_yule_walker_from_daily(
        _consecutive_daily(spark, series)
    ).collect()[0]
    r1, r2, phi1, phi2, sig, fc = _ar2_replay(series)
    assert out["r1"] == r1
    assert out["r2"] == r2
    assert out["phi1"] == phi1
    assert out["phi2"] == phi2
    assert out["innov_ratio"] == sig
    assert out["forecast_next"] == fc


@given(series=series_strategy)
@SET
def test_fuzz_dispersion(spark, series):
    import math

    from stream_processing_system_spark.plans.analytics import (
        dispersion_index_from_daily,
    )

    counts = [abs(v) + 1 for v in series]  # daily counts are >= 1
    daily = spark.createDataFrame(
        [
            ("a", dt.date(2024, 1, 1) + dt.timedelta(days=i), int(c))
            for i, c in enumerate(counts)
        ],
        "event_type string, day date, c long",
    )
    out = dispersion_index_from_daily(daily).collect()[0]
    n = float(len(counts))
    sc, scc = float(sum(counts)), float(sum(c * c for c in counts))
    mean = sc / n
    s2 = (scc - sc * sc / n) / (n - 1.0)
    disp = s2 / mean if mean > 0.0 else None
    assert out["mean_daily"] == _det_round(mean)
    assert out["var_daily"] == _det_round(s2)
    assert out["dispersion"] == _det_round(disp)
    if disp is not None:
        z = (disp - 1.0) * math.sqrt((n - 1.0) / 2.0)
        assert out["z_score"] == _det_round(z)


@given(series=series_strategy)
@SET
def test_fuzz_welch(spark, series):
    import math

    from stream_processing_system_spark.plans.analytics import (
        welch_ttest_from_daily,
    )

    out = welch_ttest_from_daily(_consecutive_daily(spark, series)).collect()[0]
    wk, wd = [], []
    for i, v in enumerate(series):
        (wk if (19723 + i) % 7 in (2, 3) else wd).append(v)
    n1, n2 = len(wk), len(wd)
    assert out["n_weekend"] == n1
    assert out["n_weekday"] == n2
    if n1 > 1 and n2 > 1:
        s1, s2_ = float(sum(wk)), float(sum(wd))
        q1, q2 = float(sum(v * v for v in wk)), float(
            sum(v * v for v in wd)
        )
        v1 = (q1 - s1 * s1 / n1) / (n1 - 1.0)
        v2 = (q2 - s2_ * s2_ / n2) / (n2 - 1.0)
        se2 = v1 / n1 + v2 / n2
        if se2 > 0.0:
            t = (s1 / n1 - s2_ / n2) / math.sqrt(se2)
            assert out["t_stat"] == _det_round(t)
        else:
            assert out["t_stat"] is None
