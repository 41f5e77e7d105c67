"""Differential fuzz for the time-series analytics: the Spark plans
vs independent pure-Python implementations on randomized event
frames (a third implementation besides the DuckDB oracle — catches
shared misreadings of the spec)."""

from __future__ import annotations

import datetime
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F  # noqa: F401

SET = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

#: (day_offset, value) per event; 1-2 types
events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=15),
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        st.sampled_from(["a", "b"]),
    ),
    min_size=1,
    max_size=40,
)


def _frame(spark, tmp_events):
    base = datetime.datetime(2024, 3, 1)
    rows = [
        (i, base + datetime.timedelta(days=d, hours=i % 24), 1, t, v, "{}")
        for i, (d, v, t) in enumerate(tmp_events)
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )


def _daily(tmp_events):
    """centi-quantized daily means, keyed (type, day-offset)."""
    acc: dict[tuple, list] = {}
    for d, v, t in tmp_events:
        acc.setdefault((t, d), []).append(math.floor(v * 100 + 0.5))
    return {
        k: (sum(vs) / 100.0) / len(vs) for k, vs in sorted(acc.items())
    }


def _write(spark, df, tmp_path):
    import os

    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))
    return sf


@given(evs=events_strategy)
@SET
def test_ewma_matches_python(spark, tmp_path_factory, evs):
    from stream_processing_system_spark.plans.analytics import events_ewma_daily

    tmp = tmp_path_factory.mktemp("ewma")
    sf = _write(spark, _frame(spark, evs), tmp)
    got = {
        r["event_type"]: (r["n_days"], r["ewma"])
        for r in events_ewma_daily(spark, sf).collect()
    }
    daily = _daily(evs)
    for t in {t for _, _, t in evs}:
        vals = [v for (tt, _), v in daily.items() if tt == t]
        acc = vals[0]
        for x in vals[1:]:
            acc = (3 * acc + x) / 4
        n, e = got[t]
        assert n == len(vals)
        assert abs(e - round(acc, 6)) < 1e-9


@given(evs=events_strategy)
@SET
def test_cusum_matches_python(spark, tmp_path_factory, evs):
    from stream_processing_system_spark.plans.analytics import (
        events_cusum_changepoint,
    )

    tmp = tmp_path_factory.mktemp("cusum")
    sf = _write(spark, _frame(spark, evs), tmp)
    got = {
        r["event_type"]: (r["peak_day"], r["cusum"])
        for r in events_cusum_changepoint(spark, sf).collect()
    }
    # python reference over daily centi SUMS
    acc: dict[tuple, int] = {}
    for d, v, t in evs:
        acc[(t, d)] = acc.get((t, d), 0) + math.floor(v * 100 + 0.5)
    for t in {t for _, _, t in evs}:
        days = sorted(d for (tt, d) in acc if tt == t)
        s = [acc[(t, d)] for d in days]
        n, total = len(s), sum(s)
        best = None
        run = 0
        for d, sv in zip(days, s):
            run += n * sv - total
            if best is None or abs(run) > best[0]:
                best = (abs(run), d, run)
        peak_day, cusum = got[t]
        base = datetime.date(2024, 3, 1)
        assert cusum == best[2]
        assert peak_day == str(base + datetime.timedelta(days=best[1]))


@given(evs=events_strategy)
@SET
def test_rolling_median_matches_python(spark, tmp_path_factory, evs):
    from stream_processing_system_spark.plans.analytics import (
        events_rolling_median,
    )

    tmp = tmp_path_factory.mktemp("med")
    sf = _write(spark, _frame(spark, evs), tmp)
    got = {
        (r["event_type"], r["day"]): (r["n_in_window"], r["med7"])
        for r in events_rolling_median(spark, sf).collect()
    }
    daily = _daily(evs)
    base = datetime.date(2024, 3, 1)
    for t in {t for _, _, t in evs}:
        series = [(d, v) for (tt, d), v in daily.items() if tt == t]
        for i, (d, _) in enumerate(series):
            win = sorted(v for _, v in series[max(0, i - 6) : i + 1])
            n = len(win)
            med = win[n // 2] if n % 2 == 1 else (win[n // 2 - 1] + win[n // 2]) / 2
            day = str(base + datetime.timedelta(days=d))
            gn, gm = got[(t, day)]
            assert gn == n
            assert abs(gm - round(med, 6)) < 1e-9
