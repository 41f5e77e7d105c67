"""Semantics pins for R/S Hurst analysis and sequential-pattern
support counting on constructed inputs."""

from __future__ import annotations

import datetime
import os


def _sf(tmp_path, spark, events):
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        events,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))
    return sf


def test_hurst_trend_vs_alternating(spark, tmp_path):
    """A monotone trend has long memory (H near 1); a strict
    alternation is maximally mean-reverting (H near 0). Values
    observed via the oracle SQL: 1.0185 and 0.0340."""
    from stream_processing_system_spark.plans.analytics import events_hurst_exponent

    events = []
    for i in range(30):
        events.append(
            (len(events), datetime.datetime(2024, 1, 1 + i, 12, 0), 1,
             "trend", 10.0 * (i + 1), "{}")
        )
        events.append(
            (len(events), datetime.datetime(2024, 1, 1 + i, 12, 0), 1,
             "alt", 10.0 if i % 2 else 20.0, "{}")
        )
    rows = events_hurst_exponent(spark, _sf(tmp_path, spark, events)).collect()
    got = {r["event_type"]: r for r in rows}
    assert got["trend"]["n_window_sizes"] == 3
    assert got["trend"]["hurst"] > 0.9
    assert got["alt"]["hurst"] < 0.2


def test_sequential_pattern_supports(spark, tmp_path):
    """user 1: a,b,c in order; user 2: b then a. Hand-enumerated
    supports for every emitted 2- and 3-pattern."""
    from stream_processing_system_spark.plans.analytics import (
        event_sequential_patterns,
    )

    def ts(m):
        return datetime.datetime(2024, 1, 1, 0, m)

    events = [
        (0, ts(1), 1, "a", 1.0, "{}"),
        (1, ts(2), 1, "b", 1.0, "{}"),
        (2, ts(3), 1, "c", 1.0, "{}"),
        (3, ts(1), 2, "b", 1.0, "{}"),
        (4, ts(2), 2, "a", 1.0, "{}"),
    ]
    rows = event_sequential_patterns(spark, _sf(tmp_path, spark, events)).collect()
    got = {(r["pattern"], r["length"]): r["support"] for r in rows}
    assert got == {
        ("a>b", 2): 1,
        ("a>c", 2): 1,
        ("b>c", 2): 1,
        ("b>a", 2): 1,
        ("a>b>c", 3): 1,
    }


def test_sequential_pattern_repeat_needs_two(spark, tmp_path):
    """x>x requires two x occurrences at distinct times."""
    from stream_processing_system_spark.plans.analytics import (
        event_sequential_patterns,
    )

    def ts(m):
        return datetime.datetime(2024, 1, 1, 0, m)

    events = [
        (0, ts(1), 1, "a", 1.0, "{}"),
        (1, ts(2), 1, "a", 1.0, "{}"),
        (2, ts(1), 2, "a", 1.0, "{}"),
    ]
    rows = event_sequential_patterns(spark, _sf(tmp_path, spark, events)).collect()
    got = {(r["pattern"], r["length"]): r["support"] for r in rows}
    assert got == {("a>a", 2): 1}


def test_entropy_rate_deterministic_chain_is_zero(spark, tmp_path):
    """A strict a->b->a->b chain has P(next|cur)=1 everywhere ->
    entropy rate exactly 0."""
    from stream_processing_system_spark.plans.analytics import events_entropy_rate

    def ts(m):
        return datetime.datetime(2024, 1, 1, 0, m)

    events = [
        (i, ts(i), 1, "a" if i % 2 == 0 else "b", 1.0, "{}") for i in range(10)
    ]
    rows = events_entropy_rate(spark, _sf(tmp_path, spark, events)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_transitions"] == 9
    assert r["entropy_rate_nats"] == 0.0
    assert r["predictability_ratio"] == 0.0


def test_entropy_rate_uniform_is_maximal(spark, tmp_path):
    """Both symbols transition 50/50 -> H = ln(2), and with alphabet
    k=2 the normalized predictability ratio is 1."""
    from stream_processing_system_spark.plans.analytics import events_entropy_rate

    def ts(m):
        return datetime.datetime(2024, 1, 1, 0, m)

    # user 1: a,a,b,a,b,... constructed so both a and b emit 50/50
    seq = ["a", "a", "b", "b", "a", "a", "b", "b", "a"]
    events = [(i, ts(i), 1, t, 1.0, "{}") for i, t in enumerate(seq)]
    rows = events_entropy_rate(spark, _sf(tmp_path, spark, events)).collect()
    r = rows[0]
    # transitions: a->a x2, a->b x2, b->b x2, b->a x2 -> H = ln 2
    assert r["n_transitions"] == 8
    assert abs(r["entropy_rate_nats"] - 0.693147) < 1e-3
    assert abs(r["predictability_ratio"] - 1.0) < 1e-3


def test_pacf_matches_independent_durbin_levinson(spark, tmp_path):
    """Arbitrary 20-day series: the Spark PACF must equal a pure-
    Python Durbin-Levinson run on the same lattice autocovariances."""
    from stream_processing_system_spark.plans.analytics import events_pacf

    vals = [12, 15, 11, 18, 14, 19, 13, 22, 17, 25,
            16, 28, 21, 30, 19, 27, 24, 33, 26, 35]
    events = [
        (i, datetime.datetime(2024, 1, 1 + i, 12, 0), 1, "x", float(v), "{}")
        for i, v in enumerate(vals)
    ]
    rows = events_pacf(spark, _sf(tmp_path, spark, events)).collect()
    assert len(rows) == 1

    # independent reference on the identical integer lattice
    n = len(vals)
    dm = [v * 1_000_000 for v in vals]  # exact micro grid
    sx = sum(dm)
    d = [n * x - sx for x in dm]
    den = sum(x * x for x in d)
    rho = {k: sum(d[t] * d[t + k] for t in range(n - k)) / den
           for k in range(1, 6)}
    phi = {1: {1: rho[1]}}
    pacf = {1: rho[1]}
    for k in range(2, 6):
        num = rho[k]
        dd = 1.0
        for j in range(1, k):
            num -= phi[k - 1][j] * rho[k - j]
            dd -= phi[k - 1][j] * rho[j]
        kk = num / dd
        phi[k] = {k: kk}
        for j in range(1, k):
            phi[k][j] = phi[k - 1][j] - kk * phi[k - 1][k - j]
        pacf[k] = kk
    import math
    for k in range(1, 6):
        exp = math.floor(pacf[k] * 1e6 + 0.5) / 1e6
        assert abs(rows[0][f"pacf_{k}"] - exp) <= 1e-6, (k, rows[0][f"pacf_{k}"], exp)


def test_spectral_entropy_periodic_below_scrambled(spark, tmp_path):
    """A strong weekly impulse train concentrates spectral power ->
    lower entropy than a scrambled series (values observed via the
    oracle: 1.488 vs 1.751 nats); flatness ratios stay in (0, 1]."""
    from stream_processing_system_spark.plans.analytics import (
        events_spectral_entropy,
    )

    events = []
    for i in range(28):
        events.append(
            (len(events), datetime.datetime(2024, 1, 1 + i, 12, 0), 1,
             "weekly", 100.0 if i % 7 == 0 else 10.0, "{}")
        )
        events.append(
            (len(events), datetime.datetime(2024, 1, 1 + i, 12, 0), 1,
             "noise", 10.0 + 17.3 * ((i * i * 7919) % 13), "{}")
        )
    rows = events_spectral_entropy(spark, _sf(tmp_path, spark, events)).collect()
    got = {r["event_type"]: r for r in rows}
    assert got["weekly"]["spectral_entropy_nats"] < got["noise"]["spectral_entropy_nats"]
    for r in rows:
        assert 0 < r["flatness_ratio"] <= 1.0


def test_bollinger_flat_series_no_breach_spike_breaches(spark, tmp_path):
    """A flat series has sigma 0 (bands collapse to the mean, breach
    0 everywhere); a single huge spike day breaches its own window's
    upper band."""
    from stream_processing_system_spark.plans.analytics import events_bollinger_bands

    events = []
    for i in range(10):
        events.append(
            (len(events), datetime.datetime(2024, 1, 1 + i, 12, 0), 1,
             "flat", 50.0, "{}")
        )
        events.append(
            (len(events), datetime.datetime(2024, 1, 1 + i, 12, 0), 1,
             "spiky", 500.0 if i == 8 else 50.0, "{}")
        )
    rows = events_bollinger_bands(spark, _sf(tmp_path, spark, events)).collect()
    flat = [r for r in rows if r["event_type"] == "flat"]
    spiky = {r["day"].isoformat(): r for r in rows if r["event_type"] == "spiky"}
    assert len(flat) == 4  # 10 days -> 4 complete 7-day windows
    assert all(r["breach"] == 0 and r["lower"] == r["upper"] == 50.0 for r in flat)
    assert spiky["2024-01-09"]["breach"] == 1
    assert spiky["2024-01-08"]["breach"] == 0


def test_voptimal_finds_planted_levels(spark, tmp_path):
    """A series of 6 flat plateaus (5 days each) has a perfect
    6-bucket partition with zero SSE; the DP must find exactly it."""
    from stream_processing_system_spark.plans.analytics import (
        events_voptimal_histogram,
    )

    vals = []
    for lvl in (10, 40, 20, 80, 50, 120):
        vals += [float(lvl)] * 5
    events = [
        (i, datetime.datetime(2024, 1, 1 + i, 12, 0), 1, "x", v, "{}")
        for i, v in enumerate(vals)
    ]
    rows = events_voptimal_histogram(
        spark, _sf(tmp_path, spark, events)
    ).collect()
    assert [(r["bucket"], r["start_pos"], r["end_pos"]) for r in rows] == [
        (b, 5 * (b - 1) + 1, 5 * b) for b in range(1, 7)
    ]
    assert all(r["bucket_sse"] == 0 and r["total_sse"] == 0 for r in rows)


def test_hill_estimator_recovers_pareto_alpha(spark, tmp_path):
    """Deterministic Pareto(alpha=2) sample via inverse-CDF on an
    equally-spaced grid: the Hill estimator must land near 2."""
    from stream_processing_system_spark.plans.analytics import (
        events_hill_tail_index,
    )

    events = []
    n = 400
    for i in range(n):
        u = (i + 0.5) / n
        x = 1.0 / ((1.0 - u) ** 0.5)  # Pareto alpha=2 inverse CDF
        events.append(
            (i, datetime.datetime(2024, 1, 1, 0, 0, i % 60, i), 1, "x",
             round(x, 2), "{}")
        )
    rows = events_hill_tail_index(spark, _sf(tmp_path, spark, events)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["k"] == 100
    assert 1.6 < r["alpha_hat"] < 2.4
