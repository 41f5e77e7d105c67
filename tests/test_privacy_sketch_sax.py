"""Semantics pins for the round-3 additions: t-closeness EMD,
SAX symbolic words, and the Count–Min heavy-hitter sketch. The
DuckDB oracle covers cross-engine parity; these tests check the
MATH on constructed inputs with hand-computed answers."""

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


def test_t_closeness_emd_polarized_groups(spark, tmp_path):
    """Two QI groups at opposite ends of the band axis: global dist is
    half band-0 half band-9, each group's EMD from it is exactly 0.5
    (hand-computed: |cumc*N - cumG*gsz| = 16 for each of the 9
    cumulative terms, 144 / (9*4*8) = 0.5)."""
    from stream_processing_system_spark.plans.analytics import events_t_closeness

    d = datetime.datetime(2024, 1, 1, 0, 30)  # hour 0 for everyone
    events = [(i, d, 1, "x", 5.0, "{}") for i in range(4)] + [
        (10 + i, d, 1, "y", 95.0, "{}") for i in range(4)
    ]
    rows = events_t_closeness(spark, _sf(tmp_path, spark, events)).collect()
    got = {r["event_type"]: r for r in rows}
    assert set(got) == {"x", "y"}
    for t in ("x", "y"):
        assert got[t]["n_groups"] == 1
        assert abs(got[t]["max_t"] - 0.5) < 1e-12
        assert got[t]["groups_above_t02"] == 1


def test_t_closeness_uniform_group_is_zero(spark, tmp_path):
    """A single QI group IS the global distribution -> EMD 0."""
    from stream_processing_system_spark.plans.analytics import events_t_closeness

    d = datetime.datetime(2024, 1, 1, 7, 0)
    events = [(i, d, 1, "x", float(v), "{}") for i, v in enumerate([5, 15, 25, 95])]
    rows = events_t_closeness(spark, _sf(tmp_path, spark, events)).collect()
    assert len(rows) == 1
    assert rows[0]["max_t"] == 0.0
    assert rows[0]["groups_above_t02"] == 0


def test_sax_word_two_level_series(spark, tmp_path):
    """Daily means [10,10,20,20] z-normalize to [-1,-1,+1,+1] ->
    symbols a,a,d,d at the Gaussian breakpoints (-0.6745, 0, 0.6745),
    ordered by day."""
    from stream_processing_system_spark.plans.analytics import events_sax_daily

    days = [datetime.datetime(2024, 1, 1 + i, 12, 0) for i in range(4)]
    vals = [10.0, 10.0, 20.0, 20.0]
    events = [(i, days[i], 1, "x", vals[i], "{}") for i in range(4)]
    rows = events_sax_daily(spark, _sf(tmp_path, spark, events)).collect()
    assert len(rows) == 1
    assert rows[0]["n_days"] == 4
    assert rows[0]["sax_word"] == "aadd"


def test_sax_constant_series_all_c(spark, tmp_path):
    """Zero variance -> z defined as 0 -> symbol 'c' everywhere."""
    from stream_processing_system_spark.plans.analytics import events_sax_daily

    days = [datetime.datetime(2024, 1, 1 + i, 12, 0) for i in range(3)]
    events = [(i, days[i], 1, "x", 7.0, "{}") for i in range(3)]
    rows = events_sax_daily(spark, _sf(tmp_path, spark, events)).collect()
    assert rows[0]["sax_word"] == "ccc"


def test_countmin_no_collision_exact(spark, tmp_path):
    """Users 1..3 hash to disjoint cells in all four rows (verified
    offline against hashlib.md5), so every estimate is exact and the
    ranking is by true count."""
    from stream_processing_system_spark.plans.analytics import (
        user_countmin_heavy_hitters,
    )

    d = datetime.datetime(2024, 1, 1)
    events = []
    for uid, cnt in ((1, 5), (2, 3), (3, 1)):
        for k in range(cnt):
            events.append((len(events), d, uid, "click", 1.0, "{}"))
    rows = user_countmin_heavy_hitters(spark, _sf(tmp_path, spark, events)).collect()
    assert [(r["user_id"], r["est_count"], r["true_count"], r["overestimate"]) for r in rows] == [
        (1, 5, 5, 0),
        (2, 3, 3, 0),
        (3, 1, 1, 0),
    ]


def test_countmin_never_undercounts(spark, tmp_path):
    """CM invariant: min-of-rows estimate >= true count, always."""
    from stream_processing_system_spark.plans.analytics import (
        user_countmin_heavy_hitters,
    )

    d = datetime.datetime(2024, 1, 1)
    events = []
    for uid in range(40):
        for k in range(1 + uid % 7):
            events.append((len(events), d, uid, "view", 1.0, "{}"))
    rows = user_countmin_heavy_hitters(spark, _sf(tmp_path, spark, events)).collect()
    assert len(rows) == 20
    assert all(r["overestimate"] >= 0 for r in rows)
    ests = [(r["est_count"], r["true_count"], -r["user_id"]) for r in rows]
    assert ests == sorted(ests, reverse=True)
