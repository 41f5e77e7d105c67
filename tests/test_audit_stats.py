"""Data-audit statistics: Benford first-digit extraction and the Gini
concentration coefficient, checked on constructed inputs with known
answers (the DuckDB oracle covers cross-engine parity; these pin the
semantics)."""

from __future__ import annotations

import datetime
import os


def _sf(tmp_path, spark, orders=None, events=None):
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    if orders is not None:
        spark.createDataFrame(
            orders,
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ).write.mode("overwrite").parquet(os.path.join(sf, "orders.parquet"))
    if events is not None:
        spark.createDataFrame(
            events,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))
    return sf


def test_benford_digit_extraction(spark, tmp_path):
    from stream_processing_system_spark.plans.analytics import orders_benford

    d = datetime.datetime(2024, 1, 1)
    # first significant digit of the CENT grid: 912.34 -> 9, 0.07 -> 7
    prices = [912.34, 123.0, 0.07, 19999.99, 2.5]
    orders = [(i, 1, "O", p, d, "1-URGENT") for i, p in enumerate(prices)]
    rows = orders_benford(spark, _sf(tmp_path, spark, orders=orders)).collect()
    got = {r["digit"]: r["n_obs"] for r in rows}
    assert got == {9: 1, 1: 2, 7: 1, 2: 1}
    total = sum(got.values())
    # expectations sum to ~total over all 9 digits (we only see 4)
    for r in rows:
        assert 0 < r["n_expected"] < total
        assert r["chi2_term"] >= 0


def test_gini_uniform_and_concentrated(spark, tmp_path):
    from stream_processing_system_spark.plans.analytics import user_activity_gini

    d = datetime.datetime(2024, 1, 1)
    ev = []
    # type "flat": 4 users x 5 events each -> gini 0
    i = 0
    for u in range(4):
        for _ in range(5):
            ev.append((i, d, u, "flat", 1.0, "{}"))
            i += 1
    # type "spike": one user has 97 events, three have 1 each
    for u, n in [(0, 97), (1, 1), (2, 1), (3, 1)]:
        for _ in range(n):
            ev.append((i, d, u, "spike", 1.0, "{}"))
            i += 1
    rows = {
        r["event_type"]: r
        for r in user_activity_gini(spark, _sf(tmp_path, spark, events=ev)).collect()
    }
    assert rows["flat"]["gini"] == 0.0
    # exact: counts [1,1,1,97], G = 2*(1+2+3+4*97)/(4*100) - 5/4 = 0.72
    assert abs(rows["spike"]["gini"] - 0.72) < 1e-9
    assert rows["spike"]["n_users"] == 4 and rows["spike"]["n_events"] == 100


def test_record_linkage_no_false_positives(spark, sf_dir):
    """Every linked pair must be a true (a, dirty-copy-of-a) pair —
    blocking plus the >=4 score threshold may DROP doubly-corrupted
    records (balance off by 3 cents AND blanked segment, ~(2/7)(1/11)
    of the copies) but must never link two different customers."""
    from stream_processing_system_spark.plans.analytics import (
        customer_record_linkage,
    )

    rows = customer_record_linkage(spark, sf_dir).collect()
    assert rows, "no links found at all"
    assert all(r["a_id"] == r["b_id"] for r in rows)
    assert all(r["score"] >= 4 for r in rows)


def test_stationary_distribution_sums_to_one(spark, sf_dir):
    from stream_processing_system_spark.plans.analytics import (
        event_type_stationary,
    )

    rows = event_type_stationary(spark, sf_dir).collect()
    assert len(rows) >= 2
    # integer-grid rounding loses < 1e-6 of the mass per round
    assert abs(sum(r["stationary"] for r in rows) - 1.0) < 1e-4
    assert all(r["stationary"] > 0 for r in rows)


def test_rolling_7d_distinct_semantics(spark, tmp_path):
    """A user active on day 0 must count in windows ending day 0..6
    and drop out on day 7; only observed days are reported."""
    import datetime

    from stream_processing_system_spark.plans.analytics import (
        rolling_7d_distinct_users,
    )

    d0 = datetime.datetime(2024, 1, 1)
    ev = [
        (1, d0, 10, "click", 1.0, "{}"),
        # user 20 appears on day 6 (inside user 10's last window)
        (2, d0 + datetime.timedelta(days=6), 20, "click", 1.0, "{}"),
        # day 7: only user 20's window still contains user 20
        (3, d0 + datetime.timedelta(days=7), 20, "click", 1.0, "{}"),
    ]
    rows = {
        r["day"]: r["distinct_users_7d"]
        for r in rolling_7d_distinct_users(
            spark, _sf(tmp_path, spark, events=ev)
        ).collect()
    }
    # observed days only: 01-01, 01-07, 01-08
    assert rows == {"2024-01-01": 1, "2024-01-07": 2, "2024-01-08": 1}


def test_activity_streaks_semantics(spark, tmp_path):
    import datetime

    from stream_processing_system_spark.plans.analytics import (
        user_activity_streaks,
    )

    d0 = datetime.datetime(2024, 1, 1)
    ev = []
    # user 1: days 0,1,2 then 5,6 -> best streak 3 starting 01-01
    for i, d in enumerate([0, 1, 2, 5, 6]):
        ev.append((i, d0 + datetime.timedelta(days=d), 1, "click", 1.0, "{}"))
    # user 2: two 2-day streaks; tie broken by EARLIEST start
    for i, d in enumerate([3, 4, 8, 9]):
        ev.append((100 + i, d0 + datetime.timedelta(days=d), 2, "click", 1.0, "{}"))
    rows = {
        r["user_id"]: r
        for r in user_activity_streaks(
            spark, _sf(tmp_path, spark, events=ev)
        ).collect()
    }
    assert rows[1]["best_streak_days"] == 3
    assert rows[1]["streak_start"] == "2024-01-01"
    assert rows[1]["n_active_days"] == 5
    assert rows[2]["best_streak_days"] == 2
    assert rows[2]["streak_start"] == "2024-01-04"


def test_price_index_hand_computed(spark, tmp_path):
    """Part 1 doubles ($1->$2), part 2 halves ($2->$1): Laspeyres = 1
    (base-weighted swings cancel), Paasche = 30/45, Fisher = sqrt of
    the product."""
    from stream_processing_system_spark.plans.analytics import part_price_index
    import os as _os

    d0 = datetime.datetime(1995, 6, 1)
    d1 = datetime.datetime(2000, 6, 1)
    li = [
        # (orderkey, partkey, suppkey, linenumber, qty, extprice, disc, tax, rf, ls, shipdate)
        (1, 1, 1, 1, 10.0, 10.0, 0.0, 0.0, "N", "O", d0),
        (2, 1, 1, 1, 5.0, 10.0, 0.0, 0.0, "N", "O", d1),
        (3, 2, 1, 1, 10.0, 20.0, 0.0, 0.0, "N", "O", d0),
        (4, 2, 1, 1, 20.0, 20.0, 0.0, 0.0, "N", "O", d1),
    ]
    sf = str(tmp_path / "sf")
    _os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        li,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).write.mode("overwrite").parquet(_os.path.join(sf, "lineitem.parquet"))
    rows = part_price_index(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_parts"] == 2
    assert abs(r["laspeyres"] - 1.0) < 1e-6
    assert abs(r["paasche"] - 30.0 / 45.0) < 1e-5
    assert abs(r["fisher"] - (30.0 / 45.0) ** 0.5) < 1e-5


def test_two_way_anova_brand_effect_only(spark, tmp_path):
    """Strong brand effect, zero flag effect, zero interaction:
    f_brand >> 0, f_flag = 0, f_interaction = 0."""
    from stream_processing_system_spark.plans.analytics import (
        lineitem_two_way_anova,
    )
    import os as _os

    d = datetime.datetime(1996, 1, 1)
    li, parts = [], [(1, "n1", "Brand#A", "t", 1, 1.0), (2, "n2", "Brand#B", "t", 1, 1.0)]
    i = 0
    for pk, qs in ((1, [10.0, 12.0]), (2, [30.0, 32.0])):
        for rf in ("N", "R"):
            for q in qs:
                li.append((i, pk, 1, 1, q, q, 0.0, 0.0, rf, "O", d))
                i += 1
    sf = str(tmp_path / "sf")
    _os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        li,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).write.mode("overwrite").parquet(_os.path.join(sf, "lineitem.parquet"))
    spark.createDataFrame(
        parts,
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ).write.mode("overwrite").parquet(_os.path.join(sf, "part.parquet"))
    rows = lineitem_two_way_anova(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_rows"] == 8 and r["n_brands"] == 2 and r["n_flags"] == 2
    # SS_brand = 800, SSW = 8 over df 4 -> msw = 2 -> f_brand = 400
    assert abs(r["f_brand"] - 400.0) < 1e-4
    assert abs(r["f_flag"]) < 1e-9
    assert abs(r["f_interaction"]) < 1e-9
    assert 0.99 < r["eta2_cells"] <= 1.0


def test_sprt_pure_streams_decide_correctly(spark, tmp_path):
    """A cohort that's 100% purchases crosses the H1 boundary after
    ceil(UPPER / LLR_SUCCESS) = 14 steps; a cohort with zero
    purchases crosses H0 after ceil(|LOWER| / |LLR_FAILURE|) = 32."""
    import math as _m
    from stream_processing_system_spark.plans.analytics import (
        SPRT_LLR_FAILURE,
        SPRT_LLR_SUCCESS,
        SPRT_LOWER,
        SPRT_UPPER,
        ab_sprt_sequential,
    )
    import os as _os

    # find user ids for each md5 cohort
    import hashlib

    def cohort(uid):
        return int(hashlib.md5(f"ab|{uid}".encode()).hexdigest()[:8], 16) % 2

    u0 = next(u for u in range(100) if cohort(u) == 0)
    u1 = next(u for u in range(100) if cohort(u) == 1)
    events = []
    for i in range(40):
        events.append(
            (len(events), datetime.datetime(2024, 1, 1, 0, i), u0,
             "purchase", 1.0, "{}")
        )
        events.append(
            (len(events), datetime.datetime(2024, 1, 1, 0, i), u1,
             "view", 1.0, "{}")
        )
    sf = str(tmp_path / "sf")
    _os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        events,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(_os.path.join(sf, "events.parquet"))
    rows = ab_sprt_sequential(spark, sf).collect()
    got = {r["cohort"]: r for r in rows}
    assert got[0]["decision"] == "accept_h1"
    assert got[0]["stop_step"] == _m.ceil(SPRT_UPPER / SPRT_LLR_SUCCESS)
    assert got[1]["decision"] == "accept_h0"
    assert got[1]["stop_step"] == _m.ceil(abs(SPRT_LOWER) / abs(SPRT_LLR_FAILURE))


def test_isotonic_minimax_equals_pav(spark, tmp_path):
    """[3,3] @ h0, [1] @ h1, [2] @ h2: PAV pools h0+h1 at the weighted
    mean 7/3, h2 stays if >= pool mean (2 < 7/3 so all three pool:
    (3+3+1+2)/4 = 2.25 everywhere)."""
    from stream_processing_system_spark.plans.analytics import events_isotonic_hourly
    import os as _os

    def ts(h, m):
        return datetime.datetime(2024, 1, 1, h, m)

    events = [
        (0, ts(0, 1), 1, "x", 3.0, "{}"),
        (1, ts(0, 2), 1, "x", 3.0, "{}"),
        (2, ts(1, 1), 1, "x", 1.0, "{}"),
        (3, ts(2, 1), 1, "x", 2.0, "{}"),
    ]
    sf = str(tmp_path / "sf")
    _os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        events,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(_os.path.join(sf, "events.parquet"))
    rows = events_isotonic_hourly(spark, sf).collect()
    got = {r["h"]: r for r in rows}
    assert abs(got[0]["observed_mean"] - 3.0) < 1e-9
    assert abs(got[1]["observed_mean"] - 1.0) < 1e-9
    for h in (0, 1, 2):
        assert abs(got[h]["isotonic_fit"] - 2.25) < 1e-6
    # monotone by construction
    fits = [got[h]["isotonic_fit"] for h in sorted(got)]
    assert fits == sorted(fits)


def test_littles_law_identity_exact(spark, tmp_path):
    """Two orders (durations 2 and 3 days): the sweep-line integral
    equals the duration sum exactly (5), L = lambda*W holds, ratio=1."""
    from stream_processing_system_spark.plans.analytics import orders_littles_law
    import os as _os

    def d(day):
        return datetime.datetime(2024, 1, day)

    orders = [
        (1, 1, "O", 1.0, d(1), "1-URGENT"),
        (2, 1, "O", 1.0, d(2), "1-URGENT"),
    ]
    li = [
        # order 1 last ship Jan 2 -> closes Jan 3 (duration 2)
        (1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d(2)),
        # order 2 last ship Jan 4 -> closes Jan 5 (duration 3)
        (2, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d(4)),
    ]
    sf = str(tmp_path / "sf")
    _os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(_os.path.join(sf, "orders.parquet"))
    spark.createDataFrame(
        li,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).write.mode("overwrite").parquet(_os.path.join(sf, "lineitem.parquet"))
    rows = orders_littles_law(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_orders"] == 2
    assert r["sum_order_days"] == 5 and r["sum_backlog_days"] == 5
    assert r["littles_ratio"] == 1.0
    assert abs(r["l_avg"] - 5.0 / 4.0) < 1e-6  # horizon Jan1..Jan5 = 4 days
    assert abs(r["lambda_per_day"] * r["w_days"] - r["l_avg"]) < 1e-5
