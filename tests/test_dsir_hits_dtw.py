"""Semantics pins for DSIR importance scoring, bipartite HITS, and
the DTW higher-order-function fold — hand-computed answers on
constructed inputs (the DuckDB oracle covers cross-engine parity)."""

from __future__ import annotations

import datetime
import os


def _write(tmp_path, spark, name, rows, schema):
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(sf, f"{name}.parquet")
    )
    return sf


def test_dsir_target_ratio_ordering(spark, tmp_path):
    """'alpha' appears only in the en target -> ratio 1.0 (1e6 micro);
    'beta' only outside -> (0+1)/(2+1) -> floor(1e6/3 + .5) = 333333.
    Buckets verified collision-free offline (931 vs 2736 mod 8192)."""
    from stream_processing_system_spark.plans.analytics import doc_dsir_importance

    docs = [
        (1, "alpha alpha", "en", "s", 11),
        (2, "alpha alpha", "en", "s", 11),
        (3, "beta beta", "fr", "s", 9),
    ]
    sf = _write(
        tmp_path, spark, "documents", docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = doc_dsir_importance(spark, sf).collect()
    assert [(r["doc_id"], r["n_tokens"], r["mean_ratio_micro"]) for r in rows] == [
        (1, 2, 1000000),
        (2, 2, 1000000),
        (3, 2, 333333),
    ]


def test_hits_two_round_l1(spark, tmp_path):
    """c1 buys {p1,p2}, c2 buys {p2}. After two L1-normalized rounds:
    authority = (0.375, 0.625), hubs = (8/13, 5/13) — hand-derived."""
    from stream_processing_system_spark.plans.analytics import customer_part_hits

    d = datetime.datetime(2024, 1, 1)
    orders = [(1, 1, "O", 1.0, d, "1-URGENT"), (2, 2, "O", 1.0, d, "1-URGENT")]
    li = [
        (1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d),
        (1, 2, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", d),
        (2, 2, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d),
    ]
    sf = _write(
        tmp_path, spark, "orders", orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    _write(
        tmp_path, spark, "lineitem", li,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    rows = customer_part_hits(spark, sf).collect()
    got = {(r["side"], r["key"]): r["score"] for r in rows}
    assert abs(got[("authority", 2)] - 0.625) < 1e-8
    assert abs(got[("authority", 1)] - 0.375) < 1e-8
    assert abs(got[("hub", 1)] - 8.0 / 13.0) < 1e-8
    assert abs(got[("hub", 2)] - 5.0 / 13.0) < 1e-8


def _events_daily(vals_by_type):
    """One event per (type, day) with the given exact values."""
    events = []
    for t, vals in vals_by_type.items():
        for i, v in enumerate(vals):
            events.append(
                (len(events), datetime.datetime(2024, 1, 1 + i, 12, 0), 1, t,
                 float(v), "{}")
            )
    return events


def test_dtw_identical_series_zero(spark, tmp_path):
    from stream_processing_system_spark.plans.analytics import events_dtw_distance

    events = _events_daily({"a": [1, 5, 3, 7], "b": [1, 5, 3, 7]})
    sf = _write(
        tmp_path, spark, "events", events,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    rows = events_dtw_distance(spark, sf).collect()
    assert len(rows) == 1
    assert rows[0]["dtw_micro"] == 0


def test_dtw_hand_computed(spark, tmp_path):
    """a=[1,2,3], b=[1,3]: DP gives DTW = 1 (micro grid 1e6).
    Path: (1,1)=0, (2,3) cost 1, (3,3)=0 -> total 1e6 micro."""
    from stream_processing_system_spark.plans.analytics import events_dtw_distance

    events = _events_daily({"a": [1, 2, 3], "b": [1, 3]})
    sf = _write(
        tmp_path, spark, "events", events,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    rows = events_dtw_distance(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_a"], r["n_b"]) == (3, 2)
    assert r["dtw_micro"] == 1_000_000
    assert abs(r["dtw"] - 1.0) < 1e-12
