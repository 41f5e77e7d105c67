"""RocksDB long-state streaming soak (VERDICT r2 task 8): the other
stream_* parity tests run with toy state (10^1-10^5 keys); this one
proves the session.py RocksDB state-store claim under real state
volume — >=10^6 keys at sf0.1 — with the batch parity oracle AND the
state-size metric asserted from the query's own progress record.

Runs at sf0.1 on purpose (the one deliberately-heavy test in the
suite, ~1 min): the whole point is state volume the sf0.001 fixtures
cannot produce."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from stream_processing_system_spark.plans import streaming_parity
from stream_processing_system_spark.sources.tables import load_table


#: slow tier (round 10, VERDICT r9 item 7): independent replay /
#: property / soak coverage, excluded from the default run so the
#: driver's verify window fits; run with `pytest -m slow`.
pytestmark = pytest.mark.slow

SF_SOAK = "/root/testdata/sf0.1"


def test_rocksdb_soak_million_key_state_with_parity(spark):
    out = streaming_parity.stream_soak_lineitem_state(spark, SF_SOAK)
    metrics = streaming_parity.last_soak_state_metrics
    print(f"soak state metrics: {metrics}")  # the round-3 'metric in the test log'

    # 1) real state volume: >=10^6 keys lived in the RocksDB store
    assert metrics["numRowsTotal"] is not None
    assert metrics["numRowsTotal"] >= 1_000_000, metrics
    assert metrics["numRowsUpdated"] == metrics["numRowsTotal"]
    assert metrics["rocksdb"], metrics  # the RocksDB provider really ran

    # 2) parity: per-flag rollup of the drained state == 2x the batch
    #    aggregate, exact-integer cents
    li = load_table(spark, SF_SOAK, "lineitem")
    expect = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            (
                F.count_distinct(
                    F.concat_ws(":", "l_orderkey", "l_linenumber")
                )
                * 2
            ).alias("n_keys"),
            (F.count(F.lit(1)) * 2).alias("n_rows"),
            (
                F.sum(
                    F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast(
                        "long"
                    )
                )
                * 2
            ).alias("total_cents"),
        )
        .collect()
    }
    got = out.collect()
    assert len(got) == len(expect)
    for r in got:
        e = expect[r["l_returnflag"]]
        assert (r["n_keys"], r["n_rows"], r["total_cents"]) == (
            e["n_keys"],
            e["n_rows"],
            e["total_cents"],
        ), r["l_returnflag"]
