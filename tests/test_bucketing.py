"""Bucketing removes the join shuffle — asserted at the plan level."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_processing_system_spark.sources.bucketing import bucketed_join, write_bucketed
from stream_processing_system_spark.sources.tables import load_table


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    from stream_processing_system_spark.sources.bucketing import write_partitioned

    events = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "events_part")
    write_partitioned(events, out, ["event_type"])

    back = spark.read.parquet(out).where(F.col("event_type") == "click")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "event_type" in plan.split("PartitionFilters")[1][:120]
    n_click = events.where(F.col("event_type") == "click").count()
    assert back.count() == n_click


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        li = load_table(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
        )
        write_bucketed(orders, "orders_b", "o_orderkey", n_buckets=4)
        write_bucketed(li, "lineitem_b", "o_orderkey", n_buckets=4)

        joined = bucketed_join(spark, "orders_b", "lineitem_b", "o_orderkey")
        plan = _physical_plan(joined)
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"

        # and the result is correct vs the plain join
        plain = orders.join(li, "o_orderkey")
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")

def test_registered_bucketed_query_joins_without_shuffle(spark, sf_dir):
    """The driver-registered bucketed_revenue_join must plan its
    fact⋈fact join with ZERO Exchange on the join inputs once
    broadcast is off (the layout, not the optimizer, provides
    co-location). The only exchanges allowed are the aggregate's own
    group-by shuffle and the final sort."""
    from stream_processing_system_spark.plans.pipeline import bucketed_revenue_join

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = bucketed_revenue_join(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        join_part = plan.split("HashAggregate")[-1]  # below the partial agg
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in join_part, (
            f"join inputs still shuffle:\n{join_part}"
        )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_partitioned_scan_prunes_directories(spark, sf_dir):
    """The registered partitioned_events_scan must show the type
    predicate as PartitionFilters (directory pruning), not merely
    PushedFilters (row-group filtering)."""
    from stream_processing_system_spark.plans.pipeline import partitioned_events_scan

    df = partitioned_events_scan(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_type" in m.group(1), f"no partition pruning:\n{plan[:2000]}"
