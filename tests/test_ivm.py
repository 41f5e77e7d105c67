"""Incremental view maintenance: merge identity, negative deltas
(deletions), and degenerate inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_processing_system_spark.operators.ivm import merge_additive


def _agg(df):
    return df.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("v").cast("decimal(18,2)")).alias("s"),
    )


def test_merge_equals_recompute(spark):
    facts = spark.range(0, 1000).select(
        (F.col("id") % 7).alias("k"), (F.col("id") * 0.25).alias("v")
    )
    base = _agg(facts.where(F.col("id") < 700))
    delta = _agg(facts.where(F.col("id") >= 700))
    merged = merge_additive(base, delta, ["k"], ["n", "s"]).orderBy("k")
    full = _agg(facts).orderBy("k")
    assert [r.asDict() for r in merged.collect()] == [
        r.asDict() for r in full.collect()
    ]


def test_negative_delta_retracts_rows(spark):
    """A CDC deletion arrives as a negative delta; merging it must
    retract both the count and the sum."""
    facts = spark.range(0, 100).select(
        (F.col("id") % 3).alias("k"), F.col("id").cast("double").alias("v")
    )
    base = _agg(facts)
    retract = _agg(facts.where(F.col("id") >= 90)).select(
        "k", (-F.col("n")).alias("n"), (-F.col("s")).alias("s")
    )
    merged = merge_additive(base, retract, ["k"], ["n", "s"])
    want = _agg(facts.where(F.col("id") < 90))
    got = {r["k"]: (r["n"], float(r["s"])) for r in merged.collect()}
    exp = {r["k"]: (r["n"], float(r["s"])) for r in want.collect()}
    assert got == exp


def test_new_group_and_empty_sides(spark):
    facts = spark.range(0, 10).select(
        (F.col("id") % 2).alias("k"), F.lit(1.0).alias("v")
    )
    empty = facts.where(F.lit(False))
    base = _agg(facts)
    # empty delta: unchanged
    got = merge_additive(base, _agg(empty), ["k"], ["n", "s"])
    assert {(r["k"], r["n"]) for r in got.collect()} == {(0, 5), (1, 5)}
    # empty base: delta passes through (a brand-new group key)
    newg = spark.range(0, 3).select(F.lit(9).alias("k"), F.lit(2.0).alias("v"))
    got2 = merge_additive(_agg(empty), _agg(newg), ["k"], ["n", "s"])
    rows = got2.collect()
    assert len(rows) == 1 and rows[0]["k"] == 9 and rows[0]["n"] == 3
