"""Sequence-pattern matching: known-answer motifs, tie determinism,
and non-overlapping greedy semantics."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from stream_processing_system_spark.operators import seqmatch


def _seq(spark, rows):
    pdf = pd.DataFrame(rows, columns=["u", "t", "i", "e"])
    df = spark.createDataFrame(pdf)
    return seqmatch.encode_sequences(
        df, "u", ["t", "i"], F.col("e")
    )


def test_known_answer_motifs(spark):
    # user 1: v c c p v p  -> vc*p matches 'vccp' then 'vp' = 2
    rows = [(1, t, t, ch) for t, ch in enumerate("vccpvp")]
    got = seqmatch.match_counts(
        _seq(spark, rows), {"m": "vc*p"}
    ).collect()[0]
    assert got["seq"] == "vccpvp" and got["m"] == 2


def test_greedy_non_overlapping_error_runs(spark):
    # 'eeee' is ONE greedy match of ee+, not three overlapping ones
    rows = [(1, t, t, "e") for t in range(4)]
    got = seqmatch.match_counts(_seq(spark, rows), {"m": "ee+"}).collect()[0]
    assert got["m"] == 1
    # 'ee x ee' -> two bursts
    rows2 = [(1, t, t, ch) for t, ch in enumerate("eevee")]
    got2 = seqmatch.match_counts(_seq(spark, rows2), {"m": "ee+"}).collect()[0]
    assert got2["m"] == 2


def test_timestamp_tie_broken_by_id(spark):
    """Two rows at the same timestamp order by the id column, not by
    partition luck."""
    rows = [(1, 0, 2, "p"), (1, 0, 1, "v"), (1, 0, 0, "c")]
    got = _seq(spark, rows).collect()[0]
    assert got["seq"] == "cvp"


def test_empty_partition_set(spark):
    empty = spark.range(0, 0).selectExpr(
        "id AS u", "id AS t", "id AS i", "CAST(NULL AS STRING) AS e"
    )
    assert (
        seqmatch.encode_sequences(empty, "u", ["t", "i"], F.col("e")).count()
        == 0
    )
