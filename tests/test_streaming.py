"""Streaming tests: batch == streaming(availableNow) on static input
(the END-marker parity property, FIXTURES.md §3), plus the custom
stateful operator."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from stream_processing_system_spark.plans.reference import wordcount
from stream_processing_system_spark.sources.text import read_text_lines
from stream_processing_system_spark.streaming import jobs
from tests.test_reference_queries import NASA_LINES

WC_LINES = [
    "the cat sat on the mat",
    "the dog sat",
    "http://spam.example.com/xyz noise line",
    "a cat and a dog",
]


def _write_lines(tmp_path, name, lines):
    d = tmp_path / name
    d.mkdir()
    (d / "part-0.txt").write_text("\n".join(lines[: len(lines) // 2]) + "\n")
    (d / "part-1.txt").write_text("\n".join(lines[len(lines) // 2 :]) + "\n")
    return str(d)


def test_stream_wordcount_equals_batch(spark, tmp_path):
    input_dir = _write_lines(tmp_path, "wc_in", WC_LINES)
    got = jobs.stream_wordcount(
        spark, input_dir, str(tmp_path / "ckpt_wc"), name="wc_stream_t"
    )
    want = wordcount(read_text_lines(spark, input_dir))
    g = {(r["word"], r["cnt"]) for r in got.collect()}
    w = {(r["word"], r["cnt"]) for r in want.collect()}
    assert g == w and len(g) > 0


def test_stream_nasalog_equals_batch(spark, tmp_path):
    from stream_processing_system_spark.plans.reference import nasalog_report

    input_dir = _write_lines(tmp_path, "nasa_in", NASA_LINES)
    got = jobs.stream_nasalog_report(
        spark, input_dir, str(tmp_path / "ckpt_nasa"), name="nasa_stream_t"
    )
    want = nasalog_report(read_text_lines(spark, input_dir))
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}


def test_stream_reddit_top_users(spark, tmp_path):
    # headerless 13-col CSV; cols 10=score, 12=username
    rows = []
    for user, score in [("u1", "5"), ("u1", "3"), ("u2", "1"), ("u3", "-4"), ("u2", "oops")]:
        cells = [f"c{i}" for i in range(13)]
        cells[10], cells[12] = score, user
        rows.append(",".join(cells))
    d = tmp_path / "reddit_in"
    d.mkdir()
    (d / "a.csv").write_text("\n".join(rows) + "\n")
    got = jobs.stream_reddit_top_users(
        spark, str(d), str(tmp_path / "ckpt_reddit"), k=2, name="reddit_stream_t"
    )
    # u3 dropped (score<0); unparseable 'oops'→0 kept (lenient Atoi)
    assert [(r["username"], r["posts"]) for r in got.collect()] == [("u1", 2), ("u2", 2)]


def test_stream_running_counts_stateful(spark, tmp_path):
    d = tmp_path / "keys_in"
    d.mkdir()
    (d / "a.txt").write_text("x\ny\nx\n")
    (d / "b.txt").write_text("x\nz\n")
    got = jobs.stream_running_counts(
        spark, str(d), str(tmp_path / "ckpt_rc"), name="rc_stream_t"
    )
    final = {r["key"]: r["cnt"] for r in got.collect()}
    assert final == {"x": 3, "y": 1, "z": 1}


def test_stream_session_windows(spark, tmp_path):
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base),
        (1, base + dt.timedelta(minutes=10)),   # same session
        (1, base + dt.timedelta(minutes=90)),   # new session (gap > 30m)
        (2, base),
    ]
    # static frame replayed through the streaming API via a temp parquet dir
    src = str(tmp_path / "events_src")
    spark.createDataFrame(rows, ["user_id", "ts"]).write.parquet(src)
    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    got = jobs.stream_session_windows(
        spark, stream, str(tmp_path / "ckpt_sess"), name="sess_stream_t"
    )
    per_user = {}
    for r in got.collect():
        per_user[r["user_id"]] = per_user.get(r["user_id"], 0) + 1
    assert per_user == {1: 2, 2: 1}


def test_upsert_sink_multi_batch_and_restart_idempotent(spark, tmp_path):
    """The IVM upsert sink must (a) actually process multiple
    micro-batches (one per input file), (b) survive a restart with
    the same checkpoint without double-adding (replay guard), and
    (c) match the batch aggregate exactly."""
    import os

    from pyspark.sql import functions as F

    from stream_processing_system_spark.streaming import jobs

    input_dir = str(tmp_path / "in")
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    facts = spark.range(0, 3000).select(
        (F.col("id") % 11).alias("user_id"),
        (F.col("id") % 7).cast("long").alias("value_u"),
    )
    facts.repartition(3).write.mode("overwrite").parquet(input_dir)

    serving = jobs.stream_upsert_totals(
        spark, input_dir, ckpt, state_dir, name="ups_t1"
    )
    committed = int(open(os.path.join(state_dir, "_committed_epoch")).read())
    assert committed >= 2  # three files -> at least three micro-batches

    want = {
        r["user_id"]: (r["n"], r["s"])
        for r in facts.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value_u").alias("s"))
        .collect()
    }
    got = {
        r["user_id"]: (r["n_events"], r["sum_u"]) for r in serving.collect()
    }
    assert got == want

    # restart with the SAME checkpoint: no new input -> no new epochs,
    # totals unchanged (the replay guard also covers re-delivered
    # epochs after a mid-run crash)
    serving2 = jobs.stream_upsert_totals(
        spark, input_dir, ckpt, state_dir, name="ups_t2"
    )
    got2 = {
        r["user_id"]: (r["n_events"], r["sum_u"]) for r in serving2.collect()
    }
    assert got2 == want


def test_kmv_merge_associativity_across_batch_splits(spark, tmp_path):
    """The streamed (multi-batch) sketch must equal the batch-built
    sketch bit-for-bit — the associativity property the shared
    oracle rests on. Uses an ESTIMATING-size group (n >> k)."""
    import os

    from pyspark.sql import functions as F

    from stream_processing_system_spark.operators.sketch_kmv import kmv_sketch
    from stream_processing_system_spark.streaming import jobs

    input_dir = str(tmp_path / "in")
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    facts = spark.range(0, 5000).select(
        F.lit("a").alias("g"), F.col("id").alias("member")
    )
    facts.repartition(4).write.mode("overwrite").parquet(input_dir)
    streamed = jobs.stream_kmv_sketches(
        spark, input_dir, ckpt, state_dir, name="kmv_t", k=64
    )
    committed = int(open(os.path.join(state_dir, "_committed_epoch")).read())
    assert committed >= 2
    got = sorted(r["h"] for r in streamed.collect())
    want = sorted(r["h"] for r in kmv_sketch(facts, "g", "member", k=64).collect())
    assert got == want and len(got) == 64
