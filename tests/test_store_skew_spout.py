"""Tests: versioned store (K4 semantics), salted aggregation
equivalence, and the crane_spout custom data source (S7)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stream_processing_system_spark.operators.skew import salted_agg, salted_count
from stream_processing_system_spark.sources.spout_source import register
from stream_processing_system_spark.sources.tables import load_table
from stream_processing_system_spark.sources.versioned_store import VersionedStore


def test_versioned_store_put_get_versions_ls_delete(spark, tmp_path):
    store = VersionedStore(str(tmp_path / "store"))
    df1 = spark.createDataFrame([(1, "a")], ["id", "v"])
    df2 = spark.createDataFrame([(2, "b")], ["id", "v"])

    assert store.put(df1, "ds") == 1
    assert store.put(df2, "ds") == 2
    assert store.versions("ds") == [1, 2]
    assert store.ls() == ["ds"]

    latest = store.get(spark, "ds").collect()
    assert [(r["id"], r["v"]) for r in latest] == [(2, "b")]
    v1 = store.get(spark, "ds", version=1).collect()
    assert [(r["id"], r["v"]) for r in v1] == [(1, "a")]

    with pytest.raises(FileNotFoundError):
        store.get(spark, "ds", version=99)
    store.delete("ds")
    assert store.ls() == []
    with pytest.raises(FileNotFoundError):
        store.get(spark, "ds")


def test_salted_count_equals_plain_count(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    plain = {
        (r["user_id"], r["cnt"])
        for r in events.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    salted = {
        (r["user_id"], r["cnt"])
        for r in salted_count(events, ["user_id"]).collect()
    }
    assert salted == plain


def test_salted_count_on_zipf_skew(spark):
    """The condition skew.py exists for: one viral key holding half
    the rows. Exact equality with the plain aggregate on the skewed
    fixture, plus a plan assertion that phase 1 shuffles on
    (key, _salt) — the hot key is spread over many reducers instead
    of pinning one."""
    from pyspark.sql import functions as F

    n = 100_000
    df = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))  # 50% of rows hit key 0
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(1000)))
        .alias("key")
    )
    got = salted_count(df, ["key"], out="cnt")
    want = df.groupBy("key").agg(F.count(F.lit(1)).alias("cnt"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    plan = got._jdf.queryExecution().executedPlan().toString()
    # phase-1 exchange must hash on (key, _salt), not key alone
    assert "_salt" in plan and "hashpartitioning(key" in plan, plan


def test_salted_agg_sum_min_max(spark):
    df = spark.createDataFrame(
        [("k", float(i)) for i in range(100)] + [("j", 5.0)], ["k", "v"]
    ).repartition(8)
    got = {
        r["k"]: (r["total"], r["lo"], r["hi"])
        for r in salted_agg(
            df,
            ["k"],
            {
                "total": ("sum", F.sum("v")),
                "lo": ("min", F.min("v")),
                "hi": ("max", F.max("v")),
            },
        ).collect()
    }
    assert got["k"] == (sum(range(100)), 0.0, 99.0)
    assert got["j"] == (5.0, 5.0, 5.0)


def test_crane_spout_source_linenumbers(spark, tmp_path):
    d = tmp_path / "spout_in"
    d.mkdir()
    (d / "a.txt").write_text("first line\nsecond line\n")
    (d / "b.txt").write_text("other file\n")
    register(spark)
    df = spark.read.format("crane_spout").option("path", str(d)).load()
    rows = {(r["linenumber"], r["line"]) for r in df.collect()}
    # per-file 1-based numbering (spout/spout.go:235-237 semantics)
    assert rows == {(1, "first line"), (2, "second line"), (1, "other file")}
    assert df.rdd.getNumPartitions() == 2  # one partition per file

def test_salted_join_equals_plain_join_on_zipf(spark):
    """Salted join == plain join on a Zipf-skewed fact side (hot key
    = 50% of rows) joined to a unique-key dim."""
    import random

    from stream_processing_system_spark.operators.skew import salted_join

    rng = random.Random(7)
    facts = spark.createDataFrame(
        [(1 if rng.random() < 0.5 else rng.randint(2, 50), i) for i in range(5000)],
        "k long, v long",
    )
    dim = spark.createDataFrame([(k, f"d{k}") for k in range(1, 51)], "k long, name string")
    plain = facts.join(dim, "k").groupBy("k", "name").count()
    salted = salted_join(facts, dim, "k").groupBy("k", "name").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # left join keeps unmatched rows too
    dim_partial = dim.where(F.col("k") <= 10)
    plain_l = facts.join(dim_partial, "k", "left").groupBy("k", "name").count()
    salted_l = salted_join(facts, dim_partial, "k", how="left").groupBy("k", "name").count()
    assert sorted(map(tuple, plain_l.collect())) == sorted(map(tuple, salted_l.collect()))


def test_versioned_store_vacuum(spark, tmp_path):
    store = VersionedStore(str(tmp_path / "store"))
    for i in range(5):
        store.put(spark.range(i, i + 3).toDF("x"), "ds")
    assert store.versions("ds") == [1, 2, 3, 4, 5]
    removed = store.vacuum("ds", keep_last=2)
    assert removed == [1, 2, 3]
    assert store.versions("ds") == [4, 5]
    # survivors still readable, latest unchanged
    assert store.get(spark, "ds").count() == 3
    assert sorted(r["x"] for r in store.get(spark, "ds", 4).collect()) == [3, 4, 5]
    # vacuum with fewer versions than keep_last is a no-op
    assert store.vacuum("ds", keep_last=10) == []


def test_crane_sink_writes_reference_format(spark, tmp_path):
    """The custom DataSource WRITER emits bolt.go:296-310's
    `word:count` lines from a distributed write."""
    import os

    register(spark)
    out = str(tmp_path / "wc_out")
    df = spark.createDataFrame(
        [("hello", 3), ("world", 2), ("spark", 7)], ["word", "cnt"]
    ).repartition(2)
    df.write.format("crane_sink").option("path", out).mode("append").save()
    lines = []
    for f in sorted(os.listdir(out)):
        with open(os.path.join(out, f)) as fh:
            lines += [ln.strip() for ln in fh]
    assert sorted(lines) == ["hello:3", "spark:7", "world:2"]


def test_crane_spout_streaming_tails_directory_incrementally(spark, tmp_path):
    """The spout's STREAMING half: an availableNow pass drains the
    files present; new files landing later are picked up by the next
    pass from the same checkpoint WITHOUT re-emitting old rows —
    offset bookkeeping replacing the reference's drop-and-restart."""
    import os

    register(spark)
    data = tmp_path / "in"
    os.makedirs(data)
    (data / "a.txt").write_text("alpha\nbeta\n")
    (data / "b.txt").write_text("gamma\n")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("crane_spout")
            .option("path", str(data))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            (r["linenumber"], r["line"])
            for r in spark.read.parquet(out).collect()
        }

    first = drain()
    assert first == {(1, "alpha"), (2, "beta"), (1, "gamma")}
    (data / "c.txt").write_text("delta\n")
    second = drain()  # same checkpoint: only the new file is appended
    assert second == first | {(1, "delta")}
