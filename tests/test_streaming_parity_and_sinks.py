"""Contract-level streaming parity + foreachBatch file sink."""

from __future__ import annotations

import glob

from stream_processing_system_spark.plans import streaming_parity
from stream_processing_system_spark.streaming import jobs
from tests.oracle import assert_matches_oracle


def test_stream_wordcount_docs_matches_batch_oracle(spark, sf_dir):
    import __spark_entry__ as contract

    df = streaming_parity.stream_wordcount_docs(spark, sf_dir)
    assert_matches_oracle(df, sf_dir, contract.oracle_sql()["stream_wordcount"])


def test_stream_host_report_matches_batch_oracle(spark, sf_dir):
    import __spark_entry__ as contract

    df = streaming_parity.stream_host_report_events(spark, sf_dir)
    assert_matches_oracle(df, sf_dir, contract.oracle_sql()["stream_host_report"])


def test_stream_dedup_exact_matches_batch_oracle(spark, sf_dir):
    import __spark_entry__ as contract

    df = streaming_parity.stream_dedup_exact_docs(spark, sf_dir)
    assert_matches_oracle(df, sf_dir, contract.oracle_sql()["stream_dedup_exact"])


def test_stream_events_per_hour_matches_batch_oracle(spark, sf_dir):
    import __spark_entry__ as contract

    df = streaming_parity.stream_events_per_hour(spark, sf_dir)
    assert_matches_oracle(df, sf_dir, contract.oracle_sql()["stream_events_per_hour"])


def test_stream_running_counts_matches_batch_oracle(spark, sf_dir):
    import __spark_entry__ as contract

    df = streaming_parity.stream_running_counts_docs(spark, sf_dir)
    assert_matches_oracle(df, sf_dir, contract.oracle_sql()["stream_running_counts"])


def test_stream_wordcount_to_files_foreachbatch(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    (d / "a.txt").write_text("x y x\n")
    out = str(tmp_path / "out")
    jobs.stream_wordcount_to_files(
        spark, str(d), str(tmp_path / "ckpt"), out, name="wc_fb_t"
    )
    lines = []
    for f in sorted(glob.glob(out + "/part-*")):
        lines += open(f).read().splitlines()
    assert sorted(lines) == ["x:2", "y:1"]


def test_stream_to_versioned_store_exactly_once(spark, tmp_path):
    """Two availableNow drains over a growing input dir: each drain
    lands ONE new version holding the converged totals; re-writing an
    epoch (simulated replay) rewrites its version instead of minting
    a duplicate."""
    from stream_processing_system_spark.plans.reference import wordcount
    from stream_processing_system_spark.sources.text import read_text_lines
    from stream_processing_system_spark.sources.versioned_store import VersionedStore

    d = tmp_path / "in"
    d.mkdir()
    (d / "a.txt").write_text("x y x\n")
    ckpt, root = str(tmp_path / "ckpt"), str(tmp_path / "store")

    jobs.stream_wordcount_to_versioned_store(
        spark, str(d), ckpt, root, query_name="vs_t1"
    )
    store = VersionedStore(root)
    assert store.versions("wc_versions") == [1]

    (d / "b.txt").write_text("y z\n")
    jobs.stream_wordcount_to_versioned_store(
        spark, str(d), ckpt, root, query_name="vs_t2"
    )
    assert store.versions("wc_versions") == [1, 2]
    got = {
        (r["word"], r["cnt"])
        for r in store.get(spark, "wc_versions").collect()
    }
    want = {
        tuple(r)
        for r in wordcount(read_text_lines(spark, str(d))).collect()
    }
    assert got == want

    # replayed epoch rewrites its own version — still exactly two
    # (materialized first: a foreachBatch batch_df is already local,
    # never a lazy self-read of the directory being overwritten)
    replay = spark.createDataFrame(store.get(spark, "wc_versions", 2).collect())
    store.put_idempotent(replay, "wc_versions", 2)
    assert store.versions("wc_versions") == [1, 2]
    assert {
        (r["word"], r["cnt"]) for r in store.get(spark, "wc_versions").collect()
    } == want
