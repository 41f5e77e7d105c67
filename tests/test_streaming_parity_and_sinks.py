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
