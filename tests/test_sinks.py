"""Sink format tests (K1-K3)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from stream_processing_system_spark.plans.reference import wordcount
from stream_processing_system_spark.sources.sinks import write_host_report, write_kv_lines


def _read_text_parts(path: str) -> list[str]:
    lines = []
    for f in sorted(glob.glob(f"{path}/part-*")):
        with open(f) as fh:
            lines.extend(fh.read().splitlines())
    return lines


def test_kv_lines_sink(spark, tmp_path):
    df = spark.createDataFrame([("the cat the",)], ["line"])
    out = str(tmp_path / "wc_out")
    write_kv_lines(wordcount(df), out, key="word", value="cnt", single_file=True)
    assert sorted(_read_text_parts(out)) == ["cat:1", "the:2"]


def test_host_report_sink(spark, tmp_path):
    df = spark.createDataFrame(
        [("h1", 2, ["h1/a", "h1/b"])], ["host", "hits", "routes_arr"]
    )
    out = str(tmp_path / "hosts_out")
    write_host_report(df, out, single_file=True)
    assert _read_text_parts(out) == ["h1:2", "h1/a", "h1/b", "=" * 43]
