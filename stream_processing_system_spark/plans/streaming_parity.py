"""Streaming queries exposed through the driver contract.

Each wrapper materializes the sf_dir table as a file-drop directory,
runs the *streaming* plan with trigger(availableNow=True), and
returns the drained result as a batch DataFrame. Registering these
with the SAME DuckDB oracle as their batch twin turns the
batch==streaming parity property (FIXTURES.md §3) into a
driver-checked differential test, not just a unit test."""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_processing_system_spark.sources.tables import load_table
from stream_processing_system_spark.streaming import jobs


def stream_wordcount_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q1_wordcount, but executed as a Structured Streaming job over
    a file-drop copy of documents.text. Same oracle as q1_wordcount."""
    run = uuid.uuid4().hex[:8]
    base = os.path.join(tempfile.gettempdir(), f"spark_graft_stream_{run}")
    input_dir = os.path.join(base, "in")
    ckpt = os.path.join(base, "ckpt")
    docs = load_table(spark, sf_dir, "documents").select(F.col("text"))
    docs.write.mode("overwrite").text(input_dir)
    result = jobs.stream_wordcount(spark, input_dir, ckpt, name=f"wc_{run}")
    return result.select(F.col("word"), F.col("cnt"))
