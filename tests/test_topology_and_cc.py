"""Topology submission surface + transitive (connected-components)
dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stream_processing_system_spark.operators import dedup
from stream_processing_system_spark.plans import topology


def test_topology_wordcount_submit(spark, tmp_path):
    d = tmp_path / "wc"
    d.mkdir()
    (d / "a.txt").write_text("x y x\n")
    got = {(r["word"], r["cnt"]) for r in topology.submit(spark, "wordcount", str(d)).collect()}
    assert got == {("x", 2), ("y", 1)}


def test_topology_nasalog_submit(spark, tmp_path):
    from tests.test_reference_queries import NASA_LINES

    d = tmp_path / "nasa"
    d.mkdir()
    (d / "log.txt").write_text("\n".join(NASA_LINES) + "\n")
    rows = {r["host"]: r["hits"] for r in topology.submit(spark, "nasalog", str(d)).collect()}
    assert rows == {"burger.letters.com": 1, "pm13.j51.com": 3}


def test_topology_unknown_app(spark):
    with pytest.raises(KeyError, match="unknown app"):
        topology.submit(spark, "nope", "/tmp/x")


def test_connected_components_chain(spark):
    # chain 1-2-3 plus isolated 9: all of {1,2,3} collapse to 1
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
    nodes = spark.createDataFrame([(1,), (2,), (3,), (9,)], ["doc_id"])
    labels = {
        r["doc_id"]: r["component"]
        for r in dedup.connected_component_labels(pairs, nodes, "doc_id").collect()
    }
    assert labels == {1: 1, 2: 1, 3: 1, 9: 9}


def test_dedup_transitive_collapses_chain(spark):
    # A ~ B (one word changed), B ~ C (another word changed); A vs C
    # differ in two words — pairwise threshold links A-B and B-C but
    # maybe not A-C. Transitive dedup must keep ONLY the min id.
    base = ("w%d " * 30 % tuple(range(30))).strip()
    b = base.replace("w3 ", "q3 ")
    c = b.replace("w20 ", "q20 ")
    df = spark.createDataFrame(
        [(1, base), (2, b), (3, c), (50, "unrelated totally different text here")],
        ["doc_id", "text"],
    )
    kept = {
        r["doc_id"]
        for r in dedup.dedup_transitive(df, "doc_id", "text", threshold=0.6).collect()
    }
    assert kept == {1, 50}

@pytest.mark.slow  # ~42 s: 600-node path fixpoint — slow tier (r10)
def test_cc_long_path_converges(spark):
    """Regression for the O(diameter) propagation pathology: a
    600-node PATH (worst-case diameter) must fully converge to a
    single min-label component within the default round budget —
    the contraction form halves the remaining diameter per round."""
    import warnings

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(599)], "id_a long, id_b long"
    )
    nodes = spark.range(600).select(F.col("id").alias("node"))
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # unconverged would raise
        labels = dedup.connected_component_labels(pairs, nodes, "node")
        got = labels.agg(
            F.countDistinct("component").alias("nc"),
            F.min("component").alias("mn"),
            F.max("component").alias("mx"),
        ).collect()[0]
    assert (got["nc"], got["mn"], got["mx"]) == (1, 0, 0)


def test_cc_two_rings(spark):
    """Two disjoint rings label to their own minima."""
    ring1 = [(i, (i + 1) % 50) for i in range(50)]
    ring2 = [(100 + i, 100 + (i + 1) % 50) for i in range(50)]
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in ring1 + ring2],
        "id_a long, id_b long",
    )
    nodes = pairs.select(F.col("id_a").alias("node")).union(
        pairs.select(F.col("id_b").alias("node"))
    ).distinct()
    labels = dedup.connected_component_labels(pairs, nodes, "node")
    comps = {
        r["component"] for r in labels.select("component").distinct().collect()
    }
    assert comps == {0, 100}
