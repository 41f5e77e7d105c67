"""Semantic tests for the corpus quality-filter operators (planted
fixtures — the sf* contract queries cover cross-engine value parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_processing_system_spark.operators import quality_filters as qf


def test_repetition_stats_known_values(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "x y x y"), (3, "solo")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in qf.repetition_stats(df).collect()}
    # doc 1: 2-grams {"a a", "a b"} → top 1/2, all distinct, one
    # adjacent repeat
    assert rows[1]["top_2gram_frac"] == 0.5
    assert rows[1]["dup_2gram_frac"] == 0.0
    assert rows[1]["n_adjacent_repeats"] == 1
    # doc 2: 2-grams {"x y", "y x", "x y"} → top 2/3, 1 of 3 is a
    # repeat occurrence, no adjacent token repeats
    assert abs(rows[2]["top_2gram_frac"] - 2 / 3) < 1e-6
    assert abs(rows[2]["dup_2gram_frac"] - 1 / 3) < 1e-6
    assert rows[2]["n_adjacent_repeats"] == 0
    # doc 3: fewer than 2 tokens → excluded by contract
    assert 3 not in rows


def test_pii_scrub_replaces_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob@example.com and 10.0.0.1 or +1 555-1234 end"),
            (2, "call 555-123-4567 twice 555-123-4567"),
            (3, "clean text only"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in qf.pii_scrub(df).collect()}
    assert rows[1]["text_scrubbed"] == "mail <EMAIL> and <IP> or +1 555-1234 end"
    assert (rows[1]["n_emails"], rows[1]["n_ips"], rows[1]["n_phones"]) == (1, 1, 0)
    assert rows[2]["text_scrubbed"] == "call <PHONE> twice <PHONE>"
    assert rows[2]["n_phones"] == 2
    assert rows[3]["text_scrubbed"] == "clean text only"
    assert (rows[3]["n_emails"], rows[3]["n_ips"], rows[3]["n_phones"]) == (0, 0, 0)


def test_passage_dedup_removes_repeated_passages(spark):
    boiler = " ".join(f"w{i}" for i in range(16))  # one full chunk
    unique_a = " ".join(f"a{i}" for i in range(16))
    unique_b = " ".join(f"b{i}" for i in range(16))
    df = spark.createDataFrame(
        [
            (1, f"{boiler} {unique_a}"),
            (2, f"{boiler} {unique_b}"),  # loses the boilerplate chunk
            (3, boiler),  # every chunk already seen → doc vanishes
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r["text_clean"] for r in qf.passage_dedup(df).collect()}
    assert rows[1] == f"{boiler} {unique_a}"
    assert rows[2] == unique_b
    assert 3 not in rows


def test_pack_sequences_budget_boundaries(spark):
    # 5 docs × 4 tokens, budget 6: starts 0,4,8,12,16 → shards
    # 0,0,1,2,2
    df = spark.createDataFrame(
        [(i, "t t t t") for i in range(5)], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r["shard"]
        for r in qf.pack_sequences(df, budget_tokens=6, chunk_size=2).collect()
    }
    assert got == {0: 0, 1: 0, 2: 1, 3: 2, 4: 2}


def test_pack_sequences_chunking_invariant(spark, sf_dir):
    """The two-level prefix sum must not depend on the chunk size."""
    from stream_processing_system_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = qf.pack_sequences(docs, budget_tokens=512, chunk_size=7)
    b = qf.pack_sequences(docs, budget_tokens=512, chunk_size=100_000)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_blocklist_filter_planted(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from stream_processing_system_spark.operators.quality_filters import (
        blocklist_filter,
    )

    df = spark.createDataFrame(
        [
            (1, "clean words only here"),
            (2, "BAD word and more bad word"),   # case-folded, distinct terms
            (3, "bad worse bad worse"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in blocklist_filter(df, ["bad", "worse"]).collect()}
    assert rows[1]["keep"] is True and rows[1]["n_blocked_terms"] == 0
    assert rows[2]["keep"] is False and rows[2]["n_blocked_terms"] == 1
    assert rows[3]["keep"] is False and rows[3]["n_blocked_terms"] == 2
