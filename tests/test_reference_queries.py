"""Semantic unit tests for the reference-parity operators on tiny
in-memory inputs, checking the behaviors SURVEY.md §2 pins down
(noise filter, lenient casts, malformed-row drop, log field slices,
top-k tie-break)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_processing_system_spark.functions import is_noise_line, lenient_int
from stream_processing_system_spark.plans.reference import (
    nasalog_report,
    top_users,
    wordcount,
)
from stream_processing_system_spark.sources.text import parse_apache_log

NASA_LINES = [
    # `burger.letters.com` GET 200 → kept
    'burger.letters.com - - [01/Jul/1995:00:00:59 -0400] "GET /shuttle/countdown/liftoff.html HTTP/1.0" 200 0',
    # 304 status → dropped by the status filter, not the parser
    'burger.letters.com - - [01/Jul/1995:00:01:12 -0400] "GET /images/NASA-logosmall.gif HTTP/1.0" 304 0',
    # second host, two distinct urls + one repeat
    'pm13.j51.com - - [01/Jul/1995:00:02:12 -0400] "GET /a.html HTTP/1.0" 200 1839',
    'pm13.j51.com - - [01/Jul/1995:00:02:55 -0400] "GET /b.html HTTP/1.0" 200 12',
    'pm13.j51.com - - [01/Jul/1995:00:03:55 -0400] "GET /a.html HTTP/1.0" 200 1839',
    # malformed (<9 tokens) → dropped by the parser (spout/spout.go:190-192)
    "short line",
]


def test_wordcount_noise_filter_and_counts(spark):
    lines = spark.createDataFrame(
        [
            ("the cat sat",),
            ("the dog",),
            ("http://example.com/long spam spam",),  # noise: first tok >8, 'http'
            ("2008-01-02T00:00 old news",),  # noise: first tok >8, '2008'
            ("http ok",),  # NOT noise: 'http' is only 4 chars
            ("a  b",),  # doubled space → empty token dropped
        ],
        ["line"],
    )
    got = {r["word"]: r["cnt"] for r in wordcount(lines).collect()}
    assert got == {"the": 2, "cat": 1, "sat": 1, "dog": 1, "http": 1, "ok": 1, "a": 1, "b": 1}


def test_noise_line_expression(spark):
    df = spark.createDataFrame(
        [("http://x.y/zzz ok",), ("20080101xx ok",), ("hello world",)], ["line"]
    )
    flags = [r[0] for r in df.select(is_noise_line("line")).collect()]
    assert flags == [True, True, False]


def test_lenient_int_matches_reference_atoi(spark):
    # Reference ignores Atoi errors → unparseable score becomes 0 and
    # passes the >=0 filter (bolt/bolt.go:348-351).
    df = spark.createDataFrame([("12",), ("-3",), ("oops",), (None,)], ["score"])
    got = [r[0] for r in df.select(lenient_int("score")).collect()]
    assert got == [12, -3, 0, 0]


def test_parse_apache_log_fields_and_malformed_drop(spark):
    df = spark.createDataFrame([(line,) for line in NASA_LINES], ["line"])
    rows = parse_apache_log(df).collect()
    assert len(rows) == 5  # malformed line dropped
    first = rows[0]
    assert first["host"] == "burger.letters.com"
    assert first["date"] == "01"  # chars [1:3) of '[01/Jul/...'
    assert first["request"] == "GET"  # leading quote stripped
    assert first["url"] == "/shuttle/countdown/liftoff.html"
    assert first["status"] == "200"


def test_nasalog_report_end_to_end(spark):
    df = spark.createDataFrame([(line,) for line in NASA_LINES], ["line"])
    got = {r["host"]: (r["hits"], r["routes"]) for r in nasalog_report(df).collect()}
    # 304 row dropped; repeat url counted in hits but deduped in routes
    assert got["burger.letters.com"] == (
        1,
        "burger.letters.com/shuttle/countdown/liftoff.html",
    )
    assert got["pm13.j51.com"] == (3, "pm13.j51.com/a.html,pm13.j51.com/b.html")


def test_top_users_tiebreak_deterministic(spark):
    df = spark.createDataFrame(
        [("u2", 1.0), ("u1", 1.0), ("u3", 5.0), ("u3", 2.0), ("u0", -1.0)],
        ["username", "score"],
    )
    rows = top_users(df, "username", F.col("score") >= 0, k=2).collect()
    # u3 has 2 posts; u1/u2 tie at 1 → ascending username breaks the tie
    assert [(r["username"], r["posts"]) for r in rows] == [("u3", 2), ("u1", 1)]
