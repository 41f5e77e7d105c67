"""Extended analytics plans — the capability surface the reference
lacks (joins, window functions, sessionization, JSON extraction) but
that any user of an analytics engine needs; SURVEY.md §2.3/§2.5 note
these come "for free" in Spark, so here they are as first-class,
oracle-tested queries.

Scale notes that apply to every plan here:
- Dimension tables (region/nation/customer/supplier/part) are
  explicitly `broadcast()` — at 100 TB the fact tables shuffle once
  at most, never for a dim join.
- Money aggregates are summed as DECIMAL(18,2) and cast back to
  double at the end: bit-identical across engines AND across
  partition orderings (a plain double sum is order-dependent, which
  breaks both the DuckDB hash-match and run-to-run reproducibility
  at high parallelism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stream_processing_system_spark.functions.scalar import det_round
from stream_processing_system_spark.sources.tables import load_table


def _dec_sum(col, out: str, scale: int = 2):
    """Order-independent money sum: sum over DECIMAL(18,scale), emit
    double. `scale` must be chosen so the input is *exactly*
    representable (prices/discounts/taxes have 2 decimals, so their
    products have 4 or 6): then the double→decimal cast never rounds
    at a half-boundary, where engines disagree on rounding mode.

    Magnitude contract: the final DECIMAL→DOUBLE cast is only
    cross-engine-safe while the UNSCALED sum stays below 2^53
    (DuckDB's decimal→double path double-rounds above it; Spark's
    BigDecimal.doubleValue rounds once). scale 2 tops out around
    sf1000 locally, scale 4 around sf10 — above that, use
    `_dec_sum_exact`, which keeps both engines on the identical
    int64→double→divide sequence at any magnitude up to int64."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double").alias(out)


def _dec_sum_exact(col, out: str, scale: int):
    """`_dec_sum` for sums whose unscaled value exceeds 2^53 (found
    by the round-3 exact harness: sum_charge at sf0.1 ≈ 1.05e16
    unscaled): shift the exact decimal sum to its unscaled int64,
    then ONE int→double cast and ONE division — the identical
    two-rounding sequence in both engines, so the result is
    bit-equal regardless of magnitude. SQL twin:
    CAST(CAST(SUM(...) * 10^s AS BIGINT) AS DOUBLE) / 10^s.0"""
    s = F.sum(col.cast(f"decimal(18,{scale})"))
    return (
        (s * (10**scale)).cast("long").cast("double")
        / F.lit(float(10**scale))
    ).alias(out)


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem.

    Single wide scan → partial+final hash aggregate on a tiny key
    domain (6 flag/status pairs). At 100 TB this is the ideal Spark
    shape: map-side combine reduces each of ~25k tasks to ≤6 rows
    before the shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum(F.col("l_quantity"), "sum_qty"),
            _dec_sum(F.col("l_extendedprice"), "sum_base_price"),
            _dec_sum(disc_price, "sum_disc_price", scale=4),
            _dec_sum_exact(charge, "sum_charge", scale=6),
            det_round(F.avg("l_quantity")).alias("avg_qty"),
            det_round(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: revenue per nation for one region and year.

    customer ⋈ orders ⋈ lineitem ⋈ supplier ⋈ nation ⋈ region.
    Broadcast policy: only the FIXED-size dims (nation=25, region=5
    rows at any SF) are hard-broadcast; customer/supplier scale with
    SF (customer ≈ 15B rows at 100 TB), so their join strategy is
    left to AQE — broadcast when they fit, shuffle-hash otherwise.
    Date filter on orders is pushed into the parquet scan (verify
    with .explain → PushedFilters).
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")

    nations_in_region = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey, "inner")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(
            nations_in_region,
            (supplier.s_nationkey == F.col("n_nationkey"))
            & (customer.c_nationkey == F.col("n_nationkey")),
        )
        .groupBy("n_name")
        .agg(_dec_sum(revenue, "revenue", scale=4))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


def top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: top-10 open orders by pending revenue for one
    market segment. The orders ⋈ lineitem shuffle join is the only
    unavoidable wide exchange; the segment-filtered customer join is
    AQE's call (broadcast when small — it scales with SF, so no
    hard-coded hint); top-10 via TakeOrderedAndProject (no global
    sort)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1997-01-01")
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1997-01-01")
    )
    customer = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dec_sum(revenue, "revenue", scale=4))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select(
            "l_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
    )


def order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style: orders per priority that have at least one late
    lineitem — an EXISTS expressed as a left-semi join (Spark's
    native semi-join; no row duplication, no distinct needed)."""
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    # "late" proxy on this synthetic schema (no commit/receipt dates):
    # lineitems shipped more than 60 days after the order date.
    li = load_table(spark, sf_dir, "lineitem")
    late = li.join(orders, li.l_orderkey == orders.o_orderkey).where(
        F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)
    )
    return (
        orders.join(late.select("l_orderkey"), orders.o_orderkey == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def supplier_rank_in_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function query (reference has none, SURVEY.md §2.5):
    top-3 suppliers by account balance within each nation via
    rank() OVER (PARTITION BY nation ORDER BY balance DESC, key ASC).
    The partition key spreads across executors — no single-reducer
    bottleneck like the reference's boltl."""
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey").asc()
    )
    return (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .withColumn("rnk", F.rank().over(w).cast("long"))
        .where(F.col("rnk") <= 3)
        .select("n_name", "s_suppkey", "s_name", "s_acctbal", "rnk")
        .orderBy("n_name", "rnk", "s_suppkey")
    )


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti join (Spark's native anti join —
    no distinct, no row duplication): customers with no orders at
    all, counted per market segment."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(
            orders.select("o_custkey"),
            customer.c_custkey == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


def above_avg_balance_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery pattern: customers whose balance exceeds the
    global average, per nation. The scalar aggregate is a broadcast
    1-row cross join — no recompute per row, no driver round-trip."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    avg_bal = customer.agg(F.avg("c_acctbal").alias("_avg"))
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("_avg"))
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_rich"),
            _dec_sum(F.col("c_acctbal"), "total_bal"),
        )
        .orderBy("n_name")
    )


def brand_part_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING over part: brands with at least 40 parts,
    with size spread and average retail price (HAVING is just a
    post-aggregation filter in the same plan — no second pass)."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.min("p_size").alias("min_size"),
            F.max("p_size").alias("max_size"),
            det_round(F.avg("p_retailprice"), 4).alias("avg_price"),
        )
        .where(F.col("n_parts") >= 40)
        .orderBy("p_brand")
    )


def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: pure filter + global sum — the pushdown
    showcase. All three predicates reach the parquet scan; the
    aggregate is a single partial/final sum with a 1-row result."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(_dec_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue", scale=4))
    )


def sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets surface (reference has none, SURVEY.md §2.4):
    ROLLUP over (returnflag, linestatus) — subtotals and grand total
    in one pass. Rolled-up levels are labeled 'ALL' instead of NULL
    so cross-engine row comparison is null-free."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dec_sum(F.col("l_quantity"), "sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            "n",
            "sum_qty",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def engaged_purchasers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (§2.7 — absent in the reference): users with a
    high-value purchase AND a high-value click but no big error:
    INTERSECT then EXCEPT, all distinct semantics. (Value thresholds
    make each leg selective so the result is non-trivial on the
    synthetic data — every user has events of every type.)"""
    events = load_table(spark, sf_dir, "events")

    def users(etype: str, min_value: float) -> DataFrame:
        return events.where(
            (F.col("event_type") == etype) & (F.col("value") >= min_value)
        ).select("user_id")

    return (
        users("purchase", 100.0)
        .intersect(users("click", 100.0))
        .subtract(users("error", 200.0))
        .orderBy("user_id")
    )


def distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) per group — planned by Spark as a
    two-level aggregate (expand + partial), no driver-side dedup."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("event_type")
    )


def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct, with the accuracy claim
    VERIFIED inside the result (round-3 upgrade from rows-only, the
    same pattern as approx_value_percentiles): the sketch estimate
    must land within 3·rsd of the exact distinct count, and the
    boolean + the exact count are what the oracle hashes. The
    estimate itself is engine-specific and stays out of the hash.

    At 100 TB the sketch half is the default distinct-count path —
    fixed-size state, map-side mergeable, no shuffle of the distinct
    pairs; the exact half here is the audit and would run sampled."""
    events = load_table(spark, sf_dir, "events")
    rsd = 0.02
    return (
        events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=rsd).alias("_approx"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .select(
            "event_type",
            "n_users",
            (
                F.abs(F.col("_approx") - F.col("n_users")).cast("double")
                <= F.lit(3 * rsd) * F.col("n_users").cast("double")
            ).alias("within_3rsd"),
        )
        .orderBy("event_type")
    )


def hll_register_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog built from FIRST PRINCIPLES on md5 — every register
    is engine-reproducible, so unlike approx_count_distinct /
    hll_sketch_agg the WHOLE sketch (registers, harmonic sum,
    estimate, and the register-max MERGE that produces the __all__
    rollup) hash-matches a pure-SQL oracle. This is the repo's
    strongest sketch evidence: not "the estimate is close", but "the
    sketch algebra is bit-identical cross-engine".

    Construction (m = 1024 registers, 48-bit md5-prefix hash):
      bucket = h >> 38,  w = h & (2^38 - 1),
      rho = 39 - bitlen(w)  (w = 0 → 39),
      register M_b = max rho — ONE groupBy, map-side combinable.
    Merge for the rollup is pointwise register max — the same
    associative op that makes HLL the 100 TB distinct-count path
    (per-slice sketches union in constant time, no second data pass).

    Determinism: the harmonic sum Σ 2^(-M_b) is computed as the exact
    int64 Σ 2^(48-M_b) (max 1024·2^48 = 2^58, one correctly-rounded
    int64→double cast shared by both engines); the estimate is one
    textually-mirrored double expression; the small-range linear-
    counting branch (E ≤ 2.5m with empty registers) uses ln through
    the det_round output grid."""
    events = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    m = 1024
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10
    ).cast("long")
    w = h.bitwiseAND(F.lit(274877906943))  # low 38 bits
    rho = F.when(w == 0, F.lit(39)).otherwise(
        F.lit(39) - F.length(F.bin(w))
    )
    regs = (
        events.select(
            "event_type", F.shiftright(h, 38).alias("bucket"), rho.alias("rho")
        )
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("M"))
    )
    merged = (
        regs.groupBy("bucket")
        .agg(F.max("M").alias("M"))
        .select(F.lit("__all__").alias("event_type"), "bucket", "M")
    )
    allregs = regs.unionByName(merged)
    agg = allregs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("used"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(48 - M AS INT))")).alias(
            "_sp"
        ),
    )
    # harmonic denominator over ALL m registers: empty ones contribute
    # 2^0 = 1 each, i.e. 2^48 in the int64 grid
    s_d = (
        F.col("_sp") + (F.lit(m) - F.col("used")) * F.lit(281474976710656)
    ).cast("double")
    # textual parity with the SQL oracle: same literals, same
    # left-assoc order
    e_raw = (
        F.lit(0.7213)
        / (F.lit(1.0) + F.lit(1.079) / F.lit(1024.0))
        * F.lit(1048576.0)
        * F.lit(281474976710656.0)
        / s_d
    )
    linear = F.lit(1024.0) * F.log(
        F.lit(1024.0) / (F.lit(1024.0) - F.col("used").cast("double"))
    )
    est = F.when(
        (e_raw <= F.lit(2560.0)) & (F.col("used") < m), linear
    ).otherwise(e_raw)
    return (
        agg.select(
            "event_type",
            F.col("used").alias("used_buckets"),
            det_round(est, 6).alias("est_users"),
        )
        .orderBy("event_type")
    )


def approx_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable approximate quantiles (`percentile_approx`,
    Greenwald-Khanna summaries): p50/p90/p99 of value per event_type,
    with the GK error bound VERIFIED inside the result (round-3
    upgrade from a rows-only check, VERDICT r2 task 7).

    The sketch values themselves are engine-specific, so they can't
    hash-match a DuckDB oracle; what CAN is the guarantee: a GK
    summary at accuracy A returns a value whose rank is within
    ±n/A (+1 slack) of the target rank. The query computes the exact
    order statistics at those rank bounds (row_number per type — one
    extra shuffle, same key as the sketch aggregate) and emits one
    boolean per percentile: approx value ∈ [lo_val, hi_val]. The
    oracle asserts the bound by construction (`true AS p50_ok` ...)
    plus the exact group sizes — a hash-checked claim that the sketch
    honored its contract on this data.

    At 100 TB you'd run ONLY the sketch half (bounded per-partition
    summaries, map-side merge, no sort); the order-statistics half is
    the audit and would run on a sample."""
    events = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    accuracy = 10000
    qs = [0.5, 0.9, 0.99]
    pcts = F.percentile_approx("value", qs, accuracy)
    sk = events.groupBy("event_type").agg(
        pcts.alias("_p"), F.count(F.lit(1)).alias("n")
    )
    # target rank window per quantile: eps_n = ceil(n/accuracy) + 1
    eps_n = F.ceil(F.col("n").cast("double") / F.lit(float(accuracy))) + 1
    bounds = sk.select(
        "event_type",
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("qi"),
                        F.col("_p")[i].alias("approx"),
                        F.greatest(
                            F.lit(1),
                            F.ceil(F.lit(q) * F.col("n")) - eps_n,
                        ).alias("lo_k"),
                        F.least(
                            F.col("n"),
                            F.ceil(F.lit(q) * F.col("n")) + eps_n,
                        ).alias("hi_k"),
                    )
                    for i, q in enumerate(qs)
                ]
            )
        ).alias("b"),
    ).select("event_type", "n", "b.qi", "b.approx", "b.lo_k", "b.hi_k")
    w = Window.partitionBy("event_type").orderBy("value")
    ranked = events.select(
        "event_type", "value", F.row_number().over(w).alias("rk")
    )
    lo = ranked.select(
        F.col("event_type"), F.col("rk").alias("lo_k"), F.col("value").alias("lo_val")
    )
    hi = ranked.select(
        F.col("event_type"), F.col("rk").alias("hi_k"), F.col("value").alias("hi_val")
    )
    checked = (
        bounds.join(lo, ["event_type", "lo_k"])
        .join(hi, ["event_type", "hi_k"])
        .withColumn(
            "ok",
            (F.col("approx") >= F.col("lo_val"))
            & (F.col("approx") <= F.col("hi_val")),
        )
    )
    return (
        checked.groupBy("event_type", "n")
        .agg(
            F.max(F.when(F.col("qi") == 0, F.col("ok"))).alias("p50_ok"),
            F.max(F.when(F.col("qi") == 1, F.col("ok"))).alias("p90_ok"),
            F.max(F.when(F.col("qi") == 2, F.col("ok"))).alias("p99_ok"),
        )
        .select("event_type", "n", "p50_ok", "p90_ok", "p99_ok")
        .orderBy("event_type")
    )


def sessionize_events(spark: SparkSession, sf_dir: str, gap_minutes: int = 30) -> DataFrame:
    """Sessionization over the events stream table: a new session
    starts after a >gap_minutes silence per user (classic
    lag + cumulative-sum pattern). Output: sessions per user + avg
    session length in events.

    Scale: both windows partition by user_id, so the whole job is one
    shuffle by user; skewed users are split by AQE. The streaming
    twin of this is `session_window()` in streaming/jobs.py.
    """
    events = load_table(spark, sf_dir, "events")
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_session = (
        F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(by_user)
        > gap_minutes * 60
    ).cast("int")
    sessions = events.withColumn(
        "session_id",
        F.sum(F.coalesce(new_session, F.lit(0))).over(
            by_user.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            det_round(F.avg("n_events")).alias("avg_events_per_session"),
        )
        .orderBy("user_id")
    )


def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style: promotional share of one month's revenue.
    lineitem (one month, filter pushed to the scan) ⋈ part on
    partkey; revenue sums follow the DECIMAL(18,4) money rule, the
    final percentage is a double with det_round. part scales with SF
    so its join strategy is AQE's call (broadcast while it fits)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-09-01"))
        & (F.col("l_shipdate") < F.lit("1996-10-01"))
    )
    part = load_table(spark, sf_dir, "part")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    promo = F.when(F.col("p_type").startswith("PROMO"), disc).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    joined = li.join(part, li.l_partkey == part.p_partkey)
    return joined.agg(
        F.sum(promo).cast("double").alias("promo_revenue"),
        F.sum(disc).cast("double").alias("total_revenue"),
        det_round(
            F.lit(100.0) * F.sum(promo).cast("double") / F.sum(disc).cast("double")
        ).alias("promo_ratio_pct"),
    )


def bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style: revenue from an OR of three
    (brand, size-range, quantity-range) brackets — the classic
    multi-predicate join where the part filter (3 brands) prunes the
    build side to a sliver before the join; the bracket predicate
    rides the join so no lineitem row survives unmatched."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_brand").isin("Brand#1", "Brand#13", "Brand#20")
    )
    q = F.col("l_quantity")
    brackets = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 5)
         & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(1, 10)
           & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#20") & F.col("p_size").between(1, 15)
           & q.between(20, 30))
    )
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        li.join(part, (li.l_partkey == part.p_partkey) & brackets)
        .agg(
            F.sum(disc).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


def events_per_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window in batch (`F.window`): events and
    value sum per 1-hour bucket. The same expression works under
    readStream + watermark — the batch result is the streaming
    query's converged state."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("hour_start"),  # epoch sec: tz-proof
            "n",
            "sum_value",
        )
        .orderBy("hour_start")
    )


def user_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user counts of each event type as columns
    (conditional aggregation — one pass, one shuffle; Spark's
    .pivot() plans the same thing given explicit values; explicit
    `when` keeps the column set static for the contract schema)."""
    events = load_table(spark, sf_dir, "events")

    def n_of(t: str):
        return F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).cast(
            "long"
        ).alias(f"n_{t}")

    return (
        events.groupBy("user_id")
        .agg(n_of("click"), n_of("view"), n_of("purchase"), n_of("signup"), n_of("error"))
        .orderBy("user_id")
    )


def profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling pass (what a pipeline runs before trusting a
    new drop): row count, key cardinalities, null counts, value
    range — one scan, one row out."""
    events = load_table(spark, sf_dir, "events")
    return events.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_event_types"),
        F.sum(F.col("value").isNull().cast("long")).alias("null_values"),
        F.round(F.min("value"), 4).alias("min_value"),
        F.round(F.max("value"), 4).alias("max_value"),
        F.min("ts").cast("long").alias("first_ts"),  # epoch sec: tz-proof
        F.max("ts").cast("long").alias("last_ts"),
    )


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style correlated aggregate: revenue from lineitems
    whose quantity is below 20% of their part's average quantity,
    for one brand. The correlated scalar subquery decorrelates into
    a per-part aggregate joined back to the facts — one extra
    shuffle on partkey, no per-row subquery execution. The avg
    threshold is IEEE-deterministic (exact integer-valued sums /
    count), so the boundary comparison agrees across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#4")
    thr = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("_thr")
    )
    return (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == part.p_partkey)
        .join(thr, "l_partkey")
        .where(F.col("l_quantity") < F.col("_thr"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / F.lit(7.0)
            ).alias("avg_yearly")
        )
    )


def monthly_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-frame + lag window surface: monthly revenue, its
    cumulative sum (ROWS UNBOUNDED PRECEDING frame), and
    month-over-month delta (lag). Sums and the delta stay in exact
    DECIMAL until the final double cast (the money-sum rule). The
    unpartitioned window runs on the ~tens-of-rows monthly rollup,
    AFTER aggregation — not on the raw fact table — so the
    single-partition window is never a scale hazard."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("long")
        .alias("ym")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("_rev"))
    w = Window.orderBy("ym")
    run = Window.orderBy("ym").rowsBetween(Window.unboundedPreceding, 0)
    zero = F.lit(0).cast("decimal(18,2)")
    return monthly.select(
        "ym",
        F.col("_rev").cast("double").alias("rev"),
        F.sum("_rev").over(run).cast("double").alias("cum_rev"),
        (F.col("_rev") - F.coalesce(F.lag("_rev", 1).over(w), zero))
        .cast("double")
        .alias("delta_rev"),
    ).orderBy("ym")


def customer_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile window surface: customers bucketed into spend deciles
    (total order value, deterministic total order via the custkey
    tie-break), summarized per decile. The ntile runs on the per-key
    aggregate, not the fact table."""
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("_spend")
    )
    w = Window.orderBy(F.col("_spend").desc(), F.col("o_custkey").asc())
    return (
        spend.withColumn("decile", F.ntile(10).over(w).cast("long"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("_spend").cast("double").alias("decile_rev"),
        )
        .orderBy("decile")
    )


def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (p50/p90/p99) of event value
    per type. Exact `percentile` (not approx) so the DuckDB
    quantile_cont oracle matches bit-for-bit after rounding; the
    approximate production variant at 100 TB is
    `percentile_approx`/t-digest (see approx_distinct_users for the
    sketch-op pattern)."""
    events = load_table(spark, sf_dir, "events")

    def pct(p: float, name: str):
        return F.round(F.expr(f"percentile(value, {p})"), 6).alias(name)

    return (
        events.groupBy("event_type")
        .agg(pct(0.5, "p50"), pct(0.9, "p90"), pct(0.99, "p99"))
        .orderBy("event_type")
    )


def part_name_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-matching surface: LIKE filter + regex extraction.
    Counts ECONOMY parts per leading adjective of p_name ('red
    widget' → 'red'), keeping only color-ish adjectives via a second
    regex predicate. Equality/prefix predicates are
    pushdown-eligible; the regex runs codegen'd post-scan."""
    part = load_table(spark, sf_dir, "part")
    adjective = F.regexp_extract("p_name", r"^(\w+)", 1)
    return (
        part.where(F.col("p_type").like("%ECONOMY%"))
        .withColumn("adjective", adjective)
        .where(F.col("adjective").rlike("^(red|blue|hot|cold)$"))
        .groupBy("adjective")
        .agg(
            F.count(F.lit(1)).alias("n"),
            det_round(F.avg("p_retailprice"), 4).alias("avg_price"),
        )
        .orderBy("adjective")
    )


def purchase_last_click_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: for each purchase event, the most recent click by
    the same user at or before the purchase (inner — purchases with
    no prior click drop out). Oracle: DuckDB's native ASOF JOIN.
    Timestamps emitted as epoch seconds (tz-proof)."""
    from stream_processing_system_spark.operators.temporal import asof_join

    events = load_table(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.where(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join(purchases, clicks, key="user_id")
    return joined.select(
        "event_id",
        "user_id",
        F.col("ts").cast("long").alias("ts_s"),
        F.col("r_ts").cast("long").alias("click_ts_s"),
    ).orderBy("event_id")


def clicks_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded interval (range) join: clicks by the same user in the
    hour before each purchase, counted — executed as a bucketed
    equi-join (2 buckets/row fan-out), not a nested-loop inequality
    join."""
    from stream_processing_system_spark.operators.temporal import interval_count_join

    events = load_table(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.where(F.col("event_type") == "click").select("user_id", "ts")
    joined = interval_count_join(
        purchases, clicks, key="user_id", window_seconds=3600
    )
    return joined.select(
        "event_id", "user_id", F.col("n_in_window").cast("long").alias("n_clicks_1h")
    ).orderBy("event_id")


def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction (X6 analog — the reference JSON-
    decodes every tuple on every hop, `bolt/bolt.go:220-221`; here
    JSON parsing happens once, in a codegen'd expression): pull `k`
    out of the events.props JSON and aggregate per event_type."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        events.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").cast("long").alias("min_k"),
            F.max("k").cast("long").alias("max_k"),
        )
        .orderBy("event_type")
    )


def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style: shipped revenue between two nations by supplier
    nation, customer nation, and ship year.

    The two nation dims are fixed-size (25 rows) → hard broadcast on
    both sides of the fact chain; the nation-pair predicate is applied
    right after the broadcasts so the orders ⋈ lineitem shuffle only
    carries the ~2/25² of rows that survive. Year extraction is a
    codegen'd expression, never a UDF.
    """
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31"))
    )
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = F.broadcast(nation.select(F.col("n_nationkey").alias("s_nk"),
                                   F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(nation.select(F.col("n_nationkey").alias("c_nk"),
                                   F.col("n_name").alias("cust_nation")))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .where(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_dec_sum(volume, "revenue", scale=4))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style: NATION_3's share of ECONOMY-part revenue sold
    into EUROPE, by order year.

    Share = conditional sum / total sum in ONE aggregation pass (no
    second scan, no self-join): both numerator and denominator are
    decimal sums so the ratio is order-independent, then det_round
    makes the division cross-engine stable.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31"))
    )
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")

    cust_nations = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey).select(
            F.col("n_nationkey").alias("c_nk")
        )
    )
    supp_nation = F.broadcast(
        nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    )
    volume = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    target = F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(cust_nations, F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(supp_nation, F.col("s_nationkey") == F.col("s_nk"))
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy("o_year")
        .agg(
            F.sum(target).alias("_num"),
            F.sum(volume).alias("_den"),
        )
        .select(
            "o_year",
            det_round(F.col("_num").cast("double") / F.col("_den").cast("double")).alias(
                "mkt_share"
            ),
        )
        .orderBy("o_year")
    )


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style: how many customers placed exactly N qualifying
    orders (non-urgent), INCLUDING the zero-order customers.

    Left outer join with the filter on the RIGHT side (orders), then
    count(o_orderkey) so unmatched customers count 0 — the classic
    histogram-of-activity shape. Two shuffles total: the outer join
    and the tiny histogram aggregation.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style: the supplier(s) with maximum revenue over one
    quarter. The scalar max is computed with a window over the tiny
    per-supplier aggregate (100–1M rows at any SF) — no second scan of
    lineitem, no driver round-trip."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    supplier = load_table(spark, sf_dir, "supplier")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_supp = li.groupBy("l_suppkey").agg(_dec_sum(revenue, "total_rev", scale=4))
    w = Window.partitionBy()
    best = per_supp.withColumn("_max", F.max("total_rev").over(w)).where(
        F.col("total_rev") == F.col("_max")
    )
    return (
        best.join(F.broadcast(supplier), best.l_suppkey == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style: orders whose total quantity exceeds 250, with
    their customer. The HAVING subquery is the same aggregate reused
    (self-semi-join eliminated): aggregate once, filter, then join the
    two dims back. orders ⋈ agg is keyed on l_orderkey — co-partitioned
    with the aggregation output, so AQE plans it without a second
    shuffle of the big side."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(_dec_sum(F.col("l_quantity"), "total_qty"))
        .where(F.col("total_qty") > 250)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("o_orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


def late_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style: suppliers who were the ONLY late shipper on a
    finished multi-supplier order ("late" = shipped >90 days after the
    order date; the snapshot has no commit/receipt dates —
    FIXTURES.md documents the substitution).

    EXISTS → left-semi join, NOT EXISTS → left-anti join, both on
    l_orderkey with a non-equi supplier clause — Spark executes them
    as shuffled semi/anti hash joins, no row explosion, no distinct.
    """
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    lines = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)).alias("late"),
    )
    l1 = lines.where(F.col("late")).select("l_orderkey", "l_suppkey")
    other = lines.select(
        F.col("l_orderkey").alias("o_ok"), F.col("l_suppkey").alias("o_sk"), "late"
    )
    sole_late = (
        l1.join(
            other,
            (F.col("l_orderkey") == F.col("o_ok"))
            & (F.col("l_suppkey") != F.col("o_sk")),
            "left_semi",
        )
        .join(
            other.where(F.col("late")),
            (F.col("l_orderkey") == F.col("o_ok"))
            & (F.col("l_suppkey") != F.col("o_sk")),
            "left_anti",
        )
    )
    return (
        sole_late.join(F.broadcast(supplier), sole_late.l_suppkey == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )


def copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the user co-purchase graph (same-day, same
    props.k cell ⇒ edge). 3 power iterations on a 1e-9 integer grid —
    bit-stable at any parallelism (operators/graph.py docstring has
    the full determinism contract)."""
    from stream_processing_system_spark.operators.graph import (
        cooccurrence_edges,
        pagerank,
    )

    events = load_table(spark, sf_dir, "events")
    edges = cooccurrence_edges(events)
    return (
        pagerank(edges, iters=3, damping=0.85)
        .select(F.col("node").alias("user_id"), "pagerank")
        .orderBy("user_id")
    )


def copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user triangle counts over the co-purchase graph — the
    ordered-wedge join (operators/graph.py:triangle_counts)."""
    from stream_processing_system_spark.operators.graph import (
        cooccurrence_edges,
        triangle_counts,
    )

    events = load_table(spark, sf_dir, "events")
    edges = cooccurrence_edges(events)
    return (
        triangle_counts(edges)
        .select(F.col("node").alias("user_id"), "n_triangles")
        .orderBy("user_id")
    )


def copurchase_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection over the co-purchase graph: 4 rounds of
    synchronous label propagation (operators/graph.py:
    label_propagation — most-frequent neighbor label, min tie-break).
    Deterministic by construction; the oracle unrolls the same 4
    rounds as materialized CTEs."""
    from stream_processing_system_spark.operators.graph import (
        cooccurrence_edges,
        label_propagation,
    )

    events = load_table(spark, sf_dir, "events")
    edges = cooccurrence_edges(events)
    return (
        label_propagation(edges, rounds=4)
        .select(F.col("node").alias("user_id"), F.col("label").alias("community"))
        .orderBy("user_id")
    )


def copurchase_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the co-purchase graph (operators/graph.py:kcore):
    users surviving 8 rounds of degree-<3 peeling, with their degree
    inside the core. The peel is monotone, so the unrolled-8-round
    oracle is exact whenever the peel has converged — pytest asserts
    round 7 == round 8 at test scales (tests/test_graph.py)."""
    from stream_processing_system_spark.operators.graph import (
        cooccurrence_edges,
        kcore,
    )

    events = load_table(spark, sf_dir, "events")
    edges = cooccurrence_edges(events)
    return (
        kcore(edges, k=3, rounds=8)
        .select(F.col("node").alias("user_id"), "core_degree")
        .orderBy("user_id")
    )


def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-event funnel: users with a view, then a click AFTER
    their first view, then a purchase AFTER that click. One
    per-(user, stage) min-timestamp aggregate, then two broadcast-free
    equi-joins on user_id — the sequential "happened after" conditions
    are plain column comparisons on the 1-row-per-user aggregates, so
    no window function and no event-pair explosion. Output one row of
    stage counts."""
    events = load_table(spark, sf_dir, "events")
    per_user = (
        events.where(F.col("event_type").isin("view", "click", "purchase"))
        .groupBy("user_id")
        .pivot("event_type", ["view", "click", "purchase"])
        .agg(F.min("ts"))
    )
    first_click_after_view = (
        events.where(F.col("event_type") == "click")
        .join(
            per_user.where(F.col("view").isNotNull()).select("user_id", "view"),
            "user_id",
        )
        .where(F.col("ts") >= F.col("view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_after_view"))
    )
    purchase_after_click = (
        events.where(F.col("event_type") == "purchase")
        .join(first_click_after_view, "user_id")
        .where(F.col("ts") >= F.col("click_after_view"))
        .select("user_id")
        .distinct()
    )
    n_view = per_user.where(F.col("view").isNotNull()).agg(
        F.count(F.lit(1)).alias("n_users_view")
    )
    n_click = first_click_after_view.agg(
        F.count(F.lit(1)).alias("n_users_click_after_view")
    )
    n_purchase = purchase_after_click.agg(
        F.count(F.lit(1)).alias("n_users_purchase_after_click")
    )
    # three 1-row aggregates — broadcast crossJoins, no driver actions
    return n_view.crossJoin(F.broadcast(n_click)).crossJoin(F.broadcast(n_purchase))


def weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by first-active week (epoch
    weeks — floor(epoch/604800), calendar-free so both engines bucket
    identically), counted as active per (cohort_week, week_offset).
    Two shuffles: the per-user min aggregate and the cohort-cell
    count; the user->cohort join is keyed on user_id (co-partitioned
    with the aggregate that produced it)."""
    events = load_table(spark, sf_dir, "events")
    # integer DIV, not double division: a double quotient can round
    # up across the week boundary and disagree with floor-div oracles
    week = F.expr("CAST(CAST(ts AS LONG) DIV 604800 AS LONG)")
    cohorts = events.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    active = events.select("user_id", week.alias("event_week")).distinct()
    return (
        active.join(cohorts, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("event_week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) window aggregate: 2-hour windows advancing
    every hour — each event lands in exactly two windows. Spark emits
    this natively from `window(ts, '2 hours', '1 hour')`; the oracle
    unnests the two candidate window starts per event. Complements
    the tumbling (events_per_hour) and session (sessionize_events)
    window coverage."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "2 hours", "1 hour").alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "n",
            "sum_value",
        )
        .orderBy("window_start")
    )


def fuzzy_part_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution-style fuzzy self-join: part names within
    edit distance 3, BLOCKED on the name's first token so the
    quadratic levenshtein only runs inside blocks (the same
    sub-quadratic shape as LSH banding — at 100 TB the block key
    bounds the self-join fan-out; a production pipeline would add a
    length-band to the block key).

    levenshtein() is a built-in with identical semantics in Spark and
    DuckDB, so the whole operator is value-hash oracle-checkable.

    Round-3 plan rework (72 s → ~2 s at sf0.1, same result): the
    expensive function runs at NAME grain, not row grain. Names are
    massively duplicated (64 distinct over 20k parts at sf0.1, and a
    catalog's name-to-row ratio only shrinks as facts grow), so
    levenshtein over row pairs recomputed each distinct comparison
    ~48k times. Now: distinct names → blocked name-pair levenshtein
    (constant-size frame, broadcast) → expand back to key pairs with
    two broadcast joins. The expansion fan-out (1.5M pairs at sf0.1)
    is the OUTPUT size — inherent, not overhead."""
    part = load_table(spark, sf_dir, "part")
    names = (
        part.select("p_name")
        .distinct()
        .withColumn("_blk", F.split(F.col("p_name"), " ").getItem(0))
    )
    na = names.select(
        "_blk", F.col("p_name").alias("name_a")
    )
    nb = names.select(
        "_blk", F.col("p_name").alias("name_b")
    )
    close = (
        na.join(nb, "_blk")
        .where(F.col("name_a") != F.col("name_b"))
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("long").alias("edit_dist"),
        )
        .where(F.col("edit_dist") <= 3)
    )
    ka = part.select(
        F.col("p_name").alias("name_a"), F.col("p_partkey").alias("key_a")
    )
    kb = part.select(
        F.col("p_name").alias("name_b"), F.col("p_partkey").alias("key_b")
    )
    return (
        ka.join(F.broadcast(close), "name_a")
        .join(kb, "name_b")
        .where(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b", "edit_dist")
        .orderBy("key_a", "key_b")
    )


def returned_item_losses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: top-20 customers by revenue lost to returned
    items in one quarter. lineitem's returnflag filter is pushed to
    the scan; customer ⋈ nation is a broadcast; the orders ⋈ lineitem
    shuffle carries only the quarter's orders."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(_dec_sum(revenue, "revenue", scale=4))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bin histogram profiler: event values bucketed into
    width-50 bins per event_type. Bin = floor(value/50) as IDENTICAL
    double math in both engines (integer DIV truncates toward zero in
    Spark but floors in DuckDB, so it would disagree on negative
    values; double divide-then-floor agrees everywhere). The
    data-profiling primitive: one map + one small aggregate, bin
    domain bounded by value range / width."""
    events = load_table(spark, sf_dir, "events")
    bin_col = F.floor(F.col("value") / 50).cast("long")
    return (
        events.where(F.col("value").isNotNull())
        .groupBy("event_type", bin_col.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type", "bin")
    )


def orders_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style per-column profile of orders (nulls, exact NDV,
    min/max) in ONE aggregation pass — all 6 columns' stats are
    computed in a single .agg() (24 expressions, one shuffle of one
    row), then unpivoted into per-column rows with a struct-array
    explode. The table-profiling primitive a pipeline runs before
    choosing partition/bucket columns."""
    orders = load_table(spark, sf_dir, "orders")
    numeric = ["o_orderkey", "o_custkey", "o_totalprice"]
    strings = ["o_orderstatus", "o_orderpriority"]
    stamps = ["o_orderdate"]
    # Round-10 (guide §7.2): six countDistinct in one .agg() planned
    # as Expand ×7 + SortAggregate (min/max(string) forbids the hash
    # lane, and the distinct rewrite sorts the expanded frame twice —
    # 4.3 s at sf0.1). Exact NDV now runs as explode + two
    # combine-enabled HashAggregates over injective string casts
    # (long/decimal/timestamp → canonical string, so the distinct
    # count is unchanged); the min/max/null pass below stays a single
    # grouping-free aggregate (no sort without grouping keys).
    nd_pairs = orders.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("_c"),
                        F.col(c).cast("string").alias("_v"),
                    )
                    for c in numeric + strings + stamps
                ]
            )
        ).alias("s")
    ).select("s._c", "s._v").where(F.col("_v").isNotNull())
    nd = (
        nd_pairs.groupBy("_c", "_v")
        .agg(F.count(F.lit(1)).alias("_dummy"))
        .groupBy("_c")
        .agg(F.count(F.lit(1)).cast("long").alias("_nd"))
    )
    aggs = []
    for c in numeric + strings + stamps:
        aggs.append((F.count(F.lit(1)) - F.count(c)).cast("long").alias(f"{c}__nulls"))
    for c in numeric:
        aggs.append(F.min(c).cast("double").alias(f"{c}__min"))
        aggs.append(F.max(c).cast("double").alias(f"{c}__max"))
    for c in stamps:
        # TIMESTAMP_NTZ has no direct long cast; via TIMESTAMP (session
        # tz is UTC, matching DuckDB's epoch() on naive timestamps)
        epoch = F.col(c).cast("timestamp").cast("long")
        aggs.append(F.min(epoch).cast("double").alias(f"{c}__min"))
        aggs.append(F.max(epoch).cast("double").alias(f"{c}__max"))
    for c in strings:
        aggs.append(F.min(c).alias(f"{c}__smin"))
        aggs.append(F.max(c).alias(f"{c}__smax"))
    row = orders.agg(*aggs)
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    entries = []
    for c in numeric + strings + stamps:
        has_num = c not in strings
        entries.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                (F.col(f"{c}__min") if has_num else null_d).alias("min_num"),
                (F.col(f"{c}__max") if has_num else null_d).alias("max_num"),
                (F.col(f"{c}__smin") if c in strings else null_s).alias("min_str"),
                (F.col(f"{c}__smax") if c in strings else null_s).alias("max_str"),
            )
        )
    stats = row.select(F.explode(F.array(*entries)).alias("s")).select("s.*")
    return (
        stats.join(F.broadcast(nd), stats.col_name == nd._c)
        .select(
            "col_name",
            "n_nulls",
            F.col("_nd").alias("n_distinct"),
            "min_num",
            "max_num",
            "min_str",
            "max_str",
        )
        .orderBy("col_name")
    )


def sales_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over (o_orderstatus, o_orderpriority): every
    grouping-set combination — (both), (status), (priority), () — in
    one pass (completes the grouping-sets surface next to
    `sales_rollup`'s ROLLUP). Spark plans CUBE as a single Expand +
    hash aggregate: each input row fans out to 4 grouping rows
    map-side, then one shuffle on a key domain of ~24 rows — the
    shuffle cost is the same as a plain GROUP BY, independent of
    input size, so it scales like pricing_summary."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dec_sum(F.col("o_totalprice"), "sum_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            "n",
            "sum_price",
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly detection over the event stream: hourly event counts
    per type, flagged where the count deviates from that type's mean
    by more than 2 population standard deviations. Two aggregations:
    (type, hour) counts — the only data-sized shuffle — then a
    per-type window over ~720 hourly rows (tiny). At 100 TB the
    hourly rollup is the map-side-combinable first stage; the z-score
    pass runs on the aggregate, never the raw events."""
    events = load_table(spark, sf_dir, "events")
    hourly = (
        events.groupBy(
            "event_type",
            F.floor(F.col("ts").cast("long") / 3600).cast("long").alias("hour_idx"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("event_type")
    z = (F.col("n") - F.avg("n").over(w)) / F.stddev_pop("n").over(w)
    return (
        hourly.withColumn("zscore", z)
        .where(F.abs(F.col("zscore")) > 2.0)
        .select("event_type", "hour_idx", "n", det_round(F.col("zscore")).alias("zscore"))
        .orderBy("event_type", "hour_idx")
    )


def events_gapfill_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill + exponential smoothing: per event type,
    the hourly value sum with MISSING HOURS materialized as zeros
    (sequence(min,max) explode against the observed hours), then an
    exp-decayed rolling signal sum_{k=0..6} x[t-k] * 0.5^k — a 7-tap
    impulse response written as explicit lag taps so both engines
    evaluate the identical IEEE expression (0.5^k is an exact power
    of two, so products and the fixed-order sum are bit-stable).
    Scale: the raw-event shuffle is the hourly rollup (map-side
    combined); the gap-fill sequence and lag window run on
    hours×types rows — ~9k rows per year per type, driver-free."""
    events = load_table(spark, sf_dir, "events")
    hourly = (
        events.groupBy(
            "event_type",
            F.floor(F.col("ts").cast("long") / 3600).cast("long").alias("hour_idx"),
        )
        .agg(F.round(F.sum("value"), 4).alias("val"))
    )
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("hour_idx").alias("lo"), F.max("hour_idx").alias("hi"))
        .select("event_type", F.explode(F.sequence("lo", "hi")).alias("hour_idx"))
    )
    filled = (
        spine.join(hourly, ["event_type", "hour_idx"], "left")
        .select("event_type", "hour_idx", F.coalesce("val", F.lit(0.0)).alias("val"))
    )
    w = Window.partitionBy("event_type").orderBy("hour_idx")
    decayed = sum(
        F.coalesce(F.lag("val", k).over(w), F.lit(0.0)) * F.lit(0.5**k)
        for k in range(7)
    )
    return (
        filled.select(
            "event_type",
            "hour_idx",
            "val",
            det_round(decayed).alias("decayed"),
        )
        .orderBy("event_type", "hour_idx")
    )


def order_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style snapshot diff (the SCD/merge primitive): compare the
    per-customer order state as of 1998-01-01 against today's, and
    emit one change record per customer whose state changed —
    `insert` (customer appears only now) or `update` (totals moved);
    unchanged customers are dropped. Because the old snapshot is a
    predicate over the same fact table, BOTH snapshots fold into ONE
    conditional aggregation: one scan, one map-side-combined shuffle,
    no join at all (a naive formulation full-outer-joins two
    aggregates — twice the scan and an avoidable sort-merge join;
    `.explain` confirmed the fold removes both). This is the shape of
    an incremental warehouse merge at 100 TB — state carried as
    aggregates, never a row-by-row diff."""
    orders = load_table(spark, sf_dir, "orders")
    is_old = F.col("o_orderdate") < F.lit("1998-01-01")
    price_dec = F.col("o_totalprice").cast("decimal(18,2)")
    agg = orders.groupBy("o_custkey").agg(
        F.count(F.when(is_old, 1)).alias("n_old"),
        F.count(F.lit(1)).alias("n_new"),
        F.coalesce(
            F.sum(F.when(is_old, price_dec)).cast("double"), F.lit(0.0)
        ).alias("total_old"),
        F.sum(price_dec).cast("double").alias("total_new"),
    )
    change = (
        F.when(F.col("n_old") == 0, F.lit("insert"))
        .when(F.col("n_new") != F.col("n_old"), F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        agg.withColumn("change_type", change)
        .where(F.col("change_type") != "unchanged")
        .select(
            "o_custkey", "change_type", "n_old", "n_new", "total_old", "total_new"
        )
        .orderBy("o_custkey")
    )


def lineitem_numeric_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation matrix over lineitem's numeric columns —
    the feature-screening primitive. All 6 pairwise correlations are
    computed in ONE aggregation pass (each corr is a co-moment
    aggregate; Spark fuses them into a single partial+final hash
    aggregate over one scan), then unpivoted to (col_a, col_b, corr)
    rows. Rounded to 6 digits: the co-moment merge order differs
    between engines in the ~1e-15 tail."""
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    row = li.agg(
        *[det_round(F.corr(a, b)).alias(f"{a}|{b}") for a, b in pairs]
    )
    entries = [
        F.struct(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            F.col(f"`{a}|{b}`").alias("corr"),
        )
        for a, b in pairs
    ]
    return (
        row.select(F.explode(F.array(*entries)).alias("s"))
        .select("s.*")
        .orderBy("col_a", "col_b")
    )


def purchase_click_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (completing the §2.3 join-type matrix: inner/
    left/semi/anti/as-of/interval/stream-stream are covered
    elsewhere): per-user purchase counts against click counts,
    keeping users who only ever did one of the two. Both sides
    aggregate BEFORE the join — the join matches ~|users| rows, not
    |events|², and at scale both sides arrive hash-partitioned on the
    same key so the outer join adds no extra shuffle."""
    events = load_table(spark, sf_dir, "events")

    def side(ev_type: str, out: str) -> DataFrame:
        return (
            events.where(F.col("event_type") == ev_type)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias(out))
        )

    p = side("purchase", "n_purchases")
    c = side("click", "n_clicks")
    return (
        p.join(c, "user_id", "full_outer")
        .select(
            "user_id",
            F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
        )
        .orderBy("user_id")
    )


def lineitem_measures_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt (`DataFrame.unpivot`, the inverse of pivot —
    §2.6 family): lineitem's four numeric measures melt to
    (measure, value) rows and aggregate per measure. Physically one
    Expand (4 rows per input row, map-side) feeding a
    map-side-combined 4-key aggregate — no shuffle grows with the
    melt factor. Sums quantize to integer micro-units before adding,
    so the per-measure totals are partition-order-independent."""
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    melted = li.select(
        *[F.col(c).cast("double").alias(c) for c in cols]
    ).unpivot([], cols, "measure", "value")
    return (
        melted.groupBy("measure")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 10000 + 0.5).cast("long")).alias("_s"),
        )
        .select(
            "measure", "n", (F.col("_s") / F.lit(10000.0)).alias("sum_value")
        )
        .orderBy("measure")
    )


def events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 users by count-min-sketch ESTIMATE (depth 4 × width 256
    counters) — the mergeable fixed-size sketch answer to "who are
    the heavy hitters" that never shuffles more than depth×width
    cells regardless of input size (operators/core.py
    cms_heavy_hitters has the scale analysis)."""
    from stream_processing_system_spark.operators.core import cms_heavy_hitters

    events = load_table(spark, sf_dir, "events")
    return cms_heavy_hitters(events, "user_id", depth=4, width=256, k=20)


def status_priority_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((status), (priority)) — the two
    single-dimension subtotal views in one pass, WITHOUT the
    all-combinations fan-out of CUBE (Expand emits 2 rows per input
    instead of 4; at 100 TB that halves the pre-combine volume vs
    computing the same answer through CUBE and filtering). Via
    spark.sql — grouping sets have no DataFrame-API spelling, which
    also exercises the SQL front door over a registered temp view."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
               coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
               count(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        ORDER BY o_orderstatus, o_orderpriority
        """
    )


def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-style: for each STANDARD part (size ≤ 25), the ASIA
    supplier offering the minimum observed unit price. The snapshot
    has no partsupp table (FIXTURES.md), so the part×supplier cost
    relation is DERIVED from lineitem: unit cost = min per-line
    `l_extendedprice / l_quantity` per (partkey, suppkey).

    The correlated `cost = (SELECT MIN(...) per part)` subquery is a
    window MIN over the per-(part,supp) aggregate — one extra shuffle
    over an already-reduced relation (≤ |part|×|supp| rows), never a
    second scan of lineitem. Region/nation prune suppliers BEFORE the
    window, so the min is taken over eligible suppliers only.
    Per-line division of two doubles is bit-identical across engines,
    and MIN is order-independent, so the equality filter against the
    window min is exact — no epsilon needed.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 25)
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    asia_supp = F.broadcast(
        supplier.join(
            F.broadcast(nation.join(region, nation.n_regionkey == region.r_regionkey)),
            supplier.s_nationkey == F.col("n_nationkey"),
        ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    costs = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
        .join(asia_supp, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    w = Window.partitionBy("l_partkey")
    best = costs.withColumn("_min", F.min("unit_cost").over(w)).where(
        F.col("unit_cost") == F.col("_min")
    )
    return (
        best.join(F.broadcast(part), best.l_partkey == part.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "unit_cost")
        .orderBy(
            F.col("s_acctbal").desc(),
            F.col("n_name").asc(),
            F.col("s_name").asc(),
            F.col("p_partkey").asc(),
        )
        .limit(100)
    )


def important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-style: parts whose shipped value from NATION_5
    suppliers exceeds 0.1% of that nation's total shipped value
    (partsupp availqty×supplycost replaced by lineitem extendedprice —
    FIXTURES.md).

    The global threshold is a 1-row aggregate of the SAME per-part
    aggregate (no second lineitem scan) cross-joined as a broadcast —
    the Spark idiom for `HAVING > (SELECT SUM(...) * frac)`. Sums are
    decimal so both the per-part values and the scalar total are
    order-independent; the comparison happens on exact decimals.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_5")
    n5_supp = F.broadcast(
        supplier.join(F.broadcast(nation), supplier.s_nationkey == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    per_part = (
        li.join(n5_supp, li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("_value_dec")
        )
    )
    total = per_part.agg(F.sum("_value_dec").alias("_total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(
            F.col("_value_dec").cast("double")
            > F.col("_total").cast("double") * F.lit(0.001)
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("_value_dec").cast("double").alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), F.col("p_partkey").asc())
    )


def supplier_cnt_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style: distinct-supplier counts per (brand, type,
    size) for non-Brand#1, non-PROMO parts in eight sizes, excluding
    "complaint" suppliers (analogue: negative account balance — the
    snapshot has no comment column, FIXTURES.md).

    The exclusion is a LEFT ANTI join against the (tiny, broadcast)
    bad-supplier set — never a NOT IN subquery that would block
    pushdown. count(DISTINCT) runs as the standard two-phase expand:
    partial distinct per partition, exchange on the group key, final
    count — no row explosion beyond the distinct pairs themselves.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").startswith("PROMO"))
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    )
    complaints = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(complaints, li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(),
            F.col("p_brand").asc(),
            F.col("p_type").asc(),
            F.col("p_size").asc(),
        )
    )


def promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-style: NATION_7 suppliers who shipped, for at least
    one PROMO part in 1997, more than 30% of that part's total 1997
    shipped quantity (the availqty > ½·sum(qty) inner subquery pair,
    re-derived from lineitem — FIXTURES.md).

    The nested aggregate (per part-supplier vs per part) is ONE
    aggregation plus a window SUM over its output — the inner
    `(SELECT 0.3 * SUM(l_quantity) ...)` never rescans lineitem. The
    qualifying (part, supplier) pairs then LEFT SEMI join supplier:
    the EXISTS collapses without a distinct. Quantity sums are
    decimal (order-independent); the 30% comparison is done in
    doubles derived from those exact decimals, identically in both
    engines.
    """
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    per_pair = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_qty_sp"))
    )
    w = Window.partitionBy("l_partkey")
    qualifying = per_pair.withColumn("_qty_part", F.sum("_qty_sp").over(w)).where(
        F.col("_qty_sp").cast("double") > F.col("_qty_part").cast("double") * F.lit(0.3)
    )
    n7_supp = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == F.col("n_nationkey")
    )
    return (
        n7_supp.join(
            qualifying, n7_supp.s_suppkey == qualifying.l_suppkey, "left_semi"
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style: per market segment (phone-prefix analogue,
    FIXTURES.md), the count and total balance of customers whose
    balance beats the global positive-balance average and who placed
    no order in the last ~14 months of the snapshot.

    Scalar subquery → 1-row broadcast cross join; NOT EXISTS → left
    anti join against orders pre-filtered to the recency window
    (filter BEFORE the anti join: at 100 TB the anti-join build side
    is months, not years, of orders). The average is exact-decimal
    sum / count, cast to double identically in both engines.
    """
    customer = load_table(spark, sf_dir, "customer")
    recent_orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2000-06-01"))
        .select("o_custkey")
    )
    avg_bal = (
        customer.where(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("_avg_bal")
        )
    )
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(recent_orders, customer.c_custkey == recent_orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _dec_sum(F.col("c_acctbal"), "totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


def product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style: per (supplier-nation, order-year) profit on
    'widget' parts. No partsupp.supplycost in the snapshot, so cost
    is derived from the part dim: 50% of `p_retailprice` per unit
    (FIXTURES.md) — profit = l_extendedprice·(1−l_discount) −
    0.5·p_retailprice·l_quantity.

    Plan shape: part filtered on the name predicate THEN broadcast
    (the filter makes it small even when |part| isn't); nation is a
    constant-25-row broadcast; the only real shuffle is the final
    (nation, year) aggregate of per-row decimal profits. The cost
    term is computed entirely in DECIMAL arithmetic (each factor cast
    to decimal FIRST, including the 0.5 literal) — multiplying
    doubles and casting the product risks half-boundary rounding
    divergence between engines; decimal×decimal is exact, so the sum
    is order-independent and cross-engine exact.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").contains("widget"))
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    profit = (
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
        - F.col("p_retailprice").cast("decimal(18,2)")
        * F.col("l_quantity").cast("decimal(18,2)")
        * F.lit("0.5").cast("decimal(2,1)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(
            F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy("nation", "o_year")
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy(F.col("nation").asc(), F.col("o_year").desc())
    )


def peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line peak concurrency: per day, the maximum number of
    simultaneously-active users, where a user's activity interval for
    a day is [first event, last event + 1 s) in epoch seconds
    (half-open, so single-event users still count for one second).

    The classic interval-overlap algorithm as DataFrame ops: each
    interval emits a +1 point at its start and a −1 at its (exclusive)
    end; a running sum over the points in (time, delta, user) order is
    the concurrency curve, and the day's answer is its max. Ordering
    is TOTAL (user id breaks time+delta ties), so the running values —
    not just the max — are deterministic in both engines.

    Scale: the sweep partitions by day, so the cumsum window is
    day-parallel with bounded state (never the one-task global window);
    points are 2 rows per (user, day) — already aggregated far below
    event volume before the only shuffle.
    """
    events = load_table(spark, sf_dir, "events")
    iv = (
        events.select(
            F.col("ts").cast("date").cast("string").alias("day"),
            "user_id",
            F.col("ts").cast("long").alias("ts_s"),
        )
        .groupBy("day", "user_id")
        .agg(
            F.min("ts_s").alias("start_s"),
            (F.max("ts_s") + F.lit(1)).alias("end_s"),
        )
    )
    points = iv.select(
        "day", F.col("start_s").alias("t"), F.lit(1).alias("delta"), "user_id"
    ).unionAll(
        iv.select(
            "day", F.col("end_s").alias("t"), F.lit(-1).alias("delta"), "user_id"
        )
    )
    w = (
        Window.partitionBy("day")
        .orderBy(F.col("t").asc(), F.col("delta").asc(), F.col("user_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    curve = points.withColumn("_conc", F.sum("delta").over(w))
    return (
        curve.groupBy("day")
        .agg(
            F.max("_conc").cast("long").alias("peak_concurrent"),
            (F.count(F.lit(1)) / 2).cast("long").alias("n_intervals"),
        )
        .orderBy("day")
    )


def copurchased_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair support: the 50 part pairs most often
    ordered together (the candidate-pair step of apriori / frequent
    itemset mining).

    The pair generation is a self equi-join of the DISTINCT
    (order, part) relation on the order key with `p1 < p2` — both
    sides are the same projection, so Spark shuffles it ONCE and the
    plan reuses the exchange. Per-order blowup is quadratic only in
    the per-order line count (bounded ~7 in TPC-H-shaped data, and
    bounded by basket size in general), never in |lineitem|. Counts
    are exact ints; the top-50 cut is totally ordered by
    (support desc, p1, p2).
    """
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p1"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p2"))
    return (
        a.join(b, "ok")
        .where(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("support"))
        .orderBy(F.col("support").desc(), F.col("p1").asc(), F.col("p2").asc())
        .limit(50)
    )


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over the event stream:
    for each (current, next) event-type pair, the transition count
    and probability P(next | current) — the session-flow model behind
    funnel analysis.

    `lead` over the per-user (ts, event_id) order builds consecutive
    pairs map-side after ONE shuffle by user (event_id makes the
    order total, so pairing is deterministic); the per-current
    normalizer is a window over the 5×5 count matrix, not a second
    scan. Probability = exact-int count / exact-int total, one
    division, bit-identical cross-engine — no rounding grid needed.
    """
    events = load_table(spark, sf_dir, "events")
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            "user_id",
            "ts",
            "event_id",
            F.col("event_type").alias("cur_event"),
            F.lead("event_type").over(by_user).alias("next_event"),
        )
        .where(F.col("next_event").isNotNull())
        .groupBy("cur_event", "next_event")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    w_cur = Window.partitionBy("cur_event")
    return (
        pairs.withColumn(
            "prob",
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(w_cur).cast("double"),
        )
        .orderBy("cur_event", "next_event")
    )


def events_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: per event_type, the chi-square
    statistic comparing the `value` histogram (width-50 bins) of the
    first half of the time range against the second half — the
    scheduled data-quality check that catches upstream shifts before
    they poison downstream consumers.

    Expected counts involve divisions, so the per-cell terms
    (o−e)²/e are doubles; summing doubles is partition-order
    dependent, so each term is quantized to the 1e-6 grid as an
    exact int64 and the per-type chi² is the exact integer sum of
    those micro-terms (same trick as embedding_dim_stats). Every
    intermediate (cell counts, row/column margins, N) is an exact
    int computed once via windows over the tiny cell table — no
    second scan of events. Terms are summed over OBSERVED cells
    (o > 0); a bin present in one half only still contributes
    through its nonzero cell, which is the right sensitivity for a
    monitor (an empty observed cell with positive expectation would
    add e ≤ a few counts of statistic, not change the alarm).
    NULL ts filtered explicitly on both engines (the CvM precedent,
    ADVICE r7): as a groupBy key, Spark's NULL half would form its
    own cell while the oracle's CASE ELSE lands it in half 0.
    """
    events = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    half = (F.col("ts") >= F.lit("2024-01-16")).cast("int")
    cells = (
        events.groupBy(
            "event_type",
            F.floor(F.col("value") / 50).cast("long").alias("bin"),
            half.alias("half"),
        )
        .agg(F.count(F.lit(1)).alias("o"))
    )
    w_type = Window.partitionBy("event_type")
    w_row = Window.partitionBy("event_type", "bin")
    w_col = Window.partitionBy("event_type", "half")
    with_margins = (
        cells.withColumn("n_tot", F.sum("o").over(w_type))
        .withColumn("rt", F.sum("o").over(w_row))
        .withColumn("ct", F.sum("o").over(w_col))
    )
    diff = F.col("o") * F.col("n_tot") - F.col("rt") * F.col("ct")
    term = (
        F.col("n_tot").cast("double")
        * diff.cast("double")
        * diff.cast("double")
        / (
            F.col("n_tot").cast("double")
            * F.col("n_tot").cast("double")
            * F.col("rt").cast("double")
            * F.col("ct").cast("double")
        )
    )
    return (
        with_margins.select(
            "event_type",
            F.floor(term * 1e6 + F.lit(0.5)).cast("long").alias("_tm"),
        )
        .groupBy("event_type")
        .agg((F.sum("_tm").cast("double") / F.lit(1e6)).alias("chi2"))
        .orderBy("event_type")
    )


def events_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series downsampling to daily OHLC bars per event_type:
    open / high / low / close of `value` plus the tick count — the
    standard resolution-reduction operator for metric and market
    streams.

    Open and close are the first/last tick under the TOTAL
    (ts, event_id) order (event_id breaks same-second ties, so the
    bars are run- and engine-deterministic). They are picked with two
    row_number windows over the same (type, day) partition — one
    shuffle total, since both windows and the final aggregate share
    the partition key; high/low/count ride the same aggregate. The
    conditional-max trick (max(value where rn=1)) turns the picked
    rows into plain aggregate outputs without a self-join.
    """
    events = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    day = F.col("ts").cast("date").cast("string").alias("day")
    base = events.select(
        "event_type", day, "ts", "event_id", "value"
    )
    w_asc = Window.partitionBy("event_type", "day").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    w_desc = Window.partitionBy("event_type", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = base.withColumn("_ra", F.row_number().over(w_asc)).withColumn(
        "_rd", F.row_number().over(w_desc)
    )
    return (
        ranked.groupBy("event_type", "day")
        .agg(
            F.max(F.when(F.col("_ra") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("_rd") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        .orderBy("event_type", "day")
    )


def events_twap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of `value` per (event_type, day) — TWAP,
    the irregular-sampling-correct mean for metric/market streams
    (each observation weighted by how long it was the current value,
    i.e. until the next tick of the same type that day; the day's
    last tick carries zero holding time).

    Holding times come from `lead(ts)` over the total
    (ts, event_id) per-(type, day) order — one shuffle shared by the
    window and the final aggregate. Each value·seconds term is exact:
    value has ≤2 decimals and dt is integer seconds, so
    centi-value·seconds accumulate as exact int64 (the micro-unit
    pattern). The final TWAP ratio goes through the repo's mandatory
    `det_round(_, 6)` output grid — round 2's driver run proved the
    "one division of exact ints is bit-identical" claim false in the
    driver environment (CORRECTNESS_r02 hash-fail), so no emitted
    double skips the grid.
    """
    events = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    base = events.select(
        "event_type",
        F.col("ts").cast("date").cast("string").alias("day"),
        F.col("ts").cast("long").alias("ts_s"),
        "event_id",
        "value",
    )
    w = Window.partitionBy("event_type", "day").orderBy(
        F.col("ts_s").asc(), F.col("event_id").asc()
    )
    with_dt = base.withColumn(
        "_dt", F.coalesce(F.lead("ts_s").over(w) - F.col("ts_s"), F.lit(0))
    )
    centi_v = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    return (
        with_dt.groupBy("event_type", "day")
        .agg(
            F.sum(centi_v * F.col("_dt")).alias("_cvs"),
            F.sum("_dt").alias("held_seconds"),
        )
        .where(F.col("held_seconds") > 0)
        .select(
            "event_type",
            "day",
            "held_seconds",
            det_round(
                F.col("_cvs").cast("double")
                / F.col("held_seconds").cast("double")
                / F.lit(100.0),
                6,
            ).alias("twap"),
        )
        .orderBy("event_type", "day")
    )


def brand_revenue_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per part for one brand, with the lineitem scan pruned
    by a Bloom filter of the qualifying part keys (operators/bloom.py)
    before the exact semi-join.

    The 100 TB shape this demonstrates: `fact ⋉ (dim WHERE pred)`
    where the filtered key set is too big to broadcast as a hash
    table but its Bloom bitmap (128 KB at any key count) is not — the
    fact side is filtered map-side to ~selectivity before anything
    shuffles. Result is EXACT (the trailing semi-join removes bloom
    false positives), so the oracle is the plain IN-subquery.
    """
    from stream_processing_system_spark.operators.bloom import bloom_prune_join

    li = load_table(spark, sf_dir, "lineitem")
    part_keys = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#12")
        .select(F.col("p_partkey").alias("l_partkey"))
    )
    pruned = bloom_prune_join(li, part_keys, "l_partkey")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        pruned.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("nitems"),
            _dec_sum(revenue, "revenue", scale=4),
        )
        .orderBy("l_partkey")
    )


def events_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted smoothing of the daily mean value per
    event type (alpha = 1/4): the "current level" estimate a
    monitoring pipeline keeps per metric.

    Determinism across engines and partition orders: the daily mean
    is computed from a centi-unit integer sum (exact, order-free),
    and the EWMA is a LEFT FOLD over the day-sorted value array —
    `aggregate(slice(vals, 2, n-1), vals[1], (acc, x) ->
    (3*acc + x) / 4)` — so both engines execute the identical
    IEEE-754 operation sequence (DuckDB: `list_reduce`). No pow():
    pow is not correctly-rounded and differs across libm builds.

    Scale: one hash aggregate to daily resolution (tiny domain:
    types x days), then one per-type fold over at most a few
    thousand doubles — the collect_list holds days, not events.
    """
    events = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    day = F.col("ts").cast("date").cast("string").alias("day")
    centi = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    daily = (
        events.select("event_type", day, centi.alias("_cv"))
        .groupBy("event_type", "day")
        .agg(F.sum("_cv").alias("_cs"), F.count(F.lit(1)).alias("_n"))
        .select(
            "event_type",
            "day",
            (
                F.col("_cs").cast("double")
                / F.lit(100.0)
                / F.col("_n").cast("double")
            ).alias("val"),
        )
    )
    series = daily.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "val"))),
            lambda p: p["val"],
        ).alias("_vs"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.max("day").alias("last_day"),
    )
    fold = F.aggregate(
        F.slice(F.col("_vs"), 2, F.greatest(F.size("_vs") - 1, F.lit(0))),
        F.element_at(F.col("_vs"), 1),
        lambda acc, x: (F.lit(3.0) * acc + x) / F.lit(4.0),
    )
    return series.select(
        "event_type",
        "n_days",
        "last_day",
        det_round(fold).alias("ewma"),
    ).orderBy("event_type")


def events_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day rolling MEDIAN of the daily mean value per
    event type — the robust-statistics smoother (medians shrug off
    the spike days that drag an EWMA or moving average).

    Spark has no percentile-over-window, so the median is computed
    from a sort_array'd collect_list over a ROWS BETWEEN 6 PRECEDING
    frame — bounded at 7 doubles per row, and the rows are DAYS per
    type (the raw events already collapsed in a map-side-combined
    centi-unit aggregate), so the window state is trivially small at
    any corpus scale. Odd/even interpolation matches DuckDB's
    list-based twin operation-for-operation (the oracle avoids
    quantile_cont-over-window, computing the same sorted-list pick,
    so both engines run identical IEEE arithmetic).
    """
    events = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    day = F.col("ts").cast("date").cast("string").alias("day")
    centi = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    daily = (
        events.select("event_type", day, centi.alias("_cv"))
        .groupBy("event_type", "day")
        .agg(F.sum("_cv").alias("_cs"), F.count(F.lit(1)).alias("_n"))
        .select(
            "event_type",
            "day",
            (
                F.col("_cs").cast("double")
                / F.lit(100.0)
                / F.col("_n").cast("double")
            ).alias("val"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    vals = F.sort_array(F.collect_list("val").over(w))
    n = F.size(vals)
    med = F.when(
        n % 2 == 1,
        F.element_at(vals, ((n + 1) / 2).cast("int")),
    ).otherwise(
        (
            F.element_at(vals, (n / 2).cast("int"))
            + F.element_at(vals, (n / 2 + 1).cast("int"))
        )
        / 2.0
    )
    return daily.select(
        "event_type",
        "day",
        n.cast("long").alias("n_in_window"),
        det_round(med).alias("med7"),
    ).orderBy("event_type", "day")


def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: quartile-code every customer by Recency
    (days since last order), Frequency (order count), Monetary
    (lifetime spend), then report segment sizes — the classic
    customer-base summary built from three NTILE(4) windows.

    Determinism: every NTILE orders with o_custkey as the final
    tie-break, so quartile assignment is a total-order function of
    the data; monetary sums are DECIMAL. Scale: the aggregate to
    per-customer grain is the big shuffle (map-side combined);
    the three NTILEs here are exact global windows — right for the
    oracle contract, but a global window is one task. The 100 TB
    drop-in keeps the same output contract with
    `percentile_approx(dim, [.25,.5,.75])` thresholds broadcast
    back and a map-side CASE bucketing — same 64-row report,
    no global sort (the approx_value_percentiles pattern).
    """
    orders = load_table(spark, sf_dir, "orders")
    anchor = orders.agg(F.max("o_orderdate").alias("_anchor"))
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("_last"),
            F.count(F.lit(1)).alias("_freq"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("_spend"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff(F.col("_anchor"), F.col("_last")).cast("long").alias("_rec"),
            "_freq",
            "_spend",
        )
    )
    r_w = Window.orderBy(F.col("_rec").asc(), F.col("o_custkey").asc())
    f_w = Window.orderBy(F.col("_freq").desc(), F.col("o_custkey").asc())
    m_w = Window.orderBy(F.col("_spend").desc(), F.col("o_custkey").asc())
    coded = per_cust.select(
        "o_custkey",
        F.ntile(4).over(r_w).alias("_r"),
        F.ntile(4).over(f_w).alias("_f"),
        F.ntile(4).over(m_w).alias("_m"),
        "_spend",
    )
    return (
        coded.groupBy(
            F.concat(F.col("_r"), F.col("_f"), F.col("_m")).alias("segment")
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("_spend").cast("double").alias("segment_spend"),
        )
        .orderBy("segment")
    )


def brand_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration per brand: how many parts cover 80% of
    the brand's revenue. All comparisons in exact integer centi-units
    (the 80% test is `cum*5 >= total*4` — no floating threshold), so
    the answer is bit-stable at any parallelism.

    Scale: revenue collapses to per-part grain in one
    map-side-combined aggregate; the cumulative window partitions by
    brand (25 groups) over part grain — at 100 TB that window input
    is parts, not lineitems.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    ).cast("long")
    per_part = (
        li.join(F.broadcast(part.select("p_partkey", "p_brand")),
                li.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand", "p_partkey")
        .agg(F.sum(cents).alias("_rev"))
    )
    w_cum = Window.partitionBy("p_brand").orderBy(
        F.col("_rev").desc(), F.col("p_partkey").asc()
    )
    w_tot = Window.partitionBy("p_brand")
    flagged = per_part.select(
        "p_brand",
        (F.sum("_rev").over(w_cum) * 5 >= F.sum("_rev").over(w_tot) * 4).alias(
            "_covered"
        ),
    )
    return (
        flagged.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            (F.count(F.lit(1)) - F.sum(F.col("_covered").cast("long")) + 1)
            .cast("long")
            .alias("n_parts_for_80pct"),
        )
        .orderBy("p_brand")
    )


def orders_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics on plain parquet: apply a CDC batch
    (deletes / updates / inserts) to the orders table with ONE
    full-outer join keyed on o_orderkey, then report the merged
    table per status — the upsert primitive every warehouse sink
    needs and the reference entirely lacks (its store is
    whole-file put/get, `Nimbus.go:447-567`).

    The CDC batch is derived deterministically from the table itself
    so the query is self-contained: orderkey % 97 == 0 → update
    (status 'U', price +10%), % 89 == 1 → delete, plus one insert
    per nation-sized slice (orderkey + 1e9 synthetic keys).

    Scale: one equi-join shuffle on the merge key — the same cost
    profile a Delta/Iceberg MERGE pays in its join phase. AQE
    handles a skewed CDC batch; at 100 TB the win over
    rewrite-everything is file-level pruning, which the oracle-side
    formulation (anti ∪ updated ∪ inserts) makes explicit.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    upd = (
        orders.where(F.col("o_orderkey") % 97 == 0)
        .select(
            "o_orderkey",
            F.lit("U").alias("_op"),
            F.lit("U").alias("_new_status"),
            (
                F.floor(F.col("o_totalprice") * 110 + F.lit(0.5)) / F.lit(100.0)
            ).alias("_new_price"),
        )
    )
    # CDC batches carry at most ONE row per key (MERGE's contract);
    # exclude update keys from the delete predicate so the CRT
    # overlap (k ≡ 0 mod 97 ∧ k ≡ 1 mod 89) can't mint duplicates.
    dele = orders.where(
        (F.col("o_orderkey") % 89 == 1) & (F.col("o_orderkey") % 97 != 0)
    ).select(
        "o_orderkey",
        F.lit("D").alias("_op"),
        F.lit(None).cast("string").alias("_new_status"),
        F.lit(None).cast("double").alias("_new_price"),
    )
    ins = orders.where(F.col("o_orderkey") % 101 == 2).select(
        (F.col("o_orderkey") + F.lit(1_000_000_000)).alias("o_orderkey"),
        F.lit("I").alias("_op"),
        F.lit("N").alias("_new_status"),
        F.col("o_totalprice").alias("_new_price"),
    )
    cdc = upd.unionByName(dele).unionByName(ins)
    merged = (
        orders.join(cdc, "o_orderkey", "full_outer")
        .where(F.col("_op").isNull() | (F.col("_op") != "D"))
        .select(
            "o_orderkey",
            F.coalesce(F.col("_new_status"), F.col("o_orderstatus")).alias(
                "status"
            ),
            F.coalesce(F.col("_new_price"), F.col("o_totalprice")).alias(
                "price"
            ),
        )
    )
    return (
        merged.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dec_sum(F.col("price"), "total_price", scale=2),
        )
        .orderBy("status")
    )


def distinct_users_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch ALGEBRA: per-event-type DataSketches HLL sketches
    (`hll_sketch_agg`) built in ONE scan, then re-aggregated with
    `hll_union_agg` into a global distinct-users estimate — the
    rollup comes from merging the sketches, not re-reading the data.
    This is the property that makes sketches the 100 TB
    distinct-count path: per-slice sketches persist as tiny binaries
    and any slice union (per day → per month → whole corpus) is a
    constant-time merge, with no second pass over the raw data.

    Round-3 upgrade from rows-only: the sketch estimates stay out of
    the hash (DataSketches internals are engine-specific), but the
    exact distinct counts and the accuracy booleans — estimate within
    3·rsd(lgK=14) ≈ 2.5% of exact, for every per-type sketch AND for
    the merged rollup — are value-hashed against the SQL oracle. The
    merge path is therefore checked end to end: a union bug would
    push the __all__ estimate outside the bound. (The fully
    register-exact variant is hll_register_distinct_users.)"""
    events = load_table(spark, sf_dir, "events")
    bound = 3 * 1.04 / (2**14) ** 0.5  # 3 sigma at lgK=14
    per_type = events.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", 14).alias("_sk"),
        F.count_distinct("user_id").alias("n_users"),
    )
    typed = per_type.select(
        "event_type",
        "n_users",
        F.hll_sketch_estimate("_sk").alias("_est"),
    )
    overall_exact = events.agg(
        F.count_distinct("user_id").alias("n_users")
    )
    overall = (
        per_type.agg(F.hll_union_agg("_sk").alias("_u"))
        .crossJoin(F.broadcast(overall_exact))
        .select(
            F.lit("__all__").alias("event_type"),
            "n_users",
            F.hll_sketch_estimate("_u").alias("_est"),
        )
    )
    return (
        typed.unionByName(overall)
        .select(
            "event_type",
            "n_users",
            (
                F.abs(F.col("_est") - F.col("n_users")).cast("double")
                <= F.lit(bound) * F.col("n_users").cast("double")
            ).alias("within_3rsd"),
        )
        .orderBy("event_type")
    )


def copurchase_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded 3-hop BFS reach from the smallest user in the
    co-purchase graph (`operators/graph.bfs_hops`) — the
    friends-of-friends traversal, fixed-depth so both engines run an
    identical unrolled frontier expansion."""
    from stream_processing_system_spark.operators.graph import (
        bfs_hops,
        cooccurrence_edges,
    )

    events = load_table(spark, sf_dir, "events")
    return (
        bfs_hops(cooccurrence_edges(events), max_hops=3)
        .select(F.col("node").alias("user_id"), "hops")
        .orderBy("user_id")
    )


def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint per event type: the day where the cumulative
    deviation of daily volume from the type's average peaks — the
    classic drift-localization complement to `events_drift_chi2`
    (which detects THAT the distribution moved; this says WHEN).

    Integer-exact: with s_i the day-i centi-unit value sum and
    S = Σs_i over n days, the statistic C_k = Σ_{i≤k} (n·s_i − S)
    is pure BIGINT arithmetic (the ÷n that would make it fractional
    is factored out — argmax is invariant under positive scaling).
    One daily rollup, one per-type cumulative window over days, one
    argmax aggregate; ties break to the earliest day.
    """
    events = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    day = F.col("ts").cast("date").cast("string").alias("day")
    centi = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    daily = (
        events.select("event_type", day, centi.alias("_cv"))
        .groupBy("event_type", "day")
        .agg(F.sum("_cv").alias("_s"))
    )
    w_type = Window.partitionBy("event_type")
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    enriched = daily.select(
        "event_type",
        "day",
        "_s",
        F.count(F.lit(1)).over(w_type).alias("_n"),
        F.sum("_s").over(w_type).alias("_tot"),
    )
    with_stat = enriched.select(
        "event_type",
        "day",
        (
            F.col("_n") * F.sum("_s").over(w_cum)
            - F.count(F.lit(1)).over(w_cum) * F.col("_tot")
        ).alias("cusum"),
    )
    rank_w = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum")).desc(), F.col("day").asc()
    )
    return (
        with_stat.withColumn("_rk", F.row_number().over(rank_w))
        .where(F.col("_rk") == 1)
        .select("event_type", F.col("day").alias("peak_day"), "cusum")
        .orderBy("event_type")
    )


def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction via the VARIANT type (Spark 4
    `parse_json` + `variant_get`): props parses ONCE into a binary
    variant and every field access is a typed path lookup — the
    modern replacement for per-field `get_json_object` re-parsing
    (which `json_props_stats` keeps for comparison; at 100 TB with
    many extracted fields, parse-once is the difference between one
    and N string parses per row).

    Output is deliberately different from json_props_stats: distinct
    k cardinality and parity split per event type.
    """
    events = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "int")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count_distinct("k").cast("long").alias("n_distinct_k"),
            F.sum((F.col("k") % 2 == 0).cast("long")).alias("n_even_k"),
            F.sum((F.col("k") % 2 == 1).cast("long")).alias("n_odd_k"),
        )
        .orderBy("event_type")
    )


#: Query pattern for events_pattern_search: a "spike" shape, already
#: z-normalized (mean 0, unit variance) and rounded to 6 decimals so
#: BOTH engines consume identical literals.
_PATTERN = [-0.5, -0.5, -0.5, 2.236068, -0.5, -0.236068]


def events_pattern_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series subsequence similarity search (the streaming-DB
    pattern-matching primitive — EDBT'19's problem, Matrix-Profile
    style, at daily-series scale here): z-normalize every sliding
    window of the per-type daily mean series and rank windows by
    Euclidean distance to a constant z-normed query pattern (a
    spike). Top-10 nearest windows across all types.

    Determinism: window statistics and distances are LEFT FOLDS over
    the day-ordered arrays (identical IEEE sequence in DuckDB's
    list_reduce — the EWMA device); sqrt is correctly rounded; the
    pattern ships as pre-rounded literals shared by both engines;
    zero-variance windows are excluded by an exact predicate.

    Scale: the series collapse to types × days rows before any
    window math; each sliding window is an array slice of length 6 —
    at 100 TB the expensive part (raw events → daily grain) is one
    map-side-combined aggregate, and the subsequence scan is
    per-type-sized, embarrassingly parallel over types.
    """
    m = len(_PATTERN)
    events = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    day = F.col("ts").cast("date").cast("string").alias("day")
    centi = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    daily = (
        events.select("event_type", day, centi.alias("_cv"))
        .groupBy("event_type", "day")
        .agg(F.sum("_cv").alias("_cs"), F.count(F.lit(1)).alias("_n"))
        .select(
            "event_type",
            "day",
            (
                F.col("_cs").cast("double")
                / F.lit(100.0)
                / F.col("_n").cast("double")
            ).alias("val"),
        )
    )
    series = daily.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "val"))), lambda p: p["val"]
        ).alias("_vs"),
        F.sort_array(F.collect_list("day")).alias("_days"),
    )
    # guard the descending-sequence pitfall (ngram_set's note): for a
    # series shorter than the pattern, sequence(1, n-m+1<=0) would run
    # BACKWARDS through indices 1,0,... — emit no windows instead
    windows = F.when(
        F.size("_vs") >= m,
        F.transform(
            F.sequence(F.lit(1), F.size("_vs") - (m - 1)),
            lambda i: F.struct(
                F.element_at(F.col("_days"), i).alias("start_day"),
                F.slice(F.col("_vs"), i, m).alias("w"),
            ),
        ),
    ).otherwise(F.array().cast(f"array<struct<start_day:string,w:array<double>>>"))
    win = series.select(
        "event_type",
        F.explode(windows).alias("_win"),
    ).select("event_type", F.col("_win.start_day").alias("start_day"), F.col("_win.w").alias("w"))

    def fold_sum(arr):
        return F.aggregate(
            F.slice(arr, 2, m - 1), F.element_at(arr, 1), lambda a, x: a + x
        )

    mean = (fold_sum(F.col("w")) / F.lit(float(m))).alias("_mu")
    sq = F.transform(F.col("w"), lambda x: x * x)
    with_mu = win.select("event_type", "start_day", "w", mean, fold_sum(sq).alias("_sq"))
    var = F.col("_sq") / F.lit(float(m)) - F.col("_mu") * F.col("_mu")
    with_sd = with_mu.withColumn("_sd", F.sqrt(var)).where(F.col("_sd") > 1e-9)
    z = F.transform(F.col("w"), lambda x: (x - F.col("_mu")) / F.col("_sd"))
    q = F.array(*[F.lit(v) for v in _PATTERN])
    diff2 = F.zip_with(z, q, lambda a, b: (a - b) * (a - b))
    dist2 = fold_sum(diff2)
    return (
        with_sd.select(
            "event_type",
            "start_day",
            det_round(dist2).alias("dist2"),
        )
        .orderBy(F.col("dist2").asc(), F.col("event_type").asc(), F.col("start_day").asc())
        .limit(10)
    )


def kmv_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user overlap between event types via KMV sketch
    algebra (operators/sketch_kmv.py): per-type k-minimum-values
    sketches over user_id, then pairwise union / intersection /
    Jaccard ESTIMATES computed purely from the sketches — the raw
    events table is scanned exactly once, and every downstream frame
    is k rows per type.

    This is the capability HLL rollups can't give (HLL only unions;
    see distinct_users_sketch_rollup): "how many users do 'click' and
    'purchase' share" at sketch cost. At 100 TB the sketch build is
    the only data-sized stage; the algebra is broadcast-sized.

    Determinism: hashes are md5-derived 60-bit ints (byte-identical
    in DuckDB), ranking is integer, and the two divisions per
    estimate run in a fixed operand order — hash-matched against the
    same construction in SQL.
    """
    from stream_processing_system_spark.operators import sketch_kmv

    events = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    sk = sketch_kmv.kmv_sketch(events, "event_type", "user_id", k=256)
    pairs = sketch_kmv.kmv_pair_overlap(sk, "event_type", k=256)
    return pairs.select(
        F.col("ga").alias("type_a"),
        F.col("gb").alias("type_b"),
        "est_union",
        "est_intersection",
        "jaccard_est",
    ).orderBy("type_a", "type_b")


def user_geo_neighbor_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial self-join: pairs of users whose (synthetic,
    deterministic) geolocations lie within 5 degrees of each other —
    grid-blocked 3x3 equi-join, never O(n^2)
    (operators/geospatial.py). The SQL oracle is the BRUTE-FORCE
    all-pairs join, so a green hash-match proves the blocking is
    lossless, not merely self-consistent."""
    from stream_processing_system_spark.operators import geospatial

    ids = load_table(spark, sf_dir, "events").select("user_id").distinct()
    pts = geospatial.derive_points(ids, "user_id")
    return geospatial.neighbor_pairs(pts, "user_id", radius_deg=5.0).select(
        F.col("id_a").alias("user_a"),
        F.col("id_b").alias("user_b"),
        "dist_deg",
    )


def incremental_revenue_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance (operators/ivm.py): the monthly
    order-revenue rollup is maintained as base-aggregate (orders
    before 1999-01-01) MERGED with a delta-aggregate (orders on/after
    the cutoff) — never a full-history rescan. The SQL oracle is the
    from-scratch GROUP BY over all orders, so the hash-match proves
    the merge identity sum(base)+sum(delta) == sum(all) holds
    exactly (DECIMAL sums; a double sum would break it by addition
    order).

    At 100 TB the base side is a materialized aggregate read (group
    cardinality, e.g. months x whatever), and only the delta's facts
    are scanned per refresh.
    """
    from stream_processing_system_spark.operators import ivm

    orders = load_table(spark, sf_dir, "orders")
    month = F.date_format("o_orderdate", "yyyy-MM").alias("month")

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy(month).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("revenue"),
        )

    cutoff = F.col("o_orderdate") >= F.lit("1999-01-01")
    base = rollup(orders.where(~cutoff))
    delta = rollup(orders.where(cutoff))
    maintained = ivm.merge_additive(
        base, delta, keys=["month"], measures=["n_orders", "revenue"]
    )
    return maintained.select(
        "month",
        "n_orders",
        F.col("revenue").cast("double").alias("revenue"),
    ).orderBy("month")


def event_sequence_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-lite (operators/seqmatch.py): per-user ordered
    event history encoded as a one-char-per-event string, then
    regex-counted motifs — browse-to-buy funnels (a view, any
    clicks, then a purchase) and error bursts (2+ consecutive
    errors). Total order (ts, event_id) makes the encoding
    deterministic on timestamp ties; DuckDB's RE2 and Java's regex
    agree on leftmost non-overlapping greedy matching for this
    pattern class, which the hash-match proves."""
    from stream_processing_system_spark.operators import seqmatch

    events = load_table(spark, sf_dir, "events")
    sym = F.substring(F.col("event_type"), 1, 1)  # c/e/p/s/v — distinct initials
    seqs = seqmatch.encode_sequences(
        events, "user_id", ["ts", "event_id"], sym
    )
    counted = seqmatch.match_counts(
        seqs, {"browse_buy": "vc*p", "error_burst": "ee+"}
    )
    return (
        counted.select(
            "user_id",
            F.length("seq").alias("n_events"),
            F.col("browse_buy").cast("long").alias("browse_buy"),
            F.col("error_burst").cast("long").alias("error_burst"),
        )
        .where((F.col("browse_buy") > 0) | (F.col("error_burst") > 0))
        .orderBy("user_id")
    )


def value_trend_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-wise ordinary-least-squares trend: slope + intercept of
    the DAILY TOTAL value against the day ordinal, per event type —
    the closed-form regression a monitoring pipeline fits per metric.

    Exactness strategy: the five OLS sums (n, Σx, Σy, Σxy, Σx²) are
    computed as exact int64 (y in centi-units, x = day offset), so
    the two slope operands are exact integers and the only floating
    ops are two divisions and one multiply in a fixed order —
    bit-identical cross-engine, no rounding grid needed until the
    final det_round. (At 100 TB-years the Σxy product chain should
    be lifted to DECIMAL(38,0); same shape.)

    Shape: one partial+final aggregate to daily grain, one tiny
    aggregate to per-type sums — no window, no collect_list; the
    second aggregate's input is (types × days) rows."""
    events = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    day = F.col("ts").cast("date")
    daily = (
        events.select(
            "event_type",
            F.datediff(day, F.lit("2024-01-01")).cast("long").alias("x"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cy"),
        )
        .groupBy("event_type", "x")
        .agg(F.sum("cy").alias("y"))
    )
    sums = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = (num / den) / F.lit(100.0)
    intercept = (
        F.col("sy").cast("double") / F.lit(100.0)
        - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    return (
        sums.where(F.col("n") > 1)
        .select(
            "event_type",
            F.col("n").alias("n_days"),
            det_round(slope).alias("slope"),
            det_round(intercept).alias("intercept"),
        )
        .orderBy("event_type")
    )


def events_downsample_ltob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual downsampling (operators/timeseries.py): each event
    type's daily-mean series reduced to ~12 shape-preserving points
    by the largest-triangle-one-bucket rule. Daily means come from
    exact centi-unit integer sums (the EWMA device), areas are fixed
    operand-order doubles, bucketing is exact integer math — the
    selected subset hash-matches the identical SQL construction."""
    from stream_processing_system_spark.operators import timeseries

    events = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    daily = (
        events.select(
            "event_type",
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01"))
            .cast("long")
            .alias("x"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cy"),
        )
        .groupBy("event_type", "x")
        .agg(
            (
                F.sum("cy").cast("double")
                / F.lit(100.0)
                / F.count(F.lit(1)).cast("double")
            ).alias("y")
        )
    )
    out = timeseries.downsample_ltob(daily, "event_type", "x", "y", target=12)
    return out.select(
        "event_type",
        F.col("x").alias("day"),
        det_round(F.col("y")).alias("mean_value"),
    ).orderBy("event_type", "day")


def purchase_next_click_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (operators/temporal.asof_join_forward): for
    each purchase, the next click by the same user within 2 hours —
    post-purchase engagement attribution. Oracle: DuckDB's native
    forward ASOF JOIN plus the tolerance filter."""
    from stream_processing_system_spark.operators.temporal import (
        asof_join_forward,
    )

    events = load_table(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.where(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join_forward(
        purchases, clicks, key="user_id", tolerance_seconds=7200
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("ts").cast("long").alias("ts_s"),
        F.col("r_ts").cast("long").alias("click_ts_s"),
    ).orderBy("event_id")


def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection: daily mean value per event type
    scored by MEDIAN/MAD (robust z = (v - median) / (1.4826 * MAD))
    instead of mean/stddev — the estimator that doesn't let the
    outliers it is hunting inflate its own scale (cf.
    events_anomaly_zscore, the classical twin). Days with |rz| > 2
    are flagged.

    Exactness: daily means from exact centi-unit sums; medians are
    exact rank statistics over identical double sets in both engines
    (even-count interpolation (a+b)/2 is a single exact IEEE op);
    the score is a fixed-order expression. Shape: one data-sized
    aggregate to daily grain, then two broadcast-sized median
    aggregates over (types x days) rows — no window over raw events.
    """
    events = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    daily = (
        events.select(
            "event_type",
            F.col("ts").cast("date").cast("string").alias("day"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cy"),
        )
        .groupBy("event_type", "day")
        .agg(
            (
                F.sum("cy").cast("double")
                / F.lit(100.0)
                / F.count(F.lit(1)).cast("double")
            ).alias("v")
        )
    )
    med = daily.groupBy("event_type").agg(F.median("v").alias("_med"))
    dev = daily.join(F.broadcast(med), "event_type").select(
        "event_type", "day", "v", "_med", F.abs(F.col("v") - F.col("_med")).alias("_ad")
    )
    mad = dev.groupBy("event_type").agg(F.median("_ad").alias("_mad"))
    rz = (F.col("v") - F.col("_med")) / (F.lit(1.4826) * F.col("_mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .where(F.col("_mad") > 0)
        .select(
            "event_type",
            "day",
            det_round(F.col("v")).alias("mean_value"),
            det_round(rz).alias("robust_z"),
        )
        .where(F.abs(F.col("robust_z")) > 2.0)
        .orderBy("event_type", "day")
    )


def session_incident_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-OVERLAP join (operators/temporal.interval_overlap_join):
    user sessions (30-min-gap sessionization, half-open
    [first_event, last_event+1s)) overlapped against the corpus's 20
    worst error hours (top error-count hours as [hour, hour+1h)
    incident windows). Executed as a bucketed equi-join with the
    first-shared-bucket dedup rule — never an inequality nested-loop.
    The SQL oracle is the brute-force inequality join, so the green
    hash-match proves the bucketing lossless. Output includes the
    overlap length in seconds (exact longs)."""
    from stream_processing_system_spark.operators.temporal import (
        interval_overlap_join,
    )

    events = load_table(spark, sf_dir, "events")
    es = events.select(
        "user_id",
        "event_id",
        F.col("ts").cast("long").alias("tss"),
    )
    w = Window.partitionBy("user_id").orderBy("tss", "event_id")
    gap = (F.col("tss") - F.lag("tss").over(w)) > 1800
    sess = (
        es.withColumn("_new", F.when(gap, 1).otherwise(0))
        .withColumn(
            "session_id",
            F.sum("_new").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.min("tss").alias("ss"),
            (F.max("tss") + F.lit(1)).alias("se"),
        )
    )
    incidents = (
        events.where(F.col("event_type") == "error")
        .select((F.floor(F.col("ts").cast("long") / 3600) * 3600).alias("ih"))
        .groupBy("ih")
        .agg(F.count(F.lit(1)).alias("n_errors"))
        .orderBy(F.col("n_errors").desc(), F.col("ih").asc())
        .limit(20)
        .select("ih", (F.col("ih") + 3600).alias("ie"), "n_errors")
    )
    joined = interval_overlap_join(
        sess, incidents, "ss", "se", "ih", "ie", bucket_seconds=3600
    )
    overlap = F.least(F.col("se"), F.col("r_ie")) - F.greatest(
        F.col("ss"), F.col("r_ih")
    )
    return joined.select(
        "user_id",
        F.col("ss").alias("session_start_s"),
        F.col("se").alias("session_end_s"),
        F.col("r_ih").alias("incident_hour_s"),
        overlap.alias("overlap_s"),
    ).orderBy("user_id", "session_start_s", "incident_hour_s")


def supplier_scd2_commission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 point-in-time join (operators/temporal.scd2_join): a
    two-version synthetic supplier dimension (commission rate changes
    at an md5-derived split date per supplier) joined to lineitem AT
    ship time, rolled up to commission totals per (version,
    rate band). Exact DECIMAL money; the md5-derived dimension is
    reproduced verbatim in the SQL oracle."""
    from stream_processing_system_spark.functions.scalar import md5_prefix_long
    from stream_processing_system_spark.operators.temporal import scd2_join

    sup = load_table(spark, sf_dir, "supplier")
    h = md5_prefix_long(F.col("s_suppkey").cast("string"), salt="scd|")
    base = sup.select(
        "s_suppkey",
        h.alias("_h"),
        F.date_add(
            F.lit("1996-01-01").cast("date"), (h % 1460).cast("int")
        ).alias("_split"),
    )
    v1 = base.select(
        "s_suppkey",
        F.lit("v1").alias("version"),
        (F.col("_h") % 500 + 50).alias("rate_bps"),
        F.lit("1990-01-01").cast("date").alias("valid_from"),
        F.col("_split").alias("valid_to"),
    )
    v2 = base.select(
        "s_suppkey",
        F.lit("v2").alias("version"),
        (F.shiftright("_h", 3) % 500 + 50).alias("rate_bps"),
        F.col("_split").alias("valid_from"),
        F.lit("2005-01-01").cast("date").alias("valid_to"),
    )
    dim = v1.unionByName(v2)
    facts = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("s_suppkey"),
        F.col("l_shipdate").cast("date").alias("ship_day"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(18,4)")
        .alias("_rev"),
    )
    joined = scd2_join(
        facts, F.broadcast(dim), "s_suppkey", "ship_day"
    )
    return (
        joined.groupBy(
            "version", F.floor(F.col("rate_bps") / 100).cast("long").alias("rate_band")
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            # exact int64 sums FIRST (rev in 1e-4 units; _rev has
            # scale 4 so _rev*10000 is an exact integer), ONE
            # int64→double cast + ONE division LAST. Casting the
            # DECIMAL sum to double instead fails at sf0.1: the
            # unscaled commission sum exceeds 2^53 and DuckDB's
            # decimal→double path double-rounds (found by the exact
            # harness in round 3 — last-ulp mismatch on 2 rows).
            (
                F.sum((F.col("_rev") * 10000).cast("long"))
                .cast("double")
                / F.lit(10000.0)
            ).alias("revenue"),
            (
                F.sum((F.col("_rev") * 10000).cast("long") * F.col("rate_bps"))
                .cast("double")
                / F.lit(100000000.0)
            ).alias("commission"),
        )
        .orderBy("version", "rate_band")
    )


def orders_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectations over orders
    (operators/expectations.py): null / domain / range rules folded
    into ONE scan aggregate, key uniqueness as one aggregate, and a
    customer referential check as a left_anti join. Output is the
    gate report (rule, n_violations, pass) a load pipeline acts on."""
    from stream_processing_system_spark.operators import expectations as ex

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    rules = [
        ex.Rule("not_null:o_orderkey", F.col("o_orderkey").isNotNull()),
        ex.Rule(
            "domain:o_orderstatus",
            F.col("o_orderstatus").isin("O", "F", "P"),
        ),
        ex.Rule("range:o_totalprice_positive", F.col("o_totalprice") > 0),
        ex.Rule(
            "range:o_orderdate_window",
            (F.col("o_orderdate") >= F.lit("1990-01-01"))
            & (F.col("o_orderdate") < F.lit("2005-01-01")),
        ),
    ]
    return ex.check(
        orders,
        rules,
        unique_keys=["o_orderkey"],
        references={"o_custkey": (customer, "c_custkey")},
    )


def ab_test_purchase_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experimentation analytics: a deterministic md5 hash split of
    users into A/B cohorts, then a two-sample z-test on purchase
    value — the analysis every growth pipeline runs after an
    assignment join. One conditional aggregate over one scan; all
    moments from exact centi-unit integer sums, so mean/variance/z
    are fixed-operand-order doubles (engine-identical without a
    rounding grid until the final det_round).

    (At sf >= 1 the Σx·Σx product leaves exact-int64 range — lift
    the moment sums to DECIMAL(38,0), same shape.)"""
    from stream_processing_system_spark.functions.scalar import md5_prefix_long

    events = load_table(spark, sf_dir, "events")
    p = events.where(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select(
        (md5_prefix_long(F.col("user_id").cast("string"), salt="ab|") % 2).alias(
            "cohort"
        ),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cy"),
    )

    def side(c: int, col):
        return F.sum(F.when(F.col("cohort") == c, col).otherwise(F.lit(0)))

    agg = p.agg(
        F.sum(F.when(F.col("cohort") == 0, 1).otherwise(0)).cast("long").alias("na"),
        F.sum(F.when(F.col("cohort") == 1, 1).otherwise(0)).cast("long").alias("nb"),
        side(0, F.col("cy")).alias("sa"),
        side(1, F.col("cy")).alias("sb"),
        side(0, F.col("cy") * F.col("cy")).alias("ssa"),
        side(1, F.col("cy") * F.col("cy")).alias("ssb"),
    )
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    sa, sb = F.col("sa").cast("double"), F.col("sb").cast("double")
    ssa, ssb = F.col("ssa").cast("double"), F.col("ssb").cast("double")
    mean_a = sa / F.lit(100.0) / na
    mean_b = sb / F.lit(100.0) / nb
    var_a = (ssa - sa * sa / na) / (na - F.lit(1.0)) / F.lit(10000.0)
    var_b = (ssb - sb * sb / nb) / (nb - F.lit(1.0)) / F.lit(10000.0)
    z = (mean_a - mean_b) / F.sqrt(var_a / na + var_b / nb)
    return agg.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        det_round(mean_a).alias("mean_a"),
        det_round(mean_b).alias("mean_b"),
        det_round(z).alias("z_stat"),
        (F.abs(det_round(z)) > F.lit(1.96)).alias("significant"),
    )


def supplier_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-frontier) query: suppliers not DOMINATED on
    (avg item cost, avg ship delay) — no other supplier is cheaper
    AND faster. The classic multi-criteria shortlist operator
    (Börzsönyi et al., ICDE'01), reduced to one sort + one running
    window: order by (cost, delay, key) and keep rows whose delay is
    strictly below every earlier delay (exact ties keep the first
    key — documented choice). The window runs over SUPPLIER-grain
    rows (dimension-sized), not facts; both metrics come from exact
    integer/decimal sums."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    joined = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        li["l_orderkey"] == orders["o_orderkey"],
    )
    per_sup = joined.groupBy("l_suppkey").agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("_cost"),
        (
            F.sum(
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).cast("long")
            ).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("_delay"),
    )
    w = (
        Window.orderBy(
            F.col("_cost").asc(), F.col("_delay").asc(), F.col("l_suppkey").asc()
        ).rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_min = F.min("_delay").over(w)
    return (
        per_sup.withColumn("_pm", prev_min)
        .where(F.col("_pm").isNull() | (F.col("_delay") < F.col("_pm")))
        .select(
            F.col("l_suppkey").alias("s_suppkey"),
            det_round(F.col("_cost")).alias("avg_cost"),
            det_round(F.col("_delay")).alias("avg_delay_days"),
        )
        .orderBy("avg_cost")
    )


def revenue_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed rolling aggregate: 7-day trailing order revenue
    per day — the frame is a VALUE range over the day ordinal
    (RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), so gaps in the
    calendar shrink the window instead of silently widening it the
    way a ROWS frame would. Daily grain first (one data-sized
    aggregate), then the window runs over ~days rows. Exact DECIMAL
    day sums; the trailing sum adds exact decimals."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.select(
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01"))
            .cast("long")
            .alias("day_ord"),
            F.col("o_orderdate").cast("date").cast("string").alias("day"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("_p"),
        )
        .groupBy("day_ord", "day")
        .agg(F.sum("_p").alias("_rev"), F.count(F.lit(1)).alias("n_orders"))
    )
    w = Window.orderBy("day_ord").rangeBetween(-6, 0)
    return daily.select(
        "day",
        "n_orders",
        F.col("_rev").cast("double").alias("revenue"),
        F.sum("_rev").over(w).cast("double").alias("revenue_7d"),
        F.count(F.lit(1)).over(w).cast("long").alias("days_in_window"),
    ).orderBy("day")


def events_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit: group sizes over the quasi-identifier
    (event_type, hour-of-day, value band) — the release-readiness
    check before publishing 'anonymized' event data. Reports, per
    event_type: the minimum group size (the k the release actually
    achieves), how many QI groups fall below k=5, and how many ROWS
    those risky groups expose. Pure counting over one aggregate at
    QI grain; the value coordinate is a FIXED 10-unit band (a global
    ntile would be a single-partition sort over all events — the
    fixed band is the shape that survives 100 TB)."""
    events = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    band = F.least(
        F.floor(F.col("value") / F.lit(10.0)).cast("long"), F.lit(9).cast("long")
    )
    qi = events.select(
        "event_type",
        F.hour("ts").alias("hod"),
        band.alias("vband"),
    )
    groups = qi.groupBy("event_type", "hod", "vband").agg(
        F.count(F.lit(1)).alias("_gsz")
    )
    return (
        groups.groupBy("event_type")
        .agg(
            F.min("_gsz").alias("min_k"),
            F.sum(F.when(F.col("_gsz") < 5, 1).otherwise(0))
            .cast("long")
            .alias("groups_below_k5"),
            F.sum(F.when(F.col("_gsz") < 5, F.col("_gsz")).otherwise(0))
            .cast("long")
            .alias("rows_at_risk"),
        )
        .orderBy("event_type")
    )


def copurchase_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficients over the co-purchase graph
    (operators/graph.local_clustering) — community tightness per
    user, sharing the edge construction and triangle machinery with
    copurchase_triangles."""
    from stream_processing_system_spark.operators.graph import (
        cooccurrence_edges,
        local_clustering,
    )

    events = load_table(spark, sf_dir, "events")
    edges = cooccurrence_edges(events)
    return (
        local_clustering(edges)
        .select(F.col("node").alias("user_id"), "degree", "n_triangles", "clustering")
        .orderBy("user_id")
    )


def part_inventory_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clamped running balance ("inventory can't go negative"): per
    part, daily net quantity (returns count negative) folded into a
    floor-at-zero running balance. The naive form is a sequential
    per-row fold; the window form uses the reflection identity
    b_n = S_n - min(0, min_{k<=n} S_k) over prefix sums S — two
    window passes, no fold, no arrays, fully partition-parallel by
    part. Exact centi-unit integers throughout. Reports end balance
    and stockout (balance == 0) day counts per part."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = (
        li.select(
            "l_partkey",
            F.datediff(F.col("l_shipdate").cast("date"), F.lit("1995-01-01"))
            .cast("long")
            .alias("day_ord"),
            (
                F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("long")
                * F.when(F.col("l_returnflag") == "R", -1).otherwise(1)
            ).alias("net"),
        )
        .groupBy("l_partkey", "day_ord")
        .agg(F.sum("net").alias("net"))
    )
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("day_ord")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    s = daily.withColumn("_s", F.sum("net").over(w))
    b = s.withColumn("_m", F.min("_s").over(w)).withColumn(
        "_b", F.col("_s") - F.least(F.col("_m"), F.lit(0).cast("long"))
    )
    return (
        b.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            (F.max_by("_b", "day_ord").cast("double") / F.lit(100.0)).alias(
                "end_balance"
            ),
            F.sum(F.when(F.col("_b") == 0, 1).otherwise(0))
            .cast("long")
            .alias("stockout_days"),
        )
        .orderBy("l_partkey")
    )


def _daily_whole_units(events: DataFrame) -> DataFrame:
    """Daily total value per event_type on an exact integer grid:
    centi-unit BIGINT sums integer-divided back to whole units — a
    pure function of the row multiset, identical in both engines.
    Note the division truncates toward ZERO on negative daily sums
    (Spark `div` == DuckDB `//`; python's flooring `//` differs —
    caught by the ACF fuzz test's first negative-sum example)."""
    return (
        events.where(F.col("value").isNotNull())
        .select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cy"),
        )
        .groupBy("event_type", "day")
        .agg(F.expr("sum(cy) div 100").alias("x"))
    )


def events_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the daily total value per event
    type at lags 1..7 — the seasonality screen before any forecast.

    Exactness: the daily series lives on a whole-unit integer grid
    (`_daily_whole_units`); Pearson terms for each (type, lag) are
    DECIMAL(38,0) sums of BIGINT products (exact, order-free; DuckDB
    mirrors in HUGEINT), and only the final
    num / (sqrt(a)·sqrt(b)) runs in fixed-operand-order doubles.

    Shape: ONE data-sized aggregate to (type, day) grain; the
    lag pairing is a self-join of that tiny daily frame fanned 7× by
    a lag literal array — never a window over raw events."""
    events = load_table(spark, sf_dir, "events")
    daily = _daily_whole_units(events).localCheckpoint(eager=True)
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag"))
    left = daily.crossJoin(F.broadcast(lags)).select(
        "event_type", "lag", F.date_add("day", F.col("lag")).alias("day2"),
        F.col("x").alias("xa"),
    )
    right = daily.select(
        "event_type", F.col("day").alias("day2"), F.col("x").alias("xb")
    )
    d38 = "decimal(38,0)"
    pairs = left.join(right, ["event_type", "day2"])
    stats = pairs.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum(F.col("xa").cast(d38)).alias("sa"),
        F.sum(F.col("xb").cast(d38)).alias("sb"),
        F.sum((F.col("xa").cast(d38) * F.col("xa"))).alias("saa"),
        F.sum((F.col("xb").cast(d38) * F.col("xb"))).alias("sbb"),
        F.sum((F.col("xa").cast(d38) * F.col("xb"))).alias("sab"),
    )
    num = (F.col("n") * F.col("sab") - F.col("sa") * F.col("sb")).cast("double")
    da = (F.col("n") * F.col("saa") - F.col("sa") * F.col("sa")).cast("double")
    db = (F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb")).cast("double")
    return (
        stats.where((da > 0) & (db > 0))
        .select(
            "event_type",
            "lag",
            F.col("n").cast("long").alias("n_pairs"),
            det_round(num / (F.sqrt(da) * F.sqrt(db))).alias("acf"),
        )
        .orderBy("event_type", "lag")
    )


def events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival burstiness (Goh–Barabási
    B = (σ−μ)/(σ+μ) over the gaps between consecutive events): the
    bot-vs-human activity-shape signal. Gaps are exact epoch-second
    longs from a per-user LAG window ordered by (ts, event_id) — the
    event_id tie-break pins same-timestamp ordering. μ and σ come
    from exact DECIMAL(38,0) sums of gaps and squared gaps (sample
    variance), so the only floating-point is the final fixed-order
    expression. Window partitions by user: per-partition work is
    bounded by one user's history, the same bound sessionization
    lives under. Users with < 10 gaps are dropped."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("_ts").asc(), F.col("event_id").asc()
    )
    d38 = "decimal(38,0)"
    gaps = (
        events.select("user_id", "event_id", F.col("ts").cast("long").alias("_ts"))
        .withColumn("_g", F.col("_ts") - F.lag("_ts").over(w))
        .where(F.col("_g").isNotNull())
    )
    stats = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum(F.col("_g").cast(d38)).alias("s1"),
        F.sum(F.col("_g").cast(d38) * F.col("_g")).alias("s2"),
    )
    n = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / n
    var = (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double") / (
        n * (n - F.lit(1.0))
    )
    sd = F.sqrt(var)
    return (
        stats.where(F.col("n") >= 10)
        .select(
            "user_id",
            F.col("n").cast("long").alias("n_gaps"),
            det_round(mean).alias("mean_gap_s"),
            det_round((sd - mean) / (sd + mean)).alias("burstiness"),
        )
        .orderBy("user_id")
    )


def events_seasonal_wape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each day's total
    value per event type with the value 7 days earlier, scored by
    WAPE = Σ|actual−forecast| / Σactual — the weighted variant whose
    numerator and denominator are BOTH exact BIGINT sums on the
    whole-unit grid (per-day percentage errors would force an
    order-dependent double sum; WAPE doesn't). One daily aggregate +
    one tiny self-join at (type, day) grain."""
    events = load_table(spark, sf_dir, "events")
    daily = _daily_whole_units(events).localCheckpoint(eager=True)
    fc = daily.select(
        "event_type", F.date_add("day", 7).alias("day"), F.col("x").alias("f")
    )
    scored = daily.join(fc, ["event_type", "day"])
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum(F.abs(F.col("x") - F.col("f"))).alias("_ae"),
            F.sum("x").alias("_a"),
        )
        .where(F.col("_a") > 0)
        .select(
            "event_type",
            "n_days",
            det_round(F.col("_ae").cast("double") / F.col("_a").cast("double")).alias(
                "wape"
            ),
        )
        .orderBy("event_type")
    )


def orders_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of o_totalprice: observed first-significant
    -digit distribution vs the log10(1+1/d) expectation, one row per
    digit with its chi-square contribution — the classic fabricated-
    data screen for a financial column.

    Determinism: the digit comes from STRING arithmetic on the exact
    cent grid (first char of the BIGINT cents rendered as text),
    never from log10 of a double (whose floor can straddle an
    engine-specific ulp at powers of ten). The expectation uses
    log10 only on the 9 digit CONSTANTS — correctly-rounded in both
    engines. Per-digit rows avoid any cross-row double sum. Shape:
    one scan aggregate onto a 9-value key domain."""
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    digit = F.substring(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").cast("string"),
        1,
        1,
    ).cast("int")
    obs = orders.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n_obs")
    )
    total = obs.agg(F.sum("n_obs").alias("_t"))
    p = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    exp = F.col("_t") * p
    return (
        obs.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n_obs",
            det_round(exp).alias("n_expected"),
            det_round(
                (F.col("n_obs") - exp) * (F.col("n_obs") - exp) / exp
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


def user_activity_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user event counts by event type — the
    concentration/inequality metric for traffic audits (is one bot
    generating half the clicks?). G = 2·Σ(rank·c)/(n·Σc) − (n+1)/n
    over counts ranked ascending: every term is an exact BIGINT
    (rank ties between equal counts permute equal values, so the
    weighted sum is tie-order invariant), and only the final
    fixed-order expression runs in doubles.

    Scale: the ranked window runs per event_type over USER-grain
    counts (one row per active user, after the data-sized aggregate)
    — the same bounded-grain contract as customer_value_deciles; the
    raw event table is never windowed."""
    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("c").asc(), F.col("user_id").asc()
    )
    ranked = counts.withColumn("i", F.row_number().over(w))
    stats = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("i") * F.col("c")).alias("ws"),
    )
    n = F.col("n").cast("double")
    gini = (F.lit(2.0) * F.col("ws").cast("double")) / (
        n * F.col("s").cast("double")
    ) - (n + F.lit(1.0)) / n
    return (
        stats.select(
            "event_type",
            F.col("n").cast("long").alias("n_users"),
            F.col("s").cast("long").alias("n_events"),
            det_round(gini).alias("gini"),
        )
        .orderBy("event_type")
    )


def customer_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution / record linkage: match customers against a
    deterministically-dirtied copy of themselves (0→O typos in every
    third name, ±3-cent balance noise, every 11th segment blanked) by
    BLOCKED multi-field scoring — the Fellegi–Sunter shape: cheap
    blocking keys cut the candidate space, then per-field agreement
    weights (+3 normalized-name, +2 balance within 2 cents, +1
    segment) sum to a match score, threshold ≥ 4.

    The dirty copy is derived IN-QUERY with pure expressions, so the
    oracle rebuilds it bit-for-bit (no fixture file). Blocking =
    (nation, last-2-digits of the normalized name): an equi-join on
    bounded blocks — at 100 TB this is the standard linkage plan, a
    hash join on block keys with per-block fan-in bounded by block
    granularity, never an all-pairs comparison. Balance noise lives
    on the exact cent grid."""
    cust = load_table(spark, sf_dir, "customer")
    cents = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long")
    a = cust.select(
        F.col("c_custkey").alias("a_id"),
        F.col("c_name").alias("a_name"),
        F.col("c_nationkey").alias("nk"),
        cents.alias("a_cents"),
        F.col("c_mktsegment").alias("a_seg"),
    )
    b = cust.where(F.col("c_custkey") % 2 == 0).select(
        F.col("c_custkey").alias("b_id"),
        F.when(
            F.col("c_custkey") % 3 == 0, F.translate("c_name", "0", "O")
        )
        .otherwise(F.col("c_name"))
        .alias("b_name"),
        F.col("c_nationkey").alias("nk"),
        (cents + F.col("c_custkey") % 7 - F.lit(3)).alias("b_cents"),
        F.when(F.col("c_custkey") % 11 == 0, F.lit("UNKNOWN"))
        .otherwise(F.col("c_mktsegment"))
        .alias("b_seg"),
    )
    # normalization undoes the known typo class only: names contain
    # no uppercase 'O' (lowercase 'o' in "Customer#" is untouched)
    b = b.withColumn("b_norm", F.translate("b_name", "O", "0"))
    cand = a.join(
        b,
        (a["nk"] == b["nk"])
        & (F.expr("right(a_name, 2)") == F.expr("right(b_norm, 2)")),
    )
    score = (
        F.when(F.col("a_name") == F.col("b_norm"), 3).otherwise(0)
        + F.when(F.abs(F.col("a_cents") - F.col("b_cents")) <= 2, 2).otherwise(0)
        + F.when(F.col("a_seg") == F.col("b_seg"), 1).otherwise(0)
    )
    return (
        cand.select("a_id", "b_id", score.cast("int").alias("score"))
        .where(F.col("score") >= 4)
        .orderBy("a_id", "b_id")
    )


def event_type_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the event-type Markov chain (where
    does a user's session settle?): transition counts from each
    user's consecutive event pairs, then 10 power-iteration rounds of
    x' = xP executed as a join-based matvec — the same distributed
    shape as `graph.pagerank`, with mass on the 1e-9 integer grid
    (per-edge contribution floor(x·(n_ij/n_i)+0.5) is identical IEEE
    math in both engines; per-state accumulation sums BIGINTs).
    The transition extraction is the data-sized stage (one per-user
    LAG window); the iteration runs on the (types × types) frame."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    pairs = (
        events.select(
            "user_id", "event_id", "ts", F.col("event_type").alias("nxt")
        )
        .withColumn("prv", F.lag("nxt").over(w))
        .where(F.col("prv").isNotNull())
    )
    trans = (
        pairs.groupBy("prv", "nxt")
        .agg(F.count(F.lit(1)).alias("n_ij"))
        .localCheckpoint(eager=True)
    )
    row_tot = trans.groupBy("prv").agg(F.sum("n_ij").alias("n_i"))
    states = trans.select(F.col("prv").alias("state")).distinct()
    n_states = states.agg(F.count(F.lit(1)).alias("_t"))
    x = states.crossJoin(F.broadcast(n_states)).select(
        "state", F.floor(F.lit(1e9) / F.col("_t") + 0.5).cast("long").alias("_x")
    )
    for _ in range(10):
        contrib = (
            trans.join(row_tot, "prv")
            .join(x, trans.prv == x.state)
            .select(
                F.col("nxt").alias("state"),
                F.floor(
                    F.col("_x")
                    * (F.col("n_ij").cast("double") / F.col("n_i").cast("double"))
                    + 0.5
                )
                .cast("long")
                .alias("_c"),
            )
        )
        x = contrib.groupBy("state").agg(F.sum("_c").alias("_x"))
    return x.select(
        F.col("state").alias("event_type"),
        (F.col("_x").cast("double") / F.lit(1e9)).alias("stationary"),
    ).orderBy("event_type")


def part_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over order baskets: support,
    directional confidence, and lift for the top-100 part pairs by
    lift (min pair support 5) — `copurchased_part_pairs`' counts
    promoted to the full recommendation-mining metrics.

    Exactness: every metric is a ratio of exact BIGINT counts whose
    products stay far under 2^53, so the doubles are correctly
    rounded and identical in both engines — sortable on the RAW lift
    (not its rounding) with (p1, p2) tie-breaks. Shape: the
    within-basket self-join (quadratic only in basket size), one
    item-count aggregate joined back on each leg, distributed top-k.
    """
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = li.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    item_n = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_item"))
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p1"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p2"))
    pairs = (
        a.join(b, "ok")
        .where(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= 5)
    )
    joined = (
        pairs.join(
            item_n.select(F.col("l_partkey").alias("p1"), F.col("n_item").alias("n_a")),
            "p1",
        )
        .join(
            item_n.select(F.col("l_partkey").alias("p2"), F.col("n_item").alias("n_b")),
            "p2",
        )
        .crossJoin(F.broadcast(n_orders))
    )
    lift = (F.col("n_ab") * F.col("n_orders")).cast("double") / (
        F.col("n_a") * F.col("n_b")
    ).cast("double")
    return (
        joined.select(
            "p1",
            "p2",
            "n_ab",
            det_round(F.col("n_ab").cast("double") / F.col("n_orders").cast("double")).alias(
                "support"
            ),
            det_round(F.col("n_ab").cast("double") / F.col("n_a").cast("double")).alias(
                "conf_a_to_b"
            ),
            det_round(F.col("n_ab").cast("double") / F.col("n_b").cast("double")).alias(
                "conf_b_to_a"
            ),
            det_round(lift).alias("lift"),
            lift.alias("_lift_raw"),
        )
        .orderBy(F.col("_lift_raw").desc(), "p1", "p2")
        .limit(100)
        .drop("_lift_raw")
    )


def session_entry_exit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session path endpoints: the (entry event type → exit event
    type) matrix over 30-min-gap sessions — which doors users come in
    and leave through, the first question after sessionization.
    Entry/exit are first/last by the total (ts, event_id) order
    inside each session (window with an explicit full frame), so ties
    at the same timestamp are pinned. Same single user-keyed shuffle
    as `sessionize_events`, then a tiny (type × type) aggregate."""
    events = load_table(spark, sf_dir, "events")
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_session = (
        F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(by_user)
        > 30 * 60
    ).cast("int")
    sess = events.withColumn(
        "session_id",
        F.sum(F.coalesce(new_session, F.lit(0))).over(
            by_user.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    full = (
        Window.partitionBy("user_id", "session_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    endpoints = sess.select(
        "user_id",
        "session_id",
        F.first("event_type").over(full).alias("entry_type"),
        F.last("event_type").over(full).alias("exit_type"),
    ).dropDuplicates(["user_id", "session_id"])
    return (
        endpoints.groupBy("entry_type", "exit_type")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy("entry_type", "exit_type")
    )


def conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase conversion latency distribution: per user, the
    gap from FIRST click to the first purchase at-or-after it;
    summarized as exact-arithmetic stats (min / median / avg / max
    seconds). Median is an exact rank statistic over integer seconds
    (even-count midpoint is one exact IEEE add+halve); avg is an
    exact BIGINT sum over an exact count — no interpolated
    percentile whose formula order could differ between engines.
    Shape: two per-user min-aggregates and one user-keyed join —
    never an event×event product."""
    events = load_table(spark, sf_dir, "events")
    first_click = (
        events.where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min(F.col("ts").cast("long")).alias("c_ts"))
    )
    purch = events.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").cast("long").alias("p_ts")
    )
    lat = (
        purch.join(first_click, "user_id")
        .where(F.col("p_ts") >= F.col("c_ts"))
        .groupBy("user_id")
        .agg((F.min("p_ts") - F.min("c_ts")).alias("lat_s"))
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.min("lat_s").alias("min_s"),
        F.median(F.col("lat_s").cast("double")).alias("median_s"),
        det_round(
            F.sum("lat_s").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("avg_s"),
        F.max("lat_s").alias("max_s"),
    )


def nation_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration index of supplier revenue
    within each nation — the market-concentration audit (HHI → 1
    means one supplier owns the nation's flow). HHI = Σ rᵢ² / (Σ rᵢ)²
    over per-supplier revenue, computed from exact cent-grid BIGINTs
    with the squares summed in DECIMAL(38,0) (HUGEINT in the oracle)
    — no per-share double ever enters a cross-row sum. Shape: one
    fact-table aggregate to supplier grain, a broadcast nation join,
    then a nation-grain reduce."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + F.lit(0.5)
    ).cast("long")
    rev = li.select("l_suppkey", cents.alias("c")).groupBy("l_suppkey").agg(
        F.sum("c").alias("r")
    )
    d38 = "decimal(38,0)"
    per_nation = (
        rev.join(F.broadcast(sup.select("s_suppkey", "s_nationkey")),
                 rev.l_suppkey == F.col("s_suppkey"))
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(F.col("r").cast(d38)).alias("s1"),
            F.sum(F.col("r").cast(d38) * F.col("r")).alias("s2"),
        )
    )
    hhi = F.col("s2").cast("double") / (
        F.col("s1").cast("double") * F.col("s1").cast("double")
    )
    return (
        per_nation.join(
            F.broadcast(nat), per_nation.s_nationkey == nat.n_nationkey
        )
        .select(
            F.col("n_name").alias("nation"),
            F.col("n_suppliers").cast("long").alias("n_suppliers"),
            det_round(hhi).alias("hhi"),
        )
        .orderBy("nation")
    )


def daily_order_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index of dispersion (variance/mean) of daily order counts per
    priority class — the Poisson-ness check for arrival processes
    (index ≈ 1 is Poisson; ≫ 1 is bursty batch submission). Daily
    counts are exact; population variance comes from exact
    DECIMAL(38,0) sums; one double division at the end."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        "o_orderpriority", F.col("o_orderdate").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    d38 = "decimal(38,0)"
    stats = daily.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum(F.col("c").cast(d38)).alias("s1"),
        F.sum(F.col("c").cast(d38) * F.col("c")).alias("s2"),
    )
    n = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / n
    var = (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double") / (
        n * n
    )
    return stats.select(
        "o_orderpriority",
        F.col("n").cast("long").alias("n_days"),
        det_round(mean).alias("mean_per_day"),
        det_round(var / mean).alias("dispersion"),
    ).orderBy("o_orderpriority")


def cumulative_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running count of distinct users ever seen, per day — the
    audience-growth curve. The classic trap is a per-day DISTINCT
    over an ever-growing prefix (quadratic); the linear formulation
    aggregates each user to their FIRST-seen day, counts new users
    per day, and takes one cumulative sum over the tiny day-grain
    frame. Days with no new users still appear (joined back to the
    observed-day spine) with their carried total."""
    events = load_table(spark, sf_dir, "events")
    first_day = events.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("day")
    )
    new_per_day = first_day.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_new")
    )
    days = events.select(F.col("ts").cast("date").alias("day")).distinct()
    spine = days.join(new_per_day, "day", "left").select(
        "day", F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.select(
            F.col("day").cast("string").alias("day"),
            "n_new",
            F.sum("n_new").over(w).alias("total_users"),
        )
        .orderBy("day")
    )


def hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality fingerprint: event count and mean
    value per (event_type, hour 0–23) — the diurnal shape used for
    staffing/capacity and anomaly baselines. Means come from exact
    centi-unit sums; 24×types output grain."""
    events = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    return (
        events.select(
            "event_type",
            F.hour("ts").cast("int").alias("hour"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cy"),
        )
        .groupBy("event_type", "hour")
        .agg(
            F.count(F.lit(1)).alias("n"),
            det_round(
                F.sum("cy").cast("double") / F.lit(100.0) / F.count(F.lit(1)).cast("double")
            ).alias("mean_value"),
        )
        .orderBy("event_type", "hour")
    )


def user_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's LONGEST run of consecutive
    active days (and when it started) — the engagement-streak query,
    and the one classic windowing pattern not yet in the surface:
    group key = day − row_number, constant exactly while days are
    consecutive. All integer date arithmetic; the per-user argmax is
    a (len desc, start asc) row_number pick, fully ordered. Windows
    partition by user over DAY-grain rows (post-aggregate), never raw
    events."""
    events = load_table(spark, sf_dir, "events")
    days = (
        events.select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    runs = (
        days.withColumn("_rn", F.row_number().over(w))
        .withColumn("_grp", F.date_sub(F.col("day"), F.col("_rn")))
        .groupBy("user_id", "_grp")
        .agg(
            F.count(F.lit(1)).alias("len"),
            F.min("day").alias("start"),
        )
    )
    pick = Window.partitionBy("user_id").orderBy(
        F.col("len").desc(), F.col("start").asc()
    )
    n_days = days.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_active_days"))
    best = (
        runs.withColumn("_p", F.row_number().over(pick))
        .where(F.col("_p") == 1)
        .select(
            "user_id",
            F.col("len").cast("long").alias("best_streak_days"),
            F.col("start").cast("string").alias("streak_start"),
        )
    )
    return best.join(n_days, "user_id").select(
        "user_id", "n_active_days", "best_streak_days", "streak_start"
    ).orderBy("user_id")


def fulfillment_latency_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency distribution per order month: exact
    integer day differences summarized by count / min / exact median
    / max — the operations-SLA trend. One fact-side join-free pass
    (lineitem carries both dates via its order join), aggregated at
    month grain; median is the exact rank statistic."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    j = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).select(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("long")
        .alias("ym"),
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        ).cast("long").alias("lat_days"),
    )
    return (
        j.groupBy("ym")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.min("lat_days").alias("min_days"),
            F.median(F.col("lat_days").cast("double")).alias("median_days"),
            F.max("lat_days").alias("max_days"),
        )
        .orderBy("ym")
    )


def events_type_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation matrix between event types' daily total
    value series (do purchases co-move with clicks?) — `events_acf`'s
    machinery pointed across series instead of across lags: the same
    whole-unit daily grid, a (type_a < type_b) day-equi-join of the
    tiny daily frame, and DECIMAL(38,0)/HUGEINT moment sums with one
    fixed-order double finish."""
    events = load_table(spark, sf_dir, "events")
    daily = _daily_whole_units(events).localCheckpoint(eager=True)
    a = daily.select(
        F.col("event_type").alias("type_a"), "day", F.col("x").alias("xa")
    )
    b = daily.select(
        F.col("event_type").alias("type_b"), "day", F.col("x").alias("xb")
    )
    d38 = "decimal(38,0)"
    pairs = a.join(b, "day").where(F.col("type_a") < F.col("type_b"))
    stats = pairs.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum(F.col("xa").cast(d38)).alias("sa"),
        F.sum(F.col("xb").cast(d38)).alias("sb"),
        F.sum(F.col("xa").cast(d38) * F.col("xa")).alias("saa"),
        F.sum(F.col("xb").cast(d38) * F.col("xb")).alias("sbb"),
        F.sum(F.col("xa").cast(d38) * F.col("xb")).alias("sab"),
    )
    num = (F.col("n") * F.col("sab") - F.col("sa") * F.col("sb")).cast("double")
    da = (F.col("n") * F.col("saa") - F.col("sa") * F.col("sa")).cast("double")
    db = (F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb")).cast("double")
    return (
        stats.where((da > 0) & (db > 0))
        .select(
            "type_a",
            "type_b",
            F.col("n").cast("long").alias("n_days"),
            det_round(num / (F.sqrt(da) * F.sqrt(db))).alias("corr"),
        )
        .orderBy("type_a", "type_b")
    )


def events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event type between the first
    and second half of the time range — the model-monitoring drift
    score that weights shifts by their log-odds, complementing the
    count-based `events_drift_chi2`. Width-200 value bands; PSI sums
    (q−p)·ln(q/p) over bands populated in BOTH halves (the standard
    practical restriction — a band empty on one side has undefined
    log-odds and signals through its neighbor bands).

    Determinism: band counts and per-type margins are exact ints
    (margins via one window over the tiny band table, no second
    scan); each band's term is quantized to a 1e-9 integer grid
    before the per-type sum (the chi2-drift device), so the only
    doubles are fixed-order per-band expressions. NULL ts filtered
    explicitly on both engines (the CvM precedent, ADVICE r7)."""
    events = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    half = (F.col("ts") >= F.lit("2024-01-16")).cast("int")
    cells = events.groupBy(
        "event_type",
        F.floor(F.col("value") / 200).cast("long").alias("band"),
    ).agg(
        F.sum(F.lit(1) - half).alias("c1"),
        F.sum(half).alias("c2"),
    ).where((F.col("c1") > 0) & (F.col("c2") > 0))
    w = Window.partitionBy("event_type")
    with_m = cells.select(
        "event_type",
        "band",
        "c1",
        "c2",
        F.sum("c1").over(w).alias("n1"),
        F.sum("c2").over(w).alias("n2"),
    )
    p = F.col("c1").cast("double") / F.col("n1").cast("double")
    q = F.col("c2").cast("double") / F.col("n2").cast("double")
    term = F.floor((q - p) * F.log(q / p) * F.lit(1e9) + F.lit(0.5)).cast("long")
    return (
        with_m.select("event_type", term.alias("_t"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_bands"),
            det_round(F.sum("_t").cast("double") / F.lit(1e9)).alias("psi"),
        )
        .orderBy("event_type")
    )


def copurchase_cheapest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted shortest paths over the co-purchase graph
    (operators/graph.py:cheapest_paths — 3 Bellman–Ford relaxations
    from the minimum user id): edge cost = 1000 div n_shared_cells,
    so strongly-co-purchasing pairs are cheap to traverse. Integer
    min-plus arithmetic end-to-end; the hot-cell valve bounds the
    pair blow-up exactly as in `cooccurrence_edges`."""
    from stream_processing_system_spark.operators.graph import cheapest_paths

    events = load_table(spark, sf_dir, "events")
    cells = (
        events.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.window("ts", "1 day").start.alias("_hb"),
            F.expr("get_json_object(props, '$.k')").alias("_k"),
        )
        .distinct()
    )
    sizes = cells.groupBy("_hb", "_k").agg(F.count(F.lit(1)).alias("_n"))
    bounded = cells.join(
        sizes.where(F.col("_n") <= 64).select("_hb", "_k"), ["_hb", "_k"]
    )
    a = bounded.select("_hb", "_k", F.col("user_id").alias("src"))
    b = bounded.select("_hb", "_k", F.col("user_id").alias("dst"))
    weighted = (
        a.join(b, ["_hb", "_k"])
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("_ns"))
        .select("src", "dst", F.expr("1000 div _ns").alias("w"))
    )
    return (
        cheapest_paths(weighted, rounds=3)
        .select(F.col("node").alias("user_id"), "cost")
        .orderBy("user_id")
    )


def revenue_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of WEEKLY order revenue: the MEDIAN of
    all pairwise slopes — immune to the outlier periods that bend the
    OLS trend (`forecast_revenue` / `value_trend_by_type`'s
    counterpart from robust statistics). Each slope is an exact-int
    ratio ((cents_j − cents_i) / (week_j − week_i)), correctly
    rounded to the same double in both engines; the median is an
    exact rank statistic. Theil–Sen is O(n²) in its series length BY
    DEFINITION, so the aggregation grain is the scale knob: week
    grain bounds a 7-year span to ~350 points → ~60k pairs, keeping
    the exact-median reduce trivial at any corpus size (day grain on
    the same span is 2.9M pairs into one reducer — measured 9.6 s at
    sf0.1 before this grain choice)."""
    orders = load_table(spark, sf_dir, "orders")
    weekly = (
        orders.groupBy(
            F.floor(
                F.col("o_orderdate").cast("timestamp").cast("long") / 604800
            )
            .cast("long")
            .alias("d")
        )
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
            .alias("y")
        )
        .localCheckpoint(eager=True)
    )
    a = weekly.select(F.col("d").alias("d1"), F.col("y").alias("y1"))
    b = weekly.select(F.col("d").alias("d2"), F.col("y").alias("y2"))
    slopes = (
        a.join(b, F.col("d1") < F.col("d2"))
        .select(
            (
                (F.col("y2") - F.col("y1")).cast("double")
                / (F.col("d2") - F.col("d1")).cast("double")
            ).alias("s")
        )
    )
    n = weekly.agg(F.count(F.lit(1)).alias("n_weeks"))
    return (
        slopes.agg(
            F.count(F.lit(1)).alias("n_pairs"),
            det_round(F.median("s")).alias("slope_cents_per_week"),
        )
        .crossJoin(F.broadcast(n))
        .select("n_weeks", "n_pairs", "slope_cents_per_week")
    )


def orders_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall rank correlation (tau-a) between daily order COUNT and
    daily order REVENUE — the non-parametric co-movement check whose
    every intermediate is an exact integer: concordant/discordant
    pair counts over the day-grain frame, one ratio at the end. Ties
    in either coordinate are excluded (tau-a on strict pairs),
    keeping the arithmetic sign-of-product integer logic."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(
            F.floor(
                F.col("o_orderdate").cast("timestamp").cast("long") / 86400
            )
            .cast("long")
            .alias("d")
        )
        .agg(
            F.count(F.lit(1)).alias("x"),
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
            .alias("y"),
        )
        .localCheckpoint(eager=True)
    )
    a = daily.select(
        F.col("d").alias("d1"), F.col("x").alias("x1"), F.col("y").alias("y1")
    )
    b = daily.select(
        F.col("d").alias("d2"), F.col("x").alias("x2"), F.col("y").alias("y2")
    )
    sgn = (F.col("x2") - F.col("x1")) * (F.col("y2") - F.col("y1"))
    pairs = a.join(b, F.col("d1") < F.col("d2")).select(
        F.when(sgn > 0, 1).otherwise(0).alias("c"),
        F.when(sgn < 0, 1).otherwise(0).alias("dd"),
    )
    n = daily.agg(F.count(F.lit(1)).alias("n_days"))
    stats = pairs.agg(
        F.sum("c").cast("long").alias("concordant"),
        F.sum("dd").cast("long").alias("discordant"),
    ).crossJoin(F.broadcast(n))
    total = (F.col("n_days") * (F.col("n_days") - 1) / 2).cast("double")
    return stats.select(
        "n_days",
        "concordant",
        "discordant",
        det_round(
            (F.col("concordant") - F.col("discordant")).cast("double") / total
        ).alias("tau"),
    )


def weighted_median_part_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-weighted median part size per brand: the weighted rank
    statistic ("half the revenue ships at size ≤ s") that a plain
    median can't answer. Formulation: per-(brand, size) exact cent
    weights, a cumulative-sum window over size order, then the FIRST
    size where 2·cum ≥ total — every comparison is exact BIGINT
    (the ×2 avoids materializing total/2 as a double; the Pareto-80%
    device). Windows run on the (brand × size) post-aggregate grain."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + F.lit(0.5)
    ).cast("long")
    by_size = (
        li.join(F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
                li.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.sum(cents).alias("w"))
    )
    wcum = Window.partitionBy("p_brand").orderBy("p_size").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wtot = Window.partitionBy("p_brand")
    flagged = by_size.select(
        "p_brand",
        "p_size",
        F.sum("w").over(wcum).alias("cum"),
        F.sum("w").over(wtot).alias("tot"),
    ).where(F.col("cum") * 2 >= F.col("tot"))
    pick = Window.partitionBy("p_brand").orderBy("p_size")
    return (
        flagged.withColumn("_rn", F.row_number().over(pick))
        .where(F.col("_rn") == 1)
        .select(
            "p_brand",
            F.col("p_size").cast("long").alias("weighted_median_size"),
            (F.col("tot").cast("double") / F.lit(10000.0)).alias("brand_revenue"),
        )
        .orderBy("p_brand")
    )


def rolling_7d_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct users over a trailing 7-day window, per day —
    the sliding-window cardinality that HLL/KMV sketches approximate
    (`stream_kmv_distinct_users`), here exact via the presence-explode
    trick: each (user, active-day) row claims membership in the 7
    windows ending on day..day+6, and the count is a plain distinct
    aggregate per window end. Linear in presence rows × window length
    — never a per-day DISTINCT re-scan of the raw events — and only
    window ends that are OBSERVED days are reported (join back to the
    day spine)."""
    events = load_table(spark, sf_dir, "events")
    presence = events.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    offsets = spark.range(0, 7).select(F.col("id").cast("int").alias("off"))
    claims = (
        presence.crossJoin(F.broadcast(offsets))
        .select("user_id", F.date_add("day", F.col("off")).alias("wend"))
        .distinct()
    )
    days = events.select(F.col("ts").cast("date").alias("wend")).distinct()
    return (
        claims.join(days, "wend")
        .groupBy("wend")
        .agg(F.count(F.lit(1)).alias("distinct_users_7d"))
        .select(F.col("wend").cast("string").alias("day"), "distinct_users_7d")
        .orderBy("day")
    )


def part_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical (tree) aggregation: parts arranged in a derived
    3-level taxonomy (root ← partkey div 100 ← partkey div 10 ←
    part) and revenue rolled UP the tree so every node reports its
    SUBTREE total — the BOM-explosion / org-chart rollup pattern,
    expressed as one leaf aggregate + one union of level
    projections + one re-aggregate (each part contributes to exactly
    its 3 ancestors; no iterative join because the hierarchy depth is
    a schema constant). Exact DECIMAL money sums throughout.

    Output: (level, node_id, subtree_revenue, n_parts)."""
    li = load_table(spark, sf_dir, "lineitem")
    leaf = li.groupBy(F.col("l_partkey").alias("part")).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,4)"
            )
        ).alias("rev"),
    )
    levels = [
        (F.lit(2).alias("level"), F.expr("part div 10")),
        (F.lit(1).alias("level"), F.expr("part div 100")),
    ]
    nodes = leaf.select(
        F.lit(3).alias("level"), F.col("part").cast("long").alias("node_id"),
        "rev",
    )
    for lv, expr in levels:
        nodes = nodes.unionByName(
            leaf.select(lv, expr.cast("long").alias("node_id"), "rev")
        )
    return (
        nodes.groupBy("level", "node_id")
        .agg(
            F.sum("rev").cast("double").alias("subtree_revenue"),
            F.count(F.lit(1)).alias("n_parts"),
        )
        .orderBy("level", "node_id")
    )


def linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase's value is split
    EQUALLY across the same user's clicks in the preceding hour (the
    marketing counterpart to `purchase_last_click_asof`'s last-touch
    rule), and credit is rolled up per click DAY. The per-click
    credit is cents·10⁴ div n_clicks — an exact integer micro-cent
    share (the documented floor makes a purchase's credit sum ≤ its
    value by < n·1e-4 cents), so day totals are order-free integer
    sums. Shape: one bounded-window (1 h) interval join on user_id +
    two aggregates."""
    events = load_table(spark, sf_dir, "events")
    purch = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("event_id").alias("p_id"),
        F.col("ts").cast("long").alias("p_ts"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("ts").cast("long").alias("c_ts"),
        F.col("ts").cast("date").cast("string").alias("c_day"),
    )
    pairs = purch.join(clicks, "user_id").where(
        (F.col("c_ts") >= F.col("p_ts") - 3600) & (F.col("c_ts") < F.col("p_ts"))
    )
    fan = pairs.groupBy("p_id").agg(F.count(F.lit(1)).alias("n_clicks"))
    credited = pairs.join(fan, "p_id").select(
        "c_day",
        F.expr("(cents * 10000) div n_clicks").alias("credit_u"),
    )
    return (
        credited.groupBy("c_day")
        .agg(
            F.count(F.lit(1)).alias("n_credits"),
            (F.sum("credit_u").cast("double") / F.lit(1e6)).alias(
                "attributed_value"
            ),
        )
        .orderBy("c_day")
    )


def brand_return_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage of per-brand return rates toward the
    global rate: shrunk = (returns + m·prior) / (n + m), m = 50 —
    the small-sample correction that stops a 3-lineitem brand from
    topping the returns leaderboard (the same reason rating sites
    use weighted scores). Counts exact; prior and the shrunk rate are
    fixed-order doubles over those counts."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        li.l_partkey == F.col("p_partkey"),
    )
    per_brand = j.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("long")
        .alias("r"),
    )
    tot = per_brand.agg(
        F.sum("n").alias("tn"), F.sum("r").alias("tr")
    )
    prior = F.col("tr").cast("double") / F.col("tn").cast("double")
    m = F.lit(50.0)
    shrunk = (F.col("r").cast("double") + m * prior) / (
        F.col("n").cast("double") + m
    )
    return (
        per_brand.crossJoin(F.broadcast(tot))
        .select(
            "p_brand",
            "n",
            "r",
            det_round(F.col("r").cast("double") / F.col("n").cast("double")).alias(
                "raw_rate"
            ),
            det_round(shrunk).alias("shrunk_rate"),
        )
        .orderBy("p_brand")
    )


def events_dow_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA for a day-of-week effect on daily total value
    per event type: F = (SSB/(k−1)) / (SSW/(n−k)) plus the effect
    size η² = SSB/(SSB+SSW) — "is weekday seasonality real or
    noise", the variance-decomposition complement to `events_acf`.

    Engine-free day-of-week: (days-since-epoch) mod 7 — never the
    engines' dayofweek()s, which disagree on week start. Exactness:
    group sums/counts and ΣX² are exact integers (DECIMAL/HUGEINT);
    the cross-GROUP sum Σ S_g²/n_g uses the mean-grid device — the
    group mean S_g/n_g is floored onto the 1e-6 grid and
    t_g = n_g·m6² is an exact DECIMAL(38,0) product (the round-9
    100× lesson: a per-group sum-of-squares grid overflows BIGINT
    once daily totals reach ~1e9 units); everything after is
    fixed-order doubles."""
    events = load_table(spark, sf_dir, "events")
    daily = _daily_whole_units(events).select(
        "event_type",
        (F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")) % 7).alias(
            "dow"
        ),
        "x",
    )
    d38 = "decimal(38,0)"
    groups = daily.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum(F.col("x").cast(d38)).alias("sg"),
    )
    # mean-grid device (the round-9 100× lesson, shared with
    # events_brown_forsythe): quantize the group MEAN S_g/n_g — n_g
    # is dow-bounded, so the mean grows like the daily total, NOT
    # like S_g² — onto the 1e-6 grid; t_g = n_g·m6² is an exact
    # DECIMAL(38,0) product, overflow-safe to ~1e13-unit daily means
    # where the old sum-of-squares grid overflowed BIGINT at ~100×
    # the bench scale. NULL t (decimal overflow, non-ANSI) and a
    # grid mean past BIGINT raise loudly on both engines.
    mean_raw = (
        F.col("sg").cast("double") / F.col("ng").cast("double")
        * F.lit(1e6)
    )
    m6 = F.floor(mean_raw + F.lit(0.5)).cast("long")
    term = F.col("ng").cast(d38) * m6 * m6
    per_type = groups.select(
        "event_type",
        "ng",
        "sg",
        term.alias("t"),
        F.when(
            (F.abs(mean_raw) > F.lit(9.2e18)) | F.col("t").isNull(),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("ovf"),
    ).groupBy(
        "event_type"
    ).agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("ng").alias("n"),
        F.sum("sg").alias("s"),
        F.sum("t").alias("tsum"),
        F.sum("ovf").alias("n_ovf"),
    )
    q = daily.groupBy("event_type").agg(
        F.sum(F.col("x").cast(d38) * F.col("x")).alias("q")
    )
    j = per_type.join(q, "event_type")
    _anova_raise = F.raise_error(
        F.lit(
            "events_dow_anova: mean-grid group term overflowed "
            "(per-dow mean daily value beyond the documented "
            "domain); re-grid via a coarser quantum"
        )
    ).cast("double")
    between_raw = F.when(F.col("n_ovf") > 0, _anova_raise).otherwise(
        F.col("tsum").cast("double") / F.lit(1e12)
    )
    ssb = between_raw - (F.col("s") * F.col("s")).cast("double") / F.col(
        "n"
    ).cast("double")
    ssw = F.col("q").cast("double") - between_raw
    k = F.col("k").cast("double")
    n = F.col("n").cast("double")
    fstat = (ssb / (k - F.lit(1.0))) / (ssw / (n - k))
    return (
        j.where((F.col("k") > 1) & ((n - k) > 0) & (ssw > 0))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_days"),
            F.col("k").cast("long").alias("n_groups"),
            det_round(fstat).alias("f_stat"),
            det_round(ssb / (ssb + ssw)).alias("eta_sq"),
        )
        .orderBy("event_type")
    )


def events_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test on daily up/down moves per event
    type: too FEW runs means trending, too MANY means oscillation —
    the randomness check behind "is this series actually i.i.d.".
    Moves are exact integer sign comparisons over the whole-unit
    daily grid (zero-moves dropped); the run count is a lag-compare
    sum; E[R] and Var[R] are the classical closed forms over exact
    counts, leaving one fixed-order z expression. One daily
    aggregate + one per-type day-grain window."""
    events = load_table(spark, sf_dir, "events")
    daily = _daily_whole_units(events)
    w = Window.partitionBy("event_type").orderBy("day")
    moves = (
        daily.withColumn("_prev", F.lag("x").over(w))
        .where(F.col("_prev").isNotNull() & (F.col("x") != F.col("_prev")))
        .withColumn("_up", (F.col("x") > F.col("_prev")).cast("int"))
    )
    w2 = Window.partitionBy("event_type").orderBy("day")
    runs = moves.withColumn(
        "_new_run",
        F.when(
            F.lag("_up").over(w2).isNull()
            | (F.col("_up") != F.lag("_up").over(w2)),
            1,
        ).otherwise(0),
    )
    stats = runs.groupBy("event_type").agg(
        F.sum("_up").cast("long").alias("n_up"),
        F.sum(F.lit(1) - F.col("_up")).cast("long").alias("n_down"),
        F.sum("_new_run").cast("long").alias("runs"),
    )
    p, m = F.col("n_up").cast("double"), F.col("n_down").cast("double")
    n = p + m
    e = F.lit(2.0) * p * m / n + F.lit(1.0)
    v = (F.lit(2.0) * p * m * (F.lit(2.0) * p * m - p - m)) / (n * n * (n - F.lit(1.0)))
    z = (F.col("runs").cast("double") - e) / F.sqrt(v)
    return (
        stats.where((F.col("n_up") > 0) & (F.col("n_down") > 0))
        .select(
            "event_type",
            "n_up",
            "n_down",
            "runs",
            det_round(z).alias("z"),
        )
        .orderBy("event_type")
    )


def supplier_window_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rest of the window-function surface in one query —
    percent_rank, cume_dist, nth_value, lead-with-default — ranking
    suppliers by account balance within nation (completing §2.5's
    row_number/rank/lag/sum-over coverage elsewhere). Total order
    (balance cents desc, suppkey) pins every tie; percent_rank and
    cume_dist are exact integer ratios, correctly rounded to the
    same double in both engines."""
    sup = load_table(spark, sf_dir, "supplier")
    cents = F.floor(F.col("s_acctbal") * 100 + F.lit(0.5)).cast("long")
    base = sup.select(
        "s_suppkey", "s_nationkey", cents.alias("bal_c")
    )
    w = Window.partitionBy("s_nationkey").orderBy(
        F.col("bal_c").desc(), F.col("s_suppkey").asc()
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return base.select(
        "s_suppkey",
        "s_nationkey",
        (F.col("bal_c").cast("double") / F.lit(100.0)).alias("acctbal"),
        F.row_number().over(w).cast("long").alias("rn"),
        det_round(F.percent_rank().over(w)).alias("pct_rank"),
        det_round(F.cume_dist().over(w)).alias("cume"),
        (
            F.nth_value("bal_c", 2).over(wf).cast("double") / F.lit(100.0)
        ).alias("nation_second_best"),
        (
            F.lead("bal_c", 1, 0).over(w).cast("double") / F.lit(100.0)
        ).alias("next_bal"),
    ).orderBy("s_nationkey", "rn")


def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: users bucketed by first-active
    epoch week (the `weekly_retention` cohort key), purchase value
    accumulated by cohort AGE in weeks, with the running cumulative —
    the LTV-payback table next to retention's activity counts. Money
    on the exact centi grid; the cumsum window runs per cohort over
    AGE-grain rows (weeks × weeks bounded)."""
    events = load_table(spark, sf_dir, "events")
    first_week = events.groupBy("user_id").agg(
        F.floor(F.min(F.col("ts").cast("long")) / 604800).cast("long").alias(
            "cohort_week"
        )
    )
    purchases = events.where(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select(
        "user_id",
        F.floor(F.col("ts").cast("long") / 604800).cast("long").alias("week"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cy"),
    )
    aged = purchases.join(first_week, "user_id").select(
        "cohort_week", (F.col("week") - F.col("cohort_week")).alias("age_weeks"), "cy"
    )
    per_age = aged.groupBy("cohort_week", "age_weeks").agg(
        F.sum("cy").alias("_c")
    )
    w = Window.partitionBy("cohort_week").orderBy("age_weeks").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return per_age.select(
        "cohort_week",
        "age_weeks",
        (F.col("_c").cast("double") / F.lit(100.0)).alias("week_value"),
        (F.sum("_c").over(w).cast("double") / F.lit(100.0)).alias("cum_value"),
    ).orderBy("cohort_week", "age_weeks")


def events_type_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence between the event-TYPE mix of the
    first and second half of the time range — the bounded, symmetric
    drift score for categorical mixes (complementing `events_psi_drift`
    on the value distribution and `events_drift_chi2` on counts).
    JSD = ½KL(p‖m) + ½KL(q‖m), m = ½(p+q), in bits. Per-type KL
    terms are quantized to a 1e-9 integer grid before the cross-type
    sum (the chi2/PSI device); types absent from a half contribute
    only through the present side (0·log0 = 0). One scan aggregate
    onto the type domain. NULL ts filtered explicitly on both
    engines (the CvM precedent, ADVICE r7)."""
    events = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull()
    )
    half = (F.col("ts") >= F.lit("2024-01-16")).cast("int")
    cells = events.groupBy("event_type").agg(
        F.sum(F.lit(1) - half).alias("c1"),
        F.sum(half).alias("c2"),
    )
    w = Window.partitionBy()
    m = cells.select(
        "event_type",
        "c1",
        "c2",
        F.sum("c1").over(w).alias("n1"),
        F.sum("c2").over(w).alias("n2"),
    )
    # guard the shares at the source: an all-in-one-half corpus makes
    # the OTHER half's n zero, and mid references BOTH shares, so a
    # when() around the KL term alone still divides by zero under ANSI
    p = F.when(
        F.col("n1") > 0, F.col("c1").cast("double") / F.col("n1").cast("double")
    ).otherwise(F.lit(0.0))
    q = F.when(
        F.col("n2") > 0, F.col("c2").cast("double") / F.col("n2").cast("double")
    ).otherwise(F.lit(0.0))
    mid = (p + q) / F.lit(2.0)
    kl_p = F.when(F.col("c1") > 0, p * F.log2(p / mid)).otherwise(F.lit(0.0))
    kl_q = F.when(F.col("c2") > 0, q * F.log2(q / mid)).otherwise(F.lit(0.0))
    term = F.floor(
        (kl_p + kl_q) / F.lit(2.0) * F.lit(1e9) + F.lit(0.5)
    ).cast("long")
    return (
        m.select(term.alias("t"))
        .agg(
            F.count(F.lit(1)).alias("n_types"),
            det_round(F.sum("t").cast("double") / F.lit(1e9)).alias("jsd_bits"),
        )
    )


def user_bot_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite bot-likelihood report per user — operator
    COMPOSITION over the behavioral surface: volume (share of all
    events), night share (hour-of-day 0–5), and event-type
    concentration (max type share), combined as a fixed-weight score
    0.4·volume_z + 0.3·night + 0.3·concentration where volume_z is
    the user's share normalized by the max share. Every ingredient
    is an exact integer ratio; the score is one fixed-order
    expression; top 25 by (score desc, user_id)."""
    events = load_table(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.hour("ts") <= 5, 1).otherwise(0)).alias("night"),
    )
    per_type = (
        events.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("user_id")
        .agg(F.max("c").alias("max_type"))
    )
    w = Window.partitionBy()
    j = per_user.join(per_type, "user_id").select(
        "user_id",
        "n",
        "night",
        "max_type",
        F.max("n").over(w).alias("nmax"),
    )
    vol = F.col("n").cast("double") / F.col("nmax").cast("double")
    night = F.col("night").cast("double") / F.col("n").cast("double")
    conc = F.col("max_type").cast("double") / F.col("n").cast("double")
    score = F.lit(0.4) * vol + F.lit(0.3) * night + F.lit(0.3) * conc
    return (
        j.select(
            "user_id",
            F.col("n").cast("long").alias("n_events"),
            det_round(vol).alias("volume_ratio"),
            det_round(night).alias("night_share"),
            det_round(conc).alias("type_concentration"),
            det_round(score).alias("bot_score"),
            score.alias("_s"),
        )
        .orderBy(F.col("_s").desc(), F.col("user_id").asc())
        .limit(25)
        .drop("_s")
    )


def value_percentiles_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DISCRETE percentiles (percentile_disc p10/p50/p90) per
    event type via the grid-histogram + cumulative-count plan — the
    scale path for exact percentiles: `value_percentiles`' exact
    `percentile()` sorts every group's raw values, while this
    aggregates once onto the bounded centi-grid domain and takes the
    smallest grid value whose cumulative count reaches ⌈q·n⌉ (the
    100·cum ≥ q·n comparison stays in exact BIGINTs). The per-type
    window runs over the histogram grain (bounded by the value
    domain), never over raw events."""
    events = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    hist = events.groupBy(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cy"),
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("event_type").orderBy("cy").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "cy",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(wt).alias("n"),
    )

    def pick(q: int, name: str):
        return (
            F.min(
                F.when(F.col("cum") * 100 >= F.col("n") * q, F.col("cy"))
            ).cast("double")
            / F.lit(100.0)
        ).alias(name)

    return (
        cum.groupBy("event_type")
        .agg(
            F.max("n").alias("_n"),
            pick(10, "p10"),
            pick(50, "p50"),
            pick(90, "p90"),
        )
        .select(
            "event_type",
            F.col("_n").cast("long").alias("n_values"),
            "p10",
            "p50",
            "p90",
        )
        .orderBy("event_type")
    )


def orderkey_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-continuity audit on o_orderkey: missing-id gaps
    (invoice-numbering holes — the classic completeness check on any
    assigned-sequence column). One LAG window over the KEY-grain
    frame yields gap count, missing-id total, and the largest hole;
    all exact integers."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey").distinct()
    w = Window.orderBy("o_orderkey")
    gaps = orders.select(
        "o_orderkey",
        (F.col("o_orderkey") - F.lag("o_orderkey").over(w)).alias("_d"),
    ).where(F.col("_d").isNotNull())
    return gaps.agg(
        (F.count(F.lit(1)) + 1).alias("n_keys"),
        F.sum(F.when(F.col("_d") > 1, 1).otherwise(0)).cast("long").alias("n_gaps"),
        F.sum(F.col("_d") - 1).cast("long").alias("n_missing_ids"),
        (F.max("_d") - 1).cast("long").alias("largest_gap"),
    )


def robust_mean_median_of_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-of-means robust mean of event value per type: users are
    hashed into 16 buckets (md5-based, ingest-stable), each bucket's
    mean comes from exact centi sums, and the estimate is the exact-
    rank MEDIAN of the 16 bucket means — the heavy-tail-tolerant mean
    estimator used when a single whale user can drag the plain mean
    (reported alongside for contrast). Shape: one data-sized
    aggregate to (type × 16) grain, then a 16-row median per type."""
    events = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long"),
        F.lit(16),
    )
    cy = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    per_bucket = (
        events.select("event_type", bucket.alias("b"), cy.alias("cy"))
        .groupBy("event_type", "b")
        .agg(
            (
                F.sum("cy").cast("double") / F.lit(100.0)
                / F.count(F.lit(1)).cast("double")
            ).alias("m")
        )
    )
    totals = events.select(
        "event_type", cy.alias("cy")
    ).groupBy("event_type").agg(
        (
            F.sum("cy").cast("double") / F.lit(100.0)
            / F.count(F.lit(1)).cast("double")
        ).alias("_plain")
    )
    mom = per_bucket.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.median("m").alias("_mom"),
    )
    return (
        mom.join(totals, "event_type")
        .select(
            "event_type",
            F.col("n_buckets").cast("long").alias("n_buckets"),
            det_round(F.col("_mom")).alias("median_of_means"),
            det_round(F.col("_plain")).alias("plain_mean"),
        )
        .orderBy("event_type")
    )


def orders_nested_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested (document-style) data model: lineitems COLLECTED into a
    per-order array of structs — the denormalized layout lakehouse
    tables use to kill the join — then analyzed IN PLACE with
    higher-order functions (fold for revenue, filter+size for the
    returns count) without re-exploding. Per-priority rollup of
    per-order nested aggregates.

    Determinism: the nested array is sorted by l_linenumber
    (collect_list order is partition luck; sort_array pins it), the
    fold runs in array order on exact cent-grid integers, and the
    rollup sums BIGINTs. DuckDB mirrors with list(... ORDER BY) +
    list_transform/list_sum."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    item = F.struct(
        F.col("l_linenumber").alias("ln"),
        F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("rev_u"),
        (F.col("l_returnflag") == "R").alias("returned"),
    )
    nested = (
        li.select("l_orderkey", item.alias("item"))
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("item")).alias("items"))
    )
    per_order = nested.select(
        "l_orderkey",
        F.size("items").alias("n_items"),
        F.aggregate(
            "items", F.lit(0).cast("long"), lambda acc, x: acc + x["rev_u"]
        ).alias("rev_u"),
        F.size(F.filter("items", lambda x: x["returned"])).alias("n_returned"),
    )
    return (
        per_order.join(
            orders, per_order.l_orderkey == orders.o_orderkey
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("n_items").cast("long").alias("n_items"),
            (F.sum("rev_u").cast("double") / F.lit(10000.0)).alias("revenue"),
            F.sum("n_returned").cast("long").alias("n_returned"),
        )
        .orderBy("o_orderpriority")
    )


def copurchase_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-purchase graph: Pearson
    correlation of endpoint degrees over all directed edges —
    positive means hubs befriend hubs (social nets), negative means
    hub-and-spoke (tech/dependency graphs); the one-number structural
    fingerprint next to clustering coefficients. Exact
    DECIMAL(38,0)/HUGEINT moment sums over integer degrees; one
    fixed-order double finish."""
    from stream_processing_system_spark.operators.graph import (
        _undirect,
        cooccurrence_edges,
    )

    events = load_table(spark, sf_dir, "events")
    und = _undirect(cooccurrence_edges(events)).localCheckpoint(eager=True)
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    pairs = (
        und.join(deg.withColumnRenamed("src", "_a"), und.src == F.col("_a"))
        .withColumnRenamed("d", "x")
        .drop("_a")
        .join(deg.withColumnRenamed("src", "_b"), und.dst == F.col("_b"))
        .withColumnRenamed("d", "y")
        .drop("_b")
    )
    d38 = "decimal(38,0)"
    s = pairs.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum(F.col("x").cast(d38)).alias("sx"),
        F.sum(F.col("y").cast(d38)).alias("sy"),
        F.sum(F.col("x").cast(d38) * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast(d38) * F.col("y")).alias("syy"),
        F.sum(F.col("x").cast(d38) * F.col("y")).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    da = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    db = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return s.where((da > 0) & (db > 0)).select(
        F.col("n").cast("long").alias("n_directed_edges"),
        det_round(num / (F.sqrt(da) * F.sqrt(db))).alias("assortativity"),
    )


def copurchase_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-component SIZE distribution of the co-purchase graph
    (dedup.connected_component_labels — the pointer-jumping min-label
    fixpoint — pointed at a user graph instead of a dup graph):
    (component_size, n_components) rows, the fragmentation
    fingerprint. The oracle recomputes components with a recursive
    transitive-closure CTE, so the iterative fixpoint is value-hash
    verified here (dedup_transitive's own check is rows-only)."""
    from stream_processing_system_spark.operators.dedup import (
        connected_component_labels,
    )
    from stream_processing_system_spark.operators.graph import cooccurrence_edges

    events = load_table(spark, sf_dir, "events")
    edges = cooccurrence_edges(events).localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("user_id"))
        .union(edges.select(F.col("dst").alias("user_id")))
        .distinct()
    )
    pairs = edges.select(
        F.col("src").alias("id_a"), F.col("dst").alias("id_b")
    )
    labels = connected_component_labels(pairs, nodes, "user_id")
    sizes = labels.groupBy("component").agg(F.count(F.lit(1)).alias("sz"))
    return (
        sizes.groupBy("sz")
        .agg(F.count(F.lit(1)).alias("n_components"))
        .select(F.col("sz").cast("long").alias("component_size"), "n_components")
        .orderBy("component_size")
    )


def daily_value_count_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between daily total value and daily
    event count per type — completing the correlation family
    (Pearson `events_type_corr`, Kendall `orders_kendall_tau`).
    Ranks come from row_number with a day tie-break (fully ordered,
    so the classic distinct-rank form ρ = 1 − 6Σd²/(n(n²−1)) applies
    exactly, every term an integer). Rank windows run per type over
    day-grain rows."""
    events = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    daily = events.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("v"),
        F.count(F.lit(1)).alias("c"),
    )
    rv = Window.partitionBy("event_type").orderBy(F.col("v").asc(), F.col("day").asc())
    rc = Window.partitionBy("event_type").orderBy(F.col("c").asc(), F.col("day").asc())
    ranked = daily.select(
        "event_type",
        F.row_number().over(rv).cast("long").alias("ra"),
        F.row_number().over(rc).cast("long").alias("rb"),
    )
    d = F.col("ra") - F.col("rb")
    s = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum(d * d).alias("sd2")
    )
    n = F.col("n").cast("double")
    rho = F.lit(1.0) - (F.lit(6.0) * F.col("sd2").cast("double")) / (
        n * (n * n - F.lit(1.0))
    )
    return (
        s.where(F.col("n") > 1)
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_days"),
            det_round(rho).alias("spearman_rho"),
        )
        .orderBy("event_type")
    )


def _ring_vnodes(n_shards: int, vnodes_per_shard: int = 16) -> list[tuple[int, int]]:
    """Deterministic consistent-hash ring: (shard, position) vnodes,
    position = first 8 md5 hex chars of 'shard:vnode' as a 32-bit
    int. Driver-side constants (like the LSH hyperplanes) shared
    verbatim with the SQL oracle."""
    import hashlib

    return [
        (s, int(hashlib.md5(f"{s}:{v}".encode()).hexdigest()[:8], 16))
        for s in range(n_shards)
        for v in range(vnodes_per_shard)
    ]


def consistent_hash_reshard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent-hash ring sharding + reshard movement audit: users
    are placed on a 32-bit ring (first vnode clockwise; wrap to the
    ring's first vnode), assigned under 4 shards and under 5, and the
    movement matrix (shard_before, shard_after, n_users) is reported
    — the infra invariant being audited is that adding a shard moves
    only ~1/(n+1) of keys, which naive `hash mod n` fails
    catastrophically (it moves ~n/(n+1)). Ring vnodes are
    driver-side constants (the hyperplane contract); per-key
    assignment is a broadcast join + min_by over matching vnodes —
    map-side, no shuffle of the key table."""
    events = load_table(spark, sf_dir, "events")
    users = events.select("user_id").distinct()
    kh = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    keyed = users.select("user_id", kh.alias("kh"))

    def assign(n_shards: int, out: str):
        vn = spark.createDataFrame(
            _ring_vnodes(n_shards), "shard int, pos long"
        )
        wrap = vn.orderBy("pos").limit(1).select(
            F.col("shard").alias("_wrap")
        )
        cand = keyed.join(
            F.broadcast(vn), F.col("pos") >= F.col("kh"), "left"
        )
        first = cand.groupBy("user_id", "kh").agg(
            F.min_by("shard", "pos").alias("_s")
        )
        return first.crossJoin(F.broadcast(wrap)).select(
            "user_id",
            "kh",
            F.coalesce(F.col("_s"), F.col("_wrap")).cast("int").alias(out),
        )
    a4 = assign(4, "shard_before")
    a5 = assign(5, "shard_after").drop("kh")
    return (
        a4.join(a5, "user_id")
        .groupBy("shard_before", "shard_after")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("shard_before", "shard_after")
    )


def events_stl_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-style decomposition strength per event type: daily totals
    split into trend (7-day centered moving average), day-of-week
    seasonal (per-dow mean of the detrended series), and residual;
    reported as the standard seasonal-strength statistic
    1 − Var(resid)/Var(detrended) plus the residual variance share —
    "how much of the wiggle is weekly rhythm vs noise", the
    decomposition complement to `events_dow_anova`'s hypothesis test.

    Every component lives on an exact integer MICRO grid: the MA is
    sum·10⁶ div count (truncating div, identical in both engines),
    dow comes from epoch-day mod 7, seasonal means are again
    integer-div, and variances are DECIMAL(38,0)/HUGEINT moment sums
    of micro values. Windows run per type over day-grain rows."""
    events = load_table(spark, sf_dir, "events")
    daily = _daily_whole_units(events)
    wma = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    trended = daily.select(
        "event_type",
        "day",
        "x",
        F.count(F.lit(1)).over(wma).alias("_cw"),
        F.sum("x").over(wma).alias("_xw"),
    ).select(
        "event_type",
        "day",
        "x",
        F.expr("(_xw * 1000000) div _cw").alias("tr_u"),
    )
    det = trended.select(
        "event_type",
        "day",
        (F.col("x") * F.lit(1000000) - F.col("tr_u")).alias("d_u"),
        (
            F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")) % 7
        ).alias("dow"),
    )
    seas = det.groupBy("event_type", "dow").agg(
        F.expr("sum(d_u) div count(1)").alias("s_u")
    )
    resid = det.join(seas, ["event_type", "dow"]).select(
        "event_type", "d_u", (F.col("d_u") - F.col("s_u")).alias("r_u")
    )
    d38 = "decimal(38,0)"
    s = resid.groupBy("event_type").agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum(F.col("d_u").cast(d38)).alias("sd"),
        F.sum(F.col("d_u").cast(d38) * F.col("d_u")).alias("sdd"),
        F.sum(F.col("r_u").cast(d38)).alias("sr"),
        F.sum(F.col("r_u").cast(d38) * F.col("r_u")).alias("srr"),
    )
    vd = (F.col("n") * F.col("sdd") - F.col("sd") * F.col("sd")).cast("double")
    vr = (F.col("n") * F.col("srr") - F.col("sr") * F.col("sr")).cast("double")
    return (
        s.where(vd > 0)
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_days"),
            det_round(F.lit(1.0) - vr / vd).alias("seasonal_strength"),
            det_round(vr / vd).alias("resid_var_share"),
        )
        .orderBy("event_type")
    )


def events_ccf_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation function between the daily-value series of
    every event-type pair at lags −7..+7 — "does error volume lead
    purchase volume by two days?" — the lead/lag screen that turns a
    wall of per-type time series into causal hypotheses. Positive lag
    means type_a's series is correlated with type_b's series `lag`
    days LATER.

    Exactness mirrors `events_acf`: the daily series is the
    whole-unit integer grid of `_daily_whole_units`; per (pair, lag)
    Pearson moments are DECIMAL(38,0) sums of BIGINT products
    (HUGEINT in the oracle), and only the final num/(√a·√b) runs in
    fixed-operand-order doubles. Pairs with fewer than 3 overlapping
    days or a constant side are excluded (undefined correlation).

    Shape: ONE data-sized aggregate to (type, day) grain (the daily
    frame is O(types × days), trivially small at any corpus size),
    then a broadcast lag fan-out and a self-join of that tiny frame —
    never a window over raw events. At 100 TB the only heavy stage
    is the first groupBy; everything after is kilobytes."""
    events = load_table(spark, sf_dir, "events")
    daily = _daily_whole_units(events).localCheckpoint(eager=True)
    lags = spark.range(-7, 8).select(F.col("id").cast("int").alias("lag"))
    left = daily.crossJoin(F.broadcast(lags)).select(
        F.col("event_type").alias("type_a"),
        "lag",
        F.date_add("day", F.col("lag")).alias("day_b"),
        F.col("x").alias("xa"),
    )
    right = daily.select(
        F.col("event_type").alias("type_b"),
        F.col("day").alias("day_b"),
        F.col("x").alias("xb"),
    )
    d38 = "decimal(38,0)"
    m = (
        left.join(right, "day_b")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b", "lag")
        .agg(
            F.count(F.lit(1)).cast(d38).alias("n"),
            F.sum(F.col("xa").cast(d38)).alias("sa"),
            F.sum(F.col("xb").cast(d38)).alias("sb"),
            F.sum(F.col("xa").cast(d38) * F.col("xb")).alias("sab"),
            F.sum(F.col("xa").cast(d38) * F.col("xa")).alias("saa"),
            F.sum(F.col("xb").cast(d38) * F.col("xb")).alias("sbb"),
        )
    )
    va = (F.col("n") * F.col("saa") - F.col("sa") * F.col("sa")).cast("double")
    vb = (F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb")).cast("double")
    num = (F.col("n") * F.col("sab") - F.col("sa") * F.col("sb")).cast("double")
    return (
        m.where((F.col("n") >= 3) & (va > 0) & (vb > 0))
        .select(
            "type_a",
            "type_b",
            "lag",
            F.col("n").cast("long").alias("n_days"),
            det_round(num / (F.sqrt(va) * F.sqrt(vb))).alias("ccf"),
        )
        .orderBy("type_a", "type_b", "lag")
    )


#: Foreign-key edges of the star schema: (child table, key column,
#: parent table, parent key). events.user_id -> customer is included
#: deliberately — it is NOT a declared FK in the generator, and the
#: audit quantifies exactly how far it is from one.
_FK_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("events", "user_id", "customer", "c_custkey"),
]


def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over the whole star schema: for
    each foreign-key edge, the child row count, NULL-key count, and
    orphan count (non-null keys with no parent) — the pipeline
    pre-flight that catches a truncated dimension load before any
    join silently drops fact rows.

    Shape per edge: the child is reduced to ONE column then
    left-anti-joined against the DISTINCT parent keys — at 100 TB the
    anti join is a broadcast for dimension parents (nation/region/
    customer/supplier/part all broadcast at real TPC-H ratios) and a
    key-only shuffle for lineitem→orders; either way the payload is
    8-byte keys, never full rows. The per-edge 1-row summaries union
    into one 8-row frame."""
    frames = []
    for child, key, parent, pkey in _FK_EDGES:
        c = load_table(spark, sf_dir, child).select(F.col(key).alias("_k"))
        p = (
            load_table(spark, sf_dir, parent)
            .select(F.col(pkey).alias("_k"))
            .distinct()
        )
        orphans = (
            c.where(F.col("_k").isNotNull())
            .join(p, "_k", "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
        )
        base = c.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("_k").isNull().cast("long")).alias("n_nulls"),
        )
        frames.append(
            base.crossJoin(orphans).select(
                F.lit(f"{child}.{key}->{parent}.{pkey}").alias("relation"),
                "n_rows",
                "n_nulls",
                "n_orphans",
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out.orderBy("relation")


def event_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-state predictability of the user event stream: for each
    current event type, the Shannon entropy (nats) of the
    next-event-type distribution plus its normalized form
    H/ln(n_next) ∈ [0,1] — the summary that turns
    `event_transitions`' 5×5 matrix into one "how deterministic is
    the flow out of this state" number per row.

    H = ln(N) − (Σ cᵢ·ln cᵢ)/N over exact integer counts; each
    cᵢ·ln cᵢ term is floored onto a 1e-9 grid as BIGINT (the
    `token_entropy` nano-grid device — absorbs last-ulp libm
    differences between engines) and summed exactly, so only the
    final fixed-operand-order double expression differs from pure
    integer math. Shape: the same single user-window shuffle as
    `event_transitions`, then arithmetic on the tiny count matrix."""
    events = load_table(spark, sf_dir, "events")
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    counts = (
        events.select(
            "user_id",
            "ts",
            "event_id",
            F.col("event_type").alias("cur_event"),
            F.lead("event_type").over(by_user).alias("next_event"),
        )
        .where(F.col("next_event").isNotNull())
        .groupBy("cur_event", "next_event")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    term = F.floor(
        F.col("c").cast("double") * F.log(F.col("c").cast("double")) * F.lit(1e9)
        + F.lit(0.5)
    ).cast("long")
    s = counts.groupBy("cur_event").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_next"),
        F.sum(term).alias("_s"),
    )
    h = (
        F.log(F.col("n").cast("double"))
        - F.col("_s").cast("double") / F.lit(1e9) / F.col("n").cast("double")
    )
    return s.select(
        "cur_event",
        F.col("n").cast("long").alias("n_transitions"),
        F.col("n_next").cast("long").alias("n_next_types"),
        det_round(h).alias("entropy_nats"),
        det_round(
            F.when(F.col("n_next") > 1, h / F.log(F.col("n_next").cast("double")))
            .otherwise(F.lit(0.0))
        ).alias("entropy_norm"),
    ).orderBy("cur_event")


def copurchase_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 predicted links in the user co-purchase graph by
    Adamic–Adar score (operators/graph.py:adamic_adar — integer
    nano-grid wedge terms, hub valve, exact top-k)."""
    from stream_processing_system_spark.operators.graph import (
        adamic_adar,
        cooccurrence_edges,
    )

    events = load_table(spark, sf_dir, "events")
    return adamic_adar(cooccurrence_edges(events), k=50).select(
        F.col("u").alias("user_a"),
        F.col("v").alias("user_b"),
        "n_common",
        "aa_score",
    )


def customer_mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 outlier customers by 2-D Mahalanobis distance over
    (order count, total spend) — the covariance-aware anomaly score
    that catches "many cheap orders" AND "one huge order" patterns a
    per-axis z-score misses, because it whitens the strong
    count↔spend correlation first.

    Exactness: features are exact integers (count, cent-sum); the
    five covariance moments are DECIMAL(38,0)/HUGEINT sums; with
    u = n·x₁−S₁, v = n·x₂−S₂ (exact integers) the distance is the
    closed form d² = (B·u² − 2C·u·v + A·v²)/(A·B − C²) over the
    integer scatter numerators A,B,C — evaluated in doubles with ONE
    fixed operand order in both engines, no aggregation of doubles
    anywhere. Ordering uses d² then custkey, identical doubles on
    both sides.

    Shape: one groupBy of orders to customer grain, one broadcast of
    the 1-row moment frame back onto it — two shuffles total, both on
    o_custkey-grain data."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("x1"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
        .alias("x2"),
    )
    d38 = "decimal(38,0)"
    m = per_cust.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum(F.col("x1").cast(d38)).alias("s1"),
        F.sum(F.col("x2").cast(d38)).alias("s2"),
        F.sum(F.col("x1").cast(d38) * F.col("x1")).alias("s11"),
        F.sum(F.col("x2").cast(d38) * F.col("x2")).alias("s22"),
        F.sum(F.col("x1").cast(d38) * F.col("x2")).alias("s12"),
    )
    j = per_cust.crossJoin(F.broadcast(m))
    ad = (F.col("n") * F.col("s11") - F.col("s1") * F.col("s1")).cast("double")
    bd = (F.col("n") * F.col("s22") - F.col("s2") * F.col("s2")).cast("double")
    cd = (F.col("n") * F.col("s12") - F.col("s1") * F.col("s2")).cast("double")
    ud = (F.col("n") * F.col("x1").cast(d38) - F.col("s1")).cast("double")
    vd = (F.col("n") * F.col("x2").cast(d38) - F.col("s2")).cast("double")
    d2 = (bd * ud * ud - F.lit(2.0) * cd * ud * vd + ad * vd * vd) / (
        ad * bd - cd * cd
    )
    return (
        j.select(
            "o_custkey",
            F.col("x1").cast("long").alias("n_orders"),
            (F.col("x2").cast("double") / F.lit(100.0)).alias("total_spend"),
            det_round(d2).alias("mahalanobis_d2"),
        )
        .orderBy(F.desc("mahalanobis_d2"), "o_custkey")
        .limit(20)
    )


def lineitem_ols_2var(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature OLS fit of extended price on (quantity, discount)
    via the normal equations — the distributed closed-form regression
    every pricing sanity check starts with: one pass of nine exact
    moment sums, then a 3×3 Cramer solve on the driver-free 1-row
    frame. Extends `revenue_theilsen_trend`'s single-feature family
    to the multivariate case.

    Exactness: y is cent-integer, x₁ whole quantity, x₂
    centi-discount; all nine moments are DECIMAL(38,0)/HUGEINT exact
    sums. The Cramer determinants and R² = 1 − SSE/SST run in
    doubles with ONE fixed operand order mirrored textually in the
    oracle — deterministic because no double is ever aggregated.

    Shape: ONE map-side-combined aggregate over lineitem; everything
    after is arithmetic on a single row. At 100 TB this is the
    cheapest possible multivariate fit — no iteration, no shuffle of
    anything wider than the nine-sum row."""
    li = load_table(spark, sf_dir, "lineitem")
    d38 = "decimal(38,0)"
    base = li.select(
        F.col("l_quantity").cast("long").cast(d38).alias("x1"),
        F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long").cast(d38)
        .alias("x2"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
        .cast(d38).alias("y"),
    )
    mo = base.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    # Cramer's rule on the symmetric 3x3 normal matrix
    # [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]] — every operand is an
    # exact integer cast to double once; the expression text below is
    # mirrored verbatim in the SQL oracle.
    a, b, c = F.col("n").cast("double"), F.col("s1").cast("double"), F.col("s2").cast("double")
    d, e, f = F.col("s11").cast("double"), F.col("s12").cast("double"), F.col("s22").cast("double")
    g, h, i = F.col("sy").cast("double"), F.col("s1y").cast("double"), F.col("s2y").cast("double")
    syy = F.col("syy").cast("double")
    det = a * (d * f - e * e) - b * (b * f - e * c) + c * (b * e - d * c)
    det0 = g * (d * f - e * e) - b * (h * f - e * i) + c * (h * e - d * i)
    det1 = a * (h * f - e * i) - g * (b * f - e * c) + c * (b * i - h * c)
    det2 = a * (d * i - h * e) - b * (b * i - h * c) + g * (b * e - d * c)
    b0, b1, b2 = det0 / det, det1 / det, det2 / det
    sse = syy - (b0 * g + b1 * h + b2 * i)
    sst = syy - g * g / a
    return mo.select(
        F.col("n").cast("long").alias("n_rows"),
        det_round(b0 / F.lit(100.0)).alias("intercept"),
        det_round(b1 / F.lit(100.0)).alias("beta_qty"),
        det_round(b2 / F.lit(100.0)).alias("beta_disc"),
        det_round(F.lit(1.0) - sse / sst).alias("r2"),
    )


def part_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand log-log price elasticity of demand: the OLS slope of
    ln(quantity) on ln(unit price) across a brand's line items, plus
    the correlation — the pricing-team staple that answers "does a
    10% discount move 10% more units for THIS brand?" (slope ≈ the
    %Δqty per %Δprice). Multivariate sibling: `lineitem_ols_2var`.

    Exactness: unit price is floored to integer cents FIRST, then
    both logs are floored onto a 1e-9 integer grid per row (the
    nano-grid device — absorbs last-ulp libm ln differences), so all
    six per-brand moments are exact DECIMAL(38,0)/HUGEINT sums; the
    slope and correlation are fixed-operand-order doubles at the
    very end. The nano scale cancels in both ratios.

    Shape: one broadcast join (part is a dimension), one map stage
    computing the grid logs, one combine-enabled groupBy over ~25
    brands — the minimum possible for a per-brand fit at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    up = F.floor(
        F.col("l_extendedprice") / F.col("l_quantity") * F.lit(100.0) + F.lit(0.5)
    ).cast("long")
    rows = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(
            "p_brand",
            F.floor(F.log(up.cast("double")) * F.lit(1e9) + F.lit(0.5))
            .cast("long")
            .alias("lx"),
            F.floor(
                F.log(F.col("l_quantity").cast("long").cast("double"))
                * F.lit(1e9)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("ly"),
        )
    )
    d38 = "decimal(38,0)"
    m = rows.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum(F.col("lx").cast(d38)).alias("sx"),
        F.sum(F.col("ly").cast(d38)).alias("sy"),
        F.sum(F.col("lx").cast(d38) * F.col("lx")).alias("sxx"),
        F.sum(F.col("ly").cast(d38) * F.col("ly")).alias("syy"),
        F.sum(F.col("lx").cast(d38) * F.col("ly")).alias("sxy"),
    )
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    return (
        m.where((vx > 0) & (vy > 0))
        .select(
            "p_brand",
            F.col("n").cast("long").alias("n_items"),
            det_round(num / vx).alias("elasticity"),
            det_round(num / (F.sqrt(vx) * F.sqrt(vy))).alias("corr"),
        )
        .orderBy("p_brand")
    )


def user_gap_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve of user inter-event gaps (whole
    minutes): S(t) = Π_{gᵢ ≤ t} (1 − dᵢ/nᵢ) over observed gaps, with
    each user's final open gap (last event → corpus end) entering
    the risk sets as a RIGHT-CENSORED subject — the churn-analysis
    estimator that a plain gap histogram gets wrong by ignoring the
    users who simply haven't come back YET.

    Exactness: gaps are integer minutes from epoch-second
    arithmetic; risk sets nᵢ and event counts dᵢ are exact integers
    via one cumulative window over the tiny per-minute table; each
    KM factor enters as floor(ln((n−d)/n)·1e9 + 0.5) BIGINT and the
    product is exp() of the exact cumulative sum — the nano-grid
    device, so the only doubles are one fixed-order expression per
    output row. If some gap exhausts the risk set (d = n), survival
    is pinned to 0 from there on (ln would be −∞).

    Shape: ONE user-partitioned window over events builds subjects;
    everything after operates on the per-distinct-minute frame,
    whose size is bounded by the time range in minutes, not the data
    — the single-partition cumulative window is over that tiny
    frame only."""
    events = load_table(spark, sf_dir, "events")
    by_user = Window.partitionBy("user_id").orderBy("s", "event_id")
    ev = events.select(
        "user_id",
        F.col("ts").cast("long").alias("s"),
        "event_id",
    ).select("s", F.lead("s").over(by_user).alias("nxt"))
    obs = ev.where(F.col("nxt").isNotNull()).select(
        F.expr("(nxt - s) div 60").alias("t"), F.lit(1).alias("is_obs")
    )
    gmax = events.agg(F.max(F.col("ts").cast("long")).alias("gm"))
    cens = (
        ev.where(F.col("nxt").isNull())
        .crossJoin(F.broadcast(gmax))
        .select(F.expr("(gm - s) div 60").alias("t"), F.lit(0).alias("is_obs"))
    )
    subj = obs.unionAll(cens)
    per_t = subj.groupBy("t").agg(
        F.sum("is_obs").alias("d"), F.count(F.lit(1)).alias("m")
    )
    nn = subj.agg(F.count(F.lit(1)).alias("N"))
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_inc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    tbl = per_t.crossJoin(F.broadcast(nn)).select(
        "t",
        "d",
        (F.col("N") - F.coalesce(F.sum("m").over(w_prev), F.lit(0))).alias("n"),
    )
    term = F.when(
        F.col("d") < F.col("n"),
        F.floor(
            F.log(
                (F.col("n") - F.col("d")).cast("double")
                / F.col("n").cast("double")
            )
            * F.lit(1e9)
            + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    z = F.max((F.col("d") >= F.col("n")).cast("int")).over(w_inc)
    cum = F.sum(term).over(w_inc)
    return (
        tbl.select(
            "t",
            "d",
            "n",
            z.alias("_z"),
            cum.alias("_cum"),
        )
        .where(F.col("d") >= 1)
        .select(
            F.col("t").cast("long").alias("gap_minutes"),
            F.col("n").cast("long").alias("n_at_risk"),
            F.col("d").cast("long").alias("n_events"),
            F.when(F.col("_z") == 1, F.lit(0.0))
            .otherwise(
                det_round(F.exp(F.col("_cum").cast("double") / F.lit(1e9)))
            )
            .alias("survival"),
        )
        .orderBy("gap_minutes")
    )


def doc_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction over the corpus: PageRank (3
    power iterations, the `operators/graph.pagerank` integer-grid
    contract) on the word co-occurrence graph built from ADJACENT
    token pairs, top-50 words by rank — the unsupervised keyword
    primitive behind extractive summarizers, here at corpus scope so
    the graph aggregates evidence across documents.

    Shape: one explode to bigram pairs + one distinct builds the
    edge list (vocabulary-sized, tiny relative to the corpus);
    PageRank then runs on that graph only. Ordering compares the
    grid-exact rank values (identical doubles both engines), word
    tie-break."""
    from stream_processing_system_spark.operators.graph import pagerank

    docs = load_table(spark, sf_dir, "documents")
    t = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    pairs = (
        docs.select(t.alias("t"))
        .select(
            F.explode(
                F.expr(
                    "transform(slice(t, 1, greatest(size(t) - 1, 0)),"
                    " (x, i) -> struct(x AS a, element_at(t, i + 2) AS b))"
                )
            ).alias("p")
        )
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .where(F.col("a") != F.col("b"))
    )
    edges = pairs.select(
        F.least("a", "b").alias("src"), F.greatest("a", "b").alias("dst")
    ).distinct()
    return (
        pagerank(edges, iters=3)
        .select(F.col("node").alias("word"), "pagerank")
        .orderBy(F.desc("pagerank"), "word")
        .limit(50)
    )


def user_geo_dbscan(
    spark: SparkSession, sf_dir: str, eps: float = 12.0, min_pts: int = 3
) -> DataFrame:
    """Density-based clustering (DBSCAN, Ester et al. 1996) over the
    deterministic user geolocations: a point with ≥ `min_pts`
    neighbors (self included) within `eps` degrees is a CORE; cores
    within eps of each other merge into one cluster (connected
    components of the core graph); non-cores adjacent to a core are
    BORDER points of that cluster (min core label tie-break); the
    rest is NOISE. The density-clustering complement to the
    centroid-based `embedding_kmeans_clusters` — no K, finds
    arbitrary-shaped clusters, labels outliers explicitly.

    Scale shape: the ε-neighborhood join is the 3×3 grid-blocked
    equi-join of `operators/geospatial.neighbor_pairs` (never
    all-pairs); the component fixpoint is the pointer-jumping
    min-label propagation of `dedup.connected_component_labels`,
    running on the CORE graph only. Cluster ids are min-user-id
    labels, fully deterministic; the oracle recomputes them with a
    recursive transitive closure over a brute-force pair join."""
    from stream_processing_system_spark.operators.dedup import (
        connected_component_labels,
    )
    from stream_processing_system_spark.operators.geospatial import (
        derive_points,
        neighbor_pairs,
    )

    events = load_table(spark, sf_dir, "events")
    ids = events.select("user_id").distinct()
    pts = derive_points(ids, "user_id")
    prs = (
        neighbor_pairs(pts, "user_id", radius_deg=eps)
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    und = prs.select(F.col("id_a").alias("s"), F.col("id_b").alias("d")).union(
        prs.select(F.col("id_b").alias("s"), F.col("id_a").alias("d"))
    )
    ncnt = und.groupBy("s").agg((F.count(F.lit(1)) + 1).alias("nn"))
    cores = ncnt.where(F.col("nn") >= min_pts).select(
        F.col("s").alias("user_id")
    )
    core_edges = prs.join(
        cores.select(F.col("user_id").alias("id_a")), "id_a", "left_semi"
    ).join(cores.select(F.col("user_id").alias("id_b")), "id_b", "left_semi")
    labels = connected_component_labels(core_edges, cores, "user_id")
    nbr_core = (
        und.join(
            labels.select(
                F.col("user_id").alias("d"), F.col("component").alias("_c")
            ),
            "d",
        )
        .groupBy("s")
        .agg(F.min("_c").alias("_bcomp"))
        .select(F.col("s").alias("user_id"), "_bcomp")
    )
    return (
        pts.select("user_id")
        .join(labels, "user_id", "left")
        .join(nbr_core, "user_id", "left")
        .select(
            "user_id",
            F.when(F.col("component").isNotNull(), F.lit("core"))
            .when(F.col("_bcomp").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
            F.coalesce(F.col("component"), F.col("_bcomp"))
            .cast("long")
            .alias("cluster"),
        )
        .orderBy("user_id")
    )


def events_granger_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-lag Granger causality screen over every directed pair of
    event types: does yesterday's CAUSE series improve today's
    EFFECT forecast beyond the effect's own yesterday? F-test of the
    restricted model y_t ~ y_{t−1} against the unrestricted
    y_t ~ y_{t−1} + x_{t−1} — turning `events_ccf_lag`'s symmetric
    correlations into directional lead hypotheses.

    Exactness: the daily series is the `_daily_whole_units` integer
    grid; both regressions are closed-form from ten DECIMAL(38,0)/
    HUGEINT moment sums (the `lineitem_ols_2var` Cramer machinery
    for the unrestricted 3×3, the 2×2 analogue for the restricted);
    SSEs and the F statistic are fixed-operand-order doubles
    mirrored textually in the oracle. Pairs need n ≥ 8 overlapping
    days, a nonsingular normal matrix, and SSE_u > 0.

    Shape: one aggregate to day grain, two date-shifted self-joins
    of that tiny frame, one groupBy over ≤ 20 (cause, effect) pairs
    — nothing data-sized past the first stage."""
    events = load_table(spark, sf_dir, "events")
    daily = _daily_whole_units(events).localCheckpoint(eager=True)
    eff = daily.select(
        F.col("event_type").alias("effect"), "day", F.col("x").alias("y")
    )
    eff_lag = daily.select(
        F.col("event_type").alias("effect"),
        F.date_add("day", 1).alias("day"),
        F.col("x").alias("y1"),
    )
    cause_lag = daily.select(
        F.col("event_type").alias("cause"),
        F.date_add("day", 1).alias("day"),
        F.col("x").alias("x1"),
    )
    tri = (
        eff.join(eff_lag, ["effect", "day"])
        .join(cause_lag, "day")
        .where(F.col("cause") != F.col("effect"))
    )
    d38 = "decimal(38,0)"
    mo = tri.groupBy("cause", "effect").agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum(F.col("y1").cast(d38)).alias("s1"),
        F.sum(F.col("x1").cast(d38)).alias("s2"),
        F.sum(F.col("y1").cast(d38) * F.col("y1")).alias("s11"),
        F.sum(F.col("y1").cast(d38) * F.col("x1")).alias("s12"),
        F.sum(F.col("x1").cast(d38) * F.col("x1")).alias("s22"),
        F.sum(F.col("y").cast(d38)).alias("sy"),
        F.sum(F.col("y1").cast(d38) * F.col("y")).alias("s1y"),
        F.sum(F.col("x1").cast(d38) * F.col("y")).alias("s2y"),
        F.sum(F.col("y").cast(d38) * F.col("y")).alias("syy"),
    )
    a, b, c = (
        F.col("n").cast("double"),
        F.col("s1").cast("double"),
        F.col("s2").cast("double"),
    )
    d, e, f = (
        F.col("s11").cast("double"),
        F.col("s12").cast("double"),
        F.col("s22").cast("double"),
    )
    g, h, i = (
        F.col("sy").cast("double"),
        F.col("s1y").cast("double"),
        F.col("s2y").cast("double"),
    )
    syy = F.col("syy").cast("double")
    det = a * (d * f - e * e) - b * (b * f - e * c) + c * (b * e - d * c)
    det0 = g * (d * f - e * e) - b * (h * f - e * i) + c * (h * e - d * i)
    det1 = a * (h * f - e * i) - g * (b * f - e * c) + c * (b * i - h * c)
    det2 = a * (d * i - h * e) - b * (b * i - h * c) + g * (b * e - d * c)
    sse_u = syy - (det0 / det * g + det1 / det * h + det2 / det * i)
    den_r = a * d - b * b
    b1r = (a * h - b * g) / den_r
    b0r = (g - b1r * b) / a
    sse_r = syy - (b0r * g + b1r * h)
    fstat = (sse_r - sse_u) * (a - F.lit(3.0)) / sse_u
    sst = syy - g * g / a
    return (
        mo.where(
            (F.col("n") >= 8) & (det != 0.0) & (den_r != 0.0) & (sse_u > 0)
        )
        .select(
            "cause",
            "effect",
            F.col("n").cast("long").alias("n_days"),
            det_round(fstat).alias("f_stat"),
            det_round((sse_r - sse_u) / sst).alias("delta_r2"),
        )
        .orderBy("cause", "effect")
    )


def ivm_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a JOIN-aggregate view:
    revenue-by-nation (lineitem ⋈ orders ⋈ customer ⋈ nation) is
    maintained as base view ⊕ delta increment, where the delta batch
    is the deterministic slice l_orderkey % 97 = 0. The delta is
    joined through the SAME dimension path and the two partial
    aggregates merge by full-outer key union — the classic
    delta-rule ΔV = ΔL ⋈ D algebra that makes a 100 TB view refresh
    cost O(|Δ|), not O(|L|). Extends `incremental_revenue_maintenance`
    (single-table agg IVM) to the join case; the oracle recomputes
    the view from scratch over the whole fact table, so the
    hash-match PROVES base ⊕ delta ≡ full recompute.

    Money exactness: both partials sum DECIMAL(18,4) (exact for
    price·(1−disc)) and stay DECIMAL through the merge; the cast to
    double happens once, after the final addition."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))

    def view(src: DataFrame) -> DataFrame:
        return (
            src.join(orders, src.l_orderkey == orders.o_orderkey)
            .join(customer, orders.o_custkey == customer.c_custkey)
            .join(
                F.broadcast(nation),
                customer.c_nationkey == nation.n_nationkey,
            )
            .groupBy("n_name")
            .agg(F.sum(rev.cast("decimal(18,4)")).alias("_rev"))
        )

    base = view(li.where(F.col("l_orderkey") % 97 != 0)).select(
        "n_name", F.col("_rev").alias("_base")
    )
    delta = view(li.where(F.col("l_orderkey") % 97 == 0)).select(
        "n_name", F.col("_rev").alias("_delta")
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        base.join(delta, "n_name", "full_outer")
        .select(
            "n_name",
            (
                F.coalesce(F.col("_base"), zero)
                + F.coalesce(F.col("_delta"), zero)
            )
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("n_name")
    )


def events_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift test per event type: the
    max ECDF gap D between the first- and second-half value
    distributions (same fixed split as `events_psi_drift`), plus the
    cent value where the gap peaks — the nonparametric member of the
    drift family (chi² needs bins, PSI needs both-sided bands; KS
    sees ANY distributional change at its most divergent point).

    Exactness: values land on the integer cent grid; ECDF
    comparison is done on the COMMON DENOMINATOR integer
    |cumA·nB − cumB·nA| (no doubles until the final division), the
    peak location ties break to the smallest value, and cumulative
    counts come from one window over the per-(type, cent) frame —
    bounded by the value domain, not the data. NULL ts is filtered
    explicitly on both engines (the CvM precedent, ADVICE r7):
    otherwise SUM's NULL-skip vs the oracle's CASE WHEN ELSE 1
    diverge on a NULL-ts row."""
    return ks_from_cells(halfsplit_value_cells(spark, sf_dir))


def halfsplit_value_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared (event_type, cent-value, first-half count,
    second-half count) frame the two-sample drift family tests on —
    KS / CvM / Anderson–Darling / Cliff's delta all reduce this one
    exact-integer cell table (same fixed 2024-01-16 split, NULL ts
    and NULL value filtered on both engines). The cell counts are a
    mergeable monoid, which is what lets the streaming twins
    maintain exactly this frame as aggregation state."""
    events = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    half = (F.col("ts") >= F.lit("2024-01-16")).cast("int")
    return events.groupBy(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("v"),
    ).agg(
        F.sum(F.lit(1) - half).alias("ca"),
        F.sum(half).alias("cb"),
    )


def ks_from_cells(cells: DataFrame) -> DataFrame:
    """Shared KS tail over an (event_type, v, ca, cb) exact-centi
    count frame — factored (the `cvm_from_cells` precedent) so the
    streaming twin reduces the same drained cell state."""
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("event_type")
    cum = cells.select(
        "event_type",
        "v",
        F.sum("ca").over(w_cum).alias("cuma"),
        F.sum("cb").over(w_cum).alias("cumb"),
        F.sum("ca").over(w_tot).alias("na"),
        F.sum("cb").over(w_tot).alias("nb"),
    ).select(
        "event_type",
        "v",
        "na",
        "nb",
        F.abs(
            F.col("cuma") * F.col("nb") - F.col("cumb") * F.col("na")
        ).alias("diff"),
    )
    return (
        cum.where((F.col("na") > 0) & (F.col("nb") > 0))
        .groupBy("event_type", "na", "nb")
        .agg(
            F.max("diff").alias("_d"),
            F.max_by("v", F.struct(F.col("diff"), (-F.col("v")).alias("_nv")))
            .alias("v_at_max"),
        )
        .select(
            "event_type",
            F.col("na").cast("long").alias("n_first"),
            F.col("nb").cast("long").alias("n_second"),
            det_round(
                F.col("_d").cast("double")
                / (F.col("na") * F.col("nb")).cast("double")
            ).alias("ks_d"),
            F.col("v_at_max").cast("long").alias("v_at_max"),
        )
        .orderBy("event_type")
    )


def events_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U rank-sum test: are purchase values
    stochastically larger than click values? U statistic with exact
    midrank tie handling plus the tie-corrected normal
    approximation z — the distribution-free alternative to
    `ab_test_purchase_value`'s t-style comparison.

    Exactness: values sit on the integer cent grid; midranks are
    kept DOUBLED (2·rank = 2·cum_before + tiecount + 1, an exact
    integer), so rank sums, U, and the tie-correction Σ(t³−t) are
    all DECIMAL(38,0)/HUGEINT integer sums; only the final
    z = (U − μ)/σ runs in fixed-operand-order doubles.

    Shape: one groupBy to the (group, cent) grain, one cumulative
    window over the merged value table, one 1-row aggregate."""
    events = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
        & F.col("event_type").isin("purchase", "click")
    )
    cells = events.groupBy(
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("v")
    ).agg(
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("c1"),
        F.sum((F.col("event_type") == "click").cast("long")).alias("c2"),
    )
    w_before = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    d38 = "decimal(38,0)"
    ranked = cells.select(
        "v",
        "c1",
        "c2",
        F.coalesce(
            F.sum(F.col("c1") + F.col("c2")).over(w_before), F.lit(0)
        ).alias("cb"),
        (F.col("c1") + F.col("c2")).alias("t"),
    )
    s = ranked.agg(
        F.sum(F.col("c1").cast(d38)).alias("n1"),
        F.sum(F.col("c2").cast(d38)).alias("n2"),
        F.sum(
            F.col("c1").cast(d38)
            * (F.lit(2) * F.col("cb") + F.col("t") + F.lit(1))
        ).alias("r1x2"),
        F.sum(
            F.col("t").cast(d38) * F.col("t") * F.col("t")
            - F.col("t").cast(d38)
        ).alias("ties"),
    )
    n1, n2 = F.col("n1").cast("double"), F.col("n2").cast("double")
    nn = n1 + n2
    u1 = (
        F.col("r1x2").cast("double") / F.lit(2.0)
        - n1 * (n1 + F.lit(1.0)) / F.lit(2.0)
    )
    mu = n1 * n2 / F.lit(2.0)
    sig2 = (
        n1 * n2 / F.lit(12.0)
        * (
            (nn + F.lit(1.0))
            - F.col("ties").cast("double") / (nn * (nn - F.lit(1.0)))
        )
    )
    return s.select(
        F.col("n1").cast("long").alias("n_purchase"),
        F.col("n2").cast("long").alias("n_click"),
        det_round(u1).alias("u_stat"),
        det_round((u1 - mu) / F.sqrt(sig2)).alias("z_score"),
    )


def events_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete periodogram of the mean-centered daily-value series
    per event type at candidate periods 2..14 days: spectral power
    P(p) = (Σx̃·cos)² + (Σx̃·sin)² normalized by n — the Fourier
    seasonality detector that complements `events_acf` (time-domain)
    and `events_stl_strength` (decomposition): a peak at p=7 IS the
    weekly rhythm.

    Exactness: the series is the `_daily_whole_units` integer grid,
    centered exactly as x̃ = n·x − Σx (still integer); each
    cos/sin product is floored onto a 1e-6 integer grid (phase
    angles are cos(2π·(t mod p)/p) of small-integer ratios — the
    grid absorbs libm ulp differences), so the two spectral sums
    are exact; the final power expression is fixed-order doubles
    normalized by n³ (two factors from centering, one from the
    periodogram convention)."""
    import math

    events = load_table(spark, sf_dir, "events")
    daily = _daily_whole_units(events).localCheckpoint(eager=True)
    w = Window.partitionBy("event_type")
    centered = daily.select(
        "event_type",
        "day",
        F.col("x"),
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.min("day").over(w).alias("d0"),
    ).select(
        "event_type",
        "n",
        (F.col("n") * F.col("x") - F.col("sx")).alias("xc"),
        F.datediff(F.col("day"), F.col("d0")).alias("t"),
    )
    periods = spark.range(2, 15).select(F.col("id").cast("int").alias("p"))
    ang = (
        F.lit(2.0)
        * F.lit(math.pi)
        * (F.col("t") % F.col("p")).cast("double")
        / F.col("p").cast("double")
    )
    d38 = "decimal(38,0)"
    terms = centered.crossJoin(F.broadcast(periods)).select(
        "event_type",
        "p",
        "n",
        F.floor(F.col("xc").cast("double") * F.cos(ang) * F.lit(1e6) + F.lit(0.5))
        .cast("long")
        .alias("tc"),
        F.floor(F.col("xc").cast("double") * F.sin(ang) * F.lit(1e6) + F.lit(0.5))
        .cast("long")
        .alias("ts_"),
    )
    s = terms.groupBy("event_type", "p").agg(
        F.first("n").alias("n"),
        F.sum(F.col("tc").cast(d38)).alias("cs"),
        F.sum(F.col("ts_").cast(d38)).alias("ss"),
    )
    nd = F.col("n").cast("double")
    cd = F.col("cs").cast("double") / F.lit(1e6)
    sd = F.col("ss").cast("double") / F.lit(1e6)
    return (
        s.where(F.col("n") >= 4)
        .select(
            "event_type",
            F.col("p").alias("period_days"),
            F.col("n").cast("long").alias("n_days"),
            det_round((cd * cd + sd * sd) / (nd * nd * nd)).alias("power"),
        )
        .orderBy("event_type", "period_days")
    )


def customer_decile_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer value-decile migration matrix: each customer's spend
    decile in the early period (orders before 1998-01-01) vs the
    late period, counting customers per (decile_before, decile_after)
    cell — the retention-marketing staple that shows whether top
    deciles churn or compound. Only customers active in BOTH periods
    enter the matrix (deciles are within-period ranks, so a single
    period suffices to place a customer in one axis only).

    Determinism: spend is an exact cent sum; NTILE(10) runs over the
    total order (spend DESC, custkey ASC), which both engines rank
    identically; the matrix is pure integer counts. Shape: one
    customer-grain aggregate per period, two 10-bucket window ranks
    over those small frames, one join on custkey."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    cut = F.col("o_orderdate") < F.lit("1998-01-01")

    def deciles(src: DataFrame, out: str) -> DataFrame:
        spend = src.groupBy("o_custkey").agg(F.sum(cents).alias("_sp"))
        w = Window.orderBy(F.desc("_sp"), F.asc("o_custkey"))
        return spend.select("o_custkey", F.ntile(10).over(w).alias(out))

    before = deciles(orders.where(cut), "decile_before")
    after = deciles(orders.where(~cut), "decile_after")
    return (
        before.join(after, "o_custkey")
        .groupBy("decile_before", "decile_after")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("decile_before", "decile_after")
    )


def part_abc_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC/XYZ inventory classification matrix: parts ranked by
    revenue share (A = first 80% of cumulative revenue, B = to 95%,
    C = rest) crossed with demand variability (monthly quantity
    CV: X < 0.5, Y < 1.0, Z otherwise) — the two-axis segmentation
    behind every stocking-policy review, extending
    `brand_revenue_pareto`'s single axis.

    Determinism: revenue is exact cents; the cumulative-share class
    compares INTEGERS (cum·100 vs total·80) so no ratio is ever
    floated; CV comes from exact DECIMAL(38,0) moments of monthly
    unit counts, classed by an integer-safe comparison
    (n·variance·4 vs mean² etc. — kept in doubles with one fixed
    operand order, identical both engines).

    Shape: two part-grain aggregates over lineitem (revenue; monthly
    quantities), one window over the part frame for the cumulative
    share, a 9-cell final rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    rev_cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    ).cast("long")
    rev = li.groupBy("l_partkey").agg(F.sum(rev_cents).alias("r"))
    w_cum = Window.orderBy(F.desc("r"), F.asc("l_partkey")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy()
    abc = rev.select(
        "l_partkey",
        F.sum("r").over(w_cum).alias("cum"),
        F.sum("r").over(w_all).alias("tot"),
    ).select(
        "l_partkey",
        F.when(F.col("cum") * 100 <= F.col("tot") * 80, F.lit("A"))
        .when(F.col("cum") * 100 <= F.col("tot") * 95, F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc_class"),
    )
    d38 = "decimal(38,0)"
    monthly = li.groupBy(
        "l_partkey", F.date_trunc("month", F.col("l_shipdate")).alias("_m")
    ).agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
    mo = monthly.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum(F.col("q").cast(d38)).alias("s"),
        F.sum(F.col("q").cast(d38) * F.col("q")).alias("ss"),
    )
    var_num = (F.col("n") * F.col("ss") - F.col("s") * F.col("s")).cast(
        "double"
    )
    mean2 = (F.col("s") * F.col("s")).cast("double")
    cv2 = var_num / mean2  # = (n·Σq² − (Σq)²) / (Σq)² = n²·var / (n·mean)²·... fixed-order
    xyz = mo.select(
        "l_partkey",
        F.when(cv2 < F.lit(0.25), F.lit("X"))
        .when(cv2 < F.lit(1.0), F.lit("Y"))
        .otherwise(F.lit("Z"))
        .alias("xyz_class"),
    )
    return (
        abc.join(xyz, "l_partkey")
        .groupBy("abc_class", "xyz_class")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .orderBy("abc_class", "xyz_class")
    )


def doc_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit for the corpus: vocabulary growth V(n) ≈ K·n^β
    estimated by log-log OLS over the cumulative (tokens seen,
    distinct tokens seen) trajectory sampled at every document
    boundary in doc_id order — the vocabulary-scaling twin of
    `doc_zipf_fit` (the two laws are duals), and the number that
    predicts how big the tokenizer's vocab must be at 100× the
    corpus.

    Cumulative-distinct without an iterative scan: a token's FIRST
    document (min doc_id) is where it increments the vocabulary, so
    new-vocab-per-doc is one aggregate and both cumulative series
    are windows over the doc-grain frame. Logs are floored onto the
    1e-9 integer grid per point; the OLS slope/intercept come from
    exact DECIMAL(38,0) moment sums (the `part_price_elasticity`
    machinery).

    Output one row: n_docs, beta (det-round), k (e^intercept,
    det-round), r2."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda x: x != "")
        ).alias("token"),
    )
    per_doc = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nt"))
    first_seen = (
        toks.groupBy("token")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("nv"))
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    traj = (
        per_doc.join(first_seen, "doc_id", "left")
        .select(
            "doc_id",
            F.sum("nt").over(w).alias("cn"),
            F.sum(F.coalesce(F.col("nv"), F.lit(0))).over(w).alias("cv"),
        )
        .where((F.col("cn") > 0) & (F.col("cv") > 0))
        .select(
            F.floor(
                F.log(F.col("cn").cast("double")) * F.lit(1e9) + F.lit(0.5)
            )
            .cast("long")
            .alias("lx"),
            F.floor(
                F.log(F.col("cv").cast("double")) * F.lit(1e9) + F.lit(0.5)
            )
            .cast("long")
            .alias("ly"),
        )
    )
    d38 = "decimal(38,0)"
    m = traj.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum(F.col("lx").cast(d38)).alias("sx"),
        F.sum(F.col("ly").cast(d38)).alias("sy"),
        F.sum(F.col("lx").cast(d38) * F.col("lx")).alias("sxx"),
        F.sum(F.col("ly").cast(d38) * F.col("ly")).alias("syy"),
        F.sum(F.col("lx").cast(d38) * F.col("ly")).alias("sxy"),
    )
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    beta = num / vx
    intercept = (
        F.col("sy").cast("double") / F.lit(1e9)
        - beta * (F.col("sx").cast("double") / F.lit(1e9))
    ) / F.col("n").cast("double")
    return m.where((vx > 0) & (vy > 0)).select(
        F.col("n").cast("long").alias("n_docs"),
        det_round(beta).alias("beta"),
        det_round(F.exp(intercept)).alias("k"),
        det_round(num / (F.sqrt(vx) * F.sqrt(vy)) * (num / (F.sqrt(vx) * F.sqrt(vy)))).alias("r2"),
    )


def orders_backlog_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog timeline: for every day on which the
    backlog changes, the number of orders placed but not yet fully
    shipped (an order closes the day AFTER its last lineitem ships)
    — the operations dashboard number whose slope is the
    order-intake vs fulfillment balance. Sweep-line at date grain,
    the order-lifecycle sibling of `peak_concurrency`'s second-grain
    user intervals.

    Each order contributes +1 at o_orderdate and −1 at
    max(l_shipdate)+1 day; the backlog is the running integer sum
    over the per-day delta frame (bounded by the calendar, not the
    data — the single-partition cumulative window is over ~2500
    rows at any corpus size). Orders with no lineitems are excluded
    (their close is undefined). Everything is exact integer
    arithmetic on dates and counts."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    closes = li.groupBy("l_orderkey").agg(
        F.date_add(F.max(F.col("l_shipdate").cast("date")), 1).alias("day")
    )
    opens = (
        orders.join(
            closes.select(F.col("l_orderkey").alias("o_orderkey")),
            "o_orderkey",
            "left_semi",
        )
        .select(F.col("o_orderdate").cast("date").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    closed = closes.groupBy("day").agg((-F.count(F.lit(1))).alias("d"))
    deltas = (
        opens.unionAll(closed).groupBy("day").agg(F.sum("d").alias("delta"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return deltas.select(
        F.col("day").cast("string").alias("day"),
        F.col("delta").cast("long").alias("delta"),
        F.sum("delta").over(w).cast("long").alias("open_orders"),
    ).orderBy("day")


def markov_holdout_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out evaluation of the first-order event-type Markov model:
    train transition probabilities on the first half of the time
    range (add-one smoothing over the K observed types), score the
    second half's transitions, report cross-entropy (nats) and
    perplexity — the train/test-split model-quality loop that turns
    `event_transitions` from a descriptive matrix into an evaluated
    predictor. Transitions never span the split boundary (each half
    sessionizes independently).

    Exactness: per (cur, next) cell the log-probability
    ln((c+1)/(N_cur+K)) is floored ONCE onto the 1e-9 grid and
    multiplied by the exact integer test count, so the total
    log-likelihood is an exact DECIMAL sum; unseen rows fall back to
    the smoothed floor via coalesce. Only the final exp(−LL/N) is a
    fixed-order double. Shape: two user-windowed passes (one per
    half) to K² count matrices, then arithmetic on ≤K² rows."""
    events = load_table(spark, sf_dir, "events")
    cut = F.col("ts") < F.lit("2024-01-16")

    def transitions(src: DataFrame) -> DataFrame:
        by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
        return (
            src.select(
                "user_id",
                "ts",
                "event_id",
                F.col("event_type").alias("cur"),
                F.lead("event_type").over(by_user).alias("nxt"),
            )
            .where(F.col("nxt").isNotNull())
            .groupBy("cur", "nxt")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    train = transitions(events.where(cut)).localCheckpoint(eager=True)
    test = transitions(events.where(~cut))
    k = events.select("event_type").distinct().agg(
        F.count(F.lit(1)).alias("k")
    )
    ncur = train.groupBy("cur").agg(F.sum("c").alias("ncur"))
    joined = (
        test.withColumnRenamed("c", "tc")
        .join(train, ["cur", "nxt"], "left")
        .join(ncur, "cur", "left")
        .crossJoin(F.broadcast(k))
    )
    logp = F.floor(
        F.log(
            (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1)).cast("double")
            / (F.coalesce(F.col("ncur"), F.lit(0)) + F.col("k")).cast("double")
        )
        * F.lit(1e9)
        + F.lit(0.5)
    ).cast("long")
    d38 = "decimal(38,0)"
    s = joined.agg(
        F.sum(F.col("tc").cast(d38)).alias("n_test"),
        F.sum(F.col("tc").cast(d38) * logp).alias("ll"),
    ).crossJoin(F.broadcast(train.agg(F.sum("c").alias("n_train"))))
    ce = -(
        F.col("ll").cast("double")
        / F.lit(1e9)
        / F.col("n_test").cast("double")
    )
    return s.select(
        F.col("n_train").cast("long").alias("n_train"),
        F.col("n_test").cast("long").alias("n_test"),
        det_round(ce).alias("cross_entropy"),
        det_round(F.exp(ce)).alias("perplexity"),
    )


def events_poisson_glm(
    spark: SparkSession, sf_dir: str, iters: int = 3
) -> DataFrame:
    """Poisson GLM with log link for the hourly event-rate profile:
    count(day, hour) ~ Poisson(exp(β₀ + β₁·sin(2πh/24) +
    β₂·cos(2πh/24))), fit by `iters` fixed IRLS rounds — the
    canonical rate-model regression (a linear model would happily
    predict negative counts at 3am), reported as the fitted
    coefficients plus the implied diurnal amplitude and peak hour.
    Zero-count (day, hour) cells are materialized into the design
    (dropping them biases the rate upward — the classic silent GLM
    mistake).

    Cross-engine reproducible training, the `train_ivf_centroids`
    contract applied to IRLS: every weighted moment is floored
    per-row onto a 1e-6 integer grid before the exact sum (the grid
    absorbs last-ulp libm sin/exp differences), the 3×3 weighted
    normal equations solve by the textually-mirrored Cramer rule,
    and each round's β is quantized to the 1e-9 grid so the next
    round's η is bit-identical in both engines. The DuckDB oracle
    unrolls the same `iters` rounds as CTEs.

    Scale shape: the design matrix never materializes — each round
    is ONE map-side-combined aggregate over the (days×24) frame
    producing nine integers; the driver sees only the 3-scalar β per
    round (the k-means codebook analogue). At 100 TB the hourly
    frame is still calendar-sized."""
    import math

    events = load_table(spark, sf_dir, "events")
    days = events.select(F.col("ts").cast("date").alias("day")).distinct()
    hours = spark.range(0, 24).select(F.col("id").cast("int").alias("h"))
    counts = events.groupBy(
        F.col("ts").cast("date").alias("day"), F.hour("ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("y"))
    hd = F.col("h").cast("double")
    two_pi = 2.0 * math.pi
    sc = (
        days.crossJoin(F.broadcast(hours))
        .join(counts, ["day", "h"], "left")
        .select(
            F.coalesce(F.col("y"), F.lit(0)).cast("long").alias("y"),
            F.sin(F.lit(two_pi) * hd / F.lit(24.0)).alias("s"),
            F.cos(F.lit(two_pi) * hd / F.lit(24.0)).alias("c"),
        )
        .localCheckpoint(eager=True)
    )
    tot = sc.agg(F.sum("y").alias("sy"), F.count(F.lit(1)).alias("n")).collect()[0]
    n_obs = int(tot["n"])
    b0 = math.floor(math.log(tot["sy"] / tot["n"]) * 1e9 + 0.5) / 1e9
    b1 = b2 = 0.0
    d38 = "decimal(38,0)"

    def q(col):
        return F.floor(col * F.lit(1e6) + F.lit(0.5)).cast("long").cast(d38)

    for _ in range(iters):
        eta = F.lit(b0) + F.lit(b1) * F.col("s") + F.lit(b2) * F.col("c")
        mu = F.exp(eta)
        wz = mu * eta + F.col("y").cast("double") - mu
        r = sc.agg(
            F.sum(q(mu)).alias("ma"),
            F.sum(q(mu * F.col("s"))).alias("mb"),
            F.sum(q(mu * F.col("c"))).alias("mc"),
            F.sum(q(mu * F.col("s") * F.col("s"))).alias("md"),
            F.sum(q(mu * F.col("s") * F.col("c"))).alias("me"),
            F.sum(q(mu * F.col("c") * F.col("c"))).alias("mf"),
            F.sum(q(wz)).alias("mg"),
            F.sum(q(wz * F.col("s"))).alias("mh"),
            F.sum(q(wz * F.col("c"))).alias("mi"),
        ).collect()[0]
        a, b, c_ = float(r["ma"]), float(r["mb"]), float(r["mc"])
        d, e, f = float(r["md"]), float(r["me"]), float(r["mf"])
        g, h, i = float(r["mg"]), float(r["mh"]), float(r["mi"])
        det = a * (d * f - e * e) - b * (b * f - e * c_) + c_ * (b * e - d * c_)
        det0 = g * (d * f - e * e) - b * (h * f - e * i) + c_ * (h * e - d * i)
        det1 = a * (h * f - e * i) - g * (b * f - e * c_) + c_ * (b * i - h * c_)
        det2 = a * (d * i - h * e) - b * (b * i - h * c_) + g * (b * e - d * c_)
        b0 = math.floor(det0 / det * 1e9 + 0.5) / 1e9
        b1 = math.floor(det1 / det * 1e9 + 0.5) / 1e9
        b2 = math.floor(det2 / det * 1e9 + 0.5) / 1e9

    amp = math.sqrt(b1 * b1 + b2 * b2)
    peak = math.atan2(b1, b2) * 24.0 / (2.0 * math.pi)
    peak_hour = peak + 24.0 if peak < 0 else peak

    def r6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    return spark.createDataFrame(
        [
            (
                n_obs,
                r6(b0),
                r6(b1),
                r6(b2),
                r6(amp),
                r6(peak_hour),
            )
        ],
        "n_obs bigint, intercept double, beta_sin double, beta_cos double,"
        " amplitude double, peak_hour double",
    )


def customer_part_als(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-2 ALS matrix factorization of the customer×part quantity
    matrix (operators/linalg.py:als_factorize — fully-distributed
    alternating ridge solves on the 1e-6 grid, md5-seeded item
    factors, 2 rounds), reported as the training-fit summary: matrix
    shape, rating count, and train RMSE — the collaborative-filtering
    baseline every recommender evaluation starts from.

    RMSE exactness: per-rating squared error is floored onto the
    1e-6 grid and summed exactly; one fixed-order sqrt at the end.
    The oracle unrolls the identical init + 4 solve steps in SQL."""
    from stream_processing_system_spark.operators.linalg import als_factorize

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ratings = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part")
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("r"))
        .localCheckpoint(eager=True)
    )
    u, v = als_factorize(ratings, "cust", "part", "r", rounds=2, reg=0.1)
    j = ratings.join(u, "cust").join(v, "part")
    rd = F.col("r").cast("double")
    e = rd - (F.col("u1") * F.col("v1") + F.col("u2") * F.col("v2"))
    term = F.floor(e * e * F.lit(1e6) + F.lit(0.5)).cast("long")
    d38 = "decimal(38,0)"
    s = j.agg(
        F.count(F.lit(1)).alias("n_ratings"),
        F.sum(term.cast(d38)).alias("se"),
        F.countDistinct("cust").alias("n_users"),
        F.countDistinct("part").alias("n_items"),
    )
    rmse = F.sqrt(
        F.col("se").cast("double")
        / F.lit(1e6)
        / F.col("n_ratings").cast("double")
    )
    return s.select(
        F.col("n_users").cast("long").alias("n_users"),
        F.col("n_items").cast("long").alias("n_items"),
        F.col("n_ratings").cast("long").alias("n_ratings"),
        det_round(rmse).alias("train_rmse"),
    )


def events_kde_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaussian kernel density estimate of the value distribution per
    event type, evaluated on a fixed grid (0..600 step 10, bandwidth
    20) — the smooth-histogram view that exposes multimodality the
    width-bucketed `events_value_histogram` quantizes away.

    Exactness: each kernel contribution
    exp(−½u²)/(h·√2π), u=(x−v)/h is floored onto a 1e-9 integer grid
    per (row, grid point) — the nano-grid absorbs libm exp ulp
    differences — and the per-(type, x) density is the exact integer
    sum divided by n (count(*) per cell IS n_type, since every row
    fans out to every grid point). Shape: one broadcast fan-out
    (61×) over the filtered scan plus one combine-enabled groupBy —
    at 100 TB the fan-out constant is the only cost multiplier."""
    import math

    events = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    grid = spark.range(0, 61).select((F.col("id") * 10).cast("int").alias("x"))
    h = 20.0
    u = (F.col("x").cast("double") - F.col("value")) / F.lit(h)
    term = F.exp(F.lit(-0.5) * u * u) / (
        F.lit(h) * F.sqrt(F.lit(2.0) * F.lit(math.pi))
    )
    cells = events.crossJoin(F.broadcast(grid)).select(
        "event_type",
        "x",
        F.floor(term * F.lit(1e9) + F.lit(0.5)).cast("long").alias("t"),
    )
    d38 = "decimal(38,0)"
    return (
        cells.groupBy("event_type", "x")
        .agg(F.sum(F.col("t").cast(d38)).alias("s"), F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            "x",
            det_round(
                F.col("s").cast("double") / F.lit(1e9) / F.col("n").cast("double")
            ).alias("density"),
        )
        .orderBy("event_type", "x")
    )


#: Key columns audited for join-skew: (table, key column).
_SKEW_KEYS = [
    ("lineitem", "l_orderkey"),
    ("lineitem", "l_partkey"),
    ("lineitem", "l_suppkey"),
    ("orders", "o_custkey"),
    ("events", "user_id"),
]


def join_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew pre-flight over every hot join key in the schema:
    rows, distinct keys, the heaviest key and its count, and the
    skew ratio max/mean — the diagnostic that decides between a
    plain shuffle join, AQE skew splitting, and the salting of
    `operators/skew.py` BEFORE a 100 TB job discovers its straggler
    at hour three. Exact integer counts; the two ratios are
    fixed-order doubles.

    Shape per key: one combine-enabled count aggregate + one 1-row
    argmax — nothing wider than (key, count) ever shuffles."""
    frames = []
    for table, key in _SKEW_KEYS:
        counts = (
            load_table(spark, sf_dir, table)
            .groupBy(F.col(key).alias("_k"))
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        s = counts.agg(
            F.sum("_c").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("_c").alias("max_count"),
            F.max_by("_k", F.struct(F.col("_c"), (-F.col("_k")).alias("_n")))
            .alias("top_key"),
        )
        frames.append(
            s.select(
                F.lit(f"{table}.{key}").alias("join_key"),
                F.col("n_rows").cast("long").alias("n_rows"),
                F.col("n_keys").cast("long").alias("n_keys"),
                F.col("max_count").cast("long").alias("max_count"),
                F.col("top_key").cast("long").alias("top_key"),
                det_round(
                    F.col("max_count").cast("double")
                    / (
                        F.col("n_rows").cast("double")
                        / F.col("n_keys").cast("double")
                    )
                ).alias("skew_ratio"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out.orderBy("join_key")


def part_triple_itemsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-itemsets over order baskets by the A-priori
    candidate-pruning round: only triples whose THREE constituent
    pairs are each frequent (support ≥ 5) are counted, then kept at
    triple support ≥ 3 — extending `part_association_rules`' pair
    mining one lattice level up, with the pruning that makes level-3
    feasible at scale (the candidate space shrinks from |parts|³ to
    the join of the frequent-pair list with itself).

    Exact integer supports throughout; top-50 by (support DESC,
    p1, p2, p3). Shape: the basket self-joins stay quadratic/cubic
    only within a basket, and every candidate check is an equi-join
    against the (small) frequent-pair frame."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint(eager=True)
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p1"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p2"))
    c = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p3"))
    fpairs = (
        a.join(b, "ok")
        .where(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= 5)
        .select("p1", "p2")
        .localCheckpoint(eager=True)
    )
    triples = (
        a.join(b, "ok")
        .where(F.col("p1") < F.col("p2"))
        .join(fpairs, ["p1", "p2"], "left_semi")
        .join(c, "ok")
        .where(F.col("p2") < F.col("p3"))
        .join(
            fpairs.select(F.col("p1"), F.col("p2").alias("p3")),
            ["p1", "p3"],
            "left_semi",
        )
        .join(
            fpairs.select(F.col("p1").alias("p2"), F.col("p2").alias("p3")),
            ["p2", "p3"],
            "left_semi",
        )
        .groupBy("p1", "p2", "p3")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= 3)
    )
    return (
        triples.orderBy(F.desc("support"), "p1", "p2", "p3")
        .limit(50)
        .select("p1", "p2", "p3", F.col("support").cast("long").alias("support"))
    )


def part_demand_croston(
    spark: SparkSession, sf_dir: str, alpha: float = 0.2
) -> DataFrame:
    """Croston's method for intermittent demand, per brand: separate
    EWMAs over the NONZERO monthly demand sizes and over the
    inter-demand intervals, forecast = size/interval — the standard
    spare-parts forecaster (a plain EWMA over a zero-heavy series
    chronically under-forecasts; Croston models "how much" and "how
    often" separately). Complements `part_abc_xyz`'s variability
    classes with an actual per-brand rate forecast.

    Exactness: EWMAs unroll to the closed weighted form
    (1−α)^(K−1)·x₁ + Σ α(1−α)^(K−i)·xᵢ; each weighted term is
    floored onto a 1e-6 integer grid (power() ulps absorbed) and
    summed exactly; the final ratio is one fixed-order double.
    Intervals use gaps between consecutive demand months (brands
    need ≥ 2 demand months). Shape: one month-grain aggregate, two
    small per-brand windows over ~80-row series, one groupBy."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    monthly = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            "p_brand",
            F.date_trunc("month", F.col("l_shipdate")).alias("m"),
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
    )
    w_m = Window.partitionBy("p_brand").orderBy("m")
    indexed = monthly.select(
        "p_brand", "q", F.row_number().over(w_m).alias("rn")
    ).where(F.col("q") > 0)
    w_d = Window.partitionBy("p_brand").orderBy("rn")
    w_all = Window.partitionBy("p_brand")
    demands = indexed.select(
        "p_brand",
        "q",
        "rn",
        F.row_number().over(w_d).alias("k"),
        F.count(F.lit(1)).over(w_all).alias("kk"),
        (F.col("rn") - F.lag("rn").over(w_d)).alias("gap"),
    )
    a = float(alpha)
    om = 1.0 - a
    size_w = F.when(
        F.col("k") == 1, F.pow(F.lit(om), F.col("kk") - 1)
    ).otherwise(F.lit(a) * F.pow(F.lit(om), F.col("kk") - F.col("k")))
    size_t = F.floor(
        F.col("q").cast("double") * size_w * F.lit(1e6) + F.lit(0.5)
    ).cast("long")
    # interval series: gaps at k=2..K, re-indexed j=k-1 of K-1 terms
    int_w = F.when(
        F.col("k") == 2, F.pow(F.lit(om), F.col("kk") - 2)
    ).otherwise(F.lit(a) * F.pow(F.lit(om), F.col("kk") - F.col("k")))
    int_t = F.when(
        F.col("k") >= 2,
        F.floor(
            F.col("gap").cast("double") * int_w * F.lit(1e6) + F.lit(0.5)
        ).cast("long"),
    )
    d38 = "decimal(38,0)"
    s = demands.groupBy("p_brand").agg(
        F.max("kk").alias("n_demands"),
        F.sum(size_t.cast(d38)).alias("sz"),
        F.sum(int_t.cast(d38)).alias("iv"),
    )
    szd = F.col("sz").cast("double") / F.lit(1e6)
    ivd = F.col("iv").cast("double") / F.lit(1e6)
    return (
        s.where(F.col("n_demands") >= 2)
        .select(
            "p_brand",
            F.col("n_demands").cast("long").alias("n_demand_months"),
            det_round(szd).alias("size_ewma"),
            det_round(ivd).alias("interval_ewma"),
            det_round(szd / ivd).alias("croston_forecast"),
        )
        .orderBy("p_brand")
    )


def events_binseg_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single change-point detection by binary segmentation on the
    daily-value series per event type: the split day maximizing the
    between-segment sum of squares s₁²/n₁ + s₂²/n₂ − S²/n — the
    offline complement to the sequential `events_cusum_changepoint`
    (binseg finds WHERE the level shifted; CUSUM detects THAT it is
    shifting). Reports the best split with both segment means.

    Exactness: the series is the `_daily_whole_units` integer grid;
    prefix sums are exact via one cumulative window; the gain is a
    fixed-order double per candidate split, identical in both
    engines, so the argmax (gain DESC, day ASC) agrees. Shape: one
    day-grain aggregate + one window over the tiny daily frame."""
    events = load_table(spark, sf_dir, "events")
    daily = _daily_whole_units(events)
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("event_type")
    pre = daily.select(
        "event_type",
        "day",
        F.sum("x").over(w_cum).alias("s1"),
        F.count(F.lit(1)).over(w_cum).alias("n1"),
        F.sum("x").over(w_all).alias("s"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    ).where(F.col("n1") < F.col("n"))
    s1, n1 = F.col("s1").cast("double"), F.col("n1").cast("double")
    s, n = F.col("s").cast("double"), F.col("n").cast("double")
    s2, n2 = s - s1, n - n1
    gain = s1 * s1 / n1 + s2 * s2 / n2 - s * s / n
    w_pick = Window.partitionBy("event_type").orderBy(
        F.desc("gain"), F.asc("split_day")
    )
    return (
        pre.select(
            "event_type",
            F.col("day").cast("string").alias("split_day"),
            gain.alias("gain"),
            (s1 / n1).alias("_ml"),
            (s2 / n2).alias("_mr"),
        )
        .withColumn("_rn", F.row_number().over(w_pick))
        .where(F.col("_rn") == 1)
        .select(
            "event_type",
            "split_day",
            det_round(F.col("gain")).alias("gain"),
            det_round(F.col("_ml")).alias("mean_before"),
            det_round(F.col("_mr")).alias("mean_after"),
        )
        .orderBy("event_type")
    )


def orders_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment screen: pairs of orders from the SAME
    customer with the SAME cent-exact total within 7 days of each
    other — the accounts-payable audit classic. Blocked equi-join on
    (customer, amount), so the quadratic blowup is bounded by
    per-(customer, amount) multiplicity, never the order count; the
    date predicate then prunes within blocks. Exact integer cents
    and day arithmetic throughout."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_custkey",
        F.col("o_orderkey").alias("ok"),
        F.col("o_orderdate").cast("date").alias("od"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    a = base.select(
        "o_custkey",
        "cents",
        F.col("ok").alias("order_a"),
        F.col("od").alias("da"),
    )
    b = base.select(
        "o_custkey",
        "cents",
        F.col("ok").alias("order_b"),
        F.col("od").alias("db"),
    )
    gap = F.abs(F.datediff(F.col("db"), F.col("da")))
    return (
        a.join(b, ["o_custkey", "cents"])
        .where(F.col("order_a") < F.col("order_b"))
        .where(gap <= 7)
        .select(
            "o_custkey",
            "order_a",
            "order_b",
            (F.col("cents").cast("double") / F.lit(100.0)).alias("amount"),
            gap.cast("long").alias("days_apart"),
        )
        .orderBy("o_custkey", "order_a", "order_b")
    )


#: Inverse-CDF thresholds for Poisson(1), written as identical double
#: literals in both engines (cumulative e⁻¹·Σ 1/k!).
_POIS1_CDF = [
    0.367879441171,
    0.735758882343,
    0.919698602929,
    0.980988124791,
    0.996300510256,
    0.999367557201,
]


def revenue_poisson_bootstrap_ci(
    spark: SparkSession, sf_dir: str, n_boot: int = 40
) -> DataFrame:
    """Poisson-bootstrap confidence interval for mean daily revenue:
    each of `n_boot` replicates re-weights every day by an
    independent Poisson(1) draw (the multinomial-bootstrap
    approximation that needs NO global resampling pass — the
    standard way to bootstrap at data-parallel scale, since each
    row's weight is a pure function of (row, replicate)), and the
    CI is the 2nd-smallest / 2nd-largest replicate mean (≈2.5%/97.5%
    at the default 40).

    Determinism: weights come from md5-derived uniforms pushed
    through a fixed literal Poisson(1) inverse-CDF table
    (`_POIS1_CDF` — same literals in the oracle), replicate means
    are exact-integer cent sums divided once, and the rank pick is a
    total order (mean, replicate id). Shape: one day-grain
    aggregate, a broadcast ×B fan-out of THAT frame (never the fact
    table), one groupBy per replicate."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("cents")
    )
    reps = spark.range(1, n_boot + 1).select(
        F.col("id").cast("int").alias("b")
    )
    from stream_processing_system_spark.functions.scalar import (
        md5_prefix_long,
    )

    key = F.concat(
        F.col("day").cast("string"), F.lit("|"), F.col("b").cast("string")
    )
    uni = (
        (md5_prefix_long(key, salt="boot|") % F.lit(1_000_000)).cast("double")
        / F.lit(1e6)
    )
    w = F.when(uni < F.lit(_POIS1_CDF[0]), 0)
    for i in range(1, 6):
        w = w.when(uni < F.lit(_POIS1_CDF[i]), i)
    w = w.otherwise(6).cast("long")
    cells = daily.crossJoin(F.broadcast(reps)).select(
        "b", "cents", w.alias("w")
    )
    means = (
        cells.groupBy("b")
        .agg(
            F.sum(F.col("w") * F.col("cents")).alias("ws"),
            F.sum("w").alias("ww"),
        )
        .where(F.col("ww") > 0)
        .select(
            "b",
            (
                F.col("ws").cast("double")
                / F.col("ww").cast("double")
                / F.lit(100.0)
            ).alias("m"),
        )
    )
    w_rank = Window.orderBy(F.asc("m"), F.asc("b"))
    ranked = means.select(
        "m", F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("nb"),
    )
    full = daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("cents").alias("tot"),
    )
    picks = ranked.where(
        (F.col("rn") == 2) | (F.col("rn") == F.col("nb") - 1)
    ).agg(F.min("m").alias("lo"), F.max("m").alias("hi"))
    return full.crossJoin(F.broadcast(picks)).select(
        F.col("n_days").cast("long").alias("n_days"),
        F.lit(n_boot).cast("long").alias("n_boot"),
        det_round(
            F.col("tot").cast("double")
            / F.col("n_days").cast("double")
            / F.lit(100.0)
        ).alias("mean_daily_revenue"),
        det_round(F.col("lo")).alias("ci_lo"),
        det_round(F.col("hi")).alias("ci_hi"),
    )


def doc_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: characters per token and
    tokens per 100 characters over the corpus — the budgeting number
    that converts a byte-sized crawl into a token-sized training
    plan, per language because fertility varies wildly across
    scripts. Exact integer char/token totals; two fixed-order
    ratios."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != ""))
    s = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text").cast("long")).alias("chars"),
        F.sum(toks.cast("long")).alias("tokens"),
    )
    return (
        s.where(F.col("tokens") > 0)
        .select(
            "lang",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("chars").cast("long").alias("n_chars"),
            F.col("tokens").cast("long").alias("n_tokens"),
            det_round(
                F.col("chars").cast("double") / F.col("tokens").cast("double")
            ).alias("chars_per_token"),
            det_round(
                F.col("tokens").cast("double")
                / F.col("chars").cast("double")
                * F.lit(100.0)
            ).alias("tokens_per_100_chars"),
        )
        .orderBy("lang")
    )


def supplier_delivery_otif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-time delivery rate per supplier: share of line items shipped
    within 90 days of the order date — the supplier scorecard KPI.
    One fact-dimension join, exact integer counts, one ratio."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    on_time = (
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        )
        <= 90
    ).cast("long")
    s = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(on_time).alias("n_on_time"),
        )
    )
    return s.select(
        "l_suppkey",
        F.col("n_items").cast("long").alias("n_items"),
        F.col("n_on_time").cast("long").alias("n_on_time"),
        det_round(
            F.col("n_on_time").cast("double") / F.col("n_items").cast("double")
        ).alias("on_time_rate"),
    ).orderBy("l_suppkey")


def revenue_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval for daily revenue under a
    seasonal-naive forecaster (ŷ = revenue 7 days earlier): the
    calibration half's absolute residuals give the distribution-free
    90% band q̂ = ⌈0.9(n+1)⌉-th smallest |y−ŷ|, then the held-out
    half reports EMPIRICAL coverage — the modern uncertainty wrapper
    that needs no model internals and (unlike `events_gapfill_decay`
    style point forecasts) comes with a finite-sample guarantee.

    Exactness: revenues and residuals are integer cents; q̂ is an
    exact order statistic (row_number over (residual, day)); coverage
    is a ratio of exact counts. Shape: one day-grain aggregate, a
    7-day self-join of that tiny frame, one window over calibration
    residuals."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("y")
    ).localCheckpoint(eager=True)
    lagged = daily.select(
        F.date_add("day", 7).alias("day"), F.col("y").alias("yhat")
    )
    paired = daily.join(lagged, "day").select(
        "day", F.abs(F.col("y") - F.col("yhat")).alias("r")
    )
    cut = F.col("day") < F.lit("1999-01-01").cast("date")
    cal = paired.where(cut)
    test = paired.where(~cut)
    w = Window.orderBy("r", "day")
    n_cal = cal.agg(F.count(F.lit(1)).alias("n_cal"))
    ranked = cal.select("r", F.row_number().over(w).alias("rn")).crossJoin(
        F.broadcast(n_cal)
    )
    # k = ceil(0.9 * (n_cal + 1)), capped at n_cal
    k = F.least(
        F.ceil(F.lit(0.9) * (F.col("n_cal") + 1).cast("double")).cast("long"),
        F.col("n_cal"),
    )
    qhat = ranked.where(F.col("rn") == k).select(F.col("r").alias("q"))
    cov = (
        test.crossJoin(F.broadcast(qhat))
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum((F.col("r") <= F.col("q")).cast("long")).alias("n_in"),
            F.first("q").alias("q"),
        )
    )
    return cov.crossJoin(F.broadcast(n_cal)).select(
        F.col("n_cal").cast("long").alias("n_cal"),
        F.col("n_test").cast("long").alias("n_test"),
        (F.col("q").cast("double") / F.lit(100.0)).alias("q_hat"),
        det_round(
            F.col("n_in").cast("double") / F.col("n_test").cast("double")
        ).alias("coverage"),
    )


def feature_standardize_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-guarded feature standardization audit: z-scaling
    parameters (mean, std) are fit on the TRAIN half only
    (shipdate < 1999-01-01) and applied to the TEST half; the test
    half's standardized mean and std quantify the distribution shift
    a leaky whole-data scaler would have hidden — the
    feature-engineering hygiene check for any learned pipeline.
    Features: quantity, centi-discount, cent price.

    Exactness: per-feature moments are exact DECIMAL(38,0)/HUGEINT
    sums in ORIGINAL integer units; means/stds and the two z-stats
    are fixed-order doubles mirrored textually."""
    li = load_table(spark, sf_dir, "lineitem")
    feats = [
        ("quantity", F.col("l_quantity").cast("long")),
        (
            "discount_centi",
            F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long"),
        ),
        (
            "price_cents",
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long"),
        ),
    ]
    is_train = (
        F.col("l_shipdate").cast("date") < F.lit("1999-01-01").cast("date")
    ).cast("int")
    d38 = "decimal(38,0)"
    frames = []
    for name, x in feats:
        base = li.select(x.alias("x"), is_train.alias("tr"))
        m = base.agg(
            F.sum(F.col("tr").cast(d38)).alias("n1"),
            F.sum((F.col("tr") * F.col("x")).cast(d38)).alias("s1"),
            F.sum(
                F.col("tr").cast(d38) * F.col("x").cast(d38) * F.col("x")
            ).alias("ss1"),
            F.sum((1 - F.col("tr")).cast(d38)).alias("n2"),
            F.sum(((1 - F.col("tr")) * F.col("x")).cast(d38)).alias("s2"),
            F.sum(
                (1 - F.col("tr")).cast(d38)
                * F.col("x").cast(d38)
                * F.col("x")
            ).alias("ss2"),
        )
        n1, s1, ss1 = (
            F.col("n1").cast("double"),
            F.col("s1").cast("double"),
            F.col("ss1").cast("double"),
        )
        n2, s2, ss2 = (
            F.col("n2").cast("double"),
            F.col("s2").cast("double"),
            F.col("ss2").cast("double"),
        )
        mean1 = s1 / n1
        std1 = F.sqrt((n1 * ss1 - s1 * s1) / (n1 * n1))
        mean2 = s2 / n2
        std2 = F.sqrt((n2 * ss2 - s2 * s2) / (n2 * n2))
        frames.append(
            m.select(
                F.lit(name).alias("feature"),
                det_round(mean1).alias("train_mean"),
                det_round(std1).alias("train_std"),
                det_round((mean2 - mean1) / std1).alias("test_mean_z"),
                det_round(std2 / std1).alias("test_std_z"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out.orderBy("feature")


def _logit_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared logistic design: y = (returnflag == 'R'),
    x1 = quantity, x2 = centi-discount — all exact longs, checkpointed
    so the IRLS rounds re-scan a materialized frame instead of
    re-deriving the scan each round."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        (F.col("l_returnflag") == "R").cast("long").alias("y"),
        F.col("l_quantity").cast("long").alias("x1"),
        F.floor(F.col("l_discount") * 100 + F.lit(0.5))
        .cast("long")
        .alias("x2"),
    ).localCheckpoint(eager=True)


def _logit_irls_betas(
    base: DataFrame, iters: int = 3
) -> tuple[float, float, float, int]:
    """IRLS training loop shared by `lineitem_logit_return` and
    `lineitem_calibration_curve`: per-row weighted moments floored
    onto a 1e-6 grid before exact DECIMAL(38,0) summation, a
    textually-mirrored Cramer solve on the driver (nine scalar
    moments per round — the only driver traffic), and β re-quantized
    to the 1e-9 grid between rounds so the oracle's unrolled CTE
    chain sees the identical coefficients. Returns (b0, b1, b2,
    n_rows)."""
    import math

    tot = base.agg(
        F.sum("y").alias("sy"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    n_rows = int(tot["n"])
    p0 = tot["sy"] / tot["n"]
    b0 = math.floor(math.log(p0 / (1.0 - p0)) * 1e9 + 0.5) / 1e9
    b1 = b2 = 0.0
    d38 = "decimal(38,0)"

    def q(col):
        return F.floor(col * F.lit(1e6) + F.lit(0.5)).cast("long").cast(d38)

    for _ in range(iters):
        eta = (
            F.lit(b0)
            + F.lit(b1) * F.col("x1").cast("double")
            + F.lit(b2) * F.col("x2").cast("double")
        )
        mu = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
        w = mu * (F.lit(1.0) - mu)
        wz = w * eta + (F.col("y").cast("double") - mu)
        x1d, x2d = F.col("x1").cast("double"), F.col("x2").cast("double")
        r = base.agg(
            F.sum(q(w)).alias("ma"),
            F.sum(q(w * x1d)).alias("mb"),
            F.sum(q(w * x2d)).alias("mc"),
            F.sum(q(w * x1d * x1d)).alias("md"),
            F.sum(q(w * x1d * x2d)).alias("me"),
            F.sum(q(w * x2d * x2d)).alias("mf"),
            F.sum(q(wz)).alias("mg"),
            F.sum(q(wz * x1d)).alias("mh"),
            F.sum(q(wz * x2d)).alias("mi"),
        ).collect()[0]
        a, b, c_ = float(r["ma"]), float(r["mb"]), float(r["mc"])
        d, e, f = float(r["md"]), float(r["me"]), float(r["mf"])
        g, h, i = float(r["mg"]), float(r["mh"]), float(r["mi"])
        det = a * (d * f - e * e) - b * (b * f - e * c_) + c_ * (b * e - d * c_)
        det0 = g * (d * f - e * e) - b * (h * f - e * i) + c_ * (h * e - d * i)
        det1 = a * (h * f - e * i) - g * (b * f - e * c_) + c_ * (b * i - h * c_)
        det2 = a * (d * i - h * e) - b * (b * i - h * c_) + g * (b * e - d * c_)
        b0 = math.floor(det0 / det * 1e9 + 0.5) / 1e9
        b1 = math.floor(det1 / det * 1e9 + 0.5) / 1e9
        b2 = math.floor(det2 / det * 1e9 + 0.5) / 1e9
    return b0, b1, b2, n_rows


def lineitem_logit_return(
    spark: SparkSession, sf_dir: str, iters: int = 3
) -> DataFrame:
    """Logistic regression by IRLS: P(l_returnflag = 'R') as a
    function of (quantity, centi-discount) — the canonical binary
    classifier, trained with the same cross-engine-reproducible
    IRLS contract as `events_poisson_glm` (per-row weighted moments
    floored onto a 1e-6 grid before exact summation, textually
    mirrored Cramer solve, β re-quantized to the 1e-9 grid between
    rounds), and evaluated in-train with accuracy at 0.5 AND the
    rank-based AUC (exact midrank Mann–Whitney over the finite
    score grid — the `events_mannwhitney_u` device pointed at
    classifier scores).

    Shape: the design is only ever touched by one aggregate per
    round (nine grid integers out) plus one score-grain groupBy for
    the metrics — scores take ≤ |quantity|×|discount| distinct
    values, so the AUC ranking runs over a few hundred rows."""
    import math

    base = _logit_base(spark, sf_dir)
    b0, b1, b2, n_rows = _logit_irls_betas(base, iters)
    d38 = "decimal(38,0)"

    # in-train metrics on the finite score grid
    eta = (
        F.lit(b0)
        + F.lit(b1) * F.col("x1").cast("double")
        + F.lit(b2) * F.col("x2").cast("double")
    )
    cells = base.groupBy(eta.alias("s")).agg(
        F.sum("y").alias("c1"),
        F.sum(F.lit(1) - F.col("y")).alias("c0"),
    )
    w_before = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = cells.select(
        "s",
        "c1",
        "c0",
        F.coalesce(
            F.sum(F.col("c1") + F.col("c0")).over(w_before), F.lit(0)
        ).alias("cb"),
        (F.col("c1") + F.col("c0")).alias("t"),
    )
    acc_pred = F.when(F.col("s") > 0, F.col("c1")).otherwise(F.col("c0"))
    m = ranked.agg(
        F.sum(F.col("c1").cast(d38)).alias("n1"),
        F.sum(F.col("c0").cast(d38)).alias("n0"),
        F.sum(
            F.col("c1").cast(d38)
            * (F.lit(2) * F.col("cb") + F.col("t") + F.lit(1))
        ).alias("r1x2"),
        F.sum(acc_pred.cast(d38)).alias("n_correct"),
    )
    n1d, n0d = F.col("n1").cast("double"), F.col("n0").cast("double")
    auc = (
        F.col("r1x2").cast("double") / F.lit(2.0)
        - n1d * (n1d + F.lit(1.0)) / F.lit(2.0)
    ) / (n1d * n0d)

    def r6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    return m.select(
        F.lit(n_rows).cast("long").alias("n_rows"),
        F.lit(r6(b0)).alias("intercept"),
        F.lit(r6(b1)).alias("beta_qty"),
        F.lit(r6(b2)).alias("beta_disc"),
        det_round(
            F.col("n_correct").cast("double") / F.lit(float(n_rows))
        ).alias("train_accuracy"),
        det_round(auc).alias("train_auc"),
    )


def doc_nb_lang_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier, trained and
    evaluated entirely relationally: add-one-smoothed token
    likelihoods and document priors fit on the train half
    (doc_id % 2 = 0), argmax posterior predictions on the held-out
    half, reported as the confusion matrix (true_lang, pred_lang,
    n_docs) — the classical text classifier as ONE declarative plan
    (on this synthetic corpus the tokens carry no language signal,
    so near-uniform confusion is the correct finding; the machinery
    is what transfers).

    Exactness: each log term ln((c+1)/(N_l+V)) and each log prior is
    floored ONCE onto the 1e-9 grid per (token, lang) cell, so every
    document score is an exact integer sum (count × grid-log), and
    the argmax orders by (score, lang) — no floating aggregation
    anywhere. Shape: one explode + two hash aggregates to train; the
    scoring join fans test tokens by |langs| (a broadcast constant)
    against the token-lang likelihood table."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda x: x != "")
        ).alias("token"),
    ).localCheckpoint(eager=True)
    is_train = F.col("doc_id") % 2 == 0
    train_toks = toks.where(is_train)
    counts = train_toks.groupBy("lang", "token").agg(
        F.count(F.lit(1)).alias("c")
    )
    nl = train_toks.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l"))
    vocab = train_toks.select("token").distinct().agg(
        F.count(F.lit(1)).alias("v")
    )
    train_docs = docs.where(is_train)
    priors = (
        train_docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("nd"))
        .crossJoin(
            F.broadcast(
                train_docs.agg(F.count(F.lit(1)).alias("ndt"))
            )
        )
        .select(
            "lang",
            F.floor(
                F.log(
                    F.col("nd").cast("double") / F.col("ndt").cast("double")
                )
                * F.lit(1e9)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("prior_g"),
        )
    )
    langs = priors.select(F.col("lang").alias("cand"), "prior_g")
    test_cells = (
        toks.where(~is_train)
        .groupBy("doc_id", "lang", "token")
        .agg(F.count(F.lit(1)).alias("tc"))
    )
    scored_terms = (
        test_cells.crossJoin(F.broadcast(langs.select("cand")))
        .join(
            counts.select(
                F.col("lang").alias("cand"), "token", F.col("c")
            ),
            ["cand", "token"],
            "left",
        )
        .join(F.broadcast(nl.select(F.col("lang").alias("cand"), "n_l")), "cand")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            "lang",
            "cand",
            (
                F.col("tc")
                * F.floor(
                    F.log(
                        (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1)).cast(
                            "double"
                        )
                        / (F.col("n_l") + F.col("v")).cast("double")
                    )
                    * F.lit(1e9)
                    + F.lit(0.5)
                ).cast("long")
            ).alias("t"),
        )
    )
    doc_scores = (
        scored_terms.groupBy("doc_id", "lang", "cand")
        .agg(F.sum("t").alias("s"))
        .join(F.broadcast(langs), "cand")
        .select(
            "doc_id",
            "lang",
            "cand",
            (F.col("s") + F.col("prior_g")).alias("score"),
        )
    )
    w_pick = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("cand")
    )
    preds = (
        doc_scores.withColumn("_rn", F.row_number().over(w_pick))
        .where(F.col("_rn") == 1)
        .select("doc_id", "lang", F.col("cand").alias("pred"))
    )
    return (
        preds.groupBy(
            F.col("lang").alias("true_lang"), F.col("pred").alias("pred_lang")
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("true_lang", "pred_lang")
    )


def _tdiv(a: int, b: int) -> int:
    """Integer division truncating toward zero (Spark `div` / DuckDB
    `//` semantics; python's `//` floors, which differs on negatives)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def lineitem_gbm_stumps(
    spark: SparkSession, sf_dir: str, rounds: int = 2
) -> DataFrame:
    """Gradient-boosted regression stumps: `rounds` rounds of
    least-squares boosting with depth-1 trees over
    (quantity, centi-discount), predicting the cent price — the
    GBDT core loop (fit a stump to residuals, add it to the model)
    expressed relationally, with every split search a pair of
    cumulative windows over the FEATURE-VALUE grain (≤ 50 + 11
    candidate thresholds), never a row-grain sort.

    All-integer state makes it bit-reproducible: the model F lives
    in micro-cents (BIGINT), so residuals r = y·10⁶ − F(x) are exact
    integers, split statistics are exact DECIMAL/HUGEINT sums, leaf
    values are truncating integer divisions (Spark `div` ≡ DuckDB
    `//`), and the only doubles are the per-threshold gain
    s_l²/n_l + s_r²/n_r comparison (identical fixed-order in both
    engines, ties → lower feature id then lower threshold) and the
    reported RMSE. The oracle unrolls both rounds as CTEs.

    Output: one row per round — split (feature, threshold), leaf
    values, and train RMSE after applying that round. On TPC-H-like
    data the first stump splits quantity high/low (price ∝
    qty·unit-price), which is the sanity signal."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("y"),
        F.col("l_quantity").cast("long").alias("x1"),
        F.floor(F.col("l_discount") * 100 + F.lit(0.5))
        .cast("long")
        .alias("x2"),
    ).localCheckpoint(eager=True)
    d38 = "decimal(38,0)"
    tot = base.agg(
        F.sum((F.col("y") * F.lit(1_000_000)).cast(d38)).alias("sy"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    n = int(tot["n"])
    f0 = _tdiv(int(tot["sy"]), n)  # model in micro-cents

    # model state: list of (feature, threshold, left_u, right_u)
    stumps: list[tuple[int, int, int, int]] = []

    def pred_expr():
        e = F.lit(f0).cast("long")
        for feat, thr, lu, ru in stumps:
            x = F.col("x1") if feat == 1 else F.col("x2")
            e = e + F.when(x <= F.lit(thr), F.lit(lu)).otherwise(F.lit(ru))
        return e

    out_rows = []
    for _ in range(rounds):
        r_u = (F.col("y") * F.lit(1_000_000) - pred_expr()).alias("r")
        resid = base.select("x1", "x2", r_u)
        cands = None
        for feat, xcol in ((1, "x1"), (2, "x2")):
            g = resid.groupBy(F.col(xcol).alias("v")).agg(
                F.count(F.lit(1)).alias("nv"),
                F.sum(F.col("r").cast(d38)).alias("sv"),
            )
            w_cum = Window.orderBy("v").rowsBetween(
                Window.unboundedPreceding, 0
            )
            c = g.select(
                F.lit(feat).alias("feat"),
                F.col("v").alias("thr"),
                F.sum("nv").over(w_cum).alias("nl"),
                F.sum("sv").over(w_cum).alias("sl"),
            )
            cands = c if cands is None else cands.unionAll(c)
        totals = resid.agg(
            F.count(F.lit(1)).alias("nt"),
            F.sum(F.col("r").cast(d38)).alias("st"),
        )
        sc = cands.crossJoin(F.broadcast(totals)).where(
            F.col("nl") < F.col("nt")
        )
        sl, nl = F.col("sl").cast("double"), F.col("nl").cast("double")
        sr = (F.col("st") - F.col("sl")).cast("double")
        nr = (F.col("nt") - F.col("nl")).cast("double")
        gain = sl * sl / nl + sr * sr / nr
        w_pick = Window.orderBy(
            F.desc(gain), F.asc("feat"), F.asc("thr")
        )
        best = (
            sc.withColumn("_rn", F.row_number().over(w_pick))
            .where(F.col("_rn") == 1)
            .select("feat", "thr", "nl", "sl", "nt", "st")
            .collect()[0]
        )
        feat, thr = int(best["feat"]), int(best["thr"])
        nl_i, sl_i = int(best["nl"]), int(best["sl"])
        nt_i, st_i = int(best["nt"]), int(best["st"])
        lu = _tdiv(sl_i, nl_i)
        ru = _tdiv(st_i - sl_i, nt_i - nl_i)
        stumps.append((feat, thr, lu, ru))
        rmse_row = base.select(
            (F.col("y") * F.lit(1_000_000) - pred_expr()).alias("r")
        ).agg(
            F.sum(F.col("r").cast(d38) * F.col("r")).alias("ss")
        ).collect()[0]
        import math

        rmse = math.sqrt(float(rmse_row["ss"]) / 1e12 / n) / 100.0
        out_rows.append(
            (
                len(stumps),
                "quantity" if feat == 1 else "discount_centi",
                thr,
                math.floor(lu / 1e6 / 100.0 * 1e6 + 0.5) / 1e6,
                math.floor(ru / 1e6 / 100.0 * 1e6 + 0.5) / 1e6,
                math.floor(rmse * 1e6 + 0.5) / 1e6,
            )
        )
    return spark.createDataFrame(
        out_rows,
        "round bigint, feature string, threshold bigint,"
        " leaf_left double, leaf_right double, train_rmse double",
    )


def ab_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for a customer-level experiment:
    period-2 spend is the metric, period-1 spend the pre-experiment
    covariate, θ = cov(y,x)/var(x) pooled, and each arm (synthetic
    assignment custkey % 2) reports its raw and CUPED-adjusted mean
    plus the global variance-reduction factor 1 − ρ² — the standard
    trick that makes A/B tests on heavy-tailed spend metrics
    readable (`ab_test_purchase_value`'s z-test, upgraded with the
    covariate every real experimentation platform uses).

    Exactness: per-customer period spends are exact cent integers
    (customers missing from a period contribute 0 — the join is a
    full outer on the customer grain); all five pooled moments and
    the per-arm moments are DECIMAL(38,0)/HUGEINT sums; θ, the
    adjusted means mean_y(arm) − θ·(mean_x(arm) − x̄), and 1 − ρ²
    are fixed-order doubles mirrored textually."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    cut = F.col("o_orderdate") < F.lit("1998-01-01")
    p1 = orders.where(cut).groupBy("o_custkey").agg(F.sum(cents).alias("x"))
    p2 = orders.where(~cut).groupBy("o_custkey").agg(F.sum(cents).alias("y"))
    units = (
        p1.join(p2, "o_custkey", "full_outer")
        .select(
            "o_custkey",
            F.coalesce(F.col("x"), F.lit(0)).alias("x"),
            F.coalesce(F.col("y"), F.lit(0)).alias("y"),
            (F.col("o_custkey") % 2).cast("int").alias("arm"),
        )
        .localCheckpoint(eager=True)
    )
    d38 = "decimal(38,0)"
    pooled = units.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum(F.col("x").cast(d38)).alias("sx"),
        F.sum(F.col("y").cast(d38)).alias("sy"),
        F.sum(F.col("x").cast(d38) * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast(d38) * F.col("y")).alias("syy"),
        F.sum(F.col("x").cast(d38) * F.col("y")).alias("sxy"),
    )
    per_arm = units.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_arm"),
        F.sum(F.col("x").cast(d38)).alias("sxa"),
        F.sum(F.col("y").cast(d38)).alias("sya"),
    )
    j = per_arm.crossJoin(F.broadcast(pooled))
    nd = F.col("n").cast("double")
    cov = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    theta = cov / vx
    xbar = F.col("sx").cast("double") / nd
    mean_y = F.col("sya").cast("double") / F.col("n_arm").cast("double")
    mean_x = F.col("sxa").cast("double") / F.col("n_arm").cast("double")
    adj = mean_y - theta * (mean_x - xbar)
    var_red = F.lit(1.0) - cov * cov / (vx * vy)
    return j.select(
        "arm",
        F.col("n_arm").cast("long").alias("n_customers"),
        det_round(mean_y / F.lit(100.0)).alias("mean_spend"),
        det_round(adj / F.lit(100.0)).alias("mean_spend_cuped"),
        det_round(var_red).alias("var_ratio_cuped"),
    ).orderBy("arm")


def nation_revenue_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per nation: exact DECIMAL money
    sums at (nation, year) grain, growth = this/previous − 1 via one
    lag window over the tiny rollup (first year NULL) — the board
    slide behind `monthly_revenue_trend`."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    yearly = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(
            "n_name", F.year(F.col("o_orderdate")).cast("int").alias("yr")
        )
        .agg(F.sum(rev.cast("decimal(18,4)")).alias("_rev"))
    )
    w = Window.partitionBy("n_name").orderBy("yr")
    prev = F.lag("_rev").over(w)
    return yearly.select(
        "n_name",
        "yr",
        F.col("_rev").cast("double").alias("revenue"),
        det_round(
            F.col("_rev").cast("double") / prev.cast("double") - F.lit(1.0)
        ).alias("yoy_growth"),
    ).orderBy("n_name", "yr")


def hll_rolling_7d_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day from the first-principles
    md5 HLL (`hll_register_distinct_users`'s register algebra), the
    sketch twin of the exact `rolling_7d_distinct_users`: registers
    are built per (day, bucket) in one scan, each observation is
    credited to the 7 days it covers (a bounded x7 explode of the
    day-x-1024-register frame — rows = days x m, INDEPENDENT of data
    volume), and the rolling register set per day is a plain
    register-max regroup. This is the sliding-window sketch pattern
    that makes trailing distinct counts an O(days x m) problem at any
    corpus size — no per-day rescan of raw data, and the same
    register tables roll up to weekly/monthly by the identical max.
    Every register and the estimate mirror in pure SQL, so the whole
    windowed sketch is value-hashed."""
    events = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    m = 1024
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10
    ).cast("long")
    w = h.bitwiseAND(F.lit(274877906943))
    rho = F.when(w == 0, F.lit(39)).otherwise(F.lit(39) - F.length(F.bin(w)))
    base = events.select(
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .alias("day_num"),
        F.col("ts").cast("date").cast("string").alias("day"),
        F.shiftright(h, 38).alias("bucket"),
        rho.alias("rho"),
    )
    days = base.select("day_num", "day").distinct()
    regs = base.groupBy("day_num", "bucket").agg(F.max("rho").alias("M"))
    contrib = regs.select(
        F.explode(
            F.sequence(F.col("day_num"), F.col("day_num") + 6)
        ).alias("day_num"),
        "bucket",
        "M",
    )
    rolled = contrib.groupBy("day_num", "bucket").agg(F.max("M").alias("M"))
    agg = (
        rolled.join(days, "day_num")
        .groupBy("day_num", "day")
        .agg(
            F.count(F.lit(1)).alias("used"),
            F.sum(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(48 - M AS INT))")
            ).alias("_sp"),
        )
    )
    s_d = (
        F.col("_sp") + (F.lit(m) - F.col("used")) * F.lit(281474976710656)
    ).cast("double")
    e_raw = (
        F.lit(0.7213)
        / (F.lit(1.0) + F.lit(1.079) / F.lit(1024.0))
        * F.lit(1048576.0)
        * F.lit(281474976710656.0)
        / s_d
    )
    linear = F.lit(1024.0) * F.log(
        F.lit(1024.0) / (F.lit(1024.0) - F.col("used").cast("double"))
    )
    est = F.when(
        (e_raw <= F.lit(2560.0)) & (F.col("used") < m), linear
    ).otherwise(e_raw)
    return (
        agg.select(
            "day",
            F.col("used").alias("used_buckets"),
            det_round(est, 6).alias("est_users_7d"),
        )
        .orderBy("day")
    )


def events_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized robust statistics per event type: values clipped at
    the exact p05/p95 ORDER STATISTICS (rank ceil(q*n) over the
    per-type sort — the same one-shuffle rank pattern as
    approx_value_percentiles' audit half), then an exact centi-grid
    mean of the clipped values. The outlier-robust complement to
    events_anomaly_* : at 100 TB you'd take the cut points from the
    GK sketch instead of the exact ranks and keep the identical
    clip-and-aggregate map stage. All arithmetic integer-exact; the
    mean goes through det_round."""
    events = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    centi = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    w = Window.partitionBy("event_type").orderBy("cv", "event_id")
    ranked = (
        events.select("event_type", "event_id", centi.alias("cv"))
        .withColumn("rk", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("event_type")))
    )
    lo_k = F.ceil(F.col("n") * F.lit(0.05))
    hi_k = F.ceil(F.col("n") * F.lit(0.95))
    cuts = (
        ranked.where((F.col("rk") == lo_k) | (F.col("rk") == hi_k))
        .groupBy("event_type")
        .agg(F.min("cv").alias("lo_cv"), F.max("cv").alias("hi_cv"))
    )
    clipped = ranked.join(F.broadcast(cuts), "event_type").select(
        "event_type",
        "n",
        F.greatest(F.col("lo_cv"), F.least(F.col("hi_cv"), F.col("cv"))).alias(
            "wcv"
        ),
        (F.col("cv") < F.col("lo_cv")).cast("long").alias("clip_lo"),
        (F.col("cv") > F.col("hi_cv")).cast("long").alias("clip_hi"),
    )
    return (
        clipped.groupBy("event_type")
        .agg(
            F.first("n").alias("n"),
            F.sum("clip_lo").alias("n_clipped_low"),
            F.sum("clip_hi").alias("n_clipped_high"),
            det_round(
                F.sum("wcv").cast("double")
                / F.count(F.lit(1)).cast("double")
                / F.lit(100.0),
                6,
            ).alias("win_mean"),
        )
        .orderBy("event_type")
    )


def doc_weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted reservoir sampling (Efraimidis–Spirakis A-ES): keep
    the k=50 docs with the largest u^(1/w) — equivalently the largest
    ln(u)/w since ln(u) < 0 — where w is the doc's token-length
    weight and u ∈ (0,1] is a DETERMINISTIC md5-derived uniform
    ((h48+1)/2^48): long-document-biased sampling whose inclusion
    probabilities follow the weights, reproducible across engines and
    runs. This is the standard one-pass distributed weighted sampler:
    the key is computed map-side and TakeOrderedAndProject keeps k —
    no shuffle of the corpus, O(k) per partition. The ln output rides
    the det_round(9) grid (libm-output convention) with doc_id as the
    total tie-break."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10
    ).cast("long")
    u = (h.cast("double") + F.lit(1.0)) / F.lit(281474976710656.0)
    weight = F.size(toks).cast("double")
    key = det_round(F.log(u) / weight, 9)
    ranked = (
        docs.where(F.size(toks) > 0)
        .select(
            F.col("doc_id"),
            F.size(toks).cast("long").alias("weight_tokens"),
            key.alias("es_key"),
        )
        .orderBy(F.col("es_key").desc(), F.col("doc_id").asc())
        .limit(50)
    )
    w_rank = Window.orderBy(F.col("es_key").desc(), F.col("doc_id").asc())
    return ranked.withColumn("rank", F.row_number().over(w_rank).cast("int")).select(
        "rank", "doc_id", "weight_tokens", "es_key"
    )


#: One SQL text, two engines: executed verbatim by spark.sql() over
#: the registered temp views AND by the DuckDB oracle. Q19-shaped
#: (OR-of-ANDs pushed into a single join pass) and written in the
#: dialect-portable subset both engines parse identically.
SQL_FRONTDOOR_Q19 = """
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ((p_brand = 'Brand#2'  AND l_quantity BETWEEN 1  AND 15)
        OR (p_brand = 'Brand#4'  AND l_quantity BETWEEN 10 AND 25)
        OR (p_brand = 'Brand#19' AND l_quantity BETWEEN 20 AND 35))
"""


def sql_frontdoor_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front door: `sources/tables.register_views` exposes the
    whole catalog as temp views and this query is `spark.sql(<text>)`
    — THE SAME TEXT the DuckDB oracle runs, so the hash-match proves
    the ANSI-SQL entry point end to end (parse → Catalyst plan →
    execution), not just the DataFrame API. A reference user who
    writes SQL rather than DataFrames runs queries through exactly
    this path. Q19 shape on purpose: the OR-of-ANDs predicate is the
    classic test that the optimizer pushes a disjunctive filter into
    one join pass instead of three unions."""
    from stream_processing_system_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(SQL_FRONTDOOR_Q19)


def events_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit, the companion release-readiness check to
    `events_k_anonymity`: a quasi-identifier group can be large (high
    k) yet still leak if every member shares the SAME sensitive
    value — l-diversity demands ≥ l distinct sensitive values per QI
    group. Same QI grain as the k-anonymity audit (event_type,
    hour-of-day, value band); the sensitive attribute is user_id (the
    re-identification target in event data). Reports per event_type:
    the minimum distinct-sensitive count any group achieves (the l
    actually attained), groups below l=3, and the rows those groups
    expose. One aggregate at QI grain with a count_distinct — the
    same map-side-combinable shape that survives 100 TB."""
    events = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    band = F.least(
        F.floor(F.col("value") / F.lit(10.0)).cast("long"), F.lit(9).cast("long")
    )
    qi = events.select(
        "event_type",
        F.hour("ts").alias("hod"),
        band.alias("vband"),
        "user_id",
    )
    groups = qi.groupBy("event_type", "hod", "vband").agg(
        F.count(F.lit(1)).alias("_gsz"),
        F.count_distinct("user_id").alias("_l"),
    )
    return (
        groups.groupBy("event_type")
        .agg(
            F.min("_l").alias("min_l"),
            F.sum(F.when(F.col("_l") < 3, 1).otherwise(0))
            .cast("long")
            .alias("groups_below_l3"),
            F.sum(F.when(F.col("_l") < 3, F.col("_gsz")).otherwise(0))
            .cast("long")
            .alias("rows_in_risky_groups"),
        )
        .orderBy("event_type")
    )


def value_histogram_sketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable equi-width histogram sketch with quantile recovery —
    the third from-first-principles sketch family (after the md5 HLL
    and the KMV): per (event_type, day) the value distribution is
    summarized as 1200 fixed half-unit-width bucket counts ([0, 600), clamped), daily
    sketches MERGE by plain count addition into the per-type total
    (the rollup never re-reads raw data — the same algebra that makes
    per-slice histograms the 100 TB quantile path), and p50/p90 are
    recovered from the merged cumulative histogram by linear
    interpolation inside the target bucket. Unlike GK, every number
    here (bucket counts, cumulative ranks, interpolation) is exact
    integer arithmetic plus one mirrored division — the WHOLE sketch
    value-hashes in SQL, estimate included. Bucket width bounds the
    error: ≤ half a bucket (0.25 value units at width 0.5).

    Output per event_type: n, n_buckets_used, p50_est, p90_est
    (det_round 6)."""
    events = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    # observed values span [0, ~560]; 1200 buckets of width 0.5
    # (50 centi-units) cover [0, 600), tail clamped into the last
    centi = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    bucket = F.least(F.floor(centi / F.lit(50)).cast("long"), F.lit(1199))
    daily = (
        events.select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            bucket.alias("b"),
        )
        .groupBy("event_type", "day", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    merged = daily.groupBy("event_type", "b").agg(F.sum("c").alias("c"))
    w = Window.partitionBy("event_type").orderBy("b")
    cum = merged.withColumn(
        "cum", F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn("n", F.sum("c").over(Window.partitionBy("event_type")))

    def q_est(p: float):
        target = F.ceil(F.col("n").cast("double") * F.lit(p))
        prev = F.col("cum") - F.col("c")
        inb = (
            (target.cast("double") - prev.cast("double"))
            / F.col("c").cast("double")
        )
        # value estimate: bucket lower edge + fraction * width (0.5)
        est = (
            F.col("b").cast("double") * F.lit(0.5)
            + inb * F.lit(0.5)
        )
        return F.min(
            F.when((F.col("cum") >= target) & (prev < target), est)
        )

    return (
        cum.groupBy("event_type")
        .agg(
            F.first("n").alias("n"),
            F.count(F.lit(1)).alias("n_buckets_used"),
            det_round(q_est(0.5), 6).alias("p50_est"),
            det_round(q_est(0.9), 6).alias("p90_est"),
        )
        .orderBy("event_type")
    )


def events_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — the third privacy release-readiness check,
    completing the trio with `events_k_anonymity` (group size) and
    `events_l_diversity` (sensitive diversity): a QI group can be
    large AND diverse yet still leak if its sensitive-value
    DISTRIBUTION diverges from the table-wide one (skewness attack).
    t-closeness demands Earth Mover's Distance(group dist, global
    dist) <= t. QI grain is (event_type, hour-of-day); the sensitive
    attribute is the ordered value decile band (0..9), so EMD has the
    closed form (1/(m-1)) * sum_i |CumP_i - CumQ_i| over the ordered
    bands. Every cumulative term is exact-integer (cumc*N - cumC*gsz
    over a zero-filled 10-band grid), with ONE mirrored division per
    group at the end - the whole audit value-hashes cross-engine.
    Scale: two aggregates at QI grain plus a 10-row broadcast of the
    global cumulative histogram; no window wider than 10 rows per
    group - the same map-side-combinable shape as the k-anonymity
    audit, sound at 100 TB."""
    events = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    band = F.least(
        F.floor(F.col("value") / F.lit(10.0)).cast("long"), F.lit(9).cast("long")
    )
    qi = events.select(
        "event_type", F.hour("ts").alias("hod"), band.alias("vband")
    )
    # per-group per-band counts on a zero-filled 10-band grid
    gb = qi.groupBy("event_type", "hod", "vband").agg(
        F.count(F.lit(1)).alias("c")
    )
    bands = spark.range(10).select(F.col("id").alias("vband"))
    grid = (
        qi.select("event_type", "hod")
        .distinct()
        .crossJoin(F.broadcast(bands))
        .join(gb, ["event_type", "hod", "vband"], "left")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0).cast("long")))
    )
    wg = Window.partitionBy("event_type", "hod").orderBy("vband")
    cum = grid.withColumn(
        "cumc", F.sum("c").over(wg.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn(
        "gsz", F.sum("c").over(Window.partitionBy("event_type", "hod"))
    )
    # global cumulative histogram (10 rows, broadcast)
    glob = (
        bands.join(
            qi.groupBy("vband").agg(F.count(F.lit(1)).alias("gc")),
            "vband",
            "left",
        )
        .withColumn("gc", F.coalesce(F.col("gc"), F.lit(0).cast("long")))
        .withColumn(
            "cumg",
            F.sum("gc").over(
                Window.orderBy("vband").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ),
        )
        .withColumn("n_total", F.sum("gc").over(Window.partitionBy()))
        .select("vband", "cumg", "n_total")
    )
    terms = cum.join(F.broadcast(glob), "vband").where(F.col("vband") < 9)
    per_group = terms.groupBy("event_type", "hod", "gsz", "n_total").agg(
        F.sum(
            F.abs(F.col("cumc") * F.col("n_total") - F.col("cumg") * F.col("gsz"))
        ).alias("num")
    )
    emd = F.col("num").cast("double") / (
        F.lit(9.0) * F.col("gsz").cast("double") * F.col("n_total").cast("double")
    )
    audited = per_group.select("event_type", "hod", emd.alias("t"))
    return (
        audited.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            det_round(F.max("t"), 6).alias("max_t"),
            F.sum(F.when(F.col("t") > 0.2, 1).otherwise(0))
            .cast("long")
            .alias("groups_above_t02"),
        )
        .orderBy("event_type")
    )


def events_sax_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX (Symbolic Aggregate approXimation) of each event type's
    daily-mean series: PAA to one mean per day, per-series
    z-normalization, then discretization into a 4-symbol alphabet at
    the standard Gaussian breakpoints (-0.6745, 0, 0.6745) - the
    classic Lin/Keogh symbolic representation that turns a time
    series into a word for motif mining and indexable similarity.
    Determinism: daily means land on an exact 1e-6 integer grid
    BEFORE any cross-day reduction (one exact IEEE division each);
    the z-score is (dm*n - Sx)/sqrt(n*Sxx - Sx^2) so the numerator is
    an exact integer and the denominator uses only IEEE-exact ops
    (sqrt is correctly rounded by both engines); moment sums ride
    DECIMAL(38,0) <-> HUGEINT. The word is assembled with an ORDER BY
    day string-agg mirrored on both sides. Scale: one groupBy to
    daily grain (map-side combinable), one 30-row-per-type reduce -
    the heavy lifting never leaves the first aggregate."""
    events = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    centi = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    daily = (
        events.select(
            "event_type", F.col("ts").cast("date").alias("day"), centi.alias("v")
        )
        .groupBy("event_type", "day")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("nd"))
        .select(
            "event_type",
            "day",
            F.floor(
                (F.col("s") * F.lit(10000)).cast("double")
                / F.col("nd").cast("double")
                + F.lit(0.5)
            )
            .cast("long")
            .alias("dm"),
        )
    )
    return sax_word_from_daily(daily)


def sax_word_from_daily(daily: DataFrame) -> DataFrame:
    """Shared SAX tail (z-normalize the grid-quantized daily means,
    discretize at the Gaussian 4-symbol breakpoints, assemble the
    day-ordered word) — used by both the batch plan and the streaming
    twin, whose drained (sum, count) state reduces to the identical
    `daily` frame."""
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dm").alias("sx"),
        F.sum(F.col("dm").cast("decimal(38,0)") * F.col("dm")).alias("sxx"),
    )
    j = daily.join(F.broadcast(stats), "event_type")
    var_num = (
        F.col("n").cast("double") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    z = F.when(
        var_num > 0,
        (F.col("dm") * F.col("n") - F.col("sx")).cast("double")
        / F.sqrt(var_num),
    ).otherwise(F.lit(0.0))
    sym = (
        F.when(z < -0.6745, F.lit("a"))
        .when(z < 0.0, F.lit("b"))
        .when(z < 0.6745, F.lit("c"))
        .otherwise(F.lit("d"))
    )
    lettered = j.select("event_type", "day", sym.alias("ch"))
    return (
        lettered.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("day"), F.col("ch")))
                    ),
                    lambda s: s["ch"],
                ),
                "",
            ).alias("sax_word"),
        )
        .orderBy("event_type")
    )


def user_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch heavy hitters - the fourth from-first-
    principles mergeable sketch family (after the md5 HLL, the KMV,
    and the histogram-quantile sketch): event counts per user are
    folded into a d=4 x w=2048 counter matrix via four salted
    md5 hashes; a user's estimate is the MIN over its four cells
    (never an under-count, over-counts bounded by e*N/w per row).
    Cells merge by plain addition, so per-slice sketches roll up
    without re-reading raw data - the 100 TB path. The top 20 users
    by estimate are reported with their exact counts and the
    overestimate, all exact integers: the ENTIRE sketch algebra
    (hashing, cell sums, min-of-rows) value-hashes against the SQL
    oracle. Scale: per-user pre-aggregation first (map-side
    combinable), then 4 rows per USER (not per event) into a
    <=8192-cell matrix; the estimate join touches users x 4, and the
    matrix itself broadcasts."""
    events = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    per_user = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    rows4 = spark.range(4).select(F.col("id").alias("j"))
    hashed = (
        per_user.crossJoin(F.broadcast(rows4))
        .withColumn(
            "col",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("cm"),
                            F.col("j").cast("string"),
                            F.lit("|"),
                            F.col("user_id").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 2048,
        )
    )
    cells = hashed.groupBy("j", "col").agg(F.sum("n").alias("cell"))
    est = (
        hashed.join(cells, ["j", "col"])
        .groupBy("user_id", "n")
        .agg(F.min("cell").alias("est_count"))
    )
    return (
        est.select(
            "user_id",
            "est_count",
            F.col("n").alias("true_count"),
            (F.col("est_count") - F.col("n")).alias("overestimate"),
        )
        .orderBy(F.desc("est_count"), F.desc("true_count"), F.asc("user_id"))
        .limit(20)
    )


def doc_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance reweighting for training-data selection
    (Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling" — public method): score every document by
    how much its hashed-unigram profile resembles a TARGET
    distribution (here the English subcorpus) relative to the RAW
    corpus distribution. Features are md5-hashed token buckets
    (8192); each token contributes the add-one-smoothed ratio
    (ct+1)/(cr+1), quantized to an exact 1e-6 integer grid BEFORE the
    per-document sum so the reduction is order-independent longs.
    Emits the 100 highest-scoring docs.
    Scale: two token-bucket aggregates (both map-side combinable into
    <=8192 rows), the <=8192-row ratio table broadcast onto the
    exploded token stream, one per-doc sum — no shuffle ever carries
    more than (doc_id, long) pairs; the same plan at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(F.filter(F.split(F.col("text"), " "), lambda t: t != "")).alias(
            "tok"
        ),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
        % 8192
    ).alias("b")
    bt = toks.select("doc_id", "lang", bucket)
    # raw and target counts in ONE aggregate — the token stream is
    # scanned twice total (counts + scoring join), never three times
    counts = bt.groupBy("b").agg(
        F.count(F.lit(1)).alias("cr"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("ct"),
    )
    ratio = counts.select(
        "b",
        F.floor(
            F.lit(1000000.0)
            * (
                (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1)).cast("double")
                / (F.col("cr") + F.lit(1)).cast("double")
            )
            + F.lit(0.5)
        )
        .cast("long")
        .alias("term_micro"),
    )
    scored = (
        bt.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("term_micro").alias("s"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.floor(F.col("s").cast("double") / F.col("n_tokens").cast("double") + F.lit(0.5))
            .cast("long")
            .alias("mean_ratio_micro"),
        )
    )
    return (
        scored.select(
            "doc_id",
            "n_tokens",
            "mean_ratio_micro",
            (F.col("mean_ratio_micro").cast("double") / F.lit(1000000.0)).alias(
                "mean_ratio"
            ),
        )
        .orderBy(F.desc("mean_ratio_micro"), F.asc("doc_id"))
        .limit(100)
    )


def customer_part_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg's hubs-and-authorities) on the bipartite
    customer->part purchase graph: authoritative parts are bought by
    good hub customers, hub customers buy authoritative parts. Two
    full update rounds with L1 normalization (which preserves the
    eigendirection exactly like the usual L2 norm but keeps every
    score a ratio of exact-integer mass): scores live on a 1e9
    integer grid, each normalization is ONE mirrored double division
    per node, and the sums between normalizations are exact
    DECIMAL(38,0) - bit-stable at any parallelism and value-hashed
    end-to-end by the unrolled SQL oracle. Emits the top 10
    authorities and top 10 hubs.
    Scale: the edge list is a distinct projection of orders join
    lineitem; every iteration is two groupBys on the edge keys (both
    map-side combinable) plus a 1-row total broadcast - the same
    shape as the PageRank operator, sound at 100 TB."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    grid = 1_000_000_000

    def _l1_normalize(df: DataFrame, key: str, raw: str) -> DataFrame:
        # localCheckpoint: the normalize references `df` twice (total +
        # per-node divide) and the next round references the result
        # twice again — without the lineage cut the 2-round unrolled
        # DAG re-derives each subtree 2^k times.
        df = df.localCheckpoint(eager=True)
        tot = df.agg(F.sum(F.col(raw).cast("decimal(38,0)")).alias("_t"))
        return df.crossJoin(F.broadcast(tot)).select(
            key,
            F.floor(
                F.col(raw).cast("double")
                / F.col("_t").cast("double")
                * F.lit(float(grid))
                + F.lit(0.5)
            )
            .cast("long")
            .alias("score"),
        )

    hubs = edges.select("c").distinct().select(
        "c", F.lit(grid).cast("long").alias("score")
    )
    for _ in range(2):
        auth_raw = (
            edges.join(F.broadcast(hubs), "c")
            .groupBy("p")
            .agg(F.sum("score").alias("_raw"))
        )
        auth = _l1_normalize(auth_raw, "p", "_raw")
        hub_raw = (
            edges.join(F.broadcast(auth), "p")
            .groupBy("c")
            .agg(F.sum("score").alias("_raw"))
        )
        hubs = _l1_normalize(hub_raw, "c", "_raw")
    top_auth = (
        auth.orderBy(F.desc("score"), F.asc("p"))
        .limit(10)
        .select(
            F.lit("authority").alias("side"),
            F.col("p").alias("key"),
            (F.col("score").cast("double") / F.lit(float(grid))).alias("score"),
        )
    )
    top_hub = (
        hubs.orderBy(F.desc("score"), F.asc("c"))
        .limit(10)
        .select(
            F.lit("hub").alias("side"),
            F.col("c").alias("key"),
            (F.col("score").cast("double") / F.lit(float(grid))).alias("score"),
        )
    )
    return top_auth.unionAll(top_hub).orderBy("side", F.desc("score"), "key")


def events_dtw_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic Time Warping distance between every pair of event
    types' daily-mean series - the classic elastic similarity measure
    for time series, computed ENTIRELY inside Spark SQL's
    higher-order functions: the full O(n*m) DP table is a nested
    `aggregate` fold (outer fold over series A rows, inner fold
    builds each DP row left-to-right), no UDF, no collect. Daily
    means sit on the exact 1e-6 integer grid (same device as the SAX
    word), costs are |a_i - b_j| integers and the whole DP is
    min/plus over longs - the final distance is an exact integer on
    BOTH engines, so the oracle (a recursive CTE that sweeps the DP
    anti-diagonals, since the fold and the diagonal sweep compute the
    same recurrence) hash-matches with zero FP mirroring.
    Scale: the heavy stage is the daily-grain aggregate (map-side
    combinable); the DP itself runs on one ~30-element array per
    type pair - 10 rows of work at ANY corpus size."""
    events = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    centi = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    daily = (
        events.select(
            "event_type", F.col("ts").cast("date").alias("day"), centi.alias("v")
        )
        .groupBy("event_type", "day")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("nd"))
        .select(
            "event_type",
            "day",
            F.floor(
                (F.col("s") * F.lit(10000)).cast("double")
                / F.col("nd").cast("double")
                + F.lit(0.5)
            )
            .cast("long")
            .alias("dm"),
        )
    )
    ser = daily.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("day"), F.col("dm")))),
            lambda s: s["dm"],
        ).alias("arr")
    )
    pairs = (
        ser.alias("x")
        .join(ser.alias("y"), F.col("x.event_type") < F.col("y.event_type"))
        .select(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
            F.col("x.arr").alias("a"),
            F.col("y.arr").alias("b"),
        )
    )
    a, b = F.col("a"), F.col("b")
    # DP row for i=0: cumulative |a_1 - b_j| along the first row
    row0 = F.aggregate(
        F.slice(b, 2, F.size(b) - 1),
        F.array(F.abs(F.element_at(a, 1) - F.element_at(b, 1))),
        lambda acc, xb: F.concat(
            acc,
            F.array(F.element_at(acc, -1) + F.abs(F.element_at(a, 1) - xb)),
        ),
    )
    final_row = F.aggregate(
        F.slice(a, 2, F.size(a) - 1),
        row0,
        lambda prev, xa: F.aggregate(
            F.slice(b, 2, F.size(b) - 1),
            F.array(F.element_at(prev, 1) + F.abs(xa - F.element_at(b, 1))),
            lambda acc, xb: F.concat(
                acc,
                F.array(
                    F.abs(xa - xb)
                    + F.least(
                        F.element_at(prev, F.size(acc) + 1),
                        F.element_at(prev, F.size(acc)),
                        F.element_at(acc, -1),
                    )
                ),
            ),
        ),
    )
    return pairs.select(
        "type_a",
        "type_b",
        F.size(a).alias("n_a"),
        F.size(b).alias("n_b"),
        F.element_at(final_row, -1).alias("dtw_micro"),
        (F.element_at(final_row, -1).cast("double") / F.lit(1000000.0)).alias(
            "dtw"
        ),
    ).orderBy("type_a", "type_b")


def events_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of each event type's daily-mean series by
    classical rescaled-range (R/S) analysis: split the series into
    blocks of size n in {5, 10, 15}, per block compute R/S =
    (max - min of cumulative deviations) / population std, average
    the block R/S per n, and fit ln(mean R/S) against ln(n) by OLS -
    the slope is H (0.5 = random walk, > 0.5 = trending / long
    memory, < 0.5 = mean-reverting).
    Determinism: daily means on the 1e-6 integer grid; per block the
    deviations ride the exact-integer lattice d_i = n*x_i - Sx so the
    cumulative sums, max and min are longs; R/S = (max-min) /
    sqrt(n*Sxx - Sx^2) uses only IEEE-exact ops; each block's R/S and
    both ln() regression inputs are floored to MILLI units before any
    cross-row sum (the zipf_fit device), so every reduction is
    order-independent int64.
    Scale: the only data-sized stage is the daily-grain aggregate;
    everything after runs on <=30 rows per type."""
    events = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    centi = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    daily = (
        events.select(
            "event_type", F.col("ts").cast("date").alias("day"), centi.alias("v")
        )
        .groupBy("event_type", "day")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("nd"))
        .select(
            "event_type",
            "day",
            F.floor(
                (F.col("s") * F.lit(10000)).cast("double")
                / F.col("nd").cast("double")
                + F.lit(0.5)
            )
            .cast("long")
            .alias("dm"),
        )
    )
    idx = daily.select(
        "event_type",
        "dm",
        (
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("day")
            )
            - F.lit(1)
        ).alias("idx"),
    )
    sizes = spark.range(3).select(
        (F.col("id") * 5 + 5).cast("long").alias("wn")
    )  # 5, 10, 15
    blocked = idx.crossJoin(F.broadcast(sizes)).select(
        "event_type",
        "wn",
        F.floor(F.col("idx") / F.col("wn")).cast("long").alias("blk"),
        "idx",
        "dm",
    )
    bstats = blocked.groupBy("event_type", "wn", "blk").agg(
        F.count(F.lit(1)).alias("bn"),
        F.sum("dm").alias("bsx"),
        F.sum(F.col("dm").cast("decimal(38,0)") * F.col("dm")).alias("bsxx"),
    )
    full = bstats.where(F.col("bn") == F.col("wn"))
    dev = blocked.join(full, ["event_type", "wn", "blk"]).select(
        "event_type",
        "wn",
        "blk",
        "idx",
        (F.col("dm") * F.col("wn") - F.col("bsx")).alias("d"),
        "bsx",
        "bsxx",
    )
    wcum = Window.partitionBy("event_type", "wn", "blk").orderBy("idx")
    cum = dev.withColumn(
        "z", F.sum("d").over(wcum.rowsBetween(Window.unboundedPreceding, 0))
    )
    var_num = (
        F.col("wn").cast("double") * F.col("bsxx").cast("double")
        - F.col("bsx").cast("double") * F.col("bsx").cast("double")
    )
    per_block = (
        cum.groupBy("event_type", "wn", "blk", "bsx", "bsxx")
        .agg((F.max("z") - F.min("z")).alias("rng"))
        .where(var_num > 0)
        .select(
            "event_type",
            "wn",
            F.floor(
                F.col("rng").cast("double") / F.sqrt(var_num) * F.lit(1000.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("rs_milli"),
        )
    )
    pts = per_block.groupBy("event_type", "wn").agg(
        F.count(F.lit(1)).alias("nb"), F.sum("rs_milli").alias("srs")
    )
    # ln(mean R/S) and ln(n), both milli-floored regression inputs
    my = F.floor(
        F.log(
            F.col("srs").cast("double")
            / F.col("nb").cast("double")
            / F.lit(1000.0)
        )
        * F.lit(1000.0)
        + F.lit(0.5)
    ).cast("long")
    mx = F.floor(
        F.log(F.col("wn").cast("double")) * F.lit(1000.0) + F.lit(0.5)
    ).cast("long")
    xy = pts.where(F.col("srs") > 0).select("event_type", mx.alias("x"), my.alias("y"))
    sums = xy.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return sums.select(
        "event_type",
        F.col("n").alias("n_window_sizes"),
        det_round(num / den, 6).alias("hurst"),
    ).orderBy("event_type")


def event_sequential_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern mining over per-user event-type sequences
    (the GSP/PrefixSpan support-counting core): a 2-pattern x>y is
    present for a user iff some x-event strictly precedes some
    y-event (equivalently first(x) < last(y)); a 3-pattern x>y>z uses
    the greedy-earliest witness (t1 = first(x), t2 = earliest y after
    t1, then any z after t2 - greedy matching decides subsequence
    presence exactly). Support = number of users containing the
    pattern. Everything is min/max timestamps and joins on the
    (user, type) grain - exact, no FP at all.
    Scale: the per-(user,type) first/last aggregate is map-side
    combinable; the pattern joins fan out at most |types|^2 = 25 rows
    per user, never per event, and the t2 probe joins each event to
    at most |types| firsts - linear in data with a small constant."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("event_type").alias("t"), "ts"
    )
    fl = events.groupBy("user_id", "t").agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    )
    fx = fl.select("user_id", F.col("t").alias("x"), F.col("first_ts").alias("t1"))
    ly = fl.select("user_id", F.col("t").alias("y"), F.col("last_ts").alias("ly"))
    p2 = (
        fx.join(ly, "user_id")
        .where(F.col("t1") < F.col("ly"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("support"))
        .select(
            F.concat_ws(">", "x", "y").alias("pattern"),
            F.lit(2).alias("length"),
            "support",
        )
    )
    # earliest y strictly after first(x), per (user, x, y)
    t2 = (
        events.join(fx, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id", "x", F.col("t").alias("y"))
        .agg(F.min("ts").alias("t2"))
    )
    lz = fl.select("user_id", F.col("t").alias("z"), F.col("last_ts").alias("lz"))
    p3 = (
        t2.join(lz, "user_id")
        .where(F.col("t2") < F.col("lz"))
        .groupBy("x", "y", "z")
        .agg(F.count(F.lit(1)).alias("support"))
        .select(
            F.concat_ws(">", "x", "y", "z").alias("pattern"),
            F.lit(3).alias("length"),
            "support",
        )
    )
    return p2.unionAll(p3).orderBy(
        "length", F.desc("support"), "pattern"
    )


def events_matrix_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matrix profile (brute-force, non-normalized) of each event
    type's daily-mean series with subsequence length w=7: for every
    length-7 window, the squared Euclidean distance to its nearest
    NON-TRIVIAL neighbor (exclusion zone |s1-s2| >= 4 = w/2 suppresses
    self-matches, as in the Yeh et al. 2016 matrix-profile papers).
    Low profile values mark repeated motifs, the peak marks the
    discord (anomalous week). Daily means ride the exact 1e-6 integer
    grid, distances are exact long sums of squared diffs, and the
    argmin tie-break is the smallest neighbor index via a window-min
    filter - integers end to end, zero FP mirroring.
    Scale: the all-pairs join runs on ~24 windows x 7 offsets PER
    TYPE regardless of corpus size; the data-sized stage is only the
    daily-grain aggregate."""
    w, excl = 7, 4
    events = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    centi = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    daily = (
        events.select(
            "event_type", F.col("ts").cast("date").alias("day"), centi.alias("v")
        )
        .groupBy("event_type", "day")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("nd"))
        .select(
            "event_type",
            "day",
            F.floor(
                (F.col("s") * F.lit(10000)).cast("double")
                / F.col("nd").cast("double")
                + F.lit(0.5)
            )
            .cast("long")
            .alias("dm"),
        )
    )
    idx = daily.select(
        "event_type",
        "dm",
        (
            F.row_number().over(Window.partitionBy("event_type").orderBy("day"))
            - F.lit(1)
        )
        .cast("long")
        .alias("idx"),
    )
    offs = spark.range(w).select(F.col("id").alias("k"))
    wel = (
        idx.crossJoin(F.broadcast(offs))
        .select(
            "event_type", (F.col("idx") - F.col("k")).alias("s"), "k", "dm"
        )
        .where(F.col("s") >= 0)
        # tiny (types x windows x 7 rows): materialize once so the
        # self-join doesn't re-run the corpus-sized daily aggregate
        .localCheckpoint(eager=True)
    )
    a, b = wel.alias("a"), wel.alias("b")
    dists = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.k") == F.col("b.k"))
            & (F.abs(F.col("a.s") - F.col("b.s")) >= excl),
        )
        .groupBy(
            F.col("a.event_type").alias("event_type"),
            F.col("a.s").alias("s1"),
            F.col("b.s").alias("s2"),
        )
        .agg(
            F.count(F.lit(1)).alias("nk"),
            F.sum(
                (F.col("a.dm") - F.col("b.dm")) * (F.col("a.dm") - F.col("b.dm"))
            ).alias("d2"),
        )
        .where(F.col("nk") == w)
    )
    wmin = Window.partitionBy("event_type", "s1")
    prof = (
        dists.withColumn("md", F.min("d2").over(wmin))
        .where(F.col("d2") == F.col("md"))
        .groupBy("event_type", "s1", "d2")
        .agg(F.min("s2").alias("nn_widx"))
    )
    return prof.select(
        "event_type",
        F.col("s1").alias("widx"),
        "nn_widx",
        F.col("d2").alias("nn_dist_micro2"),
        (F.sqrt(F.col("d2").cast("double")) / F.lit(1000000.0)).alias("nn_dist"),
    ).orderBy("event_type", "widx")


def events_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters additive triple exponential smoothing (level +
    trend + weekly season, alpha=0.5 beta=0.25 gamma=0.25) over each
    event type's daily total-value series, with a 7-day-ahead
    forecast and the in-sample one-step SSE - the classic seasonal
    forecaster, run ENTIRELY as one higher-order `aggregate` fold
    over the day-ordered array (state = level, trend, the rolling
    7-slot seasonal queue, SSE; no UDF, no collect). Standard 2m
    initialization: level = mean of week 1, trend = (mean week 2 -
    mean week 1)/7, seasonals = week-1 deviations; recursion from
    t=8. The smoothing constants are exact binary fractions
    (0.5/0.25/0.75), daily totals are exact centi longs, and every
    step's expression tree is textually mirrored in the oracle's
    recursive CTE (which carries the same state one row per step), so
    the sequential double arithmetic is bit-identical cross-engine.
    Scale: the data-sized stage is one daily-grain aggregate; the
    fold runs on a 30-element array per type."""
    events = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    centi = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    daily = (
        events.select(
            "event_type", F.col("ts").cast("date").alias("day"), centi.alias("v")
        )
        .groupBy("event_type", "day")
        .agg(F.sum("v").alias("cent"))
    )
    return holt_winters_from_daily(daily)


def hw_final_state(y):
    """Holt-Winters additive fold over a centi-total array column:
    standard 2m init (level = week-1 mean, trend = weekly mean
    difference / 7, seasonals = week-1 deviations), then the
    alpha=0.5/beta=0.25/gamma=0.25 recursion from t=8. Returns the
    final struct(l, b, seas[7], sse). Shared by the 7-day-ahead
    forecast query, the streaming twin, and the rolling-origin
    backtest (which folds PREFIXES of the same array)."""

    def yd(el):
        return el.cast("double") / F.lit(100.0)

    def wmean(start):
        acc = F.lit(0.0)
        for i in range(start, start + 7):
            acc = acc + yd(F.element_at(y, i))
        return acc / F.lit(7.0)

    m1, m2 = wmean(1), wmean(8)
    init = F.struct(
        m1.alias("l"),
        ((m2 - m1) / F.lit(7.0)).alias("b"),
        F.array(
            *[(yd(F.element_at(y, i)) - m1) for i in range(1, 8)]
        ).alias("seas"),
        F.lit(0.0).alias("sse"),
    )

    def step(st, x):
        v = yd(x)
        s7 = F.element_at(st["seas"], 1)
        lp, bp = st["l"], st["b"]
        ln = F.lit(0.5) * (v - s7) + F.lit(0.5) * (lp + bp)
        bn = F.lit(0.25) * (ln - lp) + F.lit(0.75) * bp
        sn = F.lit(0.25) * (v - ln) + F.lit(0.75) * s7
        err = v - ((lp + bp) + s7)
        return F.struct(
            ln.alias("l"),
            bn.alias("b"),
            F.concat(F.slice(st["seas"], 2, 6), F.array(sn)).alias("seas"),
            (st["sse"] + err * err).alias("sse"),
        )

    return F.aggregate(F.slice(y, 8, F.size(y) - 7), init, step)


def holt_winters_from_daily(daily: DataFrame) -> DataFrame:
    """Shared Holt-Winters tail (init + fold + 7-day forecast) over a
    (event_type, day, cent) daily-totals frame — used by the batch
    plan and the streaming twin, whose drained per-day sums reduce to
    the identical frame."""
    spark = daily.sparkSession
    ser = daily.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("day"), F.col("cent")))),
            lambda s: s["cent"],
        ).alias("y")
    ).where(F.size("y") >= 15)
    fin = hw_final_state(F.col("y"))
    hs = spark.range(7).select((F.col("id") + 1).cast("int").alias("h"))
    folded = ser.select("event_type", fin.alias("st")).crossJoin(F.broadcast(hs))
    fcast = (
        F.col("st.l")
        + F.col("h").cast("double") * F.col("st.b")
        + F.element_at(F.col("st.seas"), F.col("h"))
    )
    return folded.select(
        "event_type",
        "h",
        det_round(fcast, 6).alias("forecast"),
        det_round(F.col("st.sse"), 6).alias("sse"),
    ).orderBy("event_type", "h")


def events_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the per-user event-type Markov chain - the
    single number that says how PREDICTABLE user behavior is:
    H = -sum_ij (c_ij / N) * ln(c_ij / c_i.) in nats, with the
    empirical source distribution as the stationary weight. Built on
    the same total-ordered lead() pairing as `event_transitions`.
    Determinism: counts are exact ints, each ln(p_ij) is floored to
    MILLI units (the zipf_fit device) before the count-weighted sum,
    so the reduction is an exact int64; the final value is two
    mirrored divisions. Also emits the max possible rate ln(k) for
    the observed alphabet and the normalized ratio.
    Scale: one shuffle by user for the pairing, a 25-row matrix after
    that - nothing downstream of the first aggregate sees data."""
    events = load_table(spark, sf_dir, "events")
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            "user_id",
            "ts",
            "event_id",
            F.col("event_type").alias("cur"),
            F.lead("event_type").over(by_user).alias("nxt"),
        )
        .where(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w_cur = Window.partitionBy("cur")
    lnp_milli = F.floor(
        F.log(
            F.col("c").cast("double")
            / F.sum("c").over(w_cur).cast("double")
        )
        * F.lit(1000.0)
        + F.lit(0.5)
    ).cast("long")
    terms = pairs.select(
        "cur", "nxt", "c", lnp_milli.alias("lnp")
    )
    agg = terms.agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_cells"),
        F.count_distinct("cur").alias("k"),
        F.sum(F.col("c") * F.col("lnp")).alias("s"),
    )
    h = (
        -(F.col("s").cast("double"))
        / F.col("n").cast("double")
        / F.lit(1000.0)
    )
    hmax = F.log(F.col("k").cast("double"))
    return agg.select(
        F.col("n").alias("n_transitions"),
        F.col("n_cells").cast("long").alias("n_cells"),
        det_round(h, 6).alias("entropy_rate_nats"),
        det_round(hmax, 6).alias("max_rate_nats"),
        det_round(h / hmax, 6).alias("predictability_ratio"),
    )


def part_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres / Paasche / Fisher price indices between the 1995
    base year and 2000, over parts traded in BOTH years - the
    standard economic price-level measurement (Fisher = geometric
    mean of the two, the "ideal" index). Per part-year: unit price =
    exact centi-cents total / exact quantity total (one division);
    each part's price x weight term is floored to the centi grid
    BEFORE the cross-part sums, so every reduction is exact int64 and
    the three indices are two mirrored divisions and one IEEE sqrt.
    Scale: one filtered aggregate at (part, year) grain (map-side
    combinable, year filter pushed to the scan), a self-join on
    partkey, then 1-row arithmetic."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.year("l_shipdate").isin(1995, 2000)
    )
    per = (
        li.select(
            "l_partkey",
            F.year("l_shipdate").alias("yr"),
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
            F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("qty"),
        )
        .groupBy("l_partkey", "yr")
        .agg(F.sum("cents").alias("c"), F.sum("qty").alias("q"))
    )
    base = per.where(F.col("yr") == 1995).select(
        "l_partkey", F.col("c").alias("c0"), F.col("q").alias("q0")
    )
    cur = per.where(F.col("yr") == 2000).select(
        "l_partkey", F.col("c").alias("c1"), F.col("q").alias("q1")
    )
    both = base.join(cur, "l_partkey")
    p0 = F.col("c0").cast("double") / F.col("q0").cast("double")
    p1 = F.col("c1").cast("double") / F.col("q1").cast("double")

    def t(price, weight):
        return F.floor(price * weight.cast("double") + F.lit(0.5)).cast("long")

    terms = both.select(
        t(p1, F.col("q0")).alias("l1"),
        t(p0, F.col("q0")).alias("l0"),
        t(p1, F.col("q1")).alias("pp1"),
        t(p0, F.col("q1")).alias("pp0"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("l1").alias("sl1"),
        F.sum("l0").alias("sl0"),
        F.sum("pp1").alias("sp1"),
        F.sum("pp0").alias("sp0"),
    )
    lasp = F.col("sl1").cast("double") / F.col("sl0").cast("double")
    paas = F.col("sp1").cast("double") / F.col("sp0").cast("double")
    return agg.select(
        "n_parts",
        det_round(lasp, 6).alias("laspeyres"),
        det_round(paas, 6).alias("paasche"),
        det_round(F.sqrt(lasp * paas), 6).alias("fisher"),
    )


def events_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelations (lags 1-5) of each event type's
    daily-mean series via the Durbin-Levinson recursion - the
    statistic that isolates the DIRECT lag-k dependence (the AR-order
    picker next to `events_acf`'s raw autocorrelations).
    Autocovariances ride the exact integer lattice (d_t = n*x_t - Sx
    as longs; lagged products summed as DECIMAL(38,0) <-> HUGEINT, so
    every rho_k is one mirrored division of exact integers); the
    5-level recursion is unrolled as plain column arithmetic, bit-
    identical cross-engine. Output per type: pacf_1..pacf_5
    (det_round 6; pacf_1 = rho_1 by construction).
    Scale: daily-grain aggregate, then <=30 rows per type."""
    events = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    centi = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    daily = (
        events.select(
            "event_type", F.col("ts").cast("date").alias("day"), centi.alias("v")
        )
        .groupBy("event_type", "day")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("nd"))
        .select(
            "event_type",
            "day",
            F.floor(
                (F.col("s") * F.lit(10000)).cast("double")
                / F.col("nd").cast("double")
                + F.lit(0.5)
            )
            .cast("long")
            .alias("dm"),
        )
    )
    st = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("dm").alias("sx")
    )
    d = daily.join(F.broadcast(st), "event_type").select(
        "event_type",
        "day",
        "n",
        (F.col("dm") * F.col("n") - F.col("sx")).alias("d"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = d.select(
        "event_type",
        "d",
        *[F.lead("d", k).over(w).alias(f"d{k}") for k in range(1, 6)],
    )
    sums = lagged.groupBy("event_type").agg(
        F.sum(F.col("d").cast("decimal(38,0)") * F.col("d")).alias("den"),
        *[
            F.sum(F.col("d").cast("decimal(38,0)") * F.col(f"d{k}")).alias(
                f"num{k}"
            )
            for k in range(1, 6)
        ],
    )
    rho = {
        k: F.col(f"num{k}").cast("double") / F.col("den").cast("double")
        for k in range(1, 6)
    }
    # Durbin-Levinson, unrolled; phi[k][j] as plain expressions
    phi = {1: {1: rho[1]}}
    pacf = {1: rho[1]}
    for k in range(2, 6):
        num = rho[k]
        den = F.lit(1.0)
        for j in range(1, k):
            num = num - phi[k - 1][j] * rho[k - j]
            den = den - phi[k - 1][j] * rho[j]
        kk = num / den
        phi[k] = {k: kk}
        for j in range(1, k):
            phi[k][j] = phi[k - 1][j] - kk * phi[k - 1][k - j]
        pacf[k] = kk
    return sums.select(
        "event_type",
        *[det_round(pacf[k], 6).alias(f"pacf_{k}") for k in range(1, 6)],
    ).orderBy("event_type")


def events_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral entropy of each event type's daily series - Shannon
    entropy of the normalized periodogram (periods 2-14 days): low
    entropy = power concentrated at one rhythm (strongly periodic),
    high = flat spectrum (noise-like). COMPOSES on the registered
    `events_periodogram` output (its det_round-6 power is already an
    exact 1e-6 grid value, so pw = floor(power*1e6+0.5) recovers
    exact longs); q_p = pw/total is one mirrored division, each
    q*ln(q) term is nano-floored before the cross-bin sum (exact
    int64 reduction), and the oracle literally wraps the periodogram
    oracle SQL as a CTE - composition without drift. Emits entropy in
    nats and the ln(n_bins)-normalized flatness ratio."""
    pg = events_periodogram(spark, sf_dir)
    bins = pg.where(F.col("power") > 0).select(
        "event_type",
        F.floor(F.col("power") * F.lit(1000000.0) + F.lit(0.5))
        .cast("long")
        .alias("pw"),
    )
    tot = bins.groupBy("event_type").agg(
        F.sum("pw").alias("total"), F.count(F.lit(1)).alias("n_bins")
    )
    q = F.col("pw").cast("double") / F.col("total").cast("double")
    terms = bins.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "n_bins",
        F.floor(q * F.log(q) * F.lit(1e9) + F.lit(0.5)).cast("long").alias("t"),
    )
    agg = terms.groupBy("event_type", "n_bins").agg(F.sum("t").alias("s"))
    h = -(F.col("s").cast("double")) / F.lit(1e9)
    return agg.select(
        "event_type",
        F.col("n_bins").cast("long").alias("n_bins"),
        det_round(h, 6).alias("spectral_entropy_nats"),
        det_round(h / F.log(F.col("n_bins").cast("double")), 6).alias(
            "flatness_ratio"
        ),
    ).orderBy("event_type")


def events_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands over each event type's daily-mean series:
    trailing 7-day rolling mean +/- 2 rolling population-stddev, with
    breach flags - the classic volatility envelope. The rolling
    moments ride exact integer window sums (micro-grid means; squares
    as DECIMAL(38,0)), so mid/sigma are one mirrored division and one
    IEEE sqrt from exact integers; breach tests compare exact-integer
    cross-multiplications (dm*w - sx vs 2*w*sqrt(...)) expressed on
    the same doubles both engines see. Emits only complete 7-day
    windows. Scale: daily aggregate + a 7-row bounded window."""
    events = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    centi = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    daily = (
        events.select(
            "event_type", F.col("ts").cast("date").alias("day"), centi.alias("v")
        )
        .groupBy("event_type", "day")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("nd"))
        .select(
            "event_type",
            "day",
            F.floor(
                (F.col("s") * F.lit(10000)).cast("double")
                / F.col("nd").cast("double")
                + F.lit(0.5)
            )
            .cast("long")
            .alias("dm"),
        )
    )
    w7 = (
        Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    )
    rolled = daily.select(
        "event_type",
        "day",
        "dm",
        F.count(F.lit(1)).over(w7).alias("w"),
        F.sum("dm").over(w7).alias("sx"),
        F.sum(F.col("dm").cast("decimal(38,0)") * F.col("dm"))
        .over(w7)
        .alias("sxx"),
    ).where(F.col("w") == 7)
    wn = F.col("w").cast("double")
    mid = F.col("sx").cast("double") / wn / F.lit(1000000.0)
    var_num = (
        wn * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    sigma = F.sqrt(var_num) / wn / F.lit(1000000.0)
    dmd = F.col("dm").cast("double") / F.lit(1000000.0)
    return rolled.select(
        "event_type",
        "day",
        det_round(dmd, 6).alias("value"),
        det_round(mid, 6).alias("mid"),
        det_round(mid - F.lit(2.0) * sigma, 6).alias("lower"),
        det_round(mid + F.lit(2.0) * sigma, 6).alias("upper"),
        F.when(dmd > mid + F.lit(2.0) * sigma, 1)
        .when(dmd < mid - F.lit(2.0) * sigma, -1)
        .otherwise(0)
        .cast("int")
        .alias("breach"),
    ).orderBy("event_type", "day")


def lineitem_two_way_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-way ANOVA of order quantity by brand x return flag - main
    effects and their interaction via the standard decomposition
    SS_AB = SS_cells - SS_A - SS_B (the balanced-design identity,
    documented as the Type-I-style approximation on unbalanced data),
    F statistics for all three against the within-cell error. Every
    group/cell sum is an exact integer; each S_g^2/n_g term is
    quantized to the 1e-6 grid before the cross-group sum (the
    dow_anova device); the rest is fixed-order doubles.
    Scale: three map-side-combinable aggregates over the same scan
    (brand marginal, flag marginal, cells) plus one Sxx aggregate -
    nothing after them sees data."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey"),
        F.col("l_returnflag").alias("b"),
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("x"),
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_brand").alias("a")
    )
    rows = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "a", "b", "x"
    )
    d38 = "decimal(38,0)"

    def ss_terms(df: DataFrame, keys: list[str], alias: str) -> DataFrame:
        g = df.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("ng"),
            F.sum(F.col("x").cast(d38)).alias("sg"),
        )
        term = F.floor(
            (F.col("sg") * F.col("sg")).cast("double")
            / F.col("ng").cast("double")
            * F.lit(1e6)
            + F.lit(0.5)
        ).cast("long")
        return g.agg(
            F.count(F.lit(1)).alias(f"k_{alias}"),
            F.sum(term).alias(f"t_{alias}"),
        )

    ta = ss_terms(rows, ["a"], "a")
    tb = ss_terms(rows, ["b"], "b")
    tc = ss_terms(rows, ["a", "b"], "c")
    tot = rows.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(d38)).alias("s"),
        F.sum(F.col("x").cast(d38) * F.col("x")).alias("q"),
    )
    j = tot.crossJoin(ta).crossJoin(tb).crossJoin(tc)
    nd = F.col("n").cast("double")
    grand = (F.col("s") * F.col("s")).cast("double") / nd
    ss = {
        k: F.col(f"t_{k}").cast("double") / F.lit(1e6) - grand
        for k in ("a", "b", "c")
    }
    ss_ab = ss["c"] - ss["a"] - ss["b"]
    ssw = F.col("q").cast("double") - F.col("t_c").cast("double") / F.lit(1e6)
    ka, kb, kc = (F.col(f"k_{k}").cast("double") for k in ("a", "b", "c"))
    dfw = nd - kc
    msw = ssw / dfw
    return j.select(
        F.col("n").alias("n_rows"),
        F.col("k_a").cast("long").alias("n_brands"),
        F.col("k_b").cast("long").alias("n_flags"),
        det_round((ss["a"] / (ka - F.lit(1.0))) / msw, 6).alias("f_brand"),
        det_round((ss["b"] / (kb - F.lit(1.0))) / msw, 6).alias("f_flag"),
        det_round(
            (ss_ab / ((ka - F.lit(1.0)) * (kb - F.lit(1.0)))) / msw, 6
        ).alias("f_interaction"),
        det_round(ss["c"] / (ss["c"] + ssw), 6).alias("eta2_cells"),
    )


def events_hw_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin backtest of the Holt-Winters forecaster - the
    standard time-series cross-validation: for each origin o in
    21..28, refit on days 1..o (the SAME hw_final_state fold over the
    array prefix) and score the 1-step-ahead forecast against the
    actual, with the seasonal-naive (y[o-6]) as baseline. Reports
    per-type MAE/RMSE and the MASE-style ratio (HW absolute error sum
    / seasonal-naive absolute error sum, exact integer ratio) - the
    honest answer to "is the forecaster better than repeating last
    week". Per-origin errors are micro-floored BEFORE the cross-
    origin sums (exact int64 reductions).
    Scale: the daily aggregate is the only data-sized stage; the 8
    refits fold over <=28-element arrays per type."""
    events = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    centi = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    daily = (
        events.select(
            "event_type", F.col("ts").cast("date").alias("day"), centi.alias("v")
        )
        .groupBy("event_type", "day")
        .agg(F.sum("v").alias("cent"))
    )
    ser = daily.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("day"), F.col("cent")))),
            lambda s: s["cent"],
        ).alias("y")
    ).where(F.size("y") >= 22)
    origins = spark.range(21, 29).select(F.col("id").cast("int").alias("o"))
    runs = (
        ser.crossJoin(F.broadcast(origins))
        .where(F.col("o") < F.size("y"))
        .select(
            "event_type",
            "o",
            F.slice(F.col("y"), 1, F.col("o")).alias("yp"),
            (
                F.element_at(F.col("y"), F.col("o") + 1).cast("double")
                / F.lit(100.0)
            ).alias("actual"),
            (
                F.element_at(F.col("y"), F.col("o") - 6).cast("double")
                / F.lit(100.0)
            ).alias("naive_pred"),
        )
    )
    st = hw_final_state(F.col("yp"))
    f1 = (st["l"] + st["b"]) + F.element_at(st["seas"], 1)
    errs = runs.select(
        "event_type",
        F.floor(F.abs(f1 - F.col("actual")) * F.lit(1000000.0) + F.lit(0.5))
        .cast("long")
        .alias("e"),
        F.floor(
            F.abs(F.col("naive_pred") - F.col("actual")) * F.lit(1000000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("ne"),
    )
    agg = errs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_origins"),
        F.sum("e").alias("se"),
        F.sum(F.col("e").cast("decimal(38,0)") * F.col("e")).alias("se2"),
        F.sum("ne").alias("sne"),
    )
    nd = F.col("n_origins").cast("double")
    return agg.select(
        "event_type",
        "n_origins",
        det_round(F.col("se").cast("double") / nd / F.lit(1000000.0), 6).alias(
            "hw_mae"
        ),
        det_round(
            F.sqrt(F.col("se2").cast("double") / nd) / F.lit(1000000.0), 6
        ).alias("hw_rmse"),
        det_round(F.col("sne").cast("double") / nd / F.lit(1000000.0), 6).alias(
            "naive_mae"
        ),
        det_round(
            F.col("se").cast("double") / F.col("sne").cast("double"), 6
        ).alias("mase_ratio"),
    ).orderBy("event_type")


#: SPRT constants (Wald): H0 p=0.18 vs H1 p=0.22 on the purchase
#: share, alpha=0.05 / beta=0.2. Log-likelihood increments and the
#: decision boundaries are pre-floored to a 1e-9 integer grid at
#: module load (python math.log) and embedded as the SAME literals in
#: the SQL oracle — the whole walk is exact int64 arithmetic.
import math as _math

SPRT_P0, SPRT_P1 = 0.18, 0.22
SPRT_LLR_SUCCESS = _math.floor(_math.log(SPRT_P1 / SPRT_P0) * 1e9 + 0.5)
SPRT_LLR_FAILURE = _math.floor(
    _math.log((1 - SPRT_P1) / (1 - SPRT_P0)) * 1e9 + 0.5
)
SPRT_UPPER = _math.floor(_math.log((1 - 0.2) / 0.05) * 1e9 + 0.5)
SPRT_LOWER = _math.floor(_math.log(0.2 / (1 - 0.05)) * 1e9 + 0.5)


def ab_sprt_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability ratio test run over each A/B
    cohort's event stream in arrival order - the sequential-testing
    complement to the fixed-horizon `ab_test_purchase_value`: instead
    of waiting for all data, the cumulative log-likelihood ratio
    (H1: purchase share 0.22 vs H0: 0.18; alpha=.05, beta=.2) walks
    until it crosses a Wald boundary, and the test reports HOW FEW
    events the decision needed. Cohorts are the standard md5 split;
    LLR increments and boundaries are module-constant 1e-9-grid
    integers (SPRT_*), so the walk, the crossing test, and the
    stopping index are exact int64 end to end.
    Scale: one shuffle per cohort for the total-ordered cumsum; the
    crossing scan is the same window pass. Output per cohort:
    n_events, the decision, the stopping index, and the LLR there."""
    from stream_processing_system_spark.functions.scalar import md5_prefix_long

    events = load_table(spark, sf_dir, "events")
    obs = events.select(
        (md5_prefix_long(F.col("user_id").cast("string"), salt="ab|") % 2).alias(
            "cohort"
        ),
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", F.lit(SPRT_LLR_SUCCESS))
        .otherwise(F.lit(SPRT_LLR_FAILURE))
        .alias("llr"),
    )
    w = Window.partitionBy("cohort").orderBy("ts", "event_id")
    walked = obs.select(
        "cohort",
        F.row_number().over(w).alias("step"),
        F.sum("llr").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cum"
        ),
    )
    crossings = walked.where(
        (F.col("cum") >= F.lit(SPRT_UPPER)) | (F.col("cum") <= F.lit(SPRT_LOWER))
    )
    first = crossings.groupBy("cohort").agg(F.min("step").alias("stop_step"))
    at = first.join(
        walked.withColumnRenamed("cum", "stop_cum"),
        (first["cohort"] == walked["cohort"])
        & (first["stop_step"] == walked["step"]),
    ).select(first["cohort"], "stop_step", "stop_cum")
    totals = walked.groupBy("cohort").agg(F.count(F.lit(1)).alias("n_events"))
    return (
        totals.join(at, "cohort", "left")
        .select(
            "cohort",
            "n_events",
            F.when(F.col("stop_cum") >= SPRT_UPPER, F.lit("accept_h1"))
            .when(F.col("stop_cum") <= SPRT_LOWER, F.lit("accept_h0"))
            .otherwise(F.lit("continue"))
            .alias("decision"),
            F.coalesce(F.col("stop_step"), F.lit(-1).cast("int")).alias(
                "stop_step"
            ),
            det_round(
                F.coalesce(F.col("stop_cum"), F.lit(0).cast("long")).cast(
                    "double"
                )
                / F.lit(1e9),
                6,
            ).alias("llr_at_stop"),
        )
        .orderBy("cohort")
    )


def events_isotonic_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted isotonic (non-decreasing in hour-of-day) regression of
    mean event value per type - the PAV fit computed via the MINIMAX
    characterization fit(i) = max_{j<=i} min_{k>=i} weightedAvg(j..k),
    which turns the sequential pool-adjacent-violators algorithm into
    three pure relational passes over a (type, i, j, k) grid (24^3
    combinations per type - constant work at ANY corpus size). Every
    interval average is one division of exact prefix-sum integers
    (centi totals / counts), so the min/max lattice is deterministic
    doubles cross-engine. The standard calibration primitive (e.g.
    monotone probability calibration) expressed Spark-first.
    Scale: one hourly aggregate sees the data; the grid never does."""
    events = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    centi = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    hourly = (
        events.select("event_type", F.hour("ts").alias("h"), centi.alias("v"))
        .groupBy("event_type", "h")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    wh = Window.partitionBy("event_type").orderBy("h")
    pref = hourly.select(
        "event_type",
        "h",
        "s",
        "n",
        F.sum("s").over(wh.rowsBetween(Window.unboundedPreceding, 0)).alias("ps"),
        F.sum("n").over(wh.rowsBetween(Window.unboundedPreceding, 0)).alias("pn"),
    ).localCheckpoint(eager=True)
    # interval averages avg(j..k) from prefix differences; j,k are
    # POSITIONS in the per-type hour order (hours may be sparse)
    pos = pref.select(
        "event_type",
        F.row_number().over(wh).alias("p"),
        "h",
        "s",
        "n",
        "ps",
        "pn",
    )
    lo = pos.select(
        "event_type",
        F.col("p").alias("j"),
        (F.col("ps") - F.col("s")).alias("ps0"),
        (F.col("pn") - F.col("n")).alias("pn0"),
    )
    hi = pos.select(
        "event_type",
        F.col("p").alias("k"),
        F.col("ps").alias("ps1"),
        F.col("pn").alias("pn1"),
    )
    ivals = (
        lo.join(hi, "event_type")
        .where(F.col("j") <= F.col("k"))
        .select(
            "event_type",
            "j",
            "k",
            (
                (F.col("ps1") - F.col("ps0")).cast("double")
                / (F.col("pn1") - F.col("pn0")).cast("double")
                / F.lit(100.0)
            ).alias("avg"),
        )
    )
    anchors = pos.select("event_type", F.col("p").alias("i"), "h", "s", "n")
    inner = (
        anchors.join(ivals, "event_type")
        .where((F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")))
        .groupBy("event_type", "i", "h", "s", "n", "j")
        .agg(F.min("avg").alias("m"))
    )
    fit = inner.groupBy("event_type", "i", "h", "s", "n").agg(
        F.max("m").alias("fit")
    )
    obs = F.col("s").cast("double") / F.col("n").cast("double") / F.lit(100.0)
    return fit.select(
        "event_type",
        "h",
        det_round(obs, 6).alias("observed_mean"),
        det_round(F.col("fit"), 6).alias("isotonic_fit"),
    ).orderBy("event_type", "h")


def events_voptimal_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V-optimal histogram (Jagadish et al. 1998) of each event
    type's daily-mean series: the 6-bucket partition minimizing total
    within-bucket variance (SSE) - the classic optimizer-synopsis
    structure, built here by the exact O(B*n^2) dynamic program
    unrolled over B as SIX relational levels (each level is one join
    on prefix sums + one argmin aggregate; no recursion, no
    collect). Segment SSEs come from exact prefix sums and are
    unit-floored to longs, so the DP lattice, argmins (smallest-s
    tie-break) and the backtracked boundaries are exact integers
    cross-engine.
    Output per (type, bucket): day-position range, bucket SSE, and
    the total (all micro^2 units on the daily-mean grid).
    Scale: the daily aggregate sees the data; the DP grid is
    30 x 30 x 6 per type."""
    events = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    centi = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    daily = (
        events.select(
            "event_type", F.col("ts").cast("date").alias("day"), centi.alias("v")
        )
        .groupBy("event_type", "day")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("nd"))
        .select(
            "event_type",
            "day",
            F.floor(
                (F.col("s") * F.lit(10000)).cast("double")
                / F.col("nd").cast("double")
                + F.lit(0.5)
            )
            .cast("long")
            .alias("dm"),
        )
    )
    wh = Window.partitionBy("event_type").orderBy("day")
    pref = daily.select(
        "event_type",
        F.row_number().over(wh).alias("p"),
        F.sum("dm").over(wh.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "sx"
        ),
        F.sum(F.col("dm").cast("decimal(38,0)") * F.col("dm"))
        .over(wh.rowsBetween(Window.unboundedPreceding, 0))
        .alias("sxx"),
    ).localCheckpoint(eager=True)
    zero = pref.select("event_type").distinct().select(
        "event_type",
        F.lit(0).alias("p"),
        F.lit(0).cast("long").alias("sx"),
        F.lit(0).cast("decimal(38,0)").alias("sxx"),
    )
    nodes = pref.unionByName(zero)
    lo = nodes.select(
        "event_type",
        F.col("p").alias("s"),
        F.col("sx").alias("sx0"),
        F.col("sxx").alias("sxx0"),
    )
    hi = pref.select(
        "event_type",
        F.col("p").alias("t"),
        F.col("sx").alias("sx1"),
        F.col("sxx").alias("sxx1"),
    )
    dsx = (F.col("sx1") - F.col("sx0")).cast("double")
    sse_expr = (
        (F.col("sxx1") - F.col("sxx0")).cast("double")
        - dsx * dsx / (F.col("t") - F.col("s")).cast("double")
    )
    seg = (
        lo.join(hi, "event_type")
        .where(F.col("s") < F.col("t"))
        .select(
            "event_type",
            "s",
            "t",
            F.floor(sse_expr + F.lit(0.5)).cast("long").alias("sse"),
        )
        .localCheckpoint(eager=True)
    )
    # level 1: F_1(t) = sse(0, t)
    level = seg.where(F.col("s") == 0).select(
        "event_type", F.col("t").alias("p"), F.col("sse").alias("f"),
        F.lit(0).cast("long").alias("arg"),
    )
    levels = {1: level}
    for b in range(2, 7):
        prev = levels[b - 1].select(
            "event_type", F.col("p").alias("s"), F.col("f").alias("fprev")
        )
        cand = prev.join(seg, ["event_type", "s"]).where(
            F.col("s") >= F.lit(b - 1)
        )
        best = (
            cand.select(
                "event_type",
                F.col("t").alias("p"),
                (F.col("fprev") + F.col("sse")).alias("tot"),
                F.col("s").cast("long").alias("arg"),
            )
            .groupBy("event_type", "p")
            .agg(F.min(F.struct(F.col("tot"), F.col("arg"))).alias("m"))
            .select(
                "event_type",
                "p",
                F.col("m.tot").alias("f"),
                F.col("m.arg").alias("arg"),
            )
        )
        levels[b] = best.localCheckpoint(eager=True)
    n_per = pref.groupBy("event_type").agg(F.max("p").alias("n"))
    # backtrack boundaries: e_6 = n, s_b = arg at (e_b, b)
    bounds = n_per.select("event_type", F.col("n").alias("e6"))
    ends = {6: F.col("e6")}
    cur = bounds
    for b in range(6, 0, -1):
        lv = levels[b].select(
            "event_type",
            F.col("p").alias(f"e{b}"),
            F.col("arg").alias(f"e{b - 1}"),
            *( [F.col("f").alias("total_sse")] if b == 6 else [] ),
        )
        cur = cur.join(lv, ["event_type", f"e{b}"])
    out = None
    for b in range(1, 7):
        piece = cur.select(
            "event_type",
            F.lit(b).alias("bucket"),
            (F.col(f"e{b - 1}") + 1).cast("long").alias("start_pos"),
            F.col(f"e{b}").cast("long").alias("end_pos"),
            "total_sse",
        )
        out = piece if out is None else out.unionByName(piece)
    withsse = out.join(
        seg.select(
            "event_type",
            (F.col("s") + 1).cast("long").alias("start_pos"),
            F.col("t").cast("long").alias("end_pos"),
            F.col("sse").alias("bucket_sse"),
        ),
        ["event_type", "start_pos", "end_pos"],
    )
    return withsse.select(
        "event_type", "bucket", "start_pos", "end_pos", "bucket_sse",
        "total_sse",
    ).orderBy("event_type", "bucket")


def events_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the right-tail index of the value
    distribution per event type: alpha_hat = 1 / mean(ln(x_(i) /
    x_(k+1))) over the top k=100 order statistics - the standard
    heavy-tail diagnostic (alpha < 2 means infinite variance;
    pricing/fraud pipelines gate on it). Order statistics come from
    an exact centi-grid rank window (total order: value desc, event
    id asc); each ln ratio is milli-floored BEFORE the k-term sum
    (exact int64 reduction), and alpha is one mirrored division.
    Emits alpha_hat and the threshold x_(k+1).
    Scale: one top-(k+1) per type (TakeOrderedAndProject-shaped
    window), k constant - the scan dominates, the estimator is
    free."""
    k = 100
    events = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & (F.col("value") > 0)
    )
    centi = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    w = Window.partitionBy("event_type").orderBy(
        F.desc("c"), F.asc("event_id")
    )
    ranked = (
        events.select("event_type", "event_id", centi.alias("c"))
        .where(F.col("c") > 0)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k + 1)
    )
    thresh = ranked.where(F.col("rn") == k + 1).select(
        "event_type", F.col("c").alias("ck1")
    )
    terms = (
        ranked.where(F.col("rn") <= k)
        .join(thresh, "event_type")
        .select(
            "event_type",
            "ck1",
            F.floor(
                F.log(
                    F.col("c").cast("double") / F.col("ck1").cast("double")
                )
                * F.lit(1000.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("t"),
        )
    )
    agg = terms.groupBy("event_type", "ck1").agg(
        F.count(F.lit(1)).alias("n_top"), F.sum("t").alias("s")
    )
    mean_ln = F.col("s").cast("double") / F.col("n_top").cast("double") / F.lit(
        1000.0
    )
    return agg.select(
        "event_type",
        F.col("n_top").cast("long").alias("k"),
        det_round(F.col("ck1").cast("double") / F.lit(100.0), 6).alias(
            "threshold"
        ),
        det_round(F.lit(1.0) / mean_ln, 6).alias("alpha_hat"),
    ).orderBy("event_type")


def orders_littles_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's law audit: L = lambda * W computed two INDEPENDENT
    ways - W and lambda from per-order durations (close = day after
    the last lineitem ships, the backlog-timeline convention), L from
    the time-weighted sweep-line backlog integral - and the exact
    integer identity sum(backlog * day-gaps) == sum(order durations)
    checked in the result itself (littles_ratio = 1.0 when the two
    pipelines are consistent; dashboard L != lambda*W mismatches come
    from inconsistent windows/conventions, which this query would
    surface as ratio != 1). All date arithmetic and both integrals
    are exact longs; the three operational quantities are one
    mirrored division each.
    Scale: the duration aggregate is map-side combinable; the sweep
    line is the ~2500-row calendar frame."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    closes = li.groupBy("l_orderkey").agg(
        F.date_add(F.max(F.col("l_shipdate").cast("date")), 1).alias("close")
    )
    spans = orders.join(
        closes, orders.o_orderkey == closes.l_orderkey
    ).select(
        F.col("o_orderdate").cast("date").alias("open"), "close"
    )
    dur = spans.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.datediff("close", "open")).alias("sum_order_days"),
        F.min("open").alias("h0"),
        F.max("close").alias("h1"),
    )
    opens = spans.groupBy(F.col("open").alias("day")).agg(
        F.count(F.lit(1)).alias("d")
    )
    closed = spans.groupBy(F.col("close").alias("day")).agg(
        (-F.count(F.lit(1))).alias("d")
    )
    deltas = opens.unionAll(closed).groupBy("day").agg(
        F.sum("d").alias("delta")
    )
    w = Window.orderBy("day")
    timeline = deltas.select(
        "day",
        F.sum("delta")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("open_orders"),
        F.lead("day").over(w).alias("nxt"),
    )
    integral = timeline.where(F.col("nxt").isNotNull()).agg(
        F.sum(F.col("open_orders") * F.datediff("nxt", "day")).alias(
            "sum_backlog_days"
        )
    )
    j = dur.crossJoin(integral)
    t = F.datediff("h1", "h0").cast("double")
    nd = F.col("n_orders").cast("double")
    return j.select(
        "n_orders",
        F.datediff("h1", "h0").cast("long").alias("horizon_days"),
        F.col("sum_order_days").cast("long").alias("sum_order_days"),
        F.col("sum_backlog_days").cast("long").alias("sum_backlog_days"),
        det_round(F.col("sum_backlog_days").cast("double") / t, 6).alias(
            "l_avg"
        ),
        det_round(nd / t, 6).alias("lambda_per_day"),
        det_round(F.col("sum_order_days").cast("double") / nd, 6).alias(
            "w_days"
        ),
        det_round(
            F.col("sum_backlog_days").cast("double")
            / F.col("sum_order_days").cast("double"),
            6,
        ).alias("littles_ratio"),
    )


# --------------------------------------------------------------------------
# Round-4 additions: TPC-H Q12 completion + calendar arithmetic +
# leakage-free categorical encoding.
# --------------------------------------------------------------------------

#: TPC-H Q12's shipmode domain; the synthetic lineitem has no
#: l_shipmode column, so it is derived deterministically (md5 pick
#: per line, mirrored byte-identically in the DuckDB oracle — the
#: same device as operators/geospatial.derive_points).
SHIPMODES = ["MAIL", "SHIP", "AIR", "TRUCK", "RAIL", "FOB", "REG AIR"]


def lineitem_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes and order priority) — the last of
    the 22 TPC-H shapes: among 1996-shipped lineitems that were LATE
    (shipped >60 days after the order date, the same lateness proxy
    as Q4/order_priority_counts), count critical-priority
    (1-URGENT/2-HIGH) vs other orders per ship mode. One
    partial+final hash aggregate after an equi-join whose date
    filters all push into the parquet scan; the derived-shipmode
    expression is codegen'd, adds no shuffle."""
    from stream_processing_system_spark.functions.scalar import md5_prefix_long

    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders")
    key = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit("-"),
        F.col("l_linenumber").cast("string"),
    )
    idx = (md5_prefix_long(key, salt="mode|") % F.lit(7)).cast("int")
    modes = F.array(*[F.lit(m) for m in SHIPMODES])
    j = (
        li.withColumn("l_shipmode", F.element_at(modes, idx + F.lit(1)))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.groupBy("l_shipmode")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_shipmode")
    )


def _business_days(d0, d1):
    """Weekday count in (d0, d1]: closed-form calendar arithmetic —
    full weeks contribute 5, the partial week is an unrolled 6-term
    guard sum over day-of-week offsets (identical integer expression
    tree in the SQL oracle; no UDF, no per-day explode). `u` is
    0=Sunday..6=Saturday (Spark dayofweek() is 1-based from Sunday;
    DuckDB dayofweek() is 0-based from Sunday — constant shift)."""
    n = F.datediff(d1, d0)
    f = F.floor(n / F.lit(7)).cast("long")
    r = (n % F.lit(7)).cast("long")
    u = (F.dayofweek(d0) - F.lit(1)).cast("long")
    extra = F.lit(0).cast("long")
    for k in range(1, 7):
        wk = (u + F.lit(k)) % F.lit(7)
        extra = extra + F.when(
            (F.lit(k) <= r) & (wk >= F.lit(1)) & (wk <= F.lit(5)), 1
        ).otherwise(0)
    return f * F.lit(5) + extra


def orders_business_day_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency in BUSINESS days (Mon-Fri) per order
    priority — the calendar-arithmetic operator every ops dashboard
    needs and naive datediff gets wrong. The weekday count is a
    closed-form expression (no calendar explode: a per-day unnest
    would be a 60x row multiplier at 100 TB), so the whole query is
    one scan-side projection + one aggregate. avg is a single
    division of exact integer sums — IEEE-identical cross-engine."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).where(
        F.col("l_shipdate") >= F.col("o_orderdate")
    )
    bd = _business_days(F.col("o_orderdate"), F.col("l_shipdate"))
    return (
        j.select("o_orderpriority", bd.alias("_bd"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            (
                F.sum("_bd").cast("double") / F.count(F.lit(1)).cast("double")
            ).alias("avg_bdays"),
            F.max("_bd").cast("long").alias("max_bdays"),
        )
        .orderBy("o_orderpriority")
    )


def target_encoding_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free K-fold mean-target encoding of p_brand against
    the return target (l_returnflag = 'R'): each fold's encoding is
    the return rate computed over the OTHER four folds —
    (total_pos − fold_pos) / (total_n − fold_n) from one grouped
    aggregate plus a brand-partitioned window sum, so the encoder is
    two narrow shuffles over (brand, fold) cells regardless of fact
    size (25 brands × 5 folds = 125 cells at any scale). The
    held-out arithmetic is exact integer sums with ONE final
    division — hash-identical cross-engine, and the pattern (encode
    on out-of-fold statistics only) is the standard guard against
    target leakage in feature pipelines."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    cells = j.groupBy(
        "p_brand", (F.col("l_orderkey") % F.lit(5)).cast("long").alias("fold")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("long")
        .alias("n_pos"),
    )
    w = Window.partitionBy("p_brand")
    tot_n = F.sum("n_rows").over(w)
    tot_pos = F.sum("n_pos").over(w)
    denom = tot_n - F.col("n_rows")
    enc = F.when(
        denom > 0,
        (tot_pos - F.col("n_pos")).cast("double") / denom.cast("double"),
    )
    return cells.select(
        "p_brand",
        "fold",
        "n_rows",
        "n_pos",
        enc.alias("encoding"),
    ).orderBy("p_brand", "fold")


def woe_iv_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value scorecard binning (the
    standard credit-risk feature diagnostic): l_quantity in width-5
    buckets against the return target (l_returnflag = 'R').
    WOE(bucket) = ln( (bad_share) / (good_share) ), IV = Σ (bad_share
    − good_share)·WOE. One grouped aggregate (10 cells) + an
    unbounded window over those cells — fact-table work is a single
    partial+final count pass no matter the scale. Determinism: the
    shares are single exact-rounded divisions of integer counts; ln
    is libm so its output is micro-gridded (floor·1e9) per bucket
    BEFORE the IV sum, and the sum runs over the grid integers —
    the zipf_fit device (see memory: IEEE-exact cross-engine ops)."""
    li = load_table(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        F.floor((F.col("l_quantity") - F.lit(1.0)) / F.lit(5.0))
        .cast("long")
        .alias("bucket")
    ).agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("long")
        .alias("n_bad"),
        F.sum(F.when(F.col("l_returnflag") == "R", 0).otherwise(1))
        .cast("long")
        .alias("n_good"),
    ).where((F.col("n_bad") > 0) & (F.col("n_good") > 0))
    w = Window.partitionBy()
    tot_bad = F.sum("n_bad").over(w)
    tot_good = F.sum("n_good").over(w)
    bad_share = F.col("n_bad").cast("double") / tot_bad.cast("double")
    good_share = F.col("n_good").cast("double") / tot_good.cast("double")
    woe_q = F.floor(
        F.log(bad_share / good_share) * F.lit(1e9) + F.lit(0.5)
    ).cast("long")
    shared = cells.select(
        "bucket", "n_bad", "n_good",
        bad_share.alias("_bs"), good_share.alias("_gs"), woe_q.alias("_wq"),
    )
    term_q = F.floor(
        (F.col("_bs") - F.col("_gs")) * (F.col("_wq").cast("double") / F.lit(1e9))
        * F.lit(1e9) + F.lit(0.5)
    ).cast("long")
    scored = shared.select(
        "bucket", "n_bad", "n_good", "_wq", term_q.alias("_tq")
    )
    return scored.select(
        "bucket",
        "n_bad",
        "n_good",
        (F.col("_wq").cast("double") / F.lit(1e9)).alias("woe"),
        (F.sum("_tq").over(Window.partitionBy()).cast("double") / F.lit(1e9))
        .alias("iv_total"),
    ).orderBy("bucket")


def user_geohash_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial indexing rollup: every user's deterministic synthetic
    location (operators/geospatial.derive_points) is encoded to a
    precision-2 geohash — 5 longitude bits interleaved with 5
    latitude bits, MSB-first, grouped into two base32 chars (the
    standard public algorithm) — and activity is rolled up per cell.
    The encode is a pure codegen'd integer expression (shift/mask
    interleave; no UDF), so at 100 TB it rides the scan; the rollup
    is one hash aggregate over ≤1024 cells. Top-50 cells by user
    count, total-ordered. The oracle re-derives the interleave with
    the same integer arithmetic."""
    from stream_processing_system_spark.operators.geospatial import (
        derive_points,
        geohash_expr,
    )

    events = load_table(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    pts = derive_points(per_user.select("user_id"), "user_id").join(
        per_user, "user_id"
    )
    gh = geohash_expr(F.col("lat"), F.col("lon"), precision=2)
    return (
        pts.select(gh.alias("geohash2"), "user_id", "n_events")
        .groupBy("geohash2")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("n_events").cast("long").alias("n_events"),
        )
        .orderBy(F.col("n_users").desc(), F.col("geohash2").asc())
        .limit(50)
    )


#: Markov-attribution chain constants: the event_type domain is fixed
#: by the driver fixtures (TESTDATA.md); 'purchase' is the conversion
#: absorber. Mirrored verbatim in the SQL oracle's variant lists.
MARKOV_CHANNELS = ["click", "error", "signup", "view"]
MARKOV_ROUNDS = 10


def markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain (removal-effect) attribution — the data-driven
    alternative to last-click/linear credit (Anderl et al. 2014
    shape): user journeys (channel events up to the FIRST purchase,
    ordered by ts then event_id) define a first-order chain with
    START plus one state per channel and two absorbers (CONV on
    purchase, DROP at journey end); conversion probability from START
    is computed by K-round value iteration, once for the full chain
    and once per channel with that channel knocked out (transitions
    into it redirected to DROP); a channel's credit is its
    normalized removal effect.

    Scale shape: journey construction is two windows over
    (user_id, ts) — shuffle-partitioned by user, no driver
    collection; everything after the transition-count aggregate
    operates on a CONSTANT-size frame (|channels|+3 states squared,
    ≤ ~50 rows, replicated per knockout variant ≤ ~250) so the
    K=10 fixed-round iteration costs 10 tiny jobs regardless of
    fact-table size. Determinism: transition probabilities are
    single divisions of exact counts; each value-iteration term is
    micro-gridded (floor·1e9) BEFORE the per-state sum, sums run on
    grid integers, and the final shares are single divisions of grid
    integers — the unrolled-CTE oracle replays the identical
    recurrence."""
    events = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
    )
    return markov_attribution_from_events(events)


def _journey_transitions(events: DataFrame) -> DataFrame:
    """User journeys → first-order transition probabilities (the
    shared front half of the Markov removal-effect and Shapley
    attributions): channel events up to the FIRST purchase, ordered
    by (ts, event_id), emit START→first / step→step / last→CONV-or-
    DROP transitions; probabilities are single divisions of exact
    counts. Two user-partitioned windows, one grouped count — the
    only stages that touch fact-table-sized data."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = events.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    )
    fp = (
        ranked.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("rn").alias("fp_rn"))
    )
    j = ranked.join(fp, "user_id", "left").where(
        (F.col("event_type") != "purchase")
        & (F.col("fp_rn").isNull() | (F.col("rn") < F.col("fp_rn")))
    )
    w2 = Window.partitionBy("user_id").orderBy("rn")
    j2 = j.select(
        "user_id",
        "event_type",
        "fp_rn",
        F.row_number().over(w2).alias("jn"),
        F.lead("event_type").over(w2).alias("nxt"),
    )
    starts = j2.where(F.col("jn") == 1).select(
        F.lit("START").alias("src"), F.col("event_type").alias("dst")
    )
    # converters whose journey is empty (purchase was their first
    # event): START -> CONV directly
    direct = fp.join(
        j2.select("user_id").distinct(), "user_id", "left_anti"
    ).select(F.lit("START").alias("src"), F.lit("CONV").alias("dst"))
    mids = j2.where(F.col("nxt").isNotNull()).select(
        F.col("event_type").alias("src"), F.col("nxt").alias("dst")
    )
    lasts = j2.where(F.col("nxt").isNull()).select(
        F.col("event_type").alias("src"),
        F.when(F.col("fp_rn").isNotNull(), "CONV")
        .otherwise("DROP")
        .alias("dst"),
    )
    trans = (
        starts.union(direct)
        .union(mids)
        .union(lasts)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ws = Window.partitionBy("src")
    return trans.select(
        "src",
        "dst",
        (F.col("n").cast("double") / F.sum("n").over(ws).cast("double")).alias(
            "p"
        ),
    ).localCheckpoint()


def _chain_start_values(transp: DataFrame, variants) -> tuple[DataFrame, dict]:
    """Value-iterate the journey chain once per VARIANT — an ordered
    list of (name, allowed-channel frozenset); a transition into a
    channel outside the variant's allowed set is absorbed as DROP
    (u = 0). Returns a ONE-row DataFrame plus {variant name → the
    column holding its START value on the 1e9 grid}.

    The chain is CONSTANT-size (|channels|+1 srcs x |channels|+2
    dsts = 30 cells regardless of data size), so the ONLY Spark work
    is the pivot aggregate that produces those 30 probabilities; the
    value iteration itself runs on the DRIVER over that single
    collected row — the same constant-size-collect contract as the
    k-means/PQ trainers (K×dim rounded floats, never data). Earlier
    forms ran the rounds as unrolled selectExpr strings over a 1-row
    frame with a localCheckpoint per round to stop Catalyst
    collapsing the projections into a ~6x/round expression tree
    (36 s of analysis + a codegen overflow, measured) — that paid
    MARKOV_ROUNDS single-row checkpoint jobs (~0.2 s each) plus the
    py4j/plan overhead per round; this form pays one 1-row collect
    and zero per-round jobs.

    Bit-exactness: each Python term
    `floor(p * (q / 1e9) * 1e9 + 0.5)` evaluates the SAME IEEE-754
    double product chain, in the same left-assoc order, as the SQL
    `floor(_p_i_j * (CAST(q AS BIGINT->DOUBLE) / 1e9) * 1e9 + 0.5)`
    both Spark and the unrolled-CTE oracle executed (CPython floats
    ARE IEEE doubles; int sums are exact), so the returned grid
    integers are identical to the frame-based iteration's."""
    import math

    srcs = ["START", *MARKOV_CHANNELS]
    dsts = [*MARKOV_CHANNELS, "CONV", "DROP"]
    names = [name for name, _ in variants]
    prow = transp.groupBy().agg(
        *[
            F.coalesce(
                F.max(
                    F.when(
                        (F.col("src") == s) & (F.col("dst") == t), F.col("p")
                    )
                ),
                F.lit(0.0),
            ).alias(f"_p_{i}_{j}")
            for i, s in enumerate(srcs)
            for j, t in enumerate(dsts)
        ]
    )

    def qn(vi: int, s: str) -> str:
        return f"_q_{vi}_{srcs.index(s)}"

    row = prow.collect()[0]
    p = [
        [float(row[f"_p_{i}_{j}"]) for j in range(len(dsts))]
        for i in range(len(srcs))
    ]
    q = [[0] * len(srcs) for _ in names]
    for _ in range(MARKOV_ROUNDS):
        nq = [[0] * len(srcs) for _ in names]
        for vi, (_name, allowed) in enumerate(variants):
            for i in range(len(srcs)):
                tot = 0
                for j, t in enumerate(dsts):
                    if t == "CONV":
                        u = 1.0
                    elif t == "DROP" or t not in allowed:
                        u = 0.0
                    else:
                        u = q[vi][srcs.index(t)] / 1e9
                    tot += int(math.floor(p[i][j] * u * 1e9 + 0.5))
                nq[vi][i] = tot
        q = nq
    cols = [qn(vi, s) for vi in range(len(names)) for s in srcs]
    vals = tuple(q[vi][i] for vi in range(len(names)) for i in range(len(srcs)))
    cur = transp.sparkSession.createDataFrame(
        [vals], ", ".join(f"{c} bigint" for c in cols)
    )
    return cur, {name: qn(vi, "START") for vi, name in enumerate(names)}


def markov_attribution_from_events(events: DataFrame) -> DataFrame:
    """Core of markov_attribution over any (user_id, ts, event_id,
    event_type) frame — split out so tests can inject hand-built
    journeys and compare against an independent absorption solver."""
    transp = _journey_transitions(events)
    allset = frozenset(MARKOV_CHANNELS)
    variants = [("(none)", allset)] + [
        (c, allset - {c}) for c in MARKOV_CHANNELS
    ]
    cur, startq = _chain_start_values(transp, variants)
    per_channel = F.array(
        *[
            F.struct(
                F.lit(c).alias("channel"),
                F.col(startq[c]).alias("conv_q"),
            )
            for c in MARKOV_CHANNELS
        ]
    )
    out = cur.select(
        F.col(startq["(none)"]).alias("base_q"),
        F.explode(per_channel).alias("_e"),
    ).select("_e.channel", "_e.conv_q", "base_q")
    effect = F.col("base_q") - F.col("conv_q")
    wall = Window.partitionBy()
    return out.select(
        "channel",
        (F.col("base_q").cast("double") / F.lit(1e9)).alias("conv_base"),
        (F.col("conv_q").cast("double") / F.lit(1e9)).alias("conv_without"),
        (effect.cast("double") / F.lit(1e9)).alias("removal_effect"),
        F.when(
            F.sum(effect).over(wall) > 0,
            effect.cast("double") / F.sum(effect).over(wall).cast("double"),
        ).alias("attribution"),
    ).orderBy("channel")


#: Fixed coordinate-descent round count for the lasso (unrolled in
#: both the Spark expression chain and the SQL oracle).
LASSO_ROUNDS = 8


def lasso_coordinate_descent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1-regularized regression of extended price on standardized
    (quantity, discount) via coordinate descent (Friedman et al.
    2010 pathwise shape, one fixed λ) — the sparsity-inducing
    complement to lineitem_ols_2var's closed-form OLS. One exact
    moment pass over the fact table (the same nine DECIMAL(38,0)
    sums as OLS); the standardized correlations, λ = 0.25·max|c|,
    and LASSO_ROUNDS alternating soft-threshold updates all run as
    expressions on the single moment row — no iteration ever touches
    the data again, no driver collect. Each coordinate update is
    re-quantized to the 1e-9 grid before the other coordinate
    consumes it, so the recursion is byte-identical to the oracle's
    unrolled CTE chain."""
    li = load_table(spark, sf_dir, "lineitem")
    d38 = "decimal(38,0)"
    base = li.select(
        F.col("l_quantity").cast("long").cast(d38).alias("x1"),
        F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long").cast(d38)
        .alias("x2"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
        .cast(d38).alias("y"),
    )
    mo = base.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
    )
    nd = F.col("n").cast("double")
    mu1 = F.col("s1").cast("double") / nd
    mu2 = F.col("s2").cast("double") / nd
    muy = F.col("sy").cast("double") / nd
    sd1 = F.sqrt(F.col("s11").cast("double") / nd - mu1 * mu1)
    sd2 = F.sqrt(F.col("s22").cast("double") / nd - mu2 * mu2)
    prep = mo.select(
        F.col("n").cast("long").alias("n_rows"),
        nd.alias("_nd"),
        muy.alias("_muy"),
        ((F.col("s1y").cast("double") - nd * mu1 * muy) / sd1).alias("_c1"),
        ((F.col("s2y").cast("double") - nd * mu2 * muy) / sd2).alias("_c2"),
        ((F.col("s12").cast("double") - nd * mu1 * mu2) / (sd1 * sd2)).alias(
            "_d12"
        ),
    ).select(
        "*",
        F.greatest(F.abs(F.col("_c1")), F.abs(F.col("_c2"))).alias("_cmax"),
    ).select(
        "*", (F.lit(0.25) * F.col("_cmax")).alias("_lam")
    )

    def _soft(rho):
        return (
            F.when(rho > F.col("_lam"), rho - F.col("_lam"))
            .when(rho < -F.col("_lam"), rho + F.col("_lam"))
            .otherwise(F.lit(0.0))
        )

    def _q(x):
        return F.floor(x * F.lit(1e9) + F.lit(0.5)).cast("double") / F.lit(1e9)

    cur = prep.select("*", F.lit(0.0).alias("_b1"), F.lit(0.0).alias("_b2"))
    for _ in range(LASSO_ROUNDS):
        cur = cur.select(
            "n_rows", "_nd", "_muy", "_c1", "_c2", "_d12", "_cmax", "_lam",
            _q(_soft(F.col("_c1") - F.col("_b2") * F.col("_d12")) / F.col("_nd"))
            .alias("_b1"),
            "_b2",
        )
        cur = cur.select(
            "n_rows", "_nd", "_muy", "_c1", "_c2", "_d12", "_cmax", "_lam",
            "_b1",
            _q(_soft(F.col("_c2") - F.col("_b1") * F.col("_d12")) / F.col("_nd"))
            .alias("_b2"),
        )
    return cur.select(
        "n_rows",
        det_round(F.col("_lam")).alias("lambda_used"),
        F.col("_b1").alias("beta_qty_std"),
        F.col("_b2").alias("beta_disc_std"),
        det_round(F.col("_muy") / F.lit(100.0)).alias("intercept"),
        (
            (F.col("_b1") != 0.0).cast("int") + (F.col("_b2") != 0.0).cast("int")
        ).cast("long").alias("n_nonzero"),
    )


def als_ranking_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recommender EVALUATION harness over the rank-2 ALS factors:
    leave-one-out hit-rate@10 and NDCG@10. For every 20th customer
    with ≥2 ratings, their top rating (by quantity, part-id
    tie-break) is held out; ALS trains on the remainder
    (linalg.als_factorize, same grid recipe as customer_part_als);
    the held-out item is ranked among ALL items the user has not
    trained on by factor dot product (score desc, part asc — a total
    order).

    Scale shape: the only super-linear piece is the candidate
    scoring cross join, and it is |sampled test users| × |items| —
    the sampling rate is the knob, exactly how production recall
    evaluations bound cost (the ann_recall_curve pattern). Ranks
    come from a count-of-better aggregate, not a global sort.
    Determinism: factors live on the 1e-6 grid so scores are
    identical doubles cross-engine; per-user NDCG gains are
    micro-gridded before the final sum; hit rate is one division of
    exact counts. Held-out items that vanish from the train item set
    drop out of both engines identically (inner join on v)."""
    from stream_processing_system_spark.operators.linalg import als_factorize

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ratings = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part")
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("r"))
        .localCheckpoint(eager=True)
    )
    wc = Window.partitionBy("cust")
    wr = Window.partitionBy("cust").orderBy(
        F.col("r").desc(), F.col("part").desc()
    )
    marked = ratings.select(
        "cust",
        "part",
        "r",
        F.count(F.lit(1)).over(wc).alias("_cnt"),
        F.row_number().over(wr).alias("_rn"),
    )
    test = marked.where(
        (F.col("_rn") == 1) & (F.col("_cnt") >= 2) & (F.col("cust") % 20 == 0)
    ).select("cust", "part")
    train = ratings.join(test, ["cust", "part"], "left_anti").localCheckpoint(
        eager=True
    )
    u, v = als_factorize(train, "cust", "part", "r", rounds=2, reg=0.1)
    ut = u.join(test.select("cust", F.col("part").alias("_heldout")), "cust")
    # The held-out item's own score needs NO fan-out: it is an
    # equi-join of the test users against the item factors on the
    # held-out part id (same u·v doubles the fan-out would produce;
    # (cust, _heldout) is never in train by construction, so the
    # anti-join the fan-out path applied is vacuous here). Formerly
    # this was `cand.where(part == _heldout)`, which re-ran the
    # |test|×|items| BroadcastNestedLoopJoin a second time — the
    # single most expensive subtree in the query (guide §1.2: don't
    # compute things you throw away).
    tgt = ut.join(
        F.broadcast(v), ut["_heldout"] == v["part"]
    ).select(
        "cust",
        (F.col("u1") * F.col("v1") + F.col("u2") * F.col("v2")).alias("_st"),
        F.col("_heldout").alias("_pt"),
    )
    # item factors are K items x 3 columns — broadcast them so the
    # candidate scoring is a BroadcastNestedLoopJoin fanning out on
    # the (sampled) test-user side, never a CartesianProduct shuffle.
    # With tgt computed above, this fan-out is evaluated exactly once.
    scored = ut.crossJoin(F.broadcast(v)).select(
        "cust",
        "part",
        (F.col("u1") * F.col("v1") + F.col("u2") * F.col("v2")).alias("s"),
    )
    # Count-of-better over the candidate set (scored minus train
    # pairs) WITHOUT ever shuffling the |test|×|items| fan-out:
    # count(cand ∧ better) = count(scored ∧ better) −
    # count(scored∩train ∧ better). The first term joins the fan-out
    # against the ≤|test|-row tgt by BROADCAST (map-side filter +
    # partial aggregate — the only exchange carries ≤|test| count
    # rows); the second term re-derives the train pairs' scores from
    # `train` itself via equi-joins (|train| rows, no fan-out), so
    # the former SortMergeJoin LeftAnti that shuffled the whole
    # fan-out by (cust, part) is gone at every scale (guide §2.3/§2.4).
    better_cond = (F.col("s") > F.col("_st")) | (
        (F.col("s") == F.col("_st")) & (F.col("part") < F.col("_pt"))
    )
    nb_all = (
        scored.join(F.broadcast(tgt), "cust")
        .where(better_cond)
        .groupBy("cust")
        .agg(F.count(F.lit(1)).alias("_na"))
    )
    train_scored = (
        train.select("cust", "part")
        .join(F.broadcast(tgt), "cust")
        .join(u, "cust")
        .join(v, "part")
        .select(
            "cust",
            "part",
            (F.col("u1") * F.col("v1") + F.col("u2") * F.col("v2")).alias("s"),
            "_st",
            "_pt",
        )
    )
    nb_train = (
        train_scored.where(better_cond)
        .groupBy("cust")
        .agg(F.count(F.lit(1)).alias("_nt"))
    )
    better = nb_all.join(F.broadcast(nb_train), "cust", "left").select(
        "cust",
        (F.col("_na") - F.coalesce(F.col("_nt"), F.lit(0))).alias("_nb"),
    )
    rk = tgt.join(better, "cust", "left").select(
        "cust", (F.lit(1) + F.coalesce(F.col("_nb"), F.lit(0))).alias("rank")
    )
    gain_q = F.when(
        F.col("rank") <= 10,
        F.floor(
            F.lit(1.0) / F.log2((F.col("rank") + F.lit(1)).cast("double"))
            * F.lit(1e9)
            + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    hits = F.sum(F.when(F.col("rank") <= 10, 1).otherwise(0)).cast("long")
    # reciprocal rank is NOT cut off at 10: it exercises the full
    # count-of-better arithmetic even when no rank lands in the top
    # 10 (rank-2 factors on a 2000-item catalog rarely do), so the
    # hash check stays sensitive
    rr_q = F.floor(
        F.lit(1.0) / F.col("rank").cast("double") * F.lit(1e9) + F.lit(0.5)
    ).cast("long")
    return rk.agg(
        F.count(F.lit(1)).alias("n_test"),
        hits.alias("hits_at_10"),
        (
            hits.cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("hit_rate_at_10"),
        (
            F.sum(gain_q).cast("double")
            / (F.count(F.lit(1)).cast("double") * F.lit(1e9))
        ).alias("ndcg_at_10"),
        (
            F.sum("rank").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("mean_rank"),
        (
            F.sum(rr_q).cast("double")
            / (F.count(F.lit(1)).cast("double") * F.lit(1e9))
        ).alias("mrr"),
    )


def events_hbos_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-Based Outlier Score (Goldstein & Dengel 2012) over
    three event features — value (10 fixed-width bins over the
    observed range), hour-of-day (24 bins), day-of-week (7 bins):
    score = Σ_f −log10(p_f(bin)), the cheap unsupervised outlier
    ensemble that needs no distance joins. Top-20 by (score desc,
    event_id asc).

    Scale shape: one aggregate for the value range (2-double
    broadcast), three bin-histogram aggregates (≤41 cells total,
    broadcast back), then a map-side score projection — no shuffle
    wider than the histograms at any data size; this is why HBOS is
    the standard first pass before distance-based detectors. Each
    −log10 term is micro-gridded per bin (libm is not correctly
    rounded cross-engine) and the 3-term score is an exact integer
    sum on the grid."""
    events = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    rng = events.agg(
        F.min("value").alias("_vmin"), F.max("value").alias("_vmax")
    )
    base = events.crossJoin(F.broadcast(rng)).select(
        "event_id",
        F.least(
            F.lit(9),
            F.floor(
                (F.col("value") - F.col("_vmin"))
                / (F.col("_vmax") - F.col("_vmin"))
                * F.lit(10.0)
            ).cast("long"),
        ).alias("vbin"),
        F.hour("ts").cast("long").alias("hbin"),
        (F.dayofweek("ts") - F.lit(1)).cast("long").alias("dbin"),
    )
    def hist(col: str) -> DataFrame:
        # densities normalize by the histogram's own total (an
        # unbounded window over ≤24 post-aggregate cells) — no
        # driver-side count, no second scan
        q = F.floor(
            -F.log10(
                F.col("_c").cast("double")
                / F.sum("_c").over(Window.partitionBy()).cast("double")
            ) * F.lit(1e9)
            + F.lit(0.5)
        ).cast("long")
        return (
            base.groupBy(col)
            .agg(F.count(F.lit(1)).alias("_c"))
            .select(col, q.alias(f"_q_{col}"))
        )

    scored = (
        base.join(F.broadcast(hist("vbin")), "vbin")
        .join(F.broadcast(hist("hbin")), "hbin")
        .join(F.broadcast(hist("dbin")), "dbin")
        .select(
            "event_id",
            "vbin",
            "hbin",
            "dbin",
            (
                (F.col("_q_vbin") + F.col("_q_hbin") + F.col("_q_dbin"))
                .cast("double")
                / F.lit(1e9)
            ).alias("hbos_score"),
        )
    )
    return scored.orderBy(
        F.col("hbos_score").desc(), F.col("event_id").asc()
    ).limit(20)


def shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value channel attribution over the journey
    chain: with |channels| = 4 the coalition space is only 2⁴ = 16,
    so instead of sampling (the usual Shapley compromise) the chain's
    conversion value v(S) is computed for EVERY coalition S — the
    same knockout value iteration as markov_attribution, with the
    variant list being all subsets (a transition into a channel
    outside S absorbs as DROP) — and φ_c is the exact weighted sum
    Σ_{S⊆C∖{c}} |S|!(|C|−|S|−1)!/|C|! · (v(S∪{c}) − v(S)). Game-
    theoretically fair credit (efficiency, symmetry, null-player),
    reported with the efficiency-check residual
    (v(full) − v(∅) − Σφ — zero up to grid noise, a built-in
    self-audit the driver hashes).

    Scale shape: identical to markov_attribution — journey windows
    are the only data-sized stages; all 16 value iterations ride the
    same pivoted single-row frame (80 grid columns), so the
    coalition enumeration costs nothing extra at 100 TB. All 16
    v values are 1e9-grid integers; φ terms multiply exact grid
    differences by repr'd rational weights in a FIXED left-assoc
    order mirrored textually in the SQL oracle."""
    events = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
    )
    return shapley_attribution_from_events(events)


def shapley_attribution_from_events(events: DataFrame) -> DataFrame:
    """Core of shapley_attribution (injectable for tests)."""
    import math

    transp = _journey_transitions(events)
    chans = MARKOV_CHANNELS
    n = len(chans)

    def members(mask: int) -> frozenset:
        return frozenset(c for i, c in enumerate(chans) if mask >> i & 1)

    def vname(mask: int) -> str:
        return "S" + "".join(
            "1" if mask >> i & 1 else "0" for i in range(n)
        )

    variants = [(vname(m), members(m)) for m in range(2**n)]
    cur, startq = _chain_start_values(transp, variants)
    fact = math.factorial
    phi_exprs = []
    for ci, c in enumerate(chans):
        total = None
        for m in range(2**n):
            if m >> ci & 1:
                continue
            s_size = bin(m).count("1")
            w = fact(s_size) * fact(n - s_size - 1) / fact(n)
            term = F.lit(w) * (
                F.col(startq[vname(m | (1 << ci))]) - F.col(startq[vname(m)])
            ).cast("double")
            total = term if total is None else total + term
        phi_exprs.append(total.alias(f"_phi_{ci}"))
    piv = cur.select(
        F.col(startq[vname(2**n - 1)]).alias("vq_full"),
        F.col(startq[vname(0)]).alias("vq_empty"),
        *phi_exprs,
    )
    den = F.col("_phi_0")
    for ci in range(1, n):
        den = den + F.col(f"_phi_{ci}")
    per_channel = F.array(
        *[
            F.struct(
                F.lit(c).alias("channel"),
                F.col(f"_phi_{ci}").alias("phi"),
            )
            for ci, c in enumerate(chans)
        ]
    )
    return (
        piv.select(
            "vq_full",
            "vq_empty",
            den.alias("_den"),
            F.explode(per_channel).alias("_e"),
        )
        .select(
            F.col("_e.channel").alias("channel"),
            (F.col("vq_full").cast("double") / F.lit(1e9)).alias("conv_full"),
            (F.col("_e.phi") / F.lit(1e9)).alias("shapley_value"),
            F.when(
                F.col("_den") > 0, F.col("_e.phi") / F.col("_den")
            ).alias("shapley_share"),
            (
                (
                    (F.col("vq_full") - F.col("vq_empty")).cast("double")
                    - F.col("_den")
                )
                / F.lit(1e9)
            ).alias("efficiency_gap"),
        )
        .orderBy("channel")
    )


#: RBO depth and persistence (Webber et al. 2010); the (1-p)·p^(d-1)
#: weights are Python-computed constants embedded as repr literals in
#: both engines.
RBO_DEPTH = 20
RBO_P = 0.9


def events_rbo_daily_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap between CONSECUTIVE days' top-20 users by
    spend (Webber et al. 2010, bounded at depth 20) — the standard
    top-weighted list-similarity for monitoring ranking stability
    (search results, leaderboards, recommendations): RBO =
    (1−p)·Σ_d p^(d−1)·(|prefix overlap at d| / d), p = 0.9, so churn
    near the top costs far more than churn at rank 20.

    Scale shape: one grouped aggregate to daily per-user spend, one
    day-partitioned window for ranks (top-20 kept), one equi-join of
    adjacent days on user, one aggregate per day pair — nothing
    wider than the fact scan. Determinism: spend ranks on exact
    1e-4-grid integer sums with a (spend desc, user asc) total
    order; prefix-overlap counts are integers; the 20 RBO terms are
    repr'd-constant × single-division products summed in a fixed
    left-assoc order mirrored in the SQL text."""
    events = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & F.col("user_id").isNotNull()
    )
    daily = events.groupBy(
        F.col("ts").cast("date").alias("d"), "user_id"
    ).agg(
        F.sum(F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("v")
    )
    wd = Window.partitionBy("d").orderBy(
        F.col("v").desc(), F.col("user_id").asc()
    )
    top = daily.select(
        "d", "user_id", F.row_number().over(wd).alias("rk")
    ).where(F.col("rk") <= RBO_DEPTH)
    b = top.select(
        F.col("d").alias("_db"),
        F.col("user_id").alias("_ub"),
        F.col("rk").alias("_rkb"),
    )
    pairs = top.join(
        b,
        (F.col("user_id") == F.col("_ub"))
        & (F.col("_db") == F.date_add(F.col("d"), 1)),
    ).select(
        F.col("d").cast("string").alias("day"),
        F.greatest(F.col("rk"), F.col("_rkb")).alias("m"),
    )
    o = pairs.groupBy("day").agg(
        *[
            F.sum(F.when(F.col("m") <= d, 1).otherwise(0))
            .cast("long")
            .alias(f"_o{d}")
            for d in range(1, RBO_DEPTH + 1)
        ]
    )
    rbo_q = None
    for d in range(1, RBO_DEPTH + 1):
        # weight folded to ONE pre-scaled constant in Python
        # ((1-p)p^(d-1)/d * 1e12), each term floored onto the 1e12
        # grid, and the 20-term sum taken over INTEGERS: a plain
        # double add-chain was observed to differ by 1 ulp between
        # engines on some inputs (cross-engine FP addition order is
        # not trustworthy even for textually identical chains — the
        # standard grid device sidesteps it)
        w12 = (1.0 - RBO_P) * RBO_P ** (d - 1) / float(d) * 1e12
        term = F.floor(
            F.lit(w12) * F.col(f"_o{d}").cast("double") + F.lit(0.5)
        ).cast("long")
        rbo_q = term if rbo_q is None else rbo_q + term
    return o.select(
        "day",
        F.col(f"_o{RBO_DEPTH}").alias("n_common"),
        (rbo_q.cast("double") / F.lit(1e12)).alias("rbo"),
    ).orderBy("day")


def events_kalman_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D Kalman filter (local-level / random-walk-plus-noise model,
    Q=0.25, R=64.0, P0=64.0) over each event type's daily-count
    series — the classical recursive state estimator, run ENTIRELY as
    one higher-order `aggregate` fold over the day-ordered array
    (state = level, error variance, innovation SSE; no UDF, no
    collect — the `events_holt_winters` execution shape).

    Determinism: daily counts are exact longs, the noise constants
    are exact binary fractions, and every recursion step is a chain
    of IEEE basic ops (+,-,*,/ are correctly rounded, unlike libm),
    textually mirrored in the oracle's recursive CTE — so the
    sequential double arithmetic is bit-identical cross-engine.
    Scale: the data-sized stage is one daily-grain count aggregate;
    the fold runs on a ~30-element array per type."""
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.select("event_type", F.col("ts").cast("date").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return kalman_from_daily(daily)


def kalman_from_daily(daily: DataFrame) -> DataFrame:
    """Shared Kalman tail (day-ordered fold) over an
    (event_type, day, c) daily-counts frame — used by the batch plan
    and the streaming twin, whose drained per-day counts reduce to
    the identical frame (day may be DATE or ISO string: both sort
    chronologically)."""
    ser = daily.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("day"), F.col("c")))),
            lambda s: s["c"],
        ).alias("y")
    ).where(F.size("y") >= 2)
    y = F.col("y")
    init = F.struct(
        F.element_at(y, 1).cast("double").alias("l"),
        F.lit(64.0).alias("p"),
        F.lit(0.0).alias("sse"),
    )

    def step(st, x):
        v = x.cast("double")
        ppred = st["p"] + F.lit(0.25)
        k = ppred / (ppred + F.lit(64.0))
        innov = v - st["l"]
        return F.struct(
            (st["l"] + k * innov).alias("l"),
            ((F.lit(1.0) - k) * ppred).alias("p"),
            (st["sse"] + innov * innov).alias("sse"),
        )

    fin = F.aggregate(F.slice(y, 2, F.size(y) - 1), init, step)
    return ser.select(
        "event_type",
        F.size("y").cast("long").alias("n_days"),
        det_round(fin["l"], 6).alias("level"),
        det_round(fin["p"], 6).alias("pvar"),
        det_round(fin["sse"], 6).alias("sse"),
    ).orderBy("event_type")


def harmonic_constants(periods: int = 24, harmonics: int = 2) -> list[tuple]:
    """The hour-of-day trig design matrix, pre-floored onto the 1e9
    integer grid at plan-build time (the media_phash_dct constant-
    table device): libm cos/sin are NOT correctly rounded, so the
    constants are computed ONCE here and the same integer literals
    are embedded in both the Spark plan and the DuckDB oracle —
    cross-engine parity by construction. Rows: (h, c1, s1, c2, s2)."""
    import math

    def g(x: float) -> int:
        return int(math.floor(x * 1e9 + 0.5))

    out = []
    for h in range(periods):
        row = [h]
        for k in range(1, harmonics + 1):
            ang = 2.0 * math.pi * k * h / periods
            row.extend([g(math.cos(ang)), g(math.sin(ang))])
        out.append(tuple(row))
    return out


def events_harmonic_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic (Fourier) regression of the hour-of-day activity
    profile: counts per hour h regressed on {cos, sin}(2πkh/24) for
    k=1,2. Over a complete cycle the regressors are orthogonal, so
    the OLS solution is closed-form: a_k = (2/24)·Σ y_h·cos_kh,
    b_k likewise with sin, intercept = mean — the seasonal-shape
    fit every hourly profile dashboard wants, with R² to say how
    much of the profile the two harmonics explain.

    Determinism: y_h are exact longs; trig constants are 1e9-grid
    integers (`harmonic_constants`), so every cross-row product
    y_h·c_kh is an exact int64 and the 24-row sums are exact; SST
    uses the exact integer identity 24·Σy² − (Σy)²; residuals are
    per-row doubles from identical inputs, squared and micro-floored
    before the final exact sum. Scale: ONE aggregate over the events
    scan reduces everything to 24 rows; the constant table is a
    broadcast literal."""
    consts = harmonic_constants()
    cdf = spark.createDataFrame(
        consts, "h INT, c1 LONG, s1 LONG, c2 LONG, s2 LONG"
    )
    events = load_table(spark, sf_dir, "events")
    hourly = (
        events.select(F.hour("ts").cast("int").alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # LEFT from the constant table: an hour with zero events must
    # contribute y=0, not vanish (the closed form assumes 24 rows);
    # the aggregated hourly side is ≤24 rows — broadcast it
    j = cdf.join(F.broadcast(hourly), "h", "left").select(
        "h", "c1", "s1", "c2", "s2", F.coalesce("cnt", F.lit(0)).alias("yc")
    )
    d38 = "decimal(38,0)"
    yd = F.col("yc").cast(d38)
    sums = j.agg(
        F.sum("yc").alias("sy"),
        F.sum(yd * yd).alias("syy"),
        F.sum(yd * F.col("c1").cast(d38)).alias("sc1"),
        F.sum(yd * F.col("s1").cast(d38)).alias("ss1"),
        F.sum(yd * F.col("c2").cast(d38)).alias("sc2"),
        F.sum(yd * F.col("s2").cast(d38)).alias("ss2"),
    ).collect()[0]
    import math

    def coef(v: int) -> float:
        # (Σ y·grid) / 1e9 · 2/24, one textual order both engines
        return math.floor(
            (float(v) / 1e9) * 2.0 / 24.0 * 1e9 + 0.5
        ) / 1e9

    mean = float(sums["sy"]) / 24.0
    a1, b1 = coef(sums["sc1"]), coef(sums["ss1"])
    a2, b2 = coef(sums["sc2"]), coef(sums["ss2"])
    # fitted value per hour from the SAME gridded constants → residual
    # squared, micro-floored per row, exact integer sum
    fit = (
        F.lit(mean)
        + F.lit(a1) * (F.col("c1").cast("double") / F.lit(1e9))
        + F.lit(b1) * (F.col("s1").cast("double") / F.lit(1e9))
        + F.lit(a2) * (F.col("c2").cast("double") / F.lit(1e9))
        + F.lit(b2) * (F.col("s2").cast("double") / F.lit(1e9))
    )
    err = F.col("yc").cast("double") - fit
    sse_g = j.agg(
        F.sum(F.floor(err * err * F.lit(1e6) + F.lit(0.5)).cast("long")).alias(
            "sseg"
        )
    )
    sst = (24.0 * float(sums["syy"]) - float(sums["sy"]) * float(sums["sy"])) / 24.0
    amp1 = math.sqrt(a1 * a1 + b1 * b1)
    amp2 = math.sqrt(a2 * a2 + b2 * b2)

    def r6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    # degenerate input guard (ADVICE r5): a perfectly constant hourly
    # profile has sst == 0 — R² is undefined there, so emit NULL
    # instead of letting inf/NaN flow through det_round. sst is a
    # driver-side scalar here, so a Python branch mirrors the
    # oracle's CASE WHEN sst = 0.0 THEN NULL exactly.
    r2_col = (
        F.lit(None).cast("double")
        if sst == 0.0
        else det_round(
            F.lit(1.0) - (F.col("sseg").cast("double") / F.lit(1e6)) / F.lit(sst),
            6,
        )
    )
    return sse_g.select(
        F.lit(r6(mean)).alias("mean_count"),
        F.lit(r6(a1)).alias("a1"),
        F.lit(r6(b1)).alias("b1"),
        F.lit(r6(amp1)).alias("amp1"),
        F.lit(r6(a2)).alias("a2"),
        F.lit(r6(b2)).alias("b2"),
        F.lit(r6(amp2)).alias("amp2"),
        r2_col.alias("r2"),
    )


def events_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of each event type's cumulative daily value
    curve — the risk metric every monitoring/finance dashboard wants:
    deepest peak-to-trough fall of the running total, with the peak
    and trough days. Peak-segmentation formulation: a running-max
    breakpoint starts a new segment (exact integer comparison), each
    segment's drawdown is its opening peak minus its minimum, and
    per-type argmax breaks ties by earliest trough then earliest
    peak — fully deterministic, all arithmetic on exact centi longs
    until the final /100.
    Scale: one daily-grain aggregate, then windows over ~30 rows per
    type; nothing after the first aggregate sees data."""
    events = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    centi = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    daily = (
        events.select(
            "event_type", F.col("ts").cast("date").alias("day"), centi.alias("v")
        )
        .groupBy("event_type", "day")
        .agg(F.sum("v").alias("cent"))
    )
    return max_drawdown_from_daily(daily)


def max_drawdown_from_daily(daily: DataFrame) -> DataFrame:
    """Shared drawdown tail (peak segmentation + deterministic
    argmax) over an (event_type, day, cent) daily-totals frame —
    factored so the hand-case tests can feed a synthetic curve."""
    w_days = Window.partitionBy("event_type").orderBy("day")
    cum = F.sum("cent").over(w_days)
    prevmax = F.max(F.col("cum")).over(
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    curve = daily.select("event_type", "day", cum.alias("cum"))
    marked = curve.select(
        "*",
        F.when(prevmax.isNull() | (F.col("cum") > prevmax), 1)
        .otherwise(0)
        .alias("is_peak"),
    )
    seg = marked.select(
        "event_type",
        "day",
        "cum",
        F.sum("is_peak").over(w_days).alias("grp"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n_days"),
    )
    w_grp = Window.partitionBy("event_type", "grp")
    with_min = seg.select(
        "*",
        F.min("cum").over(w_grp).alias("gmin"),
        F.max("cum").over(w_grp).alias("peak_cum"),
        F.min("day").over(w_grp).alias("peak_day"),
    )
    per_grp = (
        with_min.select(
            "*",
            F.min(F.when(F.col("cum") == F.col("gmin"), F.col("day"))).over(
                w_grp
            ).alias("trough_day"),
        )
        .select(
            "event_type",
            "n_days",
            "grp",
            "peak_day",
            "trough_day",
            (F.col("peak_cum") - F.col("gmin")).alias("dd"),
        )
        .distinct()
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.col("dd").desc(), F.col("trough_day").asc(), F.col("peak_day").asc()
    )
    return (
        per_grp.withColumn("rn", F.row_number().over(pick))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("n_days").cast("long").alias("n_days"),
            (F.col("dd").cast("double") / F.lit(100.0)).alias("max_drawdown"),
            F.col("peak_day").cast("string").alias("peak_day"),
            F.col("trough_day").cast("string").alias("trough_day"),
        )
        .orderBy("event_type")
    )


def events_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-SHAPED deterministic pseudo-noise over daily event
    counts — a mechanism DEMO of the DP noise pipeline (Laplace
    scale b=2.0, i.e. what sensitivity-1 / ε=0.5 WOULD use), NOT a
    privacy guarantee: the noise is derived from the PUBLIC key
    md5('dp|'‖event_type‖'|'‖day) with no secret, so anyone can
    recompute it and subtract it back out (ADVICE r5). A production
    DP release would swap the salt for a run-time secret seed — the
    plumbing (inverse-CDF transform, sign/magnitude split, grid
    discipline) is exactly what that release needs, and keeping the
    seed public is what lets the cross-engine oracle verify the
    transform end-to-end. u = (md5-prefix(key)+0.5)/2^32 is an exact
    dyadic uniform, the inverse-CDF split is a mirrored CASE, and
    the one libm call per row (ln) is floored onto the 1e-6 grid
    before use — deterministic replay across engines AND runs.
    Scale: one count aggregate, then pure per-row expressions."""
    from stream_processing_system_spark.functions.scalar import md5_prefix_long

    events = load_table(spark, sf_dir, "events")
    daily = (
        events.select("event_type", F.col("ts").cast("date").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    key = F.concat(F.col("event_type"), F.lit("|"), F.col("day").cast("string"))
    u = (
        md5_prefix_long(key, salt="dp|").cast("double") + F.lit(0.5)
    ) / F.lit(4294967296.0)
    arg = F.lit(1.0) - F.lit(2.0) * F.abs(u - F.lit(0.5))
    ln_g = F.floor(F.log(arg) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    noise = (
        F.when(u > F.lit(0.5), F.lit(-2.0)).otherwise(F.lit(2.0)) * ln_g
    )
    noisy = F.floor(F.col("c").cast("double") + noise + F.lit(0.5)).cast("long")
    return (
        daily.select(
            "event_type",
            F.col("day").cast("string").alias("day"),
            noisy.alias("noisy_count"),
        )
        .orderBy("event_type", "day")
    )


def lineitem_calibration_curve(
    spark: SparkSession, sf_dir: str, iters: int = 3
) -> DataFrame:
    """Reliability diagram for the IRLS logistic model of
    `lineitem_logit_return`: predicted return probabilities bucketed
    into 10 equal-width bins, each bin reporting volume, mean
    predicted probability, observed positive rate, and the
    |gap| — the standard calibration audit run on the SAME shared
    trainer (`_logit_irls_betas`), so the coefficients match the
    classifier query exactly.

    Determinism: μ is floored onto the 1e-6 grid per row BEFORE both
    the binning (bin = gridded-μ // 100k, so the libm exp feeds an
    integer) and the bin-level mean (exact long sum of grid units);
    observed rates are exact integer ratios. Scale: one aggregate per
    IRLS round plus one 10-key groupBy — map-side combine reduces
    every task to ≤10 rows."""
    base = _logit_base(spark, sf_dir)
    b0, b1, b2, _ = _logit_irls_betas(base, iters)
    eta = (
        F.lit(b0)
        + F.lit(b1) * F.col("x1").cast("double")
        + F.lit(b2) * F.col("x2").cast("double")
    )
    mu = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
    mu_g = F.floor(mu * F.lit(1e6) + F.lit(0.5)).cast("long")
    b = F.least(F.floor(mu_g / F.lit(100000)).cast("long"), F.lit(9).cast("long"))
    binned = base.select(mu_g.alias("mu_g"), b.alias("bin"), "y")
    out = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("mu_g").alias("smu"),
        F.sum("y").alias("spos"),
    )
    mean_pred = det_round(
        (F.col("smu").cast("double") / F.lit(1e6))
        / F.col("n_rows").cast("double"),
        6,
    )
    obs_rate = det_round(
        F.col("spos").cast("double") / F.col("n_rows").cast("double"), 6
    )
    return out.select(
        "bin",
        "n_rows",
        mean_pred.alias("mean_pred"),
        obs_rate.alias("obs_rate"),
        det_round(
            F.abs(
                F.col("smu").cast("double") / F.lit(1e6)
                / F.col("n_rows").cast("double")
                - F.col("spos").cast("double") / F.col("n_rows").cast("double")
            ),
            6,
        ).alias("abs_gap"),
    ).orderBy("bin")


def events_circular_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Circular statistics of each event type's hour-of-day activity:
    resultant vector (cx, cy), mean resultant length R and circular
    variance 1−R — the correct way to average a clock-valued
    quantity (a plain mean of hours says 11.5 for a midnight-heavy
    type). Shares the pre-floored 1e9-grid trig table with
    `events_harmonic_regression` (`harmonic_constants` — libm
    cos/sin never computed engine-side), so every product is an
    exact integer and the per-type sums are exact DECIMAL(38,0);
    the final divisions and sqrt are correctly-rounded IEEE ops.
    Scale: one hour-grain aggregate (≤24·|types| rows), constants
    broadcast."""
    consts = harmonic_constants()
    cdf = spark.createDataFrame(
        [(h, c1, s1) for h, c1, s1, _, _ in consts], "h INT, c1 LONG, s1 LONG"
    )
    events = load_table(spark, sf_dir, "events")
    hourly = (
        events.select("event_type", F.hour("ts").cast("int").alias("h"))
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("yc"))
    )
    d38 = "decimal(38,0)"
    yd = F.col("yc").cast(d38)
    j = hourly.join(F.broadcast(cdf), "h")
    agg = j.groupBy("event_type").agg(
        F.sum("yc").alias("n"),
        F.sum(yd * F.col("c1").cast(d38)).alias("sc"),
        F.sum(yd * F.col("s1").cast(d38)).alias("ss"),
    )
    nd = F.col("n").cast("double")
    cx = F.col("sc").cast("double") / F.lit(1e9) / nd
    cy = F.col("ss").cast("double") / F.lit(1e9) / nd
    r = F.sqrt(cx * cx + cy * cy)
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n_events"),
        det_round(cx, 6).alias("cx"),
        det_round(cy, 6).alias("cy"),
        det_round(r, 6).alias("resultant_r"),
        det_round(F.lit(1.0) - r, 6).alias("circ_var"),
    ).orderBy("event_type")


def events_turning_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turning-points test for randomness of each event type's daily
    count series (the classical complement to the runs test already
    in the family): T = #{interior days where the series strictly
    changes direction}, E[T] = 2(n−2)/3, Var[T] = (16n−29)/90, and
    the normal z-score. Ties (flat steps) are NOT turning points —
    the strict-inequality convention, exact on integer counts.
    Determinism: T and n are exact longs; E/Var/z are single
    correctly-rounded divisions and one sqrt on identical operands.
    Scale: daily-grain aggregate, then lag/lead windows over ~30
    rows per type."""
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.select("event_type", F.col("ts").cast("date").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return turning_points_from_daily(daily)


def turning_points_from_daily(daily: DataFrame) -> DataFrame:
    """Shared turning-points tail over an (event_type, day, c) frame
    — factored for hand-case tests."""
    w = Window.partitionBy("event_type").orderBy("day")
    trip = daily.select(
        "event_type",
        "c",
        F.lag("c").over(w).alias("prev"),
        F.lead("c").over(w).alias("nxt"),
    )
    is_tp = (
        F.col("prev").isNotNull()
        & F.col("nxt").isNotNull()
        & (
            ((F.col("c") - F.col("prev")) > 0) & ((F.col("nxt") - F.col("c")) < 0)
            | ((F.col("c") - F.col("prev")) < 0) & ((F.col("nxt") - F.col("c")) > 0)
        )
    )
    agg = trip.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(is_tp.cast("long")).alias("t_points"),
    )
    nd = F.col("n").cast("double")
    e_t = F.lit(2.0) * (nd - F.lit(2.0)) / F.lit(3.0)
    var_t = (F.lit(16.0) * nd - F.lit(29.0)) / F.lit(90.0)
    z = (F.col("t_points").cast("double") - e_t) / F.sqrt(var_t)
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.col("t_points").cast("long").alias("t_points"),
        det_round(e_t, 6).alias("expected_t"),
        det_round(z, 6).alias("z_score"),
    ).orderBy("event_type")


def events_pot_gpd_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peaks-over-threshold extreme-value analysis per event type:
    exceedances over the exact discrete p95 of value, fitted to a
    Generalized Pareto Distribution by the method of moments
    (ξ = ½(1 − m²/s²), β = ½m(m²/s² + 1)) — the standard EVT
    complement to the Hill estimator already in the family (Hill
    assumes ξ>0; GPD-MoM also covers light tails). The threshold is
    the grid-histogram discrete percentile (`value_percentiles_disc`
    device: exact BIGINT cumulative-count comparison), exceedances
    are exact centi longs, moments are exact DECIMAL(38,0) sums, and
    the fit is a mirrored chain of correctly-rounded divisions.
    Scale: one histogram aggregate over the bounded centi domain, a
    broadcast 5-row threshold join, one moment aggregate."""
    events = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    centi = events.select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("v"),
    )
    return gpd_pot_from_values(centi)


def gpd_pot_from_values(centi: DataFrame) -> DataFrame:
    """Shared PoT/GPD tail over an (event_type, v) exact-centi frame
    — factored for hand-case tests."""
    hist = centi.groupBy("event_type", "v").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("event_type").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "v",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(wt).alias("n"),
    )
    thr = cum.groupBy("event_type").agg(
        F.min(
            F.when(F.col("cum") * 100 >= F.col("n") * 95, F.col("v"))
        ).alias("thr")
    )
    d38 = "decimal(38,0)"
    exc = centi.join(F.broadcast(thr), "event_type").where(
        F.col("v") > F.col("thr")
    )
    e = F.col("v") - F.col("thr")
    agg = exc.groupBy("event_type").agg(
        F.max("thr").alias("thr"),
        F.count(F.lit(1)).alias("n_exc"),
        F.sum(e).alias("se"),
        F.sum((e.cast(d38)) * (e.cast(d38))).alias("se2"),
    )
    nd = F.col("n_exc").cast("double")
    mean = F.col("se").cast("double") / nd
    var = F.col("se2").cast("double") / nd - mean * mean
    ratio = mean * mean / var
    xi = F.lit(0.5) * (F.lit(1.0) - ratio)
    beta = F.lit(0.5) * mean * (ratio + F.lit(1.0))
    # degenerate input guard (ADVICE r5): if every exceedance is
    # identical, var == 0 and the moment ratio is undefined — emit
    # NULL for the fitted shape/scale instead of inf/NaN, mirrored
    # as CASE WHEN var = 0.0 THEN NULL in the oracle.
    null_d = F.lit(None).cast("double")
    xi_out = F.when(var == F.lit(0.0), null_d).otherwise(det_round(xi, 6))
    beta_out = F.when(var == F.lit(0.0), null_d).otherwise(
        det_round(beta / F.lit(100.0), 6)
    )
    return agg.select(
        "event_type",
        (F.col("thr").cast("double") / F.lit(100.0)).alias("threshold"),
        F.col("n_exc").cast("long").alias("n_exceed"),
        det_round(mean / F.lit(100.0), 6).alias("mean_excess"),
        xi_out.alias("xi_hat"),
        beta_out.alias("beta_hat"),
    ).orderBy("event_type")


def customer_uplift_two_model(
    spark: SparkSession, sf_dir: str, iters: int = 3
) -> DataFrame:
    """Two-model (T-learner) uplift analysis — the experimentation
    workhorse: users are deterministically split into treatment /
    control (md5 hash, the `ab_cuped_adjustment` assignment device),
    one IRLS logistic model of daily purchase propensity is trained
    PER ARM on (clicks, views) at the user-day grain via the shared
    `_logit_irls_betas` trainer, and every user-day is scored with
    the predicted uplift μ_T(x) − μ_C(x), bucketed into 10
    equal-width bins over [−1, 1] with per-bin predicted vs ACTUAL
    (treated-rate − control-rate) uplift — the table a Qini audit
    reads.

    Determinism: both trainings follow the IRLS grid contract
    (coefficients identical to the oracle's unrolled CTE chains);
    uplift is floored onto the 1e-6 grid per row BEFORE binning and
    summation; rates are exact integer ratios guarded by mirrored
    CASE for empty arms. Scale: one user-day aggregate, 3 single-row
    moment aggregates per arm, one 10-key groupBy."""
    from stream_processing_system_spark.functions.scalar import md5_prefix_long

    events = load_table(spark, sf_dir, "events")
    per_ud = (
        events.select(
            "user_id",
            F.col("ts").cast("date").alias("day"),
            "event_type",
        )
        .groupBy("user_id", "day")
        .agg(
            F.sum((F.col("event_type") == "click").cast("long")).alias("x1"),
            F.sum((F.col("event_type") == "view").cast("long")).alias("x2"),
            F.max((F.col("event_type") == "purchase").cast("long")).alias("y"),
        )
    )
    base_all = per_ud.select(
        (
            md5_prefix_long(F.col("user_id").cast("string"), salt="uplift|")
            % 2
        ).alias("grp"),
        "y",
        "x1",
        "x2",
    ).localCheckpoint(eager=True)
    base_t = base_all.where(F.col("grp") == 1).select("y", "x1", "x2")
    base_c = base_all.where(F.col("grp") == 0).select("y", "x1", "x2")
    bt0, bt1, bt2, _ = _logit_irls_betas(base_t.localCheckpoint(eager=True), iters)
    bc0, bc1, bc2, _ = _logit_irls_betas(base_c.localCheckpoint(eager=True), iters)
    x1d, x2d = F.col("x1").cast("double"), F.col("x2").cast("double")
    mu_t = F.lit(1.0) / (
        F.lit(1.0) + F.exp(-(F.lit(bt0) + F.lit(bt1) * x1d + F.lit(bt2) * x2d))
    )
    mu_c = F.lit(1.0) / (
        F.lit(1.0) + F.exp(-(F.lit(bc0) + F.lit(bc1) * x1d + F.lit(bc2) * x2d))
    )
    u_g = F.floor((mu_t - mu_c) * F.lit(1e6) + F.lit(0.5)).cast("long")
    b = F.least(
        F.floor((u_g + F.lit(1000000)) / F.lit(200000)).cast("long"),
        F.lit(9).cast("long"),
    )
    scored = base_all.select(
        u_g.alias("u_g"), b.alias("bin"), "grp", "y"
    )
    g = scored.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("u_g").alias("su"),
        F.sum("grp").alias("nt"),
        F.sum(F.col("y") * F.col("grp")).alias("yt"),
        F.sum(F.col("y") * (F.lit(1) - F.col("grp"))).alias("yc"),
    )
    nc = F.col("n_rows") - F.col("nt")
    rate_t = F.when(
        F.col("nt") > 0,
        F.col("yt").cast("double") / F.col("nt").cast("double"),
    )
    rate_c = F.when(
        nc > 0, F.col("yc").cast("double") / nc.cast("double")
    )
    return g.select(
        "bin",
        "n_rows",
        F.col("nt").cast("long").alias("n_treated"),
        nc.cast("long").alias("n_control"),
        det_round(
            F.col("su").cast("double") / F.lit(1e6)
            / F.col("n_rows").cast("double"),
            6,
        ).alias("mean_pred_uplift"),
        det_round(rate_t, 6).alias("rate_treated"),
        det_round(rate_c, 6).alias("rate_control"),
        det_round(rate_t - rate_c, 6).alias("actual_uplift"),
    ).orderBy("bin")


#: χ² 95% critical values for df 1..7 (standard-table constants,
#: 6 dp) — indexed by the number of lags actually summed so a gappy
#: daily series that loses lags is still compared against the right
#: distribution. Embedded as the SAME literals in the DuckDB oracle
#: (list_value indexing).
LJUNG_BOX_CRIT_5PCT = (
    3.841459,
    5.991465,
    7.814728,
    9.487729,
    11.070498,
    12.591587,
    14.06714,
)


def events_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau whiteness test per event type, COMPOSED
    on the ACF query: Q = n(n+2)·Σ_k ρ_k²/(n−k) over the det-rounded
    lag-1..7 autocorrelations `events_acf` already emits, compared
    against the χ²(n_lags) 95% critical value — the standard "is
    anything left in the residuals" gate after a seasonal fit.

    n is the TRUE per-type day count joined from the same daily
    frame the ACF is built on (`_daily_whole_units`), not recovered
    from n_pairs — on a gappy daily series n_pairs + lag
    underestimates n (ADVICE r5). Lags the series cannot support
    (lag ≥ n) are excluded, and because the da/db>0 filter in
    `events_acf` can drop lags entirely, the critical value is
    scaled to the lag count actually summed via the
    `LJUNG_BOX_CRIT_5PCT` df-indexed table rather than pinned at
    χ²₇; `n_lags` and `crit_5pct` are emitted so the df is auditable.

    Determinism: composes on the ROUNDED ρ_k (the oracle wraps the
    acf oracle text as a CTE — shared text, zero drift); each
    ρ²/(n−k) term is floored onto the 1e-12 grid before the ≤7-term
    sum (cross-row double addition is never trusted). Scale:
    everything downstream of the two aggregates sees ≤ 7·|types|
    rows."""
    events = load_table(spark, sf_dir, "events")
    acf = events_acf(spark, sf_dir)
    nper = _daily_whole_units(events).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    j = acf.join(F.broadcast(nper), "event_type").where(
        F.col("lag") < F.col("n")
    )
    term = F.floor(
        F.col("acf") * F.col("acf")
        / (F.col("n") - F.col("lag")).cast("double")
        * F.lit(1e12)
        + F.lit(0.5)
    ).cast("long")
    g = j.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).alias("n_lags"),
        F.sum(term).alias("s"),
    )
    nd = F.col("n").cast("double")
    qstat = nd * (nd + F.lit(2.0)) * (F.col("s").cast("double") / F.lit(1e12))
    q6 = det_round(qstat, 6)
    crit = F.element_at(
        F.array(*[F.lit(v) for v in LJUNG_BOX_CRIT_5PCT]),
        F.col("n_lags").cast("int"),
    )
    return g.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.col("n_lags").cast("long").alias("n_lags"),
        q6.alias("q_stat"),
        crit.alias("crit_5pct"),
        F.when(q6 > crit, 1).otherwise(0).cast("long").alias("reject_5pct"),
    ).orderBy("event_type")


def lineitem_hotelling_t2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Hotelling T² — the multivariate generalization of
    the t-test: do returned and kept lineitems differ in the joint
    (quantity, discount) mean vector? Pooled 2×2 covariance with a
    closed-form inverse, T² quadratic form, and the exact F
    conversion F = T²·(n−p−1)/(p·(n−2)) with p=2 — one scan, one
    grouped moment aggregate, all data-sized work map-side combined
    into ten DECIMAL(38,0) sums per group.

    Determinism: per-group moments are exact sums of BIGINT products
    (quantity and centi-discount are exact longs); means, pooled
    covariance entries, the inverse and the quadratic form are a
    fixed-operand-order double chain mirrored textually in SQL."""
    li = load_table(spark, sf_dir, "lineitem")
    d38 = "decimal(38,0)"
    base = li.select(
        (F.col("l_returnflag") == "R").cast("int").alias("grp"),
        F.col("l_quantity").cast("long").alias("x"),
        F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long").alias("y"),
    )
    m = base.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(d38)).alias("sx"),
        F.sum(F.col("y").cast(d38)).alias("sy"),
        F.sum(F.col("x").cast(d38) * F.col("x")).alias("sxx"),
        F.sum(F.col("x").cast(d38) * F.col("y")).alias("sxy"),
        F.sum(F.col("y").cast(d38) * F.col("y")).alias("syy"),
    )
    # pivot the two groups onto one row (tiny frame) with mirrored
    # conditional aggregation
    one = m.groupBy().agg(
        *[
            F.max(F.when(F.col("grp") == g, F.col(c))).alias(f"{c}{g}")
            for g in (0, 1)
            for c in ("n", "sx", "sy", "sxx", "sxy", "syy")
        ]
    )
    def moments(g: int):
        n = F.col(f"n{g}").cast("double")
        mx = F.col(f"sx{g}").cast("double") / n
        my = F.col(f"sy{g}").cast("double") / n
        cxx = F.col(f"sxx{g}").cast("double") - F.col(f"sx{g}").cast("double") * mx
        cxy = F.col(f"sxy{g}").cast("double") - F.col(f"sx{g}").cast("double") * my
        cyy = F.col(f"syy{g}").cast("double") - F.col(f"sy{g}").cast("double") * my
        return n, mx, my, cxx, cxy, cyy

    n0, mx0, my0, cxx0, cxy0, cyy0 = moments(0)
    n1, mx1, my1, cxx1, cxy1, cyy1 = moments(1)
    df_pool = n0 + n1 - F.lit(2.0)
    sxx = (cxx0 + cxx1) / df_pool
    sxy = (cxy0 + cxy1) / df_pool
    syy = (cyy0 + cyy1) / df_pool
    det = sxx * syy - sxy * sxy
    dx = mx1 - mx0
    dy = my1 - my0
    quad = (syy * dx * dx - F.lit(2.0) * sxy * dx * dy + sxx * dy * dy) / det
    t2 = (n0 * n1 / (n0 + n1)) * quad
    fstat = t2 * (n0 + n1 - F.lit(3.0)) / (F.lit(2.0) * (n0 + n1 - F.lit(2.0)))
    return one.select(
        F.col("n0").cast("long").alias("n_kept"),
        F.col("n1").cast("long").alias("n_returned"),
        det_round(dx, 6).alias("diff_qty"),
        det_round(dy / F.lit(100.0), 6).alias("diff_disc"),
        det_round(t2, 6).alias("t2_stat"),
        det_round(fstat, 6).alias("f_stat"),
    )


def events_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall trend test on each event type's daily-value
    series: S = Σ_{i<j} sign(x_j − x_i), tie-corrected variance
    Var[S] = (n(n−1)(2n+5) − Σ t(t−1)(2t+5))/18 and the
    continuity-corrected z — the nonparametric monotone-trend
    complement to `revenue_theilsen_trend` (which estimates the
    slope; this tests whether ANY monotone drift is significant).

    Exactness: the series is the `_daily_whole_units` integer grid;
    S, n and the tie sum are exact BIGINT aggregates, so Var[S] and
    z are fixed-operand-order doubles on identical inputs.

    Shape: one daily rollup, then an O(d²)-per-type self-join of the
    DAILY frame — d is bounded by calendar days, not row count, so
    the pair fan-out is constant-size at any data scale (90 days →
    ~4k pairs per type)."""
    events = load_table(spark, sf_dir, "events")
    daily = _daily_whole_units(events).localCheckpoint(eager=True)
    return mann_kendall_from_daily(daily)


def mann_kendall_from_daily(daily: DataFrame) -> DataFrame:
    """Shared Mann–Kendall tail over an (event_type, day, x) frame —
    factored for hand-case tests."""
    a = daily.select(
        "event_type", F.col("day").alias("d1"), F.col("x").alias("x1")
    )
    b = daily.select(
        "event_type", F.col("day").alias("d2"), F.col("x").alias("x2")
    )
    s_agg = (
        a.join(b, "event_type")
        .where(F.col("d1") < F.col("d2"))
        .groupBy("event_type")
        .agg(
            F.sum(F.signum(F.col("x2") - F.col("x1")).cast("long")).alias(
                "s"
            )
        )
    )
    nn = daily.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    t = F.col("t")
    ties = (
        daily.groupBy("event_type", "x")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(t * (t - F.lit(1)) * (F.lit(2) * t + F.lit(5))).alias(
                "ties"
            )
        )
    )
    j = (
        nn.join(s_agg, "event_type", "left")
        .join(ties, "event_type")
        .select(
            "event_type",
            "n",
            F.coalesce(F.col("s"), F.lit(0)).alias("s"),
            "ties",
        )
    )
    nd = F.col("n").cast("double")
    var_s = (
        nd * (nd - F.lit(1.0)) * (F.lit(2.0) * nd + F.lit(5.0))
        - F.col("ties").cast("double")
    ) / F.lit(18.0)
    sd = F.col("s").cast("double")
    z = (
        F.when(F.col("s") > 0, (sd - F.lit(1.0)) / F.sqrt(var_s))
        .when(F.col("s") < 0, (sd + F.lit(1.0)) / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    z = F.when(var_s > F.lit(0.0), z)
    trend = (
        F.when(z > F.lit(1.96), F.lit("increasing"))
        .when(z < F.lit(-1.96), F.lit("decreasing"))
        .otherwise(F.lit("no_trend"))
    )
    return j.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.col("s").cast("long").alias("s_stat"),
        det_round(var_s, 6).alias("var_s"),
        det_round(z, 6).alias("z_score"),
        trend.alias("trend"),
    ).orderBy("event_type")


def events_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis rank test for a day-of-week effect on daily
    total value per event type — the distribution-free twin of
    `events_dow_anova` (same engine-free epoch-mod-7 groups, ranks
    instead of means, so a single whale day can't fake an effect).

    Exactness: midranks are kept DOUBLED (2·rank = 2·cum_before +
    tiecount + 1, exact integers — the `events_mannwhitney_u`
    device), so per-group rank sums and the tie term Σ(t³−t) are
    exact DECIMAL(38,0)/BIGINT; the ≤7-row cross-group sum
    Σ R_g²/n_g is quantized per group onto a 1e-6 integer grid (the
    chi2-drift device from `events_dow_anova`); H, the tie
    correction and ε² are fixed-order doubles after that.

    Shape: one daily rollup, one tie-cell groupBy, one cumulative
    window over the tiny (type, value) cell frame, two small aggs."""
    events = load_table(spark, sf_dir, "events")
    daily = _daily_whole_units(events).localCheckpoint(eager=True)
    return kruskal_wallis_from_daily(daily)


def kruskal_wallis_from_daily(daily: DataFrame) -> DataFrame:
    """Shared Kruskal–Wallis tail over an (event_type, day, x) frame
    — factored for hand-case tests."""
    d2 = daily.select(
        "event_type",
        (
            F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")) % 7
        ).alias("dow"),
        "x",
    )
    cells = d2.groupBy("event_type", "x").agg(F.count(F.lit(1)).alias("t"))
    w_before = (
        Window.partitionBy("event_type")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = cells.select(
        "event_type",
        "x",
        "t",
        F.coalesce(F.sum("t").over(w_before), F.lit(0)).alias("cb"),
    ).select(
        "event_type",
        "x",
        "t",
        (F.lit(2) * F.col("cb") + F.col("t") + F.lit(1)).alias("dr"),
    )
    d38 = "decimal(38,0)"
    groups = (
        d2.join(ranked.select("event_type", "x", "dr"), ["event_type", "x"])
        .groupBy("event_type", "dow")
        .agg(
            F.count(F.lit(1)).alias("ng"),
            F.sum(F.col("dr").cast(d38)).alias("s2g"),
        )
    )
    term = F.floor(
        (F.col("s2g") * F.col("s2g")).cast("double")
        / (F.lit(4.0) * F.col("ng").cast("double"))
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("long")
    per_type = groups.select(
        "event_type", "ng", term.alias("term")
    ).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("ng").alias("n"),
        F.sum("term").alias("tsum"),
    )
    tiesum = cells.groupBy("event_type").agg(
        F.sum(
            F.col("t").cast(d38) * F.col("t") * F.col("t")
            - F.col("t").cast(d38)
        ).alias("ties")
    )
    j = per_type.join(tiesum, "event_type")
    nd = F.col("n").cast("double")
    kd = F.col("k").cast("double")
    h = (
        F.lit(12.0) / (nd * (nd + F.lit(1.0)))
        * (F.col("tsum").cast("double") / F.lit(1e6))
        - F.lit(3.0) * (nd + F.lit(1.0))
    )
    c = F.when(
        F.col("n") > 1,
        F.lit(1.0)
        - F.col("ties").cast("double") / (nd * nd * nd - nd),
    )
    h_corr = F.when(c > F.lit(0.0), h / c)
    eps2 = F.when(
        nd > kd, (h - kd + F.lit(1.0)) / (nd - kd)
    )
    return j.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.col("k").cast("long").alias("n_groups"),
        det_round(h, 6).alias("h_stat"),
        det_round(h_corr, 6).alias("h_corrected"),
        det_round(eps2, 6).alias("epsilon_sq"),
    ).orderBy("event_type")


def events_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page–Hinkley online drift detector per event type: with the
    RUNNING mean x̄_t (not the offline global mean —
    `events_cusum_changepoint` is the offline twin), the statistic
    PH_t = m_t − min_{s≤t} m_s over m_t = Σ_{i≤t}(x_i − x̄_i)
    measures how far the series has drifted upward past anything an
    online observer had seen; the alarm fires the first day PH
    exceeds λ = 5σ of the daily series.

    Exactness: each increment x_t − S_t/t is one fixed-order double
    expression on exact integers, floored onto a 1e-6 grid BEFORE
    the cumulative sum — so m, the running min, and PH are exact
    BIGINT prefix sums (float cumsum order never matters); σ comes
    from exact Σx/Σx² and the alarm comparison runs on identical
    doubles in both engines.

    Shape: one daily rollup, two ordered windows over the ~90-row
    daily frame per type, one aggregate. Day-grain, so constant-size
    at any data scale."""
    events = load_table(spark, sf_dir, "events")
    daily = _daily_whole_units(events).localCheckpoint(eager=True)
    return page_hinkley_from_daily(daily)


def page_hinkley_from_daily(daily: DataFrame) -> DataFrame:
    """Shared Page–Hinkley tail over an (event_type, day, x) frame —
    factored for hand-case tests."""
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_type = Window.partitionBy("event_type")
    step1 = daily.select(
        "event_type",
        "day",
        "x",
        F.count(F.lit(1)).over(w_cum).alias("t"),
        F.sum("x").over(w_cum).alias("s"),
    )
    inc_micro = F.floor(
        (
            F.col("x").cast("double")
            - F.col("s").cast("double") / F.col("t").cast("double")
        )
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("long")
    step2 = step1.select("event_type", "day", "x", inc_micro.alias("inc"))
    step3 = step2.select(
        "event_type", "day", "x", F.sum("inc").over(w_cum).alias("m")
    )
    step4 = step3.select(
        "event_type",
        "day",
        "x",
        (F.col("m") - F.min("m").over(w_cum)).alias("ph"),
    )
    d38 = "decimal(38,0)"
    enriched = step4.select(
        "event_type",
        "day",
        "ph",
        F.count(F.lit(1)).over(w_type).alias("n"),
        F.sum(F.col("x").cast(d38)).over(w_type).alias("sx"),
        F.sum(F.col("x").cast(d38) * F.col("x")).over(w_type).alias("sxx"),
        F.max("ph").over(w_type).alias("maxph"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("sx").cast("double") / nd
    var = F.greatest(
        F.col("sxx").cast("double") / nd - mean * mean, F.lit(0.0)
    )
    lam = F.lit(5.0) * F.sqrt(var)
    phd = F.col("ph").cast("double") / F.lit(1e6)
    agg = enriched.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max("maxph").alias("maxph"),
        F.min(
            F.when(F.col("ph") == F.col("maxph"), F.col("day"))
        ).alias("ph_max_day"),
        F.min(F.when(phd > lam, F.col("day"))).alias("alarm_day"),
        F.max(det_round(lam, 6)).alias("threshold"),
    )
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        det_round(F.col("maxph").cast("double") / F.lit(1e6), 6).alias(
            "ph_max"
        ),
        F.col("ph_max_day").cast("string").alias("ph_max_day"),
        F.col("alarm_day").cast("string").alias("alarm_day"),
        "threshold",
    ).orderBy("event_type")


def lineitem_return_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality metrics for a return-risk score per ship year:
    ROC-AUC via the midrank formula AUC = (R⁺ − P(P+1)/2)/(P·N)
    (the Mann–Whitney identity), the Gini coefficient 2·AUC − 1,
    and the KS statistic max|TPR − FPR| — the standard scorecard
    triple for any binary ranking model, here scoring
    positives = returned lineitems with a transparent
    discount/tax/quantity composite (model quality is not the point;
    the exact rank-statistic evaluation machinery is).

    Exactness: the score lives on an integer grid, midranks are kept
    DOUBLED (the `events_mannwhitney_u` device) so R⁺, the AUC
    numerator R²⁺ − P² − P, and the KS numerator
    max|cumP·N − cumN·P| are all exact DECIMAL(38,0)/BIGINT; each
    metric is ONE final double division.

    Shape: one groupBy to the (ship_year, score) cell grain — a few
    thousand cells regardless of row count — then cumulative windows
    over cells and one aggregate per year."""
    li = load_table(spark, sf_dir, "lineitem")
    score = (
        F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long")
        * F.lit(10000)
        + F.floor(F.col("l_tax") * 100 + F.lit(0.5)).cast("long")
        * F.lit(100)
        + F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long")
    )
    pos = (F.col("l_returnflag") == "R").cast("long")
    cells = li.select(
        F.year("l_shipdate").alias("ship_year"),
        score.alias("score"),
        pos.alias("p"),
    ).groupBy("ship_year", "score").agg(
        F.sum("p").alias("cp"),
        F.sum(F.lit(1) - F.col("p")).alias("cn"),
    )
    w_before = (
        Window.partitionBy("ship_year")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_incl = (
        Window.partitionBy("ship_year")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_mode = Window.partitionBy("ship_year")
    d38 = "decimal(38,0)"
    t = F.col("cp") + F.col("cn")
    enriched = cells.select(
        "ship_year",
        "cp",
        "cn",
        (
            F.lit(2) * F.coalesce(F.sum(t).over(w_before), F.lit(0))
            + t
            + F.lit(1)
        ).alias("dr"),
        F.sum("cp").over(w_incl).alias("cump"),
        F.sum("cn").over(w_incl).alias("cumn"),
        F.sum("cp").over(w_mode).alias("p"),
        F.sum("cn").over(w_mode).alias("nn"),
    )
    agg = enriched.groupBy("ship_year").agg(
        F.max("p").alias("p"),
        F.max("nn").alias("nn"),
        F.sum(F.col("cp").cast(d38) * F.col("dr")).alias("r2"),
        F.max(
            F.abs(
                F.col("cump").cast(d38) * F.col("nn")
                - F.col("cumn").cast(d38) * F.col("p")
            )
        ).alias("ksnum"),
    )
    pd_, nd_ = F.col("p").cast("double"), F.col("nn").cast("double")
    aucnum = (
        F.col("r2")
        - F.col("p").cast(d38) * F.col("p")
        - F.col("p").cast(d38)
    )
    both = (F.col("p") > 0) & (F.col("nn") > 0)
    auc = F.when(both, aucnum.cast("double") / (F.lit(2.0) * pd_ * nd_))
    gini = F.when(
        both, aucnum.cast("double") / (pd_ * nd_) - F.lit(1.0)
    )
    ks = F.when(both, F.col("ksnum").cast("double") / (pd_ * nd_))
    return agg.select(
        F.col("ship_year").cast("int").alias("ship_year"),
        F.col("p").cast("long").alias("n_pos"),
        F.col("nn").cast("long").alias("n_neg"),
        det_round(auc, 6).alias("auc"),
        det_round(gini, 6).alias("gini"),
        det_round(ks, 6).alias("ks_stat"),
    ).orderBy("ship_year")


def events_ar2_yule_walker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR(2) fit per event type by Yule–Walker: lag-1/2
    autocorrelations of the daily-value series give
    φ₁ = r₁(1 − r₂)/(1 − r₁²), φ₂ = (r₂ − r₁²)/(1 − r₁²), the
    innovation-variance ratio 1 − φ₁r₁ − φ₂r₂, and the one-step
    forecast x̂ = μ + φ₁(xₙ − μ) + φ₂(xₙ₋₁ − μ) — the closed-form
    autoregression that turns `events_acf`'s diagnostics into an
    actual model (and the prelude to PACF-style order selection).

    Exactness: centering is cleared of divisions as ñₜ = n·xₜ − Σx
    (exact integers on the `_daily_whole_units` grid), so the three
    autocovariance sums Σññ are exact DECIMAL(38,0) — the common
    1/n² factor cancels in every ratio; r, φ, and the forecast are
    fixed-order doubles with NULL guards for constant series
    (c₀ = 0) and a singular normal equation (r₁² = 1).

    Shape: one daily rollup, lead windows over the ~90-row daily
    frame, one aggregate per type. Day-grain → constant-size at any
    data scale."""
    events = load_table(spark, sf_dir, "events")
    daily = _daily_whole_units(events).localCheckpoint(eager=True)
    return ar2_yule_walker_from_daily(daily)


def ar2_yule_walker_from_daily(daily: DataFrame) -> DataFrame:
    """Shared AR(2) Yule–Walker tail over an (event_type, day, x)
    frame — factored for hand-case tests."""
    d38 = "decimal(38,0)"
    w_type = Window.partitionBy("event_type")
    w_ord = Window.partitionBy("event_type").orderBy("day")
    base = daily.select(
        "event_type",
        "day",
        "x",
        F.count(F.lit(1)).over(w_type).alias("n"),
        F.sum(F.col("x").cast(d38)).over(w_type).alias("sx"),
    )
    nx = (F.col("n").cast(d38) * F.col("x") - F.col("sx")).alias("nx")
    seq = base.select(
        "event_type",
        "day",
        "x",
        "n",
        "sx",
        nx,
    ).select(
        "event_type",
        "day",
        "x",
        "n",
        "sx",
        "nx",
        F.lead("nx", 1).over(w_ord).alias("nx1"),
        F.lead("nx", 2).over(w_ord).alias("nx2"),
        F.lag("x", 1).over(w_ord).alias("px"),
    )
    agg = seq.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max("sx").alias("sx"),
        F.sum(F.col("nx") * F.col("nx")).alias("c0"),
        F.coalesce(
            F.sum(F.col("nx") * F.col("nx1")), F.lit(0).cast(d38)
        ).alias("c1"),
        F.coalesce(
            F.sum(F.col("nx") * F.col("nx2")), F.lit(0).cast(d38)
        ).alias("c2"),
        F.expr("max_by(x, day)").alias("xl"),
        F.expr("max_by(px, day)").alias("xp"),
    )
    c0d = F.col("c0").cast("double")
    r1 = F.when(c0d > F.lit(0.0), F.col("c1").cast("double") / c0d)
    r2 = F.when(c0d > F.lit(0.0), F.col("c2").cast("double") / c0d)
    om = F.lit(1.0) - r1 * r1
    phi1 = F.when(om != F.lit(0.0), r1 * (F.lit(1.0) - r2) / om)
    phi2 = F.when(om != F.lit(0.0), (r2 - r1 * r1) / om)
    mean = F.col("sx").cast("double") / F.col("n").cast("double")
    fc = (
        mean
        + phi1 * (F.col("xl").cast("double") - mean)
        + phi2 * (F.col("xp").cast("double") - mean)
    )
    sig = F.lit(1.0) - phi1 * r1 - phi2 * r2
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        det_round(r1, 6).alias("r1"),
        det_round(r2, 6).alias("r2"),
        det_round(phi1, 6).alias("phi1"),
        det_round(phi2, 6).alias("phi2"),
        det_round(sig, 6).alias("innov_ratio"),
        det_round(fc, 6).alias("forecast_next"),
    ).orderBy("event_type")


def events_dispersion_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-of-dispersion (variance-to-mean ratio) test per event
    type on the daily COUNT series: D = s²/x̄ with the normal
    approximation z = (D − 1)·√((n−1)/2) — the classic screen for
    whether daily arrivals are Poisson-consistent, overdispersed
    (bursty/contagious) or underdispersed (throttled/regular); the
    count-process complement to `events_burstiness` (inter-arrival
    CV) and `events_poisson_glm` (rate modeling).

    Exactness: n, Σc, Σc² are exact BIGINT aggregates of day-grain
    counts; s², x̄, D and z are fixed-operand-order doubles with
    NULL guards for n < 2 and x̄ = 0. Day-grain → constant-size at
    any data scale."""
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.select("event_type", F.col("ts").cast("date").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return dispersion_index_from_daily(daily)


def dispersion_index_from_daily(daily: DataFrame) -> DataFrame:
    """Shared dispersion-index tail over an (event_type, day, c)
    frame — factored for hand-case tests."""
    d38 = "decimal(38,0)"
    agg = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("c").cast(d38)).alias("sc"),
        F.sum(F.col("c").cast(d38) * F.col("c")).alias("scc"),
    )
    nd = F.col("n").cast("double")
    scd = F.col("sc").cast("double")
    mean = scd / nd
    s2 = F.when(
        F.col("n") > 1,
        (F.col("scc").cast("double") - scd * scd / nd)
        / (nd - F.lit(1.0)),
    )
    disp = F.when(mean > F.lit(0.0), s2 / mean)
    z = (disp - F.lit(1.0)) * F.sqrt((nd - F.lit(1.0)) / F.lit(2.0))
    verdict = (
        F.when(z > F.lit(1.96), F.lit("overdispersed"))
        .when(z < F.lit(-1.96), F.lit("underdispersed"))
        .otherwise(F.lit("poisson_consistent"))
    )
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        det_round(mean, 6).alias("mean_daily"),
        det_round(s2, 6).alias("var_daily"),
        det_round(disp, 6).alias("dispersion"),
        det_round(z, 6).alias("z_score"),
        verdict.alias("verdict"),
    ).orderBy("event_type")


def events_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test for a weekend effect on daily
    total value per event type, with the Welch–Satterthwaite df —
    the parametric two-sample complement to `events_mannwhitney_u`
    (rank-based) and `events_dow_anova` (equal-variance k-group):
    weekend = epoch-day mod 7 ∈ {2, 3} (1970-01-01 is a Thursday),
    never the engines' disagreeing dayofweek()s.

    Exactness: per-group n, Σx, Σx² are exact DECIMAL(38,0) on the
    `_daily_whole_units` grid; means, variances, t and df are one
    fixed-operand-order double chain with NULL guards for groups
    smaller than 2 and zero pooled standard error."""
    events = load_table(spark, sf_dir, "events")
    daily = _daily_whole_units(events)
    return welch_ttest_from_daily(daily)


def welch_ttest_from_daily(daily: DataFrame) -> DataFrame:
    """Shared Welch-t tail over an (event_type, day, x) frame —
    factored for hand-case tests."""
    d38 = "decimal(38,0)"
    wk = (
        (
            F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")) % 7
        ).isin(2, 3)
    ).cast("long")
    agg = daily.select("event_type", "x", wk.alias("w")).groupBy(
        "event_type"
    ).agg(
        F.sum("w").alias("n1"),
        F.sum(F.col("w") * F.col("x").cast(d38)).alias("s1"),
        F.sum(F.col("w") * F.col("x").cast(d38) * F.col("x")).alias("q1"),
        F.sum(F.lit(1) - F.col("w")).alias("n2"),
        F.sum(
            (F.lit(1) - F.col("w")) * F.col("x").cast(d38)
        ).alias("s2"),
        F.sum(
            (F.lit(1) - F.col("w")) * F.col("x").cast(d38) * F.col("x")
        ).alias("q2"),
    )
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    s1d, s2d = F.col("s1").cast("double"), F.col("s2").cast("double")
    m1 = F.when(F.col("n1") > 0, s1d / n1d)
    m2 = F.when(F.col("n2") > 0, s2d / n2d)
    v1 = F.when(
        F.col("n1") > 1,
        (F.col("q1").cast("double") - s1d * s1d / n1d)
        / (n1d - F.lit(1.0)),
    )
    v2 = F.when(
        F.col("n2") > 1,
        (F.col("q2").cast("double") - s2d * s2d / n2d)
        / (n2d - F.lit(1.0)),
    )
    se2 = v1 / n1d + v2 / n2d
    t = F.when(se2 > F.lit(0.0), (m1 - m2) / F.sqrt(se2))
    df = F.when(
        se2 > F.lit(0.0),
        (se2 * se2)
        / (
            (v1 / n1d) * (v1 / n1d) / (n1d - F.lit(1.0))
            + (v2 / n2d) * (v2 / n2d) / (n2d - F.lit(1.0))
        ),
    )
    return agg.select(
        "event_type",
        F.col("n1").cast("long").alias("n_weekend"),
        F.col("n2").cast("long").alias("n_weekday"),
        det_round(m1, 6).alias("mean_weekend"),
        det_round(m2, 6).alias("mean_weekday"),
        det_round(t, 6).alias("t_stat"),
        det_round(df, 6).alias("welch_df"),
    ).orderBy("event_type")


def customer_ipw_ate(
    spark: SparkSession, sf_dir: str, iters: int = 3
) -> DataFrame:
    """Inverse-propensity-weighted average treatment effect — the
    OBSERVATIONAL causal estimator that completes the experimentation
    family (`customer_uplift_two_model` assumes a randomized split;
    here treatment 'clicked that day' is self-selected): a propensity
    logit P(T=1 | views, activity) is trained with the shared
    `_logit_irls_betas` IRLS contract, propensities are clipped to
    [0.05, 0.95], and the Hájek (self-normalized) estimator
    Σ(Ty/ê)/Σ(T/ê) − Σ((1−T)y/(1−ê))/Σ((1−T)/(1−ê)) is compared
    against the confounded naive rate difference.

    Determinism: the IRLS chain is the grid contract the oracle
    unrolls round-for-round; per-row weights and weighted outcomes
    are floored onto the 1e-6 grid BEFORE exact BIGINT summation, so
    the four Hájek sums are order-free; every division after is a
    fixed-order double. Scale: one user-day aggregate, 3 single-row
    moment aggregates (9 grid integers each), one final single-row
    reduce — the design is never collected."""
    events = load_table(spark, sf_dir, "events")
    per_ud = (
        events.select(
            "user_id",
            F.col("ts").cast("date").alias("day"),
            "event_type",
        )
        .groupBy("user_id", "day")
        .agg(
            F.sum((F.col("event_type") == "click").cast("long")).alias(
                "clk"
            ),
            F.sum((F.col("event_type") == "view").cast("long")).alias(
                "vw"
            ),
            F.count(F.lit(1)).alias("nev"),
            F.max(
                (F.col("event_type") == "purchase").cast("long")
            ).alias("yo"),
        )
    )
    base = per_ud.select(
        (F.col("clk") > 0).cast("long").alias("y"),
        F.col("vw").alias("x1"),
        F.col("nev").alias("x2"),
        "yo",
    ).localCheckpoint(eager=True)
    b0, b1, b2, _ = _logit_irls_betas(base, iters)
    x1d, x2d = F.col("x1").cast("double"), F.col("x2").cast("double")
    mu = F.lit(1.0) / (
        F.lit(1.0)
        + F.exp(-(F.lit(b0) + F.lit(b1) * x1d + F.lit(b2) * x2d))
    )
    ec = F.least(F.greatest(mu, F.lit(0.05)), F.lit(0.95))
    trd = F.col("y").cast("double")
    yod = F.col("yo").cast("double")

    def grid(col):
        return F.floor(col * F.lit(1e6) + F.lit(0.5)).cast("long")

    scored = base.select(
        "y",
        "yo",
        grid(trd / ec).alias("wt"),
        grid(trd / ec * yod).alias("wty"),
        grid((F.lit(1.0) - trd) / (F.lit(1.0) - ec)).alias("wc"),
        grid((F.lit(1.0) - trd) / (F.lit(1.0) - ec) * yod).alias("wcy"),
        (
            (mu < F.lit(0.05)) | (mu > F.lit(0.95))
        ).cast("long").alias("clipped"),
    )
    g = scored.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("y").alias("nt"),
        F.sum(F.col("y") * F.col("yo")).alias("syt"),
        F.sum((F.lit(1) - F.col("y")) * F.col("yo")).alias("syc"),
        F.sum("wt").alias("swt"),
        F.sum("wty").alias("swty"),
        F.sum("wc").alias("swc"),
        F.sum("wcy").alias("swcy"),
        F.sum("clipped").alias("n_clipped"),
    )
    ntd = F.col("nt").cast("double")
    ncd = (F.col("n_rows") - F.col("nt")).cast("double")
    naive = F.when(
        (F.col("nt") > 0) & (F.col("n_rows") > F.col("nt")),
        F.col("syt").cast("double") / ntd
        - F.col("syc").cast("double") / ncd,
    )
    mu_t = F.when(
        F.col("swt") > 0,
        F.col("swty").cast("double") / F.col("swt").cast("double"),
    )
    mu_c = F.when(
        F.col("swc") > 0,
        F.col("swcy").cast("double") / F.col("swc").cast("double"),
    )
    return g.select(
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("nt").cast("long").alias("n_treated"),
        F.col("n_clipped").cast("long").alias("n_clipped"),
        det_round(naive, 6).alias("naive_diff"),
        det_round(mu_t, 6).alias("mu_treated_ipw"),
        det_round(mu_c, 6).alias("mu_control_ipw"),
        det_round(mu_t - mu_c, 6).alias("ate_ipw"),
    )


def events_kanon_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity generalization ladder (k = 5) over the event
    quasi-identifiers (event_type, timestamp): at each temporal
    generalization level — hour, day, week — count the equivalence
    classes, the classes smaller than k, and the rows that would
    need suppression; the release-engineering view that says HOW
    MUCH coarsening buys compliance (`events_k_anonymity` checks one
    level; this walks the ladder the way a data-release review
    does).

    Week = epoch-day div 7 (engine-free, like the mod-7 dow device).
    Everything is exact integer counting; the one ratio is a single
    double division. Scale: three cell-grain aggregates unioned —
    each output is |types|·|buckets| rows reduced to 3."""
    events = load_table(spark, sf_dir, "events")
    epoch_day = F.datediff(
        F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
    )

    def level(name: str, bucket):
        cells = (
            events.select(
                "event_type", bucket.alias("b")
            )
            .groupBy("event_type", "b")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        return cells.agg(
            F.lit(name).alias("level"),
            F.count(F.lit(1)).alias("n_cells"),
            F.sum((F.col("c") < 5).cast("long")).alias("cells_below_k"),
            F.sum(F.when(F.col("c") < 5, F.col("c")).otherwise(0)).alias(
                "rows_suppressed"
            ),
            F.sum("c").alias("n_rows"),
        )

    hour = level(
        "1_hour",
        F.concat_ws(
            "|",
            F.col("ts").cast("date").cast("string"),
            F.hour("ts").cast("string"),
        ),
    )
    day = level("2_day", F.col("ts").cast("date").cast("string"))
    week = level(
        "3_week",
        F.floor(epoch_day.cast("double") / F.lit(7.0))
        .cast("long")
        .cast("string"),
    )
    out = hour.unionByName(day).unionByName(week)
    return out.select(
        "level",
        F.col("n_cells").cast("long").alias("n_cells"),
        F.col("cells_below_k").cast("long").alias("cells_below_k"),
        F.col("rows_suppressed").cast("long").alias("rows_suppressed"),
        det_round(
            F.col("rows_suppressed").cast("double")
            / F.col("n_rows").cast("double"),
            6,
        ).alias("suppression_rate"),
    ).orderBy("level")


def copurchase_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity Q of the LPA community partition over the
    co-purchase graph: Q = Σ_c (m_c/m − (d_c/2m)²) — the single
    number that says whether `copurchase_communities`' partition
    actually captures structure (Q ≈ 0 = no better than random) —
    computed over the SAME 4-round label propagation.

    Exactness: with t = |directed edge list| = 2m, each community's
    internal-edge and degree counts are exact BIGINTs, so
    m_c/m = ic/t and d_c/2m = dc/t need no /2; each community term
    is floored onto a 1e-9 grid before the cross-community sum (the
    chi2-drift device), and Q is one final division.

    Scale: two label joins on the edge list (edge-sized shuffles,
    same bound as LPA itself), then constant-size aggregates."""
    from stream_processing_system_spark.operators.graph import (
        _undirect,
        cooccurrence_edges,
        label_propagation,
    )

    events = load_table(spark, sf_dir, "events")
    edges = cooccurrence_edges(events).localCheckpoint(eager=True)
    und = _undirect(edges)
    lab = label_propagation(edges, rounds=4).localCheckpoint(eager=True)
    j = (
        und.join(
            lab.select(
                F.col("node").alias("src"), F.col("label").alias("la")
            ),
            "src",
        )
        .join(
            lab.select(
                F.col("node").alias("dst"), F.col("label").alias("lb")
            ),
            "dst",
        )
        .select("la", "lb")
    )
    tot = j.count()
    percom = j.groupBy("la").agg(
        F.count(F.lit(1)).alias("dc"),
        F.sum((F.col("la") == F.col("lb")).cast("long")).alias("ic"),
    )
    td = F.lit(float(tot))
    term = F.floor(
        (
            F.col("ic").cast("double") / td
            - (F.col("dc").cast("double") / td)
            * (F.col("dc").cast("double") / td)
        )
        * F.lit(1e9)
        + F.lit(0.5)
    ).cast("long")
    n_nodes = lab.count()
    agg = percom.select(term.alias("q")).agg(
        F.count(F.lit(1)).alias("n_communities"),
        F.sum("q").alias("qsum"),
    )
    return agg.select(
        F.lit(n_nodes).cast("long").alias("n_nodes"),
        F.col("n_communities").cast("long").alias("n_communities"),
        F.lit(tot // 2).cast("long").alias("n_edges"),
        det_round(
            F.col("qsum").cast("double") / F.lit(1e9), 6
        ).alias("modularity"),
    )


def events_watermark_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-lateness audit per event type: with `event_id` as
    the arrival order (the ingest sequence), lateness = running-max
    event time so far − this event's time; the report says how many
    events a Structured Streaming watermark of 1 h / 6 h / 24 h
    would DROP — the sizing study every streaming job needs before
    choosing `withWatermark` (the repo's stream twins use exactly
    these bounds).

    Exactness: event times are exact epoch MICROSECONDS
    (`unix_micros` / DuckDB `epoch_us` — never seconds-granularity
    casts that round differently on fractional timestamps); the
    running max, lateness, threshold counts and the lateness sum are
    all BIGINT/DECIMAL(38,0); the two ratios are single double
    divisions.

    Shape: the running max uses the repo's two-phase chunk device
    (cf. `quality_filters.token_budget_shards`) so parallelism is
    NOT capped at |event_type| (~5): (1) per-(type, event_id-chunk)
    intra-chunk running max — data-parallel across |types|×|chunks|
    tasks; (2) an EXCLUSIVE prefix-max over the tiny (type, chunk)
    table (constant-size, ~|types|·N/chunk rows); (3) broadcast the
    prefix table back and take greatest(intra-chunk max, prior-chunk
    prefix max). Max is associative over disjoint prefixes, so this
    is bit-identical to the single ordered window the oracle runs.
    At 100 TB, raise `chunk` so the prefix table stays ~1e4 rows per
    type; every stage stays data-parallel. `base` is deliberately
    NOT checkpointed: it is the full row-grain table, so the cheaper
    path is two column-pruned parquet scans (one per phase), not a
    table-sized materialization."""
    events = load_table(spark, sf_dir, "events")
    d38 = "decimal(38,0)"
    chunk = 4096  # event_ids per chunk; scale knob: ~N/1e4 at 100 TB
    us = F.unix_micros(F.col("ts"))
    # NULL-safe chunk key: the inner join back on (_type, _chunk)
    # must never DROP a row, so a NULL event_id (out of the data
    # contract, but a silent row-loss if it ever appears) lands in
    # chunk -1 rather than vanishing through a NULL join key.
    # Integral `div`, not float division: a double round-trip is
    # exact only for power-of-two chunks under 2^53, and `chunk` is
    # advertised as a scale knob — `div` keeps ANY chunk value exact
    base = events.select(
        "event_type",
        F.col("event_id"),
        us.alias("t"),
        F.coalesce(
            F.expr(f"event_id div {chunk}"), F.lit(-1)
        ).alias("_chunk"),
    )
    w_local = (
        Window.partitionBy("event_type", "_chunk")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = base.withColumn("_lmax", F.max("t").over(w_local))
    w_prefix = (
        Window.partitionBy("event_type")
        .orderBy("_chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = (
        base.groupBy("event_type", "_chunk")
        .agg(F.max("t").alias("_cmax"))
        .select(
            "event_type",
            "_chunk",
            F.max("_cmax").over(w_prefix).alias("_pmax"),
        )
    )
    seq = local.join(
        F.broadcast(prefix), ["event_type", "_chunk"]
    ).select(
        "event_type",
        (F.greatest("_lmax", "_pmax") - F.col("t")).alias("late"),
    )
    hour_us = 3_600_000_000
    agg = seq.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("late") > F.lit(hour_us)).cast("long")).alias(
            "n_late_1h"
        ),
        F.sum((F.col("late") > F.lit(6 * hour_us)).cast("long")).alias(
            "n_late_6h"
        ),
        F.sum(
            (F.col("late") > F.lit(24 * hour_us)).cast("long")
        ).alias("n_late_24h"),
        F.max("late").alias("max_late"),
        F.sum(F.col("late").cast(d38)).alias("sum_late"),
    )
    nd = F.col("n_events").cast("double")
    return agg.select(
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("n_late_1h").cast("long").alias("n_late_1h"),
        F.col("n_late_6h").cast("long").alias("n_late_6h"),
        F.col("n_late_24h").cast("long").alias("n_late_24h"),
        det_round(
            F.col("n_late_1h").cast("double") / nd, 6
        ).alias("drop_share_1h"),
        F.expr("max_late div 1000000").cast("long").alias(
            "max_late_sec"
        ),
        det_round(
            F.col("sum_late").cast("double") / F.lit(1e6) / nd, 6
        ).alias("mean_late_sec"),
    ).orderBy("event_type")


def events_partition_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(event_type, day) content checksums: row count plus an
    ORDER-FREE checksum (exact sum of a 32-bit md5 prefix over a
    canonical row serialization) — the cell-level fingerprint table
    that lets an incremental pipeline or a CDC consumer verify a
    re-ingested partition byte-for-byte without re-reading the
    source (`order_snapshot_diff` diffs rows; this is the cheap
    first-pass screen that says WHICH cells to diff).

    Exactness: the serialization is integer-only
    (event_id|user_id|centi-value, NULLs spelled 'null'), the hash
    is the shared md5-prefix device, and the checksum is an exact
    DECIMAL(38,0) sum — commutative, so partition order and
    parallelism can never change it.

    Shape: one codegen'd map stage into a (type, day)-keyed hash
    aggregate — exactly the cost of a count(*) by cell."""
    from stream_processing_system_spark.functions.scalar import (
        md5_prefix_long,
    )

    events = load_table(spark, sf_dir, "events")
    d38 = "decimal(38,0)"
    centi = F.when(
        F.col("value").isNotNull(),
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("long")
        .cast("string"),
    ).otherwise(F.lit("null"))
    ser = F.concat_ws(
        "|",
        F.coalesce(F.col("event_id").cast("string"), F.lit("null")),
        F.coalesce(F.col("user_id").cast("string"), F.lit("null")),
        centi,
    )
    cells = events.select(
        "event_type",
        F.col("ts").cast("date").cast("string").alias("day"),
        md5_prefix_long(ser, salt="ck|").alias("h"),
    )
    return (
        cells.groupBy("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("h").cast(d38)).alias("checksum"),
        )
        .select(
            "event_type",
            "day",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("checksum").cast("long").alias("checksum"),
        )
        .orderBy("event_type", "day")
    )


def orders_ca_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran–Armitage trend test: does the share of URGENT orders
    drift monotonically across order months? Scores are the month
    index (engine-free: 12·(year−1992) + month − 1), and
    z = Σ sᵢ(rᵢ − nᵢ·p̄) / √(p̄(1−p̄)·(Σ nᵢsᵢ² − (Σ nᵢsᵢ)²/N)) —
    the proportions counterpart of `events_mann_kendall` (which
    trends magnitudes; this trends a RATE, the thing dashboards
    actually alarm on).

    Exactness: all five moments (N, R, Σns, Σns², Σrs) are exact
    BIGINT/DECIMAL(38,0) sums over the month-grain cells; the z
    chain is fixed-order doubles with NULL guards for degenerate
    variance (all-one-month or all/none urgent).

    Shape: one month-grain aggregate (≤ |months| rows), one
    single-row reduce."""
    orders = load_table(spark, sf_dir, "orders")
    d38 = "decimal(38,0)"
    s = (
        (F.year("o_orderdate") - F.lit(1992)) * F.lit(12)
        + F.month("o_orderdate")
        - F.lit(1)
    ).cast("long")
    urgent = (F.col("o_orderpriority") == "1-URGENT").cast("long")
    cells = orders.select(s.alias("s"), urgent.alias("u")).groupBy(
        "s"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("u").alias("r"),
    )
    agg = cells.agg(
        F.sum(F.col("n").cast(d38)).alias("nn"),
        F.sum(F.col("r").cast(d38)).alias("rr"),
        F.sum(F.col("n").cast(d38) * F.col("s")).alias("ns"),
        F.sum(F.col("n").cast(d38) * F.col("s") * F.col("s")).alias(
            "ns2"
        ),
        F.sum(F.col("r").cast(d38) * F.col("s")).alias("rs"),
    )
    nd = F.col("nn").cast("double")
    rd = F.col("rr").cast("double")
    p = rd / nd
    t = F.col("rs").cast("double") - F.col("ns").cast("double") * p
    varx = F.col("ns2").cast("double") - (
        F.col("ns").cast("double") * F.col("ns").cast("double") / nd
    )
    var = p * (F.lit(1.0) - p) * varx
    z = F.when(var > F.lit(0.0), t / F.sqrt(var))
    trend = (
        F.when(z > F.lit(1.96), F.lit("increasing"))
        .when(z < F.lit(-1.96), F.lit("decreasing"))
        .otherwise(F.lit("no_trend"))
    )
    return agg.select(
        F.col("nn").cast("long").alias("n_orders"),
        F.col("rr").cast("long").alias("n_urgent"),
        det_round(p, 6).alias("urgent_share"),
        det_round(t, 6).alias("t_stat"),
        det_round(z, 6).alias("z_score"),
        trend.alias("trend"),
    )


def events_cvm_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér–von Mises drift test per event type: the
    INTEGRATED squared ECDF gap between the first- and second-half
    value distributions (same fixed split as `events_ks_test`),
    T = Σ_pooled (F_A − F_B)² · n_AnB/N² (Anderson 1962) — the
    whole-distribution member of the drift family: KS sees only the
    single most divergent point, CvM accumulates every cell's gap,
    so a broad small shift that never produces one big ECDF gap
    still registers.

    Exactness: values land on the integer cent grid; the per-cell
    gap is the common-denominator integer cumA·nB − cumB·nA (the KS
    device), each cell contributes (ca+cb)·gap² to an exact
    DECIMAL(38,0) sum, and T = S/(nA·nB·N²) is one fixed-order
    double chain. Overflow posture (the `embedding_mmd_shift`
    precedent): S ≤ N·(nA·nB)², so decimal(38,0) holds to ~3e7 rows
    per type; past it non-ANSI Spark NULLs silently while DuckDB's
    HUGEINT raises — converged by raising loudly via the same
    isNull-guard.

    Shape: one (type, cent) hash aggregate, cumulative windows over
    the BOUNDED cent-domain frame, one per-type reduce.

    NULL ts is filtered EXPLICITLY (not left to SUM's NULL-skip):
    `F.sum(1 - half)` would skip a NULL-ts row while the oracle's
    CASE WHEN counts it into ca — a latent parity divergence
    (ADVICE r7) closed by the same `ts IS NOT NULL` predicate on
    both engines."""
    return cvm_from_cells(halfsplit_value_cells(spark, sf_dir))


def cvm_from_cells(
    cells: DataFrame, query: str = "events_cvm_drift"
) -> DataFrame:
    """Shared CvM tail over an (event_type, v, ca, cb) exact-centi
    count frame — factored for the streaming twin (the cell counts
    are a mergeable monoid, so a streaming aggregation maintains
    exactly this frame). `query` names the caller in the overflow
    diagnostic so a raise in the streaming twin blames the right
    query (ADVICE r7)."""
    d38 = "decimal(38,0)"
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("event_type")
    cum = cells.select(
        "event_type",
        (F.col("ca") + F.col("cb")).alias("t"),
        F.sum("ca").over(w_cum).alias("cuma"),
        F.sum("cb").over(w_cum).alias("cumb"),
        F.sum("ca").over(w_tot).alias("na"),
        F.sum("cb").over(w_tot).alias("nb"),
    ).where((F.col("na") > 0) & (F.col("nb") > 0))
    gap = F.col("cuma").cast(d38) * F.col("nb") - F.col("cumb").cast(
        d38
    ) * F.col("na")
    term = F.col("t").cast(d38) * gap * gap
    # overflow guard must catch the PER-ROW mode too: a decimal
    # overflow inside one cell's t·gap² NULLs just that row, SUM
    # skips it, and s would come back non-NULL but silently wrong —
    # so NULL terms are counted explicitly (inputs are never NULL,
    # so a NULL term IS an overflow)
    agg = cum.groupBy("event_type").agg(
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
        F.sum(term).alias("s"),
        F.sum(
            F.when(term.isNull(), F.lit(1)).otherwise(F.lit(0))
        ).alias("n_ovf"),
    )
    _raise = F.raise_error(
        F.lit(
            f"{query}: decimal(38,0) overflow in the gap² "
            "sum (per-type row count exceeds the documented ~3e7 "
            "bound); re-grid via a second-level chunked reduction"
        )
    ).cast("double")
    nad = F.col("na").cast("double")
    nbd = F.col("nb").cast("double")
    nd = nad + nbd
    t_stat = F.when(
        F.col("s").isNull() | (F.col("n_ovf") > 0), _raise
    ).otherwise(F.col("s").cast("double") / (nad * nbd * nd * nd))
    return agg.select(
        "event_type",
        F.col("na").cast("long").alias("n_first"),
        F.col("nb").cast("long").alias("n_second"),
        det_round(t_stat, 6).alias("cvm_t"),
    ).orderBy("event_type")


def orders_gk_gamma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goodman–Kruskal gamma between order priority (ordinal
    1-URGENT … 5-LOW) and total-price band: do urgent orders skew
    toward larger baskets? Gamma = (C − D)/(C + D) over concordant /
    discordant pairs — the ordinal-vs-ordinal association member of
    the correlation family (`orders_kendall_tau` ranks two NUMERIC
    columns pairwise; gamma works on the categorical contingency
    table and ignores ties, the standard choice for ordered
    categories).

    Exactness: the priority ordinal is the parsed leading digit, the
    price band is an exact cent comparison (cents div 50000_00,
    capped at 8 — never a float divide at a band boundary), and C/D
    are exact products summed over the ≤45-cell contingency table.
    One double division at the end, NULL when C + D = 0.

    Shape: one (priority, band) hash aggregate (≤45 rows), then the
    dominance pairing as a BroadcastHashJoin of the tiny cell table
    with itself on a literal key (never a CartesianProduct), and a
    single-row reduce — everything after the first aggregate is
    constant-size no matter how many orders exist. A degenerate
    single-class input still yields one row (C=D=0, gamma NULL);
    an entirely EMPTY orders table is out of the data contract
    (TPC-H tables are non-empty at every SF)."""
    orders = load_table(spark, sf_dir, "orders")
    d38 = "decimal(38,0)"
    pr = F.substring(F.col("o_orderpriority"), 1, 1).cast("long")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    band = F.least(F.expr("_cents div 5000000"), F.lit(8)).cast("long")
    # the <=45-row cell table feeds BOTH join sides and the total —
    # localCheckpoint so the orders scan + aggregate run ONCE, not 3x
    cells = (
        orders.select(pr.alias("pr"), cents.alias("_cents"))
        .select("pr", band.alias("band"))
        .groupBy("pr", "band")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("_k", F.lit(1))
        .localCheckpoint(eager=True)
    )
    a = cells.select(
        "_k",
        F.col("pr").alias("pr1"),
        F.col("band").alias("b1"),
        F.col("n").alias("n1"),
    )
    b = cells.select(
        "_k",
        F.col("pr").alias("pr2"),
        F.col("band").alias("b2"),
        F.col("n").alias("n2"),
    )
    pairs = a.join(F.broadcast(b), "_k").where(F.col("pr2") > F.col("pr1"))
    prod = F.col("n1").cast(d38) * F.col("n2")
    # global agg (no groupBy) so a degenerate single-priority input
    # still yields ONE row (empty pair table -> C = D = 0, gamma
    # NULL), matching the oracle's ungrouped aggregate
    agg = pairs.agg(
        F.sum(F.when(F.col("b2") > F.col("b1"), prod)).alias("_c"),
        F.sum(F.when(F.col("b2") < F.col("b1"), prod)).alias("_d"),
    ).select(
        F.lit(1).alias("_k"),
        F.coalesce(F.col("_c"), F.lit(0).cast(d38)).alias("c"),
        F.coalesce(F.col("_d"), F.lit(0).cast(d38)).alias("d"),
    )
    tot = cells.groupBy("_k").agg(F.sum(F.col("n").cast(d38)).alias("nn"))
    cd = F.col("c").cast("double")
    dd = F.col("d").cast("double")
    gamma = F.when(
        (F.col("c") + F.col("d")) > F.lit(0).cast(d38),
        (cd - dd) / (cd + dd),
    )
    return agg.join(F.broadcast(tot), "_k").select(
        F.col("nn").cast("long").alias("n_orders"),
        F.col("c").cast("long").alias("concordant"),
        F.col("d").cast("long").alias("discordant"),
        det_round(gamma, 6).alias("gamma"),
    )


def events_pinball_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-forecast backtest per event type: fit the exact
    DISCRETE p50/p90 of value on the first half (same fixed
    2024-01-16 split as the drift family, same ⌈q·n⌉ grid-histogram
    device as `value_percentiles_disc`), then score both constant
    forecasts on the second half with the pinball (quantile) loss —
    the canonical quantile-regression metric, and the backtest that
    says whether last month's P90 latency/spend threshold still
    holds this month.

    Exactness: forecasts and outcomes are exact cent longs; the
    q-weighted pinball terms are scaled to INTEGERS (2·L₅₀ = Σ|d|,
    10·L₉₀ = Σ(y>ŷ ? 9(y−ŷ) : ŷ−y)) and summed in DECIMAL(38,0);
    the per-type means divide once in doubles.

    Shape: first-half histogram → cumulative window over the
    bounded cent domain → 5-row forecast table, broadcast back onto
    the second half → one hash aggregate. No row-grain windows."""
    events = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    d38 = "decimal(38,0)"
    centi = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    split = F.col("ts") >= F.lit("2024-01-16")
    hist = (
        events.where(~split)
        .groupBy("event_type", centi.alias("cy"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("cy")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "cy",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(wt).alias("n"),
    )

    def pick(q: int, name: str):
        return F.min(
            F.when(F.col("cum") * 100 >= F.col("n") * q, F.col("cy"))
        ).alias(name)

    fc = cum.groupBy("event_type").agg(
        F.max("n").alias("n_train"), pick(50, "f50"), pick(90, "f90")
    )
    ev = (
        events.where(split)
        .select("event_type", centi.alias("y"))
        .join(F.broadcast(fc), "event_type")
    )
    d50 = F.col("y") - F.col("f50")
    d90 = F.col("y") - F.col("f90")
    agg = ev.groupBy("event_type").agg(
        F.max("n_train").alias("n_train"),
        F.max("f50").alias("f50"),
        F.max("f90").alias("f90"),
        F.count(F.lit(1)).alias("n_eval"),
        F.sum(F.abs(d50).cast(d38)).alias("l50x2"),
        F.sum(
            F.when(d90 > 0, F.lit(9) * d90)
            .otherwise(-d90)
            .cast(d38)
        ).alias("l90x10"),
    )
    ne = F.col("n_eval").cast("double")
    return agg.select(
        "event_type",
        F.col("n_train").cast("long").alias("n_train"),
        F.col("n_eval").cast("long").alias("n_eval"),
        (F.col("f50").cast("double") / F.lit(100.0)).alias("p50_forecast"),
        (F.col("f90").cast("double") / F.lit(100.0)).alias("p90_forecast"),
        det_round(
            F.col("l50x2").cast("double") / F.lit(2.0) / ne / F.lit(100.0),
            6,
        ).alias("mean_pinball_p50"),
        det_round(
            F.col("l90x10").cast("double") / F.lit(10.0) / ne / F.lit(100.0),
            6,
        ).alias("mean_pinball_p90"),
    ).orderBy("event_type")


def supplier_revenue_theil(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T inequality index of revenue concentration across
    suppliers: T = Σᵢ (rᵢ/R)·ln(N·rᵢ/R) — 0 when every supplier
    earns the same, ln(N) at total concentration. The decomposable
    inequality member of the concentration family
    (`nation_supplier_hhi` is the sum-of-squares market-shares view;
    `brand_revenue_pareto` is the cumulative-share view; Theil is
    the information-theoretic one auditors decompose by region).

    Exactness: per-supplier revenue is the proven money device
    (Σ cast(extprice·(1−disc) as decimal(18,4)), exactly
    representable) converted to exact 1e-4 integer units; each
    supplier's float term is floored to a 1e-12 grid BIGINT before
    the cross-supplier sum (the chi2-drift device — a data-sized
    float sum is never trusted raw), and the final T is one double
    division. ln parity Spark↔DuckDB is the same accepted reliance
    as the IRLS/Adamic-Adar families.

    Shape: one lineitem→supplier hash aggregate, a 1-row total
    broadcast back on a literal key, one exact-integer reduce.
    An entirely empty lineitem table is out of the data contract.
    Precondition: per-supplier revenue > 0 (TPC-H prices are
    positive); a zero-revenue supplier hits an explicit in-plan
    raise (Spark's ln(0) is NULL and would be silently SKIPPED by
    the sum; DuckDB's ln(0) raises — the guard converges both to a
    loud failure)."""
    li = load_table(spark, sf_dir, "lineitem")
    d38 = "decimal(38,0)"
    dp = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # supplier-grain frame feeds the total AND the term map —
    # localCheckpoint so the lineitem scan + aggregate run ONCE
    per = (
        li.groupBy("l_suppkey")
        .agg(F.sum(dp.cast("decimal(18,4)")).alias("_rev4"))
        .select(
            "l_suppkey",
            F.expr("cast(_rev4 * 10000 as decimal(38,0))").alias("r"),
        )
        .withColumn("_k", F.lit(1))
        .localCheckpoint(eager=True)
    )
    tot = per.groupBy("_k").agg(
        F.sum("r").alias("rr"),
        F.count(F.lit(1)).alias("nn"),
        F.max("r").alias("rmax"),
    )
    j = per.join(F.broadcast(tot), "_k")
    rd = F.col("r").cast("double")
    Rd = F.col("rr").cast("double")
    Nd = F.col("nn").cast("double")
    p = rd / Rd
    # zero-revenue guard: Spark's ln(0) is NULL (the term would be
    # silently SKIPPED by SUM) while DuckDB's ln(0) raises — converge
    # by raising loudly on r <= 0 (out of the data contract)
    term = F.when(
        F.col("r") <= F.lit(0).cast("decimal(38,0)"),
        F.raise_error(
            F.lit(
                "supplier_revenue_theil: non-positive supplier "
                "revenue breaks the ln term (DuckDB raises on "
                "ln(0); Spark must not silently skip)"
            )
        ).cast("long"),
    ).otherwise(
        F.floor(p * F.log(Nd * p) * F.lit(1e12) + F.lit(0.5)).cast(
            "long"
        )
    )
    agg = j.groupBy("_k").agg(
        F.max("nn").alias("nn"),
        F.max("rr").alias("rr"),
        F.max("rmax").alias("rmax"),
        F.sum(term.cast(d38)).alias("s"),
    )
    return agg.select(
        F.col("nn").cast("long").alias("n_suppliers"),
        (F.col("rr").cast("double") / F.lit(1e4)).alias("total_revenue"),
        det_round(
            F.col("rmax").cast("double") / F.col("rr").cast("double"), 6
        ).alias("top_share"),
        det_round(
            F.col("s").cast("double") / F.lit(1e12), 6
        ).alias("theil"),
    )


def copurchase_neighbor_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 predicted links in the user co-purchase graph by
    neighborhood Jaccard (operators/graph.py:neighbor_jaccard —
    integer-division score grid, no floats in the ranking, same
    hub valve as Adamic-Adar)."""
    from stream_processing_system_spark.operators.graph import (
        cooccurrence_edges,
        neighbor_jaccard,
    )

    events = load_table(spark, sf_dir, "events")
    return neighbor_jaccard(cooccurrence_edges(events), k=50).select(
        F.col("u").alias("user_a"),
        F.col("v").alias("user_b"),
        "n_common",
        "n_union",
        "jaccard",
    )


def events_anderson_darling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Anderson–Darling drift test per event type — the
    TAIL-WEIGHTED member of the two-sample drift family (reference
    parity anchor: the same `events` monitoring surface as
    `events_ks_test` / `events_cvm_drift`): KS sees the single
    largest ECDF gap, CvM integrates every gap equally, AD divides
    each gap² by H(1−H) so divergence in the distribution TAILS —
    exactly where contamination and outlier drift live — counts for
    more. A² = Σ_pooled-cells t·(F_A−F_B)²/(H(1−H)) · n_A n_B/N,
    discretized over the exact cent-value cells (Pettitt 1976 form).

    Exactness: from the shared `halfsplit_value_cells` frame, the
    per-cell gap = cumA·nB − cumB·nA and the pooled cumulative
    cumT are exact integers; each cell's term
    t·gap²/(nA·nB·cumT·(N−cumT)) is ONE fixed-order double chain
    floored onto the 1e-9 integer grid (the chi2-drift device:
    cross-cell sums only ever add exact int64 micro-terms), and the
    final A² is a single division by 1e9. The last pooled cell
    (cumT = N, where H(1−H) = 0) is excluded on both engines, the
    standard discrete-AD convention.

    Shape: one (type, cent) hash aggregate, two cumulative windows
    over the BOUNDED cent-domain frame, one per-type reduce — the
    CvM plan's shape exactly; at 100 TB the post-aggregate frame
    stays |types|×|cent domain| regardless of row count."""
    return ad_from_cells(halfsplit_value_cells(spark, sf_dir))


def ad_from_cells(cells: DataFrame) -> DataFrame:
    """Shared Anderson–Darling tail over an (event_type, v, ca, cb)
    exact-centi count frame — factored (the `cvm_from_cells` /
    `ks_from_cells` precedent) so the streaming twin reduces the
    same drained cell-monoid state."""
    d38 = "decimal(38,0)"
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("event_type")
    cum = cells.select(
        "event_type",
        (F.col("ca") + F.col("cb")).alias("t"),
        F.sum("ca").over(w_cum).alias("cuma"),
        F.sum("cb").over(w_cum).alias("cumb"),
        F.sum("ca").over(w_tot).alias("na"),
        F.sum("cb").over(w_tot).alias("nb"),
    ).where((F.col("na") > 0) & (F.col("nb") > 0))
    nad = F.col("na").cast("double")
    nbd = F.col("nb").cast("double")
    nd = nad + nbd
    ct = F.col("cuma") + F.col("cumb")
    ctd = ct.cast("double")
    gapd = (
        F.col("cuma").cast(d38) * F.col("nb")
        - F.col("cumb").cast(d38) * F.col("na")
    ).cast("double")
    # one fixed-order double chain per cell, then the 1e-9 grid; the
    # oracle spells the IDENTICAL association order
    term = (
        F.col("t").cast("double") * gapd * gapd
        / (nad * nbd * ctd * (nd - ctd))
    )
    scaled = term * F.lit(1e9)
    micro = F.floor(scaled + F.lit(0.5)).cast("long")
    # per-row overflow guard (the CvM/MMD lesson, corrected per the
    # round-8 review): `F.floor` on a double yields a LONG that
    # SATURATES at Long.MaxValue in non-ANSI Spark — it never NULLs
    # — so the detectable signal is the PRE-floor double crossing
    # the BIGINT range. term ≥ 0 by construction (denominators
    # filtered positive), so flag scaled > 9.2e18, where DuckDB's
    # BIGINT cast would raise; converge by raising loudly.
    agg = (
        cum.where(ct < F.col("na") + F.col("nb"))
        .groupBy("event_type")
        .agg(
            F.max("na").alias("na"),
            F.max("nb").alias("nb"),
            F.sum(micro.cast(d38)).alias("s"),
            F.sum(
                F.when(scaled > F.lit(9.2e18), F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias("n_ovf"),
        )
    )
    _raise = F.raise_error(
        F.lit(
            "ad_from_cells: 1e-9-grid term overflowed BIGINT (per-"
            "type counts beyond the documented double-chain range); "
            "re-grid via a coarser per-cell quantum"
        )
    ).cast("double")
    a2 = F.when(F.col("n_ovf") > 0, _raise).otherwise(
        F.col("s").cast("double") / F.lit(1e9)
    )
    return agg.select(
        "event_type",
        F.col("na").cast("long").alias("n_first"),
        F.col("nb").cast("long").alias("n_second"),
        det_round(a2, 6).alias("ad_a2"),
    ).orderBy("event_type")


def events_cliffs_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta per event type between the first- and
    second-half value distributions: the ORDINAL EFFECT SIZE the
    drift family's p-value tests (KS/CvM/AD/Mann-Whitney) do not
    report — δ = (#(a>b) − #(a<b)) / (nA·nB) ∈ [−1, 1], i.e. how
    often a first-half value dominates a second-half value, net of
    the reverse. A drift monitor alarms on the AD/KS statistic and
    reads δ for the direction and magnitude of the shift.

    Exactness: from the shared `halfsplit_value_cells` frame,
    #(a>b) = Σ_v ca(v)·cumB(<v) and #(a<b) = Σ_v ca(v)·(nB−cumB(≤v))
    are exact DECIMAL(38,0) products of cumulative integer counts;
    δ is ONE double division at the end.

    Shape: identical to the KS plan — one bounded cell aggregate,
    one cumulative window, one per-type reduce."""
    return cliffs_from_cells(halfsplit_value_cells(spark, sf_dir))


def cliffs_from_cells(cells: DataFrame) -> DataFrame:
    """Shared Cliff's-delta tail over an (event_type, v, ca, cb)
    exact-centi count frame — factored (the `cvm_from_cells` /
    `ks_from_cells` / `ad_from_cells` precedent) so the streaming
    twin reduces the same drained cell-monoid state."""
    d38 = "decimal(38,0)"
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("event_type")
    # ca(v)·cumB(<v): strictly-below mass = cumb_le − cb at v
    cum = cells.select(
        "event_type",
        "ca",
        "cb",
        F.sum("cb").over(w_cum).alias("cumb_le"),
        F.sum("ca").over(w_tot).alias("na"),
        F.sum("cb").over(w_tot).alias("nb"),
    ).where((F.col("na") > 0) & (F.col("nb") > 0))
    gt = F.col("ca").cast(d38) * (F.col("cumb_le") - F.col("cb"))
    lt = F.col("ca").cast(d38) * (F.col("nb") - F.col("cumb_le"))
    agg = cum.groupBy("event_type").agg(
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
        F.sum(gt).alias("n_gt"),
        F.sum(lt).alias("n_lt"),
    )
    return agg.select(
        "event_type",
        F.col("na").cast("long").alias("n_first"),
        F.col("nb").cast("long").alias("n_second"),
        det_round(
            (F.col("n_gt") - F.col("n_lt")).cast("double")
            / (F.col("na").cast("double") * F.col("nb").cast("double")),
            6,
        ).alias("cliffs_delta"),
    ).orderBy("event_type")


def events_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lo–MacKinlay variance-ratio test VR(k) per event type on the
    cumulative event-count path: is daily traffic an uncorrelated
    sequence (VR≈1), trending/persistent (VR>1, positive
    autocorrelation), or mean-reverting (VR<1)? The path x_t is the
    running total of daily counts, 1-period increments are the daily
    counts themselves, and VR(k) compares the variance of k-day
    overlapping increments against k times the 1-day variance — the
    classic random-walk diagnostic, complementing `events_acf`
    (per-lag correlation) with one scale-free trend/reversion score.

    Exactness (the division-free-centering device): with T observed
    days, total S = Σc, every centered square is computed as the
    exact integer (T·inc − j·S)² — the 1/T factors cancel in the
    ratio — summed in DECIMAL(38,0); VR is ONE fixed-order double
    chain over the two exact sums and integer counts. Days come from
    the engine-free calendar (epoch-micros div 86.4e9), never
    engine date functions.

    Shape: one (type, day) count aggregate (bounded by the calendar
    domain), a k-lag window over the per-type daily frame, one
    per-type reduce. k = 5."""
    events = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull()
    )
    d38 = "decimal(38,0)"
    k = 5
    # exact epoch-day: mod-subtract makes the division exact, so no
    # double-rounding surface at midnight boundaries
    us = F.unix_micros(F.col("ts"))
    day = (us - (us % F.lit(86_400_000_000))) / F.lit(86_400_000_000)
    daily = events.groupBy(
        "event_type", day.cast("long").alias("d")
    ).agg(F.count(F.lit(1)).alias("c"))
    w_ord = Window.partitionBy("event_type").orderBy("d")
    w_tot = Window.partitionBy("event_type")
    # x_t = running total; k-increment y_t = x_t − x_{t−k} over the
    # OBSERVED day sequence (gaps close up, documented)
    seq = daily.select(
        "event_type",
        "d",
        F.col("c"),
        F.sum("c").over(
            w_ord.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("x"),
        F.count(F.lit(1)).over(w_tot).alias("t_days"),
        F.sum("c").over(w_tot).alias("s"),
    )
    y = F.col("x") - F.lag("x", k).over(w_ord)
    seq2 = seq.select(
        "event_type",
        "c",
        "t_days",
        "s",
        y.alias("y"),
    )
    one_dev = F.col("t_days").cast(d38) * F.col("c") - F.col("s")
    k_dev = F.col("t_days").cast(d38) * F.col("y") - F.lit(k) * F.col("s")
    agg = seq2.groupBy("event_type").agg(
        F.max("t_days").alias("t_days"),
        F.sum(one_dev * one_dev).alias("ss1"),
        F.sum(F.when(F.col("y").isNotNull(), k_dev * k_dev)).alias("ssk"),
        F.sum(F.when(F.col("y").isNotNull(), F.lit(1))).alias("m"),
    )
    td = F.col("t_days").cast("double")
    # VR = [SSk/(k·(m−1))] / [SS1/(T−1)]; the hidden 1/T² cancels
    vr = (
        F.col("ssk").cast("double") * (td - F.lit(1.0))
        / (
            F.lit(float(k))
            * (F.col("m").cast("double") - F.lit(1.0))
            * F.col("ss1").cast("double")
        )
    )
    return agg.select(
        "event_type",
        F.col("t_days").cast("long").alias("n_days"),
        F.col("m").cast("long").alias("n_k_windows"),
        F.when(
            (F.col("m") > 1) & (F.col("ss1") > 0), det_round(vr, 6)
        ).alias("vr_k5"),
    ).orderBy("event_type")


def events_daypart_jonckheere(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere–Terpstra ordered-alternative trend test per event
    type: do event VALUES trend upward across the day, with the day
    split into the four ordered dayparts night (00–05) / morning
    (06–11) / afternoon (12–17) / evening (18–23)? JT = Σ_{g<h} U_gh
    sums the Mann–Whitney statistic over every ORDERED pair of
    dayparts, which is strictly more powerful than Kruskal–Wallis
    when the alternative is monotone in the group order — the
    ordered-dose sibling in the rank-test family (`events_
    mannwhitney_u` 2 groups, `events_kruskal_wallis` any-difference).

    Exactness: the doubled-statistic device — 2·JT = Σ_cells
    n(h,v)·(2·below(h,v) + ties(h,v)) where below/ties are exact
    integer prefix masses over a DENSE (daypart × observed cent
    value) grid (4·|values| rows, built with a cross join against
    the distinct-value table so absent cells are explicit zeros and
    both engines walk the identical grid). Null mean and variance
    are closed-form integers on the QUADRUPLED statistic — 4·μ =
    N² − Σn_g² and 72·σ² = N²(2N+3) − Σn_g²(2n_g+3) — so
    z = (4JT − 4μ)/(4σ) is one fixed-order double chain with no
    integer halving anywhere (sqrt is IEEE correctly-rounded, the
    repo's accepted parity class).

    Shape: one (type, daypart, cent) hash aggregate, a 4× dense
    grid over the bounded cent domain, two cumulative windows, one
    per-type reduce — nothing data-sized after the first aggregate;
    at 100 TB the grid stays |types|·4·|cent domain|."""
    events = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    d38 = "decimal(38,0)"
    # engine-free daypart: epoch micros mod 1 day, integral-div 6 h.
    # The division is EXACT (numerator is a multiple of the divisor
    # by construction — the mod-subtract form), so no float-rounding
    # surface exists at daypart boundaries (the ADVICE-r7 chunk-key
    # lesson applied from the start).
    us = F.unix_micros(F.col("ts"))
    part = (
        (us % F.lit(86_400_000_000)) - (us % F.lit(21_600_000_000))
    ) / F.lit(21_600_000_000)
    # the tiny cell table feeds THREE branches (distinct values, the
    # dense-grid join, per-daypart sizes) — localCheckpoint so the
    # row-grain events scan + aggregate run ONCE (Theil precedent)
    cells = (
        events.groupBy(
            "event_type",
            part.cast("long").alias("g"),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("long")
            .alias("v"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    # dense (type, g, v) grid: distinct values × the 4 dayparts
    vals = cells.select("event_type", "v").distinct()
    parts_df = vals.sparkSession.range(4).select(
        F.col("id").cast("long").alias("g")
    )
    grid = vals.crossJoin(F.broadcast(parts_df)).join(
        cells, ["event_type", "g", "v"], "left"
    ).select(
        "event_type",
        "g",
        "v",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
    )
    w_v = (
        Window.partitionBy("event_type", "g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_g = (
        Window.partitionBy("event_type", "v")
        .orderBy("g")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = grid.select(
        "event_type",
        "g",
        "v",
        "n",
        F.coalesce(F.sum("n").over(w_v), F.lit(0)).alias("cumlt"),
    ).select(
        "event_type",
        "g",
        "v",
        "n",
        F.coalesce(F.sum("cumlt").over(w_g), F.lit(0)).alias("below"),
        F.coalesce(F.sum("n").over(w_g), F.lit(0)).alias("ties"),
    )
    jt2_term = F.col("n").cast(d38) * (
        F.lit(2) * F.col("below") + F.col("ties")
    )
    per_type = staged.groupBy("event_type").agg(
        F.sum(jt2_term).alias("jt2")
    )
    sizes = cells.groupBy("event_type", "g").agg(
        F.sum("n").alias("ng")
    )
    moments = sizes.groupBy("event_type").agg(
        F.sum("ng").alias("nn"),
        F.sum(F.col("ng").cast(d38) * F.col("ng")).alias("sq"),
        F.sum(
            F.col("ng").cast(d38)
            * F.col("ng")
            * (F.lit(2) * F.col("ng") + F.lit(3))
        ).alias("cu"),
    )
    joined = per_type.join(moments, "event_type")
    nnd = F.col("nn").cast(d38)
    # quadrupled statistic keeps everything integer: jt4 = 4·JT,
    # mu4 = 4·μ = N² − Σn_g² (no halving, no decimal division)
    jt4 = F.lit(2) * F.col("jt2")
    mu4 = nnd * F.col("nn") - F.col("sq")
    var72 = nnd * F.col("nn") * (
        F.lit(2) * F.col("nn") + F.lit(3)
    ) - F.col("cu")
    out = joined.select(
        "event_type",
        F.col("nn").cast("long").alias("n_events"),
        F.col("jt2").cast("long").alias("jt2"),
        jt4.alias("jt4"),
        mu4.alias("mu4"),
        var72.alias("var72"),
    )
    return out.select(
        "event_type",
        "n_events",
        "jt2",
        F.when(
            F.col("var72") > 0,
            det_round(
                (F.col("jt4") - F.col("mu4")).cast("double")
                / (
                    F.lit(4.0)
                    * F.sqrt(F.col("var72").cast("double") / F.lit(72.0))
                ),
                6,
            ),
        ).alias("jt_z"),
    ).orderBy("event_type")


def copurchase_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficients of the user co-purchase graph at
    degree thresholds 1/2/4/8 (operators/graph.py:rich_club's
    default `ks`, pinned by the oracle's VALUES list): do
    the high-degree users wire into a dense core? One degree
    aggregate, one edge pass with both endpoint degrees, conditional
    aggregation over the 4 literal thresholds — exact integer counts,
    one double division per row."""
    from stream_processing_system_spark.operators.graph import (
        cooccurrence_edges,
        rich_club,
    )

    events = load_table(spark, sf_dir, "events")
    return rich_club(cooccurrence_edges(events))


def events_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe (median-centered Levene) test per event type:
    does value VARIABILITY differ across the four dayparts? The
    drift/ANOVA family tests location (`events_dow_anova`,
    `events_daypart_jonckheere`); this is the scale counterpart —
    a variance regime change (e.g. a pricing experiment widening
    the spread) passes every mean test and trips this one. The
    statistic is a one-way ANOVA F on the absolute deviations
    |x − median_g| from each group's median — the median centering
    is what makes it robust (Brown & Forsythe 1974).

    Exactness: values sit on the cent grid; the group median is the
    LOWER median (first cell where 2·cum ≥ n, the weighted-median
    pick-first device — a deterministic convention mirrored in the
    oracle), so every |c − med| deviation is an exact integer; group
    sums and Σdev² are DECIMAL(38,0); the cross-GROUP Σ S_g²/n_g
    uses the MEAN-grid device — the group mean deviation S_g/n_g
    (bounded by the cent domain at any scale) is floored onto the
    1e-6 grid and t_g = n_g·m6² is an exact DECIMAL(38,0) product,
    so the between term never outgrows the integer range the way a
    per-group sum-of-squares grid would (the round-9 100× lesson);
    the F statistic is one fixed-order double chain.

    Shape: one (type, daypart, cent) hash aggregate, a cumulative
    window over the bounded cent domain for the medians, a
    broadcast-sized median join back onto the CELL table (never the
    rows), then ≤ |types|·4 group reductions."""
    events = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    d38 = "decimal(38,0)"
    us = F.unix_micros(F.col("ts"))
    part = (
        (us % F.lit(86_400_000_000)) - (us % F.lit(21_600_000_000))
    ) / F.lit(21_600_000_000)
    # the cell table feeds the median lookup AND the deviation join —
    # localCheckpoint so the events scan + aggregate run ONCE
    cells = (
        events.groupBy(
            "event_type",
            part.cast("long").alias("g"),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("long")
            .alias("v"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    w_cum = (
        Window.partitionBy("event_type", "g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("event_type", "g")
    flagged = cells.select(
        "event_type",
        "g",
        "v",
        F.sum("n").over(w_cum).alias("cum"),
        F.sum("n").over(w_tot).alias("ng"),
    ).where(F.col("cum") * 2 >= F.col("ng"))
    pick = Window.partitionBy("event_type", "g").orderBy("v")
    medians = (
        flagged.withColumn("_rn", F.row_number().over(pick))
        .where(F.col("_rn") == 1)
        .select("event_type", "g", F.col("v").alias("med"))
    )
    dev_cells = cells.join(medians, ["event_type", "g"]).select(
        "event_type",
        "g",
        "n",
        F.abs(F.col("v") - F.col("med")).alias("dev"),
    )
    groups = dev_cells.groupBy("event_type", "g").agg(
        F.sum("n").alias("ng"),
        F.sum(F.col("n").cast(d38) * F.col("dev")).alias("sg"),
        F.sum(
            F.col("n").cast(d38) * F.col("dev") * F.col("dev")
        ).alias("qg"),
    )
    # The between-group term Σ_g S_g²/n_g on the mean-grid device:
    # quantize the group MEAN deviation m_g = S_g/n_g (BOUNDED by
    # the cent domain at ANY row count, unlike S_g² which overflowed
    # BIGINT at the 100× scale experiment) onto the 1e-6 grid, then
    # t_g = n_g·m6² is an exact DECIMAL(38,0) product — inside the
    # decimal range to ~1e12 rows/group at cent-scale deviations.
    # Overflow posture: the pre-floor double guard raises loudly if
    # the grid mean ever crossed BIGINT (unreachable below ~9e12-
    # cent mean deviations), and a NULL t (decimal overflow in
    # non-ANSI mode; ANSI raises on its own) is counted per-row and
    # raised — converging with DuckDB's HUGEINT raise.
    mean_raw = (
        F.col("sg").cast("double")
        / F.col("ng").cast("double")
        * F.lit(1e6)
    )
    m6 = F.floor(mean_raw + F.lit(0.5)).cast("long")
    term = F.col("ng").cast(d38) * m6 * m6
    per_type = groups.select(
        "event_type",
        "ng",
        "sg",
        "qg",
        term.alias("t"),
        F.when(
            (mean_raw > F.lit(9.2e18)) | F.col("t").isNull(),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("ovf"),
    ).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("ng").alias("n"),
        F.sum("sg").alias("s"),
        F.sum("qg").alias("q"),
        F.sum("t").alias("tsum"),
        F.sum("ovf").alias("n_ovf"),
    )
    _bf_raise = F.raise_error(
        F.lit(
            "events_brown_forsythe: mean-grid group term overflowed "
            "(per-group mean deviation beyond the documented "
            "domain); re-grid via a coarser quantum"
        )
    ).cast("double")
    # t_g = n_g·m6² carries a 1e12 scale (two 1e6 grid factors)
    between_raw = F.when(F.col("n_ovf") > 0, _bf_raise).otherwise(
        F.col("tsum").cast("double") / F.lit(1e12)
    )
    ssb = between_raw - (F.col("s") * F.col("s")).cast(
        "double"
    ) / F.col("n").cast("double")
    ssw = F.col("q").cast("double") - between_raw
    kd = F.col("k").cast("double")
    nd = F.col("n").cast("double")
    fstat = (ssb / (kd - F.lit(1.0))) / (ssw / (nd - kd))
    return (
        per_type.where(
            (F.col("k") > 1)
            & ((F.col("n") - F.col("k")) > 0)
            & (F.col("q").cast("double") - between_raw > 0)
        )
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_events"),
            F.col("k").cast("long").alias("n_groups"),
            det_round(fstat, 6).alias("bf_f"),
        )
        .orderBy("event_type")
    )


def events_friedman_type_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test with days as blocks and event types as
    treatments: is the daily RANKING of event types by count stable,
    or does the type mix genuinely reorder day to day? The
    repeated-measures member of the rank-test family — Kruskal–
    Wallis pools all observations and is blind to per-day pairing;
    Friedman ranks WITHIN each day, so a weekend flip of two types
    registers even when their overall totals tie.

    Exactness: per-day ranks use the doubled-midrank device
    (2·rank = 2·#smaller + #tied + 1, exact integers) over a DENSE
    (day × type) grid (absent counts are explicit zeros, so every
    block ranks the same k types on both engines). The tie-corrected
    statistic χ² = (k−1)·Σ_j (R_j − n(k+1)/2)² / (A − C) is computed
    entirely on the doubled scale — numerator Σ(2R_j − n(k+1))²·¼
    and denominator (Σ(2r)² − n·k·(k+1)²)·¼ share the ¼, so the
    whole thing is exact DECIMAL(38,0) integers until ONE double
    division; NULL when every block is fully tied (denominator 0).

    Shape: one (day, type) count aggregate (calendar-bounded), the
    dense grid via a distinct-days × distinct-types cross join, two
    rank windows per block, one global reduce — output is a single
    row."""
    events = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull()
    )
    d38 = "decimal(38,0)"
    us = F.unix_micros(F.col("ts"))
    day = (us - (us % F.lit(86_400_000_000))) / F.lit(86_400_000_000)
    counts = events.groupBy(
        day.cast("long").alias("d"), "event_type"
    ).agg(F.count(F.lit(1)).alias("c"))
    days = counts.select("d").distinct()
    types = counts.select("event_type").distinct()
    grid = days.crossJoin(types).join(
        counts, ["d", "event_type"], "left"
    ).select(
        "d",
        "event_type",
        F.coalesce(F.col("c"), F.lit(0)).alias("c"),
    )
    w_rank = Window.partitionBy("d").orderBy("c")
    w_tie = Window.partitionBy("d", "c")
    ranked = grid.select(
        "d",
        "event_type",
        (
            F.lit(2) * (F.rank().over(w_rank) - F.lit(1))
            + F.count(F.lit(1)).over(w_tie)
            + F.lit(1)
        ).alias("r2"),
    )
    per_type = ranked.groupBy("event_type").agg(
        F.sum(F.col("r2").cast(d38)).alias("r2j"),
        F.count(F.lit(1)).alias("n_days"),
    )
    sq_all = ranked.agg(
        F.sum(F.col("r2").cast(d38) * F.col("r2")).alias("a4"),
    )
    k_n = per_type.agg(
        F.count(F.lit(1)).alias("k"),
        F.max("n_days").alias("n"),
    )
    # Σ_j (2R_j − n(k+1))² needs k and n, so join them back in
    base = per_type.crossJoin(F.broadcast(k_n.select("k", "n")))
    num4 = base.select(
        (
            (
                F.col("r2j")
                - F.col("n").cast(d38) * (F.col("k") + F.lit(1))
            )
            * (
                F.col("r2j")
                - F.col("n").cast(d38) * (F.col("k") + F.lit(1))
            )
        ).alias("sqterm"),
        "k",
        "n",
    ).groupBy("k", "n").agg(F.sum("sqterm").alias("num4"))
    den = num4.crossJoin(F.broadcast(sq_all)).select(
        "k",
        "n",
        "num4",
        (
            F.col("a4")
            - F.col("n").cast(d38)
            * F.col("k")
            * (F.col("k") + F.lit(1))
            * (F.col("k") + F.lit(1))
        ).alias("den4"),
    )
    chi2 = (
        (F.col("k").cast("double") - F.lit(1.0))
        * F.col("num4").cast("double")
        / F.col("den4").cast("double")
    )
    return den.select(
        F.col("n").cast("long").alias("n_days"),
        F.col("k").cast("long").alias("n_types"),
        F.when(F.col("den4") > 0, det_round(chi2, 6)).alias(
            "friedman_chi2"
        ),
    )


def orders_somers_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Somers' D of price band on order priority — the ASYMMETRIC
    ordinal association the credit-scoring world reads as the
    Gini/AUC analogue (D_Y|X = (C − D)/(C + D + T_Y)): unlike
    `orders_gk_gamma`, which drops ALL tied pairs and so overstates
    association on coarse scales, Somers' D keeps pairs tied on the
    DEPENDENT variable (price band) in the denominator — the right
    penalty when the response scale is coarse.

    Exactness: identical machinery to the gamma plan — the ≤45-cell
    (priority, band) contingency table, a broadcast self-join on a
    literal key, exact DECIMAL(38,0) pair products for C, D, and the
    band-tie count T_Y, one double division. A single-priority input
    still yields one row (C = D = T_Y = 0, D NULL)."""
    orders = load_table(spark, sf_dir, "orders")
    d38 = "decimal(38,0)"
    pr = F.substring(F.col("o_orderpriority"), 1, 1).cast("long")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    band = F.least(F.expr("_cents div 5000000"), F.lit(8)).cast("long")
    cells = (
        orders.select(pr.alias("pr"), cents.alias("_cents"))
        .select("pr", band.alias("band"))
        .groupBy("pr", "band")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("_k", F.lit(1))
        .localCheckpoint(eager=True)
    )
    a = cells.select(
        "_k",
        F.col("pr").alias("pr1"),
        F.col("band").alias("b1"),
        F.col("n").alias("n1"),
    )
    b = cells.select(
        "_k",
        F.col("pr").alias("pr2"),
        F.col("band").alias("b2"),
        F.col("n").alias("n2"),
    )
    pairs = a.join(F.broadcast(b), "_k").where(F.col("pr2") > F.col("pr1"))
    prod = F.col("n1").cast(d38) * F.col("n2")
    agg = pairs.agg(
        F.coalesce(
            F.sum(F.when(F.col("b2") > F.col("b1"), prod)),
            F.lit(0).cast(d38),
        ).alias("_c"),
        F.coalesce(
            F.sum(F.when(F.col("b2") < F.col("b1"), prod)),
            F.lit(0).cast(d38),
        ).alias("_d"),
        F.coalesce(
            F.sum(F.when(F.col("b2") == F.col("b1"), prod)),
            F.lit(0).cast(d38),
        ).alias("_ty"),
    )
    tot = cells.agg(F.sum(F.col("n").cast(d38)).alias("nn"))
    joined = agg.crossJoin(F.broadcast(tot))
    denom = F.col("_c") + F.col("_d") + F.col("_ty")
    return joined.select(
        F.col("nn").cast("long").alias("n_orders"),
        F.col("_c").cast("long").alias("concordant"),
        F.col("_d").cast("long").alias("discordant"),
        F.col("_ty").cast("long").alias("ties_band"),
        F.when(
            denom > 0,
            det_round(
                (F.col("_c") - F.col("_d")).cast("double")
                / denom.cast("double"),
                6,
            ),
        ).alias("somers_d"),
    )


def user_gap_weibull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weibull fit of user inter-event gaps by median-rank
    regression — the PARAMETRIC companion to `user_gap_survival`'s
    nonparametric Kaplan–Meier: shape k < 1 means bursty
    come-back-soon behavior (decreasing hazard), k ≈ 1 memoryless,
    k > 1 habituation (the longer away, the likelier to return) —
    one pair of numbers a retention model consumes directly where
    the KM curve is a whole table.

    Method: observed gaps in whole minutes (the `user_gap_survival`
    gap device, censored-open gaps EXCLUDED — median-rank regression
    is the standard uncensored-fit shortcut and is documented as
    such), Bernard's approximation F_i = (i − 0.3)/(n + 0.4) at each
    gap's midrank, then OLS of y = ln(−ln(1−F)) on x = ln(t):
    slope = shape, scale = exp(x̄ − ȳ/k̂)… i.e. intercept b = ȳ − k̂x̄
    and scale λ = exp(−b/k̂).

    Exactness: gaps and midranks are exact integers over the
    BOUNDED per-minute cell frame (doubled midrank = 2·cum_before +
    count + 1); per-cell x and y are floored ONCE onto the 1e-9
    grid, so every weighted OLS moment is an exact DECIMAL(38,0)
    sum; slope/intercept/scale are fixed-order double chains. The
    cumulative window runs on the tiny per-minute frame (the KM
    precedent), never the rows."""
    events = load_table(spark, sf_dir, "events")
    d38 = "decimal(38,0)"
    by_user = Window.partitionBy("user_id").orderBy("s", "event_id")
    ev = events.select(
        "user_id",
        F.col("ts").cast("long").alias("s"),
        "event_id",
    ).select("s", F.lead("s").over(by_user).alias("nxt"))
    cells = (
        ev.where(F.col("nxt").isNotNull())
        .select(F.expr("(nxt - s) div 60").alias("t"))
        .where(F.col("t") >= 1)
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_tot = Window.partitionBy()
    staged = cells.select(
        "t",
        "c",
        F.coalesce(F.sum("c").over(w_cum), F.lit(0)).alias("cumb"),
        F.sum("c").over(w_tot).alias("n"),
    )
    md2 = F.lit(2) * F.col("cumb") + F.col("c") + F.lit(1)
    fr = (md2.cast("double") / F.lit(2.0) - F.lit(0.3)) / (
        F.col("n").cast("double") + F.lit(0.4)
    )
    x = F.floor(
        F.log(F.col("t").cast("double")) * F.lit(1e9) + F.lit(0.5)
    ).cast("long")
    y = F.floor(
        F.log(-F.log(F.lit(1.0) - fr)) * F.lit(1e9) + F.lit(0.5)
    ).cast("long")
    pts = staged.select(
        "c", x.alias("x"), y.alias("y"), F.lit(1).alias("_k")
    )
    agg = pts.groupBy("_k").agg(
        F.sum("c").alias("w"),
        F.count(F.lit(1)).alias("cells"),
        F.sum(F.col("c").cast(d38) * F.col("x")).alias("sx"),
        F.sum(F.col("c").cast(d38) * F.col("y")).alias("sy"),
        F.sum(
            F.col("c").cast(d38) * F.col("x") * F.col("x")
        ).alias("sxx"),
        F.sum(
            F.col("c").cast(d38) * F.col("x") * F.col("y")
        ).alias("sxy"),
    )
    wd = F.col("w").cast(d38)
    num = (wd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (wd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    k_hat = num / den
    b_hat = (
        F.col("sy").cast("double") - k_hat * F.col("sx").cast("double")
    ) / (F.col("w").cast("double") * F.lit(1e9))
    scale = F.exp(-b_hat / k_hat)
    ok = (F.col("cells") > 1) & (den > 0)
    return agg.select(
        F.col("w").cast("long").alias("n_gaps"),
        F.when(ok, det_round(k_hat, 6)).alias("shape"),
        F.when(ok, det_round(scale, 6)).alias("scale_minutes"),
    )


def nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation trade balance over cross-nation purchases: for
    every nation, revenue flowing IN (its suppliers selling to
    foreign customers), revenue flowing OUT (its customers buying
    from foreign suppliers), and the net — the whole-matrix rollup
    of TPC-H Q7's two-nation volume_shipping: one report that says
    who the exporter and importer economies are.

    Exactness: the proven money device (Σ cast(extprice·(1−disc) as
    decimal(18,4)), scaled to exact BIGINT ten-thousandths before
    any reshaping); the two flows are symmetric aggregates of ONE
    (cust_nation, supp_nation) matrix, built with a single join
    chain and reshaped by two groupBys + one full outer join on the
    tiny nation list.

    Shape: lineitem⋈orders (orderkey) ⋈customer (custkey) with
    nation dims BROADCAST onto both sides; the cross-nation filter
    prunes the diagonal before aggregation; everything after the
    (25×25-bounded) matrix aggregate is constant-size."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    dp = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # supplier/customer are SF-scaled: their join strategy belongs
    # to AQE (repo convention — only the constant nation dim gets a
    # forced broadcast)
    flows = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("_ck"),
                    F.col("n_name").alias("cust_nation"),
                )
            ),
            F.col("c_nationkey") == F.col("_ck"),
        )
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("_sk"),
                    F.col("n_name").alias("supp_nation"),
                )
            ),
            F.col("s_nationkey") == F.col("_sk"),
        )
        .where(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation")
        .agg(F.sum(dp.cast("decimal(18,4)")).alias("_rev4"))
        .select(
            "cust_nation",
            "supp_nation",
            F.expr("cast(_rev4 * 10000 as decimal(38,0))").alias("r"),
        )
        .localCheckpoint(eager=True)
    )
    inflow = flows.groupBy(
        F.col("supp_nation").alias("nation")
    ).agg(F.sum("r").alias("rin"))
    outflow = flows.groupBy(
        F.col("cust_nation").alias("nation")
    ).agg(F.sum("r").alias("rout"))
    joined = inflow.join(outflow, "nation", "full_outer").select(
        "nation",
        F.coalesce(F.col("rin"), F.lit(0).cast("decimal(38,0)")).alias(
            "rin"
        ),
        F.coalesce(F.col("rout"), F.lit(0).cast("decimal(38,0)")).alias(
            "rout"
        ),
    )
    return joined.select(
        "nation",
        (F.col("rin").cast("double") / F.lit(1e4)).alias("export_revenue"),
        (F.col("rout").cast("double") / F.lit(1e4)).alias(
            "import_revenue"
        ),
        (
            (F.col("rin") - F.col("rout")).cast("double") / F.lit(1e4)
        ).alias("net_balance"),
    ).orderBy("nation")


def orders_fulfillment_gamma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gamma fit (method of moments) of order-to-ship fulfillment
    latency per order priority: latency = l_shipdate − o_orderdate
    in whole days (the `fulfillment_latency_monthly` convention),
    shape = mean²/var and scale = var/mean — the third member of the
    parametric-fit family (lognormal for lengths, Weibull for gaps,
    gamma for durations): an SLA model consumes (shape, scale)
    directly, and a priority class whose shape drifts toward 1
    (exponential) is losing predictability.

    Exactness: latencies are exact integer date differences;
    S = Σd and Q = Σd² are DECIMAL(38,0); the sample variance uses
    division-free centering (n·Q − S² stays integer) and the
    mean/shape/scale are fixed-order double chains, NULL-guarded
    for n < 2 or zero variance.

    Shape: one lineitem⋈orders equi-join (both SF-scaled — strategy
    belongs to AQE), then a |priorities|-row hash aggregate with
    map-side partials."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    d38 = "decimal(38,0)"
    days = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select("o_orderpriority", days.cast("long").alias("d"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("d").cast(d38)).alias("s"),
            F.sum(F.col("d").cast(d38) * F.col("d")).alias("q"),
        )
    )
    nd = F.col("n").cast("double")
    mean = F.col("s").cast("double") / nd
    var_num = F.col("n") * F.col("q") - F.col("s") * F.col("s")
    var = var_num.cast("double") / (nd * (nd - F.lit(1.0)))
    ok = (F.col("n") > 1) & (var_num > 0)
    return agg.select(
        "o_orderpriority",
        F.col("n").cast("long").alias("n_items"),
        det_round(mean, 6).alias("mean_days"),
        F.when(ok, det_round(mean * mean / var, 6)).alias("shape"),
        F.when(ok, det_round(var / mean, 6)).alias("scale_days"),
    ).orderBy("o_orderpriority")


def copurchase_degree_powerlaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-law fit of the co-purchase degree distribution:
    the Clauset–Shalizi–Newman continuous-MLE exponent
    α̂ = 1 + n / Σ ln(d/d_min) over the tail d ≥ d_min = 2 — the
    scale-free-ness check that tells you whether hub valves
    (`max_degree` in Adamic-Adar / neighbor-Jaccard) are load-
    bearing: a heavy tail (small α) means the wedge counts are
    hub-dominated and the valves bite.

    Exactness: per-DISTINCT-degree ln(d/2) is floored once onto the
    1e-9 grid and multiplied by the exact tail count (the bounded
    degree domain keeps this frame tiny); α is one fixed-order
    double chain. NULL when the tail has no degree > d_min (Σ = 0).

    Shape: one degree aggregate over the undirected edge list, one
    |distinct degrees|-row reduce."""
    from stream_processing_system_spark.operators.graph import (
        _undirect,
        cooccurrence_edges,
    )

    d38 = "decimal(38,0)"
    dmin = 2
    events = load_table(spark, sf_dir, "events")
    und = _undirect(cooccurrence_edges(events))
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    cells = (
        deg.where(F.col("deg") >= dmin)
        .groupBy("deg")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    lng = F.floor(
        F.log(F.col("deg").cast("double") / F.lit(float(dmin)))
        * F.lit(1e9)
        + F.lit(0.5)
    ).cast("long")
    agg = cells.select("c", lng.alias("l")).agg(
        F.sum("c").alias("n_tail"),
        F.sum(F.col("c").cast(d38) * F.col("l")).alias("sl"),
    )
    alpha = F.lit(1.0) + F.col("n_tail").cast("double") / (
        F.col("sl").cast("double") / F.lit(1e9)
    )
    return agg.select(
        F.coalesce(F.col("n_tail"), F.lit(0)).cast("long").alias(
            "n_tail"
        ),
        F.lit(dmin).cast("long").alias("d_min"),
        F.when(F.col("sl") > 0, det_round(alpha, 6)).alias("alpha"),
    )


def events_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test per event type between the first- and
    second-half value distributions: the 2×2-table member of the
    two-sample drift family — split every value at the POOLED
    median and ask whether the above-median share differs between
    halves. Far blunter than KS/CvM/AD (it reads ONE quantile), and
    exactly because of that it is the robust sanity check a drift
    monitor runs when the fancier statistics disagree: a level shift
    moves it, a pure tail/scale change does not (contrast
    `events_brown_forsythe`).

    Exactness: values sit on the cent grid (the shared
    `halfsplit_value_cells` frame); the pooled median is the LOWER
    median (first cell where 2·cum ≥ n — the weighted-median
    pick-first device, mirrored in the oracle); the 2×2 cells A/B
    (above, per half) and their complements are exact integers;
    χ² = N·(A·D − B·C)² / (na·nb·(A+B)·(C+D)) is exact
    DECIMAL(38,0) products until ONE double division. Types where
    any margin is zero (all mass on one side of the median) are
    excluded on both engines — χ² is undefined there.

    Shape: the KS plan's — one bounded cell aggregate, one
    cumulative window for the median pick, a broadcast-sized median
    join back onto the CELL frame (never the rows), one per-type
    reduce."""
    return mood_from_cells(halfsplit_value_cells(spark, sf_dir))


def mood_from_cells(cells: DataFrame) -> DataFrame:
    """Shared Mood's-median tail over an (event_type, v, ca, cb)
    exact-centi count frame — factored (the `cvm_from_cells` /
    `ks_from_cells` / `ad_from_cells` / `cliffs_from_cells`
    precedent) so the streaming twin reduces the same drained
    cell-monoid state."""
    d38 = "decimal(38,0)"
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("event_type")
    cum = cells.select(
        "event_type",
        "v",
        (
            F.sum(F.col("ca") + F.col("cb")).over(w_cum)
        ).alias("cum"),
        (
            F.sum(F.col("ca") + F.col("cb")).over(w_tot)
        ).alias("n"),
    )
    pick = Window.partitionBy("event_type").orderBy("v")
    medians = (
        cum.where(F.col("cum") * 2 >= F.col("n"))
        .withColumn("_rn", F.row_number().over(pick))
        .where(F.col("_rn") == 1)
        .select("event_type", F.col("v").alias("med"))
    )
    agg = (
        cells.join(F.broadcast(medians), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum("ca").alias("na"),
            F.sum("cb").alias("nb"),
            F.sum(
                F.when(F.col("v") > F.col("med"), F.col("ca")).otherwise(
                    F.lit(0)
                )
            ).alias("a"),
            F.sum(
                F.when(F.col("v") > F.col("med"), F.col("cb")).otherwise(
                    F.lit(0)
                )
            ).alias("b"),
            F.max("med").alias("med"),
        )
    )
    c_ = F.col("na") - F.col("a")
    d_ = F.col("nb") - F.col("b")
    diff = (
        F.col("a").cast(d38) * d_ - F.col("b").cast(d38) * c_
    )
    num = (F.col("na") + F.col("nb")).cast(d38) * diff * diff
    den = (
        F.col("na").cast(d38)
        * F.col("nb")
        * (F.col("a") + F.col("b"))
        * (c_ + d_)
    )
    return (
        agg.where(
            (F.col("na") > 0)
            & (F.col("nb") > 0)
            & (F.col("a") + F.col("b") > 0)
            & (c_ + d_ > 0)
        )
        .select(
            "event_type",
            F.col("na").cast("long").alias("n_first"),
            F.col("nb").cast("long").alias("n_second"),
            F.col("med").cast("long").alias("median_cents"),
            (F.col("a") + F.col("b")).cast("long").alias("n_above"),
            det_round(
                num.cast("double") / den.cast("double"), 6
            ).alias("mood_chi2"),
        )
        .orderBy("event_type")
    )


def events_page_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's L trend test per event type: does within-day activity
    RISE monotonically across the four dayparts (night → morning →
    afternoon → evening), judged day by day? The ordered-alternative
    companion to `events_friedman_type_ranks` (which detects ANY
    reordering) and the blocked counterpart of
    `events_daypart_jonckheere` (which pools all observations and
    ignores the day pairing): Page's L ranks the 4 daypart counts
    WITHIN each day and weights the rank sums by the hypothesized
    order, so a consistent small daily ramp registers even when
    between-day volume swamps the pooled test.

    Exactness: per-day ranks over the DENSE (day × 4 dayparts) grid
    (absent counts are explicit zeros) use the doubled-midrank
    device — 2·rank = 2·#smaller + #tied + 1, exact integers — so
    2L = Σ_j w_j·R2_j is an exact DECIMAL(38,0) integer and
    L = (2L)/2 is an exactly-representable double (x.0 or x.5).
    The z-score uses the classical no-tie null moments
    μ = n·k(k+1)²/4, σ² = n·(k³−k)²/(144(k−1)) — with midrank ties
    this is OUR pinned convention, mirrored textually in the oracle
    (sqrt is IEEE-correctly-rounded on both engines). Days from the
    engine-free calendar, dayparts from the epoch-micros device.

    Shape: one (type, day, daypart) count aggregate
    (calendar-bounded), the dense grid via distinct (type, day) ×
    4 literal dayparts, two rank windows per ≤4-row block, one
    per-type reduce — |types| output rows."""
    events = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull()
    )
    d38 = "decimal(38,0)"
    us = F.unix_micros(F.col("ts"))
    day = (us - (us % F.lit(86_400_000_000))) / F.lit(86_400_000_000)
    part = (
        (us % F.lit(86_400_000_000)) - (us % F.lit(21_600_000_000))
    ) / F.lit(21_600_000_000)
    counts = events.groupBy(
        "event_type",
        day.cast("long").alias("d"),
        part.cast("long").alias("g"),
    ).agg(F.count(F.lit(1)).alias("c"))
    blocks = counts.select("event_type", "d").distinct()
    parts = spark.range(4).select(F.col("id").alias("g"))
    grid = (
        blocks.crossJoin(F.broadcast(parts))
        .join(counts, ["event_type", "d", "g"], "left")
        .select(
            "event_type",
            "d",
            "g",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
        )
    )
    w_rank = Window.partitionBy("event_type", "d").orderBy("c")
    w_tie = Window.partitionBy("event_type", "d", "c")
    ranked = grid.select(
        "event_type",
        "d",
        "g",
        (
            F.lit(2) * (F.rank().over(w_rank) - F.lit(1))
            + F.count(F.lit(1)).over(w_tie)
            + F.lit(1)
        ).alias("r2"),
    )
    agg = ranked.groupBy("event_type").agg(
        (F.count(F.lit(1)) / F.lit(4)).cast("long").alias("n_days"),
        F.sum(
            (F.col("g") + F.lit(1)).cast(d38) * F.col("r2")
        ).alias("l2"),
    )
    nd = F.col("n_days").cast("double")
    page_l = F.col("l2").cast("double") / F.lit(2.0)
    # k = 4: μ = 25n, σ² = n·60²/(144·3) = 25n/3
    page_z = (page_l - F.lit(25.0) * nd) / F.sqrt(
        F.lit(25.0) * nd / F.lit(3.0)
    )
    return (
        agg.where(F.col("n_days") > 0)
        .select(
            "event_type",
            "n_days",
            page_l.alias("page_l"),
            det_round(page_z, 6).alias("page_z"),
        )
        .orderBy("event_type")
    )


def events_theil_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's uncertainty coefficient between event type and
    daypart: the ASYMMETRIC, information-theoretic association the
    χ²-family report cannot give — U(type|daypart) = I(type;
    daypart)/H(type) is the fraction of type-uncertainty removed by
    knowing the daypart, and U(daypart|type) the reverse. Cramér's V
    (`doc_lang_source_cramers_v`) answers "are they associated";
    Theil's U answers "which way does the information flow" — the
    pair a feature-selection pass actually ranks on.

    Exactness: the (type, daypart) contingency table is a BOUNDED
    exact-integer frame; every transcendental term is a per-cell
    fixed-order double chain c·(ln c + ln N − ln c_row − ln c_col)
    floored onto the 1e-9 grid BEFORE any cross-cell sum (the
    chi2-drift device — ln on integer counts is the proven parity
    class), so N·I and N·H(type) and N·H(daypart) are exact int64
    grid sums sharing the same 1/(1e9·N) factor — each U is a ratio
    of two grid integers, ONE double division; the mutual
    information in nats is one more. Per-term overflow guarded
    against the BIGINT range on both engines (the `ad_from_cells`
    device). Dayparts from the epoch-micros device.

    Shape: one (type, daypart) hash aggregate, broadcast margin
    joins on the bounded frame, one global reduce — a single output
    row."""
    events = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull()
    )
    d38 = "decimal(38,0)"
    us = F.unix_micros(F.col("ts"))
    part = (
        (us % F.lit(86_400_000_000)) - (us % F.lit(21_600_000_000))
    ) / F.lit(21_600_000_000)
    cells = events.groupBy(
        "event_type", part.cast("long").alias("g")
    ).agg(F.count(F.lit(1)).alias("c"))
    rows_m = cells.groupBy("event_type").agg(
        F.sum("c").alias("ct")
    )
    cols_m = cells.groupBy("g").agg(F.sum("c").alias("cg"))
    tot = cells.agg(F.sum("c").alias("n"))
    joined = (
        cells.join(F.broadcast(rows_m), "event_type")
        .join(F.broadcast(cols_m), "g")
        .crossJoin(F.broadcast(tot))
    )
    cd = F.col("c").cast("double")
    iterm = cd * (
        F.log(cd)
        + F.log(F.col("n").cast("double"))
        - F.log(F.col("ct").cast("double"))
        - F.log(F.col("cg").cast("double"))
    )
    i_scaled = iterm * F.lit(1e9)
    i_grid = F.floor(i_scaled + F.lit(0.5)).cast("long")
    mi_agg = joined.agg(
        F.max("n").alias("n"),
        F.sum(i_grid.cast(d38)).alias("si"),
        F.sum(
            F.when(
                F.abs(i_scaled) > F.lit(9.2e18), F.lit(1)
            ).otherwise(F.lit(0))
        ).alias("n_ovf"),
    )
    # N·H(row) and N·H(col) on the same grid: Σ m·(ln N − ln m)
    def _h(margin: DataFrame, col: str, n_rows: DataFrame):
        m = margin.crossJoin(F.broadcast(n_rows))
        md = F.col(col).cast("double")
        hterm = md * (F.log(F.col("n").cast("double")) - F.log(md))
        h_scaled = hterm * F.lit(1e9)
        return m.agg(
            F.sum(
                F.floor(h_scaled + F.lit(0.5)).cast("long").cast(d38)
            ).alias(f"sh_{col}"),
            F.sum(
                F.when(
                    F.abs(h_scaled) > F.lit(9.2e18), F.lit(1)
                ).otherwise(F.lit(0))
            ).alias(f"ovf_{col}"),
        )

    h_rows = _h(rows_m, "ct", tot)
    h_cols = _h(cols_m, "cg", tot)
    out = mi_agg.crossJoin(F.broadcast(h_rows)).crossJoin(
        F.broadcast(h_cols)
    )
    _raise = F.raise_error(
        F.lit(
            "events_theil_u: 1e-9-grid entropy term overflowed "
            "BIGINT (counts beyond the double-chain range); re-grid "
            "via a coarser quantum"
        )
    ).cast("double")
    ovf = (
        F.col("n_ovf") + F.col("ovf_ct") + F.col("ovf_cg") > 0
    )
    mi = F.when(ovf, _raise).otherwise(
        F.col("si").cast("double")
        / F.lit(1e9)
        / F.col("n").cast("double")
    )
    u_rows = F.when(
        F.col("sh_ct") > 0,
        F.col("si").cast("double") / F.col("sh_ct").cast("double"),
    )
    u_cols = F.when(
        F.col("sh_cg") > 0,
        F.col("si").cast("double") / F.col("sh_cg").cast("double"),
    )
    return out.select(
        F.col("n").cast("long").alias("n_events"),
        det_round(mi, 6).alias("mi_nats"),
        det_round(u_rows, 6).alias("u_type_given_daypart"),
        det_round(u_cols, 6).alias("u_daypart_given_type"),
    )


def events_ansari_bradley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ansari–Bradley two-sample SCALE test per event type between
    the first- and second-half value distributions — the rank-based
    member the drift family still lacked: Mann–Whitney/Mood read
    LOCATION, KS/CvM/AD read the whole shape, Cliff's δ reads the
    effect size, Brown–Forsythe reads scale but leans on means;
    Ansari–Bradley scores each pooled observation by its distance
    from the OUTSIDE in (score = min(rank, n+1−rank), small at the
    extremes, large in the middle), so a variance widening drags the
    first-half score sum down even when every location statistic is
    silent.

    Exactness: pooled midrank tie groups come from the shared
    `halfsplit_value_cells` frame — a tie group occupies positions
    [i, j] (exact cumulative integers), and Σ_{k=i..j} min(k, n+1−k)
    has a closed form of two arithmetic series split at
    m = (n+1) div 2, kept in exact LONG arithmetic (loud raise past
    n ≈ 3e9 per type, where the series products would cross BIGINT
    on both engines); the per-cell A-mass ca·S/t is ONE fixed-order
    double chain floored onto the 1e-6 grid before the cross-cell
    sum (the chi2-drift device — S/t is genuinely rational with
    denominator t, e.g. thirds, so the grid is the cross-engine
    device, a pinned convention like the Page ties). The z-score
    uses the classical no-tie null moments (n even: μ = na(n+2)/4,
    σ² = na·nb·(n+2)(n−2)/(48(n−1)); n odd: μ = na(n+1)²/(4n),
    σ² = na·nb·(n+1)(3+n²)/(48n²)) — with midrank ties this is OUR
    pinned convention, mirrored textually.

    Shape: the KS plan's — one bounded cell aggregate, cumulative
    windows over the cent domain, one per-type reduce."""
    cells = halfsplit_value_cells(spark, sf_dir)
    d38 = "decimal(38,0)"
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("event_type")
    t = F.col("ca") + F.col("cb")
    cum = cells.select(
        "event_type",
        "ca",
        "cb",
        t.alias("t"),
        F.sum(t).over(w_cum).alias("j"),
        F.sum("ca").over(w_tot).alias("na"),
        F.sum("cb").over(w_tot).alias("nb"),
    ).select(
        "event_type",
        "ca",
        "cb",
        "t",
        "j",
        (F.col("j") - F.col("t") + F.lit(1)).alias("i"),
        "na",
        "nb",
        (F.col("na") + F.col("nb")).alias("n"),
    )
    _ab_raise = F.raise_error(
        F.lit(
            "events_ansari_bradley: pooled n beyond the exact LONG "
            "series range (~3e9 per type); re-derive the series in "
            "DECIMAL"
        )
    ).cast("long")
    n_ok = F.when(F.col("n") > F.lit(3_000_000_000), _ab_raise).otherwise(
        F.col("n")
    )
    # all series arithmetic stays in LONGs: shiftright-by-1 halves
    # the (always even) products exactly — `/` on longs is DOUBLE
    # division in Spark and would silently lose exactness past 2^53
    m = F.shiftright(n_ok + F.lit(1), 1)
    lo_hi = F.least(F.col("j"), m)
    hi_lo = F.greatest(F.col("i"), m + F.lit(1))
    sum_low = F.when(
        lo_hi >= F.col("i"),
        F.shiftright(
            (F.col("i") + lo_hi) * (lo_hi - F.col("i") + F.lit(1)), 1
        ),
    ).otherwise(F.lit(0))
    sum_high = F.when(
        F.col("j") >= hi_lo,
        F.shiftright(
            (
                (F.col("n") + F.lit(1) - hi_lo)
                + (F.col("n") + F.lit(1) - F.col("j"))
            )
            * (F.col("j") - hi_lo + F.lit(1)),
            1,
        ),
    ).otherwise(F.lit(0))
    s = sum_low + sum_high
    term = (
        F.col("ca").cast("double")
        * s.cast("double")
        / F.col("t").cast("double")
    )
    scaled = term * F.lit(1e6)
    grid = F.floor(scaled + F.lit(0.5)).cast("long")
    agg = cum.groupBy("event_type").agg(
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
        F.max("n").alias("n"),
        F.sum(grid.cast(d38)).alias("sab"),
        F.sum(
            F.when(scaled > F.lit(9.2e18), F.lit(1)).otherwise(F.lit(0))
        ).alias("n_ovf"),
    )
    _g_raise = F.raise_error(
        F.lit(
            "events_ansari_bradley: 1e-6-grid cell term overflowed "
            "BIGINT; re-grid via a coarser quantum"
        )
    ).cast("double")
    ab = F.when(F.col("n_ovf") > 0, _g_raise).otherwise(
        F.col("sab").cast("double") / F.lit(1e6)
    )
    nad = F.col("na").cast("double")
    nbd = F.col("nb").cast("double")
    nd = F.col("n").cast("double")
    mu = F.when(
        F.col("n") % 2 == 0, nad * (nd + F.lit(2.0)) / F.lit(4.0)
    ).otherwise(
        nad * (nd + F.lit(1.0)) * (nd + F.lit(1.0)) / (F.lit(4.0) * nd)
    )
    var = F.when(
        F.col("n") % 2 == 0,
        nad
        * nbd
        * (nd + F.lit(2.0))
        * (nd - F.lit(2.0))
        / (F.lit(48.0) * (nd - F.lit(1.0))),
    ).otherwise(
        nad
        * nbd
        * (nd + F.lit(1.0))
        * (F.lit(3.0) + nd * nd)
        / (F.lit(48.0) * nd * nd)
    )
    return (
        agg.where((F.col("na") > 0) & (F.col("nb") > 0) & (F.col("n") > 2))
        .select(
            "event_type",
            F.col("na").cast("long").alias("n_first"),
            F.col("nb").cast("long").alias("n_second"),
            det_round(ab, 6).alias("ab_stat"),
            det_round((ab - mu) / F.sqrt(var), 6).alias("ab_z"),
        )
        .orderBy("event_type")
    )
