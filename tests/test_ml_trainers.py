"""Independent-reference checks for the relational ML trainers: the
DuckDB differential oracle proves cross-engine determinism, these
prove the MATH — each trainer is re-derived with numpy/pure python
on the same small inputs."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from stream_processing_system_spark.plans import analytics
from stream_processing_system_spark.sources.tables import load_table


def test_gbm_first_split_is_sse_optimal(spark, sf_dir):
    """The round-1 stump must be the global SSE-minimizing
    (feature, threshold) pair — recomputed by brute force in numpy
    over every candidate split of both features."""
    li = load_table(spark, sf_dir, "lineitem")
    rows = li.select(
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("y"),
        F.col("l_quantity").cast("long").alias("x1"),
        F.floor(F.col("l_discount") * 100 + F.lit(0.5))
        .cast("long")
        .alias("x2"),
    ).collect()
    y = np.array([r["y"] for r in rows], dtype=np.float64)
    feats = {
        1: np.array([r["x1"] for r in rows], dtype=np.int64),
        2: np.array([r["x2"] for r in rows], dtype=np.int64),
    }
    r = y - y.mean()
    best = None
    for f, x in feats.items():
        for t in np.unique(x)[:-1]:
            m = x <= t
            sl, nl = r[m].sum(), int(m.sum())
            sr, nr = r[~m].sum(), int((~m).sum())
            gain = sl * sl / nl + sr * sr / nr
            if best is None or gain > best[0] + 1e-6:
                best = (gain, f, int(t))
    got = analytics.lineitem_gbm_stumps(spark, sf_dir).collect()[0]
    want_feat = "quantity" if best[1] == 1 else "discount_centi"
    assert (got["feature"], got["threshold"]) == (want_feat, best[2])
    # and boosting must not increase train RMSE
    out = analytics.lineitem_gbm_stumps(spark, sf_dir).collect()
    assert out[1]["train_rmse"] <= out[0]["train_rmse"] + 1e-9


def test_poisson_glm_matches_numpy_irls(spark, sf_dir):
    """3 IRLS rounds recomputed in numpy from the same hourly design
    (same init, full float precision — the engine's grid quantization
    should keep it within ~1e-3 of the unquantized fit)."""
    events = load_table(spark, sf_dir, "events")
    rows = events.groupBy(
        F.col("ts").cast("date").alias("day"), F.hour("ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("y")).collect()
    days = sorted({r["day"] for r in rows})
    got_counts = {(r["day"], r["h"]): r["y"] for r in rows}
    ys, hs = [], []
    for d in days:
        for h in range(24):
            ys.append(got_counts.get((d, h), 0))
            hs.append(h)
    yv = np.array(ys, dtype=np.float64)
    hv = np.array(hs, dtype=np.float64)
    X = np.column_stack(
        [
            np.ones_like(hv),
            np.sin(2 * np.pi * hv / 24),
            np.cos(2 * np.pi * hv / 24),
        ]
    )
    beta = np.array([math.log(yv.mean()), 0.0, 0.0])
    for _ in range(3):
        eta = X @ beta
        mu = np.exp(eta)
        w = mu
        z = eta + (yv - mu) / mu
        A = X.T @ (X * w[:, None])
        b = X.T @ (w * z)
        beta = np.linalg.solve(A, b)
    got = analytics.events_poisson_glm(spark, sf_dir).collect()[0]
    assert abs(got["intercept"] - beta[0]) < 1e-3
    assert abs(got["beta_sin"] - beta[1]) < 1e-3
    assert abs(got["beta_cos"] - beta[2]) < 1e-3


def test_als_beats_constant_baseline(spark, sf_dir):
    """The rank-2 ALS train RMSE must beat the best CONSTANT
    predictor (the ratings' own std) — the minimum bar for a
    factorization to have learned anything."""
    got = analytics.customer_part_als(spark, sf_dir).collect()[0]
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    ratings = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("r"))
    )
    s = ratings.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("r").alias("sr"),
        F.sum(F.col("r") * F.col("r")).alias("srr"),
    ).collect()[0]
    n, sr, srr = float(s["n"]), float(s["sr"]), float(s["srr"])
    std = math.sqrt(srr / n - (sr / n) ** 2)
    assert got["train_rmse"] < std


def test_als_rejects_zero_rounds(spark):
    """ADVICE r3: rounds=0 used to crash with AttributeError (u is
    None until the first alternation) — must be a clear ValueError."""
    import pytest

    from stream_processing_system_spark.operators.linalg import als_factorize

    df = spark.createDataFrame([(1, 1, 5.0)], "user long, item long, r double")
    with pytest.raises(ValueError, match="rounds"):
        als_factorize(df, rounds=0)


def test_lasso_matches_pure_python_replay(spark, sf_dir):
    """The unrolled coordinate descent must equal a pure-Python
    replay of the same standardized soft-threshold recursion (same
    grids) from the raw rows, and shrink at least one coefficient
    relative to OLS."""
    from stream_processing_system_spark.plans.analytics import (
        LASSO_ROUNDS,
        lasso_coordinate_descent,
    )

    li = load_table(spark, sf_dir, "lineitem")
    rows = li.select(
        F.col("l_quantity").cast("long").alias("x1"),
        F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long").alias("x2"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("y"),
    ).collect()
    x1 = np.array([r["x1"] for r in rows], dtype=np.int64)
    x2 = np.array([r["x2"] for r in rows], dtype=np.int64)
    y = np.array([r["y"] for r in rows], dtype=np.int64)
    n = len(rows)
    nd = float(n)
    mu1, mu2, muy = (
        float(int(x1.sum())) / nd,
        float(int(x2.sum())) / nd,
        float(int(y.sum())) / nd,
    )
    sd1 = math.sqrt(float(int((x1 * x1).sum())) / nd - mu1 * mu1)
    sd2 = math.sqrt(float(int((x2 * x2).sum())) / nd - mu2 * mu2)
    c1 = (float(int((x1 * y).sum())) - nd * mu1 * muy) / sd1
    c2 = (float(int((x2 * y).sum())) - nd * mu2 * muy) / sd2
    d12 = (float(int((x1 * x2).sum())) - nd * mu1 * mu2) / (sd1 * sd2)
    lam = 0.25 * max(abs(c1), abs(c2))

    def soft(rho):
        if rho > lam:
            return rho - lam
        if rho < -lam:
            return rho + lam
        return 0.0

    def q(x):
        return math.floor(x * 1e9 + 0.5) / 1e9

    b1 = b2 = 0.0
    for _ in range(LASSO_ROUNDS):
        b1 = q(soft(c1 - b2 * d12) / nd)
        b2 = q(soft(c2 - b1 * d12) / nd)

    got = lasso_coordinate_descent(spark, sf_dir).collect()[0]
    assert got["beta_qty_std"] == b1
    assert got["beta_disc_std"] == b2
    assert got["n_nonzero"] <= 2
    # OLS-side sanity: the L1 penalty shrinks |beta| vs the
    # unpenalized solution of the same standardized system
    det = nd * nd - d12 * d12
    ols1 = (c1 * nd - d12 * c2) / det
    ols2 = (c2 * nd - d12 * c1) / det
    assert abs(b1) <= abs(ols1) + 1e-12
    assert abs(b2) <= abs(ols2) + 1e-12
