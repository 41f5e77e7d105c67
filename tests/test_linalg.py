"""Power-iteration PCA: recovers a planted dominant direction and is
unit-norm on the grid."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from stream_processing_system_spark.operators.linalg import pca_top_component


def test_recovers_planted_direction(spark):
    rng = np.random.default_rng(7)
    dim = 16
    direction = rng.normal(size=dim)
    direction /= np.linalg.norm(direction)
    # variance 25 along `direction`, variance 0.01 isotropic noise
    t = rng.normal(scale=5.0, size=400)
    pts = np.outer(t, direction) + rng.normal(scale=0.1, size=(400, dim))
    pdf = pd.DataFrame(
        {"vec_id": range(400), "embedding": [row.tolist() for row in pts]}
    )
    df = spark.createDataFrame(pdf)
    out = pca_top_component(df, dim=dim, iters=8)
    v = np.array([r["loading"] for r in out.orderBy("d").collect()])
    assert abs(np.linalg.norm(v) - 1.0) < 1e-3
    cos = abs(float(np.dot(v, direction)))
    assert cos > 0.99, cos


def test_pca_is_run_to_run_deterministic(spark):
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(200, 8))
    pdf = pd.DataFrame(
        {"vec_id": range(200), "embedding": [row.tolist() for row in pts]}
    )
    df = spark.createDataFrame(pdf)
    a = [r["loading"] for r in pca_top_component(df, dim=8, iters=6).orderBy("d").collect()]
    b = [
        r["loading"]
        for r in pca_top_component(
            df.repartition(7), dim=8, iters=6
        ).orderBy("d").collect()
    ]
    assert a == b  # bit-identical across partitionings


def test_two_components_orthogonal_and_ranked(spark):
    """With two planted orthogonal directions of variance 25 and 9,
    pca_components(n=2) recovers both in order, near-orthogonal."""
    from stream_processing_system_spark.operators.linalg import pca_components

    rng = np.random.default_rng(5)
    dim = 12
    d1 = rng.normal(size=dim); d1 /= np.linalg.norm(d1)
    d2 = rng.normal(size=dim); d2 -= d2.dot(d1) * d1; d2 /= np.linalg.norm(d2)
    t1 = rng.normal(scale=5.0, size=500)
    t2 = rng.normal(scale=3.0, size=500)
    pts = np.outer(t1, d1) + np.outer(t2, d2) + rng.normal(scale=0.05, size=(500, dim))
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(500), "embedding": [r.tolist() for r in pts]})
    )
    out = pca_components(df, dim=dim, n_components=2, iters=10)
    vs = {}
    for r in out.collect():
        vs.setdefault(r["component"], [0.0] * dim)[r["d"]] = r["loading"]
    v1, v2 = np.array(vs[1]), np.array(vs[2])
    assert abs(abs(float(v1.dot(d1))) - 1.0) < 0.02
    assert abs(abs(float(v2.dot(d2))) - 1.0) < 0.02
    assert abs(float(v1.dot(v2))) < 0.05  # near-orthogonal
