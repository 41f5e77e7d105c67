"""Similarity-search tests: brute-force cosine against numpy, ANN
variants (LSH / IVF) recall against brute force on real testdata."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from stream_processing_system_spark.operators import similarity
from stream_processing_system_spark.sources.tables import load_table


def _vectors_df(spark):
    rng = np.random.RandomState(7)
    vecs = rng.standard_normal((50, 8)).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(50)]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]), vecs


def test_cosine_topk_matches_numpy(spark):
    df, vecs = _vectors_df(spark)
    q = df.where(F.col("vec_id") == 0).select("embedding")
    got = [(r["vec_id"], r["sim"]) for r in similarity.cosine_topk(df, q, k=5).collect()]

    v0 = vecs[0].astype("float64")
    sims = vecs.astype("float64") @ v0 / (
        np.linalg.norm(vecs.astype("float64"), axis=1) * np.linalg.norm(v0)
    )
    order = sorted(range(50), key=lambda i: (-round(sims[i], 6), i))[:5]
    want = [(i, round(sims[i], 6)) for i in order]
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert abs(g[1] - w[1]) < 1e-6


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    embs = load_table(spark, sf_dir, "embeddings")
    q = embs.where(F.col("vec_id") == 0).select("embedding")
    brute = {r["vec_id"] for r in similarity.cosine_topk(embs, q, k=10).collect()}
    ann = {r["vec_id"] for r in similarity.ivf_topk(embs, q, k=10).collect()}
    assert 0 in ann
    assert len(brute & ann) >= 5, f"ivf recall too low: {brute & ann}"


def test_lsh_topk_recalls_planted_neighbors(spark, sf_dir):
    """LSH's contract is recall of genuinely similar vectors (high
    cosine ⇒ sign-signatures agree w.h.p.), NOT of the 'top-10' of
    uniform random noise (cosine ~0.4, signatures uncorrelated). So:
    plant 5 near-copies of the query and require they are found."""
    import numpy as np

    embs = load_table(spark, sf_dir, "embeddings")
    base = np.array(
        embs.where(F.col("vec_id") == 0).collect()[0]["embedding"], dtype="float64"
    )
    rng = np.random.RandomState(1)
    planted = [
        (10_000 + i, [float(x) for x in (base + 0.02 * rng.standard_normal(64))])
        for i in range(5)
    ]
    full = embs.select("vec_id", "embedding").union(
        spark.createDataFrame(planted, ["vec_id", "embedding"])
    )
    q = embs.where(F.col("vec_id") == 0).select("embedding")
    ann = {r["vec_id"] for r in similarity.lsh_topk(full, q, k=10).collect()}
    assert 0 in ann
    found = {i for i in ann if i >= 10_000}
    assert len(found) >= 4, f"planted neighbors missed: {found}"


def test_knn_join_exact_matches_numpy(spark):
    df, vecs = _vectors_df(spark)
    got = similarity.knn_join(df, df, k=2, exact=True).collect()
    v = vecs.astype("float64")
    sims = v @ v.T / (
        np.linalg.norm(v, axis=1)[:, None] * np.linalg.norm(v, axis=1)[None, :]
    )
    for r in got:
        order = sorted(range(50), key=lambda j: (-round(sims[r["query_id"], j], 6), j))
        assert r["neighbor_id"] == order[r["rnk"] - 1]
    assert len(got) == 50 * 2


def test_knn_join_lsh_is_bucket_consistent(spark):
    df, _ = _vectors_df(spark)
    got = similarity.knn_join(df, df, k=3, exact=False, dim=8).collect()
    # every query finds at least itself (same bucket, sim 1.0, rank 1)
    self_hits = {r["query_id"] for r in got if r["neighbor_id"] == r["query_id"]}
    assert self_hits == set(range(50))
    assert all(1 <= r["rnk"] <= 3 for r in got)


def test_embedding_neardup_finds_planted_duplicate(spark):
    df, vecs = _vectors_df(spark)
    # plant a near-duplicate of vector 3 (tiny perturbation)
    near = [float(x) for x in (vecs[3] + 1e-4).tolist()]
    planted = spark.createDataFrame([(999, near)], ["vec_id", "embedding"])
    full = df.union(planted)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_neardup_pairs(
            full, threshold=0.999, dim=8
        ).collect()
    }
    assert (3, 999) in pairs


def test_ivf_persisted_index_matches_inline_and_prunes(spark, sf_dir, tmp_path):
    embs = load_table(spark, sf_dir, "embeddings")
    q = embs.where(F.col("vec_id") == 0).select("embedding")
    path = str(tmp_path / "ivf")
    similarity.build_ivf_index(embs, path)
    got = similarity.ivf_index_topk(spark, path, q, k=10)
    want = similarity.ivf_topk(embs, q, k=10).collect()
    assert [(r["vec_id"], r["sim"]) for r in got.collect()] == [
        (r["vec_id"], r["sim"]) for r in want
    ]
    # probed centroids must reach the scan as PartitionFilters
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_centroid" in plan


def test_lsh_signature_udf_matches_expression(spark, sf_dir):
    from stream_processing_system_spark.operators.similarity import (
        _hyperplanes,
        lsh_signature,
        lsh_signature_udf,
    )

    embs = load_table(spark, sf_dir, "embeddings")
    planes = _hyperplanes(64, 8, 42)
    expr_sig = embs.select("vec_id", lsh_signature(F.col("embedding"), planes).alias("s"))
    udf_sig = embs.select(
        "vec_id", lsh_signature_udf(planes)(F.col("embedding")).alias("s")
    )
    diff = (
        expr_sig.alias("a")
        .join(udf_sig.alias("b"), "vec_id")
        .where(F.col("a.s") != F.col("b.s"))
    )
    assert diff.count() == 0
