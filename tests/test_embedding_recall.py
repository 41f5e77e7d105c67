"""Matryoshka / binary-quantization recall harness pins: the 64-dim
truncation must recall its own ranking perfectly; all recalls live in
[0, 1] with exact hit counts."""

from __future__ import annotations

import math
import os


def _sf(tmp_path, spark):
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    rows = []
    for vid in range(30):
        vec = [
            math.sin(0.7 * vid + 0.31 * d) + 0.2 * math.cos(1.3 * d)
            for d in range(64)
        ]
        rows.append((vid, [float(x) for x in vec], vid % 10))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label long"
    ).write.mode("overwrite").parquet(os.path.join(sf, "embeddings.parquet"))
    return sf


def test_matryoshka_full_dim_perfect(spark, tmp_path):
    from stream_processing_system_spark.plans.pipeline import (
        embedding_matryoshka_recall,
    )

    rows = embedding_matryoshka_recall(spark, _sf(tmp_path, spark)).collect()
    got = {r["trunc_dim"]: r for r in rows}
    assert set(got) == {8, 16, 32, 64}
    assert got[64]["hits"] == 100 and got[64]["mean_recall_at10"] == 1.0
    for d in (8, 16, 32):
        assert 0 <= got[d]["hits"] <= 100


def test_bq_recall_bounds(spark, tmp_path):
    from stream_processing_system_spark.plans.pipeline import embedding_bq_recall

    rows = embedding_bq_recall(spark, _sf(tmp_path, spark)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert 0 <= r["hits"] <= 100
    assert abs(r["recall_at10"] - r["hits"] / 100.0) < 1e-9


def test_kcenter_picks_farthest_and_radius_shrinks(spark, tmp_path):
    """On 3 well-separated clusters (plus seed), the first picks jump
    between clusters and d2_at_selection is non-increasing."""
    import os as _os
    from stream_processing_system_spark.plans.pipeline import (
        embedding_kcenter_coreset,
    )

    sf = str(tmp_path / "sfk")
    _os.makedirs(sf, exist_ok=True)
    rows = []
    centers = {0: 0.0, 1: 10.0, 2: -10.0}
    vid = 0
    for c, base in centers.items():
        for j in range(12):
            vec = [float(base + 0.01 * j)] * 64
            rows.append((vid, vec, c))
            vid += 1
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label long"
    ).write.mode("overwrite").parquet(_os.path.join(sf, "embeddings.parquet"))
    out = embedding_kcenter_coreset(spark, sf).collect()
    assert [r["sel_rank"] for r in out] == list(range(1, 9))
    assert out[0]["vec_id"] == 0 and out[0]["d2_at_selection"] == 0
    # pick 2 and 3 come from the two far clusters (vec_id 12-23 at
    # +10, 24-35 at -10), one each
    first_two = {out[1]["vec_id"] // 12, out[2]["vec_id"] // 12}
    assert first_two == {1, 2}
    d2s = [r["d2_at_selection"] for r in out[1:]]
    assert d2s == sorted(d2s, reverse=True)
