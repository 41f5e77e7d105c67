"""Kneser-Ney bigram smoothing: hand-computed probabilities on a
4-bigram corpus (continuation counts, discount, interpolation)."""

from __future__ import annotations

import os


def test_kn_hand_computed(spark, tmp_path):
    from stream_processing_system_spark.plans.pipeline import doc_kneser_ney_bigrams

    docs = [
        (1, "a b", "en", "s", 3),
        (2, "c b", "en", "s", 3),
        (3, "a d", "en", "s", 3),
        (4, "a b", "en", "s", 3),
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))

    rows = doc_kneser_ney_bigrams(spark, sf).collect()
    got = {(r["w1"], r["w2"]): (r["c12"], r["pkn"]) for r in rows}
    # big: (a,b)x2 (c,b)x1 (a,d)x1; B=3; c(a.)=3 nfw(a)=2; c(c.)=1
    # nfw(c)=1; nbw(b)=2 nbw(d)=1
    # pkn(a,b) = 1.25/3 + .75*(2/3)*(2/3) = 0.75
    # pkn(c,b) = 0.25/1 + .75*(1/1)*(2/3) = 0.75
    # pkn(a,d) = 0.25/3 + .75*(2/3)*(1/3) = 0.25
    assert got[("a", "b")][0] == 2
    assert abs(got[("a", "b")][1] - 0.75) <= 2e-6
    assert abs(got[("c", "b")][1] - 0.75) <= 2e-6
    assert abs(got[("a", "d")][1] - 0.25) <= 2e-6
    # KN property: despite equal raw counts, (c,b) and (a,d) differ
    # because "b" continues after 2 distinct contexts and "d" after 1
    assert got[("c", "b")][1] > got[("a", "d")][1]
