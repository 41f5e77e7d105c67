"""pHash DCT signature pins: DC coefficient closed form on a
constructed payload; identical payloads hash identically."""

from __future__ import annotations

import os


def test_phash_dc_and_duplicates(spark, tmp_path):
    from stream_processing_system_spark.plans.pipeline import media_phash_dct

    docs = [
        (1, "aaaa", "en", "s", 4),
        (2, "aaaa", "en", "s", 4),
        (3, "totally different words here", "en", "s", 28),
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    rows = media_phash_dct(spark, sf).collect()
    got = {r["media_id"]: r for r in rows}
    # 'aaaa': chars land in cells 0,16,32,48 (value 97 each);
    # DC = sum(pix) * K[0][x]*K[0][y] = 388 * 1e6 * 1e6
    assert got[1]["dc"] == 388 * 10**12
    assert (got[1]["phash"], got[1]["dom_u"], got[1]["dom_v"]) == (
        got[2]["phash"], got[2]["dom_u"], got[2]["dom_v"],
    )
    assert 0 <= got[3]["phash"] < (1 << 15)
