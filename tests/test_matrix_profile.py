"""Matrix profile semantics: a planted repeated 7-day motif must be
each occurrence's exact nearest neighbor at distance 0."""

from __future__ import annotations

import datetime
import os


def test_planted_motif_found(spark, tmp_path):
    from stream_processing_system_spark.plans.analytics import events_matrix_profile

    motif = [10, 50, 20, 60, 30, 70, 40]
    vals = list(motif)
    vals += [110, 135, 160, 185, 210, 235, 260]  # ramp, weeks apart
    vals += list(motif)  # second occurrence at widx 14
    vals += [300, 280, 330, 310, 360, 340, 390, 370, 420]
    events = [
        (i, datetime.datetime(2024, 1, 1 + i, 12, 0), 1, "x", float(v), "{}")
        for i, v in enumerate(vals)
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        events,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))

    rows = events_matrix_profile(spark, sf).collect()
    prof = {r["widx"]: r for r in rows}
    # 30 days, w=7 -> windows 0..23
    assert set(prof) == set(range(24))
    assert prof[0]["nn_widx"] == 14 and prof[0]["nn_dist_micro2"] == 0
    assert prof[14]["nn_widx"] == 0 and prof[14]["nn_dist_micro2"] == 0
    # every other window is strictly worse than the motif pair
    assert all(
        r["nn_dist_micro2"] > 0 for w, r in prof.items() if w not in (0, 14)
    )
