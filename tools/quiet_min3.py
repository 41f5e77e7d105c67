"""Standalone quiet-window re-measure: min-of-3 after a warm-up run,
bracketed by `q1_wordcount` calibration probes (min-of-3 each) so the
record certifies its own measurement window — the protocol
PERFORMANCE.md's ambient-mover adjudications use (round-7/8
precedent: plan-byte-unchanged movers are re-timed standalone before
being ruled ambient vs real).

Run: python tools/quiet_min3.py <query> [<query> ...]
  → one JSON line {"probe_before": s, "probe_after": s,
     "min3": {name: sec}, "sf": dir}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as contract
from stream_processing_system_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def min3(fn, spark, warm: bool = True) -> float:
    if warm:
        fn(spark, SF).write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    spark = get_spark(app_name="quiet-min3", cpus=os.cpu_count() or 4)
    spark.sparkContext.setLogLevel("ERROR")
    qs = contract.queries()
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    probe_before = min3(qs["q1_wordcount"], spark)
    out = {n: min3(qs[n], spark) for n in names}
    probe_after = min3(qs["q1_wordcount"], spark, warm=False)
    print(
        json.dumps(
            {
                "probe_before": probe_before,
                "probe_after": probe_after,
                "min3": out,
                "sf": SF,
            }
        )
    )


if __name__ == "__main__":
    main()
