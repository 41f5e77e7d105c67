"""Capture `.explain("formatted")` for the named queries into
plans/$SPARK_GRAFT_PLANS_DIR (default r10)/<query>_<tag>.txt — the
before/after plan evidence the optimization rounds commit (the judge
checks plan claims against these files). Streaming twins execute at
build time and have no single batch plan; they are skipped with a
marker file.

Run: python tools/capture_plans.py <tag> <query> [<query> ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as contract
from stream_processing_system_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_DIR", "r10"),
)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(app_name="capture-plans", cpus=os.cpu_count() or 4)
    spark.sparkContext.setLogLevel("ERROR")
    qs = contract.queries()
    for name in names:
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        try:
            df = qs[name](spark, SF)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # streaming twins execute at build time
            plan = f"(no static batch plan: {type(e).__name__}: {e})\n"
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
