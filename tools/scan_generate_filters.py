"""Scan every registered query's optimized physical plan for the
InferFiltersFromGenerate pathology: a Filter whose predicate inlines
a higher-order-function chain (lambdafunction inside a size(...)>0
guard), re-evaluating the generator's array expression per element at
the scan. Writes one JSON line per affected query to stdout.

Run: python tools/scan_generate_filters.py [out.json]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as contract
from stream_processing_system_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(app_name="scan-gen-filters", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = contract.queries()
    out = {}
    for name, fn in qs.items():
        if name.startswith("stream_"):
            continue
        try:
            df = fn(spark, SF)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:
            out[name] = {"error": str(e)[:120]}
            continue
        # Filter lines whose condition contains a lambdafunction —
        # the inlined-HOF signature (cheap size(split(..)) guards
        # don't carry lambdas; transform/filter/aggregate chains do).
        hits = []
        for line in plan.splitlines():
            s = line.strip()
            if ("Filter" in s or "DataFilters" in s) and "lambdafunction" in s:
                n_lam = s.count("lambdafunction")
                if n_lam >= 2:
                    hits.append(n_lam)
        if hits:
            out[name] = {"filters": len(hits), "max_lambdas": max(hits)}
        print(name, out.get(name, "ok"), flush=True)
    with open(sys.argv[1] if len(sys.argv) > 1 else "/tmp/gen_filters.json", "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
