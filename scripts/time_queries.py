"""Ad-hoc cold/warm timer for specific registry queries.

Usage: python scripts/time_queries.py q1 q2 ... [--sf DIR] [--runs N]
Prints per-query run times (first = cold) as JSON.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cube_builder_spark.queries import all_queries
from cube_builder_spark.session import get_spark


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = 2
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
    spark = get_spark("timer")
    queries = all_queries()
    # same warmup as bench.py: JVM + parquet footers + UDF workers
    queries["r4_count_by_status"](spark, sf_dir).collect()

    def _identity(it):
        yield from it
    spark.range(256).repartition(32).mapInPandas(_identity, "id long").count()

    out = {}
    for name in args:
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            n = queries[name](spark, sf_dir).collect()
            ts.append(round(time.perf_counter() - t0, 3))
        out[name] = {"runs": ts, "rows": len(n)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
