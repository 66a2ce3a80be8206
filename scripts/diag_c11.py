"""Bisect the c11_scene_efficacy warm-time regression (VERDICT r3 #2).

Runs c11 twice in three session states at sf0.1:
  A. fresh session, c11 only;
  B. after d_minhash_lsh_pairs (the round-3 suspect ordering);
  C. after the full bench warmup (mapInPandas worker spawn) + d_minhash.

Prints one JSON line with the timings so the cause can be pinned:
if B/C warm ~= A warm, the regression was session noise / ordering in
the BENCH harness, not a plan interaction.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cube_builder_spark.queries import all_queries

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(q, spark, n=2):
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        q(spark, SF_DIR).collect()
        runs.append(round(time.perf_counter() - t0, 4))
    return runs


def main():
    mode = sys.argv[1]
    from cube_builder_spark.session import get_spark
    spark = get_spark(f"diag-c11-{mode}")
    qs = all_queries()
    out = {"mode": mode}
    if mode in ("after_minhash", "after_warm_minhash"):
        if mode == "after_warm_minhash":
            def _identity(it):
                yield from it
            spark.range(256).repartition(32).mapInPandas(
                _identity, "id long").count()
        out["minhash"] = timed(qs["d_minhash_lsh_pairs"], spark)
    out["c11"] = timed(qs["c11_scene_efficacy"], spark, n=3)
    print("DIAG " + json.dumps(out))


if __name__ == "__main__":
    main()
