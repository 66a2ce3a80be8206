"""Optimization-round measurement probe (guide §1).

Usage:
  python tools/perf_probe.py plan  TAG q1 q2 ...   # capture explain("formatted") to plans/r15/<q>_<TAG>.txt
  python tools/perf_probe.py time  N   q1 q2 ...   # min-of-N wall (collect, bench methodology)
  python tools/perf_probe.py noop  N   q1 q2 ...   # min-of-N wall (noop sink, isolates compute from collect)

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
Each job is labelled with the query name (guide §1.5).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cube_builder_spark.queries import all_queries
from cube_builder_spark.session import get_spark


def main() -> None:
    mode = sys.argv[1]
    arg2 = sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("perf-probe")
    qs = all_queries()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    if mode == "plan":
        out_dir = os.path.join(here, "plans", "r15")
        os.makedirs(out_dir, exist_ok=True)
        for n in names:
            df = qs[n](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            path = os.path.join(out_dir, f"{n}_{arg2}.txt")
            with open(path, "w") as fh:
                fh.write(txt)
            n_ex = txt.count("Exchange")
            print(f"{n}: wrote {path}  (Exchange mentions: {n_ex})")
        return

    n_runs = int(arg2)
    # warm JVM + python workers like bench.py does
    qs[names[0]](spark, sf_dir).collect()

    def _identity(it):
        yield from it
    spark.range(256).repartition(32).mapInPandas(_identity, "id long").count()

    for n in names:
        runs = []
        for _ in range(n_runs):
            fn = qs[n]
            spark.sparkContext.setJobDescription(n)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            if mode == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            runs.append(round(time.perf_counter() - t0, 4))
            spark.sparkContext.setJobDescription(None)
        print(f"{n}: min={min(runs):.3f} runs={runs}")


if __name__ == "__main__":
    main()
