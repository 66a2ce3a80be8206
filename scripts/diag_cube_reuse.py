"""Bisect x_cube_reuse's monotone slowdown across repeated runs.

Runs the registered query N times in one driver-like session, timing
each run and sampling block-manager / shuffle state between runs.
"""
import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cube_builder_spark.queries import all_queries


def main():
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "16g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()["x_cube_reuse"]
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sc = spark.sparkContext
    jsc = sc._jsc.sc()
    for i in range(n):
        t0 = time.time()
        df = q(spark, sf)
        cnt = df.count()
        dt = time.time() - t0
        # block-manager status: RDD blocks that survived the run
        rdds = jsc.getPersistentRDDs().size()
        mem = jsc.getExecutorMemoryStatus().size()
        print(f"run {i}: {dt:.2f}s rows={cnt} persistentRDDs={rdds} "
              f"execs={mem}", flush=True)
        if os.environ.get("DIAG_GC"):
            del df
            gc.collect()
            sc._jvm.System.gc()


if __name__ == "__main__":
    main()
