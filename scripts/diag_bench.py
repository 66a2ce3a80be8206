"""Instrumented bench: per-query wall time + JVM GC-time delta + heap
+ cached-RDD block count, to attribute bench-run variance (GC thrash
from accumulated persist/checkpoint blocks vs host noise)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE
from cube_builder_spark.queries import all_queries
from cube_builder_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def jvm_stats(spark):
    jvm = spark.sparkContext._jvm
    mf = jvm.java.lang.management.ManagementFactory
    gc_ms = sum(b.getCollectionTime() for b in mf.getGarbageCollectorMXBeans())
    heap = mf.getMemoryMXBean().getHeapMemoryUsage().getUsed() // (1 << 20)
    infos = spark._jsc.sc().getRDDStorageInfo()
    n_rdd = len(infos)
    cached_mb = sum(i.memSize() for i in infos) // (1 << 20)
    disk_mb = sum(i.diskSize() for i in infos) // (1 << 20)
    return gc_ms, heap, n_rdd, cached_mb, disk_mb


def main():
    spark = get_spark("diag-bench")
    qs = all_queries()
    names = [n for n in HEADLINE if n in qs]
    qs[names[0]](spark, SF_DIR).collect()

    def _identity(it):
        yield from it
    spark.range(256).repartition(32).mapInPandas(_identity, "id long").count()

    prev_gc, *_ = jvm_stats(spark)
    print(f"{'query':30s} {'run1':>7s} {'run2':>7s} {'gc_ms':>6s} "
          f"{'heapMB':>7s} {'nRDD':>5s} {'memMB':>6s} {'diskMB':>7s}")
    for name in names:
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).collect()
            runs.append(round(time.perf_counter() - t0, 2))
        gc, heap, n_rdd, mem, disk = jvm_stats(spark)
        print(f"{name:30s} {runs[0]:7.2f} {runs[1]:7.2f} {gc - prev_gc:6d} "
              f"{heap:7d} {n_rdd:5d} {mem:6d} {disk:7d}", flush=True)
        prev_gc = gc


if __name__ == "__main__":
    main()
