"""Small-file compaction: data preserved exactly, file count reduced,
well-sized files untouched, partition values intact, idempotent."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cube_builder_spark.sinks.compact import compact, plan_compaction


def _parquet_names(d):
    out = []
    for dirpath, _dirs, files in os.walk(d):
        out += [os.path.join(dirpath, f) for f in files
                if f.endswith(".parquet") and not f.startswith(".")]
    return out


def _write_fragmented(spark, root):
    """Partitioned dataset where each partition is many tiny files."""
    df = (spark.range(2000)
          .select(F.col("id"),
                  (F.col("id") % 3).alias("grp"),
                  (F.col("id") * 7 % 1000).alias("v")))
    (df.repartition(16)  # 16 tiny files per partition dir
     .write.mode("overwrite").partitionBy("grp").parquet(root))


def test_compact_preserves_data_and_reduces_files(spark, tmp_path):
    root = str(tmp_path / "frag")
    _write_fragmented(spark, root)
    before_files = _parquet_names(root)
    before = sorted((r.id, r.grp, r.v)
                    for r in spark.read.parquet(root).collect())

    plans = compact(spark, root, target_bytes=1 << 20)
    assert plans, "fragmented dataset must produce a plan"
    after_files = _parquet_names(root)
    assert len(after_files) < len(before_files)
    # every affected partition packed to its planned output count
    for p in plans:
        part_abs = os.path.join(root, p.partition_dir)
        outs = [f for f in os.listdir(part_abs)
                if f.endswith(".parquet") and not f.startswith(".")]
        assert len(outs) == p.n_outputs + p.kept_files

    after = sorted((r.id, r.grp, r.v)
                   for r in spark.read.parquet(root).collect())
    assert after == before  # byte-for-byte same rows, partition col intact


def test_compact_is_idempotent_and_skips_well_sized(spark, tmp_path):
    root = str(tmp_path / "frag2")
    _write_fragmented(spark, root)
    compact(spark, root, target_bytes=1 << 20)
    # second run: everything is already >= threshold or a single file
    assert plan_compaction(root, target_bytes=1 << 20) == []
    files = set(_parquet_names(root))
    compact(spark, root, target_bytes=1 << 20)
    assert set(_parquet_names(root)) == files  # untouched


def test_plan_reads_only_small_files(spark, tmp_path):
    """A partition containing one big and several small files must
    plan a rewrite of ONLY the small ones."""
    root = str(tmp_path / "mixed")
    big = (spark.range(50000)
           .select(F.col("id"), F.lit(0).alias("grp"),
                   F.sha2(F.col("id").cast("string"), 256).alias("pad")))
    big.coalesce(1).write.mode("overwrite").partitionBy("grp").parquet(root)
    small = (spark.range(30)
             .select(F.col("id") + 100000, F.lit(0).alias("grp"),
                     F.lit("x").alias("pad"))
             .withColumnRenamed("(id + 100000)", "id"))
    (small.repartition(4).write.mode("append")
     .partitionBy("grp").parquet(root))

    plans = plan_compaction(root, target_bytes=1 << 20,
                            small_ratio=0.02)
    assert len(plans) == 1
    assert plans[0].kept_files >= 1  # the big file stays
    n_before = spark.read.parquet(root).count()
    compact(spark, root, target_bytes=1 << 20, small_ratio=0.02)
    assert spark.read.parquet(root).count() == n_before


def test_recompaction_after_appends_keeps_prior_outputs(spark, tmp_path):
    """Round-5 advisor fix: a second compaction in a partition that
    already holds a well-sized compact-N file from a prior run must
    NOT clobber it (output numbering starts after the highest
    survivor)."""
    root = str(tmp_path / "t")
    _write_fragmented(spark, root)
    compact(spark, root, target_bytes=1 << 30)  # everything -> 1 file/part
    before = spark.read.parquet(root)
    n_before = before.count()
    # append a fresh wave of tiny files, then recompact with a
    # threshold SMALL enough that the prior compact-00000 (well-sized)
    # is kept while the new tiny files merge
    extra = (spark.range(5000, 5200)
             .select(F.col("id"), (F.col("id") % 3).alias("grp"),
                     (F.col("id") * 7 % 1000).alias("v")))
    (extra.repartition(8).write.mode("append")
     .partitionBy("grp").parquet(root))
    sizes = {p: os.path.getsize(p) for p in _parquet_names(root)}
    big = max(sizes.values())
    compact(spark, root, target_bytes=big + 1, small_ratio=0.99)
    after = spark.read.parquet(root)
    assert after.count() == n_before + 200
    assert sorted(r.id for r in after.collect()) == sorted(
        list(range(2000)) + list(range(5000, 5200)))
