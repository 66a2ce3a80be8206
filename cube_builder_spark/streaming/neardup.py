"""Incremental MinHash-LSH near-dedup against a PERSISTED signature
index — the 100 TB ingestion shape: each arriving batch compares only
against the index buckets it touches, instead of re-running LSH over
the whole corpus per refresh.

Index layout: parquet partitioned by ``bshard = pmod(xxhash64(bucket),
N_SHARDS)`` with rows (doc_id, shingles, bucket), written
sorted-within-partitions by bucket so parquet row-group min/max stats
prune non-matching buckets inside each touched shard. A batch's read
of the index is: semi-join on the batch's (broadcast, distinct) bucket
set — the quadratic corpus×corpus comparison never happens; per batch
the work is batch-plane × touched-buckets.

Pair semantics per batch: new×new (within the batch) plus new×history
— history×history pairs were reported when their later member arrived,
so the union of all batches' outputs equals the one-shot corpus run
(modulo buckets that grow past the skew cap BETWEEN batches; the cap
is per-comparison-time by design, exactly like the one-shot cap is
per-run)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import dedup

N_SHARDS = 32

DEFAULT_BANDS = [["h0", "h1"], ["h2", "h3"]]


def _as_member(plane: DataFrame, is_new: bool) -> DataFrame:
    return plane.select(
        "bucket",
        F.struct(F.col("m.doc_id").alias("doc_id"),
                 F.col("m.shingles").alias("shingles"),
                 F.lit(is_new).alias("is_new")).alias("m"))


def update_near_dup_index(spark: SparkSession, batch_docs: DataFrame,
                          index_dir: str,
                          bands: list[list[str]] | None = None,
                          max_bucket: int | None = 64,
                          threshold: float | None = 0.8) -> DataFrame:
    """Fold one batch of documents (doc_id, text) into the signature
    index; returns the near-dup pairs involving this batch
    (doc_a, doc_b, jaccard), already materialized."""
    bands = bands or DEFAULT_BANDS
    sh = dedup.shingles(batch_docs)
    # the plane feeds BOTH the pair computation and the index append;
    # uncached, the shingle+minhash pass over the batch text runs
    # twice (measured ~2x the whole plane cost at sf0.1). Persist for
    # the two reads, unpersist before returning — the pairs frame is
    # an eager checkpoint, so nothing downstream re-reads the plane.
    plane = dedup.lsh_plane(sh, bands).persist()
    new = _as_member(plane, True)

    have_index = os.path.exists(index_dir) and any(
        not e.startswith(("_", ".")) for e in os.listdir(index_dir))
    if have_index:
        idx = spark.read.parquet(index_dir)
        # prune history to the buckets this batch touches: the batch's
        # bucket set is bounded by batch size × bands → broadcast;
        # bucket-sorted row groups make the shard scans skip cheaply
        touched = new.select("bucket").distinct()
        old = (idx.join(F.broadcast(touched), "bucket", "left_semi")
               .select("bucket", F.struct("doc_id", "shingles",
                                          F.lit(False).alias("is_new"))
                       .alias("m")))
        combined = new.unionByName(old)
    else:
        combined = new

    pairs = dedup.capped_plane_pairs(combined, max_bucket, threshold,
                                     new_field="is_new")
    # Materialize BEFORE appending: the pair plan reads index_dir
    # lazily, so an append-then-collect would double-count the batch
    # (its docs seen as both new and history). Eager localCheckpoint
    # is the batch-local cut; a cluster deployment would write pairs
    # to its output sink here instead (same barrier, durable).
    pairs = pairs.localCheckpoint(eager=True)

    # One shuffle on bshard before the write: without it every input
    # partition opens a writer for every shard it touches — up to
    # tasks × N_SHARDS small files per batch (measured 2k files,
    # 2.3s at sf0.1 vs 66 files, 0.5s repartitioned — the write was
    # 70% of the whole query). Exactly one file per touched shard per
    # batch bounds the index file count at 100 TB ingest rates, and
    # the within-shard bucket sort still gives row-group min/max
    # pruning for the semi-join reads.
    (plane.select(F.col("m.doc_id").alias("doc_id"),
                  F.col("m.shingles").alias("shingles"), "bucket",
                  F.pmod(F.xxhash64("bucket"), F.lit(N_SHARDS))
                  .alias("bshard"))
     .repartition(N_SHARDS, "bshard")
     .sortWithinPartitions("bucket")
     .write.mode("append").partitionBy("bshard").parquet(index_dir))
    plane.unpersist()
    return pairs
