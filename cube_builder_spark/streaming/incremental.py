"""Streaming incremental cube update — new scenes refresh the cube.

Reference behavior: when new scenes land for an already-built period,
the dispatcher re-queues that (tile, period) work unit and the whole
merge→blend→publish chain re-runs from the raw files
(``maestro.py:439-628`` re-dispatch + ``tasks.py:128-182`` reuse).

Spark-first shape: the blend family (operators/blend.py) is, by
construction, a single keyed aggregation — and every one of its
aggregates is a *mergeable monoid*:

- LCF pick = max(struct(order_key, payload))   → merge = max
- TOTALOB / CLEAROB = sums                     → merge = sum
- MED = exact median of clear values           → merge = array concat;
  the per-(pixel, period) array is bounded by scenes-per-period
  (single digits to ~46 for a yearly 8-day cube), so state stays
  small no matter how many TB of scenes flow through.

So the incremental update never re-reads old scenes: it keeps a
*blend-state* table partitioned by (tile_id, period), folds each
micro-batch of new observations into it with one keyed aggregation,
and re-finalizes only the touched partitions. ``foreachBatch`` +
dynamic partition overwrite is the sink — the open-source equivalent
of a Delta MERGE keyed on the partition columns.

Batch contract: a micro-batch carries *whole scenes* (a scene = all
bands + quality for one (tile, date)); scenes land atomically as
files, so file-stream batching satisfies this naturally. Overlapping
same-(tile, band, date) scenes split across batches would mosaic
per-batch only — group same-date files into one trigger if that
matters (the reference has the same constraint at task granularity).

Scale notes: state and cube are partitioned by (tile_id, period), so
a batch touching k units rewrites exactly k partitions (partition
pruning on read, dynamic overwrite on write); the only wide exchange
per batch is the one groupBy on the work-unit key, identical in shape
to the batch blend. On a real cluster the state table would be
Delta/Iceberg for atomic partition swaps; plain parquet + dynamic
overwrite keeps the engine dependency-free here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import blend
from ..operators.mosaic import mosaic_first_valid
from ..pixelplane import BAND_NODATA, CLEAR_VALUES
from ..plans.build_cube import (CubeJobConfig, assign_periods, index_stage,
                                periods_df)

STATE_KEYS = ("tile_id", "period", "band", "pixel_id")


def mosaic_batch(obs: DataFrame, cfg: CubeJobConfig) -> DataFrame:
    """C1 within the batch: first-valid-wins across overlapping scenes
    of one (tile, band, date) slot — same as build_cube.merge_stage."""
    # one shuffle keys the batch's whole mosaic->join->state chain
    # (hash(tile, pixel) ⊆ every downstream wide key); pinned count so
    # AQE can't collapse the batch to one partition
    n = int(obs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    merged = mosaic_first_valid(
        obs.repartition(n, "tile_id", "pixel_id"),
        keys=("tile_id", "pixel_id", "band", "date", "period", "doy"))
    return merged.select(
        "tile_id", "pixel_id", "band", "date", "period", "doy",
        F.col("merge_value").alias("value"),
        F.col("datasource").alias("source_idx"))


def delta_blend_state(merged: DataFrame, cfg: CubeJobConfig) -> DataFrame:
    """One micro-batch of mosaicked observations → partial blend state
    per (tile, period, band, pixel). Mirrors
    plans.build_cube.blend_stage, but stops at the mergeable
    aggregates instead of finalizing."""
    qual = (merged.filter(F.col("band") == cfg.quality_band)
            .select("tile_id", "pixel_id", "date", "period",
                    F.col("value").alias("quality")))
    spectral = merged.filter(F.col("band") != cfg.quality_band)
    joined = spectral.join(qual, ["tile_id", "pixel_id", "date", "period"])

    if cfg.reference_day is not None:
        order_key = blend.temporal_priority_key(cfg.reference_day)
    else:
        eff = blend.scene_efficacy(qual)
        joined = joined.join(
            F.broadcast(eff.select("tile_id", "date", "efficacy")),
            ["tile_id", "date"])
        order_key = blend.default_order_key()

    is_clear = F.col("quality").isin(*CLEAR_VALUES)
    is_valid = F.col("value") != cfg.nodata
    return (joined.groupBy(*STATE_KEYS).agg(
        blend._pick(is_clear, order_key).alias("c"),
        blend._pick(is_valid, order_key).alias("v"),
        F.sort_array(F.collect_list(F.when(is_clear, F.col("value"))))
        .alias("clear_vals"),
        F.sum((F.col("quality") != 0).cast("long")).alias("totalob"),
        F.sum(is_clear.cast("long")).alias("clearob")))


def merge_blend_state(old: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold a delta into existing state: max for the picks, concat for
    the median arrays, sum for the counters — one keyed aggregation."""
    both = old.unionByName(delta)
    return (both.groupBy(*STATE_KEYS).agg(
        F.max("c").alias("c"),
        F.max("v").alias("v"),
        F.sort_array(F.flatten(F.collect_list("clear_vals"))).alias("clear_vals"),
        F.sum("totalob").alias("totalob"),
        F.sum("clearob").alias("clearob")))


def finalize_blend(state: DataFrame, cfg: CubeJobConfig) -> DataFrame:
    """State → the blend_stage output contract (lcf/med/provenance/
    datasource/counts). Median is the exact interpolating median of
    the sorted clear-value array — bit-identical to F.median /
    numpy.ma.median on the same values."""
    n = F.size("clear_vals")
    lo = F.element_at("clear_vals", ((n + 1) / 2).cast("int")).cast("double")
    hi = F.element_at("clear_vals", (n / 2 + 1).cast("int")).cast("double")
    med = F.when(n > 0, (lo + hi) / 2.0)
    value = F.coalesce("c.p.value", "v.p.value", F.lit(cfg.nodata))
    out = state.select(
        *STATE_KEYS,
        value.alias("lcf_value"),
        F.coalesce("c.p.doy", "v.p.doy", F.lit(-1)).cast("long").alias("provenance"),
        F.coalesce("c.p.source_idx", "v.p.source_idx", F.lit(255))
        .cast("long").alias("datasource"),
        F.coalesce(med, F.lit(float(cfg.nodata))).alias("med_value"),
        "totalob", "clearob")
    comp = F.col("lcf_value") if cfg.composite == "LCF" else \
        F.col("med_value").cast("long")
    return out.select(
        *STATE_KEYS, comp.alias("value"),
        "lcf_value", "med_value", "provenance", "datasource",
        "totalob", "clearob")


def delta_item_state(merged: DataFrame, cfg: CubeJobConfig) -> DataFrame:
    """K4 cloud-cover counters per (tile, period) — also a monoid.
    Computed from the mosaicked frame, same as build_cube's
    publish_stage."""
    qual = merged.filter(F.col("band") == cfg.quality_band)
    return qual.groupBy("tile_id", "period").agg(
        F.sum(F.col("value").isin(*CLEAR_VALUES).cast("long")).alias("clear"),
        F.sum((~F.col("value").isin(*CLEAR_VALUES) & (F.col("value") != 0)
               & (F.col("value") != cfg.nodata)).cast("long")).alias("not_clear"))


def _finalize_items(item_state: DataFrame, cfg: CubeJobConfig) -> DataFrame:
    return item_state.select(
        F.concat(F.lit(f"{cfg.cube}_V{cfg.version:03d}_"),
                 F.format_string("%03d", F.col("tile_id").cast("int")),
                 F.lit("_"), F.regexp_replace(F.split("period", "_")[0], "-", "")
                 ).alias("item_id"),
        "tile_id", "period",
        (F.col("not_clear") * 100.0
         / F.nullif(F.col("clear") + F.col("not_clear"), F.lit(0))
         ).alias("cloud_cover"))


def _read_partitions(spark: SparkSession, path: str,
                     units: list) -> DataFrame | None:
    """Read only the touched (tile_id, period) partitions of a
    partitioned table; None if the table doesn't exist yet. The filter
    is on partition columns → pure partition pruning, no data scan of
    untouched units. localCheckpoint truncates lineage so the same
    partitions can be overwritten in this batch (plain-parquet stand-in
    for a MERGE's snapshot isolation)."""
    if not os.path.exists(path):
        return None
    df = spark.read.parquet(path)
    cond = None
    for (t, p) in units:
        c = (F.col("tile_id") == t) & (F.col("period") == p)
        cond = c if cond is None else (cond | c)
    return df.filter(cond).localCheckpoint(eager=True)


def upsert_partitioned(df: DataFrame, path: str,
                       partition_cols=("tile_id", "period")) -> None:
    """MERGE-style upsert for tables partitioned by ``partition_cols``:
    dynamic partition overwrite replaces exactly the partitions present
    in ``df`` and leaves every other partition untouched."""
    # pinned count: an unpinned repartition(cols) is AQE-coalescible —
    # small batches collapse to ~1 partition and serialize the write
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    (df.repartition(n, *partition_cols)
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy(*partition_cols).parquet(path))


def update_cube_batch(spark: SparkSession, batch: DataFrame, out_dir: str,
                      cfg: CubeJobConfig | None = None) -> dict:
    """Fold ONE micro-batch of raw observations into the cube at
    ``out_dir``. Usable directly (batch incremental refresh) or as the
    foreachBatch body of ``stream_cube_updates``."""
    cfg = cfg or CubeJobConfig()
    periods = periods_df(spark, cfg)
    tagged = assign_periods(batch, periods)
    merged = mosaic_batch(tagged, cfg).persist()

    delta = delta_blend_state(merged, cfg).persist()
    units = [(r.tile_id, r.period) for r in
             delta.select("tile_id", "period").distinct().collect()]
    if not units:
        merged.unpersist()
        delta.unpersist()
        return {"updated_units": 0}

    state_path = os.path.join(out_dir, "state")
    cube_path = os.path.join(out_dir, "cube")
    items_path = os.path.join(out_dir, "items")

    old = _read_partitions(spark, state_path, units)
    state = delta if old is None else merge_blend_state(old, delta)
    state = state.localCheckpoint(eager=True)
    upsert_partitioned(state, state_path)
    cube_rows = index_stage(finalize_blend(state, cfg), cfg)
    upsert_partitioned(cube_rows, cube_path)

    item_delta = delta_item_state(merged, cfg)
    old_items = _read_partitions(spark, items_path, units)
    if old_items is not None:
        item_delta = (old_items.select("tile_id", "period", "clear", "not_clear")
                      .unionByName(item_delta)
                      .groupBy("tile_id", "period")
                      .agg(F.sum("clear").alias("clear"),
                           F.sum("not_clear").alias("not_clear")))
    # keep raw counters alongside the item row so future batches can
    # keep merging them
    items = item_delta.join(
        _finalize_items(item_delta, cfg), ["tile_id", "period"])
    upsert_partitioned(items.localCheckpoint(eager=True), items_path)

    merged.unpersist()
    delta.unpersist()
    return {"updated_units": len(units), "cube_path": cube_path,
            "items_path": items_path, "state_path": state_path}


def stream_cube_updates(spark: SparkSession, scenes_dir: str, out_dir: str,
                        schema: str, cfg: CubeJobConfig | None = None,
                        checkpoint: str | None = None):
    """File-source stream of scene observations → continuously updated
    cube. ``availableNow`` drains everything currently in the
    directory then stops; re-invoking picks up only new files via the
    checkpoint — the streaming analogue of the reference's dispatcher
    noticing new scenes."""
    cfg = cfg or CubeJobConfig()
    checkpoint = checkpoint or os.path.join(out_dir, "_checkpoint")
    src = spark.readStream.schema(schema).parquet(scenes_dir)
    return (src.writeStream
            .foreachBatch(lambda df, _epoch:
                          update_cube_batch(df.sparkSession, df, out_dir, cfg))
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())
