"""E2E cube-build job: the §3.1 pipeline as one Spark DAG, with the
reference's structural invariants (test_cube_creation.py:163-188) and
incremental-reuse semantics (tasks.py:128-182)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cube_builder_spark.pixelplane import BAND_NODATA, pixel_plane
from cube_builder_spark.plans.build_cube import CubeJobConfig, build_cube


def synth_observations(spark, sf_dir):
    """Multi-band observation stream from the deterministic pixel
    plane: B04 = plane value, B8A = derived variant, SCL = quality."""
    px = pixel_plane(spark, sf_dir)
    b8a_valid = ((F.col("value") * 3 + F.col("pixel_id")) % 20001 - 10000)
    common = ["tile_id", "pixel_id", "date", "doy", "source_idx"]
    b04 = px.select(*common, F.lit("B04").alias("band"),
                    F.col("value").cast("long").alias("value"))
    b8a = px.select(*common, F.lit("B8A").alias("band"),
                    F.when(F.col("value") == BAND_NODATA, F.lit(BAND_NODATA))
                    .otherwise(b8a_valid).cast("long").alias("value"))
    scl = px.select(*common, F.lit("SCL").alias("band"),
                    F.col("quality").cast("long").alias("value"))
    return (b04.unionByName(b8a).unionByName(scl)
            .withColumn("scene_order", F.col("source_idx")))


def test_build_cube_end_to_end(spark, sf_dir, tmp_path):
    out = str(tmp_path / "cube_out")
    obs = synth_observations(spark, sf_dir)
    res = build_cube(spark, obs, out, CubeJobConfig())
    assert res["new_items"] > 0 and res["reused_items"] == 0

    cube = spark.read.parquet(res["cube_path"])
    items = spark.read.parquet(res["items_path"])

    bands = {r.band for r in cube.select("band").distinct().collect()}
    assert bands == {"B04", "B8A", "NDVI"}

    # invariant: all bands of a (tile, period) cover the same pixel set
    per_band = (cube.groupBy("tile_id", "period", "band")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.countDistinct("pixel_id").alias("nd")))
    spread = (per_band.groupBy("tile_id", "period")
              .agg(F.countDistinct("n").alias("n_shapes"),
                   F.max((F.col("n") != F.col("nd")).cast("int")).alias("dupes")))
    bad = spread.filter((F.col("n_shapes") != 1) | (F.col("dupes") == 1)).count()
    assert bad == 0

    # one item per (tile, period) present in the cube
    cube_units = cube.select("tile_id", "period").distinct()
    assert items.count() == cube_units.count()

    # NDVI semantics: 10000*(B8A-B04)/(B8A+B04) clamped to int16,
    # nodata when either input is nodata
    wide = (cube.filter(F.col("band").isin("B04", "B8A", "NDVI"))
            .groupBy("tile_id", "period", "pixel_id")
            .pivot("band", ["B04", "B8A", "NDVI"]).agg(F.first("value")))
    expect = (F.when((F.col("B04") == BAND_NODATA) | (F.col("B8A") == BAND_NODATA),
                     F.lit(BAND_NODATA))
              .otherwise(F.coalesce(
                  F.least(F.greatest(
                      (10000 * (F.col("B8A") - F.col("B04"))
                       / F.nullif(F.col("B8A") + F.col("B04"), F.lit(0))),
                      F.lit(-32768.0)), F.lit(32767.0)).cast("long"),
                  F.lit(BAND_NODATA))))
    assert wide.filter(F.col("NDVI") != expect).count() == 0

    # values stay in int16 domain
    assert cube.filter((F.col("value") < -32768) | (F.col("value") > 32767)).count() == 0


def test_build_cube_incremental_reuse(spark, sf_dir, tmp_path):
    out = str(tmp_path / "cube_incr")
    obs = synth_observations(spark, sf_dir)
    first = build_cube(spark, obs, out, CubeJobConfig())
    assert first["new_items"] > 0

    # second run: everything already published -> nothing recomputed
    second = build_cube(spark, obs, out, CubeJobConfig())
    assert second["new_items"] == 0
    assert second["reused_items"] == first["new_items"]

    # force: full recompute appends a fresh copy of every item
    forced = build_cube(spark, obs, out, CubeJobConfig(force=True))
    assert forced["new_items"] == first["new_items"]


def test_build_cube_med_composite(spark, sf_dir, tmp_path):
    out = str(tmp_path / "cube_med")
    obs = synth_observations(spark, sf_dir)
    res = build_cube(spark, obs, out, CubeJobConfig(composite="MED",
                                                    index_bands={}))
    cube = spark.read.parquet(res["cube_path"])
    assert {r.band for r in cube.select("band").distinct().collect()} == {"B04", "B8A"}
    # MED value column equals the med_value statistic (long-cast)
    bad = cube.filter(F.col("value") != F.col("med_value").cast("long")).count()
    assert bad == 0


def test_job_log_and_status(spark, sf_dir, tmp_path):
    from cube_builder_spark.plans.build_cube import job_status
    out = str(tmp_path / "cube_log")
    obs = synth_observations(spark, sf_dir)
    build_cube(spark, obs, out, CubeJobConfig())
    build_cube(spark, obs, out, CubeJobConfig())   # no-op incremental run
    st = job_status(spark, out).collect()
    assert len(st) == 1
    r = st[0]
    assert r.cube == "SYN-CUBE-1" and r.n_runs == 2
    assert r.new_items == 0 and r.reused_items > 0   # latest run reused all


def test_build_cube_reference_day_ordering(spark, sf_dir, tmp_path):
    """C16 in the job: provenance skews toward the reference day."""
    obs = synth_observations(spark, sf_dir)
    res_eff = build_cube(spark, obs, str(tmp_path / "eff"),
                         CubeJobConfig(index_bands={}))
    res_ref = build_cube(spark, obs, str(tmp_path / "ref"),
                         CubeJobConfig(index_bands={}, reference_day=4))
    eff = spark.read.parquet(res_eff["cube_path"]).filter("band = 'B04'")
    ref = spark.read.parquet(res_ref["cube_path"]).filter("band = 'B04'")
    mean_dist = lambda df, day: (df.filter(F.col("provenance") > 0)
                                 .agg(F.avg(F.abs(F.col("provenance") - day)))
                                 .first()[0])
    # nearest-to-day-4-first ordering pulls provenance toward day 4
    assert mean_dist(ref, 4) < mean_dist(eff, 4)
    # same pixels produced either way
    assert eff.count() == ref.count()


def test_histogram_match_stage_pulls_dates_toward_best(spark, sf_dir, tmp_path):
    """C15 in the job: after matching, a non-best date's mean over
    jointly-valid pixels moves toward the best date's mean."""
    from cube_builder_spark.plans.build_cube import (assign_periods,
                                                     histogram_stage,
                                                     merge_stage, periods_df)
    obs = synth_observations(spark, sf_dir)
    cfg = CubeJobConfig()
    tagged = assign_periods(obs, periods_df(spark, cfg))
    merged = merge_stage(tagged, cfg).persist()
    matched = histogram_stage(merged, cfg)

    def stats(df):
        return {(r.tile_id, r.period, r.date): r.m for r in
                (df.filter((F.col("band") == "B04") & (F.col("value") != -9999))
                 .groupBy("tile_id", "period", "date")
                 .agg(F.avg("value").alias("m")).collect())}

    before, after = stats(merged), stats(matched)
    # same scene set either way
    assert set(before) == set(after)
    # at least some scenes changed (matching had effect) and the
    # quality band never changes
    changed = [k for k in before if abs(before[k] - after[k]) > 1e-9]
    assert changed
    q_before = merged.filter(F.col("band") == "SCL").agg(
        F.sum("value")).first()[0]
    q_after = matched.filter(F.col("band") == "SCL").agg(
        F.sum("value")).first()[0]
    assert q_before == q_after


def test_histogram_match_in_full_job(spark, sf_dir, tmp_path):
    obs = synth_observations(spark, sf_dir)
    res = build_cube(spark, obs, str(tmp_path / "hm"),
                     CubeJobConfig(histogram_match=True, index_bands={}))
    assert res["new_items"] > 0
    cube = spark.read.parquet(res["cube_path"])
    assert cube.filter((F.col("value") < -32768) | (F.col("value") > 32767)).count() == 0


def test_job_media_exports(spark, sf_dir, tmp_path):
    """§3.1 step 8: publish writes quicklook PNGs and band GeoTIFFs."""
    import glob
    import os

    from cube_builder_spark.sinks.cog import read_cog
    from cube_builder_spark.sinks.quicklook import decode_png_rgb
    out = str(tmp_path / "media")
    obs = synth_observations(spark, sf_dir)
    res = build_cube(spark, obs, out,
                     CubeJobConfig(index_bands={},
                                   quicklook_bands=("B04", "B8A", "B04"),
                                   export_tiffs=True, cog_tile=16))
    assert res["quicklooks"] > 0 and res["tiffs"] > 0
    png = sorted(glob.glob(os.path.join(out, "quicklook", "*.png")))[0]
    img = decode_png_rgb(open(png, "rb").read())
    assert img.shape[1] == 32 and img.shape[2] == 3
    tif = sorted(glob.glob(os.path.join(out, "tiff", "*.tif")))[0]
    got = read_cog(open(tif, "rb").read())          # publish writes COGs now
    assert got["array"].shape[1] == 32 and got["tile"] == 16


def test_build_cube_bucketed_store(spark, sf_dir, tmp_path):
    from cube_builder_spark.sinks.bucketed import (plan_has_exchange,
                                                   read_bucketed)
    out = str(tmp_path / "cube_out")
    obs = synth_observations(spark, sf_dir)
    res = build_cube(spark, obs, out,
                     CubeJobConfig(bucketed_table="cube_e2e_bucketed"))
    assert res["bucketed_table"] == "cube_e2e_bucketed"
    back = read_bucketed(spark, "cube_e2e_bucketed")
    # same content as the partitioned cube
    flat = spark.read.parquet(res["cube_path"])
    assert back.count() == flat.count()
    # the payoff: per-pixel aggregation with zero Exchange
    agg = back.groupBy("tile_id", "pixel_id").agg(F.count(F.lit(1)))
    assert not plan_has_exchange(agg)
    spark.sql("DROP TABLE IF EXISTS cube_e2e_bucketed")
