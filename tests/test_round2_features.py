"""Round-2 feature tests: S13 probe, C8 expression rules, geographic
grids, cross-cube reuse validations, K1/K2 verified sinks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cube_builder_spark.sources.probe import (CONNECTION_ERROR,
                                              classify_response, probe_links)


# S13 -------------------------------------------------------------------------

def test_classify_response_mapping():
    assert classify_response("file:///x.tif", None, False) == (True, "skipped (not http)")
    assert classify_response("http://x", 200, False) == (True, "ok")
    ok, msg = classify_response("http://x", CONNECTION_ERROR, False)
    assert not ok and msg == "Connection refused http://x"
    assert classify_response("http://x", 403, True)[1] == \
        "(Forbidden) You don't have permission to request this resource."
    assert classify_response("http://x", 403, False)[1] == \
        "(Forbidden) Missing Authentication Token."
    assert classify_response("http://x", 500, False)[1] == \
        "(Internal Server Error) Could not request this resource."


def test_probe_links_distributed(spark):
    links = spark.createDataFrame(
        [("https://a/1",), ("http://a/2",), ("file:///a/3",)], "link string")
    rep = probe_links(links, access_token="tok",
                      prober=lambda u: 403 if u.endswith("1") else 200)
    got = {r.link: (r.status, r.ok) for r in rep.collect()}
    assert got["https://a/1"] == (403, False)
    assert got["http://a/2"] == (200, True)
    assert got["file:///a/3"] == (-9999, True)     # skipped, not probed


# C8 expression rules ---------------------------------------------------------

def test_confidence_expression_matches_manual_bits(spark):
    from cube_builder_spark.operators import masking
    df = spark.range(0, 65536).select(F.col("id").alias("qa"))
    expr = masking.compile_confidence_expression("cloud >= MEDIUM", F.col("qa"))
    manual = masking.extract_bits(F.col("qa"), 8, 9) >= masking.MEDIUM
    assert df.filter(expr != manual).count() == 0
    combo = masking.compile_confidence_expression(
        "cloud == HIGH or (cloud_shadow >= MEDIUM and not snow == HIGH)",
        F.col("qa"))
    manual2 = ((masking.extract_bits(F.col("qa"), 8, 9) == masking.HIGH)
               | ((masking.extract_bits(F.col("qa"), 10, 11) >= masking.MEDIUM)
                  & ~(masking.extract_bits(F.col("qa"), 12, 13) == masking.HIGH)))
    assert df.filter(combo != manual2).count() == 0


def test_confidence_expression_rejects_unsafe():
    from cube_builder_spark.operators.masking import (
        ConfidenceExpressionError, compile_confidence_expression)
    for bad in ("__import__('os')", "cloud + 1", "x == 1", "cloud == MEDIUM; 1"):
        with pytest.raises(ConfidenceExpressionError):
            compile_confidence_expression(bad, F.lit(0))


# Geographic grids ------------------------------------------------------------

def test_geographic_grid_hierarchy_nests():
    from cube_builder_spark.grids import (create_geographic_grids,
                                          geographic_grid_constants)
    params = dict(names=["SM", "MD", "LG"], projection="aea", meridian=-54.0,
                  tile_factor=[(10, 10), (20, 20), (40, 40)],
                  shape=(10560, 10560),
                  bbox=(-60.0, -20.0, -50.0, -10.0))
    c = geographic_grid_constants(params["projection"], params["meridian"],
                                  params["tile_factor"], params["shape"],
                                  params["bbox"])
    # center-tile size: shape * ref resolution (10560 px * 10 m)
    assert c["tile_size_x"] == pytest.approx(105600.0)
    grids = create_geographic_grids(**params)
    sm, md, lg = grids["SM"], grids["MD"], grids["LG"]
    assert len(sm) > len(md) > len(lg) > 0
    assert all(len(t["tile_id"]) == 6 for t in sm)
    # every MD tile corner sits on the SM lattice; MD tile = 2x SM tile
    ts = c["tile_size_x"]
    for t in md:
        k = (t["xmin"] - c["x_min_grid"]) / ts
        assert abs(k - round(k)) < 1e-9
        assert (t["xmax"] - t["xmin"]) == pytest.approx(2 * ts)
    for t in lg:
        assert (t["xmax"] - t["xmin"]) == pytest.approx(4 * ts)


def test_geographic_grid_sinusoidal():
    from cube_builder_spark.grids import create_geographic_grids
    grids = create_geographic_grids(
        names=["S"], projection="sinu", meridian=0.0,
        tile_factor=[(100, 100)], shape=(1200, 1200),
        bbox=(-10.0, -10.0, 10.0, 10.0))
    assert len(grids["S"]) > 0


# Cross-cube reuse validations ------------------------------------------------

def _mini_obs(spark, bands=("B04", "SCL")):
    rows = [(0, p, "2020-01-02", 2, 0, b, 100 + p)
            for p in range(4) for b in bands]
    df = spark.createDataFrame(
        rows, "tile_id long, pixel_id long, date string, doy long, "
              "source_idx long, band string, value long")
    return (df.withColumn("date", F.col("date").cast("date"))
            .withColumn("scene_order", F.col("source_idx")))


def test_reuse_missing_band_and_force_rejected(spark, tmp_path):
    from datetime import date

    from cube_builder_spark.plans.build_cube import CubeJobConfig, build_cube
    src = str(tmp_path / "src")
    cfg_a = CubeJobConfig(start=date(2020, 1, 1), end=date(2020, 1, 8), step=8,
                          index_bands={}, write_identity=True)
    build_cube(spark, _mini_obs(spark), src, cfg_a)

    dst = str(tmp_path / "dst")
    with pytest.raises(RuntimeError, match="must have all bands"):
        build_cube(spark, _mini_obs(spark, bands=("B04", "B99", "SCL")), dst,
                   CubeJobConfig(start=date(2020, 1, 1), end=date(2020, 1, 8),
                                 step=8, index_bands={}, reuse_from=src))
    with pytest.raises(RuntimeError, match="force"):
        build_cube(spark, _mini_obs(spark), dst,
                   CubeJobConfig(start=date(2020, 1, 1), end=date(2020, 1, 8),
                                 step=8, index_bands={}, reuse_from=src,
                                 force=True))
    with pytest.raises(RuntimeError, match="no\\s+identity|has no"):
        build_cube(spark, _mini_obs(spark), dst,
                   CubeJobConfig(start=date(2020, 1, 1), end=date(2020, 1, 8),
                                 step=8, index_bands={},
                                 reuse_from=str(tmp_path / "nowhere")))


def test_reuse_matches_direct_build(spark, tmp_path):
    from datetime import date

    from cube_builder_spark.plans.build_cube import CubeJobConfig, build_cube
    obs = _mini_obs(spark)
    src, direct, reused = (str(tmp_path / d) for d in ("src", "direct", "re"))
    base = dict(start=date(2020, 1, 1), end=date(2020, 1, 8), step=8,
                index_bands={})
    build_cube(spark, obs, src, CubeJobConfig(**base, write_identity=True))
    build_cube(spark, obs, direct, CubeJobConfig(**base))
    build_cube(spark, obs, reused, CubeJobConfig(**base, reuse_from=src))
    a = spark.read.parquet(direct + "/cube")
    b = spark.read.parquet(reused + "/cube")
    cols = ["tile_id", "period", "band", "pixel_id", "lcf_value",
            "provenance", "datasource", "med_value", "totalob", "clearob"]
    assert sorted(map(tuple, a.select(*cols).collect())) == \
        sorted(map(tuple, b.select(*cols).collect()))


def test_training_data_prep_funnel_invariants(spark):
    from cube_builder_spark.pipeline_queries import (
        _PREP_MIN_QUALITY, _PREP_MIN_TOKENS, p_training_data_prep)
    sf = "/root/testdata/sf0.001"
    out = p_training_data_prep(spark, sf).collect()
    assert out, "funnel should keep something"
    # every survivor passed the gates
    assert all(r.predicted == "en" for r in out)
    assert all(r.n_tokens >= _PREP_MIN_TOKENS for r in out)
    assert all(r.quality >= _PREP_MIN_QUALITY for r in out)
    # exact dedup: content hashes unique among survivors
    hashes = [r.content_hash for r in out]
    assert len(hashes) == len(set(hashes))
    # and the funnel actually dropped something vs the raw table
    from cube_builder_spark.tables import load_tables
    n_docs = load_tables(spark, sf, ["documents"])["documents"].count()
    assert len(out) < n_docs


def test_funnel_strict_ordering(spark):
    """A purchase BEFORE the first view/click must not convert."""
    import datetime as dt
    from cube_builder_spark import events_queries as eq
    t0 = dt.datetime(2020, 1, 1, 10, 0, 0)
    rows = [
        # user 1: purchase happens before view -> stage stops at 1
        (1, t0, 1, "purchase", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=1), 1, "view", 1.0, "{}"),
        # user 2: proper view < click < purchase -> stage 3
        (3, t0, 2, "view", 1.0, "{}"),
        (4, t0 + dt.timedelta(minutes=1), 2, "click", 1.0, "{}"),
        (5, t0 + dt.timedelta(minutes=2), 2, "purchase", 1.0, "{}"),
        # user 3: click only, no view -> stage 0
        (6, t0, 3, "click", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
              " event_type string, value double, props string")
    import unittest.mock as mock
    with mock.patch.object(eq, "_events", lambda s, d: df):
        out = {r.user_id: r for r in eq.e_funnel(spark, "x").collect()}
    assert out[1].funnel_stage == 1 and out[1].click_ts is None
    assert out[2].funnel_stage == 3
    assert out[3].funnel_stage == 0


def test_defer_cleanup_purges_previous_dir_per_key(tmp_path):
    """Round-6 advisor fix: repeated runs of one query must not
    accumulate scratch dirs on tmpfs — a new registration under the
    same key removes the previous dir immediately; distinct keys are
    independent."""
    import os

    from cube_builder_spark.session import defer_cleanup

    a = tmp_path / "runA"; a.mkdir(); (a / "f").write_text("x")
    b = tmp_path / "runB"; b.mkdir()
    other = tmp_path / "other"; other.mkdir()
    defer_cleanup(str(a), key="qX")
    defer_cleanup(str(other), key="qY")
    assert os.path.isdir(a) and os.path.isdir(other)
    defer_cleanup(str(b), key="qX")       # second run of qX
    assert not os.path.exists(a)          # prior qX scratch purged
    assert os.path.isdir(b) and os.path.isdir(other)
    # re-registering the SAME path is a no-op, never a self-delete
    defer_cleanup(str(b), key="qX")
    assert os.path.isdir(b)


def test_pixel_trend_exact_slope(spark, monkeypatch):
    """C21 on a constructed stack: slope of a perfectly linear pixel
    is exact; a constant pixel has slope 0; a single-obs pixel and an
    all-nodata pixel are excluded (den == 0 / no rows)."""
    import cube_builder_spark.cube_queries as cq

    rows = []
    for d in range(1, 6):
        rows.append((0, 1, d, 100 + 7 * d))   # linear: slope 7
        rows.append((0, 2, d, 42))            # constant: slope 0
    rows.append((0, 3, 3, 5))                 # single obs
    rows.append((0, 4, 2, -9999))             # nodata only
    plane = spark.createDataFrame(
        rows, "tile_id long, pixel_id long, doy long, value long")
    monkeypatch.setattr(cq, "pixel_plane", lambda s, d: plane)
    got = {r.pixel_id: r for r in cq.c21_pixel_trend(spark, "x").collect()}
    assert got[1].slope == 7.0 and got[1].n_obs == 5
    assert got[2].slope == 0.0
    assert 3 not in got and 4 not in got
    # exact integer moments: num/den are the unreduced closed form
    assert got[1].num / got[1].den == 7.0


def test_gap_fill_interpolates_interior_only(spark, monkeypatch):
    """C22 on a constructed stack: interior gaps interpolate linearly
    between nearest valid neighbors (nodata observations count as
    gaps), boundary gaps are dropped, observed values pass through."""
    import cube_builder_spark.cube_queries as cq
    import cube_builder_spark.pixelplane as pp

    # pixel 1: valid at doy 2 (10) and doy 5 (40); doy 3,4 interior
    # gaps; doy 1 boundary gap; doy 3 is an explicit nodata obs
    rows = [(0, 1, 2, 10), (0, 1, 3, -9999), (0, 1, 5, 40)]
    plane = spark.createDataFrame(
        rows, "tile_id long, pixel_id long, doy long, value long")
    monkeypatch.setattr(cq, "pixel_plane", lambda s, d: plane)
    monkeypatch.setattr(cq, "N_DATES", 5)
    out = {r.doy: r for r in cq.c22_gap_fill(spark, "x").collect()
           if r.pixel_id == 1}
    assert 1 not in out                       # boundary gap dropped
    assert out[2].filled_value == 10.0 and not out[2].is_filled
    assert out[3].filled_value == 20.0 and out[3].is_filled
    assert out[4].filled_value == 30.0 and out[4].is_filled
    assert out[5].filled_value == 40.0 and not out[5].is_filled
    # doys 6.. beyond N_DATES never appear
    assert set(out) == {2, 3, 4, 5}


def test_pixel_anomaly_integer_membership(spark, monkeypatch):
    """C23 on a constructed stack: the |z| >= 2 cut is an exact
    integer test — a stack of nine 10s and one 40 flags only the 40
    (z = 3·sqrt(10)/... > 2), while a mild outlier below the line
    stays out."""
    import cube_builder_spark.cube_queries as cq

    rows = [(0, 1, d, 10) for d in range(1, 10)] + [(0, 1, 10, 40)]
    # pixel 2: tight stack, small wiggle -> no anomalies
    rows += [(0, 2, d, 100 + (d % 2)) for d in range(1, 11)]
    plane = spark.createDataFrame(
        rows, "tile_id long, pixel_id long, doy long, value long")
    monkeypatch.setattr(cq, "pixel_plane", lambda s, d: plane)
    got = cq.c23_pixel_anomaly(spark, "x").collect()
    assert [(r.pixel_id, r.doy, r.value) for r in got] == [(1, 10, 40)]
    z = got[0].z
    # hand check: n=10, sx=130, sxx=2500 -> den=10*2500-16900=8100
    # dev = 10*40-130 = 270 -> z = 270/90 = 3.0 exactly
    assert z == 3.0


def test_temporal_smooth_sg_kernel_exact(spark, monkeypatch):
    """C24 on a constructed stack: the quadratic S-G kernel
    (-3,12,17,12,-3)/35 reproduces a quadratic exactly (that is its
    defining property), only interior points of consecutive-doy valid
    runs emit, and a gap (missing or nodata doy) breaks the run."""
    import cube_builder_spark.cube_queries as cq

    # pixel 1: quadratic v = d*d over doys 1..7 -> smoothing is exact
    rows = [(0, 1, d, d * d) for d in range(1, 8)]
    # pixel 2: doys 1,2,3,5,6,7 (gap at 4): no 5-run anywhere
    rows += [(0, 2, d, 10 * d) for d in (1, 2, 3, 5, 6, 7)]
    # pixel 3: doys 1..5 but doy 3 is nodata: run broken by the filter
    rows += [(0, 3, d, 7) for d in (1, 2, 4, 5)] + [(0, 3, 3, -9999)]
    plane = spark.createDataFrame(
        rows, "tile_id long, pixel_id long, doy long, value long")
    monkeypatch.setattr(cq, "pixel_plane", lambda s, d: plane)
    got = cq.c24_temporal_smooth(spark, "x").collect()
    by_px = {}
    for r in got:
        by_px.setdefault(r.pixel_id, {})[r.doy] = r
    # pixel 1: interior doys 3,4,5 emit; S-G reproduces d^2 exactly
    assert set(by_px[1]) == {3, 4, 5}
    for d in (3, 4, 5):
        assert by_px[1][d].sg_num == 35 * d * d
        assert by_px[1][d].smoothed == float(d * d)
    # pixels 2 and 3 have no full consecutive window
    assert 2 not in by_px and 3 not in by_px
