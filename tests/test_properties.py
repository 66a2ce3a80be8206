"""Property-based tests (hypothesis): timeline algebra invariants,
band-expression parity with numpy, rescale monotonicity, LSH bucket
guard."""

from __future__ import annotations

import datetime

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cube_builder_spark.timeline import (mount_timeline,
                                         temporal_priority_timeline)

SETTINGS = dict(max_examples=40, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])


@given(start_ord=st.integers(737000, 738000),   # ~2018-2021
       span=st.integers(1, 400),
       step=st.integers(1, 60))
@settings(**SETTINGS)
def test_continuous_timeline_invariants(start_ord, span, step):
    start = datetime.date.fromordinal(start_ord)
    end = datetime.date.fromordinal(start_ord + span)
    periods = mount_timeline("continuous", start, end, "day", step)
    assert periods, "non-empty for any valid range"
    for s, e in periods:
        assert s <= e
        assert (e - s).days <= step - 1 or s == e
    # periods are contiguous, ordered, non-overlapping
    for (s1, e1), (s2, e2) in zip(periods, periods[1:]):
        assert s2 == e1 + datetime.timedelta(days=1)
    assert periods[0][0] == start
    assert periods[-1][1] >= end or periods[-1][1] <= end  # clipped tail


@given(doy=st.integers(1, 365),
       n=st.integers(1, 20))
@settings(**SETTINGS)
def test_temporal_priority_is_permutation_and_nearest_first(doy, n):
    base = datetime.date(2020, 1, 1)
    timeline = sorted({(base + datetime.timedelta(days=3 * i)).isoformat()
                       for i in range(n)})
    ordered = temporal_priority_timeline(doy, timeline)
    assert sorted(ordered) == timeline          # permutation
    ref = datetime.date.fromisoformat(timeline[0]) + datetime.timedelta(days=doy - 1)
    dists = [abs((datetime.date.fromisoformat(t) - ref).days) for t in ordered]
    assert dists == sorted(dists)               # nearest first


@given(vals=st.lists(st.tuples(st.integers(-10000, 10000),
                               st.integers(-10000, 10000)),
                     min_size=1, max_size=30))
@settings(**SETTINGS)
def test_band_expression_matches_numpy(spark, vals):
    """C14: the Catalyst-compiled NDVI expression agrees with the numpy
    evaluation the reference would produce (index_generator.py:103-119:
    clamp to dtype then truncate)."""
    from cube_builder_spark.operators.indexes import compile_band_expression
    df = spark.createDataFrame(vals, "B8A long, B04 long")
    col = compile_band_expression("10000. * (B8A - B04) / (B8A + B04)",
                                  ["B8A", "B04"], nodata=-9999.0)
    got = [r.v for r in df.select(col.alias("v")).collect()]
    for (b8a, b04), g in zip(vals, got):
        if b8a == -9999 or b04 == -9999:
            assert g == -9999
        elif b8a + b04 == 0:
            assert g == -9999               # division by zero -> nodata
        else:
            expect = 10000.0 * (b8a - b04) / (b8a + b04)
            expect = int(np.clip(expect, -32768, 32767))  # truncate like astype
            assert g == expect, (b8a, b04, g, expect)


@given(vs=st.lists(st.integers(0, 65535), min_size=1, max_size=30))
@settings(**SETTINGS)
def test_rescale_monotone_and_bounded(spark, vs):
    from pyspark.sql import functions as F

    from cube_builder_spark.operators.rescale import rescale
    df = spark.createDataFrame([(v,) for v in vs], "v long")
    out = df.select("v", rescale(F.col("v"), 0.0000275, new_scale=0.0001,
                                 origin_additive=-0.2, dtype="uint16").alias("r"))
    rows = sorted(((r.v, r.r) for r in out.collect()))
    # bounded by the uint16 clamp / new scale
    assert all(0 <= r <= 655350000 for _, r in rows)
    # monotone non-decreasing in input
    rs = [r for _, r in rows]
    assert rs == sorted(rs)


def test_lsh_bucket_cap_drops_degenerate_bucket(spark):
    from cube_builder_spark.functions.dedup import lsh_candidate_pairs
    # 5 docs share signature h0 (degenerate), 2 docs share a small one
    rows = [(i, "big", f"u{i}") for i in range(5)] + \
           [(10, "sml", "x"), (11, "sml", "x")]
    sig = spark.createDataFrame(rows, "doc_id long, h0 string, h1 string")
    uncapped = lsh_candidate_pairs(sig, [["h0"]]).count()
    assert uncapped == 10 + 1
    capped = lsh_candidate_pairs(sig, [["h0"]], max_bucket=4)
    got = {(r.doc_a, r.doc_b) for r in capped.collect()}
    assert got == {(10, 11)}                    # big bucket dropped
    # the second band still pairs the dropped bucket's members
    both = lsh_candidate_pairs(sig, [["h0"], ["h1"]], max_bucket=4)
    assert (10, 11) in {(r.doc_a, r.doc_b) for r in both.collect()}


# Warp projection properties --------------------------------------------------

_WARP_CRS = [
    "EPSG:3857",
    "EPSG:32722",
    "EPSG:32633",
    ("+proj=aea +lat_0=-12 +lon_0=-54 +lat_1=-2 +lat_2=-22 "
     "+x_0=5000000 +y_0=10000000 +ellps=GRS80"),
]


@given(crs_i=st.integers(0, len(_WARP_CRS) - 1),
       lon_off=st.floats(-4.0, 4.0), lat=st.floats(-55.0, 55.0))
@settings(**SETTINGS)
def test_projection_roundtrip_property(crs_i, lon_off, lat):
    """forward∘inverse == identity (< 1e-8 deg ≈ 1 mm) for any point
    within the projection's valid domain. The tmerc series inverse
    alone is only good to ~1e-8 deg at ±4° off the meridian; the
    Newton-refined inverse (warp._newton_refine) closes that to
    ~1e-12 deg, so the tolerance holds across the whole sampled box."""
    from cube_builder_spark.operators.warp import forward, inverse, parse_crs

    crs = parse_crs(_WARP_CRS[crs_i])
    lon0 = crs.params.get("lon_0", 0.0)
    lon = lon0 + lon_off
    x, y = forward(crs, lon, lat)
    lon2, lat2 = inverse(crs, x, y)
    assert abs(lon2 - lon) < 1e-8 and abs(lat2 - lat) < 1e-8


@given(lon_off=st.floats(-3.0, 3.0), lat=st.floats(-40.0, 5.0),
       d=st.floats(0.001, 0.01))
@settings(**SETTINGS)
def test_albers_preserves_area_property(lon_off, lat, d):
    """The BDC grid projection is EQUAL-AREA: a small lon/lat quad's
    projected area must equal its ellipsoidal area (authalic) to high
    relative accuracy — a library-free oracle for the Albers math."""
    from cube_builder_spark.operators.warp import forward, parse_crs

    crs = parse_crs(_WARP_CRS[3])
    lon = -54.0 + lon_off
    lons = np.array([lon, lon + d, lon + d, lon])
    lats = np.array([lat, lat, lat + d, lat + d])
    x, y = forward(crs, lons, lats)
    # center before the shoelace: the BDC false origin (x_0=5e6,
    # y_0=1e7) makes the raw cross products ~1e14, so a ~1.5e4 m^2
    # quad loses ~0.02 m^2 (1e-6 relative) to double rounding alone
    x, y = x - x.mean(), y - y.mean()
    proj_area = 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))

    # ellipsoidal patch area: integral of M(phi) * N(phi) cos(phi)
    a, e2 = crs.a, crs.e2
    phis = np.radians(np.linspace(lat, lat + d, 65))
    sin = np.sin(phis)
    integrand = (a * (1 - e2) / (1 - e2 * sin ** 2) ** 1.5) * \
        (a / np.sqrt(1 - e2 * sin ** 2)) * np.cos(phis)
    trapz = getattr(np, "trapezoid", np.trapz)
    ell_area = trapz(integrand, phis) * np.radians(d)
    assert abs(proj_area - ell_area) / ell_area < 1e-6
