"""Randomized differentials for the spatial-statistics kernels
(c47 Moran's I / c48 Getis-Ord Gi* / c49 local Moran) — round-14
verdict item #7: the focal plane's planted-pattern tests prove known
signs; these prove the EXACT integer algebra on arbitrary sparse
grids against a brute-force pure-python reference (the
test_semivariogram_hypothesis_random_grids discipline, extended to
the whole c47–c50 family).

All three kernels share the scatter/equi-join adjacency, so the
reference walks the same rook neighborhoods naively; every integer
column must match exactly and every float column to 1e-12."""

from __future__ import annotations

import math
import random

from cube_builder_spark.cube_queries import (
    _GRID_W, getis_ord_cells, local_moran_cells, morans_i_cells)


def _random_tiles(seed: int, n_tiles: int = 14):
    """Sparse random grids: random extent, density, value range —
    including degenerate shapes (single cell, constant tile, full
    grid) the kernels must exclude or handle."""
    rng = random.Random(seed)
    tiles = {}
    for i in range(n_tiles):
        h, w = rng.randint(1, 6), rng.randint(1, 7)
        density = rng.choice([0.3, 0.6, 1.0])
        lo, hi = sorted(rng.sample(range(-60, 61), 2))
        if i == 0:
            grid = {(0, 0): 5}                       # single cell
        elif i == 1:
            grid = {(y, x): 7 for y in range(3) for x in range(3)}
        else:
            grid = {(y, x): rng.randint(lo, hi)
                    for y in range(h) for x in range(w)
                    if rng.random() < density}
        if grid:
            tiles[f"t{i}"] = grid
    return tiles


def _cells_df(spark, tiles):
    rows = [(t, y, x, v) for t, g in tiles.items()
            for (y, x), v in g.items()]
    return spark.createDataFrame(
        rows, "tile_id string, y long, x long, v long")


def _rook(grid, y, x):
    return [grid[p] for p in ((y, x + 1), (y, x - 1), (y + 1, x),
                              (y - 1, x)) if p in grid]


def test_morans_i_random_vs_bruteforce(spark):
    tiles = _random_tiles(seed=1401)
    got = {r.tile_id: r for r in
           morans_i_cells(_cells_df(spark, tiles)).collect()}
    want_tiles = set()
    for t, grid in tiles.items():
        n, s = len(grid), sum(grid.values())
        zc = {p: n * v - s for p, v in grid.items()}
        ss = sum(z * z for z in zc.values())
        if ss == 0:
            assert t not in got        # constant tile excluded
            continue
        cross = wp = 0
        for (y, x), za in zc.items():
            for zb in _rook(zc, y, x):
                cross += za * zb
                wp += 1
        if wp == 0:
            # no adjacency at all -> no pairs row survives the join
            assert t not in got
            continue
        want_tiles.add(t)
        r = got[t]
        assert (r.n_cells, r.w_pairs, r.cross_zc, r.ss_zc) == \
            (n, wp, cross, ss), t
        assert math.isclose(r.morans_i, cross / ss * n / wp,
                            rel_tol=1e-12), t
    assert set(got) == want_tiles


def test_getis_ord_random_vs_bruteforce(spark):
    tiles = _random_tiles(seed=1402)
    got = {(r.tile_id, r.pixel_id): r for r in
           getis_ord_cells(_cells_df(spark, tiles)).collect()}
    want_keys = set()
    for t, grid in tiles.items():
        n, s = len(grid), sum(grid.values())
        ssq = sum(v * v for v in grid.values())
        for (y, x), v in grid.items():
            nbrs = _rook(grid, y, x) + [v]            # plus-self
            wi, sum_nbr = len(nbrs), sum(nbrs)
            if not (n > 1 and n * ssq > s * s and wi < n):
                assert (t, y * _GRID_W + x) not in got
                continue
            key = (t, y * _GRID_W + x)
            want_keys.add(key)
            r = got[key]
            num = n * sum_nbr - wi * s
            assert (r.wi, r.sum_nbr, r.gi_num) == (wi, sum_nbr, num), key
            den = math.sqrt((n * ssq - s * s) * (n * wi - wi * wi)
                            / (n - 1))
            assert math.isclose(r.gi_z, num / den, rel_tol=1e-12), key
    assert set(got) == want_keys


def test_local_moran_random_vs_bruteforce(spark):
    tiles = _random_tiles(seed=1403)
    got = {(r.tile_id, r.pixel_id): r for r in
           local_moran_cells(_cells_df(spark, tiles)).collect()}
    want_keys = set()
    for t, grid in tiles.items():
        n, s = len(grid), sum(grid.values())
        zc = {p: n * v - s for p, v in grid.items()}
        ss = sum(z * z for z in zc.values())
        for (y, x), z in zc.items():
            nbrs = _rook(zc, y, x)
            key = (t, y * _GRID_W + x)
            if ss == 0 or not nbrs:    # constant tile / isolated cell
                assert key not in got
                continue
            want_keys.add(key)
            wi, lag = len(nbrs), sum(nbrs)
            r = got[key]
            assert (r.wi, r.zc, r.lag_zc) == (wi, z, lag), key
            assert (r.lisa_num, r.lisa_den) == (n * z * lag, wi * ss), key
            assert math.isclose(r.lisa_i, (n * z * lag) / (wi * ss),
                                rel_tol=1e-12), key
            quad = ("HH" if z >= 0 and lag >= 0 else
                    "LL" if z < 0 and lag < 0 else
                    "HL" if z >= 0 else "LH")
            assert r.quadrant == quad, key
    assert set(got) == want_keys
