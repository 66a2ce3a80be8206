"""Seeded randomized differential tests for the round-8 neighborhood
operators: many random cases ride ONE Spark action each (one tile per
case), verified against pure-Python brute-force oracles."""

from __future__ import annotations

import random

from cube_builder_spark.operators.focal import focal_box_stats, focal_majority
from cube_builder_spark.operators.regions import label_regions
from cube_builder_spark.relational import points_in_polygons

H, W = 10, 12


def _random_masks(seed, n_tiles, density=None):
    rnd = random.Random(seed)
    rows = []
    for t in range(n_tiles):
        d = density if density is not None else rnd.choice([0.15, 0.4, 0.7, 0.95])
        for y in range(H):
            for x in range(W):
                if rnd.random() < d:
                    rows.append((t, y, x))
    return rows


def test_focal_box_stats_random_vs_bruteforce(spark):
    rnd = random.Random(11)
    cells = [(t, y, x, rnd.randint(-500, 500))
             for (t, y, x) in _random_masks(7, 12)]
    have = {(r.tile_id, r.y, r.x): (r.n_nbrs, r.sum_nbrs, r.min_nbrs,
                                    r.max_nbrs, r.focal_mean)
            for r in focal_box_stats(
                spark.createDataFrame(cells, ["tile_id", "y", "x", "v"]),
                radius=1, height=H, width=W).collect()}
    vals = {(t, y, x): v for (t, y, x, v) in cells}
    assert set(have) == set(vals)
    for (t, y, x) in vals:
        nb = [vals[(t, y + dy, x + dx)]
              for dy in (-1, 0, 1) for dx in (-1, 0, 1)
              if (t, y + dy, x + dx) in vals]
        assert have[(t, y, x)] == (len(nb), sum(nb), min(nb), max(nb),
                                   sum(nb) / len(nb))


def test_focal_majority_random_vs_bruteforce(spark):
    rnd = random.Random(23)
    cells = [(t, y, x, rnd.randint(0, 3)) for (t, y, x) in _random_masks(5, 12)]
    have = {(r.tile_id, r.y, r.x): (r.maj_class, r.maj_count, r.n_nbrs)
            for r in focal_majority(
                spark.createDataFrame(cells, ["tile_id", "y", "x", "c"]),
                n_classes=4, radius=1, height=H, width=W).collect()}
    vals = {(t, y, x): c for (t, y, x, c) in cells}
    assert set(have) == set(vals)
    for (t, y, x) in vals:
        nb = [vals[(t, y + dy, x + dx)]
              for dy in (-1, 0, 1) for dx in (-1, 0, 1)
              if (t, y + dy, x + dx) in vals]
        best = max(range(4), key=lambda c: (nb.count(c), -c))
        assert have[(t, y, x)] == (best, nb.count(best), len(nb))


def _py_components(coords):
    """Union-find oracle: {(t,y,x): (min_id, size)} under 4-connectivity."""
    parent = {c: c for c in coords}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    s = set(coords)
    for (t, y, x) in coords:
        for n in ((t, y, x + 1), (t, y + 1, x)):
            if n in s:
                ra, rb = find((t, y, x)), find(n)
                if ra != rb:
                    parent[rb] = ra
    groups = {}
    for c in coords:
        groups.setdefault(find(c), []).append(c)
    out = {}
    for members in groups.values():
        rid = min(m[1] * W + m[2] for m in members)
        for m in members:
            out[m] = (rid, len(members))
    return out


def test_label_regions_random_vs_unionfind(spark):
    coords = _random_masks(101, 16)
    have = {(r.tile_id, r.y, r.x): (r.region_id, r.region_size)
            for r in label_regions(
                spark.createDataFrame(coords, ["tile_id", "y", "x"]),
                height=H, width=W).collect()}
    assert have == _py_components(coords)


def test_label_regions_sparse_and_dense_extremes(spark):
    sparse = _random_masks(77, 3, density=0.08)
    dense = [(t + 3, y, x) for (t, y, x) in _random_masks(78, 3, density=1.0)]
    coords = sparse + dense
    have = {(r.tile_id, r.y, r.x): (r.region_id, r.region_size)
            for r in label_regions(
                spark.createDataFrame(coords, ["tile_id", "y", "x"]),
                height=H, width=W).collect()}
    assert have == _py_components(coords)


def _py_pip(px, py, edges):
    cross = 0
    for (x1, y1, x2, y2) in edges:
        if (y1 <= py) != (y2 <= py):
            lhs = (x2 - x1) * (py - y1)
            rhs = (px - x1) * (y2 - y1)
            if (lhs > rhs) if y2 > y1 else (lhs < rhs):
                cross += 1
    return cross % 2 == 1


def test_points_in_polygons_random_vs_python(spark):
    rnd = random.Random(31)
    polys = {}
    edge_rows = []
    for k in range(6):
        nv = rnd.randint(3, 8)
        vs = [(rnd.randint(0, 60), rnd.randint(0, 60)) for _ in range(nv)]
        polys[k] = [(vs[i][0], vs[i][1], vs[(i + 1) % nv][0], vs[(i + 1) % nv][1])
                    for i in range(nv)]
        edge_rows += [(k, *e) for e in polys[k]]
    pts = [(i, rnd.randint(-5, 65), rnd.randint(-5, 65)) for i in range(300)]
    have = {(r.pid, r.k) for r in points_in_polygons(
        spark.createDataFrame(pts, ["pid", "px", "py"]),
        spark.createDataFrame(edge_rows, "k int, x1 int, y1 int, x2 int, y2 int"),
        id_col="pid").collect()}
    want = {(pid, k) for (pid, px, py) in pts for k in polys
            if _py_pip(px, py, polys[k])}
    assert have == want
