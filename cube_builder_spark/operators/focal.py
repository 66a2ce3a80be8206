"""Focal (neighborhood) raster operators over a relational cell plane.

Beyond-reference surface in the C21–C27 family: the reference's raster
ops are all per-pixel or per-stack (``processing.py`` blends,
``image.py`` masks); the standard EO post-processing steps it leaves to
GDAL/QGIS — focal box statistics (smoothing), focal majority (the
sieve/mode filter applied to classification masks), focal median
(salt-and-pepper despeckle, deterministic lower-median), focal
gradients (Horn/``gdaldem slope`` Sobel gx/gy), and overview
pyramids (``gdaladdo``; the reference only builds them inside COG files,
``image.py:309-331``) — are implemented here as relational operators
over a ``(tile_id, y, x, value)`` cell plane.

Distributed shape — the halo-exchange problem. A 3×3 focal op needs
each cell's 8 neighbors; when the plane is block-partitioned, border
cells need data from adjacent partitions. The classic raster answer is
to ship 1-pixel halos between workers. The relational answer used here
is SCATTER: each cell emits one contribution row per neighborhood it
belongs to (9 for a 3×3 kernel), and one groupBy on the *target* cell
reduces them. Spark's map-side partial aggregation collapses the 9×
fan-out within each partition before the exchange, so the shuffle
carries ≈ one partially-reduced row per (target cell touched by the
partition) — the interior of a block never leaves it pre-reduced, and
only border contributions cross partitions. That IS the halo exchange,
expressed declaratively so Catalyst/AQE plan it.

Edge semantics are "valid-neighbors only": statistics divide by the
count of neighbors that exist (image edges and nodata holes shrink the
kernel), matching GDAL's ``-ot`` focal behavior rather than
zero-padding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["focal_box_stats", "focal_majority", "focal_median",
           "focal_gradients", "pyramid_levels", "flow_direction",
           "flow_accumulation", "min_distance_transform"]


def _scatter(cells: DataFrame, radius: int, height: int | None,
             width: int | None, payload: list[str]) -> DataFrame:
    """Emit one row per (cell, neighborhood-it-contributes-to).

    Returns columns ``tile_id, ty, tx, <payload...>`` where (ty, tx)
    is the *center* of a neighborhood this cell belongs to. Bounds
    clipping (when height/width given) drops contributions whose
    target center is off-raster before they reach the shuffle.
    """
    offsets = F.array(*[
        F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
        for dy in range(-radius, radius + 1)
        for dx in range(-radius, radius + 1)])
    payload = [p for p in payload if p not in ("o_dy", "o_dx")]
    out = (cells
           .select("tile_id", "y", "x", *payload,
                   F.explode(offsets).alias("o"))
           .select(F.col("tile_id").alias("t_id"),
                   (F.col("y") + F.col("o.dy")).alias("ty"),
                   (F.col("x") + F.col("o.dx")).alias("tx"),
                   F.col("o.dy").alias("o_dy"),
                   F.col("o.dx").alias("o_dx"),
                   *payload))
    if height is not None:
        out = out.filter((F.col("ty") >= 0) & (F.col("ty") < height))
    if width is not None:
        out = out.filter((F.col("tx") >= 0) & (F.col("tx") < width))
    return out


def focal_box_stats(cells: DataFrame, radius: int = 1,
                    height: int | None = None,
                    width: int | None = None) -> DataFrame:
    """(2r+1)×(2r+1) edge-aware focal count/sum/min/max/mean.

    ``cells``: one row per existing cell — ``tile_id, y, x, v``
    (int64 v). Cells absent from the input (nodata holes, off-edge)
    simply don't contribute, and only existing cells are emitted as
    centers (inner join-back), so the output key set equals the input
    key set.

    Plan: scatter → groupBy(tile, ty, tx) with map-side combine →
    join back on the aggregation key (co-partitioned — the join keys
    equal the groupBy keys, so the agg side needs no new Exchange).
    All integer arithmetic; the mean is one IEEE division.
    """
    agg = (_scatter(cells, radius, height, width, ["v"])
           .groupBy("t_id", "ty", "tx")
           .agg(F.count(F.lit(1)).cast("long").alias("n_nbrs"),
                F.sum("v").cast("long").alias("sum_nbrs"),
                F.min("v").cast("long").alias("min_nbrs"),
                F.max("v").cast("long").alias("max_nbrs")))
    return (cells.join(agg, (F.col("tile_id") == F.col("t_id"))
                       & (F.col("y") == F.col("ty")) & (F.col("x") == F.col("tx")))
            .select("tile_id", "y", "x",
                    "n_nbrs", "sum_nbrs", "min_nbrs", "max_nbrs",
                    (F.col("sum_nbrs") * 1e0 / F.col("n_nbrs"))
                    .alias("focal_mean")))


def focal_majority(cells: DataFrame, n_classes: int, radius: int = 1,
                   height: int | None = None,
                   width: int | None = None) -> DataFrame:
    """(2r+1)×(2r+1) focal majority (mode) of a small class code —
    the sieve filter run on classification/quality masks.

    ``cells``: ``tile_id, y, x, c`` with ``c`` ∈ [0, n_classes).
    Ties break toward the SMALLER class code (deterministic): the
    per-class count is packed as ``cnt * n_classes + (n_classes-1-c)``
    and a plain MAX picks (count desc, class asc) — the same
    packed-argmax idiom as the mosaic kernel (mosaic.py), so the
    aggregate stays a codegen HashAggregate.

    Two-stage reduction: scatter → count per (cell, class) — the
    map-side-combinable part — then argmax over ≤ n_classes rows per
    cell. At 100 TB the first groupBy carries the volume and combines
    within partitions; the second reduces ≤ n_classes rows/cell.
    """
    per_class = (_scatter(cells, radius, height, width, ["c"])
                 .groupBy("t_id", "ty", "tx", "c")
                 .agg(F.count(F.lit(1)).alias("cnt")))
    packed = (F.col("cnt") * n_classes
              + (F.lit(n_classes - 1) - F.col("c")))
    pick = (per_class
            .groupBy("t_id", "ty", "tx")
            .agg(F.max(packed).alias("pk"),
                 F.sum("cnt").cast("long").alias("n_nbrs")))
    return (cells.join(pick, (F.col("tile_id") == F.col("t_id"))
                       & (F.col("y") == F.col("ty")) & (F.col("x") == F.col("tx")))
            .select("tile_id", "y", "x",
                    (F.lit(n_classes - 1) - F.col("pk") % n_classes)
                    .cast("long").alias("maj_class"),
                    (F.col("pk") / n_classes).cast("long").alias("maj_count"),
                    "n_nbrs"))


def focal_median(cells: DataFrame, radius: int = 1,
                 height: int | None = None,
                 width: int | None = None) -> DataFrame:
    """(2r+1)×(2r+1) focal MEDIAN — the salt-and-pepper despeckle
    filter. Deterministic LOWER-median rule: element ⌈n/2⌉ of the
    sorted existing-neighbor values (identical in both engines for
    even counts, where a mean-of-middle-two definition would go
    float). Values collect into a ≤(2r+1)²-bounded array per target
    cell — sort_array + element_at inside codegen, no window sort
    over the scatter volume. Same edge-aware existence semantics as
    focal_box_stats."""
    agg = (_scatter(cells, radius, height, width, ["v"])
           .groupBy("t_id", "ty", "tx")
           .agg(F.sort_array(F.collect_list("v")).alias("vs")))
    n = F.size("vs")
    return (cells.join(agg, (F.col("tile_id") == F.col("t_id"))
                       & (F.col("y") == F.col("ty")) & (F.col("x") == F.col("tx")))
            .select("tile_id", "y", "x",
                    F.element_at("vs", ((n + 1) / 2).cast("int"))
                    .cast("long").alias("median_v"),
                    n.cast("long").alias("n_nbrs")))


def focal_gradients(cells: DataFrame, height: int | None = None,
                    width: int | None = None) -> DataFrame:
    """Horn 3×3 gradient kernels (gdaldem slope's core, Horn 1981):
    per cell with a COMPLETE 3×3 neighborhood, the Sobel-weighted
    finite differences gx = Σ rx·(2−|ry|)·v and gy = Σ ry·(2−|rx|)·v
    over neighbors at relative offset (ry, rx), plus
    ``slope_sq = (gx² + gy²) / 64`` (cell size 1) — the slope
    magnitude squared BEFORE the atan, so everything except one IEEE
    division stays in exact int64 (libm atan is not bit-portable
    across engines; callers apply it presentation-side).

    Edge cells and cells bordering nodata holes are NOT emitted
    (n < 9), matching gdaldem's edge behavior. Same scatter/partial-
    aggregate halo exchange as focal_box_stats.
    """
    sc = _scatter(cells, 1, height, width, ["v"])
    # source relative to the TARGET center is (-dy, -dx)
    rx = -F.col("o_dx")
    ry = -F.col("o_dy")
    agg = (sc.groupBy("t_id", "ty", "tx")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum((rx * (F.lit(2) - F.abs(ry))) * F.col("v"))
                .cast("long").alias("gx"),
                F.sum((ry * (F.lit(2) - F.abs(rx))) * F.col("v"))
                .cast("long").alias("gy"))
           .filter(F.col("n") == 9))
    return (cells.join(agg, (F.col("tile_id") == F.col("t_id"))
                       & (F.col("y") == F.col("ty")) & (F.col("x") == F.col("tx")))
            .select("tile_id", "y", "x", "gx", "gy",
                    ((F.col("gx") * F.col("gx") + F.col("gy") * F.col("gy"))
                     * 1e0 / 64).alias("slope_sq")))


def min_distance_transform(cells: DataFrame, radius: int,
                           height: int | None = None,
                           width: int | None = None,
                           sentinel: int | None = None) -> DataFrame:
    """Bounded-radius squared-Euclidean distance transform: for every
    cell, the min of dy²+dx² to a SOURCE cell (``src`` boolean column,
    e.g. the cloud class of a mask plane) within Chebyshev radius r —
    the kernel of mask dilation / cloud-buffer products (Fmask's
    cloud-dilation step; the reference consumes the already-dilated QA
    bits, masking.py). A source cell itself gets 0; cells with no
    source within r get ``sentinel`` (default (2r+1)², strictly above
    any reachable d² = 2r²).

    ``cells``: one row per cell — ``tile_id, y, x, src`` plus any
    passenger columns, all preserved in the output next to ``dist2``.

    Plan: only SOURCE cells scatter ((2r+1)² bounded contribution rows
    each, min-combined map-side), one groupBy on the target cell, one
    LEFT join back onto the full plane — never a range join, never a
    per-cell window. At 100 TB the scatter volume is 49×|sources| for
    r=3 and collapses inside each partition before the exchange, the
    same halo-exchange shape as every op in this module.
    """
    if sentinel is None:
        sentinel = (2 * radius + 1) ** 2
    d2 = (F.col("o_dy") * F.col("o_dy") + F.col("o_dx") * F.col("o_dx"))
    agg = (_scatter(cells.filter(F.col("src")), radius, height, width, [])
           .groupBy("t_id", "ty", "tx")
           .agg(F.min(d2).cast("long").alias("d2")))
    passengers = [c for c in cells.columns if c != "src"]
    return (cells.join(agg, (F.col("tile_id") == F.col("t_id"))
                       & (F.col("y") == F.col("ty")) & (F.col("x") == F.col("tx")),
                       "left")
            .select(*passengers,
                    F.coalesce(F.col("d2"), F.lit(sentinel))
                    .cast("long").alias("dist2")))


def pyramid_levels(cells: DataFrame, n_levels: int = 2) -> DataFrame:
    """Overview pyramid: 2×2 block-aggregate cascade over a cell plane
    (``tile_id, y, x, v``), levels 1..n_levels.

    Level L cell (Y, X) covers base cells (y, x) with y // 2**L == Y
    and x // 2**L == X; emits exact int64 ``n_pixels``/``sum_value``
    plus the IEEE mean. Built as a CASCADE — level L+1 aggregates
    level L's (n, sum) pairs, not the base plane — so total work is
    O(N · (1 + 1/4 + 1/16 + …)) = O(N), the gdaladdo recurrence.
    Each level's groupBy key is a projection of the previous level's
    key, so every stage is map-side combinable. (In production each
    level is also WRITTEN before deriving the next — the reference
    stores them as COG overview IFDs, image.py:309-331; here the
    plans are tiny and recomputation is cheaper than a cache pin.)
    """
    level = (cells.groupBy(
                "tile_id",
                F.floor(F.col("y") / 2).cast("long").alias("y"),
                F.floor(F.col("x") / 2).cast("long").alias("x"))
             .agg(F.count(F.lit(1)).cast("long").alias("n_pixels"),
                  F.sum("v").cast("long").alias("sum_value")))
    out = None
    for lv in range(1, n_levels + 1):
        tagged = level.select(
            F.lit(lv).cast("long").alias("level"), "tile_id",
            F.col("y").alias("cell_y"), F.col("x").alias("cell_x"),
            "n_pixels", "sum_value",
            (F.col("sum_value") * 1e0 / F.col("n_pixels")).alias("mean_value"))
        out = tagged if out is None else out.unionByName(tagged)
        if lv < n_levels:
            level = (level.groupBy(
                        "tile_id",
                        F.floor(F.col("y") / 2).cast("long").alias("y"),
                        F.floor(F.col("x") / 2).cast("long").alias("x"))
                     .agg(F.sum("n_pixels").cast("long").alias("n_pixels"),
                          F.sum("sum_value").cast("long").alias("sum_value")))
    return out


# D8 direction encoding: index 1..8 over the fixed (dy, dx) ring below;
# 0 = sink (no strictly-lower neighbor). w = squared-distance weight
# numerator: steepest descent maximizes drop/dist with dist in {1,√2},
# and comparing drop_a²·db² vs drop_b²·da² keeps it exact-integer —
# equivalently metric = drop² · w with w = 2 (orthogonal) / 1 (diagonal).
D8_OFFSETS = [
    (1, -1, -1, 1), (2, -1, 0, 2), (3, -1, 1, 1),
    (4, 0, -1, 2), (5, 0, 1, 2),
    (6, 1, -1, 1), (7, 1, 0, 2), (8, 1, 1, 1),
]


def flow_direction(cells: DataFrame, height: int | None = None,
                   width: int | None = None) -> DataFrame:
    """D8 steepest-descent flow direction (O'Callaghan & Mark 1984;
    ``gdaldem``/hydrology's first routing step — another post-
    processing stage the reference leaves outside its pipeline).

    Per cell: among EXISTING strictly-lower 8-neighbors, pick the one
    maximizing drop/distance. Exact integers throughout: the √2
    diagonal distance is handled by cross-multiplied squares
    (metric = drop²·w, w = 2 orthogonal / 1 diagonal), ties break
    toward the smaller direction index via the packed-argmax idiom
    (``metric·16 + (8 − dir)``). Cells with no lower existing
    neighbor (pits, flats, nodata borders) get ``fdir = 0``.

    Plan: ONE scatter + ONE map-side-combined groupBy — the center's
    own (0,0) contribution rides the same shuffle as its neighbors,
    so no join-back at all: the aggregate keeps the center value with
    ``max(CASE center)`` and the ≤8 neighbor (dir, v) pairs in a
    bounded collect_list, and the argmax is an in-array fold over ≤8
    elements in codegen. Returns ``tile_id, y, x, v, fdir``.
    """
    sc = _scatter(cells, 1, height, width, ["v"])
    is_center = (F.col("o_dy") == 0) & (F.col("o_dx") == 0)
    # direction FROM the target TO this contributor is (-o_dy, -o_dx)
    dir_idx = None
    wgt = None
    for d, dy, dx, w in D8_OFFSETS:
        hit = (F.col("o_dy") == -dy) & (F.col("o_dx") == -dx)
        dir_idx = F.when(hit, d) if dir_idx is None else dir_idx.when(hit, d)
        wgt = F.when(hit, w) if wgt is None else wgt.when(hit, w)
    agg = (sc.groupBy("t_id", "ty", "tx")
           .agg(F.max(F.when(is_center, F.col("v"))).alias("vc"),
                F.collect_list(
                    F.when(~is_center,
                           F.struct(dir_idx.cast("long").alias("d"),
                                    wgt.cast("long").alias("w"),
                                    F.col("v").alias("nv"))))
                .alias("nbrs"))
           .filter(F.col("vc").isNotNull()))
    packed = F.array_max(F.transform(
        F.filter("nbrs", lambda n: n["nv"] < F.col("vc")),
        lambda n: ((F.col("vc") - n["nv"]) * (F.col("vc") - n["nv"])
                   * n["w"] * 16 + (8 - n["d"]))))
    return (agg
            .withColumn("pk", packed)
            .select(F.col("t_id").alias("tile_id"),
                    F.col("ty").alias("y"), F.col("tx").alias("x"),
                    F.col("vc").alias("v"),
                    F.when(F.col("pk").isNull(), F.lit(0))
                    .otherwise(8 - F.col("pk") % 16)
                    .cast("long").alias("fdir")))


def flow_accumulation(dirs: DataFrame, max_rounds: int = 600) -> DataFrame:
    """D8 flow accumulation: for each cell, the number of cells whose
    flow path (repeatedly following ``fdir``) passes through it,
    including itself — the upstream contributing area, the statistic
    stream-network extraction thresholds on.

    The flow graph is a functional forest (one out-edge per non-sink
    cell) over STRICTLY decreasing values, so it is acyclic and every
    walk terminates. Implementation is an anonymous-walker fold: the
    frontier holds (position, n_walkers) — compressed to at most one
    row per cell per round, never one row per (source, position) pair
    — each round advances it along the out-edges (an equi-join with
    the functional edge set, 1:1 per walker row) and folds it into
    the visit counts. Rounds are bounded by the longest descending
    chain (terrain relief, not grid size; localCheckpoint per round
    truncates lineage exactly like the CCL operator). Total joined
    rows equal the sum of path lengths — the size of the information
    the statistic needs — so the loop is output-optimal; a
    pointer-doubling variant would reduce ROUNDS to log(L) but not
    that total, at the cost of materializing 2^k-step jump tables.

    Returns ``tile_id, y, x, acc``.
    """
    ddy = None
    ddx = None
    for d, dy, dx, _w in D8_OFFSETS:
        ddy = F.when(F.col("fdir") == d, dy) if ddy is None \
            else ddy.when(F.col("fdir") == d, dy)
        ddx = F.when(F.col("fdir") == d, dx) if ddx is None \
            else ddx.when(F.col("fdir") == d, dx)
    edges = (dirs.filter(F.col("fdir") > 0)
             .select("tile_id", "y", "x",
                     (F.col("y") + ddy).alias("ny"),
                     (F.col("x") + ddx).alias("nx"))
             .localCheckpoint(eager=True))
    acc_parts = [dirs.select("tile_id", "y", "x",
                             F.lit(1).cast("long").alias("cnt"))]
    # LAZY checkpoint + count (r14): the count both materializes the
    # checkpoint AND answers the emptiness probe in ONE job — the
    # eager-checkpoint + limit(1).count() form paid two jobs per
    # round for the same information
    frontier = (edges.groupBy("tile_id",
                              F.col("ny").alias("y"),
                              F.col("nx").alias("x"))
                .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
                .localCheckpoint(eager=False))
    rounds = 0
    while frontier.count() > 0:
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(
                f"flow_accumulation exceeded {max_rounds} rounds — "
                "cyclic fdir input?")
        acc_parts.append(frontier)
        frontier = (frontier
                    .join(edges, ["tile_id", "y", "x"])
                    .groupBy("tile_id",
                             F.col("ny").alias("y"),
                             F.col("nx").alias("x"))
                    .agg(F.sum("cnt").cast("long").alias("cnt"))
                    .localCheckpoint(eager=False))
    out = acc_parts[0]
    for part in acc_parts[1:]:
        out = out.unionByName(part)
    return (out.groupBy("tile_id", "y", "x")
            .agg(F.sum("cnt").cast("long").alias("acc")))
