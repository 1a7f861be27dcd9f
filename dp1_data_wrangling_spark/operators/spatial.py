"""Planar distance-threshold spatial join (ST_DWithin-class) — exact.

The PostGIS/Sedona workhorse: all pairs of points within radius ``r``,
via uniform grid blocking — NEVER an all-pairs product.  Points carry
INTEGER planar coordinates (projected meters/millimeters — project
before joining, the standard warehouse practice), so containment is the
integer comparison ``dx² + dy² <= r²`` and a DuckDB oracle replays the
join exactly; no floating-point geodesic is involved (cross-engine trig
is not bit-stable, so a haversine variant belongs behind the same
blocking with a documented tolerance, not in the exact tier).

Blocking: cells of side ``r``.  Two points within distance ``r`` are in
the same or 8-adjacent cells (each coordinate differs by < r, so cell
indices differ by at most 1).  One side anchors at its home cell; the
other replicates into its 3x3 neighborhood; the equi-join on cell plus
the exact distance filter is therefore COMPLETE and precise.

Scale posture (100 TB): the probe side replicates 9x as narrow
(cell, id, x, y) tuples — a constant, not a blow-up; the join is ONE
hash equi-join on the cell id, and no dedup pass is needed (for a fixed
anchor cell exactly one probe replicate of any point lands there, so
each qualifying pair is emitted exactly once).  Skew valve: a cell holding k points yields
O(k²) candidate pairs — pick ``r`` (the cell size) against the data's
density, and pre-aggregate ultra-dense cells upstream if the domain
allows (the same hot-bucket discipline as LSH).  Cell ids use exact
integer FLOOR division (see ``_floor_div``): plain ``div`` truncates
toward zero and would fold cells -1 and 0 together, while
``F.floor(x / r)`` goes through a double and misplaces coordinates
beyond 2^53 (ADVICE r8) — subtracting ``pmod`` first keeps both
properties exactly over the full int64 domain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _floor_div(col: str, radius: int) -> Column:
    """Exact BIGINT floor division ``floor(col / radius)``: truncating
    ``div`` adjusted down by one when the (dividend-signed) remainder is
    negative.  Pure int64 arithmetic — correct for negatives, for
    |col| >= 2^53 where a double division would misplace the point into
    a neighboring cell, and free of the INT64_MIN underflow a
    ``col - pmod(col, radius)`` formulation has."""
    return F.expr(
        f"({col} div {radius})"
        f" - (CASE WHEN {col} % {radius} < 0 THEN 1 ELSE 0 END)"
    )


def within_distance_pairs(
    df: DataFrame,
    *,
    x_col: str,
    y_col: str,
    id_col: str,
    radius: int,
) -> DataFrame:
    """All pairs (id_a < id_b) with squared planar distance <= radius².

    Returns (id_a, id_b, dist2).  Coordinates must be integers (cast
    upstream after projecting); NULL coordinates are excluded.
    """
    if radius < 1:
        raise ValueError(f"radius must be a positive integer, got {radius}")
    pts = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        F.col(id_col).alias("__id"),
        F.col(x_col).cast("bigint").alias("__x"),
        F.col(y_col).cast("bigint").alias("__y"),
    )
    cx = _floor_div("__x", radius)
    cy = _floor_div("__y", radius)
    anchor = pts.select(
        "__id", "__x", "__y", cx.alias("__cx"), cy.alias("__cy")
    )
    probe = (
        pts.withColumn("__dx", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .withColumn("__dy", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .select(
            F.col("__id").alias("__id_p"),
            F.col("__x").alias("__x_p"),
            F.col("__y").alias("__y_p"),
            (cx + F.col("__dx")).alias("__cx"),
            (cy + F.col("__dy")).alias("__cy"),
        )
    )
    d2 = (F.col("__x") - F.col("__x_p")) * (F.col("__x") - F.col("__x_p")) + (
        F.col("__y") - F.col("__y_p")
    ) * (F.col("__y") - F.col("__y_p"))
    # no dedup needed: for a fixed anchor cell, exactly ONE of the 9
    # probe replicates of any point lands there (the cell offset is
    # unique), and the id ordering keeps one orientation — each
    # qualifying pair is emitted exactly once
    return (
        anchor.join(probe, ["__cx", "__cy"])
        .filter(F.col("__id") < F.col("__id_p"))
        .withColumn("dist2", d2)
        .filter(F.col("dist2") <= radius * radius)
        .select(
            F.col("__id").alias("id_a"),
            F.col("__id_p").alias("id_b"),
            "dist2",
        )
    )


def knn_within(
    df: DataFrame,
    *,
    x_col: str,
    y_col: str,
    id_col: str,
    radius: int,
    k: int,
) -> DataFrame:
    """Radius-bounded k-nearest-neighbor join: for each point, its ``k``
    nearest OTHER points among those within distance ``radius``, ranked
    by (squared distance, neighbor id) — a total order, so the result is
    partitioning-independent.  Returns (id, rank, neighbor_id, dist2).

    This is the blocked form of the PostGIS ``<->`` / Sedona KNN join
    with an explicit search horizon: bounding the search at ``radius``
    is what keeps the plan ONE grid equi-join (the same complete 3x3
    blocking as :func:`within_distance_pairs`) instead of an iterative
    expanding-ring search.  A point with fewer than ``k`` in-radius
    neighbors returns just those (standard bounded-KNN semantics);
    callers needing guaranteed-k re-run the stragglers at a wider
    radius (documented trade, not hidden work).

    Scale posture (100 TB): candidate generation is identical to the
    distance join (9x narrow replication, one hash equi-join on cell);
    ranking adds ONE window shuffle keyed on the anchor id.  Per-anchor
    state is the candidate list of its 3x3 neighborhood — bounded by
    local density, same skew valve as the distance join.
    """
    if radius < 1:
        raise ValueError(f"radius must be a positive integer, got {radius}")
    if k < 1:
        raise ValueError(f"k must be a positive integer, got {k}")
    from pyspark.sql import Window

    pts = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        F.col(id_col).alias("__id"),
        F.col(x_col).cast("bigint").alias("__x"),
        F.col(y_col).cast("bigint").alias("__y"),
    )
    cx = _floor_div("__x", radius)
    cy = _floor_div("__y", radius)
    anchor = pts.select(
        "__id", "__x", "__y", cx.alias("__cx"), cy.alias("__cy")
    )
    probe = (
        pts.withColumn("__dx", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .withColumn("__dy", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .select(
            F.col("__id").alias("__id_p"),
            F.col("__x").alias("__x_p"),
            F.col("__y").alias("__y_p"),
            (cx + F.col("__dx")).alias("__cx"),
            (cy + F.col("__dy")).alias("__cy"),
        )
    )
    d2 = (F.col("__x") - F.col("__x_p")) * (F.col("__x") - F.col("__x_p")) + (
        F.col("__y") - F.col("__y_p")
    ) * (F.col("__y") - F.col("__y_p"))
    w = Window.partitionBy("__id").orderBy(
        F.col("dist2"), F.col("__id_p")
    )
    return (
        anchor.join(probe, ["__cx", "__cy"])
        .filter(F.col("__id") != F.col("__id_p"))
        .withColumn("dist2", d2)
        .filter(F.col("dist2") <= radius * radius)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__id").alias("id"),
            "rank",
            F.col("__id_p").alias("neighbor_id"),
            "dist2",
        )
    )


def point_in_polygon(
    points: DataFrame,
    polygons: DataFrame,
    *,
    x_col: str,
    y_col: str,
    id_col: str,
    poly_id_col: str,
    vertices_col: str,
    cell_size: int,
    max_cells_per_poly: int = 4096,
) -> DataFrame:
    """Exact point-in-polygon join (ST_Contains / geofencing) via bbox
    grid blocking + integer ray casting.  Returns one row per
    ``(id, poly_id)`` containment with an ``on_boundary`` flag.

    ``polygons`` carries ``vertices_col``: an ``array<struct<x,y>>``
    simple closed ring (last vertex joins back to the first; any
    orientation).  Containment is the even-odd rule, with points ON an
    edge or vertex counted as contained (closed-polygon semantics) —
    detected exactly via a zero cross product plus bbox check, never a
    float epsilon.  The crossing test multiplies out the edge/point
    differences (``(x2-x1)(py-y1) vs (px-x1)(y2-y1)``) instead of
    dividing, so every comparison is exact int64 arithmetic; both inputs
    are guarded to |coordinate| < 2^30 (executor fail-fast), which bounds
    every product by 2^62 — no silent overflow.

    Blocking completeness: a polygon replicates into every grid cell its
    bounding box overlaps; a point lands in its single home cell.  Any
    contained point lies inside the bbox, so its home cell is among the
    polygon's cells — the cell equi-join misses nothing, and because a
    point has exactly ONE home cell each candidate pair is produced
    exactly once (no dedup pass).  Scale posture (100 TB): the join is
    one hash equi-join on the cell id; polygon replication is bounded by
    ``max_cells_per_poly`` (executor fail-fast — size ``cell_size``
    against the fence footprint, the caller-owned skew valve), and the
    ray cast is a row-local JVM fold over the vertex array, zero Python,
    zero extra shuffle.
    """
    if cell_size < 1:
        raise ValueError(f"cell_size must be a positive integer, got {cell_size}")
    if max_cells_per_poly < 1:
        raise ValueError(
            f"max_cells_per_poly must be positive, got {max_cells_per_poly}"
        )
    lim = 1 << 30

    def guard(col: F.Column, what: str) -> F.Column:
        return F.when(
            F.abs(col) >= lim,
            F.expr(
                f"raise_error('point_in_polygon: {what} coordinate "
                f"magnitude must be < 2^30 (exact-arithmetic contract)')"
            ).cast("bigint"),
        ).otherwise(col)

    pts = points.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        F.col(id_col).alias("__pt_id"),
        guard(F.col(x_col).cast("bigint"), "point").alias("__px"),
        guard(F.col(y_col).cast("bigint"), "point").alias("__py"),
    )
    pts = pts.withColumn("__cx", _floor_div("__px", cell_size)).withColumn(
        "__cy", _floor_div("__py", cell_size)
    )

    # All three polygon guards (>= 3 vertices, no NULL coordinate, the
    # |coord| < 2^30 exact-arithmetic contract) are threaded INTO the
    # __verts expression itself: a guard on a side column would be dead
    # code — Catalyst prunes unreferenced columns and the raise_error
    # never fires (found by review; a NULL vertex would otherwise skip
    # its two edges and silently flip even-odd parity).
    polys = polygons.select(
        F.col(poly_id_col).alias("__pg_id"),
        F.expr(
            f"CASE"
            f" WHEN size({vertices_col}) < 3 THEN"
            f"  raise_error('point_in_polygon: a polygon needs >= 3"
            f" vertices')"
            f" WHEN exists({vertices_col},"
            f"  v -> v.x IS NULL OR v.y IS NULL) THEN"
            f"  raise_error('point_in_polygon: polygon vertices must not"
            f" have NULL coordinates')"
            f" WHEN exists({vertices_col},"
            f"  v -> abs(CAST(v.x AS BIGINT)) >= {lim}"
            f"   OR abs(CAST(v.y AS BIGINT)) >= {lim}) THEN"
            f"  raise_error('point_in_polygon: polygon coordinate"
            f" magnitude must be < 2^30 (exact-arithmetic contract)')"
            f" ELSE transform({vertices_col}, v -> named_struct("
            f"'x', CAST(v.x AS BIGINT), 'y', CAST(v.y AS BIGINT)))"
            f" END"
        ).alias("__verts"),
    )
    bounds = {
        "__bx0": "array_min(transform(__verts, v -> v.x))",
        "__bx1": "array_max(transform(__verts, v -> v.x))",
        "__by0": "array_min(transform(__verts, v -> v.y))",
        "__by1": "array_max(transform(__verts, v -> v.y))",
    }
    for name, expr in bounds.items():
        polys = polys.withColumn(name, F.expr(expr))
    for lo, hi, cell in (("__bx0", "__bx1", "__pcx"), ("__by0", "__by1", "__pcy")):
        polys = polys.withColumn(
            cell + "0", _floor_div(lo, cell_size)
        ).withColumn(cell + "1", _floor_div(hi, cell_size))
    cells_guard = (
        (F.col("__pcx1") - F.col("__pcx0") + 1)
        * (F.col("__pcy1") - F.col("__pcy0") + 1)
    )
    # The edge table is precomputed ONCE per polygon row (r13): the ray
    # cast previously folded over vertex INDEXES, re-deriving both
    # element_at endpoint lookups — and the cross product built from
    # them — up to three times per edge, interpreted per candidate pair
    # (higher-order-function lambdas never reach codegen).  Measured
    # 0.28s -> 0.23s on the fold stage at sf0.1 (mild; the per-edge op
    # count is what shrinks), identical integer results.  NOTE the
    # bigger hazard this shape guards against: every __px/__py
    # REFERENCE in the fold is substituted with the caller's full x/y
    # expression when the input is a raw projection (CollapseProject),
    # so expensive derived coordinates must be cut (checkpoint) by the
    # caller — see q_events_geofence (1.6s -> 0.5s from that fix alone).
    v1 = "element_at(__verts, i + 1)"
    v2 = (
        "element_at(__verts, CASE WHEN i = size(__verts) - 1 "
        "THEN 1 ELSE i + 2 END)"
    )
    polys = polys.withColumn(
        "__edges",
        F.expr(
            f"transform(sequence(0, size(__verts) - 1), i -> named_struct("
            f"'x1', {v1}.x, 'y1', {v1}.y, 'x2', {v2}.x, 'y2', {v2}.y))"
        ),
    )
    poly_cells = (
        polys.withColumn(
            "__ncells",
            F.when(
                cells_guard > max_cells_per_poly,
                F.expr(
                    f"raise_error(concat('point_in_polygon: polygon bbox "
                    f"covers more than {max_cells_per_poly} grid cells — "
                    f"raise cell_size or max_cells_per_poly'))"
                ).cast("bigint"),
            ).otherwise(cells_guard),
        )
        .filter(F.col("__ncells") > 0)
        .withColumn("__cx", F.explode(F.expr("sequence(__pcx0, __pcx1)")))
        .withColumn("__cy", F.explode(F.expr("sequence(__pcy0, __pcy1)")))
        .select("__pg_id", "__edges", "__cx", "__cy")
    )

    # row-local even-odd ray cast: per edge, evaluate the cross product
    # and the crossing/on-edge booleans EXACTLY ONCE (inner transform),
    # then fold the per-edge records — counting half-open upward/downward
    # crossings strictly left of the point via the sign of the cross
    # product, and OR-ing exact on-edge hits; all int64, no division.
    crs = "((t.x2 - t.x1) * (__py - t.y1) - (__px - t.x1) * (t.y2 - t.y1))"
    fold = f"""
    aggregate(
        transform(__edges, t -> named_struct(
            'crossed', ((t.y1 > __py) != (t.y2 > __py)),
            'up', t.y2 > t.y1,
            'crs', {crs},
            'inbox', __px >= least(t.x1, t.x2) AND __px <= greatest(t.x1, t.x2)
                 AND __py >= least(t.y1, t.y2) AND __py <= greatest(t.y1, t.y2))),
        named_struct('c', 0, 'b', false),
        (acc, t) -> named_struct(
            'c', acc.c + CASE WHEN t.crossed
                AND (CASE WHEN t.up THEN t.crs > 0 ELSE t.crs < 0 END)
                THEN 1 ELSE 0 END,
            'b', acc.b OR (t.crs = 0 AND t.inbox)
        ),
        acc -> acc
    )
    """
    cast = (
        pts.join(poly_cells, ["__cx", "__cy"])
        .withColumn("__hit", F.expr(fold))
        .filter((F.col("__hit.c") % 2 == 1) | F.col("__hit.b"))
    )
    return cast.select(
        F.col("__pt_id").alias("id"),
        F.col("__pg_id").alias("poly_id"),
        F.col("__hit.b").alias("on_boundary"),
    )


def grid_hotspots(
    points: DataFrame,
    *,
    x_col: str,
    y_col: str,
    cell: int,
    min_count: int = 1,
) -> DataFrame:
    """Grid-cell hotspot screen — per-cell density vs its 3x3 Moore
    neighborhood, the Getis-Ord-class local concentration statistic
    reduced to exact integers:

        concentration_milli = (9000 * n) div n_neigh

    (9x the cell's share of its neighborhood total, in milli — 1000
    means the cell holds exactly its uniform share; 9000 means the
    whole neighborhood's mass sits in this one cell).

    Integer coordinates bucket by TRUE floor division (the module's
    ``_floor_div`` — plain ``div`` truncates toward zero and would
    merge the cells either side of the origin for signed coordinates,
    diverging from a ``//``-flooring oracle); empty cells contribute
    zero and never emit.  Returns one row per occupied cell with at
    least ``min_count`` points: ``(cell_x, cell_y, n, n_neigh,
    concentration_milli)``.

    Scale posture (100 TB): ONE map-side-combinable census groupBy over
    the points; the stencil runs on the CENSUS (each census row
    explodes to its 9 neighbor targets — 9 x cells rows, never 9 x
    points), one more combinable groupBy, and a cell-keyed equi-join of
    two aggregate-sized frames.  No window, no self-join on points, no
    cartesian (plan-gated).
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    census = grid_cells(points, x_col=x_col, y_col=y_col, cell=cell).groupBy(
        "cell_x", "cell_y"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return hotspots_from_census(census, min_count=min_count)


def grid_cells(
    points: DataFrame, *, x_col: str, y_col: str, cell: int
) -> DataFrame:
    """The shared cell projection (r12 split — one definition for the
    batch screen, the streaming census maintainer and every oracle):
    integer coordinates floor-divided into grid cells.  TRUE floor
    division (``_floor_div``) — plain ``div`` truncates toward zero and
    would merge the cells either side of the origin for signed
    coordinates."""
    if cell < 1:
        raise ValueError(f"cell must be >= 1, got {cell}")
    return points.select(
        F.col(x_col).cast("bigint").alias("__gx"),
        F.col(y_col).cast("bigint").alias("__gy"),
    ).select(
        _floor_div("__gx", cell).alias("cell_x"),
        _floor_div("__gy", cell).alias("cell_y"),
    )


def hotspots_from_census(
    census: DataFrame, *, min_count: int = 1, count_col: str = "n"
) -> DataFrame:
    """The Moore-stencil fold of :func:`grid_hotspots` given the cell
    census — the shared core a STREAM folds at read time (cell counts
    are associative, so ``streaming.census.stream_census`` maintains
    the census exactly-once and this fold re-derives every hotspot,
    late data included).  ``census`` holds one row per occupied cell
    with a positive count."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    c = census.select(
        "cell_x", "cell_y", F.col(count_col).cast("bigint").alias("n")
    )
    offsets = F.expr(
        "explode(array(" + ", ".join(
            f"struct({dx}L as dx, {dy}L as dy)"
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ) + "))"
    )
    neigh = (
        c.select("cell_x", "cell_y", "n", offsets.alias("__o"))
        .select(
            (F.col("cell_x") + F.col("__o.dx")).alias("cell_x"),
            (F.col("cell_y") + F.col("__o.dy")).alias("cell_y"),
            "n",
        )
        .groupBy("cell_x", "cell_y")
        .agg(F.sum("n").alias("n_neigh"))
    )
    return (
        c.join(neigh, ["cell_x", "cell_y"])
        .filter(F.col("n") >= F.lit(min_count))
        .select(
            "cell_x",
            "cell_y",
            "n",
            "n_neigh",
            # n_neigh >= n >= 1 on every emitted row: never div-by-zero
            F.expr("(9000 * n) div n_neigh").alias("concentration_milli"),
        )
    )
