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
