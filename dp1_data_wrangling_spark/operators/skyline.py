"""2-D Pareto skyline (maximize both dimensions) — exact, one sort.

The classic skyline operator (Börzsönyi et al., ICDE 2001 — "the
skyline of a set of points are those not dominated by any other
point"): a row survives iff no other row is >= in both dimensions and
strictly greater in at least one.  Naive evaluation is the O(n²)
dominance anti-join; in 2-D the frontier falls out of ONE ordered pass
— sort by x, then a point is on the skyline iff its y beats the best y
among all strictly-greater x (and is not beaten within its own x tie
group).  That running-max formulation is pure window algebra, so it
distributes and replays in SQL exactly; the oracle deliberately runs
the INDEPENDENT quadratic NOT-EXISTS form.

Dominance semantics: equal points do NOT dominate each other (both
survive) — strictness in at least one dimension is required, the
standard definition.

Coordinates must be INTEGERS (project/quantize upstream): the
strictly-greater-x window is an integer RANGE frame (x' >= x + 1), and
integer comparisons keep the frontier engine-exact.

Scale posture (100 TB): two shuffles — the group-keyed range window
and the (group, x) tie-max window; payload is (group, x, y, id)
tuples.  Per-group state is that group's row count (the same bound as
any ordered window); there is no join and no candidate blow-up — cost
is O(n log n) per group however adversarial the data.  Skylines over a
single global group serialize that group's sort into one task chain:
pre-aggregate to per-x maxima first (a combinable groupBy) when x
cardinality ≪ n.

Engine extension — the reference (exporter.py:75-141) has no ranking
tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    *,
    x_col: str,
    y_col: str,
    id_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Rows on the Pareto frontier maximizing (x, y), per group.

    Returns ``(*group_cols, id, x, y)``.  NULL coordinates are excluded
    (a point with an unknown dimension neither dominates nor survives).
    """
    groups = group_cols or []
    pts = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        *groups,
        F.col(id_col).alias("id"),
        F.col(x_col).cast("bigint").alias("x"),
        F.col(y_col).cast("bigint").alias("y"),
    )
    # max y among rows with STRICTLY greater x: ascending integer RANGE
    # frame starting at x + 1 (no descending-frame boundary ambiguity)
    w_gt = (
        Window.partitionBy(*[F.col(g) for g in groups])
        .orderBy("x")
        .rangeBetween(1, Window.unboundedFollowing)
    )
    # max y within the same x (a same-x row with greater y dominates)
    w_eq = Window.partitionBy(*[F.col(g) for g in groups], "x")
    out = (
        pts.withColumn("__m_gt", F.max("y").over(w_gt))
        .withColumn("__m_eq", F.max("y").over(w_eq))
        .filter(
            (F.col("__m_gt").isNull() | (F.col("__m_gt") < F.col("y")))
            & (F.col("y") == F.col("__m_eq"))
        )
    )
    return out.select(*groups, "id", "x", "y")
