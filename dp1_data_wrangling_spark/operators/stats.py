"""Exact-integer descriptive statistics: per-group OLS trend.

Simple linear regression (slope of y on x) computed entirely in exact
integer arithmetic so a SQL oracle replays it bit-for-bit: the five
classic sufficient statistics (n, Σx, Σy, Σxy, Σx²) are associative
sums, and the slope is emitted as an exact milli-ratio

    slope_milli = trunc( 1000·(n·Σxy − Σx·Σy) / (n·Σx² − Σx²) )

TRUNCATING division toward zero on both sides: Spark ``div`` and
DuckDB integer ``//`` both truncate (verified: ``-7 // 2 = -3`` in
DuckDB), so falling trends replay exactly.  The Spark side uses the
self-mod identity ``trunc(a/b) = (a − a % b) / b`` (both engines give
``%`` the dividend's sign) so the final division is exact under
DECIMAL(38,0) — no float, no rounding mode, no engine divergence.

Engine extension — the reference has no statistics tier.

Scale posture (100 TB): one combinable groupBy — every sufficient
statistic partial-aggregates map-side, so the shuffle carries one row
of five DECIMAL(38,0) sums per group.  Sums run in DECIMAL(38,0)
(not BIGINT) so 10¹⁸-scale inputs cannot silently wrap under
non-ANSI semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_D = "decimal(38,0)"


def linear_trend(
    df: DataFrame,
    *,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
    scale: int = 1000,
) -> DataFrame:
    """Per-group OLS slope of integer ``y_col`` on integer ``x_col``.

    Returns one row per group: ``n`` (BIGINT), ``sum_x``/``sum_y``
    (BIGINT), ``slope_milli`` (``scale``·slope truncated toward zero,
    exact; NULL for degenerate groups where x has no variance), and
    ``mean_x_milli`` / ``mean_y_milli`` (``scale``·mean, truncated,
    exact).
    """
    if scale <= 0:
        raise ValueError(f"scale must be positive, got {scale}")
    groups = group_cols or []
    x = F.col(x_col).cast(_D)
    y = F.col(y_col).cast(_D)
    agg = df.groupBy(*groups).agg(
        F.count("*").cast(_D).alias("__n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * y).alias("__sxy"),
        F.sum(x * x).alias("__sxx"),
    )

    def tdiv(num, den):
        # exact truncating division (the `//` both engines implement):
        # subtract the trunc-mod, then the quotient is exact
        return ((num - (num % den)) / den).cast("bigint")

    num = F.lit(scale).cast(_D) * (
        F.col("__n") * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    )
    den = F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    return agg.select(
        *groups,
        F.col("__n").cast("bigint").alias("n"),
        F.col("__sx").cast("bigint").alias("sum_x"),
        F.col("__sy").cast("bigint").alias("sum_y"),
        F.when(den > 0, tdiv(num, den)).alias("slope_milli"),
        tdiv(F.lit(scale).cast(_D) * F.col("__sx"), F.col("__n")).alias(
            "mean_x_milli"
        ),
        tdiv(F.lit(scale).cast(_D) * F.col("__sy"), F.col("__n")).alias(
            "mean_y_milli"
        ),
    )
