"""ABC / Pareto classification — exact integer cumulative-share tiers.

The classic warehouse inventory analysis (Pareto's 80/20 applied to
revenue/volume concentration): rank items by value, accumulate, and
tier them A/B/C at cumulative-share thresholds.  Every comparison here
is integer cross-multiplication — no percentage division ever happens,
so the tier assignment is bit-identical in any engine and an oracle
replays it exactly.

Convention (documented because the boundary item is genuinely
ambiguous in the literature): an item's tier is decided by its
cumulative share EXCLUSIVE of itself — the item that crosses the 80%
boundary still counts as A (it "starts before" the boundary), which is
the common inventory-management reading.

Engine extension — the reference (a per-row export/import tool) has no
analytics tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def abc_classes(
    df: DataFrame,
    *,
    value_col: str,
    id_cols: list[str],
    threshold_a_milli: int = 800,
    threshold_b_milli: int = 950,
) -> DataFrame:
    """Tier items by cumulative value share.

    ``value_col`` must be an exact integer column (quantize upstream —
    cents, micros; NULLs are excluded as non-observations).  Returns
    ``(*id_cols, value, rank, cum_value, cum_milli, abc_class)`` ranked
    by (value desc, *id_cols): ``cum_milli`` is the floor of the
    inclusive cumulative share in milli (integer arithmetic), and
    ``abc_class`` is 'A' while the EXCLUSIVE cumulative share is below
    ``threshold_a_milli``, 'B' below ``threshold_b_milli``, else 'C'.

    Scale posture (100 TB): callers aggregate facts to items FIRST (the
    groupBy is theirs — this operator ranks item aggregates), so the
    single global ordering window here runs over a DIMENSION-sized
    input (parts, SKUs, tenants).  That global sort is the operator's
    semantic requirement, not an accident; for item spaces too large
    for one partition, pre-bucket by an independent dimension and tier
    within buckets.
    """
    if not 0 < threshold_a_milli <= threshold_b_milli <= 1000:
        raise ValueError(
            "thresholds must satisfy 0 < A <= B <= 1000, got "
            f"A={threshold_a_milli}, B={threshold_b_milli}"
        )
    rows = df.filter(F.col(value_col).isNotNull())
    w_rank = Window.orderBy(
        F.col(value_col).desc(), *[F.col(c) for c in id_cols]
    )
    w_cum = w_rank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()
    # Overflow contract (executor fail-fast, never silent int64 wrap —
    # an engine that widens to 128-bit would silently diverge from us
    # exactly where Spark wraps): every comparison multiplies by <= 1000,
    # so the total must fit 2^63/1000 (~9.2e15).  Larger totals:
    # pre-scale the value units (cents -> dollars) — the tiers are
    # scale-invariant.  Negative values are rejected outright (cumulative
    # share is ill-defined under them).
    lim = ((1 << 63) - 1) // 1000
    out = (
        rows.withColumn(
            "__v_ok",
            F.when(F.col(value_col) >= 0, F.col(value_col)).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("abc_classes: negative value "),
                        F.col(value_col).cast("string"),
                        F.lit(" — cumulative share is ill-defined"),
                    )
                ).cast("bigint")
            ),
        )
        .withColumn("rank", F.row_number().over(w_rank))
        .withColumn("cum_value", F.sum("__v_ok").over(w_cum))
        .withColumn(
            "__total",
            F.when(
                F.sum("__v_ok").over(w_all) <= F.lit(lim),
                F.sum("__v_ok").over(w_all),
            ).otherwise(
                F.raise_error(
                    F.lit(
                        f"abc_classes: total value exceeds {lim} — the "
                        "milli cross-multiplications would wrap int64; "
                        "pre-scale the value units (the tiers are "
                        "scale-invariant)"
                    )
                ).cast("bigint")
            ),
        )
    )
    prev = F.col("cum_value") - F.col(value_col)
    return out.select(
        *id_cols,
        F.col(value_col).alias("value"),
        F.col("rank").cast("bigint").alias("rank"),
        "cum_value",
        # floor(1000 * cum / total) with non-negative operands: Spark
        # div == SQL // here
        F.expr("(1000 * cum_value) div __total").alias("cum_milli"),
        F.when(
            prev * 1000 < F.lit(threshold_a_milli) * F.col("__total"), "A"
        )
        .when(
            prev * 1000 < F.lit(threshold_b_milli) * F.col("__total"), "B"
        )
        .otherwise("C")
        .alias("abc_class"),
    )
