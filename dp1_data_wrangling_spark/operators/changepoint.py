"""CUSUM change-point detection — exact integer window algebra.

Page's cumulative-sum control chart (Page, "Continuous inspection
schemes", Biometrika 1954 — public literature): for an ordered series
x_t, the one-sided statistic S_t = max(0, S_{t-1} + (x_t - k)) alarms
when it exceeds a threshold h, detecting a sustained mean shift.  The
recursion LOOKS stateful, but it has a closed prefix form —

    S_t = c_t - min(0, min_{j<=t} c_j),   c_t = cumsum of (x_i - k)

(the max-over-suffix-sums identity) — so the whole detector is two
stacked window passes over ONE partitioning: a cumulative sum and a
running min.  No recursion, no Python, no state store.

Exactness: values quantize to integer millis (floor(v * 1000) — floor,
never cast: DuckDB CAST(double AS BIGINT) rounds while Spark truncates,
and floor is engine-identical).  The reference level k = group mean +
slack would need a division, so everything is CLEARED BY n (the group
row count): deviations become d_i = n·v_i - V - n·slack (V = group
milli sum), the statistic runs in units of n·milli, and the alarm
compares against n·h — every quantity an exact BIGINT, bit-identical
in any engine.

Two-sided: the downward statistic mirrors with d_i = V - n·v_i -
n·slack.  This is the non-resetting form (after an alarm the statistic
keeps accumulating rather than restarting at 0): it reports the full
ALARM REGION of each shift, which is the set-of-rows semantics a
declarative engine can express in closed form; classic reset-per-alarm
segmentation is a sequential consumer of these regions.

Scale posture (100 TB): ONE hash shuffle on the group key — the group
constants (n, V) and both cumulative statistics share the same window
partitioning, so Spark stacks the sorts on a single exchange
(plan-gated).  Per-group state during the pass is O(1); the quadratic-
looking prefix identity costs nothing because running sums/mins are
streaming window aggregates.  Skew valve: a single giant group is one
partition — pre-split by a coarser time bucket upstream if a group
exceeds executor memory (the statistic is NOT mergeable across splits;
the split must be at analysis boundaries).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def milli(col: Column) -> Column:
    """floor(v · 1000) as BIGINT — the engine-identical quantization."""
    return F.floor(col * F.lit(1000)).cast("bigint")


def cusum_changepoints(
    df: DataFrame,
    *,
    value_col: str,
    order_cols: list[str],
    group_cols: list[str],
    slack_milli: int = 0,
    threshold_milli: int = 1000,
) -> DataFrame:
    """Two-sided CUSUM alarm rows per group.

    ``slack_milli`` is the allowance k' above/below the group mean (in
    value millis); ``threshold_milli`` the alarm level h (same units).
    Returns one row per alarmed position:
    ``(*group_cols, seq, direction, stat_scaled, threshold_scaled)``
    where ``seq`` is the 1-based position in ``order_cols`` order,
    ``direction`` is 'up' or 'down', and ``stat_scaled`` /
    ``threshold_scaled`` are the exact statistics in n·milli units
    (compare them yourself for margins; their ratio is the conventional
    normalized statistic).
    """
    if threshold_milli <= 0:
        raise ValueError(f"threshold_milli must be > 0, got {threshold_milli}")
    if slack_milli < 0:
        raise ValueError(f"slack_milli must be >= 0, got {slack_milli}")
    w_grp = Window.partitionBy(*group_cols)
    w_all = w_grp.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_ord = w_grp.orderBy(*order_cols)
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vm = milli(F.col(value_col))
    # NULL values are excluded OUTRIGHT (no observation, no position):
    # keeping them would bias the n-cleared reference level (count over
    # all rows vs sum over non-null) AND emit phantom alarm rows whose
    # deviation is NULL but whose running statistic carries the prior
    # value.
    base = (
        df.filter(F.col(value_col).isNotNull())
        .withColumn("__v", vm)
        .withColumn("__n", F.count("*").over(w_all))
        .withColumn("__tot", F.sum("__v").over(w_all))
        .withColumn("__seq", F.row_number().over(w_ord))
    )
    # Overflow contract (executor fail-fast, never a silent int64 wrap):
    # each deviation term is n·v − V − n·slack and the running sum
    # accumulates over n rows, so the statistic's envelope is
    # ~2·n·(max|n·v − V| + n·slack) — quadratic in the group size times
    # the milli deviation.  The envelope is evaluated in DOUBLE (exact
    # enough for a conservative gate) against 2^62, a 2x margin below
    # the wrap point that double rounding cannot cross.  The guard is
    # THREADED INTO ``__v`` — the column every downstream expression
    # consumes — so Catalyst cannot prune it into dead code (the
    # round-9 side-column lesson).  Larger groups: pre-split at
    # analysis boundaries or rescale the value units.
    nd = F.col("__n").cast("double")
    md = F.max(
        F.abs(
            nd * F.col("__v").cast("double") - F.col("__tot").cast("double")
        )
    ).over(w_all)
    envelope = (
        F.lit(2.0)
        * nd
        * (md + nd * F.lit(float(slack_milli + threshold_milli)))
    )
    guarded_v = F.when(envelope <= F.lit(float(1 << 62)), F.col("__v")).otherwise(
        F.raise_error(
            F.lit(
                "cusum_changepoints: the n-cleared statistic's envelope "
                "exceeds 2^62 and would wrap int64 — pre-split the group "
                "at analysis boundaries or rescale the value units"
            )
        ).cast("bigint")
    )
    base = base.withColumn("__v", guarded_v)
    d_up = (
        F.col("__n") * F.col("__v")
        - F.col("__tot")
        - F.col("__n") * F.lit(slack_milli)
    )
    d_dn = (
        F.col("__tot")
        - F.col("__n") * F.col("__v")
        - F.col("__n") * F.lit(slack_milli)
    )
    curs = base.withColumn("__cu", F.sum(d_up).over(w_run)).withColumn(
        "__cd", F.sum(d_dn).over(w_run)
    )
    stats = curs.withColumn(
        "__su",
        F.col("__cu") - F.least(F.lit(0), F.min("__cu").over(w_run)),
    ).withColumn(
        "__sd",
        F.col("__cd") - F.least(F.lit(0), F.min("__cd").over(w_run)),
    )
    # Unpivot the two directions with one row-local explode (a union of
    # filtered branches would re-execute the whole window subtree twice).
    thresh = F.col("__n") * F.lit(threshold_milli)
    return (
        stats.select(
            *group_cols,
            F.col("__seq").alias("seq"),
            thresh.alias("threshold_scaled"),
            F.explode(
                F.array(
                    F.struct(
                        F.lit("up").alias("direction"),
                        F.col("__su").alias("stat_scaled"),
                    ),
                    F.struct(
                        F.lit("down").alias("direction"),
                        F.col("__sd").alias("stat_scaled"),
                    ),
                )
            ).alias("__e"),
        )
        .filter(F.col("__e.stat_scaled") > F.col("threshold_scaled"))
        .select(
            *group_cols,
            "seq",
            F.col("__e.direction").alias("direction"),
            F.col("__e.stat_scaled").alias("stat_scaled"),
            "threshold_scaled",
        )
    )
