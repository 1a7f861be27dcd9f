"""Time-series regularization: grid resample + forward fill (gap-fill).

The hypertable-style `time_bucket_gapfill` + `locf` the timeseries
warehouses ship (TimescaleDB/QuestDB-class), expressed as DataFrame
algebra over exact integer buckets so a SQL oracle replays it
bit-for-bit (observed values are copied verbatim — never recomputed —
so double columns stay hash-identical across engines).

Engine extension — the reference (exporter.py:75-141) has no
time-series tier.

Semantics of :func:`gapfill`:

- bucket = ``ts div step_us`` (exact BIGINT floor; timestamps must be
  non-negative — Spark ``div`` truncates toward zero while SQL ``//``
  floors, and the two only agree on non-negative operands);
- per (key, bucket) the representative observation is the LAST one in
  ``(ts, *tie)`` order (row_number replay, deterministic given a total
  order);
- the grid spans each key's min..max bucket inclusively;
- missing buckets forward-fill from the most recent earlier
  representative (``last(..., ignorenulls=True)`` running window);
  leading buckets before a key's first observation cannot exist by
  construction (the grid starts at the first observed bucket).

Scale posture (100 TB): every stage keys on (key, bucket) or key — all
hash equi-joins/windows, no cartesian anywhere (plan-gated).  The grid
explode is bounded per key by ``max_buckets`` (executor-side fail-fast
``assert_true``, not a silent truncation): a key whose span would
explode beyond the cap aborts the job with a descriptive error instead
of OOMing an executor.  Payload through every shuffle is (key, BIGINT
bucket, value) triples — never source rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gapfill(
    obs: DataFrame,
    *,
    step_us: int,
    key_col: str = "key",
    ts_col: str = "ts_us",
    value_col: str = "value",
    tie_cols: list[str] | None = None,
    max_buckets: int = 1_000_000,
) -> DataFrame:
    """Regular-grid resample with last-observation-carried-forward.

    Returns one row per (key, grid bucket) between each key's first and
    last observed bucket: ``(key, bucket_ts_us, value_filled,
    is_observed)``.  ``value_filled`` is the verbatim value of the
    latest representative observation at or before the bucket;
    ``is_observed`` marks buckets with a direct observation.
    """
    from pyspark.sql import Window

    if step_us <= 0:
        raise ValueError(f"step_us must be positive, got {step_us}")
    if max_buckets <= 0:
        raise ValueError(f"max_buckets must be positive, got {max_buckets}")
    ties = tie_cols or []

    bucketed = obs.select(
        F.col(key_col).alias("__k"),
        F.expr(f"{ts_col} div {step_us}").alias("__b"),
        F.col(ts_col).alias("__ts"),
        F.col(value_col).alias("__v"),
        *[F.col(c) for c in ties],
    )
    rn_w = Window.partitionBy("__k", "__b").orderBy(
        F.col("__ts").desc(), *[F.col(c).desc() for c in ties]
    )
    rep = (
        bucketed.withColumn("__rn", F.row_number().over(rn_w))
        .filter(F.col("__rn") == 1)
        .select("__k", "__b", "__v")
    )
    span = rep.groupBy("__k").agg(
        F.min("__b").alias("__lo"), F.max("__b").alias("__hi")
    )
    grid = span.select(
        "__k",
        F.explode(
            F.sequence(
                "__lo",
                # fail fast BEFORE materializing a runaway per-key grid
                F.when(
                    F.col("__hi") - F.col("__lo") < F.lit(max_buckets),
                    F.col("__hi"),
                ).otherwise(
                    F.raise_error(
                        F.concat(
                            F.lit(
                                f"gapfill: key span exceeds max_buckets="
                                f"{max_buckets} grid cells for key "
                            ),
                            F.col("__k").cast("string"),
                        )
                    ).cast("bigint")
                ),
            )
        ).alias("__b"),
    )
    fill_w = (
        Window.partitionBy("__k")
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(rep, ["__k", "__b"], "left")
        .select(
            F.col("__k").alias(key_col),
            (F.col("__b") * F.lit(step_us)).alias("bucket_ts_us"),
            F.last("__v", ignorenulls=True).over(fill_w).alias("value_filled"),
            F.col("__v").isNotNull().alias("is_observed"),
        )
    )


def ohlc(
    df: DataFrame,
    *,
    ts_col: str,
    value_col: str,
    step_us: int,
    key_cols: list[str] | None = None,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Candlestick downsampling: per (keys, bucket) the OPEN (first
    value), HIGH (max), LOW (min), CLOSE (last value) and event count —
    the financial/monitoring OHLC rollup (TimescaleDB ``candlestick``-
    class), exact and engine-replayable.

    - bucket = ``ts div step_us`` (non-negative BIGINT timestamps, same
      contract as :func:`gapfill`);
    - first/last are by the TOTAL order ``(ts, *tie_cols)`` —
      ``tie_cols`` must make the order total (a unique event id) or
      open/close would be partitioning-dependent;
    - values are copied VERBATIM (open/close select, high/low compare —
      no arithmetic), so double columns stay hash-identical across
      engines.

    Scale posture (100 TB): ONE data shuffle — the row_number/count
    windows and the final aggregate all partition on (keys, bucket), so
    Spark reuses the window exchange for the groupBy (plan-gated).
    Per-group state is one row; skew is bucket width, a caller knob.
    """
    if step_us <= 0:
        raise ValueError(f"step_us must be positive, got {step_us}")
    keys = key_cols or []
    ties = tie_cols or []
    from pyspark.sql import Window

    d = df.withColumn("__bucket", F.expr(f"{ts_col} div {step_us}"))
    part = [*keys, "__bucket"]
    order = [F.col(ts_col), *[F.col(t) for t in ties]]
    w = Window.partitionBy(*part).orderBy(*order)
    cw = Window.partitionBy(*part)
    v = F.col(value_col)
    ranked = (
        d.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count("*").over(cw))
    )
    return (
        ranked.groupBy(*part)
        .agg(
            F.max(F.when(F.col("__rn") == 1, v)).alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max(F.when(F.col("__rn") == F.col("__n"), v)).alias("close"),
            F.count("*").alias("n_events"),
        )
        .withColumnRenamed("__bucket", "bucket")
    )
