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


def ewma_half(
    df: DataFrame,
    *,
    ts_col: str,
    value_col: str,
    key_cols: list[str] | None = None,
    tie_cols: list[str] | None = None,
    horizon: int = 32,
    quant_scale: int = 1_000_000,
) -> DataFrame:
    """Exponentially-weighted moving average with decay 1/2, computed
    EXACTLY (the pandas ``ewm(alpha=0.5, adjust=True)`` shape with a
    bounded horizon, in distributed form).

    The classic EWMA recursion ``y_n = a*x_n + (1-a)*y_{n-1}`` is
    sequential — useless on a cluster — and float-order-dependent.  This
    operator uses the algebraically equivalent weighted-window form

        y_n = sum_{k=0..m-1} (1/2)^k * x_{n-k} / sum_{k=0..m-1} (1/2)^k

    over the last ``m = horizon`` observations per key, and makes it
    engine-exact with the binary-fraction trick: with decay exactly 1/2,
    multiplying numerator and denominator by ``2^(m-1)`` turns every
    weight into a power of two, so both are plain BIGINT sums
    (``num = sum x_j << (j - lo)``, ``den = 2^(n_frame) - 1``) over
    per-row fixed-point values (``x = round(value * quant_scale)``), and
    the final ``num / den`` is ONE double division of two exact BIGINTs
    — bit-identical in any IEEE engine regardless of partitioning.
    Truncating to ``horizon`` bounds the tail error at ``2^-horizon``
    relative (< 3e-10 at the default 32) and — the point — bounds
    per-row window state, which is what makes the op distributable.

    Scale posture (100 TB): ONE shuffle on ``key_cols`` (the ordering
    window); the frame fold is row-local O(horizon) with no Python.
    Overflow contract: ``|value| * quant_scale * 2^horizon`` must fit a
    signed 64-bit integer — validated per row with an executor
    ``raise_error`` (fail fast, never silent wraparound).

    Engine extension — the reference (exporter.py:75-141) has no
    time-series tier.
    """
    from pyspark.sql import Window

    if horizon < 1 or horizon > 62:
        raise ValueError(f"horizon must be in [1, 62], got {horizon}")
    if quant_scale < 1:
        raise ValueError(f"quant_scale must be positive, got {quant_scale}")
    keys = key_cols or []
    ties = tie_cols or []
    # |x| <= 2^(62 - horizon) keeps sum_{k<m} |x|*2^k < 2^63.
    x_cap = 1 << (62 - horizon)

    quant = F.round(F.col(value_col) * F.lit(quant_scale)).cast("bigint")
    d = df.withColumn(
        "__x",
        F.when(F.abs(quant) < F.lit(x_cap), quant).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"ewma_half: |value*{quant_scale}| >= {x_cap} "
                        "would overflow the 64-bit weighted sum at "
                        f"horizon={horizon}; lower quant_scale or horizon "
                        "(value="
                    ),
                    F.col(value_col).cast("string"),
                    F.lit(")"),
                )
            ).cast("bigint")
        ),
    )
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        F.col(ts_col), *[F.col(t) for t in ties]
    )
    frame = w.rowsBetween(-(horizon - 1), Window.currentRow)
    # collect_list over the frame preserves frame order (oldest first), so
    # element i (0-based) sits n-1-i half-lives before the current row and
    # carries weight 2^i after the common 2^(n-1) rescale.  One fold
    # carries (weighted sum, next weight): after n elements w = 2^n, so
    # the denominator 2^n - 1 falls out of the same accumulator — no
    # index column, no shift-by-column (which the DataFrame API lacks).
    xs = F.collect_list("__x").over(frame)
    acc = F.aggregate(
        xs,
        F.struct(
            F.lit(0).cast("bigint").alias("s"),
            F.lit(1).cast("bigint").alias("w"),
        ),
        lambda a, x: F.struct(
            (a["s"] + x * a["w"]).alias("s"), (a["w"] * 2).alias("w")
        ),
    )
    out = (
        d.withColumn("__acc", acc)
        .withColumn("n_frame", F.size(xs))
        .withColumn("__num", F.col("__acc")["s"])
        .withColumn("__den", F.col("__acc")["w"] - 1)
    )
    return out.select(
        *keys,
        F.col(ts_col),
        *ties,
        F.col("n_frame"),
        F.col("__num").alias("ewma_num"),
        F.col("__den").alias("ewma_den"),
        (
            F.col("__num").cast("double") / F.col("__den").cast("double")
            / F.lit(float(quant_scale))
        ).alias("ewma"),
    )


def interpolate(
    obs: DataFrame,
    *,
    step_us: int,
    key_col: str = "key",
    ts_col: str = "ts_us",
    value_col: str = "value",
    tie_cols: list[str] | None = None,
    quant_scale: int = 1000,
    max_buckets: int = 1_000_000,
) -> DataFrame:
    """Regular-grid resample with exact LINEAR interpolation — the
    ``interpolate()`` companion to :func:`gapfill`'s LOCF (the other
    fill mode every timeseries warehouse ships).

    Same grid contract as :func:`gapfill` (bucket = ``ts div step_us``,
    per-bucket representative = last observation in ``(ts, *tie)``
    order, grid spans each key's first..last observed bucket — so every
    gap bucket has BOTH neighbors by construction).  Values quantize to
    ``round(value · quant_scale)`` BIGINT, and a gap bucket g between
    representatives (t0, v0) and (t1, v1) fills with

        v0 + floor((v1 − v0) · (g − t0) / (t1 − t0))

    computed as exact integer arithmetic: the floor division is the
    positive-remainder form ``(num − ((num % den + den) % den)) / den``,
    identical in any engine (Spark ``div`` truncates toward zero while
    SQL ``//`` floors — they only agree through this clearing; the r8
    spatial-cell fix, generalized).

    Returns ``(key, bucket_ts_us, value_scaled, is_observed)`` —
    ``value_scaled`` is the exact BIGINT in 1/quant_scale units
    (observed buckets carry their own quantized value verbatim).

    Scale posture (100 TB): identical to gapfill — (key, bucket)-keyed
    stages only, grid bounded by ``max_buckets`` with executor
    fail-fast; the prev/next neighbor scans are two frames over ONE
    (key, bucket-order) sort, so the fill costs a single exchange after
    the grid join.
    """
    from pyspark.sql import Window

    if step_us <= 0:
        raise ValueError(f"step_us must be positive, got {step_us}")
    if quant_scale < 1:
        raise ValueError(f"quant_scale must be positive, got {quant_scale}")
    if max_buckets <= 0:
        raise ValueError(f"max_buckets must be positive, got {max_buckets}")
    ties = tie_cols or []

    bucketed = obs.select(
        F.col(key_col).alias("__k"),
        F.expr(f"{ts_col} div {step_us}").alias("__b"),
        F.col(ts_col).alias("__ts"),
        F.round(F.col(value_col) * F.lit(quant_scale)).cast("bigint").alias(
            "__vq"
        ),
        *[F.col(c) for c in ties],
    )
    rn_w = Window.partitionBy("__k", "__b").orderBy(
        F.col("__ts").desc(), *[F.col(c).desc() for c in ties]
    )
    rep = (
        bucketed.withColumn("__rn", F.row_number().over(rn_w))
        .filter(F.col("__rn") == 1)
        .select("__k", "__b", "__vq")
    )
    span = rep.groupBy("__k").agg(
        F.min("__b").alias("__lo"), F.max("__b").alias("__hi")
    )
    grid = span.select(
        "__k",
        F.explode(
            F.sequence(
                "__lo",
                F.when(
                    F.col("__hi") - F.col("__lo") < F.lit(max_buckets),
                    F.col("__hi"),
                ).otherwise(
                    F.raise_error(
                        F.concat(
                            F.lit(
                                f"interpolate: key span exceeds max_buckets="
                                f"{max_buckets} grid cells for key "
                            ),
                            F.col("__k").cast("string"),
                        )
                    ).cast("bigint")
                ),
            )
        ).alias("__b"),
    )
    w_back = (
        Window.partitionBy("__k")
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("__k")
        .orderBy("__b")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_b = F.when(F.col("__vq").isNotNull(), F.col("__b"))
    joined = (
        grid.join(rep, ["__k", "__b"], "left")
        .withColumn("__t0", F.last(obs_b, ignorenulls=True).over(w_back))
        .withColumn("__v0", F.last("__vq", ignorenulls=True).over(w_back))
        .withColumn("__t1", F.first(obs_b, ignorenulls=True).over(w_fwd))
        .withColumn("__v1", F.first("__vq", ignorenulls=True).over(w_fwd))
    )
    # The quotient MUST be integer `div`, never the `/` operator: Column
    # `/` is IEEE double division, and once |num| exceeds 2^53 the
    # double-rounded quotient truncates to q-1 on cast — an off-by-one
    # the oracle's integer `//` never produces.  After the positive-
    # remainder subtraction the numerator is exactly divisible, so
    # truncating `div` equals floor division.
    num = (F.col("__v1") - F.col("__v0")) * (F.col("__b") - F.col("__t0"))
    den = F.col("__t1") - F.col("__t0")
    cleared = num - ((num % den + den) % den)
    filled = F.when(F.col("__vq").isNotNull(), F.col("__vq")).otherwise(
        F.col("__v0") + F.expr("__num_cleared div __den")
    )
    return (
        joined.withColumn("__num_cleared", cleared)
        .withColumn("__den", den)
        .select(
            F.col("__k").alias(key_col),
            (F.col("__b") * F.lit(step_us)).alias("bucket_ts_us"),
            filled.alias("value_scaled"),
            F.col("__vq").isNotNull().alias("is_observed"),
        )
    )


def holt_smooth(
    df: DataFrame,
    *,
    ts_col: str,
    value_col: str,
    key_cols: list[str] | None = None,
    frac_bits: int = 20,
    quant_scale: int = 1000,
    forecast_steps: int = 4,
    max_rows_per_key: int = 10_000,
) -> DataFrame:
    """Holt's linear-trend double exponential smoothing (alpha = beta =
    1/2), as an EXACT fixed-point integer recurrence over each key's full
    ordered series.

    The real-valued recursion ``l_t = (x_t + l_{t-1} + b_{t-1})/2``,
    ``b_t = (x_t - l_{t-1} + 3 b_{t-1})/4`` (the alpha=beta=1/2 closed
    substitution) is float-order-dependent and its exact dyadic form
    doubles its denominator twice per step — unusable past ~25 steps.
    This operator instead PINS the spec as integer arithmetic with
    ``frac_bits`` fractional bits: values quantize to
    ``x*quant_scale*2^frac_bits`` and each step rounds once via
    ARITHMETIC right shift (floor division by 2/4 — Spark ``shiftright``
    and SQL ``>>`` agree on negatives, verified), so state never grows,
    any series length works, and a DuckDB recursive CTE replays every
    state bit-for-bit.  Rounding error is <= 2^-frac_bits per step and
    the alpha=beta=1/2 system is a contraction (spectral radius
    1/sqrt(2)), so total drift from real Holt stays ~3.4*2^-frac_bits —
    ~3e-6 value units at the defaults.  Init: ``l_1 = x_1, b_1 = 0``
    (deterministic, documented; the first observation carries no trend
    evidence).

    Returns one row per observation: ``(*key_cols, ts, step, level_num,
    trend_num, level, trend, forecast)`` where ``forecast`` projects
    ``forecast_steps`` ahead (``l + h*b``) and the doubles are single
    exact-integer-over-power-of-two divisions (engine-identical).

    Scale posture (100 TB): smoothing is inherently sequential per key,
    so the design collects each key's series ONCE (one shuffle), folds
    it row-locally in the JVM, and explodes back — the standard Spark
    shape for order-dependent recurrences (same contract as MMR's
    greedy loop).  Parallelism comes from the key dimension.  NOTE the
    fold's state-array append copies the accumulated array each step
    (Catalyst arrays are immutable), so the per-key cost is O(n^2)
    struct copies — that is why ``max_rows_per_key`` defaults to a
    deliberately modest 10_000 (~5e7 copies worst case); pre-bucket
    longer series (e.g. hourly -> daily) rather than raising the cap
    by orders of magnitude.  Per-key length is bounded with an executor
    fail-fast, and duplicate timestamps (an ill-defined order) also
    fail fast rather than smooth nondeterministically.
    """
    if not 4 <= frac_bits <= 40:
        raise ValueError(f"frac_bits must be in [4, 40], got {frac_bits}")
    if quant_scale < 1:
        raise ValueError(f"quant_scale must be positive, got {quant_scale}")
    if forecast_steps < 0:
        raise ValueError(
            f"forecast_steps must be non-negative, got {forecast_steps}"
        )
    if max_rows_per_key < 1:
        raise ValueError(
            f"max_rows_per_key must be positive, got {max_rows_per_key}"
        )
    keys = key_cols or []
    s = frac_bits
    # |x_q << s| and the ~4x state envelope must clear 2^62.
    x_cap = 1 << (59 - s)
    quant = F.round(F.col(value_col) * F.lit(quant_scale)).cast("bigint")
    # NULL observations are dropped BEFORE the overflow guard — a NULL
    # condition would otherwise fall into the raise branch (with a
    # NULLed-out message); the filter must come first, not after.
    d = df.filter(F.col(value_col).isNotNull()).withColumn(
        "__xq",
        F.when(F.abs(quant) < F.lit(x_cap), quant).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"holt_smooth: |value*{quant_scale}| >= {x_cap} "
                        f"would overflow the fixed-point state at "
                        f"frac_bits={s}; lower quant_scale or frac_bits "
                        "(value="
                    ),
                    F.col(value_col).cast("string"),
                    F.lit(")"),
                )
            ).cast("bigint")
        ),
    )

    ser = d.groupBy(*keys).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(ts_col).alias("t"), F.col("__xq").alias("x")))
        ).alias("__ser")
    )
    n_ok = F.size("__ser") <= max_rows_per_key
    ts_ok = F.expr(
        "size(array_distinct(transform(__ser, o -> o.t))) = size(__ser)"
    )
    ser = ser.withColumn(
        "__ser",
        F.when(n_ok & ts_ok, F.col("__ser")).otherwise(
            F.raise_error(
                F.when(
                    ~n_ok,
                    F.concat(
                        F.lit(
                            f"holt_smooth: a key holds more than "
                            f"{max_rows_per_key} observations ("
                        ),
                        F.size("__ser").cast("string"),
                        F.lit("); raise max_rows_per_key or pre-bucket"),
                    ),
                ).otherwise(
                    F.lit(
                        "holt_smooth: duplicate timestamps within a key "
                        "make the smoothing order ill-defined; "
                        "deduplicate or bucket upstream"
                    )
                )
            ).cast(f"array<struct<t:{d.schema[ts_col].dataType.simpleString()},x:bigint>>")
        ),
    )
    # O(n) JVM fold: acc carries the emitted state array + current (l, b).
    # Spark's higher-order functions are properly functional (no DuckDB-
    # style accumulator aliasing), so l/b cross-reference safely.
    fold = F.expr(
        f"""
        aggregate(
            __ser,
            named_struct(
                'arr', CAST(array() AS ARRAY<STRUCT<l: BIGINT, b: BIGINT>>),
                'l', CAST(0 AS BIGINT), 'b', CAST(0 AS BIGINT),
                'init', false),
            (acc, o) -> CASE WHEN NOT acc.init THEN named_struct(
                    'arr', array(named_struct(
                        'l', shiftleft(o.x, {s}), 'b', CAST(0 AS BIGINT))),
                    'l', shiftleft(o.x, {s}), 'b', CAST(0 AS BIGINT),
                    'init', true)
                ELSE named_struct(
                    'arr', concat(acc.arr, array(named_struct(
                        'l', shiftright(shiftleft(o.x, {s}) + acc.l + acc.b, 1),
                        'b', shiftright(shiftleft(o.x, {s}) - acc.l + 3 * acc.b, 2)))),
                    'l', shiftright(shiftleft(o.x, {s}) + acc.l + acc.b, 1),
                    'b', shiftright(shiftleft(o.x, {s}) - acc.l + 3 * acc.b, 2),
                    'init', true)
            END,
            acc -> acc.arr
        )
        """
    )
    den = float((1 << s) * quant_scale)
    h = forecast_steps
    out = (
        ser.withColumn("__st", fold)
        .select(
            *keys,
            F.posexplode(F.expr("arrays_zip(__ser, __st)")).alias(
                "__pos", "__z"
            ),
        )
        .select(
            *keys,
            F.col("__z.__ser.t").alias(ts_col),
            (F.col("__pos") + 1).cast("bigint").alias("step"),
            F.col("__z.__st.l").alias("level_num"),
            F.col("__z.__st.b").alias("trend_num"),
        )
    )
    return out.select(
        *keys,
        ts_col,
        "step",
        "level_num",
        "trend_num",
        (F.col("level_num").cast("double") / F.lit(den)).alias("level"),
        (F.col("trend_num").cast("double") / F.lit(den)).alias("trend"),
        (
            (F.col("level_num") + F.lit(h) * F.col("trend_num")).cast(
                "double"
            )
            / F.lit(den)
        ).alias("forecast"),
    )


def acf(
    df: DataFrame,
    *,
    value_col: str,
    order_cols: list[str],
    group_cols: list[str],
    max_lag: int = 5,
    quant_scale: int = 1000,
) -> DataFrame:
    """Exact autocorrelation function per series at lags 1..``max_lag``
    — the Box-Jenkins identification staple (public literature), as
    pure window algebra.

    Definition (deterministic, engine-exact): values quantize to
    integers (``floor(v * quant_scale)``), the center is the TRUNCATED
    integer mean ``mu = S div n`` (both engines truncate toward zero —
    verified; the <=1-quantum centering bias is stated, not hidden, and
    cancels in the ratio to first order), deviations ``d_t = x_t - mu``
    stay BIGINT, and

        r_k = sum_{t<=n-k}(d_t * d_{t+k}) / sum_t(d_t^2)

    is ONE double division of two exact BIGINT sums — bit-identical in
    any engine, so a SQL oracle hash-compares the doubles too.

    Returns ``(*group_cols, lag, n, num_scaled, den_scaled, acf)`` with
    NULL acf for a zero-variance series (den = 0 — SQL NULL division
    semantics, stated).

    Scale posture (100 TB): ONE hash exchange on the group key — the
    group constants (n, S), all ``max_lag`` lead() frames and the final
    groupBy share its partitioning, so Spark stacks the sorts on a
    single shuffle (plan-gated).  Payload is (key, BIGINT) pairs.  The
    per-key series must fit one partition (the same contract as every
    per-key window operator here); pre-bucket longer series upstream.

    Overflow contract (executor fail-fast): |d| <= spread = max_x -
    min_x per group and the sums are bounded by n * spread^2, guarded
    against 2^62 in DOUBLE with the guard threaded into the consumed
    deviation column — never a silent int64 wrap.
    """
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    if quant_scale < 1:
        raise ValueError(f"quant_scale must be >= 1, got {quant_scale}")
    from pyspark.sql import Window

    w_grp = Window.partitionBy(*group_cols)
    w_all = w_grp.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_ord = w_grp.orderBy(*order_cols)
    x = F.floor(F.col(value_col) * F.lit(quant_scale)).cast("bigint")
    base = (
        df.filter(F.col(value_col).isNotNull())
        .withColumn("__x", x)
        .withColumn("__n", F.count("*").over(w_all))
        .withColumn("__s", F.sum("__x").over(w_all))
        .withColumn("__spread",
                    F.max("__x").over(w_all) - F.min("__x").over(w_all))
    )
    # envelope in DOUBLE: n * spread^2 (the largest possible |num_k| or
    # den); guard at 2^62 leaves a 2x margin double rounding cannot
    # cross.  Threaded into the deviation column the sums consume.
    env = (
        F.col("__n").cast("double")
        * F.col("__spread").cast("double")
        * F.col("__spread").cast("double")
    )
    dev = F.col("__x") - F.expr("__s div __n")
    guarded = F.when(env <= F.lit(float(1 << 62)), dev).otherwise(
        F.raise_error(
            F.lit(
                "acf: n * spread^2 exceeds 2^62 and the lag sums would "
                "wrap int64 — lower quant_scale or pre-split the series"
            )
        ).cast("bigint")
    )
    curs = base.withColumn("__d", guarded)
    for k in range(1, max_lag + 1):
        curs = curs.withColumn(f"__d{k}", F.lead("__d", k).over(w_ord))
    aggs = [
        F.max("__n").cast("bigint").alias("n"),
        F.sum(F.col("__d") * F.col("__d")).alias("den_scaled"),
    ]
    for k in range(1, max_lag + 1):
        aggs.append(
            F.sum(F.col("__d") * F.col(f"__d{k}")).alias(f"__num{k}")
        )
    agg = curs.groupBy(*group_cols).agg(*aggs)
    lag_structs = F.array(
        *[
            F.struct(
                F.lit(k).cast("int").alias("lag"),
                F.col(f"__num{k}").alias("num_scaled"),
            )
            for k in range(1, max_lag + 1)
        ]
    )
    return (
        agg.select(
            *group_cols, "n", "den_scaled",
            F.explode(lag_structs).alias("__l"),
        )
        .select(
            *group_cols,
            F.col("__l.lag").alias("lag"),
            "n",
            F.coalesce(F.col("__l.num_scaled"), F.lit(0)).alias("num_scaled"),
            "den_scaled",
            (
                F.coalesce(F.col("__l.num_scaled"), F.lit(0)).cast("double")
                / F.when(F.col("den_scaled") > 0, F.col("den_scaled"))
                .cast("double")
            ).alias("acf"),
        )
    )

def seasonal_mase(
    df: DataFrame,
    *,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    period: int,
    tie_cols: list[str] | None = None,
    quant_scale: int = 1000,
) -> DataFrame:
    """Seasonal-naive forecast accuracy per key — the MASE denominator
    convention of Hyndman & Koehler (2006, public literature): forecast
    each observation with the value ``period`` OBSERVATIONS earlier,
    scale the error by the one-step naive error,

        mase_milli = (1000 * sum|v_t - v_{t-period}|)
                     div sum|v_t - v_{t-1}|

    A mase_milli under 1000 means the seasonal pattern genuinely
    explains the series better than a flat carry-forward — the standard
    screen before trusting a seasonality assumption in a rollup or
    forecast.  Values quantize to exact integers (``floor(v *
    quant_scale)``) so both sums are BIGINT and the truncating div
    replays verbatim in SQL; NULL values are excluded (gap-free series
    are the caller's contract — run :func:`gapfill` first for sparse
    ones); a key with a zero one-step denominator (constant series) or
    fewer than ``period + 1`` observations yields NULL mase_milli (SQL
    NULL division / no scored rows), never a fake score.

    Returns one row per key: ``(*key_cols, n_scored, sum_abs_err,
    sum_abs_naive, mase_milli)``.

    Scale posture (100 TB): ONE hash exchange on the key — the lag
    windows and the final groupBy share its partitioning (plan-gated);
    per-key series on one partition is the standing per-key window
    contract.  Overflow: |err| sums are bounded by n * max|v| *
    quant_scale, guarded in DOUBLE against 2^62 with the guard threaded
    into the consumed quantized value.
    """
    if period < 1:
        raise ValueError(f"period must be >= 1, got {period}")
    if quant_scale < 1:
        raise ValueError(f"quant_scale must be >= 1, got {quant_scale}")
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    from pyspark.sql import Window

    ties = tie_cols or []
    w_key = Window.partitionBy(*key_cols)
    w_ord = w_key.orderBy(F.col(ts_col), *[F.col(t) for t in ties])
    nn = df.filter(F.col(value_col).isNotNull())
    vq = F.floor(F.col(value_col) * F.lit(quant_scale)).cast("bigint")
    base = nn.withColumn("__vq0", vq).withColumn(
        "__n",
        F.count("*").over(
            w_key.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ),
    ).withColumn(
        "__mx",
        F.max(F.abs(vq)).over(
            w_key.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ),
    )
    # each |err| term is <= 2*max|v| and there are < n of them; the
    # extra *1000 covers the milli cross-multiply in the output
    env = (
        F.col("__n").cast("double")
        * F.lit(2000.0)
        * F.col("__mx").cast("double")
    )
    guarded = F.when(env <= F.lit(float(1 << 62)), F.col("__vq0")).otherwise(
        F.raise_error(
            F.lit(
                "seasonal_mase: 1000 * n * 2*max|v| exceeds the 2^62 "
                "sum envelope — lower quant_scale (the ratio is "
                "scale-invariant)"
            )
        ).cast("bigint")
    )
    lagged = (
        base.withColumn("__vq", guarded)
        .withColumn("__lp", F.lag("__vq", period).over(w_ord))
        .withColumn("__l1", F.lag("__vq", 1).over(w_ord))
    )
    scored = lagged.groupBy(*key_cols).agg(
        F.count(F.col("__lp")).cast("bigint").alias("n_scored"),
        F.sum(
            F.when(
                F.col("__lp").isNotNull(), F.abs(F.col("__vq") - F.col("__lp"))
            )
        ).cast("bigint").alias("sum_abs_err"),
        # the naive denominator spans the SAME scored window (rows with a
        # seasonal lag), so numerator and denominator cover identical
        # observations — the Hyndman in-sample convention restricted to
        # the scorable suffix
        F.sum(
            F.when(
                F.col("__lp").isNotNull(), F.abs(F.col("__vq") - F.col("__l1"))
            )
        ).cast("bigint").alias("sum_abs_naive"),
    )
    return scored.select(
        *key_cols,
        "n_scored",
        F.coalesce("sum_abs_err", F.lit(0)).alias("sum_abs_err"),
        F.coalesce("sum_abs_naive", F.lit(0)).alias("sum_abs_naive"),
        F.when(
            F.coalesce(F.col("sum_abs_naive"), F.lit(0)) > 0,
            F.expr("(1000 * sum_abs_err) div sum_abs_naive"),
        ).alias("mase_milli"),
    )


def seasonal_profile(
    df: DataFrame,
    *,
    ts_col: str,
    value_col: str,
    bucket_us: int,
    period: int,
    key_cols: list[str] | None = None,
    quant_scale: int = 1000,
) -> DataFrame:
    """Seasonal index profile per key — the multiplicative seasonality
    readout (hour-of-day / day-of-week shape) in exact integers:

        position   = (ts div bucket_us) mod period
        mean_pos   = sum_pos div n_pos            (milli-quantized)
        index_milli = (1000 * sum_pos * n_all) div (n_pos * sum_all)

    i.e. the classic ratio-to-overall-mean seasonal index, cleared of
    rationals so ONE truncating division produces it — both engines
    replay it verbatim (DECIMAL(38,0) cross products vs HUGEINT).
    NULL values are excluded from both sum and count (mean semantics,
    the diff_in_diff stance); positions with no observations are
    simply absent (an index of an unobserved slot is undefined, not
    zero).  ``index_milli`` is NULL when the key's total sum is zero
    or negative — a ratio-to-mean index is only meaningful for
    non-negative measures (counts, revenue, load); the per-position
    means still report exactly.

    Scale posture (100 TB): ONE map-side-combinable groupBy to the
    (key, position) census — bounded by ``period`` per key — then a
    key-level recombine of the census (census-sized groupBy + join).
    No window, no data-sized join.

    Engine extension — the reference (exporter.py:75-141) has no
    time-series tier.
    """
    keys = key_cols or []
    d = seasonal_census_projection(
        df,
        ts_col=ts_col,
        value_col=value_col,
        bucket_us=bucket_us,
        period=period,
        quant_scale=quant_scale,
        key_cols=keys,
    )
    census = (
        d.groupBy(*keys, "__pos")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_obs"),
            F.sum(F.col("__vq").cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .alias("__s"),
        )
        .localCheckpoint(eager=False)
    )
    return seasonal_from_census(
        census,
        key_cols=keys,
        position_col="__pos",
        count_col="n_obs",
        sum_col="__s",
    )


def seasonal_census_projection(
    df: DataFrame,
    *,
    ts_col: str,
    value_col: str,
    bucket_us: int,
    period: int,
    quant_scale: int = 1000,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Row-local ``(*key_cols, __pos, __vq)`` projection for the
    seasonal census — bucket position plus the milli-quantized value,
    NULL values DROPPED (mean semantics: they contribute to neither
    sum nor count, so a position observed only through NULLs is
    absent, matching the batch profile's n_obs > 0 contract).  The
    single definition the batch operator, the streaming census
    maintainer (``stream_census(..., sum_cols=...)``) and the batch
    oracle all share."""
    if bucket_us <= 0:
        raise ValueError(f"bucket_us must be positive, got {bucket_us}")
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    if quant_scale < 1:
        raise ValueError(f"quant_scale must be positive, got {quant_scale}")
    keys = key_cols or []
    cap = float(1 << 62)
    quant = F.floor(F.col(value_col) * F.lit(quant_scale)).cast("bigint")
    vq = F.when(F.col(value_col).isNull(), F.lit(None).cast("bigint")).when(
        F.abs(F.col(value_col) * F.lit(quant_scale)) < F.lit(cap), quant
    ).otherwise(
        F.raise_error(
            F.lit(
                f"seasonal_profile: |value * {quant_scale}| >= 2^62 "
                "would overflow the per-row quantization; lower "
                "quant_scale"
            )
        ).cast("bigint")
    )
    return df.select(
        *keys,
        (F.expr(f"({ts_col} div {bucket_us})") % F.lit(period)).alias(
            "__pos"
        ),
        vq.alias("__vq"),
    ).filter(F.col("__vq").isNotNull())


def seasonal_from_census(
    census: DataFrame,
    *,
    key_cols: list[str] | None = None,
    position_col: str = "position",
    count_col: str = "n_obs",
    sum_col: str = "sum_q",
) -> DataFrame:
    """Seasonal-index fold over a maintained ``(*keys, position,
    n_obs, sum_q)`` census (r13) — the streaming read side
    (streaming/census.py read_seasonal_profile) and the batch
    operator's shared tail: position sums and counts ADD, so a stream
    maintains the census by per-key addition and this fold re-derives
    the full ratio-to-mean profile.  A late observation revises one
    position's (n, sum), which moves the key totals and therefore
    EVERY position's index — the cross-row damage the census fold
    re-derives and bounded incremental state cannot."""
    keys = key_cols or []
    census = census.select(
        *keys,
        F.col(position_col).alias("__pos"),
        F.col(count_col).cast("bigint").alias("n_obs"),
        F.col(sum_col).cast("decimal(38,0)").alias("__s"),
    )
    totals = census.groupBy(*keys).agg(
        F.sum("n_obs").cast("bigint").alias("__n_all"),
        F.sum("__s").cast("decimal(38,0)").alias("__s_all"),
    )
    out = census.join(totals, keys) if keys else census.crossJoin(
        F.broadcast(totals)
    )
    # DOUBLE envelope for both DECIMAL(38,0) operands (the ab_contingency
    # pattern): a silent decimal overflow would read as NULL,
    # indistinguishable from the zero-total NULL below
    env = F.greatest(
        F.lit(1000.0)
        * F.abs(F.col("__s").cast("double"))
        * F.col("__n_all").cast("double"),
        F.col("n_obs").cast("double")
        * F.abs(F.col("__s_all").cast("double")),
    )
    n_ok = F.when(env <= F.lit(1e37), F.col("n_obs")).otherwise(
        F.raise_error(
            F.lit(
                "seasonal_profile: an index operand exceeds the 1e37 "
                "DECIMAL(38,0) envelope — lower quant_scale"
            )
        ).cast("bigint")
    )
    return out.withColumn("__n_ok", n_ok).select(
        *keys,
        F.col("__pos").alias("position"),
        "n_obs",
        F.expr("CAST(__s div n_obs AS BIGINT)").alias("mean_milli"),
        F.when(
            F.expr("__s_all > 0"),
            F.expr(
                "CAST((1000 * __s * __n_all) div (__n_ok * __s_all) "
                "AS BIGINT)"
            ),
        ).alias("index_milli"),
    )


def mann_kendall(
    series: DataFrame,
    *,
    key_cols: list[str],
    t_col: str,
    y_col: str,
) -> DataFrame:
    """Mann-Kendall monotone-trend test + Theil-Sen slope per key —
    the nonparametric "is this series trending, and how fast?" readout
    (the hydrology/monitoring standard; the timeseries tier's missing
    significance test next to holt/acf/mase, which smooth and describe
    but do not test).

    Exact integer algebra over all ordered pairs of the series CENSUS:

        s         = Σ_{i<j} sign(y_j − y_i)
        var18     = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)   (18·Var(S))
        z2_milli  = (18000·(|s|−1)²) div var18         (s ≠ 0, else 0)
        slope_milli = lower median over pairs of
                      trunc(1000·(y_j − y_i) / (t_j − t_i))

    with ``t`` ranging over tie-group sizes of y.  The continuity-
    corrected z² replays verbatim against a HUGEINT oracle; per-pair
    slopes divide TRUNCATING toward zero (y deltas go negative, and
    Spark ``div`` and DuckDB ``//`` both truncate — the stats-module
    ``-7 // 2 = -3`` DuckDB verification; standard-SQL floor division
    would differ here), and the lower median is the value
    at rank ``(m+1) div 2`` of the sorted slope multiset —
    well-defined under ties.  All-tied (flat) series read z2 = 0 via
    the s = 0 branch — every pair signs 0, so s = 0 whenever var18 = 0;
    the var18 > 0 guard after it is a defensive dead branch, kept so a
    (impossible) s ≠ 0 ∧ var18 = 0 row surfaces as NULL rather than a
    divide-by-zero.  Single-point series emit NULL slope.

    ``series`` must hold ONE row per (key, t) — aggregate upstream
    (the census contract); duplicate time points raise executor-side
    (sign pairs at dt = 0 are undefined), as do series past 1.6e6
    points (var18 is a BIGINT polynomial Θ(n³), past 2^63 there —
    aggregate to a coarser grain; the trend call is saturated long
    before such n).  The z² numerator runs in
    DECIMAL(38,0): |s| ≤ n²/2, so it stays inside 1e38 to n ~ 3e8
    points per key — beyond any physical per-key series; no envelope
    needed where the chi-square family required one.

    Returns ``(*key_cols, n_points, s, var18, slope_milli, z2_milli)``.

    Scale posture (100 TB): the pair fan-out is the series census
    self-joined on the key — n² per KEY, never events² (daily/hourly
    rollups bound n by the calendar; the operator is for rolled-up
    series, stated contract).  One census groupBy feeds a key-keyed
    equi-join; the median window partitions on the key over pair rows.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    from pyspark.sql import Window

    # the census feeds FOUR consumers (both self-join sides, the tie
    # census, the duplicate-t check) — checkpoint lazily so whatever
    # event-scale rollup produced it runs once
    series = series.localCheckpoint(eager=False)
    left = series.select(
        *key_cols,
        F.col(t_col).alias("__t1"),
        F.col(y_col).alias("__y1"),
    )
    right = series.select(
        *key_cols,
        F.col(t_col).alias("__t2"),
        F.col(y_col).alias("__y2"),
    )
    pairs = (
        left.join(right, key_cols)
        .filter(F.col("__t2") > F.col("__t1"))
        .select(
            *key_cols,
            F.signum(
                (F.col("__y2") - F.col("__y1")).cast("double")
            ).cast("bigint").alias("__sgn"),
            F.expr(
                "(1000 * (__y2 - __y1)) div (__t2 - __t1)"
            ).alias("__slope"),
        )
    )
    w_m = Window.partitionBy(*key_cols).orderBy("__slope")
    w_n = Window.partitionBy(*key_cols)
    med = (
        pairs.withColumn("__rn", F.row_number().over(w_m))
        .withColumn("__m", F.count(F.lit(1)).over(w_n))
        .filter(F.expr("__rn = (__m + 1) div 2"))
        .select(*key_cols, F.col("__slope").alias("slope_milli"))
    )
    stat = pairs.groupBy(*key_cols).agg(
        F.sum("__sgn").cast("bigint").alias("s")
    )
    # tie correction from the y census; n and the one-row-per-(key, t)
    # contract from the t census — a duplicate time point would
    # silently skew every pair statistic, so any (key, t) cell with
    # more than one row raises executor-side, threaded into the
    # consumed n_points
    n_chk = (
        series.groupBy(*key_cols, F.col(t_col).alias("__tt"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
        .groupBy(*key_cols)
        .agg(
            F.sum("__c").cast("bigint").alias("__n"),
            F.max("__c").cast("bigint").alias("__cmax"),
        )
        .withColumn(
            "n_points",
            F.when(
                (F.col("__cmax") == 1)
                # var18 = n(n−1)(2n+5) is a BIGINT polynomial Θ(n³) —
                # past 2^63 at n ≈ 1.66e6 points it would silently
                # wrap (the rank_sum var2 lesson); fail fast instead
                & (F.col("__n") <= F.lit(1_600_000)),
                F.col("__n"),
            ).otherwise(
                F.raise_error(
                    F.when(
                        F.col("__cmax") > 1,
                        F.lit(
                            "mann_kendall: duplicate time points in a "
                            "key's series — one row per (key, t) is the "
                            "census contract; aggregate upstream"
                        ),
                    ).otherwise(
                        F.lit(
                            "mann_kendall: series exceeds 1.6e6 points — "
                            "var18 would overflow 64-bit; aggregate to a "
                            "coarser time grain upstream"
                        )
                    )
                ).cast("bigint")
            ),
        )
        .select(*key_cols, "n_points")
    )
    ties = (
        series.groupBy(*key_cols, F.col(y_col).alias("__y"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("__t"))
        .groupBy(*key_cols)
        .agg(
            F.sum(
                F.expr("__t * (__t - 1) * (2 * __t + 5)")
            ).cast("bigint").alias("__tie18"),
        )
        .join(n_chk, key_cols)
    )
    dec = "cast({} as decimal(38,0))"
    out = (
        ties.join(stat, key_cols, "left")
        .join(med, key_cols, "left")
        .withColumn("s", F.coalesce(F.col("s"), F.lit(0).cast("bigint")))
        .withColumn(
            "var18",
            F.expr(
                "n_points * (n_points - 1) * (2 * n_points + 5) - __tie18"
            ).cast("bigint"),
        )
        .select(
            *key_cols,
            "n_points",
            "s",
            "var18",
            "slope_milli",
            F.when(F.col("s") == 0, F.lit(0).cast("bigint"))
            .when(
                F.col("var18") > 0,
                F.expr(
                    f"(18000 * {dec.format('abs(s) - 1')} * "
                    f"{dec.format('abs(s) - 1')}) div {dec.format('var18')}"
                ).cast("bigint"),
            )
            .alias("z2_milli"),
        )
    )
    return out


def ohlc_census_projection(
    df: DataFrame,
    *,
    ts_col: str,
    value_col: str,
    step_us: int,
    key_cols: list[str] | None = None,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """The shared stream/batch projection the OHLC census maintainer
    consumes (streaming/census.py read_ohlc): bucket, the raw value,
    and the ``struct(ts, *ties, value)`` whose lexicographic MIN/MAX
    are the open/close — (ts, *ties) is the same total order the batch
    :func:`ohlc` ranks by, so the struct's value field never
    participates in the comparison; it just RIDES to be read out.
    This is what makes first/last associative (and therefore
    exactly-once maintainable): min and max merge, row_number does not.
    """
    if step_us <= 0:
        raise ValueError(f"step_us must be positive, got {step_us}")
    keys = key_cols or []
    ties = tie_cols or []
    return df.select(
        *keys,
        F.expr(f"{ts_col} div {step_us}").alias("bucket"),
        F.col(value_col).alias("__v"),
        F.struct(
            F.col(ts_col).alias("__t"),
            *[F.col(t).alias(f"__k{i}") for i, t in enumerate(ties)],
            F.col(value_col).alias("__v"),
        ).alias("__ord"),
    )


def ohlc_from_census(census: DataFrame, *, key_cols: list[str] | None = None) -> DataFrame:
    """Fold a maintained ``(*keys, bucket, n_rows, __lo, __hi,
    __first, __last)`` extremum census to the batch :func:`ohlc`
    output shape — open/close read out of the struct extrema's value
    field, high/low the plain extrema, n_events the count."""
    keys = key_cols or []
    return census.select(
        *keys,
        "bucket",
        F.col("__first")["__v"].alias("open"),
        F.col("__hi").alias("high"),
        F.col("__lo").alias("low"),
        F.col("__last")["__v"].alias("close"),
        F.col("n_rows").cast("bigint").alias("n_events"),
    )
