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


def _exact_div_sql(num: str, den: str) -> str:
    """Integral division of non-negative DECIMAL(38,0) operands with a
    DECIMAL(38,0) result.  Spark's ``div`` operator returns BIGINT and
    silently WRAPS when the quotient exceeds 2^63 (caught at sf0.1 by
    the anova external check — ``16601446041675085106`` read back as a
    negative), so quotients that can be Θ(n³) must divide in decimal:
    ``(num − pmod(num, den)) / den`` is exactly divisible, and Spark's
    (38,0)/(38,0) division lands on DECIMAL(38,6) whose 32 integral
    digits hold the quotient exactly.  Callers' capacity envelopes
    must therefore bound the QUOTIENT at 1e31, not just the operands
    at 1e37.  Both operands must be non-negative (pmod == mod there,
    matching the HUGEINT oracle's floor ``//``)."""
    return (
        f"CAST(((({num}) - pmod(({num}), ({den}))) / ({den})) "
        "AS DECIMAL(38,0))"
    )


# Saturation bound for BIGINT-emitting statistic quotients whose
# denominator is a variance-like term that can be arbitrarily small
# (F with near-zero within-variance, chi2 with near-zero V): the
# quotient is mathematically finite but can exceed 2^63, and Spark's
# `div`/CAST would wrap or NULL silently.  4e18 < 2^63 reads as "the
# statistic is saturated" — both engines replay the identical least().
SAT64 = 4_000_000_000_000_000_000


def _sat_div_sql(num: str, den: str) -> str:
    """``least(num div den, 4e18)`` as exact DECIMAL division cast to
    BIGINT — see :func:`_exact_div_sql` for why ``div`` is unsafe and
    ``SAT64`` for the saturation convention.  Oracle replays as
    ``least(num // den, 4000000000000000000)``."""
    return (
        f"CAST(least({_exact_div_sql(num, den)}, "
        f"CAST({SAT64} AS DECIMAL(38,0))) AS BIGINT)"
    )


def mad_anomaly(
    df: DataFrame,
    *,
    x_col: str,
    group_cols: list[str] | None = None,
    k_milli: int = 3000,
) -> DataFrame:
    """Robust median/MAD outlier screen over an integer metric.

    Flags rows where ``|x − median| > (k_milli/1000) · MAD`` per group —
    the classic robust z-score rule, computed EXACTLY: for integer x,
    ``med2 = 2·median`` is the sum of the two middle order statistics
    (twice the middle one for odd n) and ``mad4 = 4·MAD`` is the same
    construction over ``d = |2x − med2|``, so the flag is the integer
    cross-multiplication ``2000·d > k_milli·mad4`` — no float, no
    engine-specific median interpolation.  Degenerate groups where MAD
    is 0 (more than half the values identical) flag any deviation, the
    standard MAD behavior.

    Returns the input group/metric columns plus ``med2``, ``mad4``,
    ``dev2`` (= 2·|x−median|) and ``is_anomaly``.

    Scale posture (100 TB): pure window algebra — the rank windows and
    the median/MAD sums ALL partition on the same group key, so the
    whole screen costs exactly ONE data shuffle (plan-gated); the two
    re-sorts (by x, then by deviation) are partition-local.  No joins,
    no per-group collect.  Selection of the middle order statistics is
    by sorted VALUE, so duplicate metrics cannot make the result
    partitioning-dependent.  With no ``group_cols`` the median is
    inherently global (single-partition window) — group the input for
    distributed use.
    """
    if k_milli <= 0:
        raise ValueError(f"k_milli must be positive, got {k_milli}")
    from pyspark.sql import Window

    groups = group_cols or []
    cw = Window.partitionBy(*groups)

    def with_med_x2(frame: DataFrame, col: str, out: str) -> DataFrame:
        # 2*median as a windowed sum of the two middle order statistics
        # — same partitioning as every other step, zero extra shuffles
        w = Window.partitionBy(*groups).orderBy(F.col(col))
        rn = F.row_number().over(w)
        n = F.count("*").over(cw)
        pick = (
            (F.col("__rn") == F.expr("(__n + 1) div 2")).cast("bigint")
            + (F.col("__rn") == F.expr("__n div 2 + 1")).cast("bigint")
        )
        return (
            frame.withColumn("__rn", rn)
            .withColumn("__n", n)
            .withColumn(out, F.sum(F.col(col) * pick).over(cw))
            .drop("__rn", "__n")
        )

    with_med = with_med_x2(df, x_col, "med2")
    with_dev = with_med.withColumn(
        "dev2", F.abs(F.lit(2) * F.col(x_col) - F.col("med2"))
    )
    with_mad = with_med_x2(with_dev, "dev2", "mad4")
    return with_mad.withColumn(
        "is_anomaly",
        F.lit(2000) * F.col("dev2") > F.lit(k_milli) * F.col("mad4"),
    )


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


def equi_depth_bins(
    df: DataFrame,
    *,
    value_col: str,
    id_col: str,
    n_bins: int,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-depth (quantile) discretization — the feature-engineering
    binning step (scikit-learn ``KBinsDiscretizer(strategy='quantile')``
    class): per optional group, rank rows by ``(value, id)`` — a TOTAL
    order, so bin assignment is partitioning-independent and
    engine-replayable — and split them into ``n_bins`` near-equal-count
    bins (SQL ``ntile`` semantics: the first ``n mod n_bins`` bins get
    the extra row).  NULL values are excluded (no bin).

    Returns one row per input row: ``(*key_cols, id, value, bin)`` with
    ``bin`` in [1, n_bins].  Ties across a bin boundary are split by id
    — equi-DEPTH by contract (exact counts), not equi-boundary; callers
    needing all-equal-values-share-a-bin semantics want a rank/histogram
    screen (``quantile_filter``) instead, and the id tiebreak is what
    keeps the assignment deterministic.

    Scale posture (100 TB): ONE window shuffle on the group key.  The
    global (ungrouped) form rides :func:`~.ranking.distributed_ntile`
    (r12 — census-decomposed exact NTILE, no single-partition exchange,
    eager census collect at call time), so it holds at fact scale too;
    it requires an exact-integer or float/double value column and a
    non-NULL integer-or-orderable id (the rank bucketing contract —
    NaN values fail fast there, where the grouped window would sort
    them last).
    """
    from pyspark.sql import Window

    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    keys = key_cols or []
    clean = df.filter(F.col(value_col).isNotNull()).select(
        *keys, id_col, value_col
    )
    if not keys:
        from .ranking import distributed_ntile

        return distributed_ntile(
            clean,
            metric_col=value_col,
            tie_cols=[id_col],
            n_tiles=n_bins,
            out_col="bin",
        )
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        F.col(value_col), F.col(id_col)
    )
    return clean.withColumn("bin", F.ntile(n_bins).over(w))


def corr_pairs(
    df: DataFrame,
    *,
    value_cols: list[str],
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Pairwise Pearson correlation matrix over INTEGER columns — the
    feature-selection / profiling staple — in ONE map-side-combinable
    aggregate pass, deterministic across engines.

    Listwise complete-case semantics: rows with a NULL in ANY value
    column are excluded (the standard corr-matrix contract, and the one
    that keeps every pair on the same n).  Sufficient statistics
    (n, sum, sum of squares, sum of products) accumulate as exact
    DECIMAL(38,0) integers; the finish casts each EXACT integer to
    double once and evaluates

        corr = (n*sxy - sx*sy) / (sqrt(n*sxx - sx^2) * sqrt(n*syy - sy^2))

    in a fixed expression order — IEEE multiply/subtract/divide/sqrt
    are all correctly rounded, so identical exact inputs give
    bit-identical doubles in Spark and DuckDB (rounded to 6 decimals as
    belt-and-braces).  Degenerate pairs (either variance 0) give NULL.

    Returns long form: ``(*key_cols, col_a, col_b, n, corr)`` for each
    unordered pair col_a < col_b (input order).

    Scale posture (100 TB): one groupBy with k + k + k(k+1)/2 combinable
    sums — the canonical partial-agg shape; the pair explosion happens
    on the single aggregate row per group (row-local stack), never on
    data.  k is the column count — keep it dimension-sized (tens).
    """
    if len(value_cols) < 2:
        raise ValueError(
            f"corr_pairs needs >= 2 value columns, got {value_cols}"
        )
    if len(set(value_cols)) != len(value_cols):
        raise ValueError(f"duplicate value columns: {value_cols}")
    keys = key_cols or []
    complete = df
    for c in value_cols:
        complete = complete.filter(F.col(c).isNotNull())
    # positional aliases: name-based aliases like __p_{a}_{b} COLLIDE
    # for underscore-containing column names (('a','b_c') vs ('a_b','c'))
    # and Spark raises AMBIGUOUS_REFERENCE — indices cannot collide
    aggs = [F.count("*").alias("__n")]
    for i, c in enumerate(value_cols):
        aggs.append(F.sum(F.col(c).cast(_D)).alias(f"__s_{i}"))
    for i, a in enumerate(value_cols):
        for j in range(i, len(value_cols)):
            b = value_cols[j]
            aggs.append(
                F.sum(F.col(a).cast(_D) * F.col(b).cast(_D)).alias(
                    f"__p_{i}_{j}"
                )
            )
    agg = complete.groupBy(*keys).agg(*aggs)
    pos = {c: i for i, c in enumerate(value_cols)}

    def corr_expr(a: str, b: str) -> F.Column:
        i, j = pos[a], pos[b]
        n = F.col("__n").cast("double")
        sa = F.col(f"__s_{i}").cast("double")
        sb = F.col(f"__s_{j}").cast("double")
        saa = F.col(f"__p_{i}_{i}").cast("double")
        sbb = F.col(f"__p_{j}_{j}").cast("double")
        sab = F.col(f"__p_{i}_{j}").cast("double")
        var_a = n * saa - sa * sa
        var_b = n * sbb - sb * sb
        return F.when(
            (var_a > 0) & (var_b > 0),
            F.round(
                (n * sab - sa * sb) / (F.sqrt(var_a) * F.sqrt(var_b)), 6
            ),
        )

    # ONE plan: the pair matrix explodes from the single aggregate row
    # per group (a union of per-pair selects would re-plan — and without
    # reuse re-execute — the aggregate once per pair)
    pair_structs = [
        F.struct(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            corr_expr(a, b).alias("corr"),
        )
        for i, a in enumerate(value_cols)
        for b in value_cols[i + 1 :]
    ]
    return (
        agg.select(
            *keys,
            F.col("__n").cast("bigint").alias("n"),
            F.explode(F.array(*pair_structs)).alias("__pair"),
        )
        .select(*keys, "__pair.col_a", "__pair.col_b", "n", "__pair.corr")
    )


def weighted_quantiles(
    df: DataFrame,
    *,
    value_col: str,
    weight_col: str,
    group_cols: list[str] | None = None,
    percents: list[int] = (50, 90, 99),
) -> DataFrame:
    """Exact weighted quantiles per group — the traffic-weighted-latency
    / quantity-weighted-price staple: the p-th weighted quantile is the
    SMALLEST value whose running weight (in ``(value, weight)`` order,
    weight as the deterministic tie-break) reaches ``p%`` of the group's
    total weight.  The rank test cross-multiplies in integers
    (``100 * cumw >= p * totw``) — no float division anywhere, so a SQL
    oracle replays it bit-for-bit.  Rows with NULL value or NULL /
    non-positive weight are excluded (a zero-weight observation cannot
    carry a quantile).

    Returns one row per group: ``(*group_cols, total_weight,
    wq_p{p}...)``.

    Scale posture (100 TB): ONE window shuffle on the group key (the
    running-sum and total-sum windows share its partitioning) + the
    final groupBy reusing it — same single-exchange shape as the OHLC
    and HDR operators.  For heavy groups pre-aggregate equal values
    upstream (sum their weights) — the algebra is unchanged.  The
    UNGROUPED form rides :func:`~.ranking.distributed_rank`'s running
    weight sum (r12 — census-decomposed, no single-partition exchange,
    eager census collect at call time), so it holds at fact scale too;
    it requires an exact-integer or float/double value column (the
    rank bucketing contract — NaN values fail fast there).
    """
    from pyspark.sql import Window

    ps = list(percents)
    if not ps or any(p < 1 or p > 100 for p in ps):
        raise ValueError(f"percents must be within [1, 100], got {ps}")
    groups = group_cols or []
    # cast FIRST, screen on the cast value: filtering the raw column
    # lets a fractional weight in (0, 1) pass >0 and then truncate to 0,
    # collapsing every quantile to the group minimum (review fix) —
    # weights are integer by contract, truncation is the cast's rounding
    d = df.select(
        *groups,
        F.col(value_col).alias("__v"),
        F.col(weight_col).cast("bigint").alias("__w"),
    ).filter(
        F.col("__v").isNotNull()
        & F.col("__w").isNotNull()
        & (F.col("__w") > 0)
    )
    # Overflow contract (fail-fast, mirroring abc_classes): the rank
    # test cross-multiplies 100 * cumw, so the group total must fit
    # (2^63 - 1) div 100 (~9.2e16) or the comparison silently wraps and
    # corrupts every quantile.  cumw <= totw, so guarding the total
    # covers both sides.  Larger totals: pre-scale the weight units
    # (the quantiles are weight-scale-invariant).
    lim = ((1 << 63) - 1) // 100
    if not groups:
        from .ranking import distributed_rank

        # (__v, __w) is not unique per row, outside distributed_rank's
        # letter — sound HERE because rows tying on both are
        # indistinguishable: the multiset of (__v, __cumw) per tie
        # group is deterministic (base + k*w for k = 1..ties), and the
        # aggregate below consumes only (__v, __cumw, __totw).
        rk = distributed_rank(
            d,
            metric_col="__v",
            tie_cols=["__w"],
            rank_col="__rk",
            cumsum_col="__cumw",
            cumsum_source_col="__w",
        )
        if rk.sum_total > lim:
            raise ValueError(
                f"weighted_quantiles: total weight exceeds {lim} — the "
                "100x rank cross-multiply would wrap int64; pre-scale "
                "the weight units (quantiles are weight-scale-invariant)"
            )
        cum = rk.df.drop("__rk").withColumn(
            "__totw", F.lit(rk.sum_total).cast("bigint")
        )
    else:
        w = Window.partitionBy(*[F.col(g) for g in groups]).orderBy(
            F.col("__v"), F.col("__w")
        )
        totw = F.sum("__w").over(
            w.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        cum = d.withColumn(
            "__cumw",
            F.sum("__w").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        ).withColumn(
            "__totw",
            # threaded into the column the rank test and the
            # total_weight output both consume, so Catalyst cannot
            # prune the executor-side guard
            F.when(totw <= F.lit(lim), totw).otherwise(
                F.raise_error(
                    F.lit(
                        f"weighted_quantiles: group total weight exceeds "
                        f"{lim} — the 100x rank cross-multiply would wrap "
                        "int64; pre-scale the weight units (quantiles "
                        "are weight-scale-invariant)"
                    )
                ).cast("bigint")
            ),
        )
    aggs = [F.max("__totw").cast("bigint").alias("total_weight")]
    for p in ps:
        aggs.append(
            F.min(
                F.when(
                    F.lit(100) * F.col("__cumw") >= F.lit(p) * F.col("__totw"),
                    F.col("__v"),
                )
            ).alias(f"wq_p{p}")
        )
    return cum.groupBy(*groups).agg(*aggs)


def binned_ks_drift(
    ref: DataFrame,
    cur: DataFrame,
    *,
    value_col: str,
    n_bins: int = 20,
    quant_scale: int = 1000,
) -> DataFrame:
    """Two-sample distribution-drift screen on a shared equal-width
    binning — the binned Kolmogorov-Smirnov statistic in EXACT integers
    (the dataset-shift check a training pipeline runs between a
    reference snapshot and fresh data before mixing them).

    Bins derive from the REFERENCE sample alone (so the screen is
    stable under current-data drift): values quantize to integers,
    ``w = ((max_ref - min_ref) div n_bins) + 1`` and ``bin =
    clamp((x - min_ref) div w, 0, n_bins - 1)`` — current values
    outside the reference range clamp into the edge bins (stated; edge
    mass IS drift signal).  Per bin the output carries both counts,
    both cumulative counts, and

        delta_scaled = |cum_cur * n_ref_total - cum_ref * n_cur_total|

    an exact BIGINT — the KS distance at that bin boundary scaled by
    ``n_ref_total * n_cur_total``; ``ks_scaled`` (the max over bins,
    same value on every row) divided by that product is the classic D
    statistic, left to the caller as one exact division.  Empty bins
    appear with zero counts (the bin spine is generated, not observed),
    so cumulative sums are well-defined everywhere.

    Returns ``(bin, lo_scaled, n_ref, n_cur, cum_ref, cum_cur,
    delta_scaled, ks_scaled)``.

    Scale posture (100 TB): two map-side-combinable bin censuses (the
    only data-sized work — one pass over each sample) + constant-size
    frames after that: the bin spine is ``n_bins`` rows, the cumulative
    window runs on it single-partition BY DESIGN (20 rows), and the
    reference stats ride a broadcast one-row aggregate.  Overflow:
    ``cum * total`` is guarded in DOUBLE against 2^62 (fail-fast,
    threaded into the consumed count), covering samples to ~2e9 rows
    each; beyond that, pre-aggregate or sample — D is scale-free.
    """
    stats, rb = ks_reference(
        ref, value_col=value_col, n_bins=n_bins, quant_scale=quant_scale
    )
    cb = ks_census(cur, stats, value_col=value_col, out_name="n_cur")
    return ks_from_censuses(ref.sparkSession, stats, rb, cb, n_bins=n_bins)


def ks_census(
    df: DataFrame,
    stats: DataFrame,
    *,
    value_col: str,
    out_name: str,
) -> DataFrame:
    """One sample's bin census against the reference binning — the
    shared quantize/clamp/count front end.  The binning knobs
    (quant_scale, n_bins) are READ FROM the stats frame's ``__qs`` /
    ``__nb`` columns, never re-passed, so a caller CANNOT quantize or
    clamp a census differently than the reference that built the stats
    (the desync the refactor exists to forbid)."""
    bin_of = F.expr(
        "least(__nb - 1, greatest(cast(0 as bigint), (__x - __lo) div __w))"
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(F.col(value_col).alias("__v"))
        .crossJoin(F.broadcast(stats))
        .withColumn("__x", F.floor(F.col("__v") * F.col("__qs")).cast("bigint"))
        .select(bin_of.alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").cast("bigint").alias(out_name))
    )


def ks_reference(
    ref: DataFrame, *, value_col: str, n_bins: int, quant_scale: int
) -> tuple[DataFrame, DataFrame]:
    """The reference side of the drift screen: the one-row (lo, width,
    n_ref_total) stats frame and the reference bin census.  Validates
    the knobs for every caller (batch and stream)."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    if quant_scale < 1:
        raise ValueError(f"quant_scale must be >= 1, got {quant_scale}")
    q = F.floor(F.col(value_col) * F.lit(quant_scale)).cast("bigint")
    r = ref.filter(F.col(value_col).isNotNull()).select(q.alias("__x"))
    stats = r.agg(
        F.min("__x").alias("__lo"),
        # exact integer width: span div n_bins (non-negative) + 1, so
        # max_ref lands in bin n_bins - 1, never n_bins
        F.expr(f"((max(__x) - min(__x)) div {n_bins}) + 1").alias("__w"),
        F.count("*").cast("bigint").alias("__nr"),
        # the binning knobs ride ON the frame: every census and the
        # spine guard derive from these columns, so they cannot drift
        F.lit(n_bins).cast("bigint").alias("__nb"),
        F.lit(quant_scale).cast("bigint").alias("__qs"),
    ).select(
        # fail-fast on an empty (or all-NULL) reference: without this,
        # __lo/__w are NULL, every census bin is NULL, both censuses
        # join as zeros and the screen reports ks_scaled = 0 — an empty
        # reference silently reading as "no drift" is the worst failure
        # mode a drift monitor has.  Threaded into __lo, which every
        # census (bin_of) and the spine (lo_scaled) consume, so it
        # cannot be pruned away.  __nr is a count: never NULL, so the
        # when/otherwise branch order is NULL-safe.
        F.when(F.col("__nr") > 0, F.col("__lo"))
        .otherwise(
            F.raise_error(
                F.lit(
                    "ks_reference: the reference sample is empty (or "
                    "all-NULL) — a drift screen against nothing would "
                    "read as 'no drift'; supply a non-empty reference"
                )
            ).cast("bigint")
        )
        .alias("__lo"),
        "__w",
        "__nr",
        "__nb",
        "__qs",
    )
    rb = ks_census(ref, stats, value_col=value_col, out_name="n_ref")
    return stats, rb


def ks_from_censuses(
    spark, stats: DataFrame, rb: DataFrame, cb: DataFrame, *, n_bins: int
) -> DataFrame:
    """The CDF/KS algebra of :func:`binned_ks_drift` given the two bin
    censuses — the shared core the streaming twin folds incrementally
    (bin counts are ASSOCIATIVE, so a stream maintains ``cb`` by
    per-bin addition and re-derives this constant-size frame per
    batch).  ``stats`` is the reference one-row (lo, w, n_ref_total)
    frame; ``rb``/``cb`` are (bin, n_ref)/(bin, n_cur) censuses; the
    current total is the census sum (every clamped value lands in a
    bin, so the sum IS the row count)."""
    from pyspark.sql import Window

    n_cur = cb.agg(
        F.coalesce(F.sum("n_cur"), F.lit(0)).cast("bigint").alias("__nc")
    )
    spine = (
        spark.range(n_bins)
        .select(F.col("id").cast("bigint").alias("bin"))
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(n_cur))
    )
    w_cum = (
        Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    )
    joined = (
        spine.join(rb, "bin", "left")
        .join(cb, "bin", "left")
        .select(
            "bin",
            # executor fail-fast: a spine built with a different n_bins
            # than the stats frame's stamped knob would silently drop or
            # zero-pad bins — threaded into lo_scaled, which every
            # output row consumes
            F.when(
                F.col("__nb") == F.lit(n_bins),
                F.col("__lo") + F.col("bin") * F.col("__w"),
            ).otherwise(
                F.raise_error(
                    F.lit(
                        "ks_from_censuses: n_bins disagrees with the "
                        "stats frame's stamped binning — rebuild the "
                        "censuses via ks_reference/ks_census"
                    )
                ).cast("bigint")
            ).alias("lo_scaled"),
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
            F.col("__nr").alias("__nrt"),
            F.col("__nc").alias("__nct"),
        )
        .withColumn("cum_ref", F.sum("n_ref").over(w_cum))
        .withColumn("cum_cur", F.sum("n_cur").over(w_cum))
    )
    env = (
        F.greatest(F.col("__nrt"), F.col("__nct")).cast("double")
        * F.greatest(F.col("__nrt"), F.col("__nct")).cast("double")
    )
    cum_cur_ok = F.when(
        env <= F.lit(float(1 << 62)), F.col("cum_cur")
    ).otherwise(
        F.raise_error(
            F.lit(
                "binned_ks_drift: n_ref * n_cur exceeds the 2^62 "
                "cross-multiply envelope — sample or pre-aggregate "
                "(the D statistic is scale-free)"
            )
        ).cast("bigint")
    )
    delta = F.abs(
        cum_cur_ok * F.col("__nrt") - F.col("cum_ref") * F.col("__nct")
    )
    out = joined.withColumn("delta_scaled", delta).withColumn(
        "ks_scaled",
        F.max("delta_scaled").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ),
    )
    return out.select(
        "bin", "lo_scaled", "n_ref", "n_cur", "cum_ref", "cum_cur",
        "delta_scaled", "ks_scaled",
    )


def quantile_normalize(
    src: DataFrame,
    ref: DataFrame,
    *,
    value_col: str,
    group_cols: list[str],
    tie_cols: list[str],
    out_col: str = "normalized_value",
    broadcast_ref: bool = True,
) -> DataFrame:
    """Quantile normalization — map each group's value distribution
    onto the REFERENCE distribution (the cross-source score calibration
    step before mixing corpora scored by different models: after it,
    every group's scores are comparable because they share the
    reference's exact marginal distribution).

    Exact rank algebra, zero float computation: within each group,
    rows rank ``r`` in 1..n_s by ``(value, *tie_cols)``; the reference
    ranks 1..n_ref the same way; the output value is the reference
    value at rank ``ceil(r * n_ref / n_s) = (r*n_ref + n_s - 1) div
    n_s`` — COPIED verbatim (doubles hash identically across engines
    when copied, never recomputed).  NULL values are excluded from
    both sides.

    Returns ``src``'s rows (group cols, tie cols, the original value)
    plus ``out_col``.

    Scale posture (100 TB): per-group ranking partitions on the group
    key (the standing per-key window contract); the REFERENCE ranking
    rides :func:`~.ranking.distributed_rank` (r12 — census-decomposed,
    bit-identical to the SQL window, NO single-partition exchange), so
    the reference may be fact-scale.  The rank join is an int-key
    equi-join, hinted broadcast by default (``broadcast_ref=True`` —
    references are typically dimension-sized or sampled snapshots);
    pass ``broadcast_ref=False`` for a fact-scale reference and the
    join shuffles on the rank key.  Eager like ``distributed_rank``
    (the reference census collects at call time).  The value column
    must be exact-integer or float/double (the rank bucketing
    contract); NaN reference/source values fail fast — a NaN has no
    place in a rank mapping.  Overflow: ``r * n_ref`` guarded in
    DOUBLE against 2^62 (fail-fast threaded into the consumed rank).
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if not tie_cols:
        raise ValueError(
            "tie_cols must be non-empty (ranking needs a total order)"
        )
    from pyspark.sql import Window

    from .ranking import distributed_rank

    r_clean = ref.filter(F.col(value_col).isNotNull())
    rk = distributed_rank(
        r_clean.select(value_col, *tie_cols),
        metric_col=value_col,
        tie_cols=tie_cols,
        rank_col="__rr",
    )
    ranked_ref = rk.df.select("__rr", F.col(value_col).alias(out_col))
    w_grp = Window.partitionBy(*group_cols)
    w_rank = w_grp.orderBy(F.col(value_col), *[F.col(t) for t in tie_cols])
    s = (
        src.filter(F.col(value_col).isNotNull())
        .withColumn("__r", F.row_number().over(w_rank).cast("bigint"))
        .withColumn(
            "__ns",
            F.count("*").over(
                w_grp.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
        # n_ref rides as a literal: distributed_rank's census pass
        # already counted the reference, so re-aggregating it would buy
        # a SinglePartition gather for a number we hold (r12)
        .withColumn("__nr", F.lit(rk.n_total).cast("bigint"))
    )
    env = F.col("__r").cast("double") * F.col("__nr").cast("double")
    r_ok = F.when(env <= F.lit(float(1 << 62)), F.col("__r")).otherwise(
        F.raise_error(
            F.lit(
                "quantile_normalize: rank * n_ref exceeds 2^62 — sample "
                "the reference (the mapping is a step function; sampling "
                "only coarsens the grid)"
            )
        ).cast("bigint")
    )
    # fail-fast on an empty (or all-NULL) reference: every mapped rank
    # would be 0, the __rr join would match nothing, and a pipeline
    # calibrating against an accidentally-empty reference would get an
    # EMPTY output instead of an error (ADVICE r10).  An INNER-join
    # guard dies here — AQE's empty-relation propagation prunes the
    # whole join (and any guard upstream of it) when the broadcast side
    # is empty — so the join is LEFT and the guard rides the consumed
    # output column: a non-empty reference matches every mapped rank
    # (__rr lands in [1, n_ref] by construction), so a NULL match IS
    # the empty-reference signal.  Fires only when src has rows (empty
    # src -> empty output stays legitimate).
    ref_side = F.broadcast(ranked_ref) if broadcast_ref else ranked_ref
    mapped = (
        s.withColumn("__ro", r_ok)
        .withColumn("__rr", F.expr("(__ro * __nr + __ns - 1) div __ns"))
        .join(ref_side, "__rr", "left")
        .withColumn(
            out_col,
            F.when(F.col(out_col).isNotNull(), F.col(out_col)).otherwise(
                F.raise_error(
                    F.lit(
                        "quantile_normalize: the reference is empty (or "
                        "all-NULL) — calibrating against nothing would "
                        "emit an empty result; supply a non-empty "
                        "reference"
                    )
                ).cast(dict(ranked_ref.dtypes)[out_col])
            ),
        )
    )
    return mapped.select(
        *group_cols, *tie_cols, value_col, out_col
    )


def winsorize(
    df: DataFrame,
    *,
    value_col: str,
    group_cols: list[str],
    tie_cols: list[str],
    p_lo: int = 1,
    p_hi: int = 99,
    out_col: str = "clipped_value",
) -> DataFrame:
    """Percentile winsorization — clip each group's values into
    [p_lo-th, p_hi-th percentile], the robust-preprocessing staple
    before averaging skewed metrics or training on noisy scores.

    Exact order statistics, zero float computation: rows rank by
    ``(value, *tie_cols)`` within the group; the clip bounds are the
    SMALLEST values whose rank clears ``ceil(p * n / 100)`` (the same
    integer rank test as ``weighted_quantiles`` at weight 1, cross-
    multiplied ``100 * rank >= p * n``), and the clipped output is
    either the original value or a COPIED bound — never a computed
    float, so the hash compare covers doubles for free.  NULL values
    pass through with NULL output (no observation, no clip).

    Returns one row per input row PROJECTED to ``(*group_cols,
    *tie_cols, value_col, out_col, is_clipped)`` — other input columns
    are dropped (join them back on the tie columns if needed; the
    narrow projection is what keeps the shuffle payload lean).

    Scale posture (100 TB): ONE hash exchange on the group key — the
    rank window, the group count, both bound selections (windowed
    conditional mins) and the final projection all share its
    partitioning (plan-gated).  Per-group series on one partition: the
    standing per-key window contract.
    """
    if not 1 <= p_lo <= p_hi <= 100:
        raise ValueError(
            f"need 1 <= p_lo <= p_hi <= 100, got ({p_lo}, {p_hi})"
        )
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    from pyspark.sql import Window

    w_grp = Window.partitionBy(*group_cols)
    w_all = w_grp.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_rank = w_grp.orderBy(F.col(value_col), *[F.col(t) for t in tie_cols])
    nn = df.filter(F.col(value_col).isNotNull())
    ranked = nn.withColumn(
        "__r", F.row_number().over(w_rank).cast("bigint")
    ).withColumn("__n", F.count("*").over(w_all))
    lo_val = F.min(
        F.when(
            F.lit(100) * F.col("__r") >= F.lit(p_lo) * F.col("__n"),
            F.col(value_col),
        )
    ).over(w_all)
    hi_val = F.min(
        F.when(
            F.lit(100) * F.col("__r") >= F.lit(p_hi) * F.col("__n"),
            F.col(value_col),
        )
    ).over(w_all)
    clipped = ranked.withColumn("__lo", lo_val).withColumn("__hi", hi_val)
    out = clipped.withColumn(
        out_col,
        F.least(F.greatest(F.col(value_col), F.col("__lo")), F.col("__hi")),
    ).withColumn("is_clipped", F.col(out_col) != F.col(value_col))
    kept = out.select(
        *group_cols, *tie_cols, value_col, out_col, "is_clipped"
    )
    nulls = df.filter(F.col(value_col).isNull()).select(
        *group_cols,
        *tie_cols,
        value_col,
        F.lit(None).cast(
            df.schema[value_col].dataType
        ).alias(out_col),
        F.lit(None).cast("boolean").alias("is_clipped"),
    )
    return kept.unionByName(nulls)


def rfm_segments(
    orders: DataFrame,
    *,
    customer_col: str,
    ts_col: str,
    value_col: str,
    n_tiers: int = 5,
    quant_scale: int = 1000,
) -> DataFrame:
    """RFM segmentation — the classic customer-analytics tiering
    (Recency / Frequency / Monetary, each ntile'd into ``n_tiers``):

    - recency   = max(ts) over all orders - customer's max(ts) (exact
      integer time units; 0 = ordered on the dataset's last day);
    - frequency = the customer's order count;
    - monetary  = the customer's value sum, quantized to integers.

    Tiers are SQL ``ntile(n_tiers)`` over deterministic total orders
    (metric, then customer id as the tie-break — engine-replayable):
    r_tier orders recency ASCENDING (most recent = tier 1), f_tier and
    m_tier order their metric DESCENDING (heaviest = tier 1), the
    marketing convention where segment '111' is the best customer.

    Returns one row per customer: ``(customer, recency, n_orders,
    monetary_scaled, r_tier, f_tier, m_tier)``.

    Scale posture (100 TB, r11): ONE map-side-combinable groupBy
    collapses the fact table to customer aggregates, lazily
    localCheckpointed once (four consumers); the global last-order
    timestamp is a one-row aggregate folded in as a literal; the three
    ntile tiers run on :func:`~.ranking.distributed_ntile` — exact
    census-decomposed ranks, bit-identical to the SQL windows the
    oracle replays, with NO single-partition exchange anywhere
    (plan-gated; this closed the r10 verdict's last single-partition
    window family).  The three tier frames join back on the unique
    customer key.  NULL timestamps/values are excluded from the
    aggregates (no observation); a NULL customer key fails fast inside
    the rank machinery (a total order admits no NULL tie).
    """
    if n_tiers < 2:
        raise ValueError(f"n_tiers must be >= 2, got {n_tiers}")
    if quant_scale < 1:
        raise ValueError(f"quant_scale must be >= 1, got {quant_scale}")
    from .ranking import distributed_ntile

    base = orders.filter(
        F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
    )
    agg = base.groupBy(F.col(customer_col).alias("customer")).agg(
        F.max(F.col(ts_col)).cast("bigint").alias("__last"),
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum(F.floor(F.col(value_col) * F.lit(quant_scale)).cast("bigint"))
        .alias("monetary_scaled"),
    )
    # one lazy checkpoint: the max-aggregate, the three tier passes and
    # the final projection all read the customer dimension — without
    # this the fact groupBy would re-execute per consumer
    dim = agg.localCheckpoint(eager=False)
    last = dim.agg(F.max("__last")).collect()[0][0]
    if last is None:  # no observations at all: empty output, full schema
        return dim.select(
            "customer",
            F.lit(None).cast("bigint").alias("recency"),
            "n_orders",
            "monetary_scaled",
            *[
                F.lit(None).cast("int").alias(t)
                for t in ("r_tier", "f_tier", "m_tier")
            ],
        )
    with_r = dim.withColumn(
        "recency", (F.lit(int(last)) - F.col("__last")).cast("bigint")
    )
    r_t = distributed_ntile(
        with_r.select("customer", "recency"),
        metric_col="recency", tie_cols=["customer"],
        n_tiles=n_tiers, out_col="r_tier",
    )
    f_t = distributed_ntile(
        dim.select("customer", "n_orders"),
        metric_col="n_orders", tie_cols=["customer"],
        n_tiles=n_tiers, descending=True, out_col="f_tier",
    )
    m_t = distributed_ntile(
        dim.select("customer", "monetary_scaled"),
        metric_col="monetary_scaled", tie_cols=["customer"],
        n_tiles=n_tiers, descending=True, out_col="m_tier",
    )
    return (
        with_r.select(
            "customer", "recency", "n_orders", "monetary_scaled"
        )
        .join(r_t.select("customer", "r_tier"), "customer")
        .join(f_t.select("customer", "f_tier"), "customer")
        .join(m_t.select("customer", "m_tier"), "customer")
    )


def gini_index(
    df: DataFrame,
    *,
    value_col: str,
    group_cols: list[str],
    tie_cols: list[str],
    quant_scale: int = 1000,
) -> DataFrame:
    """Gini concentration index per group — the inequality measure next
    to the ABC tiers (revenue concentration per segment, token-count
    concentration per source): for non-negative values sorted
    ascending,

        G = (2 * sum(i * x_i) - (n + 1) * sum(x)) / (n * sum(x))

    with rank i from a deterministic ``(value, *tie_cols)`` order.
    Numerator and denominator are exact BIGINTs (values quantize to
    integers); ``gini`` is ONE double division of the two — engine-
    identical, hash-comparable.  NULL values are excluded; negative
    values raise executor-side (the index is undefined under them);
    zero-sum groups yield NULL gini (SQL NULL division).

    Returns one row per group: ``(*group_cols, n, sum_scaled,
    gini_num, gini_den, gini)``.

    Scale posture (100 TB): ONE hash exchange on the group key — the
    rank window and the final groupBy share its partitioning
    (plan-gated).  Overflow: ``i * x`` summed over n is bounded by
    n^2 * max_x, guarded in DOUBLE against 2^62 with the guard threaded
    into the consumed quantized column.
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if not tie_cols:
        raise ValueError(
            "tie_cols must be non-empty (ranking needs a total order)"
        )
    if quant_scale < 1:
        raise ValueError(f"quant_scale must be >= 1, got {quant_scale}")
    from pyspark.sql import Window

    w_grp = Window.partitionBy(*group_cols)
    w_all = w_grp.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_rank = w_grp.orderBy(F.col(value_col), *[F.col(t) for t in tie_cols])
    xq = F.floor(F.col(value_col) * F.lit(quant_scale)).cast("bigint")
    base = (
        df.filter(F.col(value_col).isNotNull())
        .withColumn("__x0", xq)
        .withColumn("__r", F.row_number().over(w_rank).cast("bigint"))
        .withColumn("__n", F.count("*").over(w_all))
        .withColumn("__mx", F.max(F.abs(xq)).over(w_all))
    )
    env = (
        F.col("__n").cast("double")
        * F.col("__n").cast("double")
        * F.col("__mx").cast("double")
    )
    guarded = (
        F.when(
            F.col("__x0") < 0,
            F.raise_error(
                F.lit(
                    "gini_index: negative value — the index is undefined; "
                    "shift or screen the metric upstream"
                )
            ).cast("bigint"),
        )
        .when(env > F.lit(float(1 << 62)),
              F.raise_error(
                  F.lit(
                      "gini_index: n^2 * max exceeds 2^62 and the rank "
                      "sums would wrap int64 — lower quant_scale or "
                      "pre-aggregate equal values"
                  )
              ).cast("bigint"))
        .otherwise(F.col("__x0"))
    )
    agg = base.withColumn("__x", guarded).groupBy(*group_cols).agg(
        F.max("__n").cast("bigint").alias("n"),
        F.sum("__x").alias("sum_scaled"),
        F.sum(F.col("__r") * F.col("__x")).alias("__rx"),
    )
    num = (
        F.lit(2) * F.col("__rx")
        - (F.col("n") + F.lit(1)) * F.col("sum_scaled")
    )
    den = F.col("n") * F.col("sum_scaled")
    return agg.select(
        *group_cols,
        "n",
        "sum_scaled",
        num.alias("gini_num"),
        den.alias("gini_den"),
        (
            num.cast("double")
            / F.when(den > 0, den).cast("double")
        ).alias("gini"),
    )


def ab_contingency(
    units: DataFrame,
    *,
    arm_col: str,
    outcome_col: str,
    group_cols: list[str],
) -> DataFrame:
    """Two-proportion experiment readout per group — the 2x2
    contingency table with the exact Pearson chi-square statistic in
    milli units:

        chi2_milli = (1000 * N * (a*d - b*c)^2)
                     div ((a+b) * (c+d) * (a+c) * (b+d))

    where ``a/b`` are control converted/not and ``c/d`` treatment
    converted/not.  Every operand is an exact integer; BOTH operands
    run in DECIMAL(38,0) (the numerator reaches ``62.5 * N^5`` in the
    worst case and the denominator ``N^4/16`` — int64 wraps the
    denominator near N ~ 3e9 and the numerator near N ~ 4e3) and the
    integral ``div`` lands back in BIGINT, so the statistic replays
    verbatim against a HUGEINT oracle.  Capacity is guarded, not
    assumed: both operands are enveloped in DOUBLE against 1e37
    (executor fail-fast threaded into the consumed count — a silent
    DECIMAL(38) overflow would read as NULL, indistinguishable from
    the degenerate-margin NULL below), which carries groups to
    N ~ 1e7 in the balanced worst case; beyond that, sample units —
    at such N the significance call is saturated anyway and the milli
    rates are exact at any N.  Degenerate tables (an empty margin —
    all one arm, or all one outcome) yield NULL chi2_milli, never a
    fake zero.

    ``arm_col`` must be 0/1 (control/treatment) and ``outcome_col``
    boolean; rows are UNITS (users), deduplicated upstream — the
    operator never double-counts because it only aggregates what it is
    given.  Returns ``(*group_cols, n_units, a, b, c, d,
    rate_ctl_milli, rate_trt_milli, chi2_milli)``.

    Scale posture (100 TB): ONE map-side-combinable groupBy — four
    conditional counts per group; everything after is per-group scalar
    algebra.  No window, no join.
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    arm = F.col(arm_col)
    out = F.col(outcome_col)
    bad = (
        arm.isNull()
        | out.isNull()
        | ~arm.cast("bigint").isin(0, 1)
    )
    arm_ok = F.when(~bad, arm.cast("bigint")).otherwise(
        F.raise_error(
            F.lit(
                "ab_contingency: arm must be 0/1 and arm/outcome "
                "non-NULL — a unit outside the experiment's frame has "
                "no cell in the table; filter upstream"
            )
        ).cast("bigint")
    )
    cells = units.withColumn("__arm", arm_ok).groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_units"),
        F.sum(((F.col("__arm") == 0) & out).cast("bigint")).alias("a"),
        F.sum(((F.col("__arm") == 0) & ~out).cast("bigint")).alias("b"),
        F.sum(((F.col("__arm") == 1) & out).cast("bigint")).alias("c"),
        F.sum(((F.col("__arm") == 1) & ~out).cast("bigint")).alias("d"),
    )
    # DOUBLE envelopes for BOTH decimal operands (review fix: the raw
    # BIGINT (a+b)*(c+d) product wrapped near 3e9 per arm, and the
    # DECIMAL(38) numerator overflows to a silent NULL near N ~ 1e7 —
    # indistinguishable from the degenerate-margin NULL); threaded into
    # the consumed n_units factor so Catalyst cannot prune it
    dd = lambda name: F.col(name).cast("double")  # noqa: E731
    ad_bc_d = dd("a") * dd("d") - dd("b") * dd("c")
    env = F.greatest(
        F.lit(1000.0) * dd("n_units") * ad_bc_d * ad_bc_d,
        (dd("a") + dd("b"))
        * (dd("c") + dd("d"))
        * (dd("a") + dd("c"))
        * (dd("b") + dd("d")),
    )
    n_ok = F.when(env <= F.lit(1e37), F.col("n_units")).otherwise(
        F.raise_error(
            F.lit(
                "ab_contingency: a chi-square operand exceeds the 1e37 "
                "DECIMAL(38,0) envelope — sample units (the decision is "
                "saturated at such N; the milli rates stay exact)"
            )
        ).cast("bigint")
    )
    dec = "cast({} as decimal(38,0))"
    num = (
        f"1000 * {dec.format('__n_ok')} * "
        f"({dec.format('a')} * {dec.format('d')} - "
        f"{dec.format('b')} * {dec.format('c')}) * "
        f"({dec.format('a')} * {dec.format('d')} - "
        f"{dec.format('b')} * {dec.format('c')})"
    )
    den = (
        f"({dec.format('a + b')} * {dec.format('c + d')} * "
        f"{dec.format('a + c')} * {dec.format('b + d')})"
    )
    return cells.withColumn("__n_ok", n_ok).select(
        *group_cols,
        "n_units",
        "a",
        "b",
        "c",
        "d",
        F.when(
            F.col("a") + F.col("b") > 0,
            F.expr("(1000 * a) div (a + b)"),
        ).alias("rate_ctl_milli"),
        F.when(
            F.col("c") + F.col("d") > 0,
            F.expr("(1000 * c) div (c + d)"),
        ).alias("rate_trt_milli"),
        F.when(
            (F.col("a") + F.col("b") > 0)
            & (F.col("c") + F.col("d") > 0)
            & (F.col("a") + F.col("c") > 0)
            & (F.col("b") + F.col("d") > 0),
            F.expr(f"({num}) div {den}"),
        ).cast("bigint").alias("chi2_milli"),
    )


def diff_in_diff(
    df: DataFrame,
    *,
    arm_col: str,
    period_col: str,
    value_col: str,
    group_cols: list[str],
    quant_scale: int = 1000,
) -> DataFrame:
    """Difference-in-differences readout per group — the pre/post ×
    control/treatment 2x2 of MEANS with the DiD effect in exact milli:

        did_milli = (m_trt_post - m_trt_pre) - (m_ctl_post - m_ctl_pre)

    where each cell mean is ``sum(floor(value * quant_scale)) div n``
    — per-row fixed-point quantization (deterministic), DECIMAL(38,0)
    cell sums (immune to both accumulation order and BIGINT wrap), and
    ONE truncating division per cell, so the effect replays verbatim
    against a HUGEINT oracle (`//` and `div` both truncate toward
    zero, negative sums included).  Each mean truncates independently
    (≤1 milli per term — stated convention, the ab_contingency
    stance).

    ``arm_col`` / ``period_col`` must be 0/1 and non-NULL (a row
    outside the design has no cell — executor fail-fast); NULL values
    are EXCLUDED from both the cell sum and the cell count (standard
    mean semantics, the linear_attribution r9 lesson made explicit).
    An EMPTY cell yields NULL for its mean and NULL ``did_milli``,
    never a fake zero.  Per-row ``|value * quant_scale|`` is guarded
    against 2^62 (fail fast, never silent wraparound).

    Scale posture (100 TB): ONE map-side-combinable groupBy — four
    conditional sums + four conditional counts per group; everything
    after is per-group scalar algebra.  No window, no join.

    Engine extension — the reference (exporter.py:75-141) has no
    experiment-analytics tier.
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if quant_scale < 1:
        raise ValueError(f"quant_scale must be positive, got {quant_scale}")
    arm, per = F.col(arm_col), F.col(period_col)
    bad = (
        arm.isNull()
        | per.isNull()
        | ~arm.cast("bigint").isin(0, 1)
        | ~per.cast("bigint").isin(0, 1)
    )
    arm_ok = F.when(~bad, arm.cast("bigint")).otherwise(
        F.raise_error(
            F.lit(
                "diff_in_diff: arm/period must be 0/1 and non-NULL — a "
                "row outside the design has no cell; filter upstream"
            )
        ).cast("bigint")
    )
    cap = float(1 << 62)
    quant = F.floor(F.col(value_col) * F.lit(quant_scale)).cast("bigint")
    vq = F.when(F.col(value_col).isNull(), F.lit(None).cast("bigint")).when(
        F.abs(F.col(value_col) * F.lit(quant_scale)) < F.lit(cap), quant
    ).otherwise(
        F.raise_error(
            F.lit(
                f"diff_in_diff: |value * {quant_scale}| >= 2^62 would "
                "overflow the per-row fixed-point quantization; lower "
                "quant_scale"
            )
        ).cast("bigint")
    )
    d = df.withColumn("__arm", arm_ok).withColumn(
        "__per", per.cast("bigint")
    ).withColumn("__vq", vq)

    def cell(a: int, p: int, suffix: str):
        in_cell = (F.col("__arm") == a) & (F.col("__per") == p)
        v = F.when(in_cell, F.col("__vq"))
        return [
            F.count(v).cast("bigint").alias(f"n_{suffix}"),
            F.coalesce(F.sum(v.cast("decimal(38,0)")), F.lit(0))
            .cast("decimal(38,0)")
            .alias(f"__s_{suffix}"),
        ]

    cells = d.groupBy(*group_cols).agg(
        *cell(0, 0, "ctl_pre"),
        *cell(0, 1, "ctl_post"),
        *cell(1, 0, "trt_pre"),
        *cell(1, 1, "trt_post"),
    )

    def mean(suffix: str) -> F.Column:
        return F.when(
            F.col(f"n_{suffix}") > 0,
            F.expr(f"__s_{suffix} div n_{suffix}").cast("bigint"),
        ).alias(f"mean_{suffix}_milli")

    out = cells.select(
        *group_cols,
        "n_ctl_pre",
        "n_ctl_post",
        "n_trt_pre",
        "n_trt_post",
        mean("ctl_pre"),
        mean("ctl_post"),
        mean("trt_pre"),
        mean("trt_post"),
    )
    all_cells = (
        (F.col("n_ctl_pre") > 0)
        & (F.col("n_ctl_post") > 0)
        & (F.col("n_trt_pre") > 0)
        & (F.col("n_trt_post") > 0)
    )
    return out.withColumn(
        "did_milli",
        F.when(
            all_cells,
            (F.col("mean_trt_post_milli") - F.col("mean_trt_pre_milli"))
            - (F.col("mean_ctl_post_milli") - F.col("mean_ctl_pre_milli")),
        ),
    )


def contingency_chi2(
    df: DataFrame,
    *,
    row_col: str,
    col_col: str,
    group_cols: list[str],
) -> DataFrame:
    """General RxC chi-square test of independence per group — does the
    ``row_col`` category depend on the ``col_col`` category? — with the
    Pearson statistic in exact milli:

        chi2_milli = sum over ALL r x c cells of
                     (1000 * (O*N - R*C)^2) div (N * R * C)

    (the per-cell identity ``(O - RC/N)^2 / (RC/N)`` cleared of
    rationals; each cell truncates independently — ≤1 milli per cell,
    the ab_contingency stance).  ZERO-observed cells are INCLUDED —
    the census only holds observed pairs, so the operator rebuilds the
    full grid as the per-group cross of the row and column censuses
    (cell-space sized: categories x categories, never data) and
    coalesces missing counts to 0; dropping them would understate the
    statistic exactly where dependence is strongest.  Degenerate
    groups (one row or one column category — df = 0) yield NULL, never
    a fake zero.  ``df = (r-1)*(c-1)`` rides along for the caller's
    significance lookup.

    Numerator/denominator run in DECIMAL(38,0) (numerator reaches
    1000 * N^4, denominator N^3) with the ab_contingency DOUBLE
    envelope against 1e37 threaded into the consumed observed count —
    a silent DECIMAL overflow would read as NULL, indistinguishable
    from the degenerate-df NULL.  NULL categories raise executor-side
    (a row outside the table's frame has no cell).

    Scale posture (100 TB): ONE data-sized combinable groupBy (the
    (group, row, col) census); margins, the grid cross, the cell terms
    and the final sum all run over CENSUS rows.  The grid join is a
    group-keyed equi-join of two censuses — bounded by category
    cardinalities, which a contingency test assumes small (plan-gated:
    no Python, no cartesian).

    Engine extension — the reference (exporter.py:75-141) has no
    statistics tier.
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    rv, cv = F.col(row_col), F.col(col_col)
    checked = df.select(
        *group_cols,
        F.when(
            rv.isNotNull() & cv.isNotNull(), rv.cast("string")
        )
        .otherwise(
            F.raise_error(
                F.lit(
                    "contingency_chi2: row/col categories must be "
                    "non-NULL — a row outside the table's frame has no "
                    "cell; filter upstream"
                )
            )
        )
        .alias("__rv"),
        cv.cast("string").alias("__cv"),
    )
    # the ONE data-sized shuffle; lazily localCheckpointed — the census
    # feeds four consumers (both margins, the total, the grid's left
    # join) and without materialization each reference re-scans and
    # re-aggregates the INPUT (the link_prediction lesson)
    obs = (
        checked.groupBy(*group_cols, "__rv", "__cv")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__o"))
        .localCheckpoint(eager=False)
    )
    rowm = obs.groupBy(*group_cols, "__rv").agg(
        F.sum("__o").alias("__R")
    )
    colm = obs.groupBy(*group_cols, "__cv").agg(
        F.sum("__o").alias("__C")
    )
    tot = obs.groupBy(*group_cols).agg(
        F.sum("__o").alias("__N"),
        F.count(F.lit(1)).alias("__obs_cells"),
    )
    grid = (
        rowm.join(colm, group_cols)
        .join(tot, group_cols)
        .join(obs, [*group_cols, "__rv", "__cv"], "left")
        .withColumn("__o0", F.coalesce(F.col("__o"), F.lit(0)))
    )
    dd = lambda name: F.col(name).cast("double")  # noqa: E731
    diff_d = dd("__o0") * dd("__N") - dd("__R") * dd("__C")
    env = F.greatest(
        F.lit(1000.0) * diff_d * diff_d,
        dd("__N") * dd("__R") * dd("__C"),
    )
    o_ok = F.when(env <= F.lit(1e37), F.col("__o0")).otherwise(
        F.raise_error(
            F.lit(
                "contingency_chi2: a cell operand exceeds the 1e37 "
                "DECIMAL(38,0) envelope — sample units (the decision "
                "is saturated at such N)"
            )
        ).cast("bigint")
    )
    dec = "cast({} as decimal(38,0))"
    num = (
        f"1000 * ({dec.format('__o_ok')} * {dec.format('__N')} - "
        f"{dec.format('__R')} * {dec.format('__C')}) * "
        f"({dec.format('__o_ok')} * {dec.format('__N')} - "
        f"{dec.format('__R')} * {dec.format('__C')})"
    )
    den = (
        f"({dec.format('__N')} * {dec.format('__R')} * "
        f"{dec.format('__C')})"
    )
    cells = grid.withColumn("__o_ok", o_ok).withColumn(
        "__term", F.expr(f"CAST(({num}) div {den} AS BIGINT)")
    )
    out = cells.groupBy(*group_cols).agg(
        F.countDistinct("__rv").cast("bigint").alias("n_row_cats"),
        F.countDistinct("__cv").cast("bigint").alias("n_col_cats"),
        F.max("__N").cast("bigint").alias("n_units"),
        F.sum("__term").alias("__chi2"),
    )
    df_ = (F.col("n_row_cats") - 1) * (F.col("n_col_cats") - 1)
    return out.select(
        *group_cols,
        "n_row_cats",
        "n_col_cats",
        "n_units",
        df_.cast("bigint").alias("df"),
        F.when(df_ > 0, F.col("__chi2")).cast("bigint").alias("chi2_milli"),
    )


def dau_mau_stickiness(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    window_days: int = 28,
) -> DataFrame:
    """Exact DAU / rolling-MAU engagement stickiness per day — the
    product-analytics staple (DAU/MAU "how habitual is usage"), with
    the rolling distinct computed EXACTLY instead of via sketches:

        dau(d)  = distinct users active on day d
        mau(d)  = distinct users active in [d - window_days + 1, d]
        stickiness_milli = (1000 * dau) div mau

    A sliding DISTINCT does not decompose as a sum, so the operator
    expands the (user, day) activity census — NOT the events — onto
    the days each activity row can serve: one census row fans out to
    at most ``window_days`` (day, user) pairs, de-duplicated and
    counted per day.  That bounds the blowup at census x window_days
    (users x days x 28 at worst), never events x anything — the same
    stance as the census-stencil grid hotspots.  Days with no activity
    are absent (dau undefined, not zero).

    Output days cover the census's day range only; mau near the range
    START counts the partial window by construction (standard for the
    metric — the first month ramps).

    Scale posture (100 TB): one combinable (user, day) census groupBy
    (the only event-sized shuffle), a row-local explode of at most
    ``window_days`` per census row, then two census-sized distinct
    aggregates.  No window, no join.

    Engine extension — the reference (exporter.py:75-141) has no
    engagement tier.
    """
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    DAY_US = 86_400_000_000
    census = (
        events.select(
            F.col(user_col).alias("__u"),
            F.expr(f"{ts_col} div {DAY_US}").alias("__d"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    dau = census.groupBy(F.col("__d").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("dau")
    )
    # a user active on day d serves the MAU of days d .. d+W-1; only
    # days that exist in the census can report, so the explode is
    # capped to the census's max day (computed as a broadcast one-row
    # aggregate, metadata-sized)
    maxd = census.agg(F.max("__d").alias("__maxd"))
    served = (
        census.crossJoin(F.broadcast(maxd))
        .select(
            "__u",
            F.explode(
                F.sequence(
                    F.col("__d"),
                    F.least(
                        F.col("__d") + F.lit(window_days - 1),
                        F.col("__maxd"),
                    ),
                )
            ).alias("day"),
        )
        .distinct()
    )
    mau = served.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("mau")
    )
    return (
        dau.join(mau, "day")
        .select(
            "day",
            "dau",
            "mau",
            F.expr("(1000 * dau) div mau").alias("stickiness_milli"),
        )
    )


def rank_sum_test(
    units: DataFrame,
    *,
    arm_col: str,
    value_col: str,
    group_cols: list[str],
) -> DataFrame:
    """Mann-Whitney U rank-sum test per group — the nonparametric
    two-sample experiment readout (the A/B test for a *metric*, where
    ``ab_contingency`` reads a *conversion*): did the treatment arm's
    value distribution shift, without assuming normality?

    Exact rank algebra over the VALUE CENSUS, zero float computation.
    Within each group, values census as ``(value, t_a, t_b)`` counts
    per arm; the classic midrank of a value with ``c`` observations
    before it and ``t`` ties at it is ``c + (t+1)/2`` — kept integral
    as the DOUBLED rank ``rank2 = 2c + t + 1``.  Then with rank sum
    ``2R_a = Σ t_a·rank2``:

        u2_a  = 2·U_a  = 2R_a − n_a·(n_a+1)          (doubled U)
        auc_milli = (1000·u2_a) div (2·n_a·n_b)       (P[A > B] + ½P[=])
        var2  = Var(2U) = (n_a·n_b·((n+1)·n·(n−1) − T)) div (3·n·(n−1))
        z2_milli = (1000·(u2_a − n_a·n_b)²) div var2  (normal-approx z²)

    where ``T = Σ(t³ − t)`` is the standard tie correction.  Every
    operand is an exact integer; the big products run in DECIMAL(38,0)
    and both truncating divisions (``div``) replay verbatim against a
    HUGEINT oracle — every numerator is non-negative, so Spark's
    truncate-toward-zero and DuckDB's floor ``//`` agree.  Var(2U) is
    itself Θ(n³), so its truncation loses < 1 part in n³ — and the
    oracle replays the SAME truncation, bit-for-bit.

    Degenerate groups never fake significance: one-armed groups
    (n_a·n_b = 0) emit NULL auc/z2; all-tied groups (T = (n+1)n(n−1),
    var2 = 0) emit NULL z2.  Near-zero-variance groups saturate z2 at
    SAT64 (4e18) instead of letting a BIGINT quotient wrap — the
    oracle replays the identical least(); var2 itself divides in
    DECIMAL (it is Θ(n³), past 2^63 at n ≈ 5e6 — _exact_div_sql).  NULL values are unranked and dropped
    (quantize and NULL-police upstream); ``arm_col`` must be 0/1
    non-NULL (executor fail-fast, the ab_contingency contract).

    Capacity is guarded, not assumed: both DECIMAL(38,0) division
    operands are enveloped in DOUBLE against 1e37 (fail-fast threaded
    into the consumed n_a — a silent DECIMAL(38) overflow reads as
    NULL, indistinguishable from the degenerate-group NULL).  The
    binding term is ``n_a·n_b·n³ ≲ n⁵/4``, which carries groups to
    n ~ 8e7; beyond that, sample units — at such n the significance
    call is saturated and auc_milli stays exact at any n.

    Returns ``(*group_cols, n_a, n_b, u2_a, auc_milli, z2_milli)``.

    Scale posture (100 TB): ONE event-sized combinable groupBy (the
    value census), one census-sized window partitioned by the group
    key (the standing per-key contract — census rows per group are
    bounded by the value quantization, not by events), one combinable
    census-sized groupBy, then per-group scalar algebra.  No join.

    Engine extension — the reference (exporter.py:75-141) has no
    statistics tier.
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    from pyspark.sql import Window

    arm = F.col(arm_col)
    bad = arm.isNull() | ~arm.cast("bigint").isin(0, 1)
    arm_ok = F.when(~bad, arm.cast("bigint")).otherwise(
        F.raise_error(
            F.lit(
                "rank_sum_test: arm must be 0/1 and non-NULL — a unit "
                "outside the experiment's frame has no rank; filter "
                "upstream"
            )
        ).cast("bigint")
    )
    census = (
        units.filter(F.col(value_col).isNotNull())
        .withColumn("__arm", arm_ok)
        .groupBy(*group_cols, F.col(value_col).alias("__v"))
        .agg(
            F.sum((F.col("__arm") == 0).cast("bigint")).alias("__ta"),
            F.sum((F.col("__arm") == 1).cast("bigint")).alias("__tb"),
        )
    )
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = F.col("__ta") + F.col("__tb")
    ranked = census.withColumn(
        "__rank2",
        F.lit(2) * F.sum(t).over(w_cum) - t + F.lit(1),
    )
    # t³ needs headroom: route through decimal(12,0) so the triple
    # product lands at precision 36, inside DECIMAL(38,0)
    td = t.cast("decimal(12,0)")
    g = ranked.groupBy(*group_cols).agg(
        F.sum("__ta").cast("bigint").alias("n_a"),
        F.sum("__tb").cast("bigint").alias("n_b"),
        F.sum(
            F.col("__ta").cast(_D) * F.col("__rank2").cast(_D)
        ).cast(_D).alias("__r2a"),
        F.sum((td * td * td).cast(_D) - t.cast(_D)).cast(_D).alias("__t3"),
    )
    # DOUBLE envelopes for BOTH decimal division operands, threaded
    # into the consumed n_a factor so Catalyst cannot prune the guard
    dd = lambda name: F.col(name).cast("double")  # noqa: E731
    n_d = dd("n_a") + dd("n_b")
    d_d = (dd("__r2a") - dd("n_a") * (dd("n_a") + 1.0)) - dd("n_a") * dd(
        "n_b"
    )
    env = F.greatest(
        dd("n_a") * dd("n_b") * ((n_d + 1.0) * n_d * (n_d - 1.0) - dd("__t3")),
        F.lit(1000.0) * d_d * d_d,
    )
    na_ok = F.when(env <= F.lit(1e37), F.col("n_a")).otherwise(
        F.raise_error(
            F.lit(
                "rank_sum_test: a variance operand exceeds the 1e37 "
                "DECIMAL(38,0) envelope — sample units (the decision is "
                "saturated at such n; auc_milli stays exact at any n)"
            )
        ).cast("bigint")
    )
    dec = "cast({} as decimal(38,0))"
    n_s = f"({dec.format('__na_ok')} + {dec.format('n_b')})"
    u2 = f"(__r2a - {dec.format('__na_ok')} * ({dec.format('__na_ok')} + 1))"
    mean2 = f"({dec.format('__na_ok')} * {dec.format('n_b')})"
    # Var(2U) is Θ(n³) — past 2^63 around n ≈ 5e6, where Spark's `div`
    # (BIGINT result) silently wraps; divide in decimal instead.  The
    # operand envelope (1e37) bounds the quotient at ~2e23, inside the
    # _exact_div_sql exactness window.
    var2 = _exact_div_sql(
        f"({mean2} * (({n_s} + 1) * {n_s} * ({n_s} - 1) - __t3))",
        f"(3 * {n_s} * ({n_s} - 1))",
    )
    return (
        g.withColumn("__na_ok", na_ok)
        .withColumn("__u2", F.expr(u2))
        .withColumn("__var2", F.when(F.expr(f"{n_s} > 1"), F.expr(var2)))
        .select(
            *group_cols,
            "n_a",
            "n_b",
            F.col("__u2").cast("bigint").alias("u2_a"),
            F.when(
                F.expr(f"{mean2} > 0"),
                F.expr(f"(1000 * __u2) div (2 * {mean2})").cast("bigint"),
            ).alias("auc_milli"),
            F.when(
                F.col("__var2") > 0,
                # a near-zero variance makes z² astronomically large —
                # saturate at SAT64 instead of letting `div` wrap
                F.expr(
                    _sat_div_sql(
                        f"1000 * (__u2 - {mean2}) * (__u2 - {mean2})",
                        "__var2",
                    )
                ),
            ).alias("z2_milli"),
        )
    )


# log10(1 + 1/d) in exact parts-per-million — the public Benford
# constants, truncated (sum = 999_999; the missing ppm is the
# truncation residue, carried by no digit on either engine)
BENFORD_PPM = {
    1: 301_029, 2: 176_091, 3: 124_938, 4: 96_910, 5: 79_181,
    6: 66_946, 7: 57_991, 8: 51_152, 9: 45_757,
}


def benford_screen(
    df: DataFrame,
    *,
    value_col: str,
    group_cols: list[str],
) -> DataFrame:
    """Benford first-digit conformity screen per group — the
    forensic-accounting staple (fabricated or constrained amounts
    drift from the log distribution of naturally-occurring ones).

    ``value_col`` must be POSITIVE exact integers (cents/milli —
    quantize upstream); zero or negative amounts raise executor-side
    (they have no first significant digit).  The first digit comes
    from the decimal string — deterministic in any engine — and the
    screen reports, per digit 1..9 (all nine rows, zero-observed
    included):

        exp_ppm      = trunc(1e6 · log10(1 + 1/d))   (public constant)
        contrib_milli = (1000 · (1e6·obs − n·ppm)²)
                        div (1e6 · n · ppm)           (Pearson term)
        chi2_milli   = Σ contrib_milli  (repeated per row; df = 8)

    Every operand is an exact integer; the squared term runs in
    DECIMAL(38,0) against a HUGEINT oracle, and both engines truncate
    the division.  The 1e37 DOUBLE envelope (threaded into the
    consumed n) carries groups to n ~ 3e9 amounts; beyond that,
    sample — conformity is saturated at such n.

    Returns ``(*group_cols, digit, n_obs, n_total, exp_ppm,
    contrib_milli, chi2_milli)``.

    Scale posture (100 TB): ONE map-side-combinable groupBy over
    (group, digit); the nine-row grid rebuild, Pearson terms and the
    chi2 window are census-sized (9 rows per group).

    Engine extension — the reference has no forensic tier.
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    counts = (
        benford_digit_projection(df, value_col=value_col, group_cols=group_cols)
        .groupBy(*group_cols)
        .pivot("digit", list(range(1, 10)))
        .agg(F.count(F.lit(1)))
    )
    return _benford_fold(counts, group_cols)


def benford_digit_projection(
    df: DataFrame, *, value_col: str, group_cols: list[str]
) -> DataFrame:
    """Row-local first-significant-digit projection ``(*group_cols,
    digit)`` with the positive-integer guard — the single definition
    the batch screen, the streaming census maintainer and the batch
    oracle all share (the stream_census contract: the caller's
    projection IS the censused key)."""
    v = F.col(value_col)
    v_ok = F.when(v > 0, v).otherwise(
        F.raise_error(
            F.lit(
                "benford_screen: amounts must be positive integers — "
                "zero/negative/NULL values have no first significant "
                "digit; filter or quantize upstream"
            )
        ).cast("bigint")
    )
    return df.withColumn("__v", v_ok).select(
        *group_cols,
        F.substring(F.col("__v").cast("string"), 1, 1)
        .cast("int")
        .alias("digit"),
    )


def benford_from_census(
    census: DataFrame,
    *,
    group_cols: list[str],
    digit_col: str = "digit",
    count_col: str = "n_obs",
) -> DataFrame:
    """Benford conformity fold over a maintained ``(group, digit, n)``
    digit census (r13) — the streaming read side
    (streaming/census.py read_benford): digit counts add, so a stream
    maintains the census by per-key addition and this fold re-derives
    the FULL screen.  A late amount revises one digit's count, which
    moves the group total and therefore EVERY digit's Pearson term —
    exactly the cross-row damage the census fold re-derives and
    bounded incremental state cannot.  Shares ``_benford_fold`` with
    :func:`benford_screen`, so the two are the same algebra by
    construction.  Digits outside 1..9 raise executor-side (a digit
    census with a 0/NULL digit row is a projection bug, not data).

    Scale: one census-sized combinable groupBy (9 rows per group in
    the wide form) + the row-local grid rebuild + group-key windows
    over nine-rows-per-group data.
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    d_ok = F.when(
        F.col(digit_col).between(1, 9), F.col(digit_col).cast("int")
    ).otherwise(
        F.raise_error(
            F.lit(
                "benford_from_census: digit outside 1..9 — the census "
                "projection must emit first significant digits only"
            )
        ).cast("int")
    )
    wide = (
        census.select(
            *group_cols,
            d_ok.alias("__d"),
            F.col(count_col).cast("bigint").alias("__n"),
        )
        .groupBy(*group_cols)
        .agg(
            *[
                F.sum(F.when(F.col("__d") == d, F.col("__n"))).alias(str(d))
                for d in range(1, 10)
            ]
        )
    )
    return _benford_fold(wide, group_cols)


def _benford_fold(counts: DataFrame, group_cols: list[str]) -> DataFrame:
    """Shared tail of benford_screen / benford_from_census: from the
    one-row-per-group WIDE digit census (columns "1".."9", NULL = zero
    observed) to the nine-row conformity grid with exact Pearson
    terms.  Factored in r13 so the streaming read side is the batch
    algebra by construction, not by parallel implementation."""
    from pyspark.sql import Window

    # rebuild the dense nine-digit grid (zero cells included) from the
    # pivoted census — one row per group in, nine out
    digit_arr = F.array(
        *[
            F.struct(
                F.lit(d).alias("digit"),
                F.coalesce(F.col(str(d)), F.lit(0))
                .cast("bigint")
                .alias("n_obs"),
                F.lit(BENFORD_PPM[d]).cast("bigint").alias("exp_ppm"),
            )
            for d in range(1, 10)
        ]
    )
    grid = (
        counts.select(*group_cols, F.explode(digit_arr).alias("__c"))
        .select(*group_cols, "__c.digit", "__c.n_obs", "__c.exp_ppm")
        .withColumn(
            "n_total",
            F.sum("n_obs")
            .over(Window.partitionBy(*group_cols))
            .cast("bigint"),
        )
    )
    env = (
        F.lit(1000.0)
        * (
            F.lit(1e6) * F.col("n_obs").cast("double")
            - F.col("n_total").cast("double") * F.col("exp_ppm").cast("double")
        )
        ** 2
    )
    n_ok = F.when(env <= F.lit(1e37), F.col("n_total")).otherwise(
        F.raise_error(
            F.lit(
                "benford_screen: a Pearson term exceeds the 1e37 "
                "DECIMAL(38,0) envelope — sample amounts (conformity "
                "is saturated at such n)"
            )
        ).cast("bigint")
    )
    dec = "cast({} as decimal(38,0))"
    dev = (
        f"(1000000 * {dec.format('n_obs')} - "
        f"{dec.format('__n_ok')} * {dec.format('exp_ppm')})"
    )
    contrib = (
        f"(1000 * {dev} * {dev}) div "
        f"(1000000 * {dec.format('__n_ok')} * {dec.format('exp_ppm')})"
    )
    return (
        grid.withColumn("__n_ok", n_ok)
        .withColumn("contrib_milli", F.expr(contrib).cast("bigint"))
        .withColumn(
            "chi2_milli",
            F.sum("contrib_milli")
            .over(Window.partitionBy(*group_cols))
            .cast("bigint"),
        )
        .select(
            *group_cols,
            "digit",
            "n_obs",
            "n_total",
            "exp_ppm",
            "contrib_milli",
            "chi2_milli",
        )
    )


def simpson_concentration(
    df: DataFrame,
    *,
    item_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Simpson concentration index per group (r12) — the probability
    that two draws WITHOUT replacement share a category:

        simpson_ppm = (SUM_i n_i * (n_i - 1)) * 1_000_000
                      div (N * (N - 1))

    the Hunter-Gaston form — exact integers end to end (its complement
    is Simpson diversity; the Herfindahl-style mix-homogeneity KPI a
    corpus owner reads per source/shard before mixing).  NULL items
    are excluded (no category, no draw); groups with N < 2 emit NULL
    (a single draw has no pair).

    Returns one row per group: ``(*group_cols, n_rows, n_categories,
    simpson_ppm)``.

    Scale posture (100 TB): one (group, item) census groupBy + one
    group aggregate — both map-side combinable, zero joins, zero
    windows.  The cross-multiply runs in DECIMAL(38,0) with one
    truncating division (the chi-square family's algebra), exact to
    ~1e16 rows per group — no 2^62 envelope needed.
    """
    groups = group_cols or []
    census = (
        df.filter(F.col(item_col).isNotNull())
        .groupBy(*groups, F.col(item_col).alias("__i"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    )
    return simpson_from_census(census, group_cols=groups, count_col="__n")


def simpson_from_census(
    census: DataFrame,
    *,
    group_cols: list[str] | None = None,
    count_col: str = "n_rows",
) -> DataFrame:
    """Simpson-concentration fold over a maintained ``(*groups, item,
    n)`` category census (r13) — the streaming read side
    (streaming/census.py read_simpson) and the batch operator's shared
    tail: category counts add, so a stream maintains the census by
    per-key addition and this fold re-derives the exact index.  A late
    row revises one category's count, which moves N and therefore the
    whole pair-draw probability — re-derived here over census-sized
    data.  Same DECIMAL(38,0) algebra and NULL contracts as
    :func:`simpson_concentration` (they share this code)."""
    groups = group_cols or []
    census = census.withColumn("__n", F.col(count_col).cast("bigint"))
    agg = census.groupBy(*groups).agg(
        F.sum("__n").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_categories"),
        # cast BEFORE the multiply: n*(n-1) in BIGINT silently wraps in
        # non-ANSI Spark past n ~ 3.04e9 per category (r12 ADVICE); the
        # DECIMAL(38,0) product is exact to ~1e16 rows per group, matching
        # the HUGEINT oracle in the claimed-supported regime
        F.sum(
            F.col("__n").cast(_D) * (F.col("__n") - F.lit(1)).cast(_D)
        ).alias("__s"),
    )
    num = F.col("__s") * F.lit(1_000_000).cast(_D)
    den = (
        F.col("n_rows").cast(_D)
        * (F.col("n_rows") - F.lit(1)).cast(_D)
    )
    return agg.select(
        *groups,
        "n_rows",
        "n_categories",
        F.when(
            F.col("n_rows") >= 2,
            ((num - (num % den)) / den).cast("bigint"),
        ).alias("simpson_ppm"),
    )


def roc_curve(
    df: DataFrame,
    *,
    score_col: str,
    label_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Exact ROC curve + tie-corrected AUC per group (r13) — the
    model-eval staple next to the rank-sum A/B readout: one curve
    point per DISTINCT score threshold ("predict positive at score >=
    s"), with cumulative true/false positives, rates in exact ppm, and
    the trapezoidal AUC (which at tie-grouped thresholds IS the
    midrank / Mann-Whitney AUC) carried on every row:

        tpr_ppm = (cum_tp * 1e6) div P
        fpr_ppm = (cum_fp * 1e6) div N
        auc_ppm = (Σ Δfp · (tp_prev + tp_cur)) * 1e6
                  div (2 · P · N)

    Every operand is an exact integer; the AUC cross-multiply runs in
    DECIMAL(38,0) against a HUGEINT oracle (numerator ≤ 2·P·N·1e6 ~
    n²·1e6, inside DECIMAL(38) to n ~ 1e15 rows per group — no
    envelope needed below that; at such n the curve is saturated).
    One-class groups (P = 0 or N = 0) emit NULL rates on the missing
    side and NULL AUC — never a fake 0/1.  NULL scores are unranked
    and dropped (quantize upstream); ``label_col`` must be 0/1
    non-NULL (executor fail-fast, the ab_contingency contract).

    Returns census-sized rows: ``(*group_cols, score, cum_tp, cum_fp,
    tpr_ppm, fpr_ppm, auc_ppm)`` ordered by score DESC within group.

    Scale posture (100 TB): ONE event-sized combinable groupBy (the
    score census), then census-sized group-keyed windows (the
    rank_sum_test contract: census rows per group are bounded by the
    score quantization, not by events).  No join anywhere.

    Engine extension — the reference has no model-eval tier.
    """
    groups = group_cols or []
    from pyspark.sql import Window

    lab = F.col(label_col)
    bad = lab.isNull() | ~lab.cast("bigint").isin(0, 1)
    lab_ok = F.when(~bad, lab.cast("bigint")).otherwise(
        F.raise_error(
            F.lit(
                "roc_curve: label must be 0/1 and non-NULL — an "
                "unlabeled row has no place on either axis; filter "
                "upstream"
            )
        ).cast("bigint")
    )
    census = (
        df.filter(F.col(score_col).isNotNull())
        .withColumn("__y", lab_ok)
        .groupBy(*groups, F.col(score_col).alias("score"))
        .agg(
            F.sum("__y").cast("bigint").alias("__tp_t"),
            F.sum(F.lit(1) - F.col("__y")).cast("bigint").alias("__fp_t"),
        )
    )
    w_cum = (
        Window.partitionBy(*groups)
        .orderBy(F.col("score").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*groups)
    cum = census.select(
        *groups,
        "score",
        F.sum("__tp_t").over(w_cum).cast("bigint").alias("cum_tp"),
        F.sum("__fp_t").over(w_cum).cast("bigint").alias("cum_fp"),
        F.sum("__tp_t").over(w_all).cast("bigint").alias("__p"),
        F.sum("__fp_t").over(w_all).cast("bigint").alias("__n"),
    )
    w_lag = Window.partitionBy(*groups).orderBy(F.col("score").desc())
    tp_prev = F.coalesce(F.lag("cum_tp").over(w_lag), F.lit(0))
    fp_prev = F.coalesce(F.lag("cum_fp").over(w_lag), F.lit(0))
    with_area = cum.withColumn(
        "__a2",
        (F.col("cum_fp") - fp_prev).cast(_D)
        * (tp_prev + F.col("cum_tp")).cast(_D),
    ).withColumn("__s2", F.sum("__a2").over(w_all).cast(_D))
    num = F.col("__s2") * F.lit(1_000_000).cast(_D)
    den = (F.lit(2).cast(_D) * F.col("__p").cast(_D)) * F.col("__n").cast(_D)
    return with_area.select(
        *groups,
        "score",
        "cum_tp",
        "cum_fp",
        F.when(
            F.col("__p") > 0, F.expr("(cum_tp * 1000000) div __p")
        ).alias("tpr_ppm"),
        F.when(
            F.col("__n") > 0, F.expr("(cum_fp * 1000000) div __n")
        ).alias("fpr_ppm"),
        F.when(
            (F.col("__p") > 0) & (F.col("__n") > 0),
            ((num - (num % den)) / den).cast("bigint"),
        ).alias("auc_ppm"),
    )


def calibration_curve(
    df: DataFrame,
    *,
    pred_ppm_col: str,
    label_col: str,
    n_bins: int = 10,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Exact reliability diagram + expected calibration error per group
    (r13) — the model-eval sibling of :func:`roc_curve`: does a
    predicted probability MEAN what it says?  ``pred_ppm_col`` holds
    the prediction as exact ppm (0..1e6 integers — quantize upstream;
    out-of-range raises executor-side, as does a non-0/1 label).
    Equal-width bins over the ppm range:

        bin          = least(pred_ppm * n_bins div 1e6, n_bins - 1)
        observed_ppm = (sum_label * 1e6) div n_bin
        predicted_ppm = sum_pred_ppm div n_bin          (mean prediction)
        ece_ppm      = (Σ_b n_b · |observed_b − predicted_b|) div N

    all exact integers (DECIMAL(38,0) for the ECE cross-products vs a
    HUGEINT oracle); the ECE rides every row of its group (the
    chi2_milli pattern).  Empty bins are absent (a reliability point
    with no observations is undefined, not zero).

    Returns ``(*group_cols, bin, n, observed_ppm, predicted_ppm,
    ece_ppm)``.

    Scale posture (100 TB): ONE event-sized combinable groupBy to the
    (group, bin) census — at most ``n_bins`` rows per group — then
    group-keyed windows over that census.  No join.

    Engine extension — the reference has no model-eval tier.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    groups = group_cols or []
    from pyspark.sql import Window

    lab = F.col(label_col)
    lab_ok = F.when(
        ~(lab.isNull() | ~lab.cast("bigint").isin(0, 1)), lab.cast("bigint")
    ).otherwise(
        F.raise_error(
            F.lit(
                "calibration_curve: label must be 0/1 and non-NULL — "
                "filter upstream"
            )
        ).cast("bigint")
    )
    p = F.col(pred_ppm_col)
    p_ok = F.when(
        p.isNotNull() & (p >= 0) & (p <= 1_000_000), p.cast("bigint")
    ).otherwise(
        F.raise_error(
            F.lit(
                "calibration_curve: prediction must be 0..1000000 ppm "
                "and non-NULL — a probability outside [0,1] is a "
                "pipeline bug, not data"
            )
        ).cast("bigint")
    )
    census = (
        df.select(
            *groups,
            # pure-integer bin: (p*n_bins) div 1e6 via the mod-subtract
            # identity — no float division anywhere near the bin edge
            F.least(
                (
                    (p_ok * F.lit(n_bins))
                    - (p_ok * F.lit(n_bins)) % F.lit(1_000_000)
                )
                / F.lit(1_000_000),
                F.lit(n_bins - 1),
            )
            .cast("bigint")
            .alias("bin"),
            lab_ok.alias("__y"),
            p_ok.alias("__p"),
        )
        .groupBy(*groups, "bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("__y").cast("bigint").alias("__sy"),
            F.sum(F.col("__p").cast(_D)).cast(_D).alias("__sp"),
        )
    )
    w_all = Window.partitionBy(*groups)
    cur = census.select(
        *groups,
        "bin",
        "n",
        F.expr("(__sy * 1000000) div n").alias("observed_ppm"),
        F.expr("CAST(__sp div n AS BIGINT)").alias("predicted_ppm"),
    )
    dev = (
        F.col("n").cast(_D)
        * F.abs(
            F.col("observed_ppm").cast(_D) - F.col("predicted_ppm").cast(_D)
        )
    )
    with_tot = cur.withColumn("__dev", dev).withColumn(
        "__sum_dev", F.sum("__dev").over(w_all).cast(_D)
    ).withColumn("__n_all", F.sum("n").over(w_all).cast(_D))
    num = F.col("__sum_dev")
    den = F.col("__n_all")
    return with_tot.select(
        *groups,
        "bin",
        "n",
        "observed_ppm",
        "predicted_ppm",
        ((num - (num % den)) / den).cast("bigint").alias("ece_ppm"),
    )


def uplift_curve(
    df: DataFrame,
    *,
    arm_col: str,
    score_col: str,
    label_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Exact uplift (Qini-style) curve per group (r13) — the
    experimentation sibling of :func:`roc_curve`: rank units by a
    targeting score (descending), and at every distinct score depth
    ask how many EXTRA conversions the treated units show over what
    the control rate predicts.  The third leg of the eval tier
    (discrimination = ROC, honesty = calibration, targeting value =
    uplift).  Per distinct score, cumulative from the top:

        uplift_ppm = (y_t·n_c − y_c·n_t) · 1e6 div (n_t·n_c)
                     (treated-minus-control conversion rate at depth)
        qini_inc   = y_t − (y_c·n_t) div n_c
                     (incremental conversions, control-scaled)

    both exact integers (DECIMAL(38,0) cross-multiplies vs a HUGEINT
    oracle, truncating division — numerators can be NEGATIVE, and
    Spark's ``div`` and DuckDB's ``//`` only agree on non-negative
    operands, so both divisions route through the sign-split
    mod-subtract form that truncates toward zero in BOTH engines).
    Depths where either cumulative arm is empty emit NULL (no rate to
    compare — never a fake zero).  NULL scores are unranked and
    dropped; ``arm_col`` and ``label_col`` must be 0/1 non-NULL
    (executor fail-fast, the ab_contingency contract).

    Returns census-sized rows: ``(*group_cols, score, n_t, n_c, y_t,
    y_c, uplift_ppm, qini_inc)`` — cumulative counts, score DESC.

    Scale posture (100 TB): ONE event-sized combinable groupBy (the
    score census), then census-sized group-keyed windows.  No join.

    Engine extension — the reference has no experimentation tier.
    """
    groups = group_cols or []
    from pyspark.sql import Window

    def _flag(col: str, what: str):
        c = F.col(col)
        bad = c.isNull() | ~c.cast("bigint").isin(0, 1)
        return F.when(~bad, c.cast("bigint")).otherwise(
            F.raise_error(
                F.lit(
                    f"uplift_curve: {what} must be 0/1 and non-NULL — "
                    "filter upstream"
                )
            ).cast("bigint")
        )

    census = (
        df.filter(F.col(score_col).isNotNull())
        .withColumn("__a", _flag(arm_col, "arm"))
        .withColumn("__y", _flag(label_col, "label"))
        .groupBy(*groups, F.col(score_col).alias("score"))
        .agg(
            F.sum("__a").cast("bigint").alias("__nt"),
            F.sum(F.lit(1) - F.col("__a")).cast("bigint").alias("__nc"),
            F.sum(F.col("__a") * F.col("__y")).cast("bigint").alias("__yt"),
            F.sum((F.lit(1) - F.col("__a")) * F.col("__y"))
            .cast("bigint")
            .alias("__yc"),
        )
    )
    w_cum = (
        Window.partitionBy(*groups)
        .orderBy(F.col("score").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = census.select(
        *groups,
        "score",
        F.sum("__nt").over(w_cum).cast("bigint").alias("n_t"),
        F.sum("__nc").over(w_cum).cast("bigint").alias("n_c"),
        F.sum("__yt").over(w_cum).cast("bigint").alias("y_t"),
        F.sum("__yc").over(w_cum).cast("bigint").alias("y_c"),
    )

    def _tdiv(num, den):
        # truncate-toward-zero division both engines replay on ANY
        # sign: |num| div |den| via mod-subtract, sign re-applied
        a, b = F.abs(num), F.abs(den)
        q = ((a - (a % b)) / b).cast("bigint")
        return F.when(num * den >= 0, q).otherwise(-q)

    up_num = (
        F.col("y_t").cast(_D) * F.col("n_c").cast(_D)
        - F.col("y_c").cast(_D) * F.col("n_t").cast(_D)
    ) * F.lit(1_000_000).cast(_D)
    up_den = F.col("n_t").cast(_D) * F.col("n_c").cast(_D)
    qi_num = F.col("y_c").cast(_D) * F.col("n_t").cast(_D)
    qi_den = F.col("n_c").cast(_D)
    return cum.select(
        *groups,
        "score",
        "n_t",
        "n_c",
        "y_t",
        "y_c",
        F.when(
            (F.col("n_t") > 0) & (F.col("n_c") > 0), _tdiv(up_num, up_den)
        ).alias("uplift_ppm"),
        F.when(
            F.col("n_c") > 0,
            F.col("y_t") - _tdiv(qi_num, qi_den),
        ).alias("qini_inc"),
    )


def post_strat_ate(
    df: DataFrame,
    *,
    arm_col: str,
    stratum_col: str,
    value_col: str,
    group_cols: list[str],
    quant_scale: int = 1000,
) -> DataFrame:
    """Post-stratification average-treatment-effect readout per group —
    the confounding-corrected sibling of the naive two-arm mean
    difference, in exact milli:

        diff_s   = mean_trt_s - mean_ctl_s          (per stratum s)
        ate      = sum_s w_s * diff_s / sum_s w_s   (w_s = n_s, both arms)

    When treatment assignment is imbalanced ACROSS strata (more treated
    users in high-baseline segments), the pooled naive difference mixes
    the treatment effect with the baseline gap; re-weighting the
    per-stratum differences by stratum size removes exactly that term
    (the standard post-stratification / blocking estimator).  Both
    readouts are returned so the gap itself is the diagnostic.

    Exactness contract (the `diff_in_diff` stance): per-row fixed-point
    quantization ``floor(value * quant_scale)`` with a 2^62 guard;
    DECIMAL(38,0) cell sums; each per-stratum mean takes ONE truncating
    division and the weighted fold cross-multiplies in DECIMAL(38,0)
    with a SIGN-SPLIT truncate-toward-zero final division (effects are
    legitimately negative; Spark ``div`` and DuckDB ``//`` disagree on
    negative numerators).  NULL values are excluded from sums and
    counts; NULL arm / non-0/1 arm rows fail fast; a NULL stratum is a
    real stratum (groupBy keeps it).  Strata with an EMPTY arm have no
    defined difference and are EXCLUDED from both the ATE numerator and
    its weight denominator (reported via ``n_strata_used``), never
    imputed as zero.  Groups where NO stratum has both arms yield NULL
    ``ate_milli``.

    Scale posture (100 TB): ONE data-sized combinable groupBy per
    (group, stratum) — two conditional counts + two conditional
    DECIMAL sums — then ONE stratum-census-sized combinable groupBy per
    group.  No window, no join, nothing driver-sided.

    Engine extension — the reference (exporter.py:75-141) has no
    experiment-analytics tier; cited for provenance only.
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if quant_scale < 1:
        raise ValueError(f"quant_scale must be positive, got {quant_scale}")
    arm = F.col(arm_col)
    bad = arm.isNull() | ~arm.cast("bigint").isin(0, 1)
    arm_ok = F.when(~bad, arm.cast("bigint")).otherwise(
        F.raise_error(
            F.lit(
                "post_strat_ate: arm must be 0/1 and non-NULL — a row "
                "outside the design has no cell; filter upstream"
            )
        ).cast("bigint")
    )
    cap = float(1 << 62)
    quant = F.floor(F.col(value_col) * F.lit(quant_scale)).cast("bigint")
    vq = F.when(F.col(value_col).isNull(), F.lit(None).cast("bigint")).when(
        F.abs(F.col(value_col) * F.lit(quant_scale)) < F.lit(cap), quant
    ).otherwise(
        F.raise_error(
            F.lit(
                f"post_strat_ate: |value * {quant_scale}| >= 2^62 would "
                "overflow the per-row fixed-point quantization; lower "
                "quant_scale"
            )
        ).cast("bigint")
    )
    d = df.withColumn("__arm", arm_ok).withColumn("__vq", vq)

    def cell(a: int, suffix: str):
        v = F.when(F.col("__arm") == a, F.col("__vq"))
        return [
            F.count(v).cast("bigint").alias(f"__n_{suffix}"),
            F.coalesce(F.sum(v.cast(_D)), F.lit(0))
            .cast(_D)
            .alias(f"__s_{suffix}"),
        ]

    strata = d.groupBy(*group_cols, stratum_col).agg(
        *cell(0, "c"), *cell(1, "t")
    )
    return _post_strat_fold(strata, group_cols)


def post_strat_census_projection(
    df: DataFrame,
    *,
    arm_col: str,
    stratum_col: str,
    value_col: str,
    group_cols: list[str],
    quant_scale: int = 1000,
) -> DataFrame:
    """Project experiment rows to the associative census the streaming
    post-stratification twin maintains (streaming/census.py
    read_post_strat_ate): key ``(*group_cols, stratum, arm)`` with two
    sum columns — ``__meas`` (1 when the value is measured, 0 when
    NULL, so the census count of MEASURED rows stays separate from
    n_rows and an all-NULL stratum still exists, exactly the batch
    n_strata contract) and ``__vq`` (the quantized value, 0 when NULL
    so sums never go NULL).  Maintain with ``stream_census(...,
    key_cols=[*group_cols, stratum_col, "arm"], sum_cols={"n_meas":
    "__meas", "sum_vq": "__vq"})``.  Arm and overflow fail-fasts are
    the batch operator's, applied per delivered row."""
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if quant_scale < 1:
        raise ValueError(f"quant_scale must be positive, got {quant_scale}")
    arm = F.col(arm_col)
    bad = arm.isNull() | ~arm.cast("bigint").isin(0, 1)
    arm_ok = F.when(~bad, arm.cast("bigint")).otherwise(
        F.raise_error(
            F.lit(
                "post_strat_census_projection: arm must be 0/1 and "
                "non-NULL — a row outside the design has no cell; "
                "filter upstream"
            )
        ).cast("bigint")
    )
    cap = float(1 << 62)
    quant = F.floor(F.col(value_col) * F.lit(quant_scale)).cast("bigint")
    vq = F.when(F.col(value_col).isNull(), F.lit(0).cast("bigint")).when(
        F.abs(F.col(value_col) * F.lit(quant_scale)) < F.lit(cap), quant
    ).otherwise(
        F.raise_error(
            F.lit(
                f"post_strat_census_projection: |value * {quant_scale}| "
                ">= 2^62 would overflow the per-row fixed-point "
                "quantization; lower quant_scale"
            )
        ).cast("bigint")
    )
    return df.select(
        *group_cols,
        F.col(stratum_col).alias(stratum_col),
        arm_ok.alias("arm"),
        F.when(F.col(value_col).isNull(), F.lit(0))
        .otherwise(F.lit(1))
        .cast("bigint")
        .alias("__meas"),
        vq.alias("__vq"),
    )


def post_strat_from_census(
    census: DataFrame,
    *,
    group_cols: list[str],
    stratum_col: str,
    arm_col: str = "arm",
    meas_col: str = "n_meas",
    sum_col: str = "sum_vq",
) -> DataFrame:
    """The census-sized fold `post_strat_ate` shares with its streaming
    twin (streaming/census.py read_post_strat_ate): pivot a maintained
    ``(*groups, stratum, arm, n_meas, sum_vq)`` census to per-stratum
    arm cells, then the identical weighted fold.  A late unit revises
    ONE census cell, which moves its stratum's mean, weight and the
    group's weighted ATE — re-derived census-sized at read.  An
    out-of-design arm VALUE fails fast at read (the batch contract,
    enforced census-side)."""
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    arm = F.col(arm_col)
    bad = arm.isNull() | ~arm.cast("bigint").isin(0, 1)
    arm_ok = F.when(~bad, arm.cast("bigint")).otherwise(
        F.raise_error(
            F.lit(
                "post_strat_from_census: arm must be 0/1 and non-NULL "
                "— a census row outside the design has no cell"
            )
        ).cast("bigint")
    )

    def cell(a: int, suffix: str):
        m = F.when(F.col("__arm") == a, F.col(meas_col).cast("bigint"))
        s = F.when(F.col("__arm") == a, F.col(sum_col).cast(_D))
        return [
            F.coalesce(F.sum(m), F.lit(0))
            .cast("bigint")
            .alias(f"__n_{suffix}"),
            F.coalesce(F.sum(s), F.lit(0)).cast(_D).alias(f"__s_{suffix}"),
        ]

    strata = (
        census.withColumn("__arm", arm_ok)
        .groupBy(*group_cols, stratum_col)
        .agg(*cell(0, "c"), *cell(1, "t"))
    )
    return _post_strat_fold(strata, group_cols)


def _post_strat_fold(strata: DataFrame, group_cols: list[str]) -> DataFrame:
    """Shared tail of post_strat_ate / post_strat_from_census: the
    weighted per-stratum-difference fold over ``(*groups, stratum,
    __n_c, __s_c, __n_t, __s_t)``."""
    both = (F.col("__n_t") > 0) & (F.col("__n_c") > 0)
    strata = strata.withColumn(
        "__diff",
        F.when(
            both,
            (
                F.expr(f"__s_t div __n_t").cast("bigint")
                - F.expr(f"__s_c div __n_c").cast("bigint")
            ).cast("bigint"),
        ),
    ).withColumn(
        "__w", F.when(both, (F.col("__n_t") + F.col("__n_c")).cast("bigint"))
    )
    g = strata.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        F.count("__diff").cast("bigint").alias("n_strata_used"),
        F.coalesce(F.sum("__n_t"), F.lit(0)).cast("bigint").alias("n_trt"),
        F.coalesce(F.sum("__n_c"), F.lit(0)).cast("bigint").alias("n_ctl"),
        F.coalesce(F.sum("__s_t"), F.lit(0)).cast(_D).alias("__st"),
        F.coalesce(F.sum("__s_c"), F.lit(0)).cast(_D).alias("__sc"),
        F.coalesce(
            F.sum((F.col("__w").cast(_D) * F.col("__diff").cast(_D)).cast(_D)),
            F.lit(0),
        )
        .cast(_D)
        .alias("__wd"),
        F.coalesce(F.sum("__w"), F.lit(0)).cast("bigint").alias("__wsum"),
    )
    naive = F.when(
        (F.col("n_trt") > 0) & (F.col("n_ctl") > 0),
        (
            F.expr("__st div n_trt").cast("bigint")
            - F.expr("__sc div n_ctl").cast("bigint")
        ).cast("bigint"),
    )
    ate = F.when(
        F.col("__wsum") > 0,
        F.when(
            F.col("__wd") >= 0, F.expr("__wd div __wsum")
        ).otherwise(-F.expr("(-__wd) div __wsum")),
    ).cast("bigint")
    return g.select(
        *group_cols,
        "n_strata",
        "n_strata_used",
        "n_trt",
        "n_ctl",
        naive.alias("naive_diff_milli"),
        ate.alias("ate_milli"),
    )


def cuped_adjusted_ate(
    df: DataFrame,
    *,
    arm_col: str,
    value_col: str,
    covariate_col: str,
    group_cols: list[str],
    quant_scale: int = 1000,
) -> DataFrame:
    """CUPED variance-reduced treatment-effect readout per group
    (Deng, Xu, Kohavi & Walker, WSDM 2013 — public): adjust the metric
    with a pre-experiment covariate,

        theta = cov(x, y) / var(x)        (pooled across arms)
        ate_cuped = (my_t - my_c) - theta * (mx_t - mx_c)

    which removes the covariate-explained variance from the arm
    difference while leaving its expectation untouched (the covariate
    predates assignment, so E[mx_t - mx_c] = 0 under randomization —
    a nonzero dx is the finite-sample imbalance CUPED corrects).

    Exactness contract: per-row fixed-point quantization of BOTH
    columns (``floor(v * quant_scale)``, 2^62 guard); theta carried as
    ONE sign-split truncating division in exact milli,

        theta_milli = (1000 * (n*Sxy - Sx*Sy)) / (n*Sxx - Sx*Sx)

    with DECIMAL(38,0) numerator/denominator (var(x)'s denominator is
    >= 0 by Cauchy-Schwarz, so only the numerator sign splits); each
    arm mean is one truncating division; the adjustment term is one
    further sign-split division ``theta_milli * dx_milli div 1000``.
    Every truncation is <= 1 milli, stated, and the oracle replays the
    identical fold in HUGEINT.  Units missing EITHER column are
    excluded entirely (pairs semantics — theta and the means must see
    the same population); arm must be 0/1 non-NULL (fail fast).  A
    constant covariate (var = 0) yields NULL theta and NULL
    ``ate_cuped_milli`` — the naive readout still reports.  One-armed
    groups yield NULL for both readouts.  The cross-moment operands
    are enveloped in DOUBLE against 1e37 (fail-fast threaded into the
    consumed count — beyond ~1e12 units at milli scale, sample or
    rescale; the naive difference stays exact at any n).

    Scale posture (100 TB): ONE map-side-combinable groupBy per group —
    ten conditional sums/counts — then per-group scalar algebra.  No
    window, no join.

    Engine extension — the reference (exporter.py:75-141) has no
    experiment-analytics tier; cited for provenance only.
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if quant_scale < 1:
        raise ValueError(f"quant_scale must be positive, got {quant_scale}")
    arm = F.col(arm_col)
    bad = arm.isNull() | ~arm.cast("bigint").isin(0, 1)
    arm_ok = F.when(~bad, arm.cast("bigint")).otherwise(
        F.raise_error(
            F.lit(
                "cuped_adjusted_ate: arm must be 0/1 and non-NULL — a "
                "row outside the design has no cell; filter upstream"
            )
        ).cast("bigint")
    )
    cap = float(1 << 62)

    def quant(col: str, what: str) -> F.Column:
        q = F.floor(F.col(col) * F.lit(quant_scale)).cast("bigint")
        return F.when(
            F.col(col).isNull(), F.lit(None).cast("bigint")
        ).when(F.abs(F.col(col) * F.lit(quant_scale)) < F.lit(cap), q).otherwise(
            F.raise_error(
                F.lit(
                    f"cuped_adjusted_ate: |{what} * {quant_scale}| >= 2^62 "
                    "would overflow the per-row fixed-point quantization; "
                    "lower quant_scale"
                )
            ).cast("bigint")
        )

    d = (
        df.withColumn("__arm", arm_ok)
        .withColumn("__yq", quant(value_col, "value"))
        .withColumn("__xq", quant(covariate_col, "covariate"))
        # pairs semantics: theta and the means must see one population
        .filter(F.col("__yq").isNotNull() & F.col("__xq").isNotNull())
    )
    g = d.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.count(F.when(F.col("__arm") == 1, 1)).cast("bigint").alias("n_trt"),
        F.count(F.when(F.col("__arm") == 0, 1)).cast("bigint").alias("n_ctl"),
        F.coalesce(F.sum(F.col("__yq").cast(_D)), F.lit(0)).cast(_D).alias("__sy"),
        F.coalesce(F.sum(F.col("__xq").cast(_D)), F.lit(0)).cast(_D).alias("__sx"),
        F.coalesce(
            F.sum((F.col("__xq").cast(_D) * F.col("__yq").cast(_D)).cast(_D)),
            F.lit(0),
        ).cast(_D).alias("__sxy"),
        F.coalesce(
            F.sum((F.col("__xq").cast(_D) * F.col("__xq").cast(_D)).cast(_D)),
            F.lit(0),
        ).cast(_D).alias("__sxx"),
        F.coalesce(
            F.sum(F.when(F.col("__arm") == 1, F.col("__yq")).cast(_D)),
            F.lit(0),
        ).cast(_D).alias("__syt"),
        F.coalesce(
            F.sum(F.when(F.col("__arm") == 0, F.col("__yq")).cast(_D)),
            F.lit(0),
        ).cast(_D).alias("__syc"),
        F.coalesce(
            F.sum(F.when(F.col("__arm") == 1, F.col("__xq")).cast(_D)),
            F.lit(0),
        ).cast(_D).alias("__sxt"),
        F.coalesce(
            F.sum(F.when(F.col("__arm") == 0, F.col("__xq")).cast(_D)),
            F.lit(0),
        ).cast(_D).alias("__sxc"),
    )
    return _cuped_fold(g, group_cols)


def cuped_census_projection(
    df: DataFrame,
    *,
    arm_col: str,
    value_col: str,
    covariate_col: str,
    group_cols: list[str],
    quant_scale: int = 1000,
) -> DataFrame:
    """Project experiment rows to the associative cross-moment census
    the streaming CUPED twin maintains (streaming/census.py
    read_cuped_ate): key ``(*group_cols, arm)`` with four sum columns
    — ``__y``/``__x`` (quantized metric/covariate) and
    ``__xy``/``__xx`` (per-row DECIMAL(38,0) cross products, so the
    census sums ARE the batch operator's moments).  Pairs semantics is
    applied HERE (units missing either column never census — theta and
    the means must see one population).  Maintain with
    ``stream_census(..., key_cols=[*group_cols, "arm"],
    sum_cols={"sum_y": "__y", "sum_x": "__x", "sum_xy": "__xy",
    "sum_xx": "__xx"})``; the maintainer's n_rows IS the pair count."""
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if quant_scale < 1:
        raise ValueError(f"quant_scale must be positive, got {quant_scale}")
    arm = F.col(arm_col)
    bad = arm.isNull() | ~arm.cast("bigint").isin(0, 1)
    arm_ok = F.when(~bad, arm.cast("bigint")).otherwise(
        F.raise_error(
            F.lit(
                "cuped_census_projection: arm must be 0/1 and non-NULL "
                "— a row outside the design has no cell; filter upstream"
            )
        ).cast("bigint")
    )
    cap = float(1 << 62)

    def quant(col: str, what: str) -> F.Column:
        q = F.floor(F.col(col) * F.lit(quant_scale)).cast("bigint")
        return F.when(
            F.col(col).isNull(), F.lit(None).cast("bigint")
        ).when(F.abs(F.col(col) * F.lit(quant_scale)) < F.lit(cap), q).otherwise(
            F.raise_error(
                F.lit(
                    f"cuped_census_projection: |{what} * {quant_scale}| "
                    ">= 2^62 would overflow the per-row fixed-point "
                    "quantization; lower quant_scale"
                )
            ).cast("bigint")
        )

    d = (
        df.withColumn("__arm", arm_ok)
        .withColumn("__y", quant(value_col, "value"))
        .withColumn("__x", quant(covariate_col, "covariate"))
        .filter(F.col("__y").isNotNull() & F.col("__x").isNotNull())
    )
    return d.select(
        *group_cols,
        F.col("__arm").alias("arm"),
        "__y",
        "__x",
        (F.col("__x").cast(_D) * F.col("__y").cast(_D)).cast(_D).alias("__xy"),
        (F.col("__x").cast(_D) * F.col("__x").cast(_D)).cast(_D).alias("__xx"),
    )


def cuped_from_census(
    census: DataFrame,
    *,
    group_cols: list[str],
    arm_col: str = "arm",
    count_col: str = "n_rows",
    sum_y_col: str = "sum_y",
    sum_x_col: str = "sum_x",
    sum_xy_col: str = "sum_xy",
    sum_xx_col: str = "sum_xx",
) -> DataFrame:
    """The census-sized fold `cuped_adjusted_ate` shares with its
    streaming twin (streaming/census.py read_cuped_ate): pool a
    maintained per-(group, arm) cross-moment census — counts and the
    four moment sums all ADD, so theta, both arm means and the
    adjusted readout re-derive exactly from two rows per group.  A
    late unit revises one arm's moments, which moves theta (pooled!)
    AND the means — cross-arm damage only the census fold re-derives.
    An out-of-design arm VALUE fails fast at read (the batch
    contract, enforced census-side)."""
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    arm = F.col(arm_col)
    bad = arm.isNull() | ~arm.cast("bigint").isin(0, 1)
    arm_ok = F.when(~bad, arm.cast("bigint")).otherwise(
        F.raise_error(
            F.lit(
                "cuped_from_census: arm must be 0/1 and non-NULL — a "
                "census row outside the design has no cell"
            )
        ).cast("bigint")
    )

    def pooled(src: str, out: str):
        return F.coalesce(F.sum(F.col(src).cast(_D)), F.lit(0)).cast(_D).alias(out)

    def per_arm(src: str, a: int, out: str):
        return (
            F.coalesce(
                F.sum(F.when(F.col("__arm") == a, F.col(src).cast(_D))),
                F.lit(0),
            )
            .cast(_D)
            .alias(out)
        )

    n = F.col(count_col).cast("bigint")
    g = census.withColumn("__arm", arm_ok).groupBy(*group_cols).agg(
        F.coalesce(F.sum(n), F.lit(0)).cast("bigint").alias("n_pairs"),
        F.coalesce(F.sum(F.when(F.col("__arm") == 1, n)), F.lit(0))
        .cast("bigint")
        .alias("n_trt"),
        F.coalesce(F.sum(F.when(F.col("__arm") == 0, n)), F.lit(0))
        .cast("bigint")
        .alias("n_ctl"),
        pooled(sum_y_col, "__sy"),
        pooled(sum_x_col, "__sx"),
        pooled(sum_xy_col, "__sxy"),
        pooled(sum_xx_col, "__sxx"),
        per_arm(sum_y_col, 1, "__syt"),
        per_arm(sum_y_col, 0, "__syc"),
        per_arm(sum_x_col, 1, "__sxt"),
        per_arm(sum_x_col, 0, "__sxc"),
    )
    return _cuped_fold(g, group_cols)


def _cuped_fold(g: DataFrame, group_cols: list[str]) -> DataFrame:
    """Shared tail of cuped_adjusted_ate / cuped_from_census: theta,
    arm means and the adjusted readout over the pooled cross-moment
    row ``(*groups, n_pairs, n_trt, n_ctl, __sy, __sx, __sxy, __sxx,
    __syt, __syc, __sxt, __sxc)``."""
    # DOUBLE envelope over the biggest cross-moment operands, threaded
    # into the consumed pair count so Catalyst cannot prune the guard
    dd = lambda name: F.col(name).cast("double")  # noqa: E731
    env = F.greatest(
        F.abs(dd("n_pairs") * dd("__sxy")) * 1000.0,
        F.abs(dd("__sx") * dd("__sy")) * 1000.0,
        dd("n_pairs") * dd("__sxx"),
        dd("__sx") * dd("__sx"),
    )
    n_ok = F.when(env <= F.lit(1e37), F.col("n_pairs")).otherwise(
        F.raise_error(
            F.lit(
                "cuped_adjusted_ate: a cross-moment operand exceeds the "
                "1e37 DECIMAL(38,0) envelope — sample units or lower "
                "quant_scale (the naive difference stays exact at any n)"
            )
        ).cast("bigint")
    )
    g = g.withColumn("__n_ok", n_ok)
    tnum = F.expr(
        "1000 * (cast(__n_ok as decimal(38,0)) * __sxy - __sx * __sy)"
    ).cast(_D)
    tden = F.expr(
        "cast(__n_ok as decimal(38,0)) * __sxx - __sx * __sx"
    ).cast(_D)
    g = g.withColumn("__tnum", tnum).withColumn("__tden", tden)
    theta = F.when(
        F.col("__tden") > 0,
        F.when(
            F.col("__tnum") >= 0, F.expr("__tnum div __tden")
        ).otherwise(-F.expr("(-__tnum) div __tden")),
    ).cast("bigint")
    g = g.withColumn("theta_milli", theta)
    both = (F.col("n_trt") > 0) & (F.col("n_ctl") > 0)
    g = g.withColumn(
        "naive_diff_milli",
        F.when(
            both,
            (
                F.expr("__syt div n_trt").cast("bigint")
                - F.expr("__syc div n_ctl").cast("bigint")
            ),
        ),
    ).withColumn(
        "__dx",
        F.when(
            both,
            (
                F.expr("__sxt div n_trt").cast("bigint")
                - F.expr("__sxc div n_ctl").cast("bigint")
            ),
        ),
    )
    adj_num = (F.col("theta_milli").cast(_D) * F.col("__dx").cast(_D)).cast(_D)
    adj = F.when(
        adj_num >= 0, F.expr(f"(cast(theta_milli as {_D}) * __dx) div 1000")
    ).otherwise(
        -F.expr(f"(-(cast(theta_milli as {_D}) * __dx)) div 1000")
    ).cast("bigint")
    return g.select(
        *group_cols,
        "n_pairs",
        "n_trt",
        "n_ctl",
        "theta_milli",
        "naive_diff_milli",
        F.when(
            both & F.col("theta_milli").isNotNull(),
            F.col("naive_diff_milli") - adj,
        ).alias("ate_cuped_milli"),
    )


def srm_check(
    df: DataFrame,
    *,
    arm_col: str,
    group_cols: list[str],
    expected_trt_ppm: int = 500_000,
) -> DataFrame:
    """Sample-ratio-mismatch guard per group — the experimentation
    tier's validity gate: BEFORE reading any effect, test whether the
    observed arm split matches the DESIGN allocation (a mismatch means
    broken assignment/logging and invalidates every downstream
    readout; the classic Kohavi/Fabijan practice, public).

    One-degree chi-square goodness-of-fit against the design share
    ``p`` (in ppm), collapsed to exact integers: with ``d = n_t*1e6 -
    n*p`` (the ppm-scaled deviation), the two-cell Pearson statistic
    algebraically reduces to

        chi2 = d^2 / (n * p * (1e6 - p))
        srm_chi2_milli = (1000 * d^2) div (n * p * (1e6 - p))

    — one truncating division of non-negative DECIMAL(38,0) operands,
    replayed verbatim in HUGEINT.  ``srm_flag`` fires at the standard
    alpha = 0.05 threshold (chi2 > 3.841, i.e. chi2_milli > 3841).
    The squared deviation is enveloped in DOUBLE against 1e37
    (fail-fast threaded into the consumed count — beyond ~2e11 units
    at worst-case imbalance, sample; the decision is saturated long
    before).  Arm must be 0/1 non-NULL (fail fast); expected share
    must be strictly inside (0, 1e6).

    Scale posture (100 TB): ONE map-side-combinable groupBy — two
    conditional counts per group — then scalar algebra.  No window,
    no join.

    Engine extension — the reference (exporter.py:75-141) has no
    experiment-analytics tier; cited for provenance only.
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if not 0 < expected_trt_ppm < 1_000_000:
        raise ValueError(
            f"expected_trt_ppm must be in (0, 1e6), got {expected_trt_ppm}"
        )
    arm = F.col(arm_col)
    bad = arm.isNull() | ~arm.cast("bigint").isin(0, 1)
    arm_ok = F.when(~bad, arm.cast("bigint")).otherwise(
        F.raise_error(
            F.lit(
                "srm_check: arm must be 0/1 and non-NULL — a row "
                "outside the design has no cell; filter upstream"
            )
        ).cast("bigint")
    )
    g = df.withColumn("__arm", arm_ok).groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_units"),
        F.coalesce(F.sum("__arm"), F.lit(0)).cast("bigint").alias("n_trt"),
    )
    return _srm_fold(g, group_cols, expected_trt_ppm)


def srm_from_census(
    census: DataFrame,
    *,
    group_cols: list[str],
    arm_col: str = "arm",
    count_col: str = "n_rows",
    expected_trt_ppm: int = 500_000,
) -> DataFrame:
    """The census-sized fold `srm_check` shares with its streaming twin
    (streaming/census.py read_srm): per-group arm totals from a
    maintained ``(*groups, arm, n_rows)`` census, then the identical
    chi-square algebra.  An out-of-design arm VALUE in the census fails
    fast at read (the batch contract, enforced census-side)."""
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if not 0 < expected_trt_ppm < 1_000_000:
        raise ValueError(
            f"expected_trt_ppm must be in (0, 1e6), got {expected_trt_ppm}"
        )
    arm = F.col(arm_col)
    bad = arm.isNull() | ~arm.cast("bigint").isin(0, 1)
    arm_ok = F.when(~bad, arm.cast("bigint")).otherwise(
        F.raise_error(
            F.lit(
                "srm_from_census: arm must be 0/1 and non-NULL — a "
                "census row outside the design has no cell"
            )
        ).cast("bigint")
    )
    n = F.col(count_col).cast("bigint")
    g = census.withColumn("__arm", arm_ok).groupBy(*group_cols).agg(
        F.coalesce(F.sum(n), F.lit(0)).cast("bigint").alias("n_units"),
        F.coalesce(F.sum(F.col("__arm") * n), F.lit(0))
        .cast("bigint")
        .alias("n_trt"),
    )
    return _srm_fold(g, group_cols, expected_trt_ppm)


def _srm_fold(
    g: DataFrame, group_cols: list[str], expected_trt_ppm: int
) -> DataFrame:
    """Shared tail: chi2 = d^2/(n*p*q) over (group, n_units, n_trt)."""
    p, q = expected_trt_ppm, 1_000_000 - expected_trt_ppm
    g = g.withColumn("n_ctl", (F.col("n_units") - F.col("n_trt")).cast("bigint"))
    dev = F.expr(
        f"cast(n_trt as {_D}) * 1000000 - cast(n_units as {_D}) * {p}"
    ).cast(_D)
    g = g.withColumn("__d", dev)
    env = (
        F.col("__d").cast("double") * F.col("__d").cast("double")
    ) * F.lit(1000.0)
    n_ok = F.when(env <= F.lit(1e37), F.col("n_units")).otherwise(
        F.raise_error(
            F.lit(
                "srm_check: the squared ppm deviation exceeds the 1e37 "
                "DECIMAL(38,0) envelope — sample units (the SRM decision "
                "is saturated at such n)"
            )
        ).cast("bigint")
    )
    g = g.withColumn("__n_ok", n_ok)
    chi2 = F.expr(
        f"(1000 * __d * __d) div (cast(__n_ok as {_D}) * {p} * {q})"
    ).cast("bigint")
    return g.select(
        *group_cols,
        "n_units",
        "n_trt",
        "n_ctl",
        F.expr(f"(cast(n_trt as {_D}) * 1000000) div n_units")
        .cast("bigint")
        .alias("observed_trt_ppm"),
        F.lit(p).cast("bigint").alias("expected_trt_ppm"),
        chi2.alias("srm_chi2_milli"),
        (chi2 > 3841).alias("srm_flag"),
    )


def woe_iv(
    df: DataFrame,
    *,
    label_col: str,
    value_col: str,
    group_cols: list[str] | None = None,
    n_bins: int = 10,
    quant_scale: int = 100,
) -> DataFrame:
    """Weight-of-evidence / information-value feature screen — the
    credit-scoring-lineage predictive-power report a training pipeline
    runs per candidate feature before fitting anything (Siddiqi,
    "Credit Risk Scorecards", and decades of public practice):

        woe_b = ln( (g_b / G) / (b_b / B) )
        iv    = sum_b (g_b / G - b_b / B) * woe_b

    over equal-width value bins (the ks_drift binning law: quantize to
    integers, ``w = span div n_bins + 1``, clamp — bins derive from
    each group's own min/max).  |IV| reads on the classic ladder:
    < 0.02 useless, 0.02-0.1 weak, 0.1-0.3 medium, 0.3+ strong.

    Determinism contract: bin edges, counts and every product are
    exact integers (DECIMAL(38,0) cross-multiplies); ``woe`` is ONE
    double division of two exact integers followed by ``ln`` and
    ``round(6)`` (the corr_pairs/BM25 stance — IEEE divide and libm ln
    agree across engines on identical doubles); each IV contribution
    multiplies the ROUNDED woe by an exact-integer ratio cast to
    double once, and the sum folds in BIN ORDER over the collected
    per-group array (the ndcg_at_k stance — no float-sum order
    anywhere).  One-sided bins (zero goods or zero bads) carry NULL
    woe and contribute NOTHING to IV (stated — the unsmoothed
    convention; add-0.5 smoothing belongs to the caller's projection).
    One-class groups (G = 0 or B = 0) report NULL woe everywhere and
    NULL iv.  NULL values are excluded; NULL / non-0/1 labels fail
    fast (the srm_check convention).  Empty bins appear with zero
    counts (the spine is generated, not observed).

    Returns per-bin rows ``(*group_cols, bin, lo_scaled, n_good,
    n_bad, woe, iv)`` with ``iv`` repeated on every row of its group
    (the ks_scaled shape).

    Scale posture (100 TB): TWO data-sized map-side-combinable
    groupBys (the per-group extrema/totals census, then the bin
    census after a broadcast join of the group-sized stats) +
    constant-size frames after that — the spine is groups x n_bins
    rows and the IV fold runs on collected <= n_bins arrays.  No
    window over data, no cartesian.

    Engine extension — the reference (exporter.py:75-141) has no
    feature-screening tier; cited for provenance only.
    """
    groups = group_cols or []
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    if quant_scale < 1:
        raise ValueError(f"quant_scale must be >= 1, got {quant_scale}")
    lab = F.col(label_col)
    bad_lab = lab.isNull() | ~lab.cast("bigint").isin(0, 1)
    lab_ok = F.when(~bad_lab, lab.cast("bigint")).otherwise(
        F.raise_error(
            F.lit(
                "woe_iv: label must be 0/1 and non-NULL — a row outside "
                "the design has no cell; filter upstream"
            )
        ).cast("bigint")
    )
    cap = float(1 << 62)
    q = F.floor(F.col(value_col) * F.lit(quant_scale)).cast("bigint")
    xq = F.when(
        F.abs(F.col(value_col) * F.lit(quant_scale)) < F.lit(cap), q
    ).otherwise(
        F.raise_error(
            F.lit(
                f"woe_iv: |value * {quant_scale}| >= 2^62 would overflow "
                "the fixed-point quantization; lower quant_scale"
            )
        ).cast("bigint")
    )
    d = (
        df.filter(F.col(value_col).isNotNull())
        .withColumn("__y", lab_ok)
        .withColumn("__x", xq)
    )
    # pass 1: per-group extrema + class totals (combinable).
    # localCheckpointed (eager): the group-sized stats feed BOTH the
    # bin-census broadcast join and the spine — without materializing,
    # the data-sized extrema pass re-executes per consumer (the
    # triangle_count / CC lesson).
    stats = d.groupBy(*groups).agg(
        F.min("__x").alias("__lo"),
        F.expr(f"((max(__x) - min(__x)) div {n_bins}) + 1").alias("__w"),
        F.sum("__y").cast("bigint").alias("__G"),
        F.count(F.when(F.col("__y") == 0, 1)).cast("bigint").alias("__B"),
    ).localCheckpoint()
    # pass 2: bin census after a broadcast join of the group-sized stats
    joined = (
        d.join(F.broadcast(stats), groups)
        if groups
        else d.crossJoin(F.broadcast(stats))
    )
    bin_of = F.expr(
        f"least(cast({n_bins} - 1 as bigint), "
        "greatest(cast(0 as bigint), (__x - __lo) div __w))"
    )
    census = (
        joined.select(*groups, bin_of.alias("bin"), "__y")
        .groupBy(*groups, "bin")
        .agg(
            F.sum("__y").cast("bigint").alias("n_good"),
            F.count(F.when(F.col("__y") == 0, 1))
            .cast("bigint")
            .alias("n_bad"),
        )
    )
    spark = df.sparkSession
    spine = (
        spark.range(n_bins)
        .select(F.col("id").cast("bigint").alias("bin"))
        .crossJoin(F.broadcast(stats))
    )
    per_bin = (
        spine.join(census, [*groups, "bin"], "left")
        .select(
            *groups,
            "bin",
            (F.col("__lo") + F.col("bin") * F.col("__w")).alias("lo_scaled"),
            F.coalesce("n_good", F.lit(0)).cast("bigint").alias("n_good"),
            F.coalesce("n_bad", F.lit(0)).cast("bigint").alias("n_bad"),
            "__G",
            "__B",
        )
    )
    # woe: exact integer cross products -> ONE double division -> ln
    gb = F.expr(f"cast(n_good as {_D}) * cast(__B as {_D})").cast("double")
    bg = F.expr(f"cast(n_bad as {_D}) * cast(__G as {_D})").cast("double")
    woe = F.when(
        (F.col("n_good") > 0)
        & (F.col("n_bad") > 0)
        & (F.col("__G") > 0)
        & (F.col("__B") > 0),
        F.round(F.log(gb / bg), 6),
    )
    # IV contribution: exact-integer rate difference x the ROUNDED woe
    dd = F.expr(
        f"cast(cast(n_good as {_D}) * cast(__B as {_D}) "
        f"- cast(n_bad as {_D}) * cast(__G as {_D}) as {_D})"
    ).cast("double") / F.expr(
        f"cast(cast(__G as {_D}) * cast(__B as {_D}) as {_D})"
    ).cast("double")
    contrib = F.when(F.col("__woe").isNotNull(), dd * F.col("__woe")).otherwise(
        F.lit(0.0)
    )
    binned = per_bin.withColumn("__woe", woe).withColumn("__c", contrib)
    # ONE collect-fold-explode pass computes iv in BIN ORDER and fans
    # the rows back out — a separate iv aggregation branch would
    # re-execute the census subtree per consumer
    folded = (
        binned.groupBy(*groups)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("bin").alias("bin"),
                        F.col("lo_scaled").alias("lo_scaled"),
                        F.col("n_good").alias("n_good"),
                        F.col("n_bad").alias("n_bad"),
                        F.col("__woe").alias("woe"),
                        F.col("__c").alias("c"),
                        F.col("__G").alias("g"),
                        F.col("__B").alias("b"),
                    )
                )
            ).alias("__rows")
        )
        .withColumn(
            "iv",
            F.when(
                (F.element_at("__rows", 1)["g"] > 0)
                & (F.element_at("__rows", 1)["b"] > 0),
                F.round(
                    F.aggregate(
                        F.expr("transform(__rows, r -> r.c)"),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ),
                    6,
                ),
            ),
        )
    )
    return folded.select(
        *groups, "iv", F.explode("__rows").alias("__r")
    ).select(
        *groups,
        F.col("__r.bin").alias("bin"),
        F.col("__r.lo_scaled").alias("lo_scaled"),
        F.col("__r.n_good").alias("n_good"),
        F.col("__r.n_bad").alias("n_bad"),
        F.col("__r.woe").alias("woe"),
        "iv",
    )


def binned_psi(
    ref: DataFrame,
    cur: DataFrame,
    *,
    value_col: str,
    n_bins: int = 20,
    quant_scale: int = 1000,
) -> DataFrame:
    """Population Stability Index on the shared reference binning — the
    credit-scoring / model-monitoring drift standard next to the binned
    KS screen (public practice for decades; the 0.1 / 0.25
    watch/action ladder):

        psi = sum_b (p_cur_b - p_ref_b) * ln(p_cur_b / p_ref_b)

    Rides the IDENTICAL binning core as :func:`binned_ks_drift`
    (ks_reference / ks_census — bins from the reference alone, knobs
    stamped on the stats frame), so a pipeline monitoring both metrics
    pays ONE census per sample, and the streaming KS census
    (streaming/drift.py) folds PSI at read via
    :func:`psi_from_censuses` with no new state.

    Determinism contract: counts and cross products are exact
    integers; each bin's term casts the exact DECIMAL(38,0) operands
    to double once and evaluates ``dd * ln(ratio)`` in fixed order
    (the corr_pairs/BM25 stance), and the PSI total folds in BIN ORDER
    over the collected bin array (the ndcg stance).  Bins empty on
    EITHER side have no defined term — reported NULL and EXCLUDED
    from the sum (``n_bins_used`` rides along; the add-epsilon
    convention belongs to the caller's projection).  An empty current
    sample yields NULL psi.

    Returns per-bin rows ``(bin, lo_scaled, n_ref, n_cur, psi_term,
    n_bins_used, psi)`` with psi/n_bins_used repeated per row (the
    ks_scaled shape).

    Scale posture (100 TB): two map-side-combinable bin censuses (the
    only data-sized work) + constant-size frames after that — the
    fold runs on ONE collected <= n_bins array.
    """
    stats, rb = ks_reference(
        ref, value_col=value_col, n_bins=n_bins, quant_scale=quant_scale
    )
    cb = ks_census(cur, stats, value_col=value_col, out_name="n_cur")
    return psi_from_censuses(
        ref.sparkSession, stats, rb, cb, n_bins=n_bins
    )


def psi_from_censuses(
    spark, stats: DataFrame, rb: DataFrame, cb: DataFrame, *, n_bins: int
) -> DataFrame:
    """The PSI fold given the two bin censuses — the census-sized core
    shared with the streaming KS monitor's maintained current census
    (bin counts are associative; a late value revises one bin, which
    moves BOTH totals-normalized shares and therefore every term)."""
    n_cur = cb.agg(
        F.coalesce(F.sum("n_cur"), F.lit(0)).cast("bigint").alias("__nc")
    )
    spine = (
        spark.range(n_bins)
        .select(F.col("id").cast("bigint").alias("bin"))
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(n_cur))
    )
    joined = (
        spine.join(rb, "bin", "left")
        .join(cb, "bin", "left")
        .select(
            "bin",
            F.when(
                F.col("__nb") == F.lit(n_bins),
                F.col("__lo") + F.col("bin") * F.col("__w"),
            ).otherwise(
                F.raise_error(
                    F.lit(
                        "psi_from_censuses: n_bins disagrees with the "
                        "stats frame's stamped binning — rebuild the "
                        "censuses via ks_reference/ks_census"
                    )
                ).cast("bigint")
            ).alias("lo_scaled"),
            F.coalesce("n_ref", F.lit(0)).cast("bigint").alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).cast("bigint").alias("n_cur"),
            F.col("__nr"),
            F.col("__nc"),
        )
    )
    # exact integer cross products -> double once, fixed order
    num = F.expr(f"cast(n_cur as {_D}) * cast(__nr as {_D})").cast("double")
    den = F.expr(f"cast(n_ref as {_D}) * cast(__nc as {_D})").cast("double")
    dd = F.expr(
        f"cast(cast(n_cur as {_D}) * cast(__nr as {_D}) "
        f"- cast(n_ref as {_D}) * cast(__nc as {_D}) as {_D})"
    ).cast("double") / F.expr(
        f"cast(cast(__nr as {_D}) * cast(__nc as {_D}) as {_D})"
    ).cast("double")
    term = F.when(
        (F.col("n_ref") > 0)
        & (F.col("n_cur") > 0)
        & (F.col("__nc") > 0),
        dd * F.log(num / den),
    )
    binned = joined.withColumn("__t", term)
    folded = (
        binned.groupBy()
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("bin").alias("bin"),
                        F.col("lo_scaled").alias("lo_scaled"),
                        F.col("n_ref").alias("n_ref"),
                        F.col("n_cur").alias("n_cur"),
                        F.col("__t").alias("t"),
                        F.col("__nc").alias("nc"),
                    )
                )
            ).alias("__rows")
        )
        .select(
            "__rows",
            F.expr(
                "size(filter(__rows, r -> r.t is not null))"
            ).cast("bigint").alias("n_bins_used"),
            F.when(
                F.element_at("__rows", 1)["nc"] > 0,
                F.round(
                    F.aggregate(
                        F.expr(
                            "transform(__rows, "
                            "r -> coalesce(r.t, cast(0.0 as double)))"
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ),
                    6,
                ),
            ).alias("psi"),
        )
    )
    return folded.select(
        F.explode("__rows").alias("__r"), "n_bins_used", "psi"
    ).select(
        F.col("__r.bin").alias("bin"),
        F.col("__r.lo_scaled").alias("lo_scaled"),
        F.col("__r.n_ref").alias("n_ref"),
        F.col("__r.n_cur").alias("n_cur"),
        F.round(F.col("__r.t"), 6).alias("psi_term"),
        "n_bins_used",
        "psi",
    )


def kruskal_wallis(
    df: DataFrame,
    *,
    arm_col: str,
    value_col: str,
    group_cols: list[str],
) -> DataFrame:
    """Kruskal-Wallis H test per group — the k-sample generalization of
    ``rank_sum_test``: did ANY of k arms' value distributions shift,
    without assuming normality?  The one-way ANOVA on ranks, and the
    standard omnibus screen before pairwise rank-sum drill-downs.

    Exact rank algebra over the VALUE CENSUS, doubled midranks as in
    rank_sum_test (``rank2 = 2·cum − t + 1`` via a RANGE-frame running
    sum, so ties across ALL arms share one midrank).  With per-arm rank
    sums ``R2_j = Σ cnt·rank2`` (= 2·R_j) and n = Σ n_j:

        H     = 3·Σ_j (R2_j²/n_j) / (n(n+1)) − 3(n+1)
        H_adj = H / (1 − T/(n³−n)),   T = Σ(t³−t)  (tie correction)

    kept engine-exact by THREE stated truncations, each replayed
    verbatim by the HUGEINT oracle:

        q_j         = (R2_j · R2_j) div n_j            (per-arm, < 1 ulp)
        h_milli     = (1000·max(0, 3·Σq − 3n(n+1)²)) div (n(n+1))
        h_adj_milli = least((h_milli·(n³−n)) div (n³−n−T), SAT64)

    (q_j and h_adj divide in DECIMAL — their quotients are Θ(n³),
    past BIGINT at a few million units per group — and h_adj
    saturates at 4e18 under near-total ties, replayed by the oracle's
    identical least()).

    (the max(0,·) absorbs the ≤ k-ulp downward drift of Σq at H ≈ 0 —
    H is non-negative by construction).  The effect-size companion
    epsilon² = (H−k+1)/(n−k) is emitted as a sign-split truncating
    division (legitimately negative below the null).  All-tied groups
    (n³−n = T) and single-value groups emit NULL h_adj; one-armed
    groups emit NULL epsilon².

    NULL values are unranked and dropped; ``arm_col`` may be ANY
    discrete type (string arms welcome — unlike the 0/1 rank_sum
    contract, k is data-driven).

    Returns ``(*group_cols, n, n_arms, t3, h_milli, h_adj_milli,
    eps2_milli)``.

    Scale posture (100 TB): ONE data-sized combinable groupBy (the
    (group, arm, value) census), two census-sized window passes on the
    group key (tie totals; RANGE-frame cumulative), one combinable
    census-sized groupBy to arm rows (k per group), then per-group
    scalar algebra.  No join.

    Capacity: the binding products are ``R2_j² ≲ 4n⁴`` (per-arm q) and
    ``h_milli·n³ ≲ 10³·n⁴`` — a DOUBLE envelope fail-fast (threaded
    into the consumed n_j, the rank_sum_test pattern) trips past 1e37,
    admitting groups to n ~ 1e8; beyond that, sample (the omnibus call
    is saturated at such n).

    Engine extension — the reference (exporter.py:75-141) has no
    statistics tier; test per Kruskal & Wallis (1952) as in standard
    texts.
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    from pyspark.sql import Window

    census = (
        df.filter(F.col(value_col).isNotNull())
        .filter(
            F.when(
                F.col(arm_col).isNotNull(), F.lit(True)
            ).otherwise(
                F.raise_error(
                    F.lit(
                        "kruskal_wallis: arm must be non-NULL — a unit "
                        "outside the experiment's frame has no rank; "
                        "filter upstream"
                    )
                )
            )
        )
        .groupBy(
            *group_cols,
            F.col(arm_col).alias("__arm"),
            F.col(value_col).cast("bigint").alias("__v"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("__cnt"))
    )
    return kruskal_wallis_from_census(census, group_cols=group_cols)


def kruskal_wallis_from_census(
    census: DataFrame,
    *,
    group_cols: list[str],
    arm_col: str = "__arm",
    value_col: str = "__v",
    count_col: str = "__cnt",
) -> DataFrame:
    """The census→statistic fold of :func:`kruskal_wallis`, split out
    (the stream_census pattern) so the streaming twin folds the SAME
    arithmetic over a maintained ``(*groups, arm, value, count)``
    census — counts add, so the census is exactly-once maintainable
    and every statistic re-derives census-sized at read."""
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    from pyspark.sql import Window

    census = census.select(
        *group_cols,
        F.col(arm_col).alias("__arm"),
        F.col(value_col).cast("bigint").alias("__v"),
        F.col(count_col).cast("bigint").alias("__cnt"),
    )
    w_ties = Window.partitionBy(*group_cols, "__v")
    w_range = (
        Window.partitionBy(*group_cols)
        .orderBy("__v")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = census.select(
        *group_cols,
        "__arm",
        "__cnt",
        F.sum("__cnt").over(w_ties).alias("__t"),
        F.sum("__cnt").over(w_range).alias("__cum"),
    ).withColumn(
        "__rank2",
        F.lit(2) * F.col("__cum") - F.col("__t") + F.lit(1),
    )
    arm_rows = ranked.groupBy(*group_cols, "__arm").agg(
        F.sum("__cnt").cast("bigint").alias("__nj"),
        F.sum(F.col("__cnt").cast(_D) * F.col("__rank2").cast(_D))
        .cast(_D)
        .alias("__r2"),
        F.sum(
            F.col("__t").cast(_D) * F.col("__t").cast(_D)
            * F.col("__cnt").cast(_D)
            - F.col("__cnt").cast(_D)
        )
        .cast(_D)
        .alias("__tp"),
    )
    # DOUBLE envelope threaded into consumed __nj: operand room (1e37,
    # DECIMAL) AND quotient room (1e31, the _exact_div_sql window)
    r2d = F.col("__r2").cast("double")
    njd = F.col("__nj").cast("double")
    nj_ok = F.when(
        (r2d * r2d <= F.lit(1e37))
        & (r2d * r2d / njd <= F.lit(1e31)),
        F.col("__nj"),
    ).otherwise(
        F.raise_error(
            F.lit(
                "kruskal_wallis: a rank-sum square exceeds the exact "
                "DECIMAL division envelope — sample units (the omnibus "
                "call is saturated at such n)"
            )
        ).cast("bigint")
    )
    arm_q = (
        arm_rows.withColumn("__njq", nj_ok)
        .select(
            *group_cols,
            F.col("__njq").alias("__nj"),
            F.expr(
                _exact_div_sql(
                    "__r2 * __r2", "cast(__njq as decimal(38,0))"
                )
            ).alias("__q"),
            "__tp",
        )
    )
    g = arm_q.groupBy(*group_cols).agg(
        F.sum("__nj").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_arms"),
        F.sum("__q").cast(_D).alias("__s"),
        F.sum("__tp").cast(_D).alias("__t3"),
    )
    dec = "cast({} as decimal(38,0))"
    n_s = dec.format("n")
    num0 = f"(3 * __s - 3 * {n_s} * (n + 1) * (n + 1))"
    h_milli = (
        f"(CASE WHEN n > 1 THEN "
        f"(1000 * greatest(cast(0 as decimal(38,0)), {num0})) "
        f"div ({n_s} * (n + 1)) END)"
    )
    n3 = f"({n_s} * {n_s} * {n_s} - {n_s})"
    # second DOUBLE envelope: h_milli * n^3 must stay inside 1e37
    env2 = (
        F.col("__h_milli").cast("double")
        * F.col("n").cast("double") ** 3
    )
    out = g.withColumn("__h_milli", F.expr(h_milli)).withColumn(
        "__h_ok",
        F.when(
            F.col("__h_milli").isNull() | (env2 <= F.lit(1e37)),
            F.col("__h_milli"),
        ).otherwise(
            F.raise_error(
                F.lit(
                    "kruskal_wallis: the tie-correction operand exceeds "
                    "the 1e37 DECIMAL(38,0) envelope — sample units"
                )
            ).cast("decimal(38,0)")
        ),
    )
    h_adj = (
        f"(CASE WHEN {n3} - __t3 > 0 THEN "
        + _sat_div_sql(
            f"cast(__h_ok as decimal(38,0)) * {n3}", f"({n3} - __t3)"
        )
        + " END)"
    )
    eps_num = f"(cast(__h_adj as decimal(38,0)) - 1000 * (n_arms - 1))"
    eps2 = (
        f"(CASE WHEN n > n_arms AND __h_adj IS NOT NULL THEN "
        f"CASE WHEN {eps_num} >= 0 THEN {eps_num} div ({n_s} - n_arms) "
        f"ELSE -((-{eps_num}) div ({n_s} - n_arms)) END END)"
    )
    return (
        out.withColumn("__h_adj", F.expr(h_adj))
        .select(
            *group_cols,
            "n",
            "n_arms",
            F.col("__t3").cast("bigint").alias("t3"),
            F.col("__h_milli").cast("bigint").alias("h_milli"),
            F.col("__h_adj").cast("bigint").alias("h_adj_milli"),
            F.expr(eps2).cast("bigint").alias("eps2_milli"),
        )
    )


def spearman_corr(
    df: DataFrame,
    *,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Spearman rank correlation per group — Pearson on midranks, the
    monotone-association screen that ignores outliers and nonlinearity
    (the profiling companion to ``corr_pairs``' Pearson: a large
    Spearman/Pearson gap IS the nonlinearity/outlier diagnostic).

    Engine-exact by the same two-step as corr_pairs: all sufficient
    statistics are EXACT integers, the finish is one fixed-order
    IEEE-double expression (correctly rounded ops on identical exact
    inputs → bit-identical in Spark and DuckDB; rounded to 6 decimals
    as belt-and-braces).  Midranks come from each column's VALUE CENSUS
    as DOUBLED ranks (``rank2 = 2·cum − t + 1`` = 2·midrank, the
    rank_sum_test identity — the doubling cancels in the correlation),
    so no per-row window is ever needed: rows equi-join to the two
    census tables and one combinable aggregate collects (n, Σrx, Σry,
    Σrx², Σry², Σrx·ry) in DECIMAL(38,0).

    Listwise complete-case: rows with NULL in either column are
    excluded BEFORE ranking (ranks are computed within the analyzed
    set — the standard contract).  Degenerate groups (either column
    constant) emit NULL.

    Returns ``(*group_cols, n, spearman)``.

    Scale posture (100 TB): two data-sized combinable census groupBys
    (one per column), two census-sized windows on the group key, then
    two equi-joins of the fact rows to the censuses on (group, value)
    — co-keyed shuffles, skew bounded by the tie distribution — and
    ONE combinable moment aggregate.  No data-sized window, no
    collect.  Σrank2² ≲ 4n³ caps groups at n ~ 1e11 inside
    DECIMAL(38,0) — envelope-guarded in DOUBLE (threaded, the
    rank_sum_test pattern).

    Engine extension — the reference (exporter.py:75-141) has no
    statistics tier; estimator per Spearman (1904) as in standard
    texts.
    """
    groups = group_cols or []
    from pyspark.sql import Window

    complete = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        *groups,
        F.col(x_col).cast("bigint").alias("__x"),
        F.col(y_col).cast("bigint").alias("__y"),
    )

    def census_ranked(col: str) -> DataFrame:
        c = complete.groupBy(*groups, col).agg(
            F.count(F.lit(1)).cast("bigint").alias("__t")
        )
        w_all = Window.partitionBy(*groups) if groups else Window.partitionBy()
        w_range = w_all.orderBy(col).rangeBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return c.select(
            *groups,
            col,
            (
                F.lit(2) * F.sum("__t").over(w_range)
                - F.col("__t")
                + F.lit(1)
            ).alias(f"__r{col}"),
        )

    xc = census_ranked("__x")
    yc = census_ranked("__y")
    joined = complete.join(xc, [*groups, "__x"]).join(yc, [*groups, "__y"])
    rx = F.col("__r__x").cast(_D)
    ry = F.col("__r__y").cast(_D)
    g = joined.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(rx).cast(_D).alias("__sx"),
        F.sum(ry).cast(_D).alias("__sy"),
        F.sum(rx * rx).cast(_D).alias("__sxx"),
        F.sum(ry * ry).cast(_D).alias("__syy"),
        F.sum(rx * ry).cast(_D).alias("__sxy"),
    )
    dd = lambda name: F.col(name).cast("double")  # noqa: E731
    n_d = dd("n")
    var_x = n_d * dd("__sxx") - dd("__sx") * dd("__sx")
    var_y = n_d * dd("__syy") - dd("__sy") * dd("__sy")
    # DOUBLE envelope threaded into the consumed n (Σr·r ≲ 4n³)
    n_ok = F.when(
        dd("__sxx") + dd("__syy") <= F.lit(1e37), F.col("n")
    ).otherwise(
        F.raise_error(
            F.lit(
                "spearman_corr: a rank-moment sum exceeds the 1e37 "
                "DECIMAL(38,0) envelope — sample units"
            )
        ).cast("bigint")
    )
    return g.select(
        *groups,
        n_ok.alias("n"),
        F.when(
            (var_x > 0) & (var_y > 0),
            F.round(
                (n_d * dd("__sxy") - dd("__sx") * dd("__sy"))
                / (F.sqrt(var_x) * F.sqrt(var_y)),
                6,
            ),
        ).alias("spearman"),
    )


def cramers_v(
    df: DataFrame,
    *,
    row_col: str,
    col_col: str,
    group_cols: list[str],
) -> DataFrame:
    """Cramér's V effect size per group — the [0, 1] normalization of
    the RxC chi-square that makes association strengths COMPARABLE
    across tables of different size and shape (chi2 grows with n and
    with the grid; V does not):

        V = sqrt( (chi2 / n) / min(r - 1, c - 1) )

    Rides ``contingency_chi2`` unchanged (exact-milli chi2, zero-cell
    rebuild, envelope guards); the finish is ONE fixed-order IEEE
    double expression on the exact integer outputs (divide by
    ``1000·n·min_dim``, sqrt, round 6 — correctly-rounded ops on
    identical exact inputs are bit-identical across engines, the
    corr_pairs stance).  Degenerate groups (df = 0) emit NULL V, as
    does a NULL chi2.

    Returns the contingency_chi2 columns plus ``cramers_v``.

    Scale posture: identical to contingency_chi2 — the finish adds
    zero shuffles.

    Engine extension — the reference (exporter.py:75-141) has no
    statistics tier; statistic per Cramér (1946).
    """
    base = contingency_chi2(
        df, row_col=row_col, col_col=col_col, group_cols=group_cols
    )
    dd = lambda name: F.col(name).cast("double")  # noqa: E731
    mindim = F.least(F.col("n_row_cats"), F.col("n_col_cats")) - F.lit(1)
    return base.select(
        "*",
        F.when(
            F.col("chi2_milli").isNotNull()
            & (mindim > 0)
            & (F.col("n_units") > 0),
            F.round(
                F.sqrt(
                    dd("chi2_milli")
                    / (
                        F.lit(1000.0)
                        * dd("n_units")
                        * mindim.cast("double")
                    )
                ),
                6,
            ),
        ).alias("cramers_v"),
    )


def cmh_test(
    df: DataFrame,
    *,
    arm_col: str,
    outcome_col: str,
    stratum_col: str,
    group_cols: list[str],
) -> DataFrame:
    """Cochran-Mantel-Haenszel stratified 2x2 test + Mantel-Haenszel
    pooled odds ratio per group — "did the treatment move conversion,
    CONTROLLING for the strata?", the conversion-metric sibling of
    ``post_strat_ate`` (that one corrects a mean, this one corrects a
    rate and pools an odds ratio), and the same O/E/V algebra class as
    ``log_rank_test`` (which IS this test run over event times).

    Per stratum k with the 2x2 cells a (treated converter), b (treated
    non), c (control converter), d (control non), n = a+b+c+d, the
    hypergeometric null contributes

        e_ppm = (1e6·(a+b)·(a+c)) div n
        v_ppm = (1e6·(a+b)·(c+d)·(a+c)·(b+d)) div (n·n·(n−1))
        r_ppm = (1e6·a·d) div n        (MH odds-ratio numerator)
        s_ppm = (1e6·b·c) div n        (MH odds-ratio denominator)

    each one truncating DECIMAL(38,0) division replayed verbatim by
    the HUGEINT oracle (< 1 ppm per stratum, stated convention).  The
    group fold (S = 1e6·Σa − Σe_ppm, legitimately signed):

        chi2_milli = least((1000·S·S) div (1e6·Σv_ppm), SAT64)
        or_milli   = (1000·Σr_ppm) div Σs_ppm

    (chi2 divides in DECIMAL and saturates at 4e18 when ΣV is tiny —
    a BIGINT quotient would wrap; the oracle replays the least()).

    Single-arm / single-outcome strata contribute v = 0 and drop out
    of the evidence exactly as the theory says; groups with ΣV = 0
    emit NULL chi2 and Σs = 0 emits NULL odds ratio — never fake
    certainty.  ``arm_col`` and ``outcome_col`` must be 0/1 non-NULL
    (executor fail-fasts, the ab_contingency contract).

    Returns ``(*group_cols, n_strata, n_units, o_t, e_t_ppm, v_ppm,
    chi2_milli, or_milli)``.

    Scale posture (100 TB): ONE data-sized combinable groupBy (the
    (group, stratum, arm) cell census: counts + conversion sums, both
    associative — the census a stream maintains exactly-once), one
    combinable census-sized groupBy to wide strata, per-stratum scalar
    terms, one combinable census-sized group fold.  No window, no
    join.

    Capacity: the binding product ``1e6·n⁴`` per stratum caps strata
    at n ~ 1.3e8 units — DOUBLE envelope fail-fast threaded into the
    consumed a-cell (the rank_sum_test pattern); beyond that, sample.

    Engine extension — the reference (exporter.py:75-141) has no
    statistics tier; test per Cochran (1954) / Mantel & Haenszel
    (1959) as in standard texts.
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    arm = F.col(arm_col)
    out = F.col(outcome_col)
    chk = lambda c, what: F.when(  # noqa: E731
        c.isNotNull() & c.cast("bigint").isin(0, 1), c.cast("bigint")
    ).otherwise(
        F.raise_error(
            F.lit(
                f"cmh_test: {what} must be 0/1 and non-NULL — a unit "
                "outside the experiment's frame has no cell; filter "
                "upstream"
            )
        ).cast("bigint")
    )
    census = df.groupBy(
        *group_cols, F.col(stratum_col).alias("__stratum")
    ).agg(
        F.sum(F.when(chk(arm, "arm") == 1, chk(out, "outcome")).otherwise(0))
        .cast("bigint")
        .alias("__a"),
        F.sum(
            F.when(chk(arm, "arm") == 1, 1 - chk(out, "outcome")).otherwise(0)
        )
        .cast("bigint")
        .alias("__b"),
        F.sum(F.when(chk(arm, "arm") == 0, chk(out, "outcome")).otherwise(0))
        .cast("bigint")
        .alias("__c"),
        F.sum(
            F.when(chk(arm, "arm") == 0, 1 - chk(out, "outcome")).otherwise(0)
        )
        .cast("bigint")
        .alias("__d"),
    )
    return cmh_from_census(census, group_cols=group_cols)


def cmh_from_census(
    census: DataFrame,
    *,
    group_cols: list[str],
    a_col: str = "__a",
    b_col: str = "__b",
    c_col: str = "__c",
    d_col: str = "__d",
) -> DataFrame:
    """The census→statistic fold of :func:`cmh_test`, split out (the
    stream_census pattern) over the per-(group, stratum) 2x2 cell
    census — four associative counts, so a stream maintains them
    exactly-once and the pooled chi2 / odds ratio re-derive
    census-sized at read; a LATE unit revises one cell, which moves
    its stratum's E and V and the POOLED sums."""
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    wide = census.select(
        *group_cols,
        F.col(a_col).cast("bigint").alias("__a"),
        F.col(b_col).cast("bigint").alias("__b"),
        F.col(c_col).cast("bigint").alias("__c"),
        F.col(d_col).cast("bigint").alias("__d"),
    )
    dec = "cast({} as decimal(38,0))"
    a, b, c, d = (dec.format(x) for x in ("__a", "__b", "__c", "__d"))
    n_s = f"({a} + {b} + {c} + {d})"
    dd = lambda name: F.col(name).cast("double")  # noqa: E731
    n_d = dd("__a") + dd("__b") + dd("__c") + dd("__d")
    a_ok = F.when(
        F.lit(1e6) * n_d * n_d * n_d * n_d <= F.lit(1e37), F.col("__a")
    ).otherwise(
        F.raise_error(
            F.lit(
                "cmh_test: a stratum operand exceeds the 1e37 "
                "DECIMAL(38,0) envelope — sample units (the decision "
                "is saturated at such n)"
            )
        ).cast("bigint")
    )
    ao = dec.format("__a_ok")
    terms = wide.withColumn("__a_ok", a_ok).select(
        *group_cols,
        F.col("__a_ok").alias("__oa"),
        (F.col("__a") + F.col("__b") + F.col("__c") + F.col("__d"))
        .cast("bigint")
        .alias("__n"),
        F.expr(
            f"CASE WHEN {n_s} > 0 THEN "
            f"(1000000 * ({ao} + {b}) * ({ao} + {c})) div {n_s} "
            "ELSE 0 END"
        )
        .cast("decimal(38,0)")
        .alias("__e_ppm"),
        F.expr(
            f"CASE WHEN {n_s} > 1 THEN "
            f"(1000000 * ({ao} + {b}) * ({c} + {d}) * ({ao} + {c}) "
            f"* ({b} + {d})) div ({n_s} * {n_s} * ({n_s} - 1)) "
            "ELSE 0 END"
        )
        .cast("decimal(38,0)")
        .alias("__v_ppm"),
        F.expr(
            f"CASE WHEN {n_s} > 0 THEN (1000000 * {ao} * {d}) div {n_s} "
            "ELSE 0 END"
        )
        .cast("decimal(38,0)")
        .alias("__r_ppm"),
        F.expr(
            f"CASE WHEN {n_s} > 0 THEN (1000000 * {b} * {c}) div {n_s} "
            "ELSE 0 END"
        )
        .cast("decimal(38,0)")
        .alias("__s_ppm"),
    )
    g = terms.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        F.sum("__n").cast("bigint").alias("n_units"),
        F.sum("__oa").cast("bigint").alias("o_t"),
        F.sum("__e_ppm").cast("decimal(38,0)").alias("__se"),
        F.sum("__v_ppm").cast("decimal(38,0)").alias("__sv"),
        F.sum("__r_ppm").cast("decimal(38,0)").alias("__sr"),
        F.sum("__s_ppm").cast("decimal(38,0)").alias("__ss"),
    )
    dec2 = "cast({} as decimal(38,0))"
    se, sv = dec2.format("__se"), dec2.format("__sv")
    sr, ss = dec2.format("__sr"), dec2.format("__ss")
    s_expr = f"(1000000 * {dec2.format('o_t')} - {se})"
    return g.select(
        *group_cols,
        "n_strata",
        "n_units",
        "o_t",
        F.col("__se").cast("bigint").alias("e_t_ppm"),
        F.col("__sv").cast("bigint").alias("v_ppm"),
        F.expr(
            f"CASE WHEN {sv} > 0 THEN "
            + _sat_div_sql(
                f"1000 * {s_expr} * {s_expr}", f"(1000000 * {sv})"
            )
            + " END"
        ).alias("chi2_milli"),
        F.expr(
            f"CASE WHEN {ss} > 0 THEN "
            f"CAST((1000 * {sr}) div {ss} AS BIGINT) END"
        ).alias("or_milli"),
    )


def oneway_anova(
    df: DataFrame,
    *,
    arm_col: str,
    value_col: str,
    group_cols: list[str],
) -> DataFrame:
    """One-way ANOVA F per group — the PARAMETRIC k-arm omnibus next
    to :func:`kruskal_wallis`'s rank form ("did any arm's MEAN shift"),
    with the eta-squared effect size (share of variance explained by
    the arm split).

    Entirely exact-integer: the (group, arm) moment census carries
    (n_j, Σv, Σv²) in DECIMAL(38,0); the between/within sums of
    squares clear their rationals through per-arm ppm truncations
    replayed verbatim by the HUGEINT oracle:

        q_j      = (1e6·s_j·s_j) div n_j           (per-arm, < 1 ppm)
        ssb_ppm  = max(0, Σq − (1e6·S·S) div n)    (S = Σs_j)
        ssw_ppm  = 1e6·ΣΣv² − Σq                   (non-negative exactly)
        f_milli  = least((1000·ssb_ppm·(n−k)) div (ssw_ppm·(k−1)), SAT64)
        eta2_ppm = (1e6·ssb_ppm) div (ssb_ppm + ssw_ppm)

    (q_j, the ssb correction and F divide in DECIMAL — `div`'s BIGINT
    result wraps past 2^63, which the sf0.1 external check caught on
    this very operator — and F saturates at 4e18 under near-zero
    within-variance, replayed by the oracle's least()).

    (the max(0,·) absorbs the ≤ k-ppm downward drift of Σq at SSB ≈ 0).
    Degenerate groups never fake significance: one-armed groups
    (k = 1), saturated groups (n = k) and zero-within-variance groups
    (ssw = 0) emit NULL F; an all-constant group emits NULL eta².
    NULL values are excluded (count n_j is of non-NULL measurements);
    NULL arms raise executor-side.

    Returns ``(*group_cols, n, n_arms, f_milli, eta2_ppm)``.

    Scale posture (100 TB): ONE data-sized combinable groupBy (the
    per-(group, arm) moment census — three associative sums, the
    census a stream maintains exactly-once) + one combinable
    census-sized group fold.  No window, no join.

    Capacity: the binding product ``1e6·s_j²`` (s_j = the arm's value
    sum) — DOUBLE envelope fail-fast threaded into the consumed n_j;
    at milli-quantized metrics this admits ~1e12 unit-sized values
    per arm.

    Engine extension — the reference (exporter.py:75-141) has no
    statistics tier; decomposition per Fisher (1925) as in standard
    texts.
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    arm = F.col(arm_col)
    arm_ok = F.when(arm.isNotNull(), F.lit(True)).otherwise(
        F.raise_error(
            F.lit(
                "oneway_anova: arm must be non-NULL — a unit outside "
                "the experiment's frame has no cell; filter upstream"
            )
        )
    )
    census = (
        df.filter(F.col(value_col).isNotNull())
        .filter(arm_ok)
        .groupBy(*group_cols, F.col(arm_col).alias("__arm"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("__nj"),
            F.sum(F.col(value_col).cast("bigint").cast(_D))
            .cast(_D)
            .alias("__sj"),
            F.sum(
                F.col(value_col).cast("bigint").cast(_D)
                * F.col(value_col).cast("bigint").cast(_D)
            )
            .cast(_D)
            .alias("__ssj"),
        )
    )
    return anova_from_census(census, group_cols=group_cols)


def anova_from_census(
    census: DataFrame,
    *,
    group_cols: list[str],
    count_col: str = "__nj",
    sum_col: str = "__sj",
    sumsq_col: str = "__ssj",
) -> DataFrame:
    """The census→statistic fold of :func:`oneway_anova`, split out
    (the stream_census pattern) over the per-(group, arm) moment
    census — count + two DECIMAL sums, all associative, so a stream
    maintains them exactly-once and F/eta² re-derive census-sized at
    read; a LATE unit revises one arm's moments, which moves the
    grand mean and therefore EVERY arm's between-group term."""
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    wide = census.select(
        *group_cols,
        F.col(count_col).cast("bigint").alias("__nj"),
        F.col(sum_col).cast(_D).alias("__sj"),
        F.col(sumsq_col).cast(_D).alias("__ssj"),
    )
    sjd = F.col("__sj").cast("double")
    njd = F.col("__nj").cast("double")
    # envelope BOTH the operand (1e37, DECIMAL room) and the QUOTIENT
    # (1e31, the _exact_div_sql exactness window)
    nj_ok = F.when(
        (F.lit(1e6) * sjd * sjd <= F.lit(1e37))
        & (
            (F.col("__nj") == 0)
            | (F.lit(1e6) * sjd * sjd / njd <= F.lit(1e31))
        ),
        F.col("__nj"),
    ).otherwise(
        F.raise_error(
            F.lit(
                "oneway_anova: an arm-sum square exceeds the exact "
                "DECIMAL division envelope — rescale the metric or "
                "sample"
            )
        ).cast("bigint")
    )
    arm_q = wide.withColumn("__njq", nj_ok).select(
        *group_cols,
        F.col("__njq").alias("__nj"),
        "__sj",
        "__ssj",
        F.expr(
            "CASE WHEN __njq > 0 THEN "
            + _exact_div_sql(
                "1000000 * __sj * __sj",
                "cast(__njq as decimal(38,0))",
            )
            + " ELSE CAST(0 AS DECIMAL(38,0)) END"
        )
        .cast(_D)
        .alias("__q"),
    )
    g = arm_q.groupBy(*group_cols).agg(
        F.sum("__nj").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_arms"),
        F.sum("__sj").cast(_D).alias("__s"),
        F.sum("__ssj").cast(_D).alias("__ss"),
        F.sum("__q").cast(_D).alias("__sq"),
    )
    # group-level envelope: operand room (1e37) AND quotient room
    # (1e31, the _exact_div_sql window), threaded into consumed n
    sd = F.col("__s").cast("double")
    nd = F.col("n").cast("double")
    n_ok = F.when(
        (F.lit(1e6) * sd * sd <= F.lit(1e37))
        & (F.lit(1e6) * sd * sd / nd <= F.lit(1e31)),
        F.col("n"),
    ).otherwise(
        F.raise_error(
            F.lit(
                "oneway_anova: the grand-sum square exceeds the exact "
                "DECIMAL division envelope — rescale the metric or "
                "sample"
            )
        ).cast("bigint")
    )
    g = g.withColumn("n", n_ok)
    n_s = "cast(n as decimal(38,0))"
    ssb = (
        "greatest(cast(0 as decimal(38,0)), __sq - "
        + _exact_div_sql("1000000 * __s * __s", n_s)
        + ")"
    )
    ssw = "(1000000 * __ss - __sq)"
    out = g.withColumn("__ssb", F.expr(ssb).cast(_D)).withColumn(
        "__ssw", F.expr(ssw).cast(_D)
    )
    return out.select(
        *group_cols,
        "n",
        "n_arms",
        F.expr(
            "CASE WHEN n_arms > 1 AND n > n_arms AND __ssw > 0 THEN "
            + _sat_div_sql(
                f"1000 * __ssb * ({n_s} - n_arms)",
                "__ssw * (n_arms - 1)",
            )
            + " END"
        ).alias("f_milli"),
        F.expr(
            "CASE WHEN __ssb + __ssw > 0 THEN "
            "CAST((1000000 * __ssb) div (__ssb + __ssw) AS BIGINT) END"
        ).alias("eta2_ppm"),
    )
