"""Distributed exact total-order ranking — rank / running sum / ntile
with NO single-partition window anywhere in the plan.

A naive ``ROW_NUMBER() / NTILE() OVER (ORDER BY metric)`` funnels the
whole input through ONE task (Spark plans an unpartitioned window as a
SinglePartition exchange + one sort).  This module computes the SAME
numbers — bit-identical to the SQL window, so existing DuckDB oracles
replay unchanged — by rank decomposition over range-bucket censuses,
the same two-pass machinery :func:`~..sampling.global_shuffle` proves
for hash order, extended to VALUE order with a tie level:

    rank(row) = rows_in_lower_value_buckets            (driver offsets)
              + rows_with_smaller_metric_in_my_bucket  (census cumsum)
              + rows_with_my_metric_in_lower_tie_buckets
              + row_number within (metric, tie_bucket) by tie

Each term comes from a map-side-combinable census aggregate; the only
windows run per value-bucket / per metric value / per (metric,
tie_bucket) partition — all parallel, all bounded: a value bucket holds
``distinct_values / n_value_buckets`` census rows, and a (metric,
tie_bucket) partition holds ``ties_on_that_value / n_tie_buckets``
rows, so even the adversarial "one metric value carries half the
corpus" input stays distributed.  The per-bucket counts (at most
``n_value_buckets`` rows) are collected driver-side and folded into
literal offsets — catalog-scale metadata, the documented
:func:`global_shuffle` posture, never fact rows.

The running sum decomposes identically (census sums instead of counts),
which is what the ABC/Pareto cumulative share needs; ``ntile`` is a
pure formula on the exact rank (first ``n mod k`` tiles get one extra
row — the SQL standard's sizing), so it inherits the machinery for
free.

Engine extension — the reference (a per-row export/import tool,
export_dp1.py / import_dp1.py) has no ranking tier; this exists so the
registry's tiering queries (RFM, ABC) hold their semantics at 100 TB.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_LONG_MIN = -(1 << 63)

# Bucket-count cap: offsets ride a Catalyst literal map (2 entries per
# bucket) and one census row per bucket lands on the driver — 4096 is
# catalog-scale on both counts, and a bucket then holds input/4096 rows
# (ample parallelism at any real scale; raise the TIE buckets instead
# if one metric value dominates).
_MAX_BUCKETS = 4096


@dataclass(frozen=True)
class RankedFrame:
    """Result of :func:`distributed_rank`: the ranked DataFrame plus the
    driver-side totals the census pass already paid for (row count and
    metric sum — what a cumulative-share consumer needs as literals).
    ``sum_total`` is only computed under ``cumsum_col`` (whose
    non-negativity guard certifies the int64 census partials); it is 0
    in rank-only mode."""

    df: DataFrame
    n_total: int
    sum_total: int


def _offset_map(offsets: dict[int, int]) -> Column:
    """Bucket -> literal offset as a Catalyst map (bounded by
    _MAX_BUCKETS entries — the :func:`global_shuffle` small-space
    form)."""
    return F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])


def distributed_rank(
    df: DataFrame,
    *,
    metric_col: str,
    tie_cols: list[str],
    descending: bool = False,
    n_value_buckets: int = 1024,
    n_tie_buckets: int = 64,
    rank_col: str = "rank",
    cumsum_col: str | None = None,
    cumsum_source_col: str | None = None,
) -> RankedFrame:
    """Exact 1-based rank (and optional inclusive running sum) over the
    total order ``(metric asc|desc, *tie_cols asc)``, with no
    single-partition exchange in the plan.

    Bit-identical to ``ROW_NUMBER() OVER (ORDER BY ...)`` /
    ``SUM(src) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)`` — an
    oracle replays the plain SQL windows.  The running sum sums
    ``cumsum_source_col`` (default: the metric itself) — the separate
    source is what an ungrouped weighted-quantile needs (running WEIGHT
    in value order).

    Contracts (the caller's side of the exactness bargain):

    - ``metric_col`` must be an exact integer (bigint-castable) OR a
      float/double — value bucketing needs numeric bounds; both integer
      range-div and IEEE ``floor((x - lo) / w)`` are monotone in x, so
      either bucketing respects the order.  Float metrics additionally
      refuse NaN and non-finite bounds executor/driver-side (a NaN has
      no place in a total order; DuckDB and Spark agree on the total
      order of finite doubles, so oracles still replay verbatim).
      ``tie_cols[0]`` range-buckets when integral and degrades to one
      tie bucket otherwise.  Later tie columns only need to be
      orderable.
    - ``(metric, *tie_cols)`` must be UNIQUE per row (the standing
      deterministic-total-order contract every ranking operator here
      shares); duplicates would make ``row_number`` order-dependent.
    - NULL metric / first-tie values raise executor-side (fail-fast,
      threaded into the consumed ordering key — a NULL has no place in
      a total order).
    - ``cumsum_source_col`` (and the default metric source) must be an
      exact integer column, non-negative and non-NULL — the census
      partials are int64 sums and prefix monotonicity is what bounds
      them by the certified total.

    Eager like :func:`global_shuffle`: the bucket census (at most
    ``n_value_buckets`` rows) is collected at call time and folded into
    literal offsets, so the RETURNED frame's plan carries no
    driver-dependent subquery and no global sort.

    Scale posture (100 TB): three input-sized passes — a 2-column
    min/max/count aggregate, the (metric, tie_bucket) census groupBy
    (map-side combined), and the final per-(metric, tie_bucket) window
    whose exchange the equi-join with the offset table reuses (same
    key).  Everything else is census-sized.  Skew is bounded by
    construction: no partition anywhere holds more than
    ``max(distinct_values / n_value_buckets census rows,
    max_ties_on_one_value / n_tie_buckets data rows)``.
    """
    if not tie_cols:
        raise ValueError("tie_cols must be non-empty (rank needs a total order)")
    if not 1 <= n_value_buckets <= _MAX_BUCKETS:
        raise ValueError(
            f"n_value_buckets must be in [1, {_MAX_BUCKETS}], got {n_value_buckets}"
        )
    if not 1 <= n_tie_buckets <= _MAX_BUCKETS:
        raise ValueError(
            f"n_tie_buckets must be in [1, {_MAX_BUCKETS}], got {n_tie_buckets}"
        )
    reserved = ["__mo", "__mraw", "__vb", "__tb", "__off_c", "__off_s"]
    for c in ([rank_col] + ([cumsum_col] if cumsum_col else []) + reserved):
        if c in df.columns:
            raise ValueError(f"output column {c!r} already exists in the input")

    from pyspark.sql.types import (
        ByteType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        ShortType,
    )

    _integral = (ByteType, ShortType, IntegerType, LongType)
    mtype = df.schema[metric_col].dataType
    metric_float = isinstance(mtype, (FloatType, DoubleType))
    if not metric_float and not isinstance(mtype, _integral):
        # a truncating cast would MERGE distinct fractional metrics into
        # one ordering key and silently re-order them by tie — refuse
        # anything that is neither exact-integer nor IEEE float (both
        # bucket monotonically; a decimal caller quantizes upstream)
        raise ValueError(
            f"distributed_rank: metric column {metric_col!r} must be an "
            "exact integer or float/double type (quantize or cast "
            "upstream)"
        )
    src_col = cumsum_source_col if cumsum_source_col else metric_col
    if cumsum_col and not isinstance(df.schema[src_col].dataType, _integral):
        raise ValueError(
            f"distributed_rank: running-sum source {src_col!r} must be "
            "an exact integer type — int64 census partials cannot carry "
            "floats (quantize upstream, the standing integer-units "
            "posture)"
        )
    tie0 = tie_cols[0]
    # Tie bucketing needs numeric bounds.  Integral first-tie columns
    # range-bucket (the scale path); anything else degrades to ONE tie
    # bucket — correct (the within-partition sort still orders by the
    # true tie), but a single metric value's ties then share a
    # partition, so map string keys to dense ids upstream when one
    # value can dominate.
    tie_numeric = isinstance(df.schema[tie0].dataType, _integral)
    metric = F.col(metric_col).cast("double" if metric_float else "bigint")
    src = F.col(src_col).cast("bigint")
    tie0_i = F.col(tie0).cast("bigint") if tie_numeric else F.lit(0)

    # Ordering key: negate for descending (exact for every bigint but
    # LONG_MIN, which the guard below rejects; exact for every double —
    # -0.0 and 0.0 normalize to one grouping/ordering key in both
    # engines).  The guard also rejects NULL metric / first-tie values
    # and (float path) NaN; it is threaded into __mo, which the census
    # AND the final window consume, so it cannot be pruned.
    bad = metric.isNull() | F.col(tie0).isNull()
    if metric_float:
        bad = bad | F.isnan(metric)
    elif descending:
        bad = bad | (metric == F.lit(_LONG_MIN))
    if cumsum_col:
        # running sums decompose through census partials, which must
        # stay monotone to bound every prefix by the total — negative
        # values would also make "cumulative share" ill-defined
        bad = bad | src.isNull() | (src < 0)
    mo_raw = (-metric) if descending else metric
    mo = F.when(
        ~bad, mo_raw
    ).otherwise(
        F.raise_error(
            F.lit(
                "distributed_rank: NULL/NaN metric, NULL tie, LONG_MIN "
                "metric under descending, or NULL/negative running-sum "
                "source — a total order / running share admits none of "
                "these; filter or shift upstream"
            )
        ).cast("double" if metric_float else "bigint")
    )

    keyed = df.withColumn("__mo", mo)
    if cumsum_col:
        keyed = keyed.withColumn("__mraw", src)

    # Pass 1 — bounds (2-column scan, one combinable aggregate row).
    # The |metric| double sum only exists to certify the cumsum mode's
    # int64 census partials — rank-only callers never pay for it.
    st_aggs = [
        F.min("__mo").alias("lo_m"),
        F.max("__mo").alias("hi_m"),
        F.min(tie0_i).alias("lo_t"),
        F.max(tie0_i).alias("hi_t"),
    ]
    if cumsum_col:
        st_aggs.append(F.sum(F.abs(src).cast("double")).alias("sd"))
    st = keyed.agg(*st_aggs).collect()[0]
    if st["lo_m"] is None:  # empty input: keep schema, add typed columns
        out = keyed.drop("__mo", "__mraw").withColumn(
            rank_col, F.lit(None).cast("bigint")
        )
        if cumsum_col:
            out = out.withColumn(cumsum_col, F.lit(None).cast("bigint"))
        return RankedFrame(out, 0, 0)
    lo_t, hi_t = int(st["lo_t"]), int(st["hi_t"])
    if hi_t - lo_t >= (1 << 63):
        raise ValueError(
            "distributed_rank: tie span exceeds int64 — rescale the tie "
            "column (rank is invariant under monotone rescaling)"
        )
    wt = (hi_t - lo_t) // n_tie_buckets + 1
    if metric_float:
        # float path: bounds and width in IEEE doubles.  floor((x - lo)
        # / w) is monotone non-decreasing in x (correctly-rounded
        # subtract/divide/floor each preserve weak order), which is all
        # bucketing needs — exactness lives in the census grouping on
        # the raw value, never in the bucket id.
        import math

        lo_f, hi_f = float(st["lo_m"]), float(st["hi_m"])
        wf = (hi_f - lo_f) / n_value_buckets
        if not (math.isfinite(lo_f) and math.isfinite(hi_f) and math.isfinite(wf)):
            # +-inf values, or a span that overflows to inf: refuse —
            # rank is invariant under monotone rescaling, so the caller
            # compresses the column (e.g. log) upstream
            raise ValueError(
                "distributed_rank: non-finite metric bounds or span — "
                "filter infinities / rescale the column (rank is "
                "invariant under monotone rescaling)"
            )
        if wf <= 0.0:  # all values equal (or subnormal underflow)
            wf = 1.0
    else:
        # widths in PYTHON ints: hi - lo cannot wrap here, unlike int64
        lo_m, hi_m = int(st["lo_m"]), int(st["hi_m"])
        if hi_m - lo_m >= (1 << 63):
            # the executor-side (x - lo) subtraction below would WRAP
            # int64 and break bucket monotonicity — refuse up front
            raise ValueError(
                "distributed_rank: metric span exceeds int64 — rescale "
                "the column (rank is invariant under monotone rescaling)"
            )
        wm = (hi_m - lo_m) // n_value_buckets + 1
    if cumsum_col and float(st["sd"] or 0.0) > float(1 << 62):
        # census partials are int64 sums; past 2^62 total magnitude the
        # double envelope can no longer certify they did not wrap
        raise ValueError(
            "distributed_rank: |metric| total exceeds the 2^62 running-"
            "sum envelope — pre-scale the value units (shares are "
            "scale-invariant)"
        )

    if metric_float:
        # the clamp bounds the float path's rounding slack at the top
        # edge (x = hi can land on bucket n); the int path needs none —
        # its div is exact
        vb = F.least(
            F.lit(n_value_buckets - 1).cast("bigint"),
            F.greatest(
                F.lit(0).cast("bigint"),
                F.floor((F.col("__mo") - F.lit(lo_f)) / F.lit(wf)).cast(
                    "bigint"
                ),
            ),
        )
    else:
        # exact integer div (round-9 posture: `/` is double division and
        # drifts past 2^53; div never does)
        vb = F.expr(f"(__mo - {lo_m}) div {wm}")
    tb = (
        F.expr(f"(cast(`{tie0}` as bigint) - {lo_t}) div {wt}")
        if tie_numeric
        else F.lit(0)
    )

    bucketed = keyed.withColumn("__vb", vb).withColumn("__tb", tb)

    # Pass 2 — the (metric, tie_bucket) census: one map-side-combined
    # groupBy; every downstream census derives from it, so checkpoint
    # it LAZILY once (the dedup.py two-pass-valve pattern) instead of
    # re-running the input aggregation per consumer.
    # The metric sums ride the census ONLY in cumsum mode: the mode's
    # non-negativity guard is what certifies the BIGINT partials (in
    # rank-only mode signed values could wrap them silently, poisoning
    # sum_total while the ranks stay fine — so rank-only mode simply
    # never computes sums).
    cagg = [F.count(F.lit(1)).alias("__c")]
    if cumsum_col:
        cagg.append(F.sum("__mraw").alias("__s"))
    c1agg = [F.sum("__c").alias("__c")]
    if cumsum_col:
        c1agg.append(F.sum("__s").alias("__s"))
    census2 = (
        bucketed.groupBy("__vb", "__mo", "__tb")
        .agg(*cagg)
        .localCheckpoint(eager=False)
    )
    census1 = census2.groupBy("__vb", "__mo").agg(*c1agg)

    # Value-bucket totals -> driver (<= n_value_buckets rows), prefix
    # offsets as literals.  Python-int arithmetic: no wrap.
    vrows = sorted(
        (int(r["__vb"]), int(r["__c"]), int(r["__s"] or 0) if cumsum_col else 0)
        for r in census1.groupBy("__vb").agg(*c1agg).collect()
    )
    off_c: dict[int, int] = {}
    off_s: dict[int, int] = {}
    acc_c = acc_s = 0
    for b, c, s in vrows:
        off_c[b] = acc_c
        off_s[b] = acc_s
        acc_c += c
        acc_s += s
    n_total, sum_total = acc_c, acc_s

    # Census cumsums: per value bucket over metric values (partition =
    # the bucket's census rows), then per metric value over tie buckets
    # (partition <= n_tie_buckets rows).  EXCLUSIVE prefix = inclusive
    # cumsum minus own.
    w_v = Window.partitionBy("__vb").orderBy("__mo")
    c1_cols = [
        "__mo",
        (
            F.coalesce(_offset_map(off_c)[F.col("__vb")], F.lit(0))
            + F.sum("__c").over(w_v)
            - F.col("__c")
        ).alias("__below_c"),
    ]
    if cumsum_col:
        c1_cols.append(
            (
                F.coalesce(_offset_map(off_s)[F.col("__vb")], F.lit(0))
                + F.sum("__s").over(w_v)
                - F.col("__s")
            ).alias("__below_s")
        )
    c1 = census1.select(*c1_cols)
    w_t = Window.partitionBy("__mo").orderBy("__tb")
    lk_cols = [
        "__mo",
        "__tb",
        (F.col("__below_c") + F.sum("__c").over(w_t) - F.col("__c")).alias(
            "__off_c"
        ),
    ]
    if cumsum_col:
        lk_cols.append(
            (F.col("__below_s") + F.sum("__s").over(w_t) - F.col("__s")).alias(
                "__off_s"
            )
        )
    lookup = census2.join(c1, "__mo").select(*lk_cols)

    # Pass 3 — per-(metric, tie_bucket) window + equi-join on the SAME
    # key (the join reuses the window's exchange under AQE).
    w_fin = Window.partitionBy("__mo", "__tb").orderBy(
        *[F.col(t) for t in tie_cols]
    )
    ranked = (
        bucketed.join(lookup, ["__mo", "__tb"])
        .withColumn(
            rank_col,
            (F.col("__off_c") + F.row_number().over(w_fin)).cast("bigint"),
        )
    )
    if cumsum_col:
        ranked = ranked.withColumn(
            cumsum_col,
            F.col("__off_s")
            + F.sum("__mraw").over(
                w_fin.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    drop = ["__mo", "__mraw", "__vb", "__tb", "__off_c", "__off_s"]
    return RankedFrame(
        ranked.drop(*drop), n_total, sum_total if cumsum_col else 0
    )


def _ntile_of_rank(rank_name: str, n: int, k: int) -> Column:
    """SQL-standard NTILE(k) of an exact 1-based rank over n rows: the
    first ``n mod k`` tiles hold ``n div k + 1`` rows, the rest ``n div
    k`` — a pure integer formula once the rank is exact (`div`
    throughout, the round-9 posture).  The ``max(q, 1)`` denominator is
    dead when q == 0 (every rank <= cut == n then)."""
    q, rem = n // k, n % k
    cut = rem * (q + 1)
    return F.expr(
        f"cast((case when {rank_name} <= {cut} "
        f"then ({rank_name} - 1) div {q + 1} "
        f"else {rem} + ({rank_name} - {cut} - 1) div {max(q, 1)} end) "
        f"+ 1 as int)"
    )


def distributed_ntile(
    df: DataFrame,
    *,
    metric_col: str,
    tie_cols: list[str],
    n_tiles: int,
    descending: bool = False,
    out_col: str = "tier",
    n_value_buckets: int = 1024,
    n_tie_buckets: int = 64,
) -> DataFrame:
    """Exact ``NTILE(n_tiles) OVER (ORDER BY metric asc|desc,
    *tie_cols)`` with no single-partition exchange — the formula on
    :func:`distributed_rank`'s exact rank.  Bit-identical to the SQL
    window; oracles replay ``ntile()`` verbatim.  Same contracts as
    :func:`distributed_rank`."""
    if n_tiles < 1:
        raise ValueError(f"n_tiles must be >= 1, got {n_tiles}")
    rk = distributed_rank(
        df,
        metric_col=metric_col,
        tie_cols=tie_cols,
        descending=descending,
        n_value_buckets=n_value_buckets,
        n_tie_buckets=n_tie_buckets,
        rank_col="__ntile_rank",
    )
    if rk.n_total == 0:
        return rk.df.drop("__ntile_rank").withColumn(
            out_col, F.lit(None).cast("int")
        )
    return rk.df.withColumn(
        out_col, _ntile_of_rank("__ntile_rank", rk.n_total, n_tiles)
    ).drop("__ntile_rank")


def rank_tile_summary(
    census: DataFrame,
    *,
    metric_col: str,
    count_col: str,
    n_tiles: int,
) -> DataFrame:
    """Exact NTILE boundary summary from a VALUE CENSUS — one row per
    NON-EMPTY tier: ``(tier, rank_lo, rank_hi, n_rows, value_lo,
    value_hi)`` where ``value_lo``/``value_hi`` are the metric values
    at the tier's first/last rank in the total ``(metric, tie)`` order
    and ``rank_lo``/``rank_hi``/``n_rows`` are the SQL-standard NTILE
    sizing (first ``n mod k`` tiles get the extra row).

    Tie-invariant by construction: whatever tie column a per-row NTILE
    would split boundary ties by, the value at any given rank is fixed
    (metric is non-decreasing in rank), so the summary needs only the
    census — which is why it is the shape a STREAM can maintain
    exactly (census counts are associative; see
    ``streaming/ranking.py``).  Bit-identical to ``NTILE(k) OVER
    (ORDER BY metric, any_tie)`` grouped per tile with min/max/count —
    the oracle replays the plain window.

    ``census`` must hold ONE row per metric value (aggregate upstream)
    with a positive exact-integer count; zero-count rows are ignored,
    negative counts fail fast (they would break prefix monotonicity).
    The metric must be exact-integer or float/double (the
    :func:`distributed_rank` bucketing contract).

    Scale posture (100 TB): the census cumulative ranking is
    :func:`distributed_rank` (no single-partition exchange); each
    census row then explodes into the <= k tiles its rank interval
    intersects (total <= census_rows + k rows) and the final groupBy
    is k-sized.  Eager (the census collect happens at call time).
    """
    if n_tiles < 1:
        raise ValueError(f"n_tiles must be >= 1, got {n_tiles}")
    d = census.select(
        F.col(metric_col).alias("__val"),
        F.col(count_col).cast("bigint").alias("__n"),
    ).filter(F.col("__n") > 0)
    rk = distributed_rank(
        d,
        metric_col="__val",
        tie_cols=["__val"],
        rank_col="__vr",
        cumsum_col="__cum",
        cumsum_source_col="__n",
    )
    n_total = rk.sum_total
    if n_total == 0:
        return (
            d.select(
                F.lit(None).cast("int").alias("tier"),
                F.lit(None).cast("bigint").alias("rank_lo"),
                F.lit(None).cast("bigint").alias("rank_hi"),
                F.lit(None).cast("bigint").alias("n_rows"),
                F.col("__val").alias("value_lo"),
                F.col("__val").alias("value_hi"),
            ).limit(0)
        )
    q, rem = divmod(n_total, n_tiles)
    # which tiles does this value's rank interval [cum-n+1, cum] touch?
    t_lo = _ntile_of_rank("(__cum - __n + 1)", n_total, n_tiles)
    t_hi = _ntile_of_rank("__cum", n_total, n_tiles)
    # tile t's rank bounds, closed-form from (n_total, k) literals
    rlo = F.expr(f"cast((tier - 1) * {q} + least(tier - 1, {rem}) + 1 as bigint)")
    rhi = F.expr(f"cast(tier * {q} + least(tier, {rem}) as bigint)")
    exploded = rk.df.select(
        "__val",
        "__n",
        "__cum",
        F.explode(F.sequence(t_lo, t_hi)).alias("tier"),
    ).select(
        "__val",
        "tier",
        rlo.alias("rank_lo"),
        rhi.alias("rank_hi"),
        (
            F.least(F.col("__cum"), rhi)
            - F.greatest(F.col("__cum") - F.col("__n") + 1, rlo)
            + 1
        ).cast("bigint").alias("__o"),
    )
    return exploded.groupBy("tier", "rank_lo", "rank_hi").agg(
        F.sum("__o").cast("bigint").alias("n_rows"),
        F.min("__val").alias("value_lo"),
        F.max("__val").alias("value_hi"),
    )
