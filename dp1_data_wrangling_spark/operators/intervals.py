"""Timespan / validity-interval operators (SURVEY.md §2.4 J7, §2.9 C2).

Reference semantics: calibration collections associate a dataset with a
half-open validity interval ``[begin_nsec, end_nsec)`` per data ID
(importer.py:110-112 ``certify``); overlapping intervals for the same
(collection, data ID) are an error; lookups are as-of/interval joins.
Timespans stay int64 nanoseconds end-to-end — Spark TimestampType is µs
precision, so timestamps are never used for comparisons (SURVEY.md §7.4.1).
NULL begin/end mean unbounded.

Scale posture: the overlap *check* sorts per (collection, data ID) — a
window by key, one shuffle, and compares each interval only with its
neighbor (sorted intervals overlap iff an adjacent pair overlaps), so it is
O(n log n) not the O(n²) self-join.  The as-of *lookup* is a range join;
at dimension scale Catalyst's conditional join is fine, at fact scale use
``bucketize`` below to turn it into an equi-join on coarse time buckets.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_NEG_INF = -(2**62)
_POS_INF = 2**62


def _coalesce_bounds(df: DataFrame, begin: str, end: str) -> DataFrame:
    return df.withColumn(
        "__iv_begin", F.coalesce(F.col(begin), F.lit(_NEG_INF))
    ).withColumn("__iv_end", F.coalesce(F.col(end), F.lit(_POS_INF)))


def overlapping_pairs(
    intervals: DataFrame,
    keys: Sequence[str],
    *,
    begin: str = "begin_nsec",
    end: str = "end_nsec",
    tie_breaker: Column | None = None,
    prev_bounds: bool = True,
) -> DataFrame:
    """Rows whose validity interval overlaps the *previous* interval of the
    same key (sort-based neighbor check — one shuffle, no self-join).

    Returns the offending rows with ``prev_begin_nsec``/``prev_end_nsec``
    columns; empty result = certify would succeed.  ``tie_breaker`` makes
    the sort total when identical intervals exist for one key.

    ``prev_bounds=False`` drops the ``prev_*`` output columns and runs the
    running max over the bare END instead of the (end, begin) struct —
    the offender SET is identical (the struct max is lexicographic, so
    its ``.e`` equals ``max(end)``), but each window step compares one
    long instead of allocating and comparing a struct (~1.2x on the
    window stage at sf0.1 — r13).  Callers that only count/locate
    offenders (certify probes) should pass False.
    """
    order = [F.col("__iv_begin"), F.col("__iv_end")]
    if tie_breaker is not None:
        order.append(tie_breaker)
    w = Window.partitionBy(*keys).orderBy(*order)
    # Running MAX over ALL previous ends, not lag-1: sorted by begin, row i
    # overlaps SOME earlier interval iff begin_i < max(end_0..end_{i-1}) —
    # the lag-1 form misses rows covered by a long early interval (e.g.
    # [0,100),[1,2),[50,60): row [50,60) overlaps [0,100) but not [1,2)).
    # The (end, begin) struct max keeps prev_begin/prev_end a CONSISTENT
    # pair (the actual farthest-reaching predecessor), tie-broken on begin.
    prev = w.rowsBetween(Window.unboundedPreceding, -1)
    bounded = _coalesce_bounds(intervals, begin, end)
    if not prev_bounds:
        return (
            bounded.withColumn(
                "__iv_prev_e", F.max(F.col("__iv_end")).over(prev)
            )
            .filter(
                F.col("__iv_prev_e").isNotNull()
                & (F.col("__iv_begin") < F.col("__iv_prev_e"))
            )
            .drop("__iv_begin", "__iv_end", "__iv_prev_e")
        )
    with_prev = bounded.withColumn(
        "__iv_prev",
        F.max(
            F.struct(F.col("__iv_end").alias("e"), F.col("__iv_begin").alias("b"))
        ).over(prev),
    )
    return (
        with_prev.filter(
            F.col("__iv_prev").isNotNull()
            & (F.col("__iv_begin") < F.col("__iv_prev.e"))
        )
        .withColumn("prev_begin_nsec", F.col("__iv_prev.b"))
        .withColumn("prev_end_nsec", F.col("__iv_prev.e"))
        .drop("__iv_begin", "__iv_end", "__iv_prev")
    )


def check_no_overlaps(
    intervals: DataFrame,
    keys: Sequence[str],
    *,
    begin: str = "begin_nsec",
    end: str = "end_nsec",
) -> None:
    """Certify-style validation: raise if any same-key intervals overlap."""
    bad = overlapping_pairs(intervals, keys, begin=begin, end=end)
    offenders = bad.limit(1).collect()
    if offenders:
        raise ValueError(
            "certify: overlapping validity intervals for keys "
            f"{list(keys)} (first offender: {offenders[0]})"
        )


def asof_lookup(
    probes: DataFrame,
    intervals: DataFrame,
    on: Sequence[str] | None,
    *,
    probe_time: str,
    begin: str = "begin_nsec",
    end: str = "end_nsec",
    how: str = "inner",
) -> DataFrame:
    """Interval join: match each probe row to interval rows containing its
    timestamp (half-open [begin, end); NULL bound = unbounded).

    ``on`` equi-keys (may be empty) keep the join from being a pure cross
    product; Catalyst executes equi-keys as the hash key and the range
    predicate as a post-filter.
    """
    iv = _coalesce_bounds(intervals, begin, end)
    # qualify through the probes Dataset — an unqualified F.col(probe_time)
    # is ambiguous when the interval side has a same-named column
    cond = (probes[probe_time] >= F.col("__iv_begin")) & (
        probes[probe_time] < F.col("__iv_end")
    )
    for k in on or []:
        cond = cond & (probes[k] == iv[k])
    out = probes.join(iv, cond, how)
    return out.drop("__iv_begin", "__iv_end")


MAX_BUCKETS_PER_INTERVAL = 100_000


def bucketize_intervals(
    intervals: DataFrame,
    bucket_ns: int,
    *,
    begin: str = "begin_nsec",
    end: str = "end_nsec",
    max_buckets_per_interval: int = MAX_BUCKETS_PER_INTERVAL,
) -> DataFrame:
    """Explode each interval into the coarse time buckets it touches, so an
    interval join becomes an equi-join on ``bucket`` + residual predicate.
    Use when both sides are fact-scale (SURVEY.md §4 last row).

    Bucket arithmetic is integer ``div`` — double division silently loses
    integer precision above 2^53, and epoch-ns values are ~1e18.
    Unbounded intervals (NULL bound) are NOT bucketizable (they would touch
    every bucket) and are dropped here — route them through the plain
    conditional join instead.

    ``max_buckets_per_interval`` guards the explode width: one malformed
    (e.g. million-year) interval would fan out into hundreds of millions
    of rows — and ``sequence()`` itself hard-caps at 2^31 elements — so an
    interval touching more buckets than the cap raises executor-side with
    the offending width (``assert_true`` inside the row expression: no
    extra validation job, no silent blowup).  Legitimate multi-year
    calibration intervals at day buckets are thousands of buckets, far
    under the default."""
    lo = F.expr(f"`{begin}` div {bucket_ns}")
    hi = F.expr(f"(`{end}` - 1) div {bucket_ns}")
    width = hi - lo + F.lit(1)
    guard = F.assert_true(
        width <= F.lit(max_buckets_per_interval),
        F.concat(
            F.lit("bucketize_intervals: interval touches "),
            width.cast("string"),
            F.lit(
                f" buckets of {bucket_ns} ns, over the "
                f"{max_buckets_per_interval}-bucket cap — malformed interval "
                f"or bucket_ns too fine"
            ),
        ),
    )
    return intervals.withColumn(
        "bucket",
        # assert_true yields NULL on success, so the when() is just the
        # vehicle that forces its evaluation before the explode
        F.explode(F.when(guard.isNull(), F.sequence(lo, hi))),
    )


def bucketized_lookup(
    probes: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    *,
    probe_time: str,
    begin: str = "begin_nsec",
    end: str = "end_nsec",
    bucket_ns: int = 86_400_000_000_000,
) -> DataFrame:
    """The fact-scale form of ``asof_lookup``: intervals exploded into the
    buckets they touch, probes assigned their single bucket, equi-join on
    (bucket, keys...) with the containment predicate as residual.

    Exactly equivalent to ``asof_lookup`` for bounded intervals (a probe
    lives in one bucket, so each matching pair joins exactly once — no
    dedup needed), but the join is a hash join on narrow keys instead of
    an equi-key join with a fat post-filter fan-out."""
    iv = bucketize_intervals(intervals, bucket_ns, begin=begin, end=end)
    pr = probes.withColumn("bucket", F.expr(f"`{probe_time}` div {bucket_ns}"))
    cond = (pr["bucket"] == iv["bucket"]) & (
        (pr[probe_time] >= iv[begin]) & (pr[probe_time] < iv[end])
    )
    for k in on:
        cond = cond & (pr[k] == iv[k])
    return pr.join(iv, cond, "inner").drop(iv["bucket"]).drop(pr["bucket"])


def routed_lookup(
    probes: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    *,
    probe_time: str,
    begin: str = "begin_nsec",
    end: str = "end_nsec",
    bucket_ns: int = 86_400_000_000_000,
) -> DataFrame:
    """The executable NULL-routing rule: bounded intervals take the
    bucketized equi-join, unbounded ones (NULL begin or end — they touch
    every bucket, so bucketizing them is undefined) take the conditional
    join; the union equals ``asof_lookup`` on ANY input
    (hypothesis-tested in test_properties).

    Scale shape: open-ended intervals are catalog-rare (live calibrations
    pending supersession), so the conditional-join side is a sliver while
    the fact-scale bulk rides the narrow hash join."""
    bounded = intervals.filter(F.col(begin).isNotNull() & F.col(end).isNotNull())
    unbounded = intervals.filter(F.col(begin).isNull() | F.col(end).isNull())
    hits_bounded = bucketized_lookup(
        probes,
        bounded,
        on,
        probe_time=probe_time,
        begin=begin,
        end=end,
        bucket_ns=bucket_ns,
    )
    hits_unbounded = asof_lookup(
        probes, unbounded, on, probe_time=probe_time, begin=begin, end=end
    )
    # Positional union: both branches emit probes-columns ++ interval-columns
    # (the equi-keys appear on BOTH sides, so a by-name union would reject
    # the duplicate names).
    if hits_bounded.columns != hits_unbounded.columns:
        raise AssertionError(
            f"routed_lookup branch schemas diverged: "
            f"{hits_bounded.columns} vs {hits_unbounded.columns}"
        )
    return hits_bounded.union(hits_unbounded)
