"""Event-sequence analytics: k-step funnels and cohort retention.

The event-analytics tier every warehouse ships (Amplitude/Mixpanel-class
funnel + retention reports) expressed as plain DataFrame algebra — no
MATCH_RECOGNIZE dependency, exact integer timestamps throughout so a SQL
oracle replays results bit-for-bit.

Engine extension — the reference (exporter.py:75-141) has no event tier.

``funnel_match``: first-touch-anchored conversion — the chain starts at
each user's EARLIEST step-1 event and each subsequent step matches the
earliest qualifying event within ``within_us`` of the previous step.
First-touch anchoring is the standard product-analytics semantic and is
deterministic (min-folds only); it deliberately does NOT search later
anchors when the earliest one stalls — document readers see the same
number Amplitude's default would give.

``cohort_retention``: users bucketed by the week of their first event;
one row per (cohort_week, week_offset) with distinct active users.

Scale posture (100 TB): every step of the funnel is a per-user min-fold
(map-side combinable) plus an equi-join on user id — k steps = k narrow
joins hash-partitioned on the SAME key, so a bucketed/pre-partitioned
event table pays one shuffle total; no window over the full event stream
is ever materialized.  Retention is two combinable groupBys (user, then
cohort cell).  Skew = per-user event volume, bounded by the conditional
filters before any join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_match(
    events: DataFrame,
    *,
    steps: list[str],
    within_us: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
) -> DataFrame:
    """Earliest-chain funnel completion per user.

    Returns one row per user who completed step 1, with columns
    ``t1_us .. tk_us`` (BIGINT µs, NULL from the first unreached step on),
    ``steps_completed`` and ``converted`` (all k steps reached).  Step
    ``i+1`` matches the earliest event of its type with
    ``t_i < ts <= t_i + within_us``.
    """
    if len(steps) < 2:
        raise ValueError(f"funnel needs >= 2 steps, got {steps!r}")
    if within_us <= 0:
        raise ValueError(f"within_us must be positive, got {within_us}")
    chain = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(F.col(user_col).alias("__u"))
        .agg(F.min(ts_col).alias("t1_us"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = events.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("__nu"), F.col(ts_col).alias("__nts")
        )
        prev = f"t{i - 1}_us"
        chain = (
            chain.join(
                nxt,
                (F.col("__u") == F.col("__nu"))
                & (F.col("__nts") > F.col(prev))
                & (F.col("__nts") <= F.col(prev) + F.lit(within_us)),
                "left",
            )
            .groupBy("__u", *[f"t{j}_us" for j in range(1, i)])
            .agg(F.min("__nts").alias(f"t{i}_us"))
        )
    ts_cols = [f"t{j}_us" for j in range(1, len(steps) + 1)]
    completed = sum(
        (F.col(c).isNotNull().cast("bigint") for c in ts_cols), F.lit(0)
    )
    return chain.select(
        F.col("__u").alias(user_col),
        *ts_cols,
        completed.cast("bigint").alias("steps_completed"),
        F.col(ts_cols[-1]).isNotNull().alias("converted"),
    )


def sequence_match(
    events: DataFrame,
    *,
    pattern: str,
    type_map: dict[str, str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """ClickHouse ``sequenceMatch``-class pattern search per user.

    Maps each event type to a single character via ``type_map`` (events
    with unmapped types are excluded), builds the user's time-ordered
    type string, and regex-matches ``pattern`` against it.  Returns
    ``(user_id, seq_len, matched)``.

    Determinism: the string is built by ``array_sort`` over
    ``(ts, *tie, char)`` structs collected per user — a total order, so
    the result is independent of partitioning/collect order.  Keep
    ``pattern`` to the portable regex core (literals, ``.``, ``*``,
    ``+``, character classes) so any SQL engine's regex agrees.

    Scale posture (100 TB): one user-key groupBy (map-side combinable
    collect); per-user state is that user's mapped-event count — the
    same bound sessionization carries.  The unmapped-type filter prunes
    before the shuffle and pushes to the scan.
    """
    for k, v in type_map.items():
        if len(v) != 1:
            raise ValueError(
                f"type_map values must be single characters, got {k!r}->{v!r}"
            )
    if not type_map:
        raise ValueError("type_map must not be empty")
    ties = tie_cols or []
    char = None
    for k, v in type_map.items():
        cond = F.col(type_col) == k
        char = F.when(cond, F.lit(v)) if char is None else char.when(cond, F.lit(v))
    seq = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(ts_col).alias("t"),
                        *[F.col(c).alias(f"k{i}") for i, c in enumerate(ties)],
                        char.alias("c"),
                    )
                )
            ),
            lambda x: x["c"],
        ),
        "",
    )
    return (
        events.filter(F.col(type_col).isin(list(type_map)))
        .groupBy(F.col(user_col))
        .agg(seq.alias("__seq"))
        .select(
            user_col,
            F.length("__seq").cast("bigint").alias("seq_len"),
            F.col("__seq").rlike(pattern).alias("matched"),
        )
    )


WEEK_US = 7 * 86_400 * 1_000_000


def cohort_retention(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
) -> DataFrame:
    """Weekly cohort retention: (cohort_week, week_offset, n_users).

    ``cohort_week`` = epoch-week of the user's first event (floor of µs /
    one week — exact BIGINT division); ``week_offset`` counts weeks since
    the cohort week in which the user was active again (offset 0 row =
    cohort size).  Distinct users per cell, so multiple events in a week
    count once."""
    # integer division (`div`), never float `/`: a double quotient can
    # round across the floor boundary and disagree with the oracle's `//`
    firsts = events.groupBy(F.col(user_col).alias("__u")).agg(
        F.expr(f"min({ts_col}) div {WEEK_US}").alias("__cw")
    )
    active = events.select(
        F.col(user_col).alias("__u"),
        F.expr(f"{ts_col} div {WEEK_US}").alias("__aw"),
    ).distinct()
    return (
        active.join(firsts, "__u")
        .groupBy(
            F.col("__cw").alias("cohort_week"),
            (F.col("__aw") - F.col("__cw")).alias("week_offset"),
        )
        .agg(F.count_distinct("__u").cast("bigint").alias("n_users"))
    )


def cohort_ltv(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    value_col: str = "vq",
) -> DataFrame:
    """Weekly cohort lifetime-value triangle — the revenue sibling of
    ``cohort_retention``: for each signup cohort (epoch-week of the
    user's first event) and each age week since, the active-user count,
    the week's revenue, the RUNNING cumulative revenue, and cumulative
    LTV per cohort user in exact milli:

        ltv_per_user_milli = cum_revenue_milli div n_cohort_users

    ``value_col`` is the pre-quantized BIGINT revenue of the event
    (NULL = non-revenue activity: it still marks the user active that
    week, contributes zero revenue).  Cells with no activity are absent
    (a sparse triangle — resample through ``gapfill`` if a dense grid
    is needed); cumulative sums therefore step only at observed ages,
    which is exact for LTV (revenue between observations is zero).

    Returns ``(cohort_week, week_offset, n_cohort_users, active_users,
    revenue_milli, cum_revenue_milli, ltv_per_user_milli)``.

    Scale posture (100 TB): two event-sized combinable groupBys (the
    per-user first-week census and the (user, week) activity/revenue
    census), one user-keyed equi-join of user-sized frames, one
    census-sized groupBy, then a census-sized running-sum window
    partitioned by cohort (weeks-per-cohort rows — bounded by the
    calendar, not by events) and a broadcast join of the
    weeks-sized cohort-size frame.
    """
    # the first-week census feeds BOTH the age join and the cohort
    # sizes — checkpoint lazily so the event scan + user shuffle run
    # once (materializes inside the first consuming job)
    firsts = (
        events.groupBy(F.col(user_col).alias("__u"))
        .agg(F.expr(f"min({ts_col}) div {WEEK_US}").alias("__cw"))
        .localCheckpoint(eager=False)
    )
    sizes = firsts.groupBy(F.col("__cw").alias("cohort_week")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cohort_users")
    )
    weekly = (
        events.select(
            F.col(user_col).alias("__u"),
            F.expr(f"{ts_col} div {WEEK_US}").alias("__aw"),
            F.col(value_col).alias("__v"),
        )
        .groupBy("__u", "__aw")
        .agg(
            F.coalesce(F.sum("__v"), F.lit(0)).cast("bigint").alias("__rev")
        )
    )
    cells = (
        weekly.join(firsts, "__u")
        .groupBy(
            F.col("__cw").alias("cohort_week"),
            (F.col("__aw") - F.col("__cw")).alias("week_offset"),
        )
        .agg(
            # plain count, not count_distinct: weekly is one row per
            # (__u, __aw) and each user has a single cohort week, so
            # within a (cohort_week, week_offset) group every __u
            # appears exactly once — the distinct aggregation's
            # two-phase expansion would be pure overhead (ADVICE r11;
            # read_cohort_ltv already counts plainly on the same
            # invariant)
            F.count(F.lit(1)).cast("bigint").alias("active_users"),
            F.sum("__rev").cast("bigint").alias("revenue_milli"),
        )
    )
    w_cum = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cells.withColumn(
            "cum_revenue_milli",
            F.sum("revenue_milli").over(w_cum).cast("bigint"),
        )
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_cohort_users",
            "active_users",
            "revenue_milli",
            "cum_revenue_milli",
            F.expr("cum_revenue_milli div n_cohort_users").alias(
                "ltv_per_user_milli"
            ),
        )
    )


def sessionize(
    events: DataFrame,
    *,
    gap_us: int,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    order_extra: list[str] | None = None,
) -> DataFrame:
    """Gap-rule batch sessionization: one row per (user, session).

    A new session starts at the user's first event and whenever the gap
    to the previous event exceeds ``gap_us`` (strictly).  Returns
    ``(user_id, session_idx, start_us, end_us, n_events, duration_us)``
    — all exact BIGINT, ``session_idx`` 1-based in time order.

    Scale posture (100 TB): ONE shuffle total — the lag/running-sum
    window hash-partitions on the user key and the per-session groupBy's
    clustering keys are a superset of that partitioning, so Spark reuses
    it (plan-gated).  State per user is bounded by that user's event
    count; no session payload is ever wider than the six scalars out.
    """
    if gap_us <= 0:
        raise ValueError(f"gap_us must be positive, got {gap_us}")
    return (
        assign_sessions(
            events.select(
                F.col(user_col),
                F.col(ts_col),
                *[F.col(c) for c in (order_extra or [])],
            ),
            gap_us=gap_us,
            user_col=user_col,
            ts_col=ts_col,
            order_extra=order_extra,
        )
        .groupBy(user_col, "session_idx")
        .agg(
            F.min(ts_col).alias("start_us"),
            F.max(ts_col).alias("end_us"),
            F.count("*").alias("n_events"),
        )
        .withColumn("duration_us", F.col("end_us") - F.col("start_us"))
    )


def transition_matrix(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
    order_extra: list[str] | None = None,
) -> DataFrame:
    """Per-user event-type transition counts (first-order Markov matrix).

    One row per (from_type, to_type) with the count of consecutive
    occurrences across all users and the transition probability as an
    exact integer ``prob_milli`` = 1000 * n / row-total (truncating
    division — engine-identical, no float drift).  ONE window shuffle on
    the user key + one combinable groupBy on the (tiny) type-pair space.
    """
    from pyspark.sql import Window

    order = [F.col(ts_col)] + [F.col(c) for c in (order_extra or [])]
    w = Window.partitionBy(user_col).orderBy(*order)
    pairs = (
        events.select(
            F.lag(F.col(type_col)).over(w).alias("from_type"),
            F.col(type_col).alias("to_type"),
        )
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n_transitions"))
    )
    w_tot = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.expr("1000 * n_transitions").cast("bigint").alias("__num"),
        F.sum("n_transitions").over(w_tot).alias("__den"),
    ).select(
        "from_type",
        "to_type",
        "n_transitions",
        F.expr("__num div __den").alias("prob_milli"),
    )


def linear_attribution(
    events: DataFrame,
    *,
    conversion_type: str,
    touch_types: list[str],
    within_us: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
    id_col: str = "event_id",
    value_milli_col: str = "value_milli",
) -> DataFrame:
    """Linear multi-touch attribution — split each conversion's value
    equally across the user's preceding touch events, EXACTLY.

    For every conversion event, its touches are the user's events of a
    ``touch_types`` type with ``t_conv - within_us <= ts < t_conv``.
    The conversion's integer value splits as ``value div n`` per touch,
    with the remainder ``value % n`` credited to the EARLIEST touch
    (ties by ``id_col``) — a stated deterministic policy instead of
    fractional credits, so credits are exact integers that sum back to
    the conversion value (property-tested).  Conversions with no touch
    in the window produce no rows (the standard unattributed bucket —
    count them by anti-joining the output).  Conversions with a NULL
    value are excluded outright (matching ``decay_attribution``): a
    NULL value has no credit to split, and keeping it would emit rows
    whose ``credit_milli`` is NULL, breaking the sum-back invariant.

    Returns ``(conv_id, touch_id, user, touch_ts_us, n_touches,
    credit_milli)``.

    Scale posture (100 TB): ONE user-keyed equi-join (conversions x
    touches for the same user, the time window a post-join filter) +
    one per-conversion window for the remainder policy — both
    partitioned on the same key at fact scale.  Skew valve: per-user
    touch volume bounds the join fan-out; cap upstream for bot-class
    users (the funnel tier's standing guidance).
    """
    if within_us <= 0:
        raise ValueError(f"within_us must be positive, got {within_us}")
    if not touch_types:
        raise ValueError("touch_types must be non-empty")
    convs = (
        events.filter(F.col(type_col) == conversion_type)
        .filter(F.col(value_milli_col).isNotNull())
        .select(
            F.col(user_col).alias("__u"),
            F.col(id_col).alias("conv_id"),
            F.col(ts_col).alias("__ct"),
            F.col(value_milli_col).alias("__val"),
        )
    )
    touches = events.filter(F.col(type_col).isin(touch_types)).select(
        F.col(user_col).alias("__u"),
        F.col(id_col).alias("touch_id"),
        F.col(ts_col).alias("touch_ts_us"),
    )
    joined = convs.join(touches, "__u").filter(
        (F.col("touch_ts_us") < F.col("__ct"))
        & (F.col("touch_ts_us") >= F.col("__ct") - F.lit(within_us))
    )
    w_conv = Window.partitionBy("conv_id")
    w_first = w_conv.orderBy("touch_ts_us", "touch_id")
    credited = (
        joined.withColumn(
            "n_touches",
            F.count("*").over(
                w_conv.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
        .withColumn("__rn", F.row_number().over(w_first))
        .withColumn(
            "credit_milli",
            F.expr("__val div n_touches")
            + F.when(
                F.col("__rn") == 1, F.expr("__val % n_touches")
            ).otherwise(F.lit(0)),
        )
    )
    return credited.select(
        "conv_id",
        "touch_id",
        F.col("__u").alias(user_col),
        "touch_ts_us",
        F.col("n_touches").cast("bigint").alias("n_touches"),
        F.col("credit_milli").cast("bigint").alias("credit_milli"),
    )


def decay_attribution(
    events: DataFrame,
    *,
    conversion_type: str,
    touch_types: list[str],
    within_us: int,
    half_life_us: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
    id_col: str = "event_id",
    value_milli_col: str = "value_milli",
    max_age_halves: int = 20,
) -> DataFrame:
    """Time-decay multi-touch attribution — split each conversion's
    value across preceding touches with weight halving per
    ``half_life_us`` of age, EXACTLY.

    The marketing-analytics standard next to linear attribution: a touch
    aged ``a = (t_conv - t_touch) div half_life_us`` half-lives carries
    relative weight 2^-a.  The binary-fraction trick makes the credits
    exact integers: weights materialize as ``w = 1 << (H - min(a, H))``
    (``H = max_age_halves``; ages past H saturate at weight 1 — a stated
    floor, not silent truncation), each touch gets
    ``value * w div sum(w)``, and the rounding remainder
    ``value - sum(floor credits)`` goes to the most recent touch
    (weight desc, then ts desc, then ``id_col``) — so credits always sum back to
    the conversion value (property-tested) with no float anywhere.
    Conversions with a NULL value are excluded (nothing to attribute);
    non-NULL values must be non-negative and < 2^(62-H) (executor
    fail-fast: ``value * w`` must not overflow int64).

    Returns ``(conv_id, touch_id, user, touch_ts_us, n_touches,
    age_halves, weight, credit_milli)``.

    Scale posture (100 TB): identical shape to
    :func:`linear_attribution` — ONE user-keyed equi-join + windows all
    partitioned by conv_id; the weight math is row-local int64.  Same
    per-user fan-out skew valve.
    """
    if within_us <= 0:
        raise ValueError(f"within_us must be positive, got {within_us}")
    if half_life_us <= 0:
        raise ValueError(f"half_life_us must be positive, got {half_life_us}")
    if not touch_types:
        raise ValueError("touch_types must be non-empty")
    if not 1 <= max_age_halves <= 40:
        raise ValueError(
            f"max_age_halves must be in [1, 40], got {max_age_halves}"
        )
    h = max_age_halves
    val_cap = 1 << (62 - h)
    val_ok = (F.col("__val") >= 0) & (F.col("__val") < val_cap)
    # NULL-value conversions carry nothing to attribute — excluded, and
    # excluded BEFORE the guard (a NULL guard condition would otherwise
    # raise with a NULLed-out message)
    convs = (
        events.filter(F.col(type_col) == conversion_type)
        .filter(F.col(value_milli_col).isNotNull())
        .select(
            F.col(user_col).alias("__u"),
            F.col(id_col).alias("conv_id"),
            F.col(ts_col).alias("__ct"),
            F.col(value_milli_col).alias("__val"),
        )
    )
    convs = convs.withColumn(
        "__val",
        F.when(val_ok, F.col("__val")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"decay_attribution: conversion value must be in "
                        f"[0, {val_cap}) so value*weight fits int64 at "
                        f"max_age_halves={h} (value="
                    ),
                    F.col("__val").cast("string"),
                    F.lit(")"),
                )
            ).cast("bigint")
        ),
    )
    touches = events.filter(F.col(type_col).isin(touch_types)).select(
        F.col(user_col).alias("__u"),
        F.col(id_col).alias("touch_id"),
        F.col(ts_col).alias("touch_ts_us"),
    )
    joined = convs.join(touches, "__u").filter(
        (F.col("touch_ts_us") < F.col("__ct"))
        & (F.col("touch_ts_us") >= F.col("__ct") - F.lit(within_us))
    )
    joined = joined.withColumn(
        "age_halves",
        F.least(
            F.expr(f"(__ct - touch_ts_us) div {half_life_us}"), F.lit(h)
        ).cast("bigint"),
    ).withColumn(
        "weight",
        F.expr(f"shiftleft(CAST(1 AS BIGINT), {h} - age_halves)"),
    )
    w_conv = Window.partitionBy("conv_id")
    w_all = w_conv.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # remainder recipient: the most recent touch — weight desc alone is
    # not enough (touches in the same age bucket share a weight), so ts
    # desc breaks the bucket tie and id the exact-ts tie
    w_first = w_conv.orderBy(
        F.col("weight").desc(),
        F.col("touch_ts_us").desc(),
        F.col("touch_id"),
    )
    credited = (
        joined.withColumn("n_touches", F.count("*").over(w_all))
        .withColumn("__wsum", F.sum("weight").over(w_all))
        .withColumn("__floor", F.expr("(__val * weight) div __wsum"))
        .withColumn("__fsum", F.sum("__floor").over(w_all))
        .withColumn("__rn", F.row_number().over(w_first))
        .withColumn(
            "credit_milli",
            F.col("__floor")
            + F.when(
                F.col("__rn") == 1, F.col("__val") - F.col("__fsum")
            ).otherwise(F.lit(0)),
        )
    )
    return credited.select(
        "conv_id",
        "touch_id",
        F.col("__u").alias(user_col),
        "touch_ts_us",
        F.col("n_touches").cast("bigint").alias("n_touches"),
        "age_halves",
        "weight",
        F.col("credit_milli").cast("bigint").alias("credit_milli"),
    )


def conversion_paths(
    events: DataFrame,
    *,
    conversion_type: str,
    touch_types: list[str],
    within_us: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
    id_col: str = "event_id",
    min_support: int = 1,
    max_touches: int = 20,
    sep: str = ">",
) -> DataFrame:
    """Top conversion paths — the ordered-touch-sequence census behind
    "which journeys convert" analyses (the full-sequence complement of
    the first-order ``transition_matrix``).

    For every conversion event, the user's preceding ``touch_types``
    events with ``t_conv - within_us <= ts < t_conv`` form its path:
    touch types joined by ``sep`` in ``(ts, id)`` order, truncated to
    the LAST ``max_touches`` touches before the conversion (the
    recency-biased cut marketers use; a stated deterministic cap, not
    silent skew).  Conversions with no in-window touch contribute no
    path (count them by anti-joining conversions against the output's
    inputs — the standard unattributed bucket).

    Returns ``(path, n_conversions)`` for paths reaching
    ``min_support``.

    Scale posture (100 TB): the attribution tier's shape — one
    user-keyed conv x touch equi-join (time window as a post-join
    filter, never a cartesian) + one per-conversion ordered collect
    (the window's partitioning) + one map-side-combinable path census.
    Per-conversion fan-out is bounded by per-user touch volume in the
    window (cap bot-class users upstream — the tier's standing valve)
    and the path payload by ``max_touches``.
    """
    if within_us <= 0:
        raise ValueError(f"within_us must be positive, got {within_us}")
    if not touch_types:
        raise ValueError("touch_types must be non-empty")
    if max_touches < 1:
        raise ValueError(f"max_touches must be >= 1, got {max_touches}")
    if min_support < 1:
        raise ValueError(f"min_support must be >= 1, got {min_support}")
    convs = events.filter(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("__u"),
        F.col(id_col).alias("__cid"),
        F.col(ts_col).alias("__ct"),
    )
    touches = events.filter(F.col(type_col).isin(touch_types)).select(
        F.col(user_col).alias("__u"),
        F.col(id_col).alias("__tid"),
        F.col(ts_col).alias("__tt"),
        F.col(type_col).alias("__ty"),
    )
    joined = convs.join(touches, "__u").filter(
        (F.col("__tt") < F.col("__ct"))
        & (F.col("__tt") >= F.col("__ct") - F.lit(within_us))
    )
    # per conversion: sort touches by (ts, id) row-locally and keep the
    # LAST max_touches — slice from the end of the sorted array, no
    # second window pass
    paths = (
        joined.groupBy("__cid")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("__tt", "__tid", "__ty"))
            ).alias("__touch_arr")
        )
        .select(
            F.array_join(
                F.expr(
                    f"transform(slice(__touch_arr, "
                    f"greatest(1, size(__touch_arr) - {max_touches} + 1), "
                    f"{max_touches}), x -> x.__ty)"
                ),
                sep,
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n_conversions"))
        .filter(F.col("n_conversions") >= min_support)
    )


def assign_sessions(
    events: DataFrame,
    *,
    gap_us: int,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    order_extra: list[str] | None = None,
) -> DataFrame:
    """Per-EVENT gap-rule session assignment: the input rows plus a
    1-based ``session_idx`` — the shared core ``sessionize`` folds into
    per-session rows and compositions (the session-scoped funnel) key
    on directly.  Session membership depends only on the timestamp
    VALUES (equal timestamps always share a session), so the
    ``order_extra`` tie-break only pins the running-sum evaluation
    order, never the assignment.  ONE window shuffle on the user key.
    """
    from pyspark.sql import Window

    if gap_us <= 0:
        raise ValueError(f"gap_us must be positive, got {gap_us}")
    order = [F.col(ts_col)] + [F.col(c) for c in (order_extra or [])]
    w = Window.partitionBy(user_col).orderBy(*order)
    lag_ts = F.lag(F.col(ts_col)).over(w)
    new_sess = (
        lag_ts.isNull() | (F.col(ts_col) - lag_ts > F.lit(gap_us))
    ).cast("bigint")
    run = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn("session_idx", F.sum(new_sess).over(run))


def position_attribution(
    events: DataFrame,
    *,
    conversion_type: str,
    touch_types: list[str],
    within_us: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
    id_col: str = "event_id",
    value_milli_col: str = "value_milli",
    edge_pct: int = 40,
) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution — the third
    standard model beside ``linear_attribution`` and
    ``decay_attribution`` (same conversion-window join shape): the
    FIRST and LAST touches each take ``edge_pct`` percent of the
    conversion value, the middles split the rest — all in exact
    integers that sum back to the conversion value:

        n == 1: the single touch takes everything
        n == 2: value div 2 each, remainder to the earlier touch
        n >= 3: edge = (value * edge_pct) div 100 to first and last;
                pool = value - 2*edge; each middle takes
                pool div (n-2), remainder to the EARLIEST middle

    Every division truncates toward zero in both engines, and
    ``a = (a div b)*b + a % b`` holds for any sign, so the credits are
    exact and the sum-back invariant is property-tested.  Touch order
    is the total order (ts, id).  NULL-value conversions are excluded
    (the linear/decay stance); ``|value| < 2^55`` is guarded so
    ``value * edge_pct`` stays in int64.

    Returns ``(conv_id, touch_id, user, touch_ts_us, n_touches,
    position, credit_milli)`` with ``position`` 1-based in touch
    order.

    Scale posture (100 TB): identical to linear_attribution — ONE
    user-keyed equi-join + per-conversion windows, all partitioned on
    the same key; no Python, no cartesian (plan-gated).
    """
    if within_us <= 0:
        raise ValueError(f"within_us must be positive, got {within_us}")
    if not touch_types:
        raise ValueError("touch_types must be non-empty")
    if not 1 <= edge_pct <= 50:
        raise ValueError(f"edge_pct must be in [1, 50], got {edge_pct}")
    val_cap = 1 << 55
    convs = (
        events.filter(F.col(type_col) == conversion_type)
        .filter(F.col(value_milli_col).isNotNull())
        .select(
            F.col(user_col).alias("__u"),
            F.col(id_col).alias("conv_id"),
            F.col(ts_col).alias("__ct"),
            F.col(value_milli_col).alias("__val"),
        )
        .withColumn(
            "__val",
            F.when(F.abs(F.col("__val")) < F.lit(val_cap), F.col("__val"))
            .otherwise(
                F.raise_error(
                    F.lit(
                        f"position_attribution: |value| must be < {val_cap} "
                        "so value*edge_pct fits int64"
                    )
                ).cast("bigint")
            ),
        )
    )
    touches = events.filter(F.col(type_col).isin(touch_types)).select(
        F.col(user_col).alias("__u"),
        F.col(id_col).alias("touch_id"),
        F.col(ts_col).alias("touch_ts_us"),
    )
    joined = convs.join(touches, "__u").filter(
        (F.col("touch_ts_us") < F.col("__ct"))
        & (F.col("touch_ts_us") >= F.col("__ct") - F.lit(within_us))
    )
    w_conv = Window.partitionBy("conv_id")
    w_first = w_conv.orderBy("touch_ts_us", "touch_id")
    d = (
        joined.withColumn(
            "n_touches",
            F.count("*").over(
                w_conv.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
        .withColumn("__rn", F.row_number().over(w_first))
        .withColumn("__edge", F.expr(f"(__val * {edge_pct}) div 100"))
        .withColumn("__pool", F.expr("__val - 2 * __edge"))
    )
    n, rn = F.col("n_touches"), F.col("__rn")
    credit = (
        F.when(n == 1, F.col("__val"))
        .when(
            n == 2,
            F.expr("__val div 2")
            + F.when(rn == 1, F.expr("__val % 2")).otherwise(F.lit(0)),
        )
        .when((rn == 1) | (rn == n), F.col("__edge"))
        .otherwise(
            F.expr("__pool div (n_touches - 2)")
            + F.when(
                rn == 2, F.expr("__pool % (n_touches - 2)")
            ).otherwise(F.lit(0))
        )
    )
    return d.select(
        "conv_id",
        "touch_id",
        F.col("__u").alias(user_col),
        "touch_ts_us",
        F.col("n_touches").cast("bigint").alias("n_touches"),
        rn.cast("bigint").alias("position"),
        credit.cast("bigint").alias("credit_milli"),
    )


def throttle_events(
    events: DataFrame,
    *,
    gap_us: int,
    key_cols: list[str],
    ts_col: str = "ts_us",
    order_extra: list[str] | None = None,
) -> DataFrame:
    """Gap-rule event throttling / burst dedup — keep only the FIRST
    event of each burst per key, where a burst is a maximal run of
    events each within ``gap_us`` of its predecessor (the
    ``assign_sessions`` gap rule applied as a keep/drop filter): the
    telemetry-cleaning step that collapses retry storms, double-clicks
    and at-least-once delivery duplicates while keeping genuinely
    separate occurrences.

    Chained semantics, stated: a kept event suppresses followers
    within ``gap_us`` of the PREVIOUS event (kept or not), so a long
    storm with sub-gap spacing collapses to ONE row however long it
    lasts — the sessionization gap rule, not a fixed tumbling window
    (which would re-emit at every window boundary mid-storm).

    Returns the burst-starting input rows plus ``burst_len`` (events
    the kept row absorbed, itself included) and ``burst_end_us``.
    Deterministic under duplicates: equal timestamps always share a
    burst (membership depends on timestamp VALUES only);
    ``order_extra`` pins which duplicate row is the kept one.

    Scale posture (100 TB): ONE window shuffle on the key (the
    assign_sessions core) + per-burst windows on the SAME
    partitioning, so Spark reuses the exchange (the sessionize shape).
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    composite = "__tk"
    keyed = events.withColumn(
        composite,
        F.concat_ws("\\x1f", *[F.col(c).cast("string") for c in key_cols]),
    )
    sessed = assign_sessions(
        keyed,
        gap_us=gap_us,
        user_col=composite,
        ts_col=ts_col,
        order_extra=order_extra,
    )
    w = Window.partitionBy(composite, "session_idx")
    order = [F.col(ts_col)] + [F.col(c) for c in (order_extra or [])]
    first = Window.partitionBy(composite, "session_idx").orderBy(*order)
    return (
        sessed.withColumn("burst_len", F.count(F.lit(1)).over(w))
        .withColumn("burst_end_us", F.max(ts_col).over(w))
        .withColumn("__rn", F.row_number().over(first))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "session_idx", composite)
    )


def bounce_rate(
    events: DataFrame,
    *,
    gap_us: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-landing-type bounce rate (r12) — the product-analytics
    staple the sessionization tier was missing: group sessions by the
    type of their FIRST event (the landing), and report how many ended
    after that single event.

        bounce_ppm = (n_bounces * 1_000_000) div n_sessions

    exact integers end to end; the landing event is the session's
    (ts, id) minimum, so the choice is deterministic under ties.

    Returns one row per landing type: ``(landing_type, n_sessions,
    n_bounces, bounce_ppm)``.

    Scale posture (100 TB): the assign_sessions window is ONE shuffle
    on the user key; the per-session fold's clustering keys (user,
    session_idx) are a superset of that partitioning so Spark reuses
    the exchange; the landing-type census is map-side combinable over
    session rows.  Overflow: n_bounces * 1e6 needs sessions < ~9e12
    per landing type — beyond any real fixture; the ppm is
    scale-free, sample past that.
    """
    assigned = assign_sessions(
        events.select(
            F.col(user_col), F.col(ts_col), F.col(id_col), F.col(type_col)
        ),
        gap_us=gap_us,
        user_col=user_col,
        ts_col=ts_col,
        order_extra=[id_col],
    )
    per_sess = assigned.groupBy(user_col, "session_idx").agg(
        F.min(
            F.struct(F.col(ts_col), F.col(id_col), F.col(type_col))
        ).alias("__first"),
        F.count(F.lit(1)).cast("bigint").alias("__n"),
    )
    return (
        per_sess.groupBy(
            F.col(f"__first.{type_col}").alias("landing_type")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum((F.col("__n") == 1).cast("bigint"))
            .cast("bigint")
            .alias("n_bounces"),
        )
        .withColumn(
            "bounce_ppm", F.expr("(n_bounces * 1000000) div n_sessions")
        )
    )
