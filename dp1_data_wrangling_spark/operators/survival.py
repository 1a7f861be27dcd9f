"""Exact Kaplan-Meier survival estimation over a subject table.

The churn/retention question every event warehouse eventually asks —
"what fraction of users are still active t days after they arrive?" —
with the right-censoring handled properly: a user who is still active
when the observation window closes is CENSORED at their observed age,
not counted as churned (the classic KM correction; naive "percent
still here" curves are biased low).

Engine-exact by construction.  The KM estimator is a product of
rationals S(t) = prod_{t_i <= t} (n_i - d_i) / n_i — float products
are accumulation-order-dependent, so instead the survival level is
carried as an integer in ``scale`` units (default nano, 1e9) through a
STEPWISE truncating division:

    s_0 = scale
    s_i = s_{i-1} * (n_i - d_i) div n_i     (only where d_i > 0)

Both engines (this operator and the DuckDB recursive-CTE oracle)
replay the identical fold, so the result is bit-identical regardless
of partitioning.  The truncation bias per step is < 1 ulp of the scale
(≤ 1e-9 at nano) — stated convention, not noise.

Scale posture (100 TB): the subject table reduces to a (group,
duration) CENSUS in ONE combinable groupBy — the only data-sized
shuffle.  The per-group KM fold then runs over census rows (bounded by
the number of DISTINCT durations — days in the observation window —
not by subjects), as a row-local JVM ``aggregate`` fold over the
collected census array: the same census-decomposition stance as
``distributed_rank`` and ``grid_hotspots``.  No Python, no
single-partition exchange over subject-sized data.

Overflow contract: ``scale * n_risk`` must fit a signed 64-bit
integer; validated with an executor ``raise_error`` on the group
totals (fail fast, never silent wraparound).  At the default nano
scale that admits ~9.2e9 subjects per group.

Engine extension — the reference (exporter.py:75-141) has no survival
tier; the operator follows the Kaplan-Meier (1958) estimator as
presented in standard texts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .stats import _sat_div_sql


def km_survival(
    df: DataFrame,
    *,
    duration_col: str,
    event_col: str,
    group_cols: list[str] | None = None,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Kaplan-Meier survival table from one row per subject.

    ``duration_col`` — non-negative BIGINT observed duration (time
    units are the caller's; days is typical).  ``event_col`` — 1 if
    the terminal event (churn/death) was OBSERVED at that duration,
    0 if the subject was right-censored there.  Both validated with
    executor fail-fasts.

    Returns one row per (group, distinct duration) in duration order:
    ``n_risk`` (subjects with duration >= t), ``n_events`` /
    ``n_censored`` at t, and ``survival_scaled`` — the KM level after
    processing t, in ``scale`` units (events processed before
    censorings at the same t, the standard convention).
    """
    if scale < 1:
        raise ValueError(f"scale must be positive, got {scale}")
    groups = group_cols or []
    for c in (duration_col, event_col):
        if c in groups:
            raise ValueError(f"column {c!r} cannot also be a group column")

    dur = F.col(duration_col).cast("bigint")
    ev = F.col(event_col).cast("bigint")
    checked = df.select(
        *groups,
        F.when(dur >= 0, dur)
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("km_survival: negative duration "),
                    dur.cast("string"),
                )
            )
        )
        .alias("__t"),
        F.when(ev.isin(0, 1), ev)
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("km_survival: event flag must be 0/1, got "),
                    ev.cast("string"),
                )
            )
        )
        .alias("__e"),
    )

    # the ONE data-sized shuffle: subjects -> (group, duration) census
    census = checked.groupBy(*groups, "__t").agg(
        F.sum("__e").alias("__d"),
        (F.count(F.lit(1)) - F.sum("__e")).alias("__c"),
    )

    # per-group fold over the census (bounded by distinct durations).
    # array_sort orders the structs by their first field (__t, distinct
    # within a group), so the fold walks durations ascending.
    n_cap = (1 << 62) // scale
    folded = census.groupBy(*groups).agg(
        F.sum(F.col("__d") + F.col("__c")).alias("__n"),
        F.array_sort(
            F.collect_list(F.struct("__t", "__d", "__c"))
        ).alias("__rows"),
    )
    guarded = folded.withColumn(
        "__nok",
        F.when(F.col("__n") < F.lit(n_cap), F.col("__n")).otherwise(
            F.raise_error(
                F.lit(
                    f"km_survival: group has >= {n_cap} subjects — "
                    f"scale*n_risk would overflow 64-bit; lower scale"
                )
            )
        ),
    )
    # accumulator: (s = current survival level, rem = subjects still at
    # risk, out = emitted rows).  n_risk at a duration is `rem` BEFORE
    # removing that duration's events + censorings.  Written as one SQL
    # aggregate so the stepwise division is BIGINT `div` (Column `/` is
    # float division — inexact past 2^53, which scale*n_risk exceeds).
    fold = F.expr(
        f"""
        aggregate(
          __rows,
          struct(
            CAST({scale} AS BIGINT) AS s,
            __nok AS rem,
            CAST(array() AS
              array<struct<t:bigint,nr:bigint,d:bigint,c:bigint,s:bigint>>
            ) AS out),
          (acc, r) -> struct(
            CASE WHEN r.__d > 0
                 THEN (acc.s * (acc.rem - r.__d)) div acc.rem
                 ELSE acc.s END AS s,
            acc.rem - r.__d - r.__c AS rem,
            concat(acc.out, array(struct(
              r.__t AS t,
              acc.rem AS nr,
              r.__d AS d,
              r.__c AS c,
              CASE WHEN r.__d > 0
                   THEN (acc.s * (acc.rem - r.__d)) div acc.rem
                   ELSE acc.s END AS s))) AS out),
          acc -> acc.out
        )
        """
    )
    out = guarded.select(*groups, F.explode(fold).alias("__r"))
    return out.select(
        *groups,
        F.col("__r.t").alias("duration"),
        F.col("__r.nr").alias("n_risk"),
        F.col("__r.d").alias("n_events"),
        F.col("__r.c").alias("n_censored"),
        F.col("__r.s").alias("survival_scaled"),
    )


def _checked_subjects(
    df: DataFrame,
    *,
    duration_col: str,
    event_col: str,
    groups: list[str],
    extra: list[F.Column] | None = None,
) -> DataFrame:
    """Shared subject validation: non-negative BIGINT duration, 0/1
    event flag — executor fail-fasts, the km_survival contract."""
    dur = F.col(duration_col).cast("bigint")
    ev = F.col(event_col).cast("bigint")
    return df.select(
        *groups,
        *(extra or []),
        F.when(dur >= 0, dur)
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("survival: negative duration "),
                    dur.cast("string"),
                )
            )
        )
        .alias("__t"),
        F.when(ev.isin(0, 1), ev)
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("survival: event flag must be 0/1, got "),
                    ev.cast("string"),
                )
            )
        )
        .alias("__e"),
    )


def nelson_aalen(
    df: DataFrame,
    *,
    duration_col: str,
    event_col: str,
    group_cols: list[str] | None = None,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Exact Nelson-Aalen cumulative-hazard table — Kaplan-Meier's
    additive sibling: H(t) = sum_{t_i <= t} d_i / n_i, the estimator of
    the integrated hazard rate (and the standard input to proportional-
    hazards eyeballing: parallel log-H curves <=> proportional hazards).

    Unlike KM's product, every NA term is INDEPENDENT of the running
    level, so no recursive fold is needed: the per-duration term is the
    truncating division ``(scale * d_i) div n_i`` and the curve is its
    running sum in duration order — both engines replay the identical
    per-term truncation, so results are bit-identical regardless of
    partitioning (truncation bias < 1 ulp of ``scale`` per EVENT time,
    stated convention).  Censoring-only durations contribute a zero
    term but still appear in the output (they move ``n_risk``).

    Returns one row per (group, distinct duration) in duration order:
    ``n_risk``, ``n_events``, ``n_censored``, ``cumhaz_scaled``.

    Scale posture (100 TB): ONE combinable subject->(group, duration)
    census groupBy (the only data-sized shuffle), then two window
    passes over CENSUS rows partitioned by the group key (running
    subject depletion -> n_risk, running hazard sum) — census rows are
    bounded by distinct durations, never by subjects.  No join, no
    fold, no Python.

    Overflow contract: ``scale * n_risk`` must fit signed 64-bit —
    same ``n_cap`` executor fail-fast as km_survival (~9.2e9 subjects
    per group at nano scale).

    Engine extension — the reference (exporter.py:75-141) has no
    survival tier; estimator per Nelson (1972) / Aalen (1978) as in
    standard texts.
    """
    if scale < 1:
        raise ValueError(f"scale must be positive, got {scale}")
    groups = group_cols or []
    for c in (duration_col, event_col):
        if c in groups:
            raise ValueError(f"column {c!r} cannot also be a group column")
    from pyspark.sql import Window

    checked = _checked_subjects(
        df, duration_col=duration_col, event_col=event_col, groups=groups
    )
    census = checked.groupBy(*groups, "__t").agg(
        F.sum("__e").alias("__d"),
        (F.count(F.lit(1)) - F.sum("__e")).alias("__c"),
    )
    return nelson_aalen_from_census(census, group_cols=groups, scale=scale)


def nelson_aalen_from_census(
    census: DataFrame,
    *,
    group_cols: list[str] | None = None,
    duration_col: str = "__t",
    events_col: str = "__d",
    censored_col: str = "__c",
    scale: int = 1_000_000_000,
) -> DataFrame:
    """The census→curve fold of :func:`nelson_aalen`, split out (the
    stream_census pattern): the ``(*groups, duration, d, c)`` census is
    a pair of associative counts, so a stream maintains it exactly-once
    and the whole hazard curve — at-risk depletion included —
    re-derives census-sized at read; a LATE subject revises one census
    row, which moves n_risk for every EARLIER duration's term, exactly
    the cross-row damage only the census fold re-derives."""
    if scale < 1:
        raise ValueError(f"scale must be positive, got {scale}")
    groups = group_cols or []
    from pyspark.sql import Window

    census = census.select(
        *groups,
        F.col(duration_col).cast("bigint").alias("__t"),
        F.col(events_col).cast("bigint").alias("__d"),
        F.col(censored_col).cast("bigint").alias("__c"),
    )
    w_all = Window.partitionBy(*groups) if groups else Window.partitionBy()
    w_cum = w_all.orderBy("__t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dc = F.col("__d") + F.col("__c")
    n_cap = (1 << 62) // scale
    seq = census.select(
        *groups,
        "__t",
        "__d",
        "__c",
        (
            F.sum(dc).over(w_all.orderBy("__t").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            ))
            - (F.sum(dc).over(w_cum) - dc)
        ).alias("__nr"),
    )
    guarded = seq.withColumn(
        "__nrok",
        F.when(F.col("__nr") < F.lit(n_cap), F.col("__nr")).otherwise(
            F.raise_error(
                F.lit(
                    f"nelson_aalen: group has >= {n_cap} subjects at "
                    "risk — scale*n_risk would overflow 64-bit; lower "
                    "scale"
                )
            )
        ),
    )
    term = F.when(
        F.col("__d") > 0,
        F.expr(f"({scale} * __d) div __nrok"),
    ).otherwise(F.lit(0).cast("bigint"))
    return (
        guarded.withColumn("__hz", term)
        .select(
            *groups,
            F.col("__t").alias("duration"),
            F.col("__nrok").cast("bigint").alias("n_risk"),
            F.col("__d").cast("bigint").alias("n_events"),
            F.col("__c").cast("bigint").alias("n_censored"),
            F.sum("__hz")
            .over(w_cum)
            .cast("bigint")
            .alias("cumhaz_scaled"),
        )
    )


def log_rank_test(
    df: DataFrame,
    *,
    duration_col: str,
    event_col: str,
    arm_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Exact two-sample log-rank test — "did arm B's survival curve
    differ from arm A's?", the censoring-correct A/B readout for
    time-to-event metrics (churn experiments, retention holdouts),
    where a naive mean-duration compare is biased by whoever happens
    to be censored first.

    At each pooled EVENT time t with d = d_a + d_b deaths out of
    n = n_a + n_b at risk, the hypergeometric null gives arm A an
    expected-death and variance contribution

        e_a = d * n_a / n
        v   = d * (n_a/n) * (n_b/n) * ((n-d)/(n-1))

    both kept EXACT in ppm by one truncating division per term:

        e_a_ppm = (1e6 * d * n_a) div n
        v_ppm   = (1e6 * d * n_a * n_b * (n-d)) div (n*n*(n-1))

    with the big products in DECIMAL(38,0) replayed verbatim by a
    HUGEINT oracle.  The statistic is chi2 = (O_a - E_a)^2 / V with
    S = 1e6*O_a - sum(e_a_ppm) (ppm-scaled, legitimately signed):

        chi2_milli = least((1000 * S * S) div (1e6 * sum(v_ppm)), 4e18)

    (the division runs in DECIMAL and saturates at 4e18 when V is
    tiny — a BIGINT quotient would wrap; the oracle replays the
    identical least())

    Degenerate groups never fake significance: one-armed groups or
    all-censored groups (V = 0) emit NULL chi2.  Truncation bias is
    < 1 ppm per event time, replayed identically by both engines —
    stated convention, not noise.

    Returns one row per group: ``(*group_cols, n_a, n_b, o_a,
    e_a_ppm, v_ppm, chi2_milli)``.

    Scale posture (100 TB): ONE combinable subject->(group, duration,
    per-arm d/c) census groupBy (the only data-sized shuffle), two
    window passes over CENSUS rows on the group key (per-arm at-risk
    depletion), one combinable census-sized groupBy, then per-group
    scalar algebra.  No join.

    Capacity guard: the binding product ``1e6 * d * n_a * n_b * (n-d)``
    ~ 1e6 * n^4 must stay inside DECIMAL(38,0); a DOUBLE envelope
    fail-fast (threaded into the consumed o_a, the rank_sum_test
    pattern) trips past 1e37 — groups to n ~ 1.8e8 subjects; beyond
    that, sample (the significance call is saturated at such n).

    Engine extension — the reference (exporter.py:75-141) has no
    survival tier; test per Mantel (1966) / Peto & Peto (1972) as in
    standard texts.
    """
    groups = group_cols or []
    for c in (duration_col, event_col, arm_col):
        if c in groups:
            raise ValueError(f"column {c!r} cannot also be a group column")
    from pyspark.sql import Window

    arm = F.col(arm_col)
    bad = arm.isNull() | ~arm.cast("bigint").isin(0, 1)
    arm_ok = F.when(~bad, arm.cast("bigint")).otherwise(
        F.raise_error(
            F.lit(
                "log_rank_test: arm must be 0/1 and non-NULL — a "
                "subject outside the experiment's frame has no curve; "
                "filter upstream"
            )
        ).cast("bigint")
    )
    checked = _checked_subjects(
        df,
        duration_col=duration_col,
        event_col=event_col,
        groups=groups,
        extra=[arm_ok.alias("__arm")],
    )
    census = checked.groupBy(*groups, "__t", "__arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n_tot"),
        F.sum("__e").cast("bigint").alias("__n_ev"),
    )
    return log_rank_from_census(census, group_cols=groups)


def log_rank_from_census(
    census: DataFrame,
    *,
    group_cols: list[str] | None = None,
    duration_col: str = "__t",
    arm_col: str = "__arm",
    total_col: str = "__n_tot",
    events_col: str = "__n_ev",
) -> DataFrame:
    """The census→statistic fold of :func:`log_rank_test`, split out
    (the stream_census pattern) over the LONG-form ``(*groups,
    duration, arm, n_tot, n_events)`` census — two associative counts
    per cell, so a stream maintains it exactly-once and O/E/V/chi2
    re-derive census-sized at read.  A LATE subject revises one cell,
    which moves the at-risk counts of every earlier event time — the
    cross-row coupling that forces the full fold.  ``arm`` must be
    0/1 (executor fail-fast)."""
    groups = group_cols or []
    from pyspark.sql import Window

    arm = F.col(arm_col)
    arm_ok = F.when(
        arm.isNotNull() & arm.cast("bigint").isin(0, 1),
        arm.cast("bigint"),
    ).otherwise(
        F.raise_error(
            F.lit(
                "log_rank_from_census: arm must be 0/1 and non-NULL"
            )
        ).cast("bigint")
    )
    long = census.select(
        *groups,
        F.col(duration_col).cast("bigint").alias("__t"),
        arm_ok.alias("__arm"),
        F.col(total_col).cast("bigint").alias("__n_tot"),
        F.col(events_col).cast("bigint").alias("__n_ev"),
    )
    census = long.groupBy(*groups, "__t").agg(
        F.sum(F.when(F.col("__arm") == 0, F.col("__n_ev")).otherwise(0)).alias("__da"),
        F.sum(F.when(F.col("__arm") == 1, F.col("__n_ev")).otherwise(0)).alias("__db"),
        F.sum(
            F.when(
                F.col("__arm") == 0, F.col("__n_tot") - F.col("__n_ev")
            ).otherwise(0)
        ).alias("__ca"),
        F.sum(
            F.when(
                F.col("__arm") == 1, F.col("__n_tot") - F.col("__n_ev")
            ).otherwise(0)
        ).alias("__cb"),
    )
    w_all = Window.partitionBy(*groups) if groups else Window.partitionBy()
    w_tot = w_all.orderBy("__t").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_cum = w_all.orderBy("__t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dca = F.col("__da") + F.col("__ca")
    dcb = F.col("__db") + F.col("__cb")
    at_risk = census.select(
        *groups,
        "__t",
        "__da",
        "__db",
        (F.sum(dca).over(w_tot) - (F.sum(dca).over(w_cum) - dca)).alias("__na"),
        (F.sum(dcb).over(w_tot) - (F.sum(dcb).over(w_cum) - dcb)).alias("__nb"),
    )
    # per-event-time ppm terms in DECIMAL(38,0); censoring-only times
    # (d = 0) contribute zero terms but have already moved the at-risk
    # counts above.  `div` is the truncating integral division the
    # HUGEINT oracle replays with `//` (all operands non-negative).
    dec = "cast({} as decimal(38,0))"
    da, db_, na_, nb_ = (
        dec.format("__da"),
        dec.format("__db"),
        dec.format("__na"),
        dec.format("__nb"),
    )
    d_s = f"({da} + {db_})"
    n_s = f"({na_} + {nb_})"
    terms = at_risk.select(
        *groups,
        F.col("__da").cast("bigint").alias("__oa"),
        F.col("__na").cast("bigint").alias("__sa"),
        F.col("__nb").cast("bigint").alias("__sb"),
        F.expr(
            f"CASE WHEN {d_s} > 0 THEN (1000000 * {d_s} * {na_}) div {n_s} "
            "ELSE 0 END"
        )
        .cast("decimal(38,0)")
        .alias("__e_ppm"),
        F.expr(
            f"CASE WHEN {d_s} > 0 AND {n_s} > 1 THEN "
            f"(1000000 * {d_s} * {na_} * {nb_} * ({n_s} - {d_s})) div "
            f"({n_s} * {n_s} * ({n_s} - 1)) ELSE 0 END"
        )
        .cast("decimal(38,0)")
        .alias("__v_ppm"),
        # DOUBLE envelope on the binding product, threaded into the
        # consumed __oa factor so Catalyst cannot prune the guard
        F.when(
            (
                F.lit(1e6)
                * (F.col("__da") + F.col("__db")).cast("double")
                * F.col("__na").cast("double")
                * F.col("__nb").cast("double")
                * (F.col("__na") + F.col("__nb")).cast("double")
            )
            <= F.lit(1e37),
            F.lit(1),
        )
        .otherwise(
            F.raise_error(
                F.lit(
                    "log_rank_test: a variance operand exceeds the 1e37 "
                    "DECIMAL(38,0) envelope — sample subjects (the "
                    "significance call is saturated at such n)"
                )
            ).cast("int")
        )
        .alias("__ok"),
    )
    # n_a/n_b per group = the at-risk counts at the EARLIEST duration
    # (everyone is at risk before the first exit) = the MAX at-risk
    # reading, since at-risk is non-increasing in duration
    g = terms.groupBy(*groups).agg(
        F.max(F.col("__sa") * F.col("__ok")).cast("bigint").alias("n_a"),
        F.max("__sb").cast("bigint").alias("n_b"),
        F.sum("__oa").cast("bigint").alias("o_a"),
        F.sum("__e_ppm").cast("decimal(38,0)").alias("__se"),
        F.sum("__v_ppm").cast("decimal(38,0)").alias("__sv"),
    )
    # S = 1e6*O_a - sum(e_ppm), legitimately signed; chi2's numerator
    # S*S is non-negative, so truncating div and floor // agree
    se, sv = dec.format("__se"), dec.format("__sv")
    oa = dec.format("o_a")
    s_expr = f"(1000000 * {oa} - {se})"
    return g.select(
        *groups,
        "n_a",
        "n_b",
        "o_a",
        F.col("__se").cast("bigint").alias("e_a_ppm"),
        F.col("__sv").cast("bigint").alias("v_ppm"),
        F.expr(
            f"CASE WHEN {sv} > 0 THEN "
            + _sat_div_sql(
                f"1000 * {s_expr} * {s_expr}", f"(1000000 * {sv})"
            )
            + " END"
        ).alias("chi2_milli"),
    )
