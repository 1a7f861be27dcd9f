"""Event / user / sketch analytics query catalog (split from
queries_analytics.py in round 12 — the event-analytics tier had grown
past reviewable size inside the SQL-analytics module; zero behavior
change, same @register calls).

SCD2 history, funnels, retention/LTV cohorts, sessionization,
throttling, stickiness, survival, transition matrices, gap-fill,
per-hour trends and anomalies, OHLC/EWMA downsampling, spatial
pairs/KNN, skylines, the sketch tier (CM/KMV/theta/HDR), table
profiling/expectations, Benford and momentum screens.  See queries.py
for the shared determinism contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators.intervals import asof_lookup
from .registry import cents, register
from .tables import load_table, spread


@register(
    "user_scd2_history",
    # headline: the SCD2 window build is the dimension-maintenance cost
    # the warehouse tier pays per CDC fold
    """
    WITH scd_ev AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
        FROM events
    ),
    scd_flags AS (
        SELECT user_id, ts_us, event_id, event_type,
               -- first row per key is ALWAYS a change (lag(1) IS NULL
               -- detects it even when the tracked value itself is NULL)
               lag(1) OVER w IS NULL
               OR lag(event_type) OVER w IS DISTINCT FROM event_type AS chg
        FROM scd_ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ),
    scd_grouped AS (
        SELECT *, sum(CASE WHEN chg THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                        ROWS UNBOUNDED PRECEDING) AS run_id
        FROM scd_flags
    ),
    scd_seen AS (
        SELECT user_id, run_id, max(ts_us) AS last_seen_us
        FROM scd_grouped GROUP BY user_id, run_id
    ),
    scd_runs AS (
        SELECT r.user_id, r.ts_us, r.event_id, r.event_type, s.last_seen_us
        FROM scd_grouped r
        JOIN scd_seen s USING (user_id, run_id)
        WHERE r.chg
    )
    SELECT user_id, event_type, version, valid_from_us, valid_to_us,
           last_seen_us, valid_to_us IS NULL AS is_current
    FROM (
        SELECT user_id, event_type, ts_us AS valid_from_us,
               row_number() OVER w2 AS version,
               lead(ts_us) OVER w2 AS valid_to_us,
               last_seen_us
        FROM scd_runs
        WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    )
    """,
    headline=True,
)
def q_user_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension history (operators/scd.py scd2_build): each
    user's event_type stream collapses into attribute versions with
    [valid_from, valid_to) µs bounds plus last_seen (the version's last
    observation — the lossless run-boundary summary scd2_apply's
    log-less mode depends on), consecutive no-change observations
    merged, lag/lead over one (ts, event_id)-total order.  ONE hash
    shuffle on the dimension key — all windows share partitioning and
    ordering, so Catalyst reuses the sort (plan-gated).  The oracle
    replays the run algebra through an INDEPENDENT formulation (running
    run-id sum + per-run max, vs the operator's forward-first pull)."""
    from .operators.scd import scd2_build

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        # ts is TIMESTAMP_NTZ (naive fixtures); unix_micros needs TIMESTAMP
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_type",
    )
    return scd2_build(
        e,
        key="user_id",
        tracked=["event_type"],
        ts_col="ts_us",
        order_extra=["event_id"],
        from_col="valid_from_us",
        to_col="valid_to_us",
        seen_col="last_seen_us",
    ).select(
        "user_id", "event_type", "version", "valid_from_us",
        "valid_to_us", "last_seen_us", "is_current",
    )


@register(
    "event_funnel",
    # headline-adjacent event-analytics tier: 3-step first-touch funnel
    """
    WITH f_ev AS (
        SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
    ),
    f_s1 AS (
        SELECT user_id, min(ts_us) AS t1_us
        FROM f_ev WHERE event_type = 'view' GROUP BY user_id
    ),
    f_s2 AS (
        SELECT s.user_id, s.t1_us, min(e.ts_us) AS t2_us
        FROM f_s1 s LEFT JOIN f_ev e
          ON e.user_id = s.user_id AND e.event_type = 'click'
         AND e.ts_us > s.t1_us AND e.ts_us <= s.t1_us + 1800000000
        GROUP BY s.user_id, s.t1_us
    ),
    f_s3 AS (
        SELECT s.user_id, s.t1_us, s.t2_us, min(e.ts_us) AS t3_us
        FROM f_s2 s LEFT JOIN f_ev e
          ON e.user_id = s.user_id AND e.event_type = 'purchase'
         AND e.ts_us > s.t2_us AND e.ts_us <= s.t2_us + 1800000000
        GROUP BY s.user_id, s.t1_us, s.t2_us
    )
    SELECT user_id, t1_us, t2_us, t3_us,
           CAST(t1_us IS NOT NULL AS BIGINT)
           + CAST(t2_us IS NOT NULL AS BIGINT)
           + CAST(t3_us IS NOT NULL AS BIGINT) AS steps_completed,
           t3_us IS NOT NULL AS converted
    FROM f_s3
    """,
    headline=True,
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch 3-step funnel (operators/funnel.py funnel_match):
    view -> click -> purchase, each step the earliest qualifying event
    within 30 minutes of the previous — the Amplitude-default conversion
    semantic as k-1 conditional min-fold joins, all hash-partitioned on
    the SAME user key (a bucketed event table pays one shuffle total).
    Exact BIGINT µs; the oracle replays the identical chain."""
    from .operators.funnel import funnel_match

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    return funnel_match(
        e,
        steps=["view", "click", "purchase"],
        within_us=1_800_000_000,
    )


@register(
    "user_retention_cohorts",
    """
    WITH r_ev AS (
        SELECT user_id, epoch_us(ts) AS ts_us FROM events
    ),
    r_first AS (
        SELECT user_id, min(ts_us) // 604800000000 AS cohort_week
        FROM r_ev GROUP BY user_id
    ),
    r_active AS (
        SELECT DISTINCT user_id, ts_us // 604800000000 AS active_week
        FROM r_ev
    )
    SELECT f.cohort_week, a.active_week - f.cohort_week AS week_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM r_active a JOIN r_first f ON a.user_id = f.user_id
    GROUP BY f.cohort_week, a.active_week - f.cohort_week
    """,
)
def q_user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention (operators/funnel.py cohort_retention):
    cohort = epoch-week of first event (exact BIGINT division), one cell
    per (cohort_week, week_offset) counting distinct returning users.
    Two combinable groupBys — per-user first-week, then the cell count;
    the oracle replays both with `//`."""
    from .operators.funnel import cohort_retention

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    return cohort_retention(e)


@register(
    "user_cohort_ltv",
    """
    WITH lv_e AS (
        SELECT user_id, epoch_us(ts) // 604800000000 AS w,
               CASE WHEN event_type = 'purchase'
                    THEN CAST(floor(value * 1000) AS BIGINT) END AS vq
        FROM events
    ),
    lv_f AS (
        SELECT user_id, min(w) AS cw FROM lv_e GROUP BY user_id
    ),
    lv_s AS (
        SELECT cw AS cohort_week, CAST(count(*) AS BIGINT) AS n_cohort_users
        FROM lv_f GROUP BY cw
    ),
    lv_w AS (
        SELECT user_id, w, CAST(coalesce(sum(vq), 0) AS BIGINT) AS rev
        FROM lv_e GROUP BY user_id, w
    ),
    lv_c AS (
        SELECT f.cw AS cohort_week, wk.w - f.cw AS week_offset,
               CAST(count(DISTINCT wk.user_id) AS BIGINT) AS active_users,
               CAST(sum(wk.rev) AS BIGINT) AS revenue_milli
        FROM lv_w wk JOIN lv_f f USING (user_id)
        GROUP BY 1, 2
    ),
    lv_r AS (
        SELECT *,
               CAST(sum(revenue_milli) OVER (
                   PARTITION BY cohort_week ORDER BY week_offset
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_revenue_milli
        FROM lv_c
    )
    SELECT r.cohort_week, r.week_offset, s.n_cohort_users,
           r.active_users, r.revenue_milli, r.cum_revenue_milli,
           r.cum_revenue_milli // s.n_cohort_users AS ltv_per_user_milli
    FROM lv_r r JOIN lv_s s USING (cohort_week)
    """,
    headline=True,
)
def q_user_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort LTV triangle (operators/funnel.py cohort_ltv —
    the revenue sibling of cohort_retention): cohort = epoch-week of
    first event, revenue = purchase values in exact milli (non-purchase
    activity marks the user active at zero revenue), cumulative LTV
    per cohort user as a truncating division.  Two event-sized
    combinable groupBys + one user-keyed join; the running sum and the
    per-user division run over CENSUS cells (cohorts x ages), replayed
    verbatim by the oracle."""
    from .operators.funnel import cohort_ltv

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.when(
            F.col("event_type") == "purchase",
            F.floor(F.col("value") * 1000).cast("long"),
        ).alias("vq"),
    )
    return cohort_ltv(e)


@register(
    "event_session_funnel",
    """
    WITH sf_ev AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        FROM events
    ),
    sf_fl AS (
        SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
                         OR ts_us - lag(ts_us) OVER w > 1800000000
                       THEN 1 ELSE 0 END AS nf
        FROM sf_ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ),
    sf_sx AS (
        SELECT *, sum(nf) OVER (
            PARTITION BY user_id ORDER BY ts_us, event_id
            ROWS UNBOUNDED PRECEDING) AS sidx
        FROM sf_fl
    ),
    sf_k AS (
        SELECT CAST(user_id AS VARCHAR) || '#' || CAST(sidx AS VARCHAR)
                   AS sk,
               event_type, ts_us
        FROM sf_sx
    ),
    sf_s1 AS (
        SELECT sk, min(ts_us) AS t1
        FROM sf_k WHERE event_type = 'view' GROUP BY sk
    ),
    sf_s2 AS (
        SELECT s.sk, s.t1, min(e.ts_us) AS t2
        FROM sf_s1 s LEFT JOIN sf_k e
          ON e.sk = s.sk AND e.event_type = 'click'
         AND e.ts_us > s.t1 AND e.ts_us <= s.t1 + 1800000000
        GROUP BY s.sk, s.t1
    ),
    sf_s3 AS (
        SELECT s.sk, s.t1, s.t2, min(e.ts_us) AS t3
        FROM sf_s2 s LEFT JOIN sf_k e
          ON e.sk = s.sk AND e.event_type = 'purchase'
         AND e.ts_us > s.t2 AND e.ts_us <= s.t2 + 1800000000
        GROUP BY s.sk, s.t1, s.t2
    )
    SELECT CAST(1 AS BIGINT) + CAST(t2 IS NOT NULL AS BIGINT)
               + CAST(t3 IS NOT NULL AS BIGINT) AS steps_completed,
           CAST(count(*) AS BIGINT) AS n_sessions
    FROM sf_s3 GROUP BY 1
    """,
    headline=True,
)
def q_event_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-SCOPED funnel — the composition the per-user funnel
    cannot express: view -> click -> purchase must complete inside ONE
    gap-rule session (operators/funnel.py assign_sessions feeding
    funnel_match keyed on (user, session)), the "did the visit
    convert?" report.  Census output: sessions that started the funnel,
    by steps completed.  The oracle replays the session assignment
    (same tie-broken running-sum window), the chain min-folds and the
    census.  Scale shape: ONE user-keyed window shuffle + the funnel's
    session-keyed min-fold joins + a 3-row census groupBy."""
    from .operators.funnel import assign_sessions, funnel_match

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    sessed = assign_sessions(
        e, gap_us=1_800_000_000, order_extra=["event_id"]
    ).select(
        F.concat(
            F.col("user_id").cast("string"),
            F.lit("#"),
            F.col("session_idx").cast("string"),
        ).alias("sk"),
        "event_type",
        "ts_us",
    ).localCheckpoint(eager=False)
    # ^ lazy cut (r13): funnel_match references its input once per step,
    # so without it the sessionization subtree (user-keyed exchange +
    # sort + two windows) executed three times — the executed plan
    # carried three copies of the scan->window chain.
    fun = funnel_match(
        sessed,
        steps=["view", "click", "purchase"],
        within_us=1_800_000_000,
        user_col="sk",
    )
    return fun.groupBy("steps_completed").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions")
    )


@register(
    "events_throttle",
    """
    WITH th_e AS (
        SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us
        FROM events
    ),
    th_f AS (
        SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
                         OR ts_us - lag(ts_us) OVER w > 86400000000
                       THEN 1 ELSE 0 END AS nf
        FROM th_e
        WINDOW w AS (
            PARTITION BY user_id, event_type ORDER BY ts_us, event_id)
    ),
    th_s AS (
        SELECT *, sum(nf) OVER (
            PARTITION BY user_id, event_type ORDER BY ts_us, event_id
            ROWS UNBOUNDED PRECEDING) AS sidx
        FROM th_f
    ),
    th_b AS (
        SELECT *, count(*) OVER wb AS burst_len,
               max(ts_us) OVER wb AS burst_end_us,
               row_number() OVER (
                   PARTITION BY user_id, event_type, sidx
                   ORDER BY ts_us, event_id) AS rn
        FROM th_s
        WINDOW wb AS (PARTITION BY user_id, event_type, sidx)
    )
    SELECT user_id, event_type, event_id, ts_us,
           CAST(burst_len AS BIGINT) AS burst_len, burst_end_us
    FROM th_b WHERE rn = 1
    """,
    headline=True,
)
def q_events_throttle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-rule burst dedup / throttling (operators/funnel.py
    throttle_events): per (user, event type), keep only the first
    event of each burst (successor within 24h of its predecessor) with
    the absorbed count — the telemetry-cleaning collapse of retry
    storms and at-least-once duplicates.  The oracle replays the
    tie-broken gap flags, the running-sum burst ids and the keep rule
    verbatim.  ONE window shuffle on the (user, type) key; the burst
    windows reuse the same partitioning."""
    from .operators.funnel import throttle_events

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    return throttle_events(
        e,
        gap_us=86_400_000_000,
        key_cols=["user_id", "event_type"],
        order_extra=["event_id"],
    )


@register(
    "events_stickiness",
    """
    WITH dm_c AS (
        SELECT DISTINCT user_id AS u, epoch_us(ts) // 86400000000 AS d
        FROM events
    ),
    dm_dau AS (
        SELECT d AS day, CAST(count(*) AS BIGINT) AS dau
        FROM dm_c GROUP BY d
    ),
    dm_max AS (SELECT max(d) AS maxd FROM dm_c),
    dm_served AS (
        SELECT DISTINCT u, day FROM (
            SELECT u,
                   unnest(generate_series(d, least(d + 6, m.maxd)))
                       AS day
            FROM dm_c, dm_max m)
    ),
    dm_mau AS (
        SELECT day, CAST(count(*) AS BIGINT) AS mau
        FROM dm_served GROUP BY day
    )
    SELECT a.day, a.dau, m.mau,
           CAST((1000 * a.dau) // m.mau AS BIGINT) AS stickiness_milli
    FROM dm_dau a JOIN dm_mau m USING (day)
    """,
    headline=True,
)
def q_events_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DAU / rolling-7-day-active engagement stickiness per day
    (operators/stats.py dau_mau_stickiness): the sliding DISTINCT does
    not decompose as a sum, so the (user, day) census — never events —
    fans out to the <= 7 days each activity row serves and is
    distinct-counted per day.  The oracle replays census, fan-out cap
    and both distinct counts."""
    from .operators.stats import dau_mau_stickiness

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    return dau_mau_stickiness(e, window_days=7)


@register(
    "user_churn_survival",
    """
    WITH RECURSIVE sv_ev AS (
        SELECT user_id, epoch_us(ts) AS tus FROM events
    ),
    sv_end AS (SELECT max(tus) AS end_us FROM sv_ev),
    sv_usr AS (
        SELECT user_id, min(tus) AS first_us, max(tus) AS last_us
        FROM sv_ev GROUP BY user_id
    ),
    sv_dur AS (
        SELECT u.first_us // 604800000000 AS cohort_week,
               CASE WHEN e.end_us - u.last_us > 604800000000
                    THEN (u.last_us - u.first_us) // 86400000000
                    ELSE (e.end_us - u.first_us) // 86400000000
               END AS t,
               CASE WHEN e.end_us - u.last_us > 604800000000
                    THEN 1 ELSE 0 END AS ev
        FROM sv_usr u, sv_end e
    ),
    sv_census AS (
        SELECT cohort_week, t, CAST(sum(ev) AS BIGINT) AS d,
               CAST(count(*) - sum(ev) AS BIGINT) AS c
        FROM sv_dur GROUP BY cohort_week, t
    ),
    sv_seq AS (
        SELECT *,
               row_number() OVER (PARTITION BY cohort_week ORDER BY t)
                   AS rn,
               CAST(sum(d + c) OVER (PARTITION BY cohort_week) AS BIGINT)
                   AS n
        FROM sv_census
    ),
    sv_km AS (
        SELECT cohort_week, rn, t, n AS n_risk, d, c,
               CASE WHEN d > 0 THEN (1000000000 * (n - d)) // n
                    ELSE CAST(1000000000 AS BIGINT) END AS s,
               n - d - c AS rem
        FROM sv_seq WHERE rn = 1
        UNION ALL
        SELECT s2.cohort_week, s2.rn, s2.t, k.rem AS n_risk, s2.d, s2.c,
               CASE WHEN s2.d > 0
                    THEN (k.s * (k.rem - s2.d)) // k.rem
                    ELSE k.s END AS s,
               k.rem - s2.d - s2.c AS rem
        FROM sv_km k JOIN sv_seq s2
          ON s2.cohort_week = k.cohort_week AND s2.rn = k.rn + 1
    )
    SELECT cohort_week, t AS duration, n_risk,
           d AS n_events, c AS n_censored,
           CAST(s AS BIGINT) AS survival_scaled
    FROM sv_km
    """,
    headline=True,
)
def q_user_churn_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier churn survival by signup-week cohort
    (operators/survival.py km_survival): per user, age = days from
    first to last event if CHURNED (inactive > 7 days at the study
    end) else days from first event to the study end (right-CENSORED
    — the user is still alive, the naive curve would bias low).  The
    survival level is an exact nano-scaled stepwise truncating
    product, so the DuckDB recursive-CTE oracle replays the identical
    fold bit-for-bit.

    Scale shape: one user-keyed groupBy (the data-sized shuffle), a
    broadcast one-row study-end join, then the KM fold over the
    (cohort, day) CENSUS — bounded by the observation window, never by
    users."""
    from .operators.survival import km_survival

    WEEK_US = 604_800_000_000
    DAY_US = 86_400_000_000
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    usr = e.groupBy("user_id").agg(
        F.min("ts_us").alias("__first"), F.max("ts_us").alias("__last")
    )
    end = e.agg(F.max("ts_us").alias("__end"))
    churned = F.col("__end") - F.col("__last") > F.lit(WEEK_US)
    subj = usr.crossJoin(F.broadcast(end)).select(
        F.expr(f"__first div {WEEK_US}").alias("cohort_week"),
        F.when(
            churned, F.expr(f"(__last - __first) div {DAY_US}")
        )
        .otherwise(F.expr(f"(__end - __first) div {DAY_US}"))
        .alias("__t"),
        churned.cast("bigint").alias("__ev"),
    )
    return km_survival(
        subj,
        duration_col="__t",
        event_col="__ev",
        group_cols=["cohort_week"],
    )


@register(
    "event_transition_matrix",
    """
    WITH t_ev AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
        FROM events
    ),
    t_pairs AS (
        SELECT lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id
               ) AS from_type,
               event_type AS to_type
        FROM t_ev
    ),
    t_counts AS (
        SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_transitions
        FROM t_pairs WHERE from_type IS NOT NULL
        GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n_transitions,
           (1000 * n_transitions)
             // CAST(sum(n_transitions) OVER (PARTITION BY from_type) AS BIGINT)
             AS prob_milli
    FROM t_counts
    """,
)
def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    stream (operators/funnel.py transition_matrix): ONE window shuffle
    on the user key, then a combinable groupBy on the tiny type-pair
    space; probabilities as exact integer milli-ratios (truncating
    division both engines)."""
    from .operators.funnel import transition_matrix

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_type",
    )
    return transition_matrix(e, order_extra=["event_id"])


@register(
    "event_sessions",
    """
    WITH sz_ev AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
    ),
    sz_flag AS (
        SELECT user_id, ts_us, event_id,
               CASE WHEN lag(ts_us) OVER w IS NULL
                         OR ts_us - lag(ts_us) OVER w > 1800000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM sz_ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ),
    sz_idx AS (
        SELECT user_id, ts_us,
               CAST(sum(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS UNBOUNDED PRECEDING
               ) AS BIGINT) AS session_idx
        FROM sz_flag
    )
    SELECT user_id, session_idx,
           min(ts_us) AS start_us, max(ts_us) AS end_us,
           CAST(count(*) AS BIGINT) AS n_events,
           max(ts_us) - min(ts_us) AS duration_us
    FROM sz_idx
    GROUP BY user_id, session_idx
    """,
    headline=True,
)
def q_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-rule batch sessionization (operators/funnel.py sessionize):
    30-minute inactivity gap, one row per (user, session) with exact
    BIGINT bounds/duration.  ONE shuffle total — the running-sum window
    hash-partitions on the user key and the per-session groupBy reuses
    that partitioning (clustering keys are a superset; plan-gated).
    The oracle replays the identical lag -> flag -> running-sum ->
    groupBy algebra."""
    from .operators.funnel import sessionize

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    return sessionize(e, gap_us=1_800_000_000, order_extra=["event_id"])


@register(
    "events_gapfill",
    """
    WITH gf_obs AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us, value AS v
        FROM events WHERE event_type = 'purchase'
    ),
    gf_rep AS (
        SELECT user_id, bucket, v FROM (
            SELECT user_id, ts_us // 21600000000 AS bucket, v,
                   row_number() OVER (
                       PARTITION BY user_id, ts_us // 21600000000
                       ORDER BY ts_us DESC, event_id DESC
                   ) AS rn
            FROM gf_obs
        ) WHERE rn = 1
    ),
    gf_span AS (
        SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
        FROM gf_rep GROUP BY user_id
    ),
    gf_grid AS (
        SELECT user_id, unnest(generate_series(lo, hi)) AS bucket
        FROM gf_span
    ),
    gf_j AS (
        SELECT g.user_id, g.bucket, r.v
        FROM gf_grid g LEFT JOIN gf_rep r USING (user_id, bucket)
    )
    SELECT user_id, bucket * 21600000000 AS bucket_ts_us,
           last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY bucket
               ROWS UNBOUNDED PRECEDING
           ) AS value_filled,
           v IS NOT NULL AS is_observed
    FROM gf_j
    """,
)
def q_events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-grid resample + forward fill (operators/timeseries.py
    gapfill): each user's purchase `value` series on a 6-hour grid
    between the user's first and last purchase, missing cells carried
    forward from the latest earlier observation.  Exact BIGINT buckets;
    observed doubles are copied verbatim (never recomputed) so the hash
    compare holds.  The oracle replays the identical rep-selection /
    grid / LOCF-window algebra."""
    from .operators.timeseries import gapfill

    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "value",
        )
    )
    return gapfill(
        e,
        step_us=21_600_000_000,
        key_col="user_id",
        ts_col="ts_us",
        value_col="value",
        tie_cols=["event_id"],
    )


def _profile_oracle() -> str:
    cols = [("doc_id", False), ("text", True), ("lang", True),
            ("source", True), ("n_chars", False)]
    parts = []
    for c, is_str in cols:
        if is_str:
            extra = (
                f"CAST(count(CASE WHEN {c} = '' THEN 1 END) AS BIGINT) AS n_empty, "
                f"CAST(min(length({c})) AS BIGINT) AS min_len, "
                f"CAST(max(length({c})) AS BIGINT) AS max_len"
            )
        else:
            extra = (
                "CAST(NULL AS BIGINT) AS n_empty, "
                "CAST(NULL AS BIGINT) AS min_len, "
                "CAST(NULL AS BIGINT) AS max_len"
            )
        parts.append(
            f"SELECT '{c}' AS column_name, "
            f"CAST(count(*) AS BIGINT) AS n_rows, "
            f"CAST(count(*) - count({c}) AS BIGINT) AS n_nulls, "
            f"CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct, "
            f"{extra} FROM documents"
        )
    return " UNION ALL ".join(parts)


@register(
    "event_sequence_match",
    """
    WITH sm_ev AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CASE event_type WHEN 'view' THEN 'v'
                               WHEN 'click' THEN 'c'
                               WHEN 'purchase' THEN 'p' END AS ch
        FROM events
        WHERE event_type IN ('view', 'click', 'purchase')
    ),
    sm_seq AS (
        SELECT user_id,
               string_agg(ch, '' ORDER BY ts_us, event_id) AS seq
        FROM sm_ev GROUP BY user_id
    )
    SELECT user_id, CAST(length(seq) AS BIGINT) AS seq_len,
           regexp_matches(seq, 'v.*c.*p') AS matched
    FROM sm_seq
    """,
)
def q_event_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse sequenceMatch-class subsequence search
    (operators/funnel.py sequence_match): per-user time-ordered type
    string (array_sort over a (ts, tie) total order — partitioning-
    independent), regex 'v.*c.*p' = saw a view, later a click, later a
    purchase, any gaps.  One map-side-combinable user-key groupBy; the
    oracle replays via ORDER BY string_agg + regexp."""
    from .operators.funnel import sequence_match

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_type",
    )
    return sequence_match(
        e,
        pattern="v.*c.*p",
        type_map={"view": "v", "click": "c", "purchase": "p"},
        tie_cols=["event_id"],
    )


@register(
    "events_hourly_trend",
    """
    WITH tr_h AS (
        SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY event_type, epoch_us(ts) // 3600000000
    ),
    tr_s AS (
        SELECT event_type,
               CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(hr) AS HUGEINT) AS sx,
               CAST(sum(c) AS HUGEINT) AS sy,
               CAST(sum(hr * c) AS HUGEINT) AS sxy,
               CAST(sum(hr * hr) AS HUGEINT) AS sxx
        FROM tr_h GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           CAST(sx AS BIGINT) AS sum_x,
           CAST(sy AS BIGINT) AS sum_y,
           CASE WHEN n * sxx - sx * sx > 0 THEN
               CAST((1000 * (n * sxy - sx * sy)) // (n * sxx - sx * sx)
                    AS BIGINT)
           END AS slope_milli,
           CAST((1000 * sx) // n AS BIGINT) AS mean_x_milli,
           CAST((1000 * sy) // n AS BIGINT) AS mean_y_milli
    FROM tr_s
    """,
)
def q_events_hourly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS trend of hourly event counts
    (operators/stats.py linear_trend): exact-integer sufficient
    statistics in DECIMAL(38,0) with the slope as a truncated
    milli-ratio — both engines' integer division truncates toward zero,
    so falling trends replay exactly.  Two combinable groupBys; the
    shuffle payload is five sums per (type, hour) cell."""
    from .operators.stats import linear_trend

    hourly = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr(
                "unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000"
            ).alias("hr"),
        )
        .groupBy("event_type", "hr")
        .agg(F.count("*").alias("c"))
    )
    return linear_trend(
        hourly, x_col="hr", y_col="c", group_cols=["event_type"]
    )


@register(
    "events_anomalous_hours",
    """
    WITH an_h AS (
        SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY event_type, epoch_us(ts) // 3600000000
    ),
    an_r AS (
        SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY c) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM an_h
    ),
    an_m AS (
        SELECT event_type,
               CAST(sum(c * (CAST(rn = (n + 1) // 2 AS BIGINT)
                             + CAST(rn = n // 2 + 1 AS BIGINT))) AS BIGINT)
                   AS med2
        FROM an_r GROUP BY event_type
    ),
    an_d AS (
        SELECT h.event_type, h.hr, h.c, m.med2,
               abs(2 * h.c - m.med2) AS dev2
        FROM an_h h JOIN an_m m USING (event_type)
    ),
    an_dr AS (
        SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY dev2) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM an_d
    ),
    an_mad AS (
        SELECT event_type,
               CAST(sum(dev2 * (CAST(rn = (n + 1) // 2 AS BIGINT)
                                + CAST(rn = n // 2 + 1 AS BIGINT))) AS BIGINT)
                   AS mad4
        FROM an_dr GROUP BY event_type
    )
    SELECT d.event_type, d.hr, d.c, d.med2, d.dev2, a.mad4,
           2000 * d.dev2 > 3000 * a.mad4 AS is_anomaly
    FROM an_d d JOIN an_mad a USING (event_type)
    """,
)
def q_events_anomalous_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust median/MAD anomaly screen over hourly event counts
    (operators/stats.py mad_anomaly): flags hours whose count deviates
    from the per-type median by more than 3 MADs, computed EXACTLY —
    2*median and 4*MAD are integer order-statistic sums and the flag is
    the cross-multiplication 2000*dev2 > 3000*mad4, so no float median
    interpolation can diverge between engines.  The oracle replays the
    identical rank algebra."""
    from .operators.stats import mad_anomaly

    hourly = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr(
                "unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000"
            ).alias("hr"),
        )
        .groupBy("event_type", "hr")
        .agg(F.count("*").alias("c"))
    )
    return mad_anomaly(
        hourly, x_col="c", group_cols=["event_type"], k_milli=3000
    )


@register(
    "events_ohlc",
    """
    WITH oh AS (
        SELECT event_type, epoch_us(ts) // 21600000000 AS bucket, value,
               row_number() OVER (
                   PARTITION BY event_type, epoch_us(ts) // 21600000000
                   ORDER BY epoch_us(ts), event_id) AS rn,
               count(*) OVER (
                   PARTITION BY event_type, epoch_us(ts) // 21600000000) AS n
        FROM events
    )
    SELECT event_type, bucket,
           max(CASE WHEN rn = 1 THEN value END) AS open,
           max(value) AS high,
           min(value) AS low,
           max(CASE WHEN rn = n THEN value END) AS close,
           CAST(count(*) AS BIGINT) AS n_events
    FROM oh GROUP BY event_type, bucket
    """,
)
def q_events_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candlestick (OHLC) downsampling of the event value stream
    (operators/timeseries.py ohlc): per event type and 6-hour bucket,
    the first/max/min/last value plus the event count.  First/last are
    by the total order (ts, event_id) so the result is partitioning-
    independent; values are copied verbatim (no arithmetic), so the
    doubles hash identically in both engines."""
    from .operators.timeseries import ohlc

    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "value",
    )
    return ohlc(
        e,
        ts_col="ts_us",
        value_col="value",
        step_us=21_600_000_000,
        key_cols=["event_type"],
        tie_cols=["event_id"],
    )


@register(
    "events_ewma",
    """
    WITH ew AS (
        SELECT event_type, event_id, epoch_us(ts) AS ts_us,
               CAST(round(value * 1000000) AS BIGINT) AS x,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY epoch_us(ts), event_id) AS rn
        FROM events
    )
    SELECT a.event_type, a.ts_us, a.event_id,
           CAST(a.rn - greatest(1, a.rn - 31) + 1 AS INT) AS n_frame,
           CAST(sum(b.x * (CAST(1 AS BIGINT)
                    << CAST(b.rn - greatest(1, a.rn - 31) AS INT)))
               AS BIGINT) AS ewma_num,
           (CAST(1 AS BIGINT)
                << CAST(a.rn - greatest(1, a.rn - 31) + 1 AS INT))
               - 1 AS ewma_den,
           (CAST(CAST(sum(b.x * (CAST(1 AS BIGINT)
                    << CAST(b.rn - greatest(1, a.rn - 31) AS INT)))
                 AS BIGINT) AS DOUBLE)
            / CAST((CAST(1 AS BIGINT)
                << CAST(a.rn - greatest(1, a.rn - 31) + 1 AS INT)) - 1
               AS DOUBLE)) / 1000000.0 AS ewma
    FROM ew a JOIN ew b
      ON b.event_type = a.event_type
     AND b.rn BETWEEN a.rn - 31 AND a.rn
    GROUP BY a.event_type, a.ts_us, a.event_id, a.rn
    """,
)
def q_events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact exponentially-weighted moving average of the event value
    stream (operators/timeseries.py ewma_half): per event type, the
    decay-1/2 EWMA over the last 32 observations in (ts, event_id)
    order.  The binary-fraction trick makes it engine-exact — weights
    become powers of two after a common rescale, numerator/denominator
    are BIGINT sums, and the final value is one double division — so
    the hash compare covers the doubles too.  The oracle is an
    INDEPENDENT formulation (bounded rank-range self-join with shift
    weights) of the same algebra; the Spark side is a single
    partition-window fold with no join."""
    from .operators.timeseries import ewma_half

    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "value",
    )
    return ewma_half(
        e,
        ts_col="ts_us",
        value_col="value",
        key_cols=["event_type"],
        tie_cols=["event_id"],
        horizon=32,
        quant_scale=1_000_000,
    )


@register(
    "events_scd2_enrich",
    """
    WITH en_ev AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
        FROM events
    ),
    en_flags AS (
        SELECT user_id, ts_us, event_id, event_type,
               lag(1) OVER w IS NULL
               OR lag(event_type) OVER w IS DISTINCT FROM event_type AS chg
        FROM en_ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ),
    en_hist AS (
        SELECT user_id, event_type AS state_type, ts_us AS valid_from_us,
               row_number() OVER w2 AS version,
               lead(ts_us) OVER w2 AS valid_to_us
        FROM en_flags WHERE chg
        WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    )
    SELECT p.event_id, p.user_id, p.ts_us, h.state_type, h.version,
           h.valid_from_us
    FROM en_ev p
    JOIN en_hist h
      ON h.user_id = p.user_id
     AND h.valid_from_us <= p.ts_us
     AND (h.valid_to_us IS NULL OR p.ts_us < h.valid_to_us)
    WHERE p.event_type = 'purchase'
    """,
)
def q_events_scd2_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The warehouse temporal join: facts enriched with the dimension
    version IN EFFECT at fact time — scd2_build composed with the
    interval-containment asof_lookup (J7), the join every Kimball star
    schema runs between fact tables and SCD2 dimensions.  Each purchase
    matches exactly one version row (the [valid_from, valid_to) bounds
    partition the user's timeline; NULL valid_to = the current version's
    open end).  Equi-key user_id carries the hash join; containment is
    the residual filter."""
    from .operators.intervals import asof_lookup
    from .operators.scd import scd2_build

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_type",
    )
    hist = scd2_build(
        e,
        key="user_id",
        tracked=["event_type"],
        ts_col="ts_us",
        order_extra=["event_id"],
        from_col="valid_from_us",
        to_col="valid_to_us",
        seen_col="last_seen_us",
    ).select(
        "user_id",
        F.col("event_type").alias("state_type"),
        "version",
        "valid_from_us",
        "valid_to_us",
    )
    probes = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    out = asof_lookup(
        probes,
        hist,
        ["user_id"],
        probe_time="ts_us",
        begin="valid_from_us",
        end="valid_to_us",
    )
    return out.select(
        "event_id",
        probes["user_id"].alias("user_id"),
        "ts_us",
        "state_type",
        "version",
        "valid_from_us",
    )


@register(
    "events_spatial_pairs",
    """
    WITH sp_pts AS (
        SELECT event_id,
               CAST(('0x' || substr(md5('spx|' || CAST(event_id AS VARCHAR)),
                     1, 15)) AS BIGINT) % 1000 AS x,
               CAST(('0x' || substr(md5('spy|' || CAST(event_id AS VARCHAR)),
                     1, 15)) AS BIGINT) % 1000 AS y
        FROM events WHERE event_type = 'purchase'
    )
    SELECT a.event_id AS id_a, b.event_id AS id_b,
           CAST((a.x - b.x) * (a.x - b.x)
                + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS dist2
    FROM sp_pts a JOIN sp_pts b
      ON a.event_id < b.event_id
     AND b.x BETWEEN a.x - 10 AND a.x + 10
     AND b.y BETWEEN a.y - 10 AND a.y + 10
    WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 100
    """,
    headline=True,
)
def q_events_spatial_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance-threshold spatial self-join (operators/spatial.py
    within_distance_pairs, the ST_DWithin workhorse): purchase events
    get md5-derived integer planar coordinates on a 1000x1000 grid; all
    pairs within radius 10 via COMPLETE 3x3 grid blocking — one cell
    equi-join, never all-pairs.  The oracle is the brute-force banded
    quadratic form (DuckDB IEJoin), an independent algorithm; integer
    squared distances make the comparison exact."""
    from .operators.spatial import within_distance_pairs

    def coord(tag: str) -> F.Column:
        payload = F.concat(
            F.lit(tag + "|"), F.col("event_id").cast("string")
        ).cast("binary")
        return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast(
            "bigint"
        ) % 1000

    pts = (
        spread(load_table(spark, sf_dir, "events"))
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id", coord("spx").alias("x"), coord("spy").alias("y")
        )
    )
    return within_distance_pairs(
        pts, x_col="x", y_col="y", id_col="event_id", radius=10
    )


@register(
    "events_knn",
    """
    WITH kn_pts AS (
        SELECT event_id,
               CAST(('0x' || substr(md5('spx|' || CAST(event_id AS VARCHAR)),
                     1, 15)) AS BIGINT) % 1000 AS x,
               CAST(('0x' || substr(md5('spy|' || CAST(event_id AS VARCHAR)),
                     1, 15)) AS BIGINT) % 1000 AS y
        FROM events WHERE event_type = 'purchase'
    )
    SELECT a.event_id AS id,
           CAST(row_number() OVER (
               PARTITION BY a.event_id
               ORDER BY (a.x - b.x) * (a.x - b.x)
                        + (a.y - b.y) * (a.y - b.y), b.event_id
           ) AS INT) AS rank,
           b.event_id AS neighbor_id,
           CAST((a.x - b.x) * (a.x - b.x)
                + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS dist2
    FROM kn_pts a JOIN kn_pts b
      ON a.event_id <> b.event_id
     AND b.x BETWEEN a.x - 25 AND a.x + 25
     AND b.y BETWEEN a.y - 25 AND a.y + 25
    WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 625
    QUALIFY rank <= 3
    """,
)
def q_events_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius-bounded k-nearest-neighbor spatial join (operators/
    spatial.py knn_within, the PostGIS ``<->``-class KNN with an
    explicit search horizon): each purchase event's 3 nearest other
    purchases within radius 25 on the same md5-derived 1000x1000
    integer grid as events_spatial_pairs, ranked by (squared distance,
    neighbor id).  Spark runs the complete 3x3 grid-blocked equi-join
    plus one anchor-keyed ranking window; the oracle is the independent
    brute-force banded form with QUALIFY."""
    from .operators.spatial import knn_within

    def coord(tag: str) -> F.Column:
        payload = F.concat(
            F.lit(tag + "|"), F.col("event_id").cast("string")
        ).cast("binary")
        return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast(
            "bigint"
        ) % 1000

    pts = (
        spread(load_table(spark, sf_dir, "events"))
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id", coord("spx").alias("x"), coord("spy").alias("y")
        )
    )
    return knn_within(
        pts, x_col="x", y_col="y", id_col="event_id", radius=25, k=3
    )


@register(
    "events_skyline",
    """
    WITH sk_pts AS (
        SELECT event_id % 4 AS shard, event_id,
               CAST(('0x' || substr(md5('spx|' || CAST(event_id AS VARCHAR)),
                     1, 15)) AS BIGINT) % 1000000 AS x,
               CAST(('0x' || substr(md5('spy|' || CAST(event_id AS VARCHAR)),
                     1, 15)) AS BIGINT) % 1000000 AS y
        FROM events WHERE event_type = 'purchase'
    )
    SELECT a.shard, a.event_id AS id, a.x, a.y
    FROM sk_pts a
    WHERE NOT EXISTS (
        SELECT 1 FROM sk_pts b
        WHERE b.shard = a.shard
          AND b.x >= a.x AND b.y >= a.y
          AND (b.x > a.x OR b.y > a.y))
    """,
)
def q_events_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard 2-D Pareto skyline (operators/skyline.py skyline_2d):
    purchase events get md5-derived integer coordinates on a 1e6-grid
    and the frontier maximizing both is computed with the one-sort
    running-max window formulation — no join, no candidate blow-up.
    The oracle runs the INDEPENDENT quadratic NOT-EXISTS dominance
    form (DuckDB IEJoin), so an off-by-one in the strictly-greater-x
    frame or the same-x tie rule is a row-set mismatch."""
    from .operators.skyline import skyline_2d

    def coord(tag: str) -> F.Column:
        payload = F.concat(
            F.lit(tag + "|"), F.col("event_id").cast("string")
        ).cast("binary")
        return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast(
            "bigint"
        ) % 1_000_000

    pts = (
        spread(load_table(spark, sf_dir, "events"))
        .filter(F.col("event_type") == "purchase")
        .select(
            (F.col("event_id") % 4).alias("shard"),
            "event_id",
            coord("spx").alias("x"),
            coord("spy").alias("y"),
        )
    )
    return skyline_2d(
        pts, x_col="x", y_col="y", id_col="event_id",
        group_cols=["shard"],
    )


@register(
    "events_cm_heavy_hitters",
    """
    WITH cm_src AS (
        SELECT event_type, user_id FROM events WHERE user_id IS NOT NULL
    ),
    cm_rows AS (SELECT unnest(generate_series(0, 3)) AS row_idx),
    cm_cells AS (
        SELECT event_type, row_idx,
               CAST(('0x' || substr(md5('cm' || CAST(row_idx AS VARCHAR)
                    || '|' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
                 % 64 AS col_idx,
               CAST(count(*) AS BIGINT) AS cnt
        FROM cm_src, cm_rows
        GROUP BY 1, 2, 3
    ),
    cm_probes AS (
        SELECT DISTINCT event_type, user_id
        FROM cm_src WHERE user_id % 25 = 0
    ),
    cm_pc AS (
        SELECT p.event_type, p.user_id, r.row_idx,
               CAST(('0x' || substr(md5('cm' || CAST(r.row_idx AS VARCHAR)
                    || '|' || CAST(p.user_id AS VARCHAR)), 1, 15)) AS BIGINT)
                 % 64 AS col_idx
        FROM cm_probes p, cm_rows r
    ),
    cm_est AS (
        SELECT pc.event_type, pc.user_id,
               CAST(min(COALESCE(c.cnt, 0)) AS BIGINT) AS est_cnt
        FROM cm_pc pc
        LEFT JOIN cm_cells c
          ON c.event_type = pc.event_type AND c.row_idx = pc.row_idx
         AND c.col_idx = pc.col_idx
        GROUP BY 1, 2
    ),
    cm_exact AS (
        SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS exact_cnt
        FROM cm_src WHERE user_id % 25 = 0 GROUP BY 1, 2
    )
    SELECT e.event_type, e.user_id, e.est_cnt, x.exact_cnt
    FROM cm_est e JOIN cm_exact x USING (event_type, user_id)
    """,
)
def q_events_cm_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency estimation (operators/sketch.py cm_sketch):
    per-event-type user frequencies from a 4x64 sketch — state bounded
    at 256 cells per group regardless of stream size, mergeable by
    cellwise addition — probed for a deterministic user subset and
    joined against exact counts (est >= exact ALWAYS; the narrow width
    forces visible collision overcounts at sf0.1).  Everything is md5 +
    integer sums, so the oracle replays sketch, probe and estimate
    exactly."""
    from .operators.sketch import cm_estimate, cm_sketch

    src = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    sk = cm_sketch(
        src, value_col="user_id", group_cols=["event_type"],
        depth=4, width=64,
    )
    probes = (
        src.filter(F.col("user_id").isNotNull() & (F.col("user_id") % 25 == 0))
        .select("event_type", "user_id")
        .distinct()
    )
    est = cm_estimate(
        sk, probes, value_col="user_id", group_cols=["event_type"],
        depth=4, width=64,
    )
    exact = (
        src.filter(F.col("user_id").isNotNull() & (F.col("user_id") % 25 == 0))
        .groupBy("event_type", "user_id")
        .agg(F.count("*").alias("exact_cnt"))
    )
    return est.join(exact, ["event_type", "user_id"])


@register(
    "events_kmv_distinct",
    """
    WITH kmv_h AS (
        SELECT DISTINCT event_type,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                    AS BIGINT) AS hv
        FROM events WHERE user_id IS NOT NULL
    ),
    kmv_r AS (
        SELECT event_type, hv,
               row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
        FROM kmv_h
    ),
    kmv_e AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_seen, max(hv) AS mx
        FROM kmv_r WHERE rn <= 64 GROUP BY event_type
    ),
    kmv_x AS (
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
        FROM events GROUP BY event_type
    )
    SELECT e.event_type, e.n_seen,
           CASE WHEN e.n_seen = 64 THEN e.mx END AS kth_hash,
           CASE WHEN e.n_seen < 64 THEN CAST(e.n_seen AS DOUBLE)
                ELSE round(63.0 * 1152921504606846976.0 / e.mx, 6)
           END AS est_distinct,
           x.exact_distinct
    FROM kmv_e e JOIN kmv_x x USING (event_type)
    """,
)
def q_events_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV bottom-k distinct-count sketch (operators/sketch.py): per
    event type, the 64 smallest md5-derived user hashes estimate the
    distinct-user count as (k-1)·M/h_k, joined against the exact count
    for an honest error readout.  The md5 hash and the single double
    division are engine-identical, so the oracle replays sketch AND
    estimate bit-for-bit — a cardinality sketch the driver can actually
    hash-compare."""
    from .operators.sketch import kmv_estimate, kmv_sketch

    e = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    sk = kmv_sketch(e, value_col="user_id", group_cols=["event_type"], k=64)
    est = kmv_estimate(sk, group_cols=["event_type"], k=64)
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, "event_type")


@register(
    "events_kmv_rolling",
    """
    WITH kr_obs AS (
        SELECT event_type, epoch_us(ts) // 86400000000 AS day,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                   AS BIGINT) AS hv
        FROM events WHERE user_id IS NOT NULL
    ),
    kr_days AS (SELECT DISTINCT event_type, day FROM kr_obs),
    kr_union AS (
        SELECT DISTINCT d.event_type, d.day, o.hv
        FROM kr_days d JOIN kr_obs o
          ON o.event_type = d.event_type
         AND o.day BETWEEN d.day - 6 AND d.day
    ),
    kr_rank AS (
        SELECT event_type, day, hv,
               row_number() OVER (
                   PARTITION BY event_type, day ORDER BY hv) AS rn
        FROM kr_union
    ),
    kr_sk AS (
        SELECT event_type, day, CAST(count(*) AS BIGINT) AS n_seen,
               max(hv) AS mx
        FROM kr_rank WHERE rn <= 32 GROUP BY event_type, day
    )
    SELECT event_type, day, n_seen,
           CASE WHEN n_seen = 32 THEN mx END AS kth_hash,
           CASE WHEN n_seen < 32 THEN CAST(n_seen AS DOUBLE)
                ELSE round(31.0 * 1152921504606846976.0 / mx, 6)
           END AS est_distinct
    FROM kr_sk
    """,
)
def q_events_kmv_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct-active-users estimate per event type
    (operators/sketch.py kmv_rolling): daily bottom-32 KMV sketches,
    merged across each trailing window entirely in sketch space — raw
    events are scanned ONCE; the rolling stage moves only 8-byte sketch
    hashes.  The oracle computes the sketch of the raw trailing union
    DIRECTLY (no daily intermediate), so the driver's hash compare is a
    fact-scale proof of the merge law the property test pins."""
    from .operators.sketch import kmv_rolling

    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            "unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000"
        ).alias("day"),
        "user_id",
    )
    return kmv_rolling(
        e,
        value_col="user_id",
        time_col="day",
        window_size=7,
        group_cols=["event_type"],
        k=32,
    )


@register(
    "events_theta_overlap",
    """
    WITH to_h AS (
        SELECT DISTINCT event_type AS key,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                   AS BIGINT) AS hv
        FROM events WHERE user_id IS NOT NULL
    ),
    to_sk AS (
        SELECT key, hv FROM (
            SELECT key, hv,
                   row_number() OVER (PARTITION BY key ORDER BY hv) AS rn
            FROM to_h) to_i WHERE rn <= 64
    ),
    to_th AS (
        SELECT key, CASE WHEN count(*) = 64 THEN max(hv)
                         ELSE 1152921504606846976 END AS theta
        FROM to_sk GROUP BY key
    ),
    to_p AS (
        SELECT a.key AS key_a, b.key AS key_b,
               least(a.theta, b.theta) AS theta
        FROM to_th a JOIN to_th b ON a.key < b.key
    ),
    to_na AS (
        SELECT p.key_a, p.key_b, CAST(count(*) AS BIGINT) AS n_a
        FROM to_p p JOIN to_sk s ON s.key = p.key_a AND s.hv < p.theta
        GROUP BY 1, 2
    ),
    to_nb AS (
        SELECT p.key_a, p.key_b, CAST(count(*) AS BIGINT) AS n_b
        FROM to_p p JOIN to_sk s ON s.key = p.key_b AND s.hv < p.theta
        GROUP BY 1, 2
    ),
    to_ni AS (
        SELECT p.key_a, p.key_b, CAST(count(*) AS BIGINT) AS n_inter
        FROM to_p p
        JOIN to_sk x ON x.key = p.key_a AND x.hv < p.theta
        JOIN to_sk y ON y.key = p.key_b AND y.hv = x.hv
        GROUP BY 1, 2
    ),
    to_c AS (
        SELECT p.key_a, p.key_b, p.theta,
               COALESCE(a.n_a, 0) AS n_a, COALESCE(b.n_b, 0) AS n_b,
               COALESCE(i.n_inter, 0) AS n_inter,
               COALESCE(a.n_a, 0) + COALESCE(b.n_b, 0)
                   - COALESCE(i.n_inter, 0) AS n_union
        FROM to_p p
        LEFT JOIN to_na a USING (key_a, key_b)
        LEFT JOIN to_nb b USING (key_a, key_b)
        LEFT JOIN to_ni i USING (key_a, key_b)
    ),
    to_e AS (
        SELECT *,
               round((CAST(n_a AS DOUBLE) * 1152921504606846976.0)
                     / theta, 6) AS est_a,
               round((CAST(n_b AS DOUBLE) * 1152921504606846976.0)
                     / theta, 6) AS est_b,
               round((CAST(n_inter AS DOUBLE) * 1152921504606846976.0)
                     / theta, 6) AS est_intersect
        FROM to_c
    )
    SELECT key_a, key_b, theta, n_a, n_b, n_inter, n_union,
           est_a, est_b, est_intersect,
           round(est_a - est_intersect, 6) AS est_only_a,
           round(est_b - est_intersect, 6) AS est_only_b,
           round(est_a + est_b - est_intersect, 6) AS est_union,
           CASE WHEN n_union > 0
                THEN round(CAST(n_inter AS DOUBLE) / n_union, 6)
           END AS jaccard
    FROM to_e
    """,
)
def q_events_theta_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimates for every event-type pair via theta
    set algebra over per-type KMV sketches (operators/sketch.py
    theta_overlap): distinct-user intersection, difference, union and
    Jaccard for all pairs, computed entirely in SKETCH space — raw
    events are scanned once by the sketch build; the pairwise algebra
    moves <= k hashes per type.  The md5 hashes, integer thresholds and
    single double divisions replay bit-for-bit in the oracle, which
    recomputes sketch, theta, survivor counts and every estimate from
    the raw table independently."""
    from .operators.sketch import kmv_sketch, theta_overlap

    e = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    sk = kmv_sketch(e, value_col="user_id", group_cols=["event_type"], k=64)
    return theta_overlap(sk, key_col="event_type", k=64)


@register(
    "events_value_quantiles",
    """
    WITH sq_r AS (
        SELECT event_type, event_id, value,
               CAST(('0x' || substr(md5('sample_v1|'
                     || CAST(event_id AS VARCHAR)), 1, 15))
                   AS BIGINT) AS rank_hash
        FROM events WHERE value IS NOT NULL
    ),
    sq_s AS (
        SELECT event_type, event_id, value FROM (
            SELECT event_type, event_id, value,
                   row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY rank_hash, event_id) AS rn
            FROM sq_r) sq_i WHERE rn <= 64
    ),
    sq_o AS (
        SELECT event_type, value,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY value, event_id) AS orn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM sq_s
    )
    SELECT event_type, CAST(max(n) AS BIGINT) AS n_sample,
           max(CASE WHEN orn = (25 * n + 99) // 100 THEN value END) AS q_p25,
           max(CASE WHEN orn = (50 * n + 99) // 100 THEN value END) AS q_p50,
           max(CASE WHEN orn = (75 * n + 99) // 100 THEN value END) AS q_p75,
           max(CASE WHEN orn = (90 * n + 99) // 100 THEN value END) AS q_p90
    FROM sq_o GROUP BY event_type
    """,
)
def q_events_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimates from a mergeable deterministic sample
    (operators/sketch.py sample_sketch + sample_quantiles): per event
    type, a bottom-64 md5-rank uniform sample (the KMV merge law on row
    identity — per-partition samples reaggregate exactly) and the
    nearest-rank p25/p50/p75/p90 order statistics over the (value, id)
    total order, values copied verbatim so the doubles hash-compare.
    Completes the mergeable sketch family: distinct (KMV), frequency
    (count-min), quantiles (this)."""
    from .operators.sketch import sample_quantiles, sample_sketch

    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "event_id", "value")
    )
    sk = sample_sketch(
        e,
        id_col="event_id",
        group_cols=["event_type"],
        k=64,
        keep_cols=["value"],
    )
    return sample_quantiles(
        sk,
        value_col="value",
        id_col="event_id",
        group_cols=["event_type"],
        percents=[25, 50, 75, 90],
    )


@register("table_profile", _profile_oracle())
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile of the documents table (operators/profile.py
    profile_table): per-column row/null/exact-distinct counts plus
    empty-string and length bounds for string columns, one tidy row per
    column from ONE aggregate job (map-side combine reduces every
    partition to a single row before the shuffle).  The oracle is the
    textbook per-column UNION ALL."""
    from .operators.profile import profile_table

    return profile_table(load_table(spark, sf_dir, "documents"))


@register(
    "table_expectations",
    """
    WITH xm AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(count(text) AS BIGINT) AS nn_text,
               CAST(count(doc_id) AS BIGINT) AS nn_id,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS nd_id,
               CAST(count(lang) AS BIGINT) AS nn_lang,
               CAST(count(CASE WHEN lang IN ('en','de','es','fr')
                          THEN 1 END) AS BIGINT) AS ok_lang,
               CAST(count(n_chars) AS BIGINT) AS nn_nc,
               CAST(count(CASE WHEN n_chars BETWEEN 1 AND 600
                          THEN 1 END) AS BIGINT) AS ok_nc,
               CAST(count(source) AS BIGINT) AS nn_src,
               CAST(count(CASE WHEN regexp_matches(source, '^src[0-9]+$')
                          THEN 1 END) AS BIGINT) AS ok_src
        FROM documents
    )
    SELECT * FROM (
        SELECT 'row_count' AS rule, CAST(NULL AS VARCHAR) AS column_name,
               n AS metric, CAST(100 AS BIGINT) AS threshold,
               n >= 100 AS passed FROM xm
        UNION ALL
        SELECT 'unique', 'doc_id',
               CASE WHEN nn_id = 0 THEN 1000 ELSE (1000 * nd_id) // nn_id END,
               1000,
               CASE WHEN nn_id = 0 THEN 1000
                    ELSE (1000 * nd_id) // nn_id END >= 1000 FROM xm
        UNION ALL
        SELECT 'not_null', 'text',
               CASE WHEN n = 0 THEN 1000 ELSE (1000 * nn_text) // n END,
               1000,
               CASE WHEN n = 0 THEN 1000
                    ELSE (1000 * nn_text) // n END >= 1000 FROM xm
        UNION ALL
        SELECT 'in_set', 'lang',
               CASE WHEN nn_lang = 0 THEN 1000
                    ELSE (1000 * ok_lang) // nn_lang END,
               900,
               CASE WHEN nn_lang = 0 THEN 1000
                    ELSE (1000 * ok_lang) // nn_lang END >= 900 FROM xm
        UNION ALL
        SELECT 'between', 'n_chars',
               CASE WHEN nn_nc = 0 THEN 1000 ELSE (1000 * ok_nc) // nn_nc END,
               1000,
               CASE WHEN nn_nc = 0 THEN 1000
                    ELSE (1000 * ok_nc) // nn_nc END >= 1000 FROM xm
        UNION ALL
        SELECT 'matches', 'source',
               CASE WHEN nn_src = 0 THEN 1000
                    ELSE (1000 * ok_src) // nn_src END,
               1000,
               CASE WHEN nn_src = 0 THEN 1000
                    ELSE (1000 * ok_src) // nn_src END >= 1000 FROM xm
    )
    """,
)
def q_table_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate (operators/expectations.py
    expectation_suite): a Deequ-class rule suite — row-count floor,
    doc_id uniqueness, text completeness, lang containment with a 90%
    threshold (deliberately FAILING on this corpus: 15% of docs are
    zh — the verdict table must prove it reports false, not just
    true), n_chars bounds, and a source-name regexp — all evaluated in
    ONE wide aggregate (map-side combine to a single row per
    partition).  Metrics are integer milli-ratios with truncating
    division, so the oracle replays every verdict bit-exactly."""
    from .operators.expectations import expectation_suite

    return expectation_suite(
        load_table(spark, sf_dir, "documents"),
        [
            {"rule": "row_count", "lo": 100},
            {"rule": "unique", "column": "doc_id"},
            {"rule": "not_null", "column": "text"},
            {
                "rule": "in_set",
                "column": "lang",
                "allowed": ["en", "de", "es", "fr"],
                "min_ratio_milli": 900,
            },
            {"rule": "between", "column": "n_chars", "lo": 1, "hi": 600},
            {
                "rule": "matches",
                "column": "source",
                "pattern": "^src[0-9]+$",
            },
        ],
    )


@register(
    "events_hdr_quantiles",
    """
    WITH hq_v AS (
        SELECT event_type, CAST(round(value * 1000000) AS BIGINT) AS v
        FROM events WHERE value IS NOT NULL
    ),
    hq_sm AS (
        SELECT event_type, v, s16 | (s16 >> 32) AS sm FROM (
            SELECT event_type, v, s8 | (s8 >> 16) AS s16 FROM (
                SELECT event_type, v, s4 | (s4 >> 8) AS s8 FROM (
                    SELECT event_type, v, s2 | (s2 >> 4) AS s4 FROM (
                        SELECT event_type, v, s1 | (s1 >> 2) AS s2 FROM (
                            SELECT event_type, v, v | (v >> 1) AS s1
                            FROM hq_v) a) b) c) d) e
    ),
    hq_e AS (
        -- bit_count returns TINYINT in DuckDB: widen BEFORE arithmetic
        SELECT event_type, v,
               CAST(bit_count(sm) AS BIGINT) - 1 AS e
        FROM hq_sm
    ),
    hq_b AS (
        SELECT event_type,
               CASE WHEN v < 32 THEN v
                    ELSE (e - 4) * 16 + (v >> (e - 4)) END AS bucket
        FROM hq_e
    ),
    hq_h AS (
        SELECT event_type, bucket, count(*) AS n
        FROM hq_b GROUP BY event_type, bucket
    ),
    hq_c AS (
        SELECT event_type, bucket, n,
               sum(n) OVER (PARTITION BY event_type ORDER BY bucket
                            ROWS UNBOUNDED PRECEDING) AS cum,
               sum(n) OVER (PARTITION BY event_type) AS tot
        FROM hq_h
    ),
    hq_lo AS (
        SELECT *,
               CASE WHEN bucket < 32 THEN bucket
                    ELSE (bucket % 16 + 16)
                         * (CAST(1 AS BIGINT)
                            << CAST(bucket // 16 - 1 AS INTEGER))
               END AS lo
        FROM hq_c
    )
    SELECT event_type, CAST(max(tot) AS BIGINT) AS n_values,
           CAST(min(CASE WHEN cum >= (50 * tot + 99) // 100 THEN lo END)
                AS BIGINT) AS q_p50,
           CAST(min(CASE WHEN cum >= (90 * tot + 99) // 100 THEN lo END)
                AS BIGINT) AS q_p90,
           CAST(min(CASE WHEN cum >= (99 * tot + 99) // 100 THEN lo END)
                AS BIGINT) AS q_p99
    FROM hq_lo GROUP BY event_type
    """,
    headline=True,
)
def q_events_hdr_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latency-style quantiles from an HDR log-linear histogram sketch
    (operators/sketch.py hdr_sketch/hdr_quantiles — the HdrHistogram /
    DDSketch family): event values quantized to integer micros, bucketed
    into log-spaced octaves with 16 linear slots each (relative error
    <= 1/16), p50/p90/p99 read off the cumulative cell counts.  The
    floor-log2 is exact integer bit-smearing + bit_count — no float
    log2 — so the DuckDB oracle replays bucket ids, cumulative ranks,
    and estimates bit-for-bit.

    Scale shape: ONE map-side-combinable groupBy of (group, bucket)
    cells + one window over CELLS (~hundreds per group, never values);
    per-group state is bounded regardless of row count, and the
    histogram is cellwise-mergeable for incremental maintenance
    (property-tested merge law)."""
    from .operators.sketch import hdr_quantiles, hdr_sketch

    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(round(value * 1000000) AS BIGINT)").alias("v"),
    )
    sk = hdr_sketch(
        e, value_col="v", group_cols=["event_type"], precision_bits=4
    )
    return hdr_quantiles(
        sk,
        group_cols=["event_type"],
        percents=[50, 90, 99],
        precision_bits=4,
    )




@register(
    "orders_benford",
    """
    WITH bf_o AS (
        SELECT o_orderpriority AS priority,
               CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                    AS VARCHAR), 1, 1) AS INTEGER) AS digit
        FROM orders
    ),
    bf_c AS (
        SELECT priority, digit, CAST(count(*) AS BIGINT) AS n_obs
        FROM bf_o GROUP BY 1, 2
    ),
    bf_digits AS (
        SELECT * FROM (VALUES
            (1, 301029), (2, 176091), (3, 124938), (4, 96910),
            (5, 79181), (6, 66946), (7, 57991), (8, 51152),
            (9, 45757)) t(digit, exp_ppm)
    ),
    bf_grid AS (
        SELECT p.priority, d.digit,
               CAST(coalesce(c.n_obs, 0) AS BIGINT) AS n_obs,
               CAST(d.exp_ppm AS BIGINT) AS exp_ppm
        FROM (SELECT DISTINCT priority FROM bf_c) p
        CROSS JOIN bf_digits d
        LEFT JOIN bf_c c ON c.priority = p.priority AND c.digit = d.digit
    ),
    bf_n AS (
        SELECT *,
               CAST(sum(n_obs) OVER (PARTITION BY priority) AS BIGINT)
                   AS n_total
        FROM bf_grid
    ),
    bf_t AS (
        SELECT priority, digit, n_obs, n_total, exp_ppm,
               CAST((1000 * (1000000 * CAST(n_obs AS HUGEINT)
                             - CAST(n_total AS HUGEINT) * exp_ppm)
                          * (1000000 * CAST(n_obs AS HUGEINT)
                             - CAST(n_total AS HUGEINT) * exp_ppm))
                    // (1000000 * CAST(n_total AS HUGEINT) * exp_ppm)
                    AS BIGINT) AS contrib_milli
        FROM bf_n
    )
    SELECT priority, digit, n_obs, n_total, exp_ppm, contrib_milli,
           CAST(sum(contrib_milli) OVER (PARTITION BY priority)
                AS BIGINT) AS chi2_milli
    FROM bf_t
    """,
    headline=True,
)
def q_orders_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit conformity screen over order totals per
    priority class (operators/stats.py benford_screen — the forensic-
    accounting staple): amounts quantize to exact cents, the first
    decimal digit censuses in ONE combinable groupBy (pivoted to the
    dense nine-digit grid, zero cells included), and each digit's
    Pearson term against the public truncated log10(1+1/d) ppm
    constants is an exact DECIMAL(38,0)/HUGEINT truncating division;
    the per-group chi-square is a nine-row census window.  The oracle
    rebuilds the same grid via a digit VALUES cross join."""
    from .operators.stats import benford_screen

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        cents(F.col("o_totalprice")).alias("amount_cents"),
    )
    return benford_screen(
        o, value_col="amount_cents", group_cols=["priority"]
    )


@register(
    "brand_momentum",
    """
    WITH bm_j AS (
        SELECT p.p_brand AS brand,
               CASE WHEN l.l_shipdate >= TIMESTAMP '1998-07-01'
                    THEN 1 ELSE 0 END AS per
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    bm_c AS (
        SELECT brand,
               CAST(count(CASE WHEN per = 0 THEN 1 END) AS BIGINT)
                   AS n_pre,
               CAST(count(CASE WHEN per = 1 THEN 1 END) AS BIGINT)
                   AS n_post
        FROM bm_j GROUP BY brand
    )
    SELECT brand, n_pre, n_post,
           CAST((1000000 * (CAST(n_post AS HUGEINT) + 1))
                // (n_pre + 1) AS BIGINT) AS momentum_ppm
    FROM bm_c
    ORDER BY momentum_ppm DESC, brand
    LIMIT 10
    """,
)
def q_brand_momentum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 trending brands across the catalog's two halves
    (operators/selection.py period_momentum): lineitems broadcast-join
    the part dimension for the brand, split pre/post 1998-07-01, and
    each brand reports its exact add-one-smoothed growth ratio in ppm;
    the cut is (momentum_ppm DESC, brand) -> TakeOrderedAndProject.
    ONE combinable groupBy over the joined fact; no window."""
    from .operators.selection import period_momentum

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (
            F.col("l_shipdate")
            >= F.lit("1998-07-01").cast("timestamp")
        )
        .cast("bigint")
        .alias("per"),
    )
    p = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey"), F.col("p_brand").alias("brand")
    )
    joined = li.join(
        F.broadcast(p), li.l_partkey == p.p_partkey
    ).select("brand", "per")
    return period_momentum(
        joined, key_cols=["brand"], period_col="per", k=10
    )


@register(
    "event_bounce_rate",
    """
    WITH br_e AS (
        SELECT user_id, epoch_us(ts) AS tus, event_id, event_type
        FROM events
    ),
    br_s AS (
        SELECT *,
               CASE WHEN lag(tus) OVER w IS NULL
                     OR tus - lag(tus) OVER w > 1800000000
                    THEN 1 ELSE 0 END AS ns
        FROM br_e
        WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
    ),
    br_a AS (
        SELECT *,
               SUM(ns) OVER (PARTITION BY user_id ORDER BY tus, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_idx
        FROM br_s
    ),
    br_r AS (
        SELECT user_id, session_idx, event_type,
               row_number() OVER (PARTITION BY user_id, session_idx
                                  ORDER BY tus, event_id) AS rn,
               count(*) OVER (PARTITION BY user_id, session_idx) AS n
        FROM br_a
    ),
    br_l AS (SELECT event_type AS landing_type, n FROM br_r WHERE rn = 1)
    SELECT landing_type,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bounces,
           CAST((sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 1000000)
                // count(*) AS BIGINT) AS bounce_ppm
    FROM br_l GROUP BY landing_type
    """,
)
def q_event_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-landing-type bounce rate (operators/funnel.py bounce_rate,
    r12): sessions grouped by their FIRST event's type, with the share
    that ended after that single event in exact ppm — the
    product-analytics staple composing the shared gap-rule
    sessionization (30-minute gap).  The oracle replays the gap rule,
    the running session index, the rank-1 landing pick and the
    single-event test with plain SQL windows."""
    from .operators.funnel import bounce_rate

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("ts_us"),
        "event_id",
        "event_type",
    )
    return bounce_rate(e, gap_us=1_800_000_000)


@register(
    "user_churn_hazard",
    """
    WITH hz_ev AS (
        SELECT user_id, epoch_us(ts) AS tus FROM events
    ),
    hz_end AS (SELECT max(tus) AS end_us FROM hz_ev),
    hz_usr AS (
        SELECT user_id, min(tus) AS first_us, max(tus) AS last_us
        FROM hz_ev GROUP BY user_id
    ),
    hz_dur AS (
        SELECT u.first_us // 604800000000 AS cohort_week,
               CASE WHEN e.end_us - u.last_us > 604800000000
                    THEN (u.last_us - u.first_us) // 86400000000
                    ELSE (e.end_us - u.first_us) // 86400000000
               END AS t,
               CASE WHEN e.end_us - u.last_us > 604800000000
                    THEN 1 ELSE 0 END AS ev
        FROM hz_usr u, hz_end e
    ),
    hz_census AS (
        SELECT cohort_week, t, CAST(sum(ev) AS BIGINT) AS d,
               CAST(count(*) - sum(ev) AS BIGINT) AS c
        FROM hz_dur GROUP BY cohort_week, t
    ),
    hz_risk AS (
        SELECT cohort_week, t, d, c,
               CAST(sum(d + c) OVER (PARTITION BY cohort_week)
                    - (sum(d + c) OVER (
                           PARTITION BY cohort_week ORDER BY t
                           ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) - (d + c))
                    AS BIGINT) AS n_risk
        FROM hz_census
    ),
    hz_terms AS (
        SELECT cohort_week, t, n_risk, d, c,
               CASE WHEN d > 0 THEN (1000000000 * d) // n_risk
                    ELSE 0 END AS hz
        FROM hz_risk
    )
    SELECT cohort_week, t AS duration, n_risk,
           d AS n_events, c AS n_censored,
           CAST(sum(hz) OVER (
               PARTITION BY cohort_week ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cumhaz_scaled
    FROM hz_terms
    """,
)
def q_user_churn_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative churn hazard by signup-week cohort
    (operators/survival.py nelson_aalen, r13) — the additive sibling of
    user_churn_survival over the IDENTICAL subject derivation (churned
    = inactive > 7 days at study end, else right-censored): H(t) =
    sum d_i/n_i as an exact nano-scaled running sum of per-duration
    truncating divisions, replayed verbatim by a pure-window oracle
    (no recursion — NA terms don't compound, unlike KM's product).
    Parallel log-H curves across cohorts read as proportional hazards.

    Scale shape: one user-keyed groupBy (the data-sized shuffle), a
    broadcast one-row study-end join, one combinable (cohort, day)
    census groupBy, then two census-sized windows on the cohort key."""
    from .operators.survival import nelson_aalen

    WEEK_US = 604_800_000_000
    DAY_US = 86_400_000_000
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    usr = e.groupBy("user_id").agg(
        F.min("ts_us").alias("__first"), F.max("ts_us").alias("__last")
    )
    end = e.agg(F.max("ts_us").alias("__end"))
    churned = F.col("__end") - F.col("__last") > F.lit(WEEK_US)
    subj = usr.crossJoin(F.broadcast(end)).select(
        F.expr(f"__first div {WEEK_US}").alias("cohort_week"),
        F.when(churned, F.expr(f"(__last - __first) div {DAY_US}"))
        .otherwise(F.expr(f"(__end - __first) div {DAY_US}"))
        .alias("__t"),
        churned.cast("bigint").alias("__ev"),
    )
    return nelson_aalen(
        subj,
        duration_col="__t",
        event_col="__ev",
        group_cols=["cohort_week"],
    )


@register(
    "user_churn_logrank",
    """
    WITH lg_ev AS (
        SELECT user_id, epoch_us(ts) AS tus FROM events
    ),
    lg_end AS (SELECT max(tus) AS end_us FROM lg_ev),
    lg_usr AS (
        SELECT user_id, min(tus) AS first_us, max(tus) AS last_us
        FROM lg_ev GROUP BY user_id
    ),
    lg_sub AS (
        SELECT u.first_us // 604800000000 AS cohort_week,
               CAST(('0x' || substr(md5('lr|'
                     || CAST(u.user_id AS VARCHAR)), 1, 15))
                    AS BIGINT) % 2 AS arm,
               CASE WHEN e.end_us - u.last_us > 604800000000
                    THEN (u.last_us - u.first_us) // 86400000000
                    ELSE (e.end_us - u.first_us) // 86400000000
               END AS t,
               CASE WHEN e.end_us - u.last_us > 604800000000
                    THEN 1 ELSE 0 END AS ev
        FROM lg_usr u, lg_end e
    ),
    lg_census AS (
        SELECT cohort_week, t,
               CAST(sum(CASE WHEN arm = 0 THEN ev ELSE 0 END)
                    AS BIGINT) AS da,
               CAST(sum(CASE WHEN arm = 1 THEN ev ELSE 0 END)
                    AS BIGINT) AS db,
               CAST(sum(CASE WHEN arm = 0 THEN 1 - ev ELSE 0 END)
                    AS BIGINT) AS ca,
               CAST(sum(CASE WHEN arm = 1 THEN 1 - ev ELSE 0 END)
                    AS BIGINT) AS cb
        FROM lg_sub GROUP BY cohort_week, t
    ),
    lg_risk AS (
        SELECT cohort_week, t, da, db,
               CAST(sum(da + ca) OVER (PARTITION BY cohort_week)
                    - (sum(da + ca) OVER (
                           PARTITION BY cohort_week ORDER BY t
                           ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) - (da + ca))
                    AS BIGINT) AS na,
               CAST(sum(db + cb) OVER (PARTITION BY cohort_week)
                    - (sum(db + cb) OVER (
                           PARTITION BY cohort_week ORDER BY t
                           ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) - (db + cb))
                    AS BIGINT) AS nb
        FROM lg_census
    ),
    lg_terms AS (
        SELECT cohort_week, da AS oa, na, nb,
               CASE WHEN da + db > 0
                    THEN (1000000 * CAST(da + db AS HUGEINT) * na)
                         // (na + nb)
                    ELSE 0 END AS e_ppm,
               CASE WHEN da + db > 0 AND na + nb > 1
                    THEN (1000000 * CAST(da + db AS HUGEINT) * na * nb
                          * (na + nb - da - db))
                         // (CAST(na + nb AS HUGEINT) * (na + nb)
                             * (na + nb - 1))
                    ELSE 0 END AS v_ppm
        FROM lg_risk
    ),
    lg_g AS (
        SELECT cohort_week,
               CAST(max(na) AS BIGINT) AS n_a,
               CAST(max(nb) AS BIGINT) AS n_b,
               CAST(sum(oa) AS BIGINT) AS o_a,
               CAST(sum(e_ppm) AS HUGEINT) AS se,
               CAST(sum(v_ppm) AS HUGEINT) AS sv
        FROM lg_terms GROUP BY cohort_week
    )
    SELECT cohort_week, n_a, n_b, o_a,
           CAST(se AS BIGINT) AS e_a_ppm,
           CAST(sv AS BIGINT) AS v_ppm,
           CASE WHEN sv > 0
                THEN CAST(least((1000
                           * (1000000 * CAST(o_a AS HUGEINT) - se)
                           * (1000000 * o_a - se)) // (1000000 * sv),
                           4000000000000000000)
                          AS BIGINT) END AS chi2_milli
    FROM lg_g
    """,
)
def q_user_churn_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample log-rank churn test by signup-week cohort
    (operators/survival.py log_rank_test, r13): arms assigned by md5
    parity ('lr|' salt, the ab_contingency convention) over the same
    churn/censoring subject derivation as user_churn_survival — the
    censoring-correct "did arm B retain differently?" readout a naive
    mean-lifetime compare gets wrong.  Per pooled event time the
    hypergeometric e/v terms are exact ppm truncating divisions
    (DECIMAL(38,0) vs HUGEINT, one `div` per term replayed verbatim);
    chi2_milli = (1000*S^2) div (1e6*V) with S legitimately signed and
    S^2 non-negative, so trunc and floor agree.  Degenerate cohorts
    (one-armed / all-censored, V = 0) emit NULL, never fake
    significance.

    Scale shape: one user-keyed groupBy, a broadcast study-end join,
    one combinable (cohort, day, arm-cells) census groupBy, two
    census-sized windows on the cohort key, one combinable census
    groupBy; no join (plan-gated)."""
    from .operators.survival import log_rank_test

    WEEK_US = 604_800_000_000
    DAY_US = 86_400_000_000
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    usr = e.groupBy("user_id").agg(
        F.min("ts_us").alias("__first"), F.max("ts_us").alias("__last")
    )
    end = e.agg(F.max("ts_us").alias("__end"))
    churned = F.col("__end") - F.col("__last") > F.lit(WEEK_US)
    arm = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("lr|"), F.col("user_id").cast("string")
                    ).cast("binary")
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    subj = usr.crossJoin(F.broadcast(end)).select(
        F.expr(f"__first div {WEEK_US}").alias("cohort_week"),
        arm.alias("__arm"),
        F.when(churned, F.expr(f"(__last - __first) div {DAY_US}"))
        .otherwise(F.expr(f"(__end - __first) div {DAY_US}"))
        .alias("__t"),
        churned.cast("bigint").alias("__ev"),
    )
    return log_rank_test(
        subj,
        duration_col="__t",
        event_col="__ev",
        arm_col="__arm",
        group_cols=["cohort_week"],
    )
