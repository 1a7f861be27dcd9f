"""Extended analytics: changepoints, retrieval, graph, event
analytics, stats/time-series tiers (rounds 9-10).

Split out of the queries.py monolith in round 11 — one file per
registry family seam, ZERO behavior change: the same @register calls
run in the same order when ``queries`` imports the siblings, so the
registry holds the identical name set and DRIVER_WINDOW is untouched.
See queries.py for the shared determinism contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import fixtures as fx
from .functions.paths import absolutize, prefix_replace, strip_fragment
from .operators.chains import flatten_chains, flatten_chains_distributed
from .operators.find_first import find_first
from .operators.intervals import asof_lookup, overlapping_pairs
from .operators.priority_dedup import priority_dedup, priority_map
from .registry import REGISTRY, QuerySpec, cents, prioritize, register
from .tables import load_table, local_df, spread



@register(
    "events_changepoints",
    """
    WITH cp_base AS (
        SELECT event_type, epoch_us(ts) AS tus, event_id, value,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY epoch_us(ts), event_id) AS seq,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events WHERE value IS NOT NULL
    ),
    cp_sh AS (
        SELECT event_type, tus, event_id, seq, n,
               CAST(floor((CASE WHEN seq * 2 > n THEN value + 25.0
                                ELSE value END) * 1000) AS BIGINT) AS v
        FROM cp_base
    ),
    cp_tot AS (
        SELECT *, CAST(sum(v) OVER (PARTITION BY event_type) AS BIGINT) AS vv
        FROM cp_sh
    ),
    cp_cum AS (
        SELECT event_type, seq, n, vv,
               CAST(sum(n * v - vv - n * 10000) OVER (
                   PARTITION BY event_type ORDER BY tus, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cu,
               CAST(sum(vv - n * v - n * 10000) OVER (
                   PARTITION BY event_type ORDER BY tus, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cd
        FROM cp_tot
    ),
    cp_st AS (
        SELECT event_type, seq, n,
               cu - least(0, min(cu) OVER (
                   PARTITION BY event_type ORDER BY seq
                   ROWS UNBOUNDED PRECEDING)) AS su,
               cd - least(0, min(cd) OVER (
                   PARTITION BY event_type ORDER BY seq
                   ROWS UNBOUNDED PRECEDING)) AS sd
        FROM cp_cum
    ),
    cp_al AS (
        SELECT event_type, CAST(seq AS BIGINT) AS seq, 'up' AS direction,
               CAST(su AS BIGINT) AS stat_scaled,
               CAST(n * 500000 AS BIGINT) AS threshold_scaled
        FROM cp_st WHERE su > n * 500000
        UNION ALL
        SELECT event_type, CAST(seq AS BIGINT) AS seq, 'down' AS direction,
               CAST(sd AS BIGINT) AS stat_scaled,
               CAST(n * 500000 AS BIGINT) AS threshold_scaled
        FROM cp_st WHERE sd > n * 500000
    )
    SELECT * FROM cp_al
    """,
)
def q_events_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM change-point alarms per event type
    (operators/changepoint.py cusum_changepoints — Page's control chart
    via the closed prefix form, exact n-cleared BIGINT arithmetic) over
    a series with a PLANTED +25 level shift in each group's second half
    — the detector must flag the shifted region upward and the
    pre-shift region downward (both relative to the contaminated mean),
    which the oracle replays bit-for-bit with the same window algebra.
    Slack 10 value-units, threshold 500 value-units."""
    from .operators.changepoint import cusum_changepoints

    w_grp = Window.partitionBy("event_type")
    w_ord = w_grp.orderBy(F.expr("unix_micros(CAST(ts AS TIMESTAMP))"), "event_id")
    shifted = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "ts", "event_id", "value")
        .filter(F.col("value").isNotNull())
        .withColumn("__tus", F.expr("unix_micros(CAST(ts AS TIMESTAMP))"))
        .withColumn("__seq", F.row_number().over(w_ord))
        .withColumn(
            "__n",
            F.count("*").over(
                w_grp.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
        .withColumn(
            "shifted_value",
            F.when(
                F.col("__seq") * 2 > F.col("__n"), F.col("value") + F.lit(25.0)
            ).otherwise(F.col("value")),
        )
    )
    return cusum_changepoints(
        shifted,
        value_col="shifted_value",
        order_cols=["__tus", "event_id"],
        group_cols=["event_type"],
        slack_milli=10000,
        threshold_milli=500000,
    )


@register(
    "events_interpolate",
    """
    WITH li_obs AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CAST(round(value * 1000, 0) AS BIGINT) AS vq
        FROM events WHERE event_type = 'click'
    ),
    li_rep AS (
        SELECT user_id, bucket, vq FROM (
            SELECT user_id, ts_us // 21600000000 AS bucket, vq,
                   row_number() OVER (
                       PARTITION BY user_id, ts_us // 21600000000
                       ORDER BY ts_us DESC, event_id DESC
                   ) AS rn
            FROM li_obs
        ) li_r WHERE rn = 1
    ),
    li_span AS (
        SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
        FROM li_rep GROUP BY user_id
    ),
    li_grid AS (
        SELECT user_id, unnest(generate_series(lo, hi)) AS bucket
        FROM li_span
    ),
    li_j AS (
        SELECT g.user_id, g.bucket, r.vq
        FROM li_grid g LEFT JOIN li_rep r USING (user_id, bucket)
    ),
    li_n AS (
        SELECT user_id, bucket, vq,
               last_value(CASE WHEN vq IS NOT NULL THEN bucket END
                          IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY bucket
                   ROWS UNBOUNDED PRECEDING) AS t0,
               last_value(vq IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY bucket
                   ROWS UNBOUNDED PRECEDING) AS v0,
               first_value(CASE WHEN vq IS NOT NULL THEN bucket END
                           IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY bucket
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS t1,
               first_value(vq IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY bucket
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v1
        FROM li_j
    )
    SELECT user_id, CAST(bucket * 21600000000 AS BIGINT) AS bucket_ts_us,
           CAST(CASE WHEN vq IS NOT NULL THEN vq
                ELSE v0 + ((v1 - v0) * (bucket - t0)
                     - (((v1 - v0) * (bucket - t0)) % (t1 - t0)
                        + (t1 - t0)) % (t1 - t0)) // (t1 - t0)
           END AS BIGINT) AS value_scaled,
           vq IS NOT NULL AS is_observed
    FROM li_n
    """,
)
def q_events_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-grid resample + exact LINEAR interpolation
    (operators/timeseries.py interpolate): each user's click `value`
    series on a 6-hour grid, gap cells filled by integer-exact linear
    interpolation between the neighboring representatives — milli-
    quantized BIGINT values, positive-remainder floor division (the
    only form Spark div and SQL // agree on for negative slopes).  The
    oracle replays rep selection, grid, neighbor windows and the
    cleared interpolation verbatim."""
    from .operators.timeseries import interpolate

    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select(
            "user_id",
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "value",
        )
    )
    return interpolate(
        e,
        step_us=21_600_000_000,
        key_col="user_id",
        ts_col="ts_us",
        value_col="value",
        tie_cols=["event_id"],
        quant_scale=1000,
    )


@register(
    "part_abc_classes",
    """
    WITH abc_rev AS (
        SELECT l_partkey,
               CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
                    AS BIGINT) AS rev
        FROM lineitem GROUP BY l_partkey
    ),
    abc_rk AS (
        SELECT l_partkey, rev,
               row_number() OVER (ORDER BY rev DESC, l_partkey) AS rank,
               sum(rev) OVER (ORDER BY rev DESC, l_partkey
                              ROWS UNBOUNDED PRECEDING) AS cum_value,
               sum(rev) OVER () AS total
        FROM abc_rev
    )
    SELECT l_partkey, rev AS value, CAST(rank AS BIGINT) AS rank,
           CAST(cum_value AS BIGINT) AS cum_value,
           CAST((1000 * cum_value) // total AS BIGINT) AS cum_milli,
           CASE WHEN (cum_value - rev) * 1000 < 800 * total THEN 'A'
                WHEN (cum_value - rev) * 1000 < 950 * total THEN 'B'
                ELSE 'C' END AS abc_class
    FROM abc_rk
    """,
)
def q_part_abc_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC/Pareto revenue classification of parts (operators/pareto.py
    abc_classes): per-part revenue in exact cent-percent units
    (round(price*100) x (100 - round(discount*100)) — both roundings of
    raw doubles, off the half boundary), ranked and tiered at 80/95%
    cumulative share by pure integer cross-multiplication.  The global
    ranking window runs over the PART aggregates (dimension-sized), the
    canonical ABC shape.  The oracle replays revenue, ranking,
    cumulative shares and the exclusive-share tier rule verbatim."""
    from .operators.pareto import abc_classes

    rev = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
                * (
                    F.lit(100)
                    - F.round(F.col("l_discount") * 100, 0).cast("bigint")
                )
            ).alias("rev")
        )
    )
    return abc_classes(
        rev, value_col="rev", id_cols=["l_partkey"],
        threshold_a_milli=800, threshold_b_milli=950,
    )


@register(
    "event_funnel_latency",
    """
    WITH fl_ev AS (
        SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
    ),
    fl_s1 AS (
        SELECT user_id, min(ts_us) AS t1_us
        FROM fl_ev WHERE event_type = 'view' GROUP BY user_id
    ),
    fl_s2 AS (
        SELECT s.user_id, s.t1_us, min(e.ts_us) AS t2_us
        FROM fl_s1 s LEFT JOIN fl_ev e
          ON e.user_id = s.user_id AND e.event_type = 'click'
         AND e.ts_us > s.t1_us AND e.ts_us <= s.t1_us + 1800000000
        GROUP BY s.user_id, s.t1_us
    ),
    fl_s3 AS (
        SELECT s.user_id, s.t1_us, s.t2_us, min(e.ts_us) AS t3_us
        FROM fl_s2 s LEFT JOIN fl_ev e
          ON e.user_id = s.user_id AND e.event_type = 'purchase'
         AND e.ts_us > s.t2_us AND e.ts_us <= s.t2_us + 1800000000
        GROUP BY s.user_id, s.t1_us, s.t2_us
    ),
    fl_lat AS (
        SELECT t3_us - t1_us AS lat_us FROM fl_s3 WHERE t3_us IS NOT NULL
    ),
    fl_o AS (
        SELECT lat_us,
               row_number() OVER (ORDER BY lat_us) AS orn,
               count(*) OVER () AS n
        FROM fl_lat
    )
    SELECT CAST(max(n) AS BIGINT) AS n_converted,
           CAST(max(CASE WHEN orn = (25 * n + 99) // 100
                    THEN lat_us END) AS BIGINT) AS p25_us,
           CAST(max(CASE WHEN orn = (50 * n + 99) // 100
                    THEN lat_us END) AS BIGINT) AS p50_us,
           CAST(max(CASE WHEN orn = (75 * n + 99) // 100
                    THEN lat_us END) AS BIGINT) AS p75_us,
           CAST(max(CASE WHEN orn = (90 * n + 99) // 100
                    THEN lat_us END) AS BIGINT) AS p90_us
    FROM fl_o
    """,
)
def q_event_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert percentiles for the view->click->purchase funnel
    (operators/funnel.py funnel_match composed with the nearest-rank
    order-statistic pick): converted users' first-touch-to-purchase
    latency in exact BIGINT µs, summarized as p25/p50/p75/p90 by the
    same nearest-rank rule the sample sketch uses (verbatim values, no
    interpolation — the only quantile form that hash-compares).  The
    ranking runs over CONVERTED USERS (funnel output, not the event
    stream) on the census-decomposed distributed_rank (r11 — this was
    the registry's last data-sized unpartitioned window; the value at a
    rank under a value-only order is tie-permutation-invariant, so
    ranking by (lat_us, user_id) replays the oracle's lat_us-only
    window verbatim).  The oracle replays funnel chain, latencies and
    rank picks verbatim."""
    from .operators.funnel import funnel_match
    from .operators.ranking import distributed_rank

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    lat = (
        funnel_match(
            e, steps=["view", "click", "purchase"], within_us=1_800_000_000
        )
        .filter(F.col("converted"))
        .select(
            "user_id", (F.col("t3_us") - F.col("t1_us")).alias("lat_us")
        )
    )
    rk = distributed_rank(
        lat, metric_col="lat_us", tie_cols=["user_id"], rank_col="orn"
    )
    n = rk.n_total

    def pick(p: int):
        return F.max(
            F.when(
                F.col("orn") == F.lit((p * n + 99) // 100),
                F.col("lat_us"),
            )
        ).alias(f"p{p}_us")

    return rk.df.agg(
        # NULL (not 0) on an empty conversion set: the oracle's
        # max(n)-over-empty is NULL and the hash compare sees both
        F.lit(n if n > 0 else None).cast("bigint").alias("n_converted"),
        pick(25), pick(50), pick(75), pick(90),
    )


@register(
    "event_attribution",
    """
    WITH at_ev AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
               CAST(floor(value * 1000) AS BIGINT) AS value_milli
        FROM events
    ),
    at_c AS (
        SELECT user_id, event_id AS conv_id, ts_us AS ct, value_milli
        FROM at_ev WHERE event_type = 'purchase' AND value_milli IS NOT NULL
    ),
    at_t AS (
        SELECT user_id, event_id AS touch_id, ts_us AS touch_ts_us
        FROM at_ev WHERE event_type IN ('view', 'click')
    ),
    at_j AS (
        SELECT c.conv_id, t.touch_id, c.user_id, t.touch_ts_us,
               c.value_milli
        FROM at_c c JOIN at_t t ON t.user_id = c.user_id
         AND t.touch_ts_us < c.ct
         AND t.touch_ts_us >= c.ct - 1800000000
    ),
    at_w AS (
        SELECT *,
               count(*) OVER (PARTITION BY conv_id) AS n_touches,
               row_number() OVER (
                   PARTITION BY conv_id
                   ORDER BY touch_ts_us, touch_id) AS rn
        FROM at_j
    )
    SELECT conv_id, touch_id, user_id, touch_ts_us,
           CAST(n_touches AS BIGINT) AS n_touches,
           CAST(value_milli // n_touches
                + CASE WHEN rn = 1 THEN value_milli % n_touches
                       ELSE 0 END AS BIGINT) AS credit_milli
    FROM at_w
    """,
)
def q_event_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution (operators/funnel.py
    linear_attribution): each purchase's milli-quantized value split
    equally across the user's view/click touches in the preceding 30
    minutes, remainder to the earliest touch — exact integer credits
    that sum back to the conversion value.  One user-keyed equi-join +
    one per-conversion window; the oracle replays joins, counts and the
    remainder policy verbatim."""
    from .operators.funnel import linear_attribution

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.floor(F.col("value") * 1000).cast("bigint").alias("value_milli"),
    ).filter(
        (F.col("event_type") != "purchase")
        | F.col("value_milli").isNotNull()
    )
    return linear_attribution(
        e,
        conversion_type="purchase",
        touch_types=["view", "click"],
        within_us=1_800_000_000,
    )


@register(
    "event_attribution_position",
    """
    WITH pa_ev AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
               CAST(floor(value * 1000) AS BIGINT) AS value_milli
        FROM events
    ),
    pa_c AS (
        SELECT user_id, event_id AS conv_id, ts_us AS ct, value_milli
        FROM pa_ev
        WHERE event_type = 'purchase' AND value_milli IS NOT NULL
    ),
    pa_t AS (
        SELECT user_id, event_id AS touch_id, ts_us AS touch_ts_us
        FROM pa_ev WHERE event_type IN ('view', 'click')
    ),
    pa_j AS (
        SELECT c.conv_id, t.touch_id, c.user_id, t.touch_ts_us,
               c.value_milli
        FROM pa_c c JOIN pa_t t ON t.user_id = c.user_id
         AND t.touch_ts_us < c.ct
         AND t.touch_ts_us >= c.ct - 1800000000
    ),
    pa_w AS (
        SELECT *,
               count(*) OVER (PARTITION BY conv_id) AS n_touches,
               row_number() OVER (
                   PARTITION BY conv_id
                   ORDER BY touch_ts_us, touch_id) AS rn,
               (value_milli * 40) // 100 AS edge,
               value_milli - 2 * ((value_milli * 40) // 100) AS pool
        FROM pa_j
    )
    SELECT conv_id, touch_id, user_id, touch_ts_us,
           CAST(n_touches AS BIGINT) AS n_touches,
           CAST(rn AS BIGINT) AS position,
           CAST(CASE
                WHEN n_touches = 1 THEN value_milli
                WHEN n_touches = 2 THEN value_milli // 2
                     + CASE WHEN rn = 1 THEN value_milli % 2 ELSE 0 END
                WHEN rn = 1 OR rn = n_touches THEN edge
                ELSE pool // (n_touches - 2)
                     + CASE WHEN rn = 2 THEN pool % (n_touches - 2)
                            ELSE 0 END
           END AS BIGINT) AS credit_milli
    FROM pa_w
    """,
    headline=True,
)
def q_event_attribution_position(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Position-based (U-shaped) attribution (operators/funnel.py
    position_attribution) — the triad-completing third model beside
    linear and time-decay: first and last touches take 40% each, the
    middles split the rest, every credit an exact integer summing back
    to the conversion value (floors + remainder-to-earliest-middle
    policy).  Same user-keyed join + per-conversion windows as the
    siblings; the oracle replays the edge/pool algebra verbatim."""
    from .operators.funnel import position_attribution

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.floor(F.col("value") * 1000).cast("bigint").alias("value_milli"),
    )
    return position_attribution(
        e,
        conversion_type="purchase",
        touch_types=["view", "click"],
        within_us=1_800_000_000,
    )


@register(
    "events_kmv_cube",
    """
    WITH kc_h AS (
        SELECT DISTINCT event_type,
               epoch_us(ts) // 86400000000 AS day,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                   AS BIGINT) AS hv
        FROM events WHERE user_id IS NOT NULL
    ),
    kc_td AS (
        SELECT 'type_day' AS level, event_type, day, hv FROM (
            SELECT event_type, day, hv, row_number() OVER (
                PARTITION BY event_type, day ORDER BY hv) AS rn
            FROM kc_h) kc_i WHERE rn <= 32
    ),
    kc_t AS (
        SELECT 'type' AS level, event_type, CAST(NULL AS BIGINT) AS day,
               hv FROM (
            SELECT event_type, hv, row_number() OVER (
                PARTITION BY event_type ORDER BY hv) AS rn
            FROM (SELECT DISTINCT event_type, hv FROM kc_h) kc_j
        ) kc_k WHERE rn <= 32
    ),
    kc_d AS (
        SELECT 'day' AS level, CAST(NULL AS VARCHAR) AS event_type, day,
               hv FROM (
            SELECT day, hv, row_number() OVER (
                PARTITION BY day ORDER BY hv) AS rn
            FROM (SELECT DISTINCT day, hv FROM kc_h) kc_l
        ) kc_m WHERE rn <= 32
    ),
    kc_g AS (
        SELECT 'total' AS level, CAST(NULL AS VARCHAR) AS event_type,
               CAST(NULL AS BIGINT) AS day, hv FROM (
            SELECT hv, row_number() OVER (ORDER BY hv) AS rn
            FROM (SELECT DISTINCT hv FROM kc_h) kc_n
        ) kc_o WHERE rn <= 32
    ),
    kc_all AS (
        SELECT * FROM kc_td UNION ALL SELECT * FROM kc_t
        UNION ALL SELECT * FROM kc_d UNION ALL SELECT * FROM kc_g
    )
    SELECT level, event_type, day, CAST(count(*) AS BIGINT) AS n_seen,
           CASE WHEN count(*) = 32 THEN max(hv) END AS kth_hash,
           CASE WHEN count(*) < 32 THEN CAST(count(*) AS DOUBLE)
                ELSE round(31.0 * 1152921504606846976.0 / max(hv), 6)
           END AS est_distinct
    FROM kc_all GROUP BY level, event_type, day
    """,
)
def q_events_kmv_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user rollup CUBE from ONE set of KMV sketches
    (operators/sketch.py kmv_sketch/kmv_merge/kmv_estimate): the
    (type, day) base sketches are built once from raw data, then every
    coarser cell — per type, per day, grand total — comes from MERGING
    them (k-smallest-of-union), never from re-scanning facts.  The
    oracle sketches each granularity DIRECTLY from the raw table, so
    the driver's hash compare proves the merge law across the whole
    hierarchy at once — reaggregable distinct counts are THE reason
    sketches replace exact counts at 100 TB."""
    from .operators.sketch import kmv_estimate, kmv_merge, kmv_sketch

    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            "unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000"
        ).alias("day"),
        "user_id",
    )
    base = kmv_sketch(
        e, value_col="user_id", group_cols=["event_type", "day"], k=32
    ).localCheckpoint(eager=True)

    def level(name, groups, null_cols):
        # project the base sketch to (groups, hv) BEFORE merging: the
        # rolled-up dimension column must not survive into the merge's
        # distinct, or the same hash observed under two rolled-up values
        # would count twice in the re-min
        est = kmv_estimate(
            kmv_merge([base.select(*groups, "hv")], group_cols=groups, k=32),
            group_cols=groups,
            k=32,
        ).withColumn("level", F.lit(name))
        for c, t in null_cols.items():
            est = est.withColumn(c, F.lit(None).cast(t))
        return est.select(
            "level", "event_type", "day", "n_seen", "kth_hash",
            "est_distinct",
        )

    return (
        level("type_day", ["event_type", "day"], {})
        .unionByName(level("type", ["event_type"], {"day": "bigint"}))
        .unionByName(level("day", ["day"], {"event_type": "string"}))
        .unionByName(
            level("total", [], {"event_type": "string", "day": "bigint"})
        )
    )


@register(
    "events_hll_distinct",
    """
    WITH hll_h AS (
        SELECT event_type,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                    AS BIGINT) AS hv
        FROM events WHERE user_id IS NOT NULL
    ),
    hll_r AS (
        SELECT event_type, hv >> 54 AS bucket,
               hv & 18014398509481983 AS r
        FROM hll_h
    ),
    hll_reg AS (
        SELECT event_type, bucket,
               max(CASE WHEN r = 0 THEN 55
                        ELSE 55 - length(bin(r)) END) AS reg
        FROM hll_r GROUP BY event_type, bucket
    ),
    hll_e AS (
        SELECT event_type,
               CAST(64 - count(*) AS BIGINT) AS zero_buckets,
               CAST(sum(CAST(1 AS BIGINT) << (55 - reg))
                    + (64 - count(*)) * 36028797018963968
                    AS BIGINT) AS reg_denom
        FROM hll_reg GROUP BY event_type
    ),
    hll_x AS (
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
        FROM events GROUP BY event_type
    )
    SELECT e.event_type, e.zero_buckets, e.reg_denom,
           round(104629932386080576765952000.0 / e.reg_denom / 1000000.0, 6)
               AS est_distinct,
           x.exact_distinct
    FROM hll_e e JOIN hll_x x USING (event_type)
    """,
)
def q_events_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count sketch (operators/sketch.py
    hll_sketch/hll_estimate, Flajolet et al. 2007): per event type,
    m = 64 max-rho registers estimate the distinct-user count via the
    harmonic mean, joined against the exact count for an honest error
    readout.  Registers are md5-derived exact integers and the
    estimator's denominator is an exact BIGINT (2^(w+1)-scaled), so the
    oracle replays registers AND estimate bit-for-bit — the one double
    division chain is IEEE-identical.  Vs the KMV twin above: bounded
    64-cell state per group forever, merge = cellwise max (idempotent —
    at-least-once-safe), and the build is ONE combinable groupBy with
    no window pass."""
    from .operators.sketch import hll_estimate, hll_sketch

    e = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    sk = hll_sketch(e, value_col="user_id", group_cols=["event_type"], p=6)
    est = hll_estimate(sk, group_cols=["event_type"], p=6)
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, "event_type")


@register(
    "events_geofence",
    """
    WITH pg_c AS (
        SELECT n_nationkey AS pid,
               CAST(('0x' || substr(md5('pgx|' || CAST(n_nationkey AS VARCHAR)),
                     1, 15)) AS BIGINT) % 800 + 100 AS cx,
               CAST(('0x' || substr(md5('pgy|' || CAST(n_nationkey AS VARCHAR)),
                     1, 15)) AS BIGINT) % 800 + 100 AS cy,
               CAST(('0x' || substr(md5('pge|' || CAST(n_nationkey AS VARCHAR)),
                     1, 15)) AS BIGINT) % 100 + 20 AS re,
               CAST(('0x' || substr(md5('pgn|' || CAST(n_nationkey AS VARCHAR)),
                     1, 15)) AS BIGINT) % 100 + 20 AS rn,
               CAST(('0x' || substr(md5('pgw|' || CAST(n_nationkey AS VARCHAR)),
                     1, 15)) AS BIGINT) % 100 + 20 AS rw,
               CAST(('0x' || substr(md5('pgs|' || CAST(n_nationkey AS VARCHAR)),
                     1, 15)) AS BIGINT) % 100 + 20 AS rs
        FROM nation
    ),
    pg_v AS (
        SELECT pid, 0 AS i, cx + re AS vx, cy AS vy FROM pg_c
        UNION ALL SELECT pid, 1, cx, cy + rn FROM pg_c
        UNION ALL SELECT pid, 2, cx - rw, cy FROM pg_c
        UNION ALL SELECT pid, 3, cx, cy - rs FROM pg_c
    ),
    pg_e AS (
        SELECT a.pid, a.vx AS x1, a.vy AS y1, b.vx AS x2, b.vy AS y2
        FROM pg_v a JOIN pg_v b ON a.pid = b.pid AND b.i = (a.i + 1) % 4
    ),
    pg_p AS (
        SELECT event_id,
               CAST(('0x' || substr(md5('spx|' || CAST(event_id AS VARCHAR)),
                     1, 15)) AS BIGINT) % 1000 AS px,
               CAST(('0x' || substr(md5('spy|' || CAST(event_id AS VARCHAR)),
                     1, 15)) AS BIGINT) % 1000 AS py
        FROM events WHERE event_type = 'purchase'
    ),
    pg_t AS (
        SELECT p.event_id, e.pid,
               SUM(CASE WHEN ((e.y1 > p.py) <> (e.y2 > p.py))
                     AND (CASE WHEN e.y2 > e.y1
                          THEN (e.x2 - e.x1) * (p.py - e.y1)
                               - (p.px - e.x1) * (e.y2 - e.y1) > 0
                          ELSE (e.x2 - e.x1) * (p.py - e.y1)
                               - (p.px - e.x1) * (e.y2 - e.y1) < 0 END)
                   THEN 1 ELSE 0 END) AS c,
               BOOL_OR((e.x2 - e.x1) * (p.py - e.y1)
                           - (p.px - e.x1) * (e.y2 - e.y1) = 0
                   AND p.px BETWEEN least(e.x1, e.x2) AND greatest(e.x1, e.x2)
                   AND p.py BETWEEN least(e.y1, e.y2) AND greatest(e.y1, e.y2))
                   AS b
        FROM pg_p p CROSS JOIN pg_e e
        GROUP BY p.event_id, e.pid
    )
    SELECT event_id AS id, CAST(pid AS BIGINT) AS poly_id,
           b AS on_boundary
    FROM pg_t WHERE c % 2 = 1 OR b
    """,
    headline=True,
)
def q_events_geofence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact point-in-polygon geofence join (operators/spatial.py
    point_in_polygon, the ST_Contains workhorse): purchase events get
    the same md5-derived 1000x1000 planar coordinates as the spatial
    tier; 25 deterministic kite-shaped fences (one per nation, center +
    four md5-derived arm lengths) are tested by integer even-odd ray
    casting over a bbox-cell equi-join — never points x polygons.  The
    oracle is the BRUTE-FORCE cross join over polygon edges (an
    independent algorithm with no blocking), so the hash compare proves
    both the blocking's completeness and the crossing/boundary algebra
    bit-for-bit."""
    from .operators.spatial import point_in_polygon

    def h(tag: str, key: str, mod: int, base: int) -> F.Column:
        payload = F.concat(
            F.lit(tag + "|"), F.col(key).cast("string")
        ).cast("binary")
        return (
            F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast(
                "bigint"
            )
            % mod
            + base
        )

    polys = (
        load_table(spark, sf_dir, "nation")
        .select(
            F.col("n_nationkey").alias("pid"),
            h("pgx", "n_nationkey", 800, 100).alias("cx"),
            h("pgy", "n_nationkey", 800, 100).alias("cy"),
            h("pge", "n_nationkey", 100, 20).alias("re"),
            h("pgn", "n_nationkey", 100, 20).alias("rn"),
            h("pgw", "n_nationkey", 100, 20).alias("rw"),
            h("pgs", "n_nationkey", 100, 20).alias("rs"),
        )
        .select(
            "pid",
            F.expr(
                "array(named_struct('x', cx + re, 'y', cy), "
                "named_struct('x', cx, 'y', cy + rn), "
                "named_struct('x', cx - rw, 'y', cy), "
                "named_struct('x', cx, 'y', cy - rs))"
            ).alias("verts"),
        )
    )
    pts = (
        spread(load_table(spark, sf_dir, "events"))
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            (h("spx", "event_id", 1000, 0)).alias("x"),
            (h("spy", "event_id", 1000, 0)).alias("y"),
        )
        # Lazy cut (r13): the operator's overflow guards and join-key
        # null filters otherwise collapse into this projection and
        # re-derive the md5 coordinate chains ~6x per row inside the
        # pushed-down scan filter (measured 1.6s -> 0.5s at sf0.1).
        # The materialized rows are (id, x, y) — the §8 "decide with
        # small rows" shape, narrow at any corpus size.
        .localCheckpoint(eager=False)
    )
    return point_in_polygon(
        pts,
        polys,
        x_col="x",
        y_col="y",
        id_col="event_id",
        poly_id_col="pid",
        vertices_col="verts",
        cell_size=64,
    )


@register(
    "events_holt_trend",
    """
    WITH RECURSIVE ht_c AS (
        SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    ht_o AS (
        SELECT event_type, hour, n,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY hour) AS rn
        FROM ht_c
    ),
    ht_s AS (
        SELECT event_type, hour, rn, (n << 20) AS l, CAST(0 AS BIGINT) AS b
        FROM ht_o WHERE rn = 1
        UNION ALL
        SELECT o.event_type, o.hour, o.rn,
               ((o.n << 20) + s.l + s.b) >> 1,
               ((o.n << 20) - s.l + 3 * s.b) >> 2
        FROM ht_s s JOIN ht_o o
          ON o.event_type = s.event_type AND o.rn = s.rn + 1
    )
    SELECT event_type, hour, CAST(rn AS BIGINT) AS step,
           l AS level_num, b AS trend_num,
           CAST(l AS DOUBLE) / 1048576.0 AS level,
           CAST(b AS DOUBLE) / 1048576.0 AS trend,
           CAST(l + 4 * b AS DOUBLE) / 1048576.0 AS forecast
    FROM ht_s
    """,
    headline=True,
)
def q_events_holt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend double exponential smoothing
    (operators/timeseries.py holt_smooth, alpha = beta = 1/2): per
    event type, the hourly event-count series is smoothed by the exact
    fixed-point integer recurrence (20 fractional bits, one arithmetic-
    shift rounding per step — never a float in the state) and projected
    4 hours ahead.  The oracle replays every (level, trend) state
    bit-for-bit via a RECURSIVE CTE marching the same recurrence down
    each key's row sequence — an independent formulation of the fold —
    and the exported doubles are exact-integer-over-power-of-two
    divisions, engine-identical."""
    from .operators.timeseries import holt_smooth

    counts = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr(
                "unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000"
            ).alias("hour"),
        )
        .groupBy("event_type", "hour")
        .agg(F.count("*").alias("n"))
    )
    return holt_smooth(
        counts,
        ts_col="hour",
        value_col="n",
        key_cols=["event_type"],
        quant_scale=1,
        frac_bits=20,
        forecast_steps=4,
    )


@register(
    "events_acf",
    """
    WITH acf_base AS (
        SELECT event_type, epoch_us(ts) AS ts_us, event_id,
               CAST(floor(value * 1000) AS BIGINT) AS x
        FROM events WHERE value IS NOT NULL
    ),
    acf_stats AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS s
        FROM acf_base GROUP BY event_type
    ),
    acf_dev AS (
        SELECT b.event_type, b.ts_us, b.event_id, st.n,
               b.x - (st.s // st.n) AS d
        FROM acf_base b JOIN acf_stats st USING (event_type)
    ),
    acf_lead AS (
        SELECT event_type, n, d,
               lead(d, 1) OVER w AS d1, lead(d, 2) OVER w AS d2,
               lead(d, 3) OVER w AS d3, lead(d, 4) OVER w AS d4
        FROM acf_dev
        WINDOW w AS (PARTITION BY event_type ORDER BY ts_us, event_id)
    ),
    acf_agg AS (
        SELECT event_type, CAST(max(n) AS BIGINT) AS n,
               CAST(sum(d * d) AS BIGINT) AS den_scaled,
               CAST(sum(d * d1) AS BIGINT) AS n1,
               CAST(sum(d * d2) AS BIGINT) AS n2,
               CAST(sum(d * d3) AS BIGINT) AS n3,
               CAST(sum(d * d4) AS BIGINT) AS n4
        FROM acf_lead GROUP BY event_type
    ),
    acf_long AS (
        SELECT event_type, CAST(1 AS INTEGER) AS lag, n,
               COALESCE(n1, 0) AS num_scaled, den_scaled FROM acf_agg
        UNION ALL
        SELECT event_type, CAST(2 AS INTEGER), n,
               COALESCE(n2, 0), den_scaled FROM acf_agg
        UNION ALL
        SELECT event_type, CAST(3 AS INTEGER), n,
               COALESCE(n3, 0), den_scaled FROM acf_agg
        UNION ALL
        SELECT event_type, CAST(4 AS INTEGER), n,
               COALESCE(n4, 0), den_scaled FROM acf_agg
    )
    SELECT event_type, lag, n, num_scaled, den_scaled,
           CAST(num_scaled AS DOUBLE)
               / CAST(CASE WHEN den_scaled > 0 THEN den_scaled END
                      AS DOUBLE) AS acf
    FROM acf_long
    """,
    headline=True,
)
def q_events_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-series autocorrelation at lags 1-4
    (operators/timeseries.py acf — the Box-Jenkins identification
    pass): per event type, values quantize to millis, deviations center
    on the truncated integer mean (both engines truncate toward zero —
    verified), and every r_k is one double division of two exact BIGINT
    sums, so the hash compare covers the doubles.  The oracle replays
    the identical algebra via lead() windows; the Spark side stacks the
    group constants, all four lag frames and the final groupBy on ONE
    hash exchange (plan-gated)."""
    from .operators.timeseries import acf

    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "value",
    )
    return acf(
        e,
        value_col="value",
        order_cols=["ts_us", "event_id"],
        group_cols=["event_type"],
        max_lag=4,
        quant_scale=1000,
    )


@register(
    "events_trend_test",
    """
    WITH mk_d AS (
        SELECT event_type, epoch_us(ts) // 86400000000 AS d,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    mk_p AS (
        SELECT a.event_type,
               CASE WHEN b.y > a.y THEN 1
                    WHEN b.y < a.y THEN -1 ELSE 0 END AS sgn,
               (1000 * (b.y - a.y)) // (b.d - a.d) AS slope
        FROM mk_d a JOIN mk_d b
          ON a.event_type = b.event_type AND b.d > a.d
    ),
    mk_s AS (
        SELECT event_type, CAST(sum(sgn) AS BIGINT) AS s
        FROM mk_p GROUP BY event_type
    ),
    mk_med AS (
        SELECT event_type, slope AS slope_milli FROM (
            SELECT event_type, slope,
                   row_number() OVER (
                       PARTITION BY event_type ORDER BY slope) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS m
            FROM mk_p)
        WHERE rn = (m + 1) // 2
    ),
    mk_t AS (
        SELECT event_type, CAST(sum(c) AS BIGINT) AS n_points,
               CAST(sum(c * (c - 1) * (2 * c + 5)) AS BIGINT) AS tie18
        FROM (SELECT event_type, y, CAST(count(*) AS BIGINT) AS c
              FROM mk_d GROUP BY event_type, y)
        GROUP BY event_type
    ),
    mk_v AS (
        SELECT t.event_type, t.n_points,
               coalesce(s.s, 0) AS s,
               CAST(t.n_points * (t.n_points - 1) * (2 * t.n_points + 5)
                    - t.tie18 AS BIGINT) AS var18,
               m.slope_milli
        FROM mk_t t
        LEFT JOIN mk_s s USING (event_type)
        LEFT JOIN mk_med m USING (event_type)
    )
    SELECT event_type, n_points, s, var18, slope_milli,
           CASE WHEN s = 0 THEN CAST(0 AS BIGINT)
                WHEN var18 > 0 THEN
                    CAST((18000 * CAST(abs(s) - 1 AS HUGEINT)
                          * (abs(s) - 1)) // var18 AS BIGINT)
           END AS z2_milli
    FROM mk_v
    """,
    headline=True,
)
def q_events_trend_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test + Theil-Sen slope per event type
    (operators/timeseries.py mann_kendall): the daily event-count
    series per type is census'd once, then all ordered day pairs
    (days²/2 per type — calendar-bounded, never events²) yield the
    exact S statistic, the tie-corrected 18·Var(S), the continuity-
    corrected z² in milli (DECIMAL(38,0)/HUGEINT) and the lower-median
    Theil-Sen slope, whose per-pair divisions TRUNCATE toward zero in
    both engines (y deltas go negative; Spark ``div`` and DuckDB ``//``
    both truncate — verified ``-7 // 2 = -3`` in DuckDB — so the
    slopes replay verbatim with no floor-division shim).  The
    timeseries family's significance test next to holt/acf/mase, which
    describe but do not test."""
    from .operators.timeseries import mann_kendall

    daily = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr(
                "unix_micros(cast(ts as timestamp)) div 86400000000"
            ).alias("d"),
        )
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    return mann_kendall(
        daily, key_cols=["event_type"], t_col="d", y_col="y"
    )


@register(
    "event_attribution_decay",
    """
    WITH ad_ev AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
               CAST(floor(value * 1000) AS BIGINT) AS value_milli
        FROM events
    ),
    ad_c AS (
        SELECT user_id, event_id AS conv_id, ts_us AS ct, value_milli
        FROM ad_ev WHERE event_type = 'purchase' AND value_milli IS NOT NULL
    ),
    ad_t AS (
        SELECT user_id, event_id AS touch_id, ts_us AS touch_ts_us
        FROM ad_ev WHERE event_type IN ('view', 'click')
    ),
    ad_j AS (
        SELECT c.conv_id, t.touch_id, c.user_id, t.touch_ts_us,
               c.value_milli,
               least((c.ct - t.touch_ts_us) // 300000000, 20) AS age_halves
        FROM ad_c c JOIN ad_t t ON t.user_id = c.user_id
         AND t.touch_ts_us < c.ct
         AND t.touch_ts_us >= c.ct - 1800000000
    ),
    ad_w AS (
        SELECT *, (CAST(1 AS BIGINT) << (20 - age_halves)) AS weight
        FROM ad_j
    ),
    ad_s AS (
        SELECT *,
               count(*) OVER (PARTITION BY conv_id) AS n_touches,
               CAST(sum(weight) OVER (PARTITION BY conv_id)
                    AS BIGINT) AS wsum,
               row_number() OVER (
                   PARTITION BY conv_id
                   ORDER BY weight DESC, touch_ts_us DESC, touch_id) AS rn
        FROM ad_w
    ),
    ad_f AS (
        SELECT *, (value_milli * weight) // wsum AS fl,
               CAST(sum((value_milli * weight) // wsum)
                    OVER (PARTITION BY conv_id) AS BIGINT) AS fsum
        FROM ad_s
    )
    SELECT conv_id, touch_id, user_id, touch_ts_us,
           CAST(n_touches AS BIGINT) AS n_touches,
           CAST(age_halves AS BIGINT) AS age_halves, weight,
           CAST(fl + CASE WHEN rn = 1 THEN value_milli - fsum
                          ELSE 0 END AS BIGINT) AS credit_milli
    FROM ad_f
    """,
)
def q_event_attribution_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay multi-touch attribution (operators/funnel.py
    decay_attribution): each purchase's milli value split across its
    view/click touches in the preceding 30 minutes with weight halving
    every 5 minutes of age — weights are exact powers of two
    (binary-fraction trick), credits exact integers summing back to the
    conversion value, remainder to the most recent touch.  The oracle
    replays join, age bucketing, weights, floors and the remainder
    policy verbatim (all-positive operands, so SQL // and Spark div
    agree)."""
    from .operators.funnel import decay_attribution

    e = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            F.floor(F.col("value") * 1000)
            .cast("bigint")
            .alias("value_milli"),
        )
        .filter(
            (F.col("event_type") != "purchase")
            | F.col("value_milli").isNotNull()
        )
    )
    return decay_attribution(
        e,
        conversion_type="purchase",
        touch_types=["view", "click"],
        within_us=1_800_000_000,
        half_life_us=300_000_000,
    )


@register(
    "customer_entity_resolution",
    """
    WITH RECURSIVE er_d AS (
        SELECT c_custkey,
               CAST(floor(c_acctbal * 1000) AS BIGINT) AS acct_milli,
               (c_custkey // 4) % 3 AS variant,
               substr(md5('er|' || CAST((c_custkey // 4) // 3 AS VARCHAR)),
                      1, 12) AS base
        FROM customer WHERE c_custkey % 4 = 0
    ),
    er_k AS (
        SELECT c_custkey, acct_milli,
               CASE variant
                   WHEN 1 THEN 'z' || substr(base, 2, 11)
                   WHEN 2 THEN substr(base, 1, 11)
                   ELSE base END AS key
        FROM er_d
    ),
    er_p AS (
        SELECT a.c_custkey AS ia, b.c_custkey AS ib
        FROM er_k a JOIN er_k b ON a.c_custkey < b.c_custkey
         AND abs(length(a.key) - length(b.key)) <= 2
        WHERE levenshtein(a.key, b.key) <= 2
    ),
    er_e AS (
        SELECT ia AS a, ib AS b FROM er_p
        UNION SELECT ib, ia FROM er_p
    ),
    er_r AS (
        SELECT a AS src, b AS dst FROM er_e
        UNION
        SELECT r.src, e.b FROM er_r r JOIN er_e e ON e.a = r.dst
    ),
    er_c AS (
        SELECT k.c_custkey,
               least(k.c_custkey,
                     coalesce(min(r.dst), k.c_custkey)) AS component
        FROM er_k k LEFT JOIN er_r r ON r.src = k.c_custkey
        GROUP BY k.c_custkey
    )
    SELECT c.component, CAST(count(*) AS BIGINT) AS n_members,
           CAST(sum(k.acct_milli) AS BIGINT) AS total_acct_milli,
           arg_min(k.key, k.c_custkey) AS golden_key
    FROM er_c c JOIN er_k k USING (c_custkey)
    GROUP BY c.component
    """,
)
def q_customer_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution over the TPC-H customer dimension:
    deterministic dirty keys (triples of md5-derived 12-hex records with
    planted typos — substitution / truncation variants within edit
    distance 2) are re-linked by the PassJoin fuzzy join
    (operators/fuzzy.py — complete segment blocking, never all-pairs),
    clustered by connected components (operators/components.py), and
    merged into golden records (min-key survivor + exact milli balance
    rollup).  The oracle is fully independent: BRUTE-FORCE levenshtein
    pairs + a recursive-CTE transitive closure — so the hash compare
    proves PassJoin completeness AND the multi-hop component fixpoint
    AND the survivorship aggregation in one shot.  Keys are pure hex
    (ASCII), sidestepping the DuckDB-bytes vs Spark-codepoints
    levenshtein mismatch."""
    from .operators.components import dedup_survivors
    from .operators.fuzzy import fuzzy_pairs

    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 4 == 0)
        .select(
            "c_custkey",
            F.floor(F.col("c_acctbal") * 1000)
            .cast("bigint")
            .alias("acct_milli"),
            (F.expr("(c_custkey div 4) % 3")).alias("__variant"),
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("er|"),
                        F.expr("(c_custkey div 4) div 3").cast("string"),
                    ).cast("binary")
                ),
                1,
                12,
            ).alias("__base"),
        )
    )
    dirty = cust.select(
        "c_custkey",
        "acct_milli",
        F.when(
            F.col("__variant") == 1,
            F.concat(F.lit("z"), F.expr("substring(__base, 2, 11)")),
        )
        .when(F.col("__variant") == 2, F.expr("substring(__base, 1, 11)"))
        .otherwise(F.col("__base"))
        .alias("key"),
    )
    pairs = fuzzy_pairs(dirty, key_col="key", id_col="c_custkey", max_dist=2)
    clustered = dedup_survivors(dirty, pairs, id_col="c_custkey").join(
        dirty, "c_custkey"
    )
    return clustered.groupBy("component").agg(
        F.count("*").cast("bigint").alias("n_members"),
        F.sum("acct_milli").cast("bigint").alias("total_acct_milli"),
        F.min_by("key", "c_custkey").alias("golden_key"),
    )


@register(
    "events_value_bins",
    """
    SELECT event_type, event_id,
           CAST(floor(value * 1000) AS BIGINT) AS value_milli,
           CAST(ntile(8) OVER (
               PARTITION BY event_type
               ORDER BY CAST(floor(value * 1000) AS BIGINT), event_id
           ) AS BIGINT) AS bin
    FROM events WHERE value IS NOT NULL
    """,
)
def q_events_value_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth discretization (operators/stats.py equi_depth_bins,
    the KBinsDiscretizer(strategy='quantile') feature-engineering step):
    per event type, milli-quantized values split into 8 near-equal-count
    bins over the TOTAL order (value, id) — deterministic under any
    partitioning, and SQL ntile replays the split exactly (both engines
    give the first n mod k bins the extra row)."""
    from .operators.stats import equi_depth_bins

    e = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            "event_id",
            F.floor(F.col("value") * 1000).cast("bigint").alias(
                "value_milli"
            ),
        )
    )
    return equi_depth_bins(
        e,
        value_col="value_milli",
        id_col="event_id",
        n_bins=8,
        key_cols=["event_type"],
    ).withColumn("bin", F.col("bin").cast("bigint"))


@register(
    "lineitem_corr_matrix",
    """
    WITH cm_v AS (
        SELECT l_returnflag AS flag,
               CAST(l_quantity AS BIGINT) AS qty,
               CAST(floor(l_extendedprice * 1000) AS BIGINT) AS price_milli,
               CAST(floor(l_discount * 1000) AS BIGINT) AS disc_milli,
               CAST(floor(l_tax * 1000) AS BIGINT) AS tax_milli
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
          AND l_discount IS NOT NULL AND l_tax IS NOT NULL
    ),
    cm_s AS (
        SELECT flag, CAST(count(*) AS BIGINT) AS n,
               sum(qty) AS s_q, sum(price_milli) AS s_p,
               sum(disc_milli) AS s_d, sum(tax_milli) AS s_t,
               sum(qty * qty) AS p_qq, sum(qty * price_milli) AS p_qp,
               sum(qty * disc_milli) AS p_qd, sum(qty * tax_milli) AS p_qt,
               sum(price_milli * price_milli) AS p_pp,
               sum(price_milli * disc_milli) AS p_pd,
               sum(price_milli * tax_milli) AS p_pt,
               sum(disc_milli * disc_milli) AS p_dd,
               sum(disc_milli * tax_milli) AS p_dt,
               sum(tax_milli * tax_milli) AS p_tt
        FROM cm_v GROUP BY flag
    ),
    cm_p AS (
        SELECT flag, n, 'qty' AS col_a, 'price_milli' AS col_b,
               CAST(s_q AS DOUBLE) AS sa, CAST(s_p AS DOUBLE) AS sb,
               CAST(p_qq AS DOUBLE) AS saa, CAST(p_pp AS DOUBLE) AS sbb,
               CAST(p_qp AS DOUBLE) AS sab FROM cm_s
        UNION ALL SELECT flag, n, 'qty', 'disc_milli',
               CAST(s_q AS DOUBLE), CAST(s_d AS DOUBLE),
               CAST(p_qq AS DOUBLE), CAST(p_dd AS DOUBLE),
               CAST(p_qd AS DOUBLE) FROM cm_s
        UNION ALL SELECT flag, n, 'qty', 'tax_milli',
               CAST(s_q AS DOUBLE), CAST(s_t AS DOUBLE),
               CAST(p_qq AS DOUBLE), CAST(p_tt AS DOUBLE),
               CAST(p_qt AS DOUBLE) FROM cm_s
        UNION ALL SELECT flag, n, 'price_milli', 'disc_milli',
               CAST(s_p AS DOUBLE), CAST(s_d AS DOUBLE),
               CAST(p_pp AS DOUBLE), CAST(p_dd AS DOUBLE),
               CAST(p_pd AS DOUBLE) FROM cm_s
        UNION ALL SELECT flag, n, 'price_milli', 'tax_milli',
               CAST(s_p AS DOUBLE), CAST(s_t AS DOUBLE),
               CAST(p_pp AS DOUBLE), CAST(p_tt AS DOUBLE),
               CAST(p_pt AS DOUBLE) FROM cm_s
        UNION ALL SELECT flag, n, 'disc_milli', 'tax_milli',
               CAST(s_d AS DOUBLE), CAST(s_t AS DOUBLE),
               CAST(p_dd AS DOUBLE), CAST(p_tt AS DOUBLE),
               CAST(p_dt AS DOUBLE) FROM cm_s
    )
    SELECT flag, col_a, col_b, n,
           CASE WHEN (CAST(n AS DOUBLE) * saa - sa * sa) > 0
                 AND (CAST(n AS DOUBLE) * sbb - sb * sb) > 0
                THEN round((CAST(n AS DOUBLE) * sab - sa * sb)
                     / (sqrt(CAST(n AS DOUBLE) * saa - sa * sa)
                        * sqrt(CAST(n AS DOUBLE) * sbb - sb * sb)), 6)
           END AS corr
    FROM cm_p
    """,
)
def q_lineitem_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix (operators/stats.py
    corr_pairs): per returnflag, the 4x4 upper triangle over quantity /
    price / discount / tax (milli-quantized integers) from ONE
    combinable aggregate pass.  Sufficient statistics are exact
    DECIMAL(38,0) integers; the finish casts each exact integer to
    double once and runs the corr formula in a fixed IEEE expression
    order, so the oracle (HUGEINT sums, same casts, same order) matches
    bit-for-bit."""
    from .operators.stats import corr_pairs

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.floor(F.col("l_extendedprice") * 1000)
        .cast("bigint")
        .alias("price_milli"),
        F.floor(F.col("l_discount") * 1000).cast("bigint").alias(
            "disc_milli"
        ),
        F.floor(F.col("l_tax") * 1000).cast("bigint").alias("tax_milli"),
    )
    return corr_pairs(
        li,
        value_cols=["qty", "price_milli", "disc_milli", "tax_milli"],
        key_cols=["flag"],
    )


@register(
    "lineitem_weighted_quantiles",
    """
    WITH wq_d AS (
        SELECT l_returnflag AS flag,
               CAST(floor(l_extendedprice * 1000) AS BIGINT) AS price_milli,
               CAST(l_quantity AS BIGINT) AS w
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
          AND l_quantity > 0
    ),
    wq_c AS (
        SELECT flag, price_milli, w,
               CAST(sum(w) OVER (
                   PARTITION BY flag ORDER BY price_milli, w
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cumw,
               CAST(sum(w) OVER (PARTITION BY flag) AS BIGINT) AS totw
        FROM wq_d
    )
    SELECT flag, CAST(max(totw) AS BIGINT) AS total_weight,
           min(CASE WHEN 100 * cumw >= 50 * totw
                    THEN price_milli END) AS wq_p50,
           min(CASE WHEN 100 * cumw >= 90 * totw
                    THEN price_milli END) AS wq_p90,
           min(CASE WHEN 100 * cumw >= 99 * totw
                    THEN price_milli END) AS wq_p99
    FROM wq_c GROUP BY flag
    """,
)
def q_lineitem_weighted_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted quantiles (operators/stats.py weighted_quantiles):
    per returnflag, the quantity-weighted p50/p90/p99 of the milli
    extended price — the smallest value whose running weight reaches
    p% of the group total, the rank test cross-multiplied in integers.
    ONE window shuffle; the oracle replays the running-weight algebra
    verbatim."""
    from .operators.stats import weighted_quantiles

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_extendedprice") * 1000)
        .cast("bigint")
        .alias("price_milli"),
        F.col("l_quantity").cast("bigint").alias("w"),
    )
    return weighted_quantiles(
        li,
        value_col="price_milli",
        weight_col="w",
        group_cols=["flag"],
        percents=[50, 90, 99],
    )


@register(
    "events_hll_rolling",
    """
    WITH hr_obs AS (
        SELECT event_type, epoch_us(ts) // 86400000000 AS day,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                   AS BIGINT) AS hv
        FROM events WHERE user_id IS NOT NULL
    ),
    hr_days AS (SELECT DISTINCT event_type, day FROM hr_obs),
    hr_union AS (
        SELECT d.event_type, d.day, o.hv
        FROM hr_days d JOIN hr_obs o
          ON o.event_type = d.event_type
         AND o.day BETWEEN d.day - 6 AND d.day
    ),
    hr_reg AS (
        SELECT event_type, day, hv >> 54 AS bucket,
               max(CASE WHEN (hv & 18014398509481983) = 0 THEN 55
                        ELSE 55 - length(bin(hv & 18014398509481983))
                   END) AS reg
        FROM hr_union GROUP BY 1, 2, 3
    ),
    hr_e AS (
        SELECT event_type, day,
               CAST(64 - count(*) AS BIGINT) AS zero_buckets,
               CAST(sum(CAST(1 AS BIGINT) << (55 - reg))
                    + (64 - count(*)) * 36028797018963968
                    AS BIGINT) AS reg_denom
        FROM hr_reg GROUP BY 1, 2
    )
    SELECT event_type, day, zero_buckets, reg_denom,
           round(104629932386080576765952000.0 / reg_denom / 1000000.0, 6)
               AS est_distinct
    FROM hr_e
    """,
)
def q_events_hll_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users from MERGED daily HLL registers
    (operators/sketch.py hll_rolling): daily register tables built once,
    each anchor's registers the cellwise MAX over its trailing window —
    by the merge law this IS the registers of the raw trailing union,
    which the oracle computes directly from observations.  The hash
    compare is therefore a fact-scale proof of the cellwise-max merge
    law, the HLL twin of events_kmv_rolling's bottom-k proof — with a
    cheaper plan (no dedup window, no rank: max is idempotent)."""
    from .operators.sketch import hll_rolling

    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            "unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000"
        ).alias("day"),
        "user_id",
    )
    return hll_rolling(
        e,
        value_col="user_id",
        time_col="day",
        window_size=7,
        group_cols=["event_type"],
        p=6,
    )


@register(
    "orders_gini_concentration",
    """
    WITH gi_b AS (
        SELECT o_orderpriority AS grp, o_orderkey AS id,
               CAST(floor(o_totalprice * 1000) AS BIGINT) AS x
        FROM orders WHERE o_totalprice IS NOT NULL
    ),
    gi_r AS (
        SELECT grp, x,
               CAST(row_number() OVER (
                   PARTITION BY grp ORDER BY x, id) AS BIGINT) AS r,
               CAST(count(*) OVER (PARTITION BY grp) AS BIGINT) AS n
        FROM gi_b
    ),
    gi_a AS (
        SELECT grp, CAST(max(n) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sum_scaled,
               CAST(sum(r * x) AS BIGINT) AS rx
        FROM gi_r GROUP BY grp
    )
    SELECT grp AS o_orderpriority, n, sum_scaled,
           2 * rx - (n + 1) * sum_scaled AS gini_num,
           n * sum_scaled AS gini_den,
           CAST(2 * rx - (n + 1) * sum_scaled AS DOUBLE)
               / CAST(CASE WHEN n * sum_scaled > 0
                           THEN n * sum_scaled END AS DOUBLE) AS gini
    FROM gi_a
    """,
)
def q_orders_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of order value per order priority
    (operators/stats.py gini_index): the inequality measure next to
    the ABC tiers — how concentrated revenue is within each priority
    class.  Rank sums are exact BIGINTs over a deterministic
    (value, orderkey) order; gini is one double division of two exact
    integers, hash-comparable.  The oracle replays the identical rank
    algebra."""
    from .operators.stats import gini_index

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderkey", "o_totalprice"
    )
    return gini_index(
        o,
        value_col="o_totalprice",
        group_cols=["o_orderpriority"],
        tie_cols=["o_orderkey"],
        quant_scale=1000,
    )


@register(
    "customer_rfm_segments",
    """
    WITH rfm_a AS (
        SELECT o_custkey AS customer,
               max(epoch_us(o_orderdate)) AS last_ts,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 1000) AS BIGINT))
                    AS BIGINT) AS monetary_scaled
        FROM orders
        WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
        GROUP BY o_custkey
    ),
    rfm_r AS (
        SELECT customer, n_orders, monetary_scaled,
               CAST((SELECT max(last_ts) FROM rfm_a) - last_ts
                    AS BIGINT) AS recency
        FROM rfm_a
    )
    SELECT customer, recency, n_orders, monetary_scaled,
           CAST(ntile(5) OVER (ORDER BY recency, customer)
                AS INTEGER) AS r_tier,
           CAST(ntile(5) OVER (ORDER BY n_orders DESC, customer)
                AS INTEGER) AS f_tier,
           CAST(ntile(5) OVER (ORDER BY monetary_scaled DESC, customer)
                AS INTEGER) AS m_tier
    FROM rfm_r
    """,
)
def q_customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (operators/stats.py rfm_segments): per
    customer, recency vs the dataset's last order, order count, and
    milli-quantized spend, each ntile(5)'d over a deterministic total
    order (metric + customer tie-break) — the classic marketing tiers
    where segment 1/1/1 is the best customer.  Everything exact
    integers; the oracle replays the identical aggregates and ntile
    windows."""
    from .operators.stats import rfm_segments

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("ts_us"),
        "o_totalprice",
    )
    return rfm_segments(
        o,
        customer_col="o_custkey",
        ts_col="ts_us",
        value_col="o_totalprice",
        n_tiers=5,
        quant_scale=1000,
    )


@register(
    "events_winsorize",
    """
    WITH wz_nn AS (
        SELECT event_type, event_id, value,
               CAST(row_number() OVER (
                   PARTITION BY event_type ORDER BY value, event_id
               ) AS BIGINT) AS r,
               CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        FROM events WHERE value IS NOT NULL
    ),
    wz_b AS (
        SELECT event_type, event_id, value,
               min(CASE WHEN 100 * r >= 2 * n THEN value END)
                   OVER (PARTITION BY event_type) AS lo,
               min(CASE WHEN 100 * r >= 98 * n THEN value END)
                   OVER (PARTITION BY event_type) AS hi
        FROM wz_nn
    )
    SELECT event_type, event_id, value,
           least(greatest(value, lo), hi) AS clipped_value,
           least(greatest(value, lo), hi) != value AS is_clipped
    FROM wz_b
    UNION ALL
    SELECT event_type, event_id, value,
           CAST(NULL AS DOUBLE) AS clipped_value,
           CAST(NULL AS BOOLEAN) AS is_clipped
    FROM events WHERE value IS NULL
    """,
)
def q_events_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile winsorization (operators/stats.py winsorize): per
    event type, values clip into the exact [p2, p98] order-statistic
    bounds — the robust-preprocessing pass before averaging skewed
    metrics.  The bounds are selected by the integer rank test
    (100*rank >= p*n) and the clipped output is the original value or
    a COPIED bound, so no float is ever computed and the hash compare
    covers the doubles.  The oracle replays the identical rank
    algebra."""
    from .operators.stats import winsorize

    e = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "value"
    )
    return winsorize(
        e,
        value_col="value",
        group_cols=["event_type"],
        tie_cols=["event_id"],
        p_lo=2,
        p_hi=98,
    )


@register(
    "events_quantile_normalize",
    """
    WITH qn_ref AS (
        SELECT row_number() OVER (ORDER BY value, event_id) AS rr,
               value AS normalized_value
        FROM events WHERE event_type = 'view' AND value IS NOT NULL
    ),
    qn_nr AS (SELECT CAST(count(*) AS BIGINT) AS nr FROM qn_ref),
    qn_s AS (
        SELECT event_type, event_id, value,
               CAST(row_number() OVER (
                   PARTITION BY event_type ORDER BY value, event_id
               ) AS BIGINT) AS r,
               CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS ns
        FROM events WHERE value IS NOT NULL
    )
    SELECT s.event_type, s.event_id, s.value, ref.normalized_value
    FROM qn_s s
    CROSS JOIN qn_nr
    JOIN qn_ref ref ON ref.rr = (s.r * qn_nr.nr + s.ns - 1) // s.ns
    """,
)
def q_events_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization (operators/stats.py quantile_normalize):
    every event type's value distribution is mapped onto the 'view'
    type's distribution — the cross-source score calibration a mixing
    pipeline runs so per-source quality scores become comparable.
    Exact rank algebra with values COPIED verbatim from the reference
    (zero float computation — the hash compare covers the doubles for
    free); the oracle replays the rank mapping with `//`."""
    from .operators.stats import quantile_normalize

    e = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "value"
    )
    return quantile_normalize(
        e,
        e.filter(F.col("event_type") == "view"),
        value_col="value",
        group_cols=["event_type"],
        tie_cols=["event_id"],
    )


@register(
    "event_conversion_paths",
    """
    WITH cp_ev AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        FROM events
    ),
    cp_c AS (
        SELECT user_id, event_id AS cid, ts_us AS ct
        FROM cp_ev WHERE event_type = 'purchase'
    ),
    cp_t AS (
        SELECT user_id, event_id AS tid, ts_us AS tt, event_type AS ty
        FROM cp_ev WHERE event_type IN ('view', 'click', 'signup')
    ),
    cp_j AS (
        SELECT c.cid, t.tt, t.tid, t.ty
        FROM cp_c c JOIN cp_t t ON t.user_id = c.user_id
        WHERE t.tt < c.ct AND t.tt >= c.ct - 21600000000
    ),
    cp_rk AS (
        SELECT cid, ty,
               row_number() OVER (
                   PARTITION BY cid ORDER BY tt DESC, tid DESC
               ) AS rk_desc
        FROM cp_j
    ),
    cp_p AS (
        SELECT cid, string_agg(ty, '>' ORDER BY rk_desc DESC) AS path
        FROM cp_rk WHERE rk_desc <= 8 GROUP BY cid
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_conversions
    FROM cp_p GROUP BY path HAVING count(*) >= 2
    """,
    headline=True,
)
def q_event_conversion_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top conversion paths (operators/funnel.py conversion_paths): the
    ordered sequence of view/click/signup touches in the six hours
    before each purchase, truncated to the last 8 touches, censused as
    a '>'-joined path string — the full-journey complement of the
    first-order transition matrix.  The oracle assembles each path via
    an INDEPENDENT formulation (descending rank filter + ordered
    string_agg vs the Spark side's row-local sorted-array slice)."""
    from .operators.funnel import conversion_paths

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    return conversion_paths(
        e,
        conversion_type="purchase",
        touch_types=["view", "click", "signup"],
        within_us=21_600_000_000,
        min_support=2,
        max_touches=8,
    )


@register(
    "events_ks_drift",
    """
    WITH kd_r AS (
        SELECT CAST(floor(value * 1000) AS BIGINT) AS x
        FROM events WHERE event_type = 'view' AND value IS NOT NULL
    ),
    kd_c AS (
        SELECT CAST(floor(value * 1000) AS BIGINT) AS x
        FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
    ),
    kd_st AS (
        SELECT min(x) AS lo, ((max(x) - min(x)) // 20) + 1 AS w,
               CAST(count(*) AS BIGINT) AS nrt
        FROM kd_r
    ),
    kd_nc AS (SELECT CAST(count(*) AS BIGINT) AS nct FROM kd_c),
    kd_rb AS (
        SELECT least(CAST(19 AS BIGINT), greatest(CAST(0 AS BIGINT),
                   (x - (SELECT lo FROM kd_st))
                       // (SELECT w FROM kd_st))) AS bin,
               CAST(count(*) AS BIGINT) AS n_ref
        FROM kd_r GROUP BY 1
    ),
    kd_cb AS (
        SELECT least(CAST(19 AS BIGINT), greatest(CAST(0 AS BIGINT),
                   (x - (SELECT lo FROM kd_st))
                       // (SELECT w FROM kd_st))) AS bin,
               CAST(count(*) AS BIGINT) AS n_cur
        FROM kd_c GROUP BY 1
    ),
    kd_spine AS (SELECT CAST(range AS BIGINT) AS bin FROM range(20)),
    kd_j AS (
        SELECT s.bin,
               (SELECT lo FROM kd_st)
                   + s.bin * (SELECT w FROM kd_st) AS lo_scaled,
               COALESCE(r.n_ref, 0) AS n_ref,
               COALESCE(c.n_cur, 0) AS n_cur
        FROM kd_spine s
        LEFT JOIN kd_rb r ON r.bin = s.bin
        LEFT JOIN kd_cb c ON c.bin = s.bin
    ),
    kd_cum AS (
        SELECT bin, lo_scaled, n_ref, n_cur,
               CAST(sum(n_ref) OVER (ORDER BY bin) AS BIGINT) AS cum_ref,
               CAST(sum(n_cur) OVER (ORDER BY bin) AS BIGINT) AS cum_cur
        FROM kd_j
    ),
    kd_d AS (
        SELECT bin, lo_scaled, n_ref, n_cur, cum_ref, cum_cur,
               abs(cum_cur * (SELECT nrt FROM kd_st)
                   - cum_ref * (SELECT nct FROM kd_nc)) AS delta_scaled
        FROM kd_cum
    )
    SELECT bin, lo_scaled, n_ref, n_cur, cum_ref, cum_cur, delta_scaled,
           CAST(max(delta_scaled) OVER () AS BIGINT) AS ks_scaled
    FROM kd_d
    """,
    headline=True,
)
def q_events_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample binned Kolmogorov-Smirnov drift screen
    (operators/stats.py binned_ks_drift): the 'view' value distribution
    is the reference snapshot, 'purchase' the fresh sample — the
    dataset-shift check a training pipeline runs before mixing new
    data.  Twenty equal-width bins derived from the reference alone,
    every count, cumulative count and the KS distance exact BIGINTs
    (delta_scaled = |cum_cur*N_ref - cum_ref*N_cur|), so the hash
    compare covers the statistic.  The oracle replays the identical
    binning and CDF algebra."""
    from .operators.stats import binned_ks_drift

    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    return binned_ks_drift(
        e.filter(F.col("event_type") == "view"),
        e.filter(F.col("event_type") == "purchase"),
        value_col="value",
        n_bins=20,
        quant_scale=1000,
    )


@register(
    "order_brand_rules",
    """
    WITH ar_bi AS (
        SELECT DISTINCT l.l_orderkey AS b, p.p_brand AS i
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    ar_freq AS (
        SELECT i FROM ar_bi GROUP BY i HAVING count(*) >= 5
    ),
    ar_cap AS (
        SELECT b, i FROM (
            SELECT b, i, row_number() OVER (PARTITION BY b ORDER BY i) AS rn
            FROM ar_bi WHERE i IN (SELECT i FROM ar_freq))
        WHERE rn <= 8
    ),
    ar_tot AS (
        SELECT CAST(count(DISTINCT b) AS BIGINT) AS n_baskets FROM ar_cap
    ),
    ar_ic AS (
        SELECT i, CAST(count(*) AS BIGINT) AS cnt FROM ar_cap GROUP BY i
    ),
    ar_pairs AS (
        SELECT a.i AS ia, c.i AS ib, CAST(count(*) AS BIGINT) AS n_ab
        FROM ar_cap a JOIN ar_cap c ON c.b = a.b AND c.i > a.i
        GROUP BY a.i, c.i
        HAVING count(*) >= 5
    ),
    ar_dir AS (
        SELECT ia AS antecedent, ib AS consequent, n_ab FROM ar_pairs
        UNION ALL
        SELECT ib AS antecedent, ia AS consequent, n_ab FROM ar_pairs
    )
    SELECT d.antecedent, d.consequent, d.n_ab, a.cnt AS n_a,
           b2.cnt AS n_b, t.n_baskets,
           (1000 * d.n_ab) // t.n_baskets AS support_milli,
           (1000 * d.n_ab) // a.cnt AS confidence_milli,
           (1000 * d.n_ab * t.n_baskets) // (a.cnt * b2.cnt) AS lift_milli
    FROM ar_dir d
    JOIN ar_ic a ON a.i = d.antecedent
    JOIN ar_ic b2 ON b2.i = d.consequent
    CROSS JOIN ar_tot t
    WHERE (1000 * d.n_ab) // a.cnt >= 50
    """,
    headline=True,
)
def q_order_brand_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed association rules over part-brand baskets
    (operators/itemsets.py association_rules — Agrawal-Srikant on the
    apriori level-2 census): baskets are orders, items the brands of
    their parts, and every rule carries exact-integer support,
    confidence and lift in milli units (truncating div, engine-
    replayable).  The oracle derives the pair census via an
    INDEPENDENT basket self-join — the Spark side's row-local capped
    explosion must agree on every count and metric."""
    from .operators.itemsets import association_rules

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = li.join(
        F.broadcast(part), li.l_partkey == part.p_partkey
    ).select(F.col("l_orderkey").alias("basket"), F.col("p_brand").alias("item"))
    return association_rules(
        baskets,
        basket_col="basket",
        item_col="item",
        min_item_support=5,
        min_pair_support=5,
        max_items_per_basket=8,
        min_confidence_milli=50,
    )




# Round-13 seam split (VERDICT r12 item 6): the round-11 fact-scale
# ranking & experimentation tier moved to queries_experiments.py —
# same @register calls, registry name set identical.


@register(
    "events_psi",
    """
    WITH pd_r AS (
        SELECT CAST(floor(value * 1000) AS BIGINT) AS x
        FROM events WHERE event_type = 'view' AND value IS NOT NULL
    ),
    pd_c AS (
        SELECT CAST(floor(value * 1000) AS BIGINT) AS x
        FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
    ),
    pd_st AS (
        SELECT min(x) AS lo, ((max(x) - min(x)) // 20) + 1 AS w,
               CAST(count(*) AS BIGINT) AS nrt
        FROM pd_r
    ),
    pd_nc AS (SELECT CAST(count(*) AS BIGINT) AS nct FROM pd_c),
    pd_rb AS (
        SELECT least(CAST(19 AS BIGINT), greatest(CAST(0 AS BIGINT),
                   (x - (SELECT lo FROM pd_st))
                       // (SELECT w FROM pd_st))) AS bin,
               CAST(count(*) AS BIGINT) AS n_ref
        FROM pd_r GROUP BY 1
    ),
    pd_cb AS (
        SELECT least(CAST(19 AS BIGINT), greatest(CAST(0 AS BIGINT),
                   (x - (SELECT lo FROM pd_st))
                       // (SELECT w FROM pd_st))) AS bin,
               CAST(count(*) AS BIGINT) AS n_cur
        FROM pd_c GROUP BY 1
    ),
    pd_spine AS (SELECT CAST(range AS BIGINT) AS bin FROM range(20)),
    pd_j AS (
        SELECT s.bin,
               (SELECT lo FROM pd_st)
                   + s.bin * (SELECT w FROM pd_st) AS lo_scaled,
               COALESCE(r.n_ref, 0) AS n_ref,
               COALESCE(c.n_cur, 0) AS n_cur
        FROM pd_spine s
        LEFT JOIN pd_rb r ON r.bin = s.bin
        LEFT JOIN pd_cb c ON c.bin = s.bin
    ),
    pd_t AS (
        SELECT bin, lo_scaled, n_ref, n_cur,
               CASE WHEN n_ref > 0 AND n_cur > 0
                     AND (SELECT nct FROM pd_nc) > 0 THEN
                   CAST(CAST(n_cur AS HUGEINT) * (SELECT nrt FROM pd_st)
                        - CAST(n_ref AS HUGEINT) * (SELECT nct FROM pd_nc)
                        AS DOUBLE)
                   / CAST(CAST((SELECT nrt FROM pd_st) AS HUGEINT)
                          * (SELECT nct FROM pd_nc) AS DOUBLE)
                   * ln(CAST(CAST(n_cur AS HUGEINT)
                             * (SELECT nrt FROM pd_st) AS DOUBLE)
                        / CAST(CAST(n_ref AS HUGEINT)
                               * (SELECT nct FROM pd_nc) AS DOUBLE))
               END AS t
        FROM pd_j
    ),
    pd_f AS (
        SELECT CAST(count(t) AS BIGINT) AS n_bins_used,
               CASE WHEN (SELECT nct FROM pd_nc) > 0 THEN
                   round(list_reduce(list(coalesce(t, 0.0) ORDER BY bin),
                                     (a, b) -> a + b), 6)
               END AS psi
        FROM pd_t
    )
    SELECT t.bin, t.lo_scaled, t.n_ref, t.n_cur,
           round(t.t, 6) AS psi_term, f.n_bins_used, f.psi
    FROM pd_t t CROSS JOIN pd_f f
    """,
)
def q_events_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the 'view' (reference) and
    'purchase' (current) value distributions (operators/stats.py
    binned_psi) — the credit-scoring drift standard read NEXT TO the
    KS screen on the IDENTICAL reference binning (ks_reference /
    ks_census — one census per sample serves both metrics, and the
    streaming KS census folds PSI at read with no new state).  Every
    count and cross product is exact; each bin term is one
    fixed-order double expression + ln, the total folds in BIN ORDER
    (list_reduce replay), and one-sided bins are NULL-reported and
    excluded, never epsilon-faked."""
    from .operators.stats import binned_psi

    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    return binned_psi(
        e.filter(F.col("event_type") == "view"),
        e.filter(F.col("event_type") == "purchase"),
        value_col="value",
        n_bins=20,
        quant_scale=1000,
    )
