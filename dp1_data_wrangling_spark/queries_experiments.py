"""Fact-scale ranking & experimentation query catalog (split from
queries_extended.py in round 13 — VERDICT r12 item 6: the monoliths
were re-forming).  Same @register calls, registry name set identical;
the distributed-ntile/percent-rank flagships, Lorenz/decile summaries,
item affinity, seasonal forecast accuracy and the experiment readouts
(chi-square A/B, diff-in-diff, independence, Mann-Whitney rank-sum,
seasonal indices, grid hotspots)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import cents, register
from .tables import load_table, spread

# ---------------------------------------------------------------------------
# Round-11 entrants: fact-scale distributed ranking, item affinity,
# seasonal forecast accuracy
# ---------------------------------------------------------------------------


@register(
    "orders_value_deciles",
    """
    WITH dv_base AS (
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        FROM orders
    ),
    dv_rk AS (
        SELECT o_orderkey, price_cents,
               row_number() OVER (ORDER BY price_cents, o_orderkey) AS rk,
               count(*) OVER () AS n
        FROM dv_base
    )
    SELECT o_orderkey, price_cents,
           CAST(ntile(10) OVER (ORDER BY price_cents, o_orderkey)
                AS INTEGER) AS decile,
           CAST(((rk - 1) * 1000) // greatest(n - 1, 1) AS BIGINT)
               AS pr_milli
    FROM dv_rk
    """,
    headline=True,
)
def q_orders_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact order-value deciles + percent-rank over the FACT table
    (operators/ranking.py distributed_rank/_ntile_of_rank — the r11
    census-decomposed total-order machinery): every order gets its
    NTILE(10) tier and its exact milli percent-rank ``(rank-1)*1000 div
    (n-1)`` by (price_cents, o_orderkey), with NO single-partition
    exchange in the plan (plan-gated) — the query the naive window
    version could not run at 100 TB.  The oracle replays the plain SQL
    windows; the decomposition must match them bit-for-bit."""
    from .operators.ranking import _ntile_of_rank, distributed_rank

    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", cents(F.col("o_totalprice")).alias("price_cents")
    )
    rk = distributed_rank(
        base,
        metric_col="price_cents",
        tie_cols=["o_orderkey"],
        rank_col="__rk",
    )
    return (
        rk.df.withColumn("decile", _ntile_of_rank("__rk", rk.n_total, 10))
        .withColumn(
            "pr_milli",
            F.expr(f"((__rk - 1) * 1000) div {max(rk.n_total - 1, 1)}"),
        )
        .select("o_orderkey", "price_cents", "decile", "pr_milli")
    )


@register(
    "orders_decile_summary",
    """
    WITH ds_base AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
               o_orderkey AS k
        FROM orders
    ),
    ds_rk AS (
        SELECT v,
               CAST(row_number() OVER (ORDER BY v, k) AS BIGINT) AS rn,
               CAST(ntile(10) OVER (ORDER BY v, k) AS INTEGER) AS tier
        FROM ds_base
    )
    SELECT tier,
           CAST(min(rn) AS BIGINT) AS rank_lo,
           CAST(max(rn) AS BIGINT) AS rank_hi,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(v) AS BIGINT) AS value_lo,
           CAST(max(v) AS BIGINT) AS value_hi
    FROM ds_rk GROUP BY tier
    """,
)
def q_orders_decile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decile BOUNDARY summary from the order-value census
    (operators/ranking.py rank_tile_summary, r12): one row per decile
    with its rank range, row count and boundary values — tie-invariant
    by construction (the value at any rank is fixed), which is why
    this is the shape the streaming census twin
    (streaming/ranking.py) maintains exactly.  The census collapses
    facts map-side; the cumulative ranking over it is
    distributed_rank (no single-partition exchange); the oracle
    replays the plain NTILE window grouped per tile."""
    from .operators.ranking import rank_tile_summary

    census = (
        load_table(spark, sf_dir, "orders")
        .select(cents(F.col("o_totalprice")).alias("price_cents"))
        .groupBy("price_cents")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    return rank_tile_summary(
        census, metric_col="price_cents", count_col="n", n_tiles=10
    )


@register(
    "order_item_affinity",
    """
    WITH af_bi AS (
        SELECT DISTINCT l.l_orderkey AS b, p.p_brand AS i
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    af_freq AS (
        SELECT i FROM af_bi GROUP BY i HAVING count(*) >= 5
    ),
    af_cap AS (
        SELECT b, i FROM (
            SELECT b, i, row_number() OVER (PARTITION BY b ORDER BY i) AS rn
            FROM af_bi WHERE i IN (SELECT i FROM af_freq))
        WHERE rn <= 8
    ),
    af_ic AS (
        SELECT i, CAST(count(*) AS BIGINT) AS cnt FROM af_cap GROUP BY i
    ),
    af_pairs AS (
        SELECT a.i AS item_a, c.i AS item_b, CAST(count(*) AS BIGINT) AS n_ab
        FROM af_cap a JOIN af_cap c ON c.b = a.b AND c.i > a.i
        GROUP BY a.i, c.i
        HAVING count(*) >= 5
    )
    SELECT p.item_a, p.item_b, p.n_ab, a.cnt AS n_a, b2.cnt AS n_b,
           (1000000 * p.n_ab * p.n_ab) // (a.cnt * b2.cnt) AS affinity_ppm
    FROM af_pairs p
    JOIN af_ic a ON a.i = p.item_a
    JOIN af_ic b2 ON b2.i = p.item_b
    WHERE (1000000 * p.n_ab * p.n_ab) // (a.cnt * b2.cnt) >= 100000
    """,
)
def q_order_item_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item affinity over part-brand baskets
    (operators/itemsets.py item_affinity — squared binary-incidence
    cosine in exact ppm, the Sarwar et al. item-based CF similarity
    with the square root cleared so the statistic replays verbatim).
    Same pruned+capped census as the association rules (one documented
    semantic everywhere); the oracle derives the pair census via an
    INDEPENDENT basket self-join."""
    from .operators.itemsets import item_affinity

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = li.join(
        F.broadcast(part), li.l_partkey == part.p_partkey
    ).select(F.col("l_orderkey").alias("basket"), F.col("p_brand").alias("item"))
    return item_affinity(
        baskets,
        basket_col="basket",
        item_col="item",
        min_item_support=5,
        min_pair_support=5,
        max_items_per_basket=8,
        min_affinity_ppm=100_000,
    )


@register(
    "events_seasonal_mase",
    """
    WITH sm_b AS (
        SELECT event_type, epoch_us(ts) AS tus, event_id,
               CAST(floor(value * 1000) AS BIGINT) AS vq
        FROM events WHERE value IS NOT NULL
    ),
    sm_l AS (
        SELECT event_type, vq,
               lag(vq, 24) OVER (
                   PARTITION BY event_type ORDER BY tus, event_id) AS lp,
               lag(vq, 1) OVER (
                   PARTITION BY event_type ORDER BY tus, event_id) AS l1
        FROM sm_b
    )
    SELECT event_type,
           CAST(count(lp) AS BIGINT) AS n_scored,
           CAST(coalesce(sum(CASE WHEN lp IS NOT NULL
                             THEN abs(vq - lp) END), 0) AS BIGINT)
               AS sum_abs_err,
           CAST(coalesce(sum(CASE WHEN lp IS NOT NULL
                             THEN abs(vq - l1) END), 0) AS BIGINT)
               AS sum_abs_naive,
           CASE WHEN coalesce(sum(CASE WHEN lp IS NOT NULL
                              THEN abs(vq - l1) END), 0) > 0
                THEN CAST((1000 * coalesce(sum(CASE WHEN lp IS NOT NULL
                                           THEN abs(vq - lp) END), 0))
                          // sum(CASE WHEN lp IS NOT NULL
                                 THEN abs(vq - l1) END) AS BIGINT)
           END AS mase_milli
    FROM sm_l
    GROUP BY event_type
    """,
)
def q_events_seasonal_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast accuracy per event-type series
    (operators/timeseries.py seasonal_mase — the Hyndman-Koehler MASE
    convention at period 24): exact milli-quantized values, BIGINT
    error sums, one truncating div — the screen that says whether the
    24-observation seasonal pattern beats a flat carry-forward.  The
    oracle replays the identical lag algebra; the Spark side stacks
    the lag frames and the final groupBy on ONE hash exchange
    (plan-gated)."""
    from .operators.timeseries import seasonal_mase

    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "value",
    )
    return seasonal_mase(
        e,
        key_cols=["event_type"],
        ts_col="ts_us",
        value_col="value",
        period=24,
        tie_cols=["event_id"],
        quant_scale=1000,
    )


@register(
    "customer_lorenz_curve",
    """
    WITH lz_rev AS (
        SELECT o_custkey AS customer,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM orders GROUP BY o_custkey
    ),
    lz_rk AS (
        SELECT customer, rev_cents,
               CAST(sum(rev_cents) OVER (
                   ORDER BY rev_cents DESC, customer
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
               CAST(ntile(10) OVER (ORDER BY rev_cents DESC, customer)
                    AS INTEGER) AS decile,
               CAST(sum(rev_cents) OVER () AS BIGINT) AS tot
        FROM lz_rev
    )
    SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(rev_cents) AS BIGINT) AS rev_cents,
           CAST(max(cum) AS BIGINT) AS cum_cents,
           CAST((1000 * max(cum)) // max(tot) AS BIGINT)
               AS cum_share_milli
    FROM lz_rk GROUP BY decile
    """,
)
def q_customer_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz concentration curve of customer revenue
    (operators/ranking.py distributed_rank with the census-decomposed
    RUNNING SUM — the r11 machinery's cumulative form): customers rank
    by revenue descending, the exact cumulative cents ride the rank
    decomposition, and each decile reports its customer count, revenue
    and boundary cumulative share in milli — the "top 10% hold X% of
    revenue" curve next to the Gini index, with NO single-partition
    exchange (plan-gated).  The oracle replays the plain SQL windows."""
    from .operators.ranking import _ntile_of_rank, distributed_rank

    rev = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("customer"))
        .agg(F.sum(cents(F.col("o_totalprice"))).alias("rev_cents"))
    )
    rk = distributed_rank(
        rev,
        metric_col="rev_cents",
        tie_cols=["customer"],
        descending=True,
        rank_col="__rk",
        cumsum_col="__cum",
    )
    return (
        rk.df.withColumn("decile", _ntile_of_rank("__rk", rk.n_total, 10))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("rev_cents").cast("bigint").alias("rev_cents"),
            F.max("__cum").cast("bigint").alias("cum_cents"),
        )
        .withColumn(
            "cum_share_milli",
            F.expr(f"(1000 * cum_cents) div {max(rk.sum_total, 1)}"),
        )
    )


@register(
    "events_ab_experiment",
    """
    WITH ab_u AS (
        SELECT user_id,
               CAST(('0x' || substr(md5('ab|' || CAST(user_id AS VARCHAR)),
                     1, 15)) AS BIGINT) % 2 AS arm,
               CAST(('0x' || substr(md5('seg|' || CAST(user_id AS VARCHAR)),
                     1, 15)) AS BIGINT) % 4 AS segment,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 1
                   AS converted
        FROM events GROUP BY user_id
    ),
    ab_c AS (
        SELECT segment, CAST(count(*) AS BIGINT) AS n_units,
               CAST(sum(CASE WHEN arm = 0 AND converted
                        THEN 1 ELSE 0 END) AS BIGINT) AS a,
               CAST(sum(CASE WHEN arm = 0 AND NOT converted
                        THEN 1 ELSE 0 END) AS BIGINT) AS b,
               CAST(sum(CASE WHEN arm = 1 AND converted
                        THEN 1 ELSE 0 END) AS BIGINT) AS c,
               CAST(sum(CASE WHEN arm = 1 AND NOT converted
                        THEN 1 ELSE 0 END) AS BIGINT) AS d
        FROM ab_u GROUP BY segment
    )
    SELECT segment, n_units, a, b, c, d,
           CASE WHEN a + b > 0 THEN (1000 * a) // (a + b) END
               AS rate_ctl_milli,
           CASE WHEN c + d > 0 THEN (1000 * c) // (c + d) END
               AS rate_trt_milli,
           CASE WHEN a + b > 0 AND c + d > 0 AND a + c > 0 AND b + d > 0
                THEN CAST((1000 * CAST(n_units AS HUGEINT)
                           * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c)
                           * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c))
                          // (CAST(a + b AS HUGEINT) * (c + d)
                              * (a + c) * (b + d)) AS BIGINT)
           END AS chi2_milli
    FROM ab_c
    """,
)
def q_events_ab_experiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout (operators/stats.py ab_contingency): users
    assign to arms by md5 parity (the deterministic hash assignment a
    real experiment framework uses — engine-replayable), convert if
    they ever purchase, segment by an independent md5 bucket; each
    segment reports its exact 2x2 table, milli conversion rates and the
    exact Pearson chi-square statistic — numerator in DECIMAL(38,0)
    against the oracle's HUGEINT (the r9 hourly-trend recipe), integral
    div back to BIGINT.  ONE combinable groupBy per stage, no window,
    no join (plan-gated)."""
    from .operators.stats import ab_contingency

    def md5_mod(tag: str, m: int) -> F.Column:
        payload = F.concat(
            F.lit(tag + "|"), F.col("user_id").cast("string")
        ).cast("binary")
        return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast(
            "bigint"
        ) % m

    units = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            (
                F.max((F.col("event_type") == "purchase").cast("int")) == 1
            ).alias("converted")
        )
        .select(
            md5_mod("ab", 2).alias("arm"),
            md5_mod("seg", 4).alias("segment"),
            "converted",
        )
    )
    return ab_contingency(
        units, arm_col="arm", outcome_col="converted",
        group_cols=["segment"],
    )


@register(
    "events_diff_in_diff",
    """
    WITH dd_e AS (
        SELECT event_type,
               CAST(('0x' || substr(md5('did|' || CAST(user_id AS VARCHAR)),
                     1, 15)) AS BIGINT) % 2 AS arm,
               CASE WHEN epoch_us(ts) // 86400000000 >= 19738
                    THEN 1 ELSE 0 END AS period,
               CASE WHEN value IS NOT NULL
                    THEN CAST(floor(value * 1000) AS BIGINT) END AS vq
        FROM events
    ),
    dd_c AS (
        SELECT event_type,
               CAST(count(CASE WHEN arm = 0 AND period = 0 THEN vq END)
                    AS BIGINT) AS n_ctl_pre,
               CAST(count(CASE WHEN arm = 0 AND period = 1 THEN vq END)
                    AS BIGINT) AS n_ctl_post,
               CAST(count(CASE WHEN arm = 1 AND period = 0 THEN vq END)
                    AS BIGINT) AS n_trt_pre,
               CAST(count(CASE WHEN arm = 1 AND period = 1 THEN vq END)
                    AS BIGINT) AS n_trt_post,
               CAST(coalesce(sum(CASE WHEN arm = 0 AND period = 0
                                 THEN vq END), 0) AS HUGEINT) AS s00,
               CAST(coalesce(sum(CASE WHEN arm = 0 AND period = 1
                                 THEN vq END), 0) AS HUGEINT) AS s01,
               CAST(coalesce(sum(CASE WHEN arm = 1 AND period = 0
                                 THEN vq END), 0) AS HUGEINT) AS s10,
               CAST(coalesce(sum(CASE WHEN arm = 1 AND period = 1
                                 THEN vq END), 0) AS HUGEINT) AS s11
        FROM dd_e GROUP BY event_type
    )
    SELECT event_type,
           n_ctl_pre, n_ctl_post, n_trt_pre, n_trt_post,
           CASE WHEN n_ctl_pre > 0
                THEN CAST(s00 // n_ctl_pre AS BIGINT) END
               AS mean_ctl_pre_milli,
           CASE WHEN n_ctl_post > 0
                THEN CAST(s01 // n_ctl_post AS BIGINT) END
               AS mean_ctl_post_milli,
           CASE WHEN n_trt_pre > 0
                THEN CAST(s10 // n_trt_pre AS BIGINT) END
               AS mean_trt_pre_milli,
           CASE WHEN n_trt_post > 0
                THEN CAST(s11 // n_trt_post AS BIGINT) END
               AS mean_trt_post_milli,
           CASE WHEN n_ctl_pre > 0 AND n_ctl_post > 0
                 AND n_trt_pre > 0 AND n_trt_post > 0
                THEN CAST((s11 // n_trt_post - s10 // n_trt_pre)
                          - (s01 // n_ctl_post - s00 // n_ctl_pre)
                          AS BIGINT) END AS did_milli
    FROM dd_c
    """,
    headline=True,
)
def q_events_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences experiment readout per event type
    (operators/stats.py diff_in_diff): users assign to arms by md5
    parity, the period splits at 2024-01-16 (epoch day 19738), the
    measured outcome is the event value in exact milli.  Each cell
    mean is a DECIMAL(38,0)/HUGEINT sum with ONE truncating division;
    the DiD effect is scalar algebra over the four truncated means —
    replayed verbatim by the oracle.  ONE combinable groupBy, no
    window, no join (plan-gated)."""
    from .operators.stats import diff_in_diff

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    arm = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("did|"), F.col("user_id").cast("string")
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
    units = e.select(
        "event_type",
        arm.alias("arm"),
        (F.expr("ts_us div 86400000000") >= F.lit(19738))
        .cast("bigint")
        .alias("period"),
        "value",
    )
    return diff_in_diff(
        units,
        arm_col="arm",
        period_col="period",
        value_col="value",
        group_cols=["event_type"],
    )


@register(
    "events_seasonal_profile",
    """
    WITH sp_e AS (
        SELECT event_type,
               (epoch_us(ts) // 3600000000) % 24 AS pos,
               CASE WHEN value IS NOT NULL
                    THEN CAST(floor(value * 1000) AS BIGINT) END AS vq
        FROM events
    ),
    sp_c AS (
        SELECT event_type, pos,
               CAST(count(vq) AS BIGINT) AS n_obs,
               CAST(coalesce(sum(vq), 0) AS HUGEINT) AS s
        FROM sp_e GROUP BY event_type, pos
        HAVING count(vq) > 0
    ),
    sp_t AS (
        SELECT event_type, CAST(sum(n_obs) AS BIGINT) AS n_all,
               CAST(sum(s) AS HUGEINT) AS s_all
        FROM sp_c GROUP BY event_type
    )
    SELECT c.event_type, c.pos AS position, c.n_obs,
           CAST(c.s // c.n_obs AS BIGINT) AS mean_milli,
           CASE WHEN t.s_all > 0
                THEN CAST((1000 * c.s * t.n_all) // (c.n_obs * t.s_all)
                          AS BIGINT) END AS index_milli
    FROM sp_c c JOIN sp_t t USING (event_type)
    """,
    headline=True,
)
def q_events_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal index per event type
    (operators/timeseries.py seasonal_profile): the multiplicative
    ratio-to-overall-mean seasonality readout in exact integers — the
    decomposition step the trend (events_hourly_trend), smoothing
    (holt), accuracy (seasonal_mase) and correlation (acf) screens
    complete the family with.  ONE combinable groupBy to the
    (type, hour) census; the recombine runs over census rows
    (plan-gated)."""
    from .operators.timeseries import seasonal_profile

    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    return seasonal_profile(
        e,
        ts_col="ts_us",
        value_col="value",
        bucket_us=3_600_000_000,
        period=24,
        key_cols=["event_type"],
    )


@register(
    "events_type_hour_independence",
    """
    WITH ci_o AS (
        SELECT (epoch_us(ts) // 86400000000) % 7 AS dow,
               event_type AS rv,
               CAST((epoch_us(ts) // 3600000000) % 24 AS VARCHAR) AS cv,
               CAST(count(*) AS BIGINT) AS o
        FROM events GROUP BY 1, 2, 3
    ),
    ci_r AS (
        SELECT dow, rv, CAST(sum(o) AS BIGINT) AS rm
        FROM ci_o GROUP BY dow, rv
    ),
    ci_c AS (
        SELECT dow, cv, CAST(sum(o) AS BIGINT) AS cm
        FROM ci_o GROUP BY dow, cv
    ),
    ci_n AS (
        SELECT dow, CAST(sum(o) AS BIGINT) AS nn FROM ci_o GROUP BY dow
    ),
    ci_g AS (
        SELECT r.dow, r.rv, c.cv, r.rm, c.cm, n.nn,
               coalesce(o.o, 0) AS o
        FROM ci_r r
        JOIN ci_c c USING (dow)
        JOIN ci_n n USING (dow)
        LEFT JOIN ci_o o
          ON o.dow = r.dow AND o.rv = r.rv AND o.cv = c.cv
    ),
    ci_t AS (
        SELECT dow, rv, cv,
               CAST((1000 * (CAST(o AS HUGEINT) * nn
                             - CAST(rm AS HUGEINT) * cm)
                          * (CAST(o AS HUGEINT) * nn
                             - CAST(rm AS HUGEINT) * cm))
                    // (CAST(nn AS HUGEINT) * rm * cm) AS BIGINT) AS term,
               nn
        FROM ci_g
    )
    SELECT dow,
           CAST(count(DISTINCT rv) AS BIGINT) AS n_row_cats,
           CAST(count(DISTINCT cv) AS BIGINT) AS n_col_cats,
           CAST(max(nn) AS BIGINT) AS n_units,
           CAST((count(DISTINCT rv) - 1) * (count(DISTINCT cv) - 1)
                AS BIGINT) AS df,
           CASE WHEN (count(DISTINCT rv) - 1)
                     * (count(DISTINCT cv) - 1) > 0
                THEN CAST(sum(term) AS BIGINT) END AS chi2_milli
    FROM ci_t GROUP BY dow
    """,
    headline=True,
)
def q_events_type_hour_independence(spark: SparkSession, sf_dir: str):
    """RxC chi-square independence screen (operators/stats.py
    contingency_chi2): is the event-type mix independent of the
    hour-of-day, per day-of-week?  The 5 x 24 grid INCLUDES
    zero-observed cells (rebuilt as the cross of the row/column
    censuses), each cell's Pearson term is an exact per-cell
    truncating division in DECIMAL(38,0)/HUGEINT, and df rides along.
    ONE data-sized census groupBy; everything downstream is
    census-sized (plan-gated)."""
    from .operators.stats import contingency_chi2

    e = load_table(spark, sf_dir, "events").select(
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_type",
    )
    d = e.select(
        (F.expr("ts_us div 86400000000") % 7).alias("dow"),
        F.col("event_type").alias("etype"),
        ((F.expr("ts_us div 3600000000")) % 24)
        .cast("string")
        .alias("hour"),
    )
    return contingency_chi2(
        d, row_col="etype", col_col="hour", group_cols=["dow"]
    )


@register(
    "events_grid_hotspots",
    """
    WITH gh_pts AS (
        SELECT event_id,
               CAST(('0x' || substr(md5('spx|' || CAST(event_id AS VARCHAR)),
                     1, 15)) AS BIGINT) % 1000 AS x,
               CAST(('0x' || substr(md5('spy|' || CAST(event_id AS VARCHAR)),
                     1, 15)) AS BIGINT) % 1000 AS y
        FROM events WHERE event_type = 'purchase'
    ),
    gh_c AS (
        SELECT x // 50 AS cell_x, y // 50 AS cell_y,
               CAST(count(*) AS BIGINT) AS n
        FROM gh_pts GROUP BY 1, 2
    ),
    gh_off AS (
        SELECT dx.dx, dy.dy
        FROM (VALUES (-1), (0), (1)) dx(dx)
        CROSS JOIN (VALUES (-1), (0), (1)) dy(dy)
    ),
    gh_n AS (
        SELECT c.cell_x + o.dx AS cell_x, c.cell_y + o.dy AS cell_y,
               CAST(sum(c.n) AS BIGINT) AS n_neigh
        FROM gh_c c CROSS JOIN gh_off o GROUP BY 1, 2
    )
    SELECT c.cell_x, c.cell_y, c.n, nb.n_neigh,
           (9000 * c.n) // nb.n_neigh AS concentration_milli
    FROM gh_c c
    JOIN gh_n nb ON nb.cell_x = c.cell_x AND nb.cell_y = c.cell_y
    WHERE c.n >= 3
    """,
)
def q_events_grid_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid hotspot screen (operators/spatial.py grid_hotspots — the
    Getis-Ord-class local concentration reduced to exact integers):
    purchase events take the SAME md5 planar coordinates as the spatial
    join, bucket into 50-unit cells, and each occupied cell reports its
    count against its 3x3 Moore neighborhood as an exact milli ratio.
    The stencil runs on the CENSUS (9 x cells rows, never 9 x points) —
    two combinable groupBys + one cell-keyed equi-join of aggregate-
    sized frames (plan-gated)."""
    from .operators.spatial import grid_hotspots

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
        .select(coord("spx").alias("x"), coord("spy").alias("y"))
    )
    return grid_hotspots(pts, x_col="x", y_col="y", cell=50, min_count=3)


@register(
    "events_rank_sum",
    """
    WITH rs_e AS (
        SELECT event_type,
               CAST(('0x' || substr(md5('rs|' || CAST(user_id AS VARCHAR)),
                     1, 15)) AS BIGINT) % 2 AS arm,
               CAST(floor(value * 1000) AS BIGINT) AS vq
        FROM events WHERE value IS NOT NULL
    ),
    rs_c AS (
        SELECT event_type, vq,
               CAST(count(CASE WHEN arm = 0 THEN 1 END) AS BIGINT) AS ta,
               CAST(count(CASE WHEN arm = 1 THEN 1 END) AS BIGINT) AS tb
        FROM rs_e GROUP BY event_type, vq
    ),
    rs_r AS (
        SELECT event_type, ta, tb, ta + tb AS t,
               2 * sum(ta + tb) OVER (
                   PARTITION BY event_type ORDER BY vq
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - (ta + tb) + 1 AS rank2
        FROM rs_c
    ),
    rs_g AS (
        SELECT event_type,
               CAST(sum(ta) AS BIGINT) AS n_a,
               CAST(sum(tb) AS BIGINT) AS n_b,
               CAST(sum(CAST(ta AS HUGEINT) * rank2) AS HUGEINT) AS r2a,
               CAST(sum(CAST(t AS HUGEINT) * t * t - t) AS HUGEINT) AS t3
        FROM rs_r GROUP BY event_type
    ),
    rs_s AS (
        SELECT event_type, n_a, n_b,
               CAST(n_a AS HUGEINT) + n_b AS n,
               r2a - CAST(n_a AS HUGEINT) * (n_a + 1) AS u2,
               CAST(n_a AS HUGEINT) * n_b AS mean2, t3
        FROM rs_g
    ),
    rs_v AS (
        SELECT *,
               CASE WHEN n > 1 THEN
                   (mean2 * ((n + 1) * n * (n - 1) - t3))
                       // (3 * n * (n - 1))
               END AS var2
        FROM rs_s
    )
    SELECT event_type, n_a, n_b,
           CAST(u2 AS BIGINT) AS u2_a,
           CASE WHEN mean2 > 0
                THEN CAST((1000 * u2) // (2 * mean2) AS BIGINT)
           END AS auc_milli,
           CASE WHEN var2 > 0
                THEN CAST(least((1000 * (u2 - mean2) * (u2 - mean2))
                                // var2, 4000000000000000000)
                          AS BIGINT)
           END AS z2_milli
    FROM rs_v
    """,
    headline=True,
)
def q_events_rank_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum A/B readout per event type
    (operators/stats.py rank_sum_test): users assign to arms by md5
    parity (the same deterministic hash assignment as the chi-square
    A/B readout), the measured metric is the event value in exact
    milli, and each event type reports the doubled U statistic, the
    AUC effect size (P[ctl > trt] + half-ties, exact milli) and the
    tie-corrected normal-approximation z² — midranks from the value
    CENSUS (rank2 = 2·cum − t + 1), DECIMAL(38,0) products replayed
    by a HUGEINT oracle, both truncating divisions verbatim.  ONE
    event-sized census groupBy, one census-sized per-group window,
    one combinable census groupBy; no join (plan-gated)."""
    from .operators.stats import rank_sum_test

    arm = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("rs|"), F.col("user_id").cast("string")
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
    e = load_table(spark, sf_dir, "events").select(
        arm.alias("arm"),
        "event_type",
        F.floor(F.col("value") * 1000).cast("long").alias("vq"),
    )
    return rank_sum_test(
        e, arm_col="arm", value_col="vq", group_cols=["event_type"]
    )


@register(
    "events_post_strat_ate",
    """
    WITH pa_e AS (
        SELECT (epoch_us(ts) // 86400000000) % 7 AS day_bucket,
               event_type,
               CASE WHEN CAST(('0x' || substr(md5('ps|'
                             || CAST(user_id AS VARCHAR) || '|'
                             || event_type), 1, 15)) AS BIGINT) % 4
                         < CASE WHEN event_type IN ('purchase', 'signup')
                                THEN 3 ELSE 1 END
                    THEN 1 ELSE 0 END AS arm,
               CASE WHEN value IS NOT NULL
                    THEN CAST(floor(value * 1000) AS BIGINT) END AS vq
        FROM events
    ),
    pa_s AS (
        SELECT day_bucket, event_type,
               CAST(count(CASE WHEN arm = 1 THEN vq END) AS BIGINT) AS n_t,
               CAST(count(CASE WHEN arm = 0 THEN vq END) AS BIGINT) AS n_c,
               CAST(coalesce(sum(CASE WHEN arm = 1 THEN vq END), 0)
                    AS HUGEINT) AS s_t,
               CAST(coalesce(sum(CASE WHEN arm = 0 THEN vq END), 0)
                    AS HUGEINT) AS s_c
        FROM pa_e GROUP BY 1, 2
    ),
    pa_d AS (
        SELECT day_bucket, n_t, n_c, s_t, s_c,
               CASE WHEN n_t > 0 AND n_c > 0
                    THEN CAST(s_t // n_t AS BIGINT)
                         - CAST(s_c // n_c AS BIGINT) END AS diff,
               CASE WHEN n_t > 0 AND n_c > 0
                    THEN CAST(n_t + n_c AS BIGINT) END AS w
        FROM pa_s
    )
    SELECT day_bucket,
           CAST(count(*) AS BIGINT) AS n_strata,
           CAST(count(diff) AS BIGINT) AS n_strata_used,
           CAST(sum(n_t) AS BIGINT) AS n_trt,
           CAST(sum(n_c) AS BIGINT) AS n_ctl,
           CASE WHEN sum(n_t) > 0 AND sum(n_c) > 0
                THEN CAST(CAST(sum(s_t) AS HUGEINT) // sum(n_t) AS BIGINT)
                     - CAST(CAST(sum(s_c) AS HUGEINT) // sum(n_c) AS BIGINT)
                END AS naive_diff_milli,
           CASE WHEN coalesce(sum(w), 0) > 0
                THEN CAST(CASE
                    WHEN sum(CAST(w AS HUGEINT) * diff) >= 0
                    THEN sum(CAST(w AS HUGEINT) * diff) // sum(w)
                    ELSE -((-sum(CAST(w AS HUGEINT) * diff)) // sum(w))
                    END AS BIGINT) END AS ate_milli
    FROM pa_d GROUP BY 1
    """,
)
def q_events_post_strat_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-stratification ATE readout per epoch-day-of-week
    (operators/stats.py post_strat_ate, r13): strata = event types,
    arms assigned by md5 parity DELIBERATELY imbalanced across strata
    (75% treated in purchase/signup, 25% elsewhere — the
    observational-data shape where the pooled naive difference mixes
    the effect with the baseline gap between event types).  The
    stratum-size-weighted fold removes exactly that term; both
    readouts are returned so naive-vs-ATE divergence is the
    diagnostic.  Cell sums DECIMAL(38,0) vs HUGEINT, one truncating
    division per stratum mean, sign-split final division (effects are
    legitimately negative).  TWO combinable groupBys, no window, no
    join (plan-gated)."""
    from .operators.stats import post_strat_ate

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    m = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("ps|"),
                    F.col("user_id").cast("string"),
                    F.lit("|"),
                    F.col("event_type"),
                ).cast("binary")
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    thresh = F.when(
        F.col("event_type").isin("purchase", "signup"), F.lit(3)
    ).otherwise(F.lit(1))
    units = e.select(
        (F.expr("ts_us div 86400000000") % 7).alias("day_bucket"),
        F.col("event_type"),
        (m % 4 < thresh).cast("bigint").alias("arm"),
        "value",
    )
    return post_strat_ate(
        units,
        arm_col="arm",
        stratum_col="event_type",
        value_col="value",
        group_cols=["day_bucket"],
    )


@register(
    "events_cuped_ate",
    """
    WITH cu_e AS (
        SELECT event_type,
               CAST(('0x' || substr(md5('cup|' || CAST(user_id AS VARCHAR)),
                     1, 15)) AS BIGINT) % 2 AS arm,
               value AS y,
               value + CAST(CAST(('0x' || substr(md5('cov|'
                       || CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT)
                   % 200 - 100 AS DOUBLE) AS x
        FROM events
    ),
    cu_q AS (
        SELECT event_type, arm,
               CAST(floor(y * 1000) AS BIGINT) AS yq,
               CAST(floor(x * 1000) AS BIGINT) AS xq
        FROM cu_e WHERE y IS NOT NULL AND x IS NOT NULL
    ),
    cu_g AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(count(CASE WHEN arm = 1 THEN 1 END) AS BIGINT) AS n_trt,
               CAST(count(CASE WHEN arm = 0 THEN 1 END) AS BIGINT) AS n_ctl,
               CAST(coalesce(sum(CAST(yq AS HUGEINT)), 0) AS HUGEINT) AS sy,
               CAST(coalesce(sum(CAST(xq AS HUGEINT)), 0) AS HUGEINT) AS sx,
               CAST(coalesce(sum(CAST(xq AS HUGEINT) * yq), 0)
                    AS HUGEINT) AS sxy,
               CAST(coalesce(sum(CAST(xq AS HUGEINT) * xq), 0)
                    AS HUGEINT) AS sxx,
               CAST(coalesce(sum(CASE WHEN arm = 1
                             THEN CAST(yq AS HUGEINT) END), 0)
                    AS HUGEINT) AS syt,
               CAST(coalesce(sum(CASE WHEN arm = 0
                             THEN CAST(yq AS HUGEINT) END), 0)
                    AS HUGEINT) AS syc,
               CAST(coalesce(sum(CASE WHEN arm = 1
                             THEN CAST(xq AS HUGEINT) END), 0)
                    AS HUGEINT) AS sxt,
               CAST(coalesce(sum(CASE WHEN arm = 0
                             THEN CAST(xq AS HUGEINT) END), 0)
                    AS HUGEINT) AS sxc
        FROM cu_q GROUP BY 1
    ),
    cu_t AS (
        SELECT *,
               1000 * (n_pairs * sxy - sx * sy) AS tnum,
               n_pairs * sxx - sx * sx AS tden
        FROM cu_g
    ),
    cu_r AS (
        SELECT event_type, n_pairs, n_trt, n_ctl,
               CASE WHEN tden > 0
                    THEN CAST(CASE WHEN tnum >= 0 THEN tnum // tden
                              ELSE -((-tnum) // tden) END AS BIGINT)
                    END AS theta_milli,
               CASE WHEN n_trt > 0 AND n_ctl > 0
                    THEN CAST(syt // n_trt AS BIGINT)
                         - CAST(syc // n_ctl AS BIGINT) END
                   AS naive_diff_milli,
               CASE WHEN n_trt > 0 AND n_ctl > 0
                    THEN CAST(sxt // n_trt AS BIGINT)
                         - CAST(sxc // n_ctl AS BIGINT) END AS dx
        FROM cu_t
    )
    SELECT event_type, n_pairs, n_trt, n_ctl, theta_milli,
           naive_diff_milli,
           CASE WHEN naive_diff_milli IS NOT NULL
                 AND theta_milli IS NOT NULL
                THEN naive_diff_milli - CAST(CASE
                     WHEN CAST(theta_milli AS HUGEINT) * dx >= 0
                     THEN (CAST(theta_milli AS HUGEINT) * dx) // 1000
                     ELSE -((-(CAST(theta_milli AS HUGEINT) * dx))
                            // 1000) END AS BIGINT)
                END AS ate_cuped_milli
    FROM cu_r
    """,
)
def q_events_cuped_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B readout per event type
    (operators/stats.py cuped_adjusted_ate — Deng/Xu/Kohavi/Walker
    WSDM'13): users assign to arms by md5 parity, the metric is the
    event value, and the pre-experiment covariate is the value plus a
    planted md5-deterministic offset in [-100, 100) — correlated at
    theta = var(y)/(var(y)+var(noise)) ~ 400 milli, so the covariate
    imbalance term visibly moves the adjusted readout away from the
    naive difference (every type shifts by hundreds of milli at
    sf0.01).
    theta is ONE sign-split truncating division of DECIMAL(38,0)
    cross moments vs HUGEINT; arm means one truncation each; the
    adjustment term one further sign-split division.  ONE combinable
    groupBy, no window, no join (plan-gated)."""
    from .operators.stats import cuped_adjusted_ate

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    arm = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("cup|"), F.col("user_id").cast("string")
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
    noise = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("cov|"), F.col("event_id").cast("string")
                    ).cast("binary")
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 200
        - 100
    )
    units = e.select(
        "event_type",
        arm.alias("arm"),
        F.col("value").alias("y"),
        (F.col("value") + noise.cast("double")).alias("x"),
    )
    return cuped_adjusted_ate(
        units,
        arm_col="arm",
        value_col="y",
        covariate_col="x",
        group_cols=["event_type"],
    )


@register(
    "events_srm_check",
    """
    WITH sr_e AS (
        SELECT event_type,
               CASE WHEN CAST(('0x' || substr(md5('srm|'
                             || CAST(user_id AS VARCHAR) || '|'
                             || CAST(event_id AS VARCHAR)), 1, 15))
                         AS BIGINT) % 10
                         < CASE WHEN event_type = 'error' THEN 4
                                ELSE 5 END
                    THEN 1 ELSE 0 END AS arm
        FROM events
    ),
    sr_g AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_units,
               CAST(coalesce(sum(arm), 0) AS BIGINT) AS n_trt
        FROM sr_e GROUP BY 1
    ),
    sr_d AS (
        SELECT event_type, n_units, n_trt,
               CAST(n_units - n_trt AS BIGINT) AS n_ctl,
               CAST(n_trt AS HUGEINT) * 1000000
                   - CAST(n_units AS HUGEINT) * 500000 AS d
        FROM sr_g
    )
    SELECT event_type, n_units, n_trt, n_ctl,
           CAST((CAST(n_trt AS HUGEINT) * 1000000) // n_units
                AS BIGINT) AS observed_trt_ppm,
           CAST(500000 AS BIGINT) AS expected_trt_ppm,
           CAST((1000 * d * d)
                // (CAST(n_units AS HUGEINT) * 500000 * 500000)
                AS BIGINT) AS srm_chi2_milli,
           CAST((1000 * d * d)
                // (CAST(n_units AS HUGEINT) * 500000 * 500000)
                AS BIGINT) > 3841 AS srm_flag
    FROM sr_d
    """,
)
def q_events_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch validity gate per event type
    (operators/stats.py srm_check): the design is a 50/50 md5 split,
    but the 'error' stratum's assignment is PLANTED broken (40%
    treated — the logging-loss shape SRM exists to catch): its
    chi-square reads ~80,000 milli against the 3,841 flag line while
    healthy types sit near zero.  The two-cell Pearson statistic
    collapses to ONE truncating division of the squared ppm deviation
    — DECIMAL(38,0) vs HUGEINT, non-negative operands.  ONE combinable
    groupBy, no window, no join (plan-gated)."""
    from .operators.stats import srm_check

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    m = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("srm|"),
                    F.col("user_id").cast("string"),
                    F.lit("|"),
                    F.col("event_id").cast("string"),
                ).cast("binary")
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    thresh = F.when(F.col("event_type") == "error", F.lit(4)).otherwise(
        F.lit(5)
    )
    units = e.select(
        "event_type", (m % 10 < thresh).cast("bigint").alias("arm")
    )
    return srm_check(units, arm_col="arm", group_cols=["event_type"])


@register(
    "orders_woe_iv",
    """
    WITH wv AS (
        SELECT o_orderpriority AS prio,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS x
        FROM orders WHERE o_totalprice IS NOT NULL
    ),
    ws AS (
        SELECT prio, min(x) AS lo, ((max(x) - min(x)) // 10) + 1 AS w,
               CAST(sum(y) AS BIGINT) AS g,
               CAST(count(*) FILTER (WHERE y = 0) AS BIGINT) AS b
        FROM wv GROUP BY prio
    ),
    wc AS (
        SELECT v.prio,
               least(CAST(9 AS BIGINT),
                     greatest(CAST(0 AS BIGINT), (v.x - s.lo) // s.w)) AS bin,
               CAST(sum(v.y) AS BIGINT) AS n_good,
               CAST(count(*) FILTER (WHERE v.y = 0) AS BIGINT) AS n_bad
        FROM wv v JOIN ws s USING (prio) GROUP BY 1, 2
    ),
    wb AS (
        SELECT s.prio, sp.bin, s.lo + sp.bin * s.w AS lo_scaled,
               coalesce(c.n_good, 0) AS n_good,
               coalesce(c.n_bad, 0) AS n_bad, s.g, s.b
        FROM ws s
        CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS bin) sp
        LEFT JOIN wc c ON c.prio = s.prio AND c.bin = sp.bin
    ),
    ww AS (
        SELECT prio, bin, lo_scaled, n_good, n_bad, g, b,
               CASE WHEN n_good > 0 AND n_bad > 0 AND g > 0 AND b > 0
                    THEN round(ln(
                        CAST(CAST(n_good AS HUGEINT) * b AS DOUBLE)
                        / CAST(CAST(n_bad AS HUGEINT) * g AS DOUBLE)), 6)
               END AS woe
        FROM wb
    ),
    wiv AS (
        SELECT prio,
               CASE WHEN max(g) > 0 AND max(b) > 0 THEN
                   round(list_reduce(list(
                       CASE WHEN woe IS NOT NULL THEN
                           CAST(CAST(n_good AS HUGEINT) * b
                                - CAST(n_bad AS HUGEINT) * g AS DOUBLE)
                           / CAST(CAST(g AS HUGEINT) * b AS DOUBLE) * woe
                       ELSE 0.0 END ORDER BY bin), (a, c) -> a + c), 6)
               END AS iv
        FROM ww GROUP BY prio
    )
    SELECT w.prio, CAST(w.bin AS BIGINT) AS bin,
           CAST(w.lo_scaled AS BIGINT) AS lo_scaled,
           w.n_good, w.n_bad, w.woe, i.iv
    FROM ww w JOIN wiv i USING (prio)
    """,
)
def q_orders_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value screen of order value
    against fulfillment, per priority tier (operators/stats.py woe_iv
    — the credit-scoring-lineage feature-power report): does
    o_totalprice predict o_orderstatus = 'F' inside each priority?
    Equal-width cent bins per group (the ks_drift binning law), exact
    integer cross products, woe = one double division + ln + round(6)
    (the corr_pairs/BM25 stance), IV folded in bin order over the
    collected per-group array (the ndcg stance — no float-sum order
    anywhere)."""
    from .operators.stats import woe_iv

    orders = spread(load_table(spark, sf_dir, "orders"))
    d = orders.select(
        F.col("o_orderpriority").alias("prio"),
        (F.col("o_orderstatus") == "F").cast("int").alias("y"),
        F.col("o_totalprice").cast("double").alias("v"),
    )
    return woe_iv(
        d,
        label_col="y",
        value_col="v",
        group_cols=["prio"],
        n_bins=10,
        quant_scale=100,
    )


@register(
    "events_kruskal_wallis",
    """
    WITH kw_e AS (
        SELECT event_type,
               CAST(('0x' || substr(md5('kw|' || CAST(user_id AS VARCHAR)),
                     1, 15)) AS BIGINT) % 3 AS arm,
               CAST(floor(value * 1000) AS BIGINT) AS vq
        FROM events WHERE value IS NOT NULL
    ),
    kw_c AS (
        SELECT event_type, arm, vq, CAST(count(*) AS BIGINT) AS cnt
        FROM kw_e GROUP BY 1, 2, 3
    ),
    kw_r AS (
        SELECT *,
               CAST(sum(cnt) OVER (PARTITION BY event_type, vq)
                    AS BIGINT) AS t,
               CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY vq
                    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum
        FROM kw_c
    ),
    kw_a AS (
        SELECT event_type, arm,
               CAST(sum(cnt) AS BIGINT) AS nj,
               CAST(sum(CAST(cnt AS HUGEINT) * (2 * cum - t + 1))
                    AS HUGEINT) AS r2,
               CAST(sum(CAST(t AS HUGEINT) * t * cnt - cnt)
                    AS HUGEINT) AS tp
        FROM kw_r GROUP BY 1, 2
    ),
    kw_q AS (
        SELECT event_type, nj, (r2 * r2) // nj AS q, tp FROM kw_a
    ),
    kw_g AS (
        SELECT event_type,
               CAST(sum(nj) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS n_arms,
               CAST(sum(q) AS HUGEINT) AS s,
               CAST(sum(tp) AS HUGEINT) AS t3
        FROM kw_q GROUP BY 1
    ),
    kw_h AS (
        SELECT event_type, n, n_arms, t3,
               CASE WHEN n > 1 THEN
                   (1000 * greatest(CAST(0 AS HUGEINT),
                        3 * s - 3 * CAST(n AS HUGEINT) * (n + 1) * (n + 1)))
                   // (CAST(n AS HUGEINT) * (n + 1)) END AS h_milli,
               CAST(n AS HUGEINT) * n * n - n AS n3
        FROM kw_g
    ),
    kw_j AS (
        SELECT *,
               CASE WHEN n3 - t3 > 0
                    THEN least((h_milli * n3) // (n3 - t3),
                               4000000000000000000) END AS h_adj
        FROM kw_h
    )
    SELECT event_type, n, n_arms, CAST(t3 AS BIGINT) AS t3,
           CAST(h_milli AS BIGINT) AS h_milli,
           CAST(h_adj AS BIGINT) AS h_adj_milli,
           CASE WHEN n > n_arms AND h_adj IS NOT NULL THEN
               CAST(CASE WHEN h_adj - 1000 * (n_arms - 1) >= 0
                    THEN (h_adj - 1000 * (n_arms - 1)) // (n - n_arms)
                    ELSE -((-(h_adj - 1000 * (n_arms - 1)))
                           // (n - n_arms)) END AS BIGINT)
           END AS eps2_milli
    FROM kw_j
    """,
)
def q_events_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis omnibus k-arm readout per event type
    (operators/stats.py kruskal_wallis, r13): users assign to THREE
    arms by md5 ('kw|' salt — the ab_contingency hash convention), the
    metric is the event value in exact milli, and each event type
    reports H, its tie-corrected form and the epsilon-squared effect
    size — the screen you run before pairwise events_rank_sum
    drill-downs.  Doubled midranks from the value census (RANGE-frame
    cumulative so ties across arms share one midrank), three stated
    truncating divisions replayed verbatim by the HUGEINT oracle.
    ONE event-sized census groupBy, two census-sized windows, one
    combinable census groupBy; no join (plan-gated)."""
    from .operators.stats import kruskal_wallis

    arm = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("kw|"), F.col("user_id").cast("string")
                    ).cast("binary")
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 3
    )
    e = load_table(spark, sf_dir, "events").select(
        arm.alias("arm"),
        "event_type",
        F.floor(F.col("value") * 1000).cast("long").alias("vq"),
    )
    return kruskal_wallis(
        e, arm_col="arm", value_col="vq", group_cols=["event_type"]
    )


@register(
    "lineitem_spearman",
    """
    WITH sp_d AS (
        SELECT l_returnflag AS flag,
               CAST(l_quantity AS BIGINT) AS x,
               CAST(floor(l_extendedprice * 1000) AS BIGINT) AS y
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    ),
    sp_xc AS (
        SELECT flag, x, CAST(count(*) AS BIGINT) AS t
        FROM sp_d GROUP BY 1, 2
    ),
    sp_xr AS (
        SELECT flag, x,
               2 * CAST(sum(t) OVER (PARTITION BY flag ORDER BY x
                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) - t + 1 AS rx
        FROM sp_xc
    ),
    sp_yc AS (
        SELECT flag, y, CAST(count(*) AS BIGINT) AS t
        FROM sp_d GROUP BY 1, 2
    ),
    sp_yr AS (
        SELECT flag, y,
               2 * CAST(sum(t) OVER (PARTITION BY flag ORDER BY y
                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) - t + 1 AS ry
        FROM sp_yc
    ),
    sp_j AS (
        SELECT d.flag, xr.rx, yr.ry
        FROM sp_d d
        JOIN sp_xr xr ON d.flag = xr.flag AND d.x = xr.x
        JOIN sp_yr yr ON d.flag = yr.flag AND d.y = yr.y
    ),
    sp_g AS (
        SELECT flag, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(rx AS HUGEINT)) AS HUGEINT) AS sx,
               CAST(sum(CAST(ry AS HUGEINT)) AS HUGEINT) AS sy,
               CAST(sum(CAST(rx AS HUGEINT) * rx) AS HUGEINT) AS sxx,
               CAST(sum(CAST(ry AS HUGEINT) * ry) AS HUGEINT) AS syy,
               CAST(sum(CAST(rx AS HUGEINT) * ry) AS HUGEINT) AS sxy
        FROM sp_j GROUP BY 1
    )
    SELECT flag, n,
           CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
                 AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
                THEN round(
                    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                       * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                    6) END AS spearman
    FROM sp_g
    """,
)
def q_lineitem_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman quantity-vs-price monotone association per returnflag
    (operators/stats.py spearman_corr, r13) — the rank companion to
    the Pearson corr_pairs profile: a large Spearman/Pearson gap is
    the nonlinearity/outlier diagnostic.  Midranks come from each
    column's value census as doubled ranks (no per-row window); rows
    equi-join to the two censuses and ONE combinable aggregate
    collects the exact DECIMAL(38,0) rank moments; the finish is the
    corr_pairs fixed-order double expression rounded to 6 (IEEE
    correctly-rounded ops on identical exact integers — bit-identical
    across engines).  Two census groupBys + two co-keyed equi-joins +
    one moment aggregate; no data-sized window (plan-gated)."""
    from .operators.stats import spearman_corr

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("bigint").alias("x"),
        F.floor(F.col("l_extendedprice") * 1000).cast("bigint").alias("y"),
    )
    return spearman_corr(li, x_col="x", y_col="y", group_cols=["flag"])


@register(
    "events_cramers_v",
    """
    WITH cv_o AS (
        SELECT (epoch_us(ts) // 86400000000) % 7 AS dow,
               event_type AS rv,
               CAST((epoch_us(ts) // 3600000000) % 24 AS VARCHAR) AS cv,
               CAST(count(*) AS BIGINT) AS o
        FROM events GROUP BY 1, 2, 3
    ),
    cv_r AS (
        SELECT dow, rv, CAST(sum(o) AS BIGINT) AS rm
        FROM cv_o GROUP BY dow, rv
    ),
    cv_c AS (
        SELECT dow, cv, CAST(sum(o) AS BIGINT) AS cm
        FROM cv_o GROUP BY dow, cv
    ),
    cv_n AS (
        SELECT dow, CAST(sum(o) AS BIGINT) AS nn FROM cv_o GROUP BY dow
    ),
    cv_g AS (
        SELECT r.dow, r.rv, c.cv, r.rm, c.cm, n.nn,
               coalesce(o.o, 0) AS o
        FROM cv_r r
        JOIN cv_c c USING (dow)
        JOIN cv_n n USING (dow)
        LEFT JOIN cv_o o
          ON o.dow = r.dow AND o.rv = r.rv AND o.cv = c.cv
    ),
    cv_t AS (
        SELECT dow, rv, cv,
               CAST((1000 * (CAST(o AS HUGEINT) * nn
                             - CAST(rm AS HUGEINT) * cm)
                          * (CAST(o AS HUGEINT) * nn
                             - CAST(rm AS HUGEINT) * cm))
                    // (CAST(nn AS HUGEINT) * rm * cm) AS BIGINT) AS term,
               nn
        FROM cv_g
    ),
    cv_s AS (
        SELECT dow,
               CAST(count(DISTINCT rv) AS BIGINT) AS n_row_cats,
               CAST(count(DISTINCT cv) AS BIGINT) AS n_col_cats,
               CAST(max(nn) AS BIGINT) AS n_units,
               CAST((count(DISTINCT rv) - 1) * (count(DISTINCT cv) - 1)
                    AS BIGINT) AS df,
               CASE WHEN (count(DISTINCT rv) - 1)
                         * (count(DISTINCT cv) - 1) > 0
                    THEN CAST(sum(term) AS BIGINT) END AS chi2_milli
        FROM cv_t GROUP BY dow
    )
    SELECT dow, n_row_cats, n_col_cats, n_units, df, chi2_milli,
           CASE WHEN chi2_milli IS NOT NULL
                 AND least(n_row_cats, n_col_cats) - 1 > 0
                 AND n_units > 0
                THEN round(sqrt(CAST(chi2_milli AS DOUBLE)
                     / (1000.0 * CAST(n_units AS DOUBLE)
                        * CAST(least(n_row_cats, n_col_cats) - 1
                               AS DOUBLE))), 6)
           END AS cramers_v
    FROM cv_s
    """,
)
def q_events_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V for the type-x-hour association per day-of-week
    (operators/stats.py cramers_v, r13) — the [0,1] effect size the
    raw events_type_hour_independence chi2 can't give you: chi2 grows
    with n and grid shape, V is comparable across tables (the "is this
    association actually MATERIAL" readout next to "is it
    significant").  Rides contingency_chi2 unchanged; the finish is
    one fixed-order IEEE double (÷ 1000·n·min_dim, sqrt, round 6)
    replayed verbatim by the oracle.  Same plan as the chi2 sibling:
    one census groupBy, census-sized margins/grid (plan-gated)."""
    from .operators.stats import cramers_v

    e = load_table(spark, sf_dir, "events").select(
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_type",
    )
    d = e.select(
        (F.expr("ts_us div 86400000000") % 7).alias("dow"),
        F.col("event_type").alias("etype"),
        ((F.expr("ts_us div 3600000000")) % 24)
        .cast("string")
        .alias("hour"),
    )
    return cramers_v(d, row_col="etype", col_col="hour", group_cols=["dow"])


@register(
    "events_cmh_test",
    """
    WITH cm_e AS (
        SELECT (epoch_us(ts) // 86400000000) % 7 AS day_bucket,
               event_type,
               CASE WHEN CAST(('0x' || substr(md5('cmh|'
                             || CAST(user_id AS VARCHAR) || '|'
                             || event_type), 1, 15)) AS BIGINT) % 4
                         < CASE WHEN event_type IN ('purchase', 'signup')
                                THEN 3 ELSE 1 END
                    THEN 1 ELSE 0 END AS arm,
               CASE WHEN value IS NOT NULL
                     AND CAST(floor(value * 1000) AS BIGINT) >= 500
                    THEN 1 ELSE 0 END AS y
        FROM events
    ),
    cm_c AS (
        SELECT day_bucket, event_type,
               CAST(sum(CASE WHEN arm = 1 THEN y ELSE 0 END)
                    AS BIGINT) AS a,
               CAST(sum(CASE WHEN arm = 1 THEN 1 - y ELSE 0 END)
                    AS BIGINT) AS b,
               CAST(sum(CASE WHEN arm = 0 THEN y ELSE 0 END)
                    AS BIGINT) AS c,
               CAST(sum(CASE WHEN arm = 0 THEN 1 - y ELSE 0 END)
                    AS BIGINT) AS d
        FROM cm_e GROUP BY 1, 2
    ),
    cm_t AS (
        SELECT day_bucket, a, a + b + c + d AS n,
               CASE WHEN a + b + c + d > 0
                    THEN (1000000 * CAST(a + b AS HUGEINT) * (a + c))
                         // (a + b + c + d) ELSE 0 END AS e_ppm,
               CASE WHEN a + b + c + d > 1
                    THEN (1000000 * CAST(a + b AS HUGEINT) * (c + d)
                          * (a + c) * (b + d))
                         // (CAST(a + b + c + d AS HUGEINT)
                             * (a + b + c + d) * (a + b + c + d - 1))
                    ELSE 0 END AS v_ppm,
               CASE WHEN a + b + c + d > 0
                    THEN (1000000 * CAST(a AS HUGEINT) * d)
                         // (a + b + c + d) ELSE 0 END AS r_ppm,
               CASE WHEN a + b + c + d > 0
                    THEN (1000000 * CAST(b AS HUGEINT) * c)
                         // (a + b + c + d) ELSE 0 END AS s_ppm
        FROM cm_c
    ),
    cm_g AS (
        SELECT day_bucket, CAST(count(*) AS BIGINT) AS n_strata,
               CAST(sum(n) AS BIGINT) AS n_units,
               CAST(sum(a) AS BIGINT) AS o_t,
               CAST(sum(e_ppm) AS HUGEINT) AS se,
               CAST(sum(v_ppm) AS HUGEINT) AS sv,
               CAST(sum(r_ppm) AS HUGEINT) AS sr,
               CAST(sum(s_ppm) AS HUGEINT) AS ss
        FROM cm_t GROUP BY 1
    )
    SELECT day_bucket, n_strata, n_units, o_t,
           CAST(se AS BIGINT) AS e_t_ppm,
           CAST(sv AS BIGINT) AS v_ppm,
           CASE WHEN sv > 0
                THEN CAST(least((1000
                           * (1000000 * CAST(o_t AS HUGEINT) - se)
                           * (1000000 * o_t - se)) // (1000000 * sv),
                           4000000000000000000)
                          AS BIGINT) END AS chi2_milli,
           CASE WHEN ss > 0
                THEN CAST((1000 * sr) // ss AS BIGINT) END AS or_milli
    FROM cm_g
    """,
)
def q_events_cmh_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Mantel-Haenszel stratified conversion readout per
    epoch-day-of-week (operators/stats.py cmh_test, r13): strata =
    event types with the SAME deliberately-confounded arm assignment
    as events_post_strat_ate (75% treated in purchase/signup, 25%
    elsewhere — pooling naively mixes the effect with the stratum
    baseline gap), outcome = value >= 0.5 in exact milli.  Per-stratum
    hypergeometric O/E/V and the MH odds-ratio cross-products are one
    truncating ppm division each (DECIMAL(38,0) vs HUGEINT, replayed
    verbatim); the pooled chi2 and or_milli fold census-sized.  ONE
    event-sized cell-census groupBy + one census-sized fold; no
    window, no join (plan-gated)."""
    from .operators.stats import cmh_test

    arm = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("cmh|"),
                        F.col("user_id").cast("string"),
                        F.lit("|"),
                        F.col("event_type"),
                    ).cast("binary")
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 4
        < F.when(
            F.col("event_type").isin("purchase", "signup"), F.lit(3)
        ).otherwise(F.lit(1))
    ).cast("int")
    e = load_table(spark, sf_dir, "events").select(
        (
            F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000") % 7
        ).alias("day_bucket"),
        F.col("event_type").alias("stratum"),
        arm.alias("arm"),
        (
            F.col("value").isNotNull()
            & (F.floor(F.col("value") * 1000).cast("bigint") >= 500)
        )
        .cast("int")
        .alias("y"),
    )
    return cmh_test(
        e,
        arm_col="arm",
        outcome_col="y",
        stratum_col="stratum",
        group_cols=["day_bucket"],
    )


@register(
    "events_anova_f",
    """
    WITH af_e AS (
        SELECT event_type,
               CAST(('0x' || substr(md5('af|' || CAST(user_id AS VARCHAR)),
                     1, 15)) AS BIGINT) % 3 AS arm,
               CAST(floor(value * 1000) AS BIGINT) AS vq
        FROM events WHERE value IS NOT NULL
    ),
    af_c AS (
        SELECT event_type, arm,
               CAST(count(*) AS BIGINT) AS nj,
               CAST(sum(CAST(vq AS HUGEINT)) AS HUGEINT) AS sj,
               CAST(sum(CAST(vq AS HUGEINT) * vq) AS HUGEINT) AS ssj
        FROM af_e GROUP BY 1, 2
    ),
    af_q AS (
        SELECT event_type, nj, sj, ssj,
               CASE WHEN nj > 0
                    THEN (1000000 * sj * sj) // nj ELSE 0 END AS q
        FROM af_c
    ),
    af_g AS (
        SELECT event_type,
               CAST(sum(nj) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS n_arms,
               CAST(sum(sj) AS HUGEINT) AS s,
               CAST(sum(ssj) AS HUGEINT) AS ss,
               CAST(sum(q) AS HUGEINT) AS sq
        FROM af_q GROUP BY 1
    ),
    af_s AS (
        SELECT event_type, n, n_arms,
               greatest(CAST(0 AS HUGEINT),
                        sq - (1000000 * s * s) // n) AS ssb,
               1000000 * ss - sq AS ssw
        FROM af_g
    )
    SELECT event_type, n, n_arms,
           CASE WHEN n_arms > 1 AND n > n_arms AND ssw > 0
                THEN CAST(least((1000 * ssb * (n - n_arms))
                          // (ssw * (n_arms - 1)),
                          4000000000000000000) AS BIGINT)
           END AS f_milli,
           CASE WHEN ssb + ssw > 0
                THEN CAST((1000000 * ssb) // (ssb + ssw) AS BIGINT)
           END AS eta2_ppm
    FROM af_s
    """,
)
def q_events_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F omnibus per event type (operators/stats.py
    oneway_anova, r13): the PARAMETRIC mean-shift screen next to
    events_kruskal_wallis' rank form — three arms by md5 ('af|' salt),
    metric = event value in exact milli, each event type reports
    F (exact milli) and eta² (exact ppm) from the per-arm moment
    census via per-arm ppm truncations (DECIMAL(38,0) vs HUGEINT,
    replayed verbatim).  ONE event-sized combinable census groupBy +
    one census-sized fold; no window, no join (plan-gated)."""
    from .operators.stats import oneway_anova

    arm = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("af|"), F.col("user_id").cast("string")
                    ).cast("binary")
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 3
    )
    e = load_table(spark, sf_dir, "events").select(
        arm.alias("arm"),
        "event_type",
        F.floor(F.col("value") * 1000).cast("long").alias("vq"),
    )
    return oneway_anova(
        e, arm_col="arm", value_col="vq", group_cols=["event_type"]
    )
