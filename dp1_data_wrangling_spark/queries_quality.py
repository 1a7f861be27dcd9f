"""Governance / evaluation query catalog (round 13): privacy-risk
audits, referential-integrity audits, corpus-growth diagnostics and
model-eval curves — the release-readiness tier a training-data
pipeline runs before shipping a table or a model.

Engine extension — the reference (export_dp1.py / import_dp1.py) has
no governance tier; cited for provenance only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import cents, register
from .tables import load_table, spread


@register(
    "customer_k_anonymity",
    """
    SELECT c_nationkey, c_mktsegment,
           (CAST(round(c_acctbal * 100) AS BIGINT) + 100000) // 100000
               AS bal_band,
           CAST(count(*) AS BIGINT) AS class_size,
           CAST(count(DISTINCT c_custkey % 7) AS BIGINT) AS n_sensitive,
           count(*) < 5 AS k_violation,
           count(DISTINCT c_custkey % 7) < 3 AS l_violation
    FROM customer
    GROUP BY 1, 2, 3
    """,
)
def q_customer_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity equivalence-class audit
    (operators/privacy.py, r13): quasi-identifiers = (nation, market
    segment, $1000 balance band — the attacker-linkable columns),
    sensitive = a deterministic 7-way plan tier.  Every class smaller
    than k=5 is a re-identification risk; every class with fewer than
    l=3 distinct tiers leaks its members' tier even when k holds.  The
    balance band rides exact cents shifted non-negative so both
    engines' truncating division agree.  ONE combinable groupBy —
    zero joins, zero windows."""
    from .operators.privacy import k_anonymity

    cust = spread(load_table(spark, sf_dir, "customer")).select(
        "c_nationkey",
        "c_mktsegment",
        F.expr("(cast(round(c_acctbal * 100, 0) as bigint) + 100000) div 100000")
        .alias("bal_band"),
        (F.col("c_custkey") % 7).alias("plan_tier"),
    )
    return k_anonymity(
        cust,
        quasi_cols=["c_nationkey", "c_mktsegment", "bal_band"],
        sensitive_col="plan_tier",
        k=5,
        l_div=3,
    )


@register(
    "warehouse_fk_orphans",
    """
    WITH cust_sub AS (
        SELECT DISTINCT c_custkey FROM customer WHERE c_custkey % 97 != 0
    ),
    part_sub AS (
        SELECT DISTINCT p_partkey FROM part WHERE p_partkey % 89 != 0
    ),
    r1 AS (
        SELECT 'orders.custkey->customer' AS relation,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
                   AS n_null_fk,
               CAST(count(*) FILTER (
                   WHERE o_custkey IS NOT NULL
                     AND o_custkey NOT IN (SELECT c_custkey FROM cust_sub)
               ) AS BIGINT) AS n_orphans
        FROM orders
    ),
    r2 AS (
        SELECT 'lineitem.orderkey->orders' AS relation,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) FILTER (WHERE l_orderkey IS NULL) AS BIGINT)
                   AS n_null_fk,
               CAST(count(*) FILTER (
                   WHERE l_orderkey IS NOT NULL
                     AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)
               ) AS BIGINT) AS n_orphans
        FROM lineitem
    ),
    r3 AS (
        SELECT 'lineitem.partkey->part' AS relation,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) FILTER (WHERE l_partkey IS NULL) AS BIGINT)
                   AS n_null_fk,
               CAST(count(*) FILTER (
                   WHERE l_partkey IS NOT NULL
                     AND l_partkey NOT IN (SELECT p_partkey FROM part_sub)
               ) AS BIGINT) AS n_orphans
        FROM lineitem
    ),
    uni AS (
        SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL
        SELECT * FROM r3
    )
    SELECT relation, n_rows, n_null_fk, n_orphans,
           CASE WHEN n_rows - n_null_fk > 0
                THEN (n_orphans * 1000000) // (n_rows - n_null_fk) END
               AS orphan_ppm
    FROM uni
    """,
)
def q_warehouse_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity orphan audit (operators/expectations.py
    fk_orphan_audit, r13) across three warehouse relations, two with
    PLANTED orphans (the dimension side deterministically drops every
    97th customer / 89th part, so the audit must read non-zero ppm
    there and exactly zero on the complete lineitem->orders relation).
    Per relation one left-anti join (dimension key set broadcastable)
    + combinable counts."""
    from .operators.expectations import fk_orphan_audit

    orders = spread(load_table(spark, sf_dir, "orders"))
    lineitem = spread(load_table(spark, sf_dir, "lineitem"))
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 97 != 0
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_partkey") % 89 != 0
    )
    return fk_orphan_audit(
        [
            (
                "orders.custkey->customer",
                orders,
                "o_custkey",
                customer,
                "c_custkey",
            ),
            (
                "lineitem.orderkey->orders",
                lineitem,
                "l_orderkey",
                orders,
                "o_orderkey",
            ),
            ("lineitem.partkey->part", lineitem, "l_partkey", part, "p_partkey"),
        ]
    )


@register(
    "corpus_heaps_law",
    """
    WITH hl_tok AS (
        SELECT doc_id % 100 AS slot,
               unnest(list_filter(
                   regexp_split_to_array(lower(text), '\\W+'),
                   x -> x != '')) AS term
        FROM documents
    ),
    hl_census AS (
        SELECT term,
               CAST(SUM(CASE WHEN slot < 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS tok_1,
               CAST(SUM(CASE WHEN slot < 10 THEN 1 ELSE 0 END) AS BIGINT)
                   AS tok_10,
               CAST(count(*) AS BIGINT) AS tok_100,
               MIN(CASE WHEN slot < 1 THEN 1
                        WHEN slot < 10 THEN 10 ELSE 100 END) AS fb
        FROM hl_tok GROUP BY term
    ),
    hl_tot AS (
        SELECT CAST(COALESCE(SUM(tok_1), 0) AS BIGINT) AS toks_1,
               CAST(COALESCE(SUM(tok_10), 0) AS BIGINT) AS toks_10,
               CAST(COALESCE(SUM(tok_100), 0) AS BIGINT) AS toks_100,
               CAST(count(*) FILTER (WHERE fb <= 1) AS BIGINT) AS terms_1,
               CAST(count(*) FILTER (WHERE fb <= 10) AS BIGINT) AS terms_10,
               CAST(count(*) AS BIGINT) AS terms_100
        FROM hl_census
    ),
    hl_docs AS (
        SELECT CAST(count(*) FILTER (
                   WHERE doc_id % 100 < 1 AND text IS NOT NULL
               ) AS BIGINT) AS docs_1,
               CAST(count(*) FILTER (
                   WHERE doc_id % 100 < 10 AND text IS NOT NULL
               ) AS BIGINT) AS docs_10,
               CAST(count(*) FILTER (WHERE text IS NOT NULL) AS BIGINT)
                   AS docs_100
        FROM documents
    ),
    hl_rows AS (
        SELECT 1 AS band, docs_1 AS n_docs, toks_1 AS n_tokens,
               terms_1 AS n_terms FROM hl_tot, hl_docs
        UNION ALL
        SELECT 10, docs_10, toks_10, terms_10 FROM hl_tot, hl_docs
        UNION ALL
        SELECT 100, docs_100, toks_100, terms_100 FROM hl_tot, hl_docs
    )
    SELECT band, n_docs, n_tokens, n_terms,
           CASE WHEN lag(n_tokens) OVER (ORDER BY band) > 0
                THEN (n_tokens * 1000000)
                     // lag(n_tokens) OVER (ORDER BY band) END
               AS tokens_growth_ppm,
           CASE WHEN lag(n_terms) OVER (ORDER BY band) > 0
                THEN (n_terms * 1000000)
                     // lag(n_terms) OVER (ORDER BY band) END
               AS terms_growth_ppm,
           CASE WHEN n_tokens > 0
                THEN (n_terms * 1000000) // n_tokens END
               AS terms_per_mtoken
    FROM hl_rows
    """,
)
def q_corpus_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary-growth report (operators/text.py
    vocab_growth, r13) over nested 1%/10%/100% deterministic corpus
    prefixes: the corpus-health curve — natural text's vocabulary
    grows sublinearly in tokens (terms_growth_ppm well under
    tokens_growth_ppm, lexical density falling), a template farm
    flattens it.  ONE (term, band) combinable census from one
    tokenize pass; the report folds census-sized."""
    from .operators.text import vocab_growth

    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    return vocab_growth(docs, bands=(1, 10, 100))


@register(
    "events_roc_curve",
    """
    WITH rc_base AS (
        SELECT event_type,
               CAST(round(value * 100) AS BIGINT) // 100 AS score,
               CASE WHEN (event_id % 100) <
                         ((CAST(round(value * 100) AS BIGINT) // 100) % 97)
                    THEN 1 ELSE 0 END AS y
        FROM events WHERE value IS NOT NULL
    ),
    rc_census AS (
        SELECT event_type, score,
               CAST(SUM(y) AS BIGINT) AS tp_t,
               CAST(SUM(1 - y) AS BIGINT) AS fp_t
        FROM rc_base GROUP BY 1, 2
    ),
    rc_cum AS (
        SELECT event_type, score,
               CAST(SUM(tp_t) OVER w AS BIGINT) AS cum_tp,
               CAST(SUM(fp_t) OVER w AS BIGINT) AS cum_fp,
               CAST(SUM(tp_t) OVER (PARTITION BY event_type) AS BIGINT)
                   AS p,
               CAST(SUM(fp_t) OVER (PARTITION BY event_type) AS BIGINT)
                   AS n
        FROM rc_census
        WINDOW w AS (PARTITION BY event_type ORDER BY score DESC
                     ROWS UNBOUNDED PRECEDING)
    ),
    rc_area AS (
        SELECT *,
               CAST(cum_fp - COALESCE(lag(cum_fp) OVER wl, 0) AS HUGEINT)
               * CAST(COALESCE(lag(cum_tp) OVER wl, 0) + cum_tp AS HUGEINT)
                   AS a2
        FROM rc_cum
        WINDOW wl AS (PARTITION BY event_type ORDER BY score DESC)
    )
    SELECT event_type, score, cum_tp, cum_fp,
           CASE WHEN p > 0 THEN (cum_tp * 1000000) // p END AS tpr_ppm,
           CASE WHEN n > 0 THEN (cum_fp * 1000000) // n END AS fpr_ppm,
           CASE WHEN p > 0 AND n > 0 THEN CAST(
               (SUM(a2) OVER (PARTITION BY event_type) * 1000000)
               // (2 * CAST(p AS HUGEINT) * n) AS BIGINT) END AS auc_ppm
    FROM rc_area
    """,
)
def q_events_roc_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC curve + tie-corrected trapezoidal AUC
    (operators/stats.py roc_curve, r13) per event type: score = exact
    dollar bucket of the event value, label = a deterministic
    score-correlated rule (so the curve must read above the diagonal
    and both engines replay it bit-for-bit).  One event-sized census
    groupBy + census-sized group-keyed windows; no join."""
    from .operators.stats import roc_curve

    ev = spread(load_table(spark, sf_dir, "events")).filter(
        F.col("value").isNotNull()
    )
    scored = ev.select(
        "event_type",
        F.expr("cast(round(value * 100, 0) as bigint) div 100").alias(
            "score"
        ),
        F.expr(
            "case when (event_id % 100) < "
            "((cast(round(value * 100, 0) as bigint) div 100) % 97) "
            "then 1 else 0 end"
        ).alias("label"),
    )
    return roc_curve(
        scored,
        score_col="score",
        label_col="label",
        group_cols=["event_type"],
    )


@register(
    "events_calibration_curve",
    """
    WITH cc_base AS (
        SELECT event_type,
               ((CAST(round(value * 100) AS BIGINT) % 1000) * 1000)
                   AS pred_ppm,
               CASE WHEN (event_id % 1000) <
                         (CASE WHEN event_type = 'error'
                               THEN ((CAST(round(value * 100) AS BIGINT)
                                      % 1000) * 1000) // 2000
                               ELSE ((CAST(round(value * 100) AS BIGINT)
                                      % 1000) * 1000) // 1000 END)
                    THEN 1 ELSE 0 END AS y
        FROM events WHERE value IS NOT NULL
    ),
    cc_census AS (
        SELECT event_type,
               least((pred_ppm * 10) // 1000000, 9) AS bin,
               CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(CAST(pred_ppm AS HUGEINT)) AS HUGEINT) AS sp
        FROM cc_base GROUP BY 1, 2
    ),
    cc_cur AS (
        SELECT event_type, bin, n,
               (sy * 1000000) // n AS observed_ppm,
               CAST(sp // n AS BIGINT) AS predicted_ppm
        FROM cc_census
    )
    SELECT event_type, bin, n, observed_ppm, predicted_ppm,
           CAST(SUM(CAST(n AS HUGEINT) * abs(observed_ppm - predicted_ppm))
                    OVER (PARTITION BY event_type)
                // SUM(CAST(n AS HUGEINT)) OVER (PARTITION BY event_type)
               AS BIGINT) AS ece_ppm
    FROM cc_cur
    """,
)
def q_events_calibration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact reliability diagram + ECE (operators/stats.py
    calibration_curve, r13) per event type: the prediction is a
    deterministic ppm score, the label fires with exactly that
    probability for every type EXCEPT 'error', whose labels fire at
    HALF the predicted rate — so the screen must read 'error' as
    over-confident (large ece_ppm) and the rest as calibrated.  One
    census groupBy + census-sized group-keyed windows; no join."""
    from .operators.stats import calibration_curve

    ev = spread(load_table(spark, sf_dir, "events")).filter(
        F.col("value").isNotNull()
    )
    pred = "((cast(round(value * 100, 0) as bigint) % 1000) * 1000)"
    scored = ev.select(
        "event_type",
        F.expr(pred).alias("pred_ppm"),
        F.expr(
            f"case when (event_id % 1000) < "
            f"(case when event_type = 'error' then {pred} div 2000 "
            f"else {pred} div 1000 end) then 1 else 0 end"
        ).alias("label"),
    )
    return calibration_curve(
        scored,
        pred_ppm_col="pred_ppm",
        label_col="label",
        n_bins=10,
        group_cols=["event_type"],
    )


@register(
    "orders_rollup_report",
    """
    SELECT o_orderpriority,
           CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
               AS order_month,
           CASE WHEN GROUPING(o_orderpriority) = 0
                 AND GROUPING(year(o_orderdate) * 100
                              + month(o_orderdate)) = 0 THEN 0
                WHEN GROUPING(o_orderpriority) = 0 THEN 1
                ELSE 2 END AS level,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
    FROM orders
    GROUP BY ROLLUP (o_orderpriority,
                     year(o_orderdate) * 100 + month(o_orderdate))
    """,
)
def q_orders_rollup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ROLLUP subtotal report (r13 — the grouping-sets surface):
    revenue and order counts per (priority, month), per priority, and
    the grand total, in ONE pass via Spark's Expand operator (each
    input row fans to its 3 grouping levels map-side, partial
    aggregation combines before the single shuffle — the classic
    subtotal pattern at any scale).  ``level`` derives from
    GROUPING() in both engines (grouping_id bit orders differ, the
    CASE normalizes); revenue rides exact cents."""
    orders = spread(load_table(spark, sf_dir, "orders"))
    pri = F.col("o_orderpriority")
    month = (
        F.year("o_orderdate") * F.lit(100) + F.month("o_orderdate")
    ).cast("bigint")
    return (
        orders.select(
            pri.alias("o_orderpriority"),
            month.alias("order_month"),
            F.expr("cast(round(o_totalprice * 100, 0) as bigint)").alias(
                "__cents"
            ),
        )
        .rollup("o_orderpriority", "order_month")
        .agg(
            # grouping() is only legal INSIDE the rollup aggregate
            F.when(
                (F.grouping("o_orderpriority") == 0)
                & (F.grouping("order_month") == 0),
                F.lit(0),
            )
            .when(F.grouping("o_orderpriority") == 0, F.lit(1))
            .otherwise(F.lit(2))
            .cast("int")
            .alias("level"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("__cents").cast("bigint").alias("revenue_cents"),
        )
        .select(
            "o_orderpriority",
            "order_month",
            "level",
            "n_orders",
            "revenue_cents",
        )
    )


@register(
    "events_uplift_curve",
    """
    WITH uc_raw AS (
        SELECT event_type,
               CAST(round(value * 100) AS BIGINT) // 100 AS score,
               CAST(('0x' || substr(md5('uplift|' ||
                    CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT) % 2
                   AS arm,
               CAST(('0x' || substr(md5('draw|' ||
                    CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000
                   AS draw
        FROM events WHERE value IS NOT NULL
    ),
    uc_base AS (
        SELECT event_type, score, arm,
               CASE WHEN draw <
                         50 + ((score % 97) * (1 + 2 * arm)) // 10
                    THEN 1 ELSE 0 END AS y
        FROM uc_raw
    ),
    uc_census AS (
        SELECT event_type, score,
               CAST(SUM(arm) AS BIGINT) AS nt,
               CAST(SUM(1 - arm) AS BIGINT) AS nc,
               CAST(SUM(arm * y) AS BIGINT) AS yt,
               CAST(SUM((1 - arm) * y) AS BIGINT) AS yc
        FROM uc_base GROUP BY 1, 2
    ),
    uc_cum AS (
        SELECT event_type, score,
               CAST(SUM(nt) OVER w AS BIGINT) AS n_t,
               CAST(SUM(nc) OVER w AS BIGINT) AS n_c,
               CAST(SUM(yt) OVER w AS BIGINT) AS y_t,
               CAST(SUM(yc) OVER w AS BIGINT) AS y_c
        FROM uc_census
        WINDOW w AS (PARTITION BY event_type ORDER BY score DESC
                     ROWS UNBOUNDED PRECEDING)
    )
    SELECT event_type, score, n_t, n_c, y_t, y_c,
           CASE WHEN n_t > 0 AND n_c > 0 THEN CAST(
               CASE WHEN (CAST(y_t AS HUGEINT) * n_c
                          - CAST(y_c AS HUGEINT) * n_t) >= 0
                    THEN ((CAST(y_t AS HUGEINT) * n_c
                           - CAST(y_c AS HUGEINT) * n_t) * 1000000)
                         // (CAST(n_t AS HUGEINT) * n_c)
                    ELSE -(((CAST(y_c AS HUGEINT) * n_t
                             - CAST(y_t AS HUGEINT) * n_c) * 1000000)
                           // (CAST(n_t AS HUGEINT) * n_c)) END
               AS BIGINT) END AS uplift_ppm,
           CASE WHEN n_c > 0 THEN CAST(
               y_t - (CAST(y_c AS HUGEINT) * n_t) // n_c AS BIGINT) END
               AS qini_inc
    FROM uc_cum
    """,
)
def q_events_uplift_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact uplift / Qini curve (operators/stats.py uplift_curve,
    r13): md5-parity treatment arms (the real experiment-framework
    assignment, engine-replayable), score = exact dollar bucket, and a
    PLANTED heterogeneous effect — treated units' conversion draw
    scales 3x with the score where control scales 1x — so the curve
    must read positive uplift concentrated at high scores.  The
    truncate-toward-zero division is sign-split in both engines (Spark
    div and DuckDB // disagree on negatives).  One census groupBy +
    census-sized group-keyed windows; no join."""
    from .operators.stats import uplift_curve

    ev = spread(load_table(spark, sf_dir, "events")).filter(
        F.col("value").isNotNull()
    )

    def md5_mod(tag: str, m: int) -> F.Column:
        payload = F.concat(
            F.lit(tag + "|"), F.col("event_id").cast("string")
        ).cast("binary")
        return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast(
            "bigint"
        ) % m

    score = "cast(round(value * 100, 0) as bigint) div 100"
    # threshold = 50 + ((score % 97) * (1 + 2*arm)) div 10 — all
    # integers (a float /10 here would diverge from the oracle's //)
    prod = F.expr(f"({score}) % 97") * (
        F.lit(1) + F.lit(2) * md5_mod("uplift", 2)
    )
    thresh = F.lit(50) + ((prod - prod % F.lit(10)) / F.lit(10)).cast(
        "bigint"
    )
    scored = ev.select(
        "event_type",
        F.expr(score).alias("score"),
        md5_mod("uplift", 2).alias("arm"),
        F.when(md5_mod("draw", 1000) < thresh, F.lit(1))
        .otherwise(F.lit(0))
        .alias("label"),
    )
    return uplift_curve(
        scored,
        arm_col="arm",
        score_col="score",
        label_col="label",
        group_cols=["event_type"],
    )


@register(
    "documents_profile_drift",
    """
    WITH pd_cur AS (
        SELECT doc_id,
               CASE WHEN doc_id % 11 = 0 THEN NULL ELSE text END AS text,
               substr(lang, 1, 1) AS lang,
               CAST(doc_id % 4 AS VARCHAR) AS quality_tier
        FROM documents
    ),
    pd_ref_p AS (
        SELECT 'doc_id' AS column_name,
               CAST(count(*) AS BIGINT) AS n_rows_ref,
               CAST(count(*) - count(doc_id) AS BIGINT) AS n_nulls_ref,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct_ref
        FROM documents
        UNION ALL
        SELECT 'text', CAST(count(*) AS BIGINT),
               CAST(count(*) - count(text) AS BIGINT),
               CAST(count(DISTINCT text) AS BIGINT) FROM documents
        UNION ALL
        SELECT 'lang', CAST(count(*) AS BIGINT),
               CAST(count(*) - count(lang) AS BIGINT),
               CAST(count(DISTINCT lang) AS BIGINT) FROM documents
        UNION ALL
        SELECT 'source', CAST(count(*) AS BIGINT),
               CAST(count(*) - count(source) AS BIGINT),
               CAST(count(DISTINCT source) AS BIGINT) FROM documents
    ),
    pd_cur_p AS (
        SELECT 'doc_id' AS column_name,
               CAST(count(*) AS BIGINT) AS n_rows_cur,
               CAST(count(*) - count(doc_id) AS BIGINT) AS n_nulls_cur,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct_cur
        FROM pd_cur
        UNION ALL
        SELECT 'text', CAST(count(*) AS BIGINT),
               CAST(count(*) - count(text) AS BIGINT),
               CAST(count(DISTINCT text) AS BIGINT) FROM pd_cur
        UNION ALL
        SELECT 'lang', CAST(count(*) AS BIGINT),
               CAST(count(*) - count(lang) AS BIGINT),
               CAST(count(DISTINCT lang) AS BIGINT) FROM pd_cur
        UNION ALL
        SELECT 'quality_tier', CAST(count(*) AS BIGINT),
               CAST(count(*) - count(quality_tier) AS BIGINT),
               CAST(count(DISTINCT quality_tier) AS BIGINT) FROM pd_cur
    )
    SELECT COALESCE(r.column_name, c.column_name) AS column_name,
           r.column_name IS NOT NULL AS in_ref,
           c.column_name IS NOT NULL AS in_cur,
           r.n_rows_ref, c.n_rows_cur, r.n_nulls_ref, c.n_nulls_cur,
           CASE WHEN r.n_rows_ref > 0
                THEN (r.n_nulls_ref * 1000000) // r.n_rows_ref END
               AS null_ppm_ref,
           CASE WHEN c.n_rows_cur > 0
                THEN (c.n_nulls_cur * 1000000) // c.n_rows_cur END
               AS null_ppm_cur,
           (CASE WHEN c.n_rows_cur > 0
                 THEN (c.n_nulls_cur * 1000000) // c.n_rows_cur END)
           - (CASE WHEN r.n_rows_ref > 0
                   THEN (r.n_nulls_ref * 1000000) // r.n_rows_ref END)
               AS null_shift_ppm,
           r.n_distinct_ref, c.n_distinct_cur,
           CASE WHEN r.n_distinct_ref > 0
                THEN (c.n_distinct_cur * 1000000) // r.n_distinct_ref END
               AS distinct_ratio_ppm
    FROM pd_ref_p r
    FULL OUTER JOIN pd_cur_p c ON c.column_name = r.column_name
    """,
)
def q_documents_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot profile-drift audit (operators/profile.py
    profile_drift, r13): the fresh snapshot NULLs every 11th text (a
    planted extraction regression the audit must read as
    null_shift_ppm ~ +90,909), collapses lang to its first letter
    (distinct_ratio_ppm < 1e6), DROPS the source column and ADDS
    quality_tier (the in_ref/in_cur schema-contract flags).  Two
    one-pass profile aggregates + a column-count-sized full outer."""
    from .operators.profile import profile_drift

    docs = spread(load_table(spark, sf_dir, "documents"))
    ref = docs.select("doc_id", "text", "lang", "source")
    cur = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 11 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("text"))
        .alias("text"),
        F.substring("lang", 1, 1).alias("lang"),
        (F.col("doc_id") % 4).cast("string").alias("quality_tier"),
    )
    return profile_drift(ref, cur)


@register(
    "events_classification_report",
    """
    WITH cr_e AS (
        SELECT CASE WHEN (epoch_us(ts) // 3600000000) % 24 < 12
                    THEN 'am' ELSE 'pm' END AS half_day,
               event_type AS actual,
               CASE WHEN CAST(('0x' || substr(md5('clf|'
                             || CAST(event_id AS VARCHAR)), 1, 15))
                         AS BIGINT) % 5 = 0
                    THEN 'error' ELSE event_type END AS predicted
        FROM events
    ),
    cr_c AS (
        SELECT half_day, actual, predicted,
               CAST(count(*) AS BIGINT) AS n
        FROM cr_e GROUP BY 1, 2, 3
    ),
    cr_cls AS (
        SELECT DISTINCT half_day, actual AS label_class FROM cr_c
        UNION
        SELECT DISTINCT half_day, predicted FROM cr_c
    ),
    cr_per AS (
        SELECT cl.half_day, cl.label_class,
               CAST(coalesce(sum(CASE WHEN c.actual = cl.label_class
                                       AND c.predicted = cl.label_class
                                      THEN c.n END), 0) AS BIGINT) AS tp,
               CAST(coalesce(sum(CASE WHEN c.predicted = cl.label_class
                                       AND c.actual <> cl.label_class
                                      THEN c.n END), 0) AS BIGINT) AS fp,
               CAST(coalesce(sum(CASE WHEN c.actual = cl.label_class
                                       AND c.predicted <> cl.label_class
                                      THEN c.n END), 0) AS BIGINT) AS fn
        FROM cr_cls cl
        LEFT JOIN cr_c c ON c.half_day = cl.half_day
        GROUP BY 1, 2
    )
    SELECT half_day, label_class, tp, fp, fn,
           CAST(tp + fn AS BIGINT) AS support,
           CASE WHEN tp + fp > 0
                THEN CAST((CAST(tp AS HUGEINT) * 1000000) // (tp + fp)
                          AS BIGINT) END AS precision_ppm,
           CASE WHEN tp + fn > 0
                THEN CAST((CAST(tp AS HUGEINT) * 1000000) // (tp + fn)
                          AS BIGINT) END AS recall_ppm,
           CASE WHEN 2 * tp + fp + fn > 0
                THEN CAST((CAST(tp AS HUGEINT) * 2000000)
                          // (2 * tp + fp + fn) AS BIGINT) END AS f1_ppm
    FROM cr_per
    """,
)
def q_events_classification_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-class precision/recall/F1 report (operators/agreement.py
    classification_report, r13): actual = the logged event type,
    predicted = a planted deterministic classifier that mislabels
    every 5th event (md5 parity) as 'error' — the report must read
    'error' precision collapsing (~20% of ALL traffic floods in as
    false positives) while every other class holds ~800k ppm recall.
    All three rates are single truncating divisions of census
    integers (F1's harmonic mean needs no intermediate rates:
    2*tp*1e6 div (2*tp+fp+fn)).  ONE data-sized census groupBy +
    census-sized explode/fold — no window, no data join."""
    from .operators.agreement import classification_report

    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    flip = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("clf|"), F.col("event_id").cast("string")
                    ).cast("binary")
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 5
    )
    labeled = e.select(
        F.when(F.expr("ts_us div 3600000000") % 24 < 12, F.lit("am"))
        .otherwise(F.lit("pm"))
        .alias("half_day"),
        F.col("event_type").alias("actual"),
        F.when(flip == 0, F.lit("error"))
        .otherwise(F.col("event_type"))
        .alias("predicted"),
    )
    return classification_report(
        labeled,
        actual_col="actual",
        predicted_col="predicted",
        group_cols=["half_day"],
    )


@register(
    "events_rater_agreement",
    """
    WITH ka_e AS (
        SELECT event_type,
               CAST(floor(value * 100) AS BIGINT) % 3 AS da,
               CAST(('0x' || substr(md5('ra|'
                     || CAST(event_id AS VARCHAR)), 1, 15))
                    AS BIGINT) AS m
        FROM events
    ),
    ka_r AS (
        SELECT event_type,
               CASE da WHEN 0 THEN 'low' WHEN 1 THEN 'mid'
                       ELSE 'high' END AS ra,
               CASE (da + CASE
                         WHEN event_type = 'click'
                              AND m % 4 <> 0 THEN 1
                         WHEN event_type <> 'click'
                              AND m % 10 = 0 THEN 1
                         ELSE 0 END) % 3
                    WHEN 0 THEN 'low' WHEN 1 THEN 'mid'
                    ELSE 'high' END AS rb
        FROM ka_e
    ),
    ka_c AS (
        SELECT event_type, ra, rb, CAST(count(*) AS BIGINT) AS n
        FROM ka_r GROUP BY 1, 2, 3
    ),
    ka_t AS (
        SELECT event_type,
               CAST(sum(n) AS BIGINT) AS n_items,
               CAST(coalesce(sum(CASE WHEN ra = rb THEN n END), 0)
                    AS BIGINT) AS n_agree
        FROM ka_c GROUP BY 1
    ),
    ka_ma AS (
        SELECT event_type, ra AS cls, CAST(sum(n) AS HUGEINT) AS rm
        FROM ka_c GROUP BY 1, 2
    ),
    ka_mb AS (
        SELECT event_type, rb AS cls, CAST(sum(n) AS HUGEINT) AS cm
        FROM ka_c GROUP BY 1, 2
    ),
    ka_s AS (
        SELECT a.event_type,
               CAST(coalesce(sum(a.rm * b.cm), 0) AS HUGEINT) AS s
        FROM ka_ma a
        JOIN ka_mb b ON a.event_type = b.event_type AND a.cls = b.cls
        GROUP BY 1
    )
    SELECT t.event_type, t.n_items, t.n_agree,
           CAST((CAST(t.n_agree AS HUGEINT) * 1000000) // t.n_items
                AS BIGINT) AS po_ppm,
           CAST((s.s * 1000000)
                // (CAST(t.n_items AS HUGEINT) * t.n_items)
                AS BIGINT) AS pe_ppm,
           CASE WHEN CAST(t.n_items AS HUGEINT) * t.n_items - s.s > 0
                THEN CAST(CASE
                    WHEN CAST(t.n_items AS HUGEINT) * t.n_agree - s.s >= 0
                    THEN ((CAST(t.n_items AS HUGEINT) * t.n_agree - s.s)
                          * 1000000)
                         // (CAST(t.n_items AS HUGEINT) * t.n_items - s.s)
                    ELSE -(((s.s - CAST(t.n_items AS HUGEINT) * t.n_agree)
                            * 1000000)
                           // (CAST(t.n_items AS HUGEINT) * t.n_items
                               - s.s))
                    END AS BIGINT) END AS kappa_ppm
    FROM ka_t t JOIN ka_s s ON t.event_type = s.event_type
    """,
)
def q_events_rater_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's-kappa inter-rater agreement per event type
    (operators/agreement.py cohens_kappa, r13): rater A tiers each
    event by a value digit (low/mid/high), rater B repeats A except a
    planted md5-deterministic disagreement — 75% of 'click' ratings
    shift one tier (po ~ 250k ppm < pe ~ 333k ppm: kappa must read
    NEGATIVE, worse than chance, exercising the sign-split division)
    while other types shift only 10% (kappa ~ +850k ppm).  The
    chance-expected term S = sum_c rowsum_c*colsum_c cross-multiplies
    in DECIMAL(38,0) vs HUGEINT; ONE data-sized census groupBy,
    everything downstream census-sized (plan-gated)."""
    from .operators.agreement import cohens_kappa

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    m = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("ra|"), F.col("event_id").cast("string")
                ).cast("binary")
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    shift = (
        F.when((F.col("event_type") == "click") & (m % 4 != 0), F.lit(1))
        .when((F.col("event_type") != "click") & (m % 10 == 0), F.lit(1))
        .otherwise(F.lit(0))
    )
    tier = lambda d: (  # noqa: E731 — tiny local naming helper
        F.when(d == 0, F.lit("low"))
        .when(d == 1, F.lit("mid"))
        .otherwise(F.lit("high"))
    )
    rated = e.select(
        "event_type",
        tier(F.floor(F.col("value") * 100).cast("bigint") % 3).alias(
            "rater_a"
        ),
        tier(
            (F.floor(F.col("value") * 100).cast("bigint") % 3 + shift) % 3
        ).alias("rater_b"),
    )
    return cohens_kappa(
        rated,
        rater_a_col="rater_a",
        rater_b_col="rater_b",
        group_cols=["event_type"],
    )


@register(
    "doc_langid_eval",
    """
    WITH le_g AS (
        SELECT d.source, d.lang AS actual,
               CASE WHEN s.score_en >= s.score_de AND s.score_en >= s.score_es
                         AND s.score_en >= s.score_fr THEN 'en'
                    WHEN s.score_de >= s.score_es
                         AND s.score_de >= s.score_fr THEN 'de'
                    WHEN s.score_es >= s.score_fr THEN 'es'
                    ELSE 'fr' END AS predicted
        FROM documents d
        JOIN (SELECT doc_id,
                     CAST((length(lower(text))
                           - length(replace(lower(text), ' the ', '')))
                          / 5
                          + (length(lower(text))
                             - length(replace(lower(text), ' and ', '')))
                            / 5 AS BIGINT) AS score_en,
                     CAST((length(lower(text))
                           - length(replace(lower(text), ' der ', '')))
                          / 5
                          + (length(lower(text))
                             - length(replace(lower(text), ' und ', '')))
                            / 5 AS BIGINT) AS score_de,
                     CAST((length(lower(text))
                           - length(replace(lower(text), ' el ', '')))
                          / 4
                          + (length(lower(text))
                             - length(replace(lower(text), ' los ', '')))
                            / 5 AS BIGINT) AS score_es,
                     CAST((length(lower(text))
                           - length(replace(lower(text), ' le ', '')))
                          / 4
                          + (length(lower(text))
                             - length(replace(lower(text), ' les ', '')))
                            / 5 AS BIGINT) AS score_fr
              FROM documents) s USING (doc_id)
    ),
    le_c AS (
        SELECT source, actual, predicted, CAST(count(*) AS BIGINT) AS n
        FROM le_g GROUP BY 1, 2, 3
    ),
    le_cls AS (
        SELECT DISTINCT source, actual AS label_class FROM le_c
        UNION
        SELECT DISTINCT source, predicted FROM le_c
    ),
    le_per AS (
        SELECT cl.source, cl.label_class,
               CAST(coalesce(sum(CASE WHEN c.actual = cl.label_class
                                       AND c.predicted = cl.label_class
                                      THEN c.n END), 0) AS BIGINT) AS tp,
               CAST(coalesce(sum(CASE WHEN c.predicted = cl.label_class
                                       AND c.actual <> cl.label_class
                                      THEN c.n END), 0) AS BIGINT) AS fp,
               CAST(coalesce(sum(CASE WHEN c.actual = cl.label_class
                                       AND c.predicted <> cl.label_class
                                      THEN c.n END), 0) AS BIGINT) AS fn
        FROM le_cls cl
        LEFT JOIN le_c c ON c.source = cl.source
        GROUP BY 1, 2
    )
    SELECT source, label_class, tp, fp, fn,
           CAST(tp + fn AS BIGINT) AS support,
           CASE WHEN tp + fp > 0
                THEN CAST((CAST(tp AS HUGEINT) * 1000000) // (tp + fp)
                          AS BIGINT) END AS precision_ppm,
           CASE WHEN tp + fn > 0
                THEN CAST((CAST(tp AS HUGEINT) * 1000000) // (tp + fn)
                          AS BIGINT) END AS recall_ppm,
           CASE WHEN 2 * tp + fp + fn > 0
                THEN CAST((CAST(tp AS HUGEINT) * 2000000)
                          // (2 * tp + fp + fn) AS BIGINT) END AS f1_ppm
    FROM le_per
    """,
)
def q_doc_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-eval of the engine's OWN language-ID heuristic against the
    fixture's labeled lang, per scrape source (operators/agreement.py
    classification_report over operators/text.py lang_id): the honest
    readout includes 'zh' — a class the 4-language marker heuristic can
    NEVER predict, so it must read recall 0 with precision NULL (tp=0,
    fp=0 — never faked).  This is the per-source model-quality monitor
    a curation pipeline runs when a new scrape source lands.  The
    oracle inlines the marker-score replay (the doc_lang_id contract)
    plus the census-fold report replay."""
    from .operators.agreement import classification_report
    from .operators import text as tx

    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "source", "lang", "text"
    )
    labeled = tx.lang_id(docs).select(
        "source",
        F.col("lang").alias("actual"),
        F.col("lang_guess").alias("predicted"),
    )
    return classification_report(
        labeled,
        actual_col="actual",
        predicted_col="predicted",
        group_cols=["source"],
    )
