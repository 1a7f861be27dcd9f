"""Analytics aggregates (TPC-H-style exact fixed-point money),
sketches, export plan composition, profiling.

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



# Analytics aggregates (TPC-H-style; exact fixed-point money)
# ---------------------------------------------------------------------------


@register(
    "revenue_agg",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS sum_disc_e4,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_revenue_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary (SURVEY.md §2.9) in exact
    fixed-point: map-side combinable BIGINT sums, zero float drift."""
    li = load_table(spark, sf_dir, "lineitem")
    base_cents = cents(F.col("l_extendedprice"))
    disc_pct = F.round(F.col("l_discount") * 100, 0).cast("long")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(base_cents).alias("sum_base_cents"),
            F.sum(base_cents * (F.lit(100) - disc_pct)).alias("sum_disc_e4"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "join_agg_topk",
    """
    SELECT n.n_name AS nation_name,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
           count(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY total_cents DESC, nation_name
    LIMIT 10
    """,
)
def q_join_agg_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-dim-dim star join + agg + top-k: broadcast both dims, single
    shuffle for the aggregate, TakeOrderedAndProject for the cut."""
    o = load_table(spark, sf_dir, "orders")
    c = F.broadcast(load_table(spark, sf_dir, "customer"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.sum(cents(F.col("o_totalprice"))).alias("total_cents"),
            F.count("*").alias("n_orders"),
        )
        .orderBy(F.col("total_cents").desc(), F.col("nation_name"))
        .limit(10)
    )


@register(
    "date_agg",
    """
    SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(month(o_orderdate) AS BIGINT) AS order_month,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM orders
    GROUP BY 1, 2
    """,
)
def q_date_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C: temporal scalar functions (year/month) + exact money agg."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(cents(F.col("o_totalprice"))).alias("total_cents"),
    )


@register(
    "date_trunc_agg",
    """
    SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           count(*) AS n_items
    FROM lineitem
    GROUP BY 1
    """,
)
def q_date_trunc_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "lineitem")
    return o.groupBy(
        F.date_trunc("month", F.col("l_shipdate")).alias("ship_month")
    ).agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.count("*").alias("n_items"),
    )


@register(
    "rollup_agg",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def q_rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 note: hierarchical rollup (free from Spark, oracle-checkable)."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(cents(F.col("o_totalprice"))).alias("total_cents"),
    )


@register(
    "json_extract",
    """
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C: JSON scalar extraction on the events.props column."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.select("event_id", "event_type", k.alias("k")).filter(
        F.col("k") >= 50
    )


@register(
    "json_struct_parse",
    """
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(props::JSON ->> 'k' AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(min(CAST(props::JSON ->> 'k' AS BIGINT)) AS BIGINT) AS min_k
    FROM events
    GROUP BY event_type
    """,
)
def q_json_struct_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parsing: ``from_json`` with a declared schema (vs
    json_extract's stringly access) then plain columnar aggregation —
    parse once per row, read fields as columns."""
    e = load_table(spark, sf_dir, "events")
    parsed = e.withColumn("__p", F.from_json("props", "k BIGINT"))
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("__p.k")).alias("sum_k"),
        F.min(F.col("__p.k")).alias("min_k"),
    )


@register(
    "salted_agg",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS sum_price_cents,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-defended aggregation: lineitem grouped by (returnflag,
    linestatus) — a handful of white-hot keys — via two-phase salted
    sum/count (operators/skew.py).  Result identical to the plain groupBy
    the oracle runs; the plan spreads each hot key over 16 reducers."""
    from .operators.skew import salted_sum_count

    li = load_table(spark, sf_dir, "lineitem")
    return salted_sum_count(
        li,
        ["l_returnflag", "l_linestatus"],
        cents(F.col("l_extendedprice")),
        salt_source=F.col("l_orderkey") * 8 + F.col("l_linenumber"),
        sum_alias="sum_price_cents",
        count_alias="n_rows",
    )


@register(
    "salted_join",
    """
    SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag, f.flag_label
    FROM lineitem l
    JOIN (SELECT * FROM (VALUES ('A', 'returned'), ('N', 'kept'), ('R', 'refunded'))
          t(l_returnflag, flag_label)) f
      ON l.l_returnflag = f.l_returnflag
    """,
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-defended join: lineitem against a 3-row label table on the
    white-hot l_returnflag key, pre-salted 16× (operators/skew.py).
    Answer-equivalent to the plain join the oracle runs — salting changes
    the partitioning, never the result."""
    from .operators.skew import salted_broadcast_join

    li = load_table(spark, sf_dir, "lineitem")
    labels = local_df(
        spark,
        [("A", "returned"), ("N", "kept"), ("R", "refunded")],
        "l_returnflag string, flag_label string",
    )
    return salted_broadcast_join(
        li,
        labels,
        "l_returnflag",
        salt_source=F.col("l_orderkey") * 8 + F.col("l_linenumber"),
    ).select("l_orderkey", "l_linenumber", "l_returnflag", "flag_label")


@register(
    "set_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8: intersect (nations having both customers and suppliers)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


@register(
    "cube_agg",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 note: full cube (all grouping sets; free from Spark)."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("n"))


@register(
    "pivot_agg",
    """
    SELECT o_orderpriority,
           CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_f,
           CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS n_o,
           CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS n_p
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_pivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot on a known-value column: one shuffle, conditional aggregates
    (the oracle replays it as FILTER aggregates)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .select(
            "o_orderpriority",
            F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
            F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
            F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
        )
    )


APPROX_DISTINCT_RSD = 0.02
APPROX_DISTINCT_TOL = 0.05  # assert |approx-exact| <= 5% (2.5 sigma of rsd)


@register(
    "approx_distinct",
    """
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS exact_customers,
           TRUE AS within_bound
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per order status, registered
    as a *bound-check* oracle: sketch internals differ across engines, so
    the driver-compared output carries the exact count plus the assertion
    that the sketch landed within APPROX_DISTINCT_TOL of it (a red
    ``within_bound=false`` cell hash-mismatches the oracle's TRUE).  The
    unit test additionally bounds the raw relative error."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.approx_count_distinct("o_custkey", APPROX_DISTINCT_RSD).alias("__approx"),
            F.countDistinct("o_custkey").alias("exact_customers"),
        )
        .select(
            "o_orderstatus",
            "exact_customers",
            (
                F.abs(F.col("__approx") - F.col("exact_customers"))
                <= APPROX_DISTINCT_TOL * F.col("exact_customers")
            ).alias("within_bound"),
        )
    )


@register(
    "export_plan",
    """
    WITH chain AS (
        SELECT child, position FROM fx_collection_chains
        WHERE parent = 'chain_root'
    ),
    resolved AS (
        SELECT dataset_id, run, customer, nation FROM (
            SELECT d.*, row_number() OVER (
                PARTITION BY d.customer, d.nation
                ORDER BY c.position, hex(d.dataset_id)) AS rn
            FROM fx_datasets d JOIN chain c ON d.run = c.child
        ) WHERE rn = 1
    ),
    rec AS (
        SELECT dataset_id, path FROM (
            SELECT r.*, row_number() OVER (
                PARTITION BY dataset_id
                ORDER BY CASE datastore_name WHEN 'ds_primary' THEN 0 ELSE 1 END,
                         path) AS rn
            FROM fx_datastore_records r
        ) WHERE rn = 1
    ),
    tagged AS (
        SELECT DISTINCT dataset_id FROM fx_associations
        WHERE collection = 'tagged_a'
    )
    SELECT hex(r.dataset_id) AS dataset_id_hex, r.run, r.customer, r.nation,
           n.name AS nation_name, cu.mktsegment, rec.path,
           t.dataset_id IS NOT NULL AS is_tagged
    FROM resolved r
    JOIN fx_dim_customer cu ON r.customer = cu.customer
    JOIN fx_dim_nation n ON r.nation = n.nation
    JOIN rec ON r.dataset_id = rec.dataset_id
    LEFT JOIN tagged t ON r.dataset_id = t.dataset_id
    """,
    headline=True,
)
def q_export_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole export data plane as ONE declarative plan (plans/export.py;
    reference exporter.py:75-141): find-first resolution over the flattened
    chain (J4), dimension expansion via broadcast joins (J1), priority-
    deduped datastore lookup (J5), tagged-membership flag (P5).  Catalyst
    sees a single tree: one window shuffle on the data-ID, one on
    dataset_id; every dimension join broadcasts."""
    datasets = fx.build_datasets(spark, sf_dir)
    chain = flatten_chains(
        spark,
        fx.build_collection_chains(spark),
        fx.build_collections(spark),
        "chain_root",
    )
    resolved = find_first(datasets, chain, ["customer", "nation"], collection_col="run")
    dim_cust = F.broadcast(
        fx.build_dim_customer(spark, sf_dir).select("customer", "mktsegment")
    )
    dim_nat = F.broadcast(
        fx.build_dim_nation(spark, sf_dir).select(
            "nation", F.col("name").alias("nation_name")
        )
    )
    rec = priority_dedup(
        fx.build_datastore_records(spark, sf_dir),
        priority_map(spark, ["ds_primary", "ds_secondary"]),
    ).select("dataset_id", "path")
    tagged = (
        fx.build_associations(spark, sf_dir)
        .filter(F.col("collection") == "tagged_a")
        .select("dataset_id")
        .distinct()
        .withColumn("__tagged", F.lit(True))
    )
    return (
        resolved.join(dim_cust, "customer")
        .join(dim_nat, "nation")
        .join(rec, "dataset_id")
        .join(tagged, "dataset_id", "left")
        .select(
            F.hex("dataset_id").alias("dataset_id_hex"),
            "run",
            "customer",
            "nation",
            "nation_name",
            "mktsegment",
            "path",
            F.coalesce(F.col("__tagged"), F.lit(False)).alias("is_tagged"),
        )
    )


@register(
    "multi_join_revenue",
    """
    SELECT n.n_name AS nation_name,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
               AS revenue_e4,
           count(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue_e4 DESC, nation_name
    """,
    headline=True,
)
def q_multi_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 5-way join: ONE fact-fact join (lineitem⋈orders,
    both shuffle on orderkey) and three broadcast dimension hops; the date
    + region filters reach the scans, so the shuffled side is pre-pruned.
    Exact fixed-point revenue (cents × discount basis points)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = F.broadcast(load_table(spark, sf_dir, "customer"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    disc_bp = F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.sum(cents(F.col("l_extendedprice")) * disc_bp).alias("revenue_e4"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.col("revenue_e4").desc(), "nation_name")
    )


@register(
    "grouping_sets_agg",
    """
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents,
           CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
               AS BIGINT) AS gid
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def q_grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping_id disambiguation (engine
    extra beyond rollup/cube; one Expand + one shuffle)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(cents(F.col("o_totalprice"))).alias("total_cents"),
            F.grouping_id().cast("long").alias("gid"),
        )
    )


@register(
    "window_range_frame",
    """
    SELECT o_custkey, o_orderkey, cents,
           CAST(sum(cents) OVER (
               PARTITION BY o_custkey ORDER BY cents
               RANGE BETWEEN 100000 PRECEDING AND 100000 FOLLOWING
           ) AS BIGINT) AS near_cents_sum
    FROM (
        SELECT o_custkey, o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    )
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 frame specs: a RANGE frame (value-based bounds, ±1000 currency
    units) — complements rolling_sum's ROWS frame; exact integer cents so
    frame boundaries are engine-identical."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("o_custkey").orderBy("cents").rangeBetween(-100_000, 100_000)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "cents",
        F.sum("cents").over(w).alias("near_cents_sum"),
    )


@register(
    "percentile_agg",
    """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS p25_qty,
           median(l_quantity) AS p50_qty,
           quantile_cont(l_quantity, 0.9) AS p90_qty,
           count(*) AS n_items
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_percentile_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile`` ==
    DuckDB ``quantile_cont`` — both linear interpolation over the sorted
    group).  Exact percentile needs the full group sorted; at 100 TB
    switch to ``approx_percentile`` (Greenwald-Khanna sketch, map-side
    combinable), which this engine exposes unchanged."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("p25_qty"),
        F.expr("percentile(l_quantity, 0.5)").alias("p50_qty"),
        F.expr("percentile(l_quantity, 0.9)").alias("p90_qty"),
        F.count("*").alias("n_items"),
    )


APPROX_P50_ABS_TOL = 2.0  # l_quantity spans 1..50; GK rank error 1/1000


@register(
    "approx_percentile",
    """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS exact_p50,
           count(*) AS n_items,
           TRUE AS within_bound
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch, map-side combinable) —
    the 100 TB path next to percentile_agg's exact form.  Registered as a
    *bound-check* oracle: the sketch value itself is engine-specific, so
    the compared output carries the exact median plus the assertion that
    the sketch landed within APPROX_P50_ABS_TOL of it; the unit test
    additionally bounds the raw error."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("approx_percentile(l_quantity, 0.5, 1000)").alias("__approx_p50"),
            F.expr("percentile(l_quantity, 0.5)").alias("exact_p50"),
            F.count("*").alias("n_items"),
        )
        .select(
            "l_returnflag",
            "exact_p50",
            "n_items",
            (F.abs(F.col("__approx_p50") - F.col("exact_p50")) <= APPROX_P50_ABS_TOL).alias(
                "within_bound"
            ),
        )
    )


@register(
    "collection_summary",
    """
    SELECT collection, count(*) AS n_members,
           count(DISTINCT run) AS n_runs,
           count(DISTINCT customer) AS n_customers
    FROM (
        SELECT run AS collection, dataset_id, run, customer FROM fx_datasets
        UNION ALL
        SELECT collection, dataset_id, run, customer FROM fx_associations
    )
    GROUP BY collection
    """,
)
def q_collection_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4: per-collection summary (the reference's
    collections.get_info(include_summary), exporter.py:114-120) — RUN
    collections summarize their datasets, TAGGED/CALIBRATION their
    association members; one union + one grouped aggregate."""
    ds = fx.build_datasets(spark, sf_dir).select(
        F.col("run").alias("collection"), "dataset_id", "run", "customer"
    )
    assoc = fx.build_associations(spark, sf_dir).select(
        "collection", "dataset_id", "run", "customer"
    )
    return (
        ds.unionByName(assoc)
        .groupBy("collection")
        .agg(
            F.count("*").alias("n_members"),
            F.countDistinct("run").alias("n_runs"),
            F.countDistinct("customer").alias("n_customers"),
        )
    )


@register(
    "correlated_subquery",
    """
    SELECT o.o_orderkey, o.o_custkey,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
    FROM orders o
    WHERE o.o_totalprice > 2 * (
        SELECT avg(o2.o_totalprice) FROM orders o2
        WHERE o2.o_custkey = o.o_custkey
    )
    """,
)
def q_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery through the SQL surface — Catalyst
    decorrelates it into ONE aggregate + ONE join (SURVEY.md §4: subquery
    decorrelation is free in the new engine), never a per-row re-query
    (the reference's documented expand=True N+1 cliff, importer.py:84-97
    in /root/reference, is the same trap in ETL form)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey,
               CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o
        WHERE o.o_totalprice > 2 * (
            SELECT avg(o2.o_totalprice) FROM orders o2
            WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


@register(
    "exists_subquery",
    """
    SELECT c.c_custkey, c.c_mktsegment
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
    )
    AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
    )
    """,
)
def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS / NOT EXISTS through the SQL surface — planned as left-semi
    and left-anti hash joins (one pass each, no per-row probes)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
        )
        AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
        )
        """
    )
