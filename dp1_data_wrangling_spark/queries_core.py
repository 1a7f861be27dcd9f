"""Core data-plane queries (SURVEY §2.1-2.9): scans, joins, the
signature find-first/priority-dedup/chain semantics, intervals,
aggregation/dedup, sorts/set ops, path functions, general windows.

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



# ---------------------------------------------------------------------------
# Scans / filters / projections  (S1-S8, P3, P4, C8)
# ---------------------------------------------------------------------------


@register(
    "scan_filter_project",
    """
    SELECT event_id, user_id, value
    FROM events
    WHERE event_type = 'purchase' AND value > 50.0
    """,
)
def q_scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8/P3: column-pruned scan + pushed-down predicate.  The physical plan
    must show PushedFilters + a 3-column ReadSchema."""
    events = load_table(spark, sf_dir, "events")
    return events.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 50.0)
    ).select("event_id", "user_id", "value")


@register(
    "pattern_filter",
    """
    SELECT p_partkey, p_name, p_type, p_brand
    FROM part
    WHERE p_type LIKE 'PROMO%' OR p_name LIKE '%steel%' OR p_brand LIKE 'Brand#1%'
    """,
)
def q_pattern_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4/C8: suffix/glob-style name-pattern predicates (the reference's
    provenance dataset-type selection, export_dp1.py:86-93)."""
    part = load_table(spark, sf_dir, "part")
    return part.filter(
        F.col("p_type").startswith("PROMO")
        | F.col("p_name").like("%steel%")
        | F.col("p_brand").like("Brand#1%")
    ).select("p_partkey", "p_name", "p_type", "p_brand")


@register(
    "semi_join",
    """
    SELECT l_orderkey, l_partkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
    """,
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/P6: membership filtering stays a distributed semi-join — the
    reference collects ID sets into Python (exporter.py:73,89); at 100 TB
    that set does not fit a driver, a left_semi join always scales."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return li.join(o, li.l_orderkey == o.o_orderkey, "left_semi").select(
        "l_orderkey", "l_partkey", "l_linenumber", "l_quantity"
    )


@register(
    "anti_join",
    """
    SELECT c_custkey, c_name, c_nationkey
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: except-style difference as a left_anti join (importer.py:36-39
    unknown-name validation)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_nationkey"
    )


# ---------------------------------------------------------------------------
# Joins  (J1, J2, J3)
# ---------------------------------------------------------------------------


@register(
    "dimension_expansion",
    """
    SELECT hex(d.dataset_id) AS dataset_id_hex, d.run, d.customer, d.nation,
           dc.mktsegment, dn.name AS nation_name, r.r_name AS region_name
    FROM fx_datasets d
    JOIN fx_dim_customer dc ON d.customer = dc.customer AND d.nation = dc.nation
    JOIN fx_dim_nation dn ON d.nation = dn.nation
    JOIN region r ON dn.region = r.r_regionkey
    """,
    headline=True,
)
def q_dimension_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: data-ID expansion — the reference's with_dimension_records()
    (exporter.py:87,95-99) as a chain of broadcast hash joins.  Dimension
    tables are catalog-sized; broadcasting keeps this shuffle-free on the
    fact side at any scale."""
    d = fx.build_datasets(spark, sf_dir)
    dc = F.broadcast(fx.build_dim_customer(spark, sf_dir))
    dn = F.broadcast(fx.build_dim_nation(spark, sf_dir))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        d.join(dc, ["customer", "nation"])
        .join(dn, "nation")
        .join(r, dn.region == r.r_regionkey)
        .select(
            F.hex("dataset_id").alias("dataset_id_hex"),
            "run",
            "customer",
            "nation",
            "mktsegment",
            F.col("name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
        )
    )


@register(
    "membership_join",
    """
    SELECT hex(a.dataset_id) AS dataset_id_hex, d.run, a.collection,
           a.begin_nsec, a.end_nsec
    FROM fx_datasets d
    JOIN fx_associations a ON d.dataset_id = a.dataset_id
    """,
)
def q_membership_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: dataset x collection-membership join on a binary(16) key
    (exporter.py:125-131)."""
    d = fx.build_datasets(spark, sf_dir).select("dataset_id", "run")
    a = fx.build_associations(spark, sf_dir).select(
        "dataset_id", "collection", "begin_nsec", "end_nsec"
    )
    return d.join(a, "dataset_id").select(
        F.hex("dataset_id").alias("dataset_id_hex"),
        "run",
        "collection",
        "begin_nsec",
        "end_nsec",
    )


@register(
    "literal_coordinate_join",
    """
    SELECT dc.customer, dc.nation, dc.mktsegment
    FROM fx_dim_customer dc
    JOIN (SELECT * FROM (VALUES (1),(2),(3),(5),(8),(13),(21),(34),(55),(89))
          t(customer)) lit ON dc.customer = lit.customer
    """,
)
def q_literal_coordinate_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: join against literal data coordinates (export_dp1.py:110-115) —
    a broadcast of a driver-created literal DataFrame."""
    lit = local_df(
        spark, [(v,) for v in (1, 2, 3, 5, 8, 13, 21, 34, 55, 89)], "customer bigint"
    )
    dc = fx.build_dim_customer(spark, sf_dir)
    return dc.join(F.broadcast(lit), "customer").select(
        "customer", "nation", "mktsegment"
    )


# ---------------------------------------------------------------------------
# Signature semantics: find-first, priority dedup, chain flatten  (J4-J6)
# ---------------------------------------------------------------------------

_FIND_FIRST_ORACLE = """
    SELECT customer, nation, dataset_id_hex, run
    FROM (
        SELECT d.customer, d.nation, hex(d.dataset_id) AS dataset_id_hex, d.run,
               row_number() OVER (
                   PARTITION BY d.customer, d.nation
                   ORDER BY c.position, hex(d.dataset_id)) AS rn
        FROM fx_datasets d
        JOIN fx_collection_chains c
          ON d.run = c.child AND c.parent = 'chain_root'
    ) WHERE rn = 1
"""


@register("find_first", _FIND_FIRST_ORACLE, headline=True)
def q_find_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4/W1: the signature find-first resolution (exporter.py:75-87) —
    one shuffle on the data-ID columns, chain positions broadcast."""
    datasets = fx.build_datasets(spark, sf_dir)
    chain = flatten_chains(
        spark,
        fx.build_collection_chains(spark),
        fx.build_collections(spark),
        "chain_root",
    )
    resolved = find_first(
        datasets, chain, ["customer", "nation"], collection_col="run"
    )
    return resolved.select(
        "customer", "nation", F.hex("dataset_id").alias("dataset_id_hex"), "run"
    )


@register(
    "find_first_calibration_bypass",
    """
    SELECT d.customer, d.nation, hex(d.dataset_id) AS dataset_id_hex, d.run,
           c.position
    FROM fx_datasets d
    JOIN fx_collection_chains c
      ON d.run = c.child AND c.parent = 'chain_root'
    """,
)
def q_find_first_calib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 calibration bypass (exporter.py:81-84): calibration dataset types
    skip find-first and keep every row from the chain."""
    datasets = fx.build_datasets(spark, sf_dir)
    chain = flatten_chains(
        spark,
        fx.build_collection_chains(spark),
        fx.build_collections(spark),
        "chain_root",
    )
    kept = find_first(
        datasets,
        chain,
        ["customer", "nation"],
        collection_col="run",
        is_calibration=True,
    )
    pos = chain.withColumnRenamed("child", "run")
    return kept.join(F.broadcast(pos), "run").select(
        "customer",
        "nation",
        F.hex("dataset_id").alias("dataset_id_hex"),
        "run",
        "position",
    )


@register(
    "priority_dedup",
    """
    SELECT dataset_id_hex, datastore_name, path
    FROM (
        SELECT hex(dataset_id) AS dataset_id_hex, datastore_name, path,
               row_number() OVER (
                   PARTITION BY dataset_id
                   ORDER BY CASE datastore_name
                            WHEN 'ds_secondary' THEN 0 ELSE 1 END, path) AS rn
        FROM fx_datastore_records
    ) WHERE rn = 1
    """,
    headline=True,
)
def q_priority_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5/W2: first-datastore-wins dedup (datastore_parquet.py:66-76) with
    priority list [ds_secondary, ds_primary]."""
    records = fx.build_datastore_records(spark, sf_dir)
    prio = priority_map(spark, ["ds_secondary", "ds_primary"])
    deduped = priority_dedup(records, prio)
    return deduped.select(
        F.hex("dataset_id").alias("dataset_id_hex"), "datastore_name", "path"
    )


@register(
    "chain_flatten",
    """
    SELECT child, position
    FROM fx_collection_chains
    WHERE parent = 'chain_root'
    """,
)
def q_chain_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: ordered chain flattening (exporter.py:114-120).  The fixture
    chain is single-level; nested/cyclic cases are covered in unit tests."""
    return flatten_chains(
        spark,
        fx.build_collection_chains(spark),
        fx.build_collections(spark),
        "chain_root",
    )


@register(
    "chain_flatten_distributed",
    """
    SELECT child, position
    FROM fx_collection_chains
    WHERE parent = 'chain_root'
    """,
)
def q_chain_flatten_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 scale path: the iterative self-join fixpoint
    (operators/chains.py flatten_chains_distributed) — the escape hatch
    for catalogs too large to collect — run over the same fixture chain
    and driver-checked against the same oracle as chain_flatten.
    Multi-level depth ordering and cycle detection are covered by
    test_chain_flatten_distributed_nested_depth_order."""
    return flatten_chains_distributed(
        fx.build_collection_chains(spark), "chain_root"
    )


# ---------------------------------------------------------------------------
# Interval / timespan operators  (J7, C2)
# ---------------------------------------------------------------------------


@register(
    "interval_overlap",
    """
    SELECT customer, nation, dataset_id_hex, begin_nsec, end_nsec,
           prev.b AS prev_begin_nsec, prev.e AS prev_end_nsec
    FROM (
        SELECT customer, nation, hex(dataset_id) AS dataset_id_hex,
               begin_nsec, end_nsec,
               max({'e': end_nsec, 'b': begin_nsec}) OVER (
                   PARTITION BY customer, nation
                   ORDER BY begin_nsec, end_nsec, hex(dataset_id)
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS prev
        FROM fx_associations
        WHERE collection = 'calib_a'
    ) WHERE prev IS NOT NULL AND begin_nsec < prev.e
    """,
)
def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 certify validation (importer.py:110-112): sorted neighbor check —
    one window shuffle, no O(n^2) self-join."""
    calib = fx.build_associations(spark, sf_dir).filter(
        F.col("collection") == "calib_a"
    )
    bad = overlapping_pairs(
        calib,
        ["customer", "nation"],
        tie_breaker=F.hex(F.col("dataset_id")),
    )
    return bad.select(
        "customer",
        "nation",
        F.hex("dataset_id").alias("dataset_id_hex"),
        "begin_nsec",
        "end_nsec",
        "prev_begin_nsec",
        "prev_end_nsec",
    )


@register(
    "asof_lookup",
    """
    SELECT p.o_orderkey AS probe_orderkey, p.customer, p.nation,
           p.probe_nsec, hex(a.dataset_id) AS calib_dataset_id_hex,
           a.begin_nsec, a.end_nsec
    FROM (
        SELECT o_orderkey, customer, nation,
               epoch_ns(o_orderdate) + 43200000000000 AS probe_nsec
        FROM fx_ds_base WHERE o_orderkey % 2 = 0
    ) p
    JOIN fx_associations a
      ON a.collection = 'calib_a'
     AND p.customer = a.customer AND p.nation = a.nation
     AND p.probe_nsec >= a.begin_nsec AND p.probe_nsec < a.end_nsec
    """,
)
def q_asof_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 lookup side: interval containment join (equi-keys hash, range
    predicate as post-filter)."""
    base = fx.build_datasets_with_key(spark, sf_dir)
    probes = base.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").alias("probe_orderkey"),
        "customer",
        "nation",
        (fx.epoch_ns(F.col("o_orderdate")) + F.lit(43_200_000_000_000)).alias(
            "probe_nsec"
        ),
    )
    calib = fx.build_associations(spark, sf_dir).filter(
        F.col("collection") == "calib_a"
    )
    out = asof_lookup(
        probes, calib, ["customer", "nation"], probe_time="probe_nsec"
    )
    return out.select(
        "probe_orderkey",
        probes["customer"].alias("customer"),
        probes["nation"].alias("nation"),
        "probe_nsec",
        F.hex(calib["dataset_id"]).alias("calib_dataset_id_hex"),
        "begin_nsec",
        "end_nsec",
    )


@register(
    "asof_lookup_bucketized",
    """
    SELECT p.o_orderkey AS probe_orderkey, p.customer, p.nation,
           p.probe_nsec, hex(a.dataset_id) AS calib_dataset_id_hex,
           a.begin_nsec, a.end_nsec
    FROM (
        SELECT o_orderkey, customer, nation,
               epoch_ns(o_orderdate) + 43200000000000 AS probe_nsec
        FROM fx_ds_base WHERE o_orderkey % 2 = 0
    ) p
    JOIN fx_associations a
      ON a.collection = 'calib_a'
     AND p.customer = a.customer AND p.nation = a.nation
     AND p.probe_nsec >= a.begin_nsec AND p.probe_nsec < a.end_nsec
    """,
)
def q_asof_lookup_bucketized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 at fact scale: the bucketized interval join (equi-join on
    day-bucket + keys, containment as residual).  Same oracle as
    ``asof_lookup`` — the two plans must be answer-equivalent."""
    from .operators.intervals import bucketized_lookup

    base = fx.build_datasets_with_key(spark, sf_dir)
    probes = base.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").alias("probe_orderkey"),
        "customer",
        "nation",
        (fx.epoch_ns(F.col("o_orderdate")) + F.lit(43_200_000_000_000)).alias(
            "probe_nsec"
        ),
    )
    calib = fx.build_associations(spark, sf_dir).filter(
        F.col("collection") == "calib_a"
    )
    out = bucketized_lookup(
        probes, calib, ["customer", "nation"], probe_time="probe_nsec"
    )
    return out.select(
        "probe_orderkey",
        probes["customer"].alias("customer"),
        probes["nation"].alias("nation"),
        "probe_nsec",
        F.hex(calib["dataset_id"]).alias("calib_dataset_id_hex"),
        "begin_nsec",
        "end_nsec",
    )


@register(
    "asof_lookup_routed",
    """
    SELECT p.o_orderkey AS probe_orderkey, p.customer, p.nation,
           p.probe_nsec, hex(a.dataset_id) AS calib_dataset_id_hex,
           a.begin_nsec, a.end_nsec
    FROM (
        SELECT o_orderkey, customer, nation,
               epoch_ns(o_orderdate) + 43200000000000 AS probe_nsec
        FROM fx_ds_base WHERE o_orderkey % 2 = 0
    ) p
    JOIN fx_associations a
      ON a.collection = 'calib_a'
     AND p.customer = a.customer AND p.nation = a.nation
     AND p.probe_nsec >= a.begin_nsec AND p.probe_nsec < a.end_nsec
    """,
)
def q_asof_lookup_routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7, the production routing rule (reference importer.py:110-112
    semantics): bounded intervals ride the bucketized equi-join, unbounded
    (NULL-ended, still-live calibrations) take the conditional join; the
    union must equal plain ``asof_lookup`` on any input — same oracle as
    both siblings.  This is the plan ``plans.importer.resolve_calibrations``
    runs at 100 TB."""
    from .operators.intervals import routed_lookup

    base = fx.build_datasets_with_key(spark, sf_dir)
    probes = base.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").alias("probe_orderkey"),
        "customer",
        "nation",
        (fx.epoch_ns(F.col("o_orderdate")) + F.lit(43_200_000_000_000)).alias(
            "probe_nsec"
        ),
    )
    calib = fx.build_associations(spark, sf_dir).filter(
        F.col("collection") == "calib_a"
    )
    out = routed_lookup(
        probes, calib, ["customer", "nation"], probe_time="probe_nsec"
    )
    # routed_lookup emits probe-cols ++ interval-cols with the equi-keys on
    # both sides; rename positionally before projecting (post-union, the
    # pre-join frame references no longer disambiguate).
    out = out.toDF(
        "probe_orderkey", "customer", "nation", "probe_nsec",
        "dataset_id", "run", "iv_customer", "iv_nation", "collection",
        "begin_nsec", "end_nsec",
    )
    return out.select(
        "probe_orderkey",
        "customer",
        "nation",
        "probe_nsec",
        F.hex(F.col("dataset_id")).alias("calib_dataset_id_hex"),
        "begin_nsec",
        "end_nsec",
    )


@register(
    "certify_probe",
    """
    SELECT key, count(*) AS n_offenders,
           CAST(min(tie) AS BIGINT) AS first_tie
    FROM (
        SELECT key, b, e, tie,
               max(e) OVER (
                   PARTITION BY key ORDER BY b, e, tie
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS prev_e
        FROM (
            SELECT l_partkey % 1024 AS key,
                   CAST((l_orderkey % 100000) * 1000000 AS BIGINT) AS b,
                   CAST((l_orderkey % 100000) * 1000000
                        + CAST(l_quantity AS BIGINT) * 500000 AS BIGINT) AS e,
                   l_orderkey * 8 + l_linenumber AS tie
            FROM lineitem
        )
    ) WHERE prev_e IS NOT NULL AND b < prev_e
    GROUP BY key
    """,
    headline=True,
)
def q_certify_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certify at fact scale (VERDICT r1 item 7): the sort-neighbor overlap
    check over an entire fact table's worth of synthetic validity
    intervals (600k rows at sf0.1 — ~40x the calibration fixture), counted
    per key so the result stays small.  The point under measurement: the
    check stays ONE window shuffle regardless of interval count — the
    shape ``run_import`` re-runs over new+existing calibration rows on
    every import."""
    li = load_table(spark, sf_dir, "lineitem")
    iv = li.select(
        (F.col("l_partkey") % 1024).alias("key"),
        ((F.col("l_orderkey") % 100000) * 1_000_000).cast("long").alias("begin_nsec"),
        (
            (F.col("l_orderkey") % 100000) * 1_000_000
            + F.col("l_quantity").cast("long") * 500_000
        ).cast("long").alias("end_nsec"),
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("tie"),
    )
    # prev_bounds=False: this probe only counts offenders — the bare
    # running max(end) yields the identical offender set without the
    # per-row struct allocation/compare (r13)
    bad = overlapping_pairs(
        iv, ["key"], tie_breaker=F.col("tie"), prev_bounds=False
    )
    return bad.groupBy("key").agg(
        F.count("*").alias("n_offenders"),
        F.min("tie").alias("first_tie"),
    )


# ---------------------------------------------------------------------------
# Aggregation / dedup / grouping  (A1, A3, A5, A7)
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    """
    SELECT customer, nation, min(hex(dataset_id)) AS min_dataset_id_hex,
           count(*) AS n_dups
    FROM fx_datasets
    GROUP BY customer, nation
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: key-subset dedup with a canonical survivor (min id) — the
    deterministic form of dropDuplicates (dimension_record_parquet.py:49-53)."""
    d = fx.build_datasets(spark, sf_dir)
    return d.groupBy("customer", "nation").agg(
        F.min(F.hex("dataset_id")).alias("min_dataset_id_hex"),
        F.count("*").alias("n_dups"),
    )


@register(
    "group_agg_run",
    """
    SELECT run, count(*) AS n_datasets,
           count(DISTINCT customer) AS n_customers
    FROM fx_datasets
    GROUP BY run
    """,
)
def q_group_agg_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: per-run grouping (importer.py:79-83) + distinct aggregate (A3
    as a DataFrame, never a collected set)."""
    d = fx.build_datasets(spark, sf_dir)
    return d.groupBy("run").agg(
        F.count("*").alias("n_datasets"),
        F.countDistinct("customer").alias("n_customers"),
    )


@register(
    "nested_regroup",
    """
    SELECT datastore_name, hex(dataset_id) AS dataset_id_hex,
           array_to_string(list_sort(list(path)), '|') AS paths_joined,
           count(*) AS n_files
    FROM fx_datastore_records
    GROUP BY datastore_name, dataset_id
    """,
)
def q_nested_regroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: flat rows -> nested import_records structure
    (datastore_mapping.py:39-64) via collect_list(sorted).

    The driver-facing result serializes the array as a '|'-joined scalar
    (the driver's canonicalizer pandas-sorts result columns, and numpy
    arrays are unhashable there); the genuine ``array<string>`` form is
    produced by :func:`nested_regroup_df` and covered by
    ``test_nested_regroup_array_form``."""
    return nested_regroup_df(spark, sf_dir).select(
        "datastore_name",
        "dataset_id_hex",
        F.array_join("paths", "|").alias("paths_joined"),
        "n_files",
    )


def nested_regroup_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real nested form: (datastore_name, dataset_id_hex,
    paths array<string> sorted, n_files)."""
    r = fx.build_datastore_records(spark, sf_dir)
    return r.groupBy("datastore_name", "dataset_id").agg(
        F.sort_array(F.collect_list("path")).alias("paths"),
        F.count("*").alias("n_files"),
    ).select(
        "datastore_name",
        F.hex("dataset_id").alias("dataset_id_hex"),
        "paths",
        "n_files",
    )


@register(
    "nested_unnest",
    """
    WITH nested AS (
        SELECT datastore_name, dataset_id,
               list(path ORDER BY path) AS paths
        FROM fx_datastore_records
        GROUP BY datastore_name, dataset_id
    )
    SELECT datastore_name, hex(dataset_id) AS dataset_id_hex,
           unnest(paths) AS path
    FROM nested
    """,
)
def q_nested_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 inverse: nested array column exploded back to flat rows
    (collect_list ∘ explode round-trip — the array-function surface the
    import's datastore regroup consumes)."""
    r = fx.build_datastore_records(spark, sf_dir)
    nested = r.groupBy("datastore_name", "dataset_id").agg(
        F.sort_array(F.collect_list("path")).alias("paths")
    )
    return nested.select(
        "datastore_name",
        F.hex("dataset_id").alias("dataset_id_hex"),
        F.explode("paths").alias("path"),
    )


@register(
    "histogram_agg",
    """
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS price_bucket,
           count(*) AS n_orders,
           CAST(min(round(o_totalprice * 100)) AS BIGINT) AS min_cents,
           CAST(max(round(o_totalprice * 100)) AS BIGINT) AS max_cents
    FROM orders
    GROUP BY 1
    """,
)
def q_histogram_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram bucketing (floor-division bucket ids — exact
    integer boundaries, engine-identical; the building block for numeric
    profiling at scale, one map-side-combinable shuffle)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(
        F.floor(F.col("o_totalprice") / 50000).cast("long").alias("price_bucket")
    ).agg(
        F.count("*").alias("n_orders"),
        F.min(F.round(F.col("o_totalprice") * 100)).cast("long").alias("min_cents"),
        F.max(F.round(F.col("o_totalprice") * 100)).cast("long").alias("max_cents"),
    )


# ---------------------------------------------------------------------------
# Sorts / top-k / set ops  (O*, E1, E2)
# ---------------------------------------------------------------------------


@register(
    "sort_topk",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 15
    """,
)
def q_sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2/top-k: orderBy().limit() compiles to TakeOrderedAndProject — no
    global sort materialization; unique tie-breaker keeps the cut stable."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(15)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "set_union",
    """
    SELECT p_brand FROM part WHERE p_size > 40
    UNION
    SELECT p_brand FROM part WHERE p_type LIKE '%PROMO%'
    """,
)
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1: union with set semantics (export_dp1.py:71-74)."""
    p = load_table(spark, sf_dir, "part")
    a = p.filter(F.col("p_size") > 40).select("p_brand")
    b = p.filter(F.col("p_type").like("%PROMO%")).select("p_brand")
    return a.union(b).distinct()


@register(
    "set_except",
    """
    SELECT p_brand FROM part WHERE p_size > 25
    EXCEPT
    SELECT p_brand FROM part WHERE p_type LIKE '%PROMO%'
    """,
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: set difference (importer.py:37-39)."""
    p = load_table(spark, sf_dir, "part")
    a = p.filter(F.col("p_size") > 25).select("p_brand")
    b = p.filter(F.col("p_type").like("%PROMO%")).select("p_brand")
    return a.subtract(b)  # EXCEPT (set semantics), not exceptAll


# ---------------------------------------------------------------------------
# Scalar / path functions  (C3-C7)
# ---------------------------------------------------------------------------


@register(
    "path_rewrite",
    """
    SELECT datastore_name, dataset_id_hex, path,
           CASE WHEN p2 LIKE 'file://%' THEN substr(p2, 8)
                ELSE '/datastore/' || p2 END AS abs_path
    FROM (
        SELECT datastore_name, hex(dataset_id) AS dataset_id_hex, path,
               CASE WHEN p1 LIKE 'file:///sdf/data/rubin/%'
                    THEN 'external/rubin/' || substr(p1, 24)
                    ELSE p1 END AS p2
        FROM (
            SELECT datastore_name, dataset_id, path,
                   split_part(path, '#', 1) AS p1
            FROM fx_datastore_records
        )
    )
    """,
)
def q_path_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3+C6+C7: strip '#fragment' -> RSP prefix rewrite -> absolutize —
    the whole mapping chain as JVM column expressions, zero Python UDFs
    (import_dp1.py:83-95; generate_dp1_file_tree.py:58-72)."""
    r = fx.build_datastore_records(spark, sf_dir)
    p1 = strip_fragment(F.col("path"))
    p2 = prefix_replace(p1, "file:///sdf/data/rubin/", "external/rubin/")
    return r.select(
        "datastore_name",
        F.hex("dataset_id").alias("dataset_id_hex"),
        "path",
        absolutize(p2, "/datastore").alias("abs_path"),
    )


@register(
    "conditional_rewrite",
    """
    SELECT path,
           CASE WHEN path LIKE 'run_0/%' THEN 'raw/' || substr(path, 7)
                WHEN path LIKE 'run_1/%' THEN 'refcat/' || substr(path, 7)
                ELSE 'dp1/' || path END AS mapped_path
    FROM fx_datastore_records
    WHERE datastore_name = 'ds_primary'
    """,
)
def q_conditional_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4: first-match-wins conditional prefix rules (Rucio layout,
    import_dp1.py:106-118)."""
    from .functions.paths import conditional_prefix_rewrite

    r = fx.build_datastore_records(spark, sf_dir).filter(
        F.col("datastore_name") == "ds_primary"
    )
    mapped = conditional_prefix_rewrite(
        F.col("path"),
        [("run_0/", "raw/"), ("run_1/", "refcat/")],
        "dp1/",
    )
    return r.select("path", mapped.alias("mapped_path"))


# ---------------------------------------------------------------------------
# General windows  (W: §2.6)
# ---------------------------------------------------------------------------


@register(
    "window_rank",
    """
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER w AS rn,
           rank() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS status_rank,
           lag(o_orderkey) OVER w AS prev_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6: ranking + analytic window surface (row_number/rank/lag)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ws = Window.partitionBy("o_custkey").orderBy("o_orderstatus")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(ws).cast("long").alias("status_rank"),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
    )


@register(
    "window_analytics",
    """
    SELECT o_custkey, o_orderkey,
           dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority)
               AS priority_dense_rank,
           lead(o_orderkey) OVER w AS next_orderkey,
           first_value(o_orderkey) OVER w AS first_orderkey,
           last_value(o_orderkey) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 analytic surface: dense_rank / lead / first / last.  last uses
    an explicit unbounded frame — the default ordered-window frame stops at
    CURRENT ROW, where last_value degenerates to the row itself."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wp = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.dense_rank().over(wp).cast("long").alias("priority_dense_rank"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.first("o_orderkey").over(w).alias("first_orderkey"),
        F.last("o_orderkey").over(w_full).alias("last_orderkey"),
    )


@register(
    "rolling_sum",
    """
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS rolling_cents
    FROM orders
    """,
)
def q_rolling_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6: frame-spec window (rowsBetween) over exact cents."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(cents(F.col("o_totalprice"))).over(w).alias("rolling_cents"),
    )


# ---------------------------------------------------------------------------
