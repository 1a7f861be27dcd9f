"""Oracle-checked query catalog.

One entry per implemented operator family from SURVEY.md §2.  Each entry
pairs a Spark DataFrame implementation with the equivalent ANSI SQL for the
DuckDB oracle (prefixed with the fixture CTEs from ``fixtures.ORACLE_CTES``).

Determinism contract (the driver hash-compares values):

- Every computed column is aliased identically on both sides.
- Money/double aggregates go through **exact fixed-point**: doubles are
  scaled to integer cents/micros *per row* (deterministic), summed as
  BIGINT (associative — immune to partition/accumulation order), and only
  then converted back to double by a single division.  Spark's parallel
  partial aggregation and DuckDB's sequential sums then agree bitwise.
- Ranking windows always carry a unique tie-breaker column.
- Timestamps are µs-clean in the fixtures; session timezone is UTC.
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
    bad = overlapping_pairs(iv, ["key"], tie_breaker=F.col("tie"))
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


# Import sibling catalogs so their @register calls populate REGISTRY.
from . import queries_llm  # noqa: E402,F401
from . import queries_streaming  # noqa: E402,F401

# The driver's correctness run caps at the first 50 registry entries
# (``prioritize`` reorders the registry so this window leads).  Everything
# after position 50 is still verified by tests/test_oracle_parity.py —
# the identical DuckDB comparison over every registered oracle, each CI
# run.  Rotation policy: brand-new operators enter the window directly;
# entries with multi-round consecutive driver-green history rotate out
# (weakest evidence first), always leaving one representative per
# operator family in-window.  The full round-by-round rotation history
# lives in BASELINE.md ("Driver-window rotation history").
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
    ordering window runs over CONVERTED USERS (funnel output, not the
    event stream).  The oracle replays funnel chain, latencies and rank
    picks verbatim."""
    from .operators.funnel import funnel_match

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
        .select((F.col("t3_us") - F.col("t1_us")).alias("lat_us"))
    )
    w_o = Window.orderBy("lat_us")
    w_all = Window.partitionBy()
    ranked = lat.withColumn("orn", F.row_number().over(w_o)).withColumn(
        "n", F.count("*").over(w_all)
    )

    def pick(p: int):
        return F.max(
            F.when(
                F.col("orn") == F.expr(f"({p} * n + 99) div 100"),
                F.col("lat_us"),
            )
        ).alias(f"p{p}_us")

    return ranked.agg(
        F.max("n").cast("bigint").alias("n_converted"),
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


DRIVER_WINDOW: list[str] = [
    # -- core data plane --
    "events_spatial_pairs",       # r8: grid-blocked ST_DWithin spatial join
    "doc_link_communities",       # r10: label-propagation communities
    "export_plan",                # flagship end-to-end export pipeline (J1/P5/A3/A8)
    "user_scd2_history",          # r8: SCD Type-2 dimension history
    # -- event analytics (r8: funnel / retention / Markov) --
    "event_funnel",               # r8: first-touch 3-step conversion funnel
    "customer_rfm_segments",      # r10: RFM tiers over exact aggregates
    "event_conversion_paths",     # r10: full-journey path census
    "events_quantile_normalize",  # r10: exact rank-based QN calibration
    "events_hll_rolling",         # r10: rolling HLL via register re-max
    # -- LLM curation tier --
    "doc_semantic_decontam",      # r8: embedding-space eval-overlap screen
    "events_winsorize",           # r10: exact percentile clipping
    "multimodal_qoi",             # r8: REAL QOI decode (full op mix)
    "event_attribution_decay",    # r10: exponential time-decay attribution
    "multimodal_png",             # r8: REAL zlib PNG decode (full filter set)
    "orders_gini_concentration",  # r10: exact Gini concentration index
    "doc_bigram_score",           # r8: bigram LM proxy, stupid backoff
    "lineitem_weighted_quantiles",  # r10: exact weighted quantiles
    # -- dedup / similarity families --
    "doc_link_ppr",               # r10: personalized PageRank (exact integer)
    "events_value_bins",          # r10: equi-width histogram binning
    "events_holt_trend",          # r10: Holt smoothing, fixed-point recurrence
    "customer_entity_resolution", # r10: PassJoin->CC->golden record
    "pq_recall_bound",            # r8: product-quantization ADC recall bound
    "ivf_pq_recall_bound",        # r8: composed IVF-PQ (FAISS IVFPQ shape)
    "doc_gopher_rules",           # r8: Gopher-paper quality-rule screen
    "doc_link_pagerank",          # r8: exact-integer iterative PageRank
    "events_ks_drift",            # r10: binned two-sample KS drift screen
    "ivf_topk",                   # r8: full quantizer+assignment replay oracle
    "doc_cooccurrence",           # r9: apriori frequent co-occurring pairs
    "events_kmv_cube",            # r9: one-build KMV rollup hierarchy (merge law)
    "embedding_mmr_rerank",       # r9: MMR diversity re-rank (exact greedy)
    "events_hll_distinct",        # r9: HyperLogLog registers + raw estimator
    "events_theta_overlap",       # r9: theta set algebra over KMV sketches
    "part_abc_classes",           # r9: exact ABC/Pareto revenue tiers
    "doc_phrase_search",          # r9: positional-postings phrase search
    "event_funnel_latency",       # r9: funnel time-to-convert percentiles
    "events_value_quantiles",     # r9: mergeable uniform-sample quantile sketch
    "events_geofence",            # r9: exact point-in-polygon geofence join
    "order_brand_rules",          # r10: association rules w/ exact lift
    "doc_jaccard_join",           # r10: PPJoin prefix-filtered Jaccard join
    # -- sampling / packing / curation tail (r7 audit rotation) --
    "table_expectations",         # r9: Deequ-class declarative rule suite
    "events_hdr_quantiles",       # r9: HDR log-linear histogram quantiles
    "doc_bm25_topk",              # r9: BM25 inverted-index retrieval
    "bm25_index_topk",            # r9: persisted text index build->query
    "events_changepoints",        # r9: exact CUSUM change-point alarms
    "doc_link_kcore",             # r9: k-core peeling fixpoint (graph tier)
    "events_skyline",             # r9: 2-D Pareto skyline (one ordered pass)
    "event_attribution",          # r9: exact linear multi-touch attribution
    "events_interpolate",         # r9: exact linear-interpolation gap fill
    # -- graph / time series --
    "lineitem_corr_matrix",       # r10: one-pass Pearson correlation matrix
    "events_acf",                 # r10: exact autocorrelation, lags 1-4
]
if len(DRIVER_WINDOW) != 50:  # explicit raise: survives python -O
    raise ValueError(
        f"DRIVER_WINDOW must list exactly the 50 driver-checked queries, "
        f"got {len(DRIVER_WINDOW)}"
    )
prioritize(DRIVER_WINDOW)


def headline_queries() -> dict[str, QuerySpec]:
    return {n: s for n, s in REGISTRY.items() if s.headline}
