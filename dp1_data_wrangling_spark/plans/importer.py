"""Import pipeline (reference import_dp1.py / importer.py → SURVEY.md §3.2).

The reference replays an export into a target Butler repo inside one
Postgres transaction: collections, toposorted dimension records with
``skip_existing``, datasets chunked by run, tagged/calibration associations
(``associate`` / ``certify``), and datastore records through a pluggable
path-mapping function.  The Spark re-expression:

- one catalog transaction = the whole import; the manifest swap is the
  commit point (importer.py:50 → G3);
- dimension load order = driver-side toposort over the schema registry
  (importer.py:59-71 → O6); virtual dimensions skipped (P8);
- ``skip_existing`` = left-anti join against the target table then append
  (insertDimensionData(skip_existing=True) → K7) — same for dataset ids;
- datasets are written hive-partitioned by run (the reference's
  sort+group-by-run chunked inserts, importer.py:79-97 → A5/K8);
- association dispatch on collection type: TAGGED appended, CALIBRATION
  certified first — the sort-based neighbor overlap check, one shuffle,
  including already-published intervals (importer.py:104-117 → A6/J7/K10);
- datastore records are semi-filtered to imported datasets and path-mapped
  with native column expressions; the three reference mappings (RSP, Rucio,
  identity) plus a pandas-UDF plug point for user mappings
  (importer.py:119-126, import_dp1.py:70-122 → P6, C3-C5, §2.11).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.paths import (
    conditional_prefix_rewrite,
    guard_no_absolute_uri,
    prefix_replace,
)
from ..operators.intervals import check_no_overlaps
from ..schema import Universe
from .catalog import Catalog

PathMapper = Callable[[Column], Column]

RSP_PREFIX = "file:///sdf/data/rubin/"
RSP_TARGET = "external/rubin/"
RUCIO_RULES = [
    ("file:///sdf/data/rubin/raw/", "raw/"),
    ("file:///sdf/data/rubin/refcat/", "raw/refcat/"),
]


def rsp_mapper(col: Column) -> Column:
    """Reference's RSP layout rewrite (import_dp1.py:83-95 → C3)."""
    return prefix_replace(col, RSP_PREFIX, RSP_TARGET)


def rucio_mapper(col: Column) -> Column:
    """Reference's Rucio layout rewrite (import_dp1.py:106-118 → C4)."""
    return conditional_prefix_rewrite(col, RUCIO_RULES, "dp1/")


def identity_mapper(col: Column) -> Column:
    """Pass-through mapping (import_dp1.py:121-122 → C5)."""
    return col


MAPPERS: dict[str, PathMapper] = {
    "rsp": rsp_mapper,
    "rucio": rucio_mapper,
    "identity": identity_mapper,
}


def _skip_existing(new: DataFrame, existing: DataFrame | None, keys: Sequence[str]) -> DataFrame:
    """K7: anti-join new rows against the published table on ``keys``."""
    if existing is None:
        return new
    return new.join(existing.select(*keys), list(keys), "left_anti")


def run_import(
    spark: SparkSession,
    export_root: str,
    target_root: str,
    *,
    dataset_types: Sequence[str] | None = None,
    path_mapper: PathMapper | str | None = None,
    guard_absolute_uris: bool = False,
) -> Catalog:
    """Replay an exported catalog into the target catalog, atomically.

    Idempotent by construction: re-running skips rows whose keys are
    already published (the reference's skip_existing / idempotent-insert
    posture), so a crash between runs never duplicates data.
    """
    src = Catalog(export_root)
    meta = src.meta()
    universe = Universe.from_manifest(meta["universe"])
    index = meta["index"]

    # Unknown-name validation (importer.py:36-39 → P7/E2).
    requested = list(dataset_types) if dataset_types is not None else index["dataset_types"]
    unknown = sorted(set(requested) - set(index["dataset_types"]))
    if unknown:
        raise ValueError(f"requested dataset types not in export: {unknown}")

    if isinstance(path_mapper, str):
        path_mapper = MAPPERS[path_mapper]

    tgt = Catalog(target_root)
    txn = tgt.begin()
    cached: list[DataFrame] = []  # unpersisted in the finally below

    try:
        # -- dimensions, dependency-ordered, skip_existing (O6/K7/P8) ----------
        for dim_name in universe.sorted_dimensions(index["dimensions"]):
            dim = universe.dimensions[dim_name]
            if not dim.has_own_table:
                continue
            table = f"dimensions/{dim_name}"
            rows = src.read(spark, table)
            existing = tgt.read(spark, table) if tgt.exists(table) else None
            rows = _skip_existing(rows, existing, dim.keys)
            txn.stage(table, rows, sort_by=list(dim.keys))

        # -- datasets per type, partitioned by run (A5/K8) ---------------------
        imported_ids: DataFrame | None = None
        for name in requested:
            table = f"datasets/{name}"
            rows = src.read(spark, table)
            existing = tgt.read(spark, table) if tgt.exists(table) else None
            # cache: the anti-joined rows execute once for the staged write and
            # again through imported_ids' semi-filters below
            rows = _skip_existing(rows, existing, ["dataset_id"]).cache()
            cached.append(rows)
            txn.stage(table, rows, partition_by=["run"],
                      sort_by=universe.data_id_columns(name))
            ids = rows.select("dataset_id")
            imported_ids = ids if imported_ids is None else imported_ids.unionByName(ids)
            if existing is not None:
                prior = existing.select("dataset_id")
                imported_ids = imported_ids.unionByName(prior)
        assert imported_ids is not None
        imported_ids = imported_ids.distinct()

        # -- associations: dispatch on collection type (A6/J7/K9/K10) ----------
        assoc = src.read(spark, "associations")
        collections = src.read(spark, "collections")
        typed = assoc.join(F.broadcast(collections),
                           assoc.collection == collections.name).drop("name")
        kinds = {r["type"] for r in typed.select("type").distinct().collect()}
        bad = kinds - {"TAGGED", "CALIBRATION"}
        if bad:  # importer.py:113-117
            raise ValueError(f"unexpected collection type(s) in associations: {sorted(bad)}")
        existing_assoc = (
            tgt.read(spark, "associations") if tgt.exists("associations") else None
        )
        # skip_existing for association rows: whole-row anti-join, null-safe
        # because TAGGED timespans are NULL (re-import must be a no-op).
        if existing_assoc is not None:
            cond = None
            for c in typed.drop("type").columns:
                eq = typed[c].eqNullSafe(existing_assoc[c])
                cond = eq if cond is None else cond & eq
            typed = typed.join(existing_assoc, cond, "left_anti")
        # cache: `typed` feeds the calib probe, the certify check, and the
        # staged write — without it the assoc join + whole-row anti-join
        # re-executes for each (export.py caches its analogues the same way)
        typed = typed.cache()
        cached.append(typed)
        new_assoc = typed.drop("type")
        # certify: validate calibration validity intervals against BOTH the new
        # and already-published rows for the same (collection, data ID).
        calib_new = typed.filter(F.col("type") == "CALIBRATION").drop("type")
        if calib_new.limit(1).count():
            calib_all = calib_new
            if existing_assoc is not None:
                calib_all = calib_all.unionByName(
                    existing_assoc.join(
                        F.broadcast(collections.filter(F.col("type") == "CALIBRATION")),
                        existing_assoc.collection == collections.name,
                    ).drop("name", "type")
                )
            data_id_cols = [
                c for c in calib_all.columns
                if c not in {"dataset_id", "run", "collection", "begin_nsec", "end_nsec"}
            ]
            check_no_overlaps(calib_all, ["collection", *data_id_cols])
        txn.stage("associations", new_assoc, sort_by=["collection"])

        # -- datastore records: semi-filter + path mapping (P6/C3-C5) ----------
        records = src.read(spark, "datastore_records").join(
            imported_ids, "dataset_id", "left_semi"
        )
        existing_rec = (
            tgt.read(spark, "datastore_records")
            if tgt.exists("datastore_records")
            else None
        )
        records = _skip_existing(records, existing_rec, ["datastore_name", "dataset_id"])
        if path_mapper is not None:
            records = records.withColumn("path", path_mapper(F.col("path")))
        if guard_absolute_uris:  # import_dp1.py:92-95
            guard_no_absolute_uri(records, "path")
        txn.stage("datastore_records", records, sort_by=["datastore_name", "path"])

        # -- collection catalog ------------------------------------------------
        for table in ("collections", "collection_chains"):
            rows = src.read(spark, table)
            existing = tgt.read(spark, table) if tgt.exists(table) else None
            keys = ["name"] if table == "collections" else ["parent", "child"]
            txn.stage(table, _skip_existing(rows, existing, keys))

        tgt.commit(txn, meta=meta)  # ONE atomic swap = the whole import (G3)
    finally:
        for df in cached:
            df.unpersist()
    return tgt


def resolve_calibrations(
    spark: SparkSession,
    catalog: Catalog | str,
    probes: DataFrame,
    *,
    collection: str,
    data_id_keys: Sequence[str],
    probe_time: str,
) -> DataFrame:
    """Resolve, for each probe row, the calibration dataset whose validity
    interval contains the probe's observation time — the Butler calibration
    lookup the reference performs when a pipeline consumes a certified
    collection (reference importer.py:110-112 certify semantics define the
    intervals this reads back; find-first is bypassed for calibrations).

    Runs ``routed_lookup``: bounded intervals (the certified bulk) take the
    day-bucketized equi-join, NULL-ended still-live calibrations take the
    conditional join — the plan that holds at fact scale, where probes are
    the 100 TB side and the calibration catalog is the thin side.

    Returns probe columns plus ``calib_dataset_id``/``calib_run``/
    ``begin_nsec``/``end_nsec`` (hex string id: driver-safe scalar)."""
    from ..operators.intervals import routed_lookup

    cat = Catalog(catalog) if isinstance(catalog, str) else catalog
    calib = (
        cat.read(spark, "associations")
        .filter(F.col("collection") == collection)
        .select("dataset_id", "run", *data_id_keys, "begin_nsec", "end_nsec")
    )
    hits = routed_lookup(
        probes, calib, list(data_id_keys), probe_time=probe_time
    )
    names = [
        *probes.columns,
        "calib_dataset_id_bin", "calib_run",
        *[f"iv_{k}" for k in data_id_keys],
        "begin_nsec", "end_nsec",
    ]
    hits = hits.toDF(*names)
    return hits.select(
        *probes.columns,
        F.hex("calib_dataset_id_bin").alias("calib_dataset_id"),
        "calib_run",
        "begin_nsec",
        "end_nsec",
    )
