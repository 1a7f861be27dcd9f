"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All implementations live in the ``dp1_data_wrangling_spark`` package; this
module is a thin adapter over its query registry.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from dp1_data_wrangling_spark import fixtures as fx  # noqa: E402
from dp1_data_wrangling_spark.operators.chains import flatten_chains  # noqa: E402
from dp1_data_wrangling_spark.operators.find_first import find_first  # noqa: E402
from dp1_data_wrangling_spark.queries import REGISTRY  # noqa: E402
from dp1_data_wrangling_spark.session import tune_existing  # noqa: E402
from dp1_data_wrangling_spark.tables import load_table  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001 (SURVEY.md §7.2): find-first
    resolution over an ordered collection chain, dimension expansion via
    broadcast joins, then a per-region rollup — the reference's whole
    signature path (exporter.py:75-99) in one plan."""
    from pyspark.sql import functions as F

    tune_existing(spark)
    datasets = fx.build_datasets(spark, SMOKE_SF_DIR)
    chain = flatten_chains(
        spark,
        fx.build_collection_chains(spark),
        fx.build_collections(spark),
        "chain_root",
    )
    resolved = find_first(datasets, chain, ["customer", "nation"], collection_col="run")
    dim_nation = F.broadcast(fx.build_dim_nation(spark, SMOKE_SF_DIR))
    region = F.broadcast(load_table(spark, SMOKE_SF_DIR, "region"))
    return (
        resolved.join(dim_nation, "nation")
        .join(region, dim_nation.region == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count("*").alias("n_resolved"),
            F.countDistinct("customer").alias("n_customers"),
        )
        .orderBy("region_name")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    from dp1_data_wrangling_spark.queries import DRIVER_WINDOW
    from dp1_data_wrangling_spark.registry import assert_driver_safe_schema

    window = set(DRIVER_WINDOW)

    def wrap(name: str, fn: Callable[[SparkSession, str], DataFrame]):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_existing(spark)
            df = fn(spark, sf_dir)
            if name in window:
                # Fail loudly here, before the driver's canonicalizer sees a
                # complex-typed column it cannot hash (cost rounds 1 and 2).
                assert_driver_safe_schema(df.schema, name)
            return df

        return run

    return {name: wrap(name, spec.fn) for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle
    }
