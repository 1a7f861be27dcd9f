"""Source layer (SURVEY.md §2.1).

The engine's scans are deliberately thin — Spark's Parquet source already
does schema enforcement, column pruning, predicate pushdown, and
row-group skipping (S5-S8 map to ``spark.read.schema(...).parquet`` —
see ``tables.load_table`` for the validated fixture reader and
``plans.catalog.Catalog.read`` for manifest-resolved multi-directory
reads).  JSON/YAML sidecar documents (S9/S10) are driver-side manifest
reads handled by the catalog, never DataFrames.

This package adds the live-registry posture: S1's Butler registry is a
Postgres database, and ``jdbc.registry_reader`` shows the partitioned-JDBC
shape a production deployment would use to scan it in parallel.
"""

from .jdbc import registry_reader  # noqa: F401
