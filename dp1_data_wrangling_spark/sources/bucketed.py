"""Bucketed table layout — shuffle-free co-located fact×fact joins.

The composite export plan's one unavoidable sort-merge join is
datasets ⋈ datastore_records on dataset_id (both fact-sized; see
tests/test_plan_quality.py).  At 100 TB that shuffle dominates the job.
The storage-layout fix is Spark bucketing: write BOTH tables bucketed (and
sorted) by the join key with the same bucket count — then the join reads
co-located buckets and the physical plan has ZERO exchanges (and with
sorted buckets, zero sorts).

This is the Spark analogue of the reference's "chunked by run" insert
locality (importer.py:79-97 in /root/reference): organize data on disk so
downstream consumers never reshuffle it.

Bucketing requires the session catalog (`saveAsTable`); plain
`write.parquet(path)` cannot record bucket metadata.  On a production
deployment the warehouse is the lakehouse catalog; tests point
``spark.sql.warehouse.dir`` at a temp dir.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    *,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (+optionally sorted) catalog table.

    ``n_buckets`` must match across tables that will join co-located; size
    it so one bucket of the LARGEST table fits an executor core's working
    memory (e.g. 100 TB / 32768 buckets ≈ 3 GB/bucket).  ``path`` makes it
    an external table at that location (tests use a temp dir; production
    uses the lakehouse layout)."""
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.

    With ``spark.sql.sources.bucketing.enabled`` (default true) and equal
    bucket counts, Catalyst plans a SortMergeJoin with no Exchange on
    either side — the join is a per-bucket local merge."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)
