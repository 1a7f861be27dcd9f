"""Incremental time-bucketed rollups — the continuous-aggregate pattern.

A 100 TB event stream is queried through its rollups (per-hour/day counts
and sums), not by rescanning history.  ``refresh_rollup`` maintains such a
rollup *incrementally*: each refresh aggregates ONLY the new batch of
events, combines those partials with the current rollup rows for the
touched buckets, and publishes through the catalog's transactional MERGE —
the TimescaleDB/Materialize continuous-aggregate shape on plain parquet.

Correctness rests on the aggregates being decomposable: ``count``/``sum``
partials combine by addition, so (old partial + new partial) == the
aggregate over all events ever seen.  Values are summed as per-row-scaled
BIGINT micros (the registry fixed-point contract) so the combine is
associative and bit-stable under any batch arrival order — the
incremental result is *exactly* the full recompute, hash-equal, which is
what the equivalence test and the DuckDB oracle verify.

Scale: a refresh touches (a) the new batch — one combinable groupBy, and
(b) the current rollup — bucket-count-sized, tiny next to the corpus; the
touched-key semi-join bounds the recombine to the buckets this batch hit.
Historical events are NEVER rescanned.  Late data needs no special path:
a late row's partial merges into its (closed) bucket like any other.

Concurrency: a refresh that loses a commit race recomputes its combine
from the fresh rollup state and retries (the catalog MERGE's own retry is
disabled — its cached ``updates`` would double-count).  Concurrent
refreshes of the SAME rollup table therefore serialize via optimistic
retry; refreshes of different tables never conflict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import Catalog, CommitConflict

ROLLUP_KEYS = ["bucket_ts", "event_type"]
MICROS = 1_000_000


def rollup_partial(
    events: DataFrame,
    *,
    bucket: str = "hour",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per-(time bucket, type) decomposable partial: row count + exact
    fixed-point value sum.  One combinable groupBy (map-side partial agg
    before the exchange)."""
    return events.groupBy(
        F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts"),
        F.col(type_col).alias("event_type"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.round(F.col(value_col) * MICROS).cast("bigint"))
        .cast("bigint")
        .alias("value_micros"),
    )


def refresh_rollup(
    spark: SparkSession,
    catalog: Catalog,
    new_events: DataFrame,
    *,
    table: str = "events_rollup",
    bucket: str = "hour",
    max_retries: int = 3,
    commit_meta: dict | None = None,
    **partial_kwargs,
) -> None:
    """Fold one batch of new events into the rollup table.

    Combine-with-current then MERGE: rows for touched buckets are
    replaced with (current + batch partial), untouched buckets are left
    alone by the MERGE anti-join.  Retries recompute the combine from the
    freshly-committed state, so a lost race never double-counts."""
    partial = rollup_partial(new_events, bucket=bucket, **partial_kwargs)
    last_exc: CommitConflict | None = None
    for _ in range(max_retries):
        if catalog.exists(table):
            current = catalog.read(spark, table)
            touched = partial.select(*ROLLUP_KEYS).distinct()
            overlap = current.join(touched, on=ROLLUP_KEYS, how="left_semi")
            updates = (
                overlap.unionByName(partial)
                .groupBy(*ROLLUP_KEYS)
                .agg(
                    F.sum("n_events").cast("bigint").alias("n_events"),
                    F.sum("value_micros").cast("bigint").alias("value_micros"),
                )
            )
        else:
            updates = partial
        try:
            catalog.merge(
                spark,
                table,
                updates,
                ROLLUP_KEYS,
                sort_by=["bucket_ts"],
                max_retries=1,
                meta=commit_meta,
            )
            return
        except CommitConflict as exc:
            last_exc = exc
            continue
    raise CommitConflict(
        f"refresh_rollup({table!r}): concurrent commits kept winning "
        f"after {max_retries} attempts"
    ) from last_exc
