"""Streaming continuous aggregates: the incremental rollup's ingest twin.

``stream_rollup`` folds each micro-batch of events into the catalog-backed
hourly/daily rollup (``plans/rollup.refresh_rollup``) with exactly-once
semantics: the per-stream batch-id watermark rides the SAME atomic MERGE
commit as the rolled-up rows, so a replayed micro-batch (crash recovery
re-runs the last uncommitted batch) is detected and skipped — the
idempotent-foreachBatch pattern shared with ``stream_into_catalog`` /
``stream_curation``.

Why foreachBatch instead of a native streaming aggregation: a watermarked
``groupBy(window(...))`` holds open-window state in executors, emits only
on watermark close, and cannot revise a bucket once emitted — while a
training-metrics / ops rollup wants every bucket queryable immediately
and *late data folded into already-published buckets*.  The
refresh-rollup combine handles late rows by construction (a late partial
merges into its closed bucket like any other), and state lives in the
catalog, not executor memory.

Scale: per batch = one combinable groupBy over the batch + a rollup-sized
(bucket-count, not event-count) recombine + one MERGE rewrite.  Unlike
the append-only streams there is no root-list growth to compact — MERGE
publishes a single root per refresh.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..plans.catalog import Catalog
from .sinks import batch_meta_key
from ..plans.rollup import refresh_rollup




def stream_rollup(
    stream_events: DataFrame,
    catalog_root: str,
    *,
    checkpoint_dir: str,
    table: str = "events_rollup",
    bucket: str = "hour",
    trigger_available_now: bool = True,
    stream_name: str | None = None,
    **partial_kwargs,
) -> StreamingQuery:
    """Start the incremental rollup stream into ``catalog_root``/``table``.

    The materialized rollup equals the batch aggregate over every event
    delivered so far — bit-exactly, because the combine is a fixed-point
    BIGINT sum (see plans/rollup.py) — regardless of how events were cut
    into micro-batches or how late they arrived."""
    meta_key = batch_meta_key(f"rollup:{table}", checkpoint_dir, stream_name)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        cat = Catalog(catalog_root)
        last = cat.meta().get(meta_key)
        if last is not None and batch_id <= last:
            return  # replayed batch after recovery -> already committed
        refresh_rollup(
            batch_df.sparkSession,
            cat,
            batch_df,
            table=table,
            bucket=bucket,
            commit_meta={meta_key: batch_id},
            **partial_kwargs,
        )

    writer = stream_events.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
