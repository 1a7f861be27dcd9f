"""Streaming sinks: exactly-once ingest into the transactional catalog.

``stream_into_catalog`` bridges Structured Streaming to the engine's
manifest-swap catalog (plans/catalog.py): every micro-batch is staged and
committed as one catalog transaction carrying its ``batch_id``.  Replayed
micro-batches (failure recovery re-runs the last uncommitted batch) are
detected by comparing the incoming batch_id with the last committed one —
the standard idempotent-foreachBatch pattern, giving end-to-end
exactly-once on top of the source's offset tracking.

This is the streaming analogue of the import pipeline's atomic publish
(G3): a crash mid-batch publishes nothing; the retry commits once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..plans.catalog import Catalog


def stream_into_catalog(
    stream: DataFrame,
    catalog_root: str,
    table: str,
    *,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    sort_by: list[str] | None = None,
    auto_compact_roots: int | None = None,
) -> StreamingQuery:
    """Start a streaming write into ``catalog_root``/``table``.

    Each micro-batch appends one committed catalog transaction; batch ids
    are recorded in the manifest meta so replays are no-ops.

    ``auto_compact_roots`` bounds append-root growth on long-running
    streams: once the table accumulates that many commit roots, the batch
    triggers a ``Catalog.compact`` rewrite (OCC-safe against concurrent
    committers; a lost race just defers to the next threshold crossing).
    Compaction runs inline with the batch — convenient for availableNow
    jobs; a production continuous stream would run it out-of-band on the
    same policy to keep batch latency flat."""
    meta_key = f"last_batch_id:{table}"

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        cat = Catalog(catalog_root)
        last = cat.meta().get(meta_key)
        if last is not None and batch_id <= last:
            return  # replayed batch after recovery -> already committed
        txn = cat.begin()
        txn.stage(table, batch_df, mode="append", sort_by=sort_by)
        cat.commit(txn, meta={meta_key: batch_id})
        if auto_compact_roots is not None:
            roots = cat.manifest()["tables"].get(table, [])
            if len(roots) >= auto_compact_roots:
                from ..plans.catalog import CommitConflict

                try:
                    cat.compact(spark=batch_df.sparkSession, table=table, sort_by=sort_by)
                except CommitConflict:
                    pass  # a concurrent committer won; retry next crossing

    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
