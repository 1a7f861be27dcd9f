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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..plans.catalog import Catalog


def batch_meta_key(prefix: str, checkpoint_dir: str, stream_name: str | None) -> str:
    """Per-stream batch-id watermark key, shared by every foreachBatch
    catalog writer.  Spark's batch ids are scoped to ONE checkpoint, so
    the replay watermark must be too: a fixed catalog-level key would make
    two streams with different checkpoints share one watermark, silently
    skipping the lagging stream's batches as 'replays'.  ``stream_name``
    defaults to a digest of the checkpoint dir (restarting from the same
    checkpoint resumes the same watermark); pass it explicitly if the
    checkpoint directory can move between runs."""
    import hashlib

    name = stream_name or hashlib.md5(checkpoint_dir.encode()).hexdigest()[:12]
    return f"last_batch_id:{prefix}:{name}"


def maybe_auto_compact(
    cat: Catalog,
    spark: SparkSession,
    tables: list[str],
    threshold: int | None,
    **compact_kwargs,
) -> None:
    """The shared inline auto-compaction policy: once a table accumulates
    ``threshold`` commit roots, fold them back to one (OCC-safe — a lost
    race against a concurrent committer just defers to the next threshold
    crossing).  No-op when ``threshold`` is None."""
    if threshold is None:
        return
    from ..plans.catalog import CommitConflict

    for t in tables:
        if len(cat.manifest()["tables"].get(t, [])) >= threshold:
            try:
                cat.compact(spark=spark, table=t, **compact_kwargs)
            except CommitConflict:
                pass


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
        maybe_auto_compact(
            cat, batch_df.sparkSession, [table], auto_compact_roots,
            sort_by=sort_by,
        )

    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
