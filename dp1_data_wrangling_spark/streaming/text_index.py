"""Streaming appends to the persisted BM25 text index
(plans/text_index.py).

A document corpus at ingest time grows continuously; rebuilding the
postings per batch is a full-corpus tokenize.  Incremental maintenance
is exact here — unlike IVF (whose frozen quantizer trades freshness for
recall), postings are a pure PER-DOCUMENT function of the text, so a
micro-batch's postings are byte-identical to the same documents' slice
of a full rebuild, and the corpus statistics (document count, total
token count) are associative integer sums maintained in the manifest
meta within the same exactly-once commit.  Queries against a
streamed-into index therefore equal the online ``bm25_topk`` on the
accumulated corpus EXACTLY (equivalence-tested), whatever the batch
boundaries.

Contract: each document arrives WHOLE in one micro-batch (the standard
document-stream shape); redelivered ids are dropped by an anti-join
against the already-indexed id set (an id-column-only scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..plans.catalog import Catalog
from ..plans.text_index import (
    META_BUILD_ID,
    META_N_DOCS,
    META_SUM_DL,
    POSTINGS_TABLE,
    doc_postings,
)
from .sinks import batch_meta_key, maybe_auto_compact


def stream_text_index_append(
    stream_docs: DataFrame,
    catalog_root: str,
    *,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    trigger_available_now: bool = True,
    stream_name: str | None = None,
    auto_compact_roots: int | None = None,
) -> StreamingQuery:
    """Start the incremental text-index maintenance stream.

    Requires a built index (``build_text_index``) — the build pins
    ``text:build_id``, and a rebuild under a live appender invalidates
    its checkpoint lineage (fail-fast, same discipline as the ANN
    appender).  Per batch: drop ids already indexed, tokenize the rest
    (row-local per document), append the postings hive-partitioned by
    term bucket with the batch-id watermark AND the incremented corpus
    statistics in the SAME commit — a crash between any two steps
    replays the whole batch idempotently."""
    meta_key = batch_meta_key("text_append", checkpoint_dir, stream_name)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        cat = Catalog(catalog_root)
        meta = cat.meta()
        if META_BUILD_ID not in meta:
            raise RuntimeError(
                "stream_text_index_append: no persisted text index — run "
                "build_text_index first (its build id pins the lineage)"
            )
        if meta.get(meta_key) is not None and batch_id <= meta[meta_key]:
            return  # replay after recovery — already committed
        # Generation pin (same discipline as the ANN appender): a rebuild
        # resets postings AND statistics, so committing a batch computed
        # against the old generation would corrupt both.  The first batch
        # records the build id; a later batch seeing a different one
        # fails fast.
        build_id = meta[META_BUILD_ID]
        pinned = meta.get(f"{meta_key}:build")
        if pinned is not None and pinned != build_id:
            raise RuntimeError(
                f"stream_text_index_append: index was rebuilt (build "
                f"{pinned} -> {build_id}) under this stream; restart from "
                "a fresh checkpoint against the new index"
            )
        spark = batch_df.sparkSession
        # Roots we read the indexed-id set (and stats) against: the commit
        # carries require_roots on them, so a rebuild or concurrent append
        # landing between this read and our commit aborts the batch
        # instead of double-counting statistics or re-appending ids.
        postings_roots = list(
            cat.manifest()["tables"].get(POSTINGS_TABLE, [])
        )
        indexed = (
            cat.read(spark, POSTINGS_TABLE).select(id_col).distinct()
        )
        # Within-batch duplicate deliveries (which neither the batch-id
        # watermark nor the cross-batch anti-join can see) would double
        # tf/dl and the committed statistics — dedup by id first (docs
        # arrive whole, so any same-id copies are identical).
        fresh = (
            batch_df.select(F.col(id_col), F.col(text_col))
            .dropDuplicates([id_col])
            .join(indexed, id_col, "left_anti")
        )
        postings = doc_postings(
            fresh, text_col=text_col, id_col=id_col
        ).localCheckpoint(eager=True)
        [stats] = (
            postings.groupBy()
            .agg(
                F.countDistinct(id_col).alias("n"),
                F.sum("tf").cast("bigint").alias("s"),
            )
            .collect()
        )
        txn = cat.begin()
        if int(stats["n"] or 0) > 0:
            # A fully-redelivered (or all-empty-text) batch yields no
            # postings: advance the watermark without staging an empty
            # partitioned root.
            txn.stage(
                POSTINGS_TABLE, postings, mode="append", partition_by=["tb"]
            )
        cat.commit(
            txn,
            meta={
                meta_key: batch_id,
                f"{meta_key}:build": build_id,
                META_N_DOCS: int(meta[META_N_DOCS]) + int(stats["n"] or 0),
                META_SUM_DL: int(meta[META_SUM_DL]) + int(stats["s"] or 0),
            },
            require_roots={POSTINGS_TABLE: postings_roots},
        )
        maybe_auto_compact(
            cat, spark, [POSTINGS_TABLE], auto_compact_roots,
            partition_by=["tb"],
        )

    writer = stream_docs.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
