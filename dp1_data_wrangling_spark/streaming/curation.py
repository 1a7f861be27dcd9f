"""Incremental streaming corpus curation: the streaming twin of
``plans/curation.py`` (filter -> dedup -> split -> atomic publish), for
corpora that arrive continuously at ingest time.

Per micro-batch:

- language filter + quality floor: the same row-local JVM expressions as
  batch (no state, no shuffle);
- incremental exact dedup: within-batch survivors via the single-shuffle
  digest aggregation (``exact_dedup`` with an ``n_tokens`` carry), then a
  digest anti-join against the accumulated survivors table drops docs
  whose content an earlier batch already published;
- split assignment: a pure hash-bucket function of doc_id — identical in
  batch and streaming by construction (no state needed);
- ONE catalog transaction appends the new survivors AND the batch's
  per-digest duplicate counts, carrying the batch id — the same
  idempotent-foreachBatch exactly-once pattern as ``stream_into_catalog``
  and ``stream_minhash_dedup``.

Duplicate counts are append-only deltas: each batch appends (digest, n)
rows; ``read_curated`` folds them with one sum so the published corpus
view carries the SAME ``n_copies`` the batch pipeline computes — survivor
rows themselves are never rewritten (no read-modify-write races with the
stream).

Semantics note (documented, tested): batch curation keeps the MIN doc_id
per duplicate group; the stream keeps the FIRST-ARRIVED survivor (an
already-published survivor cannot be retracted when a smaller doc_id
arrives later).  The two coincide exactly when arrival order is
doc_id-ascending — the batch-equivalence test drives that case; the
divergence case keeps a valid survivor, just a different representative.

Scale: per-batch work is batch-sized filters + one digest shuffle + one
anti-join against the survivors table (16-byte digests, AQE-sized).
State lives in the catalog, not executor memory.  Long streams accumulate
one txn root per batch — run ``Catalog.compact`` periodically (safe under
the round-6 optimistic conflict check even while the stream commits).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators import dedup as dd
from ..operators import text as tx
from ..operators.sampling import split_assign
from ..plans.catalog import Catalog
from .sinks import batch_meta_key
from ..plans.curation import DEFAULT_WEIGHTS

SURVIVORS_TABLE = "curation/survivors_stream"
COUNTS_TABLE = "curation/digest_counts"




def stream_curation(
    stream_docs: DataFrame,
    catalog_root: str,
    *,
    checkpoint_dir: str,
    keep_lang: str = "en",
    min_tokens: int = 10,
    salt: str = "curation_v1",
    weights: Mapping[str, int] | None = None,
    trigger_available_now: bool = True,
    stream_name: str | None = None,
) -> StreamingQuery:
    """Start the incremental curation stream.

    Appends to ``curation/survivors_stream`` (digest, doc_id, n_tokens,
    split) and ``curation/digest_counts`` (digest, n) in one exactly-once
    transaction per micro-batch.  Read the curated corpus back with
    ``read_curated`` — it matches the batch pipeline's output schema."""
    weights = dict(weights or DEFAULT_WEIGHTS)
    meta_key = batch_meta_key("curation", checkpoint_dir, stream_name)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        cat = Catalog(catalog_root)
        last = cat.meta().get(meta_key)
        if last is not None and batch_id <= last:
            return  # replay after recovery — already committed
        en = tx.lang_id(batch_df).filter(F.col("lang_guess") == keep_lang)
        good = tx.quality_stats(en).filter(F.col("n_tokens") >= min_tokens)
        # within-batch: single digest shuffle, n_tokens rides as a carry
        groups = dd.exact_dedup(good, carry=["n_tokens"]).localCheckpoint(
            eager=True  # used twice below; compute once
        )
        new = groups
        if cat.exists(SURVIVORS_TABLE):
            seen = cat.read(batch_df.sparkSession, SURVIVORS_TABLE).select("digest")
            # cross-batch: content already published keeps its original
            # survivor; only this batch's duplicate counts still count
            new = groups.join(seen, "digest", "left_anti")
        survivors = split_assign(
            new.select("digest", F.col("keep_id").alias("doc_id"), "n_tokens"),
            "doc_id",
            weights=weights,
            salt=salt,
        )
        counts = groups.select("digest", F.col("n_copies").alias("n"))
        txn = cat.begin()
        txn.stage(SURVIVORS_TABLE, survivors, mode="append")
        txn.stage(COUNTS_TABLE, counts, mode="append")
        cat.commit(txn, meta={meta_key: batch_id})

    writer = stream_docs.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_curated(spark: SparkSession, catalog_root: str) -> DataFrame:
    """The curated-corpus view: survivors with corpus-total duplicate
    counts, matching the batch pipeline's (doc_id, n_tokens, n_copies,
    split) output.  One sum over the append-only count deltas + one join
    on 16-byte digests — no survivor row is ever rewritten."""
    cat = Catalog(catalog_root)
    surv = cat.read(spark, SURVIVORS_TABLE)
    totals = (
        cat.read(spark, COUNTS_TABLE)
        .groupBy("digest")
        .agg(F.sum("n").alias("n_copies"))
    )
    return surv.join(totals, "digest").select(
        "doc_id", "n_tokens", "n_copies", "split"
    )
