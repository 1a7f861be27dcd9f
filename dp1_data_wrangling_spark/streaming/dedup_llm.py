"""Incremental streaming near-dup dedup: a MinHash/LSH index that grows
with the stream (the production shape for dedup at ingest time).

Batch near-dup dedup (operators/dedup.py) assumes the whole corpus is
present.  A training-data ingest pipeline instead sees documents arrive
continuously and must answer "is this new document a near-dup of anything
seen so far?" without recomputing the corpus.  The incremental form:

- per micro-batch, compute the new documents' LSH band keys (the same
  md5-derived construction as batch — signatures never change, so the
  index composes across time);
- candidate pairs = (new × new) bucket pairs within the batch PLUS
  (new × indexed) equi-join hits against the accumulated index;
- append the new band keys to the index and the found pairs to the pairs
  table in ONE catalog transaction carrying the batch id — the same
  idempotent-foreachBatch pattern as ``stream_into_catalog``, so replayed
  batches are no-ops and the index never double-counts.

State lives in the catalog (narrow (band, band_key, doc_id) rows — 16-byte
keys), not in executor memory, so the index scales with storage and the
join against it is a plain shuffle/broadcast join that AQE sizes.  Run of
the stream == batch ``minhash_candidate_pairs`` on the union of all
batches (property-tested), because the pair relation decomposes as
new×new ∪ new×old per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import (
    minhash_band_keys,
    minhash_signature,
    pairs_from_band_keys,
)
from ..plans.catalog import Catalog
from .sinks import batch_meta_key

INDEX_TABLE = "minhash_index"
PAIRS_TABLE = "minhash_pairs"

# Pre-round-5 catalogs wrote one fixed watermark key for every stream.  A
# restarted pre-upgrade stream must honor it (not replay its last batch),
# but a FRESH stream must not inherit it — foreachBatch ids restart at 0
# per checkpoint, so inheriting another stream's watermark silently skips
# all of the new stream's first batches.  Adoption is therefore explicit
# (``adopt_legacy_watermark=True``, exactly one designated stream) and
# one-shot: the adopting stream's first commit migrates the value to its
# scoped key and deletes the legacy key.
LEGACY_META_KEY = "last_batch_id:minhash_dedup"




def stream_minhash_dedup(
    stream_docs: DataFrame,
    catalog_root: str,
    *,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
    trigger_available_now: bool = True,
    stream_name: str | None = None,
    adopt_legacy_watermark: bool = False,
) -> StreamingQuery:
    """Start the incremental dedup stream.

    Appends to two catalog tables: ``minhash_index`` (doc_id, band,
    band_key) and ``minhash_pairs`` (id_a, id_b).  ``max_bucket_size``
    caps hot buckets on BOTH paths: intra-batch exactly like the batch
    operator, and on the accumulated-index side of the cross join (a
    boilerplate bucket otherwise grows without bound and every new doc
    hashing into it fans out to the whole bucket).  Documents already in
    the index (cross-batch redelivery) are dropped before processing.

    ``stream_name`` names this stream's replay watermark in the catalog
    meta; it defaults to a digest of ``checkpoint_dir`` (restarting from
    the same checkpoint resumes the same watermark).  Pass it explicitly
    if the checkpoint directory can move between runs.

    ``adopt_legacy_watermark``: set True on exactly ONE stream when
    restarting a pre-upgrade (fixed-watermark-key) catalog — that stream
    honors the legacy watermark and its first commit migrates it to the
    scoped key, deleting the legacy key.  Leave False (default) for every
    other stream: batch ids restart at 0 per checkpoint, so a fresh stream
    inheriting another stream's watermark would silently drop all of its
    first batches.
    """
    meta_key = batch_meta_key("minhash_dedup", checkpoint_dir, stream_name)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        cat = Catalog(catalog_root)
        meta = cat.meta()
        last = meta.get(meta_key)
        if last is None and adopt_legacy_watermark:
            # Upgrade path (opt-in, one designated stream): honor the
            # pre-per-stream fixed key; the first commit below migrates it
            # to the scoped key and deletes it.
            last = meta.get(LEGACY_META_KEY)
        if last is not None and batch_id <= last:
            return  # replay after recovery — already committed
        spark = batch_df.sparkSession
        keys = minhash_band_keys(
            minhash_signature(batch_df, text_col), id_col
        ).localCheckpoint(eager=True)  # used several times below; compute once
        if cat.exists(INDEX_TABLE):
            idx = cat.read(spark, INDEX_TABLE)
            # Cross-BATCH redelivery guard: a doc already indexed was fully
            # processed in an earlier batch — drop it entirely, or its band
            # rows would double in the index (inflating every future join)
            # and its pairs would re-emit.
            keys = keys.join(
                idx.select(id_col).distinct(), id_col, "left_anti"
            ).localCheckpoint(eager=True)
        intra = pairs_from_band_keys(
            keys, id_col=id_col, max_bucket_size=max_bucket_size
        )
        if cat.exists(INDEX_TABLE):
            joinable = idx.withColumnRenamed(id_col, "__old_id")
            if max_bucket_size is not None:
                # Hot-bucket cap on the INDEX side too: a boilerplate
                # bucket grows without bound across batches, and joining
                # new docs against it re-creates the quadratic blowup the
                # batch cap exists to stop.  One narrow agg per batch.
                ok = (
                    idx.groupBy("band", "band_key")
                    .count()
                    .filter(F.col("count") <= max_bucket_size)
                    .drop("count")
                )
                joinable = joinable.join(ok, ["band", "band_key"], "left_semi")
            cross = (
                keys.join(joinable, ["band", "band_key"])
                .select(
                    F.least(F.col(id_col), F.col("__old_id")).alias("id_a"),
                    F.greatest(F.col(id_col), F.col("__old_id")).alias("id_b"),
                )
                .filter(F.col("id_a") != F.col("id_b"))
                .distinct()
            )
            pairs = intra.unionByName(cross).distinct()
        else:
            pairs = intra
        txn = cat.begin()
        txn.stage(INDEX_TABLE, keys, mode="append")
        txn.stage(PAIRS_TABLE, pairs, mode="append")
        commit_meta: dict = {meta_key: batch_id}
        if adopt_legacy_watermark and LEGACY_META_KEY in meta:
            commit_meta[LEGACY_META_KEY] = None  # one-shot: consumed
        cat.commit(txn, meta=commit_meta)

    writer = stream_docs.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
