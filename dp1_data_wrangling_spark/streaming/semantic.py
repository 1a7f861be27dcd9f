"""Incremental streaming SEMANTIC dedup: an SRP index that grows with
the stream — the embedding-space twin of ``streaming/dedup_llm.py``.

A training-data ingest pipeline embeds documents as they arrive and must
answer "is this semantically a near-dup of anything seen so far?" without
re-clustering the corpus.  Because the batch operator's SRP signatures
(operators/semantic.py) are a pure function of the vector, they compose
across time exactly like MinHash band keys, and the above-threshold
cosine PAIR relation decomposes per batch as new×new ∪ new×old:

- per micro-batch: signatures for the new vectors; intra-batch pairs via
  the batch candidate generator; cross-batch pairs via a signature
  equi-join against the accumulated index, cosine-thresholded;
- ONE catalog transaction appends (id, srp_sig, embedding) to the index
  and the found edges to the pairs table, carrying the batch id — the
  same idempotent-foreachBatch exactly-once pattern as
  ``stream_minhash_dedup``; replays are no-ops.

Because the stream materializes the EDGE RELATION (not a survivor
choice), the result is order-independent: whatever the batch split, the
accumulated pairs equal the batch operator's pairs on the union, and
``read_semantic_survivors`` re-derives components over them —
byte-identical to batch ``semantic_dedup`` (no first-arrived-vs-min-id
divergence, no missed transitive chains across batches).

Equivalence condition, stated precisely: the hot-bucket cap is applied
per BATCH (intra) and per INDEX side (cross), not over the accumulated
bucket — batch mode drops a bucket whose TOTAL size exceeds the cap,
but a stream that saw it as sub-cap slices has already published those
slices' pairs and cannot retract them.  So streamed == batch holds
exactly while no bucket exceeds ``max_bucket_size`` (the normal regime;
the equivalence test runs there); once a bucket crosses the cap the
stream is the MORE PERMISSIVE side — it keeps pairs batch mode would
drop, never the reverse, and the excess depends on the batch split.
Size the cap for the accumulated corpus, not the batch.

Scale: per-batch work is batch-sized row-local signatures + one
signature equi-join against the index (vectors shuffle only for rows
sharing a bucket); index-side hot buckets are capped like the MinHash
index.  State lives in the catalog, not executor memory.  Long streams
accumulate one txn root per batch — run ``Catalog.compact`` periodically
(safe under the OCC conflict check) or pass ``auto_compact_roots`` to a
wrapping sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.components import dedup_survivors
from ..operators.semantic import (
    DEFAULT_SALT,
    MAX_BUCKET_SIZE,
    pairs_from_signatures,
    srp_signature,
)
from ..operators.similarity import cosine
from ..plans.catalog import Catalog
from .sinks import batch_meta_key, maybe_auto_compact

SEM_INDEX_TABLE = "semantic_index"
SEM_PAIRS_TABLE = "semantic_pairs"


def stream_semantic_dedup(
    stream_vectors: DataFrame,
    catalog_root: str,
    *,
    checkpoint_dir: str,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    salt: str = DEFAULT_SALT,
    max_bucket_size: int = MAX_BUCKET_SIZE,
    trigger_available_now: bool = True,
    stream_name: str | None = None,
    auto_compact_roots: int | None = None,
) -> StreamingQuery:
    """Start the incremental semantic-dedup stream.

    Appends to ``semantic_index`` (id, srp_sig, vector) and
    ``semantic_pairs`` (id_a, id_b, cos_sim).  Vectors already indexed
    (cross-batch redelivery) are dropped before processing.  The
    intra-batch path applies the batch hot-bucket cap; the cross path
    caps the INDEX side of the join the same way (a degenerate bucket
    otherwise grows without bound across batches)."""
    meta_key = batch_meta_key("semantic_dedup", checkpoint_dir, stream_name)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        cat = Catalog(catalog_root)
        last = cat.meta().get(meta_key)
        if last is not None and batch_id <= last:
            return  # replay after recovery — already committed
        spark = batch_df.sparkSession
        keys = srp_signature(
            batch_df.select(F.col(id_col), F.col(vec_col)),
            vec_col=vec_col,
            dim=dim,
            n_planes=n_planes,
            salt=salt,
        ).localCheckpoint(eager=True)
        have_index = cat.exists(SEM_INDEX_TABLE)
        if have_index:
            idx = cat.read(spark, SEM_INDEX_TABLE)
            keys = keys.join(
                idx.select(id_col).distinct(), id_col, "left_anti"
            ).localCheckpoint(eager=True)
        # `keys` already holds materialized signatures — feed them straight
        # to the bucket/cosine half instead of re-deriving the n_planes×dim
        # folds per row per batch (same shape as dedup_llm's band-key reuse)
        intra = pairs_from_signatures(
            keys,
            id_col=id_col,
            vec_col=vec_col,
            threshold=threshold,
            max_bucket_size=max_bucket_size,
        )
        if have_index:
            joinable = idx.select(
                F.col(id_col).alias("__old_id"),
                F.col(vec_col).alias("__old_vec"),
                "srp_sig",
            )
            ok = (
                idx.groupBy("srp_sig")
                .count()
                .filter(F.col("count") <= max_bucket_size)
                .drop("count")
            )
            joinable = joinable.join(ok, ["srp_sig"], "left_semi")
            cos = F.round(cosine(F.col(vec_col), F.col("__old_vec")), 6)
            cross = (
                keys.join(joinable, "srp_sig")
                .select(
                    F.least(F.col(id_col), F.col("__old_id")).alias("id_a"),
                    F.greatest(F.col(id_col), F.col("__old_id")).alias("id_b"),
                    cos.alias("cos_sim"),
                )
                .filter(
                    (F.col("id_a") != F.col("id_b"))
                    & (F.col("cos_sim") >= threshold)
                )
                .distinct()
            )
            pairs = intra.unionByName(cross).distinct()
        else:
            pairs = intra
        txn = cat.begin()
        txn.stage(SEM_INDEX_TABLE, keys, mode="append")
        txn.stage(SEM_PAIRS_TABLE, pairs, mode="append")
        cat.commit(txn, meta={meta_key: batch_id})
        maybe_auto_compact(
            cat, spark, [SEM_INDEX_TABLE, SEM_PAIRS_TABLE], auto_compact_roots
        )

    writer = stream_vectors.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_semantic_survivors(
    spark: SparkSession,
    catalog_root: str,
    *,
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, component, is_survivor) over everything the stream has
    indexed: connected components over the accumulated pair relation —
    byte-identical to batch ``semantic_dedup`` on the union of all
    batches while no bucket exceeds the cap (see the module docstring
    for the precise cap-crossing semantics)."""
    cat = Catalog(catalog_root)
    ids = cat.read(spark, SEM_INDEX_TABLE).select(id_col)
    pairs = cat.read(spark, SEM_PAIRS_TABLE).select("id_a", "id_b").distinct()
    return dedup_survivors(ids, pairs, id_col=id_col)
