"""Streaming benchmark decontamination: the exactly-once streaming twin
of ``operators/decontam.py``, for corpora screened at ingest time.

The eval/benchmark set is STATIC relative to the stream (a benchmark
suite changes by release, not by micro-batch), so each micro-batch runs
the identical batch operator — row-local n-gram digests on the batch
side, broadcast eval digests, one combinable groupBy — and publishes the
clean docs through the transactional catalog with the same idempotent
foreachBatch watermark as ``stream_curation``: a replayed batch after
recovery commits nothing twice.

Stateless by construction (contamination is a pure per-doc decision
against a fixed reference), so batch and stream agree EXACTLY — the
equivalence test asserts set equality, not the first-arrival caveat the
dedup streams need.

Scale: per-batch cost is the batch operator's (broadcast probe, no
corpus-sized shuffle); the eval digest set must be broadcast-small
(benchmark-sized — thousands of docs), which is the same asymmetry the
batch operator assumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.decontam import contamination
from ..plans.catalog import Catalog
from .sinks import batch_meta_key

CLEAN_TABLE = "decontam/clean_docs"
FLAGGED_TABLE = "decontam/flagged_docs"




def stream_decontaminate(
    stream_docs: DataFrame,
    eval_docs: DataFrame,
    catalog_root: str,
    *,
    checkpoint_dir: str,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    trigger_available_now: bool = True,
    stream_name: str | None = None,
) -> StreamingQuery:
    """Screen a document stream against a static eval set.

    Per micro-batch, ONE catalog transaction appends the batch's clean
    docs to ``decontam/clean_docs`` and its contaminated doc report
    (id, n_grams, n_shared) to ``decontam/flagged_docs`` — both or
    neither, exactly once per batch id."""
    meta_key = batch_meta_key("decontam", checkpoint_dir, stream_name)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        cat = Catalog(catalog_root)
        last = cat.meta().get(meta_key)
        if last is not None and batch_id <= last:
            return  # replay after recovery — already committed
        flagged = contamination(
            batch_df, eval_docs, n=n, id_col=id_col, text_col=text_col
        ).localCheckpoint(eager=True)  # used twice below; compute once
        clean = batch_df.join(flagged.select(id_col), id_col, "left_anti")
        txn = cat.begin()
        txn.stage(CLEAN_TABLE, clean, mode="append")
        txn.stage(FLAGGED_TABLE, flagged, mode="append")
        cat.commit(txn, meta={meta_key: batch_id})

    writer = stream_docs.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_clean(spark: SparkSession, catalog_root: str) -> DataFrame:
    return Catalog(catalog_root).read(spark, CLEAN_TABLE)


def read_flagged(spark: SparkSession, catalog_root: str) -> DataFrame:
    return Catalog(catalog_root).read(spark, FLAGGED_TABLE)


SEM_CLEAN_TABLE = "decontam/semantic_clean"
SEM_FLAGGED_TABLE = "decontam/semantic_flagged"


def stream_semantic_decontaminate(
    stream_vectors: DataFrame,
    eval_vectors: DataFrame,
    catalog_root: str,
    *,
    checkpoint_dir: str,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    trigger_available_now: bool = True,
    stream_name: str | None = None,
) -> StreamingQuery:
    """Streaming twin of ``operators/semantic.semantic_decontaminate`` —
    embedding-space eval-overlap screening at ingest time, for the
    paraphrased/re-embedded leakage the n-gram stream above cannot see.

    Same structure as ``stream_decontaminate``: the eval embedding set is
    STATIC relative to the stream, contamination is a pure per-row
    decision against it (two-sided SRP blocking + one signature
    equi-join per batch — never batch × eval).  Per micro-batch ONE
    transaction appends clean rows to ``decontam/semantic_clean`` and
    the flagged report (id, n_eval_hits, max_sim) to
    ``decontam/semantic_flagged`` — both or neither, exactly once per
    batch id.

    Semantics note (documented, tested): the corpus-side hot-bucket cap
    counts bucket occupancy WITHIN each micro-batch, so a signature
    bucket that exceeds the cap over the whole corpus may stay under it
    per batch — the stream then screens (and possibly flags) rows the
    batch operator left unscreened.  Streaming flags are therefore a
    SUPERSET of batch flags in the hot-bucket case and identical
    otherwise (the equivalence test drives the identical case; the
    divergence direction is the safe one — more leakage caught, never
    less).

    Scale: per-batch cost is batch-sized signatures + the equi-join
    against benchmark-sized eval signatures."""
    from ..operators.semantic import semantic_decontaminate

    meta_key = batch_meta_key("sem_decontam", checkpoint_dir, stream_name)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        cat = Catalog(catalog_root)
        last = cat.meta().get(meta_key)
        if last is not None and batch_id <= last:
            return  # replay after recovery — already committed
        verdicts = semantic_decontaminate(
            batch_df,
            eval_vectors,
            id_col=id_col,
            vec_col=vec_col,
            dim=dim,
            threshold=threshold,
            n_planes=n_planes,
        ).localCheckpoint(eager=True)  # used twice below; compute once
        flagged = verdicts.filter(F.col("contaminated")).select(
            id_col, "n_eval_hits", "max_sim"
        )
        clean = batch_df.join(flagged.select(id_col), id_col, "left_anti")
        txn = cat.begin()
        txn.stage(SEM_CLEAN_TABLE, clean, mode="append")
        txn.stage(SEM_FLAGGED_TABLE, flagged, mode="append")
        cat.commit(txn, meta={meta_key: batch_id})

    writer = stream_vectors.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
