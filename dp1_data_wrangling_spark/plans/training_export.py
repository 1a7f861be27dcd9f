"""Training-run export: the last mile from curated corpus to the files a
trainer reads.

``plans/curation.py`` ends with a survivor table; a training job needs
more: the TRAIN split only, in a deterministic global order that does not
correlate with source/crawl order, greedily packed into fixed-token-
budget sequences, and laid out on disk so a 1000-GPU reader streams its
shard without shuffling.  This plan composes the already-verified
operators into that artifact:

1. curate (filter -> exact-dedup survivors -> split) — one digest shuffle;
2. deterministic global shuffle of the train split (two-pass distributed
   rank — no single-task window, ``operators/sampling.global_shuffle``);
3. shard by shuffled position (contiguous position ranges -> shards, so
   the packed order IS the shuffled order) and greedily pack each shard
   to the token budget (``operators/packing.pack_sequences`` — Arrow
   ``applyInPandas`` per shard, the designed slow-path tier);
4. ONE atomic catalog commit publishing the packed train table
   (partitioned by shard, sorted by (position) within shards) next to the
   full survivor table — a crash publishes neither.

Determinism end-to-end: every step is a pure function of (corpus, salt,
budget, n_shards) — no rand(), no timestamps — so re-running stages
byte-identical tables and a re-publish is a no-op version bump.  Each
stage's semantics are individually oracle-verified by its registered
query (``doc_curation_pipeline``, ``doc_global_shuffle``,
``doc_pack_sequences``); the composition is pinned by the determinism +
atomicity test, the same strategy as ``run_curation``.

Scale: shuffle count = curation's digest groupBy + global_shuffle's two
narrow passes + packing's one shard exchange; packing memory is bounded
by the per-shard row cap (fail-loud, not OOM); the shard-partitioned
layout means a trainer's reader prunes to its own shard directory.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.packing import DEFAULT_MAX_ROWS_PER_SHARD, pack_sequences
from ..operators.sampling import global_shuffle
from .catalog import Catalog
from .curation import DEFAULT_WEIGHTS, curate_documents

PACKED_TRAIN_TABLE = "curation/packed_train"


def shuffle_shard_pack(
    train: DataFrame,
    *,
    token_budget: int,
    n_shards: int,
    salt: str,
    max_rows_per_shard: int | None = DEFAULT_MAX_ROWS_PER_SHARD,
) -> DataFrame:
    """Steps 2-3 of the plan as a pure function of a (doc_id, n_tokens)
    train split: deterministic global shuffle -> contiguous-range shards
    -> greedy packing.  Shared verbatim by the batch plan and the
    streaming snapshot (``streaming/training_export.py``), so the two can
    only diverge in how the split was accumulated, never in the draw."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    shuffled = global_shuffle(train, "doc_id", salt=salt)
    # contiguous position ranges -> shards: ceil-sized blocks so the last
    # shard is the short one.  The row count joins back as a broadcast
    # one-row aggregate (an unpartitioned MAX window would funnel the
    # whole split through one task — the exact trap global_shuffle avoids).
    n_train = shuffled.agg(F.count(F.lit(1)).alias("__n"))
    block = F.ceil(F.col("__n") / F.lit(n_shards)).cast("long")
    sharded = (
        shuffled.crossJoin(F.broadcast(n_train))
        .withColumn("shard", F.floor((F.col("position") - 1) / block).cast("long"))
        .drop("__n")
    )
    return pack_sequences(
        sharded,
        budget=token_budget,
        order_col="position",
        max_rows_per_shard=max_rows_per_shard,
    ).select("doc_id", "n_tokens", "position", "shard", "seq_id")


def build_training_export(
    docs: DataFrame,
    *,
    token_budget: int,
    n_shards: int = 8,
    keep_lang: str = "en",
    min_tokens: int = 10,
    salt: str = "curation_v1",
    weights: Mapping[str, int] | None = None,
    max_rows_per_shard: int | None = DEFAULT_MAX_ROWS_PER_SHARD,
) -> DataFrame:
    """The packed-train plan: (doc_id, n_tokens, position, shard, seq_id).

    ``position`` is the doc's place in the deterministic global shuffle of
    the train split; shards are CONTIGUOUS position ranges (so within a
    shard, packing walks the shuffled order and sequence ids increase with
    position); ``seq_id`` is the training sequence the doc lands in under
    greedy ``token_budget`` packing."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    curated = curate_documents(
        docs,
        keep_lang=keep_lang,
        min_tokens=min_tokens,
        salt=salt,
        weights=weights or DEFAULT_WEIGHTS,
    )
    train = curated.filter(F.col("split") == "train").select("doc_id", "n_tokens")
    return shuffle_shard_pack(
        train,
        token_budget=token_budget,
        n_shards=n_shards,
        salt=salt,
        max_rows_per_shard=max_rows_per_shard,
    )


def run_training_export(
    spark: SparkSession,
    docs: DataFrame,
    catalog_root: str,
    *,
    token_budget: int,
    n_shards: int = 8,
    keep_lang: str = "en",
    min_tokens: int = 10,
    salt: str = "curation_v1",
    weights: Mapping[str, int] | None = None,
    max_rows_per_shard: int | None = DEFAULT_MAX_ROWS_PER_SHARD,
) -> Catalog:
    """Build and atomically publish the packed train table.

    Partitioned by shard (a reader prunes to its shard directory) and
    sorted by position within shards (the pack order on disk).  The
    commit meta records every parameter of the draw."""
    out = build_training_export(
        docs,
        token_budget=token_budget,
        n_shards=n_shards,
        keep_lang=keep_lang,
        min_tokens=min_tokens,
        salt=salt,
        weights=weights,
        max_rows_per_shard=max_rows_per_shard,
    )
    cat = Catalog(catalog_root)
    txn = cat.begin()
    txn.stage(
        PACKED_TRAIN_TABLE,
        out,
        mode="overwrite",
        partition_by=["shard"],
        sort_by=["position"],
    )
    cat.commit(
        txn,
        meta={
            "training_export": {
                "token_budget": token_budget,
                "n_shards": n_shards,
                "keep_lang": keep_lang,
                "min_tokens": min_tokens,
                "salt": salt,
                "weights": dict(weights or DEFAULT_WEIGHTS),
            }
        },
    )
    return cat
