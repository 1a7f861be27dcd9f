"""Corpus-curation pipeline: filter -> dedup -> split -> atomic publish.

The batch form of the training-data ingest path: language-filter and
quality-floor a document corpus, keep one survivor per exact-duplicate
group, assign deterministic train/val/test splits, and publish the result
to the transactional catalog in one commit (the same manifest-swap
atomicity as export/import — a crash publishes nothing, G3).

The whole transformation is ONE linear plan: row-local JVM filters before
a single 16-byte-digest groupBy shuffle, then a row-local hash-bucket
split — scan -> map -> one narrow shuffle -> map at any scale.  The
registered query ``doc_curation_pipeline`` runs the identical
``curate_documents`` plan against the DuckDB oracle; this module adds the
catalog write.  Deterministic end-to-end: re-running over the same corpus
stages byte-identical tables (no rand(), no timestamps), so a re-publish
is a no-op version bump, and the salt names the draw.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as dd
from ..operators import text as tx
from ..operators.sampling import split_assign
from .catalog import Catalog

SURVIVORS_TABLE = "curation/survivors"

DEFAULT_WEIGHTS: Mapping[str, int] = {"train": 90, "val": 5, "test": 5}


def curate_documents(
    docs: DataFrame,
    *,
    keep_lang: str = "en",
    min_tokens: int = 10,
    salt: str = "curation_v1",
    weights: Mapping[str, int] | None = None,
) -> DataFrame:
    """The curation plan: lang filter -> token floor -> exact-dedup
    survivors -> split.  Returns (doc_id, n_tokens, n_copies, split);
    ``n_copies`` is the size of each survivor's duplicate group.

    Single-shuffle at ANY corpus size: ``n_tokens`` rides through the
    digest aggregation as a min_by carry, so there is no survivors
    join-back — at fixture scale that join broadcast, but the groups side
    is one row per distinct digest (corpus-sized at 100 TB), where it
    would degrade to a doc_id shuffle.  The carry removes the join
    entirely; the only exchange left is the 16-byte-digest groupBy
    (pinned by test_plan_quality)."""
    en = tx.lang_id(docs).filter(F.col("lang_guess") == keep_lang)
    good = tx.quality_stats(en).filter(F.col("n_tokens") >= min_tokens)
    groups = dd.exact_dedup(good, carry=["n_tokens"])
    surv = groups.select(F.col("keep_id").alias("doc_id"), "n_tokens", "n_copies")
    return split_assign(
        surv, "doc_id", weights=weights or DEFAULT_WEIGHTS, salt=salt
    ).select("doc_id", "n_tokens", "n_copies", "split")


def run_curation(
    spark: SparkSession,
    docs: DataFrame,
    catalog_root: str,
    *,
    keep_lang: str = "en",
    min_tokens: int = 10,
    salt: str = "curation_v1",
    weights: Mapping[str, int] | None = None,
) -> Catalog:
    """Curate ``docs`` and atomically publish the survivor table.

    One catalog transaction = the whole publish; the commit meta records
    the curation parameters so a reader can tell which draw produced the
    table.  The write is partitioned by split (a training run reads only
    its split's files — partition pruning, no scan of val/test) and
    sorted by doc_id within partitions (compressibility + locality)."""
    out = curate_documents(
        docs,
        keep_lang=keep_lang,
        min_tokens=min_tokens,
        salt=salt,
        weights=weights or DEFAULT_WEIGHTS,
    )
    cat = Catalog(catalog_root)
    txn = cat.begin()
    # overwrite: the survivor table is DERIVED state — a re-publish replaces
    # it wholesale (append would accumulate txn dirs whose hive-partitioned
    # layouts a multi-path read rejects, and double the rows besides)
    txn.stage(
        SURVIVORS_TABLE,
        out,
        mode="overwrite",
        partition_by=["split"],
        sort_by=["doc_id"],
    )
    cat.commit(
        txn,
        meta={
            "curation": {
                "keep_lang": keep_lang,
                "min_tokens": min_tokens,
                "salt": salt,
                "weights": dict(weights or DEFAULT_WEIGHTS),
            }
        },
    )
    return cat
