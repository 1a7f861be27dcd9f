"""Streaming twin of the training-run export (round 7): continuous
curation ingest + an atomic snapshot cut.

A trainer's global shuffle position and greedy packing are functions of
the ENTIRE train split — a new document moves every position after it in
the md5 order.  Chasing that per micro-batch would rewrite the packed
table continuously for no reader's benefit, so the streaming design
splits the plan at the natural seam, the same way production pipelines
do (continuous ingest, periodic frozen snapshot):

- **ingest is incremental**: ``stream_curation`` accumulates curated
  train-split survivors exactly-once per micro-batch (filter -> digest
  dedup -> split assign — all already batch-equivalent);
- **the snapshot is a cut**: ``finalize_training_export`` reads the
  accumulated survivors and runs the SAME ``shuffle_shard_pack`` pure
  function the batch plan uses (``plans/training_export.py``), publishing
  ``curation/packed_train`` in one atomic commit whose meta records the
  draw parameters and the survivor-table roots it snapshotted.

Equivalence contract (tested): with doc_id-ascending arrival, streaming
ingest + finalize is BYTE-IDENTICAL to ``run_training_export`` over the
union corpus — the two paths share the shuffle/shard/pack code, so they
can only diverge in survivor accumulation, which the stream-curation
equivalence test already pins.

Scale: each finalize costs one batch-shaped pipeline over the CURRENT
corpus (global_shuffle's two narrow passes + one shard exchange) — run it
at snapshot cadence (per training run), not per micro-batch; ingest cost
stays per-batch-sized forever.  The commit's ``require_roots`` pin makes
the snapshot consistent: if the stream lands another batch between the
read and the publish, the commit conflicts and retries instead of
publishing a torn view.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..operators.packing import DEFAULT_MAX_ROWS_PER_SHARD
from ..plans.catalog import Catalog, CommitConflict
from ..plans.training_export import PACKED_TRAIN_TABLE, shuffle_shard_pack
from .curation import SURVIVORS_TABLE, read_curated

FINALIZE_RETRIES = 3


def finalize_training_export(
    spark: SparkSession,
    catalog_root: str,
    *,
    token_budget: int,
    n_shards: int = 8,
    salt: str = "curation_v1",
    max_rows_per_shard: int | None = DEFAULT_MAX_ROWS_PER_SHARD,
) -> Catalog:
    """Cut a packed-train snapshot from the accumulated streaming
    curation state and publish it atomically.

    Retries on a commit conflict (a curation micro-batch landing mid-cut)
    by re-reading the grown survivor set — the published snapshot is
    always a consistent point-in-time view, never a torn one."""
    cat = Catalog(catalog_root)
    last: CommitConflict | None = None
    for _ in range(FINALIZE_RETRIES):
        tables = cat.manifest()["tables"]
        if SURVIVORS_TABLE not in tables:
            raise RuntimeError(
                f"finalize_training_export: no accumulated curation state "
                f"at {catalog_root!r} ({SURVIVORS_TABLE!r} missing) — run "
                "stream_curation (at least one committed micro-batch) "
                "before cutting a snapshot"
            )
        surv_roots = list(tables[SURVIVORS_TABLE])
        curated = read_curated(spark, catalog_root)
        train = curated.filter(F.col("split") == "train").select(
            "doc_id", "n_tokens"
        )
        out = shuffle_shard_pack(
            train,
            token_budget=token_budget,
            n_shards=n_shards,
            salt=salt,
            max_rows_per_shard=max_rows_per_shard,
        )
        txn = cat.begin()
        txn.stage(
            PACKED_TRAIN_TABLE,
            out,
            mode="overwrite",
            partition_by=["shard"],
            sort_by=["position"],
        )
        try:
            cat.commit(
                txn,
                meta={
                    "training_export": {
                        "token_budget": token_budget,
                        "n_shards": n_shards,
                        "salt": salt,
                        "source": "stream_snapshot",
                        # the exact survivor roots this snapshot was cut
                        # from — the audit trail the module contract
                        # promises (replays the cut, explains the diff
                        # between two snapshots)
                        "survivor_roots": surv_roots,
                    }
                },
                require_roots={SURVIVORS_TABLE: surv_roots},
            )
            return cat
        except CommitConflict as exc:
            last = exc  # survivors grew under the cut — re-read and retry
    raise RuntimeError(
        f"finalize_training_export: could not cut a consistent snapshot in "
        f"{FINALIZE_RETRIES} attempts (curation batches kept landing); "
        "pause the stream or raise FINALIZE_RETRIES"
    ) from last
