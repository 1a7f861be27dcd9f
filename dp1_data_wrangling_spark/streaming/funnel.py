"""Streaming twin of the earliest-chain funnel (operators/funnel.py
funnel_match) — the last verified operator family without one (r10
verdict item 6).

Why a rebuild twin and not a min-fold: the funnel chain is SEQUENTIALLY
dependent — a LATE step-1 event with an earlier timestamp moves ``t1``,
which re-anchors the ``(t1, t1+within]`` window for step 2 and can
change every later step (or un-convert the user entirely).  Per-user
incremental state can therefore not be a bounded tuple of minima; the
exact design is the bronze/silver split ``stream_scd2`` proved:

- bronze ``<table>_obs``: the raw (user, step type, ts) log, append-
  only, filtered to the funnel's step types at ingest (narrow by
  construction), hive-partitioned on a key-hash bucket so rebuilds
  prune to touched buckets;
- silver ``<table>``: ``funnel_match`` rows, derived — only users
  present in the batch are rebuilt, from their FULL raw event set
  (log ∪ batch), with the SAME operator the batch path uses; untouched
  users' rows are never read or rewritten.

Both writes + the batch-id watermark ride ONE atomic commit —
exactly-once, no torn log/funnel pair, crash-replayed batches skipped.

Equivalence contract (tested): any cut of the event stream into
micro-batches, in ANY order, materializes exactly
``funnel_match(all events)`` — both paths share the chain code and a
touched user is always re-derived from their complete event set.

Scale: per batch = one filtered append + one bucket-pruned semi-join of
the log against the batch's touched users + the chain joins over those
users' events only + the per-user silver replace.  Steady-state cost
tracks the delta and the touched users' event volume, never the full
user base.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.funnel import funnel_match
from ..plans.catalog import Catalog, CommitConflict
from .sinks import batch_meta_key

MERGE_RETRIES = 3


def stream_funnel(
    stream_events: DataFrame,
    catalog_root: str,
    *,
    checkpoint_dir: str,
    table: str = "funnel",
    steps: list[str],
    within_us: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
    trigger_available_now: bool = True,
    stream_name: str | None = None,
    n_buckets: int = 16,
) -> StreamingQuery:
    """Start the funnel maintenance stream into ``catalog_root``/``table``
    (step-type events accumulate in ``<table>_obs``, hive-partitioned on
    ``pmod(xxhash64(user), n_buckets)`` so rebuilds prune to touched
    buckets)."""
    if len(steps) < 2:
        raise ValueError(f"funnel needs >= 2 steps, got {steps!r}")
    if within_us <= 0:
        raise ValueError(f"within_us must be positive, got {within_us}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    meta_key = batch_meta_key(f"funnel:{table}", checkpoint_dir, stream_name)
    bucket_key = f"funnel:{table}:n_buckets"
    obs_table = f"{table}_obs"

    def process(batch_df: DataFrame, batch_id: int) -> None:
        cat = Catalog(catalog_root)
        meta = cat.meta()
        last = meta.get(meta_key)
        if last is not None and batch_id <= last:
            return  # replayed batch after recovery -> already committed
        # the bucket count is PINNED in the catalog at first commit and
        # every later batch uses the pinned value — a restart with a
        # different n_buckets would otherwise compute touched buckets
        # under the new modulus while the log's partition values carry
        # the old one, silently dropping a touched user's prior events
        # from the rebuild (review fix); the argument only seeds the
        # first commit
        nb = int(meta.get(bucket_key, n_buckets))
        spark = batch_df.sparkSession
        # ingest-time screen: only the funnel's step types ever reach
        # the log — the bronze table is narrow by construction
        batch = batch_df.select(user_col, type_col, ts_col).filter(
            F.col(type_col).isin(steps)
        )
        bucketed = batch.withColumn(
            "__fn_kb",
            F.pmod(F.xxhash64(F.col(user_col)), F.lit(nb)).cast("int"),
        )
        touched = batch.select(user_col).distinct()
        touched_kbs = [
            r[0] for r in bucketed.select("__fn_kb").distinct().collect()
        ]
        last_exc: CommitConflict | None = None
        for _ in range(MERGE_RETRIES):
            snapshot = cat.manifest()
            obs_roots = list(snapshot["tables"].get(obs_table, []))
            fun_roots = list(snapshot["tables"].get(table, []))
            if obs_roots:
                log = cat._read_roots(spark, obs_roots)
                # partition filter FIRST (superset screen, never a
                # correctness dependency); NULL-safe for roots written
                # before a bucket-count change
                log = log.filter(
                    F.col("__fn_kb").isNull()
                    | F.col("__fn_kb").isin(touched_kbs)
                )
                prior = log.join(touched, user_col, "semi").select(
                    user_col, type_col, ts_col
                )
                events = prior.unionByName(batch)
            else:
                events = batch
            rebuilt = funnel_match(
                events,
                steps=steps,
                within_us=within_us,
                user_col=user_col,
                type_col=type_col,
                ts_col=ts_col,
            )
            if fun_roots:
                current = cat._read_roots(spark, fun_roots)
                merged = current.join(
                    touched, user_col, "left_anti"
                ).unionByName(rebuilt.select(*current.columns))
            else:
                merged = rebuilt
            txn = cat.begin()
            txn.stage(
                obs_table,
                bucketed,
                mode="append",
                partition_by=["__fn_kb"],
                evolve_schema=True,
            )
            txn.stage(table, merged, mode="overwrite")
            try:
                # watermark + log append + funnel replace: one atomic
                # commit — exactly-once hinges on their inseparability
                cat.commit(
                    txn,
                    meta={meta_key: batch_id, bucket_key: nb},
                    require_roots={obs_table: obs_roots, table: fun_roots},
                )
                return
            except CommitConflict as exc:
                last_exc = exc
                continue
        raise CommitConflict(
            f"stream_funnel({table!r}): concurrent commits kept winning "
            f"after {MERGE_RETRIES} attempts"
        ) from last_exc

    writer = stream_events.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
