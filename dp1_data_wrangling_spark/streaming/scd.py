"""Streaming twin of the SCD Type-2 history build (operators/scd.py).

CDC-style dimension maintenance: each micro-batch of attribute
observations folds into the catalog-backed history table with
exactly-once semantics and EXACT batch equivalence for any arrival
order.  The design is the standard bronze/silver split:

- the raw observation log (``<table>_obs``) is append-only — every
  observation is kept, including no-change duplicates, because a late
  observation can turn a historical no-change duplicate back into a
  change point (collapsing early would silently lose that version);
- the SCD2 history (``<table>``) is derived: only keys present in the
  batch are rebuilt, from their FULL raw observation set (log ∪ batch),
  with the same ``scd2_build`` collapse the batch path uses; untouched
  keys' rows are never read, re-windowed, or rewritten.

Both writes — the log append and the per-key history replace — stage in
ONE transaction, and the batch-id watermark rides the same atomic
commit, so crash-replayed micro-batches are detected and skipped and no
reader ever sees a log/history torn pair.  The history replace is an
anti-join on the touched keys + union of the rebuilt version rows (a
per-key partition replace — the correct primitive when late data can
change how many versions a key has), with an optimistic
``require_roots`` conflict check and retry, same as ``Catalog.merge``.

Equivalence contract (tested): any cut of the observation stream into
micro-batches, in ANY order, materializes exactly
``scd2_build(all observations)`` — both paths share the collapse code
and the rebuild always re-derives a touched key from its complete
observation set.

Scale: per batch = one append of the batch + one semi-join of the log
against the batch's (typically broadcast-small) touched-key set + one
window shuffle over those keys' observations only + the history
rewrite.  Steady-state cost tracks the delta and the touched keys'
observation volume, never the full dimension.

Bronze scan bound (r10): the observation log is published
hive-partitioned on a key-hash bucket (``__scd_kb = pmod(xxhash64(key),
n_buckets)``), and the per-batch rebuild filters the log read to the
batch's touched buckets BEFORE the semi-join — a partition filter the
parquet source prunes to matching directories, so the rebuild scans
``|touched buckets| / n_buckets`` of the log instead of all of it.
Without the bound the per-batch read grows with TOTAL history; with it,
a narrow batch (few keys) reads a fixed fraction regardless of log age.
Logs written by the pre-r10 layout (no ``__scd_kb`` column) fall back
to the full scan — correctness never depends on the bucket filter
(the semi-join alone is sufficient; the filter is a superset screen).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.scd import scd2_build
from ..plans.catalog import Catalog, CommitConflict
from .sinks import batch_meta_key

MERGE_RETRIES = 3


def stream_scd2(
    stream_events: DataFrame,
    catalog_root: str,
    *,
    checkpoint_dir: str,
    table: str = "scd2_history",
    key: str,
    tracked: list[str],
    ts_col: str,
    order_extra: list[str] | None = None,
    trigger_available_now: bool = True,
    stream_name: str | None = None,
    n_buckets: int = 16,
) -> StreamingQuery:
    """Start the SCD2 maintenance stream into ``catalog_root``/``table``
    (raw observations accumulate in ``<table>_obs``, hive-partitioned on
    ``pmod(xxhash64(key), n_buckets)`` so rebuilds prune to touched
    buckets)."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    meta_key = batch_meta_key(f"scd2:{table}", checkpoint_dir, stream_name)
    bucket_key = f"scd2:{table}:n_buckets"
    extra = list(order_extra or [])
    obs_table = f"{table}_obs"

    def process(batch_df: DataFrame, batch_id: int) -> None:
        cat = Catalog(catalog_root)
        meta = cat.meta()
        last = meta.get(meta_key)
        if last is not None and batch_id <= last:
            return  # replayed batch after recovery -> already committed
        # bucket count PINNED at first commit (r11 review fix, shared
        # with stream_funnel): a restart with a different n_buckets
        # would compute touched buckets under the new modulus while the
        # log's partition values carry the old one — the superset
        # screen would silently become a SUBSET screen and drop touched
        # keys' history from the rebuild.  The argument only seeds the
        # first commit; pre-pin logs (NULL __scd_kb roots) stay covered
        # by the NULL-safe filter below either way.
        nb = int(meta.get(bucket_key, n_buckets))
        spark = batch_df.sparkSession
        batch = batch_df.select(key, *tracked, ts_col, *extra)
        bucketed = batch.withColumn(
            "__scd_kb",
            F.pmod(F.xxhash64(F.col(key)), F.lit(nb)).cast("int"),
        )
        touched = batch.select(key).distinct()
        # the batch's touched buckets: driver-small by construction
        # (<= n_buckets values), collected ONCE per batch so every OCC
        # retry reuses the list
        touched_kbs = [
            r[0] for r in bucketed.select("__scd_kb").distinct().collect()
        ]
        last_exc: CommitConflict | None = None
        for _ in range(MERGE_RETRIES):
            snapshot = cat.manifest()
            obs_roots = list(snapshot["tables"].get(obs_table, []))
            hist_roots = list(snapshot["tables"].get(table, []))
            if obs_roots:
                log = cat._read_roots(spark, obs_roots)
                if "__scd_kb" in log.columns:
                    # partition filter FIRST: prunes the scan to the
                    # touched buckets' directories; the semi-join then
                    # narrows buckets to exact keys (the filter is a
                    # superset screen, never a correctness dependency).
                    # NULL-SAFE: pre-r10 roots in a mixed log read
                    # __scd_kb as NULL — isin alone would silently drop
                    # their observations from the rebuild (review fix);
                    # NULL rows always scan (the old full-scan posture).
                    log = log.filter(
                        F.col("__scd_kb").isNull()
                        | F.col("__scd_kb").isin(touched_kbs)
                    )
                prior = (
                    log.join(touched, key, "semi")
                    .select(key, *tracked, ts_col, *extra)
                )
                events = prior.unionByName(batch)
            else:
                events = batch
            rebuilt = scd2_build(
                events, key=key, tracked=tracked, ts_col=ts_col,
                order_extra=extra or None,
            )
            if hist_roots:
                current = cat._read_roots(spark, hist_roots)
                merged = current.join(touched, key, "left_anti").unionByName(
                    rebuilt.select(*current.columns)
                )
            else:
                merged = rebuilt
            txn = cat.begin()
            # evolve_schema: a pre-r10 log lacks __scd_kb — the first
            # post-upgrade append ADDS the bucket column (old roots read
            # it as NULL, handled above); without the opt-in the write
            # gate would hard-fail the stream on upgrade (review fix)
            txn.stage(obs_table, bucketed, mode="append",
                      partition_by=["__scd_kb"], evolve_schema=True)
            txn.stage(table, merged, mode="overwrite")
            try:
                # Watermark + log append + history replace: one atomic
                # commit — exactly-once hinges on their inseparability.
                cat.commit(
                    txn,
                    meta={meta_key: batch_id, bucket_key: nb},
                    require_roots={obs_table: obs_roots, table: hist_roots},
                )
                return
            except CommitConflict as exc:
                last_exc = exc
                continue
        raise CommitConflict(
            f"stream_scd2({table!r}): concurrent commits kept winning "
            f"after {MERGE_RETRIES} attempts"
        ) from last_exc

    writer = stream_events.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
