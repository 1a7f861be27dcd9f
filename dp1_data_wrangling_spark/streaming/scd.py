"""Streaming twin of the SCD Type-2 history build (operators/scd.py) —
a thin wrapper over the generic keyed-rebuild core
(streaming/rebuild.py), which holds the full bronze/silver design,
exactly-once and bucket-pinning discipline.

CDC-style dimension maintenance: each micro-batch of attribute
observations folds into the catalog-backed history table with EXACT
batch equivalence for any arrival order.  The raw observation log
keeps every observation, including no-change duplicates, because a
late observation can turn a historical no-change duplicate back into a
change point (collapsing early would silently lose that version); the
history is derived by rebuilding ONLY the batch's touched keys from
their full observation set with the same ``scd2_build`` collapse the
batch path uses — precisely the core's per-key-purity contract.

Equivalence (tested): any cut of the observation stream into
micro-batches, in ANY order, materializes exactly
``scd2_build(all observations)`` — including the late-arrival case
that revives a collapsed no-change observation.

Bronze scan bound (r10): the log publishes hive-partitioned on a
pinned key-hash bucket and the rebuild read prunes to the batch's
touched buckets (a parquet partition filter); logs written by the
pre-r10 layout (no ``__scd_kb`` column) or by a pre-pin writer
(unknown modulus) fall back to the full NULL-safe scan — correctness
never depends on the bucket screen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators.scd import scd2_build
from .rebuild import stream_keyed_rebuild


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
    (raw observations accumulate in ``<table>_obs``, hive-partitioned
    on a pinned key-hash bucket so rebuilds prune to touched
    buckets)."""
    extra = list(order_extra or [])

    def rb(events: DataFrame) -> DataFrame:
        return scd2_build(
            events,
            key=key,
            tracked=tracked,
            ts_col=ts_col,
            order_extra=extra or None,
        )

    return stream_keyed_rebuild(
        stream_events,
        catalog_root,
        checkpoint_dir=checkpoint_dir,
        table=table,
        key_col=key,
        event_cols=[key, *tracked, ts_col, *extra],
        rebuild=rb,
        # historical keys/layout from the r10 hand-rolled twin
        meta_prefix="scd2",
        bucket_col="__scd_kb",
        # legacy opt-in: a pre-r10 log lacks __scd_kb — the first
        # post-upgrade append ADDS the bucket column instead of
        # hard-failing the stream (old roots read it as NULL and are
        # never dropped by the NULL-safe screen)
        evolve_schema=True,
        trigger_available_now=trigger_available_now,
        stream_name=stream_name,
        n_buckets=n_buckets,
    )
