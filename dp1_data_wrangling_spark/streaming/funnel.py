"""Streaming twin of the earliest-chain funnel (operators/funnel.py
funnel_match) — a thin wrapper over the generic keyed-rebuild core
(streaming/rebuild.py), which holds the full bronze/silver design,
exactly-once and bucket-pinning discipline.

Why a rebuild twin and not a min-fold: the funnel chain is SEQUENTIALLY
dependent — a LATE step-1 event with an earlier timestamp moves ``t1``,
which re-anchors the ``(t1, t1+within]`` window for step 2 and can
change every later step (or un-convert the user entirely).  Per-user
incremental state can therefore not be a bounded tuple of minima; the
exact design is re-deriving a touched user from their complete event
set, which is precisely :func:`~.rebuild.stream_keyed_rebuild`'s
contract (``funnel_match`` is a pure per-user function of the user's
step-type events).

Equivalence (tested): any cut of the event stream into micro-batches,
in ANY order, materializes exactly ``funnel_match(all events)`` —
including the late-step-1 case that UN-converts an already-converted
user.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.funnel import funnel_match
from .rebuild import stream_keyed_rebuild


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
    a pinned user-hash bucket so rebuilds prune to touched buckets)."""
    if len(steps) < 2:
        raise ValueError(f"funnel needs >= 2 steps, got {steps!r}")
    if within_us <= 0:
        raise ValueError(f"within_us must be positive, got {within_us}")

    def rb(events: DataFrame) -> DataFrame:
        return funnel_match(
            events,
            steps=steps,
            within_us=within_us,
            user_col=user_col,
            type_col=type_col,
            ts_col=ts_col,
        )

    return stream_keyed_rebuild(
        stream_events,
        catalog_root,
        checkpoint_dir=checkpoint_dir,
        table=table,
        key_col=user_col,
        event_cols=[user_col, type_col, ts_col],
        rebuild=rb,
        # ingest-time screen: only the funnel's step types ever reach
        # the log — the bronze table is narrow by construction
        pre_filter=F.col(type_col).isin(steps),
        # historical keys/layout from the hand-rolled r11 twin
        meta_prefix="funnel",
        bucket_col="__fn_kb",
        # legacy opt-in: pre-core funnel logs carry __fn_kb already, but
        # a pre-bucket log from an external writer upgrades by column
        # addition instead of hard-failing (the scd2 rationale)
        evolve_schema=True,
        trigger_available_now=trigger_available_now,
        stream_name=stream_name,
        n_buckets=n_buckets,
    )
