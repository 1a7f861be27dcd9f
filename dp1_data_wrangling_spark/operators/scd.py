"""Slowly-changing-dimension (Type 2) history builder.

Warehouse dimension maintenance: every attribute change opens a new
version row with ``[valid_from, valid_to)`` bounds and closes the prior
one — the standard Kimball SCD2 shape that joins facts to the attribute
values *as of* the fact's timestamp.  The reference maintains dimension
records insert-only (importer.py:33-126); SCD2 is the engine extension
that adds attribute history on top of the same idempotent-import tier.

Expressed as pure window algebra — change detection via ``lag`` over a
per-key event order, closing bounds via ``lead`` — so the whole build is
ONE hash shuffle on the dimension key and replays exactly in a SQL
oracle.  Determinism: callers pass integer timestamp columns (µs/ns
BIGINT) and a tie-breaking ``order_extra`` column so the per-key order
is total; null-safe comparisons (``<=>`` / ``IS DISTINCT FROM``) make
NULL attribute transitions well-defined.

Scale posture (100 TB): the build shuffles (key, tracked, ts) tuples
once — never fact payloads; ``scd2_apply`` recomputes only keys present
in the incoming batch (semi-join on the change set) and unions untouched
history back, so steady-state cost tracks the delta, not the dimension.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_build(
    events: DataFrame,
    *,
    key: str,
    tracked: list[str],
    ts_col: str,
    order_extra: list[str] | None = None,
    version_col: str = "version",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Collapse a change-event stream into SCD2 version rows.

    ``events``: one row per observation of ``key``'s tracked attributes
    at ``ts_col`` (an integer or otherwise totally-ordered column; pass
    ``order_extra`` tie-breakers to make (ts, extra) unique per key —
    an ambiguous order would make lag/lead nondeterministic).

    Consecutive observations with identical tracked values collapse into
    one version (no-change events carry no information); each version
    gets ``valid_from`` = its first observation's ts, ``valid_to`` = the
    next version's ``valid_from`` (NULL while current), a 1-based
    ``version`` number, and ``is_current``.
    """
    if not tracked:
        raise ValueError("tracked must name at least one attribute column")
    order = [F.col(ts_col)] + [F.col(c) for c in (order_extra or [])]
    w = Window.partitionBy(key).orderBy(*order)
    changed = reduce(
        lambda a, b: a | b,
        [~F.col(c).eqNullSafe(F.lag(F.col(c)).over(w)) for c in tracked],
    )
    runs = events.withColumn("__chg", changed).filter(F.col("__chg"))
    # Same partitioning+ordering as `w`, so Catalyst reuses the one sort.
    w2 = Window.partitionBy(key).orderBy(*order)
    return (
        runs.select(
            key,
            *tracked,
            F.col(ts_col).alias(from_col),
            F.row_number().over(w2).cast("bigint").alias(version_col),
            F.lead(F.col(ts_col)).over(w2).alias(to_col),
        )
        .withColumn(current_col, F.col(to_col).isNull())
    )


def scd2_apply(
    history: DataFrame,
    new_events: DataFrame,
    *,
    key: str,
    tracked: list[str],
    ts_col: str,
    order_extra: list[str] | None = None,
    **names,
) -> DataFrame:
    """Incrementally fold a batch of change events into an SCD2 history.

    Only keys present in ``new_events`` are rebuilt: their existing
    versions are re-expressed as events (each version's ``valid_from``
    is its observation) and re-collapsed together with the batch, so a
    late or duplicate observation lands in the right place; every other
    key's rows pass through untouched.  At scale the semi-/anti-joins on
    the (small) touched-key set are broadcast and the rebuild shuffles
    only the delta's keys."""
    from_col = names.get("from_col", "valid_from")
    touched = new_events.select(key).distinct()
    untouched = history.join(touched, key, "anti")
    old_events = history.join(touched, key, "semi").select(
        key, *tracked, F.col(from_col).alias(ts_col)
    )
    extra = order_extra or []
    replay = old_events.select(
        key, *tracked, ts_col, *[F.lit(None).alias(c) for c in extra]
    ) if extra else old_events
    batch = new_events.select(key, *tracked, ts_col, *extra)
    rebuilt = scd2_build(
        replay.unionByName(batch, allowMissingColumns=False),
        key=key, tracked=tracked, ts_col=ts_col,
        order_extra=order_extra, **names,
    )
    return untouched.unionByName(rebuilt)
