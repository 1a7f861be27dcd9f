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
    seen_col: str = "last_seen",
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
    ``version`` number, ``is_current``, and ``last_seen`` = the ts of
    the version's LAST observation.  ``(valid_from, last_seen)`` is a
    lossless summary of each run's boundary observations — it is what
    lets :func:`scd2_apply` fold append-only batches exactly without
    the raw log.
    """
    if not tracked:
        raise ValueError("tracked must name at least one attribute column")
    order = [F.col(ts_col)] + [F.col(c) for c in (order_extra or [])]
    w = Window.partitionBy(key).orderBy(*order)
    # The first observation per key is ALWAYS a change: lag() returns
    # NULL there, which eqNullSafe cannot distinguish from a previous
    # row whose tracked value was genuinely NULL — without the explicit
    # first-row mark, a key whose first observation has every tracked
    # column NULL would vanish from history entirely (ADVICE r8, high).
    first_row = F.lag(F.lit(1)).over(w).isNull()
    changed = first_row | reduce(
        lambda a, b: a | b,
        [~F.col(c).eqNullSafe(F.lag(F.col(c)).over(w)) for c in tracked],
    )
    # a row ends its run iff the next row starts a new one (or is absent);
    # forward-first over the SAME partitioning+ordering pulls that run-end
    # ts back onto the run's first row — still the one hash shuffle
    nxt_chg = F.lead(F.col("__chg")).over(w)
    wf = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    runs = (
        events.withColumn("__chg", changed)
        .withColumn(
            "__run_end",
            F.when(nxt_chg.isNull() | nxt_chg, F.col(ts_col)),
        )
        .withColumn("__seen", F.first("__run_end", ignorenulls=True).over(wf))
        .filter(F.col("__chg"))
    )
    # Same partitioning+ordering as `w`, so Catalyst reuses the one sort.
    w2 = Window.partitionBy(key).orderBy(*order)
    return (
        runs.select(
            key,
            *tracked,
            F.col(ts_col).alias(from_col),
            F.row_number().over(w2).cast("bigint").alias(version_col),
            F.lead(F.col(ts_col)).over(w2).alias(to_col),
            F.col("__seen").alias(seen_col),
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
    observations: DataFrame | None = None,
    **names,
) -> DataFrame:
    """Incrementally fold a batch of change events into an SCD2 history.

    Only keys present in ``new_events`` are rebuilt; every other key's
    rows pass through untouched.  Two modes:

    - With ``observations`` (the raw event log, same columns as the
      batch): touched keys are rebuilt from their FULL raw observations
      plus the batch — exactly ``scd2_build`` over everything, so ANY
      late, duplicate, or tie-breaking observation lands in the right
      place.  This is the always-correct mode; the streaming twin
      (streaming/scd.py) keeps its bronze log for precisely this reason.
    - Without it, touched histories are replayed from their version
      rows' ``(valid_from, last_seen)`` boundary observations — a
      lossless summary of each run's endpoints, but NOT of interior
      observations or tie-break extras.  This replay is exact only when
      the batch is strictly APPEND-ONLY per key (every event's ts
      strictly after the key's ``last_seen``); that precondition, and
      the no-ts-tie-across-version-boundary invariant the NULL-extra
      replay needs, are ENFORCED executor-side (``raise_error``): a
      violating event aborts with instructions to pass ``observations``
      instead of silently rewriting history from lossy state.

    At scale the semi-/anti-joins on the (small) touched-key set are
    broadcast and the rebuild shuffles only the delta's keys."""
    from_col = names.get("from_col", "valid_from")
    touched = new_events.select(key).distinct()
    untouched = history.join(touched, key, "anti")
    extra = order_extra or []
    batch = new_events.select(key, *tracked, ts_col, *extra)
    if observations is not None:
        replay = observations.select(key, *tracked, ts_col, *extra).join(
            touched, key, "semi"
        )
    else:
        seen_col = names.get("seen_col", "last_seen")
        version_col = names.get("version_col", "version")
        ts_type = dict(new_events.dtypes)[ts_col]
        hist_t = history.join(touched, key, "semi")
        # append-only guard: any batch event at or before the key's last
        # OBSERVATION (not just the last version start — no-change
        # observations collapse into last_seen) would need the raw log
        # to place correctly -> fail fast, never guess
        last_seen = hist_t.groupBy(key).agg(F.max(seen_col).alias("__ls"))
        batch = (
            batch.join(last_seen, key, "left")
            .withColumn(
                ts_col,
                F.when(
                    F.col("__ls").isNull() | (F.col(ts_col) > F.col("__ls")),
                    F.col(ts_col),
                ).otherwise(
                    F.raise_error(
                        F.concat(
                            F.lit(
                                "scd2_apply: batch event at ts <= the "
                                "key's last observed ts; the collapsed "
                                "history cannot place it — pass "
                                "observations= (the raw event log) for "
                                "an exact rebuild (key "
                            ),
                            F.col(key).cast("string"),
                            F.lit(")"),
                        )
                    ).cast(ts_type)
                ),
            )
            .drop("__ls")
        )
        # two-point replay: each version contributes its first and last
        # observation, reproducing run boundaries (and thus last_seen)
        # exactly.  Within a key the replayed ts values are strictly
        # ordered UNLESS an original ts tie straddled a version boundary
        # (last_seen == next valid_from, originally resolved by extras
        # the versions don't retain) — that ambiguity also fails fast.
        wv = Window.partitionBy(key).orderBy(version_col)
        boundary_tie = F.lead(F.col(from_col)).over(wv) == F.col(seen_col)
        replay = (
            hist_t.withColumn(
                "__pts",
                F.when(
                    boundary_tie,
                    F.raise_error(
                        F.concat(
                            F.lit(
                                "scd2_apply: ts tie across a version "
                                "boundary cannot be re-ordered without "
                                "the raw log's tie-breakers — pass "
                                "observations= (key "
                            ),
                            F.col(key).cast("string"),
                            F.lit(")"),
                        )
                    ).cast(f"array<{ts_type}>"),
                ).otherwise(
                    F.array_distinct(
                        F.array(F.col(from_col), F.col(seen_col))
                    )
                ),
            )
            .select(
                key,
                *tracked,
                F.explode("__pts").alias(ts_col),
                *[F.lit(None).alias(c) for c in extra],
            )
        )
    rebuilt = scd2_build(
        replay.unionByName(batch, allowMissingColumns=False),
        key=key, tracked=tracked, ts_col=ts_col,
        order_extra=order_extra, **names,
    )
    return untouched.unionByName(rebuilt)
