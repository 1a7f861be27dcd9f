"""Streaming maintenance of the ranking tier's VALUE CENSUS — the
distributed-rank family's exactly-once twin.

Per-row rank / ntile outputs are functions of the FULL dataset (one new
row shifts every higher rank), so the keyed-rebuild core does not apply
— but the census the batch machinery (``operators/ranking.py``)
decomposes through IS incrementally maintainable: bucket/value counts
are associative, so a stream folds each micro-batch's ``groupBy(value)
count`` into the published census by per-value ADDITION, and the exact
rank algebra re-derives from the maintained census at read time.

``stream_rank_census`` maintains silver = one ``(metric_value,
n_rows)`` row per distinct value with exactly-once semantics (the
per-stream batch-id watermark rides the same atomic MERGE commit as
the counts — the idempotent-foreachBatch pattern shared with
``stream_rollup``).  ``read_rank_tiles`` folds the census into the
exact NTILE boundary summary via :func:`~..operators.ranking.
rank_tile_summary` — bit-identical to ``NTILE(k) OVER (ORDER BY
value, tie)`` grouped per tile over every event delivered so far,
regardless of how the events were cut into micro-batches (the
equivalence the tests assert across cuts and replay).

Why the SUMMARY and not per-row tiers: the summary is tie-invariant
(the value at any rank is fixed because value is non-decreasing in
rank), so it is exactly the part of the ranking tier a census can
carry; per-row assignment at read time is one broadcast range-join of
the k-row boundary table against the rows — left to the caller, who
knows which rows they need tiered.

Scale: per batch = one combinable value-count groupBy over the batch +
a touched-values recombine (census-sized, value-keyed) + one MERGE
rewrite; read = census-sized distributed_rank + a k-row fold.  State
is the census — bounded by distinct values, never rows — the same
bounded-state posture as the sketch twins.

Engine extension — the reference (export_dp1.py / import_dp1.py) has
no streaming tier; cited for provenance only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..plans.catalog import Catalog, CommitConflict
from .sinks import batch_meta_key

MERGE_RETRIES = 5


def census_partial(events: DataFrame, *, metric_col: str) -> DataFrame:
    """One micro-batch's (or the whole batch run's) value census:
    ``(metric_value, n_rows)``, NULL metrics refused executor-side
    (fail-fast threaded into the grouped column — the batch ranking
    contract; a NULL has no place in a total order)."""
    guarded = F.when(
        F.col(metric_col).isNotNull(), F.col(metric_col).cast("bigint")
    ).otherwise(
        F.raise_error(
            F.lit(
                "stream_rank_census: NULL metric — a total order admits "
                "none; filter upstream"
            )
        ).cast("bigint")
    )
    return events.select(guarded.alias("metric_value")).groupBy(
        "metric_value"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))


def stream_rank_census(
    stream_events: DataFrame,
    catalog_root: str,
    *,
    checkpoint_dir: str,
    metric_col: str,
    table: str = "rank_census",
    trigger_available_now: bool = True,
    stream_name: str | None = None,
) -> StreamingQuery:
    """Start the exactly-once census-maintenance stream into
    ``catalog_root``/``table``.

    The materialized census equals ``groupBy(metric) count`` over every
    event delivered so far — bit-exactly, because per-value counts are
    a fixed-point BIGINT sum — so every read-side rank derivation
    (:func:`read_rank_tiles`, or a caller's own
    :func:`~..operators.ranking.rank_tile_summary` fold) matches the
    batch computation over the same events."""
    meta_key = batch_meta_key(
        f"rank_census:{table}", checkpoint_dir, stream_name
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cat = Catalog(catalog_root)
        last = cat.meta().get(meta_key)
        if last is not None and batch_id <= last:
            return  # replayed batch after recovery -> already committed
        partial = census_partial(batch_df, metric_col=metric_col)
        last_exc: CommitConflict | None = None
        for _ in range(MERGE_RETRIES):
            if cat.exists(table):
                current = cat.read(spark, table)
                touched = partial.select("metric_value").distinct()
                overlap = current.join(
                    touched, on=["metric_value"], how="left_semi"
                )
                updates = (
                    overlap.unionByName(partial)
                    .groupBy("metric_value")
                    .agg(F.sum("n_rows").cast("bigint").alias("n_rows"))
                )
            else:
                updates = partial
            try:
                cat.merge(
                    spark,
                    table,
                    updates,
                    ["metric_value"],
                    sort_by=["metric_value"],
                    max_retries=1,
                    meta={meta_key: batch_id},
                )
                return
            except CommitConflict as exc:
                last_exc = exc
                continue
        raise CommitConflict(
            f"stream_rank_census({table!r}): concurrent commits kept "
            f"winning after {MERGE_RETRIES} attempts"
        ) from last_exc

    writer = stream_events.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_rank_tiles(
    spark,
    catalog_root: str,
    *,
    n_tiles: int,
    table: str = "rank_census",
) -> DataFrame:
    """Fold the maintained census into the exact NTILE boundary summary
    ``(tier, rank_lo, rank_hi, n_rows, value_lo, value_hi)`` — one row
    per non-empty tier, bit-identical to the batch
    ``rank_tile_summary`` (and therefore to the plain SQL NTILE window
    grouped per tile) over every delivered event."""
    from ..operators.ranking import rank_tile_summary

    census = Catalog(catalog_root).read(spark, table)
    return rank_tile_summary(
        census,
        metric_col="metric_value",
        count_col="n_rows",
        n_tiles=n_tiles,
    )
