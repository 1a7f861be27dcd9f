"""Generic exactly-once keyed-census maintenance + census-fold read
sides (r12).

Several batch operators in this engine decompose through an
ASSOCIATIVE census — a keyed count the whole answer re-derives from
(rank/ntile: the value census; KS drift: the bin census; CUSUM drift:
the per-period count census; seasonal profiles: the period census).
Counts add, so a stream maintains the census by per-key addition with
the idempotent-foreachBatch MERGE pattern, and the READ side replays
the batch fold over census-sized data — bit-identical to the batch
operator over every delivered event, however the stream was cut, and
robust to LATE data (a late event revises its key's count, which
re-derives every downstream statistic — the cross-row damage bounded
incremental state cannot express).

``stream_census`` is the generic maintainer (the
``streaming/ranking.py`` twin is its single-key specialization with
the total-order NULL guard); ``read_cusum_alarms`` folds a maintained
(group, period, n) census through the exact CUSUM detector — the
streaming form of the ``events_changepoints`` surface: an ops /
data-quality alarm over event VOLUME per period that revises history
when late data lands, instead of alarming on a partial day.

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


def stream_census(
    stream_events: DataFrame,
    catalog_root: str,
    *,
    checkpoint_dir: str,
    table: str,
    key_cols: list[str],
    trigger_available_now: bool = True,
    stream_name: str | None = None,
) -> StreamingQuery:
    """Maintain ``catalog_root``/``table`` = one ``(*key_cols, n_rows)``
    row per distinct key over every event delivered so far, exactly
    once (the per-stream batch-id watermark rides the same atomic
    MERGE commit as the counts).

    Project the key expressions on the STREAM before calling (e.g.
    ``stream.select(F.col("event_type"), (ts div day).alias("day"))``)
    — the census maintainer is expression-agnostic by design, so the
    caller's projection is the single definition both the stream and
    its batch oracle share.  NULL keys census like any other value
    (SQL GROUP BY semantics); screen upstream where a NULL has no
    meaning.

    Scale: per batch one combinable groupBy over the batch + a
    touched-keys recombine (census-sized) + one MERGE rewrite; state
    is the census — bounded by distinct keys, never rows.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    meta_key = batch_meta_key(f"census:{table}", checkpoint_dir, stream_name)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cat = Catalog(catalog_root)
        last = cat.meta().get(meta_key)
        if last is not None and batch_id <= last:
            return  # replayed batch after recovery -> already committed
        partial = batch_df.groupBy(*key_cols).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows")
        )
        last_exc: CommitConflict | None = None
        for _ in range(MERGE_RETRIES):
            if cat.exists(table):
                current = cat.read(spark, table)
                touched = partial.select(*key_cols).distinct()
                overlap = current.join(touched, on=key_cols, how="left_semi")
                updates = (
                    overlap.unionByName(partial)
                    .groupBy(*key_cols)
                    .agg(F.sum("n_rows").cast("bigint").alias("n_rows"))
                )
            else:
                updates = partial
            try:
                cat.merge(
                    spark,
                    table,
                    updates,
                    key_cols,
                    sort_by=list(key_cols),
                    max_retries=1,
                    meta={meta_key: batch_id},
                )
                return
            except CommitConflict as exc:
                last_exc = exc
                continue
        raise CommitConflict(
            f"stream_census({table!r}): concurrent commits kept winning "
            f"after {MERGE_RETRIES} attempts"
        ) from last_exc

    writer = stream_events.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_cusum_alarms(
    spark,
    catalog_root: str,
    *,
    table: str,
    group_cols: list[str],
    order_col: str,
    slack_milli: int = 0,
    threshold_milli: int = 1000,
) -> DataFrame:
    """Fold a maintained ``(group, period, n_rows)`` census through the
    exact two-sided CUSUM detector (operators/changepoint.py) — the
    volume-drift alarm, bit-identical to the batch detector over the
    same delivered events.  A LATE event that revises an old period's
    count moves the group mean and therefore EVERY position's
    statistic — which the census fold re-derives and bounded
    sequential state cannot.  Runs over census-sized data (periods,
    not events)."""
    from ..operators.changepoint import cusum_changepoints

    census = Catalog(catalog_root).read(spark, table)
    return cusum_changepoints(
        census,
        value_col="n_rows",
        order_cols=[order_col],
        group_cols=group_cols,
        slack_milli=slack_milli,
        threshold_milli=threshold_milli,
    )


def read_grid_hotspots(
    spark,
    catalog_root: str,
    *,
    table: str,
    min_count: int = 1,
) -> DataFrame:
    """Fold a maintained ``(cell_x, cell_y, n_rows)`` census through
    the exact Moore-stencil hotspot screen (operators/spatial.py
    hotspots_from_census) — the streaming form of the
    ``events_grid_hotspots`` surface.  A LATE point revises its cell's
    count, which moves that cell AND its eight neighbors'
    concentration — the stencil fold re-derives all of it over
    census-sized data.  Project the stream through
    ``operators.spatial.grid_cells`` so the cell definition is shared
    with the batch screen and the oracle."""
    from ..operators.spatial import hotspots_from_census

    census = Catalog(catalog_root).read(spark, table)
    return hotspots_from_census(
        census, min_count=min_count, count_col="n_rows"
    )
