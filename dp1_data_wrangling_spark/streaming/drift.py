"""Streaming distribution-drift monitor: the binned-KS ingest twin.

``stream_ks_drift`` folds each micro-batch of fresh values into a
catalog-backed drift table against a STATIC reference snapshot, with
exactly-once semantics (per-stream batch-id watermark riding the same
atomic commit — the idempotent-foreachBatch pattern shared with
``stream_sketches``).

Why this is the right streaming shape: the current sample's bin census
is ASSOCIATIVE (per-bin counts add), so the stream maintains one
``<table>_census`` table by per-bin addition and re-derives the full
constant-size drift frame (cumulative CDFs, per-bin KS distance, the
max) per batch via the SAME ``ks_from_censuses`` core the batch
operator uses.  After any prefix of the stream, ``<table>`` equals
``binned_ks_drift(ref, all delivered rows)`` bit-exactly regardless of
micro-batch cuts (the equivalence test drives this).  State is
``n_bins`` rows forever — a drift monitor over years of ingest is a
20-row table.

The reference stats and census are computed ONCE at stream start
(driver-side plan, executed per merge but over the static ref — cheap
because a drift reference is dimension-sized/sampled by the batch
operator's stated contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.stats import ks_from_censuses
from ..plans.catalog import Catalog, CommitConflict
from .sinks import batch_meta_key

MERGE_RETRIES = 5


def stream_ks_drift(
    stream_df: DataFrame,
    ref: DataFrame,
    catalog_root: str,
    *,
    checkpoint_dir: str,
    value_col: str,
    n_bins: int = 20,
    quant_scale: int = 1000,
    table: str = "ks_drift",
    trigger_available_now: bool = True,
    stream_name: str | None = None,
) -> StreamingQuery:
    """Start the drift-monitor stream into ``catalog_root``/``table``
    (the incremental current-sample census persists in
    ``<table>_census``)."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    if quant_scale < 1:
        raise ValueError(f"quant_scale must be >= 1, got {quant_scale}")
    meta_key = batch_meta_key(f"ksdrift:{table}", checkpoint_dir, stream_name)
    census_table = f"{table}_census"
    q = lambda c: F.floor(c * F.lit(quant_scale)).cast("bigint")  # noqa: E731
    r = ref.filter(F.col(value_col).isNotNull()).select(
        q(F.col(value_col)).alias("__x")
    )
    stats = r.agg(
        F.min("__x").alias("__lo"),
        F.expr(f"((max(__x) - min(__x)) div {n_bins}) + 1").alias("__w"),
        F.count("*").cast("bigint").alias("__nr"),
    )
    bin_of = F.expr(
        f"least(cast({n_bins - 1} as bigint), "
        f"greatest(cast(0 as bigint), (__x - __lo) div __w))"
    )
    rb = (
        r.crossJoin(F.broadcast(stats))
        .select(bin_of.alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").cast("bigint").alias("n_ref"))
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        cat = Catalog(catalog_root)
        last = cat.meta().get(meta_key)
        if last is not None and batch_id <= last:
            return  # replayed batch after recovery -> already committed
        spark = batch_df.sparkSession
        b_census = (
            batch_df.filter(F.col(value_col).isNotNull())
            .select(q(F.col(value_col)).alias("__x"))
            .crossJoin(F.broadcast(stats))
            .select(bin_of.alias("bin"))
            .groupBy("bin")
            .agg(F.count("*").cast("bigint").alias("n_cur"))
        )
        last_exc: CommitConflict | None = None
        for _ in range(MERGE_RETRIES):
            snapshot = cat.manifest()
            census_roots = list(snapshot["tables"].get(census_table, []))
            merged = (
                cat._read_roots(spark, census_roots)
                .unionByName(b_census)
                .groupBy("bin")
                .agg(F.sum("n_cur").cast("bigint").alias("n_cur"))
                if census_roots
                else b_census
            )
            drift = ks_from_censuses(spark, stats, rb, merged, n_bins=n_bins)
            txn = cat.begin()
            txn.stage(census_table, merged, mode="overwrite")
            txn.stage(table, drift, mode="overwrite")
            try:
                # watermark + census + drift frame: one atomic commit —
                # exactly-once hinges on their inseparability
                cat.commit(
                    txn,
                    meta={meta_key: batch_id},
                    require_roots={census_table: census_roots},
                )
                return
            except CommitConflict as exc:
                last_exc = exc
                continue
        raise CommitConflict(
            f"stream_ks_drift({table!r}): concurrent commits kept winning "
            f"after {MERGE_RETRIES} attempts"
        ) from last_exc

    writer = stream_df.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
