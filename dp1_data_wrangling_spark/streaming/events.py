"""Event-time windowing over the events table — batch + streaming forms.

The *same* transformation functions serve both: in batch they are
oracle-checkable against DuckDB; in streaming they compose with
``readStream`` + watermark (tested with availableNow triggers into a
memory sink).  This is the Structured Streaming contract: a streaming
DataFrame accepts the identical logical plan.

Scale posture: event-time windows aggregate with map-side partial
combine on (window, keys); the watermark bounds state.  Session windows
use Spark's native session_window (state merges adjacent events), the
batch oracle replays them as a gaps-and-islands window computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..registry import micros


def tumbling_windows_batch(events: DataFrame, width: str = "10 minutes") -> DataFrame:
    """Tumbling event-time windows: counts + exact fixed-point value sum."""
    return (
        events.groupBy(
            F.window("ts", width).alias("w"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(micros(F.col("value"))).alias("sum_value_micros"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value_micros",
        )
    )


def sliding_windows_batch(
    events: DataFrame, width: str = "10 minutes", slide: str = "5 minutes"
) -> DataFrame:
    """Sliding windows (each event lands in width/slide windows)."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
        )
    )


def session_windows_batch(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user: events within ``gap`` of each other merge;
    window end = last event + gap (Spark session_window semantics)."""
    return (
        events.groupBy(
            F.session_window("ts", gap).alias("w"), F.col("user_id")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def to_event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to the instant type Structured
    Streaming requires: ``withWatermark`` rejects TIMESTAMP_NTZ
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), and parquet timestamps without
    isAdjustedToUTC scan as NTZ.  NTZ wall times are interpreted as UTC
    (the engine's session timezone), so the cast is value-preserving;
    nanos-as-long columns get the exact integer-division conversion.
    Batch twins compared against streams must normalize the same way."""
    typ = dict(df.dtypes).get(col)
    if typ == "bigint":
        return df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    if typ == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def stream_events(spark, sf_dir: str, watermark: str = "1 hour") -> DataFrame:
    """readStream over the events parquet (one-file source works with
    availableNow for tests; on a cluster this is a directory/kafka source).

    Event-time normalization (nanos / NTZ -> instant) is applied exactly
    as the batch twins must apply it — see ``to_event_time``."""
    schema_src = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema_src)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return to_event_time(stream).withWatermark("ts", watermark)


def stream_tumbling_counts(spark, sf_dir: str, width: str = "10 minutes") -> DataFrame:
    """The streaming form of tumbling_windows_batch (same plan, streaming
    source + watermark)."""
    return tumbling_windows_batch(stream_events(spark, sf_dir), width)


_CORRELATION_HORIZON_US = 1_800_000_000  # 30 minutes


def correlated_events_batch(
    events: DataFrame,
    left_type: str = "view",
    right_type: str = "purchase",
    horizon_us: int = _CORRELATION_HORIZON_US,
) -> DataFrame:
    """Per-user event correlation: every (view, purchase) pair from the same
    user where the purchase lands within ``horizon_us`` after the view —
    the attribution-join shape.

    Batch form of a stream-stream interval join: equi-key on user_id (hash
    join), time bound as a post-filter.  At scale both sides shuffle once
    on user_id; the time horizon is what makes the *streaming* twin's state
    finite."""
    a = events.filter(F.col("event_type") == left_type).select(
        F.col("user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    b = events.filter(F.col("event_type") == right_type).select(
        F.col("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    # Interval arithmetic (ts + INTERVAL) instead of unix_micros: valid for
    # both TIMESTAMP and TIMESTAMP_NTZ scans (parquet without isAdjustedToUTC
    # infers NTZ on Spark 4), and the canonical bound form Spark recognizes
    # for stream-stream join state expiry.
    return a.join(
        b,
        (a.user_id == b.user_id)
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (
            F.col("purchase_ts")
            < F.col("view_ts") + F.expr(f"INTERVAL {horizon_us} MICROSECOND")
        ),
    ).select(
        a.user_id.alias("user_id"),
        "view_id",
        "view_ts",
        "purchase_id",
        "purchase_ts",
    )


def _stream_correlated(
    spark,
    sf_dir: str,
    left_type: str,
    right_type: str,
    watermark: str,
    how: str,
) -> DataFrame:
    """Shared builder for the inner / left-outer stream-stream interval
    join twins — ONE plan definition so a fix to the horizon bound or
    watermark handling cannot silently diverge between join types."""
    left = stream_events(spark, sf_dir, watermark).filter(
        F.col("event_type") == left_type
    ).select(
        F.col("user_id").alias("l_user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    right = stream_events(spark, sf_dir, watermark).filter(
        F.col("event_type") == right_type
    ).select(
        F.col("user_id").alias("r_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return left.join(
        right,
        (F.col("l_user_id") == F.col("r_user_id"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (
            F.col("purchase_ts")
            < F.col("view_ts")
            + F.expr(f"INTERVAL {_CORRELATION_HORIZON_US} MICROSECOND")
        ),
        how,
    ).select(
        F.col("l_user_id").alias("user_id"),
        "view_id",
        "view_ts",
        "purchase_id",
        "purchase_ts",
    )


def stream_correlated_events(
    spark,
    sf_dir: str,
    left_type: str = "view",
    right_type: str = "purchase",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: the same plan as
    ``correlated_events_batch`` over two watermarked readStream sides.
    The watermark + time bound let Spark expire join state (a view older
    than watermark+horizon can never match again)."""
    return _stream_correlated(
        spark, sf_dir, left_type, right_type, watermark, "inner"
    )


def stream_correlated_events_outer(
    spark,
    sf_dir: str,
    left_type: str = "view",
    right_type: str = "purchase",
    watermark: str = "2 hours",
) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every view, with its
    in-horizon purchases where they exist and a NULL extension where
    none arrives — the funnel-drop detector (views that never convert).

    Semantics Spark gives this plan: MATCHED rows emit eagerly (same as
    the inner join); a NULL-extended row for an unmatched view emits
    only once the watermark proves no future purchase can match it
    (view_ts + horizon < watermark), so outer emissions LAG the
    watermark by design — at stream end, views younger than
    watermark + horizon are still pending in state, not lost.  The
    equivalence test pins exactly this contract: matches equal the
    batch inner join, every emitted NULL is a true batch non-match, and
    every safely-expired batch non-match has emitted.

    State bound: identical to the inner twin (watermark + time bound
    expire both sides); the NULL-extension bookkeeping adds no state.
    """
    return _stream_correlated(
        spark, sf_dir, left_type, right_type, watermark, "left_outer"
    )


def stream_static_enrich(stream: DataFrame, dim: DataFrame, key: str = "user_id") -> DataFrame:
    """Stream-static join: enrich a stream against a batch dimension table.

    The static side is re-planned per micro-batch (so a catalog-table dim
    picks up new snapshots) and broadcast when small — the streaming
    analogue of the engine's J1 broadcast dimension expansion.  No state,
    no watermark needed: only the stream side is unbounded."""
    from pyspark.sql import functions as _F

    return stream.join(_F.broadcast(dim), key)


def stream_dedup_events(stream: DataFrame) -> DataFrame:
    """Streaming exact dedup on event_id within the watermark window
    (``dropDuplicatesWithinWatermark``): at-least-once sources redeliver;
    state holds one (id, max-seen-ts) entry per key and expires with the
    watermark — the streaming twin of the batch exact-dedup groupBy.
    The input must already carry a watermark (``stream_events`` applies
    one)."""
    return stream.dropDuplicatesWithinWatermark(["event_id"])
