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


def stream_events(spark, sf_dir: str, watermark: str = "1 hour") -> DataFrame:
    """readStream over the events parquet (one-file source works with
    availableNow for tests; on a cluster this is a directory/kafka source).

    The nanos-as-long conversion is applied exactly as in batch."""
    schema_src = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema_src)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream.withWatermark("ts", watermark)


def stream_tumbling_counts(spark, sf_dir: str, width: str = "10 minutes") -> DataFrame:
    """The streaming form of tumbling_windows_batch (same plan, streaming
    source + watermark)."""
    return tumbling_windows_batch(stream_events(spark, sf_dir), width)
