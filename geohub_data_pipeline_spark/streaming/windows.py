"""Watermarked event-time windows (X8) — streaming twins of the batch
operators in plans/temporal.py.

Batch/stream parity is by construction: the same ``window()`` /
``session_window()`` expressions run in both modes; streaming adds
``withWatermark`` (bounded state + late-data policy).  Tests assert a
drained (availableNow) stream emits exactly the batch results.

Scale: watermarks bound the keyed state store; sliding windows
multiply state by size/slide; session state is per active key.  At
1000 executors use RocksDB state store + state rebalancing — config,
not code changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, ts_col: str = "ts",
                    duration: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), duration).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"),
                "event_type", "n_events")
    )


def sliding_counts(events: DataFrame, ts_col: str = "ts",
                   duration: str = "1 hour", slide: str = "30 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), duration, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_stats(events: DataFrame, ts_col: str = "ts",
                  gap: str = "10 minutes",
                  watermark: str = "30 minutes") -> DataFrame:
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("sw.start").alias("session_start"),
                F.col("sw.end").alias("session_end"), "n_events")
    )


def dedup_events(events: DataFrame, id_col: str = "event_id",
                 ts_col: str = "ts", watermark: str = "1 hour") -> DataFrame:
    """Streaming exactly-once-per-id dedup within the watermark."""
    return events.withWatermark(ts_col, watermark).dropDuplicates(
        [id_col, ts_col])


def cancel_stream_join(messages: DataFrame, cancels: DataFrame,
                       msg_ts: str = "enqueued_ts",
                       cancel_ts: str = "sent_ts",
                       url_col: str = "blob_url",
                       watermark: str = "1 hour",
                       horizon: str = "30 minutes") -> DataFrame:
    """X6 as a real stream-stream join: match in-flight uploads to
    cancel requests arriving within ``horizon`` after enqueue.

    Both sides carry watermarks so the join state is bounded: a
    message's state is evicted once the cancel-side watermark passes
    enqueue + horizon.  (The batch service path uses a static cancel
    lookup; this is the unbounded-streams form.)
    """
    m = messages.withWatermark(msg_ts, watermark)
    c = (cancels.filter(F.col("cancel"))
         .withColumnRenamed("url", url_col)
         .withWatermark(cancel_ts, watermark))
    return m.join(
        c,
        (m[url_col] == c[url_col])
        & (c[cancel_ts] >= m[msg_ts])
        & (c[cancel_ts] <= m[msg_ts] + F.expr(f"INTERVAL {horizon}")),
        "inner",
    ).select(m["*"], c[cancel_ts].alias("cancelled_at"))
