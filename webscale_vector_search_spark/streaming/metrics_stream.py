"""T2/T3 — the metrics stream: windowed latency/throughput aggregates.

Reference: heartbeat thread POSTs health + rolling percentiles every 5 s
(vector_search_cluster.py:716-757) over an in-memory last-1000 list
(240-241, 418-425). Spark owns executor health; what survives as capability
is the metrics STREAM: per-event timings aggregated over event-time windows
with watermarked late-data handling.

Batch twins of these aggregations (oracle-checked) live in
operators/metrics.py; this module is the readStream/writeStream shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_metrics(
    events: DataFrame,
    window_duration: str = "1 minute",
    slide: str | None = None,
    watermark: str = "10 seconds",
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling (or sliding, if `slide` given) event-time aggregate with a
    watermark: count / mean / approx p50-p95-p99 per (window, group).

    percentile_approx is the documented at-scale trade for the exact
    nearest-rank batch form (operators/metrics.py) — streaming state must be
    bounded, so the sketch replaces the sort.
    """
    win = (
        F.window(F.col(ts_col), window_duration, slide)
        if slide
        else F.window(F.col(ts_col), window_duration)
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("win"), F.col(group_col))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg(value_col), 6).alias("avg_value"),
            F.percentile_approx(value_col, [0.5, 0.95, 0.99], 10000).alias("p50_p95_p99"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            group_col,
            "n_events",
            "avg_value",
            F.col("p50_p95_p99")[0].alias("p50"),
            F.col("p50_p95_p99")[1].alias("p95"),
            F.col("p50_p95_p99")[2].alias("p99"),
        )
    )


def session_windows(
    events: DataFrame,
    gap: str = "5 minutes",
    watermark: str = "10 seconds",
    ts_col: str = "ts",
    group_col: str = "user_id",
) -> DataFrame:
    """X8 session windows: activity sessions per user with a gap timeout."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sess"), F.col(group_col))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            group_col,
            "n_events",
            "sum_value",
        )
    )


def streaming_dedup(stream: DataFrame, key_cols: list[str], watermark_col: str, delay: str) -> DataFrame:
    """Stateful streaming dedup within a watermark — the streaming analog of
    the X1 batch dedup (bounded state via dropDuplicatesWithinWatermark)."""
    return stream.withWatermark(watermark_col, delay).dropDuplicatesWithinWatermark(key_cols)
