"""Event-time streaming aggregation with watermarks — the capability
SURVEY §2.6 declares as Spark's addition over the reference (whose
windows are processing-time + arrival-count only, src/step.ts:76-77).

Two shapes:

- :func:`stream_time_window_agg` — tumbling event-time windows
  (``F.window``) with a watermark: late events inside the watermark
  delay are GUARANTEED to merge into their window (the strict side of
  Spark's watermark contract); events later than the watermark lose
  that guarantee — the engine may aggregate them (this Spark build
  admits them as a late singleton window) or drop them, and their
  state is evicted as the watermark advances (bounded state at any
  scale — without the watermark, streaming window state grows
  forever).
- :func:`stream_session_windows` — gap-based sessions
  (``F.session_window``): the streaming twin of the batch
  ``session_gap`` query, with the same 30-minute default gap.

Scale: state lives in the state store partitioned by (key, window);
the shuffle is the same hash exchange the batch aggregate uses, and
AQE sizes the micro-batch side.  Watermark delay bounds both state
size and result latency — pick it from the source's real out-of-
orderness, not from the window length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stream_time_window_agg(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    value_col: str = "value",
    keys: list[str] | None = None,
) -> DataFrame:
    """Tumbling event-time aggregation: (window, *keys) -> count and
    exact decimal sum.  Late data within ``watermark`` merges into its
    window (guaranteed); later data has no guarantee — state for
    passed windows is evicted, each window is emitted exactly once in
    append mode."""
    group: list[Column | str] = [F.window(F.col(ts_col), window)]
    group += list(keys or [])
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*group)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col(value_col).cast("decimal(28,6)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *(keys or []),
            "n_events",
            "sum_value",
        )
    )


def stream_session_windows(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based event-time sessions per key — the streaming twin of
    the batch ``session_gap`` query (same inactivity-gap semantics,
    here with dynamic session merging as late events arrive inside
    the watermark)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col(value_col).cast("decimal(28,6)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col(key_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
