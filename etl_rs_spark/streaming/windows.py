"""Event-time windowed aggregation with watermark-based late-data
handling.

Absent in the reference (consumption is offset-bounded batch,
SURVEY.md §2.13); provided here because a CDC/ingest engine needs
arrival-rate observability: events-per-window per op, tolerating
bounded lateness, state evicted past the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window counts per op with a watermark. Works on both
    streaming and batch frames (batch ignores the watermark, enabling
    the DuckDB oracle comparison on the same query shape)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(F.col(ts_col), window).alias("w"), "op")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact distinct aggs are unsupported on streams; HLL is
            # deterministic so stream and batch produce identical values
            F.approx_count_distinct("doc_id").alias("n_docs"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "op",
            "n_events",
            "n_docs",
        )
    )
