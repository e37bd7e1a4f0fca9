"""Event-time windowed aggregation with watermarks.

Beyond-reference streaming surface (the reference has no event-time
processing — SURVEY.md §2.9): tumbling-window counts over a document
stream with a watermark bounding late data, the standard ingestion-rate /
lag dashboard feeding a corpus pipeline's monitoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_ingest_counts(stream: DataFrame, time_col: str = "ts",
                           window: str = "5 minutes",
                           watermark: str = "10 minutes",
                           group_col: str | None = None) -> DataFrame:
    """stream → (window, [group], n, …) with late rows beyond the
    watermark dropped; append-mode compatible (windows finalize once the
    watermark passes)."""
    keys = [F.window(F.col(time_col), window)]
    if group_col:
        keys.append(F.col(group_col))
    return (stream
            .withWatermark(time_col, watermark)
            .groupBy(*keys)
            .agg(F.count("*").alias("n")))


def session_window_counts(stream: DataFrame, time_col: str = "ts",
                          gap: str = "5 minutes",
                          watermark: str = "10 minutes",
                          group_col: str = "source") -> DataFrame:
    """Gap-based session windows per key: a session extends while events
    arrive within ``gap`` of the previous one and finalizes once the
    watermark passes its close — the streaming twin of the batch
    ``sessionize`` operator (which pins exact session ids for the
    oracle).  Dynamic windows merge in the state store; state per key is
    bounded by open sessions, evicted at the watermark."""
    return (stream
            .withWatermark(time_col, watermark)
            .groupBy(F.session_window(F.col(time_col), gap),
                     F.col(group_col))
            .agg(F.count("*").alias("n")))
