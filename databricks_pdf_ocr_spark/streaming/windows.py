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
