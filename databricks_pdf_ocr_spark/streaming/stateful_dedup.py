"""Stateful streaming dedup: first-occurrence-wins across micro-batches.

A streaming corpus pipeline must drop re-crawled duplicates *across*
micro-batches, not just within one — that needs keyed state.  This is the
``applyInPandasWithState`` custom stateful operator (guide: 'Stateful'
streaming): group by content hash, keep one boolean per key ("seen"),
emit only the first row ever observed for each key.

The reference's nearest analogue is volsync's upload-skip-by-hash
(``packages/volsync/src/volsync/volume_sync.py:167-191``) — a driver-side
dict; here the state is partitioned, fault-tolerant (checkpointed with
the query), and scales with executors.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: state per content hash: have we emitted a row for it already?
STATE_SCHEMA = "seen boolean"


def _first_occurrence(key, batches: Iterator[pd.DataFrame],
                      state: GroupState) -> Iterator[pd.DataFrame]:
    if state.exists:
        # already emitted for this key in an earlier batch/trigger
        for _ in batches:
            pass
        return
    first = None
    for pdf in batches:
        if len(pdf) and first is None:
            first = pdf.iloc[[0]]
    if first is not None:
        state.update((True,))
        yield first


def streaming_first_occurrence(stream: DataFrame,
                               key_col: str = "content_hash") -> DataFrame:
    """stream → one row per key, the first ever seen (exactly-once with
    the query checkpoint; state survives restarts)."""
    out_schema = stream.schema
    return (stream.groupBy(key_col)
            .applyInPandasWithState(
                _first_occurrence,
                outputStructType=out_schema,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


def dedup_within_watermark(stream: DataFrame, key_cols: list[str],
                           time_col: str = "ts",
                           watermark: str = "10 minutes") -> DataFrame:
    """Built-in alternative to :func:`streaming_first_occurrence` when
    duplicates arrive within a bounded window: Spark's
    ``dropDuplicatesWithinWatermark`` keeps the first row per key and
    EVICTS the key's state once the watermark passes — bounded state
    (keys/window × rate), versus the custom stateful op whose "seen"
    set lives forever (exact cross-stream dedup, unbounded keys).
    Pick by contract: bounded-window re-deliveries (retries, at-least-
    once sources) → this; true corpus-lifetime identity → the
    applyInPandasWithState op backed by a persisted key table."""
    return (stream.withWatermark(time_col, watermark)
            .dropDuplicatesWithinWatermark(key_cols))
