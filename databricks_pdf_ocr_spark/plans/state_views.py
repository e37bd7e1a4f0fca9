"""Latest-wins reads over append-only tables.

The reference updates its run-state table by rewriting the whole table
with when/otherwise (``managers/state.py:64-73``) — non-atomic and
unscalable.  The engine's replacement (SURVEY.md §4.1): tables are
append-only logs; readers take the latest version per key with a
row_number window — the §2.5 "window dedup" pattern as a reusable view.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def latest_per_key(df: DataFrame, keys: list[str],
                   order_by: list[Column]) -> DataFrame:
    """Keep the newest row per key (ties broken by the given ordering)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn"))


def latest_results(results: DataFrame) -> DataFrame:
    """Latest extraction row per (doc_id, offset, sub_idx) — the
    latest-wins read over a results log that may contain rows from
    several runs (reprocess_all appends; deterministic ids make identical
    reruns collapse, this view resolves *changed* reruns)."""
    return latest_per_key(
        results, ["doc_id", "offset", "sub_idx"],
        [F.desc("processed_at"), F.desc("result_id")])


def latest_run_config(checkpoint: DataFrame) -> DataFrame:
    """Newest config blob per input fingerprint (reference: the
    'configuration' JSON column, ``managers/state.py:36``)."""
    return latest_per_key(
        checkpoint.select("input_fingerprint", "run_id", "config_json",
                          "updated_at"),
        ["input_fingerprint"],
        [F.desc("updated_at"), F.desc("run_id")])
