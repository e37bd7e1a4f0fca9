"""Observation-based metrics: counts computed during the write action.

SURVEY.md §4.2.5: the reference accumulates stats in its driver loop
(``processors/ocr.py:167-199``); Spark-first, global metrics ride the
existing action via ``DataFrame.observe`` — zero extra passes, zero
collects.

Per-bucket lineage metrics stay a grouped aggregate over the written
results (checkpoint.mark_from_results): emulating the group-by inside
``observe`` via n_buckets × 6 ``sum(when(bucket = k, …))`` expressions was
measured and REJECTED — building/analyzing the 384 expression trees costs
4-20 s of driver time per run (py4j + Catalyst analysis), an order more
than the read-back it would replace.  The cheap wins live elsewhere:
explicit reader schemas, sum(is_first_span) doc counts, and control-plane
lineage rows written driver-side (TableIO.append_rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, functions as F


def observed_results(results: DataFrame) -> tuple[DataFrame, Observation]:
    """Attach a named observation to a results DataFrame.

    After the caller runs an action (e.g. the results write), read
    ``observation.get`` for: rows, success/failed/empty spans, docs seen,
    pages parsed, ocr fallbacks.
    """
    obs = Observation("extraction")
    df = results.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum((F.col("status") == "success").cast("long")).alias("success_spans"),
        F.sum((F.col("status") == "failed").cast("long")).alias("failed_spans"),
        F.sum((F.col("status") == "empty").cast("long")).alias("empty_spans"),
        F.approx_count_distinct("doc_id").alias("approx_docs"),
        F.sum("pages_parsed").alias("pages_parsed"),
        F.sum(F.col("ocr_fallback").cast("long")).alias("ocr_fallbacks"),
    )
    return df, obs
