"""Work-selection operators: the reference's processing modes, Spark-first.

Reference: ``get_unprocessed_files`` (``processors/ocr.py:59-85``) collects
all processed ids to the driver and filters with ``isin`` — the collapse
point at 10^12 docs (SURVEY.md §3.3).  Here the work set stays a DataFrame:

- incremental  → ``left_anti`` join against processed doc ids
- reprocess_all → full scan
- reprocess_specific → ``isin`` for short user lists, ``left_semi`` join
  against a DataFrame for large ones

plus the per-run cap (``max_docs_per_run``, reference ``settings.toml:21``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import ExtractConfig

#: above this many ids, a literal IN-list stops being sane SQL
_ISIN_LIMIT = 1000


def unprocessed(documents: DataFrame, results: DataFrame | None,
                cfg: ExtractConfig) -> DataFrame:
    """Select the work set for a run according to ``cfg.processing_mode``."""
    mode = cfg.processing_mode
    if mode == "reprocess_all":
        out = documents
    elif mode == "reprocess_specific":
        ids = list(cfg.specific_doc_ids)
        if len(ids) <= _ISIN_LIMIT:
            out = documents.filter(F.col("doc_id").isin(ids))
        else:
            ids_df = documents.sparkSession.createDataFrame(
                [(i,) for i in ids], "doc_id string")
            out = documents.join(F.broadcast(ids_df), "doc_id", "left_semi")
    else:  # incremental
        if results is None:
            out = documents
        else:
            done = results.select("doc_id").distinct()
            # Catalyst picks broadcast vs shuffled anti join by size; at
            # 10^12 docs both sides shuffle on doc_id — correct and bounded,
            # unlike the reference's driver-side collect
            out = documents.join(done, "doc_id", "left_anti")
    if cfg.max_docs_per_run:
        out = out.limit(cfg.max_docs_per_run)
    return out
