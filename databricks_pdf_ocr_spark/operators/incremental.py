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

from pyspark.sql import DataFrame, Window, functions as F

from ..config import ExtractConfig

#: above this many ids, a literal IN-list stops being sane SQL
_ISIN_LIMIT = 1000


def cap_to_buckets(pending: DataFrame, max_docs: int) -> DataFrame:
    """Cap a pending work set at checkpoint-BUCKET granularity.

    Keeps whole buckets, in bucket order, until the cumulative doc count
    reaches ``max_docs`` (so the cap rounds UP to a bucket boundary —
    never truncates inside a bucket).  Buckets are the lineage/resume
    unit: a run marks every touched bucket 'done', so any row-level cut
    inside a bucket is permanent silent data loss on resume.

    Cost: one per-bucket count aggregate (≤ n_buckets rows) + a running
    sum over that tiny frame, then a broadcast semi-join back — the big
    side is never shuffled.
    """
    counts = pending.groupBy("bucket").agg(F.count(F.lit(1)).alias("__n"))
    w = (Window.partitionBy(F.lit(1)).orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, -1))
    keep = (counts
            .withColumn("__before", F.coalesce(F.sum("__n").over(w), F.lit(0)))
            .filter(F.col("__before") < max_docs)
            .select("bucket"))
    return pending.join(F.broadcast(keep), "bucket", "left_semi")


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
        # row-level cap is safe HERE: this operator selects work without
        # marking lineage.  The checkpointed job path must use
        # cap_to_buckets instead (a row cut inside a marked bucket is
        # silent data loss on resume).
        out = out.limit(cfg.max_docs_per_run)
    return out
