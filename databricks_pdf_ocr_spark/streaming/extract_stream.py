"""Streaming extraction: run the batch extraction pipeline incrementally.

The reference runs ingestion as a stream and OCR as a batch loop
(SURVEY.md §3).  Here the extraction stage itself can run under
Structured Streaming: a parquet/Iceberg stream of ``(doc_id, spans)``
micro-batches drives the same explode → Arrow-kernel → results-append
flow via ``foreachBatch`` — the checkpoint location gives exactly-once
per micro-batch, with the engine's deterministic result ids as the
idempotency belt-and-braces (a replayed batch rewrites identical rows;
readers dedup).

``availableNow`` drains everything then stops (reference T2), so the same
entry serves both continuous and run-as-batch operation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import ExtractConfig
from ..operators.extract import bucket_col, run_extraction
from ..schemas import DOCUMENTS_SCHEMA


def start_extraction_stream(spark: SparkSession, input_dir: str,
                            results_dir: str, checkpoint_dir: str,
                            cfg: ExtractConfig,
                            available_now: bool = True):
    """documents parquet dir (streaming) → extraction results (append)."""
    stream = (spark.readStream.schema(DOCUMENTS_SCHEMA)
              .option("maxFilesPerTrigger", "8")
              .parquet(input_dir))

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # same layout + stamps as the batch job: bucket-partitioned (one
        # file per touched bucket per micro-batch → pruned reads), with a
        # monotonic epoch run_id so latest-run-wins reads order correctly
        results = (run_extraction(batch_df, cfg)
                   .withColumn("bucket", bucket_col(cfg.n_buckets))
                   .withColumn("run_id", F.lit(f"epoch-{epoch_id:012d}"))
                   .withColumn("input_fingerprint",
                               F.lit(f"stream:{input_dir}"))
                   .withColumn("processed_at", F.current_timestamp()))
        (results.repartition("bucket")
         .write.mode("append").partitionBy("bucket").parquet(results_dir))

    writer = (stream.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def extract_available(spark: SparkSession, input_dir: str, results_dir: str,
                      checkpoint_dir: str, cfg: ExtractConfig) -> None:
    q = start_extraction_stream(spark, input_dir, results_dir,
                                checkpoint_dir, cfg)
    q.awaitTermination()
