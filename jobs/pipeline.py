"""Full-pipeline entrypoint: ingest → extract → assemble → status.

Reference analogue: ``uv run pipeline`` → ``run_full_pipeline``
(``main.py:103-117``: setup tables, streaming ingestion, batch OCR,
state update).  Here: streaming binary ingestion (if a landing dir is
given) → interleaved-documents conversion → checkpointed extraction →
reassembly, one command.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from databricks_pdf_ocr_spark.session import get_spark
from databricks_pdf_ocr_spark.streaming.ingest import ingest_available
import jobs.extract as extract_job


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--landing", help="dir of raw PDF files to ingest first")
    ap.add_argument("--input", help="existing (doc_id, spans) parquet input")
    ap.add_argument("--tables", required=True)
    ap.add_argument("--mode", default="incremental")
    ap.add_argument("--media-payloads", action="store_true",
                    help="also materialize the media_payloads table")
    args = ap.parse_args(argv)

    spark = get_spark(app_name="pipeline")
    tables = Path(args.tables)
    input_path = args.input

    if args.landing:
        src_dir = str(tables / "pdf_source")
        ingest_available(spark, args.landing, src_dir,
                         str(tables / "_ingest_checkpoint"), glob="*")
        # source rows → interleaved documents (single pdf span per file)
        docs = spark.read.parquet(src_dir).select(
            F.col("file_id").alias("doc_id"),
            F.array(F.struct(
                F.lit("pdf").alias("kind"),
                F.base64(F.col("file_content")).alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"))).alias("spans"))
        input_path = str(tables / "documents")
        docs.write.mode("overwrite").parquet(input_path)
    if not input_path:
        ap.error("need --landing or --input")
    spark.stop()  # extract job builds its own session/config

    rc = extract_job.main(["--input", input_path, "--tables", args.tables,
                           "--mode", args.mode]
                          + (["--media-payloads"] if args.media_payloads
                             else []))
    print(json.dumps({"pipeline": "done", "rc": rc}))
    return rc


if __name__ == "__main__":
    sys.exit(main())
