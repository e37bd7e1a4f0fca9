"""Streaming extraction: micro-batched foreachBatch pipeline produces the
same span sequences as the batch pipeline / golden oracle."""

from databricks_pdf_ocr_spark import fixtures
from databricks_pdf_ocr_spark.config import TEST_CONFIG
from databricks_pdf_ocr_spark.operators.extract import reassemble
from databricks_pdf_ocr_spark.schemas import DOCUMENTS_SCHEMA
from databricks_pdf_ocr_spark.streaming.extract_stream import extract_available
from tools.goldens import golden_extract

SEED = 11
N_DOCS = 30


def test_streaming_extraction_matches_golden(spark, tmp_path):
    rows = list(fixtures.gen_rows(SEED, N_DOCS, fixtures.TINY))
    input_dir = str(tmp_path / "docs")
    # several files → several micro-batches under maxFilesPerTrigger
    spark.createDataFrame(rows, schema=DOCUMENTS_SCHEMA) \
        .repartition(6).write.parquet(input_dir)

    results_dir = str(tmp_path / "results")
    ckpt = str(tmp_path / "ckpt")
    extract_available(spark, input_dir, results_dir, ckpt, TEST_CONFIG)

    got = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                      for s in r["spans"]]
        for r in reassemble(spark.read.parquet(results_dir)).collect()
    }
    gold = {k: v for k, v in golden_extract(rows, TEST_CONFIG).items() if v}
    assert got == gold

    # drain again: stream checkpoint ensures no re-processing
    n_before = spark.read.parquet(results_dir).count()
    extract_available(spark, input_dir, results_dir, ckpt, TEST_CONFIG)
    assert spark.read.parquet(results_dir).count() == n_before
