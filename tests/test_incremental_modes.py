"""Work-selection modes (reference get_unprocessed_files,
processors/ocr.py:59-85) + latest-wins views."""

from dataclasses import replace

from pyspark.sql import functions as F

from databricks_pdf_ocr_spark import fixtures
from databricks_pdf_ocr_spark.config import TEST_CONFIG
from databricks_pdf_ocr_spark.operators.extract import run_extraction
from databricks_pdf_ocr_spark.operators.incremental import unprocessed
from databricks_pdf_ocr_spark.plans.state_views import (
    latest_per_key, latest_results,
)
from databricks_pdf_ocr_spark.schemas import DOCUMENTS_SCHEMA


def _docs(spark, n=20, seed=5):
    rows = list(fixtures.gen_rows(seed, n, fixtures.TINY))
    return rows, spark.createDataFrame(rows, schema=DOCUMENTS_SCHEMA)


def test_incremental_anti_join(spark):
    rows, df = _docs(spark)
    done_ids = [r[0] for r in rows[:8]]
    results = spark.createDataFrame([(d,) for d in done_ids], "doc_id string")
    cfg = replace(TEST_CONFIG, processing_mode="incremental")
    pending = unprocessed(df, results, cfg)
    got = {r["doc_id"] for r in pending.select("doc_id").collect()}
    assert got == {r[0] for r in rows[8:]}


def test_reprocess_all_and_specific(spark):
    rows, df = _docs(spark)
    cfg_all = replace(TEST_CONFIG, processing_mode="reprocess_all")
    assert unprocessed(df, None, cfg_all).count() == len(rows)

    want = tuple(r[0] for r in rows[3:6])
    cfg_spec = replace(TEST_CONFIG, processing_mode="reprocess_specific",
                       specific_doc_ids=want)
    got = {r["doc_id"] for r in unprocessed(df, None, cfg_spec).collect()}
    assert got == set(want)


def test_max_docs_per_run_cap(spark):
    rows, df = _docs(spark)
    cfg = replace(TEST_CONFIG, processing_mode="reprocess_all",
                  max_docs_per_run=5)
    assert unprocessed(df, None, cfg).count() == 5


def test_latest_wins_view(spark):
    rows, df = _docs(spark, n=6)
    r1 = run_extraction(df, TEST_CONFIG) \
        .withColumn("processed_at", F.lit("2026-01-01 00:00:00").cast("timestamp"))
    r2 = run_extraction(df, TEST_CONFIG) \
        .withColumn("processed_at", F.lit("2026-01-02 00:00:00").cast("timestamp"))
    both = r1.unionByName(r2)
    latest = latest_results(both)
    # one row per (doc,offset,sub), all from the newer run
    assert latest.count() == r1.count()
    assert latest.filter(F.col("processed_at")
                         < F.lit("2026-01-02 00:00:00").cast("timestamp")).count() == 0
    # generic helper ordering sanity
    d = spark.createDataFrame([(1, 1, "a"), (1, 2, "b"), (2, 1, "c")],
                              "k int, v int, s string")
    top = latest_per_key(d, ["k"], [F.desc("v")])
    assert {(r["k"], r["s"]) for r in top.collect()} == {(1, "b"), (2, "c")}


def test_latest_wins_prefers_run_seq_over_wallclock(spark):
    """run_seq (monotonic checkpoint ordinal) is the latest-wins primary:
    a later run whose wall-clock stepped BACKWARDS (NTP adjustment) must
    still win over the earlier run."""
    rows, df = _docs(spark, n=4)
    r1 = (run_extraction(df, TEST_CONFIG)
          .withColumn("run_seq", F.lit(1).cast("long"))
          .withColumn("processed_at",
                      F.lit("2026-01-02 00:00:00").cast("timestamp")))
    r2 = (run_extraction(df, TEST_CONFIG)       # later run, earlier clock
          .withColumn("run_seq", F.lit(2).cast("long"))
          .withColumn("processed_at",
                      F.lit("2026-01-01 00:00:00").cast("timestamp")))
    latest = latest_results(r1.unionByName(r2))
    assert latest.count() == r1.count()
    assert latest.filter(F.col("run_seq") != 2).count() == 0
