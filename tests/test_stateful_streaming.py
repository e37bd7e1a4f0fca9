"""applyInPandasWithState: cross-micro-batch first-occurrence dedup."""

from pyspark.sql import functions as F

from databricks_pdf_ocr_spark.streaming.stateful_dedup import (
    streaming_first_occurrence,
)


def test_streaming_dedup_across_microbatches(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    # batch 1: hashes A, B — batch 2: B (dup), C (maxFilesPerTrigger=1
    # forces separate micro-batches, so the B-dup crosses batch state)
    spark.createDataFrame([("A", "doc1"), ("B", "doc2")],
                          "content_hash string, doc_id string") \
        .coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame([("B", "doc3"), ("C", "doc4")],
                          "content_hash string, doc_id string") \
        .coalesce(1).write.parquet(str(src / "f2"))

    stream = (spark.readStream
              .schema("content_hash string, doc_id string")
              .option("maxFilesPerTrigger", "1")
              .parquet(str(src / "*")))
    deduped = streaming_first_occurrence(stream, "content_hash")
    q = (deduped.writeStream.format("memory").queryName("dedup_out")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    rows = spark.sql("SELECT * FROM dedup_out").collect()
    by_hash = {}
    for r in rows:
        by_hash.setdefault(r["content_hash"], []).append(r["doc_id"])
    assert set(by_hash) == {"A", "B", "C"}
    assert all(len(v) == 1 for v in by_hash.values()), by_hash
    # first occurrence won for the duplicated hash
    assert by_hash["B"] == ["doc2"]


def test_dedup_within_watermark(spark, tmp_path):
    from datetime import datetime
    from databricks_pdf_ocr_spark.streaming.stateful_dedup import (
        dedup_within_watermark)
    rows = [
        (datetime(2026, 1, 1, 0, 0, 0), "a", 1),
        (datetime(2026, 1, 1, 0, 1, 0), "a", 2),   # dup within window
        (datetime(2026, 1, 1, 0, 2, 0), "b", 3),
    ]
    src = str(tmp_path / "in")
    spark.createDataFrame(rows, "ts timestamp, k string, v long") \
        .write.parquet(src)
    stream = spark.readStream.schema("ts timestamp, k string, v long") \
        .parquet(src)
    out = dedup_within_watermark(stream, ["k"], "ts", "10 minutes")
    q = (out.writeStream.format("memory").queryName("ddww_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = sorted((r["k"], r["v"]) for r in
                 spark.sql("SELECT * FROM ddww_out").collect())
    assert [k for k, _ in got] == ["a", "b"]   # one row per key
