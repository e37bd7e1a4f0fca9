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
