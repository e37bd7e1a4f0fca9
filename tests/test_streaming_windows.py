"""Watermarked tumbling-window aggregation over a parquet-backed stream."""

from datetime import datetime

from databricks_pdf_ocr_spark.streaming.windows import windowed_ingest_counts


def test_tumbling_window_counts(spark, tmp_path):
    rows = [
        (datetime(2026, 1, 1, 0, 1, 0), "crawl-a"),
        (datetime(2026, 1, 1, 0, 2, 0), "crawl-a"),
        (datetime(2026, 1, 1, 0, 7, 0), "crawl-b"),
        (datetime(2026, 1, 1, 0, 8, 30), "crawl-a"),
        (datetime(2026, 1, 1, 0, 12, 0), "crawl-b"),
    ]
    src = str(tmp_path / "ev")
    spark.createDataFrame(rows, "ts timestamp, source string") \
        .write.parquet(src)

    stream = spark.readStream.schema("ts timestamp, source string").parquet(src)
    agg = windowed_ingest_counts(stream, "ts", "5 minutes", "10 minutes",
                                 group_col="source")
    q = (agg.writeStream.format("memory").queryName("win_out")
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    got = {(r["window"].start.minute, r["source"]): r["n"]
           for r in spark.sql("SELECT * FROM win_out").collect()}
    assert got == {(0, "crawl-a"): 2, (5, "crawl-b"): 1,
                   (5, "crawl-a"): 1, (10, "crawl-b"): 1}


def test_session_window_counts(spark, tmp_path):
    from databricks_pdf_ocr_spark.streaming.windows import (
        session_window_counts)
    rows = [
        (datetime(2026, 1, 1, 0, 0, 0), "u1"),   # session 1 (u1)
        (datetime(2026, 1, 1, 0, 3, 0), "u1"),   #   extends (gap < 5m)
        (datetime(2026, 1, 1, 0, 20, 0), "u1"),  # session 2 (gap > 5m)
        (datetime(2026, 1, 1, 0, 1, 0), "u2"),   # session 1 (u2)
    ]
    src = str(tmp_path / "sess")
    spark.createDataFrame(rows, "ts timestamp, source string") \
        .write.parquet(src)
    stream = spark.readStream.schema("ts timestamp, source string") \
        .parquet(src)
    agg = session_window_counts(stream, "ts", "5 minutes", "10 minutes")
    q = (agg.writeStream.format("memory").queryName("sess_out")
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r["session_window"].start.minute, r["source"]): r["n"]
           for r in spark.sql("SELECT * FROM sess_out").collect()}
    assert got == {(0, "u1"): 2, (20, "u1"): 1, (1, "u2"): 1}
