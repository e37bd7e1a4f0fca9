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


def test_stream_band_join(spark, tmp_path):
    from databricks_pdf_ocr_spark.streaming.joins import stream_band_join
    errors = [
        (datetime(2026, 1, 1, 0, 0, 0), 1),
        (datetime(2026, 1, 1, 1, 0, 0), 2),
    ]
    clicks = [
        (datetime(2026, 1, 1, 0, 4, 0), 10),   # 4m after err 1 -> pair
        (datetime(2026, 1, 1, 0, 20, 0), 11),  # 20m after err 1 -> out of band
        (datetime(2026, 1, 1, 1, 0, 0), 12),   # dt=0 vs err 2 -> excluded
        (datetime(2026, 1, 1, 1, 10, 0), 13),  # exactly 10m after err 2 -> pair
    ]
    esrc, csrc = str(tmp_path / "err"), str(tmp_path / "clk")
    spark.createDataFrame(errors, "ts timestamp, eid long").write.parquet(esrc)
    spark.createDataFrame(clicks, "ts timestamp, cid long").write.parquet(csrc)
    es = spark.readStream.schema("ts timestamp, eid long").parquet(esrc)
    cs = spark.readStream.schema("ts timestamp, cid long").parquet(csrc)
    joined = stream_band_join(es, cs, band_us=600_000_000,
                              watermark="30 minutes")
    q = (joined.writeStream.format("memory").queryName("band_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = sorted((r["l_eid"], r["r_cid"]) for r in
                 spark.sql("SELECT * FROM band_out").collect())
    assert got == [(1, 10), (2, 13)]


def test_stream_static_enrichment(spark, tmp_path):
    """Stream-static left join: every stream row survives, matched rows
    carry the dimension attribute, and the static side re-reads its
    backing table per micro-batch (second drain sees updated dim)."""
    from databricks_pdf_ocr_spark.streaming.joins import enrich_stream

    src = str(tmp_path / "ev")
    dimp = str(tmp_path / "dim")
    spark.createDataFrame(
        [(datetime(2026, 1, 1, 0, 1, 0), "a.example", 1),
         (datetime(2026, 1, 1, 0, 2, 0), "b.example", 2),
         (datetime(2026, 1, 1, 0, 3, 0), "c.example", 3)],
        "ts timestamp, host string, event_id int").write.parquet(src)
    spark.createDataFrame(
        [("a.example", 90), ("b.example", 10)],
        "host string, reputation int").write.parquet(dimp)

    stream = spark.readStream.schema(
        "ts timestamp, host string, event_id int").parquet(src)
    dim = spark.read.parquet(dimp)
    out = enrich_stream(stream, dim, "host")
    q = (out.writeStream.format("memory").queryName("enrich_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = {r["event_id"]: r["reputation"]
           for r in spark.sql("SELECT * FROM enrich_out").collect()}
    assert got == {1: 90, 2: 10, 3: None}
