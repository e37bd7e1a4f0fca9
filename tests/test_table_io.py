"""TableIO: dynamic partition overwrite semantics (incremental assembly)."""

from databricks_pdf_ocr_spark.sources.tables import TableIO


def test_overwrite_partitions_replaces_only_touched(spark, tmp_tables):
    io = TableIO(spark, tmp_tables)
    t = "extracted"
    df1 = spark.createDataFrame(
        [(0, "a-v1"), (0, "b-v1"), (1, "c-v1")], "bucket int, payload string")
    io.overwrite_partitions(df1, t, ["bucket"])
    assert io.read(t).count() == 3

    # rewrite ONLY bucket 1; bucket 0 must remain untouched
    df2 = spark.createDataFrame([(1, "c-v2"), (1, "d-v2")],
                                "bucket int, payload string")
    io.overwrite_partitions(df2, t, ["bucket"])
    rows = {(r["bucket"], r["payload"]) for r in io.read(t).collect()}
    assert rows == {(0, "a-v1"), (0, "b-v1"), (1, "c-v2"), (1, "d-v2")}

    # adding a brand-new bucket appends a partition without touching others
    df3 = spark.createDataFrame([(2, "e-v1")], "bucket int, payload string")
    io.overwrite_partitions(df3, t, ["bucket"])
    assert io.read(t).count() == 5
