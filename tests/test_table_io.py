"""TableIO backend contract, parametrized over BOTH backends.

The parquet-directory backend always runs.  The Iceberg backend
(``IcebergTableIO`` — the north rule's table format) runs whenever an
Iceberg runtime jar + catalog are configured on the session; this
container has no jar and no network to fetch one (verified: no
iceberg/delta jars on disk, no ivy/m2 caches), so it SKIPS loudly here
and exercises the identical contract on any real cluster.  See
COVERAGE.md §"Iceberg".
"""

import pytest

from databricks_pdf_ocr_spark.sources.tables import (
    IcebergTableIO, TableIO, iceberg_available,
)


@pytest.fixture(params=["parquet", "iceberg"])
def io(request, spark, tmp_tables):
    if request.param == "iceberg":
        if not iceberg_available(spark):
            pytest.skip("no Iceberg runtime jar/catalog in this environment "
                        "(no network installs; jar absent from image)")
        yield IcebergTableIO(spark, namespace="local.test_io")
        for t in ("extracted", "appended"):
            IcebergTableIO(spark, namespace="local.test_io").drop(t)
    else:
        yield TableIO(spark, tmp_tables)


def test_overwrite_partitions_replaces_only_touched(spark, io):
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


def test_append_create_exists_drop(spark, io):
    t = "appended"
    assert io.read(t) is None and not io.exists(t)
    df = spark.createDataFrame([(0, "x"), (1, "y")],
                               "bucket int, payload string")
    io.append(df, t, partition_by=["bucket"])     # create-if-not-exists
    assert io.exists(t)
    io.append(df, t, partition_by=["bucket"])     # append to existing
    assert io.read(t).count() == 4
    io.drop(t)
    assert not io.exists(t)


def test_append_layout_guard(spark, tmp_tables):
    """Appending a mismatched partitioning layout must refuse loudly —
    mixing layouts in one directory mis-reads depending on which file
    Spark samples for schema (pre-partitioning tables must be dropped)."""
    io = TableIO(spark, tmp_tables)
    df = spark.createDataFrame([(0, "x")], "bucket int, payload string")

    io.append(df, "flat")                          # non-partitioned table
    with pytest.raises(ValueError, match="non-partitioned"):
        io.append(df, "flat", partition_by=["bucket"])

    io.append(df, "parted", partition_by=["bucket"])
    with pytest.raises(ValueError, match="partitioned by"):
        io.append(df, "parted")                    # flat into partitioned
    with pytest.raises(ValueError, match="partitioned by"):
        io.append(df, "parted", partition_by=["payload"])  # wrong column
    io.append(df, "parted", partition_by=["bucket"])   # matching layout ok
    assert io.read("parted").count() == 2


def test_compact_preserves_rows_and_merges_files(spark, tmp_tables):
    """Append-grown table → one file, identical content; missing table
    is a no-op report."""
    from databricks_pdf_ocr_spark.sources.tables import TableIO

    io = TableIO(spark, tmp_tables)
    for wave in range(3):
        io.append(spark.range(wave * 10, wave * 10 + 10)
                  .selectExpr("id", "id * 2 AS v").repartition(4), "t")
    before = {(r["id"], r["v"]) for r in io.read("t").collect()}
    rep = io.compact("t")
    assert rep["rows"] == 30 and rep["files_after"] < rep["files_before"]
    files = [f for f in __import__("os").listdir(io.path("t"))
             if f.endswith(".parquet")]
    assert len(files) == 1
    assert {(r["id"], r["v"]) for r in io.read("t").collect()} == before
    assert io.compact("missing") == {"files_before": 0, "files_after": 0,
                                     "rows": 0}


def test_write_with_bloom_adds_filter_bytes_and_roundtrips(spark, tmp_path):
    """Bloom-filtered write: same rows back, and the file grows by the
    split-block bloom bytes (the only observable here — this pyarrow
    build does not expose bloom_filter_offset)."""
    import glob
    import os

    from databricks_pdf_ocr_spark.sources.tables import write_with_bloom

    df = spark.range(0, 20000).selectExpr(
        "id", "concat('u', id) AS k").coalesce(1)
    plain = str(tmp_path / "plain")
    bloomed = str(tmp_path / "bloomed")
    df.write.parquet(plain)
    write_with_bloom(df, bloomed, {"k": 20000})
    a = os.path.getsize(glob.glob(plain + "/*.parquet")[0])
    b = os.path.getsize(glob.glob(bloomed + "/*.parquet")[0])
    assert b > a + 4096          # a real filter landed, not metadata noise
    back = spark.read.parquet(bloomed)
    assert back.count() == 20000
    assert back.filter("k = 'u19999'").count() == 1


def test_merge_rows_rewrites_only_touched_buckets(spark, tmp_path):
    """MERGE semantics (update + insert + delete in one changes set)
    AND the physical contract: untouched bucket partitions keep their
    exact files (mtimes unchanged)."""
    import glob
    import os

    from databricks_pdf_ocr_spark.sources.tables import TableIO, merge_rows

    io = TableIO(spark, str(tmp_path))
    base = spark.createDataFrame(
        [(i, f"v{i}", i % 4) for i in range(20)],
        "id long, v string, bucket int")
    io.overwrite(base.repartition("bucket"), "t", partition_by=["bucket"])
    mtimes = {f: os.path.getmtime(f)
              for f in glob.glob(io.path("t") + "/bucket=*/*.parquet")}

    # touch buckets 1 and 2 only: update id=1, delete id=2, insert id=101
    changes = spark.createDataFrame(
        [(1, "UPDATED", 1, False), (2, None, 2, True),
         (101, "NEW", 1, False)],
        "id long, v string, bucket int, _deleted boolean")
    rep = merge_rows(io, "t", changes, key="id")
    assert rep == {"touched_buckets": [1, 2], "upserts": 2, "deletes": 1}

    got = {r["id"]: r["v"] for r in io.read("t").collect()}
    expect = {i: f"v{i}" for i in range(20) if i != 2}
    expect[1] = "UPDATED"
    expect[101] = "NEW"
    assert got == expect

    for f, t0 in mtimes.items():
        part = f.split("bucket=")[1].split("/")[0]
        if part in ("0", "3"):
            assert os.path.exists(f) and os.path.getmtime(f) == t0, f
