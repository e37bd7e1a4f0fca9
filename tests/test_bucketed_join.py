"""Sort-merge-bucket layout: bucketed tables join with NO shuffle.

The persisted answer to repeated big joins — both sides bucketed the
same way on the join key co-locate matching keys, and the planner
elides the exchange entirely (verified on the executed plan, not just
the result).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databricks_pdf_ocr_spark.sources.tables import write_bucketed


@pytest.fixture
def bucketed_pair(spark, tmp_path):
    left = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("a"))
    right = spark.range(0, 2000, 2).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("b"))
    write_bucketed(left, "smb_left", str(tmp_path / "l"), ["k"], 8,
                   sort_cols=["k"])
    write_bucketed(right, "smb_right", str(tmp_path / "r"), ["k"], 8,
                   sort_cols=["k"])
    yield spark.table("smb_left"), spark.table("smb_right")
    spark.sql("DROP TABLE IF EXISTS smb_left")
    spark.sql("DROP TABLE IF EXISTS smb_right")


def test_bucketed_join_has_no_shuffle(spark, bucketed_pair):
    lt, rt = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = lt.join(rt, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucket layout elides the shuffle
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain_join(spark, bucketed_pair):
    lt, rt = bucketed_pair
    got = sorted(map(tuple, lt.join(rt, "k").collect()))
    left = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("a"))
    right = spark.range(0, 2000, 2).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("b"))
    exp = sorted(map(tuple, left.join(right, "k").collect()))
    assert got == exp
