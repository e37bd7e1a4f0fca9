"""As-of (merge-asof) join — composed from built-in Spark operators.

Spark has no native ASOF JOIN (guide: 'Common OLAP patterns').  The
scalable composition: union both sides tagged, sort within key by
(time, tag), and carry the right side's columns forward with
``last(..., ignorenulls=True)`` over an unbounded-preceding window —
one shuffle on the key, no range-join explosion, no per-group Python.

Used here to attach the latest prior order to each event; the DuckDB
oracle uses its *native* ASOF JOIN, making this a genuine cross-engine
semantic check of the composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str, left_time: str,
              right_time: str, value_col: str,
              out_col: str = "asof_value",
              right_key: str | None = None) -> DataFrame:
    """For each left row: the right row's ``value_col`` with the greatest
    ``right_time`` <= ``left_time`` within ``key`` (ties on time must be
    pre-resolved on the right side).  Left rows with no match get null.
    """
    right_key = right_key or key
    l_tag = (left.select(F.col(key).alias("__k"),
                         F.col(left_time).alias("__t"),
                         F.lit(1).alias("__tag"),
                         F.struct(*left.columns).alias("__left"),
                         F.lit(None).cast(
                             right.schema[value_col].dataType).alias("__v")))
    r_tag = (right.select(F.col(right_key).alias("__k"),
                          F.col(right_time).alias("__t"),
                          F.lit(0).alias("__tag"),
                          F.lit(None).cast(
                              l_tag.schema["__left"].dataType).alias("__left"),
                          F.col(value_col).alias("__v")))
    unioned = l_tag.unionByName(r_tag)
    w = (Window.partitionBy("__k").orderBy("__t", "__tag")
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = unioned.withColumn("__asof", F.last("__v", ignorenulls=True).over(w))
    return (carried.filter(F.col("__tag") == 1)
            .select(F.col("__left.*"), F.col("__asof").alias(out_col)))
