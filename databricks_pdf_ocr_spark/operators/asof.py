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


def band_join(left: DataFrame, right: DataFrame, left_time: str,
              right_time: str, band_us: int,
              left_cols: list[str], right_cols: list[str]) -> DataFrame:
    """Time-band join WITHOUT an equi key: every (left, right) pair with
    ``0 < right_time - left_time <= band_us`` (microseconds since a
    common epoch, both sides BIGINT).

    Spark has no native band/range join — a naive theta-join is a
    broadcast nested loop (quadratic, a scale-killer).  The standard
    composition: bucket both sides into ``band_us``-wide bins, probe
    each left row against ITS OWN bin and the next one (a (0, band]
    window spans at most two bins), equi-join on the bin, then apply the
    exact band filter.  One shuffle on the bin key, candidate fan-out
    bounded by 2·(events per bin) — linear in event rate, never in
    corpus size.  Per-bin population = band·arrival-rate: a hot bin is
    a data property (burst), handled by AQE skew splitting, not a plan
    property.
    """
    lb = left.select(*left_cols, F.col(left_time).alias("__lt"),
                     F.explode(F.array(
                         F.floor(F.col(left_time) / F.lit(band_us)),
                         F.floor(F.col(left_time) / F.lit(band_us)) + 1))
                     .alias("__bin"))
    rb = right.select(*right_cols, F.col(right_time).alias("__rt"),
                      F.floor(F.col(right_time) / F.lit(band_us))
                      .alias("__bin"))
    dt = F.col("__rt") - F.col("__lt")
    return (lb.join(rb, "__bin")
            .filter((dt > 0) & (dt <= F.lit(band_us)))
            .select(*left_cols, *right_cols, dt.alias("dt_us")))
