"""SparkSession factory.

Replaces the reference's Databricks Connect session factory
(``config.py:177-202``) with a plain ``SparkSession.builder`` suitable for
``spark-submit --py-files`` on any cluster, plus local[N] for tests/bench.

Scale-relevant defaults:
- AQE on (runtime partition coalescing + skew-join splitting);
- Arrow enabled, with ``maxRecordsPerBatch`` bounded low because document
  payloads are multi-KB..MB — batches must be bounded by bytes in flight,
  not row count (SURVEY.md §4.2.4);
- shuffle partitions sized to the machine, not the 200 default;
- session timezone pinned UTC so DuckDB-oracle comparisons are stable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "databricks_pdf_ocr_spark",
    shuffle_partitions: int | None = None,
    arrow_batch_rows: int = 256,
    driver_memory: str | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cores = os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", cores))
    b = (
        SparkSession.builder.appName(app_name)
        # local mode: the driver heap is the only executor memory knob;
        # only honored if set before the JVM starts (first session wins)
        .config("spark.driver.memory",
                driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # NOTE (r06): preferSortMergeJoin=false + the AQE SMJ→SHJ
        # rewrite were tried here and REVERTED — measured at the 10x
        # bench shape they regressed the non-equi band join 7x
        # (band_join_error_clicks 0.7 s → 5.0 s: the banded range
        # condition re-evaluates against every build-side hash bucket)
        # and slowed ann_lsh/lm_bigram joins; sort-merge + AQE broadcast
        # conversion is the right default for this engine's join mix.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows))
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
    )
    if master:
        b = b.master(master)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
