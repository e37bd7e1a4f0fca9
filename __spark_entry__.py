"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the full extraction pipeline (deterministic
fixture documents → explode → Arrow-batched extraction → offset-sorted
reassembly) at sf0.001 scale.

``queries()`` / ``oracle_sql()`` — the operator registry in
``databricks_pdf_ocr_spark/queries.py``: every implemented operator from
SURVEY.md §2 plus the training-data-pipeline operators (dedup ladder,
similarity search, text analysis), each paired with a DuckDB oracle where
SQL-expressible.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from databricks_pdf_ocr_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.extract_e2e(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
