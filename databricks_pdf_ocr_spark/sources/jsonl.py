"""JSONL crawl-dump source (WET/CC-style line-delimited documents).

The other common crawl-corpus interchange format besides WARC: one JSON
object per line, ``{"url": ..., "text": ..., "lang": ...}``.  Malformed
lines become ERROR ROWS (the module contract shared with the WARC
source: the pipeline continues, nothing throws), valid lines project
onto the documents contract, and duplicate URLs within a batch resolve
latest-line-wins (the WARC latest-capture rule).

Scale shape: ``spark.read.text`` splits uncompressed files by range and
gives one task per .gz file (gzip unsplittable — same as WARC
segments); parsing is ``from_json`` column expressions (JVM, zero
Python); the only shuffle is the per-URL latest-wins window, keyed on
the hashed URL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

#: explicit line schema — never inferred (a schema-inference pass over
#: 100 TB of JSONL is a full extra scan).
LINE_SCHEMA = "url string, text string, lang string"


def lines_to_documents(lines: DataFrame, value_col: str = "value",
                       line_col: str = "line_no") -> DataFrame:
    """(line_no, value) → documents-contract rows
    (doc_id, url, lang, text, line_no); invalid lines are absent here
    (see :func:`error_lines`).  doc_id is the sha256 of the URL — the
    WARC source's identity rule, so both mouths dedup consistently.
    """
    parsed = lines.withColumn("j", F.from_json(F.col(value_col),
                                               LINE_SCHEMA))
    valid = (parsed
             .filter(F.col("j").isNotNull()
                     & F.col("j.url").isNotNull()
                     & F.col("j.text").isNotNull())
             .select(F.sha2(F.col("j.url"), 256).alias("doc_id"),
                     F.col("j.url").alias("url"),
                     F.col("j.lang").alias("lang"),
                     F.col("j.text").alias("text"),
                     F.col(line_col).alias("line_no")))
    w = Window.partitionBy("doc_id").orderBy(F.desc("line_no"))
    return (valid.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def error_lines(lines: DataFrame, value_col: str = "value",
                line_col: str = "line_no") -> DataFrame:
    """(line_no, raw, reason) for every line that did not become a
    document: unparseable JSON, or missing url/text."""
    parsed = lines.withColumn("j", F.from_json(F.col(value_col),
                                               LINE_SCHEMA))
    reason = (F.when(F.col("j").isNull(), "unparseable")
              .when(F.col("j.url").isNull(), "missing url")
              .otherwise("missing text"))
    return (parsed
            .filter(F.col("j").isNull()
                    | F.col("j.url").isNull()
                    | F.col("j.text").isNull())
            .select(F.col(line_col).alias("line_no"),
                    F.col(value_col).alias("raw"),
                    reason.alias("reason")))


def read_jsonl_dir(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory of .jsonl / .jsonl.gz dumps into the documents
    contract.  Line numbers here are per-file byte-order ids scoped by
    filename (deterministic within a file; latest-wins across files
    resolves by (file, position) order)."""
    raw = (spark.read.text(path)
           .select(F.col("value"),
                   F.concat(F.input_file_name(), F.lit("#"),
                            F.lpad(F.monotonically_increasing_id()
                                   .cast("string"), 20, "0"))
                   .alias("pos")))
    # zero-padded so lexicographic = numeric; for .gz dumps one file is
    # one partition, so this is exact per-file byte order (crawl dumps
    # are gz in practice — uncompressed splittable text would interleave
    # split ids and latest-wins across splits is then arbitrary)
    return lines_to_documents(raw, line_col="pos")
