"""spark-submit entrypoint for the extraction pipeline.

Usage (north rule: ``spark-submit --py-files dist/pkg.zip jobs/extract.py``):

    spark-submit --master local[32] --py-files dist/databricks_pdf_ocr_spark.zip \\
        jobs/extract.py --input fixture:2000 --tables /tmp/engine_tables \\
        --mode incremental

``--input`` is either a parquet path holding ``(doc_id, spans)`` rows or
``fixture:<n_docs>[:<seed>]`` to build the deterministic synthetic table
distributed on executors (no external data — FIXTURES.md).

Flow (reference entrypoint analogue: ``main.py:56-101`` run_ocr_processing):
  1. load input → stamp checkpoint bucket
  2. anti-join buckets already done for this input fingerprint (resume)
  3. explode → salted repartition → Arrow-batched extraction
  4. append flat results (partitioned by bucket) — WRITE ...
  5. append per-bucket lineage metrics                — ... THEN MARK
  6. reassemble offset-sorted span sequences → extracted table
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from databricks_pdf_ocr_spark.config import ExtractConfig
from databricks_pdf_ocr_spark.operators.extract import (
    bucket_col, dedup_results, explode_spans, extract_spans, reassemble,
)
from databricks_pdf_ocr_spark.plans.checkpoint import (
    CheckpointManager, new_run_id,
)
from databricks_pdf_ocr_spark.session import get_spark
from databricks_pdf_ocr_spark.sources.tables import make_table_io

RESULTS_TABLE = "extraction_results"
EXTRACTED_TABLE = "extracted_documents"


def load_input(spark, spec: str, cfg: ExtractConfig):
    if spec.startswith("fixture:"):
        from databricks_pdf_ocr_spark import fixtures
        parts = spec.split(":")
        n_docs = int(parts[1])
        seed = int(parts[2]) if len(parts) > 2 else 42
        df = fixtures.fixture_df(spark, seed, n_docs, fixtures.BENCH)
        fingerprint = f"fixture:{seed}:{n_docs}"
        return df, fingerprint
    df = spark.read.parquet(spec)
    return df, f"path:{spec}"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--tables", required=True, help="table warehouse dir")
    ap.add_argument("--mode", default="incremental",
                    choices=["incremental", "reprocess_all", "reprocess_specific"])
    ap.add_argument("--doc-ids", default="", help="csv for reprocess_specific")
    ap.add_argument("--max-docs", type=int, default=None)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--fail-after-buckets", type=int, default=None,
                    help="TEST ONLY: process just the first k pending buckets "
                         "then exit nonzero (simulates a mid-run crash)")
    ap.add_argument("--skip-assemble", action="store_true")
    ap.add_argument("--salt", action="store_true",
                    help="span-level salted repartition before extraction "
                         "(for inputs where single docs rival a whole split)")
    args = ap.parse_args(argv)

    spark = get_spark(app_name="extract-job",
                      shuffle_partitions=args.partitions)
    cfg = ExtractConfig(
        n_buckets=args.n_buckets,
        shuffle_partitions=args.partitions
        or int(spark.conf.get("spark.sql.shuffle.partitions")),
        max_docs_per_run=args.max_docs,
        processing_mode=args.mode,
        specific_doc_ids=tuple(x for x in args.doc_ids.split(",") if x),
        salt_spans=args.salt,
    )
    io = make_table_io(spark, args.tables)
    cp = CheckpointManager(io, cfg)

    # steady-state warmup: spawn + import-load the Python workers and JIT the
    # JVM before the clock starts (identical at every cluster size, so the
    # throughput comparison measures the pipeline, not process spawn)
    cores = int(spark.conf.get("spark.sql.shuffle.partitions"))
    spark.range(cores * 4, numPartitions=cores).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long").count()

    t0 = time.time()
    documents, fingerprint = load_input(spark, args.input, cfg)

    # --- work selection (reference modes: processors/ocr.py:59-85) --------
    if args.mode == "reprocess_all":
        pending = documents.withColumn("bucket", bucket_col(cfg.n_buckets))
    elif args.mode == "reprocess_specific":
        pending = (documents
                   .filter(F.col("doc_id").isin(list(cfg.specific_doc_ids)))
                   .withColumn("bucket", bucket_col(cfg.n_buckets)))
    else:
        pending = cp.filter_pending(documents, fingerprint)

    if args.fail_after_buckets is not None:
        keep = (pending.select("bucket").distinct()
                .orderBy("bucket").limit(args.fail_after_buckets))
        pending = pending.join(F.broadcast(keep), "bucket", "left_semi")
    if args.max_docs:
        pending = pending.limit(args.max_docs)

    run_id = new_run_id()
    spans = explode_spans(pending.select("doc_id", "spans"))
    results = extract_spans(spans, cfg)
    # bucket kept as a plain column (row-group stats still prune); a
    # partitionBy here would fan every task into n_buckets files
    # (tasks × buckets small-file explosion)
    results = results.withColumn("bucket", bucket_col(cfg.n_buckets)) \
                     .withColumn("processed_at", F.current_timestamp())

    # WRITE results ... (global metrics observed during the same action —
    # no extra pass, SURVEY.md §4.2.5)
    from databricks_pdf_ocr_spark.plans.metrics import observed_results
    results, observation = observed_results(results)
    t_select = time.time()
    had_results = io.exists(RESULTS_TABLE)
    io.append(results, RESULTS_TABLE)
    t_extract = time.time()
    # ... THEN MARK lineage (re-scan of just-written columnar data is cheap
    # — column-pruned, no payload text read — and avoids recomputing)
    if args.mode == "reprocess_all" and args.fail_after_buckets is None \
            and not args.max_docs:
        # every bucket is pending by construction — skip the input re-scan
        pend_buckets = spark.range(cfg.n_buckets).select(
            F.col("id").cast("int").alias("bucket"))
    else:
        pend_buckets = pending.select("bucket").distinct()
    # column-prune BEFORE the dedup: metrics never touch the payload text,
    # so the dropDuplicates shuffle moves ~40 bytes/row instead of the docs
    this_run = (io.read(RESULTS_TABLE)
                .select("result_id", "doc_id", "offset", "sub_idx", "status",
                        "pages_parsed", "ocr_fallback", "bucket")
                .join(F.broadcast(pend_buckets), "bucket", "left_semi"))
    if had_results:
        # only a pre-existing table can contain replayed duplicates
        this_run = dedup_results(this_run)
    elapsed_ms = int((time.time() - t0) * 1000)
    cp.mark_from_results(this_run, run_id, fingerprint, elapsed_ms)
    t_mark = time.time()
    print(json.dumps({"phase_select_sec": round(t_select - t0, 2),
                      "phase_extract_write_sec": round(t_extract - t_select, 2),
                      "phase_mark_sec": round(t_mark - t_extract, 2)}),
          file=sys.stderr)

    if args.fail_after_buckets is not None:
        print(json.dumps({"run_id": run_id, "simulated_crash": True}))
        spark.stop()
        return 3

    # --- incremental reassembly: only THIS run's buckets are rebuilt ------
    # (a full-corpus reassembly per run is infeasible at 10^12 docs;
    # dynamic partition overwrite replaces exactly the touched bucket
    # partitions, leaving the rest of the extracted table untouched —
    # the parquet analogue of Iceberg overwrite-by-partition-filter)
    stats = {"run_id": run_id, "fingerprint": fingerprint}
    if not args.skip_assemble:
        # self-healing scope: this run's buckets, plus any bucket that has
        # results but no assembled partition (a prior run died after its
        # checkpoint mark but before assembly).  Rebuilding a bucket always
        # reads the FULL results table for it, so partitions accumulate
        # docs across runs/fingerprints correctly.
        results_all = io.read(RESULTS_TABLE)
        res_buckets = results_all.select("bucket").distinct()
        ext = io.read(EXTRACTED_TABLE)
        if ext is None:
            to_assemble = res_buckets
        else:
            missing = res_buckets.join(ext.select("bucket").distinct(),
                                       "bucket", "left_anti")
            to_assemble = pend_buckets.unionByName(missing).distinct()
        touched = results_all.join(F.broadcast(to_assemble), "bucket",
                                   "left_semi")
        assembled = reassemble(touched).withColumn(
            "bucket", bucket_col(cfg.n_buckets))
        io.overwrite_partitions(assembled, EXTRACTED_TABLE, ["bucket"])
        stats["docs_extracted"] = io.read(EXTRACTED_TABLE).count()

    hist = cp.run_history(1).collect()
    if hist:
        h = hist[0].asDict()
        stats.update({k: h[k] for k in
                      ("docs_done", "pages_parsed", "ocr_fallbacks",
                       "span_count", "failed_spans")})
    try:
        stats["observed"] = observation.get
    except Exception:
        pass  # observation unavailable if the write produced no rows
    stats["elapsed_sec"] = round(time.time() - t0, 2)
    print(json.dumps(stats, default=str))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
