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
  4. append results PARTITIONED BY bucket (repartition first: one file per
     touched bucket per run → real partition pruning downstream) — WRITE ...
  5. append per-bucket lineage metrics (this run's rows only)  — ... THEN MARK
  6. reassemble offset-sorted span sequences (latest-run-wins per doc)
     → dynamic-overwrite only the touched bucket partitions

The core is ``run_job(spark, args)`` so tests drive it in-process against
the shared session; ``main()`` only owns session lifecycle + JSON printing.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Observation, functions as F

from databricks_pdf_ocr_spark.config import ExtractConfig, load_config
from databricks_pdf_ocr_spark.operators.extract import (
    bucket_col, explode_spans, extract_spans, reassemble,
)
from databricks_pdf_ocr_spark.operators.incremental import cap_to_buckets
from databricks_pdf_ocr_spark.plans.checkpoint import (
    CheckpointManager, new_run_id,
)
from databricks_pdf_ocr_spark.plans.state_views import latest_results
from databricks_pdf_ocr_spark.session import get_spark
from databricks_pdf_ocr_spark.sources.tables import make_table_io

RESULTS_TABLE = "extraction_results"
EXTRACTED_TABLE = "extracted_documents"
MEDIA_TABLE = "media_payloads"


def _restore_gc_staging(io) -> int:
    """Crash recovery for ``gc_media_orphans``: a prior run that died
    between ``drop_partitions`` and the restoring ``append`` left the
    ONLY copy of the surviving live payloads in the ``__gc`` staging
    table — and the old entry-point ``io.drop(staging)`` would have
    silently destroyed it on the next run (round-4 ADVICE medium).  So
    on entry any non-empty staging is appended back to MEDIA_TABLE
    FIRST, then dropped.  Over-restoring (crash landed after a partial
    or full append) only duplicates byte-identical content-addressed
    rows, which ``multimodal.dedup_payloads`` collapses on read — loss
    is impossible, duplication is self-healing.  Returns rows restored.
    """
    staging = MEDIA_TABLE + "__gc"
    leftover = io.read(staging)
    n = 0
    if leftover is not None:
        n = leftover.count()
        if n:
            io.append(leftover, MEDIA_TABLE, partition_by=["bucket"])
    io.drop(staging)
    return int(n)


def gc_media_orphans(io) -> dict:
    """Maintenance: drop media_payloads rows whose ref no latest-wins
    result references (re-ingesting a doc with CHANGED content mints new
    content-addressed refs; the old payloads otherwise linger forever —
    the storage-leak twin of the checkpoint log's growth, solved the way
    compaction is: a bounded rewrite of only the affected partitions).

    Precondition (documented, like any table maintenance): run when no
    extraction/media run is in flight — a payload written for results
    not yet committed would look orphaned.

    Scale shape: one column-pruned scan of results (media_ref + the
    latest-wins run columns), an anti-join to find orphans, then a
    dynamic partition overwrite of ONLY the buckets holding orphans
    (≤ n_buckets ints collected; untouched buckets are not rewritten).
    """
    from databricks_pdf_ocr_spark.plans.state_views import latest_results

    restored = _restore_gc_staging(io)   # BEFORE any read of MEDIA_TABLE
    pay = io.read(MEDIA_TABLE)
    res = io.read(RESULTS_TABLE,
                  schema="doc_id string, media_ref string, run_id string, "
                         "run_seq long, processed_at timestamp, bucket int")
    if pay is None or res is None:
        return {"gc_orphans": 0, "gc_buckets": 0, "gc_restored": restored}
    live = (latest_results(res)
            .filter(F.col("media_ref").startswith("pdfimg:"))
            .select("media_ref").distinct())
    orphans = (pay.filter(F.col("media_ref").isNotNull())
               .join(live, "media_ref", "left_anti"))
    touched = sorted(r["bucket"] for r in
                     orphans.select("bucket").distinct().collect())
    if not touched:
        return {"gc_orphans": 0, "gc_buckets": 0, "gc_restored": restored}
    n_orphans = orphans.count()
    in_touched = pay.filter(F.col("bucket").isin(touched))
    kept = (in_touched.filter(F.col("media_ref").isNotNull())
            .join(live, "media_ref", "left_semi")
            .unionByName(                       # null-ref error rows stay:
                in_touched.filter(F.col("media_ref").isNull())))  # provenance
    # stage → drop → restore: DYNAMIC overwrite cannot express an
    # all-orphans partition becoming EMPTY (it only replaces partitions
    # present in the written data), so touched partitions are dropped
    # outright and survivors re-appended from a FULLY-MATERIALIZED
    # staging copy (kept reads from the very partitions being dropped —
    # laziness here would be data loss)
    staging = MEDIA_TABLE + "__gc"
    io.overwrite(kept, staging, partition_by=["bucket"])
    io.drop_partitions(MEDIA_TABLE, "bucket", touched)
    survivors = io.read(staging)
    if survivors is not None:
        io.append(survivors, MEDIA_TABLE, partition_by=["bucket"])
    io.drop(staging)
    return {"gc_orphans": int(n_orphans), "gc_buckets": len(touched),
            "gc_restored": restored}


def run_media_stage(io, cp, documents, fingerprint: str, cfg,
                    mode: str, doc_ids=(), run_seq: int | None = None,
                    fail_after_buckets: int | None = None) -> dict:
    """Materialize the bucket-partitioned ``media_payloads`` table: every
    embedded raster image of every pending pdf span, keyed by the
    content-addressed ``media_ref`` the extraction kernel stamps on its
    media spans (VERDICT r3 #5; reference analogue: every page flows
    through ``pdf_to_images``, processors/ocr.py:100).

    Resumable via the same checkpoint lineage under its OWN fingerprint
    (``<input>#media``): write payloads → mark buckets; a crash between
    the two re-extracts the bucket and the byte-identical rows (refs are
    payload hashes) dedup on read (``multimodal.dedup_payloads``)."""
    from databricks_pdf_ocr_spark.operators.multimodal import pdf_span_images

    fp = fingerprint + "#media"
    t0 = time.time()
    if mode == "reprocess_all":
        pending = documents.withColumn("bucket", bucket_col(cfg.n_buckets))
    elif mode == "reprocess_specific":
        pending = (documents.filter(F.col("doc_id").isin(list(doc_ids)))
                   .withColumn("bucket", bucket_col(cfg.n_buckets)))
    else:
        pending = cp.filter_pending(documents, fp)
    if fail_after_buckets is not None:
        keep = (pending.select("bucket").distinct()
                .orderBy("bucket").limit(fail_after_buckets))
        pending = pending.join(F.broadcast(keep), "bucket", "left_semi")

    # per-bucket doc/span counts BEFORE the fan-out (1 row per doc)
    doc_rows = (pending.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.size(F.filter(F.col("spans"),
                              lambda s: s["kind"] == "pdf")))
        .alias("pdf_spans")).collect())     # ≤ n_buckets control-plane rows
    pend_list = sorted(r["bucket"] for r in doc_rows)
    if not pend_list:
        return {"media_buckets": 0, "media_images": 0, "media_errors": 0}

    run_id = new_run_id()
    if run_seq is None:
        run_seq = cp.next_run_seq()
    spans = (pending
             .select("doc_id", F.explode("spans").alias("s"))
             .filter(F.col("s.kind") == "pdf")
             .select("doc_id", F.col("s.offset").alias("offset"),
                     F.col("s.text").alias("text")))
    payloads = (pdf_span_images(spans, max_pages=cfg.max_pages_per_doc,
                                max_payload_bytes=cfg.max_payload_bytes)
                .withColumn("bucket", bucket_col(cfg.n_buckets))
                .withColumn("run_id", F.lit(run_id))
                .withColumn("run_seq", F.lit(run_seq).cast("long"))
                .withColumn("processed_at", F.current_timestamp())
                .repartition(cfg.n_buckets, "bucket"))
    # WRITE payloads (one file per touched bucket per run) ...
    io.append(payloads, MEDIA_TABLE, partition_by=["bucket"])
    # ... THEN MARK.  Pruned re-scan: partition isin + run_id filter,
    # column-pruned to the two metric columns.
    pay = (io.read(MEDIA_TABLE,
                   schema="run_id string, extract_ok boolean, bucket int")
           .filter(F.col("bucket").isin(pend_list))
           .filter(F.col("run_id") == run_id))
    img_rows = {r["bucket"]: r for r in pay.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("images"),
        F.sum((~F.col("extract_ok")).cast("long")).alias("errors"))
        .collect()}                          # ≤ n_buckets control-plane rows
    metrics = []
    for r in doc_rows:
        img = img_rows.get(r["bucket"])
        metrics.append({
            "bucket": r["bucket"],
            "docs_done": r["docs"],
            "spans_in": r["pdf_spans"],
            "span_count": img["images"] if img else 0,
            "failed_spans": img["errors"] if img else 0,
        })
    cp.mark_buckets(metrics, run_id, fp, int((time.time() - t0) * 1000),
                    run_seq=run_seq)
    return {"media_buckets": len(pend_list),
            "media_images": int(sum(m["span_count"] for m in metrics)),
            "media_errors": int(sum(m["failed_spans"] for m in metrics))}


def load_input(spark, spec: str, cfg: ExtractConfig):
    if spec.startswith("fixture:"):
        from databricks_pdf_ocr_spark import fixtures
        parts = spec.split(":")
        n_docs = int(parts[1])
        seed = int(parts[2]) if len(parts) > 2 else 42
        df = fixtures.fixture_df(spark, seed, n_docs, fixtures.BENCH)
        fingerprint = f"fixture:{seed}:{n_docs}"
        return df, fingerprint
    if spec.startswith("warc:"):
        # crawl mouth: .warc.gz segment directory → streaming record
        # parse → latest-capture URI dedup → the documents contract,
        # extracted in the same run (r5; the batch twin of the
        # streaming ingest).  Incremental resume works unchanged:
        # doc_id = sha2(target_uri) is stable across recrawls.
        from databricks_pdf_ocr_spark.sources import warc as warc_src
        seg_dir = spec[len("warc:"):]
        df = warc_src.warc_to_documents(
            warc_src.read_warc_segments(spark, seg_dir))
        return df, f"warc:{seg_dir}"
    # explicit schema (the declared input contract): no footer-sampling
    # inference job on the driver before the pipeline even starts
    from databricks_pdf_ocr_spark.schemas import DOCUMENTS_SCHEMA
    df = spark.read.schema(DOCUMENTS_SCHEMA).parquet(spec)
    return df, f"path:{spec}"


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--tables", required=True, help="table warehouse dir")
    ap.add_argument("--mode", default="incremental",
                    choices=["incremental", "reprocess_all", "reprocess_specific"])
    ap.add_argument("--doc-ids", default="", help="csv for reprocess_specific")
    ap.add_argument("--max-docs", type=int, default=None,
                    help="per-run work cap, rounded UP to whole checkpoint "
                         "buckets (a row-level cap would truncate mid-bucket "
                         "while lineage marks the whole bucket done — "
                         "silently dropping the rest on resume)")
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--n-buckets", type=int, default=None,
                    help="checkpoint bucket count (unset → layered config)")
    ap.add_argument("--env", default=None,
                    help="config layer to apply (dev|test|prod; "
                         "default $ENGINE_ENV or dev)")
    ap.add_argument("--config", default=None,
                    help="settings.toml path (default $ENGINE_SETTINGS_FILE "
                         "or repo-root settings.toml)")
    ap.add_argument("--fail-after-buckets", type=int, default=None,
                    help="TEST ONLY: process just the first k pending buckets "
                         "then exit nonzero (simulates a mid-run crash)")
    ap.add_argument("--skip-assemble", action="store_true")
    ap.add_argument("--split-mb", type=int, default=8,
                    help="input split target (spark.sql.files.maxPartitionBytes, "
                         "MB).  Extraction costs seconds of CPU per input MB, "
                         "so Spark's 128MB scan default yields ~1 task wave "
                         "per executor: the stage wall becomes the single "
                         "slowest split and stragglers idle the rest.  Fine "
                         "splits (many waves) load-balance the compute-bound "
                         "stage; 0 keeps Spark's default")
    ap.add_argument("--salt", action="store_true",
                    help="span-level salted repartition before extraction "
                         "(for inputs where single docs rival a whole split)")
    ap.add_argument("--media-payloads", action="store_true",
                    help="also materialize the media_payloads table "
                         "(embedded pdf raster images keyed by the "
                         "content-addressed media_ref the extraction "
                         "results reference), resumable under its own "
                         "checkpoint lineage fingerprint")
    ap.add_argument("--cache-results", action="store_true",
                    help="persist results across write→mark (skips the "
                         "lineage read-back; for runs that fit executor "
                         "storage)")
    return ap


def run_job(spark, args) -> tuple[dict, int]:
    """Execute one extraction run; returns (stats, exit_code)."""
    # layered config (defaults < settings.toml [default] < [env] <
    # ENGINE_* env vars), with explicit CLI flags winning over everything
    cfg = load_config(env=args.env, config_file=args.config, overrides={
        "n_buckets": args.n_buckets,
        "shuffle_partitions": args.partitions
        or int(spark.conf.get("spark.sql.shuffle.partitions")),
        "max_docs_per_run": args.max_docs,
        "processing_mode": args.mode,
        "specific_doc_ids": tuple(x for x in args.doc_ids.split(",") if x),
        "salt_spans": args.salt or None,
        "cache_results": args.cache_results or None,
    })
    io = make_table_io(spark, args.tables)
    cp = CheckpointManager(io, cfg)

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
        # cap at BUCKET granularity — the lineage/resume unit.  A plain
        # .limit() truncates inside buckets that then get marked done,
        # permanently dropping the cut docs from every future run.
        pending = cap_to_buckets(pending, args.max_docs)

    run_id = new_run_id()
    # monotonic run ordinal from the checkpoint log: the latest-wins
    # ordering primary (wall-clock + random hex alone misorders on a
    # timestamp tie or a backwards NTP step between runs)
    run_seq = cp.next_run_seq()
    spans = explode_spans(pending.select("doc_id", "spans"))
    results = extract_spans(spans, cfg)
    results = (results
               .withColumn("bucket", bucket_col(cfg.n_buckets))
               .withColumn("run_id", F.lit(run_id))
               .withColumn("run_seq", F.lit(run_seq).cast("long"))
               .withColumn("input_fingerprint", F.lit(fingerprint))
               .withColumn("processed_at", F.current_timestamp()))

    # WRITE results, partitioned by bucket.  repartition(n_buckets, "bucket")
    # first so each touched bucket lands as ONE file per run (exactly one
    # task per bucket) — no tasks×buckets small-file explosion, and the
    # lineage re-scan + incremental reassembly below prune to exactly the
    # touched bucket directories instead of reading the whole corpus.
    # Pinning numPartitions to n_buckets (not spark.sql.shuffle.partitions)
    # keeps the write at full parallelism: the default would pack ~2 buckets
    # per task and AQE would coalesce further, idling cores during the
    # parquet-encode-heavy write stage.
    # Global metrics observed during the same action — no extra pass.
    from databricks_pdf_ocr_spark.plans.metrics import observed_results
    results, observation = observed_results(
        results.repartition(cfg.n_buckets, "bucket"))
    if cfg.cache_results:
        # the write populates the cache; the mark aggregate below then
        # reads cached partitions instead of re-scanning the table
        from pyspark.storagelevel import StorageLevel
        results = results.persist(StorageLevel.MEMORY_AND_DISK)
    t_select = time.time()
    io.append(results, RESULTS_TABLE, partition_by=["bucket"])
    t_extract = time.time()

    # ... THEN MARK lineage.  Re-scan of the just-written data is cheap:
    # partition pruning (pend_buckets semi-join) + the run_id pushed filter
    # skip every file other runs wrote, and column pruning drops the
    # payload text.  Filtering on run_id makes the per-bucket metrics
    # exact — other work sets sharing a bucket no longer inflate
    # docs_done/pages_parsed (and replayed duplicates can't occur within
    # one run, so no dedup pass is needed).
    if args.mode == "reprocess_all" and args.fail_after_buckets is None \
            and not args.max_docs:
        # every bucket is pending by construction — skip the input re-scan
        pend_list = list(range(cfg.n_buckets))
    else:
        # control-plane collect: ≤ n_buckets ints (bucket METADATA, not
        # data).  A broadcast semi-join is not enough here — dynamic
        # partition pruning declines to fire without a selective predicate
        # on the build side, so the scan would read every bucket dir; a
        # static isin over the partition column guarantees pruning.
        pend_list = sorted(
            r["bucket"] for r in pending.select("bucket").distinct().collect())
    elapsed_ms = int((time.time() - t0) * 1000)
    # exactly the columns the lineage aggregate consumes — doc counting
    # is sum(is_first_span), so neither doc_id nor result_id is read
    MARK_COLS = ("is_first_span", "sub_idx", "status", "pages_parsed",
                 "ocr_fallback", "bucket")
    if cfg.cache_results:
        # everything this run wrote is exactly the cached DataFrame
        this_run = results.select(*MARK_COLS)
    else:
        # partial explicit schema: column-prunes the scan at the READER
        # level and skips the footer-sampling schema-inference job
        mark_schema = ("run_id string, is_first_span boolean, "
                       "sub_idx int, status string, pages_parsed int, "
                       "ocr_fallback boolean, bucket int")
        this_run = (io.read(RESULTS_TABLE, schema=mark_schema)
                    .filter(F.col("bucket").isin(pend_list)
                            if pend_list else F.lit(False))
                    .filter(F.col("run_id") == run_id)
                    .select(*MARK_COLS))
    cp.mark_from_results(this_run, run_id, fingerprint, elapsed_ms,
                         run_seq=run_seq)
    if cfg.cache_results:
        results.unpersist()
    t_mark = time.time()
    print(json.dumps({"phase_select_sec": round(t_select - t0, 2),
                      "phase_extract_write_sec": round(t_extract - t_select, 2),
                      "phase_mark_sec": round(t_mark - t_extract, 2)}),
          file=sys.stderr)

    stats = {"run_id": run_id, "fingerprint": fingerprint}
    if args.media_payloads:
        stats.update(run_media_stage(
            io, cp, documents, fingerprint, cfg, args.mode,
            doc_ids=cfg.specific_doc_ids,
            fail_after_buckets=args.fail_after_buckets))
    if args.fail_after_buckets is not None:
        stats["simulated_crash"] = True
        return stats, 3

    # --- incremental reassembly: only THIS run's buckets are rebuilt ------
    # (a full-corpus reassembly per run is infeasible at 10^12 docs;
    # dynamic partition overwrite replaces exactly the touched bucket
    # partitions, leaving the rest of the extracted table untouched —
    # the parquet analogue of Iceberg overwrite-by-partition-filter)
    if not args.skip_assemble:
        # self-healing scope: this run's buckets, plus any bucket that has
        # results but no assembled partition (a prior run died after its
        # checkpoint mark but before assembly).  Rebuilding a bucket always
        # reads the FULL results table for it (partition-pruned to just
        # those bucket dirs), so partitions accumulate docs across
        # runs/fingerprints correctly.
        # explicit full schema (ADVICE r3): a mixed old/new table would be
        # footer-SAMPLED for schema — run_seq could be invisible here and
        # latest_results would silently fall back to wall-clock ordering
        from databricks_pdf_ocr_spark.schemas import RESULTS_RUN_SCHEMA
        results_all = io.read(RESULTS_TABLE, schema=RESULTS_RUN_SCHEMA)
        # assembly scope from the CHECKPOINT table (≤ runs×n_buckets tiny
        # rows), never a listing/distinct over the results corpus — at
        # 10^12 docs even a partition-column-only distinct pays the file
        # listing; with Iceberg this is the `partitions` metadata table,
        # here it's the lineage log carrying the same information.  A
        # results-committed-but-unmarked bucket (crash in the write→mark
        # window) stays pending for its input and re-enters via pend_list.
        res_list = cp.all_marked_buckets() | set(pend_list)
        ext = io.read(EXTRACTED_TABLE)
        if ext is None:
            to_assemble = sorted(res_list)
        else:
            have = {r["bucket"] for r in
                    ext.select("bucket").distinct().collect()}
            to_assemble = sorted(set(pend_list) | (res_list - have))
        # static isin on the partition column → guaranteed directory
        # pruning: only the touched bucket dirs are read for reassembly
        touched = results_all.filter(
            F.col("bucket").isin(to_assemble) if to_assemble else F.lit(False))
        # latest-run-wins per doc: a doc re-ingested with CHANGED content
        # under the same doc_id leaves old+new rows in the log; without
        # this view both versions would merge into a corrupted sequence.
        # The window needs only ClusteredDistribution(doc_id), which the
        # reassembly groupBy reuses — no extra shuffle.
        assembled = reassemble(latest_results(touched)).withColumn(
            "bucket", bucket_col(cfg.n_buckets))
        # docs count observed during the overwrite itself — never a
        # full-table count over the (10^12-doc) extracted corpus
        obs_asm = Observation("assembled")
        assembled = assembled.observe(obs_asm, F.count(F.lit(1)).alias("docs"))
        io.overwrite_partitions(assembled, EXTRACTED_TABLE, ["bucket"])
        stats["docs_assembled"] = obs_asm.get["docs"]

    # THIS run's lineage metrics (run_history(1) alone would return the
    # media stage's run when --media-payloads marked later)
    hist = [h for h in (r.asDict() for r in cp.run_history(5).collect())
            if h["run_id"] == run_id]
    if hist:
        h = hist[0]
        stats.update({k: h[k] for k in
                      ("docs_done", "pages_parsed", "ocr_fallbacks",
                       "span_count", "failed_spans")})
    try:
        stats["observed"] = observation.get
    except Exception:
        pass  # observation unavailable if the write produced no rows
    stats["elapsed_sec"] = round(time.time() - t0, 2)
    return stats, 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    spark = get_spark(app_name="extract-job",
                      shuffle_partitions=args.partitions)

    if args.split_mb:
        # compute-bound-scan granularity (see --split-mb help).  Session-level
        # runtime confs: set here in main() so in-process test sessions are
        # not mutated.  openCost drops with the split size — the default 4MB
        # per-file cost would dominate the bins for small input files and
        # re-coarsen the split count.
        spark.conf.set("spark.sql.files.maxPartitionBytes",
                       f"{args.split_mb}m")
        spark.conf.set("spark.sql.files.openCostInBytes", "1m")
        # keep AQE from coalescing the bucket-write shuffle below core
        # count — the partitioned write is parquet-encode CPU, not I/O
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")

    # steady-state warmup: spawn + import-load the Python workers and JIT the
    # JVM before the clock starts (identical at every cluster size, so the
    # throughput comparison measures the pipeline, not process spawn)
    cores = int(spark.conf.get("spark.sql.shuffle.partitions"))
    spark.range(cores * 4, numPartitions=cores).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long").count()

    stats, rc = run_job(spark, args)
    print(json.dumps(stats, default=str))
    spark.stop()
    return rc


if __name__ == "__main__":
    sys.exit(main())
