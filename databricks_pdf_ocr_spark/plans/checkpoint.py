"""Per-partition checkpoint lineage + idempotent resume.

North-rule mandate: "resumable from checkpoint with per-partition lineage +
metrics".  Reference analogues: the run-state table
(``managers/state.py:22-73`` — one row per *run*) and the streaming
checkpoint (``handlers/autoloader.py:104``); this module generalizes both
to **bucket granularity**: work is hashed into
``pmod(xxhash64(doc_id), n_buckets)`` buckets, each bucket gets a lineage
row with extraction metrics when its results land, and a restarted run
anti-joins pending work against done buckets.

Write-then-mark ordering gives crash safety: results for a bucket are
committed *before* the bucket is marked done, so a crash between the two
re-extracts that bucket; deterministic ``result_id``s make the rerun
byte-identical and ``dedup_results`` collapses duplicates on read
(SURVEY.md §4.2.3).  No overwrite-in-place anywhere — the reference's
full-table-rewrite update (``managers/state.py:64-73``) is replaced by an
append-only log + latest-wins reads.
"""

from __future__ import annotations

import secrets

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import ExtractConfig
from ..operators.extract import bucket_col
from ..schemas import CHECKPOINT_SCHEMA
from ..sources.tables import TableIO

CHECKPOINT_TABLE = "extraction_checkpoint"


def new_run_id() -> str:
    return "run-" + secrets.token_hex(8)


class CheckpointManager:
    def __init__(self, io: TableIO, cfg: ExtractConfig):
        self.io = io
        self.cfg = cfg
        self.spark: SparkSession = io.spark

    # -- read side ---------------------------------------------------------

    def _read_checkpoint(self) -> DataFrame | None:
        """All checkpoint reads pass the explicit schema (ADVICE r3): a
        table holding pre-run_seq files plus new ones would otherwise be
        footer-SAMPLED for schema — run_seq could be invisible and
        next_run_seq would restart at 1, stamping a regressed ordinal
        that makes latest_results revive an old run.  With the explicit
        schema, old files yield run_seq=null and max() ignores them."""
        return self.io.read(CHECKPOINT_TABLE, schema=CHECKPOINT_SCHEMA)

    def done_buckets(self, input_fingerprint: str) -> DataFrame:
        """Distinct buckets already marked done for this work set."""
        cp = self._read_checkpoint()
        if cp is None:
            return self.spark.createDataFrame([], "bucket int")
        return (cp.filter((F.col("input_fingerprint") == input_fingerprint)
                          & (F.col("status") == "done"))
                  .select("bucket").distinct())

    def filter_pending(self, documents: DataFrame,
                       input_fingerprint: str) -> DataFrame:
        """documents (+bucket col) minus docs in done buckets.

        The done-bucket set is ≤ n_buckets rows → **broadcast left_anti**
        join: no shuffle of the (huge) documents side, the scale-correct
        replacement for the reference's collect-then-isin anti-pattern
        (``processors/ocr.py:67-70``, SURVEY.md §2.2 P3).
        """
        with_bucket = documents.withColumn(
            "bucket", bucket_col(self.cfg.n_buckets))
        done = self.done_buckets(input_fingerprint)
        return with_bucket.join(F.broadcast(done), "bucket", "left_anti")

    def next_run_seq(self) -> int:
        """Monotonic run ordinal: 1 + the max sequence ever recorded.

        Wall-clock (``processed_at``) + random run-id hex is NOT a safe
        latest-wins ordering — an NTP step between runs, or a timestamp
        tie, would pick the "latest" run arbitrarily and silently revive a
        stale doc version in reassembly.  The checkpoint table is the
        engine's one durable, totally-ordered record of runs, so its max
        ordinal + 1 is the authoritative next sequence (control-plane
        aggregate over the tiny lineage table).
        """
        cp = self._read_checkpoint()
        if cp is None:
            return 1
        mx = cp.agg(F.max("run_seq")).first()[0]
        return int(mx or 0) + 1

    def all_marked_buckets(self) -> set[int]:
        """Distinct buckets with any lineage mark, across fingerprints —
        the assembly-scope source (≤ n_buckets ints from the tiny
        checkpoint table; never a listing/scan over the results corpus).
        A bucket whose results committed but whose mark didn't (crash in
        the write→mark window) is still *pending* for its input, so the
        resume run re-extracts it and carries it in pend_list instead."""
        cp = self._read_checkpoint()
        if cp is None:
            return set()
        return {r["bucket"] for r in cp.select("bucket").distinct().collect()}

    def run_history(self, k: int = 10) -> DataFrame:
        """Latest runs with aggregate metrics (reference:
        ``managers/state.py:106-132`` orderBy+limit top-k)."""
        cp = self._read_checkpoint()
        if cp is None:
            return self.spark.createDataFrame([], CHECKPOINT_SCHEMA)
        return (cp.groupBy("run_id")
                  .agg(F.max("updated_at").alias("run_timestamp"),
                       F.count("*").alias("buckets_done"),
                       F.sum("docs_done").alias("docs_done"),
                       F.sum("pages_parsed").alias("pages_parsed"),
                       F.sum("ocr_fallbacks").alias("ocr_fallbacks"),
                       F.sum("span_count").alias("span_count"),
                       F.sum("failed_spans").alias("failed_spans"))
                  .orderBy(F.desc("run_timestamp"))
                  .limit(k))

    def compact(self) -> dict:
        """Rewrite the append-only lineage log to a latest-wins snapshot:
        one row per ``(input_fingerprint, bucket)`` — the highest
        ``run_seq`` mark (VERDICT r3 #6).

        The log grows runs × n_buckets rows forever; ``next_run_seq`` and
        ``all_marked_buckets`` scan it every run, so a years-running
        deployment compacts periodically (``jobs/status.py
        --compact-checkpoint``).  Every reader's contract survives: done
        buckets per fingerprint, the distinct-marked-bucket set, the
        global max run_seq (its row is by definition the latest for its
        own key), and the newest config per fingerprint all live in the
        kept rows.  What compaction drops is superseded runs' HISTORY —
        ``run_history`` afterwards shows only surviving marks.

        Commit: the snapshot is fully written to a staging table first,
        then swapped in (``TableIO.replace_table`` — directory-rename hop
        for parquet, catalog-atomic createOrReplace for Iceberg).
        """
        from .state_views import latest_per_key

        cp = self._read_checkpoint()
        if cp is None:
            return {"rows_before": 0, "rows_after": 0}
        rows_before = cp.count()
        snap = latest_per_key(
            cp, ["input_fingerprint", "bucket"],
            [F.desc("run_seq"), F.desc("updated_at"), F.desc("run_id")])
        staging = CHECKPOINT_TABLE + "__compacting"
        self.io.drop(staging)
        self.io.overwrite(snap, staging)      # materialized BEFORE the swap
        rows_after = self.io.read(staging, schema=CHECKPOINT_SCHEMA).count()
        self.io.replace_table(staging, CHECKPOINT_TABLE)
        return {"rows_before": int(rows_before), "rows_after": int(rows_after)}

    # -- write side --------------------------------------------------------

    def mark_from_results(self, results: DataFrame, run_id: str,
                          input_fingerprint: str, duration_ms: int,
                          run_seq: int | None = None) -> None:
        """Aggregate per-bucket metrics from a results DataFrame and append
        one 'done' lineage row per bucket.

        The aggregate runs distributed (map-side partial agg → tiny
        shuffle); the ≤ n_buckets result rows are CONTROL-PLANE data, so
        they're collected and appended driver-side (``io.append_rows``) —
        a Spark parquet write job costs ~1-2 s of fixed committer overhead
        even for 64 rows, pure tax on the job's critical path."""
        if run_seq is None:
            run_seq = self.next_run_seq()
        if "bucket" not in results.columns:
            results = results.withColumn("bucket",
                                         bucket_col(self.cfg.n_buckets))
        metrics = (
            results
            .groupBy("bucket")
            .agg(
                # exactly one is_first_span row per document (min-offset
                # span, sub_idx 0) — an exact doc count as a plain SUM,
                # no count-distinct Expand pass over every results row
                F.sum(F.col("is_first_span").cast("long")).alias("docs_done"),
                # every input span emits exactly ONE sub_idx==0 row (success
                # fan-out starts at 0; failed/empty emit a single 0 row), so
                # this counts input spans without a second count-distinct
                # Expand pass
                F.sum((F.col("sub_idx") == 0).cast("long")).alias("spans_in"),
                F.sum("pages_parsed").cast("long").alias("pages_parsed"),
                F.sum(F.col("ocr_fallback").cast("long")).alias("ocr_fallbacks"),
                F.sum((F.col("status") == "success").cast("long")).alias("span_count"),
                F.sum((F.col("status") == "failed").cast("long")).alias("failed_spans"),
            )
        )
        from datetime import datetime, timezone
        now = datetime.now(timezone.utc)
        rows = [{
            "run_id": run_id,
            "run_seq": int(run_seq),
            "input_fingerprint": input_fingerprint,
            "bucket": int(r["bucket"]),
            "status": "done",
            "docs_done": int(r["docs_done"] or 0),
            "spans_in": int(r["spans_in"] or 0),
            "pages_parsed": int(r["pages_parsed"] or 0),
            "ocr_fallbacks": int(r["ocr_fallbacks"] or 0),
            "span_count": int(r["span_count"] or 0),
            "failed_spans": int(r["failed_spans"] or 0),
            "duration_ms": int(duration_ms),
            "config_json": self.cfg.to_json(),
            "updated_at": now,
        } for r in metrics.collect()]   # ≤ n_buckets control-plane rows
        self.io.append_rows(rows, CHECKPOINT_TABLE, CHECKPOINT_SCHEMA)

    def mark_buckets(self, bucket_metrics: list[dict], run_id: str,
                     input_fingerprint: str, duration_ms: int,
                     run_seq: int | None = None) -> None:
        """Append 'done' lineage rows from driver-computed per-bucket
        metric dicts (``{"bucket": int, ...CHECKPOINT metric fields}``,
        missing metrics default 0) — for stages whose metrics don't come
        results-shaped, e.g. the media-payloads stage.  Same write-then-
        mark contract: callers commit the stage's data FIRST."""
        if not bucket_metrics:
            return
        if run_seq is None:
            run_seq = self.next_run_seq()
        from datetime import datetime, timezone
        now = datetime.now(timezone.utc)
        zero = ("docs_done", "spans_in", "pages_parsed", "ocr_fallbacks",
                "span_count", "failed_spans")
        rows = [{
            "run_id": run_id,
            "run_seq": int(run_seq),
            "input_fingerprint": input_fingerprint,
            "bucket": int(m["bucket"]),
            "status": "done",
            **{k: int(m.get(k, 0) or 0) for k in zero},
            "duration_ms": int(duration_ms),
            "config_json": self.cfg.to_json(),
            "updated_at": now,
        } for m in bucket_metrics]
        self.io.append_rows(rows, CHECKPOINT_TABLE, CHECKPOINT_SCHEMA)
