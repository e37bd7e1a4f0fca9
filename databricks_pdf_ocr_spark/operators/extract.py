"""The distributed extraction operators: explode → extract → reassemble.

This is the inversion of the reference's sequential driver loop
(``processors/ocr.py:150-202``): the work set never leaves the cluster;
per-span byte work runs in an Arrow-batched ``mapInPandas`` stage on
executors; ordering is restored with built-in array functions.

Plan shape (2 shuffles, both necessary):

    scan(documents)                              -- columnar, pruned
      → posexplode(spans)                        -- doc → span fan-out (A4 inverse)
      → repartition(P, doc_id, offset)           -- SALT: spreads heavy docs'
                                                    spans uniformly; breaks the
                                                    multi-thousand-span skew the
                                                    north rule calls out
      → mapInPandas(extract_batch)               -- Arrow batches; pure-Python
                                                    pdf/html/ocr kernels per span
      → groupBy(doc_id).agg(array_sort(collect_list(struct(...))))
                                                 -- offset-sorted reassembly;
                                                    array_sort makes order
                                                    deterministic regardless of
                                                    collect_list arrival order
      → transform(..., dense renumber)           -- output offsets 0..n-1

At 100 TB: the explode+repartition keys on ``(doc_id, offset)`` so no
single reducer sees a whole heavy document during extraction; only the
final reassembly groups a doc onto one reducer, and by then payloads have
been reduced to extracted text.  AQE handles residual skew.
"""

from __future__ import annotations

import hashlib
import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from ..config import ExtractConfig
from ..schemas import RESULTS_DDL


def bucket_col(n_buckets: int, col: str = "doc_id") -> Column:
    """Checkpoint bucket: pmod(xxhash64(doc_id), n) — cheap, JVM-side,
    deterministic; the unit of lineage + resume granularity."""
    return F.pmod(F.xxhash64(F.col(col)), F.lit(n_buckets)).cast("int")


def explode_spans(documents: DataFrame) -> DataFrame:
    """(doc_id, spans[]) → one row per span.

    ``posexplode`` is the Spark-native form of the reference's per-page
    Python loop (``processors/ocr.py:110-128`` — SURVEY.md §1.2 mapping).
    The *stored* span order is untrusted (fixtures shuffle it); ``offset``
    is the authoritative order, so we drop the explode position.
    """
    offsets = F.transform("spans", lambda s: s["offset"])
    return documents.select(
        "doc_id",
        F.size("spans").cast("int").alias("total_spans"),
        # flag ONE span BEFORE the explode scatters a doc's spans across
        # partitions: downstream lineage counts documents with
        # sum(is_first) — no count-distinct Expand over all rows.
        # array_position of the min (1-based, FIRST occurrence) rather
        # than offset == min: duplicate offsets would flag several spans
        # and silently overcount docs_done (ADVICE r3).
        F.array_position(offsets, F.array_min(offsets)).alias("first_pos"),
        F.posexplode("spans").alias("pos", "span"),
    ).select(
        "doc_id",
        "total_spans",
        (F.col("pos") + 1 == F.col("first_pos")).alias("is_first"),
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def _make_extract_batch(cfg: ExtractConfig):
    """Build the mapInPandas kernel (closure over a tiny frozen config —
    safe to pickle per task)."""
    max_bytes = cfg.max_payload_bytes
    max_pages = cfg.max_pages_per_doc
    max_retries = cfg.max_retries
    backoff = cfg.retry_backoff_s
    model = cfg.ocr_model

    def extract_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # import inside the task so --py-files deployment finds the package
        from databricks_pdf_ocr_spark.functions.extract_span import extract_span

        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "result_id", "doc_id", "offset", "sub_idx", "total_spans",
                "is_first_span", "kind", "text", "media_ref", "status",
                "error_message", "ocr_fallback", "pages_parsed",
                "duration_ms", "ocr_model")}

            def emit(rid, did, off, sub, tot, first, kind, text, mref,
                     status, err, fb, pages, dur):
                out["result_id"].append(rid)
                out["doc_id"].append(did)
                out["offset"].append(off)
                out["sub_idx"].append(sub)
                out["total_spans"].append(tot)
                out["is_first_span"].append(first)
                out["kind"].append(kind)
                out["text"].append(text)
                out["media_ref"].append(mref)
                out["status"].append(status)
                out["error_message"].append(err)
                out["ocr_fallback"].append(fb)
                out["pages_parsed"].append(pages)
                out["duration_ms"].append(dur)
                out["ocr_model"].append(model)

            for did, tot, first, kind, text, mref, off in zip(
                    pdf["doc_id"], pdf["total_spans"], pdf["is_first"],
                    pdf["kind"], pdf["text"], pdf["media_ref"],
                    pdf["offset"]):
                t0 = time.perf_counter()
                text_in = None if text is None or (isinstance(text, float)) else text
                mref_in = None if mref is None or (isinstance(mref, float)) else mref
                status, err, pages, fallbacks, outputs = extract_span(
                    kind, text_in, mref_in,
                    max_payload_bytes=max_bytes, max_pages=max_pages,
                    max_retries=max_retries, retry_backoff_s=backoff)
                dur = int((time.perf_counter() - t0) * 1000)
                off = int(off); tot = int(tot); first = bool(first)
                if status == "success" and outputs:
                    n_fb_tagged = 0
                    for sub, (k, t, m) in enumerate(outputs):
                        rid = hashlib.sha256(
                            f"{did}:{off}:{sub}".encode()).hexdigest()
                        is_fb = (k == "text" and t is not None
                                 and t.startswith("[ocr] ") and n_fb_tagged < fallbacks)
                        if is_fb:
                            n_fb_tagged += 1
                        emit(rid, did, off, sub, tot, first and sub == 0,
                             k, t, m, "success", None,
                             bool(is_fb), pages if sub == 0 else 0,
                             dur if sub == 0 else 0)
                else:
                    # failed span, or success with no extractable output:
                    # exactly one bookkeeping row (error contract —
                    # reference processors/ocr.py:132-148)
                    rid = hashlib.sha256(f"{did}:{off}:0".encode()).hexdigest()
                    emit(rid, did, off, 0, tot, first, kind, None, mref_in,
                         status if status == "failed" else "empty",
                         err, False, pages, dur)
            yield pd.DataFrame(out)

    return extract_batch


def extract_spans(spans_df: DataFrame, cfg: ExtractConfig,
                  salt: bool | None = None) -> DataFrame:
    """Run the extraction kernel over span rows → flat results rows."""
    if salt is None:
        salt = cfg.salt_spans
    if salt:
        # hash-repartition on (doc_id, offset): spans of one heavy doc are
        # spread across all partitions → uniform task durations (the 4N-core
        # scaling run must not be straggler-bound — BASELINE.md protocol)
        spans_df = spans_df.repartition(cfg.shuffle_partitions,
                                        F.col("doc_id"), F.col("offset"))
    return spans_df.mapInPandas(_make_extract_batch(cfg), schema=RESULTS_DDL)


def dedup_results(results: DataFrame) -> DataFrame:
    """Dedup-on-read for rerun idempotency.

    ``result_id = sha2(doc_id:offset:sub_idx)`` is deterministic, so a
    bucket that was extracted twice (written, then the run died before the
    checkpoint mark) yields byte-identical duplicate rows — keep either.
    Spark: ``dropDuplicates`` = hash-agg on the id, partial map-side combine
    for free (vs the reference's driver-side DISTINCT-collect,
    ``processors/ocr.py:67-68``).
    """
    return results.dropDuplicates(["result_id"])


def reassemble(results: DataFrame) -> DataFrame:
    """Flat per-span results → (doc_id, spans) with dense output offsets.

    Offset-sorted span reassembly per the north rule: collect_list order is
    nondeterministic, so sort happens *inside* the array (``array_sort`` on
    structs compares fields lexicographically — (offset, sub_idx) lead), then
    a ``transform`` renumbers densely.  All JVM-side; no Python touches data.

    Rerun idempotency folds in for free: duplicate result rows from a
    crash-between-write-and-mark are byte-identical (deterministic
    result ids), so ``array_distinct`` after the sort removes them inside
    the same aggregate — no extra shuffle, unlike a result_id
    ``dropDuplicates`` upstream (which would shuffle+sort every payload a
    second time; measured as the dominant non-extraction cost in
    ``.explain``).
    """
    sortable = F.struct(
        F.col("offset"), F.col("sub_idx"),
        F.col("kind"), F.col("text"), F.col("media_ref"),
    )
    assembled = (
        results.filter(F.col("status") == "success")
        .groupBy("doc_id")
        .agg(F.array_distinct(F.array_sort(F.collect_list(sortable)))
             .alias("sorted_spans"))
        .select(
            "doc_id",
            F.transform(
                "sorted_spans",
                lambda x, i: F.struct(
                    x["kind"].alias("kind"),
                    x["text"].alias("text"),
                    x["media_ref"].alias("media_ref"),
                    i.cast("int").alias("offset"),
                ),
            ).alias("spans"),
        )
    )
    return assembled


def run_extraction(documents: DataFrame, cfg: ExtractConfig,
                   salt: bool | None = None) -> DataFrame:
    """documents → flat results (no IO; callers persist + reassemble)."""
    return extract_spans(explode_spans(documents), cfg, salt=salt)
