"""WARC (Web ARChive) source — web-crawl corpus ingestion.

Training-data pipelines consume crawl dumps as WARC segments (the
Common Crawl layout: one .warc.gz per segment, each record its own gzip
member).  This connector reads them Spark-first:

- segment files are listed/loaded with the ``binaryFile`` source — one
  task per segment.  A gzip stream is not splittable, so the unit of
  parallelism is the FILE, exactly how crawl corpora are shipped
  (thousands of ~1 GB segments → thousands of tasks);
- record fan-out (one segment → many WARC records) happens INSIDE the
  Arrow batch via ``mapInPandas`` — same shape as the PDF page fan-out,
  no driver loop, payload bytes never shuffle;
- ``warc_to_documents`` projects response records onto the engine's
  interleaved-documents input contract (html/text spans), so a crawl
  segment feeds straight into the extraction pipeline.

Format per ISO 28500 / WARC 1.1: ``WARC/1.x`` version line, CRLF header
block, ``Content-Length`` octet body, CRLF CRLF record separator.
``response`` record bodies are HTTP messages; the HTTP header block is
split off and the entity body decoded by Content-Type.  Pure stdlib
(gzip + text parsing); malformed records become error rows — the
pipeline-continues contract.

Validation: ``tests/test_warc_source.py`` round-trips against this
module's own spec-conformant writer (per-record gzip members and plain
concatenation), asserts header/body parsing on hand-built records, and
drives a segment end-to-end into the extraction pipeline.
"""

from __future__ import annotations

import gzip
import hashlib
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

#: columns of the record table (one row per WARC record)
WARC_RECORD_DDL = (
    "segment string, record_id string, warc_type string, target_uri string, "
    "warc_date string, content_type string, http_status int, "
    "http_content_type string, payload binary, parse_ok boolean, "
    "error_message string"
)


class WarcError(ValueError):
    """Malformed WARC stream."""


def _gunzip_all(data: bytes) -> bytes:
    """Concatenate every gzip member (the Common Crawl per-record layout
    is a multi-member stream; ``gzip.decompress`` already consumes all
    members)."""
    return gzip.decompress(data)


def parse_warc(data: bytes) -> Iterator[dict]:
    """Yield ``{headers: dict, body: bytes}`` per record.

    Accepts plain or gzip (single- or multi-member) streams.
    """
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_all(data)
    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise WarcError("unterminated WARC header block")
        lines = data[pos:hdr_end].split(b"\r\n")
        if not lines[0].startswith(b"WARC/"):
            raise WarcError(f"bad WARC version line {lines[0][:20]!r}")
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(b":")
            headers[k.decode("latin-1").strip().lower()] = \
                v.decode("latin-1").strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise WarcError("missing/invalid Content-Length") from None
        body_start = hdr_end + 4
        if body_start + length > n:
            raise WarcError("record body overruns the stream")
        yield {"headers": headers,
               "body": data[body_start:body_start + length]}
        pos = body_start + length


def split_http(body: bytes) -> tuple[int | None, str | None, bytes]:
    """HTTP response message → (status, content-type, entity body)."""
    sep = body.find(b"\r\n\r\n")
    if sep < 0 or not body[:5].startswith(b"HTTP/"):
        return None, None, body
    head = body[:sep].split(b"\r\n")
    try:
        status = int(head[0].split()[1])
    except (IndexError, ValueError):
        status = None
    ctype = None
    for ln in head[1:]:
        k, _, v = ln.partition(b":")
        if k.decode("latin-1").strip().lower() == "content-type":
            ctype = v.decode("latin-1").strip()
            break
    return status, ctype, body[sep + 4:]


def read_warc_segments(spark: SparkSession, path: str,
                       glob: str = "*.warc.gz") -> DataFrame:
    """Segment files → one row per WARC record (WARC_RECORD_DDL).

    Plan: binaryFile scan (one task per segment — gzip is unsplittable,
    segments are the shipped parallelism unit) → narrow ``mapInPandas``
    with in-batch record fan-out.
    """
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", glob).load(path)
             .select("path", "content"))
    return warc_records(files)


def warc_records(files: DataFrame, path_col: str = "path",
                 content_col: str = "content") -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "segment", "record_id", "warc_type", "target_uri",
                "warc_date", "content_type", "http_status",
                "http_content_type", "payload", "parse_ok",
                "error_message")}

            def emit(seg, rid, wtype, uri, date, ctype, status, hct,
                     payload, ok, err):
                out["segment"].append(seg)
                out["record_id"].append(rid)
                out["warc_type"].append(wtype)
                out["target_uri"].append(uri)
                out["warc_date"].append(date)
                out["content_type"].append(ctype)
                out["http_status"].append(status)
                out["http_content_type"].append(hct)
                out["payload"].append(payload)
                out["parse_ok"].append(ok)
                out["error_message"].append(err)

            for seg, data in zip(pdf[path_col], pdf[content_col]):
                data = bytes(data) if data is not None else b""
                try:
                    for rec in parse_warc(data):
                        h = rec["headers"]
                        body = rec["body"]
                        status = hct = None
                        if h.get("warc-type") == "response":
                            status, hct, body = split_http(body)
                        emit(seg, h.get("warc-record-id"),
                             h.get("warc-type"),
                             h.get("warc-target-uri"),
                             h.get("warc-date"),
                             h.get("content-type"), status, hct,
                             body, True, None)
                except Exception as e:   # truncated/corrupt segment tail
                    emit(seg, None, None, None, None, None, None, None,
                         None, False, f"{type(e).__name__}: {e}")
            yield pd.DataFrame(out)

    return files.mapInPandas(run, schema=WARC_RECORD_DDL)


def warc_to_documents(records: DataFrame) -> DataFrame:
    """Response records → the engine's interleaved-documents contract:
    ``(doc_id, spans)`` with one html/text span per page, ready for the
    extraction pipeline.  doc_id = sha256(target_uri) (stable across
    recrawls → the checkpoint/latest-wins machinery handles re-ingests);
    non-2xx and non-text responses are filtered out — the standard crawl
    curation gate.
    """
    from pyspark.sql import functions as F

    text_like = (F.col("http_content_type").rlike("(?i)^text/(html|plain)")
                 & F.col("parse_ok")
                 & (F.col("warc_type") == "response")
                 & F.col("http_status").between(200, 299))
    kind = F.when(F.col("http_content_type").rlike("(?i)html"),
                  F.lit("html")).otherwise(F.lit("text"))
    return (records.filter(text_like)
            .select(
                F.sha2(F.col("target_uri"), 256).alias("doc_id"),
                F.array(F.struct(
                    kind.alias("kind"),
                    # crawl bodies are bytes; decode as UTF-8 (lossy)
                    F.decode(F.col("payload"), "UTF-8").alias("text"),
                    F.lit(None).cast("string").alias("media_ref"),
                    F.lit(0).alias("offset"))).alias("spans")))


# ---------------------------------------------------------------------------
# Writer (test fixture generator — spec-conformant WARC 1.1)
# ---------------------------------------------------------------------------

def write_warc(records: list[dict], gzip_per_record: bool = True) -> bytes:
    """records: ``[{type, uri, body, http_content_type?, status?}]`` →
    WARC bytes (per-record gzip members when ``gzip_per_record``, the
    Common Crawl layout; else one plain stream)."""
    out = io.BytesIO()
    for i, r in enumerate(records):
        body = r["body"]
        if r.get("type", "response") == "response":
            status = r.get("status", 200)
            hct = r.get("http_content_type", "text/html")
            body = (f"HTTP/1.1 {status} OK\r\n"
                    f"Content-Type: {hct}\r\n"
                    f"Content-Length: {len(body)}\r\n\r\n"
                    ).encode() + body
        rid = "<urn:uuid:" + hashlib.sha256(
            f"{i}:{r.get('uri')}".encode()).hexdigest()[:32] + ">"
        hdr = (f"WARC/1.1\r\n"
               f"WARC-Type: {r.get('type', 'response')}\r\n"
               f"WARC-Record-ID: {rid}\r\n"
               f"WARC-Date: 2026-01-01T00:00:00Z\r\n"
               + (f"WARC-Target-URI: {r['uri']}\r\n" if r.get("uri") else "")
               + f"Content-Type: application/http; msgtype=response\r\n"
               f"Content-Length: {len(body)}\r\n\r\n").encode()
        rec = hdr + body + b"\r\n\r\n"
        out.write(gzip.compress(rec) if gzip_per_record else rec)
    return out.getvalue()
