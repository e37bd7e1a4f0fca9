"""WARC source: parse/round-trip, Common Crawl gzip layout, HTTP split,
error contract, and segment → documents → extraction composition."""

import gzip

import pytest
from pyspark.sql import functions as F

from databricks_pdf_ocr_spark.sources import warc


def _records():
    return [
        {"type": "response", "uri": "http://a.example/x",
         "body": b"<html><body><p>hello crawl</p></body></html>",
         "http_content_type": "text/html; charset=utf-8"},
        {"type": "response", "uri": "http://b.example/robots.txt",
         "body": b"plain text body here",
         "http_content_type": "text/plain"},
        {"type": "response", "uri": "http://c.example/404",
         "body": b"gone", "status": 404,
         "http_content_type": "text/html"},
        {"type": "response", "uri": "http://d.example/img",
         "body": b"\x89PNG fake", "http_content_type": "image/png"},
        {"type": "warcinfo", "uri": None, "body": b"software: test\r\n"},
    ]


@pytest.mark.parametrize("gz", [True, False])
def test_parse_roundtrip(gz):
    data = warc.write_warc(_records(), gzip_per_record=gz)
    if gz:
        assert data[:2] == b"\x1f\x8b"
    recs = list(warc.parse_warc(data))
    assert len(recs) == 5
    assert recs[0]["headers"]["warc-type"] == "response"
    assert recs[0]["headers"]["warc-target-uri"] == "http://a.example/x"
    status, ctype, body = warc.split_http(recs[0]["body"])
    assert status == 200 and ctype.startswith("text/html")
    assert body == b"<html><body><p>hello crawl</p></body></html>"
    assert recs[4]["headers"]["warc-type"] == "warcinfo"


def test_multi_member_gzip_is_commoncrawl_layout():
    data = warc.write_warc(_records()[:2], gzip_per_record=True)
    # each record is its OWN gzip member: decompressing only the first
    # member's bytes yields exactly one record
    buf = gzip.GzipFile(fileobj=__import__("io").BytesIO(data))
    first = buf.read()
    assert first.count(b"WARC/1.1") >= 1


def test_error_contract():
    with pytest.raises(warc.WarcError, match="version"):
        list(warc.parse_warc(b"NOPE/1.0\r\n\r\n"))
    data = warc.write_warc(_records()[:1], gzip_per_record=False)
    with pytest.raises(warc.WarcError, match="overruns"):
        list(warc.parse_warc(data[:-30]))


def test_segment_to_documents_to_extraction(spark, tmp_path):
    """End-to-end: .warc.gz segments → record table → documents contract
    → the real extraction pipeline (html block extraction)."""
    seg_dir = tmp_path / "segs"
    seg_dir.mkdir()
    (seg_dir / "seg-00000.warc.gz").write_bytes(warc.write_warc(_records()))
    (seg_dir / "seg-00001.warc.gz").write_bytes(warc.write_warc([
        {"type": "response", "uri": "http://e.example/y",
         "body": b"<html><h1>Title</h1><p>para one</p></html>",
         "http_content_type": "text/html"}]))
    (seg_dir / "seg-trunc.warc.gz").write_bytes(
        warc.write_warc(_records()[:1])[:-10])  # corrupt tail → error row

    recs = warc.read_warc_segments(spark, str(seg_dir))
    by_type = {(r["warc_type"], r["parse_ok"]) for r in recs.collect()}
    assert ("response", True) in by_type and ("warcinfo", True) in by_type
    assert (None, False) in by_type                 # the corrupt segment
    ok = recs.filter("parse_ok")
    assert ok.filter(F.col("http_status") == 404).count() == 1

    docs = warc.warc_to_documents(recs)
    got = {r["doc_id"]: r["spans"] for r in docs.collect()}
    # 2xx text/html+text/plain only: a.example, b.example, e.example
    assert len(got) == 3
    kinds = {s["kind"] for spans in got.values() for s in spans}
    assert kinds == {"html", "text"}

    # straight into the extraction pipeline
    from databricks_pdf_ocr_spark.config import TEST_CONFIG
    from databricks_pdf_ocr_spark.operators.extract import (
        reassemble, run_extraction,
    )
    assembled = {r["doc_id"]: [s["text"] for s in r["spans"]]
                 for r in reassemble(
                     run_extraction(docs, TEST_CONFIG)).collect()}
    texts = [t for ts in assembled.values() for t in ts]
    assert any("hello crawl" in t for t in texts)
    assert any("para one" in t for t in texts)
    assert any("plain text body here" in t for t in texts)
