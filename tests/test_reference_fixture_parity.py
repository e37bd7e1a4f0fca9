"""Parity demo: the reference repo's real fixture PDF
(/root/reference/fixtures/sample.pdf — 4-page, RC4-encrypted PDF 1.3)
through the FULL Spark pipeline: binary ingest projection → interleaved
document → Arrow-batched extraction → offset-sorted reassembly.

The reference's integration test asserts structural markers in the
OCR-extracted text of this file (tests/integration/test_ocr_integration.py:
69-85); we assert the tokenizer-extracted equivalents.
"""

import base64

import pytest
from pyspark.sql import functions as F

from databricks_pdf_ocr_spark.config import ExtractConfig
from databricks_pdf_ocr_spark.operators.extract import reassemble, run_extraction

SAMPLE = "/root/reference/fixtures/sample.pdf"


def test_reference_sample_pdf_end_to_end(spark):
    try:
        raw = open(SAMPLE, "rb").read()
    except OSError:
        pytest.skip("reference fixture unavailable")

    docs = spark.createDataFrame(
        [("sample", [{"kind": "pdf",
                      "text": base64.b64encode(raw).decode(),
                      "media_ref": None, "offset": 0}])],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>")
    cfg = ExtractConfig()  # default 50MB guard, like the reference
    assembled = reassemble(run_extraction(docs, cfg)).collect()
    assert len(assembled) == 1
    spans = assembled[0]["spans"]
    texts = [s["text"] for s in spans if s["kind"] == "text"]
    media = [s["media_ref"] for s in spans if s["kind"] == "media"]
    assert len(texts) == 4, "one text span per page, in page order"
    # the sample's embedded raster images surface as addressable media
    # spans (content-addressed refs into the media_payloads table)
    assert media and all(m.startswith("pdfimg:") for m in media)
    # page-order invariant (reference: page_number 1-based document order)
    for i, t in enumerate(texts):
        assert f"Page {i + 1} of 4" in t
    # content markers the reference's integration test looks for in its
    # extracted markdown (headings/bookmark structure)
    assert "PDF" in texts[0] and "Sample" in texts[0]
    assert any("bookmark" in t.lower() for t in texts)


def test_reference_sample_pdf_binaryfile_scan(spark):
    """The reference's autoloader projection over the actual fixture file
    (S1/P1/P2 composition on real bytes)."""
    try:
        open(SAMPLE, "rb").close()
    except OSError:
        pytest.skip("reference fixture unavailable")
    from databricks_pdf_ocr_spark.streaming.ingest import project_source_rows
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.pdf")
             .load("/root/reference/fixtures"))
    rows = project_source_rows(files).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["file_name"] == "sample.pdf"
    assert r["file_size"] == 88226  # BASELINE.md: 88,226-byte fixture
    import hashlib
    assert r["content_hash"] == hashlib.sha256(
        open(SAMPLE, "rb").read()).hexdigest()