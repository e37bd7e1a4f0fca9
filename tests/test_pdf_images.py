"""Embedded-image extraction from PDFs: pdfmini.page_images + the
pdf_images operator, composed with the real JPEG/PNG codecs.

Reference analogue: ``pdf_to_images`` (``processors/ocr.py:27-57``) —
the reference rasterizes pages via PyMuPDF; this engine extracts the
embedded raster XObjects (what scanned-document pages are made of) and
hands them to the hermetic codecs.
"""

import os

import numpy as np
import pytest

from databricks_pdf_ocr_spark.functions import pdfmini, pngmini
from databricks_pdf_ocr_spark.functions.jpegmini import decode_jpeg
from databricks_pdf_ocr_spark.operators.multimodal import (
    pdf_images, resize_media,
)

KITTEN = ("/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/"
          "kittens/DP802813.jpg")


def _gray_samples(w, h):
    return bytes((x * 7 + y * 13) % 256 for y in range(h) for x in range(w))


def test_page_images_flate_gray_roundtrip():
    """Raw 8-bit gray samples come back as a lossless PNG re-wrap."""
    w, h = 12, 9
    samples = _gray_samples(w, h)
    pdf = pdfmini.write_pdf([{"image": samples, "image_format": "gray",
                              "width": w, "height": h}])
    doc = pdfmini.PdfDocument(pdf)
    imgs = doc.page_images(doc.pages()[0])
    assert len(imgs) == 1
    rec = imgs[0]
    assert rec["format"] == "png" and rec["error"] is None
    pw, ph, pc, pix = pngmini.decode_png(rec["payload"])
    assert (pw, ph, pc) == (w, h, 1) and pix == samples


@pytest.mark.skipif(not os.path.exists(KITTEN),
                    reason="Spark-distribution test JPEG not present")
def test_page_images_dct_passthrough():
    """A /DCTDecode XObject yields the byte-identical JPEG file."""
    jpeg = open(KITTEN, "rb").read()
    pdf = pdfmini.write_pdf([
        {"runs": [(72, 700, "cover page")]},
        {"image": jpeg, "image_format": "jpeg", "width": 199, "height": 313},
    ])
    doc = pdfmini.PdfDocument(pdf)
    pages = doc.pages()
    assert doc.page_images(pages[0]) == []
    rec, = doc.page_images(pages[1])
    assert rec["format"] == "jpeg" and rec["payload"] == jpeg
    w, h, c, _pix = decode_jpeg(rec["payload"])
    assert (w, h, c) == (199, 313, 3)


def test_page_images_stub_stays_loud():
    """The legacy 8x8 stub (arbitrary bytes) is raw + a reason, and the
    OCR-fallback path over Page.image_bytes is unchanged."""
    pdf = pdfmini.write_pdf([{"image": b"\x01\x02\x03notpixels"}])
    doc = pdfmini.PdfDocument(pdf)
    rec, = doc.page_images(doc.pages()[0])
    assert rec["format"] == "raw" and "unsupported sample layout" in rec["error"]
    pages = pdfmini.parse_pdf(pdf)
    assert pages[0].image_bytes == [b"\x01\x02\x03notpixels"]


@pytest.mark.skipif(not os.path.exists(KITTEN),
                    reason="Spark-distribution test JPEG not present")
def test_pdf_images_operator_composes_with_resize(spark):
    jpeg = open(KITTEN, "rb").read()
    w, h = 16, 10
    samples = _gray_samples(w, h)
    docs = [
        ("d1", pdfmini.write_pdf([
            {"runs": [(72, 700, "text only")]},
            {"image": jpeg, "image_format": "jpeg",
             "width": 199, "height": 313}])),
        ("d2", pdfmini.write_pdf([{"image": samples, "image_format": "gray",
                                   "width": w, "height": h}])),
        ("d3", b"not a pdf at all"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, content binary")
    rows = {(r["doc_id"], r["page_idx"], r["image_idx"]): r
            for r in pdf_images(df).collect()}
    assert rows[("d1", 1, 0)]["format"] == "jpeg"
    assert rows[("d1", 1, 0)]["extract_ok"]
    assert bytes(rows[("d1", 1, 0)]["content"]) == jpeg
    assert rows[("d2", 0, 0)]["format"] == "png"
    assert rows[("d3", -1, -1)]["extract_ok"] is False
    assert len(rows) == 3  # d1 page 0 has no images

    # extracted payloads feed the real resize/transcode path
    resized = {r["width"]: r for r in resize_media(
        pdf_images(df).filter("extract_ok"), max_edge=64).collect()}
    jr = resized[199]
    assert jr["resize_ok"] and jr["format"] == "jpeg"
    assert max(jr["target_width"], jr["target_height"]) == 64
    pw, ph, pc, _ = pngmini.decode_png(bytes(jr["resized"]))
    assert (pw, ph, pc) == (jr["target_width"], jr["target_height"], 3)
    pr = resized[w]
    assert pr["resize_ok"] and pr["format"] == "png"
    assert (pr["target_width"], pr["target_height"]) == (w, h)  # under cap
