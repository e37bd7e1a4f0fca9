"""Baseline JPEG encoder: round-trip bounds through this repo's decoder
and pixel agreement between TWO independent decoders (jpegmini + JVM
ImageIO) on the encoder's own bitstream — if the bitstream violated
T.81, the decoders would not both accept it, let alone agree."""

import numpy as np
import pytest

from databricks_pdf_ocr_spark.functions import jpegenc
from databricks_pdf_ocr_spark.functions.jpegmini import JPEG_SIG, decode_jpeg


def _test_image(w=37, h=29):
    """Gradient + block edges + a saturated patch, non-multiple-of-8."""
    rgb = bytearray(w * h * 3)
    for y in range(h):
        for x in range(w):
            o = (y * w + x) * 3
            rgb[o] = (x * 7) % 256
            rgb[o + 1] = (y * 9) % 256
            rgb[o + 2] = 250 if (x // 9 + y // 7) % 2 else 30
    return bytes(rgb), w, h


def test_roundtrip_through_own_decoder():
    rgb, w, h = _test_image()
    data = jpegenc.encode_jpeg(rgb, w, h, quality=92)
    assert data[:2] == JPEG_SIG and data[-2:] == b"\xff\xd9"
    dw, dh, dc, pix = decode_jpeg(data)
    assert (dw, dh, dc) == (w, h, 3)
    d = np.abs(np.frombuffer(rgb, np.uint8).astype(int)
               - np.frombuffer(pix, np.uint8).astype(int))
    assert d.mean() <= 4 and d.max() <= 40    # q92 with hard edges


def test_quality_knob_trades_size_for_error():
    rgb, w, h = _test_image()
    lo = jpegenc.encode_jpeg(rgb, w, h, quality=30)
    hi = jpegenc.encode_jpeg(rgb, w, h, quality=95)
    assert len(lo) < len(hi)
    src = np.frombuffer(rgb, np.uint8).astype(int)

    def err(data):
        return np.abs(src - np.frombuffer(decode_jpeg(data)[3],
                                          np.uint8).astype(int)).mean()
    assert err(hi) < err(lo)


def test_determinism_and_dimension_guard():
    rgb, w, h = _test_image(16, 8)
    assert jpegenc.encode_jpeg(rgb, w, h) == jpegenc.encode_jpeg(rgb, w, h)
    with pytest.raises(ValueError):
        jpegenc.encode_jpeg(rgb[:10], w, h)
    with pytest.raises(ValueError):
        jpegenc.encode_jpeg(rgb, w, h, quality=0)


def test_two_independent_decoders_agree_on_our_bitstream(spark):
    """JVM ImageIO and jpegmini decode the SAME encoder output; at 4:4:4
    the only legal divergence is IDCT rounding."""
    rgb, w, h = _test_image(48, 32)
    data = jpegenc.encode_jpeg(rgb, w, h, quality=88)

    _dw, _dh, _dc, pix = decode_jpeg(data)
    mine = np.frombuffer(pix, np.uint8).reshape(h, w, 3).astype(int)

    jvm = spark.sparkContext._jvm
    img = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(data))
    assert img is not None, "ImageIO rejected the bitstream"
    assert img.getWidth() == w and img.getHeight() == h
    gt = np.zeros((h, w, 3), dtype=int)
    for y in range(h):
        for x in range(w):
            argb = img.getRGB(x, y)
            gt[y, x] = ((argb >> 16) & 0xFF, (argb >> 8) & 0xFF,
                        argb & 0xFF)
    d = np.abs(mine - gt)
    assert d.mean() <= 0.5, f"meanAbs {d.mean():.3f}"
    assert d.max() <= 4, f"max {d.max()}"
