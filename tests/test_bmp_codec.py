"""BMP codec: encoder/decoder round-trips, hand-built spec vectors for
the palette/bitfields/RLE legs, byte-exact parity with JVM ImageIO
(BMP is lossless, so the gate is equality — unlike the JPEG rounding
band), garbage totality, and operator wiring through ``decode_media`` /
``resize_media``."""

import random
import struct

import numpy as np
import pytest

from databricks_pdf_ocr_spark.functions import bmpmini
from databricks_pdf_ocr_spark.functions.bmpmini import (
    BmpError, bmp_meta, decode_bmp, encode_bmp, encode_bmp_indexed,
    looks_like_bmp,
)
from databricks_pdf_ocr_spark.operators import multimodal


def _rand_pix(w, h, channels, seed=0):
    rng = random.Random(f"bmp:{seed}:{w}:{h}:{channels}")
    return bytes(rng.randrange(256) for _ in range(w * h * channels))


def _file(dib: bytes, tail: bytes, pix_off_extra: int = 0) -> bytes:
    off = 14 + len(dib) + pix_off_extra
    return struct.pack("<2sIHHI", b"BM", off + len(tail), 0, 0, off) \
        + dib + tail


def _info_header(w, h, bpp, comp=0, colors=0) -> bytes:
    return struct.pack("<IiihHIIiiII", 40, w, h, 1, bpp, comp, 0,
                       2835, 2835, colors, 0)


# ---------------------------------------------------------------------------
# round-trips through our own encoder
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("w,h", [(1, 1), (7, 5), (16, 16), (33, 2)])
def test_rgb24_roundtrip(w, h):
    pix = _rand_pix(w, h, 3)
    data = encode_bmp(pix, w, h, 3)
    assert looks_like_bmp(data)
    assert decode_bmp(data) == (w, h, 3, pix)
    assert bmp_meta(data) == {"width": w, "height": h, "bpp": 24,
                              "compression": 0, "top_down": False}


@pytest.mark.parametrize("w,h", [(1, 1), (7, 5), (12, 9)])
def test_rgba32_roundtrip(w, h):
    pix = _rand_pix(w, h, 4, seed=1)
    data = encode_bmp(pix, w, h, 4)
    assert looks_like_bmp(data)
    assert decode_bmp(data) == (w, h, 4, pix)  # alpha mask honored


def test_indexed8_roundtrip():
    w, h = 11, 6
    rng = random.Random("bmp-idx")
    pal = [(rng.randrange(256), rng.randrange(256), rng.randrange(256))
           for _ in range(7)]
    idx = bytes(rng.randrange(7) for _ in range(w * h))
    data = encode_bmp_indexed(idx, pal, w, h)
    dw, dh, dc, dp = decode_bmp(data)
    assert (dw, dh, dc) == (w, h, 3)
    assert dp == b"".join(bytes(pal[i]) for i in idx)


def test_encoder_input_validation():
    with pytest.raises(BmpError):
        encode_bmp(b"\x00" * 10, 2, 2, 3)            # wrong buffer size
    with pytest.raises(BmpError):
        encode_bmp(b"\x00" * 8, 2, 2, 2)             # bad channel count
    with pytest.raises(BmpError):
        encode_bmp_indexed(b"\x05", [(0, 0, 0)], 1, 1)  # index out of range


# ---------------------------------------------------------------------------
# hand-built spec vectors
# ---------------------------------------------------------------------------

def test_16bpp_default_555():
    w, h = 3, 2
    vals = [0x7C00, 0x03E0, 0x001F,      # image row 0: pure R, G, B
            0x7FFF, 0x0000, 0x4210]      # image row 1: white, black, gray16
    stride = ((16 * w + 31) // 32) * 4
    rows = b""
    for y in range(h - 1, -1, -1):       # bottom-up file order
        r = b"".join(struct.pack("<H", vals[y * w + x]) for x in range(w))
        rows += r + b"\x00" * (stride - len(r))
    px = np.frombuffer(decode_bmp(_file(_info_header(w, h, 16), rows))[3],
                       np.uint8).reshape(h, w, 3)
    assert [tuple(px[0, i]) for i in range(3)] == \
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)]
    # (16*255 + 15) // 31 == 132: round-half-up component scaling
    assert [tuple(px[1, i]) for i in range(3)] == \
        [(255, 255, 255), (0, 0, 0), (132, 132, 132)]


def test_16bpp_bitfields_565():
    w, h = 2, 1
    vals = [0xF800, 0x07E0]              # pure R, pure G in 565
    rows = struct.pack("<HH", *vals) + b"\x00" * 4  # pad stride 8
    dib = _info_header(w, h, 16, comp=bmpmini.BI_BITFIELDS)
    masks = struct.pack("<III", 0xF800, 0x07E0, 0x001F)
    data = _file(dib + masks, rows)
    px = np.frombuffer(decode_bmp(data)[3], np.uint8).reshape(1, w, 3)
    assert tuple(px[0, 0]) == (255, 0, 0)
    assert tuple(px[0, 1]) == (0, 255, 0)


def test_1bpp_and_4bpp_raw():
    # 1 bpp, 10 px wide: MSB-first bit unpack + 4-byte row padding
    w, h = 10, 2
    rows = bytes([0b10110000, 0b01000000, 0, 0]) + \
        bytes([0b11111111, 0b11000000, 0, 0])
    pal = struct.pack("<BBBB", 0, 0, 0, 0) + \
        struct.pack("<BBBB", 255, 255, 255, 0)     # 0=black, 1=white (BGRX)
    data = _file(_info_header(w, h, 1, colors=2) + pal, rows)
    px = np.frombuffer(decode_bmp(data)[3], np.uint8).reshape(h, w, 3)
    assert all(tuple(px[0, x]) == (255, 255, 255) for x in range(w))
    assert [px[1, x, 0] for x in range(4)] == [255, 0, 255, 255]

    # 4 bpp raw: two pixels per byte, high nibble first
    w4 = 3
    pal4 = b"".join(struct.pack("<BBBB", i * 4, i * 8, i * 12, 0)
                    for i in range(16))
    rows4 = bytes([0x12, 0x30, 0, 0])              # pixels 1,2,3 + pad
    data4 = _file(_info_header(w4, 1, 4, colors=16) + pal4, rows4)
    px4 = np.frombuffer(decode_bmp(data4)[3], np.uint8).reshape(1, w4, 3)
    # palette entries are stored BGRX → RGB is (blue*12, green*8, red*4)
    assert [tuple(px4[0, i]) for i in range(3)] == \
        [(12, 8, 4), (24, 16, 8), (36, 24, 12)]


def test_top_down_and_core_header():
    # negative height = top-down row order (no flip)
    w, h = 2, 2
    rows = bytes([10, 20, 30, 40, 50, 60, 0, 0]) + \
        bytes([70, 80, 90, 100, 110, 120, 0, 0])
    data = _file(_info_header(w, -h, 24), rows)
    assert bmp_meta(data)["top_down"] is True
    px = np.frombuffer(decode_bmp(data)[3], np.uint8).reshape(h, w, 3)
    assert tuple(px[0, 0]) == (30, 20, 10)         # first file row on top

    # BITMAPCOREHEADER (OS/2): 12-byte DIB, 3-byte palette entries
    core = struct.pack("<IHHHH", 12, 1, 1, 1, 8)
    pal = bytes([1, 2, 3] * 256)                   # BGR triplets
    data2 = _file(core + pal, bytes([0, 0, 0, 0]))
    assert decode_bmp(data2) == (1, 1, 3, bytes([3, 2, 1]))


def test_rle8_runs_absolute_delta_eob():
    w, h = 8, 3
    pal = b"".join(struct.pack("<BBBB", i, i, i, 0) for i in range(256))
    stream = bytes([
        4, 7,                 # run: 4 px of index 7
        0, 3, 1, 2, 3, 0,     # absolute: 3 px (1,2,3) + pad byte
        1, 9,                 # run: 1 px of index 9 → row 0 full
        0, 0,                 # end of line
        0, 2, 2, 1,           # delta: skip 2 right, 1 down (to row 2)
        2, 5,                 # run: 2 px of index 5 at x=2,y=2
        0, 1,                 # end of bitmap
    ])
    data = _file(_info_header(w, h, 8, comp=bmpmini.BI_RLE8, colors=256)
                 + pal, stream)
    px = np.frombuffer(decode_bmp(data)[3], np.uint8).reshape(h, w, 3)
    gray = px[:, :, 0]                             # palette i → (i,i,i)
    # file row 0 (image bottom row, h-1): runs + absolute
    assert list(gray[h - 1]) == [7, 7, 7, 7, 1, 2, 3, 9]
    # file row 1 untouched (EOL skipped over it via delta) → index 0
    assert list(gray[h - 2]) == [0] * w
    # file row 2 (image top): delta landed at x=2, run of 5s
    assert list(gray[0]) == [0, 0, 5, 5, 0, 0, 0, 0]


def test_rle4_absolute_word_alignment():
    w, h = 6, 1
    pal = b"".join(struct.pack("<BBBB", i * 16, 0, 0, 0) for i in range(16))
    stream = bytes([
        0, 5, 0x12, 0x34, 0x50, 0x00,  # absolute: 5 nibbles + word pad
        1, 0x60,                       # run: 1 px of nibble 6
        0, 1,                          # end of bitmap
    ])
    data = _file(_info_header(w, h, 4, comp=bmpmini.BI_RLE4, colors=16)
                 + pal, stream)
    px = np.frombuffer(decode_bmp(data)[3], np.uint8).reshape(1, w, 3)
    assert [px[0, i, 2] for i in range(w)] == \
        [16, 32, 48, 64, 80, 96]                   # blue channel = i*16


# ---------------------------------------------------------------------------
# JVM ImageIO parity (BMP is lossless → byte-exact equality)
# ---------------------------------------------------------------------------

def _imageio_rgb(spark, data: bytes):
    """Decode via JVM ImageIO → (w, h, top-down RGB bytes)."""
    jvm = spark.sparkContext._jvm
    bais = jvm.java.io.ByteArrayInputStream(data)
    img = jvm.javax.imageio.ImageIO.read(bais)
    w, h = img.getWidth(), img.getHeight()
    out = bytearray()
    for y in range(h):
        for x in range(w):
            argb = img.getRGB(x, y)
            out += bytes(((argb >> 16) & 255, (argb >> 8) & 255, argb & 255))
    return w, h, bytes(out)


def test_imageio_writes_we_decode(spark):
    """ImageIO-encoded BMP (synthetic gradient) → our decode, byte-exact."""
    jvm = spark.sparkContext._jvm
    w, h = 21, 13
    img = jvm.java.awt.image.BufferedImage(
        w, h, jvm.java.awt.image.BufferedImage.TYPE_INT_RGB)
    for y in range(h):
        for x in range(w):
            img.setRGB(x, y, ((x * 11) % 256 << 16) |
                       ((y * 17) % 256 << 8) | ((x * y) % 256))
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(img, "bmp", baos)
    data = bytes(baos.toByteArray())
    assert looks_like_bmp(data)
    dw, dh, dc, pix = decode_bmp(data)
    assert (dw, dh, dc) == (w, h, 3)
    gw, gh, gt = _imageio_rgb(spark, data)
    assert (gw, gh) == (w, h)
    assert pix == gt                                # lossless: exact


def test_we_write_imageio_decodes(spark):
    """Our 24-bit encoder → ImageIO decode, byte-exact."""
    w, h = 9, 7
    pix = _rand_pix(w, h, 3, seed=2)
    gw, gh, gt = _imageio_rgb(spark, encode_bmp(pix, w, h, 3))
    assert (gw, gh) == (w, h) and gt == pix


# ---------------------------------------------------------------------------
# totality on garbage
# ---------------------------------------------------------------------------

def test_garbage_never_crashes():
    for seed in range(300):
        rng = random.Random(seed)
        junk = b"BM" + bytes(rng.randrange(256)
                             for _ in range(rng.randrange(0, 256)))
        try:
            decode_bmp(junk)
        except BmpError:
            pass
    assert not looks_like_bmp(b"BMW dealership inventory listing 2024")


def test_truncation_never_crashes():
    data = encode_bmp(_rand_pix(5, 4, 3, seed=3), 5, 4, 3)
    for cut in range(len(data)):
        try:
            decode_bmp(data[:cut])
        except BmpError:
            pass


# ---------------------------------------------------------------------------
# operator wiring
# ---------------------------------------------------------------------------

def test_decode_media_and_resize_bmp(spark):
    big_w, big_h = 48, 20
    payload = encode_bmp(_rand_pix(big_w, big_h, 3, seed=4), big_w, big_h, 3)
    df = spark.createDataFrame([("a.bmp", payload)],
                               "name string, content binary")
    r = multimodal.decode_media(df).collect()[0]
    assert (r["format"], r["width"], r["height"], r["decode_ok"]) == \
        ("bmp", big_w, big_h, True)

    rz = multimodal.resize_media(df, max_edge=24).collect()[0]
    assert rz["resize_ok"] and rz["format"] == "bmp"
    assert (rz["target_width"], rz["target_height"]) == (24, 10)
    from databricks_pdf_ocr_spark.functions import pngmini
    pw, ph, _pc, _pp = pngmini.decode_png(bytes(rz["resized"]))
    assert (pw, ph) == (24, 10)

    # corrupt BMP → decode_ok=false error row, pipeline continues
    bad = spark.createDataFrame([("b.bmp", payload[:30])],
                                "name string, content binary")
    rb = multimodal.decode_media(bad).collect()[0]
    assert rb["format"] == "bmp" and rb["decode_ok"] is False
