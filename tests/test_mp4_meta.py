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
