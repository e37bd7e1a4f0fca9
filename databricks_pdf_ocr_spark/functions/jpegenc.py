"""Baseline JPEG encoder — the deterministic mirror of ``jpegmini``.

Scope: ITU-T T.81 baseline sequential (SOF0), 8-bit, three components,
4:4:4 (no subsampling), standard Annex K quantization + Huffman tables
with libjpeg-style quality scaling.  This is the fixture generator for
the Motion-JPEG video corpus (``mp4mini.write_mjpeg`` containers whose
samples the engine can REALLY decode) and the transcode target of the
resize path — not a rate-optimized production encoder.

Validation (``tests/test_jpeg_encoder.py``): every emitted bitstream is
decoded by BOTH ``jpegmini.decode_jpeg`` (this repo) and JVM
``javax.imageio`` (an independent implementation) and the two must
agree pixel-for-pixel; the round-trip error vs the source pixels is
bounded by the quantization tables in use.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpegmini import _ZIGZAG

# Annex K Table K.1 / K.2 — natural (row-major) order
_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)
_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)

# Annex K Huffman specs: (BITS counts per code length 1..16, HUFFVAL)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple]:
    """Canonical code assignment (T.81 Annex C) → {symbol: (code, len)}."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_L = _huff_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
_AC_L = _huff_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
_DC_C = _huff_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
_AC_C = _huff_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)

#: orthonormal 8-point DCT-II matrix
_DCT_M = np.array([[
    (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
    * np.cos((2 * x + 1) * u * np.pi / 16)
    for x in range(8)] for u in range(8)])

_ZZ = np.frombuffer(_ZIGZAG, dtype=np.uint8)


def quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg-style quality scaling of the Annex K tables (natural
    order), clamped to [1, 255]."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    ql = np.clip((_QUANT_LUMA * scale + 50) // 100, 1, 255)
    qc = np.clip((_QUANT_CHROMA * scale + 50) // 100, 1, 255)
    return ql.astype(np.int32), qc.astype(np.int32)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:               # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:                  # pad with 1s per spec
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)


def _magnitude(v: int) -> tuple[int, int]:
    """DC/AC amplitude → (category, extra-bits value) per T.81 F.1.2."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    return cat, (v if v > 0 else v + (1 << cat) - 1)


def _component_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) pixel plane → (n_blocks, 8, 8) with edge replication; block
    scan order is row-major, matching the interleaved MCU walk at 4:4:4."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hh, ww = plane.shape
    return (plane.reshape(hh // 8, 8, ww // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def encode_jpeg(pixels: bytes, width: int, height: int,
                quality: int = 90) -> bytes:
    """Interleaved RGB (or grayscale-replicated RGB) bytes → baseline
    JFIF bitstream (SOF0, 4:4:4, standard Huffman tables)."""
    if len(pixels) < width * height * 3:
        raise ValueError("pixel buffer too small for RGB dimensions")
    rgb = np.frombuffer(pixels, dtype=np.uint8)[:width * height * 3] \
        .reshape(height, width, 3).astype(np.float64)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    # JFIF YCbCr (BT.601 full range)
    planes = [
        0.299 * r + 0.587 * g + 0.114 * b,
        128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
        128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
    ]
    ql, qc = quality_tables(quality)
    qtabs = [ql.reshape(8, 8), qc.reshape(8, 8), qc.reshape(8, 8)]
    coeffs = []
    for plane, qt in zip(planes, qtabs):
        blocks = _component_blocks(plane) - 128.0
        f = np.einsum("ux,nxy,vy->nuv", _DCT_M, blocks, _DCT_M)
        q = np.round(f / qt).astype(np.int32)
        coeffs.append(q.reshape(-1, 64)[:, _ZZ])    # zigzag order

    # headers --------------------------------------------------------
    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + bytes(int(v) for v in ql[_ZZ]))
    out += seg(0xDB, b"\x01" + bytes(int(v) for v in qc[_ZZ]))
    sof = struct.pack(">BHHB", 8, height, width, 3)
    for cid, qid in ((1, 0), (2, 1), (3, 1)):
        sof += struct.pack(">BBB", cid, 0x11, qid)   # 1x1 sampling
    out += seg(0xC0, sof)
    for tc_th, bits, vals in ((0x00, _DC_LUMA_BITS, _DC_LUMA_VALS),
                              (0x10, _AC_LUMA_BITS, _AC_LUMA_VALS),
                              (0x01, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
                              (0x11, _AC_CHROMA_BITS, _AC_CHROMA_VALS)):
        out += seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    sos = b"\x03" + bytes((1, 0x00, 2, 0x11, 3, 0x11)) + b"\x00\x3f\x00"
    out += seg(0xDA, sos)

    # entropy-coded data ----------------------------------------------
    bw = _BitWriter()
    tables = [(_DC_L, _AC_L), (_DC_C, _AC_C), (_DC_C, _AC_C)]
    pred = [0, 0, 0]
    for n in range(coeffs[0].shape[0]):              # interleaved MCUs
        for c in range(3):
            zz = coeffs[c][n]
            dc_tab, ac_tab = tables[c]
            diff = int(zz[0]) - pred[c]
            pred[c] = int(zz[0])
            cat, extra = _magnitude(diff)
            bw.put(*dc_tab[cat])
            if cat:
                bw.put(extra, cat)
            run = 0
            nz = np.nonzero(zz[1:])[0]
            last = nz[-1] + 1 if len(nz) else 0
            for k in range(1, last + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    bw.put(*ac_tab[0xF0])            # ZRL
                    run -= 16
                cat, extra = _magnitude(v)
                bw.put(*ac_tab[(run << 4) | cat])
                bw.put(extra, cat)
                run = 0
            if last < 63:
                bw.put(*ac_tab[0x00])                # EOB
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
