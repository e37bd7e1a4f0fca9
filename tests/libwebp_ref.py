"""ctypes bridge to the SYSTEM libwebp — reference-decoder ground truth
for the VP8 parity tests (tests only; the engine's decode path is the
pure-Python ``vp8mini``).  Same strategy as the JPEG codec's JVM-ImageIO
cross-check: a real, independent codec implementation supplies expected
output.  Tests skip loudly when the shared library is absent.
"""

from __future__ import annotations

import ctypes
import ctypes.util


def load_libwebp():
    """Return a CDLL for the system libwebp, or None when unavailable."""
    for cand in (ctypes.util.find_library("webp"), "libwebp.so.7",
                 "libwebp.so"):
        if not cand:
            continue
        try:
            lib = ctypes.CDLL(cand)
            lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
            lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
            lib.WebPEncodeRGB.restype = ctypes.c_size_t
            return lib
        except OSError:
            continue
    return None


def decode_yuv(lib, data: bytes):
    """Reference decode → (w, h, y, u, v) cropped planes (chroma at
    ceil(w/2) x ceil(h/2)), matching ``vp8mini.vp8_decode_yuv``."""
    w = ctypes.c_int()
    h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)()
    v = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int()
    uv_stride = ctypes.c_int()
    y = lib.WebPDecodeYUV(data, len(data), ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(u), ctypes.byref(v),
                          ctypes.byref(stride), ctypes.byref(uv_stride))
    if not y:
        raise ValueError("libwebp failed to decode")
    W, H, S, US = w.value, h.value, stride.value, uv_stride.value
    CW, CH = (W + 1) >> 1, (H + 1) >> 1
    yb = bytes(bytearray(ctypes.cast(
        y, ctypes.POINTER(ctypes.c_uint8 * (S * H))).contents))
    ub = bytes(bytearray(ctypes.cast(
        u, ctypes.POINTER(ctypes.c_uint8 * (US * CH))).contents))
    vb = bytes(bytearray(ctypes.cast(
        v, ctypes.POINTER(ctypes.c_uint8 * (US * CH))).contents))
    lib.WebPFree(y)
    yy = b"".join(yb[r * S:r * S + W] for r in range(H))
    uu = b"".join(ub[r * US:r * US + CW] for r in range(CH))
    vv = b"".join(vb[r * US:r * US + CW] for r in range(CH))
    return W, H, yy, uu, vv


def decode_rgba(lib, data: bytes):
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not p:
        raise ValueError("libwebp failed to decode")
    n = w.value * h.value * 4
    out = bytes(bytearray(ctypes.cast(
        p, ctypes.POINTER(ctypes.c_uint8 * n)).contents))
    lib.WebPFree(p)
    return w.value, h.value, out


def encode_rgb(lib, rgb: bytes, w: int, h: int, quality: float) -> bytes:
    """Real libwebp lossy ENCODE — produces genuine VP8 bitstreams for
    the parity fixtures."""
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGB(rgb, w, h, w * 3, ctypes.c_float(quality),
                          ctypes.byref(out))
    if n == 0:
        raise ValueError("libwebp failed to encode")
    enc = bytes(bytearray(ctypes.cast(
        out, ctypes.POINTER(ctypes.c_uint8 * n)).contents))
    lib.WebPFree(out)
    return enc
