"""Pure stdlib+numpy BMP (Windows DIB) decoder/encoder.

BMP is the remaining still-image format a web crawl actually serves
(legacy sites, scanner/export artifacts, favicons addressed as .bmp),
and it is fully specified in public Microsoft documentation — so the
engine decodes it for real rather than routing it to the deterministic
fake: BITMAPCOREHEADER (OS/2) and BITMAPINFOHEADER/V2/V3/V4/V5
variants, bit depths 1/4/8 (palette), 16 (555 and arbitrary
BI_BITFIELDS masks), 24 and 32, BI_RLE8 / BI_RLE4 run-length
compression (end-of-line, end-of-bitmap and delta escapes, absolute
mode with word alignment), bottom-up and top-down row orders, 4-byte
row padding, and the 32-bit alpha channel when a V4/V5 or BITFIELDS
alpha mask declares one.

The encoder is the deterministic fixture/transcode leg (24-bit BI_RGB,
32-bit BITFIELDS+alpha via BITMAPV4HEADER, and 8-bit indexed), same
role as ``gifmini``'s encoder.

Validation (``tests/test_bmp_codec.py``): byte-exact round-trips
through our own encoder, byte-exact parity with JVM ImageIO's BMP
writer/reader (the ground-truth strategy of ``test_jpeg_codec.py`` —
BMP is lossless so the gate is equality, not a rounding band),
hand-built spec vectors for RLE/1-bit/4-bit/16-bit legs, and
hypothesis garbage totality.

Reference analogue: none — the reference pipeline only PIL-resizes its
own rendered PNGs (``clients/claude.py:22-38``); BMP belongs to this
engine's wider crawl-media surface.
"""

from __future__ import annotations

import struct

import numpy as np

BMP_SIG = b"BM"

#: compression codes (BITMAPINFOHEADER biCompression)
BI_RGB, BI_RLE8, BI_RLE4, BI_BITFIELDS = 0, 1, 2, 3

_INFO_HEADER_SIZES = (40, 52, 56, 64, 108, 124)


class BmpError(ValueError):
    """Malformed or unsupported BMP payload."""


def looks_like_bmp(data: bytes) -> bool:
    """Cheap sniff: 'BM' magic + a known DIB header size.  'BM' alone is
    a weak two-byte magic, so the DIB size field doubles as a check."""
    if len(data) < 26 or data[:2] != BMP_SIG:
        return False
    dib = struct.unpack_from("<I", data, 14)[0]
    return dib == 12 or dib in _INFO_HEADER_SIZES


def _u(data: bytes, off: int, fmt: str):
    try:
        return struct.unpack_from(fmt, data, off)
    except struct.error as e:
        raise BmpError(f"truncated header: {e}") from None


def _parse_header(data: bytes) -> dict:
    if data[:2] != BMP_SIG:
        raise BmpError("not a BMP (missing 'BM' magic)")
    _size, pix_off = _u(data, 2, "<I4xI")
    dib = _u(data, 14, "<I")[0]
    if dib == 12:                               # BITMAPCOREHEADER (OS/2)
        w, h, planes, bpp = _u(data, 18, "<HHHH")
        comp, colors_used, core = BI_RGB, 0, True
        top_down = False
    elif dib in _INFO_HEADER_SIZES:
        w, h, planes, bpp, comp = _u(data, 18, "<iihHI")
        colors_used = _u(data, 46, "<I")[0]
        core = False
        top_down = h < 0
        h = abs(h)
    else:
        raise BmpError(f"unsupported DIB header size {dib}")
    if planes != 1:
        raise BmpError(f"planes must be 1, got {planes}")
    if w <= 0 or h <= 0:
        raise BmpError(f"bad dimensions {w}x{h}")
    if w * h > 64_000_000:
        raise BmpError(f"dimension bomb: {w}x{h}")
    if bpp not in (1, 4, 8, 16, 24, 32):
        raise BmpError(f"unsupported bit depth {bpp}")
    if comp not in (BI_RGB, BI_RLE8, BI_RLE4, BI_BITFIELDS):
        raise BmpError(f"unsupported compression {comp}")
    if comp == BI_RLE8 and bpp != 8 or comp == BI_RLE4 and bpp != 4:
        raise BmpError(f"compression {comp} invalid for {bpp} bpp")
    if comp in (BI_RLE8, BI_RLE4) and top_down:
        raise BmpError("top-down RLE bitmaps are invalid per spec")
    if comp == BI_BITFIELDS and bpp not in (16, 32):
        raise BmpError(f"BI_BITFIELDS invalid for {bpp} bpp")

    # channel masks: in-header for V2+ (dib >= 52); appended after a
    # plain BITMAPINFOHEADER when compression is BI_BITFIELDS
    masks_off = 14 + dib
    if comp == BI_BITFIELDS:
        if dib >= 52:
            r_m, g_m, b_m = _u(data, 54, "<III")
            a_m = _u(data, 66, "<I")[0] if dib >= 56 else 0
        else:
            r_m, g_m, b_m = _u(data, masks_off, "<III")
            a_m = 0
            masks_off += 12
    elif bpp == 16:
        r_m, g_m, b_m, a_m = 0x7C00, 0x03E0, 0x001F, 0       # default 555
    elif bpp == 32:
        r_m, g_m, b_m = 0x00FF0000, 0x0000FF00, 0x000000FF
        a_m = _u(data, 66, "<I")[0] if dib >= 56 else 0      # V3+ alpha
    else:
        r_m = g_m = b_m = a_m = 0

    n_colors = colors_used if colors_used else (1 << bpp if bpp <= 8 else 0)
    palette = None
    if bpp <= 8:
        if n_colors > 1 << bpp:
            raise BmpError(f"palette declares {n_colors} colors at {bpp} bpp")
        entry = 3 if core else 4
        raw = data[masks_off:masks_off + n_colors * entry]
        if len(raw) < n_colors * entry:
            raise BmpError("truncated palette")
        pal = np.frombuffer(raw, np.uint8).reshape(n_colors, entry)
        palette = np.zeros((max(n_colors, 1), 3), np.uint8)
        palette[:n_colors] = pal[:, [2, 1, 0]]               # BGR(X) → RGB
    return {"width": w, "height": h, "bpp": bpp, "compression": comp,
            "top_down": top_down, "pix_off": pix_off, "palette": palette,
            "masks": (r_m, g_m, b_m, a_m), "core": core}


def bmp_meta(data: bytes) -> dict:
    """Header-only metadata (the ``decode_media`` cheap path)."""
    h = _parse_header(data)
    return {"width": h["width"], "height": h["height"], "bpp": h["bpp"],
            "compression": h["compression"], "top_down": h["top_down"]}


def _mask_extract(vals: np.ndarray, mask: int) -> np.ndarray:
    """Masked component → 8-bit with round-half-up scaling (documented
    convention; exact for the 8-bit-aligned masks ImageIO writes)."""
    if mask == 0:
        return np.zeros(len(vals), np.uint8)
    shift = (mask & -mask).bit_length() - 1
    maxv = mask >> shift
    comp = (vals >> shift) & maxv
    return ((comp.astype(np.uint32) * 255 + maxv // 2) // maxv).astype(
        np.uint8)


def _decode_rle(data: bytes, w: int, h: int, four_bit: bool) -> np.ndarray:
    """RLE8/RLE4 stream → (h, w) palette indices in FILE row order
    (bottom-up).  Pixels never written (delta/EOL gaps) stay index 0."""
    idx = np.zeros((h, w), np.uint8)
    x = y = pos = 0
    n = len(data)
    while pos + 1 < n:
        cnt, val = data[pos], data[pos + 1]
        pos += 2
        if cnt > 0:                                   # encoded run
            if y >= h:
                raise BmpError("RLE run beyond bitmap height")
            end = min(x + cnt, w)
            if four_bit:
                pair = np.array([val >> 4, val & 0xF], np.uint8)
                idx[y, x:end] = np.resize(pair, end - x)
            else:
                idx[y, x:end] = val
            x = end
        elif val == 0:                                # end of line
            x, y = 0, y + 1
        elif val == 1:                                # end of bitmap
            return idx
        elif val == 2:                                # delta
            if pos + 1 >= n:
                raise BmpError("truncated RLE delta")
            x = min(x + data[pos], w)
            y += data[pos + 1]
            pos += 2
        else:                                         # absolute mode
            if y >= h:
                raise BmpError("RLE absolute run beyond bitmap height")
            run = val
            nbytes = (run + 1) // 2 if four_bit else run
            nbytes += nbytes & 1                      # word alignment
            if pos + nbytes > n:
                raise BmpError("truncated RLE absolute run")
            if four_bit:
                raw = np.frombuffer(data, np.uint8, (run + 1) // 2, pos)
                nib = np.empty(2 * len(raw), np.uint8)
                nib[0::2] = raw >> 4
                nib[1::2] = raw & 0xF
                px = nib[:run]
            else:
                px = np.frombuffer(data, np.uint8, run, pos)
            end = min(x + run, w)
            idx[y, x:end] = px[:end - x]
            x = end
            pos += nbytes
    return idx


def decode_bmp(data: bytes) -> tuple[int, int, int, bytes]:
    """BMP payload → ``(width, height, channels, pixels)`` with pixels
    row-major top-down RGB (channels=3) or RGBA (channels=4, emitted
    only when an alpha mask declares real alpha)."""
    hdr = _parse_header(data)
    w, h, bpp = hdr["width"], hdr["height"], hdr["bpp"]
    comp, pal = hdr["compression"], hdr["palette"]
    r_m, g_m, b_m, a_m = hdr["masks"]
    pix = data[hdr["pix_off"]:]
    stride = ((bpp * w + 31) // 32) * 4

    if comp in (BI_RLE8, BI_RLE4):
        idx = _decode_rle(pix, w, h, comp == BI_RLE4)
    elif bpp <= 8:
        if len(pix) < stride * h:
            raise BmpError("truncated pixel array")
        rows = np.frombuffer(pix, np.uint8, stride * h).reshape(h, stride)
        if bpp == 8:
            idx = rows[:, :w]
        elif bpp == 4:
            nib = np.empty((h, 2 * stride), np.uint8)
            nib[:, 0::2] = rows >> 4
            nib[:, 1::2] = rows & 0xF
            idx = nib[:, :w]
        else:                                         # 1 bpp, MSB first
            idx = np.unpackbits(rows, axis=1)[:, :w]
    else:
        if len(pix) < stride * h:
            raise BmpError("truncated pixel array")
        rows = np.frombuffer(pix, np.uint8, stride * h).reshape(h, stride)
        if bpp == 24:
            rgb = rows[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]
            out, channels = rgb, 3
        else:
            width_bytes = bpp // 8                    # 2 or 4
            dt = np.uint16 if bpp == 16 else np.uint32
            vals = rows[:, :w * width_bytes].reshape(h, w, width_bytes)
            vals = vals.view(dt.__name__ and f"<u{width_bytes}")[..., 0]
            flat = vals.reshape(-1).astype(np.uint32)
            if bpp == 32 and comp == BI_RGB and a_m == 0:
                # fast path: BGRX bytes, high byte ignored per spec
                rgb = rows[:, :w * 4].reshape(h, w, 4)[:, :, [2, 1, 0]]
                out, channels = rgb, 3
            else:
                chans = [_mask_extract(flat, m) for m in (r_m, g_m, b_m)]
                if a_m:
                    chans.append(_mask_extract(flat, a_m))
                out = np.stack(chans, axis=-1).reshape(h, w, len(chans))
                channels = len(chans)
        if not hdr["top_down"]:
            out = out[::-1]
        return w, h, channels, np.ascontiguousarray(out).tobytes()

    # palette legs (raw or RLE) share the lookup + flip tail
    if pal is None:
        raise BmpError("palette bitmap without palette")
    if int(idx.max(initial=0)) >= len(pal):
        raise BmpError("palette index out of range")
    rgb = pal[idx]
    if not hdr["top_down"]:
        rgb = rgb[::-1]
    return w, h, 3, np.ascontiguousarray(rgb).tobytes()


# ---------------------------------------------------------------------------
# encoder (fixtures + the lossless transcode leg)
# ---------------------------------------------------------------------------

def _file_header(pix_off: int, pix_len: int) -> bytes:
    return struct.pack("<2sIHHI", BMP_SIG, pix_off + pix_len, 0, 0, pix_off)


def encode_bmp(pix: bytes, w: int, h: int, channels: int) -> bytes:
    """RGB → 24-bit BI_RGB; RGBA → 32-bit BI_BITFIELDS with a
    BITMAPV4HEADER alpha mask.  Bottom-up, 4-byte row padding."""
    arr = np.frombuffer(pix, np.uint8)
    if len(arr) != w * h * channels:
        raise BmpError(f"pixel buffer is {len(arr)} bytes, "
                       f"want {w * h * channels}")
    arr = arr.reshape(h, w, channels)[::-1]           # bottom-up
    if channels == 3:
        stride = (w * 3 + 3) & ~3
        rows = np.zeros((h, stride), np.uint8)
        rows[:, :w * 3] = arr[:, :, ::-1].reshape(h, w * 3)
        dib = struct.pack("<IiihHIIiiII", 40, w, h, 1, 24, BI_RGB,
                          stride * h, 2835, 2835, 0, 0)
    elif channels == 4:
        stride = w * 4
        rows = arr[:, :, [2, 1, 0, 3]].reshape(h, stride)
        dib = struct.pack("<IiihHIIiiII", 108, w, h, 1, 32, BI_BITFIELDS,
                          stride * h, 2835, 2835, 0, 0)
        dib += struct.pack("<IIII", 0x00FF0000, 0x0000FF00, 0x000000FF,
                           0xFF000000)
        dib += b"sRGB"[::-1] + b"\x00" * 48            # LCS_sRGB + zeros
    else:
        raise BmpError(f"encode supports 3/4 channels, got {channels}")
    body = np.ascontiguousarray(rows).tobytes()
    return _file_header(14 + len(dib), len(body)) + dib + body


def encode_bmp_indexed(indices: bytes, palette: list[tuple[int, int, int]],
                       w: int, h: int) -> bytes:
    """8-bit palette writer (fixture tool for the palette decode leg)."""
    if not 0 < len(palette) <= 256:
        raise BmpError(f"palette must hold 1..256 colors, got {len(palette)}")
    idx = np.frombuffer(indices, np.uint8)
    if len(idx) != w * h:
        raise BmpError(f"index buffer is {len(idx)} bytes, want {w * h}")
    if int(idx.max(initial=0)) >= len(palette):
        raise BmpError("index out of palette range")
    stride = (w + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, :w] = idx.reshape(h, w)[::-1]
    dib = struct.pack("<IiihHIIiiII", 40, w, h, 1, 8, BI_RGB,
                      stride * h, 2835, 2835, len(palette), 0)
    pal = b"".join(struct.pack("<BBBB", b, g, r, 0) for r, g, b in palette)
    body = np.ascontiguousarray(rows).tobytes()
    return _file_header(14 + len(dib) + len(pal), len(body)) + dib + pal + body
