"""VP8 (lossy WebP) key-frame decoder — pure stdlib, RFC 6386.

Closes the LAST loud image boundary: ``webpmini`` decodes lossless
(VP8L) files and the ALPH plane of lossy files for real; this module
decodes the lossy ``VP8 `` key-frame stream itself, so ``decode_media``
returns true pixels for every WebP variant a crawl actually serves.

Implements the full key-frame decode path of RFC 6386:

- the boolean arithmetic decoder (Section 7) and tree/literal coding;
- frame + segmentation + loop-filter + quantizer header parse
  (Section 9), including per-segment quantizer/filter overrides and
  multiple token partitions (Section 9.5);
- DCT token decoding (Section 13) with the default probability table,
  header probability updates, zero-run/EOB tree semantics and the
  cat1..cat6 extra-bit codes; per-block non-zero contexts;
- dequantization (Section 14.1) with the Y2 dc*2 / ac*155/100 scaling
  and the chroma-DC index clamp at 117;
- the inverse WHT (Y2) and the 4x4 inverse DCT (Sections 14.3-14.4)
  in exact integer arithmetic (20091/35468 fixed-point constants);
- intra prediction (Section 12): 16x16 and chroma DC/V/H/TM with the
  127/129 out-of-frame borders, and all ten 4x4 B_PRED modes with the
  VP8 above-right quirk (right-column subblocks of every row reuse the
  4 pixels above-right of the macroblock);
- the normal and simple loop filters (Section 15) with per-segment /
  per-mode level adjustment, hev thresholds and interior limits,
  applied in macroblock raster order after reconstruction (prediction
  always reads the unfiltered reconstruction, as the spec requires).

Spec constant tables (token probabilities, key-frame B-mode
probabilities, quantizer lookups) live in ``_vp8_tables.py``,
cross-verified byte-for-byte against the system libwebp rodata.

Validation: the test suite decodes libwebp-ENCODED fixtures across
sizes / qualities / intra-mode mixes and compares the Y/U/V planes
byte-exactly against ``WebPDecodeYUV`` of the system libwebp (the
reference VP8 decoder), plus the real ``python.webp`` CPython test
image — the same real-codec ground-truth strategy the JPEG codec uses
with JVM ImageIO and VP8L uses with the libwebp-encoded ALPH stream.
RGB conversion (BT.601, integer) is gated by PSNR against the sibling
``python.png``; the alpha plane was already byte-exact via VP8L.
"""

from __future__ import annotations

from ._vp8_tables import (
    AC_QLOOKUP,
    COEFF_PROBS,
    COEFF_UPDATE_PROBS,
    DC_QLOOKUP,
    KF_BMODE_PROBS,
)


class Vp8Error(ValueError):
    """Malformed VP8 bitstream."""


#: decompression-bomb guard for header-declared dimensions
MAX_PIXELS = 1 << 24


# ---------------------------------------------------------------------------
# boolean arithmetic decoder (RFC 6386 Section 7)
# ---------------------------------------------------------------------------

class BoolDecoder:
    """Bool decoder with the 2-byte-lookahead value window of the
    reference decoder; reads past end-of-partition yield zero bytes
    (the spec permits up to two bytes of overread)."""

    __slots__ = ("data", "pos", "value", "range", "bit_count")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.value = 0
        for _ in range(2):
            self.value = (self.value << 8) | self._next_byte()
        self.range = 255
        self.bit_count = 0

    def _next_byte(self) -> int:
        b = self.data[self.pos] if self.pos < len(self.data) else 0
        self.pos += 1
        return b

    def get(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big_split = split << 8
        if self.value >= big_split:
            ret = 1
            self.range -= split
            self.value -= big_split
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                self.value |= self._next_byte()
        return ret

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get(128)
        return v

    def signed_literal(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.get(128) else v

    def get_signed(self, v: int) -> int:
        return -v if self.get(128) else v


# ---------------------------------------------------------------------------
# constant structure (trees, scan order, extra-bit codes)
# ---------------------------------------------------------------------------

ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)
BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)

# 16x16 / chroma intra modes
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
# 4x4 intra modes.  NOTE the numbering: the KF_BMODE_PROBS context rows
# follow the table's storage order, which places RD/VR before LD/VL
# (the RFC enum text lists LD/RD/VR/VL); the tree below is built from
# these symbols, so decode paths stay spec-identical while context
# indexing matches the table.
(B_DC, B_TM, B_VE, B_HE, B_RD, B_VR, B_LD, B_VL, B_HD, B_HU) = range(10)

# implied subblock modes for the 16x16 predictors (mode context only)
_IMPLIED_B = {DC_PRED: B_DC, V_PRED: B_VE, H_PRED: B_HE, TM_PRED: B_TM}

# key-frame mode trees (RFC 6386 Section 11.2); generic (tree, probs)
# tree pairs: negative entries are leaves.
KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
KF_YMODE_PROBS = (145, 156, 163, 128)
UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
KF_UV_MODE_PROBS = (142, 114, 183)
BMODE_TREE = (
    -B_DC, 2,
    -B_TM, 4,
    -B_VE, 6,
    8, 12,
    -B_HE, 10,
    -B_RD, -B_VR,
    -B_LD, 14,
    -B_VL, 16,
    -B_HD, -B_HU,
)

_CAT_EXTRA = (  # cat3..cat6 extra-bit probabilities (RFC 6386 13.2)
    (173, 148, 140),
    (176, 155, 140, 135),
    (180, 157, 141, 134, 130),
    (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
)


def _tree_get(bd: BoolDecoder, tree, probs, start: int = 0) -> int:
    i = start
    while True:
        i = tree[i + bd.get(probs[i >> 1])]
        if i <= 0:
            return -i


def _clip127(v: int) -> int:
    return 0 if v < 0 else (127 if v > 127 else v)


# ---------------------------------------------------------------------------
# header state
# ---------------------------------------------------------------------------

class _FrameState:
    """Everything the per-MB loop needs, parsed from the headers."""

    __slots__ = (
        "width", "height", "mb_w", "mb_h",
        "seg_enabled", "seg_update_map", "seg_abs", "seg_quant",
        "seg_lf", "seg_tree_probs",
        "filter_type", "filter_level", "sharpness",
        "lf_delta_enabled", "ref_lf_deltas", "mode_lf_deltas",
        "quants", "coeff_probs", "mb_no_skip", "skip_prob",
        "partitions",
    )


def _parse_headers(data: bytes) -> tuple[_FrameState, BoolDecoder]:
    if len(data) < 10:
        raise Vp8Error("truncated VP8 payload")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise Vp8Error("not a key frame (WebP stills are key frames)")
    part1_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise Vp8Error("bad VP8 key-frame start code")
    w = data[6] | (data[7] << 8)
    h = data[8] | (data[9] << 8)
    st = _FrameState()
    st.width = w & 0x3FFF
    st.height = h & 0x3FFF
    if st.width == 0 or st.height == 0:
        raise Vp8Error("zero frame dimension")
    if st.width * st.height > MAX_PIXELS:
        raise Vp8Error(
            f"frame {st.width}x{st.height} exceeds the {MAX_PIXELS}-pixel "
            "cap (decompression-bomb guard, same policy as vp8lmini)")
    st.mb_w = (st.width + 15) >> 4
    st.mb_h = (st.height + 15) >> 4
    if 10 + part1_size > len(data):
        raise Vp8Error("first partition overruns payload")
    bd = BoolDecoder(data[10:10 + part1_size])

    bd.literal(1)                                   # color space (must be 0)
    bd.literal(1)                                   # clamping type

    # segmentation (Section 9.3)
    st.seg_enabled = bd.literal(1)
    st.seg_update_map = 0
    st.seg_abs = 0
    st.seg_quant = [0, 0, 0, 0]
    st.seg_lf = [0, 0, 0, 0]
    st.seg_tree_probs = [255, 255, 255]
    if st.seg_enabled:
        st.seg_update_map = bd.literal(1)
        update_data = bd.literal(1)
        if update_data:
            st.seg_abs = bd.literal(1)
            for i in range(4):
                if bd.literal(1):
                    st.seg_quant[i] = bd.signed_literal(7)
            for i in range(4):
                if bd.literal(1):
                    st.seg_lf[i] = bd.signed_literal(6)
        if st.seg_update_map:
            for i in range(3):
                if bd.literal(1):
                    st.seg_tree_probs[i] = bd.literal(8)

    # loop filter (Section 9.4)
    st.filter_type = bd.literal(1)                  # 1 = simple
    st.filter_level = bd.literal(6)
    st.sharpness = bd.literal(3)
    st.lf_delta_enabled = bd.literal(1)
    st.ref_lf_deltas = [0, 0, 0, 0]
    st.mode_lf_deltas = [0, 0, 0, 0]
    if st.lf_delta_enabled:
        if bd.literal(1):                           # delta update
            for i in range(4):
                if bd.literal(1):
                    st.ref_lf_deltas[i] = bd.signed_literal(6)
            for i in range(4):
                if bd.literal(1):
                    st.mode_lf_deltas[i] = bd.signed_literal(6)

    # token partitions (Section 9.5)
    num_parts = 1 << bd.literal(2)

    # quantizers (Section 9.6)
    y_ac_qi = bd.literal(7)
    y_dc_d = bd.signed_literal(4) if bd.literal(1) else 0
    y2_dc_d = bd.signed_literal(4) if bd.literal(1) else 0
    y2_ac_d = bd.signed_literal(4) if bd.literal(1) else 0
    uv_dc_d = bd.signed_literal(4) if bd.literal(1) else 0
    uv_ac_d = bd.signed_literal(4) if bd.literal(1) else 0
    st.quants = []
    for seg in range(4):
        if st.seg_enabled:
            base = (st.seg_quant[seg] if st.seg_abs
                    else y_ac_qi + st.seg_quant[seg])
        else:
            base = y_ac_qi
        base = _clip127(base)
        uv_dc_i = base + uv_dc_d
        st.quants.append((
            DC_QLOOKUP[_clip127(base + y_dc_d)],            # y1 dc
            AC_QLOOKUP[base],                               # y1 ac
            DC_QLOOKUP[_clip127(base + y2_dc_d)] * 2,       # y2 dc
            max(8, AC_QLOOKUP[_clip127(base + y2_ac_d)] * 155 // 100),
            DC_QLOOKUP[117 if uv_dc_i > 117 else (0 if uv_dc_i < 0
                                                  else uv_dc_i)],
            AC_QLOOKUP[_clip127(base + uv_ac_d)],           # uv ac
        ))

    bd.literal(1)                                   # refresh entropy probs

    # token probability updates (Section 13.4)
    probs = list(COEFF_PROBS)
    for i in range(1056):
        if bd.get(COEFF_UPDATE_PROBS[i]):
            probs[i] = bd.literal(8)
    st.coeff_probs = probs

    st.mb_no_skip = bd.literal(1)
    st.skip_prob = bd.literal(8) if st.mb_no_skip else 0

    # residual partitions (after the first partition)
    rest = data[10 + part1_size:]
    st.partitions = []
    if num_parts > 1:
        table = rest[:3 * (num_parts - 1)]
        if len(table) < 3 * (num_parts - 1):
            raise Vp8Error("token partition size table truncated")
        body = rest[3 * (num_parts - 1):]
        off = 0
        for i in range(num_parts - 1):
            sz = table[3 * i] | (table[3 * i + 1] << 8) \
                | (table[3 * i + 2] << 16)
            st.partitions.append(BoolDecoder(body[off:off + sz]))
            off += sz
        st.partitions.append(BoolDecoder(body[off:]))
    else:
        st.partitions.append(BoolDecoder(rest))
    return st, bd


# ---------------------------------------------------------------------------
# coefficient token decoding (RFC 6386 Section 13)
# ---------------------------------------------------------------------------

def _get_coeffs(bd: BoolDecoder, probs, ptype: int, ctx: int,
                dq_dc: int, dq_ac: int, first: int, out) -> int:
    """Decode one 4x4 block's coefficients into ``out`` (length-16 list,
    natural order, dequantized).  Returns the EOB position; the block's
    non-zero context flag is (return > first)."""
    base = ptype * 264                              # 8 bands * 3 ctx * 11
    n = first
    p = base + BANDS[n] * 33 + ctx * 11
    get = bd.get
    while True:
        if not get(probs[p]):
            return n                                # EOB
        while not get(probs[p + 1]):                # zero run (no EOB)
            n += 1
            if n == 16:
                return 16
            p = base + BANDS[n] * 33
        if not get(probs[p + 2]):
            v = 1
            nc = 1
        else:
            nc = 2
            if not get(probs[p + 3]):
                if not get(probs[p + 4]):
                    v = 2
                else:
                    v = 3 + get(probs[p + 5])
            elif not get(probs[p + 6]):
                if not get(probs[p + 7]):
                    v = 5 + get(159)
                else:
                    v = 7 + 2 * get(165) + get(145)
            else:
                bit1 = get(probs[p + 8])
                bit0 = get(probs[p + 9 + bit1])
                cat = 2 * bit1 + bit0
                v = 0
                for cp in _CAT_EXTRA[cat]:
                    v += v + get(cp)
                v += 3 + (8 << cat)
        if get(128):
            v = -v
        out[ZIGZAG[n]] = v * (dq_ac if n else dq_dc)
        n += 1
        if n == 16:
            return 16
        p = base + BANDS[n] * 33 + nc * 11


# ---------------------------------------------------------------------------
# inverse transforms (RFC 6386 Sections 14.3-14.4)
# ---------------------------------------------------------------------------

def _iwht4x4(ip):
    """Inverse Walsh-Hadamard for the Y2 block → 16 DC values."""
    out = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[12 + i]
        b1 = ip[4 + i] + ip[8 + i]
        c1 = ip[4 + i] - ip[8 + i]
        d1 = ip[i] - ip[12 + i]
        out[i] = a1 + b1
        out[4 + i] = c1 + d1
        out[8 + i] = a1 - b1
        out[12 + i] = d1 - c1
    for i in range(4):
        r = 4 * i
        a1 = out[r] + out[r + 3]
        b1 = out[r + 1] + out[r + 2]
        c1 = out[r + 1] - out[r + 2]
        d1 = out[r] - out[r + 3]
        out[r] = (a1 + b1 + 3) >> 3
        out[r + 1] = (c1 + d1 + 3) >> 3
        out[r + 2] = (a1 - b1 + 3) >> 3
        out[r + 3] = (d1 - c1 + 3) >> 3
    return out


def _idct4x4(ip):
    """VP8 integer inverse DCT (20091/35468 fixed point)."""
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[8 + i]
        b1 = ip[i] - ip[8 + i]
        t1 = (ip[4 + i] * 35468) >> 16
        t2 = ip[12 + i] + ((ip[12 + i] * 20091) >> 16)
        c1 = t1 - t2
        t1 = ip[4 + i] + ((ip[4 + i] * 20091) >> 16)
        t2 = (ip[12 + i] * 35468) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[12 + i] = a1 - d1
        tmp[4 + i] = b1 + c1
        tmp[8 + i] = b1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = tmp[r] + tmp[r + 2]
        b1 = tmp[r] - tmp[r + 2]
        t1 = (tmp[r + 1] * 35468) >> 16
        t2 = tmp[r + 3] + ((tmp[r + 3] * 20091) >> 16)
        c1 = t1 - t2
        t1 = tmp[r + 1] + ((tmp[r + 1] * 20091) >> 16)
        t2 = (tmp[r + 3] * 35468) >> 16
        d1 = t1 + t2
        out[r] = (a1 + d1 + 4) >> 3
        out[r + 3] = (a1 - d1 + 4) >> 3
        out[r + 1] = (b1 + c1 + 4) >> 3
        out[r + 2] = (b1 - c1 + 4) >> 3
    return out


# ---------------------------------------------------------------------------
# plane with virtual borders
# ---------------------------------------------------------------------------

class _Plane:
    """Byte plane at macroblock-padded size with the VP8 out-of-frame
    conventions: rows above the frame read 127, columns left of it 129
    (RFC 6386 Section 12.2)."""

    __slots__ = ("w", "h", "stride", "buf")

    def __init__(self, w: int, h: int):
        self.w = w
        self.h = h
        self.stride = w
        self.buf = bytearray(w * h)

    def px(self, x: int, y: int) -> int:
        if y < 0:
            return 127        # top border (incl. the x = -1 corner)
        if x < 0:
            return 129
        return self.buf[y * self.stride + x]

    def row(self, x: int, y: int, n: int):
        """n pixels at (x..x+n-1, y) honoring borders; x >= 0."""
        if y < 0:
            return [127] * n
        s = y * self.stride + x
        return list(self.buf[s:s + n])

    def col(self, x: int, y: int, n: int):
        if x < 0:
            return [129] * n
        return [self.buf[(y + i) * self.stride + x] for i in range(n)]


def _clamp255(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


# ---------------------------------------------------------------------------
# intra prediction (RFC 6386 Section 12)
# ---------------------------------------------------------------------------

def _pred_block(plane: _Plane, x0: int, y0: int, size: int, mode: int,
                have_above: bool, have_left: bool):
    """DC/V/H/TM prediction for a size x size block into a flat list."""
    above = plane.row(x0, y0 - 1, size) if have_above else [127] * size
    left = plane.col(x0 - 1, y0, size) if have_left else [129] * size
    if mode == DC_PRED:
        if have_above and have_left:
            s = sum(above) + sum(left)
            shift = 5 if size == 16 else 4
            dc = (s + (1 << (shift - 1))) >> shift
        elif have_above:
            shift = 4 if size == 16 else 3
            dc = (sum(above) + (1 << (shift - 1))) >> shift
        elif have_left:
            shift = 4 if size == 16 else 3
            dc = (sum(left) + (1 << (shift - 1))) >> shift
        else:
            dc = 128
        return [dc] * (size * size)
    if mode == V_PRED:
        return above * size
    if mode == H_PRED:
        out = []
        for r in range(size):
            out.extend([left[r]] * size)
        return out
    # TM_PRED
    corner = plane.px(x0 - 1, y0 - 1)
    out = []
    for r in range(size):
        lr = left[r] - corner
        out.extend([_clamp255(lr + a) for a in above])
    return out


def _avg2(a, b):
    return (a + b + 1) >> 1


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _pred_b(mode: int, above, left, corner: int):
    """One 4x4 B_PRED block; ``above`` is 8 pixels (incl. above-right),
    ``left`` 4, ``corner`` the above-left pixel.  Returns 16 pixels."""
    a = above
    l_ = left
    p = corner
    if mode == B_DC:
        dc = (a[0] + a[1] + a[2] + a[3] + l_[0] + l_[1] + l_[2] + l_[3]
              + 4) >> 3
        return [dc] * 16
    if mode == B_TM:
        out = []
        for r in range(4):
            d = l_[r] - p
            out.extend([_clamp255(d + a[c]) for c in range(4)])
        return out
    if mode == B_VE:
        row = [_avg3(p, a[0], a[1]), _avg3(a[0], a[1], a[2]),
               _avg3(a[1], a[2], a[3]), _avg3(a[2], a[3], a[4])]
        return row * 4
    if mode == B_HE:
        rows = [_avg3(p, l_[0], l_[1]), _avg3(l_[0], l_[1], l_[2]),
                _avg3(l_[1], l_[2], l_[3]), _avg3(l_[2], l_[3], l_[3])]
        out = []
        for r in rows:
            out.extend([r] * 4)
        return out
    if mode == B_LD:
        out = [0] * 16
        for r in range(4):
            for c in range(4):
                i = r + c
                if i < 6:
                    out[4 * r + c] = _avg3(a[i], a[i + 1], a[i + 2])
                else:
                    out[4 * r + c] = _avg3(a[6], a[7], a[7])
        return out
    # edge array for the right-diagonal family: L3 L2 L1 L0 P A0 A1 A2 A3
    e = (l_[3], l_[2], l_[1], l_[0], p, a[0], a[1], a[2], a[3])
    if mode == B_RD:
        out = [0] * 16
        for r in range(4):
            for c in range(4):
                i = c - r + 3
                out[4 * r + c] = _avg3(e[i], e[i + 1], e[i + 2])
        return out
    if mode == B_VR:
        x = [0] * 16
        x[0] = _avg2(p, a[0])
        x[1] = _avg2(a[0], a[1])
        x[2] = _avg2(a[1], a[2])
        x[3] = _avg2(a[2], a[3])
        x[4] = _avg3(l_[0], p, a[0])
        x[5] = _avg3(p, a[0], a[1])
        x[6] = _avg3(a[0], a[1], a[2])
        x[7] = _avg3(a[1], a[2], a[3])
        x[8] = _avg3(l_[1], l_[0], p)
        x[9], x[10], x[11] = x[0], x[1], x[2]
        x[12] = _avg3(l_[2], l_[1], l_[0])
        x[13], x[14], x[15] = x[4], x[5], x[6]
        return x
    if mode == B_VL:
        x = [0] * 16
        x[0] = _avg2(a[0], a[1])
        x[1] = _avg2(a[1], a[2])
        x[2] = _avg2(a[2], a[3])
        x[3] = _avg2(a[3], a[4])
        x[4] = _avg3(a[0], a[1], a[2])
        x[5] = _avg3(a[1], a[2], a[3])
        x[6] = _avg3(a[2], a[3], a[4])
        x[7] = _avg3(a[3], a[4], a[5])
        x[8], x[9], x[10] = x[1], x[2], x[3]
        x[11] = _avg3(a[4], a[5], a[6])
        x[12], x[13], x[14] = x[5], x[6], x[7]
        x[15] = _avg3(a[5], a[6], a[7])
        return x
    if mode == B_HD:
        x = [0] * 16
        x[0] = _avg2(l_[0], p)
        x[1] = _avg3(l_[0], p, a[0])
        x[2] = _avg3(p, a[0], a[1])
        x[3] = _avg3(a[0], a[1], a[2])
        x[4] = _avg2(l_[1], l_[0])
        x[5] = _avg3(l_[1], l_[0], p)
        x[6], x[7] = x[0], x[1]
        x[8] = _avg2(l_[2], l_[1])
        x[9] = _avg3(l_[2], l_[1], l_[0])
        x[10], x[11] = x[4], x[5]
        x[12] = _avg2(l_[3], l_[2])
        x[13] = _avg3(l_[3], l_[2], l_[1])
        x[14], x[15] = x[8], x[9]
        return x
    if mode == B_HU:
        x = [0] * 16
        x[0] = _avg2(l_[0], l_[1])
        x[1] = _avg3(l_[0], l_[1], l_[2])
        x[2] = _avg2(l_[1], l_[2])
        x[3] = _avg3(l_[1], l_[2], l_[3])
        x[4], x[5] = x[2], x[3]
        x[6] = _avg2(l_[2], l_[3])
        x[7] = _avg3(l_[2], l_[3], l_[3])
        x[8], x[9] = x[6], x[7]
        x[10] = l_[3]
        x[11] = l_[3]
        x[12] = x[13] = x[14] = x[15] = l_[3]
        return x
    raise Vp8Error(f"bad B_PRED mode {mode}")


# ---------------------------------------------------------------------------
# loop filter (RFC 6386 Section 15)
# ---------------------------------------------------------------------------

def _s(v):                                          # u8 -> s8
    return v - 128


def _u(v):                                          # s8 -> u8 with clamp
    return 0 if v < -128 else (255 if v > 127 else v + 128)


def _c(v):                                          # clamp to s8
    return -128 if v < -128 else (127 if v > 127 else v)


def _common_adjust(use_outer, px, i0, i1, i2, i3):
    """Adjust p1 p0 q0 q1 at buf indices i0..i3; returns F."""
    p1, p0, q0, q1 = _s(px[i0]), _s(px[i1]), _s(px[i2]), _s(px[i3])
    a = _c((_c(p1 - q1) if use_outer else 0) + 3 * (q0 - p0))
    f = _c(a + 4) >> 3
    e = _c(a + 3) >> 3
    px[i2] = _u(_c(q0 - f))
    px[i1] = _u(_c(p0 + e))
    return f


def _filter_mask(interior, edge, px, idx):
    """Normal-filter mask over p3..q3 (8 buf indices)."""
    p3, p2, p1, p0, q0, q1, q2, q3 = (px[i] for i in idx)
    return (abs(p0 - q0) * 2 + (abs(p1 - q1) >> 1) <= edge
            and abs(p3 - p2) <= interior and abs(p2 - p1) <= interior
            and abs(p1 - p0) <= interior and abs(q1 - q0) <= interior
            and abs(q2 - q1) <= interior and abs(q3 - q2) <= interior)


def _hev(thresh, px, idx):
    p1, p0, q0, q1 = (px[i] for i in idx)
    return abs(p1 - p0) > thresh or abs(q1 - q0) > thresh


def _subblock_filter(hev_t, interior, edge, px, idx8):
    if _filter_mask(interior, edge, px, idx8):
        i4 = idx8[2:6]
        hv = _hev(hev_t, px, i4)
        f = _common_adjust(hv, px, *i4)
        if not hv:
            a = (f + 1) >> 1
            px[idx8[5]] = _u(_c(_s(px[idx8[5]]) - a))
            px[idx8[2]] = _u(_c(_s(px[idx8[2]]) + a))


def _mbedge_filter(hev_t, interior, edge, px, idx8):
    if _filter_mask(interior, edge, px, idx8):
        i4 = idx8[2:6]
        if not _hev(hev_t, px, i4):
            p2, p1, p0 = _s(px[idx8[1]]), _s(px[idx8[2]]), _s(px[idx8[3]])
            q0, q1, q2 = _s(px[idx8[4]]), _s(px[idx8[5]]), _s(px[idx8[6]])
            w = _c(_c(p1 - q1) + 3 * (q0 - p0))
            a = _c((27 * w + 63) >> 7)
            px[idx8[4]] = _u(_c(q0 - a))
            px[idx8[3]] = _u(_c(p0 + a))
            a = _c((18 * w + 63) >> 7)
            px[idx8[5]] = _u(_c(q1 - a))
            px[idx8[2]] = _u(_c(p1 + a))
            a = _c((9 * w + 63) >> 7)
            px[idx8[6]] = _u(_c(q2 - a))
            px[idx8[1]] = _u(_c(p2 + a))
        else:
            _common_adjust(1, px, *i4)


def _simple_filter(edge, px, idx4):
    p1, p0, q0, q1 = (px[i] for i in idx4)
    if abs(p0 - q0) * 2 + (abs(p1 - q1) >> 1) <= edge:
        _common_adjust(1, px, *idx4)


# ---------------------------------------------------------------------------
# decoder core
# ---------------------------------------------------------------------------

def vp8_decode_yuv(data: bytes):
    """VP8 key-frame payload (``VP8 `` chunk body) →
    ``(width, height, y, u, v)`` with Y cropped to width x height and
    U/V to ceil(w/2) x ceil(h/2), each a ``bytes`` plane."""
    st, head = _parse_headers(data)
    mb_w, mb_h = st.mb_w, st.mb_h
    yp = _Plane(mb_w * 16, mb_h * 16)
    up = _Plane(mb_w * 8, mb_h * 8)
    vp = _Plane(mb_w * 8, mb_h * 8)

    probs = st.coeff_probs
    # non-zero contexts
    above_y = [[0] * 4 for _ in range(mb_w)]
    above_u = [[0] * 2 for _ in range(mb_w)]
    above_v = [[0] * 2 for _ in range(mb_w)]
    above_y2 = [0] * mb_w
    above_bmodes = [[B_DC] * 4 for _ in range(mb_w)]

    # per-MB records for the loop-filter pass:
    # (segment, is_b_pred, has_coeffs)
    mb_info = []

    for mb_y in range(mb_h):
        tok = st.partitions[mb_y % len(st.partitions)]
        left_y = [0] * 4
        left_u = [0] * 2
        left_v = [0] * 2
        left_y2 = 0
        left_bmodes = [B_DC] * 4
        for mb_x in range(mb_w):
            # -- modes (first partition) --
            segment = 0
            if st.seg_enabled and st.seg_update_map:
                tp = st.seg_tree_probs
                if head.get(tp[0]):
                    segment = 2 + head.get(tp[2])
                else:
                    segment = head.get(tp[1])
            skip = head.get(st.skip_prob) if st.mb_no_skip else 0
            ymode = _tree_get(head, KF_YMODE_TREE, KF_YMODE_PROBS)
            bmodes = [0] * 16
            if ymode == B_PRED:
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    am = (bmodes[sb - 4] if r else above_bmodes[mb_x][c])
                    lm = (bmodes[sb - 1] if c else left_bmodes[r])
                    m = _tree_get(head, BMODE_TREE,
                                  KF_BMODE_PROBS[(am * 10 + lm) * 9:
                                                 (am * 10 + lm) * 9 + 9])
                    bmodes[sb] = m
            else:
                bmodes = [_IMPLIED_B[ymode]] * 16
            uvmode = _tree_get(head, UV_MODE_TREE, KF_UV_MODE_PROBS)
            above_bmodes[mb_x] = bmodes[12:16]
            left_bmodes = [bmodes[3], bmodes[7], bmodes[11], bmodes[15]]

            # -- residuals (token partition) --
            q = st.quants[segment]
            coeffs = [[0] * 16 for _ in range(24)]
            y2 = None
            has_coeffs = False
            if not skip:
                if ymode != B_PRED:
                    out = [0] * 16
                    ctx = above_y2[mb_x] + left_y2
                    nz = _get_coeffs(tok, probs, 1, ctx, q[2], q[3], 0, out)
                    above_y2[mb_x] = left_y2 = 1 if nz > 0 else 0
                    if nz > 0:
                        has_coeffs = True
                    y2 = _iwht4x4(out)
                    ptype, first = 0, 1
                else:
                    ptype, first = 3, 0
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    ctx = above_y[mb_x][c] + left_y[r]
                    nz = _get_coeffs(tok, probs, ptype, ctx, q[0], q[1],
                                     first, coeffs[sb])
                    flag = 1 if nz > first else 0
                    above_y[mb_x][c] = left_y[r] = flag
                    if flag:
                        has_coeffs = True
                for plane, anz, lnz in ((0, above_u, left_u),
                                        (1, above_v, left_v)):
                    for sb in range(4):
                        r, c = sb >> 1, sb & 1
                        ctx = anz[mb_x][c] + lnz[r]
                        nz = _get_coeffs(tok, probs, 2, ctx, q[4], q[5], 0,
                                         coeffs[16 + 4 * plane + sb])
                        flag = 1 if nz > 0 else 0
                        anz[mb_x][c] = lnz[r] = flag
                        if flag:
                            has_coeffs = True
                if y2 is not None:
                    for sb in range(16):
                        coeffs[sb][0] = y2[sb]
            else:
                # skipped MB: contexts reset; Y2 context resets only when
                # the MB has a Y2 block (16x16 modes)
                above_y[mb_x] = [0] * 4
                left_y = [0] * 4
                above_u[mb_x] = [0] * 2
                left_u = [0] * 2
                above_v[mb_x] = [0] * 2
                left_v = [0] * 2
                if ymode != B_PRED:
                    above_y2[mb_x] = left_y2 = 0
                    y2 = [0] * 16

            mb_info.append((segment, ymode == B_PRED, has_coeffs))

            # -- reconstruction --
            x0, y0 = mb_x * 16, mb_y * 16
            have_above = mb_y > 0
            have_left = mb_x > 0
            if ymode == B_PRED:
                # above-right of the MB, reused by every right-column
                # subblock (the spec's top-right quirk)
                if not have_above:
                    mb_ar = [127] * 4
                elif mb_x >= mb_w - 1:
                    mb_ar = [yp.buf[(y0 - 1) * yp.stride + x0 + 15]] * 4
                else:
                    s = (y0 - 1) * yp.stride + x0 + 16
                    mb_ar = list(yp.buf[s:s + 4])
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    bx, by = x0 + 4 * c, y0 + 4 * r
                    if c == 3:
                        a4 = yp.row(bx, by - 1, 4) if (r or have_above) \
                            else [127] * 4
                        above8 = a4 + mb_ar
                    else:
                        if r == 0 and not have_above:
                            above8 = [127] * 8
                        else:
                            above8 = yp.row(bx, by - 1, 8)
                    if c == 0 and not have_left:
                        left4 = [129] * 4
                    else:
                        left4 = yp.col(bx - 1, by, 4)
                    corner = yp.px(bx - 1, by - 1)
                    pred = _pred_b(bmodes[sb], above8, left4, corner)
                    res = coeffs[sb]
                    buf = yp.buf
                    stride = yp.stride
                    if any(res):
                        res = _idct4x4(res)
                        for rr in range(4):
                            o = (by + rr) * stride + bx
                            for cc in range(4):
                                buf[o + cc] = _clamp255(pred[4 * rr + cc]
                                                        + res[4 * rr + cc])
                    else:
                        for rr in range(4):
                            o = (by + rr) * stride + bx
                            buf[o:o + 4] = bytes(pred[4 * rr:4 * rr + 4])
            else:
                pred = _pred_block(yp, x0, y0, 16, ymode,
                                   have_above, have_left)
                buf = yp.buf
                stride = yp.stride
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    bx, by = x0 + 4 * c, y0 + 4 * r
                    res = coeffs[sb]
                    if any(res):
                        res = _idct4x4(res)
                        for rr in range(4):
                            o = (by + rr) * stride + bx
                            po = 16 * (4 * r + rr) + 4 * c
                            for cc in range(4):
                                buf[o + cc] = _clamp255(pred[po + cc]
                                                        + res[4 * rr + cc])
                    else:
                        for rr in range(4):
                            o = (by + rr) * stride + bx
                            po = 16 * (4 * r + rr) + 4 * c
                            buf[o:o + 4] = bytes(pred[po:po + 4])
            cx0, cy0 = mb_x * 8, mb_y * 8
            for plane, pl in ((0, up), (1, vp)):
                pred = _pred_block(pl, cx0, cy0, 8, uvmode,
                                   have_above, have_left)
                buf = pl.buf
                stride = pl.stride
                for sb in range(4):
                    r, c = sb >> 1, sb & 1
                    bx, by = cx0 + 4 * c, cy0 + 4 * r
                    res = coeffs[16 + 4 * plane + sb]
                    if any(res):
                        res = _idct4x4(res)
                        for rr in range(4):
                            o = (by + rr) * stride + bx
                            po = 8 * (4 * r + rr) + 4 * c
                            for cc in range(4):
                                buf[o + cc] = _clamp255(pred[po + cc]
                                                        + res[4 * rr + cc])
                    else:
                        for rr in range(4):
                            o = (by + rr) * stride + bx
                            po = 8 * (4 * r + rr) + 4 * c
                            buf[o:o + 4] = bytes(pred[po:po + 4])

    _loop_filter(st, yp, up, vp, mb_info)

    # crop
    w, h = st.width, st.height
    cw, ch = (w + 1) >> 1, (h + 1) >> 1
    y_out = bytearray(w * h)
    for r in range(h):
        y_out[r * w:(r + 1) * w] = yp.buf[r * yp.stride:r * yp.stride + w]
    u_out = bytearray(cw * ch)
    v_out = bytearray(cw * ch)
    for r in range(ch):
        u_out[r * cw:(r + 1) * cw] = up.buf[r * up.stride:r * up.stride + cw]
        v_out[r * cw:(r + 1) * cw] = vp.buf[r * vp.stride:r * vp.stride + cw]
    return w, h, bytes(y_out), bytes(u_out), bytes(v_out)


def _loop_filter(st: _FrameState, yp: _Plane, up: _Plane, vp: _Plane,
                 mb_info):
    if st.filter_level == 0:
        return
    mb_w, mb_h = st.mb_w, st.mb_h
    # per-segment base levels
    levels = []
    for seg in range(4):
        if st.seg_enabled:
            lvl = (st.seg_lf[seg] if st.seg_abs
                   else st.filter_level + st.seg_lf[seg])
        else:
            lvl = st.filter_level
        levels.append(max(0, min(63, lvl)))

    for i, (segment, is_b, has_coeffs) in enumerate(mb_info):
        mb_y, mb_x = divmod(i, mb_w)
        lvl = levels[segment]
        if st.lf_delta_enabled:
            lvl += st.ref_lf_deltas[0]              # intra frame
            if is_b:
                lvl += st.mode_lf_deltas[0]
            lvl = max(0, min(63, lvl))
        if lvl == 0:
            continue
        interior = lvl
        if st.sharpness:
            interior >>= 2 if st.sharpness > 4 else 1
            cap = 9 - st.sharpness
            if interior > cap:
                interior = cap
        if interior < 1:
            interior = 1
        hev_t = 2 if lvl >= 40 else (1 if lvl >= 15 else 0)
        mb_edge = ((lvl + 2) * 2) + interior
        sb_edge = (lvl * 2) + interior
        inner = is_b or has_coeffs
        if st.filter_type:                          # simple: Y only
            buf, stride = yp.buf, yp.stride
            x0, y0 = mb_x * 16, mb_y * 16
            if mb_x > 0:
                for r in range(16):
                    o = (y0 + r) * stride + x0
                    _simple_filter(mb_edge, buf,
                                   (o - 2, o - 1, o, o + 1))
            if inner:
                for dx in (4, 8, 12):
                    for r in range(16):
                        o = (y0 + r) * stride + x0 + dx
                        _simple_filter(sb_edge, buf,
                                       (o - 2, o - 1, o, o + 1))
            if mb_y > 0:
                for col in range(16):
                    o = y0 * stride + x0 + col
                    _simple_filter(mb_edge, buf,
                                   (o - 2 * stride, o - stride, o,
                                    o + stride))
            if inner:
                for dy in (4, 8, 12):
                    for col in range(16):
                        o = (y0 + dy) * stride + x0 + col
                        _simple_filter(sb_edge, buf,
                                       (o - 2 * stride, o - stride, o,
                                        o + stride))
            continue
        # normal filter: Y then chroma
        for pl, size in ((yp, 16), (up, 8), (vp, 8)):
            buf, stride = pl.buf, pl.stride
            x0, y0 = mb_x * size, mb_y * size
            if mb_x > 0:
                for r in range(size):
                    o = (y0 + r) * stride + x0
                    _mbedge_filter(hev_t, interior, mb_edge, buf,
                                   (o - 4, o - 3, o - 2, o - 1,
                                    o, o + 1, o + 2, o + 3))
            if inner:
                for dx in range(4, size, 4):
                    for r in range(size):
                        o = (y0 + r) * stride + x0 + dx
                        _subblock_filter(hev_t, interior, sb_edge, buf,
                                         (o - 4, o - 3, o - 2, o - 1,
                                          o, o + 1, o + 2, o + 3))
            if mb_y > 0:
                for col in range(size):
                    o = y0 * stride + x0 + col
                    _mbedge_filter(hev_t, interior, mb_edge, buf,
                                   (o - 4 * stride, o - 3 * stride,
                                    o - 2 * stride, o - stride, o,
                                    o + stride, o + 2 * stride,
                                    o + 3 * stride))
            if inner:
                for dy in range(4, size, 4):
                    for col in range(size):
                        o = (y0 + dy) * stride + x0 + col
                        _subblock_filter(hev_t, interior, sb_edge, buf,
                                         (o - 4 * stride, o - 3 * stride,
                                          o - 2 * stride, o - stride, o,
                                          o + stride, o + 2 * stride,
                                          o + 3 * stride))


# ---------------------------------------------------------------------------
# YUV -> RGB: BT.601 integer conversion + the 9-3-3-1 "fancy" chroma
# upsampler (both in the reference decoder's exact integer arithmetic,
# so the RGB surface is byte-identical to libwebp's RGBA output)
# ---------------------------------------------------------------------------

def _store_rgb(out, o: int, yv: int, uv: int, vv: int):
    yy = (yv * 19077) >> 8                          # 1.164 in <<14, kept <<6
    r = yy + ((vv * 26149) >> 8) - 14234
    g = yy - ((uv * 6419) >> 8) - ((vv * 13320) >> 8) + 8708
    b = yy + ((uv * 33050) >> 8) - 17685
    out[o] = (r >> 6) if 0 <= r < 16384 else (0 if r < 0 else 255)
    out[o + 1] = (g >> 6) if 0 <= g < 16384 else (0 if g < 0 else 255)
    out[o + 2] = (b >> 6) if 0 <= b < 16384 else (0 if b < 0 else 255)


def _upsample_row_pair(out, w, yt, yb, ot, ob, tu, tv, cu, cv):
    """One fancy-upsampler call: luma row ``yt`` (and optionally ``yb``)
    against the chroma row pair (``tu/tv`` above, ``cu/cv`` below),
    9-3-3-1 kernel with the reference rounding sequence."""
    u0 = (3 * tu[0] + cu[0] + 2) >> 2
    v0 = (3 * tv[0] + cv[0] + 2) >> 2
    _store_rgb(out, ot, yt[0], u0, v0)
    if yb is not None:
        _store_rgb(out, ob, yb[0], (3 * cu[0] + tu[0] + 2) >> 2,
                   (3 * cv[0] + tv[0] + 2) >> 2)
    tlu, tlv, lu, lv = tu[0], tv[0], cu[0], cv[0]
    for x in range(1, ((w - 1) >> 1) + 1):
        tux, tvx, cux, cvx = tu[x], tv[x], cu[x], cv[x]
        au = tlu + tux + lu + cux + 8
        av = tlv + tvx + lv + cvx + 8
        d12u = (au + 2 * (tux + lu)) >> 3
        d12v = (av + 2 * (tvx + lv)) >> 3
        d03u = (au + 2 * (tlu + cux)) >> 3
        d03v = (av + 2 * (tlv + cvx)) >> 3
        xo = 2 * x - 1
        _store_rgb(out, ot + 3 * xo, yt[xo],
                   (d12u + tlu) >> 1, (d12v + tlv) >> 1)
        _store_rgb(out, ot + 3 * xo + 3, yt[xo + 1],
                   (d03u + tux) >> 1, (d03v + tvx) >> 1)
        if yb is not None:
            _store_rgb(out, ob + 3 * xo, yb[xo],
                       (d03u + lu) >> 1, (d03v + lv) >> 1)
            _store_rgb(out, ob + 3 * xo + 3, yb[xo + 1],
                       (d12u + cux) >> 1, (d12v + cvx) >> 1)
        tlu, tlv, lu, lv = tux, tvx, cux, cvx
    if not (w & 1):
        _store_rgb(out, ot + 3 * (w - 1), yt[w - 1],
                   (3 * tlu + lu + 2) >> 2, (3 * tlv + lv + 2) >> 2)
        if yb is not None:
            _store_rgb(out, ob + 3 * (w - 1), yb[w - 1],
                       (3 * lu + tlu + 2) >> 2, (3 * lv + tlv + 2) >> 2)


def yuv_to_rgb(w: int, h: int, y: bytes, u: bytes, v: bytes) -> bytes:
    """4:2:0 planes → interleaved RGB, byte-identical to the reference
    decoder's default output path (fancy upsampling + BT.601)."""
    cw = (w + 1) >> 1
    out = bytearray(w * h * 3)

    def yrow(r):
        return y[r * w:(r + 1) * w]

    def crow(p, j):
        return p[j * cw:(j + 1) * cw]

    _upsample_row_pair(out, w, yrow(0), None, 0, 0,
                       crow(u, 0), crow(v, 0), crow(u, 0), crow(v, 0))
    r = 1
    j = 0
    while r + 1 < h:
        _upsample_row_pair(out, w, yrow(r), yrow(r + 1),
                           r * w * 3, (r + 1) * w * 3,
                           crow(u, j), crow(v, j),
                           crow(u, j + 1), crow(v, j + 1))
        r += 2
        j += 1
    if r < h:                                       # trailing even-height row
        _upsample_row_pair(out, w, yrow(r), None, r * w * 3, 0,
                           crow(u, j), crow(v, j), crow(u, j), crow(v, j))
    return bytes(out)


def vp8_decode(data: bytes):
    """VP8 key-frame payload → ``(width, height, 3, rgb_bytes)``."""
    w, h, y, u, v = vp8_decode_yuv(data)
    return w, h, 3, yuv_to_rgb(w, h, y, u, v)
