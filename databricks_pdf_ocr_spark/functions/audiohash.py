"""Perceptual audio fingerprinting — the audio slot of media near-dup.

The audio analogue of ``imghash.dhash64``: a clip maps to a 64-bit hash
over an 8-band x 9-time-slice spectral-energy grid, with bit (b*8+t) set
iff band ``b``'s energy increases from time slice ``t`` to ``t+1``.
Re-encodes (bit depth, float vs integer PCM, sample rate, uniform gain)
perturb the grid only slightly — energy comparisons are invariant under
any positive gain because power scales uniformly — so near-duplicate
clips stay within a few Hamming bits and pair via the same pigeonhole
chunk equi-join as image dHash (``multimodal.phash_pairs``), never an
all-pairs comparison.

Band energies come from the Goertzel recurrence at eight fixed
log-spaced frequencies (Hz, so hashes agree ACROSS sample rates), each
evaluated over nine equal time slices of the mono downmix.  Pure-stdlib
float math; the distributed Spark path and the single-process golden
builder run the identical CPython kernel, so hashes are bit-identical.
"""

from __future__ import annotations

import math

#: analysis bands (Hz), log-spaced across the speech/music range but
#: kept below 3.5 kHz so the grid survives an 8 kHz re-encode (Nyquist)
BAND_HZ = (250, 400, 630, 1000, 1400, 2000, 2700, 3400)

#: time slices per clip -> 8 gradient bits per band
TIME_SLICES = 9


def _goertzel_power(samples, start: int, end: int, coeff: float) -> float:
    """Goertzel recurrence power of one band over samples[start:end]."""
    s_prev = s_prev2 = 0.0
    for i in range(start, end):
        s = samples[i] + coeff * s_prev - s_prev2
        s_prev2 = s_prev
        s_prev = s
    return s_prev * s_prev + s_prev2 * s_prev2 - coeff * s_prev * s_prev2


def energy_grid(decoded: dict) -> list[list[float]]:
    """wavmini-decoded clip → ``len(BAND_HZ)`` x ``TIME_SLICES`` grid of
    per-slice band powers, normalized by slice length (so slicing is
    duration-stable).  Channels downmix to mono by plain averaging."""
    ch = decoded["channels"]
    rate = decoded["sample_rate"]
    samples = decoded["samples"]
    n = decoded["n_frames"]
    if n < TIME_SLICES:
        raise ValueError(f"clip too short to fingerprint ({n} frames)")
    if ch == 1:
        mono = samples
    else:
        mono = [sum(samples[i * ch + c] for c in range(ch)) / ch
                for i in range(n)]
    coeffs = [2.0 * math.cos(2.0 * math.pi * f / rate) for f in BAND_HZ]
    grid = []
    for coeff in coeffs:
        row = []
        for t in range(TIME_SLICES):
            a = t * n // TIME_SLICES
            b = (t + 1) * n // TIME_SLICES
            row.append(_goertzel_power(mono, a, b, coeff) / (b - a))
        grid.append(row)
    return grid


def ahash64(decoded: dict) -> int:
    """64-bit audio gradient hash: bit (b*8+t) set iff band b's energy
    increases from time slice t to t+1.  Signed 64-bit int, stores
    directly in a Spark/DuckDB BIGINT (the ``imghash.dhash64`` shape)."""
    g = energy_grid(decoded)
    v = 0
    for b in range(len(BAND_HZ)):
        for t in range(TIME_SLICES - 1):
            if g[b][t + 1] > g[b][t]:
                v |= 1 << (b * (TIME_SLICES - 1) + t)
    return v - (1 << 64) if v >= (1 << 63) else v
