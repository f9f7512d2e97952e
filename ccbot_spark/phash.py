"""64-bit DCT perceptual hash (pHash; Zauner 2010 public algorithm).

Pipeline (SURVEY.md §2.7 `u_phash`): RGB → luma grayscale → 32×32 area
resize → 2-D DCT-II → top-left 8×8 block minus the DC term → median
threshold → 64 bits packed MSB-first into a signed int64.

Deterministic: pure float64 numpy, no RNG, no platform-dependent ops.
Both the oracle crawler and the Spark `mapInPandas` image stage call
``phash64`` on identical decoded pixels, so hashes match exactly.
"""

from __future__ import annotations

import numpy as np

_N = 32  # DCT input size
_K = 8   # retained low-frequency block

# Precomputed orthonormal DCT-II matrix (32×32).
_k = np.arange(_N)
_DCT = np.cos(np.pi * (2.0 * _k[None, :] + 1.0) * _k[:, None] / (2.0 * _N))
_DCT *= np.sqrt(2.0 / _N)
_DCT[0, :] *= np.sqrt(0.5)


def to_gray(img: np.ndarray) -> np.ndarray:
    """ITU-R BT.601 luma, float64, shape (h, w)."""
    f = img.astype(np.float64)
    return 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]


def _cell_bounds(n_in: int, n_out: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-output-cell [lo, hi) pixel bounds; every cell covers ≥1 pixel."""
    lo = np.minimum((np.arange(n_out) * n_in) // n_out, n_in - 1)
    hi = np.maximum(((np.arange(1, n_out + 1) * n_in) // n_out), lo + 1)
    return lo, np.minimum(hi, n_in)


def resize_area(gray: np.ndarray, out: int = _N) -> np.ndarray:
    """Box/area resize to (out, out) via integral image — deterministic."""
    h, w = gray.shape
    integ = np.zeros((h + 1, w + 1), dtype=np.float64)
    integ[1:, 1:] = np.cumsum(np.cumsum(gray, axis=0), axis=1)
    y0, y1 = _cell_bounds(h, out)
    x0, x1 = _cell_bounds(w, out)
    # vectorized 2-D box sums via broadcasting over the integral image
    sums = (
        integ[np.ix_(y1, x1)]
        - integ[np.ix_(y0, x1)]
        - integ[np.ix_(y1, x0)]
        + integ[np.ix_(y0, x0)]
    )
    areas = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    return sums / areas


def phash64(img: np.ndarray) -> int:
    """64-bit perceptual hash of an (h, w, 3) uint8 image → signed int64."""
    small = resize_area(to_gray(img), _N)
    freq = _DCT @ small @ _DCT.T
    block = freq[:_K, :_K].flatten()
    vals = block[1:]  # drop DC
    med = np.median(vals)
    bits = block > med
    bits[0] = False  # DC never contributes
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    # wrap to signed int64 (Spark LongType)
    if out >= 1 << 63:
        out -= 1 << 64
    return out


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash (dHash; the gradient-sign complement to
    the DCT pHash — cheap, crop-sensitive where pHash is not, so a
    dedup pass running both catches more re-encodes than either
    alone): gray → 8×9 area resize → bit = left pixel > right
    neighbor, row-major MSB-first → signed int64."""
    small = resize_area_rect(to_gray(img), 8, 9)
    bits = small[:, :-1] > small[:, 1:]
    out = 0
    for b in bits.flatten():
        out = (out << 1) | int(b)
    if out >= 1 << 63:
        out -= 1 << 64
    return out


def ahash64(img: np.ndarray) -> int:
    """64-bit average hash (aHash): gray → 8×8 area resize → bit =
    pixel > mean. The weakest-but-fastest family member; kept for
    dedup-union experiments alongside phash/dhash."""
    small = resize_area_rect(to_gray(img), 8, 8)
    bits = small > small.mean()
    out = 0
    for b in bits.flatten():
        out = (out << 1) | int(b)
    if out >= 1 << 63:
        out -= 1 << 64
    return out


def resize_area_rect(gray: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Rectangular variant of resize_area (dHash needs 8×9)."""
    h, w = gray.shape
    integ = np.zeros((h + 1, w + 1), dtype=np.float64)
    integ[1:, 1:] = np.cumsum(np.cumsum(gray, axis=0), axis=1)
    y0, y1 = _cell_bounds(h, out_h)
    x0, x1 = _cell_bounds(w, out_w)
    sums = (
        integ[np.ix_(y1, x1)]
        - integ[np.ix_(y0, x1)]
        - integ[np.ix_(y1, x0)]
        + integ[np.ix_(y0, x0)]
    )
    areas = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    return sums / areas
