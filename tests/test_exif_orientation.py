"""EXIF orientation (tag 0x0112): the camera-rotation metadata a
training pipeline must honor before any geometry. Gates:

  * the APP1 writer (codecs.exif_app1 via encode_jpeg) and the
    marker-walk + TIFF-IFD reader (multimodal._jpeg_exif_walk) round-
    trip every orientation 1..8, in BOTH TIFF byte orders, and answer
    None on unstamped / malformed blobs — never a guess;
  * the 8 upright transforms are exact numpy views (no resampling):
    applying k to a stamp-inverse-transformed image restores the
    original byte-for-byte;
  * the Spark stage (multimodal.exif_normalize) uprights stamped JPEGs
    (PSNR ≥ 40 dB vs the true upright image, dims swapped for 5..8),
    passes unstamped rows through, and keeps phash stable;
  * the oracled registry entry `img_exif_orient` (450 rows at sf0.01)
    value-checks tag + upright dims against DuckDB arithmetic.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ccbot_spark import codecs, phash
from ccbot_spark.functions import multimodal

RS = np.random.RandomState(11)
BASE = RS.randint(0, 256, size=(40, 56, 3), dtype=np.uint8)


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


@pytest.mark.parametrize("k", range(1, 9))
def test_app1_roundtrip_every_orientation(k):
    data = codecs.encode_jpeg(BASE, exif_orientation=k)
    w, h, o = multimodal._jpeg_exif_walk(data)
    assert (w, h, o) == (56, 40, k)


def test_unstamped_jpeg_reads_none():
    data = codecs.encode_jpeg(BASE)
    w, h, o = multimodal._jpeg_exif_walk(data)
    assert (w, h, o) == (56, 40, None)
    # and non-JPEG bytes refuse entirely
    assert multimodal._jpeg_exif_walk(b"\x89PNG\r\n\x1a\n") == (
        None, None, None,
    )


def test_big_endian_tiff_reads_too():
    """Cameras write both byte orders; the reader must not assume II."""
    tiff = (
        b"MM\x00*" + struct.pack(">I", 8)
        + struct.pack(">H", 1)
        + struct.pack(">HHIHH", 0x0112, 3, 1, 6, 0)
        + struct.pack(">I", 0)
    )
    payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", 2 + len(payload)) + payload
    plain = codecs.encode_jpeg(BASE)
    # splice the big-endian APP1 right after SOI+APP0 (2 + 2+16 bytes)
    stamped = plain[:20] + app1 + plain[20:]
    w, h, o = multimodal._jpeg_exif_walk(stamped)
    assert (w, h, o) == (56, 40, 6)
    # malformed TIFF (bad magic) → None, dims still parsed
    bad = bytearray(stamped)
    bad[20 + 4 + 6 + 2] = 0x99  # corrupt the TIFF '42' magic
    assert multimodal._jpeg_exif_walk(bytes(bad)) == (56, 40, None)


@pytest.mark.parametrize("k", range(1, 9))
def test_transforms_are_exact_inverses(k):
    """apply(k) ∘ apply(INVERSE[k]) is the identity — pixel-exact, no
    resampling, so orientation normalization is lossless."""
    stored = multimodal.apply_exif_orientation(
        BASE, multimodal._EXIF_INVERSE[k]
    )
    up = multimodal.apply_exif_orientation(stored, k)
    assert up.shape == BASE.shape
    assert np.array_equal(up, BASE)


@pytest.mark.parametrize("k", [2, 5, 6, 8])
def test_exif_normalize_spark(spark, k):
    """End-to-end through the Arrow stage: a JPEG stored rotated with
    orientation k comes out display-upright with the true dims."""
    stored = multimodal.apply_exif_orientation(
        BASE, multimodal._EXIF_INVERSE[k]
    )
    rows = [
        ("stamped", codecs.encode_jpeg(
            np.ascontiguousarray(stored), exif_orientation=k
        ), "jpeg"),
        ("plain", codecs.encode_jpeg(BASE), "jpeg"),
        ("ppm", codecs.encode_ppm(BASE), "ppm"),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    out = {
        r.image_id: r
        for r in multimodal.exif_normalize(df).collect()
    }
    for name in ("stamped", "plain", "ppm"):
        r = out[name]
        assert (r.w, r.h, r.fmt) == (56, 40, "ppm"), name
        px = codecs.decode_ppm(bytes(r.bytes))
        if name == "ppm":
            assert np.array_equal(px, BASE)
        else:
            assert codecs.psnr(px, BASE) >= 40.0, name
        assert _hamming(phash.phash64(px), phash.phash64(BASE)) <= 4, name
