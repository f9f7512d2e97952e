from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from ccbot_spark import codecs, synthweb


def _img(seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(37, 53, 3), dtype=np.uint8)


def test_ppm_roundtrip():
    img = _img(1)
    assert np.array_equal(codecs.decode_ppm(codecs.encode_ppm(img)), img)


def test_ppm_comment_header():
    img = _img(2)
    data = codecs.encode_ppm(img)
    hacked = b"P6\n# a comment\n53 37\n255\n" + data.split(b"255\n", 1)[1]
    assert np.array_equal(codecs.decode_ppm(hacked), img)


def test_png_roundtrip():
    img = _img(3)
    assert np.array_equal(codecs.decode_png(codecs.encode_png(img)), img)


def _encode_png_with_filter(img: np.ndarray, ftype: int) -> bytes:
    """Hand-build a PNG using one filter type on every scanline."""
    h, w = img.shape[:2]
    bpp = 3
    stride = w * bpp
    px = img.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        cur = px[y]
        if ftype == 0:
            flt = cur
        elif ftype == 1:
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            flt = (cur - left) % 256
        elif ftype == 2:
            flt = (cur - prev) % 256
        elif ftype == 3:
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            flt = (cur - ((left + prev) >> 1)) % 256
        elif ftype == 4:
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            upleft = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft))
            flt = (cur - pred) % 256
        raw.append(ftype)
        raw.extend(flt.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        codecs.PNG_SIG
        + codecs._chunk(b"IHDR", ihdr)
        + codecs._chunk(b"IDAT", zlib.compress(bytes(raw)))
        + codecs._chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_decode_all_filters(ftype):
    img = _img(4 + ftype)
    data = _encode_png_with_filter(img, ftype)
    assert np.array_equal(codecs.decode_png(data), img)


def test_grayscale_png_decode():
    img = _img(9)[:, :, :1]
    h, w = img.shape[:2]
    raw = np.concatenate([np.zeros((h, 1), np.uint8), img.reshape(h, w)], axis=1)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    data = (
        codecs.PNG_SIG
        + codecs._chunk(b"IHDR", ihdr)
        + codecs._chunk(b"IDAT", zlib.compress(raw.tobytes()))
        + codecs._chunk(b"IEND", b"")
    )
    out = codecs.decode_png(data)
    assert out.shape == (h, w, 3)
    assert np.array_equal(out[:, :, 0], img[:, :, 0])


def test_qpng_psnr_gate():
    """The lossy path must clear the PSNR ≥ 40 dB contract (BASELINE.json)."""
    cfg = synthweb.WebConfig()
    for i in range(8):
        url = f"http://h{i}.test/img/{i:04x}.qpng"
        px = synthweb.image_pixels(cfg, url)
        dec = codecs.decode(codecs.encode(px, "qpng"), "qpng")
        assert codecs.psnr(px, dec) >= 40.0
    # worst-case random noise image still clears 40 dB
    dec = codecs.decode(codecs.encode(_img(7), "qpng"), "qpng")
    assert codecs.psnr(_img(7), dec) >= 40.0


def test_dispatch_unknown_fmt():
    with pytest.raises(ValueError):
        codecs.encode(_img(0), "jpeg")
