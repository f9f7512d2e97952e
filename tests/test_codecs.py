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
    # jpeg moved into the closed world in round 5 — a truly unknown
    # fmt still fails loudly rather than guessing a container
    with pytest.raises(ValueError):
        codecs.encode(_img(0), "tiff")


# ---------------------------------------------------------------- BMP

@pytest.mark.parametrize("w,h", [(53, 37), (52, 37), (51, 1), (1, 1), (2, 3)])
def test_bmp_roundtrip(w, h):
    # widths that do and don't hit the 4-byte row padding boundary
    rng = np.random.default_rng(w * 100 + h)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    data = codecs.encode_bmp(img)
    assert data[:2] == b"BM"
    # declared file size and data offset are honest
    (fsize,) = struct.unpack_from("<I", data, 2)
    (offset,) = struct.unpack_from("<I", data, 10)
    assert fsize == len(data) and offset == codecs.BMP_HEADER_SIZE
    assert np.array_equal(codecs.decode_bmp(data), img)


def test_bmp_top_down_decode():
    # negative height = top-down row order (other encoders emit this)
    img = _img(7)
    data = bytearray(codecs.encode_bmp(img[::-1]))
    h = img.shape[0]
    struct.pack_into("<i", data, 22, -h)
    assert np.array_equal(codecs.decode_bmp(bytes(data)), img)


def test_bmp_dispatch_and_rejects():
    img = _img(8)
    assert np.array_equal(codecs.decode(codecs.encode(img, "bmp"), "bmp"), img)
    with pytest.raises(ValueError):
        codecs.decode_bmp(b"notbmp")


# ------------------------------------------------------------------- GIF
# GIF89a + pure-python LZW (round 5 — the last container the header
# sniffer recognized without a decoder). Exact round trip when the
# image fits one 256-color palette; 3-3-2 quantized otherwise.


def _pal_img(w=83, h=60, n=17, seed=7):
    rs = np.random.RandomState(seed)
    pal = rs.randint(0, 256, size=(n, 3)).astype(np.uint8)
    return pal[rs.randint(0, n, size=(h, w))]


def test_gif_exact_roundtrip_small_palette():
    img = _pal_img()
    out = codecs.decode_gif(codecs.encode_gif(img))
    assert np.array_equal(out, img)


def test_gif_quantized_roundtrip_truecolor():
    """>256 unique colors → the documented 3-3-2 lossy fallback;
    decode returns EXACTLY the quantized palette mapping (no drift)."""
    rs = np.random.RandomState(11)
    noise = rs.randint(0, 256, size=(120, 140, 3), dtype=np.uint8)
    out = codecs.decode_gif(codecs.encode_gif(noise))
    assert np.array_equal(out, codecs.quantize_332(noise))


def test_gif_lzw_dictionary_overflow_clear():
    """An image large enough to overflow the 4096-entry LZW dictionary
    forces mid-stream clear codes and full 12-bit width — the decoder
    must resynchronize bit-exactly."""
    rs = np.random.RandomState(13)
    big = rs.randint(0, 256, size=(300, 400, 3), dtype=np.uint8)
    out = codecs.decode_gif(codecs.encode_gif(big))
    assert np.array_equal(out, codecs.quantize_332(big))


def test_gif_interlaced_roundtrip():
    img = _pal_img(seed=3)
    data = codecs.encode_gif(img, interlace=True)
    flag_at = 6 + 7 + 768 + 9  # sig + LSD + GCT + descriptor packed byte
    assert data[flag_at] & 0x40  # interlace flag actually set
    assert np.array_equal(codecs.decode_gif(data), img)
    # the flag is load-bearing: stripping it yields the raw transmission
    # (pass-order) rows — a real permutation of the image, not the image
    stripped = (
        data[:flag_at] + bytes([data[flag_at] & ~0x40]) + data[flag_at + 1 :]
    )
    raw = codecs.decode_gif(stripped)
    assert not np.array_equal(raw, img)
    assert np.array_equal(raw, img[codecs._interlace_order(img.shape[0])])


def test_gif_extension_blocks_and_local_color_table():
    """A spec-shaped GIF from the wild: graphic-control extension before
    the image descriptor, palette delivered as a LOCAL color table.
    Built by re-packing this repo's encoder output — framing offsets
    are fixed by the spec, so the surgery is deterministic."""
    img = _pal_img(seed=5)
    data = codecs.encode_gif(img)
    sig, lsd, gct = data[:6], data[6:13], data[13 : 13 + 768]
    rest = data[13 + 768 :]  # image descriptor .. trailer
    # drop the GCT flag from the logical screen descriptor
    lsd2 = lsd[:4] + bytes([lsd[4] & 0x7F]) + lsd[5:]
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control ext
    comment = b"\x21\xfe\x05hello\x00"  # comment ext, 5-byte block
    # set the LCT flag (bit 7) + size 7 (256 entries) on the packed
    # byte — descriptor is 10 bytes: 0x2C + left/top/w/h u16s + packed
    desc2 = rest[:9] + bytes([rest[9] | 0x87])
    rebuilt = sig + lsd2 + gce + comment + desc2 + gct + rest[10:]
    assert np.array_equal(codecs.decode_gif(rebuilt), img)


def test_gif_single_color_and_dispatch():
    flat = np.full((33, 50, 3), 42, dtype=np.uint8)
    assert np.array_equal(codecs.decode(codecs.encode(flat, "gif"), "gif"), flat)


def test_gif_rejects():
    with pytest.raises(ValueError):
        codecs.decode_gif(b"NOTAGIF" + b"\x00" * 32)
    with pytest.raises(ValueError):
        codecs.decode_gif(codecs.encode_gif(_pal_img())[:-20] * 0 + b"GIF89a")


def test_gif_header_dims_match_sniffer_offsets():
    """The multimodal sniffer reads w/h as little-endian u16 at byte
    offsets 6/8 — the encoder must put them there."""
    img = _pal_img(w=307, h=149)
    data = codecs.encode_gif(img)
    assert data[:6] == b"GIF89a"
    w, h = struct.unpack_from("<HH", data, 6)
    assert (w, h) == (307, 149)


def test_gif_decode_bytes_integration():
    from ccbot_spark.functions import multimodal

    img = _pal_img(seed=9)
    out = multimodal.decode_bytes(codecs.encode_gif(img), "gif")
    assert np.array_equal(out, img)


@pytest.mark.parametrize("shape", [(1, 1), (5, 7), (8, 8), (13, 20), (64, 48)])
def test_png_adam7_roundtrip(shape):
    """Adam7 interlaced PNG (what progressive-rendering sites serve):
    encode→decode is pixel-exact, including shapes whose late passes
    are empty, and equals the non-interlaced decode of the same
    pixels."""
    h, w = shape
    rs = np.random.RandomState(h * 100 + w)
    img = rs.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    data = codecs.encode_png(img, interlace=True)
    assert data[28] == 1  # IHDR interlace byte
    assert np.array_equal(codecs.decode_png(data), img)
    assert np.array_equal(
        codecs.decode_png(codecs.encode_png(img)), img
    )


def test_png_adam7_per_pass_filters():
    """Each Adam7 pass filters independently (its first scanline has no
    'previous' line): a handmade stream using filter 2 (Up) inside
    every pass must decode exactly."""
    import struct as _s
    import zlib as _z

    rs = np.random.RandomState(3)
    h, w = 11, 9
    img = rs.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    parts = []
    for x0, y0, dx, dy in codecs._ADAM7:
        sub = img[y0::dy, x0::dx]
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            continue
        flat = sub.reshape(ph, pw * 3).astype(np.int32)
        for y in range(ph):
            prev = flat[y - 1] if y > 0 else np.zeros(pw * 3, np.int32)
            parts.append(b"\x02" + bytes(((flat[y] - prev) & 0xFF).astype(np.uint8)))
    ihdr = _s.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)
    data = (
        codecs.PNG_SIG
        + codecs._chunk(b"IHDR", ihdr)
        + codecs._chunk(b"IDAT", _z.compress(b"".join(parts)))
        + codecs._chunk(b"IEND", b"")
    )
    assert np.array_equal(codecs.decode_png(data), img)


def test_gif_anim_roundtrip_and_meta():
    """Animated GIF: encode_gif_anim → decode_gif_frames is pixel-exact
    per frame (≤256 colors each); the block-structure meta walk counts
    frames and sums delays without decoding; a single-frame GIF yields
    exactly decode_gif's output."""
    rs = np.random.RandomState(7)
    frames = [
        rs.randint(0, 256, size=(13, 17, 3), dtype=np.uint8)
        for _ in range(4)
    ]
    data = codecs.encode_gif_anim(frames, delay_cs=6)
    got = codecs.decode_gif_frames(data)
    assert len(got) == 4
    for g, want in zip(got, frames):
        assert np.array_equal(g, want)
    assert codecs.gif_anim_meta_py(data) == (4, 24)
    # decode_gif (first-frame contract) agrees with frame 0
    assert np.array_equal(codecs.decode_gif(data), frames[0])
    # single-frame (global-table) GIF: one frame, meta (1, 0) — the
    # still encoder emits no GCE
    still = codecs.encode_gif(frames[0])
    sf = codecs.decode_gif_frames(still)
    assert len(sf) == 1 and np.array_equal(sf[0], codecs.decode_gif(still))
    assert codecs.gif_anim_meta_py(still) == (1, 0)
    # malformed / non-GIF → (None, None)
    assert codecs.gif_anim_meta_py(b"GIF89a" + b"\x00" * 4) == (None, None)
    assert codecs.gif_anim_meta_py(b"\x89PNG\r\n\x1a\n") == (None, None)


def test_gif_anim_partial_frame_composites():
    """A frame declared at (left, top) smaller than the canvas pastes
    over the previous frame — the 'do not dispose' web-GIF case."""
    import struct as _s

    base = np.zeros((8, 8, 3), dtype=np.uint8)
    base[:, :] = (10, 20, 30)
    data = bytearray(codecs.encode_gif_anim([base], delay_cs=5))
    assert data[-1] == 0x3B
    patch = np.zeros((2, 3, 3), dtype=np.uint8)
    patch[:, :] = (200, 100, 50)
    colors = np.zeros((256, 3), dtype=np.uint8)
    colors[0] = (200, 100, 50)
    blk = bytearray()
    blk += _s.pack("<BBBBHBB", 0x21, 0xF9, 4, 0x04, 7, 0, 0)
    blk += _s.pack("<BHHHHB", 0x2C, 4, 3, 3, 2, 0x87)
    blk += colors.tobytes()
    blk.append(8)
    blk += codecs._subblocks(codecs._lzw_encode(np.zeros(6, np.uint8), 8))
    data = bytes(data[:-1]) + bytes(blk) + b"\x3b"
    frames = codecs.decode_gif_frames(data)
    assert len(frames) == 2
    want = frames[0].copy()
    want[3:5, 4:7] = (200, 100, 50)
    assert np.array_equal(frames[1], want)
    assert codecs.gif_anim_meta_py(data) == (2, 12)
