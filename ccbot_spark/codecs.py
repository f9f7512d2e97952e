"""Image codecs: PPM (P6), PNG (stdlib zlib), qPNG (quantized/lossy PNG).

No Pillow/imageio in the environment (SURVEY.md §7.4 item 4), so the
decode/encode path is numpy + stdlib. Closed world of formats
(FIXTURES.md §2.2): 'ppm' and 'png' are lossless (exact pixel match),
'qpng' quantizes to 6 bits/channel before PNG-encoding — the lossy path
that exercises the PSNR ≥ 40 dB gate (BASELINE.json input_hint: 6-bit
quantization gives PSNR ≈ 42.9 dB on procedural images).

All functions operate on uint8 arrays of shape (h, w, 3).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------- PPM (P6)

def encode_ppm(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header: magic, width, height, maxval — whitespace/comment separated
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval=255 supported")
    arr = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    return arr.reshape(h, w, 3).copy()


# ---------------------------------------------------------------- PNG

def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """8-bit RGB PNG, filter type 0 on every scanline."""
    img = img.astype(np.uint8)
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # bitdepth 8, RGB
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0  # filter byte: None
    raw[:, 1:] = img.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters 0-4. raw: (h, 1+stride) uint8."""
    if not raw[:, 0].any():
        # All scanlines filter 0 (our own encoder's output): no per-line work.
        return np.ascontiguousarray(raw[:, 1:])
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y] = cur.astype(np.uint8)
    return out


def decode_png(data: bytes) -> np.ndarray:
    if not data.startswith(PNG_SIG):
        raise ValueError("not a PNG")
    pos = len(PNG_SIG)
    w = h = None
    color_type = bitdepth = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bitdepth, color_type = struct.unpack(">IIBB", payload[:10])
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if bitdepth != 8 or color_type not in (0, 2):
        raise ValueError("only 8-bit gray/RGB PNG supported")
    channels = 3 if color_type == 2 else 1
    stride = w * channels
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    raw = raw.reshape(h, 1 + stride)
    px = _unfilter(raw, h, stride, channels)
    img = px.reshape(h, w, channels)
    if channels == 1:
        img = np.repeat(img, 3, axis=2)
    return img.copy()


# ---------------------------------------------------------------- BMP

BMP_HEADER_SIZE = 14 + 40  # BITMAPFILEHEADER + BITMAPINFOHEADER


def encode_bmp(img: np.ndarray) -> bytes:
    """24-bit uncompressed BMP (BITMAPINFOHEADER): rows bottom-up, BGR
    channel order, each row padded to a 4-byte boundary. Lossless, like
    ppm/png — the third real container in the closed world."""
    img = img.astype(np.uint8)
    h, w = img.shape[:2]
    row = w * 3
    stride = (row + 3) & ~3
    data_size = stride * h
    file_hdr = b"BM" + struct.pack(
        "<IHHI", BMP_HEADER_SIZE + data_size, 0, 0, BMP_HEADER_SIZE
    )
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0
    )
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row] = img[::-1, :, ::-1].reshape(h, row)
    return file_hdr + info_hdr + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack_from("<I", data, 10)
    hdr_size, w, h, planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", data, 14
    )
    if bpp != 24 or compression != 0:
        raise ValueError("only 24-bit uncompressed BMP supported")
    top_down = h < 0
    h = abs(h)
    row = w * 3
    stride = (row + 3) & ~3
    raw = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    px = raw.reshape(h, stride)[:, :row].reshape(h, w, 3)
    if not top_down:
        px = px[::-1]
    return px[:, :, ::-1].copy()  # BGR → RGB


# ---------------------------------------------------------------- qPNG

QUANT_BITS = 2  # drop 2 LSBs → 6 significant bits/channel


def quantize(img: np.ndarray) -> np.ndarray:
    """6-bit quantization with midpoint reconstruction (max err 2 → PSNR≈43dB)."""
    q = (img.astype(np.uint8) >> QUANT_BITS) << QUANT_BITS
    return (q + (1 << (QUANT_BITS - 1))).astype(np.uint8)


def encode_qpng(img: np.ndarray) -> bytes:
    return encode_png(quantize(img))


# ---------------------------------------------------------------- dispatch

def encode(img: np.ndarray, fmt: str) -> bytes:
    if fmt == "ppm":
        return encode_ppm(img)
    if fmt == "png":
        return encode_png(img)
    if fmt == "qpng":
        return encode_qpng(img)
    if fmt == "bmp":
        return encode_bmp(img)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode(data: bytes, fmt: str) -> np.ndarray:
    """Decode to (h, w, 3) uint8. qpng decodes as plain PNG."""
    if fmt == "ppm":
        return decode_ppm(data)
    if fmt in ("png", "qpng"):
        return decode_png(data)
    if fmt == "bmp":
        return decode_bmp(data)
    raise ValueError(f"unknown fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
