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


# Adam7 interlace passes: (x0, y0, dx, dy) — the spec's fixed grid.
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def encode_png(img: np.ndarray, interlace: bool = False) -> bytes:
    """8-bit RGB PNG, filter type 0 on every scanline. `interlace=True`
    emits the Adam7 pass structure (what progressive-rendering sites
    serve); default output stays byte-identical to the historical
    encoder."""
    img = img.astype(np.uint8)
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1 if interlace else 0)
    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx]
            ph, pw = sub.shape[:2]
            if ph == 0 or pw == 0:
                continue  # empty pass contributes no bytes (per spec)
            raw = np.empty((ph, 1 + pw * 3), dtype=np.uint8)
            raw[:, 0] = 0
            raw[:, 1:] = sub.reshape(ph, pw * 3)
            parts.append(raw.tobytes())
        idat = zlib.compress(b"".join(parts), 6)
    else:
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
    interlace = 0
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bitdepth, color_type = struct.unpack(">IIBB", payload[:10])
            interlace = payload[12]
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if bitdepth != 8 or color_type not in (0, 2):
        raise ValueError("only 8-bit gray/RGB PNG supported")
    if interlace not in (0, 1):
        raise ValueError(f"unknown PNG interlace method {interlace}")
    channels = 3 if color_type == 2 else 1
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if interlace == 1:
        # Adam7: seven independently-filtered sub-images, concatenated
        # in pass order; each pass's scanlines reference only that
        # pass's previous line, so _unfilter applies per pass.
        img = np.zeros((h, w, channels), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            stride = pw * channels
            n = ph * (1 + stride)
            sub = raw[pos : pos + n].reshape(ph, 1 + stride)
            pos += n
            px = _unfilter(sub, ph, stride, channels)
            img[y0::dy, x0::dx] = px.reshape(ph, pw, channels)
    else:
        stride = w * channels
        px = _unfilter(raw.reshape(h, 1 + stride), h, stride, channels)
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


# ---------------------------------------------------------------- JPEG
#
# Baseline sequential DCT JPEG (ITU-T T.81, public standard): encoder and
# decoder in pure numpy + stdlib. 4:4:4 (no chroma subsampling) so the
# lossy error is quantization-only — at the default quality the round
# trip stays above the PSNR ≥ 40 dB gate even on full-entropy noise
# images. Quant + Huffman tables are the T.81 Annex K examples; the
# decoder reads every table from the file, accepts SOF0/SOF1, generic
# per-component sampling factors, restart intervals, and grayscale.

JPEG_QUALITY = 98  # default: keeps PSNR ≥ 40 dB on random-noise pixels

# Annex K.1 / K.2 quantization tables (natural row-major order).
_JQ_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_JQ_CHR = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Zigzag sequence: ZIG[k] = row-major index of the k-th zigzag coefficient.
_ZIG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.3-K.6 Huffman table specs: (BITS[1..16], HUFFVAL).
_JH_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_JH_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_JH_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_JH_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# Orthonormal 8×8 DCT-II matrix: forward D = M A Mᵀ, inverse A = Mᵀ D M.
_jk = np.arange(8)
_JDCT = np.cos(np.pi * (2.0 * _jk[None, :] + 1.0) * _jk[:, None] / 16.0)
_JDCT *= 0.5
_JDCT[0, :] *= np.sqrt(0.5)


def _jpeg_qtables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    quality = max(1, min(100, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    lum = np.clip((_JQ_LUM * scale + 50) // 100, 1, 255)
    chr_ = np.clip((_JQ_CHR * scale + 50) // 100, 1, 255)
    return lum, chr_


def _huff_encode_table(bits: list, vals: list) -> dict:
    """Canonical code assignment → {symbol: (code, length)}."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(bits: list, vals: list) -> dict:
    """{(length, code): symbol} for the bit-serial decoder."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _JBitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 §B.1.1.5)
                self.buf.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad final byte with 1s


def _jmag(v: int) -> tuple[int, int]:
    """(category, amplitude bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    s = abs(v).bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    f = img.astype(np.float64)
    r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=2)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


def _plane_to_qblocks(plane: np.ndarray, qtable: np.ndarray) -> np.ndarray:
    """Level-shift → pad to 8 multiples (edge replicate) → batched DCT →
    quantize → zigzag. Returns int32 (n_blocks, 64) in MCU scan order."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    if (ph, pw) != (h, w):
        plane = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = (
        plane.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        - 128.0
    )
    freq = np.matmul(np.matmul(_JDCT, blocks), _JDCT.T)
    q = np.round(freq / qtable.reshape(8, 8)).astype(np.int32)
    return q.reshape(-1, 64)[:, _ZIG]


def _encode_block(
    bw: _JBitWriter, zz: np.ndarray, dc_prev: int, dc_tab: dict, ac_tab: dict
) -> int:
    dc = int(zz[0])
    s, amp = _jmag(dc - dc_prev)
    code, length = dc_tab[s]
    bw.write(code, length)
    if s:
        bw.write(amp, s)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = int(nz[-1]) + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tab[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s, amp = _jmag(v)
        code, length = ac_tab[(run << 4) | s]
        bw.write(code, length)
        bw.write(amp, s)
        run = 0
    if last < 63:
        code, length = ac_tab[0x00]  # EOB
        bw.write(code, length)
    return dc


def exif_app1(orientation: int | None, gps: bool = False) -> bytes:
    """Minimal spec-valid Exif APP1 segment. IFD0 carries the
    orientation tag (0x0112, SHORT) when `orientation` is set, and —
    when `gps` — the GPS IFD pointer (0x8825, LONG) to a one-entry GPS
    IFD (GPSVersionID 0x0000, BYTE×4 = 2.3.0.0): the smallest
    structure a compliant reader resolves as "this image carries GPS
    metadata", which is all the privacy audit needs to detect (real
    cameras hang rational lat/long off the same pointer).
    Little-endian TIFF header ('II'), IFD0 at offset 8, zero next-IFD
    pointers. What every camera writes, reduced to the tags the
    training pipeline must honor or scrub."""
    if orientation is not None and not 1 <= orientation <= 8:
        raise ValueError(f"EXIF orientation must be 1..8, got {orientation}")
    if orientation is None and not gps:
        raise ValueError("empty APP1: need orientation and/or gps")
    entries = []
    if orientation is not None:
        entries.append(struct.pack("<HHIHH", 0x0112, 3, 1, orientation, 0))
    n = len(entries) + (1 if gps else 0)
    gps_off = 8 + 2 + 12 * n + 4  # header + count + entries + next ptr
    if gps:
        entries.append(struct.pack("<HHII", 0x8825, 4, 1, gps_off))
    tiff = (
        b"II*\x00" + struct.pack("<I", 8)  # TIFF header, IFD0 @ 8
        + struct.pack("<H", n)
        + b"".join(entries)
        + struct.pack("<I", 0)  # no next IFD
    )
    if gps:
        tiff += (
            struct.pack("<H", 1)
            + struct.pack("<HHI", 0x0000, 1, 4) + b"\x02\x03\x00\x00"
            + struct.pack("<I", 0)
        )
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", 2 + len(payload)) + payload


def encode_jpeg(
    img: np.ndarray,
    quality: int = JPEG_QUALITY,
    restart_interval: int = 0,
    exif_orientation: int | None = None,
) -> bytes:
    """Baseline sequential JPEG. (h, w, 3) RGB → 3-component 4:4:4;
    (h, w) → single-component grayscale. `restart_interval` > 0 emits
    DRI + RSTn markers every that many MCUs. `exif_orientation` (1..8)
    emits an Exif APP1 right after the JFIF APP0; None (default) keeps
    output byte-identical to the historical encoder."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qlum, qchr = _jpeg_qtables(quality)
    if gray:
        planes = [img.astype(np.float64)]
    else:
        ycc = _rgb_to_ycbcr(img)
        planes = [ycc[:, :, 0], ycc[:, :, 1], ycc[:, :, 2]]
    qtabs = [qlum] + [qchr] * (len(planes) - 1)
    comp_blocks = [_plane_to_qblocks(p, q) for p, q in zip(planes, qtabs)]

    dc_l = _huff_encode_table(*_JH_DC_LUM)
    ac_l = _huff_encode_table(*_JH_AC_LUM)
    dc_c = _huff_encode_table(*_JH_DC_CHR)
    ac_c = _huff_encode_table(*_JH_AC_CHR)
    htabs = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (len(planes) - 1)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    if exif_orientation is not None:
        out += exif_app1(exif_orientation)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(qlum[_ZIG].astype(np.uint8))
    if not gray:
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" + bytes(qchr[_ZIG].astype(np.uint8))
    ncomp = len(planes)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        out += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    for cls, tid, (bits, vals) in (
        (0, 0, _JH_DC_LUM), (1, 0, _JH_AC_LUM), (0, 1, _JH_DC_CHR), (1, 1, _JH_AC_CHR)
    ):
        if gray and tid == 1:
            continue
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 AhAl=0

    bw = _JBitWriter()
    dc_prev = [0] * ncomp
    n_mcus = comp_blocks[0].shape[0]
    rst = 0
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            bw.buf += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            dc_prev = [0] * ncomp
        for ci in range(ncomp):
            dc_prev[ci] = _encode_block(
                bw, comp_blocks[ci][m], dc_prev[ci], htabs[ci][0], htabs[ci][1]
            )
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _JBitReader:
    """Bit-serial reader over one entropy-coded segment (stuffing already
    removed by the segment splitter)."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                return 0  # pad past segment end (spec-tolerant)
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table: dict) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map s received bits back to a signed amplitude."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _split_scan(data: bytes, pos: int) -> list:
    """Entropy-coded data from `pos` → list of unstuffed segments split
    at RSTn markers; stops at any other marker."""
    segs, cur = [], bytearray()
    n = len(data)
    while pos < n:
        b = data[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        nxt = data[pos + 1] if pos + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= nxt <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:
            break
    segs.append(bytes(cur))
    return segs


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline (SOF0/SOF1) JPEG → (h, w, 3) uint8 RGB.
    Handles grayscale, generic sampling factors, restart markers."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qtables: dict = {}
    htables: dict = {}
    comps: list = []
    h = w = None
    restart_interval = 0
    scan_comps = None
    pos = 2
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        seg = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT (may hold several tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq:
                    vals = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(np.int64)
                    i += 128
                else:
                    vals = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(np.int64)
                    i += 64
                tbl = np.zeros(64, dtype=np.int64)
                tbl[_ZIG] = vals  # stored zigzag → natural order
                qtables[tq] = tbl
        elif marker == 0xC4:  # DHT (may hold several tables)
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nv])
                htables[(cls, tid)] = _huff_decode_table(bits, vals)
                i += 17 + nv
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1 (baseline Huffman)
            _prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG SOF type 0x{marker:02x} (not baseline)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for ci in range(ns):
                cid, tt = seg[1 + 2 * ci : 3 + 2 * ci]
                scan_comps.append((cid, tt >> 4, tt & 0x0F))
            break  # entropy-coded data follows
    if h is None or scan_comps is None:
        raise ValueError("JPEG missing SOF/SOS")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    order = []  # per-MCU block emission order: (comp, block_row, block_col)
    for cid, dci, aci in scan_comps:
        c = by_id[cid]
        c["dc_tab"] = htables[(0, dci)]
        c["ac_tab"] = htables[(1, aci)]
        c["bx"] = mcus_x * c["h"]
        c["by"] = mcus_y * c["v"]
        c["coef"] = np.zeros((c["by"] * c["bx"], 64), dtype=np.int64)
        for v in range(c["v"]):
            for hh in range(c["h"]):
                order.append((c, v, hh))

    segs = _split_scan(data, pos)
    seg_i = 0
    br = _JBitReader(segs[0])
    dc_prev = {c["id"]: 0 for c in comps}
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            seg_i += 1
            if seg_i < len(segs):
                br = _JBitReader(segs[seg_i])
            dc_prev = {c["id"]: 0 for c in comps}
        my, mx = divmod(m, mcus_x)
        for c, v, hh in order:
            zz = np.zeros(64, dtype=np.int64)
            s = br.decode_huff(c["dc_tab"])
            diff = _extend(br.receive(s), s) if s else 0
            dc_prev[c["id"]] += diff
            zz[0] = dc_prev[c["id"]]
            k = 1
            while k < 64:
                rs = br.decode_huff(c["ac_tab"])
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r == 15:  # ZRL
                        k += 16
                        continue
                    break  # EOB
                k += r
                if k > 63:
                    raise ValueError("JPEG AC coefficient overflow")
                zz[k] = _extend(br.receive(s), s)
                k += 1
            row = my * c["v"] + v
            col = mx * c["h"] + hh
            c["coef"][row * c["bx"] + col] = zz

    # Dequantize + batched IDCT per component, then assemble planes.
    planes = []
    for c in comps:
        q = qtables[c["tq"]]
        blocks = np.zeros((c["coef"].shape[0], 64), dtype=np.float64)
        blocks[:, _ZIG] = c["coef"] * q[_ZIG]
        blocks = blocks.reshape(-1, 8, 8)
        pix = np.matmul(np.matmul(_JDCT.T, blocks), _JDCT) + 128.0
        plane = (
            pix.reshape(c["by"], c["bx"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["by"] * 8, c["bx"] * 8)
        )
        if c["h"] < hmax or c["v"] < vmax:
            plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])


# ---------------------------------------------------------------- GIF
#
# GIF89a (CompuServe spec, public standard): palette-indexed raster +
# variable-width LZW, the last container the header sniffer recognizes
# that previously had no decoder (VERDICT r4 item 5). Pure python +
# numpy, no deps.
#
#   * encode_gif: exact palette when the image has ≤ 256 unique colors
#     (lossless round trip); otherwise quantizes to the fixed 3-3-2
#     palette (256 colors) — the honest lossy fallback, analogous to
#     qpng's 6-bit quantization but bounded by GIF's 256-color model.
#   * decode_gif: full single-frame reader — global AND local color
#     tables, extension-block skipping, interlaced row order, 12-bit
#     LZW with mid-stream clear codes.

GIF_SIGS = (b"GIF87a", b"GIF89a")


def quantize_332(img: np.ndarray) -> np.ndarray:
    """3-3-2 palette reconstruction (what a >256-color image becomes
    after encode_gif → decode_gif). Midpoint-free: each level maps to
    level * 255 // (levels - 1), the canonical uniform palette."""
    img = img.astype(np.uint8)
    r = ((img[..., 0] >> 5).astype(np.uint16) * 255 // 7).astype(np.uint8)
    g = ((img[..., 1] >> 5).astype(np.uint16) * 255 // 7).astype(np.uint8)
    b = ((img[..., 2] >> 6).astype(np.uint16) * 255 // 3).astype(np.uint8)
    return np.stack([r, g, b], axis=-1)


def _palette_332() -> np.ndarray:
    i = np.arange(256, dtype=np.uint16)
    r = ((i >> 5) & 7) * 255 // 7
    g = ((i >> 2) & 7) * 255 // 7
    b = (i & 3) * 255 // 3
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> np.ndarray:
    """Row indices in GIF interlace transmission order (4 passes)."""
    return np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    ).astype(np.int64)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW: codes LSB-first, start width min+1, clear code
    2^min, EOI clear+1, dictionary capped at 4096 (re-clear)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prefix = b""
    for sym in indices.tobytes():
        cand = prefix + bytes([sym])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], width)
        if next_code < 4096:
            table[cand] = next_code
            # widen AFTER assigning: the decoder widens when its next
            # assignment would not fit the current width
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = bytes([sym])
    if prefix:
        emit(table[prefix], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    acc = 0
    nbits = 0
    pos = 0
    out = bytearray()
    prev: bytes | None = None
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"bad LZW code {code}")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out[:n_pixels])


def _subblocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)  # block terminator
    return bytes(out)


def encode_gif(img: np.ndarray, interlace: bool = False) -> bytes:
    img = img.astype(np.uint8)
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) <= 256:
        palette = np.zeros((256, 3), dtype=np.uint8)
        palette[: len(colors)] = colors
        indices = inverse.astype(np.uint8).reshape(h, w)
    else:
        palette = _palette_332()
        indices = (
            ((flat[:, 0].astype(np.uint16) >> 5) << 5)
            | ((flat[:, 1].astype(np.uint16) >> 5) << 2)
            | (flat[:, 2].astype(np.uint16) >> 6)
        ).astype(np.uint8).reshape(h, w)
    if interlace:
        indices = indices[_interlace_order(h)]
    out = bytearray(b"GIF89a")
    # logical screen descriptor: GCT present, 8-bit color res, 256 entries
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    out += palette.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
    out.append(8)  # LZW minimum code size
    out += _subblocks(_lzw_encode(indices.reshape(-1), 8))
    out.append(0x3B)  # trailer
    return bytes(out)


def decode_gif(data: bytes) -> np.ndarray:
    if data[:6] not in GIF_SIGS:
        raise ValueError("not a GIF")
    if len(data) < 13:
        raise ValueError("truncated GIF")
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x21:  # extension: label + sub-blocks, all skipped
            pos += 1
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor — first frame wins
            _left, _top, w, h, ipacked = struct.unpack_from("<HHHHB", data, pos)
            pos += 9
            table = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                table = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if table is None:
                raise ValueError("GIF frame has no color table")
            min_code = data[pos]
            pos += 1
            stream = bytearray()
            while data[pos]:
                ln = data[pos]
                stream += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = np.frombuffer(
                _lzw_decode(bytes(stream), min_code, w * h), np.uint8
            ).reshape(h, w)
            if ipacked & 0x40:  # interlaced: invert the pass order
                rows = np.empty(h, dtype=np.int64)
                rows[_interlace_order(h)] = np.arange(h)
                idx = idx[rows]
            return table[idx].copy()
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"bad GIF block 0x{block:02x}")
    raise ValueError("no image data in GIF")


def _gif_frame_block(img: np.ndarray, delay_cs: int) -> bytes:
    """One animation frame: Graphic Control Extension (delay, no
    transparency, disposal 'do not dispose') + image descriptor with a
    LOCAL color table + LZW data. Local tables per frame keep each
    frame's palette exact without coordinating a global one."""
    img = img.astype(np.uint8)
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) <= 256:
        palette = np.zeros((256, 3), dtype=np.uint8)
        palette[: len(colors)] = colors
        indices = inverse.astype(np.uint8).reshape(h, w)
    else:
        palette = _palette_332()
        indices = (
            ((flat[:, 0].astype(np.uint16) >> 5) << 5)
            | ((flat[:, 1].astype(np.uint16) >> 5) << 2)
            | (flat[:, 2].astype(np.uint16) >> 6)
        ).astype(np.uint8).reshape(h, w)
    out = bytearray()
    out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0x04, delay_cs, 0, 0)
    # descriptor: at (0,0), full frame, LOCAL color table (256 entries)
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x87)
    out += palette.tobytes()
    out.append(8)
    out += _subblocks(_lzw_encode(indices.reshape(-1), 8))
    return bytes(out)


def encode_gif_anim(frames: list, delay_cs: int = 10) -> bytes:
    """Animated GIF89a: NETSCAPE2.0 infinite-loop extension + one
    GCE/descriptor/LZW block per frame (all frames full-size at (0,0),
    local color tables, no transparency). Frames must share one
    shape."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    out = bytearray(b"GIF89a")
    # logical screen: NO global color table (every frame carries one)
    out += struct.pack("<HHBBB", w, h, 0x70, 0, 0)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"  # loop forever
    for fr in frames:
        if fr.shape[:2] != (h, w):
            raise ValueError("animation frames must share one shape")
        out += _gif_frame_block(fr, delay_cs)
    out.append(0x3B)
    return bytes(out)


def decode_gif_frames(data: bytes) -> list:
    """Every frame of a (possibly animated) GIF as full-canvas RGB
    arrays: frames composite onto the logical screen at their declared
    (left, top) over the previous frame ('do not dispose' semantics —
    the common web-GIF case; transparency is out of the closed world).
    A single-frame GIF yields a one-element list whose frame equals
    decode_gif's output."""
    if data[:6] not in GIF_SIGS:
        raise ValueError("not a GIF")
    if len(data) < 13:
        raise ValueError("truncated GIF")
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
    frames: list = []
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x21:  # extension (incl. GCE/NETSCAPE): skipped
            pos += 1
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:
            left, top, w, h, ipacked = struct.unpack_from("<HHHHB", data, pos)
            pos += 9
            table = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                table = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if table is None:
                raise ValueError("GIF frame has no color table")
            min_code = data[pos]
            pos += 1
            stream = bytearray()
            while data[pos]:
                ln = data[pos]
                stream += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = np.frombuffer(
                _lzw_decode(bytes(stream), min_code, w * h), np.uint8
            ).reshape(h, w)
            if ipacked & 0x40:
                rows = np.empty(h, dtype=np.int64)
                rows[_interlace_order(h)] = np.arange(h)
                idx = idx[rows]
            canvas[top : top + h, left : left + w] = table[idx]
            frames.append(canvas.copy())
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"bad GIF block 0x{block:02x}")
    if not frames:
        raise ValueError("no image data in GIF")
    return frames


def gif_anim_meta_py(data: bytes) -> tuple:
    """(n_frames, duration_cs) by BLOCK-STRUCTURE walk alone — image
    descriptors counted, GCE delays summed, LZW data skipped by
    sub-block lengths, never decoded. The header-tier animation probe
    (a 50 MB GIF costs a few thousand byte reads); malformed →
    (None, None)."""
    if data[:6] not in GIF_SIGS or len(data) < 13:
        return None, None
    packed = data[10]
    pos = 13
    if packed & 0x80:
        pos += (2 << (packed & 0x07)) * 3
    n_frames = 0
    duration = 0
    try:
        while pos < len(data):
            block = data[pos]
            pos += 1
            if block == 0x21:
                label = data[pos]
                pos += 1
                if label == 0xF9 and data[pos] >= 4:
                    duration += struct.unpack_from("<H", data, pos + 2)[0]
                while data[pos]:
                    pos += 1 + data[pos]
                pos += 1
            elif block == 0x2C:
                ipacked = data[pos + 8]
                pos += 9
                if ipacked & 0x80:
                    pos += (2 << (ipacked & 0x07)) * 3
                pos += 1  # LZW min code size
                while data[pos]:
                    pos += 1 + data[pos]
                pos += 1
                n_frames += 1
            elif block == 0x3B:
                break
            else:
                return None, None
    except IndexError:
        return None, None
    return (n_frames, duration) if n_frames else (None, None)


# ---------------------------------------------------------------- dispatch

def webp_header(w: int, h: int, kind: str = "vp8x") -> bytes:
    """Spec-valid WebP container header (RIFF/WEBP) with the dims
    encoded exactly as the chosen first chunk carries them — VP8X
    (24-bit canvas-1), VP8L (two packed 14-bit dims-1 after the 0x2F
    signature), or lossy VP8 (14-bit u16 dims after the 9D012A start
    code) — and NO coded payload: the recognize-and-measure tier the
    sniffer already applies to mp4/webm (a VP8/VP8L entropy codec is
    out of the closed world). What a real muxer writes up to the first
    coded byte."""
    if kind == "vp8x":
        chunk = b"VP8X" + struct.pack("<I", 10) + b"\x00\x00\x00\x00"
        chunk += struct.pack("<I", w - 1)[:3] + struct.pack("<I", h - 1)[:3]
    elif kind == "vp8l":
        if not (1 <= w <= 16384 and 1 <= h <= 16384):
            raise ValueError("VP8L dims are 14-bit")
        packed = (w - 1) | ((h - 1) << 14)  # + alpha/version bits = 0
        chunk = b"VP8L" + struct.pack("<I", 5) + b"\x2f" + struct.pack("<I", packed)
        chunk += b"\x00"  # even-size padding per RIFF
    elif kind == "vp8":
        if not (1 <= w < 16384 and 1 <= h < 16384):
            raise ValueError("VP8 dims are 14-bit")
        chunk = (
            b"VP8 " + struct.pack("<I", 10)
            + b"\x00\x00\x00"  # frame tag (key frame)
            + b"\x9d\x01\x2a"  # start code
            + struct.pack("<HH", w, h)
        )
    else:
        raise ValueError(f"unknown webp chunk kind {kind!r}")
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def tiff_header(
    little_endian: bool = True,
    w: int | None = None,
    h: int | None = None,
    long_type: bool = False,
) -> bytes:
    """Minimal structurally-valid TIFF: byte-order mark, magic 42, one
    IFD. Bare call (no dims) emits an empty IFD — the recognize-only
    fixture. With dims, IFD0 carries ImageWidth (0x0100) and
    ImageLength (0x0101) as SHORT or (long_type) LONG entries, value
    inline — exactly where every real TIFF writer puts them, read back
    by multimodal.tiff_dims' bounded IFD walk."""
    e = "<" if little_endian else ">"
    bom = b"II" if little_endian else b"MM"
    out = bom + struct.pack(e + "H", 42) + struct.pack(e + "I", 8)
    if w is None:
        return out + struct.pack(e + "H", 0) + struct.pack(e + "I", 0)
    typ = 4 if long_type else 3
    def entry(tag: int, val: int) -> bytes:
        if long_type:
            return struct.pack(e + "HHII", tag, typ, 1, val)
        # SHORT value sits in the FIRST two bytes of the 4-byte slot
        return struct.pack(e + "HHIHH", tag, typ, 1, val, 0)
    return (
        out + struct.pack(e + "H", 2)
        + entry(0x0100, w) + entry(0x0101, h)
        + struct.pack(e + "I", 0)
    )


def encode(img: np.ndarray, fmt: str) -> bytes:
    if fmt == "ppm":
        return encode_ppm(img)
    if fmt == "png":
        return encode_png(img)
    if fmt == "qpng":
        return encode_qpng(img)
    if fmt == "bmp":
        return encode_bmp(img)
    if fmt in ("jpeg", "jpg"):
        return encode_jpeg(img)
    if fmt == "gif":
        return encode_gif(img)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode(data: bytes, fmt: str) -> np.ndarray:
    """Decode to (h, w, 3) uint8. qpng decodes as plain PNG."""
    if fmt == "ppm":
        return decode_ppm(data)
    if fmt in ("png", "qpng"):
        return decode_png(data)
    if fmt == "bmp":
        return decode_bmp(data)
    if fmt in ("jpeg", "jpg"):
        return decode_jpeg(data)
    if fmt == "gif":
        return decode_gif(data)
    raise ValueError(f"unknown fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
