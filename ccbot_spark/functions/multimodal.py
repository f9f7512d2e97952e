"""Multimodal (image/audio/video-as-binary) column plumbing.

Pattern: media is an opaque `binary` column + typed metadata columns;
every transform is an Arrow-batched `mapInPandas` so bytes stream
through Python in bounded batches (set
spark.sql.execution.arrow.maxRecordsPerBatch small on wide-blob
tables; never collect() a binary column to the driver).

Real codecs exist for the closed world of formats this repo ships
(ppm / png / qpng / bmp / jpeg via ccbot_spark.codecs — numpy + stdlib
zlib + a pure-numpy baseline T.81 JPEG codec; no Pillow in the
sandbox). Formats outside that world (mp3, mp4) raise
NotImplementedError at the decode boundary by design: the
Spark-side plumbing (schema, batch shape, partitioning) is identical,
only the codec call changes when the real library is present.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from .. import codecs, phash as phash_mod

REAL_FMTS = ("ppm", "png", "qpng", "bmp")
# jpeg joined the closed world in round 5 (pure-numpy baseline T.81 codec
# in ccbot_spark.codecs). Kept out of REAL_FMTS so the historical %3/%4
# fixture-cycle arithmetic in existing oracles stays byte-stable; new
# fixtures opt into the 5-cycle with fmts=ALL_FMTS.
ALL_FMTS = REAL_FMTS + ("jpeg",)
# gif joined in round 5 (GIF89a palette + pure-python LZW in
# ccbot_spark.codecs — the last container the sniffer recognized
# without a decoder). Same stability rule: fixtures opt into the
# 6-cycle with fmts=ALL_FMTS6.
ALL_FMTS6 = ALL_FMTS + ("gif",)

DECODED_META = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
        T.StructField("mean_r", T.IntegerType(), False),
        T.StructField("mean_g", T.IntegerType(), False),
        T.StructField("mean_b", T.IntegerType(), False),
    ]
)

RESIZED = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
    ]
)


def decode_bytes(data: bytes, fmt: str) -> np.ndarray:
    """Decode one blob → (h, w, 3) uint8. Closed-world formats decode
    for real; anything else is explicitly unimplemented (no silent
    fake pixels on the decode path)."""
    if fmt in ALL_FMTS6 or fmt == "jpg":
        return codecs.decode(data, fmt)
    raise NotImplementedError(
        f"codec {fmt!r}: not available in this sandbox (needs Pillow/ffmpeg); "
        "plumbing is format-agnostic — plug the real decoder here"
    )


def synth_images_from_docs(
    docs: DataFrame, fmt_cycle: bool = True, fmts: tuple = REAL_FMTS[:3],
    exif_orient: bool = False,
) -> DataFrame:
    """Deterministic image table derived from `documents` (for tests and
    benchmarks — the driver testdata ships no binary media). One image
    per doc: procedural pixels seeded by doc_id, encoded round-robin
    over `fmts` (default ppm/png/qpng — the historical 3-cycle every
    oracle's doc_id%3 arithmetic assumes; pass REAL_FMTS for the
    4-cycle that adds bmp). Pure function of doc_id ⇒ reproducible
    anywhere. `exif_orient=True` stamps jpeg rows with an Exif APP1
    orientation = 1 + doc_id % 8 (the doc_id % 4 == 3 slice stays
    unstamped — the no-EXIF case a parser must answer NULL on);
    False keeps every historical fixture byte-identical."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                base = d % 150  # docs ≥150 repeat earlier pixel content →
                # real near-duplicates (fmt still varies, so qpng
                # re-encodes make them NEAR-dups, not byte-dups)
                rs = np.random.RandomState(base)
                w = 16 + base * 7 % 97
                h = 16 + base * 11 % 97
                px = rs.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
                fmt = fmts[d % len(fmts)] if fmt_cycle else "ppm"
                if exif_orient and fmt in ("jpeg", "jpg") and d % 4 != 3:
                    data = codecs.encode_jpeg(
                        px, exif_orientation=1 + d % 8
                    )
                else:
                    data = codecs.encode(px, fmt)
                rows.append((f"doc-{d}", data, w, h, fmt))
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt"]
            )

    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType(), False),
            T.StructField("bytes", T.BinaryType(), False),
            T.StructField("w", T.IntegerType(), False),
            T.StructField("h", T.IntegerType(), False),
            T.StructField("fmt", T.StringType(), False),
        ]
    )
    return docs.select("doc_id").mapInPandas(gen, schema=schema)


def gif_anim_meta(
    images: DataFrame, bytes_col: str = "bytes", id_col: str = "image_id"
) -> DataFrame:
    """(n_frames, duration_cs) per GIF — the animation probe that
    separates a still logo from a 400-frame meme BEFORE any decode
    decision. Block-structure walk only (codecs.gif_anim_meta_py):
    image descriptors counted, GCE delays summed, LZW data skipped by
    sub-block lengths, no pixel ever decoded. Unlike the JPEG/TIFF
    head walks this one needs the whole blob (frame blocks interleave
    with data to the trailer), so the honest cost is one Arrow pass
    over the bytes — still structure-reads, not decode work. Non-GIF
    or malformed rows answer NULL."""
    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType(), False),
            T.StructField("n_frames", T.LongType(), True),
            T.StructField("duration_cs", T.LongType(), True),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                n, dur = codecs.gif_anim_meta_py(bytes(getattr(r, bytes_col)))
                rows.append((r.image_id, n, dur))
            yield pd.DataFrame(
                rows, columns=["image_id", "n_frames", "duration_cs"]
            )

    return images.select(
        F.col(id_col).alias("image_id"), F.col(bytes_col).alias(bytes_col)
    ).mapInPandas(gen, schema=schema)


def synth_gif_anims_from_docs(docs: DataFrame) -> DataFrame:
    """Animated-GIF fixture: one animation per doc, 1 + doc_id % 5
    full-size frames at delay 4 + doc_id % 7 centiseconds, pixels
    seeded per (doc, frame). Closed-form frame count and duration so a
    DuckDB oracle re-derives what the animation writer encoded."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                base = d % 150
                w = 8 + base * 7 % 25
                h = 8 + base * 11 % 25
                frames = [
                    np.random.RandomState(base * 10 + f).randint(
                        0, 256, size=(h, w, 3), dtype=np.uint8
                    )
                    for f in range(1 + d % 5)
                ]
                rows.append(
                    (f"doc-{d}", codecs.encode_gif_anim(frames, 4 + d % 7))
                )
            yield pd.DataFrame(rows, columns=["image_id", "bytes"])

    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType(), False),
            T.StructField("bytes", T.BinaryType(), False),
        ]
    )
    return docs.select("doc_id").mapInPandas(gen, schema=schema)


def gif_frames_to_images(
    images: DataFrame,
    every_n: int = 1,
    bytes_col: str = "bytes",
    id_col: str = "image_id",
) -> DataFrame:
    """Every n-th frame of each animated GIF exploded to its own
    image-pipeline row (ppm bytes + dims, id suffixed ``#f<k>``) — the
    GIF twin of videokit's frame_sample→frames_to_ppm bridge, so the
    whole image machinery (phash banded dedup, curation, letterbox,
    WDS export) applies to animation frames with zero new operators.
    One decode per blob; rows multiply by ~n_frames/every_n but each
    output is a single frame."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType(), False),
            T.StructField("frame_no", T.IntegerType(), False),
            T.StructField("bytes", T.BinaryType(), False),
            T.StructField("w", T.IntegerType(), False),
            T.StructField("h", T.IntegerType(), False),
            T.StructField("fmt", T.StringType(), False),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                frames = codecs.decode_gif_frames(
                    bytes(getattr(r, bytes_col))
                )
                for f in range(0, len(frames), every_n):
                    px = frames[f]
                    rows.append(
                        (
                            f"{getattr(r, id_col)}#f{f}",
                            f,
                            codecs.encode_ppm(px),
                            px.shape[1],
                            px.shape[0],
                            "ppm",
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "frame_no", "bytes", "w", "h", "fmt"],
            )

    return images.select(id_col, bytes_col).mapInPandas(gen, schema=schema)


def synth_webp_tiff_from_docs(docs: DataFrame) -> DataFrame:
    """Header-tier WebP/TIFF fixture (the two big web image containers
    outside the closed decodable world): one blob per doc, kind cycling
    vp8x/vp8l/vp8/tiff by doc_id % 4, dims from the same arithmetic as
    synth_images_from_docs — so a DuckDB oracle re-derives exactly what
    the container writer encoded."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                base = d % 150
                w = 16 + base * 7 % 97
                h = 16 + base * 11 % 97
                k = d % 4
                if k == 3:
                    # dims stamped in IFD0 (both byte orders, SHORT and
                    # LONG types cycled) — invisible to the fixed-offset
                    # header_meta sniff, read back by tiff_dims' walk
                    data = codecs.tiff_header(
                        little_endian=d % 8 == 3,
                        w=w, h=h, long_type=d % 3 == 0,
                    )
                else:
                    data = codecs.webp_header(
                        w, h, kind=("vp8x", "vp8l", "vp8")[k]
                    )
                rows.append((f"doc-{d}", data))
            yield pd.DataFrame(rows, columns=["image_id", "bytes"])

    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType(), False),
            T.StructField("bytes", T.BinaryType(), False),
        ]
    )
    return docs.select("doc_id").mapInPandas(gen, schema=schema)


def decode_features(images: DataFrame) -> DataFrame:
    """Decode + feature-extract: (image_id, w, h, fmt, phash, mean RGB).
    Drops the blob on output — downstream analytics never re-reads
    bytes (column pruning keeps the blob out of later scans)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = decode_bytes(bytes(r.bytes), r.fmt)
                means = px.reshape(-1, 3).mean(axis=0).astype(int)
                rows.append(
                    (
                        r.image_id,
                        px.shape[1],
                        px.shape[0],
                        r.fmt,
                        phash_mod.phash64(px),
                        int(means[0]),
                        int(means[1]),
                        int(means[2]),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_META.fields])

    return images.mapInPandas(gen, schema=DECODED_META)


def resize_nearest(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Batch resize (nearest-neighbor, pure numpy indexing) → re-encode
    as ppm. The standard pre-training normalization step shape."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = decode_bytes(bytes(r.bytes), r.fmt)
                h, w = px.shape[:2]
                yi = (np.arange(out_h) * h // out_h).astype(int)
                xi = (np.arange(out_w) * w // out_w).astype(int)
                out = px[yi][:, xi]
                rows.append(
                    (r.image_id, codecs.encode(out, "ppm"), out_w, out_h, "ppm")
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED.fields])

    return images.mapInPandas(gen, schema=RESIZED)


def frame_sample(videos: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling: real for Y4M (round-5 videokit — every
    n-th frame re-encoded as a single-frame clip); compressed
    containers (mp4/webm) still raise at the decode boundary —
    `videokit.decode_y4m`'s NotImplementedError — with the operator
    shape (binary in → exploded frame rows out) unchanged."""
    from . import videokit

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if getattr(r, "fmt", "y4m") == "y4m":
                    frames, fps = videokit.decode_y4m(bytes(r.bytes))
                    for f in range(0, frames.shape[0], every_n):
                        rows.append(
                            (
                                r.image_id,
                                f,
                                videokit.encode_y4m(frames[f : f + 1], fps),
                            )
                        )
                else:
                    decode_bytes(bytes(r.bytes), r.fmt)  # raises: no codec
            yield pd.DataFrame(
                rows, columns=["image_id", "frame_no", "bytes"]
            )

    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType(), False),
            T.StructField("frame_no", T.IntegerType(), False),
            T.StructField("bytes", T.BinaryType(), False),
        ]
    )
    return videos.mapInPandas(gen, schema=schema)


def hash_features(images: DataFrame) -> DataFrame:
    """All three perceptual-hash family members per image — pHash (DCT),
    dHash (gradient sign), aHash (mean sign) — from ONE decode pass
    (the pixels are the cost; three hashes over the same resized gray
    plane are nearly free). A dedup pass unioning band-joins over
    phash AND dhash catches crops/re-encodes each family misses alone;
    the banded join (phash_near_pairs) is hash-agnostic, so feeding it
    the dhash column is a column rename. Output drops the blob."""
    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType(), False),
            T.StructField("phash", T.LongType(), False),
            T.StructField("dhash", T.LongType(), False),
            T.StructField("ahash", T.LongType(), False),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = decode_bytes(bytes(r.bytes), r.fmt)
                rows.append(
                    (
                        r.image_id,
                        phash_mod.phash64(px),
                        phash_mod.dhash64(px),
                        phash_mod.ahash64(px),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "phash", "dhash", "ahash"]
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        gen, schema=schema
    )


PNG_MAGIC_HEX = "89504E470D0A1A0A"


def _le_uint(b, pos: int, n: int):
    """Little-endian unsigned int of n bytes at 1-based position pos,
    as a JVM expression: per-byte hex substrings concatenated in
    reverse order, then conv(·,16,10) — stays inside codegen."""
    return F.conv(
        F.concat(
            *[F.hex(F.substring(b, pos + i, 1)) for i in range(n - 1, -1, -1)]
        ),
        16,
        10,
    ).cast("long")


def header_meta(images: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Container sniff + dimension parse from the BINARY column alone —
    entirely JVM column expressions (substring/hex/conv/regexp inside
    whole-stage codegen): no decode, no Python, no trust in carried
    metadata. This is the shape a crawler needs at 100 TB: unlabeled
    blobs arrive, and resolution gates must run at scan speed without
    inflating a single pixel.

      * PNG (and qpng, which is a PNG container): 8-byte signature,
        then the IHDR chunk puts big-endian width at byte 17 and
        height at byte 21 (1-based) — `conv(hex(substring(b)),16,10)`.
      * PPM P6: ASCII header `P6 <w> <h> <maxval>`; the first 32 bytes
        decode as ISO-8859-1 (total — every byte maps, unlike UTF-8)
        and a regexp pulls the dims. Comment-bearing headers (`#`,
        legal in PPM but never emitted by ccbot_spark.codecs) parse
        as NULL rather than wrong.
      * BMP: 'BM' magic; BITMAPINFOHEADER puts little-endian i32 width
        at byte 19 and height at byte 23 — per-byte hex substrings
        reversed then conv'd. A negative (top-down) height or a
        non-40-byte DIB header parses as NULL rather than as a huge
        unsigned value.
      * GIF (87a/89a): little-endian u16 logical-screen dims at
        bytes 7/9. Sniff + dims only — no GIF decoder exists in the
        closed world (LZW), so decode stays NotImplementedError.
      * JPEG: FFD8FF magic sniffs the container, but dimensions live
        in a variable-position SOF marker no fixed-offset expression
        can reach — hdr_w/hdr_h are NULL here; `jpeg_sof_dims` is the
        bounded marker-walk slow path for JPEG-classified rows.

    Output keeps every input column except the blob, plus
    (container, hdr_w, hdr_h, nbytes); unknown magic → all NULL.
    Pixel-exactness vs the real decoders is pytest-gated; the
    img_header_meta oracle re-derives the dims arithmetically in
    DuckDB, so the binary parse is value-checked end-to-end."""
    b = F.col(bytes_col)
    is_png = F.hex(F.substring(b, 1, 8)) == F.lit(PNG_MAGIC_HEX)
    hdr = F.decode(F.substring(b, 1, 32), "ISO-8859-1")
    is_ppm = hdr.rlike(r"^P6\s+[0-9]+\s+[0-9]+\s")
    is_bmp = (F.hex(F.substring(b, 1, 2)) == F.lit("424D")) & (
        _le_uint(b, 15, 4) == 40  # BITMAPINFOHEADER only
    )
    is_gif = F.hex(F.substring(b, 1, 6)).isin("474946383761", "474946383961")
    is_jpeg = F.hex(F.substring(b, 1, 3)) == F.lit("FFD8FF")
    # WebP: RIFF/WEBP container; dims are fixed-offset per first-chunk
    # kind (all little-endian): VP8X carries 24-bit canvas_{w,h}-1 at
    # 25/28; VP8L packs two 14-bit dims-1 into the u32 after the 0x2F
    # signature byte; lossy VP8 puts 14-bit u16 dims after the 9D012A
    # start code. A RIFF/WEBP blob whose first chunk is none of these
    # (ANIM-first, truncated) still sniffs 'webp' with NULL dims.
    is_riff_webp = (F.hex(F.substring(b, 1, 4)) == F.lit("52494646")) & (
        F.hex(F.substring(b, 9, 4)) == F.lit("57454250")
    )
    chunk4 = F.hex(F.substring(b, 13, 4))
    is_vp8x = is_riff_webp & (chunk4 == F.lit("56503858"))
    is_vp8l = is_riff_webp & (chunk4 == F.lit("5650384C")) & (
        F.hex(F.substring(b, 21, 1)) == F.lit("2F")
    )
    is_vp8 = is_riff_webp & (chunk4 == F.lit("56503820")) & (
        F.hex(F.substring(b, 24, 3)) == F.lit("9D012A")
    )
    vp8x_w = _le_uint(b, 25, 3) + 1
    vp8x_h = _le_uint(b, 28, 3) + 1
    _vp8l_u = _le_uint(b, 22, 4)
    vp8l_w = F.pmod(_vp8l_u, F.lit(16384)) + 1
    vp8l_h = F.pmod(
        (_vp8l_u - F.pmod(_vp8l_u, F.lit(16384))) / 16384, F.lit(16384)
    ).cast("long") + 1
    vp8_w = F.pmod(_le_uint(b, 27, 2), F.lit(16384))
    vp8_h = F.pmod(_le_uint(b, 29, 2), F.lit(16384))
    # TIFF: both byte orders sniff; dims live in an IFD a fixed-offset
    # expression cannot walk (variable entry count/position) → NULL,
    # the jpeg-dims posture. (EXIF's IFD reader is the slow path.)
    is_tiff = F.hex(F.substring(b, 1, 4)).isin("49492A00", "4D4D002A")
    png_w = F.conv(F.hex(F.substring(b, 17, 4)), 16, 10).cast("long")
    png_h = F.conv(F.hex(F.substring(b, 21, 4)), 16, 10).cast("long")
    ppm_w = F.regexp_extract(hdr, r"^P6\s+([0-9]+)\s+([0-9]+)\s", 1).cast("long")
    ppm_h = F.regexp_extract(hdr, r"^P6\s+([0-9]+)\s+([0-9]+)\s", 2).cast("long")
    bmp_w = _le_uint(b, 19, 4)
    bmp_h = _le_uint(b, 23, 4)
    i32_max = F.lit(0x7FFFFFFF).cast("long")
    bmp_w = F.when(bmp_w <= i32_max, bmp_w)  # negative i32 → NULL
    bmp_h = F.when(bmp_h <= i32_max, bmp_h)
    gif_w = _le_uint(b, 7, 2)
    gif_h = _le_uint(b, 9, 2)
    container = (
        F.when(is_png, F.lit("png"))
        .when(is_ppm, F.lit("ppm"))
        .when(is_bmp, F.lit("bmp"))
        .when(is_gif, F.lit("gif"))
        .when(is_jpeg, F.lit("jpeg"))
        .when(is_riff_webp, F.lit("webp"))
        .when(is_tiff, F.lit("tiff"))
    )
    hdr_w = (
        F.when(is_png, png_w)
        .when(is_ppm, ppm_w)
        .when(is_bmp, bmp_w)
        .when(is_gif, gif_w)
        .when(is_vp8x, vp8x_w)
        .when(is_vp8l, vp8l_w)
        .when(is_vp8, vp8_w)
    )
    hdr_h = (
        F.when(is_png, png_h)
        .when(is_ppm, ppm_h)
        .when(is_bmp, bmp_h)
        .when(is_gif, gif_h)
        .when(is_vp8x, vp8x_h)
        .when(is_vp8l, vp8l_h)
        .when(is_vp8, vp8_h)
    )
    keep = [c for c in images.columns if c != bytes_col]
    return images.select(
        *keep,
        container.alias("container"),
        hdr_w.alias("hdr_w"),
        hdr_h.alias("hdr_h"),
        F.length(b).cast("long").alias("nbytes"),
    )


JPEG_HEAD_BYTES = 65536


def jpeg_sof_dims(
    images: DataFrame,
    bytes_col: str = "bytes",
    id_col: str = "image_id",
    head: int = JPEG_HEAD_BYTES,
) -> DataFrame:
    """JPEG dimensions via the marker walk a fixed-offset JVM expression
    cannot express: SOI → skip marker segments by their declared
    lengths → first SOF0/1/2 frame header carries (height, width) as
    big-endian u16. This is a HEADER parse, not a decode — no entropy
    data is touched, so it needs no codec library.

    Scale shape: only the first `head` bytes of each blob cross into
    Python (`substring` prunes the payload JVM-side before the Arrow
    transfer — a 20 MB JPEG ships 64 KB), batches stream through
    iterator mapInPandas, and the output drops the blob entirely.
    Markers before SOF (APPn/DQT/DHT/COM) total well under 64 KB in
    practice; a SOF beyond `head` parses as NULL, never wrong.

    Output: (image_id, jpg_w:long, jpg_h:long) — NULL dims for rows
    that aren't JPEGs or whose SOF is absent/truncated."""
    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType(), False),
            T.StructField("jpg_w", T.LongType(), True),
            T.StructField("jpg_h", T.LongType(), True),
        ]
    )

    def walk(data: bytes):
        if data[:3] != b"\xff\xd8\xff":
            return None, None
        pos = 2
        n = len(data)
        while pos + 3 < n:
            if data[pos] != 0xFF:
                return None, None  # desynced — refuse to guess
            marker = data[pos + 1]
            if marker == 0xFF:  # fill byte
                pos += 1
                continue
            if marker in (0x01, *range(0xD0, 0xD8)):  # standalone
                pos += 2
                continue
            if pos + 4 > n:
                return None, None
            (seglen,) = struct.unpack_from(">H", data, pos + 2)
            if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
                if pos + 9 > n:
                    return None, None
                h, w = struct.unpack_from(">HH", data, pos + 5)
                return w, h
            if marker == 0xD9 or seglen < 2:  # EOI / corrupt length
                return None, None
            pos += 2 + seglen
        return None, None

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                w, h = walk(bytes(r.head_bytes))
                rows.append((r.image_id, w, h))
            yield pd.DataFrame(rows, columns=["image_id", "jpg_w", "jpg_h"])

    pruned = images.select(
        F.col(id_col).alias("image_id"),
        F.substring(F.col(bytes_col), 1, head).alias("head_bytes"),
    )
    return pruned.mapInPandas(gen, schema=schema)


# ---- EXIF orientation (tag 0x0112): the stored pixels need this
# transform to display upright (EXIF spec §4.6.4 / PIL exif_transpose):
# 1=identity 2=mirror 3=rot180 4=flip 5=transpose 6=rot90CW
# 7=transverse 8=rot90CCW. 2/3/4/5/7 are involutions; 6 and 8 invert
# each other — _EXIF_INVERSE gives the stamp whose upright view is the
# original (the test fixture's construction).
_EXIF_INVERSE = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 8, 7: 7, 8: 6}


def apply_exif_orientation(px: np.ndarray, orient: int) -> np.ndarray:
    """Upright view of EXIF-oriented pixels — pure numpy views/rot90,
    no resampling (pixel-exact for the lossless-transform tests)."""
    if orient == 2:
        return px[:, ::-1]
    if orient == 3:
        return px[::-1, ::-1]
    if orient == 4:
        return px[::-1]
    if orient == 5:
        return np.swapaxes(px, 0, 1)
    if orient == 6:
        return np.rot90(px, 3)
    if orient == 7:
        return np.swapaxes(px, 0, 1)[::-1, ::-1]
    if orient == 8:
        return np.rot90(px, 1)
    return px


def _jpeg_exif_walk(data: bytes):
    """(sof_w, sof_h, orientation|None) from one bounded marker walk —
    SOF dims exactly as `jpeg_sof_dims`, plus the APP1/Exif TIFF-IFD0
    orientation tag when present. Handles both TIFF byte orders;
    malformed TIFF → orientation None, never a guess."""
    if data[:3] != b"\xff\xd8\xff":
        return None, None, None
    pos = 2
    n = len(data)
    w = h = orient = None
    while pos + 3 < n:
        if data[pos] != 0xFF:
            return w, h, orient  # desynced — keep what's parsed so far
        marker = data[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker in (0x01, *range(0xD0, 0xD8)):
            pos += 2
            continue
        if pos + 4 > n:
            return w, h, orient
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
            if pos + 9 > n:
                return w, h, orient
            h, w = struct.unpack_from(">HH", data, pos + 5)
            return w, h, orient  # SOF ends the head in any real file
        if marker == 0xE1 and orient is None:  # APP1
            seg = data[pos + 4 : pos + 2 + seglen]
            if seg[:6] == b"Exif\x00\x00" and len(seg) >= 14:
                tiff = seg[6:]
                bo = tiff[:2]
                e = "<" if bo == b"II" else ">" if bo == b"MM" else None
                if e is not None and struct.unpack_from(e + "H", tiff, 2)[0] == 42:
                    (ifd_off,) = struct.unpack_from(e + "I", tiff, 4)
                    if ifd_off + 2 <= len(tiff):
                        (cnt,) = struct.unpack_from(e + "H", tiff, ifd_off)
                        for i in range(cnt):
                            ep = ifd_off + 2 + 12 * i
                            if ep + 12 > len(tiff):
                                break
                            tag, typ = struct.unpack_from(e + "HH", tiff, ep)
                            if tag == 0x0112 and typ == 3:
                                (orient,) = struct.unpack_from(
                                    e + "H", tiff, ep + 8
                                )
                                break
        if marker == 0xD9 or seglen < 2:
            return w, h, orient
        pos += 2 + seglen
    return w, h, orient


def jpeg_exif_orient(
    images: DataFrame,
    bytes_col: str = "bytes",
    id_col: str = "image_id",
    head: int = JPEG_HEAD_BYTES,
) -> DataFrame:
    """EXIF orientation + upright dimensions per JPEG — the camera-
    rotation metadata a training pipeline must honor before any
    geometry (a 6/8-oriented photo letterboxed by its STORED dims gets
    the wrong bucket). One bounded marker walk per blob yields the SOF
    dims and the APP1/TIFF orientation tag together; orientations 5–8
    swap the upright width/height. Same scale shape as jpeg_sof_dims:
    `substring` prunes the payload JVM-side (a 20 MB JPEG ships 64 KB),
    the blob never enters the output.

    Output: (image_id, exif_orient:long NULL when unstamped,
    up_w/up_h: the display-upright dims)."""
    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType(), False),
            T.StructField("exif_orient", T.LongType(), True),
            T.StructField("up_w", T.LongType(), True),
            T.StructField("up_h", T.LongType(), True),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                w, h, o = _jpeg_exif_walk(bytes(r.head_bytes))
                if w is not None and o is not None and o >= 5:
                    up_w, up_h = h, w
                else:
                    up_w, up_h = w, h
                rows.append((r.image_id, o, up_w, up_h))
            yield pd.DataFrame(
                rows, columns=["image_id", "exif_orient", "up_w", "up_h"]
            )

    pruned = images.select(
        F.col(id_col).alias("image_id"),
        F.substring(F.col(bytes_col), 1, head).alias("head_bytes"),
    )
    return pruned.mapInPandas(gen, schema=schema)


def _tiff_ifd0_dims(data: bytes):
    """(w, h) from a TIFF blob's IFD0 ImageWidth/ImageLength entries
    (SHORT or LONG, value inline), both byte orders; anything
    malformed → (None, None), never a guess. The same IFD grammar the
    EXIF reader walks — TIFF *is* EXIF's container."""
    if len(data) < 8:
        return None, None
    bo = data[:2]
    e = "<" if bo == b"II" else ">" if bo == b"MM" else None
    if e is None or struct.unpack_from(e + "H", data, 2)[0] != 42:
        return None, None
    (off,) = struct.unpack_from(e + "I", data, 4)
    if off + 2 > len(data):
        return None, None
    (cnt,) = struct.unpack_from(e + "H", data, off)
    w = h = None
    for i in range(cnt):
        ep = off + 2 + 12 * i
        if ep + 12 > len(data):
            break
        tag, typ = struct.unpack_from(e + "HH", data, ep)
        if tag in (0x0100, 0x0101):
            if typ == 3:  # SHORT, left-justified in the value slot
                (v,) = struct.unpack_from(e + "H", data, ep + 8)
            elif typ == 4:  # LONG
                (v,) = struct.unpack_from(e + "I", data, ep + 8)
            else:
                continue
            if tag == 0x0100:
                w = v
            else:
                h = v
    return w, h


def tiff_dims(
    images: DataFrame,
    bytes_col: str = "bytes",
    id_col: str = "image_id",
    head: int = JPEG_HEAD_BYTES,
) -> DataFrame:
    """TIFF dimensions via the bounded IFD walk a fixed-offset JVM
    expression cannot express (variable entry count/position) — the
    jpeg_sof_dims posture: `substring` prunes the payload JVM-side,
    only the head crosses to Python, the blob never enters the output.
    Output: (image_id, tif_w, tif_h) — NULL for non-TIFF/malformed."""
    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType(), False),
            T.StructField("tif_w", T.LongType(), True),
            T.StructField("tif_h", T.LongType(), True),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                w, h = _tiff_ifd0_dims(bytes(r.head_bytes))
                rows.append((r.image_id, w, h))
            yield pd.DataFrame(rows, columns=["image_id", "tif_w", "tif_h"])

    pruned = images.select(
        F.col(id_col).alias("image_id"),
        F.substring(F.col(bytes_col), 1, head).alias("head_bytes"),
    )
    return pruned.mapInPandas(gen, schema=schema)


def exif_normalize(images: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Upright every EXIF-oriented JPEG: decode, apply the orientation
    transform (lossless numpy views — no resampling), re-emit as ppm
    with display dims. Non-JPEG rows and unstamped/identity JPEGs pass
    through decoded-but-untransformed, so the stage composes in front
    of letterbox/phash exactly like decode_features. Iterator
    mapInPandas, bounded batches; the output schema matches the decode
    stage (image_id, bytes, w, h, fmt)."""
    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType(), False),
            T.StructField("bytes", T.BinaryType(), False),
            T.StructField("w", T.IntegerType(), False),
            T.StructField("h", T.IntegerType(), False),
            T.StructField("fmt", T.StringType(), False),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                data = bytes(getattr(r, bytes_col))
                px = decode_bytes(data, r.fmt)
                if r.fmt in ("jpeg", "jpg"):
                    _w, _h, o = _jpeg_exif_walk(data[:JPEG_HEAD_BYTES])
                    if o is not None and o != 1:
                        px = apply_exif_orientation(px, o)
                rows.append(
                    (
                        r.image_id,
                        codecs.encode_ppm(np.ascontiguousarray(px)),
                        px.shape[1],
                        px.shape[0],
                        "ppm",
                    )
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt"]
            )

    return images.select(
        "image_id", F.col(bytes_col).alias(bytes_col), "fmt"
    ).mapInPandas(gen, schema=schema)


def media_container_col(bytes_col: str = "bytes"):
    """Cross-modal container sniff as ONE JVM expression: the image
    magics (same constants as `header_meta`), the decodable audio/video
    containers (RIFF/WAVE, YUV4MPEG2), and the RECOGNIZED-but-
    undecodable compressed containers a real crawl sees — mp4/quicktime
    ('ftyp' at byte 5), webm/mkv (EBML 1A45DFA3), ogg ('OggS'), flac
    ('fLaC'), mp3 (ID3 tag or an MPEG frame-sync FFFB/FFFA/FFF3/FFF2),
    webp (RIFF/WEBP), tiff (II*./MM.*) —
    so the ingest profile reports them by name instead of lumping real
    traffic into 'unknown' (the same sniff-before-decoder posture GIF
    had before round 5 gave it a decoder). Unknown magic → NULL."""
    b = F.col(bytes_col)
    return (
        F.when(F.hex(F.substring(b, 1, 8)) == F.lit(PNG_MAGIC_HEX), F.lit("png"))
        .when(
            F.decode(F.substring(b, 1, 32), "ISO-8859-1").rlike(
                r"^P6\s+[0-9]+\s+[0-9]+\s"
            ),
            F.lit("ppm"),
        )
        .when(
            (F.hex(F.substring(b, 1, 2)) == F.lit("424D"))
            & (_le_uint(b, 15, 4) == 40),
            F.lit("bmp"),
        )
        .when(
            F.hex(F.substring(b, 1, 6)).isin("474946383761", "474946383961"),
            F.lit("gif"),
        )
        .when(F.hex(F.substring(b, 1, 3)) == F.lit("FFD8FF"), F.lit("jpeg"))
        .when(
            (F.hex(F.substring(b, 1, 4)) == F.lit("52494646"))  # 'RIFF'
            & (F.hex(F.substring(b, 9, 8)) == F.lit("57415645666D7420")),
            F.lit("wav"),
        )
        .when(
            (F.hex(F.substring(b, 1, 4)) == F.lit("52494646"))  # 'RIFF'
            & (F.hex(F.substring(b, 9, 4)) == F.lit("57454250")),  # 'WEBP'
            F.lit("webp"),
        )
        .when(
            F.hex(F.substring(b, 1, 4)).isin("49492A00", "4D4D002A"),
            F.lit("tiff"),
        )
        .when(
            F.hex(F.substring(b, 1, 10)) == F.lit("595556344D5045473220"),
            F.lit("y4m"),
        )
        .when(F.hex(F.substring(b, 5, 4)) == F.lit("66747970"), F.lit("mp4"))
        .when(F.hex(F.substring(b, 1, 4)) == F.lit("1A45DFA3"), F.lit("webm"))
        .when(F.hex(F.substring(b, 1, 4)) == F.lit("4F676753"), F.lit("ogg"))
        .when(F.hex(F.substring(b, 1, 4)) == F.lit("664C6143"), F.lit("flac"))
        .when(
            (F.hex(F.substring(b, 1, 3)) == F.lit("494433"))  # 'ID3'
            | F.hex(F.substring(b, 1, 2)).isin(
                "FFFB", "FFFA", "FFF3", "FFF2"
            ),
            F.lit("mp3"),
        )
    )


def modality_col(container_col: str = "container"):
    """container → modality (image / audio / video; NULL → unknown) —
    the routing key a mixed ingest stream partitions its downstream
    per-modality pipelines on. Recognized compressed containers route
    to their modality too: their DECODE boundary raises, but profiling
    and routing work from the sniff alone."""
    c = F.col(container_col)
    return (
        F.when(
            c.isin("png", "ppm", "bmp", "gif", "jpeg", "webp", "tiff"),
            F.lit("image"),
        )
        .when(c.isin("wav", "mp3", "ogg", "flac"), F.lit("audio"))
        .when(c.isin("y4m", "mp4", "webm"), F.lit("video"))
        .otherwise(F.lit("unknown"))
    )


def size_class_col(w_col="hdr_w", h_col="hdr_h"):
    """Resolution class from the max side — shared by the batch
    histogram and the streaming ingest profile so both report the
    same buckets."""
    side = F.greatest(w_col, h_col)
    return (
        F.when(side < 32, F.lit("icon"))
        .when(side < 64, F.lit("small"))
        .when(side < 96, F.lit("medium"))
        .otherwise(F.lit("large"))
    )


def size_histogram(meta: DataFrame) -> DataFrame:
    """Corpus profile over header-parsed dims: (container, size_class)
    → image count + total pixels. Chained on header_meta this profiles
    a 100 TB image corpus with one metadata-speed scan and one tiny
    hash-agg (map-side partial; output rows = #containers ×
    #classes) — the report a curation run consults before choosing
    resolution gates. Class bounds follow the max side."""
    size_class = size_class_col()
    return (
        meta.filter(F.col("container").isNotNull())
        .groupBy("container", size_class.alias("size_class"))
        .agg(
            F.count("*").alias("n_images"),
            F.sum(F.col("hdr_w") * F.col("hdr_h")).alias("total_px"),
        )
    )


def exact_dup_groups(
    images: DataFrame, bytes_col: str = "bytes", id_col: str = "image_id"
) -> DataFrame:
    """Byte-exact image dedup — the content-addressable-store step that
    runs BEFORE any perceptual pass (mirrors and hotlinked re-posts are
    byte-identical; at web scale they are the bulk of image duplicates).
    `md5(bytes)` is a JVM built-in over binary, so the blob is read
    once, reduced to a 16-byte digest map-side, and the shuffle moves
    digests, not pixels; the groupBy partial-aggregates before the
    exchange. Returns one row per duplicate group: lexicographic-min
    id as keeper + copy count (groups of one are not duplicates and
    are filtered pre-shuffle-read)."""
    g = (
        images.select(
            F.col(id_col), F.md5(F.col(bytes_col)).alias("digest")
        )
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("keeper"),
            F.count("*").alias("n_copies"),
        )
    )
    return g.filter(F.col("n_copies") >= 2).select("keeper", "n_copies")


def curation_features(
    images: DataFrame,
    min_side: int = 64,
    max_aspect_x10: int = 30,
    min_cap_words: int = 3,
    max_cap_words: int = 64,
    max_cap_chars: int = 256,
) -> DataFrame:
    """LAION-style image-text curation gates over the metadata columns
    of the image+caption table (image_id, w, h, caption): resolution
    floor, aspect-ratio cap, caption length band, and a boilerplate-
    caption reject (camera-filename captions like IMG_1234 carry no
    training signal). All gates are JVM column expressions over
    metadata — zero shuffle, zero Python, and the binary `bytes`
    column is never touched (column pruning keeps blobs out of the
    scan), so this filters a 100 TB image corpus at metadata-scan
    speed. Aspect ratio is kept integer (×10, integer division) so
    the gate is engine-exact, not float-thresholded."""
    aspect_x10 = F.expr(
        "CAST((greatest(w, h) * 10) DIV least(w, h) AS BIGINT)"
    ).alias("aspect_x10")
    cap_chars = F.length("caption").cast("long").alias("cap_chars")
    cap_words = F.size(
        F.filter(F.split(F.col("caption"), " "), lambda t: t != F.lit(""))
    ).cast("long").alias("cap_words")
    boiler = F.lower(F.col("caption")).rlike(
        "^(img_[0-9]+|dsc[0-9]+|untitled|no caption)"
    )
    out = images.select(
        "image_id", "w", "h", "caption", aspect_x10, cap_chars, cap_words,
        boiler.alias("_boiler"),
    )
    keep = (
        (F.least("w", "h") >= min_side)
        & (F.col("aspect_x10") <= max_aspect_x10)
        & (F.col("cap_words") >= min_cap_words)
        & (F.col("cap_words") <= max_cap_words)
        & (F.col("cap_chars") <= max_cap_chars)
        & ~F.col("_boiler")
    )
    return out.select(
        "image_id",
        "w",
        "h",
        "aspect_x10",
        "cap_chars",
        "cap_words",
        F.when(keep, F.lit(1)).otherwise(F.lit(0)).cast("long").alias("keep"),
    )


def mm_dedup_edges(meta: DataFrame, max_ham: int = 6) -> DataFrame:
    """Multimodal duplicate edges over (image_id:long, phash, caption):
    an image pair is a duplicate candidate if the IMAGES are
    perceptually near (banded 4×16-bit Hamming join on phash) OR the
    CAPTIONS are byte-identical. Feed the union into
    dedup.connected_components to get joint clusters — the standard
    image+text curation step (near-identical crops re-posted under one
    caption, one image re-captioned across mirrors) that neither
    single-modality dedup catches alone.

    Caption equality deliberately emits STAR edges (member → min id of
    its caption group), not the clique: same components, O(n) edges
    instead of O(n²) for viral captions — at 10^10 images a
    1M-duplicate caption group costs 1M edges, not 10^12."""
    ph_pairs = phash_near_pairs(
        meta.select("image_id", "phash"), max_ham=max_ham
    ).select("img_a", "img_b")
    cap_root = meta.groupBy("caption").agg(F.min("image_id").alias("img_a"))
    cap_edges = (
        meta.join(cap_root, "caption")
        .filter(F.col("image_id") != F.col("img_a"))
        .select("img_a", F.col("image_id").alias("img_b"))
    )
    return ph_pairs.unionByName(cap_edges).dropDuplicates(["img_a", "img_b"])


def phash_near_pairs(decoded: DataFrame, max_ham: int = 6) -> DataFrame:
    """Perceptual near-dup pairs over decoded phashes — the banded
    Hamming join (SURVEY.md §2.3 j_phash_near): split 64 bits into 4
    16-bit bands, equi-join any band, verify bit_count(xor) ≤ t."""
    bands = decoded.select(
        "image_id",
        "phash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("phash"), b * 16).bitwiseAND(
                        F.lit(0xFFFF)
                    )
                    for b in range(4)
                ]
            )
        ).alias("band_id", "band_val"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.image_id") < F.col("b.image_id")),
        )
        .select(
            F.col("a.image_id").alias("img_a"),
            F.col("b.image_id").alias("img_b"),
            F.bit_count(
                F.col("a.phash").bitwiseXOR(F.col("b.phash"))
            ).alias("hamming"),
        )
        .dropDuplicates(["img_a", "img_b"])
        .filter(F.col("hamming") <= max_ham)
    )


def phash_blocklist_filter(
    images: DataFrame, blocklist: DataFrame, max_ham: int = 0
) -> dict[str, DataFrame]:
    """Known-bad-image gate (the PhotoDNA/phash-blocklist moderation
    filter every production image pipeline runs before storage or
    training export): drop images whose perceptual hash matches a
    curated bad-hash list, exactly or within a Hamming radius.

    blocklist: DataFrame with one int64 column ``bad_phash``. Hash
    lists are small by construction (10^5–10^7 entries, 8 bytes each)
    — always broadcast, so the corpus side never shuffles regardless
    of corpus size.

    max_ham = 0: exact membership — one broadcast equi-anti-join.
    max_ham > 0: near-match via the same 4×16-bit banded Hamming
    discipline as phash_near_pairs: band-explode BOTH sides, broadcast
    equi-join on (band_id, band_val), verify bit_count(xor) ≤ max_ham
    exactly. By pigeonhole, ≤ 3 flipped bits cannot touch all 4 bands,
    so the prefilter is COMPLETE (zero false negatives — what a
    moderation gate requires) for max_ham ≤ 3; a deployment needing a
    wider radius raises the band count (8×8-bit → complete to 7) —
    same plan shape. Flagged ids then anti-join off the corpus.

    Returns {"kept": ..., "flagged": ...} — flagged carries one row
    per image with the matched bad hash of minimal Hamming distance
    (deterministic tie-break on the hash value) for audit trails.
    """
    if max_ham == 0:
        matched = images.join(
            F.broadcast(blocklist),
            images["phash"] == blocklist["bad_phash"],
            "inner",
        ).select(
            *[images[c] for c in images.columns],
            F.col("bad_phash"),
            F.lit(0).cast("integer").alias("hamming"),
        )
    else:
        def bands(df, hash_col):
            return df.select(
                "*",
                F.posexplode(
                    F.array(
                        *[
                            F.shiftrightunsigned(
                                F.col(hash_col), b * 16
                            ).bitwiseAND(F.lit(0xFFFF))
                            for b in range(4)
                        ]
                    )
                ).alias("band_id", "band_val"),
            )

        cand = bands(images, "phash").join(
            F.broadcast(bands(blocklist, "bad_phash")),
            ["band_id", "band_val"],
        )
        ham = F.bit_count(F.col("phash").bitwiseXOR(F.col("bad_phash")))
        matched = (
            cand.withColumn("hamming", ham.cast("integer"))
            .filter(F.col("hamming") <= max_ham)
            .groupBy(*images.columns)
            .agg(
                F.min(F.struct("hamming", "bad_phash")).alias("_m")
            )
            .select(
                *images.columns,
                F.col("_m.bad_phash").alias("bad_phash"),
                F.col("_m.hamming").alias("hamming"),
            )
        )
    kept = images.join(
        matched.select(F.col("image_id").alias("_bad_id")),
        images["image_id"] == F.col("_bad_id"),
        "left_anti",
    )
    return {"kept": kept, "flagged": matched}


# ---------------------------------------------------------------- aspect

#: Training-time aspect-ratio ladder (SDXL-style bucketed batching:
#: batches mix only same-bucket images so a loader never pads or crops
#: across aspect classes). Cut points are the geometric midpoints
#: between neighboring ratios, stated as integer thresholds on
#: q = (1000*w) div h so Spark and any SQL oracle compute the SAME
#: integer and compare it to the SAME constants — no float boundary.
ASPECT_LADDER = ("9:16", "3:4", "1:1", "4:3", "16:9")
ASPECT_CUTS = (649, 866, 1154, 1539)  # geometric midpoints ×1000


def aspect_bucket_col(w_col, h_col):
    """Aspect bucket from integer dims, pure JVM integer arithmetic
    (`div`, not float division). Python twin: aspect_bucket_py."""
    q = F.expr(f"(1000 * ({w_col})) div ({h_col})")
    out = F.lit(ASPECT_LADDER[-1])
    for name, cut in zip(reversed(ASPECT_LADDER[:-1]), reversed(ASPECT_CUTS)):
        out = F.when(q < F.lit(cut), F.lit(name)).otherwise(out)
    return out


def aspect_bucket_py(w: int, h: int) -> str:
    """Pure-python twin of aspect_bucket_col (grid-tested equal)."""
    q = (1000 * w) // h
    for name, cut in zip(ASPECT_LADDER, ASPECT_CUTS):
        if q < cut:
            return name
    return ASPECT_LADDER[-1]


#: PNG chunk tags carrying provenance/metadata, not pixels — what a
#: privacy scrub removes (the `exiftool -all=` analog): text comments,
#: EXIF blocks, and the authoring timestamp. Rendering-relevant
#: ancillary chunks (tRNS, gAMA, sRGB, pHYs, …) are kept.
PNG_METADATA_TAGS = (b"tEXt", b"zTXt", b"iTXt", b"eXIf", b"tIME")


def _strip_png_chunks(data: bytes) -> tuple[bytes, int, int]:
    """Drop metadata chunks from one PNG byte string. Returns
    (scrubbed_bytes, n_stripped, bytes_removed). Non-PNG or
    structurally broken input returns unchanged with zero counters —
    a scrubber must never corrupt what it cannot parse."""
    if not data.startswith(codecs.PNG_SIG):
        return data, 0, 0
    out = [codecs.PNG_SIG]
    pos = len(codecs.PNG_SIG)
    n = len(data)
    stripped = removed = 0
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", data, pos)
        end = pos + 12 + length
        if end > n:
            return data, 0, 0  # truncated chunk — refuse to rewrite
        tag = data[pos + 4 : pos + 8]
        if tag in PNG_METADATA_TAGS:
            stripped += 1
            removed += 12 + length
        else:
            out.append(data[pos:end])
        pos = end
        if tag == b"IEND":
            break
    else:
        return data, 0, 0  # no IEND — refuse to rewrite
    if pos < n:  # trailing garbage after IEND — keep it verbatim
        out.append(data[pos:])
    return b"".join(out), stripped, removed


def inject_png_text_chunk(data: bytes, keyword: bytes, text: bytes) -> bytes:
    """Insert one tEXt chunk right after IHDR — the fixture the scrub
    tests and the img_png_scrub oracle plant with (CRC-correct, so the
    chunk-injected PNG still decodes)."""
    if not data.startswith(codecs.PNG_SIG):
        raise ValueError("not a PNG")
    ihdr_end = 8 + 12 + 13  # signature + IHDR chunk (13-byte payload)
    chunk = codecs._chunk(b"tEXt", keyword + b"\x00" + text)
    return data[:ihdr_end] + chunk + data[ihdr_end:]


def strip_png_metadata(images: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Privacy scrub before storage or training export: remove PNG
    provenance chunks (tEXt/zTXt/iTXt/eXIf/tIME — camera serials, GPS
    EXIF, author comments) while leaving every pixel and every
    rendering-relevant chunk byte-identical. This is a CHUNK WALK, not
    a decode — no inflate, no pixel pass — so it costs header-parse
    time, not codec time, and runs as a bounded iterator mapInPandas
    (blob in → blob out, same partitioning). Non-PNG rows and
    unparseable blobs pass through untouched with zero counters: the
    scrubber never corrupts what it cannot prove it parsed.

    Output: every input column (bytes replaced by the scrubbed blob)
    plus stripped_chunks:long and stripped_bytes:long for audit."""
    in_schema = images.schema
    out_fields = list(in_schema.fields) + [
        T.StructField("stripped_chunks", T.LongType(), False),
        T.StructField("stripped_bytes", T.LongType(), False),
    ]
    cols = [f.name for f in in_schema.fields]
    bi = cols.index(bytes_col)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                vals = list(r)
                scrubbed, n_str, n_rm = _strip_png_chunks(bytes(vals[bi]))
                vals[bi] = scrubbed
                rows.append((*vals, n_str, n_rm))
            yield pd.DataFrame(
                rows, columns=cols + ["stripped_chunks", "stripped_bytes"]
            )

    return images.mapInPandas(gen, schema=T.StructType(out_fields))


def _strip_jpeg_segments(data: bytes) -> tuple[bytes, int, int]:
    """Drop metadata segments from one JPEG byte string: COM (0xFFFE)
    and APP1..APP15 (0xFFE1-0xFFEF — EXIF/GPS, XMP, ICC side data,
    Photoshop IRBs). APP0/JFIF stays (it carries the pixel density a
    renderer reads), and everything from SOS onward is copied verbatim
    — entropy-coded data is never walked, so the scrub costs header
    time, not codec time. Returns (scrubbed, n_stripped,
    bytes_removed); non-JPEG / marker-desynced / truncated input
    returns unchanged with zero counters — same refuse-to-rewrite
    contract as the PNG walk."""
    n = len(data)
    if n < 4 or data[:2] != b"\xff\xd8":
        return data, 0, 0
    out = [b"\xff\xd8"]
    pos = 2
    stripped = removed = 0
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            return data, 0, 0  # marker desync — refuse to rewrite
        marker = data[pos + 1]
        if marker == 0xDA:  # SOS: entropy data to EOI, copy verbatim
            out.append(data[pos:])
            return b"".join(out), stripped, removed
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            return data, 0, 0  # standalone marker before SOS — not a
            # baseline header stream we can prove we parsed
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        end = pos + 2 + seglen
        if seglen < 2 or end > n:
            return data, 0, 0  # truncated segment — refuse to rewrite
        if marker == 0xFE or 0xE1 <= marker <= 0xEF:
            stripped += 1
            removed += 2 + seglen
        else:
            out.append(data[pos:end])
        pos = end
    return data, 0, 0  # ran out of bytes before SOS — refuse


def inject_jpeg_com_segment(data: bytes, text: bytes) -> bytes:
    """Insert one COM segment right after SOI — the fixture the scrub
    tests and the img_jpeg_scrub oracle plant with (a decoder skips
    COM, so the tainted JPEG still decodes to the same pixels)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    seg = b"\xff\xfe" + struct.pack(">H", 2 + len(text)) + text
    return data[:2] + seg + data[2:]


def strip_image_metadata(images: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Container-dispatching privacy scrub (the `exiftool -all=`
    analog for the whole corpus): PNG rows lose provenance chunks
    (tEXt/zTXt/iTXt/eXIf/tIME), JPEG rows lose COM + APP1..APP15
    (EXIF GPS tracks, camera serials, XMP authorship), every pixel and
    every rendering-relevant byte stays identical, and any container
    the walker cannot prove it parsed — PPM, BMP, truncated blobs —
    passes through untouched with zero counters. One bounded iterator
    mapInPandas over the blob column, no decode, no shuffle: the same
    partitioning in and out, so it composes into the store/export path
    for free. Output: every input column (bytes replaced) plus
    stripped_chunks:long and stripped_bytes:long for audit."""
    in_schema = images.schema
    out_fields = list(in_schema.fields) + [
        T.StructField("stripped_chunks", T.LongType(), False),
        T.StructField("stripped_bytes", T.LongType(), False),
    ]
    cols = [f.name for f in in_schema.fields]
    bi = cols.index(bytes_col)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                vals = list(r)
                blob = bytes(vals[bi])
                if blob.startswith(codecs.PNG_SIG):
                    scrubbed, n_str, n_rm = _strip_png_chunks(blob)
                elif blob[:2] == b"\xff\xd8":
                    scrubbed, n_str, n_rm = _strip_jpeg_segments(blob)
                else:
                    scrubbed, n_str, n_rm = blob, 0, 0
                vals[bi] = scrubbed
                rows.append((*vals, n_str, n_rm))
            yield pd.DataFrame(
                rows, columns=cols + ["stripped_chunks", "stripped_bytes"]
            )

    return images.mapInPandas(gen, schema=T.StructType(out_fields))


#: Per-bucket letterbox targets for training export (exact ladder
#: ratios at comparable pixel area, so a loader batches fixed shapes).
BUCKET_TARGETS = {
    "9:16": (36, 64),
    "3:4": (48, 64),
    "1:1": (64, 64),
    "4:3": (64, 48),
    "16:9": (64, 36),
}


def letterbox_plan(images: DataFrame, w_col: str = "w", h_col: str = "h") -> DataFrame:
    """The GEOMETRY of a bucketed letterbox resize, as pure JVM integer
    expressions — bucket assignment, target dims, aspect-preserving
    scaled dims, and centered padding offsets. Splitting the plan from
    the pixel work means (a) the numbers are SQL-derivable (oracled in
    DuckDB down to every pad offset), and (b) the Arrow stage below is
    a dumb executor of per-row instructions, so the decision logic
    never hides inside Python.

    Integer fit rule (no floats → engine-exact): if w·th ≥ h·tw the
    image is wider than the target box — scaled_w = tw and
    scaled_h = max(1, (h·tw) div w); else the transpose. Padding
    splits the slack evenly, extra pixel on the right/bottom."""
    w = F.col(w_col).cast("long")
    h = F.col(h_col).cast("long")
    bucket = aspect_bucket_col(w_col, h_col)
    tw = F.lit(None).cast("long")
    th = F.lit(None).cast("long")
    for name, (bw, bh) in BUCKET_TARGETS.items():
        tw = F.when(bucket == name, F.lit(bw).cast("long")).otherwise(tw)
        th = F.when(bucket == name, F.lit(bh).cast("long")).otherwise(th)
    wider = (w * th) >= (h * tw)
    one = F.lit(1).cast("long")
    # exact integer floor-division ((x - x mod d)/d) — no float in the plan
    scaled_w = F.when(wider, tw).otherwise(
        F.greatest(one, ((w * th) - F.pmod(w * th, h)) / h)
    ).cast("long")
    scaled_h = F.when(wider, F.greatest(one, ((h * tw) - F.pmod(h * tw, w)) / w)).otherwise(th).cast("long")
    pad_x = ((tw - scaled_w) - F.pmod(tw - scaled_w, F.lit(2))) / 2
    pad_y = ((th - scaled_h) - F.pmod(th - scaled_h, F.lit(2))) / 2
    return images.select(
        "*",
        bucket.alias("bucket"),
        tw.alias("out_w"),
        th.alias("out_h"),
        scaled_w.alias("scaled_w"),
        scaled_h.alias("scaled_h"),
        pad_x.cast("long").alias("pad_x"),
        pad_y.cast("long").alias("pad_y"),
    )


def letterbox_plan_py(w: int, h: int) -> tuple:
    """Pure-python twin of letterbox_plan (grid-tested equal):
    (bucket, out_w, out_h, scaled_w, scaled_h, pad_x, pad_y)."""
    bucket = aspect_bucket_py(w, h)
    tw, th = BUCKET_TARGETS[bucket]
    if w * th >= h * tw:
        sw, sh = tw, max(1, (h * tw) // w)
    else:
        sw, sh = max(1, (w * th) // h), th
    return bucket, tw, th, sw, sh, (tw - sw) // 2, (th - sh) // 2


def bucket_resize(images: DataFrame) -> DataFrame:
    """Training-export normalization: letterbox every image to its
    aspect bucket's fixed target shape — nearest-neighbor scale
    preserving aspect, centered on black padding — so a loader batches
    same-bucket samples without per-sample reshaping (the SDXL
    bucketed-batching contract). Geometry comes from letterbox_plan's
    JVM columns; this Arrow stage only moves pixels (iterator
    mapInPandas, bounded batches, blob in → blob out, re-encoded ppm).
    Nearest-neighbor uses the same integer index map as
    resize_nearest (xi = arange(out)·in div out) — deterministic,
    engine-neutral, pytest-gated pixel-exact vs the numpy twin."""
    plan = letterbox_plan(images)
    out_schema = T.StructType(
        [
            T.StructField("image_id", T.StringType(), False),
            T.StructField("bucket", T.StringType(), False),
            T.StructField("bytes", T.BinaryType(), False),
            T.StructField("w", T.IntegerType(), False),
            T.StructField("h", T.IntegerType(), False),
            T.StructField("fmt", T.StringType(), False),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = decode_bytes(bytes(r.bytes), r.fmt)
                ih, iw = px.shape[:2]
                sw, sh = int(r.scaled_w), int(r.scaled_h)
                yi = (np.arange(sh) * ih // sh).astype(int)
                xi = (np.arange(sw) * iw // sw).astype(int)
                scaled = px[yi][:, xi]
                out = np.zeros((int(r.out_h), int(r.out_w), 3), dtype=np.uint8)
                py_, px_ = int(r.pad_y), int(r.pad_x)
                out[py_ : py_ + sh, px_ : px_ + sw] = scaled
                rows.append(
                    (
                        r.image_id,
                        r.bucket,
                        codecs.encode(out, "ppm"),
                        int(r.out_w),
                        int(r.out_h),
                        "ppm",
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "bucket", "bytes", "w", "h", "fmt"],
            )

    return plan.mapInPandas(gen, schema=out_schema)


def aspect_profile(meta: DataFrame) -> DataFrame:
    """Bucketed-batching feasibility report over header-parsed dims:
    per (container, aspect_bucket) image count + pixel total — one
    metadata-speed scan + one tiny hash-agg, same 100 TB shape as
    size_histogram. The numbers a loader needs to size per-bucket
    batch queues before an export."""
    return (
        meta.filter(F.col("container").isNotNull())
        .groupBy(
            "container",
            aspect_bucket_col("hdr_w", "hdr_h").alias("aspect_bucket"),
        )
        .agg(
            F.count("*").alias("n_images"),
            F.sum(F.col("hdr_w") * F.col("hdr_h")).alias("total_px"),
        )
    )


# ----------------------------------------------- low-information image gate


def synth_flat_mix_from_docs(docs: DataFrame) -> DataFrame:
    """Deterministic fixture for the low-information gate: three pixel
    classes by doc_id % 3 — 0: SOLID (one color, zero variance),
    1: LOW-CONTRAST checkerboard (two values 8 apart — per-pixel
    variance 16, closed-form from (w, h, c) arithmetic so DuckDB can
    replay the verdict), 2: full random noise (the keepable class).
    Dims and base color are doc_id arithmetic; encoded round-robin
    over the lossless containers (ppm/png/bmp) so the stats are
    decode-invariant."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w = 24 + d % 50
                h = 24 + (d * 3) % 50
                c = d * 37 % 240
                cls = d % 3
                if cls == 0:
                    px = np.full((h, w, 3), c, dtype=np.uint8)
                elif cls == 1:
                    ij = np.add.outer(np.arange(h), np.arange(w)) % 2
                    px = np.repeat(
                        (c + 8 * ij)[:, :, None], 3, axis=2
                    ).astype(np.uint8)
                else:
                    px = np.random.RandomState(d).randint(
                        0, 256, size=(h, w, 3), dtype=np.uint8
                    )
                fmt = ("ppm", "png", "bmp")[(d // 3) % 3]
                rows.append((f"doc-{d}", codecs.encode(px, fmt), w, h, fmt))
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt"]
            )

    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType(), False),
            T.StructField("bytes", T.BinaryType(), False),
            T.StructField("w", T.IntegerType(), False),
            T.StructField("h", T.IntegerType(), False),
            T.StructField("fmt", T.StringType(), False),
        ]
    )
    return docs.select("doc_id").mapInPandas(gen, schema=schema)


def pixel_stats(images: DataFrame, t2: int = 10) -> DataFrame:
    """Flat / low-information image gate — the curation step that drops
    solid-color placeholders, tracking pixels and near-blank banners a
    web crawl inevitably stores (they carry no training signal but
    plenty of bytes).

    Per image, ONE Arrow decode pass computes exact integer pixel
    moments over all channels: n_px = 3·w·h, and the variance
    NUMERATOR var_num = n·Σx² − (Σx)² (so the verdicts are integer
    cross-multiplications, never float thresholds):

      is_flat  ⇔ var_num == 0            (every sample identical)
      keep = 0 ⇔ 4·var_num < t2²·n_px²   (std < t2/2 gray levels)

    Exactness bound: var_num ≤ n²·255² needs n < 1.19e7 samples, i.e.
    images up to ~4 MP — beyond that, compute per-tile or in float;
    crawl thumbnails are far below it. Scale shape: iterator
    mapInPandas (bounded batches), blob consumed and DROPPED in the
    same stage — downstream sees 6 integer columns, zero shuffle.

    Returns (image_id, w, h, n_px, var_num, is_flat, keep)."""

    out_schema = T.StructType(
        [
            T.StructField("image_id", T.StringType(), False),
            T.StructField("w", T.IntegerType(), False),
            T.StructField("h", T.IntegerType(), False),
            T.StructField("n_px", T.LongType(), False),
            T.StructField("var_num", T.LongType(), False),
            T.StructField("is_flat", T.LongType(), False),
            T.StructField("keep", T.LongType(), False),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = decode_bytes(bytes(r.bytes), r.fmt)
                flat = px.reshape(-1).astype(np.int64)
                n = int(flat.size)
                sx = int(flat.sum())
                sx2 = int((flat * flat).sum())
                var_num = n * sx2 - sx * sx
                is_flat = int(var_num == 0)
                keep = int(4 * var_num >= t2 * t2 * n * n)
                rows.append(
                    (r.image_id, px.shape[1], px.shape[0], n, var_num,
                     is_flat, keep)
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_schema.fields]
            )

    return images.mapInPandas(gen, schema=out_schema)


def synth_blur_mix_from_docs(docs: DataFrame) -> DataFrame:
    """Deterministic fixture for the blur/sharpness gate: three pixel
    classes by doc_id % 3 whose 4-neighbor Laplacian energy is
    CLOSED-FORM from (w, h) arithmetic, so DuckDB can replay the exact
    integer energy — 0: SOLID (Laplacian 0 everywhere), 1: LINEAR RAMP
    value c + row (a perfectly smooth gradient — nonzero variance but
    ZERO Laplacian, the case a variance gate cannot separate from real
    content), 2: unit checkerboard with step s=9 (every interior sample
    has |L| = 4s, so energy = 16s²·n_int exactly). Ramp base c = d %
    180 keeps c + row ≤ 252 (h ≤ 73): no clipping, so linearity — and
    the zero-Laplacian identity — holds everywhere. Encoded round-robin
    over the lossless containers (ppm/png/bmp): stats decode-invariant."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w = 24 + d % 50
                h = 24 + (d * 3) % 50
                cls = d % 3
                if cls == 0:
                    c = d * 37 % 240
                    px = np.full((h, w, 3), c, dtype=np.uint8)
                elif cls == 1:
                    c = d % 180
                    col = (c + np.arange(h, dtype=np.int64)) % 256
                    px = np.repeat(
                        np.repeat(col[:, None], w, axis=1)[:, :, None],
                        3, axis=2,
                    ).astype(np.uint8)
                else:
                    c = d * 37 % 240
                    ij = np.add.outer(np.arange(h), np.arange(w)) % 2
                    px = np.repeat(
                        (c + 9 * ij)[:, :, None], 3, axis=2
                    ).astype(np.uint8)
                fmt = ("ppm", "png", "bmp")[(d // 3) % 3]
                rows.append((f"doc-{d}", codecs.encode(px, fmt), w, h, fmt))
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt"]
            )

    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType(), False),
            T.StructField("bytes", T.BinaryType(), False),
            T.StructField("w", T.IntegerType(), False),
            T.StructField("h", T.IntegerType(), False),
            T.StructField("fmt", T.StringType(), False),
        ]
    )
    return docs.select("doc_id").mapInPandas(gen, schema=schema)


def laplacian_stats(images: DataFrame, tau: int = 100) -> DataFrame:
    """Blur / sharpness gate — "variance of Laplacian" focus measure
    (Pech-Pacheco et al., ICPR 2000), the standard curation step that
    drops out-of-focus photos, upscaled thumbnails and smooth gradient
    banners which survive a flat-variance gate (pixel_stats) because
    they DO vary — just with no edges.

    Per image, ONE Arrow decode pass computes the exact integer energy
    of the 4-neighbor discrete Laplacian over the INTERIOR (valid)
    region, per channel:

      L(i,j) = 4·x(i,j) − x(i−1,j) − x(i+1,j) − x(i,j−1) − x(i,j+1)
      n_int = 3·(h−2)·(w−2);   lap_energy = Σ L²   (int64 exact)
      is_sharp ⇔ lap_energy ≥ tau·n_int   (mean L² ≥ tau, integer
                                           cross-multiplied)

    Interior-only makes the statistic closed-form on the fixture (no
    boundary replication convention to model); images with w < 3 or
    h < 3 have an empty interior → energy 0, not sharp. Exactness
    bound: L² ≤ (4·255)² ≈ 1.04e6, so int64 holds to ~8.8e12 interior
    samples — petapixel images, far beyond any crawl asset. Scale
    shape: iterator mapInPandas (bounded batches), blob consumed and
    DROPPED in the same stage — downstream sees 6 integer columns,
    zero shuffle; composes with pixel_stats in the same decode pass at
    scale (one decode, both moments).

    Returns (image_id, w, h, n_int, lap_energy, is_sharp)."""

    out_schema = T.StructType(
        [
            T.StructField("image_id", T.StringType(), False),
            T.StructField("w", T.IntegerType(), False),
            T.StructField("h", T.IntegerType(), False),
            T.StructField("n_int", T.LongType(), False),
            T.StructField("lap_energy", T.LongType(), False),
            T.StructField("is_sharp", T.LongType(), False),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = decode_bytes(bytes(r.bytes), r.fmt).astype(np.int64)
                h, w = px.shape[:2]
                if h < 3 or w < 3:
                    n_int, energy = 0, 0
                else:
                    core = px[1:-1, 1:-1, :]
                    lap = (
                        4 * core
                        - px[:-2, 1:-1, :]
                        - px[2:, 1:-1, :]
                        - px[1:-1, :-2, :]
                        - px[1:-1, 2:, :]
                    )
                    n_int = int(lap.size)
                    energy = int((lap * lap).sum())
                is_sharp = int(n_int > 0 and energy >= tau * n_int)
                rows.append((r.image_id, w, h, n_int, energy, is_sharp))
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_schema.fields]
            )

    return images.mapInPandas(gen, schema=out_schema)


def caption_norm(caption) -> Column:
    """Normalized caption key for frequency analysis: lowercase,
    whitespace collapsed, trimmed — the join key under which 'A photo'
    / ' a  photo ' count as the same caption."""
    c = F.col(caption) if isinstance(caption, str) else caption
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def caption_cap(
    df: DataFrame,
    caption: str = "caption",
    quality: str = "area",
    key: str = "image_id",
    k: int = 4,
    salt_buckets: int = 16,
) -> DataFrame:
    """Caption-frequency cap — the LAION/DataComp observation that a
    handful of stock captions ('image', 'a photo', alt-text
    boilerplate) each ride MILLIONS of images and would dominate a
    contrastive batch: keep at most `k` images per normalized caption,
    best `quality` first, and report every caption's frequency for
    audit. The hot captions are by definition the skewed keys, so the
    winner selection is the two-phase top-k: phase 1 ranks inside
    (caption, salt-of-key) buckets and keeps k per bucket — a
    million-image caption costs k·salt_buckets survivors per map
    side, never one window task — phase 2 ranks the ≤ k·salt_buckets
    candidates per caption. Top-k is decomposable, so the result is
    EXACTLY the single-window answer (the oracle states that form).
    Frequency is a hash-agg + shuffle join on the caption key, never a
    count-window. Output: (key, cap_norm, cap_freq, keep 0/1) for
    every input row — a flag, not a filter, so the drop is auditable."""
    base = df.select(
        F.col(key).alias(key),
        caption_norm(caption).alias("cap_norm"),
        F.col(quality).cast("long").alias("_q"),
    )
    freq = base.groupBy("cap_norm").agg(F.count("*").alias("cap_freq"))
    salt = F.pmod(F.xxhash64(F.col(key)), F.lit(salt_buckets))
    w1 = Window.partitionBy("cap_norm", "_salt").orderBy(
        F.col("_q").desc(), F.col(key)
    )
    cand = (
        base.withColumn("_salt", salt)
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
    )
    w2 = Window.partitionBy("cap_norm").orderBy(F.col("_q").desc(), F.col(key))
    winners = (
        cand.withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= k)
        .select(
            F.col("cap_norm").alias("_wc"),
            F.col(key).alias("_wk"),
            F.lit(1).alias("_keep"),
        )
    )
    return (
        base.join(freq, "cap_norm")
        .join(
            winners,
            (F.col(key) == F.col("_wk")) & (F.col("cap_norm") == F.col("_wc")),
            "left",
        )
        .select(
            key,
            "cap_norm",
            F.col("cap_freq").cast("long").alias("cap_freq"),
            F.coalesce(F.col("_keep"), F.lit(0)).cast("long").alias("keep"),
        )
    )


def svg_meta(
    df: DataFrame, body_col: str = "body", id_col: str = "image_id"
) -> DataFrame:
    """SVG sniff + dims — the one raster-adjacent container that
    arrives as TEXT, so the parse is pure JVM regexp inside
    whole-stage codegen (no Arrow stage at all; the cheapest member of
    the header_meta family). `is_svg` requires an <svg> root (optional
    XML prolog); integer-pixel width/height attributes win, a
    "0 0 W H" viewBox is the fallback (from_viewbox = 1); percent /
    unit-ful / absent dims stay NULL — a sniffer reports only what it
    can prove. Patterns avoid backreferences and lookaround so the
    identical regexes run under Java here and RE2 in the DuckDB
    oracle."""
    body = F.col(body_col)
    is_svg = body.rlike(r'(?s)^\s*(<\?xml[^>]*\?>\s*)?<svg[\s>]')
    aw = F.regexp_extract(body, r'<svg[^>]*?\swidth="([0-9]+)"', 1).try_cast("long")
    ah = F.regexp_extract(body, r'<svg[^>]*?\sheight="([0-9]+)"', 1).try_cast("long")
    vb = r'<svg[^>]*?viewBox="0 0 ([0-9]+) ([0-9]+)"'
    vw = F.regexp_extract(body, vb, 1).try_cast("long")
    vh = F.regexp_extract(body, vb, 2).try_cast("long")
    use_vb = aw.isNull() & ah.isNull() & vw.isNotNull()
    return df.select(
        F.col(id_col).alias("image_id"),
        is_svg.cast("long").alias("is_svg"),
        F.when(~is_svg, F.lit(None).cast("long"))
        .when(use_vb, vw)
        .otherwise(aw)
        .alias("svg_w"),
        F.when(~is_svg, F.lit(None).cast("long"))
        .when(use_vb, vh)
        .otherwise(ah)
        .alias("svg_h"),
        F.when(is_svg & use_vb, F.lit(1))
        .when(is_svg, F.lit(0))
        .otherwise(F.lit(None))
        .cast("long")
        .alias("from_viewbox"),
    )


def _jpeg_gps_walk(data: bytes) -> tuple[int, int]:
    """(has_exif, has_gps) from one bounded marker walk: has_exif when
    an APP1/Exif segment parses to a valid TIFF IFD0, has_gps when
    that IFD0 carries the GPS IFD pointer tag (0x8825) — presence
    only, which is all a privacy audit needs (the rationals hang off
    the pointer). Both byte orders; malformed TIFF → (0, 0), never a
    guess."""
    if data[:3] != b"\xff\xd8\xff":
        return 0, 0
    pos = 2
    n = len(data)
    while pos + 3 < n:
        if data[pos] != 0xFF:
            return 0, 0
        marker = data[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker in (0x01, *range(0xD0, 0xD8)):
            pos += 2
            continue
        if pos + 4 > n:
            return 0, 0
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        if marker == 0xDA:
            return 0, 0  # hit entropy data without an Exif APP1
        if marker == 0xE1:
            seg = data[pos + 4 : pos + 2 + seglen]
            if seg[:6] == b"Exif\x00\x00" and len(seg) >= 14:
                tiff = seg[6:]
                bo = tiff[:2]
                e = "<" if bo == b"II" else ">" if bo == b"MM" else None
                if e is not None and struct.unpack_from(e + "H", tiff, 2)[0] == 42:
                    (ifd_off,) = struct.unpack_from(e + "I", tiff, 4)
                    if ifd_off + 2 <= len(tiff):
                        (cnt,) = struct.unpack_from(e + "H", tiff, ifd_off)
                        for i in range(cnt):
                            ep = ifd_off + 2 + 12 * i
                            if ep + 12 > len(tiff):
                                break
                            (tag,) = struct.unpack_from(e + "H", tiff, ep)
                            if tag == 0x8825:
                                return 1, 1
                        return 1, 0
        pos += 2 + seglen
    return 0, 0


def exif_gps_audit(
    images: DataFrame,
    bytes_col: str = "bytes",
    id_col: str = "image_id",
    head: int = JPEG_HEAD_BYTES,
) -> DataFrame:
    """Privacy audit BEFORE export: which JPEGs still carry EXIF, and
    which of those carry a GPS IFD (location of someone's home in a
    training corpus) — the detection side of the scrub
    (`strip_image_metadata` removes APP1 wholesale; this reports what
    WOULD leak if export skipped the scrub, and after a scrub pass it
    must report zeros). Same scale shape as jpeg_exif_orient:
    `substring` prunes to a bounded head JVM-side, the blob never
    reaches the output, one Arrow pass does the marker walk.

    Output: (image_id, has_exif 0/1, has_gps 0/1)."""
    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType(), False),
            T.StructField("has_exif", T.LongType(), False),
            T.StructField("has_gps", T.LongType(), False),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                he, hg = _jpeg_gps_walk(bytes(r.head_bytes))
                rows.append((r.image_id, he, hg))
            yield pd.DataFrame(rows, columns=["image_id", "has_exif", "has_gps"])

    pruned = images.select(
        F.col(id_col).alias("image_id"),
        F.substring(F.col(bytes_col), 1, head).alias("head_bytes"),
    )
    return pruned.mapInPandas(gen, schema=schema)


def inject_jpeg_app1(data: bytes, app1: bytes) -> bytes:
    """Insert a prebuilt APP1 segment (codecs.exif_app1) right after
    SOI — the fixture the GPS-audit tests and oracle plant with; the
    marker walks accept APP1 at any pre-SOS position."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    return data[:2] + app1 + data[2:]
