"""Audio (WAV/PCM-as-binary) column plumbing.

Same multimodal pattern as images: audio is an opaque `binary`
column + typed metadata; header gates run as pure-JVM fixed-offset
expressions on the blob (no decode, no Python — scan-speed at
100 TB), and sample-level transforms stream through Arrow-batched
`mapInPandas` in bounded batches.

The closed-world codec here is canonical RIFF/WAVE PCM-16 (the
44-byte header + interleaved little-endian int16 frames — public
knowledge, Microsoft/IBM RIFF spec), written and read with stdlib
struct + numpy. Compressed containers (mp3, ogg, flac) stay outside
the closed world: the sniff recognizes nothing but 'RIFF…WAVE', and
the decode boundary raises NotImplementedError exactly like the
image codecs do for mp4 — plug the real library there; every
Spark-side shape (schema, batch flow, partitioning) is unchanged.

All synthetic fixtures are pure integer functions of doc_id so the
DuckDB oracles re-derive both the HEADER values the encoder wrote
and the sample-level FEATURES the decoder must compute: a square
wave of amplitude A has peak == rms == A and one sign flip every
half-period — integer-exact, engine-neutral.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .multimodal import _le_uint

# ------------------------------------------------------------------
# WAV PCM-16 codec (stdlib struct + numpy; canonical 44-byte header)
# ------------------------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n,) or (n, channels) int16 → canonical RIFF/WAVE PCM-16 bytes
    (44-byte header, interleaved little-endian frames)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.dtype != np.int16:
        raise ValueError("encode_wav wants int16 samples")
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()  # row-major == interleaved
    byte_rate = rate * ch * 2
    header = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, ch, rate, byte_rate, ch * 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return header + data


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM-16 bytes → ((n, channels) int16, rate). Only the
    canonical layout this module writes; anything else is explicitly
    unimplemented (no silent fake samples on the decode path)."""
    if data[:4] != b"RIFF" or data[8:16] != b"WAVEfmt ":
        raise NotImplementedError(
            "codec: not a canonical RIFF/WAVE blob (mp3/ogg/flac need a "
            "real audio library); plumbing is format-agnostic"
        )
    sub1, fmt_code, ch, rate, _br, _ba, bits = struct.unpack(
        "<IHHIIHH", data[16:36]
    )
    if sub1 != 16 or fmt_code != 1 or bits != 16 or data[36:40] != b"data":
        raise NotImplementedError("only canonical PCM-16 WAV is decodable")
    size = struct.unpack("<I", data[40:44])[0]
    samples = np.frombuffer(data[44 : 44 + size], dtype="<i2")
    return samples.reshape(-1, ch), rate


# ------------------------------------------------------------------
# Deterministic fixture (pure integer function of doc_id)
# ------------------------------------------------------------------

AUDIO_RATES = (8000, 16000, 22050, 44100)

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("rate", T.IntegerType(), False),
        T.StructField("channels", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
    ]
)


def synth_params(doc_id: int) -> tuple[int, int, int, int, int]:
    """(rate, channels, n_samples, amplitude, half_period) for one doc —
    the single source of truth the encoder, the tests, and the DuckDB
    oracles all re-derive. Square wave s[i] = ±A flipping every p
    samples; every 10th base is silence (A = 0) so curation gates have
    real work. EVERY parameter derives from doc_id % 150, so docs 150
    apart are byte-identical WAVs → planted exact duplicates, same
    convention as the image fixtures."""
    base = doc_id % 150
    rate = AUDIO_RATES[base % 4]
    channels = 1 + (base % 2)
    n = 256 + (base * 37) % 4096
    amp = 0 if base % 10 == 0 else 500 + (base * 131) % 30000
    period = 8 + (base % 23)
    return rate, channels, n, amp, period


def synth_wave(doc_id: int) -> tuple[np.ndarray, int]:
    """((n, channels) int16, rate) for one doc."""
    rate, ch, n, amp, period = synth_params(doc_id)
    i = np.arange(n)
    wave = np.where((i // period) % 2 == 0, amp, -amp).astype(np.int16)
    return np.repeat(wave[:, None], ch, axis=1), rate


def synth_audio_from_docs(docs: DataFrame) -> DataFrame:
    """Deterministic audio table derived from `documents` (the driver
    testdata ships no binary media). One WAV per doc; pure function of
    doc_id ⇒ reproducible anywhere, and every header field / feature
    is integer arithmetic a SQL oracle can re-derive."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                samples, rate = synth_wave(d)
                rows.append(
                    (
                        f"doc-{d}",
                        encode_wav(samples, rate),
                        rate,
                        samples.shape[1],
                        samples.shape[0],
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_SCHEMA.fields]
            )

    return docs.select("doc_id").mapInPandas(gen, schema=AUDIO_SCHEMA)


# ------------------------------------------------------------------
# Header gate: pure-JVM fixed-offset parse (no decode, no Python)
# ------------------------------------------------------------------


def _floor_div(x, d):
    """Integer floor division as a JVM expression (house idiom: no
    float thresholds anywhere in oracled paths)."""
    return ((x - F.pmod(x, d)) / d).cast("long")


def wav_header_meta(audio: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Container sniff + PCM header parse from the BINARY column alone —
    entirely JVM column expressions inside whole-stage codegen, the
    same scan-speed shape as image `header_meta`: unlabeled blobs
    arrive from a crawl and rate/duration gates must run without
    inflating a single sample.

    Canonical WAV puts everything at fixed offsets (1-based):
    'RIFF' @1, 'WAVE' @9, 'fmt ' @13, u16 LE audio-format @21
    (1 = PCM), u16 LE channels @23, u32 LE sample-rate @25, u16 LE
    bits @35, 'data' @37, u32 LE data-size @41. Little-endian ints
    use the per-byte hex-reversal + conv idiom shared with the BMP
    branch of image header_meta. Non-WAV magic, non-PCM format codes,
    and non-canonical layouts parse as all-NULL rather than wrong.

    Output keeps every input column except the blob, plus
    (container, hdr_channels, hdr_rate, hdr_bits, hdr_n_samples,
    hdr_duration_ms, nbytes)."""
    b = F.col(bytes_col)
    is_wav = (
        (F.hex(F.substring(b, 1, 4)) == F.lit("52494646"))  # 'RIFF'
        & (
            F.hex(F.substring(b, 9, 8)) == F.lit("57415645666D7420")
        )  # 'WAVEfmt '
        & (_le_uint(b, 17, 4) == 16)  # canonical fmt-chunk size
        & (_le_uint(b, 21, 2) == 1)  # PCM
        & (F.hex(F.substring(b, 37, 4)) == F.lit("64617461"))  # 'data'
    )
    channels = _le_uint(b, 23, 2)
    rate = _le_uint(b, 25, 4)
    bits = _le_uint(b, 35, 2)
    data_size = _le_uint(b, 41, 4)
    bytes_per_frame = channels * _floor_div(bits, F.lit(8))
    n_samples = _floor_div(data_size, bytes_per_frame)
    duration_ms = _floor_div(n_samples * 1000, rate)
    keep = [c for c in audio.columns if c != bytes_col]
    w = lambda e: F.when(is_wav, e)  # noqa: E731
    return audio.select(
        *keep,
        F.when(is_wav, F.lit("wav")).alias("container"),
        w(channels).alias("hdr_channels"),
        w(rate).alias("hdr_rate"),
        w(bits).alias("hdr_bits"),
        w(n_samples).alias("hdr_n_samples"),
        w(duration_ms).alias("hdr_duration_ms"),
        F.length(b).cast("long").alias("nbytes"),
    )


# ------------------------------------------------------------------
# Sample-level features (Arrow-batched decode; integer-exact)
# ------------------------------------------------------------------

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType(), False),
        T.StructField("rate", T.LongType(), False),
        T.StructField("channels", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("peak", T.LongType(), False),
        T.StructField("rms", T.LongType(), False),
        T.StructField("zero_crossings", T.LongType(), False),
    ]
)


def audio_features(
    audio: DataFrame, bytes_col: str = "bytes", id_col: str = "audio_id"
) -> DataFrame:
    """Decode PCM and compute integer-exact signal features per blob:
    peak = max |sample| (int64 — no int16 abs overflow), rms = floor
    integer sqrt of the mean square (exact for any constant-|A| wave),
    zero_crossings = value changes along the first channel. Iterator
    mapInPandas, bounded Arrow batches, blob never leaves the stage —
    the audio twin of the image decode_features pass."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                s, rate = decode_wav(bytes(getattr(r, bytes_col)))
                wide = s.astype(np.int64)
                n, ch = s.shape
                peak = int(np.abs(wide).max()) if n else 0
                sum_sq = int((wide * wide).sum())
                rms = math.isqrt(sum_sq // (n * ch)) if n else 0
                zc = int(np.count_nonzero(np.diff(s[:, 0]))) if n else 0
                rows.append(
                    (getattr(r, id_col), rate, ch, n, peak, rms, zc)
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FEATURES_SCHEMA.fields]
            )

    return audio.select(id_col, bytes_col).mapInPandas(
        gen, schema=FEATURES_SCHEMA
    )


# ------------------------------------------------------------------
# Resample (integer decimation) — bytes in, bytes out
# ------------------------------------------------------------------


def resample_decimate(
    audio: DataFrame, k: int = 2, bytes_col: str = "bytes"
) -> DataFrame:
    """Keep every k-th frame (all channels), re-encode as WAV at
    rate/k — the cheap integer-factor downsample a training pipeline
    applies before feature extraction. Pure per-row transform: no
    shuffle, bounded Arrow batches. (A proper low-pass + polyphase
    resampler slots in at the same seam when scipy is available.)"""
    if k < 1:
        raise ValueError("k must be >= 1")

    out_schema = AUDIO_SCHEMA

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                s, rate = decode_wav(bytes(getattr(r, bytes_col)))
                out = np.ascontiguousarray(s[::k])
                out_rate = rate // k
                rows.append(
                    (
                        r.audio_id,
                        encode_wav(out, out_rate),
                        out_rate,
                        out.shape[1],
                        out.shape[0],
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_schema.fields]
            )

    return audio.select("audio_id", bytes_col).mapInPandas(
        gen, schema=out_schema
    )


# ------------------------------------------------------------------
# Robust perceptual fingerprint (Haitsma–Kalker shape)
# ------------------------------------------------------------------

#: (FP_WINDOWS-1) × (FP_BANDS-1) = 63 sign bits → non-negative int64
FP_WINDOWS, FP_BANDS = 10, 8

FP_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType(), False),
        T.StructField("fp", T.LongType(), False),
    ]
)


def fingerprint_bits(s: np.ndarray) -> int:
    """Robust 63-bit audio fingerprint (the Haitsma–Kalker / Philips
    robust-hash shape, public ISMIR 2002 algorithm): mono mix → 10
    equal time windows → per-window energy spectrum (numpy rfft, DC
    dropped) folded into 8 bands → each bit is the SIGN of the
    band-energy second difference (across band, then across window).
    Signs of second differences are invariant to global amplitude
    scaling and robust to small perturbations — exactly what survives
    re-encoding while distinguishing unrelated content. Degenerate
    inputs (too short, silence) fingerprint as 0."""
    mono = s.astype(np.float64).mean(axis=1)
    n = mono.size - (mono.size % FP_WINDOWS)
    if n < FP_WINDOWS:
        return 0
    wins = mono[:n].reshape(FP_WINDOWS, -1)
    spec = np.abs(np.fft.rfft(wins, axis=1)) ** 2
    spec = spec[:, 1:]  # drop DC: constant offsets carry no content
    m = spec.shape[1] - (spec.shape[1] % FP_BANDS)
    if m < FP_BANDS:
        return 0
    bands = spec[:, :m].reshape(FP_WINDOWS, FP_BANDS, -1).sum(axis=2)
    dd = np.diff(np.diff(bands, axis=1), axis=0)
    fp = 0
    for bit in (dd > 0).flatten():
        fp = (fp << 1) | int(bit)
    return fp


def audio_fingerprints(
    audio: DataFrame, bytes_col: str = "bytes", id_col: str = "audio_id"
) -> DataFrame:
    """(audio_id, fp) per blob — decode + fingerprint in one bounded
    Arrow pass; the 8-byte fp is what shuffles downstream, never the
    samples."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                s, _rate = decode_wav(bytes(getattr(r, bytes_col)))
                rows.append((getattr(r, id_col), fingerprint_bits(s)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FP_SCHEMA.fields]
            )

    return audio.select(id_col, bytes_col).mapInPandas(gen, schema=FP_SCHEMA)


def fingerprint_near_pairs(fps: DataFrame, max_ham: int = 6) -> DataFrame:
    """Perceptual audio near-dup pairs: the SAME banded Hamming join
    the image pipeline uses (multimodal.phash_near_pairs is
    hash-agnostic — 4×16-bit band equi-join prefilter, exact
    bit_count verify). Output (aud_a, aud_b, hamming)."""
    from . import multimodal

    pairs = multimodal.phash_near_pairs(
        fps.select(F.col("audio_id").alias("image_id"), F.col("fp").alias("phash")),
        max_ham=max_ham,
    )
    return pairs.select(
        F.col("img_a").alias("aud_a"),
        F.col("img_b").alias("aud_b"),
        "hamming",
    )


# ------------------------------------------------------------------
# Curation gates (column exprs over the feature/header tables)
# ------------------------------------------------------------------


def curation_flags(
    feats: DataFrame,
    min_duration_ms: int = 20,
    min_rate: int = 16000,
    max_channels: int = 2,
) -> DataFrame:
    """Audio curation gates over the feature table — silence, too-short,
    low-sample-rate, channel cap — as pure column expressions (the
    gates collapse into the feature scan; no extra shuffle). Mirrors
    the image curation_flags shape: one boolean per gate + keep."""
    duration_ms = _floor_div(F.col("n_samples") * 1000, F.col("rate"))
    silent = (F.col("peak") == 0).cast("long")
    too_short = (duration_ms < min_duration_ms).cast("long")
    low_rate = (F.col("rate") < min_rate).cast("long")
    too_many_ch = (F.col("channels") > max_channels).cast("long")
    keep = (
        (silent == 0) & (too_short == 0) & (low_rate == 0) & (too_many_ch == 0)
    ).cast("long")
    return feats.select(
        "audio_id",
        duration_ms.alias("duration_ms"),
        "rate",
        "channels",
        "peak",
        "rms",
        silent.alias("silent"),
        too_short.alias("too_short"),
        low_rate.alias("low_rate"),
        too_many_ch.alias("too_many_ch"),
        keep.alias("keep"),
    )


def near_dup_blocks(feats: DataFrame, id_col: str = "audio_id") -> DataFrame:
    """Resample/gain-tolerant near-duplicate BLOCKING over decoded
    audio features — the audio twin of the image phash-band and video
    shot-signature passes: two uploads of the same recording usually
    differ by sample RATE (re-encode) or small GAIN, not by waveform
    shape. The block key deliberately excludes the rate:

        (channels, p_est, amp_bucket)
        p_est      = (n_samples − 1) div zero_crossings   # shape, in
                     samples-per-half-period — rate-free
        amp_bucket = rms >> 8                             # 256-level
                     gain bucket

    Silent clips (peak = 0) carry no shape and are excluded. One
    hash-agg on the block key + a min-id keeper per block; clips never
    compare pairwise — blocking IS the scale story (candidates exist
    only within a block, like LSH bands). Output: each clip in a
    block of ≥ 2, (audio_id, channels, p_est, amp_bucket, group_n,
    is_keeper)."""
    sig = feats.filter(
        (F.col("peak") > 0) & (F.col("zero_crossings") > 0)
    ).select(
        id_col,
        F.col("channels").cast("long").alias("channels"),
        F.expr("(n_samples - 1) div zero_crossings")
        .cast("long")
        .alias("p_est"),
        F.shiftright(F.col("rms"), 8).cast("long").alias("amp_bucket"),
    )
    grp = sig.groupBy("channels", "p_est", "amp_bucket").agg(
        F.count("*").alias("group_n"), F.min(id_col).alias("_keeper")
    )
    return (
        sig.join(grp, ["channels", "p_est", "amp_bucket"])
        .filter(F.col("group_n") >= 2)
        .select(
            id_col,
            "channels",
            "p_est",
            "amp_bucket",
            F.col("group_n").cast("long").alias("group_n"),
            (F.col(id_col) == F.col("_keeper")).cast("long").alias("is_keeper"),
        )
    )
