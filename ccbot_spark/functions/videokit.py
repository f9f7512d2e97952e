"""Video (Y4M/YUV4MPEG2-as-binary) column plumbing.

Third member of the multimodal family (images, audio, video): video is
an opaque `binary` column + typed metadata. Three tiers, same
economics as images/audio at 100 TB:

  1. scan-speed header gate (`y4m_header_meta`): the YUV4MPEG2 stream
     header is one ASCII line ("YUV4MPEG2 W.. H.. F..:.. .. C..\\n" —
     public mjpegtools spec), so container sniff, dimensions, frame
     rate, colorspace, and FRAME COUNT (from the fixed per-frame
     payload size) are pure-JVM string/arithmetic expressions over the
     blob prefix + length — no Python, not one pixel inflated;
  2. Arrow-batched frame tier: `frame_sample` (every-nth frame as a
     single-frame Y4M clip), `frame_features` (integer per-plane
     means), `scene_cuts` (shot-boundary detection = lag window over
     the feature table);
  3. `frames_to_ppm` bridges sampled frames into the ENTIRE existing
     image pipeline (BT.601 YCbCr→RGB, then phash / curation /
     letterbox / WDS export all apply unchanged).

The closed-world codec is uncompressed Y4M: C444 encode+decode
(exact round trip — planes are stored verbatim), C420 decode via
nearest-neighbor chroma upsample (the common subsampled layout).
Compressed video (mp4/webm/mkv) stays outside the closed world and
raises at the same documented decode boundary as mp3 does for audio;
every Spark-side shape is format-agnostic.

The synthetic fixture writes constant-valued planes per frame — pure
integer functions of (doc_id, frame_no) — so DuckDB oracles re-derive
header fields, sampled frame numbers, per-plane means, and scene-cut
positions in closed form.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import codecs

#: frames persisted by near_dup_pairs (the capped signature set that
#: keeps the Arrow decode from running twice); released via
#: clear_caches() once results are consumed — same contract as
#: functions/dedup._ACTIVE_CACHES.
_ACTIVE_CACHES: list = []


def _persist(df: DataFrame) -> DataFrame:
    from pyspark.storagelevel import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _ACTIVE_CACHES.append(df)
    return df


def clear_caches() -> None:
    """Unpersist every intermediate cached by this module (safe once
    no returned DataFrame is still in use)."""
    while _ACTIVE_CACHES:
        _ACTIVE_CACHES.pop().unpersist()

# ------------------------------------------------------------------
# Y4M codec (pure python+numpy; mjpegtools YUV4MPEG2 spec)
# ------------------------------------------------------------------


def encode_y4m(
    frames: np.ndarray, fps: tuple[int, int] = (25, 1)
) -> bytes:
    """(n, h, w, 3) uint8 YUV444 channel-last → Y4M bytes (C444: full
    chroma, planes stored verbatim — exact round trip)."""
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("encode_y4m wants (n, h, w, 3) uint8 YUV")
    if frames.dtype != np.uint8:
        raise ValueError("encode_y4m wants uint8 planes")
    n, h, w, _ = frames.shape
    out = [
        f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C444\n".encode()
    ]
    for f in range(n):
        out.append(b"FRAME\n")
        # planar: all Y, then all U, then all V
        out.append(np.ascontiguousarray(frames[f].transpose(2, 0, 1)).tobytes())
    return b"".join(out)


def _parse_header(line: bytes) -> tuple[int, int, tuple[int, int], str]:
    if not line.startswith(b"YUV4MPEG2 "):
        raise NotImplementedError(
            "codec: not a YUV4MPEG2 stream (mp4/webm/mkv need a real "
            "video library); plumbing is format-agnostic"
        )
    w = h = None
    fps = (25, 1)
    cs = "420"  # spec default when the C tag is absent
    for tok in line.decode("ascii").split()[1:]:
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "F":
            num, den = tok[1:].split(":")
            fps = (int(num), int(den))
        elif tok[0] == "C":
            cs = tok[1:]
    if w is None or h is None:
        raise ValueError("y4m header missing W/H")
    return w, h, fps, cs


def decode_y4m(data: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """Y4M bytes → ((n, h, w, 3) uint8 YUV444, (fps_num, fps_den)).
    C444 is exact; C420/C420jpeg/C420mpeg2/C420paldv (quarter chroma)
    and C422 (half-width chroma) are upsampled nearest-neighbor to 444
    (sited variants differ only in sample siting, which nearest
    upsampling ignores — documented). Anything else (mono, compressed
    containers) is explicitly unimplemented."""
    nl = data.find(b"\n")
    if nl < 0:
        raise NotImplementedError("codec: not a YUV4MPEG2 stream")
    w, h, fps, cs = _parse_header(data[:nl])
    if cs == "444":
        cw, chh = w, h
    elif cs.startswith("420"):
        cw, chh = (w + 1) // 2, (h + 1) // 2
    elif cs == "422":
        cw, chh = (w + 1) // 2, h
    else:
        raise NotImplementedError(f"y4m colorspace C{cs} not decodable")
    ysz, csz = w * h, cw * chh
    frames = []
    pos = nl + 1
    while pos < len(data):
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at byte {pos}")
        pos = data.find(b"\n", pos) + 1  # frame params (if any) ignored
        raw = np.frombuffer(data[pos : pos + ysz + 2 * csz], dtype=np.uint8)
        if raw.size != ysz + 2 * csz:
            raise ValueError("truncated y4m frame payload")
        y = raw[:ysz].reshape(h, w)
        u = raw[ysz : ysz + csz].reshape(chh, cw)
        v = raw[ysz + csz :].reshape(chh, cw)
        if chh != h:
            u = u.repeat(2, axis=0)[:h]
            v = v.repeat(2, axis=0)[:h]
        if cw != w:
            u = u.repeat(2, axis=1)[:, :w]
            v = v.repeat(2, axis=1)[:, :w]
        frames.append(np.stack([y, u, v], axis=-1))
        pos += ysz + 2 * csz
    return (
        np.stack(frames) if frames else np.zeros((0, h, w, 3), np.uint8),
        fps,
    )


# ------------------------------------------------------------------
# Deterministic fixture (pure integer function of doc_id, frame_no)
# ------------------------------------------------------------------

VIDEO_FPS = ((24, 1), (25, 1), (30, 1), (30000, 1001))

VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
    ]
)


def synth_params(doc_id: int) -> tuple[int, int, int, tuple[int, int]]:
    """(w, h, n_frames, fps) for one doc — the single source of truth
    the encoder, the tests, and the DuckDB oracles all re-derive.
    EVERY parameter (and every plane value) derives from doc_id % 150,
    so docs 150 apart are byte-identical clips → planted exact
    duplicates, same convention as the image fixtures."""
    base = doc_id % 150
    w = 16 + base * 5 % 49
    h = 16 + base * 3 % 49
    n = 2 + base % 9
    return w, h, n, VIDEO_FPS[base % 4]


def synth_plane_means(doc_id: int, f: int) -> tuple[int, int, int]:
    """Constant plane values of frame f — every frame is a solid YUV
    color, so per-plane mean == the constant (integer-exact for any
    engine) and scene cuts are wrap points of the Y sequence."""
    base = doc_id % 150
    return (
        (base * 31 + f * 17) % 256,
        (base * 7 + f * 5) % 256,
        (base * 13 + f * 11) % 256,
    )


def synth_frames(doc_id: int) -> tuple[np.ndarray, tuple[int, int]]:
    w, h, n, fps = synth_params(doc_id)
    frames = np.zeros((n, h, w, 3), np.uint8)
    for f in range(n):
        frames[f] = synth_plane_means(doc_id, f)
    return frames, fps


def synth_videos_from_docs(docs: DataFrame) -> DataFrame:
    """Deterministic video table derived from `documents` (the driver
    testdata ships no binary media) — one short Y4M clip per doc."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                frames, fps = synth_frames(d)
                n, h, w, _ = frames.shape
                rows.append(
                    (f"doc-{d}", encode_y4m(frames, fps), w, h, n)
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in VIDEO_SCHEMA.fields]
            )

    return docs.select("doc_id").mapInPandas(gen, schema=VIDEO_SCHEMA)


# ------------------------------------------------------------------
# Header gate: pure-JVM parse of the ASCII stream header
# ------------------------------------------------------------------


def _floor_div(x, d):
    return ((x - F.pmod(x, d)) / d).cast("long")


def y4m_header_meta(videos: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Container sniff + stream-header parse from the BINARY column
    alone — JVM expressions only, zero Python, zero frame inflated:
    the Y4M header is a single ASCII line, so decode the first 96
    bytes as UTF-8 (the binary tail past the first newline decodes to
    replacement chars we never read; the header itself is pure ASCII
    so char offsets == byte offsets) and regexp the W/H/F/C tokens
    out of the first line.

    The frame COUNT falls out of arithmetic: uncompressed Y4M frames
    have a fixed payload (3·w·h for C444; w·h + 2·⌈w/2⌉·⌈h/2⌉ for
    C420) behind a bare 6-byte 'FRAME\\n' marker, so
    n = (nbytes − header) / (6 + payload). (Streams using per-frame
    FRAME parameters — rare — get NULL counts rather than wrong ones:
    the divisibility check fails.)

    Output keeps every input column except the blob, plus (container,
    vid_w, vid_h, fps_num, fps_den, colorspace, n_frames, nbytes)."""
    b = F.col(bytes_col)
    # Spark 4's decode() REJECTS malformed UTF-8, and the bytes past
    # the header newline are arbitrary pixels — so isolate the header
    # in hex space first: find the first 0A at a byte boundary
    # (non-greedy two-hex-digit groups), check every header byte is
    # ASCII (< 0x80), and only then unhex+decode that exact prefix.
    hx = F.hex(F.substring(b, 1, 96))
    pre = F.regexp_extract(hx, r"^((?:[0-9A-F]{2})*?)0A", 1)
    is_y4m = (
        hx.startswith(F.lit("595556344D5045473220"))  # 'YUV4MPEG2 '
        & (pre != "")
        & pre.rlike(r"^(?:[0-7][0-9A-F])+$")  # header is pure ASCII
    )
    line = F.when(is_y4m, F.decode(F.unhex(pre), "UTF-8"))
    vid_w = F.regexp_extract(line, r" W(\d+)", 1).cast("long")
    vid_h = F.regexp_extract(line, r" H(\d+)", 1).cast("long")
    fps_num = F.regexp_extract(line, r" F(\d+):(\d+)", 1).cast("long")
    fps_den = F.regexp_extract(line, r" F(\d+):(\d+)", 2).cast("long")
    cs_tok = F.regexp_extract(line, r" C(\S+)", 1)
    cs = F.when(cs_tok == "", F.lit("420")).otherwise(cs_tok)
    payload = F.when(
        cs == "444", F.lit(3).cast("long") * vid_w * vid_h
    ).when(
        cs.startswith("420"),
        vid_w * vid_h
        + F.lit(2) * _floor_div(vid_w + 1, F.lit(2)) * _floor_div(vid_h + 1, F.lit(2)),
    ).when(
        cs == "422",
        vid_w * vid_h + F.lit(2) * _floor_div(vid_w + 1, F.lit(2)) * vid_h,
    )
    hdr_len = (F.length(line) + 1).cast("long")
    nbytes = F.length(b).cast("long")
    body = nbytes - hdr_len
    per_frame = payload + 6
    n_frames = F.when(
        F.pmod(body, per_frame) == 0, _floor_div(body, per_frame)
    )
    out_names = {
        "container", "vid_w", "vid_h", "fps_num", "fps_den",
        "colorspace", "n_frames", "nbytes",
    }
    # input columns shadowed by a parse output are dropped — the gate
    # RE-DERIVES them from the blob (trusting upstream metadata is
    # exactly what a crawl curation gate must not do)
    keep = [
        c for c in videos.columns if c != bytes_col and c not in out_names
    ]
    w_ = lambda e: F.when(is_y4m, e)  # noqa: E731
    return videos.select(
        *keep,
        F.when(is_y4m, F.lit("y4m")).alias("container"),
        w_(vid_w).alias("vid_w"),
        w_(vid_h).alias("vid_h"),
        w_(fps_num).alias("fps_num"),
        w_(fps_den).alias("fps_den"),
        w_(cs).alias("colorspace"),
        w_(n_frames).alias("n_frames"),
        nbytes.alias("nbytes"),
    )


# ------------------------------------------------------------------
# Frame tier (Arrow-batched decode)
# ------------------------------------------------------------------

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("frame_no", T.IntegerType(), False),
        T.StructField("bytes", T.BinaryType(), False),
    ]
)

FRAME_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("frame_no", T.LongType(), False),
        T.StructField("y_mean", T.LongType(), False),
        T.StructField("u_mean", T.LongType(), False),
        T.StructField("v_mean", T.LongType(), False),
    ]
)


def frame_sample(
    videos: DataFrame,
    every_n: int = 10,
    bytes_col: str = "bytes",
    id_col: str = "video_id",
) -> DataFrame:
    """Every n-th frame exploded to its own row as a SINGLE-FRAME Y4M
    clip (format-preserving: downstream video tools read the sample
    like any stream; `frames_to_ppm` turns it into image-pipeline
    input). Iterator mapInPandas, bounded Arrow batches — rows
    multiply by ~n_frames/every_n but each output blob is one frame,
    so the stage SHRINKS bytes for any every_n > 1."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                frames, fps = decode_y4m(bytes(getattr(r, bytes_col)))
                for f in range(0, frames.shape[0], every_n):
                    rows.append(
                        (
                            getattr(r, id_col),
                            f,
                            encode_y4m(frames[f : f + 1], fps),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return videos.select(id_col, bytes_col).mapInPandas(
        gen, schema=FRAME_SCHEMA
    )


def frame_features(
    videos: DataFrame,
    every_n: int = 1,
    bytes_col: str = "bytes",
    id_col: str = "video_id",
) -> DataFrame:
    """Integer per-plane means for every sampled frame (floor of
    sum/count — exact in any engine). One decode per video; the blob
    never leaves the stage."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                frames, _fps = decode_y4m(bytes(getattr(r, bytes_col)))
                npx = frames.shape[1] * frames.shape[2]
                for f in range(0, frames.shape[0], every_n):
                    sums = frames[f].astype(np.int64).sum(axis=(0, 1))
                    rows.append(
                        (
                            getattr(r, id_col),
                            f,
                            int(sums[0]) // npx,
                            int(sums[1]) // npx,
                            int(sums[2]) // npx,
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_FEATURES_SCHEMA.fields]
            )

    return videos.select(id_col, bytes_col).mapInPandas(
        gen, schema=FRAME_FEATURES_SCHEMA
    )


def scene_cuts(feats: DataFrame, min_jump: int = 100) -> DataFrame:
    """Shot-boundary detection over the frame-feature table: a cut is
    a frame whose Y mean jumps ≥ min_jump from its predecessor — a lag
    window per video over the existing features, zero extra decode
    (the classic sampling step before per-shot frame extraction in
    video training pipelines)."""
    win = Window.partitionBy("video_id").orderBy("frame_no")
    prev = F.lag("y_mean").over(win)
    return feats.select(
        "video_id",
        "frame_no",
        "y_mean",
        F.coalesce(prev, F.col("y_mean")).alias("prev_y_mean"),
        F.when(
            prev.isNotNull()
            & (F.abs(F.col("y_mean") - prev) >= min_jump),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("cut"),
    )


def curation_flags(
    meta: DataFrame,
    min_side: int = 32,
    min_frames: int = 3,
    min_duration_ms: int = 100,
) -> DataFrame:
    """Video curation gates over the HEADER table — too-small dims,
    too-few frames, too-short duration (frame count × fps from the
    stream header; integer cross-multiplication, no floats) — pure
    column exprs that collapse into the header scan: every verdict
    lands before a single frame is decoded. Non-y4m rows (NULL parse)
    gate as not-kept with `unparsed` set."""
    unparsed = F.col("container").isNull().cast("long")
    too_small = (
        F.least("vid_w", "vid_h") < min_side
    ).cast("long")
    too_few = (F.col("n_frames") < min_frames).cast("long")
    # duration_ms = n·1000·den/num < min  ⇔  n·1000·den < min·num
    too_short = (
        F.col("n_frames") * 1000 * F.col("fps_den")
        < F.lit(min_duration_ms) * F.col("fps_num")
    ).cast("long")
    keep = (
        (unparsed == 0)
        & (too_small == 0)
        & (too_few == 0)
        & (too_short == 0)
    ).cast("long")
    return meta.select(
        "video_id",
        "vid_w",
        "vid_h",
        "n_frames",
        "fps_num",
        "fps_den",
        unparsed.alias("unparsed"),
        F.coalesce(too_small, F.lit(0)).alias("too_small"),
        F.coalesce(too_few, F.lit(0)).alias("too_few"),
        F.coalesce(too_short, F.lit(0)).alias("too_short"),
        F.coalesce(keep, F.lit(0)).alias("keep"),
    )


def keyframes(feats: DataFrame, min_jump: int = 100) -> DataFrame:
    """Keyframe selection: frame 0 plus the first frame of every shot
    (scene_cuts over the same feature table) — the standard
    one-frame-per-shot reduction before vision-language training
    export. Pure filter over scene_cuts: zero extra decode; join the
    result back to `frame_sample(every_n=1)` rows (or re-sample just
    these frame numbers) to materialize pixels for ONLY the keepers."""
    return (
        scene_cuts(feats, min_jump=min_jump)
        .filter((F.col("cut") == 1) | (F.col("frame_no") == 0))
        .select("video_id", "frame_no", "y_mean")
    )


def frames_to_ppm(frames: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Bridge into the image pipeline: single-frame Y4M → RGB ppm
    (BT.601 full-range, the same `_ycbcr_to_rgb` the JPEG codec uses),
    output shaped exactly like the image tables (image_id, bytes, w,
    h, fmt) so phash / curation / letterbox / WDS export apply
    unchanged."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                fr, _fps = decode_y4m(bytes(getattr(r, bytes_col)))
                px = codecs._ycbcr_to_rgb(
                    fr[0, :, :, 0].astype(np.float64),
                    fr[0, :, :, 1].astype(np.float64),
                    fr[0, :, :, 2].astype(np.float64),
                )
                rows.append(
                    (
                        f"{r.video_id}#f{int(r.frame_no)}",
                        codecs.encode_ppm(px),
                        px.shape[1],
                        px.shape[0],
                        "ppm",
                    )
                )
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
    return frames.select("video_id", "frame_no", bytes_col).mapInPandas(
        gen, schema=schema
    )


def near_dup_pairs(
    feats: DataFrame,
    min_shared: int = 2,
    df_cap: int = 24,
    min_jaccard_milli: int = 200,
    id_col: str = "video_id",
) -> DataFrame:
    """Near-duplicate VIDEO detection over shot-signature sets — the
    re-encode/trim/re-post case byte-exact dedup can't see: two clips
    sharing most of their (coarse) per-frame color signatures are the
    same footage even when the containers differ.

    signature  = (y_mean // 16) * 16 + (u_mean // 16)  — a coarse
    (Y, U)-bucket code per sampled frame, robust to small re-encode
    shifts by construction (anything within a 16-level plane bucket
    collides); per-video signature SETS are compared with the same
    df-capped Jaccard as dedup.mirror_hosts: signatures shared by more
    than `df_cap` videos are dropped FIRST (solid-color intros, black
    frames — the boilerplate of video), set sizes are counted over the
    SAME capped universe, and jaccard_milli is the exact integer
    (shared·1000) div (union).

    Scale shape: signatures come from the one existing frame_features
    decode pass (the blob never re-reads); then one sig hash-agg for
    the cap, one self equi-join ON SIGNATURE (≤ df_cap² pairs per
    sig — linear in signatures, never all-pairs in videos), one pair
    hash-agg. The capped sig set is persisted so the Arrow decode
    never runs twice; callers unpersist via the returned frame's
    lineage once consumed (300-video fixtures just let it expire).

    Output: (vid_a, vid_b, shared, jaccard_milli), vid_a < vid_b."""
    sigs = feats.select(
        id_col,
        (
            F.shiftleft(F.shiftright(F.col("y_mean"), 4), 4)
            + F.shiftright(F.col("u_mean"), 4)
        )
        .cast("long")
        .alias("sig"),
    ).distinct()
    by_sig = sigs.groupBy("sig").agg(F.count("*").alias("_nv"))
    kept = sigs.join(
        by_sig.filter(F.col("_nv") <= df_cap).select("sig"), "sig"
    )
    kept = _persist(kept)
    sizes = kept.groupBy(id_col).agg(F.count("*").alias("n_sigs"))
    a = kept.select(F.col(id_col).alias("vid_a"), "sig")
    b = kept.select(F.col(id_col).alias("vid_b"), "sig")
    shared = (
        a.join(b, "sig")
        .filter(F.col("vid_a") < F.col("vid_b"))
        .groupBy("vid_a", "vid_b")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    return (
        shared.join(
            sizes.withColumnRenamed(id_col, "vid_a")
            .withColumnRenamed("n_sigs", "na"),
            "vid_a",
        )
        .join(
            sizes.withColumnRenamed(id_col, "vid_b")
            .withColumnRenamed("n_sigs", "nb"),
            "vid_b",
        )
        .select(
            "vid_a",
            "vid_b",
            F.col("shared").cast("long").alias("shared"),
            F.expr("(shared * 1000) div (na + nb - shared)")
            .cast("long")
            .alias("jaccard_milli"),
        )
        .filter(F.col("jaccard_milli") >= min_jaccard_milli)
    )
