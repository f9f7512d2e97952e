"""Video (Y4M) plumbing: codec round trip incl. C420 upsample and
frame params, JVM header gate vs python decode truth (and vs junk),
frame sampling/features on random (non-constant) frames, scene cuts,
the bridge into the image pipeline, and the multimodal dispatch."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ccbot_spark import codecs
from ccbot_spark.functions import multimodal, videokit
from ccbot_spark.plans import explainkit

# ------------------------------------------------------------------
# Pure-python codec
# ------------------------------------------------------------------


@pytest.mark.parametrize("n,h,w", [(1, 1, 1), (4, 17, 23), (9, 48, 64)])
def test_y4m_round_trip_exact(n, h, w):
    rng = np.random.default_rng(n * h * w)
    fr = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
    blob = videokit.encode_y4m(fr, (30000, 1001))
    out, fps = videokit.decode_y4m(blob)
    assert fps == (30000, 1001)
    np.testing.assert_array_equal(out, fr)


def test_y4m_decode_c420_upsample():
    w, h = 6, 4
    y = np.arange(w * h, dtype=np.uint8).reshape(h, w)
    u = np.arange(6, dtype=np.uint8).reshape(2, 3) + 10
    v = np.arange(6, dtype=np.uint8).reshape(2, 3) + 40
    data = (
        b"YUV4MPEG2 W6 H4 F25:1 Ip A1:1 C420jpeg\n"
        + b"FRAME\n" + y.tobytes() + u.tobytes() + v.tobytes()
    )
    fr, fps = videokit.decode_y4m(data)
    assert fr.shape == (1, h, w, 3) and fps == (25, 1)
    np.testing.assert_array_equal(fr[0, :, :, 0], y)
    # nearest upsample: each chroma sample covers a 2x2 block
    np.testing.assert_array_equal(
        fr[0, :, :, 1], u.repeat(2, axis=0).repeat(2, axis=1)
    )


def test_y4m_decode_frame_params_and_default_c420():
    # spec allows per-frame params after FRAME and defaults C to 420
    u = np.full((1, 1), 9, np.uint8)
    data = (
        b"YUV4MPEG2 W2 H2 F25:1\n"
        + b"FRAME Ixyz\n" + bytes([1, 2, 3, 4]) + u.tobytes() + u.tobytes()
    )
    fr, _ = videokit.decode_y4m(data)
    assert fr.shape == (1, 2, 2, 3)
    np.testing.assert_array_equal(fr[0, :, :, 0], [[1, 2], [3, 4]])
    assert (fr[0, :, :, 1] == 9).all()


def test_synth_planted_duplicates():
    # every clip parameter and plane value is base-150 derived → docs
    # 150 apart are byte-identical clips (the vid_exact_dedup contract)
    for d in (2, 11, 149):
        fa, ra = videokit.synth_frames(d)
        fb, rb = videokit.synth_frames(d + 150)
        assert ra == rb and np.array_equal(fa, fb)
        assert videokit.encode_y4m(fa, ra) == videokit.encode_y4m(fb, rb)


def test_y4m_decode_c422_upsample():
    # half-width chroma, full height: columns repeat, rows don't
    w, h = 5, 3
    y = np.arange(w * h, dtype=np.uint8).reshape(h, w)
    u = np.arange(9, dtype=np.uint8).reshape(3, 3) + 20
    v = np.arange(9, dtype=np.uint8).reshape(3, 3) + 60
    data = (
        b"YUV4MPEG2 W5 H3 F25:1 C422\n"
        + b"FRAME\n" + y.tobytes() + u.tobytes() + v.tobytes()
    )
    fr, _ = videokit.decode_y4m(data)
    assert fr.shape == (1, h, w, 3)
    np.testing.assert_array_equal(fr[0, :, :, 0], y)
    np.testing.assert_array_equal(
        fr[0, :, :, 1], u.repeat(2, axis=1)[:, :w]
    )
    np.testing.assert_array_equal(
        fr[0, :, :, 2], v.repeat(2, axis=1)[:, :w]
    )


def test_y4m_header_meta_c422_count(spark):
    w, h = 5, 3
    blob = b"YUV4MPEG2 W5 H3 F25:1 C422\n" + 3 * (
        b"FRAME\n" + bytes(w * h + 2 * 3 * h)
    )
    df = spark.createDataFrame(
        [("v", bytearray(blob))], "video_id string, bytes binary"
    )
    r = videokit.y4m_header_meta(df).collect()[0]
    assert r["colorspace"] == "422" and r["n_frames"] == 3


def test_y4m_decode_rejects():
    with pytest.raises(NotImplementedError):
        videokit.decode_y4m(b"\x00\x00\x00 ftypmp42" + b"\x00" * 50)
    with pytest.raises(NotImplementedError):  # unsupported colorspace
        videokit.decode_y4m(b"YUV4MPEG2 W2 H2 F25:1 Cmono\n" + b"\x00" * 20)
    with pytest.raises(ValueError):  # truncated payload
        videokit.decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 C444\nFRAME\n\x00\x00")


# ------------------------------------------------------------------
# Spark: header gate
# ------------------------------------------------------------------


@pytest.fixture(scope="module")
def vids(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 100
    )
    return videokit.synth_videos_from_docs(docs).cache()


def test_header_meta_matches_decode(vids):
    meta = {
        r["video_id"]: r
        for r in videokit.y4m_header_meta(vids).collect()
    }
    for row in vids.collect():
        frames, fps = videokit.decode_y4m(bytes(row["bytes"]))
        m = meta[row["video_id"]]
        assert m["container"] == "y4m"
        assert m["colorspace"] == "444"
        assert (m["vid_w"], m["vid_h"]) == (frames.shape[2], frames.shape[1])
        assert (m["fps_num"], m["fps_den"]) == fps
        assert m["n_frames"] == frames.shape[0]
        assert m["nbytes"] == len(bytes(row["bytes"]))


def test_header_meta_junk_is_null(spark):
    rows = [
        ("a", bytearray(b"\x00\x01" + bytes(range(200, 250)))),  # binary junk
        ("b", bytearray(b"YUV4MPEG2 \xff\xfegarbage\n123")),  # non-ASCII hdr
        ("c", bytearray(b"YUV4MPEG2 W4 H4 no newline")),
        ("d", bytearray(b"RIFF1234WAVEfmt ")),  # wrong container
    ]
    df = spark.createDataFrame(rows, "video_id string, bytes binary")
    for r in videokit.y4m_header_meta(df).collect():
        assert r["container"] is None and r["n_frames"] is None
        assert r["nbytes"] > 0


def test_header_meta_c420_count_and_shadowed_metadata(spark):
    # C420 stream: frame count uses the subsampled payload size; a
    # LYING upstream n_frames column is re-derived, not trusted
    u = np.full((2, 3), 7, np.uint8)
    y = np.zeros((4, 6), np.uint8)
    blob = b"YUV4MPEG2 W6 H4 F30:1 C420\n" + 2 * (
        b"FRAME\n" + y.tobytes() + u.tobytes() + u.tobytes()
    )
    df = spark.createDataFrame(
        [("v", bytearray(blob), 99)], "video_id string, bytes binary, n_frames int"
    )
    r = videokit.y4m_header_meta(df).collect()[0]
    assert r["colorspace"] == "420" and r["n_frames"] == 2
    assert r["vid_w"] == 6 and r["fps_num"] == 30


def test_header_meta_stays_jvm(vids):
    plan = explainkit.formatted_plan(videokit.y4m_header_meta(vids))
    assert "BatchEvalPython" not in plan, plan
    assert "ArrowEvalPython" not in plan, plan


# ------------------------------------------------------------------
# Frame tier: sampling, features, cuts, image-pipeline bridge
# ------------------------------------------------------------------


def _random_clip(seed, n=7, h=9, w=11):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)


def test_frame_sample_every_n(spark):
    fr = _random_clip(3)
    df = spark.createDataFrame(
        [("v", bytearray(videokit.encode_y4m(fr, (24, 1))))],
        "video_id string, bytes binary",
    )
    rows = sorted(
        videokit.frame_sample(df, every_n=3).collect(),
        key=lambda r: r["frame_no"],
    )
    assert [r["frame_no"] for r in rows] == [0, 3, 6]
    for r in rows:
        one, fps = videokit.decode_y4m(bytes(r["bytes"]))
        assert fps == (24, 1) and one.shape[0] == 1
        np.testing.assert_array_equal(one[0], fr[r["frame_no"]])


def test_frame_sample_rejects_bad_n(spark):
    with pytest.raises(ValueError):
        videokit.frame_sample(None, every_n=0)


def test_frame_features_match_numpy(spark):
    fr = _random_clip(5)
    df = spark.createDataFrame(
        [("v", bytearray(videokit.encode_y4m(fr)))],
        "video_id string, bytes binary",
    )
    got = {
        r["frame_no"]: (r["y_mean"], r["u_mean"], r["v_mean"])
        for r in videokit.frame_features(df).collect()
    }
    npx = fr.shape[1] * fr.shape[2]
    for f in range(fr.shape[0]):
        sums = fr[f].astype(np.int64).sum(axis=(0, 1))
        assert got[f] == tuple(int(s) // npx for s in sums)


def test_scene_cuts_fire_exactly_at_wraps(vids):
    cuts = videokit.scene_cuts(videokit.frame_features(vids), min_jump=100)
    for r in cuts.collect():
        d = int(r["video_id"].split("-")[1])
        f = r["frame_no"]
        y_now = videokit.synth_plane_means(d, f)[0]
        assert r["y_mean"] == y_now
        # fixture Y steps +17 mod 256 → a ≥100 jump iff the sequence
        # wrapped between f-1 and f
        expect = 1 if f > 0 and y_now < videokit.synth_plane_means(d, f - 1)[0] else 0
        assert r["cut"] == expect, (d, f)


def test_curation_gates_fire(spark, vids):
    meta = videokit.y4m_header_meta(vids.select("video_id", "bytes"))
    junk = spark.createDataFrame(
        [("junk", bytearray(b"\x00not video"))], "video_id string, bytes binary"
    )
    flags = {
        r["video_id"]: r
        for r in videokit.curation_flags(
            videokit.y4m_header_meta(junk).unionByName(meta)
        ).collect()
    }
    assert flags["junk"]["unparsed"] == 1 and flags["junk"]["keep"] == 0
    fired = {g: 0 for g in ("too_small", "too_few", "too_short")}
    for vid, r in flags.items():
        if vid == "junk":
            continue
        d = int(vid.split("-")[1])
        w, h, n, (num, den) = videokit.synth_params(d)
        assert r["too_small"] == (1 if min(w, h) < 32 else 0)
        assert r["too_few"] == (1 if n < 3 else 0)
        assert r["too_short"] == (1 if n * 1000 * den < 100 * num else 0)
        assert r["keep"] == (
            1 - max(r["too_small"], r["too_few"], r["too_short"])
        )
        for g in fired:
            fired[g] += r[g]
    n_rows = len(flags) - 1
    assert all(0 < v < n_rows for v in fired.values()), fired
    assert 0 < sum(
        r["keep"] for v, r in flags.items() if v != "junk"
    ) < n_rows


def test_keyframes_one_per_shot(vids):
    feats = videokit.frame_features(vids)
    kf = videokit.keyframes(feats, min_jump=100).collect()
    cuts = {
        (r["video_id"], r["frame_no"])
        for r in videokit.scene_cuts(feats, min_jump=100).collect()
        if r["cut"] == 1
    }
    got = {(r["video_id"], r["frame_no"]) for r in kf}
    vids_ids = {r["video_id"] for r in feats.select("video_id").distinct().collect()}
    # exactly: frame 0 of every video + every cut frame
    assert got == cuts | {(v, 0) for v in vids_ids}


def test_frames_to_ppm_bridges_into_image_pipeline(spark):
    fr = _random_clip(11, n=4)
    df = spark.createDataFrame(
        [("v", bytearray(videokit.encode_y4m(fr)))],
        "video_id string, bytes binary",
    )
    imgs = videokit.frames_to_ppm(videokit.frame_sample(df, every_n=2))
    rows = {r["image_id"]: r for r in imgs.collect()}
    assert set(rows) == {"v#f0", "v#f2"}
    for fid, r in rows.items():
        f = int(fid.split("#f")[1])
        exp = codecs._ycbcr_to_rgb(
            fr[f, :, :, 0].astype(np.float64),
            fr[f, :, :, 1].astype(np.float64),
            fr[f, :, :, 2].astype(np.float64),
        )
        np.testing.assert_array_equal(
            codecs.decode_ppm(bytes(r["bytes"])), exp
        )
    # and the unchanged image feature pass consumes the bridge output
    feats = multimodal.decode_features(imgs).collect()
    assert len(feats) == 2 and all(x["phash"] is not None for x in feats)


def test_keyframes_to_wds_export_roundtrip(spark, vids, tmp_path):
    """The full video → training-export chain: keyframe selection
    (metadata only) → pixel materialization for ONLY the keepers
    (semi join into frame_sample) → image-pipeline bridge → WDS shard
    plan + tar write + exact read-back."""
    from ccbot_spark import wds

    small = vids.limit(12).cache()
    feats = videokit.frame_features(small)
    keep = videokit.keyframes(feats, min_jump=100).select(
        "video_id", "frame_no"
    )
    frames = videokit.frame_sample(small, every_n=1).join(
        keep, ["video_id", "frame_no"], "left_semi"
    )
    imgs = videokit.frames_to_ppm(frames).withColumn(
        "caption", F.concat(F.lit("keyframe "), F.col("image_id"))
    )
    costed = imgs.withColumn(
        "plan_cost", wds.sample_cost(F.col("w"), F.col("h"), F.col("caption"))
    )
    assigned, cache = wds.plan_shards(costed, 64 * 1024, num_partitions=4)
    out = str(tmp_path / "wds")
    try:
        wds.write_shards(assigned, out).collect()
        back = {
            r["image_id"]: r for r in wds.read_shards(spark, out).collect()
        }
    finally:
        cache.unpersist()
        small.unpersist()
    want = {r["image_id"]: r for r in imgs.collect()}
    assert set(back) == set(want) and len(want) > 0
    for k, r in back.items():
        assert bytes(r["bytes"]) == bytes(want[k]["bytes"])
        assert r["caption"] == want[k]["caption"]


def test_multimodal_frame_sample_dispatches_y4m(spark):
    fr = _random_clip(13, n=5)
    df = spark.createDataFrame(
        [("v1", bytearray(videokit.encode_y4m(fr)), "y4m")],
        "image_id string, bytes binary, fmt string",
    )
    rows = multimodal.frame_sample(df, every_n=2).collect()
    assert sorted(r["frame_no"] for r in rows) == [0, 2, 4]


# ------------------------------------------------------------------
# Near-dup pairs
# ------------------------------------------------------------------


def test_near_dup_matches_python_reference(spark, sf_dir):
    # Spark df-capped Jaccard over decoded shot signatures == python
    # reference over the closed-form synthesis arithmetic
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 300
    )
    feats = videokit.frame_features(videokit.synth_videos_from_docs(docs))
    got = {
        (r.vid_a, r.vid_b): (r.shared, r.jaccard_milli)
        for r in videokit.near_dup_pairs(feats).collect()
    }

    sigs = {}
    for d in range(300):
        _w, _h, n, _fps = videokit.synth_params(d)
        s = set()
        for f in range(n):
            y, u, _v = videokit.synth_plane_means(d, f)
            s.add((y // 16) * 16 + (u // 16))
        sigs[f"doc-{d}"] = s
    from collections import Counter

    df_ = Counter(sig for s in sigs.values() for sig in s)
    capped = {v: {sig for sig in s if df_[sig] <= 24} for v, s in sigs.items()}
    want = {}
    vids_sorted = sorted(capped)
    for i, a in enumerate(vids_sorted):
        for b in vids_sorted[i + 1:]:
            sh = len(capped[a] & capped[b])
            if sh >= 2:
                jm = (sh * 1000) // (len(capped[a]) + len(capped[b]) - sh)
                if jm >= 200:
                    want[(a, b)] = (sh, jm)
    assert got == want


def test_near_dup_exact_twins_score_1000(spark, sf_dir):
    # doc and doc+150 are byte-identical clips: whenever the twin pair
    # survives the df-cap with >= 2 signatures it must score exactly
    # 1000 milli-Jaccard, and at least some twins must survive
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 300
    )
    feats = videokit.frame_features(videokit.synth_videos_from_docs(docs))
    pairs = {
        (r.vid_a, r.vid_b): r.jaccard_milli
        for r in videokit.near_dup_pairs(feats).collect()
    }
    twins = [
        pairs.get(tuple(sorted((f"doc-{d}", f"doc-{d + 150}"))))
        for d in range(150)
    ]
    present = [j for j in twins if j is not None]
    assert present and all(j == 1000 for j in present)


def test_dataset_card_metrics_consistent(spark, sf_dir):
    import __spark_entry__ as entry

    card = {
        r.metric: r.value
        for r in entry.queries()["mm_dataset_card"](spark, sf_dir).collect()
    }
    entry.clear_caches()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    assert card["n_docs"] == n
    assert card["n_images"] == min(450, n)
    assert card["n_audio_clips"] == min(400, n)
    assert card["n_videos"] == min(300, n)
    # the planted mod-150 duplicate structure: 450 images over 150
    # byte-distinct classes -> 300 dups
    assert card["n_dup_images"] == card["n_images"] - min(150, n)
    assert card["n_dup_docs"] == 0  # fixture texts are unique
    assert card["total_tokens"] > 0 and card["total_pixels"] > 0
    assert card["total_samples"] > 0 and card["total_frames"] > 0
