"""Audio (WAV/PCM) plumbing: codec round trip, JVM header parse vs
python decode ground truth, integer-exact features on arbitrary (not
just square) waves, decimation resample, curation gates, and the
plan-shape guarantee that the header gate never leaves the JVM."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from ccbot_spark.functions import audiokit
from ccbot_spark.plans import explainkit

# ------------------------------------------------------------------
# Pure-python codec
# ------------------------------------------------------------------


@pytest.mark.parametrize("ch", [1, 2])
@pytest.mark.parametrize("n", [1, 7, 256, 4351])
def test_wav_round_trip_exact(ch, n):
    rng = np.random.default_rng(n * 10 + ch)
    s = rng.integers(-32768, 32767, size=(n, ch), dtype=np.int16)
    blob = audiokit.encode_wav(s, 22050)
    out, rate = audiokit.decode_wav(blob)
    assert rate == 22050
    np.testing.assert_array_equal(out, s)
    # canonical layout: 44-byte header + n*ch*2 payload, nothing else
    assert len(blob) == 44 + n * ch * 2


def test_decode_rejects_non_wav():
    with pytest.raises(NotImplementedError):
        audiokit.decode_wav(b"ID3\x03" + b"\x00" * 100)  # mp3-ish
    with pytest.raises(NotImplementedError):
        audiokit.decode_wav(b"OggS" + b"\x00" * 100)


def test_synth_planted_duplicates():
    # every parameter is base-150 derived → docs 150 apart are
    # byte-identical WAVs (the aud_exact_dedup contract)
    for d in (3, 7, 149):
        a, ra = audiokit.synth_wave(d)
        b, rb = audiokit.synth_wave(d + 150)
        assert ra == rb and np.array_equal(a, b)
        assert audiokit.encode_wav(a, ra) == audiokit.encode_wav(b, rb)


def test_synth_matches_params():
    for d in (0, 1, 10, 37, 149, 150, 299, 399):
        rate, ch, n, amp, period = audiokit.synth_params(d)
        s, r = audiokit.synth_wave(d)
        assert r == rate and s.shape == (n, ch)
        if amp:
            assert int(np.abs(s).max()) == amp
            # flips exactly at multiples of the half-period
            flips = np.nonzero(np.diff(s[:, 0]))[0] + 1
            assert all(f % period == 0 for f in flips)
        else:
            assert not s.any()


# ------------------------------------------------------------------
# Spark: header parse == python decode ground truth
# ------------------------------------------------------------------


@pytest.fixture(scope="module")
def audio(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 120
    )
    return audiokit.synth_audio_from_docs(docs).cache()


def test_header_meta_matches_decode(audio):
    meta = {
        r["audio_id"]: r
        for r in audiokit.wav_header_meta(audio).collect()
    }
    for row in audio.collect():
        s, rate = audiokit.decode_wav(bytes(row["bytes"]))
        m = meta[row["audio_id"]]
        assert m["container"] == "wav"
        assert m["hdr_channels"] == s.shape[1]
        assert m["hdr_rate"] == rate
        assert m["hdr_bits"] == 16
        assert m["hdr_n_samples"] == s.shape[0]
        assert m["hdr_duration_ms"] == s.shape[0] * 1000 // rate
        assert m["nbytes"] == len(bytes(row["bytes"]))


def test_header_meta_non_wav_is_null(spark):
    rows = [("a", bytearray(b"ID3\x03" + b"\x00" * 60)),
            ("b", bytearray(b"OggS" + b"\x00" * 60)),
            ("c", bytearray(b"\x00" * 10))]  # shorter than a header
    df = spark.createDataFrame(rows, "audio_id string, bytes binary")
    out = {r["audio_id"]: r for r in audiokit.wav_header_meta(df).collect()}
    for k in ("a", "b", "c"):
        assert out[k]["container"] is None
        assert out[k]["hdr_rate"] is None
        assert out[k]["hdr_n_samples"] is None
        assert out[k]["nbytes"] == len(rows[ord(k) - ord("a")][1])


def test_header_meta_stays_jvm(audio):
    # the sniff/parse gate must not add a Python stage beyond the
    # fixture generator itself: project-over-mapInPandas, no
    # BatchEvalPython, no extra ArrowEvalPython
    plan = explainkit.formatted_plan(audiokit.wav_header_meta(audio))
    assert "BatchEvalPython" not in plan, plan
    assert "ArrowEvalPython" not in plan, plan


# ------------------------------------------------------------------
# Features: integer-exact on arbitrary waves (numpy reference)
# ------------------------------------------------------------------


def test_features_match_numpy_reference(spark):
    rng = np.random.default_rng(7)
    rows = []
    expect = {}
    for i in range(25):
        ch = 1 + i % 2
        n = int(rng.integers(1, 3000))
        s = rng.integers(-32768, 32767, size=(n, ch), dtype=np.int16)
        rate = [8000, 16000, 44100][i % 3]
        rows.append((f"w{i}", bytearray(audiokit.encode_wav(s, rate))))
        wide = s.astype(np.int64)
        expect[f"w{i}"] = (
            rate,
            ch,
            n,
            int(np.abs(wide).max()),
            math.isqrt(int((wide * wide).sum()) // (n * ch)),
            int(np.count_nonzero(np.diff(s[:, 0]))),
        )
    df = spark.createDataFrame(rows, "audio_id string, bytes binary")
    got = {
        r["audio_id"]: (
            r["rate"], r["channels"], r["n_samples"],
            r["peak"], r["rms"], r["zero_crossings"],
        )
        for r in audiokit.audio_features(df).collect()
    }
    assert got == expect


# ------------------------------------------------------------------
# Resample: decimation is exactly s[::k] at rate//k
# ------------------------------------------------------------------


@pytest.mark.parametrize("k", [1, 2, 3])
def test_resample_decimate_exact(spark, k):
    rng = np.random.default_rng(k)
    s = rng.integers(-32768, 32767, size=(1001, 2), dtype=np.int16)
    df = spark.createDataFrame(
        [("x", bytearray(audiokit.encode_wav(s, 44100)))],
        "audio_id string, bytes binary",
    )
    row = audiokit.resample_decimate(df, k=k).collect()[0]
    out, rate = audiokit.decode_wav(bytes(row["bytes"]))
    assert rate == 44100 // k == row["rate"]
    np.testing.assert_array_equal(out, s[::k])
    assert row["n_samples"] == out.shape[0]


def test_resample_rejects_bad_k(spark):
    with pytest.raises(ValueError):
        audiokit.resample_decimate(None, k=0)


# ------------------------------------------------------------------
# Robust fingerprint (Haitsma–Kalker shape)
# ------------------------------------------------------------------


def _even_noise(seed, n=4000, ch=1):
    rng = np.random.default_rng(seed)
    # even-valued samples: exact halving keeps energy ratios exact
    return (rng.integers(-15000, 15000, size=(n, ch), dtype=np.int16) * 2).astype(
        np.int16
    )


def test_fingerprint_amplitude_scaling_invariant():
    s = _even_noise(1)
    assert audiokit.fingerprint_bits(s) == audiokit.fingerprint_bits(
        (s // 2).astype(np.int16)
    )
    assert audiokit.fingerprint_bits(s) != 0


def test_fingerprint_near_vs_unrelated():
    s = _even_noise(2)
    fp = audiokit.fingerprint_bits(s)
    # small perturbation: ±1 on 2% of samples
    rng = np.random.default_rng(3)
    pert = s.copy()
    idx = rng.choice(s.shape[0], size=s.shape[0] // 50, replace=False)
    pert[idx, 0] += rng.choice([-2, 2], size=idx.size).astype(np.int16)
    near = bin(fp ^ audiokit.fingerprint_bits(pert)).count("1")
    far = bin(fp ^ audiokit.fingerprint_bits(_even_noise(4))).count("1")
    assert near <= 8 < far, (near, far)


def test_fingerprint_degenerate_inputs():
    assert audiokit.fingerprint_bits(np.zeros((5, 1), np.int16)) == 0
    assert audiokit.fingerprint_bits(np.zeros((5000, 2), np.int16)) == 0


def test_fingerprint_spark_matches_python_and_near_pairs(spark):
    rows, expect = [], {}
    base = _even_noise(7)
    variants = {
        "orig": base,
        "half": (base // 2).astype(np.int16),  # planted near-dup (ham 0)
        "other": _even_noise(8),  # unrelated
    }
    for k, s in variants.items():
        rows.append((k, bytearray(audiokit.encode_wav(s, 16000))))
        expect[k] = audiokit.fingerprint_bits(s)
    df = spark.createDataFrame(rows, "audio_id string, bytes binary")
    fps = audiokit.audio_fingerprints(df)
    got = {r["audio_id"]: r["fp"] for r in fps.collect()}
    assert got == expect
    pairs = {
        (r["aud_a"], r["aud_b"]): r["hamming"]
        for r in audiokit.fingerprint_near_pairs(fps, max_ham=6).collect()
    }
    assert ("half", "orig") in pairs and pairs[("half", "orig")] == 0
    assert not any("other" in p for p in pairs)


# ------------------------------------------------------------------
# Curation gates
# ------------------------------------------------------------------


def test_curation_gates_fire(audio):
    flags = {
        r["audio_id"]: r
        for r in audiokit.curation_flags(
            audiokit.audio_features(audio), max_channels=1
        ).collect()
    }
    fired = {g: 0 for g in ("silent", "too_short", "low_rate", "too_many_ch")}
    for aid, r in flags.items():
        d = int(aid.split("-")[1])
        rate, ch, n, amp, _p = audiokit.synth_params(d)
        assert r["silent"] == (1 if amp == 0 else 0)
        assert r["too_short"] == (1 if n * 1000 // rate < 20 else 0)
        assert r["low_rate"] == (1 if rate < 16000 else 0)
        assert r["too_many_ch"] == (1 if ch > 1 else 0)
        assert r["keep"] == (
            1 - max(r["silent"], r["too_short"], r["low_rate"],
                    r["too_many_ch"])
        )
        for g in fired:
            fired[g] += r[g]
    # the fixture must exercise every gate both ways
    n_rows = len(flags)
    assert all(0 < v < n_rows for v in fired.values()), fired
    assert 0 < sum(r["keep"] for r in flags.values()) < n_rows


# ------------------------------------------------------------------
# Near-dup blocking
# ------------------------------------------------------------------


def test_near_dup_blocks_rate_and_gain_tolerant(spark):
    # the same square wave at three rates and a small gain change must
    # land in ONE block; a different-period wave must not
    import numpy as np

    from ccbot_spark.functions import audiokit

    def clip(aid, amp, period, rate, n=512):
        idx = np.arange(n)
        s = np.where((idx // period) % 2 == 0, amp, -amp).astype(np.int16)
        return (aid, audiokit.encode_wav(s.reshape(-1, 1), rate))

    rows = [
        clip("a-8k", 9000, 16, 8000),
        clip("a-16k", 9000, 16, 16000),
        clip("a-44k", 9100, 16, 44100),  # +100 gain: same rms>>8 bucket
        clip("b-other", 9000, 24, 8000),
    ]
    df = spark.createDataFrame(rows, "audio_id string, bytes binary")
    out = audiokit.near_dup_blocks(audiokit.audio_features(df)).collect()
    ids = {r.audio_id for r in out}
    assert ids == {"a-8k", "a-16k", "a-44k"}
    assert len({(r.channels, r.p_est, r.amp_bucket) for r in out}) == 1
    keepers = [r.audio_id for r in out if r.is_keeper == 1]
    assert keepers == ["a-16k"]  # min id in the block


def test_near_dup_blocks_silence_excluded(spark):
    import numpy as np

    from ccbot_spark.functions import audiokit

    z = np.zeros((256, 1), np.int16)
    rows = [
        ("s1", audiokit.encode_wav(z, 8000)),
        ("s2", audiokit.encode_wav(z, 8000)),
    ]
    df = spark.createDataFrame(rows, "audio_id string, bytes binary")
    assert audiokit.near_dup_blocks(audiokit.audio_features(df)).count() == 0
