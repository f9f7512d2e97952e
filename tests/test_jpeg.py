"""Baseline JPEG codec (ITU-T T.81) — pure numpy + stdlib.

Gates (VERDICT.md round-4 item 1):
  * encode→decode PSNR ≥ 40 dB vs the source array — including on
    full-entropy noise pixels, the worst case for DCT quantization;
  * phash stability under JPEG re-encode on well-conditioned images
    (noise spectra; pure-sine fixtures are a documented pHash
    degeneracy — their low-freq block is mostly exactly 0, so the
    median threshold is noise for ANY lossy codec, qpng included);
  * the independent JVM SOF marker-walk (`multimodal.jpeg_sof_dims`)
    reads back exactly the dims this encoder wrote;
  * `u_img_decode` handles jpeg rows in the Spark decode stage.
"""

from __future__ import annotations

import numpy as np
import pytest

from ccbot_spark import codecs, phash, synthweb


def _noise(h: int, w: int, seed: int = 0) -> np.ndarray:
    return np.random.RandomState(seed).randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


# ---------------------------------------------------------------- pure codec


@pytest.mark.parametrize(
    "h,w", [(8, 8), (16, 16), (37, 53), (97, 113), (128, 128), (1, 1), (9, 10)]
)
def test_jpeg_roundtrip_psnr_noise(h, w):
    img = _noise(h, w, seed=h * 131 + w)
    dec = codecs.decode_jpeg(codecs.encode_jpeg(img))
    assert dec.shape == img.shape
    assert codecs.psnr(img, dec) >= 40.0


def test_jpeg_roundtrip_psnr_smooth():
    # procedural sine/gradient pixels (the synthweb crawl fixture)
    cfg = synthweb.WebConfig(seed=7)
    for i in range(8):
        px = synthweb.image_pixels(cfg, f"http://h0.test/img/x{i}.ppm")
        dec = codecs.decode_jpeg(codecs.encode_jpeg(px))
        assert codecs.psnr(px, dec) >= 40.0


def test_jpeg_dispatch():
    img = _noise(33, 44, seed=5)
    for fmt in ("jpeg", "jpg"):
        data = codecs.encode(img, fmt)
        assert data[:3] == b"\xff\xd8\xff"
        assert codecs.psnr(img, codecs.decode(data, fmt)) >= 40.0


def test_jpeg_restart_markers():
    img = _noise(64, 64, seed=9)
    data = codecs.encode_jpeg(img, restart_interval=3)
    assert b"\xff\xdd" in data  # DRI present
    assert codecs.psnr(img, codecs.decode_jpeg(data)) >= 40.0
    # restart path decodes to the same pixels as the no-restart path
    plain = codecs.decode_jpeg(codecs.encode_jpeg(img))
    assert np.array_equal(codecs.decode_jpeg(data), plain)


def test_jpeg_grayscale():
    g = np.random.RandomState(3).randint(0, 256, size=(40, 56), dtype=np.uint8)
    dec = codecs.decode_jpeg(codecs.encode_jpeg(g))
    assert dec.shape == (40, 56, 3)
    assert np.array_equal(dec[:, :, 0], dec[:, :, 1])
    assert codecs.psnr(np.repeat(g[:, :, None], 3, axis=2), dec) >= 40.0


def test_jpeg_quality_ladder():
    # lower quality → smaller file; all qualities decode without error
    img = _noise(48, 48, seed=11)
    sizes = [len(codecs.encode_jpeg(img, quality=q)) for q in (25, 50, 75, 98)]
    assert sizes == sorted(sizes)
    assert codecs.psnr(img, codecs.decode_jpeg(codecs.encode_jpeg(img, quality=25))) > 10


def test_jpeg_rejects_bad_input():
    with pytest.raises(ValueError):
        codecs.decode_jpeg(b"nope")
    # progressive SOF2 is explicitly unsupported, not silently wrong
    data = bytearray(codecs.encode_jpeg(_noise(8, 8, seed=1)))
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="not baseline"):
        codecs.decode_jpeg(bytes(data))


def test_jpeg_phash_stable_on_noise():
    # noise spectra condition the pHash median well: re-encode must not
    # move the hash more than a few bits (near-dup radius is 6)
    for i in range(10):
        img = _noise(60 + i, 50 + i, seed=100 + i)
        dec = codecs.decode_jpeg(codecs.encode_jpeg(img))
        assert _hamming(phash.phash64(img), phash.phash64(dec)) <= 4


def test_jpeg_byte_determinism():
    img = _noise(31, 29, seed=42)
    assert codecs.encode_jpeg(img) == codecs.encode_jpeg(img)


def test_jpeg_edge_padding_is_replicated():
    # non-multiple-of-8 dims: padding must not bleed ringing into the
    # kept region any worse than the interior (edge replication)
    img = np.full((12, 13, 3), 200, dtype=np.uint8)
    dec = codecs.decode_jpeg(codecs.encode_jpeg(img))
    assert codecs.psnr(img, dec) >= 40.0


# ---------------------------------------------------------------- Spark side


def test_jpeg_sof_dims_reads_encoder_output(spark):
    # the JVM-side bounded marker walk is an INDEPENDENT parser of this
    # encoder's output: dims must match exactly for every size
    from ccbot_spark.functions import multimodal

    rows = []
    for i, (h, w) in enumerate([(16, 16), (37, 53), (97, 113), (24, 80)]):
        rows.append((f"im-{i}", bytearray(codecs.encode_jpeg(_noise(h, w, seed=i))), w, h))
    df = spark.createDataFrame(rows, "image_id string, bytes binary, w int, h int")
    got = {
        r["image_id"]: (r["jpg_w"], r["jpg_h"])
        for r in multimodal.jpeg_sof_dims(df).collect()
    }
    for i, (h, w) in enumerate([(16, 16), (37, 53), (97, 113), (24, 80)]):
        assert got[f"im-{i}"] == (w, h)


def test_header_meta_sniffs_jpeg(spark):
    from ccbot_spark.functions import multimodal

    df = spark.createDataFrame(
        [("a", bytearray(codecs.encode_jpeg(_noise(16, 16, seed=0))))],
        "image_id string, bytes binary",
    )
    row = multimodal.header_meta(df).collect()[0]
    assert row["container"] == "jpeg"
    assert row["hdr_w"] is None  # dims live in SOF, not at fixed offsets


def test_crawl_loop_with_jpeg_slice(spark, tmp_path):
    # u_img_decode in the crawl loop: a web whose image cycle includes
    # jpeg — engine and oracle decode the SAME wire bytes through the
    # numpy T.81 decoder, so stored rows (pixels → phash) and the trace
    # must stay byte-exact; and the fixture must actually contain jpegs
    from ccbot_spark import oracle
    from ccbot_spark.engine import CrawlEngine

    cfg = synthweb.WebConfig(
        n_hosts=3, pages_per_host=30, img_fmts=("ppm", "png", "qpng", "jpeg")
    )
    seeds = synthweb.seed_urls(cfg, 9)
    want = oracle.crawl(cfg, seeds, cycles=2)
    eng = CrawlEngine(
        spark, cfg, str(tmp_path / "eng"), n_buckets=4, record_trace=True
    )
    eng.crawl(seeds, cycles=2)
    got_trace = [
        (r.seq, r.cycle, r.url_norm, r.host, r.sched_slot, r.action)
        for r in eng.trace.read().orderBy("seq").collect()
    ]
    assert got_trace == want.trace
    got = {
        r.image_id: (r.w, r.h, r.fmt, r.caption, r.phash, bytes(r.bytes))
        for r in eng.images.read().collect()
    }
    exp = {
        r["image_id"]: (r["w"], r["h"], r["fmt"], r["caption"], r["phash"], r["bytes"])
        for r in want.images
    }
    assert got == exp
    fmts = {v[2] for v in got.values()}
    assert "jpeg" in fmts, fmts  # the slice is real, not vacuous
    # stored jpeg bytes decode above the lossy-format PSNR gate vs the
    # procedural source pixels (BASELINE.json per-row invariant)
    for iid, (w, h, fmt, _cap, _ph, blob) in got.items():
        if fmt != "jpeg":
            continue
        src = synthweb.image_pixels(cfg, iid)  # image_id IS the img url
        assert codecs.psnr(src, codecs.decode_jpeg(blob)) >= 40.0


def test_decode_features_handles_jpeg_cycle(spark):
    # the 5-format cycle (ppm/png/qpng/bmp/jpeg) flows through the real
    # Arrow decode stage; jpeg rows decode for real (dims exact, phash
    # produced) instead of hitting the NotImplementedError boundary
    from ccbot_spark.functions import multimodal

    docs = spark.range(0, 25).withColumnRenamed("id", "doc_id")
    imgs = multimodal.synth_images_from_docs(docs, fmts=multimodal.ALL_FMTS)
    feats = {r["image_id"]: r for r in multimodal.decode_features(imgs).collect()}
    assert len(feats) == 25
    for d in range(25):
        r = feats[f"doc-{d}"]
        assert r["fmt"] == multimodal.ALL_FMTS[d % 5]
        assert (r["w"], r["h"]) == (16 + d % 150 * 7 % 97, 16 + d % 150 * 11 % 97)
