from __future__ import annotations

import numpy as np

from ccbot_spark import codecs, phash, synthweb


def test_deterministic():
    cfg = synthweb.WebConfig()
    px = synthweb.image_pixels(cfg, "http://h0.test/img/aa.png")
    assert phash.phash64(px) == phash.phash64(px.copy())


def test_int64_range():
    cfg = synthweb.WebConfig()
    for i in range(16):
        px = synthweb.image_pixels(cfg, f"http://h1.test/img/{i:02x}.ppm")
        h = phash.phash64(px)
        assert -(1 << 63) <= h < (1 << 63)


def test_invariant_under_lossless_reencode():
    cfg = synthweb.WebConfig()
    px = synthweb.image_pixels(cfg, "http://h2.test/img/bb.png")
    via_png = codecs.decode(codecs.encode(px, "png"), "png")
    via_ppm = codecs.decode(codecs.encode(px, "ppm"), "ppm")
    assert phash.phash64(via_png) == phash.phash64(px)
    assert phash.phash64(via_ppm) == phash.phash64(px)


def test_quantized_closer_than_unrelated():
    """A qpng re-encode of an image is phash-closer to it than an
    unrelated image is (median-threshold bits near zero DCT coeffs can
    flip under quantization, so exact invariance is not expected —
    engine dedup only relies on exact equality of identically-decoded
    pixels, which test_invariant_under_lossless_reencode covers)."""
    cfg = synthweb.WebConfig()
    closer = 0
    for i in range(8):
        px = synthweb.image_pixels(cfg, f"http://h3.test/img/{i:02x}.qpng")
        other = synthweb.image_pixels(cfg, f"http://h4.test/img/{i:02x}.png")
        dq = codecs.decode(codecs.encode(px, "qpng"), "qpng")
        d_self = phash.hamming64(phash.phash64(px), phash.phash64(dq))
        d_other = phash.hamming64(phash.phash64(px), phash.phash64(other))
        if d_self < d_other:
            closer += 1
    assert closer >= 6


def test_distinct_images_differ():
    cfg = synthweb.WebConfig()
    a = phash.phash64(synthweb.image_pixels(cfg, "http://h0.test/img/x1.png"))
    b = phash.phash64(synthweb.image_pixels(cfg, "http://h0.test/img/x2.png"))
    assert a != b


def test_resize_area_small_and_large():
    tiny = np.arange(16 * 16, dtype=np.uint8).reshape(16, 16)
    out = phash.resize_area(tiny.astype(np.float64), 32)
    assert out.shape == (32, 32)
    big = np.arange(128 * 100, dtype=np.float64).reshape(128, 100)
    out2 = phash.resize_area(big, 32)
    assert out2.shape == (32, 32)
    # area resize preserves the global mean for exact-divisor shapes
    sq = np.arange(64 * 64, dtype=np.float64).reshape(64, 64)
    assert abs(phash.resize_area(sq, 32).mean() - sq.mean()) < 1e-9


# ------------------------------------------------- dHash / aHash family

def test_dhash_ahash_invariance_under_reencode():
    # the lossy qpng round trip perturbs pixels slightly; every hash
    # family member must stay within a small Hamming radius of the
    # original, while a different image stays far away
    from ccbot_spark import phash as P

    cfg = synthweb.WebConfig()
    for fn in (P.phash64, P.dhash64, P.ahash64):
        closer = 0
        for i in range(8):
            base = synthweb.image_pixels(cfg, f"http://h7.test/img/{i:02x}.png")
            other = synthweb.image_pixels(cfg, f"http://h8.test/img/{i:02x}.png")
            re_enc = codecs.decode(codecs.encode(base, "qpng"), "qpng")
            if P.hamming64(fn(base), fn(re_enc)) < P.hamming64(
                fn(base), fn(other)
            ):
                closer += 1
        assert closer >= 7, fn.__name__
        # lossless re-encodes are exactly invariant for every family
        px = synthweb.image_pixels(cfg, "http://h9.test/img/cc.png")
        via = codecs.decode(codecs.encode(px, "png"), "png")
        assert fn(px) == fn(via), fn.__name__


def test_hash_features_spark_matches_python(spark):
    from ccbot_spark import codecs
    from ccbot_spark import phash as P
    from ccbot_spark.functions import multimodal

    import numpy as np

    rows = []
    want = {}
    for i in range(12):
        rs = np.random.RandomState(i)
        px = rs.randint(0, 256, size=(20 + i, 30 + i, 3), dtype=np.uint8)
        fmt = ["ppm", "png", "bmp"][i % 3]
        rows.append((f"im-{i}", codecs.encode(px, fmt), fmt))
        want[f"im-{i}"] = (P.phash64(px), P.dhash64(px), P.ahash64(px))
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    got = {
        r.image_id: (r.phash, r.dhash, r.ahash)
        for r in multimodal.hash_features(df).collect()
    }
    assert got == want
