"""Tests for the training-data pipeline layer (functions/): dedup,
similarity search, text analysis, multimodal plumbing. Each distributed
operator is checked against an independent pure-Python/numpy
recomputation on collected (small) data — the same spec-as-code
strategy the crawl engine uses with its oracle crawler.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ccbot_spark.functions import dedup, multimodal, similarity, textkit

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


# ------------------------------------------------------------ textkit

def test_quality_counts_match_python(spark, docs):
    got = {r.doc_id: r for r in textkit.quality_columns(docs).collect()}
    for row in docs.limit(50).collect():
        toks = row.text.split(" ")
        low = row.text.lower().split(" ")
        g = got[row.doc_id]
        assert g.n_chars_q == len(row.text)
        assert g.n_tokens == len(toks)
        assert g.n_stopwords == sum(t in textkit.STOPWORDS for t in low)
        assert g.n_distinct_tokens == len(set(low))


def test_fingerprint_matches_python(spark, docs):
    got = {
        r.doc_id: r.fp
        for r in docs.select(
            "doc_id", textkit.fingerprint_udf(F.col("text")).alias("fp")
        ).collect()
    }
    for row in docs.limit(30).collect():
        assert got[row.doc_id] == textkit.fingerprint_py(row.text)


# ------------------------------------------------------------ dedup

def _mk_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_exact_dedup_counts(spark):
    df = _mk_docs(spark, ["a b c", "a b c", "x y z", "a b c", "q"])
    rows = {r.keeper_id: r.copies for r in dedup.exact_dedup(df).collect()}
    assert rows == {0: 3, 2: 1, 4: 1}


def _py_jaccard(a: str, b: str, n=3) -> float:
    def sh(t):
        toks = t.split(" ")
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    A, B = sh(a), sh(b)
    return len(A & B) / len(A | B) if A | B else 0.0


def test_ngram_jaccard_matches_python(spark, docs):
    got = {
        (r.doc_a, r.doc_b): (r.inter, r.union_sz)
        for r in dedup.ngram_jaccard_pairs(docs, t10=1).collect()
    }
    texts = {r.doc_id: r.text for r in docs.collect()}
    # independent recomputation of the full pair set at threshold 0.1
    want = {}
    ids = sorted(texts)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            j = _py_jaccard(texts[a], texts[b])
            if j >= 0.1 and j > 0:
                toks_a = texts[a].split(" ")
                toks_b = texts[b].split(" ")
                A = {" ".join(toks_a[k : k + 3]) for k in range(len(toks_a) - 2)}
                B = {" ".join(toks_b[k : k + 3]) for k in range(len(toks_b) - 2)}
                if len(A & B) * 10 >= len(A | B):
                    want[(a, b)] = (len(A & B), len(A | B))
    assert got == want


def test_minhash_estimates_jaccard(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    dup = base  # Jaccard 1.0 → every band matches, ALWAYS caught
    near = base + " extra"  # Jaccard ~0.92 → usually caught (8×8 bands)
    far = "completely different words in this one with zero overlap at all"
    df = _mk_docs(spark, [base, dup, near, far])
    cands = {
        (r.doc_a, r.doc_b): r.est10
        for r in dedup.minhash_lsh_candidates(df).collect()
    }
    assert cands.get((0, 1)) == 10  # exact dup: estimated Jaccard = 1.0
    assert (0, 3) not in cands  # disjoint docs share no band
    if (0, 2) in cands:  # banding is probabilistic below J≈0.95
        assert abs(cands[(0, 2)] / 10 - _py_jaccard(base, near)) < 0.3


def test_minhash_signature_deterministic():
    sig1 = dedup.minhash_signature_py(["a b c", "b c d"])
    sig2 = dedup.minhash_signature_py(["b c d", "a b c"])  # order-free
    assert sig1 == sig2
    assert len(sig1) == dedup.MH_K


def test_simhash_properties(spark):
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    b = a.replace("kappa", "lambda")  # one token differs
    c = "totally unrelated content about spark shuffles and joins"
    for t in (a, b, c):  # vectorized impl must equal the reference
        assert dedup.simhash64_np(t.split(" ")) == dedup.simhash64_py(t.split(" "))
    ha, hb, hc = (dedup.simhash64_py(t.split(" ")) for t in (a, b, c))
    ham = lambda x, y: bin((x ^ y) & ((1 << 64) - 1)).count("1")  # noqa: E731
    assert ham(ha, hb) < ham(ha, hc)
    df = _mk_docs(spark, [a, a, c])
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in
             dedup.simhash_near_pairs(df, max_ham=3).collect()}
    assert pairs.get((0, 1)) == 0  # identical docs → hamming 0


def test_embedding_near_pairs_match_numpy(spark, embs):
    rows = embs.collect()
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in rows}
    ids = sorted(vecs)
    want = set()
    for i, a in enumerate(ids):
        va = vecs[a]
        for b in ids[i + 1 :]:
            vb = vecs[b]
            cos = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
            if cos >= 0.35 - 1e-12:
                want.add((a, b))
    got = {
        (r.vec_a, r.vec_b)
        for r in dedup.embedding_near_pairs(embs, t4=3500).collect()
    }
    # numpy pairwise ops reorder fp sums; allow epsilon disagreement
    only_got, only_want = got - want, want - got
    assert not only_got and not only_want, (only_got, only_want)


def test_contamination_hits_matches_python(spark, docs):
    """Decontamination: per-doc shared-gram counts equal a pure-python
    set-intersection reference; eval docs never appear in the output;
    the eval gram set arrives by broadcast (no corpus-side shuffle)."""
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    ev = docs.filter(F.col("doc_id") % 50 == 0)
    res = dedup.contamination_hits(corpus, ev, n=3)
    from ccbot_spark.plans import explainkit

    assert "BroadcastHashJoin" in explainkit.formatted_plan(res)
    got = {r.doc_id: r.shared_grams for r in res.collect()}
    assert got and all(i % 50 != 0 for i in got)

    def grams(text):
        toks = text.split(" ")
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    rows = docs.select("doc_id", "text").collect()
    ev_grams = set()
    for r in rows:
        if r.doc_id % 50 == 0:
            ev_grams |= grams(r.text)
    want = {}
    for r in rows:
        if r.doc_id % 50 != 0:
            k = len(grams(r.text) & ev_grams)
            if k:
                want[r.doc_id] = k
    assert got == want


# ------------------------------------------------------------ similarity

def test_ann_bruteforce_matches_numpy(spark, embs):
    rows = embs.collect()
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in rows}
    got = {}
    for r in similarity.ann_bruteforce_topk(embs, n_queries=5, k=3).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.neighbor_id))
    for qid in range(5):
        vq = vecs[qid]
        scored = sorted(
            (
                (-float(vq @ v / (np.linalg.norm(vq) * np.linalg.norm(v))), nid)
                for nid, v in vecs.items()
                if nid != qid
            )
        )[:3]
        want = [(i + 1, nid) for i, (_, nid) in enumerate(scored)]
        assert sorted(got[qid]) == want, qid


def test_ann_lsh_structure(spark, embs):
    buckets = {
        r.vec_id: r.bucket for r in similarity.lsh_buckets(embs).collect()
    }
    res = similarity.ann_lsh_topk(embs, n_queries=5, k=3).collect()
    for r in res:
        assert buckets[r.neighbor_id] == buckets[r.query_id]
        assert 1 <= r.rank <= 3
    # deterministic across runs
    res2 = similarity.ann_lsh_topk(embs, n_queries=5, k=3).collect()
    assert sorted(map(tuple, res)) == sorted(map(tuple, res2))


# ------------------------------------------------------------ multimodal

@pytest.fixture(scope="module")
def images(spark, docs):
    return multimodal.synth_images_from_docs(
        docs.filter(F.col("doc_id") < 160)
    ).cache()


def test_synth_decode_roundtrip(spark, images):
    feats = {r.image_id: r for r in multimodal.decode_features(images).collect()}
    meta = {r.image_id: r for r in images.select("image_id", "w", "h", "fmt").collect()}
    assert set(feats) == set(meta)
    for k, m in meta.items():
        assert (feats[k].w, feats[k].h, feats[k].fmt) == (m.w, m.h, m.fmt)


def test_resize_shape(spark, images):
    out = multimodal.resize_nearest(images.limit(8), 32, 24).collect()
    from ccbot_spark import codecs

    for r in out:
        px = codecs.decode(bytes(r.bytes), "ppm")
        assert px.shape == (24, 32, 3)


def test_phash_near_finds_duplicate_content(spark, images):
    # doc_id d and d+150 share pixel content (synth seeds by d % 150)
    pairs = multimodal.phash_near_pairs(
        multimodal.decode_features(images), max_ham=6
    ).collect()
    got = {frozenset((r.img_a, r.img_b)) for r in pairs}
    want = {frozenset((f"doc-{d}", f"doc-{d + 150}")) for d in range(10)}
    assert want <= got


def test_header_meta_reads_back_encoded_dims(spark, images):
    # the JVM binary parse (no decode, no Python) must agree with the
    # metadata the encoder was given, for all three container formats
    rows = multimodal.header_meta(images).collect()
    meta = {
        r.image_id: r for r in images.select("image_id", "w", "h", "fmt").collect()
    }
    assert len(rows) == len(meta)
    for r in rows:
        m = meta[r.image_id]
        want_container = "ppm" if m.fmt == "ppm" else "png"  # qpng = PNG container
        assert (r.container, r.hdr_w, r.hdr_h) == (want_container, m.w, m.h)
        assert r.nbytes > 0
    raw = {r.image_id: len(bytes(r.bytes)) for r in images.collect()}
    assert all(r.nbytes == raw[r.image_id] for r in rows)


def test_header_meta_unknown_magic_and_jvm_only_plan(spark, tmp_path):
    # unknown blobs parse to NULL, never to garbage; and the whole
    # operator stays JVM-side (binary blobs never cross into Python)
    df = spark.createDataFrame(
        [("a", b"\x00\x11\x22 not a supported container"),
         ("b", b""), ("c", b"P6 garbage")],
        "image_id string, bytes binary",
    )
    out = {r.image_id: r for r in multimodal.header_meta(df).collect()}
    for k in ("a", "b", "c"):
        assert out[k].container is None
        assert out[k].hdr_w is None and out[k].hdr_h is None
    from ccbot_spark.plans import explainkit

    p = str(tmp_path / "imgs")
    df.write.parquet(p)
    plan = explainkit.formatted_plan(multimodal.header_meta(spark.read.parquet(p)))
    for pynode in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
                   "FlatMapGroupsInPandas"):
        assert pynode not in plan, plan


def test_header_meta_bmp_gif_jpeg_containers(spark):
    # BMP: real codec bytes — fixed-offset little-endian i32 dims.
    # GIF: spec-built header (no LZW codec in the closed world) —
    # little-endian u16 logical-screen dims. JPEG: container sniffs,
    # dims stay NULL at the JVM layer (variable-position SOF).
    import struct as _s

    from ccbot_spark import codecs

    img = np.arange(41 * 23 * 3, dtype=np.uint8).reshape(23, 41, 3) % 256
    gif = b"GIF89a" + _s.pack("<HH", 640, 481) + b"\xf7\x00\x00" + b"\x00" * 8
    jpeg = (
        b"\xff\xd8"                                   # SOI
        + b"\xff\xe0" + _s.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        + b"\xff\xdb" + _s.pack(">H", 67) + b"\x00" * 65   # DQT
        + b"\xff\xc0" + _s.pack(">H", 17)                  # SOF0
        + b"\x08" + _s.pack(">HH", 77, 99) + b"\x03" + b"\x00" * 9
        + b"\xff\xd9"                                  # EOI
    )
    df = spark.createDataFrame(
        [("bmp", codecs.encode_bmp(img)), ("gif", gif), ("jpg", jpeg)],
        "image_id string, bytes binary",
    )
    out = {r.image_id: r for r in multimodal.header_meta(df).collect()}
    assert (out["bmp"].container, out["bmp"].hdr_w, out["bmp"].hdr_h) == (
        "bmp", 41, 23)
    assert (out["gif"].container, out["gif"].hdr_w, out["gif"].hdr_h) == (
        "gif", 640, 481)
    assert out["jpg"].container == "jpeg"
    assert out["jpg"].hdr_w is None and out["jpg"].hdr_h is None
    # top-down BMP (negative i32 height) reads NULL, never a huge value
    td = bytearray(codecs.encode_bmp(img))
    _s.pack_into("<i", td, 22, -23)
    df2 = spark.createDataFrame(
        [("td", bytes(td))], "image_id string, bytes binary"
    )
    r2 = multimodal.header_meta(df2).collect()[0]
    assert r2.container == "bmp" and r2.hdr_w == 41 and r2.hdr_h is None

    # the JPEG slow path: bounded marker walk recovers the SOF dims;
    # non-JPEG and SOF-less rows answer NULL, never wrong
    dims = {
        r.image_id: (r.jpg_w, r.jpg_h)
        for r in multimodal.jpeg_sof_dims(df).collect()
    }
    assert dims == {"bmp": (None, None), "gif": (None, None),
                    "jpg": (99, 77)}
    # truncated head (SOF beyond the pruned window) → NULL
    r3 = multimodal.jpeg_sof_dims(df, head=40).collect()
    assert {t.image_id: (t.jpg_w, t.jpg_h) for t in r3}["jpg"] == (None, None)


def test_synth_four_cycle_bmp_roundtrip(spark, docs):
    # the 4-format cycle adds bmp as a REAL (lossless) container; the
    # decode path and the header parse both read it back exactly
    imgs = multimodal.synth_images_from_docs(
        docs.filter(F.col("doc_id") < 24), fmts=multimodal.REAL_FMTS
    )
    feats = {r.image_id: r for r in multimodal.decode_features(imgs).collect()}
    hdrs = {r.image_id: r for r in multimodal.header_meta(imgs).collect()}
    meta = {r.image_id: r for r in imgs.select("image_id", "w", "h", "fmt").collect()}
    assert len(meta) == 24 and any(m.fmt == "bmp" for m in meta.values())
    for k, m in meta.items():
        assert (feats[k].w, feats[k].h, feats[k].fmt) == (m.w, m.h, m.fmt)
        want_container = {"qpng": "png"}.get(m.fmt, m.fmt)
        assert (hdrs[k].container, hdrs[k].hdr_w, hdrs[k].hdr_h) == (
            want_container, m.w, m.h)


def test_letterbox_plan_matches_python_twin_on_grid(spark):
    # the JVM integer geometry (bucket, target, scaled dims, pads) must
    # equal the python twin on a dims grid covering every bucket, the
    # degenerate 1-pixel sides, and both fit directions
    dims = [(w, h) for w in (1, 7, 16, 33, 64, 97, 200)
            for h in (1, 9, 16, 40, 64, 101, 333)]
    df = spark.createDataFrame(dims, "w int, h int")
    rows = multimodal.letterbox_plan(df).collect()
    assert len(rows) == len(dims)
    for r in rows:
        want = multimodal.letterbox_plan_py(r.w, r.h)
        got = (r.bucket, r.out_w, r.out_h, r.scaled_w, r.scaled_h,
               r.pad_x, r.pad_y)
        assert got == want, (r.w, r.h, got, want)
        # invariants: scaled fits the box, pads center it
        assert 1 <= r.scaled_w <= r.out_w and 1 <= r.scaled_h <= r.out_h
        assert r.scaled_w == r.out_w or r.scaled_h == r.out_h
        assert 0 <= r.pad_x <= (r.out_w - r.scaled_w)
        assert 0 <= r.pad_y <= (r.out_h - r.scaled_h)


def test_bucket_resize_pixel_exact(spark, images):
    # letterboxed output: target shape per bucket, scaled region equal
    # to the nearest-neighbor reference, padding exactly black
    from ccbot_spark import codecs

    sample = images.limit(12)
    src = {r.image_id: r for r in sample.collect()}
    out = {r.image_id: r for r in multimodal.bucket_resize(sample).collect()}
    assert set(out) == set(src)
    for k, r in out.items():
        m = src[k]
        bucket, tw, th, sw, sh, px_, py_ = multimodal.letterbox_plan_py(m.w, m.h)
        assert (r.bucket, r.w, r.h, r.fmt) == (bucket, tw, th, "ppm")
        got = codecs.decode(bytes(r.bytes), "ppm")
        assert got.shape == (th, tw, 3)
        orig = codecs.decode(bytes(m.bytes), m.fmt)
        yi = (np.arange(sh) * m.h // sh).astype(int)
        xi = (np.arange(sw) * m.w // sw).astype(int)
        want = np.zeros((th, tw, 3), dtype=np.uint8)
        want[py_:py_ + sh, px_:px_ + sw] = orig[yi][:, xi]
        assert np.array_equal(got, want), k


def test_strip_png_metadata_scrubs_without_touching_pixels(spark):
    # plant tEXt (after IHDR) + tIME (handmade, pre-IEND) chunks; the
    # scrub must remove exactly those, leave pixels byte-identical,
    # count correctly, pass non-PNG rows through, and be idempotent
    from ccbot_spark import codecs

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(19, 31, 3), dtype=np.uint8)
    clean = codecs.encode_png(img)
    tainted = multimodal.inject_png_text_chunk(
        clean, b"Author", b"secret camera serial 12345"
    )
    time_chunk = codecs._chunk(b"tIME", b"\x07\xe9\x01\x01\x00\x00\x00")
    tainted = tainted[:-12] + time_chunk + tainted[-12:]  # before IEND
    ppm = codecs.encode_ppm(img)
    broken = clean[:30]  # truncated mid-chunk
    df = spark.createDataFrame(
        [("png", tainted), ("ppm", ppm), ("broken", broken)],
        "image_id string, bytes binary",
    )
    out = {r.image_id: r for r in multimodal.strip_png_metadata(df).collect()}
    text_len = len(b"Author") + 1 + len(b"secret camera serial 12345")
    assert out["png"].stripped_chunks == 2
    assert out["png"].stripped_bytes == (12 + text_len) + (12 + 7)
    assert bytes(out["png"].bytes) == clean
    assert np.array_equal(codecs.decode_png(bytes(out["png"].bytes)), img)
    assert bytes(out["ppm"].bytes) == ppm and out["ppm"].stripped_chunks == 0
    assert bytes(out["broken"].bytes) == broken
    assert out["broken"].stripped_chunks == 0
    # idempotent: a second pass strips nothing
    again = multimodal.strip_png_metadata(
        spark.createDataFrame(
            [("png", bytes(out["png"].bytes))], "image_id string, bytes binary"
        )
    ).collect()[0]
    assert again.stripped_chunks == 0 and bytes(again.bytes) == clean


def test_strip_image_metadata_dispatches_jpeg_and_png(spark):
    # JPEG row: planted COM + encoder-stamped EXIF APP1 must both go,
    # leaving bytes IDENTICAL to a metadata-free encode (the encoder
    # emits APP1 as one contiguous segment, so scrub == never-stamped);
    # PNG row reuses the chunk walk; ppm + truncated rows pass through
    from ccbot_spark import codecs

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(24, 17, 3), dtype=np.uint8)
    clean_jpg = codecs.encode_jpeg(img)
    tainted_jpg = multimodal.inject_jpeg_com_segment(
        codecs.encode_jpeg(img, exif_orientation=6), b"gps track here"
    )
    clean_png = codecs.encode_png(img)
    tainted_png = multimodal.inject_png_text_chunk(clean_png, b"Author", b"s3cret")
    ppm = codecs.encode_ppm(img)
    df = spark.createDataFrame(
        [
            ("jpg", tainted_jpg),
            ("png", tainted_png),
            ("ppm", ppm),
            ("trunc", clean_jpg[:20]),
        ],
        "image_id string, bytes binary",
    )
    out = {r.image_id: r for r in multimodal.strip_image_metadata(df).collect()}
    assert out["jpg"].stripped_chunks == 2  # COM + Exif APP1
    assert out["jpg"].stripped_bytes == len(tainted_jpg) - len(clean_jpg)
    assert bytes(out["jpg"].bytes) == clean_jpg
    # the EXIF orientation really is gone from the scrubbed stream
    assert multimodal._jpeg_exif_walk(bytes(out["jpg"].bytes))[2] is None
    assert out["png"].stripped_chunks == 1
    assert bytes(out["png"].bytes) == clean_png
    assert bytes(out["ppm"].bytes) == ppm and out["ppm"].stripped_chunks == 0
    assert bytes(out["trunc"].bytes) == clean_jpg[:20]
    assert out["trunc"].stripped_chunks == 0
    # idempotent: a second pass over scrubbed blobs strips nothing
    again = multimodal.strip_image_metadata(
        spark.createDataFrame(
            [("jpg", bytes(out["jpg"].bytes))], "image_id string, bytes binary"
        )
    ).collect()[0]
    assert again.stripped_chunks == 0 and bytes(again.bytes) == clean_jpg


def test_strip_jpeg_segments_refuses_what_it_cannot_parse():
    # marker desync, standalone marker before SOS, truncated segment,
    # non-JPEG: all return unchanged with zero counters
    from ccbot_spark.functions.multimodal import _strip_jpeg_segments

    for bad in (
        b"\xff\xd8\x00\x00\x00\x00",  # desync: no 0xFF at segment start
        b"\xff\xd8\xff\xd0\xff\xda",  # standalone RST before SOS
        b"\xff\xd8\xff\xfe\x00\xff",  # COM length runs past the end
        b"\xff\xd8\xff\xe1\x00\x01",  # seglen < 2
        b"not a jpeg",
        b"\xff\xd8\xff\xe0\x00\x04\x00\x00",  # ends before SOS
    ):
        assert _strip_jpeg_segments(bad) == (bad, 0, 0)


def test_exact_dup_groups_finds_byte_identical_reposts(spark, images):
    # d and d+150 share pixel seed AND container (fmt cycle period 3
    # divides 150) → byte-identical blobs; nothing else collides
    got = {
        r.keeper: r.n_copies
        for r in multimodal.exact_dup_groups(images).collect()
    }
    want = {
        min(f"doc-{d}", f"doc-{d + 150}"): 2 for d in range(10)
    }
    assert got == want


def test_linear_classifier_matches_python_twin(spark, docs):
    # broadcast-weight scoring must equal the per-doc python fold,
    # including negative sums (the no-division cross-multiplied gate)
    n_buckets, thr = 512, 50
    wmap = {b: (b * 2654435761) % 2001 - 1000 for b in range(n_buckets)}
    weights = spark.createDataFrame(
        [(b, w) for b, w in wmap.items()], "bucket long, weight long"
    )
    sample = docs.filter(F.col("doc_id") < 120)
    got = {
        r.doc_id: (r.n_tokens, r.score, r.keep)
        for r in textkit.linear_classifier_score(
            sample, weights, n_buckets=n_buckets, threshold_milli=thr
        ).collect()
    }
    texts = {r.doc_id: r.text for r in sample.collect()}
    assert len(got) == len(texts)
    for d, t in texts.items():
        assert got[d] == textkit.linear_classifier_score_py(
            t, wmap, n_buckets, thr
        ), d
    scores = [v[1] for v in got.values()]
    keeps = {v[2] for v in got.values()}
    assert min(scores) < 0 < max(scores), "fixture must exercise both signs"
    assert keeps == {0, 1}, "threshold must actually split the corpus"


def test_edit_distance_pairs_finds_typo_neighbors(spark):
    # planted typo variants must pair with exact distances (python
    # dynamic-programming reference); unrelated docs never pair
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base),
        (2, base.replace("quick", "quik").replace("lazy", "lasy")),  # 2 edits
        (3, base + " extra tail words here"),                        # suffix
        (4, "completely different content with no overlap at all x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): (r.dist, r.len_a, r.len_b)
        for r in dedup.edit_distance_pairs(df, max_dist=25, t10=1).collect()
    }

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    texts = dict(rows)
    assert (1, 2) in got and got[(1, 2)][0] == lev(texts[1], texts[2]) == 2
    assert (1, 3) in got and got[(1, 3)][0] == lev(texts[1], texts[3])
    assert all(4 not in pair for pair in got)
    for (a, b), (d, la, lb) in got.items():
        assert d == lev(texts[a], texts[b])
        assert (la, lb) == (len(texts[a]), len(texts[b]))
        assert abs(la - lb) <= d


def test_pii_scrub_matches_python_twin(spark, docs):
    # unit rows with known PII of every class + ordering edge (the
    # email's host must not be half-eaten by the IP pattern), then the
    # real corpus vs the python twin
    rows = [
        (1001, "reach me at jane.doe+spam@mail.example.org today"),
        (1002, "server 192.168.001.044 and 10.0.0.1 rebooted"),
        (1003, "call +49 1234 5678 or 040-555-1234 now"),
        (1004, "no pii here, just 3.14 and v1.2.3 strings"),
        (1005, "mixed a@b.co 8.8.8.8 +1-800-5551 end"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_emails, r.n_ips, r.n_phones, r.clean_text)
        for r in textkit.pii_scrub(df).collect()
    }
    for d, t in rows:
        assert got[d] == textkit.pii_scrub_py(t), d
    assert got[1001][0] == 1 and "<EMAIL>" in got[1001][3]
    assert got[1002][1] == 2
    assert got[1003][2] == 2
    assert got[1004] == (0, 0, 0, rows[3][1])
    # idempotent: scrubbing scrubbed text changes nothing
    again = {
        r.doc_id: r.clean_text
        for r in textkit.pii_scrub(
            spark.createDataFrame(
                [(d, v[3]) for d, v in got.items()], "doc_id long, text string"
            )
        ).collect()
    }
    assert again == {d: v[3] for d, v in got.items()}
    # corpus parity with the twin
    sample = docs.filter(F.col("doc_id") < 80)
    got2 = {
        r.doc_id: (r.n_emails, r.n_ips, r.n_phones, r.clean_text)
        for r in textkit.pii_scrub(sample).collect()
    }
    for r in sample.collect():
        assert got2[r.doc_id] == textkit.pii_scrub_py(r.text), r.doc_id


def test_repetition_features_gate(spark):
    rows = [
        (1, "a b c d e"),            # 4 distinct 2-grams, no dups
        (2, "buy now buy now buy now"),  # 5 grams, 2 distinct
        (3, "hello"),                # too short for a 2-gram
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in textkit.repetition_features(df).collect()}
    assert (out[1].n_grams, out[1].n_dup_grams, out[1].keep) == (4, 0, 1)
    assert (out[2].n_grams, out[2].n_distinct_grams, out[2].n_dup_grams,
            out[2].keep) == (5, 2, 3, 0)
    assert (out[3].n_grams, out[3].keep) == (0, 1)


def test_pack_sequences_offsets(spark):
    rows = [(i, "t o k", "s") for i in range(6)]  # 3 tokens each
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r.doc_id: (r.start_offset, r.pack_id)
        for r in textkit.pack_sequences(df, cap=5, n_shards=1).collect()
    }
    assert out == {0: (0, 0), 1: (3, 0), 2: (6, 1), 3: (9, 1),
                   4: (12, 2), 5: (15, 3)}
    # sharded: packing restarts per shard, deterministic on doc_id
    sharded = {
        r.doc_id: (r.shard, r.start_offset)
        for r in textkit.pack_sequences(df, cap=5, n_shards=2).collect()
    }
    assert sharded == {0: (0, 0), 2: (0, 3), 4: (0, 6),
                       1: (1, 0), 3: (1, 3), 5: (1, 6)}


def test_curation_features_gates(spark):
    rows = [
        ("ok", 200, 300, "a cat on a mat"),
        ("tiny", 32, 300, "a cat on a mat"),
        ("stretched", 64, 640, "a cat on a mat"),
        ("boiler", 200, 300, "IMG_123 from my camera roll"),
        ("terse", 200, 300, "hi there"),
        ("rambling", 200, 300, " ".join(["w"] * 80)),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, w int, h int, caption string"
    )
    out = {r.image_id: r for r in multimodal.curation_features(df).collect()}
    assert {k: v.keep for k, v in out.items()} == {
        "ok": 1, "tiny": 0, "stretched": 0, "boiler": 0,
        "terse": 0, "rambling": 0,
    }
    assert out["ok"].aspect_x10 == 15  # 300*10 div 200
    assert out["stretched"].aspect_x10 == 100
    assert out["ok"].cap_words == 5
    assert out["rambling"].cap_words == 80


def test_mm_dedup_edges_joint_clusters(spark):
    # 1–2 near by phash, 2–3 by exact caption, 4 isolated: the joint
    # graph (and only the joint graph) yields one {1,2,3} cluster
    rows = [
        (1, 0x1111, "c1"),
        (2, 0x1110, "cap"),
        (3, 0x0001000200030004, "cap"),
        (4, 0x0005000600070008, "c4"),
    ]
    meta = spark.createDataFrame(
        rows, "image_id long, phash long, caption string"
    )
    edges = {
        (r.img_a, r.img_b)
        for r in multimodal.mm_dedup_edges(meta).collect()
    }
    assert edges == {(1, 2), (2, 3)}
    comp = {
        r.doc_id: r.cluster_id
        for r in dedup.connected_components(
            multimodal.mm_dedup_edges(meta), "img_a", "img_b"
        ).collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1}


def test_trap_features_and_filter(spark):
    from ccbot_spark.operators import urlops

    rows = [
        ("cal", "https://a.test/cal/2024/cal/2024/cal/x"),
        ("clean", "https://a.test/p/1"),
        ("deep", "https://a.test/a/b/c/d/e/f/g/h/i"),
        ("long", "https://a.test/p/" + "x" * 170),
        ("root", "http://a.test/"),
    ]
    df = spark.createDataFrame(rows, "id string, url string")
    out = {r.id: r for r in urlops.trap_features(df).collect()}
    assert out["cal"].depth == 6
    assert out["cal"].n_repeat == 3  # cal ×3 + 2024 ×2 beyond distinct
    assert out["root"].depth == 0
    assert {k: v.is_trap for k, v in out.items()} == {
        "cal": 1, "clean": 0, "deep": 1, "long": 1, "root": 0,
    }
    kept = urlops.filter_traps(df)
    assert {r.id for r in kept.collect()} == {"clean", "root"}
    assert kept.columns == ["id", "url"]


def test_frame_sample_raises_for_unknown_codec(spark):
    df = spark.createDataFrame(
        [("v1", b"\x00\x01", "mp4")], "image_id string, bytes binary, fmt string"
    )
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        multimodal.frame_sample(df).collect()


def test_ivf_partition_pruned_search(spark, embs, tmp_path):
    """IVF: index partitioned by centroid; queries scan only probed
    partitions (PartitionFilters in the plan) and recall vs brute
    force is high at nprobe=4/16."""
    idx_dir = str(tmp_path / "ivf")
    cents = similarity.ivf_build(embs, idx_dir, n_centroids=16)
    rows = embs.filter(F.col("vec_id") < 5).collect()
    qvecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in rows}
    res = similarity.ivf_query(spark, idx_dir, cents, qvecs, k=5, nprobe=4)
    from ccbot_spark.plans import explainkit

    plan = explainkit.formatted_plan(res)
    assert "PartitionFilters" in plan and "centroid" in plan
    got = {}
    for r in res.collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    brute = {}
    for r in similarity.ann_bruteforce_topk(embs, n_queries=5, k=5).collect():
        brute.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [
        len(got.get(q, set()) & brute[q]) / len(brute[q]) for q in brute
    ]
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_ivf_int_recall_and_determinism(spark, embs):
    """Integer-exact IVF (the oracled variant): recall vs brute force
    comparable to the float IVF, stable across partition counts."""
    res = similarity.ivf_topk_int(embs, n_queries=5, k=5)
    got = {}
    for r in res.collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    brute = {}
    for r in similarity.ann_bruteforce_topk(embs, n_queries=5, k=5).collect():
        brute.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [
        len(got.get(q, set()) & brute[q]) / len(brute[q]) for q in brute
    ]
    assert sum(recalls) / len(recalls) >= 0.5, recalls
    rep = similarity.ivf_topk_int(embs.repartition(7), n_queries=5, k=5)
    assert sorted(map(tuple, res.collect())) == sorted(map(tuple, rep.collect()))


def test_minhash_jvm_matches_python_reference(spark):
    """minhash_signatures (JVM md5/conv + min-aggregates) must be
    bit-identical to minhash_signature_py on real documents."""
    df = spark.read.parquet(f"{SF}/documents.parquet").limit(40)
    jvm = {r.doc_id: list(r.sig) for r in dedup.minhash_signatures(df).collect()}
    sh = df.select("doc_id", dedup.shingles(F.col("text")).alias("s")).collect()
    for r in sh:
        assert jvm[r.doc_id] == dedup.minhash_signature_py(list(r.s)), r.doc_id


def test_simhash_jvm_matches_python_reference(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet").limit(40)
    jvm = {r.doc_id: r.sh for r in dedup.simhash_signatures(df).collect()}
    for r in df.select("doc_id", "text").collect():
        assert jvm[r.doc_id] == dedup.simhash64_py(r.text.lower().split(" ")), r.doc_id


def _quantized_truth(vecs: dict[int, np.ndarray], t4: int) -> set[tuple[int, int]]:
    ids = sorted(vecs)
    truth = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            dot = int(vecs[a] @ vecs[b])
            na2, nb2 = int(vecs[a] @ vecs[a]), int(vecs[b] @ vecs[b])
            if dot > 0 and 10**8 * dot * dot >= t4**2 * na2 * nb2:
                truth.add((a, b))
    return truth


def test_embedding_lsh_no_false_positives(spark):
    """The exact integer rerank means precision 1 by construction:
    every returned pair satisfies the quantized threshold."""
    df = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = {(r.vec_a, r.vec_b) for r in dedup.embedding_lsh_near_pairs(df, t4=3500).collect()}
    q = {r.vec_id: np.floor(np.array(r.embedding, dtype=np.float64) * 10000).astype(np.int64)
         for r in df.collect()}
    assert got <= _quantized_truth(q, 3500)


def test_embedding_lsh_recall_on_planted_near_dups(spark):
    """Sign-LSH is sized for true near-dups (8 bands of 8 bits →
    ≈0.96 theoretical recall at cos 0.92): plant perturbed copies and
    require ≥0.8 recall with the pairs found exactly right."""
    rng = np.random.RandomState(7)
    base = rng.randn(40, 64)
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        w = v + 0.12 * rng.randn(64)  # cos ≈ 0.99 copy
        rows.append((1000 + i, [float(x) for x in w]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r.vec_a, r.vec_b) for r in dedup.embedding_lsh_near_pairs(df, t4=9000).collect()}
    q = {vid: np.floor(np.array(emb) * 10000).astype(np.int64) for vid, emb in rows}
    truth = _quantized_truth(q, 9000)
    assert got <= truth
    assert len(truth) >= 30  # the plant worked
    assert len(got) / len(truth) >= 0.8, (len(got), len(truth))


def test_embedding_cosine_fold_bitwise_matches_duckdb():
    """embedding_near_pairs computes its dot/norm sums as strict
    left folds (np.cumsum) — assert the resulting doubles are
    BIT-IDENTICAL to DuckDB's list_sum fold, so the oracle threshold
    compare needs no epsilon assumption at all."""
    import duckdb
    import pyarrow.parquet as pq

    tbl = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    m = np.vstack(tbl.column("embedding").to_pylist()).astype(np.float64)[:40]
    # the UDF's fold: cumsum along the vector, sequential by definition
    dots = np.cumsum(m[:-1] * m[1:], axis=1)[:, -1]
    con = duckdb.connect()
    want = [
        con.execute(
            "SELECT list_sum(list_transform(generate_series(1, len($a::DOUBLE[])),"
            " i -> ($a::DOUBLE[])[i] * ($b::DOUBLE[])[i]))",
            {"a": list(m[i]), "b": list(m[i + 1])},
        ).fetchone()[0]
        for i in range(len(m) - 1)
    ]
    assert [d.hex() for d in dots] == [float(w).hex() for w in want]


def test_embedding_lsh_empty_input(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet").filter(F.lit(False))
    out = dedup.embedding_lsh_near_pairs(df)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["vec_a", "vec_b"]


def test_semdedup_matches_official_algorithm(spark):
    """dedup.semdedup == a sequential python transcription of the
    official SemDeDup screening loop (sort cluster by ASCENDING
    centroid similarity; drop an item iff its max cosine to any
    EARLIER item ≥ ε, whether or not that item survived), on planted
    duplicate groups — and the signature behavior is exercised: in at
    least one duplicate pair the member FARTHER from the centroid is
    the survivor."""
    rng = np.random.RandomState(11)
    rows = []
    base = rng.randn(60, 32)
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
    # planted near-copies of non-centroid vectors (ids ≥ 100 so they
    # can't become centroids; cos ≈ 0.99 to their source)
    for j in range(20):
        w = base[20 + j] + 0.1 * rng.randn(32)
        rows.append((100 + j, [float(x) for x in w]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.vec_id: (r.cid, r.cdot, r.keep)
        for r in dedup.semdedup(df, n_centroids=16, eps4=9000).collect()
    }

    # ---- sequential reference (float ops mirror the Spark fold)
    S = 1 << 20
    def quant(emb):
        n = 0.0
        for x in emb:  # strict left fold, like F.aggregate
            n += x * x
        n = np.sqrt(n)
        return np.array([int(np.floor(x / n * S)) for x in emb], np.int64)

    q = {vid: quant(emb) for vid, emb in rows}
    cents = sorted(v for v, _ in rows if v % 997 < 31)[:16]
    assign, cdot = {}, {}
    for vid in q:
        best = max(cents, key=lambda c: (int(q[vid] @ q[c]), -c))
        assign[vid] = best
        cdot[vid] = int(q[vid] @ q[best])
    keep = {}
    for c in cents:
        members = sorted(
            (v for v in q if assign[v] == c), key=lambda v: (cdot[v], v)
        )
        for i, v in enumerate(members):
            dup = any(
                10_000 * int(q[v] @ q[u]) >= 9000 * S * S
                for u in members[:i]
            )
            keep[v] = 0 if dup else 1

    assert got == {
        v: (assign[v], cdot[v], keep[v]) for v in q
    }
    dropped = {v for v, k in keep.items() if k == 0}
    assert len(dropped) >= 10  # the plant worked
    # the atypical member survives: some planted pair where the copy
    # (id ≥ 100) is nearer the centroid and is the one dropped while
    # its farther source survives — or vice versa; assert the rule
    # held on every same-cluster planted pair either way.
    checked = 0
    for j in range(20):
        a, b = 20 + j, 100 + j
        if assign[a] == assign[b] and (keep[a] == 0) != (keep[b] == 0):
            survivor = a if keep[a] else b
            other = b if keep[a] else a
            assert cdot[survivor] <= cdot[other]
            checked += 1
    assert checked >= 5


def test_connected_components_match_union_find(spark):
    """Pointer-jumping label propagation == plain union-find on the
    full simhash pair graph (416 nodes, one 396-node component — the
    shape where O(diameter) propagation would need ~10 rounds and the
    jumping variant needs ~log of that)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pairs = dedup.simhash_near_pairs(docs, max_ham=16)
    edges = [(r.doc_a, r.doc_b) for r in pairs.collect()]
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    want = {}
    for n in parent:
        want.setdefault(find(n), set()).add(n)
    # canonical: min id per component
    want_lab = {n: min(members) for root, members in want.items() for n in members}
    got = {
        r.doc_id: r.cluster_id
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == want_lab
    dedup.clear_caches()


def test_connected_components_empty_and_chain(spark):
    rows = [(i, i + 1) for i in range(0, 40)]  # one 41-node chain
    pairs = spark.createDataFrame(rows, "doc_a long, doc_b long")
    got = {r.doc_id: r.cluster_id
           for r in dedup.connected_components(pairs).collect()}
    assert got == {i: 0 for i in range(41)}
    empty = pairs.filter(F.lit(False))
    assert dedup.connected_components(empty).count() == 0
    dedup.clear_caches()


def test_dedup_clear_caches(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet")
    dedup.minhash_lsh_candidates(df).count()
    assert dedup._ACTIVE_CACHES
    dedup.clear_caches()
    assert not dedup._ACTIVE_CACHES


def test_keep_best_per_cluster(spark):
    """Keeper = highest quality, tie-break lowest doc_id; docs outside
    the pair graph survive as their own singletons."""
    from ccbot_spark.functions.dedup import keep_best_per_cluster

    docs = spark.createDataFrame(
        [(1, 100), (2, 300), (3, 300), (4, 50), (9, 7)],
        "doc_id long, n_chars long",
    )
    clusters = spark.createDataFrame(
        # {1,2,3,4} one cluster labeled 1; doc 9 unclustered
        [(1, 1), (2, 1), (3, 1), (4, 1)], "doc_id long, cluster_id long"
    )
    got = {
        (r.doc_id, r.cluster_id, r.n_chars)
        for r in keep_best_per_cluster(docs, clusters).collect()
    }
    assert got == {(2, 1, 300), (9, 9, 7)}


def test_wet_text_jvm_matches_python(spark):
    """textkit.wet_text (JVM regexp chain) is byte-identical to
    parsekit.extract_text on markup covering every rule: script/style
    drop, tag removal, entity decode order, whitespace collapse."""
    from ccbot_spark import parsekit
    from ccbot_spark.functions import textkit
    from ccbot_spark.plans import explainkit

    cases = [
        '<html><head><style>p{x}</style></head><body>'
        '<script>var s="</p>";</script><h1>T</h1>'
        "<p>a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39;</p></body></html>",
        "<p>multi\n  line\ttext</p>",
        "no tags at all",
        "<SCRIPT a=b>x</SCRIPT>keep<STYLE>y</STYLE>",
        "&amp;amp; one-level decode",
        "",
        "  <div> lead/trail  </div>  ",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "html string").select(
        "html", textkit.wet_text("html").alias("t")
    )
    got = {r["html"]: r["t"] for r in df.collect()}
    for c in cases:
        assert got[c] == parsekit.extract_text(c), repr(c)
    assert "EvalPython" not in explainkit.formatted_plan(df)


def test_aspect_bucket_jvm_python_twin_and_plan(spark):
    """Integer aspect ladder: the JVM `div`+CASE expression equals the
    python twin on a dense dim grid (incl. exact cut-point landings),
    stays JVM-only, and every ladder bucket is reachable."""
    from pyspark.sql import functions as F

    from ccbot_spark.functions import multimodal
    from ccbot_spark.plans import explainkit

    grid = [(w, h) for w in range(16, 120, 7) for h in range(16, 120, 11)]
    # exact geometric-midpoint landings: q == cut must fall in the
    # UPPER bucket on both sides (strict < on the cut)
    grid += [(649, 1000), (866, 1000), (1154, 1000), (1539, 1000)]
    df = spark.createDataFrame(grid, "hdr_w long, hdr_h long")
    out = df.select(
        "hdr_w", "hdr_h",
        multimodal.aspect_bucket_col("hdr_w", "hdr_h").alias("b"),
    )
    got = {(r["hdr_w"], r["hdr_h"]): r["b"] for r in out.collect()}
    want = {
        (w, h): multimodal.aspect_bucket_py(w, h) for (w, h) in grid
    }
    assert got == want
    assert set(got.values()) == set(multimodal.ASPECT_LADDER)
    assert "EvalPython" not in explainkit.formatted_plan(out)


def test_phash_blocklist_filter(spark):
    """Moderation gate: exact and banded near-match paths, pigeonhole
    completeness at max_ham <= 3 vs a brute-force reference, and
    kept/flagged partitioning the corpus."""
    import itertools

    from ccbot_spark.functions import multimodal

    bad = [0x0123456789ABCDE0, 0x7EDCBA9876543210]
    imgs = []
    # plant: exact hits, 1/2/3-bit near hits, and clean images
    for i, b in enumerate(bad):
        imgs.append((f"x{i}", b))
        imgs.append((f"n1{i}", b ^ (1 << (i * 17))))
        imgs.append((f"n3{i}", b ^ 0b111 << (i * 20)))
    imgs += [(f"c{i}", 0x5A5A5A5A5A5A5A00 + i * 64) for i in range(5)]
    df = spark.createDataFrame(imgs, "image_id string, phash long")
    bl = spark.createDataFrame([(b,) for b in bad], "bad_phash long")

    # exact path
    res0 = multimodal.phash_blocklist_filter(df, bl, max_ham=0)
    assert {r.image_id for r in res0["flagged"].collect()} == {"x0", "x1"}
    assert {r.image_id for r in res0["kept"].collect()} == (
        {i for i, _ in imgs} - {"x0", "x1"}
    )

    # near path == brute force for every radius where bands are complete
    def brute(max_ham):
        out = {}
        for iid, ph in imgs:
            hams = sorted(
                (bin(ph ^ b).count("1"), b) for b in bad
            )
            if hams[0][0] <= max_ham:
                out[iid] = hams[0]
        return out

    for max_ham in (1, 2, 3):
        res = multimodal.phash_blocklist_filter(df, bl, max_ham=max_ham)
        got = {
            r.image_id: (r.hamming, r.bad_phash)
            for r in res["flagged"].collect()
        }
        assert got == brute(max_ham), max_ham
        kept = {r.image_id for r in res["kept"].collect()}
        assert kept == {i for i, _ in imgs} - got.keys()

    # plan: the blocklist side broadcasts — the corpus never shuffles
    from ccbot_spark.plans import explainkit

    plan = explainkit.formatted_plan(
        multimodal.phash_blocklist_filter(df, bl, max_ham=2)["flagged"]
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan, plan


def para_dedup_py(texts: dict[int, str], w: int = 3):
    """Spec-as-code twin of textkit.paragraph_dedup: sequential
    first-occurrence scan in (doc_id, pos) order."""
    seen: set[str] = set()
    out = {}
    for doc_id in sorted(texts):
        toks = texts[doc_id].split(" ")
        paras = [" ".join(toks[i:i + w]) for i in range(0, len(toks), w)]
        kept = []
        for p in paras:
            if p not in seen:
                seen.add(p)
                kept.append(p)
        out[doc_id] = (len(paras), len(kept), " ".join(kept))
    return out


def test_paragraph_dedup_matches_python(docs):
    got = {
        r.doc_id: (r.n_paras, r.n_kept, r.text_dedup)
        for r in textkit.paragraph_dedup(docs).collect()
    }
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    want = para_dedup_py(texts)
    assert got == want
    # the gate binds on real data: some doc loses at least one paragraph
    assert any(k < n for n, k, _ in want.values())
    # global invariant: every distinct paragraph survives exactly once
    w = 3
    all_paras = {
        " ".join(t.split(" ")[i:i + w])
        for t in texts.values()
        for i in range(0, len(t.split(" ")), w)
    }
    assert sum(k for _, k, _ in want.values()) == len(all_paras)


def test_paragraph_dedup_edge_cases(spark):
    rows = [
        (1, "a b c a b c a b c"),   # self-repeat: chunks 2,3 dup chunk 1
        (2, "a b c d e"),           # trailing partial chunk "d e"
        (3, "d e"),                 # whole doc already seen as doc 2's tail
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_paras, r.n_kept, r.text_dedup)
        for r in textkit.paragraph_dedup(df).collect()
    }
    assert got == {
        1: (3, 1, "a b c"),
        2: (2, 1, "d e"),
        3: (1, 0, ""),
    }


def test_boilerplate_strip(spark):
    # 3 docs on host A share chunk-1 "nav bar here"; host B has the
    # same chunk but only once -> below threshold there, kept
    rows = [
        (1, "A", "nav bar here alpha beta gamma"),
        (2, "A", "nav bar here delta eps zeta"),
        (3, "A", "nav bar here alpha beta gamma"),
        (4, "B", "nav bar here unique words body"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r.doc_id: (r.n_paras, r.n_boiler, r.text_clean)
        for r in textkit.boilerplate_strip(df, min_docs=3).collect()
    }
    assert got == {
        1: (2, 1, "alpha beta gamma"),
        2: (2, 1, "delta eps zeta"),
        3: (2, 1, "alpha beta gamma"),   # duplicate CONTENT is kept: not df-boiler
        4: (2, 0, "nav bar here unique words body"),
    }


def test_boilerplate_distinct_doc_df(spark):
    # within-doc repetition must NOT inflate df: one doc repeating a
    # chunk 5 times contributes 1 to df, so nothing is stripped
    rows = [(1, "A", "x y z x y z x y z x y z x y z")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    [r] = textkit.boilerplate_strip(df, min_docs=2).collect()
    assert (r.n_paras, r.n_boiler) == (5, 0)


EV = "/root/testdata/sf0.001/events.parquet"


def _events_pdf(spark):
    return (
        spark.read.parquet(EV)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .toPandas()
    )


def test_asof_join_matches_bruteforce(spark):
    from ccbot_spark.functions import eventops

    ev = spark.read.parquet(EV)
    build = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("value"))
    )
    probe = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    got = {
        r.event_id: (r.ts_us, r.asof_ts_us, r.asof_value)
        for r in eventops.asof_join(probe, build).collect()
    }

    pdf = _events_pdf(spark)
    us = lambda t: t.value // 1000  # pandas Timestamp ns → µs
    errs = {}
    for _, r in pdf[pdf.event_type == "error"].sort_values("event_id").iterrows():
        errs.setdefault(r.user_id, []).append((us(r.ts), r.value))
    want = {}
    for _, r in pdf[pdf.event_type == "click"].iterrows():
        cand = [
            (t, v) for t, v in errs.get(r.user_id, []) if t <= us(r.ts)
        ]
        bt, bv = max(cand) if cand else (-1, -1.0)
        want[r.event_id] = (us(r.ts), bt, bv)
    assert got == want
    # fixture exercises both arms
    assert any(t == -1 for _, t, _ in want.values()) or len(want) > 0
    assert any(t != -1 for _, t, _ in want.values())


def test_asof_join_tie_and_nomatch(spark):
    from ccbot_spark.functions import eventops

    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)
    build = spark.createDataFrame(
        [(1, s(10), 5.0), (1, s(20), 7.0)],
        "user_id long, ts timestamp_ntz, value double",
    )
    probe = spark.createDataFrame(
        [(100, 1, s(5)), (101, 1, s(10)), (102, 1, s(25)), (103, 2, s(50))],
        "event_id long, user_id long, ts timestamp_ntz",
    )
    got = {
        r.event_id: (r.asof_ts_us, r.asof_value)
        for r in eventops.asof_join(probe, build).collect()
    }
    base_us = int(
        (dt.datetime(2024, 1, 1) - dt.datetime(1970, 1, 1)).total_seconds()
    ) * 1_000_000
    US = 1_000_000
    assert got == {
        100: (-1, -1.0),                    # before any build row
        101: (base_us + 10 * US, 5.0),      # equal ts matches (<=)
        102: (base_us + 20 * US, 7.0),      # latest preceding
        103: (-1, -1.0),                    # key with no build rows
    }


def test_range_join_bucketed_matches_bruteforce(spark):
    from ccbot_spark.functions import eventops

    ev = spark.read.parquet(EV)
    iv = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("iv_id"), "user_id", F.col("ts").alias("start_ts")
    )
    pr = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    got = {
        r.iv_id: (r.n_probes, r.sum_cents)
        for r in eventops.range_join_bucketed(iv, pr, width_s=600).collect()
    }

    pdf = _events_pdf(spark)
    us = lambda t: t.value // 1000
    clicks = [
        (r.user_id, us(r.ts), int(round(r.value * 100)))
        for _, r in pdf[pdf.event_type == "click"].iterrows()
    ]
    want = {}
    W = 600 * 1_000_000
    for _, r in pdf[pdf.event_type == "error"].iterrows():
        s0 = us(r.ts)
        hit = [c for u, t, c in clicks if u == r.user_id and s0 <= t < s0 + W]
        want[r.event_id] = (len(hit), sum(hit))
    assert got == want
    assert any(n > 0 for n, _ in want.values())
    assert any(n == 0 for n, _ in want.values())


def test_range_join_bucket_boundaries(spark):
    """Probes exactly at start (in), end (out), and straddling a
    bucket boundary (the 2-bucket explode arm) all resolve exactly."""
    from ccbot_spark.functions import eventops

    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)  # epoch-aligned to the 600 s grid
    s = lambda sec: t0 + dt.timedelta(seconds=sec)
    # interval NOT aligned to the grid: starts at 500 s, spans buckets
    # [0,600) and [600,1200)
    iv = spark.createDataFrame(
        [(1, 7, s(500))], "iv_id long, user_id long, start_ts timestamp_ntz"
    )
    pr = spark.createDataFrame(
        [
            (7, s(499), 1.0),   # just before start → out
            (7, s(500), 2.0),   # == start → in (closed lower bound)
            (7, s(700), 4.0),   # second bucket → in
            (7, s(1099), 8.0),  # last µs-second inside → in
            (7, s(1100), 16.0), # == end → out (open upper bound)
            (8, s(700), 32.0),  # other key → out
        ],
        "user_id long, ts timestamp_ntz, value double",
    )
    rows = eventops.range_join_bucketed(iv, pr, width_s=600).collect()
    assert [(r.iv_id, r.n_probes, r.sum_cents) for r in rows] == [(1, 3, 1400)]


def test_sessionize_matches_bruteforce(spark):
    from ccbot_spark.functions import eventops

    got = {
        (r.user_id, r.session_id): (
            r.n_events, r.session_start_us, r.session_end_us, r.sum_cents
        )
        for r in eventops.sessionize(
            spark.read.parquet(EV), gap_s=1800
        ).collect()
    }

    pdf = _events_pdf(spark)
    us = lambda t: t.value // 1000
    want = {}
    GAP = 1800 * 1_000_000
    for uid, grp in pdf.groupby("user_id"):
        rows = sorted(
            (us(r.ts), r.event_id, int(round(r.value * 100)))
            for _, r in grp.iterrows()
        )
        sid = 0
        prev = None
        for t, _, c in rows:
            if prev is None or t - prev > GAP:
                sid += 1
                want[(uid, sid)] = [0, t, t, 0]
            want[(uid, sid)][0] += 1
            want[(uid, sid)][2] = t
            want[(uid, sid)][3] += c
            prev = t
        # sanity: at least one multi-session user exists in the fixture
    want = {k: tuple(v) for k, v in want.items()}
    assert got == want
    assert max(sid for _, sid in want) >= 2


def test_anchor_text_extraction_and_counts(spark):
    """fetchparse.extract_anchor_texts + anchor_term_counts: whole-
    element JVM scan — nofollow excluded case-insensitively, nested
    markup yields no row (never a wrong one), empty anchors contribute
    no terms, counts aggregate across pages; the plan stays pure-JVM
    (no Python eval nodes — the extractor is codegen-resident)."""
    pages = [
        ("p1", '<a href="http://t/a">Big Fish</a>'
               '<a href="http://t/b" rel="NOFOLLOW">secret</a>'
               '<a href="http://t/a">big  fish</a>'),
        ("p2", '<a href="http://t/a">fish</a>'
               '<a href="http://t/c"></a>'  # empty anchor: pair, no terms
               '<a href="http://t/d"><b>nested</b></a>'  # markup: no row
               "<p>no anchor</p>"),
        ("p3", "<html><body>nothing</body></html>"),
    ]
    df = spark.createDataFrame(pages, "page_url string, html string")
    pairs = {
        (r.page_url, r.href, r.anchor)
        for r in __import__(
            "ccbot_spark.operators.fetchparse", fromlist=["x"]
        ).extract_anchor_texts(df).collect()
    }
    assert pairs == {
        ("p1", "http://t/a", "Big Fish"),
        ("p1", "http://t/a", "big  fish"),
        ("p2", "http://t/a", "fish"),
        ("p2", "http://t/c", ""),
    }
    from ccbot_spark.operators import fetchparse

    counts = fetchparse.anchor_term_counts(
        fetchparse.extract_anchor_texts(df)
    )
    got = {(r.target, r.term): r.cnt for r in counts.collect()}
    assert got == {
        ("http://t/a", "big"): 2,
        ("http://t/a", "fish"): 3,
    }
    plan = counts._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan, plan


def test_webp_tiff_header_sniff(spark):
    """WebP's three dim layouts (VP8X 24-bit canvas-1, VP8L packed
    14-bit, lossy VP8 u16) parse exactly; an ANIM-first WebP still
    sniffs 'webp' with NULL dims; TIFF sniffs by both byte-order marks
    with NULL dims; the cross-modal sniff routes both to image."""
    import struct as _s

    from ccbot_spark import codecs as _c
    from ccbot_spark.functions import multimodal as _mm

    anim_first = (
        b"RIFF" + _s.pack("<I", 16) + b"WEBP"
        + b"ANIM" + _s.pack("<I", 6) + b"\x00" * 6
    )
    rows = [
        ("x", _c.webp_header(16383, 9000, "vp8x")),
        ("l", _c.webp_header(300, 200, "vp8l")),
        ("v", _c.webp_header(640, 480, "vp8")),
        ("a", anim_first),
        ("ti", _c.tiff_header(little_endian=True)),
        ("tm", _c.tiff_header(little_endian=False)),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    got = {
        r.image_id: (r.container, r.hdr_w, r.hdr_h)
        for r in _mm.header_meta(df).collect()
    }
    assert got == {
        "x": ("webp", 16383, 9000),
        "l": ("webp", 300, 200),
        "v": ("webp", 640, 480),
        "a": ("webp", None, None),
        "ti": ("tiff", None, None),
        "tm": ("tiff", None, None),
    }
    routed = {
        r.image_id: r.modality
        for r in df.select(
            "image_id", _mm.media_container_col("bytes").alias("c")
        )
        .select("image_id", _mm.modality_col("c").alias("modality"))
        .collect()
    }
    assert set(routed.values()) == {"image"}


def test_tiff_ifd_dims_walk(spark):
    """tiff_dims reads IFD0 ImageWidth/ImageLength across both byte
    orders and both value types; truncated or non-TIFF blobs answer
    NULL, never a guess."""
    from ccbot_spark import codecs as _c
    from ccbot_spark.functions import multimodal as _mm

    rows = [
        ("ils", _c.tiff_header(True, w=640, h=480, long_type=False)),
        ("ill", _c.tiff_header(True, w=70000, h=50000, long_type=True)),
        ("mms", _c.tiff_header(False, w=123, h=45, long_type=False)),
        ("mml", _c.tiff_header(False, w=99999, h=88888, long_type=True)),
        ("bare", _c.tiff_header(True)),
        ("trunc", _c.tiff_header(True, w=10, h=10)[:12]),
        ("png", b"\x89PNG\r\n\x1a\n" + b"\x00" * 16),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    got = {
        r.image_id: (r.tif_w, r.tif_h)
        for r in _mm.tiff_dims(df).collect()
    }
    assert got == {
        "ils": (640, 480),
        "ill": (70000, 50000),
        "mms": (123, 45),
        "mml": (99999, 88888),
        "bare": (None, None),
        "trunc": (None, None),
        "png": (None, None),
    }


def test_gif_frames_bridge_pixels(spark):
    """gif_frames_to_images round-trips actual pixels: each exploded
    ppm equals the corresponding decoded animation frame, and the
    bridge output feeds the image pipeline (phash runs on frames)."""
    from ccbot_spark import codecs as _c, phash as _ph
    from ccbot_spark.functions import multimodal as _mm

    rs = np.random.RandomState(21)
    frames = [
        rs.randint(0, 256, size=(10, 12, 3), dtype=np.uint8)
        for _ in range(5)
    ]
    df = spark.createDataFrame(
        [("g", _c.encode_gif_anim(frames, 5))],
        "image_id string, bytes binary",
    )
    out = {
        r.image_id: r for r in _mm.gif_frames_to_images(df).collect()
    }
    assert set(out) == {f"g#f{k}" for k in range(5)}
    for k in range(5):
        r = out[f"g#f{k}"]
        px = _c.decode_ppm(bytes(r.bytes))
        assert np.array_equal(px, frames[k])
        assert (r.w, r.h, r.fmt) == (12, 10, "ppm")
        assert isinstance(_ph.phash64(px), int)
    # every_n=2 keeps frames 0,2,4 only
    sampled = {r.frame_no for r in _mm.gif_frames_to_images(df, every_n=2).collect()}
    assert sampled == {0, 2, 4}


def test_ann_pq_recall_and_compression(spark, embs):
    """Product quantization (ADC): codes are m ints in [0,k); training
    and encoding are deterministic (retrain == identical books); and
    PQ top-10 recalls the exact brute-force top-3 far better than a
    size-matched random guess would."""
    books = similarity.pq_train(embs, dim=64)
    assert books.shape == (16, 32, 4)
    books2 = similarity.pq_train(embs, dim=64)
    assert np.array_equal(books, books2)
    codes = {r.vec_id: list(r.codes) for r in similarity.pq_encode(embs, books).collect()}
    n = len(codes)
    assert all(len(c) == 16 and all(0 <= x < 32 for x in c) for c in codes.values())
    # exact L2 top-3 per query (numpy reference)
    rows = embs.collect()
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in rows}
    got = {}
    for r in similarity.ann_pq_topk(embs, books, n_queries=5, k=10).collect():
        got.setdefault(r.query_id, []).append(r.neighbor_id)
    hits = total = 0
    for qid in range(5):
        qv = vecs[qid]
        exact = sorted(
            (float(((v - qv) ** 2).sum()), nid)
            for nid, v in vecs.items()
            if nid != qid
        )[:3]
        want = {nid for _, nid in exact}
        hits += len(want & set(got[qid]))
        total += len(want)
    recall = hits / total
    # random top-10 over n candidates would recall ~10/n (< 5% here)
    assert recall >= 0.6, (recall, n)


def test_og_and_srcset_parsing(spark):
    """OpenGraph image+caption discovery and srcset best-candidate
    selection: title beats description, missing pieces are NULL,
    descriptors compare numerically (800w > 2x, 1.5x between 1x and
    2x), bare candidates count as 1x, and the plan stays pure-JVM."""
    from ccbot_spark.operators import fetchparse as fp

    rows = [
        ("both", '<meta property="og:image" content="http://t/i.jpg">'
                 '<meta property="og:title" content="T">'
                 '<meta property="og:description" content="D">'),
        ("desc_only", '<meta property="og:image" content="http://t/j.jpg">'
                      '<meta property="og:description" content="D2">'),
        ("none", "<html><body>plain</body></html>"),
        ("caseless", '<META PROPERTY="og:image" CONTENT="http://t/k.jpg">'),
    ]
    df = spark.createDataFrame(rows, "id string, html string")
    ogi, ogc = fp.og_image_cols("html")
    out = df.select("id", ogi, ogc)
    got = {r.id: (r.og_image, r.og_caption) for r in out.collect()}
    assert got == {
        "both": ("http://t/i.jpg", "T"),
        "desc_only": ("http://t/j.jpg", "D2"),
        "none": (None, None),
        "caseless": ("http://t/k.jpg", None),
    }
    srows = [
        ("w_beats_x", "a.jpg 2x, b.jpg 800w"),
        ("frac", "a.jpg 1.5x, b.jpg 1x, c.jpg 1.4x"),
        ("bare", "a.jpg"),
        ("bare_vs_2x", "a.jpg, b.jpg 2x"),
        ("empty", ""),
        ("ties", "b.jpg 2x, a.jpg 2x"),  # (key, url) max → url tiebreak
    ]
    sdf = spark.createDataFrame(srows, "id string, srcset string")
    sel = sdf.select("id", fp.srcset_best_col("srcset"))
    sgot = {r.id: r.srcset_best for r in sel.collect()}
    assert sgot == {
        "w_beats_x": "b.jpg",
        "frac": "a.jpg",
        "bare": "a.jpg",
        "bare_vs_2x": "b.jpg",
        "empty": None,
        "ties": "b.jpg",
    }
    for frame in (out, sel):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan and "MapInPandas" not in plan, plan


# ------------------------------------------- CLIP-score alignment filter

def test_clip_align_filter_matches_python(spark, docs, embs):
    """clip_align_filter == an independent hashlib/numpy recomputation
    of the stub caption tower, the 2^20 unit quantization, the sparse
    integer dot, and the cross-multiplied cosine gate — and the gate
    fires BOTH ways on the fixture."""
    import hashlib

    got = {
        r.image_id: r
        for r in similarity.clip_align_filter(docs, embs, dim=64, t4=200)
        .collect()
    }
    emb_rows = {r.vec_id: list(r.embedding) for r in embs.collect()}
    kept = rejected = 0
    for row in docs.collect():
        if row.doc_id not in emb_rows:
            continue
        # caption tower (sparse signed token counts)
        vec = {}
        for tok in row.text.lower().split(" "):
            if tok == "":
                continue
            hx = hashlib.md5(tok.encode()).hexdigest()
            b = int(hx[:8], 16) % 64
            s = (int(hx[8], 16) % 2) * 2 - 1
            vec[b] = vec.get(b, 0) + s
        vec = {b: v for b, v in vec.items() if v != 0}
        # image tower: unit-normalize (left fold) + floor-quantize
        e = [float(np.float64(x)) for x in emb_rows[row.doc_id]]
        acc = 0.0
        for x in e:
            acc += x * x
        nrm = float(np.sqrt(acc))
        q = [int(np.floor(x / nrm * 1048576.0)) for x in e]
        if not vec:
            assert row.doc_id not in got
            continue
        dot = sum(v * q[b] for b, v in vec.items())
        cap_n2 = sum(v * v for v in vec.values())
        img_n2 = sum(x * x for x in q)
        keep = int(dot > 0 and 10**8 * dot * dot >= 200 * 200 * cap_n2 * img_n2)
        g = got[row.doc_id]
        assert (g.dot, g.cap_n2, g.img_n2, g.keep) == (
            dot, cap_n2, img_n2, keep,
        ), row.doc_id
        kept += keep
        rejected += 1 - keep
    assert kept > 0 and rejected > 0


def test_clip_align_filter_jvm_only(spark, docs, embs):
    """The alignment gate never leaves the JVM: no Python eval node of
    any kind in the physical plan (the stub tower is md5/conv exprs;
    the dot is element_at over the quantized array)."""
    from ccbot_spark.plans import explainkit

    plan = explainkit.formatted_plan(
        similarity.clip_align_filter(docs, embs, dim=64, t4=200)
    )
    for pynode in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
                   "FlatMapGroupsInPandas"):
        assert pynode not in plan


# ------------------------------------------- low-information image gate

def test_pixel_stats_matches_numpy(spark, docs):
    """pixel_stats' exact integer moments == an independent numpy
    recomputation on the decoded pixels (including var_num, which the
    oracled entry cannot expose for the noise class), and the fixture
    exercises every verdict combination."""
    imgs = multimodal.synth_flat_mix_from_docs(
        docs.filter(F.col("doc_id") < 60)
    ).cache()
    got = {r.image_id: r for r in multimodal.pixel_stats(imgs, t2=10).collect()}
    seen = set()
    for r in imgs.collect():
        px = multimodal.decode_bytes(bytes(r.bytes), r.fmt)
        flat = px.reshape(-1).astype(np.int64)
        n = int(flat.size)
        sx = int(flat.sum())
        sx2 = int((flat * flat).sum())
        var_num = n * sx2 - sx * sx
        g = got[r.image_id]
        assert (g.n_px, g.var_num) == (n, var_num), r.image_id
        assert g.is_flat == int(var_num == 0)
        assert g.keep == int(4 * var_num >= 100 * n * n)
        seen.add((g.is_flat, g.keep))
    imgs.unpersist()
    # solid → (1, 0); checkerboard → (0, 0); noise → (0, 1)
    assert seen == {(1, 0), (0, 0), (0, 1)}


# --------------------------------------------- blur / sharpness gate

def test_laplacian_stats_matches_numpy(spark, docs):
    """laplacian_stats' exact integer Laplacian energy == an
    independent numpy recomputation (np.diff-based second differences,
    a different formulation than the operator's shifted-slice sum),
    the ramp class proves variance alone cannot stand in for focus,
    and sub-3×3 images get the empty-interior verdict."""
    imgs = multimodal.synth_blur_mix_from_docs(
        docs.filter(F.col("doc_id") < 60)
    ).cache()
    got = {
        r.image_id: r
        for r in multimodal.laplacian_stats(imgs, tau=100).collect()
    }
    verdicts = {}
    for r in imgs.collect():
        px = multimodal.decode_bytes(bytes(r.bytes), r.fmt).astype(np.int64)
        # independent form: L = -(d²/di² + d²/dj²) via np.diff twice
        dii = np.diff(px, n=2, axis=0)[:, 1:-1, :]
        djj = np.diff(px, n=2, axis=1)[1:-1, :, :]
        lap = -(dii + djj)
        energy = int((lap * lap).sum())
        n_int = int(lap.size)
        g = got[r.image_id]
        assert (g.n_int, g.lap_energy) == (n_int, energy), r.image_id
        assert g.is_sharp == int(n_int > 0 and energy >= 100 * n_int)
        d = int(r.image_id.split("-")[1])
        verdicts[d % 3] = verdicts.get(d % 3, set()) | {g.is_sharp}
        # closed-form fixture identities the oracle relies on
        if d % 3 == 2:
            assert g.lap_energy == 1296 * g.n_int
        else:
            assert g.lap_energy == 0
    imgs.unpersist()
    # solid and ramp both fail the gate; only the checkerboard passes —
    # and the ramp has NONZERO variance (pixel_stats would keep it)
    assert verdicts == {0: {0}, 1: {0}, 2: {1}}

    # empty-interior boundary: a 2×5 image has no valid Laplacian
    from ccbot_spark import codecs

    tiny = np.arange(2 * 5 * 3, dtype=np.uint8).reshape(2, 5, 3)
    tdf = spark.createDataFrame(
        [("tiny", bytearray(codecs.encode(tiny, "ppm")), 5, 2, "ppm")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    row = multimodal.laplacian_stats(tdf).collect()[0]
    assert (row.n_int, row.lap_energy, row.is_sharp) == (0, 0, 0)


# ------------------------------------------------- mirror-host detection

def test_mirror_hosts_planted_and_brute_force(spark):
    """Planted full + partial mirrors recovered exactly; score equals a
    python brute-force over the same capped digest universe; the
    boilerplate digest above df_cap is provably excluded."""
    from ccbot_spark.functions import dedup

    rows = []
    # host A and its full mirror B: identical 20-digest sets
    for d in range(20):
        rows += [("a.test", d), ("b.test", d)]
    # C: half overlap with A
    for d in range(10, 30):
        rows.append(("c.test", d))
    # boilerplate digest 999 on every host incl. 60 singleton hosts —
    # above the cap; without the cap every pair would gain 1 shared
    for k in range(60):
        rows.append((f"s{k}.test", 999))
    for h in ("a.test", "b.test", "c.test"):
        rows.append((h, 999))
    df = spark.createDataFrame(rows, "host string, digest long")
    got = {
        (r.host_a, r.host_b): (r.shared, r.jaccard_milli)
        for r in dedup.mirror_hosts(df, min_shared=5, df_cap=8).collect()
    }

    # brute force on the capped universe
    from collections import defaultdict
    sets = defaultdict(set)
    by_digest = defaultdict(set)
    for h, d in rows:
        by_digest[d].add(h)
    for h, d in rows:
        if len(by_digest[d]) <= 8:
            sets[h].add(d)
    want = {}
    hosts = sorted(sets)
    for i, ha in enumerate(hosts):
        for hb in hosts[i + 1:]:
            sh = len(sets[ha] & sets[hb])
            if sh >= 5:
                want[(ha, hb)] = (sh, sh * 1000 // len(sets[ha] | sets[hb]))
    assert got == want
    # sanity on the planted structure
    assert got[("a.test", "b.test")] == (20, 1000)   # exact mirror
    assert got[("a.test", "c.test")][0] == 10        # half overlap
    assert all(999 not in sets[h] or False for h in ()) or True


def test_mirror_hosts_cap_is_load_bearing(spark):
    """With the cap disabled the boilerplate digest creates pairs that
    must NOT appear in the capped result."""
    from ccbot_spark.functions import dedup

    rows = [(f"x{k}.test", d) for k in range(6) for d in [999] * 5]
    # 6 hosts sharing only one boilerplate digest repeated 5× (distinct
    # collapses it to one); plus real content so hosts aren't empty
    rows += [(f"x{k}.test", 100 + k) for k in range(6)]
    df = spark.createDataFrame(rows, "host string, digest long")
    capped = dedup.mirror_hosts(df, min_shared=1, df_cap=3).collect()
    uncapped = dedup.mirror_hosts(df, min_shared=1, df_cap=100).collect()
    assert capped == []          # shared digest dropped (6 hosts > cap 3)
    assert len(uncapped) == 15   # all C(6,2) pairs share digest 999


# ------------------------------------------------- byte-budgeted plan

def test_byte_budget_plan_matches_bruteforce(spark):
    from ccbot_spark.operators import politeness

    rows = []
    for h in range(5):
        for i in range(30):
            rows.append((
                f"h{h}.test",
                f"https://h{h}.test/p/{i:02d}",
                (i * 37) % 101,
                300 + (i * 13) % 900 + (20000 if (h == 2 and i == 7) else 0),
            ))
    df = spark.createDataFrame(
        rows, "host string, url string, priority long, est_bytes long"
    )
    got = {
        (r.host, r.url): (r.cum_bytes, r.rnk)
        for r in politeness.byte_budget_plan(df, budget_bytes=4000).collect()
    }

    want = {}
    from collections import defaultdict
    per = defaultdict(list)
    for h, u, p, b in rows:
        per[h].append((-p, u, b))
    for h, cands in per.items():
        cum = 0
        for rnk, (_, u, b) in enumerate(sorted(cands), start=1):
            cum += b
            if cum <= 4000 or rnk == 1:
                want[(h, u)] = (cum, rnk)
    assert got == want
    # the host whose top candidate alone blows the budget still fetches it
    h2_kept = [k for k in got if k[0] == "h2.test"]
    assert any(got[k][1] == 1 for k in h2_kept)
    # and h2 keeps ONLY rank-1 iff its top candidate exceeds budget alone
    top_h2 = min((r for r in want if r[0] == "h2.test"), key=lambda k: want[k][1])
    if want[top_h2][0] > 4000:
        assert h2_kept == [top_h2]


def test_caption_cap_two_phase_equals_single_window(spark):
    # 60-row hot caption (whitespace/case variants) + near-unique
    # tails; the salted two-phase winner set must equal a brute
    # single-ranking, freq counts the NORMALIZED key, keep ≤ k per
    # caption with best-area-first order
    rows = []
    for i in range(60):
        cap = ["a photo", "A  photo", " a photo  ", "A PHOTO"][i % 4]
        rows.append((f"hot-{i:02d}", cap, 100 + i))
    for i in range(40):
        rows.append((f"uniq-{i:02d}", f"caption number {i}", 50))
    df = spark.createDataFrame(rows, "image_id string, caption string, area long")
    out = {r.image_id: r for r in multimodal.caption_cap(df, k=3).collect()}
    assert len(out) == 100
    hot = [r for r in out.values() if r.cap_norm == "a photo"]
    assert len(hot) == 60 and all(r.cap_freq == 60 for r in hot)
    kept_hot = sorted(r.image_id for r in hot if r.keep == 1)
    # brute: top-3 by (area desc, image_id) == the 3 largest areas
    want = sorted(
        (f"hot-{i:02d}" for i in range(60)),
        key=lambda k_: (-(100 + int(k_[4:])), k_),
    )[:3]
    assert kept_hot == sorted(want)
    for r in out.values():
        if r.image_id.startswith("uniq"):
            assert r.keep == 1 and r.cap_freq == 1


def test_svg_meta_sniffs_dims_and_stays_jvm_side(spark):
    cases = [
        ("attr", '<svg width="640" height="480"><rect/></svg>', 1, 640, 480, 0),
        ("prolog_vb", '<?xml version="1.0"?>\n<svg viewBox="0 0 24 32"><path/></svg>', 1, 24, 32, 1),
        ("pct", '<svg width="100%" height="50%"><g/></svg>', 1, None, None, 0),
        ("w_only", '<svg width="77" fill="red"><g/></svg>', 1, 77, None, 0),
        ("attr_wins", '<svg width="10" height="20" viewBox="0 0 99 98"/>', 1, 10, 20, 0),
        ("spacey", '  \n <svg><circle/></svg>', 1, None, None, 0),
        ("html", "<html><body>not svg</body></html>", 0, None, None, None),
        ("plainsvg_word", "the word svg appears but no tag", 0, None, None, None),
    ]
    df = spark.createDataFrame(
        [(c[0], c[1]) for c in cases], "image_id string, body string"
    )
    out = {r.image_id: r for r in multimodal.svg_meta(df).collect()}
    for name, _b, is_svg, w, h, fvb in cases:
        r = out[name]
        assert (r.is_svg, r.svg_w, r.svg_h, r.from_viewbox) == (is_svg, w, h, fvb), name
    # the whole parse must stay JVM-side: no Python eval node of any kind
    plan = multimodal.svg_meta(df)._jdf.queryExecution().executedPlan().toString()
    for pynode in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert pynode not in plan, pynode


def test_extract_hreflang_jvm_side_and_attribute_strict(spark):
    # order-insensitive attributes, decoys without hreflang or href
    # dropped, non-alternate links ignored, all-JVM plan
    from ccbot_spark.operators import fetchparse

    html = (
        '<html><head>'
        '<link rel="alternate" hreflang="en" href="https://e.x/en">'
        '<link rel="alternate" href="https://e.x/feed">'          # no hreflang
        '<link rel="alternate" hreflang="pt-BR" href="https://e.x/pt">'
        '<link rel="stylesheet" href="https://e.x/css">'          # not alternate
        '<link rel="alternate" hreflang="de">'                    # no href
        '</head></html>'
    )
    df = spark.createDataFrame(
        [("https://e.x/", html), ("https://e.y/", "<html>no links</html>")],
        "page_url string, html string",
    )
    out = fetchparse.extract_hreflang(df)
    rows = sorted((r.page_url, r.hreflang, r.alt_url) for r in out.collect())
    assert rows == [
        ("https://e.x/", "en", "https://e.x/en"),
        ("https://e.x/", "pt-BR", "https://e.x/pt"),
    ]
    plan = out._jdf.queryExecution().executedPlan().toString()
    for pynode in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert pynode not in plan, pynode


def test_exif_gps_audit_detects_and_scrub_clears(spark):
    # GPS pointer found exactly where planted (both byte-order-safe
    # walks share TIFF parsing); orientation-only EXIF is has_exif
    # without has_gps; scrubbing then re-auditing must report zeros
    from ccbot_spark import codecs

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(18, 22, 3), dtype=np.uint8)
    base = codecs.encode_jpeg(img)
    gps = multimodal.inject_jpeg_app1(base, codecs.exif_app1(3, gps=True))
    gps_only = multimodal.inject_jpeg_app1(base, codecs.exif_app1(None, gps=True))
    orient = multimodal.inject_jpeg_app1(base, codecs.exif_app1(6))
    df = spark.createDataFrame(
        [("gps", gps), ("gpsonly", gps_only), ("orient", orient),
         ("bare", base), ("png", codecs.encode_png(img))],
        "image_id string, bytes binary",
    )
    out = {r.image_id: (r.has_exif, r.has_gps)
           for r in multimodal.exif_gps_audit(df).collect()}
    assert out == {
        "gps": (1, 1), "gpsonly": (1, 1), "orient": (1, 0),
        "bare": (0, 0), "png": (0, 0),
    }
    # the gps-stamped stream still decodes and the orientation tag in
    # the combined IFD0 still reads back (exif walk shares the IFD)
    assert multimodal._jpeg_exif_walk(gps)[2] == 3
    np.testing.assert_array_equal(codecs.decode_jpeg(gps), codecs.decode_jpeg(base))
    # scrub → audit must be all zeros
    scrubbed = multimodal.strip_image_metadata(df)
    out2 = {r.image_id: (r.has_exif, r.has_gps)
            for r in multimodal.exif_gps_audit(scrubbed).collect()}
    assert all(v == (0, 0) for v in out2.values())


def test_anchor_postings_two_phase_equals_brute(spark):
    # hot term ('click') with 30 targets vs k=3: serialized postings
    # must equal a brute python ranking; df counts distinct targets
    from ccbot_spark.operators import fetchparse

    pairs = []
    for t in range(30):
        for _ in range(t % 5 + 1):  # target t has t%5+1 'click' anchors
            pairs.append((f"u{t:02d}", "click here"))
    pairs.append(("u99", "rare"))
    df = spark.createDataFrame(pairs, "href string, anchor string")
    out = {r.term: r for r in fetchparse.anchor_postings(df, k=3).collect()}
    assert out["rare"].df == 1 and out["rare"].postings == "u99:1"
    assert out["click"].df == 30 and out["here"].df == 30
    brute = sorted(
        ((t % 5 + 1, f"u{t:02d}") for t in range(30)),
        key=lambda x: (-x[0], x[1]),
    )[:3]
    want = "|".join(f"{u}:{c}" for c, u in brute)
    assert out["click"].postings == want == out["here"].postings


# ------------------------------------------------------------ bm25
def test_bm25_matches_python_twin(docs):
    from ccbot_spark.functions import textkit as tk

    terms = ("scan", "merge", "hash")
    rows = [(r.doc_id, r.text) for r in docs.select("doc_id", "text").collect()]
    want = tk.bm25_scores_py(rows, terms)
    got = {
        r.doc_id: r.bm25_micro
        for r in tk.bm25_scores(docs, terms=terms).collect()
    }
    assert got == want


def test_bm25_plan_one_scan_no_python(docs):
    # the whole score is JVM expressions: no BatchEvalPython /
    # ArrowEvalPython stage; the stats side reaches the join as a
    # broadcast, not a shuffle
    from ccbot_spark.functions import textkit as tk
    from ccbot_spark.plans import explainkit

    out = tk.bm25_scores(docs, terms=("scan", "merge"))
    plan = explainkit.simple_plan(out)
    assert "EvalPython" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_bm25_idf_orders_rare_above_common(docs):
    # a rarer term must carry a larger idf_permil than a more common
    # one: two docs with the same single-occurrence tf for different
    # terms score in df order
    from ccbot_spark.functions import textkit as tk

    terms = ("scan", "merge", "hash")
    rows = [(r.doc_id, r.text) for r in docs.select("doc_id", "text").collect()]
    toked = {d: [t for t in txt.lower().split(" ") if t] for d, txt in rows}
    n = len(toked)
    dfs = {w: sum(1 for v in toked.values() if w in v) for w in terms}
    idf = {w: ((2 * (n - dfs[w]) + 1) * 1000) // (2 * dfs[w] + 1) for w in terms}
    ranked = sorted(terms, key=lambda w: dfs[w])
    assert idf[ranked[0]] >= idf[ranked[1]] >= idf[ranked[2]]


# ------------------------------------------------------------ BPE train
def test_bpe_train_matches_python_twin(docs):
    from ccbot_spark.functions import textkit as tk

    texts = [r.text for r in docs.select("text").collect()]
    want = tk.bpe_train_py(texts, n_merges=6)
    got = [
        (r.step, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in tk.bpe_train(docs, n_merges=6).orderBy("step").collect()
    ]
    assert got == want


def test_bpe_train_known_corpus(spark):
    # the Sennrich toy shape: 'low'×5 + 'lower'×2 + 'newest'×6 +
    # 'widest'×3 — classic first merges are (e,s) then (es,t)
    from ccbot_spark.functions import textkit as tk

    corpus = ["low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3]
    df = spark.createDataFrame([(0, corpus[0].strip())], "doc_id long, text string")
    got = [
        (r.step, r.merged, r.pair_count)
        for r in tk.bpe_train(df, n_merges=3).orderBy("step").collect()
    ]
    assert got[0] == (1, "es", 9)
    assert got[1] == (2, "est", 9)
    want = tk.bpe_train_py([corpus[0].strip()], n_merges=3)
    assert got == [(s, m, c) for s, _l, _r, m, c in want]


def test_bpe_fixed_passes_equal_true_bpe_on_fixture(docs):
    # on natural-length words the 4-pass replace rule coincides with
    # textbook left-to-right non-overlapping BPE merging — check the
    # learned merge TABLE is identical to a true-BPE trainer's
    from collections import Counter

    from ccbot_spark.functions import textkit as tk

    texts = [r.text for r in docs.select("text").collect()]

    def true_bpe(texts, n_merges):
        words = Counter(t for txt in texts for t in txt.lower().split(" ") if t)
        syms = {w: list(w) for w in words}
        out = []
        for step in range(1, n_merges + 1):
            counts = Counter()
            for w, ts in syms.items():
                for a, b in zip(ts, ts[1:]):
                    counts[(a, b)] += words[w]
            if not counts:
                break
            pr = min(counts, key=lambda p: (-counts[p], f"{p[0]} {p[1]}"))
            out.append((step, pr[0], pr[1], pr[0] + pr[1], counts[pr]))
            for w, ts in syms.items():
                i, new = 0, []
                while i < len(ts):
                    if i + 1 < len(ts) and (ts[i], ts[i + 1]) == pr:
                        new.append(ts[i] + ts[i + 1])
                        i += 2
                    else:
                        new.append(ts[i])
                        i += 1
                syms[w] = new
        return out

    assert tk.bpe_train_py(texts, n_merges=6) == true_bpe(texts, 6)


# ------------------------------------------------------------ keywords
def test_keywords_topk_matches_python(docs):
    from collections import Counter

    from ccbot_spark.functions import textkit as tk

    rows = [(r.doc_id, r.text) for r in docs.select("doc_id", "text").collect()]
    toked = {
        d: [
            t
            for t in txt.lower().split(" ")
            if t and t not in tk.STOPWORDS
        ]
        for d, txt in rows
    }
    n = len(rows)
    tf = {d: Counter(v) for d, v in toked.items()}
    df_t = Counter(t for d in tf for t in tf[d])
    want = {}
    for d in toked:
        scored = sorted(
            (
                (
                    -(tf[d][t] * (((2 * (n - df_t[t]) + 1) * 1000) // (2 * df_t[t] + 1))),
                    t,
                )
                for t in tf[d]
            )
        )[:3]
        want[d] = [(t, -s) for s, t in scored]
    got = {}
    for r in (
        tk.keywords_topk(docs, k=3).orderBy("doc_id", "kw_rank").collect()
    ):
        got.setdefault(r.doc_id, []).append((r.tok, r.score_permil))
    assert got == want


def test_keywords_exclude_stopwords_and_bound_k(docs):
    from ccbot_spark.functions import textkit as tk

    out = tk.keywords_topk(docs, k=2).collect()
    assert all(r.tok not in tk.STOPWORDS for r in out)
    from collections import Counter

    per_doc = Counter(r.doc_id for r in out)
    assert max(per_doc.values()) <= 2


# ------------------------------------------------------------ funnel
def test_funnel_matches_python(spark):
    import datetime as dt

    from ccbot_spark.functions import eventops

    rows = []
    # user 0: full ordered funnel; user 1: click before view (stage 1
    # unless a later click follows); user 2: view only; user 3: none
    base = dt.datetime(2020, 1, 1)
    ev = [
        (0, "view", 0), (0, "click", 10), (0, "purchase", 20),
        (1, "click", 0), (1, "view", 5), (1, "purchase", 8),
        (2, "view", 3),
        (3, "error", 1),
        # user 4: purchase BETWEEN view and click — must not count
        (4, "view", 0), (4, "purchase", 1), (4, "click", 2),
    ]
    for u, t, s in ev:
        rows.append((u, t, base + dt.timedelta(seconds=s)))
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp_ntz"
    )
    got = {
        r.user_id: (r.t1_us, r.t2_us, r.t3_us, r.stage)
        for r in eventops.funnel(df).collect()
    }
    us = lambda s: s * 1_000_000 + int(
        base.replace(tzinfo=dt.timezone.utc).timestamp()
    ) * 1_000_000
    assert got[0] == (us(0), us(10), us(20), 3)
    # user 1: view@5, no click after 5 → stage 1
    assert got[1] == (us(5), -1, -1, 1)
    assert got[2] == (us(3), -1, -1, 1)
    assert got[3] == (-1, -1, -1, 0)
    # user 4: view@0, click@2, purchase@1 is BEFORE the click → stage 2
    assert got[4] == (us(0), us(2), -1, 2)


def test_funnel_stage_counts_monotone(spark, sf_dir):
    from ccbot_spark.functions import eventops

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = eventops.funnel(ev).collect()
    n = {s: sum(1 for r in out if r.stage >= s) for s in (1, 2, 3)}
    assert n[1] >= n[2] >= n[3] > 0


# ------------------------------------------------------------ collocations
def test_collocations_match_python(docs):
    from collections import Counter

    from ccbot_spark.functions import textkit as tk

    texts = [r.text for r in docs.select("text").collect()]
    uni, bi, b_total = Counter(), Counter(), 0
    for t in texts:
        ts = [w for w in t.lower().split(" ") if w]
        uni.update(ts)
        bi.update(zip(ts, ts[1:]))
        b_total += max(len(ts) - 1, 0)
    t_total = sum(uni.values())
    scored = []
    for (a, b), cab in bi.items():
        if cab >= 5:
            ppm = (((1000000 * cab * t_total) // (b_total * uni[a])) * t_total) // uni[b]
            scored.append((-ppm, a, b, cab))
    scored.sort()
    want = [(a, b, c, -n) for n, a, b, c in scored[:50]]
    got = [
        (r.w1, r.w2, r.pair_count, r.pmi_ratio_ppm)
        for r in tk.collocations_topk(docs, k=50, min_count=5).collect()
    ]
    assert got == want


# ------------------------------------------------------------ incremental dedup
def test_incremental_dedup_statuses(spark):
    from ccbot_spark.functions import dedup as dd

    prior = spark.createDataFrame(
        [(1, "aaa"), (2, "bbb")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(10, "aaa"), (11, "ccc"), (12, "ccc"), (13, "ddd")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.status
        for r in dd.incremental_dedup(
            prior, batch, digest=F.md5(F.col("text"))
        ).collect()
    }
    assert out == {10: "prior_dup", 11: "kept", 12: "batch_dup", 13: "kept"}


def test_incremental_dedup_kept_set_grows_correctly(docs):
    # union(prior digests, kept batch digests) must equal the distinct
    # digest set of the whole corpus — nothing lost, nothing duplicated
    from ccbot_spark.functions import dedup as dd

    dg = F.md5(F.array_join(F.slice(F.split(F.col("text"), " "), 1, 5), " "))
    prior = docs.filter(F.col("doc_id") < 400)
    batch = docs.filter(F.col("doc_id") >= 400)
    out = dd.incremental_dedup(prior, batch, digest=dg)
    kept = {r.digest for r in out.filter(F.col("status") == "kept").collect()}
    prior_dgs = {r.d for r in prior.select(dg.alias("d")).distinct().collect()}
    all_dgs = {r.d for r in docs.select(dg.alias("d")).distinct().collect()}
    assert prior_dgs | kept == all_dgs
    assert not (prior_dgs & kept)


# ------------------------------------------------------------ cohorts
def test_cohort_retention_matches_python(spark, sf_dir):
    from collections import Counter, defaultdict

    from ccbot_spark.functions import eventops

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = {
        (r.cohort_day, r.day_offset): r.n_users
        for r in eventops.cohort_retention(ev).collect()
    }
    import datetime as dt

    days = defaultdict(set)
    for r in ev.select("user_id", "ts").collect():
        us = int(
            r.ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000
        )
        days[r.user_id].add(us // 86_400_000_000)
    want = Counter()
    for u, ds in days.items():
        c = min(ds)
        for d in ds:
            want[(c, d - c)] += 1
    assert got == dict(want)
    # offset-0 row of each cohort counts the whole cohort: it must be
    # the max over that cohort's offsets
    for (c, off), n in got.items():
        assert n <= got[(c, 0)]


# ------------------------------------------------------------ gini
def test_gini_extremes(spark):
    # perfectly even counts -> G = 0; one host hogs everything -> G
    # near (n-1)/n
    from ccbot_spark.operators import sequencing

    def gini_ppm(counts):
        n = len(counts)
        xs = sorted(counts)
        total = sum(xs)
        rw = sum((i + 1) * x for i, x in enumerate(xs))
        return (2 * rw - (n + 1) * total) * 1_000_000 // (n * total)

    assert gini_ppm([5, 5, 5, 5]) == 0
    n = 10
    g = gini_ppm([0] * 0 + [1] * (n - 1) + [991])  # near-total hog
    assert g > 800_000
    # the Spark path over a tiny frame equals the python fold
    df = spark.createDataFrame(
        [("h%d" % i, x) for i, x in enumerate([1, 2, 3, 14])],
        "host string, x long",
    )
    ranked, _n, cache = sequencing.global_sequence(df, ["x", "host"], 4)
    row = ranked.selectExpr(
        "count(*) AS n", "sum(x) AS t", "sum((seq + 1) * x) AS rw"
    ).first()
    cache.unpersist()
    got = (2 * row.rw - (row.n + 1) * row.t) * 1_000_000 // (row.n * row.t)
    assert got == gini_ppm([1, 2, 3, 14])


def test_reciprocity_counts(spark):
    from pyspark.sql import functions as SF

    edges = [(1, 2), (2, 1), (1, 3), (3, 4), (4, 3), (4, 5)]
    e = spark.createDataFrame(edges, "src long, dst long").distinct()
    rev = e.select(SF.col("dst").alias("src"), SF.col("src").alias("dst")) \
        .withColumn("_r", SF.lit(1))
    got = {
        r.src: (r.n_out, r.n_recip)
        for r in e.join(rev, ["src", "dst"], "left")
        .groupBy("src")
        .agg(
            SF.count("*").alias("n_out"),
            SF.sum(SF.col("_r").isNotNull().cast("long")).alias("n_recip"),
        )
        .collect()
    }
    assert got == {1: (2, 1), 2: (1, 1), 3: (1, 1), 4: (2, 1)}


def test_bpe_segment_matches_python_and_compresses(docs):
    from collections import Counter

    from ccbot_spark.functions import textkit as tk

    texts = [r.text for r in docs.select("text").collect()]
    # python twin of the segmentation table
    words = Counter(t for txt in texts for t in txt.lower().split(" ") if t)
    syms = {w: " ".join(w) for w in words}
    for _s, l, r, _m, _c in tk.bpe_train_py(texts, n_merges=6):
        pat, rep = f" {l} {r} ", f" {l}{r} "
        for w in syms:
            padded = f" {syms[w]} "
            for _ in range(tk.BPE_REPLACE_PASSES):
                padded = padded.replace(pat, rep)
            syms[w] = padded.strip(" ")
    want = {
        w: (words[w], len(w), len(syms[w].split(" "))) for w in words
    }
    got = {
        r.w: (r.n_occurrences, r.n_chars_w, r.n_symbols)
        for r in tk.bpe_segment(docs, n_merges=6).collect()
    }
    tk.clear_bpe_caches()
    assert got == want
    # merges must strictly compress the corpus token count
    before = sum(n * c for n, c, _s in want.values())
    after = sum(n * s for n, _c, s in want.values())
    assert after < before


# ------------------------------------------------------------ group quantiles
def test_group_quantiles_match_python(spark, sf_dir):
    from ccbot_spark.functions import eventops

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "cents", F.round(F.col("value") * 100).cast("long")
    )
    got = {
        r.event_type: (r.n_rows, r.p50_cents, r.p90_cents, r.p99_cents)
        for r in eventops.group_quantiles(
            ev, "event_type", "cents", "event_id"
        ).collect()
    }
    rows = ev.select("event_type", "cents", "event_id").collect()
    from collections import defaultdict

    per = defaultdict(list)
    for r in rows:
        per[r.event_type].append((r.cents, r.event_id))
    want = {}
    for t, xs in per.items():
        xs.sort()
        n = len(xs)
        pick = lambda p: xs[(p * n + 99) // 100 - 1][0]
        want[t] = (n, pick(50), pick(90), pick(99))
    assert got == want


def test_group_quantiles_never_single_partition(spark, sf_dir):
    from ccbot_spark.functions import eventops

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "cents", F.round(F.col("value") * 100).cast("long")
    )
    out = eventops.group_quantiles(ev, "event_type", "cents", "event_id")
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in p, p


def test_crawl_focus_plan_is_sum_of_parts(spark, sf_dir):
    import __spark_entry__ as entry

    qs = entry.queries()
    plan = {
        r.doc_id: r.priority_micro
        for r in qs["crawl_focus_plan"](spark, sf_dir).collect()
    }
    bm = {
        r.doc_id: r.bm25_micro
        for r in qs["text_bm25"](spark, sf_dir).collect()
    }
    entry.clear_caches()
    assert set(plan) == set(bm)
    # proximity component is non-negative and positive for seeds'
    # graph neighborhood; the plan never drops below content relevance
    assert all(plan[d] >= bm[d] for d in plan)
    assert any(plan[d] > bm[d] for d in plan)


# ------------------------------------------------------------ last batch
def test_vocab_coverage_bounds_and_python(docs):
    from collections import Counter

    import __spark_entry__ as entry

    got = {
        r.doc_id: (r.n_tokens, r.n_covered, r.coverage_ppm)
        for r in entry.queries()["text_vocab_coverage"](
            docs.sparkSession, SF
        ).collect()
    }
    entry.clear_caches()
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    cnt = Counter(
        t for txt in texts.values() for t in txt.lower().split(" ") if t
    )
    top30 = {
        t for t, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    }
    for d, txt in texts.items():
        ts = [t for t in txt.lower().split(" ") if t]
        cov = sum(1 for t in ts if t in top30)
        assert got[d] == (len(ts), cov, cov * 1_000_000 // len(ts))


def test_gap_histogram_total_and_buckets(spark, sf_dir):
    import __spark_entry__ as entry

    out = entry.queries()["a_gap_histogram"](spark, sf_dir).collect()
    entry.clear_caches()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n_gaps for r in out) == n_events - n_users
    for r in out:
        if r.log2_bucket > 0:
            assert (1 << (r.log2_bucket - 1)) <= r.max_gap_s
            assert r.min_gap_s < (1 << r.log2_bucket)


def test_bootstrap_replicates_independent_and_rate(spark, sf_dir):
    import __spark_entry__ as entry

    rows = entry.queries()["sample_bootstrap"](spark, sf_dir).collect()
    entry.clear_caches()
    from collections import defaultdict

    per = defaultdict(set)
    for r in rows:
        per[r.replicate].add(r.doc_id)
    assert set(per) == set(range(8))
    n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    for rep, ds in per.items():
        assert 0.5 * n < len(ds) < 0.75 * n  # ~63% draw
    # replicates differ (independent redraws)
    assert len({frozenset(v) for v in per.values()}) == 8
