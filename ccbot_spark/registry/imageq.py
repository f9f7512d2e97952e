"""Image / multimodal queries: decode pipeline, header
sniffing (PNG/BMP/JPEG/GIF dims), phash near-dup + blocklist,
curation gates, joint multimodal dedup + keeper, letterbox geometry,
PNG scrub, hash family, size/aspect profiles, exact dedup, WDS shard
planning."""
# Split from __spark_entry__.py (round 5): driver-facing surface
# (entry/queries/oracle_sql/clear_caches) unchanged; this module
# contributes its domain's entries via register()/register_sql().
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql import types as T  # noqa: F401
from pyspark.sql.window import Window  # noqa: F401

from ccbot_spark.functions import (  # noqa: F401
    dedup,
    eventops,
    linkrank,
    multimodal,
    sampling,
    similarity,
    textkit,
)
from ccbot_spark.operators import urlops  # noqa: F401
from ccbot_spark.registry.common import (  # noqa: F401
    _ACTIVE_CACHES,
    _COS,
    _DOC_URLS,
    _EMB_D,
    _MIXED_URLS,
    _SHINGLES,
    _STOP_SQL,
    _cents,
    _doc_urls,
    _mixed_scheme_urls,
    _sql_h64,
    _sql_hmod,
    _t,
    q_a_metrics,
)


def register(q):

    def img_pipeline(spark, sf_dir):
        docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
        return multimodal.decode_features(multimodal.synth_images_from_docs(docs))
    q["img_pipeline"] = img_pipeline

    def img_phash_near(spark, sf_dir):
        # Exercises multimodal.phash_near_pairs (the banded Hamming
        # join) through an ORACLED path: phashes are synthesized
        # JVM-side from md5 so DuckDB reproduces them exactly —
        # doc_id % 150 gives planted near-dup pairs (one flipped bit),
        # bypassing only the binary decode step (which keeps its
        # pixel-exact pytest + the rows-only img_pipeline entry).
        d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
        hx = F.md5(F.concat(F.lit("img:"), (F.col("doc_id") % 150).cast("string")))
        # two 31-bit halves → base phash < 2^62 (no int64 overflow in
        # either engine); docs ≥150 repeat an earlier base with ONE
        # bit flipped → hamming-1 planted pairs
        hi = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long") % F.lit(2147483648)
        lo = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long") % F.lit(2147483648)
        flip = F.when(
            F.col("doc_id") >= 150,
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(doc_id % 13 AS INT))"),
        ).otherwise(F.lit(0).cast("long"))
        ph = d.select(
            F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("image_id"),
            (hi * F.lit(2147483648) + lo).bitwiseXOR(flip).alias("phash"),
        )
        return multimodal.phash_near_pairs(ph, max_ham=6)
    q["img_phash_near"] = img_phash_near

    def img_dedup_eval(spark, sf_dir):
        # measure, don't guess (image side): precision/recall of the
        # banded phash near-dup detector against the PLANTED ground
        # truth of its own fixture — pairs (doc-i, doc-i+150), i < 50,
        # are hamming-1 twins by construction. Expected: recall 1000
        # (8-band join is pigeonhole-complete ≤ 7 bits ≥ the planted
        # 1) with precision < 1000 iff md5 chance puts unrelated
        # hashes within hamming 6 — the oracle recomputes detector AND
        # truth, so the measured numbers are engine-exact, not vibes.
        det = (
            img_phash_near(spark, sf_dir)
            .select("img_a", "img_b")
            .distinct()
            .withColumn("det", F.lit(1))
        )
        d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
        ida = F.concat(F.lit("doc-"), F.col("doc_id").cast("string"))
        idb = F.concat(F.lit("doc-"), (F.col("doc_id") + 150).cast("string"))
        planted = d.select(
            F.least(ida, idb).alias("img_a"),
            F.greatest(ida, idb).alias("img_b"),
            F.lit(1).alias("pl"),
        )
        j = det.join(planted, ["img_a", "img_b"], "full")
        return j.agg(
            F.sum(F.when(F.col("det").isNotNull() & F.col("pl").isNotNull(),
                         1).otherwise(0)).alias("tp"),
            F.sum(F.when(F.col("det").isNotNull() & F.col("pl").isNull(),
                         1).otherwise(0)).alias("fp"),
            F.sum(F.when(F.col("det").isNull() & F.col("pl").isNotNull(),
                         1).otherwise(0)).alias("fn"),
        ).select(
            (F.col("tp") + F.col("fp")).cast("long").alias("n_detected"),
            (F.col("tp") + F.col("fn")).cast("long").alias("n_planted"),
            F.col("tp").cast("long").alias("tp"),
            F.col("fp").cast("long").alias("fp"),
            F.col("fn").cast("long").alias("fn"),
            F.expr("(tp * 1000) div (tp + fp)").cast("long")
            .alias("precision_milli"),
            F.expr("(tp * 1000) div (tp + fn)").cast("long")
            .alias("recall_milli"),
        )
    q["img_dedup_eval"] = img_dedup_eval

    def img_blocklist(spark, sf_dir):
        # the PhotoDNA-style moderation gate: images whose phash falls
        # within Hamming ≤ 1 of a curated bad-hash list are flagged
        # (and dropped from the kept set). Phash synthesis reuses the
        # img_phash_near md5 idiom (bases 0..149, docs ≥150 repeat a
        # base with ONE flipped bit); the blocklist holds the bases of
        # doc_id % 7 == 0 under 50, so each bad hash flags its exact
        # image (ham 0) AND its planted near-dup (ham 1). The banded
        # prefilter is complete for this radius (pigeonhole ≤ 3).
        d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
        hx = F.md5(F.concat(F.lit("img:"), (F.col("doc_id") % 150).cast("string")))
        hi = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long") % F.lit(2147483648)
        lo = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long") % F.lit(2147483648)
        flip = F.when(
            F.col("doc_id") >= 150,
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(doc_id % 13 AS INT))"),
        ).otherwise(F.lit(0).cast("long"))
        ph = d.select(
            F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("image_id"),
            (hi * F.lit(2147483648) + lo).bitwiseXOR(flip).alias("phash"),
        )
        bl = (
            _t(spark, sf_dir, "documents")
            .filter((F.col("doc_id") < 50) & (F.col("doc_id") % 7 == 0))
            .select(
                F.col("doc_id").cast("string").alias("_k")
            )
            .select(F.md5(F.concat(F.lit("img:"), F.col("_k"))).alias("_h"))
            .select(
                (
                    (F.conv(F.substring(F.col("_h"), 1, 8), 16, 10).cast("long")
                     % F.lit(2147483648)) * F.lit(2147483648)
                    + F.conv(F.substring(F.col("_h"), 9, 8), 16, 10).cast("long")
                    % F.lit(2147483648)
                ).alias("bad_phash")
            )
        )
        return multimodal.phash_blocklist_filter(ph, bl, max_ham=1)["flagged"]
    q["img_blocklist"] = img_blocklist

    def img_curation(spark, sf_dir):
        # LAION-style image-text curation over the input-hint image
        # table shape (image_id, w, h, caption): dims + captions are
        # synthesized JVM-side from md5/doc_id so DuckDB reproduces
        # them exactly; the gates (multimodal.curation_features) are
        # pure metadata column exprs — resolution floor, integer
        # aspect-ratio cap, caption word band, boilerplate reject.
        d = _t(spark, sf_dir, "documents")
        hx = F.md5(F.concat(F.lit("dim:"), F.col("doc_id").cast("string")))
        w = (F.conv(F.substring(hx, 1, 8), 16, 10).cast("long") % 481 + 32).cast("int")
        h = (F.conv(F.substring(hx, 9, 8), 16, 10).cast("long") % 481 + 32).cast("int")
        cap = F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(F.lit("IMG_"), F.col("doc_id").cast("string")),
        ).otherwise(F.expr("substr(text, 1, CAST(doc_id % 120 + 1 AS INT))"))
        meta = d.select(
            F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("image_id"),
            w.alias("w"),
            h.alias("h"),
            cap.alias("caption"),
        )
        return multimodal.curation_features(meta)
    q["img_curation"] = img_curation

    def img_mm_dedup(spark, sf_dir):
        # multimodal joint dedup: perceptual phash-band near pairs ∪
        # exact-caption star edges → connected components (min-id
        # keeper). Phashes use the img_phash_near md5 synthesis
        # (doc_id % 150 plants hamming-1 pairs); captions collide on
        # doc_id % 120 — the two modalities chain DIFFERENT doc pairs,
        # so clusters only emerge from the joint graph.
        d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
        hx = F.md5(F.concat(F.lit("img:"), (F.col("doc_id") % 150).cast("string")))
        hi = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long") % F.lit(2147483648)
        lo = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long") % F.lit(2147483648)
        flip = F.when(
            F.col("doc_id") >= 150,
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(doc_id % 13 AS INT))"),
        ).otherwise(F.lit(0).cast("long"))
        meta = d.select(
            F.col("doc_id").cast("long").alias("image_id"),
            (hi * F.lit(2147483648) + lo).bitwiseXOR(flip).alias("phash"),
            F.concat(F.lit("cap-"), (F.col("doc_id") % 120).cast("string")).alias(
                "caption"
            ),
        )
        edges = multimodal.mm_dedup_edges(meta)
        return dedup.connected_components(edges, "img_a", "img_b")
    q["img_mm_dedup"] = img_mm_dedup

    def img_mm_keeper(spark, sf_dir):
        # the multimodal dedup ENDGAME: joint phash∪caption clusters →
        # one keeper per cluster, highest-resolution member wins
        # (area = w·h from the img_curation md5 dim synthesis),
        # unclustered images kept as singletons
        d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
        hx = F.md5(F.concat(F.lit("img:"), (F.col("doc_id") % 150).cast("string")))
        hi = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long") % F.lit(2147483648)
        lo = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long") % F.lit(2147483648)
        flip = F.when(
            F.col("doc_id") >= 150,
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(doc_id % 13 AS INT))"),
        ).otherwise(F.lit(0).cast("long"))
        dx = F.md5(F.concat(F.lit("dim:"), F.col("doc_id").cast("string")))
        w_ = F.conv(F.substring(dx, 1, 8), 16, 10).cast("long") % 481 + 32
        h_ = F.conv(F.substring(dx, 9, 8), 16, 10).cast("long") % 481 + 32
        meta = d.select(
            F.col("doc_id").cast("long").alias("image_id"),
            (hi * F.lit(2147483648) + lo).bitwiseXOR(flip).alias("phash"),
            F.concat(F.lit("cap-"), (F.col("doc_id") % 120).cast("string")).alias(
                "caption"
            ),
            (w_ * h_).cast("long").alias("area"),
        )
        clusters = dedup.connected_components(
            multimodal.mm_dedup_edges(meta), "img_a", "img_b"
        )
        return dedup.keep_best_per_cluster(
            meta.withColumnRenamed("image_id", "doc_id"),
            clusters,
            quality="area",
        )
    q["img_mm_keeper"] = img_mm_keeper

    def img_header_meta(spark, sf_dir):
        # JVM-side binary header parse: container sniffed and dims
        # pulled from the blob's first bytes (PNG IHDR big-endian /
        # PPM ASCII header) with zero Python and zero decode. The
        # synth blobs are a pure function of doc_id (dims =
        # 16 + (doc_id%150)*{7,11} % 97, fmt cycles ppm/png/qpng), so
        # DuckDB re-derives the ENCODED dims arithmetically — a green
        # row proves the binary parse reads back exactly what the
        # codec wrote. qpng is a PNG container, hence 2/3 'png'.
        docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 450)
        imgs = multimodal.synth_images_from_docs(docs)
        return multimodal.header_meta(imgs).select(
            "image_id", "container", "hdr_w", "hdr_h"
        )
    q["img_header_meta"] = img_header_meta

    def img_bmp_meta(spark, sf_dir):
        # the 4-format cycle adds bmp (24-bit BITMAPINFOHEADER): dims
        # are LITTLE-endian i32 at fixed offsets, parsed by per-byte
        # hex reversal + conv — still zero Python, zero decode. The
        # oracle re-derives container + dims from the doc_id synthesis
        # arithmetic (cycle ppm/png/qpng/bmp; qpng is a PNG container).
        docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 450)
        imgs = multimodal.synth_images_from_docs(
            docs, fmts=multimodal.REAL_FMTS
        )
        return multimodal.header_meta(imgs).select(
            "image_id", "container", "hdr_w", "hdr_h"
        )
    q["img_bmp_meta"] = img_bmp_meta

    def img_jpeg_meta(spark, sf_dir):
        # the 5-format cycle adds jpeg (pure-numpy baseline T.81
        # encoder, round 5): container is sniffed from the FFD8FF
        # magic, but JPEG dims live in the SOF segment at a variable
        # offset — `jpeg_sof_dims` (the bounded JVM marker walk) is an
        # INDEPENDENT parser of this repo's own Huffman encoder output,
        # so a green row proves the encoder writes a spec-valid SOF0
        # that a from-scratch reader extracts exactly. Dims for the
        # fixed-offset containers come from header_meta; the two are
        # coalesced into one (w, h) per image.
        from pyspark.sql import functions as F  # noqa: F811
        docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 450)
        imgs = multimodal.synth_images_from_docs(
            docs, fmts=multimodal.ALL_FMTS
        )
        meta = multimodal.header_meta(imgs)
        jdims = multimodal.jpeg_sof_dims(imgs)
        return (
            meta.join(jdims, "image_id", "left")
            .select(
                "image_id",
                "container",
                F.coalesce(F.col("hdr_w"), F.col("jpg_w")).alias("img_w"),
                F.coalesce(F.col("hdr_h"), F.col("jpg_h")).alias("img_h"),
            )
        )
    q["img_jpeg_meta"] = img_jpeg_meta

    def img_gif_meta(spark, sf_dir):
        # the 6-format cycle adds gif (GIF89a palette + pure-python
        # LZW, round 5 — the last container the sniffer recognized
        # without a decoder). Container is sniffed from the
        # GIF87a/GIF89a magic; dims are the little-endian logical-
        # screen u16s at fixed offsets — zero Python, zero decode.
        # The oracle re-derives container + dims from the synthesis
        # arithmetic; jpeg rows still coalesce in the SOF marker walk.
        from pyspark.sql import functions as F  # noqa: F811
        docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 450)
        imgs = multimodal.synth_images_from_docs(
            docs, fmts=multimodal.ALL_FMTS6
        )
        meta = multimodal.header_meta(imgs)
        jdims = multimodal.jpeg_sof_dims(imgs)
        return (
            meta.join(jdims, "image_id", "left")
            .select(
                "image_id",
                "container",
                F.coalesce(F.col("hdr_w"), F.col("jpg_w")).alias("img_w"),
                F.coalesce(F.col("hdr_h"), F.col("jpg_h")).alias("img_h"),
            )
        )
    q["img_gif_meta"] = img_gif_meta

    def img_webp_meta(spark, sf_dir):
        # WebP + TIFF — the two big web image containers outside the
        # closed decodable world, sniffed + measured at header tier
        # (the mp4/webm posture). All three WebP dim encodings are
        # exercised: VP8X 24-bit canvas-1, VP8L packed 14-bit dims-1,
        # lossy VP8 u16 dims — each a different little-endian layout
        # parsed by pure JVM substring/conv arithmetic; TIFF rows
        # sniff by byte-order mark (both orders) with dims NULL→0 (an
        # IFD walk is not fixed-offset). DuckDB re-derives container
        # + dims from the doc_id arithmetic the container writer used.
        from pyspark.sql import functions as F  # noqa: F811
        docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 450)
        blobs = multimodal.synth_webp_tiff_from_docs(docs)
        return multimodal.header_meta(blobs).select(
            "image_id",
            "container",
            F.coalesce(F.col("hdr_w"), F.lit(0)).cast("long").alias("hdr_w"),
            F.coalesce(F.col("hdr_h"), F.lit(0)).cast("long").alias("hdr_h"),
        )
    q["img_webp_meta"] = img_webp_meta

    def img_gif_anim(spark, sf_dir):
        # animation probe: frame count + total duration by BLOCK-
        # STRUCTURE walk alone (descriptors counted, GCE delays
        # summed, LZW skipped by sub-block lengths — no pixel
        # decoded). The fixture's animation writer encodes
        # 1 + doc_id % 5 frames at 4 + doc_id % 7 cs; DuckDB
        # re-derives both, so a green row proves the writer emits
        # spec-valid GCE/descriptor blocks AND the walk reads them
        # back exactly.
        from pyspark.sql import functions as F  # noqa: F811
        docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 450)
        blobs = multimodal.synth_gif_anims_from_docs(docs)
        return multimodal.gif_anim_meta(blobs)
    q["img_gif_anim"] = img_gif_anim

    def img_gif_frames(spark, sf_dir):
        # the GIF→image-pipeline bridge: every 2nd animation frame
        # exploded to its own image row (ppm + dims, id#f<k>). DuckDB
        # re-derives the exploded row set — which frame numbers exist
        # (j ∈ {0,2,4}, j < 1 + doc_id % 5) and each frame's dims —
        # so a green row proves the decode→explode→re-encode plumbing
        # emits exactly the rows the animation writer implies.
        from pyspark.sql import functions as F  # noqa: F811
        docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
        blobs = multimodal.synth_gif_anims_from_docs(docs)
        return multimodal.gif_frames_to_images(blobs, every_n=2).select(
            "image_id",
            F.col("frame_no").cast("long").alias("frame_no"),
            F.col("w").cast("long").alias("w"),
            F.col("h").cast("long").alias("h"),
        )
    q["img_gif_frames"] = img_gif_frames

    def img_tiff_meta(spark, sf_dir):
        # TIFF dims via the bounded IFD walk (the jpeg_sof_dims
        # posture: variable entry position, so a Python head-walk, not
        # a fixed-offset expr). The fixture stamps ImageWidth/
        # ImageLength in IFD0 cycling BOTH byte orders and BOTH value
        # types (SHORT/LONG); webp rows in the same table must answer
        # 0 (non-TIFF → NULL sentinel). DuckDB re-derives everything
        # from the writer arithmetic.
        from pyspark.sql import functions as F  # noqa: F811
        docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 450)
        blobs = multimodal.synth_webp_tiff_from_docs(docs)
        return multimodal.tiff_dims(blobs).select(
            "image_id",
            F.coalesce(F.col("tif_w"), F.lit(0)).cast("long").alias("tif_w"),
            F.coalesce(F.col("tif_h"), F.lit(0)).cast("long").alias("tif_h"),
        )
    q["img_tiff_meta"] = img_tiff_meta

    def img_exif_orient(spark, sf_dir):
        # EXIF orientation (tag 0x0112) — the camera-rotation metadata
        # a training pipeline must honor before any geometry (a 6/8-
        # oriented photo letterboxed by its STORED dims lands in the
        # wrong bucket). The fixture stamps jpeg blobs with an APP1
        # orientation = 1 + doc_id % 8 (doc_id % 4 == 3 stays
        # unstamped — the NULL case), so DuckDB re-derives both the
        # tag and the swap-for-5..8 upright dims arithmetically while
        # Spark must pull them out of the TIFF IFD this repo's own
        # encoder wrote — two independent codepaths (numpy APP1
        # writer, bounded marker-walk + IFD reader) agreeing with
        # pure arithmetic. Pixel-side transforms are pytest-gated
        # (tests/test_exif_orientation.py, lossless-view round trips).
        from pyspark.sql import functions as F  # noqa: F811
        docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 450)
        imgs = multimodal.synth_images_from_docs(
            docs, fmts=("jpeg",), exif_orient=True
        )
        # unstamped → 0 sentinel (a NULL BIGINT renders float64 in
        # DuckDB's fetchdf and can never hash-match an int column)
        return multimodal.jpeg_exif_orient(imgs).select(
            "image_id",
            F.coalesce(F.col("exif_orient"), F.lit(0))
            .cast("long")
            .alias("exif_orient"),
            "up_w",
            "up_h",
        )
    q["img_exif_orient"] = img_exif_orient

    def img_letterbox_plan(spark, sf_dir):
        # training-export letterbox geometry: bucket + target shape +
        # aspect-preserving scaled dims + centered pads, ALL pure JVM
        # integer arithmetic chained on the binary header parse (the
        # pixel stage is a dumb executor of these numbers — pytest
        # covers it pixel-exact). DuckDB replays the same integer
        # formulas from the synthesis arithmetic.
        docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 450)
        meta = multimodal.header_meta(
            multimodal.synth_images_from_docs(docs)
        )
        return multimodal.letterbox_plan(meta, "hdr_w", "hdr_h").select(
            "image_id", "bucket", "out_w", "out_h",
            "scaled_w", "scaled_h", "pad_x", "pad_y",
        )
    q["img_letterbox_plan"] = img_letterbox_plan

    def img_png_scrub(spark, sf_dir):
        # privacy scrub: plant one CRC-correct tEXt chunk (keyword
        # 'Comment', body length doc_id % 23) on every PNG-container
        # row, then strip provenance chunks. The audit counters are
        # pure arithmetic — 12-byte chunk framing + 7+1-byte keyword +
        # body — so DuckDB re-derives exactly how many bytes the scrub
        # must remove per row; ppm rows pass through untouched.
        import pandas as _pd

        docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 450)
        imgs = multimodal.synth_images_from_docs(docs)

        def plant(batches):
            for pdf in batches:
                rows = []
                for r in pdf.itertuples(index=False):
                    b = bytes(r.bytes)
                    d = int(r.image_id.split("-")[1])
                    if r.fmt in ("png", "qpng"):
                        b = multimodal.inject_png_text_chunk(
                            b, b"Comment", b"x" * (d % 23)
                        )
                    rows.append((r.image_id, b, r.fmt))
                yield _pd.DataFrame(rows, columns=["image_id", "bytes", "fmt"])

        planted = imgs.mapInPandas(
            plant, schema="image_id string, bytes binary, fmt string"
        )
        return multimodal.strip_png_metadata(planted).select(
            "image_id", "stripped_chunks", "stripped_bytes"
        )
    q["img_png_scrub"] = img_png_scrub

    def img_jpeg_scrub(spark, sf_dir):
        # container-dispatching privacy scrub: a ppm/jpeg/png fmt
        # cycle where jpeg rows get one planted COM segment (body
        # doc_id % 23 → 4 + body bytes removed) and png rows one
        # CRC-correct tEXt chunk ('Comment' + body doc_id % 23 →
        # 20 + body bytes removed); ppm rows pass through. DuckDB
        # re-derives every counter from the fmt-cycle arithmetic, so
        # green = the marker walk removed exactly the planted
        # metadata in BOTH containers, no more, no less.
        import pandas as _pd

        docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 450)
        imgs = multimodal.synth_images_from_docs(
            docs, fmts=("ppm", "jpeg", "png")
        )

        def plant(batches):
            for pdf in batches:
                rows = []
                for r in pdf.itertuples(index=False):
                    b = bytes(r.bytes)
                    d = int(r.image_id.split("-")[1])
                    if r.fmt == "jpeg":
                        b = multimodal.inject_jpeg_com_segment(
                            b, b"x" * (d % 23)
                        )
                    elif r.fmt == "png":
                        b = multimodal.inject_png_text_chunk(
                            b, b"Comment", b"x" * (d % 23)
                        )
                    rows.append((r.image_id, b, r.fmt))
                yield _pd.DataFrame(rows, columns=["image_id", "bytes", "fmt"])

        planted = imgs.mapInPandas(
            plant, schema="image_id string, bytes binary, fmt string"
        )
        return multimodal.strip_image_metadata(planted).select(
            "image_id", "fmt", "stripped_chunks", "stripped_bytes"
        )
    q["img_jpeg_scrub"] = img_jpeg_scrub

    def img_gps_audit(spark, sf_dir):
        # privacy audit: jpeg rows (doc_id % 3 == 1) get a planted
        # Exif APP1 — GPS IFD when doc_id % 5 == 0, orientation-only
        # when doc_id % 5 in (1, 2), none otherwise; ppm/png rows
        # never carry EXIF. Green = the marker walk resolves the GPS
        # pointer tag exactly where the plant put it.
        import pandas as _pd

        from ccbot_spark import codecs as _codecs

        docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 450)
        imgs = multimodal.synth_images_from_docs(
            docs, fmts=("ppm", "jpeg", "png")
        )

        def plant(batches):
            for pdf in batches:
                rows = []
                for r in pdf.itertuples(index=False):
                    b = bytes(r.bytes)
                    d = int(r.image_id.split("-")[1])
                    if r.fmt == "jpeg":
                        if d % 5 == 0:
                            b = multimodal.inject_jpeg_app1(
                                b, _codecs.exif_app1(1 + d % 8, gps=True)
                            )
                        elif d % 5 in (1, 2):
                            b = multimodal.inject_jpeg_app1(
                                b, _codecs.exif_app1(1 + d % 8)
                            )
                    rows.append((r.image_id, b))
                yield _pd.DataFrame(rows, columns=["image_id", "bytes"])

        planted = imgs.mapInPandas(
            plant, schema="image_id string, bytes binary"
        )
        return multimodal.exif_gps_audit(planted)
    q["img_gps_audit"] = img_gps_audit

    def imgcap_lang_mixture(spark, sf_dir):
        # multilingual caption balance: stopword-ratio langid over the
        # synthesized captions (20·stop ≥ tok → 'en') feeds the T=2
        # temperature mixture — low-resource caption languages
        # upweighted ∝ isqrt(availability). Pure composition of two
        # oracled primitives; one scan + hash-agg + 2-row plan.
        d = _t(spark, sf_dir, "documents")
        cap = F.expr("substr(text, 1, CAST(doc_id % 120 + 1 AS INT))")
        rows = d.select(cap.alias("caption"))
        lang = F.when(
            textkit.stopword_count(F.col("caption")) * 20
            >= textkit.token_count(F.col("caption")),
            F.lit("en"),
        ).otherwise(F.lit("other"))
        pairs = rows.select(
            lang.alias("lang"),
            textkit.token_count(F.col("caption")).cast("long").alias("n_tokens"),
        )
        return sampling.temperature_plan(
            pairs, budget=100000, source="lang", tokens="n_tokens"
        )
    q["imgcap_lang_mixture"] = imgcap_lang_mixture

    def img_privacy_pipeline(spark, sf_dir):
        # the privacy ENDGAME composed: plant (COM on every jpeg, GPS
        # APP1 on doc_id % 5 == 0, orientation-only APP1 on % 5 in
        # (1,2), tEXt on every png) → audit → scrub → re-audit. One
        # row per image chains what the audit SAW, what the scrub
        # REMOVED (exact byte arithmetic: COM = 4 + d%23; APP1 = 66
        # bytes with GPS / 36 orientation-only; tEXt = 20 + d%23),
        # and post_gps = 0 — the chain, not just each stage, is
        # what DuckDB re-derives.
        import pandas as _pd

        from ccbot_spark import codecs as _codecs

        docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 450)
        imgs = multimodal.synth_images_from_docs(
            docs, fmts=("ppm", "jpeg", "png")
        )

        def plant(batches):
            for pdf in batches:
                rows = []
                for r in pdf.itertuples(index=False):
                    b = bytes(r.bytes)
                    d = int(r.image_id.split("-")[1])
                    if r.fmt == "jpeg":
                        b = multimodal.inject_jpeg_com_segment(
                            b, b"x" * (d % 23)
                        )
                        if d % 5 == 0:
                            b = multimodal.inject_jpeg_app1(
                                b, _codecs.exif_app1(1 + d % 8, gps=True)
                            )
                        elif d % 5 in (1, 2):
                            b = multimodal.inject_jpeg_app1(
                                b, _codecs.exif_app1(1 + d % 8)
                            )
                    elif r.fmt == "png":
                        b = multimodal.inject_png_text_chunk(
                            b, b"Comment", b"x" * (d % 23)
                        )
                    rows.append((r.image_id, b))
                yield _pd.DataFrame(rows, columns=["image_id", "bytes"])

        planted = imgs.mapInPandas(
            plant, schema="image_id string, bytes binary"
        )
        pre = multimodal.exif_gps_audit(planted).select(
            "image_id",
            F.col("has_exif").alias("pre_exif"),
            F.col("has_gps").alias("pre_gps"),
        )
        scrubbed = multimodal.strip_image_metadata(planted)
        post = multimodal.exif_gps_audit(scrubbed).select(
            "image_id", F.col("has_gps").alias("post_gps")
        )
        return (
            pre.join(
                scrubbed.select("image_id", "stripped_chunks", "stripped_bytes"),
                "image_id",
            )
            .join(post, "image_id")
        )
    q["img_privacy_pipeline"] = img_privacy_pipeline

    def img_hash_family(spark, sf_dir):
        # rows-only by necessity (pixel-derived: DCT/gradient/mean
        # hashes have no SQL form; exactness vs the python reference
        # is pytest-gated in tests/test_phash.py): all three
        # perceptual-hash family members from one decode pass.
        docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
        return multimodal.hash_features(
            multimodal.synth_images_from_docs(docs)
        )
    q["img_hash_family"] = img_hash_family

    def img_bucketed_shards(spark, sf_dir):
        # group-pure WebDataset planning: shards never mix aspect
        # buckets (fixed-tensor-shape shards after bucket_resize).
        # Pure relational: two-phase running total over (bucket, key)
        # order + group-cardinality-sized base offsets — DuckDB replays
        # it as per-bucket SQL windows.
        from ccbot_spark import wds

        docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 450)
        s = multimodal.synth_images_from_docs(docs).withColumn(
            "caption",
            F.concat(
                F.lit("caption for image "),
                F.regexp_extract("image_id", r"(\d+)", 1),
            ),
        )
        costed = s.withColumn(
            "plan_cost", wds.sample_cost(F.col("w"), F.col("h"), F.col("caption"))
        ).withColumn("bucket", multimodal.aspect_bucket_col("w", "h"))
        assigned, cache = wds.plan_shards_grouped(
            costed, 96 * 1024, "bucket", num_partitions=16
        )
        _ACTIVE_CACHES.append(cache)
        return assigned.groupBy("shard_id").agg(
            F.min("bucket").alias("bucket"),
            F.count("*").alias("n_samples"),
            F.sum("plan_cost").alias("plan_bytes"),
            F.min("image_id").alias("key_min"),
            F.max("image_id").alias("key_max"),
        )
    q["img_bucketed_shards"] = img_bucketed_shards

    def imgcap_training_export(spark, sf_dir):
        # the image+caption ENDGAME composed end-to-end (the north-rule
        # sink's full batch pipeline): LAION-style curation gates →
        # keep → letterbox geometry (aspect bucket + export dims) →
        # bucket-pure WDS shard plan priced at the EXPORT tensor size
        # (3·out_w·out_h + caption bytes), one summary row per planned
        # shard. Every stage is individually oracled (img_curation /
        # img_letterbox_plan / img_bucketed_shards); this entry proves
        # the stages COMPOSE — gate verdicts feed geometry feeds cost
        # feeds the running-total cut points, replayed in DuckDB as
        # one chained CTE.
        from ccbot_spark import wds

        d = _t(spark, sf_dir, "documents")
        hx = F.md5(F.concat(F.lit("dim:"), F.col("doc_id").cast("string")))
        w = (
            F.conv(F.substring(hx, 1, 8), 16, 10).cast("long") % 481 + 32
        ).cast("int")
        h = (
            F.conv(F.substring(hx, 9, 8), 16, 10).cast("long") % 481 + 32
        ).cast("int")
        cap = F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(F.lit("IMG_"), F.col("doc_id").cast("string")),
        ).otherwise(F.expr("substr(text, 1, CAST(doc_id % 120 + 1 AS INT))"))
        meta = d.select(
            F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias(
                "image_id"
            ),
            w.alias("w"),
            h.alias("h"),
            cap.alias("caption"),
        )
        kept = (
            multimodal.curation_features(meta)
            .filter(F.col("keep") == 1)
            .select("image_id", "w", "h")
            .join(meta.select("image_id", "caption"), "image_id")
        )
        plan = multimodal.letterbox_plan(kept, "w", "h")
        costed = plan.withColumn(
            "plan_cost",
            wds.sample_cost(F.col("out_w"), F.col("out_h"), F.col("caption")),
        )
        assigned, cache = wds.plan_shards_grouped(
            costed, 96 * 1024, "bucket", num_partitions=16
        )
        _ACTIVE_CACHES.append(cache)
        return assigned.groupBy("shard_id").agg(
            F.min("bucket").alias("bucket"),
            F.count("*").alias("n_samples"),
            F.sum("plan_cost").alias("plan_bytes"),
            F.min("image_id").alias("key_min"),
            F.max("image_id").alias("key_max"),
        )
    q["imgcap_training_export"] = imgcap_training_export

    def mm_patch_pack(spark, sf_dir):
        # vision-LM context-window packing: each (image, caption) pair
        # costs ceil(w/16)·ceil(h/16) ViT patch tokens + whitespace
        # caption tokens + 2 separators; whole samples first-fit into
        # 1000-token windows per doc_id%8 shard in image_id order — a
        # sample that would straddle a boundary bumps wholly into the
        # next window (images aren't splittable, unlike text_pack's
        # stream cut), and costs > cap mark pack_id = -1. The md5 dim
        # synthesis makes a handful of rows exceed the cap, so the
        # unpackable path is exercised in-oracle. DuckDB replays the
        # sequential first-fit walk as a recursive CTE per shard.
        from ccbot_spark import wds

        d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 800)
        hx = F.md5(F.concat(F.lit("dim:"), F.col("doc_id").cast("string")))
        w = (F.conv(F.substring(hx, 1, 8), 16, 10).cast("long") % 481 + 32).cast("int")
        h = (F.conv(F.substring(hx, 9, 8), 16, 10).cast("long") % 481 + 32).cast("int")
        cap = F.expr("substr(text, 1, CAST(doc_id % 120 + 1 AS INT))")
        meta = d.select(
            F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("image_id"),
            (F.col("doc_id") % 8).cast("int").alias("shard"),
            w.alias("w"),
            h.alias("h"),
            cap.alias("caption"),
        ).withColumn(
            "cost", wds.patch_token_cost(F.col("w"), F.col("h"), F.col("caption"))
        )
        return wds.pack_samples(meta, cap=1000).select(
            "image_id", "shard", "cost", "pack_id", "fill_offset"
        )
    q["mm_patch_pack"] = mm_patch_pack

    def imgcap_caption_cap(spark, sf_dir):
        # LAION-style generic-caption cap: doc_id % 13 == 0 rows all
        # carry the messy-whitespace variant of one stock caption
        # ('A  Photo ' → normalized 'a photo'), the rest near-unique
        # text prefixes; keep ≤ 4 images per normalized caption,
        # best area (md5 dim synthesis) first. Spark runs the
        # skew-safe two-phase top-k; DuckDB states the single-window
        # form they provably equal.
        d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 700)
        hx = F.md5(F.concat(F.lit("dim:"), F.col("doc_id").cast("string")))
        w = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long") % 481 + 32
        h = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long") % 481 + 32
        cap = F.when(
            F.col("doc_id") % 13 == 0, F.lit("A  Photo ")
        ).otherwise(F.expr("substr(text, 1, CAST(doc_id % 80 + 1 AS INT))"))
        meta = d.select(
            F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias(
                "image_id"
            ),
            cap.alias("caption"),
            (w * h).cast("long").alias("area"),
        )
        return multimodal.caption_cap(meta, k=4)
    q["imgcap_caption_cap"] = imgcap_caption_cap

    def mm_interleaved_pack(spark, sf_dir):
        # MMC4/OBELICS-style interleaved documents: doc_id % 3 inline
        # images per doc (dims from md5 'dim:d:i'), document cost =
        # text tokens + Σ(patch tokens + 2 separators); whole DOCS
        # first-fit into 1500-token windows per doc_id%8 shard (a doc
        # with its images is the atomic training unit — it never
        # splits across windows). Image-cost aggregation is a
        # map-side-combinable hash-agg; packing reuses pack_samples;
        # the max-cost doc exceeds the cap → the -1 path stays live.
        from ccbot_spark import wds

        d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 800)
        did = F.col("doc_id").cast("long")
        n_img = (did % 3).cast("int")
        imgs = d.select(
            did.alias("doc_id"),
            F.explode(
                F.when(n_img == 0, F.array()).otherwise(
                    F.sequence(F.lit(1), n_img)
                )
            ).alias("i"),
        )
        hx = F.md5(
            F.concat_ws(
                ":", F.lit("dim"), F.col("doc_id").cast("string"),
                F.col("i").cast("string"),
            )
        )
        w = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long") % 481 + 32
        h = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long") % 481 + 32
        per_img = imgs.select(
            "doc_id",
            (
                F.floor((w + 15) / 16) * F.floor((h + 15) / 16) + 2
            ).cast("long").alias("img_cost"),
        )
        img_cost = per_img.groupBy("doc_id").agg(
            F.sum("img_cost").alias("img_tokens"),
            F.count("*").alias("n_images"),
        )
        base = (
            d.select(
                did.alias("doc_id"),
                (did % 8).cast("int").alias("shard"),
                textkit.token_count(F.col("text")).cast("long").alias("txt"),
            )
            .join(img_cost, "doc_id", "left")
            .select(
                "doc_id",
                "shard",
                F.coalesce(F.col("n_images"), F.lit(0)).cast("long").alias(
                    "n_images"
                ),
                (F.col("txt") + F.coalesce(F.col("img_tokens"), F.lit(0)))
                .cast("long")
                .alias("cost"),
            )
        )
        return wds.pack_samples(
            base, cap=1500, order_col="doc_id"
        ).select("doc_id", "shard", "n_images", "cost", "pack_id", "fill_offset")
    q["mm_interleaved_pack"] = mm_interleaved_pack

    def mm_pack_efficiency(spark, sf_dir):
        # padding-waste report over the mm_patch_pack windows — the
        # number a training-infra team watches (every wasted token is
        # paid-for compute): per shard, windows = max pack_id + 1,
        # capacity = windows·cap, used = Σ packed cost, waste in ppm
        # by integer division; unpackable (-1) rows counted separately.
        from ccbot_spark import wds

        d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 800)
        hx = F.md5(F.concat(F.lit("dim:"), F.col("doc_id").cast("string")))
        w = (F.conv(F.substring(hx, 1, 8), 16, 10).cast("long") % 481 + 32).cast("int")
        h = (F.conv(F.substring(hx, 9, 8), 16, 10).cast("long") % 481 + 32).cast("int")
        cap = F.expr("substr(text, 1, CAST(doc_id % 120 + 1 AS INT))")
        meta = d.select(
            F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("image_id"),
            (F.col("doc_id") % 8).cast("int").alias("shard"),
            w.alias("w"),
            h.alias("h"),
            cap.alias("caption"),
        ).withColumn(
            "cost", wds.patch_token_cost(F.col("w"), F.col("h"), F.col("caption"))
        )
        packed = wds.pack_samples(meta, cap=1000)
        return (
            packed.groupBy("shard")
            .agg(
                F.max(F.when(F.col("pack_id") >= 0, F.col("pack_id")))
                .alias("_maxp"),
                F.sum(
                    F.when(F.col("pack_id") >= 0, F.col("cost")).otherwise(0)
                ).alias("used_tokens"),
                F.sum((F.col("pack_id") == -1).cast("long")).alias(
                    "n_unpackable"
                ),
            )
            .select(
                "shard",
                (F.col("_maxp") + 1).cast("long").alias("n_windows"),
                ((F.col("_maxp") + 1) * 1000).cast("long").alias("capacity"),
                F.col("used_tokens").cast("long").alias("used_tokens"),
                F.expr(
                    "CAST((( _maxp + 1) * 1000 - used_tokens) * 1000000 "
                    "DIV ((_maxp + 1) * 1000) AS BIGINT)"
                ).alias("waste_ppm"),
                F.col("n_unpackable").cast("long").alias("n_unpackable"),
            )
        )
    q["mm_pack_efficiency"] = mm_pack_efficiency

    def img_svg_meta(spark, sf_dir):
        # SVG sniff: bodies cycle attr-dims / XML-prolog + viewBox /
        # percent-dims / non-SVG by doc_id % 4, dims from the md5
        # synthesis; the parse is pure JVM regexp (no Arrow stage) and
        # DuckDB runs the IDENTICAL patterns under RE2.
        d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 600)
        hx = F.md5(F.concat(F.lit("dim:"), F.col("doc_id").cast("string")))
        w = (F.conv(F.substring(hx, 1, 8), 16, 10).cast("long") % 481 + 32).cast("string")
        h = (F.conv(F.substring(hx, 9, 8), 16, 10).cast("long") % 481 + 32).cast("string")
        body = (
            F.when(
                F.col("doc_id") % 4 == 0,
                F.concat(
                    F.lit('<svg width="'), w, F.lit('" height="'), h,
                    F.lit('"><rect/></svg>'),
                ),
            )
            .when(
                F.col("doc_id") % 4 == 1,
                F.concat(
                    F.lit('<?xml version="1.0"?>\n<svg viewBox="0 0 '),
                    w, F.lit(" "), h, F.lit('"><path/></svg>'),
                ),
            )
            .when(
                F.col("doc_id") % 4 == 2,
                F.lit('<svg width="100%" height="50%"><g/></svg>'),
            )
            .otherwise(F.lit("<html><body>not svg</body></html>"))
        )
        rows = d.select(
            F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias(
                "image_id"
            ),
            body.alias("body"),
        )
        # registry surface: NULL → -1 sentinels (the driver's value
        # hash goes through pandas, where nullable ints decay to
        # float64); the library function keeps honest NULLs.
        m = multimodal.svg_meta(rows)
        return m.select(
            "image_id",
            "is_svg",
            F.coalesce(F.col("svg_w"), F.lit(-1)).cast("long").alias("svg_w"),
            F.coalesce(F.col("svg_h"), F.lit(-1)).cast("long").alias("svg_h"),
            F.coalesce(F.col("from_viewbox"), F.lit(-1))
            .cast("long")
            .alias("from_viewbox"),
        )
    q["img_svg_meta"] = img_svg_meta

    def img_discovery_meta(spark, sf_dir):
        # modern image+caption discovery channels beyond <img alt>:
        # OpenGraph meta (og:image + og:title/og:description caption,
        # title preferred) and srcset highest-density selection (the
        # variant a training crawl should fetch — w-descriptors,
        # x-descriptors incl. fractional, bare candidates). The
        # fixture renders real HTML in JVM concat with arithmetic
        # variants (no og:image on doc_id%7==0; no title on
        # doc_id%3==0; four srcset shapes by doc_id%4); Spark must
        # parse the attributes back out while DuckDB re-derives what
        # was embedded.
        from ccbot_spark.operators import fetchparse
        from pyspark.sql import functions as F  # noqa: F811

        d = F.col("doc_id")
        ds = d.cast("string")
        og_img = F.when(
            d % 7 != 0,
            F.concat(F.lit('<meta property="og:image" content="http://h'),
                     (d % 5).cast("string"), F.lit(".test/og/"), ds,
                     F.lit('.jpg">')),
        ).otherwise(F.lit(""))
        og_title = F.when(
            d % 3 != 0,
            F.concat(F.lit('<meta property="og:title" content="title '),
                     ds, F.lit('">')),
        ).otherwise(F.lit(""))
        og_desc = F.concat(
            F.lit('<meta property="og:description" content="desc '),
            ds, F.lit('">'),
        )
        u = lambda sfx: F.concat(F.lit("u"), ds, F.lit(sfx))  # noqa: E731
        srcset = (
            F.when(d % 4 == 0, u("a.jpg"))
            .when(d % 4 == 1, F.concat(u("a.jpg 1x, "), u("b.jpg 2x")))
            .when(d % 4 == 2, F.concat(u("a.jpg 2x, "), u("b.jpg 800w")))
            .otherwise(F.concat(u("a.jpg 1.5x, "), u("b.jpg 1x")))
        )
        docs = _t(spark, sf_dir, "documents").filter(d < 2000)
        pages = docs.select(
            F.concat(F.lit("doc-"), ds).alias("image_id"),
            F.concat(
                F.lit("<html><head>"), og_img, og_title, og_desc,
                F.lit('</head><body><img srcset="'), srcset,
                F.lit('" alt="x"></body></html>'),
            ).alias("html"),
        )
        ogi, ogc = fetchparse.og_image_cols("html")
        return pages.select(
            "image_id",
            ogi,
            ogc,
            fetchparse.srcset_best_col(
                F.regexp_extract("html", r'srcset="([^"]*)"', 1)
            ),
        )
    q["img_discovery_meta"] = img_discovery_meta

    def img_size_hist(spark, sf_dir):
        # corpus resolution profile chained ON the header parse (one
        # metadata-speed scan + one tiny hash-agg) — class bounds over
        # the max side, pixel totals summed as int64
        docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 450)
        meta = multimodal.header_meta(multimodal.synth_images_from_docs(docs))
        return multimodal.size_histogram(meta)
    q["img_size_hist"] = img_size_hist

    def img_aspect_profile(spark, sf_dir):
        # SDXL-style bucketed-batching report: per (container, aspect
        # bucket) counts + pixels over HEADER-PARSED dims. The bucket
        # ladder's cut points are integer thresholds on (1000*w) div h,
        # so DuckDB states the identical CASE; a green row proves the
        # JVM binary parse + integer-div ladder land every image in the
        # encoded bucket.
        docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 450)
        meta = multimodal.header_meta(multimodal.synth_images_from_docs(docs))
        return multimodal.aspect_profile(meta)
    q["img_aspect_profile"] = img_aspect_profile

    def img_exact_dedup(spark, sf_dir):
        # byte-exact image dedup via JVM md5 over the binary column:
        # blobs reduce to 16-byte digests map-side, the shuffle moves
        # digests, not pixels. Synth images are byte-identical iff
        # doc_id % 150 collides (same pixel seed; fmt cycle period 3
        # divides 150, so the container matches too) — the oracle
        # groups on that arithmetic instead of the digest.
        docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 450)
        return multimodal.exact_dup_groups(
            multimodal.synth_images_from_docs(docs)
        )
    q["img_exact_dedup"] = img_exact_dedup

    def img_wds_shards(spark, sf_dir):
        # WebDataset training-export PLAN: size-balanced tar shards cut
        # by a global running total of DECLARED sample cost (tar
        # framing + raw pixel bytes + caption bytes — metadata only,
        # no blob scan), in image_id order. The assignment is a pure
        # relational expression, so DuckDB replays it with the same
        # window formula; write_shards/read_shards byte-determinism and
        # the exact round trip are pytest gates (tests/test_wds.py).
        from ccbot_spark import wds

        docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 450)
        s = multimodal.synth_images_from_docs(docs).withColumn(
            "caption",
            F.concat(
                F.lit("caption for image "),
                F.regexp_extract("image_id", r"(\d+)", 1),
            ),
        )
        costed = s.withColumn(
            "plan_cost", wds.sample_cost(F.col("w"), F.col("h"), F.col("caption"))
        )
        assigned, cache = wds.plan_shards(
            costed, 96 * 1024, num_partitions=16
        )
        _ACTIVE_CACHES.append(cache)
        return assigned.groupBy("shard_id").agg(
            F.count("*").alias("n_samples"),
            F.sum("plan_cost").alias("plan_bytes"),
            F.min("image_id").alias("key_min"),
            F.max("image_id").alias("key_max"),
        )
    q["img_wds_shards"] = img_wds_shards

    def imgcap_clip_filter(spark, sf_dir):
        # CLIP-score-shaped alignment gate (LAION curation): stored
        # image embeddings (embeddings.vec_id = pair id) vs the
        # deterministic stub caption tower over documents.text —
        # cosine threshold as an integer cross-multiplied compare
        # (t4 = 200 ⇒ cos ≥ 0.02; splits the fixture both ways).
        docs = _t(spark, sf_dir, "documents")
        embs = _t(spark, sf_dir, "embeddings")
        return similarity.clip_align_filter(docs, embs, dim=64, t4=200)
    q["imgcap_clip_filter"] = imgcap_clip_filter

    def img_split_leakage(spark, sf_dir):
        # split-contamination audit (image decontamination): near-dup
        # pairs (banded Hamming join, the img_phash_near fixture with
        # planted hamming-1 twins) whose endpoints land in DIFFERENT
        # train/val/test splits — exactly the leakage an eval set must
        # not have. Composition of hash_split (stable md5 buckets) and
        # phash_near_pairs; both sides SQL-replayed.
        d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
        hx = F.md5(F.concat(F.lit("img:"), (F.col("doc_id") % 150).cast("string")))
        hi = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long") % F.lit(2147483648)
        lo = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long") % F.lit(2147483648)
        flip = F.when(
            F.col("doc_id") >= 150,
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(doc_id % 13 AS INT))"),
        ).otherwise(F.lit(0).cast("long"))
        ph = d.select(
            F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("image_id"),
            (hi * F.lit(2147483648) + lo).bitwiseXOR(flip).alias("phash"),
        )
        pairs = multimodal.phash_near_pairs(ph, max_ham=6)
        sp = sampling.hash_split(ph.select("image_id"), "image_id").select(
            "image_id", "split"
        )
        return (
            pairs.join(
                sp.withColumnRenamed("image_id", "img_a")
                .withColumnRenamed("split", "split_a"),
                "img_a",
            )
            .join(
                sp.withColumnRenamed("image_id", "img_b")
                .withColumnRenamed("split", "split_b"),
                "img_b",
            )
            .filter(F.col("split_a") != F.col("split_b"))
            .select("img_a", "img_b", "split_a", "split_b", "hamming")
        )
    q["img_split_leakage"] = img_split_leakage

    def img_split_assign(spark, sf_dir):
        # the FIXER for img_split_leakage: hash_split keyed on the
        # near-dup COMPONENT label (sampling.leakfree_split), so the
        # planted hamming-1 twins land in the same split by
        # construction. Same phash fixture as the audit; the oracle
        # replays components with WITH RECURSIVE + the identical
        # md5-Horner bucket of the group key.
        d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
        hx = F.md5(F.concat(F.lit("img:"), (F.col("doc_id") % 150).cast("string")))
        hi = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long") % F.lit(2147483648)
        lo = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long") % F.lit(2147483648)
        flip = F.when(
            F.col("doc_id") >= 150,
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(doc_id % 13 AS INT))"),
        ).otherwise(F.lit(0).cast("long"))
        ph = d.select(
            F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("image_id"),
            (hi * F.lit(2147483648) + lo).bitwiseXOR(flip).alias("phash"),
        )
        pairs = multimodal.phash_near_pairs(ph, max_ham=6)
        return sampling.leakfree_split(
            ph.select("image_id"), "image_id", pairs, a="img_a", b="img_b"
        )
    q["img_split_assign"] = img_split_assign

    def img_flat_gate(spark, sf_dir):
        # low-information gate: exact integer pixel moments from one
        # Arrow decode pass; verdicts are integer cross-multiplied
        # (is_flat ⇔ var_num = 0; keep ⇔ 4·var_num ≥ t2²·n²). The
        # fixture plants three classes (solid / 8-level checkerboard /
        # noise) whose verdicts DuckDB re-derives from the dims + base
        # color arithmetic — var_num itself is pixel data, so only the
        # closed-form columns are exposed here (the exact var_num is
        # pytest-gated vs numpy in tests/test_functions.py).
        docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
        imgs = multimodal.synth_flat_mix_from_docs(docs)
        return multimodal.pixel_stats(imgs, t2=10).select(
            "image_id", "w", "h", "is_flat", "keep"
        )
    q["img_flat_gate"] = img_flat_gate

    def img_blur_gate(spark, sf_dir):
        # blur / sharpness gate: variance-of-Laplacian focus measure
        # (Pech-Pacheco 2000) as exact integer energy over the interior
        # 4-neighbor Laplacian, one Arrow decode pass. The fixture
        # plants solid / linear-ramp / step-9 checkerboard classes: the
        # ramp is the adversarial case (nonzero variance, ZERO
        # Laplacian — a flat-variance gate keeps it, this gate drops
        # it). Checkerboard interior samples all have |L| = 4·9 = 36,
        # so lap_energy = 1296·n_int EXACTLY — DuckDB re-derives every
        # output column from doc_id arithmetic alone.
        docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
        imgs = multimodal.synth_blur_mix_from_docs(docs)
        return multimodal.laplacian_stats(imgs, tau=100)
    q["img_blur_gate"] = img_blur_gate


def register_sql(o):

    # --- img_phash_near: md5-synthesized phashes (two 31-bit halves →
    # value < 2^62), banded 4×16-bit Hamming join — the same
    # construction as the Spark side's multimodal.phash_near_pairs
    # input, reproduced on HUGEINT then narrowed to BIGINT.
    o["img_phash_near"] = f"""
        WITH ph AS (
          SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS image_id,
                 xor(
                   CAST((h64 // 4294967296) % 2147483648 AS BIGINT) * 2147483648
                     + CAST((h64 % 4294967296) % 2147483648 AS BIGINT),
                   CASE WHEN doc_id >= 150
                        THEN CAST(1 AS BIGINT) << CAST(doc_id % 13 AS INT)
                        ELSE 0 END
                 ) AS phash
          FROM (SELECT doc_id,
                       {_sql_h64("'img:' || CAST(doc_id % 150 AS VARCHAR)")} AS h64
                FROM documents WHERE doc_id < 200)
        ),
        pairs AS (
          SELECT DISTINCT a.image_id AS img_a, b.image_id AS img_b,
                 a.phash AS pa, b.phash AS pb
          FROM ph a JOIN ph b ON a.image_id < b.image_id
           AND (
             (a.phash & 65535) = (b.phash & 65535)
             OR ((a.phash // 65536) & 65535) = ((b.phash // 65536) & 65535)
             OR ((a.phash // 4294967296) & 65535)
                = ((b.phash // 4294967296) & 65535)
             OR ((a.phash // 281474976710656) & 65535)
                = ((b.phash // 281474976710656) & 65535)
           )
        )
        SELECT img_a, img_b, bit_count(xor(pa, pb)) AS hamming
        FROM pairs WHERE bit_count(xor(pa, pb)) <= 6
    """

    # --- img_dedup_eval: detector (the img_phash_near oracle as a
    # CTE) scored against the planted hamming-1 truth pairs.
    o["img_dedup_eval"] = f"""
        WITH det AS (
          SELECT DISTINCT img_a, img_b FROM ({o["img_phash_near"]})
        ),
        planted AS (
          SELECT LEAST('doc-' || CAST(doc_id AS VARCHAR),
                       'doc-' || CAST(doc_id + 150 AS VARCHAR)) AS img_a,
                 GREATEST('doc-' || CAST(doc_id AS VARCHAR),
                          'doc-' || CAST(doc_id + 150 AS VARCHAR)) AS img_b
          FROM documents WHERE doc_id < 50
        ),
        m AS (
          SELECT
            COALESCE(SUM(CASE WHEN d.img_a IS NOT NULL
                               AND p.img_a IS NOT NULL THEN 1 END), 0) AS tp,
            COALESCE(SUM(CASE WHEN d.img_a IS NOT NULL
                               AND p.img_a IS NULL THEN 1 END), 0) AS fp,
            COALESCE(SUM(CASE WHEN d.img_a IS NULL
                               AND p.img_a IS NOT NULL THEN 1 END), 0) AS fn
          FROM det d FULL OUTER JOIN planted p
            ON p.img_a = d.img_a AND p.img_b = d.img_b
        )
        SELECT CAST(tp + fp AS BIGINT) AS n_detected,
               CAST(tp + fn AS BIGINT) AS n_planted,
               CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
               CAST(fn AS BIGINT) AS fn,
               CAST((tp * 1000) // (tp + fp) AS BIGINT) AS precision_milli,
               CAST((tp * 1000) // (tp + fn) AS BIGINT) AS recall_milli
        FROM m
    """

    # --- img_curation: md5-synthesized (w, h) + doc_id-sliced captions,
    # then the LAION-style metadata gates — integer aspect (×10, floor
    # division) keeps the threshold engine-exact.
    o["img_blocklist"] = f"""
        WITH ph AS (
          SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS image_id,
                 xor(
                   CAST((h64 // 4294967296) % 2147483648 AS BIGINT) * 2147483648
                     + CAST((h64 % 4294967296) % 2147483648 AS BIGINT),
                   CASE WHEN doc_id >= 150
                        THEN CAST(1 AS BIGINT) << CAST(doc_id % 13 AS INT)
                        ELSE 0 END
                 ) AS phash
          FROM (SELECT doc_id,
                       {_sql_h64("'img:' || CAST(doc_id % 150 AS VARCHAR)")} AS h64
                FROM documents WHERE doc_id < 200)
        ),
        bl AS (
          SELECT CAST((h64 // 4294967296) % 2147483648 AS BIGINT) * 2147483648
                   + CAST((h64 % 4294967296) % 2147483648 AS BIGINT) AS bad_phash
          FROM (SELECT {_sql_h64("'img:' || CAST(doc_id AS VARCHAR)")} AS h64
                FROM documents WHERE doc_id < 50 AND doc_id % 7 = 0)
        ),
        hits AS (
          SELECT p.image_id, p.phash, b.bad_phash,
                 CAST(bit_count(xor(p.phash, b.bad_phash)) AS INTEGER) AS hamming,
                 ROW_NUMBER() OVER (
                   PARTITION BY p.image_id
                   ORDER BY bit_count(xor(p.phash, b.bad_phash)), b.bad_phash
                 ) AS rn
          FROM ph p JOIN bl b
            ON bit_count(xor(p.phash, b.bad_phash)) <= 1
        )
        SELECT image_id, phash, bad_phash, hamming FROM hits WHERE rn = 1
    """

    o["img_curation"] = f"""
        WITH meta AS (
          SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS image_id,
                 CAST((h64 // 4294967296) % 481 + 32 AS INTEGER) AS w,
                 CAST((h64 % 4294967296) % 481 + 32 AS INTEGER) AS h,
                 CASE WHEN doc_id % 11 = 0
                      THEN 'IMG_' || CAST(doc_id AS VARCHAR)
                      ELSE substr(text, 1, CAST(doc_id % 120 + 1 AS INT))
                 END AS caption
          FROM (SELECT doc_id, text,
                       {_sql_h64("'dim:' || CAST(doc_id AS VARCHAR)")} AS h64
                FROM documents)
        ),
        feat AS (
          SELECT image_id, w, h, caption,
                 CAST((greatest(w, h) * 10) // least(w, h) AS BIGINT) AS aspect_x10,
                 CAST(length(caption) AS BIGINT) AS cap_chars,
                 CAST(len(list_filter(string_split(caption, ' '), t -> t <> ''))
                      AS BIGINT) AS cap_words
          FROM meta
        )
        SELECT image_id, w, h, aspect_x10, cap_chars, cap_words,
               CAST(CASE WHEN least(w, h) >= 64 AND aspect_x10 <= 30
                          AND cap_words BETWEEN 3 AND 64 AND cap_chars <= 256
                          AND NOT regexp_matches(lower(caption),
                               '^(img_[0-9]+|dsc[0-9]+|untitled|no caption)')
                         THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM feat
    """

    # --- imgcap_training_export: the composed pipeline replayed as one
    # chained CTE — curation keep (img_curation formulas) → letterbox
    # bucket + export dims (img_letterbox_plan thresholds) → WDS cost
    # at export size → per-bucket running-total shard cuts
    # (img_bucketed_shards windows). strlen = caption BYTES (Spark
    # octet_length).
    o["imgcap_training_export"] = f"""
        WITH meta AS (
          SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS image_id,
                 CAST((h64 // 4294967296) % 481 + 32 AS INTEGER) AS w,
                 CAST((h64 % 4294967296) % 481 + 32 AS INTEGER) AS h,
                 CASE WHEN doc_id % 11 = 0
                      THEN 'IMG_' || CAST(doc_id AS VARCHAR)
                      ELSE substr(text, 1, CAST(doc_id % 120 + 1 AS INT))
                 END AS caption
          FROM (SELECT doc_id, text,
                       {_sql_h64("'dim:' || CAST(doc_id AS VARCHAR)")} AS h64
                FROM documents)
        ), kept AS (
          SELECT image_id, w, h, caption,
                 len(list_filter(string_split(caption, ' '), t -> t <> ''))
                   AS cap_words
          FROM meta
          WHERE least(w, h) >= 64
            AND (greatest(w, h) * 10) // least(w, h) <= 30
            AND len(list_filter(string_split(caption, ' '), t -> t <> ''))
                BETWEEN 3 AND 64
            AND length(caption) <= 256
            AND NOT regexp_matches(lower(caption),
                 '^(img_[0-9]+|dsc[0-9]+|untitled|no caption)')
        ), t AS (
          SELECT image_id, caption,
                 CASE WHEN (1000 * w) // h < 649 THEN '9:16'
                      WHEN (1000 * w) // h < 866 THEN '3:4'
                      WHEN (1000 * w) // h < 1154 THEN '1:1'
                      WHEN (1000 * w) // h < 1539 THEN '4:3'
                      ELSE '16:9' END AS bucket
          FROM kept
        ), c AS (
          SELECT image_id, bucket,
                 CAST(512 + ((3 * (CASE bucket WHEN '9:16' THEN 36
                                   WHEN '3:4' THEN 48 ELSE 64 END)
                                * (CASE bucket WHEN '9:16' THEN 64
                                   WHEN '3:4' THEN 64 WHEN '1:1' THEN 64
                                   WHEN '4:3' THEN 48 ELSE 36 END)
                              + 511) // 512) * 512
                    + 512 + ((strlen(caption) + 511) // 512) * 512
                      AS BIGINT) AS plan_cost
          FROM t
        ), a AS (
          SELECT image_id, bucket, plan_cost,
                 SUM(plan_cost) OVER (
                   PARTITION BY bucket ORDER BY image_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) - plan_cost AS bef
          FROM c
        ), g AS (
          SELECT bucket, MAX(bef) // 98304 + 1 AS n_shards
          FROM a GROUP BY bucket
        ), b AS (
          SELECT bucket,
                 COALESCE(SUM(n_shards) OVER (
                   ORDER BY bucket ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS base
          FROM g
        ), x AS (
          SELECT a.image_id, a.bucket, a.plan_cost,
                 CAST(b.base + a.bef // 98304 AS BIGINT) AS shard_id
          FROM a JOIN b USING (bucket)
        )
        SELECT shard_id, MIN(bucket) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_samples,
               CAST(SUM(plan_cost) AS BIGINT) AS plan_bytes,
               MIN(image_id) AS key_min,
               MAX(image_id) AS key_max
        FROM x GROUP BY shard_id
    """

    # --- img_discovery_meta: the embedded OpenGraph/srcset variants
    # re-derived arithmetically; Spark must parse the rendered HTML
    # back to the same values (title-over-description preference,
    # missing og:image → NULL, four srcset descriptor shapes).
    o["img_discovery_meta"] = """
        SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS image_id,
               CASE WHEN doc_id % 7 <> 0
                    THEN 'http://h' || CAST(doc_id % 5 AS VARCHAR)
                         || '.test/og/' || CAST(doc_id AS VARCHAR) || '.jpg'
               END AS og_image,
               CASE WHEN doc_id % 3 <> 0
                    THEN 'title ' || CAST(doc_id AS VARCHAR)
                    ELSE 'desc ' || CAST(doc_id AS VARCHAR)
               END AS og_caption,
               'u' || CAST(doc_id AS VARCHAR)
                   || CASE WHEN doc_id % 4 IN (0, 3)
                           THEN 'a.jpg' ELSE 'b.jpg' END AS srcset_best
        FROM documents WHERE doc_id < 2000
    """

    # --- img_header_meta: the synth images encode dims that are a pure
    # function of doc_id, so the oracle re-derives WHAT THE CODEC WROTE
    # arithmetically; Spark must read the same numbers back out of the
    # binary headers (PNG IHDR / PPM ASCII) to hash-match.
    o["img_header_meta"] = """
        SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS image_id,
               CASE WHEN doc_id % 3 = 0 THEN 'ppm' ELSE 'png' END AS container,
               CAST(16 + (doc_id % 150) * 7 % 97 AS BIGINT) AS hdr_w,
               CAST(16 + (doc_id % 150) * 11 % 97 AS BIGINT) AS hdr_h
        FROM documents WHERE doc_id < 450
    """

    # --- img_bmp_meta: 4-format cycle (ppm/png/qpng/bmp) — a green row
    # proves the little-endian BMP branch reads back exactly what
    # encode_bmp wrote, alongside the big-endian PNG and ASCII PPM
    # branches on the same scan.
    o["img_bmp_meta"] = """
        SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS image_id,
               CASE doc_id % 4 WHEN 0 THEN 'ppm'
                               WHEN 3 THEN 'bmp'
                               ELSE 'png' END AS container,
               CAST(16 + (doc_id % 150) * 7 % 97 AS BIGINT) AS hdr_w,
               CAST(16 + (doc_id % 150) * 11 % 97 AS BIGINT) AS hdr_h
        FROM documents WHERE doc_id < 450
    """

    # --- img_jpeg_meta: 5-format cycle (ppm/png/qpng/bmp/jpeg). The
    # oracle re-derives container + dims from the synthesis arithmetic;
    # for jpeg rows Spark must pull the SAME dims out of the SOF0
    # marker segment this repo's own T.81 encoder wrote — two
    # independent codepaths (numpy Huffman writer, JVM substring/conv
    # marker walk) agreeing with pure arithmetic.
    o["img_jpeg_meta"] = """
        SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS image_id,
               CASE doc_id % 5 WHEN 0 THEN 'ppm'
                               WHEN 3 THEN 'bmp'
                               WHEN 4 THEN 'jpeg'
                               ELSE 'png' END AS container,
               CAST(16 + (doc_id % 150) * 7 % 97 AS BIGINT) AS img_w,
               CAST(16 + (doc_id % 150) * 11 % 97 AS BIGINT) AS img_h
        FROM documents WHERE doc_id < 450
    """

    # --- img_gif_meta: 6-format cycle (ppm/png/qpng/bmp/jpeg/gif). A
    # green gif row proves the fixed-offset little-endian logical-
    # screen parse reads back exactly what this repo's own GIF89a/LZW
    # encoder wrote — the container round 5 closed.
    o["img_gif_meta"] = """
        SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS image_id,
               CASE doc_id % 6 WHEN 0 THEN 'ppm'
                               WHEN 3 THEN 'bmp'
                               WHEN 4 THEN 'jpeg'
                               WHEN 5 THEN 'gif'
                               ELSE 'png' END AS container,
               CAST(16 + (doc_id % 150) * 7 % 97 AS BIGINT) AS img_w,
               CAST(16 + (doc_id % 150) * 11 % 97 AS BIGINT) AS img_h
        FROM documents WHERE doc_id < 450
    """

    # --- img_webp_meta: container + dims re-derived from the doc_id
    # arithmetic the writer used — kind cycles vp8x/vp8l/vp8/tiff by
    # doc_id % 4; tiff dims are the 0 sentinel (IFD walk not
    # fixed-offset). Spark must read the same numbers out of three
    # different little-endian bit layouts.
    o["img_webp_meta"] = """
        SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS image_id,
               CASE WHEN doc_id % 4 = 3 THEN 'tiff'
                    ELSE 'webp' END AS container,
               CAST(CASE WHEN doc_id % 4 = 3 THEN 0
                         ELSE 16 + (doc_id % 150) * 7 % 97
                    END AS BIGINT) AS hdr_w,
               CAST(CASE WHEN doc_id % 4 = 3 THEN 0
                         ELSE 16 + (doc_id % 150) * 11 % 97
                    END AS BIGINT) AS hdr_h
        FROM documents WHERE doc_id < 450
    """

    # --- img_gif_anim: frame count + duration re-derived from the
    # animation writer's arithmetic.
    o["img_gif_anim"] = """
        SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS image_id,
               CAST(1 + doc_id % 5 AS BIGINT) AS n_frames,
               CAST((1 + doc_id % 5) * (4 + doc_id % 7) AS BIGINT)
                 AS duration_cs
        FROM documents WHERE doc_id < 450
    """

    # --- img_gif_frames: the exploded frame rows re-derived — frame
    # numbers are the even j below the frame count, dims the fixture
    # arithmetic.
    o["img_gif_frames"] = """
        SELECT 'doc-' || CAST(doc_id AS VARCHAR) || '#f'
                 || CAST(v.j AS VARCHAR) AS image_id,
               CAST(v.j AS BIGINT) AS frame_no,
               CAST(8 + (doc_id % 150) * 7 % 25 AS BIGINT) AS w,
               CAST(8 + (doc_id % 150) * 11 % 25 AS BIGINT) AS h
        FROM documents, (VALUES (0), (2), (4)) AS v(j)
        WHERE doc_id < 300 AND v.j < 1 + doc_id % 5
    """

    # --- img_tiff_meta: IFD0-stamped dims re-derived from the writer
    # arithmetic (tiff rows are doc_id % 4 == 3; everything else 0).
    o["img_tiff_meta"] = """
        SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS image_id,
               CAST(CASE WHEN doc_id % 4 = 3
                         THEN 16 + (doc_id % 150) * 7 % 97
                         ELSE 0 END AS BIGINT) AS tif_w,
               CAST(CASE WHEN doc_id % 4 = 3
                         THEN 16 + (doc_id % 150) * 11 % 97
                         ELSE 0 END AS BIGINT) AS tif_h
        FROM documents WHERE doc_id < 450
    """

    # --- img_exif_orient: orientation stamped as 1 + doc_id % 8
    # (doc_id % 4 == 3 unstamped → NULL), upright dims swap for
    # orientations 5..8 — all re-derived arithmetically; Spark must
    # read the same values back out of the APP1 TIFF IFD.
    o["img_exif_orient"] = """
        SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS image_id,
               CAST(CASE WHEN doc_id % 4 = 3 THEN 0
                    ELSE 1 + doc_id % 8 END AS BIGINT) AS exif_orient,
               CAST(CASE WHEN doc_id % 4 <> 3 AND 1 + doc_id % 8 >= 5
                         THEN 16 + (doc_id % 150) * 11 % 97
                         ELSE 16 + (doc_id % 150) * 7 % 97
                    END AS BIGINT) AS up_w,
               CAST(CASE WHEN doc_id % 4 <> 3 AND 1 + doc_id % 8 >= 5
                         THEN 16 + (doc_id % 150) * 7 % 97
                         ELSE 16 + (doc_id % 150) * 11 % 97
                    END AS BIGINT) AS up_h
        FROM documents WHERE doc_id < 450
    """

    # --- img_letterbox_plan: the letterbox geometry restated as SQL —
    # same integer fit rule (w·th ≥ h·tw picks the wide branch), same
    # floor divisions, same centered pads. A green row proves every
    # number the Arrow pixel stage consumes.
    o["img_letterbox_plan"] = """
        WITH dims AS (
          SELECT doc_id,
                 16 + (doc_id % 150) * 7 % 97 AS w,
                 16 + (doc_id % 150) * 11 % 97 AS h
          FROM documents WHERE doc_id < 450
        ), b AS (
          SELECT doc_id, w, h,
                 CASE WHEN (1000 * w) // h < 649 THEN '9:16'
                      WHEN (1000 * w) // h < 866 THEN '3:4'
                      WHEN (1000 * w) // h < 1154 THEN '1:1'
                      WHEN (1000 * w) // h < 1539 THEN '4:3'
                      ELSE '16:9' END AS bucket
          FROM dims
        ), t AS (
          SELECT *,
                 CASE bucket WHEN '9:16' THEN 36 WHEN '3:4' THEN 48
                             WHEN '1:1' THEN 64 WHEN '4:3' THEN 64
                             ELSE 64 END AS out_w,
                 CASE bucket WHEN '9:16' THEN 64 WHEN '3:4' THEN 64
                             WHEN '1:1' THEN 64 WHEN '4:3' THEN 48
                             ELSE 36 END AS out_h
          FROM b
        ), s AS (
          SELECT *,
                 CASE WHEN w * out_h >= h * out_w THEN out_w
                      ELSE greatest(1, (w * out_h) // h) END AS scaled_w,
                 CASE WHEN w * out_h >= h * out_w
                      THEN greatest(1, (h * out_w) // w)
                      ELSE out_h END AS scaled_h
          FROM t
        )
        SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS image_id, bucket,
               CAST(out_w AS BIGINT) AS out_w,
               CAST(out_h AS BIGINT) AS out_h,
               CAST(scaled_w AS BIGINT) AS scaled_w,
               CAST(scaled_h AS BIGINT) AS scaled_h,
               CAST((out_w - scaled_w) // 2 AS BIGINT) AS pad_x,
               CAST((out_h - scaled_h) // 2 AS BIGINT) AS pad_y
        FROM s
    """

    # --- img_png_scrub: the planted tEXt chunk costs 12 (framing) +
    # 8 ('Comment' + NUL) + doc_id % 23 (body) bytes on PNG-container
    # rows; ppm rows scrub nothing. Green = the chunk walk removed
    # exactly the planted metadata, no more, no less.
    o["img_png_scrub"] = """
        SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS image_id,
               CAST(CASE WHEN doc_id % 3 = 0 THEN 0 ELSE 1 END AS BIGINT)
                 AS stripped_chunks,
               CAST(CASE WHEN doc_id % 3 = 0 THEN 0
                         ELSE 20 + doc_id % 23 END AS BIGINT)
                 AS stripped_bytes
        FROM documents WHERE doc_id < 450
    """

    # --- imgcap_lang_mixture: langid integer test + isqrt weights
    # chained over the caption synthesis (text_langid +
    # text_temperature_plan formulas on the substr captions).
    o["imgcap_lang_mixture"] = f"""
        WITH caps AS (
          SELECT substr(text, 1, CAST(doc_id % 120 + 1 AS INT)) AS caption
          FROM documents
        ),
        tagged AS (
          SELECT CASE WHEN len(list_filter(string_split(lower(caption), ' '),
                          t -> t IN {_STOP_SQL})) * 20
                          >= len(string_split(caption, ' '))
                      THEN 'en' ELSE 'other' END AS lang,
                 CAST(len(string_split(caption, ' ')) AS BIGINT) AS n_tokens
          FROM caps
        ),
        avail AS (
          SELECT lang, SUM(n_tokens) AS avail_tokens FROM tagged GROUP BY lang
        ),
        w AS (
          SELECT lang, avail_tokens,
                 CAST(FLOOR(SQRT(avail_tokens)) AS BIGINT) AS weight
          FROM avail
        ),
        t AS (SELECT SUM(weight) AS _tw FROM w)
        SELECT lang, CAST(avail_tokens AS BIGINT) AS avail_tokens, weight,
               CAST(weight * 1000000 // _tw AS BIGINT) AS rate_ppm,
               CAST(weight * 100000 // _tw AS BIGINT) AS take_tokens
        FROM w CROSS JOIN t
    """

    # --- img_privacy_pipeline: the chained plant/audit/scrub
    # arithmetic — jpeg rows (d%3==1): COM always (4 + d%23 bytes),
    # GPS APP1 on d%5==0 (66 bytes), orientation APP1 on d%5 in (1,2)
    # (36 bytes); png rows (d%3==2): one tEXt (20 + d%23); post-scrub
    # GPS is zero everywhere.
    o["img_privacy_pipeline"] = """
        SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS image_id,
               CAST(CASE WHEN doc_id % 3 = 1 AND doc_id % 5 <= 2
                         THEN 1 ELSE 0 END AS BIGINT) AS pre_exif,
               CAST(CASE WHEN doc_id % 3 = 1 AND doc_id % 5 = 0
                         THEN 1 ELSE 0 END AS BIGINT) AS pre_gps,
               CAST(CASE WHEN doc_id % 3 = 1 THEN
                           1 + CASE WHEN doc_id % 5 <= 2 THEN 1 ELSE 0 END
                         WHEN doc_id % 3 = 2 THEN 1
                         ELSE 0 END AS BIGINT) AS stripped_chunks,
               CAST(CASE WHEN doc_id % 3 = 1 THEN
                           4 + doc_id % 23
                           + CASE WHEN doc_id % 5 = 0 THEN 66
                                  WHEN doc_id % 5 <= 2 THEN 36
                                  ELSE 0 END
                         WHEN doc_id % 3 = 2 THEN 20 + doc_id % 23
                         ELSE 0 END AS BIGINT) AS stripped_bytes,
               CAST(0 AS BIGINT) AS post_gps
        FROM documents WHERE doc_id < 450
    """

    # --- img_gps_audit: the plant arithmetic — jpeg rows are
    # doc_id % 3 == 1; GPS on % 5 == 0, orientation-only on % 5 in
    # (1, 2), bare jpeg otherwise; ppm/png rows carry nothing.
    o["img_gps_audit"] = """
        SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS image_id,
               CAST(CASE WHEN doc_id % 3 = 1 AND doc_id % 5 <= 2
                         THEN 1 ELSE 0 END AS BIGINT) AS has_exif,
               CAST(CASE WHEN doc_id % 3 = 1 AND doc_id % 5 = 0
                         THEN 1 ELSE 0 END AS BIGINT) AS has_gps
        FROM documents WHERE doc_id < 450
    """

    # --- img_svg_meta: the same regexes under RE2 over the same
    # synthesized bodies; m0 → attr dims, m1 → viewBox fallback,
    # m2 → percent dims (NULL), m3 → not SVG (all NULL).
    o["img_svg_meta"] = f"""
        WITH rows_ AS (
          SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS image_id,
                 CASE doc_id % 4
                   WHEN 0 THEN '<svg width="'
                     || CAST((h64 // 4294967296) % 481 + 32 AS VARCHAR)
                     || '" height="'
                     || CAST((h64 % 4294967296) % 481 + 32 AS VARCHAR)
                     || '"><rect/></svg>'
                   WHEN 1 THEN '<?xml version="1.0"?>' || chr(10)
                     || '<svg viewBox="0 0 '
                     || CAST((h64 // 4294967296) % 481 + 32 AS VARCHAR)
                     || ' '
                     || CAST((h64 % 4294967296) % 481 + 32 AS VARCHAR)
                     || '"><path/></svg>'
                   WHEN 2 THEN '<svg width="100%" height="50%"><g/></svg>'
                   ELSE '<html><body>not svg</body></html>'
                 END AS body
          FROM (SELECT doc_id,
                       {_sql_h64("'dim:' || CAST(doc_id AS VARCHAR)")} AS h64
                FROM documents WHERE doc_id < 600)
        ),
        feat AS (
          SELECT image_id, body,
                 regexp_matches(body,
                   '(?s)^\\s*(<\\?xml[^>]*\\?>\\s*)?<svg[\\s>]') AS is_svg,
                 TRY_CAST(regexp_extract(body,
                   '<svg[^>]*?\\swidth="([0-9]+)"', 1) AS BIGINT) AS aw,
                 TRY_CAST(regexp_extract(body,
                   '<svg[^>]*?\\sheight="([0-9]+)"', 1) AS BIGINT) AS ah,
                 TRY_CAST(regexp_extract(body,
                   '<svg[^>]*?viewBox="0 0 ([0-9]+) ([0-9]+)"', 1)
                   AS BIGINT) AS vw,
                 TRY_CAST(regexp_extract(body,
                   '<svg[^>]*?viewBox="0 0 ([0-9]+) ([0-9]+)"', 2)
                   AS BIGINT) AS vh
          FROM rows_
        )
        SELECT image_id,
               CAST(CASE WHEN is_svg THEN 1 ELSE 0 END AS BIGINT) AS is_svg,
               CAST(COALESCE(CASE
                    WHEN NOT is_svg THEN NULL
                    WHEN aw IS NULL AND ah IS NULL AND vw IS NOT NULL THEN vw
                    ELSE aw END, -1) AS BIGINT) AS svg_w,
               CAST(COALESCE(CASE
                    WHEN NOT is_svg THEN NULL
                    WHEN aw IS NULL AND ah IS NULL AND vw IS NOT NULL THEN vh
                    ELSE ah END, -1) AS BIGINT) AS svg_h,
               CAST(COALESCE(CASE
                    WHEN NOT is_svg THEN NULL
                    WHEN aw IS NULL AND ah IS NULL AND vw IS NOT NULL THEN 1
                    ELSE 0 END, -1) AS BIGINT) AS from_viewbox
        FROM feat
    """

    # --- mm_interleaved_pack: per-doc image costs via UNNEST(range)
    # + the same recursive first-fit walk as mm_patch_pack at cap
    # 1500; n_images rides along through the walk.
    o["mm_interleaved_pack"] = f"""
        WITH RECURSIVE imgs AS (
          SELECT doc_id, i,
                 {_sql_h64("'dim:' || CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)")} AS h64
          FROM documents,
               UNNEST(range(1, CAST(doc_id % 3 AS BIGINT) + 1)) AS t(i)
          WHERE doc_id < 800
        ),
        imgc AS (
          SELECT doc_id,
                 SUM((((h64 // 4294967296) % 481 + 32) + 15) // 16
                     * ((((h64 % 4294967296) % 481 + 32) + 15) // 16)
                     + 2) AS img_tokens,
                 COUNT(*) AS n_images
          FROM imgs GROUP BY doc_id
        ),
        costed AS (
          SELECT d.doc_id, CAST(d.doc_id % 8 AS INTEGER) AS shard,
                 CAST(COALESCE(i.n_images, 0) AS BIGINT) AS n_images,
                 CAST(len(string_split(d.text, ' '))
                      + COALESCE(i.img_tokens, 0) AS BIGINT) AS cost,
                 ROW_NUMBER() OVER (
                   PARTITION BY d.doc_id % 8 ORDER BY d.doc_id
                 ) AS rn
          FROM documents d LEFT JOIN imgc i USING (doc_id)
          WHERE d.doc_id < 800
        ),
        walk AS (
          SELECT shard, rn, doc_id, n_images, cost,
                 CASE WHEN cost > 1500 THEN CAST(-1 AS BIGINT)
                      ELSE CAST(0 AS BIGINT) END AS pack_id,
                 CAST(0 AS BIGINT) AS fill_offset,
                 CAST(0 AS BIGINT) AS pack_after,
                 CASE WHEN cost > 1500 THEN CAST(0 AS BIGINT)
                      ELSE cost END AS fill_after
          FROM costed WHERE rn = 1
          UNION ALL
          SELECT c.shard, c.rn, c.doc_id, c.n_images, c.cost,
                 CASE WHEN c.cost > 1500 THEN CAST(-1 AS BIGINT)
                      WHEN w.fill_after + c.cost > 1500 THEN w.pack_after + 1
                      ELSE w.pack_after END,
                 CASE WHEN c.cost > 1500 THEN CAST(0 AS BIGINT)
                      WHEN w.fill_after + c.cost > 1500 THEN CAST(0 AS BIGINT)
                      ELSE w.fill_after END,
                 CASE WHEN c.cost > 1500 THEN w.pack_after
                      WHEN w.fill_after + c.cost > 1500 THEN w.pack_after + 1
                      ELSE w.pack_after END,
                 CASE WHEN c.cost > 1500 THEN w.fill_after
                      WHEN w.fill_after + c.cost > 1500 THEN c.cost
                      ELSE w.fill_after + c.cost END
          FROM walk w JOIN costed c ON c.shard = w.shard AND c.rn = w.rn + 1
        )
        SELECT doc_id, shard, n_images, cost, pack_id, fill_offset FROM walk
    """

    # --- mm_pack_efficiency: the mm_patch_pack walk folded to the
    # per-shard waste report (integer ppm).
    o["mm_pack_efficiency"] = f"""
        WITH RECURSIVE meta AS (
          SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS image_id,
                 CAST(doc_id % 8 AS INTEGER) AS shard,
                 CAST((h64 // 4294967296) % 481 + 32 AS BIGINT) AS w,
                 CAST((h64 % 4294967296) % 481 + 32 AS BIGINT) AS h,
                 substr(text, 1, CAST(doc_id % 120 + 1 AS INT)) AS caption
          FROM (SELECT doc_id, text,
                       {_sql_h64("'dim:' || CAST(doc_id AS VARCHAR)")} AS h64
                FROM documents WHERE doc_id < 800)
        ),
        costed AS (
          SELECT image_id, shard,
                 CAST((w + 15) // 16 * ((h + 15) // 16)
                      + len(string_split(caption, ' ')) + 2 AS BIGINT) AS cost,
                 ROW_NUMBER() OVER (PARTITION BY shard ORDER BY image_id) AS rn
          FROM meta
        ),
        walk AS (
          SELECT shard, rn, image_id, cost,
                 CASE WHEN cost > 1000 THEN CAST(-1 AS BIGINT)
                      ELSE CAST(0 AS BIGINT) END AS pack_id,
                 CAST(0 AS BIGINT) AS pack_after,
                 CASE WHEN cost > 1000 THEN CAST(0 AS BIGINT)
                      ELSE cost END AS fill_after
          FROM costed WHERE rn = 1
          UNION ALL
          SELECT c.shard, c.rn, c.image_id, c.cost,
                 CASE WHEN c.cost > 1000 THEN CAST(-1 AS BIGINT)
                      WHEN w.fill_after + c.cost > 1000 THEN w.pack_after + 1
                      ELSE w.pack_after END,
                 CASE WHEN c.cost > 1000 THEN w.pack_after
                      WHEN w.fill_after + c.cost > 1000 THEN w.pack_after + 1
                      ELSE w.pack_after END,
                 CASE WHEN c.cost > 1000 THEN w.fill_after
                      WHEN w.fill_after + c.cost > 1000 THEN c.cost
                      ELSE w.fill_after + c.cost END
          FROM walk w JOIN costed c ON c.shard = w.shard AND c.rn = w.rn + 1
        )
        SELECT shard,
               CAST(MAX(CASE WHEN pack_id >= 0 THEN pack_id END) + 1
                    AS BIGINT) AS n_windows,
               CAST((MAX(CASE WHEN pack_id >= 0 THEN pack_id END) + 1)
                    * 1000 AS BIGINT) AS capacity,
               CAST(SUM(CASE WHEN pack_id >= 0 THEN cost ELSE 0 END)
                    AS BIGINT) AS used_tokens,
               CAST(((MAX(CASE WHEN pack_id >= 0 THEN pack_id END) + 1)
                     * 1000
                     - SUM(CASE WHEN pack_id >= 0 THEN cost ELSE 0 END))
                    * 1000000
                    // ((MAX(CASE WHEN pack_id >= 0 THEN pack_id END) + 1)
                        * 1000) AS BIGINT) AS waste_ppm,
               CAST(SUM(CASE WHEN pack_id = -1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_unpackable
        FROM walk GROUP BY shard
    """

    # --- imgcap_caption_cap: the two-phase top-k equals this single
    # window; keep = rank by (area DESC, image_id) within normalized
    # caption ≤ 4; cap_freq via plain GROUP BY.
    o["imgcap_caption_cap"] = f"""
        WITH meta AS (
          SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS image_id,
                 CASE WHEN doc_id % 13 = 0 THEN 'A  Photo '
                      ELSE substr(text, 1, CAST(doc_id % 80 + 1 AS INT))
                 END AS caption,
                 CAST(((h64 // 4294967296) % 481 + 32)
                      * ((h64 % 4294967296) % 481 + 32) AS BIGINT) AS area
          FROM (SELECT doc_id, text,
                       {_sql_h64("'dim:' || CAST(doc_id AS VARCHAR)")} AS h64
                FROM documents WHERE doc_id < 700)
        ),
        norm AS (
          SELECT image_id, area,
                 lower(trim(regexp_replace(caption, '\\s+', ' ', 'g')))
                   AS cap_norm
          FROM meta
        ),
        freq AS (SELECT cap_norm, COUNT(*) AS n FROM norm GROUP BY 1),
        rk AS (
          SELECT image_id, cap_norm,
                 ROW_NUMBER() OVER (
                   PARTITION BY cap_norm ORDER BY area DESC, image_id
                 ) AS rn
          FROM norm
        )
        SELECT r.image_id, r.cap_norm, CAST(f.n AS BIGINT) AS cap_freq,
               CAST(CASE WHEN r.rn <= 4 THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM rk r JOIN freq f ON r.cap_norm = f.cap_norm
    """

    # --- mm_patch_pack: first-fit-in-order packing replayed as a
    # recursive CTE per shard — state after row rn = (open window,
    # its fill); a sample bumping past the 1000-token cap opens the
    # next window, cost > cap rows take pack_id = -1 and leave the
    # state untouched. Patch cost = ceil(w/16)·ceil(h/16) + whitespace
    # caption tokens + 2, dims from the shared md5 'dim:' synthesis.
    o["mm_patch_pack"] = f"""
        WITH RECURSIVE meta AS (
          SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS image_id,
                 CAST(doc_id % 8 AS INTEGER) AS shard,
                 CAST((h64 // 4294967296) % 481 + 32 AS BIGINT) AS w,
                 CAST((h64 % 4294967296) % 481 + 32 AS BIGINT) AS h,
                 substr(text, 1, CAST(doc_id % 120 + 1 AS INT)) AS caption
          FROM (SELECT doc_id, text,
                       {_sql_h64("'dim:' || CAST(doc_id AS VARCHAR)")} AS h64
                FROM documents WHERE doc_id < 800)
        ),
        costed AS (
          SELECT image_id, shard,
                 CAST((w + 15) // 16 * ((h + 15) // 16)
                      + len(string_split(caption, ' ')) + 2 AS BIGINT) AS cost,
                 ROW_NUMBER() OVER (PARTITION BY shard ORDER BY image_id) AS rn
          FROM meta
        ),
        walk AS (
          SELECT shard, rn, image_id, cost,
                 CASE WHEN cost > 1000 THEN CAST(-1 AS BIGINT)
                      ELSE CAST(0 AS BIGINT) END AS pack_id,
                 CAST(0 AS BIGINT) AS fill_offset,
                 CAST(0 AS BIGINT) AS pack_after,
                 CASE WHEN cost > 1000 THEN CAST(0 AS BIGINT)
                      ELSE cost END AS fill_after
          FROM costed WHERE rn = 1
          UNION ALL
          SELECT c.shard, c.rn, c.image_id, c.cost,
                 CASE WHEN c.cost > 1000 THEN CAST(-1 AS BIGINT)
                      WHEN w.fill_after + c.cost > 1000 THEN w.pack_after + 1
                      ELSE w.pack_after END,
                 CASE WHEN c.cost > 1000 THEN CAST(0 AS BIGINT)
                      WHEN w.fill_after + c.cost > 1000 THEN CAST(0 AS BIGINT)
                      ELSE w.fill_after END,
                 CASE WHEN c.cost > 1000 THEN w.pack_after
                      WHEN w.fill_after + c.cost > 1000 THEN w.pack_after + 1
                      ELSE w.pack_after END,
                 CASE WHEN c.cost > 1000 THEN w.fill_after
                      WHEN w.fill_after + c.cost > 1000 THEN c.cost
                      ELSE w.fill_after + c.cost END
          FROM walk w JOIN costed c ON c.shard = w.shard AND c.rn = w.rn + 1
        )
        SELECT image_id, shard, cost, pack_id, fill_offset FROM walk
    """

    # --- img_jpeg_scrub: fmt cycle ppm/jpeg/png by doc_id % 3; the
    # planted COM costs 2 (marker) + 2 (length) + doc_id % 23 (body)
    # bytes on jpeg rows, the planted tEXt 12 (framing) + 8 ('Comment'
    # + NUL) + doc_id % 23 on png rows; ppm rows scrub nothing.
    o["img_jpeg_scrub"] = """
        SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS image_id,
               CASE doc_id % 3 WHEN 0 THEN 'ppm'
                               WHEN 1 THEN 'jpeg'
                               ELSE 'png' END AS fmt,
               CAST(CASE WHEN doc_id % 3 = 0 THEN 0 ELSE 1 END AS BIGINT)
                 AS stripped_chunks,
               CAST(CASE doc_id % 3
                    WHEN 0 THEN 0
                    WHEN 1 THEN 4 + doc_id % 23
                    ELSE 20 + doc_id % 23 END AS BIGINT)
                 AS stripped_bytes
        FROM documents WHERE doc_id < 450
    """

    # --- img_size_hist: same dim arithmetic folded to the class
    # histogram (sums cast to BIGINT — DuckDB SUM is HUGEINT).
    o["img_size_hist"] = """
        WITH dims AS (
          SELECT CASE WHEN doc_id % 3 = 0 THEN 'ppm' ELSE 'png' END AS container,
                 16 + (doc_id % 150) * 7 % 97 AS w,
                 16 + (doc_id % 150) * 11 % 97 AS h
          FROM documents WHERE doc_id < 450
        )
        SELECT container,
               CASE WHEN greatest(w, h) < 32 THEN 'icon'
                    WHEN greatest(w, h) < 64 THEN 'small'
                    WHEN greatest(w, h) < 96 THEN 'medium'
                    ELSE 'large' END AS size_class,
               CAST(COUNT(*) AS BIGINT) AS n_images,
               CAST(SUM(w * h) AS BIGINT) AS total_px
        FROM dims GROUP BY 1, 2
    """

    # --- img_aspect_profile: same dim arithmetic through the integer
    # aspect ladder ((1000*w)//h vs the geometric-midpoint cuts).
    o["img_aspect_profile"] = """
        WITH dims AS (
          SELECT CASE WHEN doc_id % 3 = 0 THEN 'ppm' ELSE 'png' END AS container,
                 16 + (doc_id % 150) * 7 % 97 AS w,
                 16 + (doc_id % 150) * 11 % 97 AS h
          FROM documents WHERE doc_id < 450
        )
        SELECT container,
               CASE WHEN (1000 * w) // h < 649 THEN '9:16'
                    WHEN (1000 * w) // h < 866 THEN '3:4'
                    WHEN (1000 * w) // h < 1154 THEN '1:1'
                    WHEN (1000 * w) // h < 1539 THEN '4:3'
                    ELSE '16:9' END AS aspect_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_images,
               CAST(SUM(w * h) AS BIGINT) AS total_px
        FROM dims GROUP BY 1, 2
    """

    # --- img_exact_dedup: byte-identity groups are doc_id % 150
    # classes by construction (same pixel seed, same container);
    # Spark groups on md5(bytes) and must land on the same keepers.
    o["img_exact_dedup"] = """
        WITH g AS (
          SELECT doc_id % 150 AS grp,
                 MIN('doc-' || CAST(doc_id AS VARCHAR)) AS keeper,
                 CAST(COUNT(*) AS BIGINT) AS n_copies
          FROM documents WHERE doc_id < 450 GROUP BY 1
        )
        SELECT keeper, n_copies FROM g WHERE n_copies >= 2
    """

    # --- img_wds_shards: the WDS shard plan is a pure relational
    # expression over metadata (dims arithmetic + tar block rounding +
    # one running-total window), so the oracle states the identical
    # formula: cost = 512 + ceil(3wh/512)*512 + 512 +
    # ceil(len(caption)/512)*512; shard = (run_before) // 96KiB.
    o["img_wds_shards"] = """
        WITH s AS (
          SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS image_id,
                 16 + (doc_id % 150) * 7 % 97 AS w,
                 16 + (doc_id % 150) * 11 % 97 AS h,
                 'caption for image ' || CAST(doc_id AS VARCHAR) AS caption
          FROM documents WHERE doc_id < 450
        ), c AS (
          SELECT image_id,
                 CAST(512 + ((3 * w * h + 511) // 512) * 512
                    + 512 + ((length(caption) + 511) // 512) * 512
                      AS BIGINT) AS plan_cost
          FROM s
        ), a AS (
          SELECT image_id, plan_cost,
                 CAST((SUM(plan_cost) OVER (
                        ORDER BY image_id ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                      ) - plan_cost) // 98304 AS BIGINT) AS shard_id
          FROM c
        )
        SELECT shard_id,
               CAST(COUNT(*) AS BIGINT) AS n_samples,
               CAST(SUM(plan_cost) AS BIGINT) AS plan_bytes,
               MIN(image_id) AS key_min,
               MAX(image_id) AS key_max
        FROM a GROUP BY shard_id
    """

    # --- img_bucketed_shards: group-pure planning replayed as SQL —
    # per-bucket running windows, shard counts from the last sample's
    # pre-cost running total (a straddling sample stays in its shard),
    # bases = shards of lexicographically earlier buckets.
    o["img_bucketed_shards"] = """
        WITH s AS (
          SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS image_id,
                 16 + (doc_id % 150) * 7 % 97 AS w,
                 16 + (doc_id % 150) * 11 % 97 AS h,
                 'caption for image ' || CAST(doc_id AS VARCHAR) AS caption
          FROM documents WHERE doc_id < 450
        ), c AS (
          SELECT image_id,
                 CAST(512 + ((3 * w * h + 511) // 512) * 512
                    + 512 + ((length(caption) + 511) // 512) * 512
                      AS BIGINT) AS plan_cost,
                 CASE WHEN (1000 * w) // h < 649 THEN '9:16'
                      WHEN (1000 * w) // h < 866 THEN '3:4'
                      WHEN (1000 * w) // h < 1154 THEN '1:1'
                      WHEN (1000 * w) // h < 1539 THEN '4:3'
                      ELSE '16:9' END AS bucket
          FROM s
        ), a AS (
          SELECT image_id, bucket, plan_cost,
                 SUM(plan_cost) OVER (
                   PARTITION BY bucket ORDER BY image_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) - plan_cost AS bef
          FROM c
        ), g AS (
          SELECT bucket, MAX(bef) // 98304 + 1 AS n_shards
          FROM a GROUP BY bucket
        ), b AS (
          SELECT bucket,
                 COALESCE(SUM(n_shards) OVER (
                   ORDER BY bucket ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS base
          FROM g
        ), x AS (
          SELECT a.image_id, a.bucket, a.plan_cost,
                 CAST(b.base + a.bef // 98304 AS BIGINT) AS shard_id
          FROM a JOIN b USING (bucket)
        )
        SELECT shard_id, MIN(bucket) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_samples,
               CAST(SUM(plan_cost) AS BIGINT) AS plan_bytes,
               MIN(image_id) AS key_min,
               MAX(image_id) AS key_max
        FROM x GROUP BY shard_id
    """

    # --- img_mm_dedup: phash-band near pairs (img_phash_near synthesis,
    # numeric ids) ∪ exact-caption star edges, then the min-reachable
    # fixpoint — the independent formulation of
    # multimodal.mm_dedup_edges + dedup.connected_components.
    o["img_mm_dedup"] = f"""
        WITH RECURSIVE ph AS (
          SELECT doc_id,
                 xor(
                   CAST((h64 // 4294967296) % 2147483648 AS BIGINT) * 2147483648
                     + CAST((h64 % 4294967296) % 2147483648 AS BIGINT),
                   CASE WHEN doc_id >= 150
                        THEN CAST(1 AS BIGINT) << CAST(doc_id % 13 AS INT)
                        ELSE 0 END
                 ) AS phash,
                 'cap-' || CAST(doc_id % 120 AS VARCHAR) AS caption
          FROM (SELECT doc_id,
                       {_sql_h64("'img:' || CAST(doc_id % 150 AS VARCHAR)")} AS h64
                FROM documents WHERE doc_id < 200)
        ),
        ph_pairs AS (
          SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
          FROM ph a JOIN ph b ON a.doc_id < b.doc_id
           AND (
             (a.phash & 65535) = (b.phash & 65535)
             OR ((a.phash // 65536) & 65535) = ((b.phash // 65536) & 65535)
             OR ((a.phash // 4294967296) & 65535)
                = ((b.phash // 4294967296) & 65535)
             OR ((a.phash // 281474976710656) & 65535)
                = ((b.phash // 281474976710656) & 65535)
           )
          WHERE bit_count(xor(a.phash, b.phash)) <= 6
        ),
        cap_pairs AS (
          SELECT r.a, m.doc_id AS b
          FROM ph m JOIN (SELECT caption, MIN(doc_id) AS a
                          FROM ph GROUP BY caption) r
            ON m.caption = r.caption AND m.doc_id <> r.a
        ),
        edges AS (
          SELECT a, b FROM ph_pairs UNION SELECT a, b FROM cap_pairs
          UNION SELECT b, a FROM ph_pairs UNION SELECT b, a FROM cap_pairs
        ),
        reach(node, lab) AS (
          SELECT a AS node, a AS lab FROM edges
          UNION
          SELECT e.a, r.lab FROM edges e JOIN reach r ON e.b = r.node
        )
        SELECT CAST(node AS BIGINT) AS doc_id,
               CAST(MIN(lab) AS BIGINT) AS cluster_id
        FROM reach GROUP BY node
    """

    # --- img_mm_keeper: the joint-cluster fixpoint extended with the
    # keeper window (largest md5-synthesized area, then lowest id;
    # singletons keep themselves) — mirrors keep_best_per_cluster over
    # mm_dedup_edges clusters.
    o["img_mm_keeper"] = f"""
        WITH RECURSIVE ph AS (
          SELECT doc_id,
                 xor(
                   CAST((h64 // 4294967296) % 2147483648 AS BIGINT) * 2147483648
                     + CAST((h64 % 4294967296) % 2147483648 AS BIGINT),
                   CASE WHEN doc_id >= 150
                        THEN CAST(1 AS BIGINT) << CAST(doc_id % 13 AS INT)
                        ELSE 0 END
                 ) AS phash,
                 'cap-' || CAST(doc_id % 120 AS VARCHAR) AS caption
          FROM (SELECT doc_id,
                       {_sql_h64("'img:' || CAST(doc_id % 150 AS VARCHAR)")} AS h64
                FROM documents WHERE doc_id < 200)
        ),
        dims AS (
          SELECT doc_id,
                 CAST(((d64 // 4294967296) % 481 + 32)
                      * ((d64 % 4294967296) % 481 + 32) AS BIGINT) AS area
          FROM (SELECT doc_id,
                       {_sql_h64("'dim:' || CAST(doc_id AS VARCHAR)")} AS d64
                FROM documents WHERE doc_id < 200)
        ),
        ph_pairs AS (
          SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
          FROM ph a JOIN ph b ON a.doc_id < b.doc_id
           AND (
             (a.phash & 65535) = (b.phash & 65535)
             OR ((a.phash // 65536) & 65535) = ((b.phash // 65536) & 65535)
             OR ((a.phash // 4294967296) & 65535)
                = ((b.phash // 4294967296) & 65535)
             OR ((a.phash // 281474976710656) & 65535)
                = ((b.phash // 281474976710656) & 65535)
           )
          WHERE bit_count(xor(a.phash, b.phash)) <= 6
        ),
        cap_pairs AS (
          SELECT r.a, m.doc_id AS b
          FROM ph m JOIN (SELECT caption, MIN(doc_id) AS a
                          FROM ph GROUP BY caption) r
            ON m.caption = r.caption AND m.doc_id <> r.a
        ),
        edges AS (
          SELECT a, b FROM ph_pairs UNION SELECT a, b FROM cap_pairs
          UNION SELECT b, a FROM ph_pairs UNION SELECT b, a FROM cap_pairs
        ),
        reach(node, lab) AS (
          SELECT a AS node, a AS lab FROM edges
          UNION
          SELECT e.a, r.lab FROM edges e JOIN reach r ON e.b = r.node
        ),
        comp AS (
          SELECT node AS doc_id, CAST(MIN(lab) AS BIGINT) AS cluster_id
          FROM reach GROUP BY node
        ),
        joined AS (
          SELECT d.doc_id,
                 COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
                 d.area
          FROM dims d LEFT JOIN comp c ON c.doc_id = d.doc_id
        )
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(cluster_id AS BIGINT) AS cluster_id, area
        FROM (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY cluster_id ORDER BY area DESC, doc_id) AS rn
          FROM joined
        ) WHERE rn = 1
    """

    # --- imgcap_clip_filter: replay the stub caption tower (md5
    # bucket + 9th-hex-char sign parity), the 2^20 unit quantization
    # of the image embedding (identical fold order to ann_ivf), the
    # sparse integer dot, and the HUGEINT cross-multiplied cosine
    # gate (Spark side computes it in decimal(38,0) — both exact).
    o["imgcap_clip_filter"] = f"""
        WITH e AS ({_EMB_D}),
        qn AS (
          SELECT vec_id AS image_id,
                 list_transform(emb, x -> CAST(FLOOR(
                   x / sqrt(list_sum(list_transform(emb, y -> y*y)))
                     * 1048576.0) AS BIGINT)) AS q
          FROM e
        ),
        qv AS (
          SELECT image_id, q,
                 list_sum(list_transform(q, x -> x*x)) AS img_n2
          FROM qn
        ),
        tok AS (
          SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
          FROM documents
        ),
        hx AS (
          SELECT doc_id,
                 list_reduce(list_transform(
                   string_split(substr(md5(tok), 1, 8), ''),
                   c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
                   (a, b) -> a * 16 + b) % 64 AS bucket,
                 (CAST(strpos('0123456789abcdef',
                              substr(md5(tok), 9, 1)) - 1 AS BIGINT) % 2)
                   * 2 - 1 AS s
          FROM tok WHERE tok <> ''
        ),
        cap AS (
          SELECT doc_id, bucket, SUM(s) AS cval
          FROM hx GROUP BY doc_id, bucket HAVING SUM(s) <> 0
        ),
        j AS (
          SELECT image_id, img_n2,
                 SUM(cval * q[CAST(bucket AS INTEGER) + 1]) AS dot,
                 SUM(cval * cval) AS cap_n2
          FROM cap JOIN qv ON qv.image_id = cap.doc_id
          GROUP BY image_id, img_n2
        )
        SELECT image_id,
               CAST(dot AS BIGINT) AS dot,
               CAST(cap_n2 AS BIGINT) AS cap_n2,
               CAST(img_n2 AS BIGINT) AS img_n2,
               CAST(CASE WHEN dot > 0
                          AND CAST(100000000 AS HUGEINT) * dot * dot
                              >= CAST(40000 AS HUGEINT) * cap_n2 * img_n2
                     THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM j
    """

    # --- img_split_leakage: the img_phash_near fixture + banded join
    # replay, split assignment by the sample_split md5-bucket rule,
    # cross-split near-dup pairs only.
    o["img_split_leakage"] = f"""
        WITH ph AS (
          SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS image_id,
                 xor(
                   CAST((h64 // 4294967296) % 2147483648 AS BIGINT) * 2147483648
                     + CAST((h64 % 4294967296) % 2147483648 AS BIGINT),
                   CASE WHEN doc_id >= 150
                        THEN CAST(1 AS BIGINT) << CAST(doc_id % 13 AS INT)
                        ELSE 0 END
                 ) AS phash
          FROM (SELECT doc_id,
                       {_sql_h64("'img:' || CAST(doc_id % 150 AS VARCHAR)")} AS h64
                FROM documents WHERE doc_id < 200)
        ),
        sp AS (
          SELECT image_id,
                 CASE WHEN {_sql_hmod("image_id", 100)} < 90 THEN 'train'
                      WHEN {_sql_hmod("image_id", 100)} < 95 THEN 'val'
                      ELSE 'test' END AS split
          FROM ph
        ),
        pairs AS (
          SELECT DISTINCT a.image_id AS img_a, b.image_id AS img_b,
                 a.phash AS pa, b.phash AS pb
          FROM ph a JOIN ph b ON a.image_id < b.image_id
           AND (
             (a.phash & 65535) = (b.phash & 65535)
             OR ((a.phash // 65536) & 65535) = ((b.phash // 65536) & 65535)
             OR ((a.phash // 4294967296) & 65535)
                = ((b.phash // 4294967296) & 65535)
             OR ((a.phash // 281474976710656) & 65535)
                = ((b.phash // 281474976710656) & 65535)
           )
        )
        SELECT img_a, img_b, sa.split AS split_a, sb.split AS split_b,
               bit_count(xor(pa, pb)) AS hamming
        FROM pairs
        JOIN sp sa ON sa.image_id = img_a
        JOIN sp sb ON sb.image_id = img_b
        WHERE bit_count(xor(pa, pb)) <= 6 AND sa.split <> sb.split
    """

    # --- img_split_assign: the audit's fixer — WITH RECURSIVE
    # components over the same banded phash pair graph (string MIN
    # label), then the md5-Horner bucket of the GROUP key.
    o["img_split_assign"] = f"""
        WITH RECURSIVE ph AS (
          SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS image_id,
                 xor(
                   CAST((h64 // 4294967296) % 2147483648 AS BIGINT) * 2147483648
                     + CAST((h64 % 4294967296) % 2147483648 AS BIGINT),
                   CASE WHEN doc_id >= 150
                        THEN CAST(1 AS BIGINT) << CAST(doc_id % 13 AS INT)
                        ELSE 0 END
                 ) AS phash
          FROM (SELECT doc_id,
                       {_sql_h64("'img:' || CAST(doc_id % 150 AS VARCHAR)")} AS h64
                FROM documents WHERE doc_id < 200)
        ),
        pairs AS (
          SELECT DISTINCT a.image_id AS img_a, b.image_id AS img_b
          FROM ph a JOIN ph b ON a.image_id < b.image_id
           AND (
             (a.phash & 65535) = (b.phash & 65535)
             OR ((a.phash // 65536) & 65535) = ((b.phash // 65536) & 65535)
             OR ((a.phash // 4294967296) & 65535)
                = ((b.phash // 4294967296) & 65535)
             OR ((a.phash // 281474976710656) & 65535)
                = ((b.phash // 281474976710656) & 65535)
           )
          WHERE bit_count(xor(a.phash, b.phash)) <= 6
        ),
        edges AS (
          SELECT img_a AS a, img_b AS b FROM pairs
          UNION SELECT img_b, img_a FROM pairs
        ),
        reach(node, lab) AS (
          SELECT a AS node, a AS lab FROM edges
          UNION
          SELECT e.a, r.lab FROM edges e JOIN reach r ON e.b = r.node
        ),
        comp AS (
          SELECT node AS image_id, MIN(lab) AS cluster_id
          FROM reach GROUP BY node
        ),
        g AS (
          SELECT p.image_id,
                 COALESCE(c.cluster_id, p.image_id) AS group_key
          FROM ph p LEFT JOIN comp c ON c.image_id = p.image_id
        )
        SELECT image_id, group_key,
               {_sql_hmod("group_key", 100)} AS split_bucket,
               CASE WHEN {_sql_hmod("group_key", 100)} < 90 THEN 'train'
                    WHEN {_sql_hmod("group_key", 100)} < 95 THEN 'val'
                    ELSE 'test' END AS split
        FROM g
    """

    # --- img_flat_gate: re-derive the three-class fixture's verdicts
    # from doc_id arithmetic. Solid → flat + reject; checkerboard →
    # var_num computed in closed form from (w, h, c) — k = wh//2 cells
    # hold c+8, the rest c — and compared 4·var_num ≥ 100·n²; noise →
    # keep (fixture truth: uniform-random uint8 variance ≈ 5461 ≫ 25).
    # --- img_blur_gate: every output column of the Laplacian gate is
    # closed-form on the fixture. Solid and linear-ramp classes have
    # identically zero 4-neighbor Laplacian (the ramp because L is a
    # linear operator annihilating affine images — c + row has no mod
    # wrap since c ≤ 179, row ≤ 72); the step-9 checkerboard has
    # |L| = 36 at every interior sample, so energy = 36²·n_int with
    # n_int = 3(h−2)(w−2). is_sharp ⇔ energy ≥ 100·n_int ⇔ cls = 2.
    o["img_blur_gate"] = """
        WITH d AS (
          SELECT doc_id AS d,
                 24 + doc_id % 50 AS w,
                 24 + (doc_id * 3) % 50 AS h,
                 doc_id % 3 AS cls
          FROM documents WHERE doc_id < 300
        ),
        n AS (
          SELECT *, 3 * (h - 2) * (w - 2) AS n_int FROM d
        )
        SELECT 'doc-' || CAST(d AS VARCHAR) AS image_id,
               CAST(w AS INTEGER) AS w,
               CAST(h AS INTEGER) AS h,
               CAST(n_int AS BIGINT) AS n_int,
               CAST(CASE WHEN cls = 2 THEN 1296 * n_int ELSE 0 END
                    AS BIGINT) AS lap_energy,
               CAST(CASE WHEN cls = 2 THEN 1 ELSE 0 END AS BIGINT)
                 AS is_sharp
        FROM n
    """

    o["img_flat_gate"] = """
        WITH d AS (
          SELECT doc_id AS d,
                 24 + doc_id % 50 AS w,
                 24 + (doc_id * 3) % 50 AS h,
                 (doc_id * 37) % 240 AS c,
                 doc_id % 3 AS cls
          FROM documents WHERE doc_id < 300
        ),
        chk AS (
          SELECT *,
                 (w * h) // 2 AS k,
                 3 * w * h AS n
          FROM d
        ),
        v AS (
          SELECT *,
                 3 * ((w * h - k) * c + k * (c + 8)) AS sx,
                 3 * ((w * h - k) * c * c + k * (c + 8) * (c + 8)) AS sx2
          FROM chk
        )
        SELECT 'doc-' || CAST(d AS VARCHAR) AS image_id,
               CAST(w AS INTEGER) AS w,
               CAST(h AS INTEGER) AS h,
               CAST(CASE WHEN cls = 0 THEN 1 ELSE 0 END AS BIGINT) AS is_flat,
               CAST(CASE
                 WHEN cls = 2 THEN 1
                 WHEN cls = 0 THEN 0
                 ELSE CASE WHEN 4 * (n * sx2 - sx * sx) >= 100 * n * n
                           THEN 1 ELSE 0 END
               END AS BIGINT) AS keep
        FROM v
    """
