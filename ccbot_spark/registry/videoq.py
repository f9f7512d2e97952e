"""Video queries (round-5 videokit): Y4M stream-header sniff/parse,
strided frame sampling with per-plane features, scene-cut detection.

Oracle discipline: the synthetic clips are solid-color frames whose
plane values are pure integer functions of (doc_id, frame_no) — see
functions/videokit.synth_params / synth_plane_means — so DuckDB
re-derives the header fields (incl. the byte-arithmetic frame count
and total stream size), the sampled frame numbers (unnest over a
step range), the per-plane means (== the constants), and the cut
positions (wrap points of the mod-256 Y sequence) in closed form."""
from __future__ import annotations

from pyspark.sql import functions as F

from ccbot_spark.functions import videokit
from ccbot_spark.registry.common import _t

#: synthesis arithmetic restated once as SQL (mirrors
#: videokit.synth_params; fps cycle 24 / 25 / 30 / 30000:1001)
_PARAMS_CTE = """
    params AS (
      SELECT doc_id,
             16 + (doc_id % 150) * 5 % 49 AS w,
             16 + (doc_id % 150) * 3 % 49 AS h,
             2 + (doc_id % 150) % 9 AS n_frames,
             CASE (doc_id % 150) % 4 WHEN 0 THEN 24 WHEN 1 THEN 25
                                     WHEN 2 THEN 30 ELSE 30000 END AS fps_num,
             CASE (doc_id % 150) % 4 WHEN 3 THEN 1001 ELSE 1 END AS fps_den
      FROM documents WHERE doc_id < 300
    )
"""


def _synth(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return videokit.synth_videos_from_docs(docs)


def register(q):

    def vid_header_meta(spark, sf_dir):
        # Pure-JVM parse of the Y4M ASCII stream header (hex-isolated
        # prefix, ASCII-validated, regexp'd tokens) PLUS the frame
        # count from byte arithmetic — the scan-speed gate that lets a
        # 100 TB video crawl curate on dims/fps/duration without
        # inflating one pixel. The oracle restates the header the
        # encoder wrote — including total stream size down to the
        # digit widths of W/H/F in the header line — purely in SQL.
        return videokit.y4m_header_meta(_synth(spark, sf_dir)).select(
            "video_id",
            "container",
            "vid_w",
            "vid_h",
            "fps_num",
            "fps_den",
            "colorspace",
            "n_frames",
            "nbytes",
        )
    q["vid_header_meta"] = vid_header_meta

    def vid_frame_features(spark, sf_dir):
        # Strided frame sampling (every 3rd frame) + integer per-plane
        # means from one Arrow decode pass — the standard video →
        # training-frames extraction step.
        return videokit.frame_features(_synth(spark, sf_dir), every_n=3)
    q["vid_frame_features"] = vid_frame_features

    def vid_scene_cut(spark, sf_dir):
        # Shot-boundary detection: lag window over the full frame-
        # feature table; a cut is a ≥100 jump in Y mean. The fixture's
        # Y sequence steps +17 mod 256, so cuts are exactly the wrap
        # frames — closed-form for the oracle, non-vacuous for Spark.
        return videokit.scene_cuts(
            videokit.frame_features(_synth(spark, sf_dir)), min_jump=100
        )
    q["vid_scene_cut"] = vid_scene_cut

    def vid_exact_dedup(spark, sf_dir):
        # byte-exact video dedup: JVM md5 over the clip blob — digests
        # shuffle, frames don't (at video scale this is THE bulk-dedup
        # pass; mirrors and re-posts are byte-identical). The fixture
        # derives every clip parameter and plane value from
        # doc_id % 150, so byte-identity groups are the mod-150
        # classes.
        from ccbot_spark.functions import multimodal

        return multimodal.exact_dup_groups(
            _synth(spark, sf_dir), id_col="video_id"
        )
    q["vid_exact_dedup"] = vid_exact_dedup

    def vid_keyframes(spark, sf_dir):
        # one frame per shot (frame 0 + first frame after each cut) —
        # the byte-REDUCING selection a vision-language export runs
        # before materializing any pixels.
        return videokit.keyframes(
            videokit.frame_features(_synth(spark, sf_dir)), min_jump=100
        )
    q["vid_keyframes"] = vid_keyframes

    def mm_dataset_card(spark, sf_dir):
        # cross-modal DATASET CARD: the one-page statistics table a
        # training-data release ships (docs / images / audio / video
        # volumes, token totals, exact-dup counts, pixel/sample/frame
        # budgets) — every number an integer from one agg per
        # modality, image dups via JVM md5 over the blobs, audio via
        # the pure-JVM header parse (no decode anywhere).
        from ccbot_spark.functions import audiokit, multimodal

        d = _t(spark, sf_dir, "documents")
        toks = F.size(
            F.filter(
                F.split(F.lower(F.col("text")), " "),
                lambda t: t != F.lit(""),
            )
        )
        doc_stats = d.agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(toks).cast("long").alias("total_tokens"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.countDistinct("source").cast("long").alias("n_sources"),
            (F.count("*") - F.countDistinct(F.md5("text")))
            .cast("long")
            .alias("n_dup_docs"),
        )
        imgs = multimodal.synth_images_from_docs(
            d.filter(F.col("doc_id") < 450).select("doc_id")
        )
        img_stats = imgs.agg(
            F.count("*").cast("long").alias("n_images"),
            (F.count("*") - F.countDistinct(F.md5("bytes")))
            .cast("long")
            .alias("n_dup_images"),
            F.sum(F.col("w").cast("long") * F.col("h"))
            .cast("long")
            .alias("total_pixels"),
        )
        aud = audiokit.wav_header_meta(
            audiokit.synth_audio_from_docs(
                d.filter(F.col("doc_id") < 400)
            )
        )
        aud_stats = aud.agg(
            F.count("*").cast("long").alias("n_audio_clips"),
            F.sum("hdr_n_samples").cast("long").alias("total_samples"),
        )
        vids = _synth(spark, sf_dir)
        vid_stats = vids.agg(
            F.count("*").cast("long").alias("n_videos"),
            F.sum(F.col("n_frames").cast("long"))
            .cast("long")
            .alias("total_frames"),
        )

        def _rows(stats):
            cols = stats.columns
            return stats.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(c).alias("metric"),
                                F.col(c).alias("value"),
                            )
                            for c in cols
                        ]
                    )
                ).alias("s")
            ).select("s.*")

        out = _rows(doc_stats)
        for st in (img_stats, aud_stats, vid_stats):
            out = out.unionByName(_rows(st))
        return out
    q["mm_dataset_card"] = mm_dataset_card

    def vid_near_dedup(spark, sf_dir):
        # near-duplicate clips via df-capped Jaccard over coarse
        # (Y,U)-bucket shot signatures — the re-encode/trim case
        # byte-exact dedup can't see; one decode pass, then the
        # signature equi-join (never all-pairs in videos)
        return videokit.near_dup_pairs(
            videokit.frame_features(_synth(spark, sf_dir))
        )
    q["vid_near_dedup"] = vid_near_dedup

    def vid_curation(spark, sf_dir):
        # header-tier curation: dims / frame-count / duration gates as
        # pure column exprs over the JVM header parse — every verdict
        # lands before a single frame is decoded (duration via integer
        # cross-multiplication: n·1000·den < min·num, no floats).
        return videokit.curation_flags(
            videokit.y4m_header_meta(_synth(spark, sf_dir))
        )
    q["vid_curation"] = vid_curation

    def mm_media_profile(spark, sf_dir):
        # the batch twin of st_media_profile: image + audio + video
        # blobs interleaved in one table, classified by the unified
        # JVM sniff (multimodal.media_container_col) and profiled per
        # (modality, container) with byte totals. Fully oracled — the
        # encoded SIZE of every modality is closed-form (ppm header +
        # 3wh; RIFF 44 + n·ch·2; Y4M header digits + n(6+3wh)), so a
        # green row proves sniff, routing, AND the three encoders'
        # byte-level output in one shot.
        from ccbot_spark.functions import audiokit, multimodal

        docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
        imgs = multimodal.synth_images_from_docs(docs, fmt_cycle=False).select(
            F.col("image_id").alias("media_id"), "bytes"
        )
        auds = audiokit.synth_audio_from_docs(docs).select(
            F.col("audio_id").alias("media_id"), "bytes"
        )
        vids = videokit.synth_videos_from_docs(docs).select(
            F.col("video_id").alias("media_id"), "bytes"
        )
        media = imgs.unionByName(auds).unionByName(vids)
        classified = media.select(
            multimodal.media_container_col("bytes").alias("container"),
            F.length("bytes").cast("long").alias("nbytes"),
        )
        return (
            classified.groupBy(
                multimodal.modality_col("container").alias("modality"),
                "container",
            )
            .agg(
                F.count("*").alias("n_blobs"),
                F.sum("nbytes").alias("total_bytes"),
            )
        )
    q["mm_media_profile"] = mm_media_profile

    def vid_wds_shards(spark, sf_dir):
        # WebDataset shard PLAN for (clip, caption) samples: the Y4M
        # blob is the raw frames, so the declared cost is the
        # header-derived stream size (JVM parse, no blob scan) — same
        # two-phase global running total as the image/audio planners.
        from ccbot_spark import wds

        meta = videokit.y4m_header_meta(_synth(spark, sf_dir)).withColumn(
            "caption",
            F.concat(
                F.lit("caption for clip "),
                F.regexp_extract("video_id", r"(\d+)", 1),
            ),
        )
        costed = meta.select(
            "video_id",
            (
                wds.entry_cost(F.col("nbytes"))
                + wds.entry_cost(F.octet_length("caption"))
            ).alias("plan_cost"),
        )
        assigned, cache = wds.plan_shards(
            costed, 96 * 1024, key_col="video_id", num_partitions=16
        )
        from ccbot_spark.registry.common import _ACTIVE_CACHES

        _ACTIVE_CACHES.append(cache)
        return assigned.groupBy("shard_id").agg(
            F.count("*").alias("n_samples"),
            F.sum("plan_cost").alias("plan_bytes"),
            F.min("video_id").alias("key_min"),
            F.max("video_id").alias("key_max"),
        )
    q["vid_wds_shards"] = vid_wds_shards


def register_sql(o):

    o["vid_header_meta"] = f"""
        WITH {_PARAMS_CTE}
        SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS video_id,
               'y4m' AS container,
               CAST(w AS BIGINT) AS vid_w,
               CAST(h AS BIGINT) AS vid_h,
               CAST(fps_num AS BIGINT) AS fps_num,
               CAST(fps_den AS BIGINT) AS fps_den,
               '444' AS colorspace,
               CAST(n_frames AS BIGINT) AS n_frames,
               CAST(length('YUV4MPEG2 W' || w || ' H' || h || ' F' ||
                           fps_num || ':' || fps_den || ' Ip A1:1 C444') + 1
                    + n_frames * (6 + 3 * w * h) AS BIGINT) AS nbytes
        FROM params
    """

    o["vid_frame_features"] = f"""
        WITH {_PARAMS_CTE},
        fr AS (
          SELECT doc_id,
                 unnest(range(0, CAST(n_frames AS BIGINT), 3)) AS frame_no
          FROM params
        )
        SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS video_id,
               CAST(frame_no AS BIGINT) AS frame_no,
               CAST(((doc_id % 150) * 31 + frame_no * 17) % 256 AS BIGINT) AS y_mean,
               CAST(((doc_id % 150) * 7 + frame_no * 5) % 256 AS BIGINT) AS u_mean,
               CAST(((doc_id % 150) * 13 + frame_no * 11) % 256 AS BIGINT) AS v_mean
        FROM fr
    """

    o["vid_scene_cut"] = f"""
        WITH {_PARAMS_CTE},
        fr AS (
          SELECT doc_id,
                 unnest(range(0, CAST(n_frames AS BIGINT), 1)) AS frame_no
          FROM params
        ),
        y AS (
          SELECT doc_id, frame_no,
                 ((doc_id % 150) * 31 + frame_no * 17) % 256 AS y_mean,
                 ((doc_id % 150) * 31 + greatest(frame_no - 1, 0) * 17) % 256
                     AS prev_y_mean
          FROM fr
        )
        SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS video_id,
               CAST(frame_no AS BIGINT) AS frame_no,
               CAST(y_mean AS BIGINT) AS y_mean,
               CAST(prev_y_mean AS BIGINT) AS prev_y_mean,
               CAST(CASE WHEN frame_no > 0
                          AND abs(y_mean - prev_y_mean) >= 100
                         THEN 1 ELSE 0 END AS BIGINT) AS cut
        FROM y
    """

    o["vid_curation"] = f"""
        WITH {_PARAMS_CTE}
        SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS video_id,
               CAST(w AS BIGINT) AS vid_w,
               CAST(h AS BIGINT) AS vid_h,
               CAST(n_frames AS BIGINT) AS n_frames,
               CAST(fps_num AS BIGINT) AS fps_num,
               CAST(fps_den AS BIGINT) AS fps_den,
               CAST(0 AS BIGINT) AS unparsed,
               CAST(CASE WHEN least(w, h) < 32 THEN 1 ELSE 0 END AS BIGINT)
                   AS too_small,
               CAST(CASE WHEN n_frames < 3 THEN 1 ELSE 0 END AS BIGINT)
                   AS too_few,
               CAST(CASE WHEN n_frames * 1000 * fps_den < 100 * fps_num
                         THEN 1 ELSE 0 END AS BIGINT) AS too_short,
               CAST(CASE WHEN least(w, h) >= 32 AND n_frames >= 3
                          AND n_frames * 1000 * fps_den >= 100 * fps_num
                         THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM params
    """

    o["vid_keyframes"] = f"""
        WITH {_PARAMS_CTE},
        fr AS (
          SELECT doc_id,
                 unnest(range(0, CAST(n_frames AS BIGINT), 1)) AS frame_no
          FROM params
        ),
        y AS (
          SELECT doc_id, frame_no,
                 ((doc_id % 150) * 31 + frame_no * 17) % 256 AS y_mean,
                 ((doc_id % 150) * 31 + greatest(frame_no - 1, 0) * 17) % 256
                     AS prev_y_mean
          FROM fr
        )
        SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS video_id,
               CAST(frame_no AS BIGINT) AS frame_no,
               CAST(y_mean AS BIGINT) AS y_mean
        FROM y
        WHERE frame_no = 0
           OR (frame_no > 0 AND abs(y_mean - prev_y_mean) >= 100)
    """

    o["vid_wds_shards"] = f"""
        WITH {_PARAMS_CTE},
        s AS (
          SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS video_id,
                 length('YUV4MPEG2 W' || w || ' H' || h || ' F' ||
                        fps_num || ':' || fps_den || ' Ip A1:1 C444') + 1
                 + n_frames * (6 + 3 * w * h) AS nbytes,
                 'caption for clip ' || CAST(doc_id AS VARCHAR) AS caption
          FROM params
        ), c AS (
          SELECT video_id,
                 CAST(512 + ((nbytes + 511) // 512) * 512
                    + 512 + ((length(caption) + 511) // 512) * 512
                      AS BIGINT) AS plan_cost
          FROM s
        ), a AS (
          SELECT video_id, plan_cost,
                 CAST((SUM(plan_cost) OVER (
                        ORDER BY video_id ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                      ) - plan_cost) // 98304 AS BIGINT) AS shard_id
          FROM c
        )
        SELECT shard_id,
               CAST(COUNT(*) AS BIGINT) AS n_samples,
               CAST(SUM(plan_cost) AS BIGINT) AS plan_bytes,
               MIN(video_id) AS key_min,
               MAX(video_id) AS key_max
        FROM a GROUP BY shard_id
    """

    o["mm_media_profile"] = """
        WITH b AS (
          SELECT doc_id, doc_id % 150 AS base FROM documents
          WHERE doc_id < 200
        ),
        img AS (
          SELECT length('P6' || chr(10) || CAST(16 + base * 7 % 97 AS VARCHAR)
                        || ' ' || CAST(16 + base * 11 % 97 AS VARCHAR)
                        || chr(10) || '255' || chr(10))
                 + 3 * (16 + base * 7 % 97) * (16 + base * 11 % 97) AS nbytes
          FROM b
        ),
        aud AS (
          SELECT 44 + (256 + base * 37 % 4096) * (1 + base % 2) * 2 AS nbytes
          FROM b
        ),
        vid AS (
          SELECT length('YUV4MPEG2 W' || CAST(16 + base * 5 % 49 AS VARCHAR)
                        || ' H' || CAST(16 + base * 3 % 49 AS VARCHAR)
                        || ' F' || CAST(CASE base % 4 WHEN 0 THEN 24
                                        WHEN 1 THEN 25 WHEN 2 THEN 30
                                        ELSE 30000 END AS VARCHAR)
                        || ':' || CAST(CASE base % 4 WHEN 3 THEN 1001
                                       ELSE 1 END AS VARCHAR)
                        || ' Ip A1:1 C444') + 1
                 + (2 + base % 9)
                   * (6 + 3 * (16 + base * 5 % 49) * (16 + base * 3 % 49))
                     AS nbytes
          FROM b
        )
        SELECT 'image' AS modality, 'ppm' AS container,
               CAST(COUNT(*) AS BIGINT) AS n_blobs,
               CAST(SUM(nbytes) AS BIGINT) AS total_bytes FROM img
        UNION ALL
        SELECT 'audio', 'wav', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(nbytes) AS BIGINT) FROM aud
        UNION ALL
        SELECT 'video', 'y4m', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(nbytes) AS BIGINT) FROM vid
    """

    # --- mm_dataset_card: every metric in closed form (image dims =
    # 16+(d%150)·7%97 × 16+(d%150)·11%97; byte-dup classes over
    # doc<450 are the (d%150) groups since 150 % 3 == 0 keeps the
    # fmt cycle aligned; audio n_samples and video n_frames from the
    # synthesis arithmetic)
    o["mm_dataset_card"] = """
        SELECT 'n_docs' AS metric, CAST(COUNT(*) AS BIGINT) AS value
        FROM documents
        UNION ALL
        SELECT 'total_tokens',
               CAST(SUM(len(list_filter(string_split(lower(text), ' '),
                            t -> t <> ''))) AS BIGINT)
        FROM documents
        UNION ALL
        SELECT 'n_langs', CAST(COUNT(DISTINCT lang) AS BIGINT)
        FROM documents
        UNION ALL
        SELECT 'n_sources', CAST(COUNT(DISTINCT source) AS BIGINT)
        FROM documents
        UNION ALL
        SELECT 'n_dup_docs',
               CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT)
        FROM documents
        UNION ALL
        SELECT 'n_images', CAST(COUNT(*) AS BIGINT)
        FROM documents WHERE doc_id < 450
        UNION ALL
        SELECT 'n_dup_images',
               CAST(COUNT(*) - COUNT(DISTINCT doc_id % 150) AS BIGINT)
        FROM documents WHERE doc_id < 450
        UNION ALL
        SELECT 'total_pixels',
               CAST(SUM((16 + (doc_id % 150) * 7 % 97)
                        * (16 + (doc_id % 150) * 11 % 97)) AS BIGINT)
        FROM documents WHERE doc_id < 450
        UNION ALL
        SELECT 'n_audio_clips', CAST(COUNT(*) AS BIGINT)
        FROM documents WHERE doc_id < 400
        UNION ALL
        SELECT 'total_samples',
               CAST(SUM(256 + (doc_id % 150) * 37 % 4096) AS BIGINT)
        FROM documents WHERE doc_id < 400
        UNION ALL
        SELECT 'n_videos', CAST(COUNT(*) AS BIGINT)
        FROM documents WHERE doc_id < 300
        UNION ALL
        SELECT 'total_frames',
               CAST(SUM(2 + (doc_id % 150) % 9) AS BIGINT)
        FROM documents WHERE doc_id < 300
    """

    # --- vid_near_dedup: closed-form signatures (the plane means are
    # pure integer functions of doc_id/frame), same df-cap + capped
    # set sizes + integer milli-Jaccard as the Spark side
    o["vid_near_dedup"] = f"""
        WITH {_PARAMS_CTE},
        fr AS (
          SELECT doc_id,
                 unnest(range(0, CAST(n_frames AS BIGINT), 1)) AS frame_no
          FROM params
        ),
        sg AS (
          SELECT DISTINCT 'doc-' || CAST(doc_id AS VARCHAR) AS video_id,
                 CAST(((((doc_id % 150) * 31 + frame_no * 17) % 256) // 16) * 16
                      + ((((doc_id % 150) * 7 + frame_no * 5) % 256) // 16)
                      AS BIGINT) AS sig
          FROM fr
        ),
        keptv AS (
          SELECT video_id, sig FROM sg
          WHERE sig IN (SELECT sig FROM sg GROUP BY sig HAVING COUNT(*) <= 24)
        ),
        sizes AS (SELECT video_id, COUNT(*) AS n FROM keptv GROUP BY video_id),
        shpair AS (
          SELECT a.video_id AS vid_a, b.video_id AS vid_b, COUNT(*) AS shared
          FROM keptv a JOIN keptv b USING (sig)
          WHERE a.video_id < b.video_id
          GROUP BY a.video_id, b.video_id
          HAVING COUNT(*) >= 2
        )
        SELECT s.vid_a, s.vid_b, CAST(s.shared AS BIGINT) AS shared,
               CAST((s.shared * 1000) // (sa.n + sb.n - s.shared)
                    AS BIGINT) AS jaccard_milli
        FROM shpair s
        JOIN sizes sa ON s.vid_a = sa.video_id
        JOIN sizes sb ON s.vid_b = sb.video_id
        WHERE (s.shared * 1000) // (sa.n + sb.n - s.shared) >= 200
    """

    o["vid_exact_dedup"] = """
        WITH g AS (
          SELECT doc_id % 150 AS grp,
                 MIN('doc-' || CAST(doc_id AS VARCHAR)) AS keeper,
                 CAST(COUNT(*) AS BIGINT) AS n_copies
          FROM documents WHERE doc_id < 300 GROUP BY 1
        )
        SELECT keeper, n_copies FROM g WHERE n_copies >= 2
    """
