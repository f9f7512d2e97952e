"""Audio queries (round-5 audiokit): WAV header sniff/parse, decoded
signal features, curation gates, integer decimation resample.

Same oracle discipline as the image domain: the synthetic audio table
is a pure integer function of doc_id (square wave of amplitude A,
half-period p — see functions/audiokit.synth_params), so DuckDB can
re-derive BOTH what the encoder wrote into the RIFF header AND what
the decoder must compute from the samples (peak == rms == A for a
constant-|A| wave; zero crossings = floor((n-1)/p)). A green row on
aud_features therefore proves the full binary round trip: numpy
encoder → Spark Arrow decode → integer feature math, all three
agreeing with closed-form arithmetic."""
from __future__ import annotations

from pyspark.sql import functions as F

from ccbot_spark.functions import audiokit
from ccbot_spark.registry.common import _ACTIVE_CACHES, _t

#: shared synthesis arithmetic restated once as SQL (single source of
#: truth for all four oracles; mirrors audiokit.synth_params exactly)
_PARAMS_CTE = """
    params AS (
      SELECT doc_id,
             CASE (doc_id % 150) % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                                     WHEN 2 THEN 22050 ELSE 44100 END AS rate,
             1 + (doc_id % 150) % 2 AS channels,
             256 + (doc_id % 150) * 37 % 4096 AS n_samples,
             CASE WHEN (doc_id % 150) % 10 = 0 THEN 0
                  ELSE 500 + (doc_id % 150) * 131 % 30000 END AS amp,
             8 + (doc_id % 150) % 23 AS period
      FROM documents WHERE doc_id < 400
    )
"""


def _synth(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    return audiokit.synth_audio_from_docs(docs)


def register(q):

    def aud_header_meta(spark, sf_dir):
        # Pure-JVM RIFF/WAVE header parse from the binary column alone
        # (fixed-offset little-endian conv idiom, zero Python, zero
        # sample decode — the scan-speed gate a 100 TB audio crawl
        # runs before spending any decode cycles). The oracle
        # re-derives every header field from the synthesis arithmetic;
        # a green row proves the JVM parse reads back exactly what the
        # numpy encoder wrote.
        return audiokit.wav_header_meta(_synth(spark, sf_dir)).select(
            "audio_id",
            "container",
            "hdr_channels",
            "hdr_rate",
            "hdr_bits",
            "hdr_n_samples",
            "hdr_duration_ms",
            "nbytes",
        )
    q["aud_header_meta"] = aud_header_meta

    def aud_features(spark, sf_dir):
        # Arrow-batched PCM decode + integer-exact signal features
        # (peak / integer-sqrt rms / zero crossings). Oracled because
        # a square wave makes every feature closed-form.
        return audiokit.audio_features(_synth(spark, sf_dir))
    q["aud_features"] = aud_features

    def aud_curation(spark, sf_dir):
        # Curation gates over the feature table — silence, too-short,
        # low-sample-rate, channel cap — pure column exprs that
        # collapse into the feature scan. max_channels=1 so the
        # stereo half of the fixture actually fires the gate.
        return audiokit.curation_flags(
            audiokit.audio_features(_synth(spark, sf_dir)), max_channels=1
        )
    q["aud_curation"] = aud_curation

    def aud_resample_meta(spark, sf_dir):
        # Integer decimation (keep every 2nd frame, halve the rate),
        # verified by re-running the JVM header parse over the
        # RE-ENCODED bytes: the oracle states the post-resample header
        # closed-form (n' = ceil(n/2), rate' = rate/2), so a green row
        # proves decode → decimate → encode → independent re-parse all
        # agree.
        out = audiokit.resample_decimate(_synth(spark, sf_dir), k=2)
        return audiokit.wav_header_meta(out).select(
            "audio_id",
            "container",
            "hdr_rate",
            "hdr_n_samples",
            "hdr_duration_ms",
            "nbytes",
        )
    q["aud_resample_meta"] = aud_resample_meta

    def aud_exact_dedup(spark, sf_dir):
        # byte-exact audio dedup (content-addressable-store step):
        # JVM md5 over the blob — digests shuffle, samples don't. The
        # fixture derives EVERY wave parameter from doc_id % 150, so
        # byte-identity groups are exactly the mod-150 classes.
        from ccbot_spark.functions import multimodal

        return multimodal.exact_dup_groups(
            _synth(spark, sf_dir), id_col="audio_id"
        )
    q["aud_exact_dedup"] = aud_exact_dedup

    def aud_pipeline(spark, sf_dir):
        # the composed curation pipeline in tier order: the SCAN-SPEED
        # header gate (rate / duration, zero decode) prunes first, the
        # Arrow decode tier runs only on survivors (semi join back to
        # the blobs), and the sample-level gates (silence, channel
        # cap) finish the keep verdict — the shape that makes a 100 TB
        # audio corpus affordable: most rejects never get decoded.
        audio = _synth(spark, sf_dir)
        meta = audiokit.wav_header_meta(audio)
        survivors = meta.filter(
            (F.col("hdr_rate") >= 16000) & (F.col("hdr_duration_ms") >= 20)
        ).select("audio_id")
        feats = audiokit.audio_features(
            audio.join(survivors, "audio_id", "left_semi")
        )
        return audiokit.curation_flags(feats, max_channels=1).filter(
            F.col("keep") == 1
        ).select("audio_id", "duration_ms", "rate", "channels", "peak", "rms")
    q["aud_pipeline"] = aud_pipeline

    def aud_near_dedup(spark, sf_dir):
        # rate/gain-tolerant near-dup blocking: block key (channels,
        # shape half-period re-derived rate-free from the decoded
        # features, rms>>8 gain bucket) — candidates only within a
        # block, never pairwise across clips
        return audiokit.near_dup_blocks(
            audiokit.audio_features(_synth(spark, sf_dir))
        )
    q["aud_near_dedup"] = aud_near_dedup

    def aud_fingerprint_near(spark, sf_dir):
        # ROWS-ONLY by documented necessity: the Haitsma–Kalker robust
        # fingerprint is numpy-FFT band energies — not SQL-expressible
        # (same club as the pixel-hash img_hash_family). The dedicated
        # pytest gate is stronger: amplitude-scaling invariance,
        # near-vs-unrelated separation, Spark == pure-python per row.
        # Silence fingerprints as 0, so the silent slice is gated out
        # first (peak > 0 semi join) — otherwise every silent pair
        # matches trivially. Planted base-150 duplicates pair at
        # hamming 0.
        audio = _synth(spark, sf_dir)
        voiced = (
            audiokit.audio_features(audio)
            .filter(F.col("peak") > 0)
            .select("audio_id")
        )
        fps = audiokit.audio_fingerprints(
            audio.join(voiced, "audio_id", "left_semi")
        )
        return audiokit.fingerprint_near_pairs(fps, max_ham=4)
    q["aud_fingerprint_near"] = aud_fingerprint_near

    def aud_wds_shards(spark, sf_dir):
        # WebDataset shard PLAN for (audio, caption) samples: unlike
        # images (priced at raw-pixel bytes), the WAV blob IS the raw
        # samples, so the declared cost is the header-derived byte
        # size — metadata only, no blob scan; cuts come from the same
        # two-phase global running total the image planner uses.
        from ccbot_spark import wds

        meta = audiokit.wav_header_meta(_synth(spark, sf_dir)).withColumn(
            "caption",
            F.concat(
                F.lit("caption for audio "),
                F.regexp_extract("audio_id", r"(\d+)", 1),
            ),
        )
        costed = meta.select(
            "audio_id",
            (
                wds.entry_cost(F.col("nbytes"))
                + wds.entry_cost(F.octet_length("caption"))
            ).alias("plan_cost"),
        )
        assigned, cache = wds.plan_shards(
            costed, 96 * 1024, key_col="audio_id", num_partitions=16
        )
        _ACTIVE_CACHES.append(cache)
        return assigned.groupBy("shard_id").agg(
            F.count("*").alias("n_samples"),
            F.sum("plan_cost").alias("plan_bytes"),
            F.min("audio_id").alias("key_min"),
            F.max("audio_id").alias("key_max"),
        )
    q["aud_wds_shards"] = aud_wds_shards


def register_sql(o):

    o["aud_header_meta"] = f"""
        WITH {_PARAMS_CTE}
        SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS audio_id,
               'wav' AS container,
               CAST(channels AS BIGINT) AS hdr_channels,
               CAST(rate AS BIGINT) AS hdr_rate,
               CAST(16 AS BIGINT) AS hdr_bits,
               CAST(n_samples AS BIGINT) AS hdr_n_samples,
               CAST(n_samples * 1000 // rate AS BIGINT) AS hdr_duration_ms,
               CAST(44 + n_samples * channels * 2 AS BIGINT) AS nbytes
        FROM params
    """

    o["aud_features"] = f"""
        WITH {_PARAMS_CTE}
        SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS audio_id,
               CAST(rate AS BIGINT) AS rate,
               CAST(channels AS BIGINT) AS channels,
               CAST(n_samples AS BIGINT) AS n_samples,
               CAST(amp AS BIGINT) AS peak,
               CAST(amp AS BIGINT) AS rms,
               CAST(CASE WHEN amp = 0 THEN 0
                         ELSE (n_samples - 1) // period END AS BIGINT)
                   AS zero_crossings
        FROM params
    """

    o["aud_curation"] = f"""
        WITH {_PARAMS_CTE},
        feat AS (
          SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS audio_id,
                 n_samples * 1000 // rate AS duration_ms,
                 rate, channels, amp
          FROM params
        )
        SELECT audio_id,
               CAST(duration_ms AS BIGINT) AS duration_ms,
               CAST(rate AS BIGINT) AS rate,
               CAST(channels AS BIGINT) AS channels,
               CAST(amp AS BIGINT) AS peak,
               CAST(amp AS BIGINT) AS rms,
               CAST(CASE WHEN amp = 0 THEN 1 ELSE 0 END AS BIGINT) AS silent,
               CAST(CASE WHEN duration_ms < 20 THEN 1 ELSE 0 END AS BIGINT)
                   AS too_short,
               CAST(CASE WHEN rate < 16000 THEN 1 ELSE 0 END AS BIGINT)
                   AS low_rate,
               CAST(CASE WHEN channels > 1 THEN 1 ELSE 0 END AS BIGINT)
                   AS too_many_ch,
               CAST(CASE WHEN amp > 0 AND duration_ms >= 20
                          AND rate >= 16000 AND channels <= 1
                         THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM feat
    """

    o["aud_resample_meta"] = f"""
        WITH {_PARAMS_CTE},
        r AS (
          SELECT doc_id, channels,
                 rate // 2 AS rate2,
                 (n_samples + 1) // 2 AS n2
          FROM params
        )
        SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS audio_id,
               'wav' AS container,
               CAST(rate2 AS BIGINT) AS hdr_rate,
               CAST(n2 AS BIGINT) AS hdr_n_samples,
               CAST(n2 * 1000 // rate2 AS BIGINT) AS hdr_duration_ms,
               CAST(44 + n2 * channels * 2 AS BIGINT) AS nbytes
        FROM r
    """

    # --- aud_near_dedup: the block key re-derived in closed form
    # (zero_crossings = (n-1)//period, so p_est = (n-1)//zc)
    o["aud_near_dedup"] = f"""
        WITH {_PARAMS_CTE},
        sig AS (
          SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS audio_id,
                 CAST(channels AS BIGINT) AS channels,
                 CAST((n_samples - 1) // ((n_samples - 1) // period)
                      AS BIGINT) AS p_est,
                 CAST(amp >> 8 AS BIGINT) AS amp_bucket
          FROM params WHERE amp > 0
        ),
        grp AS (
          SELECT channels, p_est, amp_bucket,
                 COUNT(*) AS group_n, MIN(audio_id) AS keeper
          FROM sig GROUP BY channels, p_est, amp_bucket
        )
        SELECT s.audio_id, s.channels, s.p_est, s.amp_bucket,
               CAST(g.group_n AS BIGINT) AS group_n,
               CAST(CASE WHEN s.audio_id = g.keeper THEN 1 ELSE 0 END
                    AS BIGINT) AS is_keeper
        FROM sig s
        JOIN grp g USING (channels, p_est, amp_bucket)
        WHERE g.group_n >= 2
    """

    o["aud_pipeline"] = f"""
        WITH {_PARAMS_CTE}
        SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS audio_id,
               CAST(n_samples * 1000 // rate AS BIGINT) AS duration_ms,
               CAST(rate AS BIGINT) AS rate,
               CAST(channels AS BIGINT) AS channels,
               CAST(amp AS BIGINT) AS peak,
               CAST(amp AS BIGINT) AS rms
        FROM params
        WHERE rate >= 16000
          AND n_samples * 1000 // rate >= 20
          AND amp > 0
          AND channels <= 1
    """

    o["aud_wds_shards"] = f"""
        WITH {_PARAMS_CTE},
        s AS (
          SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS audio_id,
                 44 + n_samples * channels * 2 AS nbytes,
                 'caption for audio ' || CAST(doc_id AS VARCHAR) AS caption
          FROM params
        ), c AS (
          SELECT audio_id,
                 CAST(512 + ((nbytes + 511) // 512) * 512
                    + 512 + ((length(caption) + 511) // 512) * 512
                      AS BIGINT) AS plan_cost
          FROM s
        ), a AS (
          SELECT audio_id, plan_cost,
                 CAST((SUM(plan_cost) OVER (
                        ORDER BY audio_id ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                      ) - plan_cost) // 98304 AS BIGINT) AS shard_id
          FROM c
        )
        SELECT shard_id,
               CAST(COUNT(*) AS BIGINT) AS n_samples,
               CAST(SUM(plan_cost) AS BIGINT) AS plan_bytes,
               MIN(audio_id) AS key_min,
               MAX(audio_id) AS key_max
        FROM a GROUP BY shard_id
    """

    o["aud_exact_dedup"] = """
        WITH g AS (
          SELECT doc_id % 150 AS grp,
                 MIN('doc-' || CAST(doc_id AS VARCHAR)) AS keeper,
                 CAST(COUNT(*) AS BIGINT) AS n_copies
          FROM documents WHERE doc_id < 400 GROUP BY 1
        )
        SELECT keeper, n_copies FROM g WHERE n_copies >= 2
    """
