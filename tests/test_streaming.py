"""Structured Streaming metrics-path tests (SURVEY.md §2.8): drive each
stream with trigger(availableNow) over a fetch-events parquet directory
and compare against the equivalent batch computation.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ccbot_spark.streaming import metrics_stream as ms

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """120 fetch events across 3 hosts, 2 files (2 source micro-batches),
    including a late event and duplicate urls."""
    d = tmp_path_factory.mktemp("fetch_events")
    rows = []
    for i in range(120):
        host = f"h{i % 3}.test"
        ts = T0 + dt.timedelta(seconds=7 * i)
        rows.append((ts, host, f"http://{host}/p/{i % 40}", 100 + i, i % 17 != 0))
    # a late-arriving event (5 minutes behind the max ts)
    rows.append((T0 + dt.timedelta(seconds=7 * 120 - 300), "h0.test",
                 "http://h0.test/late", 1, True))
    df = spark.createDataFrame(rows, ms.FETCH_EVENTS)
    df.limit(60).write.mode("overwrite").parquet(str(d / "f1"))
    # flat dir of parquet files for the file stream
    import glob
    import shutil

    out = tmp_path_factory.mktemp("events_flat")
    df1, df2 = df.limit(60), df.subtract(df.limit(60))
    df1.coalesce(1).write.mode("overwrite").parquet(str(d / "a"))
    df2.coalesce(1).write.mode("overwrite").parquet(str(d / "b"))
    n = 0
    for sub in ("a", "b"):
        for f in sorted(glob.glob(str(d / sub / "*.parquet"))):
            shutil.copy(f, str(out / f"part-{n}.parquet"))
            n += 1
    return str(out)


def test_metrics_stream_matches_batch(spark, events_dir):
    stream = ms.st_metrics_stream(ms.read_fetch_events(spark, events_dir))
    ms.run_complete_to_memory(stream, "agg_out")
    got = {
        (r.win_start, r.host): (r.fetched, r.bytes, r.errors)
        for r in spark.table("agg_out").collect()
    }
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "1 minute").alias("win"), "host")
        .agg(
            F.count("*").alias("fetched"),
            F.sum("bytes").alias("bytes"),
            F.sum(F.when(~F.col("ok"), 1).otherwise(0)).alias("errors"),
        )
    )
    want = {
        (r["win"].start, r.host): (r.fetched, r.bytes, r.errors)
        for r in batch.collect()
    }
    assert got == want


def test_sessions_close_on_gap(spark, events_dir):
    stream = ms.st_sessions(ms.read_fetch_events(spark, events_dir), gap="1 minute")
    ms.run_complete_to_memory(stream, "sess_out")
    rows = spark.table("sess_out").collect()
    assert rows
    for r in rows:
        assert r.sess_end > r.sess_start
        assert r.fetched >= 1


def test_streaming_dedup(spark, events_dir, tmp_path):
    stream = ms.st_dedup_urls(ms.read_fetch_events(spark, events_dir))
    ms.run_available_now(
        stream, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    got = spark.read.parquet(str(tmp_path / "out"))
    n_unique = (
        spark.read.parquet(events_dir).select("url_norm").distinct().count()
    )
    assert got.count() == n_unique
    assert got.select("url_norm").distinct().count() == n_unique


def test_stateful_politeness_across_batches(spark, events_dir, tmp_path):
    """applyInPandasWithState: per-host totals must accumulate across
    micro-batches (maxFilesPerTrigger=1 forces one batch per file)."""
    from ccbot_spark.streaming import state as st

    events = (
        spark.readStream.schema(ms.FETCH_EVENTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    out = st.st_host_politeness_state(events, budget=30, min_delay_ms=1)
    q = (
        out.writeStream.format("memory")
        .queryName("state_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("state_out").collect()
    batch = spark.read.parquet(events_dir)
    per_host = {
        r.host: r.cnt
        for r in batch.groupBy("host").agg(F.count("*").alias("cnt")).collect()
    }
    got_max = {}
    for r in rows:
        got_max[r.host] = max(got_max.get(r.host, 0), r.seq_in_host)
    # totals accumulated across ALL batches, not reset per batch
    assert got_max == per_host
    over = [r for r in rows if r.over_budget]
    assert all(r.seq_in_host > 30 for r in over)
    assert any(r.seq_in_host > 30 for r in rows if r.host in per_host)


def test_tws_politeness_matches_applyinpandaswithstate(spark, events_dir, tmp_path):
    """transformWithStateInPandas (Spark 4 StatefulProcessor) must
    produce the exact same annotations as the applyInPandasWithState
    path; requires the RocksDB state store provider. Skipped where
    google.protobuf (TWS's state-serialization dependency) is absent —
    the plan construction is still asserted below."""
    from ccbot_spark.streaming import state as st

    if not st.tws_available():
        # construction-level check still runs: the operator must build
        # a streaming plan against the Spark-4 API without error
        events = (
            spark.readStream.schema(ms.FETCH_EVENTS)
            .option("maxFilesPerTrigger", "1")
            .parquet(events_dir)
        )
        out = st.st_host_politeness_tws(events, budget=30, min_delay_ms=1)
        assert out.isStreaming
        assert [f.name for f in out.schema.fields] == [
            f.name for f in st.OUT_SCHEMA.fields
        ]
        pytest.skip("google.protobuf unavailable: TWS runtime cannot start here")

    rocksdb = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", rocksdb)
    try:
        events = (
            spark.readStream.schema(ms.FETCH_EVENTS)
            .option("maxFilesPerTrigger", "1")
            .parquet(events_dir)
        )
        def drain(df, name):
            q = (
                df.writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            return {tuple(r) for r in spark.table(name).collect()}

        got = drain(st.st_host_politeness_tws(events, budget=30, min_delay_ms=1), "tws_out")
        want = drain(
            st.st_host_politeness_state(events, budget=30, min_delay_ms=1),
            "aip_ref_out",
        )
        assert got == want and len(got) == 121
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_trending_hosts_sliding_matches_batch(spark, events_dir):
    """st_trending_hosts: sliding 4-minute/1-minute per-host counts ==
    the same sliding-window aggregation run in batch; each event lands
    in 4 overlapping windows; the min_fetches gate prunes cold hosts."""
    stream = ms.st_trending_hosts(
        ms.read_fetch_events(spark, events_dir),
        window="4 minutes", slide="1 minute", min_fetches=3,
    )
    ms.run_complete_to_memory(stream, "trend_out")
    got = {
        (r.win_start, r.host): (r.fetched, r.bytes)
        for r in spark.table("trend_out").collect()
    }
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "4 minutes", "1 minute").alias("win"), "host")
        .agg(F.count("*").alias("fetched"), F.sum("bytes").alias("bytes"))
        .filter(F.col("fetched") >= 3)
    )
    want = {
        (r["win"].start, r.host): (r.fetched, r.bytes)
        for r in batch.collect()
    }
    assert got == want and got
    # sliding (not tumbling): some event contributes to >1 window
    from collections import Counter

    per_host_windows = Counter(h for (_, h) in got)
    assert max(per_host_windows.values()) > 1


# ------------------------------------------------------- image ingest

@pytest.fixture(scope="module")
def images_dir(spark, tmp_path_factory):
    """90 synth images (ppm/png/qpng cycle; doc_id % 150 never repeats
    so no accidental byte-dups) + 6 planted byte-identical reposts and
    one unparseable blob, spread over 2 files (2 micro-batches)."""
    from ccbot_spark.functions import multimodal
    from ccbot_spark.streaming import image_stream as ims

    docs = spark.range(90).withColumnRenamed("id", "doc_id")
    imgs = multimodal.synth_images_from_docs(docs).collect()
    rows = []
    for i, r in enumerate(imgs):
        ts = T0 + dt.timedelta(seconds=11 * i)
        rows.append((ts, r.image_id, bytes(r.bytes)))
    # byte-identical reposts of the first 6 blobs, later event times
    for j in range(6):
        rows.append(
            (T0 + dt.timedelta(seconds=1200 + j), f"repost-{j}", bytes(imgs[j].bytes))
        )
    rows.append((T0 + dt.timedelta(seconds=1300), "junk", b"\x00\x01not-an-image"))
    df = spark.createDataFrame(rows, ims.IMAGE_EVENTS)
    import glob
    import shutil

    d = tmp_path_factory.mktemp("img_events")
    out = tmp_path_factory.mktemp("img_flat")
    df1, df2 = df.limit(48), df.subtract(df.limit(48))
    df1.coalesce(1).write.mode("overwrite").parquet(str(d / "a"))
    df2.coalesce(1).write.mode("overwrite").parquet(str(d / "b"))
    n = 0
    for sub in ("a", "b"):
        for f in sorted(glob.glob(str(d / sub / "*.parquet"))):
            shutil.copy(f, str(out / f"part-{n}.parquet"))
            n += 1
    return str(out)


def test_image_profile_stream_matches_batch(spark, images_dir):
    """st_image_profile: the JVM header parse runs INSIDE the stream;
    per-minute (container, size_class) counts == the same grouping in
    batch, and the unparseable blob lands in ('unknown', 'n/a')."""
    from ccbot_spark.functions import multimodal
    from ccbot_spark.streaming import image_stream as ims

    stream = ims.st_image_profile(ims.read_image_events(spark, images_dir))
    ms.run_complete_to_memory(stream, "img_prof")
    got = {
        (r.win_start, r.container, r.size_class): (r.n_images, r.total_bytes)
        for r in spark.table("img_prof").collect()
    }
    meta = multimodal.header_meta(spark.read.parquet(images_dir))
    batch = (
        meta.groupBy(
            F.window("ts", "1 minute").alias("win"),
            F.coalesce("container", F.lit("unknown")).alias("container"),
            F.when(F.col("container").isNull(), F.lit("n/a"))
            .otherwise(multimodal.size_class_col())
            .alias("size_class"),
        )
        .agg(F.count("*").alias("n"), F.sum("nbytes").alias("b"))
    )
    want = {
        (r["win"].start, r.container, r.size_class): (r.n, r.b)
        for r in batch.collect()
    }
    assert got == want and got
    assert any(c == "unknown" and s == "n/a" for (_, c, s) in got)
    assert {c for (_, c, _) in got} == {"ppm", "png", "unknown"}


def test_image_stream_dedup_drops_byte_identical_reposts(spark, images_dir, tmp_path):
    """st_image_dedup: 97 events → 91 distinct blobs (6 reposts
    suppressed); survivors carry parsed header metadata, digest state
    only (blob column projected away before the stateful operator)."""
    from ccbot_spark.streaming import image_stream as ims

    stream = ims.st_image_dedup(ims.read_image_events(spark, images_dir))
    ms.run_available_now(stream, str(tmp_path / "out"), str(tmp_path / "ckpt"))
    got = spark.read.parquet(str(tmp_path / "out"))
    batch = spark.read.parquet(images_dir)
    n_distinct = batch.select(F.md5("bytes")).distinct().count()
    assert got.count() == n_distinct == 91
    assert "bytes" not in got.columns and "digest" in got.columns
    # every survivor that is a real container parsed its dims
    parsed = got.filter(F.col("container").isNotNull())
    assert parsed.filter(
        F.col("hdr_w").isNull() | F.col("hdr_h").isNull()
    ).count() == 0


def test_streaming_wds_export_matches_batch_inputs(spark, tmp_path):
    """st_wds_export: trigger(availableNow) over 2 micro-batch files →
    batch=NNNNNN shard dirs whose union reads back to exactly the
    input samples; a resumed (replayed) run over the same checkpoint
    is a no-op leaving identical bytes."""
    import glob
    import hashlib
    import os

    from ccbot_spark import wds
    from ccbot_spark.functions import multimodal
    from ccbot_spark.streaming import image_stream as ims

    docs = spark.range(60).withColumnRenamed("id", "doc_id")
    imgs = multimodal.synth_images_from_docs(docs).collect()
    rows = []
    for i, r in enumerate(imgs):
        ts = T0 + dt.timedelta(seconds=7 * i)
        rows.append(
            (ts, r.image_id, bytes(r.bytes), r.w, r.h, r.fmt, f"cap {i}")
        )
    src = str(tmp_path / "samples")
    half = len(rows) // 2
    df1 = spark.createDataFrame(rows[:half], ims.SAMPLE_EVENTS)
    df2 = spark.createDataFrame(rows[half:], ims.SAMPLE_EVENTS)
    df1.coalesce(1).write.mode("overwrite").parquet(src)
    df2.coalesce(1).write.mode("append").parquet(src)

    out, ckpt = str(tmp_path / "wds"), str(tmp_path / "ckpt")
    q = ims.st_wds_export(
        ims.read_sample_events(spark, src), out, ckpt,
        target_bytes=64 * 1024,
    )
    q.awaitTermination(120)
    batch_dirs = sorted(os.listdir(out))
    assert batch_dirs and all(b.startswith("batch=") for b in batch_dirs)

    got = {}
    for b in batch_dirs:
        for r in wds.read_shards(spark, os.path.join(out, b)).collect():
            assert r["image_id"] not in got, "sample exported twice"
            got[r["image_id"]] = (r["fmt"], bytes(r["bytes"]), r["caption"])
    want = {r[1]: (r[5], r[2], r[6]) for r in rows}
    assert got == want

    hashes = {
        p: hashlib.sha256(open(p, "rb").read()).hexdigest()
        for p in glob.glob(os.path.join(out, "*", "*.tar"))
    }
    # restart over the spent checkpoint: no new batches, bytes untouched
    q2 = ims.st_wds_export(
        ims.read_sample_events(spark, src), out, ckpt,
        target_bytes=64 * 1024,
    )
    q2.awaitTermination(120)
    assert {
        p: hashlib.sha256(open(p, "rb").read()).hexdigest()
        for p in glob.glob(os.path.join(out, "*", "*.tar"))
    } == hashes


# ------------------------------------------------- mixed media ingest

@pytest.fixture(scope="module")
def media_dir(spark, tmp_path_factory):
    """Interleaved image + audio + video blobs (one crawl media sink)
    plus one unknown-magic blob, spread over 2 files."""
    from ccbot_spark.functions import audiokit, multimodal, videokit
    from ccbot_spark.streaming import media_stream as mds

    docs = spark.range(30).withColumnRenamed("id", "doc_id")
    imgs = multimodal.synth_images_from_docs(docs).collect()
    auds = audiokit.synth_audio_from_docs(docs).collect()
    vids = videokit.synth_videos_from_docs(docs).collect()
    rows = []
    for i in range(30):
        base = T0 + dt.timedelta(seconds=37 * i)
        rows.append((base, f"img-{i}", bytes(imgs[i]["bytes"])))
        rows.append((base + dt.timedelta(seconds=5),
                     f"aud-{i}", bytes(auds[i]["bytes"])))
        rows.append((base + dt.timedelta(seconds=9),
                     f"vid-{i}", bytes(vids[i]["bytes"])))
    rows.append((T0 + dt.timedelta(seconds=2000), "junk", b"\x7fELF\x02junk"))
    df = spark.createDataFrame(rows, mds.MEDIA_EVENTS)
    import glob
    import shutil

    d = tmp_path_factory.mktemp("media_events")
    out = tmp_path_factory.mktemp("media_flat")
    df1, df2 = df.limit(46), df.subtract(df.limit(46))
    df1.coalesce(1).write.mode("overwrite").parquet(str(d / "a"))
    df2.coalesce(1).write.mode("overwrite").parquet(str(d / "b"))
    n = 0
    for sub in ("a", "b"):
        for f in sorted(glob.glob(str(d / sub / "*.parquet"))):
            shutil.copy(f, str(out / f"part-{n}.parquet"))
            n += 1
    return str(out)


def test_media_profile_stream_matches_batch(spark, media_dir):
    """st_media_profile: one JVM sniff classifies interleaved
    image/audio/video blobs inside the stream; per-minute
    (modality, container) counts == the batch grouping, all three
    modalities present, unknown magic lands in ('unknown','unknown')."""
    from ccbot_spark.functions import multimodal
    from ccbot_spark.streaming import media_stream as mds

    stream = mds.st_media_profile(mds.read_media_events(spark, media_dir))
    ms.run_complete_to_memory(stream, "media_prof")
    got = {
        (r.win_start, r.modality, r.container): (r.n_blobs, r.total_bytes)
        for r in spark.table("media_prof").collect()
    }
    batch = (
        spark.read.parquet(media_dir)
        .select(
            "ts",
            multimodal.media_container_col("bytes").alias("container"),
            F.length("bytes").cast("long").alias("nbytes"),
        )
        .groupBy(
            F.window("ts", "1 minute").alias("win"),
            multimodal.modality_col("container").alias("modality"),
            F.coalesce("container", F.lit("unknown")).alias("container"),
        )
        .agg(F.count("*").alias("n"), F.sum("nbytes").alias("b"))
    )
    want = {
        (r["win"].start, r.modality, r.container): (r.n, r.b)
        for r in batch.collect()
    }
    assert got == want and got
    mods = {m for (_, m, _) in got}
    assert mods == {"image", "audio", "video", "unknown"}
    # container classification is right (and never leaks across
    # modality): wav ↔ audio, y4m ↔ video only
    for (_, m, c) in got:
        if c == "wav":
            assert m == "audio"
        if c == "y4m":
            assert m == "video"
        if c in ("ppm", "png", "bmp", "gif", "jpeg"):
            assert m == "image"


def test_media_container_col_matches_header_meta_on_images(spark, sf_dir):
    """The unified sniff agrees with the image header parse container
    classification row-for-row (same constants, one expression)."""
    from ccbot_spark.functions import multimodal

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 90
    )
    imgs = multimodal.synth_images_from_docs(
        docs, fmts=multimodal.ALL_FMTS6
    )
    joined = (
        multimodal.header_meta(imgs)
        .select("image_id", "container")
        .join(
            imgs.select(
                "image_id",
                multimodal.media_container_col("bytes").alias("sniff"),
            ),
            "image_id",
        )
    )
    assert joined.filter(
        F.col("container") != F.col("sniff")
    ).count() == 0
    assert joined.count() == 90


def test_media_sniff_recognizes_compressed_containers(spark):
    """mp4/webm/ogg/flac/mp3 are recognized by magic and routed to
    their modality (profile-by-name), even though their DECODE
    boundary raises — the sniff-before-decoder posture."""
    from ccbot_spark.functions import multimodal

    rows = [
        ("mp4", bytearray(b"\x00\x00\x00\x18ftypisom" + b"\x00" * 24)),
        ("webm", bytearray(b"\x1a\x45\xdf\xa3" + b"\x00" * 28)),
        ("ogg", bytearray(b"OggS\x00\x02" + b"\x00" * 26)),
        ("flac", bytearray(b"fLaC\x00\x00\x00\x22" + b"\x00" * 24)),
        ("mp3", bytearray(b"ID3\x04\x00" + b"\x00" * 27)),
        ("mp3_sync", bytearray(b"\xff\xfb\x90\x64" + b"\x00" * 28)),
        ("junk", bytearray(b"\x7fELF\x02" + b"\x00" * 27)),
    ]
    df = spark.createDataFrame(rows, "media_id string, bytes binary")
    out = {
        r["media_id"]: (r["container"], r["modality"])
        for r in df.select(
            "media_id",
            multimodal.media_container_col("bytes").alias("container"),
        )
        .withColumn("modality", multimodal.modality_col("container"))
        .collect()
    }
    assert out["mp4"] == ("mp4", "video")
    assert out["webm"] == ("webm", "video")
    assert out["ogg"] == ("ogg", "audio")
    assert out["flac"] == ("flac", "audio")
    assert out["mp3"] == ("mp3", "audio")
    assert out["mp3_sync"] == ("mp3", "audio")
    assert out["junk"] == (None, "unknown")


def test_media_stream_dedup_cross_modal(spark, media_dir, tmp_path):
    """st_media_dedup: byte-exact repost suppression across the whole
    mixed stream — distinct count matches batch md5 distinct; blob
    column projected away; survivors carry modality routing."""
    from ccbot_spark.streaming import media_stream as mds

    stream = mds.st_media_dedup(mds.read_media_events(spark, media_dir))
    ms.run_available_now(stream, str(tmp_path / "out"), str(tmp_path / "ck"))
    got = spark.read.parquet(str(tmp_path / "out"))
    batch = spark.read.parquet(media_dir)
    n_distinct = batch.select(F.md5("bytes")).distinct().count()
    assert got.count() == n_distinct
    assert "bytes" not in got.columns and "digest" in got.columns
    mods = {r["modality"] for r in got.select("modality").distinct().collect()}
    assert mods == {"image", "audio", "video", "unknown"}


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    """Parsed-page stream: synthweb pages (real anchors, nofollow
    slices) with event times, split into 2 source files."""
    from ccbot_spark import synthweb

    cfg = synthweb.WebConfig(n_hosts=3, pages_per_host=25, nofollow_pct=20)
    rows = []
    i = 0
    for k in range(cfg.n_hosts):
        for j in range(cfg.pages_per_host):
            url = f"http://{cfg.host(k)}/p/{j}"
            rows.append(
                (T0 + dt.timedelta(seconds=11 * i), url,
                 synthweb.fetch(cfg, url))
            )
            i += 1
    df = spark.createDataFrame(rows, ms.PAGE_EVENTS)
    out = tmp_path_factory.mktemp("pages_flat")
    half = len(rows) // 2
    df.limit(half).coalesce(1).write.mode("append").parquet(str(out))
    df.subtract(df.limit(half)).coalesce(1).write.mode("append").parquet(
        str(out)
    )
    return str(out)


def test_anchor_terms_stream_matches_batch(spark, pages_dir):
    """st_anchor_terms == the batch anchor aggregation windowed the
    same way — the anchors sink's streaming twin is exact, and the
    nofollow filter runs inside the stream."""
    from ccbot_spark.operators import fetchparse

    ms.run_complete_to_memory(
        ms.st_anchor_terms(ms.read_page_events(spark, pages_dir)),
        "anchor_terms",
    )
    got = {
        (r.win_start, r.target, r.term): r.cnt
        for r in spark.sql("select * from anchor_terms").collect()
    }
    batch = spark.read.parquet(pages_dir)
    pairs = fetchparse.extract_anchor_texts(
        batch, url_col="page_url", keep_cols=("ts",)
    )
    want = {
        (r.win_start, r.target, r.term): r.cnt
        for r in pairs.select(
            F.window("ts", "1 minute").alias("win"),
            F.col("href").alias("target"),
            F.explode(
                F.filter(
                    F.split(F.lower(F.col("anchor")), r"\s+"),
                    lambda w: w != "",
                )
            ).alias("term"),
        )
        .groupBy(F.col("win.start").alias("win_start"), "target", "term")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert got == want and got
    # nofollow anchors never reached the stream's counts: the batch
    # twin already filters them, so equality plus a raw recount proves
    # the filter fired in-stream too
    raw = batch.select(
        F.explode(
            F.regexp_extract_all(
                "html", F.lit(fetchparse._A_ELEM_PAT), F.lit(0)
            )
        ).alias("el")
    )
    n_all = raw.count()
    n_followed = raw.filter(
        ~F.col("el").rlike(fetchparse._NOFOLLOW_PAT)
    ).count()
    assert n_followed < n_all  # the fixture planted nofollow anchors
    assert sum(got.values()) < n_all * 2  # and they are absent above


@pytest.fixture(scope="module")
def imgcap_dir(spark, tmp_path_factory):
    """Image+caption pair events: sf0.001 documents (captions) joined
    to their embeddings, event times spread over 3 minutes, 2 files
    (2 micro-batches)."""
    from ccbot_spark.streaming import image_stream as ims

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    joined = docs.join(embs, docs.doc_id == embs.vec_id).select(
        "doc_id", "text", "embedding"
    ).collect()
    rows = [
        (
            T0 + dt.timedelta(seconds=7 * i),
            str(r.doc_id),
            r.text,
            [float(x) for x in r.embedding],
        )
        for i, r in enumerate(joined)
    ]
    df = spark.createDataFrame(rows, ims.IMGCAP_EVENTS)
    d = tmp_path_factory.mktemp("imgcap_events")
    half = len(rows) // 2
    df.limit(half).coalesce(1).write.mode("append").parquet(str(d))
    df.subtract(df.limit(half)).coalesce(1).write.mode("append").parquet(
        str(d)
    )
    return str(d)


def test_imgcap_filter_stream_matches_batch(spark, imgcap_dir, tmp_path):
    """st_imgcap_filter: the stateless per-row alignment gate emits the
    SAME integers (dot, cap_n2, img_n2, keep) as the batch
    clip_align_filter over the same pairs — a pair admitted at the
    stream edge is exactly the pair batch curation would admit."""
    from ccbot_spark.functions import similarity
    from ccbot_spark.streaming import image_stream as ims

    out = str(tmp_path / "keeps")
    ms.run_available_now(
        ims.st_imgcap_filter(ims.read_imgcap_events(spark, imgcap_dir)),
        out,
        str(tmp_path / "ckpt"),
    )
    got = {
        int(r.image_id): (r.dot, r.cap_n2, r.img_n2, r.keep)
        for r in spark.read.parquet(out).collect()
    }
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    want = {
        r.image_id: (r.dot, r.cap_n2, r.img_n2, r.keep)
        for r in similarity.clip_align_filter(docs, embs).collect()
    }
    assert got == want and got
    assert {k for k, v in got.items() if v[3] == 1}  # both verdicts live
    assert {k for k, v in got.items() if v[3] == 0}


def test_imgcap_profile_stream_matches_batch(spark, imgcap_dir):
    """st_imgcap_profile: per-minute keep-rate counters == the same
    grouping computed in batch over the drained pair set."""
    from ccbot_spark.functions import similarity
    from ccbot_spark.streaming import image_stream as ims

    ms.run_complete_to_memory(
        ims.st_imgcap_profile(ims.read_imgcap_events(spark, imgcap_dir)),
        "imgcap_prof",
    )
    got = {
        (r.win_start, r.keep): (r.n_pairs, r.sum_dot)
        for r in spark.table("imgcap_prof").collect()
    }
    batch = similarity.clip_align_project(
        spark.read.parquet(imgcap_dir), keep_cols=("ts",)
    )
    want = {
        (r["win"].start, r.keep): (r.n, r.d)
        for r in batch.groupBy(
            F.window("ts", "1 minute").alias("win"), "keep"
        )
        .agg(F.count("*").alias("n"), F.sum("dot").alias("d"))
        .collect()
    }
    assert got == want and len({w for (w, _) in got}) >= 2


def test_cm_sketch_stream_matches_batch(spark, events_dir):
    # the drained streaming CM sketch == sketchkit.cm_registers over
    # the same rows (register-for-register), and state is d·w-bounded
    from ccbot_spark.functions import sketchkit

    stream = ms.st_cm_sketch(ms.read_fetch_events(spark, events_dir))
    ms.run_complete_to_memory(stream, "cm_out")
    got = {
        (r.row, r.bucket): r.cnt for r in spark.table("cm_out").collect()
    }
    want = {
        (r.row, r.bucket): r.cnt
        for r in sketchkit.cm_registers(
            spark.read.parquet(events_dir), "url_norm", d=4, w=64
        ).collect()
    }
    assert got == want and len(got) <= 4 * 64


def test_funnel_stream_matches_batch(spark, sf_dir, tmp_path):
    """st_funnel_state over a ts-ordered file stream (one micro-batch
    per file) must end at EXACTLY the batch eventops.funnel result for
    every user — the chained-minima state survives batch boundaries."""
    import os

    from ccbot_spark.functions import eventops
    from ccbot_spark.streaming import state as st

    sub = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("user_id") < 30)
        .select("user_id", "event_type", F.col("ts").cast("timestamp_ntz"))
    )
    # three sequential, ts-ordered files (in-order stream)
    rows = sorted(
        sub.collect(), key=lambda r: (r.ts, r.event_type, r.user_id)
    )
    src = tmp_path / "src"
    os.makedirs(src)
    third = (len(rows) + 2) // 3
    schema = "user_id long, event_type string, ts timestamp_ntz"
    for i in range(3):
        spark.createDataFrame(
            rows[i * third:(i + 1) * third], schema
        ).coalesce(1).write.parquet(str(src / f"part{i}"))
    events = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/part*")
    )
    out = st.st_funnel_state(events)
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.table("funnel_out").collect()
    # the LAST emitted row per user (st emits one row per touched
    # user per batch) must equal the batch funnel
    last = {}
    for r in emitted:
        last[r.user_id] = (r.t1_us, r.t2_us, r.t3_us, r.stage)
    want = {
        r.user_id: (r.t1_us, r.t2_us, r.t3_us, r.stage)
        for r in eventops.funnel(sub).collect()
    }
    # users with zero funnel events still appear in batch (stage 0);
    # the stream only emits for users with at least one event — both
    # see the same universe here since every user has events
    assert last == want
    # state really crossed batches: some user must have advanced a
    # stage after its first emitted row
    first = {}
    for r in emitted:
        first.setdefault(r.user_id, (r.t1_us, r.t2_us, r.t3_us, r.stage))
    assert any(first[u][3] < last[u][3] for u in last)
