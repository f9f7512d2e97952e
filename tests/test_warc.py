"""WARC segment sink/source: python/JVM record byte-equality, gzip
segment round-trip, and parallelism-independent (deterministic) segment
bytes."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from ccbot_spark import warc
from ccbot_spark.plans import explainkit

DATE = "2026-01-01T00:00:00Z"


def test_build_parse_roundtrip_python():
    p1 = b"\x00\x01\r\n\r\n\xffpayload"  # record trailer INSIDE payload
    r1 = warc.build_record(
        "http://h0.test/i/1.png", DATE, p1, extra=[("X-Caption", "a cat")]
    )
    r2 = warc.build_record("http://h1.test/i/2.png", DATE, b"")
    recs = warc.parse_records(r1 + r2)
    assert [r["target_uri"] for r in recs] == [
        "http://h0.test/i/1.png",
        "http://h1.test/i/2.png",
    ]
    assert recs[0]["payload"] == p1
    assert recs[0]["headers"]["X-Caption"] == "a cat"
    assert recs[0]["record_id"] == warc.record_id_of("http://h0.test/i/1.png", DATE)
    assert recs[1]["payload"] == b""
    assert recs[0]["warc_type"] == "response"


def test_record_col_matches_python_and_stays_jvm(spark):
    rows = [
        ("http://h0.test/a", DATE, b"\r\n\r\nbin\x00"),
        ("http://h1.test/b?q=1", "2026-01-02T00:00:00Z", b""),
        ("http://h2.test/c", DATE, bytes(range(256))),
    ]
    df = spark.createDataFrame(rows, "uri string, d string, payload binary")
    out = df.select(
        "uri",
        warc.record_col(
            "uri", "d", "payload", extra=[("X-Fmt", F.lit("png"))]
        ).alias("rec"),
    )
    got = {r["uri"]: bytes(r["rec"]) for r in out.collect()}
    for uri, d, p in rows:
        want = warc.build_record(uri, d, p, extra=[("X-Fmt", "png")])
        assert got[uri] == want, uri
    plan = explainkit.formatted_plan(out)
    assert "EvalPython" not in plan, plan


def _image_rows(n=37):
    # deterministic fake images: binary payloads containing CRLF runs
    return [
        (
            f"http://h{i % 5}.test/img/{i}.png",
            DATE,
            (b"\x89PNG\r\n\x1a\n" + bytes([i]) * (50 + i) + b"\r\n\r\n"),
            f"caption {i}",
        )
        for i in range(n)
    ]


def test_segment_roundtrip(spark, tmp_path):
    out_dir = str(tmp_path / "warc")
    df = spark.createDataFrame(
        _image_rows(), "uri string, warc_date string, payload binary, caption string"
    )
    manifest = warc.write_segments(
        df, out_dir, n_segments=4, extra=[("X-Caption", F.col("caption"))]
    ).collect()
    assert sum(m["n_records"] for m in manifest) == 37
    assert all(os.path.exists(m["path"]) for m in manifest)

    back = warc.read_segments(spark, out_dir).collect()
    assert len(back) == 37
    want = {u: (p, c) for u, _, p, c in _image_rows()}
    for r in back:
        p, c = want[r["target_uri"]]
        assert bytes(r["payload"]) == p, r["target_uri"]
        assert r["headers"]["X-Caption"] == c
        assert r["warc_date"] == DATE
        assert r["record_id"] == warc.record_id_of(r["target_uri"], DATE)


def test_segment_bytes_parallelism_independent(spark, tmp_path):
    """Segment files are a pure function of the data: 1-partition and
    8-partition writes produce byte-identical .warc.gz files."""
    rows = _image_rows(29)
    dirs = []
    for i, parts in enumerate((1, 8)):
        out_dir = str(tmp_path / f"w{i}")
        df = spark.createDataFrame(
            rows, "uri string, warc_date string, payload binary, caption string"
        ).repartition(parts)
        warc.write_segments(
            df, out_dir, n_segments=3, extra=[("X-Caption", F.col("caption"))]
        ).collect()
        dirs.append(out_dir)
    a = sorted(glob.glob(os.path.join(dirs[0], "*.warc.gz")))
    b = sorted(glob.glob(os.path.join(dirs[1], "*.warc.gz")))
    assert [os.path.basename(x) for x in a] == [os.path.basename(x) for x in b]
    for fa, fb in zip(a, b):
        with open(fa, "rb") as f1, open(fb, "rb") as f2:
            assert f1.read() == f2.read(), fa


def test_build_parse_roundtrip_hypothesis():
    """Property: any sequence of records with arbitrary binary payloads
    (including embedded record trailers) round-trips exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    rec_st = st.tuples(
        st.from_regex(r"http://h[0-9]\.test/[a-z0-9/]{0,20}", fullmatch=True),
        st.binary(max_size=200),
    )

    @given(st.lists(rec_st, max_size=6))
    @settings(max_examples=100, deadline=None)
    def check(recs):
        blob = b"".join(
            warc.build_record(u, DATE, p, extra=[("X-N", str(i))])
            for i, (u, p) in enumerate(recs)
        )
        parsed = warc.parse_records(blob)
        assert len(parsed) == len(recs)
        for i, ((u, p), r) in enumerate(zip(recs, parsed)):
            assert r["target_uri"] == u
            assert r["payload"] == p
            assert r["headers"]["X-N"] == str(i)

    check()


def test_gzip_members_concatenate():
    """A segment is N independent gzip members; a whole-file decompress
    recovers the concatenated records (what read_segments relies on)."""
    import gzip as _gz

    recs = [warc.build_record(f"http://h0.test/{i}", DATE, bytes([i]) * i)
            for i in range(5)]
    seg = b"".join(warc.gzip_member(r) for r in recs)
    assert _gz.decompress(seg) == b"".join(recs)
    # and mtime pinning makes members byte-stable
    assert warc.gzip_member(recs[0]) == warc.gzip_member(recs[0])


def test_binary_pages_archived_as_resource_records(spark, tmp_path):
    """Content-type-gated pages (binary_pct) reach the WARC archive as
    `resource` records in their own segment set: every oracle-traced
    binary fetch is archived exactly once, body byte-equal to the
    synthetic payload, Content-Type application/octet-stream."""
    import re

    from ccbot_spark import oracle, synthweb
    from ccbot_spark.engine import CrawlEngine

    cfg = synthweb.WebConfig(n_hosts=4, pages_per_host=40, binary_pct=30)
    seeds = synthweb.seed_urls(cfg, 6)
    eng = CrawlEngine(spark, cfg, str(tmp_path / "e"), n_buckets=8,
                      record_trace=True, hot_host_min=10,
                      warc_dir=str(tmp_path / "warc"))
    eng.crawl(seeds, cycles=2)
    want = oracle.crawl(cfg, seeds, cycles=2)
    bins = {e[2] for e in want.trace if e[5] == "binary"}
    assert bins, "fixture must produce binary fetches"
    recs = warc.read_segments(
        spark, str(tmp_path / "warc"), pattern="cycle=*/binary/*.warc.gz"
    ).collect()
    assert {r.target_uri for r in recs} == bins
    assert {r.warc_type for r in recs} == {"resource"}
    for r in recs:
        cyc = int(re.search(r"cycle=(\d+)", r.path).group(1))
        body = synthweb.fetch(
            cfg, r.target_uri, synthweb.content_version(cfg, cyc)
        )
        assert bytes(r.payload).decode() == body
        assert r.headers["Content-Type"] == "application/octet-stream"
