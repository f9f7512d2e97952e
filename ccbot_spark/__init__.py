"""ccbot_spark — a PySpark-native crawl-analytics engine.

A from-scratch reimplementation of the capabilities of the reference
crawler (ynzheng/ccbot; see SURVEY.md §0 — the reference checkout is
empty, so the behavioral contract is BASELINE.json's north_rule plus
the single-threaded oracle crawler in ``ccbot_spark.oracle``, which is
the spec-as-code).

Layout:
    schemas      — explicit StructTypes for every table
    urlkit       — URL normalization / host extraction (pure-Python core)
    robots       — RFC 9309 robots.txt parse + longest-match (pure core)
    codecs       — PPM / PNG / qPNG image codecs (numpy + stdlib zlib)
    phash        — 64-bit DCT perceptual hash
    synthweb     — deterministic synthetic web (pages, images, robots)
    oracle       — single-threaded reference crawler (defines truth)
    tablestore   — Iceberg-emulated Parquet table store (MERGE INTO,
                   snapshots, sorted writes)
    operators/   — Spark DataFrame operators (frontier, seen, politeness,
                   fetch/parse, images, metrics, dedup, similarity, text)
    engine       — the cycle-loop crawl engine (SURVEY.md §3.1)
    streaming/   — Structured Streaming metrics path
"""

__version__ = "0.1.0"
