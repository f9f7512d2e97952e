"""WARC segment sink/source (snk_warc / src_warc).

WARC (ISO 28500) is the standard web-archive container a production
crawler ships alongside its tables — one gzip member per record,
members concatenated into rotated ``*.warc.gz`` segment files so a
reader can split at member boundaries.  This module keeps the Spark
side Spark-shaped:

  * **record building is JVM-only** — ``record_col`` assembles the
    full record (headers + payload + trailer) as one binary column
    with ``concat``/``encode``/``md5``/``length`` inside whole-stage
    codegen; no Python touches the 10^10-record hot path
    (plan-tested).  The pure-python twin ``build_record`` is the
    byte-exact reference the tests compare against.
  * **segment writing** routes records to segments by
    ``pmod(xxhash64(uri), n_segments)`` and writes one file per
    segment group via ``applyInPandas`` — one task per segment, records
    sorted by URI within the segment and gzip mtime pinned to 0, so
    segment bytes are a pure function of the data (parallelism-
    independent, asserted by tests).
  * **reading** uses Spark's ``binaryFile`` source (one task per
    segment file — the reader parallelizes exactly as wide as the
    segment count) and a ``mapInPandas`` member-parse.

Scale posture: segment count is the rotation knob — at 100 TB choose
``n_segments ≈ data / 1 GiB`` (the Common Crawl rotation convention)
so each write task owns ~1 GiB and each read task decompresses one
bounded file.  ``out_dir`` must be shared storage on a real cluster
(HDFS/S3 via a mounted path); the sandbox writes to local disk.
"""

from __future__ import annotations

import gzip
import hashlib
import os

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_VERSION = "WARC/1.1"

# WARC-Profile for revisit records whose payload is byte-identical to
# an earlier capture (the only revisit profile the engine emits; the
# duplicate's digest rides in WARC-Payload-Digest, body is empty).
REVISIT_PROFILE = "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest"

# Manifest row per written segment file.
MANIFEST_SCHEMA = "segment int, path string, n_records long, n_bytes long"

# Per-record index row (record_index=True): the CDX promise — a record
# is retrievable by seek(offset) + read(length) + gunzip, no scan.
INDEX_SCHEMA = "segment int, path string, uri string, offset long, length long"

RECORD_SCHEMA = (
    "path string, warc_type string, record_id string, warc_date string,"
    " target_uri string, headers map<string,string>, payload binary"
)


# ---------------------------------------------------------------------
# Pure-python reference (used by the oracle side of tests; byte-exact
# twin of record_col)
# ---------------------------------------------------------------------

def record_id_of(uri: str, date: str) -> str:
    """Deterministic record id — md5 of (uri, date); no wall clock, no
    randomness, so re-running a cycle re-creates identical records."""
    h = hashlib.md5((uri + "\n" + date).encode("utf-8")).hexdigest()
    return f"<urn:md5:{h}>"


def build_record(
    uri: str,
    date: str,
    payload: bytes,
    warc_type: str = "response",
    content_type: str = "application/octet-stream",
    extra: list[tuple[str, str]] | None = None,
) -> bytes:
    """One raw (uncompressed) WARC record: version line, fixed header
    order, blank line, payload, CRLF CRLF trailer."""
    lines = [
        WARC_VERSION,
        f"WARC-Type: {warc_type}",
        f"WARC-Record-ID: {record_id_of(uri, date)}",
        f"WARC-Date: {date}",
        f"WARC-Target-URI: {uri}",
    ]
    for k, v in extra or []:
        lines.append(f"{k}: {v}")
    lines.append(f"Content-Type: {content_type}")
    lines.append(f"Content-Length: {len(payload)}")
    head = ("\r\n".join(lines) + "\r\n\r\n").encode("utf-8")
    return head + payload + b"\r\n\r\n"


def parse_records(blob: bytes) -> list[dict]:
    """Parse concatenated raw records (a decompressed segment).  The
    payload is length-delimited by Content-Length, so CRLF sequences
    inside binary payloads never confuse the scan."""
    out: list[dict] = []
    pos = 0
    n = len(blob)
    while pos < n:
        hdr_end = blob.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError(f"truncated WARC header at byte {pos}")
        head = blob[pos:hdr_end].decode("utf-8")
        lines = head.split("\r\n")
        if lines[0] != WARC_VERSION:
            raise ValueError(f"bad WARC version line: {lines[0]!r}")
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(": ")
            headers[k] = v
        length = int(headers["Content-Length"])
        body_start = hdr_end + 4
        payload = blob[body_start : body_start + length]
        if blob[body_start + length : body_start + length + 4] != b"\r\n\r\n":
            raise ValueError("missing record trailer")
        out.append(
            {
                "warc_type": headers.get("WARC-Type", ""),
                "record_id": headers.get("WARC-Record-ID", ""),
                "warc_date": headers.get("WARC-Date", ""),
                "target_uri": headers.get("WARC-Target-URI", ""),
                "headers": headers,
                "payload": payload,
            }
        )
        pos = body_start + length + 4
    return out


def gzip_member(record: bytes) -> bytes:
    """One gzip member per record (the standard .warc.gz layout);
    mtime pinned to 0 for byte-deterministic segments."""
    return gzip.compress(record, mtime=0)


# ---------------------------------------------------------------------
# Spark side
# ---------------------------------------------------------------------

def record_col(
    uri_col,
    date_col,
    payload_col,
    warc_type: str = "response",
    content_type: str = "application/octet-stream",
    extra: list[tuple[str, Column]] | None = None,
) -> Column:
    """The full WARC record as ONE binary column, built entirely
    JVM-side (byte-identical to ``build_record``; plan-tested to
    contain no Python eval).  ``extra`` adds per-row headers
    (name, string Column) between WARC-Target-URI and Content-Type —
    the engine uses them to carry caption/format so the archive is
    self-describing without a sidecar table."""
    uri = F.col(uri_col) if isinstance(uri_col, str) else uri_col
    date = F.col(date_col) if isinstance(date_col, str) else date_col
    payload = F.col(payload_col) if isinstance(payload_col, str) else payload_col
    parts = [
        F.lit(
            f"{WARC_VERSION}\r\nWARC-Type: {warc_type}\r\n"
            "WARC-Record-ID: <urn:md5:"
        ),
        F.md5(F.concat(uri, F.lit("\n"), date)),
        F.lit(">\r\nWARC-Date: "),
        date,
        F.lit("\r\nWARC-Target-URI: "),
        uri,
    ]
    for name, col in extra or []:
        parts += [F.lit(f"\r\n{name}: "), col]
    parts += [
        F.lit(f"\r\nContent-Type: {content_type}\r\nContent-Length: "),
        F.length(payload).cast("string"),
        F.lit("\r\n\r\n"),
    ]
    head = F.encode(F.concat(*parts), "UTF-8")
    return F.concat(head, payload, F.lit(b"\r\n\r\n"))


def write_segments(
    df: DataFrame,
    out_dir: str,
    uri_col: str = "uri",
    date_col: str = "warc_date",
    payload_col: str = "payload",
    n_segments: int = 8,
    prefix: str = "segment",
    warc_type: str = "response",
    content_type: str = "application/octet-stream",
    extra: list[tuple[str, Column]] | None = None,
    record_index: bool = False,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Write df as ``{out_dir}/{prefix}-{seg:05d}.warc.gz`` segment
    files, one per ``pmod(xxhash64(uri), n_segments)`` bucket, records
    sorted by URI within each segment.  Returns a LAZY DataFrame —
    consuming it performs the write.

    record_index=False: one manifest row per non-empty segment
    (MANIFEST_SCHEMA).  record_index=True: one row PER RECORD with its
    (path, offset, length) gzip-member span — the CDX index promise:
    any record is retrievable with seek+read+gunzip, no segment scan.
    ``carry_cols`` names df columns to pass through onto index rows
    (e.g. a JVM-computed content digest)."""
    os.makedirs(out_dir, exist_ok=True)
    rec = record_col(
        uri_col,
        date_col,
        payload_col,
        warc_type=warc_type,
        content_type=content_type,
        extra=extra,
    )
    seg = F.pmod(F.xxhash64(F.col(uri_col)), F.lit(n_segments)).cast("int")
    data = df.select(
        seg.alias("segment"),
        F.col(uri_col).alias("uri"),
        rec.alias("record"),
        *[F.col(c) for c in carry_cols],
    )

    def write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("uri", kind="mergesort")
        segid = int(pdf["segment"].iloc[0])
        path = os.path.join(out_dir, f"{prefix}-{segid:05d}.warc.gz")
        buf = bytearray()
        rows = []
        for _, row in pdf.iterrows():
            member = gzip_member(bytes(row["record"]))
            if record_index:
                out_row = {
                    "segment": segid,
                    "path": path,
                    "uri": row["uri"],
                    "offset": len(buf),
                    "length": len(member),
                }
                for c in carry_cols:
                    out_row[c] = row[c]
                rows.append(out_row)
            buf += member
        # temp-name + atomic rename: a retried or speculative duplicate
        # of this task writes its own temp file and the last completed
        # os.replace wins whole — never an interleaved/truncated
        # segment (r3 ADVICE fix; intended bytes are deterministic, so
        # either winner is byte-identical)
        tmp = f"{path}.tmp.{os.getpid()}.{id(buf)}"
        with open(tmp, "wb") as fh:
            fh.write(bytes(buf))
        os.replace(tmp, path)
        if not record_index:
            rows = [
                {
                    "segment": segid,
                    "path": path,
                    "n_records": len(pdf),
                    "n_bytes": len(buf),
                }
            ]
        return pd.DataFrame(rows)

    if record_index:
        carry_fields = ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in df.schema.fields
            if f.name in carry_cols
        )
        schema = INDEX_SCHEMA + (", " + carry_fields if carry_fields else "")
    else:
        schema = MANIFEST_SCHEMA
    return data.groupBy("segment").applyInPandas(write_group, schema)


def read_segments(spark: SparkSession, out_dir: str, pattern: str = "*.warc.gz") -> DataFrame:
    """Read segment files back as one record per row.  binaryFile gives
    one task per segment file; the member parse is a bounded
    mapInPandas (a segment is one rotation unit, ~1 GiB at scale)."""
    files = spark.read.format("binaryFile").load(os.path.join(out_dir, pattern))

    def parse(batches):
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                raw = gzip.decompress(bytes(content))  # multi-member OK
                for r in parse_records(raw):
                    rows.append(
                        {
                            "path": path,
                            "warc_type": r["warc_type"],
                            "record_id": r["record_id"],
                            "warc_date": r["warc_date"],
                            "target_uri": r["target_uri"],
                            "headers": r["headers"],
                            "payload": r["payload"],
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return files.select("path", "content").mapInPandas(parse, RECORD_SCHEMA)


def fetch_records(spark: SparkSession, cdx: DataFrame) -> DataFrame:
    """Random-access record retrieval driven by a CDX index subset:
    group the requested spans by segment file (one task per file, one
    open per task), seek+read+gunzip each member — cost ∝ records
    requested, never a segment scan.  This is the read path a
    100 TB archive serves point lookups with: filter the cdx table
    (partition-pruned / predicate-pushed) down to the captures you
    want, then fetch exactly those byte ranges."""

    def read_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("offset", kind="mergesort")
        path = pdf["path"].iloc[0]
        rows = []
        with open(path, "rb") as fh:
            for off, ln in zip(pdf["offset"], pdf["length"]):
                fh.seek(int(off))
                member = fh.read(int(ln))
                for r in parse_records(gzip.decompress(member)):
                    rows.append(
                        {
                            "path": path,
                            "warc_type": r["warc_type"],
                            "record_id": r["record_id"],
                            "warc_date": r["warc_date"],
                            "target_uri": r["target_uri"],
                            "headers": r["headers"],
                            "payload": r["payload"],
                        }
                    )
        return pd.DataFrame(rows)

    return cdx.select("path", "offset", "length").groupBy("path").applyInPandas(
        read_group, RECORD_SCHEMA
    )
