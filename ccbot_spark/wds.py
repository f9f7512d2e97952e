"""WebDataset-style tar shard export for image+caption training data.

The end of the crawl pipeline is a training corpus: image bytes +
caption pairs packed into size-balanced ``.tar`` shards that a data
loader streams sequentially (the public WebDataset convention: one
sample = adjacent tar members sharing a basename — ``{key}.{fmt}`` for
the payload, ``{key}.txt`` for the caption).  Three pieces, each built
for the 100 TB shape:

* **Planning** (:func:`plan_shards`) assigns every sample a shard id
  from a *declared* byte cost (tar framing + raw pixel bytes + caption
  bytes) with a global running total in sample-key order.  Declared
  cost — not encoded blob length — is deliberate: at scale the planner
  runs on the metadata catalog (w, h, caption length) without scanning
  a single blob, and the assignment is a pure relational expression an
  independent SQL engine can replay (the driver's DuckDB oracle does).
  The running total is the two-phase
  :func:`~ccbot_spark.operators.sequencing.global_running_total` — no
  single-partition exchange, unlike a naive ``Window.orderBy``.

* **Writing** (:func:`write_shards`) groups by shard id and emits one
  deterministic tar per shard from an ``applyInPandas`` task: USTAR
  headers with zeroed mtime/uid/gid, members sorted by key, temp-file
  + ``os.replace`` so a retried/speculative duplicate task can never
  leave an interleaved or truncated shard (same atomicity contract as
  warc.write_segments).  Bytes are a pure function of the input rows —
  byte-identical at any parallelism (pytest-enforced).

* **Reading** (:func:`read_shards`) maps each shard file to its sample
  rows: ``binaryFile`` gives one task per shard, the member parse is a
  bounded ``mapInPandas`` (a shard is one loader unit, ~a few hundred
  MiB at scale), and the round trip is exact (pytest-enforced).

A shard is a contiguous key range, so shard boundaries double as
resumable export checkpoints and the manifest (one row per shard) is
the loader's index.
"""

from __future__ import annotations

import io
import os
import tarfile
from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from .operators import sequencing

TAR_BLOCK = 512
#: two trailing zero blocks terminate a tar stream
TAR_EOF = b"\0" * (2 * TAR_BLOCK)

MANIFEST_SCHEMA = (
    "shard_id long, path string, n_samples long, n_bytes long, "
    "key_min string, key_max string"
)
SAMPLE_SCHEMA = "image_id string, fmt string, bytes binary, caption string"


def entry_cost(size: Column) -> Column:
    """Tar on-disk cost of one member: a 512-byte header plus the
    payload rounded up to whole 512-byte blocks.  Kept as a plain
    arithmetic expression so the DuckDB oracle states the same formula
    verbatim."""
    blocks = (size.cast("long") + F.lit(TAR_BLOCK - 1)) / F.lit(TAR_BLOCK)
    return F.lit(TAR_BLOCK) + F.floor(blocks).cast("long") * F.lit(TAR_BLOCK)


def sample_cost(w: Column, h: Column, caption: Column) -> Column:
    """Declared packing cost of one (image, caption) sample: the image
    member priced at raw-pixel bytes (3·w·h — the planner never reads
    the encoded blob) plus the caption member at its UTF-8 length."""
    px = (w.cast("long") * h.cast("long") * F.lit(3)).cast("long")
    return (entry_cost(px) + entry_cost(F.octet_length(caption))).cast("long")


#: ViT patch edge (pixels) — a (w, h) image tokenizes to
#: ceil(w/patch) × ceil(h/patch) patch tokens.
VIT_PATCH = 16


def patch_token_cost(
    w: Column, h: Column, caption: Column, patch: int = VIT_PATCH,
    extra: int = 2,
) -> Column:
    """Context-window cost of one (image, caption) sample for a
    vision-language model: ``ceil(w/patch) · ceil(h/patch)`` image
    patch tokens (the ViT tokenization) + whitespace caption tokens +
    `extra` separator tokens (image-start/end markers). Like
    :func:`sample_cost` this is metadata arithmetic — the planner
    prices a sample from (w, h, caption) without touching pixels, and
    the DuckDB oracle states the same formula verbatim."""
    from .functions import textkit

    pw = (w.cast("long") + F.lit(patch - 1)) / F.lit(patch)
    ph = (h.cast("long") + F.lit(patch - 1)) / F.lit(patch)
    patches = F.floor(pw).cast("long") * F.floor(ph).cast("long")
    return (
        patches + textkit.token_count(caption).cast("long") + F.lit(extra)
    ).cast("long")


def pack_samples(
    df: DataFrame,
    cap: int,
    cost_col: str = "cost",
    shard_col: str = "shard",
    order_col: str = "image_id",
) -> DataFrame:
    """First-fit-in-order packing of whole samples into `cap`-token
    context windows — the multimodal counterpart of
    ``textkit.pack_sequences``, with the one semantic it cannot share:
    an image's patch tokens are NOT splittable, so a sample that would
    straddle a window boundary moves wholly into the next window
    (padding the current one) instead of being cut. That bump makes
    every offset depend on every earlier placement — inherently a
    sequential scan — so packing runs per `shard_col` group inside one
    applyInPandas pass, walking rows in `order_col` order: the shard
    key bounds each scan exactly like pack_sequences' shard bounds its
    window partition (at 10^9 samples, raise the shard count; shards
    pack in parallel, deterministically, on any cluster). Rows whose
    cost exceeds `cap` get pack_id = -1 (unpackable — a filter gate
    upstream should have dropped them; the planner must not silently
    overflow a window).

    Output: input columns + pack_id:long (per-shard window ordinal)
    and fill_offset:long (token offset of the sample inside its
    window)."""
    in_schema = df.schema
    out_fields = list(in_schema.fields) + [
        T.StructField("pack_id", T.LongType(), False),
        T.StructField("fill_offset", T.LongType(), False),
    ]
    cols = [f.name for f in in_schema.fields]

    def pack_one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        packs = []
        offs = []
        pack = 0
        fill = 0
        for c in pdf[cost_col].astype("int64"):
            c = int(c)
            if c > cap:
                packs.append(-1)
                offs.append(0)
                continue
            if fill + c > cap:
                pack += 1
                fill = 0
            packs.append(pack)
            offs.append(fill)
            fill += c
        pdf["pack_id"] = pd.Series(packs, dtype="int64")
        pdf["fill_offset"] = pd.Series(offs, dtype="int64")
        return pdf[cols + ["pack_id", "fill_offset"]]

    return df.groupBy(shard_col).applyInPandas(
        pack_one, schema=T.StructType(out_fields)
    )


def plan_shards(
    df: DataFrame,
    target_bytes: int,
    key_col: str = "image_id",
    cost_col: str = "plan_cost",
    num_partitions: int = 32,
    shard_col: str = "shard_id",
) -> tuple[DataFrame, DataFrame]:
    """Assign each sample a shard id by walking the samples in global
    `key_col` order and cutting a new shard each time the running cost
    crosses a `target_bytes` boundary:

        shard_id = floor((running_cost_before_this_sample) / target)

    Equivalently, in SQL:

        FLOOR((SUM(cost) OVER (ORDER BY key ROWS UNBOUNDED PRECEDING)
               - cost) / target)

    A sample that straddles a boundary stays in the shard it started
    in, so every shard except the last carries at least `target_bytes`
    of declared cost and overshoots by less than one sample — the
    standard contiguous-range packing a sequential loader wants.

    Returns ``(assigned_df, cache_handle)``; caller unpersists the
    handle after consuming the result.
    """
    run, _total, cache = sequencing.global_running_total(
        df, [key_col], cost_col, num_partitions, out_col="_run"
    )
    out = run.withColumn(
        shard_col,
        F.floor(
            (F.col("_run") - F.col(cost_col)) / F.lit(int(target_bytes))
        ).cast("long"),
    ).drop("_run")
    return out, cache


def plan_shards_grouped(
    df: DataFrame,
    target_bytes: int,
    group_col: str,
    key_col: str = "image_id",
    cost_col: str = "plan_cost",
    num_partitions: int = 32,
    shard_col: str = "shard_id",
) -> tuple[DataFrame, DataFrame]:
    """GROUP-PURE shard planning: like plan_shards, but a shard never
    mixes groups — the fixed-shape training-export contract (after
    bucket_resize, every sample in an aspect bucket has the same
    (w, h), so a group-pure shard is a fixed-tensor-shape shard a
    loader can batch without padding or reshaping).

    Scale shape: one two-phase running total over the GLOBAL
    (group, key) order — groups are contiguous in that order, so the
    within-group running cost is (run_before − group_offset) where
    group_offset = min(run_before) per group. Group offsets and shard
    bases are per-group aggregates (one row per group — the aspect
    ladder has 5), so the only extra cost over plan_shards is a
    group-cardinality-sized broadcast join; the corpus never sees a
    per-group window partition (which would funnel 1/|groups| of a
    10^10-row corpus through one task).

    Shard ids are globally sequential in (group, key) order:
    base(group) = Σ n_shards(earlier groups), computed with a window
    over the GROUP-CARDINALITY-sized aggregate (bounded rows, not
    data). Returns (assigned_df, cache_handle) like plan_shards; the
    assigned frame keeps group_col so consumers can assert purity."""
    from pyspark.sql.window import Window

    run, _total, cache = sequencing.global_running_total(
        df, [group_col, key_col], cost_col, num_partitions, out_col="_run"
    )
    before = F.col("_run") - F.col(cost_col)
    t = F.lit(int(target_bytes))
    offs = run.groupBy(group_col).agg(
        F.min(before).alias("_goff"),
        # the group's LAST sample (max key): its 'before' value is the
        # largest within-group running cost any shard cut can see — a
        # straddling last sample stays in the shard it started in, so
        # n_shards = floor(last_before/target) + 1, NOT ceil(total/t)
        F.max(F.struct(F.col(key_col), before.alias("_b"))).alias("_last"),
    )
    local = F.col("_x") - F.pmod(F.col("_x"), t)
    last_before = F.col("_last._b") - F.col("_goff")
    n_local = (last_before - F.pmod(last_before, t)) / t + 1
    w_base = Window.orderBy(group_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    bases = offs.select(
        group_col,
        "_goff",
        F.coalesce(
            F.sum(n_local.cast("long")).over(w_base), F.lit(0)
        ).alias("_base"),
    )
    out = (
        run.join(F.broadcast(bases), group_col)
        .withColumn("_x", before - F.col("_goff"))
        .withColumn(
            shard_col, (F.col("_base") + local / t).cast("long")
        )
        .drop("_run", "_x", "_goff", "_base")
    )
    return out, cache


def _tar_member(name: str, payload: bytes) -> bytes:
    """One USTAR member with all non-content fields pinned (mtime 0,
    uid/gid 0, empty uname/gname) so the bytes depend only on
    (name, payload)."""
    info = tarfile.TarInfo(name=name)
    info.size = len(payload)
    info.mtime = 0
    info.uid = 0
    info.gid = 0
    info.uname = ""
    info.gname = ""
    info.mode = 0o644
    buf = io.BytesIO()
    # format pinned explicitly; keys here are short, USTAR suffices
    t = tarfile.TarFile(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT)
    t.addfile(info, io.BytesIO(payload))
    t.fileobj.flush()
    raw = buf.getvalue()
    # TarFile.close() would append EOF blocks; we concatenate members
    # ourselves and add one EOF at the end of the shard.
    return raw


def write_shards(
    assigned: DataFrame,
    out_dir: str,
    prefix: str = "shard",
    key_col: str = "image_id",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    caption_col: str = "caption",
    shard_col: str = "shard_id",
) -> DataFrame:
    """Write one ``{out_dir}/{prefix}-{shard:06d}.tar`` per shard id.
    Members are ``{key}.{fmt}`` (payload) then ``{key}.txt`` (caption,
    UTF-8), samples sorted by key within the shard.  Returns a LAZY
    one-row-per-shard manifest (MANIFEST_SCHEMA); consuming it performs
    the write."""
    os.makedirs(out_dir, exist_ok=True)
    data = assigned.select(
        F.col(shard_col).alias("shard_id"),
        F.col(key_col).alias("key"),
        F.col(fmt_col).alias("fmt"),
        F.col(bytes_col).alias("payload"),
        F.col(caption_col).alias("caption"),
    )

    def write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("key", kind="mergesort")
        sid = int(pdf["shard_id"].iloc[0])
        path = os.path.join(out_dir, f"{prefix}-{sid:06d}.tar")
        buf = bytearray()
        for row in pdf.itertuples(index=False):
            buf += _tar_member(f"{row.key}.{row.fmt}", bytes(row.payload))
            buf += _tar_member(f"{row.key}.txt", row.caption.encode("utf-8"))
        buf += TAR_EOF
        # temp + atomic rename: duplicate speculative writers each
        # produce the same deterministic bytes; last os.replace wins
        # whole (same contract as warc.write_segments)
        tmp = f"{path}.tmp.{os.getpid()}.{id(buf)}"
        with open(tmp, "wb") as fh:
            fh.write(bytes(buf))
        os.replace(tmp, path)
        return pd.DataFrame(
            [
                {
                    "shard_id": sid,
                    "path": path,
                    "n_samples": len(pdf),
                    "n_bytes": len(buf),
                    "key_min": pdf["key"].iloc[0],
                    "key_max": pdf["key"].iloc[-1],
                }
            ]
        )

    return data.groupBy("shard_id").applyInPandas(write_group, MANIFEST_SCHEMA)


def read_shards(
    spark: SparkSession, out_dir: str, pattern: str = "*.tar"
) -> DataFrame:
    """Read shard files back as one sample per row (SAMPLE_SCHEMA).
    One ``binaryFile`` task per shard; the tar parse is stdlib
    ``tarfile`` over an in-memory buffer — a shard is one loader unit,
    bounded by the planner's target size."""
    files = spark.read.format("binaryFile").load(os.path.join(out_dir, pattern))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                t = tarfile.TarFile(fileobj=io.BytesIO(bytes(blob)), mode="r")
                samples: dict[str, dict] = {}
                for m in t.getmembers():
                    stem, ext = m.name.rsplit(".", 1)
                    s = samples.setdefault(stem, {})
                    data = t.extractfile(m).read()
                    if ext == "txt":
                        s["caption"] = data.decode("utf-8")
                    else:
                        s["fmt"] = ext
                        s["bytes"] = data
                for key in sorted(samples):
                    s = samples[key]
                    rows.append((key, s["fmt"], s["bytes"], s["caption"]))
            yield pd.DataFrame(
                rows, columns=["image_id", "fmt", "bytes", "caption"]
            )

    return files.select("content").mapInPandas(parse, SAMPLE_SCHEMA)


def lookup(
    spark: SparkSession,
    manifest: list[dict] | DataFrame,
    key: str,
) -> dict | None:
    """Point-read one sample by key WITHOUT a corpus scan — the WDS
    twin of the CDX promise. Shards are contiguous key ranges, so the
    manifest's (key_min, key_max) pins the one shard that can hold the
    key; only that tar is opened (driver-side stdlib read: a shard is
    one loader unit, and a point lookup should not launch a Spark job).
    Returns {image_id, fmt, bytes, caption} or None."""
    import tarfile as _tar

    if isinstance(manifest, DataFrame):
        manifest = [r.asDict() for r in manifest.collect()]
    hit = [
        m for m in manifest if m["key_min"] <= key <= m["key_max"]
    ]
    if not hit:
        return None
    out: dict = {}
    with open(hit[0]["path"], "rb") as fh:
        t = _tar.TarFile(fileobj=io.BytesIO(fh.read()), mode="r")
        for m in t.getmembers():
            stem, ext = m.name.rsplit(".", 1)
            if stem != key:
                continue
            data = t.extractfile(m).read()
            if ext == "txt":
                out["caption"] = data.decode("utf-8")
            else:
                out["fmt"] = ext
                out["bytes"] = data
    if not out:
        return None
    out["image_id"] = key
    return out
