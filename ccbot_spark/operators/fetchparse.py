"""Fetch + parse stages (SURVEY.md §2.7 u_fetch / u_extract_links /
u_extract_images, §3.1 steps 2-4).

The fetch stage is ``groupBy(salt_key).applyInPandas`` — each Python
worker owns disjoint host buckets (BASELINE.json north_star), fetches
that host's URLs in sched_time order, and (optionally, for a real
network) sleeps out the crawl-delay between requests. With the
synthetic web the fetch is a pure function of the URL, so wall-clock
enforcement is off by default and politeness is the *logical* schedule
(sched_time) that also defines the reproducible crawl order.

Hot-host skew: the salt key fans one hot host out to several groups
(urlops.host_salt). This is safe because sched_time was computed
per-host BEFORE salting (SURVEY.md §7.4 item 3) — salting parallelizes
execution, not the schedule.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import parsekit, schemas, synthweb
from . import urlops

LINKS_SCHEMA = T.StructType(
    [
        T.StructField("url_norm", T.StringType(), False),  # the outlink
        T.StructField("page_host", T.StringType(), False),
        T.StructField("parent_priority", T.LongType(), False),
    ]
)

IMGS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("img_url", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("page_host", T.StringType(), False),
        T.StructField("page_url", T.StringType(), False),
        T.StructField("sched_time", T.LongType(), False),
        T.StructField("img_idx", T.IntegerType(), False),
    ]
)


def fetch(
    batch: DataFrame,
    cfg: synthweb.WebConfig,
    hot_hosts: list[str] | None = None,
    salt_fanout: int = 8,
    enforce_delay_wallclock: bool = False,
    delay_scale: float = 1.0,
    fetch_partitions: int | None = None,
) -> DataFrame:
    """batch: generate()['fetch'] → FETCHED DF (html attached).

    Shuffle boundary: one repartition by salt key; each group is one
    host (or one hot-host sub-bucket).

    fetch_partitions: explicit parallelism for the fetch stage only.
    The fetch is delay/IO-bound, so it wants MANY more partitions than
    cores for balance — while the rest of the cycle's (byte-bound)
    shuffles stay at spark.sql.shuffle.partitions with AQE coalescing.
    An explicit repartition(N, key) is never coalesced by AQE, and the
    following groupBy on the same key reuses the partitioning (no
    second exchange).
    """
    salted = batch.withColumn(
        "salt_key",
        urlops.host_salt(F.col("host"), F.col("url_norm"), hot_hosts or [], salt_fanout),
    )
    if fetch_partitions:
        salted = salted.repartition(fetch_partitions, F.col("salt_key"))

    def fetch_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["sched_time", "url_norm"], kind="mergesort")
        htmls, oks = [], []
        last = None
        for url, st, rt in zip(pdf["url_norm"], pdf["sched_time"], pdf["retries"]):
            if enforce_delay_wallclock and last is not None:
                # delay_scale compresses the politeness clock for
                # benchmarks (the real crawl is delay/IO-bound; this
                # models it at a tunable time scale without changing
                # the logical schedule or the trace)
                delta_ms = (st - last) * delay_scale
                if delta_ms > 0:
                    time.sleep(delta_ms / 1000.0)
            ok = synthweb.fetch_ok(cfg, url, int(rt))
            oks.append(ok)
            htmls.append(synthweb.fetch(cfg, url) if ok else "")
            last = st
        out = pdf[["url_norm", "host", "priority", "sched_slot", "sched_time", "retries"]].copy()
        out["html"] = htmls
        out["ok"] = pd.Series(oks, index=out.index, dtype=bool)
        return out

    return salted.groupBy("salt_key").applyInPandas(fetch_group, schema=schemas.FETCHED)


def extract_links(fetched: DataFrame) -> DataFrame:
    """One row per extracted (already normalized) outlink occurrence."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, hosts, pris = [], [], []
            for page_url, host, pri, html in zip(
                pdf["url_norm"], pdf["host"], pdf["priority"], pdf["html"]
            ):
                for link in parsekit.extract_links(page_url, html):
                    urls.append(link)
                    hosts.append(host)
                    pris.append(pri)
            out = pd.DataFrame(
                {"url_norm": urls, "page_host": hosts, "parent_priority": pris}
            )
            out["parent_priority"] = out["parent_priority"].astype("int64")
            yield out

    return fetched.mapInPandas(gen, schema=LINKS_SCHEMA)


def extract_images(fetched: DataFrame) -> DataFrame:
    """One row per (img_url, caption) pair with page-order keys for the
    deterministic phash-dedup tie-break (SURVEY.md §7.5)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "img_url": [], "caption": [], "page_host": [],
                "page_url": [], "sched_time": [], "img_idx": [],
            }
            for page_url, host, st, html in zip(
                pdf["url_norm"], pdf["host"], pdf["sched_time"], pdf["html"]
            ):
                for idx, (img_url, cap) in enumerate(
                    parsekit.extract_images(page_url, html)
                ):
                    rows["img_url"].append(img_url)
                    rows["caption"].append(cap)
                    rows["page_host"].append(host)
                    rows["page_url"].append(page_url)
                    rows["sched_time"].append(st)
                    rows["img_idx"].append(idx)
            out = pd.DataFrame(rows)
            out["sched_time"] = out["sched_time"].astype("int64")
            out["img_idx"] = out["img_idx"].astype("int32")
            yield out

    return fetched.mapInPandas(gen, schema=IMGS_RAW_SCHEMA)
