"""URL-domain Spark operators (SURVEY.md §2.2).

Vectorized wrappers over the pure-Python cores in ``ccbot_spark.urlkit``
plus JVM-side built-ins where they exist:

  * ``f_url_hash``  → built-in ``xxhash64`` (JVM, whole-stage codegen)
  * ``f_host``      → built-in ``parse_url(url, 'HOST')``
  * ``f_host_salt`` → ``pmod(xxhash64(host), P)`` (+ per-URL sub-salt
    for hot hosts)
  * ``f_url_normalize`` → Arrow-batched pandas_udf over urlkit (no
    JVM equivalent; the only Python hop in the URL path)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import urlkit


@F.pandas_udf(T.StringType())
def normalize_udf(urls: pd.Series) -> pd.Series:
    return urlkit.normalize_series(urls)


@F.pandas_udf(T.StringType())
def host_udf(urls: pd.Series) -> pd.Series:
    return urlkit.host_series(urls)


def url_hash(col) -> Column:
    """Stable 64-bit URL hash — JVM-side xxhash64 (no Python hop)."""
    return F.xxhash64(col)


def host_bucket(host_col, n_buckets: int) -> Column:
    """Frontier/metrics partition key: pmod(xxhash64(host), P)."""
    return F.pmod(F.xxhash64(host_col), F.lit(n_buckets)).cast("int")


def url_bucket(url_hash_col, n_buckets: int) -> Column:
    """Seen-set partition key: pmod(url_hash, P)."""
    return F.pmod(url_hash_col, F.lit(n_buckets)).cast("int")


def host_salt(host_col, url_col, hot_hosts: list[str], fanout: int) -> Column:
    """Fetch-group key (SURVEY.md §4 skew handling): hot hosts fan out
    to `fanout` sub-groups by URL hash; politeness stays correct because
    sched_time is computed per-host BEFORE salting (§7.4 item 3)."""
    if not hot_hosts or fanout <= 1:
        return host_col
    sub = F.pmod(F.xxhash64(url_col), F.lit(fanout)).cast("string")
    return F.when(
        host_col.isin(list(hot_hosts)), F.concat(host_col, F.lit("#"), sub)
    ).otherwise(host_col)


def filter_scheme(df, url_col: str = "url_norm"):
    """Keep fetchable http(s) URLs (normalize_udf already guarantees this
    for its outputs; this is the standalone operator form)."""
    return df.filter(F.col(url_col).rlike("^https?://"))
