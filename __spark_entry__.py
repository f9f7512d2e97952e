"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Design discipline for oracle-matched queries:
  * integer-first outputs — money as cents (round(x*100) → bigint),
    timestamps as epoch millis, ratios as (numerator, denominator)
    pairs — so no float-representation or fp-summation-order hazard
    can break the value hash between Spark and DuckDB;
  * every computed column aliased identically on both sides;
  * thresholds as integer cross-multiplications (10*inter >= t*union).

Entries without an oracle (rows-only check) are the genuinely
non-SQL-expressible ops: xxhash64-keyed url hash/salt (xxhash64 is
Spark-only; the ENGINE keeps it — it is the right hash at scale — so
the demo queries stay rows-only rather than misrepresenting the
operator), python-urlkit URL normalization, the binary image
decode pipeline (img_pipeline), the pixel-hash family
(img_hash_family), and the FFT-based robust audio fingerprint
(aud_fingerprint_near). Each of those has a stronger dedicated
check in tests/ (property tests vs pure-Python references; see
SURVEY.md §5). The md5-seeded ops (MinHash, SimHash, fingerprint,
embedding-LSH near-dup, ANN LSH, img_phash_near's banded Hamming
join) ARE oracled: both engines derive the hash from md5 hex with
explicit integer arithmetic.
"""


from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ccbot_spark.functions import dedup, linkrank
from ccbot_spark.registry import ALL_MODULES

# Shared helpers live in ccbot_spark.registry.common since the round-5
# per-domain registry split; re-exported here so external spot-check
# scripts and docs keep working. The driver-facing surface of THIS file
# (entry / queries / oracle_sql / clear_caches) is unchanged.
from ccbot_spark.registry.common import (  # noqa: F401
    _ACTIVE_CACHES,
    _cents,
    _doc_urls,
    _mixed_scheme_urls,
    _sql_h64,
    _t,
    q_a_metrics,
)


def clear_caches() -> None:
    """Release plan caches registered by queries() entries (safe once no
    returned DataFrame is still in use); also clears the dedup and
    linkrank modules' — including their localCheckpoint blocks, which
    plain unpersist cannot free (ccbot_spark.storagekit)."""
    while _ACTIVE_CACHES:
        _ACTIVE_CACHES.pop().unpersist()
    dedup.clear_caches()
    linkrank.clear_caches()
    from ccbot_spark.functions import textkit as _tk
    from ccbot_spark.functions import videokit as _vk

    _vk.clear_caches()
    _tk.clear_bpe_caches()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_a_metrics(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in ALL_MODULES:
        mod.register(q)
    return q


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}
    for mod in ALL_MODULES:
        mod.register_sql(o)
    return o
