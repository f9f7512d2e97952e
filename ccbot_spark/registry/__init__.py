"""Per-domain query/oracle registry (round-5 split of __spark_entry__).

Each module owns one domain's driver-contract entries and contributes
them via register(q) / register_sql(o); __spark_entry__.queries() and
.oracle_sql() merge all modules in a fixed order, so the driver-facing
dict contents are byte-identical to the pre-split single file.
"""

from ccbot_spark.registry import (  # noqa: F401
    audioq,
    crawlq,
    dedupq,
    eventq,
    imageq,
    relational,
    sampleq,
    textq,
    videoq,
)

#: merge order (original single-file section order preserved; new
#: round-5 domains appended)
ALL_MODULES = (
    relational,
    crawlq,
    eventq,
    dedupq,
    textq,
    sampleq,
    imageq,
    audioq,
    videoq,
)
