"""HyperLogLog distinct-count sketches, engine-neutral and
integer-exact at the register level (SURVEY §2.4 sketch family, next
to the Bloom/cuckoo seen-set filters in operators/seen.py).

Why not approx_count_distinct: Spark's built-in HLL++ is a black-box
double and its binary sketch is not portable, so it can neither be
oracled nor handed to another engine. Here the REGISTER TABLE is the
artifact: md5-keyed (the house engine-neutral hash), registers and
rho values are small exact integers reproducible bit-for-bit by any
engine (DuckDB mirrors the construction in SQL — a_hll_registers),
and merging sketches across shards / days / engines is a plain
groupBy-max. The float estimate is derived OUTSIDE the exactness
boundary (hll_estimate / hll_estimate_py, tested against true
cardinalities within the published error bound).

Construction (Flajolet et al. 2007, public algorithm):

    h        = md5(key)                     # 128-bit hex
    register = Horner(first p/4 hex chars)  # p-bit bucket index
    v        = Horner(next w/4 hex chars)   # w-bit suffix
    rho      = w - len(bin(v)) + 1  (v > 0) else w + 1
    sketch   = per (group, register): max(rho)

len(bin(v)) is floor(log2 v)+1 computed EXACTLY on the integer —
never float log2, whose rounding at v near 2^k differs per libm and
would flip rho between engines.

Scale posture: building the sketch is one scan + one hash-agg whose
output is #groups × 2^p tiny integer rows (p=8 → ≤256 rows/group) —
the whole point at 10^10 URLs: per-host distinct counts without a
distinct shuffle of the URLs themselves, mergeable across partitions,
snapshots, and clusters by elementwise max."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hex_fold(col, start: int, length: int):
    """conv(substr(md5,...),16,10) — exact int from `length` hex chars
    (length ≤ 15 keeps it under 60 bits, int64-safe)."""
    return F.conv(F.substring(col, start, length), 16, 10).cast("long")


def hll_registers(
    df: DataFrame,
    key: str,
    group: str,
    p: int = 8,
    suffix_hex: int = 12,
) -> DataFrame:
    """DF[group, register long, max_rho long] — the mergeable HLL
    sketch of count-distinct(key) per group. p must be a multiple of 4
    (whole hex chars); suffix_hex ≤ 15 (int64 Horner bound)."""
    if p % 4 or not 4 <= p <= 16:
        raise ValueError("p must be a multiple of 4 in [4, 16]")
    if suffix_hex > 15:
        raise ValueError("suffix_hex > 15 overflows the int64 fold")
    w = 4 * suffix_hex
    h = F.md5(F.col(key).cast("string"))
    reg = _hex_fold(h, 1, p // 4)
    v = _hex_fold(h, p // 4 + 1, suffix_hex)
    rho = (
        F.when(v == 0, F.lit(w + 1))
        .otherwise(F.lit(w) - F.length(F.bin(v)) + 1)
        .cast("long")
    )
    return (
        df.select(F.col(group), reg.alias("register"), rho.alias("rho"))
        .groupBy(group, "register")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union sketches (same schema) — sketch of the union of the
    underlying key sets: elementwise max per (group, register)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    cols = [c for c in out.columns if c not in ("register", "max_rho")]
    return out.groupBy(*cols, "register").agg(
        F.max("max_rho").alias("max_rho")
    )


def hll_estimate_py(registers: dict, p: int = 8) -> float:
    """Standard HLL estimator (raw + linear-counting small-range
    correction) from a {register: max_rho} dict; registers absent from
    the dict are zero. Derived value — OUTSIDE the exactness boundary;
    tests bound its error against true cardinalities."""
    m = 1 << p
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1 + 1.079 / m)
    )
    s = sum(2.0 ** -registers.get(j, 0) for j in range(m))
    raw = alpha * m * m / s
    zeros = sum(1 for j in range(m) if registers.get(j, 0) == 0)
    if raw <= 2.5 * m and zeros:
        return m * math.log(m / zeros)
    return raw


def hll_estimates(sketch: DataFrame, group: str, p: int = 8) -> DataFrame:
    """DF[group, est double] — the estimator applied per group,
    entirely in JVM expressions (one hash-agg over the register rows;
    the 2^-rho sum and the zero-register count fold in one pass)."""
    m = 1 << p
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1 + 1.079 / m)
    )
    agg = sketch.groupBy(group).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("_s"),
        F.count("*").alias("_nz"),
    )
    s = F.col("_s") + (F.lit(m) - F.col("_nz"))  # absent registers: 2^0
    zeros = (F.lit(m) - F.col("_nz")).cast("double")
    raw = F.lit(alpha * m * m) / s
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select(group, est.alias("est"))


def hll_registers_py(keys, p: int = 8, suffix_hex: int = 12) -> dict:
    """Pure-python twin of hll_registers for one group."""
    w = 4 * suffix_hex
    regs: dict = {}
    for k in keys:
        h = hashlib.md5(str(k).encode()).hexdigest()
        reg = int(h[: p // 4], 16)
        v = int(h[p // 4 : p // 4 + suffix_hex], 16)
        rho = (w + 1) if v == 0 else (w - v.bit_length() + 1)
        regs[reg] = max(regs.get(reg, 0), rho)
    return regs


def cm_registers(
    df: DataFrame, key: str, d: int = 4, w: int = 64, weight=None
) -> DataFrame:
    """DF[row long, bucket long, cnt long] — the mergeable Count-Min
    sketch (Cormode & Muthukrishnan) of the key frequency vector: d
    hash rows × w buckets, register (i, h_i(key) mod w) accumulates
    the key's weight. Like hll_registers this is ONE hash-agg with
    map-side combine producing a d·w-row table whatever the corpus
    size; merging sketches = elementwise SUM (cm_merge), and a point
    estimate is min over rows (cm_estimate_py) with the classic
    one-sided error ≤ e·N/w at confidence 1 − e^−d. Hash rows use
    independent md5 salts so DuckDB replays every register exactly."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(int(d) - 1))).alias("row")
    wcol = (
        F.lit(1).cast("long")
        if weight is None
        else F.col(weight).cast("long")
    )
    base = df.select(F.col(key).cast("string").alias("_k"), wcol.alias("_w"))
    fanned = base.select("*", rows)
    h = F.md5(
        F.concat_ws(":", F.lit("cm"), F.col("row").cast("string"), F.col("_k"))
    )
    bucket = F.pmod(
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long"), F.lit(int(w))
    )
    return (
        fanned.select(
            F.col("row").cast("long").alias("row"), bucket.alias("bucket"), "_w"
        )
        .groupBy("row", "bucket")
        .agg(F.sum("_w").alias("cnt"))
    )


def cm_merge(*sketches: DataFrame) -> DataFrame:
    """Union sketches (same d, w): elementwise sum per (row, bucket) —
    the sketch of the concatenated streams."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cm_estimate_py(registers: dict, key: str, d: int = 4, w: int = 64) -> int:
    """Point frequency estimate: min over hash rows of the key's
    register. Derived value — OUTSIDE the exactness boundary; tests
    bound it (estimate ≥ true count, tight on light keys)."""
    import hashlib

    vals = []
    for i in range(d):
        hx = hashlib.md5(f"cm:{i}:{key}".encode()).hexdigest()
        vals.append(registers.get((i, int(hx[:15], 16) % w), 0))
    return min(vals)
