"""Event-time join/segmentation operators Spark's DataFrame API lacks
as built-ins, each re-expressed as a composition of shuffles Spark is
good at — never a theta-join, never a per-key Python loop.

* ``asof_join`` — most-recent-state join (DuckDB/kdb ASOF JOIN): one
  hash shuffle on the key via the union+window trick.
* ``range_join_bucketed`` — probe-in-interval band join: time-bucket
  equi-join with fan-out ≤ 2, then exact residual filter.
* ``sessionize`` — batch gaps-and-islands sessionization: lag + running
  sum over one key shuffle (the batch twin of the streaming
  session_window aggregation in streaming/metrics_stream.py).

Timestamps are converted to tz-free epoch microseconds (wall-clock
diff from 1970-01-01, so TIMESTAMP_NTZ inputs never pick up a session
timezone) at the operator head and all ordering/arithmetic/outputs run
on those longs — integer-exact vs the DuckDB ``epoch_us`` oracles.
Aggregated money is integer cents for the same reason.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_EPOCH = "TIMESTAMP_NTZ'1970-01-01 00:00:00'"


def epoch_us(c: Column | str) -> Column:
    """Tz-free epoch microseconds: pure wall-clock difference from the
    epoch, valid for TIMESTAMP_NTZ (unix_micros rejects NTZ, and an
    NTZ→TZ cast would shift by the session timezone)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.timestamp_diff("MICROSECOND", F.expr(_EPOCH), col)


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """As-of join: for each probe row, the build row with the greatest
    ``ts`` ≤ probe.ts for the same key (most-recent-state lookup —
    what DuckDB spells ``ASOF JOIN`` and kdb spells ``aj``).

    Spark shape: tag both sides, union, ONE hash shuffle on the key,
    then ``last(build_cols, ignoreNulls=True)`` over an ordered window
    ending at the current row; probe rows then carry the latest
    preceding build state. No range explosion, no broadcast of a
    data-sized side, and per-key skew is bounded by that key's own
    history (the same bound any per-key ordered semantic implies). At
    equal timestamps the build row sorts first (≤ semantics); the
    build side must be unique per (key, ts) — callers dedup first
    (``max_by`` style) exactly like the oracle.

    probe columns: key, ts, event_id (ridealong id). build columns:
    key, ts, value. Output: one row per probe row with ``ts_us`` and
    the matched build row's ``asof_ts_us`` / ``asof_value`` (NULL when
    no build row precedes it).
    """
    b = build.select(
        F.col(key),
        epoch_us(ts).alias("_us"),
        F.lit(0).alias("_side"),
        F.lit(None).cast("long").alias("event_id"),
        epoch_us(ts).alias("_b_us"),
        F.col("value").alias("_b_value"),
    )
    p = probe.select(
        F.col(key),
        epoch_us(ts).alias("_us"),
        F.lit(1).alias("_side"),
        F.col("event_id"),
        F.lit(None).cast("long").alias("_b_us"),
        F.lit(None).cast("double").alias("_b_value"),
    )
    w = (
        Window.partitionBy(key)
        .orderBy("_us", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = b.unionByName(p).select(
        key,
        "_us",
        "_side",
        "event_id",
        F.last("_b_us", ignorenulls=True).over(w).alias("asof_ts_us"),
        F.last("_b_value", ignorenulls=True).over(w).alias("asof_value"),
    )
    # no-match sentinel (-1 / -1.0) instead of NULL: probe rows that
    # precede every build row keep an integer-typed column in both
    # engines (a nullable BIGINT degrades to float64 through pandas)
    return merged.filter(F.col("_side") == 1).select(
        "event_id",
        key,
        F.col("_us").alias("ts_us"),
        F.coalesce(F.col("asof_ts_us"), F.lit(-1).cast("long")).alias(
            "asof_ts_us"
        ),
        F.coalesce(F.col("asof_value"), F.lit(-1.0)).alias("asof_value"),
    )


def range_join_bucketed(
    intervals: DataFrame,
    probes: DataFrame,
    key: str = "user_id",
    width_s: int = 600,
) -> DataFrame:
    """Band-range join: count probe rows (and sum their integer-cents
    value) falling inside each key's half-open interval
    [start_ts, start_ts + width_s).

    Naive Spark would plan `p.ts >= start AND p.ts < end` as a
    broadcast-nested-loop / cartesian theta-join — O(n·m) and a
    100 TB non-starter. Because the band width is bounded, the scale
    shape is: bucket both sides by floor(epoch_micros / width) — an
    interval overlaps at most 2 buckets, so explode it to ≤ 2 rows,
    equi-join on (key, bucket) (hash shuffle, map-side prunable,
    AQE-skew-splittable), then apply the exact range predicate as a
    residual filter. Intervals with no probes survive via the final
    left join (n_probes = 0).

    intervals columns: iv_id, key, start_ts. probes: key, ts, value.
    """
    width_us = width_s * 1_000_000
    start_us = epoch_us("start_ts")
    iv = intervals.select(
        "iv_id",
        F.col(key),
        start_us.alias("_s_us"),
        F.sequence(
            start_us - (start_us % width_us),
            start_us
            + F.lit(width_us - 1)
            - ((start_us + F.lit(width_us - 1)) % width_us),
            F.lit(width_us).cast("long"),
        ).alias("_bks"),
    ).withColumn("_bk", F.explode("_bks")).drop("_bks")
    pr = probes.select(
        F.col(key),
        epoch_us("ts").alias("_p_us"),
        F.round(F.col("value") * 100).cast("long").alias("_cents"),
    ).withColumn("_bk", F.col("_p_us") - (F.col("_p_us") % F.lit(width_us)))
    hits = (
        iv.join(pr, [key, "_bk"])
        .filter(
            (F.col("_p_us") >= F.col("_s_us"))
            & (F.col("_p_us") < F.col("_s_us") + F.lit(width_us))
        )
        .groupBy("iv_id")
        .agg(
            F.count("*").alias("n_probes"),
            F.sum("_cents").alias("sum_cents"),
        )
    )
    base = intervals.select(
        "iv_id", key, start_us.alias("start_ts_us")
    ).dropDuplicates(["iv_id"])
    return base.join(hits, "iv_id", "left").select(
        "iv_id",
        key,
        "start_ts_us",
        F.coalesce(F.col("n_probes"), F.lit(0)).cast("long").alias("n_probes"),
        F.coalesce(F.col("sum_cents"), F.lit(0)).cast("long").alias("sum_cents"),
    )


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_s: int = 1800,
) -> DataFrame:
    """Batch sessionization (gaps-and-islands): split each key's
    event stream into sessions wherever the gap to the previous event
    exceeds ``gap_s`` seconds, then aggregate per session.

    One hash shuffle on the key: lag() marks session starts, a running
    sum over the same window numbers them (1-based per key in first-
    event order), and the per-session rollup reuses the shuffle's
    partitioning. This is the batch twin of the streaming
    session_window aggregation (st_session) — same gap semantics on
    bounded data, joinable against its output in backfills.

    Output: key, session_id, n_events, session_start_us,
    session_end_us, sum_cents.
    """
    base = events.select(
        F.col(key),
        epoch_us(ts).alias("_us"),
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("_cents"),
    )
    w = Window.partitionBy(key).orderBy("_us", "event_id")
    prev = F.lag("_us").over(w)
    is_new = F.when(
        prev.isNull() | (F.col("_us") - prev > F.lit(gap_s * 1_000_000)),
        F.lit(1),
    ).otherwise(F.lit(0))
    numbered = base.withColumn(
        "session_id",
        F.sum(is_new)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    return numbered.groupBy(key, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("_us").alias("session_start_us"),
        F.max("_us").alias("session_end_us"),
        F.sum("_cents").alias("sum_cents"),
    )


def funnel(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user: str = "user_id",
    ts: str = "ts",
    typ: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis — "did this user do A, then B, then C,
    IN ORDER?" (conversion funnels; for a crawl, the
    discover→fetch→store progression per host). Computed as CHAINED
    CONDITIONAL MINIMA:

        t₁ = min ts of step 1
        tᵢ = min ts of step i STRICTLY AFTER tᵢ₋₁

    which is the textbook funnel semantics without a per-user ordered
    window: each stage is one hash-agg keyed on user + one user-keyed
    join, so a 10^9-user log runs as len(steps) shuffles on the user
    key and nothing ever sorts a user's history. Integer
    epoch-microseconds end to end (the house tz-free epoch_us);
    absent stages surface as -1 with `stage` = how far the user got.

    Output: (user, t1_us..tN_us, stage)."""
    base = events.select(
        user,
        F.col(typ).alias("_t"),
        epoch_us(F.col(ts)).alias("_us"),
    )
    acc = (
        base.filter(F.col("_t") == steps[0])
        .groupBy(user)
        .agg(F.min("_us").alias("t1_us"))
    )
    for i, s in enumerate(steps[1:], start=2):
        prev = f"t{i - 1}_us"
        nxt = (
            base.filter(F.col("_t") == s)
            .join(acc.select(user, prev), user)
            .filter(F.col("_us") > F.col(prev))
            .groupBy(user)
            .agg(F.min("_us").alias(f"t{i}_us"))
        )
        acc = acc.join(nxt, user, "left")
    users = events.select(user).distinct()
    out = users.join(acc, user, "left")
    stage = F.lit(0).cast("long")
    for i in range(1, len(steps) + 1):
        stage = stage + F.col(f"t{i}_us").isNotNull().cast("long")
    return out.select(
        user,
        *[
            F.coalesce(F.col(f"t{i}_us"), F.lit(-1)).cast("long").alias(f"t{i}_us")
            for i in range(1, len(steps) + 1)
        ],
        stage.alias("stage"),
    )


def cohort_retention(
    events: DataFrame,
    bucket_us: int = 86_400_000_000,
    user: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """Cohort retention — users grouped by their FIRST-activity day
    (the cohort), counted at every later activity-day offset: the
    engagement-decay curve behind every retention chart (for a crawl,
    swap users→hosts and activity→fetch cycles to read host liveness
    decay).

    Shape: one distinct (user, day) projection — the raw log reduces
    to at most users×days rows immediately — one min hash-agg per
    user for the cohort assignment, one user-keyed join back, one
    pair hash-agg. Day buckets are exact integers from the tz-free
    epoch_us (floor(us / bucket)); after the distinct, COUNT(*) per
    (cohort, offset) IS the distinct-user count.

    Output: (cohort_day, day_offset, n_users)."""
    acts = events.select(
        user,
        F.floor(epoch_us(F.col(ts)) / F.lit(bucket_us))
        .cast("long")
        .alias("day"),
    ).distinct()
    cohorts = acts.groupBy(user).agg(F.min("day").alias("cohort_day"))
    return (
        acts.join(cohorts, user)
        .groupBy(
            "cohort_day",
            (F.col("day") - F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


def group_quantiles(
    df: DataFrame,
    group: str,
    value: str,
    tiebreak: str,
    percents: tuple[int, ...] = (50, 90, 99),
    bucket_shift: int = 12,
) -> DataFrame:
    """EXACT per-group percentiles (percentile_disc semantics: the
    value at 1-based rank ⌈p·n/100⌉) without ever giving one group to
    one window task. `Window.partitionBy(group)` funnels a hot group
    (one event_type can be half a 10^12-row log); instead the
    within-group rank decomposes over VALUE-PREFIX buckets, the
    integer-key form of sequencing.grouped_rank's hex trick:

      bucket = value >> bucket_shift   (monotone in value, so group
      rank = per-(group, bucket) offset + row_number within bucket)

      1. per-(group, bucket) counts — map-side-combinable hash-agg;
      2. per-group prefix sums over ≤ 2^(bits−shift) bucket rows — a
         window bounded by the BUCKET count, never the group size;
      3. within-(group, bucket) row_number by (value, tiebreak).

    Output: (group, n_rows, p<p>_<value> per requested percent) —
    integer-exact, engine-replayable."""
    base = df.withColumn(
        "_qb", F.shiftright(F.col(value), bucket_shift)
    )
    counts = base.groupBy(group, "_qb").agg(F.count("*").alias("_n"))
    w_off = (
        Window.partitionBy(group)
        .orderBy("_qb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).cast("long")
    ).drop("_n")
    w_in = Window.partitionBy(group, "_qb").orderBy(value, tiebreak)
    ranked = (
        base.join(offsets, [group, "_qb"])
        .withColumn(
            "_rk", (F.col("_off") + F.row_number().over(w_in)).cast("long")
        )
    )
    sizes = df.groupBy(group).agg(F.count("*").alias("_gn"))
    j = ranked.join(sizes, group)
    aggs = [F.max("_gn").cast("long").alias("n_rows")]
    for p in percents:
        pos = F.expr(f"({p} * _gn + 99) DIV 100")
        aggs.append(
            F.max(F.when(F.col("_rk") == pos, F.col(value)))
            .cast("long")
            .alias(f"p{p}_{value}")
        )
    return j.groupBy(group).agg(*aggs)
