"""Event-time operators: as-of join, bucketed range join,
sessionization (SURVEY §2.3/2.4 addenda)."""
# Split from __spark_entry__.py (round 5): driver-facing surface
# (entry/queries/oracle_sql/clear_caches) unchanged; this module
# contributes its domain's entries via register()/register_sql().
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql import types as T  # noqa: F401
from pyspark.sql.window import Window  # noqa: F401

from ccbot_spark.functions import (  # noqa: F401
    dedup,
    eventops,
    linkrank,
    multimodal,
    sampling,
    similarity,
    textkit,
)
from ccbot_spark.operators import urlops  # noqa: F401
from ccbot_spark.registry.common import (  # noqa: F401
    _ACTIVE_CACHES,
    _COS,
    _DOC_URLS,
    _EMB_D,
    _MIXED_URLS,
    _SHINGLES,
    _STOP_SQL,
    _cents,
    _doc_urls,
    _mixed_scheme_urls,
    _sql_h64,
    _sql_hmod,
    _t,
    q_a_metrics,
)


def register(q):

    def j_asof(spark, sf_dir):
        # as-of join (most-recent-state lookup): each click joins the
        # latest error ≤ its ts per user — union + one key shuffle +
        # last(ignoreNulls) window, never a range explosion. Build
        # side deduped per (user_id, ts) (max_by event_id) so the
        # match is well-defined in both engines.
        e = _t(spark, sf_dir, "events")
        build = (
            e.filter(F.col("event_type") == "error")
            .groupBy("user_id", "ts")
            .agg(F.max_by("value", "event_id").alias("value"))
        )
        probe = e.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts"
        )
        return eventops.asof_join(probe, build)
    q["j_asof"] = j_asof

    def j_range_bucket(spark, sf_dir):
        # band-range join: clicks inside each error's 10-minute window
        # per user. Time-bucket equi-join (fan-out ≤ 2) + residual
        # filter — the 100 TB shape; a naive ts-inequality join plans
        # as a cartesian theta-join.
        e = _t(spark, sf_dir, "events")
        iv = e.filter(F.col("event_type") == "error").select(
            F.col("event_id").alias("iv_id"), "user_id",
            F.col("ts").alias("start_ts"),
        )
        pr = e.filter(F.col("event_type") == "click").select(
            "user_id", "ts", "value"
        )
        return eventops.range_join_bucketed(iv, pr, width_s=600)
    q["j_range_bucket"] = j_range_bucket

    def a_sessionize(spark, sf_dir):
        # batch gaps-and-islands sessionization (30-min inactivity
        # gap): lag + running sum + rollup over one user_id shuffle —
        # the batch twin of the streaming session_window agg
        return eventops.sessionize(_t(spark, sf_dir, "events"), gap_s=1800)
    q["a_sessionize"] = a_sessionize

    def a_funnel(spark, sf_dir):
        # ordered funnel view→click→purchase per user via chained
        # conditional minima — len(steps) user-keyed hash-aggs, no
        # per-user ordered window (eventops.funnel)
        ev = _t(spark, sf_dir, "events")
        return eventops.funnel(ev)
    q["a_funnel"] = a_funnel

    def a_cohort_retention(spark, sf_dir):
        # first-activity-day cohorts × activity-day offsets: the
        # retention decay matrix, one distinct + two hash-aggs
        ev = _t(spark, sf_dir, "events")
        return eventops.cohort_retention(ev)
    q["a_cohort_retention"] = a_cohort_retention

    def a_group_quantiles(spark, sf_dir):
        # exact p50/p90/p99 of value-cents per event_type — the
        # per-group percentile_disc, rank decomposed over value-prefix
        # buckets so a hot group never funnels one window task
        ev = _t(spark, sf_dir, "events").withColumn(
            "cents", F.round(F.col("value") * 100).cast("long")
        )
        return eventops.group_quantiles(
            ev, group="event_type", value="cents", tiebreak="event_id"
        )
    q["a_group_quantiles"] = a_group_quantiles

    def a_gap_histogram(spark, sf_dir):
        # log2-bucketed inter-event gap histogram per user stream (the
        # ops latency-histogram staple; for a crawl, inter-fetch gaps
        # per host = politeness conformance): lag within user (window
        # bounded by one user's history), bucket = integer bit length
        # of the gap seconds — no float log2, same trick as the HLL
        # rho — then one global hash-agg over ~64 buckets.
        from pyspark.sql.window import Window

        ev = _t(spark, sf_dir, "events")
        us = eventops.epoch_us(F.col("ts"))
        w = Window.partitionBy("user_id").orderBy(us, "event_id")
        gaps = (
            ev.withColumn("_us", us)
            .withColumn("_prev", F.lag("_us").over(w))
            .filter(F.col("_prev").isNotNull())
            .withColumn(
                "gap_s", F.expr("(_us - _prev) DIV 1000000").cast("long")
            )
        )
        bucket = F.when(F.col("gap_s") <= 0, F.lit(0)).otherwise(
            F.length(F.bin(F.col("gap_s")))
        ).cast("long")
        return gaps.groupBy(bucket.alias("log2_bucket")).agg(
            F.count("*").cast("long").alias("n_gaps"),
            F.min("gap_s").cast("long").alias("min_gap_s"),
            F.max("gap_s").cast("long").alias("max_gap_s"),
        )
    q["a_gap_histogram"] = a_gap_histogram


def register_sql(o):

    # --- j_asof: DuckDB's native ASOF JOIN is the independent oracle
    # for the union+window implementation
    o["j_asof"] = """
        WITH build AS (
          SELECT user_id, ts, max_by(value, event_id) AS value
          FROM events WHERE event_type = 'error' GROUP BY user_id, ts
        ),
        probe AS (
          SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'click'
        )
        SELECT p.event_id, p.user_id,
               epoch_us(p.ts) AS ts_us,
               CAST(coalesce(epoch_us(b.ts), -1) AS BIGINT) AS asof_ts_us,
               coalesce(b.value, -1.0) AS asof_value
        FROM probe p ASOF LEFT JOIN build b
          ON p.user_id = b.user_id AND p.ts >= b.ts
    """

    # --- j_range_bucket: plain inequality join at oracle scale; the
    # Spark side buckets time so it never plans a theta-join
    o["j_range_bucket"] = """
        WITH iv AS (
          SELECT event_id AS iv_id, user_id, ts AS start_ts
          FROM events WHERE event_type = 'error'
        ),
        pr AS (
          SELECT user_id, ts,
                 CAST(round(value * 100) AS BIGINT) AS cents
          FROM events WHERE event_type = 'click'
        )
        SELECT iv.iv_id, iv.user_id,
               epoch_us(iv.start_ts) AS start_ts_us,
               CAST(count(pr.ts) AS BIGINT) AS n_probes,
               CAST(coalesce(sum(pr.cents), 0) AS BIGINT) AS sum_cents
        FROM iv LEFT JOIN pr
          ON iv.user_id = pr.user_id
         AND pr.ts >= iv.start_ts
         AND pr.ts < iv.start_ts + INTERVAL 600 SECOND
        GROUP BY iv.iv_id, iv.user_id, iv.start_ts
    """

    # --- a_sessionize: gaps-and-islands with the same strict->gap
    # boundary and (ts, event_id) tiebreak as eventops.sessionize
    # --- a_cohort_retention: same day-bucket integers
    o["a_cohort_retention"] = """
        WITH a AS (
          SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
          FROM events
        ),
        c AS (
          SELECT user_id, MIN(day) AS cohort_day FROM a GROUP BY user_id
        )
        SELECT CAST(c.cohort_day AS BIGINT) AS cohort_day,
               CAST(a.day - c.cohort_day AS BIGINT) AS day_offset,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM a JOIN c USING (user_id)
        GROUP BY c.cohort_day, a.day - c.cohort_day
    """

    # --- a_gap_histogram: same lag + integer bit-length buckets
    o["a_gap_histogram"] = """
        WITH g AS (
          SELECT user_id,
                 epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ) AS gap_us
          FROM events
        ),
        s AS (
          SELECT gap_us // 1000000 AS gap_s FROM g WHERE gap_us IS NOT NULL
        )
        SELECT CAST(CASE WHEN gap_s <= 0 THEN 0
                         ELSE length(bin(gap_s)) END AS BIGINT)
                 AS log2_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_gaps,
               CAST(MIN(gap_s) AS BIGINT) AS min_gap_s,
               CAST(MAX(gap_s) AS BIGINT) AS max_gap_s
        FROM s GROUP BY 1
    """

    # --- a_group_quantiles: percentile_disc restated as the explicit
    # rank formula (value at 1-based rank ceil(p·n/100), ties by id)
    o["a_group_quantiles"] = """
        WITH c AS (
          SELECT event_type, event_id,
                 CAST(round(value * 100, 0) AS BIGINT) AS cents
          FROM events
        ),
        r AS (
          SELECT *,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY cents, event_id) AS rk,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM c
        )
        SELECT event_type,
               CAST(MAX(n) AS BIGINT) AS n_rows,
               CAST(MAX(CASE WHEN rk = (50 * n + 99) // 100
                             THEN cents END) AS BIGINT) AS p50_cents,
               CAST(MAX(CASE WHEN rk = (90 * n + 99) // 100
                             THEN cents END) AS BIGINT) AS p90_cents,
               CAST(MAX(CASE WHEN rk = (99 * n + 99) // 100
                             THEN cents END) AS BIGINT) AS p99_cents
        FROM r GROUP BY event_type
    """

    # --- a_funnel: the same chained strictly-after minima
    o["a_funnel"] = """
        WITH b AS (
          SELECT user_id, event_type, epoch_us(ts) AS us FROM events
        ),
        s1 AS (
          SELECT user_id, MIN(us) AS t1 FROM b
          WHERE event_type = 'view' GROUP BY user_id
        ),
        s2 AS (
          SELECT b.user_id, MIN(us) AS t2 FROM b
          JOIN s1 USING (user_id)
          WHERE event_type = 'click' AND us > t1 GROUP BY b.user_id
        ),
        s3 AS (
          SELECT b.user_id, MIN(us) AS t3 FROM b
          JOIN s2 USING (user_id)
          WHERE event_type = 'purchase' AND us > t2 GROUP BY b.user_id
        ),
        u AS (SELECT DISTINCT user_id FROM events)
        SELECT u.user_id,
               CAST(COALESCE(t1, -1) AS BIGINT) AS t1_us,
               CAST(COALESCE(t2, -1) AS BIGINT) AS t2_us,
               CAST(COALESCE(t3, -1) AS BIGINT) AS t3_us,
               CAST((t1 IS NOT NULL)::INT + (t2 IS NOT NULL)::INT
                    + (t3 IS NOT NULL)::INT AS BIGINT) AS stage
        FROM u
        LEFT JOIN s1 USING (user_id)
        LEFT JOIN s2 USING (user_id)
        LEFT JOIN s3 USING (user_id)
    """

    o["a_sessionize"] = """
        WITH x AS (
          SELECT user_id, ts, event_id,
                 CAST(round(value * 100) AS BIGINT) AS cents,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR ts - lag(ts) OVER w > INTERVAL 1800 SECOND
                      THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        n AS (
          SELECT user_id, ts, cents,
                 CAST(SUM(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS BIGINT) AS session_id
          FROM x
        )
        SELECT user_id, session_id,
               count(*) AS n_events,
               min(epoch_us(ts)) AS session_start_us,
               max(epoch_us(ts)) AS session_end_us,
               CAST(sum(cents) AS BIGINT) AS sum_cents
        FROM n GROUP BY user_id, session_id
    """
