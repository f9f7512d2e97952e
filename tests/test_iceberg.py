"""Real-Iceberg backend coverage (SURVEY.md §7.3: the cluster backend
is a config change, not a code change).

Two layers:
  * a statement-level test against a recording fake SparkSession — runs
    EVERYWHERE (no jar needed) and pins the exact SQL surface
    IcebergTableStore drives (CREATE/MERGE INTO/tag/rollback/
    snapshot-summary row counts, incl. the rollback-safe main-ref
    resolution);
  * a full CrawlEngine equivalence run on a real Iceberg catalog,
    skipped when no iceberg-spark-runtime jar is on the classpath
    (this sandbox has none and no network to fetch one) — it passes
    wherever the jar exists, asserting the crawl trace is byte-equal
    to the Parquet-emulated TableStore's.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from ccbot_spark import iceberg as ice


# ------------------------------------------------------- recording fake

class _FakeDF:
    def __init__(self, rows):
        self._rows = rows

    def collect(self):
        return self._rows


class _FakeSource:
    """Stands in for the MERGE source DataFrame."""

    def __init__(self, log):
        self._log = log

    def createOrReplaceTempView(self, name):
        self._log.append(f"CREATE_VIEW {name}")


class _FakeSpark:
    """Records every SQL statement; returns scripted rows for the
    metadata queries (snapshots / refs) the store issues."""

    def __init__(self):
        self.stmts: list[str] = []
        # snapshot history newest-first by committed_at; refs table
        self.snapshots = [(103,), (102,), (101,)]
        self.refs = {"main": 102}  # rolled back: newest (103) abandoned

    def sql(self, stmt: str):
        self.stmts.append(" ".join(stmt.split()))
        s = stmt.strip()
        if "FROM" in s and ".snapshots" in s and "summary" in s:
            return _FakeDF([(4567,)])
        if "FROM" in s and ".snapshots" in s:
            return _FakeDF(self.snapshots[:1])
        if ".refs" in s:
            name = s.split("name = '")[1].split("'")[0]
            v = self.refs.get(name)
            return _FakeDF([(v,)] if v is not None else [])
        return _FakeDF([])


SCHEMA = T.StructType(
    [
        T.StructField("url_norm", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("retries", T.IntegerType(), False),
        T.StructField("bucket", T.IntegerType(), False),
    ]
)


@pytest.fixture()
def store():
    fake = _FakeSpark()
    st = ice.IcebergTableStore(
        fake, "cat", "crawl", "frontier", SCHEMA, ("bucket",)
    )
    return fake, st


def test_create_table_ddl(store):
    fake, _ = store
    assert fake.stmts[0] == "CREATE NAMESPACE IF NOT EXISTS cat.crawl"
    assert fake.stmts[1] == (
        "CREATE TABLE IF NOT EXISTS cat.crawl.frontier "
        "(url_norm string, status string, retries int, bucket int) "
        "USING iceberg PARTITIONED BY (bucket)"
    )


def test_merge_into_statement(store):
    fake, st = store
    src = _FakeSource(fake.stmts)
    st.merge_into(src, on=["url_norm"], update_cols=["status", "retries"])
    assert "CREATE_VIEW _merge_src" in fake.stmts
    merge = [s for s in fake.stmts if s.startswith("MERGE INTO")][0]
    assert merge == (
        "MERGE INTO cat.crawl.frontier t USING _merge_src s "
        "ON t.url_norm = s.url_norm "
        "WHEN MATCHED THEN UPDATE SET t.status = s.status, "
        "t.retries = s.retries "
        "WHEN NOT MATCHED THEN INSERT (url_norm, status, retries, bucket) "
        "VALUES (s.url_norm, s.status, s.retries, s.bucket)"
    )


def test_merge_into_no_insert_clause(store):
    fake, st = store
    st.merge_into(_FakeSource(fake.stmts), on=["url_norm"],
                  update_cols=["status"], insert=False)
    merge = [s for s in fake.stmts if s.startswith("MERGE INTO")][-1]
    assert "WHEN NOT MATCHED" not in merge


def test_tag_and_rollback_statements(store):
    fake, st = store
    v = st.tag("cycle-3")
    assert v == 103  # newest snapshot by committed_at
    assert any(
        s.startswith("ALTER TABLE cat.crawl.frontier CREATE OR REPLACE TAG "
                     "`cycle-3` AS OF VERSION 103")
        for s in fake.stmts
    )
    st.rollback(101)
    assert (
        "CALL cat.system.rollback_to_snapshot('cat.crawl.frontier', 101)"
        in fake.stmts
    )


def test_row_count_uses_main_ref_not_newest_snapshot(store):
    """After rollback_to_snapshot, abandoned newer snapshots remain in
    .snapshots; row_count must resolve CURRENT via the main branch ref
    (102 here), not max(committed_at) (103)."""
    fake, st = store
    n = st.row_count()
    q = [s for s in fake.stmts if "summary" in s][0]
    assert "snapshot_id = 102" in q
    assert n == 4567


def test_tagged_version_missing_ref(store):
    fake, st = store
    assert st.tagged_version("nope") is None


# --------------------------------------------- real-jar equivalence run

def _iceberg_ready(spark) -> bool:
    return ice.iceberg_available(spark)


def test_engine_on_real_iceberg_matches_parquet_store(spark, tmp_path,
                                                      monkeypatch):
    """Full CrawlEngine on a real Iceberg catalog == Parquet-emulated
    store, trace byte-equal. Skipped without iceberg-spark-runtime on
    the classpath (no jar / no network in this sandbox); passes
    anywhere the jar exists with CCBOT_ICEBERG_CATALOG configured."""
    if not _iceberg_ready(spark):
        pytest.skip("no Iceberg runtime jar / catalog configured")
    from ccbot_spark import oracle, synthweb
    from ccbot_spark.engine import CrawlEngine

    cfg = synthweb.WebConfig(n_hosts=4, pages_per_host=40)
    seeds = synthweb.seed_urls(cfg, 12)
    want = oracle.crawl(cfg, seeds, cycles=2)
    eng = CrawlEngine(spark, cfg, str(tmp_path / "ice"), n_buckets=8,
                      record_trace=True, hot_host_min=10)
    eng.crawl(seeds, cycles=2)
    rows = eng.trace.read().orderBy("seq").collect()
    got = [(r.seq, r.cycle, r.url_norm, r.host, r.sched_slot, r.action)
           for r in rows]
    assert got == want.trace


def test_maintenance_statements(store):
    """compact/expire map to the Iceberg system procedures; stats read
    the .files metadata table — never a data scan."""
    fake, st = store
    st.compact()
    assert any(
        s == "CALL cat.system.rewrite_data_files(table => 'crawl.frontier')"
        for s in fake.stmts
    )
    st.expire_snapshots(keep_last=3)
    assert any(
        s == "CALL cat.system.expire_snapshots(table => 'crawl.frontier', "
             "retain_last => 3)"
        for s in fake.stmts
    )
    st.partition_file_stats()
    assert any(
        s.startswith("SELECT partition, COUNT(*) AS n_files")
        and "cat.crawl.frontier.files" in s
        for s in fake.stmts
    )
