"""Real-Iceberg backend for the TableStore interface (SURVEY.md §7.3:
"Behind a flag, the same interface issues real `MERGE INTO` when
iceberg-spark-runtime is present, so the cluster deployment is a
config change, not a code change").

This sandbox has no Iceberg runtime jar and no network to fetch one,
so this module CANNOT run here — `iceberg_available()` returns False
and `make_table_store` falls back to the Parquet-emulated TableStore.
On a cluster, configure e.g.:

    spark.sql.catalog.ccbot = org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.ccbot.type = hadoop
    spark.sql.catalog.ccbot.warehouse = s3://bucket/warehouse
    CCBOT_ICEBERG_CATALOG=ccbot

and every engine table becomes a real Iceberg table: append →
`writeTo(...).append()`, merge → SQL `MERGE INTO`, checkpoint tags →
snapshot tags, rollback → `rollback_to_snapshot`.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CATALOG_ENV = "CCBOT_ICEBERG_CATALOG"


def iceberg_available(spark: SparkSession) -> bool:
    """True iff an Iceberg catalog is configured AND the runtime class
    loads. In this sandbox: always False (no jar, no network)."""
    cat = os.environ.get(CATALOG_ENV)
    if not cat:
        return False
    impl = spark.conf.get(f"spark.sql.catalog.{cat}", None)
    if not impl or "iceberg" not in impl.lower():
        return False
    try:
        spark._jvm.java.lang.Class.forName(impl)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def _ddl(schema: T.StructType) -> str:
    return ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)


class IcebergTableStore:
    """Same surface as tablestore.TableStore, on real Iceberg tables."""

    def __init__(
        self,
        spark: SparkSession,
        catalog: str,
        namespace: str,
        name: str,
        schema: T.StructType,
        partition_cols: tuple[str, ...] = (),
    ):
        self.spark = spark
        self.schema = schema
        self.partition_cols = tuple(partition_cols)
        self.ident = f"{catalog}.{namespace}.{name}"
        part = (
            f" PARTITIONED BY ({', '.join(partition_cols)})"
            if partition_cols
            else ""
        )
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {catalog}.{namespace}")
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self.ident} ({_ddl(schema)}) "
            f"USING iceberg{part}"
        )

    def read(self, version=None, partition_filter=None) -> DataFrame:
        df = (
            self.spark.read.option("snapshot-id", version).table(self.ident)
            if version is not None
            else self.spark.read.table(self.ident)
        )
        if partition_filter:
            from pyspark.sql import functions as F

            for col, vals in partition_filter.items():
                df = df.filter(F.col(col).isin(list(vals)))
        return df

    def append(self, df: DataFrame) -> int:
        df.writeTo(self.ident).append()
        return self.version()

    def read_added(self, since_version, version=None) -> DataFrame:
        """Iceberg's native incremental read: rows appended after
        snapshot `since_version` (exclusive) up to `version`/current —
        the real engine behind TableStore.read_added."""
        r = self.spark.read.format("iceberg").option(
            "start-snapshot-id", since_version
        )
        if version is not None:
            r = r.option("end-snapshot-id", version)
        return r.load(self.ident)

    def overwrite(self, df: DataFrame, sort_within_partitions_by=None) -> int:
        if sort_within_partitions_by:
            df = df.sortWithinPartitions(*sort_within_partitions_by)
        df.writeTo(self.ident).overwritePartitions()
        return self.version()

    def merge_into(self, source: DataFrame, on, update_cols=None, insert=True) -> int:
        update_cols = update_cols or []
        source.createOrReplaceTempView("_merge_src")
        cond = " AND ".join(f"t.{c} = s.{c}" for c in on)
        sets = ", ".join(f"t.{c} = s.{c}" for c in update_cols) or None
        cols = [f.name for f in self.schema.fields]
        stmt = f"MERGE INTO {self.ident} t USING _merge_src s ON {cond}"
        if sets:
            stmt += f" WHEN MATCHED THEN UPDATE SET {sets}"
        if insert:
            stmt += (
                f" WHEN NOT MATCHED THEN INSERT ({', '.join(cols)}) "
                f"VALUES ({', '.join('s.' + c for c in cols)})"
            )
        self.spark.sql(stmt)
        return self.version()

    def row_count(self, version=None) -> int:
        """Exact row count from Iceberg snapshot summary metadata
        (`total-records`) — no table scan. Resolves the CURRENT
        snapshot via the main branch ref, not max(committed_at):
        after rollback_to_snapshot the newer (abandoned) snapshots
        remain in `.snapshots`, so newest-by-time would over-report."""
        if version is None:
            version = self.tagged_version("main")
            if version is None:
                return 0
        rows = self.spark.sql(
            f"SELECT summary['total-records'] FROM {self.ident}.snapshots "
            f"WHERE snapshot_id = {version}"
        ).collect()
        return int(rows[0][0]) if rows and rows[0][0] is not None else 0

    # ------------------------------------------------- maintenance
    # (same surface as tablestore.TableStore: the engine calls these
    # identically on either backend)

    def _file_count(self) -> int:
        rows = self.spark.sql(f"SELECT COUNT(*) FROM {self.ident}.files").collect()
        return int(rows[0][0]) if rows else 0

    def compact(self, target_files_per_partition: int = 1) -> tuple[int, int]:
        """Iceberg rewrite_data_files (bin-packs small files; the
        per-partition target is Iceberg's own sizing policy)."""
        catalog, ns, table = self.ident.split(".")
        before = self._file_count()
        self.spark.sql(
            f"CALL {catalog}.system.rewrite_data_files(table => '{ns}.{table}')"
        )
        return before, self._file_count()

    def expire_snapshots(self, keep_last: int = 2) -> int:
        catalog, ns, table = self.ident.split(".")
        rows = self.spark.sql(
            f"CALL {catalog}.system.expire_snapshots("
            f"table => '{ns}.{table}', retain_last => {keep_last})"
        ).collect()
        return int(rows[0][0]) if rows and rows[0][0] is not None else 0

    def partition_file_stats(self) -> list[dict]:
        """Per-partition (files, rows) from the `.files` metadata table
        — no data scan, mirroring TableStore.partition_file_stats."""
        rows = self.spark.sql(
            f"SELECT partition, COUNT(*) AS n_files, SUM(record_count) AS n_rows "
            f"FROM {self.ident}.files GROUP BY partition"
        ).collect()
        out = []
        for r in rows:
            parts = r[0]
            parts = dict(parts.asDict()) if hasattr(parts, "asDict") else {}
            out.append(
                {"parts": {k: str(v) for k, v in parts.items()},
                 "n_files": int(r[1]), "n_rows": int(r[2])}
            )
        return out

    def version(self) -> int:
        row = self.spark.sql(
            f"SELECT snapshot_id FROM {self.ident}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        return int(row[0][0]) if row else 0

    def tag(self, name: str) -> int:
        v = self.version()
        self.spark.sql(
            f"ALTER TABLE {self.ident} CREATE OR REPLACE TAG `{name}` "
            f"AS OF VERSION {v}"
        )
        return v

    def tagged_version(self, name: str):
        rows = self.spark.sql(
            f"SELECT snapshot_id FROM {self.ident}.refs WHERE name = '{name}'"
        ).collect()
        return int(rows[0][0]) if rows else None

    def rollback(self, version: int) -> None:
        cat, _, _ = self.ident.partition(".")
        self.spark.sql(
            f"CALL {cat}.system.rollback_to_snapshot('{self.ident}', {version})"
        )

    def drop(self) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS {self.ident}")


def make_table_store(
    spark: SparkSession,
    root: str,
    name: str,
    schema: T.StructType,
    partition_cols: tuple[str, ...] = (),
):
    """Factory: real Iceberg when configured, Parquet emulation else.
    The engine calls this, so the backend really is a config change."""
    if iceberg_available(spark):
        return IcebergTableStore(
            spark,
            os.environ[CATALOG_ENV],
            os.path.basename(os.path.normpath(root)) or "crawl",
            name,
            schema,
            partition_cols,
        )
    from .tablestore import TableStore

    return TableStore(spark, root, name, schema, partition_cols)
