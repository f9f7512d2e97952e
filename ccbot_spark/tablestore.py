"""Iceberg-emulated table store on Parquet (SURVEY.md §7.3).

The sandbox has no Iceberg runtime jar and no network to fetch one, so
this module provides the Iceberg surface the engine needs — versioned
snapshots (time travel), atomic commits, ``MERGE INTO`` upserts,
append, and manifest-level partition pruning — backed by Parquet files
plus a tiny JSON manifest. The design mirrors Iceberg's public model
(a table = an ordered list of snapshot versions, each a list of data
files with partition values; commits swap a manifest pointer
atomically), so a deployment with ``iceberg-spark-runtime`` on the
classpath can swap this for real ``spark.sql("MERGE INTO ...")`` /
``df.writeTo(...)`` without touching engine code.

Scale notes (100 TB / 10^10-row frontier):
  * ``merge_into`` is copy-on-write per *touched partition*: only
    hash-bucket partitions present in the source batch are rewritten;
    untouched data files carry over into the new snapshot by
    reference. With P=4096 buckets a cycle that touches 1% of hosts
    rewrites 1% of the table — the same cost profile as Iceberg COW.
  * file-level pruning happens in the manifest layer (like Iceberg
    manifests): ``read(partition_filter=...)`` hands Spark only the
    matching files, so a bucket-restricted scan never opens the rest.
  * snapshots are O(1) metadata — they reference files, never copy.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _footer_rows(path: str) -> int:
    """Row count from the Parquet footer — metadata only, no data scan
    (real Iceberg manifests carry ``record_count`` per data file the
    same way)."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


class TableStore:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        name: str,
        schema,
        partition_cols: tuple[str, ...] = (),
    ):
        self.spark = spark
        self.name = name
        self.schema = schema
        self.partition_cols = tuple(partition_cols)
        self.dir = os.path.join(root, name)
        self.data_dir = os.path.join(self.dir, "data")
        self.manifest_path = os.path.join(self.dir, "manifest.json")
        os.makedirs(self.data_dir, exist_ok=True)
        if not os.path.exists(self.manifest_path):
            self._write_manifest({"current": 0, "versions": {"0": {"files": []}}, "tags": {}})

    # ------------------------------------------------------------ manifest

    def _read_manifest(self) -> dict:
        with open(self.manifest_path) as f:
            return json.load(f)

    def _write_manifest(self, m: dict) -> None:
        tmp = self.manifest_path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self.manifest_path)  # atomic commit (Iceberg pointer swap)

    def version(self) -> int:
        return self._read_manifest()["current"]

    def _files(self, version: int | None = None) -> list[dict]:
        m = self._read_manifest()
        v = m["current"] if version is None else version
        return m["versions"][str(v)]["files"]

    def _commit(self, files: list[dict]) -> int:
        m = self._read_manifest()
        new_v = m["current"] + 1
        m["versions"][str(new_v)] = {"files": files}
        m["current"] = new_v
        self._write_manifest(m)
        return new_v

    # ------------------------------------------------------------ writes

    def _write_files(self, df: DataFrame) -> list[dict]:
        """Write a commit's data files; return manifest entries with
        partition values parsed from the directory layout."""
        commit = uuid.uuid4().hex[:12]
        out = os.path.join(self.data_dir, f"commit-{commit}")
        writer = df.write.mode("overwrite")
        if self.partition_cols:
            # duplicate partition cols into `_p_*` dirs so the data files
            # keep the original columns (Iceberg keeps them too); cluster
            # rows by partition key first so each task writes whole
            # buckets (one file per bucket per commit, not tasks×buckets
            # small files — the standard partitioned-write discipline)
            for c in self.partition_cols:
                df = df.withColumn(f"_p_{c}", F.col(c))
            df = df.repartition(*[F.col(f"_p_{c}") for c in self.partition_cols])
            writer = df.write.mode("overwrite").partitionBy(
                *[f"_p_{c}" for c in self.partition_cols]
            )
        writer.parquet(out)
        entries: list[dict] = []
        for dirpath, _dirs, fnames in os.walk(out):
            parts = {}
            for seg in os.path.relpath(dirpath, out).split(os.sep):
                if seg.startswith("_p_") and "=" in seg:
                    k, _, val = seg.partition("=")
                    parts[k[3:]] = val
            for fn in fnames:
                if fn.endswith(".parquet"):
                    p = os.path.join(dirpath, fn)
                    entries.append(
                        {"path": p, "parts": parts, "rows": _footer_rows(p)}
                    )
        return entries

    def append(self, df: DataFrame) -> int:
        new = self._write_files(df)
        return self._commit(self._files() + new)

    def append_rows(self, rows: list[tuple]) -> int:
        """Driver-side append for metadata-sized payloads (lineage /
        audit rows): one pyarrow parquet write, ZERO Spark jobs — the
        same discipline as the manifest row counts. Unpartitioned
        tables only (the audit tables are)."""
        if self.partition_cols:
            raise ValueError("append_rows supports unpartitioned tables only")
        if not rows:
            return self.version()
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql import types as ST

        _PA = {
            ST.IntegerType: pa.int32(),
            ST.LongType: pa.int64(),
            ST.StringType: pa.string(),
            ST.BooleanType: pa.bool_(),
            ST.DoubleType: pa.float64(),
            ST.BinaryType: pa.binary(),
        }
        arrays, names = [], []
        cols = list(zip(*rows))
        for i, f in enumerate(self.schema.fields):
            arrays.append(pa.array(cols[i], type=_PA[type(f.dataType)]))
            names.append(f.name)
        out_dir = os.path.join(self.data_dir, f"commit-{uuid.uuid4().hex[:12]}")
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, "part-00000.parquet")
        pq.write_table(pa.Table.from_arrays(arrays, names=names), path)
        entry = {"path": path, "parts": {}, "rows": len(rows)}
        return self._commit(self._files() + [entry])

    def overwrite(self, df: DataFrame, sort_within_partitions_by: list[str] | None = None) -> int:
        """Full overwrite; optionally sort rows within partitions on write
        (the frontier's `(priority DESC, dt, url_norm)` write order)."""
        if sort_within_partitions_by:
            df = df.sortWithinPartitions(*sort_within_partitions_by)
        return self._commit(self._write_files(df))

    # ------------------------------------------------------------ reads

    def read(
        self,
        version: int | None = None,
        partition_filter: dict[str, set[str]] | None = None,
    ) -> DataFrame:
        files = self._files(version)
        if partition_filter:
            files = [
                e
                for e in files
                if all(
                    k not in e["parts"] or e["parts"][k] in vals
                    for k, vals in partition_filter.items()
                )
            ]
        if not files:
            return self.spark.createDataFrame([], self.schema)
        return self.spark.read.schema(self.schema).parquet(*[e["path"] for e in files])

    def added_files(
        self, since_version: int, version: int | None = None
    ) -> list[dict]:
        """Manifest entries present at `version` (default: current) but
        not at `since_version` — pure manifest arithmetic, zero IO."""
        old = {e["path"] for e in self._files(since_version)}
        return [e for e in self._files(version) if e["path"] not in old]

    def changed_partitions(
        self, since_version: int, version: int | None = None
    ) -> set[str]:
        """First-partition-col values whose data files changed between
        the two snapshots (COW rewrites count) — what an incremental
        consumer of a merged table must re-scan."""
        if not self.partition_cols:
            return set()
        pcol = self.partition_cols[0]
        return {
            e["parts"][pcol]
            for e in self.added_files(since_version, version)
            if pcol in e["parts"]
        }

    def read_added(
        self, since_version: int, version: int | None = None
    ) -> DataFrame:
        """Iceberg-style INCREMENTAL READ: rows in data files committed
        after `since_version` (e.g. a per-cycle tag). For append-only
        tables (images, trace, metrics, cdx) this IS the exact row
        delta — the snapshot diff costs manifest arithmetic plus a
        scan of only the new files, never a rescan or anti-join over
        the accumulated table. This is how an incremental training
        export ships "everything stored since the last export" from a
        10^10-row store at O(delta) cost. For COW-merged tables
        (frontier) the added files are the rewritten partitions — a
        superset of the changed rows; combine with changed_partitions
        + an old-snapshot anti-join restricted to those partitions
        when exact row-level change is needed."""
        files = self.added_files(since_version, version)
        if not files:
            return self.spark.createDataFrame([], self.schema)
        return self.spark.read.schema(self.schema).parquet(
            *[e["path"] for e in files]
        )

    def row_count(self, version: int | None = None) -> int:
        """Exact table row count from manifest metadata — O(#files)
        driver-side, zero Spark jobs. Entries written before counts
        were recorded fall back to a footer read (still no data scan)."""
        return sum(
            e["rows"] if "rows" in e else _footer_rows(e["path"])
            for e in self._files(version)
        )

    # ------------------------------------------------------------ merge

    def merge_into(
        self,
        source: DataFrame,
        on: list[str],
        update_cols: list[str] | None = None,
        insert: bool = True,
    ) -> int:
        """Emulated ``MERGE INTO target USING source ON <on>
        WHEN MATCHED THEN UPDATE SET <update_cols> = source.<update_cols>
        WHEN NOT MATCHED THEN INSERT *``.

        Copy-on-write per touched partition: with partition_cols set,
        only partitions present in `source` are rewritten; all other
        data files carry over by reference.
        """
        files = self._files()
        carry: list[dict] = files
        target = self.read()
        if self.partition_cols and files:
            pcol = self.partition_cols[0]
            touched = {
                str(r[0]) for r in source.select(pcol).distinct().collect()
            }
            carry = [e for e in files if e["parts"].get(pcol) not in touched]
            touched_files = [e for e in files if e["parts"].get(pcol) in touched]
            target = (
                self.spark.read.schema(self.schema).parquet(
                    *[e["path"] for e in touched_files]
                )
                if touched_files
                else self.spark.createDataFrame([], self.schema)
            )
        else:
            carry = []

        cols = [f.name for f in self.schema.fields]
        update_cols = update_cols or []
        t = target.alias("t")
        s = source.alias("s")
        # USING-style join: key columns appear once, already coalesced
        joined = t.join(s, on=on, how="full_outer")
        out_cols = []
        for c in cols:
            if c in on:
                out_cols.append(F.col(c))
            elif c in update_cols:
                out_cols.append(F.coalesce(F.col(f"s.{c}"), F.col(f"t.{c}")).alias(c))
            else:
                out_cols.append(F.coalesce(F.col(f"t.{c}"), F.col(f"s.{c}")).alias(c))
        merged = joined.select(*out_cols)
        if not insert:
            merged = merged.join(target.select(*on).distinct(), on=on, how="left_semi")
        new_files = self._write_files(merged)
        return self._commit(carry + new_files)

    # ------------------------------------------------------------ snapshots

    def tag(self, name: str) -> int:
        m = self._read_manifest()
        m["tags"][name] = m["current"]
        self._write_manifest(m)
        return m["current"]

    def tagged_version(self, name: str) -> int | None:
        return self._read_manifest()["tags"].get(name)

    def rollback(self, version: int) -> None:
        m = self._read_manifest()
        if str(version) not in m["versions"]:
            raise ValueError(f"unknown version {version}")
        m["current"] = version
        self._write_manifest(m)

    def drop(self) -> None:
        shutil.rmtree(self.dir, ignore_errors=True)

    # ------------------------------------------------- maintenance
    #
    # Iceberg's two standard table-maintenance actions, which a
    # COW-per-touched-bucket frontier NEEDS at scale: every cycle adds
    # one file per touched bucket, so after C cycles a hot bucket holds
    # C small files (read amplification + manifest bloat). compact()
    # is rewrite_data_files; expire_snapshots() is the matching GC —
    # compaction alone deletes nothing, because older snapshots and
    # tags still reference the small files (time travel is preserved
    # until expiry, exactly Iceberg's contract).

    def compact(self, target_files_per_partition: int = 1) -> tuple[int, int]:
        """Rewrite partitions holding more than `target` files into
        bucket-clustered files; commit a new snapshot referencing the
        compacted files plus the untouched ones. Row ORDER within
        files is not preserved — every consumer orders by explicit
        keys (SURVEY.md §7.5), never by file order. Returns
        (files_before, files_after)."""
        files = self._files()
        by_part: dict[tuple, list[dict]] = {}
        for e in files:
            by_part.setdefault(tuple(sorted(e["parts"].items())), []).append(e)
        rewrite = [
            es for es in by_part.values() if len(es) > target_files_per_partition
        ]
        if not rewrite:
            return (len(files), len(files))
        keep = [
            e
            for es in by_part.values()
            if len(es) <= target_files_per_partition
            for e in es
        ]
        paths = [e["path"] for es in rewrite for e in es]
        df = self.spark.read.schema(self.schema).parquet(*paths)
        if not self.partition_cols:
            # unpartitioned table: collapse to one file per commit
            # (this emulation's compaction unit; a real Iceberg
            # rewrite_data_files bins by target-file-size instead)
            df = df.coalesce(1)
        new = self._write_files(df)
        self._commit(keep + new)
        return (len(files), len(keep) + len(new))

    def expire_snapshots(self, keep_last: int = 2) -> int:
        """Drop all but the last `keep_last` versions (tagged versions
        and current always survive), then delete data files no kept
        version references. Returns the number of files deleted.
        Mirrors Iceberg expire_snapshots: this is the ONLY place data
        files are ever removed."""
        m = self._read_manifest()
        versions = sorted(int(v) for v in m["versions"])
        kept = set(versions[-keep_last:]) | {m["current"]} | set(m["tags"].values())
        m["versions"] = {
            k: fs for k, fs in m["versions"].items() if int(k) in kept
        }
        referenced = {
            e["path"] for fs in m["versions"].values() for e in fs["files"]
        }
        self._write_manifest(m)
        deleted = 0
        for dirpath, _dirs, fnames in os.walk(self.data_dir, topdown=False):
            for fn in fnames:
                p = os.path.join(dirpath, fn)
                if fn.endswith(".parquet") and p not in referenced:
                    os.remove(p)
                    deleted += 1
            if not os.listdir(dirpath) and dirpath != self.data_dir:
                os.rmdir(dirpath)
        return deleted

    def partition_file_stats(self) -> list[dict]:
        """Per-partition (files, rows) from manifest metadata only —
        the per-partition lineage feed (zero Spark jobs)."""
        by_part: dict[tuple, list[dict]] = {}
        for e in self._files():
            by_part.setdefault(tuple(sorted(e["parts"].items())), []).append(e)
        return [
            {
                "parts": dict(k),
                "n_files": len(es),
                "n_rows": sum(
                    e["rows"] if "rows" in e else _footer_rows(e["path"])
                    for e in es
                ),
            }
            for k, es in sorted(by_part.items())
        ]
