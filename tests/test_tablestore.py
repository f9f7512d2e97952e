from __future__ import annotations

import pytest
from pyspark.sql import types as T

from ccbot_spark.tablestore import TableStore

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("val", T.LongType(), False),
        T.StructField("status", T.StringType(), False),
    ]
)


@pytest.fixture
def store(spark, tmp_path):
    return TableStore(spark, str(tmp_path), "t", SCHEMA, partition_cols=("bucket",))


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_append_and_read(spark, store):
    store.append(_df(spark, [("a", 0, 1, "p"), ("b", 1, 2, "p")]))
    store.append(_df(spark, [("c", 0, 3, "p")]))
    got = {r.k: (r.bucket, r.val) for r in store.read().collect()}
    assert got == {"a": (0, 1), "b": (1, 2), "c": (0, 3)}


def test_time_travel_and_rollback(spark, store):
    v1 = store.append(_df(spark, [("a", 0, 1, "p")]))
    store.tag("cycle1")
    store.append(_df(spark, [("b", 1, 2, "p")]))
    assert store.read().count() == 2
    assert store.read(version=v1).count() == 1
    store.rollback(store.tagged_version("cycle1"))
    assert store.read().count() == 1


def test_partition_filter_prunes_files(spark, store):
    store.append(_df(spark, [("a", 0, 1, "p"), ("b", 1, 2, "p"), ("c", 2, 3, "p")]))
    only1 = store.read(partition_filter={"bucket": {"1"}})
    assert [r.k for r in only1.collect()] == ["b"]
    # manifest-level pruning: fewer files handed to Spark
    assert len(store._files()) > 1


def test_merge_update_and_insert(spark, store):
    store.append(
        _df(spark, [("a", 0, 1, "pending"), ("b", 1, 2, "pending"), ("c", 2, 3, "pending")])
    )
    src = _df(spark, [("a", 0, 1, "fetched"), ("d", 0, 9, "pending")])
    store.merge_into(src, on=["k"], update_cols=["status"])
    got = {r.k: r.status for r in store.read().collect()}
    assert got == {"a": "fetched", "b": "pending", "c": "pending", "d": "pending"}


def test_merge_rewrites_only_touched_partitions(spark, store):
    store.append(_df(spark, [("a", 0, 1, "p"), ("b", 1, 2, "p"), ("c", 2, 3, "p")]))
    before = {e["path"] for e in store._files() if e["parts"].get("bucket") == "2"}
    store.merge_into(_df(spark, [("a", 0, 1, "f")]), on=["k"], update_cols=["status"])
    after = {e["path"] for e in store._files() if e["parts"].get("bucket") == "2"}
    assert before == after  # bucket 2 untouched → same files carried over
    got = {r.k: r.status for r in store.read().collect()}
    assert got == {"a": "f", "b": "p", "c": "p"}


def test_merge_no_insert(spark, store):
    store.append(_df(spark, [("a", 0, 1, "p")]))
    store.merge_into(
        _df(spark, [("a", 0, 1, "f"), ("z", 3, 9, "p")]),
        on=["k"],
        update_cols=["status"],
        insert=False,
    )
    got = {r.k: r.status for r in store.read().collect()}
    assert got == {"a": "f"}


def test_empty_read_has_schema(spark, store):
    df = store.read()
    assert df.count() == 0
    assert df.schema == SCHEMA


def test_overwrite_sorted(spark, store):
    store.append(_df(spark, [("a", 0, 1, "p")]))
    store.overwrite(
        _df(spark, [("z", 0, 9, "p"), ("y", 0, 8, "p")]),
        sort_within_partitions_by=["k"],
    )
    assert sorted(r.k for r in store.read().collect()) == ["y", "z"]


def test_backend_factory_falls_back_to_parquet(spark, tmp_path, monkeypatch):
    """No Iceberg runtime in this sandbox → the factory must return the
    Parquet-emulated store, both without the env flag and with a flag
    pointing at an unloadable catalog class."""
    from ccbot_spark import iceberg
    from ccbot_spark.tablestore import TableStore as ParquetStore
    from ccbot_spark import schemas

    st = iceberg.make_table_store(spark, str(tmp_path / "a"), "t", schemas.TRACE)
    assert isinstance(st, ParquetStore)

    monkeypatch.setenv(iceberg.CATALOG_ENV, "nope")
    spark.conf.set("spark.sql.catalog.nope",
                   "org.apache.iceberg.spark.SparkCatalog")
    try:
        assert not iceberg.iceberg_available(spark)
        st2 = iceberg.make_table_store(
            spark, str(tmp_path / "b"), "t", schemas.TRACE
        )
        assert isinstance(st2, ParquetStore)
    finally:
        spark.conf.unset("spark.sql.catalog.nope")


def test_row_count_from_manifest_metadata(spark, store):
    assert store.row_count() == 0
    store.append(_df(spark, [("a", 0, 1, "p"), ("b", 1, 2, "p")]))
    assert store.row_count() == 2
    store.append(_df(spark, [("c", 0, 3, "p")]))
    assert store.row_count() == 3
    v2 = store.version()
    store.merge_into(
        _df(spark, [("c", 0, 9, "x"), ("d", 1, 4, "p")]),
        on=["k"],
        update_cols=["val", "status"],
    )
    assert store.row_count() == 4 == store.read().count()
    # time travel: count at an old version reads that version's manifest
    assert store.row_count(v2) == 3
    store.overwrite(_df(spark, [("z", 2, 0, "p")]))
    assert store.row_count() == 1


def test_compact_collapses_small_files(spark, store):
    """COW churn → many small files per bucket; compact() rewrites to
    one file per partition with identical contents, and older
    snapshots still read (nothing is deleted by compaction)."""
    for i in range(4):
        store.append(_df(spark, [(f"a{i}", 0, i, "p"), (f"b{i}", 1, i, "p")]))
    v_before = store.version()
    before = {tuple(r) for r in store.read().collect()}
    n_before, n_after = store.compact()
    assert n_before == 8 and n_after == 2  # one file per bucket
    assert {tuple(r) for r in store.read().collect()} == before
    assert store.row_count() == 8
    # time travel to the pre-compaction snapshot still works
    assert store.read(version=v_before).count() == 8


def test_compact_noop_when_already_compact(spark, store):
    store.append(_df(spark, [("a", 0, 1, "p"), ("b", 1, 2, "p")]))
    v = store.version()
    assert store.compact() == (2, 2)
    assert store.version() == v  # no new snapshot committed


def test_expire_snapshots_gc(spark, store):
    """expire_snapshots removes unreferenced files of dropped versions;
    kept versions (last-N, tags, current) still read correctly."""
    import os

    for i in range(4):
        store.append(_df(spark, [(f"a{i}", 0, i, "p")]))
    store.compact()
    tagged_v = store.version()
    store.tag("keep-me")
    store.append(_df(spark, [("z", 1, 9, "p")]))
    deleted = store.expire_snapshots(keep_last=1)
    assert deleted > 0
    # current + tagged still fully readable
    assert store.read().count() == 5
    assert store.read(version=store.tagged_version("keep-me")).count() == 4
    # expired versions are gone from the manifest
    assert str(1) not in store._read_manifest()["versions"]
    # and every referenced file still exists on disk
    for e in store._files():
        assert os.path.exists(e["path"])
    assert tagged_v in set(store._read_manifest()["tags"].values())


def test_partition_file_stats_metadata_only(spark, store):
    store.append(_df(spark, [("a", 0, 1, "p"), ("b", 1, 2, "p")]))
    store.append(_df(spark, [("c", 0, 3, "p")]))
    stats = {s["parts"]["bucket"]: (s["n_files"], s["n_rows"]) for s in store.partition_file_stats()}
    assert stats == {"0": (2, 2), "1": (1, 1)}


def test_append_rows_driver_side(spark, tmp_path):
    """Metadata-sized appends go through pyarrow directly — no Spark
    job — and read back identically through the normal path."""
    lin_schema = T.StructType(
        [
            T.StructField("cycle", T.IntegerType(), False),
            T.StructField("table", T.StringType(), False),
            T.StructField("n_rows", T.LongType(), False),
        ]
    )
    st = TableStore(spark, str(tmp_path), "lin", lin_schema)
    st.append_rows([(1, "frontier", 10), (1, "seen", 20)])
    st.append_rows([(2, "frontier", 30)])
    assert st.row_count() == 3  # manifest metadata
    got = {(r.cycle, r.table, r.n_rows) for r in st.read().collect()}
    assert got == {(1, "frontier", 10), (1, "seen", 20), (2, "frontier", 30)}


# ---------------------------------------------------- incremental read

def test_read_added_is_exact_row_delta_for_appends(spark, store):
    v1 = store.append(_df(spark, [("a", 0, 1, "p"), ("b", 1, 2, "p")]))
    store.tag("cycle1")
    store.append(_df(spark, [("c", 0, 3, "p")]))
    store.append(_df(spark, [("d", 2, 4, "p")]))
    added = {r.k for r in store.read_added(v1).collect()}
    assert added == {"c", "d"}
    # from the tag, same thing; from genesis, everything; empty delta
    assert {r.k for r in store.read_added(store.tagged_version("cycle1")).collect()} == {"c", "d"}
    assert {r.k for r in store.read_added(0).collect()} == {"a", "b", "c", "d"}
    assert store.read_added(store.version()).count() == 0
    # manifest arithmetic only: the delta never re-reads old files
    old_paths = {e["path"] for e in store._files(v1)}
    assert all(e["path"] not in old_paths for e in store.added_files(v1))


def test_read_added_cow_merge_rescans_touched_partitions_only(spark, store):
    v1 = store.append(
        _df(spark, [("a", 0, 1, "p"), ("b", 1, 2, "p"), ("c", 2, 3, "p")])
    )
    # merge touches bucket 1 only (update b, insert d)
    store.merge_into(
        _df(spark, [("b", 1, 20, "p"), ("d", 1, 4, "p")]),
        on=["k"],
        update_cols=["val"],
    )
    assert store.changed_partitions(v1) == {"1"}
    rows = {r.k: r.val for r in store.read_added(v1).collect()}
    # the rewritten partition's rows — changed AND carried — appear;
    # untouched partitions (buckets 0, 2) contribute nothing
    assert rows == {"b": 20, "d": 4}
    full = {r.k: r.val for r in store.read().collect()}
    assert full == {"a": 1, "b": 20, "c": 3, "d": 4}
