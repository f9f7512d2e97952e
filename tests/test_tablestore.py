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
