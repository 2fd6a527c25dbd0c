"""SnapshotTable through the PySpark 4 Python Data Source API
(sources/pydatasource.py): batch `format("snapshot")` snapshots/time
travel and the `format("snapshot_changes")` CDC feed, batch + streaming."""

import pytest
from pyspark.sql import functions as F

from predicting_hospital_readmission_using_mimic_database_spark.sources.pydatasource import (
    register_datasources,
)
from predicting_hospital_readmission_using_mimic_database_spark.sources.table import SnapshotTable

SCHEMA = "k bigint, v double, tag string"


def _rows(spark, lo, hi, tag="a"):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.0).alias("v"),
        F.lit(tag).alias("tag"),
    )


@pytest.fixture
def table(spark, tmp_path):
    register_datasources(spark)
    t = SnapshotTable.create(
        spark, str(tmp_path / "tbl"), SCHEMA, bucket_key=["k"], num_buckets=4
    )
    t.append(_rows(spark, 0, 50))
    upd = spark.createDataFrame(
        [(7, -7.0, "upd"), (500, 1.0, "new")], SCHEMA
    )
    t.merge(upd)
    return t


def _rowset(df):
    return sorted(tuple(r) for r in df.collect())


def test_batch_snapshot_format(spark, table):
    got = spark.read.format("snapshot").option("path", table.root).load()
    assert got.columns == ["k", "v", "tag"]
    assert _rowset(got) == _rowset(table.read())
    # time travel through the option
    v1 = (
        spark.read.format("snapshot")
        .option("path", table.root)
        .option("version", 1)
        .load()
    )
    assert _rowset(v1) == _rowset(table.read(version=1))
    # predicates/projections still work on top (Python source -> Spark ops)
    assert (
        spark.read.format("snapshot").option("path", table.root).load()
        .filter("tag = 'upd'").count()
        == 1
    )


def test_changes_batch_format_matches_read_changes(spark, table):
    got = (
        spark.read.format("snapshot_changes")
        .option("path", table.root)
        .option("startingVersion", 0)
        .load()
    )
    assert got.columns == ["k", "v", "tag", "_change_type", "_commit_version"]
    assert _rowset(got) == _rowset(table.read_changes(0))
    # the merge commit carries the update pre/post images + the insert,
    # and NOT the rewritten-but-unchanged rows of the touched buckets
    mc = got.filter("_commit_version = 2")
    assert _rowset(mc) == sorted(
        [
            (7, 7.0, "a", "delete", 2),
            (7, -7.0, "upd", "insert", 2),
            (500, 1.0, "new", "insert", 2),
        ]
    )


def test_changes_stream_incremental(spark, table, tmp_path):
    ckpt = str(tmp_path / "ckpt")

    def drain():
        got = []

        def sink(df, _bid):
            got.extend(tuple(r) for r in df.collect())

        q = (
            spark.readStream.format("snapshot_changes")
            .option("path", table.root)
            .option("startingVersion", 0)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(got)

    assert drain() == _rowset(table.read_changes(0))
    # new commits after the first drain: the SAME checkpoint resumes and
    # sees ONLY the delta
    table.append(_rows(spark, 1000, 1005, tag="late"))
    assert drain() == sorted(
        (k, float(k), "late", "insert", 3) for k in range(1000, 1005)
    )


def test_stream_default_start_is_current(spark, table):
    """Without startingVersion the stream begins at the CURRENT version:
    history is not replayed, only future commits arrive."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.pydatasource import (
        SnapshotChangesStreamReader,
    )

    r = SnapshotChangesStreamReader({"path": table.root})
    assert r.initialOffset() == {"version": table.version}
    table.append(_rows(spark, 2000, 2002))
    assert r.latestOffset() == {"version": table.version}
    parts = r.partitions(
        {"version": table.version - 1}, {"version": table.version}
    )
    rows = [row for p in parts for row in r.read(p)]
    assert sorted(rows) == sorted(
        (k, float(k), "a", "insert", table.version) for k in (2000, 2001)
    )
