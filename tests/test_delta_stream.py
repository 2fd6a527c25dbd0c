"""Foreign-Delta streaming source (sources/delta_stream.py): commit-
version offsets, append tailing, checkpoint-resume exactly-once, DV
row skipping, partition-value materialization, and the data-changing-
remove gate."""

import json
import os

import pytest

from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import DeltaProtocolError
from predicting_hospital_readmission_using_mimic_database_spark.sources.delta_stream import (
    register_delta_stream,
)
from tests.test_delta_interop import (
    _meta_action,
    _write_commit,
    _write_parquet,
)


def _add(rel, pv=None, dv=None, data_change=True):
    a = {
        "path": rel,
        "partitionValues": pv or {},
        "size": 1,
        "modificationTime": 0,
        "dataChange": data_change,
    }
    if dv:
        a["deletionVector"] = dv
    return {"add": a}


@pytest.fixture
def stream_root(tmp_path):
    """v0: meta + seg=A file (ids 0,1); v1: append seg=B file (id 10)."""
    root = str(tmp_path / "dstream")
    _write_parquet(os.path.join(root, "a0.parquet"), [(0,), (1,)], ["id"])
    _write_parquet(os.path.join(root, "b0.parquet"), [(10,)], ["id"])
    fields = [("id", "long"), ("seg", "string")]
    _write_commit(
        root,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            _meta_action(fields, part_cols=["seg"]),
            _add("a0.parquet", {"seg": "A"}),
        ],
    )
    _write_commit(root, 1, [_add("b0.parquet", {"seg": "B"})])
    return root


def _drain(spark, root, ckpt, **opts):
    got = []

    def sink(df, _bid):
        got.extend(tuple(r) for r in df.collect())

    reader = spark.readStream.format("delta_stream").option("path", root)
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return sorted(got)


def test_stream_full_history_and_resume(spark, stream_root, tmp_path):
    register_delta_stream(spark)
    ckpt = str(tmp_path / "ck")
    got = _drain(spark, stream_root, ckpt, startingVersion=0)
    assert got == [(0, "A", 0), (1, "A", 0), (10, "B", 1)]
    # no new commits: the same checkpoint drains nothing
    assert _drain(spark, stream_root, ckpt, startingVersion=0) == []
    # a new append commit: the resumed stream sees ONLY the delta
    _write_parquet(
        os.path.join(stream_root, "c0.parquet"), [(20,), (21,)], ["id"]
    )
    _write_commit(stream_root, 2, [_add("c0.parquet", {"seg": "C"})])
    assert _drain(spark, stream_root, ckpt, startingVersion=0) == [
        (20, "C", 2), (21, "C", 2)
    ]


def test_stream_batch_view_and_default_latest(spark, stream_root, tmp_path):
    register_delta_stream(spark)
    # batch view: whole tail in one frame
    df = (
        spark.read.format("delta_stream")
        .option("path", stream_root)
        .load()
    )
    assert sorted(tuple(r) for r in df.collect()) == [
        (0, "A", 0), (1, "A", 0), (10, "B", 1)
    ]
    # default startingVersion=latest: a fresh stream sees nothing until
    # a commit lands after stream start
    assert _drain(spark, stream_root, str(tmp_path / "ck2")) == []


def test_stream_applies_deletion_vectors(spark, stream_root, tmp_path):
    from predicting_hospital_readmission_using_mimic_database_spark.sources.dv import write_dv_file

    register_delta_stream(spark)
    _write_parquet(
        os.path.join(stream_root, "d0.parquet"),
        [(30,), (31,), (32,)],
        ["id"],
    )
    desc = write_dv_file(os.path.join(stream_root, "dv_d0.bin"), [1])
    _write_commit(stream_root, 2, [_add("d0.parquet", {"seg": "D"}, dv=desc)])
    got = _drain(
        spark, stream_root, str(tmp_path / "ck3"), startingVersion=2
    )
    assert got == [(30, "D", 2), (32, "D", 2)]  # ordinal 1 skipped


def test_stream_gates_data_changing_removes(spark, stream_root, tmp_path):
    register_delta_stream(spark)
    _write_parquet(os.path.join(stream_root, "a1.parquet"), [(0,)], ["id"])
    _write_commit(
        stream_root,
        2,
        [
            {"remove": {"path": "a0.parquet", "deletionTimestamp": 1,
                        "dataChange": True}},
            _add("a1.parquet", {"seg": "A"}),
        ],
    )
    with pytest.raises(Exception) as ei:
        _drain(spark, stream_root, str(tmp_path / "ck4"), startingVersion=2)
    assert "ignoreChanges" in str(ei.value)
    # ignoreChanges=true processes the adds of the rewriting commit
    got = _drain(
        spark, stream_root, str(tmp_path / "ck5"),
        startingVersion=2, ignoreChanges="true",
    )
    assert got == [(0, "A", 2)]
    # dataChange=false adds (pure compaction) emit nothing either way
    _write_parquet(os.path.join(stream_root, "comp.parquet"), [(99,)], ["id"])
    _write_commit(
        stream_root, 3, [_add("comp.parquet", {"seg": "A"}, data_change=False)]
    )
    assert _drain(
        spark, stream_root, str(tmp_path / "ck5"),
        startingVersion=2, ignoreChanges="true",
    ) == []


def test_stream_change_feed_mode(spark, tmp_path):
    """readChangeFeed=true: cdc files win over add/remove, removes stream
    as derived deletes instead of raising, rows carry _change_type."""
    root = str(tmp_path / "cdfstream")
    _write_parquet(os.path.join(root, "f0.parquet"), [(1,), (2,)], ["id"])
    _write_commit(
        root, 0,
        [{"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
         _meta_action([("id", "long")]),
         _add("f0.parquet")],
    )
    # v1: cdc update commit — its remove/add pair must be superseded
    _write_parquet(
        os.path.join(root, "_change_data", "cdc-1.parquet"),
        [(1, "update_preimage"), (1, "update_postimage")],
        ["id", "_change_type"],
    )
    _write_parquet(os.path.join(root, "f1.parquet"), [(1,), (2,)], ["id"])
    _write_commit(
        root, 1,
        [{"cdc": {"path": "_change_data/cdc-1.parquet", "partitionValues": {},
                  "size": 1, "dataChange": False}},
         {"remove": {"path": "f0.parquet", "dataChange": True}},
         _add("f1.parquet")],
    )
    # v2: plain remove commit -> derived deletes (would raise in tail mode)
    _write_commit(root, 2, [{"remove": {"path": "f1.parquet", "dataChange": True}}])
    got = _drain(
        spark, root, str(tmp_path / "ckcdf"),
        startingVersion=0, readChangeFeed="true",
    )
    assert got == sorted(
        [
            (1, "insert", 0), (2, "insert", 0),
            (1, "update_preimage", 1), (1, "update_postimage", 1),
            (1, "delete", 2), (2, "delete", 2),
        ]
    )
    # tail mode still raises on the same log
    with pytest.raises(Exception) as ei:
        _drain(spark, root, str(tmp_path / "cktail"), startingVersion=0)
    assert "readChangeFeed" in str(ei.value)


def test_stream_column_mapping_name_mode(spark, tmp_path):
    """delta_stream over a NAME-mode column-mapping table: physical
    col-uuid file columns and physical partitionValues keys stream out
    under the LOGICAL schema with partition values attached."""
    import json as _json

    from tests.test_delta_interop import _write_parquet

    root = str(tmp_path / "cmstream")
    _write_parquet(
        os.path.join(root, "f0.parquet"), [(1, 10), (2, 20)],
        ["col-aaa", "col-bbb"],
    )
    fields = []
    for name, typ, phys, cid in (
        ("k", "long", "col-aaa", 1),
        ("v", "long", "col-bbb", 2),
        ("seg", "string", "col-ccc", 3),
    ):
        fields.append(
            {"name": name, "type": typ, "nullable": True,
             "metadata": {"delta.columnMapping.physicalName": phys,
                          "delta.columnMapping.id": cid}}
        )
    _write_commit(
        root, 0,
        [{"protocol": {"minReaderVersion": 2}},
         {"metaData": {
             "id": "cmstream",
             "format": {"provider": "parquet", "options": {}},
             "schemaString": _json.dumps({"type": "struct", "fields": fields}),
             "partitionColumns": ["seg"],
             "configuration": {"delta.columnMapping.mode": "name"},
         }},
         {"add": {"path": "f0.parquet",
                  "partitionValues": {"col-ccc": "a"},
                  "size": 1, "dataChange": True}}],
    )
    register_delta_stream(spark)
    got = _drain(spark, root, str(tmp_path / "ck"), startingVersion=0)
    assert sorted(got) == [(1, 10, "a", 0), (2, 20, "a", 0)]
    # batch tail view agrees, logical column names on the surface
    df = spark.read.format("delta_stream").option("path", root).load()
    assert df.columns == ["k", "v", "seg", "_commit_version"]
    assert df.count() == 2


def test_stream_column_mapping_id_mode(spark, tmp_path):
    """delta_stream over an ID-mode column-mapping table: each file's
    columns resolve by PARQUET:field_id against the declared
    delta.columnMapping.id — two files carrying DIFFERENT physical
    names for the same field ids stream out aligned logically. A file
    missing a declared field id NULL-fills (ADD COLUMN shape)."""
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "cmid_stream")
    os.makedirs(root, exist_ok=True)

    def pfile(path, names, ids, rows):
        sch = pa.schema(
            [
                pa.field(
                    n,
                    pa.int64(),
                    metadata={b"PARQUET:field_id": str(fid).encode()},
                )
                for n, fid in zip(names, ids)
            ]
        )
        cols = list(zip(*rows))
        pq.write_table(
            pa.table({n: list(c) for n, c in zip(names, cols)}, schema=sch),
            os.path.join(root, path),
        )

    # v0 file: pre-rename physical names; v1 file: post-rename names
    pfile("old.parquet", ["col-aa", "col-bb"], [1, 2], [(1, 10), (2, 20)])
    pfile("new.parquet", ["col-cc", "col-dd"], [1, 2], [(3, 30)])
    fields = []
    for name, phys, cid in (
        ("k", "col-cc", 1), ("v", "col-dd", 2), ("seg", "col-ee", 3),
    ):
        fields.append(
            {"name": name, "type": "long" if name != "seg" else "string",
             "nullable": True,
             "metadata": {"delta.columnMapping.physicalName": phys,
                          "delta.columnMapping.id": cid}}
        )
    _write_commit(
        root, 0,
        [{"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
         {"metaData": {
             "id": "cmid_stream",
             "format": {"provider": "parquet", "options": {}},
             "schemaString": _json.dumps({"type": "struct", "fields": fields}),
             "partitionColumns": ["seg"],
             "configuration": {"delta.columnMapping.mode": "id"},
         }},
         {"add": {"path": "old.parquet",
                  "partitionValues": {"col-ee": "X"},
                  "size": 1, "dataChange": True}}],
    )
    _write_commit(
        root, 1,
        [{"add": {"path": "new.parquet",
                  "partitionValues": {"col-ee": "Y"},
                  "size": 1, "dataChange": True}}],
    )
    register_delta_stream(spark)
    got = _drain(spark, root, str(tmp_path / "ck"), startingVersion=0)
    assert sorted(got) == [
        (1, 10, "X", 0), (2, 20, "X", 0), (3, 30, "Y", 1)
    ]
    # batch tail agrees, logical names on the surface
    df = spark.read.format("delta_stream").option("path", root).load()
    assert df.columns == ["k", "v", "seg", "_commit_version"]
    assert df.count() == 3
    # a file that lacks a declared field id NULL-FILLS that column —
    # the same resolution delta-spark applies, because a file written
    # before ADD COLUMN is indistinguishable from this shape and must
    # read as null, not fail the stream
    pfile("late.parquet", ["col-xx"], [1], [(9,)])
    _write_commit(
        root, 2,
        [{"add": {"path": "late.parquet",
                  "partitionValues": {"col-ee": "Z"},
                  "size": 1, "dataChange": True}}],
    )
    got2 = _drain(spark, root, str(tmp_path / "ck2"), startingVersion=0)
    assert (9, None, "Z", 2) in set(got2)


def test_stream_row_tracking(spark, stream_root, tmp_path):
    """rowTracking=true on the stream: fresh _row_id = the add's
    baseRowId + position, a rewritten file's MATERIALIZED columns win
    per row; tables without the feature raise; combining with
    readChangeFeed is gated."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tests.test_delta_interop import (
        _rt_meta,
        _write_commit,
        _write_parquet,
    )

    root = str(tmp_path / "srt")
    _write_parquet(
        os.path.join(root, "a.parquet"), [(1, 10), (2, 20)], ["k", "bal"]
    )
    pq.write_table(
        pa.table(
            {
                "k": pa.array([2, 3], type=pa.int64()),
                "bal": pa.array([20, 30], type=pa.int64()),
                "_rid_mat": pa.array([101, None], type=pa.int64()),
                "_rver_mat": pa.array([0, None], type=pa.int64()),
            }
        ),
        os.path.join(root, "b.parquet"),
    )
    _write_commit(root, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 7,
                      "writerFeatures": ["rowTracking"]}},
        _rt_meta(),
        {"add": {"path": "a.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "baseRowId": 100, "defaultRowCommitVersion": 0}},
    ])
    _write_commit(root, 1, [
        {"add": {"path": "b.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "baseRowId": 200, "defaultRowCommitVersion": 1}},
    ])
    register_delta_stream(spark)
    got = _drain(spark, root, str(tmp_path / "ck"),
                 startingVersion=0, rowTracking="true")
    assert sorted(got) == [
        (1, 10, 100, 0, 0),   # fresh: baseRowId + pos @ version 0
        (2, 20, 101, 0, 0),
        (2, 20, 101, 0, 1),   # carried row kept its STORED identity
        (3, 30, 201, 1, 1),   # new row in the rewritten file: fresh
    ]
    # a table without the feature raises
    with pytest.raises(Exception, match="enableRowTracking"):
        _drain(spark, stream_root, str(tmp_path / "ck2"),
               startingVersion=0, rowTracking="true")
    # change feed + row tracking cannot combine
    with pytest.raises(Exception, match="cannot combine"):
        _drain(spark, root, str(tmp_path / "ck3"),
               startingVersion=0, rowTracking="true",
               readChangeFeed="true")


def test_stream_change_feed_over_exported_merge(spark, tmp_path):
    """COMPOSITION: delta_stream's readChangeFeed over a log OUR OWN
    exporter wrote — the merge commit's cdc files supersede its
    add/remove pair, so the stream emits exact update images and
    carried rows never surface as derived delete+insert pairs."""
    import pyspark.sql.functions as F

    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import (
        export_delta_log,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.table import (
        SnapshotTable,
    )

    root = str(tmp_path / "xcdf")
    t = SnapshotTable.create(
        spark, root, "k bigint, v long", bucket_key=["k"], num_buckets=2
    )
    t.append(spark.createDataFrame(
        [(i, 10 * i) for i in range(8)], "k bigint, v long"
    ))
    assert export_delta_log(t) == 0
    t.merge(spark.createDataFrame([(3, 999)], "k bigint, v long"))
    t.delete(F.col("k") == 5)
    assert export_delta_log(t) == 1
    register_delta_stream(spark)
    got = _drain(spark, root, str(tmp_path / "ck"),
                 startingVersion=1, readChangeFeed="true")
    assert sorted(got) == [
        (3, 30, "update_preimage", 1),
        (3, 999, "update_postimage", 1),
        (5, 50, "delete", 1),
    ]


def test_stream_null_fills_columns_the_file_predates(spark, tmp_path):
    """A file written BEFORE a column was added (mid-history metaData
    evolution) streams with that column NULL-filled — Delta's read
    semantics — instead of failing the parquet read; files written
    after carry their real values. Same under field-id resolution:
    a missing id NULL-fills rather than raising."""
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tests.test_delta_interop import _meta_action, _write_parquet

    root = str(tmp_path / "addcol")
    os.makedirs(root, exist_ok=True)
    _write_parquet(os.path.join(root, "a.parquet"), [(1, 10)], ["k", "v"])
    _write_parquet(
        os.path.join(root, "b.parquet"), [(2, 20, 200)], ["k", "v", "w"]
    )
    log = os.path.join(root, "_delta_log")
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"{0:020d}.json"), "w") as f:
        f.write(_json.dumps(
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
        ) + "\n")
        f.write(_json.dumps(_meta_action([("k", "long"), ("v", "long")])) + "\n")
        f.write(_json.dumps(
            {"add": {"path": "a.parquet", "partitionValues": {},
                     "size": 1, "modificationTime": 0, "dataChange": True}}
        ) + "\n")
    with open(os.path.join(log, f"{1:020d}.json"), "w") as f:
        f.write(_json.dumps(_meta_action(
            [("k", "long"), ("v", "long"), ("w", "long")]
        )) + "\n")
        f.write(_json.dumps(
            {"add": {"path": "b.parquet", "partitionValues": {},
                     "size": 1, "modificationTime": 0, "dataChange": True}}
        ) + "\n")
    register_delta_stream(spark)
    got = _drain(spark, root, str(tmp_path / "ck"), startingVersion=0)
    assert sorted(got) == [(1, 10, None, 0), (2, 20, 200, 1)]


def test_stream_row_tracking_composes_with_dv(spark, tmp_path):
    """rowTracking + a deletion vector on the same add: the dead row
    is skipped WITHOUT renumbering survivors (fresh ids are physical
    positions)."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.dv import (
        write_dv_file,
    )
    from tests.test_delta_interop import (
        _rt_meta,
        _write_commit,
        _write_parquet,
    )

    root = str(tmp_path / "rtdvs")
    _write_parquet(
        os.path.join(root, "a.parquet"),
        [(1, 10), (2, 20), (3, 30)], ["k", "bal"],
    )
    desc = write_dv_file(os.path.join(root, "dv_a.bin"), [1])  # kills k=2
    _write_commit(root, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["rowTracking", "deletionVectors"]}},
        _rt_meta(mat=False),
        {"add": {"path": "a.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "baseRowId": 100, "defaultRowCommitVersion": 0,
                 "deletionVector": desc}},
    ])
    register_delta_stream(spark)
    got = _drain(spark, root, str(tmp_path / "ck"),
                 startingVersion=0, rowTracking="true")
    # k=3 keeps _row_id 102: position-based, not survivor-renumbered
    assert got == [(1, 10, 100, 0, 0), (3, 30, 102, 0, 0)]


def test_stream_serves_timestamp_columns(spark, tmp_path):
    """Spark writes parquet timestamps tz-naive; the Python DS
    serializer needs them tz-aware — the shared localize helper must
    cover every stream source (a table with a ts column previously
    crashed the worker)."""
    import pyspark.sql.functions as F

    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import (
        export_delta_log,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.table import (
        SnapshotTable,
    )

    root = str(tmp_path / "ts")
    t = SnapshotTable.create(
        spark, root, "k bigint, ts timestamp", bucket_key=["k"],
        num_buckets=2,
    )
    t.append(
        spark.range(6).select(
            F.col("id").alias("k"),
            (
                F.to_timestamp(F.lit("2026-01-01 00:00:00"))
                + F.make_interval(hours=F.col("id"))
            ).alias("ts"),
        )
    )
    export_delta_log(t)
    register_delta_stream(spark)
    got = []
    q = (
        spark.readStream.format("delta_stream")
        .option("path", root).option("startingVersion", 0)
        .load()
        .writeStream.foreachBatch(
            lambda d, _b: got.extend(
                (r["k"], r["ts"]) for r in d.collect()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(got) == 6
    import datetime

    by_k = dict(got)
    assert by_k[3] == datetime.datetime(2026, 1, 1, 3)
