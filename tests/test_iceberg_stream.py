"""Iceberg streaming source (sources/iceberg_stream.py): snapshot-
lineage offsets, append-only gating, checkpoint resume, lineage-drift
detection."""

import json
import os

import pytest

from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
    IcebergProtocolError,
    export_iceberg,
)
from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg_stream import (
    register_iceberg_stream,
)
from predicting_hospital_readmission_using_mimic_database_spark.sources.table import SnapshotTable


@pytest.fixture
def ice_root(spark, tmp_path):
    """Two exported snapshots: s1 = k 0..4, s2 = k 100..102. The
    incremental exporter commits the second as a REAL append snapshot
    (one added-files manifest stamped with sid 2, snapshot-1 manifest
    carried by path, operation 'append') — no fixture surgery needed."""
    import pyspark.sql.functions as F

    root = str(tmp_path / "icestream")
    t = SnapshotTable.create(spark, root, "k bigint, v double")
    t.append(
        spark.range(5).select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
    )
    assert export_iceberg(t) == 1
    t.append(
        spark.range(100, 103).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        )
    )
    assert export_iceberg(t) == 2
    # sanity: the exporter committed an append-shaped snapshot
    mdir = os.path.join(root, "metadata")
    with open(os.path.join(mdir, "version-hint.text")) as f:
        hint = f.read().strip()
    with open(os.path.join(mdir, f"v{hint}.metadata.json")) as f:
        meta = json.load(f)
    snaps = {s_["snapshot-id"]: s_ for s_ in meta["snapshots"]}
    assert snaps[2]["summary"]["operation"] == "append"
    return root


def _drain(spark, root, ckpt, **opts):
    got = []

    def sink(df, _bid):
        got.extend(tuple(r) for r in df.collect())

    reader = spark.readStream.format("iceberg_stream").option("path", root)
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


def test_append_history_and_resume(spark, ice_root, tmp_path):
    register_iceberg_stream(spark)
    ckpt = str(tmp_path / "ck")
    got = _drain(spark, ice_root, ckpt, startingSnapshotCount=0)
    ks = sorted(k for k, _v, _s in got)
    assert ks == [0, 1, 2, 3, 4, 100, 101, 102]
    # snapshot stamps: the appended keys carry snapshot 2
    assert {s for k, _v, s in got if k >= 100} == {2}
    assert {s for k, _v, s in got if k < 100} == {1}
    # nothing new: same checkpoint drains nothing
    assert _drain(spark, ice_root, ckpt, startingSnapshotCount=0) == []
    # batch tail view agrees
    df = spark.read.format("iceberg_stream").option("path", ice_root).load()
    assert df.count() == 8


def test_non_append_snapshots_gate(spark, ice_root, tmp_path):
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        append_position_deletes,
    )

    register_iceberg_stream(spark)
    # a delete snapshot lands: the append scan must refuse...
    data_file = None
    import pyarrow.parquet as pq  # find a real (file, pos) target

    from predicting_hospital_readmission_using_mimic_database_spark.sources.avro_ocf import read_avro

    mdir = os.path.join(ice_root, "metadata")
    with open(os.path.join(mdir, "version-hint.text")) as f:
        hint = f.read().strip()
    with open(os.path.join(mdir, f"v{hint}.metadata.json")) as f:
        meta = json.load(f)
    snaps = {s["snapshot-id"]: s for s in meta["snapshots"]}
    _s, ml = read_avro(snaps[1]["manifest-list"])
    _s2, entries = read_avro(ml[0]["manifest_path"])
    data_file = entries[0]["data_file"]["file_path"]
    append_position_deletes(ice_root, [(data_file, 0)])
    with pytest.raises(Exception) as ei:
        _drain(spark, ice_root, str(tmp_path / "ck2"), startingSnapshotCount=0)
    assert "ignoreChanges" in str(ei.value)
    # ...unless ignoreChanges=true (delete snapshot adds no data files)
    got = _drain(
        spark, ice_root, str(tmp_path / "ck3"),
        startingSnapshotCount=0, ignoreChanges="true",
    )
    assert len(got) == 8


def test_lineage_drift_detected(spark, ice_root, tmp_path):
    register_iceberg_stream(spark)
    ckpt = str(tmp_path / "ck4")
    assert len(_drain(spark, ice_root, ckpt, startingSnapshotCount=0)) == 8
    # rewrite history under the checkpoint: swap a snapshot id
    mdir = os.path.join(ice_root, "metadata")
    with open(os.path.join(mdir, "version-hint.text")) as f:
        hint = f.read().strip()
    mp = os.path.join(mdir, f"v{hint}.metadata.json")
    with open(mp) as f:
        meta = json.load(f)
    meta["snapshots"][-1]["snapshot-id"] = 777
    meta["current-snapshot-id"] = 777
    with open(mp, "w") as f:
        json.dump(meta, f)
    with pytest.raises(Exception) as ei:
        _drain(spark, ice_root, ckpt, startingSnapshotCount=0)
    assert "lineage" in str(ei.value)


def test_entry_snapshot_id_inherited_from_manifest_list(spark, ice_root, tmp_path):
    """The spec makes entry snapshot_id OPTIONAL with inheritance from
    the manifest-list record's added_snapshot_id: a conforming foreign
    writer relying on inheritance must stream its appended rows, not
    silently zero."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.avro_ocf import (
        read_avro,
        write_avro,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        MANIFEST_ENTRY_SCHEMA,
    )

    mdir = os.path.join(ice_root, "metadata")
    with open(os.path.join(mdir, "version-hint.text")) as f:
        hint = f.read().strip()
    with open(os.path.join(mdir, f"v{hint}.metadata.json")) as f:
        meta = json.load(f)
    snaps = {s["snapshot-id"]: s for s in meta["snapshots"]}
    _s, ml2 = read_avro(snaps[2]["manifest-list"])
    appended = next(m for m in ml2 if m["added_snapshot_id"] == 2)
    _s2, entries = read_avro(appended["manifest_path"])
    # rewrite snapshot 2's entries with a NULL snapshot_id (inherited)
    write_avro(
        appended["manifest_path"],
        MANIFEST_ENTRY_SCHEMA,
        [{**e, "snapshot_id": None} for e in entries],
    )
    register_iceberg_stream(spark)
    got = _drain(spark, ice_root, str(tmp_path / "ckinh"),
                 startingSnapshotCount=0)
    ks = sorted(k for k, _v, _s in got)
    assert ks == [0, 1, 2, 3, 4, 100, 101, 102]
    assert {s for k, _v, s in got if k >= 100} == {2}


def test_batch_incremental_changes(spark, ice_root):
    """read_iceberg_changes: bounded (from, to] append windows with
    _snapshot_id stamps; non-append snapshots gate unless
    ignore_changes; unknown bounds raise."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        IcebergProtocolError,
        append_position_deletes,
        iceberg_meta_table,
        read_iceberg_changes,
    )

    allw = read_iceberg_changes(spark, ice_root)
    assert sorted((r["k"], r["_snapshot_id"]) for r in allw.collect()) == [
        (0, 1), (1, 1), (2, 1), (3, 1), (4, 1), (100, 2), (101, 2), (102, 2)
    ]
    tail = read_iceberg_changes(spark, ice_root, from_snapshot_id=1)
    assert sorted(r["k"] for r in tail.collect()) == [100, 101, 102]
    assert read_iceberg_changes(
        spark, ice_root, from_snapshot_id=2
    ).count() == 0
    head = read_iceberg_changes(spark, ice_root, to_snapshot_id=1)
    assert sorted(r["k"] for r in head.collect()) == [0, 1, 2, 3, 4]
    with pytest.raises(ValueError, match="not in the retained"):
        read_iceberg_changes(spark, ice_root, from_snapshot_id=9)
    # a delete snapshot in the window gates, ignore_changes passes
    f = iceberg_meta_table(spark, ice_root, "files").collect()[0]["file_path"]
    append_position_deletes(ice_root, [(f, 0)])
    with pytest.raises(IcebergProtocolError, match="ignore_changes"):
        read_iceberg_changes(spark, ice_root, from_snapshot_id=2)
    assert read_iceberg_changes(
        spark, ice_root, from_snapshot_id=2, ignore_changes=True
    ).count() == 0  # the delete snapshot added no data files


def test_schema_evolution_across_stream_and_incremental(spark, ice_root, tmp_path):
    """After a rename + added column, PRE-EVOLUTION files stream and
    incrementally read under the CURRENT schema — the write-time
    column resolves by field id on the driver (vintage_column_map) and
    per-file in the incremental scan's vintage union; a name-based
    read would NULL the renamed column or crash on the missing name."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        commit_schema_evolution,
        read_iceberg_changes,
    )

    nf = os.path.join(ice_root, "data-evo.parquet")
    pq.write_table(
        pa.table(
            {
                "k": pa.array([200], type=pa.int64()),
                "val": pa.array([2.5], type=pa.float64()),
                "tag": pa.array(["new"], type=pa.string()),
            }
        ),
        nf,
    )
    sid = commit_schema_evolution(
        ice_root,
        [
            {"id": 1, "name": "k", "type": "long"},
            {"id": 2, "name": "val", "type": "double"},  # renamed from v
            {"id": 3, "name": "tag", "type": "string"},
        ],
        added_files=[(nf, 1)],
    )
    assert sid == 3
    # batch incremental scan across both vintages
    allw = read_iceberg_changes(spark, ice_root)
    assert allw.columns == ["k", "val", "tag", "_snapshot_id"]
    rows = {(r["k"], r["val"], r["tag"], r["_snapshot_id"])
            for r in allw.collect()}
    assert (200, 2.5, "new", 3) in rows
    assert (0, 0.0, None, 1) in rows and (102, 102.0, None, 2) in rows
    assert len(rows) == 9
    # stream drain from 0: old-vintage files emit under current names
    register_iceberg_stream(spark)
    got = _drain(spark, ice_root, str(tmp_path / "ck_evo"),
                 startingSnapshotCount=0)
    assert sorted(got) == sorted(
        [(k, float(k), None, 1) for k in range(5)]
        + [(k, float(k), None, 2) for k in (100, 101, 102)]
        + [(200, 2.5, "new", 3)]
    )


def test_incremental_changes_space_in_path(spark, tmp_path):
    """A data-file path containing a SPACE (stored raw, the way real
    writers record locations): Spark URI-encodes it in
    _metadata.file_path, so the incremental scan's file->snapshot
    stamp join must decode the scan key back to the raw form — a key
    mismatch silently drops the whole file through the inner join."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        read_iceberg_changes,
    )
    from tests.test_iceberg_interop import (
        MANIFEST_ENTRY_SCHEMA as ENTRY_SCHEMA,
        MANIFEST_FILE_SCHEMA as MF_SCHEMA,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.avro_ocf import write_avro

    root = str(tmp_path / "esc")
    d = os.path.join(root, "data", "part a")
    os.makedirs(d)
    pq.write_table(
        pa.table({"k": pa.array([7], pa.int64())}),
        os.path.join(d, "f.parquet"),
    )
    mdir = os.path.join(root, "metadata")
    os.makedirs(mdir)
    m = os.path.join(mdir, "m1.avro")
    write_avro(m, ENTRY_SCHEMA, [{
        "status": 1, "snapshot_id": 1,
        "data_file": {
            "content": 0,
            "file_path": os.path.join(root, "data", "part a", "f.parquet"),
            "file_format": "PARQUET", "partition": {"seg": None},
            "record_count": 1, "file_size_in_bytes": 1,
        },
    }])
    ml = os.path.join(mdir, "ml1.avro")
    write_avro(ml, MF_SCHEMA, [{
        "manifest_path": m, "manifest_length": 1, "partition_spec_id": 0,
        "content": 0, "added_snapshot_id": 1,
    }])
    meta = {
        "format-version": 2, "table-uuid": "esc", "location": root,
        "current-snapshot-id": 1,
        "snapshots": [{"snapshot-id": 1, "timestamp-ms": 0,
                       "summary": {"operation": "append"},
                       "manifest-list": ml, "schema-id": 0}],
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "schemas": [{"type": "struct", "schema-id": 0, "fields": [
            {"id": 1, "name": "k", "required": False, "type": "long"}]}],
        "current-schema-id": 0,
    }
    with open(os.path.join(mdir, "v1.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(mdir, "version-hint.text"), "w") as f:
        f.write("1")
    got = [(r["k"], r["_snapshot_id"])
           for r in read_iceberg_changes(spark, root).collect()]
    assert got == [(7, 1)]


def test_changelog_stream_overwrite_and_resume(spark, tmp_path):
    """changelog=true: a REAL exporter overwrite (merge) streams as
    delete+insert pairs for the rewritten file's rows — no
    ignoreChanges needed; checkpoint resume sees only the new
    snapshot's images; positional AND equality strikes REPLAY as
    delete rows (the old gate — the official runtime still refuses
    these windows)."""
    import pyspark.sql.functions as F

    register_iceberg_stream(spark)
    root = str(tmp_path / "clogstream")
    t = SnapshotTable.create(
        spark, root, "k bigint, v double", bucket_key=["k"], num_buckets=2
    )
    t.append(spark.range(5).select(F.col("id").alias("k"),
                                   (F.col("id") * 1.0).alias("v")))
    assert export_iceberg(t) == 1
    ckpt = str(tmp_path / "ck")
    got = _drain(spark, root, ckpt, startingSnapshotCount=0,
                 changelog="true")
    assert sorted(got) == sorted(
        (k, float(k), "insert", 1) for k in range(5)
    )
    # merge k=0 -> -99.0: the exporter commits an OVERWRITE snapshot
    t.merge(spark.createDataFrame([(0, -99.0)], "k bigint, v double"))
    assert export_iceberg(t) == 2
    got2 = _drain(spark, root, ckpt, startingSnapshotCount=0,
                  changelog="true")
    dels = {(k, v) for k, v, c, s_ in got2 if c == "delete"}
    ins = {(k, v) for k, v, c, s_ in got2 if c == "insert"}
    assert all(s_ == 2 for _k, _v, _c, s_ in got2)
    # the rewritten file's rows appear on both sides; only k=0 differs
    assert ins - dels == {(0, -99.0)}
    assert dels - ins == {(0, 0.0)}
    # a positional strike REPLAYS: the struck row streams as a delete
    # on the strike snapshot (the checkpointed stream picks up ONLY it)
    import pyarrow.parquet as pq

    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        append_equality_deletes,
        append_position_deletes,
    )

    files = read_iceberg_files(root)
    struck_k = pq.read_table(files[0], columns=["k"]).column("k")[0].as_py()
    append_position_deletes(root, [(files[0], 0)])
    got3 = _drain(spark, root, ckpt, startingSnapshotCount=0,
                  changelog="true")
    assert got3 == [(struck_k, float(struck_k) if struck_k else -99.0,
                     "delete", 3)]
    # and it never resurrects in a fresh full drain
    full = _drain(spark, root, str(tmp_path / "ck2"),
                  startingSnapshotCount=0, changelog="true")
    assert (struck_k, "delete", 3) in {(k, c, s_) for k, _v, c, s_ in full}
    # an EQUALITY strike replays too (value predicate evaluated in
    # the worker; pre-struck rows never double-delete)
    eq_k = 3 if struck_k != 3 else 4
    append_equality_deletes(root, [{"k": eq_k}], ["k"])
    got4 = _drain(spark, root, ckpt, startingSnapshotCount=0,
                  changelog="true")
    assert got4 == [(eq_k, -99.0 if eq_k == 0 else float(eq_k),
                     "delete", 4)]
    # a fresh full drain agrees and still shows each strike once
    full2 = _drain(spark, root, str(tmp_path / "ck3"),
                   startingSnapshotCount=0, changelog="true")
    dels2 = [(k, s_) for k, _v, c, s_ in full2 if c == "delete"]
    assert dels2.count((eq_k, 4)) == 1 and dels2.count((struck_k, 3)) == 1


def read_iceberg_files(root):
    """Live data-file paths of the current snapshot (test helper)."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        _live_files,
        _metadata_path,
    )

    with open(_metadata_path(root)) as f:
        meta = json.load(f)
    files, _p, _e, _d = _live_files(meta, root, None)
    return [rec[0] for rec in files]


def test_stream_nested_evolution_and_defaults(spark, tmp_path):
    """Draining a stream ACROSS a nested-evolution + default-adding
    commit: pre-evolution files project to the CURRENT schema inside
    the Python worker, per input partition (one file = one vintage) —
    the struct member renamed AND promoted by field id (bal_c int ->
    balance_cents long), the member added after the vintage
    NULL-filled, a NULL struct staying NULL, and the new TOP-LEVEL
    column filled with its v3 initial-default. The old name-map path
    raised on both shapes; this is the real read that replaced it.
    Post-evolution files pass through identity."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pyspark.sql.functions as F  # noqa: F401

    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        commit_schema_evolution,
    )

    root = str(tmp_path / "icevolve")
    t = SnapshotTable.create(
        spark, root, "k bigint, prof struct<bal_c:int,nation:bigint>"
    )
    t.append(
        spark.createDataFrame(
            [(1, (100, 7)), (2, (200, 8)), (3, None)],
            "k bigint, prof struct<bal_c:int,nation:bigint>",
        )
    )
    assert export_iceberg(t) == 1
    nf = os.path.join(root, "data-evo.parquet")
    prof_t = pa.struct(
        [
            ("balance_cents", pa.int64()),
            ("nation", pa.int64()),
            ("tier", pa.string()),
        ]
    )
    pq.write_table(
        pa.table(
            {
                "k": pa.array([4], type=pa.int64()),
                "prof": pa.array(
                    [{"balance_cents": 400, "nation": 9, "tier": "T1"}],
                    type=prof_t,
                ),
                "grade": pa.array(["NEW"], type=pa.string()),
            }
        ),
        nf,
    )
    commit_schema_evolution(
        root,
        [
            {"id": 1, "name": "k", "type": "long"},
            {"id": 2, "name": "prof", "type": {"type": "struct", "fields": [
                {"id": 3, "name": "balance_cents", "required": False,
                 "type": "long"},
                {"id": 4, "name": "nation", "required": False,
                 "type": "long"},
                {"id": 5, "name": "tier", "required": False,
                 "type": "string"},
            ]}},
            {"id": 6, "name": "grade", "type": "string",
             "initial-default": "STD"},
        ],
        added_files=[(nf, 1)],
    )
    register_iceberg_stream(spark)
    got = _drain(
        spark, root, str(tmp_path / "ck_nested"), startingSnapshotCount=0
    )
    rows = {k: (prof, grade, sid) for k, prof, grade, sid in got}
    assert rows[1] == ((100, 7, None), "STD", 1)
    assert rows[2] == ((200, 8, None), "STD", 1)
    assert rows[3] == (None, "STD", 1)
    assert rows[4] == ((400, 9, "T1"), "NEW", 2)


def test_stream_row_lineage_and_materialized_precedence(spark, tmp_path):
    """rowLineage=true on the stream: fresh ids are the file's
    manifest-INHERITED first_row_id + position, STORED materialized
    reserved columns win per row, v2 tables raise, and combining with
    changelog mode is gated."""
    import pyarrow as pa

    from tests.test_iceberg_interop import (
        _entry,
        _manifest,
        _manifest_list,
        _write_parquet_typed,
    )

    root = str(tmp_path / "slinmat")
    f = os.path.join(root, "data", "a.parquet")
    _write_parquet_typed(
        f,
        {
            "k": (pa.int64(), [1, 2, 3]),
            "bal": (pa.int64(), [10, 20, 30]),
            # k=1,2 carried across a rewrite keep ids 500/501 @ seq 1;
            # k=3 is new (NULL stored -> fresh 102 @ manifest seq 7)
            "_row_id": (pa.int64(), [500, 501, None]),
            "_last_updated_sequence_number": (pa.int64(), [1, 1, None]),
        },
    )
    m = _manifest(root, "m1.avro", [_entry(f, None, 3)])
    ml = _manifest_list(
        root, "ml1.avro", [m], first_row_id=100, sequence_number=7
    )
    meta = {
        "format-version": 3,
        "table-uuid": "slinmat",
        "location": root,
        "current-snapshot-id": 1,
        "snapshots": [{"snapshot-id": 1, "timestamp-ms": 1000,
                       "summary": {"operation": "append"},
                       "manifest-list": ml, "schema-id": 0,
                       "first-row-id": 100}],
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "schemas": [{"type": "struct", "schema-id": 0, "fields": [
            {"id": 1, "name": "k", "required": False, "type": "long"},
            {"id": 2, "name": "bal", "required": False, "type": "long"},
        ]}],
        "current-schema-id": 0,
        "last-column-id": 2,
        "next-row-id": 103,
    }
    os.makedirs(os.path.join(root, "metadata"), exist_ok=True)
    with open(os.path.join(root, "metadata", "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as fh:
        fh.write("1")
    register_iceberg_stream(spark)
    got = _drain(spark, root, str(tmp_path / "ck"),
                 startingSnapshotCount=0, rowLineage="true")
    rows = {k: (rid, lus, sid) for k, _bal, rid, lus, sid in got}
    assert rows == {1: (500, 1, 1), 2: (501, 1, 1), 3: (102, 7, 1)}
    # v2 table: honest raise
    meta["format-version"] = 2
    with open(os.path.join(root, "metadata", "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with pytest.raises(Exception, match="format-version 3"):
        _drain(spark, root, str(tmp_path / "ck2"),
               startingSnapshotCount=0, rowLineage="true")
    meta["format-version"] = 3
    with open(os.path.join(root, "metadata", "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    # changelog + lineage cannot combine
    with pytest.raises(Exception, match="cannot combine"):
        _drain(spark, root, str(tmp_path / "ck3"),
               startingSnapshotCount=0, rowLineage="true",
               changelog="true")


def test_changelog_stream_replays_nested_equality(spark, tmp_path):
    """changelog=true replays equality deletes keyed on NESTED struct
    fields: the worker-side matcher digs the dotted path through the
    row's struct dicts, so struck rows emit as delete rows while
    untouched rows stay silent."""
    import pyspark.sql.functions as F

    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        append_equality_deletes,
    )

    root = str(tmp_path / "neqs")
    t = SnapshotTable.create(
        spark, root, "k bigint, p struct<seg:string,c:bigint>"
    )
    t.append(
        spark.createDataFrame(
            [(1, ("a", 10)), (2, ("b", 20)), (3, ("a", 30))],
            "k bigint, p struct<seg:string,c:bigint>",
        )
    )
    assert export_iceberg(t) == 1
    append_equality_deletes(root, [{"p.seg": "a"}], ["p.seg"])
    register_iceberg_stream(spark)
    got = _drain(
        spark, root, str(tmp_path / "ck"),
        startingSnapshotCount=0, changelog="true",
    )
    rows = sorted((k, p["seg"], ct) for k, p, ct, _sid in got)
    assert rows == [
        (1, "a", "delete"), (1, "a", "insert"),
        (2, "b", "insert"),
        (3, "a", "delete"), (3, "a", "insert"),
    ]


def test_changelog_stream_skips_replace_snapshots(spark, tmp_path):
    """A rewrite (replace snapshot) mid-stream swaps every data file
    without changing content: the changelog stream must emit NOTHING
    for it — and the next real change must diff against the
    POST-rewrite layout."""
    import pyspark.sql.functions as F

    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        append_equality_deletes,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg_rewrite import (
        rewrite_iceberg_data_files,
    )

    register_iceberg_stream(spark)
    root = str(tmp_path / "clogrw")
    t = SnapshotTable.create(
        spark, root, "k bigint, v double", bucket_key=["k"], num_buckets=2
    )
    for lo in (0, 5):
        t.append(spark.range(lo, lo + 5).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")))
        export_iceberg(t)
    ckpt = str(tmp_path / "ck")
    got = _drain(spark, root, ckpt, startingSnapshotCount=0,
                 changelog="true")
    assert len(got) == 10
    # bin-pack everything into one file: a replace snapshot
    sid = rewrite_iceberg_data_files(spark, root, target_file_rows=10**6)
    assert sid is not None
    got2 = _drain(spark, root, ckpt, startingSnapshotCount=0,
                  changelog="true")
    assert got2 == []
    # the next REAL change diffs against the post-rewrite layout:
    # exactly the struck rows, stamped with the delete snapshot
    eq_sid = append_equality_deletes(root, [{"k": 3}, {"k": 7}], ["k"])
    got3 = _drain(spark, root, ckpt, startingSnapshotCount=0,
                  changelog="true")
    assert sorted(got3) == [(3, 3.0, "delete", eq_sid),
                            (7, 7.0, "delete", eq_sid)]
    # a fresh full drain agrees end to end (no phantom churn anywhere)
    full = _drain(spark, root, str(tmp_path / "ck2"),
                  startingSnapshotCount=0, changelog="true")
    ins = {(k, v) for k, v, c, s_ in full if c == "insert"}
    dels = {(k, v) for k, v, c, s_ in full if c == "delete"}
    assert ins == {(k, float(k)) for k in range(10)}
    assert dels == {(3, 3.0), (7, 7.0)}
