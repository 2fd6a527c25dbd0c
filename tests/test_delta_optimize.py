"""Log-level OPTIMIZE for real Delta tables
(sources/delta_optimize.py): bin-packing, Z-ORDER, DV purge, CDF
invisibility, and row-tracking identity preservation."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import (
    _replay_log,
    export_delta_log,
    read_delta,
    read_delta_changes,
)
from predicting_hospital_readmission_using_mimic_database_spark.sources.delta_optimize import (
    optimize_delta,
)
from predicting_hospital_readmission_using_mimic_database_spark.sources.dv import (
    write_dv_file,
)
from predicting_hospital_readmission_using_mimic_database_spark.sources.table import (
    SnapshotTable,
)


def _commit(root: str, v: int, actions: list) -> None:
    log = os.path.join(root, "_delta_log")
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"{v:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def _schema_string(fields):
    return json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": n, "type": t, "nullable": True, "metadata": {}}
                for n, t in fields
            ],
        }
    )


def _meta(fields, configuration=None, partition_cols=()):
    return {
        "metaData": {
            "id": "t",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _schema_string(fields),
            "partitionColumns": list(partition_cols),
            "configuration": dict(configuration or {}),
        }
    }


def _exported(spark, tmp_path, rows=20000, buckets=8):
    df = spark.range(0, rows).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("a"),
        (F.col("id") * 7 % 89).alias("b"),
    )
    t = SnapshotTable.create(
        spark,
        str(tmp_path / "t"),
        "k bigint, a bigint, b bigint",
        bucket_key=["k"],
        num_buckets=buckets,
    )
    t.append(df)
    export_delta_log(t)
    return t.root, df


def test_binpack_combines_small_files(spark, tmp_path):
    root, df = _exported(spark, tmp_path)
    before = read_delta(spark, root)
    n_before = len(before.inputFiles())
    assert n_before > 1
    v = optimize_delta(spark, root, target_file_rows=10**6)
    assert v == 1
    after = read_delta(spark, root)
    assert len(after.inputFiles()) == 1
    # row set unchanged
    assert after.exceptAll(before).count() == 0
    assert before.exceptAll(after).count() == 0
    # the re-layout is INVISIBLE to CDF (dataChange=false both sides)
    assert read_delta_changes(spark, root, starting_version=v).count() == 0
    # time travel below the OPTIMIZE still serves the old layout
    assert len(read_delta(spark, root, version=0).inputFiles()) == n_before
    # replacement adds carry refreshed skippable stats
    stats: dict = {}
    _replay_log(root, stats_out=stats)
    st = json.loads(next(iter(stats.values())))
    assert st["numRecords"] == 20000
    assert st["minValues"]["k"] == 0 and st["maxValues"]["k"] == 19999


def test_binpack_noop_when_already_packed(spark, tmp_path):
    root, _ = _exported(spark, tmp_path)
    assert optimize_delta(spark, root, target_file_rows=10**6) == 1
    # nothing small remains and no DVs: a second pass commits nothing
    assert optimize_delta(spark, root, target_file_rows=10**6) is None
    # files already at/above the bar are not candidates
    assert optimize_delta(spark, root, target_file_rows=1) is None


def test_zorder_layout_prunes_both_dims(spark, tmp_path):
    root, df = _exported(spark, tmp_path)
    v = optimize_delta(
        spark, root, zorder_by=["a", "b"], target_file_rows=2500
    )
    assert v == 1
    got = read_delta(spark, root)
    n_files = len(got.inputFiles())
    assert n_files >= 6  # 20k rows / 2.5k target
    # point-range predicate on BOTH dims prunes most files
    pruned = read_delta(
        spark, root, predicates=[("a", "<", 10), ("b", "<", 10)]
    )
    assert len(pruned.inputFiles()) < n_files / 2
    # skipping is conservative: filtered content is exact
    exp = df.filter((F.col("a") < 10) & (F.col("b") < 10))
    act = pruned.filter((F.col("a") < 10) & (F.col("b") < 10))
    assert act.exceptAll(exp).count() == 0
    assert exp.exceptAll(act).count() == 0
    # a lone vector-free file at/below the target does not re-churn
    assert optimize_delta(
        spark, root, zorder_by=["a", "b"], target_file_rows=10**6
    ) == 2  # first re-cluster combines the 8 z-files into 1...
    assert optimize_delta(
        spark, root, zorder_by=["a", "b"], target_file_rows=10**6
    ) is None  # ...then it is a fixed point


def test_zorder_validation(spark, tmp_path):
    root, _ = _exported(spark, tmp_path)
    with pytest.raises(ValueError, match="unknown column"):
        optimize_delta(spark, root, zorder_by=["nope"])
    pq.write_table(
        pa.table({"s": pa.array(["x"], type=pa.string())}),
        str(tmp_path / "s.parquet"),
    )
    sroot = str(tmp_path / "sroot")
    os.makedirs(sroot)
    os.rename(str(tmp_path / "s.parquet"), os.path.join(sroot, "s.parquet"))
    _commit(sroot, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        _meta([("s", "string")]),
        {"add": {"path": "s.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ])
    with pytest.raises(ValueError, match="order-preserving"):
        optimize_delta(spark, sroot, zorder_by=["s"])


def test_partitions_never_combine(spark, tmp_path):
    root = str(tmp_path / "p")
    os.makedirs(root)
    for i, seg in enumerate(("A", "A", "B")):
        pq.write_table(
            pa.table({"k": pa.array([i * 10, i * 10 + 1], type=pa.int64())}),
            os.path.join(root, f"f{i}.parquet"),
        )
    _commit(root, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        _meta([("k", "long"), ("seg", "string")], partition_cols=["seg"]),
    ] + [
        {"add": {"path": f"f{i}.parquet", "partitionValues": {"seg": seg},
                 "size": 1, "modificationTime": 0, "dataChange": True,
                 "stats": json.dumps({"numRecords": 2})}}
        for i, seg in enumerate(("A", "A", "B"))
    ])
    v = optimize_delta(spark, root, target_file_rows=10**6)
    assert v == 1
    _, live, _, _ = _replay_log(root)
    # A's two files combined; B's lone file untouched
    assert sorted(live.values(), key=str) == [
        {"seg": "A"}, {"seg": "B"}]
    assert "f2.parquet" in live
    got = read_delta(spark, root)
    assert got.count() == 6
    assert {r["seg"] for r in got.collect()} == {"A", "B"}
    # partition filter still prunes on the new layout
    assert len(read_delta(spark, root, partitions={"seg": "B"})
               .inputFiles()) == 1


def test_partition_scoped_optimize(spark, tmp_path):
    """OPTIMIZE WHERE: `partitions=` touches only matching groups."""
    root = str(tmp_path / "pw")
    os.makedirs(root)
    for i, seg in enumerate(("A", "A", "B", "B")):
        pq.write_table(
            pa.table({"k": pa.array([i * 10, i * 10 + 1], type=pa.int64())}),
            os.path.join(root, f"f{i}.parquet"),
        )
    _commit(root, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        _meta([("k", "long"), ("seg", "string")], partition_cols=["seg"]),
    ] + [
        {"add": {"path": f"f{i}.parquet", "partitionValues": {"seg": seg},
                 "size": 1, "modificationTime": 0, "dataChange": True,
                 "stats": json.dumps({"numRecords": 2})}}
        for i, seg in enumerate(("A", "A", "B", "B"))
    ])
    v = optimize_delta(
        spark, root, target_file_rows=10**6, partitions={"seg": "A"}
    )
    assert v == 1
    _, live, _, _ = _replay_log(root)
    # A combined into one file; B's two files untouched
    assert "f2.parquet" in live and "f3.parquet" in live
    assert len(live) == 3
    assert read_delta(spark, root).count() == 8
    # unknown partition column raises
    with pytest.raises(ValueError, match="non-partition"):
        optimize_delta(spark, root, partitions={"nope": 1})
    # the out-of-scope group is still optimizable later
    v2 = optimize_delta(
        spark, root, target_file_rows=10**6, partitions={"seg": ["B"]}
    )
    assert v2 == 2
    _, live2, _, _ = _replay_log(root)
    assert len(live2) == 2


def test_dv_purge(spark, tmp_path):
    root = str(tmp_path / "dv")
    os.makedirs(root)
    pq.write_table(
        pa.table({"k": pa.array(range(100), type=pa.int64())}),
        os.path.join(root, "a.parquet"),
    )
    desc = write_dv_file(os.path.join(root, "dv1.bin"), [0, 5, 7])
    _commit(root, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        _meta([("k", "long")]),
        {"add": {"path": "a.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "deletionVector": desc,
                 "stats": json.dumps({"numRecords": 100})}},
    ])
    assert read_delta(spark, root).count() == 97
    # a SINGLE file with a vector still qualifies: purge is the point
    v = optimize_delta(spark, root, target_file_rows=10**6)
    assert v == 1
    _, live, dvs, _ = _replay_log(root)
    assert not dvs
    got = read_delta(spark, root)
    assert got.count() == 97
    ks = {r["k"] for r in got.collect()}
    assert ks.isdisjoint({0, 5, 7})
    # refreshed numRecords reflects the purge
    stats: dict = {}
    _replay_log(root, stats_out=stats)
    assert json.loads(next(iter(stats.values())))["numRecords"] == 97


def test_row_tracking_identity_preserved(spark, tmp_path):
    root = str(tmp_path / "rt")
    os.makedirs(root)
    for name, lo in (("a", 0), ("b", 100)):
        pq.write_table(
            pa.table({"k": pa.array(range(lo, lo + 100), type=pa.int64()),
                      "bal": pa.array([i * 2 for i in range(100)],
                                      type=pa.int64())}),
            os.path.join(root, f"{name}.parquet"),
        )
    _commit(root, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 7,
                      "writerFeatures": ["rowTracking"]}},
        _meta([("k", "long"), ("bal", "long"), ("seg", "string")],
              configuration={"delta.enableRowTracking": "true"},
              partition_cols=["seg"]),
        {"add": {"path": "a.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "baseRowId": 1000, "defaultRowCommitVersion": 0,
                 "stats": json.dumps({"numRecords": 100})}},
        {"add": {"path": "b.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "baseRowId": 2000, "defaultRowCommitVersion": 0,
                 "stats": json.dumps({"numRecords": 100})}},
    ])
    before = {
        r["k"]: (r["_row_id"], r["_row_commit_version"])
        for r in read_delta(spark, root, row_tracking=True).collect()
    }
    v = optimize_delta(spark, root, target_file_rows=10**6)
    assert v == 1
    # one combined file, every row keeping its pre-rewrite identity
    assert len(read_delta(spark, root).inputFiles()) == 1
    after = {
        r["k"]: (r["_row_id"], r["_row_commit_version"])
        for r in read_delta(spark, root, row_tracking=True).collect()
    }
    assert after == before
    # the commit DECLARED the materialized lineage columns it wrote
    meta, live, _, _ = _replay_log(root)
    conf = meta["configuration"]
    assert conf["delta.rowTracking.materializedRowIdColumnName"]
    assert conf["delta.rowTracking.materializedRowCommitVersionColumnName"]
    # and stamped the replacement file past the occupied id range
    rowids: dict = {}
    _replay_log(root, rowids_out=rowids)
    (base, ver), = rowids.values()
    assert base >= 2100 and ver == v


def _cm_fld(name, typ, phys, cid):
    return {
        "name": name, "type": typ, "nullable": True,
        "metadata": {
            "delta.columnMapping.id": cid,
            "delta.columnMapping.physicalName": phys,
        },
    }


def test_column_mapping_name_mode_optimize(spark, tmp_path):
    """OPTIMIZE on a name-mapped table: replacement files keep the
    physical col-<uuid> names end-to-end, stats stay physically keyed,
    and the logical read is unchanged."""
    root = str(tmp_path / "cmname")
    os.makedirs(root)
    for i, ks in enumerate(([1, 2], [3, 4])):
        pq.write_table(
            pa.table({"col-aaa": pa.array(ks, type=pa.int64()),
                      "col-bbb": pa.array([k * 10 for k in ks],
                                          type=pa.int64())}),
            os.path.join(root, f"f{i}.parquet"),
        )
    schema_string = json.dumps({
        "type": "struct",
        "fields": [_cm_fld("id", "long", "col-aaa", 1),
                   _cm_fld("bal", "long", "col-bbb", 2)],
    })
    _commit(root, 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": "t", "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_string, "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "name"},
        }},
    ] + [
        {"add": {"path": f"f{i}.parquet", "partitionValues": {},
                 "size": 1, "modificationTime": 0, "dataChange": True,
                 "stats": json.dumps({"numRecords": 2})}}
        for i in (0, 1)
    ])
    before = {(r["id"], r["bal"])
              for r in read_delta(spark, root).collect()}
    v = optimize_delta(spark, root, target_file_rows=10**6)
    assert v == 1
    assert len(read_delta(spark, root).inputFiles()) == 1
    after = {(r["id"], r["bal"])
             for r in read_delta(spark, root).collect()}
    assert after == before == {(1, 10), (2, 20), (3, 30), (4, 40)}
    # stats keyed by PHYSICAL name, usable by logical predicates
    stats: dict = {}
    _replay_log(root, stats_out=stats)
    st = json.loads(next(iter(stats.values())))
    assert st["minValues"]["col-aaa"] == 1
    assert st["maxValues"]["col-bbb"] == 40
    assert len(read_delta(spark, root, predicates=[("id", ">", 100)])
               .inputFiles()) == 0


def test_column_mapping_id_mode_optimize(spark, tmp_path):
    """OPTIMIZE on an id-mapped table whose files carry DIFFERENT
    physical names for the same field ids: the replacement file's
    parquet FIELD IDS keep id-resolution working."""
    root = str(tmp_path / "cmid")
    os.makedirs(root)

    def pfile(path, names, ks):
        sch = pa.schema([
            pa.field(n, pa.int64(),
                     metadata={b"PARQUET:field_id": str(fid).encode()})
            for n, fid in zip(names, (1, 2))
        ])
        pq.write_table(
            pa.table({names[0]: pa.array(ks, type=pa.int64()),
                      names[1]: pa.array([k * 10 for k in ks],
                                         type=pa.int64())}, schema=sch),
            os.path.join(root, path),
        )

    pfile("old.parquet", ["col-aa", "col-bb"], [1, 2])
    pfile("new.parquet", ["col-cc", "col-dd"], [3, 4])
    schema_string = json.dumps({
        "type": "struct",
        "fields": [_cm_fld("id", "long", "col-zz1", 1),
                   _cm_fld("bal", "long", "col-zz2", 2)],
    })
    _commit(root, 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": "t", "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_string, "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "id"},
        }},
        {"add": {"path": "old.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "stats": json.dumps({"numRecords": 2})}},
        {"add": {"path": "new.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "stats": json.dumps({"numRecords": 2})}},
    ])
    before = {(r["id"], r["bal"])
              for r in read_delta(spark, root).collect()}
    v = optimize_delta(spark, root, target_file_rows=10**6)
    assert v == 1
    assert len(read_delta(spark, root).inputFiles()) == 1
    after = {(r["id"], r["bal"])
             for r in read_delta(spark, root).collect()}
    assert after == before == {(1, 10), (2, 20), (3, 30), (4, 40)}
    # the replacement file carries the field ids (id-mode contract)
    rel = next(iter(_replay_log(root)[1]))
    sch = pq.ParquetFile(os.path.join(root, rel)).schema_arrow
    got_ids = {f.metadata.get(b"PARQUET:field_id") for f in sch}
    assert got_ids == {b"1", b"2"}
    # stats keyed by the DECLARED physical names
    stats: dict = {}
    _replay_log(root, stats_out=stats)
    st = json.loads(next(iter(stats.values())))
    assert st["minValues"]["col-zz1"] == 1 and st["maxValues"]["col-zz2"] == 40


def test_vacuum_delta(spark, tmp_path):
    """VACUUM: removed files past the retention horizon GC (with their
    no-longer-referenced DV files); live / recently-removed / re-added
    files survive; zero-copy export roots refuse."""
    import time

    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import (
        DeltaProtocolError,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta_optimize import (
        vacuum_delta,
    )

    root = str(tmp_path / "vac")
    os.makedirs(root)

    def pfile(name, ks):
        pq.write_table(
            pa.table({"k": pa.array(ks, type=pa.int64())}),
            os.path.join(root, name),
        )

    pfile("a.parquet", [1, 2])
    pfile("b.parquet", [3, 4])
    now = int(time.time() * 1000)
    _commit(root, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        _meta([("k", "long")]),
    ] + [
        {"add": {"path": p, "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "stats": json.dumps({"numRecords": 2})}}
        for p in ("a.parquet", "b.parquet")
    ])
    # v1 strikes a row of a via a DV; v2 rewrites a (removing the DV)
    desc = write_dv_file(os.path.join(root, "dv1.bin"), [0])
    _commit(root, 1, [
        {"add": {"path": "a.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "deletionVector": desc,
                 "stats": json.dumps({"numRecords": 2})}},
    ])
    pfile("c.parquet", [2])
    _commit(root, 2, [
        {"remove": {"path": "a.parquet", "dataChange": True,
                    "deletionTimestamp": now - 10_000,
                    "deletionVector": desc}},
        {"add": {"path": "c.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "stats": json.dumps({"numRecords": 1})}},
    ])
    assert read_delta(spark, root).count() == 3
    # inside retention: nothing moves
    assert vacuum_delta(root, retention_hours=1.0) == []
    # dry run lists the removed file + its orphaned DV, deletes nothing
    listed = vacuum_delta(root, retention_hours=0.0, dry_run=True)
    assert listed == ["a.parquet", "dv1.bin"]
    assert os.path.exists(os.path.join(root, "a.parquet"))
    gone = vacuum_delta(root, retention_hours=0.0)
    assert gone == ["a.parquet", "dv1.bin"]
    assert not os.path.exists(os.path.join(root, "a.parquet"))
    assert not os.path.exists(os.path.join(root, "dv1.bin"))
    # the live snapshot is untouched
    assert read_delta(spark, root).count() == 3
    # re-run: nothing left
    assert vacuum_delta(root, retention_hours=0.0) == []
    # a zero-copy export root refuses (the host's files share it)
    os.makedirs(os.path.join(root, "_log"))
    with pytest.raises(DeltaProtocolError, match="zero-copy"):
        vacuum_delta(root)


def test_vacuum_protects_optimize_window(spark, tmp_path):
    """OPTIMIZE stamps wall-clock deletionTimestamps, so the files it
    retires stay time-travelable within the retention window and GC
    after it."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta_optimize import (
        vacuum_delta,
    )

    root = str(tmp_path / "ov")
    os.makedirs(root)
    for i in (0, 1):
        pq.write_table(
            pa.table({"k": pa.array([i * 10, i * 10 + 1], type=pa.int64())}),
            os.path.join(root, f"f{i}.parquet"),
        )
    _commit(root, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        _meta([("k", "long")]),
    ] + [
        {"add": {"path": f"f{i}.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "stats": json.dumps({"numRecords": 2})}}
        for i in (0, 1)
    ])
    v = optimize_delta(spark, root, target_file_rows=10**6)
    assert v == 1
    # within retention the pre-optimize layout stays time-travelable
    assert vacuum_delta(root, retention_hours=1.0) == []
    assert read_delta(spark, root, version=0).count() == 4
    # past the horizon the retired files GC
    gone = vacuum_delta(root, retention_hours=0.0)
    assert sorted(gone) == ["f0.parquet", "f1.parquet"]
    assert read_delta(spark, root).count() == 4


def test_liquid_clustering_declaration_drives_optimize(spark, tmp_path):
    """set_delta_clustering_columns declares the spec's
    delta.clustering domain; a PLAIN optimize_delta then re-clusters
    along it (the reference's OPTIMIZE-on-a-clustered-table), and the
    declaration round-trips the foreign shape."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta_optimize import (
        clustering_columns,
        set_delta_clustering_columns,
    )

    root, df = _exported(spark, tmp_path)
    assert clustering_columns(root) == []
    with pytest.raises(ValueError, match="unknown column"):
        set_delta_clustering_columns(root, ["nope"])
    v = set_delta_clustering_columns(root, ["a", "b"])
    assert v == 1
    assert clustering_columns(root) == ["a", "b"]
    # plain OPTIMIZE now z-orders by the declared columns
    v2 = optimize_delta(spark, root, target_file_rows=2500)
    assert v2 == 2
    got = read_delta(spark, root)
    n_files = len(got.inputFiles())
    assert n_files >= 6
    pruned = read_delta(
        spark, root, predicates=[("a", "<", 10), ("b", "<", 10)]
    )
    assert len(pruned.inputFiles()) < n_files / 2
    # content identical + CDF-invisible
    assert got.exceptAll(df).count() == 0
    assert df.exceptAll(got).count() == 0
    assert read_delta_changes(spark, root, starting_version=v2).count() == 0
    # clearing the declaration restores plain bin-packing
    set_delta_clustering_columns(root, [])
    assert clustering_columns(root) == []
    v3 = optimize_delta(spark, root, target_file_rows=10**6)
    assert v3 is not None
    assert len(read_delta(spark, root).inputFiles()) == 1
    # the FOREIGN shape reads too: nested paths gate honestly
    _commit(root, v3 + 1, [
        {"domainMetadata": {"domain": "delta.clustering",
                            "configuration": json.dumps(
                                {"clusteringColumns": [["a", "x"]]}),
                            "removed": False}},
    ])
    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import (
        DeltaProtocolError,
    )

    with pytest.raises(DeltaProtocolError, match="nested"):
        clustering_columns(root)


def test_optimize_checkpoint_preserves_feature_state(spark, tmp_path):
    """OPTIMIZE's checkpoint carries row-tracking stamps, DV
    descriptors, stats, and the DECLARED protocol — so a replay that
    starts from it (truncate_delta_log) loses nothing."""
    import glob

    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import (
        truncate_delta_log,
    )

    root = str(tmp_path / "ckrt")
    os.makedirs(root)
    for name, lo, base in (("a", 0, 1000), ("b", 100, 2000),
                           ("a2", 200, 3000)):
        pq.write_table(
            pa.table({"k": pa.array(range(lo, lo + 100), type=pa.int64()),
                      "bal": pa.array([i * 2 for i in range(100)],
                                      type=pa.int64())}),
            os.path.join(root, f"{name}.parquet"),
        )
    desc = write_dv_file(os.path.join(root, "dv1.bin"), [0, 5])
    _commit(root, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors",
                                         "rowTracking"]}},
        _meta([("k", "long"), ("bal", "long"), ("seg", "string")],
              configuration={"delta.enableRowTracking": "true"},
              partition_cols=["seg"]),
        {"add": {"path": "a.parquet", "partitionValues": {"seg": "A"},
                 "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "baseRowId": 1000, "defaultRowCommitVersion": 0,
                 "stats": json.dumps({"numRecords": 100})}},
        {"add": {"path": "b.parquet", "partitionValues": {"seg": "B"},
                 "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "baseRowId": 2000, "defaultRowCommitVersion": 0,
                 "deletionVector": desc,
                 "stats": json.dumps({"numRecords": 100})}},
        {"add": {"path": "a2.parquet", "partitionValues": {"seg": "A"},
                 "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "baseRowId": 3000, "defaultRowCommitVersion": 0,
                 "stats": json.dumps({"numRecords": 100})}},
    ])
    before = {
        r["k"]: (r["_row_id"], r["_row_commit_version"])
        for r in read_delta(spark, root, row_tracking=True).collect()
    }
    assert len(before) == 298  # 2 rows struck by the DV
    # optimize ONLY partition A (leave b's DV live so the checkpoint
    # must carry a descriptor); a lone small file still rewrites when
    # its partition is explicitly scoped? no — pair it with a split
    v = optimize_delta(
        spark, root, target_file_rows=10**6, checkpoint_interval=1,
        partitions={"seg": "A"},
    )
    assert v == 1
    cp = glob.glob(os.path.join(root, "_delta_log", "*.checkpoint.parquet"))
    assert len(cp) == 1
    # truncate everything below the checkpoint: replay now STARTS there
    deleted = truncate_delta_log(root, keep_versions=1)
    assert deleted == [0]
    # protocol, DV, stamps, and stats all survive the checkpoint replay
    after = {
        r["k"]: (r["_row_id"], r["_row_commit_version"])
        for r in read_delta(spark, root, row_tracking=True).collect()
    }
    assert after == before
    _, live, dvs, _ = _replay_log(root)
    assert len(dvs) == 1  # b's vector still applies
    assert read_delta(spark, root).count() == 298


def test_vacuum_shared_dv_container_protected(spark, tmp_path):
    """One DV container shared by two removed files: it survives while
    ANY sharer is inside the retention window (deleting it would break
    the time travel the horizon promises), and collects only when every
    sharer — including ones already vacuumed off disk — is past it."""
    import time

    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta_optimize import (
        vacuum_delta,
    )

    root = str(tmp_path / "sdv")
    os.makedirs(root)
    for name in ("a", "b", "live"):
        pq.write_table(
            pa.table({"k": pa.array([1, 2], type=pa.int64())}),
            os.path.join(root, f"{name}.parquet"),
        )
    desc = write_dv_file(os.path.join(root, "shared.bin"), [0])
    now = int(time.time() * 1000)
    _commit(root, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        _meta([("k", "long")]),
        {"add": {"path": "live.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "stats": json.dumps({"numRecords": 2})}},
    ] + [
        {"add": {"path": f"{n}.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "deletionVector": desc,
                 "stats": json.dumps({"numRecords": 2})}}
        for n in ("a", "b")
    ])
    # a removed 2h ago, b removed just now — both referencing shared.bin
    _commit(root, 1, [
        {"remove": {"path": "a.parquet", "dataChange": True,
                    "deletionTimestamp": now - 7_200_000,
                    "deletionVector": desc}},
    ])
    _commit(root, 2, [
        {"remove": {"path": "b.parquet", "dataChange": True,
                    "deletionTimestamp": now,
                    "deletionVector": desc}},
    ])
    # 1h retention: a collects, but b still pins the shared container
    gone = vacuum_delta(root, retention_hours=1.0)
    assert gone == ["a.parquet"]
    assert os.path.exists(os.path.join(root, "shared.bin"))
    # b still inside the window itself
    assert os.path.exists(os.path.join(root, "b.parquet"))
    # horizon at now: every sharer (a already off disk) is collectable
    gone2 = vacuum_delta(root, retention_hours=0.0)
    assert gone2 == ["b.parquet", "shared.bin"]
    assert not os.path.exists(os.path.join(root, "shared.bin"))
    assert read_delta(spark, root).count() == 2  # live.parquet untouched


def test_checkpoint_carries_clustering_domain(spark, tmp_path):
    """The liquid-clustering declaration (delta.clustering
    domainMetadata) survives a checkpoint + log truncation: a later
    PLAIN optimize still re-clusters instead of bin-packing, per the
    spec's requirement that checkpoints carry live domainMetadata."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import (
        truncate_delta_log,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta_optimize import (
        _declared_protocol,
        clustering_columns,
        set_delta_clustering_columns,
    )

    root, df = _exported(spark, tmp_path)
    assert set_delta_clustering_columns(root, ["a", "b"]) == 1
    v = optimize_delta(spark, root, target_file_rows=10**6,
                       checkpoint_interval=1)
    assert v == 2
    deleted = truncate_delta_log(root, keep_versions=1)
    assert deleted == [0, 1]  # the declaring commit is GONE
    # ...yet the declaration survives via the checkpoint's domain rows
    assert clustering_columns(root) == ["a", "b"]
    # and a plain OPTIMIZE still re-clusters along it
    v2 = optimize_delta(spark, root, target_file_rows=2500)
    assert v2 == 3
    got = read_delta(spark, root)
    n_files = len(got.inputFiles())
    assert n_files >= 6
    pruned = read_delta(
        spark, root, predicates=[("a", "<", 10), ("b", "<", 10)]
    )
    assert len(pruned.inputFiles()) < n_files / 2
    assert got.exceptAll(df).count() == 0
    assert df.exceptAll(got).count() == 0
    # the export's declared protocol also survived v0's deletion
    proto = _declared_protocol(os.path.join(root, "_delta_log"))
    assert proto["minWriterVersion"] == 7
    assert "inCommitTimestamp" in proto["writerFeatures"]


def test_export_checkpoint_declares_protocol(spark, tmp_path):
    """export_delta_log's periodic checkpoint carries the log's real
    protocol (minWriterVersion 7 + inCommitTimestamp/changeDataFeed),
    not the legacy {1,2} default — so truncating v0 away cannot let a
    foreign writer replay a weaker obligation set."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import (
        truncate_delta_log,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta_optimize import (
        _declared_protocol,
    )

    df = spark.range(0, 200).select(F.col("id").alias("k"))
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), "k bigint",
        bucket_key=["k"], num_buckets=2,
    )
    t.append(df)
    assert export_delta_log(t, checkpoint_interval=1) == 0
    t.append(df.select((F.col("k") + 1000).alias("k")))
    assert export_delta_log(t, checkpoint_interval=1) == 1
    deleted = truncate_delta_log(t.root, keep_versions=1)
    assert deleted == [0]
    proto = _declared_protocol(os.path.join(t.root, "_delta_log"))
    assert proto["minWriterVersion"] == 7
    assert set(proto["writerFeatures"]) == {"inCommitTimestamp",
                                            "changeDataFeed"}
    assert read_delta(spark, t.root).count() == 400


def test_rowid_watermark_monotonic(spark, tmp_path):
    """optimize_delta never DECREASES the delta.rowTracking high
    watermark: removed files may have occupied higher id ranges than
    any live file, and the domain records every id ever issued —
    replacement stamps allocate PAST it, and the emitted watermark is
    the max. The domain also survives a checkpoint + truncation."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import (
        truncate_delta_log,
    )

    root = str(tmp_path / "wm")
    os.makedirs(root)
    for name, lo in (("a", 0), ("b", 100)):
        pq.write_table(
            pa.table({"k": pa.array(range(lo, lo + 100), type=pa.int64())}),
            os.path.join(root, f"{name}.parquet"),
        )
    _commit(root, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 7,
                      "writerFeatures": ["rowTracking", "domainMetadata"]}},
        _meta([("k", "long")],
              configuration={"delta.enableRowTracking": "true"}),
        # removed history (not replayed here) issued ids up to 4999
        {"domainMetadata": {"domain": "delta.rowTracking",
                            "configuration": json.dumps(
                                {"rowIdHighWaterMark": 4999}),
                            "removed": False}},
        {"add": {"path": "a.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "baseRowId": 1000, "defaultRowCommitVersion": 0,
                 "stats": json.dumps({"numRecords": 100})}},
        {"add": {"path": "b.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "baseRowId": 2000, "defaultRowCommitVersion": 0,
                 "stats": json.dumps({"numRecords": 100})}},
    ])
    before = {
        r["k"]: (r["_row_id"], r["_row_commit_version"])
        for r in read_delta(spark, root, row_tracking=True).collect()
    }
    v = optimize_delta(spark, root, target_file_rows=10**6,
                       checkpoint_interval=1)
    assert v == 1
    rowids: dict = {}
    domains: dict = {}
    _replay_log(root, rowids_out=rowids, domains_out=domains)
    (base, _ver), = rowids.values()
    assert base == 5000  # past the DECLARED watermark, not just live files
    wm = json.loads(domains["delta.rowTracking"])["rowIdHighWaterMark"]
    assert wm == 5199  # 5000 + 200 rewritten rows - 1; never below 4999
    # identity preserved through the rewrite
    after = {
        r["k"]: (r["_row_id"], r["_row_commit_version"])
        for r in read_delta(spark, root, row_tracking=True).collect()
    }
    assert after == before
    # the domain survives a checkpoint-rooted replay
    assert truncate_delta_log(root, keep_versions=1) == [0]
    domains2: dict = {}
    _replay_log(root, domains_out=domains2)
    assert json.loads(domains2["delta.rowTracking"])[
        "rowIdHighWaterMark"] == 5199


def test_v2_checkpoint_written_and_survives_truncation(spark, tmp_path):
    """The V2 MANIFEST + SIDECAR checkpoint (written above the action
    threshold) carries everything the classic one does — stats,
    row-tracking stamps, DV descriptors, domainMetadata, and a
    protocol UPGRADED to declare v2Checkpoint — and a truncated log
    replays from it with full feature state."""
    import glob

    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import (
        _declared_protocol,
        truncate_delta_log,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta_optimize import (
        set_delta_clustering_columns,
    )

    root = str(tmp_path / "v2rt")
    os.makedirs(root)
    for name, lo in (("a", 0), ("b", 100), ("a2", 200)):
        pq.write_table(
            pa.table({"k": pa.array(range(lo, lo + 100), type=pa.int64()),
                      "bal": pa.array([i * 2 for i in range(100)],
                                      type=pa.int64())}),
            os.path.join(root, f"{name}.parquet"),
        )
    desc = write_dv_file(os.path.join(root, "dv1.bin"), [0, 5])
    _commit(root, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors",
                                         "rowTracking"]}},
        _meta([("k", "long"), ("bal", "long"), ("seg", "string")],
              configuration={"delta.enableRowTracking": "true"},
              partition_cols=["seg"]),
        {"add": {"path": "a.parquet", "partitionValues": {"seg": "A"},
                 "size": 1, "modificationTime": 0, "dataChange": True,
                 "baseRowId": 1000, "defaultRowCommitVersion": 0,
                 "stats": json.dumps({"numRecords": 100})}},
        {"add": {"path": "b.parquet", "partitionValues": {"seg": "B"},
                 "size": 1, "modificationTime": 0, "dataChange": True,
                 "baseRowId": 2000, "defaultRowCommitVersion": 0,
                 "deletionVector": desc,
                 "stats": json.dumps({"numRecords": 100})}},
        {"add": {"path": "a2.parquet", "partitionValues": {"seg": "A"},
                 "size": 1, "modificationTime": 0, "dataChange": True,
                 "baseRowId": 3000, "defaultRowCommitVersion": 0,
                 "stats": json.dumps({"numRecords": 100})}},
    ])
    set_delta_clustering_columns(root, ["k"])
    before = {
        r["k"]: (r["_row_id"], r["_row_commit_version"])
        for r in read_delta(spark, root, row_tracking=True).collect()
    }
    assert len(before) == 298
    v = optimize_delta(
        spark, root, target_file_rows=10**6, checkpoint_interval=1,
        checkpoint_v2_threshold=1, partitions={"seg": "A"},
    )
    assert v == 2
    log_dir = os.path.join(root, "_delta_log")
    # V2 layout on disk: a uuid manifest + sidecars, NO classic file
    assert not glob.glob(os.path.join(log_dir, "*.checkpoint.parquet"))
    manifests = [
        n for n in os.listdir(log_dir)
        if ".checkpoint." in n and n.endswith(".parquet")
    ]
    assert len(manifests) == 1
    assert glob.glob(os.path.join(log_dir, "_sidecars", "*.parquet"))
    # the manifest's protocol declares the v2Checkpoint obligation
    proto = _declared_protocol(log_dir)  # JSON v0 still present: from log
    deleted = truncate_delta_log(root, keep_versions=1)
    assert deleted == [0, 1]
    proto2 = _declared_protocol(log_dir)  # now only the V2 manifest has it
    assert proto2["minReaderVersion"] == 3
    assert "v2Checkpoint" in proto2["readerFeatures"]
    assert "deletionVectors" in proto2["readerFeatures"]
    assert "rowTracking" in proto2["writerFeatures"]
    assert proto["readerFeatures"] == ["deletionVectors"]  # pre-truncate
    # full feature state replays from the V2 checkpoint alone
    after = {
        r["k"]: (r["_row_id"], r["_row_commit_version"])
        for r in read_delta(spark, root, row_tracking=True).collect()
    }
    assert after == before
    _, live, dvs, _ = _replay_log(root)
    assert len(dvs) == 1  # b's vector still applies
    # ...including domainMetadata (the clustering declaration)
    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta_optimize import (
        clustering_columns,
    )

    assert clustering_columns(root) == ["k"]
    assert read_delta(spark, root).count() == 298


def test_v2_checkpoint_export_path_and_sidecar_sharding(spark, tmp_path):
    """export_delta_log writes V2 above the threshold; sidecars shard
    at sidecar_rows; replay + truncation stay exact through them."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import (
        _write_checkpoint_file,
        truncate_delta_log,
    )

    df = spark.range(0, 200).select(F.col("id").alias("k"))
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), "k bigint",
        bucket_key=["k"], num_buckets=4,
    )
    t.append(df)
    assert export_delta_log(t, checkpoint_interval=1,
                            checkpoint_v2_threshold=1) == 0
    t.append(df.select((F.col("k") + 1000).alias("k")))
    assert export_delta_log(t, checkpoint_interval=1,
                            checkpoint_v2_threshold=1) == 1
    log_dir = os.path.join(t.root, "_delta_log")
    assert truncate_delta_log(t.root, keep_versions=1) == [0]
    assert read_delta(spark, t.root).count() == 400
    # sharding: force tiny sidecars and count them
    meta, live, _dvs, last = _replay_log(t.root)
    adds = [
        {"path": rel, "partitionValues": {}, "size": 1,
         "modificationTime": 0}
        for rel in sorted(live)
    ]
    _write_checkpoint_file(
        log_dir, last, meta, adds, v2_threshold=1, sidecar_rows=3,
    )
    import glob
    import math

    # newest checkpoint wins the replay; state unchanged
    assert read_delta(spark, t.root).count() == 400
    n_sc = len(glob.glob(os.path.join(log_dir, "_sidecars", "*.parquet")))
    assert n_sc >= math.ceil(len(adds) / 3)


def test_concurrent_exporters_rebase(spark, tmp_path):
    """Two exporters interleaving on one _delta_log: the commit is
    put-if-absent on the version file, so the LOSER detects the foreign
    commit and rebases (re-replays + re-diffs) instead of clobbering.
    When the winner was a second exporter of the SAME table, the rebase
    converges to a no-op; a foreign DATA commit survives at its version
    (never clobbered) and the final log replays exact."""
    import json as _json

    import predicting_hospital_readmission_using_mimic_database_spark.sources.delta as D

    df = spark.range(0, 100).select(F.col("id").alias("k"))
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), "k bigint",
        bucket_key=["k"], num_buckets=2,
    )
    t.append(df)
    assert export_delta_log(t) == 0
    root = t.root
    log_dir = os.path.join(root, "_delta_log")

    t.append(df.select((F.col("k") + 1000).alias("k")))
    # exporter B (a second handle on the same table) wins version 1
    # exactly when exporter A is about to publish it
    t2 = SnapshotTable(spark, root)
    orig = D._publish_commit
    state = {"raced": False}

    def racing(log_dir_, version, actions):
        if not state["raced"]:
            state["raced"] = True
            D._publish_commit = orig
            assert D.export_delta_log(t2) == 1  # B commits first
            D._publish_commit = racing
        return orig(log_dir_, version, actions)

    D._publish_commit = racing
    try:
        v = D.export_delta_log(t)
    finally:
        D._publish_commit = orig
    # A lost version 1, rebased, found B had published the same diff,
    # and converged to B's version instead of double-committing
    assert v == 1
    assert not os.path.exists(os.path.join(log_dir, f"{2:020d}.json"))
    got = {r["k"] for r in read_delta(spark, root).collect()}
    assert got == set(range(100)) | {k + 1000 for k in range(100)}

    # optimize loses its version to a DISJOINT foreign append landing
    # mid-flight: it rebases to the next version, the foreign rows
    # survive, and nothing is clobbered
    pq.write_table(
        pa.table({"k": pa.array([9003], type=pa.int64())}),
        os.path.join(root, "foreign2.parquet"),
    )
    state2 = {"raced": False}

    def racing2(log_dir_, version, actions):
        if not state2["raced"]:
            state2["raced"] = True
            with open(os.path.join(log_dir, f"{version:020d}.json"),
                      "w") as f:
                f.write(_json.dumps({"commitInfo": {
                    "operation": "WRITE", "engineInfo": "foreign",
                    "inCommitTimestamp": 99999999999999}}) + "\n")
                f.write(_json.dumps({"add": {
                    "path": "foreign2.parquet", "partitionValues": {},
                    "size": 1, "modificationTime": 0, "dataChange": True,
                    "stats": _json.dumps({"numRecords": 1})}}) + "\n")
        return orig(log_dir_, version, actions)

    D._publish_commit = racing2
    try:
        v2 = optimize_delta(spark, root, target_file_rows=10**6)
    finally:
        D._publish_commit = orig
    assert v2 == 3  # wanted 2, rebased to 3
    got2 = {r["k"] for r in read_delta(spark, root).collect()}
    assert got2 == got | {9003}


def test_optimize_conflicting_foreign_remove_raises(spark, tmp_path):
    """A foreign commit that REMOVED one of the optimize plan's input
    files invalidates the plan: the loser raises instead of
    resurrecting deleted rows."""
    import json as _json

    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import (
        DeltaProtocolError,
    )

    root = str(tmp_path / "c")
    os.makedirs(root)
    for i in (0, 1):
        pq.write_table(
            pa.table({"k": pa.array([i * 10, i * 10 + 1], type=pa.int64())}),
            os.path.join(root, f"f{i}.parquet"),
        )
    _commit(root, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        _meta([("k", "long")]),
    ] + [
        {"add": {"path": f"f{i}.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "stats": _json.dumps({"numRecords": 2})}}
        for i in (0, 1)
    ])
    import predicting_hospital_readmission_using_mimic_database_spark.sources.delta as D

    orig = D._publish_commit
    state = {"n": 0}

    def racing_publish(log_dir, version, actions):
        if state["n"] == 0:
            state["n"] = 1
            # foreign DELETE of f0 sneaks in and wins the version
            _commit(root, version, [
                {"remove": {"path": "f0.parquet", "dataChange": True,
                            "deletionTimestamp": 1}},
            ])
        return orig(log_dir, version, actions)

    D._publish_commit = racing_publish
    try:
        with pytest.raises(DeltaProtocolError, match="conflicting writer"):
            optimize_delta(spark, root, target_file_rows=10**6)
    finally:
        D._publish_commit = orig


def test_restore_delta_dv_and_vacuum_gates(spark, tmp_path):
    """restore_delta edge rules: a file live at both versions but with
    a DIFFERENT deletion vector re-adds (the DV is logical content), a
    vacuumed-away target raises instead of committing dead refs, and
    row-tracking stamps restore with their files."""
    import time

    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import (
        DeltaProtocolError,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta_optimize import (
        restore_delta,
        vacuum_delta,
    )

    root = str(tmp_path / "rst")
    os.makedirs(root)
    for name, lo in (("a", 0), ("b", 100)):
        pq.write_table(
            pa.table({"k": pa.array(range(lo, lo + 10), type=pa.int64())}),
            os.path.join(root, f"{name}.parquet"),
        )
    desc = write_dv_file(os.path.join(root, "dv1.bin"), [0, 1])
    _commit(root, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors",
                                         "rowTracking"]}},
        _meta([("k", "long")],
              configuration={"delta.enableRowTracking": "true"}),
        {"add": {"path": "a.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "baseRowId": 100, "defaultRowCommitVersion": 0,
                 "stats": json.dumps({"numRecords": 10})}},
        {"add": {"path": "b.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "baseRowId": 200, "defaultRowCommitVersion": 0,
                 "stats": json.dumps({"numRecords": 10})}},
    ])
    # v1 strikes two rows of a via a DV (same file path, new content)
    _commit(root, 1, [
        {"add": {"path": "a.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "baseRowId": 100, "defaultRowCommitVersion": 0,
                 "deletionVector": desc,
                 "stats": json.dumps({"numRecords": 10})}},
    ])
    assert read_delta(spark, root).count() == 18
    # restore to v0: a.parquet re-adds WITHOUT the vector
    v = restore_delta(root, 0)
    assert v == 2
    assert read_delta(spark, root).count() == 20
    _, _, dvs, _ = _replay_log(root)
    assert not dvs
    # row-tracking stamps restored with the file
    rowids: dict = {}
    _replay_log(root, rowids_out=rowids)
    assert rowids["a.parquet"] == (100, 0)
    # restore BACK to v1 re-instates the vector
    v2 = restore_delta(root, 1)
    assert v2 == 3
    assert read_delta(spark, root).count() == 18
    # a no-op restore raises
    with pytest.raises(ValueError, match="no-op"):
        restore_delta(root, 1)
    # vacuumed-away target: retire b.parquet at v4, vacuum it, then
    # try restoring to a version that needs it
    _commit(root, 4, [
        {"remove": {"path": "b.parquet", "dataChange": True,
                    "deletionTimestamp": int(time.time() * 1000) - 10}},
    ])
    assert vacuum_delta(root, retention_hours=0.0) == ["b.parquet"]
    with pytest.raises(DeltaProtocolError, match="vacuumed"):
        restore_delta(root, 1)


def test_declared_protocol_prefers_newest_checkpoint(tmp_path):
    """_declared_protocol picks the checkpoint with the HIGHEST version
    across both layouts: a table that upgraded its protocol and then
    crossed the V2 threshold (stale classic checkpoint at v1 still on
    disk, V2 manifest at v2 carrying the upgraded declaration) must
    report the V2 protocol once the JSON commits are truncated — and
    symmetrically, a newer classic checkpoint beats an older V2."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import (
        _declared_protocol,
        _export_meta,
        _write_checkpoint_file,
    )

    log_dir = str(tmp_path / "_delta_log")
    os.makedirs(log_dir)
    meta = _export_meta(
        '{"type":"struct","fields":[{"name":"k","type":"long",'
        '"nullable":true,"metadata":{}}]}'
    )["metaData"]
    old = {"minReaderVersion": 1, "minWriterVersion": 2}
    new = {
        "minReaderVersion": 3, "minWriterVersion": 7,
        "readerFeatures": ["v2Checkpoint"],
        "writerFeatures": ["v2Checkpoint", "typeWidening"],
    }
    # classic at v1 (stale protocol), V2 manifest at v2 (upgraded)
    _write_checkpoint_file(log_dir, 1, meta, [], protocol=old)
    _write_checkpoint_file(log_dir, 2, meta, [], protocol=new,
                           v2_threshold=0)
    got = _declared_protocol(log_dir)
    assert got["minWriterVersion"] == 7
    assert "typeWidening" in got["writerFeatures"]

    # reverse: classic checkpoint newer than the V2 manifest wins
    newest = {"minReaderVersion": 2, "minWriterVersion": 5}
    _write_checkpoint_file(log_dir, 3, meta, [], protocol=newest)
    assert _declared_protocol(log_dir) == newest
