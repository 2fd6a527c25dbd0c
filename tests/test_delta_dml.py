"""delete_from_delta / merge_delta (sources/delta_dml.py): row-level
DML via deletion vectors + CDF emission. Pins the round-13 VERDICT's
"Done =" shapes: snapshot excludes exactly the predicate rows,
time travel before the delete is intact, a second delete on the same
file MERGES DVs, survivors are never re-validated against CHECK
constraints, and a merge racing an append rebases (disjoint) or
raises (overlap / metadata) per the commit rules."""

import glob
import json
import os
import shutil

import pytest
import pyspark.sql.functions as F

from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import (
    DeltaProtocolError,
    read_delta,
    read_delta_changes,
)
from predicting_hospital_readmission_using_mimic_database_spark.sources.delta_dml import (
    delete_from_delta,
    merge_delta,
)


def _mk_table(spark, tmp_path, n=100, files=2, configuration=None,
              protocol=None, name="t"):
    """Plain two-file Delta table k bigint, v double with k in
    [0, n)."""
    root = str(tmp_path / name)
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )
    rels = []
    per = (n + files - 1) // files
    for i in range(files):
        part = df.filter(
            (F.col("k") >= i * per) & (F.col("k") < (i + 1) * per)
        )
        stage = os.path.join(root, f".s{i}")
        part.coalesce(1).write.parquet(stage)
        p = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        rel = f"f{i}.parquet"
        shutil.move(p, os.path.join(root, rel))
        shutil.rmtree(stage)
        rels.append(rel)
    with open(os.path.join(log, f"{0:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": protocol or {
            "minReaderVersion": 1, "minWriterVersion": 2}}) + "\n")
        f.write(json.dumps({"metaData": {
            "id": name, "format": {"provider": "parquet", "options": {}},
            "schemaString": df.schema.json(), "partitionColumns": [],
            "configuration": configuration or {}}}) + "\n")
        for rel in rels:
            f.write(json.dumps({"add": {
                "path": rel, "partitionValues": {}, "size": 1,
                "modificationTime": 0, "dataChange": True}}) + "\n")
    return root, rels


def _keys(spark, root, version=None):
    return {r["k"] for r in read_delta(spark, root, version).collect()}


def test_delete_dv_snapshot_and_time_travel(spark, tmp_path):
    root, rels = _mk_table(spark, tmp_path)
    mtimes = {rel: os.path.getmtime(os.path.join(root, rel))
              for rel in rels}
    out = delete_from_delta(spark, root, "k % 10 = 3")
    assert out == {"version": 1, "num_deleted": 10,
                   "files_with_dvs": 2, "files_removed": 0}
    assert _keys(spark, root) == {k for k in range(100) if k % 10 != 3}
    # the data files were NOT rewritten — only sidecars landed
    for rel in rels:
        assert os.path.getmtime(os.path.join(root, rel)) == mtimes[rel]
    assert [n for n in os.listdir(root)
            if n.startswith("deletion_vector_")]
    # time travel before the delete serves the full table
    assert _keys(spark, root, version=0) == set(range(100))
    # the commit upgraded the protocol + property in the SAME version
    with open(os.path.join(root, "_delta_log",
                           f"{1:020d}.json")) as f:
        acts = [json.loads(line) for line in f if line.strip()]
    protos = [a["protocol"] for a in acts if "protocol" in a]
    assert protos and "deletionVectors" in protos[0]["readerFeatures"]
    assert "deletionVectors" in protos[0]["writerFeatures"]
    metas = [a["metaData"] for a in acts if "metaData" in a]
    assert metas[0]["configuration"]["delta.enableDeletionVectors"] \
        == "true"


def test_second_delete_merges_dvs(spark, tmp_path):
    root, _rels = _mk_table(spark, tmp_path)
    delete_from_delta(spark, root, "k % 10 = 3")
    out2 = delete_from_delta(spark, root, "k % 10 = 7")
    assert out2["num_deleted"] == 10
    assert _keys(spark, root) == {
        k for k in range(100) if k % 10 not in (3, 7)
    }
    # the merged descriptor's cardinality covers BOTH deletes
    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import _replay_log

    _m, _live, dvs, _last = _replay_log(root)
    assert sum(d["cardinality"] for d in dvs.values()) == 20
    # an overlapping predicate never double-counts already-dead rows
    out3 = delete_from_delta(spark, root, "k % 5 = 3")  # 3,8 mod 10
    assert out3["num_deleted"] == 10  # the k%10==3 half was dead
    assert _keys(spark, root) == {
        k for k in range(100) if k % 10 not in (3, 7, 8)
    }
    # intermediate snapshots stay intact
    assert _keys(spark, root, version=1) == {
        k for k in range(100) if k % 10 != 3
    }


def test_delete_full_file_removed_outright(spark, tmp_path):
    root, _rels = _mk_table(spark, tmp_path)
    out = delete_from_delta(spark, root, "k >= 50")
    assert out["files_removed"] == 1 and out["files_with_dvs"] == 0
    assert out["num_deleted"] == 50
    assert _keys(spark, root) == set(range(50))
    # no sidecar survives for a fully-dead file
    assert not [n for n in os.listdir(root)
                if n.startswith("deletion_vector_")]


def test_delete_noop_commits_nothing(spark, tmp_path):
    root, _rels = _mk_table(spark, tmp_path)
    out = delete_from_delta(spark, root, "k = 12345")
    assert out["version"] == 0 and out["num_deleted"] == 0
    assert not os.path.exists(
        os.path.join(root, "_delta_log", f"{1:020d}.json")
    )


def test_delete_does_not_revalidate_survivors(spark, tmp_path):
    """Survivor rows violating a CHECK constraint (a foreign writer's
    sin) must NOT block a DELETE of other rows — deletes impose no
    re-validation scan."""
    root, _rels = _mk_table(
        spark, tmp_path,
        configuration={"delta.constraints.small_k": "k < 10"},
        protocol={"minReaderVersion": 1, "minWriterVersion": 7,
                  "writerFeatures": ["checkConstraints"]},
    )
    # almost every existing row violates k < 10; delete only k = 5
    out = delete_from_delta(spark, root, "k = 5")
    assert out["num_deleted"] == 1
    assert _keys(spark, root) == set(range(100)) - {5}


def test_delete_append_only_refuses(spark, tmp_path):
    root, _rels = _mk_table(
        spark, tmp_path, configuration={"delta.appendOnly": "true"},
    )
    with pytest.raises(DeltaProtocolError, match="appendOnly"):
        delete_from_delta(spark, root, "k = 1")
    assert _keys(spark, root) == set(range(100))


def test_delete_unknown_writer_feature_refuses(spark, tmp_path):
    root, _rels = _mk_table(
        spark, tmp_path,
        protocol={"minReaderVersion": 1, "minWriterVersion": 7,
                  "writerFeatures": ["icebergCompatV2"]},
    )
    with pytest.raises(DeltaProtocolError, match="icebergCompatV2"):
        delete_from_delta(spark, root, "k = 1")


def test_delete_emits_cdf_when_enabled(spark, tmp_path):
    root, _rels = _mk_table(
        spark, tmp_path,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    out = delete_from_delta(spark, root, "k < 3")
    cdf = read_delta_changes(spark, root, out["version"], out["version"])
    got = {(r["k"], r["v"], r["_change_type"]) for r in cdf.collect()}
    assert got == {(0, 0.0, "delete"), (1, 2.0, "delete"),
                   (2, 4.0, "delete")}


def test_merge_upsert_values_and_cdf(spark, tmp_path):
    root, _rels = _mk_table(
        spark, tmp_path,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    src = spark.createDataFrame(
        [(10, -1.0), (55, -2.0), (200, 9.0)], "k bigint, v double"
    )
    out = merge_delta(spark, root, src, on=["k"])
    assert out["num_updated"] == 2 and out["num_inserted"] == 1
    got = {(r["k"], r["v"]) for r in read_delta(spark, root).collect()}
    exp = {(k, k * 2.0) for k in range(100) if k not in (10, 55)} | {
        (10, -1.0), (55, -2.0), (200, 9.0)}
    assert got == exp
    assert _keys(spark, root, version=0) == set(range(100))
    cdf = read_delta_changes(spark, root, out["version"], out["version"])
    rows = {(r["k"], r["v"], r["_change_type"]) for r in cdf.collect()}
    assert rows == {
        (10, 20.0, "update_preimage"), (10, -1.0, "update_postimage"),
        (55, 110.0, "update_preimage"), (55, -2.0, "update_postimage"),
        (200, 9.0, "insert"),
    }
    # matched-delete flavor, insert dropped
    out2 = merge_delta(
        spark, root,
        spark.createDataFrame([(200, 0.0), (999, 0.0)],
                              "k bigint, v double"),
        on=["k"], when_matched="delete", insert=False,
    )
    assert out2["num_deleted"] == 1 and out2["num_inserted"] == 0
    assert 200 not in _keys(spark, root) and 999 not in _keys(spark, root)
    cdf2 = read_delta_changes(spark, root, out2["version"],
                              out2["version"])
    assert [(r["k"], r["_change_type"]) for r in cdf2.collect()] == [
        (200, "delete")]


def test_merge_duplicate_source_keys_refuse(spark, tmp_path):
    root, _rels = _mk_table(spark, tmp_path)
    src = spark.createDataFrame(
        [(1, 1.0), (1, 2.0)], "k bigint, v double"
    )
    with pytest.raises(DeltaProtocolError, match="duplicate key"):
        merge_delta(spark, root, src, on=["k"])


def test_merge_validates_constraints_on_landing_rows(spark, tmp_path):
    root, _rels = _mk_table(
        spark, tmp_path, n=5,
        configuration={"delta.constraints.pos_v": "v >= 0"},
        protocol={"minReaderVersion": 1, "minWriterVersion": 7,
                  "writerFeatures": ["checkConstraints"]},
    )
    bad = spark.createDataFrame([(1, -5.0)], "k bigint, v double")
    with pytest.raises(DeltaProtocolError, match="pos_v"):
        merge_delta(spark, root, bad, on=["k"])
    # nothing committed, no stray files
    assert _keys(spark, root) == set(range(5))
    assert not [n for n in os.listdir(root)
                if n.startswith(("merge-", "deletion_vector_"))]


def test_merge_race_disjoint_append_rebases(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from predicting_hospital_readmission_using_mimic_database_spark.sources import delta_dml as DML

    root, _rels = _mk_table(spark, tmp_path)
    log_dir = os.path.join(root, "_delta_log")
    pq.write_table(
        pa.table({"k": pa.array([7777], type=pa.int64()),
                  "v": pa.array([1.5])}),
        os.path.join(root, "foreign.parquet"),
    )
    orig = DML._publish_commit
    state = {"raced": False}

    def racing(log_dir_, version, actions):
        if not state["raced"]:
            state["raced"] = True
            with open(os.path.join(log_dir,
                                   f"{version:020d}.json"), "w") as f:
                f.write(json.dumps({"commitInfo": {
                    "operation": "WRITE",
                    "engineInfo": "foreign"}}) + "\n")
                f.write(json.dumps({"add": {
                    "path": "foreign.parquet", "partitionValues": {},
                    "size": 1, "modificationTime": 0,
                    "dataChange": True}}) + "\n")
        return orig(log_dir_, version, actions)

    src = spark.createDataFrame([(3, -3.0)], "k bigint, v double")
    # a DV commit also upgrades protocol (exclusive) — pre-declare the
    # feature so the raced merge itself is a pure data commit
    delete_from_delta(spark, root, "k = 99")
    DML._publish_commit = racing
    try:
        out = merge_delta(spark, root, src, on=["k"])
    finally:
        DML._publish_commit = orig
    # the foreign append took one version; the merge landed after it
    got = {(r["k"], r["v"]) for r in read_delta(spark, root).collect()}
    assert (7777, 1.5) in got and (3, -3.0) in got
    assert (99, 198.0) not in got


def test_merge_race_overlapping_file_raises(spark, tmp_path):
    from predicting_hospital_readmission_using_mimic_database_spark.sources import delta_dml as DML

    root, rels = _mk_table(spark, tmp_path)
    delete_from_delta(spark, root, "k = 99")  # declare the feature
    log_dir = os.path.join(root, "_delta_log")
    orig = DML._publish_commit
    state = {"raced": False}

    def racing(log_dir_, version, actions):
        if not state["raced"]:
            state["raced"] = True
            with open(os.path.join(log_dir,
                                   f"{version:020d}.json"), "w") as f:
                f.write(json.dumps({"commitInfo": {
                    "operation": "DELETE",
                    "engineInfo": "foreign"}}) + "\n")
                f.write(json.dumps({"remove": {
                    "path": rels[0], "deletionTimestamp": 0,
                    "dataChange": True,
                    "partitionValues": {}}}) + "\n")
        return orig(log_dir_, version, actions)

    src = spark.createDataFrame([(3, -3.0)], "k bigint, v double")
    DML._publish_commit = racing
    try:
        with pytest.raises(DeltaProtocolError, match="concurrent commit"):
            merge_delta(spark, root, src, on=["k"])
    finally:
        DML._publish_commit = orig
    # loser leaked nothing: no unreferenced merge files / sidecars
    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import _replay_log

    _m, live, dvs, _last = _replay_log(root)
    on_disk = {n for n in os.listdir(root)
               if n.startswith(("merge-", "deletion_vector_"))}
    referenced = {d["pathOrInlineDv"] for d in dvs.values()}
    referenced |= {rel for rel in live}
    assert on_disk <= referenced


def test_merge_into_empty_table_inserts(spark, tmp_path):
    root = str(tmp_path / "empty")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    schema_json = (
        '{"type":"struct","fields":['
        '{"name":"k","type":"long","nullable":true,"metadata":{}},'
        '{"name":"v","type":"double","nullable":true,"metadata":{}}]}'
    )
    with open(os.path.join(log, f"{0:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 2}}) + "\n")
        f.write(json.dumps({"metaData": {
            "id": "e", "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_json, "partitionColumns": [],
            "configuration": {}}}) + "\n")
    src = spark.createDataFrame([(1, 1.0), (2, 2.0)],
                                "k bigint, v double")
    out = merge_delta(spark, root, src, on=["k"])
    assert out["num_inserted"] == 2 and out["files_with_dvs"] == 0
    assert _keys(spark, root) == {1, 2}


def test_delete_then_checkpoint_then_read(spark, tmp_path):
    """A checkpoint written AFTER the delete must carry the DV
    descriptors (the reader replays from it)."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import truncate_delta_log
    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta_optimize import (
        _write_optimize_checkpoint,
    )

    root, _rels = _mk_table(spark, tmp_path)
    out = delete_from_delta(spark, root, "k % 10 = 3")
    log_dir = os.path.join(root, "_delta_log")
    _write_optimize_checkpoint(root, log_dir, out["version"])
    removed = truncate_delta_log(root, keep_versions=1)
    assert removed  # version 0 gone; state now served by checkpoint
    assert _keys(spark, root) == {k for k in range(100) if k % 10 != 3}


def _mk_partitioned(spark, tmp_path, configuration=None):
    """Partitioned table: seg in {A,B} partition column, k/v data."""
    root = str(tmp_path / "pt")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    df = spark.range(40).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"),
        F.when(F.col("id") % 2 == 0, "A").otherwise("B").alias("seg"),
    )
    rels = []
    for segv in ("A", "B"):
        part = df.filter(F.col("seg") == segv).drop("seg")
        stage = os.path.join(root, f".s{segv}")
        part.coalesce(1).write.parquet(stage)
        p = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        rel = f"seg={segv}/f0.parquet"
        os.makedirs(os.path.join(root, f"seg={segv}"), exist_ok=True)
        shutil.move(p, os.path.join(root, rel))
        shutil.rmtree(stage)
        rels.append((rel, segv))
    schema_json = json.dumps({"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "v", "type": "double", "nullable": True,
         "metadata": {}},
        {"name": "seg", "type": "string", "nullable": True,
         "metadata": {}},
    ]})
    with open(os.path.join(log, f"{0:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 2}}) + "\n")
        f.write(json.dumps({"metaData": {
            "id": "pt", "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_json,
            "partitionColumns": ["seg"],
            "configuration": configuration or {}}}) + "\n")
        for rel, segv in rels:
            f.write(json.dumps({"add": {
                "path": rel, "partitionValues": {"seg": segv},
                "size": 1, "modificationTime": 0,
                "dataChange": True}}) + "\n")
    return root


def test_merge_partitioned_table(spark, tmp_path):
    """MERGE on a partitioned table: new files land under partition
    dirs with partitionValues recorded, so read_delta serves the
    partition column (not NULL) and partition pruning keeps the
    merged rows."""
    root = _mk_partitioned(
        spark, tmp_path,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    src = spark.createDataFrame(
        [(2, -1.0, "A"), (100, 9.0, "B")],
        "k bigint, v double, seg string",
    )
    out = merge_delta(spark, root, src, on=["k"])
    assert out["num_updated"] == 1 and out["num_inserted"] == 1
    got = {(r["k"], r["v"], r["seg"])
           for r in read_delta(spark, root).collect()}
    assert (2, -1.0, "A") in got and (100, 9.0, "B") in got
    assert not any(seg is None for _k, _v, seg in got)
    # partition pruning keeps the merged rows
    only_b = {(r["k"], r["v"]) for r in read_delta(
        spark, root, partitions={"seg": "B"}).collect()}
    assert (100, 9.0) in only_b
    assert all(k % 2 == 1 or k == 100 for k, _v in only_b)
    # the change feed carries partition columns too
    cdf = read_delta_changes(spark, root, out["version"], out["version"])
    rows = {(r["k"], r["seg"], r["_change_type"]) for r in cdf.collect()}
    assert rows == {
        (2, "A", "update_preimage"), (2, "A", "update_postimage"),
        (100, "B", "insert"),
    }


def test_delete_partitioned_cdf_has_partition_values(spark, tmp_path):
    root = _mk_partitioned(
        spark, tmp_path,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    out = delete_from_delta(spark, root, "k < 4")
    cdf = read_delta_changes(spark, root, out["version"], out["version"])
    rows = {(r["k"], r["seg"], r["_change_type"]) for r in cdf.collect()}
    assert rows == {(0, "A", "delete"), (1, "B", "delete"),
                    (2, "A", "delete"), (3, "B", "delete")}
    # snapshot excludes exactly those rows, partition column intact
    got = {(r["k"], r["seg"]) for r in read_delta(spark, root).collect()}
    assert got == {(k, "A" if k % 2 == 0 else "B")
                   for k in range(4, 40)}


def test_merge_column_mapped_cdf(spark, tmp_path):
    """CDF files on a column-mapped table must use PHYSICAL names —
    read_delta_changes reads them with the physical schema."""
    root = str(tmp_path / "cm")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    df = spark.range(10).select(
        F.col("id").alias("col-k"), (F.col("id") * 1.0).alias("col-v")
    )
    stage = os.path.join(root, ".s")
    df.coalesce(1).write.parquet(stage)
    p = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    shutil.move(p, os.path.join(root, "f0.parquet"))
    shutil.rmtree(stage)
    schema_json = json.dumps({"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {
            "delta.columnMapping.physicalName": "col-k",
            "delta.columnMapping.id": 1}},
        {"name": "v", "type": "double", "nullable": True, "metadata": {
            "delta.columnMapping.physicalName": "col-v",
            "delta.columnMapping.id": 2}},
    ]})
    with open(os.path.join(log, f"{0:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 2, "minWriterVersion": 5}}) + "\n")
        f.write(json.dumps({"metaData": {
            "id": "cm", "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_json, "partitionColumns": [],
            "configuration": {
                "delta.columnMapping.mode": "name",
                "delta.enableChangeDataFeed": "true",
            }}}) + "\n")
        f.write(json.dumps({"add": {
            "path": "f0.parquet", "partitionValues": {}, "size": 1,
            "modificationTime": 0, "dataChange": True}}) + "\n")

    src = spark.createDataFrame([(3, -3.0), (50, 5.0)],
                                "k bigint, v double")
    out = merge_delta(spark, root, src, on=["k"])
    got = {(r["k"], r["v"]) for r in read_delta(spark, root).collect()}
    assert (3, -3.0) in got and (50, 5.0) in got
    cdf = read_delta_changes(spark, root, out["version"], out["version"])
    rows = {(r["k"], r["v"], r["_change_type"]) for r in cdf.collect()}
    assert rows == {
        (3, 3.0, "update_preimage"), (3, -3.0, "update_postimage"),
        (50, 5.0, "insert"),
    }
    # the protocol upgrade enumerated the legacy reader feature
    with open(os.path.join(log, f"{out['version']:020d}.json")) as f:
        acts = [json.loads(line) for line in f if line.strip()]
    protos = [a["protocol"] for a in acts if "protocol" in a]
    assert protos, "DV commit on a reader-2 table must upgrade"
    assert "columnMapping" in protos[0]["readerFeatures"]
    assert "deletionVectors" in protos[0]["readerFeatures"]
    # delete on the same mapped table keeps working (mapped scan + DV)
    out2 = delete_from_delta(spark, root, "k = 50")
    got2 = {r["k"] for r in read_delta(spark, root).collect()}
    assert 50 not in got2 and 3 in got2


def test_merge_no_change_commits_nothing(spark, tmp_path):
    """A merge that changes nothing must NOT land a junk version: the
    zero-row staged part is pruned BEFORE the no-op check (same rule
    as delete's 'matches nothing commits NOTHING')."""
    root, _rels = _mk_table(spark, tmp_path)
    src = spark.createDataFrame([(500, 1.0)], "k bigint, v double")
    # no match + insert=False
    out = merge_delta(spark, root, src, on=["k"], insert=False)
    assert out["version"] == 0
    assert all(out[k] == 0 for k in out if k != "version")
    # empty source
    out2 = merge_delta(spark, root, src.limit(0), on=["k"])
    assert out2["version"] == 0
    log = os.path.join(root, "_delta_log")
    assert sorted(os.listdir(log)) == [f"{0:020d}.json"]
    # no orphan staged data or cdc files either
    assert not glob.glob(os.path.join(root, "merge-*.parquet"))
    assert not glob.glob(os.path.join(root, "_change_data", "*"))


def test_table_features_protocol_implies_no_legacy(spark, tmp_path):
    """A table ALREADY at (3, 7) has its obligations enumerated —
    the DV upgrade must not bolt on spurious legacy-implied features
    (columnMapping on a table that never mapped would make conforming
    foreign readers refuse it)."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta_constraints import (
        _legacy_writer_features,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta_dml import (
        _legacy_reader_features,
    )

    assert _legacy_reader_features(1) == set()
    assert _legacy_reader_features(2) == {"columnMapping"}
    assert _legacy_reader_features(3) == set()
    assert "columnMapping" in _legacy_writer_features(5)
    assert _legacy_writer_features(7) == set()

    root, _rels = _mk_table(spark, tmp_path, protocol={
        "minReaderVersion": 3, "minWriterVersion": 7,
        "readerFeatures": ["v2Checkpoint"],
        "writerFeatures": ["v2Checkpoint", "invariants"],
    })
    out = delete_from_delta(spark, root, "k < 3")
    assert out["num_deleted"] == 3
    with open(os.path.join(
            root, "_delta_log", f"{out['version']:020d}.json")) as f:
        acts = [json.loads(line) for line in f if line.strip()]
    protos = [a["protocol"] for a in acts if "protocol" in a]
    assert protos, "DV commit on a DV-less table must upgrade"
    assert protos[0]["readerFeatures"] == [
        "deletionVectors", "v2Checkpoint"]
    assert protos[0]["writerFeatures"] == [
        "deletionVectors", "invariants", "v2Checkpoint"]
    assert {k for k in range(100) if k >= 3} == _keys(spark, root)


def test_merge_id_mapped_files_carry_field_ids(spark, tmp_path):
    """id-mode column mapping resolves by parquet FIELD ID: the files
    a MERGE/DELETE lands (data + _change_data) must physically carry
    the ids, or the table's own id-resolving readers refuse them."""
    import pyarrow.parquet as pq

    root = str(tmp_path / "idm")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    # the fixture file carries ids, like any real id-mode writer's
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    df = spark.range(10).select(
        F.col("id").alias("col-1", metadata={"parquet.field.id": 1}),
        (F.col("id") * 1.0).alias(
            "col-2", metadata={"parquet.field.id": 2}),
    )
    stage = os.path.join(root, ".s")
    df.coalesce(1).write.parquet(stage)
    p = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    shutil.move(p, os.path.join(root, "f0.parquet"))
    shutil.rmtree(stage)
    schema_json = json.dumps({"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {
            "delta.columnMapping.physicalName": "col-1",
            "delta.columnMapping.id": 1}},
        {"name": "v", "type": "double", "nullable": True, "metadata": {
            "delta.columnMapping.physicalName": "col-2",
            "delta.columnMapping.id": 2}},
    ]})
    with open(os.path.join(log, f"{0:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 2, "minWriterVersion": 5}}) + "\n")
        f.write(json.dumps({"metaData": {
            "id": "idm",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_json, "partitionColumns": [],
            "configuration": {
                "delta.columnMapping.mode": "id",
                "delta.enableChangeDataFeed": "true",
            }}}) + "\n")
        f.write(json.dumps({"add": {
            "path": "f0.parquet", "partitionValues": {}, "size": 1,
            "modificationTime": 0, "dataChange": True}}) + "\n")

    src = spark.createDataFrame([(3, -3.0), (50, 5.0)],
                                "k bigint, v double")
    out = merge_delta(spark, root, src, on=["k"])
    got = {(r["k"], r["v"]) for r in read_delta(spark, root).collect()}
    assert (3, -3.0) in got and (50, 5.0) in got and (0, 0.0) in got
    # the new data files PHYSICALLY carry the ids
    merged = glob.glob(os.path.join(root, "merge-*.parquet"))
    assert merged
    for path in merged:
        sch = str(pq.ParquetFile(path).schema)
        assert "field_id=1" in sch and "field_id=2" in sch
    # ...and the change feed reads back through id resolution
    cdf = read_delta_changes(spark, root, out["version"], out["version"])
    rows = {(r["k"], r["v"], r["_change_type"]) for r in cdf.collect()}
    assert rows == {
        (3, 3.0, "update_preimage"), (3, -3.0, "update_postimage"),
        (50, 5.0, "insert"),
    }
    # DELETE on the id-mapped table: DV applied, CDC readable
    out2 = delete_from_delta(spark, root, "k = 50")
    assert out2["num_deleted"] == 1
    assert 50 not in {r["k"] for r in read_delta(spark, root).collect()}
    cdf2 = read_delta_changes(
        spark, root, out2["version"], out2["version"])
    assert {(r["k"], r["_change_type"]) for r in cdf2.collect()} == {
        (50, "delete")}


# ---------------------------------------------------------------- UPDATE


def test_update_pre_row_semantics_and_dv(spark, tmp_path):
    """UPDATE: SET expressions all evaluate against the PRE-update row
    (a = b, b = a swaps); rows die via DVs (no file rewrite) and the
    updated values land as new files."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta_dml import update_delta

    root, rels = _mk_table(spark, tmp_path)
    mtimes = {rel: os.path.getmtime(os.path.join(root, rel))
              for rel in rels}
    out = update_delta(
        spark, root, "k = 7",
        {"k": "CAST(v AS BIGINT)", "v": "CAST(k AS DOUBLE)"},
    )
    assert out["num_updated"] == 1 and out["files_with_dvs"] == 1
    got = {(r["k"], r["v"]) for r in read_delta(spark, root).collect()}
    assert (14, 7.0) in got and not any(k == 7 for k, _v in got)
    for rel in rels:
        assert os.path.getmtime(os.path.join(root, rel)) == mtimes[rel]
    # time travel serves the pre-update table
    assert (7, 14.0) in {
        (r["k"], r["v"])
        for r in read_delta(spark, root, version=0).collect()}
    # second update on the same file MERGES the DV
    out2 = update_delta(spark, root, "k < 2", {"v": "v + 0.5"})
    assert out2["num_updated"] == 2
    got2 = {(r["k"], r["v"]) for r in read_delta(spark, root).collect()}
    assert (0, 0.5) in got2 and (1, 2.5) in got2
    # no-op predicate commits nothing
    out3 = update_delta(spark, root, "k < 0", {"v": "v + 1"})
    assert out3 == {"version": out2["version"], "num_updated": 0,
                    "files_with_dvs": 0, "files_removed": 0}


def test_update_cdf_and_partition_move(spark, tmp_path):
    """Updating a PARTITION column moves the row to its new partition
    dir; the CDF carries exact pre/post images."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta_dml import update_delta

    root = _mk_partitioned(
        spark, tmp_path,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    out = update_delta(spark, root, "k = 2", {"seg": "'B'"})
    assert out["num_updated"] == 1
    cdf = read_delta_changes(spark, root, out["version"], out["version"])
    rows = {(r["k"], r["seg"], r["_change_type"]) for r in cdf.collect()}
    assert rows == {(2, "A", "update_preimage"),
                    (2, "B", "update_postimage")}
    only_b = {r["k"] for r in read_delta(
        spark, root, partitions={"seg": "B"}).collect()}
    assert 2 in only_b
    only_a = {r["k"] for r in read_delta(
        spark, root, partitions={"seg": "A"}).collect()}
    assert 2 not in only_a


def test_update_constraints_generated_identity(spark, tmp_path):
    """UPDATE under writer rules: CHECK violations refuse and commit
    nothing; generated columns RECOMPUTE (direct SET refuses);
    identity columns refuse SET."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta_dml import update_delta

    root, _rels = _mk_table(spark, tmp_path, configuration={
        "delta.constraints.vmax": "v < 1000",
    }, protocol={"minReaderVersion": 1, "minWriterVersion": 3})
    with pytest.raises(DeltaProtocolError, match="CHECK constraint"):
        update_delta(spark, root, "k < 5", {"v": "v + 100000"})
    assert sorted(os.listdir(os.path.join(root, "_delta_log"))) == [
        f"{0:020d}.json"]
    # generated column: recomputed on update of its dependency
    root2 = str(tmp_path / "gen")
    log = os.path.join(root2, "_delta_log")
    os.makedirs(log)
    import glob as _glob
    import shutil as _shutil
    df = spark.range(5).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("twice"))
    stage = os.path.join(root2, ".s")
    df.coalesce(1).write.parquet(stage)
    p = _glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    _shutil.move(p, os.path.join(root2, "f0.parquet"))
    _shutil.rmtree(stage)
    schema_json = json.dumps({"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "twice", "type": "long", "nullable": True, "metadata": {
            "delta.generationExpression": "k * 2"}},
    ]})
    with open(os.path.join(log, f"{0:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 4}}) + "\n")
        f.write(json.dumps({"metaData": {
            "id": "gen", "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_json, "partitionColumns": [],
            "configuration": {}}}) + "\n")
        f.write(json.dumps({"add": {
            "path": "f0.parquet", "partitionValues": {}, "size": 1,
            "modificationTime": 0, "dataChange": True}}) + "\n")
    with pytest.raises(DeltaProtocolError, match="GENERATED ALWAYS"):
        update_delta(spark, root2, "k = 1", {"twice": "5"})
    out = update_delta(spark, root2, "k = 1", {"k": "k + 10"})
    assert out["num_updated"] == 1
    got = {(r["k"], r["twice"])
           for r in read_delta(spark, root2).collect()}
    assert (11, 22) in got and not any(k == 1 for k, _t in got)


def test_merge_not_matched_by_source_delete(spark, tmp_path):
    """WHEN NOT MATCHED BY SOURCE THEN DELETE (full sync): after the
    merge the table holds exactly the source's key set — updates
    applied, inserts added, source-less rows dead via DVs; the CDF
    carries their delete images."""
    root, rels = _mk_table(
        spark, tmp_path, n=20,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    mtimes = {rel: os.path.getmtime(os.path.join(root, rel))
              for rel in rels}
    # source: keys 0..9 (5 changed) plus a new key 100
    src = spark.range(10).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 5, F.col("id") * 2.0)
        .otherwise(-1.0).alias("v"),
    ).unionByName(spark.createDataFrame([(100, 9.0)],
                                        "k bigint, v double"))
    out = merge_delta(spark, root, src, on=["k"],
                      not_matched_by_source="delete")
    assert out["num_updated"] == 10 and out["num_inserted"] == 1
    assert out["num_deleted"] == 10  # keys 10..19 died by source
    got = {(r["k"], r["v"]) for r in read_delta(spark, root).collect()}
    assert {k for k, _v in got} == set(range(10)) | {100}
    assert (7, -1.0) in got and (3, 6.0) in got
    for rel in rels:  # no rewrite — DVs only
        assert os.path.getmtime(os.path.join(root, rel)) == mtimes[rel]
    cdf = read_delta_changes(spark, root, out["version"], out["version"])
    dels = {r["k"] for r in cdf.filter(
        F.col("_change_type") == "delete").collect()}
    assert dels == set(range(10, 20))
    # invalid clause value refuses
    with pytest.raises(ValueError, match="not_matched_by_source"):
        merge_delta(spark, root, src, on=["k"],
                    not_matched_by_source="update")


def test_merge_full_sync_idempotent_and_empty_source(spark, tmp_path):
    """Re-running the same full-sync merge is a no-op commit-wise for
    the delete side (all doomed rows already dead); an empty source
    under the clause empties the table."""
    root, _rels = _mk_table(spark, tmp_path, n=10)
    src = spark.range(4).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"),
    )
    out = merge_delta(spark, root, src, on=["k"],
                      not_matched_by_source="delete")
    assert out["num_deleted"] == 6
    assert _keys(spark, root) == {0, 1, 2, 3}
    # re-running the SAME full-sync merge: the delete side is
    # idempotent (all doomed rows already dead -> num_deleted 0);
    # the update side re-applies by ANSI MERGE semantics
    out_re = merge_delta(spark, root, src, on=["k"],
                         not_matched_by_source="delete")
    assert out_re["num_deleted"] == 0 and out_re["num_updated"] == 4
    assert _keys(spark, root) == {0, 1, 2, 3}
    # empty source + full sync: the table empties (files removed
    # outright when every row dies)
    out2 = merge_delta(
        spark, root, src.limit(0), on=["k"],
        not_matched_by_source="delete",
    )
    assert out2["num_deleted"] == 4
    assert _keys(spark, root) == set()


def test_merge_broadcast_byte_gate_regimes(spark, tmp_path):
    """The low-shuffle MERGE's broadcasts are gated on estimated BYTES
    as well as rows (guide §3.1): with a budget too small for the
    survivors' width the semi pre-filter is kept but the broadcast-back
    is dropped (unhinted join), and with a budget too small even for
    the keys the fully shuffled fallback runs — all three regimes must
    commit the identical result."""
    exp = None
    for i, kw in enumerate((
        {},                                  # broadcast both (default)
        {"broadcast_bytes": 2_000},          # keys fit, survivors don't
        {"broadcast_source_rows": 0},        # not even the keys
    )):
        root, _rels = _mk_table(spark, tmp_path, name=f"bg{i}")
        src = spark.createDataFrame(
            [(10, -1.0), (55, -2.0), (200, 9.0)], "k bigint, v double"
        )
        out = merge_delta(spark, root, src, on=["k"], **kw)
        assert out["num_updated"] == 2 and out["num_inserted"] == 1, kw
        got = {(r["k"], r["v"]) for r in read_delta(spark, root).collect()}
        if exp is None:
            exp = got
        assert got == exp, kw


def test_broadcast_size_estimator():
    """schema_row_bytes mirrors Spark's defaultSize shape;
    est_broadcast_bytes prefers the observed (inflated) disk width and
    stays conservative when the row count is unknown."""
    from pyspark.sql.types import (
        ArrayType, DoubleType, LongType, StringType, StructField,
        StructType,
    )

    from predicting_hospital_readmission_using_mimic_database_spark.sources.io import (
        est_broadcast_bytes,
        schema_row_bytes,
    )

    sch = StructType([
        StructField("k", LongType()),
        StructField("s", StringType()),
        StructField("a", ArrayType(DoubleType())),
    ])
    assert schema_row_bytes(sch) == 8 + 20 + 8
    # observed width wins over the schema floor: 1000 rows over 1 MB on
    # disk -> 4x inflation -> ~4 KB/row, so 100 rows estimate ~400 KB
    est = est_broadcast_bytes(100, schema_row_bytes(sch), 1_000_000, 1000)
    assert est == 100 * 4 * 1000
    # n_rows capped by the table's own row count
    assert est_broadcast_bytes(10**9, 36, 1_000_000, 1000) == 1000 * 4000
    # unknown rows: bounded below by the whole table's inflated bytes
    assert est_broadcast_bytes(5, 36, 1_000_000, 0) == 4_000_000
    # nothing known: schema floor
    assert est_broadcast_bytes(5, 36, 0, 0) == 180
