"""rewrite_iceberg_data_files (sources/iceberg_rewrite.py): bin-pack,
sort/z-order clustering, delete consumption, v3 row-lineage carry, and
the changelog's REPLACE-snapshot skip."""

import json
import os

import pytest
from pyspark.sql import functions as F

from predicting_hospital_readmission_using_mimic_database_spark.sources.avro_ocf import (
    write_avro,
)
from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
    MANIFEST_ENTRY_SCHEMA,
    MANIFEST_FILE_SCHEMA,
    IcebergProtocolError,
    _live_files,
    _metadata_path,
    append_equality_deletes,
    export_iceberg,
    read_iceberg,
    read_iceberg_changelog,
)
from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg_rewrite import (
    rewrite_iceberg_data_files,
)
from predicting_hospital_readmission_using_mimic_database_spark.sources.table import (
    SnapshotTable,
)


def _exported(spark, tmp_path, rows=20000):
    df = spark.range(0, rows).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("a"),
        (F.col("id") * 7 % 89).alias("b"),
    )
    t = SnapshotTable.create(
        spark,
        str(tmp_path / "ice"),
        "k bigint, a bigint, b bigint",
        bucket_key=["k"],
        num_buckets=4,
    )
    for m in (0, 1, 2):
        t.append(df.filter(F.col("k") % 3 == m))
        export_iceberg(t)
    return t.root, df


def test_binpack(spark, tmp_path):
    root, df = _exported(spark, tmp_path)
    before = read_iceberg(spark, root)
    n_before = len(before.inputFiles())
    assert n_before > 1
    sid = rewrite_iceberg_data_files(spark, root, target_file_rows=10**6)
    assert sid == 4
    after = read_iceberg(spark, root)
    assert len(after.inputFiles()) == 1
    assert after.exceptAll(before).count() == 0
    assert before.exceptAll(after).count() == 0
    # the replace snapshot is INVISIBLE to the changelog
    assert read_iceberg_changelog(
        spark, root, from_snapshot_id=3
    ).count() == 0
    # time travel below it still serves the old layout
    assert len(read_iceberg(spark, root, snapshot_id=3)
               .inputFiles()) == n_before
    # a second pass has nothing to do
    assert rewrite_iceberg_data_files(
        spark, root, target_file_rows=10**6
    ) is None


def test_full_rewrite_consumes_equality_deletes(spark, tmp_path):
    root, df = _exported(spark, tmp_path)
    doomed = [{"k": i} for i in range(0, 20000, 50)]
    append_equality_deletes(root, doomed, ["k"])
    assert read_iceberg(spark, root).count() == 20000 - 400
    sid = rewrite_iceberg_data_files(
        spark, root, sort_by=["a"], target_file_rows=3000
    )
    assert sid is not None
    got = read_iceberg(spark, root)
    assert got.count() == 20000 - 400
    ks = {r["k"] for r in got.select("k").collect()}
    assert ks.isdisjoint(set(range(0, 20000, 50)))
    # the delete files are CONSUMED, not carried
    with open(_metadata_path(root)) as f:
        meta = json.load(f)
    _files, pos_d, eq_d, dv_d = _live_files(meta, root, None)
    assert not (pos_d or eq_d or dv_d)
    # sort clustering: a range predicate on the sort key prunes
    n_files = len(got.inputFiles())
    assert n_files >= 6
    pruned = read_iceberg(spark, root, predicates=[("a", ">=", 90)])
    assert len(pruned.inputFiles()) < n_files
    # changelog across [eq-delete, rewrite]: only the 400 deletes, the
    # replace contributes nothing and ordinals stay contiguous
    cl = read_iceberg_changelog(spark, root, from_snapshot_id=3)
    rows = cl.groupBy("_change_type", "_change_ordinal").count().collect()
    assert {(r["_change_type"], r["_change_ordinal"], r["count"])
            for r in rows} == {("delete", 0, 400)}


def test_zorder_prunes_both_dims(spark, tmp_path):
    root, df = _exported(spark, tmp_path)
    sid = rewrite_iceberg_data_files(
        spark, root, zorder_by=["a", "b"], target_file_rows=2500
    )
    assert sid is not None
    got = read_iceberg(spark, root)
    n_files = len(got.inputFiles())
    assert n_files >= 6
    pruned = read_iceberg(
        spark, root, predicates=[("a", "<", 10), ("b", "<", 10)]
    )
    assert len(pruned.inputFiles()) < n_files / 2
    exp = df.filter((F.col("a") < 10) & (F.col("b") < 10))
    act = pruned.filter((F.col("a") < 10) & (F.col("b") < 10))
    assert act.exceptAll(exp).count() == 0
    assert exp.exceptAll(act).count() == 0


def _v3_lineage_table(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "v3")
    files = []
    for name, lo, frid in (("a", 0, 1000), ("b", 100, 2000)):
        p = os.path.join(root, "data", f"{name}.parquet")
        os.makedirs(os.path.dirname(p), exist_ok=True)
        pq.write_table(
            pa.table({"k": pa.array(range(lo, lo + 100), type=pa.int64()),
                      "bal": pa.array([i * 2 for i in range(100)],
                                      type=pa.int64())}),
            p,
        )
        files.append((p, frid))
    entries = [
        {
            "status": 1,
            "snapshot_id": 1,
            "data_file": {
                "content": 0, "file_path": p, "file_format": "PARQUET",
                "partition": {}, "record_count": 100,
                "file_size_in_bytes": 1, "equality_ids": None,
                "first_row_id": frid,
            },
        }
        for p, frid in files
    ]
    m = os.path.join(root, "metadata", "m1.avro")
    os.makedirs(os.path.dirname(m), exist_ok=True)
    write_avro(m, MANIFEST_ENTRY_SCHEMA, entries)
    ml = os.path.join(root, "metadata", "ml1.avro")
    write_avro(ml, MANIFEST_FILE_SCHEMA, [{
        "manifest_path": m, "manifest_length": 1, "partition_spec_id": 0,
        "content": 0, "added_snapshot_id": 1, "sequence_number": 5,
        "first_row_id": 1000,
    }])
    meta = {
        "format-version": 3,
        "table-uuid": "v3rw",
        "location": root,
        "current-snapshot-id": 1,
        "snapshots": [{"snapshot-id": 1, "timestamp-ms": 1000,
                       "summary": {"operation": "append"},
                       "manifest-list": ml, "schema-id": 0,
                       "first-row-id": 1000}],
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "schemas": [{"type": "struct", "schema-id": 0, "fields": [
            {"id": 1, "name": "k", "required": False, "type": "long"},
            {"id": 2, "name": "bal", "required": False, "type": "long"},
        ]}],
        "current-schema-id": 0,
        "last-column-id": 2,
        "last-sequence-number": 5,
        "next-row-id": 2100,
    }
    with open(os.path.join(root, "metadata", "v1.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as f:
        f.write("1")
    return root


def test_v3_row_lineage_survives_rewrite(spark, tmp_path):
    root = _v3_lineage_table(tmp_path)
    before = {
        r["k"]: (r["_row_id"], r["_last_updated_sequence_number"])
        for r in read_iceberg(spark, root, row_lineage=True).collect()
    }
    assert before[0] == (1000, 5) and before[100] == (2000, 5)
    sid = rewrite_iceberg_data_files(spark, root, target_file_rows=10**6)
    assert sid == 2
    assert len(read_iceberg(spark, root).inputFiles()) == 1
    after = {
        r["k"]: (r["_row_id"], r["_last_updated_sequence_number"])
        for r in read_iceberg(spark, root, row_lineage=True).collect()
    }
    assert after == before
    # writer bookkeeping advanced: new entry stamped past next-row-id
    with open(_metadata_path(root)) as f:
        meta = json.load(f)
    assert meta["next-row-id"] == 2100 + 200
    files, *_ = _live_files(meta, root, None)
    (rec,) = files
    assert rec[5] == 2100  # the replacement file's explicit first_row_id


def test_partitioned_spec_gates(spark, tmp_path):
    root = _v3_lineage_table(tmp_path)
    with open(_metadata_path(root)) as f:
        meta = json.load(f)
    meta["partition-specs"] = [{"spec-id": 0, "fields": [
        {"source-id": 1, "field-id": 1000, "name": "k", "transform":
         "identity"}]}]
    with open(os.path.join(root, "metadata", "v2.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as f:
        f.write("2")
    # bin-pack AND per-tuple re-clustering run on partitioned tables,
    # but a live file whose tuple matches no declared spec is
    # malformed metadata
    with pytest.raises(IcebergProtocolError, match="no partition spec"):
        rewrite_iceberg_data_files(spark, root)
    with pytest.raises(IcebergProtocolError, match="no partition spec"):
        rewrite_iceberg_data_files(spark, root, sort_by=["k"],
                                   target_file_rows=10)


def test_changelog_ordinals_renumber_over_replace(spark, tmp_path):
    root, df = _exported(spark, tmp_path, rows=3000)
    sid = rewrite_iceberg_data_files(spark, root, target_file_rows=10**6)
    # a data-changing snapshot AFTER the replace: [a3, replace, eq-del]
    eq_sid = append_equality_deletes(
        root, [{"k": i} for i in range(30)], ["k"]
    )
    cl = read_iceberg_changelog(spark, root, from_snapshot_id=2)
    got = {
        (r["_change_type"], r["_change_ordinal"],
         r["_commit_snapshot_id"], r["count"])
        for r in cl.groupBy("_change_type", "_change_ordinal",
                            "_commit_snapshot_id").count().collect()
    }
    # snapshot 3 (third append) is ordinal 0; the replace (sid) emits
    # nothing; the eq-delete is ordinal 1, not 2
    assert got == {("insert", 0, 3, 1000),
                   ("delete", 1, eq_sid, 30)}, got


def test_binpack_partitioned_table_per_tuple(spark, tmp_path):
    """Composition with the partitioned export + spec evolution: files
    bin-pack WITHIN each partition tuple, each vintage under its own
    spec; cross-spec pruning still works on the packed layout."""
    import datetime

    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg_partitioned import (
        evolve_iceberg_partition_spec,
        export_iceberg_partitioned,
    )

    df = spark.range(0, 600).select(
        F.col("id").alias("k"),
        (
            F.to_timestamp(F.lit("2026-01-01 00:00:00"))
            + F.make_interval(hours=F.col("id") % 96)
        ).alias("ts"),
    )
    t = SnapshotTable.create(
        spark, str(tmp_path / "src"), "k bigint, ts timestamp",
        bucket_key=["k"], num_buckets=2,
    )
    dest = str(tmp_path / "ice")
    # two exports under day(ts) -> 2 files per day
    t.append(df.filter(F.col("k") % 2 == 0))
    export_iceberg_partitioned(spark, t, dest, partition_by=[("ts", "day")])
    t.append(df.filter(F.col("k") % 2 == 1))
    export_iceberg_partitioned(spark, t, dest)
    # evolve to hour(ts), two more exports -> 2 files per hour
    evolve_iceberg_partition_spec(dest, [("ts", "hour")])
    for lo in (1000, 2000):
        t.append(df.select((F.col("k") + lo).alias("k"), "ts"))
        export_iceberg_partitioned(spark, t, dest)
    before = read_iceberg(spark, dest)
    n_before = len(before.inputFiles())
    assert n_before == 4 * 2 + 96 * 2  # 2/day + 2/hour
    sid = rewrite_iceberg_data_files(spark, dest, target_file_rows=10**6)
    assert sid is not None
    after = read_iceberg(spark, dest)
    assert len(after.inputFiles()) == 4 + 96  # 1 per tuple per spec
    assert after.count() == 1800  # 300 + 300 + 600 + 600
    assert after.exceptAll(before).count() == 0
    assert before.exceptAll(after).count() == 0
    # cross-spec pruning on the packed layout: 1 day file + 1 hour file
    probe = datetime.datetime(2026, 1, 2, 5)
    pr = read_iceberg(spark, dest, partitions={"ts": probe})
    assert len(pr.inputFiles()) == 2, pr.inputFiles()
    # the replace is changelog-silent here too
    assert read_iceberg_changelog(
        spark, dest, from_snapshot_id=4
    ).count() == 0
    # per-tuple re-clustering: sort each DAY tuple's rows by k and
    # split it (150 rows > the 100-row target -> 2 k-ranged files per
    # day); lone hour files at/below the target stay put — content
    # identical, partition purity preserved
    sid2 = rewrite_iceberg_data_files(
        spark, dest, sort_by=["k"], target_file_rows=100
    )
    assert sid2 == sid + 1
    sorted_read = read_iceberg(spark, dest)
    assert sorted_read.count() == 1800
    assert sorted_read.exceptAll(before).count() == 0
    # probe day now spans 2 sorted files + its lone hour file
    pr2 = read_iceberg(spark, dest, partitions={"ts": probe})
    assert len(pr2.inputFiles()) == 3, pr2.inputFiles()
    # delete application still gates on partitioned tables
    append_equality_deletes(dest, [{"k": 1}], ["k"])
    with pytest.raises(IcebergProtocolError, match="unpartitioned-only"):
        rewrite_iceberg_data_files(spark, dest)


def test_remove_orphan_files(spark, tmp_path):
    """removeOrphanFiles: unreferenced data/ files (crashed writes) GC;
    everything any snapshot still references — including files only
    named by status-2 tombstones — survives."""
    import shutil as _sh
    import time as _time

    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg_partitioned import (
        export_iceberg_partitioned,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg_rewrite import (
        remove_orphan_iceberg_files,
    )

    df = spark.range(0, 400).select(
        F.col("id").alias("k"),
        (
            F.to_timestamp(F.lit("2026-01-01 00:00:00"))
            + F.make_interval(hours=(F.col("id") % 96))
        ).alias("ts"),
    )
    t = SnapshotTable.create(
        spark, str(tmp_path / "src"), "k bigint, ts timestamp",
        bucket_key=["k"], num_buckets=2,
    )
    t.append(df)
    dest = str(tmp_path / "ice")
    export_iceberg_partitioned(spark, t, dest, partition_by=[("ts", "day")])
    before = read_iceberg(spark, dest)
    n_files = len(before.inputFiles())
    # plant crashed-write leavings: one at data/ root, one inside a
    # partition dir, one hidden staging file (never touched)
    import re as _re
    from urllib.parse import unquote as _unq

    real = _unq(_re.sub(r"^file:/+", "/", before.inputFiles()[0]))
    stray1 = os.path.join(dest, "data", "crashed-0001.parquet")
    pdir = os.path.dirname(real)
    stray2 = os.path.join(pdir, "crashed-0002.parquet")
    hidden = os.path.join(dest, "data", ".staged.parquet")
    for p in (stray1, stray2, hidden):
        _sh.copyfile(real, p)
    cutoff = int(_time.time() * 1000) + 60_000
    # dry run lists exactly the two visible strays
    listed = remove_orphan_iceberg_files(dest, older_than_ms=cutoff, dry_run=True)
    assert listed == sorted([stray1, stray2])
    assert os.path.exists(stray1)
    # an explicit young-file horizon protects in-flight writes...
    assert remove_orphan_iceberg_files(
        dest, older_than_ms=int(_time.time() * 1000) - 60_000
    ) == []
    # ...and so does the DEFAULT (now - 3 days, the official posture):
    # a just-staged file is never destroyed by a bare invocation
    assert remove_orphan_iceberg_files(dest) == []
    assert os.path.exists(stray1)
    # the real pass deletes them and nothing else
    gone = remove_orphan_iceberg_files(dest, older_than_ms=cutoff)
    assert gone == sorted([stray1, stray2])
    assert not os.path.exists(stray1) and not os.path.exists(stray2)
    after = read_iceberg(spark, dest)
    assert len(after.inputFiles()) == n_files
    assert after.exceptAll(before).count() == 0
    assert before.exceptAll(after).count() == 0
    # files a rewrite tombstoned stay protected (still reachable)
    t.append(df.select((F.col("k") + 1000).alias("k"), "ts"))
    export_iceberg_partitioned(spark, t, dest)
    sid = rewrite_iceberg_data_files(spark, dest, target_file_rows=10**6)
    assert sid is not None
    assert remove_orphan_iceberg_files(
        dest, older_than_ms=int(_time.time() * 1000) + 60_000
    ) == []
    assert read_iceberg(spark, dest, snapshot_id=1).count() == 400
