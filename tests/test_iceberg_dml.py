"""merge_iceberg (sources/iceberg_dml.py): row-delta MERGE — matched
rows become position deletes, updates+inserts become new data files,
one snapshot. Pins the round-13 VERDICT's s82 "Done =" shapes:
sequence-number ordering (the new pos-deletes must not shadow the
same snapshot's appends), changelog replay, CAS refresh-and-retry."""

import json
import os

import pytest
import pyspark.sql.functions as F

from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
    IcebergProtocolError,
    export_iceberg,
    read_avro,
    read_iceberg,
    read_iceberg_changelog,
)
from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg_dml import merge_iceberg
from predicting_hospital_readmission_using_mimic_database_spark.sources.table import SnapshotTable


def _mk(spark, tmp_path, n=100):
    root = str(tmp_path / "t")
    t = SnapshotTable.create(
        spark, root, "k bigint, v double",
        bucket_key=["k"], num_buckets=2,
    )
    t.append(spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    ))
    sid0 = export_iceberg(t)
    return root, sid0


def _vals(spark, root, **kw):
    return {(r["k"], r["v"])
            for r in read_iceberg(spark, root, **kw).collect()}


def test_merge_one_snapshot_sequence_ordering(spark, tmp_path):
    root, sid0 = _mk(spark, tmp_path)
    src = spark.createDataFrame(
        [(10, -1.0), (55, -2.0), (200, 9.0)], "k bigint, v double"
    )
    out = merge_iceberg(spark, root, src, on=["k"])
    sid = out["snapshot_id"]
    assert out["num_updated"] == 2 and out["num_inserted"] == 1
    # net state: updates applied, insert present, carried untouched
    exp = {(k, k * 2.0) for k in range(100) if k not in (10, 55)} | {
        (10, -1.0), (55, -2.0), (200, 9.0)}
    assert _vals(spark, root) == exp
    # ONE snapshot landed; its manifest list carries the new delete
    # AND data manifests at the SAME (new) sequence number — and the
    # updated rows being visible proves the pos-deletes did not shadow
    # the snapshot's own appends
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        _latest_metadata_path,
        _localize,
    )

    with open(_latest_metadata_path(root)) as f:
        meta = json.load(f)
    snap = next(s for s in meta["snapshots"]
                if s["snapshot-id"] == sid)
    assert snap["summary"]["operation"] == "overwrite"
    assert snap["parent-snapshot-id"] == sid0
    assert meta["last-sequence-number"] == sid
    _s, mfs = read_avro(_localize(snap["manifest-list"], root))
    new_mfs = [m for m in mfs if m.get("added_snapshot_id") == sid]
    assert sorted(m["content"] for m in new_mfs) == [0, 1]
    assert all(m["sequence_number"] == sid for m in new_mfs)
    # time travel to the base snapshot is intact
    assert _vals(spark, root, snapshot_id=sid0) == {
        (k, k * 2.0) for k in range(100)}


def test_merge_changelog_replay(spark, tmp_path):
    root, sid0 = _mk(spark, tmp_path)
    src = spark.createDataFrame(
        [(10, -1.0), (200, 9.0)], "k bigint, v double"
    )
    out = merge_iceberg(spark, root, src, on=["k"])
    cl = read_iceberg_changelog(
        spark, root, from_snapshot_id=sid0,
        to_snapshot_id=out["snapshot_id"],
    )
    rows = {(r["k"], r["v"], r["_change_type"]) for r in cl.collect()}
    assert rows == {
        (10, 20.0, "delete"), (10, -1.0, "insert"),
        (200, 9.0, "insert"),
    }


def test_repeat_merge_over_existing_pos_deletes(spark, tmp_path):
    root, _sid0 = _mk(spark, tmp_path)
    merge_iceberg(spark, root, spark.createDataFrame(
        [(10, -1.0)], "k bigint, v double"), on=["k"])
    out2 = merge_iceberg(spark, root, spark.createDataFrame(
        [(10, -10.0)], "k bigint, v double"), on=["k"])
    assert out2["num_updated"] == 1
    got = _vals(spark, root)
    assert (10, -10.0) in got and (10, -1.0) not in got \
        and (10, 20.0) not in got
    assert len(got) == 100


def test_merge_matched_delete_and_noop(spark, tmp_path):
    root, _sid0 = _mk(spark, tmp_path)
    out = merge_iceberg(
        spark, root,
        spark.createDataFrame([(7, 0.0), (888, 0.0)],
                              "k bigint, v double"),
        on=["k"], when_matched="delete", insert=False,
    )
    assert out["num_deleted"] == 1 and out["num_inserted"] == 0
    got = {r["k"] for r in read_iceberg(spark, root).collect()}
    assert 7 not in got and 888 not in got and len(got) == 99
    # a no-change merge commits nothing
    before = out["snapshot_id"]
    out2 = merge_iceberg(
        spark, root,
        spark.createDataFrame([(99999, 0.0)], "k bigint, v double"),
        on=["k"], insert=False,
    )
    assert out2["snapshot_id"] == before
    # and left no stray attempt files in metadata/
    assert not [n for n in os.listdir(os.path.join(root, "metadata"))
                if n.startswith((".merge-stage",))]


def test_merge_refusals(spark, tmp_path):
    root, _sid0 = _mk(spark, tmp_path, n=10)
    dup = spark.createDataFrame(
        [(1, 1.0), (1, 2.0)], "k bigint, v double"
    )
    with pytest.raises(IcebergProtocolError, match="duplicate key"):
        merge_iceberg(spark, root, dup, on=["k"])
    wrong = spark.createDataFrame([(1, "x")], "k bigint, extra string")
    with pytest.raises(IcebergProtocolError, match="exactly the"):
        merge_iceberg(spark, root, wrong, on=["k"])
    with pytest.raises(ValueError, match="merge keys"):
        merge_iceberg(spark, root,
                      spark.createDataFrame([(1, 1.0)],
                                            "k bigint, v double"),
                      on=["nope"])


def test_merge_sees_equality_deleted_rows_as_unmatched(spark, tmp_path):
    """A row already dead under an EQUALITY delete must not re-match —
    the snapshot scan the merge joins against applies every existing
    delete flavor, so the source row inserts instead."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        append_equality_deletes,
    )

    root, _sid0 = _mk(spark, tmp_path, n=20)
    append_equality_deletes(root, [{"k": 5}], ["k"])
    assert 5 not in {r["k"] for r in read_iceberg(spark, root).collect()}
    out = merge_iceberg(
        spark, root,
        spark.createDataFrame([(5, -5.0)], "k bigint, v double"),
        on=["k"],
    )
    assert out["num_inserted"] == 1 and out["num_updated"] == 0
    got = _vals(spark, root)
    assert (5, -5.0) in got and (5, 10.0) not in got


def test_merge_cas_retry_on_foreign_commit(spark, tmp_path):
    """A foreign writer claiming the merge's metadata version forces a
    refresh-and-reattempt: the merge lands on the NEXT version, and
    the losing attempt's staged files are reclaimed."""
    import glob

    root, _sid0 = _mk(spark, tmp_path, n=20)
    mdir = os.path.join(root, "metadata")
    with open(os.path.join(mdir, "v1.metadata.json")) as f:
        cur_meta = json.load(f)
    # claim the version the merge is about to take (a foreign no-op
    # commit: same snapshot state, next version number)
    version = int(cur_meta.get("_export_version", 1)) + 1
    foreign = dict(cur_meta)
    foreign["_export_version"] = version
    with open(os.path.join(mdir, f"v{version}.metadata.json"),
              "x") as f:
        json.dump(foreign, f)

    out = merge_iceberg(
        spark, root,
        spark.createDataFrame([(3, -3.0)], "k bigint, v double"),
        on=["k"],
    )
    # the merge retried past the foreign claim and landed
    assert (3, -3.0) in _vals(spark, root)
    with open(os.path.join(mdir,
                           f"v{version + 1}.metadata.json")) as f:
        committed = json.load(f)
    assert committed["current-snapshot-id"] == out["snapshot_id"]
    # exactly ONE attempt's files survive per kind — the loser's
    # pos-delete parquet / manifests / manifest list were reclaimed
    sid = out["snapshot_id"]
    for pat in (f"pos-delete-{sid}-*.parquet",
                f"manifest-del-{sid}-*.avro",
                f"manifest-merge-{sid}-*.avro",
                f"snap-{sid}-*.avro"):
        assert len(glob.glob(os.path.join(mdir, pat))) == 1, pat


def test_merge_failure_leaves_no_stage_dirs(spark, tmp_path):
    """A Spark job failing mid-write must not strand partial
    .merge-stage-* dirs in the table root, and no snapshot lands."""
    import glob

    root, sid0 = _mk(spark, tmp_path, n=10)
    poison = spark.range(1).select(
        F.lit(3).cast("bigint").alias("k"),
        F.assert_true(F.col("id") > 100).cast("double").alias("v"),
    )
    with pytest.raises(Exception):
        merge_iceberg(spark, root, poison, on=["k"])
    assert not glob.glob(os.path.join(root, ".merge-stage*"))
    # nothing committed: current snapshot unchanged, no orphan files
    assert {r["k"] for r in read_iceberg(spark, root).collect()} == set(
        range(10))
    assert not glob.glob(os.path.join(root, "data", "merge-*"))
    assert not glob.glob(os.path.join(root, "metadata", "pos-delete-*"))


def test_delete_from_iceberg_basic(spark, tmp_path):
    """DELETE: pos-delete snapshot excludes exactly the predicate
    rows; time travel intact; changelog replays exact deletes; a
    stacked delete never re-deletes dead rows; no-op commits
    nothing."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg_dml import delete_from_iceberg

    root, sid0 = _mk(spark, tmp_path, n=50)
    out = delete_from_iceberg(spark, root, "k % 5 = 0")
    assert out["num_deleted"] == 10
    assert {k for k, _v in _vals(spark, root)} == {
        k for k in range(50) if k % 5}
    assert len(_vals(spark, root, snapshot_id=sid0)) == 50
    rows = {(r["k"], r["_change_type"])
            for r in read_iceberg_changelog(
                spark, root, from_snapshot_id=sid0).collect()}
    assert rows == {(k, "delete") for k in range(0, 50, 5)}
    # overlapping second delete counts only newly-dead rows
    out2 = delete_from_iceberg(spark, root, "k % 10 = 0 OR k = 1")
    assert out2["num_deleted"] == 1  # only k=1; %10==0 was dead
    out3 = delete_from_iceberg(spark, root, "k < 0")
    assert out3 == {"snapshot_id": out2["snapshot_id"],
                    "num_deleted": 0}
    # data files untouched, no stage dirs, nothing stranded
    import glob
    assert not glob.glob(os.path.join(root, ".delete-stage*"))


def test_delete_from_iceberg_lost_cas_retries(spark, tmp_path):
    """A foreign commit racing the delete: the version file the delete
    targets is GENUINELY pre-claimed mid-flight, so the real
    FileExistsError -> cleanup -> None path runs, then the retry
    refreshes and lands on the next version."""
    import glob
    import re
    import shutil as _shutil

    from predicting_hospital_readmission_using_mimic_database_spark.sources import iceberg_dml as M

    root, sid0 = _mk(spark, tmp_path, n=20)
    mdir = os.path.join(root, "metadata")
    real = M._stage_and_commit
    calls = {"n": 0}

    def racing(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            # a foreign writer claims the NEXT metadata version while
            # the delete is staging: copy the current metadata file
            # forward — the inner real() then hits the actual
            # FileExistsError CAS branch and must clean up + refresh
            latest = a[2]
            vs = [int(re.match(r"v(\d+)\.metadata\.json",
                               os.path.basename(p)).group(1))
                  for p in glob.glob(
                      os.path.join(mdir, "v*.metadata.json"))]
            _shutil.copy(
                latest, os.path.join(
                    mdir, f"v{max(vs) + 1}.metadata.json"))
        return real(*a, **kw)

    M._stage_and_commit = racing
    try:
        out = M.delete_from_iceberg(spark, root, "k = 3")
    finally:
        M._stage_and_commit = real
    assert out["num_deleted"] == 1 and calls["n"] == 2
    assert {k for k, _v in _vals(spark, root)} == set(range(20)) - {3}
    # the losing attempt's files were reclaimed: exactly ONE
    # pos-delete parquet (the winner's) exists
    assert len(glob.glob(
        os.path.join(mdir, "pos-delete-*.parquet"))) == 1


def test_update_iceberg_pre_row_swap_and_stacking(spark, tmp_path):
    """UPDATE: SET expressions see the PRE-update row (swap works);
    stacked updates read each other's output; bad SET columns and
    empty assignments refuse; no-op commits nothing."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg_dml import update_iceberg

    root, sid0 = _mk(spark, tmp_path, n=30)
    out = update_iceberg(
        spark, root, "k = 4",
        {"k": "CAST(v AS BIGINT)", "v": "CAST(k AS DOUBLE)"},
    )
    assert out["num_updated"] == 1
    vals = _vals(spark, root)
    assert (8, 4.0) in vals and not any(k == 4 for k, _v in vals)
    # second update reads the first's output
    out2 = update_iceberg(spark, root, "k = 8 AND v = 4.0",
                          {"v": "v + 0.25"})
    assert out2["num_updated"] == 1
    assert (8, 4.25) in _vals(spark, root)
    # time travel to the base snapshot
    assert (4, 8.0) in _vals(spark, root, snapshot_id=sid0)
    # refusals + no-op
    with pytest.raises(ValueError, match="not in the table schema"):
        update_iceberg(spark, root, "k = 1", {"nope": "1"})
    with pytest.raises(ValueError, match="at least one"):
        update_iceberg(spark, root, "k = 1", {})
    out3 = update_iceberg(spark, root, "k < 0", {"v": "v"})
    assert out3 == {"snapshot_id": out2["snapshot_id"],
                    "num_updated": 0}
