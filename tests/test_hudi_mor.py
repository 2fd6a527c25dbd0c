"""Hudi MERGE_ON_READ read interop (sources/hudi.py `_read_mor` +
sources/hudi_log.py): log-block codec round trips, base+log upsert
merging, pending-block isolation, time travel, torn tails, and the
DELETE/rollback gates."""

import os

import pytest

from predicting_hospital_readmission_using_mimic_database_spark.sources import hudi_log as HL
from predicting_hospital_readmission_using_mimic_database_spark.sources.hudi import (
    HudiProtocolError,
    read_hudi,
)
from tests.test_hudi_interop import _commit, _mk_table

SCHEMA = {
    "type": "record",
    "name": "rec",
    "fields": [
        {"name": "_hoodie_commit_time", "type": ["null", "string"]},
        {"name": "_hoodie_record_key", "type": ["null", "string"]},
        {"name": "_hoodie_partition_path", "type": ["null", "string"]},
        {"name": "k", "type": ["null", "long"]},
        {"name": "v", "type": ["null", "double"]},
    ],
}


def _rec(instant, part, k, v):
    return {
        "_hoodie_commit_time": instant,
        "_hoodie_record_key": str(k),
        "_hoodie_partition_path": part,
        "k": k,
        "v": v,
    }


def _write_mor_base(root, partition, file_id, instant, rows):
    """Base file with REAL per-row record keys (unlike the COW test
    helper's constant key)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = os.path.join(root, partition) if partition else root
    os.makedirs(d, exist_ok=True)
    data = {
        "_hoodie_commit_time": [instant] * len(rows),
        "_hoodie_commit_seqno": [f"{instant}_0_{i}" for i in range(len(rows))],
        "_hoodie_record_key": [str(k) for k, _v in rows],
        "_hoodie_partition_path": [partition] * len(rows),
        "_hoodie_file_name": [file_id] * len(rows),
        "k": [k for k, _v in rows],
        "v": [v for _k, v in rows],
    }
    pq.write_table(
        pa.table(data), os.path.join(d, f"{file_id}_0-0-0_{instant}.parquet")
    )


def test_log_codec_round_trip(tmp_path):
    p = str(tmp_path / ".f1_001.log.1_0-0-0")
    recs1 = [_rec("2", "a", 1, 1.5), _rec("2", "a", 2, 2.5)]
    recs2 = [_rec("3", "a", 1, -1.0)]
    HL.append_avro_block(p, "2", SCHEMA, recs1)
    HL.append_avro_block(p, "3", SCHEMA, recs2)
    blocks = HL.read_log_blocks(p)
    assert [b["instant"] for b in blocks] == ["2", "3"]
    assert blocks[0]["records"] == recs1 and blocks[1]["records"] == recs2
    # header-only scan sees the same structure without decoding records
    hdrs = HL.scan_block_headers(p)
    assert [(h["type"], h["instant"]) for h in hdrs] == [
        (HL.AVRO_DATA_BLOCK, "2"),
        (HL.AVRO_DATA_BLOCK, "3"),
    ]
    assert all("records" not in h for h in hdrs)


def test_log_codec_torn_tail_and_corruption(tmp_path):
    p = str(tmp_path / ".t_001.log.1_0")
    HL.append_avro_block(p, "2", SCHEMA, [_rec("2", "a", 1, 1.0)])
    size = os.path.getsize(p)
    HL.append_avro_block(p, "3", SCHEMA, [_rec("3", "a", 2, 2.0)])
    # torn write: truncate mid-second-block -> first block still reads
    with open(p, "r+b") as f:
        f.truncate(size + 25)
    assert [b["instant"] for b in HL.read_log_blocks(p)] == ["2"]
    assert [h["instant"] for h in HL.scan_block_headers(p)] == ["2"]
    # mid-file garbage magic raises
    bad = str(tmp_path / ".bad_001.log.1_0")
    with open(bad, "wb") as f:
        f.write(b"NOTHUDIMAGICxxxxxxxxxxxxxxxxxxxx")
    with pytest.raises(HL.HudiLogCorruptError, match="bad magic"):
        HL.read_log_blocks(bad)


@pytest.fixture
def mor_root(tmp_path):
    """deltacommit 1: base files f1 (part a: k=1,2) and f2 (part b:
    k=10). deltacommit 2: log upserts k=1 -> -1.0 and INSERT k=3.
    deltacommit 3: second log file, upsert k=3 -> 33.0 and k=10 -> 0.5.
    Instant 4 is PENDING (inflight): its block must stay invisible."""
    root = str(tmp_path / "mor")
    _mk_table(root, ttype="MERGE_ON_READ")
    _write_mor_base(root, "a", "f1", "00000000000001", [(1, 1.0), (2, 2.0)])
    _write_mor_base(root, "b", "f2", "00000000000001", [(10, 10.0)])
    _commit(root, "00000000000001", state="deltacommit")
    l1 = os.path.join(
        root, "a", HL.log_file_name("f1", "00000000000001", 1)
    )
    HL.append_avro_block(
        l1,
        "00000000000002",
        SCHEMA,
        [_rec("00000000000002", "a", 1, -1.0), _rec("00000000000002", "a", 3, 3.0)],
    )
    _commit(root, "00000000000002", state="deltacommit")
    l2 = os.path.join(
        root, "a", HL.log_file_name("f1", "00000000000001", 2)
    )
    HL.append_avro_block(
        l2, "00000000000003", SCHEMA, [_rec("00000000000003", "a", 3, 33.0)]
    )
    l3 = os.path.join(
        root, "b", HL.log_file_name("f2", "00000000000001", 1)
    )
    HL.append_avro_block(
        l3, "00000000000003", SCHEMA, [_rec("00000000000003", "b", 10, 0.5)]
    )
    _commit(root, "00000000000003", state="deltacommit")
    # pending writer: block present, instant only inflight
    HL.append_avro_block(
        l2, "00000000000004", SCHEMA, [_rec("00000000000004", "a", 1, 999.0)]
    )
    _commit(root, "00000000000004", state="deltacommit.inflight")
    return root


def test_mor_snapshot_merges_logs(spark, mor_root):
    df = read_hudi(spark, mor_root)
    got = {(r["k"], r["v"]) for r in df.collect()}
    assert got == {(1, -1.0), (2, 2.0), (3, 33.0), (10, 0.5)}
    assert sorted(df.columns) == ["k", "v"]


def test_mor_time_travel(spark, mor_root):
    at2 = read_hudi(spark, mor_root, as_of="00000000000002")
    got = {(r["k"], r["v"]) for r in at2.collect()}
    assert got == {(1, -1.0), (2, 2.0), (3, 3.0), (10, 10.0)}
    at1 = read_hudi(spark, mor_root, as_of="00000000000001")
    assert {(r["k"], r["v"]) for r in at1.collect()} == {
        (1, 1.0),
        (2, 2.0),
        (10, 10.0),
    }


def test_mor_partition_pruned_listing(spark, mor_root):
    b = read_hudi(spark, mor_root, partitions="b")
    assert {(r["k"], r["v"]) for r in b.collect()} == {(10, 0.5)}


def test_mor_log_only_group_and_schema(spark, tmp_path):
    """A table with NO base files: schema comes from the first committed
    block's SCHEMA header; later instants win per key."""
    root = str(tmp_path / "lo")
    _mk_table(root, ttype="MERGE_ON_READ")
    l1 = os.path.join(root, "a", HL.log_file_name("g1", "00000000000001", 1))
    HL.append_avro_block(
        l1,
        "00000000000001",
        SCHEMA,
        [_rec("00000000000001", "a", 7, 7.0), _rec("00000000000001", "a", 8, 8.0)],
    )
    HL.append_avro_block(
        l1, "00000000000002", SCHEMA, [_rec("00000000000002", "a", 7, 70.0)]
    )
    _commit(root, "00000000000001", state="deltacommit")
    _commit(root, "00000000000002", state="deltacommit")
    df = read_hudi(spark, root)
    assert {(r["k"], r["v"]) for r in df.collect()} == {(7, 70.0), (8, 8.0)}


def test_cdc_changes_mor(spark, mor_root):
    """read_hudi_changes on MERGE_ON_READ: per-commit images come from
    diffing each touched group's base+log MERGE at consecutive
    instants — an upsert shows before/after, an insert shows after
    only, and a key touched in two commits emits one row per commit."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.hudi import (
        read_hudi_changes,
    )

    # commit 2: k=1 -> -1.0 (update), k=3 inserted (group f1)
    # commit 3: k=3 -> 33.0 (f1), k=10 -> 0.5 (f2)
    ch = read_hudi_changes(spark, mor_root, begin="00000000000001")
    rows = {
        (r["ts_ms"], r["op"], tuple(r["before"] or ()), tuple(r["after"] or ()))
        for r in ch.collect()
    }
    assert rows == {
        ("00000000000002", "u", (1, 1.0), (1, -1.0)),
        ("00000000000002", "i", (), (3, 3.0)),
        ("00000000000003", "u", (3, 3.0), (3, 33.0)),
        ("00000000000003", "u", (10, 10.0), (10, 0.5)),
    }


def test_cdc_changes_mor_delete_block(spark, mor_root):
    """A DELETE tombstone in a log block surfaces as op='d' with the
    key's before image."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.hudi import (
        read_hudi_changes,
    )

    l2 = os.path.join(
        mor_root, "a", HL.log_file_name("f1", "00000000000001", 2)
    )
    HL.append_delete_block(
        l2, "00000000000005", [{"recordKey": "2", "partitionPath": "a"}]
    )
    _commit(mor_root, "00000000000005", state="deltacommit")
    ch = read_hudi_changes(spark, mor_root, begin="00000000000003")
    rows = [(r["op"], r["before"], r["after"]) for r in ch.collect()]
    assert rows == [("d", (2, 2.0), None)]


def test_log_only_incremental_empty_window(spark, tmp_path):
    """An incremental query over a LOG-ONLY table whose committed
    blocks all fall outside the window answers with an EMPTY frame of
    the right shape — no changes is a result, not an error."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.hudi import (
        read_hudi_incremental,
    )

    root = str(tmp_path / "loi")
    _mk_table(root, ttype="MERGE_ON_READ")
    l1 = os.path.join(root, "a", HL.log_file_name("g1", "00000000000005", 1))
    HL.append_avro_block(
        l1, "00000000000005", SCHEMA, [_rec("00000000000005", "a", 7, 7.0)]
    )
    _commit(root, "00000000000005", state="deltacommit")
    # window entirely BEFORE the table's history
    inc = read_hudi_incremental(
        spark, root, begin="00000000000001", end="00000000000002"
    )
    assert inc.count() == 0
    assert sorted(inc.columns) == ["k", "v"]
    # window entirely AFTER the table's history
    inc2 = read_hudi_incremental(spark, root, begin="00000000000009")
    assert inc2.count() == 0 and sorted(inc2.columns) == ["k", "v"]


def test_mor_unparseable_delete_payload_and_rollback_gates(spark, tmp_path):
    """A DELETE block whose payload is NOT the Avro record-list shape
    (a legacy kryo-serialized key array) must raise on read — deletes
    are never silently dropped; rollback COMMAND blocks still raise."""
    root = str(tmp_path / "g")
    _mk_table(root, ttype="MERGE_ON_READ")
    _write_mor_base(root, "a", "f1", "00000000000001", [(1, 1.0)])
    _commit(root, "00000000000001", state="deltacommit")
    lp = os.path.join(root, "a", HL.log_file_name("f1", "00000000000001", 1))
    HL.append_delete_block(
        lp, "00000000000002", payload=b"\x00kryo-ish opaque bytes"
    )
    _commit(root, "00000000000002", state="deltacommit")
    with pytest.raises(Exception, match="HoodieDeleteRecordList|kryo"):
        read_hudi(spark, root).collect()
    root2 = str(tmp_path / "g2")
    _mk_table(root2, ttype="MERGE_ON_READ")
    _write_mor_base(root2, "a", "f1", "00000000000001", [(1, 1.0)])
    _commit(root2, "00000000000001", state="deltacommit")
    lp2 = os.path.join(root2, "a", HL.log_file_name("f1", "00000000000001", 1))
    HL.append_command_block(lp2, "00000000000002", "00000000000001")
    _commit(root2, "00000000000002", state="deltacommit")
    with pytest.raises(HudiProtocolError, match="COMMAND"):
        read_hudi(spark, root2)


def test_mor_compaction_supersedes_logs(spark, mor_root):
    """A compaction (.commit) writes a new base at instant 5; logs
    attached to the OLD base must stop contributing."""
    _write_mor_base(
        mor_root, "a", "f1", "00000000000005", [(1, -1.0), (2, 2.0), (3, 33.0)]
    )
    _commit(mor_root, "00000000000005", state="commit")
    df = read_hudi(spark, mor_root)
    got = {(r["k"], r["v"]) for r in df.collect()}
    assert got == {(1, -1.0), (2, 2.0), (3, 33.0), (10, 0.5)}


def _del(key, part, ordering=None):
    return {"recordKey": str(key), "partitionPath": part,
            "orderingVal": ordering}


def test_delete_codec_round_trip(tmp_path):
    recs = [_del(1, "a"), _del(2, "a", 7), {"recordKey": "9"}]
    blob = HL.encode_delete_records(recs)
    got = HL.decode_delete_records(blob)
    assert [r["recordKey"] for r in got] == ["1", "2", "9"]
    assert got[1]["orderingVal"] == 7
    assert got[2]["partitionPath"] is None
    # written through a log file: raw content surfaced, decode matches
    p = str(tmp_path / ".d_001.log.1_0")
    HL.append_delete_block(p, "2", recs)
    blocks = HL.read_log_blocks(p)
    assert blocks[0]["type"] == HL.DELETE_BLOCK
    assert HL.decode_delete_records(blocks[0]["delete_content"]) == got
    with pytest.raises(HL.HudiLogUnsupportedError, match="kryo"):
        HL.decode_delete_records(b"\x12garbage")


def test_mor_delete_block_tombstones(spark, mor_root):
    """deltacommit 5 DELETE-blocks k=2 (base row) and k=3 (log-inserted
    row) in partition a; k=10 in partition b survives untouched."""
    l2 = os.path.join(mor_root, "a", HL.log_file_name("f1", "00000000000001", 2))
    HL.append_delete_block(
        l2, "00000000000005", [_del(2, "a"), _del(3, "a")]
    )
    _commit(mor_root, "00000000000005", state="deltacommit")
    df = read_hudi(spark, mor_root)
    assert {(r["k"], r["v"]) for r in df.collect()} == {(1, -1.0), (10, 0.5)}
    # time travel BEFORE the delete still sees the rows
    at3 = read_hudi(spark, mor_root, as_of="00000000000003")
    assert {r["k"] for r in at3.collect()} == {1, 2, 3, 10}


def test_mor_delete_then_reinsert_ordering(spark, mor_root):
    """Delete at instant 5, re-insert the same key at instant 6: the
    newer writer wins and the key comes back; the other deleted key
    stays gone. A PENDING delete (inflight instant 7) is invisible."""
    l2 = os.path.join(mor_root, "a", HL.log_file_name("f1", "00000000000001", 2))
    HL.append_delete_block(
        l2, "00000000000005", [_del(1, "a"), _del(2, "a")]
    )
    _commit(mor_root, "00000000000005", state="deltacommit")
    HL.append_avro_block(
        l2, "00000000000006", SCHEMA, [_rec("00000000000006", "a", 1, 111.0)]
    )
    _commit(mor_root, "00000000000006", state="deltacommit")
    # pending delete of k=10: must stay invisible (even its payload)
    l3 = os.path.join(mor_root, "b", HL.log_file_name("f2", "00000000000001", 2))
    HL.append_delete_block(l3, "00000000000007", [_del(10, "b")])
    _commit(mor_root, "00000000000007", state="deltacommit.inflight")
    df = read_hudi(spark, mor_root)
    got = {(r["k"], r["v"]) for r in df.collect()}
    assert got == {(1, 111.0), (3, 33.0), (10, 0.5)}


def test_mor_delete_scoped_to_partition(spark, tmp_path):
    """The same record key lives in partitions a and b; a delete record
    carrying partitionPath=a must not touch b's row, and a delete
    record WITHOUT a partitionPath scopes to the log file's own
    partition dir."""
    root = str(tmp_path / "scope")
    _mk_table(root, ttype="MERGE_ON_READ")
    _write_mor_base(root, "a", "f1", "00000000000001", [(1, 1.0), (2, 2.0)])
    _write_mor_base(root, "b", "f2", "00000000000001", [(1, 10.0), (2, 20.0)])
    _commit(root, "00000000000001", state="deltacommit")
    la = os.path.join(root, "a", HL.log_file_name("f1", "00000000000001", 1))
    HL.append_delete_block(
        la,
        "00000000000002",
        [_del(1, "a"), {"recordKey": "2"}],  # second: no partitionPath
    )
    _commit(root, "00000000000002", state="deltacommit")
    df = read_hudi(spark, root)
    got = {(r["k"], r["v"]) for r in df.collect()}
    assert got == {(1, 10.0), (2, 20.0)}


def test_mor_rollback_command_block_skipped(spark, tmp_path):
    """A rollback COMMAND block whose target instant never completed is
    the normal failed-writer cleanup shape: the read proceeds and the
    rolled-back blocks stay invisible; a rollback targeting a COMPLETED
    instant is inconsistent metadata and raises."""
    root = str(tmp_path / "rb")
    _mk_table(root, ttype="MERGE_ON_READ")
    _write_mor_base(root, "a", "f1", "00000000000001", [(1, 1.0)])
    _commit(root, "00000000000001", state="deltacommit")
    lp = os.path.join(root, "a", HL.log_file_name("f1", "00000000000001", 1))
    # failed writer: block at instant 2 (never completed), then the
    # rollback command under instant 3 (completed)
    HL.append_avro_block(
        lp, "00000000000002", SCHEMA, [_rec("00000000000002", "a", 1, 666.0)]
    )
    HL.append_command_block(lp, "00000000000003", "00000000000002")
    _commit(root, "00000000000003", state="deltacommit")
    got = {(r["k"], r["v"]) for r in read_hudi(spark, root).collect()}
    assert got == {(1, 1.0)}  # rolled-back upsert invisible


def test_mor_incremental_query(spark, mor_root):
    """Incremental over MERGE_ON_READ: net row versions committed in
    (begin, end], via the snapshot merge + per-row commit-time filter;
    deletes in the window emit nothing (no delete markers)."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.hudi import (
        read_hudi_incremental,
    )

    inc = read_hudi_incremental(spark, mor_root, begin="00000000000002")
    assert {(r["k"], r["v"]) for r in inc.collect()} == {(3, 33.0), (10, 0.5)}
    # nothing after t3
    assert read_hudi_incremental(
        spark, mor_root, begin="00000000000003"
    ).count() == 0
    # full window = current snapshot
    allw = read_hudi_incremental(spark, mor_root, begin="00000000000000")
    assert {(r["k"], r["v"]) for r in allw.collect()} == {
        (1, -1.0), (2, 2.0), (3, 33.0), (10, 0.5)
    }
    # end-bounded window (t1, t2]
    w = read_hudi_incremental(
        spark, mor_root, begin="00000000000001", end="00000000000002"
    )
    assert {(r["k"], r["v"]) for r in w.collect()} == {(1, -1.0), (3, 3.0)}
    # a delete committed in the window: the key emits NOTHING
    l2 = os.path.join(mor_root, "a", HL.log_file_name("f1", "00000000000001", 2))
    HL.append_delete_block(l2, "00000000000005", [_del(1, "a")])
    _commit(mor_root, "00000000000005", state="deltacommit")
    inc5 = read_hudi_incremental(spark, mor_root, begin="00000000000004")
    assert inc5.count() == 0


def test_mor_incremental_prunes_untouched_groups(spark, tmp_path):
    """A file group with no base rewrite and no committed log block
    after `begin` is never opened."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.hudi import (
        read_hudi_incremental,
    )

    root = str(tmp_path / "morpune")
    _mk_table(root, ttype="MERGE_ON_READ")
    _write_mor_base(root, "a", "f1", "00000000000001", [(1, 1.0)])
    _write_mor_base(root, "b", "f2", "00000000000001", [(2, 2.0)])
    _commit(root, "00000000000001", state="deltacommit")
    la = os.path.join(root, "a", HL.log_file_name("f1", "00000000000001", 1))
    HL.append_avro_block(
        la, "00000000000002", SCHEMA, [_rec("00000000000002", "a", 1, 11.0)]
    )
    _commit(root, "00000000000002", state="deltacommit")
    inc = read_hudi_incremental(spark, root, begin="00000000000001")
    assert {(r["k"], r["v"]) for r in inc.collect()} == {(1, 11.0)}
    # only partition a's base file is in the plan; f2 never opened
    assert all("f2" not in f for f in inc.inputFiles())
    assert any("f1" in f for f in inc.inputFiles())


def test_mor_merge_window_only_over_logged_groups(spark, mor_root, tmp_path):
    """Scale shape: only file groups WITH committed log blocks pass
    through the record-key merge window; log-free groups' base files
    bypass the shuffle entirely."""
    # mor_root: both groups have logs -> results unchanged (covered by
    # other tests). Build a table where partition b has NO logs:
    root = str(tmp_path / "split")
    _mk_table(root, ttype="MERGE_ON_READ")
    _write_mor_base(root, "a", "f1", "00000000000001", [(1, 1.0)])
    _write_mor_base(root, "b", "f2", "00000000000001", [(2, 2.0)])
    _commit(root, "00000000000001", state="deltacommit")
    la = os.path.join(root, "a", HL.log_file_name("f1", "00000000000001", 1))
    HL.append_avro_block(
        la, "00000000000002", SCHEMA, [_rec("00000000000002", "a", 1, 11.0)]
    )
    _commit(root, "00000000000002", state="deltacommit")
    df = read_hudi(spark, root)
    assert {(r["k"], r["v"]) for r in df.collect()} == {(1, 11.0), (2, 2.0)}
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # exactly one Window node (over the logged group; the extra
    # WindowGroupLimit is Spark's rank-limit pushdown), and a union
    # branch that scans f2's base without it
    assert plan.count("Window [") == 1, plan
    assert "Union" in plan, plan
    # a MOR table with NO logs at all plans with NO window/shuffle
    root2 = str(tmp_path / "nolog")
    _mk_table(root2, ttype="MERGE_ON_READ")
    _write_mor_base(root2, "a", "f1", "00000000000001", [(7, 7.0)])
    _commit(root2, "00000000000001", state="deltacommit")
    df2 = read_hudi(spark, root2)
    assert {(r["k"], r["v"]) for r in df2.collect()} == {(7, 7.0)}
    plan2 = df2._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in plan2, plan2


# ---------------------------------------------------------------- event-time
# ordering (hoodie.table.precombine.field / DefaultHoodieRecordPayload)

PSCHEMA = {
    "type": "record",
    "name": "prec",
    "fields": [
        {"name": "_hoodie_commit_time", "type": ["null", "string"]},
        {"name": "_hoodie_record_key", "type": ["null", "string"]},
        {"name": "_hoodie_partition_path", "type": ["null", "string"]},
        {"name": "k", "type": ["null", "long"]},
        {"name": "v", "type": ["null", "double"]},
        {"name": "ts", "type": ["null", "long"]},
    ],
}

EVENT_TIME_PROPS = (
    "hoodie.table.precombine.field=ts\n"
    "hoodie.table.payload.class="
    "org.apache.hudi.common.model.DefaultHoodieRecordPayload\n"
)


def _prec(instant, part, k, v, ts):
    return {
        "_hoodie_commit_time": instant,
        "_hoodie_record_key": str(k),
        "_hoodie_partition_path": part,
        "k": k,
        "v": v,
        "ts": ts,
    }


def _write_prec_base(root, partition, file_id, instant, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = os.path.join(root, partition)
    os.makedirs(d, exist_ok=True)
    data = {
        "_hoodie_commit_time": [instant] * len(rows),
        "_hoodie_commit_seqno": [f"{instant}_0_{i}" for i in range(len(rows))],
        "_hoodie_record_key": [str(k) for k, _v, _t in rows],
        "_hoodie_partition_path": [partition] * len(rows),
        "_hoodie_file_name": [file_id] * len(rows),
        "k": [k for k, _v, _t in rows],
        "v": [v for _k, v, _t in rows],
        "ts": [t for _k, _v, t in rows],
    }
    pq.write_table(
        pa.table(data), os.path.join(d, f"{file_id}_0-0-0_{instant}.parquet")
    )


@pytest.fixture
def prec_root(tmp_path):
    """Event-time-ordered MOR table. Base at t1: k=1,2,3 all ts=100.
    Log t2 upserts k=1 at ts=200 (newer event: wins) and k=2 at ts=50
    (STALE event that arrived later: must NOT clobber). Log t3
    delete-blocks k=1 and k=3 at orderingVal=150 — loses to k=1's
    ts=200 row, beats k=3's ts=100 base row."""
    root = str(tmp_path / "prec")
    _mk_table(root, ttype="MERGE_ON_READ", extra=EVENT_TIME_PROPS)
    _write_prec_base(
        root, "a", "f1", "00000000000001",
        [(1, 1.0, 100), (2, 2.0, 100), (3, 3.0, 100)],
    )
    _commit(root, "00000000000001", state="deltacommit")
    lp = os.path.join(root, "a", HL.log_file_name("f1", "00000000000001", 1))
    HL.append_avro_block(
        lp, "00000000000002", PSCHEMA,
        [
            _prec("00000000000002", "a", 1, 10.0, 200),
            _prec("00000000000002", "a", 2, 666.0, 50),
        ],
    )
    _commit(root, "00000000000002", state="deltacommit")
    HL.append_delete_block(
        lp, "00000000000003",
        [_del(1, "a", ordering=150), _del(3, "a", ordering=150)],
    )
    _commit(root, "00000000000003", state="deltacommit")
    return root


def test_event_time_ordering_merge(spark, prec_root):
    """Stale upserts lose; a delete competes on its own orderingVal —
    beats older rows, loses to newer ones."""
    got = {(r["k"], r["v"]) for r in read_hudi(spark, prec_root).collect()}
    assert got == {(1, 10.0), (2, 2.0)}


def test_commit_time_mode_overrides_payload(spark, prec_root):
    """hoodie.record.merge.mode=COMMIT_TIME_ORDERING forces positional
    merging even with an event-time payload class declared: the stale
    upsert now APPLIES and the t3 delete kills both targeted keys."""
    with open(
        os.path.join(prec_root, ".hoodie", "hoodie.properties"), "a"
    ) as f:
        f.write("hoodie.record.merge.mode=COMMIT_TIME_ORDERING\n")
    got = {(r["k"], r["v"]) for r in read_hudi(spark, prec_root).collect()}
    assert got == {(2, 666.0)}


def test_event_time_null_ord_sorts_last(spark, prec_root):
    """A committed record with a NULL precombine value loses to any
    valued row of the same key."""
    lp = os.path.join(prec_root, "a", HL.log_file_name("f1", "00000000000001", 1))
    HL.append_avro_block(
        lp, "00000000000004", PSCHEMA,
        [_prec("00000000000004", "a", 2, -5.0, None)],
    )
    _commit(prec_root, "00000000000004", state="deltacommit")
    got = {(r["k"], r["v"]) for r in read_hudi(spark, prec_root).collect()}
    assert got == {(1, 10.0), (2, 2.0)}


def test_event_time_delete_without_orderingval_raises(spark, prec_root):
    lp = os.path.join(prec_root, "a", HL.log_file_name("f1", "00000000000001", 1))
    HL.append_delete_block(lp, "00000000000004", [_del(2, "a")])
    _commit(prec_root, "00000000000004", state="deltacommit")
    with pytest.raises(Exception, match="orderingVal"):
        read_hudi(spark, prec_root).collect()


def test_merge_ordering_property_gates(tmp_path, spark):
    """Unknown payload classes / CUSTOM merge modes / EVENT_TIME without
    a precombine field raise; the default (no declaration) is positional."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.hudi import _merge_ordering

    assert _merge_ordering({}) is None
    assert _merge_ordering(
        {"hoodie.compaction.payload.class":
         "org.apache.hudi.common.model.OverwriteWithLatestAvroPayload"}
    ) is None
    assert _merge_ordering(
        {"hoodie.table.precombine.field": "ts",
         "hoodie.table.payload.class":
         "org.apache.hudi.common.model.DefaultHoodieRecordPayload"}
    ) == "ts"
    assert _merge_ordering(
        {"hoodie.record.merge.mode": "EVENT_TIME_ORDERING",
         "hoodie.table.precombine.field": "ts"}
    ) == "ts"
    with pytest.raises(HudiProtocolError, match="precombine"):
        _merge_ordering({"hoodie.record.merge.mode": "EVENT_TIME_ORDERING"})
    with pytest.raises(HudiProtocolError, match="CUSTOM"):
        _merge_ordering({"hoodie.record.merge.mode": "CUSTOM"})
    with pytest.raises(HudiProtocolError, match="payload"):
        _merge_ordering(
            {"hoodie.table.payload.class":
             "org.apache.hudi.common.model.PartialUpdateAvroPayload"}
        )
    # precombine field missing from the SCHEMA raises at read time
    root = str(tmp_path / "missing")
    _mk_table(
        root, ttype="MERGE_ON_READ",
        extra="hoodie.table.precombine.field=nope\n"
        "hoodie.record.merge.mode=EVENT_TIME_ORDERING\n",
    )
    _write_mor_base(root, "a", "f1", "00000000000001", [(1, 1.0)])
    _commit(root, "00000000000001", state="deltacommit")
    with pytest.raises(HudiProtocolError, match="nope"):
        read_hudi(spark, root)


def test_pruned_group_drops_stale_logs(spark, tmp_path):
    """Col-stats pruning of a log-free (compacted) group must drop the
    group's STALE pre-compaction log files too: they would otherwise
    re-enter the merge as a base-less 'log-only' group and emit rows
    the compacted base already folded in."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.hudi import (
        write_metadata_table_column_stats,
        write_metadata_table_files,
    )

    root = str(tmp_path / "stale")
    _mk_table(root, ttype="MERGE_ON_READ")
    _write_mor_base(root, "a", "f1", "00000000000001", [(1, 1.0), (2, 2.0)])
    _commit(root, "00000000000001", state="deltacommit")
    l1 = os.path.join(root, "a", HL.log_file_name("f1", "00000000000001", 1))
    HL.append_avro_block(
        l1, "00000000000003", SCHEMA, [_rec("00000000000003", "a", 1, -1.0)]
    )
    _commit(root, "00000000000003", state="deltacommit")
    # compaction: new base slice at instant 5 folds the log in; the old
    # log file (attached to the t1 base) is not yet cleaned
    _write_mor_base(
        root, "a", "f1", "00000000000005", [(1, -1.0), (2, 2.0)]
    )
    _commit(root, "00000000000005", state="commit")
    write_metadata_table_files(root)
    write_metadata_table_column_stats(root)
    df = read_hudi(spark, root, predicates=[("k", ">", 100)])
    # the only group's bounds (k in [1,2]) exclude the predicate: the
    # group AND its stale logs vanish — zero rows, zero input files
    assert df.count() == 0
    assert df.inputFiles() == []
