"""Hudi streaming source (sources/hudi_stream.py): instant offsets,
per-row commit-time windows, checkpoint resume, net semantics."""

import os

import pytest

from predicting_hospital_readmission_using_mimic_database_spark.sources.hudi_stream import (
    register_hudi_stream,
)
from tests.test_hudi_interop import _commit, _mk_table, _write_base


@pytest.fixture
def hroot(tmp_path):
    """t1: f1 (k=1,2) + f2 (k=10). t2: rewrite f1 — k=1 updated
    (stamped t2), k=2 carried forward (still t1), k=3 inserted."""
    root = str(tmp_path / "hs")
    _mk_table(root)
    _write_base(root, "a", "f1", "00000000000001", [(1, 1.0), (2, 2.0)])
    _write_base(root, "b", "f2", "00000000000001", [(10, 10.0)])
    _commit(root, "00000000000001")
    _write_base(
        root, "a", "f1", "00000000000002",
        [(1, -1.0), (2, 2.0), (3, 3.0)],
        commit_times=["00000000000002", "00000000000001", "00000000000002"],
    )
    _commit(root, "00000000000002")
    return root


def _drain(spark, root, ckpt, **opts):
    got = []

    def sink(df, _bid):
        got.extend(tuple(r) for r in df.collect())

    reader = spark.readStream.format("hudi_stream").option("path", root)
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


def test_full_history_then_resume(spark, hroot, tmp_path):
    register_hudi_stream(spark)
    ckpt = str(tmp_path / "ck")
    got = _drain(spark, hroot, ckpt, startingInstant="0")
    # net semantics at the first poll: k=1 at its FINAL value only
    assert got == [
        (1, -1.0, "00000000000002"),
        (2, 2.0, "00000000000001"),
        (3, 3.0, "00000000000002"),
        (10, 10.0, "00000000000001"),
    ]
    # nothing new: same checkpoint drains nothing
    assert _drain(spark, hroot, ckpt, startingInstant="0") == []
    # commit 3 rewrites f2 (k=10 updated, stamped t3): resume sees ONLY it
    _write_base(
        root=hroot, partition="b", file_id="f2",
        instant="00000000000003", rows=[(10, -10.0)],
    )
    _commit(hroot, "00000000000003")
    assert _drain(spark, hroot, ckpt, startingInstant="0") == [
        (10, -10.0, "00000000000003")
    ]


def test_batch_tail_and_default_latest(spark, hroot, tmp_path):
    register_hudi_stream(spark)
    df = spark.read.format("hudi_stream").option("path", hroot).load()
    assert df.columns == ["k", "v", "_commit_instant"]
    assert df.count() == 4
    # startingInstant defaults to latest: fresh stream sees nothing
    assert _drain(spark, hroot, str(tmp_path / "ck2")) == []
    # inflight instants are invisible to the stream
    _write_base(hroot, "b", "f2", "00000000000009", [(99, 99.0)])
    _commit(hroot, "00000000000009", state="commit.inflight")
    assert _drain(spark, hroot, str(tmp_path / "ck2")) == []


# ------------------------------------------------------------- MERGE_ON_READ

from predicting_hospital_readmission_using_mimic_database_spark.sources import hudi_log as HL
from tests.test_hudi_mor import (  # noqa: F401  (fixtures)
    EVENT_TIME_PROPS,
    PSCHEMA,
    SCHEMA,
    _del,
    _prec,
    _rec,
    _write_mor_base,
    mor_root,
    prec_root,
)

T = [f"{i:014d}" for i in range(10)]


def test_mor_stream_full_history(spark, mor_root, tmp_path):
    """Net semantics over base+logs: each key once, at its final value,
    stamped with its own commit instant; the inflight t4 block is
    invisible."""
    register_hudi_stream(spark)
    got = _drain(spark, mor_root, str(tmp_path / "ck"), startingInstant="0")
    assert got == [
        (1, -1.0, T[2]),
        (2, 2.0, T[1]),
        (3, 33.0, T[3]),
        (10, 0.5, T[3]),
    ]


def test_mor_stream_resume_delete_and_upsert(spark, mor_root, tmp_path):
    """Resume windows: a key deleted in the window emits NOTHING (no
    delete markers); a later upsert re-surfaces it."""
    register_hudi_stream(spark)
    ckpt = str(tmp_path / "ck")
    _drain(spark, mor_root, ckpt, startingInstant="0")
    l2 = os.path.join(
        mor_root, "a", HL.log_file_name("f1", T[1], 2)
    )
    HL.append_delete_block(l2, T[5], [_del(2, "a")])
    _commit(mor_root, T[5], state="deltacommit")
    assert _drain(spark, mor_root, ckpt, startingInstant="0") == []
    HL.append_avro_block(l2, T[6], SCHEMA, [_rec(T[6], "a", 2, 22.0)])
    _commit(mor_root, T[6], state="deltacommit")
    assert _drain(spark, mor_root, ckpt, startingInstant="0") == [
        (2, 22.0, T[6])
    ]


def test_mor_stream_untouched_groups_never_opened(spark, mor_root):
    """A file group whose base and committed blocks predate the window
    start gets NO input partition."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.hudi_stream import (
        HudiStreamReader,
        _MorGroupPartition,
    )

    r = HudiStreamReader({"path": mor_root, "startinginstant": "0"})
    # window (t2, t3]: only upserts at t3 — BOTH groups touched (f1 via
    # l2's t3 block, f2 via l3's t3 block)
    parts = r.partitions({"instant": T[2]}, {"instant": T[3]})
    assert all(isinstance(p, _MorGroupPartition) for p in parts)
    assert len(parts) == 2
    # append an f1-only commit at t5: window (t3, t5] touches ONLY f1
    l2 = os.path.join(mor_root, "a", HL.log_file_name("f1", T[1], 2))
    HL.append_avro_block(l2, T[5], SCHEMA, [_rec(T[5], "a", 1, 5.0)])
    _commit(mor_root, T[5], state="deltacommit")
    parts = r.partitions({"instant": T[3]}, {"instant": T[5]})
    assert len(parts) == 1 and "f1" in parts[0].base


def test_mor_stream_event_time_ordering(spark, prec_root, tmp_path):
    """The stream fold honors event-time merge ordering: the stale t2
    upsert of k=2 never surfaces (its base row, outside any window
    emitted at t1, wins), the delete beats k=3 but loses to k=1's
    newer upsert."""
    register_hudi_stream(spark)
    got = _drain(spark, prec_root, str(tmp_path / "ck"), startingInstant="0")
    assert got == [
        (1, 10.0, 200, T[2]),
        (2, 2.0, 100, T[1]),
    ]


def test_mor_batch_tail(spark, mor_root):
    register_hudi_stream(spark)
    df = spark.read.format("hudi_stream").option("path", mor_root).load()
    assert df.columns == ["k", "v", "_commit_instant"]
    got = sorted(tuple(r) for r in df.collect())
    assert got == [
        (1, -1.0, T[2]),
        (2, 2.0, T[1]),
        (3, 33.0, T[3]),
        (10, 0.5, T[3]),
    ]


def test_mor_stream_unknown_command_block_raises(spark, mor_root, tmp_path):
    """A COMMAND block of a type other than ROLLBACK must raise in the
    stream exactly as in the batch reader — its semantics cannot be
    guessed (the batch/stream gates must never drift)."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources import hudi_log as HL
    from predicting_hospital_readmission_using_mimic_database_spark.sources.hudi_log import (
        _append_block,
        _ser_map,
    )

    lp = os.path.join(
        mor_root, "a", HL.log_file_name("f1", "00000000000001", 7)
    )
    _append_block(
        lp,
        HL.COMMAND_BLOCK,
        _ser_map({HL.H_INSTANT_TIME: "00000000000006",
                  HL.H_COMMAND_BLOCK_TYPE: "1"}),
        b"",
    )
    from tests.test_hudi_interop import _commit

    _commit(mor_root, "00000000000006", state="deltacommit")
    register_hudi_stream(spark)
    with pytest.raises(Exception, match="unknown COMMAND block type"):
        spark.read.format("hudi_stream").option("path", mor_root).option(
            "startingInstant", "0"
        ).load().collect()


# --------------------------------------------------------------- CDC mode

def test_cdc_stream_cow(spark, tmp_path):
    """incrementalFormat=cdc on COW: per-COMMIT change images in the
    Delta-CDF row shape, inferred group-locally (zero shuffle) — one
    image pair per commit even inside a single micro-batch; resume
    emits only the new commit's images; deletes carry before images."""
    from tests.test_hudi_interop import _write_keyed_base

    register_hudi_stream(spark)
    root = str(tmp_path / "cdc")
    _mk_table(root)
    t1, t2, t3 = "00000000000001", "00000000000002", "00000000000003"
    _write_keyed_base(root, "a", "f1", t1, [(1, 1.0), (2, 2.0)])
    _write_keyed_base(root, "b", "f2", t1, [(10, 10.0)])
    _commit(root, t1)
    # rewrite f1: k=1 updated, k=2 carried unchanged, k=3 inserted
    _write_keyed_base(
        root, "a", "f1", t2, [(1, -1.0), (2, 2.0), (3, 3.0)],
        times=[t2, t1, t2],
    )
    _commit(root, t2)
    ckpt = str(tmp_path / "ck")
    got = _drain(
        spark, root, ckpt, startingInstant="0", incrementalFormat="cdc"
    )
    assert got == sorted([
        (1, 1.0, "insert", t1),
        (2, 2.0, "insert", t1),
        (10, 10.0, "insert", t1),
        (1, 1.0, "update_preimage", t2),
        (1, -1.0, "update_postimage", t2),
        (3, 3.0, "insert", t2),
    ])
    # resume: commit 3 rewrites f1 dropping k=2 -> one delete image
    _write_keyed_base(root, "a", "f1", t3, [(1, -1.0), (3, 3.0)],
                      times=[t2, t2])
    _commit(root, t3)
    assert _drain(
        spark, root, ckpt, startingInstant="0", incrementalFormat="cdc"
    ) == [(2, 2.0, "delete", t3)]


def test_cdc_stream_mor(spark, mor_root, tmp_path):
    """incrementalFormat=cdc on MERGE_ON_READ: images come from folding
    each touched group's base+log state at consecutive instants — a key
    upserted in two commits emits one image pair PER commit; a DELETE
    tombstone surfaces with its before image; untouched groups ship no
    partition."""
    register_hudi_stream(spark)
    ckpt = str(tmp_path / "mck")
    got = _drain(
        spark, mor_root, ckpt, startingInstant="0", incrementalFormat="cdc"
    )
    t1, t2, t3 = "00000000000001", "00000000000002", "00000000000003"
    assert got == sorted([
        (1, 1.0, "insert", t1),
        (2, 2.0, "insert", t1),
        (10, 10.0, "insert", t1),
        (1, 1.0, "update_preimage", t2),
        (1, -1.0, "update_postimage", t2),
        (3, 3.0, "insert", t2),
        (3, 3.0, "update_preimage", t3),
        (3, 33.0, "update_postimage", t3),
        (10, 10.0, "update_preimage", t3),
        (10, 0.5, "update_postimage", t3),
    ])
    # a DELETE tombstone in a later deltacommit: before image, op=delete
    l2 = os.path.join(
        mor_root, "a", HL.log_file_name("f1", "00000000000001", 2)
    )
    HL.append_delete_block(
        l2, "00000000000005", [{"recordKey": "2", "partitionPath": "a"}]
    )
    _commit(mor_root, "00000000000005", state="deltacommit")
    assert _drain(
        spark, mor_root, ckpt, startingInstant="0", incrementalFormat="cdc"
    ) == [(2, 2.0, "delete", "00000000000005")]


def test_cdc_batch_tail(spark, tmp_path):
    """The batch view composes with cdc mode: the full image history
    since startingInstant in one read."""
    from tests.test_hudi_interop import _write_keyed_base

    register_hudi_stream(spark)
    root = str(tmp_path / "cdcb")
    _mk_table(root)
    t1, t2 = "00000000000001", "00000000000002"
    _write_keyed_base(root, "a", "f1", t1, [(1, 1.0)])
    _commit(root, t1)
    _write_keyed_base(root, "a", "f1", t2, [(1, 5.0)], times=[t2])
    _commit(root, t2)
    df = (
        spark.read.format("hudi_stream").option("path", root)
        .option("incrementalFormat", "cdc").load()
    )
    got = sorted(tuple(r) for r in df.collect())
    assert got == sorted([
        (1, 1.0, "insert", t1),
        (1, 1.0, "update_preimage", t2),
        (1, 5.0, "update_postimage", t2),
    ])
