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
