"""Hudi COW read interop (sources/hudi.py): timeline-gated file-slice
resolution, time travel, pending-writer isolation, and the MOR gates."""

import os

import pytest

from predicting_hospital_readmission_using_mimic_database_spark.sources.hudi import (
    HudiProtocolError,
    hudi_commits,
    read_hudi,
)

META = {
    "_hoodie_commit_time": "1",
    "_hoodie_commit_seqno": "1_0_1",
    "_hoodie_record_key": "k",
    "_hoodie_partition_path": "p",
    "_hoodie_file_name": "f",
}


def _write_base(root, partition, file_id, instant, rows, commit_times=None):
    """One base file; rows are stamped with the writing instant (real
    Hudi semantics) unless per-row commit_times are given — a rewrite
    carries forward old rows under their ORIGINAL commit time."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = os.path.join(root, partition) if partition else root
    os.makedirs(d, exist_ok=True)
    names = ["k", "v"]
    cols = list(zip(*rows)) if rows else [[], []]
    data = {m: [str(mv)] * len(rows) for m, mv in META.items()}
    data["_hoodie_commit_time"] = list(commit_times or [instant] * len(rows))
    data.update({n: list(c) for n, c in zip(names, cols)})
    pq.write_table(
        pa.table(data),
        os.path.join(d, f"{file_id}_0-0-0_{instant}.parquet"),
    )


def _mk_table(root, ttype="COPY_ON_WRITE", extra=""):
    h = os.path.join(root, ".hoodie")
    os.makedirs(h, exist_ok=True)
    with open(os.path.join(h, "hoodie.properties"), "w") as f:
        f.write("#props\nhoodie.table.name=t\n")
        f.write(f"hoodie.table.type={ttype}\n")
        if extra:
            f.write(extra)


def _commit(root, instant, state="commit"):
    open(os.path.join(root, ".hoodie", f"{instant}.{state}"), "w").close()


@pytest.fixture
def hudi_root(tmp_path):
    """Commit 1: file groups f1 (partition a) + f2 (partition b).
    Commit 2: rewrites f1 (updated rows). Instant 3 is INFLIGHT with a
    staged rewrite of f2 that must stay invisible."""
    root = str(tmp_path / "hudi")
    _mk_table(root)
    _write_base(root, "a", "f1", "00000000000001", [(1, 1.0), (2, 2.0)])
    _write_base(root, "b", "f2", "00000000000001", [(10, 10.0)])
    _commit(root, "00000000000001")
    # the rewrite UPDATES k=1, carries k=2 forward under its ORIGINAL
    # commit time, and inserts k=3 (real COW rewrite row stamping)
    _write_base(
        root, "a", "f1", "00000000000002",
        [(1, -1.0), (2, 2.0), (3, 3.0)],
        commit_times=["00000000000002", "00000000000001", "00000000000002"],
    )
    _commit(root, "00000000000002")
    _write_base(root, "b", "f2", "00000000000003", [(99, 99.0)])
    _commit(root, "00000000000003", state="commit.inflight")
    return root


def test_snapshot_read_latest_slices(spark, hudi_root):
    df = read_hudi(spark, hudi_root)
    assert sorted(df.columns) == ["k", "v"]  # meta columns dropped
    got = {(r["k"], r["v"]) for r in df.collect()}
    # f1@2 (rewritten) + f2@1; the inflight f2@3 must be invisible
    assert got == {(1, -1.0), (2, 2.0), (3, 3.0), (10, 10.0)}
    meta = read_hudi(spark, hudi_root, keep_meta=True)
    assert "_hoodie_commit_time" in meta.columns
    assert hudi_commits(hudi_root) == ["00000000000001", "00000000000002"]


def test_time_travel_as_of(spark, hudi_root):
    old = read_hudi(spark, hudi_root, as_of="00000000000001")
    assert {(r["k"], r["v"]) for r in old.collect()} == {
        (1, 1.0), (2, 2.0), (10, 10.0)
    }
    with pytest.raises(ValueError, match="no completed base files"):
        read_hudi(spark, hudi_root, as_of="00000000000000")


def test_mor_and_replace_gates(spark, tmp_path):
    r1 = str(tmp_path / "mor")
    _mk_table(r1, ttype="MERGE_ON_READ")
    os.makedirs(os.path.join(r1, ".hoodie"), exist_ok=True)
    # empty MOR table: the log-merging path runs and finds nothing
    with pytest.raises(ValueError, match="no completed base files or log"):
        read_hudi(spark, r1)
    r2 = str(tmp_path / "rc")
    _mk_table(r2)
    _write_base(r2, "a", "f1", "00000000000001", [(1, 1.0)])
    _commit(r2, "00000000000001")
    _commit(r2, "00000000000002", state="replacecommit")
    with pytest.raises(HudiProtocolError, match="replacecommit"):
        read_hudi(spark, r2)
    r3 = str(tmp_path / "log")
    _mk_table(r3)
    _write_base(r3, "a", "f1", "00000000000001", [(1, 1.0)])
    _commit(r3, "00000000000001")
    os.makedirs(os.path.join(r3, "a"), exist_ok=True)
    open(os.path.join(r3, "a", ".f1_00000000000001.log.1_0-0-0"), "w").close()
    with pytest.raises(HudiProtocolError, match="log file"):
        read_hudi(spark, r3)


def test_s19_entry_fixture_time_travel_and_pending(spark):
    """The s19 registry entry builds a writer-shaped table (meta columns,
    file-group rewrite, an INFLIGHT staged rewrite); beyond its in-entry
    asserts (timeline surface, as_of row count), verify through the SAME
    fixture that time travel returns the pre-rewrite balances and the
    pending +999999 rows never surface."""
    from pyspark.sql import functions as F

    from predicting_hospital_readmission_using_mimic_database_spark.qdefs_core import q_s19

    sf = "/root/testdata/sf0.001"
    cur = {r["c_mktsegment"]: r["bal_c"] for r in q_s19(spark, sf).collect()}
    # the entry's pid-scoped root is deterministic; recompute it WITHOUT
    # calling _table_root (which would rmtree-reset the table)
    import hashlib
    import tempfile

    root = os.path.join(
        tempfile.gettempdir(),
        f"snap_s19_{os.getpid()}_{hashlib.md5(sf.encode()).hexdigest()[:12]}",
    )
    old = read_hudi(spark, root, as_of="00000000000001")
    segs = sorted(cur)
    base = (
        old.groupBy("c_mktsegment")
        .agg(F.sum("bal_c").cast("long").alias("bal_c"))
        .collect()
    )
    base = {r["c_mktsegment"]: r["bal_c"] for r in base}
    # rewrite touched ONLY the first segment (+10000 cents total shift =
    # 10000 * its row count); every other segment identical at both versions
    n0 = old.filter(F.col("c_mktsegment") == segs[0]).count()
    assert cur[segs[0]] == base[segs[0]] + 10000 * n0
    for s in segs[1:]:
        assert cur[s] == base[s]
    # the inflight writer staged +999999 per row on segment 1: invisible
    latest = read_hudi(spark, root)
    mx = (
        latest.filter(F.col("c_mktsegment") == segs[1])
        .agg(F.max("bal_c").alias("m"))
        .collect()[0]["m"]
    )
    assert mx < 999999


def test_rolled_back_instant_invisible(spark, tmp_path):
    """A data file whose instant never completed (crashed writer, or
    rolled back) is excluded even though it sits in the partition dir."""
    root = str(tmp_path / "rb")
    _mk_table(root)
    _write_base(root, "a", "f1", "00000000000001", [(1, 1.0)])
    _commit(root, "00000000000001")
    _write_base(root, "a", "f9", "00000000000005", [(5, 5.0)])  # orphan
    _commit(root, "00000000000005", state="rollback")
    got = {(r["k"], r["v"]) for r in read_hudi(spark, root).collect()}
    assert got == {(1, 1.0)}


def test_partition_pruned_listing(spark, hudi_root):
    """partitions= restricts BOTH the result and the walk: only admitted
    partition dirs are listed (pruned descent), matching files only."""
    a = read_hudi(spark, hudi_root, partitions="a")
    assert {(r["k"], r["v"]) for r in a.collect()} == {
        (1, -1.0), (2, 2.0), (3, 3.0)
    }
    assert len(a.inputFiles()) == 1
    both = read_hudi(spark, hudi_root, partitions=["a", "b"])
    assert both.count() == 4
    with pytest.raises(ValueError, match="no completed base files"):
        read_hudi(spark, hudi_root, partitions="zzz")


def test_incremental_query(spark, hudi_root):
    """Incremental (begin, end]: only rows whose own commit time lands
    in the window — rewritten files' carried-forward rows are filtered
    by _hoodie_commit_time, untouched groups never read."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.hudi import (
        read_hudi_incremental,
    )

    # commit 2 rewrote f1: the window's payload is ONLY the updated k=1
    # and inserted k=3 — the carried-forward k=2 keeps its original
    # commit time and must be filtered out
    inc = read_hudi_incremental(spark, hudi_root, begin="00000000000001")
    got = {(r["k"], r["v"]) for r in inc.collect()}
    assert got == {(1, -1.0), (3, 3.0)}
    # untouched group (f2) is not even opened
    assert all("f2" not in p for p in inc.inputFiles())
    # empty window
    assert read_hudi_incremental(
        spark, hudi_root, begin="00000000000002"
    ).count() == 0
    # full window == snapshot rowset
    full = read_hudi_incremental(spark, hudi_root, begin="00000000000000")
    assert full.count() == 4
    # end-bounded window excludes the later rewrite
    first = read_hudi_incremental(
        spark, hudi_root, begin="00000000000000", end="00000000000001"
    )
    assert {(r["k"], r["v"]) for r in first.collect()} == {
        (1, 1.0), (2, 2.0), (10, 10.0)
    }


def test_replacecommit_clustering_and_insert_overwrite(spark, tmp_path):
    """A completed replacecommit retires the file groups its metadata
    lists (partitionToReplaceFileIds): the clustered rows live ONLY in
    the new group at and after the instant (no double-read), time
    travel before it still sees the old groups, and a PENDING
    replacecommit changes nothing."""
    import json as _json

    from predicting_hospital_readmission_using_mimic_database_spark.sources.hudi import (
        read_hudi_incremental,
    )

    root = str(tmp_path / "clust")
    _mk_table(root)
    _write_base(root, "a", "f1", "00000000000001", [(1, 1.0)])
    _write_base(root, "a", "f2", "00000000000001", [(2, 2.0)])
    _commit(root, "00000000000001")
    # clustering staged: new group written, replacecommit only INFLIGHT
    t2 = "00000000000002"
    _write_base(root, "a", "fC", t2, [(1, 1.0), (2, 2.0)],
                commit_times=["00000000000001"] * 2)
    _commit(root, t2, state="replacecommit.inflight")
    assert len(read_hudi(spark, root).inputFiles()) == 2  # unchanged
    # completed: metadata lists the replaced groups
    with open(os.path.join(root, ".hoodie", f"{t2}.replacecommit"), "w") as f:
        _json.dump(
            {"partitionToReplaceFileIds": {"a": ["f1", "f2"]}}, f
        )
    df = read_hudi(spark, root)
    assert sorted((r["k"], r["v"]) for r in df.collect()) == [(1, 1.0), (2, 2.0)]
    assert len(df.inputFiles()) == 1  # ONLY the clustered group
    old = read_hudi(spark, root, as_of="00000000000001")
    assert sorted(r["k"] for r in old.collect()) == [1, 2]
    assert len(old.inputFiles()) == 2  # pre-replace groups still travelable
    assert hudi_commits(root) == ["00000000000001", t2]
    # clustering preserves per-row commit times: incremental since t1
    # re-emits NOTHING
    assert read_hudi_incremental(spark, root, begin="00000000000001").count() == 0
    # insert_overwrite shape: replace fC with brand-new data
    t3 = "00000000000003"
    _write_base(root, "a", "fN", t3, [(7, 7.0)])
    with open(os.path.join(root, ".hoodie", f"{t3}.replacecommit"), "w") as f:
        _json.dump({"partitionToReplaceFileIds": {"a": ["fC"]}}, f)
    assert {r["k"] for r in read_hudi(spark, root).collect()} == {7}
    # incremental now sees only the overwrite's new rows
    inc = read_hudi_incremental(spark, root, begin="00000000000001")
    assert {r["k"] for r in inc.collect()} == {7}


def test_metadata_table_listing_replaces_walk(spark, hudi_root, monkeypatch):
    """With a .hoodie/metadata files partition present, file discovery
    reads the metadata table and NEVER walks the data tree; snapshot,
    time travel, partition pruning, incremental refresh, and isDeleted
    tombstones all resolve through the listing."""
    import predicting_hospital_readmission_using_mimic_database_spark.sources.hudi as H
    from predicting_hospital_readmission_using_mimic_database_spark.sources import (
        hudi_log as HL,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.hudi import (
        write_metadata_table_files,
    )

    want = {(r["k"], r["v"]) for r in read_hudi(spark, hudi_root).collect()}
    mdt = write_metadata_table_files(hudi_root)
    assert H._metadata_table_listing(hudi_root) is not None

    def no_walk(*a, **k):
        raise AssertionError("os.walk taken despite a metadata table")

    monkeypatch.setattr(H.os, "walk", no_walk)
    got = {(r["k"], r["v"]) for r in read_hudi(spark, hudi_root).collect()}
    assert got == want
    # time travel + partition pruning resolve through the listing too
    old = read_hudi(spark, hudi_root, as_of="00000000000001")
    assert {r["k"] for r in old.collect()} == {1, 2, 10}
    only_b = read_hudi(spark, hudi_root, partitions="b")
    assert {r["k"] for r in only_b.collect()} == {10}
    # a cleaner-shaped update: mark partition b's base file isDeleted
    # in a later metadata block -> the group vanishes from the snapshot
    lp = os.path.join(
        mdt, "files", HL.log_file_name("files-0000", "00000000000000", 1)
    )
    fname = "f2_0-0-0_00000000000001.parquet"
    HL.append_avro_block(
        lp,
        "00000000000002",
        H.METADATA_RECORD_SCHEMA,
        [{"key": "b", "type": 2,
          "filesystemMetadata": {fname: {"size": 0, "isDeleted": True}}}],
    )
    got2 = {(r["k"], r["v"]) for r in read_hudi(spark, hudi_root).collect()}
    assert {k for k, _v in got2} == {1, 2, 3}  # partition b gone


def _write_keyed_base(root, partition, file_id, instant, rows, times=None):
    """Base file whose ``_hoodie_record_key`` IS the row key (real Hudi
    record keying, which the CDC diff joins on)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = os.path.join(root, partition) if partition else root
    os.makedirs(d, exist_ok=True)
    ks = [k for k, _v in rows]
    pq.write_table(
        pa.table(
            {
                "_hoodie_commit_time": list(times or [instant] * len(rows)),
                "_hoodie_record_key": [str(k) for k in ks],
                "_hoodie_partition_path": [partition] * len(rows),
                "k": ks,
                "v": [v for _k, v in rows],
            }
        ),
        os.path.join(d, f"{file_id}_0-0-0_{instant}.parquet"),
    )


def test_cdc_changes_cow(spark, tmp_path):
    """read_hudi_changes on COW: per-commit change images inferred by
    diffing each touched group's slices — inserts, updates with
    before/after, carried-forward rows cancelled, untouched groups
    never read."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.hudi import (
        read_hudi_changes,
    )

    root = str(tmp_path / "cdc")
    _mk_table(root)
    t1, t2 = "00000000000001", "00000000000002"
    _write_keyed_base(root, "a", "f1", t1, [(1, 1.0), (2, 2.0)])
    _write_keyed_base(root, "b", "f2", t1, [(10, 10.0)])
    _commit(root, t1)
    # rewrite f1: k=1 updated, k=2 carried unchanged, k=3 inserted
    _write_keyed_base(
        root, "a", "f1", t2, [(1, -1.0), (2, 2.0), (3, 3.0)],
        times=[t2, t1, t2],
    )
    _commit(root, t2)
    ch = read_hudi_changes(spark, root, begin=t1)
    rows = {(r["op"], r["before"], r["after"]) for r in ch.collect()}
    assert rows == {
        ("u", (1, 1.0), (1, -1.0)),
        ("i", None, (3, 3.0)),
    }
    # posture: only the touched group's two slices are opened
    opened = {os.path.basename(p) for p in ch.inputFiles()}
    assert opened == {
        f"f1_0-0-0_{t1}.parquet",
        f"f1_0-0-0_{t2}.parquet",
    }, opened
    # full history: commit 1 = pure inserts of both groups, then the
    # commit-2 images — one row per changed key PER COMMIT
    all_ch = read_hudi_changes(spark, root, begin="00000000000000")
    assert all_ch.filter(f"ts_ms = '{t1}'").count() == 3
    assert {
        r["op"] for r in all_ch.filter(f"ts_ms = '{t1}'").collect()
    } == {"i"}
    assert all_ch.filter(f"ts_ms = '{t2}'").count() == 2


def test_cdc_changes_cow_delete_and_empty_window(spark, tmp_path):
    """A key absent from a group's rewritten base file is a DELETE —
    it surfaces with its before image and a NULL after. An empty
    window is an empty feed with the cdc shape, not an error."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.hudi import (
        read_hudi_changes,
    )

    root = str(tmp_path / "cdcdel")
    _mk_table(root)
    t1, t2 = "00000000000001", "00000000000002"
    _write_keyed_base(root, "a", "f1", t1, [(1, 1.0), (2, 2.0)])
    _commit(root, t1)
    # rewrite drops k=2 (delete) and carries k=1 unchanged
    _write_keyed_base(root, "a", "f1", t2, [(1, 1.0)], times=[t1])
    _commit(root, t2)
    ch = read_hudi_changes(spark, root, begin=t1)
    rows = [(r["op"], r["ts_ms"], r["before"], r["after"]) for r in ch.collect()]
    assert rows == [("d", t2, (2, 2.0), None)]
    empty = read_hudi_changes(spark, root, begin=t2)
    assert empty.count() == 0
    assert empty.columns[:2] == ["op", "ts_ms"]


def test_bootstrap_table_refuses(spark, tmp_path):
    """A metadata-only BOOTSTRAPPED table's base files are skeletons
    (meta columns only); without the HFile bootstrap index the
    skeleton->source pairing is unknowable, so every read surface
    raises instead of silently returning meta-only rows."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.hudi import (
        read_hudi_changes,
        read_hudi_incremental,
    )

    root = str(tmp_path / "boot")
    _mk_table(
        root,
        extra="hoodie.bootstrap.base.path=/some/source/table\n",
    )
    _write_base(root, "a", "f1", "00000000000001", [(1, 1.0)])
    _commit(root, "00000000000001")
    for fn in (
        lambda: read_hudi(spark, root),
        lambda: read_hudi_incremental(spark, root, begin="0"),
        lambda: read_hudi_changes(spark, root, begin="0"),
    ):
        with pytest.raises(HudiProtocolError, match="bootstrap"):
            fn()
    # the gate lives in the _properties chokepoint: the STREAMING
    # source refuses too (its schema probe loads properties)
    from predicting_hospital_readmission_using_mimic_database_spark.sources.hudi_stream import (
        register_hudi_stream,
    )

    register_hudi_stream(spark)
    with pytest.raises(Exception, match="bootstrap"):
        (
            spark.read.format("hudi_stream").option("path", root)
            .load().collect()
        )
    # the index dir alone (no property) also gates
    root2 = str(tmp_path / "boot2")
    _mk_table(root2)
    _write_base(root2, "a", "f1", "00000000000001", [(1, 1.0)])
    _commit(root2, "00000000000001")
    os.makedirs(os.path.join(root2, ".hoodie", ".aux", ".bootstrap"))
    with pytest.raises(HudiProtocolError, match="bootstrap"):
        read_hudi(spark, root2)


def test_cdc_changes_replacecommit_retirement(spark, tmp_path):
    """A replacecommit (insert_overwrite) RETIRES a file group: the CDC
    feed must emit delete images for the retired group's rows and
    insert images for the replacement — retired groups vanish from
    _latest_slices, so the spec diff (not latest-instant filtering)
    is what catches them."""
    import json as _json

    from predicting_hospital_readmission_using_mimic_database_spark.sources.hudi import (
        read_hudi_changes,
    )

    root = str(tmp_path / "cdcrep")
    _mk_table(root)
    t1, t2 = "00000000000001", "00000000000002"
    _write_keyed_base(root, "a", "fA", t1, [(1, 1.0), (2, 2.0)])
    _commit(root, t1)
    # insert_overwrite: new group fB, fA retired via replacecommit
    _write_keyed_base(root, "a", "fB", t2, [(7, 7.0)])
    with open(os.path.join(root, ".hoodie", f"{t2}.replacecommit"), "w") as f:
        _json.dump({"partitionToReplaceFileIds": {"a": ["fA"]}}, f)
    ch = read_hudi_changes(spark, root, begin=t1)
    rows = {(r["op"], r["before"], r["after"]) for r in ch.collect()}
    assert rows == {
        ("d", (1, 1.0), None),
        ("d", (2, 2.0), None),
        ("i", None, (7, 7.0)),
    }


def test_cdc_changes_schema_change_across_commits(spark, tmp_path):
    """A window spanning a schema change unions cleanly: every commit's
    images carry the END state's payload shape, with pre-change
    vintages NULL-filling the added column."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from predicting_hospital_readmission_using_mimic_database_spark.sources.hudi import (
        read_hudi_changes,
    )

    root = str(tmp_path / "cdcschema")
    _mk_table(root)
    t1, t2 = "00000000000001", "00000000000002"
    _write_keyed_base(root, "a", "f1", t1, [(1, 1.0)])
    _commit(root, t1)
    # rewrite under a WIDER schema: adds column w
    d = os.path.join(root, "a")
    pq.write_table(
        pa.table(
            {
                "_hoodie_commit_time": [t1, t2],
                "_hoodie_record_key": ["1", "2"],
                "_hoodie_partition_path": ["a", "a"],
                "k": [1, 2],
                "v": [1.0, 2.0],
                "w": ["x", "y"],
            }
        ),
        os.path.join(d, f"f1_0-0-0_{t2}.parquet"),
    )
    _commit(root, t2)
    ch = read_hudi_changes(spark, root, begin="00000000000000")
    rows = {(r["ts_ms"], r["op"], r["before"], r["after"])
            for r in ch.collect()}
    assert rows == {
        # t1's insert image NULL-fills the not-yet-existing column w
        (t1, "i", None, (1, 1.0, None)),
        # t2: k=1's payload changed (w gained a value) -> update pair;
        # k=2 is a new insert
        (t2, "u", (1, 1.0, None), (1, 1.0, "x")),
        (t2, "i", None, (2, 2.0, "y")),
    }


def test_metadata_table_stale_falls_back_to_walk(spark, hudi_root):
    """A data commit landing AFTER the metadata table's last sync must
    not be invisible: the listing reports stale (None) and file
    discovery walks — no silently dropped rows."""
    import predicting_hospital_readmission_using_mimic_database_spark.sources.hudi as H
    from predicting_hospital_readmission_using_mimic_database_spark.sources.hudi import (
        write_metadata_table_files,
    )

    write_metadata_table_files(hudi_root)
    assert H._metadata_table_listing(hudi_root) is not None
    _write_base(hudi_root, "c", "f9", "00000000000004", [(50, 5.0)])
    _commit(hudi_root, "00000000000004")
    assert H._metadata_table_listing(hudi_root) is None  # stale
    got = {r["k"] for r in read_hudi(spark, hudi_root).collect()}
    assert 50 in got
    # re-sync restores the listing path, with the new file visible
    write_metadata_table_files(hudi_root)
    listing = H._metadata_table_listing(hudi_root)
    assert listing is not None and "c" in listing


def test_metadata_table_unfoldable_falls_back_to_walk(spark, hudi_root):
    """A files partition this reader cannot fold (no parseable slices;
    key-level DELETE blocks) degrades to the walk instead of raising or
    trusting an empty listing."""
    import predicting_hospital_readmission_using_mimic_database_spark.sources.hudi as H
    from predicting_hospital_readmission_using_mimic_database_spark.sources import (
        hudi_log as HL,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.hudi import (
        write_metadata_table_files,
    )

    want = {r["k"] for r in read_hudi(spark, hudi_root).collect()}
    mdt = write_metadata_table_files(hudi_root)
    # no parseable slices: only an unrecognized file name in files/
    lp = os.path.join(
        mdt, "files", HL.log_file_name("files-0000", "00000000000000", 1)
    )
    unrec = os.path.join(mdt, "files", "not-a-slice.hfile")
    os.rename(lp, unrec)
    assert H._metadata_table_listing(hudi_root) is None
    assert {r["k"] for r in read_hudi(spark, hudi_root).collect()} == want
    os.rename(unrec, lp)
    # a key-level DELETE block is not foldable here -> walk, not raise
    HL.append_delete_block(
        lp, "00000000000002", [{"recordKey": "x", "partitionPath": "a"}]
    )
    assert H._metadata_table_listing(hudi_root) is None
    assert {r["k"] for r in read_hudi(spark, hudi_root).collect()} == want
