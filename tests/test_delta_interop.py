"""Delta `_delta_log` interop reader (sources/delta.py): replay real
Delta JSON commit logs — adds/removes, partition values, time travel —
and raise (never silently mis-read) on unsupported protocol features."""

import json
import os

import pytest

from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import (
    DeltaProtocolError,
    delta_table_version,
    read_delta,
)


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


def _write_parquet(path, rows, names):
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), exist_ok=True)
    cols = list(zip(*rows)) if rows else [[] for _ in names]
    pq.write_table(
        pa.table({n: list(c) for n, c in zip(names, cols)}), path
    )


def _write_commit(root, version, actions):
    log = os.path.join(root, "_delta_log")
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"{version:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def _meta_action(fields, part_cols=(), configuration=None):
    return {
        "metaData": {
            "id": "fixture",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _schema_string(fields),
            "partitionColumns": list(part_cols),
            "configuration": configuration or {},
        }
    }


@pytest.fixture
def delta_root(tmp_path):
    """Hand-written partitioned delta table:
    v0: protocol+meta, add seg=A (ids 0,1) and seg=B (ids 10,11)
    v1: remove seg=B file, add replacement (ids 10,11 with bal+100)
    """
    root = str(tmp_path / "dtbl")
    _write_parquet(
        os.path.join(root, "seg=A", "part-a0.parquet"),
        [(0, 5.0), (1, 6.0)],
        ["id", "bal"],
    )
    _write_parquet(
        os.path.join(root, "seg=B", "part-b0.parquet"),
        [(10, 7.0), (11, 8.0)],
        ["id", "bal"],
    )
    _write_parquet(
        os.path.join(root, "seg=B", "part-b1.parquet"),
        [(10, 107.0), (11, 108.0)],
        ["id", "bal"],
    )
    fields = [("id", "long"), ("bal", "double"), ("seg", "string")]
    _write_commit(
        root,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            _meta_action(fields, part_cols=["seg"]),
            {
                "add": {
                    "path": "seg=A/part-a0.parquet",
                    "partitionValues": {"seg": "A"},
                    "size": 1,
                    "modificationTime": 0,
                    "dataChange": True,
                }
            },
            {
                "add": {
                    "path": "seg=B/part-b0.parquet",
                    "partitionValues": {"seg": "B"},
                    "size": 1,
                    "modificationTime": 0,
                    "dataChange": True,
                }
            },
        ],
    )
    _write_commit(
        root,
        1,
        [
            {"commitInfo": {"operation": "MERGE"}},
            {
                "remove": {
                    "path": "seg=B/part-b0.parquet",
                    "deletionTimestamp": 1,
                    "dataChange": True,
                }
            },
            {
                "add": {
                    "path": "seg=B/part-b1.parquet",
                    "partitionValues": {"seg": "B"},
                    "size": 1,
                    "modificationTime": 1,
                    "dataChange": True,
                }
            },
        ],
    )
    return root


def test_read_latest_applies_removes(spark, delta_root):
    df = read_delta(spark, delta_root)
    assert df.columns == ["id", "bal", "seg"]  # schema order, part col last
    got = {(r["id"], r["bal"], r["seg"]) for r in df.collect()}
    assert got == {
        (0, 5.0, "A"),
        (1, 6.0, "A"),
        (10, 107.0, "B"),
        (11, 108.0, "B"),
    }
    assert delta_table_version(delta_root) == 1


def test_time_travel_version_zero(spark, delta_root):
    got = {(r["id"], r["bal"]) for r in read_delta(spark, delta_root, version=0).collect()}
    assert got == {(0, 5.0), (1, 6.0), (10, 7.0), (11, 8.0)}
    with pytest.raises(ValueError, match="ends at 1"):
        read_delta(spark, delta_root, version=5)


def test_partition_value_cast_and_encoded_path(spark, tmp_path):
    """Non-string partition types come back cast from the spec's string
    serialization; percent-encoded add paths are decoded."""
    root = str(tmp_path / "enc")
    _write_parquet(
        os.path.join(root, "d 1", "f.parquet"), [(1,)], ["v"]
    )
    _write_commit(
        root,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            _meta_action([("v", "long"), ("p", "integer")], part_cols=["p"]),
            {
                "add": {
                    "path": "d%201/f.parquet",
                    "partitionValues": {"p": "42"},
                    "size": 1,
                    "modificationTime": 0,
                    "dataChange": True,
                }
            },
        ],
    )
    rows = read_delta(spark, root).collect()
    assert [(r["v"], r["p"]) for r in rows] == [(1, 42)]
    assert rows[0].asDict()["p"] == 42


def test_partition_pruning_filter(spark, delta_root):
    """partitions= prunes at the metadata level: only matching files are
    handed to Spark (scan count check via the plan's file listing)."""
    a = read_delta(spark, delta_root, partitions={"seg": "A"})
    assert {(r["id"], r["seg"]) for r in a.collect()} == {(0, "A"), (1, "A")}
    both = read_delta(spark, delta_root, partitions={"seg": ["A", "B"]})
    assert both.count() == 4
    none = read_delta(spark, delta_root, partitions={"seg": "ZZZ"})
    assert none.count() == 0 and none.columns == ["id", "bal", "seg"]
    with pytest.raises(ValueError, match="non-partition"):
        read_delta(spark, delta_root, partitions={"id": 1})
    # int-typed partition values match through the string serialization
    # (both 42 and "42" admit)
    # fewer files in the pruned plan: the A read touches ONE file
    assert len(a.inputFiles()) == 1


def test_export_random_history_property(spark, tmp_path):
    """Property: after EVERY commit in a random append/merge/delete/
    overwrite history, an incremental export produces a delta version
    whose read_delta equals the table snapshot — and every earlier
    exported version still replays to its own snapshot."""
    import random

    import pyspark.sql.functions as F

    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import export_delta_log
    from predicting_hospital_readmission_using_mimic_database_spark.sources.table import SnapshotTable

    rng = random.Random(7)
    root = str(tmp_path / "hist")
    t = SnapshotTable.create(spark, root, "k bigint, v double")
    nxt = 0
    snapshots = []  # (delta_version, expected rowset)

    def rows(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        )

    for step in range(6):
        op = rng.choice(["append", "merge", "delete", "overwrite"])
        if op == "append":
            t.append(rows(nxt, nxt + rng.randint(1, 5)))
            nxt += 5
        elif op == "merge":
            t.merge(
                rows(max(0, nxt - 3), nxt + 1).select(
                    "k", (F.col("v") + 100).alias("v")
                ),
                key=["k"],
            )
        elif op == "delete":
            t.delete(F.col("k") % 3 == 0)
        else:
            t.overwrite(rows(0, rng.randint(1, 4)))
        dv = export_delta_log(t)
        expect = sorted(tuple(r) for r in t.read().collect())
        snapshots.append((dv, expect))
    for dv, expect in snapshots:
        got = sorted(
            tuple(r) for r in read_delta(spark, root, version=dv).collect()
        )
        assert got == expect, (dv, len(got), len(expect))


def test_protocol_gates(spark, tmp_path):
    fields = [("v", "long")]
    # unknown reader features still gate (deletionVectors/columnMapping/
    # timestampNtz/v2Checkpoint are honored now)
    r1 = str(tmp_path / "future")
    _write_commit(
        r1,
        0,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["deletionVectors", "someFutureFeature"],
                }
            },
            _meta_action(fields),
        ],
    )
    with pytest.raises(DeltaProtocolError, match="someFutureFeature"):
        read_delta(spark, r1)
    # column mapping without the required field metadata raises loudly
    # ('id' mode needs delta.columnMapping.id on every field)
    r2 = str(tmp_path / "cm")
    _write_commit(
        r2,
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            _meta_action(
                fields, configuration={"delta.columnMapping.mode": "id"}
            ),
        ],
    )
    with pytest.raises(DeltaProtocolError, match="columnMapping.id"):
        read_delta(spark, r2)
    r2b = str(tmp_path / "cmn")
    _write_commit(
        r2b,
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            _meta_action(
                fields, configuration={"delta.columnMapping.mode": "name"}
            ),
        ],
    )
    with pytest.raises(DeltaProtocolError, match="physicalName"):
        read_delta(spark, r2b)
    # checkpointed-away version 0
    r3 = str(tmp_path / "cp")
    _write_commit(r3, 7, [_meta_action(fields)])
    with pytest.raises(DeltaProtocolError, match="checkpoint"):
        read_delta(spark, r3)
    # malformed deletion-vector descriptor: loud, never silently wrong
    r4 = str(tmp_path / "fdv")
    _write_parquet(os.path.join(r4, "f.parquet"), [(1,)], ["v"])
    _write_commit(
        r4,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            _meta_action(fields),
            {
                "add": {
                    "path": "f.parquet",
                    "partitionValues": {},
                    "size": 1,
                    "modificationTime": 0,
                    "dataChange": True,
                    "deletionVector": {
                        "storageType": "z", "pathOrInlineDv": "?",
                    },
                }
            },
        ],
    )
    with pytest.raises(ValueError, match="storageType"):
        read_delta(spark, r4)


def test_export_snapshot_table_roundtrip(spark, tmp_path):
    """SnapshotTable -> _delta_log export: zero-copy publish readable by
    any Delta client; incremental exports diff the live set, and the
    exported log time-travels to each exported snapshot."""
    import pyspark.sql.functions as F

    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import export_delta_log
    from predicting_hospital_readmission_using_mimic_database_spark.sources.table import SnapshotTable

    root = str(tmp_path / "tbl")
    t = SnapshotTable.create(
        spark, root, "k bigint, v double", bucket_key=["k"], num_buckets=4
    )
    t.append(
        spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
    )
    assert export_delta_log(t) == 0
    d0 = read_delta(spark, root)
    assert d0.columns == ["k", "v"]
    assert {(r["k"], r["v"]) for r in d0.collect()} == {
        (i, float(i)) for i in range(100)
    }
    # no-change export is a no-op
    assert export_delta_log(t) == 0
    assert delta_table_version(root) == 0
    # a bucket-pruned MERGE rewrites some files; the next export commits
    # only the diff, and both delta versions stay readable
    upd = spark.createDataFrame([(7, -7.0), (1000, 1.0)], "k bigint, v double")
    t.merge(upd)
    assert export_delta_log(t) == 1
    got = {r["k"]: r["v"] for r in read_delta(spark, root).collect()}
    assert got[7] == -7.0 and got[1000] == 1.0 and len(got) == 101
    old = {r["k"]: r["v"] for r in read_delta(spark, root, version=0).collect()}
    assert old[7] == 7.0 and 1000 not in old


def _write_checkpoint(root, version, rows, parts=None):
    import pyarrow as pa
    import pyarrow.parquet as pq

    log = os.path.join(root, "_delta_log")
    os.makedirs(log, exist_ok=True)
    table = pa.Table.from_pylist(rows)
    if parts is None:
        pq.write_table(table, os.path.join(log, f"{version:020d}.checkpoint.parquet"))
    else:
        n = len(parts)
        for i, sl in enumerate(parts, start=1):
            pq.write_table(
                table.slice(*sl),
                os.path.join(
                    log, f"{version:020d}.checkpoint.{i:010d}.{n:010d}.parquet"
                ),
            )


def _cp_rows(fields, adds):
    rows = [
        {
            "protocol": {"minReaderVersion": 1, "minWriterVersion": 2},
            "metaData": None,
            "add": None,
        },
        {
            "protocol": None,
            "metaData": {
                "id": "cp",
                "schemaString": _schema_string(fields),
                "partitionColumns": [],
                "configuration": None,
            },
            "add": None,
        },
    ]
    for path in adds:
        rows.append(
            {
                "protocol": None,
                "metaData": None,
                "add": {
                    "path": path,
                    "partitionValues": None,
                    "size": 1,
                    "modificationTime": 0,
                    "dataChange": True,
                },
            }
        )
    return rows


def test_checkpoint_parquet_replay(spark, tmp_path):
    """A log whose early JSON commits were compacted into a classic
    parquet checkpoint replays from the checkpoint + later JSON — the
    shape every real (10+-commit) Delta table has."""
    root = str(tmp_path / "cp")
    for name, vals in [("f5.parquet", [(50,)]), ("f6.parquet", [(60,)])]:
        _write_parquet(os.path.join(root, name), vals, ["v"])
    # checkpoint at version 5 holds f5; JSON commit 6 adds f6
    _write_checkpoint(root, 5, _cp_rows([("v", "long")], ["f5.parquet"]))
    _write_commit(
        root,
        6,
        [
            {
                "add": {
                    "path": "f6.parquet",
                    "partitionValues": {},
                    "size": 1,
                    "modificationTime": 0,
                    "dataChange": True,
                }
            }
        ],
    )
    assert {r["v"] for r in read_delta(spark, root).collect()} == {50, 60}
    assert delta_table_version(root) == 6
    # time travel to the checkpoint version itself
    assert {r["v"] for r in read_delta(spark, root, version=5).collect()} == {50}
    # a version before the checkpoint is unreachable -> loud error
    with pytest.raises(DeltaProtocolError, match="checkpoint"):
        read_delta(spark, root, version=3)


def test_checkpoint_multipart_and_incomplete(spark, tmp_path):
    root = str(tmp_path / "mp")
    for name, vals in [("a.parquet", [(1,)]), ("b.parquet", [(2,)])]:
        _write_parquet(os.path.join(root, name), vals, ["v"])
    rows = _cp_rows([("v", "long")], ["a.parquet", "b.parquet"])
    # two parts: rows [0:2] and [2:4]
    _write_checkpoint(root, 4, rows, parts=[(0, 2), (2, 2)])
    assert {r["v"] for r in read_delta(spark, root).collect()} == {1, 2}
    # an INCOMPLETE multi-part checkpoint must be ignored, not half-read
    root2 = str(tmp_path / "inc")
    _write_parquet(os.path.join(root2, "a.parquet"), [(1,)], ["v"])
    import pyarrow as pa
    import pyarrow.parquet as pq

    log2 = os.path.join(root2, "_delta_log")
    os.makedirs(log2, exist_ok=True)
    pq.write_table(
        pa.Table.from_pylist(rows[:2]),
        os.path.join(log2, f"{4:020d}.checkpoint.{1:010d}.{3:010d}.parquet"),
    )
    with pytest.raises(DeltaProtocolError, match="checkpoint"):
        read_delta(spark, root2)


def test_empty_after_removes(spark, tmp_path):
    root = str(tmp_path / "empty")
    _write_parquet(os.path.join(root, "f.parquet"), [(1,)], ["v"])
    _write_commit(
        root,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            _meta_action([("v", "long")]),
            {
                "add": {
                    "path": "f.parquet",
                    "partitionValues": {},
                    "size": 1,
                    "modificationTime": 0,
                    "dataChange": True,
                }
            },
        ],
    )
    _write_commit(
        root,
        1,
        [{"remove": {"path": "f.parquet", "deletionTimestamp": 1, "dataChange": True}}],
    )
    df = read_delta(spark, root)
    assert df.count() == 0
    assert df.columns == ["v"]


def test_high_partition_cardinality_single_scan(spark, tmp_path):
    """A 1,000-partition-value table must plan ONE parquet scan node
    (partition values attached via the broadcast path->values join), not
    a union branch per partition tuple — the plan shape that stalls
    Catalyst analysis for minutes on real date-partitioned tables."""
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "manyparts")
    os.makedirs(root, exist_ok=True)
    n = 1000
    adds = []
    for i in range(n):
        rel = f"day={i}/f{i}.parquet"
        os.makedirs(os.path.join(root, f"day={i}"), exist_ok=True)
        pq.write_table(
            pa.table({"v": [i]}),
            os.path.join(root, rel),
        )
        adds.append(
            {
                "add": {
                    "path": rel,
                    "partitionValues": {"day": str(i)},
                    "size": 1,
                    "modificationTime": 0,
                    "dataChange": True,
                }
            }
        )
    _write_commit(
        root,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            _meta_action([("v", "long"), ("day", "integer")], part_cols=["day"]),
        ]
        + adds,
    )
    t0 = time.perf_counter()
    df = read_delta(spark, root)
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan_secs = time.perf_counter() - t0
    # exactly one parquet scan; the partition-value side is a local frame
    assert plan.count("Scan parquet") == 1, plan[:2000]
    assert "Union" not in plan
    # Catalyst analysis+planning stays interactive, not minutes
    assert plan_secs < 20, f"plan took {plan_secs:.1f}s"
    # values still correct end-to-end: every row joined to its partition
    agg = df.selectExpr(
        "count(*) AS n",
        "count(DISTINCT day) AS d",
        "sum(CASE WHEN v = day THEN 1 ELSE 0 END) AS ok",
    ).collect()[0]
    assert (agg["n"], agg["d"], agg["ok"]) == (n, n, n)


def test_export_writes_checkpoint_and_replay_starts_there(spark, tmp_path):
    """A long exported history (>10 versions) gets a classic parquet
    checkpoint + _last_checkpoint at version 10; deleting commits 0-9
    PROVES the replay starts at the checkpoint, and the post-checkpoint
    JSON diffs still apply on top."""
    import pyspark.sql.functions as F

    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import export_delta_log
    from predicting_hospital_readmission_using_mimic_database_spark.sources.table import SnapshotTable

    root = str(tmp_path / "cptbl")
    t = SnapshotTable.create(
        spark, root, "k bigint, v double", bucket_key=["k"], num_buckets=4
    )
    t.append(
        spark.range(20).select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
    )
    assert export_delta_log(t) == 0
    for i in range(1, 13):  # versions 1..12: one upserted row each
        t.merge(spark.createDataFrame([(int(i), float(-i))], "k bigint, v double"))
        assert export_delta_log(t) == i
    log = os.path.join(root, "_delta_log")
    cp = os.path.join(log, f"{10:020d}.checkpoint.parquet")
    assert os.path.exists(cp)
    with open(os.path.join(log, "_last_checkpoint")) as f:
        ptr = json.load(f)
    assert ptr["version"] == 10
    expect = {i: float(-i) if 1 <= i <= 12 else float(i) for i in range(20)}
    got = {r["k"]: r["v"] for r in read_delta(spark, root).collect()}
    assert got == expect
    # vacuum the pre-checkpoint JSON commits: replay MUST start at the
    # checkpoint (a reader replaying from 0 would now fail)
    for v in range(10):
        os.remove(os.path.join(log, f"{v:020d}.json"))
    got2 = {r["k"]: r["v"] for r in read_delta(spark, root).collect()}
    assert got2 == expect
    # time travel to the checkpoint version itself and one past it
    at10 = {r["k"]: r["v"] for r in read_delta(spark, root, version=10).collect()}
    assert at10[10] == -10.0 and at10[11] == 11.0 and at10[12] == 12.0
    at11 = {r["k"]: r["v"] for r in read_delta(spark, root, version=11).collect()}
    assert at11[11] == -11.0 and at11[12] == 12.0
    # pre-checkpoint versions are honestly unreconstructable now
    with pytest.raises(DeltaProtocolError, match="checkpoint"):
        read_delta(spark, root, version=5)


def test_column_mapping_name_mode(spark, tmp_path):
    """Column mapping 'name' mode (what Spark writes after any column
    rename): data files store physical col-<uuid> names — nested struct
    fields included — and partitionValues are keyed by physical name;
    the read restores the LOGICAL schema and values exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "cmname")
    os.makedirs(root, exist_ok=True)
    # physical parquet: col-aaa (id), col-bbb (struct{col-x, col-y})
    inner = pa.struct([("col-x", pa.int64()), ("col-y", pa.string())])
    pq.write_table(
        pa.table(
            {
                "col-aaa": pa.array([1, 2], type=pa.int64()),
                "col-bbb": pa.array(
                    [{"col-x": 10, "col-y": "u"}, {"col-x": 20, "col-y": "v"}],
                    type=inner,
                ),
            }
        ),
        os.path.join(root, "fA.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "col-aaa": pa.array([3], type=pa.int64()),
                "col-bbb": pa.array([{"col-x": 30, "col-y": "w"}], type=inner),
            }
        ),
        os.path.join(root, "fB.parquet"),
    )

    def fld(name, typ, phys, cid):
        return {
            "name": name, "type": typ, "nullable": True,
            "metadata": {
                "delta.columnMapping.id": cid,
                "delta.columnMapping.physicalName": phys,
            },
        }

    schema_string = json.dumps(
        {
            "type": "struct",
            "fields": [
                fld("id", "long", "col-aaa", 1),
                fld(
                    "info",
                    {
                        "type": "struct",
                        "fields": [
                            fld("x", "long", "col-x", 3),
                            fld("y", "string", "col-y", 4),
                        ],
                    },
                    "col-bbb",
                    2,
                ),
                fld("seg", "string", "col-ccc", 5),
            ],
        }
    )
    _write_commit(
        root,
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {
                "metaData": {
                    "id": "cm",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema_string,
                    "partitionColumns": ["seg"],  # logical serialization
                    "configuration": {"delta.columnMapping.mode": "name"},
                }
            },
            {
                "add": {
                    "path": "fA.parquet",
                    # spec: partitionValues keyed by PHYSICAL name
                    "partitionValues": {"col-ccc": "A"},
                    "size": 1, "modificationTime": 0, "dataChange": True,
                }
            },
            {
                "add": {
                    "path": "fB.parquet",
                    "partitionValues": {"col-ccc": "B"},
                    "size": 1, "modificationTime": 0, "dataChange": True,
                }
            },
        ],
    )
    df = read_delta(spark, root)
    assert df.columns == ["id", "info", "seg"]
    assert df.schema["info"].dataType.names == ["x", "y"]
    got = {
        (r["id"], r["info"]["x"], r["info"]["y"], r["seg"])
        for r in df.collect()
    }
    assert got == {(1, 10, "u", "A"), (2, 20, "v", "A"), (3, 30, "w", "B")}
    # metadata-level pruning by LOGICAL partition name still works
    b = read_delta(spark, root, partitions={"seg": "B"})
    assert [r["id"] for r in b.collect()] == [3]
    assert len(b.inputFiles()) == 1


def test_dv_codec_roundtrip_and_containers():
    """From-spec roaring/Z85 codec: array, bitset (>4096 values), and
    multi-bitmap (>32-bit) positions round-trip; the run-container READ
    path decodes a hand-packed run bitmap; CRC corruption raises."""
    import struct

    from predicting_hospital_readmission_using_mimic_database_spark.sources.dv import (
        MAGIC,
        roaring64_read,
        roaring64_write,
        z85_decode,
        z85_encode,
    )

    # Z85 reference vector from the ZeroMQ spec (rfc.zeromq.org/spec/32)
    assert z85_encode(bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])) == "HelloWorld"
    assert z85_decode("HelloWorld") == bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    small = [0, 1, 7, 65536, 65537, 131071]
    big = list(range(5000))                      # forces a bitset container
    hi = [(1 << 32) + 5, (2 << 32) + 123456]     # multi-bitmap indices
    for vals in (small, big, hi, small + big + hi):
        assert roaring64_read(roaring64_write(vals)) == sorted(set(vals))
    # run-container read: cookie 12347, 1 container, run flag set,
    # runs [(10, len 2), (100, len 0)] -> {10, 11, 12, 100}
    buf = struct.pack("<I", 12347 | (0 << 16))   # size-1=0 in upper bits
    buf += bytes([1])                            # run flag bitset
    buf += struct.pack("<HH", 0, 3)              # key 0, card-1
    buf += struct.pack("<H", 2)                  # n_runs
    buf += struct.pack("<HH", 10, 2) + struct.pack("<HH", 100, 0)
    data = struct.pack("<Iq", MAGIC, 1) + buf
    assert roaring64_read(data) == [10, 11, 12, 100]


def test_deletion_vectors_applied(spark, tmp_path):
    """DVs in all three storage flavors delete exactly their row
    ordinals; a later re-add WITHOUT a vector resurrects the rows
    (compaction semantics); corrupted CRC raises."""
    import uuid as _uuid

    from predicting_hospital_readmission_using_mimic_database_spark.sources.dv import (
        roaring64_write,
        write_dv_file,
        z85_encode,
    )

    root = str(tmp_path / "dvt")
    _write_parquet(
        os.path.join(root, "fa.parquet"),
        [(i, float(i)) for i in range(10)],
        ["id", "bal"],
    )
    _write_parquet(
        os.path.join(root, "seg=B", "fb.parquet"),
        [(100 + i, float(i)) for i in range(6)],
        ["id", "bal"],
    )
    os.makedirs(os.path.join(root, "ab"), exist_ok=True)
    # storageType "p": absolute path, rows 1,3,5 of fa
    desc_p = write_dv_file(os.path.join(root, "dv_a.bin"), [1, 3, 5])
    # storageType "i": inline bytes, rows 0 and 4 of fb
    inline = roaring64_write([0, 4])
    pad = (-len(inline)) % 4
    desc_i = {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(inline + b"\x00" * pad),
        "sizeInBytes": len(inline) + pad,
        # cardinality omitted on purpose: decode must not require it
    }
    fields = [("id", "long"), ("bal", "double"), ("seg", "string")]
    _write_commit(
        root,
        0,
        [
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                          "readerFeatures": ["deletionVectors"]}},
            _meta_action(fields, part_cols=["seg"]),
            {"add": {"path": "fa.parquet", "partitionValues": {"seg": "A"},
                     "size": 1, "modificationTime": 0, "dataChange": True,
                     "deletionVector": desc_p}},
            {"add": {"path": "seg=B/fb.parquet",
                     "partitionValues": {"seg": "B"},
                     "size": 1, "modificationTime": 0, "dataChange": True,
                     "deletionVector": desc_i}},
        ],
    )
    got = {(r["id"], r["seg"]) for r in read_delta(spark, root).collect()}
    want_a = {(i, "A") for i in range(10) if i not in (1, 3, 5)}
    want_b = {(100 + i, "B") for i in range(6) if i not in (0, 4)}
    assert got == want_a | want_b
    # storageType "u": uuid-named file under the random prefix dir
    u = _uuid.uuid4()
    write_dv_file(
        os.path.join(root, "ab", f"deletion_vector_{u}.bin"), [2]
    )
    desc_u = {
        "storageType": "u",
        "pathOrInlineDv": "ab" + z85_encode(u.bytes),
        "offset": 1,
        "sizeInBytes": 1,
        "cardinality": 1,
    }
    _write_commit(
        root,
        1,
        [
            {"add": {"path": "fa.parquet", "partitionValues": {"seg": "A"},
                     "size": 1, "modificationTime": 1, "dataChange": False,
                     "deletionVector": desc_u}},
        ],
    )
    # v1 REPLACES fa's vector: now only row 2 deleted in A
    got1 = {r["id"] for r in read_delta(spark, root).collect() if r["seg"] == "A"}
    assert got1 == {i for i in range(10) if i != 2}
    # time travel to v0 re-applies the old vector
    got0 = {r["id"] for r in read_delta(spark, root, version=0).collect()
            if r["seg"] == "A"}
    assert got0 == {i for i in range(10) if i not in (1, 3, 5)}
    # v2 re-adds fa WITHOUT a vector -> all rows back (compaction shape)
    _write_commit(
        root,
        2,
        [
            {"add": {"path": "fa.parquet", "partitionValues": {"seg": "A"},
                     "size": 1, "modificationTime": 2, "dataChange": False}},
        ],
    )
    assert read_delta(spark, root).count() == 10 + 4
    # corrupt the CRC of the absolute-path DV and pin the loud failure
    p = os.path.join(root, "dv_a.bin")
    blob = bytearray(open(p, "rb").read())
    blob[-1] ^= 0xFF
    open(p, "wb").write(bytes(blob))
    # the decode now runs inside Spark tasks: the ValueError surfaces
    # wrapped in the worker exception, message preserved
    with pytest.raises(Exception, match="CRC"):
        read_delta(spark, root, version=0).count()


def test_v2_checkpoint_replay(spark, tmp_path):
    """V2 checkpoints (manifest + sidecars, what newer Delta writers
    produce): the replay reconstructs the snapshot from the manifest's
    inlined actions plus every sidecar's add rows, then applies the
    post-checkpoint JSON commits; pre-checkpoint commits may be
    vacuumed. Both manifest formats (json and parquet) are covered, and
    a classic checkpoint at the same version wins (both are the same
    state)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    fields = [("v", "long")]

    def build(root, manifest_fmt):
        os.makedirs(os.path.join(root, "_delta_log", "_sidecars"), exist_ok=True)
        for i in range(4):
            _write_parquet(os.path.join(root, f"f{i}.parquet"), [(i,)], ["v"])
        log = os.path.join(root, "_delta_log")
        # two sidecars, two live adds each (f0 was removed pre-checkpoint
        # so it appears in NO sidecar)
        add_t = pa.struct(
            [
                ("path", pa.string()),
                ("partitionValues", pa.map_(pa.string(), pa.string())),
                ("size", pa.int64()),
                ("modificationTime", pa.int64()),
                ("dataChange", pa.bool_()),
            ]
        )

        def sidecar(name, paths):
            pq.write_table(
                pa.table(
                    {
                        "add": pa.array(
                            [
                                {
                                    "path": p,
                                    "partitionValues": {},
                                    "size": 1,
                                    "modificationTime": 0,
                                    "dataChange": False,
                                }
                                for p in paths
                            ],
                            type=add_t,
                        )
                    }
                ),
                os.path.join(log, "_sidecars", name),
            )

        sidecar("sc-1.parquet", ["f1.parquet", "f2.parquet"])
        sidecar("sc-2.parquet", ["f3.parquet"])
        proto = {"minReaderVersion": 3, "minWriterVersion": 7,
                 "readerFeatures": ["v2Checkpoint"]}
        meta = _meta_action(fields)["metaData"]
        if manifest_fmt == "json":
            with open(
                os.path.join(log, f"{2:020d}.checkpoint.aa11-bb22.json"), "w"
            ) as f:
                for a in (
                    {"checkpointMetadata": {"version": 2}},
                    {"protocol": proto},
                    {"metaData": meta},
                    {"sidecar": {"path": "sc-1.parquet", "sizeInBytes": 1}},
                    {"sidecar": {"path": "sc-2.parquet", "sizeInBytes": 1}},
                ):
                    f.write(json.dumps(a) + "\n")
        else:
            proto_t = pa.struct(
                [("minReaderVersion", pa.int32()),
                 ("minWriterVersion", pa.int32()),
                 ("readerFeatures", pa.list_(pa.string()))]
            )
            meta_t = pa.struct(
                [("id", pa.string()),
                 ("format", pa.struct([("provider", pa.string())])),
                 ("schemaString", pa.string()),
                 ("partitionColumns", pa.list_(pa.string())),
                 ("configuration", pa.map_(pa.string(), pa.string()))]
            )
            sc_t = pa.struct([("path", pa.string()), ("sizeInBytes", pa.int64())])
            meta_row = {
                "id": meta["id"],
                "format": {"provider": "parquet"},
                "schemaString": meta["schemaString"],
                "partitionColumns": [],
                "configuration": {},
            }
            pq.write_table(
                pa.table(
                    {
                        "protocol": pa.array([proto, None, None, None], type=proto_t),
                        "metaData": pa.array([None, meta_row, None, None], type=meta_t),
                        "sidecar": pa.array(
                            [None, None,
                             {"path": "sc-1.parquet", "sizeInBytes": 1},
                             {"path": "sc-2.parquet", "sizeInBytes": 1}],
                            type=sc_t,
                        ),
                    }
                ),
                os.path.join(log, f"{2:020d}.checkpoint.cc33-dd44.parquet"),
            )
        # post-checkpoint JSON commit 3: remove f3, no new adds
        _write_commit(
            root, 3,
            [{"remove": {"path": "f3.parquet", "deletionTimestamp": 0,
                         "dataChange": True}}],
        )
        return root

    for fmt in ("json", "parquet"):
        root = build(str(tmp_path / fmt), fmt)
        got = {r["v"] for r in read_delta(spark, root).collect()}
        assert got == {1, 2}, (fmt, got)              # f0 never added, f3 removed
        at2 = {r["v"] for r in read_delta(spark, root, version=2).collect()}
        assert at2 == {1, 2, 3}, fmt                  # checkpoint state itself
        assert delta_table_version(root) == 3, fmt
        with pytest.raises(DeltaProtocolError, match="checkpoint"):
            read_delta(spark, root, version=1)        # pre-checkpoint: vacuumed


def test_column_mapping_id_mode(spark, tmp_path):
    """Column mapping 'id' mode: columns resolve by the parquet FIELD
    IDS the writer stamped into the files — immune to physical-name
    drift across files (the post-rename shape name-based resolution
    cannot handle). Two files carry DIFFERENT physical names for the
    same field ids; the read must still line both up logically."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "cmid")
    os.makedirs(root, exist_ok=True)

    def pfile(path, names, ids, rows):
        sch = pa.schema(
            [
                pa.field(
                    n,
                    pa.int64() if i == 0 else pa.string(),
                    metadata={b"PARQUET:field_id": str(fid).encode()},
                )
                for i, (n, fid) in enumerate(zip(names, ids))
            ]
        )
        cols = list(zip(*rows))
        pq.write_table(
            pa.table({n: list(c) for n, c in zip(names, cols)}, schema=sch),
            os.path.join(root, path),
        )

    # old file: pre-rename physical names; new file: post-rename names
    pfile("old.parquet", ["col-aa", "col-bb"], [1, 2], [(1, "u"), (2, "v")])
    pfile("new.parquet", ["col-cc", "col-dd"], [1, 2], [(3, "w")])

    def fld(name, typ, phys, cid):
        return {
            "name": name, "type": typ, "nullable": True,
            "metadata": {
                "delta.columnMapping.id": cid,
                "delta.columnMapping.physicalName": phys,
            },
        }

    schema_string = json.dumps(
        {
            "type": "struct",
            "fields": [
                fld("id", "long", "col-cc", 1),
                fld("name", "string", "col-dd", 2),
                fld("seg", "string", "col-ee", 3),
            ],
        }
    )
    _write_commit(
        root,
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {
                "metaData": {
                    "id": "cmid",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema_string,
                    "partitionColumns": ["seg"],
                    "configuration": {"delta.columnMapping.mode": "id"},
                }
            },
            {"add": {"path": "old.parquet",
                     "partitionValues": {"col-ee": "X"},
                     "size": 1, "modificationTime": 0, "dataChange": True}},
            {"add": {"path": "new.parquet",
                     "partitionValues": {"col-ee": "Y"},
                     "size": 1, "modificationTime": 0, "dataChange": True}},
        ],
    )
    df = read_delta(spark, root)
    assert df.columns == ["id", "name", "seg"]
    got = {(r["id"], r["name"], r["seg"]) for r in df.collect()}
    assert got == {(1, "u", "X"), (2, "v", "X"), (3, "w", "Y")}
    y = read_delta(spark, root, partitions={"seg": "Y"})
    assert [r["id"] for r in y.collect()] == [3]


def test_timestamp_time_travel(spark, delta_root):
    """timestamp= resolves to the LAST commit at or before the requested
    time — commitInfo.timestamp when the writer recorded one, file
    mtime otherwise — and composes with the normal replay."""
    import time as _time

    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import version_at_timestamp

    log = os.path.join(delta_root, "_delta_log")
    # pin explicit commit timestamps via file mtimes: v0 at t0, v1 at t0+100s
    t0 = 1_600_000_000
    os.utime(os.path.join(log, f"{0:020d}.json"), (t0, t0))
    os.utime(os.path.join(log, f"{1:020d}.json"), (t0 + 100, t0 + 100))
    assert version_at_timestamp(delta_root, (t0 + 50) * 1000) == 0
    assert version_at_timestamp(delta_root, (t0 + 100) * 1000) == 1
    old = {(r["id"], r["bal"]) for r in
           read_delta(spark, delta_root, timestamp=(t0 + 50) * 1000).collect()}
    assert old == {(0, 5.0), (1, 6.0), (10, 7.0), (11, 8.0)}
    with pytest.raises(ValueError, match="no commit at or before"):
        read_delta(spark, delta_root, timestamp=(t0 - 10) * 1000)
    with pytest.raises(ValueError, match="not both"):
        read_delta(spark, delta_root, version=0, timestamp=t0 * 1000)
    # commitInfo.timestamp takes precedence over mtime
    with open(os.path.join(log, f"{1:020d}.json")) as f:
        lines = f.read()
    with open(os.path.join(log, f"{1:020d}.json"), "w") as f:
        f.write(json.dumps({"commitInfo": {"timestamp": (t0 + 500) * 1000}}) + "\n")
        f.write(lines)
    os.utime(os.path.join(log, f"{1:020d}.json"), (t0 + 100, t0 + 100))
    assert version_at_timestamp(delta_root, (t0 + 200) * 1000) == 0
    assert version_at_timestamp(delta_root, (t0 + 500) * 1000) == 1


def _rt_meta(mat=True):
    conf = {"delta.enableRowTracking": "true"}
    if mat:
        conf["delta.rowTracking.materializedRowIdColumnName"] = "_rid_mat"
        conf["delta.rowTracking.materializedRowCommitVersionColumnName"] = (
            "_rver_mat"
        )
    return _meta_action(
        [("k", "long"), ("bal", "long")], configuration=conf
    )


def test_row_tracking_fresh_and_materialized(spark, tmp_path):
    """rowTracking: fresh _row_id = baseRowId + position; a file whose
    rows carry MATERIALIZED lineage columns (rewritten rows keeping
    their identity) serves the STORED values, with fresh as the
    per-row fallback (the spec's coalesce)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "rt")
    _write_parquet(
        os.path.join(root, "a.parquet"), [(1, 10), (2, 20)], ["k", "bal"]
    )
    # rewritten file: k=2's row keeps its ORIGINAL id 101 / version 0
    # via materialized columns; k=3 is new (NULL mat -> fresh values)
    os.makedirs(root, exist_ok=True)
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
        {"remove": {"path": "a.parquet", "dataChange": True}},
        {"add": {"path": "b.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "baseRowId": 200, "defaultRowCommitVersion": 1}},
    ])
    got = {
        r["k"]: (r["_row_id"], r["_row_commit_version"])
        for r in read_delta(spark, root, row_tracking=True).collect()
    }
    # k=2 kept its ORIGINAL identity through the rewrite; k=3 is fresh
    assert got == {2: (101, 0), 3: (201, 1)}
    # time travel to v0 serves the fresh ids of the original file
    got0 = {
        r["k"]: (r["_row_id"], r["_row_commit_version"])
        for r in read_delta(
            spark, root, version=0, row_tracking=True
        ).collect()
    }
    assert got0 == {1: (100, 0), 2: (101, 0)}
    # without the flag the columns don't appear
    assert "_row_id" not in read_delta(spark, root).columns


def test_row_tracking_composes_with_dv(spark, tmp_path):
    """A deletion vector removes its row without renumbering survivors
    (fresh ids are physical positions)."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.dv import (
        roaring64_write,
        z85_encode,
    )

    def _dv_inline_descriptor(positions):
        inline = roaring64_write(positions)
        pad = (-len(inline)) % 4
        return {
            "storageType": "i",
            "pathOrInlineDv": z85_encode(inline + b"\x00" * pad),
            "sizeInBytes": len(inline) + pad,
        }

    root = str(tmp_path / "rtdv")
    _write_parquet(
        os.path.join(root, "a.parquet"),
        [(1, 10), (2, 20), (3, 30)], ["k", "bal"],
    )
    _write_commit(root, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["rowTracking", "deletionVectors"]}},
        _rt_meta(mat=False),
        {"add": {"path": "a.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "baseRowId": 50, "defaultRowCommitVersion": 0,
                 "deletionVector": _dv_inline_descriptor([1])}},
    ])
    got = {
        r["k"]: r["_row_id"]
        for r in read_delta(spark, root, row_tracking=True).collect()
    }
    assert got == {1: 50, 3: 52}  # k=2 gone, survivors unrenumbered


def test_row_tracking_gates(spark, tmp_path):
    """row_tracking without the table property raises; enabled tables
    whose live files lack the stamps raise (never silent NULL ids)."""
    root = str(tmp_path / "rtg")
    _write_parquet(os.path.join(root, "a.parquet"), [(1, 10)], ["k", "bal"])
    _write_commit(root, 0, [
        _meta_action([("k", "long"), ("bal", "long")]),
        {"add": {"path": "a.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ])
    with pytest.raises(DeltaProtocolError, match="enableRowTracking"):
        read_delta(spark, root, row_tracking=True)
    root2 = str(tmp_path / "rtg2")
    _write_parquet(os.path.join(root2, "a.parquet"), [(1, 10)], ["k", "bal"])
    _write_commit(root2, 0, [
        _rt_meta(mat=False),
        {"add": {"path": "a.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ])
    with pytest.raises(DeltaProtocolError, match="baseRowId"):
        read_delta(spark, root2, row_tracking=True)


def test_in_commit_timestamp_travel(spark, tmp_path):
    """The inCommitTimestamp writer feature: when commitInfo carries
    ``inCommitTimestamp``, timestamp travel MUST use it — file mtimes
    shift on copy/restore, the ICT is what the writer committed. Pinned
    against mtime-based resolution ON THE SAME LOG: the mtimes say
    'now', the ICTs say 2020, and travel follows the ICTs. Commits
    before the feature's enablement keep the mtime/commitInfo.timestamp
    path; an ICT regression raises."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import (
        version_at_timestamp,
    )

    root = str(tmp_path / "ict")
    t0 = 1_577_836_800_000  # 2020-01-01 in millis; file mtimes are ~now
    _write_parquet(os.path.join(root, "a.parquet"), [(1, 1.0)], ["id", "bal"])
    _write_parquet(os.path.join(root, "b.parquet"), [(2, 2.0)], ["id", "bal"])
    meta = _meta_action(
        [("id", "long"), ("bal", "double")],
        configuration={"delta.enableInCommitTimestamps": "true"},
    )
    _write_commit(root, 0, [
        {"commitInfo": {"inCommitTimestamp": t0}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 7,
                      "writerFeatures": ["inCommitTimestamp"]}},
        meta,
        {"add": {"path": "a.parquet", "partitionValues": {},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ])
    _write_commit(root, 1, [
        {"commitInfo": {"inCommitTimestamp": t0 + 100_000}},
        {"add": {"path": "b.parquet", "partitionValues": {},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ])
    # mtime-based resolution would see both commits at ~now and raise
    # for any 2020 timestamp; ICT-based resolution answers from 2020
    assert version_at_timestamp(root, t0 + 50_000) == 0
    assert version_at_timestamp(root, t0 + 100_000) == 1
    old = {r["id"] for r in
           read_delta(spark, root, timestamp=t0 + 50_000).collect()}
    assert old == {1}
    with pytest.raises(ValueError, match="no commit at or before"):
        version_at_timestamp(root, t0 - 1)
    # mixed enablement: a PRE-feature commit without ICT resolves via
    # mtime, later ICT commits via their ICTs — on the same log
    root2 = str(tmp_path / "ict2")
    _write_parquet(os.path.join(root2, "a.parquet"), [(1, 1.0)], ["id", "bal"])
    _write_commit(root2, 0, [
        _meta_action([("id", "long"), ("bal", "double")]),
        {"add": {"path": "a.parquet", "partitionValues": {},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ])
    tm = 1_500_000_000  # seconds
    os.utime(os.path.join(root2, "_delta_log", f"{0:020d}.json"), (tm, tm))
    _write_commit(root2, 1, [
        {"commitInfo": {"inCommitTimestamp": (tm + 500) * 1000}},
        {"add": {"path": "a.parquet", "partitionValues": {},
                 "size": 1, "modificationTime": 0, "dataChange": False}},
    ])
    assert version_at_timestamp(root2, (tm + 100) * 1000) == 0
    assert version_at_timestamp(root2, (tm + 500) * 1000) == 1
    # a regressing ICT is malformed metadata: raise, never mis-resolve
    _write_commit(root2, 2, [
        {"commitInfo": {"inCommitTimestamp": (tm + 100) * 1000}},
        {"add": {"path": "a.parquet", "partitionValues": {},
                 "size": 1, "modificationTime": 0, "dataChange": False}},
    ])
    with pytest.raises(DeltaProtocolError, match="regressed"):
        version_at_timestamp(root2, (tm + 600) * 1000)


def test_plus_sign_in_path_dv_and_partition_attach(spark, tmp_path):
    """A literal '+' in the table/file path must survive the scan-key
    decode (bare F.url_decode is FORM-urlencoded and turns '+' into a
    space, silently breaking both scan-key joins): the DV anti-join
    still drops its rows and the partition broadcast join still
    attaches values instead of NULLs."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.dv import (
        write_dv_file,
    )

    root = str(tmp_path / "t+plus" / "dv+tbl")
    _write_parquet(
        os.path.join(root, "seg=a+b", "f0.parquet"),
        [(i, float(i)) for i in range(6)],
        ["id", "bal"],
    )
    desc = write_dv_file(os.path.join(root, "dv0.bin"), [1, 4])
    fields = [("id", "long"), ("bal", "double"), ("seg", "string")]
    _write_commit(
        root,
        0,
        [
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                          "readerFeatures": ["deletionVectors"]}},
            _meta_action(fields, part_cols=["seg"]),
            {"add": {"path": "seg=a+b/f0.parquet",
                     "partitionValues": {"seg": "a+b"},
                     "size": 1, "modificationTime": 0, "dataChange": True,
                     "deletionVector": desc}},
        ],
    )
    rows = read_delta(spark, root).collect()
    assert {r["id"] for r in rows} == {0, 2, 3, 5}
    assert {r["seg"] for r in rows} == {"a+b"}


def test_dv_decode_runs_on_executors_not_driver(spark, tmp_path, monkeypatch):
    """A synthetic ~1.2M-position deletion vector: the roaring decode
    must happen inside Spark tasks (python workers), never as a
    driver-side position list — read_dv_descriptor is monkeypatched to
    explode in the DRIVER process, and the read must still succeed
    (separate worker interpreters import the real codec)."""
    import predicting_hospital_readmission_using_mimic_database_spark.sources.dv as dvmod
    from predicting_hospital_readmission_using_mimic_database_spark.sources.dv import (
        write_dv_file,
    )

    root = str(tmp_path / "bigdv")
    _write_parquet(
        os.path.join(root, "fa.parquet"),
        [(i, float(i)) for i in range(10)],
        ["id", "bal"],
    )
    _write_parquet(
        os.path.join(root, "fb.parquet"),
        [(100 + i, float(i)) for i in range(4)],
        ["id", "bal"],
    )
    # dense 1.2M-position vector; only the file's 10 ordinals can match
    desc = write_dv_file(
        os.path.join(root, "dv_big.bin"), list(range(1_200_000))
    )
    fields = [("id", "long"), ("bal", "double")]
    _write_commit(
        root,
        0,
        [
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                          "readerFeatures": ["deletionVectors"]}},
            _meta_action(fields),
            {"add": {"path": "fa.parquet", "partitionValues": {},
                     "size": 1, "modificationTime": 0, "dataChange": True,
                     "deletionVector": desc}},
            {"add": {"path": "fb.parquet", "partitionValues": {},
                     "size": 1, "modificationTime": 0, "dataChange": True}},
        ],
    )

    def _driver_decode_forbidden(*a, **k):
        raise AssertionError(
            "deletion vector decoded on the DRIVER (position list "
            "materialized driver-side)"
        )

    monkeypatch.setattr(dvmod, "read_dv_descriptor", _driver_decode_forbidden)
    got = {r["id"] for r in read_delta(spark, root).collect()}
    assert got == {100, 101, 102, 103}  # fa fully deleted, fb untouched


def test_stats_data_skipping(spark, tmp_path):
    """predicates= prunes files via the add actions' stats bounds
    (Delta data skipping): excluded files never reach the plan, files
    without stats are conservatively kept, incomparable types never
    prune, unknown columns/ops raise."""
    root = str(tmp_path / "skip")
    for i, lo in enumerate((0, 10, 20)):
        _write_parquet(
            os.path.join(root, f"f{i}.parquet"),
            [(k, float(k)) for k in range(lo, lo + 10)],
            ["id", "bal"],
        )
    _write_parquet(
        os.path.join(root, "nostats.parquet"), [(99, 9.0)], ["id", "bal"]
    )
    fields = [("id", "long"), ("bal", "double")]

    def add(path, lo, hi):
        return {"add": {"path": path, "partitionValues": {}, "size": 1,
                        "dataChange": True,
                        "stats": json.dumps({
                            "numRecords": 10,
                            "minValues": {"id": lo, "bal": float(lo)},
                            "maxValues": {"id": hi, "bal": float(hi)},
                        })}}

    _write_commit(
        root, 0,
        [{"protocol": {"minReaderVersion": 1}}, _meta_action(fields),
         add("f0.parquet", 0, 9), add("f1.parquet", 10, 19),
         add("f2.parquet", 20, 29),
         {"add": {"path": "nostats.parquet", "partitionValues": {},
                  "size": 1, "dataChange": True}}],
    )
    df = read_delta(spark, root, predicates=[("id", ">=", 20)])
    files = {os.path.basename(f) for f in df.inputFiles()}
    # f0/f1 provably excluded; the stats-less file must stay
    assert files == {"f2.parquet", "nostats.parquet"}, files
    assert {r["id"] for r in df.filter("id >= 20").collect()} == set(
        range(20, 30)
    ) | {99}
    eq = read_delta(spark, root, predicates=[("id", "=", 12)])
    assert {os.path.basename(f) for f in eq.inputFiles()} == {
        "f1.parquet", "nostats.parquet"
    }
    # conjunctive: empty intersection prunes every stats-carrying file
    none = read_delta(
        spark, root, predicates=[("id", ">", 9), ("id", "<", 10)]
    )
    assert {os.path.basename(f) for f in none.inputFiles()} == {
        "nostats.parquet"
    }
    # incomparable type: conservative keep, result still correct
    oddball = read_delta(spark, root, predicates=[("id", ">=", "20")])
    assert len(oddball.inputFiles()) == 4
    with pytest.raises(ValueError, match="unknown column"):
        read_delta(spark, root, predicates=[("nope", "=", 1)])
    with pytest.raises(ValueError, match="unsupported predicate op"):
        read_delta(spark, root, predicates=[("id", "!=", 1)])


def test_stats_skip_never_over_prunes_property():
    """Property: a file whose rows were generated INSIDE its logged
    bounds is pruned only when none of its rows can match the
    predicates — brute-force row check as the oracle."""
    import json as _json
    import random

    from pyspark.sql.types import LongType, StructField, StructType

    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import (
        _stats_skip,
    )

    schema = StructType([StructField("x", LongType(), True)])
    pv_key_of = {"x": "x"}
    rng = random.Random(11)
    ops = ("<", "<=", "=", "==", ">=", ">")

    def matches(v, op, w):
        return {
            "<": v < w, "<=": v <= w, "=": v == w, "==": v == w,
            ">=": v >= w, ">": v > w,
        }[op]

    for _trial in range(400):
        live, stats_of, rows_of = {}, {}, {}
        for i in range(rng.randint(1, 6)):
            rel = f"f{i}"
            lo = rng.randint(-10, 10)
            hi = lo + rng.randint(0, 8)
            rows = [rng.randint(lo, hi) for _ in range(rng.randint(1, 5))]
            # logged bounds may be WIDER than the rows (writers round)
            live[rel] = {}
            rows_of[rel] = rows
            if rng.random() < 0.15:
                pass  # no stats recorded
            else:
                stats_of[rel] = _json.dumps(
                    {"minValues": {"x": lo - rng.randint(0, 2)},
                     "maxValues": {"x": hi + rng.randint(0, 2)}}
                )
        preds = [
            ("x", rng.choice(ops), rng.randint(-12, 12))
            for _ in range(rng.randint(1, 3))
        ]
        kept = _stats_skip(live, stats_of, preds, schema, pv_key_of)
        for rel, rows in rows_of.items():
            has_match = any(
                all(matches(v, op, w) for _c, op, w in preds) for v in rows
            )
            if has_match:
                assert rel in kept, (rel, rows, preds, stats_of.get(rel))


def test_export_emits_skippable_stats(spark, tmp_path):
    """export_delta_log carries SnapshotTable's harvested footer stats
    into the add actions' minValues/maxValues, so the exported table
    data-skips through read_delta(predicates=) — the full interop
    round trip of the skipping surface."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import (
        export_delta_log,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.table import (
        SnapshotTable,
    )
    import pyspark.sql.functions as F

    root = str(tmp_path / "expstats")
    t = SnapshotTable.create(
        spark, root, "k bigint, v double", stats_cols=["k"]
    )
    # three appends with disjoint k ranges -> three stats-carrying files
    for lo in (0, 100, 200):
        t.append(
            spark.range(lo, lo + 10).select(
                F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
            ).coalesce(1)
        )
    export_delta_log(t)
    df = read_delta(spark, root, predicates=[("k", ">=", 200)])
    assert len(df.inputFiles()) == 1
    assert {r["k"] for r in df.collect()} == set(range(200, 210))
    # equality inside the middle range
    mid = read_delta(spark, root, predicates=[("k", "=", 105)])
    assert len(mid.inputFiles()) == 1


# ---------------------------------------------------------------------------
# type widening (reader feature)
# ---------------------------------------------------------------------------


def _widening_meta():
    """Post-widening metaData: int->long, float->double,
    decimal(5,2)->decimal(10,2), with the feature's delta.typeChanges
    history on each field."""
    schema = {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True,
             "metadata": {"delta.typeChanges": [
                 {"fromType": "integer", "toType": "long",
                  "tableVersion": 1}]}},
            {"name": "f", "type": "double", "nullable": True,
             "metadata": {"delta.typeChanges": [
                 {"fromType": "float", "toType": "double",
                  "tableVersion": 1}]}},
            {"name": "dec", "type": "decimal(10,2)", "nullable": True,
             "metadata": {"delta.typeChanges": [
                 {"fromType": "decimal(5,2)", "toType": "decimal(10,2)",
                  "tableVersion": 1}]}},
        ],
    }
    return {
        "metaData": {
            "id": "fixture",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": [],
            "configuration": {},
        }
    }


def _write_narrow_parquet(path):
    import decimal

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "k": pa.array([1, 2], pa.int32()),
                "f": pa.array([1.5, 2.5], pa.float32()),
                "dec": pa.array(
                    [decimal.Decimal("1.23"), decimal.Decimal("9.99")],
                    pa.decimal128(5, 2),
                ),
            }
        ),
        path,
    )


def test_type_widening_reads_old_physical_types(spark, tmp_path):
    """A table that widened int->long / float->double / decimal(5,2)->
    decimal(10,2): pre-widening files keep their NARROW physical types
    and must upcast in the scan (one scan node, no per-file branches);
    post-widening files read directly."""
    import decimal

    root = str(tmp_path / "widen")
    _write_narrow_parquet(os.path.join(root, "old.parquet"))
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "k": pa.array([10], pa.int64()),
                "f": pa.array([10.5], pa.float64()),
                "dec": pa.array(
                    [decimal.Decimal("12345678.90")], pa.decimal128(10, 2)
                ),
            }
        ),
        os.path.join(root, "new.parquet"),
    )
    _write_commit(
        root,
        0,
        [
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                          "readerFeatures": ["typeWidening"]}},
            _meta_action([("k", "integer"), ("f", "float"),
                          ("dec", "decimal(5,2)")]),
            {"add": {"path": "old.parquet", "partitionValues": {},
                     "size": 1, "modificationTime": 0, "dataChange": True}},
        ],
    )
    _write_commit(
        root,
        1,
        [
            _widening_meta(),
            {"add": {"path": "new.parquet", "partitionValues": {},
                     "size": 1, "modificationTime": 1, "dataChange": True}},
        ],
    )
    df = read_delta(spark, root)
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "bigint", "double", "decimal(10,2)"
    ]
    got = {(r["k"], r["f"], str(r["dec"])) for r in df.collect()}
    assert got == {
        (1, 1.5, "1.23"), (2, 2.5, "9.99"), (10, 10.5, "12345678.90")
    }
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    # pre-widening time travel serves the narrow schema
    old = read_delta(spark, root, version=0)
    assert [f.dataType.simpleString() for f in old.schema.fields] == [
        "int", "float", "decimal(5,2)"
    ]
    assert old.count() == 2


def test_type_widening_illegal_change_raises(spark, tmp_path):
    """A NARROWING smuggled into delta.typeChanges (long->int) raises
    instead of silently truncating through the native upcast path."""
    root = str(tmp_path / "narrow")
    _write_parquet(os.path.join(root, "a.parquet"), [(1, 1.0)], ["k", "f"])
    schema = {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "integer", "nullable": True,
             "metadata": {"delta.typeChanges": [
                 {"fromType": "long", "toType": "integer",
                  "tableVersion": 1}]}},
            {"name": "f", "type": "double", "nullable": True, "metadata": {}},
        ],
    }
    _write_commit(
        root,
        0,
        [
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                          "readerFeatures": ["typeWidening"]}},
            {"metaData": {"id": "fixture",
                          "format": {"provider": "parquet", "options": {}},
                          "schemaString": json.dumps(schema),
                          "partitionColumns": [], "configuration": {}}},
            {"add": {"path": "a.parquet", "partitionValues": {}, "size": 1,
                     "modificationTime": 0, "dataChange": True}},
        ],
    )
    with pytest.raises(DeltaProtocolError, match="not a legal type widening"):
        read_delta(spark, root)


def test_type_widening_composes_with_deletion_vectors(spark, tmp_path):
    """A deletion vector over a PRE-WIDENING file: the DV anti-join on
    _metadata.row_index and the native upcast share one scan."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.dv import (
        write_dv_file,
    )

    root = str(tmp_path / "widendv")
    _write_narrow_parquet(os.path.join(root, "old.parquet"))
    desc = write_dv_file(os.path.join(root, "dv0.bin"), [0])  # drop k=1
    _write_commit(
        root,
        0,
        [
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                          "readerFeatures": ["typeWidening",
                                             "deletionVectors"]}},
            _meta_action([("k", "integer"), ("f", "float"),
                          ("dec", "decimal(5,2)")]),
            {"add": {"path": "old.parquet", "partitionValues": {},
                     "size": 1, "modificationTime": 0, "dataChange": True}},
        ],
    )
    _write_commit(
        root,
        1,
        [
            _widening_meta(),
            {"remove": {"path": "old.parquet", "dataChange": True,
                        "deletionTimestamp": 1}},
            {"add": {"path": "old.parquet", "partitionValues": {},
                     "size": 1, "modificationTime": 1, "dataChange": True,
                     "deletionVector": desc}},
        ],
    )
    got = {(r["k"], r["f"]) for r in read_delta(spark, root).collect()}
    assert got == {(2, 2.5)}


def test_liquid_clustering_shaped_log_reads(spark, tmp_path):
    """Liquid clustering is writer-side: a clustered table's log
    carries domainMetadata actions and clusteredTable/domainMetadata
    WRITER features — none of which may trip the reader (unknown
    non-reader actions are ignored, writerFeatures never gate)."""
    root = str(tmp_path / "liquid")
    _write_parquet(os.path.join(root, "a.parquet"), [(1, 1.0), (2, 2.0)],
                   ["k", "bal"])
    _write_commit(
        root,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 7,
                          "writerFeatures": ["clusteredTable",
                                             "domainMetadata"]}},
            {"domainMetadata": {"domain": "delta.clustering",
                                "configuration": json.dumps(
                                    {"clusteringColumns": [["k"]]}),
                                "removed": False}},
            _meta_action([("k", "long"), ("bal", "double")]),
            {"add": {"path": "a.parquet", "partitionValues": {}, "size": 1,
                     "modificationTime": 0, "dataChange": True}},
        ],
    )
    assert {r["k"] for r in read_delta(spark, root).collect()} == {1, 2}


def test_export_stamps_in_commit_timestamps(spark, tmp_path):
    """export_delta_log declares the inCommitTimestamp feature from v0
    and stamps every commit with a strictly increasing ICT — so
    timestamp travel on exported logs survives file copies (mtime
    shifts) by construction."""
    import pyspark.sql.functions as F

    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import (
        export_delta_log,
        version_at_timestamp,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.table import (
        SnapshotTable,
    )

    root = str(tmp_path / "ict_exp")
    t = SnapshotTable.create(
        spark, root, "k bigint, v double", bucket_key=["k"], num_buckets=2
    )
    t.append(spark.range(4).select(F.col("id").alias("k"),
                                   (F.col("id") * 1.0).alias("v")))
    assert export_delta_log(t) == 0
    t.merge(spark.createDataFrame([(0, -9.0)], "k bigint, v double"))
    assert export_delta_log(t) == 1
    log = os.path.join(root, "_delta_log")
    icts = []
    for v in (0, 1):
        with open(os.path.join(log, f"{v:020d}.json")) as f:
            a = json.loads(f.readline())
        assert "commitInfo" in a and a["commitInfo"]["inCommitTimestamp"]
        icts.append(int(a["commitInfo"]["inCommitTimestamp"]))
    assert icts[1] > icts[0]
    with open(os.path.join(log, f"{0:020d}.json")) as f:
        lines = [json.loads(l) for l in f if l.strip()]
    proto = next(a["protocol"] for a in lines if "protocol" in a)
    assert "inCommitTimestamp" in proto.get("writerFeatures", [])
    # travel by ICT, with mtimes shoved far into the future
    for v in (0, 1):
        p = os.path.join(log, f"{v:020d}.json")
        os.utime(p, (4_000_000_000, 4_000_000_000))
    assert version_at_timestamp(root, icts[0]) == 0
    assert version_at_timestamp(root, icts[1]) == 1
    assert read_delta(spark, root, timestamp=icts[0]).count() == 4


def test_export_cdf_keyless_and_compaction(spark, tmp_path):
    """Export-side CDF without a bucket key falls back to the value-
    multiset diff (exceptAll both ways): overwriting with one row
    changed emits exactly one delete+insert pair, carried rows cancel.
    A pure compaction (same rows, fewer files) emits a cdc-carrying
    commit with ZERO change rows — not derived pairs for every row."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import (
        export_delta_log,
        read_delta_changes,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.table import (
        SnapshotTable,
    )

    root = str(tmp_path / "cdfless")
    t = SnapshotTable.create(spark, root, "k bigint, v string")
    t.append(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k bigint, v string"
        )
    )
    assert export_delta_log(t) == 0
    t.overwrite(
        spark.createDataFrame(
            [(1, "a"), (2, "B"), (3, "c")], "k bigint, v string"
        )
    )
    assert export_delta_log(t) == 1
    ch = read_delta_changes(spark, root, starting_version=1)
    got = sorted((r["k"], r["v"], r["_change_type"]) for r in ch.collect())
    assert got == [(2, "B", "insert"), (2, "b", "delete")]
    # keyed table, pure compaction: rows identical -> zero change rows
    root2 = str(tmp_path / "cdfcompact")
    t2 = SnapshotTable.create(
        spark, root2, "k bigint, v string", bucket_key=["k"], num_buckets=2
    )
    for i in range(3):
        t2.append(
            spark.createDataFrame([(10 + i, "x")], "k bigint, v string")
        )
    assert export_delta_log(t2) == 0
    t2.compact()
    assert export_delta_log(t2) == 1
    ch2 = read_delta_changes(spark, root2, starting_version=1)
    assert ch2.count() == 0
    # and the commit really is cdc-gated (not just change-free)
    import json as _json

    with open(os.path.join(root2, "_delta_log", f"{1:020d}.json")) as f:
        acts = [_json.loads(ln) for ln in f if ln.strip()]
    assert any("cdc" in a for a in acts)


def test_export_cdf_respects_legacy_logs(spark, tmp_path):
    """A log exported before CDF support (ICT-only metaData, the
    round-10 shape) must STAY CDF-free: later merge exports write no
    cdc actions, and the 10-version checkpoint reproduces the log's
    actual configuration instead of flipping the feature on (Delta
    requires checkpoint metaData to match the log). Duplicate keys
    disable the keyed image pairing (multiset diff instead of a
    fanned-out join)."""
    import pyarrow.parquet as pq

    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import (
        export_delta_log,
        read_delta,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.table import (
        SnapshotTable,
    )

    root = str(tmp_path / "legacy")
    t = SnapshotTable.create(
        spark, root, "k bigint, v long", bucket_key=["k"], num_buckets=2
    )
    t.append(spark.createDataFrame(
        [(i, 10 * i) for i in range(6)], "k bigint, v long"
    ))
    assert export_delta_log(t) == 0
    log = os.path.join(root, "_delta_log")
    v0 = os.path.join(log, f"{0:020d}.json")
    acts = [json.loads(ln) for ln in open(v0) if ln.strip()]
    for a in acts:  # doctor v0 into the pre-CDF (ICT-only) shape
        if "metaData" in a:
            a["metaData"]["configuration"].pop(
                "delta.enableChangeDataFeed"
            )
        if "protocol" in a:
            a["protocol"]["writerFeatures"] = ["inCommitTimestamp"]
    with open(v0, "w") as f:
        f.writelines(json.dumps(a) + "\n" for a in acts)
    # merge exports on the legacy log write NO cdc actions
    import pyspark.sql.functions as F

    t.merge(spark.createDataFrame([(1, 999)], "k bigint, v long"))
    assert export_delta_log(t) == 1
    acts1 = [json.loads(ln)
             for ln in open(os.path.join(log, f"{1:020d}.json"))
             if ln.strip()]
    assert not any("cdc" in a for a in acts1)
    assert not os.path.isdir(os.path.join(root, "_change_data"))
    # drive to the version-10 checkpoint: its metaData must reproduce
    # the legacy configuration (ICT only)
    for i in range(9):
        t.merge(spark.createDataFrame([(2, 100 + i)], "k bigint, v long"))
        export_delta_log(t)
    cp = os.path.join(log, f"{10:020d}.checkpoint.parquet")
    assert os.path.exists(cp)
    metas = [
        m for m in pq.read_table(cp).to_pylist() if m.get("metaData")
    ]
    conf = dict(metas[0]["metaData"]["configuration"] or {})
    assert conf.get("delta.enableInCommitTimestamps") == "true"
    assert "delta.enableChangeDataFeed" not in conf
    assert read_delta(spark, root).count() == 6


def test_export_cdf_duplicate_keys_fall_back_to_multiset(spark, tmp_path):
    """Duplicate bucket keys would fan the keyed full-outer image join
    out into invented update pairs; the exporter detects them and
    falls back to the exact multiset diff (insert/delete images)."""
    import pyspark.sql.functions as F

    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import (
        export_delta_log,
        read_delta_changes,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.table import (
        SnapshotTable,
    )

    root = str(tmp_path / "dupk")
    t = SnapshotTable.create(
        spark, root, "k bigint, v long", bucket_key=["k"], num_buckets=1
    )
    # appends don't enforce key uniqueness: k=7 lands twice
    t.append(spark.createDataFrame(
        [(7, 1), (7, 2), (8, 80)], "k bigint, v long"
    ))
    assert export_delta_log(t) == 0
    t.overwrite(spark.createDataFrame(
        [(7, 1), (7, 3), (8, 80)], "k bigint, v long"
    ))
    assert export_delta_log(t) == 1
    ch = read_delta_changes(spark, root, starting_version=1)
    got = sorted((r["k"], r["v"], r["_change_type"]) for r in ch.collect())
    # exact multiset semantics: (7,1) and (8,80) carried and CANCEL
    assert got == [(7, 2, "delete"), (7, 3, "insert")]


def test_truncate_delta_log_retention(spark, tmp_path):
    """truncate_delta_log: JSON commits (and older checkpoints) below
    the newest checkpoint serving the retention window are deleted;
    retained time travel and the live read replay unchanged; reads
    below the cut raise the EXISTING honest gates (no-checkpoint for
    time travel, missing-commit for CDF); a checkpointless log is a
    no-op."""
    import pyspark.sql.functions as F

    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import (
        export_delta_log,
        read_delta_changes,
        truncate_delta_log,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.table import (
        SnapshotTable,
    )

    root = str(tmp_path / "trunc")
    t = SnapshotTable.create(
        spark, root, "k bigint, v double", bucket_key=["k"], num_buckets=2
    )
    t.append(spark.range(10).select(F.col("id").alias("k"),
                                    (F.col("id") * 1.0).alias("v")))
    assert export_delta_log(t, checkpoint_interval=4) == 0
    for i in range(1, 10):  # versions 1..9; checkpoints at 4 and 8
        t.merge(spark.createDataFrame([(int(i), float(-i))],
                                      "k bigint, v double"))
        export_delta_log(t, checkpoint_interval=4)
    log = os.path.join(root, "_delta_log")
    assert os.path.exists(os.path.join(log, f"{4:020d}.checkpoint.parquet"))
    assert os.path.exists(os.path.join(log, f"{8:020d}.checkpoint.parquet"))
    # keep the last 3 versions (7..9): the cut lands on checkpoint 4
    # (newest checkpoint <= horizon 7), versions 0-3 go
    deleted = truncate_delta_log(t, keep_versions=3)
    assert deleted == [0, 1, 2, 3]
    expect = {i: float(-i) if 1 <= i <= 9 else float(i) for i in range(10)}
    assert {r["k"]: r["v"] for r in read_delta(spark, root).collect()} == expect
    # retained time travel replays from the kept checkpoint
    at5 = {r["k"]: r["v"] for r in read_delta(spark, root, version=5).collect()}
    assert at5[5] == -5.0 and at5[6] == 6.0
    at4 = read_delta(spark, root, version=4)
    assert at4.count() == 10
    # below the cut: the existing honest gates fire
    with pytest.raises(DeltaProtocolError, match="checkpoint"):
        read_delta(spark, root, version=3)
    with pytest.raises(DeltaProtocolError, match="missing commit"):
        read_delta_changes(spark, root, starting_version=1,
                           ending_version=5).collect()
    # CDF over the retained tail still serves
    assert read_delta_changes(spark, root, starting_version=8).count() > 0
    # nothing left below the horizon's checkpoint: no-op
    assert truncate_delta_log(t, keep_versions=3) == []
    # a checkpointless log never truncates
    root2 = str(tmp_path / "nocp")
    t2 = SnapshotTable.create(spark, root2, "k bigint",
                              bucket_key=["k"], num_buckets=1)
    t2.append(spark.range(3).coalesce(1).select(F.col("id").alias("k")))
    export_delta_log(t2, checkpoint_interval=100)
    assert truncate_delta_log(t2, keep_versions=1) == []
    with pytest.raises(ValueError, match="keep_versions"):
        truncate_delta_log(t2, keep_versions=0)


def test_truncate_deletes_v2_manifests_and_unshared_sidecars(spark, tmp_path):
    """truncate_delta_log on V2 checkpoints: every manifest of a
    dropped version goes, sidecars referenced ONLY by dropped
    manifests go, and sidecars SHARED with a retained checkpoint
    survive (the spec allows cross-checkpoint sharing)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import (
        truncate_delta_log,
    )

    root = str(tmp_path / "v2t")
    log = os.path.join(root, "_delta_log")
    os.makedirs(os.path.join(log, "_sidecars"))
    for i in range(1, 6):
        _write_parquet(os.path.join(root, f"f{i}.parquet"), [(i,)], ["v"])
    add_t = pa.struct(
        [("path", pa.string()),
         ("partitionValues", pa.map_(pa.string(), pa.string())),
         ("size", pa.int64()), ("modificationTime", pa.int64()),
         ("dataChange", pa.bool_())]
    )

    def sidecar(name, paths):
        pq.write_table(
            pa.table({"add": pa.array(
                [{"path": p, "partitionValues": {}, "size": 1,
                  "modificationTime": 0, "dataChange": False}
                 for p in paths], type=add_t)}),
            os.path.join(log, "_sidecars", name),
        )

    sidecar("sc-1.parquet", ["f1.parquet"])
    sidecar("sc-2.parquet", ["f2.parquet"])
    sidecar("sc-3.parquet", ["f3.parquet", "f4.parquet"])
    proto = {"minReaderVersion": 3, "minWriterVersion": 7,
             "readerFeatures": ["v2Checkpoint"]}
    meta = _meta_action([("v", "long")])["metaData"]

    def v2cp(version, uniq, sidecars):
        with open(
            os.path.join(log, f"{version:020d}.checkpoint.{uniq}.json"), "w"
        ) as f:
            for a in (
                {"checkpointMetadata": {"version": version}},
                {"protocol": proto},
                {"metaData": meta},
                *({"sidecar": {"path": s, "sizeInBytes": 1}}
                  for s in sidecars),
            ):
                f.write(json.dumps(a) + "\n")

    # checkpoint at 2 references sc-1 + sc-2; checkpoint at 4
    # references sc-2 (SHARED) + sc-3
    v2cp(2, "aa11", ["sc-1.parquet", "sc-2.parquet"])
    v2cp(4, "bb22", ["sc-2.parquet", "sc-3.parquet"])

    def _adda(p):
        return {"add": {"path": p, "partitionValues": {}, "size": 1,
                        "modificationTime": 0, "dataChange": True}}

    _write_commit(root, 0, [{"protocol": proto}, {"metaData": meta},
                            _adda("f1.parquet")])
    _write_commit(root, 1, [_adda("f2.parquet")])
    _write_commit(root, 2, [{"remove": {"path": "f1.parquet",
                                        "dataChange": True,
                                        "deletionTimestamp": 0}}])
    _write_commit(root, 3, [_adda("f3.parquet")])
    _write_commit(root, 4, [_adda("f4.parquet")])
    _write_commit(root, 5, [_adda("f5.parquet")])
    assert {r["v"] for r in read_delta(spark, root).collect()} == {2, 3, 4, 5}
    deleted = truncate_delta_log(root, keep_versions=2)
    assert deleted == [0, 1, 2, 3]
    # the dropped version-2 manifest is gone, the retained one stays
    names = set(os.listdir(log))
    assert f"{2:020d}.checkpoint.aa11.json" not in names
    assert f"{4:020d}.checkpoint.bb22.json" in names
    # sc-1 was referenced only by the dropped manifest; sc-2 is shared
    sc = set(os.listdir(os.path.join(log, "_sidecars")))
    assert sc == {"sc-2.parquet", "sc-3.parquet"}
    # replay from the retained checkpoint still serves
    assert {r["v"] for r in read_delta(spark, root).collect()} == {2, 3, 4, 5}
    assert {r["v"] for r in read_delta(spark, root, version=4).collect()} == {
        2, 3, 4
    }
    with pytest.raises(DeltaProtocolError, match="checkpoint"):
        read_delta(spark, root, version=3)


def test_shallow_clone_dvs_and_vacuum_safety(spark, tmp_path):
    """clone_delta absolutizes relative deletion-vector references
    (resolved against the clone root they would point at nothing),
    carries row-tracking stamps and domainMetadata, and the CLONE's
    vacuum never deletes files outside its own root (the source's)."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import (
        DeltaProtocolError,
        _replay_log,
        clone_delta,
        read_delta,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta_optimize import (
        clustering_columns,
        vacuum_delta,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.dv import (
        write_dv_file,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    pq.write_table(
        pa.table({"k": pa.array(range(100), type=pa.int64())}),
        os.path.join(src, "a.parquet"),
    )
    desc = write_dv_file(os.path.join(src, "dv1.bin"), [0, 5, 7])
    desc["pathOrInlineDv"] = "dv1.bin"  # RELATIVE reference
    log = os.path.join(src, "_delta_log")
    os.makedirs(log)
    with open(os.path.join(log, f"{0:020d}.json"), "w") as f:
        for a in [
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                          "readerFeatures": ["deletionVectors"],
                          "writerFeatures": ["deletionVectors",
                                             "rowTracking"]}},
            {"metaData": {
                "id": "src", "format": {"provider": "parquet",
                                        "options": {}},
                "schemaString": json.dumps({
                    "type": "struct",
                    "fields": [{"name": "k", "type": "long",
                                "nullable": True, "metadata": {}}]}),
                "partitionColumns": [],
                "configuration": {"delta.enableRowTracking": "true"},
            }},
            {"domainMetadata": {"domain": "delta.clustering",
                                "configuration": json.dumps(
                                    {"clusteringColumns": [["k"]]}),
                                "removed": False}},
            {"add": {"path": "a.parquet", "partitionValues": {},
                     "size": 1, "modificationTime": 0, "dataChange": True,
                     "baseRowId": 500, "defaultRowCommitVersion": 0,
                     "deletionVector": desc,
                     "stats": json.dumps({"numRecords": 100})}},
        ]:
            f.write(json.dumps(a) + "\n")
    assert read_delta(spark, src).count() == 97
    dst = str(tmp_path / "cl")
    assert clone_delta(src, dst) == 0
    # refuses to clobber an existing log
    with pytest.raises(DeltaProtocolError, match="already holds"):
        clone_delta(src, dst)
    # the DV applies through the ABSOLUTIZED reference
    got = read_delta(spark, dst)
    assert got.count() == 97
    assert {r["k"] for r in got.collect()}.isdisjoint({0, 5, 7})
    _, _, dvs, _ = _replay_log(dst)
    (d,) = dvs.values()
    assert d["storageType"] == "p" and os.path.isabs(d["pathOrInlineDv"])
    # row tracking + domains carried
    rowids: dict = {}
    _replay_log(dst, rowids_out=rowids)
    (base, _v), = rowids.values()
    assert base == 500
    assert clustering_columns(dst) == ["k"]
    # the clone retires the source file; its vacuum must NOT delete it
    with open(os.path.join(dst, "_delta_log", f"{1:020d}.json"), "w") as f:
        f.write(json.dumps({"remove": {
            "path": os.path.join(src, "a.parquet"), "dataChange": True,
            "deletionTimestamp": 1}}) + "\n")
    assert vacuum_delta(dst, retention_hours=0.0) == []
    assert os.path.exists(os.path.join(src, "a.parquet"))
    assert os.path.exists(os.path.join(src, "dv1.bin"))
    assert read_delta(spark, src).count() == 97  # source intact


def test_schema_evolution_writer_gates(spark, tmp_path):
    """rename_delta_column / widen_delta_column gates: rename refuses
    without column mapping (storage names would need a rewrite) and on
    unknown/colliding names; widening accepts only the spec's legal
    changes (decimal growth must preserve scale and integer digits)."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import (
        DeltaProtocolError,
        read_delta,
        rename_delta_column,
        widen_delta_column,
    )

    root = str(tmp_path / "nomap")
    os.makedirs(os.path.join(root, "_delta_log"))
    pq.write_table(
        pa.table({"k": pa.array([1, 2], type=pa.int32()),
                  "f": pa.array([1.5, 2.5], type=pa.float32())}),
        os.path.join(root, "a.parquet"),
    )
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as f:
        for a in [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": {"id": "t", "format": {"provider": "parquet",
                                                "options": {}},
                          "schemaString": json.dumps({
                              "type": "struct", "fields": [
                                  {"name": "k", "type": "integer",
                                   "nullable": True, "metadata": {}},
                                  {"name": "f", "type": "float",
                                   "nullable": True, "metadata": {}}]}),
                          "partitionColumns": [], "configuration": {}}},
            {"add": {"path": "a.parquet", "partitionValues": {}, "size": 1,
                     "modificationTime": 0, "dataChange": True}},
        ]:
            f.write(json.dumps(a) + "\n")
    with pytest.raises(DeltaProtocolError, match="column mapping"):
        rename_delta_column(root, "k", "key")
    # widening works WITHOUT mapping (it never touches storage names)
    assert widen_delta_column(root, "f", "double") == 1
    got = {(r["k"], r["f"]) for r in read_delta(spark, root).collect()}
    assert got == {(1, 1.5), (2, 2.5)}
    with pytest.raises(ValueError, match="unknown column"):
        widen_delta_column(root, "nope", "long")
    # decimal rule: scale/integer-digit preservation
    with pytest.raises(DeltaProtocolError, match="not a legal"):
        widen_delta_column(root, "k", "decimal(5,2)")  # 3 int digits < 10
    assert widen_delta_column(root, "k", "decimal(12,2)") == 2


def test_drop_and_readd_column_never_resurrects(spark, tmp_path):
    """DROP COLUMN under column mapping is metadata-only, and a later
    re-add of the SAME NAME gets a fresh id + physical name — the
    dropped column's bytes stay dead (the spec's re-add rule). Without
    mapping, drop refuses; plain add works mapping-free."""
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pyspark.sql.functions as F

    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import (
        DeltaProtocolError,
        add_delta_column,
        drop_delta_column,
        read_delta,
    )

    root = str(tmp_path / "t")
    os.makedirs(os.path.join(root, "_delta_log"))

    def _cm(name, typ, phys, cid):
        return {"name": name, "type": typ, "nullable": True,
                "metadata": {"delta.columnMapping.id": cid,
                             "delta.columnMapping.physicalName": phys}}

    pq.write_table(
        pa.table({"col-k": pa.array([1, 2], type=pa.int64()),
                  "col-v": pa.array(["secret-a", "secret-b"])}),
        os.path.join(root, "d.parquet"),
    )
    schema = {"type": "struct", "fields": [
        _cm("k", "long", "col-k", 1), _cm("v", "string", "col-v", 2)]}
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"),
              "w") as f:
        f.write(_json.dumps({"protocol": {
            "minReaderVersion": 2, "minWriterVersion": 5}}) + "\n")
        f.write(_json.dumps({"metaData": {
            "id": "t", "format": {"provider": "parquet", "options": {}},
            "schemaString": _json.dumps(schema),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "name"},
        }}) + "\n")
        f.write(_json.dumps({"add": {
            "path": "d.parquet", "partitionValues": {}, "size": 1,
            "modificationTime": 0, "dataChange": True}}) + "\n")

    assert set(read_delta(spark, root).columns) == {"k", "v"}
    with pytest.raises(ValueError, match="unknown column"):
        drop_delta_column(root, "zzz")
    assert drop_delta_column(root, "v") == 1
    assert read_delta(spark, root).columns == ["k"]
    # re-adding the SAME name: fresh id + physical name -> old bytes
    # stay dead; existing rows read NULL, never "secret-*"
    assert add_delta_column(root, "v", "string") == 2
    got = {(r["k"], r["v"]) for r in read_delta(spark, root).collect()}
    assert got == {(1, None), (2, None)}
    # the fresh id is past the dropped one (maxColumnId advanced)
    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import _replay_log

    meta, _l, _d, _v = _replay_log(root)
    fld = next(f for f in _json.loads(meta["schemaString"])["fields"]
               if f["name"] == "v")
    assert int(fld["metadata"]["delta.columnMapping.id"]) >= 3
    assert fld["metadata"]["delta.columnMapping.physicalName"] != "col-v"
    # the only-column guard
    drop_delta_column(root, "v")
    with pytest.raises(ValueError, match="only column"):
        drop_delta_column(root, "k")

    # WITHOUT mapping: drop refuses, plain add works
    root2 = str(tmp_path / "plain")
    os.makedirs(os.path.join(root2, "_delta_log"))
    with open(os.path.join(root2, "_delta_log", f"{0:020d}.json"),
              "w") as f:
        f.write(_json.dumps({"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 2}}) + "\n")
        f.write(_json.dumps({"metaData": {
            "id": "p", "format": {"provider": "parquet", "options": {}},
            "schemaString": _json.dumps({"type": "struct", "fields": [
                {"name": "k", "type": "long", "nullable": True,
                 "metadata": {}}]}),
            "partitionColumns": [], "configuration": {},
        }}) + "\n")
    with pytest.raises(DeltaProtocolError, match="column mapping"):
        drop_delta_column(root2, "k")
    assert add_delta_column(root2, "extra", "long") == 1
    assert read_delta(spark, root2).columns == ["k", "extra"]


def test_drop_column_refuses_referenced(spark, tmp_path):
    """drop_delta_column refuses while a CHECK constraint, another
    column's generation expression, or partitionColumns still
    reference the column — the honest gate at DDL time instead of a
    bricked append path."""
    import json as _json

    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import (
        DeltaProtocolError,
        drop_delta_column,
    )

    root = str(tmp_path / "t")
    os.makedirs(os.path.join(root, "_delta_log"))

    def _cm(name, typ, phys, cid, metadata=None):
        md = {"delta.columnMapping.id": cid,
              "delta.columnMapping.physicalName": phys}
        md.update(metadata or {})
        return {"name": name, "type": typ, "nullable": True,
                "metadata": md}

    schema = {"type": "struct", "fields": [
        _cm("k", "long", "col-k", 1),
        _cm("v", "long", "col-v", 2),
        _cm("v2", "long", "col-v2", 3,
            {"delta.generationExpression": "v * 2"}),
    ]}
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"),
              "w") as f:
        f.write(_json.dumps({"protocol": {
            "minReaderVersion": 2, "minWriterVersion": 7,
            "writerFeatures": ["columnMapping", "checkConstraints",
                               "generatedColumns"]}}) + "\n")
        f.write(_json.dumps({"metaData": {
            "id": "t", "format": {"provider": "parquet", "options": {}},
            "schemaString": _json.dumps(schema),
            "partitionColumns": [],
            "configuration": {
                "delta.columnMapping.mode": "name",
                "delta.constraints.pos_k": "k > 0"},
        }}) + "\n")
    with pytest.raises(DeltaProtocolError, match="pos_k"):
        drop_delta_column(root, "k")
    with pytest.raises(DeltaProtocolError, match="derives from"):
        drop_delta_column(root, "v")
    # the generated column itself (referenced by nothing) drops fine
    assert drop_delta_column(root, "v2") == 1
