"""Hudi metadata-table COLUMN_STATS skipping (sources/hudi.py
write_metadata_table_column_stats / _metadata_column_stats /
read_hudi(predicates=)): per-file min/max bounds prune file groups at
the metadata level, conservatively, on COW and MOR tables."""

import datetime
import os

import pytest

from predicting_hospital_readmission_using_mimic_database_spark.sources.hudi import (
    _metadata_column_stats,
    read_hudi,
    write_metadata_table_column_stats,
    write_metadata_table_files,
)

META = {
    "_hoodie_commit_seqno": "1_0_1",
    "_hoodie_partition_path": "p",
    "_hoodie_file_name": "f",
}


def _mk_table(root, ttype="COPY_ON_WRITE", extra=""):
    h = os.path.join(root, ".hoodie")
    os.makedirs(h, exist_ok=True)
    with open(os.path.join(h, "hoodie.properties"), "w") as f:
        f.write(f"#p\nhoodie.table.name=t\nhoodie.table.type={ttype}\n{extra}")


def _commit(root, instant, state="commit"):
    open(os.path.join(root, ".hoodie", f"{instant}.{state}"), "w").close()


def _write_base(root, partition, file_id, instant, cols: dict):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = os.path.join(root, partition) if partition else root
    os.makedirs(d, exist_ok=True)
    n = len(next(iter(cols.values())))
    data = {m: [mv] * n for m, mv in META.items()}
    data["_hoodie_commit_time"] = [instant] * n
    data["_hoodie_record_key"] = [str(i) for i in range(n)]
    data.update(cols)
    pq.write_table(
        pa.table(data), os.path.join(d, f"{file_id}_0-0-0_{instant}.parquet")
    )


@pytest.fixture
def cow_root(tmp_path):
    """Three file groups with disjoint k ranges; column_stats indexed."""
    root = str(tmp_path / "cow")
    _mk_table(root)
    t1 = "00000000000001"
    _write_base(root, "a", "f1", t1, {"k": [1, 2, 3], "v": [1.0, 2.0, 3.0]})
    _write_base(root, "a", "f2", t1, {"k": [10, 20], "v": [10.0, 20.0]})
    _write_base(root, "b", "f3", t1, {"k": [100, 200], "v": [5.0, 6.0]})
    _commit(root, t1)
    write_metadata_table_files(root)
    write_metadata_table_column_stats(root)
    return root


def _files(df):
    return {os.path.basename(p) for p in df.inputFiles()}


def test_stats_harvest_roundtrip(cow_root):
    st = _metadata_column_stats(cow_root)
    # keys are (partition, file name) pairs
    f1 = st[("a", "f1_0-0-0_00000000000001.parquet")]
    assert f1["k"] == {"min": 1, "max": 3, "nulls": 0}
    assert f1["v"] == {"min": 1.0, "max": 3.0, "nulls": 0}
    # meta columns are never indexed
    assert "_hoodie_record_key" not in f1


def test_same_file_name_across_partitions_no_collision(spark, tmp_path):
    """Two partitions holding the SAME base file name (same fileId +
    instant) keep separate stats entries — a name-keyed fold would
    consult one partition's bounds for the other and silently drop
    rows (over-prune)."""
    root = str(tmp_path / "dup")
    _mk_table(root)
    t1 = "00000000000001"
    _write_base(root, "a", "f1", t1, {"k": [1, 2, 3], "v": [1.0, 2.0, 3.0]})
    _write_base(
        root, "b", "f1", t1, {"k": [100, 200], "v": [5.0, 6.0]}
    )
    _commit(root, t1)
    write_metadata_table_column_stats(root)
    st = _metadata_column_stats(root)
    fname = f"f1_0-0-0_{t1}.parquet"
    assert st[("a", fname)]["k"]["max"] == 3
    assert st[("b", fname)]["k"]["min"] == 100
    # whichever fold order, both predicates keep their matching file
    hi = read_hudi(spark, root, predicates=[("k", ">", 50)])
    assert {r["k"] for r in hi.collect()} == {100, 200}
    lo = read_hudi(spark, root, predicates=[("k", "<", 50)])
    assert {r["k"] for r in lo.collect()} == {1, 2, 3}


def test_predicate_prunes_files(spark, cow_root):
    t1 = "00000000000001"
    df = read_hudi(spark, cow_root, predicates=[("k", ">", 20)])
    assert _files(df) == {f"f3_0-0-0_{t1}.parquet"}
    # kept files still return ALL their rows (file-level prune only)
    assert {r["k"] for r in df.collect()} == {100, 200}
    # conjunction narrows further
    df2 = read_hudi(
        spark, cow_root, predicates=[("k", "<=", 20), ("v", ">=", 10.0)]
    )
    assert _files(df2) == {f"f2_0-0-0_{t1}.parquet"}
    # equality inside one file's range
    df3 = read_hudi(spark, cow_root, predicates=[("k", "==", 2)])
    assert _files(df3) == {f"f1_0-0-0_{t1}.parquet"}


def test_pruned_to_empty_keeps_schema(spark, cow_root):
    df = read_hudi(spark, cow_root, predicates=[("k", ">", 10_000)])
    assert df.count() == 0
    assert sorted(df.columns) == ["k", "v"]


def test_no_stats_partition_is_conservative(spark, tmp_path):
    root = str(tmp_path / "nostats")
    _mk_table(root)
    t1 = "00000000000001"
    _write_base(root, "a", "f1", t1, {"k": [1, 2], "v": [1.0, 2.0]})
    _commit(root, t1)
    df = read_hudi(spark, root, predicates=[("k", ">", 100)])
    assert len(df.inputFiles()) == 1  # no bounds -> keep everything


def test_unknown_column_and_op_raise(spark, cow_root):
    with pytest.raises(ValueError, match="unknown column"):
        read_hudi(spark, cow_root, predicates=[("nope", ">", 1)])
    with pytest.raises(ValueError, match="unsupported predicate op"):
        read_hudi(spark, cow_root, predicates=[("k", "!=", 1)])


def test_timestamp_and_date_predicates(spark, tmp_path):
    import pyarrow as pa

    root = str(tmp_path / "ts")
    _mk_table(root)
    t1 = "00000000000001"
    d0 = datetime.date(2024, 1, 1)
    ts = datetime.datetime(2024, 1, 1, 12, 0, 0)
    _write_base(
        root, "a", "f1", t1,
        {
            "d": pa.array([d0, d0 + datetime.timedelta(days=9)]),
            "t": pa.array([ts, ts + datetime.timedelta(hours=5)],
                          type=pa.timestamp("us")),
        },
    )
    _write_base(
        root, "a", "f2", t1,
        {
            "d": pa.array(
                [d0 + datetime.timedelta(days=100 + i) for i in range(2)]
            ),
            "t": pa.array(
                [ts + datetime.timedelta(days=100 + i) for i in range(2)],
                type=pa.timestamp("us"),
            ),
        },
    )
    _commit(root, t1)
    write_metadata_table_column_stats(root)
    got = _files(
        read_hudi(
            spark, root,
            predicates=[("d", ">", d0 + datetime.timedelta(days=50))],
        )
    )
    assert got == {f"f2_0-0-0_{t1}.parquet"}
    got = _files(
        read_hudi(
            spark, root,
            predicates=[("t", "<", ts + datetime.timedelta(days=1))],
        )
    )
    assert got == {f"f1_0-0-0_{t1}.parquet"}


def test_mor_logged_groups_never_pruned(spark, tmp_path):
    """A committed log block may carry rows OUTSIDE the base file's
    bounds — the logged group must survive pruning; log-free groups
    still prune."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources import (
        hudi_log as HL,
    )

    root = str(tmp_path / "mor")
    _mk_table(root, ttype="MERGE_ON_READ")
    t1, t2 = "00000000000001", "00000000000002"
    _write_base(root, "a", "f1", t1, {"k": [1, 2], "v": [1.0, 2.0]})
    _write_base(root, "a", "f2", t1, {"k": [10, 20], "v": [3.0, 4.0]})
    _commit(root, t1)
    # upsert into f1's group: k=500, far outside f1's base bounds
    schema = {
        "type": "record",
        "name": "rec",
        "fields": [
            {"name": "_hoodie_commit_time", "type": ["null", "string"]},
            {"name": "_hoodie_commit_seqno", "type": ["null", "string"]},
            {"name": "_hoodie_record_key", "type": ["null", "string"]},
            {"name": "_hoodie_partition_path", "type": ["null", "string"]},
            {"name": "_hoodie_file_name", "type": ["null", "string"]},
            {"name": "k", "type": ["null", "long"]},
            {"name": "v", "type": ["null", "double"]},
        ],
    }
    lp = os.path.join(root, "a", HL.log_file_name("f1", t1, 1))
    HL.append_avro_block(
        lp, t2, schema,
        [
            {
                "_hoodie_commit_time": t2,
                "_hoodie_commit_seqno": f"{t2}_0_1",
                "_hoodie_record_key": "500",
                "_hoodie_partition_path": "a",
                "_hoodie_file_name": "f1",
                "k": 500,
                "v": 9.0,
            }
        ],
    )
    open(os.path.join(root, ".hoodie", f"{t2}.deltacommit"), "w").close()
    write_metadata_table_column_stats(root)
    df = read_hudi(spark, root, predicates=[("k", ">", 100)])
    got = {r["k"] for r in df.collect()}
    # the logged group contributed the out-of-bounds upsert; the
    # log-free group f2 (max k=20) was pruned away
    assert 500 in got and 10 not in got
    assert not any("f2_" in os.path.basename(p) for p in df.inputFiles())


def test_never_over_prunes_property(spark, cow_root):
    """Brute-force oracle: for a grid of predicates, the rows of the
    pruned read filtered by the predicate equal the rows of the
    unpruned read filtered the same way."""
    full = read_hudi(spark, cow_root)
    rows = [(r["k"], r["v"]) for r in full.collect()]
    for col, idx in (("k", 0), ("v", 1)):
        for op, fn in (
            ("<", lambda a, b: a < b),
            ("<=", lambda a, b: a <= b),
            ("==", lambda a, b: a == b),
            (">=", lambda a, b: a >= b),
            (">", lambda a, b: a > b),
        ):
            for val in (0, 2, 3.0, 10, 20, 150, 999):
                got = {
                    (r["k"], r["v"])
                    for r in read_hudi(
                        spark, cow_root, predicates=[(col, op, val)]
                    ).collect()
                    if fn(r[col], val)
                }
                want = {t for t in rows if fn(t[idx], val)}
                assert got == want, (col, op, val)


def test_tagged_union_wrapper_distinctness(tmp_path):
    """The Avro codec's tagged-union encoding keeps structurally
    identical wrapper records apart: IntWrapper vs LongWrapper vs
    DoubleWrapper round-trip through their declared branches."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.avro_ocf import (
        read_avro,
        write_avro,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.hudi import (
        COLUMN_STATS_RECORD_SCHEMA,
    )

    p = str(tmp_path / "w.avro")
    recs = [
        {
            "key": "p,c,f",
            "type": 3,
            "ColumnStatsMetadata": {
                "fileName": "f",
                "columnName": "c",
                "minValue": {"DoubleWrapper": {"value": 1.5}},
                "maxValue": {"LongWrapper": {"value": 7}},
                "valueCount": 2,
                "nullCount": 0,
                "totalSize": None,
                "isDeleted": False,
            },
        }
    ]
    write_avro(p, COLUMN_STATS_RECORD_SCHEMA, recs)
    _schema, back = read_avro(p)
    cs = back[0]["ColumnStatsMetadata"]
    assert cs["minValue"] == {"value": 1.5}
    assert isinstance(cs["minValue"]["value"], float)
    assert cs["maxValue"] == {"value": 7}
    assert isinstance(cs["maxValue"]["value"], int)
