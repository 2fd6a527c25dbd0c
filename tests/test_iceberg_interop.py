"""Iceberg read interop (sources/iceberg.py) over hand-built spec-shaped
tables: avro manifest lists + manifests, snapshot time travel, identity-
partition pruning, v1/v2 metadata, and the row-level-delete gates."""

import json
import os

import pytest

from predicting_hospital_readmission_using_mimic_database_spark.sources.avro_ocf import read_avro, write_avro
from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
    IcebergProtocolError,
    iceberg_snapshots,
    read_iceberg,
)

MANIFEST_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {
                        "name": "partition",
                        "type": {
                            "type": "record",
                            "name": "r102",
                            "fields": [
                                {"name": "seg", "type": ["null", "string"]}
                            ],
                        },
                    },
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                    # v3 row lineage (optional in this foreign shape)
                    {"name": "first_row_id", "type": ["null", "long"],
                     "default": None},
                ],
            },
        },
    ],
}

MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "added_snapshot_id", "type": ["null", "long"]},
        {"name": "sequence_number", "type": ["null", "long"],
         "default": None},
        {"name": "first_row_id", "type": ["null", "long"],
         "default": None},
    ],
}


def _write_parquet(path, rows, names):
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), exist_ok=True)
    cols = list(zip(*rows)) if rows else [[] for _ in names]
    pq.write_table(pa.table({n: list(c) for n, c in zip(names, cols)}), path)


def _entry(path, seg, n, status=1, content=0, fmt="PARQUET"):
    return {
        "status": status,
        "snapshot_id": 1,
        "data_file": {
            "content": content,
            "file_path": path,
            "file_format": fmt,
            "partition": {"seg": seg},
            "record_count": n,
            "file_size_in_bytes": 1,
        },
    }


def _manifest(root, name, entries):
    p = os.path.join(root, "metadata", name)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    write_avro(p, MANIFEST_ENTRY_SCHEMA, entries)
    return p


def _manifest_list(root, name, manifest_paths, content=0,
                   first_row_id=None, sequence_number=None):
    p = os.path.join(root, "metadata", name)
    write_avro(
        p,
        MANIFEST_FILE_SCHEMA,
        [
            {
                "manifest_path": mp,
                "manifest_length": 1,
                "partition_spec_id": 0,
                "content": content,
                "added_snapshot_id": 1,
                "sequence_number": sequence_number,
                "first_row_id": first_row_id,
            }
            for mp in manifest_paths
        ],
    )
    return p


def _metadata(root, snapshots, current, fields, version=2):
    meta = {
        "format-version": version,
        "table-uuid": "fixture",
        "location": root,
        "current-snapshot-id": current,
        "snapshots": snapshots,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
    }
    schema = {
        "type": "struct",
        "schema-id": 0,
        "fields": [
            {"id": i + 1, "name": n, "required": False, "type": t}
            for i, (n, t) in enumerate(fields)
        ],
    }
    if version >= 2:
        meta["schemas"] = [schema]
        meta["current-schema-id"] = 0
    else:
        meta["schema"] = schema
    os.makedirs(os.path.join(root, "metadata"), exist_ok=True)
    with open(os.path.join(root, "metadata", "v1.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as f:
        f.write("1")


@pytest.fixture
def iceberg_root(tmp_path):
    """Two snapshots: s1 adds files A (seg=x) and B (seg=y); s2 tombstones
    B and adds C (seg=y, rewritten values)."""
    root = str(tmp_path / "ice")
    fa = os.path.join(root, "data", "a.parquet")
    fb = os.path.join(root, "data", "b.parquet")
    fc = os.path.join(root, "data", "c.parquet")
    _write_parquet(fa, [(1, "x"), (2, "x")], ["k", "seg"])
    _write_parquet(fb, [(10, "y")], ["k", "seg"])
    _write_parquet(fc, [(11, "y"), (12, "y")], ["k", "seg"])
    m1 = _manifest(
        root, "m1.avro", [_entry(fa, "x", 2), _entry(fb, "y", 1)]
    )
    ml1 = _manifest_list(root, "ml1.avro", [m1])
    m2 = _manifest(
        root,
        "m2.avro",
        [
            _entry(fa, "x", 2, status=0),
            _entry(fb, "y", 1, status=2),  # deleted tombstone
            _entry(fc, "y", 2, status=1),
        ],
    )
    ml2 = _manifest_list(root, "ml2.avro", [m2])
    _metadata(
        root,
        [
            {
                "snapshot-id": 1,
                "timestamp-ms": 1000,
                "summary": {"operation": "append"},
                "manifest-list": ml1,
            },
            {
                "snapshot-id": 2,
                "timestamp-ms": 2000,
                "summary": {"operation": "overwrite"},
                "manifest-list": ml2,
            },
        ],
        current=2,
        fields=[("k", "long"), ("seg", "string")],
    )
    return root


def test_read_current_and_time_travel(spark, iceberg_root):
    cur = read_iceberg(spark, iceberg_root)
    assert cur.columns == ["k", "seg"]
    assert {(r["k"], r["seg"]) for r in cur.collect()} == {
        (1, "x"), (2, "x"), (11, "y"), (12, "y")
    }
    old = read_iceberg(spark, iceberg_root, snapshot_id=1)
    assert {r["k"] for r in old.collect()} == {1, 2, 10}
    with pytest.raises(ValueError, match="not found"):
        read_iceberg(spark, iceberg_root, snapshot_id=99)
    hist = iceberg_snapshots(iceberg_root)
    assert [h["snapshot_id"] for h in hist] == [1, 2]
    assert hist[1]["operation"] == "overwrite"


def test_partition_pruning(spark, iceberg_root):
    x = read_iceberg(spark, iceberg_root, partitions={"seg": "x"})
    assert {r["k"] for r in x.collect()} == {1, 2}
    assert len(x.inputFiles()) == 1
    with pytest.raises(ValueError, match="unknown partition"):
        read_iceberg(spark, iceberg_root, partitions={"k": 1})


def test_delete_gates(spark, tmp_path):
    root = str(tmp_path / "dv")
    f = os.path.join(root, "data", "a.parquet")
    _write_parquet(f, [(1, "x")], ["k", "seg"])
    # (a) DATA file (content=0) inside a DELETE manifest: malformed
    m = _manifest(root, "m.avro", [_entry(f, "x", 1)])
    ml = _manifest_list(root, "ml.avro", [m], content=1)
    _metadata(
        root,
        [{"snapshot-id": 1, "timestamp-ms": 0, "summary": {}, "manifest-list": ml}],
        current=1,
        fields=[("k", "long"), ("seg", "string")],
    )
    with pytest.raises(IcebergProtocolError, match="content=0"):
        read_iceberg(spark, root)
    # (b) delete FILE (content=1) inside a data manifest: malformed
    root2 = str(tmp_path / "df")
    f2 = os.path.join(root2, "data", "a.parquet")
    _write_parquet(f2, [(1, "x")], ["k", "seg"])
    m2 = _manifest(root2, "m.avro", [_entry(f2, "x", 1, content=1)])
    ml2 = _manifest_list(root2, "ml.avro", [m2])
    _metadata(
        root2,
        [{"snapshot-id": 1, "timestamp-ms": 0, "summary": {}, "manifest-list": ml2}],
        current=1,
        fields=[("k", "long"), ("seg", "string")],
    )
    with pytest.raises(IcebergProtocolError, match="delete file"):
        read_iceberg(spark, root2)
    # (b2) equality delete file WITHOUT equality_ids: malformed
    root4 = str(tmp_path / "eq")
    f4 = os.path.join(root4, "data", "a.parquet")
    _write_parquet(f4, [(1, "x")], ["k", "seg"])
    m4 = _manifest(root4, "m.avro", [_entry(f4, "x", 1, content=2)])
    ml4 = _manifest_list(root4, "ml.avro", [m4], content=1)
    _metadata(
        root4,
        [{"snapshot-id": 1, "timestamp-ms": 0, "summary": {}, "manifest-list": ml4}],
        current=1,
        fields=[("k", "long"), ("seg", "string")],
    )
    with pytest.raises(IcebergProtocolError, match="equality_ids"):
        read_iceberg(spark, root4)
    # (c) future format versions
    root3 = str(tmp_path / "v9")
    _metadata(root3, [], current=None, fields=[("k", "long")], version=9)
    with pytest.raises(IcebergProtocolError, match="format-version"):
        read_iceberg(spark, root3)


def test_v1_metadata_inline_manifests(spark, tmp_path):
    root = str(tmp_path / "v1")
    f = os.path.join(root, "data", "a.parquet")
    _write_parquet(f, [(5, "z")], ["k", "seg"])
    m = _manifest(root, "m.avro", [_entry(f, "z", 1)])
    _metadata(
        root,
        [{"snapshot-id": 1, "timestamp-ms": 0, "summary": {}, "manifests": [m]}],
        current=1,
        fields=[("k", "long"), ("seg", "string")],
        version=1,
    )
    got = read_iceberg(spark, root)
    assert [(r["k"], r["seg"]) for r in got.collect()] == [(5, "z")]


def test_avro_codec_property_roundtrip(tmp_path):
    """Hypothesis fuzz: random record schemas + matching values survive
    an OCF write/read round trip bit-exactly under both codecs."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    field_types = st.sampled_from(
        ["long", "int", "string", "boolean", "double", "bytes"]
    )

    def value_for(t):
        return {
            "long": st.integers(min_value=-(2**62), max_value=2**62),
            "int": st.integers(min_value=-(2**31), max_value=2**31 - 1),
            "string": st.text(max_size=20),
            "boolean": st.booleans(),
            "double": st.floats(allow_nan=False, width=64),
            "bytes": st.binary(max_size=16),
        }[t]

    @st.composite
    def schema_and_records(draw):
        n_fields = draw(st.integers(min_value=1, max_value=5))
        kinds = [draw(field_types) for _ in range(n_fields)]
        nullable = [draw(st.booleans()) for _ in range(n_fields)]
        schema = {
            "type": "record",
            "name": "fuzz",
            "fields": [
                {
                    "name": f"f{i}",
                    "type": ["null", k] if nb else k,
                }
                for i, (k, nb) in enumerate(zip(kinds, nullable))
            ],
        }
        n_recs = draw(st.integers(min_value=0, max_value=8))
        recs = []
        for _ in range(n_recs):
            rec = {}
            for i, (k, nb) in enumerate(zip(kinds, nullable)):
                if nb and draw(st.booleans()):
                    rec[f"f{i}"] = None
                else:
                    rec[f"f{i}"] = draw(value_for(k))
            recs.append(rec)
        return schema, recs

    @settings(max_examples=40, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(data=schema_and_records(), codec=st.sampled_from(["null", "deflate"]))
    def check(data, codec):
        schema, recs = data
        p = str(tmp_path / "fuzz.avro")
        write_avro(p, schema, recs, codec=codec)
        s2, got = read_avro(p)
        assert s2 == schema and got == recs

    check()


def test_export_snapshot_table_roundtrip(spark, tmp_path):
    """SnapshotTable -> Iceberg export: zero-copy publish; incremental
    exports append snapshots and earlier ones stay time-travelable."""
    import pyspark.sql.functions as F

    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import export_iceberg
    from predicting_hospital_readmission_using_mimic_database_spark.sources.table import SnapshotTable

    root = str(tmp_path / "tbl")
    t = SnapshotTable.create(
        spark, root, "k bigint, v double", bucket_key=["k"], num_buckets=4
    )
    t.append(
        spark.range(60).select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
    )
    assert export_iceberg(t) == 1
    assert export_iceberg(t) == 1  # no-change export is a no-op
    got1 = read_iceberg(spark, root)
    assert {(r["k"], r["v"]) for r in got1.collect()} == {
        (i, float(i)) for i in range(60)
    }
    upd = spark.createDataFrame([(3, -3.0), (600, 1.0)], "k bigint, v double")
    t.merge(upd)
    assert export_iceberg(t) == 2
    cur = {r["k"]: r["v"] for r in read_iceberg(spark, root).collect()}
    assert cur[3] == -3.0 and cur[600] == 1.0 and len(cur) == 61
    old = {r["k"]: r["v"] for r in read_iceberg(spark, root, snapshot_id=1).collect()}
    assert old[3] == 3.0 and 600 not in old
    ops = [h["operation"] for h in iceberg_snapshots(root)]
    assert ops == ["append", "overwrite"]


def test_empty_table_and_avro_roundtrip(spark, tmp_path):
    root = str(tmp_path / "empty")
    _metadata(root, [], current=None, fields=[("k", "long")])
    df = read_iceberg(spark, root)
    assert df.count() == 0 and df.columns == ["k"]
    # avro writer/reader round-trip including negative block ints + maps
    p = str(tmp_path / "t.avro")
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "m", "type": {"type": "map", "values": "string"}},
            {"name": "u", "type": ["null", "double"]},
        ],
    }
    recs = [
        {"a": -(2**40), "m": {"k": "v"}, "u": None},
        {"a": 7, "m": {}, "u": 1.5},
    ]
    write_avro(p, schema, recs, codec="deflate")
    s2, got = read_avro(p)
    assert got == recs and s2 == schema


def test_positional_deletes_applied(spark, iceberg_root):
    """A v2 positional-delete snapshot (delete parquet + DELETE manifest
    appended by the minimal writer surface) removes exactly the
    (file, pos) rows; earlier snapshots stay fully readable; the
    broadcast and shuffled anti-join paths agree."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        append_position_deletes,
    )

    fa = os.path.join(iceberg_root, "data", "a.parquet")
    fc = os.path.join(iceberg_root, "data", "c.parquet")
    # a.parquet rows: k=1 (pos 0), k=2 (pos 1); c.parquet: k=11, k=12
    sid = append_position_deletes(iceberg_root, [(fa, 0), (fc, 1)])
    assert sid == 3
    cur = read_iceberg(spark, iceberg_root)
    assert {(r["k"], r["seg"]) for r in cur.collect()} == {(2, "x"), (11, "y")}
    shuffled = read_iceberg(spark, iceberg_root, broadcast_deletes=False)
    assert {r["k"] for r in shuffled.collect()} == {2, 11}
    # pre-delete snapshot unaffected (time travel replays fewer manifests)
    old = read_iceberg(spark, iceberg_root, snapshot_id=2)
    assert {r["k"] for r in old.collect()} == {1, 2, 11, 12}
    assert [h["operation"] for h in iceberg_snapshots(iceberg_root)][-1] == "delete"
    # a second delete snapshot stacks on the first
    append_position_deletes(iceberg_root, [(fa, 1)])
    assert {r["k"] for r in read_iceberg(spark, iceberg_root).collect()} == {11}


def test_equality_deletes_applied_with_sequence_ordering(spark, tmp_path):
    """Equality deletes (Flink-CDC shape) remove matching rows from data
    files with LOWER sequence numbers only: a matching row added AFTER
    the delete survives; null equality-values match null-safely; a
    table whose metadata lacks sequence numbers raises."""
    import pyspark.sql.functions as F

    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        MANIFEST_ENTRY_SCHEMA as PKG_ENTRY,
        MANIFEST_FILE_SCHEMA as PKG_MF,
        append_equality_deletes,
        export_iceberg,
        read_iceberg,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.table import SnapshotTable

    root = str(tmp_path / "eqd")
    t = SnapshotTable.create(spark, root, "k bigint, seg string")
    t.append(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "a"), (4, None)], "k bigint, seg string"
        )
    )
    assert export_iceberg(t) == 1
    # delete every row with seg='a' OR seg IS NULL (null-safe equality)
    sid = append_equality_deletes(root, [{"seg": "a"}, {"seg": None}], ["seg"])
    assert sid == 2
    got = {(r["k"], r["seg"]) for r in read_iceberg(spark, root).collect()}
    assert got == {(2, "b")}
    # pre-delete snapshot unaffected
    assert read_iceberg(spark, root, snapshot_id=1).count() == 4
    # snapshot 3: a NEW data file at HIGHER sequence number re-inserts
    # seg='a' rows — the older equality delete must NOT touch them
    import json as _json

    meta_path = os.path.join(root, "metadata")
    newf = os.path.join(root, "reinsert.parquet")
    _write_parquet(newf, [(9, "a")], ["k", "seg"])
    with open(os.path.join(meta_path, "version-hint.text")) as f:
        hint = f.read().strip()
    with open(os.path.join(meta_path, f"v{hint}.metadata.json")) as f:
        meta = _json.load(f)
    cur = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _s, manifests = read_avro(cur["manifest-list"])
    m3 = os.path.join(meta_path, "manifest-3.avro")
    write_avro(
        m3,
        PKG_ENTRY,
        [
            {
                "status": 1,
                "snapshot_id": 3,
                "data_file": {
                    "content": 0,
                    "file_path": newf,
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": 1,
                    "file_size_in_bytes": 1,
                    "equality_ids": None,
                },
            }
        ],
    )
    ml3 = os.path.join(meta_path, "snap-3.avro")
    write_avro(
        ml3,
        PKG_MF,
        [{"sequence_number": None, **m} for m in manifests]
        + [
            {
                "manifest_path": m3,
                "manifest_length": 1,
                "partition_spec_id": 0,
                "content": 0,
                "added_snapshot_id": 3,
                "sequence_number": 3,
            }
        ],
    )
    meta["snapshots"].append(
        {"snapshot-id": 3, "timestamp-ms": 0, "summary": {"operation": "append"},
         "manifest-list": ml3, "schema-id": 0}
    )
    meta["current-snapshot-id"] = 3
    v = int(hint) + 1
    with open(os.path.join(meta_path, f"v{v}.metadata.json"), "w") as f:
        _json.dump(meta, f)
    with open(os.path.join(meta_path, "version-hint.text"), "w") as f:
        f.write(str(v))
    got3 = {(r["k"], r["seg"]) for r in read_iceberg(spark, root).collect()}
    assert got3 == {(2, "b"), (9, "a")}  # reinserted 'a' row SURVIVES


def test_equality_deletes_without_sequence_numbers_raise(spark, tmp_path):
    """Metadata carrying equality deletes but no sequence numbers cannot
    order data vs delete — the read must raise, not guess."""
    root = str(tmp_path / "eqnoseq")
    f = os.path.join(root, "data", "a.parquet")
    _write_parquet(f, [(1, "x")], ["k", "seg"])
    d = os.path.join(root, "data", "del.parquet")
    _write_parquet(d, [("x",)], ["seg"])
    entry_schema = json.loads(json.dumps(MANIFEST_ENTRY_SCHEMA))
    entry_schema["fields"][2]["type"]["fields"].append(
        {"name": "equality_ids", "type": ["null", {"type": "array", "items": "int"}]}
    )
    m1 = os.path.join(root, "metadata", "m1.avro")
    os.makedirs(os.path.dirname(m1), exist_ok=True)
    e1 = _entry(f, "x", 1)
    e1["data_file"]["equality_ids"] = None
    write_avro(m1, entry_schema, [e1])
    m2 = os.path.join(root, "metadata", "m2.avro")
    e2 = _entry(d, "x", 1, content=2)
    e2["data_file"]["equality_ids"] = [2]
    write_avro(m2, entry_schema, [e2])
    ml = os.path.join(root, "metadata", "ml.avro")
    write_avro(
        ml,
        MANIFEST_FILE_SCHEMA,
        [
            {"manifest_path": m1, "manifest_length": 1, "partition_spec_id": 0,
             "content": 0, "added_snapshot_id": 1},
            {"manifest_path": m2, "manifest_length": 1, "partition_spec_id": 0,
             "content": 1, "added_snapshot_id": 1},
        ],
    )
    _metadata(
        root,
        [{"snapshot-id": 1, "timestamp-ms": 0, "summary": {}, "manifest-list": ml}],
        current=1,
        fields=[("k", "long"), ("seg", "string")],
    )
    with pytest.raises(IcebergProtocolError, match="sequence numbers"):
        read_iceberg(spark, root)


def test_timestamp_time_travel(spark, iceberg_root):
    """timestamp= picks the last snapshot with timestamp-ms <= the
    requested time (fixture snapshots sit at 1000 and 2000)."""
    old = read_iceberg(spark, iceberg_root, timestamp=1500)
    assert {r["k"] for r in old.collect()} == {1, 2, 10}
    cur = read_iceberg(spark, iceberg_root, timestamp=2000)
    assert {r["k"] for r in cur.collect()} == {1, 2, 11, 12}
    with pytest.raises(ValueError, match="no snapshot at or before"):
        read_iceberg(spark, iceberg_root, timestamp=500)
    with pytest.raises(ValueError, match="at most one"):
        read_iceberg(spark, iceberg_root, snapshot_id=1, timestamp=1500)


# ---------------------------------------------------------------------------
# partition transforms
# ---------------------------------------------------------------------------


def test_murmur3_spec_vectors():
    """Iceberg spec Appendix B published hash values."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        _bucket_hash,
        transform_value,
    )

    def signed(x):
        return x - (1 << 32) if x >= (1 << 31) else x

    assert signed(_bucket_hash(34)) == 2017239379          # int/long 34
    assert signed(_bucket_hash("iceberg")) == 1210000089   # utf-8 string
    assert transform_value("bucket[16]", 34) == 3          # spec example


def test_transform_value_semantics():
    from datetime import date, datetime

    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        IcebergProtocolError,
        transform_value,
    )

    # truncate: floor semantics for ints (spec: truncate[10](-1) = -10)
    assert transform_value("truncate[10]", -1) == -10
    assert transform_value("truncate[10]", 17) == 10
    assert transform_value("truncate[3]", "iceberg") == "ice"
    # temporal ordinals (spec examples for 2017-11-16)
    assert transform_value("day", "2017-11-16") == 17486
    assert transform_value("day", date(2017, 11, 16)) == 17486
    assert transform_value("month", "2017-11-16") == 574
    assert transform_value("year", "2017-11-16") == 47
    assert transform_value("hour", datetime(2017, 11, 16, 22, 31, 8)) == 419686
    assert transform_value("identity", "z") == "z"
    assert transform_value("void", 9) is None
    assert transform_value("bucket[8]", None) is None  # null -> null
    with pytest.raises(IcebergProtocolError, match="unsupported partition transform"):
        transform_value("zorder[2]", 1)
    with pytest.raises(IcebergProtocolError, match="not supported"):
        transform_value("truncate[4]", 1.5)


def _bucket_table(root, n_buckets=4, spec_fields=None, legacy_rows=None):
    """A table of (k, v) rows 0..39 laid out one data file per
    bucket[n](k), manifests storing the bucket number. ``legacy_rows``
    adds a pre-spec file through a SECOND manifest whose partition
    tuple has NO fields at all (mixed-spec history)."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        MANIFEST_ENTRY_SCHEMA as PKG_ENTRY_EMPTY,
        MANIFEST_FILE_SCHEMA as PKG_MF,
        transform_value,
    )

    entry_schema = json.loads(json.dumps(MANIFEST_ENTRY_SCHEMA))
    entry_schema["fields"][2]["type"]["fields"][3]["type"]["fields"] = [
        {"name": "kb", "type": ["null", "long"]}
    ]
    groups = {}
    for k in range(40):
        groups.setdefault(transform_value(f"bucket[{n_buckets}]", k), []).append(k)
    entries = []
    for b, ks in sorted(groups.items()):
        p = os.path.join(root, "data", f"b{b}.parquet")
        _write_parquet(p, [(k, f"v{k}") for k in ks], ["k", "v"])
        e = _entry(p, None, len(ks))
        e["data_file"]["partition"] = {"kb": b}
        entries.append(e)
    m = os.path.join(root, "metadata", "m1.avro")
    os.makedirs(os.path.dirname(m), exist_ok=True)
    write_avro(m, entry_schema, entries)
    mrecs = [
        {"manifest_path": m, "manifest_length": 1, "partition_spec_id": 0,
         "content": 0, "added_snapshot_id": 1, "sequence_number": 1}
    ]
    if legacy_rows is not None:
        lp = os.path.join(root, "data", "legacy.parquet")
        _write_parquet(lp, legacy_rows, ["k", "v"])
        m2 = os.path.join(root, "metadata", "m-legacy.avro")
        write_avro(
            m2,
            PKG_ENTRY_EMPTY,
            [{
                "status": 1,
                "snapshot_id": 1,
                "data_file": {
                    "content": 0, "file_path": lp, "file_format": "PARQUET",
                    "partition": {}, "record_count": len(legacy_rows),
                    "file_size_in_bytes": 1, "equality_ids": None,
                },
            }],
        )
        mrecs.append(
            {"manifest_path": m2, "manifest_length": 1, "partition_spec_id": 1,
             "content": 0, "added_snapshot_id": 1, "sequence_number": 1}
        )
    ml = os.path.join(root, "metadata", "ml1.avro")
    write_avro(ml, PKG_MF, mrecs)
    meta = {
        "format-version": 2,
        "table-uuid": "bt",
        "location": root,
        "current-snapshot-id": 1,
        "snapshots": [{"snapshot-id": 1, "timestamp-ms": 0, "summary": {},
                       "manifest-list": ml}],
        "schemas": [{"type": "struct", "schema-id": 0, "fields": [
            {"id": 1, "name": "k", "required": False, "type": "long"},
            {"id": 2, "name": "v", "required": False, "type": "string"},
        ]}],
        "current-schema-id": 0,
        "partition-specs": spec_fields if spec_fields is not None else [
            {"spec-id": 0, "fields": [
                {"name": "kb", "transform": f"bucket[{n_buckets}]",
                 "source-id": 1, "field-id": 1000},
            ]}
        ],
        "default-spec-id": 0,
    }
    with open(os.path.join(root, "metadata", "v1.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as f:
        f.write("1")
    return groups


def test_bucket_transform_pruning_end_to_end(spark, tmp_path):
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        read_iceberg,
        transform_value,
    )

    root = str(tmp_path / "bt")
    groups = _bucket_table(root)
    # single source value: only its bucket's file is read
    df = read_iceberg(spark, root, partitions={"k": 7})
    b7 = transform_value("bucket[4]", 7)
    assert sorted(r["k"] for r in df.collect()) == groups[b7]
    assert len(df.inputFiles()) == 1
    # value list spanning two buckets: exactly those files
    df2 = read_iceberg(spark, root, partitions={"k": [7, 8]})
    want = sorted(set(groups[b7]) | set(groups[transform_value("bucket[4]", 8)]))
    assert sorted(r["k"] for r in df2.collect()) == want
    assert len(df2.inputFiles()) == len({b7, transform_value("bucket[4]", 8)})
    # direct partition-FIELD name still works and wins over transforms
    df3 = read_iceberg(spark, root, partitions={"kb": b7})
    assert sorted(r["k"] for r in df3.collect()) == groups[b7]


def test_transform_prune_mixed_spec_keeps_unpartitioned_file(spark, tmp_path):
    """A file whose tuple lacks the spec field (older spec) must be
    conservatively KEPT when pruning through the source column."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        read_iceberg,
        transform_value,
    )

    root = str(tmp_path / "mx")
    groups = _bucket_table(root, legacy_rows=[(100, "old")])
    df = read_iceberg(spark, root, partitions={"k": 7})
    got = sorted(r["k"] for r in df.collect())
    assert got == sorted(groups[transform_value("bucket[4]", 7)] + [100])


def test_transform_prune_unknown_source_raises(spark, tmp_path):
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        read_iceberg,
    )

    root = str(tmp_path / "uk")
    _bucket_table(root)
    with pytest.raises(ValueError, match="unknown partition"):
        read_iceberg(spark, root, partitions={"v": "v7"})


def test_equality_delete_partition_scoped(spark, tmp_path):
    """A PARTITIONED equality delete (its manifest entry carries a
    partition tuple) applies only to data files sharing that tuple — a
    matching key in another partition must survive; an empty tuple
    stays a global delete."""
    root = str(tmp_path / "eqscope")
    fx = os.path.join(root, "data", "x.parquet")
    fy = os.path.join(root, "data", "y.parquet")
    _write_parquet(fx, [(1, "x"), (2, "x")], ["k", "seg"])
    _write_parquet(fy, [(1, "y"), (3, "y")], ["k", "seg"])
    dx = os.path.join(root, "data", "del-x.parquet")
    _write_parquet(dx, [(1,)], ["k"])
    entry_schema = json.loads(json.dumps(MANIFEST_ENTRY_SCHEMA))
    entry_schema["fields"][2]["type"]["fields"].append(
        {"name": "equality_ids", "type": ["null", {"type": "array", "items": "int"}]}
    )
    mf_schema = json.loads(json.dumps(MANIFEST_FILE_SCHEMA))
    mf_schema["fields"].append(
        {"name": "sequence_number", "type": ["null", "long"]}
    )
    m_data = os.path.join(root, "metadata", "m-data.avro")
    os.makedirs(os.path.dirname(m_data), exist_ok=True)
    ex = _entry(fx, "x", 2)
    ey = _entry(fy, "y", 2)
    for e in (ex, ey):
        e["data_file"]["equality_ids"] = None
    write_avro(m_data, entry_schema, [ex, ey])
    # delete k=1 SCOPED to partition seg=x, at a later sequence number
    m_del = os.path.join(root, "metadata", "m-del.avro")
    ed = _entry(dx, "x", 1, content=2)
    ed["data_file"]["equality_ids"] = [1]  # field id of k
    write_avro(m_del, entry_schema, [ed])
    ml = os.path.join(root, "metadata", "ml.avro")
    write_avro(
        ml,
        mf_schema,
        [
            {"manifest_path": m_data, "manifest_length": 1,
             "partition_spec_id": 0, "content": 0,
             "added_snapshot_id": 1, "sequence_number": 1},
            {"manifest_path": m_del, "manifest_length": 1,
             "partition_spec_id": 0, "content": 1,
             "added_snapshot_id": 2, "sequence_number": 2},
        ],
    )
    _metadata(
        root,
        [{"snapshot-id": 2, "timestamp-ms": 0, "summary": {},
          "manifest-list": ml}],
        current=2,
        fields=[("k", "long"), ("seg", "string")],
    )
    got = {(r["k"], r["seg"]) for r in read_iceberg(spark, root).collect()}
    # k=1 deleted ONLY in seg=x; the seg=y copy survives
    assert got == {(2, "x"), (1, "y"), (3, "y")}
    # the same delete under an UNPARTITIONED spec (empty partition
    # record — what a global delete writer emits) applies everywhere
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        MANIFEST_ENTRY_SCHEMA as PKG_ENTRY,
    )

    ed2 = {
        "status": 1,
        "snapshot_id": 2,
        "data_file": {
            "content": 2,
            "file_path": dx,
            "file_format": "PARQUET",
            "partition": {},
            "record_count": 1,
            "file_size_in_bytes": 1,
            "equality_ids": [1],
        },
    }
    write_avro(m_del, PKG_ENTRY, [ed2])
    got2 = {(r["k"], r["seg"]) for r in read_iceberg(spark, root).collect()}
    assert got2 == {(2, "x"), (3, "y")}


def test_inspection_metadata_tables(spark, iceberg_root):
    """snapshots/history/manifests/files/delete_files projections of
    the same manifest replay the read path uses."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        iceberg_meta_table,
    )

    snaps = iceberg_meta_table(spark, iceberg_root, "snapshots").collect()
    assert [(r["snapshot_id"], r["operation"]) for r in snaps] == [
        (1, "append"), (2, "overwrite")
    ]
    hist = {r["snapshot_id"]: r["is_current"]
            for r in iceberg_meta_table(spark, iceberg_root, "history").collect()}
    assert hist == {1: False, 2: True}
    # current snapshot: files A (live, status 0) and C (added); B is a
    # status-2 tombstone and must NOT appear
    files = iceberg_meta_table(spark, iceberg_root, "files").collect()
    got = sorted(
        (os.path.basename(r["file_path"]), r["record_count"],
         r["partition"]["seg"])
        for r in files
    )
    assert got == [("a.parquet", 2, "x"), ("c.parquet", 2, "y")]
    # snapshot 1 sees A and B
    f1 = iceberg_meta_table(spark, iceberg_root, "files", snapshot_id=1)
    assert sorted(os.path.basename(r["file_path"]) for r in f1.collect()) == [
        "a.parquet", "b.parquet"
    ]
    assert iceberg_meta_table(spark, iceberg_root, "delete_files").count() == 0
    assert iceberg_meta_table(spark, iceberg_root, "manifests").count() == 1
    parts = {
        r["partition"]["seg"]: (r["file_count"], r["record_count"])
        for r in iceberg_meta_table(spark, iceberg_root, "partitions").collect()
    }
    assert parts == {"x": (1, 2), "y": (1, 2)}
    with pytest.raises(ValueError, match="unknown metadata table"):
        iceberg_meta_table(spark, iceberg_root, "entries")
    with pytest.raises(ValueError, match="not found"):
        iceberg_meta_table(spark, iceberg_root, "files", snapshot_id=9)


def test_inspection_delete_files_view(spark, tmp_path):
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        append_position_deletes,
        export_iceberg,
        iceberg_meta_table,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.table import (
        SnapshotTable,
    )

    root = str(tmp_path / "dfm")
    t = SnapshotTable.create(spark, root, "k bigint, v double")
    t.append(spark.createDataFrame([(1, 1.0), (2, 2.0)], "k bigint, v double"))
    export_iceberg(t)
    files = iceberg_meta_table(spark, root, "files").collect()
    n_files = len(files)
    data_path = files[0]["file_path"]
    append_position_deletes(root, [(data_path, 0)])
    dels = iceberg_meta_table(spark, root, "delete_files").collect()
    assert len(dels) == 1 and dels[0]["content"] == 1
    assert dels[0]["record_count"] == 1
    assert dels[0]["sequence_number"] == 2
    # data files view unchanged, sequence numbers inherited
    assert iceberg_meta_table(spark, root, "files").count() == n_files


def test_named_refs_branches_and_tags(spark, iceberg_root):
    """Spec `refs`: branches/tags pin snapshot ids — read_iceberg(ref=)
    is the VERSION AS OF 'name' surface; the refs metadata table lists
    them."""
    import json as _json

    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        iceberg_meta_table,
        read_iceberg,
    )

    mdir = os.path.join(iceberg_root, "metadata")
    with open(os.path.join(mdir, "v1.metadata.json")) as f:
        meta = _json.load(f)
    meta["refs"] = {
        "main": {"snapshot-id": 2, "type": "branch"},
        "v1.0": {"snapshot-id": 1, "type": "tag"},
    }
    with open(os.path.join(mdir, "v1.metadata.json"), "w") as f:
        _json.dump(meta, f)
    assert {r["k"] for r in read_iceberg(spark, iceberg_root, ref="v1.0").collect()} == {
        1, 2, 10
    }
    assert {r["k"] for r in read_iceberg(spark, iceberg_root, ref="main").collect()} == {
        1, 2, 11, 12
    }
    refs = {
        r["name"]: (r["type"], r["snapshot_id"])
        for r in iceberg_meta_table(spark, iceberg_root, "refs").collect()
    }
    assert refs == {"main": ("branch", 2), "v1.0": ("tag", 1)}
    with pytest.raises(ValueError, match="not found"):
        read_iceberg(spark, iceberg_root, ref="nope")
    with pytest.raises(ValueError, match="at most one"):
        read_iceberg(spark, iceberg_root, ref="main", snapshot_id=1)


def test_export_incremental_manifests(spark, tmp_path):
    """export_iceberg is INCREMENTAL: an append reuses every previous
    manifest BY PATH and adds one manifest with only the new files; a
    merge rewrites only the manifests containing replaced files (with
    status-2 tombstones) — and every earlier snapshot stays readable."""
    import pyspark.sql.functions as F

    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        export_iceberg,
        read_iceberg,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.table import (
        SnapshotTable,
    )

    root = str(tmp_path / "incexp")
    t = SnapshotTable.create(
        spark, root, "k bigint, v double", bucket_key=["k"], num_buckets=2
    )
    t.append(
        spark.range(4).select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
    )
    assert export_iceberg(t) == 1

    def mlist(sid):
        with open(os.path.join(root, "metadata", "version-hint.text")) as f:
            hint = f.read().strip()
        with open(os.path.join(root, "metadata", f"v{hint}.metadata.json")) as f:
            meta = json.load(f)
        snap = next(s for s in meta["snapshots"] if s["snapshot-id"] == sid)
        _s, recs = read_avro(snap["manifest-list"])
        return recs

    m1_paths = [m["manifest_path"] for m in mlist(1)]
    t.append(
        spark.range(100, 102).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        )
    )
    assert export_iceberg(t) == 2
    m2 = mlist(2)
    # append: every snapshot-1 manifest reused BY PATH + exactly one new
    assert [m["manifest_path"] for m in m2][: len(m1_paths)] == m1_paths
    assert len(m2) == len(m1_paths) + 1
    assert m2[-1]["added_snapshot_id"] == 2
    # merge rewrites one bucket's file: only touched manifests change
    t.merge(spark.createDataFrame([(0, -99.0)], "k bigint, v double"))
    assert export_iceberg(t) == 3
    m3 = mlist(3)
    # the merge rewrote the k=0 bucket's file in BOTH appends' manifests
    # here, so reuse is not observable in this shape — the append case
    # above already pins carry-by-path; what the merge must show is
    # tombstoned rewrites, not full re-manifesting: snapshot 1/2 lists
    # still reference their ORIGINAL manifest files (never mutated)
    assert [m["manifest_path"] for m in mlist(2)] == [
        m["manifest_path"] for m in m2
    ]
    # rewritten manifests carry status-2 tombstones for replaced files
    tomb = 0
    for m in m3:
        _s, entries = read_avro(m["manifest_path"])
        tomb += sum(1 for e in entries if e.get("status") == 2)
    assert tomb >= 1
    # correctness across the lineage
    assert {r["k"] for r in read_iceberg(spark, root).collect()} == set(
        range(4)
    ) | {100, 101}
    assert (
        read_iceberg(spark, root)
        .filter("k = 0").collect()[0]["v"] == -99.0
    )
    assert read_iceberg(spark, root, snapshot_id=1).count() == 4
    assert read_iceberg(spark, root, snapshot_id=2).count() == 6
    # rewritten EXISTING/DELETED entries stamp their original data
    # sequence EXPLICITLY — the v2 spec grants manifest-list sequence
    # inheritance only to ADDED entries, so a foreign reader of a bare
    # status-0 entry would otherwise see no sequence at all
    saw_rewritten = 0
    for m in m3:
        _s, entries = read_avro(m["manifest_path"])
        for e in entries:
            if e.get("status") in (0, 2):
                saw_rewritten += 1
                assert e.get("sequence_number") is not None
                assert e["sequence_number"] <= m["sequence_number"]
    assert saw_rewritten >= 2


def test_avro_union_scalar_without_branch_raises(tmp_path):
    """A scalar value no union branch accepts must RAISE, not serialize
    under an arbitrary branch tag (which would silently coerce, e.g.
    the string "5" written as long 5)."""
    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "x", "type": ["null", "long"]}],
    }
    p = str(tmp_path / "u.avro")
    with pytest.raises(ValueError, match="no union branch"):
        write_avro(p, schema, [{"x": "5"}])
    # well-typed values still round-trip
    write_avro(p, schema, [{"x": 5}, {"x": None}])
    _s, recs = read_avro(p)
    assert recs == [{"x": 5}, {"x": None}]


# ---------------------------------------------------------------------------
# format-v3 deletion vectors (Puffin)
# ---------------------------------------------------------------------------


def test_puffin_codec_roundtrip(tmp_path):
    """Puffin file + deletion-vector-v1 blob codec (sources/puffin.py):
    descriptors round-trip through the footer, blob coordinates fetch
    the exact bytes, the roaring PORTABLE vector survives array- and
    bitmap-container densities plus multi-high-word 64-bit values, and
    the framing gates (CRC, magic, compressed footer, blob codec) all
    raise."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.dv import (
        roaring64_portable_read,
        roaring64_portable_write,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.puffin import (
        PuffinFormatError,
        dv_blob_decode,
        dv_blob_encode,
        read_blob,
        read_puffin_footer,
        write_puffin,
    )

    # array container (<4096), dense bitmap container, two high words
    vec_sets = [
        [0, 1, 7, 65_536, 131_071],
        list(range(70_000)),                       # bitmap container
        [5, (1 << 32) + 3, (3 << 32) + 9],         # multiple high keys
    ]
    for vals in vec_sets:
        assert roaring64_portable_read(roaring64_portable_write(vals)) == sorted(
            set(vals)
        )

    p = str(tmp_path / "dv.puffin")
    descs = write_puffin(
        p,
        [
            {"type": "deletion-vector-v1", "data": dv_blob_encode([2, 4, 9]),
             "properties": {"referenced-data-file": "f1", "cardinality": "3"}},
            {"type": "deletion-vector-v1", "data": dv_blob_encode([0])},
        ],
        properties={"created-by": "pytest"},
    )
    footer = read_puffin_footer(p)
    assert footer["properties"] == {"created-by": "pytest"}
    assert footer["blobs"] == descs
    assert dv_blob_decode(
        read_blob(p, descs[0]["offset"], descs[0]["length"])
    ) == [2, 4, 9]
    assert dv_blob_decode(
        read_blob(p, descs[1]["offset"], descs[1]["length"])
    ) == [0]
    with pytest.raises(PuffinFormatError, match="compression-codec"):
        read_blob(p, 0, 1, codec="zstd")
    # corrupt one payload byte inside blob 0 -> CRC-32 mismatch
    with open(p, "r+b") as f:
        f.seek(descs[0]["offset"] + 10)
        b = f.read(1)
        f.seek(descs[0]["offset"] + 10)
        f.write(bytes([b[0] ^ 0xFF]))
    with pytest.raises(PuffinFormatError, match="CRC-32"):
        dv_blob_decode(read_blob(p, descs[0]["offset"], descs[0]["length"]))
    # compressed-footer flag bit -> honest gate
    with open(p, "r+b") as f:
        f.seek(0, os.SEEK_END)
        end = f.tell()
        f.seek(end - 8)
        f.write(b"\x01")
    with pytest.raises(PuffinFormatError, match="compressed"):
        read_puffin_footer(p)
    with pytest.raises(PuffinFormatError, match="not a puffin"):
        bad = str(tmp_path / "not.puffin")
        with open(bad, "wb") as f:
            f.write(b"nope nope nope")
        read_puffin_footer(bad)


def test_deletion_vectors_applied(spark, iceberg_root):
    """A v3 deletion-vector snapshot removes exactly the referenced
    (file, ordinal) rows; broadcast and shuffled anti-joins agree;
    pre-delete snapshots time-travel across the v2->v3 format bump; a
    second DV snapshot stacks; v2 positional parquet deletes coexist
    with v3 vectors in one read."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        append_deletion_vectors,
        append_position_deletes,
    )

    fa = os.path.join(iceberg_root, "data", "a.parquet")
    fc = os.path.join(iceberg_root, "data", "c.parquet")
    # a.parquet rows: k=1 (pos 0), k=2 (pos 1); c.parquet: k=11, k=12
    sid = append_deletion_vectors(iceberg_root, {fa: [0], fc: [1]})
    assert sid == 3
    cur = read_iceberg(spark, iceberg_root)
    assert {(r["k"], r["seg"]) for r in cur.collect()} == {(2, "x"), (11, "y")}
    shuffled = read_iceberg(spark, iceberg_root, broadcast_deletes=False)
    assert {r["k"] for r in shuffled.collect()} == {2, 11}
    old = read_iceberg(spark, iceberg_root, snapshot_id=2)
    assert {r["k"] for r in old.collect()} == {1, 2, 11, 12}
    assert [h["operation"] for h in iceberg_snapshots(iceberg_root)][-1] == "delete"
    # second DV snapshot: the spec's replace-the-file's-vector shape
    # (new vector carries the union for that file)
    append_deletion_vectors(iceberg_root, {fc: [0, 1]})
    assert {r["k"] for r in read_iceberg(spark, iceberg_root).collect()} == {2}
    # v2 positional-delete parquet stacks on top of v3 vectors
    append_position_deletes(iceberg_root, [(fa, 1)])
    assert read_iceberg(spark, iceberg_root).count() == 0


def test_dv_decode_runs_on_executors_not_driver(spark, iceberg_root, monkeypatch):
    """A synthetic ~1.2M-position deletion vector: the roaring decode
    must happen inside Spark tasks (python workers), never as a
    driver-side position list — the driver module's dv_blob_decode is
    monkeypatched to explode, and the read must still succeed (worker
    interpreters import the real codec)."""
    import predicting_hospital_readmission_using_mimic_database_spark.sources.puffin as puffin_mod
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        append_deletion_vectors,
    )

    fa = os.path.join(iceberg_root, "data", "a.parquet")
    append_deletion_vectors(iceberg_root, {fa: list(range(1_200_000))})

    def _driver_decode_forbidden(*a, **k):
        raise AssertionError(
            "deletion vector decoded on the DRIVER (position list "
            "materialized driver-side)"
        )

    monkeypatch.setattr(puffin_mod, "dv_blob_decode", _driver_decode_forbidden)
    got = {r["k"] for r in read_iceberg(spark, iceberg_root).collect()}
    assert got == {11, 12}


def test_dv_cardinality_mismatch_raises(spark, iceberg_root):
    """The manifest entry's record_count must equal the decoded vector
    cardinality — a tampered count raises instead of silently trusting
    either side."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        MANIFEST_ENTRY_SCHEMA as MOD_ENTRY_SCHEMA,
        append_deletion_vectors,
    )

    fa = os.path.join(iceberg_root, "data", "a.parquet")
    append_deletion_vectors(iceberg_root, {fa: [0]})
    mpath = os.path.join(iceberg_root, "metadata", "manifest-dv-3.avro")
    _s, entries = read_avro(mpath)
    entries[0]["data_file"]["record_count"] = 999
    write_avro(mpath, MOD_ENTRY_SCHEMA, entries)
    with pytest.raises(Exception, match="cardinality"):
        read_iceberg(spark, iceberg_root).collect()


def test_puffin_delete_entry_missing_fields_raises(spark, tmp_path):
    """A PUFFIN delete entry without the v3 referenced_data_file /
    content_offset / content_size_in_bytes fields is malformed metadata
    and raises (the fixture schema has no such fields, so the reader
    sees all three as absent)."""
    root = str(tmp_path / "v3bad")
    f = os.path.join(root, "data", "a.parquet")
    _write_parquet(f, [(1, "x")], ["k", "seg"])
    md = _manifest(root, "md.avro", [_entry("dv.puffin", "x", 1, content=1,
                                            fmt="PUFFIN")])
    m = _manifest(root, "m.avro", [_entry(f, "x", 1)])
    p = os.path.join(root, "metadata", "ml.avro")
    write_avro(
        p,
        MANIFEST_FILE_SCHEMA,
        [
            {"manifest_path": m, "manifest_length": 1,
             "partition_spec_id": 0, "content": 0, "added_snapshot_id": 1},
            {"manifest_path": md, "manifest_length": 1,
             "partition_spec_id": 0, "content": 1, "added_snapshot_id": 1},
        ],
    )
    _metadata(
        root,
        [{"snapshot-id": 1, "timestamp-ms": 0, "summary": {},
          "manifest-list": p}],
        current=1,
        fields=[("k", "long"), ("seg", "string")],
        version=3,
    )
    with pytest.raises(IcebergProtocolError, match="referenced_data_file"):
        read_iceberg(spark, root)


# ---------------------------------------------------------------------------
# schema evolution (field-id resolution across schema vintages)
# ---------------------------------------------------------------------------


def _write_parquet_typed(path, cols: dict):
    """Columns as {name: (pyarrow type, values)} — exact physical types
    (int32 vs int64 matters: the vintage scan reads write-time types)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(
        pa.table({n: pa.array(v, type=t) for n, (t, v) in cols.items()}), path
    )


def _evo_root(tmp_path, name="evo", bal_type="int", extra_fields=()):
    """One-snapshot table (schema 0: k long, bal <bal_type>), snapshots
    stamped with schema-id the way every real v2 writer does."""
    import pyarrow as pa

    root = str(tmp_path / name)
    f = os.path.join(root, "data", "a.parquet")
    pa_t = pa.int32() if bal_type == "int" else pa.int64()
    _write_parquet_typed(
        f, {"k": (pa.int64(), [1, 2, 3]), "bal": (pa_t, [10, 20, 30])}
    )
    m = _manifest(root, "m1.avro", [_entry(f, None, 3)])
    ml = _manifest_list(root, "ml1.avro", [m])
    meta = {
        "format-version": 2,
        "table-uuid": "evo-fixture",
        "location": root,
        "current-snapshot-id": 1,
        "snapshots": [
            {"snapshot-id": 1, "timestamp-ms": 1000,
             "summary": {"operation": "append"},
             "manifest-list": ml, "schema-id": 0}
        ],
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "schemas": [
            {"type": "struct", "schema-id": 0, "fields": [
                {"id": 1, "name": "k", "required": False, "type": "long"},
                {"id": 2, "name": "bal", "required": False,
                 "type": bal_type},
            ] + list(extra_fields)}
        ],
        "current-schema-id": 0,
        "last-column-id": 2 + len(extra_fields),
    }
    os.makedirs(os.path.join(root, "metadata"), exist_ok=True)
    with open(os.path.join(root, "metadata", "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as fh:
        fh.write("1")
    return root, f


def test_schema_evolution_rename_promote_add(spark, tmp_path):
    """After rename bal->amount + int->long promotion + added column,
    pre-evolution files resolve by FIELD ID (write-time name read,
    current name restored, promotion cast) instead of silently going
    NULL; post-evolution files read directly; time travel to the old
    snapshot also serves the CURRENT schema (spec read semantics)."""
    import pyarrow as pa

    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        commit_schema_evolution,
    )

    root, _f = _evo_root(tmp_path)
    nf = os.path.join(root, "data", "b.parquet")
    _write_parquet_typed(
        nf,
        {"k": (pa.int64(), [4]), "amount": (pa.int64(), [40]),
         "tag": (pa.string(), ["new"])},
    )
    sid = commit_schema_evolution(
        root,
        [
            {"id": 1, "name": "k", "type": "long"},
            {"id": 2, "name": "amount", "type": "long"},
            {"id": 3, "name": "tag", "type": "string"},
        ],
        added_files=[(nf, 1)],
    )
    assert sid == 2
    cur = read_iceberg(spark, root)
    assert cur.columns == ["k", "amount", "tag"]
    assert {(r["k"], r["amount"], r["tag"]) for r in cur.collect()} == {
        (1, 10, None), (2, 20, None), (3, 30, None), (4, 40, "new")
    }
    assert [f.dataType.simpleString() for f in cur.schema.fields] == [
        "bigint", "bigint", "string"
    ]
    old = read_iceberg(spark, root, snapshot_id=1)
    assert old.columns == ["k", "amount", "tag"]
    assert {(r["k"], r["amount"]) for r in old.collect()} == {
        (1, 10), (2, 20), (3, 30)
    }


def test_schema_evolution_with_row_deletes(spark, tmp_path):
    """Row-level deletes over an evolved table: the (file, pos) keys
    attach PER VINTAGE SCAN before the union, so positional deletes
    and v3 deletion vectors both land on the right rows in old-name
    and new-name files alike."""
    import pyarrow as pa

    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        append_deletion_vectors,
        append_position_deletes,
        commit_schema_evolution,
    )

    root, f_old = _evo_root(tmp_path, "evod")
    nf = os.path.join(root, "data", "b.parquet")
    _write_parquet_typed(
        nf,
        {"k": (pa.int64(), [4, 5]), "amount": (pa.int64(), [40, 50]),
         "tag": (pa.string(), ["new", "new"])},
    )
    commit_schema_evolution(
        root,
        [
            {"id": 1, "name": "k", "type": "long"},
            {"id": 2, "name": "amount", "type": "long"},
            {"id": 3, "name": "tag", "type": "string"},
        ],
        added_files=[(nf, 2)],
    )
    append_position_deletes(root, [(f_old, 1)])  # k=2
    append_deletion_vectors(root, {nf: [0]})     # k=4
    got = {(r["k"], r["amount"]) for r in read_iceberg(spark, root).collect()}
    assert got == {(1, 10), (3, 30), (5, 50)}


def test_schema_evolution_dropped_name_reuse(spark, tmp_path):
    """A dropped field's NAME reused by a new field id: old files
    carry a physical column with the current name, but id resolution
    must NULL it (the old column is a different, dead field)."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        commit_schema_evolution,
    )

    root, _f = _evo_root(tmp_path, "evor", bal_type="long")
    commit_schema_evolution(
        root,
        [
            {"id": 1, "name": "k", "type": "long"},
            {"id": 9, "name": "bal", "type": "long"},  # reused name, new id
        ],
    )
    got = {(r["k"], r["bal"]) for r in read_iceberg(spark, root).collect()}
    assert got == {(1, None), (2, None), (3, None)}


def test_schema_evolution_illegal_promotion_raises(spark, tmp_path):
    """long -> int narrowing is not a spec promotion: honest raise,
    not a lossy cast."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        commit_schema_evolution,
    )

    root, _f = _evo_root(tmp_path, "evon", bal_type="long")
    commit_schema_evolution(
        root,
        [
            {"id": 1, "name": "k", "type": "long"},
            {"id": 2, "name": "bal", "type": "int"},
        ],
    )
    with pytest.raises(IcebergProtocolError, match="promotion"):
        read_iceberg(spark, root)


def test_schema_evolution_nested_drop_add_resolves(spark, tmp_path):
    """A struct whose only inner field was dropped and a NEW inner id
    added resolves by id: old files' struct reads with the new member
    NULL-filled (the dead member never resurrects under its name)."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        commit_schema_evolution,
    )

    nested_old = {
        "id": 3, "name": "s", "required": False,
        "type": {"type": "struct", "fields": [
            {"id": 4, "name": "a", "required": False, "type": "long"}]},
    }
    root, _f = _evo_root(tmp_path, "evs", extra_fields=(nested_old,))
    commit_schema_evolution(
        root,
        [
            {"id": 1, "name": "k", "type": "long"},
            {"id": 2, "name": "bal", "type": "int"},
            {"id": 3, "name": "s", "type": {"type": "struct", "fields": [
                {"id": 5, "name": "b", "required": False, "type": "long"}]}},
        ],
    )
    got = read_iceberg(spark, root)
    assert got.schema["s"].dataType.simpleString() == "struct<b:bigint>"
    assert {(r["k"], r["s"]) for r in got.collect()} == {
        (1, None), (2, None), (3, None)  # file lacks s: NULL struct
    }


def test_schema_evolution_nested_shape_change_raises(spark, tmp_path):
    """A field whose type changed SHAPE (struct -> primitive) has no
    id-preserving projection — honest raise, not a silent NULL."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        commit_schema_evolution,
    )

    nested_old = {
        "id": 3, "name": "s", "required": False,
        "type": {"type": "struct", "fields": [
            {"id": 4, "name": "a", "required": False, "type": "long"}]},
    }
    root, _f = _evo_root(tmp_path, "evshape", extra_fields=(nested_old,))
    commit_schema_evolution(
        root,
        [
            {"id": 1, "name": "k", "type": "long"},
            {"id": 2, "name": "bal", "type": "int"},
            {"id": 3, "name": "s", "type": "long"},
        ],
    )
    with pytest.raises(IcebergProtocolError, match="shape"):
        read_iceberg(spark, root)


def test_schema_evolution_nested_rename_promote_add(spark, tmp_path):
    """STRUCT-INTERNAL evolution resolves by field id exactly like the
    top level: an inner rename reads the write-time member name, an
    inner int->long promotion casts, an inner added member NULL-fills,
    a dropped member vanishes — and a NULL struct VALUE stays NULL
    (rebuilding via F.struct must not manufacture a non-null struct of
    NULL members). New-vintage files read directly; the union serves
    one current schema."""
    import pyarrow as pa

    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        commit_schema_evolution,
    )

    nested_old = {
        "id": 3, "name": "prof", "required": False,
        "type": {"type": "struct", "fields": [
            {"id": 4, "name": "cents", "required": False, "type": "int"},
            {"id": 5, "name": "seg", "required": False, "type": "string"},
            {"id": 6, "name": "legacy", "required": False, "type": "long"},
        ]},
    }
    root, _f = _evo_root(tmp_path, "evnest", extra_fields=(nested_old,))
    # overwrite the fixture data file with one that HAS the struct
    # column (row k=3 carries a NULL struct)
    prof_t = pa.struct(
        [("cents", pa.int32()), ("seg", pa.string()), ("legacy", pa.int64())]
    )
    _write_parquet_typed(
        _f,
        {
            "k": (pa.int64(), [1, 2, 3]),
            "bal": (pa.int32(), [10, 20, 30]),
            "prof": (
                prof_t,
                [
                    {"cents": 100, "seg": "A", "legacy": 7},
                    {"cents": 200, "seg": "B", "legacy": 8},
                    None,
                ],
            ),
        },
    )
    # evolution INSIDE prof: cents renamed->amount_cents + promoted
    # int->long (id 4), seg kept (id 5), legacy DROPPED (id 6),
    # tier ADDED (id 7)
    new_prof = {"type": "struct", "fields": [
        {"id": 4, "name": "amount_cents", "required": False, "type": "long"},
        {"id": 5, "name": "seg", "required": False, "type": "string"},
        {"id": 7, "name": "tier", "required": False, "type": "string"},
    ]}
    nf = os.path.join(root, "data", "b.parquet")
    new_prof_t = pa.struct(
        [("amount_cents", pa.int64()), ("seg", pa.string()),
         ("tier", pa.string())]
    )
    _write_parquet_typed(
        nf,
        {
            "k": (pa.int64(), [4]),
            "bal": (pa.int32(), [40]),
            "prof": (new_prof_t,
                     [{"amount_cents": 400, "seg": "D", "tier": "T1"}]),
        },
    )
    commit_schema_evolution(
        root,
        [
            {"id": 1, "name": "k", "type": "long"},
            {"id": 2, "name": "bal", "type": "int"},
            {"id": 3, "name": "prof", "type": new_prof},
        ],
        added_files=[(nf, 1)],
    )
    got = read_iceberg(spark, root)
    assert got.schema["prof"].dataType.simpleString() == (
        "struct<amount_cents:bigint,seg:string,tier:string>"
    )
    rows = {r["k"]: r["prof"] for r in got.collect()}
    assert rows[1] == (100, "A", None)   # renamed + promoted + NULL-fill
    assert rows[2] == (200, "B", None)
    assert rows[3] is None               # NULL struct stays NULL
    assert rows[4] == (400, "D", "T1")   # new vintage reads directly
    # time travel to the pre-evolution snapshot serves the CURRENT
    # nested schema too (spec read semantics)
    old = read_iceberg(spark, root, snapshot_id=1)
    assert {r["k"]: r["prof"] for r in old.collect()}[1] == (100, "A", None)


def test_v3_initial_default_fills_and_write_default_ignored(spark, tmp_path):
    """A column added with initial-default reads as THE DEFAULT for
    pre-addition files (never NULL); write-default is writer-side only
    and never applied on read; defaults inside a struct member fill the
    same way; the STREAMING projection fills the same defaults per
    field id (the old name-map path used to raise here)."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        commit_schema_evolution,
        vintage_projection,
    )

    root, _f = _evo_root(tmp_path, "evdef", bal_type="long")
    commit_schema_evolution(
        root,
        [
            {"id": 1, "name": "k", "type": "long"},
            {"id": 2, "name": "bal", "type": "long"},
            {"id": 3, "name": "tier", "type": "string",
             "initial-default": "STD", "write-default": "NEW"},
            {"id": 4, "name": "score", "type": "int", "initial-default": 7},
        ],
    )
    got = {(r["k"], r["tier"], r["score"])
           for r in read_iceberg(spark, root).collect()}
    assert got == {(1, "STD", 7), (2, "STD", 7), (3, "STD", 7)}
    # the streaming projection (one file = one vintage per input
    # partition) fills the SAME defaults — real read, no gate
    with open(os.path.join(root, "metadata", "v2.metadata.json")) as fh:
        meta = json.load(fh)
    out_json = next(
        s for s in meta["schemas"]
        if s["schema-id"] == meta["current-schema-id"]
    )
    proj = vintage_projection(meta, 1, out_json)
    assert [(src, fill) for src, _conv, fill in proj] == [
        ("k", None), ("bal", None), (None, "STD"), (None, 7)
    ]


def test_v3_initial_default_inside_struct(spark, tmp_path):
    """initial-default on a member ADDED inside a struct fills through
    the nested rebuild; a NULL struct value still stays NULL (the
    default is per-member, not a struct resurrection)."""
    import pyarrow as pa

    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        commit_schema_evolution,
    )

    nested_old = {
        "id": 3, "name": "prof", "required": False,
        "type": {"type": "struct", "fields": [
            {"id": 4, "name": "cents", "required": False, "type": "long"}]},
    }
    root, _f = _evo_root(tmp_path, "evdefn", extra_fields=(nested_old,))
    prof_t = pa.struct([("cents", pa.int64())])
    _write_parquet_typed(
        _f,
        {
            "k": (pa.int64(), [1, 2]),
            "bal": (pa.int32(), [10, 20]),
            "prof": (prof_t, [{"cents": 100}, None]),
        },
    )
    commit_schema_evolution(
        root,
        [
            {"id": 1, "name": "k", "type": "long"},
            {"id": 2, "name": "bal", "type": "int"},
            {"id": 3, "name": "prof", "type": {"type": "struct", "fields": [
                {"id": 4, "name": "cents", "required": False, "type": "long"},
                {"id": 5, "name": "seg", "required": False, "type": "string",
                 "initial-default": "A"},
            ]}},
        ],
    )
    rows = {r["k"]: r["prof"] for r in read_iceberg(spark, root).collect()}
    assert rows[1] == (100, "A")
    assert rows[2] is None  # NULL struct stays NULL


def _lineage_root(tmp_path, name, entry_frid=None, mfrid=100,
                  snap_extra=None, fmt=3):
    """One-file v3 table (k 1..3) with configurable lineage stamps."""
    import pyarrow as pa

    root = str(tmp_path / name)
    f = os.path.join(root, "data", "a.parquet")
    _write_parquet_typed(
        f, {"k": (pa.int64(), [1, 2, 3]), "bal": (pa.int64(), [10, 20, 30])}
    )
    e = _entry(f, None, 3)
    if entry_frid is not None:
        e["data_file"]["first_row_id"] = entry_frid
    m = _manifest(root, "m1.avro", [e])
    ml = _manifest_list(
        root, "ml1.avro", [m], first_row_id=mfrid, sequence_number=1
    )
    snap = {"snapshot-id": 1, "timestamp-ms": 1000,
            "summary": {"operation": "append"},
            "manifest-list": ml, "schema-id": 0, "first-row-id": mfrid}
    if snap_extra:
        snap.update(snap_extra)
    meta = {
        "format-version": fmt,
        "table-uuid": "lin",
        "location": root,
        "current-snapshot-id": 1,
        "snapshots": [snap],
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "schemas": [{"type": "struct", "schema-id": 0, "fields": [
            {"id": 1, "name": "k", "required": False, "type": "long"},
            {"id": 2, "name": "bal", "required": False, "type": "long"},
        ]}],
        "current-schema-id": 0,
        "last-column-id": 2,
        "next-row-id": (mfrid or 0) + 3,
    }
    os.makedirs(os.path.join(root, "metadata"), exist_ok=True)
    with open(os.path.join(root, "metadata", "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as fh:
        fh.write("1")
    return root, f


def test_row_lineage_explicit_beats_inherited(spark, tmp_path):
    """An entry's EXPLICIT first_row_id wins over inheritance; the
    sequence number lands in _last_updated_sequence_number."""
    root, _f = _lineage_root(tmp_path, "linx", entry_frid=500, mfrid=100)
    got = {
        r["k"]: (r["_row_id"], r["_last_updated_sequence_number"])
        for r in read_iceberg(spark, root, row_lineage=True).collect()
    }
    assert got == {1: (500, 1), 2: (501, 1), 3: (502, 1)}
    # without the flag the columns don't appear
    assert "_row_id" not in read_iceberg(spark, root).columns


def test_row_lineage_materialized_beats_fresh(spark, tmp_path):
    """A rewritten file persisting the reserved materialized lineage
    columns serves the STORED identities; rows with NULL stored values
    (new rows in the same file) fall back to fresh computation — the
    same coalesce precedence as the Delta twin."""
    import pyarrow as pa

    root = str(tmp_path / "linmat")
    f = os.path.join(root, "data", "a.parquet")
    _write_parquet_typed(
        f,
        {
            "k": (pa.int64(), [1, 2, 3]),
            "bal": (pa.int64(), [10, 20, 30]),
            # k=1,2 carried across a rewrite keep ids 500/501 @ seq 1;
            # k=3 is new (NULL stored -> fresh 102 @ manifest seq)
            "_row_id": (pa.int64(), [500, 501, None]),
            "_last_updated_sequence_number": (pa.int64(), [1, 1, None]),
        },
    )
    e = _entry(f, None, 3)
    m = _manifest(root, "m1.avro", [e])
    ml = _manifest_list(
        root, "ml1.avro", [m], first_row_id=100, sequence_number=7
    )
    meta = {
        "format-version": 3,
        "table-uuid": "linmat",
        "location": root,
        "current-snapshot-id": 1,
        "snapshots": [{"snapshot-id": 1, "timestamp-ms": 1000,
                       "summary": {"operation": "append"},
                       "manifest-list": ml, "schema-id": 0,
                       "first-row-id": 100}],
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "schemas": [{"type": "struct", "schema-id": 0, "fields": [
            {"id": 1, "name": "k", "required": False, "type": "long"},
            {"id": 2, "name": "bal", "required": False, "type": "long"},
        ]}],
        "current-schema-id": 0,
        "last-column-id": 2,
        "next-row-id": 103,
    }
    os.makedirs(os.path.join(root, "metadata"), exist_ok=True)
    with open(os.path.join(root, "metadata", "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as fh:
        fh.write("1")
    got = {
        r["k"]: (r["_row_id"], r["_last_updated_sequence_number"])
        for r in read_iceberg(spark, root, row_lineage=True).collect()
    }
    assert got == {1: (500, 1), 2: (501, 1), 3: (102, 7)}


def test_row_lineage_composes_with_deletes(spark, tmp_path):
    """Row ids are PHYSICAL positions in the file — a positional delete
    removes its row but never renumbers the survivors."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        append_position_deletes,
    )

    root, f = _lineage_root(tmp_path, "lind", mfrid=100)
    append_position_deletes(root, [(f, 1)])  # k=2 at position 1
    got = {
        r["k"]: r["_row_id"]
        for r in read_iceberg(spark, root, row_lineage=True).collect()
    }
    assert got == {1: 100, 3: 102}  # survivor ids unchanged


def test_row_lineage_composes_with_schema_evolution(spark, tmp_path):
    """row_lineage over a table whose files span SCHEMA VINTAGES: the
    lineage stamps thread through the per-vintage scans (extras ride
    _vintage_scan), so renamed columns resolve AND every row still
    carries its id."""
    import pyarrow as pa

    from predicting_hospital_readmission_using_mimic_database_spark.sources.avro_ocf import (
        read_avro as _ra,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        commit_schema_evolution,
    )

    root, _f = _lineage_root(tmp_path, "linevo", mfrid=100)
    # evolution: bal renamed -> amount; new file under the new name
    nf = os.path.join(root, "data", "b.parquet")
    _write_parquet_typed(
        nf, {"k": (pa.int64(), [4]), "amount": (pa.int64(), [40])}
    )
    commit_schema_evolution(
        root,
        [
            {"id": 1, "name": "k", "type": "long"},
            {"id": 2, "name": "amount", "type": "long"},
        ],
        added_files=[(nf, 1)],
    )
    # the evolution commit's manifest list must carry lineage stamps
    # too (commit_schema_evolution is a plain fixture writer): stamp
    # sequence + first_row_id on the new snapshot's manifest records
    with open(os.path.join(root, "metadata", "version-hint.text")) as fh:
        hint = fh.read().strip()
    with open(os.path.join(root, "metadata", f"v{hint}.metadata.json")) as fh:
        meta = json.load(fh)
    snap2 = next(
        s_ for s_ in meta["snapshots"]
        if s_["snapshot-id"] == meta["current-snapshot-id"]
    )
    snap2["first-row-id"] = 200
    _s, ml = _ra(snap2["manifest-list"])
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        MANIFEST_FILE_SCHEMA as MOD_MF,
    )

    stamped = []
    for m in ml:
        m = dict(m)
        if m.get("sequence_number") is None:
            m["sequence_number"] = 1 if m.get("added_snapshot_id") == 1 else 2
        if m.get("first_row_id") is None:
            m["first_row_id"] = 100 if m["sequence_number"] == 1 else 200
        stamped.append(m)
    write_avro(snap2["manifest-list"], MOD_MF, stamped)
    with open(os.path.join(root, "metadata", f"v{hint}.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    got = {
        r["k"]: (r["amount"], r["_row_id"])
        for r in read_iceberg(spark, root, row_lineage=True).collect()
    }
    # old-vintage files: renamed column resolves AND ids inherit from
    # the old manifest; the new file starts at the new range
    assert got == {1: (10, 100), 2: (20, 101), 3: (30, 102), 4: (40, 200)}


def test_row_lineage_gates(spark, tmp_path):
    """Lineage on a v2 table raises; v3 metadata whose files carry no
    resolvable first_row_id raises (never a silent NULL id)."""
    root, _f = _lineage_root(tmp_path, "linv2", fmt=2)
    with pytest.raises(IcebergProtocolError, match="format-version 3"):
        read_iceberg(spark, root, row_lineage=True)
    root2, _f2 = _lineage_root(tmp_path, "linmiss", mfrid=None)
    with pytest.raises(IcebergProtocolError, match="first_row_id"):
        read_iceberg(spark, root2, row_lineage=True)


def test_v3_row_lineage_fields_tolerated(spark, tmp_path):
    """next-row-id / first-row-id (v3 row lineage) are writer bookkeeping
    this reader must tolerate — same rows, same travel."""
    root, _f = _evo_root(tmp_path, "evlin")
    mp = os.path.join(root, "metadata", "v1.metadata.json")
    with open(mp) as fh:
        meta = json.load(fh)
    meta["format-version"] = 3
    meta["next-row-id"] = 99
    meta["row-lineage"] = True
    for s in meta["snapshots"]:
        s["first-row-id"] = 0
    with open(mp, "w") as fh:
        json.dump(meta, fh)
    got = {(r["k"], r["bal"]) for r in read_iceberg(spark, root).collect()}
    assert got == {(1, 10), (2, 20), (3, 30)}


def test_schema_evolution_list_of_struct_element(spark, tmp_path):
    """Evolution inside a LIST's struct ELEMENT resolves per element
    via F.transform: inner rename + promotion apply to every element,
    NULL lists stay NULL."""
    import pyarrow as pa

    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        commit_schema_evolution,
    )

    elem_old = {"type": "struct", "fields": [
        {"id": 5, "name": "qty", "required": False, "type": "int"}]}
    nested_old = {
        "id": 3, "name": "items", "required": False,
        "type": {"type": "list", "element-id": 4, "element": elem_old,
                 "element-required": False},
    }
    root, _f = _evo_root(tmp_path, "evlist", extra_fields=(nested_old,))
    el_t = pa.struct([("qty", pa.int32())])
    _write_parquet_typed(
        _f,
        {
            "k": (pa.int64(), [1, 2]),
            "bal": (pa.int32(), [10, 20]),
            "items": (pa.list_(el_t), [[{"qty": 1}, {"qty": 2}], None]),
        },
    )
    elem_new = {"type": "struct", "fields": [
        {"id": 5, "name": "quantity", "required": False, "type": "long"}]}
    commit_schema_evolution(
        root,
        [
            {"id": 1, "name": "k", "type": "long"},
            {"id": 2, "name": "bal", "type": "int"},
            {"id": 3, "name": "items",
             "type": {"type": "list", "element-id": 4, "element": elem_new,
                      "element-required": False}},
        ],
    )
    got = {r["k"]: r["items"] for r in read_iceberg(spark, root).collect()}
    assert got[1] == [(1,), (2,)] and got[1][0].quantity == 1
    assert got[2] is None


def test_schema_evolution_addonly_keeps_single_scan(spark, tmp_path):
    """An added column alone (no rename, no promotion) needs no vintage
    projection: the plan keeps ONE parquet scan node over all files and
    old files NULL-fill the new column natively."""
    import pyarrow as pa

    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        commit_schema_evolution,
    )

    root, _f = _evo_root(tmp_path, "evadd")
    nf = os.path.join(root, "data", "b.parquet")
    _write_parquet_typed(
        nf,
        {"k": (pa.int64(), [4]), "bal": (pa.int32(), [40]),
         "tag": (pa.string(), ["new"])},
    )
    commit_schema_evolution(
        root,
        [
            {"id": 1, "name": "k", "type": "long"},
            {"id": 2, "name": "bal", "type": "int"},
            {"id": 3, "name": "tag", "type": "string"},
        ],
        added_files=[(nf, 1)],
    )
    df = read_iceberg(spark, root)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan[:1500]
    assert "Union" not in plan
    assert {(r["k"], r["bal"], r["tag"]) for r in df.collect()} == {
        (1, 10, None), (2, 20, None), (3, 30, None), (4, 40, "new")
    }


def test_statistics_metadata_table(spark, iceberg_root):
    """The `statistics` view surfaces the spec's table-statistics list
    (Puffin stats files with blob metadata) verbatim; empty when the
    table has none."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        iceberg_meta_table,
    )

    assert iceberg_meta_table(spark, iceberg_root, "statistics").count() == 0
    mdir = os.path.join(iceberg_root, "metadata")
    with open(os.path.join(mdir, "v1.metadata.json")) as f:
        meta = json.load(f)
    meta["statistics"] = [
        {
            "snapshot-id": 2,
            "statistics-path": os.path.join(mdir, "stats-2.puffin"),
            "file-size-in-bytes": 123,
            "blob-metadata": [
                {"type": "apache-datasketches-theta-v1", "fields": [1]},
                {"type": "deletion-vector-v1"},
            ],
        }
    ]
    with open(os.path.join(mdir, "v1.metadata.json"), "w") as f:
        json.dump(meta, f)
    rows = iceberg_meta_table(spark, iceberg_root, "statistics").collect()
    assert len(rows) == 1
    assert rows[0]["snapshot_id"] == 2
    assert rows[0]["blob_types"] == [
        "apache-datasketches-theta-v1", "deletion-vector-v1"
    ]
    with pytest.raises(ValueError, match="unknown metadata table"):
        iceberg_meta_table(spark, iceberg_root, "nope")


def test_predicates_resolve_against_current_schema(spark, iceberg_root, tmp_path):
    """Predicate name binding uses the CURRENT schema only (field ids
    are the bounds keys; a historical schema could bind a reused name
    to a dead id and over-prune). Also: v1 metadata (bare `schema`
    key) resolves — previously the schemas-list loop saw nothing."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        commit_schema_evolution,
    )

    # v2 with an evolution in history: predicates on the current name
    # keep working (no bounds in the fixture manifests -> all kept)
    commit_schema_evolution(
        iceberg_root,
        [
            {"id": 1, "name": "k", "type": "long"},
            {"id": 9, "name": "seg", "type": "string"},  # reused name, new id
        ],
    )
    got = read_iceberg(
        spark, iceberg_root, predicates=[("seg", "=", "x")]
    )
    assert got.count() == 4  # conservative keep, never over-pruned
    with pytest.raises(ValueError, match="unknown column"):
        read_iceberg(spark, iceberg_root, predicates=[("nope", "=", 1)])


def test_manifest_summary_pruning(spark, tmp_path, monkeypatch):
    """Manifest-list FIELD SUMMARIES (spec field 507) cut data
    manifests before they are ever parsed: a one-partition read of a
    two-manifest table fetches ONE manifest (read_avro call-counted),
    and a bucket-transform summary prunes by the TRANSFORMED source
    value. Conservative: a summary-less record and a wanted NULL with
    contains_null both keep the manifest."""
    import predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg as ICE
    from predicting_hospital_readmission_using_mimic_database_spark.sources.avro_ocf import write_avro
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        MANIFEST_FILE_SCHEMA as MOD_MF_SCHEMA,
    )

    root = str(tmp_path / "msum")
    fa = os.path.join(root, "data", "a.parquet")
    fb = os.path.join(root, "data", "b.parquet")
    _write_parquet(fa, [(1, "x")], ["k", "seg"])
    _write_parquet(fb, [(2, "y")], ["k", "seg"])
    ma = _manifest(root, "ma.avro", [_entry(fa, "x", 1)])
    mb = _manifest(root, "mb.avro", [_entry(fb, "y", 1)])

    def summary(lo, hi, contains_null=False):
        return [{"contains_null": contains_null, "contains_nan": None,
                 "lower_bound": lo.encode(), "upper_bound": hi.encode()}]

    ml = os.path.join(root, "metadata", "ml.avro")
    write_avro(
        ml,
        MOD_MF_SCHEMA,
        [
            {"manifest_path": ma, "manifest_length": 1,
             "partition_spec_id": 0, "content": 0, "added_snapshot_id": 1,
             "sequence_number": 1, "partitions": summary("x", "x")},
            {"manifest_path": mb, "manifest_length": 1,
             "partition_spec_id": 0, "content": 0, "added_snapshot_id": 1,
             "sequence_number": 1, "partitions": summary("y", "y")},
        ],
    )
    meta = {
        "format-version": 2, "table-uuid": "msum", "location": root,
        "current-snapshot-id": 1,
        "snapshots": [{"snapshot-id": 1, "timestamp-ms": 0,
                       "summary": {"operation": "append"},
                       "manifest-list": ml, "schema-id": 0}],
        "partition-specs": [{"spec-id": 0, "fields": [
            {"name": "seg", "transform": "identity", "source-id": 2,
             "field-id": 1000}]}],
        "default-spec-id": 0,
        "schemas": [{"type": "struct", "schema-id": 0, "fields": [
            {"id": 1, "name": "k", "required": False, "type": "long"},
            {"id": 2, "name": "seg", "required": False, "type": "string"},
        ]}],
        "current-schema-id": 0,
    }
    mdir = os.path.join(root, "metadata")
    with open(os.path.join(mdir, "v1.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(mdir, "version-hint.text"), "w") as f:
        f.write("1")

    seen: list[str] = []
    real = ICE.read_avro

    def counting(path, *a, **k):
        seen.append(os.path.basename(path))
        return real(path, *a, **k)

    monkeypatch.setattr(ICE, "read_avro", counting)
    got = read_iceberg(spark, root, partitions={"seg": "y"})
    assert {r["k"] for r in got.collect()} == {2}
    assert "mb.avro" in seen and "ma.avro" not in seen
    # unfiltered read parses both
    seen.clear()
    assert read_iceberg(spark, root).count() == 2
    assert "ma.avro" in seen and "mb.avro" in seen
    # filter on a non-partition column's name: no spec field serves it
    # at the summary tier -> nothing pruned there (per-file _admits
    # then raises for unknown keys as before)
    with pytest.raises(ValueError, match="unknown partition"):
        read_iceberg(spark, root, partitions={"k": 1})

    # bucket-transform summaries prune by TRANSFORMED source values
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        manifest_summary_filter,
        transform_value,
    )
    import struct

    bmeta = {
        "partition-specs": [{"spec-id": 0, "fields": [
            {"name": "k_bucket", "transform": "bucket[4]", "source-id": 1,
             "field-id": 1000}]}],
        "schemas": [{"type": "struct", "schema-id": 0, "fields": [
            {"id": 1, "name": "k", "required": False, "type": "long"}]}],
        "current-schema-id": 0,
    }
    b = transform_value("bucket[4]", 34)  # spec vector: bucket 3

    def brec(lo, hi):
        return {"partition_spec_id": 0, "content": 0, "partitions": [
            {"contains_null": False, "contains_nan": None,
             "lower_bound": struct.pack("<i", lo),
             "upper_bound": struct.pack("<i", hi)}]}

    flt = manifest_summary_filter(bmeta, {"k": 34})
    assert flt(brec(b, b)) is True
    assert flt(brec((b + 1) % 4, (b + 1) % 4)) is False
    # stored-value key (partition field name) compares untransformed
    flt2 = manifest_summary_filter(bmeta, {"k_bucket": b})
    assert flt2(brec(b, b)) is True and flt2(brec(b + 1, b + 1)) is False
    # wanted NULL: only contains_null admits
    flt3 = manifest_summary_filter(bmeta, {"k": None})
    assert flt3(brec(0, 3)) is False
    rec_null = brec(0, 3)
    rec_null["partitions"][0]["contains_null"] = True
    assert flt3(rec_null) is True
    # summary-less record: conservative keep
    assert flt({"partition_spec_id": 0, "content": 0}) is True


def test_changelog_scan(spark, tmp_path):
    """read_iceberg_changelog: per-snapshot file diffs become
    insert/delete rows; a file added AND removed inside the window
    fans out to both change rows from one scan; windows bound the
    feed (row-level delete replay is pinned separately)."""
    import pyarrow as pa

    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        read_iceberg_changelog,
    )

    root = str(tmp_path / "clog")
    fa = os.path.join(root, "data", "a.parquet")
    fb = os.path.join(root, "data", "b.parquet")
    _write_parquet_typed(
        fa, {"k": (pa.int64(), [1, 2]), "bal": (pa.int64(), [10, 20])}
    )
    _write_parquet_typed(
        fb, {"k": (pa.int64(), [3]), "bal": (pa.int64(), [30])}
    )
    m1 = _manifest(root, "m1.avro", [_entry(fa, "A", 2)])
    ml1 = _manifest_list(root, "ml1.avro", [m1])
    # snapshot 2 adds fb; snapshot 3 removes fb again (add+remove in
    # one window -> both rows) and keeps fa
    m2 = _manifest(root, "m2.avro",
                   [_entry(fa, "A", 2, status=0), _entry(fb, "A", 1)])
    ml2 = _manifest_list(root, "ml2.avro", [m2])
    e_rm = _entry(fb, "A", 1, status=2)
    m3 = _manifest(root, "m3.avro",
                   [_entry(fa, "A", 2, status=0), e_rm])
    ml3 = _manifest_list(root, "ml3.avro", [m3])
    snaps = [
        {"snapshot-id": 1, "timestamp-ms": 1, "manifest-list": ml1,
         "summary": {"operation": "append"}, "schema-id": 0},
        {"snapshot-id": 2, "timestamp-ms": 2, "manifest-list": ml2,
         "summary": {"operation": "append"}, "schema-id": 0},
        {"snapshot-id": 3, "timestamp-ms": 3, "manifest-list": ml3,
         "summary": {"operation": "delete"}, "schema-id": 0},
    ]
    _metadata(root, snaps, 3, [("k", "long"), ("bal", "long")])
    full = read_iceberg_changelog(spark, root)
    got = sorted(
        (r["k"], r["_change_type"], r["_change_ordinal"],
         r["_commit_snapshot_id"])
        for r in full.collect()
    )
    assert got == [
        (1, "insert", 0, 1), (2, "insert", 0, 1),
        (3, "delete", 2, 3), (3, "insert", 1, 2),
    ]
    # bounded window: only snapshot 3's delete
    win = read_iceberg_changelog(spark, root, from_snapshot_id=2)
    assert [(r["k"], r["_change_type"], r["_change_ordinal"])
            for r in win.collect()] == [(3, "delete", 0)]
    # empty window keeps the changelog shape
    empty = read_iceberg_changelog(
        spark, root, from_snapshot_id=3, to_snapshot_id=3
    )
    assert empty.count() == 0 and "_change_type" in empty.columns


def test_changelog_position_delete_replay(spark, tmp_path):
    """Row-level delete REPLAY (past the official runtime's gate): a
    positional delete inside the window emits the struck row as a
    DELETE change; rows struck BEFORE a window never resurrect — not
    as spurious deletes when their file is removed, and not in
    windows that start after the strike."""
    import pyarrow as pa

    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        append_position_deletes,
        read_iceberg_changelog,
    )

    root, f = _evo_root(tmp_path, "clogd", bal_type="long")
    append_position_deletes(root, [(f, 0)])  # snapshot 2 strikes k=1
    full = read_iceberg_changelog(spark, root)
    got = sorted(
        (r["k"], r["_change_type"], r["_change_ordinal"],
         r["_commit_snapshot_id"])
        for r in full.collect()
    )
    assert got == [
        (1, "delete", 1, 2), (1, "insert", 0, 1),
        (2, "insert", 0, 1), (3, "insert", 0, 1),
    ]
    # snapshot 3 adds a plain data file — the WINDOW (2, 3] carries a
    # PRE-window strike: k=1 must stay invisible, only k=9 inserts
    nf = os.path.join(root, "data", "c.parquet")
    _write_parquet_typed(
        nf, {"k": (pa.int64(), [9]), "bal": (pa.int64(), [90])}
    )
    with open(os.path.join(root, "metadata", "version-hint.text")) as fh:
        hint = fh.read().strip()
    mp = os.path.join(root, "metadata", f"v{hint}.metadata.json")
    with open(mp) as fh:
        meta = json.load(fh)
    m3 = _manifest(root, "m3c.avro", [_entry(nf, None, 1)])
    prev = next(
        s_ for s_ in meta["snapshots"]
        if s_["snapshot-id"] == meta["current-snapshot-id"]
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.avro_ocf import (
        read_avro as _ra,
    )

    _s, prev_ml = _ra(prev["manifest-list"])
    ml3 = os.path.join(root, "metadata", "ml3c.avro")
    write_avro(
        ml3,
        MANIFEST_FILE_SCHEMA,
        list(prev_ml) + [{
            "manifest_path": m3, "manifest_length": 1,
            "partition_spec_id": 0, "content": 0,
            "added_snapshot_id": 3, "sequence_number": 3,
            "first_row_id": None,
        }],
    )
    sid3 = {"snapshot-id": 3, "timestamp-ms": 3000,
            "summary": {"operation": "append"},
            "manifest-list": ml3, "schema-id": 0}
    meta["snapshots"].append(sid3)
    meta["current-snapshot-id"] = 3
    with open(mp, "w") as fh:
        json.dump(meta, fh)
    win = read_iceberg_changelog(
        spark, root,
        from_snapshot_id=meta["snapshots"][-2]["snapshot-id"],
    )
    assert [
        (r["k"], r["_change_type"], r["_commit_snapshot_id"])
        for r in win.collect()
    ] == [(9, "insert", 3)]


def test_changelog_dv_replay(spark, iceberg_root):
    """Deletion-vector REPLAY in the changelog (past the official
    runtime's gate): the DV commit emits exactly its struck rows as
    DELETE changes — the overwrite history before it still reads as
    file-level delete+insert pairs — and a window opened after the
    strike is empty instead of resurrecting anything."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        append_deletion_vectors,
        read_iceberg_changelog,
    )

    fa = os.path.join(iceberg_root, "data", "a.parquet")
    fc = os.path.join(iceberg_root, "data", "c.parquet")
    assert append_deletion_vectors(iceberg_root, {fa: [0], fc: [1]}) == 3
    full = read_iceberg_changelog(spark, iceberg_root)
    got = sorted(
        (r["k"], r["_change_type"], r["_change_ordinal"],
         r["_commit_snapshot_id"])
        for r in full.collect()
    )
    assert got == [
        (1, "delete", 2, 3), (1, "insert", 0, 1),
        (2, "insert", 0, 1),
        (10, "delete", 1, 2), (10, "insert", 0, 1),
        (11, "insert", 1, 2),
        (12, "delete", 2, 3), (12, "insert", 1, 2),
    ]
    win = read_iceberg_changelog(spark, iceberg_root, from_snapshot_id=2)
    assert sorted(
        (r["k"], r["_change_type"], r["_change_ordinal"])
        for r in win.collect()
    ) == [(1, "delete", 0), (12, "delete", 0)]
    after = read_iceberg_changelog(spark, iceberg_root, from_snapshot_id=3)
    assert after.count() == 0 and "_change_type" in after.columns


def test_changelog_equality_replay(spark, tmp_path):
    """Equality-delete REPLAY in the changelog: the Flink-CDC-shaped
    delete commit emits the matching rows (null-safe, sequence-ordered)
    as DELETE changes; a matching row re-inserted AFTER the delete at a
    higher sequence number surfaces as a plain insert, untouched."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        append_equality_deletes,
        export_iceberg,
        read_iceberg_changelog,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.table import (
        SnapshotTable,
    )

    root = str(tmp_path / "eqclog")
    t = SnapshotTable.create(spark, root, "k bigint, seg string")
    t.append(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "a"), (4, None)], "k bigint, seg string"
        )
    )
    assert export_iceberg(t) == 1
    sid = append_equality_deletes(
        root, [{"seg": "a"}, {"seg": None}], ["seg"]
    )
    assert sid == 2
    full = read_iceberg_changelog(spark, root)
    got = sorted(
        (r["k"], r["_change_type"], r["_change_ordinal"],
         r["_commit_snapshot_id"])
        for r in full.collect()
    )
    assert got == [
        (1, "delete", 1, 2), (1, "insert", 0, 1),
        (2, "insert", 0, 1),
        (3, "delete", 1, 2), (3, "insert", 0, 1),
        (4, "delete", 1, 2), (4, "insert", 0, 1),
    ]
    # window after the strike: nothing resurrects
    assert read_iceberg_changelog(spark, root, from_snapshot_id=2).count() == 0


def test_changelog_replay_composes_with_schema_evolution(spark, tmp_path):
    """Delete replay over a window whose files span SCHEMA VINTAGES:
    the liveness-keyed scan threads the (file, pos) keys through the
    per-vintage projection, so a renamed column resolves AND the
    struck row still emits exactly one delete under the CURRENT
    name."""
    import pyarrow as pa

    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        append_position_deletes,
        commit_schema_evolution,
        read_iceberg_changelog,
    )

    root, f = _evo_root(tmp_path, "clogevo", bal_type="long")
    nf = os.path.join(root, "data", "b.parquet")
    _write_parquet_typed(
        nf, {"k": (pa.int64(), [9]), "amount": (pa.int64(), [90])}
    )
    commit_schema_evolution(
        root,
        [
            {"id": 1, "name": "k", "type": "long"},
            {"id": 2, "name": "amount", "type": "long"},  # renamed
        ],
        added_files=[(nf, 1)],
    )
    append_position_deletes(root, [(f, 1)])  # strikes k=2 (old vintage)
    got = sorted(
        (r["k"], r["amount"], r["_change_type"], r["_change_ordinal"])
        for r in read_iceberg_changelog(spark, root).collect()
    )
    assert got == [
        (1, 10, "insert", 0),
        (2, 20, "delete", 2), (2, 20, "insert", 0),
        (3, 30, "insert", 0),
        (9, 90, "insert", 1),
    ]


def test_nested_equality_deletes_batch_and_changelog(spark, tmp_path):
    """Equality ids on STRUCT-NESTED fields resolve to dotted paths and
    compare at the leaf — in the batch read AND the changelog replay.
    Null leaves match null-safely (a null struct row dies to a
    null-value delete); a MIXED (top-level, nested) id pair matches
    exact pairs only."""
    import pyarrow.parquet as pq

    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        append_equality_deletes,
        export_iceberg,
        read_iceberg,
        read_iceberg_changelog,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.table import (
        SnapshotTable,
    )

    root = str(tmp_path / "neq")
    t = SnapshotTable.create(
        spark, root, "k bigint, p struct<seg:string,c:bigint>"
    )
    t.append(
        spark.createDataFrame(
            [(1, ("a", 10)), (2, ("b", 20)), (3, ("a", 30)), (4, (None, 40))],
            "k bigint, p struct<seg:string,c:bigint>",
        )
    )
    assert export_iceberg(t) == 1
    # nested single-path delete: seg='a' and seg IS NULL both die
    append_equality_deletes(
        root, [{"p.seg": "a"}, {"p.seg": None}], ["p.seg"]
    )
    # mixed (top-level, nested) pair: no row has (k=2, c=99) -> no-op
    append_equality_deletes(root, [{"k": 2, "p.c": 99}], ["k", "p.c"])
    got = {
        (r["k"], r["p"]["seg"], r["p"]["c"])
        for r in read_iceberg(spark, root).collect()
    }
    assert got == {(2, "b", 20)}
    # the delete file is REAL nested parquet (struct shell in footer)
    dfile = os.path.join(root, "metadata", "eq-delete-2.parquet")
    assert pq.ParquetFile(dfile).schema_arrow.field("p").type.num_fields == 1
    # pre-delete time travel unaffected
    assert read_iceberg(spark, root, snapshot_id=1).count() == 4
    # changelog replays the nested strikes as delete rows at the eq
    # snapshot's ordinal; the no-op pair delete emits nothing
    chg = sorted(
        (r["k"], r["p"]["seg"], r["_change_type"], r["_change_ordinal"])
        for r in read_iceberg_changelog(spark, root).collect()
    )
    assert chg == [
        (1, "a", "delete", 1), (1, "a", "insert", 0),
        (2, "b", "insert", 0),
        (3, "a", "delete", 1), (3, "a", "insert", 0),
        (4, None, "delete", 1), (4, None, "insert", 0),
    ]


def test_eq_field_path_resolution_gates():
    """_eq_field_paths: ids resolve through struct nesting only —
    unknown ids, ids under list/map, and non-primitive targets raise."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        IcebergProtocolError,
        _eq_field_paths,
    )

    schema_json = {
        "fields": [
            {"id": 1, "name": "k", "type": "long"},
            {"id": 2, "name": "p", "type": {
                "type": "struct",
                "fields": [{"id": 3, "name": "s", "type": "string"}],
            }},
            {"id": 4, "name": "arr", "type": {
                "type": "list", "element-id": 5,
                "element": {
                    "type": "struct",
                    "fields": [{"id": 6, "name": "x", "type": "long"}],
                },
            }},
        ]
    }
    assert _eq_field_paths(schema_json, [3, 1]) == [
        ("p.s", "string"), ("k", "long")
    ]
    with pytest.raises(IcebergProtocolError, match="list/map"):
        _eq_field_paths(schema_json, [6])  # under a repeated type
    with pytest.raises(IcebergProtocolError, match="non-primitive"):
        _eq_field_paths(schema_json, [2])  # a struct itself
    with pytest.raises(IcebergProtocolError, match="list/map"):
        _eq_field_paths(schema_json, [99])  # unknown id


def test_nested_eq_delete_composes_with_nested_evolution(spark, tmp_path):
    """A nested equality delete resolved against the CURRENT schema
    strikes matching rows in files of EVERY vintage: old-vintage files
    (inner member under its write-time name and narrower type) project
    through the vintage scan before the leaf comparison, so the same
    dotted path kills the value in both layouts."""
    import glob
    import shutil

    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        append_equality_deletes,
        commit_schema_evolution,
        export_iceberg,
        read_iceberg,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.table import (
        SnapshotTable,
    )

    root = str(tmp_path / "neqevo")
    t = SnapshotTable.create(spark, root, "k bigint, p struct<b:int,s:string>")
    t.append(
        spark.createDataFrame(
            [(1, (10, "a")), (2, (20, "b")), (3, (30, "a"))],
            "k bigint, p struct<b:int,s:string>",
        )
    )
    assert export_iceberg(t) == 1
    # foreign evolution: inner id 3 RENAMED b -> bal, promoted
    # int -> long; one file appended under the NEW inner layout
    new = spark.createDataFrame(
        [(9, (20, "c"))], "k bigint, p struct<bal:bigint,s:string>"
    )
    stage = os.path.join(root, "evo.stage")
    new.coalesce(1).write.parquet(stage)
    nf = os.path.join(root, "data-evo.parquet")
    shutil.move(glob.glob(os.path.join(stage, "part-*.parquet"))[0], nf)
    shutil.rmtree(stage)
    commit_schema_evolution(
        root,
        [
            {"id": 1, "name": "k", "type": "long"},
            {"id": 2, "name": "p", "type": {
                "type": "struct",
                "fields": [
                    {"id": 3, "name": "bal", "required": False,
                     "type": "long"},
                    {"id": 4, "name": "s", "required": False,
                     "type": "string"},
                ],
            }},
        ],
        added_files=[(nf, 1)],
    )
    # current-path delete p.bal=20: strikes k=2 (old vintage, written
    # as int member 'b') AND k=9 (new vintage) in one delete file
    append_equality_deletes(root, [{"p.bal": 20}], ["p.bal"])
    got = {
        (r["k"], r["p"]["bal"], r["p"]["s"])
        for r in read_iceberg(spark, root).collect()
    }
    assert got == {(1, 10, "a"), (3, 30, "a")}


def test_encode_bound_roundtrips_through_decode():
    """encode_bound is the exact inverse of decode_bound for every
    type the export harvests — including date/timestamp values in the
    ISO-string form the SnapshotTable commit log keeps."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        decode_bound,
        encode_bound,
    )

    cases = [
        ("int", 42, 42),
        ("int", -7, -7),
        ("long", 1 << 40, 1 << 40),
        ("double", 3.25, 3.25),
        ("float", 1.5, 1.5),
        ("string", "abc", "abc"),
        ("boolean", True, True),
        ("boolean", False, False),
        # ISO date -> days since epoch
        ("date", "1970-01-11", 10),
        # ISO timestamp -> microseconds since epoch
        ("timestamp", "1970-01-01T00:00:01.500000", 1_500_000),
        ("timestamptz", "1970-01-01T00:00:02+00:00", 2_000_000),
    ]
    for itype, val, want in cases:
        b = encode_bound(itype, val)
        assert b is not None, (itype, val)
        assert decode_bound(itype, b) == want, (itype, val)
    # unsupported / null values refuse quietly (no bound, never wrong)
    assert encode_bound("decimal(9,2)", 1) is None
    assert encode_bound("long", None) is None


def test_export_bounds_prune_and_survive_rewrites(spark, tmp_path):
    """export_iceberg publishes Appendix-D column bounds from the
    table's stats_cols; read_iceberg(predicates=) prunes on them; a
    later export that rewrites a manifest (delete) CARRIES the
    surviving entries' bounds; tables without stats_cols stay
    boundless (conservative full scans, results still exact)."""
    import pyspark.sql.functions as F

    from predicting_hospital_readmission_using_mimic_database_spark.sources.avro_ocf import (
        read_avro,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        export_iceberg,
        read_iceberg,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.table import (
        SnapshotTable,
    )

    root = str(tmp_path / "bnd")
    t = SnapshotTable.create(
        spark, root, "k bigint, v bigint", bucket_key=["k"],
        num_buckets=2, stats_cols=["k", "v"],
    )
    # two range-disjoint appends -> 4 files with disjoint k-bounds
    t.append(spark.range(1, 51).coalesce(1).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")))
    t.append(spark.range(51, 101).coalesce(1).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")))
    assert export_iceberg(t) == 1
    # the manifest entries carry kv-array bounds (the foreign shape)
    import glob as _glob

    m = sorted(_glob.glob(os.path.join(root, "metadata", "manifest-1*.avro")))
    _s, entries = read_avro(m[0])
    df0 = entries[0]["data_file"]
    assert df0["lower_bounds"] and df0["upper_bounds"]
    assert {kv["key"] for kv in df0["lower_bounds"]} == {1, 2}
    assert all(isinstance(kv["value"], (bytes, bytearray))
               for kv in df0["lower_bounds"])
    got = read_iceberg(spark, root, predicates=[("k", ">", 50)])
    assert len(got.inputFiles()) == 2
    assert len(read_iceberg(spark, root).inputFiles()) == 4
    assert got.filter(F.col("k") > 50).count() == 50
    # equality predicate prunes to the one covering range
    one = read_iceberg(spark, root, predicates=[("v", "=", 100)])
    assert len(one.inputFiles()) <= 2
    assert {r["k"] for r in one.filter(F.col("v") == 100).collect()} == {10}
    # a delete rewrites the touched manifest: carried entries keep
    # their bounds, so pruning still works on the second snapshot
    t.delete(F.col("k") == 1)
    assert export_iceberg(t) == 2
    got2 = read_iceberg(spark, root, predicates=[("k", ">", 50)])
    assert len(got2.inputFiles()) == 2
    assert got2.filter(F.col("k") > 50).count() == 50
    # no stats_cols -> no bounds -> full (conservative) file list
    t2 = SnapshotTable.create(
        spark, str(tmp_path / "nostats"), "k bigint", bucket_key=["k"],
        num_buckets=2,
    )
    t2.append(spark.range(10).coalesce(1).select(F.col("id").alias("k")))
    export_iceberg(t2)
    all_files = read_iceberg(
        spark, str(tmp_path / "nostats"), predicates=[("k", ">", 5)]
    )
    assert len(all_files.inputFiles()) == 2


def test_expire_snapshots_gc_and_gates(spark, tmp_path):
    """expire_iceberg_snapshots: old snapshots leave the lineage, their
    orphaned manifests GC, protected snapshots (current + refs)
    survive, expired time travel raises, data files stay unless
    delete_data_files=True, and a stream checkpointed across the
    expiry detects the lineage change."""
    import glob
    import json as _json

    import pyspark.sql.functions as F

    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        _metadata_path,
        expire_iceberg_snapshots,
        export_iceberg,
        read_iceberg,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.table import (
        SnapshotTable,
    )

    root = str(tmp_path / "exp")
    t = SnapshotTable.create(spark, root, "k bigint, v bigint")
    for i in range(4):
        t.append(
            spark.range(i * 10, i * 10 + 5).coalesce(1).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("v")
            )
        )
        assert export_iceberg(t) == i + 1
    # tag snapshot 2 with a ref: it must survive keep_last=1
    mp = _metadata_path(root)
    with open(mp) as f:
        meta = _json.load(f)
    meta["refs"] = {"keepme": {"snapshot-id": 2, "type": "tag"}}
    with open(mp, "w") as f:
        _json.dump(meta, f)
    n_avro_before = len(glob.glob(os.path.join(root, "metadata", "*.avro")))
    n_parquet_before = len(
        glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True)
    )
    expired = expire_iceberg_snapshots(root, keep_last=1)
    assert expired == [1, 3]  # 2 is ref-protected, 4 is current+tail
    # orphaned manifest lists GC'd; shared data files untouched
    assert len(glob.glob(os.path.join(root, "metadata", "*.avro"))) < n_avro_before
    assert len(
        glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True)
    ) == n_parquet_before
    # current + ref'd snapshots still read
    assert read_iceberg(spark, root).count() == 20
    assert read_iceberg(spark, root, snapshot_id=2).count() == 10
    assert read_iceberg(spark, root, ref="keepme").count() == 10
    # expired time travel raises with the retained lineage
    with pytest.raises(ValueError, match="not found"):
        read_iceberg(spark, root, snapshot_id=1)
    # criteria validation
    with pytest.raises(ValueError, match="keep_last"):
        expire_iceberg_snapshots(root)


def test_expire_snapshots_stream_detects_lineage_change(spark, tmp_path):
    """Offsets RE-ANCHOR by snapshot id: expiry of OLDER snapshots
    shifts positions but the stream resumes from its pinned snapshot
    (emitting only the genuinely-new commits); only when the pinned
    snapshot ITSELF was expired does the stream refuse to resume —
    silently replaying the wrong window is never an option."""
    import pyspark.sql.functions as F

    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        expire_iceberg_snapshots,
        export_iceberg,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg_stream import (
        register_iceberg_stream,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.table import (
        SnapshotTable,
    )
    from tests.test_iceberg_stream import _drain

    root = str(tmp_path / "expstream")
    t = SnapshotTable.create(spark, root, "k bigint")
    for i in range(3):
        t.append(spark.range(i * 10, i * 10 + 3).coalesce(1).select(
            F.col("id").alias("k")))
        export_iceberg(t)
    register_iceberg_stream(spark)
    ck = str(tmp_path / "ck")
    got = _drain(spark, root, ck, startingSnapshotCount=0)
    assert len(got) == 9
    # expiry keeps the pinned snapshot (3): the stream SURVIVES and
    # emits only the new append
    expire_iceberg_snapshots(root, keep_last=1)
    t.append(spark.range(100, 103).coalesce(1).select(F.col("id").alias("k")))
    export_iceberg(t)
    got2 = _drain(spark, root, ck, startingSnapshotCount=0)
    assert sorted(r[0] for r in got2) == [100, 101, 102]
    # ...but expiry of the PINNED snapshot itself refuses to resume
    t.append(spark.range(200, 202).coalesce(1).select(F.col("id").alias("k")))
    export_iceberg(t)
    expire_iceberg_snapshots(root, keep_last=1)  # drops the pinned snap 4
    with pytest.raises(Exception) as ei:
        _drain(spark, root, ck, startingSnapshotCount=0)
    assert "expired past the stream's position" in str(ei.value)


def test_expire_snapshots_deletes_data_files_when_asked(spark, tmp_path):
    """delete_data_files=True GC's data files referenced only by the
    expired snapshots — the self-contained-table mode (NEVER the
    default: a zero-copy export shares the host table's files)."""
    import glob

    import pyspark.sql.functions as F

    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        expire_iceberg_snapshots,
        export_iceberg,
        read_iceberg,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.table import (
        SnapshotTable,
    )

    root = str(tmp_path / "gc")
    t = SnapshotTable.create(
        spark, root, "k bigint", bucket_key=["k"], num_buckets=1
    )
    t.append(spark.range(5).coalesce(1).select(F.col("id").alias("k")))
    export_iceberg(t)
    # a MERGE rewrites the bucket: the old bucket file is referenced
    # only by snapshot 1 after the rewrite
    t.merge(spark.createDataFrame([(100,)], "k bigint"))
    export_iceberg(t)
    n_before = len(
        glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True)
    )
    expired = expire_iceberg_snapshots(
        root, keep_last=1, delete_data_files=True
    )
    assert expired == [1]
    n_after = len(
        glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True)
    )
    assert n_after < n_before
    assert {r["k"] for r in read_iceberg(spark, root).collect()} == set(
        range(5)
    ) | {100}


def test_rewrite_manifests_compacts_metadata(spark, tmp_path):
    """rewrite_iceberg_manifests: N data manifests -> 1 with entries
    carried as EXISTING + explicit sequence numbers; reads identical,
    equality-delete ordering preserved, changelog emits NOTHING for
    the replace snapshot, pre-rewrite time travel intact, expire can
    then GC the old manifests, no-op on single-manifest tables."""
    import glob

    import pyspark.sql.functions as F

    from predicting_hospital_readmission_using_mimic_database_spark.sources.avro_ocf import (
        read_avro,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        _localize,
        _metadata_path,
        append_equality_deletes,
        expire_iceberg_snapshots,
        export_iceberg,
        read_iceberg,
        read_iceberg_changelog,
        rewrite_iceberg_manifests,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.table import (
        SnapshotTable,
    )
    import json as _json

    root = str(tmp_path / "rwm")
    t = SnapshotTable.create(spark, root, "k bigint, v bigint")
    for i in range(3):
        t.append(spark.range(i * 10, i * 10 + 4).coalesce(1).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")))
        assert export_iceberg(t) == i + 1
    # an equality delete whose ordering depends on data sequence nums
    append_equality_deletes(root, [{"k": 1}], ["k"])
    before = {(r["k"], r["v"]) for r in read_iceberg(spark, root).collect()}
    assert (1, 2) not in before and len(before) == 11
    sid = rewrite_iceberg_manifests(root)
    assert sid == 5
    with open(_metadata_path(root)) as f:
        meta = _json.load(f)
    cur = next(s for s in meta["snapshots"]
               if s["snapshot-id"] == meta["current-snapshot-id"])
    assert cur["summary"]["operation"] == "replace"
    _s, manifests = read_avro(_localize(cur["manifest-list"], root))
    assert len([m for m in manifests if m.get("content", 0) == 0]) == 1
    assert len([m for m in manifests if m.get("content", 0) == 1]) == 1
    # byte-identical reads: the eq delete still orders via the carried
    # explicit sequence numbers
    after = {(r["k"], r["v"]) for r in read_iceberg(spark, root).collect()}
    assert after == before
    # the changelog emits NOTHING for the replace snapshot (file set
    # unchanged -> liveness unchanged at that boundary)
    assert read_iceberg_changelog(spark, root, from_snapshot_id=4).count() == 0
    # pre-rewrite time travel unaffected
    assert read_iceberg(spark, root, snapshot_id=3).count() == 12
    # expiry after the rewrite GC's the old manifests
    n_avro = len(glob.glob(os.path.join(root, "metadata", "*.avro")))
    assert expire_iceberg_snapshots(root, keep_last=1) == [1, 2, 3, 4]
    assert len(glob.glob(os.path.join(root, "metadata", "*.avro"))) < n_avro
    assert {(r["k"], r["v"])
            for r in read_iceberg(spark, root).collect()} == before
    # single-manifest table: no-op
    assert rewrite_iceberg_manifests(root) is None


def test_ref_write_surface(spark, tmp_path):
    """set_iceberg_ref / drop_iceberg_ref: tags pin snapshots through
    expiry until dropped; read_iceberg(ref=) serves them; branches
    move."""
    import pyspark.sql.functions as F

    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        drop_iceberg_ref,
        expire_iceberg_snapshots,
        export_iceberg,
        set_iceberg_ref,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.table import (
        SnapshotTable,
    )

    root = str(tmp_path / "refs")
    t = SnapshotTable.create(
        spark, root, "k bigint", bucket_key=["k"], num_buckets=2
    )
    t.append(spark.range(5).select(F.col("id").alias("k")))
    assert export_iceberg(t) == 1
    assert set_iceberg_ref(root, "v1.0") == 1  # defaults to current, tag
    t.append(spark.range(5, 9).select(F.col("id").alias("k")))
    assert export_iceberg(t) == 2
    set_iceberg_ref(root, "main", type="branch")  # branch at 2
    assert read_iceberg(spark, root, ref="v1.0").count() == 5
    assert read_iceberg(spark, root, ref="main").count() == 9
    # expiry: the tag protects snapshot 1
    assert expire_iceberg_snapshots(root, keep_last=1) == []
    assert read_iceberg(spark, root, ref="v1.0").count() == 5
    # drop the tag: snapshot 1 becomes expirable
    drop_iceberg_ref(root, "v1.0")
    assert expire_iceberg_snapshots(root, keep_last=1) == [1]
    with pytest.raises(ValueError, match="not found"):
        read_iceberg(spark, root, ref="v1.0")
    # validation
    with pytest.raises(ValueError, match="tag"):
        set_iceberg_ref(root, "x", type="head")
    with pytest.raises(ValueError, match="not found"):
        set_iceberg_ref(root, "x", snapshot_id=99)
    with pytest.raises(ValueError, match="not found"):
        drop_iceberg_ref(root, "nope")


def test_concurrent_iceberg_exporters_cas(spark, tmp_path):
    """export_iceberg's commit is a CAS on vN.metadata.json: a loser
    whose refresh was stale detects the taken version, refreshes to the
    LATEST metadata (by file number, never the reader hint), and
    converges — the final table replays exact with no clobbered
    snapshot."""
    import pyspark.sql.functions as F

    import predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg as I
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        export_iceberg,
        read_iceberg,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.table import (
        SnapshotTable,
    )

    df = spark.range(0, 100).select(F.col("id").alias("k"))
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), "k bigint",
        bucket_key=["k"], num_buckets=2,
    )
    t.append(df)
    assert export_iceberg(t) == 1
    t.append(df.select((F.col("k") + 1000).alias("k")))

    # exporter B (second handle) commits v2 while A's refresh is stale:
    # force A's first refresh to see v1 only, so its CAS on v2 loses
    t2 = SnapshotTable(spark, t.root)
    assert export_iceberg(t2) == 2  # B wins version 2
    mdir = os.path.join(t.root, "metadata")
    orig = I._latest_metadata_path
    state = {"stale": True}

    def stale_once(root):
        if state["stale"]:
            state["stale"] = False
            return os.path.join(mdir, "v1.metadata.json")
        return orig(root)

    I._latest_metadata_path = stale_once
    try:
        sid = export_iceberg(t)
    finally:
        I._latest_metadata_path = orig
    # A lost the CAS at v2, refreshed to B's metadata, found the diff
    # empty, and converged to B's snapshot — no v3 double-commit
    assert sid == 2
    assert not os.path.exists(os.path.join(mdir, "v3.metadata.json"))
    got = {r["k"] for r in read_iceberg(spark, t.root).collect()}
    assert got == set(range(100)) | {k + 1000 for k in range(100)}

    # with genuinely NEW data, the rebased retry lands at v3
    t.append(df.select((F.col("k") + 2000).alias("k")))
    state["stale"] = True
    I._latest_metadata_path = stale_once
    try:
        sid2 = export_iceberg(t)
    finally:
        I._latest_metadata_path = orig
    assert sid2 == 3
    assert os.path.exists(os.path.join(mdir, "v3.metadata.json"))
    got2 = {r["k"] for r in read_iceberg(spark, t.root).collect()}
    assert got2 == got | {k + 2000 for k in range(100)}


def test_cas_loser_cleans_attempt_files(spark, tmp_path):
    """A CAS loser's attempt-unique manifest / manifest-list avro files
    are deleted before the retry: they were written into metadata/
    before the put-if-absent failed, no committed metadata references
    them, and orphan GC only scans data/ — without the cleanup every
    lost CAS leaks one avro set forever."""
    import pyspark.sql.functions as F

    import predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg as I
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        export_iceberg,
        read_iceberg,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.table import (
        SnapshotTable,
    )

    df = spark.range(0, 50).select(F.col("id").alias("k"))
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), "k bigint",
        bucket_key=["k"], num_buckets=2,
    )
    t.append(df)
    assert export_iceberg(t) == 1
    mdir = os.path.join(t.root, "metadata")

    # foreign writer B takes v2 while A's refresh is stale
    t2 = SnapshotTable(spark, t.root)
    t.append(df.select((F.col("k") + 100).alias("k")))
    assert export_iceberg(t2) == 2
    orig = I._latest_metadata_path
    state = {"stale": True}

    def stale_once(root):
        if state["stale"]:
            state["stale"] = False
            return os.path.join(mdir, "v1.metadata.json")
        return orig(root)

    I._latest_metadata_path = stale_once
    try:
        sid = export_iceberg(t)
    finally:
        I._latest_metadata_path = orig
    assert sid == 2  # converged to B's snapshot (same diff)

    # every avro in metadata/ is referenced by some committed metadata
    referenced: set[str] = set()
    for name in os.listdir(mdir):
        if not name.endswith(".metadata.json"):
            continue
        with open(os.path.join(mdir, name)) as f:
            meta = json.load(f)
        for s in meta.get("snapshots", []):
            ml = s["manifest-list"]
            referenced.add(os.path.basename(ml))
            ml_abs = ml if os.path.isabs(ml) else os.path.join(t.root, ml)
            _s, recs = read_avro(ml_abs)
            for rec in recs:
                referenced.add(os.path.basename(rec["manifest_path"]))
    on_disk = {n for n in os.listdir(mdir) if n.endswith(".avro")}
    assert on_disk == referenced  # the loser's attempt files are gone
    got = {r["k"] for r in read_iceberg(spark, t.root).collect()}
    assert got == set(range(50)) | {k + 100 for k in range(50)}


def test_version_hint_is_monotonic(tmp_path):
    """version-hint.text never regresses: a slower CAS winner reaching
    the hint write after a faster one must not roll the hint back to
    its older version (readers trust the hint first)."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        _advance_version_hint,
    )

    mdir = str(tmp_path / "metadata")
    os.makedirs(mdir)
    hint = os.path.join(mdir, "version-hint.text")
    _advance_version_hint(mdir, 5)
    assert open(hint).read().strip() == "5"
    _advance_version_hint(mdir, 3)  # late out-of-order writer
    assert open(hint).read().strip() == "5"
    _advance_version_hint(mdir, 7)
    assert open(hint).read().strip() == "7"
    # corrupt hint self-heals forward
    with open(hint, "w") as f:
        f.write("garbage")
    _advance_version_hint(mdir, 2)
    assert open(hint).read().strip() == "2"


def test_write_audit_publish_lifecycle(spark, tmp_path):
    """WAP: export_iceberg(branch=) stages a snapshot WITHOUT advancing
    main; the audit reads the branch ref; publish_iceberg_wap
    fast-forwards when main never moved, cherry-picks a single staged
    APPEND when main advanced, and REFUSES multi-commit or non-append
    divergent branches; a rejected audit (drop_iceberg_ref) never
    leaks rows to main."""
    import pyspark.sql.functions as F

    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        IcebergProtocolError,
        append_position_deletes,
        drop_iceberg_ref,
        export_iceberg,
        publish_iceberg_wap,
        read_iceberg,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.table import (
        SnapshotTable,
    )

    df = spark.range(0, 100).select(F.col("id").alias("k"))
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), "k bigint",
        bucket_key=["k"], num_buckets=2,
    )
    # staging on a never-exported table refuses
    t.append(df)
    with pytest.raises(IcebergProtocolError, match="never exported"):
        export_iceberg(t, branch="audit")
    sid1 = export_iceberg(t)

    def main_keys():
        return {r["k"] for r in read_iceberg(spark, t.root).collect()}

    base = set(range(100))
    assert main_keys() == base

    # STAGE: main stays put, the branch serves the staged snapshot
    t.append(df.select((F.col("k") + 1000).alias("k")))
    sid2 = export_iceberg(t, branch="audit")
    assert sid2 > sid1
    assert main_keys() == base
    staged = {r["k"] for r in
              read_iceberg(spark, t.root, ref="audit").collect()}
    assert staged == base | {k + 1000 for k in range(100)}
    # consecutive staged commits CHAIN on the branch
    t.append(df.select((F.col("k") + 2000).alias("k")))
    sid3 = export_iceberg(t, branch="audit")
    assert sid3 > sid2 and main_keys() == base

    # PUBLISH (fast-forward: main never advanced); chain length 2 is ok
    out = publish_iceberg_wap(t.root, "audit")
    assert out == {"snapshot_id": sid3, "mode": "fast-forward"}
    want = base | {k + 1000 for k in range(100)} | {
        k + 2000 for k in range(100)}
    assert main_keys() == want
    # the audit branch was dropped on publish
    with pytest.raises(IcebergProtocolError, match="not found"):
        publish_iceberg_wap(t.root, "audit")

    # REJECTED audit: drop the ref — main never sees the staged rows
    t.append(df.select((F.col("k") + 3000).alias("k")))
    export_iceberg(t, branch="bad-audit")
    assert main_keys() == want
    drop_iceberg_ref(t.root, "bad-audit")
    assert main_keys() == want

    # CHERRY-PICK: stage an append, then main advances independently
    # (a concurrent positional DELETE lands); publish replays the
    # staged files on TOP of main's state
    t2 = SnapshotTable(spark, t.root)
    t2._refresh()
    sid_stage = export_iceberg(t2, branch="audit2")
    # (the branch head is the same staged snapshot as bad-audit's data;
    # main now deletes one row of the published base)
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        iceberg_meta_table,
    )

    victim_file = sorted(
        r["file_path"]
        for r in iceberg_meta_table(spark, t.root, "files").collect()
    )[0]
    append_position_deletes(t.root, [(victim_file, 0)])
    n_main = read_iceberg(spark, t.root).count()
    assert n_main == len(want) - 1
    out2 = publish_iceberg_wap(t.root, "audit2")
    assert out2["mode"] == "cherry-pick"
    got = main_keys()
    assert {k + 3000 for k in range(100)} <= got
    assert len(got) >= n_main  # main's delete still honored
    assert read_iceberg(spark, t.root).count() == n_main + 100

    # a staged OVERWRITE cannot cherry-pick once main advanced
    t.delete(F.col("k") < 10)
    sid_ow = export_iceberg(t, branch="audit3")
    append_position_deletes(t.root, [(victim_file, 1)])
    with pytest.raises(IcebergProtocolError, match="APPEND"):
        publish_iceberg_wap(t.root, "audit3")
    drop_iceberg_ref(t.root, "audit3")


def test_wap_noop_stage_creates_branch(spark, tmp_path):
    """An idempotent re-stage with NO upstream changes must still leave
    the WAP pipeline runnable: the branch ref materializes pointing at
    the base snapshot, the audit reads it, and publish is a no-op."""
    import pyspark.sql.functions as F

    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        export_iceberg,
        publish_iceberg_wap,
        read_iceberg,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.table import (
        SnapshotTable,
    )

    df = spark.range(0, 20).select(F.col("id").alias("k"))
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), "k bigint",
        bucket_key=["k"], num_buckets=2,
    )
    t.append(df)
    sid = export_iceberg(t)
    # no-change stage: the ref lands on the base snapshot
    assert export_iceberg(t, branch="audit") == sid
    got = {r["k"] for r in
           read_iceberg(spark, t.root, ref="audit").collect()}
    assert got == set(range(20))
    out = publish_iceberg_wap(t.root, "audit")
    assert out == {"snapshot_id": sid, "mode": "noop"}
    # the branch was dropped on the no-op publish too
    import pytest as _pytest

    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        IcebergProtocolError,
    )

    with _pytest.raises(IcebergProtocolError, match="not found"):
        publish_iceberg_wap(t.root, "audit")


def test_wap_id_staged_publish(spark, tmp_path):
    """The spark.wap.id staging flavor: export_iceberg(wap_id=) lands a
    ref-less snapshot whose summary carries wap.id, main never moves;
    publish_iceberg_wap(wap_id=) cherry-picks/fast-forwards it by id,
    records published-wap-id, and REFUSES a double publish; a rejected
    staged snapshot is simply unreferenced (never reaches main)."""
    import pyspark.sql.functions as F

    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        IcebergProtocolError,
        export_iceberg,
        publish_iceberg_wap,
        read_iceberg,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.table import (
        SnapshotTable,
    )

    df = spark.range(0, 50).select(F.col("id").alias("k"))
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), "k bigint",
        bucket_key=["k"], num_buckets=2,
    )
    t.append(df)
    with pytest.raises(ValueError, match="mutually exclusive"):
        export_iceberg(t, branch="b", wap_id="w")
    sid1 = export_iceberg(t)

    def main_keys():
        return {r["k"] for r in read_iceberg(spark, t.root).collect()}

    base = set(range(50))
    # STAGE by wap id: main stays put; audit reads the snapshot id
    t.append(df.select((F.col("k") + 100).alias("k")))
    staged = export_iceberg(t, wap_id="etl-42")
    assert staged > sid1 and main_keys() == base
    audit = {r["k"] for r in read_iceberg(
        spark, t.root, snapshot_id=staged).collect()}
    assert audit == base | {k + 100 for k in range(50)}

    with pytest.raises(ValueError, match="exactly one"):
        publish_iceberg_wap(t.root)
    with pytest.raises(IcebergProtocolError, match="no staged"):
        publish_iceberg_wap(t.root, wap_id="wrong-id")

    out = publish_iceberg_wap(t.root, wap_id="etl-42")
    assert out == {"snapshot_id": staged, "mode": "fast-forward"}
    assert main_keys() == audit
    # double publish refuses
    with pytest.raises(IcebergProtocolError, match="already published"):
        publish_iceberg_wap(t.root, wap_id="etl-42")

    # cherry-pick leg: stage, main advances, publish replays on top
    t2 = SnapshotTable(spark, t.root)
    t2._refresh()
    t2.append(df.select((F.col("k") + 200).alias("k")))
    staged2 = export_iceberg(t2, wap_id="etl-43")
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        append_position_deletes,
        iceberg_meta_table,
    )

    victim = sorted(
        r["file_path"]
        for r in iceberg_meta_table(spark, t.root, "files").collect()
    )[0]
    append_position_deletes(t.root, [(victim, 0)])
    n_main = read_iceberg(spark, t.root).count()
    out2 = publish_iceberg_wap(t.root, wap_id="etl-43")
    assert out2["mode"] == "cherry-pick"
    assert read_iceberg(spark, t.root).count() == n_main + 50
    with pytest.raises(IcebergProtocolError, match="already published"):
        publish_iceberg_wap(t.root, wap_id="etl-43")


def test_ref_retention_policies(spark, tmp_path):
    """Spec ref-retention fields drive expiry: max-ref-age-ms expires
    the REF itself (its snapshot becomes collectable), a branch's
    min-snapshots-to-keep protects that many newest ANCESTORS, and
    branch-only fields on a tag refuse at declaration."""
    import json as _json

    import pyspark.sql.functions as F

    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        _metadata_path,
        expire_iceberg_snapshots,
        export_iceberg,
        publish_iceberg_wap,
        read_iceberg,
        set_iceberg_ref,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.table import (
        SnapshotTable,
    )

    df = spark.range(0, 30).select(F.col("id").alias("k"))
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), "k bigint",
        bucket_key=["k"], num_buckets=2,
    )
    t.append(df)
    s1 = export_iceberg(t)
    t.append(df.select((F.col("k") + 100).alias("k")))
    s2 = export_iceberg(t)
    t.append(df.select((F.col("k") + 200).alias("k")))
    s3 = export_iceberg(t)
    t.append(df.select((F.col("k") + 300).alias("k")))
    s4 = export_iceberg(t)

    with pytest.raises(ValueError, match="branch-only"):
        set_iceberg_ref(t.root, "bad", type="tag",
                        min_snapshots_to_keep=2)

    # an AGED-OUT tag stops protecting: declare max-ref-age-ms 1ms on
    # an old snapshot; a fresh tag with no age field protects forever
    set_iceberg_ref(t.root, "aged", snapshot_id=s1, type="tag",
                    max_ref_age_ms=1)
    set_iceberg_ref(t.root, "pinned", snapshot_id=s2, type="tag")
    # a branch keeping its 2 newest ancestors
    set_iceberg_ref(t.root, "dev", snapshot_id=s4, type="branch",
                    min_snapshots_to_keep=2)
    import time as _t

    _t.sleep(0.01)  # let the aged ref pass its 1ms window
    expired = expire_iceberg_snapshots(t.root, keep_last=1)
    # s1: its only protector aged out -> expired. s2: tag-pinned.
    # s3: protected as the dev branch's 2nd-newest ancestor. s4: head.
    assert expired == [s1]
    with open(_metadata_path(t.root)) as f:
        meta = _json.load(f)
    assert "aged" not in (meta.get("refs") or {})
    assert {s["snapshot-id"] for s in meta["snapshots"]} == {s2, s3, s4}
    # the protected history still reads
    assert read_iceberg(spark, t.root, snapshot_id=s3).count() == 90
    assert read_iceberg(spark, t.root, ref="pinned").count() == 60
    # the surviving branch fast-forward-publishes cleanly afterwards
    out = publish_iceberg_wap(t.root, "dev")
    assert out["mode"] == "noop"  # dev head == main already


def test_ref_expiry_persists_without_snapshot_removal(spark, tmp_path):
    """An aged-out ref is removed DURABLY even when no snapshot
    qualifies for expiry — the max-ref-age-ms contract must not depend
    on something else being collectable in the same pass."""
    import json as _json
    import time as _t

    import pyspark.sql.functions as F

    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        IcebergProtocolError,
        _metadata_path,
        expire_iceberg_snapshots,
        export_iceberg,
        read_iceberg,
        set_iceberg_ref,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.table import (
        SnapshotTable,
    )

    df = spark.range(0, 10).select(F.col("id").alias("k"))
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), "k bigint",
        bucket_key=["k"], num_buckets=2,
    )
    t.append(df)
    s1 = export_iceberg(t)
    set_iceberg_ref(t.root, "aged", snapshot_id=s1, type="tag",
                    max_ref_age_ms=1)
    _t.sleep(0.01)
    # keep_last covers everything: zero snapshots expire...
    assert expire_iceberg_snapshots(t.root, keep_last=5) == []
    # ...yet the aged ref is gone from the COMMITTED metadata
    with open(_metadata_path(t.root)) as f:
        meta = _json.load(f)
    assert "aged" not in (meta.get("refs") or {})
    with pytest.raises(Exception):
        read_iceberg(spark, t.root, ref="aged").collect()


def test_wap_id_refusals_name_the_wap_id(spark, tmp_path):
    """Cherry-pick refusal messages in wap_id mode must name the wap id
    the caller passed — not 'branch None' (branch is unset in that
    staging flavor)."""
    import pyspark.sql.functions as F

    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        IcebergProtocolError,
        append_position_deletes,
        export_iceberg,
        iceberg_meta_table,
        publish_iceberg_wap,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.table import (
        SnapshotTable,
    )

    df = spark.range(0, 20).select(F.col("id").alias("k"))
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), "k bigint",
        bucket_key=["k"], num_buckets=2,
    )
    t.append(df)
    export_iceberg(t)
    # stage an OVERWRITE by wap id, then advance main: the only-APPEND
    # cherry-pick refusal fires and must name the wap id
    t.delete(F.col("k") < 5)
    export_iceberg(t, wap_id="etl-b")
    victim = sorted(
        r["file_path"]
        for r in iceberg_meta_table(spark, t.root, "files").collect()
    )[0]
    append_position_deletes(t.root, [(victim, 0)])
    with pytest.raises(IcebergProtocolError, match="wap.id 'etl-b'"):
        publish_iceberg_wap(t.root, wap_id="etl-b")
    try:
        publish_iceberg_wap(t.root, wap_id="etl-b")
    except IcebergProtocolError as e:
        assert "branch None" not in str(e)
        assert "APPEND" in str(e)
