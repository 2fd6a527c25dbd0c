"""Delta CHANGE DATA FEED read (sources/delta.py read_delta_changes):
cdc-file precedence, add/remove-derived changes, version stamping,
partition attach, and the protocol gates."""

import json
import os

import pytest

from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import (
    DeltaProtocolError,
    read_delta_changes,
)
from tests.test_delta_interop import (
    _meta_action,
    _write_commit,
    _write_parquet,
)


def _rows(df):
    return {
        (r["k"], r["v"], r["_change_type"], r["_commit_version"])
        for r in df.collect()
    }


@pytest.fixture
def cdf_root(tmp_path):
    """v0: add f0 (k=1,2). v1: cdc commit rewriting k=1 (pre/post rows)
    with its add/remove present but superseded by the cdc files.
    v2: append-only add f2 (k=5). v3: remove f2 (derived deletes)."""
    root = str(tmp_path / "cdf")
    _write_parquet(os.path.join(root, "f0.parquet"), [(1, 10), (2, 20)], ["k", "v"])
    _write_commit(
        root,
        0,
        [
            {"protocol": {"minReaderVersion": 1}},
            _meta_action([("k", "long"), ("v", "long")]),
            {"add": {"path": "f0.parquet", "partitionValues": {},
                     "size": 1, "dataChange": True}},
        ],
    )
    _write_parquet(
        os.path.join(root, "_change_data", "cdc-1.parquet"),
        [(1, 10, "update_preimage"), (1, 11, "update_postimage")],
        ["k", "v", "_change_type"],
    )
    _write_parquet(os.path.join(root, "f1.parquet"), [(1, 11), (2, 20)], ["k", "v"])
    _write_commit(
        root,
        1,
        [
            {"cdc": {"path": "_change_data/cdc-1.parquet",
                     "partitionValues": {}, "size": 1, "dataChange": False}},
            {"remove": {"path": "f0.parquet", "dataChange": True}},
            {"add": {"path": "f1.parquet", "partitionValues": {},
                     "size": 1, "dataChange": True}},
        ],
    )
    _write_parquet(os.path.join(root, "f2.parquet"), [(5, 50)], ["k", "v"])
    _write_commit(
        root,
        2,
        [{"add": {"path": "f2.parquet", "partitionValues": {},
                  "size": 1, "dataChange": True}}],
    )
    _write_commit(root, 3, [{"remove": {"path": "f2.parquet", "dataChange": True}}])
    return root


def test_cdf_full_range(spark, cdf_root):
    got = _rows(read_delta_changes(spark, cdf_root))
    assert got == {
        (1, 10, "insert", 0),
        (2, 20, "insert", 0),
        (1, 10, "update_preimage", 1),  # cdc files win over add/remove
        (1, 11, "update_postimage", 1),
        (5, 50, "insert", 2),
        (5, 50, "delete", 3),  # derived from the remove, file read again
    }


def test_cdf_sub_ranges(spark, cdf_root):
    got = _rows(read_delta_changes(spark, cdf_root, starting_version=2))
    assert got == {(5, 50, "insert", 2), (5, 50, "delete", 3)}
    got = _rows(
        read_delta_changes(spark, cdf_root, starting_version=1, ending_version=1)
    )
    assert got == {(1, 10, "update_preimage", 1), (1, 11, "update_postimage", 1)}
    with pytest.raises(ValueError, match="starting_version"):
        read_delta_changes(spark, cdf_root, starting_version=3, ending_version=1)


def test_cdf_same_file_insert_then_delete_single_scan(spark, cdf_root):
    df = read_delta_changes(spark, cdf_root, starting_version=2)
    # one physical file feeds both change rows
    assert len(df.inputFiles()) == 1


def test_cdf_partitioned_attach(spark, tmp_path):
    root = str(tmp_path / "p")
    _write_parquet(os.path.join(root, "seg=a", "f0.parquet"), [(1, 10)], ["k", "v"])
    _write_commit(
        root,
        0,
        [
            {"protocol": {"minReaderVersion": 1}},
            _meta_action(
                [("k", "long"), ("v", "long"), ("seg", "string")],
                part_cols=("seg",),
            ),
            {"add": {"path": "seg=a/f0.parquet",
                     "partitionValues": {"seg": "a"}, "size": 1,
                     "dataChange": True}},
        ],
    )
    r = read_delta_changes(spark, root).collect()
    assert [(x["k"], x["seg"], x["_change_type"], x["_commit_version"]) for x in r] == [
        (1, "a", "insert", 0)
    ]


def test_cdf_gates(spark, tmp_path, cdf_root):
    # schema evolution inside the range
    root = str(tmp_path / "ev")
    _write_parquet(os.path.join(root, "f0.parquet"), [(1, 10)], ["k", "v"])
    _write_commit(
        root, 0,
        [_meta_action([("k", "long"), ("v", "long")]),
         {"add": {"path": "f0.parquet", "partitionValues": {}, "size": 1,
                  "dataChange": True}}],
    )
    _write_commit(
        root, 1, [_meta_action([("k", "long"), ("v", "long"), ("w", "long")])]
    )
    with pytest.raises(DeltaProtocolError, match="schema changed"):
        read_delta_changes(spark, root)
    # the sub-range on either side still reads
    assert _rows(read_delta_changes(spark, root, ending_version=0)) == {
        (1, 10, "insert", 0)
    }
    # deletion vector without cdc
    root2 = str(tmp_path / "dv")
    _write_parquet(os.path.join(root2, "f0.parquet"), [(1, 10)], ["k", "v"])
    _write_commit(
        root2, 0,
        [_meta_action([("k", "long"), ("v", "long")]),
         {"add": {"path": "f0.parquet", "partitionValues": {}, "size": 1,
                  "dataChange": True,
                  "deletionVector": {"storageType": "u", "pathOrInlineDv": "x",
                                     "offset": 1, "sizeInBytes": 1,
                                     "cardinality": 1}}}],
    )
    with pytest.raises(DeltaProtocolError, match="deletion vector"):
        read_delta_changes(spark, root2)
    # vacuumed change file
    os.remove(os.path.join(cdf_root, "f2.parquet"))
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        read_delta_changes(spark, cdf_root, starting_version=2)
    # column-mapping table
    root3 = str(tmp_path / "cm")
    _write_commit(
        root3, 0,
        [_meta_action([("k", "long")],
                      configuration={"delta.columnMapping.mode": "name"})],
    )
    with pytest.raises(DeltaProtocolError):
        read_delta_changes(spark, root3)


def test_cdf_remove_without_partition_values_falls_back(spark, tmp_path):
    """A remove written WITHOUT extendedFileMetadata carries no
    partitionValues; on a partitioned table the derived delete rows must
    take the values the file was ADDED with (pre-range log replay or an
    in-range add), never silent NULLs — and raise when neither side has
    them."""
    root = str(tmp_path / "nopv")
    _write_parquet(
        os.path.join(root, "seg=a", "f0.parquet"), [(1, 10)], ["k", "v"]
    )
    _write_commit(
        root,
        0,
        [
            {"protocol": {"minReaderVersion": 1}},
            _meta_action(
                [("k", "long"), ("v", "long"), ("seg", "string")],
                part_cols=("seg",),
            ),
            {"add": {"path": "seg=a/f0.parquet",
                     "partitionValues": {"seg": "a"}, "size": 1,
                     "dataChange": True}},
        ],
    )
    # bare remove: no partitionValues field at all
    _write_commit(
        root, 1, [{"remove": {"path": "seg=a/f0.parquet", "dataChange": True}}]
    )
    # in-range add (start=0) supplies the values
    full = {
        (r["k"], r["seg"], r["_change_type"], r["_commit_version"])
        for r in read_delta_changes(spark, root).collect()
    }
    assert full == {(1, "a", "insert", 0), (1, "a", "delete", 1)}
    # range starting AFTER the add: pre-range replay supplies them
    tail = {
        (r["k"], r["seg"], r["_change_type"], r["_commit_version"])
        for r in read_delta_changes(spark, root, starting_version=1).collect()
    }
    assert tail == {(1, "a", "delete", 1)}
    # a remove of a file never added in the retained log: honest raise
    _write_parquet(
        os.path.join(root, "seg=b", "fx.parquet"), [(2, 20)], ["k", "v"]
    )
    _write_commit(
        root, 2, [{"remove": {"path": "seg=b/fx.parquet", "dataChange": True}}]
    )
    with pytest.raises(DeltaProtocolError, match="partition"):
        read_delta_changes(spark, root, starting_version=2).collect()


def test_cdf_column_mapping_name_mode(spark, tmp_path):
    """CDF over a column-mapping NAME-mode table: files carry physical
    col-uuid names and partitionValues use physical keys; the change
    rows come back under LOGICAL names with partition values attached."""
    root = str(tmp_path / "cmcdf")
    # physical file columns
    _write_parquet(
        os.path.join(root, "f0.parquet"), [(1, 10), (2, 20)],
        ["col-aaa", "col-bbb"],
    )
    fields = []
    for name, typ, phys, cid in (
        ("k", "long", "col-aaa", 1),
        ("v", "long", "col-bbb", 2),
        ("seg", "string", "col-ccc", 3),
    ):
        fields.append(
            {"name": name, "type": typ, "nullable": True,
             "metadata": {"delta.columnMapping.physicalName": phys,
                          "delta.columnMapping.id": cid}}
        )
    meta = {
        "metaData": {
            "id": "cmcdf",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps({"type": "struct", "fields": fields}),
            "partitionColumns": ["seg"],
            "configuration": {"delta.columnMapping.mode": "name"},
        }
    }
    _write_commit(
        root, 0,
        [{"protocol": {"minReaderVersion": 2}}, meta,
         {"add": {"path": "f0.parquet",
                  "partitionValues": {"col-ccc": "a"},  # PHYSICAL key
                  "size": 1, "dataChange": True}}],
    )
    _write_commit(
        root, 1, [{"remove": {"path": "f0.parquet", "dataChange": True,
                              "partitionValues": {"col-ccc": "a"}}}],
    )
    got = {
        (r["k"], r["v"], r["seg"], r["_change_type"], r["_commit_version"])
        for r in read_delta_changes(spark, root).collect()
    }
    assert got == {
        (1, 10, "a", "insert", 0), (2, 20, "a", "insert", 0),
        (1, 10, "a", "delete", 1), (2, 20, "a", "delete", 1),
    }


def test_cdf_remove_with_empty_partition_values_falls_back(spark, tmp_path):
    """A remove carrying an explicit EMPTY partitionValues dict (a
    serializer that always emits the map, still no
    extendedFileMetadata) is the same shape as a missing field: the
    derived delete rows must take the add-time values, never NULL
    partitions."""
    root = str(tmp_path / "emptypv")
    _write_parquet(
        os.path.join(root, "seg=a", "f0.parquet"), [(1, 10)], ["k", "v"]
    )
    _write_commit(
        root,
        0,
        [
            {"protocol": {"minReaderVersion": 1}},
            _meta_action(
                [("k", "long"), ("v", "long"), ("seg", "string")],
                part_cols=("seg",),
            ),
            {"add": {"path": "seg=a/f0.parquet",
                     "partitionValues": {"seg": "a"}, "size": 1,
                     "dataChange": True}},
        ],
    )
    _write_commit(
        root,
        1,
        [{"remove": {"path": "seg=a/f0.parquet", "partitionValues": {},
                     "dataChange": True}}],
    )
    got = {
        (r["k"], r["seg"], r["_change_type"], r["_commit_version"])
        for r in read_delta_changes(spark, root, starting_version=1).collect()
    }
    assert got == {(1, "a", "delete", 1)}
