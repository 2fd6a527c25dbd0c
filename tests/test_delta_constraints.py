import json
import os

import pytest
import pyspark.sql.functions as F

from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import (
    DeltaProtocolError,
    read_delta,
)
from predicting_hospital_readmission_using_mimic_database_spark.sources.delta_constraints import (
    append_delta,
    delta_table_constraints,
    drop_delta_check_constraint,
    set_delta_check_constraint,
)


def _mk_table(tmp_path, fields, configuration=None, protocol=None):
    root = str(tmp_path / "t")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    actions = [
        {"protocol": protocol or {"minReaderVersion": 1,
                                  "minWriterVersion": 2}},
        {"metaData": {
            "id": "t", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(
                {"type": "struct", "fields": fields}),
            "partitionColumns": [],
            "configuration": configuration or {},
        }},
    ]
    with open(os.path.join(log, f"{0:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    return root


def _f(name, typ, nullable=True, metadata=None):
    return {"name": name, "type": typ, "nullable": nullable,
            "metadata": metadata or {}}


def test_check_constraint_enforced(spark, tmp_path):
    root = _mk_table(
        tmp_path,
        [_f("k", "long"), _f("cents", "long")],
        configuration={"delta.constraints.positive_cents": "cents >= 0"},
        protocol={"minReaderVersion": 1, "minWriterVersion": 7,
                  "writerFeatures": ["checkConstraints"]},
    )
    ok = spark.createDataFrame([(1, 10), (2, 0), (3, None)],
                               "k bigint, cents bigint")
    assert append_delta(spark, root, ok) == 1  # NULL passes (SQL 3VL)
    bad = spark.createDataFrame([(4, -5)], "k bigint, cents bigint")
    with pytest.raises(DeltaProtocolError, match="positive_cents"):
        append_delta(spark, root, bad)
    got = {(r["k"], r["cents"]) for r in read_delta(spark, root).collect()}
    assert got == {(1, 10), (2, 0), (3, None)}  # nothing leaked
    # no orphan staging debris
    assert not [n for n in os.listdir(root) if n.startswith(".stage")]


def test_not_null_invariant_enforced(spark, tmp_path):
    root = _mk_table(
        tmp_path, [_f("k", "long", nullable=False), _f("v", "string")],
    )
    ok = spark.createDataFrame([(1, None)], "k bigint, v string")
    assert append_delta(spark, root, ok) == 1
    bad = spark.createDataFrame([(None, "x")], "k bigint, v string")
    with pytest.raises(DeltaProtocolError, match="NOT NULL.*k"):
        append_delta(spark, root, bad)


def test_legacy_invariants_enforced(spark, tmp_path):
    inv = json.dumps({"expression": {"expression": "k < 100"}})
    root = _mk_table(
        tmp_path,
        [_f("k", "long", metadata={"delta.invariants": inv})],
        protocol={"minReaderVersion": 1, "minWriterVersion": 7,
                  "writerFeatures": ["invariants"]},
    )
    assert append_delta(
        spark, root, spark.createDataFrame([(5,)], "k bigint")) == 1
    with pytest.raises(DeltaProtocolError, match="invariant.*k < 100"):
        append_delta(
            spark, root, spark.createDataFrame([(200,)], "k bigint"))


def test_generated_column(spark, tmp_path):
    root = _mk_table(
        tmp_path,
        [_f("k", "long"),
         _f("k2", "long",
            metadata={"delta.generationExpression": "k * 2"})],
        protocol={"minReaderVersion": 1, "minWriterVersion": 7,
                  "writerFeatures": ["generatedColumns"]},
    )
    # missing generated column is COMPUTED
    assert append_delta(
        spark, root, spark.createDataFrame([(3,)], "k bigint")) == 1
    got = {(r["k"], r["k2"]) for r in read_delta(spark, root).collect()}
    assert got == {(3, 6)}
    # provided-but-wrong value REFUSES
    bad = spark.createDataFrame([(4, 9)], "k bigint, k2 bigint")
    with pytest.raises(DeltaProtocolError, match="generated column"):
        append_delta(spark, root, bad)
    # provided-and-right value passes
    assert append_delta(
        spark, root,
        spark.createDataFrame([(5, 10)], "k bigint, k2 bigint")) == 2


def test_add_drop_constraint_ddl(spark, tmp_path):
    root = _mk_table(tmp_path, [_f("k", "long")])
    append_delta(spark, root, spark.createDataFrame([(1,)], "k bigint"))
    # adding a constraint existing data violates refuses
    with pytest.raises(DeltaProtocolError, match="existing row"):
        set_delta_check_constraint(spark, root, "big_k", "k > 100")
    v = set_delta_check_constraint(spark, root, "pos_k", "k > 0")
    assert v == 2
    rules = delta_table_constraints(root)
    assert rules["checks"] == {"pos_k": "k > 0"}
    # duplicate add refuses
    with pytest.raises(DeltaProtocolError, match="already exists"):
        set_delta_check_constraint(spark, root, "pos_k", "k > 0")
    with pytest.raises(DeltaProtocolError, match="pos_k"):
        append_delta(spark, root,
                     spark.createDataFrame([(-1,)], "k bigint"))
    # the protocol now declares the feature
    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import _declared_protocol
    proto = _declared_protocol(os.path.join(root, "_delta_log"))
    assert "checkConstraints" in proto["writerFeatures"]
    drop_delta_check_constraint(root, "pos_k")
    assert append_delta(
        spark, root, spark.createDataFrame([(-1,)], "k bigint")) == 4
    with pytest.raises(DeltaProtocolError, match="not found"):
        drop_delta_check_constraint(root, "pos_k")


def test_unknown_writer_feature_gates(spark, tmp_path):
    root = _mk_table(
        tmp_path, [_f("k", "long")],
        protocol={"minReaderVersion": 1, "minWriterVersion": 7,
                  "writerFeatures": ["rowTracking"]},
    )
    with pytest.raises(DeltaProtocolError, match="rowTracking"):
        append_delta(spark, root,
                     spark.createDataFrame([(1,)], "k bigint"))


def test_schema_enforcement(spark, tmp_path):
    root = _mk_table(tmp_path, [_f("k", "long"), _f("v", "string")])
    with pytest.raises(DeltaProtocolError, match="extra"):
        append_delta(spark, root, spark.createDataFrame(
            [(1, "a", 2)], "k bigint, v string, extra bigint"))
    with pytest.raises(DeltaProtocolError, match="missing"):
        append_delta(spark, root,
                     spark.createDataFrame([(1,)], "k bigint"))


def test_append_stats_drive_skipping(spark, tmp_path):
    root = _mk_table(tmp_path, [_f("k", "long")])
    append_delta(spark, root, spark.range(0, 100).select(
        F.col("id").alias("k")))
    append_delta(spark, root, spark.range(1000, 1100).select(
        F.col("id").alias("k")))
    all_files = read_delta(spark, root).inputFiles()
    pruned = read_delta(spark, root, predicates=[("k", ">", 500)])
    assert len(pruned.inputFiles()) < len(all_files)
    assert pruned.count() == 100


def test_txn_idempotent_append(spark, tmp_path):
    """txn=(appId, version) makes append_delta idempotent per
    micro-batch — the setTransaction streaming-sink contract: a
    replayed batch returns without writing; a NEWER batch version
    writes; a second app's versions are independent."""
    root = _mk_table(tmp_path, [_f("k", "long")])
    df1 = spark.createDataFrame([(1,)], "k bigint")
    v1 = append_delta(spark, root, df1, txn=("app", 0))
    assert v1 == 1
    # replay of batch 0: skipped, no new version, no duplicate rows
    assert append_delta(spark, root, df1, txn=("app", 0)) == 1
    assert read_delta(spark, root).count() == 1
    # batch 1 commits
    assert append_delta(
        spark, root, spark.createDataFrame([(2,)], "k bigint"),
        txn=("app", 1)) == 2
    # an older batch id replays as a skip too
    assert append_delta(spark, root, df1, txn=("app", 0)) == 2
    assert read_delta(spark, root).count() == 2
    # a different app id is an independent sequence
    assert append_delta(
        spark, root, spark.createDataFrame([(3,)], "k bigint"),
        txn=("other", 0)) == 3
    assert read_delta(spark, root).count() == 3


def test_txn_survives_checkpoint_and_truncation(spark, tmp_path):
    """The exactly-once dedup window must survive maintenance: txn
    actions are carried by checkpoints (spec checkpoint schema), so a
    checkpoint + log truncation cannot collapse the window and let a
    replayed micro-batch double-append."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import (
        truncate_delta_log,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta_optimize import (
        optimize_delta,
    )

    root = _mk_table(tmp_path, [_f("k", "long")])
    df = spark.createDataFrame([(1,)], "k bigint")
    append_delta(spark, root, df, txn=("app", 7))
    # maintenance: checkpoint lands, JSON commits truncated away
    v = optimize_delta(spark, root, target_file_rows=10**9,
                       checkpoint_interval=1)
    deleted = truncate_delta_log(root, keep_versions=1)
    assert deleted  # the commit holding the txn action is GONE
    # ...yet the replayed batch still skips (checkpoint carried it)
    assert append_delta(spark, root, df, txn=("app", 7)) == v
    assert read_delta(spark, root).count() == 1


def test_txn_zombie_race_detected(spark, tmp_path):
    """Two instances of one streaming query racing the same micro-batch
    (zombie driver + restart): the CAS loser must detect the winner's
    txn action for the same (appId, version) and SKIP, never
    double-append."""
    import json as _json

    import predicting_hospital_readmission_using_mimic_database_spark.sources.delta_constraints as DC

    root = _mk_table(tmp_path, [_f("k", "long")])
    df = spark.createDataFrame([(1,)], "k bigint")
    # simulate the zombie winning version 1 AFTER our pre-check passed:
    # intercept _publish_commit to inject the foreign commit first
    orig = DC._publish_commit
    state = {"raced": False}

    def racing(log_dir, version, actions):
        if not state["raced"]:
            state["raced"] = True
            with open(os.path.join(log_dir, f"{version:020d}.json"),
                      "w") as f:
                f.write(_json.dumps(
                    {"txn": {"appId": "app", "version": 3}}) + "\n")
                f.write(_json.dumps(
                    {"add": {"path": "zombie.parquet",
                             "partitionValues": {}, "size": 1,
                             "modificationTime": 0,
                             "dataChange": True}}) + "\n")
        return orig(log_dir, version, actions)

    DC._publish_commit = racing
    try:
        got = append_delta(spark, root, df, txn=("app", 3))
    finally:
        DC._publish_commit = orig
    assert got == 1  # the zombie's version; our batch was NOT re-added
    # our staged file was reclaimed: only the zombie's add is live
    log = os.path.join(root, "_delta_log")
    assert len([n for n in os.listdir(log) if n.endswith(".json")]) == 2
    assert not [n for n in os.listdir(root)
                if n.startswith("append-") and n.endswith(".parquet")]


def test_constraint_upgrade_enumerates_legacy_features(spark, tmp_path):
    """Upgrading a legacy protocol to table features (ADD CONSTRAINT on
    a minWriterVersion-4 table) must enumerate every implied legacy
    feature — a protocol declaring only checkConstraints would let a
    foreign writer legally skip invariants/generation enforcement."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import (
        _declared_protocol,
    )

    root = _mk_table(
        tmp_path, [_f("k", "long")],
        protocol={"minReaderVersion": 1, "minWriterVersion": 4},
    )
    append_delta(spark, root, spark.createDataFrame([(1,)], "k bigint"))
    set_delta_check_constraint(spark, root, "pos_k", "k > 0")
    proto = _declared_protocol(os.path.join(root, "_delta_log"))
    assert proto["minWriterVersion"] == 7
    assert {"appendOnly", "invariants", "checkConstraints",
            "changeDataFeed", "generatedColumns"} <= set(
        proto["writerFeatures"])


def test_file_stats_drop_string_bounds(spark, tmp_path):
    """_file_stats follows the harvester safety rules: string bounds
    are truncation-unsafe and never published; numeric bounds are."""
    import json as _json

    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta_constraints import (
        _file_stats,
    )

    root = _mk_table(tmp_path, [_f("k", "long"), _f("v", "string")])
    append_delta(spark, root, spark.createDataFrame(
        [(1, "aaa"), (2, "zzz")], "k bigint, v string").coalesce(1))
    log = os.path.join(root, "_delta_log")
    with open(os.path.join(log, f"{1:020d}.json")) as f:
        adds = [
            _json.loads(ln)["add"] for ln in f
            if ln.strip() and "add" in _json.loads(ln)
        ]
    st = _json.loads(adds[0]["stats"])
    assert "k" in st["minValues"] and "k" in st["maxValues"]
    assert "v" not in st["minValues"] and "v" not in st["maxValues"]
    assert st["numRecords"] == 2


def _identity_field(name, start=1, step=1, allow=False, hwm=None):
    md = {"delta.identity.start": start, "delta.identity.step": step,
          "delta.identity.allowExplicitInsert": allow}
    if hwm is not None:
        md["delta.identity.highWaterMark"] = hwm
    return _f(name, "long", metadata=md)


def test_identity_generated_always(spark, tmp_path):
    """GENERATED ALWAYS identity: missing column is assigned beyond
    the watermark (start/step honored, deterministic under
    identity_order), the new watermark commits with the rows, a
    provided value refuses, and the next batch continues the
    sequence."""
    root = _mk_table(
        tmp_path,
        [_identity_field("id", start=1000, step=2), _f("k", "long")],
        protocol={"minReaderVersion": 1, "minWriterVersion": 7,
                  "writerFeatures": ["identityColumns"]},
    )
    append_delta(spark, root,
                 spark.createDataFrame([(30,), (10,), (20,)], "k bigint"),
                 identity_order=["k"])
    got = {(r["k"], r["id"]) for r in read_delta(spark, root).collect()}
    assert got == {(10, 1000), (20, 1002), (30, 1004)}
    # the watermark persisted: the next batch continues past it
    append_delta(spark, root,
                 spark.createDataFrame([(50,), (40,)], "k bigint"),
                 identity_order=["k"])
    got = {(r["k"], r["id"]) for r in read_delta(spark, root).collect()}
    assert got == {(10, 1000), (20, 1002), (30, 1004),
                   (40, 1006), (50, 1008)}
    # GENERATED ALWAYS refuses a provided value
    with pytest.raises(DeltaProtocolError, match="GENERATED ALWAYS"):
        append_delta(spark, root, spark.createDataFrame(
            [(99, 60)], "id bigint, k bigint"))
    # ...and nothing leaked
    assert read_delta(spark, root).count() == 5


def test_identity_by_default_and_negative_step(spark, tmp_path):
    """GENERATED BY DEFAULT accepts explicit values and advances the
    watermark past the provided extreme; a negative step counts
    down."""
    root = _mk_table(
        tmp_path,
        [_identity_field("id", start=0, step=-5, allow=True),
         _f("k", "long")],
    )
    append_delta(spark, root,
                 spark.createDataFrame([(1,), (2,)], "k bigint"),
                 identity_order=["k"])
    got = {(r["k"], r["id"]) for r in read_delta(spark, root).collect()}
    assert got == {(1, 0), (2, -5)}
    # explicit insert below the watermark direction advances it
    append_delta(spark, root, spark.createDataFrame(
        [(-100, 3)], "id bigint, k bigint"))
    # next assigned value continues past -100
    append_delta(spark, root,
                 spark.createDataFrame([(4,)], "k bigint"))
    ids = {r["id"] for r in read_delta(spark, root).collect()}
    assert ids == {0, -5, -100, -105}


def test_identity_feature_no_longer_gated(spark, tmp_path):
    """identityColumns is now an implemented writer feature: a table
    declaring it appends instead of gating (the rowTracking gate stays
    as the unknown-feature sentinel)."""
    root = _mk_table(
        tmp_path,
        [_identity_field("id", start=1), _f("k", "long")],
        protocol={"minReaderVersion": 1, "minWriterVersion": 7,
                  "writerFeatures": ["identityColumns", "invariants"]},
    )
    assert append_delta(
        spark, root, spark.createDataFrame([(7,)], "k bigint")) == 1
    got = {(r["k"], r["id"]) for r in read_delta(spark, root).collect()}
    assert got == {(7, 1)}


def test_append_only_table_refuses_removes(spark, tmp_path):
    """delta.appendOnly=true (the appendOnly writer feature's
    obligation): append commits pass, a snapshot diff that would emit
    remove actions refuses naming the property."""
    import pyspark.sql.functions as F

    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import (
        export_delta_log,
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
    assert export_delta_log(t) == 0
    # flip the property on via a direct metaData commit
    import json as _json

    log = os.path.join(t.root, "_delta_log")
    with open(os.path.join(log, f"{0:020d}.json")) as f:
        meta = next(
            _json.loads(ln)["metaData"] for ln in f
            if ln.strip() and "metaData" in _json.loads(ln)
        )
    meta = {**meta, "configuration": {
        **(meta.get("configuration") or {}), "delta.appendOnly": "true"}}
    with open(os.path.join(log, f"{1:020d}.json"), "w") as f:
        f.write(_json.dumps({"metaData": meta}) + "\n")
    # appends still export fine...
    t.append(df.select((F.col("k") + 100).alias("k")))
    assert export_delta_log(t) == 2
    # ...but a merge (bucket rewrite -> removes) refuses
    t.merge(spark.createDataFrame([(1,)], "k bigint"))
    with pytest.raises(DeltaProtocolError, match="appendOnly"):
        export_delta_log(t)
    # the constrained append path honors the same declared feature
    root2 = _mk_table(
        tmp_path / "t2", [_f("k", "long")],
        configuration={"delta.appendOnly": "true"},
        protocol={"minReaderVersion": 1, "minWriterVersion": 7,
                  "writerFeatures": ["appendOnly"]},
    )
    assert append_delta(
        spark, root2, spark.createDataFrame([(1,)], "k bigint")) == 1


def test_cdf_over_constrained_appends(spark, tmp_path):
    """append_delta commits compose with the change-data-feed read:
    each batch surfaces as inserts at its own commit version (appends
    need no change files per spec), and a refused batch contributes
    no change rows."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.delta import (
        read_delta_changes,
    )

    root = _mk_table(
        tmp_path, [_f("k", "long")],
        configuration={"delta.constraints.pos": "k > 0",
                       "delta.enableChangeDataFeed": "true"},
        protocol={"minReaderVersion": 1, "minWriterVersion": 7,
                  "writerFeatures": ["checkConstraints",
                                     "changeDataFeed"]},
    )
    append_delta(spark, root, spark.createDataFrame([(1,), (2,)],
                                                    "k bigint"))
    with pytest.raises(DeltaProtocolError, match="pos"):
        append_delta(spark, root,
                     spark.createDataFrame([(-1,)], "k bigint"))
    append_delta(spark, root, spark.createDataFrame([(3,)], "k bigint"))
    rows = read_delta_changes(spark, root, starting_version=1).collect()
    got = {(r["k"], r["_change_type"], r["_commit_version"])
           for r in rows}
    assert got == {(1, "insert", 1), (2, "insert", 1),
                   (3, "insert", 2)}


def test_identity_string_boolean_parse(spark, tmp_path):
    """A foreign log serializing allowExplicitInsert as the STRING
    \"false\" must still mean GENERATED ALWAYS (bool(\"false\") is
    True — the naive parse would silently accept explicit ids)."""
    root = _mk_table(
        tmp_path,
        [_f("id", "long", metadata={
            "delta.identity.start": 1, "delta.identity.step": 1,
            "delta.identity.allowExplicitInsert": "false"}),
         _f("k", "long")],
    )
    with pytest.raises(DeltaProtocolError, match="GENERATED ALWAYS"):
        append_delta(spark, root, spark.createDataFrame(
            [(5, 1)], "id bigint, k bigint"))
    # the string "true" enables BY DEFAULT
    root2 = _mk_table(
        tmp_path / "t2",
        [_f("id", "long", metadata={
            "delta.identity.start": 1, "delta.identity.step": 1,
            "delta.identity.allowExplicitInsert": "true"}),
         _f("k", "long")],
    )
    assert append_delta(spark, root2, spark.createDataFrame(
        [(5, 1)], "id bigint, k bigint")) == 1


def test_midmove_io_error_reclaims_placed_files(spark, tmp_path,
                                                monkeypatch):
    """A non-protocol failure BETWEEN placing staged parts and the
    commit must reclaim every already-placed append-*.parquet — an
    I/O error mid-move would otherwise strand uncommitted orphans in
    the table root (only the stage dir used to be cleaned)."""
    import shutil as _sh

    from predicting_hospital_readmission_using_mimic_database_spark.sources import (
        delta_constraints as DC,
    )

    root = _mk_table(tmp_path, [_f("k", "long")])
    append_delta(spark, root, spark.createDataFrame([(1,)], "k bigint"))
    before = sorted(n for n in os.listdir(root)
                    if n.endswith(".parquet"))

    calls = {"n": 0}
    real_move = _sh.move

    def flaky_move(src, dst, *a, **kw):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise OSError("disk full")
        return real_move(src, dst, *a, **kw)

    monkeypatch.setattr(DC.shutil, "move", flaky_move)
    bad = spark.createDataFrame(
        [(10,), (11,), (12,), (13,)], "k bigint"
    ).repartition(3)
    with pytest.raises(OSError, match="disk full"):
        append_delta(spark, root, bad)
    monkeypatch.undo()
    # no orphans: root holds exactly the committed files, no stage dirs
    after = sorted(n for n in os.listdir(root) if n.endswith(".parquet"))
    assert after == before
    assert not [n for n in os.listdir(root) if n.startswith(".stage")]
    got = {r["k"] for r in read_delta(spark, root).collect()}
    assert got == {1}
    # the table still appends normally afterwards
    assert append_delta(
        spark, root, spark.createDataFrame([(2,)], "k bigint")) == 2


def test_append_id_mapped_files_carry_field_ids(spark, tmp_path):
    """append_delta on an id-mapped table must stamp parquet field ids
    into the staged files — id-resolution readers refuse id-less
    files."""
    import glob

    import pyarrow.parquet as pq

    root = _mk_table(
        tmp_path,
        [
            _f("k", "long", metadata={
                "delta.columnMapping.physicalName": "col-1",
                "delta.columnMapping.id": 1}),
            _f("v", "double", metadata={
                "delta.columnMapping.physicalName": "col-2",
                "delta.columnMapping.id": 2}),
        ],
        configuration={"delta.columnMapping.mode": "id"},
        protocol={"minReaderVersion": 2, "minWriterVersion": 5},
    )
    v = append_delta(
        spark, root,
        spark.createDataFrame([(1, 1.0), (2, 2.0)], "k bigint, v double"),
    )
    assert v == 1
    files = [p for p in glob.glob(os.path.join(root, "*.parquet"))]
    assert files
    for p in files:
        sch = str(pq.ParquetFile(p).schema)
        assert "field_id=1" in sch and "field_id=2" in sch
    got = {(r["k"], r["v"]) for r in read_delta(spark, root).collect()}
    assert got == {(1, 1.0), (2, 2.0)}
