"""Partitioned Iceberg export + partition-spec evolution
(sources/iceberg_partitioned.py)."""

import datetime
import json
import os

import pytest
from pyspark.sql import functions as F

from predicting_hospital_readmission_using_mimic_database_spark.sources.avro_ocf import (
    read_avro,
)
from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
    IcebergProtocolError,
    _localize,
    _metadata_path,
    read_iceberg,
)
from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg_partitioned import (
    evolve_iceberg_partition_spec,
    export_iceberg_partitioned,
)
from predicting_hospital_readmission_using_mimic_database_spark.sources.table import (
    SnapshotTable,
)


def _src(spark, tmp_path, rows=600):
    df = spark.range(0, rows).select(
        F.col("id").alias("k"),
        (
            F.to_timestamp(F.lit("2026-01-01 00:00:00"))
            + F.make_interval(hours=F.col("id") % 96)
        ).alias("ts"),
        (F.col("id") % 7).cast("long").alias("grp"),
        F.concat(F.lit("u"), (F.col("id") % 5).cast("string")).alias("tag"),
    )
    t = SnapshotTable.create(
        spark,
        str(tmp_path / "src"),
        "k bigint, ts timestamp, grp bigint, tag string",
        bucket_key=["k"],
        num_buckets=2,
    )
    t.append(df)
    return t, df


def test_day_partitioned_export_roundtrip_and_pruning(spark, tmp_path):
    t, df = _src(spark, tmp_path)
    dest = str(tmp_path / "ice")
    sid = export_iceberg_partitioned(
        spark, t, dest, partition_by=[("ts", "day")]
    )
    assert sid == 1
    got = read_iceberg(spark, dest)
    assert len(got.inputFiles()) == 4  # 4 distinct days, one file each
    assert got.exceptAll(df).count() == 0
    assert df.exceptAll(got).count() == 0
    # source-column filter prunes to the one covering day file; the
    # stored-field spelling works too
    probe = datetime.datetime(2026, 1, 2, 5)
    assert len(read_iceberg(spark, dest, partitions={"ts": probe})
               .inputFiles()) == 1
    assert len(read_iceberg(spark, dest, partitions={"ts_day": 20455})
               .inputFiles()) == 1
    # manifest carries typed tuples + the list carries field summaries
    with open(_metadata_path(dest)) as f:
        meta = json.load(f)
    snap = meta["snapshots"][-1]
    _s, mrecs = read_avro(_localize(snap["manifest-list"], dest))
    (m,) = mrecs
    assert m["partition_spec_id"] == 0
    (summ,) = m["partitions"]
    assert summ["contains_null"] is False
    assert summ["lower_bound"] is not None
    _s2, entries = read_avro(_localize(m["manifest_path"], dest))
    assert {e["data_file"]["partition"]["ts_day"] for e in entries} == {
        20454, 20455, 20456, 20457}
    # per-file column bounds rode along
    assert all(e["data_file"]["lower_bounds"] for e in entries)


def test_multi_field_spec_and_nulls(spark, tmp_path):
    t, df = _src(spark, tmp_path)
    # null ts row -> null partition value
    t.append(
        spark.createDataFrame(
            [(10_000, None, 0, None)], "k long, ts timestamp, grp long, tag string"
        )
    )
    dest = str(tmp_path / "ice")
    export_iceberg_partitioned(
        spark, t, dest,
        partition_by=[("grp", "identity"), ("tag", "truncate[1]")],
    )
    got = read_iceberg(spark, dest)
    assert got.count() == 601
    # identity + truncate tuples prune together
    pr = read_iceberg(spark, dest, partitions={"grp": 3, "tag": "u1"})
    assert len(pr.inputFiles()) == 1
    rows = pr.collect()
    assert {r["grp"] for r in rows} == {3}
    assert {r["tag"][:1] for r in rows} == {"u"}
    # the null row landed in a null-tuple file and still reads
    assert got.filter(F.col("ts").isNull()).count() == 1


def test_incremental_append_and_spec_evolution(spark, tmp_path):
    t, df = _src(spark, tmp_path)
    dest = str(tmp_path / "ice")
    sid1 = export_iceberg_partitioned(
        spark, t, dest, partition_by=[("ts", "day")]
    )
    assert evolve_iceberg_partition_spec(dest, [("ts", "hour")]) == 1
    extra = df.select((F.col("k") + 10_000).alias("k"), "ts", "grp", "tag")
    t.append(extra)
    sid2 = export_iceberg_partitioned(spark, t, dest)
    assert sid2 == sid1 + 1
    got = read_iceberg(spark, dest)
    assert got.count() == 1200
    # probe prunes BOTH vintages against their own specs: one day file
    # + one hour file
    probe = datetime.datetime(2026, 1, 2, 5)
    pr = read_iceberg(spark, dest, partitions={"ts": probe})
    assert len(pr.inputFiles()) == 2, pr.inputFiles()
    # time travel to the day-only snapshot
    assert read_iceberg(spark, dest, snapshot_id=sid1).count() == 600
    # idempotent re-export
    assert export_iceberg_partitioned(spark, t, dest) == sid2


def test_gates(spark, tmp_path):
    t, df = _src(spark, tmp_path)
    dest = str(tmp_path / "ice")
    with pytest.raises(ValueError, match="partition_by"):
        export_iceberg_partitioned(spark, t, dest)
    with pytest.raises(ValueError, match="unknown column"):
        export_iceberg_partitioned(
            spark, t, dest, partition_by=[("nope", "day")]
        )
    sid = export_iceberg_partitioned(
        spark, t, dest, partition_by=[("ts", "day")]
    )
    # append-only: a merge in the source history gates the re-export
    t.merge(df.limit(1).withColumn("grp", F.col("grp") + 100))
    with pytest.raises(IcebergProtocolError, match="APPEND-ONLY"):
        export_iceberg_partitioned(spark, t, dest)
    assert sid == 1


def test_evolution_name_collision_gate(spark, tmp_path):
    t, df = _src(spark, tmp_path)
    dest = str(tmp_path / "ice")
    export_iceberg_partitioned(
        spark, t, dest, partition_by=[("grp", "truncate[2]")]
    )
    # the derived name grp_truncate would now mean a DIFFERENT width
    with pytest.raises(IcebergProtocolError, match="different"):
        evolve_iceberg_partition_spec(dest, [("grp", "truncate[5]")])
    # re-declaring the SAME (source, transform) is fine
    assert evolve_iceberg_partition_spec(dest, [("grp", "truncate[2]")]) == 1


def test_vectorized_bucket_matches_appendix_b():
    """The numpy murmur3 lane must equal the driver-side reference
    (murmur3_32 over the little-endian 8-byte serialization) element
    for element — spec vectors, negatives, and extremes included."""
    import numpy as np

    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        murmur3_32,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg_partitioned import (
        _murmur3_32_from_long,
    )

    vals = [34, 0, 1, -1, -34, 2**62, -(2**62), 123456789, -987654321]
    got = _murmur3_32_from_long(np.array(vals, dtype=np.int64))
    exp = [murmur3_32(v.to_bytes(8, "little", signed=True)) for v in
           [int(x) for x in vals]]
    assert list(got) == exp
    assert exp[0] == 2017239379  # the spec's hash(int 34) vector


def test_bucket_partitioned_export(spark, tmp_path):
    """bucket[N] on the WRITE path: files are bucket-pure per the
    Appendix-B hash, so a key filter plans exactly one file — and the
    read path's transform_value pruning agrees with the writer."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        transform_value,
    )

    t, df = _src(spark, tmp_path)
    dest = str(tmp_path / "ice")
    export_iceberg_partitioned(
        spark, t, dest, partition_by=[("k", "bucket[4]")]
    )
    got = read_iceberg(spark, dest)
    assert len(got.inputFiles()) == 4
    assert got.count() == 600
    assert got.exceptAll(df).count() == 0
    # source-column pruning: transform_value(k=137) names one bucket
    pr = read_iceberg(spark, dest, partitions={"k": 137})
    assert len(pr.inputFiles()) == 1
    assert 137 in {r["k"] for r in pr.collect()}
    # bucket purity: every row in the pruned file shares k's bucket
    want = transform_value("bucket[4]", 137)
    ks = [r["k"] for r in pr.collect()]
    assert {transform_value("bucket[4]", k) for k in ks} == {want}
    # strings bucket too (per-value hash inside the Arrow batch)
    dest2 = str(tmp_path / "ice2")
    export_iceberg_partitioned(
        spark, t, dest2, partition_by=[("tag", "bucket[3]")]
    )
    got2 = read_iceberg(spark, dest2)
    assert got2.count() == 600
    pr2 = read_iceberg(spark, dest2, partitions={"tag": "u2"})
    assert len(pr2.inputFiles()) < len(got2.inputFiles())
    tags = {r["tag"] for r in pr2.collect()}
    assert "u2" in tags
    assert {transform_value("bucket[3]", x) for x in tags} == {
        transform_value("bucket[3]", "u2")}


def test_write_path_source_type_gates(spark, tmp_path):
    """Transforms whose tuples would not round-trip through the
    partition-dir store gate at DECLARATION time — identity over
    timestamp/float, and bogus transform strings (an evolve must not
    poison later exports)."""
    t, df = _src(spark, tmp_path)
    dest = str(tmp_path / "ice")
    with pytest.raises(IcebergProtocolError, match="WRITE path"):
        export_iceberg_partitioned(
            spark, t, dest, partition_by=[("ts", "identity")]
        )
    with pytest.raises(IcebergProtocolError, match="unsupported"):
        export_iceberg_partitioned(
            spark, t, dest, partition_by=[("ts", "day[2]")]
        )
    with pytest.raises(IcebergProtocolError, match="unsupported"):
        export_iceberg_partitioned(
            spark, t, dest, partition_by=[("k", "mod[4]")]
        )
    export_iceberg_partitioned(spark, t, dest, partition_by=[("ts", "day")])
    with pytest.raises(IcebergProtocolError, match="WRITE path"):
        evolve_iceberg_partition_spec(dest, [("ts", "identity")])
    with pytest.raises(IcebergProtocolError, match="unsupported"):
        evolve_iceberg_partition_spec(dest, [("k", "bucket[x]")])


def test_partitioned_export_streams_and_summary_prunes(spark, tmp_path):
    """Composition: the partitioned export's manifests stream through
    iceberg_stream (appends only, per-file partitions), and its
    manifest-list field summaries drive the manifest-level pruning
    tier (non-matching manifests never parsed)."""
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg import (
        manifest_summary_filter,
        transform_value,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.sources.iceberg_stream import (
        register_iceberg_stream,
    )

    t, df = _src(spark, tmp_path)
    dest = str(tmp_path / "ice")
    export_iceberg_partitioned(spark, t, dest, partition_by=[("ts", "day")])
    # second export = second manifest with its own day-range summary
    t.append(df.select(
        (F.col("k") + 10_000).alias("k"),
        (F.col("ts") + F.make_interval(days=F.lit(30))).alias("ts"),
        "grp", "tag",
    ))
    export_iceberg_partitioned(spark, t, dest)
    # stream drain sees every row across both snapshots
    register_iceberg_stream(spark)
    got = []
    q = (
        spark.readStream.format("iceberg_stream")
        .option("path", dest).option("startingSnapshotCount", 0)
        .load()
        .writeStream.foreachBatch(
            lambda d, _b: got.extend(
                (r["k"],) for r in d.select("k").collect()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(got) == 1200
    # manifest-level pruning: a day filter admits only the covering
    # manifest's record (the other export's summary excludes it)
    with open(_metadata_path(dest)) as f:
        meta = json.load(f)
    snap = meta["snapshots"][-1]
    _s, mrecs = read_avro(_localize(snap["manifest-list"], dest))
    assert len(mrecs) == 2
    probe = datetime.datetime(2026, 1, 2, 5)
    keep = manifest_summary_filter(
        meta, {"ts_day": transform_value("day", probe)}
    )
    kept = [m for m in mrecs if keep(m)]
    assert len(kept) == 1, [m["manifest_path"] for m in mrecs]
