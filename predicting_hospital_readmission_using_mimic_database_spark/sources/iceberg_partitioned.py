"""PARTITIONED Iceberg export + partition-spec EVOLUTION.

``export_iceberg`` publishes a SnapshotTable zero-copy under an
UNPARTITIONED spec (bucket locality is an engine-side read
optimization). This module is the complementary PHYSICAL publish —
the same posture as the Hudi partitioned export (hudi_export.py): rows
re-cluster into PARTITION-PURE parquet files so the table's partition
tuples become real Iceberg table state any engine prunes on:

- ``export_iceberg_partitioned(spark, table, dest, partition_by)``
  writes files grouped by the spec's transform values
  (identity / truncate[W] / year / month / day / hour as pure JVM
  expressions; ``bucket[N]`` through ONE Arrow-batched pandas UDF
  whose murmur3 is numpy-vectorized over the Appendix-B 8-byte
  serialization — never a Spark-row round trip), manifests whose
  entries carry TYPED partition tuples, manifest-list records with
  per-field summaries (the manifest-level pruning tier
  ``manifest_summary_filter`` consumes), and per-file Appendix-D
  column bounds. Re-export is INCREMENTAL and append-only: rows added
  to the SnapshotTable since the last export land as new files under
  the CURRENT default spec; a history with deletes/updates gates
  honestly (a partitioned physical re-publish of rewrites would be a
  full-table job — use the zero-copy export for merge-heavy tables).

- ``evolve_iceberg_partition_spec(dest, partition_by)`` appends a NEW
  spec (fresh spec-id, fresh partition-field-ids past
  ``last-partition-id``) and makes it the default — the day->hour
  re-partitioning every long-lived table eventually does. Existing
  files KEEP their original spec (their manifests' ``partition_spec_
  id`` still names it); only files written afterwards carry the new
  tuples. ``read_iceberg(partitions=...)`` already prunes per file
  against the file's OWN spec via the source-column transform map, so
  a query filtered on the source column prunes BOTH vintages.

Scale shape: the write is one repartition by the transform expressions
(each partition tuple lands in one task -> one file per tuple per
export), metadata work is driver-side KBs, and re-exports touch only
the added rows. Partition-tuple cardinality bounds the file count, as
in any real Iceberg writer.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
import uuid
from typing import Sequence
from urllib.parse import unquote

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .avro_ocf import read_avro, write_avro
from .iceberg import (
    MANIFEST_ENTRY_SCHEMA,
    MANIFEST_FILE_SCHEMA,
    IcebergProtocolError,
    _advance_version_hint,
    _iceberg_struct_fields,
    _localize,
    _metadata_path,
    encode_bound,
)
from .table import _harvest_stats

#: transforms the WRITE path can express as JVM expressions; bucket[N]
#: needs the Appendix-B murmur3 (read-side pruning supports it, the
#: writer gates)
_TIME_TRANSFORMS = ("year", "month", "day", "hour")


def _murmur3_32_from_long(v):
    """Vectorized Appendix-B murmur3 over the little-endian 8-byte
    serialization of int64 values — element-for-element equal to
    ``murmur3_32(v.to_bytes(8, 'little', signed=True))``. Pure uint32
    numpy arithmetic (two block rounds, no tail at length 8, standard
    finalization), so a billion-row bucket column is a few array ops
    per Arrow batch, never a Python loop."""
    import numpy as np

    u = v.astype(np.int64).astype(np.uint64)
    c1, c2 = np.uint32(0xCC9E2D51), np.uint32(0x1B873593)
    h = np.zeros(len(u), dtype=np.uint32)
    for k in (
        (u & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        (u >> np.uint64(32)).astype(np.uint32),
    ):
        k = k * c1
        k = (k << np.uint32(15)) | (k >> np.uint32(17))
        k = k * c2
        h = h ^ k
        h = (h << np.uint32(13)) | (h >> np.uint32(19))
        h = h * np.uint32(5) + np.uint32(0xE6546B64)
    h = h ^ np.uint32(8)  # length
    h = h ^ (h >> np.uint32(16))
    h = h * np.uint32(0x85EBCA6B)
    h = h ^ (h >> np.uint32(13))
    h = h * np.uint32(0xC2B2AE35)
    h = h ^ (h >> np.uint32(16))
    return h


def _bucket_expr(col: str, n: int, spark_type: str):
    """bucket[N] as an Arrow-batched pandas UDF: long-serialized types
    go through the fully VECTORIZED murmur3 (numpy uint32 lanes);
    strings hash their UTF-8 bytes per distinct-ish value inside the
    batch (the variable-length case — still Arrow-batched, never a
    Spark-row round trip). NULL -> NULL, the transform's null rule."""
    from pyspark.sql.functions import pandas_udf

    from .iceberg import murmur3_32

    if spark_type in ("integer", "int", "long", "bigint", "short", "byte"):
        def _to_long(s):
            return s
    elif spark_type == "date":
        def _to_long(s):
            return (s.astype("datetime64[ns]")
                    - pd.Timestamp("1970-01-01")).dt.days
    elif spark_type in ("timestamp", "timestamp_ntz"):
        def _to_long(s):
            return s.astype("datetime64[us]").astype("int64")
    elif spark_type == "string":
        _to_long = None
    else:
        raise IcebergProtocolError(
            f"bucket transform over {spark_type} is not supported"
        )

    @pandas_udf("int")
    def bucket(s: pd.Series) -> pd.Series:
        import numpy as np

        mask = s.isna()
        out = pd.Series([None] * len(s), dtype="Int32")
        if mask.all():
            return out
        if _to_long is None:
            vals = s[~mask].map(
                lambda x: (murmur3_32(x.encode("utf-8")) & 0x7FFFFFFF) % n
            )
            out[~mask] = vals.astype("int32")
            return out
        longs = pd.Series(_to_long(s[~mask])).astype("int64").to_numpy()
        h = _murmur3_32_from_long(longs)
        out[~mask] = ((h & np.uint32(0x7FFFFFFF)) % np.uint32(n)).astype(
            "int32"
        )
        return out

    return bucket(F.col(col))


def _transform_expr(col: str, transform: str, spark_type: str):
    """Spark Column computing the Iceberg partition transform — must
    agree exactly with :func:`~.iceberg.transform_value`, which the
    read path uses to admit files for a source-column filter.
    identity/truncate/time transforms are pure JVM expressions;
    bucket[N] is the one Arrow-batched vectorized UDF
    (:func:`_bucket_expr` — the Appendix-B murmur3 has no Spark
    built-in)."""
    t = transform.lower()
    c = F.col(col)
    if t == "identity":
        return c
    m = re.fullmatch(r"truncate\[(\d+)\]", t)
    if m:
        w = int(m.group(1))
        if w <= 0:
            raise ValueError(f"truncate width must be positive: {transform}")
        if spark_type in ("string",):
            return F.substring(c, 1, w)
        # spec floor-mod over integers (Spark % follows the dividend's
        # sign, so fold twice)
        return c - (((c % w) + w) % w)
    if t == "year":
        return (F.year(c) - F.lit(1970)).cast("int")
    if t == "month":
        return (
            (F.year(c) - F.lit(1970)) * F.lit(12) + F.month(c) - F.lit(1)
        ).cast("int")
    if t == "day":
        return F.datediff(F.to_date(c), F.to_date(F.lit("1970-01-01")))
    if t == "hour":
        return F.floor(F.unix_timestamp(c) / F.lit(3600)).cast("int")
    m = re.fullmatch(r"bucket\[(\d+)\]", t)
    if m:
        return _bucket_expr(col, int(m.group(1)), spark_type)
    raise IcebergProtocolError(f"unsupported partition transform {transform!r}")


def _result_type(transform: str, source_icetype) -> str:
    """Iceberg type of the transform RESULT (what partition tuples and
    field summaries serialize as)."""
    t = transform.lower()
    if t in _TIME_TRANSFORMS or t.startswith("bucket"):
        return "int"
    return source_icetype  # identity / truncate keep the source type


_AVRO_OF_ICE = {
    "int": "int", "long": "long", "float": "float", "double": "double",
    "string": "string", "date": "int", "boolean": "boolean",
}


def _parse_dir_value(raw: str, icetype: str):
    """Hive-style partition-dir component back to a typed value."""
    if raw == "__HIVE_DEFAULT_PARTITION__":
        return None
    v = unquote(raw)
    if icetype in ("int", "long", "date"):
        return int(v)
    if icetype in ("float", "double"):
        return float(v)
    if icetype == "boolean":
        return v.lower() == "true"
    return v


#: source Iceberg types each WRITE-path transform round-trips exactly
#: through hive-style partition directory names (the tuple store).
#: date/timestamp sources take the TIME transforms (int results);
#: float/double identity would round-trip lossily through the dir name
#: and could then WRONGLY prune — gated, like the official writers'
#: recommendation to never identity-partition on continuous values.
_WRITABLE_SOURCES = {
    "identity": ("int", "long", "string", "boolean"),
    "truncate": ("int", "long", "string"),
    "bucket": ("int", "long", "string", "date", "timestamp", "timestamptz"),
    "year": ("date", "timestamp", "timestamptz"),
    "month": ("date", "timestamp", "timestamptz"),
    "day": ("date", "timestamp", "timestamptz"),
    "hour": ("timestamp", "timestamptz"),
}


def _norm_spec(partition_by, fields_by_name: dict) -> list[dict]:
    """[(source col, transform)] -> spec field dicts (names derived as
    <col> for identity else <col>_<base>), with the transform string
    and the source type validated HERE — at declaration time — so an
    evolve with a bogus transform cannot poison later exports."""
    out = []
    for src, transform in partition_by:
        info = fields_by_name.get(src)
        if info is None:
            raise ValueError(f"partition_by names unknown column {src!r}")
        t = transform.lower()
        base = t.split("[", 1)[0]
        if base not in _WRITABLE_SOURCES or (
            base in ("truncate", "bucket")
            and not re.fullmatch(rf"{base}\[\d+\]", t)
        ) or (base not in ("truncate", "bucket") and t != base):
            raise IcebergProtocolError(
                f"unsupported partition transform {transform!r}"
            )
        stype = info["type"] if isinstance(info["type"], str) else "nested"
        if stype not in _WRITABLE_SOURCES[base]:
            raise IcebergProtocolError(
                f"partition transform {t!r} over source type {stype!r} is "
                "not supported on the WRITE path (the partition-dir tuple "
                "store round-trips int/long/string/boolean exactly; use a "
                "time transform for date/timestamp sources)"
            )
        name = src if t == "identity" else f"{src}_{base}"
        out.append(
            {
                "name": name,
                "transform": t,
                "source-id": info["id"],
                "source-type": info["type"],
            }
        )
    if len({f["name"] for f in out}) != len(out):
        raise ValueError("partition field names collide; use distinct "
                         "(column, transform) pairs")
    return out


def _entry_schema(spec_fields: list[dict]) -> dict:
    """MANIFEST_ENTRY_SCHEMA with the partition record carrying this
    spec's TYPED fields instead of the unpartitioned empty struct."""
    schema = json.loads(json.dumps(MANIFEST_ENTRY_SCHEMA))
    df_fields = next(
        f for f in schema["fields"] if f["name"] == "data_file"
    )["type"]["fields"]
    part = next(f for f in df_fields if f["name"] == "partition")
    part["type"]["fields"] = [
        {
            "name": f["name"],
            "type": [
                "null",
                _AVRO_OF_ICE[_result_type(f["transform"], f["source-type"])],
            ],
            "default": None,
        }
        for f in spec_fields
    ]
    return schema


def partition_summaries(
    spec_fields: list[dict], tuples: list[dict]
) -> list[dict]:
    """Manifest-list ``partitions`` field summaries for one manifest's
    entry tuples — the manifest-level pruning tier
    ``manifest_summary_filter`` consumes. ``spec_fields`` need
    ``source-type`` resolved (see callers)."""
    out = []
    for f in spec_fields:
        vals = [pv.get(f["name"]) for pv in tuples]
        non_null = [v for v in vals if v is not None]
        rt = _result_type(f["transform"], f["source-type"])
        out.append(
            {
                "contains_null": any(v is None for v in vals),
                "contains_nan": False,
                "lower_bound": encode_bound(rt, min(non_null))
                if non_null else None,
                "upper_bound": encode_bound(rt, max(non_null))
                if non_null else None,
            }
        )
    return out


def export_iceberg_partitioned(
    spark: SparkSession,
    table,
    dest: str,
    partition_by: Sequence[tuple] | None = None,
) -> int:
    """Publish ``table`` as a PARTITIONED Iceberg v2 table under
    ``dest`` (physical rewrite into partition-pure files). First call
    creates the table with ``partition_by`` = [(column, transform),
    ...]; later calls ignore ``partition_by`` and append the rows the
    SnapshotTable gained since the previous export under the CURRENT
    default spec (evolved or not). Append-only: a source history with
    deletes or rewrites since the last export raises. Returns the new
    snapshot id (the previous one when nothing changed)."""
    table._refresh()
    mdir = os.path.join(dest, "metadata")
    meta_p = None
    try:
        meta_p = _metadata_path(dest)
    except FileNotFoundError:
        pass
    if meta_p is None:
        if not partition_by:
            raise ValueError(
                "first export needs partition_by=[(column, transform), ...]"
            )
        _next = [1]
        ice_fields = _iceberg_struct_fields(table.schema, _next)
        by_name = {f["name"]: f for f in ice_fields}
        spec_norm = _norm_spec(partition_by, by_name)
        spec_fields = [
            {
                "name": f["name"],
                "transform": f["transform"],
                "source-id": f["source-id"],
                "field-id": 1000 + i,
            }
            for i, f in enumerate(spec_norm)
        ]
        meta = {
            "format-version": 2,
            "table-uuid": "snapshot-export-partitioned",
            "location": dest,
            "last-sequence-number": 0,
            "last-updated-ms": int(time.time() * 1000),
            "last-column-id": _next[0] - 1,
            "schemas": [
                {"type": "struct", "schema-id": 0, "fields": ice_fields}
            ],
            "current-schema-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
            "default-spec-id": 0,
            "last-partition-id": 1000 + len(spec_fields) - 1,
            "snapshots": [],
            "current-snapshot-id": -1,
            "_export_version": 0,
            "_export_source_version": -1,
        }
        os.makedirs(mdir, exist_ok=True)
        df = table.read()
        since = table.version
    else:
        with open(meta_p) as f:
            meta = json.load(f)
        prev_src = int(meta.get("_export_source_version", -1))
        cur_src = table.version
        if cur_src == prev_src:
            return int(meta["current-snapshot-id"])
        changes = table.read_changes(from_version=prev_src)
        kinds = {
            r["_change_type"]
            for r in changes.select("_change_type").distinct().collect()
        }
        if kinds - {"insert"}:
            raise IcebergProtocolError(
                "partitioned export is APPEND-ONLY: the source history "
                f"since version {prev_src} contains {sorted(kinds)} "
                "changes; a physical re-publish of rewrites would be a "
                "full-table job — use export_iceberg (zero-copy) for "
                "merge-heavy tables"
            )
        df = changes.drop("_change_type", "_commit_version")
        since = cur_src

    csid = meta["current-schema-id"]
    cur_schema = next(
        s for s in meta["schemas"] if s["schema-id"] == csid
    )
    by_name = {f["name"]: f for f in cur_schema["fields"]}
    default_spec = next(
        s for s in meta["partition-specs"]
        if s["spec-id"] == meta["default-spec-id"]
    )
    spec_fields = default_spec["fields"]
    id2field = {f["id"]: f for f in cur_schema["fields"]}

    # one physical column per spec field, computed JVM-side; the
    # partitionBy write drops ONLY these extras, so data files keep
    # every logical column (the spec's shape — identity sources stay
    # in the files)
    spark_types = {
        f.name: f.dataType.typeName() for f in table.schema.fields
    }
    pcols = []
    for f in spec_fields:
        src = id2field[f["source-id"]]["name"]
        pc = f"__p_{f['name']}"
        df = df.withColumn(
            pc, _transform_expr(src, f["transform"], spark_types[src])
        )
        pcols.append(pc)
    df = df.repartition(*[F.col(c) for c in pcols])

    stage = os.path.join(dest, f".stage-{uuid.uuid4().hex}")
    sid = (
        max((s["snapshot-id"] for s in meta["snapshots"]), default=0) + 1
    )
    data_cols = [f.name for f in table.schema.fields]
    result_types = {
        f["name"]: _result_type(
            f["transform"], id2field[f["source-id"]]["type"]
        )
        for f in spec_fields
    }
    new_files: list[tuple[str, dict, int, dict]] = []
    try:
        df.write.partitionBy(*pcols).parquet(stage)
        for dirpath, _dirs, fnames in os.walk(stage):
            parts = [
                p for p in fnames
                if p.startswith("part-") and p.endswith(".parquet")
            ]
            if not parts:
                continue
            rel = os.path.relpath(dirpath, stage)
            pv: dict = {}
            for comp in [] if rel == "." else rel.split(os.sep):
                k, _, raw = comp.partition("=")
                fname = k[len("__p_"):]
                pv[fname] = _parse_dir_value(raw, result_types[fname])
            ddir = os.path.join(dest, "data", rel) if rel != "." else os.path.join(dest, "data")
            os.makedirs(ddir, exist_ok=True)
            for i, p in enumerate(sorted(parts)):
                dst = os.path.join(ddir, f"s{sid}-{i:05d}-{uuid.uuid4().hex[:8]}.parquet")
                shutil.move(os.path.join(dirpath, p), dst)
                n_rows, mm = _harvest_stats(dst, data_cols)
                new_files.append((dst, pv, n_rows, mm))
    finally:
        shutil.rmtree(stage, ignore_errors=True)

    if not new_files and meta["snapshots"]:
        return int(meta["current-snapshot-id"])

    top_info = {f["name"]: (f["id"], f["type"]) for f in cur_schema["fields"]}

    def _entry_bounds(mm: dict):
        lo, hi = [], []
        for col, rng in (mm or {}).items():
            info = top_info.get(col)
            if info is None or not rng:
                continue
            fid, itype = info
            b_lo = encode_bound(itype, rng[0])
            b_hi = encode_bound(itype, rng[1])
            if b_lo is None or b_hi is None:
                continue
            lo.append({"key": fid, "value": b_lo})
            hi.append({"key": fid, "value": b_hi})
        return (lo or None, hi or None)

    entries = []
    for dst, pv, n_rows, mm in new_files:
        b_lo, b_hi = _entry_bounds(mm)
        entries.append(
            {
                "status": 1,
                "snapshot_id": sid,
                "data_file": {
                    "content": 0,
                    "file_path": dst,
                    "file_format": "PARQUET",
                    "partition": pv,
                    "record_count": n_rows,
                    "file_size_in_bytes": os.path.getsize(dst),
                    "equality_ids": None,
                    "lower_bounds": b_lo,
                    "upper_bounds": b_hi,
                },
            }
        )
    manifest = os.path.join(mdir, f"manifest-{sid}.avro")
    write_avro(manifest, _entry_schema(
        [
            {**f, "source-type": id2field[f["source-id"]]["type"]}
            for f in spec_fields
        ]
    ), entries)

    # per-field summaries: the manifest-level pruning tier
    summaries = partition_summaries(
        [
            {**f, "source-type": id2field[f["source-id"]]["type"]}
            for f in spec_fields
        ],
        [pv for _d, pv, _n, _m in new_files],
    )

    cur = None
    carried = []
    if meta["snapshots"]:
        cur = next(
            s for s in meta["snapshots"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        _s, prev_manifests = read_avro(_localize(cur["manifest-list"], dest))
        carried = [dict(m) for m in prev_manifests]
    mlist = os.path.join(mdir, f"snap-{sid}.avro")
    write_avro(
        mlist,
        MANIFEST_FILE_SCHEMA,
        [{"sequence_number": None, "first_row_id": None, **m} for m in carried]
        + [
            {
                "manifest_path": manifest,
                "manifest_length": os.path.getsize(manifest),
                "partition_spec_id": default_spec["spec-id"],
                "content": 0,
                "added_snapshot_id": sid,
                "sequence_number": sid,
                "first_row_id": None,
                "partitions": summaries,
            }
        ],
    )
    version = int(meta.get("_export_version", 0)) + 1
    meta["snapshots"] = meta["snapshots"] + [
        {
            "snapshot-id": sid,
            "parent-snapshot-id": meta.get("current-snapshot-id"),
            "timestamp-ms": int(time.time() * 1000),
            "summary": {"operation": "append"},
            "manifest-list": mlist,
            "schema-id": csid,
        }
    ]
    meta["current-snapshot-id"] = sid
    meta["last-sequence-number"] = max(
        int(meta.get("last-sequence-number", 0)), sid
    )
    meta["last-updated-ms"] = int(time.time() * 1000)
    meta["_export_version"] = version
    meta["_export_source_version"] = since
    with open(os.path.join(mdir, f"v{version}.metadata.json"), "w") as f:
        json.dump(meta, f)
    _advance_version_hint(mdir, version)
    return sid


def evolve_iceberg_partition_spec(
    dest: str, partition_by: Sequence[tuple]
) -> int:
    """Append a NEW partition spec and make it the default (the spec's
    partition evolution: metadata-only, no data movement — existing
    files keep their original spec and remain individually prunable
    against it). Returns the new spec id."""
    with open(_metadata_path(dest)) as f:
        meta = json.load(f)
    csid = meta["current-schema-id"]
    cur_schema = next(s for s in meta["schemas"] if s["schema-id"] == csid)
    by_name = {f["name"]: f for f in cur_schema["fields"]}
    spec_norm = _norm_spec(partition_by, by_name)
    new_id = max(s["spec-id"] for s in meta["partition-specs"]) + 1
    next_fid = int(meta.get("last-partition-id", 999)) + 1
    fields = [
        {
            "name": f["name"],
            "transform": f["transform"],
            "source-id": f["source-id"],
            "field-id": next_fid + i,
        }
        for i, f in enumerate(spec_norm)
    ]
    existing_names = {
        f["name"]
        for s in meta["partition-specs"]
        for f in s["fields"]
    }
    for f in fields:
        if f["name"] in existing_names:
            # same (source, transform) re-declared is fine spec-wise,
            # but a NAME reused for a different transform would make
            # partition tuples ambiguous across specs
            prior = next(
                pf
                for s in meta["partition-specs"]
                for pf in s["fields"]
                if pf["name"] == f["name"]
            )
            if (prior["source-id"], prior["transform"]) != (
                f["source-id"], f["transform"]
            ):
                raise IcebergProtocolError(
                    f"partition field name {f['name']!r} already names a "
                    "different (source, transform) in an earlier spec"
                )
    meta["partition-specs"] = meta["partition-specs"] + [
        {"spec-id": new_id, "fields": fields}
    ]
    meta["default-spec-id"] = new_id
    meta["last-partition-id"] = next_fid + len(fields) - 1
    version = int(meta.get("_export_version", 0)) + 1
    meta["_export_version"] = version
    mdir = os.path.join(dest, "metadata")
    with open(os.path.join(mdir, f"v{version}.metadata.json"), "w") as f:
        json.dump(meta, f)
    _advance_version_hint(mdir, version)
    return new_id
