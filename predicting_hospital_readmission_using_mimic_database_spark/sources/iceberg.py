"""Apache Iceberg table READ interop — the second major lakehouse
format, implemented from the public spec (https://iceberg.apache.org/spec/)
with the stdlib Avro codec in :mod:`.avro_ocf` (Iceberg stores its
manifest lists and manifests as Avro).

Read path (all driver-side metadata until the final Spark scan):

1. resolve the CURRENT metadata JSON under ``<root>/metadata/`` —
   ``version-hint.text`` if present (HadoopTables), else the highest
   ``*.metadata.json`` by embedded version number;
2. pick the snapshot (``snapshot_id=`` time travel, default
   ``current-snapshot-id``), read its manifest LIST (Avro), then each
   manifest (Avro) — live files are the entries with status
   0 (existing) / 1 (added); status 2 (deleted) rows are tombstones;
3. hand Spark only those parquet files with the table schema converted
   from the Iceberg schema JSON (explicit read schema — no inference).

V2 POSITIONAL deletes (the most common row-level-delete shape in real
Iceberg tables — every MERGE/DELETE from Spark/Flink/Trino writes them)
are APPLIED, not gated: delete manifests (manifest-list ``content=1``)
list parquet delete files of ``(file_path, pos)`` rows; the reader
scans the data files with Spark's parquet ``_metadata.row_index``
(the in-file row ordinal — exactly the spec's ``pos``) and LEFT
ANTI-joins the normalized ``(file path, position)`` pairs, broadcast
by default (delete files are a small fraction of table size; pass
``broadcast_deletes=False`` for a shuffled anti-join when they are
not). Dead rows never reach the caller, data files are read once.

Honest gates (raise, never silently wrong): format-version > 2,
EQUALITY delete files (``content=2`` — applying them needs
sequence-number ordering this reader does not track), non-parquet data
or delete files, and unsupported types. Column resolution is NAME-based
(the parquet files carry the names Iceberg wrote); field-id remapping
after a column RENAME is not implemented and the reader cannot detect
it — documented limitation, same posture as the Delta reader's column-
mapping gate.

Identity-partitioned tables read transparently: Iceberg writes source
columns INTO the data files (unlike Hive/Delta layouts), so no
partition-value materialization step is needed; the manifests'
partition summaries are still used for metadata-level pruning via
``partitions=``.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .avro_ocf import read_avro


class IcebergProtocolError(NotImplementedError):
    """The table requires read capabilities this interop layer does not
    implement (row-level deletes, field-id remapping, v3+)."""


#: spec-shaped manifest entry / manifest list schemas (unpartitioned
#: identity spec) — used by export_iceberg and by test fixtures
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
                        "type": {"type": "record", "name": "r102", "fields": []},
                    },
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
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
    ],
}


def _metadata_path(root: str) -> str:
    mdir = os.path.join(root, "metadata")
    if not os.path.isdir(mdir):
        raise FileNotFoundError(f"not an iceberg table (no metadata/): {root}")
    hint = os.path.join(mdir, "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as f:
            v = f.read().strip()
        for cand in (f"v{v}.metadata.json", f"{v}.metadata.json"):
            p = os.path.join(mdir, cand)
            if os.path.exists(p):
                return p
    best: tuple[int, str] | None = None
    for name in os.listdir(mdir):
        if not name.endswith(".metadata.json"):
            continue
        m = re.match(r"^v?(\d+)", name)
        seq = int(m.group(1)) if m else -1
        if best is None or seq > best[0]:
            best = (seq, os.path.join(mdir, name))
    if best is None:
        raise FileNotFoundError(f"no *.metadata.json under {mdir}")
    return best[1]


def _localize(uri: str, root: str) -> str:
    """Manifest/data paths are URIs; map file: URIs to local paths and
    resolve relative ones against the table root."""
    if uri.startswith("file://"):
        return uri[len("file://"):]
    if uri.startswith("file:"):
        return uri[len("file:"):]
    if "://" in uri:
        return uri  # s3:// etc — hand to Spark's filesystem layer as-is
    if os.path.isabs(uri):
        return uri
    return os.path.join(root, uri)


def _spark_type(t) -> T.DataType:
    if isinstance(t, dict):
        kind = t.get("type")
        if kind == "struct":
            return T.StructType(
                [
                    T.StructField(
                        f["name"], _spark_type(f["type"]), not f.get("required", False)
                    )
                    for f in t["fields"]
                ]
            )
        if kind == "list":
            return T.ArrayType(
                _spark_type(t["element"]), not t.get("element-required", False)
            )
        if kind == "map":
            return T.MapType(
                _spark_type(t["key"]),
                _spark_type(t["value"]),
                not t.get("value-required", False),
            )
        raise IcebergProtocolError(f"unsupported nested type {kind!r}")
    m = {
        "boolean": T.BooleanType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "date": T.DateType(),
        "timestamp": T.TimestampNTZType(),
        "timestamptz": T.TimestampType(),
        "string": T.StringType(),
        "uuid": T.StringType(),
        "binary": T.BinaryType(),
    }
    if t in m:
        return m[t]
    dm = re.match(r"^decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)$", t)
    if dm:
        return T.DecimalType(int(dm.group(1)), int(dm.group(2)))
    fm = re.match(r"^fixed\[(\d+)\]$", t)
    if fm:
        return T.BinaryType()
    raise IcebergProtocolError(f"unsupported iceberg type {t!r}")


def _table_schema(meta: dict) -> T.StructType:
    if "schemas" in meta:
        sid = meta.get("current-schema-id", 0)
        for s in meta["schemas"]:
            if s.get("schema-id", 0) == sid:
                return _spark_type(s)
        raise ValueError(f"current-schema-id {sid} not in schemas")
    return _spark_type(meta["schema"])  # format v1


def _iceberg_type(dt: T.DataType) -> object:
    m = {
        T.BooleanType: "boolean",
        T.IntegerType: "int",
        T.LongType: "long",
        T.FloatType: "float",
        T.DoubleType: "double",
        T.DateType: "date",
        T.TimestampNTZType: "timestamp",
        T.TimestampType: "timestamptz",
        T.StringType: "string",
        T.BinaryType: "binary",
    }
    for k, v in m.items():
        if isinstance(dt, k):
            return v
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision}, {dt.scale})"
    raise IcebergProtocolError(f"export: unsupported spark type {dt}")


def export_iceberg(table) -> int:
    """Publish a :class:`~.table.SnapshotTable`'s CURRENT snapshot as a
    real Iceberg v2 table under the table root — zero data movement
    (parquet files shared byte-for-byte), so pyiceberg/Trino/Spark's
    iceberg runtime (or :func:`read_iceberg`) can read it in place.

    Each export appends ONE Iceberg snapshot: a fresh manifest listing
    every live file (the simple full-manifest exporter posture — valid
    per spec, metadata cost O(snapshots x files); the native commit log
    remains the engine's own incremental format), a manifest list, a new
    ``vN.metadata.json`` carrying the whole snapshot lineage, and an
    updated ``version-hint.text``. A no-change export writes nothing.
    Earlier exported snapshots stay time-travelable. Returns the
    exported snapshot id. Unpartitioned spec (bucket locality is an
    engine-side read optimization, not table state — same posture as
    the Delta export)."""
    import time

    from .avro_ocf import write_avro

    root = table.root
    table._refresh()
    live = sorted(table._live.items())
    mdir = os.path.join(root, "metadata")
    os.makedirs(mdir, exist_ok=True)
    prev_meta = None
    try:
        with open(_metadata_path(root)) as f:
            prev_meta = json.load(f)
    except FileNotFoundError:
        pass
    snapshots = list(prev_meta.get("snapshots", [])) if prev_meta else []
    if snapshots:
        last_id = max(s["snapshot-id"] for s in snapshots)
        cur = next(
            s for s in snapshots
            if s["snapshot-id"] == prev_meta["current-snapshot-id"]
        )
        _s, prev_manifests = read_avro(_localize(cur["manifest-list"], root))
        prev_files = set()
        for mrec in prev_manifests:
            _s2, entries = read_avro(_localize(mrec["manifest_path"], root))
            prev_files.update(
                e["data_file"]["file_path"] for e in entries
                if e.get("status", 0) != 2
            )
        if prev_files == {os.path.join(root, rel) for rel, _a in live}:
            return last_id  # no change since the last export
        sid = last_id + 1
        version = int(prev_meta.get("_export_version", len(snapshots))) + 1
    else:
        sid, version = 1, 1
    manifest = os.path.join(mdir, f"manifest-{sid}.avro")
    write_avro(
        manifest,
        MANIFEST_ENTRY_SCHEMA,
        [
            {
                "status": 1,
                "snapshot_id": sid,
                "data_file": {
                    "content": 0,
                    "file_path": os.path.join(root, rel),
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": act.rows,
                    "file_size_in_bytes": os.path.getsize(
                        os.path.join(root, rel)
                    ),
                },
            }
            for rel, act in live
        ],
    )
    mlist = os.path.join(mdir, f"snap-{sid}.avro")
    write_avro(
        mlist,
        MANIFEST_FILE_SCHEMA,
        [
            {
                "manifest_path": manifest,
                "manifest_length": os.path.getsize(manifest),
                "partition_spec_id": 0,
                "content": 0,
                "added_snapshot_id": sid,
            }
        ],
    )
    snapshots.append(
        {
            "snapshot-id": sid,
            "timestamp-ms": int(time.time() * 1000),
            "summary": {"operation": "overwrite" if sid > 1 else "append"},
            "manifest-list": mlist,
            "schema-id": 0,
        }
    )
    fields = [
        {
            "id": i + 1,
            "name": f.name,
            "required": False,
            "type": _iceberg_type(f.dataType),
        }
        for i, f in enumerate(table.schema.fields)
    ]
    meta = {
        "format-version": 2,
        "table-uuid": "snapshot-export",
        "location": root,
        "last-sequence-number": sid,
        "last-updated-ms": int(time.time() * 1000),
        "last-column-id": len(fields),
        "schemas": [{"type": "struct", "schema-id": 0, "fields": fields}],
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "snapshots": snapshots,
        "current-snapshot-id": sid,
        "_export_version": version,
    }
    with open(os.path.join(mdir, f"v{version}.metadata.json"), "w") as f:
        json.dump(meta, f)
    tmp = os.path.join(mdir, ".hint.tmp")
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, os.path.join(mdir, "version-hint.text"))
    return sid


def iceberg_snapshots(root: str) -> list[dict]:
    """(snapshot-id, timestamp-ms, operation) per snapshot — the
    DESCRIBE HISTORY surface."""
    with open(_metadata_path(root)) as f:
        meta = json.load(f)
    return [
        {
            "snapshot_id": s["snapshot-id"],
            "timestamp_ms": s.get("timestamp-ms"),
            "operation": (s.get("summary") or {}).get("operation"),
        }
        for s in meta.get("snapshots", [])
    ]


def _live_files(
    meta: dict, root: str, snapshot_id
) -> tuple[list[tuple[str, dict]], list[str]]:
    """(data files with partition values, POSITIONAL delete file paths)
    live at the snapshot. Equality deletes (content=2) raise."""
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    sid = snapshot_id if snapshot_id is not None else meta.get("current-snapshot-id")
    if sid is None or sid == -1:
        return [], []
    if sid not in snaps:
        raise ValueError(
            f"snapshot {sid} not found (have {sorted(snaps)})"
        )
    snap = snaps[sid]
    if "manifest-list" in snap:
        _s, manifests = read_avro(_localize(snap["manifest-list"], root))
        manifest_paths = [
            (mrec["manifest_path"], mrec.get("content", 0) == 1)
            for mrec in manifests
        ]
    else:
        # format v1 inline manifest list: data manifests only
        manifest_paths = [(p, False) for p in snap.get("manifests", [])]
    data_out: list[tuple[str, dict]] = []
    del_out: list[str] = []
    for mp, is_delete in manifest_paths:
        _s, entries = read_avro(_localize(mp, root))
        for e in entries:
            if e.get("status", 0) == 2:
                continue  # deleted tombstone
            df = e["data_file"]
            content = df.get("content", 0)
            fmt = str(df.get("file_format", "PARQUET")).upper()
            if content == 2:
                raise IcebergProtocolError(
                    "manifest references an EQUALITY delete file "
                    "(content=2); applying equality deletes needs "
                    "sequence-number ordering this reader does not track"
                )
            if fmt != "PARQUET":
                raise IcebergProtocolError(
                    f"non-parquet {'delete' if content else 'data'} "
                    f"file format {fmt!r}"
                )
            if content == 1:
                if not is_delete:
                    raise IcebergProtocolError(
                        "data manifest references a delete file "
                        "(content=1 outside a DELETE manifest); "
                        "malformed metadata"
                    )
                del_out.append(df["file_path"])
            elif is_delete:
                raise IcebergProtocolError(
                    "DELETE manifest entry carries content=0 (a data "
                    "file); malformed metadata"
                )
            else:
                data_out.append((df["file_path"], df.get("partition") or {}))
    return data_out, del_out


def read_iceberg(
    spark: SparkSession,
    root: str,
    snapshot_id: int | None = None,
    partitions: dict[str, object] | None = None,
    broadcast_deletes: bool = True,
) -> DataFrame:
    """Snapshot-read an Iceberg table (``snapshot_id=`` time travel,
    default the current snapshot). ``partitions`` prunes files at the
    METADATA level against the manifests' identity-partition values
    (``{"seg": "A"}`` or per-column value lists) before Spark lists
    anything — unknown partition field names raise.

    V2 POSITIONAL deletes are applied (see the module docstring): data
    files are scanned once with ``_metadata.row_index`` and the delete
    files' ``(file_path, pos)`` pairs are LEFT ANTI-joined — broadcast
    by default (``broadcast_deletes=False`` switches to a shuffled
    anti-join for delete sets too large to broadcast). Equality deletes
    raise."""
    with open(_metadata_path(root)) as f:
        meta = json.load(f)
    if int(meta.get("format-version", 1)) > 2:
        raise IcebergProtocolError(
            f"format-version {meta['format-version']} > 2 is not supported"
        )
    schema = _table_schema(meta)
    files, delete_files = _live_files(meta, root, snapshot_id)
    if partitions:
        known = set()
        for _p, pv in files:
            known.update(pv)
        unknown = [c for c in partitions if files and c not in known]
        if unknown:
            raise ValueError(
                f"partitions filter names unknown partition fields {unknown} "
                f"(manifest partition fields: {sorted(known)})"
            )

        def _admits(want, got) -> bool:
            vals = want if isinstance(want, (list, set, tuple)) else [want]
            return any(v == got for v in vals)

        files = [
            (p, pv)
            for p, pv in files
            if all(_admits(w, pv.get(c)) for c, w in partitions.items())
        ]
    if not files:
        return spark.createDataFrame([], schema)
    paths = sorted(_localize(p, root) for p, _pv in files)
    df = spark.read.schema(schema).parquet(*paths)
    if not delete_files:
        return df
    from pyspark.sql import functions as F

    out_cols = [f.name for f in schema.fields]

    def _norm(col):
        # both sides to decoded local-path form: _metadata.file_path is
        # the URI Spark read ("file:///a/b%20c.parquet"); delete-file
        # rows carry the writer's URI serialization of the same path
        return F.regexp_replace(F.url_decode(col), r"^file:/+", "/")

    fp, pos = "__iceberg_file", "__iceberg_pos"
    while fp in out_cols or pos in out_cols:
        fp, pos = "_" + fp, "_" + pos
    keyed = df.select(
        "*",
        _norm(F.col("_metadata.file_path")).alias(fp),
        F.col("_metadata.row_index").alias(pos),
    )
    from pyspark.sql.types import LongType, StringType, StructField

    del_schema = T.StructType(
        [
            StructField("file_path", StringType(), True),
            StructField("pos", LongType(), True),
        ]
    )
    dels = (
        spark.read.schema(del_schema)
        .parquet(*sorted(_localize(p, root) for p in delete_files))
        .select(_norm(F.col("file_path")).alias(fp), F.col("pos").alias(pos))
    )
    if broadcast_deletes:
        dels = F.broadcast(dels)
    return keyed.join(dels, [fp, pos], "left_anti").select(*out_cols)


#: spec-shaped positional-delete file schema: (file_path, pos) sorted
POS_DELETE_COLS = ("file_path", "pos")


def append_position_deletes(
    root: str, deletes: list[tuple[str, int]]
) -> int:
    """Append ONE v2 snapshot that positionally deletes ``(data file
    path, row ordinal)`` pairs — the minimal foreign-writer surface
    (what a Spark/Flink/Trino DELETE commits): a parquet delete file
    sorted by (file_path, pos), a DELETE manifest (``content=1``), a
    manifest list reusing the current snapshot's data manifests, and a
    new ``vN.metadata.json`` + ``version-hint.text``. Returns the new
    snapshot id. Used by the s20 fixture and tests; the engine's own
    mutation path remains SnapshotTable."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from .avro_ocf import write_avro

    with open(_metadata_path(root)) as f:
        meta = json.load(f)
    snaps = meta.get("snapshots", [])
    cur = next(
        s for s in snaps if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _s, manifests = read_avro(_localize(cur["manifest-list"], root))
    sid = max(s["snapshot-id"] for s in snaps) + 1
    mdir = os.path.join(root, "metadata")
    rows = sorted((str(p), int(x)) for p, x in deletes)
    del_path = os.path.join(mdir, f"pos-delete-{sid}.parquet")
    pq.write_table(
        pa.table(
            {
                "file_path": [r[0] for r in rows],
                "pos": pa.array([r[1] for r in rows], type=pa.int64()),
            }
        ),
        del_path,
    )
    del_manifest = os.path.join(mdir, f"manifest-del-{sid}.avro")
    write_avro(
        del_manifest,
        MANIFEST_ENTRY_SCHEMA,
        [
            {
                "status": 1,
                "snapshot_id": sid,
                "data_file": {
                    "content": 1,
                    "file_path": del_path,
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": len(rows),
                    "file_size_in_bytes": os.path.getsize(del_path),
                },
            }
        ],
    )
    mlist = os.path.join(mdir, f"snap-{sid}.avro")
    write_avro(
        mlist,
        MANIFEST_FILE_SCHEMA,
        [dict(m) for m in manifests]
        + [
            {
                "manifest_path": del_manifest,
                "manifest_length": os.path.getsize(del_manifest),
                "partition_spec_id": 0,
                "content": 1,
                "added_snapshot_id": sid,
            }
        ],
    )
    import time

    version = int(meta.get("_export_version", len(snaps))) + 1
    meta["snapshots"] = snaps + [
        {
            "snapshot-id": sid,
            "timestamp-ms": int(time.time() * 1000),
            "summary": {"operation": "delete"},
            "manifest-list": mlist,
            "schema-id": 0,
        }
    ]
    meta["current-snapshot-id"] = sid
    meta["last-sequence-number"] = sid
    meta["_export_version"] = version
    with open(os.path.join(mdir, f"v{version}.metadata.json"), "w") as f:
        json.dump(meta, f)
    tmp = os.path.join(mdir, ".hint.tmp")
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, os.path.join(mdir, "version-hint.text"))
    return sid
