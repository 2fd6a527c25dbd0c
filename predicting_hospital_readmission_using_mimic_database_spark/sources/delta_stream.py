"""A FOREIGN Delta table as a Structured Streaming SOURCE —
``spark.readStream.format("delta_stream").option("path", root)``.

What Delta's own streaming source does (public semantics), rebuilt on
the PySpark 4 Python Data Source API over :mod:`.delta`'s log replay:

* OFFSETS are committed delta versions — durable, replayable: a
  micro-batch (start, end] is exactly the ``add`` actions of those
  JSON commits, one input partition per added file, so exactly-once
  falls out of checkpointed offsets (the same posture as the engine's
  ``snapshot_changes`` source).
* ``startingVersion`` option: a version number to replay from, or
  ``"latest"`` (the DEFAULT — only commits after stream start are
  processed; pass ``0`` to ingest the whole history).
* Data-changing ``remove`` actions (UPDATE/DELETE/MERGE rewrites)
  RAISE by default — a pure append tail cannot represent them — unless
  ``ignoreChanges=true``, which processes the commit's adds anyway
  (may re-emit rewritten rows; Delta's own documented trade-off).
* DELETION VECTORS on streamed adds are applied per file: the bitmap
  is decoded driver-side (:mod:`.dv`) and dead row ordinals are
  skipped while the partition streams the parquet rows.
* Partition columns are materialized from the log's partitionValues
  (string serialization cast to the declared type). Column mapping is
  supported in BOTH modes: ``name`` reads files by their physical
  col-uuid names and emits rows under the logical schema; ``id``
  resolves each declared ``delta.columnMapping.id`` against the
  ``PARQUET:field_id`` metadata of EACH file's own schema — immune to
  physical-name drift across files (the spec's reason for id mode).
  partitionValues are keyed by physical name under either mode.

Every emitted row carries ``_commit_version`` (long), so downstream
exactly-once sinks can key idempotence on (version, row) like the
engine's CDC feed.

``rowTracking=true`` (tables declaring ``delta.enableRowTracking``):
every row also carries ``_row_id`` (``add.baseRowId`` + position,
stored materialized columns winning per row) and
``_row_commit_version`` (``defaultRowCommitVersion``) — the streaming
twin of :func:`.delta.read_delta`'s ``row_tracking=True``.

``readChangeFeed=true`` streams the table's CHANGE DATA FEED instead
of the append tail (the semantics of :func:`.delta.read_delta_changes`,
per micro-batch version window): a commit's ``cdc`` files — whose rows
carry their own ``_change_type`` — supersede its add/remove pair;
commits without cdc actions derive inserts from dataChange adds and
deletes from dataChange removes (so UPDATE/DELETE/MERGE commits no
longer raise — they stream as row-level changes); every row gains
``_change_type``. Schema evolution mid-stream and DV-carrying changes
without cdc files raise.
"""

from __future__ import annotations

import json
import os
from urllib.parse import unquote

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from .delta import (
    DELTA_LOG_DIR,
    DeltaProtocolError,
    _check_meta,
    _check_protocol,
    _delta_commits,
    _replay_log,
)

__all__ = ["DeltaStreamDataSource", "register_delta_stream"]


class _AddPartition(InputPartition):
    def __init__(
        self, version, path, pv, dv, data_cols, part_casts,
        ctype=None, own_ct=False, rt=None,
    ):
        self.version = version
        self.path = path
        self.pv = pv                  # {partition col -> string | None}
        self.dv = dv                  # deletionVector descriptor | None
        self.data_cols = data_cols    # column names stored IN the file
        self.part_casts = part_casts  # [(col, type name)] in schema order
        self.ctype = ctype            # CDF: manifest change type (derived)
        self.own_ct = own_ct          # CDF: file carries _change_type itself
        #: row tracking: (baseRowId, defaultRowCommitVersion) — fresh
        #: _row_id = baseRowId + position; stored materialized columns
        #: win per row (read() checks the file's schema)
        self.rt = rt


def _cast_pv(raw: str | None, type_name: str):
    """The spec's string partition-value serialization -> python value
    (what the Python data source hands Spark for the declared type)."""
    if raw is None:
        return None
    t = type_name.lower()
    if t in ("byte", "short", "integer", "long"):
        return int(raw)
    if t in ("float", "double"):
        return float(raw)
    if t == "boolean":
        return raw == "true"
    if t == "date":
        import datetime

        return datetime.date.fromisoformat(raw)
    if t.startswith("decimal"):
        import decimal

        return decimal.Decimal(raw)
    if t in ("timestamp", "timestamp_ntz"):
        import datetime

        return datetime.datetime.fromisoformat(raw)
    if t == "string":
        return raw
    raise DeltaProtocolError(
        f"unsupported partition column type {type_name!r} for the "
        "delta_stream source"
    )


class DeltaStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self._root = options.get("path")
        if not self._root:
            raise ValueError("delta_stream requires .option('path', <table root>)")
        meta, _live, _dvs, last = _replay_log(self._root)
        mode = (meta.get("configuration") or {}).get(
            "delta.columnMapping.mode", "none"
        )
        self._mode = mode
        schema = StructType.fromJson(json.loads(meta["schemaString"]))
        # NAME mode: files store physical col-uuid names and
        # partitionValues use physical keys — read physical, emit rows
        # under the logical schema. ID mode: files resolve by parquet
        # FIELD IDS — the per-file read maps each declared field id to
        # whatever physical name that file stores it under (immune to
        # physical-name drift across files, the spec's reason for id
        # mode). spark=None: the stream never scans through the session.
        from .delta import _ID_KEY, _mapping_info

        schema, _phys, phys_of, pv_key_of, part_cols = _mapping_info(
            None, meta, schema
        )
        if mode == "id":
            self._fid_of = {}
            for f in schema.fields:
                fid = (f.metadata or {}).get(_ID_KEY)
                if fid is None:
                    raise DeltaProtocolError(
                        f"column mapping id mode: field {f.name!r} has "
                        f"no {_ID_KEY} metadata"
                    )
                self._fid_of[f.name] = int(fid)
        self._part_cols = part_cols
        self._pv_key_of = pv_key_of
        self._file_col_of = phys_of
        self._data_cols = [
            phys_of[f.name]
            for f in schema.fields
            if f.name not in self._part_cols
        ]
        self._schema_order = [f.name for f in schema.fields]
        self._part_casts = {
            f.name: f.dataType.typeName()
            for f in schema.fields
            if f.name in self._part_cols
        }
        self._ignore_changes = str(
            options.get("ignorechanges", options.get("ignoreChanges", "false"))
        ).lower() in ("true", "1")
        #: readChangeFeed=true -> stream the CHANGE DATA FEED instead of
        #: the append tail: cdc files win over their commit's add/remove
        #: pair, commits without cdc derive insert/delete from dataChange
        #: add/remove; every row gains _change_type
        self._cdf = str(
            options.get("readchangefeed", options.get("readChangeFeed", "false"))
        ).lower() in ("true", "1")
        #: rowTracking=true -> every row gains _row_id (baseRowId +
        #: position, stored materialized column winning) and
        #: _row_commit_version (defaultRowCommitVersion) — the
        #: streaming twin of read_delta(row_tracking=True)
        self._rt = str(
            options.get("rowtracking", options.get("rowTracking", "false"))
        ).lower() in ("true", "1")
        self._mat_id = self._mat_ver = None
        if self._rt:
            if self._cdf:
                raise DeltaProtocolError(
                    "rowTracking and readChangeFeed cannot combine; the "
                    "change feed's delete rows have no fresh-id semantics"
                )
            conf = meta.get("configuration") or {}
            if str(conf.get("delta.enableRowTracking", "")).lower() != "true":
                raise DeltaProtocolError(
                    "rowTracking=true but the table does not declare "
                    "delta.enableRowTracking=true; no row lineage exists"
                )
            self._mat_id = conf.get(
                "delta.rowTracking.materializedRowIdColumnName"
            )
            self._mat_ver = conf.get(
                "delta.rowTracking.materializedRowCommitVersionColumnName"
            )
        self._schema_string = meta["schemaString"]
        start = options.get("startingversion", options.get("startingVersion"))
        if start is None or str(start).lower() == "latest":
            self._start = last
        else:
            # replay from `start` means batches begin at version start,
            # i.e. the offset floor is start-1
            self._start = int(start) - 1

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        _m, _l, _d, last = _replay_log(self._root)
        return {"version": last}

    def _pv_logical(self, raw: dict | None) -> dict:
        """partitionValues (physical keys under column mapping) -> a
        logical-keyed dict for the declared partition columns."""
        raw = raw or {}
        return {
            c: raw.get(self._pv_key_of[c], raw.get(c))
            for c in self._part_cols
        }

    def partitions(self, start: dict, end: dict):
        log_dir = os.path.join(self._root, DELTA_LOG_DIR)
        have = dict(_delta_commits(log_dir))
        out: list[_AddPartition] = []
        casts = [(c, self._part_casts[c]) for c in self._part_cols]
        for v in range(start["version"] + 1, end["version"] + 1):
            if v not in have:
                raise DeltaProtocolError(
                    f"commit version {v} is missing from {log_dir} "
                    "(vacuumed past the stream's offset); restart with a "
                    "newer startingVersion"
                )
            cdc: list[dict] = []
            adds: list[dict] = []
            removes: list[dict] = []
            with open(have[v]) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    a = json.loads(line)
                    if "protocol" in a:
                        _check_protocol(a["protocol"])
                    elif "metaData" in a:
                        m = _check_meta(a["metaData"])
                        if self._cdf and m.get("schemaString") != self._schema_string:
                            raise DeltaProtocolError(
                                f"schema changed at version {v}; restart the "
                                "change-feed stream to pick up the new schema"
                            )
                    elif "cdc" in a and self._cdf:
                        cdc.append(a["cdc"])
                    elif "remove" in a and a["remove"].get("dataChange", True):
                        if self._cdf:
                            removes.append(a["remove"])
                        elif not self._ignore_changes:
                            raise DeltaProtocolError(
                                f"commit {v} contains a data-changing remove "
                                "(UPDATE/DELETE/MERGE); a streaming tail "
                                "cannot represent it — set "
                                "ignoreChanges=true to process the adds "
                                "anyway (may re-emit rewritten rows), or "
                                "readChangeFeed=true for the row-level feed"
                            )
                    elif "add" in a:
                        ad = a["add"]
                        if not ad.get("dataChange", True):
                            continue  # compaction rewrite: no new rows
                        adds.append(ad)
            if self._cdf and cdc:
                for cd in cdc:
                    out.append(
                        _AddPartition(
                            v,
                            os.path.join(self._root, unquote(cd["path"])),
                            self._pv_logical(cd.get("partitionValues")),
                            None,
                            self._data_cols,
                            casts,
                            own_ct=True,
                        )
                    )
                continue  # cdc files supersede the commit's add/remove
            if self._cdf:
                for ad, ct in [(a, "insert") for a in adds] + [
                    (r, "delete") for r in removes
                ]:
                    if ad.get("deletionVector"):
                        raise DeltaProtocolError(
                            f"version {v} changes a file through a deletion "
                            "vector without cdc files; the row-level change "
                            "set is not derivable from whole files"
                        )
                    out.append(
                        _AddPartition(
                            v,
                            os.path.join(self._root, unquote(ad["path"])),
                            self._pv_logical(ad.get("partitionValues")),
                            None,
                            self._data_cols,
                            casts,
                            ctype=ct,
                        )
                    )
                continue
            for ad in adds:
                rt = None
                if self._rt:
                    bri = ad.get("baseRowId")
                    drv = ad.get("defaultRowCommitVersion")
                    if bri is None or drv is None:
                        raise DeltaProtocolError(
                            f"rowTracking=true but the add at version {v} "
                            f"({ad.get('path')}) carries no baseRowId / "
                            "defaultRowCommitVersion"
                        )
                    rt = (int(bri), int(drv))
                out.append(
                    _AddPartition(
                        v,
                        os.path.join(self._root, unquote(ad["path"])),
                        self._pv_logical(ad.get("partitionValues")),
                        ad.get("deletionVector"),
                        self._data_cols,
                        casts,
                        rt=rt,
                    )
                )
        return out or [_AddPartition(-1, None, {}, None, self._data_cols, casts)]

    def read(self, partition: _AddPartition):
        if partition.path is None:
            return
        import pyarrow.parquet as pq

        dead: set[int] = set()
        if partition.dv:
            from .dv import read_dv_descriptor

            dead = set(read_dv_descriptor(partition.dv, self._root))
        pf = pq.ParquetFile(partition.path)
        #: logical column -> the column name THIS FILE stores it under;
        #: a column the file predates (added by a later metaData) is
        #: ABSENT and NULL-fills — Delta's read semantics for both
        #: name resolution and field-id resolution
        names_in_file = {f.name for f in pf.schema_arrow}
        if self._mode == "id":
            id2name: dict[int, str] = {}
            for f in pf.schema_arrow:
                raw = (f.metadata or {}).get(b"PARQUET:field_id")
                if raw is not None:
                    id2name[int(raw)] = f.name
            col_of = {}
            for lc in self._schema_order:
                if lc in self._part_cols:
                    continue
                fid = self._fid_of[lc]
                if fid in id2name:
                    col_of[lc] = id2name[fid]
        else:
            col_of = {
                lc: self._file_col_of[lc]
                for lc in self._schema_order
                if lc not in self._part_cols
                and self._file_col_of[lc] in names_in_file
            }
        cols = list(col_of.values())
        if partition.own_ct:
            cols.append("_change_type")
        rt = getattr(partition, "rt", None)
        rid_s = ver_s = None
        if rt is not None:
            # materialized lineage columns are HIDDEN physical columns
            # present only in files whose rows were carried across a
            # rewrite; the stored value WINS over the fresh computation
            names = {f.name for f in pf.schema_arrow}
            mats = [
                m for m in (self._mat_id, self._mat_ver)
                if m and m in names
            ]
            cols += mats
        from .io import localize_naive_timestamps

        table = localize_naive_timestamps(pf.read(columns=cols))
        if rt is not None:
            if self._mat_id and self._mat_id in table.column_names:
                rid_s = table.column(self._mat_id).to_pylist()
            if self._mat_ver and self._mat_ver in table.column_names:
                ver_s = table.column(self._mat_ver).to_pylist()
        pv = {
            c: _cast_pv(partition.pv.get(c), t) for c, t in partition.part_casts
        }
        data = {lc: table.column(fc).to_pylist() for lc, fc in col_of.items()}
        for lc in self._schema_order:  # columns this file predates
            if lc not in self._part_cols and lc not in data:
                data[lc] = None
        cts = (
            table.column("_change_type").to_pylist()
            if partition.own_ct
            else None
        )
        cdf = self._cdf
        for i in range(table.num_rows):
            if i in dead:
                continue
            base = [
                pv[c]
                if c in pv
                else (None if data[c] is None else data[c][i])
                for c in self._schema_order
            ]
            if rt is not None:
                rid = (
                    rid_s[i]
                    if rid_s is not None and rid_s[i] is not None
                    else rt[0] + i
                )
                rcv = (
                    ver_s[i]
                    if ver_s is not None and ver_s[i] is not None
                    else rt[1]
                )
                yield (*base, rid, rcv, partition.version)
            elif cdf:
                ct = cts[i] if partition.own_ct else partition.ctype
                yield (*base, ct, partition.version)
            else:
                yield (*base, partition.version)

    def commit(self, end: dict) -> None:
        pass  # offsets are durable delta versions; nothing to release


class _DeltaBatchTailReader(DataSourceReader):
    """Batch view of the append tail since ``startingVersion``
    (default 0 = the whole history) — the catch-up companion."""

    def __init__(self, options: dict):
        self._stream = DeltaStreamReader(
            {
                **options,
                "startingversion": options.get(
                    "startingversion", options.get("startingVersion", 0)
                ),
            }
        )

    def partitions(self):
        try:
            return self._stream.partitions(
                self._stream.initialOffset(), self._stream.latestOffset()
            )
        except NotImplementedError as e:
            # the *ProtocolError gates subclass NotImplementedError, and
            # PySpark treats NotImplementedError from a batch reader's
            # partitions() as "no partitioning support" — silently
            # degrading a protocol gate into read(None). Surface it.
            raise RuntimeError(str(e)) from e

    def read(self, partition):
        yield from self._stream.read(partition)


class DeltaStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "delta_stream"

    def schema(self):
        meta, _l, _d, _last = _replay_log(self.options.get("path"))
        schema = StructType(
            list(StructType.fromJson(json.loads(meta["schemaString"])).fields)
        )
        cdf = str(
            self.options.get(
                "readchangefeed", self.options.get("readChangeFeed", "false")
            )
        ).lower() in ("true", "1")
        if cdf:
            schema = schema.add("_change_type", "string")
        if str(
            self.options.get(
                "rowtracking", self.options.get("rowTracking", "false")
            )
        ).lower() in ("true", "1"):
            schema = schema.add("_row_id", "long").add(
                "_row_commit_version", "long"
            )
        return schema.add("_commit_version", "long")

    def streamReader(self, schema: StructType):
        return DeltaStreamReader(self.options)

    def reader(self, schema: StructType):
        return _DeltaBatchTailReader(self.options)


def register_delta_stream(spark) -> None:
    """Idempotently register the format on the session."""
    spark.dataSource.register(DeltaStreamDataSource)
