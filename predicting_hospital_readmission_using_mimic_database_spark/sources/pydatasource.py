"""SnapshotTable as a first-class Spark DATA SOURCE (PySpark 4 Python
Data Source API): ``spark.read.format("snapshot")`` for versioned batch
snapshots and ``spark.readStream.format("snapshot_changes")`` for an
incremental change-data-feed stream — the Delta-CDF-style "process only
what changed" consumption surface, wired through Spark's own source
machinery instead of helper functions.

Why this matters at 100 TB: the streaming source's OFFSET is a commit
version (driver-side KBs), each micro-batch reads only the files the
covered commits touched (delta-scoped, never table-scoped — a bucketed
MERGE contributes its touched buckets only), and partitions split per
(commit, bucket) so a big commit fans out across executors. Exactly-once
falls out of Structured Streaming's offset log + the deterministic
replay of immutable commits.

Planner/executor split (the API's contract):

* ``schema()`` / offsets / ``partitions()`` run on the DRIVER and touch
  only the JSON commit log (``SnapshotTable(None, root)`` — state replay
  is pure file I/O, no SparkSession needed).
* ``read(partition)`` runs on EXECUTORS; each partition carries absolute
  file paths and reads them with pyarrow directly — no Spark-in-Spark.

The native fast path (``SnapshotTable.read`` — JVM parquet scan with
stats pruning) remains the recommended batch API; the ``snapshot``
format exists so SQL-first users and streaming pipelines get the table
through standard Spark surfaces. Reference parity: the reference's
consumers re-read its whole mutable store to observe writes (nb:2101,
nb:2140); a change-feed source hands them exactly the delta.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

CHANGE_COLS = ("_change_type", "_commit_version")


def _open_table(options: dict):
    from .table import SnapshotTable

    path = options.get("path")
    if not path:
        raise ValueError("option 'path' is required (the SnapshotTable root)")
    return SnapshotTable(None, path)


class _FilesPartition(InputPartition):
    def __init__(self, paths: list[str], columns: list[str]):
        self.paths = paths
        self.columns = columns


def _iter_parquet_batches(paths: list[str], columns: list[str]):
    """Arrow record batches, column-pruned and ordered to the declared
    schema — executor-side, pyarrow only."""
    import pyarrow.parquet as pq

    for path in paths:
        pf = pq.ParquetFile(path)
        for batch in pf.iter_batches(columns=columns):
            yield batch.select(columns)


class SnapshotBatchReader(DataSourceReader):
    def __init__(self, options: dict, schema: StructType):
        self._options = options
        t = _open_table(options)
        version = options.get("version")
        self._columns = [f.name for f in t.schema.fields]
        live = (
            t._state_at(int(version)) if version is not None else dict(t._live)
        )
        missing = [
            p for p in live if not os.path.exists(os.path.join(t.root, p))
        ]
        if missing:
            from .table import VacuumedVersionError

            raise VacuumedVersionError(
                f"{len(missing)} data files of the requested snapshot were "
                f"vacuumed (e.g. {missing[0]})"
            )
        self._root = t.root
        self._live = live  # rel path -> _AddAction (carries footer stats)
        self._pruned: set[str] | None = None

    def pushFilters(self, filters):
        """DATA SKIPPING through Spark's filter pushdown: the commit
        log's footer-harvested [min, max] stats decide which files can
        possibly match, BEFORE any partition is planned — the python-
        source twin of SnapshotTable.read(prune=...). Stats pruning is
        conservative (a surviving file may still hold non-matching
        rows), so every filter is returned as UNHANDLED and Spark
        re-applies it after the scan; files without stats always
        survive."""
        keep: set[str] = set()
        for rel, act in self._live.items():
            stats = getattr(act, "stats", {}) or {}
            if all(
                _stats_admit(f, stats) for f in filters
            ):
                keep.add(rel)
        self._pruned = keep
        return filters  # conservative: Spark re-evaluates everything

    def partitions(self):
        live = self._live if self._pruned is None else {
            p: a for p, a in self._live.items() if p in self._pruned
        }
        files = sorted(os.path.join(self._root, p) for p in live)
        # one partition per file: parallelism == file count, each task
        # streams its file's row groups (never materializes the file)
        return [_FilesPartition([p], self._columns) for p in files] or [
            _FilesPartition([], self._columns)
        ]

    def read(self, partition: _FilesPartition):
        yield from _iter_parquet_batches(partition.paths, partition.columns)


def _stats_admit(f, stats: dict) -> bool:
    """True unless the file's [min, max] range PROVES no row matches
    filter ``f``. Unknown filter shapes, multi-part column paths, and
    columns without stats admit (conservative, never wrong)."""
    import datetime

    from pyspark.sql import datasource as ds

    attr = getattr(f, "attribute", None)
    if not attr or len(attr) != 1:
        return True
    rng = stats.get(attr[0])
    if not rng or rng[0] is None or rng[1] is None:
        return True
    lo, hi = rng

    def norm(v):
        if isinstance(v, (datetime.date, datetime.datetime)):
            return v.isoformat()  # stats store ISO strings, same ordering
        return v

    def cmp_ok(a, b):
        return isinstance(a, (int, float)) == isinstance(b, (int, float))

    try:
        if isinstance(f, ds.EqualTo) or isinstance(f, ds.EqualNullSafe):
            v = norm(f.value)
            return not cmp_ok(v, lo) or (lo <= v <= hi)
        if isinstance(f, ds.GreaterThan):
            v = norm(f.value)
            return not cmp_ok(v, hi) or hi > v
        if isinstance(f, ds.GreaterThanOrEqual):
            v = norm(f.value)
            return not cmp_ok(v, hi) or hi >= v
        if isinstance(f, ds.LessThan):
            v = norm(f.value)
            return not cmp_ok(v, lo) or lo < v
        if isinstance(f, ds.LessThanOrEqual):
            v = norm(f.value)
            return not cmp_ok(v, lo) or lo <= v
        if isinstance(f, ds.In):
            vals = [norm(v) for v in f.values]
            return any(not cmp_ok(v, lo) or (lo <= v <= hi) for v in vals)
    except TypeError:
        return True  # incomparable types: admit
    return True  # IsNull/IsNotNull/string matchers: no range information


def _arrow_schema(schema: StructType):
    """pyarrow schema for the SUPPORTED write types — explicit so an
    all-NULL partition still writes the declared column type."""
    import pyarrow as pa
    from pyspark.sql import types as T

    def conv(dt):
        m = {
            T.LongType: pa.int64(),
            T.IntegerType: pa.int32(),
            T.ShortType: pa.int16(),
            T.ByteType: pa.int8(),
            T.DoubleType: pa.float64(),
            T.FloatType: pa.float32(),
            T.StringType: pa.string(),
            T.BooleanType: pa.bool_(),
            T.DateType: pa.date32(),
            T.TimestampType: pa.timestamp("us", tz="UTC"),
            T.BinaryType: pa.binary(),
        }
        for k, v in m.items():
            if isinstance(dt, k):
                return v
        if isinstance(dt, T.ArrayType):
            return pa.list_(conv(dt.elementType))
        if isinstance(dt, T.DecimalType):
            return pa.decimal128(dt.precision, dt.scale)
        raise ValueError(f"snapshot writer: unsupported column type {dt}")

    return pa.schema([(f.name, conv(f.dataType)) for f in schema.fields])


class _WroteFiles(WriterCommitMessage):
    def __init__(self, entries: list[tuple[str, int]]):
        self.entries = entries  # [(rel_path, rows)]


class SnapshotWriterBase:
    """Executor side shared by the batch and streaming writers: each
    partition writes one parquet file (pyarrow, explicit arrow schema)
    under a per-query staging dir; the driver-side commit turns the
    staged files into ONE atomic SnapshotTable commit. Bucketed tables
    are refused — bucket placement uses Spark's JVM xxhash64, which a
    Python worker cannot reproduce, and a mis-bucketed file would break
    MERGE pruning; use SnapshotTable.append / the foreachBatch sinks for
    bucketed targets."""

    def __init__(self, options: dict, schema: StructType):
        import uuid

        t = _open_table(options)
        if t.bucket_key:
            raise ValueError(
                "format('snapshot') writes only to UNBUCKETED tables "
                "(bucket hashing is JVM-side); use SnapshotTable.append "
                "or streaming.ingest.snapshot_append_sink instead"
            )
        declared = [f.name for f in t.schema.fields]
        if [f.name for f in schema.fields] != declared:
            raise ValueError(
                f"schema mismatch: writing {[f.name for f in schema.fields]} "
                f"to table columns {declared}"
            )
        self._root = t.root
        self._schema = t.schema
        self._stage = f"data-pyds-{uuid.uuid4().hex[:12]}"
        self._app = options.get("appid", options.get("appId", "pyds-stream"))

    # -- executors ------------------------------------------------------
    def write(self, iterator) -> _WroteFiles:
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = [r.asDict(recursive=True) for r in iterator]
        if not rows:
            return _WroteFiles([])
        tbl = pa.Table.from_pylist(rows, schema=_arrow_schema(self._schema))
        rel = os.path.join(self._stage, f"part-{uuid.uuid4().hex}.parquet")
        absp = os.path.join(self._root, rel)
        os.makedirs(os.path.dirname(absp), exist_ok=True)
        pq.write_table(tbl, absp)
        return _WroteFiles([(rel, len(rows))])

    # -- driver ---------------------------------------------------------
    def _commit_staged(self, messages, txn) -> None:
        from .table import SnapshotTable, _AddAction, _harvest_stats

        t = SnapshotTable(None, self._root)
        stats_cols = t._meta.get("stats_cols", [])
        adds = []
        for m in messages:
            for rel, _n in (m.entries if m else []):
                rows, stats = _harvest_stats(
                    os.path.join(self._root, rel), stats_cols
                )
                adds.append(_AddAction(rel, rows, None, stats))
        t._commit("append", adds, [], txn=txn)

    def abort(self, messages, *_args) -> None:
        for m in messages:
            for rel, _n in (m.entries if m else []):
                try:
                    os.unlink(os.path.join(self._root, rel))
                except OSError:
                    pass


class SnapshotBatchWriter(SnapshotWriterBase, DataSourceWriter):
    def commit(self, messages) -> None:
        self._commit_staged(messages, txn=None)


class SnapshotStreamWriter(SnapshotWriterBase, DataSourceStreamWriter):
    """Exactly-once streaming sink: the micro-batch id is the txn
    version inside the table's commit log, so a replayed batch (after a
    crash between write and checkpoint) stages new files but commits
    NOTHING — the same upgrade snapshot_append_sink provides, here
    through the standard ``writeStream.format("snapshot")`` surface."""

    def commit(self, messages, batchId: int) -> None:
        self._commit_staged(messages, txn=(self._app, batchId))


class SnapshotDataSource(DataSource):
    """``spark.read.format("snapshot").option("path", root)`` with
    optional ``option("version", v)`` time travel; writes (batch append
    and exactly-once streaming) target UNBUCKETED tables."""

    @classmethod
    def name(cls) -> str:
        return "snapshot"

    def schema(self):
        return _open_table(self.options).schema

    def reader(self, schema: StructType):
        return SnapshotBatchReader(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool):
        if overwrite:
            raise ValueError(
                "format('snapshot') supports mode('append') only; use "
                "SnapshotTable.overwrite for atomic replacement"
            )
        return SnapshotBatchWriter(self.options, schema)

    def streamWriter(self, schema: StructType, overwrite: bool):
        return SnapshotStreamWriter(self.options, schema)


class _ChangesPartition(InputPartition):
    def __init__(
        self,
        version: int,
        op: str,
        added: list[str],
        removed: list[str],
        columns: list[str],
    ):
        self.version = version
        self.op = op
        self.added = added
        self.removed = removed
        self.columns = columns


class SnapshotChangesStreamReader(DataSourceStreamReader):
    """Streaming CDF: offset = committed table version; batch (start,
    end] = the row-level changes of those commits, exceptAll-equivalent
    (rewritten-but-unchanged rows cancel), split per (commit, bucket)."""

    def __init__(self, options: dict):
        self._options = options
        t = _open_table(options)
        self._root = t.root
        self._columns = [f.name for f in t.schema.fields]
        start = options.get("startingversion", options.get("startingVersion"))
        # default: start at the CURRENT version -> only future commits
        self._start = int(start) if start is not None else t.version

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        return {"version": _open_table(self._options).version}

    def partitions(self, start: dict, end: dict):
        out: list[_ChangesPartition] = []
        log = os.path.join(self._root, "_log")
        for v in range(start["version"] + 1, end["version"] + 1):
            with open(os.path.join(log, f"{v:020d}.json")) as f:
                record = json.load(f)
            op = record["op"]
            if op in ("compact", "zorder", "create"):
                continue  # row-set-preserving (or empty): no changes
            adds = record.get("add", [])
            removed_paths = record.get("remove", [])
            if op == "append":
                for a in adds:
                    out.append(
                        _ChangesPartition(
                            v, op, [os.path.join(self._root, a["path"])], [],
                            self._columns,
                        )
                    )
                continue
            # removing op: diff removed vs added PER BUCKET so one big
            # commit fans out; bucketless files fall into one group
            by_bucket: dict[object, tuple[list, list]] = {}
            for a in adds:
                by_bucket.setdefault(a.get("bucket"), ([], []))[0].append(
                    os.path.join(self._root, a["path"])
                )
            for p in removed_paths:
                b = _bucket_of(p)
                by_bucket.setdefault(b, ([], []))[1].append(
                    os.path.join(self._root, p)
                )
            for _b, (ad, rm) in sorted(
                by_bucket.items(), key=lambda kv: (kv[0] is None, kv[0])
            ):
                out.append(_ChangesPartition(v, op, ad, rm, self._columns))
        return out or [_ChangesPartition(-1, "noop", [], [], self._columns)]

    def read(self, partition: _ChangesPartition):
        if partition.op == "noop":
            return
        cols = partition.columns

        from .io import localize_naive_timestamps

        def _rows(paths):
            for p in paths:
                for rec in localize_naive_timestamps(
                    _batches_to_table(p, cols)
                ).to_pylist():
                    yield tuple(_freeze(rec[c]) for c in cols)

        if partition.op == "append":
            for row in _rows(partition.added):
                yield (*row, "insert", partition.version)
            return
        # multiset diff == exceptAll both ways: net count per row value,
        # pure-python Counter so NULLs compare as NULLs (no NaN coercion)
        from collections import Counter

        net: Counter = Counter()
        for row in _rows(partition.added):
            net[row] += 1
        for row in _rows(partition.removed):
            net[row] -= 1
        for row, n in sorted(net.items(), key=lambda kv: repr(kv[0])):
            if n == 0:
                continue
            kind = "insert" if n > 0 else "delete"
            for _ in range(abs(n)):
                yield (*row, kind, partition.version)

    def commit(self, end: dict) -> None:
        pass  # offsets are durable table versions; nothing to release


def _batches_to_table(path: str, columns: list[str]):
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).read(columns=columns).select(columns)


def _freeze(v):
    """Hashable form of a row value (lists -> tuples, recursively)."""
    if isinstance(v, list):
        return tuple(_freeze(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _freeze(x)) for k, x in v.items()))
    return v


def _bucket_of(rel_path: str) -> object:
    from .table import _BUCKET_COL

    marker = f"{_BUCKET_COL}="
    if marker in rel_path:
        try:
            return int(rel_path.split(marker, 1)[1].split(os.sep)[0])
        except ValueError:
            return None
    return None


class SnapshotChangesDataSource(DataSource):
    """``spark.readStream.format("snapshot_changes").option("path", root)``
    (+ optional ``startingVersion``); also readable as a BATCH frame of
    all changes since ``startingVersion``."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_changes"

    def schema(self):
        t = _open_table(self.options)
        return (
            StructType(list(t.schema.fields))
            .add("_change_type", "string")
            .add("_commit_version", "long")
        )

    def streamReader(self, schema: StructType):
        return SnapshotChangesStreamReader(self.options)

    def reader(self, schema: StructType):
        return _ChangesBatchReader(self.options)


class _ChangesBatchReader(DataSourceReader):
    """Batch view of the change feed: everything after startingVersion
    (default 0 = the whole history) in one frame."""

    def __init__(self, options: dict):
        self._stream = SnapshotChangesStreamReader(
            {**options, "startingversion": options.get(
                "startingversion", options.get("startingVersion", 0)
            )}
        )

    def partitions(self):
        return self._stream.partitions(
            self._stream.initialOffset(), self._stream.latestOffset()
        )

    def read(self, partition):
        yield from self._stream.read(partition)


def register_datasources(spark) -> None:
    """Idempotently register both formats on the session. Also enables
    ``spark.sql.python.filterPushdown.enabled``: a reader that
    implements ``pushFilters`` refuses to initialize while the flag is
    off, and the flag is what routes catalyst filters into the
    stats-based file skipping."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SnapshotDataSource)
    spark.dataSource.register(SnapshotChangesDataSource)
