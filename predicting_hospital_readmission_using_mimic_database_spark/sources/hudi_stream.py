"""A FOREIGN Hudi table as a Structured Streaming SOURCE —
``spark.readStream.format("hudi_stream").option("path", root)``.

Hudi's incremental-query semantics (sources/hudi.py
``read_hudi_incremental``) lifted onto the PySpark 4 Python Data
Source API, completing the lakehouse trio next to ``delta_stream``
and the engine's own ``snapshot_changes``:

* OFFSETS are completed timeline INSTANTS (zero-padded strings —
  lexicographic order IS commit order). COPY_ON_WRITE micro-batches
  (start, end] read only the file groups whose latest slice landed in
  the window, one input partition per touched base file, and filter
  rows by their own ``_hoodie_commit_time`` — carried-forward rows of
  a COW rewrite never surface.
* MERGE_ON_READ tables stream too: offsets additionally count
  completed ``deltacommit`` instants, and a micro-batch opens one
  input partition PER TOUCHED FILE GROUP (a group whose base file and
  every committed log block predate the window start is never
  opened). The partition reader folds the group's base rows +
  committed log upserts + DELETE tombstones per record key — the
  same total order as the batch merge (:func:`hudi._read_mor`):
  commit-time positional by default, PRECOMBINE-value-led when the
  table declares event-time ordering — and emits each key's NET row
  iff its winning version landed in the window and is not a
  tombstone (incremental reads carry no delete markers, same as
  Hudi's). The fold is GROUP-LOCAL (per Hudi's model a record key
  lives in exactly one file group per partition), so no shuffle and
  no cross-partition state.
* ``startingInstant`` option: an instant to replay from (exclusive),
  or ``"latest"`` (the DEFAULT — only commits after stream start;
  pass ``0`` to ingest the whole history).
* NET semantics per window: a row updated twice between polls surfaces
  once, at its final value — the same contract as Hudi's incremental
  relation over compacted timelines.
* Pending/inflight instants are invisible (timeline isolation);
  replacecommits resolve through the shared ``_latest_slices`` replay
  (retired groups vanish); rollback COMMAND blocks and unsupported
  block types raise via the same gates as the batch reader.

Every emitted row carries ``_commit_instant`` (string), the row's own
commit time.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StringType, StructType

from .hudi import (
    META_COLS,
    HudiProtocolError,
    _completed_commits,
    _latest_slices,
    _merge_ordering,
    _properties,
)

__all__ = ["HudiStreamDataSource", "register_hudi_stream"]


def _table_type(root: str) -> str:
    ttype = _properties(root).get("hoodie.table.type", "COPY_ON_WRITE")
    if ttype not in ("COPY_ON_WRITE", "MERGE_ON_READ"):
        raise HudiProtocolError(
            f"hoodie.table.type={ttype}: unknown table type"
        )
    return ttype


def _data_schema(root: str, mor: bool) -> StructType:
    """Declared row schema: the newest slice's footer minus meta cols."""
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_schema

    if mor:
        groups, _logs = _latest_slices(root, None, None, collect_logs=True)
    else:
        groups = _latest_slices(root, None, None)
    if not groups:
        raise ValueError(
            f"no completed base files in {root}"
            + (" (log-only MOR tables are not streamable: the stream "
               "schema comes from a base footer)" if mor else "")
        )
    newest = max(groups.values())[1]
    full = from_arrow_schema(
        pq.ParquetFile(newest).schema_arrow, prefer_timestamp_ntz=True
    )
    need = ["_hoodie_commit_time"] + (["_hoodie_record_key"] if mor else [])
    for col in need:
        if col not in full.names:
            raise HudiProtocolError(
                f"table files lack the {col} meta column; incremental "
                "streaming needs per-row commit times and record keys"
            )
    return StructType([f for f in full.fields if f.name not in META_COLS])


class _SlicePartition(InputPartition):
    """COW: one touched base file; rows filter by own commit time."""

    def __init__(self, path, begin, end, cols):
        self.path = path
        self.begin = begin
        self.end = end
        self.cols = cols


class _MorGroupPartition(InputPartition):
    """MOR: one touched file group — base file (may be None) plus its
    committed log blocks; the reader folds them per record key."""

    def __init__(self, base, logs, part, begin, end, cols, precombine):
        self.base = base          # base parquet path | None
        self.logs = logs          # [(log path, json [kept block idx])]
        self.part = part          # partition dir (delete-record default)
        self.begin = begin
        self.end = end
        self.cols = cols
        self.precombine = precombine


#: sorts None ordering values below every real value (batch window's
#: desc_nulls_last), then positionally. Precombine values are compared
#: as the writer serialized them — a table whose writers mix orderingVal
#: types (e.g. long vs string for the same precombine field) is
#: corrupt metadata and fails LOUDLY (TypeError in the task / arrow
#: cast in the batch merge), never silently mis-ordered.
def _sort_key(ord_val, inst, fidx, bi, ri):
    return (ord_val is not None, ord_val, inst, fidx, bi, ri)


class HudiStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self._root = options.get("path")
        if not self._root:
            raise ValueError("hudi_stream requires .option('path', <table root>)")
        self._mor = _table_type(self._root) == "MERGE_ON_READ"
        # merge semantics only matter where merging happens (MOR); a COW
        # table's payload class never affects its snapshot read
        self._precombine = (
            _merge_ordering(_properties(self._root)) if self._mor else None
        )
        self._cols = [
            f.name for f in _data_schema(self._root, self._mor).fields
        ]
        p = options.get("partitions")
        self._partitions = p.split(",") if p else None
        start = options.get("startinginstant", options.get("startingInstant"))
        if start is None or str(start).lower() == "latest":
            done = _completed_commits(self._root, allow_delta=self._mor)
            self._start = max(done) if done else "0"
        else:
            self._start = str(start)

    def initialOffset(self) -> dict:
        return {"instant": self._start}

    def latestOffset(self) -> dict:
        done = _completed_commits(self._root, allow_delta=self._mor)
        return {"instant": max(done) if done else self._start}

    def _cow_partitions(self, begin, upto):
        out: list[_SlicePartition] = []
        groups = _latest_slices(self._root, upto, self._partitions)
        for instant, path in sorted(groups.values()):
            if instant > begin:
                out.append(_SlicePartition(path, begin, upto, self._cols))
        return out

    def _mor_partitions(self, begin, upto):
        """One partition per file group TOUCHED in (begin, upto]:
        driver-side header scan gates block types and filters
        uncommitted / time-traveled-past instants — identical gating to
        the batch `_read_mor`, record payloads never reach the driver."""
        from . import hudi_log as HL

        groups, logs = _latest_slices(
            self._root, upto, self._partitions, collect_logs=True
        )
        done = _completed_commits(self._root, allow_delta=True)
        done = {c for c in done if c <= upto}
        out: list[_MorGroupPartition] = []
        for key in sorted(set(groups) | set(logs)):
            base = groups.get(key)
            lfs = sorted(logs.get(key, []))
            if base is not None:
                lfs = [l for l in lfs if l[0] == base[0]]
            max_inst = base[0] if base is not None else ""
            kept: list[tuple[str, list[int]]] = []
            for _bi, _ver, lp in lfs:
                idxs = []
                for bi, h in enumerate(HL.scan_block_headers(lp)):
                    inst = h["instant"]
                    if inst is None:
                        raise HL.HudiLogCorruptError(
                            f"{lp}: log block without INSTANT_TIME header"
                        )
                    if inst not in done:
                        continue
                    if h["type"] == HL.COMMAND_BLOCK:
                        # same gate as the batch _read_mor: a COMMAND
                        # type other than ROLLBACK has semantics this
                        # reader must not guess at
                        if h["header"].get(HL.H_COMMAND_BLOCK_TYPE, "0") != "0":
                            raise HudiProtocolError(
                                f"log file {os.path.basename(lp)}: unknown "
                                "COMMAND block type "
                                f"{h['header'].get(HL.H_COMMAND_BLOCK_TYPE)!r}"
                            )
                        tgt = h["header"].get(HL.H_TARGET_INSTANT_TIME)
                        if tgt is not None and tgt in done:
                            raise HudiProtocolError(
                                f"log file {os.path.basename(lp)}: rollback "
                                f"COMMAND block targets COMPLETED instant "
                                f"{tgt}; inconsistent timeline"
                            )
                        continue
                    if h["type"] not in (HL.AVRO_DATA_BLOCK, HL.DELETE_BLOCK):
                        raise HudiProtocolError(
                            f"log file {os.path.basename(lp)}: unsupported "
                            f"block type {h['type']}"
                        )
                    idxs.append(bi)
                    if inst > max_inst:
                        max_inst = inst
                if idxs:
                    kept.append((lp, json.dumps(idxs)))
            if max_inst <= begin:
                continue  # untouched group: never opened
            out.append(
                _MorGroupPartition(
                    base[1] if base is not None else None,
                    kept,
                    key[0],
                    begin,
                    upto,
                    self._cols,
                    self._precombine,
                )
            )
        return out

    def partitions(self, start: dict, end: dict):
        begin, upto = start["instant"], end["instant"]
        out = []
        if upto > begin:
            out = (
                self._mor_partitions(begin, upto)
                if self._mor
                else self._cow_partitions(begin, upto)
            )
        return out or [_SlicePartition(None, begin, upto, self._cols)]

    def read(self, partition):
        if isinstance(partition, _MorGroupPartition):
            yield from self._read_mor_group(partition)
            return
        if partition.path is None:
            return
        import pyarrow.parquet as pq

        table = pq.ParquetFile(partition.path).read(
            columns=[*partition.cols, "_hoodie_commit_time"]
        )
        cts = table.column("_hoodie_commit_time").to_pylist()
        data = {c: table.column(c).to_pylist() for c in partition.cols}
        for i, ct in enumerate(cts):
            if partition.begin < ct <= partition.end:
                yield (*[data[c][i] for c in partition.cols], ct)

    def _read_mor_group(self, p: _MorGroupPartition):
        """Fold one file group's base + committed log events per record
        key (the batch merge's total order, sequentially) and emit each
        key's net row iff it landed in the window and survived."""
        from . import hudi_log as HL

        cols = p.cols
        prec = p.precombine
        #: record key -> (sort key, commit time, row values | None=del)
        best: dict[tuple, tuple] = {}

        def offer(key, sk, ct, row):
            cur = best.get(key)
            if cur is None or sk > cur[0]:
                best[key] = (sk, ct, row)

        if p.base is not None:
            import pyarrow.parquet as pq

            need = list(
                dict.fromkeys(
                    [*cols, "_hoodie_commit_time", "_hoodie_record_key"]
                )
            )
            t = pq.ParquetFile(p.base).read(columns=need)
            data = {c: t.column(c).to_pylist() for c in need}
            for i in range(t.num_rows):
                ct = data["_hoodie_commit_time"][i]
                row = tuple(data[c][i] for c in cols)
                ov = data[prec][i] if prec is not None else None
                offer(
                    data["_hoodie_record_key"][i],
                    _sort_key(ov, ct, -1, -1, i),
                    ct,
                    row,
                )
        for fidx, (lp, bjson) in enumerate(p.logs):
            keep = set(json.loads(bjson))
            for bi, blk in enumerate(HL.read_log_blocks(lp)):
                if bi not in keep:
                    continue
                inst = blk["instant"]
                if blk["type"] == HL.DELETE_BLOCK:
                    for ri, d in enumerate(
                        HL.decode_delete_records(blk["delete_content"])
                    ):
                        pp = d.get("partitionPath")
                        if pp is not None and os.path.normpath(pp) != p.part:
                            continue  # scoped to another partition dir
                        ov = d.get("orderingVal")
                        if prec is not None and ov is None:
                            raise HL.HudiLogUnsupportedError(
                                f"{os.path.basename(lp)}: delete record "
                                "without an orderingVal under event-time "
                                "merge ordering"
                            )
                        offer(
                            d.get("recordKey"),
                            _sort_key(
                                ov if prec is not None else None,
                                inst, fidx, bi, ri,
                            ),
                            inst,
                            None,
                        )
                    continue
                for ri, rec in enumerate(blk["records"]):
                    ov = rec.get(prec) if prec is not None else None
                    offer(
                        rec.get("_hoodie_record_key"),
                        _sort_key(ov, inst, fidx, bi, ri),
                        inst,
                        tuple(rec.get(c) for c in cols),
                    )
        for _sk, ct, row in best.values():
            if row is not None and p.begin < ct <= p.end:
                yield (*row, ct)

    def commit(self, end: dict) -> None:
        pass  # offsets are durable timeline instants


class _HudiBatchTailReader(DataSourceReader):
    """Batch view of the incremental tail since ``startingInstant``
    (default 0 = the whole history)."""

    def __init__(self, options: dict):
        self._stream = HudiStreamReader(
            {
                **options,
                "startinginstant": options.get(
                    "startinginstant", options.get("startingInstant", "0")
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


class HudiStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "hudi_stream"

    def schema(self):
        root = self.options.get("path")
        mor = _table_type(root) == "MERGE_ON_READ"
        return StructType(
            list(_data_schema(root, mor).fields)
        ).add("_commit_instant", StringType())

    def streamReader(self, schema: StructType):
        return HudiStreamReader(self.options)

    def reader(self, schema: StructType):
        return _HudiBatchTailReader(self.options)


def register_hudi_stream(spark) -> None:
    """Idempotently register the format on the session."""
    spark.dataSource.register(HudiStreamDataSource)
