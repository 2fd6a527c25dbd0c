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

CDC MODE — ``.option("incrementalFormat", "cdc")`` (Hudi's
``hoodie.datasource.query.incremental.format=cdc``, RFC-51): instead
of net rows, micro-batches emit PER-COMMIT CHANGE IMAGES in the Delta-
CDF row shape — payload columns + ``_change_type`` (``insert`` /
``update_preimage`` / ``update_postimage`` / ``delete``) +
``_commit_instant``. Images are INFERRED from file slices (the
cdc-on-the-fly path; supplemental ``-cdc`` log files are not parsed —
same gate as the batch :func:`hudi.read_hudi_changes`): the driver
builds each file group's slice SPEC (base path + gated log-block list)
at consecutive commit cutoffs, ships one input partition per (commit,
group-whose-spec-changed), and the partition reader folds the group's
state at both cutoffs and diffs per record key — GROUP-LOCAL, so the
whole feed is computed with ZERO shuffle (a record key lives in
exactly one file group per partition). Untouched groups never ship a
partition. A key upserted in two commits of one micro-batch emits one
image pair PER commit. Caveat: a replacecommit (clustering /
insert_overwrite) re-homes rows across file groups, so its images
surface as delete+insert pairs rather than updates.
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
    _gate_log_blocks,
    _latest_slices,
    _merge_ordering,
    _properties,
    _slice_specs,
)

__all__ = ["HudiStreamDataSource", "register_hudi_stream"]


def _table_type(root: str) -> str:
    ttype = _properties(root).get("hoodie.table.type", "COPY_ON_WRITE")
    if ttype not in ("COPY_ON_WRITE", "MERGE_ON_READ"):
        raise HudiProtocolError(
            f"hoodie.table.type={ttype}: unknown table type"
        )
    return ttype


def _data_schema(root: str, mor: bool, need_key: bool = False) -> StructType:
    """Declared row schema: the newest slice's footer minus meta cols.
    ``need_key`` additionally requires ``_hoodie_record_key`` (the CDC
    diff is key-based on COW too)."""
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
    need = ["_hoodie_commit_time"] + (
        ["_hoodie_record_key"] if (mor or need_key) else []
    )
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


class _CdcPartition(InputPartition):
    """CDC: one file group at one commit — its slice spec at the commit
    and at the previous instant; the reader folds both states and
    diffs per record key (group-local: zero shuffle)."""

    def __init__(self, before, after, part, commit, cols, precombine):
        self.before = before      # (base|None, [(lp, idx json)]) | None
        self.after = after        # same shape | None (group replaced)
        self.part = part
        self.commit = commit
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


def _fold_group_state(base, logs, part, cols, prec):
    """Fold ONE file group's base rows + committed log events per
    record key in the batch merge's total order (sequentially, on the
    executor): ``{record key: (commit time, row tuple | None)}`` —
    ``None`` = the key's winning writer was a DELETE tombstone. Shared
    by the incremental stream (window filter on top) and the CDC
    stream (two folds diffed)."""
    from . import hudi_log as HL

    best: dict = {}

    def offer(key, sk, ct, row):
        cur = best.get(key)
        if cur is None or sk > cur[0]:
            best[key] = (sk, ct, row)

    if base is not None:
        import pyarrow.parquet as pq

        need = list(
            dict.fromkeys(
                [*cols, "_hoodie_commit_time", "_hoodie_record_key"]
            )
        )
        from .io import localize_naive_timestamps

        t = localize_naive_timestamps(pq.ParquetFile(base).read(columns=need))
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
    for fidx, (lp, bjson) in enumerate(logs):
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
                    if pp is not None and os.path.normpath(pp) != part:
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
    return {k: (ct, row) for k, (_sk, ct, row) in best.items()}


class HudiStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self._root = options.get("path")
        if not self._root:
            raise ValueError("hudi_stream requires .option('path', <table root>)")
        self._mor = _table_type(self._root) == "MERGE_ON_READ"
        self._cdc = str(
            options.get(
                "incrementalformat", options.get("incrementalFormat", "")
            )
        ).lower() == "cdc"
        # merge semantics only matter where merging happens (MOR); a COW
        # table's payload class never affects its snapshot read — except
        # in CDC mode, whose state folds are key-ordered on both types
        self._precombine = (
            _merge_ordering(_properties(self._root)) if self._mor else None
        )
        self._cols = [
            f.name
            for f in _data_schema(
                self._root, self._mor, need_key=self._cdc
            ).fields
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
        from .hudi import _filter_done, _pending_compaction_groups

        groups, logs = _latest_slices(
            self._root, upto, self._partitions, collect_logs=True
        )
        done = _filter_done(
            _completed_commits(self._root, allow_delta=True), upto
        )
        pending = _pending_compaction_groups(self._root)
        out: list[_MorGroupPartition] = []
        for key in sorted(set(groups) | set(logs)):
            base = groups.get(key)
            lfs = sorted(logs.get(key, []))
            if base is not None:
                # a pending compaction's log chain folds onto the old
                # base until the plan completes (same rule as the batch
                # _read_mor)
                pi = pending.get(key)
                lfs = [l for l in lfs if l[0] == base[0] or l[0] == pi]
            max_inst = base[0] if base is not None else ""
            kept: list[tuple[str, str]] = []
            for _bi, _ver, lp in lfs:
                idxs, mi = _gate_log_blocks(lp, done)
                if idxs:
                    kept.append((lp, json.dumps(idxs)))
                if mi > max_inst:
                    max_inst = mi
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

    def _group_specs(self, as_of: str | None) -> dict:
        """Shared slice-spec recipe (see hudi._slice_specs): two specs
        differing at consecutive cutoffs IS the touched-group test."""
        return _slice_specs(self._root, as_of, self._partitions, self._mor)

    def _cdc_partitions(self, begin, upto):
        """One partition per (commit in the window, group whose slice
        spec changed at that commit) — per-commit image granularity,
        untouched groups never ship."""
        from .hudi import HudiProtocolError, _archive_boundary

        la, _ch = _archive_boundary(self._root)
        if la is not None and str(begin) < la:
            raise HudiProtocolError(
                f"cdc stream offset {begin} predates the archived-"
                f"timeline boundary {la}: per-commit change windows "
                "cannot enumerate archived instants — restart the "
                "stream at or after the boundary"
            )
        done_all = sorted(
            _completed_commits(self._root, allow_delta=self._mor)
        )
        window = [c for c in done_all if begin < c <= upto]
        out: list[_CdcPartition] = []
        prev_cutoff = max((d for d in done_all if d <= begin), default=None)
        spec_prev = self._group_specs(prev_cutoff)
        for c in window:
            spec_c = self._group_specs(c)
            for key in sorted(set(spec_prev) | set(spec_c)):
                if spec_prev.get(key) != spec_c.get(key):
                    out.append(
                        _CdcPartition(
                            spec_prev.get(key),
                            spec_c.get(key),
                            key[0],
                            c,
                            self._cols,
                            self._precombine,
                        )
                    )
            spec_prev = spec_c
        return out

    def partitions(self, start: dict, end: dict):
        begin, upto = start["instant"], end["instant"]
        out = []
        if upto > begin:
            if self._cdc:
                out = self._cdc_partitions(begin, upto)
            else:
                out = (
                    self._mor_partitions(begin, upto)
                    if self._mor
                    else self._cow_partitions(begin, upto)
                )
        return out or [_SlicePartition(None, begin, upto, self._cols)]

    def read(self, partition):
        if isinstance(partition, _CdcPartition):
            yield from self._read_cdc(partition)
            return
        if isinstance(partition, _MorGroupPartition):
            yield from self._read_mor_group(partition)
            return
        if partition.path is None:
            return
        import pyarrow.parquet as pq

        from .io import localize_naive_timestamps

        table = localize_naive_timestamps(
            pq.ParquetFile(partition.path).read(
                columns=[*partition.cols, "_hoodie_commit_time"]
            )
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
        state = _fold_group_state(
            p.base, p.logs, p.part, p.cols, p.precombine
        )
        for ct, row in state.values():
            if row is not None and p.begin < ct <= p.end:
                yield (*row, ct)

    def _read_cdc(self, p: _CdcPartition):
        """Diff one group's folded state at (prev instant, commit):
        Delta-CDF-shaped image rows, computed group-locally."""
        def state(spec):
            if spec is None:
                return {}
            base, logs = spec
            return _fold_group_state(
                base, logs, p.part, p.cols, p.precombine
            )

        before = state(p.before)
        after = state(p.after)
        for k in sorted(set(before) | set(after), key=str):
            brow = before.get(k, (None, None))[1]
            arow = after.get(k, (None, None))[1]
            if brow is None and arow is None:
                continue  # never existed / tombstone on both sides
            if brow is None:
                yield (*arow, "insert", p.commit)
            elif arow is None:
                yield (*brow, "delete", p.commit)
            elif brow != arow:
                yield (*brow, "update_preimage", p.commit)
                yield (*arow, "update_postimage", p.commit)

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
        cdc = str(
            self.options.get(
                "incrementalformat", self.options.get("incrementalFormat", "")
            )
        ).lower() == "cdc"
        base = StructType(
            list(_data_schema(root, mor, need_key=cdc).fields)
        )
        if cdc:
            base = base.add("_change_type", StringType())
        return base.add("_commit_instant", StringType())

    def streamReader(self, schema: StructType):
        return HudiStreamReader(self.options)

    def reader(self, schema: StructType):
        return _HudiBatchTailReader(self.options)


def register_hudi_stream(spark) -> None:
    """Idempotently register the format on the session."""
    spark.dataSource.register(HudiStreamDataSource)
