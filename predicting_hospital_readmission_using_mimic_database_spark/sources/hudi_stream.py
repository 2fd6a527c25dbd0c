"""A FOREIGN Hudi COW table as a Structured Streaming SOURCE —
``spark.readStream.format("hudi_stream").option("path", root)``.

Hudi's incremental-query semantics (sources/hudi.py
``read_hudi_incremental``) lifted onto the PySpark 4 Python Data
Source API, completing the lakehouse trio next to ``delta_stream``
and the engine's own ``snapshot_changes``:

* OFFSETS are completed timeline INSTANTS (zero-padded strings —
  lexicographic order IS commit order). A micro-batch (start, end]
  reads only the file groups whose latest slice landed in the window,
  one input partition per touched base file, and filters rows by their
  own ``_hoodie_commit_time`` — carried-forward rows of a COW rewrite
  never surface.
* ``startingInstant`` option: an instant to replay from (exclusive),
  or ``"latest"`` (the DEFAULT — only commits after stream start;
  pass ``0`` to ingest the whole history).
* NET semantics per window: a row updated twice between polls surfaces
  once, at its final value (the latest slice is the only file read) —
  the same contract as Hudi's incremental relation over compacted
  timelines.
* Pending/inflight instants are invisible (timeline isolation);
  MOR tables and replacecommits raise via the shared timeline gates.

Every emitted row carries ``_commit_instant`` (string), the row's own
commit time.
"""

from __future__ import annotations

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
    _properties,
)

__all__ = ["HudiStreamDataSource", "register_hudi_stream"]


def _check_cow(root: str) -> None:
    ttype = _properties(root).get("hoodie.table.type", "COPY_ON_WRITE")
    if ttype != "COPY_ON_WRITE":
        raise HudiProtocolError(
            f"hoodie.table.type={ttype}: only COPY_ON_WRITE is supported"
        )


def _data_schema(root: str) -> StructType:
    """Declared row schema: the newest slice's footer minus meta cols."""
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_schema

    groups = _latest_slices(root, None, None)
    if not groups:
        raise ValueError(f"no completed base files in {root}")
    newest = max(groups.values())[1]
    full = from_arrow_schema(
        pq.ParquetFile(newest).schema_arrow, prefer_timestamp_ntz=True
    )
    if "_hoodie_commit_time" not in full.names:
        raise HudiProtocolError(
            "table files lack the _hoodie_commit_time meta column; "
            "incremental streaming needs per-row commit times"
        )
    return StructType([f for f in full.fields if f.name not in META_COLS])


class _SlicePartition(InputPartition):
    def __init__(self, path, begin, end, cols):
        self.path = path
        self.begin = begin
        self.end = end
        self.cols = cols


class HudiStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self._root = options.get("path")
        if not self._root:
            raise ValueError("hudi_stream requires .option('path', <table root>)")
        _check_cow(self._root)
        self._cols = [f.name for f in _data_schema(self._root).fields]
        p = options.get("partitions")
        self._partitions = p.split(",") if p else None
        start = options.get("startinginstant", options.get("startingInstant"))
        if start is None or str(start).lower() == "latest":
            done = _completed_commits(self._root)
            self._start = max(done) if done else "0"
        else:
            self._start = str(start)

    def initialOffset(self) -> dict:
        return {"instant": self._start}

    def latestOffset(self) -> dict:
        done = _completed_commits(self._root)
        return {"instant": max(done) if done else self._start}

    def partitions(self, start: dict, end: dict):
        begin, upto = start["instant"], end["instant"]
        out: list[_SlicePartition] = []
        if upto > begin:
            groups = _latest_slices(self._root, upto, self._partitions)
            for instant, path in sorted(groups.values()):
                if instant > begin:
                    out.append(
                        _SlicePartition(path, begin, upto, self._cols)
                    )
        return out or [_SlicePartition(None, begin, upto, self._cols)]

    def read(self, partition: _SlicePartition):
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
        return self._stream.partitions(
            self._stream.initialOffset(), self._stream.latestOffset()
        )

    def read(self, partition):
        yield from self._stream.read(partition)


class HudiStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "hudi_stream"

    def schema(self):
        return StructType(
            list(_data_schema(self.options.get("path")).fields)
        ).add("_commit_instant", StringType())

    def streamReader(self, schema: StructType):
        return HudiStreamReader(self.options)

    def reader(self, schema: StructType):
        return _HudiBatchTailReader(self.options)


def register_hudi_stream(spark) -> None:
    """Idempotently register the format on the session."""
    spark.dataSource.register(HudiStreamDataSource)
