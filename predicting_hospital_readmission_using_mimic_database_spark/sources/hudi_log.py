"""Apache Hudi LOG FILE codec (the merge-on-read delta format) — pure
stdlib, implemented from the public log-block layout documented in the
Hudi tech specs (https://hudi.apache.org/tech-specs/ §"Log File Format")
and the Apache Hudi sources (HoodieLogFormatWriter / HoodieLogFileReader,
both ASF-licensed public code); record payloads reuse the stdlib Avro
binary codec in :mod:`.avro_ocf`.

Each log file is a sequence of blocks:

    +--------------------------------------------------------------+
    | MAGIC ``#HUDI#`` (6 bytes)                                   |
    | block size excluding magic (8-byte BE long: everything after |
    |   this field through the trailing total, plus the trailing 8)|
    | log format version (4-byte BE int, = 1)                      |
    | block type ordinal (4-byte BE int)                           |
    | header map  (int count, then per entry: int key ordinal,     |
    |   int utf8 length, utf8 bytes)                               |
    | content length (8-byte BE long)                              |
    | content bytes                                                |
    | footer map (same layout as header)                           |
    | total block size including magic (8-byte BE long)            |
    +--------------------------------------------------------------+

AVRO data block content: 4-byte content-format version, 4-byte record
count, then per record 4-byte length + the record's Avro BINARY
encoding under the schema carried in the block header's ``SCHEMA``
entry. A torn final block (writer died mid-append) is detected by
truncation and IGNORED — the standard log-recovery posture; a corrupt
magic mid-file raises.

DELETE block content (the normal MOR upsert-with-delete write path):
4-byte content-format version, 4-byte payload length, then the Avro
BINARY encoding of a ``HoodieDeleteRecordList`` record — an array of
``{recordKey, partitionPath, orderingVal}`` (the shape newer Hudi
writers serialize; see HoodieDeleteBlock in the ASF sources). Older
writers' kryo-serialized key arrays are NOT parsed — decoding them
raises so the reader can gate honestly instead of dropping deletes.

COMMAND (rollback) blocks are recognized and surfaced so the reader
can gate honestly; rollback resolution is not implemented.
"""

from __future__ import annotations

import io
import json
import os
import struct

from .avro_ocf import _decode, _encode, register_all

MAGIC = b"#HUDI#"
LOG_FORMAT_VERSION = 1

#: HoodieLogBlockType ordinals
COMMAND_BLOCK = 0
DELETE_BLOCK = 1
CORRUPT_BLOCK = 2
AVRO_DATA_BLOCK = 3

#: HeaderMetadataType ordinals
H_INSTANT_TIME = 0
H_TARGET_INSTANT_TIME = 1
H_SCHEMA = 2
H_COMMAND_BLOCK_TYPE = 3


class HudiLogCorruptError(ValueError):
    """Mid-file structural corruption (bad magic / impossible sizes)."""


class HudiLogUnsupportedError(NotImplementedError):
    """A block payload in a serialization this layer does not parse
    (e.g. a legacy kryo-serialized delete-key array)."""


#: delete-block payload: Avro record list (what newer Hudi writers emit)
DELETE_RECORD_LIST_SCHEMA = {
    "type": "record",
    "name": "HoodieDeleteRecordList",
    "fields": [
        {
            "name": "deleteRecordList",
            "type": {
                "type": "array",
                "items": {
                    "type": "record",
                    "name": "HoodieDeleteRecord",
                    "fields": [
                        {"name": "recordKey", "type": ["null", "string"]},
                        {"name": "partitionPath", "type": ["null", "string"]},
                        {
                            "name": "orderingVal",
                            "type": ["null", "string", "long", "double"],
                        },
                    ],
                },
            },
        }
    ],
}

#: delete-block content-format version this layer writes/reads
DELETE_CONTENT_VERSION = 3


def encode_delete_records(records: list[dict]) -> bytes:
    """Delete-block content bytes: 4-byte content version, 4-byte
    payload length, Avro binary of ``HoodieDeleteRecordList``. Each
    record needs ``recordKey`` (+ optional ``partitionPath`` /
    ``orderingVal``)."""
    body = bytearray()
    _encode(
        DELETE_RECORD_LIST_SCHEMA,
        {
            "deleteRecordList": [
                {
                    "recordKey": r.get("recordKey"),
                    "partitionPath": r.get("partitionPath"),
                    "orderingVal": r.get("orderingVal"),
                }
                for r in records
            ]
        },
        body,
        {},
    )
    return struct.pack(">i", DELETE_CONTENT_VERSION) + struct.pack(
        ">i", len(body)
    ) + bytes(body)


def decode_delete_records(content: bytes) -> list[dict]:
    """Inverse of :func:`encode_delete_records`. Payloads this layer
    cannot parse (legacy kryo serialization, truncated bytes) raise
    :class:`HudiLogUnsupportedError` — deletes must never be silently
    dropped."""
    try:
        (ver,) = struct.unpack_from(">i", content, 0)
        (ln,) = struct.unpack_from(">i", content, 4)
        if ln != len(content) - 8:
            raise ValueError(f"payload length {ln} != {len(content) - 8}")
        rec = _decode(
            DELETE_RECORD_LIST_SCHEMA, io.BytesIO(content[8:]), {}
        )
        out = rec["deleteRecordList"]
        if any(r.get("recordKey") is None for r in out):
            raise ValueError("delete record without recordKey")
        return out
    except HudiLogUnsupportedError:
        raise
    except Exception as e:
        raise HudiLogUnsupportedError(
            "DELETE block payload is not an Avro HoodieDeleteRecordList "
            f"(legacy kryo-serialized delete keys are not parsed): {e}"
        ) from None


def _ser_map(meta: dict[int, str]) -> bytes:
    out = bytearray(struct.pack(">i", len(meta)))
    for k in sorted(meta):
        b = meta[k].encode("utf-8")
        out += struct.pack(">i", int(k)) + struct.pack(">i", len(b)) + b
    return bytes(out)


def _de_map(buf: io.BytesIO) -> dict[int, str]:
    (n,) = struct.unpack(">i", buf.read(4))
    out: dict[int, str] = {}
    for _ in range(n):
        (k,) = struct.unpack(">i", buf.read(4))
        (ln,) = struct.unpack(">i", buf.read(4))
        out[k] = buf.read(ln).decode("utf-8")
    return out


def log_file_name(
    file_id: str, base_instant: str, version: int, write_token: str = "0-1-0"
) -> str:
    """Hudi log files are DOT-prefixed (hidden):
    ``.{fileId}_{baseInstant}.log.{version}_{writeToken}``."""
    return f".{file_id}_{base_instant}.log.{version}_{write_token}"


def append_avro_block(
    path: str, instant: str, schema: dict, records: list[dict]
) -> None:
    """Append one AVRO data block (the MOR upsert payload) to ``path``,
    creating the file if needed. ``schema`` is the Avro record schema
    (JSON dict); every record is encoded in Avro binary under it."""
    content = bytearray(struct.pack(">i", 2))  # data-block content version
    content += struct.pack(">i", len(records))
    names: dict = {}
    register_all(schema, names)
    for r in records:
        rb = bytearray()
        _encode(schema, r, rb, names)
        content += struct.pack(">i", len(rb)) + bytes(rb)
    header = _ser_map({H_INSTANT_TIME: instant, H_SCHEMA: json.dumps(schema)})
    _append_block(path, AVRO_DATA_BLOCK, header, bytes(content))


def append_delete_block(
    path: str,
    instant: str,
    records: list[dict] | None = None,
    payload: bytes | None = None,
) -> None:
    """Append a DELETE block: ``records`` are
    ``{recordKey, partitionPath[, orderingVal]}`` dicts encoded per
    :func:`encode_delete_records` (the normal deleting-writer shape).
    ``payload`` overrides with raw bytes — the gate-test surface for
    laying down serializations this layer does not parse."""
    if payload is None:
        payload = encode_delete_records(records or [])
    _append_block(path, DELETE_BLOCK, _ser_map({H_INSTANT_TIME: instant}), payload)


def append_command_block(path: str, instant: str, target_instant: str) -> None:
    """Append a rollback COMMAND block shell."""
    header = _ser_map(
        {
            H_INSTANT_TIME: instant,
            H_TARGET_INSTANT_TIME: target_instant,
            H_COMMAND_BLOCK_TYPE: "0",  # ROLLBACK_BLOCK
        }
    )
    _append_block(path, COMMAND_BLOCK, header, b"")


def _append_block(path: str, btype: int, header: bytes, content: bytes) -> None:
    body = bytearray(struct.pack(">i", LOG_FORMAT_VERSION))
    body += struct.pack(">i", btype)
    body += header
    body += struct.pack(">q", len(content))
    body += content
    body += _ser_map({})  # footer
    total = len(MAGIC) + 8 + len(body) + 8
    blob = bytearray(MAGIC)
    blob += struct.pack(">q", len(body) + 8)  # everything after this field
    blob += body
    blob += struct.pack(">q", total)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "ab") as f:
        f.write(blob)


def read_log_blocks(path: str) -> list[dict]:
    """Decode every complete block:
    ``{"type": int, "instant": str|None, "header": {ordinal: str},
    "records": list[dict] (avro blocks), "delete_content": bytes
    (delete blocks — decode with :func:`decode_delete_records`)}``.
    A truncated final block is dropped (torn write); corruption before
    that raises."""
    with open(path, "rb") as f:
        data = f.read()
    out: list[dict] = []
    off = 0
    n = len(data)
    while off < n:
        if n - off < len(MAGIC) + 8:
            break  # torn tail
        if data[off : off + len(MAGIC)] != MAGIC:
            raise HudiLogCorruptError(
                f"{path}: bad magic at offset {off} "
                f"({data[off:off + len(MAGIC)]!r})"
            )
        (after,) = struct.unpack(
            ">q", data[off + len(MAGIC) : off + len(MAGIC) + 8]
        )
        end = off + len(MAGIC) + 8 + after
        if after < 24 or end > n:
            break  # torn tail: size says more bytes than the file has
        buf = io.BytesIO(data[off + len(MAGIC) + 8 : end])
        (ver,) = struct.unpack(">i", buf.read(4))
        if ver != LOG_FORMAT_VERSION:
            raise HudiLogCorruptError(
                f"{path}: unsupported log format version {ver}"
            )
        (btype,) = struct.unpack(">i", buf.read(4))
        header = _de_map(buf)
        (clen,) = struct.unpack(">q", buf.read(8))
        content = buf.read(clen)
        _footer = _de_map(buf)
        (total,) = struct.unpack(">q", buf.read(8))
        if total != after + len(MAGIC) + 8:
            raise HudiLogCorruptError(
                f"{path}: trailing size {total} != block span "
                f"{after + len(MAGIC) + 8}"
            )
        blk: dict = {
            "type": btype,
            "instant": header.get(H_INSTANT_TIME),
            "header": header,
        }
        if btype == AVRO_DATA_BLOCK:
            blk["records"] = _decode_avro_content(header, content, path)
        elif btype == DELETE_BLOCK:
            # raw payload only: callers decode the blocks they actually
            # keep (a PENDING delete block with an unparseable payload
            # must stay invisible, not fail the read)
            blk["delete_content"] = content
        out.append(blk)
        off = end
    return out


def scan_block_headers(path: str) -> list[dict]:
    """Driver-side header scan: block types + header maps WITHOUT
    reading content (seeks over the content bytes via the size field) —
    O(blocks) tiny reads, so gating/instant-filtering a 100 TB table's
    log files never pulls record payloads onto the driver. Same torn-
    tail tolerance as :func:`read_log_blocks`."""
    out: list[dict] = []
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        off = 0
        while off < size:
            if size - off < len(MAGIC) + 8:
                break
            magic = f.read(len(MAGIC))
            if magic != MAGIC:
                raise HudiLogCorruptError(
                    f"{path}: bad magic at offset {off} ({magic!r})"
                )
            (after,) = struct.unpack(">q", f.read(8))
            end = off + len(MAGIC) + 8 + after
            if after < 24 or end > size:
                break
            (ver,) = struct.unpack(">i", f.read(4))
            if ver != LOG_FORMAT_VERSION:
                raise HudiLogCorruptError(
                    f"{path}: unsupported log format version {ver}"
                )
            (btype,) = struct.unpack(">i", f.read(4))
            # header map (bounded: a handful of short strings)
            (n,) = struct.unpack(">i", f.read(4))
            header: dict[int, str] = {}
            for _ in range(n):
                (k,) = struct.unpack(">i", f.read(4))
                (ln,) = struct.unpack(">i", f.read(4))
                header[k] = f.read(ln).decode("utf-8")
            out.append(
                {"type": btype, "instant": header.get(H_INSTANT_TIME),
                 "header": header}
            )
            f.seek(end)
            off = end
    return out


def _decode_avro_content(header: dict, content: bytes, path: str) -> list[dict]:
    schema_json = header.get(H_SCHEMA)
    if not schema_json:
        raise HudiLogCorruptError(f"{path}: avro data block without SCHEMA header")
    schema = json.loads(schema_json)
    buf = io.BytesIO(content)
    (_cver,) = struct.unpack(">i", buf.read(4))
    (cnt,) = struct.unpack(">i", buf.read(4))
    names: dict = {}
    register_all(schema, names)
    recs = []
    for _ in range(cnt):
        (ln,) = struct.unpack(">i", buf.read(4))
        rb = io.BytesIO(buf.read(ln))
        recs.append(_decode(schema, rb, names))
    return recs
