"""Minimal Apache Avro Object Container File codec — pure stdlib,
implemented from the public Avro 1.11 specification
(https://avro.apache.org/docs/current/specification/). Exists so the
Iceberg interop (sources/iceberg.py) can decode manifest lists and
manifest files (which Iceberg stores as Avro) without adding a
dependency; the writer exists for round-trip tests and fixture
construction.

Scope: the container format (magic, metadata map, sync-marked blocks)
with ``null`` and ``deflate`` codecs, and the full binary encoding of
records, unions, arrays, maps, enums, fixed, and primitives. Schema
evolution/resolution is NOT implemented — files are decoded with their
own embedded writer schema, which is exactly what reading a manifest
needs. Unknown codecs raise.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# binary primitives
# ---------------------------------------------------------------------------


def _read_long(buf: io.BytesIO) -> int:
    """Zigzag varint (spec: int and long share this encoding)."""
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("avro: truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _write_long(out: bytearray, v: int) -> None:
    v = (v << 1) ^ (v >> 63) if v >= 0 else ((-v - 1) << 1 | 1)
    # python ints are unbounded; emulate the 64-bit zigzag directly:
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            break


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("avro: truncated bytes")
    return data


def _write_bytes(out: bytearray, data: bytes) -> None:
    _write_long(out, len(data))
    out.extend(data)


# ---------------------------------------------------------------------------
# schema-driven decode / encode
# ---------------------------------------------------------------------------


def _decode(schema, buf: io.BytesIO, names: dict):
    if isinstance(schema, str):
        if schema in names:
            return _decode(names[schema], buf, names)
        t = schema
    elif isinstance(schema, list):  # union
        idx = _read_long(buf)
        if not (0 <= idx < len(schema)):
            raise ValueError(f"avro: union index {idx} out of range")
        return _decode(schema[idx], buf, names)
    else:
        t = schema["type"]
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return _read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return _read_bytes(buf)
    if t == "string":
        return _read_bytes(buf).decode("utf-8")
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "enum":
        return schema["symbols"][_read_long(buf)]
    if t == "record":
        _register(schema, names)
        return {
            f["name"]: _decode(f["type"], buf, names) for f in schema["fields"]
        }
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte size prefix
                n = -n
                _read_long(buf)
            for _ in range(n):
                out.append(_decode(schema["items"], buf, names))
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                _read_long(buf)
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = _decode(schema["values"], buf, names)
    raise ValueError(f"avro: unsupported schema type {t!r}")


def _union_accepts(branch, value, names: dict, strict: bool) -> bool:
    """Does a union branch's type accept this Python value? ``strict``
    requires the natural type; lenient additionally lets int satisfy
    float/double (Avro's numeric promotion)."""
    bt = branch if isinstance(branch, str) else branch.get("type")
    if isinstance(bt, str) and bt in names:
        return _union_accepts(names[bt], value, names, strict)
    if bt == "boolean":
        return isinstance(value, bool)
    if bt in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if bt in ("float", "double"):
        return isinstance(value, float) or (
            not strict and isinstance(value, int) and not isinstance(value, bool)
        )
    if bt in ("string", "enum"):
        return isinstance(value, str)
    if bt in ("bytes", "fixed"):
        return isinstance(value, (bytes, bytearray))
    if bt in ("record", "map"):
        return isinstance(value, dict)
    if bt == "array":
        return isinstance(value, (list, tuple))
    return False


def _encode(schema, value, out: bytearray, names: dict) -> None:
    if isinstance(schema, str):
        if schema in names:
            return _encode(names[schema], value, out, names)
        t = schema
    elif isinstance(schema, list):  # union: branch matched by value type
        def _bt(b):
            return b if isinstance(b, str) else b.get("type")

        # Avro JSON-encoding style TAGGED union value: {"Name": inner}
        # selects the named branch explicitly. Needed when several
        # record branches are structurally identical (e.g. Hudi's
        # IntWrapper/LongWrapper/DoubleWrapper min/max wrappers, all
        # single-field {value} records) — structural matching cannot
        # tell them apart. Only fires when the tag names an actual
        # record/enum/fixed branch, so plain map values fall through.
        if isinstance(value, dict) and len(value) == 1:
            (tag, inner), = value.items()
            for i, b in enumerate(schema):
                bname = b.get("name") if isinstance(b, dict) else (
                    b if isinstance(b, str) and b in names else None
                )
                if bname is None:
                    continue
                ns = b.get("namespace") if isinstance(b, dict) else None
                if tag == bname or (ns and tag == f"{ns}.{bname}"):
                    _write_long(out, i)
                    return _encode(b, inner, out, names)
        if value is None:
            for i, branch in enumerate(schema):
                if _bt(branch) == "null":
                    _write_long(out, i)
                    return None
            raise ValueError(f"avro: no null branch for None in {schema}")
        matched = [
            (i, b)
            for i, b in enumerate(schema)
            if _union_accepts(b, value, names, strict=True)
        ] or [
            (i, b)
            for i, b in enumerate(schema)
            if _union_accepts(b, value, names, strict=False)
        ]
        if not matched and isinstance(value, (dict, list, tuple)):
            # structural fallback ONLY for container values aimed at a
            # record/map/array branch (named nested types that the type
            # check could not resolve); a SCALAR no branch accepts is a
            # caller bug — serializing it under an arbitrary branch tag
            # would be latent corruption, so it raises below instead
            want = ("record", "map") if isinstance(value, dict) else ("array",)
            matched = [
                (i, b) for i, b in enumerate(schema) if _bt(b) in want
            ]
        if not matched:
            raise ValueError(f"avro: no union branch for {value!r} in {schema}")
        i, branch = matched[0]
        _write_long(out, i)
        return _encode(branch, value, out, names)
    else:
        t = schema["type"]
    if t == "null":
        return None
    if t == "boolean":
        out.append(1 if value else 0)
        return None
    if t in ("int", "long"):
        _write_long(out, int(value))
        return None
    if t == "float":
        out.extend(struct.pack("<f", value))
        return None
    if t == "double":
        out.extend(struct.pack("<d", value))
        return None
    if t == "bytes":
        _write_bytes(out, bytes(value))
        return None
    if t == "string":
        _write_bytes(out, value.encode("utf-8"))
        return None
    if t == "fixed":
        if len(value) != schema["size"]:
            raise ValueError("avro: fixed size mismatch")
        out.extend(value)
        return None
    if t == "enum":
        _write_long(out, schema["symbols"].index(value))
        return None
    if t == "record":
        _register(schema, names)
        for f in schema["fields"]:
            if f["name"] in value:
                fv = value[f["name"]]
            elif "default" in f:
                fv = f["default"]  # Avro field default per spec
            else:
                raise ValueError(
                    f"avro: record value missing field {f['name']!r} "
                    f"(no default declared)"
                )
            _encode(f["type"], fv, out, names)
        return None
    if t == "array":
        if value:
            _write_long(out, len(value))
            for item in value:
                _encode(schema["items"], item, out, names)
        _write_long(out, 0)
        return None
    if t == "map":
        if value:
            _write_long(out, len(value))
            for k, v in value.items():
                _write_bytes(out, k.encode("utf-8"))
                _encode(schema["values"], v, out, names)
        _write_long(out, 0)
        return None
    raise ValueError(f"avro: unsupported schema type {t!r}")


def _register(schema: dict, names: dict) -> None:
    """Named types (record/enum/fixed) are referable by name later."""
    if isinstance(schema, dict) and "name" in schema:
        names[schema["name"]] = schema
        ns = schema.get("namespace")
        if ns:
            names[f"{ns}.{schema['name']}"] = schema


def register_all(schema, names: dict) -> None:
    """Walk a schema and register EVERY named type up front, so by-name
    references resolve even when they precede the defining occurrence
    in encode/decode order (e.g. a union branch list of names, or a
    tagged-union value selecting a branch that has never been encoded
    yet). Entry points call this once per file."""
    if isinstance(schema, list):
        for b in schema:
            register_all(b, names)
        return
    if not isinstance(schema, dict):
        return
    _register(schema, names)
    t = schema.get("type")
    if t == "record":
        for f in schema.get("fields", []):
            register_all(f.get("type"), names)
    elif t == "array":
        register_all(schema.get("items"), names)
    elif t == "map":
        register_all(schema.get("values"), names)
    elif isinstance(t, (dict, list)):
        register_all(t, names)


# ---------------------------------------------------------------------------
# container file
# ---------------------------------------------------------------------------


def read_avro(path: str) -> tuple[dict, list[dict]]:
    """Decode an Avro OCF: returns (writer schema, records)."""
    with open(path, "rb") as f:
        data = f.read()
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError(f"not an avro object container file: {path}")
    meta_schema = {"type": "map", "values": "bytes"}
    meta = _decode(meta_schema, buf, {})
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro: unsupported codec {codec!r} in {path}")
    sync = buf.read(16)
    records: list = []
    names: dict = {}
    register_all(schema, names)
    while buf.tell() < len(data):
        n = _read_long(buf)
        size = _read_long(buf)
        block = buf.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)  # raw DEFLATE per spec
        bbuf = io.BytesIO(block)
        for _ in range(n):
            records.append(_decode(schema, bbuf, names))
        if buf.read(16) != sync:
            raise ValueError(f"avro: sync marker mismatch in {path}")
    return schema, records


def write_avro(
    path: str, schema: dict, records: list, codec: str = "deflate"
) -> None:
    """Encode records as an Avro OCF (one block)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro: unsupported codec {codec!r}")
    names: dict = {}
    register_all(schema, names)
    body = bytearray()
    for rec in records:
        _encode(schema, rec, body, names)
    payload = bytes(body)
    if codec == "deflate":
        co = zlib.compressobj(9, zlib.DEFLATED, -15)
        payload = co.compress(payload) + co.flush()
    out = bytearray()
    out.extend(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
    }
    _encode({"type": "map", "values": "bytes"}, meta, out, {})
    sync = b"\x00" * 8 + b"snapshotavro"[:8]
    out.extend(sync)
    _write_long(out, len(records))
    _write_long(out, len(payload))
    out.extend(payload)
    out.extend(sync)
    with open(path, "wb") as f:
        f.write(bytes(out))
