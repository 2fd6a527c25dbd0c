"""Minimal Apache Puffin file codec — pure stdlib, implemented from
the public Puffin spec (https://iceberg.apache.org/puffin-spec/) and
the Iceberg v3 table-spec Deletes section. Exists so the Iceberg
interop (sources/iceberg.py) can read and write format-v3 DELETION
VECTORS, which v3 writers store as ``deletion-vector-v1`` blobs in
Puffin files instead of v2's positional-delete parquet.

File layout per spec:
  Magic  Blob₁ … Blobₙ  Footer
  Footer = Magic  FooterPayload  FooterPayloadSize(i32 LE)  Flags(4B)  Magic
FooterPayload is UTF-8 JSON {"blobs": [...], "properties": {...}};
flag bit 0 (byte 0) = payload LZ4-compressed — honestly gated here
(raise), uncompressed is what this writer emits and every engine
accepts. Blob compression codecs other than None are gated too.

``deletion-vector-v1`` blob layout per the v3 spec:
  len(i32 BE, of magic+vector)  magic D1 33 39 64  vector  crc32(i32 BE)
where vector is the 64-bit roaring bitmap PORTABLE serialization and
the CRC-32 covers magic+vector. (The magic equals Delta's deletion-
vector magic by design — the formats are deliberately bit-compatible.)
"""

from __future__ import annotations

import json
import struct
import zlib

from .dv import roaring64_portable_read, roaring64_portable_write

MAGIC = b"PFA1"
DV_MAGIC = b"\xd1\x33\x39\x64"  # LE bytes of Delta's 1681511377
FLAG_FOOTER_COMPRESSED = 0x01


class PuffinFormatError(ValueError):
    pass


def dv_blob_encode(positions: list[int]) -> bytes:
    """Deleted row positions -> a ``deletion-vector-v1`` blob."""
    vec = DV_MAGIC + roaring64_portable_write(positions)
    return (
        struct.pack(">i", len(vec))
        + vec
        + struct.pack(">I", zlib.crc32(vec) & 0xFFFFFFFF)
    )


def dv_blob_decode(blob: bytes) -> list[int]:
    """A ``deletion-vector-v1`` blob -> sorted deleted row positions
    (magic + CRC verified)."""
    (n,) = struct.unpack_from(">i", blob, 0)
    vec = blob[4:4 + n]
    if vec[:4] != DV_MAGIC:
        raise PuffinFormatError(
            f"deletion-vector blob magic {vec[:4]!r} != {DV_MAGIC!r}"
        )
    (crc,) = struct.unpack_from(">I", blob, 4 + n)
    if zlib.crc32(vec) & 0xFFFFFFFF != crc:
        raise PuffinFormatError("deletion-vector blob CRC-32 mismatch")
    return roaring64_portable_read(vec[4:])


def write_puffin(
    path: str, blobs: list[dict], properties: dict | None = None
) -> list[dict]:
    """Write a Puffin file. Each input blob dict: ``{"type": str,
    "data": bytes, ...optional spec fields ("fields", "snapshot-id",
    "sequence-number", "properties")}``. Returns the footer's blob
    descriptors (offset/length filled in) — what a writer records in
    its manifest entries."""
    descs: list[dict] = []
    with open(path, "wb") as f:
        f.write(MAGIC)
        off = 4
        for b in blobs:
            data = b["data"]
            d = {
                "type": b["type"],
                "fields": b.get("fields", []),
                "snapshot-id": b.get("snapshot-id", 0),
                "sequence-number": b.get("sequence-number", 0),
                "offset": off,
                "length": len(data),
            }
            if b.get("properties"):
                d["properties"] = b["properties"]
            descs.append(d)
            f.write(data)
            off += len(data)
        payload = json.dumps(
            {"blobs": descs, "properties": properties or {}}
        ).encode("utf-8")
        f.write(MAGIC)
        f.write(payload)
        f.write(struct.pack("<i", len(payload)))
        f.write(b"\x00\x00\x00\x00")  # flags: uncompressed footer
        f.write(MAGIC)
    return descs


def read_puffin_footer(path: str) -> dict:
    """Read a Puffin file's footer payload (blob index + properties)."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != MAGIC or data[-4:] != MAGIC:
        raise PuffinFormatError(f"not a puffin file: {path}")
    flags = data[-8:-4]
    if flags[0] & FLAG_FOOTER_COMPRESSED:
        raise PuffinFormatError(
            "LZ4-compressed puffin footer is not supported"
        )
    (size,) = struct.unpack_from("<i", data, len(data) - 12)
    start = len(data) - 12 - size
    if data[start - 4:start] != MAGIC:
        raise PuffinFormatError(f"puffin footer framing corrupt in {path}")
    return json.loads(data[start:start + size].decode("utf-8"))


def read_blob(path: str, offset: int, length: int, codec=None) -> bytes:
    """Read one blob by footer/manifest coordinates. ``codec`` other
    than None/"" raises (zstd blob compression is not vendored)."""
    if codec:
        raise PuffinFormatError(
            f"puffin blob compression-codec {codec!r} is not supported"
        )
    with open(path, "rb") as f:
        f.seek(offset)
        return f.read(length)
