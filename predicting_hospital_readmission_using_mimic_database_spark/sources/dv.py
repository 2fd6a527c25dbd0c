"""Delta Lake DELETION VECTOR codec — from the public spec
(https://github.com/delta-io/delta/blob/master/PROTOCOL.md, "Deletion
Vectors" + "Deletion Vector Format") and the public Roaring bitmap
portable format (https://github.com/RoaringBitmap/RoaringFormatSpec).

A deletion vector marks ROWS of one data file as deleted without
rewriting the file — the add action carries a descriptor::

    {"storageType": "u"|"i"|"p", "pathOrInlineDv": ..., "offset": N,
     "sizeInBytes": N, "cardinality": N}

* ``p``: absolute path of the DV file; ``u``: the file is
  ``<table>/<prefix>/deletion_vector_<uuid>.bin`` with the uuid Z85-
  encoded as the last 20 chars of pathOrInlineDv (any leading chars are
  the random prefix dir); ``i``: the DV bytes themselves, Z85-encoded.
* DV FILE layout: 1-byte format version (1); each stored DV sits at its
  descriptor ``offset``: ``<int32 BE size><data bytes><int32 BE CRC-32
  of data>``.
* DV DATA is a serialized **RoaringBitmapArray** ("portable" format):
  ``<int32 LE magic 1681511377><int64 LE number of 32-bit bitmaps>``
  then each standard 32-bit Roaring bitmap (portable spec) back to
  back; the 64-bit row index ``v`` lives in bitmap ``v >> 32`` as
  32-bit value ``v & 0xFFFFFFFF``.

Reading supports array, bitset, and run containers; writing (used by
fixtures/tests — the engine's own tables never carry DVs) emits the
no-run layout. Everything is pure stdlib.
"""

from __future__ import annotations

import struct
import zlib

MAGIC = 1681511377
_SERIAL_COOKIE = 12347
_SERIAL_COOKIE_NO_RUN = 12346
_NO_OFFSET_THRESHOLD = 4

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


def z85_decode(s: str) -> bytes:
    """Z85 (ZeroMQ base-85) decode; length must be a multiple of 5."""
    if len(s) % 5:
        raise ValueError(f"z85 length {len(s)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(s), 5):
        v = 0
        for c in s[i : i + 5]:
            try:
                v = v * 85 + _Z85_INDEX[c]
            except KeyError:
                raise ValueError(f"invalid z85 character {c!r}") from None
        out += v.to_bytes(4, "big")
    return bytes(out)


def z85_encode(b: bytes) -> str:
    if len(b) % 4:
        raise ValueError(f"z85 input length {len(b)} not a multiple of 4")
    out = []
    for i in range(0, len(b), 4):
        v = int.from_bytes(b[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            v, r = divmod(v, 85)
            chunk.append(_Z85_CHARS[r])
        out.extend(reversed(chunk))
    return "".join(out)


def _read_roaring32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """One standard 32-bit Roaring bitmap (portable format) starting at
    ``pos``; returns (sorted values, next position)."""
    (cookie,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    run_flags = b""
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        size = (cookie >> 16) + 1
        nflag = (size + 7) // 8
        run_flags = buf[pos : pos + nflag]
        pos += nflag
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (size,) = struct.unpack_from("<I", buf, pos)
        pos += 4
    else:
        raise ValueError(f"unknown roaring cookie {cookie}")
    keys_cards = []
    for _ in range(size):
        key, card_m1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        keys_cards.append((key, card_m1 + 1))
    has_offsets = cookie == _SERIAL_COOKIE_NO_RUN or size >= _NO_OFFSET_THRESHOLD
    if has_offsets:
        pos += 4 * size  # containers are sequential; offsets redundant
    values: list[int] = []
    for i, (key, card) in enumerate(keys_cards):
        base = key << 16
        is_run = bool(run_flags) and bool(run_flags[i // 8] & (1 << (i % 8)))
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(base + v for v in range(start, start + length + 1))
        elif card <= 4096:
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(base + v for v in vals)
        else:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    low = w & -w
                    values.append(base + (wi << 6) + low.bit_length() - 1)
                    w ^= low
    return values, pos


def roaring64_read(data: bytes) -> list[int]:
    """Deserialize a RoaringBitmapArray: sorted 64-bit values."""
    magic, n = struct.unpack_from("<Iq", data, 0)
    if magic != MAGIC:
        raise ValueError(f"bad RoaringBitmapArray magic {magic}")
    pos = 12
    out: list[int] = []
    for hi in range(n):
        vals, pos = _read_roaring32(data, pos)
        out.extend((hi << 32) | v for v in vals)
    return out


def _write_roaring32(values: list[int]) -> bytes:
    """Serialize sorted 32-bit values in the no-run portable layout."""
    containers: dict[int, list[int]] = {}
    for v in values:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    out = bytearray(struct.pack("<II", _SERIAL_COOKIE_NO_RUN, len(keys)))
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    bodies = []
    for k in keys:
        vals = sorted(containers[k])
        if len(vals) <= 4096:
            bodies.append(struct.pack(f"<{len(vals)}H", *vals))
        else:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            bodies.append(struct.pack("<1024Q", *words))
    offset = len(out) + 4 * len(keys)
    for b in bodies:
        out += struct.pack("<I", offset)
        offset += len(b)
    for b in bodies:
        out += b
    return bytes(out)


def roaring64_write(values: list[int]) -> bytes:
    """Serialize 64-bit values as a RoaringBitmapArray (no-run layout).
    Bitmaps are emitted for every index 0..max_hi (empty ones included),
    matching the reference serializer's dense indexing."""
    by_hi: dict[int, list[int]] = {}
    for v in sorted(set(values)):
        by_hi.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    n = (max(by_hi) + 1) if by_hi else 0
    out = bytearray(struct.pack("<Iq", MAGIC, n))
    for hi in range(n):
        out += _write_roaring32(by_hi.get(hi, []))
    return bytes(out)


def roaring64_portable_read(data: bytes) -> list[int]:
    """Deserialize the official 64-bit roaring PORTABLE format (what
    Iceberg v3 deletion vectors store): u64 LE bitmap count, then per
    bitmap a u32 LE high key + the 32-bit portable serialization.
    Differs from the Delta RoaringBitmapArray above (magic header,
    DENSE keyless indexing)."""
    (n,) = struct.unpack_from("<Q", data, 0)
    pos = 8
    out: list[int] = []
    for _ in range(n):
        (hi,) = struct.unpack_from("<I", data, pos)
        pos += 4
        vals, pos = _read_roaring32(data, pos)
        out.extend((hi << 32) | v for v in vals)
    return out


def roaring64_portable_write(values: list[int]) -> bytes:
    """Serialize 64-bit values in the official roaring PORTABLE format
    (sparse keyed bitmaps, only non-empty high words emitted)."""
    by_hi: dict[int, list[int]] = {}
    for v in sorted(set(values)):
        by_hi.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    out = bytearray(struct.pack("<Q", len(by_hi)))
    for hi in sorted(by_hi):
        out += struct.pack("<I", hi)
        out += _write_roaring32(by_hi[hi])
    return bytes(out)


def read_dv_descriptor(descriptor: dict, table_root: str) -> list[int]:
    """Resolve a deletionVector descriptor to its sorted deleted row
    indices: inline z85 decode, or DV-file read (version byte checked,
    CRC-32 verified) at the descriptor offset."""
    import os
    import uuid

    st = descriptor.get("storageType")
    loc = descriptor.get("pathOrInlineDv", "")
    if st == "i":
        data = z85_decode(loc)
    else:
        if st == "u":
            prefix, enc = loc[:-20], loc[-20:]
            u = uuid.UUID(bytes=z85_decode(enc))
            path = os.path.join(table_root, prefix, f"deletion_vector_{u}.bin")
        elif st == "p":
            path = loc[len("file:"):].lstrip("/") if loc.startswith("file:") else loc
            if loc.startswith("file:"):
                path = "/" + path
            elif not os.path.isabs(path) and "://" not in path:
                # the spec resolves relative DV paths against the
                # TABLE ROOT (a bare relative open would be
                # cwd-dependent and fail on executors)
                path = os.path.join(table_root, path)
        else:
            raise ValueError(f"unknown deletionVector storageType {st!r}")
        with open(path, "rb") as f:
            raw = f.read()
        if raw[0] != 1:
            raise ValueError(f"unsupported DV file format version {raw[0]}")
        off = int(descriptor.get("offset", 1))
        (size,) = struct.unpack_from(">I", raw, off)
        data = raw[off + 4 : off + 4 + size]
        (crc,) = struct.unpack_from(">I", raw, off + 4 + size)
        if zlib.crc32(data) & 0xFFFFFFFF != crc:
            raise ValueError("deletion vector CRC-32 mismatch")
    vals = roaring64_read(data)
    card = descriptor.get("cardinality")
    if card is not None and card != len(vals):
        raise ValueError(
            f"deletion vector cardinality {card} != decoded {len(vals)}"
        )
    return vals


def write_dv_file(path: str, positions: list[int]) -> dict:
    """Write a single-DV file the way a Delta writer would (version
    byte, BE size + data + CRC at offset 1) and return the matching
    descriptor fields (storageType 'p'). Fixture/test surface."""
    data = roaring64_write(positions)
    blob = (
        b"\x01"
        + struct.pack(">I", len(data))
        + data
        + struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
    )
    with open(path, "wb") as f:
        f.write(blob)
    return {
        "storageType": "p",
        "pathOrInlineDv": path,
        "offset": 1,
        "sizeInBytes": len(data),
        "cardinality": len(set(positions)),
    }
