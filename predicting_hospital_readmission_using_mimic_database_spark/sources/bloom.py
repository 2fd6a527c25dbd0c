"""Hadoop-Writable bloom filter codec — pure stdlib, implemented from
the public Apache Hadoop ``org.apache.hadoop.util.bloom`` sources and
the Apache Hudi bloom-filter docs (Hudi's ``SIMPLE`` bloom filter type
IS the Hadoop ``BloomFilter`` with the Murmur hash, serialized via the
Writable protocol; Hudi base files carry it base64-encoded in the
parquet footer key ``org.apache.hudi.bloomfilter`` and the metadata
table's ``bloom_filters`` partition carries the same bytes).

Layout (Writable, big-endian):
  int32  VERSION  (-1)
  int32  nbHash   (hash-function count)
  int8   hashType (1 = MURMUR per Hadoop ``Hash`` constants)
  int32  vectorSize (bit count)
  bytes  ceil(vectorSize/8) bit-vector bytes, bit ``i`` stored at
         byte ``i // 8`` mask ``1 << (7 - i % 8)`` (MSB-first, the
         Writable BitSet layout)

Hashing per Hadoop ``HashFunction.hash``: ``nbHash`` chained rounds of
32-bit Murmur2 (seed = previous round's SIGNED value, initial 0), each
mapped to a bit via Java semantics ``Math.abs(h % vectorSize)``.
"""

from __future__ import annotations

import math
import struct

HADOOP_VERSION = -1
MURMUR_HASH = 1  # org.apache.hadoop.util.hash.Hash.MURMUR_HASH

_M = 0x5BD1E995
_MASK = 0xFFFFFFFF


def murmur2_32(data: bytes, seed: int) -> int:
    """Hadoop ``MurmurHash`` (32-bit Murmur2): unsigned 32-bit result;
    ``seed`` may be signed or unsigned (only its low 32 bits matter)."""
    length = len(data)
    h = (seed ^ length) & _MASK
    n4 = length & ~3
    for i in range(0, n4, 4):
        k = int.from_bytes(data[i:i + 4], "little")
        k = (k * _M) & _MASK
        k ^= k >> 24
        k = (k * _M) & _MASK
        h = (h * _M) & _MASK
        h ^= k
    left = length & 3
    if left >= 3:
        h ^= data[length - 3] << 16
    if left >= 2:
        h ^= data[length - 2] << 8
    if left >= 1:
        h ^= data[length - 1]
        h = (h * _M) & _MASK
    h ^= h >> 13
    h = (h * _M) & _MASK
    h ^= h >> 15
    return h


class HadoopBloomFilter:
    """The Hadoop ``BloomFilter`` Writable with Murmur hashing — the
    filter behind Hudi's SIMPLE bloom index."""

    def __init__(self, vector_size: int, nb_hash: int):
        if vector_size <= 0 or nb_hash <= 0:
            raise ValueError("vector_size and nb_hash must be positive")
        self.vector_size = int(vector_size)
        self.nb_hash = int(nb_hash)
        self.bits = bytearray((self.vector_size + 7) // 8)

    @classmethod
    def optimal(cls, n_entries: int, fpp: float) -> "HadoopBloomFilter":
        """Size for ``n_entries`` keys at false-positive rate ``fpp``
        (the standard optimal-m/k formulas Hudi's factory uses)."""
        n = max(1, int(n_entries))
        m = max(8, math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
        k = max(1, round(math.log(2) * m / n))
        return cls(m, k)

    def _positions(self, key: bytes) -> list[int]:
        out = []
        h = 0
        for _ in range(self.nb_hash):
            h = murmur2_32(key, h)
            signed = h - 0x100000000 if h >= 0x80000000 else h
            out.append(abs(signed) % self.vector_size)  # Java abs(h % m)
        return out

    def add(self, key: bytes) -> None:
        for pos in self._positions(key):
            self.bits[pos >> 3] |= 1 << (7 - (pos & 7))

    def might_contain(self, key: bytes) -> bool:
        return all(
            self.bits[pos >> 3] & (1 << (7 - (pos & 7)))
            for pos in self._positions(key)
        )

    def serialize(self) -> bytes:
        return (
            struct.pack(
                ">iibi",
                HADOOP_VERSION,
                self.nb_hash,
                MURMUR_HASH,
                self.vector_size,
            )
            + bytes(self.bits)
        )

    @classmethod
    def deserialize(cls, data: bytes) -> "HadoopBloomFilter":
        version, nb_hash, hash_type, vector_size = struct.unpack(
            ">iibi", data[:13]
        )
        if version != HADOOP_VERSION:
            raise ValueError(
                f"bloom filter Writable version {version} != {HADOOP_VERSION}"
            )
        if hash_type != MURMUR_HASH:
            raise ValueError(
                f"bloom filter hashType {hash_type}: only MURMUR ({MURMUR_HASH}) "
                "is supported"
            )
        f = cls(vector_size, nb_hash)
        nbytes = (vector_size + 7) // 8
        raw = data[13:13 + nbytes]
        if len(raw) != nbytes:
            raise ValueError(
                f"bloom filter bit vector truncated: {len(raw)} < {nbytes}"
            )
        f.bits = bytearray(raw)
        return f
