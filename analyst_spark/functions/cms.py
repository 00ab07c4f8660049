"""Count-Min Sketch probe: a pure-Python reader for Spark's public
CountMinSketch serialization, plus a bit-exact model for tests.

Spark's `count_min_sketch` SQL aggregate builds the classic Cormode/
Muthukrishnan CMS (depth = ceil(-ln(1-confidence)/ln 2) rows, width
= ceil(2/eps) counters) JVM-side with map-side partial merge — the
aggregation buffer IS the fixed-size table and merging is
element-wise addition, so the estimate is deterministic for a given
dataset regardless of partitioning or arrival order. The driver
receives one ~MB blob no matter how many trillions of rows were
counted; this module probes that blob without a JVM round-trip.

Serialized layout (org.apache.spark.util.sketch.CountMinSketchImpl
`writeTo`, format version 1, DataOutputStream => big-endian):

    int32  version (1)
    int64  totalCount
    int32  depth
    int32  width
    int64  hashA[depth]        (only used by the long-item path)
    int64  table[depth][width]

String/binary items bucket with Spark's Murmur3_x86_32
`hashUnsafeBytes` over the UTF-8 bytes: the aligned prefix hashes as
little-endian 4-byte words, then each REMAINING byte is sign-extended
and mixed as a full word — deliberately different from the standard
murmur3 tail (Spark kept the quirk for compatibility; reimplemented
here verbatim). Rows double-hash stream-lib style:
``bucket[i] = abs((h1 + i*h2) % width)`` with Java int overflow and
Java's sign-preserving ``%``, where ``h1 = murmur(item, 0)`` and
``h2 = murmur(item, h1)``.

tests/test_cms.py proves the port bit-for-bit: a pure-Python
:class:`CmsModel` fed the same tokens reproduces the JVM blob's
table exactly.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & _M32
    k1 = _rotl32(k1, 15)
    return (k1 * 0x1B873593) & _M32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _M32


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1


def murmur3_x86_32(data: bytes, seed: int) -> int:
    """Spark's Murmur3_x86_32.hashUnsafeBytes (NOT standard murmur3:
    the unaligned tail mixes each remaining byte sign-extended as a
    whole word). Returns a signed Java int."""
    h1 = seed & _M32
    n_words = len(data) // 4
    for i in range(n_words):
        (w,) = struct.unpack_from("<I", data, i * 4)
        h1 = _mix_h1(h1, _mix_k1(w))
    for i in range(n_words * 4, len(data)):
        b = data[i]
        if b >= 128:  # Java bytes are signed; sign-extend before mixing
            b -= 256
        h1 = _mix_h1(h1, _mix_k1(b & _M32))
    res = _fmix(h1, len(data))
    return res - (1 << 32) if res >= (1 << 31) else res


def _java_int(x: int) -> int:
    x &= _M32
    return x - (1 << 32) if x >= (1 << 31) else x


def _hash_buckets(item: bytes, depth: int, width: int) -> list[int]:
    h1 = murmur3_x86_32(item, 0)
    h2 = murmur3_x86_32(item, h1)
    out = []
    for i in range(depth):
        s = _java_int(h1 + i * h2)
        # Java's % keeps the dividend's sign; Math.abs is applied after
        r = s % width if s >= 0 else -((-s) % width)
        out.append(abs(r))
    return out


@dataclass
class Cms:
    total: int
    depth: int
    width: int
    hash_a: tuple[int, ...]
    table: list[list[int]]


def cms_parse(blob: bytes) -> Cms:
    """Decode a `count_min_sketch(...)` aggregate result blob."""
    (version,) = struct.unpack_from(">i", blob, 0)
    if version != 1:
        raise ValueError(f"unsupported CountMinSketch version {version}")
    (total,) = struct.unpack_from(">q", blob, 4)
    depth, width = struct.unpack_from(">ii", blob, 12)
    pos = 20
    hash_a = struct.unpack_from(f">{depth}q", blob, pos)
    pos += 8 * depth
    table = []
    for _ in range(depth):
        table.append(list(struct.unpack_from(f">{width}q", blob, pos)))
        pos += 8 * width
    if pos != len(blob):
        raise ValueError(f"trailing bytes: consumed {pos} of {len(blob)}")
    return Cms(total, depth, width, tuple(hash_a), table)


def cms_estimate(cms: Cms, item: str | bytes) -> int:
    """Point frequency estimate: min over the item's row buckets.
    Never underestimates; overestimates by <= eps*total with
    probability >= confidence (per probe)."""
    data = item.encode("utf-8") if isinstance(item, str) else item
    bks = _hash_buckets(data, cms.depth, cms.width)
    return min(cms.table[i][b] for i, b in enumerate(bks))


class CmsModel:
    """Pure-Python CMS with Spark's exact bucketing — the parity
    oracle for the blob reader (same depth/width/hash chain; hashA is
    long-item-only state and not modelled)."""

    def __init__(self, depth: int, width: int):
        self.depth = depth
        self.width = width
        self.total = 0
        self.table = [[0] * width for _ in range(depth)]

    def add(self, item: str | bytes, count: int = 1) -> None:
        data = item.encode("utf-8") if isinstance(item, str) else item
        for i, b in enumerate(_hash_buckets(data, self.depth, self.width)):
            self.table[i][b] += count
        self.total += count
