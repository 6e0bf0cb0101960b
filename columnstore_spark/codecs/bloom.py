"""Per-segment Bloom filters for point-probe rowgroup pruning.

Min/max bounds (`plans/pruning.py`) prune RANGE-shaped predicates, but
they are useless for equality probes on high-cardinality uniformly
distributed keys — every rowgroup's `conv_id` min/max spans nearly the
whole key space, so `store.query_by_value("conv_id", k)` keeps every
rowgroup. That point lookup ("fetch one conversation") is the single
most common query a transcript store serves at 10^12-turn scale, and
it is exactly what Parquet/Iceberg column Bloom filters exist for. The
reference's analogue is the per-value hash fast path inside
`DefaultEncoding.QueryByValue`
(`/root/reference/Outcompute.ColumnStore/Encodings/DefaultEncoding.cs:104-113`)
— a hash-membership test that skips non-matching scans; here the test
lives in the MANIFEST so whole rowgroups are skipped before any
payload byte is read.

Design (all sizes per segment):

- built only on request (``encode(bloom_columns=[...])``) and only for
  logicals with a canonical byte encoding that the driver can
  reproduce at probe time: strings (UTF-8), binary (raw), plain
  ints/bool (two's-complement-wrapped int64, little-endian — matching
  the stored int64 domain). Other logicals never carry a bloom.
- m = the power of two >= 8 x ndv (min 64, cap 2^19 bits = 64 KiB of
  words); segments with ndv > 2^16 store NULL (no bloom) — at the
  engine's 1M-row rowgroups that admits per-rowgroup key columns like
  conv_id (~50k distinct) while refusing to bloat the manifest for
  near-unique columns (text), where pruning can't help anyway.
- k = 2 probes from one BLAKE2b-128 digest (two independent 63-bit
  halves). At 8 bits/key, FPR ~= (1 - e^(-2/8))^2 ~= 4.9% — a false
  positive only costs reading one extra rowgroup.
- stored as ``array<bigint>`` words in the segment/manifest row; the
  probe-side membership test is pure Catalyst (element_at + bitwise
  AND against literal masks — no UDF, no driver data movement):
  because m is a power of two and a multiple of 64, the bit offset
  within a word, ``h % 64``, is a LITERAL; only the word index
  ``(h >> 6) % size(bloom)`` depends on the segment's filter size.

BLAKE2b (not Spark's xxhash64) because BOTH sides of the test run in
Python we control: the builder hashes dictionary values inside the
encode task, the prober hashes one literal on the driver. A stdlib
hash fully specified by RFC 7693 can never drift between writer and
reader versions, which would silently turn pruning into wrong answers.
"""

from __future__ import annotations

import struct
from hashlib import blake2b

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import Column
from pyspark.sql import functions as F

#: logicals a bloom may be built on (canonical probe encoding exists)
BLOOMABLE = frozenset({
    "string", "binary", "bool",
    "int8", "int16", "int32", "int64",
    "uint8", "uint16", "uint32", "uint64",
})

_MAX_NDV = 1 << 16       # above this, store NULL (near-unique column)
_MAX_BITS = 1 << 19      # 64 KiB of words — manifest weight cap
_BITS_PER_KEY = 8
_MASK63 = (1 << 63) - 1

_U64 = 1 << 64
_I64_MAX = (1 << 63) - 1


def _wrap64(v: int) -> int:
    """Two's-complement wrap into int64 — the stored domain for every
    plain-int logical (matches numpy's int64 view of uint64)."""
    v &= _U64 - 1
    return v - _U64 if v > _I64_MAX else v


def canon_bytes(value, logical: str) -> bytes | None:
    """Canonical byte encoding of one value in `logical`'s domain, or
    None when no sound encoding exists (bloom then can't be used for
    the probe; for non-values like a fractional float against an int
    column the caller's bounds path already yields CANNOT_MATCH)."""
    if logical == "string":
        return value.encode("utf-8") if isinstance(value, str) else None
    if logical == "binary":
        if isinstance(value, (bytes, bytearray, memoryview)):
            return bytes(value)
        return None
    if logical in BLOOMABLE:  # plain ints + bool
        if isinstance(value, bool):
            value = int(value)
        if isinstance(value, (int, np.integer)):
            return struct.pack("<q", _wrap64(int(value)))
        if isinstance(value, (float, np.floating)):
            value = float(value)
            if value != value or value in (float("inf"), float("-inf")):
                return None
            # Spark compares by casting the COLUMN to double; below
            # 2^53 integral doubles <-> int64 is a bijection so the
            # probe identifies exactly one stored key. At |p| >= 2^53
            # MANY stored ints collapse onto one double (and int(p)
            # may not even be among the ones Spark matches) — no
            # single key to hash, so no bloom test (bounds still
            # prune conservatively).
            if abs(value) < float(1 << 53) and float(int(value)) == value:
                return struct.pack("<q", _wrap64(int(value)))
        return None
    return None


def _hash2(data: bytes) -> tuple[int, int]:
    d = blake2b(data, digest_size=16).digest()
    return (int.from_bytes(d[:8], "little") & _MASK63,
            int.from_bytes(d[8:], "little") & _MASK63)


def build_bloom(arr: pa.Array | pa.ChunkedArray,
                logical: str) -> list[int] | None:
    """Bloom words for one column chunk, or None (no filter: logical
    not bloomable, empty/all-null segment, or ndv above the cap)."""
    if logical not in BLOOMABLE:
        return None
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    uniq = pc.unique(arr.drop_null())
    n = len(uniq)
    if n == 0 or n > _MAX_NDV:
        return None
    m = 1 << max(6, (_BITS_PER_KEY * n - 1).bit_length())
    if m > _MAX_BITS:
        return None
    words = np.zeros(m // 64, dtype=np.uint64)
    one = np.uint64(1)
    for v in uniq.to_pylist():
        b = canon_bytes(v, logical)
        if b is None:  # pragma: no cover - bloomable values always encode
            return None
        for h in _hash2(b):
            idx = h % m
            words[idx >> 6] |= one << np.uint64(idx & 63)
    return words.view(np.int64).tolist()


def bloom_keep_cond(value, logical: str) -> Column | None:
    """Catalyst keep-condition for an equality probe against manifest
    rows carrying a `bloom` array<bigint> column. NULL bloom keeps the
    row (filter absent or refused at build time); a present bloom
    keeps the row only if both probe bits are set. Returns None when
    the probe has no canonical encoding at this logical."""
    data = canon_bytes(value, logical)
    if data is None:
        return None
    cond = F.col("bloom").isNull()
    test = F.lit(True)
    for h in _hash2(data):
        word = F.element_at(
            "bloom",
            (F.pmod(F.lit(h >> 6), F.size("bloom")) + F.lit(1))
            .cast("int"))
        mask = 1 << (h & 63)
        if mask > _I64_MAX:
            mask -= _U64  # the sign bit as a signed long literal
        test = test & (word.bitwiseAND(F.lit(mask).cast("long")) != 0)
    return cond | test
