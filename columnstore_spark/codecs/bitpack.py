"""Vectorized bit-packing and varint primitives (numpy only, no Spark).

These are the byte-level building blocks shared by every codec. The
reference engine writes 7-bit varints for *all* integer payloads
(`/root/reference/Outcompute.ColumnStore/ReaderWriterExtensions.cs:58-174`);
we keep varints for small headers (cheap, compact) but bulk integer data
uses fixed-width bit-packing, which — unlike per-value varint — is fully
vectorizable with numpy shifts and compresses better after
frame-of-reference / zigzag transforms.

All functions are pure and deterministic.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Scalar varint (LEB128, 7-bit groups) — used for small headers only.
# Mirrors ReaderWriterExtensions.WriteVarUInt32 semantics.
# ---------------------------------------------------------------------------


def write_varint(value: int) -> bytes:
    """Encode one unsigned int as LEB128 bytes."""
    if value < 0:
        raise ValueError("varint requires non-negative value")
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def read_varint(buf: bytes | memoryview, pos: int = 0) -> tuple[int, int]:
    """Decode one LEB128 varint; returns (value, next_pos)."""
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7


def zigzag_encode(values: np.ndarray) -> np.ndarray:
    """Map signed int64 -> unsigned so small magnitudes stay small.

    Fixes the reference's negative-value varint blowup
    (`Int32SequentialEncoding.cs:14-21`, 3 negatives -> 5 bytes each).
    """
    v = values.astype(np.int64, copy=False)
    return ((v << 1) ^ (v >> 63)).view(np.uint64)


def zigzag_decode(values: np.ndarray) -> np.ndarray:
    u = values.astype(np.uint64, copy=False)
    return ((u >> np.uint64(1)).astype(np.int64)) ^ -(u & np.uint64(1)).astype(np.int64)


# ---------------------------------------------------------------------------
# Vectorized varint streams (used by the reference-parity Sequential codec
# and by length headers in string payloads).
# ---------------------------------------------------------------------------

_VARINT_THRESHOLDS = [np.uint64(1) << np.uint64(7 * k) for k in range(1, 10)]


def varint_nbytes(values: np.ndarray) -> np.ndarray:
    """Per-value LEB128 byte length (vectorized)."""
    v = values.astype(np.uint64, copy=False)
    n = np.ones(v.shape, dtype=np.int64)
    for t in _VARINT_THRESHOLDS:
        n += (v >= t).astype(np.int64)
    return n


def varint_encode_array(values: np.ndarray) -> bytes:
    """LEB128-encode an array of unsigned ints into one byte stream."""
    v = values.astype(np.uint64, copy=False)
    if v.size == 0:
        return b""
    nbytes = varint_nbytes(v)
    offsets = np.zeros(v.size, dtype=np.int64)
    np.cumsum(nbytes[:-1], out=offsets[1:])
    total = int(offsets[-1] + nbytes[-1])
    out = np.zeros(total, dtype=np.uint8)
    max_b = int(nbytes.max())
    for j in range(max_b):
        mask = nbytes > j
        idx = offsets[mask] + j
        chunk = (v[mask] >> np.uint64(7 * j)).astype(np.uint64) & np.uint64(0x7F)
        cont = (nbytes[mask] - 1 > j).astype(np.uint8) * np.uint8(0x80)
        out[idx] = chunk.astype(np.uint8) | cont
    return out.tobytes()


def varint_decode_array(buf: bytes | memoryview, count: int) -> tuple[np.ndarray, int]:
    """Decode `count` LEB128 varints from buf; returns (uint64 array, bytes consumed)."""
    if count == 0:
        return np.empty(0, dtype=np.uint64), 0
    raw = np.frombuffer(buf, dtype=np.uint8)
    is_last = (raw & 0x80) == 0
    ends = np.flatnonzero(is_last)
    if ends.size < count:
        raise ValueError("varint stream truncated")
    ends = ends[:count]
    consumed = int(ends[-1]) + 1
    raw = raw[:consumed]
    is_last = is_last[:consumed]
    starts = np.empty(count, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    # value index for each byte, and position of the byte within its value
    value_idx = np.zeros(consumed, dtype=np.int64)
    np.add.at(value_idx, starts[1:], 1)
    value_idx = np.cumsum(value_idx)
    within = np.arange(consumed, dtype=np.int64) - starts[value_idx]
    out = np.zeros(count, dtype=np.uint64)
    payload = (raw & 0x7F).astype(np.uint64)
    max_w = int(within.max()) if consumed else 0
    if max_w >= 10:
        # a uint64 LEB128 varint is at most 10 bytes; longer means a
        # corrupted stream (e.g. a run of continuation bytes). numpy
        # leaves shifts >= 64 UNDEFINED, so without this check the
        # decode would return silent garbage instead of raising.
        raise ValueError("varint longer than 10 bytes: corrupt stream")
    for k in range(max_w + 1):
        sel = within == k
        out[value_idx[sel]] |= payload[sel] << np.uint64(7 * k)
    return out, consumed


# ---------------------------------------------------------------------------
# Fixed-width bit-packing (LSB-first), fully vectorized.
# ---------------------------------------------------------------------------


def bits_needed(max_value: int) -> int:
    """Minimum bit width to represent values in [0, max_value]."""
    if max_value < 0:
        raise ValueError("bits_needed requires non-negative max")
    return int(max_value).bit_length()


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """Pack unsigned ints into `width` bits each, LSB-first bit order.

    Two kernels behind one wire format: narrow widths (<= 8) expand to
    a bit matrix and ride ``np.packbits`` (cheap when the matrix is
    small); wider values write 64-bit lanes directly — each value's
    `width` bits span at most two words, and a stride of
    ``128 // width + 1`` makes the per-residue scatters collision-free,
    so the whole pack is ~15 vectorized OR passes instead of an
    n x width single-bit matrix."""
    if width == 0 or values.size == 0:
        return b""
    if width > 64:
        raise ValueError(f"width {width} > 64")
    v = values.astype(np.uint64, copy=False)
    n = v.size
    if width <= 8:
        shifts = np.arange(width, dtype=np.uint64)
        bits = ((v[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
        return np.packbits(bits.ravel(), bitorder="little").tobytes()
    w64 = np.uint64(width)
    p = np.arange(n, dtype=np.uint64) * w64
    wi = (p >> np.uint64(6)).astype(np.int64)
    off = p & np.uint64(63)
    lo = v << off
    # off == 0 would shift by 64 (undefined); the & 63 makes it a
    # no-op shift whose result the where() discards
    hi = np.where(off > np.uint64(0),
                  v >> ((np.uint64(64) - off) & np.uint64(63)),
                  np.uint64(0))
    out = np.zeros(int((n * width + 63) // 64) + 1, dtype=np.uint64)
    stride = 128 // width + 1
    for r in range(stride):
        sl = slice(r, None, stride)
        idx = wi[sl]
        out[idx] |= lo[sl]
        out[idx + 1] |= hi[sl]
    # explicit little-endian words: the wire format must match the
    # np.packbits(bitorder="little") stream the <=8-width path (and all
    # pre-rewrite data) produces, independent of host byte order
    return out.astype("<u8", copy=False).tobytes()[: (n * width + 7) // 8]


def unpack_bits(buf: bytes | memoryview, count: int, width: int) -> np.ndarray:
    """Inverse of pack_bits; returns uint64 array of length `count`.

    Word-gather kernel: each value is (words[w] >> off) | (words[w+1]
    << (64-off)) masked to `width` bits — three vectorized passes, no
    n x width bit matrix."""
    if width == 0 or count == 0:
        return np.zeros(count, dtype=np.uint64)
    total_bytes = (count * width + 7) // 8
    raw = np.frombuffer(buf, dtype=np.uint8, count=total_bytes)
    full = total_bytes // 8 * 8
    words = np.zeros(total_bytes // 8 + 2, dtype=np.uint64)
    # wire words are little-endian (see pack_bits); free on LE hosts
    words[: total_bytes // 8] = np.frombuffer(raw[:full], dtype="<u8")
    if total_bytes > full:  # partial trailing word
        t = np.zeros(8, dtype=np.uint8)
        t[: total_bytes - full] = raw[full:]
        words[total_bytes // 8] = t.view("<u8")[0]
    p = np.arange(count, dtype=np.uint64) * np.uint64(width)
    wi = (p >> np.uint64(6)).astype(np.int64)
    off = p & np.uint64(63)
    lo = words[wi] >> off
    hi = np.where(off > np.uint64(0),
                  words[wi + 1] << ((np.uint64(64) - off) & np.uint64(63)),
                  np.uint64(0))
    mask = np.uint64(0xFFFFFFFFFFFFFFFF) if width == 64 else np.uint64(
        (1 << width) - 1)
    return (lo | hi) & mask


def packed_size(count: int, width: int) -> int:
    """Bytes used by pack_bits for `count` values at `width` bits."""
    return (count * width + 7) // 8
