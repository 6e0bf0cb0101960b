"""FOR_BITPACK (11) and DELTA_BITPACK (12) — integer/timestamp codecs.

These complete the reference's *designed but unfinished* fast integer
path: ``SequentialEncoding`` ("small unmanaged types",
`/root/reference/Outcompute.ColumnStore/Encodings/SequentialEncoding.cs:3-7`)
plus the planned min/max stats vector (`Sequences/Stats.cs:3`) point at a
frame-of-reference scheme the reference never built. We subtract the
segment min (FoR) or the previous value (DELTA), zigzag the residuals
(fixing the negative-value varint blowup of `Int32SequentialEncoding.cs`),
and bit-pack at the minimal fixed width — all numpy-vectorized.

FOR body:   varint zigzag(min); u8 width; packed (v - min)
DELTA body: varint zigzag(first); varint zigzag(min_delta); u8 width;
            packed (delta - min_delta)        [n-1 deltas]
"""

from __future__ import annotations

import numpy as np

from . import bitpack
from . import values as V

FOR_CODEC_ID = 11
DELTA_CODEC_ID = 12


def _zz1(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v >= 0 else ((v << 1) ^ -1) & ((1 << 64) - 1)


def _unzz1(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def encode_for(vals: np.ndarray, logical: str) -> bytes:
    iv = V.as_int64(vals, logical)
    lo = int(iv.min()) if iv.size else 0
    span = int(iv.max()) - lo if iv.size else 0
    width = bitpack.bits_needed(span)
    rel = (iv - lo).view(np.uint64)
    return (bitpack.write_varint(_zz1(lo)) + bytes([width])
            + bitpack.pack_bits(rel, width))


def decode_for(body: memoryview, n: int, logical: str) -> np.ndarray:
    zz_lo, pos = bitpack.read_varint(body)
    lo = _unzz1(zz_lo)
    width = body[pos]
    pos += 1
    rel = bitpack.unpack_bits(body[pos:], n, width).view(np.int64)
    return V.from_int64(rel + lo, logical)


def encode_delta(vals: np.ndarray, logical: str) -> bytes:
    iv = V.as_int64(vals, logical)
    first = int(iv[0]) if iv.size else 0
    d = np.diff(iv)
    lo = int(d.min()) if d.size else 0
    span = int(d.max()) - lo if d.size else 0
    width = bitpack.bits_needed(span)
    rel = (d - lo).view(np.uint64)
    return (bitpack.write_varint(_zz1(first)) + bitpack.write_varint(_zz1(lo))
            + bytes([width]) + bitpack.pack_bits(rel, width))


def decode_delta(body: memoryview, n: int, logical: str) -> np.ndarray:
    zz_first, pos = bitpack.read_varint(body)
    zz_lo, pos = bitpack.read_varint(body, pos)
    first, lo = _unzz1(zz_first), _unzz1(zz_lo)
    width = body[pos]
    pos += 1
    if n == 0:
        return V.from_int64(np.empty(0, dtype=np.int64), logical)
    rel = bitpack.unpack_bits(body[pos:], n - 1, width).view(np.int64)
    out = np.empty(n, dtype=np.int64)
    out[0] = first
    np.cumsum(rel + lo, out=out[1:])
    out[1:] += first
    return V.from_int64(out, logical)


def estimate_for_size(n: int, lo: int, hi: int) -> int:
    width = bitpack.bits_needed(hi - lo)
    return 12 + bitpack.packed_size(n, width)


def estimate_delta_size(n: int, dlo: int, dhi: int) -> int:
    width = bitpack.bits_needed(dhi - dlo)
    return 20 + bitpack.packed_size(max(n - 1, 0), width)
