"""Segment framing — codec registry, null handling, Arrow interop.

Payload grammar (shared by every codec, mirroring the reference's
codec-id-prefix convention `ReaderWriterExtensions.WriteEncodingId`,
`/root/reference/Outcompute.ColumnStore/ReaderWriterExtensions.cs:7-26`):

    varint codec_id
    varint n_rows
    u8 flags                      bit0 = has_nulls
    [if has_nulls] validity bitmap, ceil(n_rows/8) bytes, LSB-first
                   (bit i set = row i valid — Arrow validity convention,
                   the null-capable analogue of the reference's KeyWrapper
                   `ColumnSegmentBuilder.cs:37-67`)
    codec body over the non-null values only

Decode verifies the codec id like the reference's
`CheckEncodingId` (`DictionaryEncoding.cs:278-286`): unknown id -> error.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from . import bitpack, chooser, constant, dictrle, forpack, fsst, plain, sequential
from . import values as V
from .stats import SegmentStats, collect

FLAG_HAS_NULLS = 1

CODEC_NAMES = {
    plain.CODEC_ID: "plain",
    dictrle.CODEC_ID: "dict_rle",
    constant.CODEC_ID: "constant",
    sequential.CODEC_ID: "sequential",
    forpack.FOR_CODEC_ID: "for_bitpack",
    forpack.DELTA_CODEC_ID: "delta_bitpack",
    fsst.CODEC_ID: "fsst",
}
CODEC_IDS = {v: k for k, v in CODEC_NAMES.items()}


# ---------------------------------------------------------------------------
# Arrow <-> physical chunk conversion
# ---------------------------------------------------------------------------

_PA_LOGICAL = {
    pa.int8(): "int8", pa.int16(): "int16", pa.int32(): "int32",
    pa.int64(): "int64", pa.uint8(): "uint8", pa.uint16(): "uint16",
    pa.uint32(): "uint32", pa.uint64(): "uint64",
    pa.float32(): "float32", pa.float64(): "float64", pa.bool_(): "bool",
}


def logical_of(arr: pa.Array) -> str:
    t = arr.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return f"timestamp_{t.unit}"
    if pa.types.is_date32(t):
        return "date32"
    if pa.types.is_decimal(t):
        if t.precision > 18:
            raise TypeError(
                f"decimal precision {t.precision} > 18 unsupported "
                "(unscaled value must fit int64)")
        return f"decimal64_{t.precision}_{t.scale}"
    if t in _PA_LOGICAL:
        return _PA_LOGICAL[t]
    raise TypeError(f"unsupported arrow type {t}")


def _pa_type(logical: str, original: pa.DataType | None = None) -> pa.DataType:
    if logical == "string":
        return pa.large_utf8()
    if logical == "binary":
        return pa.large_binary()
    if logical.startswith("timestamp_"):
        return pa.timestamp(logical.split("_", 1)[1])
    if logical == "date32":
        return pa.date32()
    if logical.startswith("decimal64_"):
        _, p, s = logical.split("_")
        return pa.decimal128(int(p), int(s))
    for t, name in _PA_LOGICAL.items():
        if name == logical:
            return t
    raise TypeError(f"unsupported logical {logical}")


def _decimal_to_unscaled(dense: pa.Array) -> np.ndarray:
    """decimal128 array -> unscaled int64 (precision <= 18 guaranteed:
    the 128-bit two's-complement value is a sign extension of its low
    word, so the little-endian low int64 IS the value)."""
    buf = dense.buffers()[1]
    words = np.frombuffer(buf, dtype="<i8", count=2 * len(dense),
                          offset=dense.offset * 16)
    return words[0::2].copy()


def _unscaled_to_decimal(vals: np.ndarray, typ: pa.DataType,
                         validity: np.ndarray | None,
                         n: int) -> pa.Array:
    full = np.zeros(n, dtype=np.int64)
    if validity is None:
        full[:] = vals
    else:
        full[validity] = vals
    words = np.empty(2 * n, dtype=np.int64)
    words[0::2] = full
    words[1::2] = full >> 63  # sign extension high word
    bufs = [None, pa.py_buffer(words.tobytes())]
    null_count = 0
    if validity is not None:
        bufs[0] = pa.py_buffer(
            np.packbits(validity, bitorder="little").tobytes())
        null_count = int(n - validity.sum())
    return pa.Array.from_buffers(typ, n, bufs, null_count=null_count)


def from_arrow(arr: pa.Array) -> tuple[str, object, np.ndarray | None]:
    """-> (logical, non-null values as FixedChunk/VarChunk, validity or None)."""
    logical = logical_of(arr)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_timestamp(arr.type) and arr.type.tz is not None:
        # session-tz metadata only; the epoch values are already UTC
        arr = arr.cast(pa.timestamp(arr.type.unit))
    validity = None
    if arr.null_count:
        validity = np.asarray(arr.is_valid())
        dense = arr.drop_null()
    else:
        dense = arr
    if logical in V.VAR_LOGICAL:
        target = pa.large_utf8() if logical == "string" else pa.large_binary()
        if dense.type != target:
            dense = dense.cast(target)
        vals = V.var_chunk_from_arrow(dense)
    elif logical.startswith("decimal64_"):
        vals = _decimal_to_unscaled(dense)
    elif logical.startswith("timestamp_") or logical == "date32":
        vals = dense.to_numpy(zero_copy_only=False)
        vals = vals.astype(V.FIXED_LOGICAL[logical])
    elif logical == "bool":
        vals = dense.to_numpy(zero_copy_only=False).astype(np.bool_)
    else:
        vals = dense.to_numpy(zero_copy_only=False).astype(
            V.FIXED_LOGICAL[logical])
    return logical, vals, validity


def to_arrow(vals, validity: np.ndarray | None, logical: str, n: int) -> pa.Array:
    """Re-assemble a (possibly null-bearing) Arrow array from decoded values."""
    if logical in V.VAR_LOGICAL:
        if validity is None:
            return V.var_chunk_to_arrow(vals, logical)
        full_lengths = np.zeros(n, dtype=np.int64)
        full_lengths[validity] = vals.lengths
        off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(full_lengths, out=off[1:])
        vbuf = pa.py_buffer(np.packbits(validity, bitorder="little").tobytes())
        typ = pa.large_utf8() if logical == "string" else pa.large_binary()
        return pa.Array.from_buffers(
            typ, n, [vbuf, pa.py_buffer(off.tobytes()), pa.py_buffer(vals.blob)],
            null_count=int(n - validity.sum()))
    if logical.startswith("decimal64_"):
        return _unscaled_to_decimal(vals, _pa_type(logical), validity, n)
    if validity is None:
        return pa.array(vals, type=_pa_type(logical))
    full = np.zeros(n, dtype=vals.dtype)
    full[validity] = vals
    return pa.array(full, type=_pa_type(logical), mask=~validity)


# ---------------------------------------------------------------------------
# Encode / decode one segment
# ---------------------------------------------------------------------------

_ENCODERS = {
    plain.CODEC_ID: plain.encode,
    dictrle.CODEC_ID: dictrle.encode,
    constant.CODEC_ID: constant.encode,
    sequential.CODEC_ID: sequential.encode,
    forpack.FOR_CODEC_ID: forpack.encode_for,
    forpack.DELTA_CODEC_ID: forpack.encode_delta,
    fsst.CODEC_ID: fsst.encode,
}
_DECODERS = {
    plain.CODEC_ID: plain.decode,
    dictrle.CODEC_ID: dictrle.decode,
    constant.CODEC_ID: constant.decode,
    sequential.CODEC_ID: sequential.decode,
    forpack.FOR_CODEC_ID: forpack.decode_for,
    forpack.DELTA_CODEC_ID: forpack.decode_delta,
    fsst.CODEC_ID: fsst.decode,
}


@dataclass
class EncodedSegment:
    payload: bytes
    codec_id: int
    logical: str
    stats: SegmentStats
    checksum: str  # sha256 over the canonical raw representation


def _raw_checksum(vals, validity: np.ndarray | None, logical: str) -> str:
    h = hashlib.sha256()
    if validity is not None:
        h.update(np.packbits(validity, bitorder="little").tobytes())
    if logical in V.VAR_LOGICAL:
        h.update(vals.lengths.astype("<i8").tobytes())
        h.update(vals.blob)
    else:
        h.update(np.ascontiguousarray(vals).tobytes())
    return h.hexdigest()


def encode_segment(arr: pa.Array, mode: str = chooser.MODE_SIZE,
                   codec: int | None = None) -> EncodedSegment:
    """Encode one Arrow column chunk into a framed segment payload."""
    logical, vals, validity = from_arrow(arr)
    n = len(arr)
    n_nulls = int(n - validity.sum()) if validity is not None else 0
    st = collect(vals, logical, n, n_nulls)
    if codec is None:
        codec = chooser.choose(st, logical, vals, mode)
    if codec == dictrle.CODEC_ID:
        body = dictrle.encode(vals, logical, codes=st.codes, uniques=st.uniques)
    else:
        body = _ENCODERS[codec](vals, logical)
    flags = FLAG_HAS_NULLS if validity is not None else 0
    head = [bitpack.write_varint(codec), bitpack.write_varint(n), bytes([flags])]
    if validity is not None:
        head.append(np.packbits(validity, bitorder="little").tobytes())
    payload = b"".join(head) + body
    st.codes = st.uniques = None  # drop transient artifacts
    return EncodedSegment(payload=payload, codec_id=codec, logical=logical,
                          stats=st, checksum=_raw_checksum(vals, validity, logical))


def decode_segment(payload: bytes | memoryview, logical: str) -> pa.Array:
    """Inverse of encode_segment: framed payload -> Arrow array."""
    body = memoryview(payload)
    codec, pos = bitpack.read_varint(body)
    if codec not in _DECODERS:
        raise ValueError(f"unknown codec id {codec}")
    n, pos = bitpack.read_varint(body, pos)
    flags = body[pos]
    pos += 1
    validity = None
    n_valid = n
    if flags & FLAG_HAS_NULLS:
        nb = (n + 7) // 8
        validity = np.unpackbits(
            np.frombuffer(body, dtype=np.uint8, count=nb, offset=pos),
            count=n, bitorder="little").astype(bool)
        pos += nb
        n_valid = int(validity.sum())
    vals = _DECODERS[codec](body[pos:], n_valid, logical)
    return to_arrow(vals, validity, logical, n)


def verify_checksum(payload: bytes, logical: str, expected: str) -> bool:
    arr = decode_segment(payload, logical)
    logical2, vals, validity = from_arrow(arr)
    return _raw_checksum(vals, validity, logical2) == expected
