"""Physical value representations shared by all codecs (numpy + Arrow only).

Two physical shapes cover every logical type we store:

* ``FixedChunk`` — a numpy array of a fixed-width dtype (ints, floats,
  bools, datetimes viewed as int64).
* ``VarChunk``  — variable-length byte strings as (lengths, blob), the
  Arrow string layout without per-value Python objects.

The reference serializes values one at a time through Orleans
(`/root/reference/Outcompute.ColumnStore/Encodings/DefaultEncoding.cs:29-56`);
we instead move whole buffers, which is what makes the Spark/Arrow path
vectorized end-to-end (BASELINE.json input_hint: "no per-row Python").
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from . import bitpack

# Canonical logical type names stored in the manifest. Decimal columns
# (precision <= 18) use parametrized names "decimal64_<p>_<s>" whose
# physical form is the unscaled int64 — resolved lazily by __missing__.
class _LogicalMap(dict):
    def __missing__(self, key: str) -> str:
        if key.startswith("decimal64_"):
            self[key] = "<i8"
            return "<i8"
        raise KeyError(key)


class _IntLogicalSet(set):
    def __contains__(self, key) -> bool:  # noqa: D105
        return (set.__contains__(self, key)
                or (isinstance(key, str) and key.startswith("decimal64_")))


FIXED_LOGICAL = _LogicalMap({
    "int8": "<i1",
    "int16": "<i2",
    "int32": "<i4",
    "int64": "<i8",
    "uint8": "<u1",
    "uint16": "<u2",
    "uint32": "<u4",
    "uint64": "<u8",
    "float32": "<f4",
    "float64": "<f8",
    "bool": "|b1",
    "timestamp_s": "<M8[s]",
    "timestamp_ms": "<M8[ms]",
    "timestamp_us": "<M8[us]",
    "timestamp_ns": "<M8[ns]",
    "date32": "<M8[D]",
})
VAR_LOGICAL = {"string", "binary"}

_NP_TO_LOGICAL = {np.dtype(v): k for k, v in FIXED_LOGICAL.items()}

INT_LOGICAL = _IntLogicalSet({
    "int8", "int16", "int32", "int64", "uint8", "uint16", "uint32",
    "uint64", "bool", "timestamp_s", "timestamp_ms", "timestamp_us",
    "timestamp_ns", "date32"})


@dataclass
class VarChunk:
    """Variable-length values: lengths[i] bytes of blob per value.

    `blob` is bytes-LIKE (bytes or a zero-copy memoryview over the
    source Arrow buffer / segment payload — the view keeps its
    exporter alive). Consumers must treat it as a read-only buffer:
    numpy frombuffer, hashlib update, pa.py_buffer, len() and
    b"".join all accept either; anything needing bytes semantics
    (repeat, concat with +) must wrap in bytes() first."""

    lengths: np.ndarray  # int64
    blob: bytes | memoryview

    @property
    def size(self) -> int:
        return int(self.lengths.size)

    def nbytes_raw(self) -> int:
        return len(self.blob) + 4 * self.size  # arrow offsets-equivalent

    def to_offsets(self) -> np.ndarray:
        off = np.zeros(self.size + 1, dtype=np.int64)
        np.cumsum(self.lengths, out=off[1:])
        return off


def var_chunk_from_arrow(arr: pa.Array) -> VarChunk:
    """Extract (lengths, blob) from a no-null Arrow string/binary array."""
    if arr.null_count:
        raise ValueError("var_chunk_from_arrow requires null-free array")
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=off_dtype,
                            count=len(arr) + 1 + arr.offset)[arr.offset:]
    data = buffers[2] if buffers[2] is not None else b""
    # zero-copy: the memoryview keeps the Arrow buffer alive; the
    # bytes() copy here was ~10% of single-core encode on text
    blob = memoryview(data)[int(offsets[0]):int(offsets[-1])]
    lengths = np.diff(offsets.astype(np.int64))
    return VarChunk(lengths=lengths, blob=blob)


def var_chunk_to_arrow(chunk: VarChunk, logical: str) -> pa.Array:
    """Rebuild an Arrow large_string/large_binary array from a VarChunk."""
    off = chunk.to_offsets()
    typ = pa.large_utf8() if logical == "string" else pa.large_binary()
    return pa.Array.from_buffers(
        typ, chunk.size,
        [None, pa.py_buffer(off.tobytes()), pa.py_buffer(chunk.blob)],
    )


# ---------------------------------------------------------------------------
# Raw (uncompressed) serialization of a value array — the PLAIN body and the
# dictionary-key encoding reuse this.
# ---------------------------------------------------------------------------


def write_fixed(values: np.ndarray, logical: str) -> bytes:
    return np.ascontiguousarray(values, dtype=FIXED_LOGICAL[logical]).tobytes()


def read_fixed(buf: bytes | memoryview, n: int, logical: str) -> np.ndarray:
    dt = np.dtype(FIXED_LOGICAL[logical])
    return np.frombuffer(buf, dtype=dt, count=n)


def write_var(chunk: VarChunk) -> bytes:
    """lengths as a varint stream + blob (self-delimiting given n)."""
    lens = bitpack.varint_encode_array(chunk.lengths.astype(np.uint64))
    # join, not +: blob may be a zero-copy memoryview
    return b"".join((bitpack.write_varint(len(lens)), lens, chunk.blob))


def var_encoded_size(chunk: VarChunk) -> int:
    """Exact byte size write_var(chunk) would produce, WITHOUT
    encoding — the chooser's size arithmetic must score candidates by
    what they actually write (varint length stream, ~1 B/short value),
    not the 4 B/value Arrow-offset-equivalent `nbytes_raw` reports."""
    lens_bytes = int(bitpack.varint_nbytes(
        chunk.lengths.astype(np.uint64, copy=False)).sum())
    return len(bitpack.write_varint(lens_bytes)) + lens_bytes \
        + len(chunk.blob)


def read_var(buf: memoryview, n: int) -> tuple[VarChunk, int]:
    lens_size, pos = bitpack.read_varint(buf)
    lengths, _ = bitpack.varint_decode_array(buf[pos:pos + lens_size], n)
    lengths = lengths.astype(np.int64)
    pos += lens_size
    blob_size = int(lengths.sum())
    blob = buf[pos:pos + blob_size]  # zero-copy view over the payload
    return VarChunk(lengths=lengths, blob=blob), pos + blob_size


def raw_size(values, logical: str) -> int:
    """Uncompressed byte size used as the compression-ratio denominator."""
    if logical in VAR_LOGICAL:
        return values.nbytes_raw()
    return int(np.dtype(FIXED_LOGICAL[logical]).itemsize) * int(values.size)


def logical_from_numpy(dtype: np.dtype) -> str:
    if dtype in _NP_TO_LOGICAL:
        return _NP_TO_LOGICAL[dtype]
    raise TypeError(f"unsupported numpy dtype {dtype}")


def as_int64(values: np.ndarray, logical: str) -> np.ndarray:
    """View any integer-family logical as int64 for FoR/delta math."""
    if logical.startswith("timestamp") or logical == "date32":
        return values.view("<i8") if values.dtype.kind == "M" else values.astype(np.int64)
    if logical == "bool":
        return values.astype(np.int64)
    return values.astype(np.int64, copy=False)


def from_int64(values: np.ndarray, logical: str) -> np.ndarray:
    dt = np.dtype(FIXED_LOGICAL[logical])
    if dt.kind == "M":
        return values.astype("<i8").view(dt)
    if logical == "bool":
        return values.astype(np.bool_)
    return values.astype(dt)
