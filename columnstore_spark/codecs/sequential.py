"""SEQUENTIAL codec — headerless per-value varint stream, codec id 10.

Byte-exact re-expression of the reference's ``SequentialEncoding`` for
integers (`/root/reference/Outcompute.ColumnStore/Encodings/SequentialEncoding.cs:27-44`,
int32 specialization `Int32SequentialEncoding.cs:6-23`): each value cast to
its unsigned same-width form and written as a LEB128 varint. This keeps the
reference's negative-value blowup (3 negative int32 -> 5 bytes each,
`SequentialEncodingTests.cs:70-71`) on purpose — it exists for golden-size
parity evidence. Production integer columns use FOR/DELTA bit-pack instead
(codecs 11/12), which fix that blowup with zigzag.

Golden parity (codec id byte + varint(count) + stream):
1M const int32 -> 1,000,004 B; wave x%10000 -> 1,987,204 B;
1..1M distinct -> 2,983,494 B (`SequentialEncodingTests.cs:74-83`).
"""

from __future__ import annotations

import numpy as np

from . import bitpack
from . import values as V

CODEC_ID = 10

_WIDTH_MASK = {
    "int8": 0xFF, "uint8": 0xFF,
    "int16": 0xFFFF, "uint16": 0xFFFF,
    "int32": 0xFFFFFFFF, "uint32": 0xFFFFFFFF,
}


def _mask(logical: str) -> int:
    return _WIDTH_MASK.get(logical, 0xFFFFFFFFFFFFFFFF)


def encode(vals: np.ndarray, logical: str) -> bytes:
    iv = V.as_int64(vals, logical)
    u = iv.view(np.uint64) & np.uint64(_mask(logical))
    return bitpack.varint_encode_array(u)


def decode(body: memoryview, n: int, logical: str) -> np.ndarray:
    u, _ = bitpack.varint_decode_array(body, n)
    m = _mask(logical)
    if m != 0xFFFFFFFFFFFFFFFF:
        # sign-extend from the unsigned same-width cast
        width_bits = m.bit_length()
        sign_bit = np.uint64(1) << np.uint64(width_bits - 1)
        iv = u.astype(np.int64)
        neg = (u & sign_bit) != 0
        iv[neg] -= (m + 1)
    else:
        iv = u.view(np.int64)
    return V.from_int64(iv, logical)
