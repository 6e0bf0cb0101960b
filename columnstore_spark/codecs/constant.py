"""CONSTANT codec — single distinct value, codec id 2.

The reference's best case (Dictionary+RLE of a constant 1M-value column
= 12 bytes, `DictionaryEncodingTests.cs:75`). Storing the one value once
beats even that ceiling, which matters because BASELINE.json requires
total compressed size <= the reference's per-column sizes.
"""

from __future__ import annotations

import numpy as np

from . import values as V

CODEC_ID = 2


def encode(vals, logical: str) -> bytes:
    if logical in V.VAR_LOGICAL:
        one = V.VarChunk(lengths=vals.lengths[:1], blob=vals.blob[: int(vals.lengths[0])] if vals.size else b"")
        return V.write_var(one)
    return V.write_fixed(vals[:1], logical)


def decode(body: memoryview, n: int, logical: str):
    if logical in V.VAR_LOGICAL:
        one, _ = V.read_var(body, 1)
        L = int(one.lengths[0])
        return V.VarChunk(
            lengths=np.full(n, L, dtype=np.int64),
            blob=bytes(one.blob) * n,  # blob may be a memoryview
        )
    v = V.read_fixed(body, 1, logical)
    return np.full(n, v[0], dtype=v.dtype)
