"""PLAIN codec — uncompressed fallback, codec id 0.

Reference analogue: ``DefaultEncoding`` ("largest payload of all encodings"
yet correct for any type / very high cardinality —
`/root/reference/Outcompute.ColumnStore/Encodings/DefaultEncoding.cs:6-56`).
The reference writes a per-value jenkins hash + length header to allow
skip-scans; we don't need per-value headers because segment-level pruning
happens from manifest stats, so PLAIN is just the raw buffer — strictly
smaller than the reference's Default encoding on every profile.
"""

from __future__ import annotations


from . import values as V

CODEC_ID = 0


def encode(vals, logical: str) -> bytes:
    if logical in V.VAR_LOGICAL:
        return V.write_var(vals)
    return V.write_fixed(vals, logical)


def decode(body: memoryview, n: int, logical: str):
    if logical in V.VAR_LOGICAL:
        chunk, _ = V.read_var(body, n)
        return chunk
    return V.read_fixed(body, n, logical).copy()
