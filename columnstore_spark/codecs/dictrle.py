"""DICT_RLE codec — dictionary + run-length encoding, codec id 1.

Re-expression of the reference's ``DictionaryEncoding`` ("smaller payload
... for sequences with low value cardinality",
`/root/reference/Outcompute.ColumnStore/Encodings/DictionaryEncoding.cs:6-105`):
one pass builds a first-appearance-ordered dictionary and adjacent-run list
`(dict_index, run_length)`. The reference writes runs as varints
(`DictionaryEncoding.cs:84-91`); we bit-pack both run arrays at the minimal
fixed width instead, which vectorizes (numpy shifts) and strictly beats the
reference's golden sizes on like profiles (e.g. 1M x `i%1000` runs-of-1:
reference 2,874,945 B, ours ~ dict 4000 B + 1M*(10+0)bits ~ 1.25 MB).

First-appearance dictionary order matches ``pandas.factorize`` /
``pyarrow.Array.dictionary_encode`` exactly, like the reference's insert-
ordered dictionary (`DictionaryEncoding.cs:77-81`).

Body grammar (after the shared segment framing):
    varint dict_size
    dict values           (plain fixed / var encoding, first-appearance order)
    varint n_runs
    u8 idx_width, u8 len_width
    packed run dict-indices   [idx_width bits each]
    packed (run_length - 1)   [len_width bits each]
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import bitpack
from . import values as V

CODEC_ID = 1


def factorize(vals, logical: str) -> tuple[np.ndarray, object]:
    """(codes int64, uniques) in first-appearance order, vectorized."""
    if logical in V.VAR_LOGICAL:
        arr = V.var_chunk_to_arrow(vals, logical)
        d = arr.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniques = V.var_chunk_from_arrow(
            d.dictionary.cast(pa.large_utf8() if logical == "string" else pa.large_binary())
        )
        return codes, uniques
    import pandas as pd

    if logical in ("float32", "float64"):
        # factorize the bit patterns: distinct NaN payloads and -0.0 vs 0.0
        # must stay distinct for the bit-identical round-trip guarantee
        bits = vals.view("<u4" if logical == "float32" else "<u8")
        codes, uniq_bits = pd.factorize(bits, use_na_sentinel=False)
        uniques = np.asarray(uniq_bits, dtype=bits.dtype).view(vals.dtype)
        return codes.astype(np.int64), uniques
    # use_na_sentinel=False: float NaN gets a real dictionary slot (nulls
    # were already stripped by the segment layer; remaining NaNs are values)
    codes, uniques = pd.factorize(vals, use_na_sentinel=False)
    return codes.astype(np.int64), np.asarray(uniques, dtype=vals.dtype)


def run_lengths(codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Adjacent-run detection: (run dict-indices, run lengths)."""
    n = codes.size
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    change = np.flatnonzero(codes[1:] != codes[:-1])
    starts = np.concatenate(([0], change + 1))
    ends = np.concatenate((change + 1, [n]))
    return codes[starts], ends - starts


def encode(vals, logical: str, codes: np.ndarray | None = None,
           uniques=None) -> bytes:
    if codes is None:
        codes, uniques = factorize(vals, logical)
    run_idx, run_len = run_lengths(codes)
    dict_size = int(len(uniques.lengths) if isinstance(uniques, V.VarChunk) else len(uniques))
    out = [bitpack.write_varint(dict_size)]
    if logical in V.VAR_LOGICAL:
        out.append(V.write_var(uniques))
    else:
        out.append(V.write_fixed(uniques, logical))
    n_runs = int(run_idx.size)
    out.append(bitpack.write_varint(n_runs))
    iw = bitpack.bits_needed(dict_size - 1) if dict_size > 1 else 0
    lw = bitpack.bits_needed(int(run_len.max()) - 1) if n_runs else 0
    out.append(bytes([iw, lw]))
    out.append(bitpack.pack_bits(run_idx.view(np.uint64), iw))
    out.append(bitpack.pack_bits((run_len - 1).view(np.uint64), lw))
    return b"".join(out)


def parse_runs(body: memoryview, logical: str):
    """Parse a dict_rle body -> (uniques, run_idx, run_len). The ONE
    reader of the body grammar: decode below and the encoded-query
    fast paths (codecs/query.py) both ride it, so a grammar change
    lands in exactly one place."""
    dict_size, pos = bitpack.read_varint(body)
    if logical in V.VAR_LOGICAL:
        uniques, consumed = V.read_var(body[pos:], dict_size)
        pos += consumed
    else:
        dt = np.dtype(V.FIXED_LOGICAL[logical])
        uniques = np.frombuffer(body, dtype=dt, count=dict_size, offset=pos)
        pos += dict_size * dt.itemsize
    n_runs, pos = bitpack.read_varint(body, pos)
    iw, lw = body[pos], body[pos + 1]
    pos += 2
    run_idx = bitpack.unpack_bits(body[pos:], n_runs, iw).astype(np.int64)
    pos += bitpack.packed_size(n_runs, iw)
    run_len = bitpack.unpack_bits(body[pos:], n_runs, lw).astype(np.int64) + 1
    return uniques, run_idx, run_len


def decode(body: memoryview, n: int, logical: str):
    uniques, run_idx, run_len = parse_runs(body, logical)
    codes = np.repeat(run_idx, run_len)
    if codes.size != n:
        raise ValueError(f"dict_rle decode: expected {n} rows, got {codes.size}")
    if logical in V.VAR_LOGICAL:
        darr = V.var_chunk_to_arrow(uniques, logical)
        expanded = darr.take(pa.array(codes))
        return V.var_chunk_from_arrow(expanded)
    return uniques[codes]


def estimate_size(n: int, dict_size: int, n_runs: int, dict_raw_bytes: int,
                  max_run_len: int) -> int:
    iw = bitpack.bits_needed(dict_size - 1) if dict_size > 1 else 0
    lw = bitpack.bits_needed(max_run_len - 1) if max_run_len > 1 else 0
    return (10 + dict_raw_bytes + bitpack.packed_size(n_runs, iw)
            + bitpack.packed_size(n_runs, lw))
