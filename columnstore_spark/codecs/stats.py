"""Per-segment statistics — the codec chooser's inputs and the manifest's
payload.

Mirrors the reference's stats tree semantics exactly but computed
vectorized per chunk instead of per-row on ingest:
- n_distinct / n_default (null) / n_rows: `DeltaRowGroupGenerator.cs:43-58`,
  `ColumnSegmentStats.cs:7-12`
- n_runs: `ColumnSegmentBuilder.cs:112-135` (run-range building)
- min/max: the planned `Sequences/Stats.cs:3`
  (`record Stats<T>(int Count, int DefaultCount, T Min, T Max)`).

All counts are exact (each segment is one bounded chunk), not approximate.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from . import dictrle
from . import values as V


@dataclass
class SegmentStats:
    n_rows: int
    n_nulls: int
    n_distinct: int          # over non-null values
    n_runs: int              # adjacent runs over non-null values
    min_repr: str | None     # string repr for the manifest (display; pruning
    max_repr: str | None     # uses it only for ASCII string columns)
    raw_bytes: int           # uncompressed non-null payload bytes
    # typed value-domain bounds for the integer family (ints, bool,
    # timestamps/dates as epoch units, decimals as unscaled ints) — the
    # reference's typed `Stats<T>(…, T Min, T Max)` (`Sequences/Stats.cs:3`).
    # None when the logical has no sound int64 bounds (floats, strings,
    # uint64 values above int64, wide decimals beyond int64): numeric
    # pruning then degrades to a no-op for the segment, never to a
    # lexicographic compare (round-2 verdict #1 wrong-answer hazard).
    min_num: int | None = None
    max_num: int | None = None
    # double bounds for float logicals (exact upcast from float32);
    # None when any value is NaN (NaN breaks ordered comparisons, so
    # such segments stay unprunable) or the logical isn't float
    min_flt: float | None = None
    max_flt: float | None = None
    # exact stored-domain sum of the non-null values as a decimal
    # string (int family: the int64 view; decimals: UNSCALED units;
    # timestamps/dates: epoch units) — the manifest-only aggregate
    # pushdown (`operators/aggregate.py`) rolls these up so
    # COUNT/MIN/MAX/SUM never touch a payload byte. None when the
    # logical has no exact integer sum (floats: order-dependent;
    # strings/binary/nested: undefined; uint64 above int64: the stored
    # domain wraps) — the rollup then reports unknown, never a wrong
    # number.
    sum_repr: str | None = None
    # transient artifacts reused by the dict codec (not serialized)
    codes: np.ndarray | None = field(default=None, repr=False)
    uniques: object | None = field(default=None, repr=False)
    int_min: int | None = None
    int_max: int | None = None
    delta_min: int | None = None
    delta_max: int | None = None
    max_run_len: int = 0
    dict_raw_bytes: int = 0
    avg_len: float = 0.0


_REPR_CAP = 64
_INT64_MAX = (1 << 63) - 1


def _repr(v) -> str:
    s = str(v)
    return s[:_REPR_CAP]


def _exact_sum_i64(iv: np.ndarray) -> int:
    """Exact Python-int sum of an int64 array, overflow-free for any
    segment below 2^31 rows: per-element split iv = (iv >> 32)*2^32 +
    (iv & 0xffffffff); each partial sum fits its accumulator."""
    hi = int((iv >> 32).sum(dtype=np.int64))
    lo = int((iv & np.int64(0xFFFFFFFF)).astype(np.uint64)
             .sum(dtype=np.uint64))
    return (hi << 32) + lo


def _exact_sum_u64(uv: np.ndarray) -> int:
    """Exact Python-int sum of a uint64 array (same 32-bit split)."""
    hi = int((uv >> np.uint64(32)).sum(dtype=np.uint64))
    lo = int((uv & np.uint64(0xFFFFFFFF)).sum(dtype=np.uint64))
    return (hi << 32) + lo


def collect(vals, logical: str, n_total: int, n_nulls: int) -> SegmentStats:
    """Compute stats for the non-null values of one column chunk."""
    raw = V.raw_size(vals, logical)
    n = vals.size if isinstance(vals, V.VarChunk) else int(vals.size)
    if n == 0:
        return SegmentStats(n_total, n_nulls, 0, 0, None, None, raw)

    codes, uniques = dictrle.factorize(vals, logical)
    run_idx, run_len = dictrle.run_lengths(codes)
    st = SegmentStats(
        n_rows=n_total,
        n_nulls=n_nulls,
        n_distinct=int(len(uniques.lengths) if isinstance(uniques, V.VarChunk)
                       else len(uniques)),
        n_runs=int(run_idx.size),
        min_repr=None,
        max_repr=None,
        raw_bytes=raw,
        codes=codes,
        uniques=uniques,
        max_run_len=int(run_len.max()) if run_len.size else 0,
    )
    if isinstance(vals, V.VarChunk):
        # exact write_var size of the dictionary payload, so the
        # chooser's dict-vs-plain-vs-FSST arbitration compares what
        # each codec actually writes (nbytes_raw's 4 B/value offset
        # convention overestimated var dictionaries ~3 B per distinct)
        st.dict_raw_bytes = V.var_encoded_size(uniques)
        st.avg_len = float(vals.lengths.mean()) if n else 0.0
        # min/max over the dictionary (cheaper than full column)
        arr = V.var_chunk_to_arrow(uniques, logical)
        import pyarrow.compute as pc

        mm = pc.min_max(arr)
        st.min_repr = _repr(mm["min"].as_py())
        st.max_repr = _repr(mm["max"].as_py())
    else:
        st.dict_raw_bytes = int(np.dtype(V.FIXED_LOGICAL[logical]).itemsize) * st.n_distinct
        if logical in V.INT_LOGICAL:
            iv = V.as_int64(vals, logical)
            st.int_min, st.int_max = int(iv.min()), int(iv.max())
            if n > 1:
                d = np.diff(iv)
                st.delta_min, st.delta_max = int(d.min()), int(d.max())
            else:
                st.delta_min = st.delta_max = 0
            st.min_repr = _repr(vals.min())
            st.max_repr = _repr(vals.max())
            # value-domain bounds: the int64 view is the stored domain
            # for every int-family logical; uint64 values above int64
            # wrap in that view, so their bounds are unusable
            if logical != "uint64" or int(vals.max()) <= _INT64_MAX:
                st.min_num, st.max_num = st.int_min, st.int_max
                st.sum_repr = str(_exact_sum_i64(iv))
        else:
            st.min_repr = _repr(vals.min())
            st.max_repr = _repr(vals.max())
            if logical in ("float32", "float64") and not np.isnan(
                    vals.astype(np.float64, copy=False)).any():
                st.min_flt = float(vals.min())
                st.max_flt = float(vals.max())
    return st
