"""Property-based fuzzing of the encoded-query kernels that the store
facade's read path now rides on (`query_value`, `query_range`,
`gather_ranges`): for ANY input array, ANY null pattern, and ANY probe,

- query_value's ranges must select exactly the equal non-null rows;
- query_range's ranges must be a SUPERSET of the in-bounds non-null
  rows (its contract: callers re-apply the exact predicate);
- gather_ranges over those ranges must equal slicing the decoded array.
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from columnstore_spark.codecs.query import (
    gather_ranges,
    query_range,
    query_value,
)
from columnstore_spark.codecs.segment import decode_segment, encode_segment

MAX_N = 120

INTS = st.lists(st.one_of(st.none(), st.integers(-50, 50)),
                min_size=0, max_size=MAX_N)
STRS = st.lists(st.one_of(st.none(), st.text(max_size=6)),
                min_size=0, max_size=MAX_N)
FLTS = st.lists(st.one_of(st.none(),
                          st.floats(allow_nan=False, allow_infinity=False,
                                    width=64)),
                min_size=0, max_size=MAX_N)


def _expand(ranges):
    out = []
    for s, ln in ranges:
        out.extend(range(s, s + ln))
    return out


def _matching_rows(vals, pred):
    return [i for i, v in enumerate(vals) if v is not None and pred(v)]


@settings(max_examples=60, deadline=None)
@given(INTS, st.integers(-60, 60))
def test_query_value_ints_exact(vals, probe):
    seg = encode_segment(pa.array(vals, type=pa.int64()))
    got = _expand(query_value(seg.payload, seg.logical, probe))
    assert got == _matching_rows(vals, lambda v: v == probe)


@settings(max_examples=60, deadline=None)
@given(STRS, st.text(max_size=6))
def test_query_value_strings_exact(vals, probe):
    seg = encode_segment(pa.array(vals, type=pa.large_utf8()))
    got = _expand(query_value(seg.payload, seg.logical, probe))
    assert got == _matching_rows(vals, lambda v: v == probe)


@settings(max_examples=60, deadline=None)
@given(INTS, st.integers(-60, 60), st.integers(0, 30))
def test_query_range_ints_superset_and_gather(vals, lo, width):
    hi = lo + width
    seg = encode_segment(pa.array(vals, type=pa.int64()))
    ranges = query_range(seg.payload, seg.logical, lo, hi)
    got = set(_expand(ranges))
    want = set(_matching_rows(vals, lambda v: lo <= v <= hi))
    assert want <= got  # never under-selects
    # gathered rows == decoded slices at those positions
    arr = decode_segment(seg.payload, seg.logical)
    gathered = gather_ranges(seg.payload, seg.logical, ranges)
    assert gathered.to_pylist() == [arr[i].as_py()
                                    for i in sorted(_expand(ranges))]


@settings(max_examples=40, deadline=None)
@given(FLTS, st.floats(-1e3, 1e3), st.floats(0, 1e3))
def test_query_range_floats_superset(vals, lo, width):
    hi = lo + width
    seg = encode_segment(pa.array(vals, type=pa.float64()))
    got = set(_expand(query_range(seg.payload, seg.logical, lo, hi)))
    want = set(_matching_rows(vals, lambda v: lo <= v <= hi))
    assert want <= got


@settings(max_examples=40, deadline=None)
@given(STRS, st.text(max_size=6), st.text(max_size=6))
def test_query_range_strings_superset(vals, a, b):
    lo, hi = min(a, b), max(a, b)
    seg = encode_segment(pa.array(vals, type=pa.large_utf8()))
    got = set(_expand(query_range(seg.payload, seg.logical, lo, hi)))
    # python str order == UTF-16 order can disagree only off-ASCII,
    # where the kernel falls back to whole-segment; on ASCII bounds it
    # must still cover every in-bounds row under python ordering
    want = set(_matching_rows(vals, lambda v: lo <= v <= hi))
    assert want <= got


# ---------------------------------------------------------------------------
# aggregation kernels: value_counts / group_codes
# ---------------------------------------------------------------------------


def _vc_dict(payload, logical):
    from columnstore_spark.codecs.query import value_counts
    vals, counts, n_nulls = value_counts(payload, logical)
    d = {} if vals is None else dict(zip(vals.to_pylist(),
                                         counts.tolist()))
    return d, n_nulls


@settings(max_examples=60, deadline=None)
@given(st.one_of(INTS, STRS))
def test_value_counts_matches_python(vals):
    """For ANY array and null pattern, value_counts must equal the
    Python-side Counter of non-null values (whatever codec the chooser
    picked), and the null count must be exact."""
    from collections import Counter
    arr = (pa.array(vals, type=pa.int64())
           if all(v is None or isinstance(v, int) for v in vals)
           else pa.array(vals, type=pa.large_utf8()))
    seg = encode_segment(arr)
    got, n_nulls = _vc_dict(seg.payload, seg.logical)
    exp = Counter(v for v in vals if v is not None)
    assert got == dict(exp)
    assert n_nulls == sum(v is None for v in vals)


@settings(max_examples=60, deadline=None)
@given(st.one_of(INTS, STRS))
def test_group_codes_reconstructs_rows(vals):
    """values[code[i]] must equal row i for every non-null row, and
    code −1 must mark exactly the nulls — for ANY codec the chooser
    picked (the dict fast path and the decode fallback must agree with
    the source array)."""
    from columnstore_spark.codecs.query import group_codes
    arr = (pa.array(vals, type=pa.int64())
           if all(v is None or isinstance(v, int) for v in vals)
           else pa.array(vals, type=pa.large_utf8()))
    seg = encode_segment(arr)
    gvals, codes = group_codes(seg.payload, seg.logical)
    assert len(codes) == len(vals)
    lst = [] if gvals is None else gvals.to_pylist()
    for i, v in enumerate(vals):
        if v is None:
            assert codes[i] == -1
        else:
            assert lst[codes[i]] == v


# ---------------------------------------------------------------------------
# IN-list / IS NULL kernels: query_values / query_nulls
# ---------------------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(INTS, st.lists(st.one_of(st.none(), st.integers(-60, 60)),
                      max_size=6))
def test_query_values_ints_exact(vals, probes):
    """query_values must select exactly the rows equal to ANY non-null
    probe — for ANY array, null pattern, probe multiset (duplicates,
    absent values, None members), and whatever codec the chooser
    picked."""
    from columnstore_spark.codecs.query import query_values
    seg = encode_segment(pa.array(vals, type=pa.int64()))
    got = _expand(query_values(seg.payload, seg.logical, probes))
    live = {p for p in probes if p is not None}
    assert sorted(got) == _matching_rows(vals, lambda v: v in live)


@settings(max_examples=60, deadline=None)
@given(STRS, st.lists(st.one_of(st.none(), st.text(max_size=6)),
                      max_size=6))
def test_query_values_strings_exact(vals, probes):
    from columnstore_spark.codecs.query import query_values
    seg = encode_segment(pa.array(vals, type=pa.large_utf8()))
    got = _expand(query_values(seg.payload, seg.logical, probes))
    live = {p for p in probes if p is not None}
    assert sorted(got) == _matching_rows(vals, lambda v: v in live)


@settings(max_examples=60, deadline=None)
@given(st.one_of(INTS, STRS, FLTS))
def test_query_nulls_exact(vals):
    """query_nulls must select exactly the null rows for ANY array and
    codec — and its ranges must gather correctly from other columns
    (gather_ranges over the same payload returns all-null slices)."""
    from columnstore_spark.codecs.query import query_nulls
    if all(v is None or isinstance(v, int) for v in vals):
        arr = pa.array(vals, type=pa.int64())
    elif all(v is None or isinstance(v, str) for v in vals):
        arr = pa.array(vals, type=pa.large_utf8())
    else:
        arr = pa.array(vals, type=pa.float64())
    seg = encode_segment(arr)
    ranges = query_nulls(seg.payload, seg.logical)
    assert _expand(ranges) == [i for i, v in enumerate(vals) if v is None]
    gathered = gather_ranges(seg.payload, seg.logical, ranges)
    assert gathered.null_count == len(gathered)


@settings(max_examples=60, deadline=None)
@given(STRS, st.text(max_size=4))
def test_query_contains_matches_python(vals, needle):
    """query_contains must select exactly the rows where `needle in
    value` (Python/UTF-16 codepoint semantics) — for ANY strings, null
    pattern, needle (incl. multibyte and empty), and codec."""
    from columnstore_spark.codecs.query import query_contains
    seg = encode_segment(pa.array(vals, type=pa.large_utf8()))
    got = _expand(query_contains(seg.payload, seg.logical, needle))
    assert got == _matching_rows(vals, lambda v: needle in v)
