"""Codec + query-kernel soak: randomized differential test, no Spark.

For thousands of randomized segments (dtype x null pattern x
cardinality/run profile x size x codec mode), assert:

1. encode_segment -> decode_segment is BIT-identical to the source
   (the north rule's round-trip invariant, at kernel granularity);
2. every query kernel answers exactly like the same operation on the
   DECODED array (the ground-truth oracle):
   query_value / query_values / query_range / query_nulls /
   query_window / gather_ranges / value_counts / group_codes.

Complements the hypothesis suites (which shrink well but run few
examples) with VOLUME: `python scripts/soak_fuzz.py [iters] [seed]`
defaults to 2000 iterations, ~2 min single-core. Exits non-zero on
the first divergence with a full repro dump.
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

from columnstore_spark.codecs import chooser  # noqa: E402
from columnstore_spark.codecs.query import (  # noqa: E402
    gather_ranges,
    group_codes,
    query_nulls,
    query_range,
    query_value,
    query_values,
    query_window,
    value_counts,
)
from columnstore_spark.codecs.segment import (  # noqa: E402
    decode_segment,
    encode_segment,
    verify_checksum,
)


def _rand_values(rng: np.random.Generator, kind: str, n: int):
    card = int(rng.choice([1, 2, 5, max(2, n // 8), max(2, n)]))
    if kind == "int64":
        pool = rng.integers(-(2**40), 2**40, size=card)
        return pa.array(rng.choice(pool, size=n), type=pa.int64())
    if kind == "int32":
        pool = rng.integers(-(2**28), 2**28, size=card).astype(np.int32)
        return pa.array(rng.choice(pool, size=n), type=pa.int32())
    if kind == "float64":
        pool = np.concatenate([
            rng.normal(0, 1e6, size=max(1, card - 2)),
            np.array([np.nan, -0.0]),
        ])
        return pa.array(rng.choice(pool, size=n), type=pa.float64())
    if kind == "string":
        pool = np.array(
            ["".join(rng.choice(list("abcxyz 0é中"),
                                size=rng.integers(0, 20)))
             for _ in range(card)], dtype=object)
        return pa.array(rng.choice(pool, size=n), type=pa.large_utf8())
    if kind == "timestamp_us":
        pool = rng.integers(0, 2**44, size=card)
        return pa.array(rng.choice(pool, size=n), type=pa.timestamp("us"))
    if kind == "bool":
        return pa.array(rng.random(n) < 0.5, type=pa.bool_())
    if kind == "date32":
        pool = rng.integers(-30000, 40000, size=card).astype(np.int32)
        return pa.array(rng.choice(pool, size=n), type=pa.date32())
    if kind == "binary":
        pool = np.array(
            [rng.integers(0, 256, size=rng.integers(0, 24))
             .astype(np.uint8).tobytes() for _ in range(card)],
            dtype=object)
        return pa.array(rng.choice(pool, size=n), type=pa.large_binary())
    if kind == "decimal64":
        import decimal as D
        pool = [D.Decimal(int(v)).scaleb(-2)
                for v in rng.integers(-(10**12), 10**12, size=card)]
        return pa.array(rng.choice(np.array(pool, dtype=object), size=n),
                        type=pa.decimal128(14, 2))
    if kind == "decimal128":
        import decimal as D
        pool = [D.Decimal(int(v)) * (10**12) + int(w)
                for v, w in zip(rng.integers(-(10**15), 10**15, size=card),
                                rng.integers(0, 10**12, size=card))]
        return pa.array(rng.choice(np.array(pool, dtype=object), size=n),
                        type=pa.decimal128(30, 0))
    raise AssertionError(kind)


def _with_nulls(rng, arr: pa.Array, p: float) -> pa.Array:
    if p <= 0:
        return arr
    mask = rng.random(len(arr)) < p
    if mask.all():
        mask[int(rng.integers(0, len(arr)))] = False
    return pa.array(
        [None if m else v for m, v in zip(mask, arr.to_pylist())],
        type=arr.type)


def _runs_from_mask(mask: np.ndarray) -> list[tuple[int, int]]:
    """(start, len) runs of True — the kernels' range answer shape."""
    idx = np.flatnonzero(mask)
    if idx.size == 0:
        return []
    brk = np.flatnonzero(np.diff(idx) > 1)
    starts = np.concatenate([[idx[0]], idx[brk + 1]])
    ends = np.concatenate([idx[brk], [idx[-1]]])
    return [(int(s), int(e - s + 1)) for s, e in zip(starts, ends)]


def _arr_eq(a: pa.Array, b: pa.Array) -> bool:
    """NaN-aware equality: validity + bit patterns for floats (arrow
    .equals treats NaN != NaN), plain .equals otherwise."""
    if isinstance(b, pa.ChunkedArray):
        b = b.combine_chunks()
    if not pa.types.is_floating(a.type):
        return a.equals(b)
    if len(a) != len(b):
        return False
    av, bv = np.asarray(pc.is_valid(a)), np.asarray(pc.is_valid(b))
    if not (av == bv).all():
        return False
    ab = np.array(a.fill_null(0.0).to_pylist()).view(np.int64)
    bb = np.array(b.fill_null(0.0).to_pylist()).view(np.int64)
    return bool((ab == bb).all())


def _eq_mask(dec: pa.Array, probe) -> np.ndarray:
    try:
        s = pa.scalar(probe, type=dec.type)
    except (pa.ArrowInvalid, OverflowError):
        # out-of-domain probe: matches nothing (the kernels' contract)
        return np.zeros(len(dec), dtype=bool)
    m = pc.equal(dec, s)
    return np.asarray(pc.fill_null(m, False))


def check_one(rng: np.random.Generator, it: int) -> None:
    kind = str(rng.choice(["int64", "int32", "float64", "string",
                           "timestamp_us", "bool", "date32", "binary",
                           "decimal64", "decimal128"]))
    n = int(rng.choice([1, 2, 7, 100, 1000, 5000]))
    nullp = float(rng.choice([0.0, 0.0, 0.05, 0.5]))
    mode = str(rng.choice([chooser.MODE_SIZE, chooser.MODE_SPEED,
                           chooser.MODE_NONE]))
    arr = _with_nulls(rng, _rand_values(rng, kind, n), nullp)
    seg = encode_segment(arr, mode=mode)
    assert verify_checksum(seg.payload, seg.logical, seg.checksum)
    dec = decode_segment(seg.payload, seg.logical)

    ctx = (f"it={it} kind={kind} n={n} nullp={nullp} mode={mode} "
           f"codec={seg.codec_id}")
    assert _arr_eq(dec, arr.cast(dec.type)), f"roundtrip diverged: {ctx}"

    valid = np.asarray(pc.is_valid(dec))
    vals = dec.drop_null()

    # query_nulls == validity-mask runs
    got = query_nulls(seg.payload, seg.logical)
    exp = _runs_from_mask(~valid)
    assert got == exp, f"query_nulls: {ctx}\n{got}\n{exp}"

    # query_value on a present value AND a likely-absent probe
    probes = []
    if len(vals):
        probes.append(vals[int(rng.integers(0, len(vals)))].as_py())
    if kind in ("int64", "int32"):
        probes.append(int(rng.integers(-(2**41), 2**41)))
    elif kind == "string":
        probes.append("zz-absent-☃")
    for pr in probes:
        if pr is None or (isinstance(pr, float) and pr != pr):
            continue  # NaN probes are facade-gated to the decode path
        got = query_value(seg.payload, seg.logical, pr)
        exp = _runs_from_mask(_eq_mask(dec, pr))
        assert got == exp, f"query_value({pr!r}): {ctx}\n{got}\n{exp}"

    # query_values (IN-list) over a mixed present/absent list
    inlist = [p for p in probes
              if p is not None and not (isinstance(p, float) and p != p)]
    if inlist:
        got = query_values(seg.payload, seg.logical, inlist)
        m = np.zeros(len(dec), dtype=bool)
        for pr in inlist:
            m |= _eq_mask(dec, pr)
        exp = _runs_from_mask(m)
        assert got == exp, f"query_values: {ctx}\n{got}\n{exp}"

    # query_range between two sampled present values
    if len(vals) >= 2 and kind != "float64":
        a = vals[int(rng.integers(0, len(vals)))].as_py()
        b = vals[int(rng.integers(0, len(vals)))].as_py()
        lo, hi = (a, b) if not b < a else (b, a)
        got = query_range(seg.payload, seg.logical, lo, hi)
        m = pc.and_(pc.greater_equal(dec, pa.scalar(lo, type=dec.type)),
                    pc.less_equal(dec, pa.scalar(hi, type=dec.type)))
        exp_mask = np.asarray(pc.fill_null(m, False))
        # query_range's contract is a SUPERSET on non-dict codecs (the
        # caller re-filters after gather — see
        # test_query_range_kernel_superset_fallbacks): every exact
        # match must be covered, and nothing outside [0, n)
        got_mask = np.zeros(n, dtype=bool)
        for a, b in got:
            assert 0 <= a and a + b <= n, f"range oob: {ctx}"
            got_mask[a:a + b] = True
        missed = exp_mask & ~got_mask
        assert not missed.any(), \
            f"query_range[{lo!r},{hi!r}] dropped matches: {ctx}"

    # window + gather
    s = int(rng.integers(0, n + 2))
    ln = int(rng.integers(0, n + 2))
    got_w = query_window(seg.payload, seg.logical, s, ln)
    exp_w = dec.slice(max(0, s), max(0, min(ln, n - max(0, s))))
    assert _arr_eq(exp_w, got_w), f"query_window({s},{ln}): {ctx}"
    ranges = _runs_from_mask(rng.random(n) < 0.3)
    got_g = gather_ranges(seg.payload, seg.logical, ranges)
    exp_g = (pa.concat_arrays([dec.slice(a, b) for a, b in ranges])
             if ranges else dec.slice(0, 0))
    assert _arr_eq(exp_g, got_g), f"gather_ranges: {ctx}"

    # value_counts == groupby of the decoded array. Floats keep only
    # the count-sum check: the engine pins Spark's group semantics
    # (-0.0 merges with 0.0, all NaN payloads merge), which
    # pc.value_counts does not share (dedicated unit tests pin it).
    vc_vals, vc_counts, vc_nulls = value_counts(seg.payload, seg.logical)
    assert vc_nulls == int((~valid).sum()), f"value_counts nulls: {ctx}"
    if kind == "float64":
        total = (0 if vc_counts is None else int(np.sum(vc_counts)))
        assert total == int(valid.sum()), f"value_counts sum: {ctx}"
    elif vc_vals is not None:
        got_map = dict(zip([str(v) for v in vc_vals.to_pylist()],
                           [int(c) for c in vc_counts]))
        tbl = pc.value_counts(vals)
        exp_map = {str(r["values"].as_py()): int(r["counts"].as_py())
                   for r in tbl}
        assert got_map == exp_map, f"value_counts: {ctx}"
    else:
        assert len(vals) == 0, f"value_counts empty-but-nonempty: {ctx}"

    # group_codes: codes must reconstruct the column
    gvals, codes = group_codes(seg.payload, seg.logical)
    assert len(codes) == n, f"group_codes length: {ctx}"
    if kind == "float64":
        pass  # float group-key merging pinned by unit tests
    elif gvals is not None:
        rebuilt = []
        gl = gvals.to_pylist()
        for c in codes:
            rebuilt.append(None if c < 0 else gl[int(c)])
        assert rebuilt == dec.to_pylist(), f"group_codes rebuild: {ctx}"
    else:
        assert all(c < 0 for c in codes), f"group_codes all-null: {ctx}"


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0xC0DEC
    rng = np.random.default_rng(seed)
    for it in range(iters):
        check_one(rng, it)
        if it and it % 500 == 0:
            print(f"{it}/{iters} ok", flush=True)
    print(f"SOAK OK: {iters} randomized segments, seed={seed}")


if __name__ == "__main__":
    main()
