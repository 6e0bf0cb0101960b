"""Facade probe soak: randomized store queries vs Spark's own
predicate semantics on the raw frame.

Builds one mixed-type store (strings, ints, floats incl. NaN,
decimals, timestamps, a null-bearing column), then fires randomized
probes through every facade query surface —

    query_by_value / query_by_range / query_by_in / query_by_null /
    query_by_prefix / query_by_contains / query_where / query_any

— and asserts each result row-set equals the same predicate evaluated
by Spark on the raw source. This is the facade's documented contract
(encoded kernels may only over-select; the trailing filter narrows),
here enforced under VOLUME and adversarial probe sampling (present
values, absent values, bound-exact values, empty/unicode strings).

Usage: python scripts/soak_store.py [iters] [seed]   (default 120)
"""

from __future__ import annotations

import datetime as dt
import sys
import tempfile
from decimal import Decimal

import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from columnstore_spark.session import get_spark  # noqa: E402
from columnstore_spark.store import TranscriptColumnStore  # noqa: E402

SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("score", T.DoubleType(), True),
    T.StructField("amount", T.DecimalType(12, 2), True),
    T.StructField("ts", T.TimestampType(), False),
])

ROLES = ["user", "assistant", "tool", "", "systém", None]
WORDS = ["alpha", "beta z", "", "中文 text", "x" * 40, "punct,.!"]


def build_rows(rng: np.random.Generator, n: int):
    rows = []
    for i in range(n):
        rows.append((
            f"c{int(rng.integers(0, n // 6 + 1)):04d}",
            int(rng.integers(0, 500)),
            ROLES[int(rng.integers(0, len(ROLES)))],
            None if rng.random() < 0.1 else " ".join(
                WORDS[int(rng.integers(0, len(WORDS)))]
                for _ in range(int(rng.integers(0, 4)))),
            (None if rng.random() < 0.1 else
             float("nan") if rng.random() < 0.05 else
             float(rng.normal(0, 100))),
            (None if rng.random() < 0.1 else
             Decimal(int(rng.integers(-10**6, 10**6))).scaleb(-2)),
            dt.datetime(2025, 1, 1) + dt.timedelta(
                minutes=int(rng.integers(0, 50000))),
        ))
    return rows


def _key(row, cols):
    return tuple(str(row[c]) for c in cols)


def check(name, got_df, exp_df, cols):
    got = sorted(_key(r, cols) for r in got_df.collect())
    exp = sorted(_key(r, cols) for r in exp_df.collect())
    assert got == exp, (
        f"{name}: {len(got)} vs {len(exp)} rows\n"
        f"only-got: {[r for r in got if r not in exp][:3]}\n"
        f"only-exp: {[r for r in exp if r not in got][:3]}")


def sample_probe(rng, raw_vals, col):
    """Mix of present, absent, and bound-exact probe values."""
    kind = rng.random()
    if raw_vals and kind < 0.6:
        return raw_vals[int(rng.integers(0, len(raw_vals)))]
    if raw_vals and kind < 0.75:
        return min(raw_vals) if rng.random() < 0.5 else max(raw_vals)
    # absent probes per column family
    if col == "turn_idx":
        return int(rng.integers(-1000, 5000))
    if col == "score":
        return float(rng.normal(0, 500))
    if col == "amount":
        return Decimal(int(rng.integers(-10**7, 10**7))).scaleb(-2)
    if col == "ts":
        return dt.datetime(2026, 7, 1) + dt.timedelta(
            minutes=int(rng.integers(0, 1000)))
    return ["zz-absent", "", "中", "user"][int(rng.integers(0, 4))]


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    rng = np.random.default_rng(seed)

    spark = get_spark(app="soak_store", master="local[8]",
                      shuffle_partitions=8)
    raw = spark.createDataFrame(build_rows(rng, 900), SCHEMA).persist()
    raw.count()
    root = tempfile.mkdtemp(prefix="cs_soak_store_")
    # half the seeds soak the Z-order layout (operators/zorder.py):
    # identical probe contract, rowgroups on a (turn_idx, ts) grid —
    # the pruner must stay exact under the clustered bounds too
    cluster = (("turn_idx", "ts") if int(rng.integers(0, 2)) else ())
    store = TranscriptColumnStore(spark, root, num_rowgroups=6,
                                  bloom_columns=("conv_id",),
                                  cluster_by=cluster)
    print(f"layout: {'zorder' + str(cluster) if cluster else 'default'}")
    store.add_range(raw)
    store.close()
    cols = [f.name for f in SCHEMA.fields]

    by_col = {c: [r[c] for r in raw.select(c).where(
        F.col(c).isNotNull()).distinct().collect()] for c in cols}
    probe_cols = ["conv_id", "turn_idx", "role", "score", "amount", "ts"]

    for it in range(iters):
        col = probe_cols[int(rng.integers(0, len(probe_cols)))]
        vals = by_col[col]
        op = int(rng.integers(0, 8))
        tag = f"it={it} col={col} op={op}"
        if op == 0:
            pr = sample_probe(rng, vals, col)
            if isinstance(pr, float) and pr != pr:
                continue
            check(f"value {tag} {pr!r}",
                  store.query_by_value(col, pr),
                  raw.where(F.col(col) == F.lit(pr)), cols)
        elif op == 1:
            a = sample_probe(rng, vals, col)
            b = sample_probe(rng, vals, col)
            if any(isinstance(v, float) and v != v for v in (a, b)):
                continue
            lo, hi = (a, b) if str(a) <= str(b) else (b, a)
            try:
                lo, hi = (a, b) if not b < a else (b, a)
            except TypeError:
                pass
            check(f"range {tag} [{lo!r},{hi!r}]",
                  store.query_by_range(col, lo, hi),
                  raw.where((F.col(col) >= F.lit(lo))
                            & (F.col(col) <= F.lit(hi))), cols)
        elif op == 2:
            k = int(rng.integers(0, 5))
            inlist = [sample_probe(rng, vals, col) for _ in range(k)]
            inlist = [v for v in inlist
                      if not (isinstance(v, float) and v != v)]
            got = store.query_by_in(col, inlist)
            exp = (raw.where(F.col(col).isin([F.lit(v) for v in inlist]))
                   if inlist else raw.where(F.lit(False)))
            check(f"in {tag} {inlist!r}", got, exp, cols)
        elif op == 3:
            check(f"null {tag}", store.query_by_null(col),
                  raw.where(F.col(col).isNull()), cols)
        elif op == 4 and col in ("conv_id", "role", "text"):
            src = vals or [""]
            v = str(src[int(rng.integers(0, len(src)))] or "")
            pfx = v[:int(rng.integers(0, 4))]
            if not pfx.isascii():
                continue  # documented ASCII gate on the prefix rewrite
            check(f"prefix {tag} {pfx!r}",
                  store.query_by_prefix(col, pfx),
                  raw.where(F.col(col).startswith(pfx)), cols)
        elif op == 5 and col in ("conv_id", "role", "text"):
            src = vals or [""]
            v = str(src[int(rng.integers(0, len(src)))] or "")
            if len(v) < 1:
                continue
            s = int(rng.integers(0, len(v)))
            sub = v[s:s + int(rng.integers(1, 6))]
            check(f"contains {tag} {sub!r}",
                  store.query_by_contains(col, sub),
                  raw.where(F.col(col).contains(sub)), cols)
        elif op == 6:
            c2 = probe_cols[int(rng.integers(0, len(probe_cols)))]
            if c2 == col:
                continue
            p1 = sample_probe(rng, by_col[col], col)
            p2 = sample_probe(rng, by_col[c2], c2)
            if any(isinstance(v, float) and v != v for v in (p1, p2)):
                continue
            check(f"where {tag} &{c2}",
                  store.query_where({col: p1, c2: p2}),
                  raw.where((F.col(col) == F.lit(p1))
                            & (F.col(c2) == F.lit(p2))), cols)
        elif op == 7:
            c2 = probe_cols[int(rng.integers(0, len(probe_cols)))]
            if c2 == col:
                continue
            p1 = sample_probe(rng, by_col[col], col)
            p2 = sample_probe(rng, by_col[c2], c2)
            if any(isinstance(v, float) and v != v for v in (p1, p2)):
                continue
            check(f"any {tag} |{c2}",
                  store.query_any([(col, p1), (c2, p2)]),
                  raw.where(F.coalesce(F.col(col) == F.lit(p1),
                                       F.lit(False))
                            | F.coalesce(F.col(c2) == F.lit(p2),
                                         F.lit(False))), cols)
        if it and it % 25 == 0:
            print(f"{it}/{iters} ok", flush=True)
    print(f"STORE SOAK OK: {iters} randomized probes, seed={seed}")
    spark.stop()


if __name__ == "__main__":
    main()
