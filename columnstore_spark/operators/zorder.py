"""Multi-dimensional clustering (Z-order / Morton curve) for rowgroup
layout — the Iceberg/Delta `zorder` rewrite analogue for this store.

Why it exists: the manifest prunes rowgroups by per-segment min/max
bounds (`plans/pruning.py`). Bounds are only selective when the layout
clusters the probed column — the default layout clusters by
(conv_id, turn_idx), so a conjunctive range probe on (turn_idx, ts)
touches almost every rowgroup. Assigning rowgroups along a Morton
curve over the probed dimensions gives every rowgroup a tight
bounding box in BOTH dimensions at once, so the same untouched
pruning logic eliminates most of the store for 2-D box probes.

Soundness: this module only changes WHERE rows land (layout). Query
correctness never depends on it — pruning reads the real per-segment
min/max recorded at encode time, and every probe re-applies its exact
predicate on the decoded survivors. A bad curve (wrong bounds, nulls,
NaN, skew) can only cost performance, never rows.

Everything is a pure Catalyst column expression (shifts/masks/ORs —
whole-stage codegen, no Python in the row path); the only driver-side
work is one min/max aggregate when bounds aren't supplied.

Scale notes (100 TB):
- `zorder_rowgroup_expr` is deterministic and map-only (grid-prefix
  buckets), so encode keeps its single shuffle and checkpoint-resume
  keeps stable rowgroup ids across retries. The trade: a skewed cell
  produces an oversized rowgroup. At fleet scale either raise
  `num_rowgroups` (finer grid) or swap the assignment for
  `repartitionByRange(zorder_column(...))` — sampling-balanced, at
  the cost of non-deterministic group boundaries across runs.
- Bounds should be fixed constants in production (e.g. the table's
  known ts retention window) so ingest batches share one grid;
  `compute_bounds` is the convenience path for ad-hoc builds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["compute_bounds", "zorder_column", "zorder_rowgroup_expr",
           "morton_ref"]

_MAX_DIMS = 4


_NUMERIC_AXIS = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                 T.FloatType, T.DoubleType, T.BooleanType, T.DecimalType)


def _axis(df: DataFrame, col: str) -> Column:
    """The column projected into the shared double axis domain:
    timestamps -> epoch microseconds (TIMESTAMP and TIMESTAMP_NTZ —
    neither casts to double directly in Spark 4), dates -> epoch days,
    everything numeric/bool -> plain double cast. The SAME expression
    feeds `compute_bounds` and `zorder_column`, so bounds and values
    always land in one domain.

    Non-orderable-as-number dtypes (strings, binary, nested) raise:
    `cast('double')` would NULL every value and silently collapse the
    whole store into grid cell 0 — a single-task straggler at exactly
    the scale this layout exists for. Cluster on a numeric surrogate
    (e.g. xxhash64(conv_id) has no locality — prefer a real dimension).
    """
    dtype = dict(zip(df.columns, [f.dataType for f in df.schema.fields]),
                 ).get(col)
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros(F.col(col).cast("timestamp")).cast("double")
    if isinstance(dtype, T.DateType):
        return F.unix_date(F.col(col)).cast("double")
    if dtype is not None and not isinstance(dtype, _NUMERIC_AXIS):
        raise TypeError(
            f"zorder axis {col!r} has non-numeric type {dtype}; "
            "cluster columns must be numeric/temporal/boolean")
    return F.col(col).cast("double")


def compute_bounds(df: DataFrame, cols: list[str] | tuple[str, ...],
                   ) -> dict[str, tuple[float, float]]:
    """One aggregate pass: {col: (min, max)} in the double axis domain
    (see `_axis`). Map-side partial agg; rows never collect."""
    aggs = []
    for c in cols:
        # non-finite -> null so min/max skip it (Spark sorts NaN
        # greatest, and one NaN or ±inf row would otherwise pin a
        # bound and flatten the whole axis to a single cell)
        v = _axis(df, c)
        v = F.when(v.between(F.lit(-1.7976931348623157e308),
                             F.lit(1.7976931348623157e308)), v)
        aggs += [F.min(v).alias(f"__lo_{c}"), F.max(v).alias(f"__hi_{c}")]
    row = df.agg(*aggs).collect()[0]
    out = {}
    for c in cols:
        lo, hi = row[f"__lo_{c}"], row[f"__hi_{c}"]
        # all-null column: degenerate axis, every row quantizes to 0
        out[c] = (0.0, 0.0) if lo is None else (float(lo), float(hi))
    return out


def _quantize(v: Column, lo: float, hi: float, bits: int) -> Column:
    """Clamp-normalize one axis value to an integer in [0, 2^bits)."""
    qmax = (1 << bits) - 1
    if hi > lo:
        scaled = (v - F.lit(lo)) / F.lit(hi - lo) * F.lit(float(qmax))
    else:
        scaled = v * F.lit(0.0)  # degenerate axis (keeps null as null)
    scaled = F.nanvl(scaled, F.lit(0.0))
    # clamp in the DOUBLE domain before the long cast: an
    # out-of-range value (inf, or a far-out-of-bounds probe) would
    # throw under ANSI cast semantics; clamped-then-truncated equals
    # morton_ref's float-clamp-then-int exactly
    q = F.least(F.greatest(scaled, F.lit(0.0)),
                F.lit(float(qmax))).cast("long")
    return F.coalesce(q, F.lit(0))  # nulls cluster at the grid origin


def zorder_column(df: DataFrame, bounds: dict[str, tuple[float, float]],
                  bits: int = 16) -> Column:
    """Morton code over 1-4 columns as a BIGINT Catalyst expression.

    `bounds` maps column name -> (min, max) in the double axis domain
    (use `compute_bounds`, or pass known constants — timestamps in
    epoch micros, dates in epoch days). `df` is consulted only for
    column dtypes. Each value is clamp-normalized to `bits` bits; bit
    i of dimension d lands at output bit `i * ndims + d` (dimension
    order = dict order), so nearby (x, y) pairs share long code
    prefixes — the property that turns one-dimensional rowgroup ranges
    into 2-D bounding boxes.
    """
    cols = list(bounds)
    n = len(cols)
    if not 1 <= n <= _MAX_DIMS:
        raise ValueError(f"zorder needs 1..{_MAX_DIMS} columns, got {n}")
    if bits < 1 or bits * n > 63:
        raise ValueError(f"bits*ndims must fit a signed int64; "
                         f"got bits={bits}, ndims={n}")
    qs = [_quantize(_axis(df, c), lo, hi, bits)
          for c, (lo, hi) in bounds.items()]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for d, q in enumerate(qs):
            bit = F.shiftright(q, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + d))
    return z


def zorder_rowgroup_expr(df: DataFrame,
                         bounds: dict[str, tuple[float, float]],
                         num_rowgroups: int, bits: int = 16,
                         cell_split: int = 1,
                         salt: Column | None = None) -> Column:
    """Rowgroup assignment = the top ceil(log2(num_rowgroups)) bits of
    the Morton code: contiguous curve ranges -> one grid-prefix cell
    per rowgroup, each with a tight per-dimension bounding box in the
    manifest. Deterministic and map-only (see module docstring for the
    skew trade vs repartitionByRange).

    `cell_split > 1` is the capacity guard for skewed cells: each grid
    cell splits into that many sub-rowgroups by `salt` (default: hash
    of the cluster columns — pass an explicit salt such as
    xxhash64(conv_id) when one hot VALUE dominates a cell, since
    equal cluster values hash together). Every sub-rowgroup inherits
    the cell's tight bounding box, so pruning selectivity is
    unchanged — only the per-task working set shrinks. At 10^12 turns
    this is what bounds a dense cell to rowgroup capacity without
    giving up the deterministic, resume-stable assignment.

    Granularity contract: the grid has 2^ceil(log2(num_rowgroups))
    cells — num_rowgroups rounds UP to a power of two (prefix buckets
    must be whole bit ranges), so a non-power-of-two request yields up
    to 2x the rowgroups at half the fill. Callers sizing groups as
    ceil(rows/capacity) (rebuild does) get capacity-bounded — never
    capacity-exceeding — cells; pass a power of two when exact counts
    matter."""
    if num_rowgroups < 1:
        raise ValueError("num_rowgroups must be >= 1")
    if cell_split < 1:
        raise ValueError("cell_split must be >= 1")
    n = len(bounds)
    gbits = max((num_rowgroups - 1).bit_length(), 1)
    total = bits * n
    if gbits > total:
        raise ValueError(f"num_rowgroups {num_rowgroups} exceeds the "
                         f"{total}-bit curve resolution")
    cell = F.shiftright(zorder_column(df, bounds, bits), total - gbits)
    if cell_split == 1:
        return cell
    if salt is None:
        salt = F.xxhash64(*[F.col(c) for c in bounds])
    return cell * F.lit(int(cell_split)) + F.pmod(salt,
                                                  F.lit(int(cell_split)))


def zorder_layout(df: DataFrame, bounds: dict[str, tuple[float, float]],
                  num_rowgroups: int, bits: int = 16,
                  cell_split: int = 1, salt: Column | None = None,
                  tail_order: tuple = ("conv_id", "turn_idx"),
                  ) -> tuple[Column, tuple]:
    """The (rowgroup_expr, order) pair for a z-clustered encode — ONE
    recipe shared by the store facade and streaming ingest so the two
    layouts can never drift: grid-prefix assignment plus a
    curve-position-first within-rowgroup sort (tightens runs on the
    clustered columns) falling back to the stable transcript key."""
    rg = zorder_rowgroup_expr(df, bounds, num_rowgroups, bits,
                              cell_split=cell_split, salt=salt)
    order = (zorder_column(df, bounds, bits), *tail_order)
    return rg, order


def morton_ref(values: dict[str, float],
               bounds: dict[str, tuple[float, float]],
               bits: int = 16) -> int:
    """Pure-Python reference of `zorder_column` for differential tests
    (same clamp/quantize arithmetic, double precision; values already
    in the double axis domain — timestamps as epoch micros)."""
    cols = list(bounds)
    n = len(cols)
    qmax = (1 << bits) - 1
    z = 0
    for d, c in enumerate(cols):
        lo, hi = bounds[c]
        v = values[c]
        if v is None or (isinstance(v, float) and v != v):
            q = 0
        elif hi > lo:
            scaled = (float(v) - lo) / (hi - lo) * float(qmax)
            if scaled != scaled:  # inf bounds -> inf/inf; nanvl -> 0
                q = 0
            else:
                # clamp in the float domain before truncating (int(inf)
                # would raise; Spark's cast-then-clamp lands on the
                # same value for every clamped input)
                q = int(min(max(scaled, 0.0), float(qmax)))
        else:
            q = 0
        for i in range(bits):
            z |= ((q >> i) & 1) << (i * n + d)
    return z
