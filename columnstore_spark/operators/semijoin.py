"""Distributed semi-join against the encoded store — the dynamic
partition pruning analogue.

The reference's query surface is single-probe (`QueryByValue`,
`/root/reference/Outcompute.ColumnStore/ColumnSegment.cs:38-157`); its
batch form in this engine is `query_by_in`, which collects the probe
list on the driver. At warehouse scale the probe side is often *another
table* ("all conversations for these customers") whose key set must not
transit the driver. This operator keeps everything distributed:

1. **Bounds prune as a broadcast join.** The probe column's manifest
   rows (typed value-domain bounds — kilobytes even at 10^6 rowgroups)
   broadcast to the key side; a key joins a rowgroup when the bounds
   cannot exclude it. This is Spark's dynamic partition pruning
   re-expressed against OUR manifest instead of Hive partitions: the
   expensive side's scan set is decided at runtime by the small side.
2. **Keep-set semi-join.** The surviving rowgroup ids (≤ manifest
   cardinality) semi-join the segments table — no payload byte of an
   excluded rowgroup is read.
3. **Exact hash semi-join.** Decoded survivors leftsemi-join the
   distinct keys on the value column. AQE picks broadcast-hash when the
   key side is small, shuffled-hash otherwise — never a nested loop
   (plan-gated in `tests/test_semijoin.py`).

The only nested-loop join in the plan is keys x *manifest bounds*
(step 1), which is bounded by manifest size, not data size — the same
shape as the LSH banded joins (BENCH.md): broadcast the metadata, hash
the data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans.pruning import _REPR_CAP, _ASCII_RE, _with_typed_bounds

_PLAIN_INTS = {"int8", "int16", "int32", "int64",
               "uint8", "uint16", "uint32", "bool"}


def _key_stored_expr(logical: str, key: Column) -> Column | None:
    """Key value -> the column's stored int64 domain (Column expr);
    None when no sound vectorized conversion exists (pruning then
    degrades to keep-all, exactness untouched)."""
    if logical in _PLAIN_INTS:
        return key.cast("long")
    if logical == "timestamp_us":
        return F.unix_micros(key)
    if logical == "timestamp_ns":
        return F.unix_micros(key) * F.lit(1000)
    if logical == "date32":
        return F.datediff(key, F.to_date(F.lit("1970-01-01")))
    return None


def _keys_bounds_cond(logical: str | None, key: Column) -> Column | None:
    """Join condition: may `key` live inside this manifest row's
    bounds? Mirrors plans/pruning._typed_cond with the probe as a
    Column instead of a literal. None = cannot prune on this type."""
    if logical == "string":
        ascii_ok = (F.col("min_repr").rlike(_ASCII_RE)
                    & F.col("max_repr").rlike(_ASCII_RE))
        in_bounds = ((F.col("min_repr") <= key)
                     & ((F.length("max_repr") >= _REPR_CAP)
                        | (F.col("max_repr") >= key)))
        return (F.when(F.col("min_repr").isNull(),
                       F.col("n_nulls") < F.col("n_rows"))
                .when(~ascii_ok, F.lit(True))
                .otherwise(in_bounds))
    if logical in ("float32", "float64"):
        k = key.cast("double")
        # NaN keys: Spark orders NaN above +inf, so min_flt <= NaN is
        # true -> NaN keys conservatively keep every segment; segments
        # holding NaN have NULL bounds and are kept by the fallthrough.
        return (F.when(F.col("min_flt").isNotNull(),
                       (F.col("min_flt") <= k) & (F.col("max_flt") >= k))
                .otherwise(F.col("n_nulls") < F.col("n_rows")))
    if logical is None:
        return None
    stored = _key_stored_expr(logical, key)
    if stored is None:
        return None
    return (F.when(F.col("min_num").isNotNull(),
                   (F.col("min_num") <= stored)
                   & (F.col("max_num") >= stored))
            .otherwise(F.col("n_nulls") < F.col("n_rows")))


def keep_ids_for_keys(manifest: DataFrame, column: str, keys: DataFrame,
                      logical_type: str | None) -> DataFrame | None:
    """-> one-column DataFrame of surviving rowgroup_ids, or None when
    the type admits no bounds pruning (caller keeps every rowgroup).
    `keys` must be a single-column DataFrame of distinct probe values.

    The manifest side is broadcast (metadata-sized); the inevitable
    non-equi join is therefore a broadcast nested loop over BOUNDS
    ROWS, never over data."""
    key = keys[keys.columns[0]]
    cond = _keys_bounds_cond(logical_type, key)
    if cond is None:
        return None
    bounds = _with_typed_bounds(
        manifest.where(F.col("column") == column)
        .select("rowgroup_id", "n_rows", "n_nulls",
                "min_repr", "max_repr", "min_num", "max_num",
                "min_flt", "max_flt"))
    return (keys.where(key.isNotNull())
            .join(F.broadcast(bounds), cond)
            .select("rowgroup_id").distinct())


def semi_join_segments(segments: DataFrame, manifest: DataFrame,
                       column: str, keys: DataFrame,
                       logical_type: str | None) -> DataFrame:
    """Segments restricted to rowgroups at least one key can inhabit.
    Falls back to the full segment set when bounds can't speak."""
    ids = keep_ids_for_keys(manifest, column, keys, logical_type)
    if ids is None:
        return segments
    return segments.join(F.broadcast(ids), "rowgroup_id", "leftsemi")
