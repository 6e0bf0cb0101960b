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

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans.pruning import (_PLAIN_INT_LOGICALS, _REPR_CAP, _ASCII_RE,
                             _with_typed_bounds)

# derived from the canonical family (plans/pruning.py) so a new
# logical can't silently miss semijoin pruning; uint64 is excluded —
# values above 2^63 wrap in the stored int64 view, so key.cast("long")
# bounds tests are unsound there
_PLAIN_INTS = frozenset(_PLAIN_INT_LOGICALS) - {"uint64"}

_HASH_SCHEMA = "w1 long, m1 long, w2 long, m2 long"


def _bloom_hash_udf(logical: str):
    """Arrow-batched UDF emitting, per key, the two BLAKE2b probe
    positions pre-split into what Catalyst needs: word offsets
    (h >> 6) and signed bit masks (1 << (h & 63)) — the same math
    `codecs/bloom.bloom_keep_cond` does driver-side for one literal.
    Nulls (keys with no canonical encoding) mean "cannot test"."""
    from ..codecs.bloom import _hash2, canon_bytes

    def _mask(h: int) -> int:
        m = 1 << (h & 63)
        return m - (1 << 64) if m > (1 << 63) - 1 else m

    @F.pandas_udf(_HASH_SCHEMA)
    def hash2(s: pd.Series) -> pd.DataFrame:
        rows = []
        for v in s:
            b = None if v is None else canon_bytes(v, logical)
            if b is None:
                rows.append((None, None, None, None))
            else:
                h1, h2 = _hash2(b)
                rows.append((h1 >> 6, _mask(h1), h2 >> 6, _mask(h2)))
        return pd.DataFrame(rows, columns=["w1", "m1", "w2", "m2"])

    return hash2


def _bloom_pair_cond() -> Column:
    """Keep condition over (key-hash, bloom) pair rows: no bloom or no
    hash keeps the pair; a present bloom keeps it only when both probe
    bits are set (mirrors `bloom_keep_cond` with hash columns instead
    of literals)."""
    def test(w: str, m: str) -> Column:
        word = F.element_at(
            "bloom",
            (F.pmod(F.col(w), F.size("bloom")) + F.lit(1)).cast("int"))
        return word.bitwiseAND(F.col(m)) != 0
    return (F.col("bloom").isNull() | F.col("w1").isNull()
            | (test("w1", "m1") & test("w2", "m2")))


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
    if logical == "timestamp_ms":
        return F.unix_millis(key)
    if logical == "timestamp_s":
        # truncation is sound: a key with sub-second precision can
        # never equal a seconds-resolution stored value, so its bounds
        # test may answer anything; representable keys convert exactly
        return F.unix_seconds(key)
    if logical == "date32":
        return F.datediff(key, F.to_date(F.lit("1970-01-01")))
    return None


_SJ_KEY = "__sj_key"  # reserved internal key-column alias


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
    if logical == "binary":
        # no byte-order bounds are recorded for binary, but the column
        # IS bloomable: a keep-all condition (any non-null row) feeds
        # the bloom equi-join stage, which does the real pruning for
        # point keys (canon_bytes hashes raw bytes, and binary==binary
        # equality has no coercion hazards)
        return F.col("n_nulls") < F.col("n_rows")
    if logical in ("float32", "float64"):
        k = key.cast("double")
        # NaN keys: Spark orders NaN ABOVE +inf, so `max_flt >= NaN`
        # is false and a NaN key fails every BOUNDED segment's test —
        # soundness rests on stats.py's invariant that a NaN-bearing
        # segment always carries NULL float bounds and therefore
        # survives via the otherwise() branch. Do not weaken that
        # invariant without revisiting this condition.
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
                      logical_type: str | None,
                      use_bloom: bool = True) -> DataFrame | None:
    """-> one-column DataFrame of surviving rowgroup_ids, or None when
    the type admits no bounds pruning (caller keeps every rowgroup).
    `keys` must be a single-column DataFrame of distinct probe values.

    Two refinement stages, both distributed:

    1. Bounds: manifest bounds BROADCAST to the keys (metadata-sized);
       the inevitable non-equi join is a broadcast nested loop over
       bounds rows, never over data.
    2. Bloom (`use_bloom`, on by default): surviving (key, rowgroup)
       pairs equi-HASH-join the column's bloom words on rowgroup_id —
       the filters themselves are never broadcast, so 10^6 rowgroups x
       64 KiB of blooms stay distributed — and a pair survives only if
       both of the key's probe bits are set. For high-cardinality
       uniform keys (conv_id) bounds keep nearly everything and the
       bloom does the real pruning, exactly like the literal-probe
       path in `plans/pruning._bloom_eq_cond`. Key hashes come from
       one Arrow-batched UDF over the (small) key side — never over
       table rows."""
    from ..codecs.bloom import BLOOMABLE

    key_name = keys.columns[0]
    kind = keys.schema[key_name].dataType.typeName()
    if logical_type in _PLAIN_INTS:
        # int-domain bounds are sound only for INTEGRAL key columns:
        # the final semi-join compares a float/double/decimal key side
        # in Spark's coerced double domain, where int64s above 2^53
        # collapse — a cast("long") bounds test would drop matching
        # rowgroups (same bijection bound as plans/pruning, bloom)
        if kind not in ("byte", "short", "integer", "long", "boolean"):
            return None
    if logical_type == "string" and kind != "string":
        # byte-order repr bounds are sound only for a STRING key side:
        # the exact semi-join coerces a numeric key against the string
        # column NUMERICALLY ('0042' == 42 matches), a domain where
        # byte-order min/max bound nothing — pruning on them would
        # silently drop matching rowgroups
        return None
    if logical_type == "binary":
        if kind != "binary":
            return None
        if not (use_bloom and "bloom" in manifest.columns):
            # binary has a keep-all bounds cond only so the bloom
            # stage can prune; without blooms there is nothing to do
            return None
    # internal alias: a key column legitimately named like a manifest
    # stat column (n_rows, min_repr, ...) would otherwise be ambiguous
    # after the bounds join
    kdf = (keys.where(keys[key_name].isNotNull())
           .select(keys[key_name].alias(_SJ_KEY)))
    cond = _keys_bounds_cond(logical_type, kdf[_SJ_KEY])
    if cond is None:
        return None
    bloomable = (use_bloom and logical_type in BLOOMABLE
                 and "bloom" in manifest.columns)
    if bloomable:
        h = _bloom_hash_udf(logical_type)(F.col(_SJ_KEY))
        kdf = kdf.select(_SJ_KEY, h.alias("_h")).select(
            _SJ_KEY, "_h.w1", "_h.m1", "_h.w2", "_h.m2")
        # rebuild against the projected frame so the join resolves
        cond = _keys_bounds_cond(logical_type, kdf[_SJ_KEY])
    # shim BEFORE projecting: a legacy manifest (persisted before the
    # typed-bounds columns existed) gets them as NULLs — pruning
    # degrades to bounds-less keeps instead of an unresolved-column
    # error. bloom rides its own equi-join below, never broadcast.
    bounds = (_with_typed_bounds(manifest.where(F.col("column") == column))
              .select("rowgroup_id", "n_rows", "n_nulls",
                      "min_repr", "max_repr", "min_num", "max_num",
                      "min_flt", "max_flt"))
    pairs = kdf.join(F.broadcast(bounds), cond)
    if bloomable:
        blooms = (manifest.where((F.col("column") == column)
                                 & F.col("bloom").isNotNull())
                  .select("rowgroup_id", "bloom"))
        pairs = (pairs.join(blooms, "rowgroup_id", "left")
                 .where(_bloom_pair_cond()))
    return pairs.select("rowgroup_id").distinct()


def semi_join_segments(segments: DataFrame, manifest: DataFrame,
                       column: str, keys: DataFrame,
                       logical_type: str | None,
                       use_bloom: bool = True) -> DataFrame:
    """Segments restricted to rowgroups at least one key can inhabit.
    Falls back to the full segment set when bounds can't speak."""
    ids = keep_ids_for_keys(manifest, column, keys, logical_type,
                            use_bloom=use_bloom)
    if ids is None:
        return segments
    return segments.join(F.broadcast(ids), "rowgroup_id", "leftsemi")
