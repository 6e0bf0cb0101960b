"""Top-k pushdown — ORDER BY <column> LIMIT k driven by manifest
bounds, so the payload read scales with k, not with the table.

The reference has no ORDER BY; this is the warehouse-scale use of its
typed per-segment stats (`Sequences/Stats.cs:3` — the same
`min_num`/`max_num` bounds that power pruning) for a query the stats
make nearly free. Adaptive two-phase threshold:

1. **Seed** (metadata): rowgroups sorted by their bound (max for
   descending, min for ascending); take the shortest prefix whose
   exact non-null counts cover k.
2. **Threshold** (decode ~1 rowgroup): decode ONLY the seed
   rowgroups' probe column and take its k-th value, tau. Any value in
   the true top-k is >= the global k-th value >= tau (a subset's k-th
   order statistic never exceeds the superset's), so:
3. **Prune + finish**: rowgroups whose bound falls on the wrong side
   of tau (converted to the stored domain, rounded toward keeping
   more) provably cannot contribute; decode the survivors and let
   Spark's TakeOrderedAndProject produce the k rows.

At 100 TB a top-100-by-timestamp touches the manifest, one rowgroup
for tau, and the handful of rowgroups whose max timestamp clears it —
not the table. Soundness mirrors pruning: bound-less segments
(NaN-bearing floats, pre-typed-bounds manifests) are always kept, and
an unusable tau degrades to decode-everything (correct, just not
pruned). Nulls never participate (SQL `WHERE column IS NOT NULL
ORDER BY ... LIMIT k` semantics).

Supported probe columns: the integer family (ints, bool, timestamps,
dates, decimals — compared as stored int64), floats (double bounds),
and strings via the ASCII-gated repr bounds (non-ASCII reprs are
unbounded = always kept; a repr at the 64-char truncation cap is a
PREFIX of the true bound, i.e. a LOWER bound on it — so a truncated
max cannot serve the descending keep test `max >= tau` and those
segments stay unbounded, while a truncated min still soundly serves
the ascending `min <= tau`, which it implies). Nested/binary types
fall back to the unpruned sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codecs.stats import _REPR_CAP
from ..plans.predicates import (
    _exact_pred_cond,
    normalize_where,
    prune_conjunctive,
)
from ..plans.pruning import (
    _ASCII_RE,
    _ISIN_CAP,
    _PLAIN_INT_LOGICALS,
    _to_stored_num,
    _with_typed_bounds,
)
from .decode import decode, schema_from_segments

_INT_BOUND_LOGICALS = set(_PLAIN_INT_LOGICALS) | {
    "date32", "timestamp_s", "timestamp_ms", "timestamp_us",
    "timestamp_ns"}
_SEED_ROWGROUPS = 64  # bounded rowgroups fetched to cover k seed values


def _bound_domain(logical: str) -> str | None:
    """'num' | 'flt' | 'str' | None (no orderable manifest bound)."""
    if (logical in _INT_BOUND_LOGICALS
            or logical.startswith("decimal64_")
            or logical.startswith("decimal128_")):
        return "num"
    if logical in ("float32", "float64"):
        return "flt"
    if logical == "string":
        return "str"
    return None


def _string_bound(descending: bool):
    """Orderable string bound or NULL (= unbounded, always kept).
    Both reprs must be pure ASCII (UTF-8-byte vs UTF-16 order
    agreement needs one ASCII side); a truncated max additionally
    cannot bound the descending test (see module docstring)."""
    ascii_ok = (F.col("min_repr").rlike(_ASCII_RE)
                & F.col("max_repr").rlike(_ASCII_RE))
    if descending:
        return F.when(ascii_ok & (F.length("max_repr") < _REPR_CAP),
                      F.col("max_repr"))
    return F.when(ascii_ok, F.col("min_repr"))


def topk(segments: DataFrame, column: str, k: int,
         descending: bool = True, columns: list[str] | None = None,
         tie_cols: tuple[str, ...] = (),
         logical_type: str | None = None,
         where=None,
         where_logical: str | None = None,
         where_logicals: dict[str, str] | None = None) -> DataFrame:
    """k rows with the largest (default) or smallest non-null `column`
    values, ordered by (`column`, *tie_cols*); pass unique `tie_cols`
    for a deterministic result under ties. `columns` projects the
    output (the probe and tie columns are decoded regardless — only
    rows that survive the threshold ever decode).

    `where=` pushes a row filter INTO the top-k (round-3 verdict #8,
    generalized round 5 — filtered ORDER BY ... LIMIT k stays
    manifest-cheap): either the legacy single-equality
    `(column, value)` tuple or a `query_where`-shaped conjunctive
    predicate dict `{column: probe}` (`None` IS NULL, 2-tuple
    inclusive range, list/set IN-list, else equality). EVERY
    predicate's manifest keep-condition prunes rowgroups BEFORE
    threshold seeding (keep-sets intersect — typed bounds, blooms,
    exact n_nulls), tau is the k-th value among rows matching the
    FULL conjunction within the seed rowgroups (a subset's k-th order
    statistic never exceeds the superset's, and a rowgroup's
    unfiltered bound dominates its filtered one — both prune tests
    stay sound under any subset filter), and the exact conjunction
    re-applies on the decoded survivors as Spark's own predicate —
    so coercion-dependent probes are always Spark-exact here (the
    filter never runs on the encoded form). When the seed rowgroups
    hold fewer than k matching rows, the threshold degrades to
    decode-all-survivors (correct, just less pruned)."""
    if k <= 0:
        raise ValueError("k must be positive")
    # schema + logical type come from the UNPRUNED frame: a fully
    # selective where-prune may legitimately empty the segment set,
    # and the result must then be an empty frame of the right shape
    schema = schema_from_segments(segments)
    if logical_type is None:
        row = (segments.where(F.col("column") == column)
               .select("logical_type").first())
        if row is None:
            raise ValueError(f"no segments for column {column!r}")
        logical_type = row["logical_type"]
    norm = normalize_where(segments, where, where_logical,
                           where_logicals)
    wcols = tuple(p[0] for p in norm)
    order = [F.col(column).desc() if descending else F.col(column).asc()]
    order += [F.col(c).asc() for c in tie_cols]
    need = (None if columns is None
            else sorted({*columns, column, *tie_cols, *wcols}))
    out_cols = columns if columns is not None else [f.name
                                                    for f in schema.fields]
    if any(kind == "in" and not payload
           for _c, kind, payload, _lt in norm):
        # IN () matches nothing -> empty result of the right shape
        return (decode(segments.where(F.lit(False)), schema=schema,
                       columns=need)
                .select(*out_cols))
    if norm:
        segments = prune_conjunctive(segments, norm)
    cond = _exact_pred_cond(norm, any_mode=False) if norm else None

    def row_filter(df: DataFrame) -> DataFrame:
        if cond is not None:
            df = df.where(cond)
        return df.where(F.col(column).isNotNull())

    def finish(segs: DataFrame) -> DataFrame:
        return (row_filter(decode(segs, schema=schema, columns=need))
                .orderBy(*order).limit(k).select(*out_cols))

    domain = _bound_domain(logical_type)
    if domain is None:
        return finish(segments)  # no orderable bounds: unpruned sort

    if domain == "str":
        bound = _string_bound(descending)
    elif descending:
        bound = F.col("max_num" if domain == "num" else "max_flt")
    else:
        bound = F.col("min_num" if domain == "num" else "min_flt")
    m = (_with_typed_bounds(segments)
         .where(F.col("column") == column)
         .select("rowgroup_id", bound.alias("bound"),
                 (F.col("n_rows") - F.col("n_nulls")).alias("n_values")))

    # phase 1: the shortest bound-ordered prefix covering k values
    seed = (m.where(F.col("bound").isNotNull() & (F.col("n_values") > 0))
            .orderBy(F.col("bound").desc() if descending
                     else F.col("bound").asc())
            .limit(_SEED_ROWGROUPS).collect())
    seed_ids, covered = [], 0
    for r in seed:
        seed_ids.append(r["rowgroup_id"])
        covered += r["n_values"]
        if covered >= k:
            break
    if covered < k:
        # fewer than k values in the seeded prefix (tiny store, or the
        # values hide in bound-less segments): no sound threshold
        return finish(segments)

    # phase 2: tau = k-th probe value within the seed rowgroups —
    # offset(k-1).limit(1) ships exactly ONE row to the driver instead
    # of materializing all k probe values just to read the last.
    # Under a row filter only MATCHING rows count toward the k-th, and
    # the seed may then cover fewer than k of them (n_values counted
    # every row) — an empty fetch degrades to the unpruned finish.
    tau_row = (row_filter(decode(segments.where(F.col("rowgroup_id")
                                                .isin(seed_ids)),
                                 schema=schema,
                                 columns=sorted({column, *wcols})))
               .orderBy(order[0]).offset(k - 1).limit(1).collect())
    if not tau_row:
        return finish(segments)
    tau = tau_row[0][column]
    if domain == "str":
        tau_stored = str(tau)
    elif domain == "flt":
        tau_stored = float(tau)
        if tau_stored != tau_stored:  # NaN tau: everything may qualify
            return finish(segments)
    else:
        # round toward keeping more: down when keeping bound >= tau,
        # up when keeping bound <= tau
        tau_stored = _to_stored_num(logical_type, tau,
                                    "hi" if descending else "lo")
        if not isinstance(tau_stored, int):
            return finish(segments)  # unconvertible: no prune

    # phase 3: bound-less rowgroups always survive; bounded ones must
    # clear tau. The kept ids reach the segments parquet scan as a
    # pushed IN filter (oversized keep-sets fall back to a semi-join).
    keep_cond = (F.col("bound").isNull()
                 | (F.col("bound") >= F.lit(tau_stored) if descending
                    else F.col("bound") <= F.lit(tau_stored)))
    # m IS the bounds frame phase 1 built — reuse it rather than
    # rebuilding the typed-bounds projection a second time
    kept = (m.where(keep_cond)
            .select("rowgroup_id").distinct())
    ids = [r["rowgroup_id"] for r in kept.limit(_ISIN_CAP + 1).collect()]
    if len(ids) <= _ISIN_CAP:
        return finish(segments.where(F.col("rowgroup_id").isin(ids)))
    return finish(segments.join(kept, on="rowgroup_id", how="left_semi"))
