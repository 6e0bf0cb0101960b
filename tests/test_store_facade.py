"""TranscriptColumnStore facade — the reference's IColumnStore surface
end to end: AddRange -> Close -> enumerate -> stats -> queries ->
Rebuild, mirroring the reference's store-level test flow
(`DeltaStoreTests.cs:43-187`: add, close, second row group, stats)."""

import os

import pytest
from pyspark.sql import functions as F

from columnstore_spark.store import TranscriptColumnStore
from columnstore_spark.sources.transcripts import load_transcripts

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture()
def t(spark):
    return load_transcripts(spark, SF_DIR).persist()


def _sorted(df, cols):
    return df.orderBy("conv_id", "turn_idx").select(cols).collect()


def test_store_lifecycle(spark, tmp_path, t):
    cols = t.columns
    store = TranscriptColumnStore(spark, str(tmp_path / "store"),
                                  num_rowgroups=4)
    first = t.where(F.col("turn_idx") % 2 == 0)
    second = t.where(F.col("turn_idx") % 2 == 1)

    # AddRange + mid-ingest enumeration: delta rows visible before close
    store.add_range(first)
    assert _sorted(store.rows(), cols) == _sorted(first, cols)

    # Close compacts; enumeration now reads the solid form
    assert store.close() == 1
    assert _sorted(store.solid_rows(), cols) == _sorted(first, cols)

    # second batch: solid + delta union (reference enumeration order)
    store.add_range(second)
    assert _sorted(store.rows(), cols) == _sorted(t, cols)
    assert store.close() == 1
    assert _sorted(store.rows(), cols) == _sorted(t, cols)
    # close is idempotent
    assert store.close() == 0

    # stats tree rollup (metadata only)
    st = {r["column"]: r for r in store.stats().collect()}
    assert st["conv_id"]["n_rows"] == t.count()
    assert st["tool"]["n_nulls"] == t.where(F.col("tool").isNull()).count()
    assert st["text"]["enc_bytes"] < st["text"]["raw_bytes"]

    # queries behind manifest pruning
    got = store.query_by_value("role", "tool").count()
    assert got == t.where(F.col("role") == "tool").count() > 0

    lo, hi = "c000000000000", "c000000000005"
    got = store.query_by_range("conv_id", lo, hi).count()
    assert got == t.where(F.col("conv_id").between(lo, hi)).count() > 0

    # a second handle on the same root sees the same store
    store2 = TranscriptColumnStore(spark, str(tmp_path / "store"),
                                   num_rowgroups=4)
    assert _sorted(store2.rows(), cols) == _sorted(t, cols)


def test_store_rebuild(spark, tmp_path, t):
    cols = t.columns
    store = TranscriptColumnStore(spark, str(tmp_path / "store"),
                                  num_rowgroups=4)
    store.add_range(t.where(F.col("turn_idx") % 2 == 0))
    store.close()
    store.add_range(t.where(F.col("turn_idx") % 2 == 1))  # left in delta

    store.rebuild(num_rowgroups=2)
    # everything (solid + pending delta) is solid in the new generation
    assert _sorted(store.solid_rows(), cols) == _sorted(t, cols)
    assert store.close() == 0  # nothing pending after rebuild
    assert _sorted(store.rows(), cols) == _sorted(t, cols)


def test_store_rebuild_crash_is_atomic(spark, tmp_path, t):
    """A rebuild that dies mid-encode must leave the store exactly as
    it was: the staged generation is invisible (dot-prefixed temp dir),
    so no reader ever sees a committed generation whose folded delta
    batches still look pending (which would double-count every folded
    row on the next close). A retried rebuild then succeeds."""
    cols = t.columns
    store = TranscriptColumnStore(spark, str(tmp_path / "store"),
                                  num_rowgroups=4)
    store.add_range(t.where(F.col("turn_idx") % 2 == 0))
    store.close()
    store.add_range(t.where(F.col("turn_idx") % 2 == 1))  # left in delta

    from columnstore_spark.sources.warehouse import Warehouse
    real = Warehouse.encode_resumable

    def boom(self, *a, **kw):
        real(self, *a, **kw)          # segments + manifest land on disk
        raise RuntimeError("killed after staged commit, before rename")

    Warehouse.encode_resumable = boom
    try:
        with pytest.raises(RuntimeError):
            store.rebuild(num_rowgroups=2)
    finally:
        Warehouse.encode_resumable = real

    # a fresh handle sees the OLD state, every row exactly once
    store2 = TranscriptColumnStore(spark, str(tmp_path / "store"),
                                   num_rowgroups=4)
    assert _sorted(store2.rows(), cols) == _sorted(t, cols)
    # retry completes and still yields every row exactly once
    store2.rebuild(num_rowgroups=2)
    assert _sorted(store2.solid_rows(), cols) == _sorted(t, cols)
    assert store2.close() == 0


def test_query_where_conjunction(spark, tmp_path, t):
    """Multi-column AND: intersected manifest pruning (bloom on
    conv_id, dict bounds on role, typed bounds on turn_idx) returns
    exactly Spark's own conjunctive filter."""
    store = TranscriptColumnStore(spark, str(tmp_path / "store"),
                                  num_rowgroups=4)
    store.add_range(t)
    store.close()
    cols = t.columns

    got = store.query_where({"role": "tool", "turn_idx": (2, 9)})
    exp = t.where((F.col("role") == "tool")
                  & F.col("turn_idx").between(2, 9))
    assert _sorted(got, cols) == _sorted(exp, cols)

    # point + equality pair (bloom-prunable key first)
    key = t.select("conv_id").orderBy("conv_id").first()["conv_id"]
    got = store.query_where({"conv_id": key, "role": "user"})
    exp = t.where((F.col("conv_id") == key) & (F.col("role") == "user"))
    assert _sorted(got, cols) == _sorted(exp, cols)

    # range on the ts column combined with a string equality
    import datetime as dt
    lo = t.agg(F.min("ts")).first()[0]
    hi = lo + dt.timedelta(days=3)
    got = store.query_where({"ts": (lo, hi), "role": "assistant"})
    exp = t.where(F.col("ts").between(lo, hi)
                  & (F.col("role") == "assistant"))
    assert _sorted(got, cols) == _sorted(exp, cols)


def test_explain_where_truth_table(spark, tmp_path, t):
    """explain_where: per-rowgroup verdicts ride the same keep-set
    switch query_where intersects — `kept` rowgroups are EXACTLY the
    ids whose decoded rows can contain matches, and the decode set
    the query touches is a subset of them."""
    store = TranscriptColumnStore(spark, str(tmp_path / "store"),
                                  num_rowgroups=4)
    store.add_range(t)
    store.close()
    preds = {"role": "tool", "turn_idx": (2, 9)}
    ex = store.explain_where(preds).collect()
    assert {r["rowgroup_id"] for r in ex} == {
        r["rowgroup_id"] for r in
        store.warehouse.live_manifest(spark)
        .select("rowgroup_id").distinct().collect()}
    for r in ex:
        want = ((r["keep_role"] is not False)
                and (r["keep_turn_idx"] is not False))
        assert r["kept"] == want, r
    # rows from non-kept rowgroups can never match: the filtered
    # source restricted to kept ids equals the full filtered source
    kept_ids = [r["rowgroup_id"] for r in ex if r["kept"]]
    got = store.query_where(preds)
    exp = t.where((F.col("role") == "tool")
                  & F.col("turn_idx").between(2, 9))
    assert _sorted(got, t.columns) == _sorted(exp, t.columns)
    assert len(kept_ids) <= 4
    # unprunable probe shape (IN-list past the 256-value prune cap)
    # -> NULL verdict for that predicate, conservative kept
    ex2 = store.explain_where({"turn_idx": list(range(300)),
                               "role": "tool"})
    for r in ex2.collect():
        assert r["keep_turn_idx"] is None
        assert r["kept"] == (r["keep_role"] is not False)
    with pytest.raises(ValueError):
        store.explain_where({})
    # pending schema evolution on a PROBED column: query_where decodes
    # through the null-filling fallback, so the truth table must say
    # "all kept", not report manifest keep-sets the real query ignores
    store.add_column("lang", "string")
    ex3 = store.explain_where({"lang": None, "role": "tool"}).collect()
    assert all(r["kept"] for r in ex3)
    assert all(r["keep_lang"] is None and r["keep_role"] is None
               for r in ex3)
    # fully-covered probes keep the exact manifest truth table
    ex4 = store.explain_where(preds).collect()
    assert [(r["rowgroup_id"], r["kept"]) for r in ex4] == \
           [(r["rowgroup_id"], r["kept"]) for r in ex]
    # unknown column raises like query_where does
    with pytest.raises(ValueError, match="unknown column"):
        store.explain_where({"nope": 1})


def test_explain_any_truth_table(spark, tmp_path, t):
    """explain_any: kept = union of branch keep-sets; one unprunable
    branch -> all kept (the conservative no-op query_any takes)."""
    store = TranscriptColumnStore(spark, str(tmp_path / "store"),
                                  num_rowgroups=4)
    store.add_range(t)
    store.close()
    ex = store.explain_any({"role": "tool", "turn_idx": (2, 9)}).collect()
    for r in ex:
        assert r["kept"] == bool(r["keep_role"] or r["keep_turn_idx"]), r
    # duplicate-column pair list gets distinct verdict labels
    ex2 = store.explain_any([("role", "tool"), ("role", "user")])
    assert "keep_role" in ex2.columns and "keep_role_" in ex2.columns
    # unprunable branch (IN-list past the prune cap) -> everything kept
    ex3 = store.explain_any({"turn_idx": list(range(300)),
                             "role": "tool"}).collect()
    assert all(r["kept"] for r in ex3)
    assert all(r["keep_turn_idx"] is None for r in ex3)
    with pytest.raises(ValueError):
        store.explain_any([])


def test_query_where_empty_intersection_keeps_schema(spark, tmp_path, t):
    store = TranscriptColumnStore(spark, str(tmp_path / "store"),
                                  num_rowgroups=4)
    store.add_range(t)
    store.close()
    out = store.query_where({"conv_id": "zzz-absent", "role": "user"})
    assert out.count() == 0
    assert set(out.columns) == set(t.columns)


def test_aggregate_facade_matches_direct(spark, tmp_path, t):
    store = TranscriptColumnStore(spark, str(tmp_path / "store"),
                                  num_rowgroups=4)
    store.add_range(t)
    store.close()
    a = {r["col_name"]: r.asDict() for r in store.aggregate().collect()}
    d = t.agg(F.count("*"), F.min("turn_idx"), F.max("turn_idx"),
              F.sum("turn_idx"), F.min("conv_id"), F.max("conv_id"),
              F.count("tool")).first()
    assert a["turn_idx"]["n_rows"] == d[0]
    assert a["turn_idx"]["min_long"] == d[1]
    assert a["turn_idx"]["max_long"] == d[2]
    assert int(a["turn_idx"]["sum_dec"]) == d[3]
    assert a["conv_id"]["min_str"] == d[4][:64]
    assert a["conv_id"]["max_str"] == d[5][:64]
    assert a["tool"]["n_values"] == d[6]
    # metadata-only: the executed plan never reads the payload column
    plan = store.aggregate()._jdf.queryExecution().executedPlan().toString()
    scan = plan[plan.index("ReadSchema"):].splitlines()[0]
    assert "payload" not in scan
    # encoded-domain GROUP BY through the facade (incl. NULL group)
    got = {r["value"]: r["cnt"] for r in store.group_count("tool").collect()}
    exp = {r[0]: r[1] for r in t.groupBy("tool").count().collect()}
    assert got == exp


def test_group_agg_facade_where(spark, tmp_path, t):
    """Facade group_agg with a pushed predicate: manifest pruning +
    encoded probe on the safe path, decode fallback when the probe's
    Spark coercion can't ride the exact-typed kernels — identical
    results either way."""
    store = TranscriptColumnStore(spark, str(tmp_path / "ga"))
    store.add_range(t)
    store.close()

    def norm(df):
        return {r["value"]: (r["cnt"], r["n_agg"], r["sum_agg"],
                             r["min_agg"], r["max_agg"])
                for r in df.collect()}

    exp = {r["role"]: (r["cnt"], r["n_agg"], r["sum_agg"],
                       r["lo"], r["hi"])
           for r in t.where(F.col("turn_idx") == 3)
           .groupBy("role").agg(
               F.count(F.lit(1)).alias("cnt"),
               F.count("turn_idx").alias("n_agg"),
               F.sum("turn_idx").cast("long").alias("sum_agg"),
               F.min("turn_idx").alias("lo"),
               F.max("turn_idx").alias("hi")).collect()}
    # safe probe: int on int32 — encoded path
    assert norm(store.group_agg("role", "turn_idx",
                                where=("turn_idx", 3))) == exp
    # coercion probe: string on int32 — decode fallback, same answer
    assert norm(store.group_agg("role", "turn_idx",
                                where=("turn_idx", "3"))) == exp


def test_query_any_disjunction(spark, tmp_path, t):
    """Multi-column OR: the keep-set UNION prunes on the manifest in
    one pass, results are exactly Spark's own disjunctive filter —
    including IN-list and IS NULL branches and the pending-delta
    union."""
    store = TranscriptColumnStore(spark, str(tmp_path / "store"),
                                  num_rowgroups=4)
    store.add_range(t)
    store.close()
    cols = t.columns

    key = t.select("conv_id").orderBy("conv_id").first()["conv_id"]
    got = store.query_any({"conv_id": key, "turn_idx": (58, 63),
                           "role": "system"})
    exp = t.where((F.col("conv_id") == key)
                  | F.col("turn_idx").between(58, 63)
                  | (F.col("role") == "system"))
    assert _sorted(got, cols) == _sorted(exp, cols)

    # IS NULL and IN-list branches; list-of-pairs input form
    got = store.query_any([("tool", None), ("role", ["system"])])
    exp = t.where(F.col("tool").isNull() | (F.col("role") == "system"))
    assert _sorted(got, cols) == _sorted(exp, cols)

    # empty IN branches drop; all-empty means no rows, schema intact
    got = store.query_any({"role": []})
    assert got.count() == 0 and set(got.columns) == set(cols)

    # column projection keeps predicate columns internal only
    got = store.query_any({"role": "system", "turn_idx": (58, 63)},
                          columns=["conv_id", "text"])
    assert got.columns == ["conv_id", "text"]

    # read-your-writes: pending delta rows join the disjunction
    extra = t.limit(7).withColumn("role", F.lit("system"))
    store.add_range(extra)
    got = store.query_any({"role": "system"}, include_pending=True)
    n_solid = t.where(F.col("role") == "system").count()
    assert got.count() == n_solid + 7


def test_query_any_prune_union(spark, t):
    """prune_rowgroup_ids_any returns the UNION of per-branch
    keep-sets, and degrades to None (no pruning) when any branch is
    unprunable."""
    from columnstore_spark.operators import encode, manifest_of
    from columnstore_spark.plans.pruning import (
        prune_rowgroup_ids,
        prune_rowgroup_ids_any,
        prune_rowgroup_ids_null,
    )

    segs = encode(t, rowgroup_expr=F.expr(
        "CAST(substring(conv_id, 2) AS BIGINT) % 4")).persist()
    m = manifest_of(segs)
    a = prune_rowgroup_ids(m, "turn_idx", 58, 63, False,
                           logical_type="int32")
    b = prune_rowgroup_ids_null(m, "tool")
    u = prune_rowgroup_ids_any(
        m, [("turn_idx", "range", (58, 63), "int32"),
            ("tool", "null", None, "string")])
    assert u is not None and set(u) == set(a) | set(b)

    # a range on a binary logical can't prune (blooms are eq-only,
    # binary has no typed bounds) -> the whole disjunction no-ops
    u = prune_rowgroup_ids_any(
        m, [("turn_idx", "range", (58, 63), "int32"),
            ("text", "range", (b"a", b"z"), "binary")])
    assert u is None
    segs.unpersist()


def test_distinct_and_count_distinct(spark, tmp_path, t):
    """Encoded-domain SELECT DISTINCT / COUNT(DISTINCT): dictionary
    unions match Spark's own distinct, SQL null semantics throughout
    (distinct includes the NULL row, count_distinct excludes it)."""
    store = TranscriptColumnStore(spark, str(tmp_path / "store"),
                                  num_rowgroups=4)
    store.add_range(t)
    store.close()

    for col in ("role", "tool", "conv_id", "turn_idx", "ts"):
        got = sorted((r["value"] for r in store.distinct(col).collect()),
                     key=lambda v: (v is None, v))
        exp = sorted((r[0] for r in t.select(col).distinct().collect()),
                     key=lambda v: (v is None, v))
        assert got == exp, col
        n = store.count_distinct(col).first()["n_distinct"]
        assert n == t.agg(F.count_distinct(F.col(col))).first()[0], col


def test_empty_add_range_never_bricks_the_store(spark, tmp_path, t):
    """An empty batch commits no manifest rows, so pre-fix it stayed
    pending FOREVER and _require_closed blocked every mutation.
    add_range now refuses to write it (returns -1); a legacy zero-row
    batch already on disk is retired by close()."""
    store = TranscriptColumnStore(spark, str(tmp_path / "store"),
                                  num_rowgroups=4)
    store.add_range(t)
    assert store.add_range(t.limit(0)) == -1          # no-op, nothing written
    assert store.close() == 1
    # legacy path: force an empty batch dir onto disk
    t.limit(0).write.parquet(f"{store._delta_root()}/batch_000007")
    assert store._pending_batches() == ["batch_000007"]
    assert store.close() == 1                         # retired, not encoded
    assert store._pending_batches() == []
    victim = t.select("conv_id").first()["conv_id"]
    out = store.delete_where("conv_id", victim)       # mutations unblocked
    assert out["rows_deleted"] > 0


def test_add_range_validates_schema(spark, tmp_path, t):
    """Silent schema drift (a wider or retyped batch) would bypass the
    schema log every evolution guard keys on — refuse it up front."""
    store = TranscriptColumnStore(spark, str(tmp_path / "store"),
                                  num_rowgroups=4)
    store.add_range(t.limit(50))
    with pytest.raises(ValueError, match="add_column"):
        store.add_range(t.limit(5).withColumn("extra", F.lit(1)))
    with pytest.raises(ValueError, match="type mismatch"):
        store.add_range(
            t.limit(5).withColumn("turn_idx",
                                  F.col("turn_idx").cast("long")))
    # sanctioned evolution still works: add_column then a wider batch
    store.close()
    store.add_column("extra", "bigint")
    store.add_range(t.limit(5).withColumn("extra", F.lit(1).cast("bigint")))
    assert store.close() == 1


def test_pinned_open_is_readonly_on_disk(spark, tmp_path, t):
    """Opening a pinned (time-travel) generation must not mkdir on the
    store root — it is contractually read-only (read-only mounts)."""
    import shutil as _sh

    root = str(tmp_path / "store")
    store = TranscriptColumnStore(spark, root, num_rowgroups=4)
    store.add_range(t.limit(100))
    store.close()
    snap = str(tmp_path / "snapshot")
    _sh.copytree(root, snap)
    _sh.rmtree(f"{snap}/delta")                       # snapshot w/o delta dir
    pinned = TranscriptColumnStore(spark, snap, generation=0)
    assert not os.path.exists(f"{snap}/delta")        # nothing created
    assert pinned.rows().count() == 100


def test_rebuild_defaults_to_capacity_sized_groups(spark, tmp_path, t):
    """rebuild() with no argument must not funnel the store into ONE
    rowgroup (single-task OOM hazard): groups default to
    ceil(rows / rows_per_segment)."""
    store = TranscriptColumnStore(spark, str(tmp_path / "store"),
                                  num_rowgroups=4, rows_per_segment=300)
    store.add_range(t)                                 # 1000 rows at sf0.001
    store.close()
    before = _sorted(store.rows(), t.columns)
    store.rebuild()
    m = store.warehouse.live_manifest(spark)
    n_groups = m.select("rowgroup_id").distinct().count()
    assert n_groups >= 3                               # ceil(1000/300) = 4
    assert _sorted(store.rows(), t.columns) == before
