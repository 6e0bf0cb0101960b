"""Z-order clustering (operators/zorder.py): Morton-code parity with
the pure-Python reference, pure-codegen plan shape, and the actual
point of the feature — a 2-D box probe prunes strictly more rowgroups
under the z-grid layout than under the default conv_id-bucket layout,
with identical query results (layout never changes answers)."""

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from columnstore_spark.operators import (
    compute_bounds,
    decode,
    encode,
    zorder_column,
    zorder_rowgroup_expr,
)
from columnstore_spark.operators.zorder import morton_ref
from columnstore_spark.plans.pruning import prune_rowgroups_by_range
from columnstore_spark.sources.transcripts import load_transcripts

SF_DIR = "/root/testdata/sf0.001"


def test_morton_parity_randomized(spark):
    rng = random.Random(42)
    rows = [(rng.uniform(-1e4, 1e4), rng.randint(-500, 500),
             rng.uniform(0, 1), rng.randint(0, 10**9))
            for _ in range(400)]
    rows += [(float("nan"), 0, 0.5, 1), (None, None, None, None),
             (float("inf"), 500, 1.0, 0), (float("-inf"), -500, 0.0, 2),
             (12345.6, 7, 2.0, 10**9)]  # out-of-bounds value clamps
    df = spark.createDataFrame(rows, "x double, y long, w double, v long")
    for cols, bits in ((["x", "y"], 16), (["x", "y", "w"], 12),
                       (["x", "y", "w", "v"], 15), (["y"], 20)):
        bounds = compute_bounds(df, cols)
        got = df.withColumn("z", zorder_column(df, bounds, bits)).collect()
        for r in got:
            exp = morton_ref({c: r[c] for c in cols}, bounds, bits)
            assert r["z"] == exp, (cols, bits, tuple(r))


def test_compute_bounds_skips_nan(spark):
    df = spark.createDataFrame(
        [(1.0,), (float("nan"),), (9.0,), (None,)], "x double")
    assert compute_bounds(df, ["x"]) == {"x": (1.0, 9.0)}


def test_zorder_handles_timestamps(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, d + 1), d) for d in range(30)],
        "ts timestamp, y long")
    bounds = compute_bounds(df, ["ts", "y"])
    # epoch-micros axis domain
    assert bounds["ts"][0] == dt.datetime(
        2024, 1, 1, tzinfo=dt.timezone.utc).timestamp() * 1e6
    got = df.withColumn("z", zorder_column(df, bounds)).collect()
    for r in got:
        mu = r["ts"].replace(tzinfo=dt.timezone.utc).timestamp() * 1e6
        assert r["z"] == morton_ref({"ts": mu, "y": r["y"]}, bounds)


def test_zorder_is_pure_codegen(spark):
    df = spark.createDataFrame([(1.0, 2)], "x double, y long")
    plan = (df.withColumn("z", zorder_column(df, {"x": (0, 1),
                                                  "y": (0, 9)}))
              ._jdf.queryExecution().executedPlan().toString())
    assert "Python" not in plan  # no UDF anywhere in the row path


def test_zorder_column_validates_shape(spark):
    df = spark.createDataFrame([(1.0,)], "a double")
    with pytest.raises(ValueError):
        zorder_column(df, {})
    with pytest.raises(ValueError):
        zorder_column(df, {c: (0, 1) for c in "abcde"})
    with pytest.raises(ValueError):
        zorder_column(df, {"a": (0, 1), "b": (0, 1)}, bits=32)
    with pytest.raises(ValueError):
        zorder_rowgroup_expr(df, {"a": (0, 1)}, 1 << 40, bits=8)


def test_zorder_rejects_non_numeric_axis(spark):
    """A string axis would cast('double') to NULL on every row and
    collapse the store into grid cell 0 — reject loudly instead."""
    df = spark.createDataFrame([("c1", 1)], "conv_id string, y long")
    with pytest.raises(TypeError, match="non-numeric"):
        compute_bounds(df, ["conv_id"])
    with pytest.raises(TypeError, match="non-numeric"):
        zorder_column(df, {"conv_id": (0, 1)})


def test_compute_bounds_skips_inf(spark):
    df = spark.createDataFrame(
        [(1.0,), (float("inf"),), (float("-inf"),), (9.0,)], "x double")
    assert compute_bounds(df, ["x"]) == {"x": (1.0, 9.0)}


def test_store_cluster_config_validated_at_init(spark, tmp_path):
    from columnstore_spark.store import TranscriptColumnStore
    with pytest.raises(ValueError, match="curve bits"):
        TranscriptColumnStore(spark, str(tmp_path / "a"),
                              cluster_by=("a", "b", "c", "d"))
    with pytest.raises(ValueError, match="keys must match"):
        TranscriptColumnStore(spark, str(tmp_path / "b"),
                              cluster_by=("turn_idx", "ts"),
                              cluster_bounds={"turn_idx": (0, 1)})
    with pytest.raises(ValueError, match="cluster_split"):
        TranscriptColumnStore(spark, str(tmp_path / "c"),
                              cluster_by=("turn_idx",),
                              cluster_split=0)


def test_stream_cluster_config_validated(spark, tmp_path):
    from columnstore_spark.streaming.ingest import encode_stream
    with pytest.raises(ValueError, match="keys must match"):
        encode_stream(spark, str(tmp_path / "in"), str(tmp_path / "w"),
                      str(tmp_path / "c"),
                      cluster_by=("turn_idx", "ts"),
                      cluster_bounds={"ts": (0, 1)})


def _kept(segs, lo_t, hi_t, ts_lo, ts_hi):
    pruned = prune_rowgroups_by_range(segs, "turn_idx", lo_t, hi_t,
                                      logical_type="int32")
    pruned = prune_rowgroups_by_range(pruned, "ts", ts_lo, ts_hi,
                                      logical_type="timestamp_us")
    return pruned


def test_zorder_pruning_beats_linear_layout(spark):
    t = load_transcripts(spark, SF_DIR).cache()
    n_groups = 16
    # turn_idx and ts are CORRELATED in transcripts (turns accrete over
    # days), so the box sits on the diagonal — non-empty (183 rows at
    # sf0.001) yet 2-D selective
    lo_t, hi_t = 20, 35
    ts_lo = dt.datetime(2024, 1, 8, tzinfo=dt.timezone.utc)
    ts_hi = dt.datetime(2024, 1, 16, tzinfo=dt.timezone.utc)

    linear = encode(t, rowgroup_expr=F.pmod(F.xxhash64("conv_id"),
                                            F.lit(n_groups))).cache()
    bounds = compute_bounds(t, ["turn_idx", "ts"])
    z_rg = zorder_rowgroup_expr(t, bounds, n_groups)
    z_sort = zorder_column(t, bounds)
    zed = encode(t, rowgroup_expr=z_rg,
                 order=(z_sort, "conv_id", "turn_idx")).cache()

    def n_kept(segs):
        return (_kept(segs, lo_t, hi_t, ts_lo, ts_hi)
                .select("rowgroup_id").distinct().count())

    kept_linear, kept_z = n_kept(linear), n_kept(zed)
    # the box covers ~5% of the (turn_idx, ts) plane: the z-grid must
    # eliminate rowgroups the conv-hash layout cannot
    assert kept_z < kept_linear, (kept_z, kept_linear)
    assert kept_z <= n_groups // 2

    # layout soundness: both layouts decode to exactly the raw filter
    expect = sorted(map(tuple, t.where(
        F.col("turn_idx").between(lo_t, hi_t)
        & F.col("ts").between(ts_lo, ts_hi)).collect()))
    for segs in (linear, zed):
        got = sorted(map(tuple, decode(
            _kept(segs, lo_t, hi_t, ts_lo, ts_hi), schema=t.schema)
            .where(F.col("turn_idx").between(lo_t, hi_t)
                   & F.col("ts").between(ts_lo, ts_hi))
            .select(*t.columns).collect()))
        assert got == expect
    t.unpersist(), linear.unpersist(), zed.unpersist()


def test_stream_cluster_by(spark, tmp_path):
    """Streaming ingest with a FIXED z-grid: micro-batches land on one
    shared curve (explicit bounds required), union stays bit-identical,
    and the 2-D keep-set is a fraction of the store."""
    import os

    from columnstore_spark.plans.pruning import prune_rowgroup_ids
    from columnstore_spark.sources.warehouse import Warehouse
    from columnstore_spark.streaming.ingest import encode_stream

    t = load_transcripts(spark, SF_DIR).cache()
    inp = str(tmp_path / "in")
    os.makedirs(inp)
    t.coalesce(1).write.mode("append").parquet(inp)

    with pytest.raises(ValueError):
        encode_stream(spark, inp, str(tmp_path / "w0"),
                      str(tmp_path / "c0"), cluster_by=("turn_idx",))

    mu = lambda d: d.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6
    bounds = {"turn_idx": (0.0, 100.0),
              "ts": (mu(dt.datetime(2024, 1, 1)),
                     mu(dt.datetime(2024, 2, 1)))}
    q = encode_stream(spark, inp, str(tmp_path / "w"),
                      str(tmp_path / "c"), num_rowgroups=16,
                      cluster_by=("turn_idx", "ts"),
                      cluster_bounds=bounds)
    q.awaitTermination(120)

    wh = Warehouse(str(tmp_path / "w"))
    decoded = decode(wh.committed_segments(spark))
    assert (sorted(map(tuple, decoded.select(*t.columns).collect()))
            == sorted(map(tuple, t.collect())))
    m = wh.live_manifest(spark)
    total = m.select("rowgroup_id").distinct().count()
    ids = set(prune_rowgroup_ids(m, "turn_idx", 20, 35, False,
                                 logical_type="int32"))
    ids &= set(prune_rowgroup_ids(
        m, "ts", dt.datetime(2024, 1, 8, tzinfo=dt.timezone.utc),
        dt.datetime(2024, 1, 16, tzinfo=dt.timezone.utc), False,
        logical_type="timestamp_us"))
    assert len(ids) <= total // 2, (len(ids), total)
    t.unpersist()


def test_cell_split_bounds_capacity_not_selectivity(spark):
    """cell_split: a dense grid cell splits into k sub-rowgroups (the
    capacity guard for skewed cells) while every sub-rowgroup keeps
    the cell's tight bounding box — so the pruned ROW fraction is
    unchanged and results stay exact."""
    t = load_transcripts(spark, SF_DIR).cache()
    bounds = compute_bounds(t, ["turn_idx", "ts"])
    lo_t, hi_t = 20, 35
    ts_lo = dt.datetime(2024, 1, 8, tzinfo=dt.timezone.utc)
    ts_hi = dt.datetime(2024, 1, 16, tzinfo=dt.timezone.utc)

    plain = encode(t, rowgroup_expr=zorder_rowgroup_expr(t, bounds, 16))
    split = encode(t, rowgroup_expr=zorder_rowgroup_expr(
        t, bounds, 16, cell_split=4))

    def profile(segs):
        m = segs.select("rowgroup_id", "n_rows").distinct()
        groups = m.count()
        biggest = m.agg(F.max("n_rows")).collect()[0][0]
        kept = _kept(segs, lo_t, hi_t, ts_lo, ts_hi)
        kept_rows = (kept.select("rowgroup_id", "n_rows").distinct()
                     .agg(F.sum("n_rows")).collect()[0][0])
        return groups, biggest, kept_rows

    g0, b0, kr0 = profile(plain)
    g1, b1, kr1 = profile(split)
    assert g1 > g0                     # more, smaller rowgroups
    assert b1 < b0                     # capacity actually bounded
    # sub-rowgroups record their ACTUAL bounds (<= the cell box), so
    # the split layout prunes at least as well — never worse
    assert kr1 <= kr0
    # and the decoded result is exact on the split layout
    expect = sorted(map(tuple, t.where(
        F.col("turn_idx").between(lo_t, hi_t)
        & F.col("ts").between(ts_lo, ts_hi)).collect()))
    got = sorted(map(tuple, decode(
        _kept(split, lo_t, hi_t, ts_lo, ts_hi), schema=t.schema)
        .where(F.col("turn_idx").between(lo_t, hi_t)
               & F.col("ts").between(ts_lo, ts_hi))
        .select(*t.columns).collect()))
    assert got == expect
    t.unpersist()


def test_store_cluster_by_facade(spark, tmp_path):
    """`TranscriptColumnStore(cluster_by=...)`: close() and rebuild()
    lay rowgroups along the z-curve; query_where answers the 2-D box
    exactly and its manifest keep-set is a fraction of the store."""
    from columnstore_spark.plans.pruning import prune_rowgroup_ids
    from columnstore_spark.store import TranscriptColumnStore

    t = load_transcripts(spark, SF_DIR).cache()
    lo_t, hi_t = 20, 35
    ts_lo = dt.datetime(2024, 1, 8, tzinfo=dt.timezone.utc)
    ts_hi = dt.datetime(2024, 1, 16, tzinfo=dt.timezone.utc)
    expect = sorted(map(tuple, t.where(
        F.col("turn_idx").between(lo_t, hi_t)
        & F.col("ts").between(ts_lo, ts_hi))
        .select(*t.columns).collect()))

    store = TranscriptColumnStore(spark, str(tmp_path / "zs"),
                                  num_rowgroups=16,
                                  cluster_by=("turn_idx", "ts"))
    store.add_range(t)
    store.close()

    def keep_frac(s):
        m = s.warehouse.live_manifest(spark)
        total = m.select("rowgroup_id").distinct().count()
        ids = prune_rowgroup_ids(m, "turn_idx", lo_t, hi_t, False,
                                 logical_type="int32")
        ids2 = prune_rowgroup_ids(
            m, "ts", ts_lo, ts_hi, False, logical_type="timestamp_us")
        return len(set(ids) & set(ids2)), total

    got = sorted(map(tuple, store.query_where(
        {"turn_idx": (lo_t, hi_t), "ts": (ts_lo, ts_hi)}).collect()))
    assert got == expect
    kept, total = keep_frac(store)
    assert kept <= total // 2, (kept, total)

    # rebuild re-clusters and stays exact; a plain store prunes nothing
    store.rebuild(num_rowgroups=16)
    got = sorted(map(tuple, store.query_where(
        {"turn_idx": (lo_t, hi_t), "ts": (ts_lo, ts_hi)}).collect()))
    assert got == expect
    kept, total = keep_frac(store)
    assert kept <= total // 2, (kept, total)

    plain = TranscriptColumnStore(spark, str(tmp_path / "ps"),
                                  num_rowgroups=16)
    plain.add_range(t)
    plain.close()
    kept_p, total_p = keep_frac(plain)
    assert kept < kept_p, (kept, kept_p)
    t.unpersist()
