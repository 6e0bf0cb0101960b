"""Distributed semi-join: correctness vs a plain Spark semi-join on the
decoded table, rowgroup pruning effectiveness, and plan shape (the only
nested loop is keys x broadcast manifest bounds; the exactness join is
a hash join)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from columnstore_spark.operators.semijoin import keep_ids_for_keys
from columnstore_spark.store import TranscriptColumnStore


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory, transcripts):
    root = str(tmp_path_factory.mktemp("semijoin_store"))
    s = TranscriptColumnStore(spark, root, num_rowgroups=8)
    s.add_range(transcripts)
    s.close()
    return s


def _expected(transcripts, keys, on):
    return (transcripts.join(keys, transcripts[on] == keys[keys.columns[0]],
                                "leftsemi")
            .orderBy("conv_id", "turn_idx").collect())


def test_semi_join_string_keys(spark, store, transcripts):
    keys = (transcripts.where(F.col("tool").isNotNull())
            .select("conv_id").distinct())
    got = (store.semi_join(keys, on="conv_id")
           .orderBy("conv_id", "turn_idx").collect())
    assert got == _expected(transcripts, keys, "conv_id")
    assert len(got) > 0


def test_semi_join_int_keys(spark, store, transcripts):
    keys = spark.range(0, 5).select(F.col("id").cast("int").alias("k"))
    got = (store.semi_join(keys, on="turn_idx")
           .orderBy("conv_id", "turn_idx").collect())
    assert got == _expected(transcripts, keys, "turn_idx")


def test_semi_join_prunes_rowgroups(spark, store, transcripts):
    # one conversation's keys must not keep every rowgroup
    one = transcripts.select("conv_id").orderBy("conv_id").limit(1)
    m = store.warehouse.manifest(spark)
    total = m.select("rowgroup_id").distinct().count()
    ids = keep_ids_for_keys(m, "conv_id", one, "string")
    assert ids is not None
    kept = ids.count()
    assert 0 < kept < total


def test_semi_join_bloom_refines_bounds(spark, store, transcripts):
    # hash-bucketed rowgroups make every rowgroup's conv_id bounds span
    # nearly the whole key space — bounds keep (almost) everything, the
    # bloom stage does the real pruning (the point-lookup gap blooms
    # were built for)
    one = transcripts.select("conv_id").orderBy("conv_id").limit(1)
    m = store.warehouse.manifest(spark)
    bounds_only = keep_ids_for_keys(m, "conv_id", one, "string",
                                    use_bloom=False).count()
    with_bloom = keep_ids_for_keys(m, "conv_id", one, "string",
                                   use_bloom=True).count()
    assert 0 < with_bloom <= bounds_only
    # the fixture's store blooms conv_id by default; a single key must
    # not keep more than half the rowgroups (FPR ~5% per segment)
    total = m.select("rowgroup_id").distinct().count()
    assert with_bloom <= max(1, total // 2)


def test_semi_join_empty_and_missing_keys(spark, store, transcripts):
    empty = spark.createDataFrame([], "k string")
    assert store.semi_join(empty, on="conv_id").count() == 0
    missing = spark.createDataFrame([("zzz-no-such-conv",)], "k string")
    assert store.semi_join(missing, on="conv_id").count() == 0
    # null keys never match (SQL IN semantics)
    nulls = spark.createDataFrame([(None,)], "k string")
    assert store.semi_join(nulls, on="conv_id").count() == 0


def test_semi_join_projection_and_pending(spark, store, transcripts):
    keys = transcripts.select("conv_id").distinct().limit(3)
    out = store.semi_join(keys, on="conv_id", columns=["conv_id", "text"])
    assert out.columns == ["conv_id", "text"]
    exp = {(r["conv_id"], r["text"])
           for r in transcripts.join(keys, "conv_id", "leftsemi")
           .select("conv_id", "text").collect()}
    assert {(r[0], r[1]) for r in out.collect()} == exp


def test_semi_join_plan_shape(spark, store, transcripts):
    keys = transcripts.select("conv_id").distinct().limit(10)
    out = store.semi_join(keys, on="conv_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the exactness join must be a hash semi-join, never nested-loop
    semi_lines = [ln for ln in plan.splitlines() if "LeftSemi" in ln]
    assert semi_lines, plan
    assert all("HashJoin" in ln for ln in semi_lines), plan
    assert "CartesianProduct" not in plan


def test_numeric_keys_on_string_column_never_prune(spark, store):
    """Byte-order string bounds are unsound for a numeric key side
    (Spark's exact join coerces '0042' == 42 numerically): the bounds
    stage must refuse to prune, not silently drop matching rowgroups."""
    m = store.warehouse.live_manifest(spark)
    int_keys = spark.createDataFrame([(42,)], "k int")
    assert keep_ids_for_keys(m, "conv_id", int_keys, "string") is None
    # a string key side still prunes
    str_keys = spark.createDataFrame([("c000000000001",)], "k string")
    kept = keep_ids_for_keys(m, "conv_id", str_keys, "string")
    assert kept is not None and kept.count() >= 1


def test_stat_named_key_column(spark, store, transcripts):
    """A key column named like a manifest stat column must not blow up
    in an ambiguous-reference error (internal alias)."""
    keys = (transcripts.select(F.col("conv_id").alias("n_rows"))
            .distinct().limit(4))
    got = (store.semi_join(keys, on="conv_id", key_col="n_rows")
           .orderBy("conv_id", "turn_idx").collect())
    assert got == _expected(transcripts,
                            keys.withColumnRenamed("n_rows", "k"),
                            "conv_id")


def test_semi_join_binary_keys_prune_via_bloom(spark, tmp_path):
    """Binary key columns have no byte-order bounds, but they ARE
    bloomable: a keep-all bounds condition feeds the bloom equi-join,
    which prunes point keys (round-3 review finding — previously a
    full-store decode)."""
    from pyspark.sql import types as T

    from columnstore_spark.operators import encode
    from columnstore_spark.operators.semijoin import semi_join_segments

    sch = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("b", T.BinaryType(), False),
    ])
    rows = [(f"c{i:04d}", bytes([i % 251, (i * 7) % 251, i % 13]))
            for i in range(600)]
    df = spark.createDataFrame(rows, sch)
    segs = encode(df, rowgroup_expr=F.pmod(F.xxhash64("conv_id"),
                                           F.lit(8)),
                  order=("conv_id",), bloom_columns=("b",)).cache()
    m = segs.drop("payload")
    keys = spark.createDataFrame([(bytes([5, 35, 5]),)], "k binary")
    ids = keep_ids_for_keys(m, "b", keys, "binary")
    assert ids is not None                   # bloom path engages
    kept = ids.count()
    total = segs.select("rowgroup_id").distinct().count()
    assert 0 < kept <= max(1, total // 2)    # real pruning
    # exactness: semi-join result equals Spark's own
    from columnstore_spark.operators import decode
    pruned = semi_join_segments(segs, m, "b", keys, "binary")
    got = (decode(pruned, schema=df.schema)
           .join(keys, F.col("b") == F.col("k"), "leftsemi"))
    exp = df.where(df["b"] == bytes([5, 35, 5]))
    assert sorted(map(tuple, got.collect())) == \
           sorted(map(tuple, exp.collect()))
    # no blooms -> nothing to prune on, keep-all contract
    assert keep_ids_for_keys(m.drop("bloom"), "b", keys,
                             "binary") is None
    # mismatched key side type -> no pruning
    skeys = spark.createDataFrame([("x",)], "k string")
    assert keep_ids_for_keys(m, "b", skeys, "binary") is None
    segs.unpersist()
