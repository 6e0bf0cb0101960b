"""Semantics of the sampling / packing / clustering pipeline ops
(beyond the oracle parity sweep in test_oracle_parity.py):

- connected_components against a Python union-find ground truth, on
  graphs the LSH pair set never produces (long paths — the worst case
  for label-propagation-style algorithms, handled in O(log^2 n) by
  alternating star);
- deterministic-sampling invariants (subset, reproducibility, rates);
- pack_sequences packing invariants (offsets, budget, lane totals).
"""

import random

import pytest
from pyspark.sql import functions as F

from columnstore_spark.functions.pipeline import (
    _PACK_BUDGET,
    _PACK_LANE_RADIX,
    _SAMPLE_PERMILLE,
    _STRAT_DEFAULT,
    _STRAT_RATES,
    connected_components,
    spark_pipeline_df,
)

SF_DIR = "/root/testdata/sf0.001"
DIM = 16


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    groups = {}
    for n in list(parent):
        groups.setdefault(find(n), set()).add(n)
    out = {}
    for root, members in groups.items():
        rep = min(members)
        for m in members:
            out[m] = (rep, len(members))
    return out


def _check_cc(spark, edges):
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r["doc_id"]: (r["cluster_rep"], r["cluster_size"])
           for r in connected_components(df).collect()}
    assert got == _uf_components(edges)


def test_cc_path_graph(spark):
    """A 24-node path — diameter 23, the case that defeats one-hop
    min propagation — plus an isolated pair and a triangle."""
    edges = [(i, i + 1) for i in range(1, 24)]
    edges += [(100, 101), (200, 201), (201, 202), (200, 202)]
    _check_cc(spark, edges)


def test_cc_random_graph(spark):
    rng = random.Random(7)
    nodes = list(range(1, 61))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(50)]
    edges = [(u, v) for u, v in edges if u != v]
    _check_cc(spark, edges)


@pytest.fixture(scope="module")
def docs_registered(spark):
    spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .createOrReplaceTempView("documents")
    return spark.table("documents")


def test_dedup_clusters_matches_unionfind(spark, docs_registered):
    """The driver op's clusters == union-find over the very pair set
    the minhash op reports (internal consistency, independent of the
    DuckDB oracle)."""
    pairs = spark_pipeline_df(spark, "dedup_minhash_lsh", DIM)
    edge_list = [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]
    assert edge_list, "expected near-dup pairs in testdata"
    got = {r["doc_id"]: (r["cluster_rep"], r["cluster_size"])
           for r in spark_pipeline_df(spark, "dedup_clusters", DIM).collect()}
    assert got == _uf_components(edge_list)


def test_sample_hash_subset_and_deterministic(spark, docs_registered):
    s1 = spark_pipeline_df(spark, "sample_hash", DIM).toPandas()
    s2 = spark_pipeline_df(spark, "sample_hash", DIM).toPandas()
    assert sorted(s1["doc_id"]) == sorted(s2["doc_id"])  # reproducible
    all_ids = {r["doc_id"] for r in docs_registered.collect()}
    assert set(s1["doc_id"]) <= all_ids                   # subset
    assert (s1["sample_u"] < _SAMPLE_PERMILLE).all()
    # rate sanity: binomial(n, p) within 5 sigma
    n, p = len(all_ids), _SAMPLE_PERMILLE / 1000.0
    sigma = (n * p * (1 - p)) ** 0.5
    assert abs(len(s1) - n * p) < 5 * sigma


def test_sample_stratified_rates(spark, docs_registered):
    s = spark_pipeline_df(spark, "sample_stratified", DIM).toPandas()
    pop = docs_registered.groupBy("lang").count().collect()
    pop = {r["lang"]: r["count"] for r in pop}
    got = s.groupby("lang", dropna=False)["doc_id"].count().to_dict()
    for lang, n in pop.items():
        rate = _STRAT_RATES.get(lang, _STRAT_DEFAULT) / 1000.0
        k = got.get(lang, 0)
        sigma = max((n * rate * (1 - rate)) ** 0.5, 1.0)
        assert abs(k - n * rate) <= 5 * sigma, (lang, k, n, rate)
    # every kept row respects its stratum threshold
    assert (s["sample_u"] < s["rate_permille"]).all()


def test_pack_sequences_invariants(spark, docs_registered):
    p = spark_pipeline_df(spark, "pack_sequences", DIM).toPandas()
    assert len(p) == docs_registered.count()  # packing drops nothing
    assert ((p["pack_offset"] >= 0) & (p["pack_offset"] < _PACK_BUDGET)).all()
    assert (p["pack_id"] // _PACK_LANE_RADIX == p["lane"]).all()
    for lane, g in p.groupby("lane"):
        g = g.sort_values("doc_id").reset_index(drop=True)
        # concat-then-split: doc k starts where doc k-1's tokens end
        cum = g["n_tok"].cumsum() - g["n_tok"]
        assert (g["pack_offset"] == cum % _PACK_BUDGET).all()
        assert (g["pack_id"] == lane * _PACK_LANE_RADIX
                + cum // _PACK_BUDGET).all()
        assert g["pack_id"].is_monotonic_increasing


def test_sample_temperature_rates_and_subset(spark, docs_registered):
    """Temperature (alpha=0.5) mixing: every language's keep rate must
    equal floor(1000*sqrt(min_count/n_lang)) computed independently in
    Python; the rarest language is kept whole; kept rows are a subset
    of the corpus and the run is deterministic."""
    import math

    docs = docs_registered
    counts = {r["lang"]: r["n"] for r in
              docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    min_count = min(counts.values())
    out = spark_pipeline_df(spark, "sample_temperature", DIM)
    rows = out.collect()
    rates = {}
    for r in rows:
        rates.setdefault(r["lang"], r["rate_permille"])
        assert r["rate_permille"] == rates[r["lang"]]
        assert r["sample_u"] < r["rate_permille"]
        assert r["n_lang"] == counts[r["lang"]]
    for lang, rate in rates.items():
        assert rate == math.floor(
            1000 * math.sqrt(min_count / counts[lang])), lang
    rare = min(counts, key=counts.get)
    assert rates[rare] == 1000  # rarest language kept whole
    # deterministic: a rerun yields the identical kept set
    again = {r["doc_id"] for r in
             spark_pipeline_df(spark, "sample_temperature", DIM).collect()}
    assert again == {r["doc_id"] for r in rows}


def test_sample_temperature_edges_duckdb():
    """Planted edges (DuckDB side — the same spine Spark runs): a
    head language whose derived rate floors to 0 is clamped to 1
    permille, never deleted; NULL-lang docs form their own stratum
    and are sampled, not dropped."""
    import duckdb

    from columnstore_spark.functions.pipeline import all_pipeline_sql

    sql = all_pipeline_sql(DIM)["sample_temperature"]["duck"]

    con = duckdb.connect()
    con.sql("create table documents as "
            "select i as doc_id, "
            "case when i = 0 then 'rare' else 'big' end as lang "
            "from range(1100000) t(i)")
    df = con.sql(sql).df()
    big = df[df["lang"] == "big"]
    # floor(1000*sqrt(1/1099999)) = 0 -> clamped to 1 permille
    assert (big["rate_permille"] == 1).all()
    assert len(big) > 0, "head language must never be deleted"
    assert set(df[df["lang"] == "rare"]["rate_permille"]) <= {1000}

    con2 = duckdb.connect()
    con2.sql("create table documents as "
             "select i as doc_id, "
             "case when i < 5 then NULL else 'en' end as lang "
             "from range(105) t(i)")
    df2 = con2.sql(sql).df()
    nulls = df2[df2["lang"].isna()]
    assert len(nulls) > 0, "NULL-lang stratum must be sampled"
    assert (nulls["rate_permille"] == 1000).all()  # rarest stratum
    assert (df2[~df2["lang"].isna()]["rate_permille"] == 223).all()
