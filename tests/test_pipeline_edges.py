"""Pipeline-operator edge corpus: empty / 1-token / sub-8-char docs
through text_metrics and minhash on BOTH engines. Caught a real
divergence once: duckdb array_to_string([]) is NULL where spark
array_join([]) is '' (now coalesced in the dialect)."""

import duckdb
import pytest

from columnstore_spark.functions.pipeline import (
    all_pipeline_sql,
    spark_pipeline_df,
)

DOCS = [(0, "tiny"), (1, ""), (2, "exactly8"),
        (3, "a much longer document body for the winnow path"),
        (4, "1234567"), (5, "one two"),
        # vertical tab: Java \s includes \x0b, RE2 \s does not — the
        # BPE regex spells its whitespace class explicitly so both
        # engines agree (round-2 advice)
        (6, "a\x0bb !?")]


@pytest.fixture()
def engines(spark):
    spark.createDataFrame(DOCS, ["doc_id", "text"]) \
        .createOrReplaceTempView("documents")
    con = duckdb.connect()
    vals = ", ".join(f"({i}, '{t}')" for i, t in DOCS)
    con.sql(f"create table documents as select * from (values {vals}) "
            "v(doc_id, text)")
    return spark, con


@pytest.mark.parametrize("name", ["text_metrics", "token_stats",
                                  "dedup_exact", "dedup_ngram_jaccard",
                                  "dedup_minhash_lsh", "dedup_simhash"])
def test_edge_corpus_parity(engines, name):
    spark, con = engines
    srows = sorted(tuple(str(x) for x in r)
                   for r in spark_pipeline_df(spark, name, 64).collect())
    orows = sorted(tuple(str(x) for x in r)
                   for r in con.sql(all_pipeline_sql(64)[name]["duck"])
                   .fetchall())
    assert srows == orows
