"""Seeded random-corpus differential parity for the round-3 pipeline
additions: both engines run the SAME spine over corpora the fixed
edge/testdata corpora don't reach — random lengths, repeated runs,
shared fragments, skewed language tags, punctuation noise."""

import random

import duckdb
import pytest

from columnstore_spark.functions.pipeline import (
    all_pipeline_sql,
    spark_pipeline_df,
)

OPS = ["quality_filter", "decontaminate", "dedup_substring",
       "sample_temperature", "text_metrics", "token_stats"]


def _corpus(seed: int, n: int = 120):
    rng = random.Random(seed)
    words = [f"w{i}" for i in range(40)] + ["the", "of", "and", "to"]
    frags = [" ".join(rng.choices(words, k=rng.randint(8, 30)))
             for _ in range(6)]
    langs = ["en", "es", "de", "fr", None]
    docs = []
    for i in range(n):
        kind = rng.random()
        if kind < 0.15:
            body = rng.choice(frags)                      # exact dup
        elif kind < 0.3:
            body = (rng.choice(frags) + " "               # shared run
                    + " ".join(rng.choices(words, k=rng.randint(3, 12))))
        elif kind < 0.4:
            body = "=" * rng.randint(0, 80)               # repeated char
        elif kind < 0.5:
            body = " ".join(rng.choices(words, k=rng.randint(0, 3)))
        else:
            body = " ".join(rng.choices(words, k=rng.randint(5, 60)))
        if rng.random() < 0.2:
            body += " 12345 !?. #tag"
        docs.append((i, body, rng.choices(langs,
                                          weights=[8, 3, 2, 1, 1])[0]))
    return docs


@pytest.mark.parametrize("seed", [11, 47])
@pytest.mark.parametrize("name", OPS)
def test_random_corpus_parity(spark, seed, name):
    docs = _corpus(seed)
    spark.createDataFrame(docs, ["doc_id", "text", "lang"]) \
        .createOrReplaceTempView("documents")
    con = duckdb.connect()
    vals = ", ".join(
        "(" + str(i) + ", '" + t.replace("'", "''") + "', "
        + ("NULL" if lang is None else f"'{lang}'") + ")"
        for i, t, lang in docs)
    con.sql("create table documents as select * from "
            f"(values {vals}) v(doc_id, text, lang)")
    srows = sorted(tuple(str(x) for x in r)
                   for r in spark_pipeline_df(spark, name, 64).collect())
    orows = sorted(tuple(str(x) for x in r)
                   for r in con.sql(all_pipeline_sql(64)[name]["duck"])
                   .fetchall())
    assert srows == orows, (name, seed, len(srows), len(orows))
