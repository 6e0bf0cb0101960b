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
                                  "dedup_minhash_lsh", "dedup_simhash",
                                  "quality_filter", "decontaminate",
                                  "dedup_substring"])
def test_edge_corpus_parity(engines, name):
    spark, con = engines
    srows = sorted(tuple(str(x) for x in r)
                   for r in spark_pipeline_df(spark, name, 64).collect())
    orows = sorted(tuple(str(x) for x in r)
                   for r in con.sql(all_pipeline_sql(64)[name]["duck"])
                   .fetchall())
    assert srows == orows


PII_DOCS = [
    (0, "contact john.doe+spam@example.co.uk or admin@sub.domain.org now"),
    (1, "server at 192.168.0.1 and 10.0.0.255, port 8080"),
    (2, "card 4111111111111111 ssn 123456789 short 12345678"),
    (3, "no pii here at all"),
    (4, ""),
    (5, "mixed: a@b.io from 8.8.8.8 called 5551234567890"),
]


def test_text_redact_parity_and_semantics(spark):
    """text_redact on crafted PII through BOTH engines: identical
    counts/fingerprints, and the redaction actually fires (emails,
    dotted quads, 9+-digit runs replaced; 8-digit runs kept)."""
    import duckdb

    spark.createDataFrame(PII_DOCS, ["doc_id", "text"]) \
        .createOrReplaceTempView("documents")
    con = duckdb.connect()
    vals = ", ".join(f"({i}, '{t}')" for i, t in PII_DOCS)
    con.sql(f"create table documents as select * from (values {vals}) "
            "v(doc_id, text)")
    sql = all_pipeline_sql(64)["text_redact"]
    srows = {r["doc_id"]: r.asDict()
             for r in spark.sql(sql["spark"]).collect()}
    orows = {r[0]: r for r in con.sql(sql["duck"]).fetchall()}
    assert len(srows) == len(PII_DOCS)
    for did, s in srows.items():
        o = orows[did]
        assert (s["n_emails"], s["n_ips"], s["n_longnums"],
                s["redacted_bytes"], s["redacted_fp"]) == o[1:], did
    assert srows[0]["n_emails"] == 2
    assert srows[1]["n_ips"] == 2
    assert srows[2]["n_longnums"] == 2          # 16-digit + 9-digit
    assert srows[2]["n_emails"] == srows[2]["n_ips"] == 0
    assert srows[3] == {"doc_id": 3, "n_emails": 0, "n_ips": 0,
                        "n_longnums": 0,
                        "redacted_bytes": len("no pii here at all"),
                        "redacted_fp": srows[3]["redacted_fp"]}
    assert srows[5]["n_emails"] == 1 and srows[5]["n_ips"] == 1 \
        and srows[5]["n_longnums"] == 1
    # fingerprints differ from the raw text's md5 when something fired
    import hashlib
    raw_fp = hashlib.md5(PII_DOCS[5][1].encode()).hexdigest()
    assert srows[5]["redacted_fp"] != raw_fp
