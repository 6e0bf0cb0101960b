"""Pipeline-operator soak: randomized-corpus differential parity.

The scripted big sibling of tests/test_pipeline_fuzz_corpus.py: for
each seed, synthesize a corpus of random documents (random lengths,
repeated-character bodies, shared fragments, skewed/NULL language
tags, punctuation noise), then run EVERY dual-dialect pipeline
operator on Spark AND DuckDB and require identical sorted row sets.
This exercises the dialect layer (hash spelling, regex classes, list
function semantics, NULL handling, round/floor arithmetic) across
corpora the fixed test fixtures never reach.

`python scripts/soak_pipeline.py [seeds] [seed0]` — defaults to 10
seeds starting at 1000 (~4 min on local[8]). Exits non-zero on the
first divergence with the (seed, operator) repro key.
"""

from __future__ import annotations

import random
import sys
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

import duckdb  # noqa: E402

from columnstore_spark.functions.pipeline import (  # noqa: E402
    all_pipeline_sql,
    spark_pipeline_df,
    unpersist_all,
)
from columnstore_spark.session import get_spark  # noqa: E402

# every documents-only dual-dialect operator (embeddings-table ops
# need the fixed testdata vectors and are swept by the oracle suite)
OPS = ["text_metrics", "token_stats", "text_redact", "quality_filter",
       "decontaminate", "sample_hash", "sample_stratified",
       "sample_temperature", "pack_sequences", "dedup_exact",
       "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_simhash",
       "dedup_substring"]


def corpus(seed: int, n: int = 150):
    rng = random.Random(seed)
    words = [f"w{i}" for i in range(50)] + ["the", "of", "and", "to",
                                            "la", "der", "les"]
    frags = [" ".join(rng.choices(words, k=rng.randint(8, 40)))
             for _ in range(8)]
    langs = ["en", "es", "de", "fr", "zh", None]
    docs = []
    for i in range(n):
        kind = rng.random()
        if kind < 0.15:
            body = rng.choice(frags)
        elif kind < 0.3:
            body = (rng.choice(frags) + " "
                    + " ".join(rng.choices(words, k=rng.randint(3, 15))))
        elif kind < 0.4:
            body = rng.choice(["=", "-", "a", " "]) * rng.randint(0, 120)
        elif kind < 0.5:
            body = " ".join(rng.choices(words, k=rng.randint(0, 3)))
        else:
            body = " ".join(rng.choices(words, k=rng.randint(5, 80)))
        if rng.random() < 0.25:
            body += rng.choice([" 123456789", " a@b.io", " 1.2.3.4",
                                " !?. #x", "\tx\ny"])
        docs.append((i, body, rng.choices(
            langs, weights=[8, 3, 2, 1, 1, 1])[0],
            rng.choice(["web", "code", "chat", None]), len(body)))
    return docs


def main() -> int:
    seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    seed0 = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    sqls = all_pipeline_sql(64)
    t0 = time.time()
    n_checked = 0
    for seed in range(seed0, seed0 + seeds):
        docs = corpus(seed)
        spark.createDataFrame(
            docs, ["doc_id", "text", "lang", "source", "n_chars"]) \
            .createOrReplaceTempView("documents")
        con = duckdb.connect()
        vals = ", ".join(
            "(" + str(i) + ", '" + t.replace("'", "''") + "', "
            + ("NULL" if g is None else f"'{g}'") + ", "
            + ("NULL" if s is None else f"'{s}'") + f", {nc})"
            for i, t, g, s, nc in docs)
        con.sql("create table documents as select * from "
                f"(values {vals}) v(doc_id, text, lang, source, n_chars)")
        for name in OPS:
            srows = sorted(
                tuple(str(x) for x in r)
                for r in spark_pipeline_df(spark, name, 64).collect())
            orows = sorted(tuple(str(x) for x in r)
                           for r in con.sql(sqls[name]["duck"]).fetchall())
            if srows != orows:
                print(f"DIVERGENCE seed={seed} op={name}: "
                      f"spark {len(srows)} rows vs duck {len(orows)}")
                only_s = [r for r in srows if r not in set(orows)][:3]
                only_d = [r for r in orows if r not in set(srows)][:3]
                print(f"  spark-only: {only_s}\n  duck-only: {only_d}")
                return 1
            n_checked += 1
        unpersist_all()
        print(f"seed {seed}: {len(OPS)} ops OK "
              f"({time.time() - t0:.0f}s)", flush=True)
    print(f"PIPELINE SOAK PASS: {n_checked} (seed, op) pairs identical "
          f"in {time.time() - t0:.0f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
