"""Semantic tests for the round-3 pipeline additions: the Gopher-rule
quality filter, eval-set decontamination, and int8 scalar-quantized
ANN. Engine parity is covered by test_oracle_parity/test_pipeline_edges;
these check the OPERATOR semantics against independent reimplementations
and planted inputs."""

import duckdb
import numpy as np
import pytest

from columnstore_spark.functions.pipeline import (
    _GQ_MIN_ALPHA_FRAC,
    _GQ_MIN_STOP_KINDS,
    _GQ_MIN_WORDS,
    _GQ_STOPWORDS,
    all_pipeline_sql,
    spark_pipeline_df,
)

SF = "/root/testdata/sf0.001"


def _duck(sql, docs=None):
    con = duckdb.connect()
    if docs is None:
        for t in ("documents", "embeddings"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    else:
        vals = ", ".join(f"({i}, '{t}')" for i, t in docs)
        con.sql("create table documents as select * from "
                f"(values {vals}) v(doc_id, text)")
    return con.sql(sql).df()


# --------------------------------------------------------------------------
# quality_filter: independent Python reimplementation of every rule
# --------------------------------------------------------------------------

QF_DOCS = [
    (0, "the " + "alpha beta gamma " * 20),           # long, has 'the'
    (1, "short doc the end"),                          # < 50 words
    (2, ("xx " * 60).strip()),                         # no stopword
    (3, ""),                                           # empty
    (4, "the " + "ab " * 60),                          # short mean word len
]


def test_quality_filter_matches_python_rules():
    df = _duck(all_pipeline_sql(64)["quality_filter"]["duck"], QF_DOCS)
    rows = {int(r.doc_id): r for r in df.itertuples()}
    for doc_id, text in QF_DOCS:
        words = [w for w in text.strip().split(" ") if w]
        r = rows[doc_id]
        assert r.n_words == len(words)
        mwl = round(sum(len(w) for w in words) / max(len(words), 1), 4)
        assert r.mean_word_len == pytest.approx(mwl)
        alpha = sum(1 for w in words if any(c.isalpha() and c.isascii()
                                            for c in w))
        assert r.alpha_frac == pytest.approx(
            round(alpha / max(len(words), 1), 4))
        kinds = len({w.lower() for w in words} & set(_GQ_STOPWORDS))
        assert r.n_stop_kinds == kinds
        assert r.ok_word_count == int(len(words) >= _GQ_MIN_WORDS)
        assert r.ok_stopwords == int(kinds >= _GQ_MIN_STOP_KINDS)
        assert r.ok_alpha == int(
            round(alpha / max(len(words), 1), 4) >= _GQ_MIN_ALPHA_FRAC)
        assert r.keep == (r.ok_word_count * r.ok_word_len * r.ok_symbols
                          * r.ok_alpha * r.ok_stopwords)
    # the crafted corpus exercises both verdicts
    assert {rows[0].keep, rows[1].keep} == {1, 0}
    assert rows[2].ok_stopwords == 0 and rows[4].ok_word_len == 0


def test_quality_filter_discriminates_on_testdata():
    df = _duck(all_pipeline_sql(64)["quality_filter"]["duck"])
    assert set(df["keep"].unique()) == {0, 1}
    # every rule verdict is boolean and keep is their conjunction
    prod = (df.ok_word_count * df.ok_word_len * df.ok_symbols
            * df.ok_alpha * df.ok_stopwords)
    assert (df["keep"] == prod).all()


# --------------------------------------------------------------------------
# decontaminate: planted duplicates across the train/eval split
# --------------------------------------------------------------------------

def test_decontaminate_planted_duplicates():
    """Verbatim copies of one text planted DETERMINISTICALLY on both
    sides of the benchmark split (membership computed up front with
    the same 'bm' hash, not left to chance — the benchmark is 2% of
    docs, so random planting could miss it): every TRAIN copy must
    come back with contamination 1.0 and flagged; unique filler docs
    stay clean."""
    from columnstore_spark.functions.pipeline import (
        _BM_PERMILLE,
        DUCK,
        _salted,
    )

    con = duckdb.connect()
    u = f"{DUCK.ph(_salted(DUCK, 'bm', 'doc_id'))} % 1000"
    member = con.sql(
        f"SELECT doc_id, ({u}) < {_BM_PERMILLE} AS bm FROM "
        "(SELECT unnest(range(0, 2000)) AS doc_id) d").df()
    bench_ids = list(member[member.bm]["doc_id"].astype(int))[:3]
    train_ids = list(member[~member.bm]["doc_id"].astype(int))[:47]
    assert bench_ids, "no benchmark member in id range (salt broke)"
    dup = "alpha beta gamma delta epsilon zeta eta theta"
    docs = [(i, dup) for i in bench_ids + train_ids]
    filler_ids = [3000 + i for i in range(20)]
    docs += [(i, f"unique{i} filler{i} words{i} body{i} tail{i}")
             for i in filler_ids]
    df = _duck(all_pipeline_sql(64)["decontaminate"]["duck"], docs)
    out_ids = set(df["doc_id"].astype(int))
    # benchmark docs never appear in the train-side report
    assert out_ids.isdisjoint(bench_ids)
    dup_train = df[df["doc_id"].isin(train_ids)]
    assert len(dup_train) == len([i for i in train_ids])
    assert (dup_train["contamination"] == 1.0).all()
    assert (dup_train["flagged"] == 1).all()
    filler = df[df["doc_id"] >= 3000]
    assert (filler["flagged"] == 0).all()
    assert (filler["contamination"] == 0.0).all()


def test_decontaminate_invariants_testdata(spark):
    from columnstore_spark.sources.transcripts import register_testdata
    register_testdata(spark, SF, ("documents", "embeddings"))
    df = spark_pipeline_df(spark, "decontaminate", 64).toPandas()
    assert (df["n_overlap"] <= df["n_shingles"]).all()
    assert (df["n_shingles"] > 0).all()
    # the flag gates on the RAW fraction (engine-bit-exact); the
    # reported column is rounded to 4 decimals, so only rows clear of
    # the rounding boundary are asserted
    clear = (df["contamination"] - 0.5).abs() > 1e-4
    flag = df.loc[clear, "contamination"] >= 0.5
    assert (df.loc[clear, "flagged"] == flag.astype(int)).all()
    # report covers exactly the train side (corpus minus benchmark
    # docs minus sub-3-token docs), and the benchmark's shingles DO
    # overlap the corpus (nonzero contamination somewhere). The
    # guaranteed contamination-1.0 case is pinned deterministically in
    # test_decontaminate_planted_duplicates — at a 2% benchmark rate
    # the 500-doc testdata corpus need not straddle a duplicate pair.
    bm = ("CAST(concat('0x',substr(md5(concat('bm|', "
          "COALESCE(CAST(doc_id AS VARCHAR), ''))),1,15)) AS BIGINT) "
          "% 1000 < 20")
    n_bench = _duck(
        f"SELECT count(*) AS n FROM documents WHERE {bm}").iloc[0]["n"]
    # sub-3-token train docs carry no shingles and are absent too
    n_short_train = _duck(
        "SELECT count(*) AS n FROM documents WHERE NOT (" + bm + ") "
        "AND len(list_filter(regexp_split_to_array(lower(trim(text)), "
        "'[^a-z0-9]+'), x -> x != '')) < 3").iloc[0]["n"]
    assert len(df) == 500 - int(n_bench) - int(n_short_train)
    assert (df["contamination"] > 0).any()


# --------------------------------------------------------------------------
# ann_sq8: quantized candidate recall vs the exact brute-force ranking
# --------------------------------------------------------------------------

def test_ann_sq8_recall_vs_brute():
    sqls = all_pipeline_sql(64)
    sq8 = _duck(sqls["ann_sq8"]["duck"])
    brute = _duck(sqls["ann_cosine_topk"]["duck"])
    assert len(sq8) == 10
    # int8 quantization at dim=64 is tight: approx tracks exact closely
    assert (np.abs(sq8["approx_cosine"] - sq8["cosine"]) <= 0.05).all()
    # the exact top-1 survives the quantized candidate stage
    assert brute.iloc[0]["vec_id"] in set(sq8["vec_id"])
    assert sq8.iloc[0]["vec_id"] == brute.iloc[0]["vec_id"]
    # re-ranked output is ordered by exact cosine
    assert (sq8["cosine"].values[:-1] >= sq8["cosine"].values[1:]).all()
    # recall@10 of the oversampled-then-reranked set vs exact top-10
    recall = len(set(sq8["vec_id"]) & set(brute["vec_id"])) / 10
    assert recall >= 0.8


# --------------------------------------------------------------------------
# dedup_substring: winnowed exact-substring detection (MOSS guarantee)
# --------------------------------------------------------------------------

def _substr_pairs(docs):
    from columnstore_spark.functions.pipeline import all_pipeline_sql
    df = _duck(all_pipeline_sql(64)["dedup_substring"]["duck"], docs)
    return {(int(a), int(b)) for a, b in zip(df["doc_a"], df["doc_b"])}


def test_substring_guarantee_planted():
    """Two docs sharing a verbatim run of k+w-1 = 31 chars in totally
    different contexts MUST pair (the winnowing detection guarantee);
    docs sharing at most k-1 = 23 chars CANNOT pair (a shared selected
    gram is itself a 24-char shared run)."""
    shared31 = "THE-QUICK-BROWN-FOX-JUMPS-OVER!"          # 31 chars
    assert len(shared31) == 31
    short20 = "ONLY-TWENTY-CHARS-AB"                       # 20 chars
    assert len(short20) == 20
    docs = [
        (0, "aaaa bbbb cccc " + shared31 + " dddd eeee ffff gggg hhhh"),
        (1, "zzzz yyyy xxxx wwww " + shared31 + " vvvv uuuu tttt"),
        (2, "1111 2222 3333 " + short20 + " 4444 5555 6666 7777 8888"),
        (3, "qqqq rrrr ssss " + short20 + " mmmm nnnn oooo pppp kkkk"),
        (4, "totally unrelated content with nothing shared at all here"),
    ]
    pairs = _substr_pairs(docs)
    assert (0, 1) in pairs
    assert (2, 3) not in pairs
    assert not any(4 in p for p in pairs)


def test_substring_no_false_positives_testdata():
    """Every reported pair at sf0.001 genuinely shares a 24-char
    substring — checked against a brute-force Python k-gram set
    intersection (exactness is the operator's defining claim)."""
    import duckdb
    from columnstore_spark.functions.pipeline import _SUB_K, all_pipeline_sql
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"'{SF}/documents.parquet'")
    df = con.sql(all_pipeline_sql(64)["dedup_substring"]["duck"]).df()
    assert len(df) > 0
    texts = dict(con.sql("SELECT doc_id, text FROM documents").fetchall())
    grams = {i: {t[p:p + _SUB_K] for p in range(len(t) - _SUB_K + 1)}
             for i, t in texts.items()}
    for a, b, n in zip(df["doc_a"], df["doc_b"], df["n_shared"]):
        shared = grams[int(a)] & grams[int(b)]
        assert shared, (a, b)
        # the winnowed count can never exceed the true shared-gram count
        assert n <= len(shared), (a, b, n, len(shared))


def test_substring_hot_gram_stays_linear():
    """A 40-char run shared by 100 docs (boilerplate, df > max_df=64)
    must connect every doc to the cluster representative (min doc_id)
    — 99 star pairs — NOT 4950 all-pairs; unique tails stay unpaired."""
    run40 = "SHARED-BOILERPLATE-LICENSE-HEADER-40CHR!"
    assert len(run40) == 40
    docs = [(i, f"{run40} unique tail number {i} padding words here")
            for i in range(100)]
    docs.append((500, "completely unrelated document with its own text"))
    from columnstore_spark.functions.pipeline import all_pipeline_sql
    df = _duck(all_pipeline_sql(64)["dedup_substring"]["duck"], docs)
    pairs = {(int(a), int(b)) for a, b in zip(df["doc_a"], df["doc_b"])}
    star = {(0, i) for i in range(1, 100)}
    assert star <= pairs, "every doc must connect to the representative"
    # linear, not quadratic: the hot run contributes 99 star pairs;
    # the digit-boundary grams (e.g. "...number 5" shared by docs
    # 5,50..59) are genuinely-shared RARE grams and may add a few
    # hundred true pairs — all-pairs over the hot run alone would be
    # C(100,2) = 4950
    assert len(pairs) < 1500, len(pairs)
    assert not any(500 in p for p in pairs)
