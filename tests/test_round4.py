"""Round-4 additions.

Pins the round-3 verdict/advice items landed this round:
- pack_sequences' Spark-side lane default must TRACK cluster
  parallelism (the fixed 8 lanes capped the lane sort at 8 tasks at
  any cluster size) while the oracle spine keeps its pinned count;
- filtered top-k (`topk(where=...)`) must agree with the plain
  sort+filter result and keep a sound threshold under the filter;
- the substring-dedup exclusion set (megadocs + sub-gram docs) must
  be queryable, matching the gram builder's own filter exactly;
- the PPM decoder must parse real netpbm P6 streams (comments,
  arbitrary header whitespace) and reject malformed ones;
- temperature sampling must keep NULL-lang and empty-string-lang
  documents in SEPARATE strata (null-safe stratum join).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_pack_default_tracks_parallelism(spark):
    from columnstore_spark.functions.pipeline import (
        _PACK_MAX_BUCKETS,
        default_pack_buckets,
        pack_sequences_df,
    )
    from columnstore_spark.sources.transcripts import register_testdata

    par = spark.sparkContext.defaultParallelism
    assert default_pack_buckets(spark) == max(
        1, min(2 * par, _PACK_MAX_BUCKETS))

    register_testdata(spark, SF_DIR, ("documents",))
    df = pack_sequences_df(spark)
    lanes = df.select("lane").distinct().collect()
    n_buckets = default_pack_buckets(spark)
    assert all(0 <= r["lane"] < n_buckets for r in lanes)
    # lane-local packing invariants hold at ANY lane count: offsets
    # stay inside the budget and pack ids carry the lane radix
    bad = df.where((F.col("pack_offset") < 0)
                   | (F.col("pack_offset") >= 512)
                   | (F.col("pack_id") % (1 << 44) < 0)
                   | ((F.col("pack_id") / (1 << 44)).cast("long")
                      != F.col("lane"))).count()
    assert bad == 0


def test_topk_where_matches_plain_filter(spark, transcripts):
    from columnstore_spark.operators import encode, topk

    segs = encode(transcripts,
                  rowgroup_expr=F.expr(
                      "CAST(substring(conv_id, 2) AS BIGINT) % 8"))
    got = topk(segs, "ts", 15, columns=["conv_id", "turn_idx", "ts"],
               tie_cols=("conv_id", "turn_idx"),
               where=("role", "assistant"),
               where_logical="string").collect()
    exp = (transcripts.where(F.col("role") == "assistant")
           .where(F.col("ts").isNotNull())
           .orderBy(F.col("ts").desc(), "conv_id", "turn_idx")
           .limit(15).select("conv_id", "turn_idx", "ts").collect())
    assert got == exp


def test_facade_topk_quantile_where(spark, transcripts):
    """The store facade's topk/quantile accept the pushed-down filter
    and agree with plain DataFrame filter+sort / order statistics."""
    import math
    import shutil
    import tempfile

    from columnstore_spark.store import TranscriptColumnStore

    root = tempfile.mkdtemp(prefix="cs_r4_where_")
    try:
        store = TranscriptColumnStore(spark, root, num_rowgroups=8,
                                      rows_per_segment=1_000_000)
        store.add_range(transcripts)
        store.close()
        got = store.topk("ts", 10, columns=["conv_id", "turn_idx", "ts"],
                         tie_cols=("conv_id", "turn_idx"),
                         where=("role", "user")).collect()
        exp = (transcripts.where((F.col("role") == "user")
                                 & F.col("ts").isNotNull())
               .orderBy(F.col("ts").desc(), "conv_id", "turn_idx")
               .limit(10).select("conv_id", "turn_idx", "ts").collect())
        assert got == exp
        qs = [0.0, 0.5, 1.0]
        gq = {r["q"]: r["value"]
              for r in store.quantile("turn_idx", qs,
                                      where=("role", "user")).collect()}
        vals = sorted(r["turn_idx"] for r in transcripts
                      .where((F.col("role") == "user")
                             & F.col("turn_idx").isNotNull())
                      .select("turn_idx").collect())
        for q in qs:
            k = max(math.ceil(q * len(vals)), 1)
            assert gq[q] == vals[k - 1], q

        # a misspelled filter column must RAISE, never silently prune
        # everything into an empty result
        for call in (lambda: store.topk("ts", 3, where=("rloe", "x")),
                     lambda: store.quantile("turn_idx", [0.5],
                                            where=("rloe", "x"))):
            with pytest.raises(ValueError):
                call()

        # coercion-dependent probe (string '7' on the int turn_idx
        # column): both paths must fall back to decode+Spark-predicate
        # and agree with the plain DataFrame result
        got7 = store.topk("ts", 5, columns=["conv_id", "turn_idx", "ts"],
                          tie_cols=("conv_id",),
                          where=("turn_idx", "7")).collect()
        exp7 = (transcripts.where((F.col("turn_idx") == "7")
                                  & F.col("ts").isNotNull())
                .orderBy(F.col("ts").desc(), "conv_id")
                .limit(5).select("conv_id", "turn_idx", "ts").collect())
        assert got7 == exp7 and len(got7) == 5
        gq7 = {r["q"]: r["value"]
               for r in store.quantile("turn_idx", [0.0, 1.0],
                                       where=("turn_idx", "7"))
               .collect()}
        assert gq7 == {0.0: 7, 1.0: 7}
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_ann_batch_subkeys_invariant(spark):
    """The subkey split is a parallelism knob, never a results knob:
    ann_batch at 4, 16, and the scale-aware default subkeys must
    return identical rows (phase 2 re-ranks under one total order)."""
    from columnstore_spark.functions.pipeline import ann_batch_df
    from columnstore_spark.sources.transcripts import register_testdata

    register_testdata(spark, SF_DIR, ("embeddings",))
    dim = len(spark.table("embeddings")
              .select("embedding").head()["embedding"])
    outs = []
    for sk in (4, 16, None):
        df = ann_batch_df(spark, dim, subkeys=sk)
        outs.append(sorted(tuple(r) for r in df.collect()))
    assert outs[0] == outs[1] == outs[2]
    assert len(outs[0]) > 0


def test_quantile_where_matches_plain_filter(spark, transcripts):
    from columnstore_spark.operators import encode
    from columnstore_spark.operators.aggregate import quantiles

    segs = encode(transcripts,
                  rowgroup_expr=F.expr(
                      "CAST(substring(conv_id, 2) AS BIGINT) % 8"))
    qs = [0.0, 0.25, 0.5, 0.9, 1.0]
    got = {r["q"]: r["value"]
           for r in quantiles(segs, "turn_idx", qs,
                              where=("role", "assistant"),
                              where_logical="string").collect()}
    vals = sorted(r["turn_idx"] for r in transcripts
                  .where((F.col("role") == "assistant")
                         & F.col("turn_idx").isNotNull())
                  .select("turn_idx").collect())
    import math
    for q in qs:
        k = max(math.ceil(q * len(vals)), 1)
        assert got[q] == vals[k - 1], q


def test_topk_where_no_match_is_empty(spark, transcripts):
    from columnstore_spark.operators import encode, topk

    segs = encode(transcripts,
                  rowgroup_expr=F.expr(
                      "CAST(substring(conv_id, 2) AS BIGINT) % 8"))
    got = topk(segs, "ts", 5, columns=["conv_id", "turn_idx", "ts"],
               where=("role", "no_such_role"),
               where_logical="string").collect()
    assert got == []


def test_filtered_pushdown_random_differential(spark):
    """Seeded-random differential: filtered top-k and filtered
    quantiles over a skewed random frame (nulls in both probe and
    filter columns, duplicate keys, one dominant filter value) must
    equal the plain DataFrame filter+sort / filter+order-statistic
    results, for several (k, predicate) combinations — exercising the
    seed-undercoverage fallback (few matching rows) and the pruned
    fast path (selective predicate) alike."""
    import math
    import random

    from columnstore_spark.operators import encode, topk
    from columnstore_spark.operators.aggregate import quantiles

    rng = random.Random(20240821)
    rows = []
    for i in range(4000):
        cat = rng.choice(["hot", "hot", "hot", "warm", "cold",
                          "rare", None])
        val = None if rng.random() < 0.05 else rng.randrange(0, 500)
        rows.append((i, cat, val))
    df = spark.createDataFrame(rows, "id: long, cat: string, v: int")
    segs = encode(df, order=("id",),
                  rowgroup_expr=F.pmod(F.col("id"), F.lit(8)))

    for cat, k in (("hot", 25), ("rare", 7), ("cold", 200),
                   ("absent", 5)):
        got = topk(segs, "v", k, columns=["id", "v"], tie_cols=("id",),
                   where=("cat", cat), where_logical="string").collect()
        exp = (df.where((F.col("cat") == cat) & F.col("v").isNotNull())
               .orderBy(F.col("v").desc(), "id")
               .limit(k).select("id", "v").collect())
        assert got == exp, (cat, k)

    qs = [0.0, 0.33, 0.5, 0.77, 1.0]
    for cat in ("hot", "rare"):
        got = {r["q"]: r["value"]
               for r in quantiles(segs, "v", qs, where=("cat", cat),
                                  where_logical="string").collect()}
        vals = sorted(r["v"] for r in df
                      .where((F.col("cat") == cat)
                             & F.col("v").isNotNull())
                      .select("v").collect())
        for q in qs:
            kth = max(math.ceil(q * len(vals)), 1)
            assert got[q] == vals[kth - 1], (cat, q)


def test_substring_excluded_matches_builder_filter(spark):
    """excluded(reasons) + included(gram builder's doc filter) must
    partition the corpus exactly."""
    from columnstore_spark.functions.pipeline import (
        _SUB_K,
        _SUB_POS_RADIX,
        SPARK as SPARK_D,
        substring_excluded_sql,
    )
    from columnstore_spark.sources.transcripts import register_testdata

    register_testdata(spark, SF_DIR, ("documents",))
    total = spark.table("documents").count()
    # round-5 default (chunk_megadocs=True): only sub-k docs are
    # excluded — megadocs participate via their overlapping units
    excl = spark.sql(substring_excluded_sql(SPARK_D)).collect()
    incl = spark.sql(
        f"SELECT count(*) AS n FROM documents WHERE length(text) >= "
        f"{_SUB_K}"
    ).collect()[0]["n"]
    assert incl + len(excl) == total
    for r in excl:
        assert r["reason"] == "short"
        assert r["n_chars"] < _SUB_K
    # legacy whole-doc mode keeps the radix exclusion observable
    excl_legacy = spark.sql(substring_excluded_sql(
        SPARK_D, chunk_megadocs=False)).collect()
    incl_legacy = spark.sql(
        f"SELECT count(*) AS n FROM documents WHERE length(text) >= "
        f"{_SUB_K} AND length(text) < {_SUB_POS_RADIX}"
    ).collect()[0]["n"]
    assert incl_legacy + len(excl_legacy) == total
    for r in excl_legacy:
        assert r["reason"] in ("megadoc", "short")
        if r["reason"] == "short":
            assert r["n_chars"] < _SUB_K


def test_substring_fast_hash_keeps_guarantee(spark):
    """The Spark-only xxhash64 gram ranking must preserve the winnow
    detection guarantee — shared runs >= k+w-1 = 31 chars pair, runs
    <= k-1 = 23 chars cannot — and the fast grams must agree with the
    portable spine on WHICH DOCS pair for planted inputs (the selected
    gram positions may differ; detectability may not)."""
    from columnstore_spark.functions.pipeline import (
        SPARK as SPARK_D,
        dedup_substring_over,
        substring_grams_sql,
    )

    shared31 = "THE-QUICK-BROWN-FOX-JUMPS-OVER!"
    short20 = "ONLY-TWENTY-CHARS-AB"
    docs = [
        (0, "aaaa bbbb cccc " + shared31 + " dddd eeee ffff gggg hhhh"),
        (1, "zzzz yyyy xxxx wwww " + shared31 + " vvvv uuuu tttt"),
        (2, "1111 2222 3333 " + short20 + " 4444 5555 6666 7777 8888"),
        (3, "qqqq rrrr ssss " + short20 + " mmmm nnnn oooo pppp kkkk"),
        (4, "totally unrelated content with nothing shared at all here"),
    ]
    spark.createDataFrame(docs, "doc_id: long, text: string") \
        .createOrReplaceTempView("r4_subfast_docs")
    results = {}
    for fast in (False, True):
        g = spark.sql(substring_grams_sql(
            SPARK_D, table="r4_subfast_docs", fast_hash=fast))
        g.createOrReplaceTempView("r4_subfast_grams")
        out = spark.sql(
            dedup_substring_over(SPARK_D, "r4_subfast_grams")).collect()
        results[fast] = {(r["doc_a"], r["doc_b"]) for r in out}
    for fast, pairs in results.items():
        assert (0, 1) in pairs, fast
        assert (2, 3) not in pairs, fast
        assert not any(4 in p for p in pairs), fast
    assert results[False] == results[True]
    # the oracle dialect refuses the Spark-only path
    from columnstore_spark.functions.pipeline import DUCK
    with pytest.raises(ValueError):
        substring_grams_sql(DUCK, fast_hash=True)


def _substr_pairs_duck(docs, **kw):
    import duckdb

    from columnstore_spark.functions.pipeline import (
        DUCK,
        _splice_cte,
        dedup_substring_over,
        substring_grams_sql,
    )
    con = duckdb.connect()
    vals = ", ".join(f"({i}, '{t}')" for i, t in docs)
    con.sql("create table documents as select * from "
            f"(values {vals}) v(doc_id, text)")
    sql = _splice_cte(substring_grams_sql(DUCK, **kw), "selg",
                      dedup_substring_over(DUCK, "selg"))
    df = con.sql(sql).df()
    return {(int(a), int(b)) for a, b in zip(df["doc_a"], df["doc_b"])}


def test_substring_megadoc_chunking_guarantee():
    """chunk_megadocs=True must detect a >=31-char run shared by two
    OVER-RADIX docs — including one placed to straddle a chunk
    boundary — where the default path excludes both docs. Tested at a
    small radix (200 chars: chunk 199, overlap 30, step 169) so the
    megadoc machinery runs on test-sized strings; the arithmetic is
    radix-independent."""
    import random

    rng = random.Random(7)

    def filler(n):
        return "".join(rng.choice("abcdefghij") for _ in range(n))

    shared31 = "THE-QUICK-BROWN-FOX-JUMPS-OVER!"
    assert len(shared31) == 31
    # doc 0: run straddles the first chunk boundary (chars 170-199
    # region); doc 1: run sits mid-doc; both docs are ~500 chars,
    # far over the 200-char test radix
    d0 = filler(155) + shared31 + filler(314)
    d1 = filler(380) + shared31 + filler(89)
    d2 = filler(500)  # unrelated megadoc
    docs = [(0, d0), (1, d1), (2, d2)]

    # legacy whole-doc path: megadocs are EXCLUDED -> no pairs at all
    assert _substr_pairs_duck(docs, radix=200,
                              chunk_megadocs=False) == set()
    # chunked path: the shared run must pair, the unrelated doc not
    pairs = _substr_pairs_duck(docs, radix=200, chunk_megadocs=True)
    assert (0, 1) in pairs
    assert not any(2 in p for p in pairs)


def test_substring_chunked_identical_for_inradix_corpus():
    """With every doc under the radix, chunk_megadocs=True must be a
    bit-identical no-op (single unit 0 per doc): same selected grams,
    same pairs, on the real sf0.001 corpus."""
    import duckdb

    from columnstore_spark.functions.pipeline import (
        DUCK,
        _splice_cte,
        dedup_substring_over,
        substring_grams_sql,
    )
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"'{SF_DIR}/documents.parquet'")
    out = {}
    for chunked in (False, True):
        sql = _splice_cte(
            substring_grams_sql(DUCK, chunk_megadocs=chunked), "selg",
            dedup_substring_over(DUCK, "selg"))
        df = con.sql(sql).df().sort_values(
            ["doc_a", "doc_b"]).reset_index(drop=True)
        out[chunked] = df
    assert out[False].equals(out[True])


def test_substring_chunked_df_materialized_units(spark):
    """The Spark production helper (units materialized ONCE, then
    grams, then pairs) must produce the same pairs as the combined
    chunked spine — and its executed plan must consume the
    materialized units (Scan ExistingRDD), not re-embed the unit
    split."""
    import random

    from columnstore_spark.functions.pipeline import (
        dedup_substring_chunked_df,
    )

    rng = random.Random(5)
    base = "".join(rng.choice("abcdefghij") for _ in range(700))
    run = "ANOTHER-SHARED-RUN-OF-31-CHAR!!"
    docs = [(0, base[:230] + run + base[230:460]),
            (1, base[460:] + run + base[:120]),
            (2, "".join(rng.choice("klmnopqrst") for _ in range(420)))]
    duck_pairs = _substr_pairs_duck(docs, radix=200,
                                    chunk_megadocs=True)
    spark.createDataFrame(docs, "doc_id: long, text: string") \
        .createOrReplaceTempView("r4_mega2_docs")
    df = dedup_substring_chunked_df(spark, table="r4_mega2_docs",
                                    radix=200)
    got = {(r["doc_a"], r["doc_b"]) for r in df.collect()}
    assert got == duck_pairs
    assert (0, 1) in got
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan


def test_substring_excluded_tracks_radix_and_chunking(spark):
    """The exclusion report must mirror the gram builder's actual
    configuration: at a custom radix, over-radix docs report as
    megadocs; with chunking on, only sub-k docs are excluded."""
    from columnstore_spark.functions.pipeline import (
        SPARK as SPARK_D,
        substring_excluded_sql,
    )

    docs = [(0, "x" * 10), (1, "y" * 100), (2, "z" * 300)]
    spark.createDataFrame(docs, "doc_id: long, text: string") \
        .createOrReplaceTempView("r4_excl_docs")

    def reasons(**kw):
        rows = spark.sql(substring_excluded_sql(
            SPARK_D, table="r4_excl_docs", **kw)).collect()
        return {r["doc_id"]: r["reason"] for r in rows}

    # chunking default (round 5): only sub-k docs are excluded
    assert reasons(radix=200) == {0: "short"}
    assert reasons(radix=200, chunk_megadocs=True) == {0: "short"}
    assert reasons(radix=200,
                   chunk_megadocs=False) == {0: "short", 2: "megadoc"}


def test_substring_chunked_engine_parity(spark):
    """Spark and DuckDB must agree on the CHUNKED spine (megadocs
    present, small radix) — the same dual-dialect parity contract the
    registry spine carries."""
    import random

    from columnstore_spark.functions.pipeline import (
        DUCK,
        SPARK as SPARK_D,
        dedup_substring_over,
        substring_grams_sql,
    )

    rng = random.Random(11)
    base = "".join(rng.choice("abcdefghij") for _ in range(600))
    run = "SHARED-EXACT-RUN-OF-40-CHARACTERS-HERE!!"
    docs = [(0, base[:210] + run + base[210:420]),
            (1, base[420:] + run + base[:150]),
            (2, "".join(rng.choice("klmnopqrst") for _ in range(450)))]

    duck_pairs = _substr_pairs_duck(docs, radix=200,
                                    chunk_megadocs=True)
    spark.createDataFrame(docs, "doc_id: long, text: string") \
        .createOrReplaceTempView("r4_mega_docs")
    g = spark.sql(substring_grams_sql(SPARK_D, table="r4_mega_docs",
                                      radix=200, chunk_megadocs=True))
    g.createOrReplaceTempView("r4_mega_grams")
    rows = spark.sql(
        dedup_substring_over(SPARK_D, "r4_mega_grams")).collect()
    spark_pairs = {(r["doc_a"], r["doc_b"]) for r in rows}
    assert spark_pairs == duck_pairs
    assert (0, 1) in spark_pairs
    # duck side of the DIALECT pair must refuse nothing: same builder,
    # same arithmetic — the parity above is the contract
    assert DUCK is not SPARK_D


def test_decode_ppm_real_parser():
    from columnstore_spark.functions.multimodal import (
        decode_image,
        decode_ppm,
    )

    body = bytes(range(24))
    img = b"P6\n# a comment line\n 4\t2 \n255\n" + body
    arr = decode_ppm(img)
    assert arr.shape == (2, 4, 3)
    assert arr.tobytes() == body
    # dispatch: decode_image routes P6 to the real parser
    out = decode_image(b"P6\n1 1\n255\n\x01\x02\x03")
    assert out["width"] == 1 and out["height"] == 1
    assert out["pixels"].tolist() == [[[1, 2, 3]]]
    # non-PPM formats remain gated
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG....")
    # malformed streams are rejected, not mis-parsed
    for bad in (b"P5\n1 1\n255\n\x00",          # wrong magic
                b"P6\n1 1\n65535\n\x00\x00",    # 16-bit maxval
                b"P6\n2 2\n255\n\x00",          # truncated pixels
                b"P6\n1\n255"):                 # truncated header
        with pytest.raises(ValueError):
            decode_ppm(bad)


def test_decode_ppm_property_roundtrip():
    """Any well-formed P6 stream — arbitrary dims, arbitrary pixel
    bytes, arbitrary legal header whitespace/comments — must parse to
    exactly its pixel array."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from columnstore_spark.functions.multimodal import decode_ppm

    ws = st.sampled_from([b" ", b"\n", b"\t", b"\r", b"\n# note\n"])

    @settings(max_examples=150, deadline=None)
    @given(w=st.integers(1, 9), h=st.integers(1, 9),
           s1=ws, s2=ws, s3=st.sampled_from([b" ", b"\n", b"\t"]),
           lead=st.sampled_from([b"", b"# leading comment\n"]),
           data=st.data())
    def check(w, h, s1, s2, s3, lead, data):
        body = bytes(data.draw(st.lists(
            st.integers(0, 255), min_size=w * h * 3,
            max_size=w * h * 3)))
        stream = (b"P6" + s1 + lead + str(w).encode() + s2
                  + str(h).encode() + s1 + b"255" + s3 + body)
        arr = decode_ppm(stream)
        assert arr.shape == (h, w, 3)
        assert arr.tobytes() == body

    check()


def test_temperature_null_and_empty_lang_separate(spark):
    """A corpus holding both NULL-lang and ''-lang docs must derive
    two separate strata (the round-3 advice hazard: a COALESCE key
    merged them, skewing both rates)."""
    from columnstore_spark.functions.pipeline import (
        SPARK as SPARK_D,
        sample_temperature_sql,
    )

    rows = ([(i, None) for i in range(40)]
            + [(100 + i, "") for i in range(4)]
            + [(200 + i, "en") for i in range(400)])
    df = spark.createDataFrame(rows, "doc_id: long, lang: string")
    df.createOrReplaceTempView("t4_temp_docs")
    out = spark.sql(
        sample_temperature_sql(SPARK_D, table="t4_temp_docs")).collect()
    n_lang = {(r["lang"],): r["n_lang"] for r in out}
    # the rarest stratum ('' at 4 docs) keeps rate 1000; NULL (40)
    # and en (400) derive sqrt-ratio rates from THEIR OWN sizes
    for r in out:
        if r["lang"] is None:
            assert r["n_lang"] == 40
            assert r["rate_permille"] == int(
                np.floor(1000 * np.sqrt(4 / 40.0)))
        elif r["lang"] == "":
            assert r["n_lang"] == 4
            assert r["rate_permille"] == 1000
        else:
            assert r["n_lang"] == 400
