"""IN-list, IS NULL, and prefix queries on the encoded form.

Kernel level (`codecs/query.query_values` / `query_nulls`): golden
range lists per codec, consistency with per-value `query_value`, the
SQL null-probe and empty-list contracts, and nested-segment nulls.
Pruning level: `prune_rowgroup_ids_in` unions per-value keep-sets
(bounds + bloom); `prune_rowgroup_ids_null` keeps exactly the
rowgroups with nulls. Facade level: results equal Spark's own
`isin` / `isNull` / `startswith` over the full store, including the
byte-order-vs-UTF-16 poison case for prefixes."""

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from columnstore_spark.codecs import CODEC_IDS
from columnstore_spark.codecs.query import (
    query_nulls,
    query_value,
    query_values,
)
from columnstore_spark.codecs.segment import encode_segment
from columnstore_spark.store import TranscriptColumnStore, _prefix_upper

I32 = pa.int32()
S = pa.large_utf8()


def seg(values, typ, codec=None):
    return encode_segment(pa.array(values, type=typ),
                          codec=CODEC_IDS[codec] if codec else None)


# ---------------------------------------------------------------------------
# query_values kernel
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("codec", ["plain", "dict_rle", "sequential",
                                   "for_bitpack"])
def test_query_values_per_codec(codec):
    values = [5, 5, 9, 5, 1, 1]
    s = seg(values, I32, codec)
    hit = set()
    for st, ln in query_values(s.payload, "int32", [5, 1]):
        hit.update(range(st, st + ln))
    assert hit == {0, 1, 3, 4, 5}
    # absent values contribute nothing; present ones still hit
    assert sum(ln for _, ln in query_values(
        s.payload, "int32", [404, 9])) == 1


@pytest.mark.parametrize("codec", ["plain", "dict_rle", "sequential",
                                   "for_bitpack"])
def test_query_values_matches_union_of_query_value(codec):
    values = [5, 5, 9, 5, 1, 1, 9, 9]
    s = seg(values, I32, codec)
    for probe_set in ([5], [5, 9], [1, 404], [404], [9, 1, 5]):
        rows_multi = set()
        for st, ln in query_values(s.payload, "int32", probe_set):
            rows_multi.update(range(st, st + ln))
        rows_single = set()
        for v in probe_set:
            for st, ln in query_value(s.payload, "int32", v):
                rows_single.update(range(st, st + ln))
        assert rows_multi == rows_single


def test_query_values_contracts():
    s = seg([1, 2, 2, 3], I32)
    # null probes are dropped (SQL: IN (..., NULL) never matches)
    assert query_values(s.payload, "int32", [None, 2]) == \
        query_value(s.payload, "int32", 2)
    # empty (or all-null) list matches nothing
    assert query_values(s.payload, "int32", []) == []
    assert query_values(s.payload, "int32", [None]) == []
    # unrepresentable probes are ignored, representable ones still hit
    assert query_values(s.payload, "int32", [2.5, "x", 3]) == \
        query_value(s.payload, "int32", 3)
    assert query_values(s.payload, "int32", [2.5]) == []


def test_query_values_constant_segment():
    s = seg([7, 7, 7, 7], I32, "constant")
    assert query_values(s.payload, "int32", [1, 7]) == [(0, 4)]
    assert query_values(s.payload, "int32", [1, 2]) == []


def test_query_values_strings_and_nulls():
    s = seg(["a", None, "b", "a", None], S)
    assert query_values(s.payload, "string", ["a", "b"]) == \
        [(0, 1), (2, 2)]
    assert query_values(s.payload, "string", ["z"]) == []


# ---------------------------------------------------------------------------
# query_contains kernel
# ---------------------------------------------------------------------------


def test_query_contains_dict_and_plain():
    from columnstore_spark.codecs.query import query_contains
    vals = ["alpha beta", "beta gamma", None, "delta", "beta gamma"]
    for codec in ("dict_rle", "plain", "fsst"):
        s = seg(vals, S, codec)
        assert query_contains(s.payload, "string", "beta") == \
            [(0, 2), (4, 1)]
        assert query_contains(s.payload, "string", "zeta") == []
        # empty needle = LIKE '%%': every non-null row
        assert query_contains(s.payload, "string", "") == \
            [(0, 2), (3, 2)]


def test_query_contains_constant_and_type_guard():
    from columnstore_spark.codecs.query import query_contains
    c = seg(["xyx", "xyx", "xyx"], S, "constant")
    assert query_contains(c.payload, "string", "yx") == [(0, 3)]
    assert query_contains(c.payload, "string", "q") == []
    with pytest.raises(ValueError):
        query_contains(seg([1, 2], I32).payload, "int32", "1")


def test_query_contains_multibyte_alignment():
    """UTF-8 self-synchronization: an ASCII needle must not match
    inside a multibyte sequence's continuation bytes."""
    from columnstore_spark.codecs.query import query_contains
    # 'é' = 0xC3 0xA9; needle '©' = 0xC2 0xA9 shares the 0xA9 byte
    s = seg(["café", "naïve", "©right"], S, "plain")
    assert query_contains(s.payload, "string", "©") == [(2, 1)]
    assert query_contains(s.payload, "string", "é") == [(0, 1)]


# ---------------------------------------------------------------------------
# query_nulls kernel
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("codec", ["plain", "dict_rle"])
def test_query_nulls_ranges(codec):
    s = seg([None, 1, 2, None, None, 3], I32, codec)
    assert query_nulls(s.payload, "int32") == [(0, 1), (3, 2)]


def test_query_nulls_none_and_all():
    assert query_nulls(seg([1, 2, 3], I32).payload, "int32") == []
    s = encode_segment(pa.array([None, None, None], type=I32))
    assert query_nulls(s.payload, "int32") == [(0, 3)]


def test_query_nulls_nested_segment():
    arr = pa.array([[1.0, 2.0], None, [3.0], None], pa.list_(pa.float64()))
    s = encode_segment(arr)
    logical = "nested:array<double>"
    assert query_nulls(s.payload, logical) == [(1, 1), (3, 1)]
    no_nulls = encode_segment(pa.array([[1.0], [2.0]],
                                       pa.list_(pa.float64())))
    assert query_nulls(no_nulls.payload, logical) == []


# ---------------------------------------------------------------------------
# pruning
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def segs(spark, transcripts):
    from columnstore_spark.operators import encode

    df = encode(transcripts,
                rowgroup_expr=F.expr("CAST(substring(conv_id, 2) AS BIGINT) % 8"),
                bloom_columns=("conv_id",)).cache()
    df.count()
    yield df
    df.unpersist()


def test_prune_ids_in_unions_keepsets(spark, segs, transcripts):
    from columnstore_spark.plans.pruning import (
        prune_rowgroup_ids,
        prune_rowgroup_ids_in,
    )

    keys = [r["conv_id"] for r in
            transcripts.select("conv_id").distinct().orderBy("conv_id")
            .limit(2).collect()]
    ids_in = prune_rowgroup_ids_in(segs, "conv_id", keys,
                                   logical_type="string")
    per_value = set()
    for k in keys:
        per_value |= set(prune_rowgroup_ids(segs, "conv_id", k, k, True,
                                            logical_type="string"))
    assert set(ids_in) == per_value
    # empty probe list keeps nothing
    assert prune_rowgroup_ids_in(segs, "conv_id", [],
                                 logical_type="string") == []


def test_prune_ids_in_caps_oversized_lists(spark, segs):
    from columnstore_spark.plans.pruning import (
        _IN_PRUNE_CAP,
        prune_rowgroup_ids_in,
    )

    big = [f"k{i:06d}" for i in range(_IN_PRUNE_CAP + 1)]
    assert prune_rowgroup_ids_in(segs, "conv_id", big,
                                 logical_type="string") is None


def test_prune_ids_null_exact(spark, segs):
    from columnstore_spark.plans.pruning import prune_rowgroup_ids_null

    with_nulls = sorted(
        r["rowgroup_id"] for r in
        segs.where((F.col("column") == "tool") & (F.col("n_nulls") > 0))
        .select("rowgroup_id").distinct().collect())
    assert prune_rowgroup_ids_null(segs, "tool") == with_nulls
    # conv_id never holds nulls -> everything pruned
    assert prune_rowgroup_ids_null(segs, "conv_id") == []


# ---------------------------------------------------------------------------
# facade
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def store(spark, transcripts, tmp_path_factory):
    s = TranscriptColumnStore(
        spark, str(tmp_path_factory.mktemp("innull") / "store"),
        num_rowgroups=4)
    s.add_range(transcripts)
    s.close()
    return s


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_store_query_by_in(spark, store, transcripts):
    keys = [r["conv_id"] for r in
            transcripts.select("conv_id").distinct().orderBy("conv_id")
            .limit(3).collect()]
    probe = keys + ["c_absent", None, keys[0]]  # dup + null + miss
    got = store.query_by_in("conv_id", probe)
    want = transcripts.where(F.col("conv_id").isin(keys))
    cols = ["conv_id", "turn_idx", "role", "text", "tool"]
    assert _rows(got, cols) == _rows(want, cols)


def test_store_query_by_in_numeric_and_empty(spark, store, transcripts):
    got = store.query_by_in("turn_idx", [0, 3, 2.5])  # 2.5 can't match
    want = transcripts.where(F.col("turn_idx").isin([0, 3]))
    assert got.count() == want.count()
    empty = store.query_by_in("conv_id", [None])
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == transcripts.columns


def test_store_query_by_null(spark, store, transcripts):
    got = store.query_by_null("tool")
    want = transcripts.where(F.col("tool").isNull())
    cols = ["conv_id", "turn_idx", "role", "text"]
    assert want.count() > 0
    assert _rows(got, cols) == _rows(want, cols)
    assert store.query_by_null("conv_id").count() == 0


def test_store_query_by_prefix(spark, store, transcripts):
    some = transcripts.select("conv_id").first()["conv_id"]
    p = some[: len(some) - 1]
    got = store.query_by_prefix("conv_id", p)
    want = transcripts.where(F.col("conv_id").startswith(p))
    assert want.count() > 0
    assert _rows(got, ["conv_id", "turn_idx"]) == \
        _rows(want, ["conv_id", "turn_idx"])
    # empty prefix = every row (non-null column)
    assert store.query_by_prefix("conv_id", "").count() == \
        transcripts.count()
    with pytest.raises(ValueError):
        store.query_by_prefix("turn_idx", "1")


def test_include_pending_read_your_writes(spark, tmp_path, transcripts):
    """include_pending=True makes every probe query see un-compacted
    delta batches (the reference queries its delta rowgroups too):
    solid side from the encoded form, pending side from the raw
    parquet, same predicate. Default stays committed-only."""
    s = TranscriptColumnStore(spark, str(tmp_path / "ryw"),
                              num_rowgroups=2)
    even = transcripts.where(F.col("turn_idx") % 2 == 0)
    odd = transcripts.where(F.col("turn_idx") % 2 == 1)
    s.add_range(even)
    s.close()
    s.add_range(odd)  # left pending
    cols = ["conv_id", "turn_idx"]

    def want(pred):
        return _rows(transcripts.where(pred).select(*cols), cols)

    assert _rows(s.query_by_value("role", "tool", columns=cols,
                                  include_pending=True), cols) == \
        want(F.col("role") == "tool")
    # default excludes the pending odd turns
    assert _rows(s.query_by_value("role", "tool", columns=cols), cols) \
        == _rows(even.where(F.col("role") == "tool").select(*cols), cols)
    assert _rows(s.query_by_null("tool", columns=cols,
                                 include_pending=True), cols) == \
        want(F.col("tool").isNull())
    key = transcripts.select("conv_id").first()["conv_id"]
    assert _rows(s.query_by_in("conv_id", [key], columns=cols,
                               include_pending=True), cols) == \
        want(F.col("conv_id") == key)
    assert _rows(s.query_where({"role": "tool", "turn_idx": (0, 9)},
                               columns=cols, include_pending=True),
                 cols) == \
        want((F.col("role") == "tool") & F.col("turn_idx").between(0, 9))
    assert _rows(s.query_by_prefix("conv_id", key[:-1], columns=cols,
                                   include_pending=True), cols) == \
        want(F.col("conv_id").startswith(key[:-1]))
    # after close() the flag is a no-op (nothing pending)
    s.close()
    assert _rows(s.query_by_value("role", "tool", columns=cols,
                                  include_pending=True), cols) == \
        want(F.col("role") == "tool")


def test_rows_window_global_paging(spark, store, transcripts):
    """rows_window pages the whole committed store under the stable
    enumeration order (rowgroup_id asc, encode order within): pages
    concatenate back to the full store, boundary-spanning pages route
    through multiple rowgroups, and out-of-range windows clamp."""
    total = transcripts.count()
    # enumerate the expected order once: decode everything, tagged by
    # the store's own enumeration (all pages concatenated == rows())
    page = max(1, total // 3)
    seen = []
    start = 0
    while start < total:
        rows = store.rows_window(start, page).collect()
        assert 0 < len(rows) <= page
        seen.extend(rows)
        start += page
    assert len(seen) == total
    cols = ["conv_id", "turn_idx", "role", "text", "tool"]
    assert sorted(tuple(r[c] for c in cols) for r in seen) == \
        _rows(transcripts, cols)
    # pages must not overlap: (conv_id, turn_idx) is unique
    keys = [(r["conv_id"], r["turn_idx"]) for r in seen]
    assert len(set(keys)) == total
    # clamps
    assert store.rows_window(total + 5, 10).count() == 0
    assert store.rows_window(-5, 3).count() == 3
    assert store.rows_window(total - 2, 100).count() == 2
    assert store.rows_window(0, 0).count() == 0


def test_store_count_null(spark, store, transcripts):
    got = store.count_null("tool").first()["cnt"]
    assert got == transcripts.where(F.col("tool").isNull()).count()
    assert store.count_null("conv_id").first()["cnt"] == 0
    with pytest.raises(ValueError):
        store.count_null("nope")


def test_facade_columns_projection(spark, store, transcripts):
    """`columns=` on every facade query: results equal the full query
    projected, the schema carries exactly the asked columns (the probe
    column gathered for the trailing filter is dropped), and unknown
    names fail fast."""
    key = transcripts.select("conv_id").first()["conv_id"]
    cases = [
        (store.query_by_value("role", "tool", columns=["conv_id"]),
         transcripts.where(F.col("role") == "tool"), ["conv_id"]),
        (store.query_by_in("conv_id", [key],
                           columns=["turn_idx", "role"]),
         transcripts.where(F.col("conv_id") == key),
         ["turn_idx", "role"]),
        (store.query_by_null("tool", columns=["conv_id", "turn_idx"]),
         transcripts.where(F.col("tool").isNull()),
         ["conv_id", "turn_idx"]),
        (store.query_by_prefix("conv_id", key[:-1],
                               columns=["turn_idx"]),
         transcripts.where(F.col("conv_id").startswith(key[:-1])),
         ["turn_idx"]),
        (store.query_by_contains("text", "vector", columns=["conv_id"]),
         transcripts.where(F.col("text").contains("vector")),
         ["conv_id"]),
        (store.query_where({"role": "tool", "turn_idx": (0, 9)},
                           columns=["conv_id", "turn_idx"]),
         transcripts.where((F.col("role") == "tool")
                           & F.col("turn_idx").between(0, 9)),
         ["conv_id", "turn_idx"]),
        (store.query_by_range("turn_idx", 0, 2, columns=["role"]),
         transcripts.where(F.col("turn_idx").between(0, 2)), ["role"]),
    ]
    for got, want, cols in cases:
        assert got.columns == cols
        assert _rows(got, cols) == _rows(want.select(*cols), cols)
    assert store.rows(columns=["conv_id"]).columns == ["conv_id"]
    assert store.rows(columns=["conv_id"]).count() == transcripts.count()
    with pytest.raises(ValueError):
        store.query_by_value("role", "tool", columns=["nope"]).collect()


def test_store_query_by_contains(spark, store, transcripts):
    got = store.query_by_contains("text", "vector")
    want = transcripts.where(F.col("text").contains("vector"))
    assert want.count() > 0
    assert got.count() == want.count()
    cols = ["conv_id", "turn_idx"]
    assert _rows(got, cols) == _rows(want, cols)
    with pytest.raises(ValueError):
        store.query_by_contains("turn_idx", "1")


def test_query_where_mixed_kinds(spark, store, transcripts):
    """query_where composing IN + IS NULL + range in one conjunction:
    keep-sets intersect on the manifest, one encoded probe runs, every
    predicate re-applies as Spark's own filter."""
    keys = [r["conv_id"] for r in
            transcripts.select("conv_id").distinct().orderBy("conv_id")
            .limit(4).collect()]
    got = store.query_where({"conv_id": keys + [None, keys[0]],
                             "tool": None,
                             "turn_idx": (0, 15)})
    want = transcripts.where(F.col("conv_id").isin(keys)
                             & F.col("tool").isNull()
                             & F.col("turn_idx").between(0, 15))
    cols = ["conv_id", "turn_idx", "role", "text"]
    assert want.count() > 0
    assert _rows(got, cols) == _rows(want, cols)
    # empty effective IN-list: the whole conjunction matches nothing
    empty = store.query_where({"conv_id": [None], "turn_idx": (0, 5)})
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == transcripts.columns


def test_prefix_poison_non_ascii_payload(spark, tmp_path):
    """A non-ASCII string sharing an ASCII prefix must survive the
    range rewrite: 'abé' sorts AFTER 'ab...' in UTF-16 but
    its UTF-8 bytes start 0x61 0x62 0xC3 — both orders still place it
    inside [prefix, prefix-incremented], which is the soundness claim
    `_prefix_upper` documents."""
    df = spark.createDataFrame(
        [("ab", 1), ("abé", 2), ("ac", 3), ("b", 4), ("abz", 5)],
        "conv_id string, turn_idx int")
    store = TranscriptColumnStore(spark, str(tmp_path / "p"),
                                  num_rowgroups=1,
                                  bloom_columns=())
    store.add_range(df)
    store.close()
    got = sorted(r["turn_idx"] for r in
                 store.query_by_prefix("conv_id", "ab").collect())
    assert got == [1, 2, 5]


def test_store_query_by_null_nested_column(spark, tmp_path):
    """IS NULL on a NESTED column end to end: the probe decodes the
    Arrow-IPC segment's own validity (frame validity is absent for
    codec 31 — nulls live in the stream body), and the matching stage
    gathers the nested column itself through gather_ranges over the
    IPC payload."""
    from pyspark.sql import Row
    df = spark.createDataFrame(
        [Row(conv_id="a", turn_idx=1, embedding=[1.0, 2.0]),
         Row(conv_id="b", turn_idx=2, embedding=None),
         Row(conv_id="c", turn_idx=3, embedding=[3.0, 4.0]),
         Row(conv_id="d", turn_idx=4, embedding=None)],
        "conv_id string, turn_idx int, embedding array<double>")
    store = TranscriptColumnStore(spark, str(tmp_path / "n"),
                                  num_rowgroups=1, bloom_columns=())
    store.add_range(df)
    store.close()
    got = store.query_by_null("embedding").collect()
    assert sorted(r["conv_id"] for r in got) == ["b", "d"]
    assert all(r["embedding"] is None for r in got)
    # and the IN path gathers the nested column through run clipping
    rows = store.query_by_in("conv_id", ["a", "c"]).collect()
    assert sorted(tuple(r["embedding"]) for r in rows) == \
        [(1.0, 2.0), (3.0, 4.0)]
    # an UNHASHABLE probe on the nested column itself must reach the
    # decode + Spark-isin fallback (kernels can't type it), not die
    # in the dedup set; duplicates and None members still collapse
    got2 = store.query_by_in("embedding",
                             [[1.0, 2.0], [1.0, 2.0], None])
    assert [r["conv_id"] for r in got2.collect()] == ["a"]
    mixed = store.query_where({"embedding": [[3.0, 4.0]],
                               "turn_idx": (0, 9)})
    assert [r["conv_id"] for r in mixed.collect()] == ["c"]


def test_prefix_upper_unit():
    assert _prefix_upper("a") == "b"
    assert _prefix_upper("ab\x7f") == "ac"
    assert _prefix_upper("\x7f\x7f") is None
    assert _prefix_upper("") is None
    assert _prefix_upper("c00") == "c01"
