"""Per-segment Bloom filters (codecs/bloom.py) — point-probe pruning
on high-cardinality keys where min/max bounds can't separate rowgroups.

Covers: the kernel (build/probe round-trip, caps, canonical encodings,
hash stability), the pruning integration (identical results with and
without a bloom, keep-set strictly smaller than the rowgroup count),
and the facade (conv_id point lookup prunes via the manifest bloom;
pre-bloom manifests keep working)."""

import os

import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from columnstore_spark.codecs.bloom import (
    _hash2,
    bloom_keep_cond,
    build_bloom,
    canon_bytes,
)
from columnstore_spark.operators import encode
from columnstore_spark.plans.pruning import (
    prune_rowgroup_ids,
    prune_rowgroups_by_value,
)
from columnstore_spark.sources.transcripts import load_transcripts
from columnstore_spark.store import TranscriptColumnStore

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


# ---------------------------------------------------------------- kernel

def _member(words: list[int], value, logical: str) -> bool:
    m = len(words) * 64
    w = np.array(words, dtype=np.int64).view(np.uint64)
    return all(
        (w[(h % m) >> 6] >> np.uint64(h & 63)) & np.uint64(1)
        for h in _hash2(canon_bytes(value, logical)))


def test_build_membership_no_false_negatives():
    vals = [f"conv_{i:05d}" for i in range(5000)]
    words = build_bloom(pa.array(vals), "string")
    assert words is not None
    assert all(_member(words, v, "string") for v in vals)


def test_fpr_within_design_budget():
    words = build_bloom(pa.array([f"k{i}" for i in range(4096)]), "string")
    fp = sum(_member(words, f"absent_{i}", "string") for i in range(4000))
    # design FPR ~4.9% at 8 bits/key, k=2; allow generous headroom
    assert fp / 4000 < 0.10


def test_ndv_cap_and_unbloomable_logicals_store_null():
    big = pa.array([str(i) for i in range((1 << 16) + 1)])
    assert build_bloom(big, "string") is None
    assert build_bloom(pa.array([1.5, 2.5]), "float64") is None
    assert build_bloom(pa.array([], type=pa.string()), "string") is None
    assert build_bloom(pa.array([None], type=pa.string()), "string") is None


def test_float_probes_stop_at_double_exactness_boundary():
    # Spark compares int col vs double probe by casting the COLUMN to
    # double; above 2^53 many ints collapse onto one double, so a
    # bloom keyed on int(probe) could prune rows Spark matches. The
    # canonical encoding must refuse those probes (None -> no bloom
    # test, bounds only).
    assert canon_bytes(float(2**53), "int64") is None
    assert canon_bytes(9.223372036854776e18, "int64") is None
    assert canon_bytes(float(2**53 - 1), "int64") is not None
    assert canon_bytes(-float(2**53), "int64") is None


def test_int_family_shares_wrapped_int64_encoding():
    # build on uint64 values above int64 max; probe with the wrapped int
    arr = pa.array([2**64 - 1, 7], type=pa.uint64())
    words = build_bloom(arr, "uint64")
    assert _member(words, -1, "uint64")        # two's-complement wrap
    assert _member(words, 7, "int64")          # same bytes across family
    assert _member(words, 7.0, "int32")        # integral float probe
    assert canon_bytes(7.5, "int64") is None   # fractional: no bloom test
    assert canon_bytes(float("nan"), "int64") is None


def test_hash_is_pinned():
    # BLAKE2b-128 halves, little-endian, 63-bit masked. A silent change
    # here would turn pruning on PERSISTED stores into wrong answers —
    # this golden pins the wire contract.
    assert _hash2(b"conv_00042") == (
        2343070092573289952, 7530167111936472382)
    assert _hash2(canon_bytes(7, "int64")) == (
        5135912510510195877, 6567106167140124455)


# ------------------------------------------------- pruning integration

@pytest.fixture(scope="module")
def bloom_segments(spark):
    t = load_transcripts(spark, SF_DIR)
    segs = encode(t, num_rowgroups=8,
                  bloom_columns=("conv_id",)).localCheckpoint()
    key = t.select("conv_id").first()["conv_id"]
    return t, segs, key


def test_segments_carry_bloom_only_on_requested_columns(bloom_segments):
    _, segs, _ = bloom_segments
    rows = segs.select("column", "bloom").collect()
    for r in rows:
        if r["column"] == "conv_id":
            assert r["bloom"] is not None and len(r["bloom"]) >= 1
        else:
            assert r["bloom"] is None


def test_point_probe_prunes_and_preserves_results(bloom_segments):
    t, segs, key = bloom_segments
    total = segs.select("rowgroup_id").distinct().count()
    pruned = prune_rowgroups_by_value(segs, "conv_id", key,
                                      logical_type="string")
    kept = pruned.select("rowgroup_id").distinct().count()
    # one conversation hashes to one rowgroup; FPs may add a few more
    assert 1 <= kept < total
    from columnstore_spark.operators import decode
    got = sorted(decode(pruned).where(F.col("conv_id") == key)
                 .select("conv_id", "turn_idx").collect())
    want = sorted(t.where(F.col("conv_id") == key)
                  .select("conv_id", "turn_idx").collect())
    assert got == want


def test_absent_key_prunes_everything(bloom_segments):
    _, segs, _ = bloom_segments
    ids = prune_rowgroup_ids(segs.drop("payload"), "conv_id",
                             "no_such_conversation_zzz",
                             "no_such_conversation_zzz", eq=True,
                             logical_type="string")
    # min/max bounds alone can rarely refute a mid-range key;
    # the bloom must (up to its ~5% FPR across 8 rowgroups)
    assert ids is not None and len(ids) <= 2


def test_range_probes_ignore_bloom(bloom_segments):
    # blooms are equality-only; a range probe over the same column
    # must not consult them (lo!=hi goes through bounds only)
    _, segs, key = bloom_segments
    from columnstore_spark.plans.pruning import prune_rowgroups_by_range
    pruned = prune_rowgroups_by_range(segs, "conv_id", "a", "z",
                                      logical_type="string")
    assert pruned.select("rowgroup_id").distinct().count() > 0


def test_pre_bloom_manifest_keeps_working(bloom_segments, spark):
    # a manifest persisted before the bloom column existed: the shim
    # adds NULL blooms, the probe keeps every bounds-admitted rowgroup
    _, segs, key = bloom_segments
    legacy = segs.drop("bloom")
    pruned = prune_rowgroups_by_value(legacy, "conv_id", key,
                                      logical_type="string")
    assert pruned.select("rowgroup_id").distinct().count() > 0


def test_absent_key_yields_empty_frame_not_crash(bloom_segments, spark):
    # full pruning (the bloom refuting an absent key) must produce an
    # EMPTY result of the right schema, not a schema-inference failure
    t, segs, _ = bloom_segments
    from columnstore_spark.operators import decode_matching
    pruned = prune_rowgroups_by_value(segs, "conv_id",
                                      "no_such_conversation_zzz",
                                      logical_type="string")
    out = (decode_matching(pruned, "conv_id", "no_such_conversation_zzz",
                           schema=t.schema)
           .where(F.col("conv_id") == "no_such_conversation_zzz"))
    assert out.count() == 0
    assert out.columns == t.columns


# ------------------------------------------------------------- facade

def test_facade_conv_id_point_lookup(spark, tmp_path):
    t = load_transcripts(spark, SF_DIR)
    store = TranscriptColumnStore(spark, str(tmp_path / "store"),
                                  num_rowgroups=8)
    store.add_range(t)
    store.close()
    key = t.select("conv_id").first()["conv_id"]
    got = sorted(store.query_by_value("conv_id", key)
                 .select("conv_id", "turn_idx", "role", "text")
                 .collect())
    want = sorted(t.where(F.col("conv_id") == key)
                  .select("conv_id", "turn_idx", "role", "text")
                  .collect())
    assert got == want
    # and the manifest-level keep set is genuinely pruned
    m = store.warehouse.manifest(spark)
    total = m.select("rowgroup_id").distinct().count()
    ids = prune_rowgroup_ids(m, "conv_id", key, key, eq=True,
                             logical_type="string")
    assert ids is not None and 1 <= len(ids) < total
