"""Generation time travel: `TranscriptColumnStore(generation=k)` pins
a historical generation (the Iceberg snapshot-read analogue over the
store's generation dirs) — read-only, queryable. A generation is
immutable once SUPERSEDED by a rebuild (the live store only writes
into its latest generation), so a pinned superseded generation is a
stable snapshot of the store at that rebuild boundary."""

import os

import pytest
from pyspark.sql import functions as F

from columnstore_spark.sources.transcripts import load_transcripts
from columnstore_spark.store import TranscriptColumnStore

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _sorted(df, cols):
    return df.orderBy("conv_id", "turn_idx").select(cols).collect()


def test_time_travel_reads_and_write_guard(spark, tmp_path):
    t = load_transcripts(spark, SF_DIR).persist()
    cols = t.columns
    b1 = t.where(F.col("turn_idx") % 2 == 0)
    b2 = t.where(F.col("turn_idx") % 2 == 1)
    root = str(tmp_path / "store")

    live = TranscriptColumnStore(spark, root, num_rowgroups=4)
    live.add_range(b1)
    live.close()                       # gen_0000 holds b1
    live.rebuild()                     # gen_0000 superseded -> frozen
    live.add_range(b2)
    live.close()                       # b2 lands in gen_0001 (latest)
    assert _sorted(live.rows(), cols) == _sorted(t, cols)

    old = TranscriptColumnStore(spark, root, generation=0)
    assert _sorted(old.rows(), cols) == _sorted(b1, cols)
    # the snapshot answers queries too (encoded path, own manifest)
    assert old.query_by_value("role", "tool").count() == \
        b1.where(F.col("role") == "tool").count()
    st = {r["column"]: r for r in old.stats().collect()}
    assert st["conv_id"]["n_rows"] == b1.count()
    # and the live store is unaffected
    assert _sorted(live.rows(), cols) == _sorted(t, cols)

    # read-only: every mutator refuses
    for call in (lambda: old.add_range(b2), old.close, old.rebuild,
                 old.compact, old.vacuum):
        with pytest.raises(ValueError, match="pinned"):
            call()

    # a pending delta on the live store never leaks into the snapshot
    live.add_range(b2)
    assert _sorted(old.rows(), cols) == _sorted(b1, cols)
    # ...including through include_pending queries (the pending union
    # is guarded in _pending_batches itself, so every consumer —
    # rows(), probe queries, semi_join — inherits the isolation)
    assert (old.query_by_value("role", "tool",
                               include_pending=True).count()
            == b1.where(F.col("role") == "tool").count())

    # unknown / vacuumed generations are an explicit error
    with pytest.raises(ValueError, match="not present"):
        TranscriptColumnStore(spark, root, generation=7)
    t.unpersist()
