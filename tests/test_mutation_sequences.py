"""Model-based check of the mutating store surface: a deterministic
interleaving of add_range/close/compact/delete/upsert/rebuild/vacuum is
replayed against a plain-DataFrame model, and after every step the
store's full enumeration must equal the model under the stable
(conv_id, turn_idx) order. This is the cross-operation contract no
single-op test pins: tombstones from one op must compose with the
rewrites of the next (e.g. delete after compact after streaming-shaped
small batches), and id namespaces must never collide across the
sequence."""

import os

import pytest
from pyspark.sql import functions as F

from columnstore_spark.sources.transcripts import load_transcripts
from columnstore_spark.store import TranscriptColumnStore

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _sorted(df, cols):
    return df.orderBy("conv_id", "turn_idx").select(cols).collect()


def test_mutation_sequence_matches_model(spark, tmp_path):
    t = load_transcripts(spark, SF_DIR).persist()
    cols = t.columns
    s = TranscriptColumnStore(spark, str(tmp_path / "store"),
                              num_rowgroups=4)

    # step 1-2: two closes (streaming-shaped small batches)
    b1 = t.where(F.col("turn_idx") % 3 == 0)
    b2 = t.where(F.col("turn_idx") % 3 == 1)
    s.add_range(b1)
    s.close()
    s.add_range(b2)
    s.close()
    model = b1.unionByName(b2)
    assert _sorted(s.rows(), cols) == _sorted(model, cols)

    # step 3: compact the accreted small rowgroups
    s.compact()
    assert _sorted(s.rows(), cols) == _sorted(model, cols)

    # step 4: delete a conversation (post-compact tombstone compose)
    victim = model.select("conv_id").first()["conv_id"]
    s.delete_where("conv_id", victim)
    model = model.where(F.col("conv_id") != victim)
    assert _sorted(s.rows(), cols) == _sorted(model, cols)

    # step 5: upsert — replace one surviving conversation, add one new
    key2 = model.select("conv_id").first()["conv_id"]
    repl = (model.where(F.col("conv_id") == key2)
            .withColumn("text", F.concat(F.col("text"), F.lit("!"))))
    s.upsert(repl, key="conv_id")
    model = model.where(F.col("conv_id") != key2).unionByName(repl)
    assert _sorted(s.rows(), cols) == _sorted(model, cols)

    # step 6: third batch lands AFTER rewrites (namespace disjointness)
    b3 = t.where(F.col("turn_idx") % 3 == 2)
    s.add_range(b3)
    s.close()
    model = model.unionByName(b3)
    assert _sorted(s.rows(), cols) == _sorted(model, cols)

    # step 7: delete a range over the mixed old/rewritten/new groups
    s.delete_where("turn_idx", (0, 2))
    model = model.where(~F.col("turn_idx").between(0, 2))
    assert _sorted(s.rows(), cols) == _sorted(model, cols)

    # step 8: rebuild folds everything into a fresh generation...
    s.rebuild()
    assert _sorted(s.rows(), cols) == _sorted(model, cols)
    # ...and vacuum reclaims the old one without changing answers
    removed = s.vacuum()
    assert removed["generations"]
    assert _sorted(s.rows(), cols) == _sorted(model, cols)

    # stats stayed consistent through the whole sequence
    st = {r["column"]: r for r in s.stats().collect()}
    assert st["conv_id"]["n_rows"] == model.count()
    # and a point query agrees with the model end-state
    probe = model.select("conv_id").first()["conv_id"]
    assert (s.query_by_value("conv_id", probe).count()
            == model.where(F.col("conv_id") == probe).count())
    t.unpersist()


def test_evolution_interleaved_mutations_match_model(spark, tmp_path):
    """Schema evolution composed with every mutation: adds/drops land
    between ingests, deletes and compactions run while evolution is
    pending, rebuild materializes, and a dropped name is re-added
    after rebuild. After every step the store's enumeration equals a
    plain-DataFrame model under the effective schema."""
    t = load_transcripts(spark, SF_DIR).persist()
    s = TranscriptColumnStore(spark, str(tmp_path / "evo_store"),
                              num_rowgroups=4)

    def check(model):
        cols = [f.name for f in s.schema().fields]
        assert sorted(model.columns) == sorted(cols)
        assert _sorted(s.rows(), cols) == _sorted(model.select(cols), cols)

    # step 1: base ingest
    b1 = t.where(F.col("turn_idx") % 3 == 0)
    s.add_range(b1)
    s.close()
    model = b1
    check(model)

    # step 2: metadata-only add — old rows read NULL
    s.add_column("score", "bigint")
    model = model.withColumn("score", F.lit(None).cast("long"))
    check(model)

    # step 3: ingest WITH the evolved column
    b2 = (t.where(F.col("turn_idx") % 3 == 1)
          .withColumn("score", (F.col("turn_idx") * 7).cast("long")))
    s.add_range(b2)
    s.close()
    model = model.unionByName(b2)
    check(model)

    # step 4: probe queries while evolution is pending
    assert (s.query_by_null("score").count()
            == model.where(F.col("score").isNull()).count())
    probe = model.where(F.col("score").isNotNull()).first()["score"]
    assert (s.query_by_value("score", probe).count()
            == model.where(F.col("score") == probe).count())

    # step 5: delete on a fully-covered column, evolution still pending
    s.delete_where("turn_idx", (0, 1))
    model = model.where(~F.col("turn_idx").between(0, 1))
    check(model)

    # step 6: drop a column mid-flight
    s.drop_column("tool")
    model = model.drop("tool")
    check(model)

    # step 7: rebuild materializes adds + drops physically
    s.rebuild()
    assert not s._schema_log()
    check(model)

    # step 8: re-adding the dropped name is legal post-rebuild; it
    # starts NULL everywhere (old values must NOT resurface)
    s.add_column("tool", "string")
    model = model.withColumn("tool", F.lit(None).cast("string"))
    check(model)
    assert s.rows().where(F.col("tool").isNotNull()).count() == 0

    # step 9: post-re-add ingest carries fresh tool values
    b3 = (t.where(F.col("turn_idx") % 3 == 2)
          .withColumn("score", F.lit(None).cast("long"))
          .withColumn("tool", F.lit("fresh")))
    s.add_range(b3)
    s.close()
    model = model.unionByName(b3.select(model.columns))
    check(model)

    # step 10: compact the accreted rowgroups (heterogeneous coverage)
    s.compact()
    check(model)

    # step 11: rebuild + vacuum; global paging tiles the final state
    s.rebuild()
    s.vacuum()
    check(model)
    total = model.count()
    got = None
    for off in range(0, total + 300, 300):
        page = s.rows_window(off, 300)
        got = page if got is None else got.unionByName(page)
    assert got.count() == total
    t.unpersist()
