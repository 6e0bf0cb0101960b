"""Side-by-side Spark vs DuckDB oracle parity for every __spark_entry__
query — a local stand-in for the driver's CORRECTNESS gate (row count +
schema + order-insensitive values, columns sorted by name).
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = __import__("os").environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _duck(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.sql(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            df[c] = s.map(lambda v: None if v is None or (isinstance(v, float) and np.isnan(v)) else v)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif isinstance(s.dtype, pd.CategoricalDtype):
            df[c] = s.astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_matches_oracle(spark, name):
    q = entrymod.queries()[name]
    spark_df = _canon(q(spark, SF_DIR).toPandas())
    duck_df = _canon(_duck(SF_DIR, entrymod.oracle_sql()[name]))
    assert list(spark_df.columns) == list(duck_df.columns), name
    assert len(spark_df) == len(duck_df), (name, len(spark_df), len(duck_df))
    pd.testing.assert_frame_equal(spark_df, duck_df, check_dtype=False,
                                  check_exact=True)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_media_entropy_rows_only(spark):
    """Multimodal plumbing: the derived-double stats agree with the
    oracle-checked integer stats and the metadata query."""
    dec = entrymod.queries()["media_entropy"](spark, SF_DIR).toPandas()
    meta = _duck(SF_DIR, entrymod.oracle_sql()["media_meta"])
    m = dec.merge(meta, on="doc_id", suffixes=("", "_meta"))
    assert len(m) == len(meta) > 0
    assert (m["n_bytes"] == m["n_bytes_meta"]).all()
    assert (m["first_byte"] == m["first_byte_meta"]).all()
    # byte_mean is byte_sum/n_bytes by construction
    nz = m[m["n_bytes"] > 0]
    assert np.allclose(nz["byte_mean"],
                       np.round(nz["byte_sum"] / nz["n_bytes"], 4))
    assert ((m["byte_mean"] >= 0) & (m["byte_mean"] < 256)).all()
    assert (m["byte_entropy"] >= 0).all()


def test_rows_only_queries(spark):
    df = entrymod.queries()["compression_codecs"](spark, SF_DIR)
    rows = {r["column"]: r for r in df.collect()}
    assert set(rows) == set(entrymod.TRANSCRIPT_COLS)
    for c, r in rows.items():
        assert r["enc_bytes"] > 0
    # text must actually compress
    assert rows["text"]["ratio"] < 0.5
