"""Driver program for the pipeline-operator scaling protocol
(round-4 verdict #1): runs ONE named pipeline operator over a
pre-generated synthetic input and prints one RESULT json line —
submitted to the pinned standalone cluster by
``pipeline_scale_bench.py`` via ``spark-submit --py-files`` at two
cluster sizes (N = 1 executor x 2 cores, 4N = 4 x 2), exactly the
``cluster_bench.py`` protocol the encode path already evidences.

Inputs are DETERMINISTIC SYNTHETIC corpora (no external data), sized
well past the fixed-cost regime and generated ONCE by the orchestrator
(generation is input prep, not part of the timed operator):

* documents — md5-derived 12-char "words", all docs pairwise distinct
  except a planted ~1% exact-duplicate tail (so dedup joins carry a
  realistic, bounded pair output instead of the quadratic blowup a
  naive replicate-the-corpus corpus would produce: every replica of a
  doc would pair with every other, n_reps^2 pairs per doc).
* edges — disjoint chains of CHAIN nodes (worst-ish case for
  alternating-star: maximal rounds at a given edge count).
* vectors — hash-derived 64-dim doubles in [-1, 1]; the batch-ANN
  query relation is every stride-th vector, pinned to ~128 queries
  (the external-query-table shape of ann_batch_ivf_df).

The timed run forces EVERY output column through one xxhash64
checksum aggregate (count() alone would let column pruning skip the
actual metric/score computation).
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

DIM = 64
N_QUERIES = 128


# -- deterministic generators (shared with the orchestrator's prep) ---------

def gen_documents(spark, n_docs: int, words: int = 60,
                  dup_permille: int = 10):
    """`n_docs` synthetic docs of `words` md5-derived 12-char words
    (~13 bytes/word of text). The last docs with
    id % 1000 < dup_permille (in the upper half) are EXACT copies of
    id - n_docs//2 — a planted ~dup_permille/1000 duplicate rate with
    bounded pair output."""
    half = n_docs // 2
    cid = (f"CAST(CASE WHEN id % 1000 < {dup_permille} "
           f"AND id >= {half} THEN id - {half} ELSE id END AS STRING)")
    return spark.range(n_docs).selectExpr(
        "id AS doc_id",
        f"array_join(transform(sequence(0, {words - 1}), "
        f"j -> substr(md5(concat({cid}, '_', CAST(j AS STRING))), "
        f"1, 12)), ' ') AS text")


def gen_edges(spark, n_nodes: int, chain: int = 5):
    """Disjoint chains of `chain` nodes over [0, n_nodes) — (u, v)
    BIGINT edges for connected_components."""
    return (spark.range(n_nodes - 1)
            .where(f"id % {chain} != {chain - 1}")
            .selectExpr("id AS u", "id + 1 AS v"))


def gen_vectors(spark, n_vecs: int, dim: int = DIM):
    """Hash-derived dense vectors in [-1, 1], labels id % 10."""
    return spark.range(n_vecs).selectExpr(
        "id AS vec_id",
        f"transform(sequence(0, {dim - 1}), j -> "
        f"CAST(pmod(hash(id * {dim} + j), 2001) - 1000 AS DOUBLE) "
        "/ 1000.0) AS embedding",
        "CAST(id % 10 AS INT) AS label")


# -- the timed operators ----------------------------------------------------

def build_op(spark, op: str, input_dir: str):
    from columnstore_spark.functions.dialect import SPARK as SPARK_D
    from columnstore_spark.functions.pipeline import (
        ann_batch_ivf_df,
        connected_components,
        dedup_substring_chunked_df,
        spark_pipeline_df,
        text_metrics_sql,
    )

    if op == "dedup_clusters":
        edges = spark.read.parquet(f"{input_dir}/edges.parquet")
        return connected_components(edges)
    if op == "ann_batch":
        vecs = spark.read.parquet(f"{input_dir}/vectors.parquet")
        vecs.createOrReplaceTempView("embeddings")
        n_vecs = vecs.count()
        stride = max(n_vecs // N_QUERIES, 1)
        spark.sql(
            f"SELECT vec_id AS query_id, embedding FROM embeddings "
            f"WHERE vec_id % {stride} = 0"
        ).createOrReplaceTempView("ann_queries")
        return ann_batch_ivf_df(spark, DIM,
                                queries_table="ann_queries")
    docs = spark.read.parquet(f"{input_dir}/documents.parquet")
    docs.createOrReplaceTempView("documents")
    if op == "text_metrics":
        return spark.sql(text_metrics_sql(SPARK_D))
    if op == "dedup_substring":
        # the Spark production spine: chunked megadocs + xxhash64
        return dedup_substring_chunked_df(spark, fast_hash=True)
    if op == "dedup_ngram_jaccard":
        return spark_pipeline_df(spark, "dedup_ngram_jaccard", DIM)
    raise ValueError(f"unknown op {op!r}")


def force(df) -> tuple[int, int]:
    """Force EVERY output column: rows_out + a fold of xxhash64 over
    all columns (column pruning cannot skip any computed column)."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        # modular fold: a raw sum of xxhash64 overflows int64 under
        # ANSI mode at ~2^31 rows
        F.sum(F.pmod(F.xxhash64(*df.columns),
                     F.lit(1_000_003))).alias("h")).collect()[0]
    return int(row["n"]), int(row["h"] or 0)


def main() -> None:
    op, input_dir = sys.argv[1], sys.argv[2]
    spark = (SparkSession.builder.appName(f"pipeline_scale:{op}")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.shuffle.partitions", "8")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    try:
        total_cores = int(spark.conf.get("spark.cores.max"))
    except Exception:
        total_cores = spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.shuffle.partitions",
                   str(max(total_cores * 2, 8)))

    meta = json.load(open(f"{input_dir}/meta.json"))
    t0 = time.perf_counter()
    rows_out, checksum = force(build_op(spark, op, input_dir))
    wall = round(time.perf_counter() - t0, 2)
    gb = meta.get("text_gb") or meta.get("input_gb")
    print("RESULT " + json.dumps({
        "op": op, "wall_s": wall, "rows_out": rows_out,
        "checksum": checksum, "input_gb": gb,
        "throughput_gbps": round(gb / wall, 4) if gb else None,
        "cores": total_cores, **meta}))
    spark.stop()


if __name__ == "__main__":
    main()
