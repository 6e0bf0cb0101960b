"""Transcript table builders.

The engine's input shape (BASELINE.json input_hint):
    conv_id: string, turn_idx: int32, role: string, text: string,
    tool: string (nullable), ts: timestamp

Two deterministic sources:

* ``TRANSCRIPTS_SQL`` — derives transcripts from the driver-provided
  testdata tables (`events` x `documents`). One ANSI-SQL string executable
  by BOTH Spark SQL and DuckDB, so correctness oracles see the identical
  input. Conversation = user, turn order = event time; zipf-ish turn
  counts per user give the skew profile of FIXTURES.md F1.

* ``synthetic_transcripts`` — a scale multiplier that replicates the base
  conversations under fresh conv_ids (pure Spark ops, seedless and
  deterministic) for throughput benchmarking beyond the testdata size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = ("region", "nation", "customer", "supplier", "part",
                   "orders", "lineitem", "events", "documents", "embeddings")

# Runs identically on Spark SQL and DuckDB (ANSI subset: ||, lpad, CASE,
# row_number, CROSS JOIN on a counted CTE instead of a hard-coded doc count).
TRANSCRIPTS_SQL = """
WITH dc AS (SELECT count(*) AS n FROM documents)
SELECT
  'c' || lpad(CAST(e.user_id AS STRING), 12, '0') AS conv_id,
  CAST(row_number() OVER (PARTITION BY e.user_id
                          ORDER BY e.ts, e.event_id) - 1 AS INT) AS turn_idx,
  CASE e.event_type
    WHEN 'click' THEN 'user'
    WHEN 'view' THEN 'assistant'
    WHEN 'error' THEN 'tool'
    WHEN 'signup' THEN 'system'
    ELSE 'assistant'
  END AS role,
  d.text AS text,
  CASE WHEN e.event_type IN ('error', 'purchase')
       THEN 'tool_' || CAST(e.event_id % 16 AS STRING)
       ELSE NULL END AS tool,
  e.ts AS ts
FROM events e
CROSS JOIN dc
JOIN documents d ON d.doc_id = e.event_id % dc.n
"""


def register_testdata(spark: SparkSession, sf_dir: str,
                      tables=TESTDATA_TABLES) -> None:
    for t in tables:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


def load_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_testdata(spark, sf_dir, ("events", "documents"))
    return spark.sql(TRANSCRIPTS_SQL)


def synthetic_transcripts(spark: SparkSession, sf_dir: str,
                          replicate: int = 1) -> DataFrame:
    """Deterministically scale the transcript table by `replicate`.

    Each replica keeps identical turn structure under a fresh conv_id
    (suffix `-r<k>`) with a time offset, so cardinality/run profiles per
    conversation are preserved while total volume grows linearly —
    the SF-scaled stand-in for the 10^12-turn table (SURVEY.md §6).
    """
    base = load_transcripts(spark, sf_dir)
    if replicate <= 1:
        return base
    reps = spark.range(replicate).select(F.col("id").alias("rep"))
    return (
        base.crossJoin(F.broadcast(reps))
        .withColumn("conv_id", F.concat_ws("-", F.col("conv_id"),
                                           F.concat(F.lit("r"), F.col("rep"))))
        .withColumn("ts", F.col("ts") + F.make_interval(secs=F.col("rep")))
        .drop("rep")
    )
