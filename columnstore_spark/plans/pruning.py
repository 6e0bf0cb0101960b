"""Manifest-driven segment pruning — the Spark re-expression of the
reference's query-on-encoded fast paths: hash skip-scan
(`DefaultEncoding.cs:104-113`), dictionary bitmap filter
(`DictionaryEncoding.cs:174-203`) and `ColumnSegment.QueryByValue`
(`/root/reference/Outcompute.ColumnStore/Segments/ColumnSegment.cs:38-92`).

Instead of per-value hashes inside the payload we keep min/max/ndv per
segment in the manifest; an equality/range predicate eliminates whole
rowgroups *before* any decode work — the same role Parquet row-group
statistics play. Pruning is conservative: it never changes results, only
skips provably-non-matching segments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def prune_rowgroups_by_value(segments: DataFrame, column: str,
                             value: str) -> DataFrame:
    """Keep only rowgroups whose `column` segment may contain `value`
    (string-repr min/max bounds, exact for string columns)."""
    keep = (segments
            .where((F.col("column") == column)
                   & (F.col("min_repr") <= value)
                   & (F.col("max_repr") >= value))
            .select("rowgroup_id").distinct())
    return segments.join(keep, on="rowgroup_id", how="left_semi")


def prune_rowgroups_by_range(segments: DataFrame, column: str,
                             lo: str, hi: str) -> DataFrame:
    keep = (segments
            .where((F.col("column") == column)
                   & (F.col("min_repr") <= hi)
                   & (F.col("max_repr") >= lo))
            .select("rowgroup_id").distinct())
    return segments.join(keep, on="rowgroup_id", how="left_semi")
