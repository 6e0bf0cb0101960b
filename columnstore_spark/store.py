"""TranscriptColumnStore — the reference's ``IColumnStore<TRow>``
surface (`/root/reference/Outcompute.ColumnStore.Abstractions/IColumnStore.cs:6-34`,
impl `ColumnStore.cs:6-100`) over the distributed warehouse.

Method mapping (reference -> here):

    Add / AddRange      -> add_range(df)        delta append (I1/I2)
    Close               -> close()              compact pending delta
                                                batches to solid (I3+I5)
    GetEnumerator       -> rows()               solid then delta
                                                (`ColumnStore.cs:76-87`)
    Rebuild             -> rebuild()            re-encode everything as
                                                a fresh generation (I6)
    Stats               -> stats()              stats tree rollup
                                                (T1-T4, lazy via the
                                                manifest)
    QueryByValue/Range  -> query_by_value(),    segment probes behind
                           query_by_window()    manifest pruning (S3/S4)

The delta store is a directory of raw parquet batch appends; ``close``
compacts every pending batch through ``Warehouse.encode_resumable``
(manifest commit protocol, so a crashed compact resumes); rowgroup ids
are namespaced per batch exactly like the streaming ingest. All state
lives in storage — two TranscriptColumnStore objects opened on the
same root see the same store.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .codecs import chooser
from .operators import (
    decode,
    decode_matching,
    decode_matching_range,
    decode_window,
)
from .operators.decode import schema_from_segments
from .plans.pruning import (
    prune_rowgroup_ids,
    prune_rowgroups_by_range,
    prune_rowgroups_by_value,
)
from .sources.warehouse import Warehouse

_BATCH_SHIFT = 40  # rowgroup namespace per delta batch (as streaming)


class TranscriptColumnStore:
    def __init__(self, spark: SparkSession, root: str,
                 num_rowgroups: int = 8,
                 rows_per_segment: int = 1_000_000,
                 mode: str = chooser.MODE_SIZE,
                 format: str = "auto"):
        self.spark = spark
        self.root = root.rstrip("/")
        self.num_rowgroups = num_rowgroups
        self.rows_per_segment = rows_per_segment
        self.mode = mode
        self._format = format
        self._generation = self._latest_generation()
        self.warehouse = Warehouse(self._gen_root(), format=format)
        os.makedirs(self._delta_root(), exist_ok=True)

    # -- layout --------------------------------------------------------------

    def _gen_root(self) -> str:
        return f"{self.root}/gen_{self._generation:04d}"

    def _delta_root(self) -> str:
        return f"{self.root}/delta"

    def _latest_generation(self) -> int:
        try:
            gens = [int(d.split("_")[1]) for d in os.listdir(self.root)
                    if d.startswith("gen_")]
            return max(gens) if gens else 0
        except FileNotFoundError:
            return 0

    def _batches(self) -> list[str]:
        root = self._delta_root()
        return sorted(d for d in os.listdir(root) if d.startswith("batch_"))

    def _retired_batches(self) -> set[str]:
        """Delta batches folded into this generation by a rebuild."""
        try:
            with open(f"{self._gen_root()}/retired_batches.txt") as f:
                return set(f.read().split())
        except FileNotFoundError:
            return set()

    def _pending_batches(self) -> list[str]:
        m = self.warehouse.manifest(self.spark)
        done = (set() if m is None else
                {r["run_id"] for r in m.select("run_id").distinct().collect()})
        done |= self._retired_batches()
        return [b for b in self._batches() if b not in done]

    # -- ingest (I1/I2/I3/I5) ------------------------------------------------

    def add_range(self, df: DataFrame) -> int:
        """Append a batch of rows to the delta store (reference
        `AddRange`: one version bump per batch)."""
        idx = len(self._batches())
        df.write.mode("errorifexists").parquet(
            f"{self._delta_root()}/batch_{idx:06d}")
        return idx

    def close(self) -> int:
        """Compact every pending delta batch to solid segments
        (`Close` + the intended `TryCompact`); returns the number of
        batches compacted. Idempotent and crash-resumable (manifest)."""
        compacted = 0
        for name in self._pending_batches():
            batch_idx = int(name.split("_")[1])
            df = self.spark.read.parquet(f"{self._delta_root()}/{name}")
            self.warehouse.encode_resumable(
                df, num_rowgroups=self.num_rowgroups,
                rows_per_segment=self.rows_per_segment, mode=self.mode,
                run_id=name,
                rowgroup_offset=batch_idx << _BATCH_SHIFT)
            compacted += 1
        return compacted

    # -- read (GetEnumerator) ------------------------------------------------

    def solid_rows(self) -> DataFrame:
        return decode(self.warehouse.committed_segments(self.spark))

    def rows(self) -> DataFrame:
        """Every row exactly once: solid row groups decoded from the
        warehouse, then delta batches not yet compacted — the
        reference's enumeration order (`ColumnStore.cs:76-87`)."""
        pending = self._pending_batches()
        delta = None
        if pending:
            delta = self.spark.read.parquet(
                *[f"{self._delta_root()}/{b}" for b in pending])
        m = self.warehouse.manifest(self.spark)
        if m is None:
            if delta is None:
                raise ValueError("empty store")
            return delta
        solid = self.solid_rows()
        return solid if delta is None else solid.unionByName(delta)

    # -- rebuild (I6) --------------------------------------------------------

    def rebuild(self, num_rowgroups: int | None = None) -> None:
        """Re-encode the whole store as a fresh generation
        (`Rebuild`: "re-encode entire dataset as one compressed
        group"); the old generation stays on disk for readers holding
        it, the store object switches to the new one.

        Atomicity: the new generation is staged under a dot-prefixed
        temp dir (invisible to `_latest_generation`) holding BOTH the
        manifest commit and `retired_batches.txt`, then renamed into
        place in one `os.rename`. A crash at any point leaves either
        the old state (stale temp dir, reclaimed on retry) or the
        complete new generation — never a committed generation whose
        folded delta batches still look pending (which would
        double-count every folded row on the next close)."""
        all_rows = self.rows()
        folded = self._batches()
        gen = self._generation + 1
        final_root = f"{self.root}/gen_{gen:04d}"
        tmp_root = f"{self.root}/.gen_{gen:04d}.tmp"
        shutil.rmtree(tmp_root, ignore_errors=True)  # crashed prior attempt
        staged = Warehouse(tmp_root, format=self._format)
        staged.encode_resumable(
            all_rows, num_rowgroups=num_rowgroups or 1,
            rows_per_segment=self.rows_per_segment, mode=self.mode,
            run_id="rebuild")
        # every existing delta batch is now solid in this generation;
        # written BEFORE the rename so retirement commits atomically
        # with the generation itself
        with open(f"{tmp_root}/retired_batches.txt", "w") as f:
            f.write("\n".join(folded))
        os.rename(tmp_root, final_root)
        self._generation = gen
        self.warehouse = Warehouse(final_root, format=self._format)

    # -- stats (T1-T4) -------------------------------------------------------

    def stats(self) -> DataFrame:
        """Per-column stats tree rollup from the manifest (metadata
        only — never touches payload bytes).

        Min/max roll up in the value domain: `min_num`/`max_num` for
        the integer family (epoch units / unscaled decimals), string
        `min_str`/`max_str` only for string columns (where the
        lexicographic rollup is meaningful); other logicals report
        nulls rather than a lexicographically-wrong answer."""
        m = self.warehouse.manifest(self.spark)
        if m is None:
            raise ValueError("empty store (no committed segments)")
        is_str = F.col("logical_type") == "string"
        return (m.groupBy("column")
                .agg(F.sum("n_rows").alias("n_rows"),
                     F.sum("n_nulls").alias("n_nulls"),
                     F.sum("n_distinct").alias("distinct_upper_bound"),
                     F.sum("n_runs").alias("n_runs"),
                     F.min("min_num").alias("min_num"),
                     F.max("max_num").alias("max_num"),
                     F.min("min_flt").alias("min_flt"),
                     F.max("max_flt").alias("max_flt"),
                     F.min(F.when(is_str, F.col("min_repr"))).alias("min_str"),
                     F.max(F.when(is_str, F.col("max_repr"))).alias("max_str"),
                     F.sum("raw_bytes").alias("raw_bytes"),
                     F.sum("enc_bytes").alias("enc_bytes")))

    # -- queries (S3/S4) -----------------------------------------------------

    def _manifest_or_raise(self) -> DataFrame:
        m = self.warehouse.manifest(self.spark)
        if m is None:
            raise ValueError("empty store (no committed segments)")
        return m

    def _logical_type(self, m: DataFrame, column: str) -> str | None:
        row = (m.where(F.col("column") == column)
               .select("logical_type").first())
        return row["logical_type"] if row is not None else None

    def _pruned_segments(self, m: DataFrame, column: str, lo, hi,
                         eq: bool) -> DataFrame:
        """Segments restricted to rowgroups that may match the probe.

        The predicate is evaluated on the MANIFEST (metadata table —
        payload never scanned), and the kept ids come back as a
        `rowgroup_id IN (...)` filter on the segments table, which the
        parquet scan uses to skip whole row groups (PushedFilters —
        gated in tests/test_plans.py). Oversized keep-sets fall back to
        the left-semi join, which scales to any id count."""
        lt = self._logical_type(m, column)
        segs = self.warehouse.committed_segments(self.spark)
        ids = prune_rowgroup_ids(m, column, lo, hi, eq, logical_type=lt)
        if ids is not None:
            return segs.where(F.col("rowgroup_id").isin(ids))
        prune = (prune_rowgroups_by_value if eq
                 else prune_rowgroups_by_range)
        args = (lo,) if eq else (lo, hi)
        return prune(segs, column, *args, logical_type=lt)

    def query_by_value(self, column: str, value) -> DataFrame:
        """Rows where `column` equals `value`, reading only segments
        whose manifest stats admit the probe (the reference's
        `QueryByValue` inverted-index idea at warehouse scale). The
        column's logical type comes from the manifest (metadata), so
        numeric probes prune in the value domain — never the
        lexicographic repr.

        Within the surviving rowgroups the rows come straight off the
        encoded form (`decode_matching`: probe ranges on the queried
        column, run-clipped gathers on the rest) — no full decode. The
        trailing `.where` re-applies Spark's own equality on the
        already-matching rows (bit-cheap) so the result semantics are
        exactly the DataFrame filter's, whatever the probe's type."""
        m = self._manifest_or_raise()
        pruned = self._pruned_segments(m, column, value, value, eq=True)
        lt = self._logical_type(m, column) or ""
        if lt.startswith("nested:") or lt == "binary":
            # Arrow's equality kernels don't cover nested/binary probes
            # uniformly — decode + Spark's own equality instead
            return (decode(pruned, schema=schema_from_segments(m))
                    .where(F.col(column) == F.lit(value)))
        return (decode_matching(pruned, column, value,
                                schema=schema_from_segments(m))
                .where(F.col(column) == value))

    def query_by_range(self, column: str, lo, hi) -> DataFrame:
        """Rows where lo <= `column` <= hi: manifest pruning, then the
        encoded-form range probe (`decode_matching_range` — a
        conservative superset off the dictionary/runs), with Spark's
        own `between` re-applied as the exact predicate."""
        m = self._manifest_or_raise()
        pruned = self._pruned_segments(m, column, lo, hi, eq=False)
        lt = self._logical_type(m, column) or ""
        if lt.startswith("nested:") or lt == "binary":
            return (decode(pruned, schema=schema_from_segments(m))
                    .where(F.col(column).between(F.lit(lo), F.lit(hi))))
        return (decode_matching_range(pruned, column, lo, hi,
                                      schema=schema_from_segments(m))
                .where(F.col(column).between(lo, hi)))

    def query_by_window(self, rowgroup_id: int, start: int,
                        length: int) -> DataFrame:
        """Row window of one rowgroup via the run-clipping kernels."""
        segs = self.warehouse.committed_segments(self.spark)
        return decode_window(segs, rowgroup_id, start, length)
