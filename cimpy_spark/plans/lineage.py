"""Checkpoint/resume ledger (north_rule: per-partition lineage +
triple-count metrics, idempotent resume from the last committed
snapshot).

The reference's analog is its grouped error/info accounting printed at
the end of an import (cimpy/cimimport.py:41-66,71-74). Here each
pipeline stage commits (a) its output as a parquet snapshot directory
and (b) a lineage record `(stage, rows_out, partitions, committed)`.
A stage is *committed* iff its `_SUCCESS` marker and its ledger row
both exist; resume reads the committed snapshot instead of
recomputing — re-running a finished pipeline is a no-op.

On a real cluster the snapshot store is Iceberg (atomic snapshot
commit replaces the `_SUCCESS` convention and gives time travel);
the ledger logic is identical, keyed by Iceberg snapshot id. Parquet
+ `_SUCCESS` is the sandbox stand-in.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


class LineageLedger:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, "_lineage.jsonl")
        os.makedirs(out_dir, exist_ok=True)

    def records(self) -> dict[str, dict]:
        recs: dict[str, dict] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                for seq, line in enumerate(f):
                    if line.strip():
                        r = json.loads(line)
                        r["seq"] = seq  # commit order; last record wins
                        recs[r["stage"]] = r
        return recs

    def committed_after(self, stage: str, other: str) -> bool:
        """True iff `stage` is committed and its commit is at least as
        recent as `other`'s — the staleness check for incremental
        consumers (a crash between two stage commits must not let a
        stale upstream snapshot be trusted)."""
        recs = self.records()
        if stage not in recs or not self.is_committed(stage):
            return False
        if other not in recs:
            return True
        return recs[stage]["seq"] > recs[other]["seq"]

    def stage_dir(self, stage: str) -> str:
        return os.path.join(self.out_dir, stage)

    def is_committed(self, stage: str) -> bool:
        recs = self.records()
        if stage not in recs:
            return False
        if "increments" in recs[stage]:  # append-only stage
            return self.is_append_committed(stage)
        return os.path.exists(os.path.join(self.stage_dir(stage), "_SUCCESS"))

    def commit(
        self,
        stage: str,
        df_written: DataFrame,
        rows: int,
        parts: int,
        partition_rows: dict[str, int] | None = None,
    ) -> None:
        rec = {
            "stage": stage,
            "rows_out": rows,
            "partitions": parts,
            "partition_rows": partition_rows or {},
            "committed": True,
        }
        # append-only ledger; last record per stage wins on read
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    # ---- append-only stages (Iceberg-append stand-in) ----------------
    #
    # A fact stage at 10^12-turn scale must never be rewritten per
    # increment. Each append writes ONLY the increment to
    # <stage>/inc_<n>/ and commits a ledger record listing all live
    # increment dirs; the snapshot reader is the union of those dirs.
    # On Iceberg this is a metadata-only append commit; here the
    # `_SUCCESS`-per-increment + last-ledger-record-wins convention
    # gives the same crash semantics: an increment exists iff its dir
    # is complete AND a committed record lists it. A crash between the
    # two leaves an orphan dir that the retry overwrites in place
    # (same index), so resume is idempotent.

    def _per_file_rows(self, scan_dir: str, rel_base: str) -> dict[str, int]:
        """Per-file row counts for a just-written parquet dir, read
        from the parquet FOOTERS on the driver (r8): the previous
        implementation ran a full Spark scan + groupBy(input_file_name)
        job per stage commit — a second read of every byte just
        written. Footer metadata is the same row count at O(files)
        metadata reads instead of O(rows). Keys are paths relative to
        `rel_base`, matching the old input_file_name()-derived keys.
        (On Iceberg the manifest carries these counts natively.)"""
        import glob as _glob

        import pyarrow.parquet as _pq

        out: dict[str, int] = {}
        for p in sorted(
            _glob.glob(os.path.join(scan_dir, "**", "*.parquet"), recursive=True)
        ):
            out[os.path.relpath(p, rel_base)] = _pq.ParquetFile(
                p
            ).metadata.num_rows
        return out

    def append_increments(self, stage: str) -> list[str]:
        """Committed increment dirs for an append stage (absolute)."""
        rec = self.records().get(stage)
        if not rec or "increments" not in rec:
            return []
        return [os.path.join(self.stage_dir(stage), i) for i in rec["increments"]]

    def is_append_committed(self, stage: str) -> bool:
        dirs = self.append_increments(stage)
        return bool(dirs) and all(
            os.path.exists(os.path.join(p, "_SUCCESS")) for p in dirs
        )

    def last_increment_rows(self, stage: str) -> int:
        """Row count of the MOST RECENT committed increment of an
        append stage. The latest ledger record's ``partition_rows``
        map covers only the increment that record committed (it is
        built from a read of the new increment dir alone), so its sum
        is the batch size — free metadata, no Spark job. Consumers use
        it to size-gate broadcast hints on batch-derived frames."""
        rec = self.records().get(stage)
        if not rec or "increments" not in rec:
            raise ValueError(
                f"stage '{stage}' has no committed append increments"
            )
        return sum(rec["partition_rows"].values())

    def read_append_stage(self, spark: SparkSession, stage: str, schema) -> DataFrame:
        # one reader per increment dir, unioned: a single multi-path
        # read over hive-partitioned increments trips Spark's
        # conflicting-directory-structure check, and per-dir readers
        # keep partition pruning per increment (Iceberg replaces this
        # with one snapshot scan)
        from functools import reduce

        dirs = self.append_increments(stage)
        if not dirs:
            # a legacy (non-append) record or an empty increment list —
            # fail loudly instead of reduce() over nothing; callers
            # gate on is_append_committed
            raise ValueError(
                f"stage '{stage}' has no committed append increments "
                f"(legacy-format snapshot? gate on is_append_committed)"
            )
        dfs = [spark.read.schema(schema).parquet(p) for p in dirs]
        return reduce(lambda a, b: a.unionByName(b), dfs)

    def run_append_stage(
        self,
        spark: SparkSession,
        stage: str,
        build_increment: "callable[[], DataFrame]",
        partition_by: list[str] | None = None,
        reset: bool = False,
    ) -> DataFrame:
        """Append one increment to the stage and return the reader over
        ALL committed increments. `reset=True` starts the increment
        list over (bootstrap/force). Old increment dirs are never
        rewritten — O(increment) IO per call, not O(corpus)."""
        d = self.stage_dir(stage)
        rec = self.records().get(stage)
        incs = (
            list(rec["increments"])
            if (rec and "increments" in rec and not reset)
            else []
        )
        prev_rows = rec["rows_out"] if (rec and incs) else 0
        prev_parts = rec["partitions"] if (rec and incs) else 0

        df = build_increment()
        inc_name = f"inc_{len(incs):05d}"
        inc_dir = os.path.join(d, inc_name)
        writer = df.write.mode("overwrite")  # overwrites crash leftovers
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(inc_dir)
        per_file = self._per_file_rows(inc_dir, d)
        inc_rows = sum(per_file.values())
        incs.append(inc_name)
        with open(self.path, "a") as f:
            f.write(
                json.dumps(
                    {
                        "stage": stage,
                        "rows_out": prev_rows + inc_rows,
                        "partitions": prev_parts + len(per_file),
                        "partition_rows": per_file,
                        "increments": incs,
                        "committed": True,
                    }
                )
                + "\n"
            )
        return self.read_append_stage(spark, stage, df.schema)

    def run_stage(
        self,
        spark: SparkSession,
        stage: str,
        build: "callable[[], DataFrame]",
        partition_by: list[str] | None = None,
        force: bool = False,
    ) -> DataFrame:
        """Compute-or-resume one stage.

        If the stage is committed and not forced, return the snapshot
        reader (no recompute — idempotent resume). Otherwise compute,
        write atomically-enough (parquet `_SUCCESS` last), record
        lineage, and return the snapshot reader so downstream stages
        consume the *committed* data, never a divergent in-memory
        plan.
        """
        d = self.stage_dir(stage)
        if not force and self.is_committed(stage):
            return spark.read.parquet(d)
        df = build()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(d)
        # explicit schema: an empty stage writes no data files and
        # schema inference would fail on read-back
        out = spark.read.schema(df.schema).parquet(d)
        # per-partition lineage (north_rule): row counts per committed
        # file/partition, from the parquet footers (no re-scan job)
        per_file = self._per_file_rows(d, d)
        rows = sum(per_file.values())
        self.commit(stage, out, rows, len(per_file), per_file)
        return out
