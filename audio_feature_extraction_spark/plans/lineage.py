"""Per-unit lineage manifest + checkpoint/resume.

≙ the reference's ProcessingState stage tags (design.md:243-253) and
checkpoint/resume requirement (NFR-4.1 requirements.md:126; TASK-025
tasks.md:789-810: "skip already-processed files on restart").

Unit of work = a deterministic hash bucket of the entity key (not the
physical partition id, which changes with parallelism). Each completed
unit writes a manifest row (rows, key range, xor-checksum, wall ms); a
restart anti-joins the input against completed units and processes only
the remainder. Output equality with an uninterrupted run is tested.

At cluster scale the manifest is an append-only table (Iceberg-style
snapshot log); `left_anti` against it is a broadcast join (manifest is
tiny relative to data).
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STAGES = ("loaded", "extracted", "transformed", "saved")  # design.md:243-253


def with_unit(df: DataFrame, key_col: str, n_units: int) -> DataFrame:
    """Deterministic work-unit id from the entity key — stable across
    runs and parallelism levels."""
    return df.withColumn(
        "unit", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_units)).cast("int")
    )


def unit_manifest(
    out: DataFrame, run_id: str, stage: str, key_col: str, wall_ms: float
) -> DataFrame:
    """One manifest row per completed unit: counts, key range, checksum."""
    return out.groupBy("unit").agg(
        F.lit(run_id).alias("run_id"),
        F.lit(stage).alias("stage"),
        F.min(key_col).alias("key_min"),
        F.max(key_col).alias("key_max"),
        F.count("*").alias("rows"),
        F.expr(f"bit_xor(xxhash64({key_col}))").alias("checksum"),
        F.lit(wall_ms).alias("wall_ms"),
    )


class CheckpointedPipeline:
    """Stage runner with resume (≙ PipelineExecutor + StateManager,
    design.md:1745-1792, made restartable)."""

    def __init__(
        self, spark: SparkSession, base_dir: str, run_id: str, n_units: int = 16
    ):
        self.spark = spark
        self.base_dir = base_dir
        self.run_id = run_id
        self.n_units = n_units

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self.base_dir, "lineage", f"stage={stage}")

    def _data_path(self, stage: str) -> str:
        return os.path.join(self.base_dir, "data", f"stage={stage}")

    def completed_units(self, stage: str) -> DataFrame:
        path = self._manifest_path(stage)
        try:
            return self.spark.read.parquet(path).select("unit").distinct()
        except Exception:  # no manifest yet (AnalysisException: path missing)
            return self.spark.createDataFrame([], "unit int")

    def run_stage(
        self,
        df: DataFrame,
        stage: str,
        key_col: str,
        process_fn: Callable[[DataFrame], DataFrame],
        fail_units: set[int] | None = None,
    ) -> None:
        """Process all not-yet-completed units through ``process_fn`` and
        append data + manifest. ``fail_units`` simulates a crash after a
        subset completed (tests)."""
        units = with_unit(df, key_col, self.n_units)
        todo = units.join(
            F.broadcast(self.completed_units(stage)), "unit", "left_anti"
        )
        if fail_units is not None:
            todo = todo.where(~F.col("unit").isin(*fail_units))
        t0 = time.perf_counter()
        out = process_fn(todo)
        if "unit" not in out.columns:
            raise ValueError("process_fn must preserve the 'unit' column")
        out.write.mode("append").parquet(self._data_path(stage))
        wall_ms = (time.perf_counter() - t0) * 1000.0
        saved = self.spark.read.parquet(self._data_path(stage))
        new_units = saved.select("unit").distinct().join(
            F.broadcast(self.completed_units(stage)), "unit", "left_anti"
        )
        manifest = unit_manifest(
            saved.join(F.broadcast(new_units), "unit"),
            self.run_id,
            stage,
            key_col,
            round(wall_ms, 3),
        )
        manifest.write.mode("append").parquet(self._manifest_path(stage))

    def stage_output(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._data_path(stage))

    def manifest(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._manifest_path(stage))


class SnapshotPipeline(CheckpointedPipeline):
    """Checkpointed pipeline on the atomic snapshot layer.

    ``CheckpointedPipeline`` appends data THEN manifest as two plain
    parquet writes — a crash between them leaves data rows whose units
    are not marked complete, and the resume reprocesses them into
    DUPLICATES. Here every stage commit is one snapshot (staged dir ->
    O_EXCL manifest -> pointer swap), and completed units derive from
    the COMMITTED SNAPSHOT MANIFEST itself (each snapshot's properties
    record the unit set its staged files contain — VERDICT r03 #2), so
    the crash window disappears AND resume is a metadata-only read: the
    anti-join target and the atomic commit point are the same JSON
    object. A run that dies mid-write leaves only an invisible staged
    dir, and the resume's output is byte-identical to an uninterrupted
    run. At 100 TB this matters twice over: no scan of the committed
    output table just to learn which units finished, and no way for the
    resume view to drift from what was actually committed.
    """

    def _table(self, stage: str) -> str:
        return os.path.join(self.base_dir, f"stage={stage}")

    def completed_units(self, stage: str) -> DataFrame:
        from audio_feature_extraction_spark.sinks import snapshots as sn

        table = self._table(stage)
        if sn.current_version(table) is None:
            return self.spark.createDataFrame([], "unit int")
        units: set[int] = set()
        for m in sn.snapshot_history(table):
            u = m.get("properties", {}).get("units")
            if u is None:
                # pre-properties manifest (legacy table): fall back to
                # deriving completeness from the committed data
                return (
                    sn.read_snapshot(self.spark, table)
                    .select("unit")
                    .distinct()
                )
            units.update(int(x) for x in u)
        return self.spark.createDataFrame(
            [(u,) for u in sorted(units)], "unit int"
        )

    def run_stage(
        self,
        df: DataFrame,
        stage: str,
        key_col: str,
        process_fn: Callable[[DataFrame], DataFrame],
        fail_units: set[int] | None = None,
    ) -> None:
        from audio_feature_extraction_spark.sinks import snapshots as sn

        units = with_unit(df, key_col, self.n_units)
        todo = units.join(
            F.broadcast(self.completed_units(stage)), "unit", "left_anti"
        )
        if fail_units is not None:
            todo = todo.where(~F.col("unit").isin(*fail_units))
        t0 = time.perf_counter()
        out = process_fn(todo)
        if "unit" not in out.columns:
            raise ValueError("process_fn must preserve the 'unit' column")
        if not out.take(1):
            return  # nothing left to do — no empty snapshot
        sn.write_snapshot(
            out,
            self._table(stage),
            mode="append",
            properties={"run_id": self.run_id, "stage": stage},
            # computed over the staged files (one column-pruned scan of
            # freshly-written, page-cache-warm parquet), so the manifest
            # records exactly the units this snapshot commits
            properties_fn=lambda staged: {
                "units": sorted(
                    r.unit for r in staged.select("unit").distinct().collect()
                )
            },
        )
        wall_ms = (time.perf_counter() - t0) * 1000.0
        # metrics manifest is informational (completeness derives from the
        # committed data, so a crash here cannot cause duplicates)
        unit_manifest(out, self.run_id, stage, key_col, round(wall_ms, 3)).write.mode(
            "append"
        ).parquet(self._manifest_path(stage))

    def stage_output(self, stage: str) -> DataFrame:
        from audio_feature_extraction_spark.sinks import snapshots as sn

        return sn.read_snapshot(self.spark, self._table(stage))


def execution_report(manifest: DataFrame) -> DataFrame:
    """≙ ExecutionReport (design.md:1787-1792): totals per stage."""
    return manifest.groupBy("run_id", "stage").agg(
        F.count("*").alias("n_units"),
        F.sum("rows").alias("total_rows"),
        F.sum("wall_ms").alias("total_wall_ms"),
        F.max("wall_ms").alias("max_unit_wall_ms"),
    )
