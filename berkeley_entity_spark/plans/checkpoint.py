"""Stage-boundary checkpointing + per-stage lineage metrics (SURVEY.md §4).

The reference caches per-document feature charts and invalidates them
explicitly (DocumentGraph.scala:232-239, 282-288); the distributed analog is
a materialized table per stage boundary with skip-if-exists resume — kill the
job after any stage and a rerun continues from the last completed stage with
byte-identical results (everything upstream is deterministic).

Locally stage tables are parquet under checkpoint_dir; on a cluster the same
writer targets Iceberg (`format("iceberg").saveAsTable(...)`) — the format
string is the only difference, so the resume contract is identical.

Each save appends a row to the `metrics` table:
(stage, rows_out, wall_ms, finished_at) — FIXTURES §3 lineage contract.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class CheckpointStore:
    root: str
    fmt: str = "parquet"

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _done_marker(self, name: str) -> str:
        return os.path.join(self.root, f"{name}._DONE")

    def exists(self, name: str) -> bool:
        return os.path.exists(self._done_marker(name))

    def load(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.format(self.fmt).load(self._path(name))

    def save(self, df: DataFrame, name: str) -> DataFrame:
        """Materialize a stage output; returns the re-read DataFrame (cuts
        lineage, later stages scan the table like any other source)."""
        t0 = time.monotonic()
        df.write.format(self.fmt).mode("overwrite").save(self._path(name))
        wall_ms = int((time.monotonic() - t0) * 1000)
        out = self.load(df.sparkSession, name)
        rows = out.count()
        self._append_metric(name, rows, wall_ms)
        with open(self._done_marker(name), "w") as f:
            f.write(json.dumps({"rows": rows, "wall_ms": wall_ms}))
        return out

    def materialize(self, df: DataFrame, name: str, resume: bool = True) -> DataFrame:
        """skip-if-exists: the resume primitive for every stage boundary."""
        if resume and self.exists(name):
            return self.load(df.sparkSession, name)
        return self.save(df, name)

    def _append_metric(self, stage: str, rows: int, wall_ms: int) -> None:
        os.makedirs(self.root, exist_ok=True)
        line = json.dumps(
            {
                "stage": stage,
                "rows_out": rows,
                "wall_ms": wall_ms,
                "finished_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            }
        )
        with open(os.path.join(self.root, "metrics.jsonl"), "a") as f:
            f.write(line + "\n")

    def metrics(self, spark: SparkSession) -> DataFrame:
        return spark.read.json(os.path.join(self.root, "metrics.jsonl"))

    def clear(self) -> None:
        import shutil

        shutil.rmtree(self.root, ignore_errors=True)
