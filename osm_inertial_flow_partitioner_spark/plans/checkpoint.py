"""Per-round checkpoint / resume with per-partition lineage + metrics.

The reference is a single batch process with no resume; the graft spec
(north_rule) requires resumable rounds. Design: every bisection round
snapshots the assignment table to a parquet snapshot directory plus a
manifest recording (level, round, row count) — the durable boundary
between rounds. On an Iceberg-enabled cluster the same calls map to
``writeTo(...).createOrReplace()`` snapshots; parquet + manifest keeps
the sandbox dependency-free while exercising identical resume logic
(write-then-reload also truncates the Spark lineage each round, which
the driver loop needs anyway).

Resume: ``latest()`` finds the newest complete snapshot; the partitioner
can restart from (level, round) and must produce a byte-identical final
assignment (tested in tests/test_checkpoint_resume.py).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class RoundCheckpoint:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, level: int, rnd: int) -> str:
        return os.path.join(self.root, f"level={level}", f"round={rnd}")

    def snapshot_round(self, assign: DataFrame, level: int, rnd: int) -> DataFrame:
        """Write the post-round assignment; return the reloaded frame
        (lineage truncated at the durable snapshot)."""
        d = self._dir(level, rnd)
        assign.write.mode("overwrite").parquet(os.path.join(d, "assign"))
        rows = self.spark.read.parquet(os.path.join(d, "assign"))
        manifest = {
            "level": level,
            "round": rnd,
            "rows": rows.count(),
            "partitions": rows.rdd.getNumPartitions(),
            "completed_at": time.time(),
        }
        with open(os.path.join(d, "manifest.json"), "w") as f:
            json.dump(manifest, f)
        return rows

    def latest(self) -> tuple[int, int] | None:
        """Newest complete (level, round), preferring lower level (levels
        run top-down: L-1 first), then higher round."""
        best = None
        for lvl_dir in os.listdir(self.root) if os.path.isdir(self.root) else []:
            if not lvl_dir.startswith("level="):
                continue
            level = int(lvl_dir.split("=")[1])
            for rnd_dir in os.listdir(os.path.join(self.root, lvl_dir)):
                if not rnd_dir.startswith("round="):
                    continue
                rnd = int(rnd_dir.split("=")[1])
                if os.path.exists(
                    os.path.join(self.root, lvl_dir, rnd_dir, "manifest.json")
                ):
                    key = (-level, rnd)  # top level (highest) runs first
                    if best is None or key > best[0]:
                        best = (key, (level, rnd))
        return best[1] if best else None

    def load(self, level: int, rnd: int) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self._dir(level, rnd), "assign"))

    def finalize(self, result: DataFrame, num_cells: list[int], metrics: DataFrame):
        """Durable final assignment + per-bisection lineage/metrics."""
        result.write.mode("overwrite").parquet(os.path.join(self.root, "assignment"))
        metrics.write.mode("overwrite").parquet(os.path.join(self.root, "metrics"))
        with open(os.path.join(self.root, "final_manifest.json"), "w") as f:
            json.dump({"num_cells": num_cells, "completed_at": time.time()}, f)
