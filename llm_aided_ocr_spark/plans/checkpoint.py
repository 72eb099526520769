"""Per-stage checkpointing with per-partition lineage + counters, and
anti-join resume (north rule: "each stage checkpointed ... so runs resume
mid-pipeline at 10^12-document scale").

Backend is parquet-table-per-stage under a warehouse directory. On a real
cluster this maps 1:1 onto Iceberg tables (``df.writeTo(...).append()`` with
snapshot metadata); the sandbox has no Iceberg runtime jar, so the store
keeps Iceberg's operational contract — atomic per-stage commits (the
``_SUCCESS`` marker), append-only increments, lineage/counter records per
commit — on plain parquet. The reference's analogue is its two output files
(llm_aided_ocr.py:656-657) plus the v1 SQLite embedding cache
(CHANGELOG.md:172) that this subsumes.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
from dataclasses import dataclass
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class CheckpointStore:
    warehouse_dir: str
    run_id: str = "run0"

    def stage_path(self, stage: str) -> str:
        return os.path.join(self.warehouse_dir, "stages", stage)

    def _lineage_dir(self) -> str:
        return os.path.join(self.warehouse_dir, "_lineage")

    def _committed_increments(self, stage: str) -> List[str]:
        """Increment directories with a ``_SUCCESS`` marker — the committed
        set; a crashed half-written increment is invisible to readers."""
        return sorted(
            os.path.dirname(p)
            for p in glob.glob(os.path.join(self.stage_path(stage), "inc_*", "_SUCCESS"))
        )

    def exists(self, stage: str) -> bool:
        return bool(self._committed_increments(stage))

    # -- commit -----------------------------------------------------------

    def write(
        self,
        df: DataFrame,
        stage: str,
        mode: str = "append",
        counted_col: Optional[str] = None,
        return_committed: bool = True,
    ) -> DataFrame:
        """Commit a stage increment and record lineage counters.

        Every commit lands in its own ``inc_<run>_<ts>`` subdirectory, so
        lineage counters are computed over THIS increment only (rows and
        ``counted_col`` bytes per file partition) — O(increment), never
        O(history); the cumulative ``total_rows`` comes from summing the
        lineage log, not from rescanning the table.

        ``return_committed=True`` returns the re-read FULL stage table
        (history + this increment) — right for terminal stages where the
        caller wants the cumulative result. With ``False`` the re-read
        INCREMENT is returned, so downstream stages read the just-written
        parquet instead of recomputing the increment's upstream plan, and
        history is never reprocessed on resume.
        """
        spark = df.sparkSession
        if mode == "overwrite" and os.path.exists(self.stage_path(stage)):
            shutil.rmtree(self.stage_path(stage))
        inc_path = os.path.join(
            self.stage_path(stage), f"inc_{self.run_id}_{time.time_ns()}"
        )
        df.write.mode("errorifexists").parquet(inc_path)
        increment = spark.read.parquet(inc_path)

        agg_cols = [F.count(F.lit(1)).alias("rows")]
        if counted_col is not None:
            agg_cols.append(
                F.sum(F.length(F.col(counted_col))).cast("long").alias("payload_chars")
            )
        counters = (
            increment.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(*agg_cols)
            .collect()
        )
        inc_rows = int(sum(r["rows"] for r in counters))
        prev_rows = 0
        for r in self.lineage_records():
            if r["stage"] != stage:
                continue
            if r.get("mode") == "overwrite":  # history was cleared then
                prev_rows = 0
            prev_rows += r.get("increment_rows", r.get("total_rows", 0))
        if mode == "overwrite":  # this commit replaced all history
            prev_rows = 0
        record = {
            "run_id": self.run_id,
            "stage": stage,
            "ts": time.time(),
            "mode": mode,
            "commit": os.path.basename(inc_path),
            "increment_rows": inc_rows,
            "total_rows": prev_rows + inc_rows,
            "partitions": [r.asDict() for r in counters],
        }
        os.makedirs(self._lineage_dir(), exist_ok=True)
        log_path = os.path.join(self._lineage_dir(), "lineage.jsonl")
        with open(log_path, "a", encoding="utf-8") as f:
            f.write(json.dumps(record) + "\n")
        return self.read(spark, stage) if return_committed else increment

    # -- read / resume ----------------------------------------------------

    def read(
        self,
        spark: SparkSession,
        stage: str,
        as_of_commit: Optional[str] = None,
    ) -> DataFrame:
        """Read the committed stage table. ``as_of_commit`` (a ``commit``
        value from the lineage log, i.e. an ``inc_<run>_<ns>`` name) gives
        snapshot/time-travel semantics: only increments committed up to
        and including that commit's nanosecond timestamp are read — the
        parquet-backed analogue of Iceberg's ``VERSION AS OF``. The
        comparison uses the trailing timestamp, not the raw name (run ids
        would break lexicographic order across runs)."""

        def _ns(name: str) -> int:
            return int(name.rsplit("_", 1)[1])

        incs = self._committed_increments(stage)
        if as_of_commit is not None:
            cutoff = _ns(as_of_commit)
            incs = [p for p in incs if _ns(os.path.basename(p)) <= cutoff]
        if not incs:
            raise FileNotFoundError(f"stage '{stage}' has no committed increments")
        return spark.read.parquet(*incs)

    def remaining(
        self, input_df: DataFrame, stage: str, key: str = "url"
    ) -> DataFrame:
        """Rows of ``input_df`` not yet present in ``stage`` — the resume
        anti-join. Broadcast-eligible when the checkpoint key set is small;
        at scale AQE picks the join strategy from runtime stats."""
        if not self.exists(stage):
            return input_df
        done_keys = self.read(input_df.sparkSession, stage).select(key).distinct()
        return input_df.join(done_keys, on=key, how="left_anti")

    def lineage_records(self) -> List[dict]:
        log_path = os.path.join(self._lineage_dir(), "lineage.jsonl")
        if not os.path.exists(log_path):
            return []
        with open(log_path, encoding="utf-8") as f:
            return [json.loads(line) for line in f if line.strip()]
