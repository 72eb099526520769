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

import json
import os
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

    def exists(self, stage: str) -> bool:
        return os.path.exists(os.path.join(self.stage_path(stage), "_SUCCESS"))

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

        Counters are computed per physical partition (``spark_partition_id``)
        over the committed table — rows per partition, bytes of
        ``counted_col`` — and appended to the lineage log.

        ``return_committed=True`` returns the re-read FULL stage table
        (history + this increment) — right for terminal stages where the
        caller wants the cumulative result. Pass ``False`` for
        mid-pipeline stages on the resume path: downstream must continue
        from THIS increment only, or history would be reprocessed and
        appended again (duplicating rows in later checkpoints).
        """
        df.write.mode(mode).parquet(self.stage_path(stage))
        spark = df.sparkSession
        committed = spark.read.parquet(self.stage_path(stage))

        agg_cols = [F.count(F.lit(1)).alias("rows")]
        if counted_col is not None:
            agg_cols.append(
                F.sum(F.length(F.col(counted_col))).cast("long").alias("payload_chars")
            )
        counters = (
            committed.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(*agg_cols)
            .collect()
        )
        record = {
            "run_id": self.run_id,
            "stage": stage,
            "ts": time.time(),
            "mode": mode,
            "total_rows": int(sum(r["rows"] for r in counters)),
            "partitions": [r.asDict() for r in counters],
        }
        os.makedirs(self._lineage_dir(), exist_ok=True)
        log_path = os.path.join(self._lineage_dir(), "lineage.jsonl")
        with open(log_path, "a", encoding="utf-8") as f:
            f.write(json.dumps(record) + "\n")
        return committed if return_committed else df

    # -- read / resume ----------------------------------------------------

    def read(self, spark: SparkSession, stage: str) -> DataFrame:
        return spark.read.parquet(self.stage_path(stage))

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
