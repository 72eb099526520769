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
import hashlib
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
    """``bucketed_keys=True`` additionally maintains, per stage, a catalog
    table of committed keys bucketed on ``key_col`` (``n_buckets``). The
    resume anti-join then reads that table instead of the full stage
    parquet: when the input is itself bucketed on the same key/count, the
    anti-join runs with ZERO Exchange on either side — the 100 TB resume
    primitive (every crawl re-run starts with this join)."""

    warehouse_dir: str
    run_id: str = "run0"
    bucketed_keys: bool = False
    key_col: str = "url"
    n_buckets: int = 64
    # Iceberg toggle: with a configured Iceberg catalog on the cluster
    # (spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog),
    # set use_iceberg=True and stage tables commit via the DataFrameWriterV2
    # (`df.writeTo(catalog.namespace.stage).append()`) instead of the
    # parquet-increment layout — no code rewrite for adopters. The lineage
    # log, counters, and resume API are identical in both modes. This
    # sandbox has no Iceberg runtime jar, so the path is dispatch-tested
    # with a recording stub (tests/test_checkpoint_resume.py).
    use_iceberg: bool = False
    iceberg_catalog: str = "spark_catalog"
    iceberg_namespace: str = "ocr_ckpt"

    def stage_path(self, stage: str) -> str:
        return os.path.join(self.warehouse_dir, "stages", stage)

    def iceberg_table(self, stage: str) -> str:
        return f"{self.iceberg_catalog}.{self.iceberg_namespace}.{stage}"

    def keys_table(self, stage: str) -> str:
        """Catalog table name for the stage's bucketed key set — scoped by
        a digest of (warehouse path, RAW stage name) so two stores never
        collide in a shared metastore AND two stages whose names mangle to
        the same identifier (``stage.a`` vs ``stage_a``) never share a key
        set (a merged key set would make resume silently skip rows that
        only the OTHER stage processed)."""
        digest = hashlib.md5(
            f"{self.warehouse_dir}\x00{stage}".encode()
        ).hexdigest()[:10]
        safe = "".join(c if c.isalnum() else "_" for c in stage)
        return f"ckpt_keys_{safe}_{digest}"

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
        if mode == "overwrite":
            if os.path.exists(self.stage_path(stage)):
                shutil.rmtree(self.stage_path(stage))
            if self.bucketed_keys:
                spark.sql(f"DROP TABLE IF EXISTS {self.keys_table(stage)}")
        if self.use_iceberg:
            # DataFrameWriterV2 commit: one Iceberg snapshot per increment.
            # The increment is persisted so the commit and the counter pass
            # share one computation of the upstream plan.
            table = self.iceberg_table(stage)
            increment = df.persist()
            commit_name = f"iceberg_{self.run_id}_{time.time_ns()}"
            writer = increment.writeTo(table)
            if mode == "overwrite" or not spark.catalog.tableExists(table):
                writer.createOrReplace()
            else:
                writer.append()
            inc_path = None
        else:
            inc_path = os.path.join(
                self.stage_path(stage), f"inc_{self.run_id}_{time.time_ns()}"
            )
            df.write.mode("errorifexists").parquet(inc_path)
            increment = spark.read.parquet(inc_path)
            commit_name = os.path.basename(inc_path)

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
            "commit": commit_name,
            "increment_rows": inc_rows,
            "total_rows": prev_rows + inc_rows,
            "partitions": [r.asDict() for r in counters],
        }
        os.makedirs(self._lineage_dir(), exist_ok=True)
        log_path = os.path.join(self._lineage_dir(), "lineage.jsonl")
        with open(log_path, "a", encoding="utf-8") as f:
            f.write(json.dumps(record) + "\n")
        if self.bucketed_keys:
            if self.use_iceberg:
                # no _SUCCESS markers to heal from in iceberg mode —
                # append this increment's keys directly (the increment is
                # still persisted). Crash window between the Iceberg
                # commit and this append = possible reprocessing on
                # resume, not data loss; a production deployment should
                # maintain the keys table in the SAME Iceberg transaction
                # (or use storage-partitioned joins on the stage table).
                if self.key_col in increment.columns:
                    (
                        increment.select(self.key_col)
                        .write.mode("append")
                        .bucketBy(self.n_buckets, self.key_col)
                        .sortBy(self.key_col)
                        .format("parquet")
                        .saveAsTable(self.keys_table(stage))
                    )
            else:
                # keys lag the parquet commit by design (the increment's
                # _SUCCESS is the source of truth); _sync_keys is the
                # self-healing reconciliation that replays any committed
                # increment whose keys never landed (crash window), so it
                # is the ONLY writer of the keys table — called here and
                # again defensively in remaining()
                self._sync_keys(spark, stage)
        if self.use_iceberg:
            if return_committed:
                increment.unpersist()
            else:
                # the caller keeps using the persisted increment — hand it
                # the release handle instead of leaking until GC
                from llm_aided_ocr_spark.operators.util import pin

                pin(increment, increment)
        return self.read(spark, stage) if return_committed else increment

    def _keys_marker(self, stage: str) -> str:
        # digest-suffixed for the same mangling-collision reason as
        # keys_table (stage.a vs stage_a must not share sync state)
        digest = hashlib.md5(stage.encode()).hexdigest()[:10]
        safe = "".join(c if c.isalnum() else "_" for c in stage)
        return os.path.join(
            self.warehouse_dir, "_keys_synced", f"{safe}_{digest}.txt"
        )

    def _sync_keys(self, spark: SparkSession, stage: str) -> int:
        """Bring the bucketed keys table up to date with the COMMITTED
        increments — O(unsynced increments), idempotent, crash-safe:

        * keys append AFTER the increment's ``_SUCCESS``: a crash between
          them leaves a committed increment unsynced; the next write OR
          the next ``remaining()`` replays it here (missing keys would
          otherwise make resume reprocess committed rows).
        * marker append AFTER the keys append: a crash between THEM
          re-appends that increment's keys once more — duplicate key rows,
          which the left-anti join is insensitive to. Never data loss in
          either window.
        """
        marker = self._keys_marker(stage)
        synced: set = set()
        if os.path.exists(marker):
            with open(marker, encoding="utf-8") as f:
                synced = {line.strip() for line in f if line.strip()}
        done = 0
        for inc_path in self._committed_increments(stage):
            name = os.path.basename(inc_path)
            if name in synced:
                continue
            inc = spark.read.parquet(inc_path)
            if self.key_col in inc.columns:
                (
                    inc.select(self.key_col)
                    .write.mode("append")
                    .bucketBy(self.n_buckets, self.key_col)
                    .sortBy(self.key_col)
                    .format("parquet")
                    .saveAsTable(self.keys_table(stage))
                )
            os.makedirs(os.path.dirname(marker), exist_ok=True)
            with open(marker, "a", encoding="utf-8") as f:
                f.write(name + "\n")
            done += 1
        return done

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

        if self.use_iceberg:
            if as_of_commit is not None:
                raise NotImplementedError(
                    "on Iceberg, time travel is native — query "
                    f"'SELECT * FROM {self.iceberg_table(stage)} VERSION AS OF "
                    "<snapshot>' (or TIMESTAMP AS OF) instead of as_of_commit"
                )
            return spark.table(self.iceberg_table(stage))

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
        at scale AQE picks the join strategy from runtime stats.

        With ``bucketed_keys``, the done-key side reads the bucketed
        catalog table: its scan already satisfies the join's distribution
        (no Exchange, no ``distinct`` needed — left_anti is
        duplicate-insensitive on the right), and a same-bucketed input
        joins with no Exchange on either side (plan-tested)."""
        spark = input_df.sparkSession
        if self.bucketed_keys and (
            self.use_iceberg or self.exists(stage)
        ):
            if not self.use_iceberg:
                # heal any committed-but-unsynced increments BEFORE
                # trusting the keys table (crash between increment commit
                # and keys append — see _sync_keys); iceberg mode has no
                # _SUCCESS markers to heal from (see write())
                self._sync_keys(spark, stage)
            if spark.catalog.tableExists(self.keys_table(stage)):
                done_keys = spark.table(self.keys_table(stage))
                if key != self.key_col:
                    done_keys = done_keys.withColumnRenamed(self.key_col, key)
                return input_df.join(done_keys, on=key, how="left_anti")
            # increments carry no key_col → fall through to the stage read
        if self.use_iceberg:
            if not spark.catalog.tableExists(self.iceberg_table(stage)):
                return input_df
            done_keys = spark.table(self.iceberg_table(stage)).select(key).distinct()
            return input_df.join(done_keys, on=key, how="left_anti")
        if not self.exists(stage):
            return input_df
        done_keys = self.read(spark, stage).select(key).distinct()
        return input_df.join(done_keys, on=key, how="left_anti")

    def lineage_records(self) -> List[dict]:
        log_path = os.path.join(self._lineage_dir(), "lineage.jsonl")
        if not os.path.exists(log_path):
            return []
        with open(log_path, encoding="utf-8") as f:
            return [json.loads(line) for line in f if line.strip()]

    # -- reporting --------------------------------------------------------

    def stage_counters(self, stage: Optional[str] = None) -> dict:
        """The lineage log as a queryable per-stage summary — the north
        rule's "per-partition lineage and counters" as an API, not just a
        JSONL file. Per stage: cumulative rows, payload chars, commit
        count/list, and the partition histogram of the commits' per-file-
        partition row counts (min/max/mean + the raw counts), so skew in
        what each commit wrote is visible without rescanning any table.
        ``stage=None`` returns all stages keyed by name; overwrites reset
        the cumulative totals exactly as ``total_rows`` bookkeeping does."""
        out: dict = {}
        for rec in self.lineage_records():
            s = rec["stage"]
            if stage is not None and s != stage:
                continue
            if rec.get("mode") == "overwrite" or s not in out:
                out[s] = {
                    "total_rows": 0,
                    "total_payload_chars": 0,
                    "n_commits": 0,
                    "commits": [],
                    "partition_rows": [],
                }
            agg = out[s]
            parts = rec.get("partitions", [])
            prow = [int(p.get("rows", 0)) for p in parts]
            inc_payload = sum(int(p.get("payload_chars") or 0) for p in parts)
            agg["total_rows"] += int(rec.get("increment_rows", 0))
            agg["total_payload_chars"] += inc_payload
            agg["n_commits"] += 1
            agg["commits"].append(
                {
                    "commit": rec.get("commit"),
                    "run_id": rec.get("run_id"),
                    "increment_rows": int(rec.get("increment_rows", 0)),
                    "increment_payload_chars": inc_payload,
                    "n_partitions": len(parts),
                }
            )
            agg["partition_rows"].extend(prow)
        for agg in out.values():
            pr = agg["partition_rows"]
            agg["partition_histogram"] = {
                "n_partitions": len(pr),
                "min_rows": min(pr) if pr else 0,
                "max_rows": max(pr) if pr else 0,
                "mean_rows": round(sum(pr) / len(pr), 2) if pr else 0.0,
            }
        return out if stage is None else out.get(stage, {})

    def stage_counters_df(self, spark: SparkSession) -> DataFrame:
        """The same summary as a DataFrame (one row per stage) for SQL
        dashboards: ``store.stage_counters_df(spark).createOrReplaceTempView
        ('lineage')``."""
        rows = [
            (
                s,
                agg["total_rows"],
                agg["total_payload_chars"],
                agg["n_commits"],
                agg["partition_histogram"]["n_partitions"],
                agg["partition_histogram"]["min_rows"],
                agg["partition_histogram"]["max_rows"],
                float(agg["partition_histogram"]["mean_rows"]),
            )
            for s, agg in sorted(self.stage_counters().items())
        ]
        return spark.createDataFrame(
            rows,
            "stage string, total_rows long, total_payload_chars long, "
            "n_commits long, n_partitions long, min_partition_rows long, "
            "max_partition_rows long, mean_partition_rows double",
        )
