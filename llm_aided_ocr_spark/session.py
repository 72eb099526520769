"""SparkSession factory with scale-aware defaults.

Local testing runs ``local[N]``; the same config block is what we'd ship via
``spark-submit --py-files`` to a real cluster — only master/memory differ.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "llm_aided_ocr_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_max_records_per_batch: int = 512,
) -> SparkSession:
    # Make the package importable inside executor Python workers no matter
    # where the driver was launched from — the local-mode analogue of
    # ``spark-submit --py-files`` (workers inherit the JVM's environment,
    # which inherits ours; must be set before the JVM starts).
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if repo_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            repo_root + (os.pathsep + existing if existing else "")
        )

    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    if shuffle_partitions is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        shuffle_partitions = max(cpus, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime partition coalescing + skew-join splitting — the
        # north rule's skew story leans on this plus explicit salting.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Deterministic timestamp semantics regardless of host timezone
        # (date_trunc/date_format and oracle comparisons pin to UTC).
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow exchange for every pandas UDF stage; small batches so a
        # batch of mega-documents cannot blow executor memory.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(arrow_max_records_per_batch),
        )
        # Self-describing parquet; 128 MiB split target for the scan.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.compression.codec", "zstd")
        # Allow shuffled-hash join where its size conditions hold instead
        # of always sort-merge (optimization guide §3.1/§9): skips the
        # per-partition sorts; AQE skew-join splitting still applies.
        # SPARK_GRAFT_PREFER_SMJ=true restores the Spark default.
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    # Shuffle/spill scratch space (spark.local.dir). Production guidance
    # (Spark docs "Local storage") is fast local disks — NVMe/SSD per
    # node. This sandbox's root filesystem has high file-creation/sync
    # latency that dominates small shuffle blocks (measured: a tiny
    # 32-map-task exchange costs ~0.7 s on /tmp vs ~0.35 s on tmpfs), so
    # default to the RAM-backed /dev/shm when present — the local-mode
    # stand-in for the fast local disks a real executor would own.
    # SPARK_GRAFT_LOCAL_DIR overrides; set it to a disk path for runs
    # whose shuffle/spill volume could exceed available RAM-disk space.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm") and os.access(
        "/dev/shm", os.W_OK
    ):
        local_dir = "/dev/shm/ocr_spark_local"
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    return builder.getOrCreate()
