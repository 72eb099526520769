"""Opt-in REAL Iceberg execution test (mirrors the real-renderer pattern).

This sandbox has no iceberg-spark-runtime jar, so the `use_iceberg=True`
DataFrameWriterV2 path ships dispatch-tested against a recording stub
(tests/test_checkpoint_resume.py::test_iceberg_mode_dispatch). A cluster
adopter's first question is "does the toggle actually commit snapshots?"
— this test answers it: when org.apache.iceberg.spark.SparkCatalog IS on
the classpath, it configures a local hadoop-backed Iceberg catalog at
runtime (catalog confs are lazily instantiated, so no session restart),
commits two increments through CheckpointStore(use_iceberg=True), and
asserts the table holds the union plus per-increment lineage counters.

Skips cleanly here; on a cluster with the runtime jar
(`--packages org.apache.iceberg:iceberg-spark-runtime-...`) it is the
production validation path for plans/checkpoint.py's Iceberg branch.
"""

from __future__ import annotations

import tempfile

import pytest


def _iceberg_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def test_iceberg_store_commits_real_snapshots(spark):
    if not _iceberg_available(spark):
        pytest.skip("iceberg-spark-runtime jar not on classpath")

    from llm_aided_ocr_spark.plans.checkpoint import CheckpointStore

    with tempfile.TemporaryDirectory() as tmp:
        spark.conf.set(
            "spark.sql.catalog.ocr_it", "org.apache.iceberg.spark.SparkCatalog"
        )
        spark.conf.set("spark.sql.catalog.ocr_it.type", "hadoop")
        spark.conf.set("spark.sql.catalog.ocr_it.warehouse", f"{tmp}/iceberg")
        spark.sql("CREATE NAMESPACE IF NOT EXISTS ocr_it.ocr_ckpt")

        store = CheckpointStore(
            f"{tmp}/ckpt",
            run_id="it",
            use_iceberg=True,
            iceberg_catalog="ocr_it",
        )
        df = spark.createDataFrame(
            [(f"u{i}", f"text {i}") for i in range(6)], "url string, text string"
        )
        inc = store.write(df, "s", counted_col="text", return_committed=False)
        assert inc.count() == 6
        store.write(df.limit(2), "s", return_committed=False)

        table = store.iceberg_table("s")
        assert spark.read.table(table).count() == 8
        # one Iceberg snapshot per increment
        assert spark.sql(f"SELECT * FROM {table}.snapshots").count() == 2
        recs = store.lineage_records()
        assert [r["increment_rows"] for r in recs] == [6, 2]
        assert recs[-1]["total_rows"] == 8
