from __future__ import annotations

import tempfile

from llm_aided_ocr_spark.sources.io import read_corrected_docs, write_corrected_docs
from llm_aided_ocr_spark.sources.synthetic import pages_dataframe


def test_partitioned_sink_and_pruned_read(spark):
    with tempfile.TemporaryDirectory() as tmp:
        pages = pages_dataframe(spark, n_rows=30, include_golden=False)
        write_corrected_docs(pages, tmp)

        all_rows = read_corrected_docs(spark, tmp)
        assert all_rows.count() == 30
        days = [str(r["warc_day"]) for r in all_rows.select("warc_day").distinct().collect()]
        assert days == ["2024-01-01"]  # 30 docs * 37s apart, same day
        # (hive partition values are type-inferred to DATE on read)

        one_day = read_corrected_docs(spark, tmp, day="2024-01-01")
        plan = one_day._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        assert "warc_day" in plan.split("PartitionFilters:")[1].split("]")[0], (
            "day predicate must prune partitions, not filter rows"
        )
        assert one_day.count() == 30
        assert read_corrected_docs(spark, tmp, day="1999-01-01").count() == 0

        ranged = read_corrected_docs(spark, tmp, day_from="2024-01-01", day_to="2024-01-02")
        assert ranged.count() == 30


def test_unpartitioned_sink(spark):
    with tempfile.TemporaryDirectory() as tmp:
        pages = pages_dataframe(spark, n_rows=5, include_golden=False).drop("warc_ts")
        write_corrected_docs(pages, tmp)
        assert spark.read.parquet(tmp).count() == 5
