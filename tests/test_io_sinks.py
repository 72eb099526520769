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


def test_two_sink_contract_raw_plus_corrected(spark):
    """The reference writes TWO files per document: the raw OCR output
    (the '\\n'-joined page texts, llm_aided_ocr.py:656,665-667) and the
    corrected text. Mirror: raw_pages table + corrected_docs table, with
    the raw table byte-equal to join_pages_raw over the source pages."""
    import os

    from llm_aided_ocr_spark.config import PipelineConfig
    from llm_aided_ocr_spark.kernels import join_pages_raw
    from llm_aided_ocr_spark.plans.pipeline import run_pipeline
    from llm_aided_ocr_spark.sources.io import write_raw_pages

    with tempfile.TemporaryDirectory() as tmp:
        pages = pages_dataframe(spark, n_rows=8, include_golden=True).cache()
        cfg = PipelineConfig(provider="identity", apply_hallucination_filter=False)
        result = run_pipeline(pages, cfg, strategy="fused")
        # carry the timestamp through for day partitioning of both sinks
        result = result.join(pages.select("url", "warc_ts"), "url")

        raw_path, corr_path = os.path.join(tmp, "raw"), os.path.join(tmp, "corr")
        write_raw_pages(result, raw_path)
        write_corrected_docs(result.drop("raw_text"), corr_path)

        raw_back = {
            r["url"]: r["raw_text"] for r in spark.read.parquet(raw_path).collect()
        }
        src = {r["url"]: r["text"] for r in pages.collect()}
        assert set(raw_back) == set(src)
        for url, text in src.items():
            # fused pipeline treats the text column as the page source;
            # raw_text is byte-equal to the single-page "\n" join
            assert raw_back[url] == join_pages_raw([text]) == text
        corr_back = spark.read.parquet(corr_path)
        assert corr_back.count() == 8
        assert "corrected_text" in corr_back.columns
        assert "warc_day" in corr_back.columns and "warc_day" in spark.read.parquet(raw_path).columns


def test_bucketed_join_has_no_shuffle(spark):
    """Two tables bucketed on url with the same bucket count must join
    with ZERO Exchange operators — the co-located join contract."""
    import io
    from contextlib import redirect_stdout

    from llm_aided_ocr_spark.sources.io import write_bucketed_table

    pages = pages_dataframe(spark, n_rows=20, include_golden=False)
    # at test scale Spark would broadcast the tiny side (its own
    # BroadcastExchange); disable it so the plan shows what a 100 TB
    # fact-fact join would do — the bucketed sort-merge with no shuffle
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed_table(
            pages.select("url", "text"), "bt_raw", n_buckets=4, sort_col="url"
        )
        write_bucketed_table(
            pages.select("url", "lang"), "bt_meta", n_buckets=4, sort_col="url"
        )
        a = spark.table("bt_raw")
        b = spark.table("bt_meta")
        joined = a.join(b, "url")
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain()
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert joined.count() == 20
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bt_raw")
        spark.sql("DROP TABLE IF EXISTS bt_meta")


def test_unpartitioned_sink(spark):
    with tempfile.TemporaryDirectory() as tmp:
        pages = pages_dataframe(spark, n_rows=5, include_golden=False).drop("warc_ts")
        write_corrected_docs(pages, tmp)
        assert spark.read.parquet(tmp).count() == 5
