"""Checkpoint, lineage, and resume tests (SURVEY.md §5.2.6)."""

from __future__ import annotations

import tempfile

from llm_aided_ocr_spark.config import PipelineConfig
from llm_aided_ocr_spark.plans.checkpoint import CheckpointStore
from llm_aided_ocr_spark.plans.pipeline import run_pipeline
from llm_aided_ocr_spark.sources.synthetic import pages_dataframe


def test_checkpoint_write_read_lineage(spark):
    with tempfile.TemporaryDirectory() as tmp:
        store = CheckpointStore(tmp, run_id="t1")
        df = pages_dataframe(spark, n_rows=10, include_golden=False)
        out = store.write(df.select("url", "text"), "stage_a", counted_col="text")
        assert out.count() == 10
        assert store.exists("stage_a")
        recs = store.lineage_records()
        assert len(recs) == 1
        assert recs[0]["stage"] == "stage_a"
        assert recs[0]["total_rows"] == 10
        assert sum(p["rows"] for p in recs[0]["partitions"]) == 10
        assert all("payload_chars" in p for p in recs[0]["partitions"])


def test_resume_skips_completed_documents(spark):
    with tempfile.TemporaryDirectory() as tmp:
        store = CheckpointStore(tmp, run_id="t2")
        cfg = PipelineConfig(provider="heuristic", checkpointing=True)
        full = pages_dataframe(spark, n_rows=20, include_golden=False).cache()
        first_half = full.limit(10)

        r1 = run_pipeline(first_half, cfg, store=store, strategy="fused")
        n1 = r1.count()
        assert n1 == 10

        # Re-run over the FULL input: only the 10 new docs process.
        r2 = run_pipeline(full, cfg, store=store, strategy="fused")
        assert r2.count() == 20  # checkpoint now holds everything
        recs = [r for r in store.lineage_records() if r["stage"] == "corrected_docs"]
        assert len(recs) == 2
        # Second increment appended only the remaining 10 rows on top of 10.
        assert recs[0]["total_rows"] == 10
        assert recs[1]["total_rows"] == 20
        # Lineage counters are per-increment (O(increment), not O(history)):
        assert recs[0]["increment_rows"] == 10
        assert recs[1]["increment_rows"] == 10
        assert sum(p["rows"] for p in recs[1]["partitions"]) == 10

        # Third run: nothing left to do; checkpoint unchanged.
        r3 = run_pipeline(full, cfg, store=store, strategy="fused")
        assert r3.count() == 20
        urls = [r["url"] for r in r3.collect()]
        assert len(urls) == len(set(urls)), "no duplicate processing on resume"


def test_staged_checkpoints_and_resume(spark):
    """Staged strategy writes chunk-level checkpoints; resume still works."""
    with tempfile.TemporaryDirectory() as tmp:
        store = CheckpointStore(tmp, run_id="ts")
        cfg = PipelineConfig(provider="heuristic", checkpointing=True)
        full = pages_dataframe(spark, n_rows=12, include_golden=True).cache()

        r1 = run_pipeline(full.limit(6), cfg, store=store, strategy="staged")
        assert r1.count() == 6
        stages = {r["stage"] for r in store.lineage_records()}
        assert {"chunks", "corrected_chunks", "corrected_docs"} <= stages

        r2 = run_pipeline(full, cfg, store=store, strategy="staged")
        got = {r["url"]: r["corrected_text"] for r in r2.collect()}
        single = run_pipeline(
            full, PipelineConfig(provider="heuristic"), strategy="staged"
        )
        want = {r["url"]: r["corrected_text"] for r in single.collect()}
        assert got == want


def test_mid_pipeline_checkpoint_reads_back_parquet(spark):
    """With return_committed=False the returned plan must READ the
    just-written increment, not recompute its upstream — otherwise every
    checkpointed mid-pipeline stage executes twice."""
    import io
    from contextlib import redirect_stdout

    with tempfile.TemporaryDirectory() as tmp:
        store = CheckpointStore(tmp, run_id="t4")
        df = pages_dataframe(spark, n_rows=8, include_golden=False)
        out = store.write(
            df.select("url", "text"), "mid", counted_col="text",
            return_committed=False,
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            out.explain()
        plan = buf.getvalue()
        assert "Scan parquet" in plan or "FileScan parquet" in plan, plan
        assert "Range" not in plan, "upstream plan leaked into the checkpoint read"
        assert out.count() == 8

        # overwrite resets cumulative lineage totals
        store.write(df.select("url", "text").limit(3), "mid", mode="overwrite")
        recs = [r for r in store.lineage_records() if r["stage"] == "mid"]
        assert recs[-1]["total_rows"] == 3
        assert store.read(spark, "mid").count() == 3


def test_uncommitted_increment_invisible(spark):
    """Atomic-commit contract: an increment directory without _SUCCESS (a
    crashed writer) must be invisible to readers, resume, and exists()."""
    import os
    import shutil

    with tempfile.TemporaryDirectory() as tmp:
        store = CheckpointStore(tmp, run_id="t6")
        df = pages_dataframe(spark, n_rows=5, include_golden=False)
        store.write(df.select("url"), "at")
        assert store.read(spark, "at").count() == 5

        # simulate a crashed writer: copy a committed increment, drop its
        # _SUCCESS marker
        committed = store._committed_increments("at")[0]
        crashed = os.path.join(store.stage_path("at"), "inc_t6_9999999999999999999")
        shutil.copytree(committed, crashed)
        os.remove(os.path.join(crashed, "_SUCCESS"))

        assert store.read(spark, "at").count() == 5  # ghost rows invisible
        assert len(store._committed_increments("at")) == 1
        # resume sees only committed urls
        remaining = store.remaining(df.select("url"), "at")
        assert remaining.count() == 0


def test_time_travel_read(spark):
    """as_of_commit reads the table as it was after that commit — the
    Iceberg VERSION AS OF analogue on the parquet-backed store."""
    with tempfile.TemporaryDirectory() as tmp:
        store = CheckpointStore(tmp, run_id="t5")
        df = pages_dataframe(spark, n_rows=9, include_golden=False)
        store.write(df.limit(4).select("url"), "tt")
        store.write(df.subtract(df.limit(4)).select("url"), "tt")
        recs = [r for r in store.lineage_records() if r["stage"] == "tt"]
        assert len(recs) == 2
        assert store.read(spark, "tt").count() == 9
        assert store.read(spark, "tt", as_of_commit=recs[0]["commit"]).count() == 4
        assert store.read(spark, "tt", as_of_commit=recs[1]["commit"]).count() == 9


def test_resume_byte_identity_vs_single_run(spark):
    with tempfile.TemporaryDirectory() as tmp:
        store = CheckpointStore(tmp, run_id="t3")
        cfg = PipelineConfig(provider="heuristic", checkpointing=True)
        full = pages_dataframe(spark, n_rows=16, include_golden=True).cache()

        run_pipeline(full.limit(7), cfg, store=store, strategy="fused").count()
        resumed = run_pipeline(full, cfg, store=store, strategy="fused")
        got = {r["url"]: r["corrected_text"] for r in resumed.collect()}

        single = run_pipeline(full, PipelineConfig(provider="heuristic"), strategy="fused")
        want = {r["url"]: r["corrected_text"] for r in single.collect()}
        assert got == want
