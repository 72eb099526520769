"""Crawl-snapshot diff — status labeling, narrow-shuffle plan, rollup."""

from __future__ import annotations

import io
from contextlib import redirect_stdout


def test_snapshot_diff_statuses(spark):
    from llm_aided_ocr_spark.operators.snapshots import (
        snapshot_diff,
        snapshot_diff_stats,
    )

    old = spark.createDataFrame(
        [("a", "same"), ("b", "before"), ("c", "gone"), ("e", None)],
        "url string, text string",
    )
    new = spark.createDataFrame(
        [("a", "same"), ("b", "after"), ("d", "fresh"), ("e", "")],
        "url string, text string",
    )
    rows = {r["id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    # null and '' fingerprint identically (coalesce) — e is unchanged
    assert rows == {
        "a": "unchanged", "b": "changed", "c": "removed",
        "d": "added", "e": "unchanged",
    }
    stats = {
        r["status"]: r["n"]
        for r in snapshot_diff_stats(snapshot_diff(old, new)).collect()
    }
    assert stats == {"unchanged": 2, "changed": 1, "removed": 1, "added": 1}


def test_snapshot_diff_never_shuffles_text(spark):
    """Both sides project to (id, fingerprint) BEFORE the join: the text
    column must not appear above the scans in the plan."""
    from llm_aided_ocr_spark.operators.snapshots import snapshot_diff

    old = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    new = old.limit(400)
    buf = io.StringIO()
    with redirect_stdout(buf):
        snapshot_diff(old, new, id_col="doc_id").explain("formatted")
    plan = buf.getvalue()
    joins = [ln for ln in plan.splitlines() if "Join" in ln]
    assert joins, plan
    ex = [ln for ln in plan.splitlines() if ln.strip().startswith("Output")
          and "fp" in ln]
    # every exchange-side output is (id, fp) — no text column leaves a scan
    assert "text" not in plan.split("Exchange")[1][:400]
