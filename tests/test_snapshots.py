"""Crawl-snapshot diff — status labeling, narrow-shuffle plan, rollup."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest


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


def test_capture_novelty_shingle_algebra(spark):
    from llm_aided_ocr_spark.operators.snapshots import capture_novelty

    rows = [
        # u1: capture 2 appends one sentence -> some new shingles;
        # capture 3 identical to capture 2 -> novelty 0
        ("u1", 1, "alpha beta gamma delta epsilon zeta"),
        ("u1", 2, "alpha beta gamma delta epsilon zeta eta theta iota"),
        ("u1", 3, "alpha beta gamma delta epsilon zeta eta theta iota"),
        # u2: complete rewrite -> novelty 1.0
        ("u2", 1, "one two three four five"),
        ("u2", 2, "six seven eight nine ten"),
        # u3: second capture empty -> 0 shingles, novelty NULL
        ("u3", 1, "some words here padding more"),
        ("u3", 2, ""),
    ]
    df = spark.createDataFrame(rows, "url string, ts int, text string")
    got = {
        (r["url"], r["ts"]): (r["n_shingles"], r["n_new"], r["novelty"])
        for r in capture_novelty(df, n=3).collect()
    }
    # first captures never emit
    assert not any(ts == 1 for _, ts in got)
    # u1 cap2: 9 words -> 7 shingles, 4 existed before (6 words -> 4)
    assert got[("u1", 2)] == (7, 3, pytest.approx(3 / 7))
    assert got[("u1", 3)] == (7, 0, 0.0)
    assert got[("u2", 2)] == (3, 3, 1.0)
    assert got[("u3", 2)] == (0, 0, None)
