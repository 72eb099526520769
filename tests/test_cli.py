"""End-to-end CLI test: python -m llm_aided_ocr_spark over a small pages
table in a subprocess (the CLI owns and stops its own SparkSession)."""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile


def test_cli_end_to_end(spark):
    from llm_aided_ocr_spark.sources.synthetic import pages_dataframe

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory() as tmp:
        inp = os.path.join(tmp, "pages.parquet")
        out = os.path.join(tmp, "out")
        pages_dataframe(spark, n_rows=6, include_golden=True).write.parquet(inp)

        proc = subprocess.run(
            [
                sys.executable, "-m", "llm_aided_ocr_spark",
                "--input", inp, "--output", out,
                "--provider", "heuristic", "--assess-quality",
                "--master", "local[2]",
            ],
            capture_output=True, text=True, timeout=300,
            cwd=repo, env=dict(os.environ, PYTHONPATH=repo),
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "wrote 6 corrected documents" in proc.stdout
        assert "quality: n=6" in proc.stdout

        corrected = spark.read.parquet(os.path.join(out, "corrected_docs"))
        raw = spark.read.parquet(os.path.join(out, "raw_pages"))
        scores = spark.read.parquet(os.path.join(out, "quality_scores"))
        assert corrected.count() == 6
        assert scores.count() == 6
        # two-sink contract: raw_pages carries the pre-correction text
        src = {r["url"]: r["text"] for r in spark.read.parquet(inp).collect()}
        got = {r["url"]: r["raw_text"] for r in raw.collect()}
        assert got == src


def test_cli_curate_mode(spark):
    from llm_aided_ocr_spark.sources.synthetic import pages_dataframe
    from pyspark.sql import functions as F

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory() as tmp:
        inp = os.path.join(tmp, "pages.parquet")
        out = os.path.join(tmp, "out")
        base = pages_dataframe(spark, n_rows=8, include_golden=False)
        dups = base.limit(3).withColumn("url", F.concat(F.lit("dup-"), "url"))
        base.unionByName(dups).write.parquet(inp)

        proc = subprocess.run(
            [
                sys.executable, "-m", "llm_aided_ocr_spark",
                "--input", inp, "--output", out,
                "--provider", "heuristic", "--curate", "--no-near-dedup",
                "--master", "local[2]",
            ],
            capture_output=True, text=True, timeout=300,
            cwd=repo, env=dict(os.environ, PYTHONPATH=repo),
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "curated documents" in proc.stdout
        assert "split=" in proc.stdout

        curated = spark.read.parquet(os.path.join(out, "curated_docs"))
        rows = curated.collect()
        # the 3 exact dups collapsed; url unique; split assigned
        urls = [r["url"] for r in rows]
        assert len(urls) == len(set(urls))
        texts = [r["corrected_text"] for r in rows]
        assert len(texts) == len(set(texts)), "exact dups must be gone"
        assert {"split", "quality_score"} <= set(curated.columns)
