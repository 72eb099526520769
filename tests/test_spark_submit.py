"""The north rule's deployment form, executed for real: package the
library as a zip and run the CLI via ``spark-submit --py-files`` (local
master standing in for the cluster — the submit path, archive shipping,
and executor-side imports are what's under test)."""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
import zipfile

import pytest

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this host"
)


def test_spark_submit_py_files_end_to_end(spark):
    from llm_aided_ocr_spark.sources.synthetic import pages_dataframe

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory() as tmp:
        # package exactly as DEPLOY.md says
        zip_path = os.path.join(tmp, "llm_aided_ocr_spark.zip")
        pkg = os.path.join(repo, "llm_aided_ocr_spark")
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(pkg):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        zf.write(full, os.path.relpath(full, repo))

        inp = os.path.join(tmp, "pages.parquet")
        out = os.path.join(tmp, "out")
        pages_dataframe(spark, n_rows=5, include_golden=True).write.parquet(inp)

        env = dict(os.environ)
        env.pop("PYTHONPATH", None)  # the zip must be self-sufficient
        proc = subprocess.run(
            [
                SPARK_SUBMIT,
                "--master", "local[2]",
                "--py-files", zip_path,
                "--conf", "spark.sql.shuffle.partitions=4",
                "--conf", "spark.ui.enabled=false",
                os.path.join(repo, "llm_aided_ocr_spark", "__main__.py"),
                "--input", inp, "--output", out,
                "--provider", "heuristic", "--no-raw",
            ],
            capture_output=True, text=True, timeout=420, cwd=tmp, env=env,
        )
        assert proc.returncode == 0, (proc.stdout[-1500:], proc.stderr[-1500:])
        assert "wrote 5 corrected documents" in proc.stdout
        assert spark.read.parquet(os.path.join(out, "corrected_docs")).count() == 5
