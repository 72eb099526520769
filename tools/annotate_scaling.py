"""One-off north-rule scaling measurement for the annotate() job.

Runs the Dolma-style attribute projection (now including the round-5
registered_domain / flesch_x1e4 / mojibake_per_kchar_r columns) over the
320k-doc bench corpus at two taskset-pinned parallelism levels and
prints throughput + scaling efficiency. Same methodology as
``bench.py --scaling`` (pinned children, warm corpus, count+checksum
action so every column is actually computed).

Usage: python tools/annotate_scaling.py [lo_cores hi_cores]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CORPUS = "/tmp/ocr_spark_bench_corpus_v2_r320000_s42"


def child(cores: int) -> None:
    import time

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from llm_aided_ocr_spark.plans.curate import annotate

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    docs = spark.read.parquet(CORPUS).select("url", "text")
    n = docs.count()  # warm the page cache outside the timed window
    t0 = time.time()
    # checksum every signal column so nothing is pruned away
    row = annotate(docs).agg(
        F.count("*").alias("n"),
        F.sum(F.length("registered_domain")).alias("c1"),
        F.sum("flesch_x1e4").alias("c2"),
        F.sum("mojibake_per_kchar_r").alias("c3"),
        F.sum("doc_bytes").alias("c4"),
        F.sum("quality_score").alias("c5"),
        F.sum(F.col("gopher_pass").cast("int")).alias("c6"),
        F.sum(F.length("detected_lang")).alias("c7"),
        F.sum("approx_tokens").alias("c8"),
    ).collect()[0]
    dt = time.time() - t0
    # the realistic mixer read: three attributes — Catalyst prunes the
    # other signals' regex passes away entirely
    t1 = time.time()
    annotate(docs).agg(
        F.count("*").alias("n"),
        F.sum("doc_bytes").alias("p1"),
        F.sum("quality_score").alias("p2"),
        F.sum(F.length("registered_domain")).alias("p3"),
    ).collect()
    dt_pruned = time.time() - t1
    mb = sum(
        os.path.getsize(os.path.join(CORPUS, f))
        for f in os.listdir(CORPUS) if f.endswith(".parquet")
    ) / 1e6
    print(json.dumps({
        "cores": cores, "rows": n, "seconds": round(dt, 2),
        "docs_per_sec": round(n / dt), "mb_per_sec": round(mb / dt, 1),
        "pruned_seconds": round(dt_pruned, 2),
        "pruned_docs_per_sec": round(n / dt_pruned),
        "checksum": [row["n"], row["c1"], row["c2"], row["c4"],
                     row["c5"], row["c6"], row["c7"], row["c8"],
                     round(float(row["c3"]), 3)],
    }))
    spark.stop()


def main() -> None:
    if len(sys.argv) == 2 and sys.argv[1].startswith("--child="):
        child(int(sys.argv[1].split("=")[1]))
        return
    lo, hi = (int(x) for x in (sys.argv[1:3] or ["8", "32"]))
    res = {}
    for cores in (lo, hi):
        cpus = ",".join(str(c) for c in range(cores))
        proc = subprocess.run(
            ["taskset", "-c", cpus, sys.executable,
             os.path.abspath(__file__), f"--child={cores}"],
            capture_output=True, text=True, check=False,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        res[cores] = json.loads(line)
        print(line)
    if res[lo]["checksum"] != res[hi]["checksum"]:
        raise SystemExit("checksum mismatch between parallelism levels")
    eff = res[hi]["docs_per_sec"] / res[lo]["docs_per_sec"] / (hi / lo)
    print(json.dumps({
        "pair": [lo, hi],
        "speedup": round(res[hi]["docs_per_sec"] / res[lo]["docs_per_sec"], 3),
        "efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
