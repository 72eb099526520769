#!/usr/bin/env python
"""Per-query isolation harness for the optimization rounds (guide §1.4).

`bench.py` is FROZEN for measurement; this file holds the extra
instrumentation: time ONE (or a list of) declared queries with the same
noop-sink methodology, optionally repeated, and dump
``.explain("formatted")`` for each into ``plans/r06/``.

Usage:
    python bench_extra.py --queries related_docs,line_dedup --repeat 3
    python bench_extra.py --queries related_docs --explain plans/r06/related_docs_before.txt
    python bench_extra.py --pipeline
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _get_spark(cores: int):
    from llm_aided_ocr_spark.session import get_spark

    return get_spark(
        app_name=f"ocr_spark_bench_extra_{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
        arrow_max_records_per_batch=512,
    )


def _noop_sink(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--explain", default="",
                    help="write explain('formatted') of the (single) query here")
    ap.add_argument("--explain-dir", default="",
                    help="write plans/<name>_<suffix>.txt per query here")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--pipeline", action="store_true")
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    args = ap.parse_args()

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = _get_spark(cores)
    out = {}
    try:
        if args.pipeline:
            import bench

            out["pipeline"] = bench.bench_pipeline(spark)
        names = [s.strip() for s in args.queries.split(",") if s.strip()]
        if names:
            import __spark_entry__ as entry_mod

            from llm_aided_ocr_spark.operators.util import release_pinned

            qs = entry_mod.queries()
            for name in names:
                spark.sparkContext.setJobDescription(f"bench_extra:{name}")
                df = qs[name](spark, args.sf_dir)
                target = None
                if args.explain and len(names) == 1:
                    target = args.explain
                elif args.explain_dir:
                    target = os.path.join(
                        args.explain_dir, f"{name}_{args.suffix}.txt"
                    )
                if target:
                    plan = df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"
                    )
                    os.makedirs(os.path.dirname(target), exist_ok=True)
                    with open(target, "w") as f:
                        f.write(plan)
                _noop_sink(df)  # warm-up, same as bench.py
                times = []
                for _ in range(args.repeat):
                    t0 = time.time()
                    _noop_sink(df)
                    times.append(round(time.time() - t0, 3))
                out[name] = {"best": min(times), "all": times}
                release_pinned(df)
                spark.sparkContext.setJobDescription(None)
    finally:
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
