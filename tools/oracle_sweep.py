#!/usr/bin/env python
"""Adversarial session-config oracle sweep (round-4 discipline): run
EVERY fully-oracled contract query under a hostile session config —
``spark.sql.session.timeZone=Australia/Lord_Howe`` (a half-hour-offset
zone) plus ``spark.sql.ansi.enabled=true`` — and value-compare against
the DuckDB oracles. Engine-portable-by-construction claims are only as
good as this sweep's last run.

Usage: python tools/oracle_sweep.py [sf_dir] [name,name,...]
Prints one JSON line: {"oracles": N, "fails": [...]}.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS_ONLY = {"host_pagerank", "compression_ratio"}  # documented float/zlib rows-only


def _key(row):
    return tuple((v is None, str(v)) for v in row)


def main() -> None:
    import duckdb

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

    from pyspark.sql import SparkSession

    from llm_aided_ocr_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.conf.set("spark.sql.session.timeZone", "Australia/Lord_Howe")
    spark.conf.set("spark.sql.ansi.enabled", "true")

    import __spark_entry__ as e

    from llm_aided_ocr_spark.operators.util import release_pinned

    duck = duckdb.connect()
    for t in ("documents", "events", "embeddings", "lineitem", "orders",
              "customer", "supplier", "nation", "region", "part"):
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"parquet_scan('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = e.queries(), e.oracle_sql()
    fails, n = [], 0
    for name, sql in oracles.items():
        if only is not None and name not in only:
            continue
        n += 1
        try:
            sdf = qs[name](spark, sf_dir)
            srows = sorted((tuple(r) for r in sdf.collect()), key=_key)
            release_pinned(sdf, blocking=True)
            orows = sorted(
                (tuple(r) for r in duck.execute(sql).fetchall()), key=_key
            )
            if name in ROWS_ONLY:
                ok = len(srows) == len(orows)
            else:
                ok = srows == orows
            if not ok:
                fails.append(name)
                print(f"[oracle_sweep] FAIL {name}", file=sys.stderr, flush=True)
            else:
                print(f"[oracle_sweep] ok {name}", file=sys.stderr, flush=True)
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            fails.append(f"{name}: {type(ex).__name__}: {str(ex)[:120]}")
            print(f"[oracle_sweep] ERROR {name}: {ex}", file=sys.stderr,
                  flush=True)
    spark.stop()
    print(json.dumps({"oracles": n, "fails": fails}))


if __name__ == "__main__":
    main()
