"""Crawl-snapshot comparison — what changed between two crawls.

Common Crawl ships monthly snapshots; an incremental curation pipeline
wants the delta, not the union: pages that appeared, vanished, changed
content, or are byte-identical refetches (the dominant class — most of
the web does not change month to month, and reprocessing it is the
single biggest avoidable cost at 100 TB). ``snapshot_diff`` labels every
url across two snapshots; downstream, `added + changed` feed the
pipeline, `unchanged` reuses the previous run's outputs (the
CheckpointStore resume path), `removed` drives retention.

No reference analogue (single-document CLI); the workflow is the public
crawl-delta pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SNAPSHOT_STATUSES = ("added", "removed", "changed", "unchanged")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """``(id, status)`` with status ∈ ``added | removed | changed |
    unchanged`` — the full-outer comparison of two snapshots keyed on
    the url.

    Scale shape: each side projects to ``(id, xxhash64(text))`` BEFORE
    the join, so the one shuffle per side carries 16-byte rows — never
    document text (the exact_keeper_ids discipline). Content equality is
    fingerprint equality (64-bit collisions are the usual negligible
    caveat; the driver oracle compares the text itself — the
    ngram_jaccard hashed-vs-string precedent). Ids are assumed unique
    per snapshot (crawl tables are url-keyed; run
    :func:`~llm_aided_ocr_spark.operators.dedup.canonical_url_keepers`
    first when they are not)."""
    fp = lambda df: df.select(  # noqa: E731
        F.col(id_col).alias("id"),
        F.xxhash64(F.coalesce(F.col(text_col), F.lit(""))).alias("fp"),
    )
    o = fp(old).withColumnRenamed("fp", "old_fp")
    n = fp(new).withColumnRenamed("fp", "new_fp")
    joined = o.join(n, "id", "full_outer")
    return joined.select(
        "id",
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") == F.col("new_fp"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )


def snapshot_diff_stats(diff: DataFrame) -> DataFrame:
    """``(status, n)`` rollup of a :func:`snapshot_diff` result — the
    four-row summary a crawl-delta report leads with (map-side
    combinable count; missing statuses simply absent)."""
    return diff.groupBy("status").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
