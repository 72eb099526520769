"""Corpus-level boilerplate line removal (the CCNet/RefinedWeb line-dedup
stage).

Web chrome — nav bars, cookie banners, copyright footers — repeats the
same LINE across thousands of pages of a site while the article body is
unique. The standard curation move (CCNet §3.1 "paragraph-level
deduplication"; RefinedWeb's line-wise filter) removes every line whose
corpus document-frequency exceeds a threshold and keeps the rest of the
document intact. The reference has no corpus stage (it is a
single-document CLI, llm_aided_ocr.py); this module supplies the
corpus-scale analogue of its document-local duplicate-paragraph rule
(llm_aided_ocr.py:486-493).

Scale shape, in order of data moved:

* counting: per-document DISTINCT trimmed-line hashes are built
  document-locally (``array_distinct`` over a native ``transform``) and
  explode as 8-byte longs into one map-side-combined ``groupBy`` — the
  count exchange carries hash+partial-count, never line text.
* rebuild (default ``strategy='broadcast'``): the frequent-line set is by
  construction small (at threshold K over L total non-blank lines it has
  at most L/K entries — the 1/K harmonic bound), so it is collected into
  ONE sorted array literal broadcast with the job and each document is
  rebuilt locally with zero additional shuffles.
* rebuild (``strategy='join'``): for adversarial corpora where the
  frequent set outgrows the driver, per-line ``(id, pos, hash)`` 24-byte
  rows anti-join the frequent relation and regroup to kept-position
  arrays; document text still moves at most once (the final id join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from llm_aided_ocr_spark.operators.dedup import _word_hash_col


def _lines_col(text_col: str) -> F.Column:
    return F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")


def _line_hash(line: F.Column, hash_family: str) -> F.Column:
    return _word_hash_col(F.trim(line), hash_family)


def dup_line_hashes(
    df: DataFrame,
    text_col: str = "text",
    min_doc_freq: int = 5,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """``(line_hash)`` — hashes of trimmed non-blank lines that occur in
    at least ``min_doc_freq`` DISTINCT documents. Distinctness is
    document-local (``array_distinct`` before the explode), so the
    ``groupBy`` count IS the document frequency and the exchange carries
    only 8-byte hashes with map-side combine."""
    hashes = F.array_distinct(
        F.transform(
            F.filter(_lines_col(text_col), lambda l: F.trim(l) != ""),
            lambda l: _line_hash(l, hash_family),
        )
    )
    return (
        df.select(F.explode(hashes).alias("line_hash"))
        .groupBy("line_hash")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .filter(F.col("doc_freq") >= F.lit(min_doc_freq))
        .select("line_hash")
    )


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_doc_freq: int = 5,
    hash_family: str = "xxhash64",
    out_col: str | None = None,
    strategy: str = "broadcast",
) -> DataFrame:
    """Strip corpus-frequent lines from every document, preserving the
    order (and blank-line structure) of everything that survives. Blank
    lines are never candidates — they carry layout, not boilerplate. A
    document whose every line is boilerplate comes back as ``''``, not
    dropped: line dedup edits documents, document-level filters decide
    their fate.

    ``strategy='broadcast'`` (default) ships the frequent-hash set as one
    sorted array column — the rebuild is a per-row native expression with
    NO per-line exchange. ``strategy='join'`` is the unbounded-set escape
    hatch (see module docstring)."""
    out_col = out_col or text_col
    dup = dup_line_hashes(
        df, text_col=text_col, min_doc_freq=min_doc_freq,
        hash_family=hash_family,
    )
    lines = _lines_col(text_col)
    if strategy == "broadcast":
        dup_arr = F.broadcast(
            dup.agg(F.sort_array(F.collect_list("line_hash")).alias("_dup_hashes"))
        )
        kept = F.filter(
            lines,
            lambda l: (F.trim(l) == "")
            | ~F.array_contains(F.col("_dup_hashes"), _line_hash(l, hash_family)),
        )
        return (
            df.crossJoin(dup_arr)
            .withColumn(out_col, F.array_join(kept, "\n"))
            .drop("_dup_hashes")
        )
    if strategy == "join":
        ex = df.select(
            F.col(id_col).alias("_ld_id"),
            F.posexplode(
                F.transform(lines, lambda l: _line_hash(l, hash_family))
            ).alias("pos", "line_hash"),
        )
        blank_hash = _line_hash(F.lit(""), hash_family)
        kept_pos = (
            ex.join(
                dup.withColumn("_dup", F.lit(True)), on="line_hash", how="left"
            )
            # blank lines hash to hash('') which can never enter `dup`
            # (non-blank-only counting), but keep the guard explicit
            .filter(F.col("_dup").isNull() | (F.col("line_hash") == blank_hash))
            .groupBy("_ld_id")
            .agg(F.sort_array(F.collect_list("pos")).alias("_kept_pos"))
        )
        rebuilt = F.array_join(
            F.transform(
                F.coalesce(F.col("_kept_pos"), F.array().cast("array<int>")),
                lambda i: F.element_at(lines, i + 1),
            ),
            "\n",
        )
        return (
            df.join(kept_pos, df[id_col] == kept_pos["_ld_id"], "left")
            .withColumn(out_col, rebuilt)
            .drop("_ld_id", "_kept_pos")
        )
    raise ValueError(f"unknown strategy {strategy!r}")


def line_dedup_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_doc_freq: int = 5,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """``(id, n_lines, n_kept, clean_len, clean_md5)`` — the audit view of
    :func:`line_dedup`: per-document line counts before/after plus the
    length and md5 of the cleaned text (md5 is engine-portable, so the
    driver oracle verifies the rebuilt BYTES, not just counts)."""
    cleaned = line_dedup(
        df, text_col=text_col, id_col=id_col, min_doc_freq=min_doc_freq,
        hash_family=hash_family, out_col="_clean",
    )
    return cleaned.select(
        F.col(id_col).alias("id"),
        F.size(_lines_col(text_col)).alias("n_lines"),
        F.size(F.split(F.col("_clean"), "\n")).alias("n_kept_raw"),
        F.length("_clean").alias("clean_len"),
        F.md5(F.col("_clean")).alias("clean_md5"),
    ).withColumn(
        # split('') yields [''] — an all-boilerplate doc has 0 kept lines
        "n_kept",
        F.when(F.col("clean_len") == 0, F.lit(0)).otherwise(F.col("n_kept_raw")),
    ).drop("n_kept_raw")
