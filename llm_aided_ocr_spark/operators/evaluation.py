"""Extraction-quality evaluation (Cleaneval-style token P/R/F1).

Main-content extraction is a heuristic; a production crawl pipeline
needs a measurement loop — the boilerplate-removal literature
(CleanEval, Baroni et al. 2008; the Boilerpipe and JusText papers)
scores extractors by token-level precision/recall/F1 of the extracted
text against gold main content. The reference repo
(/root/reference/llm_aided_ocr.py) has no eval harness (it eyeballs a
single PDF); this operator is the measurement half of the
brief-mandated extraction suite.

Metric: bag-of-tokens (MULTISET) overlap per document —

    common    = Σ_tok min(count_gold(tok), count_extracted(tok))
    precision = common / n_extracted     (1.0 when nothing extracted
    recall    = common / n_gold           and nothing gold, else 0.0
    f1        = harmonic mean             on empty denominators)

Tokens are lowercase ``[a-z0-9]+`` runs — the corpus-wide normalized
token space every textstats operator shares, written in the Java-regex
∩ RE2 ∩ DuckDB common subset so oracles replay it verbatim.

Scale shape: one ``regexp_extract_all`` + explode per side, partial
``(id, tok) → n`` aggregation BEFORE the join (the word_commonness
pre-agg discipline — a document repeating one token 10^6 times
contributes ONE row to the shuffle, not 10^6), then a full-outer join
on ``(id, tok)`` and a final per-id aggregation. Three exchanges, all
carrying ``(id-hash, short-token, count)`` rows — never the texts.
Ratios are rounded to 6dp (``_r`` suffix) for bit-stable cross-engine
comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"


def _token_counts(df: DataFrame, id_col: str, text_col: str, n_alias: str) -> DataFrame:
    toks = F.regexp_extract_all(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))), F.lit(TOKEN_RE), F.lit(0)
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode_outer(toks).alias("tok"))
        .where(F.col("tok").isNotNull())
        .groupBy("id", "tok")
        .agg(F.count("*").alias(n_alias))
    )


def extraction_eval(
    gold_df: DataFrame,
    extracted_df: DataFrame,
    id_col: str = "doc_id",
    gold_col: str = "text",
    extracted_col: str = "extracted",
) -> DataFrame:
    """``(id, n_gold, n_extracted, n_common, precision_r, recall_r,
    f1_r)`` — token-multiset extraction quality per document. Documents
    present in ``gold_df`` but absent from ``extracted_df`` (extractor
    produced nothing) score recall 0; the reverse (spurious extraction)
    scores precision 0. Both-empty documents score 1.0 across the board
    (extracting nothing from a contentless page is correct)."""
    g = _token_counts(gold_df, id_col, gold_col, "n_g")
    e = _token_counts(extracted_df, id_col, extracted_col, "n_e")
    ids = (
        gold_df.select(F.col(id_col).alias("id"))
        .union(extracted_df.select(F.col(id_col).alias("id")))
        .distinct()
    )
    joined = g.join(e, ["id", "tok"], "full_outer").select(
        "id",
        F.coalesce("n_g", F.lit(0)).alias("n_g"),
        F.coalesce("n_e", F.lit(0)).alias("n_e"),
    )
    per_id = joined.groupBy("id").agg(
        F.sum("n_g").alias("n_gold"),
        F.sum("n_e").alias("n_extracted"),
        F.sum(F.least("n_g", "n_e")).alias("n_common"),
    )
    full = ids.join(per_id, "id", "left").select(
        "id",
        F.coalesce("n_gold", F.lit(0)).alias("n_gold"),
        F.coalesce("n_extracted", F.lit(0)).alias("n_extracted"),
        F.coalesce("n_common", F.lit(0)).alias("n_common"),
    )
    prec = F.when(
        F.col("n_extracted") > 0, F.col("n_common") / F.col("n_extracted")
    ).otherwise(F.when(F.col("n_gold") == 0, F.lit(1.0)).otherwise(F.lit(0.0)))
    rec = F.when(
        F.col("n_gold") > 0, F.col("n_common") / F.col("n_gold")
    ).otherwise(F.when(F.col("n_extracted") == 0, F.lit(1.0)).otherwise(F.lit(0.0)))
    with_pr = full.select(
        "id", "n_gold", "n_extracted", "n_common",
        prec.alias("p"), rec.alias("r"),
    )
    f1 = F.when(
        (F.col("p") + F.col("r")) > 0,
        2.0 * F.col("p") * F.col("r") / (F.col("p") + F.col("r")),
    ).otherwise(F.lit(0.0))
    return with_pr.select(
        "id", "n_gold", "n_extracted", "n_common",
        F.round("p", 6).alias("precision_r"),
        F.round("r", 6).alias("recall_r"),
        F.round(f1, 6).alias("f1_r"),
    )


def extraction_eval_summary(per_doc: DataFrame) -> DataFrame:
    """One-row corpus rollup of :func:`extraction_eval`: micro-averaged
    precision/recall/F1 (token-weighted — the CleanEval headline
    number) plus macro-averaged per-document means. One aggregation,
    no further shuffle of anything wide."""
    agg = per_doc.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_gold").alias("t_gold"),
        F.sum("n_extracted").alias("t_extracted"),
        F.sum("n_common").alias("t_common"),
        F.round(F.avg("precision_r"), 6).alias("macro_precision_r"),
        F.round(F.avg("recall_r"), 6).alias("macro_recall_r"),
        F.round(F.avg("f1_r"), 6).alias("macro_f1_r"),
    )
    mp = F.when(F.col("t_extracted") > 0, F.col("t_common") / F.col("t_extracted")).otherwise(F.lit(1.0))
    mr = F.when(F.col("t_gold") > 0, F.col("t_common") / F.col("t_gold")).otherwise(F.lit(1.0))
    mf = F.when((mp + mr) > 0, 2.0 * mp * mr / (mp + mr)).otherwise(F.lit(0.0))
    return agg.select(
        "n_docs", "t_gold", "t_extracted", "t_common",
        F.round(mp, 6).alias("micro_precision_r"),
        F.round(mr, 6).alias("micro_recall_r"),
        F.round(mf, 6).alias("micro_f1_r"),
        "macro_precision_r", "macro_recall_r", "macro_f1_r",
    )
