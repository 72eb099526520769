"""Text-analysis operators for training-data curation: language ID,
quality scoring, token counting, document fingerprinting.

All are NATIVE column expressions (JVM/codegen, no Python exchange) so they
run at scan speed over 100 TB; each returns aliased columns ready for the
driver's oracle comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from llm_aided_ocr_spark.functions.text import word_count_col

# ---------------------------------------------------------------------------
# Language ID — stopword-hit heuristic
# ---------------------------------------------------------------------------

_LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "was"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr": ("le", "la", "les", "et", "des", "est", "une", "dans", "que", "pour"),
    "es": ("el", "la", "los", "las", "es", "una", "por", "con", "para", "del"),
}


def _marker_hits(words: Column, markers: tuple) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(words, lambda w: F.array_contains(arr, w)))


def lang_id_col(text_col: Column) -> Column:
    """Best-scoring language by stopword hits; ``und`` (undetermined) when
    nothing matches. Deterministic tie-break by language-key order."""
    words = F.split(
        F.regexp_replace(F.lower(text_col), r"[^a-zà-ÿäöüßñ\s]", " "), r"\s+"
    )
    scores = [
        F.struct(
            _marker_hits(words, markers).alias("hits"),
            F.lit(-i).alias("prio"),
            F.lit(lang).alias("lang"),
        )
        for i, (lang, markers) in enumerate(_LANG_MARKERS.items())
    ]
    best = F.array_max(F.array(*scores))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def detect_language(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("detected_lang", lang_id_col(F.coalesce(text_col, F.lit(""))))


# ---------------------------------------------------------------------------
# Quality scoring — length / punctuation / stopword / repetition ratios
# ---------------------------------------------------------------------------

def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality features, all native:
    n_chars, n_words, mean_word_len, punct_ratio, upper_ratio,
    stopword_ratio, line_count, blank_line_ratio."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.length(t)
    n_words = word_count_col(t)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    words = F.split(F.regexp_replace(F.lower(t), r"[^a-z\s]", " "), r"\s+")
    stop_hits = _marker_hits(words, _LANG_MARKERS["en"])
    lines = F.split(t, "\n")
    n_lines = F.size(lines)
    n_blank = F.size(F.filter(lines, lambda ln: F.trim(ln) == ""))
    safe = lambda num, den: F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars_calc"),
        n_words.alias("n_words"),
        safe(n_chars, n_words).alias("mean_word_len"),
        safe(n_punct, n_chars).alias("punct_ratio"),
        safe(n_upper, n_chars).alias("upper_ratio"),
        safe(stop_hits, n_words).alias("stopword_ratio"),
        n_lines.alias("n_lines"),
        safe(n_blank, n_lines).alias("blank_line_ratio"),
    )


def quality_score_col(text_col: Column) -> Column:
    """Composite 0-100 heuristic quality score: rewards sane word lengths
    and stopword presence, penalizes punctuation/uppercase excess and
    blank-heavy layouts. Deterministic, monotone in the features."""
    t = F.coalesce(text_col, F.lit(""))
    n_chars = F.length(t)
    n_words = word_count_col(t)
    words = F.split(F.regexp_replace(F.lower(t), r"[^a-z\s]", " "), r"\s+")
    stop_ratio = F.when(
        n_words > 0, _marker_hits(words, _LANG_MARKERS["en"]).cast("double") / n_words
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        n_chars > 0,
        (n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))).cast("double") / n_chars,
    ).otherwise(F.lit(0.0))
    mean_wl = F.when(n_words > 0, n_chars.cast("double") / n_words).otherwise(F.lit(0.0))
    length_term = F.least(n_words.cast("double") / 100.0, F.lit(1.0)) * 30
    stop_term = F.least(stop_ratio * 4, F.lit(1.0)) * 30
    wl_term = F.when((mean_wl >= 3) & (mean_wl <= 12), F.lit(20.0)).otherwise(F.lit(5.0))
    punct_term = F.greatest(F.lit(0.0), (F.lit(0.25) - punct_ratio) * 80)
    return F.round(length_term + stop_term + wl_term + punct_term).cast("int")


# ---------------------------------------------------------------------------
# Token counting — whitespace + BPE-ish regex
# ---------------------------------------------------------------------------

_BPE_ISH = r"[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]"


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """``(id, ws_tokens, bpe_ish_tokens, approx_tokens)`` — whitespace
    count, a BPE-flavored regex segmentation count (letters runs / up to
    3-digit number groups / single symbols), and the reference T3
    approximation, all native."""
    from llm_aided_ocr_spark.functions.tokens import approx_tokens_col

    t = F.coalesce(F.col(text_col), F.lit(""))
    return df.select(
        F.col(id_col),
        word_count_col(t).alias("ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(_BPE_ISH), 0)).alias("bpe_ish_tokens"),
        approx_tokens_col(t).alias("approx_tokens"),
    )


# ---------------------------------------------------------------------------
# Document fingerprinting — content hash + winnowed rolling hashes
# ---------------------------------------------------------------------------

def fingerprints(
    df: DataFrame,
    window: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(id, content_hash, n_grams, min_gram_hash)`` — full-content
    xxhash64 plus a winnowing-style summary over word 8-gram rolling
    hashes (min hash of the gram set = the document's stable anchor),
    native via transform/sequence."""
    t = F.regexp_replace(
        F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+", " "
    )
    words = F.split(t, " ")
    n_gr = F.greatest(F.size(words) - F.lit(window - 1), F.lit(0))
    gram_hashes = F.when(
        n_gr > 0,
        F.transform(
            F.sequence(F.lit(0), n_gr - 1),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words, i + 1, window))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return df.select(
        F.col(id_col),
        F.xxhash64(t).alias("content_hash"),
        n_gr.alias("n_grams"),
        F.coalesce(F.array_min(gram_hashes), F.lit(0)).alias("min_gram_hash"),
    )
