"""Native text Column helpers."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# P3 — the reference's four literal replaces, exact order
# (llm_aided_ocr.py:581-582). F.replace is literal (not regex), matching
# Python str.replace.
_HEADER_STRIP_PASSES = (
    "# Corrected text\n",
    "# Corrected text:",
    "\nCorrected text",
    "Corrected text:",
)


def strip_correction_header_col(col: Column) -> Column:
    for pat in _HEADER_STRIP_PASSES:
        col = F.replace(col, F.lit(pat), F.lit(""))
    return col


def word_count_col(col: Column) -> Column:
    """Whitespace word count; empty/blank string counts 0 words."""
    trimmed = F.regexp_replace(col, r"^\s+|\s+$", "")
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )
