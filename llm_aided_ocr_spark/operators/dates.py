"""Publication-date extraction with a source-precedence ladder.

Training-data pipelines weight, filter and decontaminate by document
AGE (freshness mixing, cutoff-date filtering, time-sliced eval splits),
but crawled pages declare their date in several competing places. This
operator extracts the three channel families trafilatura-class
extractors rely on and resolves them by trust:

1. ``<meta>`` declarations, by key priority (``article:published_time``
   — the OpenGraph channel publishers actually fill — then
   ``datepublished``, ``date``, ``dc.date``, ``dc.date.issued``,
   ``parsely-pub-date``); the PRIORITY list order decides between
   multiple declared keys, not document order;
2. the first ``<time datetime="...">`` element;
3. a date embedded in the URL path (``/YYYY/MM/DD/`` or
   ``/YYYY-MM-DD/`` — month/day may be 1-digit in the slashed form).

Each candidate normalizes to its leading ``YYYY-MM-DD`` via
``try_to_date`` (NULL on impossible dates like Feb 30 — and ANSI-safe:
no throw under ``spark.sql.ansi.enabled``) and must land inside
``[min_year, max_year]``; ``pub_date`` is the first valid candidate in
ladder order and ``source`` names the winning channel.

Scale shape: pure native regexp projections over the decoded html —
zero Python, zero joins/shuffle, scan-fused. Document-local; no
reference analogue (the reference ingests PDFs,
``llm_aided_ocr.py:411-426``); part of the web-curation suite.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_META_KEYS: List[str] = [
    "article:published_time",
    "datepublished",
    "date",
    "dc.date",
    "dc.date.issued",
    "parsely-pub-date",
]

_ISO_RE = r"(\d{4}-\d{2}-\d{2})"
_TIME_TAG_RE = r'(?is)<time\b[^>]*\bdatetime\s*=\s*["\']([^"\']*)["\']'
_URL_SLASHED_RE = r"/((?:19|20)\d{2})/(\d{1,2})/(\d{1,2})(?:/|$|\?)"
_URL_DASHED_RE = r"/((?:19|20)\d{2}-\d{2}-\d{2})(?:/|$|\?)"


def publication_dates(
    pages_df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    id_col: str = "url",
    meta_keys: Optional[List[str]] = None,
    min_year: int = 1995,
    max_year: int = 2035,
) -> DataFrame:
    """``(id, date_meta, date_time_tag, date_url, pub_date, source)`` —
    one row per page; the three channel columns are each normalized and
    range-gated independently (NULL when absent or invalid), then the
    ladder picks ``pub_date``."""
    if meta_keys is None:
        meta_keys = DEFAULT_META_KEYS
    if not meta_keys:
        raise ValueError("meta_keys must be non-empty (or None for defaults)")
    from llm_aided_ocr_spark.operators.extract import (
        _META_CONTENT_RE,
        _META_KEY_RE,
        _META_TAG_RE,
    )

    h = F.decode(F.coalesce(F.col(html_col), F.lit(b"")), "UTF-8")
    tags = F.regexp_extract_all(h, F.lit(_META_TAG_RE), F.lit(1))
    pairs = F.transform(
        tags,
        lambda t: F.struct(
            F.lower(F.regexp_extract(t, _META_KEY_RE, 1)).alias("key"),
            F.regexp_extract(t, _META_CONTENT_RE, 1).alias("content"),
        ),
    )

    def _norm(raw):  # leading ISO date, validity- and range-gated
        d = F.try_to_date(F.regexp_extract(raw, _ISO_RE, 1), "yyyy-MM-dd")
        return F.when(
            (F.year(d) >= min_year) & (F.year(d) <= max_year), d
        )

    # meta: first PRIORITY key with any declaration (its first tag in
    # document order breaks ties within one key)
    def _first_for_key(key_l: str):
        return F.get(
            F.filter(pairs, lambda p: p["key"] == F.lit(key_l)), 0
        )["content"]

    meta_raw = None
    for k in meta_keys:
        hit = _first_for_key(k.lower())
        meta_raw = hit if meta_raw is None else F.coalesce(meta_raw, hit)
    date_meta = _norm(F.coalesce(meta_raw, F.lit("")))

    date_time_tag = _norm(F.regexp_extract(h, _TIME_TAG_RE, 1))

    url = F.coalesce(F.col(url_col), F.lit(""))
    slashed = F.when(
        F.regexp_extract(url, _URL_SLASHED_RE, 1) != "",
        F.concat_ws(
            "-",
            F.regexp_extract(url, _URL_SLASHED_RE, 1),
            F.lpad(F.regexp_extract(url, _URL_SLASHED_RE, 2), 2, "0"),
            F.lpad(F.regexp_extract(url, _URL_SLASHED_RE, 3), 2, "0"),
        ),
    )
    date_url = _norm(
        F.coalesce(slashed, F.regexp_extract(url, _URL_DASHED_RE, 1))
    )

    pub = F.coalesce(date_meta, date_time_tag, date_url)
    source = (
        F.when(date_meta.isNotNull(), F.lit("meta"))
        .when(date_time_tag.isNotNull(), F.lit("time"))
        .when(date_url.isNotNull(), F.lit("url"))
    )
    return pages_df.select(
        F.col(id_col).alias("id"),
        date_meta.alias("date_meta"),
        date_time_tag.alias("date_time_tag"),
        date_url.alias("date_url"),
        pub.alias("pub_date"),
        source.alias("source"),
    )
