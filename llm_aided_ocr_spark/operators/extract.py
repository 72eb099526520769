"""Stage 1 — extraction: ``html: binary`` → ``text: string``.

The reference's analogue is PDF→image→Tesseract (llm_aided_ocr.py:411-426);
the north rule widens the input to Common-Crawl-style pages and mandates a
batched DOM boilerplate strip. Implemented as ``mapInPandas`` over Arrow
batches — document-local, narrow (zero shuffle), column-pruned to
``(url, html)`` plus passthroughs.

PDF extraction is STUBBED: poppler/tesseract are not in this container. The
plumbing (schema, batching, page-range slice) is real; the render call
raises ``NotImplementedError`` unless a deterministic fake is injected.
"""

from __future__ import annotations

from typing import Callable, Iterator, List, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from llm_aided_ocr_spark.kernels import extract_main_text

EXTRACTED_SCHEMA = "url string, warc_ts timestamp, lang string, extracted_text string"


def extract_text(pages_df: DataFrame, use_html: bool = True) -> DataFrame:
    """``(url, warc_ts, html, text, lang)`` → ``(url, warc_ts, lang,
    extracted_text)``.

    With ``use_html=True`` the DOM strip runs over the binary html column;
    otherwise the pre-extracted ``text`` column passes through (the
    reference's Tesseract output stand-in, per SURVEY.md M6).
    """
    if not use_html:
        return pages_df.select(
            "url", "warc_ts", "lang", F.col("text").alias("extracted_text")
        )

    cols = pages_df.select("url", "warc_ts", "lang", "html")

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = batch[["url", "warc_ts", "lang"]].copy()
            out["extracted_text"] = batch["html"].map(extract_main_text)
            yield out

    return cols.mapInPandas(_extract, schema=EXTRACTED_SCHEMA)


# ---------------------------------------------------------------------------
# P1 — image preprocessing (reference llm_aided_ocr.py:404-409), pure numpy
# ---------------------------------------------------------------------------

def otsu_threshold(gray) -> int:
    """Otsu's method over a uint8 grayscale array — the threshold that
    maximizes between-class variance (what cv2.THRESH_OTSU computes)."""
    import numpy as np

    hist = np.bincount(gray.ravel(), minlength=256).astype(np.float64)
    total = gray.size
    weights = np.cumsum(hist)            # W_b(t): background pixel count
    sums = np.cumsum(hist * np.arange(256))  # S_b(t): background intensity sum
    total_sum = sums[-1]
    # between-class variance ∝ (S_total·W_b − S_b·total)² / (W_b·(total−W_b))
    with np.errstate(divide="ignore", invalid="ignore"):
        between = (total_sum * weights - sums * total) ** 2 / (
            weights * (total - weights)
        )
    between[~np.isfinite(between)] = -1
    return int(np.argmax(between))


def preprocess_page_image(rgb):
    """Reference P1 (llm_aided_ocr.py:404-409) without cv2:

    1. RGB → grayscale (ITU-R BT.601 weights, matching cv2.COLOR_RGB2GRAY);
    2. binary threshold at the Otsu level (>thresh → 255 else 0);
    3. dilate with a 1×1 kernel, 1 iteration — a structural no-op the
       reference performs; reproduced as the identity it is (:407-408).

    Accepts/returns uint8 numpy arrays so it runs vectorized inside the
    page-render UDF once a real renderer is injected.
    """
    import numpy as np

    arr = np.asarray(rgb)
    if arr.ndim == 3:
        gray = (
            0.299 * arr[..., 0] + 0.587 * arr[..., 1] + 0.114 * arr[..., 2]
        ).round().astype(np.uint8)
    else:
        gray = arr.astype(np.uint8)
    thresh = otsu_threshold(gray)
    binary = np.where(gray > thresh, np.uint8(255), np.uint8(0))
    return binary  # 1×1 dilation == identity


# ---------------------------------------------------------------------------
# PDF path (reference S1/P2) — real plumbing, stubbed native render
# ---------------------------------------------------------------------------

PageRenderer = Callable[[bytes, int, Optional[int]], List[str]]
"""(pdf_bytes, first_page_1based, last_page_or_None) -> page texts."""


def _default_renderer(pdf_bytes: bytes, first_page: int, last_page: Optional[int]) -> List[str]:
    raise NotImplementedError(
        "PDF render requires poppler+tesseract (reference llm_aided_ocr.py:411-426); "
        "not available in this container — inject a renderer for testing."
    )


def extract_pdf_pages(
    pdf_df: DataFrame,
    max_pages: int = 0,
    skip_first_n_pages: int = 0,
    renderer: PageRenderer = _default_renderer,
) -> DataFrame:
    """``(url, pdf: binary)`` → exploded ``(url, page_no int, page_text)``.

    Page-range semantics mirror the reference (llm_aided_ocr.py:413-419):
    1-based, ``max_pages=0`` = all, first page = skip+1.
    """
    first_page = skip_first_n_pages + 1
    last_page = None if max_pages == 0 else skip_first_n_pages + max_pages

    def _render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            urls: List[str] = []
            page_nos: List[int] = []
            texts: List[str] = []
            for url, blob in zip(batch["url"], batch["pdf"]):
                pages = renderer(blob, first_page, last_page)
                for i, page_text in enumerate(pages):
                    urls.append(url)
                    page_nos.append(first_page + i)
                    texts.append(page_text)
            yield pd.DataFrame({"url": urls, "page_no": page_nos, "page_text": texts})

    return pdf_df.select("url", "pdf").mapInPandas(
        _render, schema="url string, page_no int, page_text string"
    )


# ---------------------------------------------------------------------------
# HTML page signals — pre-extraction metadata gates
# ---------------------------------------------------------------------------

def noindex_col(html_col: str = "html") -> F.Column:
    """Boolean column: the page declares ``<meta ... robots ...
    noindex ...>`` in either attribute order. NULL html → false. A pure
    codegen predicate (no join/shuffle/Python), shared by
    :func:`html_page_signals` and the ``drop_noindex`` curation gate."""
    h = F.decode(F.coalesce(F.col(html_col), F.lit(b"")), "UTF-8")
    return h.rlike(
        r"(?is)<meta\b[^>]*(robots[^>]*noindex|noindex[^>]*robots)[^>]*>"
    )


def html_page_signals(
    pages_df: DataFrame,
    html_col: str = "html",
    id_col: str = "url",
) -> DataFrame:
    """``(id, lang_attr, title, noindex, n_links, html_bytes,
    links_per_kb)`` — the cheap page-level signals an extraction
    pipeline reads BEFORE committing to a full DOM strip:

    * ``lang_attr`` — the ``<html lang=...>`` declaration (lowercased;
      NULL when absent), the zero-cost prior a language-ID stage seeds
      from;
    * ``title`` — the first ``<title>`` element, whitespace-collapsed
      (entities left as-is; the DOM strip owns unescaping);
    * ``noindex`` — true when a ``<meta ... robots ... noindex ...>``
      tag is present in either attribute order: pages the crawler was
      asked not to index are dropped by most curation pipelines;
    * ``n_links`` / ``links_per_kb`` — anchor-tag count and density
      (links per KB of raw html), the classic boilerplate/navigation-
      page signal (link farms and nav hubs score high);
    * ``canonical_href`` — the ``<link rel="canonical" href=...>``
      target in either attribute order (NULL when absent): the
      publisher-declared canonical URL, a stronger key for
      ``canonical_url_dedup`` than URL normalization alone.

    One native projection over the decoded html — zero shuffle, zero
    Python, fuses into the scan; every regex is RE2-compatible (inline
    ``(?i)``/``(?is)`` flags, lazy quantifiers) so the driver's DuckDB
    oracle evaluates the IDENTICAL patterns. No reference analogue (the
    reference ingests PDFs, llm_aided_ocr.py:411-426); the gate set
    follows public curation practice (C4/RefinedWeb drop noindex and
    high-link-density pages)."""
    from llm_aided_ocr_spark.operators.util import let_

    raw = F.coalesce(F.col(html_col), F.lit(b""))  # NULL html = empty page
    h = F.decode(raw, "UTF-8")
    lang = F.regexp_extract(
        h, r'(?is)<html\b[^>]*\blang\s*=\s*["\']?([A-Za-z-]+)', 1
    )
    title = F.regexp_extract(h, r"(?is)<title[^>]*>(.*?)</title>", 1)
    noindex = noindex_col(html_col)
    n_links = F.regexp_count(h, F.lit(r"(?is)<a[\s>]"))
    canon_fwd = F.regexp_extract(
        h,
        r'(?is)<link\b[^>]*\brel\s*=\s*["\']?canonical["\']?[^>]*'
        r'\bhref\s*=\s*["\']?([^"\'\s>]+)',
        1,
    )
    canon_rev = F.regexp_extract(
        h,
        r'(?is)<link\b[^>]*\bhref\s*=\s*["\']?([^"\'\s>]+)["\']?[^>]*'
        r'\brel\s*=\s*["\']?canonical',
        1,
    )
    canonical = F.when(canon_fwd != "", canon_fwd).when(
        canon_rev != "", canon_rev
    )
    return pages_df.select(
        F.col(id_col).alias("id"),
        F.when(lang != "", F.lower(lang)).alias("lang_attr"),
        F.when(
            title != "",
            F.trim(F.regexp_replace(title, r"\s+", " ")),
        ).alias("title"),
        noindex.alias("noindex"),
        n_links.cast("int").alias("n_links"),
        let_(
            F.octet_length(raw).cast("bigint"),
            lambda b: F.struct(
                b.alias("html_bytes"),
                F.round(
                    n_links.cast("double") * 1000.0
                    / F.greatest(b, F.lit(1)).cast("double"),
                    6,
                ).alias("links_per_kb"),
            ),
        ).alias("_s"),
        canonical.alias("canonical_href"),
    ).select(
        "id", "lang_attr", "title", "noindex", "n_links",
        F.col("_s.html_bytes").alias("html_bytes"),
        F.col("_s.links_per_kb").alias("links_per_kb"),
        "canonical_href",
    )


def charset_signals(
    pages_df: DataFrame,
    html_col: str = "html",
    id_col: str = "url",
) -> DataFrame:
    """``(id, has_bom, charset)`` — encoding declaration sniff, the step
    a Common-Crawl extraction pipeline runs BEFORE committing to a
    decode: raw fetch bytes arrive with no reliable charset, and
    decoding windows-1252 as utf-8 silently mangles every non-ASCII
    page. Precedence follows the WHATWG encoding sniff order for the
    in-document signals: byte-order mark (authoritative → ``utf-8``),
    else the first ``charset=`` declaration — which one regex covers in
    BOTH html5 ``<meta charset=...>`` and html4
    ``<meta http-equiv=Content-Type content="...; charset=...">`` forms
    — else NULL (caller falls back to transport headers / detection).

    One native projection, zero shuffle, fuses into the scan; the
    pattern is Java∩RE2 so the DuckDB oracle replays it verbatim. The
    BOM check runs on the decoded string's first char (U+FEFF) — the
    raw EF BB BF bytes decode to exactly that — so both engines see the
    identical value. No reference analogue (the reference ingests PDFs,
    llm_aided_ocr.py:411-426); part of the web-curation suite.
    """
    h = F.decode(F.coalesce(F.col(html_col), F.lit(b"")), "UTF-8")
    bom = F.startswith(h, F.lit("\ufeff"))
    declared = F.lower(
        F.nullif(
            F.regexp_extract(
                h, r"""(?is)<meta\b[^>]*\bcharset\s*=\s*["']?([A-Za-z0-9_.:-]+)""", 1
            ),
            F.lit(""),
        )
    )
    return pages_df.select(
        F.col(id_col).alias("id"),
        bom.alias("has_bom"),
        F.when(bom, F.lit("utf-8")).otherwise(declared).alias("charset"),
    )
