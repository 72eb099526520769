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
# PDF path (reference S1/P1/P2) — real plumbing, stubbed native render
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
