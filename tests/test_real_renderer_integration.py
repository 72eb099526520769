"""Opt-in REAL PDF render + OCR integration test.

This sandbox has no poppler/tesseract, so the PDF path ships as an
injectable seam with deterministic fakes (tests/test_spark_pipeline.py).
A production adopter's first question is "does the real renderer slot in?"
— this test answers it: when pdf2image + pytesseract ARE importable (and
their native binaries work), it builds the reference's exact render stack
(convert_from_bytes → P1 preprocess (gray + Otsu + identity dilate) →
tesseract) as a PageRenderer, runs it through the Spark operator on the
reference's golden PDF, and compares the "\n"-joined pages against the
reference's committed raw-OCR artifact byte-for-byte.

Skips cleanly here; on a machine with the binaries it is the production
validation path (same tesseract major version as the reference's artifact
is required for byte equality — OCR output is engine-version-sensitive).

Reference parity: llm_aided_ocr.py:395-426 (preprocess_image,
convert_pdf_to_images, ocr_image) and :656 (raw output artifact).
"""

from __future__ import annotations

import glob
import os

import pytest

REF_DIR = "/root/reference"

pdf2image = pytest.importorskip("pdf2image")
pytesseract = pytest.importorskip("pytesseract")


def _golden_paths():
    pdfs = glob.glob(os.path.join(REF_DIR, "*.pdf"))
    if not pdfs:
        pytest.skip("reference golden PDF absent")
    pdf = pdfs[0]
    raw = pdf.replace(".pdf", "__raw_ocr_output.txt")
    if not os.path.exists(raw):
        pytest.skip("reference raw OCR golden absent")
    return pdf, raw


def _real_renderer(pdf_bytes, first_page, last_page):
    """The reference's render stack over our numpy P1 kernel."""
    import numpy as np
    from PIL import Image

    from llm_aided_ocr_spark.operators.extract import preprocess_page_image

    images = pdf2image.convert_from_bytes(
        pdf_bytes, first_page=first_page, last_page=last_page
    )
    out = []
    for im in images:
        rgb = np.array(im.convert("RGB"))
        binary = preprocess_page_image(rgb)
        out.append(pytesseract.image_to_string(Image.fromarray(binary)))
    return out


def test_real_render_matches_reference_golden(spark):
    try:  # binaries can be missing even when the python shims import
        pdf2image.convert_from_bytes(b"", first_page=1, last_page=1)
    except Exception as exc:
        if "poppler" in str(exc).lower():
            pytest.skip(f"poppler not runnable: {exc}")
        # empty bytes legitimately fail; only poppler-absence skips

    from llm_aided_ocr_spark.kernels import join_pages_raw
    from llm_aided_ocr_spark.operators.extract import extract_pdf_pages

    pdf_path, raw_path = _golden_paths()
    with open(pdf_path, "rb") as f:
        blob = f.read()
    golden = open(raw_path, encoding="utf-8").read()

    df = spark.createDataFrame([("golden.pdf", blob)], "url string, pdf binary")
    pages = extract_pdf_pages(df, renderer=_real_renderer)
    rows = sorted(pages.collect(), key=lambda r: r["page_no"])
    assert rows, "renderer produced no pages"
    joined = join_pages_raw([r["page_text"] for r in rows])
    # reference writes "\n".join(ocr pages) to the raw artifact
    # (llm_aided_ocr.py:653-656)
    assert joined == golden, (
        f"real-render output diverges from the golden artifact "
        f"({len(joined)} vs {len(golden)} chars); check tesseract version"
    )
