"""Frozen-golden regression tests (FIXTURES.md §2): the expected outputs of
the deterministic pipeline are committed under tests/golden/, so byte
drift is caught even without /root/reference present, and the reference
golden document itself is embedded (gzip) for full self-containment."""

from __future__ import annotations

import base64
import gzip
import hashlib
import json
import os

import pytest

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "expected_outputs.json.gz")


@pytest.fixture(scope="module")
def golden():
    with gzip.open(GOLDEN_PATH, "rt", encoding="utf-8") as f:
        return json.load(f)


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def test_reference_doc_pipeline_bytes(golden):
    from llm_aided_ocr_spark import kernels

    meta = golden["reference_doc"]
    text = gzip.decompress(base64.b64decode(meta["input_text_gz_b64"])).decode()
    assert _sha(text) == meta["input_sha256"]
    assert len(text) == meta["input_len"]

    ident = kernels.process_document_text([text], correct=kernels.identity_correct)
    assert ident.n_chunks == meta["identity_n_chunks"]
    assert len(ident.corrected_text) == meta["identity_len"]
    assert _sha(ident.corrected_text) == meta["identity_corrected_sha256"]

    heur = kernels.process_document_text(
        [text], correct=lambda c: kernels.correct_chunk_text(c, True, True)
    )
    assert len(heur.corrected_text) == meta["heuristic_len"]
    assert _sha(heur.corrected_text) == meta["heuristic_corrected_sha256"]
    assert heur.corrected_text[:200] == meta["heuristic_head"]


def test_synthetic_corpus_frozen_bytes(golden):
    from llm_aided_ocr_spark import kernels
    from llm_aided_ocr_spark.sources.synthetic import generate_pages_rows

    expected = golden["synthetic_seed42_n40"]
    rows = generate_pages_rows(n_rows=40, seed=42, include_golden=False)
    assert len(rows) == len(expected)
    for url, _ts, _html, text, _lang in rows:
        meta = expected[url]
        assert _sha(text or "") == meta["text_sha256"], f"generator drift for {url}"
        chunks = kernels.chunk_full_text(text or "")
        corrected = kernels.strip_correction_header(
            kernels.assemble_chunks(
                [kernels.correct_chunk_text(c, True, True) for c in chunks]
            )
        )
        assert len(chunks) == meta["n_chunks"], url
        assert len(corrected) == meta["corrected_len"], url
        assert _sha(corrected) == meta["corrected_sha256"], url


def test_spark_pipeline_matches_frozen(spark, golden):
    """The full Spark pipeline must hit the same frozen bytes."""
    from llm_aided_ocr_spark.config import PipelineConfig
    from llm_aided_ocr_spark.plans.pipeline import run_pipeline
    from llm_aided_ocr_spark.sources.synthetic import pages_dataframe

    expected = golden["synthetic_seed42_n40"]
    pages = pages_dataframe(spark, n_rows=40, seed=42, include_golden=False)
    result = run_pipeline(pages, PipelineConfig(provider="heuristic"), strategy="auto")
    for r in result.collect():
        meta = expected[r["url"]]
        assert _sha(r["corrected_text"]) == meta["corrected_sha256"], r["url"]
        assert r["n_chunks"] == meta["n_chunks"], r["url"]
