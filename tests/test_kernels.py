"""Unit + property tests for the document-local kernels, including byte
parity against the dynamically-loaded reference implementation."""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings, strategies as st

from llm_aided_ocr_spark import kernels
from reference_oracle import (
    reference_available,
    ref_adjust_overlaps,
    ref_approximate_tokens,
    ref_chunk_text,
    ref_chunks_identity,
    ref_process_document_identity,
    ref_remove_header,
)

needs_reference = pytest.mark.skipif(
    not reference_available(), reason="/root/reference not present"
)


def _golden_text() -> str:
    from llm_aided_ocr_spark.sources.synthetic import _load_golden_text

    text = _load_golden_text()
    if text is None:
        pytest.skip("golden raw OCR artifact not present")
    return text


# ---------------------------------------------------------------------------
# Chunker
# ---------------------------------------------------------------------------

def _fixture_page_sets():
    golden = _golden_text()
    rng = random.Random(7)
    big_para = " ".join(
        "Sentence number %d has some words in it." % i for i in range(600)
    )
    unterminated = " ".join("w%d" % rng.randint(0, 9) for _ in range(3000))
    return [
        ["hello world"],
        ["first page.", "second page."],
        [golden],
        [golden[:8000]],
        [big_para],
        [unterminated],
        [""],
        ["", ""],
        ["a\n\nb\n\nc"],
        [("x" * 79 + ".") * 25] * 5,
        ["Para one.\n\nPara two.\n\n" + big_para, "tail page."],
    ]


@needs_reference
@pytest.mark.parametrize("idx", range(11))
def test_chunker_byte_parity_vs_reference(idx):
    pages = _fixture_page_sets()[idx]
    ours = kernels.chunk_pages(pages)
    theirs = ref_chunks_identity(pages)
    assert ours == theirs


@needs_reference
def test_identity_pipeline_byte_parity_vs_reference():
    for pages in _fixture_page_sets():
        ours = kernels.process_document_text(pages, correct=kernels.identity_correct)
        theirs = kernels.strip_correction_header(ref_process_document_identity(pages))
        assert ours.corrected_text == theirs
        assert ours.raw_text == "\n".join(pages)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from(list("abcde .!?\n")), min_size=0, max_size=400
        ),
        min_size=1,
        max_size=4,
    )
)
def test_chunker_property_random_pages(pages):
    """Property: our chunker matches the reference on random page sets."""
    if not reference_available():
        return
    assert kernels.chunk_pages(pages) == ref_chunks_identity(pages)


def test_chunker_overlap_compounds():
    # Three chunks: chunk 2's prefix must come from the ALREADY-prefixed
    # chunk 1 (the forward-walk quirk).
    paras = ["word%02d " % i * 800 for i in range(3)]  # each ~8*800 chars
    text = "\n\n".join(p.strip() for p in paras)
    chunks = kernels.chunk_full_text(text)
    assert len(chunks) >= 3
    for i in range(1, len(chunks)):
        prev_words = chunks[i - 1].split()
        assert chunks[i].split()[:10] == prev_words[-10:] or len(prev_words) < 10


def test_chunk_pieces_is_chunker_without_overlap():
    # chunk_full_text == chunk_pieces + compounding prefix pass; boundary
    # count and each piece's suffix position must agree (the driver's
    # chunk_boundaries oracle verifies chunk_pieces lengths, so this ties
    # the oracled function to the pipeline's actual chunker).
    text = "\n\n".join(
        ["alpha beta. gamma delta! " * 40, "x" * 900, "short one.", "tail " * 50]
    )
    pieces = kernels.chunk_pieces(text, chunk_size=450)
    full = kernels.chunk_full_text(text, chunk_size=450, overlap_words=10)
    assert len(pieces) == len(full) > 1
    assert full[0] == pieces[0]
    for i in range(1, len(full)):
        assert full[i].endswith(pieces[i])
        prefix_words = " ".join(full[i - 1].split()[-10:])
        assert full[i] == prefix_words + " " + pieces[i]


def test_chunker_trailing_join_quirk():
    # Remainder holding >1 sentence pieces is joined with "\n\n" even though
    # they were sentence-split (reference :569).
    para = ("s" * 4000 + ". ") + ("t" * 4000 + ". ") + ("u" * 100 + ".")
    chunks = kernels.chunk_full_text(para)
    assert any("\n\n" in c for c in chunks[-1:]) or len(chunks) == 1


# ---------------------------------------------------------------------------
# T3 token approximation
# ---------------------------------------------------------------------------

TOKEN_CASES = [
    "",
    "hello world",
    "NASA and IBM珠",
    "12345 67 8",
    "a-very-hyphenated-token",
    "antidisestablishmentarianism word",
    "Hello, world! How are you?",
    "ALLCAPS",
    "MiXeD CaSe 123abc",
    "  leading and trailing   ",
    "punct...!!!???",
    "word\nnewline\ttab",
]


@needs_reference
@pytest.mark.parametrize("s", TOKEN_CASES)
def test_approx_tokens_parity(s):
    assert kernels.approx_token_count(s) == ref_approximate_tokens(s)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=300))
def test_approx_tokens_property(s):
    if not reference_available():
        return
    assert kernels.approx_token_count(s) == ref_approximate_tokens(s)


# ---------------------------------------------------------------------------
# P3 header strip
# ---------------------------------------------------------------------------

HEADER_CASES = [
    "# Corrected text\nbody",
    "# Corrected text:body",
    "x\nCorrected texty",
    "Corrected text: body",
    "# Corrected text\n# Corrected text:\nCorrected textCorrected text: tail",
    "no header here",
    "",
]


@needs_reference
@pytest.mark.parametrize("s", HEADER_CASES)
def test_header_strip_parity(s):
    assert kernels.strip_correction_header(s) == ref_remove_header(s)


# ---------------------------------------------------------------------------
# T4/T6 token-budget chunker + overlap adjust
# ---------------------------------------------------------------------------

@needs_reference
def test_adjust_overlaps_parity_including_truncation_branch():
    counter = kernels.approx_token_count
    # big chunks so overlap + chunk exceeds the budget → truncation branch
    chunks = [" ".join("tok%d" % i for i in range(200)) for _ in range(3)]
    ours = kernels.adjust_overlaps(chunks, 150, counter, 50)
    theirs = ref_adjust_overlaps(chunks, counter, 150, 50)
    assert ours == theirs
    # and the non-truncating branch
    small = [" ".join("w%d" % i for i in range(30)) for _ in range(3)]
    assert kernels.adjust_overlaps(small, 10_000, counter, 50) == ref_adjust_overlaps(
        small, counter, 10_000, 50
    )


@needs_reference
def test_chunk_text_by_tokens_parity():
    text = " ".join("Sentence %d is here." % i for i in range(400))
    counter = kernels.approx_token_count
    assert kernels.chunk_text_by_tokens(text, 200, counter) == ref_chunk_text(
        text, 200, counter
    )


# ---------------------------------------------------------------------------
# Heuristic corrector (our deterministic provider — self-goldens)
# ---------------------------------------------------------------------------

def test_corrector_hyphen_repair():
    assert "correct" in kernels.correct_chunk_text("this is cor-\nrect now.")
    assert "correct" in kernels.correct_chunk_text("this is cor- rect now.")


def test_corrector_page_numbers_suppressed():
    out = kernels.correct_chunk_text("line one.\n~2-\nline two.")
    assert "~2-" not in out
    out2 = kernels.correct_chunk_text(
        "line one.\n~2-\nline two.", suppress_headers_and_page_numbers=False
    )
    assert "> ~2-" in out2


def test_corrector_unwraps_intra_sentence_breaks():
    out = kernels.correct_chunk_text("this line was\nhard wrapped mid sentence.")
    assert "\n" not in out


def test_corrector_keeps_paragraph_breaks():
    out = kernels.correct_chunk_text("Para one is here.\n\nPara two is here.")
    assert "\n\n" in out


def test_corrector_drops_duplicate_paragraphs():
    out = kernels.correct_chunk_text("Same para here.\n\nSame para here.\n\nOther.")
    assert out.count("Same para here.") == 1


def test_corrector_markdown_headings():
    out = kernels.correct_chunk_text("PENSIONS\n\nBody text here.")
    assert out.startswith("## PENSIONS")


def test_corrector_strips_llm_preamble():
    out = kernels.correct_chunk_text("Here is the corrected text:\nreal body.")
    assert not out.lower().startswith("here is")


def test_corrector_deterministic():
    text = "A test.\nwith wrap- ped words.\n\n~3-\n\nA test.\nwith wrap- ped words."
    assert kernels.correct_chunk_text(text) == kernels.correct_chunk_text(text)


HYPHEN_ALPHABET = list("abcdeXY -\n\t_0.")


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=st.sampled_from(HYPHEN_ALPHABET), max_size=120))
def test_fast_hyphen_scanners_equal_regex(s):
    from llm_aided_ocr_spark.kernels import (
        _HYPHEN_LINEBREAK_RE,
        _HYPHEN_SPACE_RE,
        _repair_linebreak_hyphen,
        _repair_space_hyphen,
    )

    assert _repair_linebreak_hyphen(s) == _HYPHEN_LINEBREAK_RE.sub(r"\1\2", s)
    assert _repair_space_hyphen(s) == _HYPHEN_SPACE_RE.sub(r"\1\2", s)


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=200))
def test_fast_hyphen_scanners_equal_regex_unicode(s):
    from llm_aided_ocr_spark.kernels import (
        _HYPHEN_LINEBREAK_RE,
        _HYPHEN_SPACE_RE,
        _repair_linebreak_hyphen,
        _repair_space_hyphen,
    )

    assert _repair_linebreak_hyphen(s) == _HYPHEN_LINEBREAK_RE.sub(r"\1\2", s)
    assert _repair_space_hyphen(s) == _HYPHEN_SPACE_RE.sub(r"\1\2", s)


def test_fast_hyphen_scanners_chained_splits():
    from llm_aided_ocr_spark.kernels import (
        _HYPHEN_LINEBREAK_RE,
        _HYPHEN_SPACE_RE,
        _repair_linebreak_hyphen,
        _repair_space_hyphen,
    )

    for s in ["cor-\nrect-\ned", "a- b- c", "x-\n y- z", "A- b", "ab- Cd",
              "-\na", "a-\n", "a- ", " - b", "w-  \n\t ord"]:
        assert _repair_linebreak_hyphen(s) == _HYPHEN_LINEBREAK_RE.sub(r"\1\2", s), s
        assert _repair_space_hyphen(s) == _HYPHEN_SPACE_RE.sub(r"\1\2", s), s


# ---------------------------------------------------------------------------
# F3 similarity filter + A4 quality
# ---------------------------------------------------------------------------

def test_similarity_filter_drops_hallucinations():
    original = "The pension plan has assets. Returns were strong this year."
    processed = (
        "The pension plan has assets. Returns were strong this year. "
        "Aliens landed on the moon yesterday zqx."
    )
    filtered, scores = kernels.filter_hallucinated_sentences(original, processed, 0.6)
    assert "Aliens" not in filtered
    assert len(scores) == 3


def test_similarity_filter_empty_inputs():
    assert kernels.filter_hallucinated_sentences("", "anything.")[0] == ""
    assert kernels.filter_hallucinated_sentences("orig.", "")[0] == ""


def test_quality_assess_roundtrip():
    resp = kernels.assess_quality_response("some text here", "some text here")
    score, expl = kernels.parse_quality_response(resp)
    assert score == 100
    assert expl
    assert kernels.parse_quality_response(None) == (None, None)
    assert kernels.parse_quality_response("garbage") == (None, None)


# ---------------------------------------------------------------------------
# HTML extraction
# ---------------------------------------------------------------------------

def test_extract_main_text_roundtrip():
    from llm_aided_ocr_spark.sources.synthetic import _wrap_html

    text = "Para one is here.\n\nPara two follows."
    assert kernels.extract_main_text(_wrap_html(text, "t")) == text


def test_extract_drops_boilerplate():
    html = (
        b"<html><head><title>T</title></head><body><nav>NAVSTUFF</nav>"
        b"<script>var x=1;</script><main><p>keep me</p></main>"
        b"<footer>FOOTSTUFF</footer></body></html>"
    )
    out = kernels.extract_main_text(html)
    assert out == "keep me"


def test_extract_no_main_falls_back_to_body():
    html = b"<html><body><p>alpha</p><p>beta</p></body></html>"
    assert kernels.extract_main_text(html) == "alpha\n\nbeta"


def test_extract_edge_cases():
    cases = [
        (b'<div title="a>b"><p>keep</p></div>', "keep"),
        (b"<div class='q>u'>v</div>", "v"),
        (b"<P>upper</P><BR><p>tags</p>", "upper\n\ntags"),
        (b"<p>a<br>b</p>", "a\nb"),
        (b"<p>a<br />b</p>", "a\nb"),
        (b"text with 5 > 3 math", "text with 5 > 3 math"),
        (b'<script>if (x > 1) { alert("<p>fake</p>") }</script><p>real</p>', "real"),
    ]
    for html, want in cases:
        assert kernels.extract_main_text(html) == want, html
    # invalid utf-8 must not crash
    assert isinstance(kernels.extract_main_text(b"\xff\xfe<p>x</p>"), str)


def test_extract_entities_and_empty():
    assert kernels.extract_main_text(b"<p>a &amp; b</p>") == "a & b"
    assert kernels.extract_main_text(None) == ""
    assert kernels.extract_main_text(b"") == ""


# ---------------------------------------------------------------------------
# T5 dead-code parity surface
# ---------------------------------------------------------------------------

def test_split_long_sentence_shape():
    words = " ".join("w%d" % i for i in range(100))
    parts = kernels.split_long_sentence(words, 20)
    assert " ".join(parts).split() == words.split()
