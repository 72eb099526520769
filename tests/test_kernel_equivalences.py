"""Property tests pinning the optimized kernel primitives to their
original (regex/spec) formulations — the optimizations in kernels.py are
only admissible while these hold bit-for-bit."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

import llm_aided_ocr_spark.kernels as K

_SENTENCE_CHARS = st.text(
    alphabet="abcXYZ .!?:;'\")][(\n\t-0123456789•*", max_size=60
)


@settings(max_examples=300, deadline=None)
@given(_SENTENCE_CHARS)
def test_ends_sentence_matches_regex(s):
    assert K._ends_sentence(s) == bool(K._SENT_END_RE.search(s))


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="ABCXYZabcxyz0123456789 ,.'&-\t", max_size=95))
def test_heading_prefilter_matches_regex(s):
    assert K._is_heading_line(s) == bool(K._HEADING_LINE_RE.match(s.strip()))


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="ab \t\n\r\x0b\x0cAB", max_size=40))
def test_dup_key_split_matches_regex_sub(s):
    ws = re.compile(r"\s+")
    assert ws.sub(" ", s).strip().lower() == " ".join(s.split()).lower()


def _ref_unwrap(paragraph: str) -> str:
    """The original _unwrap_paragraph formulation (regex checks inline,
    no caching) — the semantic spec the optimized version must match."""
    lines = [ln.rstrip() for ln in paragraph.split("\n")]
    out = []
    for ln in lines:
        stripped = ln.strip()
        if not stripped:
            continue
        starts_item = bool(K._LIST_ITEM_RE.match(stripped))
        if (
            out
            and not bool(K._HEADING_LINE_RE.match(stripped.strip()))
            and not starts_item
            and not bool(K._HEADING_LINE_RE.match(out[-1].strip()))
            and not K._SENT_END_RE.search(out[-1])
        ):
            out[-1] = out[-1] + " " + stripped
        else:
            out.append(stripped)
    return "\n".join(out)


_LINE = st.sampled_from([
    "THE QUICK FOX", "AB", "A", "word one two.", "lower text", "1. item",
    "- bullet", "MID HEAD,", "tail?'", "x", "NOT'S OK-", "ends;)", "P",
    "* star", "QY", "", "  ", "Mixed Case Line", "ALL CAPS WITH 123",
])


@settings(max_examples=300, deadline=None)
@given(st.lists(_LINE, max_size=8))
def test_unwrap_matches_original_formulation(lines):
    para = "\n".join(lines)
    assert K._unwrap_paragraph(para) == _ref_unwrap(para)
