"""Load the reference implementation (/root/reference/llm_aided_ocr.py) as a
runnable byte-parity oracle, WITHOUT copying any of its code into this repo.

The reference imports heavy native deps (pdf2image, pytesseract, llama_cpp,
cv2, tiktoken, transformers, openai, anthropic, decouple, filelock, PIL) and
reads a ``.env`` at import time. None of that touches the deterministic text
path we need (process_document / approximate_tokens / adjust_overlaps /
remove_corrected_text_header), so we exec the source with stub modules in
place and drive only the deterministic functions, patching the LLM stage to
identity.

Tests that use this oracle skip automatically when /root/reference is absent.
"""

from __future__ import annotations

import asyncio
import os
import sys
import types
from typing import List, Optional

REFERENCE_PATH = "/root/reference/llm_aided_ocr.py"


def _stub_module(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


class _AnyCallable:
    def __init__(self, *a, **k):
        pass

    def __call__(self, *a, **k):
        return self

    def __getattr__(self, _name):
        return _AnyCallable()


def _install_stubs() -> dict:
    saved = {}

    class _FakeConfig:
        def __init__(self, *a, **k):
            pass

        def get(self, key, default=None, cast=None):
            return default

    stubs = {
        "pdf2image": _stub_module("pdf2image", convert_from_path=_AnyCallable()),
        "pytesseract": _stub_module(
            "pytesseract",
            image_to_string=lambda *a, **k: "",
            get_tesseract_version=lambda: "0",
        ),
        "llama_cpp": _stub_module(
            "llama_cpp", Llama=_AnyCallable, LlamaGrammar=_AnyCallable
        ),
        "tiktoken": _stub_module(
            "tiktoken",
            encoding_for_model=lambda *_: (_ for _ in ()).throw(RuntimeError("stub")),
        ),
        "PIL": _stub_module("PIL", Image=_stub_module("PIL.Image", Image=object, fromarray=lambda a: a)),
        "PIL.Image": _stub_module("PIL.Image", Image=object, fromarray=lambda a: a),
        "decouple": _stub_module(
            "decouple", Config=_FakeConfig, RepositoryEnv=lambda *_a, **_k: None
        ),
        "cv2": _stub_module("cv2"),
        "filelock": _stub_module(
            "filelock", FileLock=_AnyCallable, Timeout=type("Timeout", (Exception,), {})
        ),
        "transformers": _stub_module(
            "transformers",
            AutoTokenizer=_stub_module("AutoTokenizer"),
        ),
        "openai": _stub_module("openai", AsyncOpenAI=_AnyCallable),
        "anthropic": _stub_module("anthropic", AsyncAnthropic=_AnyCallable),
    }
    for name, mod in stubs.items():
        saved[name] = sys.modules.get(name)
        sys.modules[name] = mod
    return saved


_NAMESPACE: Optional[dict] = None


def reference_available() -> bool:
    return os.path.exists(REFERENCE_PATH)


def load_reference() -> dict:
    """Exec the reference source once; return its namespace."""
    global _NAMESPACE
    if _NAMESPACE is not None:
        return _NAMESPACE
    if not reference_available():
        raise FileNotFoundError(REFERENCE_PATH)
    saved = _install_stubs()
    try:
        with open(REFERENCE_PATH, "r", encoding="utf-8") as f:
            src = f.read()
        ns: dict = {"__name__": "reference_llm_aided_ocr", "__file__": REFERENCE_PATH}
        exec(compile(src, REFERENCE_PATH, "exec"), ns)  # noqa: S102 — test oracle
        _NAMESPACE = ns
        return ns
    finally:
        for name, mod in saved.items():
            if mod is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = mod


def ref_process_document_identity(pages: List[str]) -> str:
    """Run the reference's process_document with the LLM stage patched to
    identity — yields the deterministic skeleton output (chunk → reassemble)."""
    ns = load_reference()

    async def _identity_process_chunks(chunks, *_a, **_k):
        return list(chunks)

    orig = ns["process_chunks"]
    ns["process_chunks"] = _identity_process_chunks
    try:
        return asyncio.run(ns["process_document"](pages, True, True))
    finally:
        ns["process_chunks"] = orig


def ref_chunks_identity(pages: List[str]) -> List[str]:
    """Capture the exact chunk list the reference's chunker produces."""
    ns = load_reference()
    captured: List[str] = []

    async def _capture(chunks, *_a, **_k):
        captured.extend(chunks)
        return list(chunks)

    orig = ns["process_chunks"]
    ns["process_chunks"] = _capture
    try:
        asyncio.run(ns["process_document"](pages, True, True))
    finally:
        ns["process_chunks"] = orig
    return captured


def ref_approximate_tokens(text: str) -> int:
    return load_reference()["approximate_tokens"](text)


def ref_remove_header(text: str) -> str:
    return load_reference()["remove_corrected_text_header"](text)


def ref_adjust_overlaps(chunks, counter, max_tokens, overlap=50):
    class _Tok:
        def encode(self, s):
            return [0] * counter(s)

    return load_reference()["adjust_overlaps"](chunks, _Tok(), max_tokens, overlap)


def ref_chunk_text(text, max_tokens, counter):
    """Drive the reference chunk_text with a fake tokenizer registry."""
    ns = load_reference()

    class _Tok:
        def encode(self, s):
            return [0] * counter(s)

    orig = ns["get_tokenizer"]
    ns["get_tokenizer"] = lambda _name: _Tok()
    try:
        return ns["chunk_text"](text, max_tokens, "stub-model")
    finally:
        ns["get_tokenizer"] = orig
