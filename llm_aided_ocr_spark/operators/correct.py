"""Stage 3 — per-chunk correction via a pluggable provider.

Mirrors the reference's ``generate_completion`` dispatch
(llm_aided_ocr.py:156-165): a registry keyed by provider name. The default
``heuristic`` provider is the deterministic engine the byte-identity goldens
freeze; ``identity`` reproduces the reference's deterministic skeleton; real
LLM providers would register here and initialize an executor-local client
lazily (the Spark analogue of the FileLock-guarded model bootstrap at
llm_aided_ocr.py:81-103).

Runs as ``mapInPandas`` over chunk rows — narrow, zero shuffle; Spark task
parallelism is the reference's asyncio.gather (its parallel path passes
``prev_context=""`` for every chunk, llm_aided_ocr.py:526, which is the
license for embarrassing parallelism).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator

import pandas as pd
from pyspark.sql import DataFrame

from llm_aided_ocr_spark.kernels import correct_chunk_text, identity_correct

ChunkCorrector = Callable[[str, bool, bool], str]

_PROVIDERS: Dict[str, ChunkCorrector] = {}


def register_provider(name: str, fn: ChunkCorrector) -> None:
    _PROVIDERS[name] = fn


def get_provider(name: str) -> ChunkCorrector:
    try:
        return _PROVIDERS[name]
    except KeyError:
        raise ValueError(
            f"Unknown correction provider {name!r}; registered: {sorted(_PROVIDERS)}"
        ) from None


register_provider("identity", lambda c, *_: identity_correct(c))
register_provider(
    "heuristic",
    lambda c, md, sup: correct_chunk_text(
        c, reformat_as_markdown=md, suppress_headers_and_page_numbers=sup
    ),
)

CORRECTED_SCHEMA = "url string, chunk_ix int, n_chunks int, corrected string"


def correct_chunks(
    chunks_df: DataFrame,
    provider: str = "heuristic",
    reformat_as_markdown: bool = True,
    suppress_headers_and_page_numbers: bool = True,
) -> DataFrame:
    """``(url, chunk_ix, n_chunks, chunk)`` → ``(url, chunk_ix, n_chunks,
    corrected)``."""

    def _correct(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Provider resolved once per task (executor-local), not per row.
        fn = get_provider(provider)
        for batch in batches:
            out = batch[["url", "chunk_ix", "n_chunks"]].copy()
            out["corrected"] = [
                fn(
                    c if c is not None else "",
                    reformat_as_markdown,
                    suppress_headers_and_page_numbers,
                )
                for c in batch["chunk"]
            ]
            yield out

    return chunks_df.mapInPandas(_correct, schema=CORRECTED_SCHEMA)
