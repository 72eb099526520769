"""Job configuration.

The parameter surface mirrors the reference CLI's intended flags
(``/root/reference/llm-aided-ocr-cli.py:6-16``) — page range, markdown
toggle, header suppression, language gate, hallucination-filter threshold,
filter-test mode — plus the scale knobs the north rule requires (salted
partitioning, checkpointing). Unlike the reference (ambient ``.env`` read at
import, llm_aided_ocr.py:31), config here is constructed, never ambient.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    # --- reference-parity knobs (llm-aided-ocr-cli.py:6-16) ---
    max_pages: int = 0                   # 0 = all pages
    skip_first_n_pages: int = 0
    reformat_as_markdown: bool = True
    suppress_headers_and_page_numbers: bool = True
    check_if_valid_english: bool = False          # F2 language gate
    hallucination_similarity_threshold: float = 0.40  # F3
    adaptive_hallucination_threshold: bool = False    # v1 adaptive search
    test_filtering_hallucinations: bool = False       # report, don't apply
    # --- chunker constants (llm_aided_ocr.py:538) ---
    chunk_size_chars: int = 8000
    overlap_words: int = 10
    # --- correction provider ---
    provider: str = "heuristic"          # heuristic | identity (LLM providers pluggable)
    # --- v1 page filter thresholds (CHANGELOG.md:160, relaxed values) ---
    page_min_chars: int = 10
    page_min_words: int = 5
    apply_page_filter: bool = False
    apply_hallucination_filter: bool = False
    # --- scale knobs (north rule) ---
    salt: int = 0x5ABE                   # partition salt for url hashing
    num_partitions: int | None = None    # None → spark.sql.shuffle.partitions
    # Document-branch salted spread policy: "auto" applies the salted
    # repartition only when the input would otherwise scan on too few
    # partitions (toy tables, single row-groups); a size-uniform
    # splittable corpus scan skips the full-corpus shuffle (guide §2.4 —
    # measured ~27% of pipeline wall at the bench tier, identical
    # output). "always" restores the unconditional round-5 shuffle,
    # "never" disables it. The STAGED chunk path always salts on
    # (url, chunk_ix) — spreading a mega-document's chunks is the whole
    # point there, and chunking changes row sizes so scan uniformity
    # says nothing about it.
    salted_spread: str = "auto"          # auto | always | never
    mega_doc_chars: int = 4_000_000      # docs above this processed page-granular
    arrow_max_records_per_batch: int = 512
    # --- checkpointing ---
    warehouse_dir: str = "/tmp/ocr_spark_warehouse"
    run_id: str = "run0"
    checkpointing: bool = False
    stages_to_checkpoint: tuple = field(
        default=("extracted", "chunks", "corrected_chunks", "corrected_docs")
    )
