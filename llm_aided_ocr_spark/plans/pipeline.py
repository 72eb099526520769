"""End-to-end pipeline assembly (SURVEY.md §3.4).

    read pages → [lang gate] → [page filter] → salted repartition
      → extract → chunk → correct → assemble (+header strip)
      → [hallucination filter] → [quality assess]

Two physical strategies, byte-identical outputs:

* **fused** — chunk+correct+reassemble inside ONE ``mapInPandas`` pass per
  document: zero shuffles, embarrassingly parallel over documents. The
  right plan when the provider is cheap (heuristic) and documents are
  bounded — the common 100 TB case.
* **staged** — explicit chunk table → correction → ``groupBy(url)``
  reassembly (one shuffle): chunk-level load balancing for expensive
  providers and mega-documents, plus per-stage checkpoints.

``run_pipeline`` routes by document size: docs above
``cfg.mega_doc_chars`` take the staged path so one url cannot pin a task
(the north rule's mega-page skew handling); everything else is fused.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from llm_aided_ocr_spark.config import PipelineConfig
from llm_aided_ocr_spark.kernels import (
    assemble_chunks,
    chunk_full_text,
    strip_correction_header,
)
from llm_aided_ocr_spark.operators.assemble import assemble_documents
from llm_aided_ocr_spark.operators.chunker import chunk_documents
from llm_aided_ocr_spark.operators.correct import correct_chunks, get_provider
from llm_aided_ocr_spark.operators.extract import extract_text
from llm_aided_ocr_spark.operators.filters import apply_page_filter, language_gate
from llm_aided_ocr_spark.plans.checkpoint import CheckpointStore

RESULT_SCHEMA = "url string, raw_text string, corrected_text string, n_chunks int"


def salted_repartition(df: DataFrame, cfg: PipelineConfig, *extra_cols) -> DataFrame:
    """Salted-hash repartition on url (north rule). ``xxhash64(url, salt)``
    decorrelates placement from any upstream layout; extra columns (e.g.
    chunk_ix) spread a single mega-document across tasks."""
    n = cfg.num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    cols = [F.col("url"), F.lit(cfg.salt), *[F.col(c) for c in extra_cols]]
    return df.repartition(int(n), F.xxhash64(*cols))


def _spread_documents(
    df: DataFrame, cfg: PipelineConfig, gate_df: DataFrame | None = None
) -> DataFrame:
    """Scale-adaptive document spread (``cfg.salted_spread``): the
    per-document correction stage is embarrassingly parallel, so the
    salted repartition buys exactly one thing — parallelism when the
    input is under-split (a toy table's single row-group would serialize
    the Python kernel on one core). A splittable corpus scan is already
    size-uniform at ``maxPartitionBytes`` and mega-documents route to
    the staged path, so ``auto`` skips the full-corpus shuffle there
    (guide §2.4: remove shuffles outright; measured ~27% of pipeline
    wall at the 1.1 GB bench tier, byte-identical output) and applies
    the salted spread only below the :func:`scan_partitions_below`
    threshold — the same gate ensure_min_parallelism uses.

    ``gate_df``: the plan to JUDGE when ``df`` itself cannot be (the
    auto strategy hands branches of a persisted relation, and
    ``inputFiles()`` on an InMemoryRelation is empty — the gate would
    conservatively skip the spread a toy input needs); pass the
    pre-persist source so the file-size estimate still sees the scan."""
    mode = getattr(cfg, "salted_spread", "always")
    if mode == "never":
        return df
    if mode == "auto":
        from llm_aided_ocr_spark.operators.util import scan_partitions_below

        target = df.sparkSession.sparkContext.defaultParallelism
        if not scan_partitions_below(
            gate_df if gate_df is not None else df, max(1, target // 2)
        ):
            return df
    return salted_repartition(df, cfg)


def _fused_correct(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Document rows → result rows in one narrow pass (no shuffle).

    Arrow-native (``mapInArrow``): the kernel needs plain Python strings
    either way, but building the output as a RecordBatch directly skips
    the pandas block-manager round-trip on BOTH sides of the boundary
    (guide §4.2) and passes the url column through as the input's own
    Arrow array, zero-copy. Measured PARITY with the pandas form at the
    bench tier (best-of-7 3.404 s vs 3.401 s — the pass is
    DRAM/kernel-bound there); kept because the avoided per-batch
    object-array materialization grows with batch width and payload
    size, and output is proven byte-identical (count / corrected-byte /
    chunk / crc32-of-corrected / crc32-of-raw all equal over 320k
    docs)."""

    def _process(batches):
        import pyarrow as pa

        fn = get_provider(cfg.provider)
        md = cfg.reformat_as_markdown
        sup = cfg.suppress_headers_and_page_numbers
        for batch in batches:
            texts = batch.column("extracted_text").to_pylist()
            raws, outs, ns = [], [], []
            for text in texts:
                text = text if text is not None else ""
                chunks = chunk_full_text(
                    text, chunk_size=cfg.chunk_size_chars, overlap_words=cfg.overlap_words
                )
                corrected = assemble_chunks([fn(c, md, sup) for c in chunks])
                raws.append(text)
                outs.append(strip_correction_header(corrected))
                ns.append(len(chunks))
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("url"),
                    pa.array(raws, pa.string()),
                    pa.array(outs, pa.string()),
                    pa.array(ns, pa.int32()),
                ],
                names=["url", "raw_text", "corrected_text", "n_chunks"],
            )

    return df.select("url", "extracted_text").mapInArrow(_process, schema=RESULT_SCHEMA)


def _staged_correct(
    df: DataFrame, cfg: PipelineConfig, store: Optional[CheckpointStore] = None
) -> DataFrame:
    """Explicit chunk-table path with optional per-stage checkpoints."""
    chunks = chunk_documents(
        df, chunk_size=cfg.chunk_size_chars, overlap_words=cfg.overlap_words
    )
    # Spread chunks of one document across tasks (mega-doc skew handling).
    chunks = salted_repartition(chunks, cfg, "chunk_ix")
    if store is not None and cfg.checkpointing and "chunks" in cfg.stages_to_checkpoint:
        # return_committed=False: continue from THIS increment only — the
        # committed table holds prior runs' chunks, which must not be
        # re-corrected and re-appended on resume.
        chunks = store.write(chunks, "chunks", counted_col="chunk", return_committed=False)
    corrected = correct_chunks(
        chunks,
        provider=cfg.provider,
        reformat_as_markdown=cfg.reformat_as_markdown,
        suppress_headers_and_page_numbers=cfg.suppress_headers_and_page_numbers,
    )
    if (
        store is not None
        and cfg.checkpointing
        and "corrected_chunks" in cfg.stages_to_checkpoint
    ):
        corrected = store.write(
            corrected, "corrected_chunks", counted_col="corrected", return_committed=False
        )
    docs = assemble_documents(corrected, strip_header=True)
    raw = df.select("url", F.col("extracted_text").alias("raw_text"))
    # Equi-join on url; both sides already url-partitioned → AQE plans it.
    return docs.join(raw, on="url", how="inner").select(
        "url", "raw_text", "corrected_text", "n_chunks"
    )


FILTERED_SCHEMA = (
    "url string, raw_text string, corrected_text string, n_chunks int, "
    "n_sentences int, n_kept int, min_score double, threshold_used double"
)


def _apply_similarity_filter(result: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """F3 over the pipeline result in ONE narrow passthrough pass (no
    self-join — joining the result with a filter of itself would execute
    the whole upstream pipeline twice). ``test_filtering_hallucinations``
    (reference CLI --test-filtering) reports verdicts without applying
    them to the text."""
    from llm_aided_ocr_spark.kernels import (
        adaptive_similarity_threshold,
        filter_hallucinated_sentences,
    )

    threshold = cfg.hallucination_similarity_threshold
    adaptive = cfg.adaptive_hallucination_threshold
    test_only = cfg.test_filtering_hallucinations

    def _filter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            texts, n_s, n_k, mins, ths = [], [], [], [], []
            for orig, proc in zip(batch["raw_text"], batch["corrected_text"]):
                orig, proc = orig or "", proc or ""
                t = (
                    adaptive_similarity_threshold(orig, proc, threshold)
                    if adaptive
                    else threshold
                )
                filtered, scores = filter_hallucinated_sentences(orig, proc, t)
                texts.append(proc if test_only else filtered)
                n_s.append(len(scores))
                n_k.append(sum(1 for s in scores if s >= t))
                mins.append(min(scores) if scores else 1.0)
                ths.append(t)
            out = batch[["url", "raw_text", "n_chunks"]].copy()
            out["corrected_text"] = texts
            out["n_sentences"] = n_s
            out["n_kept"] = n_k
            out["min_score"] = mins
            out["threshold_used"] = ths
            yield out[
                ["url", "raw_text", "corrected_text", "n_chunks",
                 "n_sentences", "n_kept", "min_score", "threshold_used"]
            ]

    return result.mapInPandas(_filter, schema=FILTERED_SCHEMA)


def run_pipeline(
    pages_df: DataFrame,
    cfg: PipelineConfig = PipelineConfig(),
    store: Optional[CheckpointStore] = None,
    use_html: bool = False,
    strategy: str = "auto",
    validate_unique_urls: bool = False,
    extract_fn: Optional[Callable[[DataFrame], DataFrame]] = None,
) -> DataFrame:
    """Full pipeline: pages table in, corrected documents out.

    ``extract_fn`` swaps the extraction stage (default: the regex DOM
    strip via ``extract_text``) for an injected one — e.g.
    ``operators.extract.density_extract_stage()`` for block-level
    link-density selection. Contract: pages relation in,
    ``EXTRACTED_SCHEMA`` (url, warc_ts, lang, extracted_text) out.
    When given, it owns html handling and ``use_html`` is ignored for
    the stage itself (the auto strategy still routes on the source
    column's size).

    ``strategy``: ``"fused"`` | ``"staged"`` | ``"auto"`` (size-routed).
    With a ``store`` and ``cfg.checkpointing``, already-completed documents
    (present in the ``corrected_docs`` stage) are skipped via anti-join and
    the increment is appended — the resume path.

    PRECONDITION: ``url`` is the document identity and must be unique —
    the staged path's ``groupBy(url)`` reassembly would merge chunk
    sequences of distinct rows sharing a url into one garbled document.
    ``validate_unique_urls=True`` enforces this with a count-vs-distinct
    check (one extra aggregation job) and raises on violation.
    """
    if validate_unique_urls:
        counts = pages_df.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(F.col("url")).alias("d"),
        ).first()
        if counts["n"] != counts["d"]:
            raise ValueError(
                f"input has {counts['n']} rows but {counts['d']} distinct urls; "
                "url must uniquely identify a document"
            )

    df = pages_df
    pinned: list[DataFrame] = []
    if cfg.check_if_valid_english:
        df = language_gate(df)

    if store is not None and cfg.checkpointing:
        df = store.remaining(df, "corrected_docs", key="url")

    source_col = "html" if use_html else "text"

    def _prepare(
        branch: DataFrame, gate_df: DataFrame | None = None
    ) -> DataFrame:
        if extract_fn is not None:
            out = extract_fn(branch)
        else:
            out = extract_text(branch, use_html=use_html)
        if cfg.apply_page_filter:
            out = apply_page_filter(
                out, min_chars=cfg.page_min_chars, min_words=cfg.page_min_words
            )
        return _spread_documents(out, cfg, gate_df=gate_df)

    if strategy == "fused":
        result = _fused_correct(_prepare(df), cfg)
    elif strategy == "staged":
        result = _staged_correct(_prepare(df), cfg, store)
    else:
        # auto: size-routed skew handling from ONE source scan. The two
        # branches are two consumers of the same relation; filtering the
        # raw source twice would read every text byte from parquet twice
        # (the length predicate cannot push down to the scan). Instead:
        # prune to exactly the columns the pipeline consumes and persist
        # that routed relation — the parquet source is scanned once to
        # populate the cache and both branches filter the cached copy
        # (MEMORY_AND_DISK: partitions spill to executor-local disk at
        # 100 TB, which beats a second remote scan; the ContextCleaner
        # releases the blocks when the plan is garbage-collected).
        from pyspark import StorageLevel

        # The routing size is computed ONCE at cache build and stored as
        # an int column: both branch filters would otherwise re-run
        # length() over every cached payload — an O(bytes) UTF8 scan of
        # the whole corpus per branch (measured 0.65 s of the bench
        # pipeline's wall on a corpus with ZERO mega docs). Filtering on
        # the cached int also lets the in-memory scan's per-batch
        # min/max stats prune whole batches for the branch they cannot
        # feed, so the mega branch of a mega-free corpus (and the fused
        # branch's share of a mega-heavy one) never decompresses text
        # it will drop.
        size = F.length(
            F.coalesce(
                F.col(source_col),
                F.lit("").cast("binary") if use_html else F.lit(""),
            )
        )
        routed = df.select(
            "url", "warc_ts", "lang", source_col,
            size.cast("bigint").alias("_ocr_route_sz"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        pinned.append(routed)
        sz = F.col("_ocr_route_sz")
        small = routed.filter(sz <= cfg.mega_doc_chars).drop("_ocr_route_sz")
        big = routed.filter(sz > cfg.mega_doc_chars).drop("_ocr_route_sz")
        # the branches filter the PERSISTED routed relation, whose plan
        # no longer exposes inputFiles(); judge the spread gate on the
        # pre-persist source plan instead
        result = _fused_correct(_prepare(small, gate_df=df), cfg).unionByName(
            _staged_correct(_prepare(big, gate_df=df), cfg, store)
        )

    if cfg.apply_hallucination_filter:
        result = _apply_similarity_filter(result, cfg)

    if store is not None and cfg.checkpointing:
        result = store.write(
            result, "corrected_docs", mode="append", counted_col="corrected_text"
        )
    # explicit persist lifecycle: the auto strategy's routed cache is pinned
    # on the RESULT so callers release it deterministically once their
    # terminal action completes (release_pipeline_cache), instead of leaning
    # on ContextCleaner GC — which in a long-lived session pins executor
    # memory/disk ≈ pruned-corpus size until the plan object is collected.
    result._ocr_spark_pinned = pinned  # type: ignore[attr-defined]
    return result


def release_pipeline_cache(result: DataFrame, blocking: bool = True) -> int:
    """Unpersist every relation :func:`run_pipeline` pinned for ``result``
    (the auto strategy's routed corpus cache). Call AFTER the terminal
    action (write/collect) on ``result`` — the cache exists precisely so the
    two routing branches share one source scan during that action. Returns
    the number of relations released. Safe to call on any DataFrame (no-op
    when nothing is pinned) and idempotent.

    The same contract covers every operator with an internal cache
    (ngram/minhash/simhash pairs, embedding near-dup, fingerprint
    matches): their results carry the pin, and
    ``operators.util.release_pinned`` (this function's generic form)
    releases them."""
    from llm_aided_ocr_spark.operators.util import release_pinned

    return release_pinned(result, blocking=blocking)
