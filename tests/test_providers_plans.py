"""Provider plumbing (C3-C6), sequential-context mode, adaptive F3, and
plan-quality regression checks (pushdown / no stray Python stages)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from llm_aided_ocr_spark.kernels import approx_token_count


# ---------------------------------------------------------------------------
# Providers
# ---------------------------------------------------------------------------

def test_provider_clamps_max_tokens():
    from llm_aided_ocr_spark.operators.providers import (
        CompletionProvider,
        TOKEN_BUFFER,
    )

    calls = []

    def transport(prompt, max_tokens):
        calls.append((prompt, max_tokens))
        return "OUT"

    p = CompletionProvider("t", 4096, transport, approx_token_count)
    prompt = "hello world"
    assert p.complete(prompt, max_tokens=5000) == "OUT"
    (seen_prompt, seen_max), = calls
    assert seen_prompt == prompt
    assert seen_max == 4096 - approx_token_count(prompt) - TOKEN_BUFFER


def test_provider_too_long_falls_back_to_chunking():
    from llm_aided_ocr_spark.operators.providers import CompletionProvider

    calls = []

    def transport(prompt, max_tokens):
        calls.append(prompt)
        return f"R{len(calls)}"

    p = CompletionProvider("t", 100, transport, approx_token_count)
    long_prompt = " ".join(f"Sentence number {i} is right here." for i in range(200))
    out = p.complete(long_prompt, max_tokens=50)
    assert len(calls) > 1, "prompt must have been re-chunked"
    assert out == " ".join(f"R{i + 1}" for i in range(len(calls)))


def test_provider_none_propagation():
    from llm_aided_ocr_spark.operators.providers import CompletionProvider

    p = CompletionProvider("t", 100, lambda *_: None, approx_token_count)
    long_prompt = " ".join(f"Sentence number {i} is right here." for i in range(200))
    assert p.complete(long_prompt) is None


def test_unconfigured_providers_raise():
    from llm_aided_ocr_spark.operators.providers import (
        make_claude_provider,
        make_local_llm_provider,
        make_openai_provider,
    )

    for make in (make_claude_provider, make_openai_provider, make_local_llm_provider):
        with pytest.raises(NotImplementedError):
            make().complete("hi")


def test_estimate_tokens_falls_back_to_approx():
    from llm_aided_ocr_spark.operators.providers import estimate_tokens

    s = "hello there friend"
    # no tokenizer SDKs in the sandbox → must equal the T3 approximation
    assert estimate_tokens(s, "gpt-4o-mini") == approx_token_count(s)
    assert estimate_tokens(s, "claude-3-haiku") == approx_token_count(s)
    assert estimate_tokens(s, "unknown-model") == approx_token_count(s)


def test_executor_local_singleton():
    from llm_aided_ocr_spark.operators.providers import executor_local

    count = [0]

    def factory():
        count[0] += 1
        return object()

    a = executor_local("res_test", factory)
    b = executor_local("res_test", factory)
    assert a is b and count[0] == 1


# ---------------------------------------------------------------------------
# Sequential-context correction
# ---------------------------------------------------------------------------

def test_sequential_matches_parallel_for_context_free_provider(spark):
    from llm_aided_ocr_spark.operators.chunker import chunk_documents
    from llm_aided_ocr_spark.operators.correct import (
        correct_chunks,
        correct_chunks_sequential,
    )
    from llm_aided_ocr_spark.sources.synthetic import pages_dataframe

    pages = pages_dataframe(spark, n_rows=8, include_golden=True)
    chunks = chunk_documents(
        pages.selectExpr("url", "text as extracted_text")
    ).cache()
    par = {(r["url"], r["chunk_ix"]): r["corrected"]
           for r in correct_chunks(chunks, provider="heuristic").collect()}
    seq = {(r["url"], r["chunk_ix"]): r["corrected"]
           for r in correct_chunks_sequential(chunks, provider="heuristic").collect()}
    assert par == seq


# ---------------------------------------------------------------------------
# Adaptive F3
# ---------------------------------------------------------------------------

def test_adaptive_hallucination_filter(spark):
    from llm_aided_ocr_spark.operators.filters import hallucination_filter

    orig = "The pension plan has assets. Returns were strong this year."
    halluc = orig + " Zebras vote quarterly on moon tariffs zqxwv."
    df = spark.createDataFrame(
        [("u0", orig, halluc), ("u1", orig, orig)],
        "url string, raw_text string, corrected_text string",
    )
    out = {r["url"]: r.asDict() for r in hallucination_filter(df, adaptive=True).collect()}
    assert "Zebras" not in out["u0"]["filtered_text"]
    assert out["u0"]["threshold_used"] >= 0.40
    assert out["u1"]["n_kept"] == out["u1"]["n_sentences"]


# ---------------------------------------------------------------------------
# Plan-quality regression checks
# ---------------------------------------------------------------------------

def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_lang_filter_pushes_down(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = docs.filter(F.col("lang") == "en").select("doc_id", "n_chars")
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan
    assert "ReadSchema: struct<doc_id:bigint,lang:string,n_chars:bigint>" in plan


def test_native_queries_have_no_python_stage(spark):
    """Token estimation, header strip, quality score, fingerprints must
    stay JVM-side — no ArrowEvalPython/BatchEvalPython in the plan."""
    import __spark_entry__ as e

    for name in ("token_estimates", "header_strip", "token_counts",
                 "lang_id_counts", "quality_features", "fingerprints"):
        df = e.queries()[name](spark, "/root/testdata/sf0.001")
        plan = _plan(df)
        assert "EvalPython" not in plan, f"{name} fell off the JVM path"
        assert "PythonUDF" not in plan, f"{name} fell off the JVM path"


def test_ann_broadcasts_queries(spark):
    import __spark_entry__ as e

    plan = _plan(e.queries()["ann_topk"](spark, "/root/testdata/sf0.001"))
    assert "Broadcast" in plan, "query side of ANN top-k must broadcast"


def test_column_pruning_reaches_scan(spark):
    import __spark_entry__ as e

    plan = _plan(e.queries()["lang_gate_counts"](spark, "/root/testdata/sf0.001"))
    # only lang + n_chars must be read, not text
    assert "text" not in plan.split("ReadSchema:")[1].split("\n")[0]