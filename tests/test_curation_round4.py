"""Round-4 curation additions: keep-first paragraph dedup, C4 line
cleaning, PII redaction, hashed linear quality classifier."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# ---------------------------------------------------------------------------
# paragraph_dedup
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def para_df(spark):
    rows = [
        (1, "alpha beta\n\nshared para\n\n \n\nunique one"),
        (2, "shared para\n\ngamma delta\n\nshared para"),
        (3, "alpha beta\n\n\n\nepsilon"),
        (4, None),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_paragraph_dedup_keeps_first_occurrence_corpus_wide(para_df):
    from llm_aided_ocr_spark.operators.dedup import paragraph_dedup

    out = {
        r.doc_id: r.text
        for r in paragraph_dedup(para_df, hash_family="md5_52").collect()
    }
    # doc 1 is first everywhere: survives byte-identically (incl. the
    # whitespace layout paragraph)
    assert out[1] == "alpha beta\n\nshared para\n\n \n\nunique one"
    # doc 2: both copies of "shared para" lose to doc 1's
    assert out[2] == "gamma delta"
    # doc 3: "alpha beta" is a repeat; the empty layout paragraph from
    # the 4-newline separator is preserved
    assert out[3] == "\n\nepsilon"
    assert out[4] == ""


def test_paragraph_dedup_intra_document_repeat_dropped(spark):
    from llm_aided_ocr_spark.operators.dedup import paragraph_dedup

    df = spark.createDataFrame(
        [(1, "same para\n\nmiddle bit\n\nsame para")],
        "doc_id bigint, text string",
    )
    (row,) = paragraph_dedup(df).collect()
    assert row.text == "same para\n\nmiddle bit"


def test_paragraph_dedup_trim_insensitive_match_keeps_first_bytes(spark):
    from llm_aided_ocr_spark.operators.dedup import paragraph_dedup

    df = spark.createDataFrame(
        [(1, "  padded para  "), (2, "padded para")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r.text for r in paragraph_dedup(df).collect()}
    # matching is on TRIMMED text; the first occurrence keeps its raw bytes
    assert out[1] == "  padded para  "
    assert out[2] == ""


def test_paragraph_dedup_stats_counts_and_bytes(para_df):
    from llm_aided_ocr_spark.operators.dedup import paragraph_dedup_stats

    out = {r.id: r for r in paragraph_dedup_stats(para_df).collect()}
    assert (out[1].n_paras, out[1].n_kept) == (3, 3)
    assert (out[2].n_paras, out[2].n_kept) == (3, 1)
    assert out[2].clean_md5 == _md5("gamma delta")
    assert (out[4].n_paras, out[4].n_kept, out[4].clean_len) == (0, 0, 0)


def test_paragraph_dedup_hash_families_agree(para_df):
    from llm_aided_ocr_spark.operators.dedup import paragraph_dedup_stats

    a = sorted(map(tuple, paragraph_dedup_stats(para_df, hash_family="xxhash64").collect()))
    b = sorted(map(tuple, paragraph_dedup_stats(para_df, hash_family="md5_52").collect()))
    assert a == b


# ---------------------------------------------------------------------------
# c4_clean
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def c4_df(spark):
    rows = [
        # keep=True: 3 kept lines, >=3 sentences, no lorem/brace
        (1, "This is a perfectly fine sentence of prose.\nshort line\n"
            "Another good long sentence right here!\n"
            "Enable javascript to view this page today.\n"
            "And a third full sentence to pass the gate."),
        # lorem ipsum anywhere on the page kills it
        (2, "Lorem ipsum dolor sit amet consectetur adipiscing.\n"
            "This otherwise fine sentence will not save it.\n"
            "A third sentence is here for the count too."),
        # curly bracket anywhere on the page kills it
        (3, "var x = 1;\nSee the { bracket } in this long sentence.\n"
            "Second proper sentence for the page gate here.\n"
            "Third proper sentence for the page gate here."),
        # line rules: trimming, terminal punctuation, 5-word minimum
        (4, "  Trimmed line with five words exactly here.  \n"
            "no terminal punctuation on this line\n"
            "Too short.\n"
            "Ending with a question mark works just fine?\n"
            'Quoted endings also count as terminals he said."'),
        (5, None),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_c4_line_rules_and_page_gate(c4_df):
    from llm_aided_ocr_spark.operators.boilerplate import c4_clean_stats

    out = {r.id: r for r in c4_clean_stats(c4_df).collect()}
    assert (out[1].n_lines, out[1].n_kept, out[1].keep) == (5, 3, True)
    assert out[2].keep is False          # lorem ipsum
    assert out[3].keep is False          # curly bracket
    assert (out[4].n_kept, out[4].keep) == (3, True)
    assert (out[5].n_kept, out[5].keep, out[5].clean_len) == (0, False, 0)


def test_c4_rebuild_is_trimmed_bytes(c4_df):
    from llm_aided_ocr_spark.operators.boilerplate import c4_clean_stats

    out = {r.id: r for r in c4_clean_stats(c4_df).collect()}
    expect = (
        "Trimmed line with five words exactly here.\n"
        "Ending with a question mark works just fine?\n"
        'Quoted endings also count as terminals he said."'
    )
    assert out[4].clean_md5 == _md5(expect)
    assert out[4].clean_len == len(expect)


def test_c4_min_sentences_gate(spark):
    from llm_aided_ocr_spark.operators.boilerplate import c4_clean_stats

    df = spark.createDataFrame(
        [(1, "Only one proper sentence lives on this page.")],
        "doc_id bigint, text string",
    )
    (row,) = c4_clean_stats(df).collect()
    assert row.n_kept == 1 and row.n_sent == 1 and row.keep is False


def test_c4_clean_flags_not_drops(c4_df):
    from llm_aided_ocr_spark.operators.boilerplate import c4_clean

    out = c4_clean(c4_df)
    assert out.count() == c4_df.count()  # flagged, never dropped
    assert "c4_keep" in out.columns


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

def test_pii_redaction_bytes_and_counts(spark):
    from llm_aided_ocr_spark.operators.pii import pii_stats, redact_pii

    rows = [
        (1, "Reach jane.doe+test@example.co.uk at work."),
        (2, "Server 10.2.255.14 and backup 192.168.0.1 are up."),
        (3, "Call +1 (555) 012-3456 or +44 20 7946 0958 now."),
        (4, "No pii: year 2024, version 1.2.3, fraction 1/2."),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    red = {r.doc_id: r for r in redact_pii(df).collect()}
    assert red[1].text == "Reach <EMAIL> at work."
    assert red[2].text == "Server <IP> and backup <IP> are up."
    assert red[3].text == "Call <PHONE> or <PHONE> now."
    # version numbers / years are NOT eaten (3-group dotted, no + prefix)
    assert red[4].text == rows[3][1]
    assert red[5].text == ""
    st = {r.id: r for r in pii_stats(df).collect()}
    assert (st[1].n_email, st[2].n_ip, st[3].n_phone) == (1, 2, 2)
    assert (st[4].n_email, st[4].n_ip, st[4].n_phone) == (0, 0, 0)


def test_pii_counts_measured_on_original_text(spark):
    from llm_aided_ocr_spark.operators.pii import pii_stats

    # the email's redaction must not hide the IP count and vice versa
    df = spark.createDataFrame(
        [(1, "bob@site.org then 8.8.8.8 then +33 1 23 45 67 89.")],
        "doc_id bigint, text string",
    )
    (row,) = pii_stats(df).collect()
    assert (row.n_email, row.n_ip, row.n_phone) == (1, 1, 1)
    assert row.red_md5 == _md5("<EMAIL> then <IP> then <PHONE>.")


# ---------------------------------------------------------------------------
# quality classifier
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def clf_df(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "spark spark spark SPARK spark!"),
        (3, ""),
        (4, None),
        (5, "Mixed CASE Words, with punct; and 123 numbers."),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_classifier_hash_path_basics(clf_df):
    from llm_aided_ocr_spark.operators.textstats import quality_classifier_score

    out = {r.id: r for r in quality_classifier_score(clf_df, dim=1 << 10).collect()}
    assert out[1].n_words == 9
    assert out[3].n_words == 0 and out[3].prob_r == 0.5
    assert out[4].n_words == 0 and out[4].logit_r == 0.0
    for r in out.values():
        assert -1.0 <= r.logit_r <= 1.0          # mean of [-1,1) weights
        assert 0.0 <= r.prob_r <= 1.0


def test_classifier_trained_weights_path_matches_hash_path(spark, clf_df):
    from llm_aided_ocr_spark.operators.textstats import (
        _bucket_weight_col,
        quality_classifier_score,
    )
    from llm_aided_ocr_spark.operators.util import release_pinned

    dim, seed = 1 << 10, 7
    # materialize the SAME hash-derived model as an explicit weights table
    weights = spark.range(dim).select(
        F.col("id").alias("bucket"),
        _bucket_weight_col(F.col("id"), seed).alias("weight"),
    )
    a = quality_classifier_score(clf_df, dim=dim, seed=seed)
    b = quality_classifier_score(clf_df, dim=dim, seed=seed, weights_df=weights)
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, b.collect()))
    release_pinned(b)
    assert rows_a == rows_b


def test_classifier_bias_shifts_logit(clf_df):
    from llm_aided_ocr_spark.operators.textstats import quality_classifier_score

    base = {r.id: r for r in quality_classifier_score(clf_df).collect()}
    up = {r.id: r for r in quality_classifier_score(clf_df, bias=2.0).collect()}
    for i in base:
        assert up[i].logit_r == pytest.approx(base[i].logit_r + 2.0, abs=2e-6)


def test_classifier_broadcasts_trained_weights(spark, clf_df):
    from llm_aided_ocr_spark.operators.textstats import quality_classifier_score
    from llm_aided_ocr_spark.operators.util import release_pinned

    weights = spark.range(16).select(
        F.col("id").alias("bucket"), F.lit(0.5).alias("weight")
    )
    out = quality_classifier_score(clf_df, dim=16, weights_df=weights)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    release_pinned(out)


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def bm25_df(spark):
    rows = [
        (1, "spark spark spark streaming joins"),
        (2, "spark is nice"),
        (3, "window functions over rows"),
        (4, "nothing relevant whatsoever"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_bm25_scores_basics(bm25_df):
    from llm_aided_ocr_spark.operators.search import bm25_scores
    from llm_aided_ocr_spark.operators.util import release_pinned

    out = bm25_scores(bm25_df, ["spark", "window"])
    rows = {r.id: r for r in out.collect()}
    release_pinned(out)
    # doc 1 mentions spark 3x -> highest spark score; doc 3 alone has window
    assert rows[1].score_r > rows[2].score_r > 0
    assert rows[3].n_matched == 1 and rows[3].score_r > 0
    assert rows[4].score_r == 0.0 and rows[4].n_matched == 0
    assert rows[5].dl == 0 and rows[5].score_r == 0.0


def test_bm25_term_set_semantics(bm25_df):
    from llm_aided_ocr_spark.operators.search import bm25_scores
    from llm_aided_ocr_spark.operators.util import release_pinned

    a = bm25_scores(bm25_df, ["spark", "window"])
    b = bm25_scores(bm25_df, ["spark", "window", "spark"])  # dup term
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    release_pinned(a)
    release_pinned(b)
    assert ra == rb
    with pytest.raises(ValueError):
        bm25_scores(bm25_df, [])


def test_bm25_topk_order_and_limit(bm25_df):
    from llm_aided_ocr_spark.operators.search import bm25_topk
    from llm_aided_ocr_spark.operators.util import release_pinned

    top = bm25_topk(bm25_df, ["spark"], k=2)
    rows = top.collect()
    release_pinned(top)
    assert [r.id for r in rows] == [1, 2]


def test_bm25_single_corpus_exchange(bm25_df):
    """The only corpus-wide movement is the 1-row stats aggregate: the
    scoring side must reuse the cached per-doc relation with a broadcast
    of the stats row — no shuffle keyed on the corpus."""
    from llm_aided_ocr_spark.operators.search import bm25_scores
    from llm_aided_ocr_spark.operators.util import release_pinned

    out = bm25_scores(bm25_df, ["spark", "window"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    release_pinned(out)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # no hash-partitioned exchange on the scoring path (the agg's
    # single-partition exchange is the 1-row stats reduction)
    assert "hashpartitioning(id" not in plan


def test_bm25_query_terms_are_normalized_like_documents(bm25_df):
    """'Hello'/'state-of-the-art'-style raw terms must tokenize through
    the corpus tokenizer instead of silently scoring 0; zero-token terms
    raise."""
    import pytest as _pytest

    from llm_aided_ocr_spark.operators.search import bm25_scores
    from llm_aided_ocr_spark.operators.util import release_pinned

    a = bm25_scores(bm25_df, ["spark", "window"])
    ra = {r["id"]: tuple(r)[1:] for r in a.collect()}
    release_pinned(a)
    b = bm25_scores(bm25_df, ["Spark!", "WINDOW"])
    rb = {r["id"]: tuple(r)[1:] for r in b.collect()}
    release_pinned(b)
    assert ra == rb
    # a multi-word term contributes each token
    c = bm25_scores(bm25_df, ["spark-window"])
    rc = {r["id"]: tuple(r)[1:] for r in c.collect()}
    release_pinned(c)
    assert rc == ra
    with _pytest.raises(ValueError):
        bm25_scores(bm25_df, ["spark", "!!!"])


def test_positional_postings_and_phrase_search(spark):
    """Positions are 0-based in the normalized token stream; phrase
    matches are exact-adjacency; overlapping occurrences count at the
    token level; the query string runs through the corpus tokenizer."""
    import pytest as _pytest

    from llm_aided_ocr_spark.operators.search import (
        phrase_search, positional_postings)

    df = spark.createDataFrame(
        [
            (1, "Big order, ORDER order now"),   # 'order order' x2 (overlap)
            (2, "order of the order"),            # terms present, not adjacent
            (3, "the ORDER-order protocol"),      # punct splits -> adjacent
            (4, ""),                               # blank doc: no postings
            (5, "order"),                          # too short for the phrase
        ],
        "doc_id long, text string",
    )
    pp = positional_postings(df)
    rows = {(r["id"], r["pos"]): r["term"] for r in pp.collect()}
    assert rows[(1, 0)] == "big" and rows[(1, 1)] == "order"
    assert (4, 0) not in rows  # blank doc contributes nothing
    got = {r["id"]: r["n_matches"]
           for r in phrase_search(pp, "Order ORDER").collect()}
    assert got == {1: 2, 3: 1}
    # three-term phrase spans the anchor join chain
    got3 = {r["id"]: r["n_matches"]
            for r in phrase_search(pp, "order, order! order").collect()}
    assert got3 == {1: 1}
    with _pytest.raises(ValueError):
        phrase_search(pp, "!!!")


def test_related_docs_clusters_and_zero_idf_drop(spark):
    """Neighbors come from the same topic cluster; a universal term has
    idf 0 and must not create cross-cluster pairs; the unique term
    inflates norms but never dots."""
    from llm_aided_ocr_spark.operators.search import related_docs
    from llm_aided_ocr_spark.operators.util import release_pinned

    rows = [
        (0, "cat cat feline shared uniq0"),
        (1, "cat feline shared uniq1"),
        (2, "dog canine shared uniq2"),
        (3, "dog dog canine shared uniq3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = related_docs(df, k=3)
    got = {(r["doc_id"], r["rank"]): r["rel_id"] for r in out.collect()}
    release_pinned(out)
    # each doc's ONLY neighbor is its cluster partner ('shared' is df=N
    # -> weight 0 -> dropped; uniq terms pair with nobody)
    assert got == {(0, 1): 1, (1, 1): 0, (2, 1): 3, (3, 1): 2}
