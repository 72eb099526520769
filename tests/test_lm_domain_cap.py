"""Reference-bigram-LM scoring + per-domain cap — round-4 curation ops.

Neither has a reference analogue (the reference is a single-document OCR
CLI); semantics follow the public recipes they name (CCNet reference-LM
filtering, C4/Gopher dominant-host capping)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from llm_aided_ocr_spark.operators.lm import lm_score, train_bigram_lm
from llm_aided_ocr_spark.operators.sampling import domain_cap
from llm_aided_ocr_spark.operators.util import release_pinned


@pytest.fixture(scope="module")
def ref_corpus(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat on the rug"),
        ],
        "doc_id bigint, text string",
    )


@pytest.fixture(scope="module")
def target_corpus(spark):
    return spark.createDataFrame(
        [
            (10, "the cat sat on the mat"),      # every bigram in-model
            (11, "zx qv bn mm pp"),              # fully OOV
            (12, "the cat flew over the moon"),  # partial
            (13, "single"),                      # no bigrams
            (14, ""),
            (15, None),
        ],
        "doc_id bigint, text string",
    )


def test_lm_score_orders_by_reference_likeness(spark, ref_corpus, target_corpus):
    out = lm_score(target_corpus, ref_df=ref_corpus)
    rows = {r.id: r for r in out.collect()}
    release_pinned(out, blocking=True)
    assert rows[10].lm_score_r > rows[12].lm_score_r > rows[11].lm_score_r > 0
    assert rows[10].oov_bigram_frac_r == 0.0
    assert rows[11].oov_bigram_frac_r == 1.0
    # zero-bigram docs: present, gated by n_bigrams, score 0
    for k in (13, 14, 15):
        assert rows[k].n_bigrams == 0 and rows[k].lm_score_r == 0.0


def test_lm_score_exact_value_by_hand(spark, ref_corpus):
    """Pin the arithmetic: one doc 'the cat' — c12('the cat')=1,
    c1('the')=4, c2('cat')=1, T=12, V=7 (the cat sat on mat dog rug),
    B=1 → 0.9*(1/4) + 0.1*(1+1)/(1*(12+7)) = 0.225 + 2/190."""
    tgt = spark.createDataFrame([(1, "the cat")], "doc_id bigint, text string")
    out = lm_score(tgt, ref_df=ref_corpus)
    r = out.collect()[0]
    release_pinned(out, blocking=True)
    assert r.n_bigrams == 1
    assert r.lm_score_r == pytest.approx(0.225 + 2 / 190, abs=1e-9)


def test_lm_score_hashed_matches_string_keys(spark, ref_corpus, target_corpus):
    a = lm_score(target_corpus, ref_df=ref_corpus, hashed=True)
    b = lm_score(target_corpus, ref_df=ref_corpus, hashed=False)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    release_pinned(a, blocking=True)
    release_pinned(b, blocking=True)
    assert ra == rb


def test_lm_score_reusable_trained_model(spark, ref_corpus, target_corpus):
    model = train_bigram_lm(ref_corpus)
    a = lm_score(target_corpus, model=model)
    b = lm_score(target_corpus, ref_df=ref_corpus)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    release_pinned(a, blocking=True)
    release_pinned(b, blocking=True)
    assert ra == rb
    with pytest.raises(ValueError):
        lm_score(target_corpus)
    with pytest.raises(ValueError):
        lm_score(target_corpus, ref_df=ref_corpus, model=model)


def test_lm_score_repeated_bigrams_weighted_by_multiplicity(spark, ref_corpus):
    """'the cat the cat the cat' has bigram multiplicities; sums weight
    by occurrence count n, not distinct bigrams."""
    tgt = spark.createDataFrame(
        [(1, "the cat the cat the cat")], "doc_id bigint, text string"
    )
    out = lm_score(tgt, ref_df=ref_corpus)
    r = out.collect()[0]
    release_pinned(out, blocking=True)
    assert r.n_bigrams == 5  # 5 positions, only 2 distinct bigrams
    # 'cat the' is OOV (never in ref), 2 of 5 positions
    assert r.oov_bigram_frac_r == pytest.approx(0.4)


# ---------------------------------------------------------------------------
# domain_cap
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def skewed_corpus(spark):
    rows = [(f"http://big.com/p{i}", f"text {i}") for i in range(20)]
    rows += [(f"http://mid.org/a{i}", f"m {i}") for i in range(3)]
    rows += [(f"http://small{i}.net/x", f"s {i}") for i in range(5)]
    rows.append(("no-scheme-path", "malformed"))
    return spark.createDataFrame(rows, "url string, text string")


def test_domain_cap_caps_only_over_represented_domains(spark, skewed_corpus):
    out = domain_cap(skewed_corpus, max_per_domain=3).collect()
    by_dom = {}
    for r in out:
        dom = r.url.split("/")[2] if "://" in r.url else ""
        by_dom.setdefault(dom, []).append(r.url)
    assert len(by_dom["big.com"]) == 3
    assert len(by_dom["mid.org"]) == 3          # exactly at cap: untouched
    assert sum(len(v) for d, v in by_dom.items() if d.startswith("small")) == 5
    assert by_dom[""] == ["no-scheme-path"]     # malformed grouped at ''
    assert len(out) == 12


def test_domain_cap_deterministic_and_layout_independent(spark, skewed_corpus):
    a = sorted(r.url for r in domain_cap(skewed_corpus, max_per_domain=3).collect())
    b = sorted(
        r.url
        for r in domain_cap(
            skewed_corpus.repartition(7), max_per_domain=3
        ).collect()
    )
    assert a == b


def test_domain_cap_seed_draws_independent_sample(spark, skewed_corpus):
    a = {r.url for r in domain_cap(skewed_corpus, 3, seed=1).collect() if "big" in r.url}
    b = {r.url for r in domain_cap(skewed_corpus, 3, seed=2).collect() if "big" in r.url}
    assert len(a) == len(b) == 3
    assert a != b  # md5-keyed draw; equality would mean the seed is dead


def test_domain_cap_preserves_schema_and_validates(spark, skewed_corpus):
    out = domain_cap(skewed_corpus, max_per_domain=3)
    assert out.columns == skewed_corpus.columns
    with pytest.raises(ValueError):
        domain_cap(skewed_corpus, max_per_domain=0)


def test_domain_cap_under_cap_bypasses_the_window(spark, skewed_corpus):
    """Only over-cap documents may flow through the rank window: with a
    cap above every domain's count the executed plan has no WindowExec
    on the surviving side's data path... it still appears in the plan
    tree (empty input), so assert the stronger behavioral property: the
    result is the identity."""
    out = domain_cap(skewed_corpus, max_per_domain=50)
    assert sorted(r.url for r in out.collect()) == sorted(
        r.url for r in skewed_corpus.collect()
    )


def test_domain_cap_salted_two_phase_identical(spark, skewed_corpus):
    """salt_partitions changes sort sizes, never the result: the k
    smallest hashes of a domain are each among the k smallest of their
    own salt bucket."""
    for k in (1, 3, 7):
        plain = sorted(
            r.url for r in domain_cap(skewed_corpus, k, seed=1).collect()
        )
        for s in (2, 4, 16):
            salted = sorted(
                r.url
                for r in domain_cap(
                    skewed_corpus, k, seed=1, salt_partitions=s
                ).collect()
            )
            assert salted == plain, (k, s)


# ---------------------------------------------------------------------------
# ccnet_buckets — head/middle/tail cut by cumulative byte mass
# ---------------------------------------------------------------------------

def _replay_cut(rows):
    """Independent Python replay of the CCNet cut: per lang, order
    distinct scores DESC, bucket by integer-exact cumulative-mass
    thirds."""
    from collections import defaultdict

    mass = defaultdict(lambda: defaultdict(int))
    for r in rows:
        mass[r.lang][r.lm_score_r] += r.doc_bytes
    cut = {}
    for lang, by_score in mass.items():
        tot = sum(by_score.values())
        cumb = 0
        for s in sorted(by_score, reverse=True):
            if 3 * cumb < tot:
                cut[(lang, s)] = "head"
            elif 3 * cumb < 2 * tot:
                cut[(lang, s)] = "middle"
            else:
                cut[(lang, s)] = "tail"
            cumb += by_score[s]
    return cut


def test_ccnet_buckets_matches_python_replay(spark):
    from llm_aided_ocr_spark.operators.lm import ccnet_buckets

    docs = []
    for i in range(60):
        lang = "en" if i % 3 else "fr"
        # graded reference-likeness: more repetitions of the in-model
        # phrase -> higher score; pad with OOV gibberish
        good = "the cat sat on the mat " * (i % 7)
        bad = f"zx{i} qv{i} " * (i % 5)
        docs.append((i, good + bad, lang))
    df = spark.createDataFrame(docs, "doc_id bigint, text string, lang string")
    ref = df.filter(F.col("doc_id") % 10 == 0)
    out = ccnet_buckets(df, ref_df=ref)
    rows = out.collect()
    release_pinned(out, blocking=True)
    assert len(rows) == 60  # every doc bucketed exactly once
    cut = _replay_cut(rows)
    for r in rows:
        assert r.bucket == cut[(r.lang, r.lm_score_r)], r
    # each lang has some spread across buckets on this graded corpus
    for lang in ("en", "fr"):
        assert len({r.bucket for r in rows if r.lang == lang}) == 3
    # head out-scores tail within every language
    for lang in ("en", "fr"):
        head = [r.lm_score_r for r in rows if r.lang == lang and r.bucket == "head"]
        tail = [r.lm_score_r for r in rows if r.lang == lang and r.bucket == "tail"]
        assert min(head) > max(tail)


def test_ccnet_buckets_ties_share_bucket_and_mass_is_thirds(spark):
    """All docs with one (lang, score) land in one bucket, and the head
    bucket's byte mass crosses the 1/3 threshold only via the boundary
    group."""
    from llm_aided_ocr_spark.operators.lm import ccnet_buckets

    # 9 identical docs -> one score group -> everything is head
    df = spark.createDataFrame(
        [(i, "the cat sat on the mat", "en") for i in range(9)],
        "doc_id bigint, text string, lang string",
    )
    out = ccnet_buckets(df, ref_df=df)
    rows = out.collect()
    release_pinned(out, blocking=True)
    assert {r.bucket for r in rows} == {"head"}


def test_ccnet_buckets_null_lang_documents_survive(spark):
    """NULL lang (the CLI --from-warc path before language ID) must form
    its own bucket group, not vanish in a null-unsafe join."""
    from llm_aided_ocr_spark.operators.lm import ccnet_buckets
    from llm_aided_ocr_spark.operators.util import release_pinned

    docs = [
        (i, "the cat sat on the mat " * (1 + i % 5), None if i % 2 else "en")
        for i in range(20)
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string, lang string")
    out = ccnet_buckets(df, ref_df=df.filter(F.col("doc_id") < 3))
    rows = out.collect()
    release_pinned(out, blocking=True)
    assert len(rows) == 20  # nothing dropped
    null_rows = [r for r in rows if r.lang is None]
    assert len(null_rows) == 10
    # the NULL group is cut like any language: replay agrees
    cut = _replay_cut(rows)
    for r in rows:
        assert r.bucket == cut[(r.lang, r.lm_score_r)], r
