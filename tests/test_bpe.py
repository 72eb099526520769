"""BPE vocabulary learning — parity with an independent pure-Python
reference implementation, tie-break determinism, exhaustion, and the
encoder round-trip."""

from __future__ import annotations

import random
import re

import pytest


def _ref_words(text: str):
    return [w for w in re.split(r"[^a-z0-9]+", (text or "").lower()) if w]


def _ref_bpe(word_counts: dict, k: int):
    """Independent reference: Sennrich-style BPE over a word-frequency
    dict. Counts every adjacent position; merges left-to-right
    non-overlapping; ties (freq DESC, lhs ASC, rhs ASC)."""
    vocab = [(list(w), n) for w, n in sorted(word_counts.items())]
    merges = []
    for t in range(k):
        counts = {}
        for syms, n in vocab:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        (a, b), freq = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((t, a, b, freq))
        new_vocab = []
        for syms, n in vocab:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab.append((out, n))
        vocab = new_vocab
    return merges


def test_bpe_learn_matches_reference_on_random_corpus(spark):
    from llm_aided_ocr_spark.operators.bpe import bpe_learn

    rng = random.Random(11)
    base = ["lower", "lowest", "newer", "newest", "wider", "low", "new",
            "abba", "aaaa", "x1y2", "banana", "bandana"]
    docs = [
        (" ".join(rng.choice(base) for _ in range(rng.randint(3, 30))),)
        for _ in range(40)
    ]
    df = spark.createDataFrame(docs, "text string")
    wc = {}
    for (t,) in docs:
        for w in _ref_words(t):
            wc[w] = wc.get(w, 0) + 1
    expect = _ref_bpe(wc, 10)
    got = bpe_learn(df, 10)
    assert got == expect


def test_bpe_overlapping_run_merges_left_to_right(spark):
    """'aaaa' under merge (a,a): pair count is 3 (every adjacent
    position) but application yields [aa, aa] — and the second round's
    (aa, aa) count must reflect the applied, non-overlapping form."""
    from llm_aided_ocr_spark.operators.bpe import bpe_learn

    df = spark.createDataFrame([("aaaa aaaa aaa",)], "text string")
    merges = bpe_learn(df, 2)
    assert merges[0][1:] == ("a", "a", 2 * 3 + 2)  # 3 per 'aaaa', 2 in 'aaa'
    # after applying: aaaa->[aa,aa], aaa->[aa,a]; pairs: (aa,aa)x2, (aa,a)x1
    assert merges[1][1:] == ("aa", "aa", 2)


def test_bpe_exhaustion_returns_short_list(spark):
    from llm_aided_ocr_spark.operators.bpe import bpe_learn

    df = spark.createDataFrame([("ab ab ab",)], "text string")
    merges = bpe_learn(df, 10)
    # one merge collapses the whole vocab to single symbols
    assert [m[1:3] for m in merges] == [("a", "b")]


def test_bpe_min_word_freq_drops_hapaxes(spark):
    from llm_aided_ocr_spark.operators.bpe import bpe_learn

    df = spark.createDataFrame(
        [("zz zz zz qqqq",)], "text string"
    )
    all_words = bpe_learn(df, 1)
    assert all_words[0][1:3] == ("q", "q")  # qqqq contributes 3 (q,q)
    cut = bpe_learn(df, 1, min_word_freq=2)
    assert cut[0][1:3] == ("z", "z")  # hapax qqqq gone


def test_bpe_encode_round_trip_and_merge_order(spark):
    from pyspark.sql import functions as F

    from llm_aided_ocr_spark.operators.bpe import bpe_encode, bpe_learn

    df = spark.createDataFrame(
        [("the cat sat on the mat the cat",), ("a cathedral that mattered",)],
        "text string",
    )
    merges = bpe_learn(df, 6)
    enc = bpe_encode(df, merges)
    rows = enc.select("text", "bpe_tokens").collect()
    for r in rows:
        # concatenation restores the normalized character stream
        assert "".join(r["bpe_tokens"]) == "".join(_ref_words(r["text"]))
    # learned symbols appear: the corpus's dominant pair merged somewhere
    toks = {t for r in rows for t in r["bpe_tokens"]}
    assert any(len(t) > 1 for t in toks)
    # bare (lhs, rhs) pair lists are accepted too
    enc2 = bpe_encode(df, [(m[1], m[2]) for m in merges])
    assert [tuple(r) for r in enc2.collect()] == [tuple(r) for r in enc.collect()]


def test_bpe_token_counts_matches_per_doc_encode(spark):
    """The vocab-join counting path equals len(bpe_encode(doc)) for every
    document (linearity over distinct words), empty docs count 0, and the
    id column follows the input id type."""
    from llm_aided_ocr_spark.operators.bpe import (
        bpe_encode,
        bpe_learn,
        bpe_token_counts,
    )
    from llm_aided_ocr_spark.operators.util import release_pinned

    df = spark.createDataFrame(
        [
            ("u1", "the cat sat on the mat the cat"),
            ("u2", "a cathedral that mattered"),
            ("u3", ""),
            ("u4", None),
            ("u5", "aaaa aaa the the"),
        ],
        "url string, text string",
    )
    merges = bpe_learn(df, 5)
    out = bpe_token_counts(df, merges, id_col="url")
    got = {r["id"]: (r["n_words"], r["n_bpe_tokens"]) for r in out.collect()}
    release_pinned(out, blocking=True)
    enc = bpe_encode(df, merges)
    for r in enc.collect():
        url, toks = r["url"], r["bpe_tokens"]
        n_words = len(_ref_words(r["text"] or ""))
        assert got[url] == (n_words, len(toks)), url
    assert got["u3"] == (0, 0)
    assert got["u4"] == (0, 0)
    assert dict(out.dtypes)["id"] == "string"


def test_bpe_merges_df_schema(spark):
    from llm_aided_ocr_spark.operators.bpe import bpe_merges_df

    out = bpe_merges_df(
        spark.createDataFrame([("ab ab",)], "text string"), 3
    )
    assert out.columns == ["merge_ix", "lhs", "rhs", "freq"]
    assert out.count() == 1


def test_bpe_counts_feed_packing(spark):
    """The sizing pass composes into the shard story: pack_sequences
    with token_col = the learned-BPE token count builds bins whose fill
    respects the TOKENIZER budget, not the whitespace estimate."""
    from pyspark.sql import functions as F

    from llm_aided_ocr_spark.operators.bpe import bpe_learn, bpe_token_counts
    from llm_aided_ocr_spark.operators.packing import pack_sequences
    from llm_aided_ocr_spark.operators.util import release_pinned

    df = spark.createDataFrame(
        [(i, "the cat sat on the mat " * (1 + i % 4)) for i in range(24)],
        "doc_id bigint, text string",
    )
    merges = bpe_learn(df, 4)
    counts = bpe_token_counts(df, merges)
    with_counts = df.join(
        counts.withColumnRenamed("id", "doc_id"), "doc_id"
    )
    packed = pack_sequences(
        with_counts, budget=40, token_col=F.col("n_bpe_tokens"),
        num_streams=2,
    )
    rows = packed.collect()
    release_pinned(counts, blocking=True)
    assert len(rows) == 24
    # per (stream, bin): fill <= budget unless a single oversized doc
    from collections import defaultdict

    fills = defaultdict(list)
    for r in rows:
        fills[(r["stream"], r["bin_ix"])].append(r["n_tokens"])
    for (s, b), toks in fills.items():
        assert sum(toks) <= 40 or len(toks) == 1, (s, b, toks)
    # and n_tokens really is the BPE count (merges shrink whitespace counts)
    cnt = {r["id"]: r["n_bpe_tokens"] for r in counts.collect()}
    for r in rows:
        assert r["n_tokens"] == cnt[r["doc_id"]]


def test_bpe_vocabulary_counts_symbols(spark):
    """Symbol totals equal the flattened bpe_encode token stream's
    Counter — and merged symbols appear with multi-char entries."""
    from collections import Counter

    from llm_aided_ocr_spark.operators.bpe import (
        bpe_encode,
        bpe_learn,
        bpe_vocabulary,
    )

    df = spark.createDataFrame(
        [("the cat sat on the mat",), ("a cathedral that mattered",),
         ("the the the cat cat",)],
        "text string",
    )
    merges = bpe_learn(df, 5)
    vocab = {
        r["symbol"]: r["n_tokens"]
        for r in bpe_vocabulary(df, merges).collect()
    }
    enc = bpe_encode(df, merges)
    expect = Counter(
        t for r in enc.collect() for t in r["bpe_tokens"]
    )
    assert vocab == dict(expect)
    assert any(len(s) > 1 for s in vocab)


def test_bpe_local_trainer_matches_reference_exhaustively():
    """The driver-local heap trainer must be byte-identical to the naive
    reference on many random word tables, including deep merge counts
    (heap lazy-invalidation + tie-break are the risky parts)."""
    import random

    from llm_aided_ocr_spark.operators.bpe import _bpe_learn_local

    rng = random.Random(7)
    alphabet = "abc"
    for trial in range(40):
        wc = {}
        for _ in range(rng.randint(1, 25)):
            w = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 9)))
            wc[w] = wc.get(w, 0) + rng.randint(1, 5)
        k = rng.randint(1, 40)
        expect = _ref_bpe(wc, k)
        got = _bpe_learn_local(sorted(wc.items()), k)
        assert got == expect, (trial, wc, k)


def test_bpe_learn_strategies_agree(spark):
    """strategy='local' (heap trainer), 'distributed' (Spark round
    loop), and 'auto' all learn the identical merge table."""
    import random

    from llm_aided_ocr_spark.operators.bpe import bpe_learn

    rng = random.Random(23)
    base = ["alpha", "beta", "gamma", "aa", "aab", "abab", "banana",
            "low", "lower", "lowest"]
    docs = [
        (" ".join(rng.choice(base) for _ in range(rng.randint(2, 20))),)
        for _ in range(30)
    ]
    df = spark.createDataFrame(docs, "text string")
    local = bpe_learn(df, 12, strategy="local")
    dist = bpe_learn(df, 12, strategy="distributed")
    auto = bpe_learn(df, 12)
    assert local == dist == auto
    assert len(local) == 12


def test_bpe_auto_falls_back_to_distributed_above_cap(spark):
    """auto with a tiny local_vocab_cap must take the distributed path
    and still match."""
    from llm_aided_ocr_spark.operators.bpe import bpe_learn

    df = spark.createDataFrame(
        [("banana bandana banana",), ("low lower lowest",)], "text string"
    )
    assert bpe_learn(df, 5, local_vocab_cap=1) == bpe_learn(
        df, 5, strategy="distributed"
    )


def test_bpe_fertility_per_language(spark):
    """Exact per-language ratios under a known merge table; NULL lang
    aggregates under the '' sentinel."""
    from llm_aided_ocr_spark.operators.bpe import bpe_fertility

    rows = [
        ("en", "aaab aaab ab"),
        ("de", "aaab"),
        (None, "xyz"),
    ]
    df = spark.createDataFrame(rows, "lang string, text string")
    # merges: (a,a)->aa, (aa,ab)? no — symbols merge pairwise:
    # with merges [(a,a),(aa,a)]: 'aaab' -> [aa,a,b] -> [aaa,b] (2 syms)
    #                            'ab'   -> [a,b]              (2 syms)
    #                            'xyz'  -> 3 syms
    merges = [("a", "a"), ("aa", "a")]
    got = {r["lang"]: r for r in bpe_fertility(df, merges).collect()}
    en = got["en"]
    # en: words aaab(x2, 4 chars, 2 toks) + ab(x1, 2 chars, 2 toks)
    assert (en["n_words"], en["n_chars"], en["n_bpe_tokens"]) == (3, 10, 6)
    assert en["fertility"] == pytest.approx(2.0)
    assert en["chars_per_token"] == pytest.approx(10 / 6)
    de = got["de"]
    assert (de["n_words"], de["n_bpe_tokens"]) == (1, 2)
    nu = got[""]
    assert (nu["n_words"], nu["n_chars"], nu["n_bpe_tokens"]) == (1, 3, 3)
