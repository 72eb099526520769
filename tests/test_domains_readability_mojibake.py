"""registered_domains (PSL algorithm), flesch_scores, mojibake_scores:
each pinned against an independent pure-Python replay."""

from __future__ import annotations

import re

import pytest

from llm_aided_ocr_spark.operators.domains import registered_domains
from llm_aided_ocr_spark.operators.mojibake import (
    DEFAULT_ARTIFACTS,
    mojibake_scores,
)
from llm_aided_ocr_spark.operators.readability import flesch_scores

PSL_CASES = [
    # host, expected (public_suffix, registered_domain)
    ("example.com", ("com", "example.com")),
    ("news.example.com", ("com", "example.com")),
    ("a.b.c.example.co.uk", ("co.uk", "example.co.uk")),
    ("co.uk", ("co.uk", None)),            # host IS a public suffix
    ("com", ("com", None)),
    ("x.foo.ck", ("foo.ck", "x.foo.ck")),  # wildcard *.ck
    ("foo.ck", ("foo.ck", None)),
    ("www.ck", ("ck", "www.ck")),          # exception !www.ck
    ("sub.www.ck", ("ck", "www.ck")),
    ("ck", ("ck", None)),
    ("bar.unknowntld", ("unknowntld", "bar.unknowntld")),  # default '*'
    ("a.bar.unknowntld", ("unknowntld", "bar.unknowntld")),
    ("unknowntld", ("unknowntld", None)),
    ("WWW.Example.COM.", ("com", "example.com")),  # normalization
    ("", (None, None)),
    (None, (None, None)),
]


def test_registered_domains_psl_cases(spark):
    rows = [(i, h) for i, (h, _) in enumerate(PSL_CASES)]
    df = spark.createDataFrame(rows, "id long, host string")
    got = {
        r["id"]: (r["public_suffix"], r["registered_domain"])
        for r in registered_domains(df).collect()
    }
    for i, (h, want) in enumerate(PSL_CASES):
        assert got[i] == want, (h, got[i], want)


def test_registered_domains_rejects_malformed_rules(spark):
    df = spark.createDataFrame([(1, "a.com")], "id long, host string")
    for bad in (["*"], ["a.*.b"], ["!tld"], ["!*.x"]):
        with pytest.raises(ValueError):
            registered_domains(df, rules=bad + ["com"])


def test_registered_domains_custom_rules_and_no_id(spark):
    df = spark.createDataFrame([("x.y.platform.example",)], "host string")
    out = registered_domains(
        df, id_col=None, rules=["example", "platform.example"]
    ).collect()[0]
    assert out["public_suffix"] == "platform.example"
    assert out["registered_domain"] == "y.platform.example"
    assert "id" not in out.asDict()


def _py_flesch(text):
    low = (text or "").lower()
    words = re.findall(r"[a-z]+", low)
    w = len(words)
    syl = len(re.findall(r"[aeiouy]+", low)) + sum(
        1 for t in words if not re.search(r"[aeiouy]", t)
    )
    s = max(1, len(re.findall(r"[.!?]+", text or "")))
    if w == 0:
        return w, s, syl, None
    score = 206.835 - 1.015 * (w / s) - 84.6 * (syl / w)
    import math

    return w, s, syl, math.floor(score * 10000 + 0.5)


FLESCH_TEXTS = [
    "The cat sat on the mat. It was warm!",
    "Incomprehensibilities notwithstanding, parallelization proceeded.",
    "no terminator here",
    "Mrs Psst tsk 7th...",   # vowel-less words floor at 1 syllable
    "",
    None,
    "a. e! i? o.",
    "Multi-line\ntext with   spacing?! And MIXED case. ",
]


def test_flesch_matches_python_replay(spark):
    rows = [(i, t) for i, t in enumerate(FLESCH_TEXTS)]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r for r in flesch_scores(df).collect()}
    for i, t in enumerate(FLESCH_TEXTS):
        w, s, syl, score = _py_flesch(t)
        r = got[i]
        assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (w, s, syl), t
        assert r["flesch_x1e4"] == score, t


def _py_mojibake(text, threshold=2.0):
    t = text or ""
    pat = "|".join(re.escape(a) for a in DEFAULT_ARTIFACTS)
    hits = len(re.findall(pat, t))
    if not t:
        return 0, hits, None, False
    rate = round(1000.0 * hits / len(t), 6)
    return len(t), hits, rate, rate > threshold


MOJI_TEXTS = [
    "clean prose with nothing wrong at all",
    "damaged: cafÃ© and â€™quotesâ€œ everywhere Ã©Ã©",
    "one bad char � in a long enough sentence to stay under",
    "��",
    "",
    None,
]


def test_mojibake_matches_python_replay(spark):
    rows = [(i, t) for i, t in enumerate(MOJI_TEXTS)]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r for r in mojibake_scores(df).collect()}
    for i, t in enumerate(MOJI_TEXTS):
        n, hits, rate, damaged = _py_mojibake(t)
        r = got[i]
        assert (r["n_chars"], r["n_damage"]) == (n, hits), t
        assert r["damage_per_kchar_r"] == pytest.approx(rate) if rate is not None else r["damage_per_kchar_r"] is None
        assert r["is_damaged"] == damaged, t


def test_mojibake_rejects_empty_artifacts(spark):
    df = spark.createDataFrame([(1, "x")], "id long, text string")
    with pytest.raises(ValueError):
        mojibake_scores(df, artifacts=[])
