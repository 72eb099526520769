"""extraction_eval: token-multiset P/R/F1 vs an independent Python
replay, plus the empty/missing-document edge contract and the
micro/macro rollup."""

from __future__ import annotations

import re
from collections import Counter

from llm_aided_ocr_spark.operators.evaluation import (
    extraction_eval,
    extraction_eval_summary,
)


def _py_eval(gold, extr):
    def toks(s):
        return Counter(re.findall(r"[a-z0-9]+", (s or "").lower()))

    out = {}
    for i in set(gold) | set(extr):
        g, e = toks(gold.get(i)), toks(extr.get(i))
        ng, ne = sum(g.values()), sum(e.values())
        nc = sum(min(g[t], e[t]) for t in g)
        p = nc / ne if ne else (1.0 if ng == 0 else 0.0)
        r = nc / ng if ng else (1.0 if ne == 0 else 0.0)
        f = 2 * p * r / (p + r) if p + r else 0.0
        out[i] = (ng, ne, nc, round(p, 6), round(r, 6), round(f, 6))
    return out


def test_extraction_eval_matches_python(spark):
    gold = {
        1: "the cat sat on the mat",
        2: "alpha beta gamma",
        3: "",                      # contentless page
        4: "only gold here",        # extractor produced nothing
        6: "Repeated repeated REPEATED words words",
    }
    extr = {
        1: "the cat sat on a mat today",   # partial overlap
        2: "alpha beta gamma",             # perfect
        3: "",                             # both empty -> all 1.0
        5: "spurious extraction",          # no gold row
        6: "repeated words words words",   # multiset clipping
    }
    gdf = spark.createDataFrame(list(gold.items()), "doc_id int, text string")
    edf = spark.createDataFrame(list(extr.items()), "doc_id int, extracted string")
    got = {
        r["id"]: (r["n_gold"], r["n_extracted"], r["n_common"],
                  r["precision_r"], r["recall_r"], r["f1_r"])
        for r in extraction_eval(gdf, edf).collect()
    }
    assert got == _py_eval(gold, extr)
    # spot-check the semantics the numbers encode
    assert got[3] == (0, 0, 0, 1.0, 1.0, 1.0)
    assert got[4][4] == 0.0 and got[4][3] == 0.0   # nothing extracted
    assert got[5][3] == 0.0                         # spurious
    # multiset: gold has repeated x3 + words x2; extr repeated x1 + words x3
    assert got[6][:3] == (5, 4, 3)


def test_extraction_eval_summary(spark):
    gdf = spark.createDataFrame(
        [(1, "a b c d"), (2, "x y")], "doc_id int, text string"
    )
    edf = spark.createDataFrame(
        [(1, "a b c"), (2, "x y z")], "doc_id int, extracted string"
    )
    per_doc = extraction_eval(gdf, edf)
    row = extraction_eval_summary(per_doc).collect()[0]
    assert row["n_docs"] == 2
    assert row["t_gold"] == 6 and row["t_extracted"] == 6
    assert row["t_common"] == 5
    assert row["micro_precision_r"] == round(5 / 6, 6)
    assert row["micro_recall_r"] == round(5 / 6, 6)
    # macro averages the ROUNDED per-doc ratios: (1.0 + 0.666667)/2 =
    # 0.8333335, HALF_UP -> 0.833334
    assert row["macro_precision_r"] == 0.833334
    assert row["macro_recall_r"] == round((0.75 + 1) / 2, 6)
