"""change_rates (Cho & Garcia-Molina estimator) and host template
learning/stripping."""

from __future__ import annotations

import datetime
import math

import pytest

from llm_aided_ocr_spark.operators.revisit import change_rates
from llm_aided_ocr_spark.operators.templates import (
    host_template_lines,
    strip_host_templates,
)


def _ts(day):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(days=day)


def test_change_rates_estimator(spark):
    rows = [
        # a: 4 obs daily, changes on days 1 and 3 -> n=3, X=2
        ("a", _ts(0), "f0"), ("a", _ts(1), "f1"),
        ("a", _ts(2), "f1"), ("a", _ts(3), "f2"),
        # b: 3 obs, never changes -> X=0, revisit = max
        ("b", _ts(0), "g"), ("b", _ts(2), "g"), ("b", _ts(4), "g"),
        # c: changes EVERY interval -> estimator stays finite
        ("c", _ts(0), "h0"), ("c", _ts(1), "h1"), ("c", _ts(2), "h2"),
        # d: single observation -> no row
        ("d", _ts(0), "z"),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, fingerprint string")
    got = {r["id"]: r for r in change_rates(df).collect()}
    assert set(got) == {"a", "b", "c"}
    a = got["a"]
    assert (a["n_obs"], a["n_changes"]) == (4, 2)
    assert a["mean_interval_sec"] == pytest.approx(86400.0)
    lam = -math.log((3 - 2 + 0.5) / (3 + 0.5)) / 86400.0
    assert a["lambda_per_day"] == pytest.approx(lam * 86400.0)
    assert a["revisit_sec"] == pytest.approx(1.0 / lam)
    b = got["b"]
    assert b["n_changes"] == 0
    assert b["revisit_sec"] == 30 * 86400.0
    assert b["lambda_per_day"] == 0.0  # X=0 -> -ln(1) = 0, normalized -0.0
    c = got["c"]
    assert (c["n_obs"], c["n_changes"]) == (3, 2)
    assert math.isfinite(c["lambda_per_day"])
    assert c["revisit_sec"] >= 3600.0


def test_change_rates_clamps(spark):
    # hourly changes with a tight max clamp
    rows = [("u", _ts(0) + datetime.timedelta(hours=h), f"f{h}") for h in range(5)]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, fingerprint string")
    r = change_rates(df, min_interval_sec=7200, max_interval_sec=86400).collect()[0]
    assert r["revisit_sec"] == 7200.0  # floor clamp
    with pytest.raises(ValueError):
        change_rates(df, min_interval_sec=0)


TPL = "Acme Corp | Products | About"
FOOT = "(c) 2024 Acme"


def _acme_page(i):
    return f"{TPL}\nArticle body {i} line one.\nMore prose {i}.\n{FOOT}"


def test_host_template_learning_and_strip(spark):
    rows = [(f"https://acme.test/{i}", "acme.test", _acme_page(i)) for i in range(5)]
    # template-looking line on a too-small host must NOT be learned
    rows += [("https://tiny.test/0", "tiny.test", f"{TPL}\nbody a"),
             ("https://tiny.test/1", "tiny.test", f"{TPL}\nbody b")]
    # a line on only 2/5 acme pages stays (frac 0.4 < 0.5)
    rows[0] = (rows[0][0], "acme.test", _acme_page(0) + "\nRare promo line")
    rows[1] = (rows[1][0], "acme.test", _acme_page(1) + "\nRare promo line")
    df = spark.createDataFrame(rows, "url string, host string, text string")
    tpl = host_template_lines(df)
    learned = tpl.collect()
    assert {r["host"] for r in learned} == {"acme.test"}
    assert len(learned) == 2  # TPL and FOOT, not the 0.4-frac promo
    assert all(r["n_pages_host"] == 5 and r["n_pages_with"] == 5 for r in learned)

    stripped = {r["id"]: r for r in strip_host_templates(df, tpl).collect()}
    s0 = stripped["https://acme.test/0"]
    assert s0["text"] == "Article body 0 line one.\nMore prose 0.\nRare promo line"
    assert (s0["n_lines_in"], s0["n_lines_kept"]) == (5, 3)
    # tiny host untouched (below min_pages)
    t0 = stripped["https://tiny.test/0"]
    assert t0["text"] == f"{TPL}\nbody a"
    assert stripped["https://acme.test/3"]["n_lines_kept"] == 2


def test_strip_all_template_page_survives_empty(spark):
    rows = [(f"u{i}", "h.test", TPL) for i in range(4)]
    df = spark.createDataFrame(rows, "url string, host string, text string")
    out = {r["id"]: r for r in strip_host_templates(df).collect()}
    assert len(out) == 4
    assert all(r["text"] == "" and r["n_lines_kept"] == 0 for r in out.values())
    assert all(r["n_lines_in"] == 1 for r in out.values())


def test_template_learn_plan_shape(spark):
    """The learn-side exchange carries (host, line_hash) — the text
    column must not appear above the first aggregation's exchange."""
    rows = [(f"u{i}", "h.test", _acme_page(i)) for i in range(4)]
    df = spark.createDataFrame(rows, "url string, host string, text string")
    plan = host_template_lines(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan
