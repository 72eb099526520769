"""robots.txt parsing + longest-match URL permission evaluation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from llm_aided_ocr_spark.operators.robots import (
    parse_robots,
    parse_robots_text,
    robots_allowed,
)

ROBOTS = """\
# a comment line
User-agent: googlebot
Disallow: /g-only/

User-agent: *
Allow: /public/ok
Disallow: /public/
Disallow: /tmp
Allow:
Disallow: /wild*card
Disallow: /anchored$
User-agent: other
Disallow: /
"""


def test_parse_robots_text_star_group():
    rules, skipped = parse_robots_text(ROBOTS, agent="*")
    assert rules == [
        ("allow", "/public/ok"),
        ("disallow", "/public/"),
        ("disallow", "/tmp"),
    ]
    assert skipped == 2  # wildcard + anchored


def test_parse_robots_text_named_agent():
    rules, _ = parse_robots_text(ROBOTS, agent="GoogleBot")
    # googlebot group plus nothing from * (agent match is exact-token)
    assert ("disallow", "/g-only/") in rules
    assert ("disallow", "/public/") not in rules


def test_parse_robots_text_consecutive_agents_share_group():
    txt = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    assert parse_robots_text(txt, agent="b")[0] == [("disallow", "/x")]
    assert parse_robots_text(txt, agent="a")[0] == [("disallow", "/x")]
    assert parse_robots_text(txt, agent="c")[0] == []


def test_parse_robots_text_blank_line_does_not_end_group():
    txt = "User-agent: *\n\nDisallow: /x\n"
    assert parse_robots_text(txt)[0] == [("disallow", "/x")]


def test_parse_robots_dataframe(spark):
    df = spark.createDataFrame(
        [("h1.example", ROBOTS), ("h2.example", None)],
        "host string, robots_txt string",
    )
    rows = {
        (r["host"], r["rule"], r["prefix"], r["prefix_len"])
        for r in parse_robots(df).collect()
    }
    assert rows == {
        ("h1.example", "allow", "/public/ok", 10),
        ("h1.example", "disallow", "/public/", 8),
        ("h1.example", "disallow", "/tmp", 4),
    }


ALLOW_CASES = [
    ("https://h1.example/public/ok/page", True),   # longest match = allow
    ("https://h1.example/public/other", False),    # /public/ disallow
    ("https://h1.example/tmp/x", False),
    ("https://h1.example/TMP/x", True),            # case-sensitive
    ("https://h1.example/free", True),             # no match
    ("https://h1.example/", True),
    ("https://norules.example/anything", True),    # host without rules
    ("not a url", True),                           # unparseable host
]


@pytest.mark.parametrize("url,expected", ALLOW_CASES)
def test_robots_allowed(spark, url, expected):
    rules = parse_robots(
        spark.createDataFrame(
            [("h1.example", ROBOTS)], "host string, robots_txt string"
        )
    )
    urls = spark.createDataFrame([(1, url)], "doc_id long, url string")
    assert robots_allowed(urls, rules).first()["allowed"] == expected


def test_robots_allowed_tie_prefers_allow(spark):
    rules = spark.createDataFrame(
        [
            ("h.example", "allow", "/p/", 3),
            ("h.example", "disallow", "/p/", 3),
        ],
        "host string, rule string, prefix string, prefix_len int",
    )
    urls = spark.createDataFrame(
        [(1, "https://h.example/p/x")], "doc_id long, url string"
    )
    assert robots_allowed(urls, rules).first()["allowed"] is True


def test_robots_allowed_plan_broadcasts_rules(spark):
    rules = spark.createDataFrame(
        [("h.example", "disallow", "/p/", 3)],
        "host string, rule string, prefix string, prefix_len int",
    )
    urls = spark.createDataFrame(
        [(1, "https://h.example/p/x")], "doc_id long, url string"
    )
    plan = (
        robots_allowed(urls, rules)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_robots_sitemaps_extraction(spark):
    from llm_aided_ocr_spark.operators.robots import robots_sitemaps

    txt = (
        "# comment\n"
        "sitemap: https://a.example/s1.xml\n"
        "User-agent: *\nDisallow: /x\n"
        "  SiteMap:\thttps://a.example/s2.xml  # weekly\n"
        "Sitemap:/glued.xml\n"
        "Sitemap:\n"          # empty -> no capture
        "notasitemap: https://a.example/no.xml\n"
    )
    df = spark.createDataFrame(
        [("a.example", txt), ("b.example", None)],
        "host string, robots_txt string",
    )
    rows = [
        (r["host"], r["sitemap_ix"], r["sitemap_url"])
        for r in robots_sitemaps(df).orderBy("host", "sitemap_ix").collect()
    ]
    assert rows == [
        ("a.example", 0, "https://a.example/s1.xml"),
        ("a.example", 1, "https://a.example/s2.xml"),
        ("a.example", 2, "/glued.xml"),
    ]
    plan = robots_sitemaps(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "Exchange" not in plan


def test_crawl_delay_and_politeness_audit(spark):
    import datetime as dt

    from llm_aided_ocr_spark.operators.robots import (
        politeness_audit,
        robots_crawl_delays,
    )

    robots = spark.createDataFrame(
        [
            ("slow.example", "User-agent: *\nCrawl-delay: 5\nDisallow: /x"),
            ("fast.example", "User-agent: *\nCrawl-delay: 0.5"),
            ("free.example", "User-agent: *\nDisallow: /y"),
            ("null.example", None),
        ],
        "host string, robots_txt string",
    )
    delays = {r["host"]: r["crawl_delay"]
              for r in robots_crawl_delays(robots).collect()}
    assert delays == {"slow.example": 5.0, "fast.example": 0.5,
                      "free.example": None, "null.example": None}

    base = dt.datetime(2026, 1, 1)
    fetches = []
    # slow.example fetched every 2s -> violates its 5s contract
    fetches += [(f"https://slow.example/{i}", base + dt.timedelta(seconds=2 * i))
                for i in range(3)]
    # fast.example fetched every 2s -> fine against 0.5s
    fetches += [(f"https://fast.example/{i}", base + dt.timedelta(seconds=2 * i))
                for i in range(3)]
    # free.example: no declaration -> never violates
    fetches += [(f"https://free.example/{i}", base + dt.timedelta(seconds=i))
                for i in range(2)]
    # lonely.example: single fetch, no gap -> never violates
    fetches += [("https://lonely.example/0", base)]
    df = spark.createDataFrame(fetches, "url string, warc_ts timestamp")

    audit = {r["host"]: r for r in politeness_audit(df, robots).collect()}
    assert audit["slow.example"]["violates"] is True
    assert audit["fast.example"]["violates"] is False
    assert audit["free.example"]["violates"] is False
    assert audit["lonely.example"]["violates"] is False
    assert audit["slow.example"]["min_gap_s"] == 2.0
