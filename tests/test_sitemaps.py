"""Sitemap parsing: urlset entries, sitemapindex fan-out, malformed
blocks, binary input, field trimming and try-cast semantics."""

import pyspark.sql.functions as F  # noqa: F401

from llm_aided_ocr_spark.sources.sitemaps import (
    parse_sitemaps,
    sitemap_index_entries,
)

_URLSET = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://h.example/a</loc>
    <lastmod>2024-05-01</lastmod>
    <changefreq>weekly</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc>
      https://h.example/b
  </loc></url>
  <url><lastmod>2024-01-01</lastmod></url>
  <url><loc>https://h.example/c</loc><priority>high</priority></url>
</urlset>"""


def test_parse_sitemaps_fields_and_policy(spark):
    df = spark.createDataFrame(
        [("h.example", _URLSET)], "host string, sitemap_xml binary"
    )
    rows = {r["loc"]: r for r in parse_sitemaps(df).collect()}
    # loc-less block dropped; whitespace-wrapped loc trimmed (incl. \n)
    assert set(rows) == {
        "https://h.example/a",
        "https://h.example/b",
        "https://h.example/c",
    }
    a = rows["https://h.example/a"]
    assert (a["lastmod"], a["changefreq"], a["priority"]) == (
        "2024-05-01",
        "weekly",
        0.8,
    )
    b = rows["https://h.example/b"]
    assert b["lastmod"] is None and b["priority"] is None
    # non-numeric priority -> NULL (try-cast), row survives
    assert rows["https://h.example/c"]["priority"] is None


def test_parse_sitemaps_string_col_and_null(spark):
    df = spark.createDataFrame(
        [
            ("x", "<urlset><url><loc>https://x/1</loc></url></urlset>"),
            ("y", None),
        ],
        "host string, sitemap_xml string",
    )
    rows = parse_sitemaps(df).collect()
    assert [(r["host"], r["loc"]) for r in rows] == [("x", "https://x/1")]


def test_sitemap_index_entries(spark):
    xml = (
        b"<sitemapindex>"
        b"<sitemap><loc>https://h/s1.xml.gz</loc>"
        b"<lastmod>2024-03-01</lastmod></sitemap>"
        b"<sitemap><loc>https://h/s2.xml.gz</loc></sitemap>"
        b"<sitemap><lastmod>2024-03-02</lastmod></sitemap>"
        b"</sitemapindex>"
    )
    df = spark.createDataFrame([("h", xml)], "host string, sitemap_xml binary")
    rows = sitemap_index_entries(df).collect()
    assert {(r["child_loc"], r["lastmod"]) for r in rows} == {
        ("https://h/s1.xml.gz", "2024-03-01"),
        ("https://h/s2.xml.gz", None),
    }


def test_parse_sitemaps_torn_block_skipped(spark):
    xml = b"<urlset><url><loc>https://h/ok</loc></url><url><loc>https://h/torn"
    df = spark.createDataFrame([("h", xml)], "host string, sitemap_xml binary")
    assert [r["loc"] for r in parse_sitemaps(df).collect()] == ["https://h/ok"]


def test_crawl_coverage_audit(spark):
    from pyspark.sql import functions as F

    from llm_aided_ocr_spark.sources.sitemaps import crawl_coverage

    declared = spark.createDataFrame(
        [("https://a.org/1",), ("https://a.org/2",), ("https://a.org/2",),
         ("https://b.org/x",), ("",), (None,)],
        "loc string",
    )
    crawled = spark.createDataFrame(
        [("https://a.org/1",), ("https://a.org/extra",),
         ("https://c.org/only",)],
        "url string",
    )
    got = {r["host"]: (r["n_declared"], r["n_crawled_declared"],
                       r["n_undeclared_crawled"], r["coverage"])
           for r in crawl_coverage(declared, crawled).collect()}
    # a.org: 2 declared (dup collapsed), 1 crawled-declared, 1 extra
    assert got["a.org"] == (2, 1, 1, 0.5)
    # b.org: declared but never crawled
    assert got["b.org"] == (1, 0, 0, 0.0)
    # c.org: crawled, never declared -> NULL coverage
    assert got["c.org"] == (0, 0, 1, None)
