"""refetch_schedule (RFC 9111 subset), hreflang map/clusters,
soft404_flags content heuristic."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from llm_aided_ocr_spark.operators.hreflang import (
    hreflang_clusters,
    hreflang_map,
)
from llm_aided_ocr_spark.operators.refetch import refetch_schedule
from llm_aided_ocr_spark.operators.soft404 import soft404_flags


def _headers(spark, rows):
    return spark.createDataFrame(
        rows, "id string, header_ix int, name string, value string"
    )


def test_refetch_schedule_policies(spark):
    rows = [
        # etag + max-age -> revalidate_etag, ttl 3600
        ("a", 0, "cache-control", "public, max-age=3600"),
        ("a", 1, "etag", '"v1"'),
        ("a", 2, "last-modified", "Mon, 01 Jan 2024 00:00:00 GMT"),
        # last-modified only -> revalidate_ims, NULL ttl
        ("b", 0, "last-modified", "Tue, 02 Jan 2024 00:00:00 GMT"),
        # no validators, no cc -> full_fetch, NULL ttl
        ("c", 0, "content-type", "text/html"),
        # no-store wins over a (nonsensical but seen) max-age
        ("d", 0, "cache-control", "no-store, max-age=900"),
        # first occurrence in wire order wins for singleton headers
        ("e", 0, "cache-control", "max-age=10"),
        ("e", 1, "cache-control", "max-age=99"),
        ("e", 2, "etag", "W/'x'"),
        # s-maxage must NOT match the max-age extractor
        ("f", 0, "cache-control", "s-maxage=500"),
    ]
    got = {r["id"]: r for r in refetch_schedule(_headers(spark, rows)).collect()}
    assert (got["a"]["policy"], got["a"]["ttl_seconds"]) == ("revalidate_etag", 3600)
    assert got["a"]["etag"] == '"v1"'
    assert (got["b"]["policy"], got["b"]["ttl_seconds"]) == ("revalidate_ims", None)
    assert (got["c"]["policy"], got["c"]["ttl_seconds"]) == ("full_fetch", None)
    assert got["d"]["ttl_seconds"] == 0
    assert (got["e"]["policy"], got["e"]["ttl_seconds"]) == ("revalidate_etag", 10)
    assert got["f"]["ttl_seconds"] is None


def test_refetch_schedule_next_ts(spark):
    headers = _headers(spark, [("a", 0, "cache-control", "max-age=60"),
                               ("b", 0, "content-type", "text/html")])
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    fetches = spark.createDataFrame(
        [("a", t0), ("b", t0)], "id string, warc_ts timestamp"
    )
    got = {
        r["id"]: r["next_fetch_ts"]
        for r in refetch_schedule(headers, fetches).collect()
    }
    assert got["a"] == t0 + datetime.timedelta(seconds=60)
    assert got["b"] is None  # NULL ttl -> NULL schedule


HTML_HREFLANG = (
    b'<html><head>'
    b'<link rel="alternate" hreflang="EN" href="https://s.example/en"/>'
    b'<link hreflang="de" rel="alternate nofollow" href="https://s.example/de">'
    b'<link rel="alternate" hreflang="x-default" href="https://s.example/en"/>'
    b'<link rel="alternate" href="https://s.example/feed.xml" '
    b'type="application/rss+xml"/>'      # no hreflang -> not a variant
    b'<link rel="stylesheet" hreflang="fr" href="https://s.example/fr"/>'
    b"</head><body>x</body></html>"
)


def test_hreflang_map(spark):
    df = spark.createDataFrame(
        [("https://s.example/de", HTML_HREFLANG), ("u2", b"<html/>")],
        "url string, html binary",
    )
    rows = hreflang_map(df).collect()
    got = [(r["hreflang"], r["href"]) for r in rows]
    assert got == [
        ("en", "https://s.example/en"),
        ("de", "https://s.example/de"),
        ("x-default", "https://s.example/en"),
    ]


def test_hreflang_clusters_reciprocal_pages_agree(spark):
    # both variants declare the full group -> same cluster_key
    en = (
        b'<link rel="alternate" hreflang="en" href="https://s.example/en"/>'
        b'<link rel="alternate" hreflang="de" href="https://s.example/de"/>'
    )
    df = spark.createDataFrame(
        [
            ("https://s.example/en", en),
            ("https://s.example/de", en),
            ("https://s.example/plain", b"<html/>"),
        ],
        "url string, html binary",
    )
    rows = {r["id"]: r for r in hreflang_clusters(df).collect()}
    assert set(rows) == {"https://s.example/en", "https://s.example/de"}
    keys = {r["cluster_key"] for r in rows.values()}
    assert keys == {"https://s.example/de"}
    assert rows["https://s.example/en"]["n_variants"] == 2


def test_hreflang_zero_exchange(spark):
    df = spark.createDataFrame([("u", HTML_HREFLANG)], "url string, html binary")
    for rel in (hreflang_map(df), hreflang_clusters(df)):
        plan = rel._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Python" not in plan and "ArrowEval" not in plan


def test_soft404_flags(spark):
    long_doc = ("word " * 300) + "page not found in archives"
    rows = [
        ("hit", 200, "Sorry, this Page Not Found. Try the homepage."),
        ("real404", 404, "page not found"),          # status already routes it
        ("longdoc", 200, long_doc),                  # too long to be a template
        ("clean", 200, "a perfectly normal article body"),
        ("nullstatus", None, "page not found"),
        ("removed", 200, "This content has been removed by the author."),
    ]
    df = spark.createDataFrame(rows, "url string, status int, text string")
    got = {r["id"]: r for r in soft404_flags(df).collect()}
    assert got["hit"]["is_soft404"] is True
    assert got["hit"]["marker"] == "page not found"
    assert got["real404"]["is_soft404"] is False
    assert got["longdoc"]["is_soft404"] is False
    assert got["longdoc"]["marker"] == "page not found"
    assert got["clean"]["is_soft404"] is False and got["clean"]["marker"] is None
    assert got["nullstatus"]["is_soft404"] is False
    assert got["removed"]["is_soft404"] is True
    # first-marker-in-list tie-break and word counting
    assert got["hit"]["n_words"] == 8
    empty = spark.createDataFrame(
        [("e", 200, ""), ("n", 200, None)], "url string, status int, text string"
    )
    eg = {r["id"]: r["n_words"] for r in soft404_flags(empty).collect()}
    assert eg == {"e": 0, "n": 0}


def test_crawl_budget_largest_remainder(spark):
    """Hamilton allocation: floors + largest-remainder top-up, exact
    budget conservation, zero-weight host gets zero."""
    from llm_aided_ocr_spark.operators.refetch import crawl_budget

    rows = [("a", 5), ("b", 3), ("c", 1), ("d", 1), ("z", 0)]
    df = spark.createDataFrame(rows, "host string, weight long")
    got = {r["host"]: r["alloc"]
           for r in crawl_budget(df, budget=7).collect()}
    # quotas: a 3.5, b 2.1, c .7, d .7 -> floors 3,2,0,0 leftover 2;
    # remainders (x10): a 5, b 1, c 7, d 7 -> c and d get the +1s
    assert got == {"a": 3, "b": 2, "c": 1, "d": 1, "z": 0}
    assert sum(got.values()) == 7


def test_crawl_budget_remainder_tie_and_zero_total(spark):
    from llm_aided_ocr_spark.operators.refetch import crawl_budget

    # equal remainders -> host-ascending order takes the single +1
    df = spark.createDataFrame(
        [("x", 1), ("y", 1)], "host string, weight long"
    )
    got = {r["host"]: r["alloc"] for r in crawl_budget(df, budget=3).collect()}
    assert got == {"x": 2, "y": 1}
    # all-zero weights -> all-zero allocations (no division by zero)
    z = spark.createDataFrame([("x", 0), ("y", 0)], "host string, weight long")
    gz = {r["host"]: r["alloc"] for r in crawl_budget(z, budget=5).collect()}
    assert gz == {"x": 0, "y": 0}


def test_politeness_schedule_timetable(spark):
    from llm_aided_ocr_spark.operators.refetch import politeness_schedule

    frontier = spark.createDataFrame(
        [("a.org", "https://a.org/low", 1),
         ("a.org", "https://a.org/hi", 9),
         ("a.org", "https://a.org/hi2", 9),
         ("b.org", "https://b.org/x", 5)],
        "host string, url string, priority long",
    )
    delays = spark.createDataFrame(
        [("a.org", 10)], "host string, crawl_delay_sec long"
    )
    got = {r["url"]: (r["fetch_rank"], r["fetch_ts"])
           for r in politeness_schedule(frontier, delays, t0=100).collect()}
    # a.org: priority 9 ties break by url asc -> hi before hi2
    assert got["https://a.org/hi"] == (0, 100)
    assert got["https://a.org/hi2"] == (1, 110)
    assert got["https://a.org/low"] == (2, 120)
    # b.org missing from delays -> default 1s
    assert got["https://b.org/x"] == (0, 100)


def test_politeness_schedule_duplicate_delay_rows(spark):
    # appended robots snapshots leave several delay rows per host; the
    # lookup must not fan the frontier out into duplicate timetables,
    # and the LARGEST delay (conservative politeness) wins
    from llm_aided_ocr_spark.operators.refetch import politeness_schedule

    frontier = spark.createDataFrame(
        [("a.org", "https://a.org/p1", 2),
         ("a.org", "https://a.org/p2", 1)],
        "host string, url string, priority long",
    )
    delays = spark.createDataFrame(
        [("a.org", 5), ("a.org", 30), ("a.org", None)],
        "host string, crawl_delay_sec long",
    )
    rows = politeness_schedule(frontier, delays, t0=0).collect()
    assert len(rows) == 2  # one timetable row per frontier url
    got = {r["url"]: (r["fetch_rank"], r["fetch_ts"]) for r in rows}
    assert got["https://a.org/p1"] == (0, 0)
    assert got["https://a.org/p2"] == (1, 30)


def test_rendezvous_assign_stability(spark):
    """HRW's minimal-movement property: removing one shard only remaps
    the keys that lived on it; every other assignment is unchanged."""
    from pyspark.sql import functions as F

    from llm_aided_ocr_spark.operators.refetch import rendezvous_assign

    d = spark.range(0, 400).select(F.col("id").alias("doc_id"))
    full = {r["doc_id"]: r["shard"]
            for r in rendezvous_assign(d, ["s0", "s1", "s2", "s3"]).collect()}
    # roughly balanced (md5 uniformity): each shard gets 400/4 +- 50%
    from collections import Counter
    counts = Counter(full.values())
    assert set(counts) == {"s0", "s1", "s2", "s3"}
    assert all(50 <= c <= 150 for c in counts.values())
    smaller = {r["doc_id"]: r["shard"]
               for r in rendezvous_assign(d, ["s0", "s1", "s2"]).collect()}
    moved = [k for k in full if full[k] != smaller[k]]
    assert all(full[k] == "s3" for k in moved)      # only s3's keys move
    assert all(smaller[k] == full[k] for k in full if full[k] != "s3")


def test_url_bitext_candidates(spark):
    from llm_aided_ocr_spark.operators.hreflang import url_bitext_candidates

    urls = [
        "https://a.org/en/about.html",
        "https://a.org/en/about.html",        # refetch dup
        "https://a.org/fr/about.html",
        "https://a.org/de-at/about.html",
        "https://a.org/en/only-en.html",      # no partner
        "https://a.org/docs/about.html",      # no marker -> no candidate
        "https://b.org/fr/about.html",        # other host, same path
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {(r["lang_a"], r["lang_b"])
           for r in url_bitext_candidates(df).collect()
           if r["key"].startswith("a.org/*/about")}
    assert got == {("en", "fr"), ("de-at", "en"), ("de-at", "fr")}
    allrows = url_bitext_candidates(df).collect()
    # hosts never pair across; the dup and the marker-less url add nothing
    assert len(allrows) == 3
    assert all("b.org" not in r["url_a"] and "b.org" not in r["url_b"]
               for r in allrows)


def test_crawl_budget_plan_has_no_single_partition_exchange(spark):
    """The remainder ranking rides the two-phase distributed rank —
    never a SinglePartition window exchange (the epoch_order audit
    shape)."""
    from pyspark.sql import functions as F

    from llm_aided_ocr_spark.operators.refetch import crawl_budget
    from llm_aided_ocr_spark.operators.util import release_pinned

    hosts = spark.range(0, 300).select(
        F.concat(F.lit("h"), F.col("id")).alias("host"),
        (F.col("id") % 17 + 1).alias("weight"),
    )
    out = crawl_budget(hosts, budget=1000)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    )
    assert "SinglePartition" not in plan
    assert sum(r["alloc"] for r in out.collect()) == 1000
    release_pinned(out)
