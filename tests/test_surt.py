"""SURT key normalization + CDX record shape, incl. session-timezone
independence of the ts14 index key."""

from __future__ import annotations

import datetime as dt
import hashlib

from pyspark.sql import functions as F

from llm_aided_ocr_spark.operators.surt import cdx_records, surt_key_col

SURT_CASES = [
    ("https://www.Example.co.uk/a/b?q=1", "uk,co,example)/a/b?q=1"),
    ("http://example.com", "com,example)/"),
    ("https://news.site.org/", "org,site,news)/"),
    ("https://host.io:8080/x", "io,host:8080)/x"),
    ("https://www.www2.example.com/p", "com,example,www2)/p"),  # one www. strip
    ("https://example.com/a#frag", "com,example)/a"),
    ("ftp://files.example.com/f.txt", "com,example,files)/f.txt"),
    ("not a url", None),
    ("", None),
    (None, None),
]


def test_surt_keys(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(SURT_CASES)], "i long, url string"
    )
    got = {
        r["i"]: r["k"]
        for r in df.select("i", surt_key_col(F.col("url")).alias("k")).collect()
    }
    for i, (u, want) in enumerate(SURT_CASES):
        assert got[i] == want, (u, got[i], want)


def test_cdx_records_shape_and_digest(spark):
    ts = dt.datetime(2024, 3, 4, 5, 6, 7)
    df = spark.createDataFrame(
        [("https://www.example.com/p", ts, "hello world")],
        "url string, warc_ts timestamp, text string",
    )
    r = cdx_records(df).collect()[0]
    assert r["surt_key"] == "com,example)/p"
    assert r["digest"] == hashlib.md5(b"hello world").hexdigest()
    assert len(r["ts14"]) == 14 and r["ts14"].isdigit()


def test_cdx_ts14_is_session_tz_independent(spark):
    ts = dt.datetime(2024, 3, 4, 5, 6, 7)
    df = spark.createDataFrame(
        [("https://example.com/", ts, "t")],
        "url string, warc_ts timestamp, text string",
    )
    base_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        vals = set()
        for tz in (base_tz, "Australia/Lord_Howe", "America/Anchorage"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            vals.add(cdx_records(df).collect()[0]["ts14"])
    finally:
        spark.conf.set("spark.sql.session.timeZone", base_tz)
    assert len(vals) == 1, vals  # the index key must not move with the TZ
