"""publication_dates: channel extraction, priority ladder, validity
gates, URL date forms."""

from __future__ import annotations

import datetime as dt

import pytest

from llm_aided_ocr_spark.operators.dates import publication_dates

D = dt.date

CASES = [
    # (name, url, html, expected (date_meta, date_time_tag, date_url, pub, source))
    ("og_meta", "https://ex.org/a",
     b'<meta property="article:published_time" content="2021-03-04T05:06:07Z">',
     (D(2021, 3, 4), None, None, D(2021, 3, 4), "meta")),
    ("meta_beats_time", "https://ex.org/b",
     b'<time datetime="2018-01-01">x</time><meta name="date" content="2019-07-08">',
     (D(2019, 7, 8), D(2018, 1, 1), None, D(2019, 7, 8), "meta")),
    ("priority_not_doc_order", "https://ex.org/c",
     b'<meta name="date" content="2010-01-01">'
     b'<meta property="article:published_time" content="2012-02-02">',
     (D(2012, 2, 2), None, None, D(2012, 2, 2), "meta")),
    ("time_only", "https://ex.org/d",
     b"<p>hi</p><TIME class='t' DATETIME='2020-12-31T23:59:59Z'>then</TIME>",
     (None, D(2020, 12, 31), None, D(2020, 12, 31), "time")),
    ("url_slashed", "https://ex.org/2017/6/5/post.html", b"<p>x</p>",
     (None, None, D(2017, 6, 5), D(2017, 6, 5), "url")),
    ("url_dashed", "https://ex.org/2015-04-03/post", b"",
     (None, None, D(2015, 4, 3), D(2015, 4, 3), "url")),
    ("invalid_meta_falls_through", "https://ex.org/e",
     b'<meta name="date" content="2024-02-30"><time datetime="2024-02-10">t</time>',
     (None, D(2024, 2, 10), None, D(2024, 2, 10), "time")),
    ("out_of_range_meta", "https://ex.org/2016/02/29/x",
     b'<meta name="date" content="1802-01-01">',
     (None, None, D(2016, 2, 29), D(2016, 2, 29), "url")),
    ("nothing", "https://ex.org/plain", b"<p>no dates</p>",
     (None, None, None, None, None)),
    ("null_html", "https://ex.org/2001/11/9/", None,
     (None, None, D(2001, 11, 9), D(2001, 11, 9), "url")),
    # /1234/56/78/ is not a plausible year -> no slashed match
    ("bad_year_url", "https://ex.org/1234/56/78/x", b"",
     (None, None, None, None, None)),
]


def test_publication_dates_cases(spark):
    df = spark.createDataFrame(
        [(u, h) for _, u, h, _ in CASES], "url string, html binary"
    )
    got = {r["id"]: r for r in publication_dates(df).collect()}
    for name, u, _, want in CASES:
        r = got[u]
        have = (r["date_meta"], r["date_time_tag"], r["date_url"],
                r["pub_date"], r["source"])
        assert have == want, (name, have, want)


def test_publication_dates_rejects_empty_keys(spark):
    df = spark.createDataFrame([("u", b"")], "url string, html binary")
    with pytest.raises(ValueError):
        publication_dates(df, meta_keys=[])


def test_publication_dates_custom_bounds(spark):
    df = spark.createDataFrame(
        [("https://ex.org/x",
          b'<meta name="date" content="1802-01-01">')],
        "url string, html binary",
    )
    r = publication_dates(df, min_year=1800).collect()[0]
    assert r["pub_date"] == D(1802, 1, 1) and r["source"] == "meta"
