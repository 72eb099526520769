"""feed_items (RSS + Atom dialects, CDATA, absent fields, non-feeds)
and http_status/http_headers (status line, case folding, obs-fold,
malformed lines, CRLF vs LF)."""

from __future__ import annotations

from llm_aided_ocr_spark.operators.feeds import feed_items
from llm_aided_ocr_spark.operators.http import http_headers, http_status

RSS = b"""<?xml version="1.0"?>
<rss version="2.0"><channel><title>Chan</title>
<item><title><![CDATA[First \xe2\x80\x94 post]]></title>
<link> https://e.example/a1 </link>
<pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate>
<guid isPermaLink="true">https://e.example/a1</guid></item>
<item><title>Second</title><link>https://e.example/a2</link></item>
</channel></rss>"""

ATOM = b"""<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom"><title>F</title>
<entry><title>E1</title><link rel="alternate" href="https://e.example/b1"/>
<updated>2024-02-01T00:00:00Z</updated><id>tag:b1</id></entry>
<entry><title>E2</title><link href='https://e.example/b2'/>
<published>2024-03-01T00:00:00Z</published>
<updated>2024-03-02T00:00:00Z</updated><id>tag:b2</id></entry>
</feed>"""


def test_feed_items_rss_atom(spark):
    pages = [
        ("rss", RSS),
        ("atom", ATOM),
        ("html", b"<html><body><p>not a feed</p></body></html>"),
        ("empty", b""),
    ]
    df = spark.createDataFrame(pages, "url string, html binary")
    rows = {(r["id"], r["item_ix"]): r for r in feed_items(df).collect()}
    assert len(rows) == 4
    r0 = rows[("rss", 0)]
    assert (r0["kind"], r0["title"], r0["link"]) == (
        "rss", "First — post", "https://e.example/a1"
    )
    assert r0["published"] == "Mon, 01 Jan 2024 00:00:00 GMT"
    assert r0["guid"] == "https://e.example/a1"
    r1 = rows[("rss", 1)]
    assert (r1["title"], r1["link"], r1["published"], r1["guid"]) == (
        "Second", "https://e.example/a2", "", ""
    )
    a0 = rows[("atom", 0)]
    assert (a0["kind"], a0["title"], a0["link"]) == ("atom", "E1", "https://e.example/b1")
    assert a0["published"] == "2024-02-01T00:00:00Z"   # updated fallback
    assert a0["guid"] == "tag:b1"
    a1 = rows[("atom", 1)]
    assert a1["published"] == "2024-03-01T00:00:00Z"   # published wins
    assert a1["link"] == "https://e.example/b2"


def test_http_status_and_headers(spark):
    payload = (
        b"HTTP/1.1 301 Moved Permanently\r\n"
        b"Location: https://e.example/new\r\n"
        b"Content-Type: text/html; charset=UTF-8\r\n"
        b"X-Folded: part one\r\n"
        b"\tpart two\r\n"
        b"garbage line without colon\r\n"
        b"Set-Cookie: a=1\r\n"
        b"\r\n"
        b"<html>body Ignored: not-a-header</html>"
    )
    lf_only = b"HTTP/1.0 200 OK\nServer: x\n\nbody"
    not_http = b"<html>no envelope</html>"
    df = spark.createDataFrame(
        [("u1", payload), ("u2", lf_only), ("u3", not_http)],
        "url string, payload binary",
    )
    st = {r["id"]: (r["http_version"], r["status"]) for r in http_status(df).collect()}
    assert st == {"u1": ("1.1", 301), "u2": ("1.0", 200), "u3": (None, None)}

    hd = {}
    for r in http_headers(df).collect():
        hd.setdefault(r["id"], []).append((r["header_ix"], r["name"], r["value"]))
    for v in hd.values():
        v.sort()
    assert hd["u1"] == [
        (0, "location", "https://e.example/new"),
        (1, "content-type", "text/html; charset=UTF-8"),
        (2, "x-folded", "part one part two"),
        (3, "set-cookie", "a=1"),
    ]
    assert hd["u2"] == [(0, "server", "x")]
    assert "u3" not in hd   # no colon lines in the envelope
