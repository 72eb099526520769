"""Outlink extraction, URL resolution, host graph, degrees."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from llm_aided_ocr_spark.operators.linkgraph import (
    anchor_texts,
    host_degrees,
    host_graph,
    outlinks,
    resolve_href_col,
)


def _resolve(spark, base: str, href: str) -> str | None:
    row = (
        spark.range(1)
        .select(resolve_href_col(F.lit(base), F.lit(href)).alias("r"))
        .first()
    )
    return row["r"]


BASE = "https://www.example.com/a/b/page.html?x=1"

RESOLUTION_CASES = [
    # absolute passthrough (fragment stripped)
    ("http://other.org/p#frag", "http://other.org/p"),
    # protocol-relative gets the base scheme
    ("//cdn.example.net/lib.js", "https://cdn.example.net/lib.js"),
    # root-relative
    ("/top/index.html", "https://www.example.com/top/index.html"),
    # relative joins the base DIRECTORY (page.html dropped)
    ("next.html", "https://www.example.com/a/b/next.html"),
    ("sub/deep.html", "https://www.example.com/a/b/sub/deep.html"),
    # query-only keeps the base path
    ("?y=2", "https://www.example.com/a/b/page.html?y=2"),
    # fragment-only and empty are self-references → NULL
    ("#sec", None),
    ("", None),
    # dot segments
    ("./here.html", "https://www.example.com/a/b/here.html"),
    ("../up.html", "https://www.example.com/a/up.html"),
    ("../../root.html", "https://www.example.com/root.html"),
    # above-root .. clamps to root
    ("../../../over.html", "https://www.example.com/over.html"),
    # entity-encoded ampersand decoded
    ("p?a=1&amp;b=2", "https://www.example.com/a/b/p?a=1&b=2"),
    # whitespace-padded href trimmed
    ("  x.html ", "https://www.example.com/a/b/x.html"),
    # non-http scheme kept verbatim by the resolver (filtered by
    # outlinks' http_only, not here)
    ("mailto:a@b.c", "mailto:a@b.c"),
]


@pytest.mark.parametrize("href,expected", RESOLUTION_CASES)
def test_resolve_href(spark, href, expected):
    assert _resolve(spark, BASE, href) == expected


def test_resolve_against_bare_host(spark):
    # base with empty path: relative + query-only resolve against "/"
    assert _resolve(spark, "http://h.io", "p.html") == "http://h.io/p.html"
    assert _resolve(spark, "http://h.io", "?q=1") == "http://h.io/?q=1"
    assert _resolve(spark, "http://h.io", "/abs") == "http://h.io/abs"


def test_resolve_unparseable_base_is_null(spark):
    assert _resolve(spark, "not a url", "x.html") is None
    assert _resolve(spark, "not a url", "/x") is None
    # ... but an absolute href needs no base
    assert _resolve(spark, "not a url", "http://a.b/c") == "http://a.b/c"


def _pages(spark):
    rows = [
        (
            1,
            "https://src1.example/a/p.html",
            '<html><body><a href="http://dst1.example/x">one</a>'
            "<a href='/rooted'>two</a>"
            '<a href=bare.html>three</a>'
            '<a href="#self">skip</a>'
            '<a href="mailto:x@y.z">mail</a></body></html>',
        ),
        (
            2,
            "https://src2.example/",
            '<A HREF="//src1.example/up">caps</A><a name="noref">x</a>',
        ),
        (3, "https://src3.example/none", "<html><body>no links</body></html>"),
    ]
    return spark.createDataFrame(
        [(i, u, h.encode()) for i, u, h in rows], "doc_id long, url string, html binary"
    )


def test_outlinks(spark):
    got = {
        (r["id"], r["dst_url"])
        for r in outlinks(_pages(spark)).collect()
    }
    assert got == {
        (1, "http://dst1.example/x"),
        (1, "https://src1.example/rooted"),
        (1, "https://src1.example/a/bare.html"),
        (2, "https://src1.example/up"),
    }


def test_outlinks_cap(spark):
    html = ("".join(f'<a href="/p{i}">x</a>' for i in range(10))).encode()
    df = spark.createDataFrame(
        [(1, "http://h.io/", html)], "doc_id long, url string, html binary"
    )
    assert outlinks(df, max_links=3).count() == 3


def test_anchor_texts(spark):
    df = spark.createDataFrame(
        [
            (
                1,
                "http://h.io/",
                b'<a href="/a"> Hello <b>World</b> </a><a href="/b"></a>'
                b'<a href="/torn">no close',
            )
        ],
        "doc_id long, url string, html binary",
    )
    rows = {(r["href"], r["anchor"]) for r in anchor_texts(df).collect()}
    # torn element is absent; empty anchor comes back as ''
    assert rows == {("/a", "Hello World"), ("/b", "")}


def test_host_graph_and_degrees(spark):
    links = outlinks(_pages(spark))
    g = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in host_graph(links).collect()
    }
    # src1 self-links (rooted, bare) dropped by drop_self
    assert g == {("src1.example", "dst1.example"): 1, ("src2.example", "src1.example"): 1}
    d = {r["host"]: r for r in host_degrees(host_graph(links)).collect()}
    assert d["src1.example"]["out_hosts"] == 1
    assert d["src1.example"]["in_hosts"] == 1
    assert d["dst1.example"]["out_hosts"] == 0
    assert d["dst1.example"]["in_links"] == 1
    assert d["src2.example"]["in_links"] == 0


def test_host_graph_keep_self(spark):
    links = outlinks(_pages(spark))
    g = host_graph(links, drop_self=False)
    assert (
        g.filter(
            (F.col("src_host") == "src1.example")
            & (F.col("dst_host") == "src1.example")
        ).first()["n_links"]
        == 2
    )


def test_outlinks_plan_has_no_exchange(spark):
    plan = outlinks(_pages(spark))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan  # no Python UDFs anywhere in the op


def _np_pagerank(edges, damping=0.85, iters=15):
    import numpy as np

    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    ix = {h: i for i, h in enumerate(nodes)}
    n = len(nodes)
    W = np.zeros((n, n))
    for s, d, w in edges:
        W[ix[d], ix[s]] += w
    colsum = W.sum(axis=0)
    out = colsum > 0
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = r[~out].sum()
        contrib = W[:, out] @ (r[out] / colsum[out])
        r = (1 - damping) / n + damping * (contrib + dangling / n)
    return {h: r[ix[h]] for h in nodes}


PR_EDGES = [
    ("a", "b", 1), ("b", "a", 1), ("c", "a", 2), ("c", "b", 1), ("a", "d", 1),
]  # d is a pure sink (dangling)


def test_pagerank_matches_numpy(spark):
    from llm_aided_ocr_spark.operators.linkgraph import pagerank

    g = spark.createDataFrame(
        PR_EDGES, "src_host string, dst_host string, n_links long"
    )
    got = {r["host"]: r["rank"] for r in pagerank(g, iters=15).collect()}
    want = _np_pagerank(PR_EDGES, iters=15)
    assert set(got) == set(want)
    for h in want:
        assert abs(got[h] - want[h]) < 1e-9, (h, got[h], want[h])
    assert abs(sum(got.values()) - 1.0) < 1e-9  # dangling mass conserved


def test_pagerank_authority_ordering(spark):
    from llm_aided_ocr_spark.operators.linkgraph import pagerank

    got = {
        r["host"]: r["rank"]
        for r in pagerank(
            spark.createDataFrame(
                PR_EDGES, "src_host string, dst_host string, n_links long"
            ),
            iters=15,
        ).collect()
    }
    # a receives links from b and the heavier c edge: top-ranked source
    assert got["a"] > got["b"] > got["c"]


def test_pagerank_empty_graph(spark):
    from llm_aided_ocr_spark.operators.linkgraph import pagerank

    g = spark.createDataFrame(
        [], "src_host string, dst_host string, n_links long"
    )
    assert pagerank(g, iters=3).count() == 0


def test_anchor_corpus(spark):
    from llm_aided_ocr_spark.operators.linkgraph import anchor_corpus

    df = spark.createDataFrame(
        [
            # two source hosts describe ext.example; one self-link and
            # one empty anchor must not contribute
            (1, "http://a.io/", b'<a href="http://ext.example/x">Great <b>Site</b></a>'
                               b'<a href="/self">nav</a><a href="http://ext.example/y"></a>'),
            (2, "http://b.io/", b'<a href="http://ext.example/x">great site</a>'),
        ],
        "doc_id long, url string, html binary",
    )
    rows = {r["dst_host"]: r for r in anchor_corpus(df).collect()}
    assert set(rows) == {"ext.example"}
    r = rows["ext.example"]
    assert r["n_anchors"] == 2
    assert r["n_src_hosts"] == 2
    assert r["anchors_cat"] == "Great Site|great site"


def test_anchor_corpus_same_host_kept_when_opted_in(spark):
    from llm_aided_ocr_spark.operators.linkgraph import anchor_corpus

    df = spark.createDataFrame(
        [(1, "http://a.io/", b'<a href="/self">nav</a>')],
        "doc_id long, url string, html binary",
    )
    assert anchor_corpus(df).count() == 0
    rows = anchor_corpus(df, cross_host_only=False).collect()
    assert len(rows) == 1 and rows[0]["anchors_cat"] == "nav"


def test_trustrank_matches_numpy_fixed_point_replay(spark):
    """The bigint fixed-point recursion equals an independent dense
    replay; spam hosts unreachable from the seeds starve to zero while
    reachable hosts accumulate trust."""
    import math

    import pytest as _pytest
    from pyspark.sql import functions as F

    from llm_aided_ocr_spark.operators.linkgraph import trustrank

    #  seed -> good -> sink ; spamA <-> spamB (a farm, unreachable)
    edges = [
        ("seed.org", "good.org", 3),
        ("good.org", "sink.org", 1),
        ("spama.biz", "spamb.biz", 5),
        ("spamb.biz", "spama.biz", 5),
    ]
    g = spark.createDataFrame(
        edges, "src_host string, dst_host string, n_links long"
    )
    seeds = spark.createDataFrame([("seed.org",)], "host string")
    got = {r["host"]: r["itrust"]
           for r in trustrank(g, seeds, damping=0.85, iters=4).collect()}

    # dense replay of the pinned recursion
    hosts = ["seed.org", "good.org", "sink.org", "spama.biz", "spamb.biz"]
    share = {("seed.org", "good.org"): 1.0, ("good.org", "sink.org"): 1.0,
             ("spama.biz", "spamb.biz"): 1.0, ("spamb.biz", "spama.biz"): 1.0}
    sinks = {"sink.org"}
    T, d, S = 10**12, 0.85, {"seed.org"}
    tele = int((1.0 - d) * T) // len(S)
    r = {h: (T // len(S) if h in S else 0) for h in hosts}
    for _ in range(4):
        dm = sum(r[h] for h in sinks)
        c = {h: 0 for h in hosts}
        for (a, b), s in share.items():
            c[b] += math.floor(s * r[a])
        r = {
            h: math.floor(d * (c[h] + (dm // len(S) if h in S else 0)))
            + (tele if h in S else 0)
            for h in hosts
        }
    assert got == r
    assert got["spama.biz"] == 0 and got["spamb.biz"] == 0  # farm starved
    # the seed forwards its whole mass to good.org each round, keeping
    # only teleport + returned dangling mass — both hold trust, the farm
    # holds none
    assert got["good.org"] > got["seed.org"] > 0
    with _pytest.raises(ValueError):
        trustrank(g, seeds.filter(F.lit(False)))


def test_hits_matches_dense_fixed_point_replay(spark):
    """The bigint HITS half-round recursion equals an independent dense
    replay, and the mutual-reinforcement shape holds: the host linking
    to both authorities is the best hub, the authority fed by both hubs
    is the best authority, and an isolated self-contained pair scores
    below the connected core."""
    from llm_aided_ocr_spark.operators.linkgraph import hits

    edges = [
        ("hub1.org", "auth1.org", 2),
        ("hub1.org", "auth2.org", 1),
        ("hub2.org", "auth1.org", 1),
        ("lone.org", "side.org", 1),
    ]
    g = spark.createDataFrame(
        edges, "src_host string, dst_host string, n_links long"
    )
    got = {r["host"]: (r["hub"], r["auth"])
           for r in hits(g, iters=3, scale=10**9).collect()}

    hosts = ["hub1.org", "hub2.org", "auth1.org", "auth2.org",
             "lone.org", "side.org"]
    w = {(a, b): c for a, b, c in edges}
    T = 10**9
    h = {x: T for x in hosts}
    a = {x: 0 for x in hosts}
    for _ in range(3):
        a = {x: sum(c * h[s] for (s, d), c in w.items() if d == x)
             for x in hosts}
        da = max(1, -(-sum(a.values()) // T))
        a = {x: v // da for x, v in a.items()}
        h = {x: sum(c * a[d] for (s, d), c in w.items() if s == x)
             for x in hosts}
        dh = max(1, -(-sum(h.values()) // T))
        h = {x: v // dh for x, v in h.items()}
    assert got == {x: (h[x], a[x]) for x in hosts}
    # shape: hub1 (links to both authorities, weight 3) beats hub2
    assert got["hub1.org"][0] > got["hub2.org"][0] > 0
    # auth1 (fed by both hubs) beats auth2
    assert got["auth1.org"][1] > got["auth2.org"][1] > 0
    # pure authorities have zero hub score and vice versa
    assert got["auth1.org"][0] == 0 and got["hub1.org"][1] == 0
    # the isolated pair is dominated by the connected core
    assert got["lone.org"][0] < got["hub2.org"][0]


def test_hits_empty_graph(spark):
    from llm_aided_ocr_spark.operators.linkgraph import hits

    g = spark.createDataFrame(
        [], "src_host string, dst_host string, n_links long"
    )
    assert hits(g, iters=2).count() == 0


def test_host_triangles_clique_star_bridge(spark):
    """K4 clique hosts sit on 3 triangles each (clustering 1); star
    leaves/hub sit on none; the bridge host mixes (degree 4, 3
    triangles -> 0.5); multi-edges and direction must collapse."""
    from llm_aided_ocr_spark.operators.linkgraph import host_triangles

    edges = []
    for a, b in [("k0", "k1"), ("k0", "k2"), ("k0", "k3"),
                 ("k1", "k2"), ("k1", "k3"), ("k2", "k3")]:
        edges += [(a, b, 1), (b, a, 2)]          # both directions
    edges += [("s1", "hub", 1), ("s2", "hub", 1), ("s3", "hub", 1)]
    edges += [("s1", "k0", 1)]
    g = spark.createDataFrame(
        edges, "src_host string, dst_host string, n_links long"
    )
    got = {r["host"]: (r["n_triangles"], r["degree"], r["clustering"])
           for r in host_triangles(g).collect()}
    for k in ("k1", "k2", "k3"):
        assert got[k] == (3, 3, 1.0)
    assert got["k0"] == (3, 4, 0.5)
    assert got["hub"] == (0, 3, 0.0)
    assert got["s1"] == (0, 2, 0.0)
    assert got["s2"] == (0, 1, None)
