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


def _mk_records(spark, keys):
    """A CDX-shaped relation with the given surt keys (unique urls)."""
    rows = [(k, "20240101000000", "d%d" % i, "u%d" % i)
            for i, k in enumerate(keys)]
    return spark.createDataFrame(
        rows, "surt_key string, ts14 string, digest string, url string"
    )


def test_cluster_index_matches_global_window(spark):
    """Two-phase ranked blocks == window row_number blocks; NULL keys
    dropped; n_records arithmetic covers the short tail block; no
    SinglePartition exchange in the plan."""
    from pyspark.sql import Window

    from llm_aided_ocr_spark.operators.surt import cdx_cluster_index
    from llm_aided_ocr_spark.operators.util import release_pinned

    keys = ["com,example)/%03d" % i for i in range(37)] + [None, None]
    recs = _mk_records(spark, keys).repartition(5)
    blocked, index = cdx_cluster_index(recs, block_size=8)
    plan = index._sc._jvm.PythonSQLUtils.explainString(
        index._jdf.queryExecution(), "formatted"
    )
    assert "SinglePartition" not in plan

    got = {r["block_ix"]: (r["first_surt_key"], r["n_records"])
           for r in index.collect()}
    w = Window.orderBy("surt_key", "ts14", "url")
    want_rows = (
        recs.filter(F.col("surt_key").isNotNull())
        .withColumn("rn", F.row_number().over(w) - 1).collect()
    )
    want = {}
    for r in sorted(want_rows, key=lambda r: r["rn"]):
        b = r["rn"] // 8
        if r["rn"] % 8 == 0:
            want[b] = [r["surt_key"], 0]
        want[b][1] += 1
    assert got == {b: tuple(v) for b, v in want.items()}
    assert got[4][1] == 5  # 37 records, block 4 holds the short tail
    assert blocked.count() == 37
    release_pinned(index)


def test_prefix_scan_candidates_and_boundaries(spark):
    """Candidate set = exactly the blocks whose key range intersects the
    prefix range: a straddling block is scanned even when it matches
    nothing, interior blocks fully match, blocks past the range are
    pruned."""
    from llm_aided_ocr_spark.operators.surt import (
        cdx_cluster_index, cdx_prefix_blocks, cdx_prefix_scan)
    from llm_aided_ocr_spark.operators.util import release_pinned

    # blocks of 4: [a0..a3] [a4 b0 b1 b2] [b3 b4 b5 b6] [b7 c0 c1 c2] [c3]
    keys = (["com,aaa)/%d" % i for i in range(5)]
            + ["com,bbb)/%d" % i for i in range(8)]
            + ["com,ccc)/%d" % i for i in range(4)])
    blocked, index = cdx_cluster_index(_mk_records(spark, keys), block_size=4)
    cand = sorted(r["block_ix"]
                  for r in cdx_prefix_blocks(index, "com,bbb").collect())
    assert cand == [1, 2, 3]  # block 0 pruned (all-a), block 4 pruned (all-c)
    stats = {r["block_ix"]: (r["n_scanned"], r["n_matched"])
             for r in cdx_prefix_scan(blocked, index, "com,bbb").collect()}
    assert stats == {1: (4, 3), 2: (4, 4), 3: (4, 1)}
    # a prefix owned entirely by one straddling block: scanned, 0 matched
    stats0 = {r["block_ix"]: (r["n_scanned"], r["n_matched"])
              for r in cdx_prefix_scan(blocked, index, "com,abc").collect()}
    assert stats0 == {1: (4, 0)}
    release_pinned(index)


def test_revisit_records_global_digest_semantics(spark):
    """Flip-flop A→B→A: the third capture revisits the FIRST even
    though the digest changed in between; exact (url, digest, ts)
    duplicates are both originals; different urls never dedup against
    each other."""
    from llm_aided_ocr_spark.operators.surt import revisit_records

    rows = [
        ("u1", "00000000000001", "A"),
        ("u1", "00000000000002", "B"),
        ("u1", "00000000000003", "A"),  # revisit of ts=1 across the change
        ("u2", "00000000000001", "A"),  # other url: own original
        ("u2", "00000000000001", "A"),  # exact duplicate: both originals
    ]
    df = spark.createDataFrame(rows, "url string, ts14 string, digest string")
    got = sorted(
        (r["url"], r["ts14"], r["is_revisit"], r["refers_to_ts14"])
        for r in revisit_records(df).collect()
    )
    assert got == [
        ("u1", "00000000000001", False, None),
        ("u1", "00000000000002", False, None),
        ("u1", "00000000000003", True, "00000000000001"),
        ("u2", "00000000000001", False, None),
        ("u2", "00000000000001", False, None),
    ]


def test_closest_capture_tie_goes_earlier(spark):
    """Equidistant captures resolve to the earlier one; otherwise the
    minimum-distance capture wins regardless of side."""
    from llm_aided_ocr_spark.operators.surt import closest_capture

    rows = [
        ("u1", "00000000001999", "d0"),  # dist 1 (earlier) — wins the tie
        ("u1", "00000000002001", "d1"),  # dist 1
        ("u2", "00000000001000", "d2"),  # dist 1000
        ("u2", "00000000002400", "d3"),  # dist 400 — wins
    ]
    df = spark.createDataFrame(rows, "url string, ts14 string, digest string")
    got = {r["key"]: (r["ts14"], r["digest"])
           for r in closest_capture(df, "00000000002000").collect()}
    assert got == {"u1": ("00000000001999", "d0"),
                   "u2": ("00000000002400", "d3")}
