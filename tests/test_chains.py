"""Chain assembly (pagination pointer doubling) + redirect resolution.

Covers: forest labeling vs an independent Python walk, singleton pages,
edges leaving the corpus, conflict handling (error vs min), cycle
refusal, chains at/near the max_len boundary, and redirect chains with
loops / external landings / location-less 3xx rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from llm_aided_ocr_spark.operators.chains import (
    ChainCycleError,
    chain_assembly,
    pagination_chains,
    redirect_resolve,
)
from llm_aided_ocr_spark.operators.util import release_pinned


def _walk_chains(node_ids, edges):
    """Independent O(n) Python reference: head/pos/len per node."""
    succ = dict(edges)
    pred = {d: s for s, d in edges}
    out = {}
    for n in node_ids:
        if n in pred:
            continue
        chain = [n]
        while chain[-1] in succ:
            chain.append(succ[chain[-1]])
        for i, m in enumerate(chain):
            out[m] = (n, i, len(chain))
    return out


def test_chain_assembly_matches_python_walk(spark):
    # 40 nodes: chains of lengths 1..8 plus isolated nodes
    nodes, edges, nid = [], [], 0
    for length in [1, 2, 3, 5, 8, 1, 4, 7, 2, 3, 4]:
        ids = [f"n{nid + i}" for i in range(length)]
        nid += length
        nodes += ids
        edges += list(zip(ids, ids[1:]))
    ndf = spark.createDataFrame([(n,) for n in nodes], "id string")
    edf = spark.createDataFrame(edges, "src string, dst string")
    got = chain_assembly(ndf, edf)
    rows = {r["id"]: (r["chain_head"], r["page_ix"], r["chain_len"])
            for r in got.collect()}
    release_pinned(got, blocking=True)
    assert rows == _walk_chains(nodes, edges)


def test_chain_assembly_ignores_external_edges(spark):
    ndf = spark.createDataFrame([("a",), ("b",)], "id string")
    edf = spark.createDataFrame(
        [("a", "b"), ("b", "zzz"), ("out", "a")], "src string, dst string"
    )
    got = chain_assembly(ndf, edf)
    rows = {r["id"]: (r["chain_head"], r["page_ix"], r["chain_len"])
            for r in got.collect()}
    release_pinned(got, blocking=True)
    assert rows == {"a": ("a", 0, 2), "b": ("a", 1, 2)}


def test_chain_assembly_conflict_error_and_min(spark):
    ndf = spark.createDataFrame([("a",), ("b",), ("c",)], "id string")
    edf = spark.createDataFrame(
        [("a", "b"), ("a", "c")], "src string, dst string"
    )
    with pytest.raises(ValueError, match="linked-list forest"):
        chain_assembly(ndf, edf)
    got = chain_assembly(ndf, edf, on_conflict="min")
    rows = {r["id"]: (r["chain_head"], r["page_ix"], r["chain_len"])
            for r in got.collect()}
    release_pinned(got, blocking=True)
    # min target kept: a->b; c is a singleton
    assert rows == {"a": ("a", 0, 2), "b": ("a", 1, 2), "c": ("c", 0, 1)}


def test_chain_assembly_cycle_refused(spark):
    ndf = spark.createDataFrame([("a",), ("b",), ("c",)], "id string")
    edf = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    with pytest.raises(ChainCycleError):
        chain_assembly(ndf, edf, max_len=16)


def test_chain_assembly_exact_cap_boundary(spark):
    # length-8 chain with max_len=8: ceil(log2 8)=3 rounds must suffice
    ids = [f"n{i}" for i in range(8)]
    ndf = spark.createDataFrame([(n,) for n in ids], "id string")
    edf = spark.createDataFrame(list(zip(ids, ids[1:])), "src string, dst string")
    got = chain_assembly(ndf, edf, max_len=8)
    rows = {r["id"]: r["page_ix"] for r in got.collect()}
    assert rows == {f"n{i}": i for i in range(8)}
    release_pinned(got, blocking=True)
    # ...and a chain clearly past the cap's reach (3 rounds resolve
    # positions <= 2^3; position 11 cannot) must refuse, not mislabel
    ids12 = [f"m{i}" for i in range(12)]
    ndf12 = spark.createDataFrame([(n,) for n in ids12], "id string")
    edf12 = spark.createDataFrame(
        list(zip(ids12, ids12[1:])), "src string, dst string"
    )
    with pytest.raises(ChainCycleError):
        chain_assembly(ndf12, edf12, max_len=8)


def test_pagination_chains_from_html(spark):
    pages = [
        ("https://h.example/a/1",
         b'<html><link rel="next" href="/a/2"><p>x</p></html>'),
        ("https://h.example/a/2",
         b'<html><link rel="next" href="/a/3"><p>y</p></html>'),
        ("https://h.example/a/3", b"<html><p>z</p></html>"),
        ("https://h.example/solo", b"<html><p>s</p></html>"),
        # rel=next pointing outside the corpus: singleton
        ("https://h.example/b/1",
         b'<html><link rel="next" href="https://other.example/x"></html>'),
    ]
    df = spark.createDataFrame(pages, "url string, html binary")
    got = pagination_chains(df)
    rows = {r["url"]: (r["chain_head"], r["page_ix"], r["chain_len"])
            for r in got.collect()}
    release_pinned(got, blocking=True)
    assert rows == {
        "https://h.example/a/1": ("https://h.example/a/1", 0, 3),
        "https://h.example/a/2": ("https://h.example/a/1", 1, 3),
        "https://h.example/a/3": ("https://h.example/a/1", 2, 3),
        "https://h.example/solo": ("https://h.example/solo", 0, 1),
        "https://h.example/b/1": ("https://h.example/b/1", 0, 1),
    }


def test_redirect_resolve_basic_loop_external(spark):
    fetches = [
        ("u1", 301, "u2"),          # u1 -> u2 -> u3 (200)
        ("u2", 302, "u3"),
        ("u3", 200, None),
        ("u4", 200, None),          # plain page
        ("l1", 301, "l2"),          # 2-cycle: never terminal
        ("l2", 301, "l1"),
        ("e1", 307, "ext"),         # lands outside the fetch set
        ("n1", 301, None),          # 3xx without location: terminal in place
        ("n2", 301, ""),
    ]
    df = spark.createDataFrame(fetches, "url string, status int, location string")
    got = redirect_resolve(df, max_hops=5)
    rows = {r["url"]: (r["final_url"], r["hops"], r["terminal"])
            for r in got.collect()}
    release_pinned(got, blocking=True)
    assert rows["u1"] == ("u3", 2, True)
    assert rows["u2"] == ("u3", 1, True)
    assert rows["u3"] == ("u3", 0, True)
    assert rows["u4"] == ("u4", 0, True)
    assert rows["e1"] == ("ext", 1, True)
    assert rows["n1"] == ("n1", 0, True)
    assert rows["n2"] == ("n2", 0, True)
    # loop rows burned the full budget and are flagged non-terminal
    assert rows["l1"][1] == 5 and rows["l1"][2] is False
    assert rows["l2"][1] == 5 and rows["l2"][2] is False


def test_redirect_resolve_conflict_modes(spark):
    df = spark.createDataFrame(
        [("u", 301, "a"), ("u", 301, "b"), ("a", 200, None)],
        "url string, status int, location string",
    )
    with pytest.raises(ValueError, match="multiple fetch records"):
        redirect_resolve(df)
    got = redirect_resolve(df, on_conflict="min")
    rows = {r["url"]: (r["final_url"], r["terminal"]) for r in got.collect()}
    release_pinned(got, blocking=True)
    assert rows["u"] == ("a", True)


def test_chain_assembly_compact_equals_raw(spark):
    # same forest through the hashed-key path and the raw-id path;
    # int ids exercise type-generic hashing
    nodes = list(range(30))
    edges = [(i, i + 1) for i in range(30) if i % 5 != 4 and i + 1 < 30]
    ndf = spark.createDataFrame([(n,) for n in nodes], "id bigint")
    edf = spark.createDataFrame(edges, "src bigint, dst bigint")
    a = chain_assembly(ndf, edf, compact=True)
    ra = {r["id"]: (r["chain_head"], r["page_ix"], r["chain_len"])
          for r in a.collect()}
    release_pinned(a, blocking=True)
    b = chain_assembly(ndf, edf, compact=False)
    rb = {r["id"]: (r["chain_head"], r["page_ix"], r["chain_len"])
          for r in b.collect()}
    release_pinned(b, blocking=True)
    assert ra == rb == _walk_chains(nodes, edges)
