"""sniff_mime / mime_dispatch_audit: magic-byte table order, leading-WS
HTML tolerance, declared-header normalization, NULL/blank handling."""

from __future__ import annotations

from llm_aided_ocr_spark.operators.mime import mime_dispatch_audit, sniff_mime

CASES = [
    ("pdf", b"%PDF-1.7 ...", "application/pdf"),
    ("gz", b"\x1f\x8b\x08\x00junk", "application/gzip"),
    ("zip", b"PK\x03\x04rest", "application/zip"),
    ("png", b"\x89PNG\r\n\x1a\nIHDR", "image/png"),
    ("jpg", b"\xff\xd8\xff\xe0\x00\x10JFIF", "image/jpeg"),
    ("gif", b"GIF89a\x01\x00", "image/gif"),
    ("webp", b"RIFF\x12\x34\x56\x78WEBPVP8 ", "image/webp"),
    ("html", b"  \r\n\t<!DOCTYPE HTML><html>", "text/html"),
    ("html2", b"<Body onload=x>", "text/html"),
    ("comment", b"<!-- hi --><p>", "text/html"),
    ("xml", b"\n<?xml version='1.0'?><urlset/>", "text/xml"),
    ("json", b" {\"a\": 1}", "application/json"),
    ("jsonarr", b"[1,2]", "application/json"),
    ("bin", b"\x00\x01\x02\x03", "application/octet-stream"),
    ("empty", b"", "application/octet-stream"),
    # riff but not webp -> falls through to octet-stream
    ("wav", b"RIFF\x12\x34\x56\x78WAVEfmt ", "application/octet-stream"),
    # pdf marker NOT at offset 0 is not a pdf
    ("notpdf", b" %PDF-1.7", "application/octet-stream"),
]


def test_sniff_mime_table(spark):
    df = spark.createDataFrame(
        [(u, p) for u, p, _ in CASES], "url string, payload binary"
    )
    got = {r["id"]: r["sniffed_type"] for r in sniff_mime(df).collect()}
    assert got == {u: want for u, _, want in CASES}


def test_sniff_mime_null_payload(spark):
    df = spark.createDataFrame([("u", None)], "url string, payload binary")
    assert sniff_mime(df).collect()[0]["sniffed_type"] == "application/octet-stream"


def test_mime_dispatch_audit(spark):
    rows = [
        # agree after normalization: params dropped, case folded, OWS
        ("a", b"<html><p>x</p>", " Text/HTML; charset=UTF-8 "),
        # disagree: server said html, payload is a PDF
        ("b", b"%PDF-1.4", "text/html"),
        # header absent -> declared NULL, never "agrees"
        ("c", b"\x1f\x8b\x08\x00", None),
        # header blank -> treated as absent
        ("d", b"GIF87a", "   "),
    ]
    df = spark.createDataFrame(rows, "url string, payload binary, content_type string")
    got = {r["id"]: r for r in mime_dispatch_audit(df).collect()}
    a = got["a"]
    assert (a["declared_type"], a["sniffed_type"], a["agree"]) == (
        "text/html", "text/html", True
    )
    b = got["b"]
    assert (b["declared_type"], b["sniffed_type"], b["agree"]) == (
        "text/html", "application/pdf", False
    )
    assert got["c"]["declared_type"] is None and got["c"]["agree"] is False
    assert got["d"]["declared_type"] is None and got["d"]["agree"] is False


def test_sniff_is_scan_fused(spark):
    """Zero exchanges, zero Python stages in the physical plan."""
    df = spark.createDataFrame([("u", b"%PDF-")], "url string, payload binary")
    plan = sniff_mime(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan
