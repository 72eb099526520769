"""End-to-end CLI test: python -m llm_aided_ocr_spark over a small pages
table in a subprocess (the CLI owns and stops its own SparkSession)."""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile


def test_cli_end_to_end(spark):
    from llm_aided_ocr_spark.sources.synthetic import pages_dataframe

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory() as tmp:
        inp = os.path.join(tmp, "pages.parquet")
        out = os.path.join(tmp, "out")
        pages_dataframe(spark, n_rows=6, include_golden=True).write.parquet(inp)

        proc = subprocess.run(
            [
                sys.executable, "-m", "llm_aided_ocr_spark",
                "--input", inp, "--output", out,
                "--provider", "heuristic", "--assess-quality",
                "--master", "local[2]",
            ],
            capture_output=True, text=True, timeout=300,
            cwd=repo, env=dict(os.environ, PYTHONPATH=repo),
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "wrote 6 corrected documents" in proc.stdout
        assert "quality: n=6" in proc.stdout

        corrected = spark.read.parquet(os.path.join(out, "corrected_docs"))
        raw = spark.read.parquet(os.path.join(out, "raw_pages"))
        scores = spark.read.parquet(os.path.join(out, "quality_scores"))
        assert corrected.count() == 6
        assert scores.count() == 6
        # two-sink contract: raw_pages carries the pre-correction text
        src = {r["url"]: r["text"] for r in spark.read.parquet(inp).collect()}
        got = {r["url"]: r["raw_text"] for r in raw.collect()}
        assert got == src


def test_cli_curate_mode(spark):
    from llm_aided_ocr_spark.sources.synthetic import pages_dataframe
    from pyspark.sql import functions as F

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory() as tmp:
        inp = os.path.join(tmp, "pages.parquet")
        out = os.path.join(tmp, "out")
        base = pages_dataframe(spark, n_rows=8, include_golden=False)
        dups = base.limit(3).withColumn("url", F.concat(F.lit("dup-"), "url"))
        base.unionByName(dups).write.parquet(inp)

        proc = subprocess.run(
            [
                sys.executable, "-m", "llm_aided_ocr_spark",
                "--input", inp, "--output", out,
                "--provider", "heuristic", "--curate", "--no-near-dedup",
                "--master", "local[2]",
            ],
            capture_output=True, text=True, timeout=300,
            cwd=repo, env=dict(os.environ, PYTHONPATH=repo),
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "curated documents" in proc.stdout
        assert "split=" in proc.stdout

        curated = spark.read.parquet(os.path.join(out, "curated_docs"))
        rows = curated.collect()
        # the 3 exact dups collapsed; url unique; split assigned
        urls = [r["url"] for r in rows]
        assert len(urls) == len(set(urls))
        texts = [r["corrected_text"] for r in rows]
        assert len(texts) == len(set(texts)), "exact dups must be gone"
        assert {"split", "quality_score"} <= set(curated.columns)


def test_cli_curate_write_shards(spark):
    """--curate --write-shards: training shards land under OUTPUT/shards
    with a manifest that accounts for every curated document."""
    from llm_aided_ocr_spark.sources.synthetic import pages_dataframe

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory() as tmp:
        inp = os.path.join(tmp, "pages.parquet")
        out = os.path.join(tmp, "out")
        pages_dataframe(spark, n_rows=8, include_golden=False).write.parquet(inp)

        proc = subprocess.run(
            [
                sys.executable, "-m", "llm_aided_ocr_spark",
                "--input", inp, "--output", out,
                "--provider", "heuristic", "--curate", "--no-near-dedup",
                "--write-shards", "--shard-budget", "256",
                "--num-shards", "2", "--master", "local[2]",
            ],
            capture_output=True, text=True, timeout=300,
            cwd=repo, env=dict(os.environ, PYTHONPATH=repo),
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "wrote training shards" in proc.stdout

        curated = spark.read.parquet(os.path.join(out, "curated_docs"))
        shards = spark.read.parquet(os.path.join(out, "shards"))
        assert shards.count() == curated.count()
        assert {"split", "shard", "stream", "bin_ix", "n_tokens"} <= set(
            shards.columns
        )
        manifest = spark.read.parquet(os.path.join(out, "shards", "_manifest"))
        assert (
            sum(r["n_docs"] for r in manifest.collect()) == curated.count()
        )


def test_cli_incremental_dedup_mode(spark):
    """Two CLI invocations sharing one index dir: batch 2's copy of a
    batch-1 document is dropped against the index, unique docs append."""
    from pyspark.sql import functions as F

    from llm_aided_ocr_spark.sources.synthetic import pages_dataframe

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory() as tmp:
        in1 = os.path.join(tmp, "batch1.parquet")
        in2 = os.path.join(tmp, "batch2.parquet")
        out = os.path.join(tmp, "out")
        idx = os.path.join(tmp, "sig_index")
        b1 = pages_dataframe(spark, n_rows=4, include_golden=False)
        b1.write.parquet(in1)
        # batch 2: one near-copy of a batch-1 doc (re-urled) + one new doc
        copy = b1.limit(1).select(
            F.concat(F.lit("copy-"), "url").alias("url"),
            "warc_ts", "html",
            F.concat("text", F.lit(" tail")).alias("text"),
            "lang",
        )
        new = b1.limit(1).select(
            F.lit("https://fresh.test/x").alias("url"),
            "warc_ts", "html",
            F.lit(
                "entirely fresh words never seen in any earlier batch at all"
            ).alias("text"),
            "lang",
        )
        copy.union(new).write.parquet(in2)

        env = dict(os.environ, PYTHONPATH=repo)
        for inp in (in1, in2):
            proc = subprocess.run(
                [
                    sys.executable, "-m", "llm_aided_ocr_spark",
                    "--input", inp, "--output", out,
                    "--dedup-incremental", idx,
                    "--near-dup-threshold", "0.5",
                    "--master", "local[2]",
                ],
                capture_output=True, text=True, cwd=repo, env=env,
                timeout=600,
            )
            assert proc.returncode == 0, proc.stderr[-2000:]
        kept = spark.read.parquet(os.path.join(out, "kept_docs"))
        urls = sorted(r.url for r in kept.collect())
        assert "https://fresh.test/x" in urls
        assert not any(u.startswith("copy-") for u in urls)
        assert len(urls) == 5  # 4 from batch 1 + the fresh doc
        sigs = spark.read.parquet(idx)
        assert sigs.count() == 5


def test_cli_from_warc_mode(spark):
    """--from-warc: a directory of real WARC segment files (one gzip, one
    plain) drives the full html pipeline; raw_pages carries the
    DOM-stripped text per url."""
    import gzip

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def record(url, body):
        payload = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        return (
            b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: " + url
            + b"\r\nWARC-Date: 2017-01-02T03:00:00Z\r\nContent-Length: "
            + str(len(payload)).encode() + b"\r\n\r\n" + payload + b"\r\n\r\n"
        )

    with tempfile.TemporaryDirectory() as tmp:
        seg_dir = os.path.join(tmp, "segments")
        os.makedirs(seg_dir)
        seg1 = record(b"http://a.org/1", b"<html><body><p>alpha beta</p></body></html>")
        seg1 += record(b"http://a.org/2", b"<html><body><p>gamma delta</p></body></html>")
        with open(os.path.join(seg_dir, "seg1.warc"), "wb") as f:
            f.write(seg1)
        with open(os.path.join(seg_dir, "seg2.warc.gz"), "wb") as f:
            f.write(gzip.compress(record(
                b"http://b.org/3", b"<html><body><p>epsilon zeta</p></body></html>"
            )))
        out = os.path.join(tmp, "out")
        proc = subprocess.run(
            [
                sys.executable, "-m", "llm_aided_ocr_spark",
                "--input", seg_dir, "--output", out,
                "--from-warc", "--provider", "heuristic",
                "--master", "local[2]",
            ],
            capture_output=True, text=True, timeout=300,
            cwd=repo, env=dict(os.environ, PYTHONPATH=repo),
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        raw = {
            r["url"]: r["raw_text"]
            for r in spark.read.parquet(os.path.join(out, "raw_pages")).collect()
        }
        assert raw == {
            "http://a.org/1": "alpha beta",
            "http://a.org/2": "gamma delta",
            "http://b.org/3": "epsilon zeta",
        }
        corrected = spark.read.parquet(os.path.join(out, "corrected_docs"))
        assert corrected.count() == 3

        # --from-warc --curate: the curation path must correct the
        # DOM-stripped html, not the (NULL) text column — round-5
        # regression: without use_html plumbing every doc normalized to
        # '' and exact dedup collapsed the corpus to one empty survivor
        out2 = os.path.join(tmp, "out_curated")
        proc = subprocess.run(
            [
                sys.executable, "-m", "llm_aided_ocr_spark",
                "--input", seg_dir, "--output", out2,
                "--from-warc", "--curate", "--no-near-dedup",
                "--provider", "heuristic", "--master", "local[2]",
            ],
            capture_output=True, text=True, timeout=300,
            cwd=repo, env=dict(os.environ, PYTHONPATH=repo),
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        curated = {
            r["url"]: r["corrected_text"]
            for r in spark.read.parquet(
                os.path.join(out2, "curated_docs")
            ).collect()
        }
        assert set(curated) == {
            "http://a.org/1", "http://a.org/2", "http://b.org/3"
        }
        assert all(t for t in curated.values())


def test_cli_curate_new_gate_flags(spark):
    """--canonical-dedup / --url-block-domain flow through to curate():
    blocked-domain pages and refetch spellings never reach the output."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory() as tmp:
        inp = os.path.join(tmp, "pages.parquet")
        out = os.path.join(tmp, "out")
        body = "A full sentence of body text for the page lives here now."
        rows = [
            ("http://keep.org/p1", None, None, body + " one", "en"),
            ("http://keep.org/p2", None, None, body + " two", "en"),
            # refetch pair: longest survives
            ("http://dup.org/x", None, None, "short", "en"),
            ("HTTP://Dup.org:80/x#f", None, None, body + " longest", "en"),
            # blocked domain
            ("http://spam.bad.net/z", None, None, body + " spam", "en"),
        ]
        spark.createDataFrame(
            rows,
            "url string, warc_ts timestamp, html binary, text string, lang string",
        ).write.parquet(inp)
        proc = subprocess.run(
            [
                sys.executable, "-m", "llm_aided_ocr_spark",
                "--input", inp, "--output", out,
                "--curate", "--no-near-dedup",
                "--canonical-dedup",
                "--url-block-domain", "spam.bad.net",
                "--provider", "heuristic", "--master", "local[2]",
            ],
            capture_output=True, text=True, timeout=300,
            cwd=repo, env=dict(os.environ, PYTHONPATH=repo),
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        urls = {
            r["url"]
            for r in spark.read.parquet(
                os.path.join(out, "curated_docs")
            ).collect()
        }
        assert urls == {
            "http://keep.org/p1", "http://keep.org/p2", "HTTP://Dup.org:80/x#f",
        }


def test_cli_dedup_incremental_from_warc(spark):
    """--from-warc --dedup-incremental signatures must be computed over
    the EXTRACTED text (WARC pages carry NULL text); under the round-5
    bug every page hashed to the same empty shingle set."""
    import gzip

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def record(url, words):
        body = ("<html><body><p>" + words + "</p></body></html>").encode()
        payload = b"HTTP/1.1 200 OK\r\n\r\n" + body
        return (
            b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "
            + url.encode()
            + b"\r\nWARC-Date: 2017-01-02T03:00:00Z\r\nContent-Length: "
            + str(len(payload)).encode() + b"\r\n\r\n" + payload + b"\r\n\r\n"
        )

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    fresh = ("entirely different vocabulary with no overlap whatsoever "
             "spanning many unique tokens of its very own making here")
    with tempfile.TemporaryDirectory() as tmp:
        seg1 = os.path.join(tmp, "b1")
        seg2 = os.path.join(tmp, "b2")
        os.makedirs(seg1); os.makedirs(seg2)
        with open(os.path.join(seg1, "s.warc.gz"), "wb") as f:
            f.write(gzip.compress(record("http://a.org/1", base)))
        with open(os.path.join(seg2, "s.warc.gz"), "wb") as f:
            f.write(
                gzip.compress(record("http://a.org/copy", base + " tail"))
                + gzip.compress(record("http://b.org/fresh", fresh))
            )
        out = os.path.join(tmp, "out")
        idx = os.path.join(tmp, "idx")
        env = dict(os.environ, PYTHONPATH=repo)
        for seg in (seg1, seg2):
            proc = subprocess.run(
                [
                    sys.executable, "-m", "llm_aided_ocr_spark",
                    "--input", seg, "--output", out,
                    "--from-warc", "--dedup-incremental", idx,
                    "--near-dup-threshold", "0.5",
                    "--master", "local[2]",
                ],
                capture_output=True, text=True, cwd=repo, env=env,
                timeout=600,
            )
            assert proc.returncode == 0, proc.stderr[-2000:]
        kept = spark.read.parquet(os.path.join(out, "kept_docs"))
        urls = sorted(r.url for r in kept.collect())
        assert urls == ["http://a.org/1", "http://b.org/fresh"]
        texts = {r.url: r.text for r in kept.collect()}
        assert all(t for t in texts.values())


def test_cli_from_wet_mode(spark):
    """--from-wet: a directory of WET conversion-record files feeds the
    pipeline with pre-extracted text (no DOM strip); raw_pages carries
    that text per url."""
    import gzip

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def record(url, text):
        payload = text.encode()
        return (
            b"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: " + url
            + b"\r\nWARC-Date: 2019-05-06T07:00:00Z\r\nContent-Type: text/plain"
            + b"\r\nContent-Length: " + str(len(payload)).encode()
            + b"\r\n\r\n" + payload + b"\r\n\r\n"
        )

    with tempfile.TemporaryDirectory() as tmp:
        seg_dir = os.path.join(tmp, "segments")
        os.makedirs(seg_dir)
        with open(os.path.join(seg_dir, "seg1.warc.wet"), "wb") as f:
            f.write(record(b"http://a.org/1", "alpha beta")
                    + record(b"http://a.org/2", "gamma delta"))
        with open(os.path.join(seg_dir, "seg2.warc.wet.gz"), "wb") as f:
            f.write(gzip.compress(record(b"http://b.org/3", "epsilon zeta")))
        out = os.path.join(tmp, "out")
        proc = subprocess.run(
            [
                sys.executable, "-m", "llm_aided_ocr_spark",
                "--input", seg_dir, "--output", out,
                "--from-wet", "--provider", "heuristic",
                "--master", "local[2]",
            ],
            capture_output=True, text=True, timeout=300,
            cwd=repo, env=dict(os.environ, PYTHONPATH=repo),
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        raw = {
            r["url"]: r["raw_text"]
            for r in spark.read.parquet(os.path.join(out, "raw_pages")).collect()
        }
        assert raw == {
            "http://a.org/1": "alpha beta",
            "http://a.org/2": "gamma delta",
            "http://b.org/3": "epsilon zeta",
        }


def test_cli_density_extract_mode(spark):
    """--density-extract swaps the DOM strip for block-level link-density
    selection: the nav/footer chrome that the default strip drops by TAG
    is here dropped by DENSITY, and a link-heavy <div> that the default
    strip would keep is shed too."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory() as tmp:
        inp = os.path.join(tmp, "pages.parquet")
        out = os.path.join(tmp, "out")
        prose = "The quick brown fox jumps over the lazy dog tonight."
        html = (
            "<body>"
            "<div><a href='/a'>one two</a> <a href='/b'>three four</a></div>"
            f"<p>{prose}</p>"
            "</body>"
        ).encode()
        spark.createDataFrame(
            [("u1", None, html, None, "en")],
            "url string, warc_ts timestamp, html binary, text string, lang string",
        ).write.parquet(inp)

        proc = subprocess.run(
            [
                sys.executable, "-m", "llm_aided_ocr_spark",
                "--input", inp, "--output", out,
                "--provider", "identity", "--from-html", "--density-extract",
                "--no-raw", "--master", "local[2]",
            ],
            capture_output=True, text=True, timeout=300,
            cwd=repo, env=dict(os.environ, PYTHONPATH=repo),
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        rows = spark.read.parquet(os.path.join(out, "corrected_docs")).collect()
        assert len(rows) == 1 and rows[0]["corrected_text"] == prose

        # without --from-html the flag is rejected
        proc2 = subprocess.run(
            [
                sys.executable, "-m", "llm_aided_ocr_spark",
                "--input", inp, "--output", out + "2",
                "--density-extract", "--master", "local[2]",
            ],
            capture_output=True, text=True, timeout=300,
            cwd=repo, env=dict(os.environ, PYTHONPATH=repo),
        )
        assert proc2.returncode == 2
        assert "--density-extract requires" in proc2.stderr


def test_cli_sniff_charset_mode(spark):
    """--sniff-charset decodes declared non-utf-8 pages correctly before
    the DOM strip; without it the same bytes extract a U+FFFD run."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory() as tmp:
        inp = os.path.join(tmp, "pages.parquet")
        html = (
            b'<html><head><meta charset="windows-1252"><title>t</title>'
            b"</head><body><main><p>He said \x93caf\xe9\x94 loudly.</p>"
            b"</main></body></html>"
        )
        spark.createDataFrame(
            [("u1", None, html, None, "en")],
            "url string, warc_ts timestamp, html binary, text string, lang string",
        ).write.parquet(inp)

        def run(extra):
            out = os.path.join(tmp, "out_" + "_".join(extra) or "plain")
            proc = subprocess.run(
                [
                    sys.executable, "-m", "llm_aided_ocr_spark",
                    "--input", inp, "--output", out,
                    "--provider", "identity", "--from-html", "--no-raw",
                    "--master", "local[2]", *extra,
                ],
                capture_output=True, text=True, timeout=300,
                cwd=repo, env=dict(os.environ, PYTHONPATH=repo),
            )
            assert proc.returncode == 0, proc.stderr[-2000:]
            rows = spark.read.parquet(os.path.join(out, "corrected_docs")).collect()
            return rows[0]["corrected_text"]

        assert run(["--sniff-charset"]) == "He said “café” loudly."
        assert "�" in run([])  # utf-8 assumption mangles cp1252 bytes


def test_cli_curate_r5_signal_flags(spark):
    """--mojibake-gate / --min-flesch / --max-per-domain with
    --domain-cap-registered flow through to curate(): the damaged page
    and the token soup are shed, and two subdomains of one eTLD+1 share
    the cap budget."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory() as tmp:
        inp = os.path.join(tmp, "pages.parquet")
        out = os.path.join(tmp, "out")
        body = "A full sentence of body text for the page lives here now."
        rows = [
            ("http://a.keep.org/p1", None, None, body + " one", "en"),
            ("http://b.keep.org/p2", None, None, body + " two", "en"),
            ("http://c.keep.org/p3", None, None, body + " three", "en"),
            # mojibake: dense double-encoding artifacts
            ("http://d.keep.org/bad", None, None,
             "ruined Ã©Ã©Ã© â€™â€™ bytes Ã±Ã± here", "en"),
            # unreadable token soup, no sentence marks
            ("http://e.keep.org/soup", None, None,
             "zxqv kjwq pzzt " * 40, "en"),
        ]
        spark.createDataFrame(
            rows,
            "url string, warc_ts timestamp, html binary, text string, lang string",
        ).write.parquet(inp)
        proc = subprocess.run(
            [
                sys.executable, "-m", "llm_aided_ocr_spark",
                "--input", inp, "--output", out,
                "--curate", "--no-near-dedup",
                "--mojibake-gate", "--min-flesch", "10",
                "--max-per-domain", "2", "--domain-cap-registered",
                "--provider", "heuristic", "--master", "local[2]",
            ],
            capture_output=True, text=True, timeout=300,
            cwd=repo, env=dict(os.environ, PYTHONPATH=repo),
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        urls = {
            r["url"]
            for r in spark.read.parquet(
                os.path.join(out, "curated_docs")
            ).collect()
        }
        # gates shed /bad and /soup; the eTLD+1 cap keeps 2 of the 3
        # clean pages even though each sits on its own subdomain host
        assert len(urls) == 2
        assert urls < {
            "http://a.keep.org/p1", "http://b.keep.org/p2",
            "http://c.keep.org/p3",
        }
