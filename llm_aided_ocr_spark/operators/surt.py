"""SURT keys and CDX-style capture-index records.

Web archives index captures by SURT (Sort-friendly URI Reordering
Transform — the key format of Common Crawl's CDX index and OpenWayback):
the host is lowercased, stripped of a leading ``www.``, label-REVERSED
and comma-joined, then ``)`` and the path are appended —
``https://www.Example.co.uk/a/b?q=1`` → ``uk,co,example)/a/b?q=1``.
Sorting by SURT clusters every page of a host, and every host of a
registrable domain, into one contiguous key range, so "all captures
under ``*.example.co.uk``" is a PREFIX scan instead of a full-index
filter — the property that makes CDX lookups work at archive scale.

``cdx_records`` emits the index relation itself: one row per capture
``(surt_key, ts14, digest, url)`` where ``ts14`` is the CDX 14-digit
UTC timestamp and ``digest`` the page fingerprint. Writing it sorted by
``(surt_key, ts14)`` (e.g. ``sortWithinPartitions`` after a range
repartition on ``surt_key``) reproduces the classic CDX file layout.

Normalization contract (pinned for the oracle): scheme and fragment
drop; host lowercases and loses ONE leading ``www.``; an explicit port
is kept after the reversed host (``uk,co,example:8080)/...``, matching
SURT's port form); the path+query is kept verbatim except that an empty
path becomes ``/``. Invalid/hostless urls yield NULL.

Scale shape: pure native split/reverse/concat projections — zero
Python, zero shuffle, scan-fused. Part of the web-curation suite; no
reference analogue (``llm_aided_ocr.py`` ingests PDFs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_URL_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)(:[0-9]+)?([^#]*)"


def surt_key_col(url_col: Column) -> Column:
    """The SURT key as one native column (NULL when no ``scheme://host``
    shape is present)."""
    u = F.coalesce(url_col, F.lit(""))
    host = F.lower(F.regexp_extract(u, _URL_RE, 1))
    host = F.regexp_replace(host, r"^www\.", "")
    port = F.regexp_extract(u, _URL_RE, 2)
    rest = F.regexp_extract(u, _URL_RE, 3)
    path = F.when(rest == "", F.lit("/")).otherwise(rest)
    key = F.concat(
        F.array_join(F.reverse(F.split(host, r"\.")), ","), port,
        F.lit(")"), path,
    )
    return F.when(host != "", key)


def cdx_records(
    pages_df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> DataFrame:
    """``(surt_key, ts14, digest, url)`` — one CDX index row per
    capture. ``digest`` is the md5 hex of the capture's text bytes (CDX
    uses SHA-1/Base32; the fingerprint CONTRACT — same bytes ⇒ same
    digest — is what matters, and md5 is engine-portable). ``ts14`` is
    UTC wall-clock regardless of the session timezone (rendered via
    ``to_utc_timestamp(ts, current_timezone())``, so the key is stable
    across driver configs — a timezone-dependent index key would be a
    correctness bug)."""
    ts14 = F.date_format(
        F.to_utc_timestamp(F.col(ts_col), F.current_timezone()),
        "yyyyMMddHHmmss",
    )
    digest = F.md5(F.encode(F.coalesce(F.col(text_col), F.lit("")), "UTF-8"))
    return pages_df.select(
        surt_key_col(F.col(url_col)).alias("surt_key"),
        ts14.alias("ts14"),
        digest.alias("digest"),
        F.col(url_col).alias("url"),
    )
