"""Deterministic test-payload enrichment, dual-dialect.

The driver's `documents` table is generic word-salad text, so IOC
regexes would all return empty arrays.  To make the IOC/URL operators
testable with a DuckDB oracle, we append deterministic IOC-bearing
suffixes derived from ``doc_id`` — computed with IDENTICAL string
expressions in Spark and DuckDB so both engines see byte-identical
input text.  No randomness, no external data.
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _s(c: Column) -> Column:
    return c.cast("string")


def enriched_text_spark(doc_id: Column, text: Column) -> Column:
    """text + deterministic IOC suffix (Spark side)."""
    d = doc_id
    ip_pub = F.concat(
        F.lit(" ip="),
        _s(d % 223 + 1), F.lit("."), _s((d * 7) % 256), F.lit("."),
        _s((d * 13) % 256), F.lit("."), _s(d % 254 + 1),
    )
    ip_priv = F.when(
        d % 3 == 0,
        F.concat(F.lit(" 192.168.1."), _s(d % 200)),
    ).otherwise(F.lit(""))
    email = F.concat(
        F.lit(" contact user"), _s(d), F.lit("@example"), _s(d % 10), F.lit(".com")
    )
    cve = F.when(
        d % 5 == 0,
        F.concat(F.lit(" cve-20"), F.lpad(_s(d % 26), 2, "0"),
                 F.lit("-"), _s(d % 9000 + 1000)),
    ).otherwise(F.lit(""))
    url = F.when(
        d % 7 == 0,
        F.concat(F.lit(" visit http://site"), _s(d), F.lit(".example.org/path")),
    ).otherwise(F.lit(""))
    pgp = F.when(d % 11 == 0, F.lit(" -----BEGIN PGP MESSAGE-----")).otherwise(F.lit(""))
    onion = F.when(
        d % 13 == 0,
        F.concat(F.lit(" mirror "),
                 F.rpad(F.translate(_s(d % 100000), "0123456789", "abcdefghij"),
                        56, "x"),
                 F.lit(".onion")),
    ).otherwise(F.lit(""))
    return F.concat(text, ip_pub, ip_priv, email, cve, url, pgp, onion)


def enriched_text_sql(doc_id: str = "doc_id", text: str = "text") -> str:
    """Same enrichment, DuckDB dialect (byte-identical output)."""
    d = doc_id
    return (
        f"{text}"
        f" || ' ip=' || CAST({d} % 223 + 1 AS VARCHAR)"
        f" || '.' || CAST(({d} * 7) % 256 AS VARCHAR)"
        f" || '.' || CAST(({d} * 13) % 256 AS VARCHAR)"
        f" || '.' || CAST({d} % 254 + 1 AS VARCHAR)"
        f" || CASE WHEN {d} % 3 = 0 THEN ' 192.168.1.' || CAST({d} % 200 AS VARCHAR) ELSE '' END"
        f" || ' contact user' || CAST({d} AS VARCHAR) || '@example' || CAST({d} % 10 AS VARCHAR) || '.com'"
        f" || CASE WHEN {d} % 5 = 0 THEN ' cve-20' || lpad(CAST({d} % 26 AS VARCHAR), 2, '0')"
        f" || '-' || CAST({d} % 9000 + 1000 AS VARCHAR) ELSE '' END"
        f" || CASE WHEN {d} % 7 = 0 THEN ' visit http://site' || CAST({d} AS VARCHAR) || '.example.org/path' ELSE '' END"
        f" || CASE WHEN {d} % 11 = 0 THEN ' -----BEGIN PGP MESSAGE-----' ELSE '' END"
        f" || CASE WHEN {d} % 13 = 0 THEN ' mirror ' ||"
        f" rpad(translate(CAST({d} % 100000 AS VARCHAR), '0123456789', 'abcdefghij'), 56, 'x')"
        f" || '.onion' ELSE '' END"
    )


def synth_url_spark(doc_id: Column) -> Column:
    """Deterministic messy URL per doc_id (canonicalization test input).

    Shapes exercised (extractor.py:51-70 + filters F1-F3):
    mixed-case scheme/host, trailing slash, unsorted + empty query
    params, fragments, invalid clearweb hosts, blacklisted paths,
    junk schemes.
    """
    d = doc_id
    host = F.rpad(F.translate(_s(d % 997), "0123456789", "abcdefghij"), 56, "q")
    scheme = F.when(d % 2 == 0, F.lit("HTTP://")).otherwise(F.lit("http://"))
    tail = (
        F.when(d % 17 == 0, F.lit("javascript:void(0)"))
        .when(d % 19 == 0, F.concat(F.lit("https://clearweb"), _s(d), F.lit(".example.com/page")))
        .when(d % 23 == 0, F.concat(scheme, host, F.lit(".onion/login")))
        .otherwise(
            F.concat(
                scheme, host, F.lit(".ONION/Page/"), _s(d % 50),
                F.when(d % 4 == 0, F.lit("/")).otherwise(F.lit("")),
                F.when(d % 3 == 0, F.lit("?b=2&a=1&empty=")).otherwise(F.lit("")),
                F.when(d % 5 == 0, F.lit("#frag")).otherwise(F.lit("")),
            )
        )
    )
    return tail


def synth_url_sql(doc_id: str = "doc_id") -> str:
    d = doc_id
    host = f"rpad(translate(CAST({d} % 997 AS VARCHAR), '0123456789', 'abcdefghij'), 56, 'q')"
    scheme = f"CASE WHEN {d} % 2 = 0 THEN 'HTTP://' ELSE 'http://' END"
    return (
        f"CASE WHEN {d} % 17 = 0 THEN 'javascript:void(0)'"
        f" WHEN {d} % 19 = 0 THEN 'https://clearweb' || CAST({d} AS VARCHAR) || '.example.com/page'"
        f" WHEN {d} % 23 = 0 THEN ({scheme}) || {host} || '.onion/login'"
        f" ELSE ({scheme}) || {host} || '.ONION/Page/' || CAST({d} % 50 AS VARCHAR)"
        f" || CASE WHEN {d} % 4 = 0 THEN '/' ELSE '' END"
        f" || CASE WHEN {d} % 3 = 0 THEN '?b=2&a=1&empty=' ELSE '' END"
        f" || CASE WHEN {d} % 5 = 0 THEN '#frag' ELSE '' END"
        f" END"
    )
