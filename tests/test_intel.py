"""Intelligence-layer parity with the reference's own test vectors
(/root/reference/tests/test_intelligence.py:112-334, re-derived)."""
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparkharvester.intel import with_intel, with_iocs, with_threat


def _analyze(spark, text):
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": [text]}))
    return with_intel(df).collect()[0]


def test_ipv4_public_private(spark):
    r = _analyze(spark, "connect to 8.8.8.8 and 127.0.0.1 and 10.0.0.5 "
                        "and 192.168.1.1 and 1.2.3.4")
    assert r["ipv4"] == ["1.2.3.4", "8.8.8.8"]


def test_ipv4_dedup_sorted(spark):
    r = _analyze(spark, "9.9.9.9 8.8.8.8 9.9.9.9")
    assert r["ipv4"] == ["8.8.8.8", "9.9.9.9"]


def test_emails_with_tag(spark):
    r = _analyze(spark, "mail me: Bob.smith+tag@Example.org or x@y.co")
    assert r["emails"] == ["Bob.smith+tag@Example.org", "x@y.co"]


def test_hashes(spark):
    md5 = "d41d8cd98f00b204e9800998ecf8427e"
    sha1 = "da39a3ee5e6b4b0d3255bfef95601890afd80709"
    sha256 = "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"
    r = _analyze(spark, f"{md5} {sha1} {sha256}")
    assert r["md5"] == [md5]
    assert r["sha1"] == [sha1]
    # the 64-hex regex also matches sha256 — and md5 is inside sha1/sha256?
    # no: \b boundaries prevent substring matches
    assert r["sha256"] == [sha256]


def test_cve_case_normalized(spark):
    r = _analyze(spark, "see cve-2021-44228 and CVE-2021-44228")
    assert r["cves"] == ["CVE-2021-44228"]


def test_btc_addresses(spark):
    legacy = "1A1zP1eP5QGefi2DMPTfTL5SLmv7DivfNa"
    p2sh = "3J98t1WpEZ73CNmQviecrnyiWrnqRhWNLy"
    r = _analyze(spark, f"pay {legacy} or {p2sh}")
    assert set(r["btc_addresses"]) == {legacy, p2sh}


def test_onion_length_gate(spark):
    v3 = "a" * 56 + ".onion"
    v2 = "abcdefghij234567" + ".onion"   # 16 chars — rejected
    r = _analyze(spark, f"{v3} and {v2}")
    assert r["onion_addresses"] == [v3]


def test_url_cap_50(spark):
    text = " ".join(f"http://example{i:03d}.com/pagepath" for i in range(80))
    r = _analyze(spark, text)
    assert len(r["urls"]) == 50
    assert r["urls"] == sorted(r["urls"])


def test_pgp_flag(spark):
    assert _analyze(spark, "-----BEGIN PGP MESSAGE-----")["pgp_present"]
    assert not _analyze(spark, "no pgp here")["pgp_present"]


def test_empty_text(spark):
    r = _analyze(spark, "")
    assert r["ioc_total"] == 0
    assert r["risk_label"] == "Low"
    assert r["risk_score"] == 0.0
    assert r["categories"] == []


def test_density_dilution(spark):
    """test_intelligence.py:318-323 analog: one keyword diluted in ~5000
    filler words scores low."""
    filler = " ".join(f"word{i}" for i in range(5000))
    r = _analyze(spark, "malware " + filler)
    assert r["risk_label"] == "Low"
    assert r["risk_score"] < 4.0


def test_density_saturation_critical(spark):
    r = _analyze(spark, "malware ransomware " * 300)
    assert r["risk_label"] == "Critical"
    assert r["risk_score"] == 9.5
    assert "Malware & Ransomware" in r["categories"]


def test_reference_formula(spark):
    """score = min(hits/(wc/1000),1)*weight*10 (intelligence.py:307-309)."""
    # 1 hit of 'cocaine' (weight .8) in 100 words: density=min(10,1)=1 → 8.0
    text = "cocaine " + " ".join(f"w{i}" for i in range(99))
    r = _analyze(spark, text)
    assert r["risk_score"] == pytest.approx(8.0)
    assert r["risk_label"] == "High"
    assert r["keyword_hits"]["Illicit Substances"] == 1


def test_substring_count_semantics(spark):
    """str.count semantics: 'ssh login' also counts 'login'
    (intelligence.py:304 — overlapping categories double-count)."""
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0], "text": ["ssh login now"]}))
    r = with_threat(df).collect()[0]
    # 'login' (1) + 'ssh login' (1) = 2 hits for Credentials & Leaks
    assert r["keyword_hits"]["Credentials & Leaks"] == 2


def test_ioc_total_includes_all_lists(spark):
    r = _analyze(spark, "8.8.4.4 a@b.com CVE-2020-1234 "
                        "http://someurl.example.net/path")
    # ipv4 + email + cve + url + domains(b.com? 'b.com' matches; example.net)
    assert r["ioc_total"] == len(r["ipv4"]) + len(r["emails"]) + \
        len(r["md5"]) + len(r["sha1"]) + len(r["sha256"]) + len(r["cves"]) + \
        len(r["btc_addresses"]) + len(r["xmr_addresses"]) + \
        len(r["onion_addresses"]) + len(r["domains"]) + len(r["urls"])


def _reference_as_dict(row) -> dict:
    """Reference IOCs.as_dict() serialization contract, re-derived from
    intelligence.py:164-179: fixed key order, urls capped at 20 IN THE
    DICT while total counts the uncapped (<=50) extraction lists."""
    return {
        "ipv4": list(row["ipv4"]),
        "emails": list(row["emails"]),
        "md5": list(row["md5"]),
        "sha1": list(row["sha1"]),
        "sha256": list(row["sha256"]),
        "cves": list(row["cves"]),
        "btc_addresses": list(row["btc_addresses"]),
        "xmr_addresses": list(row["xmr_addresses"]),
        "onion_addresses": list(row["onion_addresses"]),
        "domains": list(row["domains"]),
        "urls": list(row["urls"])[:20],
        "pgp_present": bool(row["pgp_present"]),
        "total": int(row["ioc_total"]),
    }


def _ioc_blob(spark, text):
    from sparkharvester.intel import ioc_data_column

    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": [text]}))
    row = with_iocs(df).withColumn("ioc_data", ioc_data_column()).collect()[0]
    return row, row["ioc_data"]


def test_ioc_data_byte_parity_mixed(spark):
    """The durable ioc_data blob must byte-equal the reference's
    json.dumps(iocs.as_dict()) (storage.py:129, default separators)."""
    import json

    text = ("8.8.8.8 leaked a@b.com and cve-2021-44228; md5 "
            "d41d8cd98f00b204e9800998ecf8427e; visit http://evil.example"
            ".net/path?id=1 market on example.com -----BEGIN PGP")
    row, blob = _ioc_blob(spark, text)
    assert blob == json.dumps(_reference_as_dict(row))
    assert row["pgp_present"] is True
    assert row["ipv4"] and row["emails"] and row["cves"] and row["urls"]


def test_ioc_data_byte_parity_empty(spark):
    import json

    row, blob = _ioc_blob(spark, "nothing of interest here")
    assert blob == json.dumps(_reference_as_dict(row))
    assert '"ipv4": []' in blob and '"pgp_present": false' in blob


def test_ioc_data_url_cap_20_total_uncapped(spark):
    """>20 urls: the blob serialises 20 (as_dict cap) while total keeps
    counting the <=50-capped extraction list — reference parity."""
    import json

    urls = " ".join(f"http://site{i:02d}.example.org/page" for i in range(30))
    row, blob = _ioc_blob(spark, urls)
    assert len(row["urls"]) == 30
    d = json.loads(blob)
    assert len(d["urls"]) == 20
    assert d["total"] == row["ioc_total"] >= 30
    assert blob == json.dumps(_reference_as_dict(row))


def test_ioc_data_escapes_backslash_url(spark):
    """ADVICE r4 (high): a URL containing a backslash must yield a
    VALID JSON blob, byte-equal to the reference's json.dumps."""
    import json

    text = r"exploit at http://evil.example.net/a\b\c?q=1 today"
    row, blob = _ioc_blob(spark, text)
    assert any("\\" in u for u in row["urls"])
    d = json.loads(blob)                       # must not raise
    assert d == _reference_as_dict(row)
    assert blob == json.dumps(_reference_as_dict(row))


def test_ioc_data_escapes_control_chars(spark):
    """Non-\\s control chars pass the urls charset; the blob must
    escape them as json.dumps does (\\u00xx lowercase / short forms)."""
    import json

    text = "see http://evil.example.net/p\x01q\x08r\x1fs#x now"
    row, blob = _ioc_blob(spark, text)
    assert any("\x01" in u for u in row["urls"])
    d = json.loads(blob)
    assert d == _reference_as_dict(row)
    assert blob == json.dumps(_reference_as_dict(row))
    assert "\\u0001" in blob and "\\u001f" in blob and "\\b" in blob


def test_ioc_data_non_ascii_value_parity(spark):
    """Documented divergence (ADVICE r4): the reference's json.dumps
    default ensure_ascii=True emits \\uXXXX for non-ASCII while our
    blob keeps raw UTF-8.  Both are valid JSON and parse to the same
    value — we pin value parity and the divergence direction."""
    import json

    text = "cache at http://evil.example.net/café/page fresh"
    row, blob = _ioc_blob(spark, text)
    assert any("é" in u for u in row["urls"])
    ref = json.dumps(_reference_as_dict(row))
    assert json.loads(blob) == json.loads(ref) == _reference_as_dict(row)
    assert blob != ref and "café" in blob and "caf\\u00e9" in ref
