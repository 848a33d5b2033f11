"""HTML extraction parity with the reference fixture shape
(/root/reference/tests/conftest.py:20-32 re-derived, extractor.py:95-133)."""
import pandas as pd

from sparkharvester.htmlparse import parse_html_one, parse_html_stage

V3A = "a" * 56
V3B = "b" * 56

SAMPLE_HTML = f"""
<html><head><title>  Test Onion Page  </title>
<meta name="x" content="y"><link rel="stylesheet" href="s.css"></head>
<body>
<script>var hidden = "SHOULD NOT APPEAR";</script>
<style>.c {{ color: red }}</style>
<noscript>NOSCRIPT NOISE</noscript>
<h1>Welcome</h1>
<p>Some visible text.</p>
<a href="http://{V3A}.onion/page1">internal</a>
<a href="/relative/path">relative</a>
<a href="http://{V3B}.onion/other">external onion</a>
<a href="https://clearweb.example.com/">clearweb</a>
<a href="#fragment">frag</a>
<a href="javascript:void(0)">js</a>
<a href="mailto:a@b.c">mail</a>
</body></html>
"""


def test_title_extracted_and_stripped():
    r = parse_html_one(SAMPLE_HTML)
    assert r["title"] == "Test Onion Page"


def test_title_fallback():
    assert parse_html_one("<html><body>x</body></html>")["title"] == "No Title"


def test_noise_tags_decomposed():
    r = parse_html_one(SAMPLE_HTML)
    assert "SHOULD NOT APPEAR" not in r["text"]
    assert "color: red" not in r["text"]
    assert "NOSCRIPT NOISE" not in r["text"]
    assert "Welcome" in r["text"]
    assert "Some visible text." in r["text"]


def test_all_hrefs_harvested_raw():
    r = parse_html_one(SAMPLE_HTML)
    assert f"http://{V3A}.onion/page1" in r["hrefs"]
    assert "/relative/path" in r["hrefs"]
    assert "#fragment" in r["hrefs"]          # junk filtering is downstream
    assert len(r["hrefs"]) == 7


def test_hash_deterministic():
    a = parse_html_one(SAMPLE_HTML)
    b = parse_html_one(SAMPLE_HTML)
    assert a["content_hash"] == b["content_hash"]
    assert len(a["content_hash"]) == 64


def test_newline_collapse():
    html = "<body><p>a</p>\n\n\n\n\n<p>b</p></body>"
    r = parse_html_one(html)
    assert "\n\n\n" not in r["text"]


def test_spark_stage(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "url": [f"http://{V3A}.onion/", f"http://{V3B}.onion/"],
        "html": [SAMPLE_HTML, "<title>Two</title><p>body two</p>"],
    }))
    rows = {r["url"]: r for r in parse_html_stage(df).collect()}
    assert rows[f"http://{V3A}.onion/"]["title"] == "Test Onion Page"
    assert rows[f"http://{V3B}.onion/"]["title"] == "Two"
    assert len(rows[f"http://{V3A}.onion/"]["hrefs"]) == 7
