"""Report render parity (VERDICT r1 #8): the HTML report must carry a
per-type IOC registry section for every extracted IOC type present in
the data (reference report.py:470-489, extended to all 11 types) plus
a keyword-hits-by-category table, with per-type caps and "showing
first N of M" notes."""
from __future__ import annotations

from pyspark.sql import functions as F

from sparkharvester.constants import IOC_LIST_FIELDS
from sparkharvester.report import IOC_TITLES, analyze_pages, build_aggregates, render_html


def _pages_df(spark):
    """Synthetic pages whose text contains at least one IOC of EVERY
    type plus keywords from several categories."""
    ioc_text = (
        "contact admin@example-mkt.com or 203.0.113.7 "
        "md5 d41d8cd98f00b204e9800998ecf8427e "
        "sha1 da39a3ee5e6b4b0d3255bfef95601890afd80709 "
        "sha256 e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855 "
        "CVE-2024-12345 "
        "btc 1A1zP1eP5QGefi2DMPTfTL5SLmv7DivfNa "
        "xmr 44AFFq5kSiGBoZ4NMDwYtN18obc8AemS33DBLWs3H7otXft3XjrpDtQGv7SqSsaBYBb98uNbr2VBBEt7f2wfn3RVGQBEP3A "
        "onion vww6ybal4bd7szmgncyruucpgfkqahzddi37ktceo3ah7ngmcopnpyyd.onion "
        "site dark-market-example.com http://pay.example-mkt.com/checkout "
        "fentanyl counterfeit ransomware exploit"
    )
    rows = [
        (i, f"http://h{i}.onion/p", f"t{i}",
         ioc_text if i % 2 == 0 else "benign text about gardening tulips",
         f"http://h{i}.onion")
        for i in range(10)
    ]
    return spark.createDataFrame(
        rows, "doc_id int, url string, title string, text string, site string"
    )


def test_report_sections_all_ioc_types(spark, tmp_path):
    enriched = analyze_pages(_pages_df(spark))
    aggs = build_aggregates(enriched, ioc_cap=3)
    html = open(render_html(aggs, str(tmp_path / "r.html"))).read()

    present = {
        t for t in IOC_LIST_FIELDS
        if enriched.select(F.explode(t)).count() > 0
    }
    assert present == set(IOC_LIST_FIELDS)   # fixture really covers all 11
    for t in IOC_LIST_FIELDS:
        assert f"id='ioc-{t}'" in html, t
        assert IOC_TITLES[t] in html, t
    assert "Keyword hits by category" in html
    assert "IOC Registry" in html


def test_report_ioc_cap_and_note(spark, tmp_path):
    # 10 docs, each with a distinct email -> 5 distinct (even docs share
    # text) ... build uncapped first to know totals, then cap at 2
    base = _pages_df(spark).withColumn(
        "text",
        F.concat(F.col("text"), F.lit(" extra"),
                 F.col("doc_id").cast("string"), F.lit("@unique-dom.com")),
    )
    enriched = analyze_pages(base)
    aggs = build_aggregates(enriched, ioc_cap=2)
    iocs = aggs.global_iocs.filter(F.col("ioc_type") == "emails").collect()
    assert len(iocs) == 2                       # capped
    assert all(r["n_total"] == 11 for r in iocs)  # 10 unique + shared one
    html = open(render_html(aggs, str(tmp_path / "r2.html"))).read()
    assert "Showing first 2 of 11" in html


def test_keyword_hits_rollup(spark, tmp_path):
    enriched = analyze_pages(_pages_df(spark))
    aggs = build_aggregates(enriched)
    kw = {r["category"]: (r["total_hits"], r["pages_with_hits"])
          for r in aggs.keyword_hits.collect()}
    assert kw, "keyword table empty"
    # the fixture plants fentanyl / counterfeit / ransomware keywords on
    # the 5 even docs
    for cat in ("Illicit Substances", "Financial Fraud",
                "Malware & Ransomware"):
        assert cat in kw, (cat, kw)
        hits, pages = kw[cat]
        assert hits >= 5 and pages == 5


def test_report_graph_section_and_layout(spark, tmp_path):
    """VERDICT r4 task #5: the HTML report carries the graph section
    fed by the deterministic layout table, and the layout geometry
    holds: hubs on the radius-10 square ring, pages on a radius-2
    square ring around THEIR hub, coordinates a pure function of the
    node id (re-run identical)."""
    enriched = analyze_pages(_pages_df(spark))
    aggs = build_aggregates(enriched)
    html = open(render_html(aggs, str(tmp_path / "g.html"))).read()
    assert "<h2>Network graph</h2>" in html
    assert "page nodes positioned on radius-2 rings" in html

    nodes = {r["node"]: r for r in aggs.graph_nodes.collect()}
    hubs = {k: v for k, v in nodes.items() if v["kind"] == "site"}
    pages = {k: v for k, v in nodes.items() if v["kind"] == "page"}
    assert len(hubs) == 10 and len(pages) == 10
    for h in hubs.values():
        # square perimeter of radius 10: max(|x|,|y|) == 10
        assert abs(max(abs(h["x"]), abs(h["y"])) - 10.0) < 1e-9
        assert h["n_pages"] == 1
    for r in enriched.select("url", "site").collect():
        p, h = pages[r["url"]], hubs[r["site"]]
        dx, dy = p["x"] - h["x"], p["y"] - h["y"]
        assert abs(max(abs(dx), abs(dy)) - 2.0) < 1e-9  # radius-2 ring
    # risk aggregation: hub rank is the max of its pages' ranks
    for r in enriched.select("url", "site").collect():
        assert hubs[r["site"]]["risk_rank"] >= pages[r["url"]]["risk_rank"]

    again = {r["node"]: (r["x"], r["y"])
             for r in build_aggregates(enriched).graph_nodes.collect()}
    assert again == {k: (v["x"], v["y"]) for k, v in nodes.items()}
