"""Report aggregation queries + self-contained HTML render (S11, A2-A8).

All report inputs are small post-aggregation DataFrames (bounded by
site count / top-k caps), so the render is driver-side over collected
aggregates — the heavy lifting (scans, joins, group-bys) happens in
Spark, mirroring report.py:255-639 of the reference where everything
was in-memory Python.
"""
from __future__ import annotations

import html as html_mod
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .intel import risk_label_expr, with_intel


@dataclass
class ReportAggregates:
    risk_histogram: DataFrame      # A4
    summary_cards: DataFrame       # A2/A5
    site_rollup: DataFrame         # A7/A8
    top_categories: DataFrame      # A3/O4
    high_risk_topk: DataFrame      # O1/F8
    global_iocs: DataFrame         # D6/O7


def build_aggregates(pages_with_intel: DataFrame, top_k: int = 50,
                     ioc_cap: int = 100) -> ReportAggregates:
    """All report queries over a pages DataFrame carrying intel columns
    (with_intel output).  Reference: report.py:293-639."""
    df = pages_with_intel

    risk_histogram = df.groupBy("risk_label").agg(F.count("*").alias("n"))

    summary_cards = df.agg(
        F.count("*").alias("total_pages"),
        F.countDistinct("site").alias("total_sites"),
        F.sum("ioc_total").cast("long").alias("total_iocs"),
        F.sum(F.when(F.col("risk_label").isin("High", "Critical"), 1)
              .otherwise(0)).cast("long").alias("high_risk_pages"),
        F.sum(F.size("cves")).cast("long").alias("total_cves"),
        F.sum(F.size("btc_addresses")).cast("long").alias("total_btc"),
        F.sum(F.size("emails")).cast("long").alias("total_emails"),
        F.sum(F.size("md5") + F.size("sha1") + F.size("sha256"))
         .cast("long").alias("total_file_hashes"),
        F.sum(F.size("onion_addresses")).cast("long").alias("total_onion_refs"),
    )

    site_rollup = (
        df.groupBy("site")
        .agg(
            F.count("*").alias("page_count"),
            F.sum("ioc_total").cast("long").alias("total_iocs"),
            F.max("risk_score").alias("max_risk"),
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("categories")))
            ).alias("categories"),
        )
        .withColumn("site_label", risk_label_expr(F.col("max_risk")))
        .orderBy("site")
    )

    top_categories = (
        df.select(F.explode("categories").alias("category"))
        .groupBy("category").agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("category"))
        .limit(3)
    )

    high_risk_topk = (
        df.filter(F.col("risk_label").isin("High", "Critical"))
        .orderBy(F.desc("risk_score"), F.asc("url"))
        .limit(top_k)
        .select("url", "site", "title", "risk_score", "risk_label",
                "categories", "ioc_total")
    )

    global_iocs = (
        df.select(F.explode("emails").alias("value"))
        .withColumn("ioc_type", F.lit("email"))
        .unionByName(
            df.select(F.explode("ipv4").alias("value"))
            .withColumn("ioc_type", F.lit("ipv4")))
        .unionByName(
            df.select(F.explode("cves").alias("value"))
            .withColumn("ioc_type", F.lit("cve")))
        .unionByName(
            df.select(F.explode("btc_addresses").alias("value"))
            .withColumn("ioc_type", F.lit("btc")))
        .distinct()
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("ioc_type").orderBy("value")
            ),
        )
        .filter(F.col("rn") <= ioc_cap)
        .drop("rn")
    )

    return ReportAggregates(
        risk_histogram=risk_histogram,
        summary_cards=summary_cards,
        site_rollup=site_rollup,
        top_categories=top_categories,
        high_risk_topk=high_risk_topk,
        global_iocs=global_iocs,
    )


def render_html(aggs: ReportAggregates, out_path: str) -> str:
    """Self-contained, JS-free HTML report (report.py:266-300 analog)."""
    esc = html_mod.escape
    cards = aggs.summary_cards.collect()[0].asDict()
    hist = {r["risk_label"]: r["n"] for r in aggs.risk_histogram.collect()}
    sites = [r.asDict() for r in aggs.site_rollup.collect()]
    cats = [r.asDict() for r in aggs.top_categories.collect()]
    topk = [r.asDict() for r in aggs.high_risk_topk.collect()]
    iocs = [r.asDict() for r in aggs.global_iocs.collect()]

    total = max(sum(hist.values()), 1)
    parts = [
        "<!DOCTYPE html><html><head><meta charset='utf-8'>",
        "<title>sparkharvester report</title>",
        "<style>body{font-family:sans-serif;margin:2em}table{border-collapse:"
        "collapse}td,th{border:1px solid #999;padding:4px 8px}</style></head><body>",
        "<h1>Crawl Intelligence Report</h1>",
        "<h2>Summary</h2><table>",
    ]
    for k, v in cards.items():
        parts.append(f"<tr><th>{esc(k)}</th><td>{v}</td></tr>")
    parts.append("</table><h2>Risk distribution</h2><table>")
    for label in ("Critical", "High", "Medium", "Low"):
        n = hist.get(label, 0)
        pct = int(n / total * 100)
        parts.append(
            f"<tr><th>{label}</th><td>{n}</td><td>{pct}%</td></tr>")
    parts.append("</table><h2>Top categories</h2><ol>")
    for c in cats:
        parts.append(f"<li>{esc(c['category'])} ({c['n']})</li>")
    parts.append("</ol><h2>Sites</h2><table><tr><th>site</th><th>pages</th>"
                 "<th>IOCs</th><th>max risk</th><th>label</th></tr>")
    for s in sites:
        parts.append(
            f"<tr><td>{esc(s['site'])}</td><td>{s['page_count']}</td>"
            f"<td>{s['total_iocs']}</td><td>{s['max_risk']}</td>"
            f"<td>{esc(s['site_label'])}</td></tr>")
    parts.append("</table><h2>High-risk pages</h2><table>"
                 "<tr><th>url</th><th>score</th><th>label</th></tr>")
    for r in topk:
        parts.append(
            f"<tr><td>{esc(r['url'])}</td><td>{r['risk_score']}</td>"
            f"<td>{esc(r['risk_label'])}</td></tr>")
    parts.append("</table><h2>Global IOCs</h2><table>"
                 "<tr><th>type</th><th>value</th></tr>")
    for r in iocs:
        parts.append(
            f"<tr><td>{esc(r['ioc_type'])}</td><td>{esc(r['value'])}</td></tr>")
    parts.append("</body></html>")
    html_doc = "".join(parts)
    with open(out_path, "w") as f:
        f.write(html_doc)
    return out_path


def site_page_edges(pages: DataFrame) -> DataFrame:
    """Site→page edge table (J5/A8 — the analytic core of the 3D graph,
    visualizer.py:204-244; rendering is out of scope, SURVEY §7.6)."""
    return pages.select(
        F.col("site").alias("src"), F.col("url").alias("dst")
    )


def analyze_pages(pages: DataFrame) -> DataFrame:
    """Attach full intel columns to a crawl_results table (cli.py:298-303)."""
    return with_intel(pages, text_col="text")
