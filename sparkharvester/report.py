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

from .constants import IOC_LIST_FIELDS
from .intel import risk_label_expr, with_intel
from .q_viz import _RISK_ORDER as GRAPH_RISK_ORDER

# display titles for the per-type IOC registry sections
# (report.py:470-489: the reference renders per-type tables; this render
# covers ALL 11 extracted types, a superset of the reference's 7)
IOC_TITLES = {
    "ipv4": "IPv4 Addresses",
    "emails": "Email Addresses",
    "md5": "MD5 Hashes",
    "sha1": "SHA-1 Hashes",
    "sha256": "SHA-256 Hashes",
    "cves": "CVE References",
    "btc_addresses": "Bitcoin Addresses",
    "xmr_addresses": "Monero Addresses",
    "onion_addresses": "Hidden Service References",
    "domains": "Domains",
    "urls": "URLs",
}


@dataclass
class ReportAggregates:
    risk_histogram: DataFrame      # A4
    summary_cards: DataFrame       # A2/A5
    site_rollup: DataFrame         # A7/A8
    top_categories: DataFrame      # A3/O4
    high_risk_topk: DataFrame      # O1/F8
    global_iocs: DataFrame         # D6/O7 — ALL 11 types, capped per type
    keyword_hits: DataFrame        # X20 rollup: hits + page count per category
    graph_nodes: DataFrame         # S12 — 3-D graph figure input (q_viz)


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

    # one stacked (type, value) table for ALL 11 IOC types; per-type
    # distinct + total count + sorted cap (report.py:470-489: "showing
    # first 100 of N")
    typed = None
    for t in IOC_LIST_FIELDS:
        part = df.select(F.explode(t).alias("value")) \
                 .withColumn("ioc_type", F.lit(t))
        typed = part if typed is None else typed.unionByName(part)
    w_type = Window.partitionBy("ioc_type")
    global_iocs = (
        typed.distinct()
        .withColumn("n_total", F.count("*").over(w_type))
        .withColumn("rn", F.row_number().over(w_type.orderBy("value")))
        .filter(F.col("rn") <= ioc_cap)
        .drop("rn")
    )

    keyword_hits = (
        df.select(F.explode("keyword_hits").alias("category", "hits"))
        .groupBy("category")
        .agg(
            F.sum("hits").cast("long").alias("total_hits"),
            F.count("*").alias("pages_with_hits"),
        )
        .orderBy(F.desc("total_hits"), F.asc("category"))
    )

    # figure input for the graph section: site hubs + page nodes with
    # the deterministic square-ring layout (visualizer.py:204-282)
    from .q_viz import graph_layout_nodes

    graph_nodes = graph_layout_nodes(df)

    return ReportAggregates(
        risk_histogram=risk_histogram,
        summary_cards=summary_cards,
        site_rollup=site_rollup,
        top_categories=top_categories,
        high_risk_topk=high_risk_topk,
        global_iocs=global_iocs,
        keyword_hits=keyword_hits,
        graph_nodes=graph_nodes,
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
    kw_hits = [r.asDict() for r in aggs.keyword_hits.collect()]
    # graph section: hubs are |sites|-bounded; page rows stay distributed
    # (only their count crosses to the driver)
    hubs = sorted((r.asDict() for r in
                   aggs.graph_nodes.filter("kind = 'site'").collect()),
                  key=lambda r: r["node"])
    n_page_nodes = aggs.graph_nodes.filter("kind = 'page'").count()

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
    # IOC Registry: one section per type, all 11 types, ≤ioc_cap rows
    # each with a "showing first N of M" note (report.py:470-489)
    parts.append("</table><h2>IOC Registry</h2>")
    by_type: dict[str, list[dict]] = {}
    for r in iocs:
        by_type.setdefault(r["ioc_type"], []).append(r)
    any_ioc = False
    for t, title in IOC_TITLES.items():
        rows = sorted(by_type.get(t, []), key=lambda r: r["value"])
        if not rows:
            continue
        any_ioc = True
        n_total = rows[0]["n_total"]
        parts.append(f"<h3 id='ioc-{esc(t)}'>{esc(title)} ({n_total})</h3>"
                     "<table><tr><th>value</th></tr>")
        for r in rows:
            parts.append(f"<tr><td>{esc(r['value'])}</td></tr>")
        parts.append("</table>")
        if n_total > len(rows):
            parts.append(
                f"<p>Showing first {len(rows)} of {n_total}</p>")
    if not any_ioc:
        parts.append("<p>No IOCs extracted.</p>")

    parts.append("<h2>Keyword hits by category</h2><table>"
                 "<tr><th>category</th><th>total hits</th>"
                 "<th>pages with hits</th></tr>")
    for r in kw_hits:
        parts.append(
            f"<tr><td>{esc(r['category'])}</td><td>{r['total_hits']}</td>"
            f"<td>{r['pages_with_hits']}</td></tr>")
    # Network graph (visualizer.py figure input): hub table + page-node
    # count; coordinates come from the deterministic square-ring layout
    parts.append("</table><h2>Network graph</h2>"
                 "<table><tr><th>site hub</th><th>worst risk</th>"
                 "<th>IOCs</th><th>pages</th><th>x</th><th>y</th></tr>")
    for h in hubs:
        rank = h["risk_rank"]
        label = GRAPH_RISK_ORDER[rank] if 0 <= rank < len(GRAPH_RISK_ORDER) \
            else "unknown"
        parts.append(
            f"<tr><td>{esc(h['node'])}</td><td>{esc(label)}</td>"
            f"<td>{h['ioc_total']}</td><td>{h['n_pages']}</td>"
            f"<td>{h['x']:.4f}</td><td>{h['y']:.4f}</td></tr>")
    parts.append(
        f"</table><p>{n_page_nodes} page nodes positioned on radius-2 "
        "rings around their site hubs.</p>")
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
