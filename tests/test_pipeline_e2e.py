"""End-to-end lifecycle test: crawl → intel → sinks → report (§3.1)."""
import json
import os

from sparkharvester.frontier import CrawlConfig, run_crawl
from sparkharvester.report import (
    analyze_pages,
    build_aggregates,
    render_html,
    site_page_edges,
)
from sparkharvester.storage import save_all
from sparkharvester.synth import SynthConfig, seed_urls


def test_full_pipeline(spark, tmp_path):
    synth = SynthConfig(n_hosts=3, pages_per_host=12)
    eng = run_crawl(spark, seed_urls(synth), synth,
                    CrawlConfig(max_depth=2, max_pages=10))
    enriched = analyze_pages(eng.pages)

    # sinks (S7-S10): parquet + json + csv, reference field names
    out = str(tmp_path / "results")
    paths = save_all(eng.pages, out)
    assert set(paths) == {"parquet", "json", "csv"}
    pq = spark.read.parquet(paths["parquet"])
    assert pq.count() == eng.pages.count()
    js = spark.read.json(paths["json"])
    assert "crawl_time_s" in js.columns            # storage.py:175-187 rename
    csv = spark.read.option("header", True).csv(paths["csv"])
    assert "CrawlTime(s)" in csv.columns           # storage.py:218-228 header
    assert csv.count() == eng.pages.count()

    # report aggregates + render (S11)
    aggs = build_aggregates(enriched)
    cards = aggs.summary_cards.collect()[0]
    assert cards["total_pages"] == eng.pages.count()
    assert cards["total_sites"] >= 1
    path = render_html(aggs, str(tmp_path / "report.html"))
    html = open(path).read()
    assert "<script" not in html                   # JS-free, test_report.py analog
    assert "Risk distribution" in html

    # graph edge table (J5)
    edges = site_page_edges(eng.pages)
    assert edges.count() == eng.pages.count()
    assert set(edges.columns) == {"src", "dst"}


def test_cli_main(tmp_path, capsys):
    from sparkharvester.cli import main

    rc = main(["--hosts", "2", "--pages-per-host", "8", "--max-depth", "1",
               "--max-pages", "5", "--out", str(tmp_path / "o"),
               "--cpus", "4", "--report",
               "--sql", "SELECT count(*) AS n FROM crawl_results"])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    summary = json.loads(lines[-1])
    assert summary["stats"]["pages_crawled"] > 0
    assert os.path.exists(summary["outputs"]["report"])
    assert os.path.exists(summary["outputs"]["metrics"])
    assert os.path.exists(summary["snapshots"])
    # the --sql line precedes the summary; count == crawled pages (A9)
    sql_row = json.loads(lines[-2])
    assert sql_row["n"] == summary["stats"]["pages_crawled"]

    # query-only mode re-reads the durable tables without a crawl
    rc = main(["--query-only", "--out", str(tmp_path / "o"),
               "--cpus", "4",
               "--sql", "SELECT sum(pages_crawled) AS n FROM crawl_metrics"])
    assert rc == 0
    q = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert q["n"] == summary["stats"]["pages_crawled"]


def test_cli_durable_intel_columns(spark, tmp_path, capsys):
    """The durable crawl_results carries the intel columns (VERDICT r2
    missing #1): typed IOC/risk columns queryable via --query-only
    --sql, plus the reference's ioc_data JSON blob (storage.py:25-41),
    matching a recomputation from the persisted text."""
    import json as _json

    from pyspark.sql import functions as F

    from sparkharvester.cli import main
    from sparkharvester.report import analyze_pages

    out = str(tmp_path / "o")
    rc = main(["--hosts", "2", "--pages-per-host", "10", "--max-depth", "1",
               "--max-pages", "6", "--out", out, "--cpus", "4"])
    assert rc == 0
    capsys.readouterr()

    rc = main(["--query-only", "--out", out, "--cpus", "4",
               "--sql",
               "SELECT site, sum(ioc_total) AS iocs, "
               "round(max(risk_score), 2) AS max_risk "
               "FROM crawl_results GROUP BY site ORDER BY site"])
    assert rc == 0
    got = [_json.loads(l)
           for l in capsys.readouterr().out.strip().splitlines()]
    assert got, "no sites in durable results"

    # oracle: recompute the intel from the persisted base columns
    # (x_ioc_extract semantics over the same text)
    pq = spark.read.parquet(os.path.join(out, "crawl_results.parquet"))
    expect = {
        r["site"]: (r["iocs"], r["max_risk"])
        for r in analyze_pages(pq.select("url", "site", "depth", "text"))
        .groupBy("site")
        .agg(F.sum("ioc_total").alias("iocs"),
             F.round(F.max("risk_score"), 2).alias("max_risk"))
        .collect()
    }
    assert {g["site"]: (g["iocs"], g["max_risk"]) for g in got} == expect

    # ioc_data JSON blob: reference key order + totals consistent
    row = pq.filter(F.col("ioc_data").isNotNull()).limit(1).collect()[0]
    blob = _json.loads(row["ioc_data"])
    assert list(blob) == [
        "ipv4", "emails", "md5", "sha1", "sha256", "cves",
        "btc_addresses", "xmr_addresses", "onion_addresses", "domains",
        "urls", "pgp_present", "total",
    ]
    assert blob["total"] == row["ioc_total"]
    # byte parity with the reference's json.dumps serialization
    # (storage.py:129: default ", "/": " separators)
    assert row["ioc_data"] == _json.dumps(blob)


def test_cli_images_table(spark, tmp_path):
    """--images emits the input_hint payload table keyed to crawled
    pages: one row per page, schema exact, payload decode-invariant."""
    from sparkharvester.cli import main
    from sparkharvester.images import check_invariants

    out = tmp_path / "out"
    rc = main(["--hosts", "3", "--max-depth", "1", "--max-pages", "8",
               "--out", str(out), "--images"])
    assert rc == 0
    imgs = spark.read.parquet(str(out / "images.parquet"))
    assert imgs.columns == ["image_id", "bytes", "w", "h", "fmt",
                            "caption", "phash"]
    pages = spark.read.parquet(str(out / "crawl_results.parquet"))
    assert imgs.count() == pages.count()
    assert imgs.select("image_id").distinct().count() == pages.count()
    bad = check_invariants(imgs).filter(
        "NOT (pixels_equal AND psnr_ok AND caption_ok AND phash_ok)"
    ).count()
    assert bad == 0
