"""End-to-end crawl equivalence: distributed engine vs Python oracle.

The oracle (sparkharvester.oracle) is the canonical sequential spec of
the reference BFS (crawler.py:214-273 under SURVEY.md §3.1 canonical
ordering).  These tests assert EXACT equality of:
 - the crawled URL set and each page's BFS min-depth,
 - the per-seed seen (popped) URL sets,
 - dedup winners (content_hash -> url),
 - per-seed page caps,
 - session counters (CrawlStats analog),
 - canonical result ordering (seq).
"""
from __future__ import annotations

import pytest

from sparkharvester.frontier import CrawlConfig, run_crawl
from sparkharvester.oracle import crawl_oracle
from sparkharvester.synth import SynthConfig, seed_urls


def _run_both(spark, synth_cfg, crawl_cfg, seeds=None, known=None):
    seeds = seeds if seeds is not None else seed_urls(synth_cfg)
    oracle = crawl_oracle(
        seeds, synth_cfg,
        max_depth=crawl_cfg.max_depth,
        max_pages=crawl_cfg.max_pages,
        blacklist=crawl_cfg.blacklist,
        known_urls=set(known or []),
    )
    eng = run_crawl(spark, seeds, synth_cfg, crawl_cfg,
                    known_urls=list(known or []))
    return oracle, eng


def _assert_parity(oracle, eng):
    eng_rows = [r.asDict() for r in eng.pages.collect()]
    # 1. URL-seen set + min-depth
    o_pages = {(r["seed_id"], r["url"]): r for r in oracle.results}
    e_pages = {(r["seed_id"], r["url"]): r for r in eng_rows}
    assert set(o_pages) == set(e_pages)
    for k, o in o_pages.items():
        e = e_pages[k]
        assert e["depth"] == o["depth"], k
        assert e["content_hash"] == o["content_hash"], k
        assert e["title"] == o["title"], k
        assert e["text"] == o["text"], k
        assert e["links_found"] == o["links_found"], k
        assert e["site"] == o["site"], k
        assert e["seq"] == o["seq"], k
    # 2. popped/seen set
    e_seen = {(r["seed_id"], r["canon_url"]) for r in eng.seen_urls.collect()}
    assert e_seen >= oracle.seen_urls  # engine seen includes resume preload
    assert {s for s in e_seen if s in oracle.seen_urls} == oracle.seen_urls
    # 3. counters
    for key in ("pages_crawled", "pages_failed", "pages_skipped",
                "pages_deduplicated", "sites_crawled"):
        assert eng.stats[key] == oracle.stats[key], (
            key, eng.stats, oracle.stats)


@pytest.mark.parametrize("n_hosts,pages_per_host,max_depth,max_pages", [
    (3, 20, 2, 20),     # reference defaults shape (config.py:38-39)
    (5, 40, 2, 10),     # tight cap → mid-depth cap interaction
    (2, 10, 3, 50),     # deeper crawl, loose cap
])
def test_crawl_matches_oracle(spark, n_hosts, pages_per_host, max_depth,
                              max_pages):
    synth = SynthConfig(n_hosts=n_hosts, pages_per_host=pages_per_host)
    cfg = CrawlConfig(max_depth=max_depth, max_pages=max_pages)
    oracle, eng = _run_both(spark, synth, cfg)
    assert oracle.stats["pages_crawled"] > 0
    _assert_parity(oracle, eng)


def test_invalid_seeds_skipped(spark):
    """crawler.py:293-300: invalid seeds are dropped, valid ones crawl."""
    synth = SynthConfig(n_hosts=2, pages_per_host=8)
    good = seed_urls(synth)
    seeds = ["http://short.onion/", "not-a-url", *good]
    cfg = CrawlConfig(max_depth=1, max_pages=10)
    oracle, eng = _run_both(spark, synth, cfg, seeds=seeds)
    assert oracle.stats["sites_crawled"] == 2
    _assert_parity(oracle, eng)


def test_resume_known_urls(spark):
    """Resume support (cli.py:263-267): known URLs are never re-crawled."""
    synth = SynthConfig(n_hosts=2, pages_per_host=10)
    seeds = seed_urls(synth)
    known = [seeds[0]]  # first seed already crawled in a previous session
    cfg = CrawlConfig(max_depth=2, max_pages=20)
    oracle, eng = _run_both(spark, synth, cfg, known=known)
    urls = {r["url"] for r in oracle.results}
    assert seeds[0] not in urls
    _assert_parity(oracle, eng)


def test_dedup_propagates_links(spark):
    """crawler.py:190: duplicate pages produce no result but their links
    still feed the frontier."""
    synth = SynthConfig(n_hosts=3, pages_per_host=15, dup_rate_pct=60,
                        dup_groups=2)
    cfg = CrawlConfig(max_depth=2, max_pages=30)
    oracle, eng = _run_both(spark, synth, cfg)
    assert oracle.stats["pages_deduplicated"] > 0
    _assert_parity(oracle, eng)
