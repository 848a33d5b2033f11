"""Single-process oracle for the crawl engine (SURVEY.md §5/§7.4).

A faithful ~150-line sequential reimplementation of the reference BFS
semantics (crawler.py:214-273) under the CANONICAL ordering contract of
SURVEY.md §3.1: within a depth level, URLs are processed in
``(canon_url, seed_id)`` order (the reference's own within-depth order
is Python-set iteration order — not semantically meaningful — and its
cross-thread dedup is wall-clock racy, so the rebuild normalizes both;
see SURVEY.md §7.4 decision 1).

Canonical spec implemented by BOTH this oracle and the distributed
engine (frontier.py):
 - depth-synchronous BFS rounds; candidates = frontier rows at this
   depth, minus the per-seed crawled set, for seeds not yet at cap;
 - the whole depth level is fetched; content-dedup winners are chosen
   globally per round by (canon_url, seed_id) among non-failed,
   non-blacklisted candidates (plus all previously seen hashes);
 - per seed, rows are "popped" in canonical order while the seed's
   successful-page count is below max_pages (matching the reference's
   ``while queue and pages_this_site < max_pages`` pop loop,
   crawler.py:237): skipped/failed/duplicate rows consume a pop but
   not the cap;
 - popped rows are marked crawled (crawler.py:242: marked before
   fetch outcome); links propagate from popped, fetched rows even when
   the content was a duplicate (crawler.py:190) but never from
   blacklisted or failed rows (crawler.py:167-179).
"""
from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field
from urllib.parse import urljoin, urlparse

from .constants import DEFAULT_BLACKLIST_PATHS, JUNK_HREF_PREFIXES, ONION_V3_PATTERN
from .synth import SynthConfig, synth_fetch_page
from .urlnorm import canonicalize_one

_ONION_RE = re.compile(ONION_V3_PATTERN.replace("(?i)", ""), re.IGNORECASE)


def is_valid_onion_py(url: str) -> bool:
    return bool(_ONION_RE.match(url))


def is_blacklisted_py(url: str, blacklist: list[str]) -> bool:
    path = urlparse(url).path.lower().rstrip("/")
    bl = [p.lower().rstrip("/") for p in blacklist]
    return any(path == b or path.endswith(b) for b in bl)


def extract_links_py(base_url: str, hrefs: list[str]) -> list[str]:
    """Junk filter → resolve → fragment strip → onion filter → canonical
    → sorted distinct (extractor.py:74-93 under canonical ordering)."""
    links: set[str] = set()
    for href in hrefs:
        href = href.strip()
        if not href or href.startswith(JUNK_HREF_PREFIXES):
            continue
        full = urljoin(base_url, href).split("#")[0]
        if is_valid_onion_py(full):
            links.add(canonicalize_one(full))
    return sorted(links)


@dataclass
class OracleResult:
    results: list[dict] = field(default_factory=list)
    seen_urls: set = field(default_factory=set)       # (seed_id, canon_url)
    stats: dict = field(default_factory=lambda: {
        "pages_crawled": 0, "pages_failed": 0,
        "pages_skipped": 0, "pages_deduplicated": 0, "sites_crawled": 0,
    })


def crawl_oracle(
    seeds: list[str],
    synth_cfg: SynthConfig,
    max_depth: int = 2,
    max_pages: int = 20,
    blacklist: list[str] | None = None,
    known_urls: set[str] | None = None,
) -> OracleResult:
    blacklist = blacklist if blacklist is not None else DEFAULT_BLACKLIST_PATHS
    known = {canonicalize_one(u) for u in (known_urls or set())}

    valid = [u for u in seeds if is_valid_onion_py(u)]          # crawler.py:293
    out = OracleResult()
    crawled: dict[int, set[str]] = {i: set(known) for i in range(len(valid))}
    counts: dict[int, int] = {i: 0 for i in range(len(valid))}
    seen_hashes: set[str] = set()
    frontier: list[tuple[int, str, int]] = [
        (i, canonicalize_one(u), 0) for i, u in enumerate(valid)
    ]

    for depth in range(max_depth + 1):
        cands = sorted(
            {
                (sid, url)
                for (sid, url, d) in frontier
                if d == depth
                and url not in crawled[sid]
                and counts[sid] < max_pages
            },
            key=lambda r: (r[1], r[0]),
        )
        if not cands:
            continue

        fetched = {}
        for sid, url in cands:
            f = synth_fetch_page(url, synth_cfg)
            f["blacklisted"] = is_blacklisted_py(url, blacklist)
            f["content_hash"] = hashlib.sha256(
                f["text"].encode("utf-8", errors="replace")
            ).hexdigest() if f["ok"] else None
            fetched[(sid, url)] = f

        # global round dedup winners in canonical order (crawler.py:184-191
        # normalized — see module docstring)
        winner: dict[str, tuple[str, int]] = {}
        for sid, url in cands:
            f = fetched[(sid, url)]
            if f["ok"] and not f["blacklisted"]:
                h = f["content_hash"]
                if h not in seen_hashes and h not in winner:
                    winner[h] = (url, sid)

        new_frontier: list[tuple[int, str, int]] = []
        for sid in range(len(valid)):
            rows = [(s, u) for (s, u) in cands if s == sid]
            cap_left = max_pages - counts[sid]
            successes = 0
            for s, url in rows:
                if successes >= cap_left:
                    break                       # crawler.py:237 loop guard
                crawled[sid].add(url)           # crawler.py:242
                out.seen_urls.add((sid, url))
                f = fetched[(s, url)]
                propagate = False
                if f["blacklisted"]:
                    out.stats["pages_skipped"] += 1
                elif not f["ok"]:
                    out.stats["pages_failed"] += 1
                else:
                    h = f["content_hash"]
                    links = extract_links_py(url, f["hrefs"])
                    propagate = True
                    if h in seen_hashes or winner.get(h) != (url, sid):
                        out.stats["pages_deduplicated"] += 1
                    else:
                        successes += 1
                        out.stats["pages_crawled"] += 1
                        out.results.append({
                            "seed_id": sid,
                            "url": url,
                            "title": f["title"],
                            "text": f["text"],
                            "content_hash": h,
                            "depth": depth,
                            "links_found": len(links),
                            "site": f"http://{urlparse(url).netloc}",
                        })
                if propagate and depth < max_depth:   # crawler.py:259
                    for link in links:
                        if link not in crawled[sid]:  # crawler.py:261
                            new_frontier.append((sid, link, depth + 1))
            counts[sid] += successes

        # commit round: hashes of kept results only
        for r in out.results:
            seen_hashes.add(r["content_hash"])
        frontier = [f for f in frontier if f[2] > depth] + new_frontier

    out.stats["sites_crawled"] = len(valid)
    # canonical global sequence (SURVEY §3.1): (depth, canon_url, seed_id)
    out.results.sort(key=lambda r: (r["depth"], r["url"], r["seed_id"]))
    for i, r in enumerate(out.results):
        r["seq"] = i + 1
    return out
