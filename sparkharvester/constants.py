"""Shared knowledge base for the intelligence layer.

Single source of truth consumed by BOTH the Spark column-expression
builders (sparkharvester.intel) and the DuckDB oracle-SQL generators
(sparkharvester.oracles) so the two sides can never drift.

Semantics derived from the reference implementation:
/root/reference/deepwebharvester/intelligence.py:26-125 (regexes,
categories, weights) and extractor.py:17,40-43 (URL filters,
blacklist).  Values are re-typed, not copied code.
"""
from __future__ import annotations

# ---------------------------------------------------------------------------
# IOC regexes — intelligence.py:26-57.  Written to be valid in BOTH Java
# regex (Spark) and RE2 (DuckDB): no lookaround, no backreferences.
# ---------------------------------------------------------------------------

IOC_PATTERNS: dict[str, str] = {
    # intelligence.py:26-29
    "ipv4": r"\b(?:(?:25[0-5]|2[0-4]\d|[01]?\d\d?)\.){3}(?:25[0-5]|2[0-4]\d|[01]?\d\d?)\b",
    # intelligence.py:30-32
    "emails": r"\b[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}\b",
    # intelligence.py:33-35
    "md5": r"\b[0-9a-fA-F]{32}\b",
    "sha1": r"\b[0-9a-fA-F]{40}\b",
    "sha256": r"\b[0-9a-fA-F]{64}\b",
    # intelligence.py:36 (IGNORECASE via inline flag, valid in both engines)
    "cves": r"(?i)\bCVE-\d{4}-\d{4,7}\b",
    # intelligence.py:38-41
    "btc_addresses": r"\b(?:bc1[ac-hj-np-z02-9]{6,87}|[13][a-km-zA-HJ-NP-Z1-9]{25,34})\b",
    # intelligence.py:43
    "xmr_addresses": r"\b4[0-9AB][1-9A-HJ-NP-Za-km-z]{93}\b",
    # intelligence.py:45
    "onion_addresses": r"(?i)\b[a-z2-7]{56}\.onion\b",
    # intelligence.py:47-51
    "domains": r"(?i)\b(?:[a-z0-9](?:[a-z0-9\-]{0,61}[a-z0-9])?\.)+(?:com|net|org|io|ru|cn|de|uk|fr|it|es|gov|edu|mil|co)\b",
    # intelligence.py:55
    "urls": r"(?i)https?://[^\s\"'<>]{8,200}",
}

# intelligence.py:53
PGP_MARKER = "-----BEGIN PGP"

# intelligence.py:57 — prefixes excluded from the ipv4 IOC list
PRIVATE_IP_PREFIXES: tuple[str, ...] = ("127.", "10.", "192.168.", "169.254.", "::1")

# intelligence.py:269 — generic-URL list cap
URL_IOC_CAP = 50

# IOC column order used in `total` (intelligence.py:153-162; pgp excluded)
IOC_LIST_FIELDS: tuple[str, ...] = (
    "ipv4", "emails", "md5", "sha1", "sha256", "cves",
    "btc_addresses", "xmr_addresses", "onion_addresses", "domains", "urls",
)

# ---------------------------------------------------------------------------
# Threat-classification knowledge base — intelligence.py:64-125.
# Dict order matters: Python's stable sort makes insertion order the
# tie-break for equal scores, so CATEGORY_ORDER is part of the contract.
# ---------------------------------------------------------------------------

CATEGORIES: dict[str, list[str]] = {
    "Credentials & Leaks": [
        "password", "credentials", "login", "username", "leaked", "breach",
        "database dump", "combo list", "fullz", "account", "shell access",
        "rdp", "ssh login", "ftp", "vpn access", "admin panel",
    ],
    "Marketplace": [
        "buy", "sell", "price", "vendor", "shipping", "escrow", "market",
        "shop", "store", "listing", "order", "payment", "wallet", "checkout",
        "in stock", "out of stock", "delivery",
    ],
    "Malware & Ransomware": [
        "malware", "ransomware", "trojan", "botnet", "keylogger", "exploit",
        "payload", "c2", "command and control", "dropper", "cryptolocker",
        "ransom", "decrypt", "encryption key", "rat ", "loader", "stealer",
        "infostealer", "spyware",
    ],
    "Financial Fraud": [
        "credit card", "cvv", "carding", "dump", "bin", "cashout",
        "money laundering", "bank account", "wire transfer", "western union",
        "paypal", "swift", "iban", "routing number", "skimmer",
        "counterfeit", "fake bills",
    ],
    "Illicit Substances": [
        "cocaine", "heroin", "fentanyl", "mdma", "methamphetamine",
        "cannabis", "weed", "lsd", "ketamine", "opioid", "pills",
        "narcotics", "stimulant", "psychedelic", "benzodiazepine",
    ],
    "Hacking Services": [
        "ddos", "dos attack", "hack for hire", "zero-day", "0day",
        "vulnerability", "cve-", "exploit kit", "stresser", "booter",
        "spear phishing", "social engineering", "remote access",
        "web shell", "privilege escalation",
    ],
    "Identity Documents": [
        "passport", "id card", "driver license", "ssn", "social security",
        "birth certificate", "kyc bypass", "identity", "national id",
        "residence permit", "visa", "scan", "fake id",
    ],
    "Forum & Community": [
        "forum", "thread", "reply", "post", "member", "moderator",
        "register", "join", "discussion", "topic", "board", "community",
    ],
    "Cryptocurrency Services": [
        "mixer", "tumbler", "coin swap", "monero", "privacy coin",
        "exchange", "no kyc", "anonymous transfer", "clean btc",
        "crypto laundry",
    ],
}

CATEGORY_RISK: dict[str, float] = {
    "Credentials & Leaks": 0.85,
    "Marketplace": 0.55,
    "Malware & Ransomware": 0.95,
    "Financial Fraud": 0.90,
    "Illicit Substances": 0.80,
    "Hacking Services": 0.90,
    "Identity Documents": 0.85,
    "Forum & Community": 0.20,
    "Cryptocurrency Services": 0.70,
}

CATEGORY_ORDER: list[str] = list(CATEGORIES)

# Risk-label thresholds (intelligence.py:323-330)
RISK_THRESHOLDS: list[tuple[float, str]] = [
    (9.0, "Critical"),
    (7.0, "High"),
    (4.0, "Medium"),
]
DEFAULT_RISK_LABEL = "Low"

# ---------------------------------------------------------------------------
# URL filters — extractor.py:17 (onion v3), config.py:48-50 (blacklist)
# ---------------------------------------------------------------------------

ONION_V3_PATTERN = r"(?i)^https?://[a-z2-7]{56}\.onion(/|$)"

DEFAULT_BLACKLIST_PATHS: list[str] = ["/login", "/register", "/signup", "/auth"]

# Junk href schemes dropped before resolution (extractor.py:88-89)
JUNK_HREF_PREFIXES: tuple[str, ...] = ("#", "javascript:", "mailto:")

# ---------------------------------------------------------------------------
# Crawl defaults — reference config.py:38-44
# ---------------------------------------------------------------------------

DEFAULT_MAX_DEPTH = 2
DEFAULT_MAX_PAGES = 20
DEFAULT_CRAWL_DELAY = 7.0
DEFAULT_RETRY_COUNT = 3
DEFAULT_BACKOFF_FACTOR = 4.0

# ---------------------------------------------------------------------------
# Text-analysis knowledge (rebuild-only: training-data pipeline ops)
# ---------------------------------------------------------------------------

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic.  Deterministic and identical on both engines.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to ", " is ", " in ", " that ", " it "],
    "fr": [" le ", " la ", " les ", " et ", " de ", " est ", " que ", " une "],
    "de": [" der ", " die ", " und ", " das ", " ist ", " nicht ", " ein ", " mit "],
    "es": [" el ", " la ", " los ", " que ", " de ", " es ", " una ", " por "],
}
LANG_ORDER: list[str] = list(LANG_STOPWORDS)

# English stopwords for quality scoring.
QUALITY_STOPWORDS: list[str] = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "this", "with", "for", "as", "on", "at", "by",
]
