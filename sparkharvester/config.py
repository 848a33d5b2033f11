"""Layered configuration (S5) — defaults ← YAML file ← environment
variables ← CLI flags, highest wins.

Mirrors the reference's config layering (config.py:83-123: built-in
dataclass defaults, then a YAML document applied section-by-section,
then environment overrides; the CLI applies its flags on top).  The
reference's Tor section is n/a by design (SURVEY §7.6); its crawler /
storage sections map onto CrawlConfig / SynthConfig / StorageSettings.

YAML document shape::

    crawler:
      max_depth: 3
      max_pages: 50
      crawl_delay: 2.0
      blacklist: ["/login", "/signup"]
      host_tokens_per_round: 4
      use_bloom: true
    synth:
      n_hosts: 5
      pages_per_host: 40
      seed: 42
    storage:
      output_dir: results
      json_output: true
      csv_output: true
    seed_urls: []          # optional explicit seed list
    log_level: INFO

Environment overrides (reference config.py:108-121 analog):
``OUTPUT_DIR``, ``LOG_LEVEL``, and ``SPARKHARVESTER_<FIELD>`` for the
crawl/synth numerics (e.g. ``SPARKHARVESTER_MAX_DEPTH=3``).
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field, fields as dc_fields
from typing import Any

from .frontier import CrawlConfig
from .synth import SynthConfig


@dataclass
class StorageSettings:
    """Output/persistence settings (reference StorageConfig analog)."""

    output_dir: str = "results"
    json_output: bool = True
    csv_output: bool = True
    parquet_output: bool = True


@dataclass
class AppSettings:
    crawler: CrawlConfig = field(default_factory=CrawlConfig)
    synth: SynthConfig = field(default_factory=SynthConfig)
    storage: StorageSettings = field(default_factory=StorageSettings)
    seed_urls: list[str] = field(default_factory=list)
    log_level: str = "INFO"


def _apply_dict(obj: object, data: dict) -> None:
    """Set matching attributes only — unknown keys raise so a typo'd
    YAML key fails loudly instead of being silently ignored."""
    known = {f.name for f in dc_fields(obj)}
    for key, value in (data or {}).items():
        if key not in known:
            raise KeyError(
                f"unknown config key {key!r} for {type(obj).__name__} "
                f"(known: {sorted(known)})"
            )
        setattr(obj, key, value)


# env var -> (section attr or "", field, caster); reference
# config.py:108-121 uses the same explicit-allowlist pattern
_ENV_MAP: dict[str, tuple[str, str, Any]] = {
    "OUTPUT_DIR": ("storage", "output_dir", str),
    "LOG_LEVEL": ("", "log_level", str),
    "SPARKHARVESTER_MAX_DEPTH": ("crawler", "max_depth", int),
    "SPARKHARVESTER_MAX_PAGES": ("crawler", "max_pages", int),
    "SPARKHARVESTER_CRAWL_DELAY": ("crawler", "crawl_delay", float),
    "SPARKHARVESTER_HOST_TOKENS": ("crawler", "host_tokens_per_round", int),
    "SPARKHARVESTER_USE_BLOOM": ("crawler", "use_bloom",
                                 lambda s: s.lower() in ("1", "true", "yes")),
    "SPARKHARVESTER_N_HOSTS": ("synth", "n_hosts", int),
    "SPARKHARVESTER_PAGES_PER_HOST": ("synth", "pages_per_host", int),
    "SPARKHARVESTER_SEED": ("synth", "seed", int),
}


def load_config(
    config_path: str | None = None,
    flag_overrides: dict[str, Any] | None = None,
    env: dict[str, str] | None = None,
) -> AppSettings:
    """Resolve the full config with precedence
    defaults < YAML < env < flags.

    *flag_overrides* uses dotted paths (``{"crawler.max_depth": 3}``);
    ``None`` values mean "flag not passed" and are skipped.  *env*
    defaults to ``os.environ`` (injectable for tests).
    """
    cfg = AppSettings()

    # ---- YAML layer -------------------------------------------------------
    if config_path:
        import yaml

        with open(config_path, encoding="utf-8") as fh:
            data = yaml.safe_load(fh) or {}
        # a typo'd SECTION name must fail as loudly as a typo'd field
        # (ADVICE r2: 'crawlers:' silently dropped an entire section)
        known_top = {"crawler", "synth", "storage", "seed_urls", "log_level"}
        unknown = set(data) - known_top
        if unknown:
            raise KeyError(
                f"unknown top-level config key(s) {sorted(unknown)} "
                f"(known: {sorted(known_top)})"
            )
        _apply_dict(cfg.crawler, data.get("crawler", {}))
        _apply_dict(cfg.synth, data.get("synth", {}))
        _apply_dict(cfg.storage, data.get("storage", {}))
        cfg.seed_urls = data.get("seed_urls", cfg.seed_urls)
        cfg.log_level = data.get("log_level", cfg.log_level)

    # ---- environment layer -----------------------------------------------
    env = os.environ if env is None else env
    for var, (section, fld, cast) in _ENV_MAP.items():
        if var in env and env[var] != "":
            target = getattr(cfg, section) if section else cfg
            setattr(target, fld, cast(env[var]))

    # ---- CLI-flag layer (highest) ------------------------------------------
    for path, value in (flag_overrides or {}).items():
        if value is None:
            continue
        section, _, fld = path.rpartition(".")
        target = getattr(cfg, section) if section else cfg
        if not hasattr(target, fld):
            raise KeyError(f"unknown flag override {path!r}")
        setattr(target, fld, value)

    return cfg
