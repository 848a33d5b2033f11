"""DuckDB oracle-SQL fragment generators.

Mirrors sparkharvester.intel / textops column expressions from the SAME
constants (sparkharvester.constants) so Spark and the DuckDB oracle
cannot drift.  All fragments are plain ANSI-ish SQL valid in DuckDB.

Arithmetic is written with the exact same operation ORDER as the Spark
side so double results are bit-identical (IEEE 754 ops are deterministic
given identical operand order).
"""
from __future__ import annotations

from .constants import (
    CATEGORIES,
    CATEGORY_ORDER,
    CATEGORY_RISK,
    DEFAULT_RISK_LABEL,
    IOC_LIST_FIELDS,
    IOC_PATTERNS,
    PGP_MARKER,
    PRIVATE_IP_PREFIXES,
    RISK_THRESHOLDS,
    URL_IOC_CAP,
)


def sq(s: str) -> str:
    """Escape a string for a single-quoted SQL literal."""
    return s.replace("'", "''")


def sql_join_arr(arr: str, sep: str = "|") -> str:
    """array_to_string that matches Spark array_join: empty list -> ''.
    (DuckDB's array_to_string returns NULL for an empty list.)"""
    return f"coalesce(array_to_string({arr}, '{sep}'), '')"


def sql_regex_all(text: str, pattern: str) -> str:
    return f"regexp_extract_all({text}, '{sq(pattern)}')"


def sql_sorted_distinct(arr: str) -> str:
    return f"list_sort(list_distinct({arr}))"


def sql_ioc_array(text: str, ioc_type: str) -> str:
    """DuckDB expr for one sorted/deduped IOC array (intelligence.py:252-271)."""
    raw = sql_regex_all(text, IOC_PATTERNS[ioc_type])
    if ioc_type == "ipv4":
        conds = " OR ".join(f"starts_with(x, '{p}')" for p in PRIVATE_IP_PREFIXES)
        return sql_sorted_distinct(f"list_filter({raw}, x -> NOT ({conds}))")
    if ioc_type == "cves":
        return sql_sorted_distinct(f"list_transform({raw}, x -> upper(x))")
    if ioc_type == "urls":
        return f"({sql_sorted_distinct(raw)})[1:{URL_IOC_CAP}]"
    return sql_sorted_distinct(raw)


def sql_ioc_total(text: str) -> str:
    sizes = " + ".join(f"length({sql_ioc_array(text, t)})" for t in IOC_LIST_FIELDS)
    return f"CAST({sizes} AS BIGINT)"


def sql_pgp(text: str) -> str:
    return f"contains({text}, '{sq(PGP_MARKER)}')"


def sql_word_count(text_lower: str) -> str:
    """max(len(str.split()), 1) — intelligence.py:299."""
    return f"greatest(length(regexp_extract_all({text_lower}, '\\S+')), 1)"


def sql_substring_count(hay: str, needle: str) -> str:
    """Non-overlapping substring count == Python str.count."""
    n = len(needle)
    return f"CAST((length({hay}) - length(replace({hay}, '{sq(needle)}', ''))) / {n} AS INT)"


def sql_category_hits(text_lower: str, category: str) -> str:
    return " + ".join(
        sql_substring_count(text_lower, kw.lower()) for kw in CATEGORIES[category]
    )


def sql_hits_cte(source_sql: str, doc_id: str = "doc_id", text: str = "text",
                 extra_cols: str = "") -> str:
    """CTE producing (doc_id, wc, h0..h8) keyword-hit columns per doc."""
    tl = f"lower({text})"
    hit_cols = ",\n      ".join(
        f"({sql_category_hits(tl, cat)}) AS h{i}"
        for i, cat in enumerate(CATEGORY_ORDER)
    )
    extra = f", {extra_cols}" if extra_cols else ""
    return (
        f"SELECT {doc_id} AS doc_id{extra},\n"
        f"      CAST({sql_word_count(tl)} AS DOUBLE) AS wc,\n"
        f"      {hit_cols}\n"
        f"    FROM {source_sql}"
    )


def sql_score_expr(i: int, cat: str) -> str:
    """Score for category index i given h{i} and wc columns in scope.

    Mirrors intel.with_threat: when(hits>0, least(h/(wc/1000),1)*w*10, 0).
    """
    w = CATEGORY_RISK[cat]
    return (
        f"CASE WHEN h{i} > 0 THEN "
        f"least(CAST(h{i} AS DOUBLE) / (wc / 1000.0), 1.0) * CAST({w} AS DOUBLE) * 10.0 "
        f"ELSE 0.0 END"
    )


def sql_scores_select() -> str:
    """SELECT list fragment: s0..s8 score columns (expects h0..h8, wc)."""
    return ",\n      ".join(
        f"({sql_score_expr(i, cat)}) AS s{i}" for i, cat in enumerate(CATEGORY_ORDER)
    )


def sql_risk_expr() -> str:
    """risk = least(greatest(s0..s8), 10.0) (expects s0..s8 in scope)."""
    scores = ", ".join(f"s{i}" for i in range(len(CATEGORY_ORDER)))
    return f"least(greatest({scores}), 10.0)"


def sql_risk_label(risk: str) -> str:
    whens = " ".join(
        f"WHEN {risk} >= {t} THEN '{name}'" for t, name in RISK_THRESHOLDS
    )
    return f"CASE {whens} ELSE '{DEFAULT_RISK_LABEL}' END"


def sql_threat_cte(source_sql: str, doc_id: str = "doc_id", text: str = "text",
                   extra_cols: str = "") -> str:
    """Full CTE chain ending in per-doc (doc_id[, extra], risk, risk_score,
    risk_label, s0..s8, h0..h8).  Embed as:  WITH {this} SELECT ... FROM scored
    """
    extra = f", {extra_cols}" if extra_cols else ""
    extra_bare = extra
    return f"""hits AS (
    {sql_hits_cte(source_sql, doc_id, text, extra_cols)}
  ),
  scores AS (
    SELECT doc_id{extra_bare}, wc,
      {', '.join(f'h{i}' for i in range(len(CATEGORY_ORDER)))},
      {sql_scores_select()}
    FROM hits
  ),
  scored AS (
    SELECT *,
      {sql_risk_expr()} AS risk,
      round({sql_risk_expr()}, 2) AS risk_score,
      {sql_risk_label(sql_risk_expr())} AS risk_label
    FROM scores
  )"""
