"""Graph-visualization layout query (reference visualizer.py:204-282).

The reference renders a 3-D NetworkX figure: one hub node per site
(kind/risk/ioc_count/page_count attrs, visualizer.py:204-232), one
node per page ringed to its hub by a site→page edge (:233-244), and a
seeded layout (:246-282, spring_layout(seed=42) with a deterministic
ring fallback).  Rendering is presentation and out of scope (SURVEY
§7.6), but the figure's entire INPUT — the node table with
deterministic coordinates — is analytics, so it lives here as an
oracle-checkable query (VERDICT r4 task #5) and feeds the HTML
report's graph section (report.render_html).

Layout design — deterministic AND dual-engine hash-stable:
``spring_layout`` is not reproducible outside NetworkX, and trig-based
polar coordinates are not bit-identical across engines (JVM StrictMath
vs DuckDB libm).  Instead each node gets a position on a SQUARE RING —
the piecewise-linear perimeter walk of [-1,1]², parameterized by an
md5-derived uniform draw — computed in pure INTEGER arithmetic
(numerators over denominator 250 000) until one final exact IEEE
division.  Site hubs sit on a radius-10 outer ring; each page sits on
a radius-2 ring around ITS hub (hub position recomputed per-row from
the page's own site column — zero joins, zero shuffles beyond the
site-hub aggregation).  Every coordinate is a pure function of the
node id, so the layout is stable under re-crawls, re-partitioning and
engine choice.

Scale shape: page rows are scan → map (codegen) — linear to 100 TB;
the only shuffle is the site-hub groupBy (|sites| groups, map-side
combined).  No layout state, no driver traffic.
"""
from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.column import Column

from . import intel, sqlgen
from .enrich import enriched_text_sql, enriched_text_spark
from .registry import register
from .session import load_spread

# Perimeter resolution: positions are k/250000 for integer k, so the
# final int→double division is exact-input correctly-rounded IEEE on
# both engines (same device as curate_sample's md5 uniform draw).
_QUARTER = 250_000
_RING = 4 * _QUARTER           # md5 draw range: one full perimeter walk
_SITE_SCALE = 10               # hub ring radius multiplier
_PAGE_SCALE = 2                # page ring (around hub) radius multiplier

# visualizer.py:46/:61-66 — _RISK_ORDER.index(label); -1 for unknown
_RISK_ORDER = ["Low", "Medium", "High", "Critical"]


# ---------------------------------------------------------------------------
# square-ring walk, dual dialect: md5(salt‖key) → m ∈ [0, _RING) →
# integer numerator pair (x_num, y_num) ∈ [-Q, Q]² on the perimeter
# ---------------------------------------------------------------------------


def _ring_m(key: Column) -> Column:
    h = F.conv(F.substring(F.md5(F.concat(F.lit("viz/"), key)), 1, 15),
               16, 10).cast("long")
    return F.pmod(h, F.lit(_RING))


def _ring_m_sql(key: str) -> str:
    return (f"(CAST('0x' || substr(md5('viz/' || {key}), 1, 15) AS BIGINT)"
            f" % {_RING})")


def _ring_nums(m: Column) -> tuple[Column, Column]:
    """(x_num, y_num) for perimeter parameter m — seg 0: bottom edge
    left→right, 1: right edge up, 2: top edge right→left, 3: left edge
    down.  g = 2·(m mod Q) − Q sweeps [−Q, Q)."""
    seg = (m / _QUARTER).cast("long")
    g = (m % _QUARTER) * 2 - _QUARTER
    x = (F.when(seg == 0, g).when(seg == 1, F.lit(_QUARTER))
         .when(seg == 2, -g).otherwise(F.lit(-_QUARTER)))
    y = (F.when(seg == 0, F.lit(-_QUARTER)).when(seg == 1, g)
         .when(seg == 2, F.lit(_QUARTER)).otherwise(-g))
    return x, y


def _ring_nums_sql(m: str) -> tuple[str, str]:
    seg = f"({m} // {_QUARTER})"
    g = f"(({m} % {_QUARTER}) * 2 - {_QUARTER})"
    x = (f"CASE {seg} WHEN 0 THEN {g} WHEN 1 THEN {_QUARTER} "
         f"WHEN 2 THEN -{g} ELSE -{_QUARTER} END")
    y = (f"CASE {seg} WHEN 0 THEN -{_QUARTER} WHEN 1 THEN {g} "
         f"WHEN 2 THEN {_QUARTER} ELSE -{g} END")
    return x, y


def _risk_rank(label: Column) -> Column:
    r = F.when(label == _RISK_ORDER[0], 0)
    for i, name in enumerate(_RISK_ORDER[1:], start=1):
        r = r.when(label == name, i)
    return r.otherwise(-1).cast("int")


def _risk_rank_sql(label: str) -> str:
    whens = " ".join(f"WHEN '{name}' THEN {i}"
                     for i, name in enumerate(_RISK_ORDER))
    return f"CAST(CASE {label} {whens} ELSE -1 END AS INT)"


# ---------------------------------------------------------------------------
# the engine-agnostic core, reused by report.build_aggregates
# ---------------------------------------------------------------------------


def graph_layout_nodes(pages: DataFrame, node_col: str = "url",
                       site_col: str = "site") -> DataFrame:
    """Node table for the 3-D graph from a pages-with-intel DataFrame
    (with_intel output): one 'site' row per hub + one 'page' row per
    page, with deterministic square-ring coordinates.  Pure per-row
    math for pages; one |sites|-group aggregation for hubs."""
    # both union branches (page rows + the site-hub aggregation) read
    # the same enriched input; persist the NARROW projection so the
    # upstream enrichment (IOC regexes + the Arrow keyword pass, when
    # fed from with_intel) runs once, not once per branch — the
    # curate_final / dedup_cdc_passages single-scan device.  DISK_ONLY:
    # no executor storage-memory pressure at scale, and the projection
    # carries no text/payload columns.
    base = pages.select(
        F.col(node_col).cast("string").alias("__node"),
        F.col(site_col).cast("string").alias("__site"),
        _risk_rank(F.col("risk_label")).alias("__rank"),
        F.col("ioc_total").cast("long").alias("ioc_total"),
    ).persist(StorageLevel.DISK_ONLY)

    hub_x, hub_y = _ring_nums(_ring_m(F.col("__site")))
    off_x, off_y = _ring_nums(_ring_m(F.col("__node")))
    page_rows = base.select(
        F.col("__node").alias("node"),
        F.lit("page").alias("kind"),
        F.col("__rank").alias("risk_rank"),
        "ioc_total",
        F.lit(1).cast("long").alias("n_pages"),
        ((hub_x * _SITE_SCALE + off_x * _PAGE_SCALE) / float(_QUARTER))
        .alias("x"),
        ((hub_y * _SITE_SCALE + off_y * _PAGE_SCALE) / float(_QUARTER))
        .alias("y"),
    )

    sx, sy = _ring_nums(_ring_m(F.col("node")))
    site_rows = (
        base.select(F.col("__site").alias("node"), "__rank", "ioc_total")
        .groupBy("node")
        .agg(F.max("__rank").alias("risk_rank"),
             F.sum("ioc_total").cast("long").alias("ioc_total"),
             F.count("*").alias("n_pages"))
        .select(
            "node", F.lit("site").alias("kind"), "risk_rank", "ioc_total",
            "n_pages",
            (sx * _SITE_SCALE / float(_QUARTER)).alias("x"),
            (sy * _SITE_SCALE / float(_QUARTER)).alias("y"),
        )
    )
    return site_rows.unionByName(page_rows)


# ---------------------------------------------------------------------------
# registered query over the documents table (same enrichment as q_intel)
# ---------------------------------------------------------------------------


def _viz_sql() -> str:
    docs = (f"(SELECT doc_id, source, {enriched_text_sql()} AS text "
            "FROM documents)")
    page_node = "('doc:' || CAST(s.doc_id AS VARCHAR))"
    hub_m = _ring_m_sql("s.source")
    off_m = _ring_m_sql(page_node)
    hx, hy = _ring_nums_sql("hub_m")
    ox, oy = _ring_nums_sql("off_m")
    sx, sy = _ring_nums_sql("site_m")
    site_m = _ring_m_sql("node")
    rank = _risk_rank_sql("risk_label")
    return f"""
WITH {sqlgen.sql_threat_cte(docs, extra_cols="source")},
iocs AS (
  SELECT doc_id, {sqlgen.sql_ioc_total('text')} AS ioc_total FROM {docs}
),
pages AS (
  SELECT 'doc:' || CAST(s.doc_id AS VARCHAR) AS node, s.source,
         {rank} AS risk_rank,
         CAST(i.ioc_total AS BIGINT) AS ioc_total,
         {hub_m} AS hub_m, {off_m} AS off_m
  FROM scored s JOIN iocs i ON s.doc_id = i.doc_id
),
page_rows AS (
  SELECT node, 'page' AS kind, risk_rank, ioc_total,
         CAST(1 AS BIGINT) AS n_pages,
         (({hx}) * {_SITE_SCALE} + ({ox}) * {_PAGE_SCALE})
           / {float(_QUARTER)} AS x,
         (({hy}) * {_SITE_SCALE} + ({oy}) * {_PAGE_SCALE})
           / {float(_QUARTER)} AS y
  FROM pages
),
hubs AS (
  SELECT source AS node, CAST(max(risk_rank) AS INT) AS risk_rank,
         CAST(sum(ioc_total) AS BIGINT) AS ioc_total,
         CAST(count(*) AS BIGINT) AS n_pages
  FROM pages GROUP BY source
),
site_rows AS (
  SELECT node, 'site' AS kind, risk_rank, ioc_total, n_pages,
         ({sx}) * {_SITE_SCALE} / {float(_QUARTER)} AS x,
         ({sy}) * {_SITE_SCALE} / {float(_QUARTER)} AS y
  FROM (SELECT *, {site_m} AS site_m FROM hubs)
)
SELECT * FROM site_rows UNION ALL SELECT * FROM page_rows
"""


@register(
    "viz_graph_layout",
    oracle=_viz_sql(),
    doc="3-D graph figure input (visualizer.py:204-282): site hubs + "
        "page nodes with worst-risk rank / IOC totals / page counts "
        "and a deterministic md5-seeded square-ring layout (hubs on a "
        "radius-10 ring, pages ringed radius-2 around their hub; "
        "integer-exact coordinates, engine-stable)",
)
def viz_graph_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    # shared threat frame (q_intel._threat_table): same plan as a4/a7,
    # so one session computes the enrichment once; the layout reads
    # only risk_label and the bare ioc_total
    from .q_intel import _threat_table

    pages = _threat_table(spark, sf_dir).select(
        F.concat(F.lit("doc:"), F.col("doc_id").cast("string")).alias("url"),
        F.col("source").alias("site"),
        "risk_label", "ioc_total",
    )
    return graph_layout_nodes(pages)
