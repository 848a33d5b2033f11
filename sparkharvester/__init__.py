"""sparkharvester — PySpark-native distributed crawl-analytics engine.

A from-scratch Spark-first rebuild of the capabilities of
servais1983/deepwebharvester (reference at /root/reference, studied for
WHAT it computes, not HOW): a distributed URL-frontier + fetch
scheduler with bloom-prefiltered seen filtering, per-host politeness,
robots caching, exact-resume snapshots and per-partition lineage
metrics, plus the intelligence layer (IOC extraction, threat scoring),
report aggregations, multi-format sinks, and a training-data-pipeline
operator suite (dedup, similarity search, text analysis, image+caption
payload invariants).

See SURVEY.md for the operator blueprint, STATUS.md for the
operator→implementation map, and BENCH/BASELINE.md for scaling
evidence.
"""

__version__ = "1.0.0"
