"""Behavioral tests for the round-4 text-pipeline ops: Gopher-style
repetition scores and eval-set decontamination.  The DuckDB oracles
prove Spark == SQL; these prove the SEMANTICS are the intended ones on
constructed inputs."""
from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from sparkharvester.q_text import (
    DECON_EVAL_MOD,
    REP_DUP_FLAG,
    _rep_udf,
    curate_decontaminate,
    text_repetition,
)


def test_repetition_scores_on_constructed_docs(spark):
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [
            "spam spam spam spam spam",          # all 2-grams identical
            "one two three four five",           # all distinct
            "a b a b c",                         # 'a b' twice of 4 grams
        ],
    }))
    r = {row.doc_id: row for row in docs.withColumn(
        "s", _rep_udf()(F.col("text"))).select("doc_id", "s.*").collect()}
    assert r[0].n_grams == 4
    assert r[0].dup_frac == 0.75 and r[0].top_frac == 1.0
    assert r[1].dup_frac == 0.0 and r[1].top_frac == 0.25
    assert r[2].n_grams == 4 and r[2].dup_frac == 0.25
    assert r[2].top_frac == 0.5


def test_repetition_flag_consistent(spark, sf_dir):
    rows = text_repetition(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.repetitive == (r.dup_gram_frac > REP_DUP_FLAG)
        assert 0.0 <= r.dup_gram_frac < 1.0
        # the top gram accounts for >= one occurrence (6-dp rounding)
        assert r.top_gram_frac * r.n_grams >= 0.999


def test_decontaminate_excludes_eval_and_counts(spark, sf_dir):
    rows = curate_decontaminate(spark, sf_dir).collect()
    assert rows, "the corpus must contain some contaminated docs"
    for r in rows:
        # eval docs are never reported as contaminated training docs
        assert r.doc_id % DECON_EVAL_MOD != 0
        assert r.n_shared_grams >= 1 and r.n_eval_docs >= 1


def test_sample_rates_and_determinism(spark, sf_dir):
    from sparkharvester.q_text import SAMPLE_RATES, curate_sample
    from sparkharvester.q_text import text_langid

    kept = curate_sample(spark, sf_dir).collect()
    assert kept
    total = {r.lang_pred: 0 for r in kept}
    for r in text_langid(spark, sf_dir).collect():
        total[r.lang_pred] = total.get(r.lang_pred, 0) + 1
    by_lang = {}
    for r in kept:
        by_lang[r.lang_pred] = by_lang.get(r.lang_pred, 0) + 1
        assert 0.0 <= r.u < SAMPLE_RATES[r.lang_pred]
    # observed keep fraction tracks the configured rate (binomial CI)
    for lang, n_kept in by_lang.items():
        n = total[lang]
        if n >= 30:
            rate = SAMPLE_RATES[lang]
            sd = (rate * (1 - rate) / n) ** 0.5
            assert abs(n_kept / n - rate) <= max(5 * sd, 0.02), (lang, n_kept, n)
    # deterministic: a second build yields the identical sample
    again = {(r.doc_id, r.u) for r in curate_sample(spark, sf_dir).collect()}
    assert again == {(r.doc_id, r.u) for r in kept}


def test_domain_mix_waterfill_invariants(spark, sf_dir):
    """curate_domain_mix: weights form a distribution, no weight
    exceeds MIX_CAP, capped domains sit exactly AT the cap, uncapped
    domains keep their relative proportions (scaled by one factor)."""
    from sparkharvester.q_text import MIX_CAP, curate_domain_mix

    rows = curate_domain_mix(spark, sf_dir).collect()
    assert len(rows) == 10
    total_w = sum(r["mix_weight"] for r in rows)
    assert abs(total_w - 1.0) < 1e-9
    assert max(r["mix_weight"] for r in rows) <= MIX_CAP + 1e-12
    capped = [r for r in rows if r["capped"]]
    uncapped = [r for r in rows if not r["capped"]]
    assert capped, "skewed synth key must make the cap bind"
    for r in capped:
        assert abs(r["mix_weight"] - MIX_CAP) < 1e-12
    # one common scale factor for every uncapped domain
    factors = {round(r["mix_weight"] / r["raw_share"], 9) for r in uncapped}
    assert len(factors) == 1
    # capped domains are exactly the raw-share leaders
    min_capped_raw = min(r["raw_share"] for r in capped)
    assert all(r["raw_share"] <= min_capped_raw for r in uncapped)


# ---------------------------------------------------------------------------
# round-5 ops: CDC passage dedup + CCNet quality buckets
# ---------------------------------------------------------------------------


def _cdc_reference(docs):
    """Sequential Python reference of dedup_cdc_passages' rule."""
    import hashlib

    from sparkharvester.q_dedup import CDC_FOOTERS, CDC_K

    def boundary(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:4], 16) % CDC_K == 0

    chunks_by_doc = {}
    for doc_id, text in docs:
        toks = (text + " " + CDC_FOOTERS[doc_id % 2]).split(" ")
        out, cur, cpos = [], [toks[0]], 0
        for i, t in enumerate(toks[1:], start=1):
            if boundary(t):
                out.append((cpos, " ".join(cur)))
                cur, cpos = [t], i
            else:
                cur.append(t)
        out.append((cpos, " ".join(cur)))
        chunks_by_doc[doc_id] = out
    seen = {}
    for doc_id in sorted(chunks_by_doc):
        for cpos, chunk in sorted(chunks_by_doc[doc_id]):
            seen.setdefault(chunk, (doc_id, cpos))
    res = {}
    for doc_id, chunks in chunks_by_doc.items():
        kept = [c for p, c in sorted(chunks) if seen[c] == (doc_id, p)]
        res[doc_id] = (len(chunks), len(kept), " ".join(kept))
    return res


def test_cdc_passage_dedup_matches_python_reference(spark, tmp_path):
    from sparkharvester.q_dedup import dedup_cdc_passages

    docs = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),
        (1, "iota kappa lambda mu nu xi omicron pi rho"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),  # clone of 0
        (3, "unique words here only once in the corpus"),
    ]
    pd.DataFrame(docs, columns=["doc_id", "text"]).to_parquet(
        str(tmp_path / "documents.parquet"))
    got = {r.doc_id: (r.n_chunks, r.n_kept, r.clean_text)
           for r in dedup_cdc_passages(spark, str(tmp_path)).collect()}
    assert got == _cdc_reference(docs)
    # the even clone (same footer as doc 0) loses EVERYTHING: all its
    # chunks first-occur in doc 0
    assert got[2][1] == 0 and got[2][2] == ""
    # odd-footer docs keep their body but share footer chunks: doc 3
    # loses at least one interior footer chunk to doc 1
    assert got[3][1] < got[3][0]


def test_quality_buckets_are_exact_terciles(spark, sf_dir):
    from collections import defaultdict

    from sparkharvester.q_text import text_quality_buckets

    rows = text_quality_buckets(spark, sf_dir).collect()
    assert rows
    by_lang = defaultdict(list)
    for r in rows:
        by_lang[r.lang_pred].append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: (r.score, r.doc_id))
        n = len(rs)
        for i, r in enumerate(rs):
            assert r.lang_rank == i + 1 and r.n_lang == n
            want = "tail" if 3 * i < n else ("middle" if 3 * i < 2 * n
                                             else "head")
            assert r.bucket == want, (lang, i, n, r.bucket, want)
        # tercile sizes differ by at most 1
        sizes = [sum(1 for r in rs if r.bucket == b)
                 for b in ("tail", "middle", "head")]
        assert max(sizes) - min(sizes) <= 1


def test_bloom_decontaminate_equals_plain(spark, sf_dir):
    """The bloom-prefiltered scale path must be BIT-identical to the
    broadcast-join form: false positives die in the exact join, false
    negatives are impossible."""
    from sparkharvester.registry import all_queries

    plain = all_queries()["curate_decontaminate"].build(spark, sf_dir)
    bloom = all_queries()["curate_decontaminate_bloom"].build(spark, sf_dir)
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, bloom.collect()))
    assert a == b and len(a) > 0
