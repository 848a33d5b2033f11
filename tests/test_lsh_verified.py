"""dedup_lsh_verified semantics (VERDICT r1 #2): the composed
LSH→exact-Jaccard pipeline must return exactly {candidate pairs from
the minhash-LSH index} ∩ {pairs with true Jaccard ≥ 0.8 over full
distinct shingle sets} — i.e. it equals the brute-force ground truth
on the candidate overlap, with correct Jaccard values."""
from __future__ import annotations

import re

import duckdb

from sparkharvester.q_dedup import (
    JACCARD_THRESHOLD,
    dedup_lsh_verified,
    dedup_minhash_lsh,
)

SF = "/root/testdata/sf0.001"
_TOKEN_RE = re.compile(r"[a-z0-9]+")


def _shingle_sets() -> dict[int, frozenset[str]]:
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    out = {}
    for doc_id, text in docs:
        toks = _TOKEN_RE.findall(text.lower())
        sh = frozenset(
            f"{toks[i]} {toks[i+1]} {toks[i+2]}" for i in range(len(toks) - 2)
        )
        if sh:
            out[doc_id] = sh
    return out


def test_lsh_verified_equals_ground_truth_on_candidates(spark):
    sets = _shingle_sets()
    cand = {(r["doc_a"], r["doc_b"])
            for r in dedup_minhash_lsh(spark, SF).collect()}
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in dedup_lsh_verified(spark, SF).collect()}

    expect = {}
    for a, b in cand:
        sa, sb = sets[a], sets[b]
        inter = len(sa & sb)
        jac = inter / (len(sa) + len(sb) - inter)
        if jac >= JACCARD_THRESHOLD:
            expect[(a, b)] = round(jac, 4)

    assert set(got) == set(expect)
    for k in expect:
        assert abs(got[k] - expect[k]) < 1e-9, (k, got[k], expect[k])
    assert got, "no verified near-dup pairs found at sf0.001"


def test_connected_components_chain(spark):
    """Large-star/small-star contraction closes a 1000-link path graph
    (diameter 1000) in O(log n) star rounds — NOT O(diameter) label
    propagation (VERDICT r2 #8) — and keeps components separate."""
    from sparkharvester.q_dedup import connected_components

    chain = [(i, i + 1) for i in range(10, 1010)]        # 1000 links
    island = [(5000, 5001), (5001, 5002)]                # separate comp
    pairs = spark.createDataFrame(chain + island, "doc_a long, doc_b long")
    rounds: list[int] = []
    got = {r["node"]: r["component"]
           for r in connected_components(pairs, rounds_out=rounds).collect()}
    assert {got[n] for n in range(10, 1011)} == {10}
    assert {got[n] for n in (5000, 5001, 5002)} == {5000}
    assert rounds[0] <= 15, f"star contraction took {rounds[0]} rounds"


def test_incremental_is_asymmetric_and_consistent(spark, sf_dir):
    """dedup_incremental pairs are strictly batch->corpus, and every
    pair is also found by the symmetric self-join pipeline (the batch
    view is a restriction of the full near-dup relation)."""
    from sparkharvester.q_dedup import (
        _INC_BATCH_MOD,
        dedup_incremental,
        dedup_lsh_verified,
    )

    inc = dedup_incremental(spark, sf_dir).collect()
    assert inc, "the corpus must contain cross-batch near-dups"
    full = {frozenset((r.doc_a, r.doc_b)) for r in
            dedup_lsh_verified(spark, sf_dir).collect()}
    for r in inc:
        assert r.new_doc % _INC_BATCH_MOD == 0
        assert r.corpus_doc % _INC_BATCH_MOD != 0
        assert frozenset((r.new_doc, r.corpus_doc)) in full
