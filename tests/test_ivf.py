"""IVF ANN quality gates (VERDICT r1 #3).

Recall is asserted on a deterministic clustered dataset: IVF's recall
contract only exists under cluster structure, and the driver's
``embeddings`` table is near-uniform on the sphere (max pairwise
cosine ≈ 0.51 at sf0.001 — measured), where no partitioning index can
prune and keep recall.  On the real table we instead assert the
exhaustive-probe equivalence (nprobe=K reproduces brute force exactly)
plus determinism and bucket sanity.
"""
from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from sparkharvester.q_sim import (
    IVF_K,
    ivf_assign,
    ivf_fit,
    ivf_search,
    sim_cosine_topk,
    sim_ivf_ann,
)

SF = "/root/testdata/sf0.001"


def _clustered_df(spark, n_clusters=10, per_cluster=60, dim=64, spread=0.15):
    """Well-separated unit-norm clusters, deterministic (seeded numpy)."""
    rng = np.random.RandomState(7)
    centers = rng.randn(n_clusters, dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in range(n_clusters):
        for _ in range(per_cluster):
            v = centers[c] + spread * rng.randn(dim)
            v /= np.linalg.norm(v)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id int, embedding array<float>")


def test_ivf_recall_on_clustered_data(spark):
    emb = _clustered_df(spark).cache()
    C = ivf_fit(emb, k=IVF_K, iters=3)
    assigned = ivf_assign(emb, C).cache()

    # query = first vector; ground truth = brute-force cosine top-20
    pivot = emb.orderBy("vec_id").limit(1).collect()[0]
    qv, qid = list(pivot["embedding"]), int(pivot["vec_id"])
    X = np.vstack([r["embedding"] for r in emb.orderBy("vec_id").collect()])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    q = np.asarray(qv) / np.linalg.norm(qv)
    sims = Xn @ q
    truth = set(np.argsort(-sims)[: 20 + 1].tolist()) - {qid}

    got = {
        r["vec_id"]
        for r in ivf_search(assigned, C, qv, nprobe=2, top_k=20,
                            exclude_vec_id=qid).collect()
    }
    recall = len(got & truth) / 20
    assert recall >= 0.9, recall

    # the probe really prunes: <= 2/IVF_K-ish of the table scanned
    probed = assigned.filter(
        F.col("bucket").isin([
            int(b) for b in np.argsort(
                -((C / np.linalg.norm(C, axis=1, keepdims=True)) @ q))[:2]
        ])
    ).count()
    assert probed < emb.count() * 0.6


def test_ivf_exhaustive_probe_equals_brute_force(spark):
    """nprobe=K scans everything → must reproduce sim_cosine_topk exactly."""
    from sparkharvester.session import load

    emb = load(spark, SF, "embeddings").select("vec_id", "embedding")
    C = ivf_fit(emb)
    assigned = ivf_assign(emb, C)
    pivot = emb.orderBy("vec_id").limit(1).collect()[0]
    full = ivf_search(assigned, C, list(pivot["embedding"]), nprobe=IVF_K,
                      top_k=20, exclude_vec_id=int(pivot["vec_id"])).collect()
    brute = sim_cosine_topk(spark, SF).collect()
    assert [(r["vec_id"], r["cos_sim"]) for r in full] \
        == [(r["vec_id"], r["cos_sim"]) for r in brute]


def test_ivf_deterministic_and_label_free(spark):
    a = [tuple(r) for r in sim_ivf_ann(spark, SF).collect()]
    b = [tuple(r) for r in sim_ivf_ann(spark, SF).collect()]
    assert a == b
    assert len(a) == 20

    # bucket sanity on the real table: all K buckets live, none dominant
    from sparkharvester.session import load

    emb = load(spark, SF, "embeddings").select("vec_id", "embedding")
    C = ivf_fit(emb)
    sizes = {r["bucket"]: r["count"]
             for r in ivf_assign(emb, C).groupBy("bucket").count().collect()}
    n = emb.count()
    assert set(sizes) == set(range(IVF_K))
    assert max(sizes.values()) < 0.5 * n


def test_ivf_bucket_partitioned_probe_prunes(spark, tmp_path):
    """The scale path: persist the assignment bucket-partitioned; a
    probe filtered to nprobe buckets must only read those partitions
    (partition pruning visible via inputFiles)."""
    from sparkharvester.session import load

    emb = load(spark, SF, "embeddings").select("vec_id", "embedding")
    C = ivf_fit(emb)
    idx_path = str(tmp_path / "ivf_index")
    ivf_assign(emb, C).write.partitionBy("bucket").parquet(idx_path)

    idx = spark.read.parquet(idx_path)
    all_files = set(idx.inputFiles())
    assert any("/bucket=" in f for f in all_files)     # hive-partitioned

    probe = idx.filter(F.col("bucket").isin([0, 1]))
    assert probe.count() > 0
    # the scan must carry the bucket predicate as a PARTITION filter
    # (directory pruning), not a post-scan data filter
    plan = probe._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf, plan
    assert "bucket" in pf[0] and "PartitionFilters: []" not in pf[0], pf[0]
    # and the pruned listing really is smaller than the full index
    n_pruned = len({f for f in all_files
                    if "/bucket=0/" in f or "/bucket=1/" in f})
    assert 0 < n_pruned < len(all_files)


# ---------------------------------------------------------------------------
# Product quantization (PQ) ANN
# ---------------------------------------------------------------------------


def test_pq_refine_recall(spark, sf_dir):
    from sparkharvester.q_sim import sim_cosine_topk, sim_pq_refine

    bf = [r.vec_id for r in sim_cosine_topk(spark, sf_dir).collect()]
    pq = [r.vec_id for r in sim_pq_refine(spark, sf_dir).collect()]
    recall = len(set(pq) & set(bf)) / len(bf)
    # near-uniform sphere vectors: neighbors separated only by noise at
    # cos ~0.4-0.5 — 0.85 here means the 5-bit x 8-subspace codes rank
    # essentially as well as exact distances (measured 0.90 at sf0.01)
    assert recall >= 0.85, f"PQ recall {recall}"


def test_pq_exhaustive_equals_brute_force(spark, sf_dir):
    from sparkharvester.q_sim import sim_cosine_topk, sim_pq_exhaustive

    bf = [(r.vec_id, r.cos_sim) for r in sim_cosine_topk(spark, sf_dir).collect()]
    pq = [(r.vec_id, r.cos_sim) for r in sim_pq_exhaustive(spark, sf_dir).collect()]
    assert pq == bf


def test_pq_deterministic(spark, sf_dir):
    from sparkharvester.q_sim import sim_pq_refine

    a = [tuple(r) for r in sim_pq_refine(spark, sf_dir).collect()]
    b = [tuple(r) for r in sim_pq_refine(spark, sf_dir).collect()]
    assert a == b
