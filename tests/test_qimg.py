"""Behavioral tests for the image-corpus queries (q_img) and the
priority-queue ordering contract (q_crawl.crawl_priority_order).

The driver's DuckDB oracle proves Spark == SQL; these tests prove the
SEMANTICS are the intended ones (gates hold, winners unique per phash
group, pop order is a real priority-queue order)."""
from __future__ import annotations

from sparkharvester import q_img
from sparkharvester.q_crawl import _PQ_TOKENS, crawl_priority_order


def test_img_curate_gates_hold(spark, sf_dir):
    rows = q_img.img_curate(spark, sf_dir).collect()
    assert rows, "curation must keep something at sf0.001"
    for r in rows:
        assert min(r.w, r.h) >= q_img.CURATE_MIN_SIDE
        assert max(r.w, r.h) <= q_img.CURATE_MAX_ASPECT * min(r.w, r.h)
        assert r.fmt in q_img.CURATE_FMTS
        assert r.n_cap_tokens >= q_img.CURATE_MIN_CAP_TOKENS


def test_img_curate_one_winner_per_phash_group(spark, sf_dir):
    meta = q_img._img_meta(spark, sf_dir).select("img_id", "ph")
    curated = q_img.img_curate(spark, sf_dir).select("img_id")
    joined = curated.join(meta, "img_id")
    per_ph = joined.groupBy("ph").count().collect()
    assert per_ph and all(r["count"] == 1 for r in per_ph)


def test_img_components_labels_match_pairs(spark, sf_dir):
    from sparkharvester.q_more import dedup_phash_hamming

    labels = {
        r.node: r.component
        for r in q_img.img_phash_components(spark, sf_dir).collect()
    }
    pairs = dedup_phash_hamming(spark, sf_dir).collect()
    assert pairs, "phash LSH must find the injected near-copies"
    for p in pairs:
        assert labels[p.img_a] == labels[p.img_b]
    # component label is the min node id of the member set
    by_comp: dict = {}
    for n, c in labels.items():
        by_comp.setdefault(c, []).append(n)
    for c, members in by_comp.items():
        assert c == min(members)


def test_priority_order_is_a_priority_queue(spark, sf_dir):
    rows = crawl_priority_order(spark, sf_dir).collect()
    assert rows
    # dense 1..N pop ranks
    ranks = sorted(r.pop_rank for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    # pop order sorts by (depth, budget_pos, url_id)
    by_rank = sorted(rows, key=lambda r: r.pop_rank)
    keys = [(r.depth, r.budget_pos, r.url_id) for r in by_rank]
    assert keys == sorted(keys)
    # politeness budget: ≤ TOKENS rows per (host, depth), ranks exact
    seen: dict = {}
    for r in sorted(rows, key=lambda r: (r.host, r.depth, r.url_id)):
        k = (r.host, r.depth)
        seen[k] = seen.get(k, 0) + 1
        assert r.budget_pos == seen[k] <= _PQ_TOKENS


def test_img_hamming_knn_bounded_under_exact_dup_skew(spark):
    """One phash shared by 10^4 images (viral-image copy group) must NOT
    produce an O(group^2) pair set or window partition: the KNN ranks
    distinct-phash representatives, so pair/window cardinality is bounded
    by the distinct-phash count (VERDICT r3 #3)."""
    from pyspark.sql import functions as F

    from sparkharvester.q_img import phash_hamming_knn
    from sparkharvester.q_more import phash_hamming_pairs

    base_ph = 0x123456789ABCD
    rows = [(i, base_ph) for i in range(10_000)]
    rows += [(20_001, base_ph ^ 1), (20_002, base_ph ^ (1 << 20)),
             (20_003, base_ph ^ 3)]
    allph = spark.createDataFrame(rows, "img_id long, ph long")

    out = phash_hamming_knn(allph).collect()
    # only phash-winners participate — the 9_999 copies are collapsed
    ids = {r.img_a for r in out} | {r.img_b for r in out}
    assert ids == {0, 20_001, 20_002, 20_003}
    # the pair set feeding the window is over reps: ≤ C(4,2), not ~5*10^7
    reps = allph.groupBy("ph").agg(F.min("img_id").alias("img_id"))
    assert phash_hamming_pairs(reps.select("img_id", "ph")).count() <= 6
    # top-K semantics unchanged: winner of the viral group ranks its
    # distinct-phash neighbors by (hamming, img_b)
    nbrs0 = [(r.hamming, r.img_b) for r in sorted(
        (r for r in out if r.img_a == 0), key=lambda r: r.rank)]
    assert nbrs0 == [(1, 20_001), (1, 20_002), (2, 20_003)]


def test_img_hamming_knn_contract(spark, sf_dir):
    from sparkharvester.q_img import _KNN_K, img_hamming_knn
    from sparkharvester.q_more import dedup_phash_hamming

    rows = img_hamming_knn(spark, sf_dir).collect()
    assert rows
    # symmetric pair set, ranked within each img_a by (hamming, img_b)
    by_a: dict = {}
    for r in rows:
        by_a.setdefault(r.img_a, []).append(r)
    pairs = dedup_phash_hamming(spark, sf_dir).collect()
    deg: dict = {}
    for p in pairs:
        deg[p.img_a] = deg.get(p.img_a, 0) + 1
        deg[p.img_b] = deg.get(p.img_b, 0) + 1
    for a, nbrs in by_a.items():
        nbrs.sort(key=lambda r: r.rank)
        assert [r.rank for r in nbrs] == list(range(1, len(nbrs) + 1))
        assert len(nbrs) == min(_KNN_K, deg[a])
        keys = [(r.hamming, r.img_b) for r in nbrs]
        assert keys == sorted(keys)


def test_caption_spam_flags_template_only(spark, sf_dir):
    """The injected template caption spans many phash groups and must be
    flagged; every flagged row satisfies the spam predicate and carries
    the min-img winner."""
    from sparkharvester.q_img import (
        CAPTION_SPAM_GROUPS,
        _TEMPLATE_CAPTION,
        _img_meta,
        img_caption_spam,
    )
    import hashlib

    from pyspark.sql import functions as F

    rows = img_caption_spam(spark, sf_dir).collect()
    assert rows
    tmpl_fp = hashlib.md5(_TEMPLATE_CAPTION.encode()).hexdigest()
    fps = {r.cap_fp for r in rows}
    assert tmpl_fp in fps
    # recompute ground truth for the template caption from the meta view
    meta = _img_meta(spark, sf_dir).filter(F.col("img_id") % 11 == 0)
    n_imgs = meta.count()
    n_groups = meta.select("ph").distinct().count()
    winner = meta.agg(F.min("img_id")).first()[0]
    tmpl = next(r for r in rows if r.cap_fp == tmpl_fp)
    assert (tmpl.n_imgs, tmpl.n_ph_groups, tmpl.winner_img) == \
        (n_imgs, n_groups, winner)
    for r in rows:
        assert r.n_ph_groups >= CAPTION_SPAM_GROUPS


def test_img_dup_pixel_verified_classifies_injected_dups(spark, sf_dir):
    from sparkharvester.registry import all_queries

    # the query's input is fully synthetic; sf_dir is passed only to
    # honor the builder signature (ADVICE r5: no hardcoded paths)
    rows = all_queries()["img_dup_pixel_verified"].build(
        spark, sf_dir).collect()
    # n=64, every 4th base image gets -xc (exact re-encode) and -nc
    # (perturbed): 16 groups x 3 pairs, all found (phash-banded LSH has
    # exact recall at hamming <= 3 and the injected dups stay within it)
    assert len(rows) == 48
    by = {(r["img_a"], r["img_b"]): r for r in rows}
    verdicts = {}
    for (a, b), r in by.items():
        assert a.split("-")[1] == b.split("-")[1]  # same dup group only
        # exact iff the pair is {base, -xc} (identical pixels, codec
        # change only); any pair involving -nc is perturbed -> near
        want = "near" if (a.endswith("-nc") or b.endswith("-nc")) \
            else "exact"
        assert r["verdict"] == want, (a, b, r["verdict"])
        verdicts.setdefault(r["verdict"], 0)
        verdicts[r["verdict"]] += 1
        if r["verdict"] == "exact":
            assert r["pixels_equal"] and r["psnr_db"] == 999.0
        else:
            assert not r["pixels_equal"] and r["psnr_db"] >= 40.0
    assert verdicts == {"exact": 16, "near": 32}
